"""EQL — ES's Event Query Language — over the ordered events log.

ES EQL (docs: eql.html, eql-syntax.html) runs event queries, sequences
and samples against the same index as ``_search``.  The graft implements
the language over the parquet ``events`` table:

    any where value > 100                          -- event query
    purchase where user_id == 5                    -- category == event_type
    sequence by user_id with maxspan=7d
      [signup where true] [purchase where value > 10.0] [error where true]
      until [delete where true]
    sample by user_id [signup where true] [error where true]
    ... | head 10 | tail 3 | count | unique event_type   -- pipes

Conditions reuse the ES|QL expression parser/evaluator (same comparison
and boolean subset); ``true`` is the always-true condition.

**Sequence semantics — greedy earliest-completion, non-overlapping**
(the full-match generalization of ``events.eql_funnel``'s
first-completion-only fragment): anchor at the earliest step-1 event
after the cursor; each later step matches the earliest qualifying event
STRICTLY after the previous step's; the match must complete within
``maxspan`` of the anchor and contain no ``until`` event strictly
inside (t1, tn); on success the cursor advances to tn (non-overlap), on
a maxspan miss to t1, on an until kill to the until event.  ES runs
many concurrent per-key state machines and may report overlapping
candidates; this single-machine greedy variant is deterministic (the
divergence is documented here and pinned by the brute-force tests).

**Plan shape:** one ``map_batches`` pass evaluates every step condition
vectorized and packs them into a per-event BITMASK column, dropping
non-participating events — the shuffle then moves only
(key, t_us, mask); ``groupby(key).map_groups`` runs the state machine
per key, with per-match (not per-event) Python work: each step advances
by one ``np.searchsorted``.  Event queries stream with per-batch
partial head/tail caps (ES's own default ``size=10`` applies when no
pipe bounds the output).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .esql import _eval_expr, _normalize_assign, _Parser, _referenced_cols, tokenize_esql

__all__ = ["parse_eql", "run_eql"]

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_DEFAULT_SIZE = 10  # ES EQL's default response size

_UNITS_S = {"s": 1, "m": 60, "h": 3600, "d": 86400}


@dataclass
class EqlPlan:
    kind: str  # "event" | "sequence" | "sample"
    # (category|None for any, condition-ast|None for true), one per subquery
    queries: list[tuple[str | None, tuple | None]] = field(default_factory=list)
    by: list[str] = field(default_factory=list)
    maxspan_s: int | None = None
    until: tuple[str | None, tuple | None] | None = None
    pipes: list[tuple] = field(default_factory=list)


def _split_pipes(src: str) -> list[str]:
    """Quote-aware top-level split on '|'."""
    parts, buf, in_str = [], [], False
    i = 0
    while i < len(src):
        ch = src[i]
        if in_str:
            if ch == "\\":
                buf.append(src[i : i + 2])
                i += 2
                continue
            if ch == '"':
                in_str = False
            buf.append(ch)
        elif ch == '"':
            in_str = True
            buf.append(ch)
        elif ch == "|":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _parse_cond(text: str) -> tuple | None:
    text = text.strip()
    if text.lower() == "true":
        return None
    p = _Parser(tokenize_esql(_normalize_assign(text)))
    e = p.expr()
    if p.peek() != ("eof", ""):
        raise ValueError(f"eql: trailing tokens in condition {text!r}")
    return e


def _parse_subquery(text: str) -> tuple[str | None, tuple | None]:
    m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+where\s+(.*)$", text, re.S)
    if not m:
        raise ValueError(f"eql: expected '<category> where <cond>', got {text!r}")
    cat = None if m.group(1).lower() == "any" else m.group(1)
    return cat, _parse_cond(m.group(2))


_BRACKET = re.compile(r"\[([^\]]*)\]")
_BY_KEYS = r"[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*"
_SEQ_HEAD = re.compile(
    r"^\s*sequence\s+by\s+(" + _BY_KEYS + r")"
    r"(?:\s+with\s+maxspan\s*=\s*(\d+)([smhd]))?\s*",
    re.IGNORECASE,
)
_SAMPLE_HEAD = re.compile(
    r"^\s*sample\s+by\s+(" + _BY_KEYS + r")\s*", re.IGNORECASE
)


def parse_eql(src: str) -> EqlPlan:
    """Parse one EQL query (verification included)."""
    segs = _split_pipes(src)
    core, pipe_texts = segs[0], segs[1:]
    plan: EqlPlan
    m = _SEQ_HEAD.match(core)
    ms = _SAMPLE_HEAD.match(core)
    if m:
        plan = EqlPlan(
            kind="sequence",
            by=[k.strip() for k in m.group(1).split(",")],
        )
        if m.group(2):
            plan.maxspan_s = int(m.group(2)) * _UNITS_S[m.group(3).lower()]
        rest = core[m.end() :]
        until_split = re.split(r"\buntil\b", rest, flags=re.IGNORECASE)
        subs: list[tuple] = []
        for bm in re.finditer(
            r"\[([^\]]*)\](?:\s+with\s+runs\s*=\s*(\d+))?",
            until_split[0],
            re.IGNORECASE,
        ):
            sq = _parse_subquery(bm.group(1))
            runs = int(bm.group(2)) if bm.group(2) else 1
            if runs < 1:
                raise ValueError("eql: runs must be >= 1")
            subs.extend([sq] * runs)  # ES 'with runs=N' == N copies
        if len(subs) < 2:
            raise ValueError("eql: sequence needs at least two subqueries")
        plan.queries = subs
        if len(until_split) > 1:
            ub = _BRACKET.findall(until_split[1])
            if len(ub) != 1:
                raise ValueError("eql: until takes exactly one subquery")
            plan.until = _parse_subquery(ub[0])
    elif ms:
        plan = EqlPlan(
            kind="sample",
            by=[k.strip() for k in ms.group(1).split(",")],
        )
        plan.queries = [_parse_subquery(b) for b in _BRACKET.findall(core[ms.end() :])]
        if len(plan.queries) < 2:
            raise ValueError("eql: sample needs at least two subqueries")
    else:
        plan = EqlPlan(kind="event", queries=[_parse_subquery(core)])
    for pt in pipe_texts:
        toks = pt.strip().split()
        if not toks:
            raise ValueError("eql: empty pipe")
        name = toks[0].lower()
        if name in ("head", "tail"):
            if len(toks) != 2 or not toks[1].isdigit() or int(toks[1]) < 1:
                raise ValueError(f"eql: {name} takes a positive count")
            plan.pipes.append((name, int(toks[1])))
        elif name == "count":
            if len(toks) != 1:
                raise ValueError("eql: count takes no arguments")
            plan.pipes.append(("count",))
        elif name == "unique":
            if len(toks) != 2:
                raise ValueError("eql: unique takes one field")
            plan.pipes.append(("unique", toks[1]))
        else:
            raise ValueError(f"eql: unknown pipe {name!r}")
    return plan


def _cond_mask(cat: str | None, cond: tuple | None, batch: pa.Table) -> pa.Array:
    mask = None
    if cat is not None:
        mask = pc.equal(batch["event_type"], cat)
    if cond is not None:
        cm = _eval_expr(cond, batch)
        if not isinstance(cm, (pa.Array, pa.ChunkedArray)):
            cm = pa.array([bool(cm)] * batch.num_rows)
        mask = cm if mask is None else pc.and_kleene(mask, cm)
    if mask is None:
        mask = pa.array(np.ones(batch.num_rows, dtype=bool))
    return pc.fill_null(mask, False)


def _need_columns(plan: EqlPlan) -> list[str]:
    need: set[str] = {"event_id", "ts"}
    for cat, cond in plan.queries + ([plan.until] if plan.until else []):
        if cat is not None:
            need.add("event_type")
        _referenced_cols(cond, need)
    need.update(plan.by)
    for p_ in plan.pipes:
        if p_[0] == "unique":
            need.add(p_[1])
    unknown = need - set(_EVENT_COLS)
    if unknown:
        raise ValueError(f"eql: unknown event fields {sorted(unknown)}")
    if plan.kind == "event":
        return list(_EVENT_COLS)  # event queries return whole events
    return [c for c in _EVENT_COLS if c in need]


def _sequence_machine(
    step_times: list[np.ndarray],
    until_times: np.ndarray | None,
    maxspan_us: int | None,
) -> list[tuple[int, ...]]:
    """Greedy earliest-completion non-overlapping matcher (see module
    docstring).  O(matches × steps × log n)."""
    n_steps = len(step_times)
    out: list[tuple[int, ...]] = []
    cursor = -(1 << 62)
    s1 = step_times[0]
    while True:
        i1 = int(np.searchsorted(s1, cursor, side="right"))
        if i1 >= len(s1):
            break
        t1 = int(s1[i1])
        times = [t1]
        prev = t1
        failed_at = None
        for k in range(1, n_steps):
            sk = step_times[k]
            j = int(np.searchsorted(sk, prev, side="right"))
            if j >= len(sk):
                return out  # no later step-k event will ever exist
            tk = int(sk[j])
            if maxspan_us is not None and tk - t1 > maxspan_us:
                failed_at = t1  # this anchor can never complete
                break
            times.append(tk)
            prev = tk
        if failed_at is not None:
            cursor = failed_at
            continue
        if until_times is not None:
            ui = int(np.searchsorted(until_times, t1, side="right"))
            if ui < len(until_times) and int(until_times[ui]) < prev:
                cursor = int(until_times[ui])  # in-flight sequence killed
                continue
        out.append(tuple(times))
        cursor = prev
    return out


def run_eql(src: str, sf_dir: str) -> pa.Table:
    """Parse + execute one EQL query over ``sf_dir``'s events table."""
    import ray.data as rd

    plan = parse_eql(src)
    cols = _need_columns(plan)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    if plan.kind == "event":
        cat, cond = plan.queries[0]
        # bound the stream like ES does: explicit head/tail, else size=10;
        # count/unique aggregate instead
        head_n = None
        tail_n = None
        aggregate = None
        for p_ in plan.pipes:
            if p_[0] == "head" and head_n is None and tail_n is None:
                head_n = p_[1]
            elif p_[0] == "tail" and head_n is None and tail_n is None:
                tail_n = p_[1]
            elif p_[0] in ("count", "unique") and aggregate is None:
                aggregate = p_
        if head_n is None and tail_n is None and aggregate is None:
            head_n = _DEFAULT_SIZE

        def flt(batch: pa.Table, _cat=cat, _cond=cond) -> pa.Table:
            out = batch.filter(_cond_mask(_cat, _cond, batch))
            if aggregate is not None and aggregate[0] == "count":
                return pa.table(
                    {"__n": pa.array([out.num_rows], type=pa.int64())}
                )
            if aggregate is not None and aggregate[0] == "unique":
                # per-batch pre-dedup: keep the earliest event per field
                # value, so the driver sees <= |values| x #blocks rows
                fld = aggregate[1]
                srt = out.sort_by(
                    [("ts", "ascending"), ("event_id", "ascending")]
                )
                seen: set = set()
                keep_idx = []
                for i, v in enumerate(srt[fld].to_pylist()):
                    if v not in seen:
                        seen.add(v)
                        keep_idx.append(i)
                return srt.take(pa.array(keep_idx, type=pa.int64()))
            if head_n is not None:  # per-batch partial cap
                out = out.sort_by([("ts", "ascending"), ("event_id", "ascending")])
                return out.slice(0, head_n)
            if tail_n is not None:
                out = out.sort_by([("ts", "descending"), ("event_id", "descending")])
                return out.slice(0, tail_n)
            return out

        mapped = ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
        from ..functions.blocks import collect_tables

        parts = collect_tables(mapped)
        cat_t = (
            pa.concat_tables(parts, promote_options="default")
            if parts
            else None
        )
        if aggregate is not None and aggregate[0] == "count":
            n = int(pc.sum(cat_t["__n"]).as_py()) if cat_t is not None else 0
            return pa.table({"count": pa.array([n], type=pa.int64())})
        if cat_t is None:
            cat_t = pa.table({c: pa.array([]) for c in cols})
        if aggregate is not None and aggregate[0] == "unique":
            # first (earliest) event per distinct field value — ES's
            # ``| unique``; result bounded by field cardinality
            fld = aggregate[1]
            srt = cat_t.sort_by(
                [("ts", "ascending"), ("event_id", "ascending")]
            )
            seen: set = set()
            keep_idx = []
            for i, v in enumerate(srt[fld].to_pylist()):
                if v not in seen:
                    seen.add(v)
                    keep_idx.append(i)
            res = srt.take(pa.array(keep_idx, type=pa.int64()))
        elif tail_n is not None:
            res = cat_t.sort_by(
                [("ts", "descending"), ("event_id", "descending")]
            ).slice(0, tail_n)
            res = res.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        else:
            res = cat_t.sort_by(
                [("ts", "ascending"), ("event_id", "ascending")]
            ).slice(0, head_n)
        return _apply_result_pipes(res, plan.pipes, skip_first_bound=True)

    # sequence / sample: one vectorized pass packs per-step membership
    # into a bitmask; the shuffle moves only (keys, t_us, mask)
    keys = plan.by
    n_steps = len(plan.queries)
    until_bit = n_steps  # until mask lives one bit past the steps

    def mask_pass(batch: pa.Table) -> pa.Table:
        bits = np.zeros(batch.num_rows, dtype=np.int64)
        for k, (cat, cond) in enumerate(plan.queries):
            m = _cond_mask(cat, cond, batch).to_numpy(zero_copy_only=False)
            bits |= m.astype(np.int64) << k
        if plan.until is not None:
            m = _cond_mask(*plan.until, batch).to_numpy(zero_copy_only=False)
            bits |= m.astype(np.int64) << until_bit
        keep = bits != 0
        t_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                **{k_: batch[k_] for k_ in keys},
                "__t": pa.array(t_us),
                "__bits": pa.array(bits),
            }
        ).filter(pa.array(keep))

    narrow = ds.map_batches(mask_pass, batch_format="pyarrow", zero_copy_batch=True)
    maxspan_us = plan.maxspan_s * 1_000_000 if plan.maxspan_s else None

    def per_key(group: pa.Table) -> pa.Table:
        t = group["__t"].to_numpy(zero_copy_only=False)
        bits = group["__bits"].to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        t, bits = t[order], bits[order]
        kvs = {k_: group[k_][0].as_py() for k_ in keys}
        ktypes = {k_: group.schema.field(k_).type for k_ in keys}
        tcols = [f"t{i+1}_us" for i in range(n_steps)]

        def _key_cols(n_rows: int) -> dict:
            return {
                k_: pa.array([kvs[k_]] * n_rows, type=ktypes[k_])
                for k_ in keys
            }

        if plan.kind == "sample":
            firsts = []
            for k in range(n_steps):
                sel = t[(bits >> k) & 1 == 1]
                if len(sel) == 0:
                    return pa.table(
                        {
                            **_key_cols(0),
                            **{c: pa.array([], type=pa.int64()) for c in tcols},
                        }
                    )
                firsts.append(int(sel[0]))
            return pa.table(
                {
                    **_key_cols(1),
                    **{
                        c: pa.array([v], type=pa.int64())
                        for c, v in zip(tcols, firsts)
                    },
                }
            )
        step_times = [t[(bits >> k) & 1 == 1] for k in range(n_steps)]
        until_times = (
            t[(bits >> until_bit) & 1 == 1] if plan.until is not None else None
        )
        empty = any(len(s_) == 0 for s_ in step_times)
        matches = (
            []
            if empty
            else _sequence_machine(step_times, until_times, maxspan_us)
        )
        return pa.table(
            {
                **_key_cols(len(matches)),
                "match_no": pa.array(
                    np.arange(1, len(matches) + 1, dtype=np.int64)
                ),
                **{
                    c: pa.array([m_[i] for m_ in matches], type=pa.int64())
                    for i, c in enumerate(tcols)
                },
                "span_us": pa.array(
                    [m_[-1] - m_[0] for m_ in matches], type=pa.int64()
                ),
            }
        )

    out = narrow.groupby(keys).map_groups(per_key, batch_format="pyarrow")
    from ..functions.blocks import collect_tables

    parts = [p for p in collect_tables(out) if p.num_rows]
    if not parts:
        tcols = [f"t{i+1}_us" for i in range(n_steps)]
        import pyarrow.parquet as pq

        ev_schema = pq.read_schema(f"{sf_dir}/events.parquet")
        schema = {
            k_: pa.array([], type=ev_schema.field(k_).type) for k_ in keys
        }
        if plan.kind == "sequence":
            schema["match_no"] = pa.array([], type=pa.int64())
        schema.update({c: pa.array([], type=pa.int64()) for c in tcols})
        if plan.kind == "sequence":
            schema["span_us"] = pa.array([], type=pa.int64())
        res = pa.table(schema)
    else:
        res = pa.concat_tables(parts, promote_options="default").sort_by(
            [(k_, "ascending") for k_ in keys]
            + ([("match_no", "ascending")] if plan.kind == "sequence" else [])
        )
    return _apply_result_pipes(res, plan.pipes, skip_first_bound=False)


def _apply_result_pipes(
    res: pa.Table, pipes: list[tuple], *, skip_first_bound: bool
) -> pa.Table:
    """head/tail/count/unique over a (small, driver-side) result table.
    ``skip_first_bound``: the event path already consumed its first
    head/tail/count/unique during the streamed pass."""
    skipped = not skip_first_bound
    for p_ in pipes:
        if not skipped and p_[0] in ("head", "tail", "count", "unique"):
            skipped = True
            continue
        if p_[0] == "head":
            res = res.slice(0, p_[1])
        elif p_[0] == "tail":
            res = res.slice(max(0, res.num_rows - p_[1]))
        elif p_[0] == "count":
            res = pa.table(
                {"count": pa.array([res.num_rows], type=pa.int64())}
            )
        elif p_[0] == "unique":
            seen: set = set()
            keep = []
            for i, v in enumerate(res[p_[1]].to_pylist()):
                if v not in seen:
                    seen.add(v)
                    keep.append(i)
            res = res.take(pa.array(keep, type=pa.int64()))
    return res
