"""ES ``intervals`` query — the full rule ALGEBRA (docs:
query-dsl-intervals-query): nested ``match`` / ``any_of`` / ``all_of``
sources with ``containing`` / ``not_containing`` / ``contained_by`` /
``not_contained_by`` / ``before`` / ``after`` filters, under Lucene's
MINIMAL-interval semantics (an interval set never keeps an interval that
strictly contains another — Vigna 2013, the contract every rule composes
through).

`phrase.intervals_match` answers the flat ``match`` rule as a vectorized
doc-membership test; this module adds the nested algebra, which needs the
intervals THEMSELVES.  Evaluation is per candidate doc over in-doc
position arrays (tiny: tf per doc), with the interval combinators written
as greedy two-pointer passes — NOT naive enumeration — so the pytest
reference (exhaustive enumeration + minimality reduction) is a genuinely
independent oracle.

Scale shape: candidate docs come from the positional postings of the
spec's REQUIRED leaf terms (intersection when the spec demands every
child, union otherwise); per-doc evaluation is embarrassingly parallel by
doc and runs inside the segment-pool actors exactly like the phrase
kernels (doc-disjoint slices), so nothing here shuffles.  The in-process
loop below is the per-segment kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .query import SegmentStore

Interval = tuple[int, int]

_FILTER_KEYS = (
    "containing",
    "not_containing",
    "contained_by",
    "not_contained_by",
    "before",
    "after",
)


def minimal_intervals(cands: list[Interval]) -> list[Interval]:
    """Reduce to Lucene's minimal set: drop any interval that contains
    another (ties deduped).  Scanning by (end ASC, start DESC), a
    candidate contains some retained interval iff its start <= the max
    retained start so far (all retained ends are <= its end)."""
    out: list[Interval] = []
    best_start = -1
    for st, en in sorted(set(cands), key=lambda iv: (iv[1], -iv[0])):
        if st <= best_start:
            continue
        out.append((st, en))
        best_start = st
    return sorted(out)


def _match_intervals(
    pos_lists: list[np.ndarray], ordered: bool, max_gaps: int
) -> list[Interval]:
    """Minimal intervals of the ``match`` rule over single-token clauses."""
    if any(len(p) == 0 for p in pos_lists):
        return []
    if len(pos_lists) == 1:
        return [(int(p), int(p)) for p in pos_lists[0]]
    k = len(pos_lists)
    if ordered:
        # backward greedy: for each occurrence of the LAST term, chain the
        # largest strictly-earlier occurrence of each previous term — the
        # minimal-width interval ending there (starts rise with ends, so
        # the minimality pass only dedupes)
        ends = pos_lists[-1].astype(np.int64)
        cur = ends.copy()
        ok = np.ones(len(ends), dtype=bool)
        for j in range(k - 2, -1, -1):
            arr = pos_lists[j].astype(np.int64)
            idx = np.searchsorted(arr, cur, side="left") - 1
            ok &= idx >= 0
            cur = np.where(ok, arr[np.maximum(idx, 0)], cur)
        cands = [
            (int(s), int(e))
            for s, e, o in zip(cur, ends, ok)
            if o and (e - s + 1) - k <= max_gaps
        ]
        return minimal_intervals(cands)
    # unordered: smallest window covering one occurrence of every clause —
    # overlapping positions ALLOWED (Lucene's Intervals.unordered
    # contract since LUCENE-8828); classic merged two-pointer.  Repeated
    # term clauses (identical position arrays — positions are token
    # slots, so identical arrays ⇔ the same term) group together and the
    # window must hold that many DISTINCT occurrences of the term, which
    # is Lucene's behavior for e.g. {"query": "a a", "ordered": false}.
    groups: dict[bytes, int] = {}
    uniq_arrs: list[np.ndarray] = []
    need: list[int] = []
    for arr in pos_lists:
        key = arr.tobytes()
        if key in groups:
            need[groups[key]] += 1
        else:
            groups[key] = len(uniq_arrs)
            uniq_arrs.append(arr)
            need.append(1)
    g = len(uniq_arrs)
    if any(len(arr) < n for arr, n in zip(uniq_arrs, need)):
        return []
    need_a = np.asarray(need, dtype=np.int64)
    tagged = np.concatenate(
        [np.stack([arr, np.full(len(arr), j)], axis=1) for j, arr in enumerate(uniq_arrs)]
    ).astype(np.int64)
    tagged = tagged[np.argsort(tagged[:, 0], kind="stable")]
    counts = np.zeros(g, dtype=np.int64)
    have = 0
    lo = 0
    cands: list[Interval] = []
    for hi in range(len(tagged)):
        t = int(tagged[hi, 1])
        counts[t] += 1
        if counts[t] == need_a[t]:
            have += 1
        while have == g:
            cands.append((int(tagged[lo, 0]), int(tagged[hi, 0])))
            tl = int(tagged[lo, 1])
            if counts[tl] == need_a[tl]:
                have -= 1
            counts[tl] -= 1
            lo += 1
    cands = [c for c in cands if (c[1] - c[0] + 1) - k <= max_gaps]
    return minimal_intervals(cands)


def _all_of_ordered(
    children: list[list[Interval]], max_gaps: int
) -> list[Interval]:
    """Minimal intervals containing one interval per child, in order,
    non-overlapping, with total inter-child gaps <= max_gaps (<0 = no
    bound, the ES default).  Backward greedy: minimal child sets have
    starts rising with ends, so chaining the largest child interval whose
    end precedes the current start maximizes the overall start per end."""
    if any(not c for c in children):
        return []
    cands: list[Interval] = []
    for last in children[-1]:
        cur_start, cur_end = last
        gaps = 0
        ok = True
        for child in reversed(children[:-1]):
            # largest end strictly before cur_start
            pred = None
            for iv in reversed(child):  # sorted by start asc ≈ end asc
                if iv[1] < cur_start:
                    pred = iv
                    break
            if pred is None:
                ok = False
                break
            gaps += cur_start - pred[1] - 1
            cur_start = pred[0]
        if ok and (max_gaps < 0 or gaps <= max_gaps):
            cands.append((cur_start, cur_end))
    return minimal_intervals(cands)


def _all_of_unordered(children: list[list[Interval]]) -> list[Interval]:
    """Minimal covering windows of one interval per child, any order —
    children MAY overlap (Lucene's ``Intervals.unordered`` contract since
    LUCENE-8828).  Bounded product enumeration with a loud cap — per-doc
    minimal sets are tf-sized; the cap is the honesty guard, not a silent
    truncation."""
    if any(not c for c in children):
        return []
    total = 1
    for c in children:
        total *= len(c)
        if total > 10_000:
            raise ValueError(
                "all_of (unordered) per-doc combination count exceeds the "
                "10k kernel cap — narrow the child sources"
            )
    from itertools import product

    cands: list[Interval] = []
    for combo in product(*children):
        cands.append(
            (min(iv[0] for iv in combo), max(iv[1] for iv in combo))
        )
    return minimal_intervals(cands)


def _apply_filter(
    src: list[Interval], kind: str, flt: list[Interval]
) -> list[Interval]:
    if kind == "containing":
        return [iv for iv in src if any(iv[0] <= f[0] and f[1] <= iv[1] for f in flt)]
    if kind == "not_containing":
        return [iv for iv in src if not any(iv[0] <= f[0] and f[1] <= iv[1] for f in flt)]
    if kind == "contained_by":
        return [iv for iv in src if any(f[0] <= iv[0] and iv[1] <= f[1] for f in flt)]
    if kind == "not_contained_by":
        return [iv for iv in src if not any(f[0] <= iv[0] and iv[1] <= f[1] for f in flt)]
    if kind == "before":
        return [iv for iv in src if any(iv[1] < f[0] for f in flt)]
    if kind == "after":
        return [iv for iv in src if any(iv[0] > f[1] for f in flt)]
    raise ValueError(f"unknown intervals filter {kind!r}")


def eval_intervals(
    spec: dict, positions_of: dict[str, np.ndarray]
) -> list[Interval]:
    """Evaluate one intervals SOURCE against a doc's per-term position
    arrays → the rule's minimal interval set for that doc."""
    if len(spec) != 1:
        raise ValueError("intervals spec must have exactly one rule key")
    rule, body = next(iter(spec.items()))
    flt = body.get("filter")
    if rule == "match":
        terms = body["query"].split()
        out = _match_intervals(
            [positions_of.get(t, np.empty(0, dtype=np.int64)) for t in terms],
            bool(body.get("ordered", False)),
            int(body.get("max_gaps", -1)) if int(body.get("max_gaps", -1)) >= 0 else 10**9,
        )
    elif rule == "any_of":
        cands: list[Interval] = []
        for child in body["intervals"]:
            cands.extend(eval_intervals(child, positions_of))
        out = minimal_intervals(cands)
    elif rule == "all_of":
        children = [eval_intervals(c, positions_of) for c in body["intervals"]]
        if body.get("ordered", False):
            out = _all_of_ordered(children, int(body.get("max_gaps", -1)))
        else:
            if int(body.get("max_gaps", -1)) >= 0:
                raise ValueError(
                    "all_of (unordered) max_gaps is not supported — the "
                    "public semantics are underspecified; use ordered"
                )
            out = _all_of_unordered(children)
    else:
        raise ValueError(f"unknown intervals rule {rule!r}")
    if flt:
        if len(flt) != 1:
            raise ValueError("intervals filter must have exactly one key")
        kind, fspec = next(iter(flt.items()))
        if kind not in _FILTER_KEYS:
            raise ValueError(f"unknown intervals filter {kind!r}")
        out = _apply_filter(out, kind, eval_intervals(fspec, positions_of))
    return out


def _leaf_terms(spec: dict, required: bool, req: set, opt: set) -> None:
    rule, body = next(iter(spec.items()))
    if rule == "match":
        terms = body["query"].split()
        (req if required else opt).update(terms)
    elif rule == "any_of":
        for child in body["intervals"]:
            _leaf_terms(child, False, req, opt)
    elif rule == "all_of":
        for child in body["intervals"]:
            _leaf_terms(child, required, req, opt)
    flt = body.get("filter")
    if flt:
        _leaf_terms(next(iter(flt.values())), False, req, opt)


def intervals_search(store: SegmentStore, spec: dict) -> pa.Table:
    """Run one intervals spec over a positional index → one row per
    matching doc: (doc_id, n_intervals, first_start, first_end), doc
    ascending; ``first`` = the minimal set's smallest-start interval.

    Candidates: docs holding every REQUIRED leaf term (intersection) when
    the spec requires any, else the union of all leaf docs; positions are
    sliced per doc from the flat positional postings with searchsorted —
    the per-doc kernel is ``eval_intervals``."""
    spec = expand_spec(store, spec)
    req: set[str] = set()
    opt: set[str] = set()
    _leaf_terms(spec, True, req, opt)
    all_terms = sorted(req | opt)
    per_term: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for t in all_terms:
        d, tf, pos = store.postings_positions(t)
        order = np.argsort(d, kind="stable")
        starts = np.concatenate(([0], np.cumsum(tf.astype(np.int64))))
        # reorder the flat position stream to doc-ascending
        seg = [pos[starts[i]: starts[i + 1]] for i in order]
        tf_sorted = tf[order].astype(np.int64)
        per_term[t] = (
            d[order].astype(np.int64),
            np.concatenate(([0], np.cumsum(tf_sorted))),
            np.concatenate(seg) if seg else np.empty(0, dtype=np.int64),
        )
    if req:
        cands: np.ndarray | None = None
        for t in sorted(req):
            dt = per_term[t][0]
            cands = dt if cands is None else np.intersect1d(cands, dt)
    else:
        cands = np.unique(
            np.concatenate([per_term[t][0] for t in all_terms])
            if all_terms
            else np.empty(0, dtype=np.int64)
        )
    rows = []
    for doc in (cands if cands is not None else []):
        positions_of: dict[str, np.ndarray] = {}
        for t in all_terms:
            d, cum, flat = per_term[t]
            i = int(np.searchsorted(d, doc))
            if i < len(d) and d[i] == doc:
                positions_of[t] = flat[cum[i]: cum[i + 1]].astype(np.int64)
        ivs = eval_intervals(spec, positions_of)
        if ivs:
            rows.append((int(doc), len(ivs), ivs[0][0], ivs[0][1]))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_intervals": pa.array([r[1] for r in rows], type=pa.int64()),
            "first_start": pa.array([r[2] for r in rows], type=pa.int64()),
            "first_end": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


_MAX_EXPANSIONS = 128  # ES intervals contract: error past 128 expansions


def expand_spec(store: SegmentStore, spec: dict) -> dict:
    """Rewrite the multi-term interval sources — ``prefix`` / ``wildcard``
    / ``fuzzy`` / ``range`` — into ``any_of`` over their dictionary
    expansions, so the algebra only ever sees ``match`` leaves.  Mirrors
    ES's contract exactly: each source expands to AT MOST 128 terms and
    ERRORS beyond (never silently truncates); expansion rides the same
    footer-pruned dictionary scans as the standalone queries."""
    import fnmatch
    import re as _re

    rule, body = next(iter(spec.items()))
    if rule in ("match", "any_of", "all_of"):
        out_body = dict(body)
        if rule in ("any_of", "all_of"):
            out_body["intervals"] = [
                expand_spec(store, c) for c in body["intervals"]
            ]
        if body.get("filter"):
            kind, fspec = next(iter(body["filter"].items()))
            out_body["filter"] = {kind: expand_spec(store, fspec)}
        return {rule: out_body}
    if rule == "prefix":
        terms = store.td.terms_with_prefix(body["prefix"])
    elif rule == "wildcard":
        pattern = body["pattern"]
        wc = min(
            [i for i, ch in enumerate(pattern) if ch in "*?"] or [len(pattern)]
        )
        if wc == 0:
            raise ValueError(
                "intervals wildcard: leading-wildcard patterns are not "
                "allowed (full-vocab scan)"
            )
        rx = _re.compile(fnmatch.translate(pattern))
        terms = [
            t for t in store.td.terms_with_prefix(pattern[:wc]) if rx.match(t)
        ]
    elif rule == "fuzzy":
        terms = store.td.terms_fuzzy(
            body["term"], int(body.get("fuzziness", 1))
        )
    elif rule == "range":
        # ES supports one-sided bounds (gte/gt/lte/lt); reject unknown
        # keys with a clean ValueError (the compiler's refusal contract)
        bad = set(body) - {"gte", "gt", "lte", "lt", "analyzer", "use_field"}
        if bad:
            raise ValueError(
                f"intervals range: unsupported keys {sorted(bad)!r}"
            )
        lo_i, lo_x = body.get("gte"), body.get("gt")
        hi_i, hi_x = body.get("lte"), body.get("lt")
        if lo_i is None and lo_x is None and hi_i is None and hi_x is None:
            raise ValueError(
                "intervals range: needs at least one of gte/gt/lte/lt"
            )

        def _in_range(t: str) -> bool:
            if lo_i is not None and not (t >= lo_i):
                return False
            if lo_x is not None and not (t > lo_x):
                return False
            if hi_i is not None and not (t <= hi_i):
                return False
            if hi_x is not None and not (t < hi_x):
                return False
            return True

        terms = [t for t in store.td.vocab() if _in_range(t)]
    else:
        raise ValueError(f"unknown intervals rule {rule!r}")
    if len(terms) > _MAX_EXPANSIONS:
        raise ValueError(
            f"intervals {rule} expands to {len(terms)} terms "
            f"(> {_MAX_EXPANSIONS}) — ES errors here too"
        )
    if not terms:
        # an empty expansion matches nothing: an impossible match leaf
        return {"match": {"query": "\x00__nomatch__"}}
    return {
        "any_of": {
            "intervals": [{"match": {"query": t}} for t in sorted(terms)]
        }
    }
