"""ES ``_search`` endpoint: the JSON query-DSL body compiler.

Every other module exposes the engine's operators as Python kernels; real
ES users write JSON bodies.  ``run_search(store, body)`` accepts the
``_search`` request shape — ``{"query": {...}, "size": k, "from": n}`` —
and compiles the query tree onto the SAME green kernels (``_score_map``,
``phrase_topk``, ``prefix_match`` …), so the compiler adds plumbing, not
new scoring math.  Supported query types:

  match (operator and/or, per-leaf minimum_should_match, boost), term
  (boost), terms, match_phrase, exists, bool (must / should / must_not /
  filter, minimum_should_match with the full Lucene grammar — int,
  negatives, percentages, "u<spec" conditionals — and boost),
  match_phrase_prefix (max_expansions; single token → prefix),
  boosting (negative_boost demotion), constant_score, dis_max
  (tie_breaker), prefix, wildcard, fuzzy, intervals, ids, range
  (gte/gt/lte/lt on the index's dl field), query_string (full Lucene
  grammar + minimum_should_match) and simple_query_string (embedded
  leaves through the real parsers).  match_phrase accepts slop
  (chained-gap kernel, constant-scored).
  Pure-must_not bools match the complement at score 0 (ES semantics).

Scoring contract: match/term/match_phrase score BM25 exactly like their
kernels; prefix / wildcard / fuzzy / intervals score a CONSTANT 1.0 per
matching doc (Lucene's constant-score multi-term rewrite; for intervals
this is a documented simplification of Lucene's frequency-based interval
score).  The corpus is a single analyzed field, so the field name in the
body is accepted and ignored (documented).  Ranking: rounded score DESC,
doc ASC — the shared contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .query import SegmentStore

_Scored = tuple[np.ndarray, np.ndarray]  # (sorted unique docs, scores)


def _empty() -> _Scored:
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)


def _merge_sum(parts: list[_Scored]) -> _Scored:
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return _empty()
    all_docs = np.concatenate([d for d, _ in parts])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate([s for _, s in parts]))
    return uniq, scores


def _leaf_text(body) -> str:
    """Unwrap {"field": "text"} / {"field": {"query"|"value": "text"}}."""
    if len(body) != 1:
        raise ValueError("search: leaf query needs exactly one field")
    v = next(iter(body.values()))
    if isinstance(v, dict):
        for key in ("query", "value"):
            if key in v:
                return v[key]
        raise ValueError("search: leaf options need 'query' or 'value'")
    return v


def _eval(store: SegmentStore, q: dict) -> _Scored:
    from .intervals import intervals_search
    from .phrase import (
        fuzzy_match,
        phrase_topk,
        prefix_match,
        wildcard_match,
    )
    from .structured import _score_map

    if len(q) != 1:
        raise ValueError("search: query object needs exactly one type key")
    kind, body = next(iter(q.items()))
    if kind in ("match", "term"):
        docs, scores = _score_map(store, _leaf_text(body))
        opts = next(iter(body.values())) if len(body) == 1 else None
        if isinstance(opts, dict):
            if kind == "match":
                op = opts.get("operator", "or")
                if op not in ("or", "and"):
                    raise ValueError(f"search: match operator {op!r}")
                msm_spec = opts.get("minimum_should_match")
                from ..functions.tokenize import tokenize_query

                terms = sorted(set(tokenize_query(_leaf_text(body))))
                # ES: operator=and requires every analyzed term; an
                # explicit msm requires that many distinct terms (full
                # Lucene grammar).  Scores stay the BM25 sum either way.
                need = (
                    len(terms)
                    if op == "and"
                    else (
                        parse_min_should_match(msm_spec, len(terms))
                        if msm_spec is not None
                        else 0
                    )
                )
                if need > 0:
                    counts = np.zeros(len(docs), dtype=np.int64)
                    for t in terms:
                        td, _ = _score_map(store, t)
                        counts += np.isin(docs, td, assume_unique=True)
                    keep = counts >= need
                    docs, scores = docs[keep], scores[keep]
            # leaf boost (match AND term): multiplies the leaf's scores
            # before any enclosing sum, like Lucene's BoostQuery
            boost = float(opts.get("boost", 1.0))
            if boost != 1.0:
                scores = scores * boost
        return docs, scores
    if kind == "match_phrase":
        opts = next(iter(body.values())) if len(body) == 1 else None
        slop = (
            int(opts.get("slop", 0)) if isinstance(opts, dict) else 0
        )
        if slop < 0:
            raise ValueError("search: match_phrase slop must be >= 0")
        if slop > 0:
            # ES match_phrase + slop (chained-gap semantics via the
            # phrase_match_slop kernel); matches score a constant 1.0 —
            # the documented simplification of Lucene's sloppy-freq
            # scoring, same contract as the other proximity leaves
            from .phrase import phrase_match_slop

            d = np.unique(
                phrase_match_slop(store, _leaf_text(body), slop=slop).astype(
                    np.int64
                )
            )
            return d, np.ones(len(d), dtype=np.float64)
        pairs = phrase_topk(store, _leaf_text(body), k=store.n_docs)
        if not pairs:
            return _empty()
        d = np.array([p[0] for p in pairs], dtype=np.int64)
        s = np.array([p[1] for p in pairs], dtype=np.float64)
        order = np.argsort(d, kind="stable")
        return d[order], s[order]
    if kind == "prefix":
        d = np.unique(prefix_match(store, _leaf_text(body)).astype(np.int64))
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "wildcard":
        d = np.unique(wildcard_match(store, _leaf_text(body)).astype(np.int64))
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "fuzzy":
        opts = next(iter(body.values()))
        fz = opts.get("fuzziness", 1) if isinstance(opts, dict) else 1
        d = np.unique(
            fuzzy_match(store, _leaf_text(body), max_dist=fz).astype(np.int64)
        )
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "intervals":
        if len(body) != 1:
            raise ValueError("search: intervals needs exactly one field")
        spec = next(iter(body.values()))
        t = intervals_search(store, spec)
        d = np.asarray(t["doc_id"], dtype=np.int64)
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "ids":
        # ES ids query: explicit doc ids, constant score 1.0 (the contract
        # query.ids_query implements over the forward map)
        vals = body.get("values")
        if not isinstance(vals, list):
            raise ValueError("search: ids needs a 'values' list")
        import os

        import pyarrow.dataset as pads

        # ES contract: missing ids are simply not found — the id set is
        # pushed into the forward-map scan like mget (row-group pruning)
        want = sorted({int(v) for v in vals})
        t = pads.dataset(
            os.path.join(store.index_dir, "forward_map")
        ).to_table(
            columns=["doc_id"], filter=pads.field("doc_id").isin(want)
        )
        d = np.unique(np.asarray(t["doc_id"], dtype=np.int64))
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "range":
        # filter-context range over the doc-length norm field (the one
        # numeric per-doc field the index itself carries); matches score
        # a constant 1.0 like every filter under the rewrite
        if len(body) != 1:
            raise ValueError("search: range needs exactly one field")
        fname, opts = next(iter(body.items()))
        if fname != "dl":
            raise ValueError("search: range supports the index's dl field")
        import os

        import pyarrow.dataset as pads

        bad = set(opts) - {"gte", "gt", "lte", "lt"}
        if bad:
            raise ValueError(f"search: range keys {sorted(bad)!r}")
        flt = None
        for key, op in (
            ("gte", "__ge__"),
            ("gt", "__gt__"),
            ("lte", "__le__"),
            ("lt", "__lt__"),
        ):
            if opts.get(key) is not None:
                c = getattr(pads.field("dl"), op)(int(opts[key]))
                flt = c if flt is None else flt & c
        if flt is None:
            raise ValueError("search: range needs gte/gt/lte/lt")
        # predicate pushed into the forward-map scan (row-group pruning —
        # only matching rows leave storage, the exists_docs pattern)
        t = pads.dataset(
            os.path.join(store.index_dir, "forward_map")
        ).to_table(columns=["doc_id"], filter=flt)
        d = np.unique(np.asarray(t["doc_id"], dtype=np.int64))
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "match_phrase_prefix":
        # ES: the LAST analyzed token is a dictionary-expanded prefix;
        # a single-token query degrades to a prefix query (ES behavior).
        # Matches score a constant 1.0 (the proximity-leaf contract).
        opts = next(iter(body.values())) if len(body) == 1 else None
        max_exp = (
            int(opts.get("max_expansions", 50))
            if isinstance(opts, dict)
            else 50
        )
        toks = str(_leaf_text(body)).split()
        if not toks:
            raise ValueError("search: match_phrase_prefix needs tokens")
        if len(toks) == 1:
            d = np.unique(prefix_match(store, toks[0]).astype(np.int64))
        else:
            from .phrase import phrase_prefix_match

            d = np.unique(
                phrase_prefix_match(
                    store,
                    " ".join(toks[:-1]),
                    toks[-1],
                    max_expansions=max_exp,
                ).astype(np.int64)
            )
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "boosting":
        # ES boosting query: positive hits keep their score unless they
        # also match the negative clause, which demotes by negative_boost
        pos_d, pos_s = _eval(store, body["positive"])
        neg_d, _ = _eval(store, body["negative"])
        nb = float(body.get("negative_boost", 0.5))
        hit = np.isin(pos_d, neg_d, assume_unique=True)
        return pos_d, np.where(hit, pos_s * nb, pos_s)
    if kind == "query_string":
        # the embedded Lucene query-string leaf (ES bodies routinely
        # carry one): full grammar via the real parser, scores unrounded
        # so enclosing sums round once at the end
        from .lucene import query_string_topk

        qs = body.get("query")
        if not isinstance(qs, str):
            raise ValueError("search: query_string needs a 'query' string")
        pairs = query_string_topk(
            store,
            qs,
            k=store.n_docs,
            round_decimals=None,
            minimum_should_match=body.get("minimum_should_match"),
        )
        if not pairs:
            return _empty()
        d = np.array([p[0] for p in pairs], dtype=np.int64)
        s = np.array([p[1] for p in pairs], dtype=np.float64)
        order = np.argsort(d, kind="stable")
        return d[order], s[order]
    if kind == "simple_query_string":
        from .structured import simple_query_string_topk

        qs = body.get("query")
        if not isinstance(qs, str):
            raise ValueError(
                "search: simple_query_string needs a 'query' string"
            )
        pairs = simple_query_string_topk(
            store, qs, store.n_docs, round_decimals=None
        )
        if not pairs:
            return _empty()
        d = np.array([p[0] for p in pairs], dtype=np.int64)
        s = np.array([p[1] for p in pairs], dtype=np.float64)
        order = np.argsort(d, kind="stable")
        return d[order], s[order]
    if kind == "constant_score":
        docs, _ = _eval(store, body["filter"])
        boost = float(body.get("boost", 1.0))
        return docs, np.full(len(docs), boost, dtype=np.float64)
    if kind == "exists":
        # ES exists query: every doc carrying the field, constant score
        # 1.0 — the engine's stored fields are the forward-map columns
        field = body.get("field")
        if field not in ("content", "repo", "path", "commit", "lang", "dl"):
            raise ValueError(f"search: exists field {field!r}")
        d = _all_docs(store)
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "terms":
        # ES terms query: docs matching ANY of the listed values,
        # constant score 1.0 (filter context)
        if len(body) != 1:
            raise ValueError("search: terms needs exactly one field")
        values = next(iter(body.values()))
        if not isinstance(values, list):
            raise ValueError("search: terms needs a list of values")
        sets = []
        for v in values:
            td, _ = _score_map(store, str(v))
            sets.append(td)
        d = (
            np.unique(np.concatenate(sets))
            if sets
            else np.empty(0, dtype=np.int64)
        )
        return d, np.ones(len(d), dtype=np.float64)
    if kind == "dis_max":
        parts = [_eval(store, c) for c in body["queries"]]
        tie = float(body.get("tie_breaker", 0.0))
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _empty()
        uniq = np.unique(np.concatenate([d for d, _ in parts]))
        best = np.zeros(len(uniq), dtype=np.float64)
        total = np.zeros(len(uniq), dtype=np.float64)
        for d, s in parts:
            pos = np.searchsorted(uniq, d)
            np.maximum.at(best, pos, s)
            np.add.at(total, pos, s)
        return uniq, best + tie * (total - best)
    if kind == "bool":
        must = [_eval(store, c) for c in _as_list(body.get("must"))]
        should = [_eval(store, c) for c in _as_list(body.get("should"))]
        cand: np.ndarray | None = None
        for d, _ in must:
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        # ES defaults minimum_should_match to 0 when the bool carries must
        # OR filter clauses (should becomes purely optional scoring), 1
        # only when should is the sole doc source; explicit values accept
        # the full Lucene grammar (int / "-2" / "75%" / "2<-25% 9<-3")
        raw_msm = body.get(
            "minimum_should_match",
            0 if (must or _as_list(body.get("filter"))) else 1,
        )
        msm = parse_min_should_match(raw_msm, len(should))
        if should and msm > 0:
            sd = [d for d, _ in should if len(d)]
            if not sd:
                return _empty()
            docs, counts = np.unique(np.concatenate(sd), return_counts=True)
            ok = docs[counts >= msm]
            cand = ok if cand is None else np.intersect1d(cand, ok, assume_unique=True)
        docs_sum, scores_sum = _merge_sum(must + should)
        if cand is None:
            # reached only when must is empty AND (should is empty or
            # msm == 0 — a should set under msm > 0 assigned cand above)
            flts = _as_list(body.get("filter"))
            if not must and not should:
                # pure filter / pure must_not context: ES matches the
                # filter set at score 0.0; seed candidates from the FIRST
                # filter, or from the full doc set when only must_not
                # clauses exist (ES supports must_not-only bools)
                if flts:
                    cand, _ = _eval(store, flts[0])
                    body = dict(body, filter=flts[1:])
                elif _as_list(body.get("must_not")):
                    cand = _all_docs(store)
                else:
                    raise ValueError(
                        "search: bool needs at least one scoring, filter "
                        "or must_not clause"
                    )
            elif flts:
                # should at msm=0 next to filter clauses: should is
                # optional scoring only — the filter set is the doc
                # source (ES), should contributions land in the score sum
                cand, _ = _eval(store, flts[0])
                body = dict(body, filter=flts[1:])
            else:
                cand = docs_sum
        for c in _as_list(body.get("filter")):
            fd, _ = _eval(store, c)
            cand = np.intersect1d(cand, fd, assume_unique=True)
        for c in _as_list(body.get("must_not")):
            nd, _ = _eval(store, c)
            cand = np.setdiff1d(cand, nd, assume_unique=True)
        if cand is None or len(cand) == 0:
            return _empty()
        keep = np.searchsorted(docs_sum, cand)
        ok = (keep < len(docs_sum)) & (
            docs_sum[np.minimum(keep, max(len(docs_sum) - 1, 0))] == cand
        ) if len(docs_sum) else np.zeros(len(cand), dtype=bool)
        scores = np.zeros(len(cand), dtype=np.float64)
        if len(docs_sum):
            scores[ok] = scores_sum[keep[ok]]
        boost = float(body.get("boost", 1.0))
        return cand, scores * boost if boost != 1.0 else scores
    raise ValueError(f"search: unsupported query type {kind!r}")


def parse_min_should_match(spec, n_optional: int) -> int:
    """Lucene's ``minimum_should_match`` grammar over ``n_optional``
    should clauses (Queries.calculateMinShouldMatch — public Solr/ES
    spec): integer; negative integer (n − k); percentage (floor of the
    percent of n, truncating); negative percentage (n − floor);
    space-separated conditionals ``u<spec`` where the segment with the
    LARGEST u still below the clause count applies, and a clause count at
    or below every u requires ALL clauses.  The caller interprets the
    result like Lucene: ≤ 0 is unconstrained, > n matches nothing."""
    if isinstance(spec, bool):
        raise ValueError("search: minimum_should_match must be int or str")
    if isinstance(spec, int):
        return spec
    if not isinstance(spec, str):
        raise ValueError("search: minimum_should_match must be int or str")
    s = spec.strip()
    if "<" in s:
        result = n_optional
        best_upper = -1
        for seg in s.split():
            cond, sep, sub = seg.partition("<")
            if not sep or not sub:
                raise ValueError(
                    f"search: bad minimum_should_match segment {seg!r}"
                )
            try:
                upper = int(cond)
            except ValueError:
                raise ValueError(
                    f"search: bad minimum_should_match segment {seg!r}"
                ) from None
            if n_optional > upper and upper > best_upper:
                best_upper = upper
                result = parse_min_should_match(sub, n_optional)
        return result
    if s.endswith("%"):
        try:
            pct = int(s[:-1])
        except ValueError:
            raise ValueError(
                f"search: bad minimum_should_match {spec!r}"
            ) from None
        part = abs(pct) * n_optional // 100
        return n_optional - part if pct < 0 else part
    try:
        v = int(s)
    except ValueError:
        raise ValueError(f"search: bad minimum_should_match {spec!r}") from None
    return n_optional + v if v < 0 else v


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _all_docs(store: SegmentStore) -> np.ndarray:
    """Sorted doc_id universe from the forward map (doc_id column only —
    row-group pruned scan; at scale this is the owning actor's
    partition, exists_docs' contract)."""
    import os

    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(store.index_dir, "forward_map")).to_table(
        columns=["doc_id"]
    )
    return np.unique(np.asarray(t["doc_id"], dtype=np.int64))


def run_search(
    store: SegmentStore, body: dict, round_decimals: int = 6
) -> pa.Table:
    """Execute one ``_search`` body → (rank, doc_id, score), rounded-score
    ranking with doc-ASC ties, honoring ``size`` (default 10) and
    ``from`` (default 0)."""
    if "query" not in body:
        raise ValueError("search: body needs a 'query'")
    docs, scores = _eval(store, body["query"])
    return _rank_hits(store, body, docs, scores, round_decimals)


def _rank_hits(
    store: SegmentStore,
    body: dict,
    docs: np.ndarray,
    scores: np.ndarray,
    round_decimals: int = 6,
) -> pa.Table:
    """Ranking/pagination over an already-evaluated hit set — split out so
    run_search_aggs evaluates the query ONCE for both hits and aggs."""
    from ..functions.bm25 import sql_round, topk_order

    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    if size < 0 or offset < 0:
        raise ValueError("search: size/from must be >= 0")
    scores = sql_round(scores, round_decimals)
    collapse = body.get("collapse")
    if collapse is not None and body.get("sort"):
        raise ValueError("search: collapse does not compose with sort here")
    sort_spec = body.get("sort")
    if sort_spec:
        # ES sort section: keys over _score / _doc / the index's dl
        # field (fetched with the hit-id set pushed into the forward-map
        # scan); final tiebreak doc ASC like every ranking here
        keys: list[np.ndarray] = []
        dirs: list[bool] = []
        for item in sort_spec if isinstance(sort_spec, list) else [sort_spec]:
            if isinstance(item, str):
                field, order_s = item, "desc" if item == "_score" else "asc"
            else:
                if len(item) != 1:
                    raise ValueError("search: sort item needs one field")
                field, opts = next(iter(item.items()))
                order_s = (
                    opts.get("order", "desc" if field == "_score" else "asc")
                    if isinstance(opts, dict)
                    else opts
                )
            if order_s not in ("asc", "desc"):
                raise ValueError(f"search: sort order {order_s!r}")
            if field == "_score":
                keys.append(scores)
            elif field == "_doc":
                keys.append(docs.astype(np.float64))
            elif field == "dl":
                import os

                import pyarrow.dataset as pads

                t = pads.dataset(
                    os.path.join(store.index_dir, "forward_map")
                ).to_table(
                    columns=["doc_id", "dl"],
                    filter=pads.field("doc_id").isin(docs.tolist()),
                )
                fd = np.asarray(t["doc_id"], dtype=np.int64)
                fv = np.asarray(t["dl"], dtype=np.float64)
                o = np.argsort(fd, kind="stable")
                fd, fv = fd[o], fv[o]
                pos = np.searchsorted(fd, docs)
                vals = np.zeros(len(docs), dtype=np.float64)
                hit = (pos < len(fd)) & (fd[np.minimum(pos, max(len(fd) - 1, 0))] == docs) if len(fd) else np.zeros(len(docs), bool)
                vals[hit] = fv[pos[hit]]
                keys.append(vals)
            else:
                raise ValueError(f"search: unsupported sort field {field!r}")
            dirs.append(order_s == "desc")
        # lexsort: last key is primary; doc ASC is the ultimate tiebreak
        lex = [docs.astype(np.float64)]
        for kv, desc in zip(reversed(keys), reversed(dirs)):
            lex.append(-kv if desc else kv)
        order = np.lexsort(tuple(lex))
        sel = order[offset: offset + size]
    elif collapse is not None:
        # ES field collapse: walk the FULL ranking, keep the best doc per
        # field value until from+size groups — field values fetched with
        # the hit-id set pushed into the forward-map scan (at scale this
        # is the owning actor's partition, collapse_topk's contract)
        import os

        import pyarrow.dataset as pads

        field = collapse.get("field")
        if not field:
            raise ValueError("search: collapse needs a 'field'")
        t = pads.dataset(
            os.path.join(store.index_dir, "forward_map")
        ).to_table(
            columns=["doc_id", field],
            filter=pads.field("doc_id").isin(docs.tolist()),
        )
        fd = np.asarray(t["doc_id"], dtype=np.int64)
        fvals = t[field].to_pylist()
        o = np.argsort(fd, kind="stable")
        fd = fd[o]
        fvals = [fvals[i] for i in o]
        full_order = topk_order(scores, docs.astype(np.uint64), len(docs))
        seen: set = set()
        sel_l: list[int] = []
        for i in full_order:
            pos = int(np.searchsorted(fd, docs[i]))
            fv = fvals[pos] if pos < len(fd) and fd[pos] == docs[i] else None
            if fv in seen:
                continue
            seen.add(fv)
            sel_l.append(int(i))
            if len(sel_l) == offset + size:
                break
        sel = np.array(sel_l[offset: offset + size], dtype=np.int64)
    else:
        order = topk_order(scores, docs.astype(np.uint64), offset + size)
        sel = order[offset: offset + size]
    return pa.table(
        {
            "rank": pa.array(
                range(offset + 1, offset + 1 + len(sel)), type=pa.int64()
            ),
            "doc_id": pa.array(docs[sel].astype(np.int64), type=pa.int64()),
            "score": pa.array(scores[sel], type=pa.float64()),
        }
    )


def run_search_aggs(
    index_dir: str,
    store: SegmentStore,
    body: dict,
    round_decimals: int = 6,
) -> dict[str, pa.Table]:
    """The ``_search`` body's ``aggs`` section: run the query for the
    paginated hits, then each named aggregation over the FULL query hit
    set (ES's contract: aggs ignore size/from pagination), delegating to
    the agg kernels (`aggs.terms_agg` / `histogram_agg`).
    Returns {"hits": hits_table, <agg_name>: agg_table, ...}."""
    from .aggs import histogram_agg, terms_agg

    if "query" not in body:
        raise ValueError("search: body needs a 'query'")
    all_docs, all_scores = _eval(store, body["query"])
    hits = _rank_hits(
        store, body, all_docs, all_scores, round_decimals=round_decimals
    )
    matches = pa.table(
        {
            "query_id": pa.array([0] * len(all_docs), type=pa.int64()),
            "doc_id": pa.array(all_docs.astype(np.int64), type=pa.int64()),
        }
    )
    out: dict[str, pa.Table] = {"hits": hits}
    if body.get("highlight"):
        out["highlight"] = _highlight_hits(store, body, hits)
    for name, spec in (body.get("aggs") or {}).items():
        if len(spec) != 1:
            raise ValueError("search: agg spec needs exactly one type key")
        kind, opts = next(iter(spec.items()))
        if kind == "terms":
            out[name] = terms_agg(index_dir, matches, field=opts["field"])
        elif kind == "histogram":
            out[name] = histogram_agg(
                index_dir, matches, interval=int(opts.get("interval", 16))
            )
        else:
            raise ValueError(f"search: unsupported agg type {kind!r}")
    return out


def run_msearch_aggs(
    index_dir: str,
    store: SegmentStore,
    bodies: list[dict],
    round_decimals: int = 6,
) -> dict[str, object]:
    """ES ``_msearch`` with a SHARED ``aggs`` section: evaluate each body
    once, assemble every body's FULL hit set into one (query_id, doc_id)
    matches table, and run each named agg ONCE across all bodies over the
    agg kernel's query_id axis — one Ray pipeline per agg instead of one
    per body (the 50-query fixture set pays one scheduling floor, not 50).
    All bodies must carry the same aggs spec (the shared-template
    contract); per-body paginated hits come back as a list under
    ``"hits"``, each agg as a (query_id, key, doc_count) table keyed by
    body index."""
    from .aggs import histogram_agg, terms_agg

    if not bodies:
        raise ValueError("msearch: needs at least one body")
    aggs_spec = bodies[0].get("aggs") or {}
    evals: list[np.ndarray] = []
    hits: list[pa.Table] = []
    for body in bodies:
        if "query" not in body:
            raise ValueError("search: body needs a 'query'")
        if (body.get("aggs") or {}) != aggs_spec:
            raise ValueError("msearch: bodies must share one aggs spec")
        d, s = _eval(store, body["query"])
        evals.append(d)
        hits.append(
            _rank_hits(store, body, d, s, round_decimals=round_decimals)
        )
    qid = (
        np.concatenate(
            [np.full(len(d), i, dtype=np.int64) for i, d in enumerate(evals)]
        )
        if evals
        else np.empty(0, dtype=np.int64)
    )
    docs = (
        np.concatenate(evals).astype(np.int64)
        if evals
        else np.empty(0, dtype=np.int64)
    )
    matches = pa.table(
        {
            "query_id": pa.array(qid, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )
    out: dict[str, object] = {"hits": hits}
    for name, spec in aggs_spec.items():
        if len(spec) != 1:
            raise ValueError("search: agg spec needs exactly one type key")
        kind, opts = next(iter(spec.items()))
        if kind == "terms":
            out[name] = terms_agg(index_dir, matches, field=opts["field"])
        elif kind == "histogram":
            out[name] = histogram_agg(
                index_dir, matches, interval=int(opts.get("interval", 16))
            )
        else:
            raise ValueError(f"search: unsupported agg type {kind!r}")
    return out


def _highlight_hits(
    store: SegmentStore, body: dict, hits: pa.Table
) -> pa.Table:
    """The ``highlight`` section: per hit doc, located fragments for each
    query term (ES reports marked-up snippets; the engine reports the
    fragment COORDINATES — markup is presentation, `highlight_fragments`'
    documented contract).  Supported for match/term top-level queries
    (the terms are well-defined); needs a positional index."""
    from ..functions.tokenize import tokenize_query
    from .structured import highlight_fragments

    kind, qbody = next(iter(body["query"].items()))
    if kind not in ("match", "term"):
        raise ValueError(
            "search: highlight supports match/term top-level queries"
        )
    opts = next(iter((body["highlight"].get("fields") or {"content": {}}).values()))
    n_frags = int(opts.get("number_of_fragments", 3))
    hit_set = set(hits["doc_id"].to_pylist())
    rows = []
    for t in sorted(set(tokenize_query(_leaf_text(qbody)))):
        for doc, rank, pos, lo, hi in highlight_fragments(
            store, t, n_frags=n_frags
        ):
            if doc in hit_set:
                rows.append((doc, t, rank, pos, lo, hi))
    rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "term": pa.array([r[1] for r in rows], type=pa.string()),
            "frag_rank": pa.array([r[2] for r in rows], type=pa.int64()),
            "pos": pa.array([r[3] for r in rows], type=pa.int64()),
            "snip_start": pa.array([r[4] for r in rows], type=pa.int64()),
            "snip_end": pa.array([r[5] for r in rows], type=pa.int64()),
        }
    )
