"""ES retriever trees (8.14+): composable ranking as a recursive spec.

Elasticsearch's ``retriever`` search section replaces the flat query/knn/
rescore triple with a TREE: leaves retrieve (``standard`` = the query DSL,
``knn`` = vector search) and inner nodes combine (``rrf``, ``linear``) or
transform (``rescorer``).  The graft evaluates the same JSON-shaped spec
recursively, each node compiling onto an already-verified kernel:

- ``standard``  → the BM25 scorer (``query.score_query``) per fixture query
- ``knn``       → the exact-cosine scan (``ann.knn_bruteforce``)
- ``rrf``       → reciprocal rank fusion Σ 1/(rank_constant + rank) over the
                  children's top-``rank_window_size`` (ES's formula)
- ``linear``    → per-child minmax normalization × weight, summed
- ``rescorer``  → child's top-``window_size`` re-scored as ``score + boost ·
                  pivot / (pivot + |dl − origin|)`` — the distance_feature
                  shape standing in for a model second stage; doc lengths
                  come from a row-group-PRUNED forward-map read bounded by
                  queries × window, never corpus-sized

Unknown node types and malformed specs raise like ES's retriever parsing.
Every node returns per-query rankings with the house tie rule (rounded
score DESC, doc ASC), so any composition stays deterministic and
SQL-mirrorable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bm25 import sql_round


def _rank(rows: dict[int, float], k: int, round_decimals: int) -> list[tuple[int, float]]:
    out = sorted(
        ((d, float(sql_round(s, round_decimals))) for d, s in rows.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return out[:k]


def _minmax(scores: np.ndarray) -> np.ndarray:
    lo, hi = float(scores.min()), float(scores.max())
    if hi == lo:
        return np.ones_like(scores)
    return (scores - lo) / (hi - lo)


class _Ctx:
    def __init__(self, sf_dir: str, store, index_dir: str, queries_tbl: pa.Table,
                 round_decimals: int):
        self.sf_dir = sf_dir
        self.store = store
        self.index_dir = index_dir
        self.queries = queries_tbl
        self.round = round_decimals
        self._dl_cache: dict[int, int] = {}

    def doc_dl(self, doc_ids: set[int]) -> dict[int, int]:
        missing = [d for d in doc_ids if d not in self._dl_cache]
        if missing:
            import os

            import pyarrow.dataset as pads

            t = pads.dataset(os.path.join(self.index_dir, "forward_map")).to_table(
                columns=["doc_id", "dl"],
                filter=pads.field("doc_id").isin(sorted(missing)),
            )
            for d, l in zip(t["doc_id"].to_pylist(), t["dl"].to_pylist()):
                self._dl_cache[int(d)] = int(l)
        return self._dl_cache


def _eval(spec: dict, ctx: _Ctx) -> dict[int, list[tuple[int, float]]]:
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError("retriever: spec must be a single-key object")
    kind, body = next(iter(spec.items()))
    if kind == "standard":
        window = int(body.get("window", 20))
        from .query import score_query

        out = {}
        for qid, text in zip(
            ctx.queries["query_id"].to_pylist(), ctx.queries["text"].to_pylist()
        ):
            out[int(qid)] = score_query(
                ctx.store, text, window, round_decimals=ctx.round
            )
        return out
    if kind == "knn":
        window = int(body.get("window", 20))
        from .ann import knn_bruteforce

        knn = knn_bruteforce(ctx.sf_dir, n_queries=ctx.queries.num_rows, k=window)
        out: dict[int, list[tuple[int, float]]] = {}
        for q, v, s in zip(
            knn["query_id"].to_pylist(), knn["vec_id"].to_pylist(),
            knn["sim"].to_pylist(),
        ):
            out.setdefault(int(q), []).append((int(v), float(s)))
        for q in ctx.queries["query_id"].to_pylist():
            out.setdefault(int(q), [])
        return out
    if kind == "rrf":
        kids = body.get("retrievers")
        if not kids or len(kids) < 2:
            raise ValueError("retriever: rrf needs >= 2 child retrievers")
        k0 = int(body.get("rank_constant", 60))
        window = int(body.get("rank_window_size", 20))
        acc: dict[int, dict[int, float]] = {}
        for kid in kids:
            for q, ranking in _eval(kid, ctx).items():
                rows = acc.setdefault(q, {})
                for r, (d, _s) in enumerate(ranking[:window], start=1):
                    rows[d] = rows.get(d, 0.0) + 1.0 / (k0 + r)
        return {q: _rank(rows, window, ctx.round) for q, rows in acc.items()}
    if kind == "linear":
        kids = body.get("retrievers")
        if not kids or len(kids) < 2:
            raise ValueError("retriever: linear needs >= 2 child retrievers")
        window = int(body.get("rank_window_size", 20))
        acc: dict[int, dict[int, float]] = {}
        for kid in kids:
            w = float(kid.get("weight", 1.0))
            norm_kind = kid.get("normalizer", "minmax")
            child = {
                k: v for k, v in kid.items() if k not in ("weight", "normalizer")
            }
            from .ann import _NORMALIZERS

            if norm_kind not in _NORMALIZERS:
                raise ValueError(f"retriever: unknown normalizer {norm_kind!r}")
            norm_fn = _NORMALIZERS[norm_kind] if norm_kind != "minmax" else _minmax
            for q, ranking in _eval(child, ctx).items():
                rows = acc.setdefault(q, {})
                top = ranking[:window]
                if not top:
                    continue
                norm = norm_fn(np.array([s for _, s in top], dtype=np.float64))
                for (d, _s), ns in zip(top, norm.tolist()):
                    rows[d] = rows.get(d, 0.0) + w * ns
        return {q: _rank(rows, window, ctx.round) for q, rows in acc.items()}
    if kind == "rescorer":
        child = body.get("retriever")
        if child is None:
            raise ValueError("retriever: rescorer needs a child retriever")
        window = int(body.get("window_size", 10))
        boost = float(body.get("boost", 0.1))
        pivot = float(body.get("pivot", 10.0))
        origin = float(body.get("origin", 32.0))
        base = _eval(child, ctx)
        need = {d for ranking in base.values() for d, _ in ranking[:window]}
        dls = ctx.doc_dl(need)
        out = {}
        for q, ranking in base.items():
            rows = {
                d: s + boost * pivot / (pivot + abs(dls[d] - origin))
                for d, s in ranking[:window]
            }
            out[q] = _rank(rows, window, ctx.round)
        return out
    raise ValueError(f"retriever: unknown retriever type {kind!r}")


def retriever_search(
    sf_dir: str,
    store,
    index_dir: str,
    queries_tbl: pa.Table,
    spec: dict,
    k: int = 10,
    round_decimals: int = 6,
) -> pa.Table:
    """Evaluate one retriever tree for every fixture query → the usual
    (query_id, rank, doc_id, score) result table."""
    ctx = _Ctx(sf_dir, store, index_dir, queries_tbl, round_decimals)
    res = _eval(spec, ctx)
    qids, ranks, docs, scores = [], [], [], []
    for q in sorted(res):
        for rank, (d, s) in enumerate(res[q][:k], start=1):
            qids.append(q)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )
