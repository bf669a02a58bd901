"""Federated search over multiple indices (ES cross-cluster search).

A corpus indexed as several INDEPENDENT indices (per-tenant, per-epoch,
per-region — doc-disjoint by construction) must answer queries as if it
were one index.  Naive per-index scoring is wrong: BM25 depends on GLOBAL
stats (N, avgdl, df), and each index only knows its own.  Elasticsearch
solves this with ``dfs_query_then_fetch`` — a stats-gathering round before
scoring; ``FederatedStore`` is the same two-phase shape:

- global stats: ``N = Σ n_docs``, ``avgdl = Σ total_dl / N`` (exact — the
  per-index stats artifacts carry total_dl), computed once at construction;
- per-term df: summed across member indices at lookup (doc-disjoint, so
  plain addition is exact — same argument as the build's salted slices);
- postings: member lists concatenate (again doc-disjoint).

Member doc_ids are LOCAL (every index numbers its own corpus from 0);
federation maps them to global ids with per-member ``docBase`` offsets —
exactly Lucene's segment/shard docBase scheme — defaulting to the
cumulative member sizes.  Because the footer-offset docID assigner numbers
docs sequentially in file order, a member built over corpus file set k
plus docBase = Σ sizes of earlier members reproduces the ids the union
build would assign, so every per-(term, doc) contribution is computed from
identical inputs; and since the TAAT kernel accumulates per-doc sums in
sorted-term-major order regardless of doc order within a term, a federated
query is **bit-identical** to the same query on a single index built over
the union corpus (asserted in tests/test_federate.py).  Members are
assumed compacted (no live tombstones — stale member stats would poison
the global stats, same as ES).

``FederatedStore`` duck-types the ``SegmentStore`` query surface
(``n_docs``/``avgdl``/``td.df_of``/``postings``/``df``), so ``score_query``,
``function_score_query``, ``explain_score`` and the boolean set operations
work unchanged over a federation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from .query import SegmentStore


class _FederatedDict:
    """Term-dictionary facade: df = Σ member df (doc-disjoint members)."""

    def __init__(self, stores: list[SegmentStore]):
        self._stores = stores

    def df_of(self, term: str) -> int:
        return sum(s.td.df_of(term) for s in self._stores)

    def df_map(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self._stores:
            for t, d in s.td.df_map().items():
                out[t] = out.get(t, 0) + d
        return out


class FederatedStore:
    """Query-time union of doc-disjoint indices with exact global stats."""

    def __init__(self, index_dirs: list[str], doc_bases: list[int] | None = None):
        if not index_dirs:
            raise ValueError("federation needs at least one index")
        self.stores = [SegmentStore(d) for d in index_dirs]
        if any(s.tombs is not None for s in self.stores):
            raise ValueError(
                "federation members must be compacted first — live "
                "tombstones make member stats stale (lifecycle.compact_index)"
            )
        if doc_bases is None:  # Lucene docBase: cumulative member sizes
            doc_bases = [0]
            for s in self.stores[:-1]:
                doc_bases.append(doc_bases[-1] + s.n_docs)
        if len(doc_bases) != len(self.stores):
            raise ValueError("doc_bases must match index_dirs")
        self.doc_bases = [int(b) for b in doc_bases]
        total_dl = 0
        for d in index_dirs:
            st = pq.read_table(os.path.join(d, "stats.parquet"))
            total_dl += int(st["total_dl"][0].as_py())
        self.n_docs = sum(s.n_docs for s in self.stores)
        self.avgdl = total_dl / self.n_docs if self.n_docs else 0.0
        self.td = _FederatedDict(self.stores)
        self._df_map: dict[str, int] | None = None

    @property
    def df(self) -> dict[str, int]:
        if self._df_map is None:
            self._df_map = self.td.df_map()
        return self._df_map

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        docs_l, tfs_l, dls_l = [], [], []
        for s, base in zip(self.stores, self.doc_bases):
            d, tf, dl = s.postings(term)
            if len(d):
                docs_l.append(d + np.uint64(base))
                tfs_l.append(tf)
                dls_l.append(dl)
        if not docs_l:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e.astype(np.uint32)
        return (
            np.concatenate(docs_l),
            np.concatenate(tfs_l),
            np.concatenate(dls_l),
        )

    def postings_positions(
        self, term: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Positional postings across members (docBase-shifted doc ids) —
        phrase / slop / rescore run unchanged over a federation of
        positional indices."""
        docs_l, tfs_l, pos_l = [], [], []
        for s, base in zip(self.stores, self.doc_bases):
            d, tf, p = s.postings_positions(term)
            if len(d):
                docs_l.append(d + np.uint64(base))
                tfs_l.append(tf)
                pos_l.append(p)
        if not docs_l:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e
        return (
            np.concatenate(docs_l),
            np.concatenate(tfs_l),
            np.concatenate(pos_l),
        )


def indices_boost_topk(
    fed: FederatedStore,
    text: str,
    k: int,
    boosts: list[float],
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``indices_boost``: each hit's BM25 score multiplied by its member
    index's boost before the global ranking (cross-cluster relevance
    tilting — fresh index up, archive down).  Stats stay GLOBAL (the
    federation's dfs phase); only the final per-doc score scales, exactly
    ES's semantics.  Member-of(doc) is one searchsorted against the
    docBase table; ranked (rounded boosted score DESC, doc ASC)."""
    from ..functions.bm25 import sql_round
    from .query import score_query

    if len(boosts) != len(fed.stores):
        raise ValueError("indices_boost: one boost per member index")
    full = score_query(fed, text, k=fed.n_docs, round_decimals=None)
    if not full:
        return []
    docs = np.array([d for d, _ in full], dtype=np.int64)
    scores = np.array([s for _, s in full], dtype=np.float64)
    bases = np.array(fed.doc_bases, dtype=np.int64)
    member = np.searchsorted(bases, docs, side="right") - 1
    boosted = scores * np.asarray(boosts, dtype=np.float64)[member]
    if round_decimals is not None:
        boosted = sql_round(boosted, round_decimals)
    order = np.lexsort((docs, -boosted))[:k]
    return [(int(docs[i]), float(boosted[i])) for i in order]
