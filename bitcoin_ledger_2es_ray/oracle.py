"""In-repo exact BM25 oracle — brute force, single process, no Ray.

SURVEY.md §0.2: the reference engine (Elasticsearch) is absent from the
sandbox, so rank-identity (BASELINE.json L14) is asserted against this
exhaustive scorer, which in turn is cross-checked by the driver's DuckDB SQL
oracle.  It shares the tokenizer with the engine (the ONLY shared code — the
distributed engine must reproduce its output through a completely different
execution path: shuffle, compression, WAND).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .functions.bm25 import B, K1, idf, tf_norm, topk_order
from .functions.tokenize import tokenize_docs, tokenize_query


class BM25Oracle:
    """Exact in-memory BM25 over a tiny corpus.

    Parameters
    ----------
    doc_ids, contents : parallel lists; doc_ids are the global uint64 ids.
    """

    def __init__(self, doc_ids: list[int], contents: list[str], k1: float = K1, b: float = B):
        self.k1, self.b = k1, b
        self.doc_ids = np.asarray(doc_ids, dtype=np.uint64)
        toks = tokenize_docs(pa.array(contents, type=pa.string()))
        self.n_docs = len(contents)
        self.dl = np.array([len(t) for t in toks], dtype=np.float64)
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0
        # term -> {row -> tf}
        self.postings: dict[str, dict[int, int]] = {}
        for row, ts in enumerate(toks):
            for term, tf in Counter(ts).items():
                self.postings.setdefault(term, {})[row] = tf

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score_all(self, query: str) -> np.ndarray:
        """Exact score of every doc (dense, row order) — sorted-term accumulation."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        terms = sorted(set(tokenize_query(query)))
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            rows = np.fromiter(plist.keys(), dtype=np.int64)
            tfs = np.fromiter(plist.values(), dtype=np.float64)
            w = idf(self.n_docs, len(plist))
            scores[rows] += w * tf_norm(tfs, self.dl[rows], self.avgdl, self.k1, self.b)
        return scores

    def topk(self, query: str, k: int, round_decimals: int | None = None) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), ties broken (score DESC, doc_id ASC)."""
        scores = self.score_all(query)
        nz = np.flatnonzero(scores > 0.0)
        s = scores[nz]
        if round_decimals is not None:
            from .functions.bm25 import sql_round

            s = sql_round(s, round_decimals)
        ids = self.doc_ids[nz]
        order = topk_order(s, ids, k)
        return [(int(ids[i]), float(s[i])) for i in order]
