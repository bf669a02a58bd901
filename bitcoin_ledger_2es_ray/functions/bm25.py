"""BM25 scoring math (SURVEY.md §0.2, §2.5 C4) — Lucene's documented formula.

The "reference engine" (Elasticsearch/Lucene, absent from the sandbox — see
SURVEY.md §0) scores with:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d)= tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = sum_t idf(t) * tf_norm(t, d)        (k1=1.2, b=0.75)

Rank-identity rules (BASELINE.json L14): accumulate per-term partials in
float64 in **sorted term order**, break ties (score DESC, doc_id ASC).  When
cross-checking against the DuckDB SQL oracle, both sides rank on the score
rounded to ``ROUND_DECIMALS`` so a last-ulp difference between numpy and
DuckDB summation cannot flip a tie (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75
ROUND_DECIMALS = 6


def sql_round(x, decimals: int = ROUND_DECIMALS):
    """Round-half-AWAY-from-zero on the scaled double — bit-compatible with
    DuckDB's ``round(x, n)`` (C++ std::round of x*10^n).

    numpy's np.round is half-EVEN, and the synthetic corpus produces exact
    .5 boundaries (token counts are powers of two), so np.round would flip
    the last digit vs the SQL oracle.  Both engines compute the same double
    ``x * 10^n``, so floor(+0.5) here reproduces DuckDB exactly.
    """
    scale = 10.0 ** decimals
    x = np.asarray(x, dtype=np.float64)
    out = np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
    return out if out.ndim else float(out)


def idf(n_docs: float, df: np.ndarray | float) -> np.ndarray | float:
    """Lucene BM25 idf; df may be a scalar or vector."""
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Vectorized Lucene BM25 tf normalization."""
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def block_upper_bound(
    idf_t: float,
    max_tf: int,
    min_dl: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> float:
    """Safe per-block score upper bound for block-max WAND.

    tf_norm is increasing in tf and decreasing in dl, so
    ``tf_norm(max_tf, min_dl)`` dominates every entry in the block.
    """
    return idf_t * (max_tf / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl)))


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score DESC, doc_id ASC) — deterministic.

    ``scores``/``doc_ids`` are parallel arrays of candidate docs.
    """
    if len(scores) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((doc_ids, -scores))  # primary: -score, secondary: doc_id
    return order[: min(k, len(order))]
