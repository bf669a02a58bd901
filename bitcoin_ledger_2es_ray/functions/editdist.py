"""Vectorized Levenshtein kernel (ES ``fuzzy`` query analog, SURVEY §2.5).

Lucene evaluates fuzzy queries with a Levenshtein automaton over the FST
term dictionary; the graft's analog scans the sorted dictionary in Arrow
batches and runs one dynamic program VECTORIZED ACROSS CANDIDATES — the
DP table is a (n_candidates, max_len+1) numpy matrix advanced one query
character at a time, so cost is O(|q| · max_len) vector ops regardless of
candidate count.  Distances are byte-level over UTF-8 (identical to
character-level for ASCII vocabularies, which is what the code tokenizer
emits); terms are ≤64 bytes by tokenizer contract so the DP depth is
bounded.

Candidates are pre-pruned by length (|len(t)| − |len(q)|| ≤ max_dist — a
Levenshtein lower bound), which removes most of the vocabulary before the
DP runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pad_terms(terms: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Candidate bytes → (n, L) uint8 matrix (0-padded) + length vector."""
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=len(terms))
    L = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(terms), L), dtype=np.uint8)
    for i, t in enumerate(terms):
        mat[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    return mat, lens


def levenshtein_leq(query: str, terms: list[str], max_dist: int) -> np.ndarray:
    """Boolean mask: ``levenshtein(query, t) <= max_dist`` per candidate.

    One DP row per query byte, vectorized across all candidates at once.
    """
    if not terms:
        return np.zeros(0, dtype=bool)
    q = np.frombuffer(query.encode("utf-8"), dtype=np.uint8)
    mat, lens = _pad_terms([t.encode("utf-8") for t in terms])
    n, L = mat.shape
    if L == 0:
        return lens + len(q) - lens <= max_dist  # all-empty candidates
    dp = np.broadcast_to(np.arange(L + 1, dtype=np.int32), (n, L + 1)).copy()
    for i in range(1, len(q) + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        sub = (mat != q[i - 1]).astype(np.int32)  # (n, L)
        for j in range(1, L + 1):
            dp[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, dp[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
    return dp[np.arange(n), lens] <= max_dist


def fuzzy_scan_table(
    term_col: pa.ChunkedArray | pa.Array, query: str, max_dist: int
) -> np.ndarray:
    """Mask over an Arrow term column: length-prune with Arrow kernels, run
    the vectorized DP only on survivors.  This is the per-row-group unit of
    a dictionary scan — bounded memory at any vocabulary size."""
    qlen = len(query.encode("utf-8"))
    blen = pc.binary_length(pc.cast(term_col, pa.binary())).to_numpy(
        zero_copy_only=False
    )
    cand = np.flatnonzero(np.abs(blen - qlen) <= max_dist)
    out = np.zeros(len(blen), dtype=bool)
    if len(cand) == 0:
        return out
    terms = pc.take(term_col, pa.array(cand)).to_pylist()
    out[cand] = levenshtein_leq(query, terms, max_dist)
    return out
