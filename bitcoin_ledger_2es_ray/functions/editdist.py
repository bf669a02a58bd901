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


def _dl_exact(a: bytes, b: bytes) -> int:
    """TRUE Damerau-Levenshtein (Lowrance–Wagner, unrestricted — a
    transposed pair may be edited again), matching Lucene's
    transpositions=true automaton and DuckDB's damerau_levenshtein
    (d('CA','ABC') = 2, where restricted OSA gives 3).  Scalar — only runs
    on the tiny residual set the vectorized OSA pass can't decide."""
    la, lb = len(a), len(b)
    inf = la + lb
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[int, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def damerau_leq(query: str, terms: list[str], max_dist: int) -> np.ndarray:
    """Boolean mask: true Damerau-Levenshtein(query, t) <= max_dist.

    Three tiers, cheapest first:
    1. vectorized OSA DP across all candidates (the Levenshtein recurrence
       plus a transposition term off the i-2 row) — OSA >= DL, so any OSA
       hit is a DL hit;
    2. a vectorized byte-histogram bag-distance LOWER bound kills most OSA
       misses (each DL op moves the byte multiset by <= 1);
    3. exact scalar Lowrance–Wagner only on candidates between the two
       bounds (OSA > max but bag <= max) — empirically a handful per scan.
    """
    if not terms:
        return np.zeros(0, dtype=bool)
    qb = query.encode("utf-8")
    q = np.frombuffer(qb, dtype=np.uint8)
    bterms = [t.encode("utf-8") for t in terms]
    mat, lens = _pad_terms(bterms)
    n, L = mat.shape
    if L == 0:
        return np.full(n, len(q) <= max_dist)
    # tier 1: OSA, vectorized across candidates
    dp = np.broadcast_to(np.arange(L + 1, dtype=np.int32), (n, L + 1)).copy()
    prev2 = None
    for i in range(1, len(q) + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        sub = (mat != q[i - 1]).astype(np.int32)
        for j in range(1, L + 1):
            best = np.minimum(
                np.minimum(prev[:, j] + 1, dp[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
            if i >= 2 and j >= 2 and prev2 is not None:
                tr = (mat[:, j - 1] == q[i - 2]) & (mat[:, j - 2] == q[i - 1])
                best = np.where(tr, np.minimum(best, prev2[:, j - 2] + 1), best)
            dp[:, j] = best
        prev2 = prev
    osa = dp[np.arange(n), lens] <= max_dist
    undecided = np.flatnonzero(~osa)
    if len(undecided) == 0:
        return osa
    # tier 2: bag-distance lower bound on the undecided set
    qh = np.bincount(q, minlength=256).astype(np.int64)
    rows = mat[undecided]
    flat = (
        np.repeat(np.arange(len(undecided)), L) * 256 + rows.reshape(-1)
    )
    th = np.bincount(flat, minlength=len(undecided) * 256).reshape(
        len(undecided), 256
    )
    th[:, 0] -= L - lens[undecided]  # remove padding zeros
    diff = th - qh
    bag = np.maximum(
        np.where(diff > 0, diff, 0).sum(axis=1),
        np.where(diff < 0, -diff, 0).sum(axis=1),
    )
    out = osa
    for idx in undecided[bag <= max_dist]:
        if _dl_exact(qb, bterms[idx]) <= max_dist:
            out[idx] = True
    return out


def fuzzy_scan_table(
    term_col: pa.ChunkedArray | pa.Array,
    query: str,
    max_dist: int,
    transpositions: bool = False,
) -> np.ndarray:
    """Mask over an Arrow term column: length-prune with Arrow kernels, run
    the vectorized DP only on survivors.  This is the per-row-group unit of
    a dictionary scan — bounded memory at any vocabulary size.
    ``transpositions=True`` switches to true Damerau-Levenshtein (ES
    ``fuzzy`` with fuzzy_transpositions, the default in ES)."""
    qlen = len(query.encode("utf-8"))
    blen = pc.binary_length(pc.cast(term_col, pa.binary())).to_numpy(
        zero_copy_only=False
    )
    cand = np.flatnonzero(np.abs(blen - qlen) <= max_dist)
    out = np.zeros(len(blen), dtype=bool)
    if len(cand) == 0:
        return out
    terms = pc.take(term_col, pa.array(cand)).to_pylist()
    kern = damerau_leq if transpositions else levenshtein_leq
    out[cand] = kern(query, terms, max_dist)
    return out
