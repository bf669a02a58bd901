"""HyperLogLog cardinality sketch (ES ``cardinality`` aggregation analog).

Elasticsearch's cardinality agg IS HyperLogLog++: each shard builds a
fixed-size register array, the coordinator merges them by elementwise max
— the sketch is tiny (2^p bytes), mergeable, and order-insensitive, which
is exactly what a 100-TB distributed distinct-count needs (the exact
answer requires a full shuffle; the sketch needs one 16 KiB array per
block).  This is the classic Flajolet-Fuse-Gandouet-Meunier estimator
with the small-range linear-counting correction; 64-bit hashes make the
large-range correction unnecessary.

All kernels are numpy-vectorized: integer columns hash with splitmix64
(wrapping uint64 arithmetic), string/binary columns dictionary-encode per
batch and hash only the DISTINCT values (blake2b-8, deterministic across
processes — unlike Python's seeded ``hash``), then scatter through the
codes.  Register update is one ``np.maximum.at``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_P = 14  # 2^14 registers = 16 KiB, relative error ≈ 1.04/√m ≈ 0.81%


def new_registers(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — uint64 in, uint64 out (wrapping)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_binary_dictionary(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of a string/binary column: per-batch dictionary encode,
    blake2b-8 over DISTINCT values only, scatter through the codes."""
    if isinstance(col, pa.Array):
        col = pa.chunked_array([col])
    dic = pc.dictionary_encode(col.combine_chunks())
    vals = dic.dictionary
    uh = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        pv = v.as_py()
        b = pv if isinstance(pv, bytes) else str(pv).encode()
        uh[i] = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")
    codes = np.asarray(dic.indices, dtype=np.int64)
    return uh[codes]


def hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hashes of any column (nulls dropped by the caller)."""
    t = col.type
    if pa.types.is_integer(t):
        arr = np.asarray(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).astype(np.uint64)
        return _splitmix64(arr)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return _hash_binary_dictionary(col)
    raise TypeError(f"unhashable column type for HLL: {t}")


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (x == 0 → 64)."""
    x = x.astype(np.uint64, copy=True)
    zero = x == 0
    n = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] = x[m] << np.uint64(s)
    n[zero] = 64
    return n


def hll_update(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold a batch of 64-bit hashes into the register array (in place)."""
    p = int(np.log2(len(regs)))
    if hashes.size == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sketches — elementwise max (associative, commutative)."""
    if len(a) != len(b):
        raise ValueError("cannot merge sketches of different precision")
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """FFGM estimator + linear counting for the small range."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = float(np.count_nonzero(regs == 0))
        if zeros > 0:
            est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving heavy-hitters summary (mergeable form of
# Agarwal et al., "Mergeable Summaries", PODS 2012).  A summary is a dict
# term -> count plus the total decrement D it has absorbed; estimates are
# UNDERcounts with  true_count - est <= D  and  D <= N/(k+1), so every term
# with true frequency > N/(k+1) is guaranteed present.  Merging sums the
# counters (and D), then compresses back to k by subtracting the (k+1)-th
# largest counter from all — exactly the paper's one-shot merge.


def mg_compress(counts: dict, k: int) -> tuple[dict, int]:
    """Compress a term->count dict to at most ``k`` counters; returns the
    compressed dict and the decrement applied (0 if already small)."""
    if len(counts) <= k:
        return dict(counts), 0
    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
    dec = int(vals[len(vals) - k - 1])  # the (k+1)-th largest
    out = {t: c - dec for t, c in counts.items() if c > dec}
    return out, dec


def mg_from_counts(terms: np.ndarray, counts: np.ndarray, k: int) -> tuple[dict, int]:
    """Build a k-counter summary from exact per-batch (term, count) pairs."""
    return mg_compress(dict(zip(terms.tolist(), counts.tolist())), k)


def mg_merge(a: tuple[dict, int], b: tuple[dict, int], k: int) -> tuple[dict, int]:
    """Merge two summaries: sum counters, sum decrements, re-compress."""
    merged = dict(a[0])
    for t, c in b[0].items():
        merged[t] = merged.get(t, 0) + c
    out, dec = mg_compress(merged, k)
    return out, a[1] + b[1] + dec


# ---------------------------------------------------------------- t-digest
#
# ES's `percentiles` aggregation is a t-digest (Dunning & Ertl): each shard
# compresses its values into weighted centroids whose sizes follow the k1
# scale function (fine near the tails, coarse in the middle), the
# coordinator merges digests by concatenation + recompression, and
# quantiles interpolate between centroid means.  Mergeable, bounded size
# (≈ 2·δ centroids), order-insensitive after compression — the exact shape
# a 100-TB distributed percentile needs.  The graft's exact value-count
# percentiles stay the oracle-gated path; this sketch is the scale path,
# tested for merge invariance and rank-error bounds.

TDIGEST_DELTA = 100.0


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """The k1 scale function: k(q) = δ/(2π)·asin(2q−1)."""
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def tdigest_compress(
    means: np.ndarray, weights: np.ndarray, delta: float = TDIGEST_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted points into t-digest centroids (merging variant):
    sort by mean, then greedily merge neighbours while the merged
    centroid's k-size stays ≤ 1."""
    if len(means) == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    order = np.argsort(means, kind="mergesort")
    m = np.asarray(means, dtype=np.float64)[order]
    w = np.asarray(weights, dtype=np.float64)[order]
    total = float(w.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(m[0]), float(w[0])
    w_so_far = 0.0
    for i in range(1, len(m)):
        q0 = w_so_far / total
        q1 = (w_so_far + cur_w + w[i]) / total
        if _k1(np.array([q1]), delta)[0] - _k1(np.array([q0]), delta)[0] <= 1.0:
            cur_m = (cur_m * cur_w + float(m[i]) * float(w[i])) / (cur_w + float(w[i]))
            cur_w += float(w[i])
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_so_far += cur_w
            cur_m, cur_w = float(m[i]), float(w[i])
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_from_values(
    values: np.ndarray, delta: float = TDIGEST_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Build a digest from raw values (each weight 1)."""
    v = np.asarray(values, dtype=np.float64)
    return tdigest_compress(v, np.ones(len(v)), delta)


def tdigest_merge(
    a: tuple[np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray],
    delta: float = TDIGEST_DELTA,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two digests: concatenate centroids, recompress."""
    return tdigest_compress(
        np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]]), delta
    )


def tdigest_quantile(
    digest: tuple[np.ndarray, np.ndarray], q: float
) -> float:
    """Estimate the q-quantile: linear interpolation between centroid
    means at the cumulative-weight midpoints (Dunning's estimator)."""
    m, w = digest
    if len(m) == 0:
        raise ValueError("tdigest_quantile: empty digest")
    if len(m) == 1:
        return float(m[0])
    total = float(w.sum())
    target = q * total
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(w) - w / 2.0
    if target <= cum[0]:
        return float(m[0])
    if target >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(m[i] + frac * (m[i + 1] - m[i]))
