"""HyperLogLog cardinality sketch (functions/sketch.py, aggs.cardinality_hll).

ES's cardinality aggregation is HLL++; the graft's sketch must be
deterministic across processes (blake2b/splitmix64, not seeded ``hash``),
mergeable (elementwise max — partition-order-insensitive), and accurate to
the textbook bound (σ ≈ 1.04/√m ≈ 0.81% at p=14; tests allow 3σ)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from bitcoin_ledger_2es_ray.functions.sketch import (
    _clz64,
    hash_column,
    hll_estimate,
    hll_merge,
    hll_update,
    new_registers,
)


def test_clz64_matches_bit_length():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 63, size=2000, dtype=np.uint64) * np.uint64(2) + rng.integers(0, 2, size=2000, dtype=np.uint64)
    x[:10] = [0, 1, 2, 3, (1 << 63), (1 << 64) - 1, 1 << 32, (1 << 32) - 1, 5, 1 << 62]
    got = _clz64(x)
    want = np.array([64 - int(v).bit_length() for v in x], dtype=np.int64)
    assert got.tolist() == want.tolist()


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_accuracy_ints(n):
    regs = new_registers()
    vals = pa.chunked_array([pa.array(np.arange(n, dtype=np.int64) * 7 + 13)])
    hll_update(regs, hash_column(vals))
    est = hll_estimate(regs)
    sigma = 1.04 / np.sqrt(len(regs))
    assert abs(est - n) / n <= 3 * sigma + (0.01 if n < 1000 else 0)


def test_hll_accuracy_strings():
    n = 30_000
    regs = new_registers()
    vals = pa.chunked_array([pa.array([f"user-{i}" for i in range(n)])])
    hll_update(regs, hash_column(vals))
    est = hll_estimate(regs)
    assert abs(est - n) / n <= 0.03


def test_hll_merge_equals_single_pass_and_is_deterministic():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 40, size=50_000, dtype=np.uint64)
    col = pa.chunked_array([pa.array(a.astype(np.int64))])
    whole = hll_update(new_registers(), hash_column(col))

    # split three ways, fold separately, merge in a different order
    parts = []
    for lo, hi in ((0, 17_000), (17_000, 20_001), (20_001, 50_000)):
        r = hll_update(
            new_registers(),
            hash_column(pa.chunked_array([pa.array(a[lo:hi].astype(np.int64))])),
        )
        parts.append(r)
    merged = hll_merge(parts[2], hll_merge(parts[0], parts[1]))
    assert np.array_equal(whole, merged)  # register-exact, order-insensitive

    again = hll_update(new_registers(), hash_column(col))
    assert np.array_equal(whole, again)  # cross-call determinism

    with pytest.raises(ValueError):
        hll_merge(new_registers(14), new_registers(10))


def test_hll_duplicates_do_not_inflate():
    base = pa.array((np.arange(500, dtype=np.int64) % 50))
    regs = hll_update(new_registers(), hash_column(pa.chunked_array([base])))
    est = hll_estimate(regs)
    assert abs(est - 50) / 50 <= 0.05  # linear-counting small range


def test_cardinality_hll_pipeline_matches_kernel(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.aggs import cardinality_hll, distinct_count

    path = "/root/testdata/sf0.001/events.parquet"
    r = cardinality_hll(path, "user_id")
    exact = distinct_count(path, ["user_id"])["n_distinct_user_id"][0].as_py()

    # pipeline partials merge to the same registers as one local pass
    whole = hll_update(
        new_registers(), hash_column(pq.read_table(path, columns=["user_id"])["user_id"])
    )
    assert np.array_equal(r["registers"], whole)
    assert abs(r["estimate"] - exact) / exact <= 0.03

    # exact side agrees with a local distinct
    t = pq.read_table(path, columns=["user_id", "event_type"])
    assert exact == len(set(t["user_id"].to_pylist()))


# ---------------------------------------------------------------- t-digest


def test_tdigest_bounded_size_and_accuracy():
    """Random data: centroid count stays ≈ O(delta); quantile estimates
    land within 1% RANK error of the exact empirical quantiles."""
    import numpy as np

    from bitcoin_ledger_2es_ray.functions.sketch import (
        tdigest_from_values,
        tdigest_quantile,
    )

    rng = np.random.RandomState(17)
    vals = rng.lognormal(0, 1, size=20_000)
    d = tdigest_from_values(vals)
    assert len(d[0]) <= 220  # ≈ 2·delta bound
    s = np.sort(vals)
    n = len(s)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = tdigest_quantile(d, q)
        # rank error: position of the estimate in the sorted data
        rank = np.searchsorted(s, est) / n
        assert abs(rank - q) < 0.01, (q, rank)


def test_tdigest_merge_invariance():
    """Digest of the whole ≈ merge of the part digests: same quantiles
    within the sketch's rank tolerance, any split, any order."""
    import numpy as np

    from bitcoin_ledger_2es_ray.functions.sketch import (
        tdigest_from_values,
        tdigest_merge,
        tdigest_quantile,
    )

    rng = np.random.RandomState(99)
    vals = rng.gamma(2.0, 3.0, size=12_000)
    whole = tdigest_from_values(vals)
    parts = [tdigest_from_values(c) for c in np.array_split(vals, 7)]
    merged = parts[3]
    for i in (0, 5, 1, 6, 2, 4):  # arbitrary merge order
        merged = tdigest_merge(merged, parts[i])
    s = np.sort(vals)
    n = len(s)
    for q in (0.05, 0.5, 0.95):
        a = np.searchsorted(s, tdigest_quantile(whole, q)) / n
        b = np.searchsorted(s, tdigest_quantile(merged, q)) / n
        assert abs(a - q) < 0.01 and abs(b - q) < 0.015, (q, a, b)


def test_tdigest_edges():
    import numpy as np
    import pytest as _pt

    from bitcoin_ledger_2es_ray.functions.sketch import (
        tdigest_from_values,
        tdigest_quantile,
    )

    one = tdigest_from_values(np.array([42.0]))
    assert tdigest_quantile(one, 0.5) == 42.0
    d = tdigest_from_values(np.array([1.0, 2.0, 3.0]))
    assert tdigest_quantile(d, 0.0) == 1.0
    assert tdigest_quantile(d, 1.0) == 3.0
    with _pt.raises(ValueError):
        tdigest_quantile((np.empty(0), np.empty(0)), 0.5)
