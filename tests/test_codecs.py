"""Codec property tests (SURVEY.md §5.1): varbyte∘delta roundtrip identity,
block-max metadata consistency, independent block decode."""

from __future__ import annotations

import numpy as np
import pytest

from bitcoin_ledger_2es_ray.functions import codecs


def _rand_sorted(rng, n, hi):
    vals = np.unique(rng.integers(0, hi, size=n * 2, dtype=np.uint64))
    return vals[:n] if len(vals) >= n else vals


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 1000])
def test_varbyte_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    buf, nb = codecs.varbyte_encode(vals)
    assert int(nb.sum()) == len(buf)
    out = codecs.varbyte_decode(buf.tobytes())
    np.testing.assert_array_equal(out, vals)


def test_varbyte_edges():
    edges = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf, _ = codecs.varbyte_encode(edges)
    np.testing.assert_array_equal(codecs.varbyte_decode(buf), edges)
    assert codecs.varbyte_decode(b"").size == 0


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    docs = _rand_sorted(rng, 500, 10**9)
    np.testing.assert_array_equal(codecs.delta_decode(codecs.delta_encode(docs)), docs)


@pytest.mark.parametrize("n", [1, 5, 128, 129, 1000, 4096])
def test_postings_roundtrip_and_blocks(n):
    rng = np.random.default_rng(n)
    docs = _rand_sorted(rng, n, 10**12)
    n = len(docs)
    tfs = rng.integers(1, 1000, size=n).astype(np.uint32)
    dls = rng.integers(1, 10000, size=n).astype(np.uint32)
    db, tb, lb, meta = codecs.encode_postings(docs, tfs, dls)
    d2, t2, l2 = codecs.decode_postings(db, tb, lb)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)

    assert len(meta) == (n + codecs.BLOCK - 1) // codecs.BLOCK
    for i, m in enumerate(meta):
        s, e = i * codecs.BLOCK, min((i + 1) * codecs.BLOCK, n)
        assert m["first_doc"] == docs[s] and m["last_doc"] == docs[e - 1]
        assert m["max_tf"] == tfs[s:e].max()
        assert m["min_dl"] == dls[s:e].min()
        # independent block decode matches the slice
        bd, bt, bl = codecs.decode_block(db, tb, lb, meta, i)
        np.testing.assert_array_equal(bd, docs[s:e])
        np.testing.assert_array_equal(bt, tfs[s:e])
        np.testing.assert_array_equal(bl, dls[s:e])


# hypothesis property tests (SURVEY.md §5.1)
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=600))
    def test_varbyte_roundtrip_hypothesis(vals):
        arr = np.array(vals, dtype=np.uint64)
        buf, nb = codecs.varbyte_encode(arr)
        assert int(nb.sum()) == len(buf)
        np.testing.assert_array_equal(codecs.varbyte_decode(buf.tobytes()), arr)

    @settings(max_examples=100, deadline=None)
    @given(
        st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500),
        st.integers(min_value=1, max_value=1000),
    )
    def test_postings_roundtrip_hypothesis(doc_set, tf_seed):
        docs = np.array(sorted(doc_set), dtype=np.uint64)
        rng = np.random.default_rng(tf_seed)
        tfs = rng.integers(1, 2**20, size=len(docs)).astype(np.uint32)
        dls = rng.integers(1, 2**16, size=len(docs)).astype(np.uint32)
        db, tb, lb, meta = codecs.encode_postings(docs, tfs, dls)
        d2, t2, l2 = codecs.decode_postings(db, tb, lb)
        np.testing.assert_array_equal(d2, docs)
        np.testing.assert_array_equal(t2, tfs)
        np.testing.assert_array_equal(l2, dls)
        for i in range(len(meta)):
            bd, bt, bl = codecs.decode_block(db, tb, lb, meta, i)
            s, e = i * codecs.BLOCK, min((i + 1) * codecs.BLOCK, len(docs))
            np.testing.assert_array_equal(bd, docs[s:e])

except ImportError:  # hypothesis absent → seeded tests above still cover
    pass
