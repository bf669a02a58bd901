"""Block-max WAND rank-identity vs exhaustive scoring (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.functions.bm25 import idf, tf_norm, topk_order
from bitcoin_ledger_2es_ray.functions.codecs import encode_postings
from bitcoin_ledger_2es_ray.functions.wand import Cursor, wand_topk


def _synthetic_index(seed: int, n_docs: int = 4000, vocab: int = 40):
    """Random zipf-ish corpus → per-term (docs, tfs) + dl array."""
    rng = np.random.default_rng(seed)
    dl = rng.integers(5, 400, size=n_docs).astype(np.uint32)
    avgdl = float(dl.mean())
    terms = {}
    for t in range(vocab):
        df = max(1, int(n_docs * (0.9 ** t)))  # head → tail skew
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 20, size=df).astype(np.uint32)
        terms[f"t{t:02d}"] = (docs, tfs)
    return terms, dl, avgdl, n_docs


def _exact_topk(terms, dl, avgdl, n_docs, query_terms, k):
    scores = np.zeros(n_docs, dtype=np.float64)
    for t in sorted(set(query_terms)):
        if t not in terms:
            continue
        docs, tfs = terms[t]
        w = float(idf(n_docs, len(docs)))
        scores[docs.astype(np.int64)] += w * tf_norm(
            tfs.astype(np.float64), dl[docs.astype(np.int64)].astype(np.float64), avgdl
        )
    nz = np.flatnonzero(scores > 0)
    order = topk_order(scores[nz], nz.astype(np.uint64), k)
    return [(int(nz[i]), float(scores[nz][i])) for i in order]


def _cursors_for(terms, dl, avgdl, n_docs, query_terms, n_salt_for=()):
    cursors = []
    for order, t in enumerate(sorted(set(query_terms))):
        if t not in terms:
            continue
        docs, tfs = terms[t]
        w = float(idf(n_docs, len(docs)))
        slices = [(docs, tfs)]
        if t in n_salt_for:  # emulate a salted head term: doc-disjoint slices
            m = docs % 2
            slices = [(docs[m == s], tfs[m == s]) for s in (0, 1)]
        for sdocs, stfs in slices:
            if len(sdocs) == 0:
                continue
            db, tb, lb, meta = encode_postings(sdocs, stfs, dl[sdocs.astype(np.int64)])
            cursors.append(Cursor(order, w, db, tb, lb, meta, avgdl))
    return cursors


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_wand_matches_exact_synthetic(seed):
    terms, dl, avgdl, n_docs = _synthetic_index(seed)
    rng = np.random.default_rng(100 + seed)
    names = sorted(terms)
    for qi in range(25):
        q = list(rng.choice(names, size=rng.integers(1, 5), replace=False))
        k = int(rng.integers(1, 30))
        got = wand_topk(_cursors_for(terms, dl, avgdl, n_docs, q), k)
        exp = _exact_topk(terms, dl, avgdl, n_docs, q, k)
        assert [d for d, _ in got] == [d for d, _ in exp], f"seed{seed} q{qi} {q} k={k}"
        np.testing.assert_allclose([s for _, s in got], [s for _, s in exp], rtol=0, atol=0)


def test_wand_with_salted_slices():
    terms, dl, avgdl, n_docs = _synthetic_index(7)
    q = ["t00", "t01", "t05"]  # head terms
    got = wand_topk(_cursors_for(terms, dl, avgdl, n_docs, q, n_salt_for={"t00", "t01"}), 15)
    exp = _exact_topk(terms, dl, avgdl, n_docs, q, 15)
    assert [d for d, _ in got] == [d for d, _ in exp]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in exp], rtol=0, atol=0)


def test_wand_edge_cases():
    terms, dl, avgdl, n_docs = _synthetic_index(11)
    assert wand_topk([], 10) == []
    assert wand_topk(_cursors_for(terms, dl, avgdl, n_docs, ["t03"]), 0) == []
    # k larger than result set
    got = wand_topk(_cursors_for(terms, dl, avgdl, n_docs, ["t39"]), 10**6)
    exp = _exact_topk(terms, dl, avgdl, n_docs, ["t39"], 10**6)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_wand_on_built_index(built):
    """WAND over the real built index == exhaustive scorer, all 50 queries."""
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        score_query,
        score_query_wand,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(oracle.postings), n=50)
    for text, k in zip(queries["text"].to_pylist(), queries["k"].to_pylist()):
        got = score_query_wand(store, text, k)
        exp = score_query(store, text, k)
        assert [d for d, _ in got] == [d for d, _ in exp], text
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in exp], rtol=0, atol=0
        )


def test_serving_pool(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
    from bitcoin_ledger_2es_ray.pipelines.serve import TopKService

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    svc = TopKService(res.out_dir, num_actors=3)
    try:
        for text in ["dup", "batch scan", "window agg join", "nosuchterm"]:
            exp = score_query(store, text, 10)
            for mode in ("taat", "wand", "routed", "auto"):
                got = svc.query(text, 10, mode=mode)
                assert [d for d, _ in got] == [d for d, _ in exp], (text, mode)
                if mode in ("taat", "routed"):  # bit-identical float sums
                    assert got == exp, (text, mode)
            # routed twice → exercises the scored cache, identical result
            assert svc.query(text, 10, mode="routed") == svc.query(
                text, 10, mode="routed"
            )
        # planner: single-term → taat; (rare, head) pair → wand iff the rare
        # term is selective enough to anchor skipping
        dfs = {t: svc.td.df_of(t) for t in store.df}
        rare = min(dfs, key=lambda t: (dfs[t], t))
        head = max(dfs, key=lambda t: (dfs[t], t))
        assert svc.plan_mode(head) == "taat"
        expected = "wand" if dfs[rare] <= 0.1 * svc.n_docs else "taat"
        assert svc.plan_mode(f"{rare} {head}") == expected
    finally:
        svc.shutdown()


def test_serving_mesh_matches_single_router(built):
    """Replicated routers over one shared pool (round 3): every router is
    rank- and score-identical to the single-router service; query_many
    preserves input order and uses all routers."""
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
    from bitcoin_ledger_2es_ray.pipelines.serve import ServingMesh

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    # fractional router CPUs: 3 routers + 2 segment actors must co-schedule
    # inside the 4-CPU test session without deadlocking on logical CPUs
    mesh = ServingMesh(
        res.out_dir, num_routers=3, num_segment_actors=2, router_num_cpus=0.25
    )
    try:
        texts = ["dup", "batch scan", "window agg join", "nosuchterm", "dup"]
        exp = [score_query(store, t, 10) for t in texts]
        # enough sequential queries that round-robin cycles every router
        for t, e in zip(texts, exp):
            assert mesh.query(t, 10, mode="taat") == e
        got = mesh.query_many(texts, 10, mode="taat")
        assert got == exp
        for t, e in zip(texts, exp):
            assert [d for d, _ in mesh.query(t, 10, mode="routed")] == [d for d, _ in e]
        assert mesh._rr >= 2 * len(texts)  # all three routers exercised
    finally:
        mesh.shutdown()


def test_async_search(built):
    import time

    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
    from bitcoin_ledger_2es_ray.pipelines.serve import AsyncSearch, TopKService

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    svc = TopKService(res.out_dir, num_actors=3)
    asearch = AsyncSearch(svc)
    try:
        texts = ["dup", "batch scan", "window agg join"]
        jobs = [asearch.submit(t, k=10) for t in texts]  # all in flight at once
        # poll: done_shards is monotone and partial is always a valid ranking
        seen = {j: -1 for j in jobs}
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            states = {j: asearch.status(j) for j in jobs}
            for j, st in states.items():
                assert st["done_shards"] >= seen[j]
                assert st["done_shards"] <= st["total_shards"]
                seen[j] = st["done_shards"]
                scores = [s for _, s in st["partial"]]
                assert scores == sorted(scores, reverse=True)
            if all(not st["is_running"] for st in states.values()):
                break
            time.sleep(0.05)
        # final == synchronous scoring, bit-identical
        for j, t in zip(jobs, texts):
            assert asearch.get(j) == score_query(store, t, 10)
        # an id is consumed by get()
        import pytest as _pytest

        with _pytest.raises(KeyError):
            asearch.get(jobs[0])
        # unknown-terms query completes with an empty ranking
        j = asearch.submit("zzznope", k=5)
        assert asearch.status(j)["total_shards"] == 0
        assert asearch.get(j) == []
    finally:
        svc.shutdown()
