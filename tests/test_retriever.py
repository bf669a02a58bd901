"""Retriever trees: node-by-node identity against the flat hybrid kernels
and spec validation (pipelines/retriever.py)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def rt_ctx(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(store.df), n=10, k=10)
    return store, res, queries


def test_rrf_node_matches_manual_fusion(rt_ctx, ray_session):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res, queries = rt_ctx
    spec = {
        "rrf": {
            "retrievers": [{"standard": {}}, {"knn": {}}],
            "rank_constant": 60,
            "rank_window_size": 20,
        }
    }
    out = retriever_search(SF_DIR, store, res.out_dir, queries, spec, k=10)

    contrib: dict[tuple[int, int], float] = {}
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for r, (d, _s) in enumerate(score_query(store, text, 20, round_decimals=6), 1):
            contrib[(qid, d)] = contrib.get((qid, d), 0.0) + 1.0 / (60 + r)
    knn = knn_bruteforce(SF_DIR, n_queries=10, k=20)
    for q, r, v in zip(
        knn["query_id"].to_pylist(), knn["rank"].to_pylist(), knn["vec_id"].to_pylist()
    ):
        contrib[(q, v)] = contrib.get((q, v), 0.0) + 1.0 / (60 + r)
    want = []
    byq: dict[int, list[tuple[int, float]]] = {}
    for (q, d), c in contrib.items():
        byq.setdefault(q, []).append((d, float(sql_round(c, 6))))
    for q in sorted(byq):
        for rank, (d, c) in enumerate(
            sorted(byq[q], key=lambda kv: (-kv[1], kv[0]))[:10], 1
        ):
            want.append((q, rank, d, c))
    got = list(
        zip(
            out["query_id"].to_pylist(),
            out["rank"].to_pylist(),
            out["doc_id"].to_pylist(),
            out["score"].to_pylist(),
        )
    )
    assert got == want


def test_linear_node_matches_hybrid_linear(rt_ctx, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import hybrid_linear
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res, queries = rt_ctx
    spec = {
        "linear": {
            "retrievers": [
                {"standard": {}, "weight": 0.7},
                {"knn": {}, "weight": 0.3},
            ],
            "rank_window_size": 20,
        }
    }
    out = retriever_search(SF_DIR, store, res.out_dir, queries, spec, k=10)
    flat = hybrid_linear(
        SF_DIR, store, queries, k=10, k_leg=20, w_lex=0.7, w_vec=0.3
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])
    assert out["query_id"].to_pylist() == flat["query_id"].to_pylist()
    assert out["doc_id"].to_pylist() == flat["doc_id"].to_pylist()
    assert out["score"].to_pylist() == flat["score"].to_pylist()


def test_rescorer_window_and_formula(rt_ctx, ray_session):
    import os

    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res, queries = rt_ctx
    spec = {
        "rescorer": {
            "retriever": {"standard": {}},
            "window_size": 5,
            "boost": 0.2,
            "pivot": 8.0,
            "origin": 30.0,
        }
    }
    out = retriever_search(SF_DIR, store, res.out_dir, queries, spec, k=5)
    dl_t = pads.dataset(os.path.join(res.out_dir, "forward_map")).to_table(
        columns=["doc_id", "dl"]
    )
    dls = dict(zip(dl_t["doc_id"].to_pylist(), dl_t["dl"].to_pylist()))
    for qid, text in zip(
        queries["query_id"].to_pylist()[:3], queries["text"].to_pylist()[:3]
    ):
        base = score_query(store, text, 20, round_decimals=6)[:5]
        resc = sorted(
            (
                (d, float(sql_round(s + 0.2 * 8.0 / (8.0 + abs(dls[d] - 30.0)), 6)))
                for d, s in base
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        m = out.filter(
            __import__("pyarrow.compute", fromlist=["field"]).field("query_id") == qid
        )
        assert m["doc_id"].to_pylist() == [d for d, _ in resc]
        assert m["score"].to_pylist() == [s for _, s in resc]


def test_retriever_spec_validation(rt_ctx, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res, queries = rt_ctx
    with pytest.raises(ValueError, match="unknown retriever"):
        retriever_search(SF_DIR, store, res.out_dir, queries, {"bogus": {}})
    with pytest.raises(ValueError, match=">= 2 child"):
        retriever_search(
            SF_DIR, store, res.out_dir, queries,
            {"rrf": {"retrievers": [{"standard": {}}]}},
        )
    with pytest.raises(ValueError, match="single-key"):
        retriever_search(
            SF_DIR, store, res.out_dir, queries, {"rrf": {}, "linear": {}}
        )
    with pytest.raises(ValueError, match="child retriever"):
        retriever_search(SF_DIR, store, res.out_dir, queries, {"rescorer": {}})


def test_linear_node_l2_norm(rt_ctx, ray_session):
    """9.x l2_norm normalizer: the tree node matches the flat kernel, the
    normalizer math matches a manual recompute, and unknown normalizers
    refuse."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.ann import _l2_norm, hybrid_linear
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res, queries = rt_ctx
    spec = {
        "linear": {
            "retrievers": [
                {"standard": {}, "weight": 0.7, "normalizer": "l2_norm"},
                {"knn": {}, "weight": 0.3, "normalizer": "l2_norm"},
            ],
            "rank_window_size": 20,
        }
    }
    out = retriever_search(SF_DIR, store, res.out_dir, queries, spec, k=10)
    flat = hybrid_linear(
        SF_DIR, store, queries, k=10, k_leg=20, w_lex=0.7, w_vec=0.3,
        normalizer="l2_norm",
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])
    assert out["doc_id"].to_pylist() == flat["doc_id"].to_pylist()
    assert out["score"].to_pylist() == flat["score"].to_pylist()
    # l2 differs from minmax on this corpus (the option is not a no-op)
    mm = hybrid_linear(SF_DIR, store, queries, k=10, k_leg=20)
    assert mm["score"].to_pylist() != flat["score"].to_pylist()
    # manual recompute + degenerate leg
    s = np.array([3.0, 4.0])
    assert np.allclose(_l2_norm(s), s / 5.0)
    assert (_l2_norm(np.zeros(3)) == 0.0).all()
    with pytest.raises(ValueError, match="normalizer"):
        hybrid_linear(SF_DIR, store, queries, k=10, normalizer="zscore")
    bad = {
        "linear": {
            "retrievers": [
                {"standard": {}, "normalizer": "zscore"},
                {"knn": {}},
            ]
        }
    }
    with pytest.raises(ValueError, match="normalizer"):
        retriever_search(SF_DIR, store, res.out_dir, queries, bad, k=10)
