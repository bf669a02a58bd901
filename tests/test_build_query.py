"""End-to-end build + query rank-identity vs the exact oracle (SURVEY.md §5.3).

The engine path (footer-offset docIDs → fused tokenize/explode → salted term
shuffle → compressed segments → store/scorer) must reproduce the brute-force
oracle exactly: same top-k docIDs, scores within 1e-9, deterministic ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.oracle import BM25Oracle
from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.pipelines.query import (
    SegmentStore,
    attach_doc_meta,
    run_queries,
    score_query,
)
from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet
from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

SF_DIR = "/root/testdata/sf0.001"


def test_stats_match_oracle(built):
    res, oracle, _ = built
    assert res.n_docs == oracle.n_docs
    assert res.total_dl == int(oracle.dl.sum())
    assert res.n_terms == len(oracle.postings)
    assert res.head_terms, "testdata head terms (df≈0.8N) must be salted"


def test_term_df_matches_oracle(built):
    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    assert set(store.df) == set(oracle.postings)
    for term, plist in oracle.postings.items():
        assert store.df[term] == len(plist), term
        d, tf, dl = store.postings(term)
        order = np.argsort(d)
        exp = sorted(plist.items())
        np.testing.assert_array_equal(d[order], oracle.doc_ids[[r for r, _ in exp]])
        np.testing.assert_array_equal(tf[order], [v for _, v in exp])
        np.testing.assert_array_equal(dl[order], oracle.dl[[r for r, _ in exp]].astype(np.uint32))


def test_rank_identity_vs_oracle(built):
    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(oracle.postings), n=50)
    for qid, text, k in zip(
        queries["query_id"].to_pylist(),
        queries["text"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        got = score_query(store, text, k)
        exp = oracle.topk(text, k)
        assert [d for d, _ in got] == [d for d, _ in exp], f"q{qid}: {text!r}"
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in exp], rtol=0, atol=1e-9
        )


def test_distributed_query_path(built):
    res, oracle, _ = built
    queries = fixture_queries(sorted(oracle.postings), n=12)
    results = run_queries(res.out_dir, queries, concurrency=2)
    rows = results.take_all()
    # group rows per query and compare against the oracle
    import collections

    per_q = collections.defaultdict(list)
    for row in rows:
        per_q[row["query_id"]].append((row["rank"], row["doc_id"], row["score"]))
    for qid, text, k in zip(
        queries["query_id"].to_pylist(), queries["text"].to_pylist(), queries["k"].to_pylist()
    ):
        exp = oracle.topk(text, k)
        got = sorted(per_q[qid])
        assert [d for _, d, _ in got] == [d for d, _ in exp], f"q{qid}"


def test_forward_map_join(built):
    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    top = score_query(store, "dup", 5)
    results = pa.table(
        {
            "query_id": pa.array([0] * len(top), type=pa.uint64()),
            "rank": pa.array(range(1, len(top) + 1), type=pa.uint32()),
            "doc_id": pa.array([d for d, _ in top], type=pa.uint64()),
            "score": pa.array([s for _, s in top], type=pa.float64()),
        }
    )
    joined = attach_doc_meta(results, res.out_dir)
    assert joined.num_rows == len(top)
    for row in joined.to_pylist():
        d = row["doc_id"]
        assert row["repo"] == f"org{d % 7}/repo{d % 20}"
        assert row["path"].endswith(f"file_{d}.py")
    # the auto-routed bulk path (hash-partitioned Dataset.join) must produce
    # the same rows as the broadcast semi-join (threshold forced to 0)
    bulk = attach_doc_meta(results, res.out_dir, bulk_threshold=0)
    assert bulk.select(joined.column_names).equals(joined)


def test_results_sink_streams_to_parquet(built, tmp_path):
    """Scale sink: score → bulk meta join → partitioned parquet, no driver
    materialization; rows round-trip identical to the in-memory path."""
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.query import run_queries, run_queries_to_parquet
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(store.df), n=20, k=5)
    out = run_queries_to_parquet(
        res.out_dir, queries, str(tmp_path / "results"), concurrency=2, round_decimals=6
    )
    written = (
        pads.dataset(out)
        .to_table()
        .sort_by([("query_id", "ascending"), ("rank", "ascending")])
    )
    mem = pa.Table.from_pylist(
        run_queries(res.out_dir, queries, concurrency=2, round_decimals=6).take_all()
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])
    assert written.num_rows == mem.num_rows
    assert written.select(["query_id", "rank", "doc_id", "score"]).equals(
        mem.select(["query_id", "rank", "doc_id", "score"]).cast(
            written.select(["query_id", "rank", "doc_id", "score"]).schema
        )
    )
    for row in written.slice(0, 5).to_pylist():
        assert row["repo"].startswith("org")
    # re-run into the SAME dir: overwrite, not append (ADVICE r2 — Ray's
    # default SaveMode is APPEND, which would double the row count here)
    run_queries_to_parquet(
        res.out_dir, queries, str(tmp_path / "results"), concurrency=2, round_decimals=6
    )
    rerun = (
        pads.dataset(out)
        .to_table()
        .sort_by([("query_id", "ascending"), ("rank", "ascending")])
    )
    assert rerun.num_rows == written.num_rows
    assert rerun.select(written.column_names).equals(written)


def test_from_arrow_blocks_empty_table(ray_session):
    """Empty input must not crash the block splitter (ADVICE r2: range()
    with a zero step) and must round-trip an empty dataset."""
    from bitcoin_ledger_2es_ray.functions.blocks import from_arrow_blocks

    empty = pa.table({"x": pa.array([], type=pa.int64())})
    ds = from_arrow_blocks(empty, 8)
    assert ds.count() == 0
    assert from_arrow_blocks(pa.table({"x": [1, 2, 3]}), 8).count() == 3


def test_adaptive_salting_bounds_slices(ray_session, tmp_path):
    """Head-term skew (SURVEY §2.4 G1): salt counts scale with estimated df
    so no reduce-side posting run exceeds ~max_slice_postings — and the
    salted index still scores rank-identically."""
    import glob

    corpus = derive_corpus_parquet(SF_DIR, str(tmp_path / "c.parquet"), row_group_size=128)
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(tmp_path / "idx"),
        num_partitions=8,
        head_df_ratio=0.5,
        n_salt=2,
        max_slice_postings=50,
        sketch_stride=2,
    )
    res = build_index(cfg)
    assert max(res.head_terms.values()) >= 8  # df≈400 docs / 50 per slice
    dfs = []
    for seg in glob.glob(f"{res.out_dir}/segments/shard-*.parquet"):
        dfs.extend(pq.read_table(seg, columns=["df"])["df"].to_pylist())
    assert max(dfs) <= 120  # 2x estimate slack over the 50-posting target

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    oracle = BM25Oracle(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    store = SegmentStore(res.out_dir)
    for text in ["batch dup", "scan agg window", "dup"]:
        got = score_query(store, text, 10)
        exp = oracle.topk(text, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], text


def test_sha256_corruption_fails_build(ray_session, tmp_path):
    corpus = derive_corpus_parquet(SF_DIR, str(tmp_path / "corpus.parquet"), row_group_size=128)
    t = pq.read_table(corpus)
    bad_sha = t["sha256"].to_pylist()
    bad_sha[3] = b"\x00" * 32
    t = t.set_column(t.schema.get_field_index("sha256"), "sha256", pa.array(bad_sha, type=pa.binary(32)))
    bad_path = str(tmp_path / "bad.parquet")
    pq.write_table(t, bad_path, row_group_size=128)
    with pytest.raises(Exception, match="sha256 mismatch"):
        build_index(
            BuildConfig(corpus=bad_path, out_dir=str(tmp_path / "bad_idx"), num_partitions=4)
        )


def test_ltr_features_brute_force(built, ray_session):
    """LTR feature vectors equal a direct recompute from the corpus text
    for the top-10 of a few fixture queries."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        ltr_features,
        score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(store.df), n=8, k=10)
    out = ltr_features(store, queries, k=10)

    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    split = [d.split(" ") for d in docs]
    n_docs = len(docs)
    rows = {
        (q, d): (r, b)
        for q, r, d, b in zip(
            out["query_id"].to_pylist(), out["rank"].to_pylist(),
            out["doc_id"].to_pylist(), out["bm25"].to_pylist(),
        )
    }
    checked = 0
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(text.split(" ")))
        for d, s in score_query(store, text, 10, round_decimals=6):
            assert rows[(qid, d)][1] == s
            words = split[d]
            matched = [t for t in terms if t in words]
            i = out.to_pandas().query("query_id == @qid and doc_id == @d").iloc[0]
            assert i["dl"] == len(words)
            assert i["qlen"] == len(terms)
            assert i["n_matched"] == len(matched)
            assert i["sum_tf"] == sum(words.count(t) for t in matched)
            dfs = [sum(1 for w in split if t in w) for t in matched]
            want_idf = max(
                np.log(1 + (n_docs - df + 0.5) / (df + 0.5)) for df in dfs
            )
            assert i["max_idf"] == float(sql_round(want_idf, 6))
            checked += 1
    assert checked > 0


def test_rank_eval_graded_brute_force(built, ray_session):
    """DCG/NDCG/ERR equal a direct text-derived recompute; perfect-grade
    top ranking scores ndcg == 1."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        rank_eval_graded,
        score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(store.df), n=10, k=10)
    out = rank_eval_graded(store, queries, k=10)
    rows = {
        q: (a, b, c)
        for q, a, b, c in zip(
            out["query_id"].to_pylist(), out["dcg_k"].to_pylist(),
            out["ndcg_k"].to_pylist(), out["err_k"].to_pylist(),
        )
    }
    split = [
        set(d.split(" "))
        for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    ]
    checked = 0
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(text.split(" ")))
        grades = {
            i: sum(t in s for t in terms)
            for i, s in enumerate(split)
            if any(t in s for t in terms)
        }
        if not grades:
            assert qid not in rows
            continue
        top = score_query(store, text, 10, round_decimals=6)
        g = np.array([grades.get(d, 0) for d, _ in top], dtype=float)
        r = np.arange(1, len(g) + 1)
        dcg = ((2.0**g - 1) / np.log2(r + 1)).sum()
        ig = np.sort(np.array(list(grades.values()), dtype=float))[::-1][:10]
        idcg = ((2.0**ig - 1) / np.log2(np.arange(1, len(ig) + 1) + 1)).sum()
        rp = (2.0**g - 1) / 8.0
        stop = np.concatenate(([1.0], np.cumprod(1 - rp)[:-1]))
        err = (rp / r * stop).sum()
        assert rows[qid][0] == float(sql_round(dcg, 6))
        assert rows[qid][1] == float(sql_round(dcg / idcg, 6))
        assert rows[qid][2] == float(sql_round(err, 6))
        assert 0.0 < rows[qid][1] <= 1.0
        checked += 1
    assert checked > 0


def test_match_count_terminated(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        match_count,
        match_count_terminated,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    text = vocab[0]
    total = match_count(store, text)
    assert total > 1
    n, t = match_count_terminated(store, text, terminate_after=total - 1)
    assert (n, t) == (total - 1, True)
    n, t = match_count_terminated(store, text, terminate_after=total)
    assert (n, t) == (total, False)
    n, t = match_count_terminated(store, text, terminate_after=10**9)
    assert (n, t) == (total, False)
    import pytest as _pt

    with _pt.raises(ValueError):
        match_count_terminated(store, text, terminate_after=0)


def test_count_api_matches_brute_force(built):
    """ES _count: per-query conjunctive counts == brute force over the
    oracle's postings; queries with no terms / unknown terms count 0."""
    from bitcoin_ledger_2es_ray.pipelines.apis import count_docs
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    qterms = fixture_query_terms(sorted(oracle.postings), n=25)
    got = count_docs(store, qterms)
    assert got.column_names == ["query_id", "count"]
    assert got["query_id"].to_pylist() == list(range(len(qterms)))
    for qid, terms in enumerate(qterms):
        sets = [set(oracle.postings[t]) for t in set(terms)]
        exp = len(set.intersection(*sets)) if sets else 0
        assert got["count"][qid].as_py() == exp, (qid, terms)
    # empty and unknown-term queries
    extra = count_docs(store, [[], ["__nosuchterm__"]])
    assert extra["count"].to_pylist() == [0, 0]
