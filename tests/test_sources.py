"""Corpus source robustness: large_string inputs, no-sha corpora, S5 IO."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
from bitcoin_ledger_2es_ray.sources.corpus import read_unit, scan_corpus
from bitcoin_ledger_2es_ray.sources.queries import (
    fixture_queries,
    read_queries,
    write_results,
)


def _large_string_corpus(path: str, n: int = 50) -> str:
    rows = {
        "repo": [f"r{i % 3}" for i in range(n)],
        "path": [f"f_{i}.py" for i in range(n)],
        "commit": ["c" * 40] * n,
        "lang": ["py"] * n,
        "content": [f"getBlockHash compute_{i} value data" for i in range(n)],
    }
    t = pa.table(
        {
            k: pa.array(v, type=pa.large_string() if k == "content" else pa.string())
            for k, v in rows.items()
        }
    )
    pq.write_table(t, path, row_group_size=25)
    return path


def test_large_string_cast_and_no_sha(ray_session, tmp_path):
    corpus = _large_string_corpus(str(tmp_path / "ls.parquet"))
    units = scan_corpus(corpus)
    assert not units[0]["has_sha"]  # no expected-sha column: self-hash mode
    t = read_unit(units[0])
    assert t.schema.field("content").type == pa.string()

    res = build_index(
        BuildConfig(corpus=corpus, out_dir=str(tmp_path / "idx"), num_partitions=4)
    )
    assert res.n_docs == 50
    store = SegmentStore(res.out_dir)
    top = score_query(store, "getBlockHash", 5)
    assert len(top) == 5  # compound+parts indexed


def test_query_io_roundtrip(tmp_path):
    q = fixture_queries(["alpha", "beta", "gamma"], n=5)
    path = str(tmp_path / "q.parquet")
    pq.write_table(q, path)
    assert read_queries(path).equals(q)

    results = pa.table(
        {
            "query_id": pa.array([0, 0], type=pa.uint64()),
            "rank": pa.array([1, 2], type=pa.uint32()),
            "doc_id": pa.array([5, 7], type=pa.uint64()),
            "score": pa.array([1.5, 1.2], type=pa.float64()),
        }
    )
    out = write_results(results, str(tmp_path / "res.parquet"))
    assert pq.read_table(out).num_rows == 2


def test_parallel_footer_scan_matches_serial(ray_session, tmp_path):
    """Many-file corpora fan the footer scan out as Ray tasks; units, parts
    and doc offsets must be byte-identical to the serial driver loop."""
    import bitcoin_ledger_2es_ray.sources.corpus as corpus_mod

    d = tmp_path / "many"
    d.mkdir()
    n_files = corpus_mod._SCAN_PARALLEL_MIN + 8
    for i in range(n_files):
        rows = 1 + i % 3
        t = pa.table(
            {
                "repo": [f"r{i}"] * rows,
                "path": [f"p{i}/{j}" for j in range(rows)],
                "commit": ["c" * 40] * rows,
                "lang": ["python"] * rows,
                "content": [f"alpha beta doc {i} {j}" for j in range(rows)],
            }
        )
        pq.write_table(t, d / f"f-{i:05d}.parquet", row_group_size=2)

    par = scan_corpus(str(d))
    # serial reference: force the driver loop by scanning below the threshold
    old = corpus_mod._SCAN_PARALLEL_MIN
    corpus_mod._SCAN_PARALLEL_MIN = 10**9
    try:
        ser = scan_corpus(str(d))
    finally:
        corpus_mod._SCAN_PARALLEL_MIN = old
    assert par == ser
    assert len(par) > n_files  # multi-row-group files produce >1 unit
    # offsets are a prefix sum over units in sorted-path order
    total = 0
    for u in par:
        assert u["offset"] == total
        total += u["num_rows"]
