"""Degenerate inputs: empty corpus, single doc, empty-index queries."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.pipelines.query import (
    SegmentStore,
    score_query,
    score_query_wand,
)
from bitcoin_ledger_2es_ray.schemas import CORPUS_WITH_SHA


def _corpus(path, contents):
    n = len(contents)
    t = pa.table(
        {
            "repo": [f"r{i}" for i in range(n)],
            "path": [f"f{i}" for i in range(n)],
            "commit": ["c" * 40] * n,
            "lang": ["py"] * n,
            "content": contents,
            "sha256": [hashlib.sha256(c.encode()).digest() for c in contents],
        },
        schema=CORPUS_WITH_SHA,
    )
    pq.write_table(t, path)
    return path


def test_empty_corpus(ray_session, tmp_path):
    corpus = _corpus(str(tmp_path / "c.parquet"), [])
    res = build_index(BuildConfig(corpus=corpus, out_dir=str(tmp_path / "idx"), num_partitions=4))
    assert res.n_docs == 0 and res.n_terms == 0
    store = SegmentStore(res.out_dir)
    assert score_query(store, "anything", 10) == []
    assert score_query_wand(store, "anything", 10) == []


def test_single_doc(ray_session, tmp_path):
    corpus = _corpus(str(tmp_path / "c.parquet"), ["getBlockHash returns the hash"])
    res = build_index(BuildConfig(corpus=corpus, out_dir=str(tmp_path / "idx"), num_partitions=4))
    assert res.n_docs == 1
    store = SegmentStore(res.out_dir)
    top = score_query(store, "hash", 5)
    assert [d for d, _ in top] == [0]
    assert score_query_wand(store, "hash", 5) == top


def test_empty_and_whitespace_docs(ray_session, tmp_path):
    corpus = _corpus(str(tmp_path / "c.parquet"), ["", "   ", "real content here"])
    res = build_index(BuildConfig(corpus=corpus, out_dir=str(tmp_path / "idx"), num_partitions=4))
    assert res.n_docs == 3  # empty docs still counted (dl=0)
    store = SegmentStore(res.out_dir)
    assert [d for d, _ in score_query(store, "content", 5)] == [2]
