"""Large-vocabulary stress (code corpora have millions of identifiers, not
the 31-term testdata vocab): build + rank-identity on a synthetic corpus
with tens of thousands of distinct terms, zipf-ish dfs, and camelCase
identifiers that exercise the code tokenizer's compound+parts path."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.oracle import BM25Oracle
from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.pipelines.query import (
    SegmentStore,
    score_query,
    score_query_wand,
)
from bitcoin_ledger_2es_ray.schemas import CORPUS_WITH_SHA


def _code_corpus(path: str, n_docs: int = 2000, seed: int = 3) -> list[str]:
    """Deterministic fake source files: zipf-ish draws over a large
    identifier vocabulary, mixed camelCase/snake_case."""
    rng = np.random.default_rng(seed)
    nouns = ["block", "hash", "ledger", "index", "query", "score", "merge",
             "shard", "token", "batch", "frame", "cache", "actor", "table"]
    verbs = ["get", "set", "compute", "build", "read", "write", "merge",
             "split", "encode", "decode", "verify", "resume"]
    vocab = [f"{v}{n.capitalize()}{i}" for v in verbs for n in nouns for i in range(40)]
    # zipf-ish: p(rank) ∝ 1/(rank+1) over the whole vocabulary
    p = 1.0 / (np.arange(len(vocab)) + 1.0)
    ranks = rng.choice(len(vocab), size=n_docs * 40, p=p / p.sum())
    docs = []
    pos = 0
    for d in range(n_docs):
        ln = int(rng.integers(10, 60))
        words = [vocab[r] for r in ranks[pos : pos + ln]]
        pos += ln
        docs.append(" ".join(words) if words else "empty_doc")
    t = pa.table(
        {
            "repo": [f"org/r{d % 13}" for d in range(n_docs)],
            "path": [f"src/m{d % 7}/f_{d}.py" for d in range(n_docs)],
            "commit": [hashlib.sha256(f"c{d}".encode()).hexdigest()[:40] for d in range(n_docs)],
            "lang": ["py"] * n_docs,
            "content": docs,
            "sha256": [hashlib.sha256(c.encode()).digest() for c in docs],
        },
        schema=CORPUS_WITH_SHA,
    )
    pq.write_table(t, path, row_group_size=256)
    return docs


@pytest.fixture(scope="module")
def big_vocab(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("bigvocab")
    docs = _code_corpus(str(root / "corpus.parquet"))
    res = build_index(
        BuildConfig(
            corpus=str(root / "corpus.parquet"),
            out_dir=str(root / "idx"),
            num_partitions=16,
            head_df_ratio=0.05,
            n_salt=2,
            max_slice_postings=2000,
            sketch_stride=2,
        )
    )
    oracle = BM25Oracle(list(range(len(docs))), docs)
    return res, oracle


def test_vocab_scale(big_vocab):
    res, oracle = big_vocab
    assert res.n_terms > 5_000  # compounds + parts (160x the testdata vocab)
    assert res.n_terms == len(oracle.postings)
    assert res.n_docs == 2000


def test_rank_identity_large_vocab(big_vocab):
    res, oracle = big_vocab
    store = SegmentStore(res.out_dir)
    rng = np.random.default_rng(11)
    vocab = sorted(oracle.postings)
    # mix of rare identifiers, head parts, and full camelCase queries
    queries = ["getBlockHash0 computeScore1", "block hash index", "verify"]
    queries += [" ".join(rng.choice(vocab, size=rng.integers(1, 4), replace=False)) for _ in range(30)]
    for text in queries:
        got = score_query(store, text, 10)
        exp = oracle.topk(text, 10)
        assert [d for d, _ in got] == [d for d, _ in exp], text
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in exp], rtol=0, atol=1e-9
        )
        wand = score_query_wand(store, text, 10)
        assert [d for d, _ in wand] == [d for d, _ in got], text


def test_term_dict_sorted(big_vocab):
    res, _ = big_vocab
    td = pq.read_table(f"{res.out_dir}/term_dict.parquet", columns=["term"])
    terms = td["term"].to_pylist()
    assert terms == sorted(terms)  # FST-style globally sorted keys


def test_pruned_term_dict_matches_eager(big_vocab):
    """Row-group-pruned binary search over the sorted term_dict must agree
    with the eager dict on every term, with bounded residency."""
    from bitcoin_ledger_2es_ray.state.termdict import TermDict

    res, _ = big_vocab
    path = f"{res.out_dir}/term_dict.parquet"
    eager = TermDict(path)  # vocab below default threshold → eager
    pruned = TermDict(path, eager_max_rows=0, cache_rgs=2)
    assert eager.eager and not pruned.eager
    vocab = sorted(eager.df)
    rng = np.random.default_rng(5)
    sample = list(rng.choice(vocab, size=200, replace=False)) + ["zzz_not_a_term", "a"]
    for t in sample:
        assert pruned.rows_of(t) == eager.rows_of(t), t
        assert pruned.df_of(t) == eager.df_of(t), t
    assert len(pruned._cache) <= 2  # LRU stays bounded
    assert pruned.partitions() == eager.partitions()


def test_pruned_store_rank_identity(big_vocab):
    """SegmentStore in pruned-dictionary mode is rank-identical to eager."""
    res, oracle = big_vocab
    eager = SegmentStore(res.out_dir)
    pruned = SegmentStore(res.out_dir, eager_vocab_max=0)
    rng = np.random.default_rng(17)
    vocab = sorted(oracle.postings)
    queries = [" ".join(rng.choice(vocab, size=rng.integers(1, 4), replace=False)) for _ in range(20)]
    for text in queries:
        assert score_query(pruned, text, 10) == score_query(eager, text, 10), text


def test_synthetic_million_term_dict(tmp_path):
    """A 10^6-row dictionary: pruned lookups stay correct and bounded —
    no full-vocab Python dict is ever built."""
    import pyarrow.parquet as pq2

    from bitcoin_ledger_2es_ray.schemas import TERM_DICT
    from bitcoin_ledger_2es_ray.state.termdict import TermDict

    n = 1_000_000
    terms = [f"t{i:08d}" for i in range(n)]  # sorted by construction
    t = pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "salt": pa.array(np.zeros(n, dtype=np.uint16)),
            "partition": pa.array((np.arange(n) % 64).astype(np.uint32)),
            "row": pa.array(np.arange(n, dtype=np.uint32)),
            "df": pa.array((1 + np.arange(n) % 1000).astype(np.uint32)),
            "cf": pa.array((1 + np.arange(n) % 5000).astype(np.uint64)),
        },
        schema=TERM_DICT,
    )
    path = str(tmp_path / "big_dict.parquet")
    pq2.write_table(t, path, row_group_size=65536)
    td = TermDict(path, eager_max_rows=1000, cache_rgs=4)
    assert not td.eager
    rng = np.random.default_rng(9)
    for i in rng.integers(0, n, size=300):
        i = int(i)
        assert td.rows_of(f"t{i:08d}") == [(i % 64, i)]
        assert td.df_of(f"t{i:08d}") == 1 + i % 1000
    assert td.rows_of("absent") == [] and td.df_of("absent") == 0
    assert len(td._cache) <= 4


def test_streaming_merge_matches_eager(big_vocab):
    """The bounded-memory streaming run merge produces byte-identical
    term_dict content and the same distinct-term count as the C++ sort."""
    import glob
    import os

    import pyarrow.parquet as pq2

    from bitcoin_ledger_2es_ray.state.termdict import write_merged_term_dict

    res, _ = big_vocab
    parts = sorted(glob.glob(f"{res.out_dir}/term_dict_parts/shard-*.parquet"))
    assert parts
    out = f"{res.out_dir}/term_dict_streamed.parquet"
    n_stream = write_merged_term_dict(parts, out, eager_max_rows=0, row_group_size=512)
    ref = pq2.read_table(f"{res.out_dir}/term_dict.parquet")
    got = pq2.read_table(out)
    assert got.equals(ref)
    assert n_stream == res.n_terms
    os.remove(out)
