"""Federated search (pipelines/federate.py) — ES cross-cluster analog.

The load-bearing claim: a FederatedStore over doc-disjoint member indices
with docBase offsets and dfs-style global stats is BIT-IDENTICAL to a
single index built over the union corpus."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.pipelines.federate import FederatedStore
from bitcoin_ledger_2es_ray.pipelines.query import (
    SegmentStore,
    explain_score,
    function_score_query,
    score_query,
)
from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet
from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

SF_DIR = "/root/testdata/sf0.001"


def _cfg(corpus: str, out) -> BuildConfig:
    return BuildConfig(
        corpus=corpus,
        out_dir=str(out),
        num_partitions=4,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=2,
    )


@pytest.fixture(scope="module")
def federation(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fed")
    whole = pq.read_table(
        derive_corpus_parquet(SF_DIR, str(root / "all.parquet"), row_group_size=128)
    )
    cut = whole.num_rows // 3
    for name, (lo, hi) in (("a", (0, cut)), ("b", (cut, whole.num_rows))):
        d = root / f"corpus_{name}"
        d.mkdir()
        pq.write_table(
            whole.slice(lo, hi - lo), str(d / f"{name}.parquet"), row_group_size=64
        )
    union_dir = root / "corpus_union"
    union_dir.mkdir()
    for name in ("a", "b"):
        (union_dir / f"{name}.parquet").hardlink_to(
            root / f"corpus_{name}" / f"{name}.parquet"
        )

    union = build_index(_cfg(str(union_dir), root / "union"))
    m1 = build_index(_cfg(str(root / "corpus_a"), root / "m1"))
    m2 = build_index(_cfg(str(root / "corpus_b"), root / "m2"))
    return (
        SegmentStore(union.out_dir),
        FederatedStore([m1.out_dir, m2.out_dir]),
        (m1, m2),
    )


def test_global_stats_exact(federation):
    single, fed, (m1, m2) = federation
    assert fed.n_docs == single.n_docs == m1.n_docs + m2.n_docs
    assert fed.avgdl == single.avgdl  # exact — total_dl sums, not avg-of-avgs
    assert fed.doc_bases == [0, m1.n_docs]


def test_df_sums_across_members(federation):
    single, fed, _ = federation
    assert fed.df == single.df


def test_federated_query_bit_identical_to_union_index(federation):
    single, fed, _ = federation
    texts = fixture_queries(sorted(single.df), n=25, k=10)["text"].to_pylist()
    for t in texts:
        assert score_query(fed, t, k=10) == score_query(single, t, k=10), t
        assert function_score_query(fed, t, 10, round_decimals=6) == (
            function_score_query(single, t, 10, round_decimals=6)
        ), t


def test_federated_explain_matches(federation):
    single, fed, _ = federation
    texts = fixture_queries(sorted(single.df), n=5, k=10)["text"].to_pylist()
    for t in texts:
        top = score_query(single, t, k=3)
        for doc, _ in top:
            assert explain_score(fed, t, doc) == explain_score(single, t, doc)


def test_federation_refuses_tombstoned_members(federation, tmp_path):
    import shutil

    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import delete_by_query

    _, fed, _ = federation
    dirty = str(tmp_path / "dirty")
    shutil.copytree(fed.stores[0].index_dir, dirty)
    delete_by_query(dirty, pc.field("lang") == "de")
    with pytest.raises(ValueError, match="compact"):
        FederatedStore([dirty])
