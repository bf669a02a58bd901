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


def test_federated_phrase_and_slop_match_union(ray_session, tmp_path):
    """Phrase / sloppy-phrase over a federation of POSITIONAL member
    indices equals the union positional index."""
    import random

    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        phrase_match,
        phrase_match_slop,
    )

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25)))
        for _ in range(80)
    ]

    def write(dirname, lo, hi):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "repo": ["r"] * (hi - lo),
                    "path": [f"p{i}" for i in range(lo, hi)],
                    "commit": ["c"] * (hi - lo),
                    "lang": ["en"] * (hi - lo),
                    "content": docs[lo:hi],
                }
            ),
            str(d / "c.parquet"),
            row_group_size=32,
        )
        return str(d)

    def build(corpus, out):
        cfg = _cfg(corpus, out)
        cfg.with_positions = True
        return build_index(cfg)

    union_dir = tmp_path / "union_corpus"
    union_dir.mkdir()
    a = write("ca", 0, 30)
    b = write("cb", 30, 80)
    import os

    os.link(os.path.join(a, "c.parquet"), str(union_dir / "a.parquet"))
    os.link(os.path.join(b, "c.parquet"), str(union_dir / "b.parquet"))
    # NOTE: union corpus must order a's docs before b's — file names sort a<b

    union = build(str(union_dir), tmp_path / "u")
    m1 = build(a, tmp_path / "m1")
    m2 = build(b, tmp_path / "m2")
    single = SegmentStore(union.out_dir)
    fed = FederatedStore([m1.out_dir, m2.out_dir])

    for trial in range(15):
        src = rng.randrange(len(docs))
        toks = docs[src].split()
        start = rng.randrange(max(1, len(toks) - 2))
        phrase = " ".join(toks[start : start + 2])
        assert (
            phrase_match(fed, phrase).tolist()
            == phrase_match(single, phrase).tolist()
        ), phrase
        for slop in (0, 2):
            assert (
                phrase_match_slop(fed, phrase, slop=slop).tolist()
                == phrase_match_slop(single, phrase, slop=slop).tolist()
            ), (phrase, slop)


def test_indices_boost_scales_members(federation):
    """indices_boost: boost 1.0/1.0 is the plain federated ranking; a
    member's boost scales exactly its docs' scores."""
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.federate import indices_boost_topk
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    _single, fed, _ = federation
    vocab = sorted(fed.df)
    text = " ".join(vocab[i % len(vocab)] for i in (3, 11))
    plain = indices_boost_topk(fed, text, 10, boosts=[1.0, 1.0], round_decimals=6)
    assert plain == score_query(fed, text, 10, round_decimals=6)

    cut = fed.doc_bases[1]
    full = score_query(fed, text, fed.n_docs, round_decimals=None)
    want = sorted(
        (
            (d, float(sql_round(s * (1.5 if d < cut else 0.5), 6)))
            for d, s in full
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = indices_boost_topk(fed, text, 10, boosts=[1.5, 0.5], round_decimals=6)
    assert got == want

    with pytest.raises(ValueError, match="one boost per member"):
        indices_boost_topk(fed, text, 10, boosts=[1.0])
