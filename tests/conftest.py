from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def built(ray_session, tmp_path_factory):
    """One sf0.001 index build shared by the whole session:
    (BuildResult, BM25Oracle, corpus_path)."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.oracle import BM25Oracle
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    root = tmp_path_factory.mktemp("idx")
    corpus = derive_corpus_parquet(SF_DIR, str(root / "corpus.parquet"), row_group_size=128)
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(root / "index"),
        num_partitions=8,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=2,
    )
    res = build_index(cfg)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    oracle = BM25Oracle(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    return res, oracle, corpus
