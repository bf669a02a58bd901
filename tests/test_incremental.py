"""Incremental ingest — the reference's "sync from last indexed height"
(SURVEY.md §0.1, §2.8) generalized to per-partition lineage.

Appending new corpus files to an already-built index re-tokenizes ONLY the
new read units (old units skip via manifest fingerprints) and produces an
index bit-identical to a from-scratch build over the full corpus."""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.schemas import CORPUS_WITH_SHA
from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

SF_DIR = "/root/testdata/sf0.001"


def _extra_corpus(path: str, n: int = 100, offset: int = 10_000) -> str:
    rows = {
        "repo": [f"org{i % 3}/extra" for i in range(n)],
        "path": [f"src/new/file_{offset + i}.py" for i in range(n)],
        "commit": [hashlib.sha256(f"c{i}".encode()).hexdigest()[:40] for i in range(n)],
        "lang": ["en"] * n,
        "content": [f"fresh batch data value{i % 7} window scan" for i in range(n)],
    }
    rows["sha256"] = [hashlib.sha256(c.encode()).digest() for c in rows["content"]]
    pq.write_table(pa.table(rows, schema=CORPUS_WITH_SHA), path, row_group_size=64)
    return path


def _hashes(out_dir: str) -> dict[str, str]:
    return {
        str(p.relative_to(out_dir)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted(Path(out_dir).rglob("*.parquet"))
    }


def test_incremental_append(ray_session, tmp_path):
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    derive_corpus_parquet(SF_DIR, str(corpus_dir / "a.parquet"), row_group_size=128)

    def cfg(out):
        return BuildConfig(
            corpus=str(corpus_dir),
            out_dir=str(out),
            num_partitions=8,
            head_df_ratio=0.5,
            n_salt=2,
            sketch_stride=2,
        )

    # initial build on corpus A
    inc = tmp_path / "inc"
    r1 = build_index(cfg(inc))
    assert r1.n_docs == 500

    # append corpus B ("new blocks arrived"), resume the SAME out_dir
    _extra_corpus(str(corpus_dir / "b.parquet"))
    r2 = build_index(cfg(inc))
    assert r2.n_docs == 600
    # old units skipped: only the new file's units tokenized.
    # NOTE: the appended file sorts after a.parquet, so old units keep
    # their part ids and offsets; the new docs get ids 500..599.
    assert r2.skipped_units == r1.n_units
    assert r2.n_units == r1.n_units + 2  # 100 rows / 64-row groups → 2 units

    # bit-identical to a from-scratch build over the full corpus
    scratch = tmp_path / "scratch"
    build_index(cfg(scratch))
    assert _hashes(str(inc)) == _hashes(str(scratch))


def test_modified_input_invalidates_only_its_units(ray_session, tmp_path):
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    derive_corpus_parquet(SF_DIR, str(corpus_dir / "a.parquet"), row_group_size=128)
    _extra_corpus(str(corpus_dir / "b.parquet"))

    def cfg(out):
        return BuildConfig(
            corpus=str(corpus_dir), out_dir=str(out), num_partitions=8,
            head_df_ratio=0.5, n_salt=2, sketch_stride=2,
        )

    out = tmp_path / "idx"
    r1 = build_index(cfg(out))
    # rewrite file b with different content (the reference's reorg analog:
    # a stale partition's fingerprint mismatches and it re-derives)
    _extra_corpus(str(corpus_dir / "b.parquet"), n=100, offset=20_000)
    r2 = build_index(cfg(out))
    assert r2.skipped_units == r1.n_units - 2  # only b.parquet's 2 units redo
