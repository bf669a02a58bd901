"""Checkpoint / resume (SURVEY.md §3.3, §5.6; BASELINE.json L14).

A killed build must resume from the per-partition manifest without
re-tokenizing completed partitions, and the resumed result must be
bit-identical to an uninterrupted build.  Determinism across parallelism
levels is asserted too (doc ids come from footer metadata, not arrival
order).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import pytest

from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

SF_DIR = "/root/testdata/sf0.001"


def _cfg(corpus, out_dir, **kw):
    base = dict(num_partitions=8, head_df_ratio=0.5, n_salt=2, sketch_stride=2)
    base.update(kw)
    return BuildConfig(corpus=corpus, out_dir=str(out_dir), **base)


def _tree_hashes(out_dir: str) -> dict[str, str]:
    """sha256 of every index artifact (segments, dict, stats, maps)."""
    out = {}
    for p in sorted(Path(out_dir).rglob("*.parquet")):
        rel = str(p.relative_to(out_dir))
        out[rel] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    return derive_corpus_parquet(SF_DIR, str(root / "corpus.parquet"), row_group_size=128)


def test_kill_and_resume_bit_identical(corpus, tmp_path):
    # uninterrupted reference build
    a = tmp_path / "a"
    build_index(_cfg(corpus, a))
    ref = _tree_hashes(str(a))

    # full build in b, then simulate a mid-build kill: drop half the segment
    # shards and two tokenize partitions (outputs + manifest entries)
    b = tmp_path / "b"
    build_index(_cfg(corpus, b))
    killed_parts = [1, 3]
    killed_shards = [0, 2, 5]
    for part in killed_parts:
        os.remove(b / "postings" / f"part-{part:06d}.parquet")
        os.remove(b / "forward_map" / f"part-{part:06d}.parquet")
        os.remove(b / "_MANIFEST" / f"tokenize-{part}.json")
    for sid in killed_shards:
        seg = b / "segments" / f"shard-{sid:05d}.parquet"
        if seg.exists():
            os.remove(seg)
        man = b / "_MANIFEST" / f"segment-{sid}.json"
        if man.exists():
            os.remove(man)

    survivor = b / "postings" / "part-000000.parquet"
    mtime_before = survivor.stat().st_mtime_ns

    res = build_index(_cfg(corpus, b))
    # completed partitions were skipped: 4 units - 2 killed = 2 skipped,
    # and the surviving postings part was not rewritten (no re-tokenize)
    assert res.skipped_units == 2
    assert survivor.stat().st_mtime_ns == mtime_before
    # segments: killed shards rebuilt; every artifact bit-identical to the
    # uninterrupted build
    assert _tree_hashes(str(b)) == ref


def test_resume_noop_when_complete(corpus, tmp_path):
    out = tmp_path / "idx"
    build_index(_cfg(corpus, out))
    before = _tree_hashes(str(out))
    seg = out / "segments" / "shard-00000.parquet"
    seg_mtime = seg.stat().st_mtime_ns if seg.exists() else None
    res = build_index(_cfg(corpus, out))
    assert res.skipped_units == res.n_units
    assert res.skipped_shards > 0
    assert _tree_hashes(str(out)) == before
    if seg_mtime is not None:
        assert seg.stat().st_mtime_ns == seg_mtime  # not rewritten


def test_shrunk_corpus_drops_ghost_docs(corpus, tmp_path):
    """Rebuilding into an out_dir after the corpus SHRANK must not keep ghost
    documents from pruned read units (stale tokenize entries / part files)."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    out = tmp_path / "idx"
    build_index(_cfg(corpus, out))
    full_docs = build_index(_cfg(corpus, out)).n_docs  # resume no-op, read stats

    # shrink: keep only the first row group's docs (same row-group layout)
    t = pq.read_table(corpus)
    half = t.slice(0, 128)
    shrunk = tmp_path / "shrunk.parquet"
    pq.write_table(half, shrunk, row_group_size=128)

    res = build_index(_cfg(str(shrunk), out))
    assert res.n_docs == 128 < full_docs

    # stale artifacts are gone and the rebuilt tree is bit-identical to a
    # fresh build of the shrunk corpus
    fresh = tmp_path / "fresh"
    build_index(_cfg(str(shrunk), fresh))
    assert _tree_hashes(str(out)) == _tree_hashes(str(fresh))

    # no ghost doc is queryable
    store = SegmentStore(str(out))
    assert store.n_docs == 128
    for term in sorted(store.df)[:10]:
        docs, _, _ = store.postings(term)
        assert docs.max() < 128
    hits = score_query(store, " ".join(sorted(store.df)[:2]), k=200)
    assert all(d < 128 for d, _ in hits)


def test_config_change_invalidates(corpus, tmp_path):
    out = tmp_path / "idx"
    build_index(_cfg(corpus, out))
    res = build_index(_cfg(corpus, out, num_partitions=4))
    assert res.skipped_units == 0  # build fingerprint changed → re-tokenize


def test_shuffle_modes_bit_identical(corpus, tmp_path):
    """fs (row-group exchange) and raydata (groupby) shuffles → same bytes."""
    a = tmp_path / "fs"
    b = tmp_path / "rd"
    build_index(_cfg(corpus, a, shuffle="fs"))
    build_index(_cfg(corpus, b, shuffle="raydata"))
    assert _tree_hashes(str(a)) == _tree_hashes(str(b))


def test_determinism_across_parallelism(corpus, tmp_path):
    """Same bytes at concurrency 1 and 4 (stand-in for N vs 4N workers)."""
    a = tmp_path / "c1"
    b = tmp_path / "c4"
    build_index(_cfg(corpus, a, concurrency=1))
    build_index(_cfg(corpus, b, concurrency=4))
    assert _tree_hashes(str(a)) == _tree_hashes(str(b))


def test_determinism_across_unit_layout(ray_session, tmp_path):
    """Same segments/dict/stats regardless of read-unit (row-group) size —
    docIDs derive from global row offsets, not unit boundaries."""
    a_corpus = derive_corpus_parquet(SF_DIR, str(tmp_path / "c128.parquet"), row_group_size=128)
    b_corpus = derive_corpus_parquet(SF_DIR, str(tmp_path / "c256.parquet"), row_group_size=256)
    a = tmp_path / "a"
    b = tmp_path / "b"
    build_index(_cfg(a_corpus, a))
    build_index(_cfg(b_corpus, b))

    def engine_outputs(root):
        return {
            k: v
            for k, v in _tree_hashes(str(root)).items()
            if k.startswith("segments") or k in ("term_dict.parquet", "stats.parquet")
        }

    assert engine_outputs(a) == engine_outputs(b)


def test_manifest_metrics(corpus, tmp_path):
    out = tmp_path / "idx"
    build_index(_cfg(corpus, out))
    entries = [
        json.loads(p.read_text()) for p in sorted((out / "_MANIFEST").glob("*.json"))
    ]
    kinds = {e["kind"] for e in entries}
    assert {"tokenize", "segment", "final"} <= kinds
    for e in entries:
        if e["kind"] == "tokenize":
            assert e["status"] == "done" and e["rows"] > 0 and "wall_s" in e
            assert e["input_fingerprint"]
        if e["kind"] == "segment":
            assert e["status"] == "done" and e["n_postings"] > 0 and "bytes" in e
