"""Delete-by-query tombstones + compaction (pipelines/lifecycle.py).

The reference handles chain reorgs by deleting orphaned heights from ES and
re-deriving; ES/Lucene implement deletion as SOFT-DELETES (a live-docs
bitset consulted at query time) with space reclaimed by segment merges.
These tests pin the graft's mirror of both halves:

- tombstoned docs vanish from every query path while survivors keep their
  exact pre-delete scores (stats stay stale — Lucene live-docs semantics),
- the WAND fast path refuses under live tombstones (its block-max metadata
  pre-dates the deletes) and returns after compaction,
- compaction drops dead postings, recomputes exact stats, keeps doc_ids
  stable, preserves positions, and with ZERO tombstones is byte-identical
  to the source segments (encode is a pure function of the row set).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
    compact_index,
    delete_by_query,
    load_tombstones,
)
from bitcoin_ledger_2es_ray.pipelines.query import (
    SegmentStore,
    score_query,
    score_query_wand,
)


@pytest.fixture()
def idx_copy(built, tmp_path):
    """Private copy of the shared session index — deletes must not pollute
    the other tests' fixture."""
    res, _, _ = built
    dst = str(tmp_path / "idx")
    shutil.copytree(res.out_dir, dst)
    return dst


def _seg_hashes(index_dir: str) -> dict[str, str]:
    seg = Path(index_dir) / "segments"
    return {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in sorted(seg.glob("*.parquet"))
    }


def _fixture_texts(store: SegmentStore, n: int = 12) -> list[str]:
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    return fixture_queries(sorted(store.df), n=n, k=10)["text"].to_pylist()


def test_delete_by_query_masks_with_stale_stats(idx_copy):
    fwd = pq.read_table(
        os.path.join(idx_copy, "forward_map"), columns=["doc_id", "lang"]
    )
    dead = set(
        fwd.filter(pc.equal(fwd["lang"], "de"))["doc_id"].to_pylist()
    )
    assert dead, "sf0.001 corpus should contain lang='de' docs"

    clean = SegmentStore(idx_copy)
    texts = _fixture_texts(clean)
    # pre-delete FULL ranking (k >> deletions) per query, for the oracle
    pre = {t: score_query(clean, t, k=10 + len(dead)) for t in texts}

    n = delete_by_query(idx_copy, pc.field("lang") == "de")
    assert n == len(dead)
    # idempotent union
    assert delete_by_query(idx_copy, pc.field("lang") == "de") == len(dead)
    assert set(load_tombstones(idx_copy).tolist()) == dead

    store = SegmentStore(idx_copy)  # fresh store auto-loads tombstones
    assert store.tombs is not None
    # stats stay STALE (Lucene live-docs): N/avgdl unchanged
    assert store.n_docs == clean.n_docs
    assert store.avgdl == clean.avgdl

    for t in texts:
        got = score_query(store, t, k=10)
        want = [(d, s) for d, s in pre[t] if d not in dead][:10]
        assert got == want, t  # survivors keep exact pre-delete scores

    # posting decode masks too
    term = sorted(store.df)[len(store.df) // 2]
    d0, tf0, dl0 = clean.postings(term)
    keep = ~np.isin(d0, np.fromiter(dead, dtype=np.uint64))
    d1, tf1, dl1 = store.postings(term)
    assert d1.tolist() == d0[keep].tolist()
    assert tf1.tolist() == tf0[keep].tolist()
    assert dl1.tolist() == dl0[keep].tolist()

    # WAND's raw-block path refuses under live tombstones
    with pytest.raises(ValueError, match="tombstones"):
        store.raw_rows(term)


def test_delete_union_across_predicates(idx_copy):
    n1 = delete_by_query(idx_copy, pc.field("lang") == "de")
    n2 = delete_by_query(idx_copy, pc.field("lang") == "fr")
    assert n2 > n1  # union grew
    fwd = pq.read_table(os.path.join(idx_copy, "forward_map"), columns=["lang"])
    want = pc.sum(
        pc.is_in(fwd["lang"], value_set=__import__("pyarrow").array(["de", "fr"]))
    ).as_py()
    assert n2 == want


def test_compact_drops_dead_recomputes_stats(ray_session, idx_copy, tmp_path):
    delete_by_query(idx_copy, pc.field("lang") == "de")
    tombs = load_tombstones(idx_copy)
    masked = SegmentStore(idx_copy)

    out = str(tmp_path / "compacted")
    res = compact_index(idx_copy, out)
    assert res.n_deleted == len(tombs)

    store = SegmentStore(out)
    assert store.tombs is None  # tombstones merged away
    # stats EXACT over survivors
    fwd = pq.read_table(os.path.join(out, "forward_map"))
    assert res.n_docs == store.n_docs == fwd.num_rows
    assert store.n_docs == masked.n_docs - len(tombs)
    dls = np.asarray(fwd["dl"].combine_chunks(), dtype=np.float64)
    assert store.avgdl == pytest.approx(dls.mean())
    assert not np.isin(
        np.asarray(fwd["doc_id"].combine_chunks(), dtype=np.uint64), tombs
    ).any()

    # doc_ids stable: every term's compacted postings == masked originals
    for term in sorted(masked.df)[::7]:
        d0, tf0, dl0 = masked.postings(term)  # tombstone-masked view
        d1, tf1, dl1 = store.postings(term)
        assert d1.tolist() == d0.tolist(), term
        assert tf1.tolist() == tf0.tolist(), term
        assert dl1.tolist() == dl0.tolist(), term
        assert store.td.df_of(term) == len(d0)  # dictionary df updated

    # WAND fast path restored, rank-identical to TAAT on the new stats
    for t in _fixture_texts(store, n=8):
        taat = score_query(store, t, k=10)
        wand = score_query_wand(store, t, k=10)
        assert [d for d, _ in wand] == [d for d, _ in taat]
        for (_, sw), (_, st) in zip(wand, taat):
            assert sw == pytest.approx(st, abs=1e-9)


def test_compact_noop_is_byte_identical(ray_session, idx_copy, tmp_path):
    out = str(tmp_path / "noop")
    res = compact_index(idx_copy, out)  # no tombstones at all
    assert res.n_deleted == 0
    assert _seg_hashes(out) == _seg_hashes(idx_copy)
    # merged dictionary identical too
    a = pq.read_table(os.path.join(idx_copy, "term_dict.parquet"))
    b = pq.read_table(os.path.join(out, "term_dict.parquet"))
    assert a.equals(b)


def test_compact_preserves_positions(ray_session, tmp_path):
    import random

    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))
        for _ in range(90)
    ]
    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * len(docs),
                "path": [f"p{i}" for i in range(len(docs))],
                "commit": ["c"] * len(docs),
                "lang": ["en" if i % 3 else "de" for i in range(len(docs))],
                "content": docs,
            }
        ),
        corpus,
        row_group_size=32,
    )
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(tmp_path / "idx"),
        num_partitions=4,
        with_positions=True,
        head_df_ratio=0.3,
        n_salt=2,
        sketch_stride=1,
    )
    built = build_index(cfg)

    pre = SegmentStore(built.out_dir)
    phrases = [" ".join(docs[i].split()[:2]) for i in (0, 7, 20) if len(docs[i].split()) >= 2]
    pre_match = {p: set(phrase_match(pre, p).tolist()) for p in phrases}

    n = delete_by_query(built.out_dir, pc.field("lang") == "de")
    assert n == sum(1 for i in range(len(docs)) if i % 3 == 0)
    dead = set(load_tombstones(built.out_dir).tolist())

    out = str(tmp_path / "compacted")
    compact_index(built.out_dir, out)
    post = SegmentStore(out)

    # phrase evaluation on the compacted positional index: original matches
    # minus the deleted docs (positions survived the rewrite intact)
    for p in phrases:
        assert set(phrase_match(post, p).tolist()) == pre_match[p] - dead

    # per-term positional streams equal the masked originals
    for term in sorted(post.df)[::5]:
        d0, tf0, p0 = pre.postings_positions(term)
        keep = ~np.isin(d0, np.fromiter(dead, dtype=np.uint64))
        pkeep = np.repeat(keep, tf0.astype(np.int64))
        d1, tf1, p1 = post.postings_positions(term)
        assert d1.tolist() == d0[keep].tolist(), term
        assert tf1.tolist() == tf0[keep].tolist(), term
        assert p1.tolist() == p0[pkeep].tolist(), term


def test_update_by_query_streams_and_swaps(ray_session, idx_copy):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import update_by_query
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    pre_store = SegmentStore(idx_copy)
    texts = _fixture_texts(pre_store, n=6)
    pre = {t: score_query(pre_store, t, k=10) for t in texts}
    fwd0 = pq.read_table(os.path.join(idx_copy, "forward_map"))
    n_de = pc.sum(pc.equal(fwd0["lang"], "de").cast(pa.int8())).as_py()

    n = update_by_query(idx_copy, pc.field("lang") == "de", {"lang": "und"})
    assert n == n_de

    fwd1 = pq.read_table(os.path.join(idx_copy, "forward_map"))
    assert fwd1.num_rows == fwd0.num_rows
    assert pc.sum(pc.equal(fwd1["lang"], "de").cast(pa.int8())).as_py() == 0
    assert pc.sum(pc.equal(fwd1["lang"], "und").cast(pa.int8())).as_py() == n_de
    # identity columns untouched, row-for-row (sort both by doc_id)
    a = fwd0.select(["doc_id", "dl", "sha256", "path"]).sort_by("doc_id")
    b = fwd1.select(["doc_id", "dl", "sha256", "path"]).sort_by("doc_id")
    assert a.equals(b)

    # metadata update never touches postings/scores
    post_store = SegmentStore(idx_copy)
    for t in texts:
        assert score_query(post_store, t, k=10) == pre[t]

    # identity columns refuse updates
    with pytest.raises(ValueError, match="identity"):
        update_by_query(idx_copy, pc.field("lang") == "en", {"doc_id": 0})
    # no leftover swap dirs
    assert not os.path.exists(os.path.join(idx_copy, "forward_map.updating"))
    assert not os.path.exists(os.path.join(idx_copy, "forward_map.old"))


def test_snapshot_restore_roundtrip_and_corruption(idx_copy, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        restore_index,
        snapshot_index,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    snap = str(tmp_path / "snap")
    info = snapshot_index(idx_copy, snap)
    assert info["files"] > 0 and info["bytes"] > 0

    dest = str(tmp_path / "restored")
    assert restore_index(snap, dest) == info["files"]

    # restored index answers queries identically
    a, b = SegmentStore(idx_copy), SegmentStore(dest)
    for t in _fixture_texts(a, n=5):
        assert score_query(a, t, k=10) == score_query(b, t, k=10)

    # flip a byte in the snapshot → restore refuses before writing anything
    seg = next((Path(snap) / "segments").glob("*.parquet"))
    raw = bytearray(seg.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    # hardlinked snapshots share inodes with the source — rewrite via a
    # fresh file so the source index stays intact
    seg.unlink()
    seg.write_bytes(bytes(raw))
    dest2 = str(tmp_path / "restored2")
    with pytest.raises(ValueError, match="corruption"):
        restore_index(snap, dest2)
    assert not os.path.exists(os.path.join(dest2, "segments"))


def test_index_stats_reports_counts_and_tombstones(idx_copy):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import index_stats

    st = index_stats(idx_copy)
    assert st["n_docs"] == 500 and st["n_terms"] > 0
    assert st["n_segments"] > 0 and st["segment_bytes"] > 0
    assert st["term_dict_bytes"] > 0
    assert st["n_tombstones"] == 0
    n = delete_by_query(idx_copy, pc.field("lang") == "de")
    assert index_stats(idx_copy)["n_tombstones"] == n


def test_compact_resume_skips_committed_shards(ray_session, idx_copy, tmp_path):
    import json

    delete_by_query(idx_copy, pc.field("lang") == "de")
    out = str(tmp_path / "c")
    r1 = compact_index(idx_copy, out)
    assert r1.skipped_shards == 0
    before = _seg_hashes(out)
    td_before = hashlib.sha256(
        (Path(out) / "term_dict.parquet").read_bytes()
    ).hexdigest()

    # interrupted-run simulation: drop TWO shard outputs, re-run
    victims = sorted((Path(out) / "segments").glob("*.parquet"))[:2]
    for v in victims:
        (Path(out) / "term_dict_parts" / v.name).unlink()
        v.unlink()
    r2 = compact_index(idx_copy, out)
    n_shards = len(_seg_hashes(out))
    assert r2.skipped_shards == n_shards - 2  # only the victims re-ran
    assert _seg_hashes(out) == before  # bit-identical repair
    td_after = hashlib.sha256(
        (Path(out) / "term_dict.parquet").read_bytes()
    ).hexdigest()
    assert td_after == td_before
    assert (r2.n_docs, r2.n_terms) == (r1.n_docs, r1.n_terms)

    # full re-run: everything skips
    r3 = compact_index(idx_copy, out)
    assert r3.skipped_shards == n_shards
    assert _seg_hashes(out) == before


def test_compact_after_deleting_everything(ray_session, idx_copy, tmp_path):
    """Pathological but legal: every doc tombstoned → compaction produces a
    valid EMPTY index (zero stats, readable artifacts, no crash)."""
    import pyarrow as pa

    fwd = pq.read_table(os.path.join(idx_copy, "forward_map"), columns=["lang"])
    langs = sorted(set(fwd["lang"].to_pylist()))
    n = delete_by_query(idx_copy, pc.field("lang").isin(pa.array(langs)))
    assert n == fwd.num_rows

    out = str(tmp_path / "empty")
    res = compact_index(idx_copy, out)
    assert res.n_docs == 0 and res.n_deleted == n

    st = pq.read_table(os.path.join(out, "stats.parquet"))
    assert st["n_docs"][0].as_py() == 0
    assert st["avgdl"][0].as_py() == 0.0
    # forward map artifact stays readable (empty schema-bearing part)
    assert pq.read_table(os.path.join(out, "forward_map")).num_rows == 0
    # stats-family aggregations survive the empty index (no crash):
    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        extended_stats_agg,
        percentile_ranks_agg,
    )

    es = extended_stats_agg(out).to_pylist()[0]
    assert es["doc_count"] == 0 and es["min_dl"] is None
    pr = percentile_ranks_agg(out, values=(8, 16))
    assert pr["pct"].to_pylist() == [0.0, 0.0]


def test_alias_swap_and_reindex(ray_session, built, tmp_path):
    """ES _aliases/_reindex analog: atomic alias swap; reindex builds a
    positional index from the same corpus and repoints the alias — phrase
    queries start working through the SAME alias, the old index is
    untouched, rollback is one more swap."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        reindex,
        resolve_alias,
        update_aliases,
    )
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match

    res, _, corpus = built
    reg = str(tmp_path / "registry")
    update_aliases(reg, [("add", "main", res.out_dir)])
    assert resolve_alias(reg, "main") == res.out_dir
    s1 = SegmentStore(resolve_alias(reg, "main"))
    texts = _fixture_texts(s1, 6)
    before = [score_query(s1, t, 10, round_decimals=6) for t in texts]
    old_hashes = _seg_hashes(res.out_dir)

    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(tmp_path / "idx_v2"),
        num_partitions=4,
        with_positions=True,
    )
    res2 = reindex(cfg, reg, "main")
    assert resolve_alias(reg, "main") == res2.out_dir
    s2 = SegmentStore(resolve_alias(reg, "main"))
    # scores identical through the swapped alias (same corpus, same BM25)
    after = [score_query(s2, t, 10, round_decimals=6) for t in texts]
    assert after == before
    # the new index serves positional queries; the old is byte-untouched
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    two = docs[0].split(" ")[:2]
    assert len(phrase_match(s2, " ".join(two))) >= 1
    assert _seg_hashes(res.out_dir) == old_hashes
    # rollback + removal semantics
    update_aliases(reg, [("add", "main", res.out_dir), ("add", "v2", res2.out_dir)])
    assert resolve_alias(reg, "main") == res.out_dir
    update_aliases(reg, [("remove", "v2", None)])
    with pytest.raises(KeyError):
        resolve_alias(reg, "v2")
    with pytest.raises(ValueError):
        update_aliases(reg, [("add", "bad", str(tmp_path / "missing"))])
    with pytest.raises(ValueError):
        update_aliases(reg, [("frobnicate", "main", None)])


# ---------------------------------------------------------------------------
# reshard (ES _split / _shrink): shard-count change without re-tokenize


def _file_hashes(index_dir: str) -> dict[str, str]:
    out = _seg_hashes(index_dir)
    td = Path(index_dir) / "term_dict.parquet"
    out["term_dict.parquet"] = hashlib.sha256(td.read_bytes()).hexdigest()
    return out


@pytest.fixture(scope="module")
def reshard_corpus(ray_session, tmp_path_factory):
    """Small positional + salted corpus built fresh at P=4 and P=7 —
    the two fresh builds are the byte-identity references for split and
    shrink."""
    import random

    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index

    rng = random.Random(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = []
    for _ in range(90):
        n = rng.randint(3, 10)
        toks = [rng.choice(vocab) for _ in range(n)] + ["head"] * rng.randint(1, 2)
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    root = tmp_path_factory.mktemp("reshard")
    corpus = str(root / "corpus.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * len(docs),
                "path": [f"p{i}" for i in range(len(docs))],
                "commit": ["c"] * len(docs),
                "lang": ["en"] * len(docs),
                "content": docs,
            }
        ),
        corpus,
        row_group_size=32,
    )

    def fresh(p: int, name: str):
        return build_index(
            BuildConfig(
                corpus=corpus,
                out_dir=str(root / name),
                num_partitions=p,
                with_positions=True,
                head_df_ratio=0.3,
                n_salt=2,
                sketch_stride=1,
            )
        )

    res4, res7 = fresh(4, "idx4"), fresh(7, "idx7")
    assert res4.head_terms, "fixture should salt at least one head term"
    return root, res4, res7


def test_reshard_split_byte_identical(reshard_corpus):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import reshard_index

    root, res4, res7 = reshard_corpus
    out = str(root / "split47")
    r = reshard_index(res4.out_dir, out, new_partitions=7)
    assert (r.old_partitions, r.new_partitions) == (4, 7)
    assert _file_hashes(out) == _file_hashes(res7.out_dir)


def test_reshard_shrink_byte_identical_and_serves(reshard_corpus):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import reshard_index
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match

    root, res4, res7 = reshard_corpus
    out = str(root / "shrink74")
    r = reshard_index(res7.out_dir, out, new_partitions=4)
    assert _file_hashes(out) == _file_hashes(res4.out_dir)
    assert r.n_postings > 0
    # the resharded index serves identically (scores + positional queries)
    s_old, s_new = SegmentStore(res7.out_dir), SegmentStore(out)
    for t in _fixture_texts(s_old, n=8):
        assert score_query(s_new, t, 10) == score_query(s_old, t, 10)
    assert list(phrase_match(s_new, "head head")) == list(phrase_match(s_old, "head head"))


def test_reshard_refuses_tombstones(reshard_corpus, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import reshard_index

    root, res4, _ = reshard_corpus
    dst = str(tmp_path / "tombed")
    shutil.copytree(res4.out_dir, dst)
    n = delete_by_query(dst, pc.field("path") == "p0")
    assert n == 1
    with pytest.raises(ValueError, match="tombstone"):
        reshard_index(dst, str(tmp_path / "out"), new_partitions=2)


def test_pit_survives_delete_and_compaction_swap(idx_copy, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import open_pit

    live0 = SegmentStore(idx_copy)
    texts = _fixture_texts(live0, n=6)
    before = {t: score_query(live0, t, 10, round_decimals=6) for t in texts}

    pit = open_pit(idx_copy, str(tmp_path / "pit1"))
    n = delete_by_query(idx_copy, pc.field("lang") == "de")
    assert n > 0
    live = SegmentStore(idx_copy)

    diverged = False
    for t in texts:
        # the PIT view is frozen at open time...
        assert score_query(pit, t, 10, round_decimals=6) == before[t]
        # ...while the live view masks the deleted docs
        if score_query(live, t, 10, round_decimals=6) != before[t]:
            diverged = True
    assert diverged, "deleting a whole language should change some top-10"
    # tombstones written AFTER the open are invisible to the PIT
    assert pit.tombs is None and load_tombstones(idx_copy) is not None
    # a second PIT opened NOW freezes the post-delete state instead
    pit2 = open_pit(idx_copy, str(tmp_path / "pit2"))
    for t in texts:
        assert score_query(pit2, t, 10, round_decimals=6) == score_query(
            live, t, 10, round_decimals=6
        )


# ---------------------------------------------------------------------------
# ILM: phase planner + action application


def test_ilm_plan_phases_and_rollover():
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import ilm_plan

    policy = {
        "hot": {"rollover": {"max_docs": 1000, "max_age_s": 3600}},
        "warm": {"min_age_s": 86400, "actions": ["shrink", "forcemerge"]},
        "cold": {"min_age_s": 7 * 86400},
        "delete": {"min_age_s": 30 * 86400},
    }
    now = 1_000_000_000
    indices = [
        {"name": "i-fresh", "created_s": now - 100, "n_docs": 10},
        {"name": "i-bigdocs", "created_s": now - 100, "n_docs": 5000},
        {"name": "i-agedhot", "created_s": now - 7200, "n_docs": 10},
        {"name": "i-warm", "created_s": now - 2 * 86400, "n_docs": 10},
        {"name": "i-cold", "created_s": now - 8 * 86400, "n_docs": 10},
        {"name": "i-dead", "created_s": now - 40 * 86400, "n_docs": 10},
    ]
    plan = ilm_plan(indices, policy, now_s=now)
    rows = {r["index"]: r for r in plan.to_pylist()}
    assert rows["i-fresh"]["phase"] == "hot" and rows["i-fresh"]["actions"] == ""
    assert rows["i-bigdocs"]["actions"] == "rollover"  # max_docs crossed
    assert rows["i-agedhot"]["actions"] == "rollover"  # max_age crossed
    assert rows["i-warm"]["phase"] == "warm"
    assert rows["i-warm"]["actions"] == "shrink,forcemerge"
    assert rows["i-cold"]["phase"] == "cold" and rows["i-cold"]["actions"] == ""
    assert rows["i-dead"]["phase"] == "delete" and rows["i-dead"]["actions"] == "delete"
    # deterministic: same inputs, same table
    assert plan.equals(ilm_plan(indices, policy, now_s=now))
    with pytest.raises(ValueError):
        ilm_plan([{"name": "x", "created_s": now + 5, "n_docs": 0}], policy, now)


def test_ilm_apply_shrink_rollover_delete(reshard_corpus, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        ilm_apply,
        ilm_plan,
        resolve_alias,
        update_aliases,
    )

    root, res4, _ = reshard_corpus
    # private copies: apply mutates/deletes
    warm_dir = str(tmp_path / "warm_idx")
    dead_dir = str(tmp_path / "dead_idx")
    shutil.copytree(res4.out_dir, warm_dir)
    shutil.copytree(res4.out_dir, dead_dir)
    reg = str(tmp_path / "registry")
    update_aliases(reg, [("add", "warm-alias", warm_dir), ("add", "dead-alias", dead_dir)])

    now = 1_000_000_000
    policy = {
        "warm": {"min_age_s": 86400, "actions": ["shrink"]},
        "delete": {"min_age_s": 30 * 86400},
    }
    indices = [
        {"name": "warm_idx", "created_s": now - 2 * 86400, "n_docs": 90},
        {"name": "dead_idx", "created_s": now - 31 * 86400, "n_docs": 90},
    ]
    plan = ilm_plan(indices, policy, now_s=now)
    applied = ilm_apply(
        plan,
        {"warm_idx": warm_dir, "dead_idx": dead_dir},
        registry_dir=reg,
        alias_of={"warm_idx": "warm-alias", "dead_idx": "dead-alias"},
        shrink_to=2,
    )
    assert applied == {"warm_idx": ["shrink"], "dead_idx": ["delete"]}
    # shrink produced a 2-shard index, alias repointed, scores identical
    shrunk = resolve_alias(reg, "warm-alias")
    assert shrunk.endswith("_shrunk")
    assert len(os.listdir(os.path.join(shrunk, "segments"))) == 2
    s_old, s_new = SegmentStore(warm_dir), SegmentStore(shrunk)
    for t in _fixture_texts(s_old, n=5):
        assert score_query(s_new, t, 10) == score_query(s_old, t, 10)
    # delete removed the index and its alias
    assert not os.path.exists(dead_dir)
    with pytest.raises(KeyError):
        resolve_alias(reg, "dead-alias")
    # idempotent re-apply of the shrink (already-done check short-circuits)
    ilm_apply(plan.filter(__import__("pyarrow").compute.equal(plan["index"], "warm_idx")),
              {"warm_idx": warm_dir}, registry_dir=reg,
              alias_of={"warm_idx": "warm-alias"}, shrink_to=2)


def test_check_index_clean_and_tampered(idx_copy, tmp_path):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import check_index

    rep = check_index(idx_copy)
    assert rep["ok"], rep["issues"]
    assert rep["shards_checked"] > 0 and rep["dict_rows_checked"] > 0

    # live tombstones legitimately staleness the stats — reported, not failed
    delete_by_query(idx_copy, pc.field("lang") == "de")
    rep2 = check_index(idx_copy)
    assert rep2["ok"] and rep2["live_tombstones"] > 0

    # tamper: inflate one run's cf in a segment → flagged
    seg_dir = Path(idx_copy) / "segments"
    victim = sorted(p for p in seg_dir.glob("*.parquet") if pq.read_table(p).num_rows)[0]
    t = pq.read_table(victim)
    cf = t["cf"].to_pylist()
    cf[0] += 1
    t = t.set_column(t.schema.get_field_index("cf"), "cf",
                     pa.array(cf, type=pa.uint64()))
    pq.write_table(t, victim)
    rep3 = check_index(idx_copy)
    assert not rep3["ok"]
    assert any("cf != sum(tf)" in i for i in rep3["issues"])
    # the same tamper breaks the dict ↔ segment cross-check too
    assert any("term_dict/segment mismatch" in i for i in rep3["issues"])


def test_filtered_alias_gates_hits_not_scores(built, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        add_filtered_alias,
        alias_allowed_docs,
        resolve_alias,
        resolve_alias_full,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import score_query, score_query_filtered

    res, _, _ = built
    reg = str(tmp_path / "reg")
    add_filtered_alias(reg, "t-de", res.out_dir, field="lang", value="de")
    # plain resolution still works on a filtered entry
    assert resolve_alias(reg, "t-de") == res.out_dir
    idx, filt = resolve_alias_full(reg, "t-de")
    allowed = alias_allowed_docs(idx, filt)
    fwd = pq.read_table(os.path.join(res.out_dir, "forward_map"),
                        columns=["doc_id", "lang"])
    want_allowed = sorted(
        fwd.filter(pc.equal(fwd["lang"], "de"))["doc_id"].to_pylist()
    )
    assert allowed.tolist() == want_allowed

    store = SegmentStore(res.out_dir)
    allowed_set = set(want_allowed)
    for t in _fixture_texts(store, n=8):
        full = score_query(store, t, k=store.n_docs, round_decimals=6)
        got = score_query_filtered(store, t, 10, allowed, round_decimals=6)
        # exactly the full ranking restricted to the tenant's docs — scores
        # identical (filters are non-scoring in Lucene)
        want = [(d, s) for d, s in full if d in allowed_set][:10]
        assert got == want


def test_snapshot_repository_incremental(idx_copy, tmp_path):
    """Content-addressed repository: a second snapshot of an unchanged
    index stores ZERO new blobs; a tombstone-only change stores exactly
    one; deleting a snapshot keeps every blob other snapshots reference."""
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        snapshot_create,
        snapshot_delete,
        snapshot_restore,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    repo = str(tmp_path / "repo")
    s1 = snapshot_create(idx_copy, repo, "s1")
    assert s1["files"] > 0 and s1["new_files"] == s1["files"]

    # unchanged index → full reuse
    s2 = snapshot_create(idx_copy, repo, "s2")
    assert s2["new_files"] == 0 and s2["reused_files"] == s1["files"]

    with pytest.raises(ValueError, match="already exists"):
        snapshot_create(idx_copy, repo, "s1")

    # restore s1 into a work tree, delete some docs there (adds ONE file:
    # tombstones.parquet), snapshot again → exactly one new blob
    work = str(tmp_path / "work")
    assert snapshot_restore(repo, "s1", work) == s1["files"]
    n_del = delete_by_query(work, pc.field("lang") == "de")
    assert n_del > 0
    s3 = snapshot_create(work, repo, "s3")
    assert s3["files"] == s1["files"] + 1
    assert s3["new_files"] == 1 and s3["reused_files"] == s1["files"]

    # GC: dropping s1 keeps every blob s2/s3 still reference
    info = snapshot_delete(repo, "s1")
    assert info["deleted_blobs"] == 0  # all s1 blobs shared with s2
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_delete(repo, "s1")

    r2 = str(tmp_path / "r2")
    snapshot_restore(repo, "s2", r2)
    a, b = SegmentStore(idx_copy), SegmentStore(r2)
    for t in _fixture_texts(a, n=5):
        assert score_query(a, t, k=10) == score_query(b, t, k=10)

    # the tombstoned restore masks the deleted docs (state came back)
    r3 = str(tmp_path / "r3")
    snapshot_restore(repo, "s3", r3)
    assert load_tombstones(r3) is not None and len(load_tombstones(r3)) == n_del

    # dropping s3 GCs its now-unreferenced tombstone blob
    info3 = snapshot_delete(repo, "s3")
    assert info3["deleted_blobs"] == 1


def test_snapshot_blobs_survive_inplace_edits(idx_copy, tmp_path):
    """Restores are COPIES (no shared inodes with the blob store), and
    create's dedup re-verifies a pre-existing blob's hash, so an in-place
    edit through a hardlinked source tree cannot poison the repository."""
    import hashlib
    from pathlib import Path

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        snapshot_create,
        snapshot_restore,
    )

    repo = str(tmp_path / "repo")
    s1 = snapshot_create(idx_copy, repo, "s1")

    # restored files never share an inode with the blob store
    work = str(tmp_path / "work")
    snapshot_restore(repo, "s1", work)
    blob_root = Path(repo) / "blobs"
    blob_inodes = {p.stat().st_ino for p in blob_root.iterdir()}
    for p in Path(work).rglob("*"):
        if p.is_file():
            assert p.stat().st_ino not in blob_inodes, p

    # simulate a corrupted blob (rewrite via a fresh file so the source
    # index stays intact): the next create must heal it, not trust it
    victim = next(p for p in blob_root.iterdir() if not p.name.endswith(".tmp"))
    good = victim.read_bytes()
    victim.unlink()
    victim.write_bytes(b"\xff" * min(8, len(good)) + good[min(8, len(good)):])
    s2 = snapshot_create(idx_copy, repo, "s2")
    assert s2["new_files"] == 1  # exactly the healed blob
    healed = victim.read_bytes()
    assert hashlib.sha256(healed).hexdigest() == victim.name
    assert healed == good


def test_cat_indices_over_registry(idx_copy, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        cat_indices,
        index_stats,
        update_aliases,
    )

    reg = str(tmp_path / "reg")
    assert cat_indices(reg).num_rows == 0
    update_aliases(reg, [("add", "live", idx_copy), ("add", "latest", idx_copy)])
    bogus = tmp_path / "halfidx"
    bogus.mkdir()
    update_aliases(reg, [("add", "broken", str(bogus))])

    out = cat_indices(reg)
    rows = {r["index"]: r for r in out.to_pylist()}
    import os as _os

    good = rows[_os.path.abspath(idx_copy)]
    st = index_stats(idx_copy)
    assert good["aliases"] == "latest,live"
    assert good["docs_count"] == st["n_docs"]
    assert good["status"] == "green"
    assert good["store_bytes"] > 0
    bad = rows[_os.path.abspath(str(bogus))]
    assert bad["status"] == "red" and bad["docs_count"] == 0

    # delete-by-query shows up in deleted_docs
    n = delete_by_query(idx_copy, pc.field("lang") == "de")
    out2 = cat_indices(reg)
    good2 = {r["index"]: r for r in out2.to_pylist()}[_os.path.abspath(idx_copy)]
    assert good2["deleted_docs"] == n


def test_ccr_follow_incremental(ray_session, idx_copy, tmp_path):
    """CCR follow: initial sync copies everything, a no-change re-sync
    copies ZERO bytes, a leader mutation ships only the changed files, and
    the follower stays byte-identical throughout."""
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        ccr_follow,
        update_by_query,
    )

    follower = str(tmp_path / "follower")
    s1 = ccr_follow(idx_copy, follower)
    assert s1["copied"] == s1["files"] and s1["reused"] == 0
    assert _seg_hashes(follower) == _seg_hashes(idx_copy)

    s2 = ccr_follow(idx_copy, follower)
    assert s2["copied"] == 0 and s2["bytes_copied"] == 0
    assert s2["reused"] == s2["files"] == s1["files"]

    update_by_query(idx_copy, pc.field("lang") == "de", {"lang": "und"})
    s3 = ccr_follow(idx_copy, follower)
    assert 0 < s3["copied"] < s3["files"]  # only the touched files ship
    assert _seg_hashes(follower) == _seg_hashes(idx_copy)

    # follower-local corruption repairs on the next sync
    seg = sorted((Path(follower) / "segments").glob("*.parquet"))[0]
    seg.write_bytes(b"garbage")
    s4 = ccr_follow(idx_copy, follower)
    assert s4["copied"] >= 1
    assert _seg_hashes(follower) == _seg_hashes(idx_copy)

    with pytest.raises(ValueError):
        ccr_follow(idx_copy, idx_copy)


def test_mount_snapshot_searchable(ray_session, idx_copy, tmp_path, built):
    """Searchable snapshot: a mounted repo snapshot answers queries
    byte-identically to the live index, survives later live-index writes,
    and refuses corrupted blobs."""
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        mount_snapshot,
        snapshot_create,
        update_by_query,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    repo = str(tmp_path / "repo")
    snapshot_create(idx_copy, repo, "s1")
    store = mount_snapshot(repo, "s1", str(tmp_path / "mnt"))
    live = SegmentStore(idx_copy)
    _, oracle, _ = built
    term = sorted(oracle.postings)[0]
    assert score_query(store, term, 10, round_decimals=6) == score_query(
        live, term, 10, round_decimals=6
    )
    # live mutation after the mount does not disturb the mounted view
    before = score_query(store, term, 10, round_decimals=6)
    update_by_query(idx_copy, pc.field("lang") == "de", {"lang": "und"})
    assert score_query(store, term, 10, round_decimals=6) == before

    # corrupted blob refuses to mount
    blobs = sorted((Path(repo) / "blobs").iterdir())
    blobs[0].write_bytes(b"garbage")
    with pytest.raises(ValueError):
        mount_snapshot(repo, "s1", str(tmp_path / "mnt2"))
