"""Index lifecycle: delete-by-query tombstones + compaction (SURVEY §10).

The reference handles chain REORGS by deleting orphaned block heights from
Elasticsearch and re-deriving (SURVEY §0.1); ES/Lucene implement deletion
as SOFT-DELETES — a per-segment live-docs bitset consulted at query time —
with the actual space reclaimed later by segment merges.  The graft
mirrors both halves:

- ``delete_by_query(index_dir, expr)``: evaluate an Arrow expression over
  the streamed forward map (Ray Data filter — never the corpus), union the
  matching doc_ids into ``tombstones.parquet`` (atomic tmp→rename, like
  every other index artifact).  O(deleted) state, no segment rewrite.
- query time: ``SegmentStore`` masks tombstoned docs at posting decode —
  one choke point covers TAAT/boolean/phrase/structured paths.  Corpus
  stats (N, avgdl, df) stay STALE until compaction, exactly like Lucene
  soft-deletes; the WAND block-skip path requires a compacted index (its
  block-max metadata pre-dates the deletes), so the raw-row accessor
  refuses under live tombstones and the planner routes to TAAT.
- ``compact_index(index_dir, out_dir)``: Lucene's merge analog, per-shard
  parallel Ray tasks.  Each task decodes its shard's posting runs with ONE
  vectorized pass (concatenated varbyte streams + segmented delta reset —
  no per-row Python decode), drops tombstoned postings, and re-encodes
  through the build's own ``encode_shard`` (output is a pure function of
  the row set, so a compacted shard is byte-identical to one built from
  the filtered posting set).  The forward map rewrite streams through
  Ray Data (batch filter vs the broadcast tombstone set → partitioned
  parquet; exact stats from a column-pruned read of the output); the
  driver merges the per-shard dictionary runs with the build's
  ``write_merged_term_dict``.  Doc ids are STABLE across compaction (no
  renumbering) so downstream references never dangle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONES = pa.schema([("doc_id", pa.uint64())])


def load_tombstones(index_dir: str) -> np.ndarray | None:
    """Sorted unique tombstoned doc_ids, or None if the index has none."""
    path = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(path):
        return None
    return np.asarray(pq.read_table(path)["doc_id"].combine_chunks(), dtype=np.uint64)


def delete_by_query(index_dir: str, expr) -> int:
    """Soft-delete every doc whose forward-map row matches ``expr`` (an
    Arrow dataset expression, e.g. ``pc.field("lang") == "de"``); returns
    the TOTAL tombstone count after the union.

    The predicate pushes down into the parquet scan (row-group pruning +
    row filtering server-side), so only matching doc_ids reach the driver
    — bounded by the delete size, not the corpus.
    """
    from ..state.manifest import atomic_write_parquet

    t = pq.read_table(
        os.path.join(index_dir, "forward_map"), columns=["doc_id"], filters=expr
    )
    new = np.asarray(t["doc_id"].combine_chunks(), dtype=np.uint64)
    old = load_tombstones(index_dir)
    merged = np.unique(np.concatenate([old, new])) if old is not None else np.unique(new)
    atomic_write_parquet(
        pa.table({"doc_id": pa.array(merged, type=pa.uint64())}, schema=TOMBSTONES),
        os.path.join(index_dir, "tombstones.parquet"),
    )
    return int(len(merged))


def index_stats(index_dir: str) -> dict:
    """ES ``_stats``/``_segments`` analog: corpus stats + per-artifact
    sizes and segment counts, read from the stats artifact and the
    filesystem (no data scan)."""

    def _dir_bytes(sub: str) -> tuple[int, int]:
        d = os.path.join(index_dir, sub)
        if not os.path.isdir(d):
            return 0, 0
        names = [n for n in os.listdir(d) if n.endswith(".parquet")]
        return len(names), sum(os.path.getsize(os.path.join(d, n)) for n in names)

    st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
    n_seg, seg_bytes = _dir_bytes("segments")
    n_post, post_bytes = _dir_bytes("postings")
    n_fwd, fwd_bytes = _dir_bytes("forward_map")
    tombs = load_tombstones(index_dir)
    return {
        "n_docs": int(st["n_docs"][0].as_py()),
        "n_terms": int(st["n_terms"][0].as_py()),
        "avgdl": float(st["avgdl"][0].as_py()),
        "n_segments": n_seg,
        "segment_bytes": seg_bytes,
        "n_posting_parts": n_post,
        "posting_bytes": post_bytes,
        "n_forward_parts": n_fwd,
        "forward_bytes": fwd_bytes,
        "n_tombstones": 0 if tombs is None else int(len(tombs)),
        "term_dict_bytes": (
            os.path.getsize(os.path.join(index_dir, "term_dict.parquet"))
            if os.path.exists(os.path.join(index_dir, "term_dict.parquet"))
            else 0
        ),
    }


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """ES snapshot analog: copy the index's parquet artifacts plus a
    checksum manifest (``SNAPSHOT.json``) so a later restore can verify
    integrity byte-for-byte.  Uses hardlinks when the filesystem allows
    (snapshots of a 10^12-doc index must not duplicate segment bytes;
    parquet artifacts are immutable-after-rename, so links are safe).
    Hashing parallelizes as Ray tasks when a session is live (a 100-TB
    index hashes at cluster speed, not driver speed) and falls back to
    in-process hashing otherwise.  Returns {"files": n, "bytes": total}.
    """
    import json
    import shutil

    src_root = os.path.abspath(index_dir)
    files = _index_files(src_root)
    digests = _hash_files(files)

    entries = {}
    total = 0
    for src, digest in zip(files, digests):
        rel = os.path.relpath(src, src_root)
        dst = os.path.join(snap_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
        entries[rel] = {"sha256": digest, "bytes": os.path.getsize(src)}
        total += entries[rel]["bytes"]
    manifest = os.path.join(snap_dir, "SNAPSHOT.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": entries}, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest)
    return {"files": len(entries), "bytes": total}


def restore_index(snap_dir: str, dest_dir: str) -> int:
    """Restore a snapshot into ``dest_dir``, verifying every file against
    the snapshot's checksum manifest (corruption fails loudly BEFORE any
    file lands in the destination).  Returns the file count.
    """
    import hashlib
    import json
    import shutil

    with open(os.path.join(snap_dir, "SNAPSHOT.json")) as f:
        entries = json.load(f)["files"]
    for rel, meta in sorted(entries.items()):
        src = os.path.join(snap_dir, rel)
        h = hashlib.sha256()
        with open(src, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != meta["sha256"]:
            raise ValueError(f"snapshot corruption: {rel} checksum mismatch")
    for rel in sorted(entries):
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
    return len(entries)


def _sha256_file(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _hash_files(files: list[str]) -> list[str]:
    """sha256 of each file — Ray tasks when a session is live (cluster-speed
    hashing), in-process otherwise; bounded in-flight submission."""

    _sha = _sha256_file

    try:
        import ray

        live = ray.is_initialized()
    except Exception:  # pragma: no cover
        live = False
    if not live or len(files) <= 1:
        return [_sha(p) for p in files]
    sha_task = ray.remote(num_cpus=1)(_sha)
    digests: list[str] = []
    window = 64
    refs: list = []
    for p in files:
        refs.append(sha_task.remote(p))
        if len(refs) >= window:
            digests.extend(ray.get(refs[: window // 2]))
            refs = refs[window // 2 :]
    digests.extend(ray.get(refs))
    return digests


def _index_files(root: str) -> list[str]:
    out: list[str] = []
    for dirpath, _, names in os.walk(root):
        for name in sorted(names):
            if name.endswith((".parquet", ".jsonl", ".json")):
                out.append(os.path.join(dirpath, name))
    return out


def snapshot_create(index_dir: str, repo_dir: str, name: str) -> dict:
    """ES INCREMENTAL snapshot into a repository: content-addressed blob
    store (``blobs/<sha256>``) + a per-snapshot manifest
    (``snapshots/<name>.json``).  A file whose hash already sits in the
    repo is NOT copied again — exactly ES's segment-level incrementality
    (an unchanged segment costs zero bytes in every later snapshot).
    Blobs land via hardlink when the filesystem allows, manifests commit
    atomically (tmp→rename).  Returns
    {"files", "bytes", "new_files", "new_bytes", "reused_files"}."""
    import json
    import shutil

    src_root = os.path.abspath(index_dir)
    blob_root = os.path.join(repo_dir, "blobs")
    manifest_path = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if os.path.exists(manifest_path):
        raise ValueError(f"snapshot {name!r} already exists in the repository")
    os.makedirs(blob_root, exist_ok=True)
    os.makedirs(os.path.dirname(manifest_path), exist_ok=True)

    files = _index_files(src_root)
    digests = _hash_files(files)
    entries: dict[str, dict] = {}
    total = new_files = new_bytes = 0
    for src, digest in zip(files, digests):
        rel = os.path.relpath(src, src_root)
        size = os.path.getsize(src)
        entries[rel] = {"sha256": digest, "bytes": size}
        total += size
        blob = os.path.join(blob_root, digest)
        # dedup trusts a pre-existing blob only after re-verifying its
        # content hash: blobs are hardlinked from source trees when the
        # filesystem allows, so an in-place edit to a linked source would
        # otherwise corrupt every snapshot referencing the blob forever
        if os.path.exists(blob) and _sha256_file(blob) != digest:
            os.remove(blob)
        if not os.path.exists(blob):
            tmp = blob + ".tmp"
            try:
                os.link(src, tmp)
            except OSError:
                shutil.copy2(src, tmp)
            os.replace(tmp, blob)
            new_files += 1
            new_bytes += size
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"index": os.path.basename(src_root), "files": entries}, f,
                  indent=1, sort_keys=True)
    os.replace(tmp, manifest_path)
    return {
        "files": len(entries),
        "bytes": total,
        "new_files": new_files,
        "new_bytes": new_bytes,
        "reused_files": len(entries) - new_files,
    }


def snapshot_restore(repo_dir: str, name: str, dest_dir: str) -> int:
    """Restore one repository snapshot into ``dest_dir``, verifying every
    blob against its manifest hash BEFORE any file lands (corruption fails
    loudly).  Returns the file count."""
    import hashlib
    import json
    import shutil

    with open(os.path.join(repo_dir, "snapshots", f"{name}.json")) as f:
        entries = json.load(f)["files"]
    blob_root = os.path.join(repo_dir, "blobs")
    for rel, meta in sorted(entries.items()):
        blob = os.path.join(blob_root, meta["sha256"])
        h = hashlib.sha256()
        with open(blob, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != meta["sha256"]:
            raise ValueError(f"snapshot corruption: {rel} checksum mismatch")
    for rel, meta in sorted(entries.items()):
        blob = os.path.join(blob_root, meta["sha256"])
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        # COPY, never hardlink: restores land in arbitrary user
        # directories where in-place edits are legitimate — a linked
        # restore would share inodes with the blob store and let such an
        # edit silently corrupt every snapshot referencing the blob
        shutil.copy2(blob, dst)
    return len(entries)


def snapshot_delete(repo_dir: str, name: str) -> dict:
    """Delete one snapshot from the repository and garbage-collect blobs no
    other snapshot references — ES's incremental-deletion semantics (a
    shared segment survives until its LAST referencing snapshot goes).
    Returns {"deleted_blobs": n, "kept_blobs": m}."""
    import json

    manifest_path = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if not os.path.exists(manifest_path):
        raise ValueError(f"unknown snapshot {name!r}")
    os.remove(manifest_path)
    snap_root = os.path.join(repo_dir, "snapshots")
    referenced: set[str] = set()
    for other in os.listdir(snap_root):
        if other.endswith(".json"):
            with open(os.path.join(snap_root, other)) as f:
                referenced |= {
                    m["sha256"] for m in json.load(f)["files"].values()
                }
    blob_root = os.path.join(repo_dir, "blobs")
    deleted = 0
    for blob in os.listdir(blob_root):
        if blob.endswith(".tmp") or blob in referenced:
            continue
        os.remove(os.path.join(blob_root, blob))
        deleted += 1
    return {"deleted_blobs": deleted, "kept_blobs": len(referenced)}


def update_by_query(index_dir: str, expr, set_cols: dict[str, object]) -> int:
    """ES ``update_by_query`` for forward-map METADATA fields (repo / path /
    commit / lang): set every column in ``set_cols`` on rows matching
    ``expr``.  The indexed text is untouched — postings, df and scores are
    unaffected — which is ES's fast path for partial updates to non-indexed
    fields; content-changing updates are a delete + incremental re-build
    instead.  ``doc_id``/``dl``/``sha256`` are identity columns and refuse
    to be set.

    The rewrite STREAMS (Ray Data batch map — the predicate evaluates as an
    Arrow projection, the update as vectorized ``if_else`` — → partitioned
    parquet in a sibling dir, then a directory swap).  Returns the matched
    row count (computed by a pushdown scan, bounded by the match size).

    Crash safety: both swap states are COMPLETE directories — a crash
    between the two renames leaves ``forward_map.old`` (the untouched
    original) and ``forward_map.updating`` (the finished rewrite) on disk;
    recovery is renaming either back into place, never a rebuild.
    """
    import shutil

    import pyarrow.dataset as pads
    import ray.data as rd

    immutable = {"doc_id", "dl", "sha256"} & set(set_cols)
    if immutable:
        raise ValueError(f"refusing to update identity columns: {sorted(immutable)}")

    fwd = os.path.join(index_dir, "forward_map")
    matched = pq.read_table(fwd, columns=["doc_id"], filters=expr).num_rows

    import pyarrow.compute as pc  # noqa: F401  (expr built from pc.field)

    def _apply(batch: pa.Table) -> pa.Table:
        m = pads.dataset(batch).to_table(columns={"m": expr})["m"].combine_chunks()
        cols = {}
        for name in batch.column_names:
            col = batch[name].combine_chunks()
            if name in set_cols:
                col = pa.compute.if_else(
                    m, pa.scalar(set_cols[name], type=col.type), col
                )
            cols[name] = col
        return pa.table(cols)

    new = fwd + ".updating"
    rd.read_parquet(fwd).map_batches(_apply, batch_format="pyarrow").write_parquet(
        new, mode="overwrite"
    )
    bak = fwd + ".old"
    os.rename(fwd, bak)
    os.rename(new, fwd)
    shutil.rmtree(bak)
    return int(matched)


# ---------------------------------------------------------------------------
# compaction


def _concat_binary_bytes(col: pa.ChunkedArray | pa.Array) -> tuple[bytes, np.ndarray]:
    """(concatenated bytes, per-element byte lengths) of a pa.binary col."""
    from ..stages.segment import _binary_np

    vals, off = _binary_np(col if isinstance(col, pa.Array) else col.combine_chunks())
    return vals.tobytes(), np.diff(off)


def _decode_shard_flat(shard: pa.Table) -> dict[str, np.ndarray | pa.Array]:
    """Decode ALL posting runs of a shard in one vectorized pass.

    Doc ids use the same stream shape as positions (first value of each
    run absolute, then deltas), so the segmented-cumsum decoder applies
    with per-run value counts = df.
    """
    from ..functions.codecs import segmented_positions_decode, varbyte_decode

    df = np.asarray(shard["df"].combine_chunks(), dtype=np.int64)
    doc_bytes, _ = _concat_binary_bytes(shard["doc_ids"])
    tf_bytes, _ = _concat_binary_bytes(shard["tfs"])
    dl_bytes, _ = _concat_binary_bytes(shard["dls"])
    docs = segmented_positions_decode(doc_bytes, df).astype(np.uint64)
    tfs = varbyte_decode(tf_bytes).astype(np.uint32)
    dls = varbyte_decode(dl_bytes).astype(np.uint32)
    row_of = np.repeat(np.arange(len(df)), df)
    out: dict[str, np.ndarray | pa.Array] = {
        "docs": docs,
        "tfs": tfs,
        "dls": dls,
        "row_of": row_of,
    }
    if "positions" in shard.column_names:
        pos_bytes, _ = _concat_binary_bytes(shard["positions"])
        buf = np.frombuffer(pos_bytes, dtype=np.uint8)
        # varbyte value boundaries: a byte with the high bit CLEAR ends a
        # value; posting k owns tf[k] consecutive values → contiguous byte
        # span, sliceable zero-copy via a binary offsets vector
        val_ends = np.flatnonzero((buf & 0x80) == 0) + 1
        cum_tf = np.cumsum(tfs.astype(np.int64))
        post_ends = val_ends[cum_tf - 1] if len(cum_tf) else np.zeros(0, np.int64)
        offsets = np.concatenate(([0], post_ends)).astype(np.int32)
        out["positions"] = pa.Array.from_buffers(
            pa.binary(),
            len(tfs),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
        )
    return out


def _compact_shard(shard_path: str, out_path: str, tombs: np.ndarray, sid: int) -> str | None:
    """Decode → drop tombstoned postings → re-encode one shard; write the
    segment + its sorted dictionary run atomically.  Returns the dict-run
    path (None if the shard emptied)."""
    from ..schemas import POSTINGS_RAW  # noqa: F401  (shape documented there)
    from ..stages.segment import TERM_DICT_ROW_GROUP, encode_shard
    from ..state.manifest import atomic_write_parquet

    shard = pq.read_table(shard_path)
    flat = _decode_shard_flat(shard)
    keep = ~np.isin(flat["docs"], tombs)
    if not keep.any():
        return None
    row_of = flat["row_of"][keep]
    cols = {
        "term": shard["term"].combine_chunks().take(pa.array(row_of)),
        "doc_id": pa.array(flat["docs"][keep], type=pa.uint64()),
        "tf": pa.array(flat["tfs"][keep], type=pa.uint32()),
        "dl": pa.array(flat["dls"][keep], type=pa.uint32()),
        "salt": shard["salt"].combine_chunks().take(pa.array(row_of)),
        "shard": pa.array(np.full(int(keep.sum()), sid, dtype=np.uint32), type=pa.uint32()),
    }
    if "positions" in flat:
        cols["positions"] = flat["positions"].filter(pa.array(keep))
    seg, dict_rows, _ = encode_shard(pa.table(cols))
    atomic_write_parquet(seg, out_path)
    run_path = out_path.replace("segments/", "term_dict_parts/")
    atomic_write_parquet(dict_rows, run_path, row_group_size=TERM_DICT_ROW_GROUP)
    return run_path


@dataclass
class CompactResult:
    out_dir: str
    n_docs: int
    n_deleted: int
    n_terms: int
    skipped_shards: int = 0


def compact_index(index_dir: str, out_dir: str, concurrency: int = 8) -> CompactResult:
    """Merge-away the tombstones into a fresh index directory (the source
    index is untouched — Lucene merges write new segment files too).

    Shards compact as parallel Ray tasks and the forward map rewrite
    streams through Ray Data (nothing corpus-sized lands on the driver);
    driver work is the dictionary-run merge (bounded memory, same code as
    the build's finalize) + the shard task bookkeeping.

    RESUMABLE: shard outputs are atomic (tmp→rename), so an interrupted
    compaction re-run skips every shard whose segment AND dictionary run
    already exist — same checkpoint-is-the-output discipline as the build.
    (A shard that compacted to empty leaves no file and is re-derived —
    idempotent and cheap.)
    """
    import ray

    from ..schemas import STATS
    from ..state.manifest import atomic_write_parquet
    from ..state.termdict import write_merged_term_dict
    from ..stages.segment import TERM_DICT_ROW_GROUP

    tombs = load_tombstones(index_dir)
    if tombs is None:
        tombs = np.empty(0, dtype=np.uint64)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "term_dict_parts"), exist_ok=True)

    shard_files = sorted(os.listdir(os.path.join(index_dir, "segments")))
    tombs_ref = ray.put(tombs)  # broadcast once, read per task

    @ray.remote(num_cpus=1)
    def _task(name: str) -> str | None:
        sid = int(name.split("-")[1].split(".")[0])
        return _compact_shard(
            os.path.join(index_dir, "segments", name),
            os.path.join(out_dir, "segments", name),
            ray.get(tombs_ref),
            sid,
        )

    # bounded in-flight submission (a 10^12-doc index has many shards);
    # resume: skip shards whose outputs are already committed
    pending, run_paths = [], []
    skipped = 0
    for name in shard_files:
        seg_out = os.path.join(out_dir, "segments", name)
        run_out = os.path.join(out_dir, "term_dict_parts", name)
        if os.path.exists(seg_out) and os.path.exists(run_out):
            run_paths.append(run_out)
            skipped += 1
            continue
        pending.append(_task.remote(name))
        if len(pending) >= concurrency * 2:
            done, pending = ray.wait(pending, num_returns=1)
            run_paths.extend(ray.get(done))
    run_paths.extend(ray.get(pending))
    run_paths = [p for p in run_paths if p]

    n_terms = write_merged_term_dict(
        run_paths,
        os.path.join(out_dir, "term_dict.parquet"),
        row_group_size=TERM_DICT_ROW_GROUP,
    )

    # forward map rewrite STREAMS (a 10^12-doc map never fits the driver):
    # filter against the broadcast tombstone set per batch, write partitioned
    # parquet, then exact stats from a column-pruned read of the output.
    import ray.data as rd

    def _drop_dead(batch: pa.Table) -> pa.Table:
        t = ray.get(tombs_ref)  # zero-copy from the local object store
        if len(t) == 0:
            return batch
        keep = ~np.isin(
            np.asarray(batch["doc_id"].combine_chunks(), dtype=np.uint64), t
        )
        return batch.filter(pa.array(keep))

    fwd_out = os.path.join(out_dir, "forward_map")
    rd.read_parquet(os.path.join(index_dir, "forward_map")).map_batches(
        _drop_dead, batch_format="pyarrow"
    ).write_parquet(fwd_out, mode="overwrite")
    if not (os.path.isdir(fwd_out) and os.listdir(fwd_out)):
        # every doc deleted — keep the artifact readable with an empty part
        src = pq.ParquetDataset(os.path.join(index_dir, "forward_map")).schema
        atomic_write_parquet(
            pa.table(
                {c: pa.array([], type=src.field(c).type) for c in src.names}
            ),
            os.path.join(fwd_out, "part-00000.parquet"),
        )

    stat = rd.read_parquet(fwd_out, columns=["dl"])
    n_docs = int(stat.count())
    total_dl = int(stat.sum("dl")) if n_docs else 0
    atomic_write_parquet(
        pa.table(
            {
                "n_docs": pa.array([n_docs], type=pa.uint64()),
                "total_dl": pa.array([total_dl], type=pa.uint64()),
                "avgdl": pa.array(
                    [total_dl / n_docs if n_docs else 0.0], type=pa.float64()
                ),
                "n_terms": pa.array([n_terms], type=pa.uint64()),
            },
            schema=STATS,
        ),
        os.path.join(out_dir, "stats.parquet"),
    )
    return CompactResult(
        out_dir=out_dir,
        n_docs=n_docs,
        n_deleted=int(len(tombs)),
        n_terms=int(n_terms),
        skipped_shards=skipped,
    )


def open_pit(index_dir: str, pit_dir: str):
    """ES point-in-time (``_pit``) open: a frozen reader over the index's
    CURRENT state that later writes (delete_by_query, update_by_query,
    compaction output swaps) can never disturb.

    Lucene gets this for free from immutable segment files + a pinned
    commit point; the graft's artifacts are likewise immutable-after-rename
    (every writer goes through atomic tmp→rename or ``os.replace``), so a
    PIT is just a HARDLINKED snapshot — no segment bytes are copied, and a
    subsequent ``os.replace`` of e.g. ``tombstones.parquet`` on the live
    index creates a new inode while the PIT's link keeps the old content.
    Returns a ``SegmentStore`` over the frozen view; the ``pit_dir`` path
    is the PIT id (closing = deleting the directory)."""
    from .query import SegmentStore

    snapshot_index(index_dir, pit_dir)
    return SegmentStore(pit_dir)


@dataclass
class ReshardResult:
    out_dir: str
    old_partitions: int
    new_partitions: int
    n_terms: int
    n_postings: int


def reshard_index(index_dir: str, out_dir: str, new_partitions: int) -> ReshardResult:
    """ES ``_split`` / ``_shrink`` analog: change the shard count of a
    built index WITHOUT re-reading or re-tokenizing the corpus — at
    10^12 files the tokenize pass is the expensive one, and growing a
    cluster must not require repeating it.

    Why this is byte-identical to a fresh build at the new P: salt
    assignment is partition-count-INDEPENDENT (head_salts derives from
    the df sketch and ``max_slice_postings``, never from P — see
    ``shard_and_salt``), so the (term, salt, doc_id, tf, dl[, positions])
    row set is the same at any P; only the placement function
    ``(h(term) + salt·G) mod P`` changes.  ``encode_shard`` is a pure
    function of its row set, so regrouping + re-encoding reproduces a
    fresh build's segments byte-for-byte (asserted in tests).

    Plan, Ray-Data end to end: one decode task per SOURCE shard
    (vectorized segmented-cumsum decode, same kernel as compaction)
    emits POSTINGS_RAW rows carrying the NEW shard id, then the build's
    own phase-B reducer (``groupby("shard").map_groups(builder)``)
    encodes and atomically commits each destination shard + its sorted
    dictionary run.  The forward map and stats are doc-level artifacts
    — untouched by resharding — and hardlink over like a snapshot.

    Refuses under live tombstones (compact first): ES likewise requires
    a read-only, fully-merged index for ``_split``/``_shrink``.
    """
    import shutil

    import ray.data as rd

    from ..functions.hashing import shard_of_terms
    from ..stages.segment import TERM_DICT_ROW_GROUP, make_segment_builder
    from ..state.manifest import Manifest, atomic_write_parquet
    from ..state.termdict import write_merged_term_dict

    if new_partitions < 1:
        raise ValueError("new_partitions must be >= 1")
    if load_tombstones(index_dir) is not None:
        raise ValueError(
            "reshard requires a tombstone-free index — run compact_index first"
        )
    seg_dir = os.path.join(index_dir, "segments")
    shard_files = sorted(os.listdir(seg_dir))
    old_partitions = len(shard_files)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "term_dict_parts"), exist_ok=True)

    def decode_to_postings(batch: pa.Table) -> pa.Table:
        outs = []
        for name in batch["name"].to_pylist():
            shard = pq.read_table(os.path.join(seg_dir, name))
            flat = _decode_shard_flat(shard)
            row_of = flat["row_of"]
            terms = shard["term"].combine_chunks().take(pa.array(row_of))
            salts = np.asarray(shard["salt"].combine_chunks(), dtype=np.uint64)[row_of]
            cols = {
                "term": terms,
                "doc_id": pa.array(flat["docs"], type=pa.uint64()),
                "tf": pa.array(flat["tfs"], type=pa.uint32()),
                "dl": pa.array(flat["dls"], type=pa.uint32()),
                "salt": pa.array(salts.astype(np.uint16), type=pa.uint16()),
                "shard": pa.array(
                    shard_of_terms(terms, salts, new_partitions), type=pa.uint32()
                ),
            }
            if "positions" in flat:
                cols["positions"] = flat["positions"]
            outs.append(pa.table(cols))
        return pa.concat_tables(outs) if outs else pa.table({})

    builder = make_segment_builder(out_dir)
    (
        rd.from_items(
            [{"name": n} for n in shard_files],
            override_num_blocks=max(1, len(shard_files)),
        )
        .map_batches(decode_to_postings, batch_format="pyarrow", num_cpus=1)
        .groupby("shard")
        .map_groups(builder, batch_format="pyarrow")
        .materialize()
    )

    run_paths = [
        os.path.join(out_dir, "term_dict_parts", n)
        for n in sorted(os.listdir(os.path.join(out_dir, "term_dict_parts")))
    ]
    n_terms = write_merged_term_dict(
        run_paths,
        os.path.join(out_dir, "term_dict.parquet"),
        row_group_size=TERM_DICT_ROW_GROUP,
    )

    # doc-level artifacts are reshard-invariant: hardlink, don't copy bytes
    fwd_src = os.path.join(index_dir, "forward_map")
    fwd_dst = os.path.join(out_dir, "forward_map")
    os.makedirs(fwd_dst, exist_ok=True)
    for name in sorted(os.listdir(fwd_src)):
        dst = os.path.join(fwd_dst, name)
        if not os.path.exists(dst):
            try:
                os.link(os.path.join(fwd_src, name), dst)
            except OSError:
                shutil.copy2(os.path.join(fwd_src, name), dst)
    st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
    atomic_write_parquet(
        st.set_column(
            st.schema.get_field_index("n_terms"),
            "n_terms",
            pa.array([n_terms], type=pa.uint64()),
        ),
        os.path.join(out_dir, "stats.parquet"),
    )

    out_manifest = Manifest(out_dir)
    n_postings = sum(
        e.get("n_postings", 0) for e in out_manifest.completed("segment").values()
    )
    src_final = Manifest(index_dir).completed("final").get("index", {})
    out_manifest.write_entry(
        "final",
        "index",
        {
            "status": "done",
            "resharded_from": index_dir,
            "old_partitions": old_partitions,
            "new_partitions": new_partitions,
            "n_terms": int(n_terms),
            "n_postings": int(n_postings),
            # placement is computable from (term, salt, P) alone, so the
            # source's head-salt map stays valid under the new P
            "head_salts": src_final.get("head_salts", {}),
        },
    )
    return ReshardResult(
        out_dir=out_dir,
        old_partitions=old_partitions,
        new_partitions=new_partitions,
        n_terms=int(n_terms),
        n_postings=int(n_postings),
    )


def _check_shard(index_dir: str, name: str, n_docs: int) -> dict:
    """Verify one segment shard's internal invariants (CheckIndex body)."""
    sid = int(name.split("-")[1].split(".")[0])
    issues: list[str] = []
    shard = pq.read_table(os.path.join(index_dir, "segments", name))
    flat = _decode_shard_flat(shard)
    df = np.asarray(shard["df"].combine_chunks(), dtype=np.int64)
    cf = np.asarray(shard["cf"].combine_chunks(), dtype=np.int64)
    max_tf = np.asarray(shard["max_tf"].combine_chunks(), dtype=np.int64)
    docs, tfs = flat["docs"].astype(np.int64), flat["tfs"].astype(np.int64)
    ends = np.cumsum(df)
    starts = np.concatenate(([0], ends[:-1]))
    # doc ids strictly increasing within a run; in [0, n_docs); cf == Σtf;
    # max_tf is the run's true max
    run_of = np.repeat(np.arange(len(df)), df)
    if len(docs):
        inner = np.ones(len(docs), dtype=bool)
        inner[starts[df > 0]] = False  # run firsts exempt from the diff check
        bad = inner & (np.diff(docs, prepend=docs[0] if len(docs) else 0) <= 0)
        if bad.any():
            issues.append(f"shard {sid}: non-increasing doc_ids in {int(bad.sum())} postings")
        if docs.min() < 0 or docs.max() >= n_docs:
            issues.append(f"shard {sid}: doc_id out of range [0, {n_docs})")
    cf_got = np.zeros(len(df), dtype=np.int64)
    np.add.at(cf_got, run_of, tfs)
    if not np.array_equal(cf_got, cf):
        issues.append(f"shard {sid}: cf != sum(tf) for {int((cf_got != cf).sum())} runs")
    mt_got = np.zeros(len(df), dtype=np.int64)
    np.maximum.at(mt_got, run_of, tfs)
    if not np.array_equal(mt_got, max_tf):
        issues.append(f"shard {sid}: max_tf mismatch in {int((mt_got != max_tf).sum())} runs")
    # block metadata: last block's last_doc == the run's final doc
    bm = shard["block_meta"].to_pylist()
    for i in range(len(df)):
        if df[i] and bm[i]:
            if int(bm[i][-1]["last_doc"]) != int(docs[ends[i] - 1]):
                issues.append(f"shard {sid}: block_meta last_doc mismatch at row {i}")
                break
    # (term, salt) sorted — the encode order every reader relies on
    keys = list(zip(shard["term"].to_pylist(), shard["salt"].to_pylist()))
    if keys != sorted(keys):
        issues.append(f"shard {sid}: rows not (term, salt)-sorted")
    return {"shard": sid, "n_lists": shard.num_rows, "issues": issues}


def check_index(index_dir: str) -> dict:
    """Lucene ``CheckIndex`` analog: verify every integrity invariant the
    query paths rely on, without trusting any of them —

    - per shard (parallel Ray tasks): doc ids strictly increasing per run
      and within [0, N); cf == Σtf and max_tf == max(tf) per run;
      block-max metadata closes each run; rows (term, salt)-sorted;
    - dictionary ↔ segments: every term_dict row points at a real
      (partition, row) whose df/cf match, and the dictionary is globally
      (term, salt)-sorted;
    - stats ↔ forward map: n_docs/total_dl/avgdl recomputed from a
      column-pruned scan must equal stats.parquet (unless tombstones are
      live, which legitimately staleness them — reported, not failed).

    Returns {"ok", "shards_checked", "dict_rows_checked", "issues": [...]}
    — report, don't raise, so operators can triage (ES `_shard_stores`
    style).  Cost: one decode pass per shard, dictionary-merge-sized
    driver work; no corpus access.
    """
    import ray

    st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
    n_docs = int(st["n_docs"][0].as_py())
    total_dl = int(st["total_dl"][0].as_py())
    shard_files = sorted(os.listdir(os.path.join(index_dir, "segments")))

    task = ray.remote(num_cpus=1)(_check_shard)
    reports = ray.get([task.remote(index_dir, n, n_docs) for n in shard_files])
    issues: list[str] = [i for r in reports for i in r["issues"]]

    # dictionary ↔ segment cross-check (dictionary is vocab-sized)
    td = pq.read_table(os.path.join(index_dir, "term_dict.parquet"))
    keys = list(zip(td["term"].to_pylist(), td["salt"].to_pylist()))
    if keys != sorted(keys):
        issues.append("term_dict not globally (term, salt)-sorted")
    seg_cache: dict[int, pa.Table] = {}
    for term, salt, part, row, ddf, dcf in zip(
        td["term"].to_pylist(), td["salt"].to_pylist(), td["partition"].to_pylist(),
        td["row"].to_pylist(), td["df"].to_pylist(), td["cf"].to_pylist(),
    ):
        if part not in seg_cache:
            p = os.path.join(index_dir, "segments", f"shard-{part:05d}.parquet")
            if not os.path.exists(p):
                issues.append(f"term_dict points at missing shard {part}")
                seg_cache[part] = pa.table({})
                continue
            seg_cache[part] = pq.read_table(
                p, columns=["term", "salt", "df", "cf"]
            )
        seg = seg_cache[part]
        if seg.num_rows == 0:
            continue
        if row >= seg.num_rows:
            issues.append(f"term_dict row {row} out of range for shard {part}")
            continue
        if (
            seg["term"][row].as_py() != term
            or seg["salt"][row].as_py() != salt
            or seg["df"][row].as_py() != ddf
            or seg["cf"][row].as_py() != dcf
        ):
            issues.append(f"term_dict/segment mismatch at ({term!r}, salt {salt})")

    # stats ↔ forward map
    fwd = pq.ParquetDataset(os.path.join(index_dir, "forward_map")).read(
        columns=["dl"]
    )
    got_docs, got_dl = fwd.num_rows, int(pa.compute.sum(fwd["dl"]).as_py() or 0)
    tombs = load_tombstones(index_dir)
    if tombs is None and (got_docs != n_docs or got_dl != total_dl):
        issues.append(
            f"stats mismatch: stats say ({n_docs}, {total_dl}), "
            f"forward map has ({got_docs}, {got_dl})"
        )
    return {
        "ok": not issues,
        "shards_checked": len(shard_files),
        "dict_rows_checked": td.num_rows,
        "live_tombstones": 0 if tombs is None else int(len(tombs)),
        "issues": issues,
    }


# ---------------------------------------------------------------------------
# ILM (ES index lifecycle management): phase planner + action application

ILM_PHASES = ("hot", "warm", "cold", "delete")


def ilm_plan(indices: list[dict], policy: dict, now_s: int) -> pa.Table:
    """ES ``_ilm/explain`` analog: given per-index metadata
    ``{"name", "created_s", "n_docs"}`` and a policy

        {"hot":    {"rollover": {"max_docs": N, "max_age_s": A}},
         "warm":   {"min_age_s": ..., "actions": ["shrink", "forcemerge"]},
         "cold":   {"min_age_s": ...},
         "delete": {"min_age_s": ...}}

    return each index's current phase (the DEEPEST phase whose ``min_age_s``
    has passed — ES's phase-entry rule) and the actions now due.  ``now_s``
    is an explicit argument, never wall-clock, so plans are deterministic
    and testable; applying the plan is ``ilm_apply``'s job.

    Scale note: this is coordinator work over index METADATA (one row per
    index), exactly where ES runs its ILM loop — no data is touched until
    an action executes.
    """
    names, ages, phases, actions_out = [], [], [], []
    for meta in sorted(indices, key=lambda m: m["name"]):
        age = int(now_s) - int(meta["created_s"])
        if age < 0:
            raise ValueError(f"index {meta['name']!r} created in the future")
        phase = "hot"
        for p in ILM_PHASES[1:]:
            if p in policy and age >= int(policy[p]["min_age_s"]):
                phase = p
        due: list[str] = []
        if phase == "hot":
            ro = policy.get("hot", {}).get("rollover", {})
            if ("max_docs" in ro and meta["n_docs"] >= ro["max_docs"]) or (
                "max_age_s" in ro and age >= ro["max_age_s"]
            ):
                due.append("rollover")
        elif phase == "delete":
            due.append("delete")
        else:
            due.extend(policy.get(phase, {}).get("actions", []))
        names.append(meta["name"])
        ages.append(age)
        phases.append(phase)
        actions_out.append(",".join(due))
    return pa.table(
        {
            "index": pa.array(names, type=pa.string()),
            "age_s": pa.array(ages, type=pa.int64()),
            "phase": pa.array(phases, type=pa.string()),
            "actions": pa.array(actions_out, type=pa.string()),
        }
    )


def ilm_apply(
    plan: pa.Table,
    index_dirs: dict[str, str],
    registry_dir: str | None = None,
    alias_of: dict[str, str] | None = None,
    shrink_to: int = 2,
) -> dict[str, list[str]]:
    """Execute a plan's due actions with the engine's REAL operators:

    - ``shrink``    → ``reshard_index`` to ``shrink_to`` partitions into
      ``<dir>_shrunk`` (ES shrink reduces shard count on warm data);
    - ``forcemerge``→ ``compact_index`` into ``<dir>_merged`` (tombstones
      reclaimed — ES forcemerge);
    - ``rollover``  → repoint the index's alias at a FRESH empty slot name
      (the caller builds into it); recorded, alias swapped if a registry
      is given;
    - ``delete``    → the index directory is removed.

    Returns {index: [applied actions]}.  Every action is either atomic
    (alias swap, tmp→rename artifacts) or writes to a NEW directory, so a
    crash mid-apply never corrupts a serving index.
    """
    import shutil

    applied: dict[str, list[str]] = {}
    for name, actions in zip(plan["index"].to_pylist(), plan["actions"].to_pylist()):
        done: list[str] = []
        src = index_dirs[name]
        for act in [a for a in actions.split(",") if a]:
            if act == "shrink":
                out = src.rstrip("/") + "_shrunk"
                if not os.path.exists(os.path.join(out, "stats.parquet")):
                    reshard_index(src, out, new_partitions=shrink_to)
                if registry_dir and alias_of and name in alias_of:
                    update_aliases(registry_dir, [("add", alias_of[name], out)])
            elif act == "forcemerge":
                out = src.rstrip("/") + "_merged"
                if not os.path.exists(os.path.join(out, "stats.parquet")):
                    compact_index(src, out)
                if registry_dir and alias_of and name in alias_of:
                    update_aliases(registry_dir, [("add", alias_of[name], out)])
            elif act == "rollover":
                if registry_dir and alias_of and name in alias_of:
                    # ES rollover: the WRITE alias moves to a new index; the
                    # old one stays searchable under its own name
                    new_dir = src.rstrip("/") + "_rollover"
                    os.makedirs(new_dir, exist_ok=True)
                    update_aliases(registry_dir, [("add", alias_of[name], new_dir)])
            elif act == "delete":
                shutil.rmtree(src, ignore_errors=True)
                if registry_dir and alias_of and name in alias_of:
                    update_aliases(registry_dir, [("remove", alias_of[name], None)])
            else:
                raise ValueError(f"unknown ILM action {act!r}")
            done.append(act)
        applied[name] = done
    return applied


# ---------------------------------------------------------------------------
# aliases + reindex (ES `_aliases` / `_reindex`): the zero-downtime swap


def update_aliases(registry_dir: str, actions: list[tuple[str, str, str | None]]) -> dict:
    """ES ``_aliases`` API analog: apply ``[("add", alias, index_dir)]`` /
    ``[("remove", alias, None)]`` actions ATOMICALLY — all of them land in
    one ``os.replace`` of the registry file, so a concurrent reader sees
    either the old mapping or the new one, never a mix.  This is exactly
    ES's remove+add-in-one-call zero-downtime pattern: serving code
    resolves the alias per request and re-opens stores only when the
    target changes.  Returns the post-update mapping.

    The registry is one tiny JSON file; writers are last-write-wins (the
    single-driver ownership model every other index artifact here uses).
    """
    import json

    os.makedirs(registry_dir, exist_ok=True)
    path = os.path.join(registry_dir, "aliases.json")
    aliases: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            aliases = json.load(f)
    for op, alias, target in actions:
        if op == "add":
            if target is None or not os.path.isdir(target):
                raise ValueError(f"alias {alias!r} target is not an index dir: {target!r}")
            aliases[alias] = target
        elif op == "remove":
            aliases.pop(alias, None)
        else:
            raise ValueError(f"unknown alias action {op!r}")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return aliases


def resolve_alias(registry_dir: str, alias: str) -> str:
    """Index dir an alias points at (KeyError if unset) — callers open a
    ``SegmentStore`` on the result, exactly like querying an ES alias."""
    import json

    path = os.path.join(registry_dir, "aliases.json")
    if not os.path.exists(path):
        raise KeyError(alias)
    with open(path) as f:
        entry = json.load(f)[alias]
    return entry["dir"] if isinstance(entry, dict) else entry


def add_filtered_alias(
    registry_dir: str, alias: str, index_dir: str, field: str, value: str
) -> None:
    """ES FILTERED alias: the alias carries a filter clause every search
    through it applies — ES's document-level multi-tenancy primitive (one
    index, one alias per tenant).  Stored next to the plain mapping in the
    same registry file; the swap stays one atomic ``os.replace``."""
    import json

    update_aliases(registry_dir, [("add", alias, index_dir)])  # validates dir
    path = os.path.join(registry_dir, "aliases.json")
    with open(path) as f:
        aliases = json.load(f)
    aliases[alias] = {"dir": index_dir, "filter": {"field": field, "value": value}}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(aliases, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def resolve_alias_full(registry_dir: str, alias: str) -> tuple[str, dict | None]:
    """(index dir, filter spec or None) — the full alias resolution;
    ``resolve_alias`` keeps returning just the dir for plain callers."""
    import json

    path = os.path.join(registry_dir, "aliases.json")
    if not os.path.exists(path):
        raise KeyError(alias)
    with open(path) as f:
        entry = json.load(f)[alias]
    if isinstance(entry, dict):
        return entry["dir"], entry.get("filter")
    return entry, None


def alias_allowed_docs(index_dir: str, filt: dict) -> np.ndarray:
    """doc_ids matching a filtered alias's clause — predicate pushed into
    the forward-map parquet scan (only matching ids leave storage), sorted
    for the query-side ``np.isin``.  Tenant-sized, broadcast once per
    store like every small side."""
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "forward_map"))
    t = ds.to_table(
        columns=["doc_id"], filter=pads.field(filt["field"]) == filt["value"]
    )
    return np.sort(np.asarray(t["doc_id"].combine_chunks(), dtype=np.uint64))


def reindex(cfg, registry_dir: str, alias: str):
    """ES ``_reindex`` + alias-swap: build a fresh index with the new
    configuration (different tokenizer / positional layout / partitioning
    — the reasons one reindexes in ES), then atomically repoint ``alias``
    at it.  The old index directory is untouched (rollback = one more
    swap); readers holding the old resolution keep a consistent index.
    Returns the new index's BuildResult."""
    from .build import build_index

    res = build_index(cfg)
    update_aliases(registry_dir, [("add", alias, res.out_dir)])
    return res


def cat_indices(registry_dir: str) -> pa.Table:
    """ES ``_cat/indices`` over the alias registry: one row per distinct
    index dir any alias points at — (index, aliases, docs_count,
    deleted_docs, store_bytes, status) — from the stats artifacts and the
    filesystem, no data scan (the same sources as ``index_stats``).
    ``status`` is ``green`` when the integrity-critical artifacts exist,
    ``red`` otherwise (a restore that half-landed shows up here)."""
    import json

    path = os.path.join(registry_dir, "aliases.json")
    aliases: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            aliases = json.load(f)
    by_index: dict[str, list[str]] = {}
    for alias, target in aliases.items():
        by_index.setdefault(os.path.abspath(target), []).append(alias)
    rows = []
    for index_dir in sorted(by_index):
        ok = all(
            os.path.exists(os.path.join(index_dir, p))
            for p in ("stats.parquet", "term_dict.parquet", "segments")
        )
        if ok:
            st = index_stats(index_dir)
            rows.append(
                {
                    "index": index_dir,
                    "aliases": ",".join(sorted(by_index[index_dir])),
                    "docs_count": st["n_docs"],
                    "deleted_docs": st["n_tombstones"],
                    "store_bytes": st["segment_bytes"]
                    + st["posting_bytes"]
                    + st["forward_bytes"]
                    + st["term_dict_bytes"],
                    "status": "green",
                }
            )
        else:
            rows.append(
                {
                    "index": index_dir,
                    "aliases": ",".join(sorted(by_index[index_dir])),
                    "docs_count": 0,
                    "deleted_docs": 0,
                    "store_bytes": 0,
                    "status": "red",
                }
            )
    if not rows:
        return pa.table(
            {
                "index": pa.array([], type=pa.string()),
                "aliases": pa.array([], type=pa.string()),
                "docs_count": pa.array([], type=pa.int64()),
                "deleted_docs": pa.array([], type=pa.int64()),
                "store_bytes": pa.array([], type=pa.int64()),
                "status": pa.array([], type=pa.string()),
            }
        )
    return pa.Table.from_pylist(rows)


def ccr_follow(leader_dir: str, follower_dir: str) -> dict:
    """ES cross-cluster replication (x-pack CCR) — one ``follow`` sync:
    make the follower index a byte-identical replica of the leader,
    copying ONLY files that are new or changed since the last sync (ES
    ships segment files the follower is missing, never the whole index).

    Plan: hash both trees (Ray-parallel when a session is live, exactly
    like the snapshot repo), copy leader files whose hash differs or is
    absent (atomic tmp→rename so a killed sync never leaves a torn
    follower), delete follower files the leader no longer has (segments
    replaced by compaction).  Repeated syncs on an unchanged leader copy
    ZERO bytes — the incrementality contract.  Returns
    {"files", "copied", "reused", "deleted", "bytes_copied"}."""
    import shutil

    src_root = os.path.abspath(leader_dir)
    dst_root = os.path.abspath(follower_dir)
    if src_root == dst_root:
        raise ValueError("ccr_follow: leader and follower are the same dir")
    os.makedirs(dst_root, exist_ok=True)

    src_files = _index_files(src_root)
    src_rel = [os.path.relpath(p, src_root) for p in src_files]
    dst_files = _index_files(dst_root)
    dst_rel = {os.path.relpath(p, dst_root): p for p in dst_files}

    # hash everything in one batch (leader + existing follower twins)
    twins = [r for r in src_rel if r in dst_rel]
    digests = _hash_files(src_files + [dst_rel[r] for r in twins])
    src_digest = dict(zip(src_rel, digests[: len(src_files)]))
    dst_digest = dict(zip(twins, digests[len(src_files):]))

    copied = reused = deleted = bytes_copied = 0
    for rel, src in zip(src_rel, src_files):
        if dst_digest.get(rel) == src_digest[rel]:
            reused += 1
            continue
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".ccr-tmp"
        shutil.copy2(src, tmp)
        os.replace(tmp, dst)
        copied += 1
        bytes_copied += os.path.getsize(src)
    keep = set(src_rel)
    for rel, path in dst_rel.items():
        if rel not in keep:
            os.remove(path)
            deleted += 1
    return {
        "files": len(src_files),
        "copied": copied,
        "reused": reused,
        "deleted": deleted,
        "bytes_copied": bytes_copied,
    }


def mount_snapshot(repo_dir: str, name: str, mount_dir: str):
    """ES searchable snapshots (``_snapshot/.../_mount``): serve queries
    DIRECTLY off a repository snapshot without a full restore.

    The repo's blobs are immutable content-addressed files, so mounting is
    the PIT trick pointed at the repository: verify each blob against its
    manifest hash once, then HARDLINK it into the mount tree under its
    original relative path (zero bytes copied when the filesystem allows;
    copy-fallback otherwise).  The mounted tree is read-only by contract —
    writers must restore instead (the ES distinction between a mounted
    searchable snapshot and a restored index).  Returns a ``SegmentStore``
    over the mount; unmounting = deleting the directory, the repo is
    untouched."""
    import json
    import shutil

    from .query import SegmentStore

    with open(os.path.join(repo_dir, "snapshots", f"{name}.json")) as f:
        entries = json.load(f)["files"]
    blob_root = os.path.join(repo_dir, "blobs")
    for rel, meta in sorted(entries.items()):
        blob = os.path.join(blob_root, meta["sha256"])
        if _sha256_file(blob) != meta["sha256"]:
            raise ValueError(f"snapshot corruption: {rel} checksum mismatch")
    for rel, meta in sorted(entries.items()):
        blob = os.path.join(blob_root, meta["sha256"])
        dst = os.path.join(mount_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(blob, dst)
        except OSError:
            shutil.copy2(blob, dst)
    return SegmentStore(mount_dir)
