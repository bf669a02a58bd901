"""Phase B stage: the term shuffle's reduce side (SURVEY.md §2.3 T2, §2.4 G1/G2).

``postings.groupby("shard").map_groups(build_segment)`` delivers every
posting of a (shard) partition to one task.  The builder sorts by
(term, salt, doc_id), encodes all posting lists of the shard in ONE
vectorized pass (the varbyte encoder runs over the concatenated gap stream;
per-term byte ranges come from the byte-length cumsum — the only Python
loop is over the shard's distinct (term, salt) runs when slicing buffers),
computes per-128-posting block-max metadata columnar-ly (reduceat +
StructArray.from_arrays, no per-block Python objects), writes the segment
parquet atomically, and returns the shard's term-dictionary rows.

df/cf per term (G2) fall out of the run boundaries — no extra shuffle.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.codecs import BLOCK, varbyte_encode
from ..schemas import BLOCK_META, SEGMENT, SEGMENT_POS, TERM_DICT
from ..state.manifest import Manifest, atomic_write_parquet


def _binary_np(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """View a pa.binary array as (uint8 values, int64 per-element byte
    offsets into values) — zero-copy except the offset upcast."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    vals = np.frombuffer(bufs[2], dtype=np.uint8)
    return vals, off


def _slice_bytes(buf: np.ndarray, offsets: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Array:
    """Per-run binary slices of a shared uint8 buffer → pa.binary array.

    Built directly from (offsets, values) buffers — no per-run bytes copies.
    """
    byte_starts = offsets[starts]
    byte_ends = offsets[ends]
    lengths = byte_ends - byte_starts
    out_off64 = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off64[1:])
    total = int(out_off64[-1])
    if total >= 1 << 31:
        # pa.binary() carries int32 offsets — a silent wrap would corrupt
        # the segment (ADVICE r1).  Fail loudly with the fix.
        raise ValueError(
            f"shard's encoded posting bytes ({total}) exceed the 2 GiB "
            "int32-offset limit of the segment layout — raise "
            "BuildConfig.num_partitions (or lower max_slice_postings) so "
            "each shard encodes less data"
        )
    out_off = out_off64.astype(np.int32)
    values = np.empty(total, dtype=np.uint8)
    for i in range(len(starts)):  # loop over runs (distinct terms), not postings
        values[out_off[i] : out_off[i + 1]] = buf[byte_starts[i] : byte_ends[i]]
    return pa.Array.from_buffers(
        pa.binary(), len(starts), [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(values.tobytes())]
    )


def encode_shard(table: pa.Table) -> tuple[pa.Table, pa.Table, int]:
    """Encode one shard's postings → (segment table, term_dict rows, shard id).

    Output is a pure function of the row SET (the sort key (term, salt,
    doc_id) is unique per row), so any input order — Ray groupby groups or
    file-partitioned concatenation — yields byte-identical segments.
    """
    table = table.combine_chunks()  # shuffle output is heavily chunked
    sid = int(table["shard"][0].as_py())
    # sort numerically on dictionary codes remapped to lexicographic rank —
    # much cheaper than an Arrow multi-key string sort at millions of rows,
    # and the gather afterwards is plain numpy fancy indexing
    dic = pc.dictionary_encode(table["term"].combine_chunks())
    codes = np.asarray(dic.indices)
    vocab = dic.dictionary.to_pylist()
    vorder = sorted(range(len(vocab)), key=vocab.__getitem__)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[vorder] = np.arange(len(vocab))
    skey = rank[codes]
    salt0 = np.asarray(table["salt"].combine_chunks())
    docs0 = np.asarray(table["doc_id"].combine_chunks())
    if (
        len(vocab) <= 0xFFFF
        and docs0.size
        and int(docs0.max()) < 1 << 40
        and int(salt0.max()) < 256
    ):
        # composite single-key sort: term-rank(16b) | salt(8b) | doc(40b) —
        # one argsort instead of three stable lexsort passes
        key = (
            (skey.astype(np.uint64) << np.uint64(48))
            | (salt0.astype(np.uint64) << np.uint64(40))
            | docs0.astype(np.uint64)
        )
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((docs0, salt0, skey))
    skey = skey[order]
    salt = salt0[order]
    docs = docs0[order]
    tfs = np.asarray(table["tf"].combine_chunks())[order]
    dls = np.asarray(table["dl"].combine_chunks())[order]
    code_sorted = codes[order]
    n = len(docs)

    # run boundaries: a run = one (term, salt) posting list
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (skey[1:] != skey[:-1]) | (salt[1:] != salt[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)

    # delta-encode docIDs: global diff, then reset each run's first gap
    gaps = np.diff(docs, prepend=np.uint64(0))
    gaps[starts] = docs[starts]

    doc_buf, doc_nb = varbyte_encode(gaps)
    tf_buf, tf_nb = varbyte_encode(tfs.astype(np.uint64))
    dl_buf, dl_nb = varbyte_encode(dls.astype(np.uint64))
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_nb, out=doc_off[1:])
    tf_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_nb, out=tf_off[1:])
    dl_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dl_nb, out=dl_off[1:])

    # block boundaries: every run start begins a new block, then every BLOCK
    # postings within the run — so global segments between consecutive block
    # starts are exactly the blocks, and reduceat computes per-block stats.
    run_lens = ends - starts
    blocks_per_run = (run_lens + BLOCK - 1) // BLOCK
    total_blocks = int(blocks_per_run.sum())
    run_of_block = np.repeat(np.arange(len(starts)), blocks_per_run)
    within = np.arange(total_blocks) - np.repeat(
        np.cumsum(blocks_per_run) - blocks_per_run, blocks_per_run
    )
    bstarts = starts[run_of_block] + within * BLOCK
    bends = np.minimum(bstarts + BLOCK, ends[run_of_block])

    first_doc = docs[bstarts]
    last_doc = docs[bends - 1]
    bmax_tf = np.maximum.reduceat(tfs, bstarts)
    bmin_dl = np.minimum.reduceat(dls, bstarts)
    run_start_of_block = starts[run_of_block]
    off_docs = (doc_off[bstarts] - doc_off[run_start_of_block]).astype(np.uint32)
    off_tfs = (tf_off[bstarts] - tf_off[run_start_of_block]).astype(np.uint32)
    off_dls = (dl_off[bstarts] - dl_off[run_start_of_block]).astype(np.uint32)

    block_struct = pa.StructArray.from_arrays(
        [
            pa.array(first_doc, type=pa.uint64()),
            pa.array(last_doc, type=pa.uint64()),
            pa.array(bmax_tf, type=pa.uint32()),
            pa.array(bmin_dl, type=pa.uint32()),
            pa.array(off_docs, type=pa.uint32()),
            pa.array(off_tfs, type=pa.uint32()),
            pa.array(off_dls, type=pa.uint32()),
        ],
        fields=list(BLOCK_META),
    )
    list_off = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum(blocks_per_run, out=list_off[1:])
    block_list = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), block_struct)

    run_terms = pa.array([vocab[c] for c in code_sorted[starts]], type=pa.string())
    df = run_lens.astype(np.uint32)
    cf = np.add.reduceat(tfs.astype(np.uint64), starts)
    max_tf = np.maximum.reduceat(tfs, starts).astype(np.uint32)

    cols = {
        "term": run_terms.cast(pa.string()),
        "salt": pa.array(salt[starts], type=pa.uint16()),
        "df": pa.array(df, type=pa.uint32()),
        "cf": pa.array(cf, type=pa.uint64()),
        "max_tf": pa.array(max_tf, type=pa.uint32()),
        "doc_ids": _slice_bytes(doc_buf, doc_off, starts, ends),
        "tfs": _slice_bytes(tf_buf, tf_off, starts, ends),
        "dls": _slice_bytes(dl_buf, dl_off, starts, ends),
        "block_meta": block_list,
    }
    if "positions" in table.column_names:
        # positional index: concatenate the run's per-posting position
        # streams in doc order (no block-level offsets — phrase evaluation
        # decodes a whole run; value counts come from the tf stream)
        posarr = table["positions"].combine_chunks().take(pa.array(order))
        pvals, poffs = _binary_np(posarr)
        cols["positions"] = _slice_bytes(pvals, poffs, starts, ends)
    seg = pa.table(
        cols, schema=SEGMENT_POS if "positions" in cols else SEGMENT
    )
    dict_rows = pa.table(
        {
            "term": seg["term"],
            "salt": seg["salt"],
            "partition": pa.array(np.full(len(starts), sid, dtype=np.uint32), type=pa.uint32()),
            "row": pa.array(np.arange(len(starts), dtype=np.uint32), type=pa.uint32()),
            "df": seg["df"],
            "cf": seg["cf"],
        },
        schema=TERM_DICT,
    )
    return seg, dict_rows, sid


TERM_DICT_ROW_GROUP = 65536  # term_dict row-group size — the pruned-lookup unit

BUILDER_ENTRY = pa.schema([("shard", pa.uint32()), ("n_lists", pa.uint64())])


def make_segment_builder(out_dir: str, build_fingerprint: str = "", tokenize_set: str = ""):
    """map_groups body: encode, atomically commit segment + per-shard
    term-dict slice, emit a small metadata row.

    The shard's dictionary rows are (term, salt)-sorted (the encode sort
    order), so ``term_dict_parts/shard-NNNNN.parquet`` files are SORTED RUNS
    — the finalize step merges them without re-shipping dictionary rows
    through the object store, and a resumed build reuses skipped shards'
    runs directly from disk (pipelines/build.py)."""

    def build_segment(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=BUILDER_ENTRY)
        t0 = time.monotonic()
        seg, dict_rows, sid = encode_shard(group)
        nbytes = atomic_write_parquet(seg, f"{out_dir}/segments/shard-{sid:05d}.parquet")
        atomic_write_parquet(
            dict_rows,
            f"{out_dir}/term_dict_parts/shard-{sid:05d}.parquet",
            row_group_size=TERM_DICT_ROW_GROUP,
        )
        Manifest(out_dir).write_entry(
            "segment",
            sid,
            {
                "status": "done",
                "build_fingerprint": build_fingerprint,
                "tokenize_set": tokenize_set,
                "n_postings": group.num_rows,
                "n_lists": seg.num_rows,
                "bytes": nbytes,
                "input_bytes": group.nbytes,
                "wall_s": round(time.monotonic() - t0, 4),
            },
        )
        return pa.table(
            {"shard": pa.array([sid], type=pa.uint32()),
             "n_lists": pa.array([seg.num_rows], type=pa.uint64())},
            schema=BUILDER_ENTRY,
        )

    return build_segment
