"""Posting-list codecs (SURVEY.md §2.5 C1–C3): delta + varbyte + block-max.

All encode/decode paths are numpy-vectorized over whole arrays — the encoder
is called once per shard on the *concatenated* gap stream of every term in the
shard, and per-term byte ranges are recovered from the per-value byte-length
cumsum, so the Python-level loop is only over terms, never over postings.

Layout (BASELINE.json L6: "delta-encoded docIDs + varbyte compression,
per-block max-score metadata"):

- docIDs of one posting list are strictly increasing uint64; stored as gaps
  (``gap[0] = doc[0]``, ``gap[i] = doc[i] - doc[i-1]``) in LEB128 varbyte
  (7 data bits per byte, high bit = continuation, little-endian groups).
- tfs are stored varbyte, undeltaed.
- every ``BLOCK`` (=128) postings form a skip block with
  ``(first_doc, last_doc, max_tf, off_docs, off_tfs)`` metadata.  A block can
  be decoded independently: its first gap is relative to the previous block's
  ``last_doc`` (0 for the first block), which block-max WAND reads from the
  metadata of block i-1.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_MAX_VB_BYTES = 10  # ceil(64 / 7)


def varbyte_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per uint64 value (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, _MAX_VB_BYTES):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


def varbyte_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode uint64 values → (uint8 buffer, per-value byte lengths).

    Fast path: posting gaps/tfs/dls are overwhelmingly < 128 (dense posting
    lists have avg gap ≈ N/df ≈ 1–2), so the all-single-byte case — a plain
    uint8 cast — is worth special-casing before the general scatter loop.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = varbyte_sizes(v)
    total = int(nb.sum())
    if total == len(v):  # every value fits one byte
        return v.astype(np.uint8), nb
    out = np.zeros(total, dtype=np.uint8)
    starts = np.zeros(len(v), dtype=np.int64)
    if len(v):
        np.cumsum(nb[:-1], out=starts[1:])
    # single-byte values (the vast majority for posting gaps): one scatter
    m1 = nb == 1
    out[starts[m1]] = v[m1]
    rest = np.flatnonzero(~m1)
    if len(rest):
        vr, nbr, sr = v[rest], nb[rest], starts[rest]
        for j in range(int(nbr.max())):
            m = nbr > j
            byte = ((vr[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
            cont = (nbr[m] - 1 > j).astype(np.uint8)
            out[sr[m] + j] = byte | (cont << 7)
    return out, nb


def varbyte_decode(buf: np.ndarray | bytes) -> np.ndarray:
    """Decode a varbyte buffer → uint64 values (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    within = (np.arange(len(b), dtype=np.int64) - np.repeat(starts, lengths)).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * within)
    return np.add.reduceat(contrib, starts)


def slice_concat_binary(
    buf: np.ndarray, offsets: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> "pa.Array":
    """Per-run binary slices of a shared uint8 buffer → pa.binary array.

    ``offsets[i]`` is the byte offset of element i in ``buf``; run r covers
    elements [starts[r], ends[r]).  Built directly from (offsets, values)
    buffers — no per-run bytes copies.  Shared by the segment encoder
    (per-term posting streams) and the positional explode (per-posting
    position streams).
    """
    import pyarrow as pa

    byte_starts = offsets[starts]
    byte_ends = offsets[ends]
    lengths = byte_ends - byte_starts
    out_off64 = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_off64[1:])
    total = int(out_off64[-1])
    if total >= 1 << 31:
        # pa.binary() carries int32 offsets — a silent wrap would corrupt
        # the output (ADVICE r1).  Fail loudly with the fix.
        raise ValueError(
            f"concatenated binary runs ({total} bytes) exceed the 2 GiB "
            "int32-offset limit — raise the partition count so each unit "
            "encodes less data"
        )
    out_off = out_off64.astype(np.int32)
    values = np.empty(total, dtype=np.uint8)
    for i in range(len(starts)):  # loop over runs, not elements
        values[out_off[i] : out_off[i + 1]] = buf[byte_starts[i] : byte_ends[i]]
    return pa.Array.from_buffers(
        pa.binary(), len(starts), [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(values.tobytes())]
    )


def segmented_positions_decode(blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode one posting list's positions stream → flat absolute positions.

    ``blob`` is the concatenation of per-posting delta-varbyte position
    streams (deltas reset at each posting boundary); posting k contributes
    exactly ``tfs[k]`` values, so no per-posting byte lengths are stored —
    the stream is self-delimiting.  Returns ``sum(tfs)`` absolute positions
    (vectorized segmented cumsum).
    """
    vals = varbyte_decode(blob)
    if len(vals) == 0:
        return vals
    tf64 = tfs.astype(np.int64, copy=False)
    c = np.cumsum(vals, dtype=np.uint64)
    starts = np.cumsum(tf64) - tf64
    base = np.where(starts > 0, c[starts - 1], np.uint64(0))
    return c - np.repeat(base, tf64)


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 docIDs → gaps (gap[0] = doc[0])."""
    d = doc_ids.astype(np.uint64, copy=False)
    return np.diff(d, prepend=np.uint64(0))


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64, copy=False), dtype=np.uint64)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray | None = None, block: int = BLOCK
) -> tuple[bytes, bytes, bytes, list[dict]]:
    """Encode one posting list → (doc_bytes, tf_bytes, dl_bytes, block_meta).

    ``doc_ids`` must be strictly increasing.  ``dls`` is the per-posting doc
    length (schemas.POSTINGS_RAW: dl travels with the posting so segments are
    self-contained).  ``block_meta`` is a list of dicts matching
    schemas.BLOCK_META.
    """
    df = len(doc_ids)
    if dls is None:
        dls = np.ones(df, dtype=np.uint32)
    gaps = delta_encode(doc_ids)
    doc_buf, doc_nb = varbyte_encode(gaps)
    tf_buf, tf_nb = varbyte_encode(tfs.astype(np.uint64, copy=False))
    dl_buf, dl_nb = varbyte_encode(dls.astype(np.uint64, copy=False))

    block_starts = np.arange(0, df, block, dtype=np.int64)
    doc_off = np.zeros(df + 1, dtype=np.int64)
    np.cumsum(doc_nb, out=doc_off[1:])
    tf_off = np.zeros(df + 1, dtype=np.int64)
    np.cumsum(tf_nb, out=tf_off[1:])
    dl_off = np.zeros(df + 1, dtype=np.int64)
    np.cumsum(dl_nb, out=dl_off[1:])
    meta: list[dict] = []
    for s in block_starts:
        e = min(s + block, df)
        meta.append(
            {
                "first_doc": int(doc_ids[s]),
                "last_doc": int(doc_ids[e - 1]),
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(dls[s:e].min()),
                "off_docs": int(doc_off[s]),
                "off_tfs": int(tf_off[s]),
                "off_dls": int(dl_off[s]),
            }
        )
    return doc_buf.tobytes(), tf_buf.tobytes(), dl_buf.tobytes(), meta


def decode_postings(
    doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes | None = None
) -> tuple[np.ndarray, ...]:
    """Decode a full posting list → (doc_ids uint64, tfs uint32[, dls uint32])."""
    gaps = varbyte_decode(doc_bytes)
    tfs = varbyte_decode(tf_bytes).astype(np.uint32)
    if dl_bytes is None:
        return delta_decode(gaps), tfs
    dls = varbyte_decode(dl_bytes).astype(np.uint32)
    return delta_decode(gaps), tfs, dls


def decode_block(
    doc_bytes: bytes,
    tf_bytes: bytes,
    dl_bytes: bytes,
    block_meta: list[dict],
    i: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Independently decode skip block ``i`` of a posting list.

    Uses block i-1's ``last_doc`` as the delta base (0 for block 0) —
    the property block-max WAND relies on to skip without decoding.
    """
    m = block_meta[i]
    last = len(block_meta) - 1
    end_d = block_meta[i + 1]["off_docs"] if i < last else len(doc_bytes)
    end_t = block_meta[i + 1]["off_tfs"] if i < last else len(tf_bytes)
    end_l = block_meta[i + 1]["off_dls"] if i < last else len(dl_bytes)
    base = np.uint64(block_meta[i - 1]["last_doc"]) if i > 0 else np.uint64(0)
    gaps = varbyte_decode(doc_bytes[m["off_docs"] : end_d])
    docs = base + np.cumsum(gaps, dtype=np.uint64)
    tfs = varbyte_decode(tf_bytes[m["off_tfs"] : end_t]).astype(np.uint32)
    dls = varbyte_decode(dl_bytes[m["off_dls"] : end_l]).astype(np.uint32)
    return docs, tfs, dls
