"""Document chunking for training-data / RAG pipelines.

Splits each document's token stream into fixed-size windows with a stride
(overlapping when stride < window) — the standard context-window
preparation step for embedding or LM-training pipelines.  Fully
vectorized: one batch = one ragged-arange construction over the flat token
buffer (no per-row Python), and the chunk text is rebuilt with Arrow's
``binary_join`` so the output is directly writable.

Chunk boundaries are per-document, so the operator is embarrassingly
parallel over corpus blocks — no shuffle at any scale; the output streams
straight to a partitioned parquet sink.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ragged_arange(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate arange(s, s+l) for every (s, l) pair — no Python loop."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    # standard trick: global arange minus per-segment offsets plus starts
    ends = np.cumsum(lengths)
    seg = np.repeat(np.arange(len(lengths)), lengths)
    within = np.arange(total) - np.repeat(ends - lengths, lengths)
    return starts[seg] + within


def chunk_batch(batch: pa.Table, window: int, stride: int) -> pa.Table:
    """(doc_id, text) → (doc_id, chunk_id, start, n_tokens, chunk) rows.

    Chunk c of a doc covers token positions [c·stride, min(c·stride+window,
    dl)); chunks exist for every start < dl, so the last one may be short
    and a doc never yields zero chunks (corpus docs are non-empty).
    """
    toks = pc.split_pattern(batch["text"], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
    n_chunks = np.where(dl > 0, (np.maximum(dl, 1) - 1) // stride + 1, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "start": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    doc_of_chunk = np.repeat(np.arange(len(dl)), n_chunks)
    # chunk_id within its doc, via the same ragged-arange construction
    chunk_id = _ragged_arange(np.zeros(len(dl), dtype=np.int64), n_chunks)
    start = chunk_id * stride
    length = np.minimum(start + window, dl[doc_of_chunk]) - start
    # gather the flat token indices of every chunk (overlaps duplicate)
    flat = toks.flatten()
    doc_off = np.concatenate(([0], np.cumsum(dl)))[:-1]
    idx = _ragged_arange(doc_off[doc_of_chunk] + start, length)
    values = flat.take(pa.array(idx, type=pa.int64()))
    offsets = np.concatenate(([0], np.cumsum(length)))
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), values
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[doc_of_chunk], type=pa.int64()),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "start": pa.array(start, type=pa.int64()),
            "n_tokens": pa.array(length, type=pa.int64()),
            "chunk": pc.binary_join(chunk_lists, " "),
        }
    )


def chunk_documents_ds(sf_dir: str, window: int = 32, stride: int = 24):
    """Lazy Dataset of token-window chunks over the documents table."""
    import ray.data as rd

    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_batch(batch, window, stride)

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(sf_dir: str, window: int = 32, stride: int = 24) -> pa.Table:
    """Driver-gate variant: the full chunk table, sorted."""
    from .textstats import _collect_sorted

    return _collect_sorted(
        chunk_documents_ds(sf_dir, window, stride), key="doc_id"
    ).sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])


def chunk_documents_to_parquet(
    sf_dir: str, out_dir: str, window: int = 32, stride: int = 24
) -> str:
    """Scale sink: stream chunks to partitioned parquet (overwrite)."""
    chunk_documents_ds(sf_dir, window, stride).write_parquet(
        out_dir, mode="overwrite"
    )
    return out_dir
