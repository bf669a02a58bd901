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


def max_passage_topk(
    sf_dir: str,
    queries: pa.Table,
    window: int = 32,
    stride: int = 24,
    k: int = 10,
    round_decimals: int = 6,
) -> pa.Table:
    """Max-passage retrieval (the `semantic_text`-era chunked-document
    ranking): documents are split into overlapping token windows, each
    PASSAGE is BM25-scored against the query over chunk-level statistics
    (chunk df / chunk length / chunk avgdl), and a document scores as its
    BEST passage — long documents stop winning on length alone.

    Index-free two-pass streaming plan over the chunk stream (all
    queries in one scan):
      A. per-batch partials of chunk-level df for the query-term union +
         (n_chunks, Σlen) — driver fold is bounded by |query vocab|;
      B. per-batch scoring of every (chunk × query) restricted to query
         terms, reduced per (query, doc) by MAX before leaving the
         batch; the driver combine is bounded by queries × docs-hit.
    Returns (query_id, rank, doc_id, score)."""
    import ray

    from ..functions.bm25 import idf, sql_round, tf_norm
    from .query import tokenize_query

    qids_list = queries["query_id"].to_pylist()
    qterms = {
        int(q): sorted(set(tokenize_query(t)))
        for q, t in zip(qids_list, queries["text"].to_pylist())
    }
    vocab = sorted({t for ts in qterms.values() for t in ts})
    if not vocab:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    v_arr = np.array(vocab)
    v_ref = ray.put(v_arr)

    def _chunk_term_matrix(batch: pa.Table):
        """(doc_ids, chunk_len, tf[chunk, vocab_term]) for one chunk batch."""
        va = ray.get(v_ref)
        toks = pc.split_pattern(batch["chunk"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        cl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = np.asarray(toks.flatten().cast(pa.string())).astype(str)
        row = np.repeat(np.arange(len(cl)), cl)
        ti = np.searchsorted(va, flat)
        ti = np.clip(ti, 0, len(va) - 1)
        hit = va[ti] == flat
        tf = np.zeros((len(cl), len(va)), dtype=np.float64)
        np.add.at(tf, (row[hit], ti[hit]), 1.0)
        return np.asarray(batch["doc_id"], dtype=np.int64), cl, tf

    ds = chunk_documents_ds(sf_dir, window, stride)

    def stats_partial(batch: pa.Table) -> pa.Table:
        _, cl, tf = _chunk_term_matrix(batch)
        return pa.table(
            {
                "cdf": pa.array([(tf > 0).sum(axis=0).tolist()]),
                "n": pa.array([len(cl)], type=pa.int64()),
                "s": pa.array([int(cl.sum())], type=pa.int64()),
            }
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(
            stats_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    st = pa.concat_tables([p for p in parts if p.num_rows])
    cdf = np.array(st["cdf"].to_pylist(), dtype=np.float64).sum(axis=0)
    n_chunks = sum(st["n"].to_pylist())
    avgdl = sum(st["s"].to_pylist()) / n_chunks
    w_idf = np.array([float(idf(n_chunks, d)) if d > 0 else 0.0 for d in cdf])
    # per-query boolean mask over the vocab
    qmask = {
        q: np.isin(v_arr, np.array(ts)) if ts else np.zeros(len(v_arr), dtype=bool)
        for q, ts in qterms.items()
    }
    m_ref = ray.put((w_idf, qmask, avgdl))

    def score_partial(batch: pa.Table) -> pa.Table:
        widf, qm, av = ray.get(m_ref)
        doc, cl, tf = _chunk_term_matrix(batch)
        contrib = widf * tf_norm(tf, cl[:, None], av)  # [chunk, term]
        out_q, out_d, out_s = [], [], []
        uniq_docs, dinv = np.unique(doc, return_inverse=True)
        for q, mask in qm.items():
            if not mask.any():
                continue
            cs = contrib[:, mask].sum(axis=1)  # chunk score for query q
            best = np.zeros(len(uniq_docs), dtype=np.float64)
            np.maximum.at(best, dinv, cs)
            nz = best > 0
            out_q.append(np.full(nz.sum(), q, dtype=np.int64))
            out_d.append(uniq_docs[nz])
            out_s.append(best[nz])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "s": np.concatenate(out_s),
            }
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(
            score_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    cat = pa.concat_tables(parts)
    g = cat.group_by(["query_id", "doc_id"]).aggregate([("s", "max")])
    q = np.asarray(g["query_id"], dtype=np.int64)
    d = np.asarray(g["doc_id"], dtype=np.int64)
    s = sql_round(np.asarray(g["s_max"], dtype=np.float64), round_decimals)
    order = np.lexsort((d, -s, q))
    q, d, s = q[order], d[order], s[order]
    new = np.concatenate(([True], q[1:] != q[:-1]))
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(q)), 0))
    rank = np.arange(len(q)) - run_start + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(q[keep], type=pa.int64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
            "doc_id": pa.array(d[keep], type=pa.int64()),
            "score": pa.array(s[keep], type=pa.float64()),
        }
    )
