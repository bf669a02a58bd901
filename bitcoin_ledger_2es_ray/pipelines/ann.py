"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``   exact cosine top-k per query: numpy matmul per Arrow
                       batch against a broadcast query matrix (ray.put once,
                       fetched per task), per-batch partial top-k, tiny final
                       merge — the streaming-scan baseline.
- ``cosine_dup_pairs`` near-dup pairs (cosine >= tau) via the same batch
                       matmul against the full (broadcast) matrix — only
                       viable when one side fits memory; the scale path is
                       LSH bucketing below.
- ``knn_lsh``          random-hyperplane LSH buckets (fixed seed): probe the
                       query's bucket ± multiprobe neighbors; recall measured
                       in tests against the brute-force baseline.

All paths break ties (sim DESC, vec_id ASC) and round to 6 dp so the DuckDB
``list_cosine_similarity`` oracle agrees bit-for-bit after rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bm25 import sql_round

ROUND = 6


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"]).astype(np.int64)
    emb = batch["embedding"].combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the first ``n_queries`` vectors by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, n_queries)
    return _batch_matrix(t)


def knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 5) -> pa.Table:
    """Exact cosine top-k: (query_id, rank, vec_id, sim)."""
    import ray

    q_ids, q_mat = load_queries(sf_dir, n_queries)
    q_ref = ray.put(_normalize(q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)  # zero-copy from local object store
        ids, mat = _batch_matrix(batch)
        sims = q @ _normalize(mat).T  # (n_queries, batch)
        sims = sql_round(sims, ROUND)
        rows = []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # partial top-k within the batch (ties: sim DESC, vec_id ASC)
            order = np.lexsort((ids, -sims[qi]))[:kk]
            for i in order:
                rows.append((qi, int(ids[i]), float(sims[qi, i])))
        return pa.table(
            {
                "q": pa.array([r[0] for r in rows], type=pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "sim": pa.array([r[2] for r in rows], type=pa.float64()),
            }
        )

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in _read_embeddings(sf_dir)
            .map_batches(partial_topk, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    # tiny final merge on the driver: n_queries × (k per batch) candidates
    out_rows = []
    qcol = np.asarray(parts["q"])
    vcol = np.asarray(parts["vec_id"])
    scol = np.asarray(parts["sim"])
    for qi in range(len(q_ids)):
        m = qcol == qi
        order = np.lexsort((vcol[m], -scol[m]))[:k]
        for rank, i in enumerate(order, start=1):
            out_rows.append((int(q_ids[qi]), rank, int(vcol[m][i]), float(scol[m][i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "sim": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def cosine_dup_pairs(sf_dir: str, tau: float = 0.99) -> pa.Table:
    """(a, b, sim) for all pairs with cosine >= tau (a < b).

    Broadcast the full normalized matrix (fits at test scale; document the
    LSH/IVF path for 100 TB) and scan batches against it.
    """
    import pyarrow.parquet as pq
    import ray

    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    f_ids, f_mat = _batch_matrix(full)
    f_ref = ray.put((_normalize(f_mat), f_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        fmat, fids = ray.get(f_ref)
        ids, mat = _batch_matrix(batch)
        raw = _normalize(mat) @ fmat.T
        bi, fj = np.nonzero(raw >= tau)  # filter UNROUNDED (matches the SQL oracle)
        sims = sql_round(raw, ROUND)
        a = ids[bi]
        b = fids[fj]
        keep = a < b  # each unordered pair once; also drops self-pairs
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "sim": pa.array(sims[bi, fj][keep], type=pa.float64()),
            }
        )

    t = pa.concat_tables(
        [
            ray.get(r)
            for r in _read_embeddings(sf_dir)
            .map_batches(pairs, batch_format="pyarrow", batch_size=2048, zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    return t.sort_by([("a", "ascending"), ("b", "ascending")])


def knn_lsh(
    sf_dir: str, n_queries: int = 5, k: int = 5, n_planes: int = 12, multiprobe: int = 2
) -> pa.Table:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Build: one pass bucketing every vector by sign(R·v) (R fixed-seed).
    Search: scan only the query's bucket plus ``multiprobe`` single-bit
    flips.  Output schema matches knn_bruteforce; recall is measured in
    tests, not asserted equal.
    """
    import ray

    q_ids, q_mat = load_queries(sf_dir, n_queries)
    qn = _normalize(q_mat)
    dim = q_mat.shape[1]
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        r = ray.get(planes_ref)
        ids, mat = _batch_matrix(batch)
        signs = (_normalize(mat) @ r.T) > 0
        bucket = (signs.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
        emb = batch["embedding"]
        return pa.table(
            {"vec_id": pa.array(ids), "bucket": pa.array(bucket.astype(np.int64)), "embedding": emb}
        )

    buckets = pa.concat_tables(
        [
            ray.get(r)
            for r in _read_embeddings(sf_dir)
            .map_batches(bucketize, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    by_bucket: dict[int, list[int]] = {}
    for i, bkt in enumerate(buckets["bucket"].to_pylist()):
        by_bucket.setdefault(bkt, []).append(i)
    ids_all, mat_all = _batch_matrix(buckets.select(["vec_id", "embedding"]))
    mat_all = _normalize(mat_all)

    q_signs = (qn @ planes.T) > 0
    q_bucket = (q_signs.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    rows = []
    for qi in range(len(q_ids)):
        probes = [int(q_bucket[qi])] + [
            int(q_bucket[qi]) ^ (1 << bit) for bit in range(min(multiprobe, n_planes))
        ]
        cand = [i for p in probes for i in by_bucket.get(p, [])]
        if not cand:
            continue
        cand = np.array(sorted(set(cand)), dtype=np.int64)
        sims = sql_round(mat_all[cand] @ qn[qi], ROUND)
        order = np.lexsort((ids_all[cand], -sims))[:k]
        for rank, i in enumerate(order, start=1):
            rows.append((int(q_ids[qi]), rank, int(ids_all[cand][i]), float(sims[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "sim": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
