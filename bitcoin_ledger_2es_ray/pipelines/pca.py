"""Distributed PCA over the embedding column — the dimensionality-reduction
/ whitening step an embedding-curation stack runs before clustering or
dedup (SemDedup-style preprocessing), expressed as exact moment partials:

- ``pca_fit``      ONE streamed pass of per-batch INTEGER moment partials
                   (n, Σx, Σxxᵀ over MILLI-quantized coordinates — values
                   are O(1), so products are ~10⁶ and int64 holds to ~10¹²
                   rows; integer sums are order-exact, making the fitted
                   covariance IDENTICAL on any cluster size / block order,
                   which float accumulation cannot promise) → driver
                   eigendecomposition of the d×d covariance (d=64 here —
                   the d×d reduce is the whole point: nothing corpus-sized
                   ever reaches the driver) → top-k components with a
                   deterministic sign pin (the largest-|weight| entry of
                   each component is made positive; ties take the first).
- ``pca_project``  components broadcast by closure (a k×d float array);
                   each batch projects its RAW float vectors in one matmul
                   — the row stream never shuffles.

PCA on milli-quantized data is the documented determinism trade: the
covariance perturbation is O(1e-3) relative and irrelevant to component
quality, and in exchange the fit is bit-reproducible across engines.
Eigendecomposition itself is LAPACK — rows-only by nature (no SQL oracle);
tests pin the numpy identity, orthonormality and the projection map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bm25 import sql_round

QUANT = 1000  # milli-units

__all__ = ["pca_fit", "pca_project", "pca_project_ds", "pca_project_to_parquet"]


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _quant_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"]).astype(np.int64)
    emb = batch["embedding"].combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    mat = flat.reshape(len(ids), -1)
    return ids, mat


def _milli(mat: np.ndarray) -> np.ndarray:
    """Half-away milli-quantization (matches the house integer rounding)."""
    return (np.sign(mat) * np.floor(np.abs(mat) * QUANT + 0.5)).astype(np.int64)


def _moments(sf_dir: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact (n, Σx (d,), Σxxᵀ (d, d)) over milli-quantized coordinates."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _quant_matrix(batch)
        q = _milli(mat)
        sx = q.sum(axis=0)
        sxx = q.T @ q  # int64 (d, d)
        return pa.table(
            {
                "n": pa.array([len(q)], type=pa.int64()),
                "sx": pa.array([sx.tolist()], type=pa.list_(pa.int64())),
                "sxx": pa.array([sxx.ravel().tolist()], type=pa.list_(pa.int64())),
            }
        )

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in _read_embeddings(sf_dir)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    n = int(np.asarray(parts["n"]).sum())
    sx = np.sum([np.asarray(x, dtype=np.int64) for x in parts["sx"].to_pylist()], axis=0)
    sxx = np.sum([np.asarray(x, dtype=np.int64) for x in parts["sxx"].to_pylist()], axis=0)
    d = len(sx)
    return n, sx, sxx.reshape(d, d)


def _components(
    sf_dir: str, k: int
) -> tuple[np.ndarray, np.ndarray, float, np.ndarray]:
    """(eigvals desc (k,), components (k, d), total_var, mean) — one moment
    pass feeds both the fit and the projection."""
    n, sx, sxx = _moments(sf_dir)
    mu = sx.astype(np.float64) / (n * QUANT)
    cov = sxx.astype(np.float64) / (n * QUANT * QUANT) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-vals, kind="stable")[:k]
    top_vals, top_vecs = vals[order], vecs[:, order].T  # (k, d)
    for i in range(len(top_vecs)):
        j = int(np.argmax(np.abs(top_vecs[i])))  # first index on ties
        if top_vecs[i, j] < 0:
            top_vecs[i] = -top_vecs[i]
    return top_vals, top_vecs, float(np.trace(cov)), mu


def pca_fit(sf_dir: str, k: int = 4) -> pa.Table:
    """(component, dim, weight, eigval, explained_ratio) — long form,
    k × d rows, sorted (component, dim)."""
    vals, vecs, total, _ = _components(sf_dir, k)
    k_, d = vecs.shape
    return pa.table(
        {
            "component": pa.array(np.repeat(np.arange(k_, dtype=np.int64), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k_)),
            "weight": pa.array(sql_round(vecs.ravel(), 6), type=pa.float64()),
            "eigval": pa.array(sql_round(np.repeat(vals, d), 6), type=pa.float64()),
            "explained_ratio": pa.array(
                sql_round(np.repeat(vals / total, d), 6), type=pa.float64()
            ),
        }
    )


def pca_project_ds(sf_dir: str, k: int = 4):
    """(vec_id, pc0..pc{k-1}) — RAW float vectors centered on the fitted
    mean and projected onto the UNROUNDED components, outputs at 6 dp."""
    _, vecs, _, mu = _components(sf_dir, k)

    def project(batch: pa.Table) -> pa.Table:
        ids, mat = _quant_matrix(batch)
        proj = (mat - mu) @ vecs.T  # (n, k)
        cols = {"vec_id": pa.array(ids, type=pa.int64())}
        for i in range(proj.shape[1]):
            cols[f"pc{i}"] = pa.array(sql_round(proj[:, i], 6), type=pa.float64())
        return pa.table(cols)

    return _read_embeddings(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def pca_project(sf_dir: str, k: int = 4) -> pa.Table:
    import ray

    parts = [ray.get(r) for r in pca_project_ds(sf_dir, k).to_arrow_refs()]
    return pa.concat_tables([p for p in parts if p.num_rows]).sort_by("vec_id")


def pca_project_to_parquet(sf_dir: str, out_dir: str, k: int = 4) -> str:
    from .textstats import write_dataset

    return write_dataset(pca_project_ds(sf_dir, k), out_dir)


def embedding_report(sf_dir: str, k_pcs: int = 2, n_centroids: int = 8, knn_k: int = 5) -> "pa.Table":
    """Composed embedding-curation report — the vector-side analog of
    ``curate.curate_corpus``: one row per vector joining the cluster
    assignment (``ann.kmeans_assign``), the distance-based outlier score
    (``ann.outlier_scores``) and the leading principal components
    (``pca_project``), ORDER-PINNED on vec_id (Arrow ``Table.join`` does
    not preserve row order — each piece arrives vec_id-sorted and is
    re-sorted after the joins).

    Each constituent is its own streamed pipeline; the join happens on the
    already-reduced per-vector tables (3–4 small columns each), so the
    composition adds no new corpus-sized driver state beyond what the
    pieces themselves are gated at.  Rows-only by nature (k-means + eigen
    components are not SQL-expressible)."""
    from .ann import kmeans_assign, outlier_scores

    km = kmeans_assign(sf_dir, n_centroids=n_centroids)
    out = outlier_scores(sf_dir, k=knn_k).select(["vec_id", "outlier_score"])
    pcs = pca_project(sf_dir, k=k_pcs)
    t = km.join(out, keys="vec_id", join_type="inner")
    t = t.join(pcs, keys="vec_id", join_type="inner")
    return t.sort_by("vec_id")
