"""Distributed PCA (pipelines/pca.py): numpy identity on the quantized
moments, orthonormality, sign pin, projection map, sink round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
Q = 1000


def _dense():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    mat = np.vstack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
    q = np.sign(mat) * np.floor(np.abs(mat) * Q + 0.5)
    return ids, mat, q


def test_pca_fit_vs_numpy(ray_session):
    """Engine components equal np.cov+eigh over the SAME quantized data
    (independent assembly: dense matrix in one shot, np.cov path)."""
    from bitcoin_ledger_2es_ray.pipelines.pca import pca_fit

    _, _, q = _dense()
    x = q / Q
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals, kind="stable")[:4]
    want_vals, want_vecs = vals[order], vecs[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(want_vecs[i])))
        if want_vecs[i, j] < 0:
            want_vecs[i] = -want_vecs[i]
    t = pca_fit(SF, k=4)
    d = x.shape[1]
    assert t.num_rows == 4 * d
    got_w = np.asarray(t["weight"]).reshape(4, d)
    got_v = np.asarray(t["eigval"]).reshape(4, d)[:, 0]
    assert np.allclose(got_w, np.round(want_vecs, 6), atol=2e-6)
    assert np.allclose(got_v, want_vals, atol=1e-6)
    # descending variance and orthonormal rows
    assert (np.diff(got_v) <= 1e-12).all()
    gram = got_w @ got_w.T
    assert np.allclose(gram, np.eye(4), atol=1e-4)  # rounded weights
    evr = np.asarray(t["explained_ratio"]).reshape(4, d)[:, 0]
    assert np.allclose(evr, want_vals / np.trace(cov), atol=1e-6)


def test_pca_project_map(ray_session):
    """Projections equal (x − μ) @ Wᵀ with the raw float vectors."""
    from bitcoin_ledger_2es_ray.pipelines.pca import _components, pca_project

    ids, mat, _ = _dense()
    _, vecs, _, mu = _components(SF, 4)
    want = np.round((mat - mu) @ vecs.T, 6)
    t = pca_project(SF, k=4)
    assert t["vec_id"].to_pylist() == sorted(ids.tolist())
    order = np.argsort(ids, kind="stable")
    got = np.column_stack([np.asarray(t[f"pc{i}"]) for i in range(4)])
    assert np.allclose(got, want[order], atol=1e-6)
    # centered projections: each component sums to ~0 over the corpus
    assert np.abs(got.sum(axis=0)).max() < 1.0


def test_pca_project_sink_round_trip(ray_session, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.pca import pca_project, pca_project_to_parquet

    out = pca_project_to_parquet(SF, str(tmp_path / "pca"))
    back = pq.read_table(out).sort_by("vec_id")
    direct = pca_project(SF)
    assert back.select(direct.column_names).equals(direct)


def test_kmeans_fit_and_assign(ray_session):
    """First-class k-means: fit matches the shared trainer, assignment is
    the argmax of the normalized matmul (independent dense recompute),
    deterministic across calls."""
    from bitcoin_ledger_2es_ray.pipelines.ann import (
        _train_centroids,
        kmeans_assign,
        kmeans_fit,
    )

    f1 = kmeans_fit(SF, n_centroids=8)
    f2 = kmeans_fit(SF, n_centroids=8)
    assert f1.equals(f2)  # deterministic
    cent = _train_centroids(SF, 8)
    k, d = cent.shape
    assert f1.num_rows == k * d
    got = np.asarray(f1["weight"]).reshape(k, d)
    assert np.allclose(got, np.round(cent, 6), atol=1e-9)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)

    a = kmeans_assign(SF, n_centroids=8)
    ids, mat, _ = _dense()
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(nm @ cent.T, 6)
    best = np.argmax(sims, axis=1)
    want = {int(i): (int(b), float(sims[j, b])) for j, (i, b) in enumerate(zip(ids, best))}
    for vid, c, s in zip(
        a["vec_id"].to_pylist(), a["centroid"].to_pylist(), a["sim"].to_pylist()
    ):
        wb, ws = want[vid]
        assert c == wb and abs(s - ws) < 1e-9
    assert a.num_rows == len(ids)


def test_kmeans_assign_sink_round_trip(ray_session, tmp_path):
    import pyarrow.parquet as pqt

    from bitcoin_ledger_2es_ray.pipelines.ann import (
        kmeans_assign,
        kmeans_assign_to_parquet,
    )

    out = kmeans_assign_to_parquet(SF, str(tmp_path / "km"))
    back = pqt.read_table(out).sort_by("vec_id")
    direct = kmeans_assign(SF)
    assert back.select(direct.column_names).equals(direct)


def test_embedding_report_composition(ray_session):
    """The report equals its constituents joined per vec_id."""
    from bitcoin_ledger_2es_ray.pipelines.ann import kmeans_assign, outlier_scores
    from bitcoin_ledger_2es_ray.pipelines.pca import embedding_report, pca_project

    r = embedding_report(SF)
    km = kmeans_assign(SF, n_centroids=8)
    out = outlier_scores(SF, k=5)
    pcs = pca_project(SF, k=2)
    assert r.num_rows == km.num_rows == out.num_rows == pcs.num_rows
    assert r["vec_id"].to_pylist() == km["vec_id"].to_pylist()
    assert r["centroid"].to_pylist() == km["centroid"].to_pylist()
    assert r["outlier_score"].to_pylist() == out["outlier_score"].to_pylist()
    assert r["pc0"].to_pylist() == pcs["pc0"].to_pylist()
    assert r["pc1"].to_pylist() == pcs["pc1"].to_pylist()
