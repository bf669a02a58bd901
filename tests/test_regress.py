"""Deterministic OLS regression (pipelines/regress.py): independent numpy
recompute (polyfit / corrcoef — different algorithms than the closed form),
prediction identity, sink round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _xy():
    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
    x = np.asarray(t["l_quantity"], dtype=np.float64)
    y = np.asarray(t["l_extendedprice"], dtype=np.float64)
    xi = np.floor(np.abs(x) + 0.5) * np.sign(x)
    yi = np.floor(np.abs(y) + 0.5) * np.sign(y)
    return x, xi, yi


def test_ols_fit_vs_polyfit(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.regress import ols_fit

    _, xi, yi = _xy()
    t = ols_fit(SF)
    slope, intercept = np.polyfit(xi, yi, 1)
    assert abs(t["slope"][0].as_py() - slope) < 1e-4 * max(1.0, abs(slope))
    assert abs(t["intercept"][0].as_py() - intercept) < 1e-4 * max(1.0, abs(intercept))
    r = np.corrcoef(xi, yi)[0, 1]
    assert abs(t["r2"][0].as_py() - r * r) < 1e-6
    assert t["n"][0].as_py() == len(xi)
    assert 0.0 <= t["r2"][0].as_py() <= 1.0


def test_ols_predict_identity(ray_session):
    """pred = slope·x + intercept with the UNROUNDED fit; residual closes."""
    from bitcoin_ledger_2es_ray.pipelines.regress import (
        _closed_form,
        _moments,
        ols_predict,
    )

    x, _, yi = _xy()
    slope, intercept, _ = _closed_form(*_moments(SF))
    t = ols_predict(SF)
    assert t.num_rows == len(x)
    # residuals sum to ~0 (OLS normal equations) and close the identity
    pred = np.asarray(t["pred_usd"], dtype=np.float64)
    resid = np.asarray(t["resid_usd"], dtype=np.float64)
    got_y = np.asarray(t["y_usd"], dtype=np.float64)
    assert np.allclose(got_y - pred, resid, atol=1e-6)
    assert abs(resid.mean()) < 1.0  # rounded-unit fit: mean residual ≈ 0
    # spot-check the affine map on the sorted output vs a direct recompute
    tt = pq.read_table(f"{SF}/lineitem.parquet").sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )
    xs = np.asarray(tt["l_quantity"], dtype=np.float64)
    want = np.round(slope * xs + intercept, 6)
    assert np.allclose(pred, want, atol=1e-6)


def test_ols_predict_sink_round_trip(ray_session, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.regress import (
        ols_predict,
        ols_predict_to_parquet,
    )

    out = ols_predict_to_parquet(SF, str(tmp_path / "ols"))
    back = pq.read_table(out).sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )
    direct = ols_predict(SF)
    assert back.select(direct.column_names).equals(direct)


def test_inference_agg_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from bitcoin_ledger_2es_ray.pipelines.regress import inference_agg

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    mine = inference_agg(sf).to_pandas()
    orc = con.sql(
        """
        WITH m AS (
          SELECT count(*)::BIGINT AS n,
                 sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
                 sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
                 sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
                 sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
          FROM lineitem),
        c AS (
          SELECT n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                 n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n,
                 n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS var_x
          FROM m),
        s AS (SELECT cov_n / var_x AS slope, syd, sxd, nd FROM c),
        f AS (SELECT slope, (syd - slope * sxd) / nd AS icept FROM s),
        b AS (
          SELECT l_returnflag, count(*)::BIGINT AS n,
                 sum(CAST(round(l_quantity) AS BIGINT)) AS sq
          FROM lineitem GROUP BY 1)
        SELECT b.l_returnflag, b.n,
               round(b.sq::DOUBLE / b.n::DOUBLE, 6) AS avg_qty,
               round(f.slope * (b.sq::DOUBLE / b.n::DOUBLE) + f.icept, 6) AS pred_usd
        FROM b, f ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(mine.to_pandas() if hasattr(mine, "to_pandas") else mine,
                                  orc, check_dtype=False, atol=0, rtol=0)
