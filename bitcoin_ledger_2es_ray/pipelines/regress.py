"""Deterministic least-squares regression — the graft variant of ES x-pack
data-frame-analytics ``regression`` (ES trains a boosted-tree ensemble with
bagged randomness; this keeps the closed-form ordinary-least-squares member
of the family so training is exactly reproducible on any cluster size and
SQL-gateable):

- ``ols_fit``         ONE streamed pass of per-batch INTEGER moment partials
                      (n, Σx, Σy, Σxx, Σxy, Σyy — x as whole units, y
                      ROUNDED TO WHOLE DOLLARS so Σy² stays inside int64
                      to ~10⁸ rows; every cross-engine sum is order-exact), a
                      driver combine bounded by #batches, then the closed
                      forms  slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²),
                      intercept = (Σy − slope·Σx)/n and
                      r² = (nΣxy − ΣxΣy)² / ((nΣxx − Σx²)(nΣyy − Σy²)).
- ``ols_predict``     the fitted (slope, intercept) pair broadcast by
                      closure (two scalars — nothing to ``ray.put``); each
                      batch emits prediction + residual in dollars via one
                      vectorized expression, the row stream never shuffles
                      (ES's analytics "inference" step over the destination
                      index).

The closed forms are evaluated AFTER converting each exact integer moment
to float64 (both engines make the identical IEEE conversion) — the raw
integer products would exceed 2^53 and Python big-int division vs DuckDB
double division would diverge in the last ulp.

Float rule: moments are exact int64; the closed forms are evaluated with
the SAME double expression tree the DuckDB oracle spells out (not DuckDB's
streaming ``regr_*`` accumulators), then rounded half-away at 6 dp.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round

__all__ = ["ols_fit", "ols_predict", "ols_predict_ds", "ols_predict_to_parquet"]


def _read_xy(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )


def _moment_partial(batch: pa.Table) -> pa.Table:
    """Exact integer moments of (x = quantity units, y = whole dollars)."""
    x = np.asarray(batch["l_quantity"], dtype=np.float64)
    y = np.asarray(batch["l_extendedprice"], dtype=np.float64)
    xi = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    yi = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
    return pa.table(
        {
            "n": pa.array([len(xi)], type=pa.int64()),
            "sx": pa.array([int(xi.sum())], type=pa.int64()),
            "sy": pa.array([int(yi.sum())], type=pa.int64()),
            "sxx": pa.array([int((xi * xi).sum())], type=pa.int64()),
            "sxy": pa.array([int((xi * yi).sum())], type=pa.int64()),
            "syy": pa.array([int((yi * yi).sum())], type=pa.int64()),
        }
    )


def _moments(sf_dir: str) -> tuple[int, int, int, int, int, int]:
    import ray

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in _read_xy(sf_dir)
            .map_batches(_moment_partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    return tuple(int(pc.sum(parts[c]).as_py()) for c in ("n", "sx", "sy", "sxx", "sxy", "syy"))


def _closed_form(n, sx, sy, sxx, sxy, syy) -> tuple[float, float, float]:
    """The exact double expression tree the SQL oracle mirrors — every
    moment converted to float64 FIRST (see module docstring)."""
    n, sx, sy, sxx, sxy, syy = (np.float64(v) for v in (n, sx, sy, sxx, sxy, syy))
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = (sy - slope * sx) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    return slope, intercept, r2


def ols_fit(sf_dir: str) -> pa.Table:
    """(n, slope, intercept, r2) — y = price in whole dollars, x = quantity."""
    n, sx, sy, sxx, sxy, syy = _moments(sf_dir)
    slope, intercept, r2 = _closed_form(n, sx, sy, sxx, sxy, syy)
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "slope": pa.array([sql_round(slope, 6)], type=pa.float64()),
            "intercept": pa.array([sql_round(intercept, 6)], type=pa.float64()),
            "r2": pa.array([sql_round(r2, 6)], type=pa.float64()),
        }
    )


def ols_predict_ds(sf_dir: str):
    """Per-row inference: (l_orderkey, l_linenumber, y_usd, pred_usd,
    resid_usd) — UNROUNDED slope/intercept scored per batch (the oracle
    re-derives the identical doubles), outputs rounded at 6 dp."""
    n, sx, sy, sxx, sxy, syy = _moments(sf_dir)
    slope, intercept, _ = _closed_form(n, sx, sy, sxx, sxy, syy)

    def score(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["l_quantity"], dtype=np.float64)
        y = np.asarray(batch["l_extendedprice"], dtype=np.float64)
        yi = np.sign(y) * np.floor(np.abs(y) + 0.5)
        pred = sql_round(slope * x + intercept, 6)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                "l_linenumber": batch["l_linenumber"].cast(pa.int64()),
                "y_usd": pa.array(yi.astype(np.int64), type=pa.int64()),
                "pred_usd": pa.array(pred, type=pa.float64()),
                "resid_usd": pa.array(sql_round(yi - pred, 6), type=pa.float64()),
            }
        )

    return _read_xy(sf_dir).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ols_predict(sf_dir: str) -> pa.Table:
    import ray

    parts = [ray.get(r) for r in ols_predict_ds(sf_dir).to_arrow_refs()]
    return pa.concat_tables([p for p in parts if p.num_rows]).sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )


def ols_predict_to_parquet(sf_dir: str, out_dir: str) -> str:
    from .textstats import write_dataset

    return write_dataset(ols_predict_ds(sf_dir), out_dir)


def inference_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``inference`` pipeline aggregation (x-pack): apply a trained
    model to the PARENT aggregation's buckets, adding a prediction field
    per bucket.  Graft: parent = terms buckets over ``l_returnflag`` with
    the per-bucket mean quantity as the feature; model = the closed-form
    OLS of ``ols_fit`` (the deterministic member of ES's regression
    family); inference = slope·avg_qty + intercept per bucket.

    Like every pipeline agg, ES runs the model on the coordinator over
    the reduced buckets — here that is (slope, intercept) × #buckets
    scalar math; the distributed work is the bucket partials and the
    moment pass, both single streamed ``map_batches`` reductions.  The
    feature average divides exact integer-unit sums so the bucket values
    are bit-stable against the SQL oracle at any parallelism."""
    import ray

    def bucket_partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["l_quantity"], dtype=np.float64)
        xi = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        t = pa.table({"flag": batch["l_returnflag"], "q": pa.array(xi)})
        g = t.group_by("flag").aggregate([("q", "sum"), ("q", "count")])
        return pa.table(
            {
                "flag": g["flag"],
                "sq": g["q_sum"].cast(pa.int64()),
                "n": g["q_count"].cast(pa.int64()),
            }
        )

    import ray.data as rd

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_returnflag", "l_quantity"],
            )
            .map_batches(bucket_partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    g = parts.group_by("flag").aggregate([("sq", "sum"), ("n", "sum")])
    n_m, sx, sy, sxx, sxy, syy = _moments(sf_dir)
    slope, intercept, _ = _closed_form(n_m, sx, sy, sxx, sxy, syy)
    sq = g["sq_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    nb = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    avg = sq / nb
    return pa.table(
        {
            "l_returnflag": g["flag"],
            "n": g["n_sum"].cast(pa.int64()),
            "avg_qty": pa.array(sql_round(avg, round_decimals), type=pa.float64()),
            "pred_usd": pa.array(
                sql_round(slope * avg + intercept, round_decimals),
                type=pa.float64(),
            ),
        }
    ).sort_by("l_returnflag")
