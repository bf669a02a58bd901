"""Geo queries/aggs (ES geo_distance / geo_bounding_box / geo_centroid /
geotile_grid) over the derived deterministic customer geo_point."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.pipelines.geo import (
    MAX_MERCATOR_LAT,
    derive_coords,
    geo_bounding_box,
    geo_centroid,
    geo_distance,
    geotile_grid,
    geotile_xy,
    haversine_km,
)

SF_DIR = "/root/testdata/sf0.001"


def _custkeys() -> np.ndarray:
    t = pq.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    return np.asarray(t["c_custkey"], dtype=np.int64)


def test_derive_coords_in_range():
    lat, lon = derive_coords(_custkeys())
    assert lat.min() >= -90 and lat.max() < 90
    assert lon.min() >= -180 and lon.max() < 180


def test_haversine_known_values():
    # identical points → 0; antipodal on the equator → half circumference
    assert haversine_km(np.array([10.0]), np.array([20.0]), 10.0, 20.0)[0] == 0.0
    half = haversine_km(np.array([0.0]), np.array([180.0]), 0.0, 0.0)[0]
    assert abs(half - math.pi * 6371.0) < 1e-6


def test_geo_distance_matches_bruteforce(ray_session):
    out = geo_distance(SF_DIR, lat0=10.0, lon0=20.0, radius_km=4000.0)
    keys = _custkeys()
    lat, lon = derive_coords(keys)
    d = haversine_km(lat, lon, 10.0, 20.0)
    want = np.sort(keys[d <= 4000.0])
    got = np.asarray(out["c_custkey"], dtype=np.int64)
    assert np.array_equal(got, want)
    assert float(out["dist_km"].to_pandas().max()) <= 4000.0


def test_geo_distance_empty(ray_session):
    out = geo_distance(SF_DIR, radius_km=-1.0)
    assert out.num_rows == 0
    assert out.column_names == ["c_custkey", "dist_km"]


def test_geo_bbox_matches_bruteforce(ray_session):
    out = geo_bounding_box(SF_DIR, top=30.0, left=-40.0, bottom=-30.0, right=40.0)
    keys = _custkeys()
    lat, lon = derive_coords(keys)
    m = (lat >= -30.0) & (lat <= 30.0) & (lon >= -40.0) & (lon <= 40.0)
    assert np.array_equal(np.asarray(out["c_custkey"], dtype=np.int64), np.sort(keys[m]))


def test_geo_centroid_matches_bruteforce(ray_session):
    import pandas as pd

    out = geo_centroid(SF_DIR).to_pandas().set_index("c_mktsegment")
    t = pq.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    df = t.to_pandas()
    lat, lon = derive_coords(df["c_custkey"].to_numpy())
    df["lat"], df["lon"] = lat, lon
    g = df.groupby("c_mktsegment")
    want = pd.DataFrame(
        {"n": g.size(), "lat_centroid": g["lat"].mean(), "lon_centroid": g["lon"].mean()}
    )
    assert (out["n"] == want["n"]).all()
    assert np.allclose(out["lat_centroid"], want["lat_centroid"], atol=1e-6)
    assert np.allclose(out["lon_centroid"], want["lon_centroid"], atol=1e-6)


def test_geotile_xy_clamps_poles():
    x, y = geotile_xy(np.array([89.9, -89.9]), np.array([0.0, 0.0]), zoom=3)
    assert y[0] == 0 and y[1] == 7  # clamped to the mercator band edges
    assert (x == 4).all()


@pytest.mark.parametrize("zoom", [0, 2])
def test_geotile_grid_total_and_keys(ray_session, zoom):
    out = geotile_grid(SF_DIR, zoom=zoom)
    assert int(out["n"].to_pandas().sum()) == len(_custkeys())
    for k in out["tile"].to_pylist():
        z, x, y = (int(p) for p in k.split("/"))
        assert z == zoom and 0 <= x < (1 << zoom) and 0 <= y < (1 << zoom)


def test_geohash_grid_reference_encoder(ray_session):
    """Engine geohash cells match a per-point reference geohash encoder."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.geo import derive_coords, geohash_grid

    sf = "/root/testdata/sf0.001"
    t = geohash_grid(sf, precision=2)

    def ref_geohash(lat, lon, precision=2):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
        bits, even, ch, out = 0, True, 0, ""
        while len(out) < precision:
            if even:
                mid = (lon_rng[0] + lon_rng[1]) / 2
                if lon >= mid:
                    ch = (ch << 1) | 1
                    lon_rng[0] = mid
                else:
                    ch <<= 1
                    lon_rng[1] = mid
            else:
                mid = (lat_rng[0] + lat_rng[1]) / 2
                if lat >= mid:
                    ch = (ch << 1) | 1
                    lat_rng[0] = mid
                else:
                    ch <<= 1
                    lat_rng[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out += b32[ch]
                bits, ch = 0, 0
        return out

    cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
    lat, lon = derive_coords(np.asarray(cust["c_custkey"], dtype=np.int64))
    import collections

    want = collections.Counter(
        ref_geohash(la, lo) for la, lo in zip(lat.tolist(), lon.tolist())
    )
    got = dict(zip(t["geohash"].to_pylist(), t["doc_count"].to_pylist()))
    assert got == dict(want)


def test_search_mvt_layers(ray_session):
    """_search_mvt rows: hits layer = lowest custkeys in the tile, aggs
    cells tile the hit set, meta totals agree — brute-forced from the
    coordinate derivation."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.geo import (
        derive_coords,
        geotile_xy,
        search_mvt,
    )

    t = search_mvt(SF_DIR, zoom=3, x=4, y=3, grid_precision=4, size=10)
    df = t.to_pandas()
    hits = df[df.layer == "hits"]
    aggs = df[df.layer == "aggs"]
    meta = df[df.layer == "meta"].iloc[0]

    import pyarrow.parquet as pq_

    keys = np.asarray(
        pq_.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
        ["c_custkey"]
    )
    lat, lon = derive_coords(keys)
    cx, cy = geotile_xy(lat, lon, 7)
    m = (cx >> 4 == 4) & (cy >> 4 == 3)
    expect_hits = sorted(keys[m].tolist())[:10]
    assert sorted(int(k) for k in hits["key"]) == sorted(expect_hits)
    assert int(meta["doc_count"]) == int(m.sum())
    assert int(aggs["doc_count"].sum()) == int(m.sum())
    assert meta["key"] == "3/4/3"
    # every aggs cell is inside the parent tile
    for k in aggs["key"]:
        z, xx, yy = (int(p) for p in k.split("/"))
        assert z == 7 and xx >> 4 == 4 and yy >> 4 == 3


def test_cartesian_agg_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from bitcoin_ledger_2es_ray.pipelines.geo import cartesian_agg

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    mine = cartesian_agg(SF_DIR).to_pandas().reset_index(drop=True)
    orc = con.sql(
        """
        WITH pts AS (
          SELECT c_mktsegment,
                 ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS x,
                 ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS y
          FROM customer)
        SELECT c_mktsegment, count(*)::BIGINT AS n,
               round(sum(x) / count(*), 6) AS centroid_x,
               round(sum(y) / count(*), 6) AS centroid_y,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM pts GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    assert (mine["min_x"] <= mine["centroid_x"]).all()
    assert (mine["centroid_x"] <= mine["max_x"]).all()


def test_hex_cell_brute_force():
    """Cube rounding invariant: every point maps to the NEAREST hex center
    (axial distance), verified against an exhaustive center scan."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.geo import derive_coords, hex_cell

    rng = np.arange(1, 400, dtype=np.int64)
    lat, lon = derive_coords(rng)
    s = 30.0
    q, r = hex_cell(lat, lon, s)
    # cube coordinates must satisfy x + y + z == 0 by construction
    # (rounding fixes exactly one axis); check hex-metric nearest center
    qf = (np.sqrt(3.0) / 3.0 * lon - lat / 3.0) / s
    rf = (2.0 / 3.0 * lat) / s
    for i in range(0, len(rng), 37):
        best, bd = None, 1e18
        for cq in range(int(qf[i]) - 2, int(qf[i]) + 3):
            for cr in range(int(rf[i]) - 2, int(rf[i]) + 3):
                dq, dr = qf[i] - cq, rf[i] - cr
                d = (abs(dq) + abs(dr) + abs(dq + dr)) / 2.0  # hex distance
                if d < bd - 1e-12:
                    bd, best = d, (cq, cr)
        assert (int(q[i]), int(r[i])) == best, i


def test_geohex_grid_counts(ray_session):
    import duckdb

    from bitcoin_ledger_2es_ray.pipelines.geo import geohex_grid

    got = geohex_grid("/root/testdata/sf0.001", size_deg=30.0)
    con = duckdb.connect()
    n_cust = con.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/customer.parquet')"
    ).fetchone()[0]
    assert int(sum(got["n"].to_pylist())) == n_cust  # cells tile the plane
    ns = got["n"].to_pylist()
    assert ns == sorted(ns, reverse=True) or len(set(ns)) < len(ns)


def test_hex_cell_property_nearest_center():
    """Hypothesis: hex_cell always returns the axial cell whose center is
    nearest in hex metric (ties aside), for arbitrary lat/lon and sizes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitcoin_ledger_2es_ray.pipelines.geo import hex_cell

    @settings(max_examples=80, deadline=None)
    @given(
        lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
        lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
        size=st.sampled_from([5.0, 15.0, 30.0, 45.0]),
    )
    def check(lat, lon, size):
        la = np.array([lat]); lo = np.array([lon])
        q, r = hex_cell(la, lo, size)
        qf = float((np.sqrt(3.0) / 3.0 * lo - la / 3.0) / size)
        rf = float((2.0 / 3.0 * la) / size)
        dq, dr = qf - q[0], rf - r[0]
        mine = (abs(dq) + abs(dr) + abs(dq + dr)) / 2.0
        for cq in range(int(qf) - 2, int(qf) + 3):
            for cr in range(int(rf) - 2, int(rf) + 3):
                d = (abs(qf - cq) + abs(rf - cr) + abs(qf - cq + rf - cr)) / 2.0
                assert mine <= d + 1e-9, (lat, lon, size, (cq, cr))

    check()
