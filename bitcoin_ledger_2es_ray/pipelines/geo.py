"""ES geo queries / aggregations over derived customer coordinates.

Elasticsearch's geo family (`geo_distance` / `geo_bounding_box` queries,
`geo_centroid` / `geotile_grid` aggregations) operates on an indexed
`geo_point` field.  The test tables carry no coordinates, so a
deterministic synthetic `geo_point` is DERIVED from `c_custkey` with pure
int64 arithmetic that a DuckDB oracle mirrors exactly:

    lat = ((c_custkey * 7919)   % 18000) / 100.0 -  90.0
    lon = ((c_custkey * 104729) % 36000) / 100.0 - 180.0

Integer multiply/modulo are exact; the division/subtraction are the same
IEEE-754 double ops on both sides, so the derived coordinates are
bit-identical between the Ray pipeline and the SQL oracle.

Plans (100-TB shape): every operator is a single streamed scan of the
customer table with only the needed columns leaving storage; per-batch
Arrow/numpy partials reduce to (bucket, partial) rows BEFORE any shuffle
(`geo_centroid`, `geotile_grid`), and the filters (`geo_distance`,
`geo_bounding_box`) are embarrassingly parallel map_batches masks — no
shuffle at all.  The driver-side combine is bounded by the bucket count
(market segments / 4^zoom tiles), never the row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.bm25 import sql_round

EARTH_RADIUS_KM = 6371.0
# Web-Mercator latitude clamp (ES geotile_grid uses the same bound).
MAX_MERCATOR_LAT = 85.05112877980659


def derive_coords(custkey: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The deterministic synthetic geo_point (see module docstring)."""
    k = custkey.astype(np.int64)
    lat = ((k * 7919) % 18000) / 100.0 - 90.0
    lon = ((k * 104729) % 36000) / 100.0 - 180.0
    return lat, lon


def _read_customers(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/customer.parquet", columns=columns)


def _collect(ds) -> list[pa.Table]:
    import ray

    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    return [p for p in parts if p.num_rows]


def haversine_km(
    lat: np.ndarray, lon: np.ndarray, lat0: float, lon0: float
) -> np.ndarray:
    """Great-circle distance; op order mirrored verbatim in the SQL oracle."""
    rlat, rlon = np.radians(lat), np.radians(lon)
    rlat0, rlon0 = np.radians(lat0), np.radians(lon0)
    a = (
        np.sin((rlat - rlat0) / 2.0) ** 2
        + np.cos(rlat0) * np.cos(rlat) * np.sin((rlon - rlon0) / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def geo_distance(
    sf_dir: str,
    lat0: float = 0.0,
    lon0: float = 0.0,
    radius_km: float = 3000.0,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``geo_distance`` query: customers within ``radius_km`` of the
    origin → (c_custkey, dist_km), sorted by key.  Pure map-side filter —
    streams at any scale."""

    def within(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        d = haversine_km(lat, lon, lat0, lon0)
        m = d <= radius_km
        return pa.table(
            {
                "c_custkey": pa.array(key[m]),
                "dist_km": pa.array(sql_round(d[m], round_decimals)),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        within, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = _collect(ds)
    if not parts:
        return pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "dist_km": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(parts).sort_by("c_custkey")


def geo_bounding_box(
    sf_dir: str,
    top: float = 50.0,
    left: float = -60.0,
    bottom: float = -50.0,
    right: float = 60.0,
) -> pa.Table:
    """ES ``geo_bounding_box`` query (edges inclusive, ES semantics) →
    (c_custkey, lat, lon), sorted by key."""

    def inside(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        m = (lat >= bottom) & (lat <= top) & (lon >= left) & (lon <= right)
        return pa.table(
            {
                "c_custkey": pa.array(key[m]),
                "lat": pa.array(lat[m]),
                "lon": pa.array(lon[m]),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        inside, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = _collect(ds)
    if not parts:
        return pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "lat": pa.array([], type=pa.float64()),
                "lon": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(parts).sort_by("c_custkey")


def geo_centroid(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``geo_centroid`` agg bucketed by market segment →
    (c_mktsegment, n, lat_centroid, lon_centroid).  Per-batch (Σlat, Σlon,
    n) partials; the shuffle moves one row per (segment × batch)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "lat": pa.array(lat),
                "lon": pa.array(lon),
            }
        )
        g = t.group_by("c_mktsegment").aggregate(
            [("lat", "sum"), ("lon", "sum"), ("lat", "count")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "slat": g["lat_sum"],
                "slon": g["lon_sum"],
                "n": g["lat_count"].cast(pa.int64()),
            }
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("slat", alias_name="slat"),
            Sum("slon", alias_name="slon"),
            Sum("n", alias_name="n"),
        )
    )
    t = pa.concat_tables(_collect(ds))
    n = np.asarray(t["n"], dtype=np.float64)
    return pa.table(
        {
            "c_mktsegment": t["c_mktsegment"],
            "n": t["n"].cast(pa.int64()),
            "lat_centroid": pa.array(
                sql_round(np.asarray(t["slat"], dtype=np.float64) / n, round_decimals)
            ),
            "lon_centroid": pa.array(
                sql_round(np.asarray(t["slon"], dtype=np.float64) / n, round_decimals)
            ),
        }
    ).sort_by("c_mktsegment")


def geotile_xy(
    lat: np.ndarray, lon: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator tile coordinates (the ES ``geotile_grid`` key scheme)."""
    n = float(1 << zoom)
    x = np.floor((lon + 180.0) / 360.0 * n)
    latc = np.clip(lat, -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    r = np.radians(latc)
    y = np.floor((1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n)
    lim = (1 << zoom) - 1
    return (
        np.clip(x, 0, lim).astype(np.int64),
        np.clip(y, 0, lim).astype(np.int64),
    )


def geotile_grid(sf_dir: str, zoom: int = 3) -> pa.Table:
    """ES ``geotile_grid`` agg → ("z/x/y" tile key, doc count), count DESC
    then key ASC (ES bucket order).  Per-batch tile-count partials; the
    shuffle is bounded by 4^zoom buckets."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        x, y = geotile_xy(lat, lon, zoom)
        t = pa.table({"x": pa.array(x), "y": pa.array(y)})
        g = t.group_by(["x", "y"]).aggregate([("x", "count")])
        return pa.table(
            {"x": g["x"], "y": g["y"], "n": g["x_count"].cast(pa.int64())}
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["x", "y"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = pa.concat_tables(_collect(ds))
    keys = [
        f"{zoom}/{x}/{y}"
        for x, y in zip(t["x"].to_pylist(), t["y"].to_pylist())
    ]
    out = pa.table({"tile": pa.array(keys, type=pa.string()), "n": t["n"].cast(pa.int64())})
    return out.sort_by([("n", "descending"), ("tile", "ascending")])


def geo_distance_agg(
    sf_dir: str,
    lat0: float = 0.0,
    lon0: float = 0.0,
    edges: tuple[float, ...] = (2500.0, 5000.0, 10000.0),
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``geo_distance`` aggregation: distance-ring buckets from the
    origin (from-inclusive / to-exclusive, ES range semantics, `*-2500`
    style labels) with doc_count and an avg(c_acctbal) sub-metric.

    Per-batch partials (bucket, n, Σacctbal) — the combine is bounded by
    len(edges)+1 rings, never customers."""
    from ray.data.aggregate import Sum

    cuts = np.asarray(sorted(edges), dtype=np.float64)

    def _label(i: int) -> str:
        lo = "*" if i == 0 else f"{cuts[i - 1]:g}"
        hi = "*" if i == len(cuts) else f"{cuts[i]:g}"
        return f"{lo}-{hi}"

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        d = haversine_km(lat, lon, lat0, lon0)
        ring = np.searchsorted(cuts, d, side="right")
        bal = np.asarray(batch["c_acctbal"], dtype=np.float64)
        t = pa.table({"ring": pa.array(ring.astype(np.int64)), "bal": pa.array(bal)})
        g = t.group_by("ring").aggregate([("bal", "count"), ("bal", "sum")])
        return pa.table(
            {
                "ring": g["ring"],
                "n": g["bal_count"].cast(pa.int64()),
                "s": g["bal_sum"],
            }
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ring")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )
    t = pa.concat_tables(_collect(ds)).sort_by("ring")
    n = np.asarray(t["n"], dtype=np.float64)
    s = np.asarray(t["s"], dtype=np.float64)
    return pa.table(
        {
            "ring": pa.array([_label(int(i)) for i in t["ring"].to_pylist()], type=pa.string()),
            "doc_count": t["n"].cast(pa.int64()),
            "avg_acctbal": pa.array(sql_round(s / n, round_decimals), type=pa.float64()),
        }
    )


def geo_bounds_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``geo_bounds`` aggregation bucketed by market segment: the
    smallest lat/lon box containing every point — (segment, top [max
    lat], bottom [min lat], left [min lon], right [max lon]),
    ``wrap_longitude=false`` semantics (plain min/max, no dateline
    wrapping).  Per-batch (min, max) partials per segment; the shuffle
    moves 4 numbers per (segment × batch)."""
    from ray.data.aggregate import Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "lat": pa.array(lat),
                "lon": pa.array(lon),
            }
        )
        g = t.group_by("c_mktsegment").aggregate(
            [("lat", "min"), ("lat", "max"), ("lon", "min"), ("lon", "max")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "lat_mn": g["lat_min"],
                "lat_mx": g["lat_max"],
                "lon_mn": g["lon_min"],
                "lon_mx": g["lon_max"],
            }
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Min("lat_mn", alias_name="lat_mn"),
            Max("lat_mx", alias_name="lat_mx"),
            Min("lon_mn", alias_name="lon_mn"),
            Max("lon_mx", alias_name="lon_mx"),
        )
    )
    t = pa.concat_tables(_collect(ds))
    r = lambda col: pa.array(  # noqa: E731
        sql_round(np.asarray(t[col], dtype=np.float64), round_decimals),
        type=pa.float64(),
    )
    return pa.table(
        {
            "c_mktsegment": t["c_mktsegment"],
            "top": r("lat_mx"),
            "bottom": r("lat_mn"),
            "left": r("lon_mn"),
            "right": r("lon_mx"),
        }
    ).sort_by("c_mktsegment")


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: np.ndarray, lon: np.ndarray, precision: int) -> list[str]:
    """Vectorized geohash (base-32, lon in the even bit slots from the
    MSB — the standard interleave).  Closed-form integer arithmetic so
    SQL oracles can mirror it bit-for-bit without a geohash library."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = np.minimum(
        ((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64),
        (1 << lon_bits) - 1,
    )
    y = np.minimum(
        ((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64),
        (1 << lat_bits) - 1,
    )
    v = np.zeros(len(x), dtype=np.int64)
    xi, yi = lon_bits, lat_bits
    for b in range(bits - 1, -1, -1):
        if (bits - 1 - b) % 2 == 0:  # even slot from MSB -> lon
            xi -= 1
            v |= ((x >> xi) & 1) << b
        else:
            yi -= 1
            v |= ((y >> yi) & 1) << b
    # vectorized base32 render: one fancy-index + add per char slot
    chars = np.array(list(_BASE32))
    s = chars[(v >> (5 * (precision - 1))) & 31]
    for c in range(precision - 2, -1, -1):
        s = np.char.add(s, chars[(v >> (5 * c)) & 31])
    return s.tolist()


def geohash_grid(sf_dir: str, precision: int = 2) -> pa.Table:
    """ES ``geohash_grid`` aggregation over the derived geo_point:
    (geohash, doc_count) at the given precision (base-32 chars; 5 bits
    each, lon takes the even bit slots from the MSB — the standard
    geohash interleave).  Per-batch cell-count partials; the shuffle is
    bounded by 32^precision buckets.

    The cell math is closed-form integer arithmetic (floor-scale each
    axis to its bit budget, interleave) so the DuckDB oracle can mirror
    it bit-for-bit without a geohash library."""
    def encode(lat: np.ndarray, lon: np.ndarray) -> list[str]:
        return geohash_encode(lat, lon, precision)

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        t = pa.table({"geohash": pa.array(encode(lat, lon), type=pa.string())})
        g = t.group_by("geohash").aggregate([("geohash", "count")])
        return pa.table(
            {"geohash": g["geohash"], "n": g["geohash_count"].cast(pa.int64())}
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    t = pa.concat_tables(_collect(ds))
    g = t.group_by("geohash").aggregate([("n", "sum")])
    return pa.table(
        {"geohash": g["geohash"], "doc_count": g["n_sum"].cast(pa.int64())}
    ).sort_by("geohash")


def geo_line_agg(sf_dir: str, size: int = 5, round_decimals: int = 6) -> pa.Table:
    """ES ``geo_line`` aggregation bucketed by market segment: the
    geo_points of the top-``size`` customers by (acctbal DESC, custkey
    ASC) joined into a LineString-style ``"lat,lon lat,lon ..."`` path
    (deterministic text stand-in for the geojson payload).  Per-batch
    partial top-``size`` per segment (sort + run-rank), driver merge
    bounded by segments × batches × size."""

    def partial(batch: pa.Table) -> pa.Table:
        seg = np.asarray(batch["c_mktsegment"].combine_chunks().cast(pa.string()))
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        bal = np.asarray(batch["c_acctbal"], dtype=np.float64)
        order = np.lexsort((key, -bal, seg))
        seg_s, key_s, bal_s = seg[order], key[order], bal[order]
        # per-segment run rank over the (seg, -bal, key)-sorted rows
        new = np.concatenate(([True], seg_s[1:] != seg_s[:-1]))
        run_start = np.maximum.accumulate(np.where(new, np.arange(len(seg_s)), 0))
        rank = np.arange(len(seg_s)) - run_start
        keep = rank < size
        return pa.table(
            {
                "c_mktsegment": pa.array(seg_s[keep], type=pa.string()),
                "c_custkey": pa.array(key_s[keep], type=pa.int64()),
                "c_acctbal": pa.array(bal_s[keep], type=pa.float64()),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cat = pa.concat_tables(_collect(ds))
    seg = np.asarray(cat["c_mktsegment"].combine_chunks().cast(pa.string()))
    key = np.asarray(cat["c_custkey"], dtype=np.int64)
    bal = np.asarray(cat["c_acctbal"], dtype=np.float64)
    order = np.lexsort((key, -bal, seg))
    seg, key = seg[order], key[order]
    new = np.concatenate(([True], seg[1:] != seg[:-1]))
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(seg)), 0))
    rank = np.arange(len(seg)) - run_start
    keep = rank < size
    seg, key = seg[keep], key[keep]
    lat, lon = derive_coords(key)
    lat = sql_round(lat, round_decimals)
    lon = sql_round(lon, round_decimals)
    segments, lines, npts = [], [], []
    # the per-segment join loop runs over segments x size rows (tiny)
    cur, parts = None, []
    for s, la, lo in zip(seg.tolist(), lat.tolist(), lon.tolist()):
        if s != cur:
            if cur is not None:
                segments.append(cur)
                lines.append(" ".join(parts))
                npts.append(len(parts))
            cur, parts = s, []
        parts.append(f"{la},{lo}")
    if cur is not None:
        segments.append(cur)
        lines.append(" ".join(parts))
        npts.append(len(parts))
    return pa.table(
        {
            "c_mktsegment": pa.array(segments, type=pa.string()),
            "n_points": pa.array(npts, type=pa.int64()),
            "line": pa.array(lines, type=pa.string()),
        }
    ).sort_by("c_mktsegment")


def geo_polygon(
    sf_dir: str, polygon: list[tuple[float, float]]
) -> pa.Table:
    """ES ``geo_polygon`` query (CONVEX polygons, counter-clockwise
    vertex order): customers whose derived point lies inside — every
    edge's cross product ≥ 0 (boundary inclusive).  Pure map-side filter
    (half-plane tests, one vectorized pass per edge); the same sign
    arithmetic is mirrored by the SQL oracle."""
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")

    def inside(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        m = np.ones(len(key), dtype=bool)
        for (lat1, lon1), (lat2, lon2) in zip(polygon, polygon[1:] + polygon[:1]):
            cross = (lon2 - lon1) * (lat - lat1) - (lat2 - lat1) * (lon - lon1)
            m &= cross >= 0.0
        return pa.table(
            {
                "c_custkey": pa.array(key[m]),
                "lat": pa.array(lat[m]),
                "lon": pa.array(lon[m]),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        inside, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = _collect(ds)
    if not parts:
        return pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "lat": pa.array([], type=pa.float64()),
                "lon": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(parts).sort_by("c_custkey")


def geo_shape_envelope(
    sf_dir: str,
    box: tuple[float, float, float, float] = (-30.0, 40.0, -60.0, 80.0),
) -> pa.Table:
    """ES ``geo_shape`` query over indexed envelope shapes, all four
    spatial relations at once: each customer carries a derived RECTANGLE
    (center = the synthetic geo_point, half-extents from more exact int64
    arithmetic so the oracle mirrors bit-for-bit), and the query box
    evaluates ``intersects`` / ``disjoint`` / ``within`` / ``contains``
    with pure interval arithmetic → (relation, doc_count, custkey_sum).

    ``custkey_sum`` is the exact int64 membership checksum — the gate
    verifies WHICH shapes matched, not just how many.  Envelopes here
    don't wrap the dateline (ES's do; the corpus derivation never crosses
    it, so the simplification is exact for this data).  One streamed scan,
    per-batch (relation, n, Σkey) partials, no shuffle."""
    import ray

    lat_lo, lat_hi, lon_lo, lon_hi = box

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(k)
        dlat = ((k * 31) % 500) / 100.0
        dlon = ((k * 53) % 1000) / 100.0
        r_lat_lo, r_lat_hi = lat - dlat, lat + dlat
        r_lon_lo, r_lon_hi = lon - dlon, lon + dlon
        inter = (
            (r_lat_lo <= lat_hi)
            & (r_lat_hi >= lat_lo)
            & (r_lon_lo <= lon_hi)
            & (r_lon_hi >= lon_lo)
        )
        within = (
            (r_lat_lo >= lat_lo)
            & (r_lat_hi <= lat_hi)
            & (r_lon_lo >= lon_lo)
            & (r_lon_hi <= lon_hi)
        )
        contains = (
            (r_lat_lo <= lat_lo)
            & (r_lat_hi >= lat_hi)
            & (r_lon_lo <= lon_lo)
            & (r_lon_hi >= lon_hi)
        )
        rel = {
            "contains": contains,
            "disjoint": ~inter,
            "intersects": inter,
            "within": within,
        }
        return pa.table(
            {
                "relation": pa.array(list(rel), type=pa.string()),
                "n": pa.array([int(m.sum()) for m in rel.values()], type=pa.int64()),
                "s": pa.array(
                    [int(k[m].sum()) for m in rel.values()], type=pa.int64()
                ),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cat = pa.concat_tables(_collect(ds))
    g = (
        cat.group_by("relation")
        .aggregate([("n", "sum"), ("s", "sum")])
        .sort_by("relation")
    )
    return pa.table(
        {
            "relation": g["relation"],
            "doc_count": g["n_sum"].cast(pa.int64()),
            "custkey_sum": g["s_sum"].cast(pa.int64()),
        }
    )


def geo_sort_topk(
    sf_dir: str,
    lat0: float = 0.0,
    lon0: float = 0.0,
    k: int = 25,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``sort`` by ``_geo_distance``: the ``k`` customers nearest the
    origin → (rank, c_custkey, dist_km), ranked (rounded distance ASC,
    key ASC — ES's doc tiebreaker).

    Per-batch partial top-k (each batch emits its own k nearest), driver
    merge bounded by k × #blocks — the sort never sees the corpus."""

    def nearest(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        d = sql_round(haversine_km(lat, lon, lat0, lon0), round_decimals)
        order = np.lexsort((key, d))[:k]
        return pa.table(
            {
                "c_custkey": pa.array(key[order]),
                "dist_km": pa.array(d[order]),
            }
        )

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        nearest, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = _collect(ds)
    if not parts:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "c_custkey": pa.array([], type=pa.int64()),
                "dist_km": pa.array([], type=pa.float64()),
            }
        )
    cat = pa.concat_tables(parts)
    key = np.asarray(cat["c_custkey"], dtype=np.int64)
    d = np.asarray(cat["dist_km"], dtype=np.float64)
    order = np.lexsort((key, d))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
            "c_custkey": pa.array(key[order], type=pa.int64()),
            "dist_km": pa.array(d[order], type=pa.float64()),
        }
    )


def search_mvt(
    sf_dir: str,
    zoom: int = 3,
    x: int = 4,
    y: int = 3,
    grid_precision: int = 4,
    size: int = 10,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``_search_mvt/{index}/{field}/{z}/{x}/{y}`` grafted as ROWS (the
    engine has no protobuf tile encoder — the three MVT layers come back
    as one deterministic table):

    - ``hits``  — the ``size`` lowest-custkey points inside the tile (ES
      returns top hits per tile), key = custkey, with the point coords;
    - ``aggs``  — the geotile cells at ``zoom + grid_precision`` inside
      the tile (ES's gridded layer), key = "z/x/y", doc_count + mean
      coords (centroid sub-agg);
    - ``meta``  — one row: the tile key, total doc_count, and the tile's
      west/south bounds in the coord columns.

    Tile membership is the INTEGER geotile index compare (the SQL oracle
    mirrors it bit-for-bit) — never float bbox edges.  One streamed pass:
    per-batch partial top-k for hits (k × #blocks driver merge), bounded
    cell-count partials for the grid, scalar totals.  The tile filter
    can't push to parquet (coords are derived), so the stream filters
    per batch — at 100 TB the corpus would carry materialized coord
    columns and this becomes a row-group predicate."""
    import pyarrow.compute as pc

    cz = zoom + grid_precision
    shift = grid_precision

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        cx, cy = geotile_xy(lat, lon, cz)
        m = (cx >> shift == x) & (cy >> shift == y)
        key, lat, lon, cx, cy = key[m], lat[m], lon[m], cx[m], cy[m]
        rows: dict[str, list] = {
            "layer": [], "key": [], "doc_count": [], "lat": [], "lon": [],
        }
        order = np.argsort(key, kind="stable")[:size]
        for i in order:
            rows["layer"].append("hits")
            rows["key"].append(str(int(key[i])))
            rows["doc_count"].append(1)
            rows["lat"].append(float(lat[i]))
            rows["lon"].append(float(lon[i]))
        if len(key):
            t = pa.table({"cx": cx, "cy": cy, "lat": lat, "lon": lon})
            g = t.group_by(["cx", "cy"]).aggregate(
                [("lat", "count"), ("lat", "sum"), ("lon", "sum")]
            )
            for r in g.to_pylist():
                rows["layer"].append("aggs")
                rows["key"].append(f"{cz}/{r['cx']}/{r['cy']}")
                rows["doc_count"].append(int(r["lat_count"]))
                rows["lat"].append(float(r["lat_sum"]))
                rows["lon"].append(float(r["lon_sum"]))
        return pa.table(
            {
                "layer": pa.array(rows["layer"], type=pa.string()),
                "key": pa.array(rows["key"], type=pa.string()),
                "doc_count": pa.array(rows["doc_count"], type=pa.int64()),
                "lat": pa.array(rows["lat"], type=pa.float64()),
                "lon": pa.array(rows["lon"], type=pa.float64()),
            }
        )

    from ..functions.blocks import collect_tables

    ds = _read_customers(sf_dir, ["c_custkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = collect_tables(ds)
    out_rows: list[dict] = []
    total = 0
    if parts:
        cat = pa.concat_tables(parts)
        hits = cat.filter(pc.equal(cat["layer"], "hits"))
        hk = np.asarray([int(s) for s in hits["key"].to_pylist()], dtype=np.int64)
        order = np.argsort(hk, kind="stable")[:size]
        for i in order:
            out_rows.append(
                {
                    "layer": "hits",
                    "key": str(int(hk[i])),
                    "doc_count": 1,
                    "lat": float(
                        sql_round(hits["lat"][int(i)].as_py(), round_decimals)
                    ),
                    "lon": float(
                        sql_round(hits["lon"][int(i)].as_py(), round_decimals)
                    ),
                }
            )
        aggs = cat.filter(pc.equal(cat["layer"], "aggs"))
        g = aggs.group_by("key").aggregate(
            [("doc_count", "sum"), ("lat", "sum"), ("lon", "sum")]
        )
        for r in sorted(g.to_pylist(), key=lambda r: r["key"]):
            n = int(r["doc_count_sum"])
            total += n
            out_rows.append(
                {
                    "layer": "aggs",
                    "key": r["key"],
                    "doc_count": n,
                    "lat": float(sql_round(r["lat_sum"] / n, round_decimals)),
                    "lon": float(sql_round(r["lon_sum"] / n, round_decimals)),
                }
            )
    west = x / float(1 << zoom) * 360.0 - 180.0
    south = float(
        np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1) / (1 << zoom)))))
    )
    out_rows.append(
        {
            "layer": "meta",
            "key": f"{zoom}/{x}/{y}",
            "doc_count": total,
            "lat": float(sql_round(south, round_decimals)),
            "lon": float(sql_round(west, round_decimals)),
        }
    )
    out_rows.sort(key=lambda r: (r["layer"], r["key"]))
    return pa.table(
        {
            "layer": pa.array([r["layer"] for r in out_rows], type=pa.string()),
            "key": pa.array([r["key"] for r in out_rows], type=pa.string()),
            "doc_count": pa.array(
                [r["doc_count"] for r in out_rows], type=pa.int64()
            ),
            "lat": pa.array([r["lat"] for r in out_rows], type=pa.float64()),
            "lon": pa.array([r["lon"] for r in out_rows], type=pa.float64()),
        }
    )


def cartesian_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``cartesian_bounds`` + ``cartesian_centroid`` aggregations in one
    pass, bucketed by market segment.  The derived point is read as a
    PLANAR (x, y) — no mercator clamp, no sphere — which is exactly the
    cartesian family's contract; one streamed scan emits per-batch
    (segment, n, Σx, Σy, min/max x, min/max y) partials and the driver
    combine is bounded by the segment count."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "x": pa.array(lon),
                "y": pa.array(lat),
            }
        )
        g = t.group_by("c_mktsegment").aggregate(
            [
                ("x", "count"), ("x", "sum"), ("y", "sum"),
                ("x", "min"), ("x", "max"), ("y", "min"), ("y", "max"),
            ]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "n": g["x_count"].cast(pa.int64()),
                "sx": g["x_sum"], "sy": g["y_sum"],
                "x0": g["x_min"], "x1": g["x_max"],
                "y0": g["y_min"], "y1": g["y_max"],
            }
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
            Min("x0", alias_name="x0"), Max("x1", alias_name="x1"),
            Min("y0", alias_name="y0"), Max("y1", alias_name="y1"),
        )
    )
    t = pa.concat_tables(_collect(ds))
    n = np.asarray(t["n"], dtype=np.float64)
    return pa.table(
        {
            "c_mktsegment": t["c_mktsegment"],
            "n": t["n"].cast(pa.int64()),
            "centroid_x": pa.array(
                sql_round(np.asarray(t["sx"], dtype=np.float64) / n, round_decimals)
            ),
            "centroid_y": pa.array(
                sql_round(np.asarray(t["sy"], dtype=np.float64) / n, round_decimals)
            ),
            "min_x": t["x0"].cast(pa.float64()),
            "max_x": t["x1"].cast(pa.float64()),
            "min_y": t["y0"].cast(pa.float64()),
            "max_y": t["y1"].cast(pa.float64()),
        }
    ).sort_by("c_mktsegment")


def hex_cell(
    lat: np.ndarray, lon: np.ndarray, size_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) hex-cell ids for pointy-top hexagons of ``size_deg``
    on the equirectangular lat/lon plane — the deterministic stand-in for
    ES ``geohex_grid``'s H3 cells (the H3 library's icosahedral projection
    is not in this container; the DEVIATION is the cell shape, the agg
    plan is identical).  Cube-rounding with floor(v + 0.5) on every axis —
    the same IEEE expression tree the SQL oracle spells out."""
    q = (np.sqrt(3.0) / 3.0 * lon - lat / 3.0) / size_deg
    r = (2.0 / 3.0 * lat) / size_deg
    y = -q - r
    rq = np.floor(q + 0.5)
    ry = np.floor(y + 0.5)
    rr = np.floor(r + 0.5)
    dq = np.abs(rq - q)
    dy = np.abs(ry - y)
    dr = np.abs(rr - r)
    fix_q = (dq > dy) & (dq > dr)
    fix_r = ~fix_q & (dr > dy)
    rq = np.where(fix_q, -ry - rr, rq)
    rr = np.where(fix_r, -rq - ry, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def geohex_grid(sf_dir: str, size_deg: float = 30.0) -> pa.Table:
    """ES ``geohex_grid`` agg (deterministic axial-hex variant, see
    ``hex_cell``) → ("q/r" cell key, doc count), count DESC then key ASC
    (ES bucket order).  Per-batch cell-count partials; the shuffle is
    bounded by the cell count at the chosen size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["c_custkey"], dtype=np.int64)
        lat, lon = derive_coords(key)
        q, r = hex_cell(lat, lon, size_deg)
        t = pa.table({"q": pa.array(q), "r": pa.array(r)})
        g = t.group_by(["q", "r"]).aggregate([("q", "count")])
        return pa.table(
            {"q": g["q"], "r": g["r"], "n": g["q_count"].cast(pa.int64())}
        )

    ds = (
        _read_customers(sf_dir, ["c_custkey"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["q", "r"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = pa.concat_tables(_collect(ds))
    keys = [
        f"{q}/{r}" for q, r in zip(t["q"].to_pylist(), t["r"].to_pylist())
    ]
    out = pa.table(
        {"cell": pa.array(keys, type=pa.string()), "n": t["n"].cast(pa.int64())}
    )
    return out.sort_by([("n", "descending"), ("cell", "ascending")])
