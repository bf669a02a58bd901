"""Stream-shaped operators over the ``events`` table (SURVEY.md §2.6 note).

Ray Data has no event-time watermarks; stream-shaped work is expressed as
batch over an ordered, partitioned log (Ray guide §streaming-shaped):

- ``tumbling_window``  per (user, fixed window): count + sum(value).
  Uses the PRE-AGGREGATION pattern: partials per Arrow batch inside
  map_batches (one row per key per batch), then a small groupby aggregate
  — the shuffle moves partials, not events.
- ``sessionize``       gap-based sessions per user via
  ``groupby(user).map_groups`` over the ts-sorted group (the documented
  ordering assumption: events of one user fit one group and are sorted
  in-group before windowing).

Timestamps are converted to epoch seconds (BIGINT) at the edges so the
DuckDB oracle comparison is timezone-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round


def _read_events(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_window(sf_dir: str, window_s: int = 3600) -> pa.Table:
    """(user_id, window_start, n_events, sum_value) per user per window."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)  # us → s
        bucket = pc.multiply(pc.floor(pc.divide(epoch.cast(pa.float64()), window_s)).cast(pa.int64()), window_s)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": bucket,
                "value": batch["value"],
            }
        )
        agg = t.group_by(["user_id", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"].cast(pa.int64()),
                "window_start": agg["window_start"],
                "n": agg["value_count"].cast(pa.int64()),
                "v": agg["value_sum"],
            }
        )

    ds = _read_events(sf_dir, ["user_id", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    final = ds.groupby(["user_id", "window_start"]).aggregate(
        Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value")
    )
    parts = [ray.get(r) for r in final.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "window_start": t["window_start"].cast(pa.int64()),
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value": pa.array(
                sql_round(np.asarray(t["sum_value"], dtype=np.float64), 6)
            ),
        }
    ).sort_by([("user_id", "ascending"), ("window_start", "ascending")])


def date_histogram_stats(sf_dir: str, interval_s: int = 86400) -> pa.Table:
    """ES ``date_histogram`` (fixed interval, UTC) with a ``stats``
    sub-aggregation on ``value``: per bucket, doc_count + min/max/sum/avg.

    Same pre-aggregation shape as ``tumbling_window``'s map side, but the
    combine happens on the DRIVER (one Arrow group_by over the concatenated
    partials): with O(#buckets × #blocks) tiny partial rows a Ray groupby
    would spend more on its all-to-all machinery than the data is worth —
    unlike tumbling_window, whose (user, window) key space is large enough
    to need the shuffle.  Sum/Min/Max are mergeable so the combine is
    exact; avg derives from the combined sum/count.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        bucket = pc.multiply(pc.divide(epoch, interval_s), interval_s)  # int floor
        t = pa.table({"bucket_s": bucket, "value": batch["value"]})
        agg = t.group_by("bucket_s").aggregate(
            [("value", "count"), ("value", "min"), ("value", "max"), ("value", "sum")]
        )
        return pa.table(
            {
                "bucket_s": agg["bucket_s"],
                "n": agg["value_count"].cast(pa.int64()),
                "mn": agg["value_min"],
                "mx": agg["value_max"],
                "sm": agg["value_sum"],
            }
        )

    ds = _read_events(sf_dir, ["ts", "value"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by("bucket_s").aggregate(
        [("n", "sum"), ("mn", "min"), ("mx", "max"), ("sm", "sum")]
    )
    t = g.select(["bucket_s", "n_sum", "mn_min", "mx_max", "sm_sum"]).rename_columns(
        ["bucket_s", "doc_count", "min_value", "max_value", "sum_value"]
    )
    n = np.asarray(t["doc_count"], dtype=np.float64)
    sm = np.asarray(t["sum_value"], dtype=np.float64)
    return pa.table(
        {
            "bucket_s": t["bucket_s"].cast(pa.int64()),
            "doc_count": t["doc_count"].cast(pa.int64()),
            "min_value": pa.array(sql_round(np.asarray(t["min_value"], dtype=np.float64), 6)),
            "max_value": pa.array(sql_round(np.asarray(t["max_value"], dtype=np.float64), 6)),
            "sum_value": pa.array(sql_round(sm, 6)),
            "avg_value": pa.array(sql_round(sm / n, 6)),
        }
    ).sort_by("bucket_s")


def matrix_stats(
    sf_dir: str,
    fields: tuple[str, str] = ("value", "user_id"),
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``matrix_stats`` aggregation over two numeric event fields:
    per ordered field pair (a ≤ b), count + mean_a + population
    covariance + Pearson correlation (a==b rows carry variance and
    correlation 1) → (field_a, field_b, doc_count, mean_a, covariance,
    correlation).

    One streamed pass emits per-batch CO-MOMENT partials
    (n, Σx, Σy, Σxx, Σyy, Σxy) — six float64 numbers per batch, mergeable
    by plain summation, so the driver combine is O(#blocks) and nothing
    shuffles.  ES computes the same sums shard-side and merges on the
    coordinator; skewness/kurtosis (which ES also reports) would need the
    3rd/4th moments — omitted, the driver gate has no stable oracle for
    their bias corrections.
    """
    import ray

    fa, fb = fields

    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[fa].combine_chunks(), dtype=np.float64)
        y = np.asarray(batch[fb].combine_chunks(), dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([float(x.sum())], type=pa.float64()),
                "sy": pa.array([float(y.sum())], type=pa.float64()),
                "sxx": pa.array([float((x * x).sum())], type=pa.float64()),
                "syy": pa.array([float((y * y).sum())], type=pa.float64()),
                "sxy": pa.array([float((x * y).sum())], type=pa.float64()),
            }
        )

    ds = _read_events(sf_dir, list(fields)).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    n = sum(cat["n"].to_pylist())
    sx, sy, sxx, syy, sxy = (sum(cat[c].to_pylist()) for c in ("sx", "sy", "sxx", "syy", "sxy"))
    mx, my = sx / n, sy / n
    var_x = sxx / n - mx * mx
    var_y = syy / n - my * my
    cov = sxy / n - mx * my
    corr = cov / np.sqrt(var_x * var_y)
    rows = [
        (fa, fa, n, mx, var_x, 1.0),
        (fb, fb, n, my, var_y, 1.0),
        *( [(fa, fb, n, mx, cov, corr)] if fa <= fb else [(fb, fa, n, my, cov, corr)] ),
    ]
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table(
        {
            "field_a": pa.array([r[0] for r in rows], type=pa.string()),
            "field_b": pa.array([r[1] for r in rows], type=pa.string()),
            "doc_count": pa.array([r[2] for r in rows], type=pa.int64()),
            "mean_a": pa.array(
                [float(sql_round(r[3], round_decimals)) for r in rows], type=pa.float64()
            ),
            "covariance": pa.array(
                [float(sql_round(r[4], round_decimals)) for r in rows], type=pa.float64()
            ),
            "correlation": pa.array(
                [float(sql_round(r[5], round_decimals)) for r in rows], type=pa.float64()
            ),
        }
    )


def sessionize(sf_dir: str, gap_s: int = 1800) -> pa.Table:
    """(user_id, session_id, n_events, start_s, end_s): a new session starts
    when the gap to the previous event of the same user exceeds ``gap_s``."""
    import ray

    def sessions(g: pa.Table) -> pa.Table:
        # one user per group: sort its events, cut runs where the gap
        # exceeds gap_s, reduce each run with flatnonzero/diff — pure
        # numpy over the Arrow buffers, no pandas round-trip
        sec = np.sort(
            g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 1_000_000,
            kind="stable",
        )
        new = np.ones(len(sec), dtype=bool)
        new[1:] = (sec[1:] - sec[:-1]) > gap_s
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(sec)] - 1
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(starts), uid), type=pa.int64()
                ),
                "session_id": pa.array(
                    np.arange(1, len(starts) + 1), type=pa.int64()
                ),
                "n_events": pa.array(
                    np.diff(np.r_[starts, len(sec)]), type=pa.int64()
                ),
                "start_s": pa.array(sec[starts], type=pa.int64()),
                "end_s": pa.array(sec[ends], type=pa.int64()),
            }
        )

    ds = (
        _read_events(sf_dir, ["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )
    tabs = [p for p in (ray.get(r) for r in ds.to_arrow_refs()) if p.num_rows]
    return pa.concat_tables(tabs).sort_by(
        [("user_id", "ascending"), ("session_id", "ascending")]
    )


AUTO_LADDER = (60, 300, 600, 1800, 3600, 10800, 43200, 86400, 604800)


def auto_date_histogram(sf_dir: str, target_buckets: int = 35) -> pa.Table:
    """ES ``auto_date_histogram``: pick the smallest ladder interval that
    yields ≤ ``target_buckets`` buckets, then histogram at it →
    (interval_s, bucket_s, doc_count).

    ONE streamed pass, exactly like ES shards: per-batch counts at the
    FINEST ladder interval (60 s); the driver merge re-buckets those
    partials to the chosen interval (every ladder step is a multiple of
    60, so floor-of-floor is exact).  Driver state is bounded by
    time-span/60, never the event count."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        b60 = pc.multiply(pc.divide(epoch, 60), 60)
        g = pa.table({"b": b60}).group_by("b").aggregate([("b", "count")])
        return pa.table({"b": g["b"], "n": g["b_count"].cast(pa.int64())})

    ds = _read_events(sf_dir, ["ts"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by("b").aggregate([("n", "sum")])
    b60 = np.asarray(g["b"], dtype=np.int64)
    n60 = np.asarray(g["n_sum"], dtype=np.int64)
    mn, mx = int(b60.min()), int(b60.max())
    interval = AUTO_LADDER[-1]
    for iv in AUTO_LADDER:
        if mx // iv - mn // iv + 1 <= target_buckets:
            interval = iv
            break
    bucket = (b60 // interval) * interval
    out = (
        pa.table({"bucket_s": pa.array(bucket), "n": pa.array(n60)})
        .group_by("bucket_s")
        .aggregate([("n", "sum")])
    )
    return pa.table(
        {
            "interval_s": pa.array([interval] * out.num_rows, type=pa.int64()),
            "bucket_s": out["bucket_s"].cast(pa.int64()),
            "doc_count": out["n_sum"].cast(pa.int64()),
        }
    ).sort_by("bucket_s")


def cumulative_cardinality(sf_dir: str, interval_s: int = 86400) -> pa.Table:
    """ES ``cumulative_cardinality`` pipeline agg, EXACT: per interval
    bucket, the number of users first seen in it and the running distinct
    total → (bucket_s, new_users, cumulative_users).

    Plan: per-batch (user_id, min bucket) partials, one Ray groupby(user)
    Min (the only shuffle — keyed on the high-cardinality user axis), then
    the bucket histogram + cumsum on the driver, bounded by bucket count.
    ES needs HLL sketches for this; an exact first-seen pass is the batch
    equivalent."""
    import ray
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        bucket = pc.multiply(pc.divide(epoch, interval_s), interval_s)
        g = (
            pa.table({"user_id": batch["user_id"], "b": bucket})
            .group_by("user_id")
            .aggregate([("b", "min")])
        )
        return pa.table({"user_id": g["user_id"], "b": g["b_min"]})

    ds = (
        _read_events(sf_dir, ["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("b", alias_name="first_b"))
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by("first_b").aggregate([("first_b", "count")])
    t = g.sort_by("first_b")
    new = np.asarray(t["first_b_count"], dtype=np.int64)
    return pa.table(
        {
            "bucket_s": t["first_b"].cast(pa.int64()),
            "new_users": pa.array(new),
            "cumulative_users": pa.array(np.cumsum(new)),
        }
    )


def ip_range_agg(sf_dir: str) -> pa.Table:
    """ES ``ip_range`` aggregation: event counts and distinct clients per
    IPv4 range.  The events table carries no IP column, so the client IP
    derives deterministically from the user — ``ip = (user_id ·
    2654435761) mod 2³²`` (Knuth's multiplicative hash, mirrored exactly in
    the SQL oracle) — and the buckets are the four /2 quarters of the
    address space, keyed ES-style ``from-to`` in dotted-quad with ``*`` at
    the open ends.

    Per-batch (bucket, n, user-set partial) via integer compare — the
    combine is bounded by 4 buckets × #users, never the event count."""
    import ray
    import ray.data as rd

    q = np.int64(1) << np.int64(30)
    labels = [
        "*-64.0.0.0",
        "64.0.0.0-128.0.0.0",
        "128.0.0.0-192.0.0.0",
        "192.0.0.0-*",
    ]

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ip = (u * np.int64(2654435761)) % (np.int64(1) << np.int64(32))
        b = np.minimum(ip // q, 3).astype(np.int64)
        t = pa.table({"b": pa.array(b), "user_id": pa.array(u)})
        g = t.group_by(["b", "user_id"]).aggregate([("user_id", "count")])
        return g.rename_columns(["b", "user_id", "n"])

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = (
        cat.group_by(["b", "user_id"])
        .aggregate([("n", "sum")])
        .group_by("b")
        .aggregate([("n_sum", "sum"), ("user_id", "count")])
        .sort_by("b")
    )
    bmap = dict(
        zip(
            np.asarray(g["b"], dtype=np.int64).tolist(),
            zip(g["n_sum_sum"].to_pylist(), g["user_id_count"].to_pylist()),
        )
    )
    return pa.table(
        {
            "key": pa.array(labels, type=pa.string()),
            "doc_count": pa.array(
                [int(bmap.get(i, (0, 0))[0]) for i in range(4)], type=pa.int64()
            ),
            "unique_users": pa.array(
                [int(bmap.get(i, (0, 0))[1]) for i in range(4)], type=pa.int64()
            ),
        }
    )


def ip_prefix_agg(sf_dir: str, prefix_length: int = 4) -> pa.Table:
    """ES ``ip_prefix`` aggregation (8.x): event counts and distinct
    clients per network prefix of the given length.  The client IPv4
    derives from the user exactly as in ``ip_range_agg`` (Knuth
    multiplicative hash, mirrored in the SQL oracle); the bucket key is
    the ES wire shape — the network address in dotted-quad (host bits
    zeroed) — plus the echoed ``prefix_length``, and empty prefixes are
    omitted (ES ``min_doc_count`` defaults to 1 here).

    Per-batch (network, n, user-set partial) via one shift; the combine
    is bounded by 2^prefix_length buckets × #users, never event count."""
    import ray
    import ray.data as rd

    if not 0 < prefix_length <= 32:
        raise ValueError("prefix_length must be in (0, 32]")
    shift = np.int64(32 - prefix_length)

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ip = (u * np.int64(2654435761)) % (np.int64(1) << np.int64(32))
        net = (ip >> shift) << shift
        t = pa.table({"net": pa.array(net), "user_id": pa.array(u)})
        g = t.group_by(["net", "user_id"]).aggregate([("user_id", "count")])
        return g.rename_columns(["net", "user_id", "n"])

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.blocks import collect_tables

    cat = pa.concat_tables(collect_tables(ds))
    g = (
        cat.group_by(["net", "user_id"])
        .aggregate([("n", "sum")])
        .group_by("net")
        .aggregate([("n_sum", "sum"), ("user_id", "count")])
        .sort_by("net")
    )
    net = np.asarray(g["net"], dtype=np.int64)
    quads = [
        f"{a >> 24}.{(a >> 16) & 255}.{(a >> 8) & 255}.{a & 255}" for a in net.tolist()
    ]
    return pa.table(
        {
            "key": pa.array(quads, type=pa.string()),
            "prefix_length": pa.array([prefix_length] * len(net), type=pa.int64()),
            "doc_count": g["n_sum_sum"].cast(pa.int64()),
            "unique_users": g["user_id_count"].cast(pa.int64()),
        }
    )


def date_range_agg(
    sf_dir: str, edges_s: tuple[int, ...], round_decimals: int = 6
) -> pa.Table:
    """ES ``date_range`` aggregation over events: half-open buckets
    [from, to) from the sorted epoch-second ``edges_s``, plus the
    unbounded head (*-first) and tail (last-*) buckets, each with
    doc_count and sum(value).  Keys use the ES ``from-to`` label scheme
    with ``*`` for the open ends.

    Per-batch searchsorted bucket assignment → (bucket, n, Σv) partials;
    the driver combine is bounded by the bucket count."""
    import ray
    import ray.data as rd

    edges = np.asarray(sorted(edges_s), dtype=np.int64)
    labels = []
    bounds = [None, *edges.tolist(), None]
    for i in range(len(bounds) - 1):
        lo = "*" if bounds[i] is None else str(bounds[i])
        hi = "*" if bounds[i + 1] is None else str(bounds[i + 1])
        labels.append(f"{lo}-{hi}")

    def partial(batch: pa.Table) -> pa.Table:
        sec = np.asarray(
            pc.divide(batch["ts"].cast(pa.int64()), 1_000_000).combine_chunks(),
            dtype=np.int64,
        )
        v = np.asarray(batch["value"].combine_chunks(), dtype=np.float64)
        idx = np.searchsorted(edges, sec, side="right")
        t = pa.table({"b": idx.astype(np.int64), "v": v})
        g = t.group_by("b").aggregate([("v", "count"), ("v", "sum")])
        return pa.table(
            {
                "b": g["b"],
                "n": g["v_count"].cast(pa.int64()),
                "s": g["v_sum"],
            }
        )

    from ..functions.blocks import collect_tables

    ds = _read_events(sf_dir, ["ts", "value"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cat = pa.concat_tables(collect_tables(ds, on_empty="date_range_agg: no events"))
    g = cat.group_by("b").aggregate([("n", "sum"), ("s", "sum")])
    got = {
        int(b): (int(n), float(s))
        for b, n, s in zip(
            g["b"].to_pylist(), g["n_sum"].to_pylist(), g["s_sum"].to_pylist()
        )
    }
    counts = [got.get(i, (0, 0.0))[0] for i in range(len(labels))]
    sums = [
        float(sql_round(got.get(i, (0, 0.0))[1], round_decimals))
        for i in range(len(labels))
    ]
    return pa.table(
        {
            "key": pa.array(labels, type=pa.string()),
            "doc_count": pa.array(counts, type=pa.int64()),
            "sum_value": pa.array(sums, type=pa.float64()),
        }
    )


def rate_agg(
    sf_dir: str,
    bucket_s: int = 86400,
    unit_s: int = 3600,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``rate`` aggregation inside a fixed-interval date_histogram:
    per bucket, ``rate_sum = Σvalue / units`` and ``rate_count =
    doc_count / units`` where units = bucket_s / unit_s (day bucket at
    hour unit → ÷24) — ES's value_count/sum rate modes.  Same
    pre-aggregated partial plan as ``date_histogram_stats``."""
    units = bucket_s / unit_s

    base = date_histogram_stats(sf_dir, interval_s=bucket_s)
    n = np.asarray(base["doc_count"], dtype=np.float64)
    # re-derive the exact bucket sums (base rounds them for its own
    # contract): avg*count would re-round; recompute from raw partials
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        sec = np.asarray(
            pc.divide(batch["ts"].cast(pa.int64()), 1_000_000).combine_chunks(),
            dtype=np.int64,
        )
        b = (sec // bucket_s) * bucket_s
        t = pa.table(
            {"b": b.astype(np.int64), "v": np.asarray(batch["value"], dtype=np.float64)}
        )
        g = t.group_by("b").aggregate([("v", "sum")])
        return pa.table({"b": g["b"], "s": g["v_sum"]})

    from ..functions.blocks import collect_tables

    ds = _read_events(sf_dir, ["ts", "value"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cat = pa.concat_tables(collect_tables(ds, on_empty="rate_agg: no events"))
    g = cat.group_by("b").aggregate([("s", "sum")]).sort_by("b")
    if g["b"].to_pylist() != base["bucket_s"].to_pylist():
        raise ValueError("rate_agg: bucket sets diverged between passes")
    s = np.asarray(g["s_sum"], dtype=np.float64)
    return pa.table(
        {
            "bucket_s": base["bucket_s"],
            "doc_count": base["doc_count"],
            "rate_sum": pa.array(sql_round(s / units, round_decimals), type=pa.float64()),
            "rate_count": pa.array(
                sql_round(n / units, round_decimals), type=pa.float64()
            ),
        }
    )


def bucket_script_ratio(
    sf_dir: str,
    num_type: str = "purchase",
    den_type: str = "click",
    bucket_s: int = 86400,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``bucket_script`` pipeline agg: per date_histogram bucket, a
    script over two sibling metrics — here ``sum(value) where
    event_type=num`` ÷ ``count(*) where event_type=den`` (revenue per
    click).  Buckets where the denominator is 0 yield null (ES skips the
    script there).  ONE partial pass carries both filter sub-aggs."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        sec = np.asarray(
            pc.divide(batch["ts"].cast(pa.int64()), 1_000_000).combine_chunks(),
            dtype=np.int64,
        )
        b = (sec // bucket_s) * bucket_s
        et = np.asarray(batch["event_type"].combine_chunks().cast(pa.string()))
        v = np.asarray(batch["value"].combine_chunks(), dtype=np.float64)
        t = pa.table(
            {
                "b": b.astype(np.int64),
                "nv": np.where(et == num_type, v, 0.0),
                "dn": (et == den_type).astype(np.int64),
            }
        )
        g = t.group_by("b").aggregate([("nv", "sum"), ("dn", "sum")])
        return pa.table(
            {"b": g["b"], "nv": g["nv_sum"], "dn": g["dn_sum"].cast(pa.int64())}
        )

    from ..functions.blocks import collect_tables

    ds = _read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cat = pa.concat_tables(
        collect_tables(ds, on_empty="bucket_script_ratio: no events")
    )
    g = cat.group_by("b").aggregate([("nv", "sum"), ("dn", "sum")]).sort_by("b")
    nv = np.asarray(g["nv_sum"], dtype=np.float64)
    dn = np.asarray(g["dn_sum"], dtype=np.int64)
    ratio = [
        None if d == 0 else float(sql_round(x / d, round_decimals))
        for x, d in zip(nv.tolist(), dn.tolist())
    ]
    return pa.table(
        {
            "bucket_s": g["b"].cast(pa.int64()),
            "num_sum": pa.array(sql_round(nv, round_decimals), type=pa.float64()),
            "den_count": pa.array(dn, type=pa.int64()),
            "ratio": pa.array(ratio, type=pa.float64()),
        }
    )


def eql_funnel(
    sf_dir: str,
    steps: tuple[str, ...] = ("signup", "purchase", "error"),
    maxspan_s: int = 7 * 86400,
) -> pa.Table:
    """EQL-style ``sequence by user_id with maxspan`` over the events log
    (ES EQL runs against the same Lucene index as _search) — with
    FIRST-COMPLETION (funnel) semantics, the deterministic fragment that
    a SQL oracle can mirror: step 1 anchors at the user's EARLIEST
    matching event, each later step at the earliest matching event
    strictly after the previous step, and the sequence survives iff
    last - first ≤ maxspan.  (Full EQL emits every non-overlapped match
    from a per-key state machine; the divergence is documented here.)

    Plan: filter to the step types at the read (predicate pushdown),
    hash-shuffle by user_id once, per-user vectorized scan in
    ``map_groups`` — the same one-user-per-group partitioning assumption
    as ``sessionize``."""
    import pyarrow.dataset as pads
    import ray

    expr = pads.field("event_type").isin(list(steps))
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=expr,
    )

    def funnel_of_user(group: pa.Table) -> pa.Table:
        sec = np.asarray(
            pc.divide(group["ts"].cast(pa.int64()), 1_000_000).combine_chunks(),
            dtype=np.int64,
        )
        et = np.asarray(group["event_type"].combine_chunks().cast(pa.string()))
        order = np.argsort(sec, kind="stable")
        sec, et = sec[order], et[order]
        times = []
        prev = -1
        for step in steps:
            cand = sec[(et == step) & (sec > prev)]
            if len(cand) == 0:
                return pa.table(
                    {
                        "user_id": pa.array([], type=pa.int64()),
                        **{f"t{i+1}_s": pa.array([], type=pa.int64()) for i in range(len(steps))},
                        "span_s": pa.array([], type=pa.int64()),
                    }
                )
            prev = int(cand[0])
            times.append(prev)
        span = times[-1] - times[0]
        if span > maxspan_s:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    **{f"t{i+1}_s": pa.array([], type=pa.int64()) for i in range(len(steps))},
                    "span_s": pa.array([], type=pa.int64()),
                }
            )
        uid = int(group["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array([uid], type=pa.int64()),
                **{
                    f"t{i+1}_s": pa.array([t], type=pa.int64())
                    for i, t in enumerate(times)
                },
                "span_s": pa.array([span], type=pa.int64()),
            }
        )

    from ..functions.blocks import collect_tables

    out = ds.groupby("user_id").map_groups(funnel_of_user, batch_format="pyarrow")
    parts = collect_tables(out)
    if not parts:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                **{f"t{i+1}_s": pa.array([], type=pa.int64()) for i in range(len(steps))},
                "span_s": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by("user_id")


def hopping_window(
    sf_dir: str, size_s: int = 3600, hop_s: int = 1800, round_decimals: int = 6
) -> pa.Table:
    """Hopping (sliding) windows over the event stream: every window of
    length ``size_s`` starting on a ``hop_s`` boundary; each event lands
    in ``size_s / hop_s`` overlapping windows.  (The overlap factor is
    the replication cost — the streaming-SQL HOP operator's shape.)
    Returns (window_start, n_events, sum_value) per window.

    Per-batch: the replicate-and-assign is vectorized (one tile per hop
    offset), partials pre-aggregate per (window × batch) before the
    shuffle."""
    import ray
    from ray.data.aggregate import Sum

    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    reps = size_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        sec = np.asarray(
            pc.divide(batch["ts"].cast(pa.int64()), 1_000_000).combine_chunks(),
            dtype=np.int64,
        )
        v = np.asarray(batch["value"].combine_chunks(), dtype=np.float64)
        base = (sec // hop_s) * hop_s
        ws, vs = [], []
        for j in range(reps):
            ws.append(base - j * hop_s)
            vs.append(v)
        t = pa.table({"w": np.concatenate(ws), "v": np.concatenate(vs)})
        g = t.group_by("w").aggregate([("v", "count"), ("v", "sum")])
        return pa.table(
            {
                "w": g["w"],
                "n": g["v_count"].cast(pa.int64()),
                "s": g["v_sum"],
            }
        )

    ds = (
        _read_events(sf_dir, ["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))
    )
    from ..functions.blocks import collect_tables

    t = pa.concat_tables(
        collect_tables(ds, on_empty="hopping_window: no events")
    ).sort_by("w")
    return pa.table(
        {
            "window_start": t["w"].cast(pa.int64()),
            "n_events": t["n_events"].cast(pa.int64()),
            "sum_value": pa.array(
                sql_round(np.asarray(t["sum_value"], dtype=np.float64), round_decimals),
                type=pa.float64(),
            ),
        }
    )


def downsample(
    sf_dir: str, interval_s: int = 3600, round_decimals: int = 6
) -> pa.Table:
    """ES TSDS ``_downsample`` API: roll the events log up to ONE document
    per (time series, fixed interval) — a time series is the dimension
    tuple (user_id, event_type).  Gauge metric ``value`` keeps ES's stored
    rollup (value_count/min/max/sum); the counter semantics keep
    ``last_value`` — the value of the latest event in the bucket, ties by
    (ts, event_id) like every tie in this engine.

    Shape: one vectorized single-pass partial per Arrow batch (np.lexsort
    by (series, bucket, ts_us, event_id), then reduceat folds — the run
    LAST row is the batch-local argmax for free), then a Ray groupby over
    (series, bucket) combined entirely by NATIVE mergeable aggregates
    (Sum/Min/Max; the counter's argmax rides a packed lexicographic
    Max key — see ``downsample_ds``).  The shuffle moves partials (one
    row per key per block), never events, and nothing unbounded reaches
    the driver on the ``_to_parquet`` path.
    """
    from ..functions.blocks import collect_tables

    t = pa.concat_tables(
        collect_tables(
            downsample_ds(sf_dir, interval_s, round_decimals),
            on_empty="downsample: no events",
        )
    )
    return t.sort_by(
        [("user_id", "ascending"), ("event_type", "ascending"), ("bucket_s", "ascending")]
    )


def downsample_ds(sf_dir: str, interval_s: int = 3600, round_decimals: int = 6):
    """Streaming rollup plan, fully NATIVE-aggregate (no per-group Python):
    the batch partial packs the run-tail counter sample into a fixed-width
    lexicographic key (zero-padded decimal rel_us | event_id | value-bits),
    so the distributed combine is ONE ``groupby().aggregate()`` of
    mergeable Sum/Min/Max kernels — Max over the packed string IS the
    argmax by (ts, event_id), and the winner's value rides along in the
    key's suffix (prefixes are unique per event, so the suffix never
    decides a comparison).  A final vectorized ``map_batches`` decodes the
    key and rounds.  Replaces the r4 ``map_groups`` fold whose per-group
    Python calls dominated at 10× scale (~99k groups → ~20 s at sf0.1;
    the native path runs the same rollup in a few seconds)."""
    from ray.data.aggregate import Max, Min, Sum

    if interval_s <= 0:
        raise ValueError("interval_s must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (us // 1_000_000) // interval_s * interval_s
        u = batch["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].combine_chunks().dictionary_encode()
        etc = np.asarray(et.indices)
        eid = batch["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, us, bucket, etc, u))
        u, etc, bucket, us, eid, v = (a[order] for a in (u, etc, bucket, us, eid, v))
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (etc[1:] != etc[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(new)
        last = np.r_[starts[1:], len(u)] - 1  # run tail = argmax (us, eid)
        rel_us = us[last] - bucket[last] * 1_000_000
        if len(last) and (
            int(rel_us.max()) >= 10**16 or int(eid[last].max()) >= 10**16
        ):
            raise ValueError(
                "downsample: packed last-key needs rel_us and event_id "
                "< 1e16 — widen the key layout for this input"
            )
        vbits = v[last].view(np.uint64)
        lastk = np.char.add(
            np.char.add(
                np.char.zfill(rel_us.astype("U16"), 16),
                np.char.zfill(eid[last].astype("U16"), 16),
            ),
            np.char.zfill(vbits.astype("U20"), 20),
        )
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "event_type": pc.take(et.dictionary, pa.array(etc[starts])),
                "bucket_s": pa.array(bucket[starts], type=pa.int64()),
                "n": pa.array(np.diff(np.r_[starts, len(u)]), type=pa.int64()),
                "mn": pa.array(np.minimum.reduceat(v, starts)),
                "mx": pa.array(np.maximum.reduceat(v, starts)),
                "sm": pa.array(np.add.reduceat(v, starts)),
                "lastk": pa.array(lastk, type=pa.string()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["doc_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        sm = batch["sm"].to_numpy(zero_copy_only=False)
        vbits = np.asarray(
            pc.cast(
                pc.utf8_slice_codeunits(
                    batch["lastk"].combine_chunks(), 32, 52
                ),
                pa.uint64(),
            )
        )
        l_val = vbits.view(np.float64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "bucket_s": batch["bucket_s"],
                "doc_count": batch["doc_count"],
                "min_value": pa.array(
                    sql_round(
                        batch["mn"].to_numpy(zero_copy_only=False),
                        round_decimals,
                    )
                ),
                "max_value": pa.array(
                    sql_round(
                        batch["mx"].to_numpy(zero_copy_only=False),
                        round_decimals,
                    )
                ),
                "sum_value": pa.array(sql_round(sm, round_decimals)),
                "avg_value": pa.array(sql_round(sm / n, round_decimals)),
                "last_value": pa.array(sql_round(l_val, round_decimals)),
            }
        )

    return (
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type", "bucket_s"])
        .aggregate(
            Sum("n", alias_name="doc_count"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("sm", alias_name="sm"),
            Max("lastk", alias_name="lastk"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def downsample_to_parquet(sf_dir: str, out_dir: str, interval_s: int = 3600) -> str:
    """Scale sink: the rolled-up index streams straight to partitioned
    parquet — the downsampled store IS the new (much smaller) index."""
    downsample_ds(sf_dir, interval_s).write_parquet(out_dir, mode="overwrite")
    return out_dir


def time_series_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``time_series`` aggregation (8.7+ TSDS): one bucket per time
    series — the (user_id, event_type) dimension tuple — with doc_count
    and the series' stats sub-agg (first/last epoch second, sum of the
    gauge).  Pre-aggregation pattern: per-batch Arrow group_by partials,
    one Ray groupby over the series key (shuffle bounded by SERIES
    cardinality × blocks, never events)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        sec = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        t = pa.table(
            {
                "user_id": batch["user_id"].cast(pa.int64()),
                "event_type": batch["event_type"],
                "sec": sec,
                "value": batch["value"],
            }
        )
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("value", "count"), ("sec", "min"), ("sec", "max"), ("value", "sum")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": g["value_count"].cast(pa.int64()),
                "mn_s": g["sec_min"],
                "mx_s": g["sec_max"],
                "sm": g["value_sum"],
            }
        )

    ds = (
        _read_events(sf_dir, ["ts", "user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"])
        .aggregate(
            Sum("n", alias_name="doc_count"),
            Min("mn_s", alias_name="start_s"),
            Max("mx_s", alias_name="end_s"),
            Sum("sm", alias_name="sum_value"),
        )
    )
    from ..functions.blocks import collect_tables

    t = pa.concat_tables(collect_tables(ds, on_empty="time_series_agg: no events"))
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "event_type": t["event_type"],
            "doc_count": t["doc_count"].cast(pa.int64()),
            "start_s": t["start_s"].cast(pa.int64()),
            "end_s": t["end_s"].cast(pa.int64()),
            "sum_value": pa.array(
                sql_round(np.asarray(t["sum_value"], dtype=np.float64), round_decimals),
                type=pa.float64(),
            ),
        }
    ).sort_by([("user_id", "ascending"), ("event_type", "ascending")])


def anomaly_scores(sf_dir: str, interval_s: int = 86400) -> pa.Table:
    """ES ML anomaly detection — the DETERMINISTIC robust-z-score core of a
    count-function job (ES fits probabilistic models with decaying state;
    this graft keeps the median/MAD typicality measure so every engine
    reproduces it bit-for-bit): per (event_type, fixed UTC bucket) doc
    counts, ``typical`` = median of that type's bucket counts, ``spread`` =
    MAD (median absolute deviation, both quantile_cont-interpolated like
    DuckDB), ``anomaly_score`` = |actual − typical| / max(spread, 1) — the
    floor keeps constant series from dividing by zero, same shape as ES's
    severity normalization.

    One streamed pass of per-batch (event_type, bucket, n) hash-agg
    partials; the driver combine and the per-type median walk are bounded
    by #types × #buckets, never by event count.
    """
    import ray

    from .aggs import _weighted_median

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        bucket = pc.multiply(pc.divide(epoch, interval_s), interval_s)
        t = pa.table({"event_type": batch["event_type"], "bucket_s": bucket})
        agg = t.group_by(["event_type", "bucket_s"]).aggregate([("bucket_s", "count")])
        return pa.table(
            {
                "event_type": agg["event_type"],
                "bucket_s": agg["bucket_s"],
                "n": agg["bucket_s_count"].cast(pa.int64()),
            }
        )

    ds = _read_events(sf_dir, ["ts", "event_type"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..functions.blocks import collect_tables

    cat = pa.concat_tables(collect_tables(ds, on_empty="anomaly_scores: no events"))
    g = cat.group_by(["event_type", "bucket_s"]).aggregate([("n", "sum")])
    g = g.sort_by([("event_type", "ascending"), ("bucket_s", "ascending")])
    types = np.asarray(g["event_type"])
    actual = np.asarray(g["n_sum"], dtype=np.float64)
    typical = np.empty_like(actual)
    spread = np.empty_like(actual)
    for ty in np.unique(types):
        m = types == ty
        vals = actual[m]
        med = _weighted_median(vals, np.ones(len(vals), dtype=np.int64))
        dev = np.abs(vals - med)
        mad = _weighted_median(dev, np.ones(len(dev), dtype=np.int64))
        typical[m] = med
        spread[m] = mad
    score = np.abs(actual - typical) / np.maximum(spread, 1.0)
    return pa.table(
        {
            "event_type": g["event_type"],
            "bucket_s": g["bucket_s"].cast(pa.int64()),
            "actual": g["n_sum"].cast(pa.int64()),
            "typical": pa.array(sql_round(typical, 6), type=pa.float64()),
            "spread": pa.array(sql_round(spread, 6), type=pa.float64()),
            "anomaly_score": pa.array(sql_round(score, 6), type=pa.float64()),
        }
    )
