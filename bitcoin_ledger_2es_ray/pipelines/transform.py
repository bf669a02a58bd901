"""ES *transform* — ``PUT _transform`` (pivot) + continuous checkpointing.

An ES transform pivots an event stream into an entity-centric dest index
(group by an entity key, aggregate metrics) and, in continuous mode, wakes
up on a checkpoint, processes only the documents newer than the last
checkpoint, and merges them into the dest.  The Ray-Data-first shape:

- the pivot's metrics are the MERGEABLE sufficient statistics
  (n, Σvalue, max ts) so an incremental run never recomputes history:
  the delta stream is pre-aggregated per batch (Arrow hash-agg partials),
  UNIONED with the existing dest rows — which carry the same stats — and
  one Ray ``groupby(entity).aggregate(Sum, Sum, Max)`` merges both.  The
  entity key space is large (users), so this is the genuine shuffle, and
  it moves one row per (entity × block), never one per event.
- the checkpoint is ``ts > last_checkpoint`` pushed INTO the parquet scan
  (row-group pruning — old events never leave storage), the exact analog
  of ES reading only new sequence numbers.
- dest + checkpoint commit atomically (write tmp dir → rename), so a
  killed run re-runs from the previous checkpoint without corruption;
  the new checkpoint is read from the written files' parquet FOOTER
  statistics (no second pass over the data).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

_PIVOT = "pivot"
_CKPT = "checkpoint.json"


def _max_from_footers(path: str, col: str) -> int | None:
    """Max of ``col`` across all row groups of all parquet files in
    ``path``, read from footer statistics only."""
    import pyarrow.parquet as pq

    best = None
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                v = st.max
                best = v if best is None else max(best, v)
    return best


def checkpoint_of(dest_dir: str) -> int | None:
    """Stored checkpoint (max event ts in µs) or None before the first run."""
    p = os.path.join(dest_dir, _CKPT)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["checkpoint_us"]


def run_transform(sf_dir: str, dest_dir: str) -> int | None:
    """One transform checkpoint run over ``events``: pivot by user_id with
    (n_events, sum_value, last_ts) metrics, merged into ``dest_dir``.
    Returns the new checkpoint (µs)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    os.makedirs(dest_dir, exist_ok=True)
    ckpt = checkpoint_of(dest_dir)
    kwargs = {}
    if ckpt is not None:
        kwargs["filter"] = pc.field("ts") > pa.scalar(ckpt, type=pa.timestamp("us"))
    delta = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"], **kwargs
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        t = pa.table(
            {"user_id": batch["user_id"], "value": batch["value"], "us": us}
        )
        g = t.group_by("user_id").aggregate(
            [("value", "count"), ("value", "sum"), ("us", "max")]
        )
        return pa.table(
            {
                "user_id": g["user_id"].cast(pa.int64()),
                "n": g["value_count"].cast(pa.int64()),
                "sm": g["value_sum"],
                "mx_us": g["us_max"].cast(pa.int64()),
            }
        )

    parts = delta.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    pivot_dir = os.path.join(dest_dir, _PIVOT)
    if os.path.exists(pivot_dir):
        parts = parts.union(rd.read_parquet(pivot_dir))
    merged = parts.groupby("user_id").aggregate(
        Sum("n", alias_name="n"),
        Sum("sm", alias_name="sm"),
        Max("mx_us", alias_name="mx_us"),
    )
    tmp = pivot_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write_parquet(tmp)
    new_ckpt = _max_from_footers(tmp, "mx_us")
    if new_ckpt is None:  # empty delta over an empty dest
        new_ckpt = ckpt
    old = pivot_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(pivot_dir):
        os.rename(pivot_dir, old)
    os.rename(tmp, pivot_dir)
    shutil.rmtree(old, ignore_errors=True)
    with open(os.path.join(dest_dir, _CKPT), "w") as f:
        json.dump({"checkpoint_us": new_ckpt}, f)
    return new_ckpt


def read_pivot(dest_dir: str, round_decimals: int = 6) -> pa.Table:
    """The dest index as (user_id, n_events, sum_value, avg_value,
    last_ts_s), sorted by user_id."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.bm25 import sql_round

    t = pq.read_table(os.path.join(dest_dir, _PIVOT))
    n = np.asarray(t["n"], dtype=np.float64)
    sm = np.asarray(t["sm"], dtype=np.float64)
    # avg derives from the ROUNDED sum (both here and in the SQL oracle):
    # the raw float sums differ in the last ulp across summation orders,
    # which flips 6-dp rounding exactly at .5 boundaries
    smr = sql_round(sm, round_decimals)
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "n_events": t["n"].cast(pa.int64()),
            "sum_value": pa.array(smr),
            "avg_value": pa.array(sql_round(smr / n, round_decimals)),
            "last_ts_s": pc.divide(t["mx_us"].combine_chunks(), 1_000_000).cast(
                pa.int64()
            ),
        }
    ).sort_by("user_id")


def latest_transform(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``latest`` transform: the most recent event per entity (user) —
    (user_id, ts_s, event_type, value), ordered by user.

    The per-entity argmax is MERGEABLE: each batch keeps one row per user
    (max by (ts, event_id) — event_id breaks timestamp ties exactly like
    ES's sort tiebreaker), the driver folds the partials with the same
    rule, bounded by #users × #blocks.  Nothing shuffles; raw events never
    leave their task."""
    import numpy as np
    import ray
    import ray.data as rd

    from ..functions.bm25 import sql_round

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ts = np.asarray(batch["ts"].cast(pa.int64())) // 1_000_000
        eid = np.asarray(batch["event_id"], dtype=np.int64)
        order = np.lexsort((-eid, -ts, u))  # per user: latest first
        u_s = u[order]
        first = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        keep = order[first]
        return pa.table(
            {
                "user_id": pa.array(u[keep], type=pa.int64()),
                "ts_s": pa.array(ts[keep], type=pa.int64()),
                "event_id": pa.array(eid[keep], type=pa.int64()),
                "event_type": batch["event_type"].take(pa.array(keep)),
                "value": batch["value"].take(pa.array(keep)),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    u = np.asarray(cat["user_id"], dtype=np.int64)
    ts = np.asarray(cat["ts_s"], dtype=np.int64)
    eid = np.asarray(cat["event_id"], dtype=np.int64)
    order = np.lexsort((-eid, -ts, u))
    u_s = u[order]
    first = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
    keep = order[first]
    val = np.asarray(cat["value"], dtype=np.float64)[keep]
    return pa.table(
        {
            "user_id": pa.array(u[keep], type=pa.int64()),
            "ts_s": pa.array(ts[keep], type=pa.int64()),
            "event_type": cat["event_type"].take(pa.array(keep)),
            "value": pa.array(sql_round(val, round_decimals), type=pa.float64()),
        }
    )
