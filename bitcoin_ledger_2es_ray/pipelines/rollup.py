"""ES *rollup* — ``PUT _rollup/job`` + ``_rollup_search``.

A rollup job continuously pre-aggregates a time-series index into a compact
rollup index holding each (date_histogram bucket × group term) with the
MERGEABLE sufficient statistics of the configured metrics; queries then run
against the rollup at any COARSER interval, never touching the raw index.

- ``rollup_events``: the job — one streamed ``map_batches`` pass over
  ``events`` emits per-batch (bucket_s, event_type) partials carrying
  (n, Σvalue, min, max); the combine is bounded by #buckets × #types
  (never by corpus size — the whole point of a rollup), so it is a driver
  Arrow group_by like ``date_histogram_stats``; the result is written as
  the rollup index (parquet, overwrite — re-running the job replaces it).
- ``rollup_search``: answers a coarser date_histogram + stats per term
  from the rollup ONLY — re-buckets the rollup rows and merges their
  sufficient stats (Σn, Σsum, min-of-min, max-of-max; avg = Σsum/Σn).
  count/sum/min/max/avg are exactly what the raw data would answer —
  the mergeability that makes rollup lossless for these metrics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round


def rollup_events(sf_dir: str, out_path: str, interval_s: int = 3600) -> str:
    """Run the rollup job: events → (bucket_s, event_type, n, sm, mn, mx)
    parquet at ``out_path``.  Returns ``out_path``."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()), 1_000_000)
        bucket = pc.multiply(pc.divide(epoch, interval_s), interval_s)
        t = pa.table(
            {
                "bucket_s": bucket,
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        agg = t.group_by(["bucket_s", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )
        return pa.table(
            {
                "bucket_s": agg["bucket_s"].cast(pa.int64()),
                "event_type": agg["event_type"],
                "n": agg["value_count"].cast(pa.int64()),
                "sm": agg["value_sum"],
                "mn": agg["value_min"],
                "mx": agg["value_max"],
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by(["bucket_s", "event_type"]).aggregate(
        [("n", "sum"), ("sm", "sum"), ("mn", "min"), ("mx", "max")]
    )
    out = g.select(
        ["bucket_s", "event_type", "n_sum", "sm_sum", "mn_min", "mx_max"]
    ).rename_columns(["bucket_s", "event_type", "n", "sm", "mn", "mx"]).sort_by(
        [("bucket_s", "ascending"), ("event_type", "ascending")]
    )
    pq.write_table(out, out_path)
    return out_path


def rollup_search(
    rollup_path: str, interval_s: int = 86400, round_decimals: int = 6
) -> pa.Table:
    """Coarser date_histogram + per-term stats answered from the rollup
    index alone → (bucket_s, event_type, doc_count, min_value, max_value,
    sum_value, avg_value), sorted by (bucket, term)."""
    import pyarrow.parquet as pq

    r = pq.read_table(rollup_path)
    bucket = pc.multiply(
        pc.divide(r["bucket_s"].combine_chunks(), interval_s), interval_s
    )
    t = pa.table(
        {
            "bucket_s": bucket,
            "event_type": r["event_type"],
            "n": r["n"],
            "sm": r["sm"],
            "mn": r["mn"],
            "mx": r["mx"],
        }
    )
    g = t.group_by(["bucket_s", "event_type"]).aggregate(
        [("n", "sum"), ("sm", "sum"), ("mn", "min"), ("mx", "max")]
    )
    n = np.asarray(g["n_sum"], dtype=np.float64)
    sm = np.asarray(g["sm_sum"], dtype=np.float64)
    return pa.table(
        {
            "bucket_s": g["bucket_s"].cast(pa.int64()),
            "event_type": g["event_type"],
            "doc_count": g["n_sum"].cast(pa.int64()),
            "min_value": pa.array(
                sql_round(np.asarray(g["mn_min"], dtype=np.float64), round_decimals)
            ),
            "max_value": pa.array(
                sql_round(np.asarray(g["mx_max"], dtype=np.float64), round_decimals)
            ),
            "sum_value": pa.array(sql_round(sm, round_decimals)),
            "avg_value": pa.array(sql_round(sm / n, round_decimals)),
        }
    ).sort_by([("bucket_s", "ascending"), ("event_type", "ascending")])
