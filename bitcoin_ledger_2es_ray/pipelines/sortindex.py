"""Index sorting (ES ``index.sort``) + early-terminated sorted top-k.

Elasticsearch's index sorting stores each segment's documents physically
ordered by one or more fields, so a search sorted by the same fields can
stop after the first ``k`` docs per segment instead of visiting them all.

The Ray-Data graft is a SORTED VIEW of the forward map:

- ``build_sorted_view``  range-partitions the rows into ``num_buckets``
  key buckets (boundaries from a bounded first-row-group sample — never a
  whole-table driver read), sorts WITHIN each bucket, and writes one
  parquet file per bucket plus a tiny manifest (bucket → row count,
  min/max key).  Assignment is one vectorized ``searchsorted`` per batch;
  the per-bucket sorts run as independent ``map_groups`` tasks — this is
  exactly Ray Data's distributed sort shape, but with deterministic,
  resumable, NAMED output (re-runs overwrite atomically per bucket).
- ``sorted_topk``  reads bucket files in key order and stops as soon as
  ``k`` rows are buffered — the manifest's row counts prove how many
  buckets were touched, and the function returns that number so tests and
  benches can assert early termination (buckets_read ≪ num_buckets for
  k ≪ n).

At 100 TB the view build is one shuffle-equivalent pass (map-side bucket
assignment moves each row once; no global sort barrier), and every sorted
query after it is O(k) I/O.  Ties break by ``doc_id`` ascending, like the
engine's (score, doc) rule.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST = "sorted_view.json"


def build_sorted_view(
    index_dir: str,
    field: str = "dl",
    out_dir: str | None = None,
    num_buckets: int = 16,
    sample_rows: int = 4096,
) -> str:
    """Build the range-bucketed sorted view of ``forward_map`` on ``field``.

    Boundaries come from the first parquet row group(s) only (``sample_rows``
    cap) — the same bounded-sample discipline as the IVF trainer.  Each
    bucket file is written atomically (tmp → rename) by its own Ray task via
    ``groupby().map_groups``; the manifest records bucket order, row counts
    and key ranges.  Idempotent: an existing manifest short-circuits.
    """
    import ray.data as rd

    fm = os.path.join(index_dir, "forward_map")
    out_dir = out_dir or os.path.join(index_dir, f"sorted_{field}")
    man_path = os.path.join(out_dir, _MANIFEST)
    if os.path.exists(man_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # bounded sample for boundaries: first row group(s) of the first file
    files = sorted(
        os.path.join(fm, f) for f in os.listdir(fm) if f.endswith(".parquet")
    )
    pf = pq.ParquetFile(files[0])
    got: list[np.ndarray] = []
    n = 0
    for i in range(pf.metadata.num_row_groups):
        col = pf.read_row_group(i, columns=[field])[field]
        got.append(col.to_numpy(zero_copy_only=False))
        n += len(got[-1])
        if n >= sample_rows:
            break
    sample = np.concatenate(got)[:sample_rows].astype(np.float64)
    qs = np.linspace(0.0, 1.0, num_buckets + 1)[1:-1]
    boundaries = np.unique(np.quantile(sample, qs))

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[field].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(boundaries, v, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        v = g[field].to_numpy(zero_copy_only=False).astype(np.float64)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, v))
        t = g.drop(["bucket"]).take(pa.array(order))
        path = os.path.join(out_dir, f"bucket_{b:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=8192)
        os.replace(tmp, path)
        vals = v[order]
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int64()),
                "n_rows": pa.array([len(vals)], type=pa.int64()),
                "key_min": pa.array([float(vals[0])], type=pa.float64()),
                "key_max": pa.array([float(vals[-1])], type=pa.float64()),
            }
        )

    ds = rd.read_parquet(fm, columns=["doc_id", field])
    man = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket")
    )
    tmp = f"{man_path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "field": field,
                "boundaries": boundaries.tolist(),
                "buckets": man.to_dict(orient="records"),
            },
            f,
        )
    os.replace(tmp, man_path)
    return out_dir


def sorted_topk(view_dir: str, k: int) -> tuple[pa.Table, int]:
    """Top-``k`` rows by (field ASC, doc_id ASC) off the sorted view with
    EARLY TERMINATION: bucket files are visited in key order and reading
    stops once ``k`` rows are buffered.  Returns (table, buckets_read) —
    the second element is the early-termination evidence."""
    with open(os.path.join(view_dir, _MANIFEST)) as f:
        man = json.load(f)
    field = man["field"]
    parts: list[pa.Table] = []
    have = 0
    read = 0
    for b in man["buckets"]:
        if have >= k:
            break
        t = pq.read_table(
            os.path.join(view_dir, f"bucket_{int(b['bucket']):05d}.parquet")
        )
        parts.append(t)
        have += t.num_rows
        read += 1
    if not parts:
        return pa.table({}), 0
    out = pa.concat_tables(parts)
    # buckets are disjoint key ranges and internally sorted, so the concat
    # is already globally sorted — slice is enough, but re-sorting k rows
    # is cheap insurance against manifest reordering
    out = out.sort_by([(field, "ascending"), ("doc_id", "ascending")])
    return out.slice(0, k), read
