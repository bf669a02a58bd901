"""ES *enrich* — ``PUT _enrich/policy`` + the ``enrich`` ingest processor.

Elasticsearch enrich works in two phases: *execute policy* materializes the
source index into a compact system ``.enrich-*`` lookup index, and the
ingest pipeline's ``enrich`` processor then decorates every incoming doc
with the matched fields at index time.  The Ray-Data-first equivalents:

- ``execute_enrich_policy``: build the lookup table ONCE — here the
  match-policy chain nation ▸ region collapsed to
  (n_nationkey → n_name, r_name).  It is dimension-sized (the classic
  small side), so it is a driver-built Arrow table, exactly what every
  other broadcast stage in this repo ships via ``ray.put``.
- ``enrich_customers``: the processor itself — the lookup broadcast once,
  the fact stream (``customer``) decorated inside ``map_batches`` with one
  vectorized Arrow join per batch.  No shuffle at any scale: the enrich
  index rides the object store to every task, the 100-TB fact side never
  moves.  Unmatched keys keep the doc and append nulls (ES's default
  ``ignore_missing`` behavior).
"""

from __future__ import annotations

import pyarrow as pa


def execute_enrich_policy(sf_dir: str) -> pa.Table:
    """Materialize the match policy nation ▸ region →
    (n_nationkey, n_name, r_name) enrich index."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    j = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    return j.select(["n_nationkey", "n_name", "r_name"]).sort_by("n_nationkey")


def enrich_customers(sf_dir: str) -> pa.Table:
    """Stream ``customer`` through the enrich processor → (c_custkey,
    c_mktsegment, n_name, r_name) sorted by c_custkey."""
    import ray
    import ray.data as rd

    lookup_ref = ray.put(execute_enrich_policy(sf_dir))

    def decorate(batch: pa.Table) -> pa.Table:
        j = batch.join(
            ray.get(lookup_ref),
            keys="c_nationkey",
            right_keys="n_nationkey",
            join_type="left outer",
        )
        return j.select(["c_custkey", "c_mktsegment", "n_name", "r_name"])

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    ).map_batches(decorate, batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.blocks import collect_tables

    return pa.concat_tables(collect_tables(ds)).sort_by("c_custkey")
