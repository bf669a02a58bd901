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


def execute_range_policy() -> pa.Table:
    """Materialize a RANGE policy (ES enrich ``match_type: range``): the
    acctbal tier table — [lo, hi) intervals with a decoration payload.
    Dimension-sized like every enrich index."""
    return pa.table(
        {
            "lo": pa.array([-100000.0, 0.0, 2500.0, 5000.0], type=pa.float64()),
            "hi": pa.array([0.0, 2500.0, 5000.0, 1e12], type=pa.float64()),
            "tier": pa.array(["neg", "low", "mid", "high"], type=pa.string()),
        }
    )


def enrich_customers_range(sf_dir: str) -> pa.Table:
    """ES enrich processor with a RANGE policy: every customer decorated
    with the tier whose [lo, hi) interval contains c_acctbal — one
    ``searchsorted`` against the broadcast boundaries per batch (the
    range index never moves; the fact stream never shuffles).  Returns
    (tier, n, bal_cents) partial-combined per tier — bounded by the
    range count, never the corpus."""
    import numpy as np
    import ray
    import ray.data as rd

    policy = execute_range_policy()
    bounds_ref = ray.put(
        (
            policy["lo"].to_numpy(zero_copy_only=False),
            policy["tier"].to_pylist(),
        )
    )

    def decorate(batch: pa.Table) -> pa.Table:
        lo, tiers = ray.get(bounds_ref)
        bal = np.asarray(batch["c_acctbal"], dtype=np.float64)
        # interval containment == searchsorted over the sorted lows
        # (the policy's ranges tile the line, like ES range fields)
        idx = np.clip(np.searchsorted(lo, bal, side="right") - 1, 0, None)
        cents = np.rint(bal * 100.0).astype(np.int64)
        t = pa.table(
            {
                "tier": pa.array([tiers[i] for i in idx], type=pa.string()),
                "n": pa.array(np.ones(len(bal), np.int64)),
                "bal_cents": pa.array(cents),
            }
        )
        g = t.group_by("tier").aggregate([("n", "sum"), ("bal_cents", "sum")])
        return g.rename_columns(["tier", "n", "bal_cents"])

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
    ).map_batches(decorate, batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.blocks import collect_tables

    parts = pa.concat_tables(collect_tables(ds))
    g = parts.group_by("tier").aggregate([("n", "sum"), ("bal_cents", "sum")])
    return g.rename_columns(["tier", "n", "bal_cents"]).sort_by("tier")
