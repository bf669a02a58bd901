"""ES parent-child (join field) query analogs — `has_child` / `has_parent`.

Elasticsearch models parent-child with a `join` field and answers
`has_child` ("parents with a matching child, scored by score_mode over the
children") and `has_parent` ("children whose parent matches") by keeping
parent and child docs in the SAME shard (routing by parent id).  The
Ray-Data-first equivalent of that co-location is a hash-partitioned
`Dataset.join` keyed by the parent key — both relations shuffle once by
the same key, which is exactly what ES's routing buys at index time.

Plans (100-TB shape):
- `has_child_orders`: the child predicate is pushed into the parquet scan
  (column pruning + row filter — only matching children leave storage);
  per-batch Arrow hash-agg partials reduce children to per-parent
  (count, max, sum) BEFORE the shuffle, so the groupby moves one row per
  (parent × batch), never one per child; the parent attach is the
  hash-partitioned `Dataset.join`.
- `has_parent_lineitems`: the parent filter prunes at the read; the
  matching-parent key set is the SMALL side by selectivity (one priority
  bucket), broadcast once via `ray.put`, children stream through one
  vectorized `pc.is_in` mask — no shuffle.  `method="join"` is the
  fallback when the parent hit set is too big to broadcast: the same
  hash-partitioned `Dataset.join`, verified identical in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round


def has_child_orders(
    sf_dir: str,
    min_quantity: float = 48.0,
    num_partitions: int = 8,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``has_child``: orders with ≥1 lineitem of quantity ≥ threshold →
    (o_orderkey, o_orderpriority, n_matches, max_qty, sum_qty), sorted by
    order key.  n/max/sum are the ES score_mode family (count/max/sum)
    computed in one pass."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
        filter=pc.field("l_quantity") >= min_quantity,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate(
            [("l_quantity", "count"), ("l_quantity", "max"), ("l_quantity", "sum")]
        )
        return pa.table(
            {
                "o_orderkey": g["l_orderkey"].cast(pa.int64()),
                "n": g["l_quantity_count"].cast(pa.int64()),
                "mx": g["l_quantity_max"],
                "sm": g["l_quantity_sum"],
            }
        )

    agg = (
        kids.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(
            Sum("n", alias_name="n_matches"),
            Max("mx", alias_name="max_qty"),
            Sum("sm", alias_name="sum_qty"),
        )
    )
    # Materialized blocks feed the join directly (agg executes exactly once);
    # the emptiness guard exists because Ray's hash-shuffle join cannot
    # finalize a zero-block side.
    agg = agg.materialize()
    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderpriority": pa.array([], type=pa.string()),
            "n_matches": pa.array([], type=pa.int64()),
            "max_qty": pa.array([], type=pa.float64()),
            "sum_qty": pa.array([], type=pa.float64()),
        }
    )
    if agg.count() == 0:
        return empty
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = agg.join(
        orders,
        join_type="inner",
        num_partitions=min(num_partitions, max(1, agg.count())),
        on=("o_orderkey",),
    )
    parts = [ray.get(r) for r in joined.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
            "n_matches": t["n_matches"].cast(pa.int64()),
            "max_qty": t["max_qty"].cast(pa.float64()),
            "sum_qty": pa.array(
                sql_round(np.asarray(t["sum_qty"], dtype=np.float64), round_decimals),
                type=pa.float64(),
            ),
        }
    ).sort_by("o_orderkey")


def has_parent_lineitems(
    sf_dir: str,
    priority: str = "1-URGENT",
    method: str = "broadcast",
    num_partitions: int = 8,
) -> pa.Table:
    """ES ``has_parent``: lineitems whose parent order has the given
    priority → (l_orderkey, l_linenumber, l_quantity), sorted.

    ``method="broadcast"`` (default): the filtered parent key set ships
    once via ``ray.put`` and children stream through ``pc.is_in`` — right
    whenever one priority bucket ≪ corpus.  ``method="join"``: the
    hash-partitioned ``Dataset.join`` for a non-selective parent filter.
    """
    import ray
    import ray.data as rd

    parents = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") == priority,
    ).select_columns(["o_orderkey"])
    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )

    if method == "join":
        kids = kids.map_batches(
            lambda b: b.append_column("o_orderkey", b["l_orderkey"].cast(pa.int64())),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = kids.join(
            parents, join_type="inner", num_partitions=num_partitions, on=("o_orderkey",)
        )
        cols = ["l_orderkey", "l_linenumber", "l_quantity"]
        out = joined.select_columns(cols)
    elif method == "broadcast":
        blocks = [ray.get(r) for r in parents.to_arrow_refs()]
        blocks = [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in blocks
        ]
        # A fully-pruned scan can yield placeholder blocks without the
        # projected column — keep only real, non-empty blocks.
        blocks = [b for b in blocks if b.num_rows and "o_orderkey" in b.column_names]
        if blocks:
            keys = pa.concat_tables(blocks)["o_orderkey"].combine_chunks()
        else:
            keys = pa.array([], type=pa.int64())
        key_ref = ray.put(keys)

        def mask(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["l_orderkey"], value_set=ray.get(key_ref))
            )

        out = kids.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True)
    else:
        raise ValueError(f"unknown method {method!r}")

    parts = [ray.get(r) for r in out.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "l_linenumber": pa.array([], type=pa.int64()),
                "l_quantity": pa.array([], type=pa.float64()),
            }
        )
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "l_linenumber": t["l_linenumber"].cast(pa.int64()),
            "l_quantity": t["l_quantity"].cast(pa.float64()),
        }
    ).sort_by([("l_orderkey", "ascending"), ("l_linenumber", "ascending")])


def nested_query_orders(
    sf_dir: str,
    qty_min: float = 45.0,
    disc_max: float = 0.01,
    num_partitions: int = 8,
) -> pa.Table:
    """ES ``nested`` query: parents (orders) where AT LEAST ONE nested
    object (lineitem) satisfies ALL inner conditions — the per-OBJECT
    conjunction that distinguishes nested from flattened fields (flattened
    would match an order whose quantity and discount conditions hold on
    DIFFERENT lineitems; nested must not).

    The conjunction evaluates on the lineitem ROW and is pushed into the
    parquet scan (only per-object matches leave storage); per-batch
    per-parent count partials pre-aggregate before the shuffle; the parent
    attach is the hash-partitioned ``Dataset.join`` — the same co-location
    ES's nested mapping buys by storing nested docs in the parent's block.
    Returns (o_orderkey, o_orderpriority, n_matching) sorted by key, with
    n_matching = ES ``score_mode: "sum"`` over matches_count."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_discount"],
        filter=(pc.field("l_quantity") >= qty_min) & (pc.field("l_discount") <= disc_max),
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([("l_quantity", "count")])
        return pa.table(
            {
                "o_orderkey": g["l_orderkey"].cast(pa.int64()),
                "n": g["l_quantity_count"].cast(pa.int64()),
            }
        )

    agg = (
        kids.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(Sum("n", alias_name="n_matching"))
        .materialize()
    )
    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderpriority": pa.array([], type=pa.string()),
            "n_matching": pa.array([], type=pa.int64()),
        }
    )
    if agg.count() == 0:
        return empty
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = agg.join(
        orders,
        join_type="inner",
        # a near-empty partition set trips Ray 2.49's hash-join finalize on
        # empty-schema blocks — never use more partitions than keys
        num_partitions=min(num_partitions, max(1, agg.count())),
        on=("o_orderkey",),
    )
    parts = [ray.get(r) for r in joined.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"],
            "n_matching": t["n_matching"].cast(pa.int64()),
        }
    ).sort_by("o_orderkey")


def nested_inner_hits(
    sf_dir: str,
    qty_min: float = 45.0,
    disc_max: float = 0.01,
    size: int = 3,
) -> pa.Table:
    """ES ``nested`` query with ``inner_hits``: for every matching parent,
    the top-``size`` MATCHING nested objects themselves, ranked inside the
    parent by (l_quantity DESC, l_linenumber ASC) — what ES returns in the
    ``inner_hits`` section next to each hit.

    Same pushed-down per-object conjunction as ``nested_query_orders``; the
    per-parent top-``size`` is a per-BATCH vectorized partial (lexsort +
    per-parent rank mask), so at most ``size × parents_in_batch`` rows ever
    leave a task, then one bounded driver merge re-ranks across batches —
    inner hits are size-bounded per parent by construction, never
    lineitem-count-sized.  Returns (o_orderkey, hit_rank, l_linenumber,
    l_quantity), sorted."""
    import numpy as np
    import ray
    import ray.data as rd

    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
        filter=(pc.field("l_quantity") >= qty_min) & (pc.field("l_discount") <= disc_max),
    )

    def topk_in_parent(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], dtype=np.int64)
        ln = np.asarray(batch["l_linenumber"], dtype=np.int64)
        qty = np.asarray(batch["l_quantity"], dtype=np.float64)
        order = np.lexsort((ln, -qty, ok))
        ok_s = ok[order]
        # rank within parent: position minus the parent run's start
        starts = np.flatnonzero(np.r_[True, ok_s[1:] != ok_s[:-1]])
        runs = np.diff(np.r_[starts, len(ok_s)])
        rank = np.arange(len(ok_s)) - np.repeat(starts, runs)
        keep = order[rank < size]
        return pa.table(
            {
                "o_orderkey": pa.array(ok[keep], type=pa.int64()),
                "l_linenumber": pa.array(ln[keep], type=pa.int64()),
                "l_quantity": pa.array(qty[keep], type=pa.float64()),
            }
        )

    ds = kids.map_batches(topk_in_parent, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "hit_rank": pa.array([], type=pa.int64()),
                "l_linenumber": pa.array([], type=pa.int64()),
                "l_quantity": pa.array([], type=pa.float64()),
            }
        )
    cat = pa.concat_tables(parts)
    ok = np.asarray(cat["o_orderkey"], dtype=np.int64)
    ln = np.asarray(cat["l_linenumber"], dtype=np.int64)
    qty = np.asarray(cat["l_quantity"], dtype=np.float64)
    order = np.lexsort((ln, -qty, ok))
    ok_s = ok[order]
    starts = np.flatnonzero(np.r_[True, ok_s[1:] != ok_s[:-1]])
    runs = np.diff(np.r_[starts, len(ok_s)])
    rank = np.arange(len(ok_s)) - np.repeat(starts, runs)
    keep = order[rank < size]
    final_rank = (rank[rank < size] + 1).astype(np.int64)
    return pa.table(
        {
            "o_orderkey": pa.array(ok[keep], type=pa.int64()),
            "hit_rank": pa.array(final_rank, type=pa.int64()),
            "l_linenumber": pa.array(ln[keep], type=pa.int64()),
            "l_quantity": pa.array(qty[keep], type=pa.float64()),
        }
    )


def reverse_nested_agg(sf_dir: str) -> pa.Table:
    """ES ``reverse_nested`` inside a nested ``terms`` agg: bucket the
    NESTED docs (lineitems by l_returnflag), then step back out to the
    parent level — per bucket, the count of DISTINCT parent orders next to
    the raw child count.

    Exact-distinct plan: one Ray groupby on (flag, parent) collapses pairs
    (the only corpus-sized shuffle, keyed by the pair), then per-batch
    partials over the collapsed rows reduce to #flags rows on the driver —
    bucket cardinality is bounded, so the combine is O(flags)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_orderkey"],
    )
    pairs = (
        kids.groupby(["l_returnflag", "l_orderkey"])
        .aggregate(Count(alias_name="n_children"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_returnflag").aggregate(
            [("l_orderkey", "count"), ("n_children", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "p": g["l_orderkey_count"].cast(pa.int64()),
                "c": g["n_children_sum"].cast(pa.int64()),
            }
        )

    reduced = (
        pairs.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("p", alias_name="n_parents"), Sum("c", alias_name="n_children"))
    )
    parts = [ray.get(r) for r in reduced.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "l_returnflag": t["l_returnflag"],
            "n_parents": t["n_parents"].cast(pa.int64()),
            "n_children": t["n_children"].cast(pa.int64()),
        }
    ).sort_by("l_returnflag")


def parent_id_query(sf_dir: str, parent_rank: int = 8) -> pa.Table:
    """ES ``parent_id`` query: the child docs of ONE given parent →
    (l_orderkey, l_linenumber, l_quantity), sorted by line number.

    The parent id is derived in both engines (no parameter plumbing): the
    ``parent_rank``-th smallest ``o_orderkey``.  Finding it is NOT a
    global sort — each batch keeps its ``parent_rank`` smallest keys
    (bounded partial top-k), the driver folds partials bounded by
    rank × #blocks.  The child fetch then pushes ``l_orderkey == parent``
    into the parquet scan, so only that order's lines leave storage —
    exactly the shard-routed point lookup ES's join field buys."""
    import ray.data as rd

    from ..functions.blocks import collect_tables

    if parent_rank < 1:
        raise ValueError("parent_rank must be >= 1")

    def smallest(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch["o_orderkey"], dtype=np.int64))[:parent_rank]
        return pa.table({"o_orderkey": pa.array(k, type=pa.int64())})

    heads = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    ).map_batches(smallest, batch_format="pyarrow", zero_copy_batch=True)
    keys = np.unique(
        np.asarray(pa.concat_tables(collect_tables(heads))["o_orderkey"], dtype=np.int64)
    )
    if len(keys) < parent_rank:
        raise ValueError("fewer orders than parent_rank")
    parent = int(keys[parent_rank - 1])

    kids = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
        filter=pc.field("l_orderkey") == parent,
    )
    parts = collect_tables(kids)
    if not parts:
        return pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "l_linenumber": pa.array([], type=pa.int64()),
                "l_quantity": pa.array([], type=pa.float64()),
            }
        )
    t = pa.concat_tables(parts).sort_by("l_linenumber")
    return pa.table(
        {
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "l_linenumber": t["l_linenumber"].cast(pa.int64()),
            "l_quantity": pc.cast(t["l_quantity"], pa.float64()),
        }
    )


def children_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``children`` aggregation: a ``terms`` agg over a PARENT field
    (orders by ``o_orderpriority``), stepping down into the child docs
    (lineitems) per bucket — parent doc_count plus the child sub-agg
    family (child doc_count, sum / avg of ``l_quantity``).

    Shape: the parent (key → bucket-code) map is read once, encoded to
    int8 codes against the SORTED parent key array, and broadcast via
    ``ray.put``; children stream through ``map_batches`` with ONE
    searchsorted lookup per batch and reduce to per-bucket partials —
    the child table never shuffles and the driver combine is bounded by
    the bucket count.  Beyond ~200k parents the map no longer broadcasts:
    switch to the hash-partitioned ``Dataset.join`` exactly as
    ``has_child_orders`` does (same output, one all-to-all)."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    keys = np.asarray(orders["o_orderkey"], dtype=np.int64)
    prio = orders["o_orderpriority"].combine_chunks().dictionary_encode()
    buckets = [s.as_py() for s in prio.dictionary]
    codes = prio.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys, codes = keys[order], codes[order]
    parent_counts = np.bincount(codes, minlength=len(buckets))
    map_ref = ray.put((keys, codes))

    def partial(batch: pa.Table) -> pa.Table:
        k, c = ray.get(map_ref)
        if len(k) == 0:
            return pa.table(
                {
                    "b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.float64()),
                }
            )
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), dtype=np.int64)
        qty = np.asarray(batch["l_quantity"].combine_chunks(), dtype=np.float64)
        pos = np.searchsorted(k, ok)
        hit = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == ok)
        b = c[pos[hit]]
        n = np.bincount(b, minlength=len(c) and int(c.max()) + 1)
        s = np.bincount(b, weights=qty[hit], minlength=len(n))
        return pa.table(
            {
                "b": pa.array(np.arange(len(n)), type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "s": pa.array(s, type=pa.float64()),
            }
        )

    from ..functions.blocks import collect_tables

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cat = pa.concat_tables(collect_tables(ds, on_empty="children_agg: no children"))
    g = cat.group_by("b").aggregate([("n", "sum"), ("s", "sum")])
    n_child = np.zeros(len(buckets), dtype=np.int64)
    s_child = np.zeros(len(buckets), dtype=np.float64)
    bs = g["b"].to_numpy(zero_copy_only=False)
    n_child[bs] = g["n_sum"].to_numpy(zero_copy_only=False)
    s_child[bs] = g["s_sum"].to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            "o_orderpriority": pa.array(buckets, type=pa.string()),
            "parent_count": pa.array(parent_counts, type=pa.int64()),
            "child_count": pa.array(n_child, type=pa.int64()),
            "sum_qty": pa.array(
                sql_round(s_child, round_decimals), type=pa.float64()
            ),
            "avg_qty": pa.array(
                sql_round(
                    np.divide(
                        s_child, n_child, out=np.zeros_like(s_child),
                        where=n_child > 0,
                    ),
                    round_decimals,
                ),
                type=pa.float64(),
                mask=n_child == 0,  # ES avg over an empty bucket is null
            ),
        }
    ).sort_by("o_orderpriority")
    return out


def parent_agg(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``parent`` aggregation — the inverse of ``children_agg``: a
    ``terms`` agg over a CHILD field (lineitems by ``l_returnflag``),
    stepping UP into the parent docs (orders) per bucket.  Per bucket:
    child doc_count, parent doc_count (DISTINCT parents with >=1 child in
    the bucket), and parent sub-aggs (sum / avg of ``o_totalprice`` over
    those distinct parents — each parent counted ONCE, the ES contract).

    Shape: children reduce to distinct (flag, parent) pairs via per-batch
    Arrow hash-agg partials (carrying the per-pair child count) followed by
    ONE groupby on the pair key — the only shuffle, and it moves one row
    per distinct pair per batch, never one per child.  The parent metric
    map (o_orderkey -> o_totalprice) is read once, sorted, broadcast via
    ``ray.put``, and each deduped pair batch attaches the metric with one
    searchsorted — the combine is bounded by the bucket count.  Beyond
    ~200k parents the broadcast flips to the hash-partitioned
    ``Dataset.join`` exactly as ``has_child_orders`` does."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from ..functions.blocks import collect_tables

    parents = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )
    pk = np.asarray(parents["o_orderkey"], dtype=np.int64)
    # exact integer cents: partial sums of integers are exact in float64
    # below 2^53, so the combine is order-independent (bit-stable vs SQL)
    pv = np.rint(
        np.asarray(parents["o_totalprice"], dtype=np.float64) * 100.0
    )
    order = np.argsort(pk, kind="stable")
    pk, pv = pk[order], pv[order]
    map_ref = ray.put((pk, pv))

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_orderkey"]).aggregate(
            [("l_orderkey", "count")]
        )
        return pa.table(
            {
                "flag": g["l_returnflag"],
                "parent": g["l_orderkey"].cast(pa.int64()),
                "n_child": g["l_orderkey_count"].cast(pa.int64()),
            }
        )

    pairs = (
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_orderkey"],
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["flag", "parent"])
        .aggregate(Sum("n_child", alias_name="n_child"))
    )

    def bucket_partial(batch: pa.Table) -> pa.Table:
        k, v = ray.get(map_ref)
        par = np.asarray(batch["parent"].combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(k, par)
        hit = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == par)
        price = np.where(hit, v[np.minimum(pos, len(k) - 1)], 0.0)
        g = pa.table(
            {
                "flag": batch["flag"],
                "p": pa.array(hit.astype(np.int64)),
                "s": pa.array(price, type=pa.float64()),
                "c": batch["n_child"],
            }
        ).group_by("flag").aggregate([("p", "sum"), ("s", "sum"), ("c", "sum")])
        return pa.table(
            {
                "flag": g["flag"],
                "p": g["p_sum"].cast(pa.int64()),
                "s": g["s_sum"].cast(pa.float64()),
                "c": g["c_sum"].cast(pa.int64()),
            }
        )

    reduced = pairs.map_batches(bucket_partial, batch_format="pyarrow")
    cat = pa.concat_tables(
        collect_tables(reduced, on_empty="parent_agg: no children")
    )
    g = cat.group_by("flag").aggregate([("p", "sum"), ("s", "sum"), ("c", "sum")])
    n_parent = g["p_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_price = g["s_sum"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
    return pa.table(
        {
            "l_returnflag": g["flag"],
            "child_count": g["c_sum"].cast(pa.int64()),
            "parent_count": pa.array(n_parent, type=pa.int64()),
            "sum_totalprice": pa.array(
                sql_round(s_price, round_decimals), type=pa.float64()
            ),
            "avg_totalprice": pa.array(
                sql_round(
                    np.divide(
                        s_price,
                        n_parent,
                        out=np.zeros_like(s_price),
                        where=n_parent > 0,
                    ),
                    round_decimals,
                ),
                type=pa.float64(),
                mask=n_parent == 0,
            ),
        }
    ).sort_by("l_returnflag")
