"""Parent-child join analogs (ES `has_child` / `has_parent`)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from bitcoin_ledger_2es_ray.pipelines.joins import has_child_orders, has_parent_lineitems

SF_DIR = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_has_child_matches_duckdb(ray_session, con):
    mine = _norm(has_child_orders(SF_DIR, min_quantity=40.0).to_pandas())
    orc = _norm(
        con.sql(
            """
            SELECT o.o_orderkey, o.o_orderpriority,
                   count(*)::BIGINT AS n_matches,
                   max(l.l_quantity) AS max_qty,
                   round(sum(l.l_quantity), 6) AS sum_qty
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 40 GROUP BY 1, 2
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    assert len(mine) > 0


def test_has_child_no_matches_is_empty(ray_session):
    out = has_child_orders(SF_DIR, min_quantity=1e9)
    assert out.num_rows == 0
    assert out.column_names == [
        "o_orderkey", "o_orderpriority", "n_matches", "max_qty", "sum_qty",
    ]


def test_has_parent_broadcast_matches_duckdb(ray_session, con):
    mine = _norm(has_parent_lineitems(SF_DIR, priority="1-URGENT").to_pandas())
    orc = _norm(
        con.sql(
            """
            SELECT l.l_orderkey, l.l_linenumber::BIGINT AS l_linenumber, l.l_quantity
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    assert len(mine) > 0


def test_has_parent_join_identical_to_broadcast(ray_session):
    a = has_parent_lineitems(SF_DIR, priority="2-HIGH", method="broadcast")
    b = has_parent_lineitems(SF_DIR, priority="2-HIGH", method="join")
    assert a.schema == b.schema
    pd.testing.assert_frame_equal(_norm(a.to_pandas()), _norm(b.to_pandas()))


def test_has_parent_empty_parent_set(ray_session):
    out = has_parent_lineitems(SF_DIR, priority="NO-SUCH-PRIORITY")
    assert out.num_rows == 0
    assert out.column_names == ["l_orderkey", "l_linenumber", "l_quantity"]


def test_has_parent_unknown_method_raises(ray_session):
    with pytest.raises(ValueError):
        has_parent_lineitems(SF_DIR, method="nope")


def test_enrich_customers_decorates_and_keeps_unmatched(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.enrich import (
        enrich_customers,
        execute_enrich_policy,
    )

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], type=pa.int64()),
                "n_name": ["ALPHA", "BETA"],
                "n_regionkey": pa.array([0, 9], type=pa.int64()),  # 9 unmatched
            }
        ),
        f"{sf}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0], type=pa.int64()),
                "r_name": ["R0"],
            }
        ),
        f"{sf}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                "c_name": ["a", "b", "c"],
                "c_nationkey": pa.array([0, 1, 7], type=pa.int64()),  # 7 unmatched
                "c_acctbal": [1.0, 2.0, 3.0],
                "c_mktsegment": ["X", "Y", "Z"],
            }
        ),
        f"{sf}/customer.parquet",
    )
    pol = execute_enrich_policy(sf)
    assert pol.to_pydict() == {
        "n_nationkey": [0, 1],
        "n_name": ["ALPHA", "BETA"],
        "r_name": ["R0", None],  # nation with no region still enrichable
    }
    got = enrich_customers(sf)
    assert got.to_pydict() == {
        "c_custkey": [1, 2, 3],
        "c_mktsegment": ["X", "Y", "Z"],
        "n_name": ["ALPHA", "BETA", None],
        "r_name": ["R0", None, None],  # unmatched keys keep the doc, null fields
    }


# ---------------------------------------------------------------------------
# nested / reverse_nested


def test_nested_query_per_object_conjunction(ray_session, tmp_path):
    """The defining nested-vs-flattened case: an order whose quantity and
    discount conditions hold on DIFFERENT lineitems must NOT match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.joins import nested_query_orders

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
            }
        ),
        f"{sf}/orders.parquet",
    )
    # order 1: both conditions on ONE line (match, twice)
    # order 2: qty on line A, discount on line B only (cross-object — no match)
    # order 3: neither
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
                "l_quantity": pa.array([50.0, 49.0, 50.0, 10.0, 10.0]),
                "l_discount": pa.array([0.0, 0.01, 0.05, 0.0, 0.0]),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    out = nested_query_orders(sf, qty_min=45.0, disc_max=0.01).to_pylist()
    assert out == [
        {"o_orderkey": 1, "o_orderpriority": "1-URGENT", "n_matching": 2}
    ]


def test_nested_query_matches_duckdb(ray_session, con):
    from bitcoin_ledger_2es_ray.pipelines.joins import nested_query_orders

    mine = _norm(nested_query_orders(SF_DIR, qty_min=45.0, disc_max=0.02).to_pandas())
    orc = _norm(
        con.sql(
            """
            SELECT o.o_orderkey, o.o_orderpriority, count(*)::BIGINT AS n_matching
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE l.l_quantity >= 45 AND l.l_discount <= 0.02 GROUP BY 1, 2
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    assert len(mine) > 0


def test_reverse_nested_matches_duckdb(ray_session, con):
    from bitcoin_ledger_2es_ray.pipelines.joins import reverse_nested_agg

    mine = _norm(reverse_nested_agg(SF_DIR).to_pandas())
    orc = _norm(
        con.sql(
            """
            SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS n_parents,
                   count(*)::BIGINT AS n_children
            FROM lineitem GROUP BY 1
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    # parents never exceed children
    assert (mine["n_parents"] <= mine["n_children"]).all()


def test_nested_inner_hits_brute_force(ray_session):
    """inner_hits: per-parent top-3 matching nested objects, batch-split
    invariant (partial top-k per batch merges to the global answer)."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.joins import nested_inner_hits

    sf = "/root/testdata/sf0.001"
    out = nested_inner_hits(sf, qty_min=45.0, disc_max=0.01, size=3)

    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    ).to_pandas()
    m = li[(li.l_quantity >= 45.0) & (li.l_discount <= 0.01)].copy()
    m = m.sort_values(
        ["l_orderkey", "l_quantity", "l_linenumber"], ascending=[True, False, True]
    )
    m["hit_rank"] = m.groupby("l_orderkey").cumcount() + 1
    want = m[m.hit_rank <= 3][
        ["l_orderkey", "hit_rank", "l_linenumber", "l_quantity"]
    ].reset_index(drop=True)

    got = out.to_pandas()
    assert got["o_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["hit_rank"].tolist() == want["hit_rank"].tolist()
    assert got["l_linenumber"].tolist() == want["l_linenumber"].tolist()
    assert np.allclose(got["l_quantity"], want["l_quantity"])
    # every parent has at most `size` inner hits
    assert got.groupby("o_orderkey").size().max() <= 3


def test_parent_id_query_brute_force(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.joins import parent_id_query

    sf = "/root/testdata/sf0.001"
    out = parent_id_query(sf, parent_rank=8)

    orders = sorted(
        pq.read_table(f"{sf}/orders.parquet", columns=["o_orderkey"])["o_orderkey"].to_pylist()
    )
    parent = orders[7]
    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    ).to_pandas()
    want = li[li.l_orderkey == parent].sort_values("l_linenumber")
    assert out["l_orderkey"].to_pylist() == want["l_orderkey"].tolist()
    assert out["l_linenumber"].to_pylist() == want["l_linenumber"].tolist()
    assert out["l_quantity"].to_pylist() == want["l_quantity"].tolist()

    with pytest.raises(ValueError):
        parent_id_query(sf, parent_rank=0)


def test_enrich_range_policy_brute_force(ray_session):
    """Range-policy enrich: searchsorted tier assignment against an
    independent pandas CASE recompute, including the below-lowest clamp."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.enrich import enrich_customers_range

    got = enrich_customers_range(SF_DIR).to_pandas().set_index("tier")
    bal = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_acctbal"]
    )["c_acctbal"].to_numpy(zero_copy_only=False)
    tiers = np.where(
        bal < 0, "neg", np.where(bal < 2500, "low", np.where(bal < 5000, "mid", "high"))
    )
    for t in ("neg", "low", "mid", "high"):
        m = tiers == t
        assert got.loc[t, "n"] == int(m.sum())
        assert got.loc[t, "bal_cents"] == int(np.rint(bal[m] * 100).sum())
    assert int(got["n"].sum()) == len(bal)  # the ranges tile the line


def test_children_agg_matches_duckdb(ray_session, con):
    from bitcoin_ledger_2es_ray.pipelines.joins import children_agg

    mine = _norm(children_agg(SF_DIR).to_pandas())
    orc = _norm(
        con.sql(
            """
            SELECT o.o_orderpriority,
                   count(DISTINCT o.o_orderkey)::BIGINT AS parent_count,
                   count(l.l_orderkey)::BIGINT AS child_count,
                   round(coalesce(sum(l.l_quantity), 0), 6) AS sum_qty,
                   round(avg(l.l_quantity), 6) AS avg_qty
            FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    # bucket parent counts tile the orders table exactly
    assert int(mine["parent_count"].sum()) == con.sql(
        "SELECT count(*) FROM orders"
    ).fetchone()[0]


def test_parent_agg_matches_duckdb(ray_session, con):
    from bitcoin_ledger_2es_ray.pipelines.joins import parent_agg

    mine = _norm(parent_agg(SF_DIR).to_pandas())
    orc = _norm(
        con.sql(
            """
            WITH pairs AS (
              SELECT l_returnflag, l_orderkey, count(*)::BIGINT AS n_child
              FROM lineitem GROUP BY 1, 2
            )
            SELECT p.l_returnflag,
                   sum(p.n_child)::BIGINT AS child_count,
                   count(*)::BIGINT AS parent_count,
                   round(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT))
                         / 100.0, 6) AS sum_totalprice,
                   round((sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT))
                         / 100.0) / count(*), 6) AS avg_totalprice
            FROM pairs p JOIN orders o ON o.o_orderkey = p.l_orderkey
            GROUP BY 1
            """
        ).df()
    )
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, atol=1e-9, rtol=0)
    # every lineitem is counted exactly once across the child buckets
    assert int(mine["child_count"].sum()) == con.sql(
        "SELECT count(*) FROM lineitem"
    ).fetchone()[0]
