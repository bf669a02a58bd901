"""EQL (pipelines/eql.py): parser shapes, event queries + pipes vs
DuckDB, sequence/sample state machine vs an independent linear-scan
reference implementing the same documented greedy semantics."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from bitcoin_ledger_2es_ray.pipelines.eql import parse_eql, run_eql

from conftest import SF_DIR


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return con.execute(sql).arrow()


def _eq(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names
    assert a.num_rows == b.num_rows
    for c in a.column_names:
        assert a[c].to_pylist() == b[c].to_pylist(), c


# ------------------------------------------------------------------ parser


def test_parse_shapes():
    p = parse_eql(
        "sequence by user_id with maxspan=7d "
        '[signup where true] [purchase where value > 10.0] '
        "until [error where true] | head 5"
    )
    assert p.kind == "sequence" and p.by == ["user_id"]
    assert p.maxspan_s == 7 * 86400 and len(p.queries) == 2
    assert p.queries[0] == ("signup", None)
    assert p.until is not None and p.until[0] == "error"
    assert p.pipes == [("head", 5)]
    p2 = parse_eql("sample by user_id [a where true] [b where true]")
    assert p2.kind == "sample" and len(p2.queries) == 2
    p3 = parse_eql('any where value > 1.0 | count')
    assert p3.kind == "event" and p3.queries[0][0] is None

    with pytest.raises(ValueError, match="at least two"):
        parse_eql("sequence by user_id [a where true]")
    with pytest.raises(ValueError, match="exactly one"):
        parse_eql(
            "sequence by u [a where true] [b where true] "
            "until [c where true] [d where true]"
        )
    with pytest.raises(ValueError, match="unknown pipe"):
        parse_eql("any where true | explode")
    with pytest.raises(ValueError, match="positive count"):
        parse_eql("any where true | head 0")
    with pytest.raises(ValueError, match="unknown event fields"):
        run_eql("any where nope > 1", SF_DIR)


# ----------------------------------------------------------- event queries


def test_event_query_head_tail_count(ray_session):
    got = run_eql("any where value > 250.0 | head 7", SF_DIR)
    want = _duck(
        "SELECT * FROM events WHERE value > 250.0 "
        "ORDER BY ts, event_id LIMIT 7"
    )
    _eq(got, want)
    got2 = run_eql('purchase where value > 100.0 | count', SF_DIR)
    want2 = _duck(
        "SELECT count(*)::BIGINT AS count FROM events "
        "WHERE event_type = 'purchase' AND value > 100.0"
    )
    _eq(got2, want2)
    got3 = run_eql("any where value > 250.0 | tail 4", SF_DIR)
    want3 = _duck(
        "SELECT * FROM (SELECT * FROM events WHERE value > 250.0 "
        "ORDER BY ts DESC, event_id DESC LIMIT 4) ORDER BY ts, event_id"
    )
    _eq(got3, want3)
    # no bounding pipe -> ES's default size=10
    assert run_eql("any where value > 0.0", SF_DIR).num_rows == 10


def test_event_query_unique(ray_session):
    got = run_eql("any where value > 200.0 | unique event_type", SF_DIR)
    want = _duck(
        "SELECT event_id, ts, user_id, event_type, value, props FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY event_type "
        "    ORDER BY ts, event_id) AS rn FROM events WHERE value > 200.0"
        ") WHERE rn = 1 ORDER BY ts, event_id"
    )
    _eq(got, want)


# ----------------------------------------------- sequence / sample machine


def _greedy_reference(step_times, until_times, maxspan):
    """Independent linear-scan implementation of the documented greedy
    earliest-completion non-overlap semantics."""
    out, cursor = [], -(10**18)
    while True:
        t1 = next((t for t in step_times[0] if t > cursor), None)
        if t1 is None:
            return out
        times, prev, miss = [t1], t1, False
        for k in range(1, len(step_times)):
            tk = next((t for t in step_times[k] if t > prev), None)
            if tk is None:
                return out
            if maxspan is not None and tk - t1 > maxspan:
                miss = True
                break
            times.append(tk)
            prev = tk
        if miss:
            cursor = t1
            continue
        if until_times:
            u = next((t for t in until_times if t > t1), None)
            if u is not None and u < prev:
                cursor = u
                continue
        out.append(tuple(times))
        cursor = prev
    return out


def _per_user_times(sf_dir):
    import pandas as pd
    import pyarrow.parquet as pq

    df = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    ).to_pandas()
    # arrow timestamp[us] -> pandas datetime64[us]: int64 IS microseconds
    df["t_us"] = df["ts"].astype("int64")
    return df


@pytest.mark.parametrize("maxspan,until", [
    ("with maxspan=30d ", ""),
    ("with maxspan=3d ", ""),
    ("with maxspan=30d ", "until [purchase where true] "),
    ("", ""),
])
def test_sequence_matches_reference(ray_session, maxspan, until):
    src = (
        f"sequence by user_id {maxspan}"
        "[signup where true] [click where value > 50.0] [error where true] "
        f"{until}"
    )
    got = run_eql(src, SF_DIR)
    df = _per_user_times(SF_DIR)
    span_s = None
    if "maxspan=30d" in maxspan:
        span_s = 30 * 86400 * 1_000_000
    elif "maxspan=3d" in maxspan:
        span_s = 3 * 86400 * 1_000_000
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("t_us")
        steps = [
            sorted(g[g.event_type == "signup"].t_us),
            sorted(g[(g.event_type == "click") & (g.value > 50.0)].t_us),
            sorted(g[g.event_type == "error"].t_us),
        ]
        uts = sorted(g[g.event_type == "purchase"].t_us) if until else None
        if any(len(s) == 0 for s in steps):
            continue
        for i, m in enumerate(
            _greedy_reference(steps, uts, span_s), 1
        ):
            rows.append((uid, i, *m, m[-1] - m[0]))
    assert got.num_rows == len(rows)
    got_rows = list(zip(*[got[c].to_pylist() for c in got.column_names]))
    assert got_rows == rows


def test_sample_matches_oracle(ray_session):
    got = run_eql(
        "sample by user_id [signup where true] [error where value > 20.0]",
        SF_DIR,
    )
    want = _duck(
        "SELECT user_id, "
        "epoch_us(min(ts) FILTER (event_type = 'signup')) AS t1_us, "
        "epoch_us(min(ts) FILTER (event_type = 'error' AND value > 20.0)) "
        "  AS t2_us "
        "FROM events GROUP BY 1 "
        "HAVING count(*) FILTER (event_type = 'signup') > 0 AND "
        "count(*) FILTER (event_type = 'error' AND value > 20.0) > 0 "
        "ORDER BY 1"
    )
    _eq(got, want)


def test_sequence_pipes(ray_session):
    full = run_eql(
        "sequence by user_id [signup where true] [error where true]", SF_DIR
    )
    head = run_eql(
        "sequence by user_id [signup where true] [error where true] | head 5",
        SF_DIR,
    )
    assert head.num_rows == min(5, full.num_rows)
    _eq(head, full.slice(0, 5))
    cnt = run_eql(
        "sequence by user_id [signup where true] [error where true] | count",
        SF_DIR,
    )
    assert cnt["count"].to_pylist() == [full.num_rows]


def test_sequence_machine_property():
    """Hypothesis: the searchsorted machine == the linear-scan reference
    on random event streams (random step memberships, spans, untils)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.eql import _sequence_machine

    @settings(max_examples=200, deadline=None)
    @given(
        times=st.lists(
            st.integers(min_value=0, max_value=500), min_size=0,
            max_size=60, unique=True,
        ),
        memb=st.data(),
        n_steps=st.integers(min_value=2, max_value=4),
        maxspan=st.one_of(st.none(), st.integers(min_value=1, max_value=100)),
        with_until=st.booleans(),
    )
    def check(times, memb, n_steps, maxspan, with_until):
        times = sorted(times)
        step_times = [[] for _ in range(n_steps)]
        until_times = []
        for t in times:
            for k in range(n_steps):
                if memb.draw(st.booleans()):
                    step_times[k].append(t)
            if with_until and memb.draw(st.booleans()):
                until_times.append(t)
        st_np = [np.array(s, dtype=np.int64) for s in step_times]
        ut_np = (
            np.array(until_times, dtype=np.int64) if with_until else None
        )
        if any(len(s) == 0 for s in st_np):
            return
        got = _sequence_machine(st_np, ut_np, maxspan)
        want = _greedy_reference(
            step_times, until_times if with_until else None, maxspan
        )
        assert got == want

    check()


def test_cli_eql(ray_session, capsys):
    import json as _json

    from bitcoin_ledger_2es_ray.cli import main

    capsys.readouterr()
    rc = main([
        "eql",
        "sequence by user_id [signup where true] [error where true] | head 3",
        "--sf-dir", SF_DIR,
    ])
    out = capsys.readouterr().out
    assert rc == 0
    rows = [_json.loads(line) for line in out.strip().splitlines()]
    assert len(rows) == 3 and all("span_us" in r for r in rows)


def test_sequence_runs(ray_session):
    # [x] with runs=2 == [x] [x]
    a = run_eql(
        "sequence by user_id [click where true] with runs=2 "
        "[error where true]",
        SF_DIR,
    )
    b = run_eql(
        "sequence by user_id [click where true] [click where true] "
        "[error where true]",
        SF_DIR,
    )
    assert a.to_pydict() == b.to_pydict()
    with pytest.raises(ValueError, match="runs must be"):
        parse_eql("sequence by u [a where true] with runs=0 [b where true]")


def test_sequence_compound_by(ray_session):
    # sequence by (user_id, event_type) == per-(user, type) value runs
    got = run_eql(
        "sequence by user_id, event_type "
        "[any where value < 50.0] [any where value > 250.0]",
        SF_DIR,
    )
    assert set(got.column_names) == {
        "user_id", "event_type", "match_no", "t1_us", "t2_us", "span_us"
    }
    # reference: per (user, type) greedy pairing
    df = _per_user_times(SF_DIR)
    import pyarrow.parquet as pq

    full = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "event_type", "ts", "value"],
    ).to_pandas()
    full["t_us"] = full["ts"].astype("int64")
    rows = []
    for (uid, et), g in full.groupby(["user_id", "event_type"]):
        steps = [
            sorted(g[g.value < 50.0].t_us),
            sorted(g[g.value > 250.0].t_us),
        ]
        if any(len(s) == 0 for s in steps):
            continue
        for i, m in enumerate(_greedy_reference(steps, None, None), 1):
            rows.append((uid, et, i, *m, m[-1] - m[0]))
    rows.sort()
    got_rows = sorted(zip(*[got[c].to_pylist() for c in [
        "user_id", "event_type", "match_no", "t1_us", "t2_us", "span_us"
    ]]))
    assert got_rows == rows
    # sample with compound keys
    sam = run_eql(
        "sample by user_id, event_type "
        "[any where value < 10.0] [any where value > 300.0]",
        SF_DIR,
    )
    assert sam.column_names == ["user_id", "event_type", "t1_us", "t2_us"]
