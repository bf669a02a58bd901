"""Local stand-in for the driver's correctness gate.

Runs entry() as a smoke check, then every queries()[name](sf_dir) against
oracle_sql()[name] via DuckDB at sf0.01: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns).

Usage: python tools/driver_check.py [sf_dir] [--chunk N]

--chunk N runs the query list in N-sized chunks, each in a FRESH
subprocess (own Ray session): ray 2.49's core worker intermittently
crashes (task_manager.cc CompletePendingTask check) deep into a single
session that executes ~400 datasets; chunking bounds the blast radius
and retries nothing silently — a crashed chunk fails loudly.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _chunk_main(sf_dir: str, chunk: int) -> int:
    """Run the full list in fresh-subprocess chunks of ``chunk`` queries."""
    import subprocess

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    names = list(e.queries())
    rc = 0
    for lo in range(0, len(names), chunk):
        sel = names[lo : lo + chunk]
        env = dict(os.environ, DRIVER_CHECK_ONLY=",".join(sel))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir], env=env
        )
        rc |= r.returncode
    print("CHUNKED:", "ALL OK" if rc == 0 else "FAILURES")
    return rc


def main() -> int:
    argv = sys.argv[1:]
    chunk = None
    if "--chunk" in argv:
        i = argv.index("--chunk")
        chunk = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if chunk:
        return _chunk_main(sf_dir, chunk)
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("DRIVER_CHECK_CPUS", "8")),
        include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    t0 = time.monotonic()
    r = e.entry()
    print(f"entry(): {type(r).__name__} rows={r.num_rows if hasattr(r, 'num_rows') else len(r)} "
          f"({time.monotonic() - t0:.1f}s)")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    only = os.environ.get("DRIVER_CHECK_ONLY")
    if only:
        keep = set(only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: engine raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(mine)} rows (no SQL oracle) [{wall:.1f}s]")
            continue
        try:
            orc = normalize(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if list(mine.columns) != list(orc.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} != {list(orc.columns)}")
            failures += 1
            continue
        if len(mine) != len(orc):
            print(f"FAIL  {name}: rows {len(mine)} != {len(orc)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, orc, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK    {name}: {len(mine)} rows match [{wall:.1f}s]")
        except AssertionError as ex:
            print(f"FAIL  {name}: value mismatch: {str(ex)[:400]}")
            failures += 1
    ray.shutdown()
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
