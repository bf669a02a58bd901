"""Audit engine-vs-oracle result DTYPES for every queries() entry.

The driver's value-hash is computed on the raw frames (columns sorted by
name), so a dtype divergence (e.g. DuckDB HUGEINT sum -> float64 vs the
engine's int64) can red-out a query whose values match exactly.  This
audit runs every engine query and its oracle SQL at sf0.001 and reports
column-by-column dtype mismatches.

Usage: python tools/dtype_audit.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

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
    return res.to_pandas()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            continue
        t0 = time.monotonic()
        try:
            mine = to_pandas(fn(sf_dir))
            orc = con.sql(sqls[name]).df()
        except Exception as ex:  # pragma: no cover - audit tool
            print(f"ERR   {name}: {type(ex).__name__}: {ex}")
            bad += 1
            continue
        wall = time.monotonic() - t0
        mismatch = []
        for c in sorted(set(mine.columns) & set(orc.columns)):
            a, b = mine[c].dtype, orc[c].dtype
            if a != b:
                mismatch.append(f"{c}: engine={a} oracle={b}")
        if set(mine.columns) != set(orc.columns):
            mismatch.append(
                f"columns differ: engine={sorted(mine.columns)} "
                f"oracle={sorted(orc.columns)}"
            )
        if mismatch:
            bad += 1
            print(f"DTYPE {name}: " + "; ".join(mismatch) + f" [{wall:.1f}s]")
        else:
            print(f"ok    {name} [{wall:.1f}s]")
    print(f"{'ALL DTYPES OK' if not bad else f'{bad} MISMATCHES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
