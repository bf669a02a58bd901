"""Driver-side block-layout helpers for Ray Data inputs.

``ray.data.from_arrow(table)`` yields ONE block, so a downstream
``map_batches(..., concurrency=N)`` actor pool launches at most one task and
starves N-1 actors (Ray warns exactly this).  ``from_arrow_blocks`` slices
the table into ``n_blocks`` row ranges and feeds them as separate blocks so
the pool parallelizes.  Order across blocks is preserved by Ray Data's
deterministic block ordering; callers that need a global order sort anyway.
"""

from __future__ import annotations

import pyarrow as pa


def from_arrow_blocks(table: pa.Table, n_blocks: int):
    """Dataset over ``table`` split into ``n_blocks`` row-range blocks."""
    import ray.data as rd

    n = table.num_rows
    if n == 0:
        return rd.from_arrow(table)
    n_blocks = max(1, min(n_blocks, n))
    per = (n + n_blocks - 1) // n_blocks
    parts = [table.slice(i, per) for i in range(0, n, per)]
    return rd.from_arrow(parts)


def collect_tables(ds, on_empty: str | None = None) -> list[pa.Table]:
    """Materialize a (small, already-reduced) Dataset as a list of
    non-empty Arrow tables — the shared driver-side collect idiom.

    ``on_empty``: if every block is empty, raise ValueError with this
    message instead of returning []."""
    import ray

    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [
        p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts and on_empty is not None:
        raise ValueError(on_empty)
    return parts
