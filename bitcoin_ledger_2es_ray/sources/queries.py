"""Fixed query set (FIXTURES.md §C) — the "reference query set" stand-in.

Deterministic function of the corpus vocabulary: for q in 0..n-1, take the
``1 + q % 3`` sorted-vocab indices ``{q % c, (7q+3) % c, (13q+11) % c}``
(deduped, first-occurrence order), k=10.  Covers single-term, multi-term,
rare-term (``dup``) and all-head-term queries.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import QUERIES


def fixture_query_terms(vocab: list[str], n: int = 50) -> list[list[str]]:
    vocab = sorted(vocab)
    c = len(vocab)
    out = []
    for q in range(n):
        idxs = [q % c, (7 * q + 3) % c, (13 * q + 11) % c][: 1 + q % 3]
        dedup = list(dict.fromkeys(idxs))
        out.append([vocab[i] for i in dedup])
    return out


def read_queries(path: str) -> pa.Table:
    """S5: query-set reader (QUERIES-schema parquet)."""
    import pyarrow.parquet as pq

    from ..schemas import QUERIES as QSCHEMA
    from ..schemas import cast_to

    return cast_to(pq.read_table(path), QSCHEMA)


def write_results(results, path: str) -> str:
    """S5: results writer — accepts a RESULTS-schema Dataset or Table."""
    import pyarrow as _pa

    from ..state.manifest import atomic_write_parquet

    if isinstance(results, _pa.Table):
        atomic_write_parquet(results, path)
    else:  # ray.data.Dataset → partitioned directory sink (overwrite: Ray's
        # default APPEND would stack a re-run's files on the previous run's)
        results.write_parquet(path, mode="overwrite")
    return path


def fixture_queries(vocab: list[str], n: int = 50, k: int = 10) -> pa.Table:
    terms = fixture_query_terms(vocab, n)
    return pa.table(
        {
            "query_id": pa.array(range(n), type=pa.uint64()),
            "text": pa.array([" ".join(t) for t in terms], type=pa.string()),
            "k": pa.array([k] * n, type=pa.uint32()),
        },
        schema=QUERIES,
    )
