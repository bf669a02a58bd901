"""Fixed, explicit pyarrow schemas for every inter-stage table.

SURVEY.md §1.2: all inter-stage schemas are declared and asserted — no dynamic
or inferred schemas anywhere.  Schema drift at 10^12-file scale is a
silent-corruption vector, so every stage asserts its input/output against
these objects (``assert_schema``).

The input shape is mandated by BASELINE.json L15:
``(repo: string, path: string, commit: string, lang: string, content: string)``.
"""

from __future__ import annotations

import pyarrow as pa

# bump when the on-disk index layout changes — participates in the build
# fingerprint so stale cross-round checkpoint caches rebuild instead of
# being misread
FORMAT_VERSION = 1

# ---------------------------------------------------------------------------
# corpus (input) — exact shape mandated by BASELINE.json L15.
# ``large_string`` variants are accepted on read and cast down per batch.
CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# corpus + reference-provided expected content hash (the per-row invariant:
# sha256(content) equality is enforced during ingest, BASELINE.json L15).
CORPUS_WITH_SHA = CORPUS.append(pa.field("sha256", pa.binary(32)))

# corpus after ingest verification + deterministic docID assignment + doc length
CORPUS_V = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("sha256", pa.binary(32)),
        ("doc_id", pa.uint64()),
        ("dl", pa.uint32()),
    ]
)

# docID → (repo, path, commit) forward map (BASELINE.json L6)
FORWARD_MAP = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("sha256", pa.binary(32)),
        ("dl", pa.uint32()),
    ]
)

# exploded posting triples, pre-shuffle (one row per distinct (term, doc)).
# ``dl`` (the doc's BM25 length) travels WITH the posting so that the
# term-partitioned segments are self-contained for scoring — no per-doc
# norms table has to be broadcast to scorers at 10^12-doc scale.
POSTINGS_RAW = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.uint64()),
        ("tf", pa.uint32()),
        ("dl", pa.uint32()),
        ("salt", pa.uint16()),
        ("shard", pa.uint32()),
    ]
)

# POSTINGS_RAW + per-posting positional payload (BuildConfig.with_positions):
# ``positions`` is the delta-varbyte stream of the token's sorted in-doc
# positions; its value count equals tf, so the stream needs no length prefix.
POSTINGS_RAW_POS = POSTINGS_RAW.append(pa.field("positions", pa.binary()))

# per-128-posting block metadata for block-max WAND (BASELINE.json L6).
# (max_tf, min_dl) give a safe per-block score upper bound: tf_norm is
# increasing in tf and decreasing in dl (functions.bm25.block_upper_bound).
BLOCK_META = pa.struct(
    [
        ("first_doc", pa.uint64()),
        ("last_doc", pa.uint64()),
        ("max_tf", pa.uint32()),
        ("min_dl", pa.uint32()),
        ("off_docs", pa.uint32()),  # byte offset of block start in doc_ids
        ("off_tfs", pa.uint32()),  # byte offset of block start in tfs
        ("off_dls", pa.uint32()),  # byte offset of block start in dls
    ]
)

# one row per (term, salt) in a shard's segment file; doc_ids is
# delta+varbyte-compressed, tfs and dls are varbyte-compressed.
# A salted head term has n_salt rows across shards, each owning the
# doc-disjoint slice ``doc_id % n_salt == salt`` — slices can be scored
# independently and exactly (partial dfs sum to the true df).
SEGMENT = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.uint16()),
        ("df", pa.uint32()),
        ("cf", pa.uint64()),
        ("max_tf", pa.uint32()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("block_meta", pa.list_(BLOCK_META)),
    ]
)

# SEGMENT + positional payload: ``positions`` is the run's concatenation of
# its postings' delta-varbyte position streams, in doc_id order (posting k
# contributes tf[k] values — decode the whole run, then segment by tf).
SEGMENT_POS = SEGMENT.append(pa.field("positions", pa.binary()))

# globally term-sorted dictionary (FST-style sorted keys, BASELINE.json L6).
# May hold multiple rows per term (one per salt slice of a head term);
# the true df/cf of a term is the sum over its rows.
TERM_DICT = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.uint16()),
        ("partition", pa.uint32()),
        ("row", pa.uint32()),
        ("df", pa.uint32()),
        ("cf", pa.uint64()),
    ]
)

# single-row global stats
STATS = pa.schema(
    [
        ("n_docs", pa.uint64()),
        ("total_dl", pa.uint64()),
        ("avgdl", pa.float64()),
        ("n_terms", pa.uint64()),
    ]
)

QUERIES = pa.schema(
    [
        ("query_id", pa.uint64()),
        ("text", pa.string()),
        ("k", pa.uint32()),
    ]
)

RESULTS = pa.schema(
    [
        ("query_id", pa.uint64()),
        ("rank", pa.uint32()),
        ("doc_id", pa.uint64()),
        ("score", pa.float64()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, where: str = "") -> None:
    """Hard-fail when a stage's table drifts from its declared schema."""
    if table.schema != schema:
        raise AssertionError(
            f"schema drift{' at ' + where if where else ''}:\n"
            f"  got      {table.schema}\n  expected {schema}"
        )


def cast_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a compatible table (e.g. large_string content) to the fixed schema."""
    return table.select(schema.names).cast(schema)
