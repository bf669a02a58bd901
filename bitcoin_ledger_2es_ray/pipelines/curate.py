"""Composed corpus-curation pipelines — the shape a real training-data
run takes: quality features ▸ language filter ▸ exact-dedup representative
selection, all streaming, with the joins distributed.

- ``curate_corpus``       one pass of quality features + filters, joined
                          (hash-partitioned ``Dataset.join``) against the
                          exact-dedup representative set — keeps exactly
                          one surviving doc per distinct content
- ``top_quality_per_lang`` per-language top-k by (quality DESC, doc_id
                          ASC) via ``groupby(lang).map_groups`` — the
                          grouped-top-k primitive

Both are SQL-expressible and value-gated against DuckDB oracles in
``__ray_entry__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import quality_batch

__all__ = ["curate_corpus", "top_quality_per_lang"]


def _read_docs_lang(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def curate_corpus(
    sf_dir: str,
    min_tokens: int = 20,
    max_mean_tok_len: float = 8.0,
    langs: tuple[str, ...] = ("en", "fr"),
) -> pa.Table:
    """Curated doc set: (doc_id, lang, n_tokens, quality), sorted by doc_id.

    Keep a doc iff it passes the length/shape/language filters AND is the
    exact-dedup representative (min doc_id) of its content.  Features and
    filters run in one ``map_batches`` pass (content never leaves the
    stage); the representative set comes from the sha256 groupby and joins
    back with a hash-partitioned ``Dataset.join`` — no driver-side set.
    """
    from ray.data.aggregate import Min

    lang_set = set(langs)

    def features(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = (
            (np.asarray(q["n_tokens"]) >= min_tokens)
            & (np.asarray(q["mean_tok_len"]) <= max_mean_tok_len)
            & np.isin(np.asarray(batch["lang"]), list(lang_set))
        )
        return q.select(["doc_id", "lang", "n_tokens", "quality"]).filter(
            pa.array(keep)
        )

    def content_hash(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "h": pa.array(h)}
        )

    docs = _read_docs_lang(sf_dir)
    feats = docs.map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
    reps = (
        docs.map_batches(content_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"))
        .drop_columns(["h"])
    )
    joined = feats.join(
        reps,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
        right_on=("rep_doc_id",),
    )
    import ray

    t = pa.concat_tables(
        [x if isinstance(x := ray.get(r), pa.Table) else pa.Table.from_batches([x])
         for r in joined.to_arrow_refs()]
    )
    return t.select(["doc_id", "lang", "n_tokens", "quality"]).sort_by("doc_id")


def top_quality_per_lang(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-language top-k docs by (quality DESC, doc_id ASC):
    (lang, rank, doc_id, quality) — grouped top-k via map_groups."""

    def features(batch: pa.Table) -> pa.Table:
        return quality_batch(batch).select(["doc_id", "lang", "quality"])

    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("rank", pa.int64()),
            ("doc_id", pa.int64()),
            ("quality", pa.float64()),
        ]
    )

    def topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        q = np.asarray(group["quality"])
        d = np.asarray(group["doc_id"])
        order = np.lexsort((d, -q))[:k]
        return pa.table(
            {
                "lang": pa.array(
                    [group["lang"][0].as_py()] * len(order), type=pa.string()
                ),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(d[order].astype(np.int64), type=pa.int64()),
                "quality": pa.array(q[order].astype(np.float64), type=pa.float64()),
            },
            schema=schema,
        )

    out = (
        _read_docs_lang(sf_dir)
        .map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
    )
    import ray

    # groupby can emit EMPTY blocks carrying the upstream schema — drop them
    tabs = [
        x if isinstance(x := ray.get(r), pa.Table) else pa.Table.from_batches([x])
        for r in out.to_arrow_refs()
    ]
    tabs = [t for t in tabs if t.num_rows] or [pa.Table.from_pylist([], schema=schema)]
    return pa.concat_tables(tabs).sort_by(
        [("lang", "ascending"), ("rank", "ascending")]
    )
