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

import numpy as np
import pyarrow as pa

from ..functions.hashing import sha256_column
from .textstats import quality_batch

__all__ = [
    "curate_corpus",
    "curate_corpus_ds",
    "curate_corpus_to_parquet",
    "hash_split",
    "hash_split_ds",
    "hash_split_to_parquet",
    "top_quality_per_lang",
]


def _read_docs_lang(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def curate_corpus_ds(
    sf_dir: str,
    min_tokens: int = 20,
    max_mean_tok_len: float = 8.0,
    langs: tuple[str, ...] = ("en", "fr"),
):
    """Curated doc set as a DATASET: (doc_id, lang, n_tokens, quality).

    Keep a doc iff it passes the length/shape/language filters AND is the
    exact-dedup representative (min doc_id over the WHOLE corpus) of its
    content.  ONE fused ``map_batches`` pass computes both the quality
    features and the content sha256 (the corpus is read once — VERDICT r2;
    content never leaves the stage); the narrow per-doc table is
    materialized in the object store so the two branches (filtered
    features / sha256 groupby → representative set) don't re-run the read,
    then a hash-partitioned ``Dataset.join`` keeps the representatives —
    no driver-side set anywhere.
    """
    from ray.data.aggregate import Min

    lang_set = set(langs)

    def features_and_hash(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        keep = (
            (np.asarray(q["n_tokens"]) >= min_tokens)
            & (np.asarray(q["mean_tok_len"]) <= max_mean_tok_len)
            & np.isin(np.asarray(batch["lang"]), list(lang_set))
        )
        return q.select(["doc_id", "lang", "n_tokens", "quality"]).append_column(
            "h", sha256_column(batch["text"]).cast(pa.binary())
        ).append_column("keep", pa.array(keep))

    per_doc = (
        _read_docs_lang(sf_dir)
        .map_batches(features_and_hash, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    feats = per_doc.filter(expr="keep").drop_columns(["h", "keep"])
    reps = (
        per_doc.select_columns(["doc_id", "h"])
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"))
        .drop_columns(["h"])
    )
    return feats.join(
        reps,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
        right_on=("rep_doc_id",),
    )


def curate_corpus(
    sf_dir: str,
    min_tokens: int = 20,
    max_mean_tok_len: float = 8.0,
    langs: tuple[str, ...] = ("en", "fr"),
) -> pa.Table:
    """Driver-table wrapper over ``curate_corpus_ds`` (oracle gate); the
    scale path is ``curate_corpus_to_parquet``."""
    import ray

    joined = curate_corpus_ds(sf_dir, min_tokens, max_mean_tok_len, langs)
    t = pa.concat_tables(
        [x if isinstance(x := ray.get(r), pa.Table) else pa.Table.from_batches([x])
         for r in joined.to_arrow_refs()]
    )
    return t.select(["doc_id", "lang", "n_tokens", "quality"]).sort_by("doc_id")


def curate_corpus_to_parquet(sf_dir: str, out_dir: str, **kw) -> str:
    """Scale sink: the curated set streams straight to partitioned parquet —
    the O(n_docs) output never materializes on the driver."""
    ds = curate_corpus_ds(sf_dir, **kw)
    ds.select_columns(["doc_id", "lang", "n_tokens", "quality"]).write_parquet(
        out_dir, mode="overwrite"
    )
    return out_dir


# train/val/test cut points over the first sha256 byte: <0xcc (204/256 ≈
# 79.7%) train, <0xe6 (26/256 ≈ 10.2%) val, rest test.  Byte thresholds keep
# the SQL oracle exact: equal-length lowercase hex strings compare in numeric
# order, so DuckDB's substr(sha256(text),1,2) < 'cc' is the same predicate.
SPLIT_CUTS: tuple[tuple[str, int], ...] = (("train", 0xCC), ("val", 0xE6))


def hash_split_ds(sf_dir: str, cuts: tuple[tuple[str, int], ...] = SPLIT_CUTS):
    """Deterministic train/val/test assignment as a streaming Dataset:
    split = first byte of sha256(content) against the ``cuts`` thresholds.

    Content-hash splitting is the standard leakage-safe scheme for
    training corpora: the assignment is a pure function of the BYTES, so
    exact duplicates land in the same split on any machine, any cluster
    size, any shard order — no RNG state to coordinate, nothing to
    shuffle.  One streamed pass, the hash reuses the buffer-level
    ``sha256_column`` kernel."""

    def assign(batch: pa.Table) -> pa.Table:
        digests = sha256_column(batch["text"])
        first = np.frombuffer(
            digests.buffers()[1], dtype=np.uint8
        ).reshape(-1, 32)[:, 0]
        split = np.full(len(first), "test", dtype=object)
        for name, hi in reversed(cuts):
            split[first < hi] = name
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(sf_dir: str, cuts: tuple[tuple[str, int], ...] = SPLIT_CUTS) -> pa.Table:
    """(doc_id, split) — see ``hash_split_ds``."""
    import ray

    ds = hash_split_ds(sf_dir, cuts)
    t = pa.concat_tables(
        [x if isinstance(x := ray.get(r), pa.Table) else pa.Table.from_batches([x])
         for r in ds.to_arrow_refs()]
    )
    return t.sort_by("doc_id")


def hash_split_to_parquet(
    sf_dir: str, out_dir: str, cuts: tuple[tuple[str, int], ...] = SPLIT_CUTS
) -> str:
    """Scale sink: the assignment streams to partitioned parquet."""
    hash_split_ds(sf_dir, cuts).write_parquet(out_dir, mode="overwrite")
    return out_dir


def pack_sequences(sf_dir: str, budget: int = 256) -> pa.Table:
    """LLM training-data sequence packing: concatenate the corpus in
    doc_id order and cut fixed ``budget``-token chunks — each doc gets its
    global token offset and the chunk its first token lands in →
    (doc_id, tok_offset, chunk_id).

    A global prefix sum does not fit one pass, so this is the classic
    TWO-PHASE scan: phase 1 tokenize-counts each parquet row group in a
    parallel Ray task (emitting the per-group (doc_id, dl) arrays into
    the object store — never the text); the driver exclusive-scans the
    per-group totals (O(#row groups), tiny); phase 2 tasks add each
    group's base offset to its within-group exclusive cumsum.  Work is
    proportional to corpus size, driver state to row-group count.  Chunk
    boundaries may split a doc — GPT-2-style packing concatenates and
    slices, it does not pad per doc.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    if budget <= 0:
        raise ValueError("budget must be positive")
    path = f"{sf_dir}/documents.parquet"

    @ray.remote(num_cpus=1)
    def count_rg(rg: int) -> pa.Table:
        t = pq.ParquetFile(path).read_row_group(rg, columns=["doc_id", "text"])
        dl = pc.add(pc.count_substring(t["text"], " "), 1).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "dl": dl})

    @ray.remote(num_cpus=1)
    def summarize(part: pa.Table) -> tuple[int, int, int]:
        dl = part["dl"]
        ids = part["doc_id"]
        s = int(pc.sum(dl).as_py() or 0)
        return s, int(pc.min(ids).as_py()), int(pc.max(ids).as_py())

    n_rgs = pq.ParquetFile(path).metadata.num_row_groups
    refs = [count_rg.remote(rg) for rg in range(n_rgs)]
    # driver sees only (total, min_id, max_id) per group — the per-doc
    # arrays stay in the object store for phase 2
    sums = ray.get([summarize.remote(r) for r in refs])
    prev_max = -1
    for s, lo, hi in sums:  # the file must be doc_id-ordered (it is — the
        if lo <= prev_max:  # corpus writer emits rows in id order)
            raise ValueError("documents.parquet is not doc_id-ordered by row group")
        prev_max = hi
    totals = [s for s, _, _ in sums]
    bases = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)

    @ray.remote(num_cpus=1)
    def assign(part: pa.Table, base: int) -> pa.Table:
        dl = np.asarray(part["dl"], dtype=np.int64)
        ids = np.asarray(part["doc_id"], dtype=np.int64)
        if len(ids) > 1 and np.any(np.diff(ids) <= 0):
            raise ValueError("row group not doc_id-ordered")
        off = base + np.concatenate(([0], np.cumsum(dl)[:-1]))
        return pa.table(
            {
                "doc_id": part["doc_id"],
                "tok_offset": pa.array(off),
                "chunk_id": pa.array(off // budget),
            }
        )

    out = [assign.remote(r, int(b)) for r, b in zip(refs, bases)]
    return pa.concat_tables(ray.get(out)).sort_by("doc_id")


def shuffle_order(sf_dir: str, seed: str = "s0") -> pa.Table:
    """Deterministic global training-order shuffle: rank every doc by
    ``sha256(doc_id ':' seed)`` → (doc_id, shuffle_rank).

    Training runs need a reproducible corpus permutation that any worker
    can recompute — hash-ordering gives one with no RNG state: change the
    seed string, get an independent permutation.  The plan is the
    distributed sort + ENUMERATE shape: per-batch key computation, a Ray
    Data ``sort`` on the key (all-to-all by design — a global permutation
    IS a shuffle), then ranks assigned per sorted block with driver-side
    base offsets (O(#blocks) driver state, same two-phase scan as
    ``pack_sequences``).  Keys are lowercase hex so engine order matches
    the SQL oracle's string order exactly."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def add_key(batch: pa.Table) -> pa.Table:
        # build "doc_id:seed" with Arrow kernels, hash with the buffer-level
        # sha256 kernel; sorting on the binary digest orders identically to
        # the hex string the SQL oracle sorts by
        ids = pc.cast(batch["doc_id"].combine_chunks(), pa.string())
        s = pc.binary_join_element_wise(ids, f":{seed}", "")
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "key": sha256_column(s).cast(pa.binary()),
            }
        )

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .sort("key")
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    out, base = [], 0
    for p in parts:  # blocks come back in global sort order
        out.append(
            pa.table(
                {
                    "doc_id": p["doc_id"],
                    "shuffle_rank": pa.array(
                        np.arange(base, base + p.num_rows, dtype=np.int64)
                    ),
                }
            )
        )
        base += p.num_rows
    return pa.concat_tables(out).sort_by("doc_id")


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


def stratified_sample(sf_dir: str, frac: float = 0.2) -> pa.Table:
    """Stratified per-language sample with EXACT proportional allocation:
    from each lang stratum, the ceil(frac × |stratum|) docs with the
    smallest sha256(content) — deterministic (pure function of bytes, like
    ``hash_split``) but exact per-stratum, where the hash-threshold split
    is only exact in expectation.

    Plan: one streamed pass computes (doc_id, lang, sha) per batch; the
    per-stratum rank runs in ``groupby(lang).map_groups`` — the same
    partitioning key and assumption as ``top_quality_per_lang`` (one lang's
    rows fit one group; salt a hot lang if a real corpus breaks that).
    Returns (doc_id, lang) sorted by doc_id."""
    import ray

    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")

    def keyed(batch: pa.Table) -> pa.Table:
        digests = sha256_column(batch["text"])
        sha = pa.array([v.hex() for v in digests.to_pylist()], type=pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "lang": batch["lang"],
                "sha": sha,
            }
        )

    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])

    def head(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        n_keep = int(np.ceil(frac * group.num_rows))
        g = group.sort_by("sha").slice(0, n_keep)
        return g.select(["doc_id", "lang"]).cast(schema)

    ds = (
        _read_docs_lang(sf_dir)
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(head, batch_format="pyarrow")
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.Table.from_pylist([], schema=schema)
    return pa.concat_tables(parts).sort_by("doc_id")


def mixing_weights(sf_dir: str, alpha: float = 0.5, round_decimals: int = 6) -> pa.Table:
    """Training-mixture sampling weights per source: weight ∝ n_tokensᵅ
    (the sub-linear up/down-sampling rule LLM data recipes use to keep
    large sources from dominating).  One streamed pass emits per-batch
    (source, n_docs, n_tokens) partials; the driver fold is bounded by
    the source count.  Returns (source, n_docs, n_tokens, weight),
    Σweight = 1."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..functions.bm25 import sql_round

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        t = pa.table({"source": batch["source"], "tok": toks.cast(pa.int64())})
        g = t.group_by("source").aggregate([("tok", "sum"), ("tok", "count")])
        return pa.table(
            {
                "source": g["source"],
                "tok": g["tok_sum"].cast(pa.int64()),
                "n": g["tok_count"].cast(pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by("source").aggregate([("tok", "sum"), ("n", "sum")]).sort_by("source")
    tok = np.asarray(g["tok_sum"], dtype=np.float64)
    w = tok**alpha
    w = w / w.sum()
    return pa.table(
        {
            "source": g["source"],
            "n_docs": g["n_sum"].cast(pa.int64()),
            "n_tokens": g["tok_sum"].cast(pa.int64()),
            "weight": pa.array(sql_round(w, round_decimals), type=pa.float64()),
        }
    )


def mixture_select(
    sf_dir: str,
    budget_total: int = 25_000,
    alpha: float = 0.5,
) -> pa.Table:
    """EXECUTE the training mixture: per-source token-budgeted selection.

    Budgets derive from the ``mixing_weights`` rule (weight ∝ n_tokensᵅ,
    budget_s = ⌊weight_s · budget_total⌋); within a source, docs are taken
    longest-first — (dl DESC, doc_id ASC), the packing-friendly order — and
    a doc is selected iff the tokens of all docs before it are still under
    the source's budget (fill-until-budget, deterministic, no RNG).

    Scale plan (no per-source global sort): selection in (dl DESC, doc ASC)
    order is a THRESHOLD — all docs with dl above a per-source cut dl*, plus
    the first k ties at dl* by doc_id.  Pass 1 streams (source, dl)
    value-count partials (driver combine bounded by #sources × #distinct
    dl) and derives every cut; pass 2 streams ONLY the tie docs (bounded by
    tie counts) to fix each doc_id cutoff; pass 3 emits the selection with
    one broadcast map-side filter.  Raw docs never sort, never shuffle.
    Returns (doc_id, source, dl), doc_id ASC."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def hist_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(batch["text"], " ")).cast(pa.int64())
        t = pa.table({"source": batch["source"], "dl": toks})
        g = t.group_by(["source", "dl"]).aggregate([("dl", "count")])
        return g.rename_columns(["source", "dl", "n"])

    docs_path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(docs_path, columns=["source", "text"]).map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    hist = (
        cat.group_by(["source", "dl"])
        .aggregate([("n", "sum")])
        .rename_columns(["source", "dl", "n"])
        .sort_by([("source", "ascending"), ("dl", "descending")])
    )

    src = np.asarray(hist["source"])
    dls = np.asarray(hist["dl"], dtype=np.int64)
    cnt = np.asarray(hist["n"], dtype=np.int64)
    sources = sorted(set(src.tolist()))
    tok_by_src = {s: int((dls[src == s] * cnt[src == s]).sum()) for s in sources}
    w = np.array([tok_by_src[s] for s in sources], dtype=np.float64) ** alpha
    w = w / w.sum()
    budgets = {s: int(np.floor(wi * budget_total)) for s, wi in zip(sources, w)}

    # per-source cut: dl* level and how many ties (k) fit under the budget
    cuts: dict[str, tuple[int, int]] = {}  # source -> (dl_star, k_ties); dl_star=-1 -> all
    for s in sources:
        m = src == s
        lv, ln = dls[m], cnt[m]  # already dl DESC within the source
        b = budgets[s]
        cum = 0
        cut = None
        for level, n_l in zip(lv.tolist(), ln.tolist()):
            if cum + level * n_l >= b:
                k = max(0, -(-(b - cum) // level)) if level > 0 else n_l
                cut = (level, min(k, n_l))
                break
            cum += level * n_l
        cuts[s] = cut if cut is not None else (-1, 0)

    # pass 2: doc_id cutoff among the tie level (bounded by tie counts)
    tie_levels = {s: c[0] for s, c in cuts.items() if c[0] >= 0 and c[1] > 0}
    tie_ref = ray.put(tie_levels)

    def tie_partial(batch: pa.Table) -> pa.Table:
        # vectorized: per-row work is numpy; the only loop is over the
        # batch's DISTINCT sources (bounded by the source count)
        levels = ray.get(tie_ref)
        toks = pc.list_value_length(pc.split_pattern(batch["text"], " ")).cast(pa.int64())
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        s_np = np.asarray(batch["source"].to_pylist())
        t_arr = np.asarray(toks)
        u_src, inv = np.unique(s_np, return_inverse=True)
        lvl = np.array([levels.get(s, -2) for s in u_src.tolist()], dtype=np.int64)[inv]
        keep = np.flatnonzero(t_arr == lvl)
        return pa.table(
            {
                "source": pa.array(s_np[keep], type=pa.string()),
                "doc_id": pa.array(d[keep], type=pa.int64()),
            }
        )

    cutoff_id: dict[str, int] = {}
    if tie_levels:
        tds = rd.read_parquet(docs_path, columns=["doc_id", "source", "text"]).map_batches(
            tie_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        tparts = [ray.get(r) for r in tds.to_arrow_refs()]
        tparts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in tparts]
        tcat = pa.concat_tables([p for p in tparts if p.num_rows])
        ts = np.asarray(tcat["source"])
        td = np.asarray(tcat["doc_id"], dtype=np.int64)
        for s in tie_levels:
            ids = np.sort(td[ts == s])
            k = cuts[s][1]
            cutoff_id[s] = int(ids[min(k, len(ids)) - 1]) if k > 0 and len(ids) else -1

    rule_ref = ray.put(
        {s: (cuts[s][0], cutoff_id.get(s, -1)) for s in sources}
    )

    def select_partial(batch: pa.Table) -> pa.Table:
        rules = ray.get(rule_ref)
        toks = pc.list_value_length(pc.split_pattern(batch["text"], " ")).cast(pa.int64())
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        s_np = np.asarray(batch["source"].to_pylist())
        t_arr = np.asarray(toks)
        u_src, inv = np.unique(s_np, return_inverse=True)
        dl_star = np.array([rules[s][0] for s in u_src.tolist()], dtype=np.int64)[inv]
        cut_doc = np.array([rules[s][1] for s in u_src.tolist()], dtype=np.int64)[inv]
        keep = np.flatnonzero(
            (dl_star < 0) | (t_arr > dl_star) | ((t_arr == dl_star) & (d <= cut_doc))
        )
        return pa.table(
            {
                "doc_id": pa.array(d[keep], type=pa.int64()),
                "source": pa.array(s_np[keep], type=pa.string()),
                "dl": pa.array(t_arr[keep], type=pa.int64()),
            }
        )

    sds = rd.read_parquet(docs_path, columns=["doc_id", "source", "text"]).map_batches(
        select_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    sparts = [ray.get(r) for r in sds.to_arrow_refs()]
    sparts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in sparts]
    scat = pa.concat_tables([p for p in sparts if p.num_rows])
    return scat.sort_by("doc_id")


def repo_pack(sf_dir: str, num_partitions: int = 8) -> pa.Table:
    """Repo-context training units (the StarCoder-style code-LLM step):
    every file of a repository concatenated in PATH order into one unit →
    (repo, n_files, n_tokens, sha) with sha = sha256 of the newline-joined
    concatenation (units hash-compare without shipping their bytes).

    Repo/path derive from doc_id exactly like the corpus derivation
    (``org{d%7}/repo{d%20}``, ``src/{source}/file_{d}.py`` — mirrored in
    the SQL oracle).  The plan is ONE ``groupby(repo).map_groups`` —
    packing inherently co-locates a repo's files, so the shuffle moves
    each file's bytes exactly once; groups are repo-sized, never
    corpus-sized."""
    import hashlib

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def derive(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].cast(pa.int64())
        repo = pc.binary_join_element_wise(
            pa.scalar("org"),
            pa.array((np.asarray(d) % 7).astype(str), type=pa.string()),
            pa.scalar("/repo"),
            pa.array((np.asarray(d) % 20).astype(str), type=pa.string()),
            "",
        )
        path = pc.binary_join_element_wise(
            pa.scalar("src/"),
            batch["source"],
            pa.scalar("/file_"),
            pc.cast(d, pa.string()),
            pa.scalar(".py"),
            "",
        )
        dl = pc.list_value_length(pc.split_pattern(batch["text"], " ")).cast(pa.int64())
        return pa.table({"repo": repo, "path": path, "text": batch["text"], "dl": dl})

    def pack(group: pa.Table) -> pa.Table:
        g = group.sort_by("path")
        joined = "\n".join(g["text"].to_pylist())
        return pa.table(
            {
                "repo": pa.array([g["repo"][0].as_py()], type=pa.string()),
                "n_files": pa.array([g.num_rows], type=pa.int64()),
                "n_tokens": pa.array([int(pc.sum(g["dl"]).as_py())], type=pa.int64()),
                "sha": pa.array(
                    [hashlib.sha256(joined.encode("utf-8")).hexdigest()],
                    type=pa.string(),
                ),
            }
        )

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("repo")
        .map_groups(pack, batch_format="pyarrow")
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts).sort_by("repo")


def curriculum_stages(sf_dir: str, n_stages: int = 4) -> pa.Table:
    """Curriculum ordering for staged training: rank every doc by
    (quality ASC, doc_id ASC) — easy/low-quality-signal docs first is one
    convention; the SORT is the operator, the direction is policy — and
    cut the ranking into ``n_stages`` equal stages (SQL ``ntile``
    semantics: the first ``N mod n_stages`` stages get the extra row).

    Plan: one streamed quality pass (``textstats.quality_batch``), a Ray
    Data global sort on (quality, doc_id) — a curriculum IS a global
    order, so the all-to-all is inherent — then per-block rank enumeration
    with O(#blocks) driver state, the same distributed-sort + ENUMERATE
    shape as ``shuffle_order``.  Returns (doc_id, quality, stage)."""
    import ray
    import ray.data as rd

    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")

    def features(batch: pa.Table) -> pa.Table:
        f = quality_batch(batch)
        return f.select(["doc_id", "quality"])

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["quality", "doc_id"])
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    n_total = sum(p.num_rows for p in parts)
    out, base = [], 0
    for p in parts:  # blocks come back in global sort order
        ranks = np.arange(base, base + p.num_rows, dtype=np.int64)
        # ntile: first (n_total mod s) stages are ceil-sized
        s = n_stages
        big = n_total % s
        size_big = -(-n_total // s)
        size_small = n_total // s
        cut = big * size_big
        stage = np.where(
            ranks < cut,
            ranks // max(size_big, 1),
            big + (ranks - cut) // max(size_small, 1),
        ).astype(np.int64) + 1
        out.append(
            pa.table(
                {
                    "doc_id": p["doc_id"].combine_chunks().cast(pa.int64()),
                    "quality": p["quality"],
                    "stage": pa.array(stage),
                }
            )
        )
        base += p.num_rows
    return pa.concat_tables(out).sort_by("doc_id")


def source_stats(sf_dir: str) -> pa.Table:
    """Per-SOURCE (domain-level, CCNet-style) corpus statistics:
    (source, n_docs, mean_quality, mean_tokens).

    The web-curation move where the unit of trust is the DOMAIN, not the
    document (CCNet buckets Common Crawl by URL domain): one streamed pass
    computes per-batch (source, n, Σq_micro, Σtokens) partials — quality is
    carried as an INTEGER micro-unit (round(q·1e6)) so the cross-batch sum
    is order-exact, never a float accumulation — and the driver fold is
    bounded by the number of sources, not the corpus.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        feats = quality_batch(batch)
        q_micro = np.round(
            np.asarray(feats["quality"], dtype=np.float64) * 1_000_000
        ).astype(np.int64)
        t = pa.table(
            {
                "source": batch["source"],
                "q_micro": pa.array(q_micro),
                "n_tokens": feats["n_tokens"],
            }
        )
        return t.group_by("source").aggregate(
            [("q_micro", "sum"), ("n_tokens", "sum"), ("source", "count")]
        )

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in rd_read_docs_source(sf_dir)
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        ]
    )
    merged = parts.group_by("source").aggregate(
        [("q_micro_sum", "sum"), ("n_tokens_sum", "sum"), ("source_count", "sum")]
    )
    n = np.asarray(merged["source_count_sum"], dtype=np.int64)
    qsum = np.asarray(merged["q_micro_sum_sum"], dtype=np.int64)
    tsum = np.asarray(merged["n_tokens_sum_sum"], dtype=np.int64)
    from ..functions.bm25 import sql_round

    return pa.table(
        {
            "source": merged["source"],
            "n_docs": pa.array(n),
            "mean_quality": pa.array(sql_round(qsum / (n * 1_000_000.0), 6)),
            "mean_tokens": pa.array(sql_round(tsum / n.astype(np.float64), 6)),
        }
    ).sort_by("source")


def rd_read_docs_source(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )


def source_filter_ds(sf_dir: str, threshold: float = 0.445):
    """Streaming domain filter: drop every doc whose SOURCE's mean quality
    is below ``threshold`` (the per-source verdict computed by
    ``source_stats``, broadcast once via ``ray.put`` — the doc stream never
    shuffles).  Emits (doc_id, source, quality) for the kept docs."""
    import ray

    stats = source_stats(sf_dir)
    keep = {
        s
        for s, mq in zip(stats["source"].to_pylist(), stats["mean_quality"].to_pylist())
        if mq >= threshold
    }
    keep_ref = ray.put(pa.array(sorted(keep), type=pa.string()))

    def filt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        feats = quality_batch(batch)
        mask = pc.is_in(batch["source"], value_set=ray.get(keep_ref))
        return pa.table(
            {
                "doc_id": feats["doc_id"],
                "source": batch["source"],
                "quality": feats["quality"],
            }
        ).filter(mask)

    return rd_read_docs_source(sf_dir).map_batches(
        filt, batch_format="pyarrow", zero_copy_batch=True
    )


def source_filter(sf_dir: str, threshold: float = 0.445) -> pa.Table:
    import ray

    parts = [
        ray.get(r) for r in source_filter_ds(sf_dir, threshold).to_arrow_refs()
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "source": pa.array([], type=pa.string()),
                "quality": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(parts).sort_by("doc_id")


def source_filter_to_parquet(sf_dir: str, out_dir: str, threshold: float = 0.445) -> str:
    from .textstats import write_dataset

    return write_dataset(source_filter_ds(sf_dir, threshold), out_dir)


def pack_bpe_sequences(
    sf_dir: str, merges: pa.Table, budget: int = 256
) -> pa.Table:
    """``pack_sequences`` with the TRAINED tokenizer's lengths: the same
    two-phase distributed prefix-sum plan, but each doc's length is its
    BPE SUBWORD count (the number a real LM packing job needs — whitespace
    counts under-budget every sequence once documents tokenize to >1
    subword per word).  → (doc_id, tok_offset, chunk_id) over subword
    offsets.

    Phase-1 tasks carry the broadcast merge-rank table and a distinct-word
    memo per task (the ``BpeEncoder`` trade: encode cost tracks distinct
    words per row group, not token occurrences); phase 2 is unchanged —
    driver state stays O(#row groups)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .bpe import bpe_encode_ranked, merge_ranks

    if budget <= 0:
        raise ValueError("budget must be positive")
    path = f"{sf_dir}/documents.parquet"
    ranks_ref = ray.put(merge_ranks(merges))

    @ray.remote(num_cpus=1)
    def count_rg(rg: int) -> pa.Table:
        ranks = ray.get(ranks_ref)
        t = pq.ParquetFile(path).read_row_group(rg, columns=["doc_id", "text"])
        words = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        n_sub = np.array(
            [len(bpe_encode_ranked(w, ranks)) for w in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), lengths)
        dl = np.bincount(doc_of, weights=n_sub[codes], minlength=t.num_rows)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "dl": pa.array(dl.astype(np.int64)),
            }
        )

    @ray.remote(num_cpus=1)
    def summarize(part: pa.Table) -> tuple[int, int, int]:
        return (
            int(pc.sum(part["dl"]).as_py() or 0),
            int(pc.min(part["doc_id"]).as_py()),
            int(pc.max(part["doc_id"]).as_py()),
        )

    n_rgs = pq.ParquetFile(path).metadata.num_row_groups
    refs = [count_rg.remote(rg) for rg in range(n_rgs)]
    sums = ray.get([summarize.remote(r) for r in refs])
    prev_max = -1
    for _, lo, hi in sums:
        if lo <= prev_max:
            raise ValueError("documents.parquet is not doc_id-ordered by row group")
        prev_max = hi
    totals = [s for s, _, _ in sums]
    bases = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)

    @ray.remote(num_cpus=1)
    def assign(part: pa.Table, base: int) -> pa.Table:
        dl = np.asarray(part["dl"], dtype=np.int64)
        ids = np.asarray(part["doc_id"], dtype=np.int64)
        if len(ids) > 1 and np.any(np.diff(ids) <= 0):
            raise ValueError("row group not doc_id-ordered")
        off = base + np.concatenate(([0], np.cumsum(dl)[:-1]))
        return pa.table(
            {
                "doc_id": part["doc_id"],
                "tok_offset": pa.array(off),
                "chunk_id": pa.array(off // budget),
            }
        )

    out = [assign.remote(r, int(b)) for r, b in zip(refs, bases)]
    return pa.concat_tables(ray.get(out)).sort_by("doc_id")
