"""Index build pipeline (SURVEY.md §3.1) — the flagship.

    scan footers → head-term df sketch → phase A (read+verify+tokenize+
    explode, checkpointed per read unit) → phase B (term shuffle →
    segments, checkpointed per shard) → finalize (term_dict, stats).

Resume (SURVEY.md §3.3) is partition-granular: phase A skips read units
whose manifest entry's input fingerprint still matches (no re-tokenize —
BASELINE.json L6), phase B skips shards already committed under the same
build fingerprint + tokenize-set lineage.  Because docIDs are deterministic
(footer-offset scheme) and every stage is a pure function of its input
partition, a resumed build is bit-identical to an uninterrupted one
(asserted in tests/test_resume.py).

The materialized ``postings/`` directory IS the phase-A checkpoint: the
narrow (term, doc_id, tf, dl, salt, shard) table without content — the
classic external-indexing spill design.  Phase B's shuffle re-reads it,
which is what makes "resume without re-tokenizing" possible at all.

Ray is NEVER initialised here — the caller owns the session (driver
contract, __ray_entry__.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import fingerprint
from ..functions.tokenize import get_tokenizer
from ..schemas import FORMAT_VERSION, STATS, TERM_DICT
from ..sources.corpus import read_unit, scan_corpus, unit_fingerprint
from ..stages.ingest import ReadVerifyTokenize
from ..stages.segment import BUILDER_ENTRY, TERM_DICT_ROW_GROUP, make_segment_builder
from ..state.manifest import Manifest, atomic_write_parquet
from ..state.termdict import write_merged_term_dict


@dataclass
class BuildConfig:
    corpus: str | list[str]
    out_dir: str
    num_partitions: int = 32
    tag_lang: bool = False
    # head-term skew handling (SURVEY.md §2.4 G1): terms whose sampled
    # df/N exceeds head_df_ratio get doc-disjoint salt slices.  The slice
    # count ADAPTS to the estimated df — at least n_salt, and enough that
    # no slice exceeds ~max_slice_postings (caps the largest reduce-side
    # posting run regardless of corpus size; a df≈N term at 10^12 docs
    # simply gets more slices).
    head_df_ratio: float = 0.10
    n_salt: int = 4
    max_slice_postings: int = 1_000_000
    sketch_stride: int = 16  # sample every k-th read unit for the df sketch
    concurrency: int | None = None
    # term-shuffle execution (G1): "fs" = map-side hash partition into one
    # parquet row group per shard + reduce-side selective row-group reads
    # (filesystem exchange — restartable, bounded memory, no in-memory
    # all-to-all); "raydata" = ds.groupby("shard").map_groups (Ray Data's
    # sort shuffle).  Both produce byte-identical segments (encode_shard is
    # order-insensitive); asserted in tests/test_resume.py.
    shuffle: str = "fs"
    tokenizer: str = "code"  # Tokenizer-protocol registry name (SURVEY §2.7)
    # fs-shuffle reduce task count (None → min(#shards, 64)).  Fixed w.r.t.
    # CPU count by design (see phase B comment); tunable because per-task
    # cost includes opening every postings part file.
    reduce_tasks: int | None = None
    # docs tokenized per sampled unit for the df sketch (the sketch needs a
    # df RATIO, not volume — slicing keeps its cost ~constant per level)
    sketch_docs_per_unit: int = 4096
    # positional index (phrase queries): postings carry each token's in-doc
    # positions (delta-varbyte; schemas.SEGMENT_POS).  Off by default — the
    # payload roughly doubles posting bytes and non-phrase queries never
    # read it.  Participates in the build fingerprint, so toggling it
    # invalidates checkpoints instead of mixing layouts.
    with_positions: bool = False


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    total_dl: int
    n_terms: int
    n_units: int
    skipped_units: int
    n_shards: int
    skipped_shards: int
    head_terms: dict = field(default_factory=dict)


def _df_sketch(units: list[dict], cfg: BuildConfig) -> dict[str, int]:
    """Sampled df sketch → head-term salt table (SURVEY.md §4 'skew').

    Reads every ``sketch_stride``-th read unit (deterministic stride, not
    random — resume must reproduce the same head set), tokenizes it, and
    counts per-term document frequency on the sample.  Runs as a Ray Data
    pipeline so the sample scan parallelizes; the aggregated sketch is tiny
    (one row per sampled distinct term).
    """
    sample = units[:: max(1, cfg.sketch_stride)]
    if not sample:
        return {}
    import ray.data as rd

    tag = cfg.tag_lang
    tok = get_tokenizer(cfg.tokenizer)
    cap = cfg.sketch_docs_per_unit

    def sketch(batch: pa.Table) -> pa.Table:
        outs = []
        for unit in batch.to_pylist():
            t = read_unit(unit, columns=["content", "lang"])
            t = t.slice(0, cap)  # df RATIO sample — volume capped per unit
            terms, doc_idx, _ = tok(
                t["content"].combine_chunks(),
                langs=t["lang"].combine_chunks() if tag else None,
                tag_lang=tag,
            )
            pairs = pa.table({"term": terms, "d": pa.array(doc_idx)})
            uniq = pairs.group_by(["term", "d"]).aggregate([])
            part = uniq.group_by("term").aggregate([("d", "count")])
            outs.append(
                pa.table({"term": part["term"], "df": part["d_count"].cast(pa.uint64())})
            )
        return pa.concat_tables(outs)

    ds = rd.from_items(sample, override_num_blocks=len(sample)).map_batches(
        sketch, batch_format="pyarrow", num_cpus=1
    )
    if len(sample) <= 256:
        # small sample (the common case — stride keeps it small by design):
        # the per-unit partials are tiny, so one driver-side Arrow hash agg
        # replaces a whole Ray groupby job (~1s fixed cost that would
        # otherwise be half the build at bench scale and a fixed serial
        # term in the N→4N scaling ratio)
        import ray as _ray

        parts = [t for t in (_ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
        if parts:
            at = pa.concat_tables(parts).group_by("term").aggregate([("df", "sum")])
            agg = pa.table({"term": at["term"], "df": at["df_sum"]}).to_pandas()
        else:
            agg = __import__("pandas").DataFrame({"term": [], "df": []})
    else:
        from ray.data.aggregate import Sum

        agg = ds.groupby("term").aggregate(Sum("df", alias_name="df")).to_pandas()
    sampled_docs = sum(min(u["num_rows"], cap) for u in sample)
    if sampled_docs == 0:
        return {}
    total_docs = sum(u["num_rows"] for u in units)
    head = agg[agg["df"] / sampled_docs >= cfg.head_df_ratio]
    out = {}
    for term, df_s in sorted(zip(head["term"], head["df"])):
        est_df = df_s / sampled_docs * total_docs
        n = max(cfg.n_salt, int(-(-est_df // cfg.max_slice_postings)))
        out[term] = min(n, 4096)
    return out


def build_index(cfg: BuildConfig) -> BuildResult:
    import time

    import ray
    import ray.data as rd

    phase_t: dict[str, float] = {}
    _t0 = time.monotonic()

    def _mark(name: str) -> None:
        nonlocal _t0
        phase_t[name] = round(time.monotonic() - _t0, 3)
        _t0 = time.monotonic()

    os.makedirs(cfg.out_dir, exist_ok=True)
    manifest = Manifest(cfg.out_dir)
    units = scan_corpus(cfg.corpus)
    _prune_stale_partitions(manifest, cfg, len(units))
    _mark("scan")

    # ---- head-term df sketch (always: resume must reproduce the salts) ----
    head_salts = _df_sketch(units, cfg)
    _mark("sketch")
    # build fingerprint covers everything that changes tokenize/shard output
    bfp = fingerprint(
        FORMAT_VERSION,
        cfg.num_partitions,
        cfg.tag_lang,
        cfg.tokenizer,
        sorted(head_salts.items()),
        *(["positions"] if cfg.with_positions else []),
    )

    # ---- resume filter for phase A (skip = no re-tokenize) ----------------
    done_tok = manifest.completed("tokenize")
    _mark("resume_filter_read")
    todo = [
        u
        for u in units
        if done_tok.get(str(u["part"]), {}).get("input_fingerprint") != unit_fingerprint(u)
        or done_tok.get(str(u["part"]), {}).get("build_fingerprint") != bfp
        or "shard_row_groups" not in done_tok.get(str(u["part"]), {})
    ]

    # ---- phase A: tokenize + explode, checkpointed per unit ---------------
    # Stateless task pool (not actors): the stage carries only the tiny
    # head-salt table, so the driver-built callable ships in each task's
    # closure and Ray schedules plain tasks — no actor-pool startup wave.
    if todo:
        stage = ReadVerifyTokenize(
            out_dir=cfg.out_dir,
            num_partitions=cfg.num_partitions,
            head_salts=head_salts,
            tag_lang=cfg.tag_lang,
            build_fingerprint=bfp,
            tokenizer=cfg.tokenizer,
            with_positions=cfg.with_positions,
        )
        opts: dict = {}
        if cfg.concurrency:
            opts["concurrency"] = min(cfg.concurrency, max(1, len(todo)))
        rd.from_items(todo).map_batches(
            stage,
            batch_size=1,
            batch_format="pyarrow",
            num_cpus=1,
            **opts,
        ).materialize()

    _mark("phase_a")

    # ---- phase B: term shuffle → segments, checkpointed per shard ---------
    tokset = _tokenize_set_key(manifest)
    done_seg = {
        k: e
        for k, e in manifest.completed("segment").items()
        if e.get("build_fingerprint") == bfp and e.get("tokenize_set") == tokset
    }
    skip_shards = sorted(int(k) for k in done_seg)
    # shards NOT skipped are about to be rebuilt (or have become empty):
    # drop their stale artifacts so a shard that lost all postings cannot
    # leak ghost terms through a leftover dictionary run or segment file
    for sid in range(cfg.num_partitions):
        if sid in done_seg or str(sid) in done_seg:
            continue
        for stale in (
            f"{cfg.out_dir}/segments/shard-{sid:05d}.parquet",
            f"{cfg.out_dir}/term_dict_parts/shard-{sid:05d}.parquet",
        ):
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass
    builder = make_segment_builder(cfg.out_dir, bfp, tokset)
    if cfg.shuffle == "fs":
        # Reduce side of the filesystem exchange: each task owns a GROUP of
        # shards (keeps per-shard sorts cache-sized while amortizing file
        # opens — every postings part is opened once per task and only the
        # group's row groups are read; a reducer never touches other
        # shards' bytes).  Shard→row-group indices come from the phase-A
        # manifest, so no footer scan is needed to plan the exchange.
        done_entries = sorted(
            manifest.completed("tokenize").items(), key=lambda kv: int(kv[0])
        )
        todo_shards = [
            sid for sid in range(cfg.num_partitions) if sid not in skip_shards
        ]
        # Task count is a function of the PARTITION LAYOUT, not the CPU
        # count: the per-task cost includes opening every postings part, so
        # scaling the task count with CPUs would inflate total work and
        # destroy N→4N scaling.  64 tasks ≫ any tested CPU level.
        n_tasks = min(len(todo_shards), cfg.reduce_tasks or 64) or 1
        per_task = max(1, (len(todo_shards) + n_tasks - 1) // n_tasks)
        items = []
        for i in range(0, len(todo_shards), per_task):
            group = todo_shards[i : i + per_task]
            plan: dict[str, dict[int, int]] = {}
            for k, e in done_entries:
                srg = e.get("shard_row_groups", {})
                path = f"{cfg.out_dir}/postings/part-{int(k):06d}.parquet"
                rgs = {sid: srg[str(sid)] for sid in group if str(sid) in srg}
                if rgs:
                    plan[path] = rgs
            if plan:
                items.append(
                    {
                        "shards": group,
                        "paths": list(plan),
                        "rg_maps": [
                            [[sid, rg] for sid, rg in m.items()] for m in plan.values()
                        ],
                    }
                )

        def reduce_shards(batch: pa.Table) -> pa.Table:
            outs = []
            for item in batch.to_pylist():
                # ONE read call per file for all of this task's row groups,
                # then one stable uint32 argsort splits the shards back out —
                # far cheaper than a read call per (file, shard)
                tabs = [
                    pq.ParquetFile(path).read_row_groups([rg for _, rg in rg_map])
                    for path, rg_map in zip(item["paths"], item["rg_maps"])
                ]
                big = pa.concat_tables(tabs).combine_chunks()
                shard_col = np.asarray(big["shard"].combine_chunks())
                order = np.argsort(shard_col, kind="stable")
                ss = shard_col[order]
                bounds = np.flatnonzero(np.diff(ss)) + 1
                for s, e in zip(
                    np.concatenate(([0], bounds)),
                    np.concatenate((bounds, [len(ss)])),
                ):
                    outs.append(builder(big.take(pa.array(order[s:e]))))
            return (
                pa.concat_tables(outs)
                if outs
                else pa.Table.from_pylist([], schema=BUILDER_ENTRY)
            )

        if items:
            # one block per item → every reduce task runs in parallel
            rd.from_items(items, override_num_blocks=len(items)).map_batches(
                reduce_shards, batch_size=1, batch_format="pyarrow", num_cpus=1
            ).materialize()
    else:
        postings = rd.read_parquet(os.path.join(cfg.out_dir, "postings"))
        if skip_shards:
            skip = pa.array(np.array(skip_shards, dtype=np.uint32))
            postings = postings.map_batches(
                lambda t: t.filter(pc.invert(pc.is_in(t["shard"], value_set=skip))),
                batch_format="pyarrow",
            )
        postings.groupby("shard").map_groups(builder, batch_format="pyarrow").materialize()
    _mark("phase_b")

    # ---- finalize: merge per-shard sorted dictionary runs, stats ----------
    # Each built shard committed a (term, salt)-sorted dictionary run to
    # term_dict_parts/ (stages/segment.py) — including skipped shards from
    # the prior build, so nothing is re-derived or re-shipped.  The merge is
    # a C++ concat+sort for small vocabularies and a bounded-memory
    # streaming k-way run merge for large ones (state/termdict.py).
    part_paths = []
    for sid in range(cfg.num_partitions):
        p = f"{cfg.out_dir}/term_dict_parts/shard-{sid:05d}.parquet"
        if not os.path.exists(p):
            seg_path = f"{cfg.out_dir}/segments/shard-{sid:05d}.parquet"
            if sid in skip_shards and os.path.exists(seg_path):
                # migration: a pre-r2 index has no dict runs — derive once
                seg = pq.read_table(seg_path, columns=["term", "salt", "df", "cf"])
                atomic_write_parquet(
                    pa.table(
                        {
                            "term": seg["term"],
                            "salt": seg["salt"],
                            "partition": pa.array(np.full(seg.num_rows, sid, dtype=np.uint32)),
                            "row": pa.array(np.arange(seg.num_rows, dtype=np.uint32)),
                            "df": seg["df"],
                            "cf": seg["cf"],
                        },
                        schema=TERM_DICT,
                    ),
                    p,
                    row_group_size=TERM_DICT_ROW_GROUP,
                )
            else:
                continue  # shard produced no postings
        part_paths.append(p)
    n_terms = write_merged_term_dict(
        part_paths,
        os.path.join(cfg.out_dir, "term_dict.parquet"),
        row_group_size=TERM_DICT_ROW_GROUP,
    )

    # global stats (G3): phase A's manifest entries already carry per-unit
    # row counts and total_dl — summing them here avoids re-scanning the
    # forward map with another Ray job (values are oracle-checked in tests).
    tok_entries = manifest.completed("tokenize").values()
    n_docs = sum(e["rows"] for e in tok_entries)
    total_dl = sum(e["total_dl"] for e in tok_entries)
    stats = pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.uint64()),
            "total_dl": pa.array([total_dl], type=pa.uint64()),
            "avgdl": pa.array([total_dl / n_docs if n_docs else 0.0], type=pa.float64()),
            "n_terms": pa.array([n_terms], type=pa.uint64()),
        },
        schema=STATS,
    )
    atomic_write_parquet(stats, os.path.join(cfg.out_dir, "stats.parquet"))
    _mark("finalize")
    manifest.write_entry(
        "final",
        "index",
        {
            "status": "done",
            "phase_seconds": phase_t,
            "build_fingerprint": bfp,
            "n_docs": n_docs,
            "total_dl": total_dl,
            "n_terms": n_terms,
            "head_terms": sorted(head_salts),
            # full term→n_salt map: shard-of-slice is computable from
            # (term, salt, num_partitions) alone, so a router can resolve
            # any term's slice locations without the term_dict at all
            "head_salts": {t: int(n) for t, n in sorted(head_salts.items())},
        },
    )
    return BuildResult(
        out_dir=cfg.out_dir,
        n_docs=n_docs,
        total_dl=total_dl,
        n_terms=n_terms,
        n_units=len(units),
        skipped_units=len(units) - len(todo),
        n_shards=cfg.num_partitions,
        skipped_shards=len(skip_shards),
        head_terms=head_salts,
    )


def _prune_stale_partitions(manifest: Manifest, cfg: BuildConfig, n_units: int) -> None:
    """Invalidate manifest entries (and their part files) that no longer map
    to a current read unit or shard.

    Resume into an out_dir after the corpus SHRANK would otherwise keep ghost
    documents: tokenize entries for parts beyond the current unit list are
    never re-planned, yet phase B's exchange plan, the n_docs/total_dl sums
    and the tokenize-set lineage all read ``manifest.completed("tokenize")``
    unfiltered — so deleted docs stay queryable.  (Units whose CONTENT
    changed are already handled by the input-fingerprint check in the phase-A
    resume filter; only out-of-range parts need explicit pruning.)  Segment
    entries/files beyond the current partition count are pruned for the same
    reason when ``num_partitions`` shrinks.
    """
    for key in manifest.read_all("tokenize"):
        part = int(key.split("tokenize-", 1)[1])
        if part < n_units:
            continue
        manifest.remove_entry("tokenize", part)
        for sub in ("postings", "forward_map"):
            try:
                os.remove(f"{cfg.out_dir}/{sub}/part-{part:06d}.parquet")
            except FileNotFoundError:
                pass
    for key in manifest.read_all("segment"):
        sid = int(key.split("segment-", 1)[1])
        if sid < cfg.num_partitions:
            continue
        manifest.remove_entry("segment", sid)
        for sub in ("segments/shard", "term_dict_parts/shard"):
            try:
                os.remove(f"{cfg.out_dir}/{sub}-{sid:05d}.parquet")
            except FileNotFoundError:
                pass


def _tokenize_set_key(manifest: Manifest) -> str:
    """Fingerprint of the completed tokenize partition set (segment lineage)."""
    done = manifest.completed("tokenize")
    return fingerprint(sorted((k, e.get("input_fingerprint")) for k, e in done.items()))
