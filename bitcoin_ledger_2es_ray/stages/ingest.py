"""Phase A stage: read → verify sha256 → tokenize → explode postings.

SURVEY.md §3.1: M1 (sha256 ingest verify), M2 (deterministic docIDs, done by
the reader's footer-offset scheme), M3–M5 (tokenize + dl), M7 (posting
explode) are fused into ONE pass over ``content`` — content never crosses a
stage boundary after this (it is the widest column; shuffling it would
dominate the job at 10^12-file scale).

The stage is a callable instance shipped in a stateless TASK pool: its only
state (the head-term salt table) is tiny and rides in the task closure, so
there is no actor startup wave (SURVEY.md §8.5; a large salt table would be
``ray.put`` once and fetched lazily).  Each batch of read-unit descriptors
produces:

- side outputs, committed atomically per unit (the checkpoint granularity):
  ``forward_map/part-NNNNNN.parquet``, ``postings/part-NNNNNN.parquet``,
  and a manifest entry with lineage fingerprint + metrics;
- a small manifest-row table as the dataset output (metadata only — the
  wide data stays in the partitioned side outputs).

Corrupted input (sha256 mismatch vs the reference-provided column) raises
and fails the build (BASELINE.json L15 per-row invariant).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_column, shard_and_salt
from ..functions.tokenize import get_tokenizer, term_counts, term_counts_positions
from ..schemas import FORWARD_MAP, POSTINGS_RAW, POSTINGS_RAW_POS
from ..sources.corpus import read_unit, unit_fingerprint
from ..state.manifest import Manifest, atomic_write_parquet

def _write_rowgrouped(table: pa.Table, slices: list[tuple[int, int]], path: str) -> int:
    """Atomically write ``table`` with one parquet row group per slice."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with pq.ParquetWriter(tmp, table.schema) as w:
        for s, e in slices:
            w.write_table(table.slice(s, e - s))
    size = os.path.getsize(tmp)
    os.replace(tmp, path)
    return size


ENTRY_SCHEMA = pa.schema(
    [
        ("part", pa.uint32()),
        ("rows", pa.uint64()),
        ("n_postings", pa.uint64()),
        ("total_dl", pa.uint64()),
        ("wall_s", pa.float64()),
    ]
)


class ReadVerifyTokenize:
    """One read unit (file, row_group) in → postings + forward map out."""

    def __init__(
        self,
        out_dir: str,
        num_partitions: int,
        head_salts: dict | None = None,
        tag_lang: bool = False,
        build_fingerprint: str = "",
        tokenizer: str = "code",
        with_positions: bool = False,
    ):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.tag_lang = tag_lang
        self.tokenizer = tokenizer
        self.with_positions = with_positions
        self.build_fingerprint = build_fingerprint
        # The head-salt table is small (head terms only), so the instance is
        # built on the driver and shipped inside the task closure — a
        # stateless TASK pool, no actor startup cost.  A huge salt table
        # would instead be ray.put once and resolved lazily here.
        self.head_salts = head_salts or {}
        self._manifest: Manifest | None = None

    @property
    def manifest(self) -> Manifest:
        if self._manifest is None:
            self._manifest = Manifest(self.out_dir)
        return self._manifest

    def _process_unit(self, unit: dict) -> dict:
        t0 = time.monotonic()
        t = read_unit(unit)
        content = t["content"].combine_chunks()

        # M1 — per-row sha256 invariant (BASELINE.json L15)
        computed = sha256_column(content)
        if unit["has_sha"]:
            ok = pc.equal(computed, t["sha256"].combine_chunks().cast(pa.binary(32)))
            bad = pc.indices_nonzero(pc.invert(pc.fill_null(ok, False)))
            if len(bad):
                rows = bad.to_pylist()[:5]
                raise ValueError(
                    f"sha256 mismatch: {len(bad)} corrupted rows in "
                    f"{unit['path']}#{unit['row_group']} (first local rows {rows})"
                )

        # M3–M5 — tokenize + doc length, one pass (positions only when the
        # index is positional — the extra payload is never produced otherwise)
        tok_kwargs = dict(
            langs=t["lang"].combine_chunks() if self.tag_lang else None,
            tag_lang=self.tag_lang,
        )
        if self.with_positions:
            terms, doc_idx, dl, tok_pos = get_tokenizer(self.tokenizer)(
                content, return_positions=True, **tok_kwargs
            )
        else:
            terms, doc_idx, dl = get_tokenizer(self.tokenizer)(content, **tok_kwargs)
        doc_ids = np.arange(unit["offset"], unit["offset"] + t.num_rows, dtype=np.uint64)

        # forward map side output (doc metadata leaves the pipeline here)
        fwd = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.uint64()),
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "lang": t["lang"],
                "sha256": computed,
                "dl": pa.array(dl, type=pa.uint32()),
            },
            schema=FORWARD_MAP,
        )
        atomic_write_parquet(fwd, f"{self.out_dir}/forward_map/part-{unit['part']:06d}.parquet")

        # M7 — explode to (term, doc_id, tf) + dl + shard/salt
        if self.with_positions:
            postings = term_counts_positions(terms, doc_idx, tok_pos, doc_ids)
        else:
            postings = term_counts(terms, doc_idx, doc_ids)
        p_doc = np.asarray(postings["doc_id"])
        p_dl = dl[(p_doc - np.uint64(unit["offset"])).astype(np.int64)]
        shard, salt = shard_and_salt(
            postings["term"], p_doc, self.num_partitions, self.head_salts
        )
        cols = {
            "term": postings["term"],
            "doc_id": postings["doc_id"],
            "tf": postings["tf"],
            "dl": pa.array(p_dl, type=pa.uint32()),
            "salt": pa.array(salt, type=pa.uint16()),
            "shard": pa.array(shard, type=pa.uint32()),
        }
        if self.with_positions:
            cols["positions"] = postings["positions"]
        out = pa.table(
            cols, schema=POSTINGS_RAW_POS if self.with_positions else POSTINGS_RAW
        )
        # map-side hash partition: rows sorted by shard, ONE PARQUET ROW
        # GROUP PER SHARD, with the shard→row-group map recorded in the
        # manifest.  Phase B's reducer for shard s then reads exactly its
        # row groups — the term shuffle becomes a filesystem exchange with
        # no in-memory all-to-all (stages/segment.py, pipelines/build.py).
        out = out.sort_by("shard")
        shard_sorted = np.asarray(out["shard"])
        if len(shard_sorted):
            bounds = np.flatnonzero(np.diff(shard_sorted)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(shard_sorted)]))
        else:  # a unit whose docs produced no tokens at all
            starts = ends = np.array([], dtype=np.int64)
        shard_rg = {int(shard_sorted[s]): i for i, s in enumerate(starts)}
        nbytes = _write_rowgrouped(
            out,
            [(int(s), int(e)) for s, e in zip(starts, ends)],
            f"{self.out_dir}/postings/part-{unit['part']:06d}.parquet",
        )
        wall = time.monotonic() - t0
        entry = {
            "status": "done",
            "build_fingerprint": self.build_fingerprint,
            "input_fingerprint": unit_fingerprint(unit),
            "path": unit["path"],
            "row_group": unit["row_group"],
            "offset": unit["offset"],
            "rows": t.num_rows,
            "n_postings": out.num_rows,
            "total_dl": int(dl.sum()),
            "bytes": nbytes,
            "shard_row_groups": {str(k): v for k, v in shard_rg.items()},
            "wall_s": round(wall, 4),
        }
        self.manifest.write_entry("tokenize", unit["part"], entry)
        return {
            "part": unit["part"],
            "rows": t.num_rows,
            "n_postings": out.num_rows,
            "total_dl": int(dl.sum()),
            "wall_s": wall,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._process_unit(u) for u in batch.to_pylist()]
        return pa.Table.from_pylist(rows, schema=ENTRY_SCHEMA)
