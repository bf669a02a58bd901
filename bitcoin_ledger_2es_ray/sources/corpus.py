"""Corpus source (SURVEY.md §2.1 S1/S2, §2.2 M2).

Two jobs:

1. ``derive_corpus_parquet`` — FIXTURES.md §B: map the driver's
   ``documents.parquet`` into the mandated corpus shape
   ``(repo, path, commit, lang, content)`` (BASELINE.json L15) plus the
   reference-provided expected ``sha256`` column, as a *pure deterministic
   function* of the documents rows (no RNG).  Row i keeps engine doc_id i.

2. ``scan_corpus`` / ``read_corpus_units`` — the deterministic reader.
   DocIDs must be identical across cluster sizes and resumes (SURVEY.md
   §1.2), so they are derived from Parquet *footer metadata only*: the
   driver scans per-(file, row_group) row counts (cheap, no data read),
   prefix-sums them in sorted-path order into global offsets, and each read
   unit then assigns ``doc_id = offset + row_index_within_row_group``.
   Block arrival order never matters.

   The unit list becomes a ``ray.data`` dataset of descriptors; the actual
   column data is read inside ``map_batches`` tasks, one row group per task
   — file/row-group-level parallelism exactly like ``read_parquet``, but
   with deterministic ids and a stable ``part`` ordinal that keys the
   checkpoint manifest (SURVEY.md §3.3).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import fingerprint
from ..schemas import CORPUS_WITH_SHA

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def derive_corpus_parquet(
    sf_dir: str,
    out_path: str,
    row_group_size: int = 512,
    replicate: int = 1,
    n_files: int = 1,
) -> str:
    """Write the corpus-shaped parquet derived from ``{sf_dir}/documents.parquet``.

    Deterministic (FIXTURES.md §B); cached — rewritten only if missing.
    Multiple row groups so the reader parallelizes even on one file.

    ``replicate`` (bench only): repeat the documents R times with docIDs
    offset by ``r * N`` — a deterministic scale-up of the driver corpus so
    throughput/scaling runs measure compute, not fixed overhead.  Content
    per doc is unchanged (vocab and avgdl invariant).

    ``n_files > 1``: ``out_path`` becomes a DIRECTORY of that many
    ``part-NNNNN.parquet`` files (row ranges in order, so doc_ids are
    unchanged vs the single-file layout) — exercises the fanned footer
    scan and per-file parallel read exactly like a real sharded corpus.
    """
    if os.path.exists(out_path):
        return out_path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang", "source"]
    )
    n = docs.num_rows
    parts = []
    base_text = docs["text"].to_pylist()
    base_sha = [hashlib.sha256(t.encode("utf-8")).digest() for t in base_text]
    for r in range(max(1, replicate)):
        doc_id = [d + r * n for d in docs["doc_id"].to_pylist()]
        source = docs["source"].to_pylist()
        parts.append(
            pa.table(
                {
                    "repo": [f"org{d % 7}/repo{d % 20}" for d in doc_id],
                    "path": [f"src/{s}/file_{d}.py" for d, s in zip(doc_id, source)],
                    "commit": [
                        hashlib.sha256(f"commit:{d}".encode()).hexdigest()[:40] for d in doc_id
                    ],
                    "lang": docs["lang"],
                    "content": docs["text"],
                    "sha256": base_sha,
                },
                schema=CORPUS_WITH_SHA,
            )
        )
    table = pa.concat_tables(parts)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if n_files > 1:
        tmp_dir = out_path + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        per = (table.num_rows + n_files - 1) // n_files
        for fi, start in enumerate(range(0, table.num_rows, per)):
            pq.write_table(
                table.slice(start, per),
                os.path.join(tmp_dir, f"part-{fi:05d}.parquet"),
                row_group_size=row_group_size,
            )
        os.replace(tmp_dir, out_path)
        return out_path
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return out_path


def derive_inflected_corpus_parquet(
    sf_dir: str, out_path: str, row_group_size: int = 512
) -> str:
    """Corpus-shaped parquet whose token stream is the documents text with a
    deterministic plural inflection: the token at position ``p`` of doc ``d``
    gains a trailing ``'s'`` when ``(d + p) % 2 == 1``.

    Every token of this corpus stems back to its base form under the
    S-stemmer (``functions/stem.py``; asserted in tests), so an index built
    with a ``*_stem`` analyzer chain over THIS corpus has identical postings,
    stats and BM25 ranking to the plain index over the raw corpus — the
    collapse property ``stemmed_topk`` gates on.  Deterministic; cached."""
    if os.path.exists(out_path):
        return out_path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang", "source"]
    )
    text = [
        " ".join(
            t + ("s" if (d + i) % 2 else "") for i, t in enumerate(raw.split(" "))
        )
        for d, raw in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    ]
    doc_id = docs["doc_id"].to_pylist()
    source = docs["source"].to_pylist()
    table = pa.table(
        {
            "repo": [f"org{d % 7}/repo{d % 20}" for d in doc_id],
            "path": [f"src/{s}/file_{d}.py" for d, s in zip(doc_id, source)],
            "commit": [hashlib.sha256(f"commit:{d}".encode()).hexdigest()[:40] for d in doc_id],
            "lang": docs["lang"],
            "content": text,
            "sha256": [hashlib.sha256(t.encode("utf-8")).digest() for t in text],
        },
        schema=CORPUS_WITH_SHA,
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return out_path


def _scan_files(paths: list[str]) -> list[tuple[list[int], bool]]:
    """Footer metadata of each file: (per-row-group row counts, has_sha).
    Runs on the driver for small corpora and inside Ray tasks for large
    ones — pure function of the files, order-preserving."""
    out = []
    for path in paths:
        meta = pq.ParquetFile(path)
        has_sha = "sha256" in meta.schema_arrow.names
        out.append(
            (
                [meta.metadata.row_group(rg).num_rows for rg in range(meta.metadata.num_row_groups)],
                has_sha,
            )
        )
    return out


# files per footer-scan task: one task per file would drown in scheduling
# overhead (a footer read is ~ms); 512 footers ≈ 0.5-1 s of work per task
_SCAN_FILES_PER_TASK = 512
_SCAN_PARALLEL_MIN = 64  # below this a serial driver loop is faster


def scan_corpus(paths: list[str] | str) -> list[dict]:
    """Footer-only scan → ordered read units with deterministic doc offsets.

    Returns one dict per (file, row_group):
    ``{part, path, row_group, offset, num_rows, has_sha}``, with ``offset``
    the global docID of the unit's first row.  For many-file corpora the
    footer reads fan out as Ray tasks (``_SCAN_FILES_PER_TASK`` files per
    task); results come back in submission order, so units, parts and doc
    offsets are byte-identical to the serial scan (asserted in
    tests/test_sources.py).  The footer read is a few KB per file
    regardless of file size.
    """
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in sorted(paths):
        if os.path.isdir(p):
            files.extend(
                sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
            )
        else:
            files.append(p)

    import ray

    if len(files) >= _SCAN_PARALLEL_MIN and ray.is_initialized():
        scan_task = ray.remote(num_cpus=1)(_scan_files)
        chunks = [
            files[i : i + _SCAN_FILES_PER_TASK]
            for i in range(0, len(files), _SCAN_FILES_PER_TASK)
        ]
        metas: list[tuple[list[int], bool]] = []
        for part_metas in ray.get([scan_task.remote(c) for c in chunks]):
            metas.extend(part_metas)
    else:
        metas = _scan_files(files)

    units: list[dict] = []
    offset = 0
    part = 0
    for path, (rg_rows, has_sha) in zip(files, metas):
        for rg, n in enumerate(rg_rows):
            if n == 0:
                continue  # empty row group (e.g. an empty corpus file)
            units.append(
                {
                    "part": part,
                    "path": path,
                    "row_group": rg,
                    "offset": offset,
                    "num_rows": n,
                    "has_sha": has_sha,
                }
            )
            offset += n
            part += 1
    return units


def read_unit(unit: dict, columns: list[str] | None = None) -> pa.Table:
    """Read one (file, row_group) unit → corpus table + ``doc_id`` + ``part``.

    ``large_string`` corpus columns are cast down to ``string`` per batch
    (SURVEY.md §1.2 — accepted on read, normalized immediately).
    """
    cols = columns or CORPUS_COLUMNS
    want = cols + (["sha256"] if unit["has_sha"] and "sha256" not in cols else [])
    t = pq.ParquetFile(unit["path"]).read_row_group(unit["row_group"], columns=want)
    for i, f in enumerate(t.schema):
        if f.type == pa.large_string():
            t = t.set_column(i, f.name, t.column(i).cast(pa.string()))
    n = t.num_rows
    if n != unit["num_rows"]:
        raise ValueError(
            f"row-group size drift in {unit['path']}#{unit['row_group']}: "
            f"{n} rows, manifest says {unit['num_rows']}"
        )
    doc_id = pa.array(range(unit["offset"], unit["offset"] + n), type=pa.uint64())
    t = t.append_column("doc_id", doc_id)
    return t.append_column("part", pa.array([unit["part"]] * n, type=pa.uint32()))


def unit_fingerprint(unit: dict) -> str:
    """Lineage key of a read unit: path identity + size + row layout."""
    st = os.stat(unit["path"])
    return fingerprint(
        unit["path"],
        st.st_size,
        st.st_mtime_ns,  # ns resolution: same-second rewrites must invalidate
        unit["row_group"],
        unit["offset"],
        unit["num_rows"],
    )
