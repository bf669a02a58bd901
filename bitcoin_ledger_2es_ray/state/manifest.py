"""Per-partition lineage + metrics manifest (SURVEY.md §2.1 S4, §3.3).

The reference's durability model is "the output store is the checkpoint;
work is idempotent per block-height partition" (SURVEY.md §0.1) — the graft
generalizes that to: every output partition (tokenize part, segment shard)
commits atomically (tmp → fsync-free rename, which is atomic on POSIX) and
records a JSON entry with its input lineage fingerprint and metrics.  A
resumed build skips partitions whose fingerprint still matches
(BASELINE.json L14 "resumable from checkpoint with per-partition lineage +
metrics"; L6 "a killed build resumes without re-tokenizing completed
partitions").

Entries are one-file-per-partition (not a shared append log) so concurrent
Ray tasks never contend and a partial write of one entry cannot corrupt
others.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_DIR = "_MANIFEST"


class Manifest:
    def __init__(self, root: str):
        self.dir = os.path.join(root, MANIFEST_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, kind: str, key: int | str) -> str:
        return os.path.join(self.dir, f"{kind}-{key}.json")

    def write_entry(self, kind: str, key: int | str, entry: dict[str, Any]) -> None:
        """Atomically commit one partition's entry (rename = commit point)."""
        path = self._path(kind, key)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"kind": kind, "key": key, **entry}, f, sort_keys=True)
        os.replace(tmp, path)

    def read_entry(self, kind: str, key: int | str) -> dict[str, Any] | None:
        try:
            with open(self._path(kind, key)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def read_all(self, kind: str | None = None) -> dict[str, dict[str, Any]]:
        out: dict[str, dict[str, Any]] = {}
        if not os.path.isdir(self.dir):
            return out
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".json"):
                continue
            if kind is not None and not name.startswith(f"{kind}-"):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    out[name[: -len(".json")]] = json.load(f)
            except json.JSONDecodeError:
                continue  # torn write of an uncommitted entry — treated as absent
        return out

    def completed(self, kind: str) -> dict[str, dict[str, Any]]:
        """key(str) → entry, for entries with status=done."""
        return {
            str(e["key"]): e
            for e in self.read_all(kind).values()
            if e.get("status") == "done"
        }

    def remove_entry(self, kind: str, key: int | str) -> None:
        """Drop one partition's entry (used to invalidate stale lineage)."""
        try:
            os.remove(self._path(kind, key))
        except FileNotFoundError:
            pass


def atomic_write_parquet(table, path: str, row_group_size: int | None = None) -> int:
    """Write a parquet file atomically (tmp → rename); returns byte size."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    if row_group_size is None:
        pq.write_table(table, tmp)
    else:
        pq.write_table(table, tmp, row_group_size=row_group_size)
    size = os.path.getsize(tmp)
    os.replace(tmp, path)
    return size
