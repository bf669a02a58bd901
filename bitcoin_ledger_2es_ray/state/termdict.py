"""Term-dictionary lookup with bounded per-process memory (SURVEY.md §2.4 G4).

``term_dict.parquet`` is globally sorted by (term, salt) and written in
modest row groups.  Lookup has two modes:

- **eager** (vocab ≤ ``eager_max_rows``): load everything into Python dicts
  — the lowest-latency path; right for test/bench-scale vocabularies and
  for serving actors that own a small shard subset.
- **pruned** (large vocab): the parquet footer's per-row-group min/max term
  statistics select the candidate row group(s) for a term (the file is
  globally sorted, so a term spans at most a couple of adjacent groups);
  row groups load lazily into a small LRU cache and lookups binary-search
  the group's sorted term list.  Per-process residency is footer metadata
  + ``cache_rgs`` row groups — independent of vocabulary size, which is
  what a 10^12-doc code corpus (billions of distinct identifiers) needs.

Both modes return identical results (asserted in tests/test_large_vocab.py).
A term's rows (its doc-disjoint salt slices) are contiguous in the file, and
exact df is the sum over slices.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_merged_term_dict(
    part_paths: list[str],
    out_path: str,
    eager_max_rows: int = 2_000_000,
    row_group_size: int = 65536,
) -> int:
    """Merge per-shard SORTED dictionary runs → the global (term, salt)-sorted
    ``term_dict.parquet``; returns the distinct-term count.

    Small vocab: concat + one C++ sort (fastest).  Large vocab: streaming
    chunked k-way merge — each run contributes one buffered row group at a
    time; every round emits all rows ≤ the smallest "last buffered key" among
    runs that still have unread row groups, so driver memory is bounded by
    (#runs × row_group_size) rows however large the vocabulary is.  Keys
    (term, salt) are globally unique (shard = hash(term, salt)), so both
    paths produce identical bytes.
    """
    import os

    from ..schemas import TERM_DICT
    from .manifest import atomic_write_parquet

    readers = [pq.ParquetFile(p) for p in part_paths]
    readers = [r for r in readers if r.metadata.num_rows > 0]
    total = sum(r.metadata.num_rows for r in readers)
    if total <= eager_max_rows:
        if readers:
            merged = pa.concat_tables([r.read() for r in readers]).sort_by(
                [("term", "ascending"), ("salt", "ascending")]
            )
        else:
            merged = pa.Table.from_pylist([], schema=TERM_DICT)
        atomic_write_parquet(merged, out_path, row_group_size=row_group_size)
        import pyarrow.compute as pc

        return len(pc.unique(merged["term"]))

    class _Run:
        def __init__(self, pf: pq.ParquetFile):
            self.pf = pf
            self.next_rg = 0
            self.buf: pa.Table | None = None
            self.keys: list[tuple[str, int]] = []
            self.refill()

        def refill(self) -> None:
            while (self.buf is None or self.buf.num_rows == 0) and self.next_rg < self.pf.metadata.num_row_groups:
                self.buf = self.pf.read_row_group(self.next_rg)
                self.next_rg += 1
                self.keys = list(
                    zip(self.buf["term"].to_pylist(), self.buf["salt"].to_pylist())
                )
            if self.buf is not None and self.buf.num_rows == 0:
                self.buf = None
                self.keys = []

        @property
        def has_unread(self) -> bool:
            return self.next_rg < self.pf.metadata.num_row_groups

        def cut(self, bound: tuple[str, int] | None) -> pa.Table | None:
            """Emit rows with key <= bound; keep the remainder buffered."""
            if self.buf is None:
                return None
            if bound is None:
                out, self.buf, self.keys = self.buf, None, []
                return out
            n = bisect_right(self.keys, bound)
            if n == 0:
                return None
            out = self.buf.slice(0, n)
            self.buf = self.buf.slice(n)
            self.keys = self.keys[n:]
            if self.buf.num_rows == 0:
                self.buf = None
                self.keys = []
            return out

    runs = [_Run(r) for r in readers]
    tmp = f"{out_path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    n_terms = 0
    prev_term: str | None = None
    with pq.ParquetWriter(tmp, TERM_DICT) as w:
        while True:
            for r in runs:
                if r.buf is None:
                    r.refill()
            live = [r for r in runs if r.buf is not None]
            if not live:
                break
            bounded = [r.keys[-1] for r in live if r.has_unread]
            bound = min(bounded) if bounded else None
            chunks = [c for r in live if (c := r.cut(bound)) is not None]
            if not chunks:  # bound below every buffered key — refill and retry
                continue
            merged = pa.concat_tables(chunks).sort_by(
                [("term", "ascending"), ("salt", "ascending")]
            )
            w.write_table(merged, row_group_size=row_group_size)
            terms = np.asarray(merged["term"])
            n_terms += int(terms[0] != prev_term) + int((terms[1:] != terms[:-1]).sum())
            prev_term = terms[-1]
    os.replace(tmp, out_path)
    return n_terms


class TermDict:
    def __init__(self, path: str, eager_max_rows: int = 1 << 19, cache_rgs: int = 32):
        self._pf = pq.ParquetFile(path)
        md = self._pf.metadata
        self._n_rows = md.num_rows
        self.eager = self._n_rows <= eager_max_rows
        self._cache_rgs = cache_rgs
        if self.eager:
            td = self._pf.read()
            self.lookup: dict[str, list[tuple[int, int]]] = {}
            self.df: dict[str, int] = {}
            for term, part, row, df in zip(
                td["term"].to_pylist(),
                td["partition"].to_pylist(),
                td["row"].to_pylist(),
                td["df"].to_pylist(),
            ):
                self.lookup.setdefault(term, []).append((part, row))
                self.df[term] = self.df.get(term, 0) + df
            return
        # pruned mode: footer stats only; data loads lazily per row group
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ti = names.index("term")
        self._rg_min: list[str] = []
        self._rg_max: list[str] = []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(ti).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"term_dict {path} row group {i} lacks term min/max statistics — "
                    "pruned lookup needs them (write with pyarrow defaults)"
                )
            self._rg_min.append(st.min)
            self._rg_max.append(st.max)
        self._cache: OrderedDict[int, tuple[list[str], np.ndarray, np.ndarray, np.ndarray]] = (
            OrderedDict()
        )

    # -- pruned-mode internals ---------------------------------------------
    def _row_group(self, i: int):
        hit = self._cache.get(i)
        if hit is not None:
            self._cache.move_to_end(i)
            return hit
        t = self._pf.read_row_group(i, columns=["term", "partition", "row", "df"])
        entry = (
            t["term"].to_pylist(),  # sorted — bisect below
            np.asarray(t["partition"].combine_chunks()),
            np.asarray(t["row"].combine_chunks()),
            np.asarray(t["df"].combine_chunks()),
        )
        self._cache[i] = entry
        if len(self._cache) > self._cache_rgs:
            self._cache.popitem(last=False)
        return entry

    def _candidate_rgs(self, term: str) -> range:
        # file globally sorted ⇒ groups holding `term` are contiguous:
        # those with min <= term <= max
        lo = bisect_left(self._rg_max, term)  # first group with max >= term
        hi = bisect_right(self._rg_min, term)  # first group with min > term
        return range(lo, hi)

    # -- public API ---------------------------------------------------------
    def rows_of(self, term: str) -> list[tuple[int, int]]:
        """[(partition, row)] of the term's salt slices ([] if absent)."""
        if self.eager:
            return self.lookup.get(term, [])
        out: list[tuple[int, int]] = []
        for i in self._candidate_rgs(term):
            terms, part, row, _ = self._row_group(i)
            s = bisect_left(terms, term)
            e = bisect_right(terms, term)
            out.extend(zip(part[s:e].tolist(), row[s:e].tolist()))
        return out

    def df_of(self, term: str) -> int:
        """Exact df: sum over the term's doc-disjoint salt slices (0 if absent)."""
        if self.eager:
            return self.df.get(term, 0)
        total = 0
        for i in self._candidate_rgs(term):
            terms, _, _, df = self._row_group(i)
            s = bisect_left(terms, term)
            e = bisect_right(terms, term)
            total += int(df[s:e].sum())
        return total

    def terms_with_prefix(self, prefix: str, limit: int = 1 << 20) -> list[str]:
        """Distinct terms starting with ``prefix``, in sorted order — the
        FST-style dictionary range scan behind prefix/wildcard queries.

        Eager mode bisects a (lazily built, cached) sorted vocab list.
        Pruned mode touches ONLY the row groups whose footer [min, max] term
        range can intersect the prefix interval ``[prefix, prefix + maxchar)``
        — contiguous because the file is globally sorted — so cost scales
        with the match count, not the vocabulary.  ``limit`` guards against
        an empty/degenerate prefix expanding to the whole dictionary.
        """
        if prefix == "":
            raise ValueError("prefix must be non-empty (a bare '*' would scan the world)")
        hi = prefix + "\U0010ffff"  # > every prefix-extension, < next sibling
        out: list[str] = []
        if self.eager:
            if not hasattr(self, "_sorted_vocab"):
                self._sorted_vocab = sorted(self.df)
            v = self._sorted_vocab
            s = bisect_left(v, prefix)
            e = bisect_left(v, hi)
            out = v[s:e]
            if len(out) > limit:
                raise ValueError(f"prefix {prefix!r} matches {len(out)} terms (> limit {limit})")
            return out
        lo_rg = bisect_left(self._rg_max, prefix)  # first group with max >= prefix
        hi_rg = bisect_right(self._rg_min, hi)  # first group with min > hi
        prev = None
        for i in range(lo_rg, hi_rg):
            terms, _, _, _ = self._row_group(i)
            s = bisect_left(terms, prefix)
            e = bisect_left(terms, hi)
            for t in terms[s:e]:
                if t != prev:  # salt slices duplicate terms — dedupe inline
                    out.append(t)
                    prev = t
            if len(out) > limit:
                raise ValueError(f"prefix {prefix!r} matches >{limit} terms")
        return out

    def terms_fuzzy(
        self, query: str, max_dist: int = 1, transpositions: bool = False
    ) -> list[str]:
        """Distinct terms within Levenshtein distance ``max_dist`` of
        ``query``, sorted — the ES ``fuzzy`` dictionary expansion.

        Lucene walks a Levenshtein automaton over the FST; the graft scans
        the dictionary with the vectorized DP kernel
        (``functions.editdist``), length-pruned per unit.  Eager mode runs
        one kernel call over the cached vocab; pruned mode streams row
        groups so residency stays O(row group) at any vocabulary size (the
        scan is inherently full-dictionary — term sort order cannot prune
        an edit-distance ball, only the per-unit length filter can).
        """
        from ..functions.editdist import fuzzy_scan_table

        if self.eager:
            if not hasattr(self, "_sorted_vocab"):
                self._sorted_vocab = sorted(self.df)
            v = self._sorted_vocab
            mask = fuzzy_scan_table(
                pa.array(v, type=pa.string()), query, max_dist, transpositions
            )
            return [t for t, m in zip(v, mask) if m]
        out: list[str] = []
        prev = None
        for i in range(self._pf.metadata.num_row_groups):
            col = self._pf.read_row_group(i, columns=["term"])["term"]
            mask = fuzzy_scan_table(col, query, max_dist, transpositions)
            for t, m in zip(col.to_pylist(), mask):
                if m and t != prev:  # salt slices duplicate terms
                    out.append(t)
                    prev = t
        return out

    def partitions(self) -> list[int]:
        """Distinct segment shard ids — one columnar scan, no Python dicts."""
        import pyarrow.compute as pc

        col = self._pf.read(columns=["partition"])["partition"]
        return sorted(pc.unique(col.combine_chunks()).to_pylist())

    def vocab(self):
        """Iterate distinct terms in sorted order (streams row groups —
        O(row group) residency; used by fixtures/CLI, not the hot path)."""
        if self.eager:
            yield from sorted(self.df)
            return
        prev = None
        for i in range(self._pf.metadata.num_row_groups):
            for t in self._pf.read_row_group(i, columns=["term"])["term"].to_pylist():
                if t != prev:
                    prev = t
                    yield t

    def df_map(self) -> dict[str, int]:
        """term → exact df as a plain dict (eager-sized vocabularies only)."""
        if self.eager:
            return self.df
        out: dict[str, int] = {}
        for i in range(self._pf.metadata.num_row_groups):
            t = self._pf.read_row_group(i, columns=["term", "df"])
            for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
                out[term] = out.get(term, 0) + df
        return out
