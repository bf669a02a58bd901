"""Block-max WAND top-k (SURVEY.md §2.5 C5; Ding & Suel SIGIR'11).

Document-at-a-time top-k over the compressed segments: per-(term, salt)
cursors advance through skip blocks, decoding a block only when its docID
range is reached; whole blocks are skipped when the sum of block-level
score upper bounds cannot beat the running threshold.

Safety / rank-identity (BASELINE.json L14): BMW is safe-up-to-k by
construction, and this implementation reproduces the exhaustive scorer's
tie behavior exactly:

- docs are visited in ascending docID order and enter the heap only with
  ``score > θ`` strictly once full, so among equal scores the smallest
  docIDs win — identical to (score DESC, doc_id ASC);
- a pivot's full score sums its cursors' contributions in **sorted term
  order** (cursors are created term-sorted and evaluation preserves that
  order), giving bit-identical float sums to pipelines/query.score_query;
- skip decisions compare upper bounds with ``<= θ``, so a potential exact
  tie with the kth score is skipped — correct, because the tied candidate
  would lose the docID tie-break against the already-seated entries anyway.

Performance (r2): cursors buffer a RANGE of blocks and decode the whole
range with ONE varbyte call per stream (gaps are a global delta within a
run, so a multi-block range decodes with a single cumsum from the previous
block's ``last_doc``).  The range width adapts: sequential loads — the
signature of a high-df query where no skipping is possible — double the
span up to ``MAX_SPAN``; any skip resets it to 1 so selective queries keep
block-granular skipping.  Block metadata converts from the Arrow
list-of-structs to numpy ONCE per raw row (``build_block_arrays``, cached
on the raw dict by ``Cursor.from_raw``), not per query.

A salted head term yields one cursor per doc-disjoint slice sharing the
term's idf (computed from the TOTAL df across slices) — WAND does not care
that two cursors carry the same term.
"""

from __future__ import annotations

import heapq

import numpy as np

from .bm25 import B, K1
from .codecs import varbyte_decode

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)

MAX_SPAN = 32  # widest multi-block decode range (blocks)


def build_block_arrays(
    block_meta: list[dict], n_doc_bytes: int, n_tf_bytes: int, n_dl_bytes: int
) -> tuple[np.ndarray, ...]:
    """Columnar view of a posting row's block metadata (built once, reused
    by every Cursor over that row): (last, off_d, off_t, off_l, max_tf,
    min_dl) with the offset arrays carrying the end sentinel."""
    n = len(block_meta)
    last = np.fromiter((m["last_doc"] for m in block_meta), dtype=np.uint64, count=n)
    off_d = np.empty(n + 1, dtype=np.int64)
    off_t = np.empty(n + 1, dtype=np.int64)
    off_l = np.empty(n + 1, dtype=np.int64)
    for i, m in enumerate(block_meta):
        off_d[i] = m["off_docs"]
        off_t[i] = m["off_tfs"]
        off_l[i] = m["off_dls"]
    off_d[n] = n_doc_bytes
    off_t[n] = n_tf_bytes
    off_l[n] = n_dl_bytes
    max_tf = np.fromiter((m["max_tf"] for m in block_meta), dtype=np.float64, count=n)
    min_dl = np.fromiter((m["min_dl"] for m in block_meta), dtype=np.float64, count=n)
    return last, off_d, off_t, off_l, max_tf, min_dl


class Cursor:
    """One compressed posting list with lazy multi-block decode + skip."""

    __slots__ = (
        "order", "weight", "doc_bytes", "tf_bytes", "dl_bytes",
        "block_last", "block_off_d", "block_off_t", "block_off_l", "block_ub",
        "n_blocks", "bi_lo", "bi_hi", "span", "docs", "tfs", "dls", "pos",
        "k1", "b", "avgdl",
    )

    def __init__(
        self,
        order: int,
        weight: float,
        doc_bytes: bytes,
        tf_bytes: bytes,
        dl_bytes: bytes,
        block_meta: list[dict] | tuple[np.ndarray, ...],
        avgdl: float,
        k1: float = K1,
        b: float = B,
    ):
        self.order = order  # sorted-term rank; fixes score accumulation order
        self.weight = weight
        self.doc_bytes = doc_bytes
        self.tf_bytes = tf_bytes
        self.dl_bytes = dl_bytes
        self.avgdl, self.k1, self.b = avgdl, k1, b
        if isinstance(block_meta, tuple):
            last, off_d, off_t, off_l, max_tf, min_dl = block_meta
        else:
            last, off_d, off_t, off_l, max_tf, min_dl = build_block_arrays(
                block_meta, len(doc_bytes), len(tf_bytes), len(dl_bytes)
            )
        self.n_blocks = len(last)
        self.block_last = last
        self.block_off_d = off_d
        self.block_off_t = off_t
        self.block_off_l = off_l
        # vectorized per-block upper bounds (functions.bm25.block_upper_bound)
        self.block_ub = weight * (
            max_tf / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        )
        self.span = 1
        self.bi_lo = self.bi_hi = 0
        self.docs = self.tfs = self.dls = None
        self.pos = 0
        self._load_blocks(0)

    @classmethod
    def from_raw(
        cls,
        order: int,
        weight: float,
        raw: dict,
        avgdl: float,
        k1: float = K1,
        b: float = B,
    ) -> "Cursor":
        """Build from a raw segment row dict, caching the columnar block
        arrays ON the dict so repeated queries skip the conversion."""
        arrays = raw.get("_block_arrays")
        if arrays is None:
            arrays = build_block_arrays(
                raw["block_meta"], len(raw["doc_ids"]), len(raw["tfs"]), len(raw["dls"])
            )
            raw["_block_arrays"] = arrays
        return cls(order, weight, raw["doc_ids"], raw["tfs"], raw["dls"], arrays, avgdl, k1, b)

    # -- block machinery ---------------------------------------------------
    def _load_blocks(self, bi: int) -> None:
        """Decode blocks [bi, bi+span) into the buffer — ONE varbyte call
        per stream.  Sequential loads widen the span (no skipping is
        happening); a jump resets it to 1 (skipping works — stay fine)."""
        if bi >= self.n_blocks:
            self.bi_lo = self.bi_hi = self.n_blocks
            self.docs = np.array([_SENTINEL], dtype=np.uint64)
            self.tfs = np.zeros(1, dtype=np.uint32)
            self.dls = np.ones(1, dtype=np.uint32)
            self.pos = 0
            return
        if bi == self.bi_hi and self.bi_hi > self.bi_lo:
            self.span = min(self.span * 2, MAX_SPAN)
        elif bi != self.bi_hi:
            self.span = 1
        hi = min(bi + self.span, self.n_blocks)
        base = self.block_last[bi - 1] if bi > 0 else np.uint64(0)
        gaps = varbyte_decode(self.doc_bytes[self.block_off_d[bi] : self.block_off_d[hi]])
        self.docs = base + np.cumsum(gaps, dtype=np.uint64)
        self.tfs = varbyte_decode(self.tf_bytes[self.block_off_t[bi] : self.block_off_t[hi]])
        self.dls = varbyte_decode(self.dl_bytes[self.block_off_l[bi] : self.block_off_l[hi]])
        self.bi_lo = bi
        self.bi_hi = hi
        self.pos = 0

    @property
    def exhausted(self) -> bool:
        return self.bi_lo >= self.n_blocks

    @property
    def cur_doc(self) -> np.uint64:
        return self.docs[self.pos]

    @property
    def loaded_last(self) -> np.uint64:
        """Last docID currently decoded in the buffer."""
        return self.block_last[self.bi_hi - 1]

    def cur_block_ub(self, doc: np.uint64) -> float:
        """Upper bound of the block that would contain ``doc`` (≥ cur_doc)."""
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        if bi >= self.n_blocks:
            return 0.0
        return float(self.block_ub[bi])

    def block_boundary(self, doc: np.uint64) -> np.uint64:
        """last_doc of the block that would contain ``doc``."""
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        if bi >= self.n_blocks:
            return _SENTINEL
        return self.block_last[bi]

    def next_geq(self, target: np.uint64) -> None:
        """Advance to the first posting with doc >= target (skips blocks)."""
        if self.exhausted or self.docs[self.pos] >= target:
            return
        if target > self.loaded_last:
            bi = int(np.searchsorted(self.block_last, target, side="left"))
            if bi >= self.n_blocks:
                self._load_blocks(self.n_blocks)
                return
            self._load_blocks(bi)
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):  # defensive; block_last guards this
            self._load_blocks(self.bi_hi)

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.weight * (tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)))

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_blocks(self.bi_hi)


def wand_topk(cursors: list[Cursor], k: int) -> list[tuple[int, float]]:
    """Block-max WAND top-k over the given cursors.

    Returns [(doc_id, score)] ordered (score DESC, doc_id ASC).
    """
    if k <= 0:
        return []
    cursors = [c for c in cursors if not c.exhausted]
    ub = {id(c): float(np.max(c.block_ub)) if c.n_blocks else 0.0 for c in cursors}
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    theta = -np.inf

    while True:
        active = [c for c in cursors if not c.exhausted]
        if not active:
            break
        active.sort(key=lambda c: int(c.cur_doc))
        # -- find pivot: first doc where cumulative term ubs can beat theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(active):
            acc += ub[id(c)]
            if acc > theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # even all remaining ubs together cannot beat theta
        pivot = active[pivot_i].cur_doc
        # include every cursor already positioned on the pivot doc
        while pivot_i + 1 < len(active) and active[pivot_i + 1].cur_doc == pivot:
            pivot_i += 1
        lead = active[: pivot_i + 1]

        # -- block-max refinement: tighter bound from the actual blocks
        block_sum = sum(c.cur_block_ub(pivot) for c in lead)
        if block_sum <= theta:
            # No doc in (pivot, d'] can win, where d' is the smallest block
            # boundary among the lead cursors CAPPED at the next non-lead
            # cursor's current doc (beyond that, an additional term could
            # contribute and the bound would be wrong — Ding & Suel Alg. 2).
            boundary = min(c.block_boundary(pivot) for c in lead)
            target = boundary + np.uint64(1) if boundary != _SENTINEL else _SENTINEL
            if pivot_i + 1 < len(active):
                target = min(target, active[pivot_i + 1].cur_doc)
            for c in lead:
                if c.cur_doc < target:
                    c.next_geq(target)
            continue

        if active[0].cur_doc == pivot:
            # -- full evaluation, WINDOW-AT-A-TIME: when sorted, lead cursors
            # all sit exactly on the pivot (pivot is the max lead cur_doc).
            # The window [pivot, win_end] ends at the earliest LOADED-RANGE
            # boundary over ALL active cursors, so every posting any cursor
            # holds inside the window is already decoded — the whole window
            # gets complete scores in one vectorized numpy TAAT pass instead
            # of doc-by-doc Python.  Buffers span multiple blocks when spans
            # have widened, so high-df queries amortize the per-window
            # Python overhead over thousands of postings.  (Every active
            # cursor's loaded range ends at or after its cur_doc > pivot, so
            # win_end >= pivot and the loop always advances.)
            win_end = min(c.loaded_last for c in active)
            docs_l, contrib_l = [], []
            for c in sorted(active, key=lambda c: c.order):  # fixed float order
                i1 = int(np.searchsorted(c.docs, win_end, side="right"))
                if i1 <= c.pos:
                    continue
                d = c.docs[c.pos : i1]
                tf = c.tfs[c.pos : i1].astype(np.float64)
                dl = c.dls[c.pos : i1].astype(np.float64)
                docs_l.append(d)
                contrib_l.append(
                    c.weight * (tf / (tf + c.k1 * (1.0 - c.b + c.b * dl / c.avgdl)))
                )
            uniq, inv = np.unique(np.concatenate(docs_l), return_inverse=True)
            scores = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(scores, inv, np.concatenate(contrib_l))
            # candidates ascend by docID (np.unique sorts) → same tie
            # behavior as the doc-at-a-time loop
            if len(heap) >= k:
                m = scores > theta
                uniq, scores = uniq[m], scores[m]
            for doc, score in zip(uniq, scores):
                if len(heap) < k:
                    heapq.heappush(heap, (float(score), -int(doc)))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif score > theta:
                    heapq.heapreplace(heap, (float(score), -int(doc)))
                    theta = heap[0][0]
            for c in active:
                if c.cur_doc <= win_end:
                    c.next_geq(win_end + np.uint64(1))
        else:
            # -- not aligned: advance the earliest cursor up to the pivot
            active[0].next_geq(pivot)

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-nd, s) for s, nd in out]
