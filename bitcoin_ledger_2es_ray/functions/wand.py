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


class Cursor:
    """One compressed posting list with lazy block decode + skip."""

    __slots__ = (
        "order", "weight", "doc_bytes", "tf_bytes", "dl_bytes",
        "block_last", "block_off_d", "block_off_t", "block_off_l", "block_ub",
        "n_blocks", "bi", "docs", "tfs", "dls", "pos", "k1", "b", "avgdl",
    )

    def __init__(
        self,
        order: int,
        weight: float,
        doc_bytes: bytes,
        tf_bytes: bytes,
        dl_bytes: bytes,
        block_meta: list[dict],
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
        self.n_blocks = len(block_meta)
        self.block_last = np.array([m["last_doc"] for m in block_meta], dtype=np.uint64)
        self.block_off_d = np.array(
            [m["off_docs"] for m in block_meta] + [len(doc_bytes)], dtype=np.int64
        )
        self.block_off_t = np.array(
            [m["off_tfs"] for m in block_meta] + [len(tf_bytes)], dtype=np.int64
        )
        self.block_off_l = np.array(
            [m["off_dls"] for m in block_meta] + [len(dl_bytes)], dtype=np.int64
        )
        max_tf = np.array([m["max_tf"] for m in block_meta], dtype=np.float64)
        min_dl = np.array([m["min_dl"] for m in block_meta], dtype=np.float64)
        # vectorized per-block upper bounds (functions.bm25.block_upper_bound)
        self.block_ub = weight * (
            max_tf / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        )
        self.bi = -1
        self.docs = self.tfs = self.dls = None
        self.pos = 0
        self._load_block(0)

    # -- block machinery ---------------------------------------------------
    def _load_block(self, bi: int) -> None:
        if bi >= self.n_blocks:
            self.bi = self.n_blocks
            self.docs = np.array([_SENTINEL], dtype=np.uint64)
            self.tfs = np.zeros(1, dtype=np.uint32)
            self.dls = np.ones(1, dtype=np.uint32)
            self.pos = 0
            return
        base = self.block_last[bi - 1] if bi > 0 else np.uint64(0)
        gaps = varbyte_decode(self.doc_bytes[self.block_off_d[bi] : self.block_off_d[bi + 1]])
        self.docs = base + np.cumsum(gaps, dtype=np.uint64)
        self.tfs = varbyte_decode(self.tf_bytes[self.block_off_t[bi] : self.block_off_t[bi + 1]])
        self.dls = varbyte_decode(self.dl_bytes[self.block_off_l[bi] : self.block_off_l[bi + 1]])
        self.bi = bi
        self.pos = 0

    @property
    def exhausted(self) -> bool:
        return self.bi >= self.n_blocks

    @property
    def cur_doc(self) -> np.uint64:
        return self.docs[self.pos]

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
        if target > self.block_last[self.bi]:
            bi = int(np.searchsorted(self.block_last, target, side="left"))
            if bi >= self.n_blocks:
                self._load_block(self.n_blocks)
                return
            self._load_block(bi)
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):  # defensive; block_last guards this
            self._load_block(self.bi + 1)

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.weight * (tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)))

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_block(self.bi + 1)


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
            # -- full evaluation, BLOCK-AT-A-TIME: when sorted, lead cursors
            # all sit exactly on the pivot (pivot is the max lead cur_doc).
            # The window [pivot, win_end] ends at the earliest CURRENT-block
            # boundary over ALL active cursors, so every posting any cursor
            # holds inside the window is already decoded — the whole window
            # gets complete scores in one vectorized numpy TAAT pass instead
            # of doc-by-doc Python.  (Every active cursor's current block
            # ends at or after its cur_doc > pivot, so win_end >= pivot and
            # the loop always advances.)
            win_end = min(c.block_last[c.bi] for c in active)
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
