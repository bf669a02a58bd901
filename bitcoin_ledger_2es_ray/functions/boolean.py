"""Boolean posting-set ops (SURVEY.md §2.5 C6): AND / OR / NOT over docID sets.

Numpy sorted-set kernels (the reference's analog is ES bool queries).
Inputs are the decoded docID arrays of each term (sorted uint64).
"""

from __future__ import annotations

import numpy as np


def intersect_many(doc_sets: list[np.ndarray]) -> np.ndarray:
    """AND: docs present in every set (smallest-first to shrink fast)."""
    if not doc_sets:
        return np.empty(0, dtype=np.uint64)
    sets = sorted(doc_sets, key=len)
    acc = sets[0]
    for s in sets[1:]:
        if len(acc) == 0:
            break
        acc = acc[np.isin(acc, s, assume_unique=True)]
    return acc


def union_many(doc_sets: list[np.ndarray]) -> np.ndarray:
    """OR: k-way merge of sorted unique sets."""
    if not doc_sets:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(doc_sets))


def difference(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """NOT: docs in a but not in b."""
    if len(a) == 0:
        return a
    return a[~np.isin(a, b, assume_unique=True)]
