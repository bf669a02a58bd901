"""Hashing utilities (SURVEY.md §2.5 C7, §2.4 G1): content sha256 and the
deterministic term→shard assignment with head-term salting.

Determinism matters everywhere here: shard assignment must be identical
across processes, cluster sizes and resumes (python's builtin ``hash`` is
salted per process — never used).  blake2b is in hashlib (no external deps)
and fast in C.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def sha256_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256(content) per row → fixed_size_binary(32).

    The Python-level loop only dispatches into C hashlib; at real corpus
    sizes the hashing itself dominates, not the loop.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = bytearray(32 * len(arr))
    buf = arr.cast(pa.binary())
    for i, v in enumerate(buf):
        if v.is_valid:
            out[32 * i : 32 * i + 32] = hashlib.sha256(v.as_buffer()).digest()
    return pa.Array.from_buffers(
        pa.binary(32), len(arr), [None, pa.py_buffer(bytes(out))]
    )


def term_hash64(terms: list[str]) -> np.ndarray:
    """Stable 64-bit hash per term (blake2b-8)."""
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little")
            for t in terms
        ],
        dtype=np.uint64,
    )


def shard_and_salt(
    terms: pa.Array | pa.ChunkedArray,
    doc_ids: np.ndarray,
    num_partitions: int,
    head_salts: dict[str, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized shard/salt assignment (SURVEY.md §2.4 G1).

    Non-head terms: ``shard = h(term) % P``, salt 0.  Head terms (df estimate
    above threshold, ``head_salts[term] = n_salt``): the posting stream is
    split into ``n_salt`` doc-disjoint slices ``salt = doc_id % n_salt`` and
    each slice hashes to its own shard — this is what bounds the largest
    reduce-side group when df approaches N (BASELINE.json L6 "explicit
    salting for head-term skew").

    The per-row work is O(1) numpy; the only Python loop is over the batch's
    *distinct* terms (dictionary-encoded), never over rows.
    """
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    dic = pc.dictionary_encode(terms)
    codes = np.asarray(dic.indices)
    vocab = dic.dictionary.to_pylist()
    h = term_hash64(vocab)[codes]
    if head_salts:
        nsalt_vocab = np.array([head_salts.get(t, 0) for t in vocab], dtype=np.uint64)
        nsalt = nsalt_vocab[codes]
        salted = nsalt > 0
        salt = np.zeros(len(codes), dtype=np.uint64)
        if salted.any():
            salt[salted] = doc_ids[salted] % nsalt[salted]
        h = h + salt * _GOLDEN  # shifts salted slices to other shards
    else:
        salt = np.zeros(len(codes), dtype=np.uint64)
    shard = (h % np.uint64(num_partitions)).astype(np.uint32)
    return shard, salt.astype(np.uint16)


def shard_of_terms(
    terms: pa.Array | pa.ChunkedArray,
    salts: np.ndarray,
    num_partitions: int,
) -> np.ndarray:
    """Shard of each (term, salt) row under a given partition count — the
    same placement function as ``shard_and_salt`` with the salt ALREADY
    assigned.  Salt assignment is partition-count-independent (head_salts
    derives from the df sketch, never from P), so re-placing existing
    rows under a new P — resharding — reuses this exact function."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    dic = pc.dictionary_encode(terms)
    codes = np.asarray(dic.indices)
    h = term_hash64(dic.dictionary.to_pylist())[codes]
    h = h + salts.astype(np.uint64) * _GOLDEN
    return (h % np.uint64(num_partitions)).astype(np.uint32)


def fingerprint(*parts: object) -> str:
    """Short stable fingerprint of arbitrary metadata (lineage keys)."""
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(repr(p).encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()
