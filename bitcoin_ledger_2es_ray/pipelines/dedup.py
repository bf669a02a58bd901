"""Deduplication operators for large-scale training-data pipelines.

All operate over the driver's ``documents`` table shape
(doc_id, text, ...), Ray-Data-first:

- ``exact_dedup``          sha256-hash groupby → representative per content
- ``shingle_jaccard_pairs``  EXACT n-gram Jaccard ≥ τ via a shingle-inverted
                           shuffle (no all-pairs scan) — SQL-oracle checkable
- ``minhash_lsh_pairs``    MinHash + banded LSH candidates, verified with
                           exact Jaccard (scale path; probabilistic recall)
- ``simhash_fingerprints`` 64-bit SimHash per doc (vectorized reduceat)

Scale notes (SURVEY.md §4):

- Shingles are DISTINCT word-k-grams of the whitespace token stream in
  document order (exactly the SQL oracle's ``string_split(text, ' ')``
  semantics — the identifier-splitting tokenizer would reorder part-tokens
  and change k-gram semantics, ADVICE r1).  Hashing is fully vectorized:
  dictionary-encode the words once per batch, hash only the vocabulary,
  combine k consecutive word hashes with a polynomial mix.
- Candidate DISCOVERY shuffles by a bounded key (shingle / band-bucket) —
  never an all-pairs join.  The exact path RAISES when a shingle group
  exceeds ``max_group`` (silent dropping would violate its exactness
  contract); the LSH path drops oversized buckets by design (a recall
  bound, noted in the docstring).
- Candidate VERIFICATION is distributed (r1 did it on the driver): the
  candidate-doc set (small — docs appearing in ≥1 candidate pair) is
  broadcast once via ``ray.put`` as a semi-join pushdown, their shingles are
  re-exploded inside tasks, joined against a (doc → pair, side) fan-out of
  the pair list with ``Dataset.join``, and one ``groupby(pair).map_groups``
  computes |A∩B|, |A|, |B| and the exact Jaccard per pair.  No stage ever
  materializes the corpus (or the full shingle table) on the driver; per-pair
  group size is bounded by 2× the max shingles per doc.
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


_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant (splitmix64)


def _word_hashes(flat_words: pa.Array) -> np.ndarray:
    """uint64 hash per word, vectorized via dictionary-encode: the Python
    blake2b loop runs over the (small) per-batch VOCABULARY, never the
    token stream."""
    if len(flat_words) == 0:
        return np.empty(0, dtype=np.uint64)
    dic = pc.dictionary_encode(flat_words)
    codes = np.asarray(dic.indices)
    vocab_h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little")
            for w in dic.dictionary.to_pylist()
        ),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    return vocab_h[codes]


def _batch_shingles(batch: pa.Table, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct word-k-gram hashes per doc — (doc_ids, sh, doc_starts).

    Rows come back sorted by (doc, sh) with ``doc_starts`` the reduceat
    boundaries per present doc; docs with no k-gram emit nothing.
    """
    text = batch["text"].combine_chunks()
    words = pc.split_pattern(text, " ")  # oracle semantics: single-space split
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    h = _word_hashes(pc.list_flatten(words))
    n = len(h)
    doc_ids_col = np.asarray(batch["doc_id"]).astype(np.uint64)
    row_idx = np.repeat(np.arange(batch.num_rows), lens)
    if n < k:
        e = np.empty(0, dtype=np.uint64)
        return e, e, np.empty(0, dtype=np.int64)
    # polynomial combine of k consecutive word hashes (position-sensitive):
    # the loop is over the k offsets, never over tokens
    m = n - k + 1
    gram = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        gram = gram * _MIX + h[j : j + m]
    valid = row_idx[:m] == row_idx[k - 1 :]  # all k words in the same doc
    gram = gram[valid]
    rows = row_idx[:m][valid]
    if len(gram) == 0:  # every doc shorter than k words
        e = np.empty(0, dtype=np.uint64)
        return e, e, np.empty(0, dtype=np.int64)
    # distinct per doc: sort by (row, gram), drop adjacent duplicates
    order = np.lexsort((gram, rows))
    rows, gram = rows[order], gram[order]
    keep = np.empty(len(rows), dtype=bool)
    keep[0:1] = True
    keep[1:] = (rows[1:] != rows[:-1]) | (gram[1:] != gram[:-1])
    rows, gram = rows[keep], gram[keep]
    starts = np.flatnonzero(np.concatenate(([True], rows[1:] != rows[:-1])))
    return doc_ids_col[rows], gram, starts


def _shingle_explode(batch: pa.Table, k: int) -> pa.Table:
    d, s, _ = _batch_shingles(batch, k)
    return pa.table(
        {"doc_id": pa.array(d, type=pa.uint64()), "sh": pa.array(s, type=pa.uint64())}
    )


def _make_pairs_fn(max_group: int, on_overflow: str):
    """Group→pairs body.  ``on_overflow``: "raise" (exact contract) or
    "drop" (LSH recall bound)."""

    def pairs_from_group(group: pa.Table) -> pa.Table:
        docs = np.unique(np.asarray(group["doc_id"]))
        n = len(docs)
        if n > max_group:
            if on_overflow == "raise":
                raise ValueError(
                    f"shingle group of {n} docs exceeds max_group={max_group}: "
                    "the exact-Jaccard contract cannot silently drop pairs — "
                    "raise max_group or pre-filter boilerplate shingles"
                )
            n = 0  # LSH path: drop the bucket (documented recall bound)
        if n < 2:
            return pa.table(
                {"a": pa.array([], type=pa.uint64()), "b": pa.array([], type=pa.uint64())}
            )
        ia, ib = np.triu_indices(n, k=1)
        return pa.table({"a": pa.array(docs[ia]), "b": pa.array(docs[ib])})

    return pairs_from_group


def _prefix_pairs_fn(max_group: int, tau: float):
    """Prefix-group → candidate pairs with PPJoin's LENGTH and POSITIONAL
    filters (both exactness-preserving):

    - length: J >= tau forces min(|A|,|B|) >= tau·max(|A|,|B|);
    - positional: for the pair's FIRST shared canonical shingle at prefix
      positions (pA, pB), |A ∩ B| <= min(|A|-pA, |B|-pB); a true pair needs
      |A ∩ B| >= ceil(tau/(1+tau)·(|A|+|B|)).  Later shared shingles may
      fail the bound — the first-match group still emits the pair."""

    def pairs_from_group(group: pa.Table) -> pa.Table:
        docs = np.asarray(group["doc_id"]).astype(np.uint64)
        n = len(docs)
        if n > max_group:
            raise ValueError(
                f"prefix-shingle group of {n} docs exceeds max_group={max_group}"
            )
        if n < 2:
            return pa.table(
                {"a": pa.array([], type=pa.uint64()), "b": pa.array([], type=pa.uint64())}
            )
        L = np.asarray(group["len"], dtype=np.int64)
        P = np.asarray(group["pos"], dtype=np.int64)
        ia, ib = np.triu_indices(n, k=1)
        la, lb = L[ia], L[ib]
        ok = np.minimum(la, lb) >= tau * np.maximum(la, lb)
        alpha = np.ceil(tau / (1.0 + tau) * (la + lb))
        ok &= np.minimum(la - P[ia], lb - P[ib]) >= alpha
        a = docs[ia][ok]
        b = docs[ib][ok]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        return pa.table(
            {"a": pa.array(lo[keep]), "b": pa.array(hi[keep])}
        )

    return pairs_from_group


# ---------------------------------------------------------------------------
# distributed exact-Jaccard verification of a candidate-pair Dataset


def _verify_pairs_exact(sf_dir: str, cand, k: int, tau: float, num_partitions: int = 8) -> pa.Table:
    """Exact Jaccard for every candidate pair, fully distributed.

    ``cand``: Dataset with uint64 columns (a, b), already deduplicated.
    Shape: fan the pair list out to (doc, a, b, side) rows IN TASKS (the
    pair Dataset never lands on the driver — VERDICT r2), re-shingle ONLY
    the candidate docs (broadcast doc-id set = semi-join pushdown), hash-join
    shingles to sides, then one groupby((a, b)) computes intersection and
    both set sizes from the group itself — sizes never touch the driver.
    The only driver-resident artifact is the candidate doc-id ARRAY
    (distributed distinct, bounded by docs-in-any-pair, not corpus size).
    """
    import ray

    def fan_out_sides(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks().cast(pa.uint64())
        b = batch["b"].combine_chunks().cast(pa.uint64())
        return pa.table(
            {
                "doc": pa.concat_arrays([a, b]),
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "side": pa.array(np.repeat(np.array([0, 1], dtype=np.int8), batch.num_rows)),
            }
        )

    # materialize once (object store, spillable) so the distinct below and
    # the join don't each re-run the discovery shuffle upstream of ``cand``
    sides = cand.map_batches(
        fan_out_sides, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    cand_docs = np.sort(np.asarray(sides.unique("doc"), dtype=np.uint64))
    if len(cand_docs) == 0:
        return _empty_pairs()
    docs_ref = ray.put(cand_docs)  # sorted; broadcast once, read per task

    def shingle_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(docs_ref)
        ids = np.asarray(batch["doc_id"]).astype(np.uint64)
        mask = wanted[np.searchsorted(wanted, ids).clip(max=len(wanted) - 1)] == ids
        batch = batch.filter(pa.array(mask))
        return _shingle_explode(batch, k)
    shingles = _read_docs(sf_dir).map_batches(
        shingle_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = shingles.join(
        sides,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
        right_on=("doc",),
    )

    # One shuffle keyed by a COARSE pair-hash bucket (not per pair: a
    # groupby((a, b)).map_groups pays one Python call + table build per
    # candidate pair — measured dominating at 10× scale), then one
    # vectorized pass per bucket computes EVERY pair's exact Jaccard with
    # lexsort + run reduction: per-side shingle sets are distinct by
    # construction, so within a (a, b) run an sh value repeats iff both
    # sides hold it — adjacent-duplicate counting IS the intersection.
    # Bucket count scales with the requested partitioning (8 reduce tasks
    # per partition) so a bigger cluster fans the verify wider.
    n_buckets = max(64, num_partitions * 8)

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"]).astype(np.uint64)
        b = np.asarray(batch["b"]).astype(np.uint64)
        pb = ((a * np.uint64(0x9E3779B97F4A7C15)) ^ b) % np.uint64(n_buckets)
        return batch.append_column("pb", pa.array(pb.astype(np.int64)))

    def verify_bucket(group: pa.Table) -> pa.Table:
        a = np.asarray(group["a"]).astype(np.int64)
        b = np.asarray(group["b"]).astype(np.int64)
        sh = np.asarray(group["sh"]).astype(np.uint64)
        side = np.asarray(group["side"]).astype(np.int8)
        order = np.lexsort((sh, b, a))
        a, b, sh, side = a[order], b[order], sh[order], side[order]
        newp = np.ones(len(a), dtype=bool)
        newp[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(newp)
        runlen = np.diff(np.r_[starts, len(a)])
        seg = np.repeat(np.arange(len(starts)), runlen)
        dup = np.zeros(len(a), dtype=bool)
        dup[1:] = ~newp[1:] & (sh[1:] == sh[:-1])
        inter = np.bincount(seg, weights=dup, minlength=len(starts)).astype(
            np.int64
        )
        na = np.bincount(
            seg, weights=(side == 0), minlength=len(starts)
        ).astype(np.int64)
        nb = runlen - na
        ok = (na > 0) & (nb > 0)
        j = inter / np.maximum(na + nb - inter, 1)
        keep = ok & (j >= tau)  # filter UNROUNDED (matches the SQL oracle)
        if not keep.any():
            return _empty_pairs_j()
        return pa.table(
            {
                "a": pa.array(a[starts][keep], type=pa.int64()),
                "b": pa.array(b[starts][keep], type=pa.int64()),
                "jaccard": pa.array(sql_round(j[keep], 6), type=pa.float64()),
            }
        )

    out = (
        joined.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pb")
        .map_groups(verify_bucket, batch_format="pyarrow")
    )
    # drop empty blocks BEFORE concat: an empty map_groups output block can
    # carry the upstream join schema (doc_id/sh/side/...) instead of the
    # kernel's (a, b, jaccard) — concat across them raises ArrowInvalid
    parts = [p for p in (_as_table(x) for x in _collect(out)) if p.num_rows]
    t = pa.concat_tables(parts or [_empty_pairs_j()])
    return t.sort_by([("a", "ascending"), ("b", "ascending")])


def _empty_pairs() -> pa.Table:
    return pa.table(
        {"a": pa.array([], type=pa.uint64()), "b": pa.array([], type=pa.uint64())}
    )


def _empty_pairs_j() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# exact dedup (SURVEY.md §2.2 M8 / §2.4 G8)


def exact_dedup(sf_dir: str) -> pa.Table:
    """Group identical content (sha256) → (rep_doc_id=min, n_dups).

    Ray Data: vectorized hash column inside map_batches, then a groupby
    aggregate (hash shuffle) — the exact-dedup pattern from the Ray guide.
    """
    from ray.data.aggregate import Count, Min

    from ..functions.hashing import sha256_column

    def add_hash(batch: pa.Table) -> pa.Table:
        # sha256_column hashes Arrow buffers directly (no to_pylist copy);
        # the groupby key is the 32-byte digest itself
        h = sha256_column(batch["text"]).cast(pa.binary())
        return pa.table({"doc_id": batch["doc_id"], "h": h})

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


def shingle_jaccard_pairs(
    sf_dir: str, k: int = 3, tau: float = 0.8, max_group: int = 20000
) -> pa.Table:
    """All doc pairs with Jaccard(word-k-gram sets) >= tau — EXACT.

    Discovery: per-batch shingle explode → groupby(shingle) pair explode
    (RAISES if a shingle's doc group exceeds ``max_group`` — exactness over
    silent recall loss) → pair dedup.  Verification: the shared distributed
    exact-Jaccard kernel.  Only docs sharing ≥ 1 shingle ever pair
    (J >= tau > 0 implies a shared shingle), so the result is exact without
    an all-pairs scan.
    """
    from ray.data.aggregate import Count

    # PPJoin-style PREFIX FILTERING (exact): under ANY fixed global order,
    # J(A,B) >= tau implies the first |A| - ceil(tau*|A|) + 1 shingles of A
    # and the corresponding prefix of B share an element — so only PREFIX
    # shingles need to generate candidates.  Canonical order = rarest-first
    # (global df ASC, shingle ASC), which steers candidates through RARE
    # shingles and cuts the pair explosion by orders of magnitude.  The
    # (shingle -> rank) table is vocabulary-sized and broadcast once; at
    # 100-TB shingle vocabularies it becomes a Dataset join instead.
    import ray

    # global shingle df: per-batch (sh, count) partials (uint64 keys fall
    # back to pickled objects in Ray's hash agg, so the vocab-bounded
    # combine runs on the driver — same bound as the broadcast below)
    def df_partial(batch: pa.Table) -> pa.Table:
        _, sh, _ = _batch_shingles(batch, k)
        u, c = np.unique(sh, return_counts=True)
        return pa.table(
            {"sh": pa.array(u, type=pa.uint64()), "n": pa.array(c, type=pa.int64())}
        )

    df_parts = _collect(
        _read_docs(sf_dir).map_batches(
            df_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    df_t = pa.concat_tables([_as_table(x) for x in df_parts])
    all_sh = np.asarray(df_t["sh"], dtype=np.uint64)
    all_n = np.asarray(df_t["n"], dtype=np.int64)
    sh_vals, inv = np.unique(all_sh, return_inverse=True)
    sh_n = np.zeros(len(sh_vals), dtype=np.int64)
    np.add.at(sh_n, inv, all_n)
    rank_by_value = np.empty(len(sh_vals), dtype=np.int64)
    rank_by_value[np.lexsort((sh_vals, sh_n))] = np.arange(len(sh_vals))
    rank_ref = ray.put((sh_vals, rank_by_value))

    def prefix_explode(batch: pa.Table) -> pa.Table:
        vals, ranks = ray.get(rank_ref)
        d, sh, starts = _batch_shingles(batch, k)
        if len(sh) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.uint64()),
                    "sh": pa.array([], type=pa.uint64()),
                    "len": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        rows = np.zeros(len(sh), dtype=np.int64)
        rows[starts[1:]] = 1
        rows = np.cumsum(rows)
        r = ranks[np.searchsorted(vals, sh)]
        order = np.lexsort((r, rows))
        rows_s = rows[order]
        run_start = np.maximum.accumulate(
            np.where(np.concatenate(([True], rows_s[1:] != rows_s[:-1])),
                     np.arange(len(rows_s)), 0)
        )
        pos = np.arange(len(rows_s)) - run_start
        lens = np.diff(np.concatenate((starts, [len(sh)])))
        keep_len = lens - np.ceil(tau * lens).astype(np.int64) + 1
        keep = pos < keep_len[rows_s]
        sel = order[keep]
        return pa.table(
            {
                "doc_id": pa.array(d[sel], type=pa.uint64()),
                "sh": pa.array(sh[sel], type=pa.uint64()),
                "len": pa.array(lens[rows_s[keep]], type=pa.int64()),
                "pos": pa.array(pos[keep], type=pa.int64()),
            }
        )

    prefixes = _read_docs(sf_dir).map_batches(
        prefix_explode, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = prefixes.groupby("sh").map_groups(
        _prefix_pairs_fn(max_group, tau), batch_format="pyarrow"
    )
    cand = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n")).drop_columns(["n"])
    return _verify_pairs_exact(sf_dir, cand, k, tau)


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
    max_group: int = 20000,
) -> pa.Table:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Probabilistic recall (P[detect] = 1-(1-s^r)^bands for similarity s;
    band buckets larger than ``max_group`` docs are dropped — a further
    documented recall bound on boilerplate-heavy corpora); precision is
    exact because every candidate is verified distributedly
    (``_verify_pairs_exact`` — no driver-side corpus materialization).

    Signatures are vectorized batch-wide: ONE (num_perm × n_shingles)
    permutation evaluation + ``np.minimum.reduceat`` over per-doc segments;
    band buckets come from a polynomial fold over each band's rows.
    """
    from ray.data.aggregate import Count

    a_p, b_p = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def sign(batch: pa.Table) -> pa.Table:
        doc_ids, sh, starts = _batch_shingles(batch, k)
        if len(sh) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.uint64()),
                    "band": pa.array([], type=pa.uint16()),
                    "bucket": pa.array([], type=pa.uint64()),
                }
            )
        x = sh & np.uint64(0xFFFFFFFF)
        vals = (a_p[:, None] * x[None, :] + b_p[:, None]) % np.uint64(_MERSENNE)
        sig = np.minimum.reduceat(vals, starts, axis=1)  # (num_perm, n_docs)
        n_docs = sig.shape[1]
        # band buckets: polynomial fold of the band's rows (uint64 wraparound)
        bucket = np.zeros((bands, n_docs), dtype=np.uint64)
        for band in range(bands):
            acc = np.zeros(n_docs, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = acc * _MIX + sig[band * rows_per_band + r]
            bucket[band] = acc
        present_docs = doc_ids[starts]
        return pa.table(
            {
                "doc_id": pa.array(np.tile(present_docs, bands), type=pa.uint64()),
                "band": pa.array(
                    np.repeat(np.arange(bands, dtype=np.uint16), n_docs), type=pa.uint16()
                ),
                "bucket": pa.array(bucket.reshape(-1), type=pa.uint64()),
            }
        )

    buckets = _read_docs(sf_dir).map_batches(
        sign, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )
    pairs = buckets.groupby(["band", "bucket"]).map_groups(
        _make_pairs_fn(max_group, "drop"), batch_format="pyarrow"
    )
    cand = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n")).drop_columns(["n"])
    return _verify_pairs_exact(sf_dir, cand, k, tau)


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints_ds(sf_dir: str):
    def sim(batch: pa.Table) -> pa.Table:
        terms, doc_idx, _ = tokenize_flat(batch["text"].combine_chunks())
        doc_ids = np.asarray(batch["doc_id"])
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        if len(terms):
            tok_h = _tok_hashes(terms)
            order = np.argsort(doc_idx, kind="stable")
            rows = doc_idx[order]
            th = tok_h[order]
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            ) * 2 - 1  # ±1 per bit
            starts = np.flatnonzero(np.concatenate(([True], rows[1:] != rows[:-1])))
            sums = np.add.reduceat(bits, starts, axis=0)  # (n_present_docs, 64)
            fp = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(axis=1)
            out[rows[starts]] = fp
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.astype(np.int64), type=pa.int64()),
                "simhash": pa.array(out.astype(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(sim, batch_format="pyarrow", zero_copy_batch=True)


def simhash_fingerprints(sf_dir: str) -> pa.Table:
    """64-bit tf-weighted SimHash per doc → (doc_id, simhash).

    Vectorized per batch: token hashes → ±1 bit matrix → one
    ``np.add.reduceat`` over per-doc segments (no per-row boolean-mask
    scans); docs with no tokens get fingerprint 0.  Scale path:
    ``simhash_to_parquet`` (the O(n_docs) output streams to parquet).
    """
    t = pa.concat_tables([_as_table(x) for x in _collect(simhash_fingerprints_ds(sf_dir))])
    return t.sort_by("doc_id")


def simhash_to_parquet(sf_dir: str, out_dir: str) -> str:
    from .textstats import write_dataset

    return write_dataset(simhash_fingerprints_ds(sf_dir), out_dir)


def _tok_hashes(terms: pa.Array) -> np.ndarray:
    """blake2b-8 hash per token via vocabulary encoding (identical values to
    the r1 per-vocab loop — outputs stay byte-stable)."""
    dic = pc.dictionary_encode(terms)
    codes = np.asarray(dic.indices)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in dic.dictionary.to_pylist()
        ),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    return h[codes]


# ---------------------------------------------------------------------------
# small collection helpers (results are driver-small by construction)


def _collect(ds) -> list[pa.Table]:
    import ray

    return [ray.get(r) for r in ds.to_arrow_refs()]


def _as_table(t) -> pa.Table:
    return t if isinstance(t, pa.Table) else pa.Table.from_batches([t])


def decontaminate(sf_dir: str, bench_mod: int = 17, k: int = 3) -> pa.Table:
    """Benchmark decontamination (the GPT-3/Llama training-data step):
    flag every corpus doc sharing ANY word-``k``-gram with the benchmark
    set — here the docs with ``doc_id % bench_mod == 0``, standing in for
    an external eval table (the plan is identical for one).

    Shape for 100 TB: the BENCHMARK side is tiny (thousands of eval docs
    vs trillions of corpus docs), so its distinct shingle hashes build in
    one streamed pass, combine on the driver (bounded by benchmark
    shingles), and broadcast once via ``ray.put``; the corpus then streams
    through ``map_batches`` flagging docs with one vectorized ``np.isin``
    + per-doc ``reduceat`` — no shuffle, no corpus-sized state anywhere.
    Word hashes are content-based (blake2b via ``_word_hashes``), so
    cross-batch shingle equality is exact up to a ~2^-64 collision rate.
    Returns the sorted flagged doc_ids (benchmark docs excluded).
    """
    import ray

    ds = _read_docs(sf_dir)

    def bench_shingles(batch: pa.Table) -> pa.Table:
        # doc_id % bench_mod == 0 via truncating int divide (no pc.mod)
        keep = pc.equal(
            pc.subtract(
                batch["doc_id"],
                pc.multiply(pc.divide(batch["doc_id"], bench_mod), bench_mod),
            ),
            pa.scalar(0, type=batch["doc_id"].type),
        )
        b = batch.filter(keep)
        _, s, _ = _batch_shingles(b, k)
        return pa.table({"sh": pa.array(np.unique(s), type=pa.uint64())})

    parts = [ray.get(r) for r in ds.map_batches(
        bench_shingles, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    bench = np.unique(
        np.concatenate(
            [np.asarray(p["sh"].combine_chunks(), dtype=np.uint64) for p in parts if p.num_rows]
            or [np.empty(0, dtype=np.uint64)]
        )
    )
    bench_ref = ray.put(bench)

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        d, s, starts = _batch_shingles(batch, k)
        if len(d) == 0 or len(bset) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        hit = np.isin(s, bset)
        any_hit = np.maximum.reduceat(hit.astype(np.uint8), starts).astype(bool)
        docs = d[starts][any_hit]
        docs = docs[docs % np.uint64(bench_mod) != 0]  # benchmark rows excluded
        return pa.table({"doc_id": pa.array(docs.astype(np.int64), type=pa.int64())})

    parts = [ray.get(r) for r in ds.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    out = pa.concat_tables([p for p in parts if p.num_rows])
    return out.sort_by("doc_id")


def dup_clusters(sf_dir: str, k: int = 3, tau: float = 0.8) -> pa.Table:
    """Near-duplicate CLUSTERS: connected components over the exact-Jaccard
    dup-pair graph → (doc_id, cluster_id) for every doc in ≥ 1 pair, where
    cluster_id is the component's smallest doc_id (the canonical
    representative a keep-one-per-cluster dedup retains).

    The pair discovery is the fully-distributed `shingle_jaccard_pairs`
    pipeline; the component labeling is driver-side union-find with
    path compression, bounded by the PAIR count (the same bound as the
    operator's own output — pairs ≪ corpus by construction).  A corpus
    whose dup graph itself exceeds driver memory needs the iterative
    hash-min label-propagation variant (each round one edge-label join +
    groupby-min); the pair bound makes that unnecessary here."""
    pairs = shingle_jaccard_pairs(sf_dir, k=k, tau=tau)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # attach the larger root under the smaller: roots stay minimal
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted({int(x) for col in ("a", "b") for x in pairs[col].to_pylist()})
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array([find(n) for n in nodes], type=pa.int64()),
        }
    )


def _batch_grams_positional(batch: pa.Table, k: int) -> pa.Table:
    """EVERY word-k-gram occurrence with its in-doc token position —
    (doc_id, pos, g) where g is the literal space-joined gram (exact
    keys; the hash+verify variant is the 100-TB path, see
    ``duplicate_spans``).  Gram strings are built with ONE vectorized
    ``binary_join_element_wise`` over k shifted slices of the flattened
    token array — the only loop is over the k offsets."""
    text = batch["text"].combine_chunks()
    words = pc.split_pattern(text, " ")
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    flat = pc.list_flatten(words)
    n = len(flat)
    if n < k:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.uint64()),
                "pos": pa.array([], type=pa.int64()),
                "g": pa.array([], type=pa.string()),
            }
        )
    doc_ids_col = np.asarray(batch["doc_id"]).astype(np.uint64)
    row_idx = np.repeat(np.arange(batch.num_rows), lens)
    row_first = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(n) - np.repeat(row_first, lens)
    m = n - k + 1
    parts = [flat.slice(j, m) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    valid = row_idx[:m] == row_idx[k - 1 :]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids_col[row_idx[:m][valid]], type=pa.uint64()),
            "pos": pa.array(pos_in_doc[:m][valid], type=pa.int64()),
            "g": grams.filter(pa.array(valid)),
        }
    )


def duplicate_spans_ds(sf_dir: str, k: int = 5, n_buckets: int = 64):
    """Exact substring-duplication spans, the token-level dedup of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): every MAXIMAL token span whose every length-k window
    occurs ≥ 2 times in the corpus (any doc, any position — within-doc
    repeats count).  Returns (doc_id, start_tok, end_tok, n_tokens),
    end exclusive, n_tokens = end - start ≥ k.

    Plan: positional k-gram explode (vectorized) → gram-BUCKET-keyed
    shuffle (coarse hash buckets; in-bucket exact gram runs of size ≥ 2
    fan their (doc, pos) occurrences back out, one lexsort per bucket —
    never one Python call per distinct gram) → doc-bucket shuffle →
    vectorized gaps-and-islands merge of consecutive duplicated window
    starts.  Grams stay literal strings so the result is exact against
    the SQL oracle; at 100 TB the gram becomes (hash, verify-inside-
    bucket) exactly like ``shingle_jaccard_pairs`` — the shuffle then
    moves 8-byte keys."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    grams = ds.map_batches(
        lambda b: _batch_grams_positional(b, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # Both shuffles key on COARSE hash buckets, not raw grams/docs: a
    # per-distinct-gram (or per-doc) map_groups pays one Python call per
    # group, which dominates once distinct grams reach millions.  Inside a
    # bucket the whole reduction is one lexsort + run pass; bucket-hash
    # quality only affects load balance, never correctness (equality is
    # decided on exact values in-bucket).  ``n_buckets`` should scale
    # with the cluster (tasks per shuffle side); 64 covers a single node.

    def add_gb(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("gb", pa.array([], type=pa.int64()))
        g = batch["g"].combine_chunks()
        offs = np.frombuffer(g.buffers()[1], dtype=np.int32)[
            g.offset: g.offset + len(g) + 1
        ].astype(np.int64)
        data = np.frombuffer(g.buffers()[2], dtype=np.uint8).astype(np.int64)
        sums = np.add.reduceat(data[offs[0]: offs[-1]], offs[:-1] - offs[0])
        lens = np.diff(offs)
        gb = (sums * 31 + lens * 131) % n_buckets
        return batch.append_column("gb", pa.array(gb, type=pa.int64()))

    def dup_occurrences_bucket(group: pa.Table) -> pa.Table:
        codes = (
            group["g"].combine_chunks().dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        newg = np.ones(len(cs), dtype=bool)
        newg[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(newg)
        runlen = np.diff(np.r_[starts, len(cs)])
        sel = order[np.repeat(runlen >= 2, runlen)]
        doc = np.asarray(group["doc_id"]).astype(np.uint64)[sel]
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.uint64()),
                "pos": pa.array(
                    np.asarray(group["pos"], dtype=np.int64)[sel],
                    type=pa.int64(),
                ),
                "db": pa.array(
                    (doc % np.uint64(n_buckets)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    marked = grams.map_batches(
        add_gb, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("gb").map_groups(dup_occurrences_bucket, batch_format="pyarrow")

    def islands_bucket(group: pa.Table) -> pa.Table:
        doc = np.asarray(group["doc_id"]).astype(np.int64)
        pos = np.asarray(group["pos"], dtype=np.int64)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        brk = np.ones(len(doc), dtype=bool)
        brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] > 1)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(doc)] - 1
        s = pos[starts]
        e = pos[ends] + k
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], type=pa.int64()),
                "start_tok": pa.array(s, type=pa.int64()),
                "end_tok": pa.array(e, type=pa.int64()),
                "n_tokens": pa.array(e - s, type=pa.int64()),
            }
        )

    return marked.groupby("db").map_groups(islands_bucket, batch_format="pyarrow")


def duplicate_spans(sf_dir: str, k: int = 5) -> pa.Table:
    """Driver-gate variant of ``duplicate_spans_ds``: the collected,
    (doc, start)-sorted span table."""
    import ray

    spans = duplicate_spans_ds(sf_dir, k)
    parts = [ray.get(r) for r in spans.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "end_tok": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending"), ("start_tok", "ascending")]
    )


def dedup_keep_best(sf_dir: str, k: int = 3, tau: float = 0.8) -> pa.Table:
    """Quality-aware near-dup resolution: within each exact-Jaccard dup
    cluster (``dup_clusters``), KEEP the doc with the most characters
    (tie → smallest doc_id) — the "keep best, drop rest" policy real
    training-data pipelines apply after clustering (vs. keep-first).
    Returns (doc_id, cluster_id, kept) for every clustered doc.

    The n_chars gather is a two-column projection read joined against
    the cluster table (bounded by clustered docs, ≪ corpus)."""
    import pyarrow.parquet as pq

    clusters = dup_clusters(sf_dir, k=k, tau=tau)
    if clusters.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
                "kept": pa.array([], type=pa.bool_()),
            }
        )
    meta = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).sort_by("doc_id")
    ids = np.asarray(meta["doc_id"], dtype=np.int64)
    nch = np.asarray(meta["n_chars"], dtype=np.int64)
    d = np.asarray(clusters["doc_id"], dtype=np.int64)
    c = np.asarray(clusters["cluster_id"], dtype=np.int64)
    chars = nch[np.searchsorted(ids, d)]
    # per cluster: argmax n_chars, tie -> min doc_id (lexsort keys reversed)
    order = np.lexsort((d, -chars, c))
    first = np.flatnonzero(
        np.concatenate(([True], c[order][1:] != c[order][:-1]))
    )
    best = set(d[order][first].tolist())
    return pa.table(
        {
            "doc_id": pa.array(d, type=pa.int64()),
            "cluster_id": pa.array(c, type=pa.int64()),
            "kept": pa.array([int(x) in best for x in d.tolist()], type=pa.bool_()),
        }
    ).sort_by("doc_id")


def duplicate_spans_to_parquet(sf_dir: str, out_dir: str, k: int = 5) -> str:
    """Scale sink: stream duplicated spans to partitioned parquet."""
    from .textstats import write_dataset

    return write_dataset(duplicate_spans_ds(sf_dir, k), out_dir)
