"""BPE tokenizer TRAINING over the indexed corpus (training-data op).

Sennrich et al. 2016's byte-pair encoding learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair.  The classic
implementation trick (subword-nmt) is that training never touches the
corpus directly: it runs over the WORD-FREQUENCY table, because a pair's
corpus frequency is Σ (occurrences in word w) × count(w).

The graft exploits the same structure one level deeper: the term
dictionary's ``cf`` column (collection frequency, aggregated over salt
slices) IS the word-frequency table — so BPE training needs ZERO extra
corpus passes; the expensive distributed reduction already happened at
index build.

Two execution modes over the word table, verified identical in tests:

- driver mode (default): the vocabulary-sized table iterates in-process —
  subword-nmt's own shape, right whenever the vocab fits the coordinator.
- distributed mode: each iteration is one ``map_batches`` pass over a
  symbol-sequence Dataset emitting per-batch PAIR-COUNT PARTIALS (bounded
  by distinct adjacent pairs, not words), a driver combine picks the
  winning pair (freq DESC, pair ASC — fully deterministic), and the merge
  broadcast applies in the next pass.  This is the 10^12-file path, where
  a code corpus's identifier vocabulary outgrows one machine.

Determinism: ties break on (freq DESC, left ASC, right ASC), so the merge
sequence is a pure function of the word-count table at any parallelism.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

EOW = "</w>"  # end-of-word marker, merged like any other symbol


def word_freq_from_dict(index_dir: str) -> list[tuple[str, int]]:
    """(term, corpus count) off the term dictionary — cf summed over salt
    slices; sorted by term so downstream iteration order is fixed."""
    td = pq.read_table(
        os.path.join(index_dir, "term_dict.parquet"), columns=["term", "cf"]
    )
    agg = td.group_by("term").aggregate([("cf", "sum")])
    pairs = sorted(zip(agg["term"].to_pylist(), agg["cf_sum"].to_pylist()))
    return [(t, int(c)) for t, c in pairs]


def _pair_counts(words: list[tuple[list[str], int]]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, c in words:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + c
    return counts


def _apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    word_freq: list[tuple[str, int]], n_merges: int, distributed: bool = False
) -> pa.Table:
    """Learn ``n_merges`` BPE merges → (rank, left, right, freq).

    ``distributed=True`` runs each iteration's pair count as a Ray Data
    ``map_batches`` over the word table (per-batch partials → driver
    combine bounded by distinct pairs) and applies the winning merge in
    the same stream — identical output to driver mode by construction
    (the combine is a sum; the argmax tie-break is total).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if distributed:
        return _bpe_train_ray(word_freq, n_merges)
    words = [(list(w) + [EOW], c) for w, c in word_freq]
    ranks, lefts, rights, freqs = [], [], [], []
    for r in range(1, n_merges + 1):
        counts = _pair_counts(words)
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        words = [(_apply_merge(s, left, right), c) for s, c in words]
        ranks.append(r)
        lefts.append(left)
        rights.append(right)
        freqs.append(freq)
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "left": pa.array(lefts, type=pa.string()),
            "right": pa.array(rights, type=pa.string()),
            "freq": pa.array(freqs, type=pa.int64()),
        }
    )


def _bpe_train_ray(word_freq: list[tuple[str, int]], n_merges: int) -> pa.Table:
    import ray
    import ray.data as rd

    from ..functions.blocks import from_arrow_blocks

    base = pa.table(
        {
            "syms": pa.array([list(w) + [EOW] for w, _ in word_freq],
                             type=pa.list_(pa.string())),
            "c": pa.array([c for _, c in word_freq], type=pa.int64()),
        }
    )
    ds = from_arrow_blocks(base, 8)

    def count_partial(batch: pa.Table) -> pa.Table:
        counts = _pair_counts(
            list(zip(batch["syms"].to_pylist(), batch["c"].to_pylist()))
        )
        return pa.table(
            {
                "left": pa.array([k[0] for k in counts], type=pa.string()),
                "right": pa.array([k[1] for k in counts], type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    ranks, lefts, rights, freqs = [], [], [], []
    for r in range(1, n_merges + 1):
        parts = [
            ray.get(ref)
            for ref in ds.map_batches(
                count_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            break
        t = pa.concat_tables(parts)
        agg = t.group_by(["left", "right"]).aggregate([("n", "sum")])
        rows = sorted(
            zip(agg["left"].to_pylist(), agg["right"].to_pylist(),
                agg["n_sum"].to_pylist()),
            key=lambda kv: (-kv[2], kv[0], kv[1]),
        )
        left, right, freq = rows[0]

        def apply(batch: pa.Table, left=left, right=right) -> pa.Table:
            return pa.table(
                {
                    "syms": pa.array(
                        [_apply_merge(s, left, right) for s in batch["syms"].to_pylist()],
                        type=pa.list_(pa.string()),
                    ),
                    "c": batch["c"],
                }
            )

        ds = ds.map_batches(apply, batch_format="pyarrow").materialize()
        ranks.append(r)
        lefts.append(left)
        rights.append(right)
        freqs.append(int(freq))
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "left": pa.array(lefts, type=pa.string()),
            "right": pa.array(rights, type=pa.string()),
            "freq": pa.array(freqs, type=pa.int64()),
        }
    )


def bpe_encode(word: str, merges: pa.Table) -> list[str]:
    """Segment one word with the learned merges, applied in rank order —
    the standard BPE inference (merge priority = training order)."""
    syms = list(word) + [EOW]
    for left, right in zip(merges["left"].to_pylist(), merges["right"].to_pylist()):
        if len(syms) == 1:
            break
        syms = _apply_merge(syms, left, right)
    return syms


def bpe_vocab_stats(
    word_freq: list[tuple[str, int]], merges: pa.Table
) -> pa.Table:
    """Tokenizer fertility after training: corpus-weighted tokens/word and
    the subword vocabulary size — the quality numbers a tokenizer-training
    pipeline reports per candidate vocab size."""
    total_words = 0
    total_tokens = 0
    vocab: set[str] = set()
    for w, c in word_freq:
        syms = bpe_encode(w, merges)
        total_words += c
        total_tokens += len(syms) * c
        vocab.update(syms)
    return pa.table(
        {
            "n_words": pa.array([total_words], type=pa.int64()),
            "tokens_per_word": pa.array(
                [total_tokens / total_words if total_words else 0.0],
                type=pa.float64(),
            ),
            "subword_vocab": pa.array([len(vocab)], type=pa.int64()),
        }
    )


def merge_ranks(merges: pa.Table) -> dict[tuple[str, str], int]:
    """(left, right) → rank lookup for the priority encoder."""
    return {
        (l, r): int(k)
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }


def bpe_encode_ranked(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Priority BPE encode: repeatedly merge the LOWEST-ranked pair present
    until none applies — O(pairs present) per step instead of
    ``bpe_encode``'s O(n_merges) full-table sweep, the corpus-scale shape
    (HuggingFace tokenizers' approach).

    Provably identical to rank-order application: a learned pair's two
    symbols are each created strictly BEFORE its rank (training can only
    count a pair once both symbols exist), and a merge at rank r only
    creates adjacencies involving its own new symbol (whose pairs all rank
    > r) — so the lowest-rank-first schedule can never resurrect an
    earlier merge after a later one.  Asserted against ``bpe_encode`` in
    tests over every fixture word."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _apply_merge(syms, best_pair[0], best_pair[1])
    return syms


class BpeEncoder:
    """Actor-pool corpus tokenizer: trained merges load ONCE per actor in
    ``__init__`` (the stateful-stage contract), and the per-actor
    distinct-word memo makes cost track DISTINCT words per batch, not
    token occurrences — the standard tokenizer-application trade.

    ``__call__``: (doc_id, text) → (doc_id, n_words, n_subwords).  The
    word stream is Arrow-split and dictionary-encoded per batch, so the
    Python encode loop runs once per distinct word; per-doc totals are one
    ``np.bincount`` over the flattened doc index."""

    def __init__(self, merges_ref):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) else merges_ref
        self.ranks = merge_ranks(merges)
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        words = pc.split_pattern(batch["text"], pattern=" ")
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        distinct = enc.dictionary.to_pylist()
        n_sub = np.empty(len(distinct), dtype=np.int64)
        for j, w in enumerate(distinct):
            n = self.memo.get(w)
            if n is None:
                n = len(bpe_encode_ranked(w, self.ranks))
                self.memo[w] = n
            n_sub[j] = n
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        subs = np.bincount(doc_of, weights=n_sub[codes], minlength=len(batch))
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_words": pa.array(lengths, type=pa.int64()),
                "n_subwords": pa.array(subs.astype(np.int64), type=pa.int64()),
            }
        )


def bpe_tokenize_corpus(
    sf_dir: str, merges: pa.Table, concurrency: int = 4
) -> pa.Table:
    """Corpus-wide BPE tokenization with the TRAINED merges — the stage
    between ``bpe_train`` and sequence packing in a training-data
    pipeline.  Per doc: word count and subword count after encoding.

    Merges broadcast once via ``ray.put``; the encode streams as an actor
    pool (state = rank table + distinct-word memo, loaded per actor, never
    per batch).  Output is doc-keyed with no shuffle at any scale; the
    driver only collects the per-doc counts table here — use
    ``bpe_tokenize_to_parquet`` to keep 10^12-file output off the
    driver."""
    import ray
    import ray.data as rd

    from ..functions.blocks import collect_tables

    merges_ref = ray.put(merges)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        BpeEncoder,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    parts = collect_tables(ds, on_empty="bpe_tokenize_corpus: empty corpus")
    return pa.concat_tables(parts).sort_by("doc_id")


def bpe_tokenize_to_parquet(
    sf_dir: str, merges: pa.Table, out_dir: str, concurrency: int = 4
) -> str:
    """Sink twin of ``bpe_tokenize_corpus``: streams per-doc counts to a
    partitioned parquet directory (resumable output contract)."""
    import ray
    import ray.data as rd

    merges_ref = ray.put(merges)
    (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(
            BpeEncoder,
            fn_constructor_args=(merges_ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        .write_parquet(out_dir)
    )
    return out_dir
