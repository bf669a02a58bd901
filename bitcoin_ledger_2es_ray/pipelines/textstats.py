"""Text-analysis operators for training-data pipelines.

- ``quality_scores``   length / punctuation / stopword heuristics (vectorized
                       Arrow kernels; SQL-oracle checkable)
- ``token_count_bpe``  BPE-ish pre-tokenizer count via a compiled regex
                       (letters runs | digit runs | single non-space symbol)
- ``lang_id``          stopword-profile n-gram-free language heuristic
                       (deterministic; no external models)
- ``doc_fingerprints`` Karp-Rabin rolling-hash document fingerprint set

All run as ``map_batches`` over Arrow batches of the ``documents`` table.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round

STOPWORDS_EN = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "at", "by", "an", "be", "or", "this", "are", "from",
}

# tiny public stopword profiles for the langid heuristic
_LANG_PROFILES: dict[str, set[str]] = {
    "en": STOPWORDS_EN,
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "pour"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "en", "es", "que", "por", "del"},
    "de": {"der", "die", "das", "und", "ein", "eine", "von", "zu", "mit", "ist", "den", "für"},
    "zh": set(),  # handled by the CJK-character ratio below
}

_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"  # RE2 kernel below matches re.findall counts
_CJK_RE = re.compile(r"[一-鿿]")
_STOPWORDS_ARR = pa.array(sorted(STOPWORDS_EN), type=pa.string())


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _collect_sorted(ds, key="doc_id") -> pa.Table:
    """Driver-table collector for the ORACLE-GATE wrappers only: the driver
    contract compares small tables at sf0.01.  The scale path for every
    per-doc operator is its ``*_to_parquet`` sink (``write_dataset``)."""
    import ray

    t = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
    keys = [key] if isinstance(key, str) else list(key)
    return t.sort_by([(k, "ascending") for k in keys])


def write_dataset(ds, out_dir: str) -> str:
    """Shared parquet sink (VERDICT r2 §missing-2): stream an O(n_docs)
    operator output to a partitioned parquet directory — never through the
    driver.  Overwrite mode: Ray's default APPEND stacks re-runs."""
    ds.write_parquet(out_dir, mode="overwrite")
    return out_dir


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-batch quality features — the reusable kernel behind
    ``quality_scores`` and ``pipelines/curate.py``.  Extra input columns
    beyond (doc_id, text) pass through untouched."""
    text = batch["text"].combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat, row_idx = pc.list_flatten(words), np.repeat(
        np.arange(batch.num_rows), np.nan_to_num(
            pc.list_value_length(words).to_numpy(zero_copy_only=False), nan=0
        ).astype(np.int64),
    )
    is_stop = pc.is_in(flat, value_set=_STOPWORDS_ARR).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    stop_cnt = np.bincount(row_idx, weights=is_stop, minlength=batch.num_rows)
    stop_ratio = sql_round(stop_cnt / np.maximum(n_tokens, 1), 6)
    mean_tok = sql_round(
        (n_chars - (n_tokens - 1)) / np.maximum(n_tokens, 1), 6
    )  # chars minus separators over tokens
    quality = sql_round(
        0.5 * np.minimum(n_tokens, 100) / 100.0
        + 0.3 * (1.0 - np.minimum(mean_tok, 10.0) / 10.0)
        + 0.2 * stop_ratio,
        6,
    )
    cols = {
        "doc_id": batch["doc_id"].cast(pa.int64()),
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tokens),
        "stop_ratio": pa.array(stop_ratio),
        "mean_tok_len": pa.array(mean_tok),
        "quality": pa.array(quality),
    }
    for name in batch.column_names:
        if name not in ("doc_id", "text") and name not in cols:
            cols[name] = batch[name]
    return pa.table(cols)


def quality_scores_ds(sf_dir: str):
    """Quality features as a streaming Dataset (the scale shape)."""
    return _read_docs(sf_dir).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_scores(sf_dir: str) -> pa.Table:
    """(doc_id, n_chars, n_tokens, stop_ratio, mean_tok_len, quality).

    quality = round(1/(1+exp(-(0.2·stop_ratio + 0.05·min(n_tokens,200)/200
    ... )) simplified to a fixed affine blend — the exact formula is mirrored
    in the SQL oracle, so any drift fails the gate.
    """
    return _collect_sorted(quality_scores_ds(sf_dir))


def quality_scores_to_parquet(sf_dir: str, out_dir: str) -> str:
    return write_dataset(quality_scores_ds(sf_dir), out_dir)


def token_count_bpe_ds(sf_dir: str):
    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            batch["text"].combine_chunks(), _BPE_PATTERN
        ).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()), "n_bpe": n})

    return _read_docs(sf_dir).map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def token_count_bpe(sf_dir: str) -> pa.Table:
    """(doc_id, n_bpe) — BPE-ish pre-token count via the vectorized Arrow
    RE2 kernel (no per-row Python findall)."""
    return _collect_sorted(token_count_bpe_ds(sf_dir))


def token_count_bpe_to_parquet(sf_dir: str, out_dir: str) -> str:
    return write_dataset(token_count_bpe_ds(sf_dir), out_dir)


class LangId:
    """Stateful language-ID stage (actor pool): profiles built in __init__.

    Heuristic: CJK char ratio > 0.2 → zh; otherwise the profile with the
    highest stopword hit-rate; ties → first profile in sorted order; no
    hits → 'und'.

    ``__call__`` is fully vectorized: one flattened token stream per
    batch, one ``pc.is_in`` per profile + ``np.bincount`` segment sums —
    no per-row Python on the hot path.  ``classify`` keeps the per-row
    reference implementation (the goldens pin batch == classify).
    """

    def __init__(self):
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}
        self.langs = sorted(self.profiles)
        self.profile_arrs = [
            pa.array(sorted(self.profiles[lang]), type=pa.string())
            for lang in self.langs
        ]

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        if len(_CJK_RE.findall(text)) / max(len(text), 1) > 0.2:
            return "zh"
        words = text.lower().split()
        if not words:
            return "und"
        best, best_rate = "und", 0.0
        for lang in sorted(self.profiles):  # sorted → deterministic ties
            rate = sum(w in self.profiles[lang] for w in words) / len(words)
            if rate > best_rate:
                best, best_rate = lang, rate
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        chars = np.nan_to_num(
            pc.utf8_length(texts).to_numpy(zero_copy_only=False), nan=0
        ).astype(np.int64)
        cjk = np.nan_to_num(
            pc.count_substring_regex(texts, "[一-鿿]").to_numpy(
                zero_copy_only=False
            ),
            nan=0,
        ).astype(np.int64)
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        lens = np.nan_to_num(
            pc.list_value_length(words).to_numpy(zero_copy_only=False), nan=0
        ).astype(np.int64)
        flat = words.flatten()
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        # regex split keeps edge empties that str.split drops
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        nonempty = np.nan_to_num(nonempty, nan=False).astype(bool)
        # hit counts stand in for rates (same per-doc denominator), so the
        # argmax comparison is integer-exact; argmax's first-occurrence
        # rule IS the sorted-order tie-break of the reference loop
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for i, arr in enumerate(self.profile_arrs):
            m = pc.is_in(flat, value_set=arr).to_numpy(zero_copy_only=False)
            m = np.nan_to_num(m, nan=False).astype(bool) & nonempty
            hits[i] = np.bincount(doc_of[m], minlength=n)
        if len(self.langs):
            best = hits.argmax(axis=0)
            besth = hits[best, np.arange(n)]
            preds = np.where(
                besth > 0, np.asarray(self.langs, dtype=object)[best], "und"
            )
        else:  # pragma: no cover - empty profile registry
            preds = np.full(n, "und", dtype=object)
        # cjk/chars > 0.2 as exact integer arithmetic (5·cjk > chars)
        preds = np.where((chars > 0) & (5 * cjk > chars), "zh", preds)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "lang_pred": pa.array(preds, type=pa.string()),
            }
        )


def lang_id_ds(sf_dir: str, concurrency: int = 2):
    return _read_docs(sf_dir).map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def lang_id(sf_dir: str) -> pa.Table:
    return _collect_sorted(lang_id_ds(sf_dir))


def lang_id_to_parquet(sf_dir: str, out_dir: str, concurrency: int = 2) -> str:
    return write_dataset(lang_id_ds(sf_dir, concurrency), out_dir)


# PII-shaped default patterns (email, IPv4, long digit runs) — RE2-compatible
# on BOTH sides of the gate (Arrow's replace/count kernels and DuckDB are RE2)
PII_PATTERNS: tuple[str, ...] = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    r"\b\d{6,}\b",
)


def redact_pii_ds(
    sf_dir: str,
    patterns: tuple[str, ...] = PII_PATTERNS,
    replacement: str = "<PII>",
):
    """PII scrubbing as a streaming Dataset: each pattern applies IN ORDER
    (a redaction pipeline — pattern k sees the output of pattern k-1, and
    its match count is measured on that intermediate), all via the
    vectorized Arrow RE2 kernels; the per-doc output row carries the match
    count, the redacted length, and sha256(redacted) so the full redacted
    text never needs to ship for verification."""
    from ..functions.hashing import sha256_column

    def redact(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        n = np.zeros(batch.num_rows, dtype=np.int64)
        for pat in patterns:
            n += np.asarray(
                pc.count_substring_regex(text, pat), dtype=np.int64
            )
            text = pc.replace_substring_regex(text, pat, replacement)
        sha_hex = pa.array(
            [v.hex() for v in sha256_column(text).to_pylist()], type=pa.string()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_redacted": pa.array(n),
                "red_len": pc.utf8_length(text).cast(pa.int64()),
                "red_sha": sha_hex,
            }
        )

    return _read_docs(sf_dir).map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii(
    sf_dir: str,
    patterns: tuple[str, ...] = PII_PATTERNS,
    replacement: str = "<PII>",
) -> pa.Table:
    """(doc_id, n_redacted, red_len, red_sha) — see ``redact_pii_ds``."""
    return _collect_sorted(redact_pii_ds(sf_dir, patterns, replacement))


def redact_pii_to_parquet(
    sf_dir: str,
    out_dir: str,
    patterns: tuple[str, ...] = PII_PATTERNS,
    replacement: str = "<PII>",
) -> str:
    return write_dataset(redact_pii_ds(sf_dir, patterns, replacement), out_dir)


def repetition_stats_ds(sf_dir: str):
    """Gopher-style repetition quality signals, vectorized: per doc the
    token count, distinct-token count, duplicate-token fraction
    (1 − distinct/total) and top-token fraction (most frequent token's
    share).  Gopher's repetition filters use the same shape over lines and
    n-grams; this corpus is single-line bag-of-words, so tokens are the
    meaningful unit.  One flatten + two Arrow group_bys per batch — no
    per-row Python."""

    def stats(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"].combine_chunks(), " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        row_idx = np.repeat(np.arange(batch.num_rows), lens)
        flat = pc.list_flatten(words)
        t = pa.table({"row": pa.array(row_idx, type=pa.int64()), "w": flat})
        per_word = t.group_by(["row", "w"]).aggregate([("w", "count")])
        g = per_word.group_by("row").aggregate(
            [("w_count", "count"), ("w_count", "max")]
        )
        rows = np.asarray(g["row"].combine_chunks(), dtype=np.int64)
        n_distinct = np.zeros(batch.num_rows, dtype=np.int64)
        top = np.zeros(batch.num_rows, dtype=np.int64)
        n_distinct[rows] = np.asarray(g["w_count_count"], dtype=np.int64)
        top[rows] = np.asarray(g["w_count_max"], dtype=np.int64)
        denom = np.maximum(lens, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(lens),
                "n_distinct": pa.array(n_distinct),
                "dup_frac": pa.array(sql_round(1.0 - n_distinct / denom, 6)),
                "top_frac": pa.array(sql_round(top / denom, 6)),
            }
        )

    return _read_docs(sf_dir).map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(sf_dir: str) -> pa.Table:
    return _collect_sorted(repetition_stats_ds(sf_dir))


def repetition_stats_to_parquet(sf_dir: str, out_dir: str) -> str:
    return write_dataset(repetition_stats_ds(sf_dir), out_dir)


def unigram_logprob(index_dir: str, round_decimals: int = 6) -> pa.Table:
    """CCNet-style language-model quality score where the inverted INDEX
    is the LM: per doc, the average token log-probability under the
    corpus unigram model

        logprob(d) = Σ_t tf_t · ln(cf_t / C) / dl,   C = Σ dl

    (CCNet filters training data by LM perplexity; the unigram model's
    sufficient statistics — cf per term, total token count — are exactly
    what the term dictionary already stores, so no extra corpus pass
    exists anywhere in this operator.)

    Plan: broadcast the (term, lp) table once (vocabulary-sized — the
    same small side every agg broadcasts); the POSTINGS artifact streams
    through ``map_batches`` joining lp and emitting per-doc partial
    (Σ tf·lp, Σ tf) rows; a Ray groupby over doc_id combines partials
    (Σ tf == dl, so no forward-map join is needed).  Returns
    (doc_id, logprob) sorted by doc.
    """
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    td = pq.read_table(
        os.path.join(index_dir, "term_dict.parquet"), columns=["term", "cf"]
    )
    agg = td.group_by("term").aggregate([("cf", "sum")])
    cf = np.asarray(agg["cf_sum"], dtype=np.float64)
    total = float(cf.sum())
    lp_tbl = pa.table(
        {"term": agg["term"], "lp": pa.array(np.log(cf / total))}
    )
    lp_ref = ray.put(lp_tbl)

    def partial(batch: pa.Table) -> pa.Table:
        j = batch.select(["term", "doc_id", "tf"]).join(
            ray.get(lp_ref), keys="term", join_type="inner"
        )
        tfv = np.asarray(j["tf"], dtype=np.float64)
        contrib = tfv * np.asarray(j["lp"], dtype=np.float64)
        t = pa.table(
            {
                "doc_id": j["doc_id"].cast(pa.int64()),
                "c": pa.array(contrib),
                "n": pa.array(tfv),
            }
        )
        g = t.group_by("doc_id").aggregate([("c", "sum"), ("n", "sum")])
        return g.rename_columns(["doc_id", "c", "n"])

    ds = rd.read_parquet(
        os.path.join(index_dir, "postings"), columns=["term", "doc_id", "tf"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby("doc_id").aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
    import ray as _ray

    parts = [_ray.get(r) for r in out.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    lpv = np.asarray(t["c"], dtype=np.float64) / np.asarray(t["n"], dtype=np.float64)
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "logprob": pa.array(sql_round(lpv, round_decimals)),
        }
    ).sort_by("doc_id")


def _ntile(ranks: np.ndarray, sizes: np.ndarray, k: int) -> np.ndarray:
    """SQL ``ntile(k)`` bucket for 0-based in-partition ``ranks`` with
    partition ``sizes`` (per row): the first n % k buckets get
    ceil(n/k) rows — DuckDB/ANSI semantics, vectorized."""
    base = sizes // k
    rem = sizes % k
    big = base + 1
    cut = rem * big
    return np.where(
        ranks < cut,
        ranks // np.maximum(big, 1) + 1,
        rem + (ranks - cut) // np.maximum(base, 1) + 1,
    ).astype(np.int64)


def perplexity_buckets(
    sf_dir: str, index_dir: str, n_buckets: int = 3, round_decimals: int = 6
) -> pa.Table:
    """CCNet's head/middle/tail perplexity split (Wenzek et al. 2020):
    per language, docs ranked by unigram-LM log-probability (the inverted
    index IS the LM — ``unigram_logprob``, zero extra corpus passes) and
    cut into ``n_buckets`` SQL-ntile buckets; bucket 1 = head (highest
    logprob = lowest perplexity), the slice CCNet keeps for training.

    The per-doc logprob table is doc-bounded (the same envelope
    ``unigram_logprob`` already returns); the lang attach is a pruned
    two-column scan and the bucket assignment is one lexsort + run-rank
    pass over dictionary codes.  Returns (doc_id, lang, logprob, bucket),
    doc ascending — bit-exact vs DuckDB ``ntile`` (ties: logprob DESC,
    doc_id ASC)."""
    import os

    import pyarrow.dataset as pads

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    lp = unigram_logprob(index_dir, round_decimals)
    langs = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "lang"]
    )
    j = lp.join(langs, keys="doc_id", join_type="inner")
    doc = np.asarray(j["doc_id"], dtype=np.int64)
    lpv = np.asarray(j["logprob"], dtype=np.float64)
    codes = (
        j["lang"].combine_chunks().dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
    )
    order = np.lexsort((doc, -lpv, codes))
    cs = codes[order]
    newl = np.ones(len(cs), dtype=bool)
    newl[1:] = cs[1:] != cs[:-1]
    starts = np.flatnonzero(newl)
    runlen = np.diff(np.r_[starts, len(cs)])
    ranks = np.arange(len(cs), dtype=np.int64) - np.repeat(starts, runlen)
    bucket = _ntile(ranks, np.repeat(runlen, runlen), n_buckets)
    inv = np.empty(len(order), dtype=np.int64)
    inv[order] = np.arange(len(order))
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "lang": j["lang"],
            "logprob": pa.array(lpv, type=pa.float64()),
            "bucket": pa.array(bucket[inv], type=pa.int64()),
        }
    ).sort_by("doc_id")


def perplexity_buckets_to_parquet(
    sf_dir: str, index_dir: str, out_dir: str, n_buckets: int = 3
) -> str:
    """Scale sink for the bucket table.  The ntile assignment is a global
    per-lang rank, so the table is assembled once (doc-bounded — the same
    envelope ``unigram_logprob`` returns) and streamed out via the shared
    overwrite sink; at 10^12 docs the rank cut becomes the distributed
    two-phase quantile plan ``curate.shuffle_order`` already implements."""
    import ray.data as rd

    t = perplexity_buckets(sf_dir, index_dir, n_buckets)
    return write_dataset(rd.from_arrow(t), out_dir)


_FP_BASE = np.uint64(1315423911)
_FP_WINDOW = 16


def doc_fingerprints_ds(sf_dir: str, window: int = _FP_WINDOW, keep: int = 4):
    def fp(batch: pa.Table) -> pa.Table:
        out_doc, out_fp = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if len(b) < window:
                hashes = np.array(
                    [int(b.sum()) if len(b) else 0], dtype=np.uint64
                )
            else:
                # polynomial window hash mod 2^64 (uint64 wraparound),
                # vectorized over positions — the loop is only the 16
                # in-window offsets, never the characters
                n_pos = len(b) - window + 1
                hashes = np.zeros(n_pos, dtype=np.uint64)
                for j in range(window):
                    hashes = hashes * _FP_BASE + b[j : j + n_pos]
            sel = np.sort(hashes)[:keep]
            out_doc.extend([doc_id] * len(sel))
            out_fp.extend(int(x) for x in sel)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "fp": pa.array(np.array(out_fp, dtype=np.uint64).astype(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprints(sf_dir: str, window: int = _FP_WINDOW, keep: int = 4) -> pa.Table:
    """(doc_id, fp) — ``keep`` smallest Karp-Rabin window hashes per doc
    (winnowing-lite).  Vectorized rolling hash over the char codes."""
    return _collect_sorted(doc_fingerprints_ds(sf_dir, window, keep), key=["doc_id", "fp"])


def doc_fingerprints_to_parquet(
    sf_dir: str, out_dir: str, window: int = _FP_WINDOW, keep: int = 4
) -> str:
    return write_dataset(doc_fingerprints_ds(sf_dir, window, keep), out_dir)


def zipf_fit(index_dir: str, round_decimals: int = 6) -> pa.Table:
    """Zipf-law fit of the corpus term distribution — least-squares slope
    and R² of ln(cf) against ln(rank) with rank by (cf DESC, term ASC) —
    the standard sanity statistic for tokenizer/corpus health in
    training-data pipelines.  The sufficient statistics live in the term
    dictionary (one vocabulary-sized read; the regression is a closed
    form over ≤ |V| points on the driver).  One row:
    (n_terms, slope, intercept, r2)."""
    import os

    import pyarrow.parquet as pq

    from ..functions.bm25 import sql_round

    td = pq.read_table(
        os.path.join(index_dir, "term_dict.parquet"), columns=["term", "cf"]
    )
    agg = td.group_by("term").aggregate([("cf", "sum")])
    terms = np.asarray(agg["term"].combine_chunks().cast(pa.string())).astype(str)
    cf = np.asarray(agg["cf_sum"], dtype=np.float64)
    order = np.lexsort((terms, -cf))
    cf = cf[order]
    n = len(cf)
    if n < 2:
        raise ValueError("zipf_fit: needs >= 2 terms")
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(cf)
    xm, ym = x.mean(), y.mean()
    sxx = ((x - xm) ** 2).sum()
    sxy = ((x - xm) * (y - ym)).sum()
    syy = ((y - ym) ** 2).sum()
    slope = sxy / sxx
    intercept = ym - slope * xm
    r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else 1.0
    r = lambda v: float(sql_round(v, round_decimals))  # noqa: E731
    return pa.table(
        {
            "n_terms": pa.array([n], type=pa.int64()),
            "slope": pa.array([r(slope)], type=pa.float64()),
            "intercept": pa.array([r(intercept)], type=pa.float64()),
            "r2": pa.array([r(r2)], type=pa.float64()),
        }
    )


def tokenizer_stats(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """Tokenizer fertility report per language: doc count, total tokens,
    average document length and chars/token — the per-language numbers a
    tokenizer-selection pipeline compares across candidate tokenizers
    (high chars/token = the tokenizer compresses that language well).

    Shape: per-batch (lang, n, Σtokens, Σchars) partials — the wide text
    never shuffles; the driver combine is bounded by #languages."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens = (
            pc.list_value_length(pc.split_pattern(text, " "))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = pa.table(
            {
                "lang": batch["lang"],
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "tok": pa.array(n_tokens),
                "ch": pa.array(n_chars),
            }
        )
        return t.group_by("lang").aggregate(
            [("one", "sum"), ("tok", "sum"), ("ch", "sum")]
        )

    ds = _read_docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    parts = [p for p in (ray.get(r) for r in ds.to_arrow_refs()) if p.num_rows]
    t = pa.concat_tables(parts).group_by("lang").aggregate(
        [("one_sum", "sum"), ("tok_sum", "sum"), ("ch_sum", "sum")]
    )
    n = np.asarray(t["one_sum_sum"], dtype=np.float64)
    tok = np.asarray(t["tok_sum_sum"], dtype=np.float64)
    ch = np.asarray(t["ch_sum_sum"], dtype=np.float64)
    return pa.table(
        {
            "lang": t["lang"],
            "n_docs": pa.array(n.astype(np.int64)),
            "total_tokens": pa.array(tok.astype(np.int64)),
            "avg_dl": pa.array(sql_round(tok / n, round_decimals)),
            "chars_per_token": pa.array(sql_round(ch / tok, round_decimals)),
        }
    ).sort_by("lang")


def quality_classifier_ds(sf_dir: str, threshold: float = 0.5):
    """fastText-style quality-classifier filtering as a streaming Dataset:
    a fixed-weight logistic model over the quality features (the shape a
    learned classifier slots into — weights here are deterministic so the
    SQL oracle can replay the exact arithmetic):

        z = 3·stop_ratio − 0.4·mean_tok_len + 2·min(n_tokens,100)/100 + 0.5
        p = 1 / (1 + exp(−z)),   keep = round(p, 6) ≥ threshold

    One pass over the text; features reuse ``quality_batch``."""
    def classify(batch: pa.Table) -> pa.Table:
        f = quality_batch(batch)
        stop = np.asarray(f["stop_ratio"], dtype=np.float64)
        mtl = np.asarray(f["mean_tok_len"], dtype=np.float64)
        ntk = np.asarray(f["n_tokens"], dtype=np.float64)
        z = 3.0 * stop - 0.4 * mtl + 2.0 * np.minimum(ntk, 100.0) / 100.0 + 0.5
        p = sql_round(1.0 / (1.0 + np.exp(-z)), 6)
        return pa.table(
            {
                "doc_id": f["doc_id"],
                "prob": pa.array(p),
                "keep": pa.array((p >= threshold).astype(np.int64)),
            }
        )

    return _read_docs(sf_dir).map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_classifier(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    return _collect_sorted(quality_classifier_ds(sf_dir, threshold))


def quality_classifier_to_parquet(sf_dir: str, out_dir: str, threshold: float = 0.5) -> str:
    return write_dataset(quality_classifier_ds(sf_dir, threshold), out_dir)


def mlm_examples_ds(sf_dir: str, stride: int = 7, mask_token: str = "[MASK]"):
    """MLM training-example generation as a streaming Dataset: every token
    whose (position + doc_id) ≡ 0 (mod ``stride``) is replaced by
    ``mask_token`` (~1/stride masking rate — BERT's 15% at stride 7).

    DETERMINISTIC masking (position+doc keyed, no RNG) so examples are
    reproducible across runs/workers and the SQL oracle can replay them —
    a real pipeline swaps in a seeded hash without touching the plan.
    One pass, all-Arrow: split → flat mask → list rebuild → join."""
    def mask(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lengths = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        toks = flat.flatten()
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        pos = np.arange(len(toks), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        doc_of = np.repeat(doc_ids, lengths)
        hit = (pos + doc_of) % stride == 0
        masked = pc.if_else(pa.array(hit), pa.scalar(mask_token), toks)
        rebuilt = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), masked)
        joined = pc.binary_join(rebuilt, " ")
        n_masked = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(n_masked, np.repeat(np.arange(batch.num_rows), lengths), hit.astype(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "masked": joined,
                "n_masked": pa.array(n_masked),
            }
        )

    return _read_docs(sf_dir).map_batches(
        mask, batch_format="pyarrow", zero_copy_batch=True
    )


def mlm_examples(sf_dir: str, stride: int = 7) -> pa.Table:
    return _collect_sorted(mlm_examples_ds(sf_dir, stride))


def fim_examples_ds(sf_dir: str):
    """FIM (fill-in-the-middle) training-example generation for code LLMs
    (Bavarian et al. 2022) as a streaming Dataset: each doc's token stream
    splits into (prefix, middle, suffix) at DETERMINISTIC cut points
    — a = (7·doc_id+3) mod (n+1), b = a + (11·doc_id+5) mod (n−a+1) —
    and re-serializes in the paper's PSM layout for even doc_ids
    (``<PRE>p<SUF>s<MID>m``) and SPM for odd (``<SUF>s<PRE>p<MID>m``), the
    50/50 mode mix the paper trains with.  No RNG: reproducible across
    runs/workers, SQL-replayable; a real pipeline swaps in a seeded hash
    without touching the plan.

    Fully vectorized: one split per batch, per-token segment assignment
    (position vs the per-row cuts), then each segment is a FILTER of the
    flat token array (contiguous by construction) rebuilt into a list
    array and joined — no per-row Python."""

    def fim(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lengths = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = flat.flatten()
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        n = lengths
        a = (7 * doc_ids + 3) % (n + 1)
        b = a + (11 * doc_ids + 5) % (n - a + 1)
        pos = np.arange(len(toks), dtype=np.int64) - np.repeat(
            np.cumsum(n) - n, n
        )
        a_of = np.repeat(a, n)
        b_of = np.repeat(b, n)

        def joined_segment(mask: np.ndarray, seg_len: np.ndarray) -> pa.Array:
            # tokens of one segment stay contiguous per row under filter,
            # rows stay in order — offsets are just the segment lengths
            seg_toks = toks.filter(pa.array(mask))
            offsets = np.concatenate(([0], np.cumsum(seg_len)))
            lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), seg_toks)
            return pc.binary_join(lst, " ")

        p = joined_segment(pos < a_of, a)
        m = joined_segment((pos >= a_of) & (pos < b_of), b - a)
        s = joined_segment(pos >= b_of, n - b)
        psm = pc.binary_join_element_wise(
            pa.scalar("<PRE>"), p, pa.scalar("<SUF>"), s, pa.scalar("<MID>"), m, ""
        )
        spm = pc.binary_join_element_wise(
            pa.scalar("<SUF>"), s, pa.scalar("<PRE>"), p, pa.scalar("<MID>"), m, ""
        )
        even = pa.array(doc_ids % 2 == 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "mode": pc.if_else(even, pa.scalar("psm"), pa.scalar("spm")),
                "n_prefix": pa.array(a, type=pa.int64()),
                "n_middle": pa.array(b - a, type=pa.int64()),
                "n_suffix": pa.array(n - b, type=pa.int64()),
                "fim": pc.if_else(even, psm, spm),
            }
        )

    return _read_docs(sf_dir).map_batches(fim, batch_format="pyarrow", zero_copy_batch=True)


def fim_examples(sf_dir: str) -> pa.Table:
    return _collect_sorted(fim_examples_ds(sf_dir))


def fim_examples_to_parquet(sf_dir: str, out_dir: str) -> str:
    return write_dataset(fim_examples_ds(sf_dir), out_dir)


def mlm_examples_to_parquet(sf_dir: str, out_dir: str, stride: int = 7) -> str:
    return write_dataset(mlm_examples_ds(sf_dir, stride), out_dir)


def t5_span_corruption_ds(sf_dir: str, period: int = 20, span_len: int = 3):
    """T5 span-corruption example generation (Raffel et al. 2020) as a
    streaming Dataset — the third member of the MLM/FIM family: contiguous
    token SPANS are replaced by numbered sentinels in the input, and the
    target is the dropped spans each prefixed by its sentinel, closed by a
    final sentinel.

    DETERMINISTIC span placement (no RNG, SQL-replayable): doc offset
    r = doc_id mod ``period``; spans start at r, r+period, … and cover
    ``span_len`` tokens (≈ span_len/period corruption — 15% at 3/20, the
    paper's rate at its mean span length 3).  A real pipeline swaps in a
    seeded hash without touching the plan.

    Fully vectorized: one split per batch, per-token span membership /
    ordinal arithmetic, sentinel strings built with numpy char kernels,
    each output a FILTER of the flat token array rebuilt via
    ``ListArray.from_arrays`` + ``binary_join`` — no per-row Python."""

    def corrupt(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        n = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = flat.flatten()
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        pos = np.arange(len(toks), dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        r_of = np.repeat(doc_ids % period, n)
        rel = pos - r_of
        in_span = (rel >= 0) & (rel % period < span_len)
        first = (rel >= 0) & (rel % period == 0)
        span_id = np.where(rel >= 0, rel // period, -1)
        sent_arr = pa.array(
            np.char.add(
                np.char.add("<extra_id_", span_id.astype("U20")), ">"
            ),
            type=pa.string(),
        )
        first_arr = pa.array(first)

        # input: non-span tokens kept verbatim, each span collapsed to its
        # sentinel at the first position
        keep_in = ~in_span | first
        in_toks = pc.if_else(first_arr, sent_arr, toks).filter(pa.array(keep_in))
        keep_per_row = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(keep_per_row, np.repeat(np.arange(batch.num_rows), n), keep_in.astype(np.int64))
        in_off = np.concatenate(([0], np.cumsum(keep_per_row)))
        input_col = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(in_off, type=pa.int32()), in_toks),
            " ",
        )

        # target: span tokens, the first of each span prefixed by its
        # sentinel, closed by the final sentinel <extra_id_{n_spans}>
        tgt_toks = pc.if_else(
            first_arr,
            pc.binary_join_element_wise(sent_arr, toks, " "),
            toks,
        ).filter(pa.array(in_span))
        span_per_row = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(span_per_row, np.repeat(np.arange(batch.num_rows), n), in_span.astype(np.int64))
        tg_off = np.concatenate(([0], np.cumsum(span_per_row)))
        body = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(tg_off, type=pa.int32()), tgt_toks),
            " ",
        )
        r = doc_ids % period
        n_spans = np.where(n > r, (n - r + period - 1) // period, 0)
        closing = np.char.add(
            np.char.add("<extra_id_", n_spans.astype("U20")), ">"
        )
        target_col = pc.if_else(
            pa.array(span_per_row > 0),
            pc.binary_join_element_wise(
                body, pa.array(closing, type=pa.string()), " "
            ),
            pa.array(closing, type=pa.string()),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "input": input_col,
                "target": target_col,
                "n_spans": pa.array(n_spans, type=pa.int64()),
            }
        )

    return _read_docs(sf_dir).map_batches(
        corrupt, batch_format="pyarrow", zero_copy_batch=True
    )


def t5_span_corruption(sf_dir: str, period: int = 20, span_len: int = 3) -> pa.Table:
    return _collect_sorted(t5_span_corruption_ds(sf_dir, period, span_len))


def t5_span_corruption_to_parquet(
    sf_dir: str, out_dir: str, period: int = 20, span_len: int = 3
) -> str:
    return write_dataset(t5_span_corruption_ds(sf_dir, period, span_len), out_dir)


def length_grouped_batches(sf_dir: str, batch_size: int = 64) -> pa.Table:
    """Length-grouped batching for training (the dynamic-padding trick:
    sort examples by length so each batch pads to a near-uniform max) vs
    ARRIVAL-order batching, as one plan table →
    (strategy, batch_id, n, max_dl, sum_dl, padding).

    ``arrival`` batches are ``doc_id // B`` (map-side groupby partials —
    the assignment is data-independent).  ``length_grouped`` batches are
    rank//B of the (dl ASC, doc_id ASC) ordering — derived WITHOUT a
    global sort from the (dl, count) value-count partials: the driver
    walks the dl runs arithmetically, bounded by #distinct lengths +
    #batches, never doc count.  padding = n·max_dl − sum_dl, the tokens a
    padded batch wastes."""
    import ray
    import ray.data as rd

    from ..functions.blocks import collect_tables

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        dl = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        arr_b = d // batch_size
        t = pa.table(
            {
                "b": pa.array(arr_b),
                "one": pa.array(np.ones(len(d), np.int64)),
                "mx": pa.array(dl),
                "sm": pa.array(dl),
                "dl": pa.array(dl),
            }
        )
        g = t.group_by("b").aggregate([("one", "sum"), ("mx", "max"), ("sm", "sum")])
        arr = g.rename_columns(["b", "n", "mx", "sm"])
        vc = t.group_by("dl").aggregate([("one", "sum")]).rename_columns(["dl", "cnt"])
        zeros = pa.array(np.zeros(vc.num_rows, np.int64))
        arr_t = pa.table(
            {
                "kind": pa.array(["arr"] * arr.num_rows, type=pa.string()),
                "k1": arr["b"].cast(pa.int64()),
                "v1": arr["n"].cast(pa.int64()),
                "v2": arr["mx"].cast(pa.int64()),
                "v3": arr["sm"].cast(pa.int64()),
            }
        )
        vc_t = pa.table(
            {
                "kind": pa.array(["vc"] * vc.num_rows, type=pa.string()),
                "k1": vc["dl"].cast(pa.int64()),
                "v1": vc["cnt"].cast(pa.int64()),
                "v2": zeros,
                "v3": zeros,
            }
        )
        return pa.concat_tables([arr_t, vc_t])

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cat = pa.concat_tables(collect_tables(ds, on_empty="no documents"))

    rows: list[tuple[str, int, int, int, int]] = []
    # arrival strategy: combine per-(batch) partials
    arr = (
        cat.filter(pc.equal(cat["kind"], "arr"))
        .group_by("k1")
        .aggregate([("v1", "sum"), ("v2", "max"), ("v3", "sum")])
        .sort_by("k1")
    )
    for b, n, mx, sm in zip(
        arr["k1"].to_pylist(), arr["v1_sum"].to_pylist(),
        arr["v2_max"].to_pylist(), arr["v3_sum"].to_pylist(),
    ):
        rows.append(("arrival", int(b), int(n), int(mx), int(sm)))
    # length-grouped: walk the dl runs; ties within one dl are doc_id
    # ordered, which never changes batch stats (equal lengths)
    vc = (
        cat.filter(pc.equal(cat["kind"], "vc"))
        .group_by("k1")
        .aggregate([("v1", "sum")])
        .sort_by("k1")
    )
    bi, n_cur, mx_cur, sm_cur = 0, 0, 0, 0
    for dl, cnt in zip(vc["k1"].to_pylist(), vc["v1_sum"].to_pylist()):
        left = int(cnt)
        while left:
            take = min(batch_size - n_cur, left)
            n_cur += take
            sm_cur += take * int(dl)
            mx_cur = int(dl)
            left -= take
            if n_cur == batch_size:
                rows.append(("length_grouped", bi, n_cur, mx_cur, sm_cur))
                bi, n_cur, mx_cur, sm_cur = bi + 1, 0, 0, 0
    if n_cur:
        rows.append(("length_grouped", bi, n_cur, mx_cur, sm_cur))
    return pa.table(
        {
            "strategy": pa.array([r[0] for r in rows], type=pa.string()),
            "batch_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "n": pa.array([r[2] for r in rows], type=pa.int64()),
            "max_dl": pa.array([r[3] for r in rows], type=pa.int64()),
            "sum_dl": pa.array([r[4] for r in rows], type=pa.int64()),
            "padding": pa.array(
                [r[2] * r[3] - r[4] for r in rows], type=pa.int64()
            ),
        }
    )
