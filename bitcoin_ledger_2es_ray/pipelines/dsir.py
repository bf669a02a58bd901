"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects the documents whose n-gram distribution looks most like a TARGET
corpus (here: the docs of one language) relative to the SOURCE corpus
(everything), the published recipe for picking pretraining data that
matches a high-quality target domain:

    logw(d) = Σ_term tf(d, term) · [ ln p_target(term) − ln p_source(term) ]

with add-1–smoothed unigram bucket models

    p(term) = (cf(term) + 1) / (total_tokens + |V|).

The paper hashes n-grams into 10k buckets because its vocabularies are
unbounded; this corpus's vocabulary is bounded and shared with every other
oracle-gated operator, so the buckets are the terms themselves — which
makes the whole operator exactly SQL-expressible (the hashed variant would
be rows-only).  The paper then Gumbel-resamples by weight; the
deterministic, oracle-able variant implemented here takes the top-n by
(rounded logw DESC, doc_id ASC), i.e. temperature→0.

Ray plan (both passes stream, nothing corpus-sized touches the driver):

1. one ``map_batches`` pass over ``documents`` emits per-batch
   (term, cf_tgt, cf_src) partials — an Arrow hash-agg per batch; the
   combine is VOCABULARY-bounded, so it happens on the driver like every
   other term-distribution operator in this repo (a Ray string-key
   groupby measured ~40× slower than the bounded combine);
2. the (term, llr) table is broadcast ONCE via ``ray.put`` and a second
   ``map_batches`` pass scores each doc with an Arrow join + hash-agg
   (the ``textstats.unigram_logprob`` pattern), keeping only the batch's
   top-n rows — the driver merge is bounded by n_select × n_blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round


def _flat_tokens(batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """Whitespace token stream of a batch → (flat tokens, per-doc lengths)."""
    toks = pc.split_pattern(batch["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    return toks.flatten(), dl


def term_dist_partial(batch: pa.Table, target_lang: str) -> pa.Table:
    """(doc_id, text, lang) → partial (term, cf_tgt, cf_src) counts."""
    flat, dl = _flat_tokens(batch)
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "cf_tgt": pa.array([], type=pa.int64()),
                "cf_src": pa.array([], type=pa.int64()),
            }
        )
    is_tgt = np.asarray(
        pc.equal(batch["lang"], target_lang).combine_chunks()
        if isinstance(batch["lang"], pa.ChunkedArray)
        else pc.equal(batch["lang"], target_lang)
    )
    t = pa.table(
        {
            "term": flat,
            "tgt": pa.array(np.repeat(is_tgt.astype(np.int64), dl)),
        }
    )
    g = t.group_by("term").aggregate([("tgt", "sum"), ("tgt", "count")])
    return pa.table(
        {
            "term": g["term"],
            "cf_tgt": g["tgt_sum"].cast(pa.int64()),
            "cf_src": g["tgt_count"].cast(pa.int64()),
        }
    )


def dsir_llr_table(counts: pa.Table) -> pa.Table:
    """Combined (term, cf_tgt, cf_src) → (term, llr) log-likelihood ratios
    under the add-1–smoothed unigram models."""
    cf_t = np.asarray(counts["cf_tgt"], dtype=np.float64)
    cf_s = np.asarray(counts["cf_src"], dtype=np.float64)
    v = float(len(counts))
    t_tot, s_tot = float(cf_t.sum()), float(cf_s.sum())
    llr = np.log((cf_t + 1.0) / (t_tot + v)) - np.log((cf_s + 1.0) / (s_tot + v))
    return pa.table({"term": counts["term"], "llr": pa.array(llr)})


def dsir_select(
    sf_dir: str,
    target_lang: str = "en",
    n_select: int = 200,
    round_decimals: int = 6,
) -> pa.Table:
    """Top ``n_select`` docs by DSIR importance log-weight toward
    ``target_lang`` → (doc_id, logw) sorted by doc_id."""
    import ray
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    parts = docs.map_batches(
        term_dist_partial,
        fn_kwargs={"target_lang": target_lang},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_arrow_refs()
    tables = [ray.get(r) for r in parts]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables]
    combined = (
        pa.concat_tables(tables)
        .group_by("term")
        .aggregate([("cf_tgt", "sum"), ("cf_src", "sum")])
        .rename_columns(["term", "cf_tgt", "cf_src"])
    )
    llr_ref = ray.put(dsir_llr_table(combined))

    def score_partial(batch: pa.Table) -> pa.Table:
        flat, dl = _flat_tokens(batch)
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "logw": pa.array([], type=pa.float64()),
                }
            )
        stream = pa.table(
            {"doc_id": pa.array(np.repeat(doc_ids, dl)), "term": flat}
        )
        # (doc, term) tf first — the oracle sums tf·llr per term pair
        tfs = stream.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        j = tfs.join(ray.get(llr_ref), keys="term", join_type="inner")
        contrib = np.asarray(j["term_count"], dtype=np.float64) * np.asarray(
            j["llr"], dtype=np.float64
        )
        per = pa.table({"doc_id": j["doc_id"], "c": pa.array(contrib)})
        g = per.group_by("doc_id").aggregate([("c", "sum")])
        d = np.asarray(g["doc_id"], dtype=np.int64)
        w = sql_round(np.asarray(g["c_sum"], dtype=np.float64), round_decimals)
        order = np.lexsort((d, -w))[:n_select]  # batch-local top-n partial
        return pa.table(
            {
                "doc_id": pa.array(d[order]),
                "logw": pa.array(w[order]),
            }
        )

    parts = docs.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    tables = [ray.get(r) for r in parts]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables]
    allp = pa.concat_tables(tables)
    d = np.asarray(allp["doc_id"], dtype=np.int64)
    w = np.asarray(allp["logw"], dtype=np.float64)
    order = np.lexsort((d, -w))[:n_select]
    out = pa.table(
        {
            "doc_id": pa.array(d[order], type=pa.int64()),
            "logw": pa.array(w[order], type=pa.float64()),
        }
    ).sort_by([("doc_id", "ascending")])
    return out
