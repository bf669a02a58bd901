"""Corpus n-gram statistics for training-data pipelines.

- ``pmi_collocations``: pointwise mutual information over adjacent token
  bigrams — the classic collocation detector (Church & Hanks 1990).  The
  bigram counts come from ONE streamed pass over the corpus (per-batch
  Arrow hash-agg partials, combine bounded by |observed bigrams|, never by
  corpus size); the unigram model is NOT recomputed — the already-built
  term dictionary's collection frequencies ARE the unigram LM, exactly as
  in ``textstats.unigram_logprob``.
- ``tfidf_top_terms``: per-document top-k terms by tf·idf — the engine's
  postings artifact already holds (term, doc_id, tf), so this is a
  broadcast idf lookup inside ``map_batches`` plus one doc-BUCKET
  ``groupby().map_groups`` top-k (coarse hash buckets; per bucket one
  vectorized sort + run-rank filter covers all its docs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round


def bigram_counts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → partial (a, b, n) adjacent-bigram counts."""
    toks = pc.split_pattern(batch["text"], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = toks.flatten()
    total = len(flat)
    if total == 0 or (dl <= 1).all():
        return pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    # a position is a LEFT bigram slot unless it is the last token of a doc
    is_left = np.ones(total, dtype=bool)
    is_left[np.cumsum(dl)[dl > 0] - 1] = False
    li = np.flatnonzero(is_left)
    pairs = pa.table(
        {
            "a": flat.take(pa.array(li, type=pa.int64())),
            "b": flat.take(pa.array(li + 1, type=pa.int64())),
        }
    )
    g = pairs.group_by(["a", "b"]).aggregate([("b", "count")])
    return pa.table({"a": g["a"], "b": g["b"], "n": g["b_count"].cast(pa.int64())})


def pmi_collocations(
    sf_dir: str,
    index_dir: str,
    total_dl: int,
    n_docs: int,
    min_count: int = 5,
    round_decimals: int = 6,
) -> pa.Table:
    """(a, b, pair_count, pmi) for every adjacent bigram seen ≥ min_count
    times: pmi = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over the corpus's
    B = total_dl − n_docs bigram slots and p(·) over its T = total_dl
    tokens.  Sorted (a, b)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(bigram_counts_batch, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    c2 = (
        cat.group_by(["a", "b"])
        .aggregate([("n", "sum")])
        .rename_columns(["a", "b", "n"])
    )
    c2 = c2.filter(pc.greater_equal(c2["n"], min_count))
    # unigram LM straight from the term dictionary (cf summed over slices)
    td = pq.read_table(
        os.path.join(index_dir, "term_dict.parquet"), columns=["term", "cf"]
    )
    cf_t = td.group_by("term").aggregate([("cf", "sum")])
    vocab = cf_t["term"].combine_chunks()
    cf = np.asarray(cf_t["cf_sum"], dtype=np.float64)
    t_tot = float(total_dl)
    b_tot = float(total_dl - n_docs)
    # vectorized cf lookup: index_in against the vocabulary (every bigram
    # token is in the dictionary — same tokenizer built both)
    ia = np.asarray(pc.index_in(c2["a"], value_set=vocab), dtype=np.int64)
    ib = np.asarray(pc.index_in(c2["b"], value_set=vocab), dtype=np.int64)
    n_v = np.asarray(c2["n"], dtype=np.float64)
    pmi = sql_round(
        np.log((n_v / b_tot) / ((cf[ia] / t_tot) * (cf[ib] / t_tot))),
        round_decimals,
    )
    return pa.table(
        {
            "a": c2["a"],
            "b": c2["b"],
            "pair_count": c2["n"].cast(pa.int64()),
            "pmi": pa.array(pmi, type=pa.float64()),
        }
    ).sort_by([("a", "ascending"), ("b", "ascending")])


def tfidf_top_terms(
    index_dir: str, n_docs: int, k: int = 3, round_decimals: int = 6,
    n_buckets: int = 64,
) -> pa.Table:
    """Per-document top-k terms by tf·idf, idf = ln(N/df) →
    (doc_id, rank, term, score); ranking uses the ROUNDED score (ties →
    term ascending) so it is reproducible against a 6-dp SQL oracle.

    The df map is broadcast once (``ray.put``); scores attach inside
    ``map_batches`` via dictionary-encoded lookup (one numpy gather per
    batch); the only shuffle is a coarse doc-bucket groupby whose per-bucket
    combine is one vectorized sort + run-rank filter.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if k < 1:
        raise ValueError("k must be >= 1")
    td = pq.read_table(
        os.path.join(index_dir, "term_dict.parquet"), columns=["term", "df"]
    )
    df_t = td.group_by("term").aggregate([("df", "sum")])
    df_map = dict(zip(df_t["term"].to_pylist(), df_t["df_sum"].to_pylist()))
    df_ref = ray.put(df_map)
    n = float(n_docs)

    def score(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        terms = batch["term"].combine_chunks()
        dic = terms.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        idf = np.log(n / np.array([dfm[t] for t in uniq], dtype=np.float64))
        tf = np.asarray(batch["tf"], dtype=np.float64)
        s = tf * idf[np.asarray(dic.indices)]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "term": terms,
                "score": pa.array(sql_round(s, round_decimals), type=pa.float64()),
            }
        )

    # coarse doc-hash buckets, not one map_groups call per doc: each
    # bucket does ONE Arrow multi-column sort + run-rank filter for all
    # its docs (the per-doc shape pays a Python call per document);
    # ``n_buckets`` should scale with the cluster — 64 covers a node.

    def add_db(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "db",
            pa.array(
                np.asarray(batch["doc_id"], dtype=np.int64) % n_buckets,
                type=pa.int64(),
            ),
        )

    def topk_bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ]
        )
        doc = np.asarray(g["doc_id"], dtype=np.int64)
        newd = np.ones(len(doc), dtype=bool)
        newd[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(newd)
        rank = np.arange(len(doc), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(doc)])
        )
        keep = rank < k
        return g.filter(pa.array(keep)).drop(["db"]).append_column(
            "rank", pa.array(rank[keep] + 1, type=pa.int64())
        )

    ds = (
        rd.read_parquet(
            os.path.join(index_dir, "postings"), columns=["term", "doc_id", "tf"]
        )
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_db, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("db")
        .map_groups(topk_bucket, batch_format="pyarrow")
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    out = pa.concat_tables([p for p in parts if p.num_rows])
    return out.select(["doc_id", "rank", "term", "score"]).sort_by(
        [("doc_id", "ascending"), ("rank", "ascending")]
    )


def bigram_pair_counts(
    sf_dir: str, left_terms: list[str], right_terms: list[str]
) -> dict[tuple[str, str], int]:
    """Corpus counts of adjacent bigrams restricted to
    ``left_terms × right_terms`` — the candidate-bounded read behind the
    phrase suggester.

    The restriction is BROADCAST into the batch transform (two `pc.is_in`
    masks before the partial agg), so the shuffle and the driver-side dict
    are bounded by the observed candidate pairs, never the corpus bigram
    table."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if not left_terms or not right_terms:
        return {}
    lv = pa.array(sorted(set(left_terms)), type=pa.string())
    rv = pa.array(sorted(set(right_terms)), type=pa.string())
    l_ref, r_ref = ray.put(lv), ray.put(rv)

    def partial(batch: pa.Table) -> pa.Table:
        t = bigram_counts_batch(batch)
        m = pc.and_(
            pc.is_in(t["a"], value_set=ray.get(l_ref)),
            pc.is_in(t["b"], value_set=ray.get(r_ref)),
        )
        return t.filter(m)

    ds = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    out: dict[tuple[str, str], int] = {}
    for p in parts:
        for a, b, n in zip(p["a"].to_pylist(), p["b"].to_pylist(), p["n"].to_pylist()):
            out[(a, b)] = int(n)
    return out


def bigram_logprob_ds(sf_dir: str, round_decimals: int = 6):
    """Bigram-LM quality score (the KenLM-style upgrade of
    ``unigram_logprob``): per doc, the mean add-1-smoothed bigram token
    log-probability

        lp(d) = mean over adjacent pairs (a,b) of ln( (c(a,b)+1) / (c(a,·)+V) )

    with c(·) corpus bigram counts and V the corpus vocabulary size.
    Docs with fewer than 2 tokens have no bigram slots and are omitted.

    Plan: ONE distributed pass builds the corpus bigram table (per-batch
    partial counts → (a,b) groupby); left-slot totals derive from it; a
    SECOND pass re-streams the corpus, scoring each batch's bigram
    occurrences vectorized against the broadcast count table (sorted-key
    searchsorted — no per-row dict lookups).  The broadcast is bounded by
    the OBSERVED bigram vocabulary; at 100-TB text that table itself is
    large, and the scoring join becomes a (a,b)-keyed Dataset join
    instead of a broadcast — documented divergence point."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.bm25 import sql_round

    docs_path = os.path.join(sf_dir, "documents.parquet")
    counts = (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(bigram_counts_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    parts = [ray.get(r) for r in counts.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    bt = pa.concat_tables([p for p in parts if p.num_rows])
    if bt.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "logprob": pa.array([], type=pa.float64()),
            }
        )
    a_arr = np.asarray(bt["a"].combine_chunks().cast(pa.string())).astype(str)
    b_arr = np.asarray(bt["b"].combine_chunks().cast(pa.string())).astype(str)
    n_arr = np.asarray(bt["n"], dtype=np.float64)
    pair_keys = np.char.add(np.char.add(a_arr, "\x00"), b_arr)
    po = np.argsort(pair_keys)
    pair_keys, pair_n = pair_keys[po], n_arr[po]
    # left-slot totals c(a,·)
    la, linv = np.unique(a_arr, return_inverse=True)
    ln = np.zeros(len(la), dtype=np.float64)
    np.add.at(ln, linv, n_arr)

    # corpus vocabulary size (distinct tokens, incl. single-token docs)
    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        return pa.table({"w": pc.unique(flat)})

    vparts = [
        ray.get(r)
        for r in rd.read_parquet(docs_path, columns=["text"])
        .map_batches(vocab_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    ]
    vparts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in vparts]
    vv = pa.concat_tables([p for p in vparts if p.num_rows])
    V = float(len(pc.unique(vv["w"])))

    pk_ref = ray.put((pair_keys, pair_n))
    lc_ref = ray.put((la, ln))

    def score(batch: pa.Table) -> pa.Table:
        pk, pn = ray.get(pk_ref)
        lav, lnv = ray.get(lc_ref)
        toks = pc.split_pattern(batch["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        dl = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = np.asarray(toks.flatten().cast(pa.string())).astype(str)
        total = len(flat)
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)
        if total == 0 or (dl <= 1).all():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "logprob": pa.array([], type=pa.float64()),
                }
            )
        is_left = np.ones(total, dtype=bool)
        is_left[np.cumsum(dl)[dl > 0] - 1] = False
        li = np.flatnonzero(is_left)
        a = flat[li]
        b = flat[li + 1]
        keys = np.char.add(np.char.add(a, "\x00"), b)
        pi = np.searchsorted(pk, keys)
        pi = np.clip(pi, 0, len(pk) - 1)
        cn = np.where(pk[pi] == keys, pn[pi], 0.0)
        lj = np.searchsorted(lav, a)
        lj = np.clip(lj, 0, len(lav) - 1)
        cl = np.where(lav[lj] == a, lnv[lj], 0.0)
        lp = np.log((cn + 1.0) / (cl + V))
        row_idx = np.repeat(np.arange(len(dl)), dl)[li]
        sums = np.zeros(len(dl), dtype=np.float64)
        np.add.at(sums, row_idx, lp)
        slots = np.maximum(dl - 1, 0)
        keep = slots > 0
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], type=pa.int64()),
                "logprob": pa.array(
                    sql_round(sums[keep] / slots[keep], round_decimals),
                    type=pa.float64(),
                ),
            }
        )

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def bigram_logprob(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """Driver-gate variant of ``bigram_logprob_ds``: collected and
    doc-sorted."""
    import ray

    out = bigram_logprob_ds(sf_dir, round_decimals)
    if isinstance(out, pa.Table):  # empty-corpus short-circuit
        return out
    parts = [ray.get(r) for r in out.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts).sort_by("doc_id")


def bigram_logprob_to_parquet(sf_dir: str, out_dir: str) -> str:
    """Scale sink: stream per-doc bigram logprobs to partitioned parquet."""
    from .textstats import write_dataset

    out = bigram_logprob_ds(sf_dir)
    if isinstance(out, pa.Table):  # empty corpus: nothing to write
        raise ValueError("bigram_logprob_to_parquet: empty corpus")
    return write_dataset(out, out_dir)
