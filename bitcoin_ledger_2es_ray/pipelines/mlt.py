"""More-like-this (ES ``more_like_this`` query analog).

Given a source document, select its ``n_terms`` most characteristic terms
by tf·idf (tie-break: term ascending, on the 6-dp-rounded selection score
so the SQL oracle agrees), then run the standard BM25 TAAT kernel over
those terms with the source document excluded — ES's default when ``like``
references an indexed document.

The per-document term view comes from the build's ``postings`` artifact
(term, doc_id, tf) read with a ``doc_id`` predicate — parquet row-group
statistics prune the scan, which is the batch-engine stand-in for Lucene's
term vectors.  ``MltScorer`` distributes a source-doc *set* over an actor
pool exactly like the other query paths (store + postings dataset handle
load once per actor).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from ..functions.bm25 import idf, sql_round
from ..pipelines.query import SegmentStore, score_query, taat_topk
from ..schemas import RESULTS


def doc_terms(index_dir: str, doc_id: int) -> pa.Table:
    """(term, tf) rows of one document from the postings artifact."""
    return pads.dataset(os.path.join(index_dir, "postings")).to_table(
        columns=["term", "tf"], filter=pads.field("doc_id") == doc_id
    )


def select_mlt_terms(
    store: SegmentStore, doc_tf: pa.Table, n_terms: int, round_decimals: int = 6
) -> list[str]:
    """Top ``n_terms`` of a doc by (round(tf·idf, 6) DESC, term ASC)."""
    terms = doc_tf["term"].to_pylist()
    if not terms:
        return []
    tf = np.asarray(doc_tf["tf"].combine_chunks(), dtype=np.float64)
    df = np.fromiter((store.td.df_of(t) for t in terms), dtype=np.float64, count=len(terms))
    sel = sql_round(tf * idf(store.n_docs, df), round_decimals)
    order = sorted(range(len(terms)), key=lambda i: (-sel[i], terms[i]))
    return [terms[i] for i in order[:n_terms]]


def more_like_this(
    store: SegmentStore,
    index_dir: str,
    src_doc: int,
    n_terms: int = 5,
    k: int = 10,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Top-k docs most like ``src_doc`` (source excluded), BM25-scored over
    its ``n_terms`` highest-tf·idf terms.  Rank/tie rules identical to
    ``score_query``."""
    sel = sorted(select_mlt_terms(store, doc_terms(index_dir, src_doc), n_terms))
    lists = []
    for term in sel:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        m = d != np.uint64(src_doc)
        lists.append((float(idf(store.n_docs, df_t)), d[m], tf[m], dl[m]))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)


class MltScorer:
    """Actor-pool batch MLT: (query_id, src_doc) rows in → RESULTS rows out."""

    def __init__(
        self,
        index_dir: str,
        n_terms: int = 5,
        k: int = 10,
        round_decimals: int | None = None,
    ):
        self.index_dir = index_dir
        self.store = SegmentStore(index_dir)
        self.n_terms = n_terms
        self.k = k
        self.round_decimals = round_decimals

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, src in zip(
            batch["query_id"].to_pylist(), batch["src_doc"].to_pylist()
        ):
            top = more_like_this(
                self.store,
                self.index_dir,
                int(src),
                self.n_terms,
                self.k,
                self.round_decimals,
            )
            for r, (d, s) in enumerate(top, start=1):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.uint64()),
                "rank": pa.array(ranks, type=pa.uint32()),
                "doc_id": pa.array(docs, type=pa.uint64()),
                "score": pa.array(scores, type=pa.float64()),
            },
            schema=RESULTS,
        )


def run_mlt_queries(
    index_dir: str,
    src_docs: pa.Table,
    n_terms: int = 5,
    k: int = 10,
    concurrency: int = 2,
    round_decimals: int | None = None,
):
    """Distribute a (query_id, src_doc) set over an MltScorer pool → RESULTS
    Dataset.  Same pre-split block layout as ``query.run_queries``."""
    from ..functions.blocks import from_arrow_blocks

    ds = from_arrow_blocks(src_docs, concurrency)
    return ds.map_batches(
        MltScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "n_terms": n_terms,
            "k": k,
            "round_decimals": round_decimals,
        },
        batch_size=max(1, -(-src_docs.num_rows // max(1, concurrency))),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def terms_lookup_match(
    store: SegmentStore,
    index_dir: str,
    lookup_doc: int,
    n_terms: int = 5,
) -> tuple[list[str], np.ndarray]:
    """ES ``terms`` query with *terms lookup*: the term list is fetched
    from another indexed document (``index``/``id``/``path``) instead of
    being sent inline, then evaluated as a constant-score filter — docs
    containing ANY of the looked-up terms match (the lookup document
    itself included when it does).

    The lookup path here is the doc's term vector (same postings-artifact
    read as ``more_like_this``), capped to its ``n_terms`` RAREST terms
    (df ASC, term ASC) — ES caps lookups at 65k terms; the rarest-k cap is
    this engine's deterministic, oracle-expressible bound on the fan-out.

    Returns (selected terms sorted, matching doc ids ascending)."""
    from ..functions.boolean import union_many

    dt = doc_terms(index_dir, lookup_doc)
    terms = dt["term"].to_pylist()
    if not terms:
        return [], np.empty(0, dtype=np.uint64)
    df = [store.td.df_of(t) for t in terms]
    order = sorted(range(len(terms)), key=lambda i: (df[i], terms[i]))[:n_terms]
    sel = sorted(terms[i] for i in order)
    sets = [np.unique(store.postings(t)[0]) for t in sel]
    sets = [s for s in sets if len(s)]
    if not sets:
        return sel, np.empty(0, dtype=np.uint64)
    return sel, union_many(sets)


def prf_expand_topk(
    store: SegmentStore,
    index_dir: str,
    text: str,
    k: int = 10,
    n_feedback: int = 3,
    n_expand: int = 3,
    expand_weight: float = 0.5,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Rocchio pseudo-relevance feedback — the classic two-pass query
    expansion (ES users reach it through MLT-on-top-hits; Lucene ships it
    as the ``QueryExpansion``/MLT family):

    1. base BM25 retrieves the top ``n_feedback`` docs;
    2. expansion terms = top ``n_expand`` by SUMMED tf·idf over those docs
       (query terms excluded; ties (score DESC, term ASC) on the rounded
       selection score, so the SQL oracle replays the choice exactly);
    3. final ranking = BM25 where expansion terms contribute scaled by
       ``expand_weight`` (Rocchio's β against α = 1 on original terms).

    The feedback docs' term vectors come from ONE predicate-pushdown read
    of the postings artifact (row-group pruning on doc_id — the same term-
    vector stand-in MLT uses); everything else is the standard TAAT kernel.
    """
    from ..functions.tokenize import tokenize_query

    base_terms = sorted(set(tokenize_query(text)))
    fb = [
        d for d, _ in score_query(store, text, n_feedback, round_decimals=round_decimals)
    ]
    if not fb:
        return []
    t = pads.dataset(os.path.join(index_dir, "postings")).to_table(
        columns=["term", "tf"],
        filter=pads.field("doc_id").isin([int(d) for d in fb]),
    )
    agg = t.group_by("term").aggregate([("tf", "sum")])
    cand_terms = agg["term"].to_pylist()
    sum_tf = np.asarray(agg["tf_sum"], dtype=np.float64)
    base_set = set(base_terms)
    sel_rows = []
    for term, stf in zip(cand_terms, sum_tf):
        if term in base_set:
            continue
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        sel = float(sql_round(stf * idf(store.n_docs, df_t), 6))
        sel_rows.append((term, sel))
    sel_rows.sort(key=lambda r: (-r[1], r[0]))
    expansion = sorted(t for t, _ in sel_rows[:n_expand])

    lists = []
    for term, w in [(t, 1.0) for t in base_terms] + [
        (t, expand_weight) for t in expansion
    ]:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        lists.append((w * float(idf(store.n_docs, df_t)), d, tf, dl))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)


def more_like_this_unlike(
    store: SegmentStore,
    index_dir: str,
    src_doc: int,
    unlike_doc: int,
    n_terms: int = 5,
    k: int = 10,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``more_like_this`` with ``unlike``: the negative example doc's
    terms are removed from the candidate set BEFORE the tf·idf cutoff
    (ES demotes unlike-doc terms when building the interesting set), and
    both input docs are excluded from the results.  Everything else —
    selection rule, BM25 scoring, rank/ties — matches
    ``more_like_this``."""
    import pyarrow.compute as pc

    like = doc_terms(index_dir, src_doc)
    bad = doc_terms(index_dir, unlike_doc)["term"]
    if len(bad):
        keep = pc.invert(pc.is_in(like["term"], value_set=bad.combine_chunks()))
        like = like.filter(keep)
    sel = sorted(select_mlt_terms(store, like, n_terms))
    lists = []
    for term in sel:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        m = (d != np.uint64(src_doc)) & (d != np.uint64(unlike_doc))
        lists.append((float(idf(store.n_docs, df_t)), d[m], tf[m], dl[m]))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)
