"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Engine-vs-oracle mapping: the engine runs over the corpus-shaped parquet
derived deterministically from ``documents.parquet`` (FIXTURES.md §B —
content = text, engine doc_id = documents.doc_id), so every engine result
is SQL-expressible over the raw ``documents`` view.  Scores are rounded to
6 dp on BOTH sides and ranked on the rounded value so numpy-vs-DuckDB
last-ulp float differences cannot flip a tie (functions/bm25.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

_CACHE_ROOT = os.environ.get("BLRAY_CACHE", "/tmp/blray_cache")
_N_QUERIES = 50
_TOP_K = 10
_ROUND = 6


# ---------------------------------------------------------------------------
# index build/cache helper: one index per sf_dir per process tree; repeat
# calls resume from the manifest (skip-all) instead of rebuilding.
def _index_for(sf_dir: str):
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key)
    corpus = derive_corpus_parquet(sf_dir, os.path.join(root, "corpus.parquet"))
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=os.path.join(root, "index"),
        num_partitions=16,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=4,
    )
    return build_index(cfg)


def _store_for(sf_dir: str):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_for(sf_dir)
    return SegmentStore(res.out_dir), res


def _fixture_queries(store) -> pa.Table:
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    return fixture_queries(sorted(store.df), n=_N_QUERIES, k=_TOP_K)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the inverted index
    (verify → tokenize → salted term shuffle → compressed segments), run the
    50-query fixture set through the distributed scorer pool, join doc
    metadata back — return the results table."""
    from bitcoin_ledger_2es_ray.pipelines.query import attach_doc_meta, run_queries

    sf_dir = "/root/testdata/sf0.001"
    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    from bitcoin_ledger_2es_ray.schemas import RESULTS

    results = run_queries(res.out_dir, queries, concurrency=2, round_decimals=_ROUND)
    tbl = pa.Table.from_pylist(results.take_all(), schema=RESULTS)
    return attach_doc_meta(tbl, res.out_dir)


# ---------------------------------------------------------------------------
# queries / oracle_sql — one entry per SURVEY.md §2 operator that is
# SQL-expressible; names and column names match the SQL exactly.


def _q_doc_stats(sf_dir: str) -> pa.Table:
    store, res = _store_for(sf_dir)
    return pa.table(
        {
            "n_docs": pa.array([res.n_docs], type=pa.int64()),
            "total_dl": pa.array([res.total_dl], type=pa.int64()),
            "avgdl": pa.array(
                [__import__("bitcoin_ledger_2es_ray.functions.bm25", fromlist=["sql_round"]).sql_round(res.total_dl / res.n_docs, _ROUND)],
                type=pa.float64(),
            ),
        }
    )


def _q_token_counts(sf_dir: str) -> pa.Table:
    import pyarrow.dataset as pads

    res = _index_for(sf_dir)
    t = pads.dataset(os.path.join(res.out_dir, "forward_map")).to_table(
        columns=["doc_id", "dl"]
    )
    return pa.table(
        {"doc_id": t["doc_id"].cast(pa.int64()), "dl": t["dl"].cast(pa.int64())}
    ).sort_by("doc_id")


def _q_ingest_sha(sf_dir: str) -> pa.Table:
    import pyarrow.dataset as pads

    res = _index_for(sf_dir)
    t = pads.dataset(os.path.join(res.out_dir, "forward_map")).to_table(
        columns=["doc_id", "sha256"]
    )
    sha_hex = pa.array([v.hex() for v in t["sha256"].to_pylist()], type=pa.string())
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64()), "sha": sha_hex}).sort_by("doc_id")


def _q_term_df(sf_dir: str) -> pa.Table:
    store, _ = _store_for(sf_dir)
    import pyarrow.parquet as pq

    td = pq.read_table(os.path.join(store.index_dir, "term_dict.parquet"))
    agg = td.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
    return pa.table(
        {
            "term": agg["term"],
            "df": agg["df_sum"].cast(pa.int64()),
            "cf": agg["cf_sum"].cast(pa.int64()),
        }
    ).sort_by("term")


def _q_postings(sf_dir: str) -> pa.Table:
    """The exploded posting triples — engine artifact read back."""
    import pyarrow.dataset as pads

    res = _index_for(sf_dir)
    t = pads.dataset(os.path.join(res.out_dir, "postings")).to_table(
        columns=["term", "doc_id", "tf"]
    )
    return pa.table(
        {
            "term": t["term"],
            "doc_id": t["doc_id"].cast(pa.int64()),
            "tf": t["tf"].cast(pa.int64()),
        }
    ).sort_by([("term", "ascending"), ("doc_id", "ascending")])


def _q_bm25_topk(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.query import run_queries

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    rows = run_queries(res.out_dir, queries, concurrency=4, round_decimals=_ROUND).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_synonym_match(sf_dir: str) -> pa.Table:
    """ES ``match`` + search-time ``synonym_graph``: each fixture query
    term pairs with a vocab-derived synonym partner and the pair scores as
    ONE Lucene SynonymQuery (tf summed per doc, df = max member — blended
    statistics, no idf double count)
    (`pipelines/structured.py: synonym_match_topk`)."""
    from bitcoin_ledger_2es_ray.pipelines.structured import synonym_match_topk
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    idx_of = {t: i for i, t in enumerate(vocab)}
    qterms = fixture_query_terms(vocab, n=_N_QUERIES)
    qid_l, rank_l, doc_l, score_l = [], [], [], []
    for qid, terms in enumerate(qterms):
        groups = [
            [t, vocab[(idx_of[t] * 31 + 7) % c]] for t in sorted(set(terms))
        ]
        for rank, (doc, score) in enumerate(
            synonym_match_topk(store, groups, k=_TOP_K, round_decimals=_ROUND),
            1,
        ):
            qid_l.append(qid)
            rank_l.append(rank)
            doc_l.append(doc)
            score_l.append(score)
    return pa.table(
        {
            "query_id": pa.array(qid_l, type=pa.int64()),
            "rank": pa.array(rank_l, type=pa.int64()),
            "doc_id": pa.array(doc_l, type=pa.int64()),
            "score": pa.array(score_l, type=pa.float64()),
        }
    )


def _q_search_api(sf_dir: str) -> pa.Table:
    """ES ``_search`` endpoint: the JSON query-DSL body compiled onto the
    engine kernels — each fixture query as {"query": {"match": …},
    "size": k}; must be value-identical to ``bm25_topk`` (shared oracle)
    (`pipelines/search_api.py: run_search`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    parts = []
    for qid, text, k in zip(
        queries["query_id"].to_pylist(),
        queries["text"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        t = run_search(
            store,
            {"query": {"match": {"content": text}}, "size": int(k)},
            round_decimals=_ROUND,
        )
        parts.append(
            t.append_column(
                "query_id", pa.array([int(qid)] * t.num_rows, type=pa.int64())
            )
        )
    out = pa.concat_tables(parts)
    return out.select(["query_id", "rank", "doc_id", "score"]).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def _q_search_api_aggs(sf_dir: str) -> pa.Table:
    """ES ``_search`` with an ``aggs`` section: per fixture query the
    FULL hit set (pagination ignored, ES's agg contract) feeds a
    query-scoped ``terms`` agg over ``lang`` — (query_id, lang, doc_count).
    All 50 bodies run through the batched ``_msearch`` path: the agg
    kernel runs ONCE over the assembled (query_id, doc_id) matches
    (`pipelines/search_api.py: run_msearch_aggs`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_msearch_aggs

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids = [int(q) for q in queries["query_id"].to_pylist()]
    bodies = [
        {
            "query": {"match": {"content": text}},
            "size": int(k),
            "aggs": {"langs": {"terms": {"field": "lang"}}},
        }
        for text, k in zip(
            queries["text"].to_pylist(), queries["k"].to_pylist()
        )
    ]
    r = run_msearch_aggs(res.out_dir, store, bodies, round_decimals=_ROUND)
    t = r["langs"]
    # body index → fixture query_id
    remap = pa.array(qids, type=pa.int64())
    t = t.set_column(
        t.schema.get_field_index("query_id"),
        "query_id",
        remap.take(t["query_id"]),
    )
    return t.sort_by([("query_id", "ascending"), ("lang", "ascending")])


def _q_search_api_sorted(sf_dir: str) -> pa.Table:
    """ES ``_search`` with a ``sort`` section: each fixture query ranked
    by (dl ASC, _score DESC) — the field key fetched through the
    forward-map pushdown (`pipelines/search_api.py: run_search`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    parts = []
    for qid, text, k in zip(
        queries["query_id"].to_pylist(),
        queries["text"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        t = run_search(
            store,
            {
                "query": {"match": {"content": text}},
                "size": int(k),
                "sort": [{"dl": {"order": "asc"}}, "_score"],
            },
            round_decimals=_ROUND,
        )
        parts.append(
            t.append_column(
                "query_id", pa.array([int(qid)] * t.num_rows, type=pa.int64())
            )
        )
    return pa.concat_tables(parts).select(
        ["query_id", "rank", "doc_id", "score"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_match_operator_and(sf_dir: str) -> pa.Table:
    """ES ``match`` with ``operator: "and"``: every analyzed query term
    must match — per-term doc sets intersect, scores stay the BM25 sum
    (`pipelines/search_api.py: _eval`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    parts = []
    for qid, text, k in zip(
        queries["query_id"].to_pylist(),
        queries["text"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        t = run_search(
            store,
            {
                "query": {"match": {"content": {"query": text, "operator": "and"}}},
                "size": int(k),
            },
            round_decimals=_ROUND,
        )
        parts.append(
            t.append_column(
                "query_id", pa.array([int(qid)] * t.num_rows, type=pa.int64())
            )
        )
    return pa.concat_tables(parts).select(
        ["query_id", "rank", "doc_id", "score"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_bool_filter_should(sf_dir: str) -> pa.Table:
    """ES bool with ``filter`` + ``should`` and NO explicit
    minimum_should_match: msm defaults to 0 (the bool carries filter
    clauses), so every filter-matching doc survives and the should clause
    adds optional score (ADVICE r5 — `pipelines/search_api.py: _eval`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    store, _ = _store_for(sf_dir)
    v = sorted(store.df)
    t = run_search(
        store,
        {
            "query": {"bool": {
                "filter": [{"term": {"content": v[0]}}],
                "should": [{"term": {"content": v[1]}}],
            }},
            "size": store.n_docs,
        },
        round_decimals=_ROUND,
    )
    return t.select(["rank", "doc_id", "score"])


def _q_bool_must_not_only(sf_dir: str) -> pa.Table:
    """ES pure-must_not bool: all docs except the matches, score 0
    (filter context; ADVICE r5 — `pipelines/search_api.py: _all_docs`)."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    store, _ = _store_for(sf_dir)
    v = sorted(store.df)
    t = run_search(
        store,
        {"query": {"bool": {"must_not": [{"term": {"content": v[0]}}]}},
         "size": store.n_docs},
        round_decimals=_ROUND,
    )
    return t.select(["rank", "doc_id", "score"])


def _q_intervals_range(sf_dir: str) -> pa.Table:
    """ES intervals ``range`` source with one-sided and exclusive bounds
    (gte-only; gt+lte), expanded through the term dictionary into
    any_of-of-match (ADVICE r5 — `pipelines/intervals.py: expand_spec`)."""
    from bitcoin_ledger_2es_ray.pipelines.intervals import intervals_search
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    parts = []
    for sid, spec in enumerate(
        ({"range": {"gte": "t"}}, {"range": {"gt": "o", "lte": "s"}})
    ):
        t = intervals_search(store, spec)
        parts.append(
            t.append_column(
                "spec", pa.array([sid] * t.num_rows, type=pa.int64())
            )
        )
    return (
        pa.concat_tables(parts)
        .select(["spec", "doc_id", "n_intervals", "first_start", "first_end"])
        .sort_by([("spec", "ascending"), ("doc_id", "ascending")])
    )


def _q_indices_boost(sf_dir: str) -> pa.Table:
    """ES ``indices_boost`` over the two-member federation: member A (the
    first third of the corpus) boosted 1.5, member B 0.5; global stats
    untouched, per-doc scores scaled before the ranking."""
    from bitcoin_ledger_2es_ray.pipelines.federate import (
        FederatedStore,
        indices_boost_topk,
    )

    fed = FederatedStore(_fed_for(sf_dir))
    queries = _fixture_queries(fed)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = indices_boost_topk(
            fed, text, _TOP_K, boosts=[1.5, 0.5], round_decimals=_ROUND
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _q_reshard_topk(sf_dir: str) -> pa.Table:
    """ES ``_split``/``_shrink``: the cached P=16 index resharded to P=11
    WITHOUT re-tokenizing (segments decode → re-place by
    (h(term)+salt·G) mod 11 → re-encode), then the fixture BM25 batch runs
    against the resharded index — identical ranking proves the reshard
    (shares the bm25_topk oracle)."""
    from bitcoin_ledger_2es_ray.pipelines.lifecycle import reshard_index
    from bitcoin_ledger_2es_ray.pipelines.query import run_queries

    store, res = _store_for(sf_dir)
    out_dir = os.path.join(os.path.dirname(res.out_dir), "index_resharded")
    if not os.path.exists(os.path.join(out_dir, "stats.parquet")):
        reshard_index(res.out_dir, out_dir, new_partitions=11)
    queries = _fixture_queries(store)
    rows = run_queries(out_dir, queries, concurrency=4, round_decimals=_ROUND).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_stemmed_topk(sf_dir: str) -> pa.Table:
    """Analyzer-chain search (ES ``stemmer: minimal_english``): a fresh
    index built with the ``code_stem`` chain over the INFLECTED corpus
    (every alternate token deterministically pluralized —
    ``sources/corpus.derive_inflected_corpus_parquet``) ranks the fixture
    queries IDENTICALLY to the plain index over the raw corpus: the stemmer
    collapses the inflection, so postings, stats and BM25 scores are
    bit-equal and this shares the ``bm25_topk`` oracle."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, run_queries
    from bitcoin_ledger_2es_ray.sources.corpus import derive_inflected_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key)
    corpus = derive_inflected_corpus_parquet(
        sf_dir, os.path.join(root, "corpus_inflected.parquet")
    )
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=os.path.join(root, "index_stem"),
        num_partitions=16,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=4,
        tokenizer="code_stem",
    )
    res = build_index(cfg)
    store = SegmentStore(res.out_dir)
    queries = _fixture_queries(store)
    rows = run_queries(res.out_dir, queries, concurrency=4, round_decimals=_ROUND).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_histogram_field(sf_dir: str) -> pa.Table:
    """ES ``histogram`` field type, build side: distributed pre-agg of the
    event stream into per-user histograms (exploded rows — the list-typed
    wire shape is pinned in tests)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_field

    return histogram_field(sf_dir, width=25.0)


def _q_histogram_percentiles(sf_dir: str) -> pa.Table:
    """ES ``percentiles`` over a histogram field: quantiles from the
    pre-aggregated histograms alone — raw events never re-read."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_percentiles

    return histogram_percentiles(sf_dir, width=25.0)


def _q_nested_inner_hits(sf_dir: str) -> pa.Table:
    """ES nested query + inner_hits: per matching parent order, the top-3
    matching lineitems by (quantity DESC, linenumber ASC)."""
    from bitcoin_ledger_2es_ray.pipelines.joins import nested_inner_hits

    return nested_inner_hits(sf_dir)


def _q_mixture_select(sf_dir: str) -> pa.Table:
    """Token-budgeted mixture execution: per-source budgets from the
    mixing_weights rule, longest-first fill-until-budget selection via the
    threshold plan (no per-source sort of the raw docs)."""
    from bitcoin_ledger_2es_ray.pipelines.curate import mixture_select

    return mixture_select(sf_dir, budget_total=25_000, alpha=0.5)


def _q_lg_batches(sf_dir: str) -> pa.Table:
    """Length-grouped vs arrival batching plan with per-batch padding
    waste — derived from dl value counts, no global sort."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import length_grouped_batches

    return length_grouped_batches(sf_dir, batch_size=64)


def _q_t5_spans(sf_dir: str) -> pa.Table:
    """T5 span-corruption examples: deterministic sentinel spans, input +
    target re-serialization fully vectorized."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import t5_span_corruption

    return t5_span_corruption(sf_dir)


def _q_fim_examples(sf_dir: str) -> pa.Table:
    """FIM (fill-in-the-middle) code-LLM examples: deterministic token-level
    prefix/middle/suffix cuts, PSM/SPM 50/50 by doc parity."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import fim_examples

    return fim_examples(sf_dir)


def _q_repo_pack(sf_dir: str) -> pa.Table:
    """Repo-context packing: per-repo path-ordered concatenation units,
    hash-compared via sha256 of the joined bytes."""
    from bitcoin_ledger_2es_ray.pipelines.curate import repo_pack

    return repo_pack(sf_dir)


def _q_ip_range(sf_dir: str) -> pa.Table:
    """ES ``ip_range``: event + distinct-client counts per /2 quarter of the
    IPv4 space, client IP hash-derived from user_id."""
    from bitcoin_ledger_2es_ray.pipelines.events import ip_range_agg

    return ip_range_agg(sf_dir)


def _q_query_string(sf_dir: str) -> pa.Table:
    """Full Lucene ``query_string`` syntax over 30 derived queries cycling
    four shapes: default-OR juxtaposition, +must with a boosted should,
    parenthesized OR with AND NOT, and an AND-ed dl range filter."""
    from bitcoin_ledger_2es_ray.pipelines.lucene import query_string_topk

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    qid, rank, doc, score = [], [], [], []
    for q in range(30):
        t1 = vocab[(3 * q + 1) % c]
        t2 = vocab[(11 * q + 5) % c]
        t3 = vocab[(17 * q + 2) % c]
        cls = q % 4
        if cls == 0:
            qs = f"{t1} {t2}"
        elif cls == 1:
            qs = f"+{t1} {t2}^2.5"
        elif cls == 2:
            qs = f"({t1} OR {t2}) AND NOT {t3}"
        else:
            qs = f"{t1} AND dl:[6 TO 48]"
        for r, (d, s) in enumerate(
            query_string_topk(store, qs, k=10, round_decimals=_ROUND), 1
        ):
            qid.append(q)
            rank.append(r)
            doc.append(d)
            score.append(s)
    return pa.table(
        {
            "query_id": pa.array(qid, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
            "doc_id": pa.array(doc, type=pa.int64()),
            "score": pa.array(score, type=pa.float64()),
        }
    )


def _q_bulk_apply(sf_dir: str) -> pa.Table:
    """ES ``_bulk`` op-type replay (index/create/update/delete with
    version conflicts) over the deterministic event-derived op log."""
    from bitcoin_ledger_2es_ray.pipelines.apis import bulk_apply

    return bulk_apply(sf_dir)


def _q_ip_prefix(sf_dir: str) -> pa.Table:
    """ES ``ip_prefix`` (8.x): event + distinct-client counts per /4
    network prefix of the hash-derived client IPv4."""
    from bitcoin_ledger_2es_ray.pipelines.events import ip_prefix_agg

    return ip_prefix_agg(sf_dir, prefix_length=4)


def _q_parent_id(sf_dir: str) -> pa.Table:
    """ES ``parent_id`` query: the lineitems of the 8th-smallest order key
    (bounded partial top-k derivation + predicate-pushdown child fetch)."""
    from bitcoin_ledger_2es_ray.pipelines.joins import parent_id_query

    return parent_id_query(sf_dir, parent_rank=8)


def _q_colbert_maxsim(sf_dir: str) -> pa.Table:
    """Late-interaction MaxSim retrieval over chunk-derived token vectors."""
    from bitcoin_ledger_2es_ray.pipelines.ann import colbert_maxsim

    return colbert_maxsim(sf_dir, n_queries=5, k=5, n_chunks=4)


def _q_terms_shard_error(sf_dir: str) -> pa.Table:
    """ES terms agg with shard_size truncation + doc_count_error_upper_bound."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_shard_error_agg

    return terms_shard_error_agg(sf_dir, n_shards=4, shard_size=5, size=10)


def _q_heavy_hitters(sf_dir: str) -> pa.Table:
    """Mergeable Misra-Gries heavy-hitters summary over the token stream —
    rows-only at the gate (estimates depend on the batch split; the
    guarantee invariants are pinned in pytest)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import heavy_hitters

    return heavy_hitters(sf_dir, k=8)


def _q_watcher_alerts(sf_dir: str) -> pa.Table:
    """ES Watcher: daily error-count watch, condition doc_count > 10 —
    every bucket with its trigger flag (the watch history)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import watcher_check

    return watcher_check(sf_dir, event_type="error", threshold=10)


def _q_latest_event(sf_dir: str) -> pa.Table:
    """ES ``latest`` transform: most recent event per user, mergeable
    per-batch argmax partials."""
    from bitcoin_ledger_2es_ray.pipelines.transform import latest_transform

    return latest_transform(sf_dir)


def _q_graph_explore(sf_dir: str) -> pa.Table:
    """ES x-pack _graph/explore, one hop: seed vocab terms → hit docs →
    strongest co-occurring vertices + seed→vertex edge weights."""
    from bitcoin_ledger_2es_ray.pipelines.apis import graph_explore

    return graph_explore(sf_dir, seed_ranks=(1, 7), size=8)


def _q_search_as_you_type(sf_dir: str) -> pa.Table:
    """ES ``search_as_you_type``: mid-typing queries (two consecutive tokens
    of doc (13q+7) mod n + the 2-char prefix of the next token) through
    multi_match bool_prefix over [field, field._2gram] — the _2gram shingle
    subfield derives from the positional index, no second index built."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.phrase import search_as_you_type_topk
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    store = SegmentStore(_index_pos_for(sf_dir).out_dir)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = docs["text"].to_pylist()
    n = len(texts)
    qid, rank, did, sc = [], [], [], []
    for q in range(_N_QUERIES):
        toks = texts[(13 * q + 7) % n].split(" ")
        j = q % (len(toks) - 2)
        w1, w2, p = toks[j], toks[j + 1], toks[j + 2][:2]
        hits = search_as_you_type_topk(
            store, f"{w1} {w2}", p, _TOP_K, round_decimals=_ROUND
        )
        for r, (d, s) in enumerate(hits, 1):
            qid.append(q)
            rank.append(r)
            did.append(d)
            sc.append(s)
    return pa.table(
        {
            "query_id": pa.array(qid, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
            "doc_id": pa.array(did, type=pa.int64()),
            "score": pa.array(sc, type=pa.float64()),
        }
    )


def _q_analyze_stem(sf_dir: str) -> pa.Table:
    """ES ``_analyze`` through the ``[whitespace, minimal_english stemmer]``
    chain over the deterministically inflected doc stream — every stemmer
    rule class fires and the oracle mirrors the full rule table."""
    from bitcoin_ledger_2es_ray.pipelines.apis import analyze_stemmed

    return analyze_stemmed(sf_dir)


def _fed_for(sf_dir: str):
    """Two member indices over a deterministic 1/3-2/3 corpus split (cached
    like _index_for; builds resume from their manifests)."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key + "_fed")
    os.makedirs(root, exist_ok=True)
    whole_path = derive_corpus_parquet(sf_dir, os.path.join(root, "all.parquet"))
    whole = pqm.read_table(whole_path)
    cut = whole.num_rows // 3
    outs = []
    for name, (lo, hi) in (("a", (0, cut)), ("b", (cut, whole.num_rows))):
        cdir = os.path.join(root, f"corpus_{name}")
        os.makedirs(cdir, exist_ok=True)
        part = os.path.join(cdir, f"{name}.parquet")
        if not os.path.exists(part):
            pqm.write_table(whole.slice(lo, hi - lo), part, row_group_size=512)
        cfg = BuildConfig(
            corpus=cdir,
            out_dir=os.path.join(root, f"idx_{name}"),
            num_partitions=8,
            head_df_ratio=0.5,
            n_salt=2,
            sketch_stride=4,
        )
        outs.append(build_index(cfg).out_dir)
    return outs


def _q_bm25_topk_federated(sf_dir: str) -> pa.Table:
    """ES cross-cluster search: the fixture query set over a FederatedStore
    of two doc-disjoint member indices (docBase offsets + dfs-style global
    stats, pipelines/federate.py) — gated against the SAME BM25 oracle as
    the single-index path because federation is bit-identical to the union
    build (tests/test_federate.py)."""
    from bitcoin_ledger_2es_ray.pipelines.federate import FederatedStore
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    fed = FederatedStore(_fed_for(sf_dir))
    queries = _fixture_queries(fed)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = score_query(fed, text, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_bm25_topk_routed(sf_dir: str) -> pa.Table:
    """Serving-path ROUTED scoring (segment actors decode + score their own
    slices; the router sums partial contributions) — gated against the same
    BM25 SQL oracle as the batch path: rank- and score-identical."""
    from bitcoin_ledger_2es_ray.pipelines.serve import TopKService

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    svc = TopKService(res.out_dir, num_actors=2)
    try:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text, k in zip(
            queries["query_id"].to_pylist(),
            queries["text"].to_pylist(),
            queries["k"].to_pylist(),
        ):
            for rank, (d, s) in enumerate(
                svc.query(text, k, mode="routed", round_decimals=_ROUND), start=1
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(d)
                scores.append(s)
    finally:
        svc.shutdown()
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _index_pos_for(sf_dir: str):
    """Positional index (BuildConfig.with_positions) cached beside the plain
    one — phrase queries need per-token positions (schemas.SEGMENT_POS)."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key)
    corpus = derive_corpus_parquet(sf_dir, os.path.join(root, "corpus.parquet"))
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=os.path.join(root, "index_pos"),
        num_partitions=16,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=4,
        with_positions=True,
    )
    return build_index(cfg)


def _index_masked_for(sf_dir: str):
    """Positional index over the token-REVERSED view of the corpus (the
    field_masking_span masked field) — position-aligned with the primary
    text field by construction (fields.derive_masked_corpus)."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.fields import derive_masked_corpus
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key)
    corpus = derive_corpus_parquet(sf_dir, os.path.join(root, "corpus.parquet"))
    masked = derive_masked_corpus(corpus, os.path.join(root, "corpus_masked"))
    cfg = BuildConfig(
        corpus=masked,
        out_dir=os.path.join(root, "index_masked_pos"),
        num_partitions=16,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=4,
        with_positions=True,
    )
    return build_index(cfg)


def _phrase_queries(sf_dir: str) -> pa.Table:
    """Deterministic 2-token phrase set (FIXTURES.md §C shape): query q takes
    tokens [q%7, q%7+1] of document (q*17) mod n_docs — mirrored exactly by
    the SQL oracle via list_extract over string_split."""
    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = docs["text"].to_pylist()
    n = len(texts)
    qids, phrases = [], []
    for q in range(_N_QUERIES):
        toks = texts[(q * 17) % n].split(" ")
        off = q % 7
        qids.append(q)
        phrases.append(" ".join(toks[off : off + 2]))
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.uint64()),
            "text": pa.array(phrases, type=pa.string()),
        }
    )


def _q_phrase_match(sf_dir: str) -> pa.Table:
    """Positional phrase match (pipelines/phrase.py) over the distributed
    MatchScorer pool — ES ``match_phrase`` analog."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import run_match_queries

    res = _index_pos_for(sf_dir)
    rows = run_match_queries(
        res.out_dir, _phrase_queries(sf_dir), mode="phrase", concurrency=4
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_phrase_topk(sf_dir: str) -> pa.Table:
    """BM25-scored phrase results (ES match_phrase scoring: positions filter
    docs, the phrase's terms score them with full-corpus idf)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import run_match_queries

    res = _index_pos_for(sf_dir)
    rows = run_match_queries(
        res.out_dir,
        _phrase_queries(sf_dir),
        mode="phrase_topk",
        concurrency=4,
        k=_TOP_K,
        round_decimals=_ROUND,
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_prefix_match(sf_dir: str) -> pa.Table:
    """Dictionary range scan (TermDict.terms_with_prefix) → posting union;
    prefix q is the first 3 chars of vocab term (13q+7) mod |vocab| in
    sorted order — mirrored by the SQL oracle's vocab CTE."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import prefix_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        prefix = vocab[(13 * q + 7) % len(vocab)][:3]
        hits = prefix_match(store, prefix)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _bool_sets(sf_dir: str):
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    store, _ = _store_for(sf_dir)
    qterms = fixture_query_terms(sorted(store.df), n=_N_QUERIES)
    for qid, terms in enumerate(qterms):
        sets = [np.sort(store.postings(t)[0]) for t in set(terms)]
        yield qid, sets


def _q_boolean_and(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.functions.boolean import intersect_many

    qids, docs = [], []
    for qid, sets in _bool_sets(sf_dir):
        hits = np.sort(intersect_many(sets))
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table(
        {"query_id": pa.array(qids, type=pa.int64()), "doc_id": pa.array(docs, type=pa.int64())}
    )


def _q_boolean_or(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.functions.boolean import union_many

    qids, docs = [], []
    for qid, sets in _bool_sets(sf_dir):
        hits = union_many(sets)
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table(
        {"query_id": pa.array(qids, type=pa.int64()), "doc_id": pa.array(docs, type=pa.int64())}
    )


def _q_boolean_not(sf_dir: str) -> pa.Table:
    """Docs containing the query's FIRST term but none of the later terms
    (C6 NOT/difference) — multi-term fixture queries only."""
    from bitcoin_ledger_2es_ray.functions.boolean import difference, union_many
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    store, _ = _store_for(sf_dir)
    qterms = fixture_query_terms(sorted(store.df), n=_N_QUERIES)
    qids, docs = [], []
    for qid, terms in enumerate(qterms):
        terms = sorted(set(terms))  # "first" = alphabetically first (SQL mirror)
        if len(terms) < 2:
            continue
        pos = np.sort(store.postings(terms[0])[0])
        neg = union_many([np.sort(store.postings(t)[0]) for t in terms[1:]])
        hits = np.sort(difference(pos, neg))
        qids.extend([qid] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {"query_id": pa.array(qids, type=pa.int64()), "doc_id": pa.array(docs, type=pa.int64())}
    )


def _q_terms_set(sf_dir: str) -> pa.Table:
    """ES ``terms_set`` with ``minimum_should_match_field``: docs matching
    ≥ M of the query's distinct terms, M = min(N, 1 + n_chars % N) off the
    per-doc n_chars field."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.structured import terms_set_match
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    store, _ = _store_for(sf_dir)
    dv = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    ).sort_by("doc_id")
    doc_ids = np.asarray(dv["doc_id"], dtype=np.int64)
    nchars = np.asarray(dv["n_chars"], dtype=np.int64)
    qterms = fixture_query_terms(sorted(store.df), n=_N_QUERIES)
    qids, docs, matched, req = [], [], [], []
    for qid, terms in enumerate(qterms):
        d, m, r = terms_set_match(store, terms, doc_ids, nchars)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
        matched.extend(m.tolist())
        req.extend(r.tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "n_matched": pa.array(matched, type=pa.int64()),
            "required": pa.array(req, type=pa.int64()),
        }
    )


def _q_fuzzy_match(sf_dir: str) -> pa.Table:
    """ES ``fuzzy`` analog: vectorized Levenshtein dictionary scan
    (functions/editdist.py) → posting union.  Query q deletes character
    (q mod len) from vocab term (11q+3) mod |V| — mirrored by the oracle's
    substr arithmetic; match = any token within edit distance 1."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        t = vocab[(11 * q + 3) % len(vocab)]
        p = q % len(t)
        qterm = t[:p] + t[p + 1 :] if len(t) > 1 else t
        hits = fuzzy_match(store, qterm, max_dist=1)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_fuzzy_transpositions(sf_dir: str) -> pa.Table:
    """ES ``fuzzy`` with fuzzy_transpositions (the ES default): true
    Damerau-Levenshtein dictionary scan.  Query q SWAPS adjacent characters
    (p, p+1), p = q mod (len-1), of vocab term (11q+3) mod |V| — distance 1
    under Damerau but 2 under plain Levenshtein whenever the swapped
    characters differ, so this query discriminates the kernels."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        t = vocab[(11 * q + 3) % len(vocab)]
        if len(t) > 1:
            p = q % (len(t) - 1)
            qterm = t[:p] + t[p + 1] + t[p] + t[p + 2 :]
        else:
            qterm = t
        hits = fuzzy_match(store, qterm, max_dist=1, transpositions=True)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_term_suggest(sf_dir: str) -> pa.Table:
    """ES term suggester: top-3 corrections for the fuzzy_match misspellings,
    ranked (distance ASC, df DESC, term ASC)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import term_suggest

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, poss, terms, dists, dfs = [], [], [], [], []
    for q in range(_N_QUERIES):
        t = vocab[(11 * q + 3) % len(vocab)]
        p = q % len(t)
        qterm = t[:p] + t[p + 1 :] if len(t) > 1 else t
        for pos, (term, dist, df) in enumerate(
            term_suggest(store, qterm, k=3, max_dist=2), start=1
        ):
            qids.append(q)
            poss.append(pos)
            terms.append(term)
            dists.append(dist)
            dfs.append(df)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            "distance": pa.array(dists, type=pa.int64()),
            "df": pa.array(dfs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("pos", "ascending")])


def _q_phrase_suggest(sf_dir: str) -> pa.Table:
    """ES phrase suggester: two-slot phrases (w1 clean, w2 corrupted by the
    term-suggest deletion scheme), top-3 corrections ranked (Σ edit ASC,
    bigram count DESC, cf product DESC, phrase ASC)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_suggest

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    nv = len(vocab)
    qs = []
    for q in range(_N_QUERIES):
        w1 = vocab[(11 * q + 3) % nv]
        t = vocab[(17 * q + 5) % nv]
        p = q % len(t)
        w2 = t[:p] + t[p + 1 :] if len(t) > 1 else t
        qs.append((q, w1, w2))
    return phrase_suggest(store, sf_dir, qs, k=3, max_dist=1)


def _q_phrase_slop(sf_dir: str) -> pa.Table:
    """ES ``match_phrase`` with ``slop=2`` (chained-gap semantics): the
    phrase fixture set over the positional index, adjacent-slot distance
    in [1, 3]."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match_slop
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    phrases = _phrase_queries(sf_dir)
    qids, docs = [], []
    for qid, text in zip(phrases["query_id"].to_pylist(), phrases["text"].to_pylist()):
        hits = phrase_match_slop(store, text, slop=2)
        qids.extend([qid] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_rescore(sf_dir: str) -> pa.Table:
    """ES ``rescore``: top-20 window of the base (phrase-terms) BM25 match
    re-ranked by 1.0·base + 2.0·phrase_score (score_mode=total; a
    phrase-matching doc's rescore score IS its base score), top-10 out."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import rescore_topk
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    phrases = _phrase_queries(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(phrases["query_id"].to_pylist(), phrases["text"].to_pylist()):
        top = rescore_topk(store, text, k=_TOP_K, window=20, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_terms_enum(sf_dir: str) -> pa.Table:
    """ES ``_terms_enum`` API: every vocab term with the 1-char prefix of
    vocab term 20 mod |V|, drained in pages of 4 via the search_after
    cursor — (page, term) rows prove the pages tile the full match set."""
    from bitcoin_ledger_2es_ray.pipelines.apis import terms_enum

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    prefix = vocab[20 % len(vocab)][:1]
    pages, terms = [], []
    after, page = None, 0
    while True:
        batch = terms_enum(store, prefix, size=4, search_after=after)
        for t in batch:
            pages.append(page)
            terms.append(t)
        if len(batch) < 4:
            break
        after = batch[-1]
        page += 1
    return pa.table(
        {
            "page": pa.array(pages, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
        }
    )


def _q_completion_contexts(sf_dir: str) -> pa.Table:
    """ES completion suggester with contexts: the same 3-char prefixes,
    popularity-ranked WITHIN a cycling lang context."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        build_context_popularity,
        completion_contexts,
    )

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    pop = build_context_popularity(sf_dir)
    langs = ["en", "de", "fr", "es", "zh"]
    qids, poss, terms, dfs = [], [], [], []
    for q in range(_N_QUERIES):
        prefix = vocab[(11 * q + 3) % len(vocab)][:3]
        lang = langs[q % 5]
        for pos, (term, df) in enumerate(
            completion_contexts(pop, prefix, lang, k=5), start=1
        ):
            qids.append(q)
            poss.append(pos)
            terms.append(term)
            dfs.append(df)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(dfs, type=pa.int64()),
        }
    )


def _q_completion_suggest(sf_dir: str) -> pa.Table:
    """ES completion suggester: top-5 dictionary completions of the first
    3 chars of vocab term (11q+3) mod |V|, ranked (df DESC, term ASC)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import completion_suggest

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, poss, terms, dfs = [], [], [], []
    for q in range(_N_QUERIES):
        prefix = vocab[(11 * q + 3) % len(vocab)][:3]
        for pos, (term, df) in enumerate(
            completion_suggest(store, prefix, k=5), start=1
        ):
            qids.append(q)
            poss.append(pos)
            terms.append(term)
            dfs.append(df)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(dfs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("pos", "ascending")])


def _q_terms_agg(sf_dir: str) -> pa.Table:
    """ES ``terms`` aggregation: per-query AND-hit counts bucketed by lang —
    partial buckets inside map_batches over the forward map, driver combine
    bounded by #queries × #langs (pipelines/aggs.py)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_agg

    _, res = _store_for(sf_dir)
    return terms_agg(res.out_dir, _q_boolean_and(sf_dir), field="lang")


def _q_histogram_agg(sf_dir: str) -> pa.Table:
    """ES ``histogram`` aggregation over doc length (interval 16) on the
    same AND-hit sets."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_agg

    _, res = _store_for(sf_dir)
    return histogram_agg(res.out_dir, _q_boolean_and(sf_dir), interval=16)


def _q_analyze(sf_dir: str) -> pa.Table:
    """ES ``_analyze`` API: the indexed token stream (pos, token) for the
    text of document (29q mod n) — the same tokenizer the build uses, so the
    oracle's whitespace split IS the parity check."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.apis import analyze_texts

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = docs["text"].to_pylist()
    n = len(texts)
    queries = pa.table(
        {
            "query_id": pa.array(list(range(_N_QUERIES)), type=pa.uint64()),
            "text": pa.array([texts[(29 * q) % n] for q in range(_N_QUERIES)]),
        }
    )
    out = analyze_texts(queries)
    return pa.table(
        {
            "query_id": out["query_id"].cast(pa.int64()),
            "pos": out["pos"],
            "token": out["token"],
        }
    )


def _q_analyze_stop(sf_dir: str) -> pa.Table:
    """ES ``_analyze`` with the ``stop`` token filter: the same fixture
    texts as ``analyze``, stopwords dropped with their POSITION GAPS
    preserved (ES keeps ordinals so phrases don't collapse)
    (`functions/tokenize.py: stop_filtered`)."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.apis import analyze_texts

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = docs["text"].to_pylist()
    n = len(texts)
    queries = pa.table(
        {
            "query_id": pa.array(list(range(_N_QUERIES)), type=pa.uint64()),
            "text": pa.array([texts[(29 * q) % n] for q in range(_N_QUERIES)]),
        }
    )
    out = analyze_texts(queries, tokenizer="code_stop")
    return pa.table(
        {
            "query_id": out["query_id"].cast(pa.int64()),
            "pos": out["pos"],
            "token": out["token"],
        }
    )


def _q_term_vectors(sf_dir: str) -> pa.Table:
    """ES ``_termvectors`` (term_statistics=true) for docs (31q+2) mod n:
    tf by row-group-pruned re-analysis, df from the pruned dictionary."""
    from bitcoin_ledger_2es_ray.pipelines.apis import term_vectors
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    store, res = _store_for(sf_dir)
    key = sf_dir.strip("/").replace("/", "_")
    corpus = derive_corpus_parquet(
        sf_dir, os.path.join(_CACHE_ROOT, key, "corpus.parquet")
    )
    n = res.n_docs
    ids = sorted({(31 * q + 2) % n for q in range(_N_QUERIES)})
    return term_vectors(store, corpus, ids)


def _q_rare_terms(sf_dir: str) -> pa.Table:
    """ES ``rare_terms`` aggregation: the df ≤ 100 long tail of the term
    dictionary — a vocabulary-bounded Ray groupby, never a corpus scan (the
    synthetic corpus plants one genuinely rare term; 100 keeps the gate
    non-empty at sf0.01 where the common terms sit at df ≈ 380)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import rare_terms_agg

    _, res = _store_for(sf_dir)
    return rare_terms_agg(res.out_dir, max_doc_count=100)


def _q_multi_terms(sf_dir: str) -> pa.Table:
    """ES ``multi_terms`` aggregation: AND-hit counts bucketed by the
    composite (lang, repo) key — broadcast hits, streamed forward map."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import multi_terms_agg

    _, res = _store_for(sf_dir)
    return multi_terms_agg(res.out_dir, _q_boolean_and(sf_dir), fields=("lang", "repo"))


def _q_weighted_avg(sf_dir: str) -> pa.Table:
    """ES ``weighted_avg``: per-lang n_chars weighted by token count —
    shuffle-free (lang, Σvw, Σw) combiner partials."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import weighted_avg_agg

    return weighted_avg_agg(sf_dir, round_decimals=_ROUND)


def _q_mad_dl(sf_dir: str) -> pa.Table:
    """ES ``median_absolute_deviation`` over doc length per lang, EXACT via
    the (lang, dl) value-counts plan."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import mad_agg

    _, res = _store_for(sf_dir)
    return mad_agg(res.out_dir, round_decimals=_ROUND)


def _q_range_agg(sf_dir: str) -> pa.Table:
    """ES ``range`` aggregation over doc length (cut at 16/48, ES
    from-inclusive/to-exclusive, ``*-16``-style labels) on the AND-hit
    sets — same partial-bucket plan as histogram."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import range_agg

    _, res = _store_for(sf_dir)
    return range_agg(res.out_dir, _q_boolean_and(sf_dir), edges=(16, 48))


def _q_adjacency_matrix(sf_dir: str) -> pa.Table:
    """ES ``adjacency_matrix``: each fixture query's distinct terms as
    named filters — per-filter doc counts plus every non-empty pairwise
    intersection, keyed ``a`` / ``a&b``."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import adjacency_matrix_agg
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    mt = [
        (qid, sorted(set(tokenize_query(text))))
        for qid, text in zip(
            queries["query_id"].to_pylist(), queries["text"].to_pylist()
        )
    ]
    return adjacency_matrix_agg(store, mt)


def _q_extended_stats(sf_dir: str) -> pa.Table:
    """ES ``extended_stats`` over doc length: exact int64 moment partials
    (n, min, max, sum, sum_sq) streamed off the forward map, population
    variance/std derived on the driver."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import extended_stats_agg

    _, res = _store_for(sf_dir)
    return extended_stats_agg(res.out_dir, round_decimals=_ROUND)


def _q_matrix_stats(sf_dir: str) -> pa.Table:
    """ES ``matrix_stats`` over (value, user_id) on the events table:
    per-batch co-moment partials (n, Σx, Σy, Σxx, Σyy, Σxy) merged by
    summation on the driver — covariance/correlation with no shuffle."""
    from bitcoin_ledger_2es_ray.pipelines.events import matrix_stats

    return matrix_stats(sf_dir, fields=("value", "user_id"), round_decimals=_ROUND)


def _q_terms_stats_agg(sf_dir: str) -> pa.Table:
    """ES sub-aggregation: terms bucket (lang) × stats metric (dl) over the
    AND-hit sets — mergeable partials, driver combine."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_stats_agg

    _, res = _store_for(sf_dir)
    return terms_stats_agg(res.out_dir, _q_boolean_and(sf_dir), field="lang")


def _q_terms_order_metric(sf_dir: str) -> pa.Table:
    """ES terms agg ordered by a sub-agg metric: top-3 lang buckets per
    query by (avg_dl DESC, key ASC) — the rank is the verified output."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_ordered_by_metric

    _, res = _store_for(sf_dir)
    return terms_ordered_by_metric(
        res.out_dir, _q_boolean_and(sf_dir), field="lang", size=3
    )


def _q_sig_terms(sf_dir: str) -> pa.Table:
    """ES ``significant_terms``: per-query AND-hit foregrounds vs the corpus
    background, JLH-scored, top-10 positively-significant terms — the hit
    set broadcasts, the postings artifact streams (pipelines/aggs.py)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms

    store, res = _store_for(sf_dir)
    return significant_terms(
        res.out_dir, store, _q_boolean_and(sf_dir), n_top=10, round_decimals=_ROUND
    )


def _q_sig_terms_chi2(sf_dir: str) -> pa.Table:
    """significant_terms with ES's chi_square heuristic over the same
    AND-hit foregrounds (include_negatives=false)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms

    store, res = _store_for(sf_dir)
    return significant_terms(
        res.out_dir, store, _q_boolean_and(sf_dir), n_top=10,
        round_decimals=_ROUND, heuristic="chi_square",
    )


def _q_significant_text(sf_dir: str) -> pa.Table:
    """ES ``significant_text``: JLH-significant terms from RE-ANALYZED hit
    doc text with filter_duplicate_text (exact dupes collapse before
    counting) — foreground never touches the index."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_text
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    store, res = _store_for(sf_dir)
    key = sf_dir.strip("/").replace("/", "_")
    corpus = derive_corpus_parquet(
        sf_dir, os.path.join(_CACHE_ROOT, key, "corpus.parquet")
    )
    return significant_text(
        corpus, store, _q_boolean_and(sf_dir), n_top=10, round_decimals=_ROUND
    )


def _q_composite_page2(sf_dir: str) -> pa.Table:
    """ES ``composite`` aggregation: the SECOND 7-bucket page over
    (lang, dl//16·16), resumed from page 1's last key — stateless
    after-cursor, pages tile the full bucket stream."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import composite_agg

    _, res = _store_for(sf_dir)
    page1 = composite_agg(res.out_dir, interval=16, size=7)
    after = (
        page1["lang"][-1].as_py(),
        page1["bucket"][-1].as_py(),
    )
    return composite_agg(res.out_dir, interval=16, after=after, size=7)


def _q_percentiles(sf_dir: str) -> pa.Table:
    """ES ``percentiles`` agg over doc length — exact value-counts plan
    (shuffle bounded by distinct dl values), quantile_cont interpolation."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentiles_agg

    _, res = _store_for(sf_dir)
    return percentiles_agg(res.out_dir)


def _q_distinct_counts(sf_dir: str) -> pa.Table:
    """Exact distinct counts (ES ``cardinality`` agg, exact gate): one Ray
    Data groupby per column over the events table."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import distinct_count

    return distinct_count(
        os.path.join(sf_dir, "events.parquet"), ["user_id", "event_type"]
    )


def _q_cardinality_hll(sf_dir: str) -> pa.Table:
    """ES ``cardinality`` agg, the scale path: HyperLogLog sketch of
    events.user_id — 16-KiB mergeable partials per batch, no value shuffle.
    Rows-only (approximate by design, like ES); accuracy is pinned by
    tests/test_sketch.py (relative error bound + merge associativity)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import cardinality_hll

    r = cardinality_hll(os.path.join(sf_dir, "events.parquet"), "user_id")
    return pa.table(
        {
            "column": pa.array(["user_id"], type=pa.string()),
            "estimate": pa.array([r["estimate"]], type=pa.float64()),
            "p": pa.array([r["p"]], type=pa.int64()),
        }
    )


def _q_mlt_unlike(sf_dir: str) -> pa.Table:
    """more_like_this with an `unlike` negative example: its terms drop
    from the candidate set before the tf·idf cutoff, both docs excluded."""
    from bitcoin_ledger_2es_ray.pipelines.mlt import more_like_this_unlike

    store, res = _store_for(sf_dir)
    n = store.n_docs
    qids, ranks, docs, scores = [], [], [], []
    for q in range(_N_QUERIES):
        src = (q * 29) % n
        unlike = (q * 31 + 1) % n
        if unlike == src:
            unlike = (unlike + 1) % n
        top = more_like_this_unlike(
            store, res.out_dir, src, unlike, n_terms=5, k=_TOP_K,
            round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(q)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _q_more_like_this(sf_dir: str) -> pa.Table:
    """ES ``more_like_this``: top-5 tf·idf terms of source doc (q·29 mod n)
    → BM25 top-k with the source excluded, over the MltScorer actor pool."""
    from bitcoin_ledger_2es_ray.pipelines.mlt import run_mlt_queries

    store, res = _store_for(sf_dir)
    n = store.n_docs
    srcs = pa.table(
        {
            "query_id": pa.array(range(_N_QUERIES), type=pa.uint64()),
            "src_doc": pa.array([(q * 29) % n for q in range(_N_QUERIES)], type=pa.uint64()),
        }
    )
    rows = run_mlt_queries(
        res.out_dir, srcs, n_terms=5, k=_TOP_K, concurrency=4, round_decimals=_ROUND
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_terms_lookup(sf_dir: str) -> pa.Table:
    """ES ``terms`` query with terms lookup: term list = the 5 RAREST
    (df ASC, term ASC) terms of lookup doc (q·23+3 mod n); hits = docs
    containing any (constant-score filter context → (query_id, doc_id))."""
    from bitcoin_ledger_2es_ray.pipelines.mlt import terms_lookup_match

    store, res = _store_for(sf_dir)
    n = store.n_docs
    qids, docs = [], []
    for q in range(_N_QUERIES):
        _, hits = terms_lookup_match(store, res.out_dir, (q * 23 + 3) % n, n_terms=5)
        qids.extend([q] * len(hits))
        docs.extend(int(d) for d in hits)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_search_after(sf_dir: str) -> pa.Table:
    """ES ``search_after`` cursor pagination: page 2 (ranks k+1..2k) of each
    fixture query, fetched strictly through page 1's last (score, doc_id)
    cursor — no scroll state."""
    from bitcoin_ledger_2es_ray.pipelines.query import search_after

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        page1 = search_after(store, text, _TOP_K, None, round_decimals=_ROUND)
        if len(page1) < _TOP_K:
            continue
        cursor = page1[-1]
        d0, s0 = cursor[0], cursor[1]
        page2 = search_after(store, text, _TOP_K, (s0, d0), round_decimals=_ROUND)
        for i, (d, s) in enumerate(page2):
            qids.append(qid)
            ranks.append(_TOP_K + 1 + i)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_min_should_match(sf_dir: str) -> pa.Table:
    """ES bool ``should`` + ``minimum_should_match``: query q requires
    m = 1 + (q mod nt) of its nt fixture terms — one unique-with-counts
    pass over the per-term doc sets (pipelines/structured.py)."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import min_should_match

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, docs = [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        nt = len(set(tokenize_query(text)))
        m = 1 + (qid % nt)
        hits = min_should_match(store, text, m)
        qids.extend([qid] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_range_topk(sf_dir: str) -> pa.Table:
    """ES bool must-match + ``filter: {range: {dl: ...}}``: BM25 top-k with
    the dl window [4*(q mod 6), +24] masked per posting list before the
    taat accumulation — scores stay corpus-global (filter context)."""
    from bitcoin_ledger_2es_ray.pipelines.structured import range_filtered_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        lo = 4 * (qid % 6)
        hi = lo + 24
        top = range_filtered_topk(store, text, _TOP_K, lo, hi, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_sort_by_dl(sf_dir: str) -> pa.Table:
    """ES sort-by-doc-value: OR-match set ordered by (dl DESC, doc ASC),
    top-k — dl read inline off the posting arrays, no forward-map join."""
    from bitcoin_ledger_2es_ray.pipelines.structured import sort_by_field_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, dls = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = sort_by_field_topk(store, text, _TOP_K, descending=True)
        for r, (d, dl) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            dls.append(dl)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "dl": pa.array(dls, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_wildcard_match(sf_dir: str) -> pa.Table:
    """ES ``wildcard`` query: pattern q = first two chars + '*' + last char
    of vocab[(17q+5) mod |V|] — dictionary prefix-range scan filtered by the
    compiled pattern, matched terms' doc-sets unioned, distributed over the
    MatchScorer pool."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import run_match_queries

    store, res = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, pats = [], []
    for q in range(_N_QUERIES):
        t = vocab[(17 * q + 5) % len(vocab)]
        qids.append(q)
        pats.append(t[:2] + "*" + t[-1])
    queries = pa.table(
        {
            "query_id": pa.array(qids, type=pa.uint64()),
            "text": pa.array(pats, type=pa.string()),
        }
    )
    rows = run_match_queries(
        res.out_dir, queries, mode="wildcard", concurrency=4
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_regexp_match(sf_dir: str) -> pa.Table:
    """ES ``regexp`` query: pattern q = first char + '.*' + last char of
    vocab[(19q+3) mod |V|], anchored full-term match over the dictionary
    (prefix-pruned range scan), matched terms' doc-sets unioned."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import regexp_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        t = vocab[(19 * q + 3) % len(vocab)]
        pattern = t[0] + ".*" + t[-1]
        hits = regexp_match(store, pattern)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_dis_max(sf_dir: str) -> pa.Table:
    """ES ``dis_max``: each fixture query's sorted terms split into
    even/odd sub-queries, combined per doc as max + 0.3·(sum − max),
    ranked on the rounded score."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import dis_max_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(tokenize_query(text)))
        texts = [t for t in (" ".join(terms[0::2]), " ".join(terms[1::2])) if t]
        top = dis_max_topk(store, texts, _TOP_K, tie_breaker=0.3, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_boosting(sf_dir: str) -> pa.Table:
    """ES ``boosting`` query: positive = the fixture query, negative term =
    vocab[(11q+2) mod |V|], negative_boost 0.5 — negative matches demoted,
    never excluded."""
    from bitcoin_ledger_2es_ray.pipelines.structured import boosting_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        neg = vocab[(11 * qid + 2) % len(vocab)]
        top = boosting_topk(
            store, text, neg, _TOP_K, negative_boost=0.5, round_decimals=_ROUND
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _path_store_for(sf_dir: str):
    """Second-field (path) index: field-swapped corpus + standard build,
    cached beside the content index; docIDs align by construction
    (pipelines/fields.py)."""
    from bitcoin_ledger_2es_ray.pipelines.fields import build_field_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.sources.corpus import derive_corpus_parquet

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key)
    corpus = derive_corpus_parquet(sf_dir, os.path.join(root, "corpus.parquet"))
    res = build_field_index(
        corpus,
        "path",
        os.path.join(root, "fields"),
        num_partitions=8,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=4,
    )
    return SegmentStore(res.out_dir)


def _q_multi_match(sf_dir: str) -> pa.Table:
    """ES ``multi_match`` (most_fields) over content¹·⁰ + path²·⁰: query q
    = the fixture text plus the digit token (17q mod N) — the path leg
    scores it against the path index's own df/avgdl, the content leg
    ignores it (df 0), and the boosted per-field scores sum per doc."""
    from bitcoin_ledger_2es_ray.pipelines.fields import multi_match_topk

    store, _ = _store_for(sf_dir)
    path_store = _path_store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        text2 = f"{text} {(qid * 17) % store.n_docs}"
        top = multi_match_topk(
            [(store, 1.0), (path_store, 2.0)],
            text2,
            _TOP_K,
            mode="most_fields",
            round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_combined_fields(sf_dir: str) -> pa.Table:
    """ES ``combined_fields`` (Lucene CombinedFieldQuery / BM25F): content¹·⁰
    + path²·⁰ merged into one pseudo-field — weighted tf/dl sums, max df,
    one BM25 pass."""
    from bitcoin_ledger_2es_ray.pipelines.fields import (
        combined_dl,
        combined_fields_topk,
    )

    store, _ = _store_for(sf_dir)
    path_store = _path_store_for(sf_dir)
    queries = _fixture_queries(store)
    legs = [(store, 1.0), (path_store, 2.0)]
    cache = combined_dl(legs)  # query-independent: one forward-map read
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        text2 = f"{text} {(qid * 17) % store.n_docs}"
        top = combined_fields_topk(
            legs, text2, _TOP_K, round_decimals=_ROUND, dl_cache=cache
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_dup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup connected components over the exact-Jaccard pair graph:
    (doc_id, cluster_id = component min) for every doc in ≥ 1 pair."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import dup_clusters

    return dup_clusters(sf_dir, k=3, tau=0.8)


def _q_multi_match_cross(sf_dir: str) -> pa.Table:
    """ES ``multi_match`` cross_fields (term-centric): each term counts
    once at its strongest (boosted) field; per-term maxima sum per doc."""
    from bitcoin_ledger_2es_ray.pipelines.fields import multi_match_topk

    store, _ = _store_for(sf_dir)
    path_store = _path_store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        text2 = f"{text} {(qid * 17) % store.n_docs}"
        top = multi_match_topk(
            [(store, 1.0), (path_store, 2.0)],
            text2,
            _TOP_K,
            mode="cross_fields",
            round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_bool_query(sf_dir: str) -> pa.Table:
    """The full ES ``bool`` query: first fixture term must, the rest
    should (msm = q mod 2 when any), must_not = vocab[(7q+1) mod |V|]
    unless it collides with the query's own terms, filter dl ∈ [6, 48]."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import bool_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        ts = sorted(set(tokenize_query(text)))
        must, should = (ts[0],), tuple(ts[1:])
        msm = qid % 2 if should else 0
        neg = vocab[(7 * qid + 1) % len(vocab)]
        must_not = () if neg in ts else (neg,)
        top = bool_topk(
            store,
            must=must,
            should=should,
            must_not=must_not,
            k=_TOP_K,
            dl_lo=6,
            dl_hi=48,
            minimum_should_match=msm,
            round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_wrapper(sf_dir: str) -> pa.Table:
    """ES ``wrapper`` query: the bool fixture of `_q_bool_query` (with
    msm = (q+1) mod 2 and filter dl ∈ [4, 40]) serialized to JSON,
    base64-encoded, and executed through the decode-and-dispatch path
    (`structured.wrapper_query`)."""
    import base64
    import json

    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import wrapper_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        ts = sorted(set(tokenize_query(text)))
        must, should = ts[:1], ts[1:]
        neg = vocab[(7 * qid + 1) % len(vocab)]
        body = {
            "bool": {
                "must": [{"term": {"text": t}} for t in must],
                "should": [{"term": {"text": t}} for t in should],
                "must_not": [] if neg in ts else [{"term": {"text": neg}}],
                "minimum_should_match": (qid + 1) % 2 if should else 0,
                "filter": [{"range": {"dl": {"gte": 4, "lte": 40}}}],
            }
        }
        enc = base64.b64encode(json.dumps(body).encode("utf-8")).decode("ascii")
        top = wrapper_query(store, enc, k=_TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_synonym_topk(sf_dir: str) -> pa.Table:
    """Lucene SynonymQuery: term i of query q expands with synonym
    vocab[(13q+5+3i) mod |V|]; each group scores as one pseudo-term
    (tf summed, df = max member df)."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import synonym_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        ts = sorted(set(tokenize_query(text)))
        groups = [
            [t, vocab[(13 * qid + 5 + 3 * i) % len(vocab)]]
            for i, t in enumerate(ts)
        ]
        top = synonym_topk(store, groups, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_highlight_frags(sf_dir: str) -> pa.Table:
    """ES highlight with number_of_fragments=2: the first two occurrences
    of vocab[(17q+5) mod |V|] per doc, each with its ±3 window."""
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import highlight_fragments

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    qids, docs, ranks, poss, los, his = [], [], [], [], [], []
    for q in range(_N_QUERIES):
        term = vocab[(17 * q + 5) % len(vocab)]
        for d, r, p, lo, hi in highlight_fragments(store, term, n_frags=2, width=3):
            qids.append(q)
            docs.append(d)
            ranks.append(r)
            poss.append(p)
            los.append(lo)
            his.append(hi)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "frag_rank": pa.array(ranks, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "snip_start": pa.array(los, type=pa.int64()),
            "snip_end": pa.array(his, type=pa.int64()),
        }
    )


def _q_highlight(sf_dir: str) -> pa.Table:
    """ES ``highlight`` (deterministic core): single term
    vocab[(17q+5) mod |V|] per query; per matching doc the first occurrence
    position + the ±3-token window, off the positional index."""
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import highlight_first

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    qids, docs, poss, los, his = [], [], [], [], []
    for q in range(_N_QUERIES):
        term = vocab[(17 * q + 5) % len(vocab)]
        for d, p, lo, hi in highlight_first(store, term, width=3):
            qids.append(q)
            docs.append(d)
            poss.append(p)
            los.append(lo)
            his.append(hi)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "first_pos": pa.array(poss, type=pa.int64()),
            "snip_start": pa.array(los, type=pa.int64()),
            "snip_end": pa.array(his, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_span_first(sf_dir: str) -> pa.Table:
    """ES ``span_first``: term vocab[(23q+1) mod |V|] within the first
    1 + (q mod 8) positions — off the positional index."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_first_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        term = vocab[(23 * q + 1) % len(vocab)]
        end = 1 + q % 8
        hits = span_first_match(store, term, end)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _span_triples(sf_dir: str) -> list[tuple[int, str, str, str]]:
    """Deterministic span triples: query q takes doc (23q mod n), offset
    q mod 5 — big clause = tokens [off, off+2] (ordered, gap ≤ 3), little =
    token off+1 (guaranteed inside, so every query has ≥1 hit).  Mirrored
    exactly by the SQL oracles; min doc length is 10 tokens so off+2 ≤ 6
    is always in range."""
    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    texts = docs["text"].to_pylist()
    n = len(texts)
    out = []
    for q in range(_N_QUERIES):
        w = texts[(23 * q) % n].split(" ")
        off = q % 5
        out.append((q, w[off], w[off + 2], w[off + 1]))
    return out


def _q_span_containing(sf_dir: str) -> pa.Table:
    """ES ``span_containing``: big = ordered [t1 … t2] within gap 3, little
    = t3; per doc the count of distinct containing big spans."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_containing_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    qids, docs, ns = [], [], []
    for q, t1, t2, t3 in _span_triples(sf_dir):
        t = span_containing_match(store, t1, t2, t3, gap=3)
        qids.extend([q] * t.num_rows)
        docs.extend(t["doc_id"].to_pylist())
        ns.extend(t["n"].to_pylist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "n": pa.array(ns, type=pa.int64()),
        }
    )


def _q_span_within(sf_dir: str) -> pa.Table:
    """ES ``span_within``: same big/little fixture, but the LITTLE spans
    are the output — per doc the count of distinct covered little
    positions (differs from span_containing exactly when spans overlap)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_within_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    qids, docs, ns = [], [], []
    for q, t1, t2, t3 in _span_triples(sf_dir):
        t = span_within_match(store, t1, t2, t3, gap=3)
        qids.extend([q] * t.num_rows)
        docs.extend(t["doc_id"].to_pylist())
        ns.extend(t["n"].to_pylist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "n": pa.array(ns, type=pa.int64()),
        }
    )


def _q_span_multi(sf_dir: str) -> pa.Table:
    """ES ``span_multi``: the 3-char-prefix wildcard of t_off, dictionary-
    rewritten into a span_or clause within the unordered slop-2 window of
    t_off+1."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_multi_near_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    qids, docs = [], []
    for q, t1, _t3, t2 in _span_triples(sf_dir):
        hits = span_multi_near_match(store, t1[:3] + "*", t2, slop=2)
        qids.extend([q] * len(hits))
        docs.extend(int(d) for d in hits)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_span_or(sf_dir: str) -> pa.Table:
    """ES ``span_or`` inside ``span_near``: (t_off OR t_off+1) within the
    unordered slop-2 window of t_off+2 — the OR clause is a key-set union
    feeding the unchanged window kernel."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_or_near_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    qids, docs = [], []
    for q, t1, t2, t3 in _span_triples(sf_dir):
        hits = span_or_near_match(store, [t1, t3], t2, slop=2)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_field_masking_span(sf_dir: str) -> pa.Table:
    """ES ``field_masking_span``: t1 from the text field within the
    unordered slop-2 window of t2 from the MASKED field (token-reversed
    view, position-aligned by construction).  t2 is the reversed spelling
    of the doc's off+2 token, so only the masked index can resolve it."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_field_masking_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    res_m = _index_masked_for(sf_dir)
    store = SegmentStore(res.out_dir)
    masked = SegmentStore(res_m.out_dir)
    qids, docs = [], []
    for q, t1, t2, _t3 in _span_triples(sf_dir):
        hits = span_field_masking_match(store, masked, t1, t2[::-1], slop=2)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _span_pair_queries(sf_dir: str) -> pa.Table:
    """Deterministic two-term span fixture: query q pairs vocab[(5q+1) mod V]
    with vocab[(11q+7) mod V] (bumped by one when the indices collide) —
    mirrored exactly by the SQL oracle."""
    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    v = len(vocab)
    qids, texts = [], []
    for q in range(_N_QUERIES):
        i1 = (5 * q + 1) % v
        i2 = (11 * q + 7) % v
        if i2 == i1:
            i2 = (i2 + 1) % v
        qids.append(q)
        texts.append(f"{vocab[i1]} {vocab[i2]}")
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.uint64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _q_span_near(sf_dir: str) -> pa.Table:
    """ES ``span_near`` (unordered, slop=2): the span fixture pair within a
    |Δpos| ≤ 3 window, distributed over the MatchScorer pool."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import run_match_queries

    res = _index_pos_for(sf_dir)
    rows = run_match_queries(
        res.out_dir, _span_pair_queries(sf_dir), mode="span_near", slop=2, concurrency=4
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_span_not(sf_dir: str) -> pa.Table:
    """ES ``span_not`` (pre=post=1): docs with a t1 occurrence having no t2
    occurrence in the ±1 window, distributed over the MatchScorer pool."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import run_match_queries

    res = _index_pos_for(sf_dir)
    rows = run_match_queries(
        res.out_dir, _span_pair_queries(sf_dir), mode="span_not", slop=1, concurrency=4
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_phrase_prefix(sf_dir: str) -> pa.Table:
    """ES ``match_phrase_prefix``: two consecutive tokens of doc
    (23q mod n) at offset (q mod 5), followed by any term starting with
    the next token's first two chars — dictionary-expanded last slot over
    the positional index."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_prefix_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    import pyarrow.parquet as pqm

    key = sf_dir.strip("/").replace("/", "_")
    corpus_path = os.path.join(_CACHE_ROOT, key, "corpus.parquet")
    texts = pqm.read_table(corpus_path, columns=["content"])["content"].to_pylist()
    n = len(texts)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        toks = texts[(q * 23) % n].split(" ")
        off = q % 5
        phrase = " ".join(toks[off : off + 2])
        prefix = toks[off + 2][:2]
        hits = phrase_prefix_match(store, phrase, prefix, max_expansions=1000)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_decay_topk(sf_dir: str) -> pa.Table:
    """ES ``function_score`` + gauss decay on doc length: origin
    10 + 8·(q mod 5), scale 16, decay 0.5 — BM25 × exp(dist²·ln½/scale²)."""
    from bitcoin_ledger_2es_ray.pipelines.query import decay_score_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        origin = 10 + 8 * (qid % 5)
        top = decay_score_query(
            store, text, _TOP_K, origin=origin, scale=16.0, decay=0.5, round_decimals=_ROUND
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_distance_feature(sf_dir: str) -> pa.Table:
    """ES ``distance_feature`` in a bool should: BM25 + 2·16/(16+|dl−origin|)
    with origin 10 + 8·(q mod 5) — only boosts docs the query matched."""
    from bitcoin_ledger_2es_ray.pipelines.query import distance_feature_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        origin = 10 + 8 * (qid % 5)
        top = distance_feature_query(
            store, text, _TOP_K, origin=origin, pivot=16.0, boost=2.0,
            round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_sampler_agg(sf_dir: str) -> pa.Table:
    """ES ``random_sampler`` made deterministic: avg dl over the ~10%
    content-hash sample (first sha byte < 0x1a) — sha streams off the
    forward map, one (n, Σdl) partial per batch."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import sampler_agg

    _, res = _store_for(sf_dir)
    return sampler_agg(res.out_dir, cut=0x1A, round_decimals=_ROUND)


def _q_delete_query_topk(sf_dir: str) -> pa.Table:
    """Soft-delete semantics (ES delete-by-query / Lucene live-docs): docs
    with lang='de' tombstoned in memory, then fixture BM25 top-k — deleted
    docs vanish from results while N/avgdl/df stay STALE (pre-delete), so
    surviving docs keep their exact pre-delete scores.  Mirrored by the
    oracle: full-corpus stats, hits filtered to lang <> 'de'."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    store, res = _store_for(sf_dir)
    fwd = pqm.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "lang"]
    )
    import pyarrow.compute as pc

    dead = fwd.filter(pc.equal(fwd["lang"], "de"))["doc_id"]
    store.set_tombstones(np.asarray(dead.combine_chunks(), dtype=np.uint64))
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = score_query(store, text, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_function_score_sum(sf_dir: str) -> pa.Table:
    """function_score with boost_mode=sum: BM25 + ln(1+dl) — ES's additive
    combine, over the driver store."""
    from bitcoin_ledger_2es_ray.pipelines.query import function_score_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = function_score_query(
            store, text, _TOP_K, round_decimals=_ROUND, boost_mode="sum"
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _q_function_score_topk(sf_dir: str) -> pa.Table:
    """ES ``function_score`` (field_value_factor, modifier ln1p on dl,
    multiply boost_mode): fixture BM25 re-weighted by ln(1+dl), ranked on
    the 6-dp-rounded final score — over the distributed scorer pool
    (``run_queries(scoring="function_score")``)."""
    from bitcoin_ledger_2es_ray.pipelines.query import run_queries

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    rows = run_queries(
        res.out_dir, queries, concurrency=4, round_decimals=_ROUND,
        scoring="function_score",
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_script_score(sf_dir: str) -> pa.Table:
    """ES ``script_score``: BM25 replaced by the saturation script
    ``_score / (1 + dl/avgdl)`` — over the same distributed scorer pool
    (``run_queries(scoring="script_score")``)."""
    from bitcoin_ledger_2es_ray.pipelines.query import run_queries

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    rows = run_queries(
        res.out_dir, queries, concurrency=4, round_decimals=_ROUND,
        scoring="script_score",
    ).take_all()
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score": pa.array([r["score"] for r in rows], type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_explain(sf_dir: str) -> pa.Table:
    """ES ``_explain`` analog: per-term BM25 breakdown of doc (q·17 mod N)
    for each fixture query — terms absent from the doc omitted; the
    contributions sum to the doc's exact score."""
    from bitcoin_ledger_2es_ray.pipelines.query import explain_score

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    n = store.n_docs
    qids, dids, terms, tfs, idfs, contribs = [], [], [], [], [], []
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round as _sr

    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        doc = (qid * 17) % n
        for term, w, tf, contrib in explain_score(
            store, text, doc, round_decimals=_ROUND
        ):
            qids.append(qid)
            dids.append(doc)
            terms.append(term)
            tfs.append(tf)
            idfs.append(float(_sr(w, _ROUND)))
            contribs.append(contrib)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(dids, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            "tf": pa.array(tfs, type=pa.int64()),
            "idf": pa.array(idfs, type=pa.float64()),
            "contribution": pa.array(contribs, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("term", "ascending")])


def _q_collapse_inner(sf_dir: str) -> pa.Table:
    """ES collapse + inner_hits: top-5 repo groups per query, each with
    its top-3 members in rank order."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.query import collapse_inner_hits

    store, res = _store_for(sf_dir)
    fwd = pqm.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "repo"]
    )
    field_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["repo"].to_pylist()))
    queries = _fixture_queries(store)
    qids, g_ranks, repos, h_ranks, docs, scores = [], [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for gr, f, hr, d, s in collapse_inner_hits(
            store, text, 5, 3, field_of, round_decimals=_ROUND
        ):
            qids.append(qid)
            g_ranks.append(gr)
            repos.append(f)
            h_ranks.append(hr)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "group_rank": pa.array(g_ranks, type=pa.int64()),
            "repo": pa.array(repos, type=pa.string()),
            "hit_rank": pa.array(h_ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


def _q_collapse_topk(sf_dir: str) -> pa.Table:
    """ES field ``collapse`` on repo: fixture BM25 top-k with one best doc
    per repo, groups ranked by their representative."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.query import collapse_topk

    store, res = _store_for(sf_dir)
    fwd = pqm.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "repo"]
    )
    field_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["repo"].to_pylist()))
    queries = _fixture_queries(store)
    qids, ranks, docs, repos, scores = [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = collapse_topk(store, text, _TOP_K, field_of, round_decimals=_ROUND)
        for r, (d, f, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            repos.append(f)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "repo": pa.array(repos, type=pa.string()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_top_hits(sf_dir: str) -> pa.Table:
    """ES ``top_hits`` sub-agg: per (query, lang) bucket, the top-2 hits
    by BM25 (score DESC, doc ASC)."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.query import top_hits_agg

    store, res = _store_for(sf_dir)
    fwd = pqm.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "lang"]
    )
    field_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["lang"].to_pylist()))
    queries = _fixture_queries(store)
    qids, langs, hranks, docs, scores = [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for lang, hr, d, s in top_hits_agg(
            store, text, field_of, k_per_bucket=2, round_decimals=_ROUND
        ):
            qids.append(qid)
            langs.append(lang)
            hranks.append(hr)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "lang": pa.array(langs, type=pa.string()),
            "hit_rank": pa.array(hranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by(
        [("query_id", "ascending"), ("lang", "ascending"), ("hit_rank", "ascending")]
    )


def _q_rrf_hybrid(sf_dir: str) -> pa.Table:
    """ES 8.x hybrid retrieval with Reciprocal Rank Fusion: the BM25
    fixture ranking (top-20) and the exact-cosine kNN ranking (query
    vector = embedding row q, top-20) fuse as score = Σ 1/(60 + rank)
    over the legs that ranked the doc; top-10 by (score DESC, doc ASC).
    Lexical and vector ids share the 0..N-1 space (FIXTURES.md)."""
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round as _sr
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    K_LEG, RRF_K = 20, 60
    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    contrib: dict[tuple[int, int], float] = {}
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for r, (d, _s) in enumerate(
            score_query(store, text, K_LEG, round_decimals=_ROUND), start=1
        ):
            contrib[(qid, d)] = contrib.get((qid, d), 0.0) + 1.0 / (RRF_K + r)
    knn = knn_bruteforce(sf_dir, n_queries=_N_QUERIES, k=K_LEG)
    for q, r, v in zip(
        knn["query_id"].to_pylist(), knn["rank"].to_pylist(), knn["vec_id"].to_pylist()
    ):
        contrib[(q, v)] = contrib.get((q, v), 0.0) + 1.0 / (RRF_K + r)
    fused: dict[int, list[tuple[int, float]]] = {}
    for (q, d), c in contrib.items():
        fused.setdefault(q, []).append((d, float(_sr(c, _ROUND))))
    qids, ranks, docs, scores = [], [], [], []
    for q in sorted(fused):
        rows = sorted(fused[q], key=lambda r: (-r[1], r[0]))[:_TOP_K]
        for rank, (d, c) in enumerate(rows, start=1):
            qids.append(q)
            ranks.append(rank)
            docs.append(d)
            scores.append(c)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_rank_eval_graded(sf_dir: str) -> pa.Table:
    """ES _rank_eval graded metrics (dcg / ndcg / expected reciprocal
    rank) over derived term-overlap grades."""
    from bitcoin_ledger_2es_ray.pipelines.query import rank_eval_graded

    store, _ = _store_for(sf_dir)
    return rank_eval_graded(
        store, _fixture_queries(store), k=10, round_decimals=_ROUND
    )


def _q_ltr_features(sf_dir: str) -> pa.Table:
    """LTR feature logging: per (query, BM25-top-10 doc) the deterministic
    ranking-feature vector (bm25, dl, qlen, n_matched, sum_tf, max_idf)."""
    from bitcoin_ledger_2es_ray.pipelines.query import ltr_features

    store, _ = _store_for(sf_dir)
    return ltr_features(store, _fixture_queries(store), k=10, round_decimals=_ROUND)


def _q_retriever_tree(sf_dir: str) -> pa.Table:
    """ES retriever tree: rescorer( rrf( standard, knn ) ) — rank fusion of
    the BM25 and exact-cosine legs, then a distance_feature-shaped second
    stage over the fused top-10."""
    from bitcoin_ledger_2es_ray.pipelines.retriever import retriever_search

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    spec = {
        "rescorer": {
            "retriever": {
                "rrf": {
                    "retrievers": [{"standard": {}}, {"knn": {}}],
                    "rank_constant": 60,
                    "rank_window_size": 20,
                }
            },
            "window_size": 10,
            "boost": 0.1,
            "pivot": 10.0,
            "origin": 32.0,
        }
    }
    return retriever_search(
        sf_dir, store, res.out_dir, queries, spec, k=10, round_decimals=_ROUND
    )


def _q_async_search(sf_dir: str) -> pa.Table:
    """ES ``_async_search``: every fixture query submitted up-front (all in
    flight), statuses polled, finals fetched — the final rankings are
    bit-identical to synchronous scoring (shares the bm25_topk oracle)."""
    from bitcoin_ledger_2es_ray.pipelines.serve import AsyncSearch, TopKService

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    svc = TopKService(res.out_dir, num_actors=2)
    try:
        a = AsyncSearch(svc)
        texts = queries["text"].to_pylist()
        ks = queries["k"].to_pylist()
        jobs = [
            a.submit(t, int(k), round_decimals=_ROUND) for t, k in zip(texts, ks)
        ]
        qids, ranks, docs, scores = [], [], [], []
        for qid, j in zip(queries["query_id"].to_pylist(), jobs):
            st = a.status(j)  # poll path exercised; partial is a valid ranking
            assert st["done_shards"] <= st["total_shards"]
            for rank, (d, s) in enumerate(a.get(j), start=1):
                qids.append(qid)
                ranks.append(rank)
                docs.append(d)
                scores.append(s)
    finally:
        svc.shutdown()
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_profile(sf_dir: str) -> pa.Table:
    """ES ``_profile`` (deterministic counters): per fixture query, the
    distinct live terms, postings to decode (Σ df) and OR-candidate count
    — n_lists (salt slices) is engine-internal and tested in pytest."""
    from bitcoin_ledger_2es_ray.pipelines.query import profile_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, nt, np_, nc = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        p = profile_query(store, text)
        qids.append(qid)
        nt.append(p["n_terms"])
        np_.append(p["n_postings"])
        nc.append(p["n_candidates"])
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "n_terms": pa.array(nt, type=pa.int64()),
            "n_postings": pa.array(np_, type=pa.int64()),
            "n_candidates": pa.array(nc, type=pa.int64()),
        }
    )


def _q_filtered_alias(sf_dir: str) -> pa.Table:
    """ES FILTERED alias (document-level multi-tenancy): fixture queries
    through an alias carrying lang='en' — hits gated, scores untouched
    (filters are non-scoring; df/N/avgdl stay index-wide)."""
    import tempfile

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import (
        add_filtered_alias,
        alias_allowed_docs,
        resolve_alias_full,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import score_query_filtered

    store, res = _store_for(sf_dir)
    reg = tempfile.mkdtemp(prefix="aliasreg_")
    add_filtered_alias(reg, "tenant-en", res.out_dir, field="lang", value="en")
    idx, filt = resolve_alias_full(reg, "tenant-en")
    allowed = alias_allowed_docs(idx, filt)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for r, (d, s) in enumerate(
            score_query_filtered(store, text, _TOP_K, allowed, round_decimals=_ROUND),
            start=1,
        ):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_curriculum(sf_dir: str) -> pa.Table:
    """Curriculum ordering: global (quality ASC, doc_id ASC) rank cut into
    4 ntile stages — distributed sort + per-block rank enumeration."""
    from bitcoin_ledger_2es_ray.pipelines.curate import curriculum_stages

    return curriculum_stages(sf_dir, n_stages=4)


def _q_disk_usage(sf_dir: str) -> pa.Table:
    """ES ``_disk_usage``: per-(artifact, column) compressed/uncompressed
    bytes off the parquet footers — analyze-only, engine-internal layout
    (rows-only)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import disk_usage

    _, res = _store_for(sf_dir)
    return disk_usage(res.out_dir)


def _q_ann_hnsw(sf_dir: str) -> pa.Table:
    """HNSW kNN in Lucene's per-segment-graph architecture: one
    deterministic graph per block built inside its Ray task, every block
    answers all queries, driver merge bounded by queries × k × blocks.
    Rows-only (approximate by nature); recall pinned in pytest."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_hnsw

    return knn_hnsw(sf_dir, n_queries=5, k=5)


def _q_knn_similarity(sf_dir: str) -> pa.Table:
    """ES ``knn.similarity`` threshold: exact-cosine top-10 keeping only
    matches with sim ≥ 0.3 — queries may return fewer than k."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce

    return knn_bruteforce(sf_dir, n_queries=5, k=10, similarity=0.3)


def _q_mmr_rerank(sf_dir: str) -> pa.Table:
    """MMR diversity re-ranking (λ=0.7) of the BM25 top-20 against the doc
    embeddings — greedy, deterministic; rows-only (iterative algorithm),
    pinned by a brute-force pytest."""
    from bitcoin_ledger_2es_ray.pipelines.ann import mmr_rerank
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    rankings = {
        int(qid): score_query(store, text, 20, round_decimals=_ROUND)
        for qid, text in zip(
            queries["query_id"].to_pylist(), queries["text"].to_pylist()
        )
    }
    return mmr_rerank(sf_dir, rankings, lam=0.7, k=_TOP_K, round_decimals=_ROUND)


def _q_transform(sf_dir: str) -> pa.Table:
    """ES transform (pivot, continuous mode): one checkpoint run pivoting
    events by user_id into a scratch dest index; incremental merge
    semantics are asserted in tests/test_extras.py."""
    import tempfile

    from bitcoin_ledger_2es_ray.pipelines.transform import read_pivot, run_transform

    dest = tempfile.mkdtemp(prefix="transform_")
    run_transform(sf_dir, dest)
    return read_pivot(dest, round_decimals=_ROUND)


def _q_rollup(sf_dir: str) -> pa.Table:
    """ES rollup: run the hourly (bucket × event_type) rollup job into a
    scratch rollup index, then answer the DAILY date_histogram + stats
    from the rollup alone — lossless for count/sum/min/max/avg."""
    import os
    import tempfile

    from bitcoin_ledger_2es_ray.pipelines.rollup import rollup_events, rollup_search

    out = os.path.join(tempfile.mkdtemp(prefix="rollup_"), "rollup.parquet")
    rollup_events(sf_dir, out, interval_s=3600)
    return rollup_search(out, interval_s=86400, round_decimals=_ROUND)


def _q_enrich(sf_dir: str) -> pa.Table:
    """ES enrich: execute the nation▸region match policy into a lookup
    index (dimension-sized), broadcast it once, decorate the customer
    stream inside map_batches — no shuffle."""
    from bitcoin_ledger_2es_ray.pipelines.enrich import enrich_customers

    return enrich_customers(sf_dir)


def _q_enrich_range(sf_dir: str) -> pa.Table:
    """ES enrich with a RANGE policy (``match_type: range``): interval
    containment via one searchsorted against broadcast boundaries;
    integer-cent sums keep the fold order-exact."""
    from bitcoin_ledger_2es_ray.pipelines.enrich import enrich_customers_range

    return enrich_customers_range(sf_dir)


def _q_lang_counts(sf_dir: str) -> pa.Table:
    """M6 language filter/projection: doc counts per lang from the engine's
    forward map, via a Ray Data groupby aggregate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    res = _index_for(sf_dir)
    ds = rd.read_parquet(os.path.join(res.out_dir, "forward_map"), columns=["lang"])
    agg = ds.groupby("lang").aggregate(Count(alias_name="n_docs"))
    parts = [ray.get(r) for r in agg.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows > 0])
    return pa.table(
        {"lang": t["lang"], "n_docs": t["n_docs"].cast(pa.int64())}
    ).sort_by("lang")


def _q_update_lang_counts(sf_dir: str) -> pa.Table:
    """ES ``update_by_query`` over forward-map metadata: retag lang
    'de'→'und' on a throwaway copy of the index's forward map (streamed
    Ray Data rewrite + directory swap — postings/scores untouched), then
    the lang_counts groupby over the UPDATED map."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import update_by_query

    res = _index_for(sf_dir)
    tmp = tempfile.mkdtemp(prefix="upd_", dir="/tmp")
    try:
        idx = os.path.join(tmp, "idx")
        os.makedirs(idx)
        shutil.copytree(
            os.path.join(res.out_dir, "forward_map"),
            os.path.join(idx, "forward_map"),
        )
        update_by_query(idx, pc.field("lang") == "de", {"lang": "und"})
        ds = rd.read_parquet(os.path.join(idx, "forward_map"), columns=["lang"])
        agg = ds.groupby("lang").aggregate(Count(alias_name="n_docs"))
        parts = [ray.get(r) for r in agg.to_arrow_refs()]
        t = pa.concat_tables([p for p in parts if p.num_rows > 0])
        return pa.table(
            {"lang": t["lang"], "n_docs": t["n_docs"].cast(pa.int64())}
        ).sort_by("lang")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)


def _q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: docs sharing any word-3-gram with the
    benchmark subset (doc_id % 17 == 0) — broadcast benchmark shingles,
    streamed corpus flagging (pipelines/dedup.py)."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import decontaminate

    return decontaminate(sf_dir, bench_mod=17, k=3)


def _q_dsir(sf_dir: str) -> pa.Table:
    """DSIR importance resampling (Xie et al. 2023): top-200 docs by
    add-1-smoothed unigram log-likelihood ratio toward the lang='en'
    target distribution (deterministic temperature→0 variant)."""
    from bitcoin_ledger_2es_ray.pipelines.dsir import dsir_select

    return dsir_select(sf_dir, target_lang="en", n_select=200, round_decimals=_ROUND)


def _q_exact_dedup(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.dedup import exact_dedup

    return exact_dedup(sf_dir)


def _q_jaccard_dups(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.dedup import shingle_jaccard_pairs

    return shingle_jaccard_pairs(sf_dir, k=3, tau=0.8)


def _q_minhash_dups(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(sf_dir, k=3, tau=0.8)


def _q_simhash(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.dedup import simhash_fingerprints

    return simhash_fingerprints(sf_dir)


def _q_quality(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.textstats import quality_scores

    return quality_scores(sf_dir)


def _q_percolate_bool(sf_dir: str) -> pa.Table:
    """Bool-query percolation: 50 registered must+must_not queries, the
    doc stream reports its matches — reverse search with negation."""
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate_bool

    docs = pqm.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    vocab = sorted({t for s in docs["text"].to_pylist() for t in s.split(" ")})
    c = len(vocab)
    queries = pa.table(
        {
            "query_id": pa.array(range(_N_QUERIES), type=pa.int64()),
            "text": pa.array(
                [f"{vocab[q % c]} {vocab[(7 * q + 3) % c]}" for q in range(_N_QUERIES)]
            ),
            "neg_text": pa.array(
                [vocab[(7 * q + 1) % c] for q in range(_N_QUERIES)]
            ),
        }
    )
    return percolate_bool(sf_dir, queries)


def _q_simulate_grok(sf_dir: str) -> pa.Table:
    """Ingest-pipeline grok + dissect processors over the doc stream:
    typed int extraction and string extraction from the source field."""
    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    out = simulate_pipeline(
        sf_dir,
        [
            {"type": "grok", "field": "source", "pattern": "src%{INT:srcnum:int}"},
            {"type": "dissect", "field": "source", "pattern": "src%{srcnum_s}"},
        ],
        columns=("doc_id", "source"),
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].combine_chunks().cast(pa.int64()),
            "source": out["source"],
            "srcnum": out["srcnum"].combine_chunks().cast(pa.int64()),
            "srcnum_s": out["srcnum_s"],
        }
    )


def _q_ingest_kv(sf_dir: str) -> pa.Table:
    """ES ingest processors long tail: gsub → kv (named-key extraction) →
    convert → rename → remove, chained in list order over the events
    stream."""
    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    return simulate_pipeline(
        sf_dir,
        [
            {"type": "gsub", "field": "props", "pattern": '[{}" ]',
             "replacement": ""},
            {"type": "kv", "field": "props", "field_split": ",",
             "value_split": ":", "keys": ["k"]},
            {"type": "convert", "field": "k", "to": "integer"},
            {"type": "rename", "field": "k", "target": "props_k"},
            {"type": "remove", "field": "props"},
        ],
        columns=("event_id", "props"),
        table="events",
    )


def _q_simulate_pipeline(sf_dir: str) -> pa.Table:
    """ES ``_ingest/pipeline/_simulate``: gsub (vowel→'_') ▸ uppercase ▸
    set tag ▸ fingerprint(text|lang) over the doc stream, in order."""
    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    out = simulate_pipeline(
        sf_dir,
        [
            {"type": "gsub", "field": "text", "pattern": "[aeiou]", "replacement": "_"},
            {"type": "uppercase", "field": "text"},
            {"type": "set", "field": "tag", "value": "simulated"},
            {"type": "fingerprint", "fields": ["text", "lang"], "target": "fp"},
        ],
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].combine_chunks().cast(pa.int64()),
            "text": out["text"],
            "lang": out["lang"],
            "tag": out["tag"],
            "fp": out["fp"],
        }
    )


def _q_mlm_examples(sf_dir: str) -> pa.Table:
    """MLM example generation: deterministic (pos+doc) mod 7 masking —
    reproducible across runs/workers; one all-Arrow pass."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import mlm_examples

    return mlm_examples(sf_dir, stride=7)


def _q_tokenizer_stats(sf_dir: str) -> pa.Table:
    """Tokenizer fertility per language: docs, tokens, avg dl and
    chars/token — per-batch partials, driver combine bounded by #langs."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import tokenizer_stats

    return tokenizer_stats(sf_dir, round_decimals=_ROUND)


def _q_quality_classifier(sf_dir: str) -> pa.Table:
    """fastText-style logistic quality filter with fixed deterministic
    weights: (doc_id, prob, keep) at threshold 0.5."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import quality_classifier

    return quality_classifier(sf_dir, threshold=0.5)


def _q_bpe(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.textstats import token_count_bpe

    return token_count_bpe(sf_dir)


def _q_lang_id(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.textstats import lang_id

    return lang_id(sf_dir)


def _q_fingerprints(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.textstats import doc_fingerprints

    return doc_fingerprints(sf_dir)


def _q_redact_pii(sf_dir: str) -> pa.Table:
    """Regex redaction (PII scrubbing shape): two RE2 patterns applied in
    order via the vectorized Arrow kernels; output carries the match count
    + redacted length + sha256(redacted) per doc."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import redact_pii

    return redact_pii(sf_dir, patterns=("va[a-z]+", "[a-z]*ab[a-z]*"))


def _q_repetition_stats(sf_dir: str) -> pa.Table:
    """Gopher-style repetition signals: per doc token count, distinct
    count, duplicate-token fraction and top-token fraction."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import repetition_stats

    return repetition_stats(sf_dir)


def _q_hash_split(sf_dir: str) -> pa.Table:
    """Deterministic leakage-safe train/val/test split: first sha256 byte
    against 0xcc/0xe6 cuts — pure function of the content bytes."""
    from bitcoin_ledger_2es_ray.pipelines.curate import hash_split

    return hash_split(sf_dir)


def _q_ann_topk(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce

    return knn_bruteforce(sf_dir, n_queries=5, k=5)


def _q_ann_filtered(sf_dir: str) -> pa.Table:
    """ES 8 filtered kNN: exact cosine top-k with the label predicate
    pushed into the parquet scan — the filter restricts candidates, the
    queries stay unfiltered."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce

    return knn_bruteforce(sf_dir, n_queries=5, k=5, label=3)


def _q_ann_lsh(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_lsh

    return knn_lsh(sf_dir, n_queries=5, k=5)


def _q_cosine_dups(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.ann import cosine_dup_pairs

    return cosine_dup_pairs(sf_dir, tau=0.4)


def _q_knn_graph(sf_dir: str) -> pa.Table:
    """Exact cosine kNN graph (corpus self-join top-k) — the building block
    for graph-based dedup / SemDeDup clustering / connectivity analyses."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_graph

    return knn_graph(sf_dir, k=5)


def _q_outlier_scores(sf_dir: str) -> pa.Table:
    """ES x-pack outlier_detection (deterministic distance-feature subset):
    kth-NN distance + mean-kNN distance + min-max-normalized combine."""
    from bitcoin_ledger_2es_ray.pipelines.ann import outlier_scores

    return outlier_scores(sf_dir, k=5)


def _q_outlier_scores_lsh(sf_dir: str) -> pa.Table:
    """Outlier detection's 100-TB path: distance features off the LSH kNN
    graph (no full-matrix broadcast), block-local per-vec reduction."""
    from bitcoin_ledger_2es_ray.pipelines.ann import outlier_scores_lsh

    return outlier_scores_lsh(sf_dir, k=5)


def _q_knn_graph_lsh(sf_dir: str) -> pa.Table:
    # rows-only by nature (approximate); recall vs the exact graph is pinned
    # in tests/test_extras.py
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_graph_lsh

    return knn_graph_lsh(sf_dir, k=5, n_planes=4, n_tables=12)


def _q_sem_dedup(sf_dir: str) -> pa.Table:
    """SemDedup (k-means + within-cluster cosine screen) over the
    embeddings table — per-vector kept/dup_of verdicts.  Clustering is not
    SQL-expressible (rows-only); exactness vs a pure-numpy replay is
    asserted in tests/test_extras.py."""
    from bitcoin_ledger_2es_ray.pipelines.ann import sem_dedup

    return sem_dedup(sf_dir, tau=0.4, n_centroids=8)


def _q_cluster_sample(sf_dir: str) -> pa.Table:
    """Cluster-balanced sampling: k-means assignment + per-cluster quota of
    the most prototypical members (cdist ASC, vec_id ASC).  Rows-only
    (k-means not SQL-expressible); exactness vs a numpy replay is asserted
    in tests/test_extras.py."""
    from bitcoin_ledger_2es_ray.pipelines.ann import cluster_sample

    return cluster_sample(sf_dir, n_centroids=8, per_cluster=8)


def _q_ann_ivf(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_ivf

    return knn_ivf(sf_dir, n_queries=5, k=5)


def _q_cosine_dups_lsh(sf_dir: str) -> pa.Table:
    # low tau → few planes per table, many tables (collision prob per table
    # is (1-θ/π)^planes); recall vs the exact path is asserted in tests
    from bitcoin_ledger_2es_ray.pipelines.ann import cosine_dup_pairs_lsh

    return cosine_dup_pairs_lsh(sf_dir, tau=0.4, n_planes=4, n_tables=12)


def _q_media_features(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.multimodal import media_pipeline, synthesize_media

    t = media_pipeline(synthesize_media(200))
    return pa.table(
        {
            "media_id": t["media_id"],
            "f0": pa.array(
                [v[0] for v in t["feature"].to_pylist()], type=pa.float32()
            ),
        }
    )


def _q_curated(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.curate import curate_corpus

    return curate_corpus(sf_dir, min_tokens=20, max_mean_tok_len=8.0, langs=("en", "fr"))


def _q_top_quality_per_lang(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.curate import top_quality_per_lang

    return top_quality_per_lang(sf_dir, k=3)


def _q_source_stats(sf_dir: str) -> pa.Table:
    """Per-source (domain-level, CCNet-style) corpus stats: quality carried
    as integer micro-units so cross-batch sums are order-exact."""
    from bitcoin_ledger_2es_ray.pipelines.curate import source_stats

    return source_stats(sf_dir)


def _q_source_filter(sf_dir: str) -> pa.Table:
    """Domain filter: docs from sources whose MEAN quality clears the bar
    (per-source verdict broadcast once; the doc stream never shuffles)."""
    from bitcoin_ledger_2es_ray.pipelines.curate import source_filter

    return source_filter(sf_dir, threshold=0.445)


def _q_nb_train(sf_dir: str) -> pa.Table:
    """Distributed Naive-Bayes training: (lang, term) count shuffle (the
    term-dictionary envelope) -> Laplace-smoothed log-likelihood weights as
    integer micro-units (order-exact across engines)."""
    from bitcoin_ledger_2es_ray.pipelines.nbayes import nb_train

    return nb_train(sf_dir)


def _q_nb_predict(sf_dir: str) -> pa.Table:
    """Naive-Bayes inference, production shape: train → parquet artifact
    (cached per corpus) → predict loads the artifact and broadcasts it
    once via ray.put — the predict job never re-runs the training
    shuffle; each doc batch scores all classes vectorized (sparse
    present-pair identity); the doc stream never shuffles."""
    import hashlib as _hl
    import os

    from bitcoin_ledger_2es_ray.pipelines.nbayes import (
        nb_predict,
        nb_train_to_parquet,
    )

    tag = _hl.blake2b(sf_dir.encode(), digest_size=8).hexdigest()
    model_dir = f"/tmp/nb_model_{tag}"
    if not os.path.exists(f"{model_dir}/weights"):
        nb_train_to_parquet(sf_dir, model_dir)
    return nb_predict(sf_dir, model_dir=model_dir)


def _q_kmeans_fit(sf_dir: str) -> pa.Table:
    """Spherical k-means fit (bounded-sample trainer, O(sample) driver)."""
    from bitcoin_ledger_2es_ray.pipelines.ann import kmeans_fit

    return kmeans_fit(sf_dir, n_centroids=16)


def _q_kmeans_assign(sf_dir: str) -> pa.Table:
    """Streamed k-means assignment: centroids broadcast once, one matmul
    per batch, row stream never shuffles."""
    from bitcoin_ledger_2es_ray.pipelines.ann import kmeans_assign

    return kmeans_assign(sf_dir, n_centroids=16)


def _q_embedding_report(sf_dir: str) -> pa.Table:
    """Composed embedding-curation report: cluster + outlier score + PCs
    per vector, order-pinned join of the three streamed pipelines."""
    from bitcoin_ledger_2es_ray.pipelines.pca import embedding_report

    return embedding_report(sf_dir)


def _q_pca_fit(sf_dir: str) -> pa.Table:
    """Distributed PCA fit over milli-quantized integer moments (order-exact
    on any cluster size); eigendecomposition on the driver's d×d reduce."""
    from bitcoin_ledger_2es_ray.pipelines.pca import pca_fit

    return pca_fit(sf_dir, k=4)


def _q_pca_project(sf_dir: str) -> pa.Table:
    """PCA projection: components broadcast by closure, one matmul per
    batch, row stream never shuffles."""
    from bitcoin_ledger_2es_ray.pipelines.pca import pca_project

    return pca_project(sf_dir, k=4)


def _q_anomaly_scores(sf_dir: str) -> pa.Table:
    """ES ML anomaly detection (deterministic robust-z-score core): per
    (event_type, day bucket) counts vs the type's median/MAD typicality."""
    from bitcoin_ledger_2es_ray.pipelines.events import anomaly_scores

    return anomaly_scores(sf_dir)


def _q_ols_fit(sf_dir: str) -> pa.Table:
    """x-pack data-frame-analytics regression (deterministic OLS variant):
    closed-form least squares from exact integer moment partials."""
    from bitcoin_ledger_2es_ray.pipelines.regress import ols_fit

    return ols_fit(sf_dir)


def _q_inference_agg(sf_dir: str) -> pa.Table:
    """ES ``inference`` pipeline agg: the trained OLS model applied to the
    per-returnflag bucket feature (mean quantity) on the coordinator —
    the last member of the ES pipeline-agg family
    (`pipelines/regress.py: inference_agg`)."""
    from bitcoin_ledger_2es_ray.pipelines.regress import inference_agg

    return inference_agg(sf_dir, round_decimals=_ROUND)


def _q_ols_predict(sf_dir: str) -> pa.Table:
    """Regression inference over the source rows: prediction + residual per
    lineitem from the two fitted scalars (row stream never shuffles)."""
    from bitcoin_ledger_2es_ray.pipelines.regress import ols_predict

    return ols_predict(sf_dir)


def _q_shuffle_order(sf_dir: str) -> pa.Table:
    """Deterministic global training-order shuffle: distributed sort on
    sha256(doc_id ':' seed) + two-phase rank enumeration."""
    from bitcoin_ledger_2es_ray.pipelines.curate import shuffle_order

    return shuffle_order(sf_dir, seed="s0")


def _q_pack_sequences(sf_dir: str) -> pa.Table:
    """LLM sequence packing: global token offset per doc (two-phase
    distributed prefix sum over row groups) + 256-token chunk id."""
    from bitcoin_ledger_2es_ray.pipelines.curate import pack_sequences

    return pack_sequences(sf_dir, budget=256)


def _q_count_terminated(sf_dir: str) -> pa.Table:
    """ES terminate_after: capped counts + the terminated_early flag per
    fixture query (cap 100)."""
    from bitcoin_ledger_2es_ray.pipelines.query import match_count_terminated

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, counts, flags = [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        n, t = match_count_terminated(store, text, terminate_after=100)
        qids.append(qid)
        counts.append(n)
        flags.append(t)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "n_matches": pa.array(counts, type=pa.int64()),
            "terminated_early": pa.array(flags),
        }
    )


def _q_match_count(sf_dir: str) -> pa.Table:
    """ES ``_count``: OR-match doc count per fixture query — single-term
    queries answer from the dictionary df without touching postings."""
    from bitcoin_ledger_2es_ray.pipelines.query import match_count

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, counts = [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        qids.append(qid)
        counts.append(match_count(store, text))
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "n_matches": pa.array(counts, type=pa.int64()),
        }
    )


def _q_index_sorted_topk(sf_dir: str) -> pa.Table:
    """ES index sorting (``index.sort``): range-bucketed sorted view of the
    forward map on dl, then the top-50 shortest docs via early-terminated
    bucket reads (pipelines/sortindex.py) — the sorted-query analog of
    Lucene's sorted-segment early termination."""
    from bitcoin_ledger_2es_ray.pipelines.sortindex import (
        build_sorted_view,
        sorted_topk,
    )

    _, res = _store_for(sf_dir)
    view = build_sorted_view(res.out_dir, field="dl")
    t, _read = sorted_topk(view, k=50)
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "dl": t["dl"].cast(pa.int64()),
        }
    )


def _q_mget(sf_dir: str) -> pa.Table:
    """ES ``_mget``: metadata for ids (31q mod N) via the forward map with
    the id set pushed into the parquet scan."""
    from bitcoin_ledger_2es_ray.pipelines.query import mget

    store, res = _store_for(sf_dir)
    ids = sorted({(q * 31) % store.n_docs for q in range(_N_QUERIES)})
    t = mget(res.out_dir, ids, columns=["lang", "dl"])
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "lang": t["lang"],
            "dl": t["dl"].cast(pa.int64()),
        }
    )


def _q_ids_query(sf_dir: str) -> pa.Table:
    """ES ``ids`` query: explicit-id SEARCH — constant score 1.0 per hit,
    id predicate pushed into the forward-map scan."""
    from bitcoin_ledger_2es_ray.pipelines.query import ids_query

    store, res = _store_for(sf_dir)
    ids = sorted({(q * 37) % store.n_docs for q in range(_N_QUERIES)})
    t = ids_query(res.out_dir, ids, columns=["lang"])
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "lang": t["lang"],
            "score": t["score"],
        }
    )


def _q_percentile_ranks(sf_dir: str) -> pa.Table:
    """ES ``percentile_ranks`` over doc length (exact value-counts plan):
    % of docs with dl ≤ v for v ∈ {8,16,32,64}."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentile_ranks_agg

    _, res = _store_for(sf_dir)
    return percentile_ranks_agg(res.out_dir, values=(8, 16, 32, 64), round_decimals=_ROUND)


def _q_date_histogram_pipeline(sf_dir: str) -> pa.Table:
    """ES pipeline aggregations (derivative / cumulative_sum /
    moving_avg, window 3) over the daily date_histogram doc counts —
    coordinator-side over the reduced buckets, exactly like ES."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import pipeline_aggs
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return pipeline_aggs(buckets, key="bucket_s", metric="doc_count", window=3)


def _q_top_metrics(sf_dir: str) -> pa.Table:
    """ES ``top_metrics`` per lang bucket: metrics of the top-3 docs by
    (n_chars DESC, doc_id ASC) — per-batch partial top-N, driver combine
    bounded by langs × batches × N."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import top_metrics_agg

    return top_metrics_agg(sf_dir, size=3)


def _q_diversified_sampler(sf_dir: str) -> pa.Table:
    """ES ``diversified_sampler`` made deterministic: docs in sha256 order,
    ≤ 10 per lang, first 40 — greedy-equivalent closed form off the
    forward map's stored sha."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import diversified_sampler_agg

    _, res = _store_for(sf_dir)
    return diversified_sampler_agg(res.out_dir, max_docs_per_lang=10, shard_size=40)


def _q_auto_date_histogram(sf_dir: str) -> pa.Table:
    """ES ``auto_date_histogram`` (target ≤ 35 buckets): one pass at the
    finest ladder interval, driver re-buckets to the chosen one."""
    from bitcoin_ledger_2es_ray.pipelines.events import auto_date_histogram

    return auto_date_histogram(sf_dir, target_buckets=35)


def _q_cumulative_cardinality(sf_dir: str) -> pa.Table:
    """ES ``cumulative_cardinality`` (exact): first-seen day per user via
    one user-keyed shuffle, then the bucket cumsum on the driver."""
    from bitcoin_ledger_2es_ray.pipelines.events import cumulative_cardinality

    return cumulative_cardinality(sf_dir, interval_s=86400)


def _q_normalize_agg(sf_dir: str) -> pa.Table:
    """ES ``normalize`` pipeline agg (percent_of_sum) over the lang
    doc-count buckets."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import normalize_agg

    return normalize_agg(
        _q_lang_counts(sf_dir), key="lang", metric="n_docs", round_decimals=_ROUND
    )


def _q_geo_rings(sf_dir: str) -> pa.Table:
    """ES ``geo_distance`` aggregation: distance rings from the origin with
    avg acctbal sub-metric."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_distance_agg

    return geo_distance_agg(sf_dir, lat0=0.0, lon0=0.0, round_decimals=_ROUND)


def _q_rank_feature(sf_dir: str) -> pa.Table:
    """ES ``rank_feature`` (saturation) in a bool should: BM25 +
    1.5·x/(x+256) with x = n_chars, top-10 per fixture query."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.structured import rank_feature_topk

    store, _ = _store_for(sf_dir)
    dv = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    ).sort_by("doc_id")
    doc_ids = np.asarray(dv["doc_id"], dtype=np.int64)
    nchars = np.asarray(dv["n_chars"], dtype=np.float64)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        rows = rank_feature_topk(
            store, text, doc_ids, nchars, k=_TOP_K, boost=1.5, pivot=256.0,
            round_decimals=_ROUND,
        )
        for rank, (d, s) in enumerate(rows, start=1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])



def _q_rank_feature_sigmoid(sf_dir: str) -> pa.Table:
    """ES ``rank_feature`` sigmoid function: BM25 +
    1.5·x^0.6/(x^0.6 + 256^0.6) with x = n_chars, top-10 per query."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.structured import rank_feature_topk

    store, _ = _store_for(sf_dir)
    dv = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    ).sort_by("doc_id")
    doc_ids = np.asarray(dv["doc_id"], dtype=np.int64)
    nchars = np.asarray(dv["n_chars"], dtype=np.float64)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        rows = rank_feature_topk(
            store, text, doc_ids, nchars, k=_TOP_K, boost=1.5, pivot=256.0,
            round_decimals=_ROUND, function="sigmoid", exponent=0.6,
        )
        for rank, (d, s) in enumerate(rows, start=1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )

def _q_scroll(sf_dir: str) -> pa.Table:
    """ES ``scroll``/PIT deep pagination: the first 10 fixture queries
    drained completely in 25-row pages through the stateless cursor loop."""
    from bitcoin_ledger_2es_ray.pipelines.query import scroll_all

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, pages, ranks, docs, scores = [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        if qid >= 10:
            continue
        for page, rank, d, s in scroll_all(store, text, page_size=25, round_decimals=_ROUND):
            qids.append(qid)
            pages.append(page)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "page": pa.array(pages, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_sliced_scroll(sf_dir: str) -> pa.Table:
    """ES sliced scroll: the first 10 fixture queries drained as 3
    independent slices (field-based slice = doc_id mod 3), 25-row pages,
    per-slice rank/page numbering."""
    from bitcoin_ledger_2es_ray.pipelines.query import scroll_sliced

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, slices, pages, ranks, docs, scores = [], [], [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        if qid >= 10:
            continue
        for sl, page, rank, d, s in scroll_sliced(
            store, text, n_slices=3, page_size=25, round_decimals=_ROUND
        ):
            qids.append(qid)
            slices.append(sl)
            pages.append(page)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "slice_id": pa.array(slices, type=pa.int64()),
            "page": pa.array(pages, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by(
        [("query_id", "ascending"), ("slice_id", "ascending"), ("rank", "ascending")]
    )


def _q_stratified_sample(sf_dir: str) -> pa.Table:
    """Stratified per-lang sample, exact ceil(0.2·|stratum|) allocation by
    smallest sha256 — deterministic, leakage-safe (pure function of
    bytes)."""
    from bitcoin_ledger_2es_ray.pipelines.curate import stratified_sample

    return stratified_sample(sf_dir, frac=0.2)


def _q_histogram_field_stats(sf_dir: str) -> pa.Table:
    """ES ``histogram`` field type: per-order pre-binned quantity
    histograms, percentile/value_count/sum/avg aggs merging the
    PRE-AGGREGATED data (`pipelines/aggs.py: histogram_field_stats`)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_field_stats

    return histogram_field_stats(sf_dir, round_decimals=_ROUND)


def _q_sibling_bucket_stats(sf_dir: str) -> pa.Table:
    """ES sibling pipeline aggs (avg/min/max/sum/stats_bucket) over the
    daily date_histogram doc counts — coordinator-side like ES."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import sibling_bucket_stats
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return sibling_bucket_stats(buckets, metric="doc_count", round_decimals=_ROUND)


def _q_serial_diff(sf_dir: str) -> pa.Table:
    """ES ``serial_diff`` (lag 7 — week-over-week) over the daily doc
    counts."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import serial_diff
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return serial_diff(buckets, key="bucket_s", metric="doc_count", lag=7)


def _q_derivative(sf_dir: str) -> pa.Table:
    """ES ``derivative`` (+ ``unit``-normalized value, per hour) over the
    daily doc counts."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import derivative_agg
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return derivative_agg(buckets, key="bucket_s", metric="doc_count", unit_s=3600.0)


def _q_cumulative_sum(sf_dir: str) -> pa.Table:
    """ES ``cumulative_sum`` pipeline agg over the daily doc counts."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import cumulative_sum_agg
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return cumulative_sum_agg(buckets, key="bucket_s", metric="doc_count")


def _q_moving_percentiles(sf_dir: str) -> pa.Table:
    """ES ``moving_percentiles`` (window 5 before current, shift 0) over
    the daily doc counts."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import moving_percentiles_agg
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return moving_percentiles_agg(
        buckets, key="bucket_s", metric="doc_count", window=5
    )


def _q_change_point(sf_dir: str) -> pa.Table:
    """ES ``change_point`` (step-change): the split of the daily doc-count
    series maximizing the standardized mean shift."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import change_point_agg
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return change_point_agg(buckets, key="bucket_s", metric="doc_count")


def _q_bucket_sort(sf_dir: str) -> pa.Table:
    """ES ``bucket_sort`` (from=2, size=5 by doc_count DESC) over the daily
    doc counts — coordinator-side truncation."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_sort
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return bucket_sort(buckets, metric="doc_count", size=5, from_=2, tiebreak="bucket_s")


def _q_bucket_selector(sf_dir: str) -> pa.Table:
    """ES ``bucket_selector`` (aggregation HAVING): lang buckets of the
    AND-hit terms agg kept only when doc_count ≥ 3."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_selector, terms_agg

    _, res = _store_for(sf_dir)
    buckets = terms_agg(res.out_dir, _q_boolean_and(sf_dir), field="lang")
    return bucket_selector(buckets, metric="doc_count", min_value=3)


def _q_unigram_logprob(sf_dir: str) -> pa.Table:
    """CCNet-style unigram-LM quality score computed FROM the index: per
    doc, avg token ln(cf/C) — the term dictionary's cf stats are the LM."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import unigram_logprob

    _, res = _store_for(sf_dir)
    return unigram_logprob(res.out_dir, round_decimals=_ROUND)


def _q_perplexity_buckets(sf_dir: str) -> pa.Table:
    """CCNet head/middle/tail split: per lang, docs ranked by unigram-LM
    logprob (the index IS the LM) cut into 3 ntile buckets — bucket 1 =
    the head slice CCNet keeps
    (`pipelines/textstats.py: perplexity_buckets`)."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import perplexity_buckets

    _, res = _store_for(sf_dir)
    return perplexity_buckets(sf_dir, res.out_dir, round_decimals=_ROUND)


def _q_chunk_documents(sf_dir: str) -> pa.Table:
    """Training-data chunking: fixed 32-token windows with stride 24 over
    every document — the context-window preparation step for embedding /
    LM-training pipelines.  Per-doc boundaries ⇒ embarrassingly parallel,
    no shuffle at any scale."""
    from bitcoin_ledger_2es_ray.pipelines.chunking import chunk_documents

    return chunk_documents(sf_dir, window=32, stride=24)


def _q_pmi_collocations(sf_dir: str) -> pa.Table:
    """PMI collocations (Church & Hanks 1990): adjacent-bigram pointwise
    mutual information, unigram LM straight from the term dictionary's cf
    stats (no second corpus pass); bigram counts are one streamed pass of
    Arrow hash-agg partials."""
    from bitcoin_ledger_2es_ray.pipelines.ngrams import pmi_collocations

    _, res = _store_for(sf_dir)
    return pmi_collocations(
        sf_dir, res.out_dir, res.total_dl, res.n_docs,
        min_count=5, round_decimals=_ROUND,
    )


def _q_tfidf_top_terms(sf_dir: str) -> pa.Table:
    """Per-document top-3 terms by tf·idf (idf = ln(N/df)) — keyword
    extraction off the postings artifact: broadcast idf lookup inside
    map_batches, one doc-keyed groupby for the tiny per-group top-k."""
    from bitcoin_ledger_2es_ray.pipelines.ngrams import tfidf_top_terms

    _, res = _store_for(sf_dir)
    return tfidf_top_terms(res.out_dir, res.n_docs, k=3, round_decimals=_ROUND)


def _q_percolate(sf_dir: str) -> pa.Table:
    """ES percolator: the 50 fixture queries are REGISTERED and the doc
    stream percolates against the broadcast query set — (doc, query)
    pairs where the doc contains ALL the query's terms.  Result equals
    boolean_and transposed; the plan is the reverse direction (the doc
    stream never touches the inverted index)."""
    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate

    store, _ = _store_for(sf_dir)
    return percolate(sf_dir, _fixture_queries(store))


def _q_percolate_phrase(sf_dir: str) -> pa.Table:
    """Percolator over match_phrase queries: the fixture PHRASES register
    and the doc stream percolates with the phrase-key kernel over freshly
    tokenized positions — shares phrase_match's oracle (same phrase set,
    transposed plan, no index)."""
    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate_phrases

    out = percolate_phrases(sf_dir, _phrase_queries(sf_dir))
    return pa.table(
        {
            "query_id": out["query_id"],
            "doc_id": out["doc_id"],
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_prf_expand(sf_dir: str) -> pa.Table:
    """Rocchio pseudo-relevance feedback: top-3 feedback docs → top-3
    summed-tf·idf expansion terms (query terms excluded) → BM25 re-run
    with expansion contributions at weight 0.5."""
    from bitcoin_ledger_2es_ray.pipelines.mlt import prf_expand_topk

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = prf_expand_topk(
            store, res.out_dir, text, k=_TOP_K, n_feedback=3, n_expand=3,
            expand_weight=0.5, round_decimals=_ROUND,
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_rank_eval(sf_dir: str) -> pa.Table:
    """ES ``_rank_eval``: precision@10 / recall@10 / MRR of the BM25
    ranking against the conjunctive AND-match qrels."""
    from bitcoin_ledger_2es_ray.pipelines.query import rank_eval

    store, _ = _store_for(sf_dir)
    return rank_eval(store, _fixture_queries(store), k=_TOP_K, round_decimals=_ROUND)


def _q_pit_search(sf_dir: str) -> pa.Table:
    """ES point-in-time search: a PIT opened BEFORE a delete_by_query keeps
    serving the pre-delete ranking (shares the bm25_topk oracle) while the
    live index masks the deleted docs."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.pipelines.lifecycle import delete_by_query, open_pit
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    work = tempfile.mkdtemp(prefix="pit_")
    try:
        live_dir = os.path.join(work, "live")
        shutil.copytree(res.out_dir, live_dir)
        pit = open_pit(live_dir, os.path.join(work, "pit"))
        n = delete_by_query(live_dir, pc.field("lang") == "de")
        live = SegmentStore(live_dir)
        qids, ranks, docs, scores = [], [], [], []
        diverged = False
        for qid, text in zip(
            queries["query_id"].to_pylist(), queries["text"].to_pylist()
        ):
            top = score_query(pit, text, _TOP_K, round_decimals=_ROUND)
            if n and not diverged:
                diverged = top != score_query(live, text, _TOP_K, round_decimals=_ROUND)
            for r, (d, s) in enumerate(top, start=1):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        if n and not diverged:
            raise AssertionError("PIT should diverge from the live post-delete view")
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        ).sort_by([("query_id", "ascending"), ("rank", "ascending")])
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_dpr_triples(sf_dir: str) -> pa.Table:
    """DPR contrastive triples: 2 lowest-id qrel positives × 3 hardest
    BM25 negatives per query — the (q, pos, neg) training format."""
    from bitcoin_ledger_2es_ray.pipelines.query import dpr_triples

    store, _ = _store_for(sf_dir)
    return dpr_triples(
        store, _fixture_queries(store), n_pos=2, n_neg=3, round_decimals=_ROUND
    )


def _q_bpe_pack(sf_dir: str) -> pa.Table:
    """Sequence packing under the TRAINED tokenizer's subword lengths
    (rows-only: BPE lengths aren't SQL-expressible) — the two-phase
    distributed prefix sum over BPE counts
    (`pipelines/curate.py: pack_bpe_sequences`)."""
    from bitcoin_ledger_2es_ray.pipelines.bpe import bpe_train, word_freq_from_dict
    from bitcoin_ledger_2es_ray.pipelines.curate import pack_bpe_sequences

    res = _index_for(sf_dir)
    merges = bpe_train(word_freq_from_dict(res.out_dir), n_merges=20)
    return pack_bpe_sequences(sf_dir, merges, budget=512)


def _q_bpe_corpus_tokens(sf_dir: str) -> pa.Table:
    """Corpus-wide BPE tokenization with the trained merges (rows-only:
    BPE inference is not SQL-expressible): per doc, word count and
    subword count after encoding — the stage between tokenizer training
    and sequence packing (`pipelines/bpe.py: bpe_tokenize_corpus`)."""
    from bitcoin_ledger_2es_ray.pipelines.bpe import (
        bpe_tokenize_corpus,
        bpe_train,
        word_freq_from_dict,
    )

    res = _index_for(sf_dir)
    merges = bpe_train(word_freq_from_dict(res.out_dir), n_merges=20)
    return bpe_tokenize_corpus(sf_dir, merges, concurrency=4)


def _q_bpe_merges(sf_dir: str) -> pa.Table:
    """BPE tokenizer training (Sennrich 2016) over the indexed corpus: 20
    merges learned from the term dictionary's cf column (the
    word-frequency table — zero extra corpus passes).  Iterative algorithm
    → rows-only check; pytest pins driver == distributed == reference."""
    from bitcoin_ledger_2es_ray.pipelines.bpe import bpe_train, word_freq_from_dict

    _, res = _store_for(sf_dir)
    return bpe_train(word_freq_from_dict(res.out_dir), n_merges=20)


def _q_hard_negatives(sf_dir: str) -> pa.Table:
    """Hard-negative mining (DPR-style retrieval training data): top-10
    BM25 docs per query EXCLUDING the conjunctive AND-match relevant set."""
    from bitcoin_ledger_2es_ray.pipelines.query import hard_negatives

    store, _ = _store_for(sf_dir)
    return hard_negatives(store, _fixture_queries(store), k=_TOP_K, round_decimals=_ROUND)


def _q_nested_query(sf_dir: str) -> pa.Table:
    """ES ``nested`` query: orders where ONE lineitem has quantity ≥ 45
    AND discount ≤ 0.01 — the per-object conjunction flattened fields
    cannot express."""
    from bitcoin_ledger_2es_ray.pipelines.joins import nested_query_orders

    return nested_query_orders(sf_dir, qty_min=45.0, disc_max=0.01)


def _q_reverse_nested(sf_dir: str) -> pa.Table:
    """ES ``reverse_nested``: lineitem buckets by l_returnflag stepped back
    to the parent level — distinct orders per bucket next to child count."""
    from bitcoin_ledger_2es_ray.pipelines.joins import reverse_nested_agg

    return reverse_nested_agg(sf_dir)


def _q_children_agg(sf_dir: str) -> pa.Table:
    """ES ``children`` aggregation: terms buckets on the PARENT field
    (o_orderpriority) stepping down into child lineitems — parent
    doc_count + child doc_count / sum / avg of quantity.  Parent map
    broadcast once; children stream with one searchsorted per batch
    (`pipelines/joins.py: children_agg`)."""
    from bitcoin_ledger_2es_ray.pipelines.joins import children_agg

    return children_agg(sf_dir, round_decimals=_ROUND)


def _q_parent_agg(sf_dir: str) -> pa.Table:
    """ES ``parent`` aggregation (the inverse of ``children``): terms
    buckets on the CHILD field (l_returnflag) stepping UP into the parent
    orders — child doc_count + DISTINCT-parent doc_count / sum / avg of
    o_totalprice, each parent counted once per bucket
    (`pipelines/joins.py: parent_agg`)."""
    from bitcoin_ledger_2es_ray.pipelines.joins import parent_agg

    return parent_agg(sf_dir, round_decimals=_ROUND)


def _q_ext_stats_bucket(sf_dir: str) -> pa.Table:
    """ES ``extended_stats_bucket`` sibling pipeline agg over the daily
    date_histogram doc counts — population variance / std bounds computed
    coordinator-side like ES (`pipelines/aggs.py: extended_stats_bucket`)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import extended_stats_bucket
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return extended_stats_bucket(
        buckets, metric="doc_count", sigma=2.0, round_decimals=_ROUND
    )


def _q_count_api(sf_dir: str) -> pa.Table:
    """ES ``_count`` API: per fixture query, the count of docs matching the
    AND of its terms — hits never materialize, only per-query counts
    (`pipelines/apis.py: count_docs`)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import count_docs
    from bitcoin_ledger_2es_ray.sources.queries import fixture_query_terms

    store, _ = _store_for(sf_dir)
    qterms = fixture_query_terms(sorted(store.df), n=_N_QUERIES)
    return count_docs(store, qterms)


def _q_has_child(sf_dir: str) -> pa.Table:
    """ES ``has_child`` (join field): orders with ≥1 lineitem of quantity
    ≥ 48 — child predicate pushed into the scan, per-batch partials reduce
    children before the shuffle, parents attach via hash-partitioned
    Dataset.join (the Ray analog of ES parent routing)."""
    from bitcoin_ledger_2es_ray.pipelines.joins import has_child_orders

    return has_child_orders(sf_dir, min_quantity=48.0, round_decimals=_ROUND)


def _q_has_parent(sf_dir: str) -> pa.Table:
    """ES ``has_parent``: lineitems whose parent order is 1-URGENT —
    parent filter pruned at the read, matching key set broadcast once,
    children stream through one vectorized is_in mask."""
    from bitcoin_ledger_2es_ray.pipelines.joins import has_parent_lineitems

    return has_parent_lineitems(sf_dir, priority="1-URGENT")


def _q_geo_distance(sf_dir: str) -> pa.Table:
    """ES ``geo_distance`` query over the derived customer geo_point —
    map-side haversine filter, no shuffle."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_distance

    return geo_distance(sf_dir, lat0=0.0, lon0=0.0, radius_km=3000.0, round_decimals=_ROUND)


def _q_geo_bbox(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_bounding_box

    return geo_bounding_box(sf_dir, top=50.0, left=-60.0, bottom=-50.0, right=60.0)


def _q_geo_centroid(sf_dir: str) -> pa.Table:
    """ES ``geo_centroid`` agg per market segment — per-batch (Σlat, Σlon, n)
    partials, shuffle moves one row per segment per batch."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_centroid

    return geo_centroid(sf_dir, round_decimals=_ROUND)


def _q_geohex_grid(sf_dir: str) -> pa.Table:
    """ES ``geohex_grid`` (deterministic axial-hex variant — H3's
    icosahedral projection needs the h3 lib, absent here; the agg plan is
    identical and the cell kernel is bit-mirrored in SQL)
    (`pipelines/geo.py: geohex_grid / hex_cell`)."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geohex_grid

    return geohex_grid(sf_dir, size_deg=30.0)


def _q_geotile_grid(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.geo import geotile_grid

    return geotile_grid(sf_dir, zoom=3)


def _q_ingest_transforms(sf_dir: str) -> pa.Table:
    """Ingest-processor long tail in one simulated pipeline: split (regex
    separator) → sort → append → join over the token list, convert+gsub
    +bytes ("Nkb" → N·1024), gsub-built URL → uri_parts (flat url_*
    columns), and a drop (field == value condition — ES's painless `if`
    collapsed to the predicate, documented)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    return simulate_pipeline(
        sf_dir,
        [
            {"type": "split", "field": "text", "separator": " "},
            {"type": "sort", "field": "text", "order": "asc"},
            {"type": "append", "field": "text", "value": "zzz"},
            {"type": "join", "field": "text", "separator": "-"},
            {"type": "convert", "field": "n_chars", "to": "string"},
            {"type": "gsub", "field": "n_chars", "pattern": "$",
             "replacement": "kb"},
            {"type": "bytes", "field": "n_chars"},
            {"type": "gsub", "field": "source", "pattern": "^",
             "replacement": "https://me@"},
            {"type": "gsub", "field": "source", "pattern": "$",
             "replacement": ":8443/p/q?x=1#frag"},
            {"type": "uri_parts", "field": "source"},
            {"type": "drop", "field": "lang", "equals": "fr"},
        ],
        columns=("doc_id", "text", "lang", "source", "n_chars"),
    )


def _q_cartesian_agg(sf_dir: str) -> pa.Table:
    """ES ``cartesian_bounds`` + ``cartesian_centroid`` aggregations: the
    derived point read as a PLANAR (x, y) — no mercator clamp, no sphere
    (the cartesian family's contract) — per market segment in one
    streamed pass (`pipelines/geo.py: cartesian_agg`)."""
    from bitcoin_ledger_2es_ray.pipelines.geo import cartesian_agg

    return cartesian_agg(sf_dir, round_decimals=_ROUND)


def _q_search_mvt(sf_dir: str) -> pa.Table:
    """ES ``_search_mvt`` (vector-tile search) grafted as rows: the hits /
    aggs / meta layers of tile 3/4/3 — tile membership by INTEGER geotile
    index compare, gridded layer at zoom+4 with centroid sub-agg, one
    streamed pass with partial top-k hits (`pipelines/geo.py:
    search_mvt`)."""
    from bitcoin_ledger_2es_ray.pipelines.geo import search_mvt

    return search_mvt(sf_dir, zoom=3, x=4, y=3, grid_precision=4, size=10,
                      round_decimals=_ROUND)


def _q_tumbling_window(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.events import tumbling_window

    return tumbling_window(sf_dir, window_s=3600)


def _q_date_histogram(sf_dir: str) -> pa.Table:
    """ES ``date_histogram`` (fixed 1-day interval) + ``stats`` sub-agg on
    value — partial (count,min,max,sum) per batch, mergeable combine."""
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    return date_histogram_stats(sf_dir, interval_s=86400)


def _q_sessionize(sf_dir: str) -> pa.Table:
    from bitcoin_ledger_2es_ray.pipelines.events import sessionize

    return sessionize(sf_dir, gap_s=1800)


def _q_boxplot(sf_dir: str) -> pa.Table:
    """ES ``boxplot`` over doc length — exact value-counts plan (same wire
    shape as percentiles), quantile_cont interpolation on the driver."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import boxplot_agg

    _, res = _store_for(sf_dir)
    return boxplot_agg(res.out_dir, round_decimals=_ROUND)


def _q_string_stats(sf_dir: str) -> pa.Table:
    """ES ``string_stats`` (count / min / max / avg length + character
    Shannon entropy, base 2) over documents.text — one streamed pass,
    partials bounded by the alphabet."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import string_stats_agg

    return string_stats_agg(sf_dir, field="text", round_decimals=_ROUND)


def _q_t_test(sf_dir: str) -> pa.Table:
    """ES ``t_test`` (Welch, the ES default) on value: purchase vs error
    events — exact moment partials, driver fold."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import t_test_agg

    return t_test_agg(sf_dir, type_a="purchase", type_b="error", round_decimals=_ROUND)


def _q_moving_fn(sf_dir: str) -> pa.Table:
    """ES ``moving_fn`` min/max/sum (window 3, shift 0 — the window is
    the 3 buckets BEFORE current) over daily doc counts."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import moving_fn_agg
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400).select(
        ["bucket_s", "doc_count"]
    )
    return moving_fn_agg(buckets, key="bucket_s", metric="doc_count", window=3)


def _q_filters_agg(sf_dir: str) -> pa.Table:
    """ES ``filters`` aggregation: named term buckets (vocab terms at
    sorted index 1/5/11 — mirrored by the oracle's vocab CTE) plus a
    dl ≥ 32 doc-values bucket, each with doc_count + avg(dl)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import filters_agg

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    terms = [vocab[1 % len(vocab)], vocab[5 % len(vocab)], vocab[11 % len(vocab)]]
    return filters_agg(
        store,
        [(f"term_{t}", t) for t in terms],
        dl_gte=("dl_gte_32", 32),
        round_decimals=_ROUND,
    )


def _q_date_range(sf_dir: str) -> pa.Table:
    """ES ``date_range`` over events: open-ended head/tail + one middle
    bucket at epoch edges 2024-01-08 / 2024-01-15."""
    from bitcoin_ledger_2es_ray.pipelines.events import date_range_agg

    return date_range_agg(sf_dir, edges_s=(1704672000, 1705276800), round_decimals=_ROUND)


def _q_rate_agg(sf_dir: str) -> pa.Table:
    """ES ``rate`` agg: per-day buckets expressed per-hour (sum and
    value_count modes)."""
    from bitcoin_ledger_2es_ray.pipelines.events import rate_agg

    return rate_agg(sf_dir, bucket_s=86400, unit_s=3600, round_decimals=_ROUND)


def _q_tsds_downsample(sf_dir: str) -> pa.Table:
    """ES TSDS ``_downsample``: one rollup row per (user_id, event_type)
    series per day — value_count/min/max/sum/avg gauge metrics plus the
    counter ``last_value`` (latest by (ts, event_id))."""
    from bitcoin_ledger_2es_ray.pipelines.events import downsample

    return downsample(sf_dir, interval_s=86400, round_decimals=_ROUND)


def _q_time_series(sf_dir: str) -> pa.Table:
    """ES ``time_series`` aggregation: one bucket per (user_id, event_type)
    dimension tuple with doc_count + first/last epoch second + gauge sum."""
    from bitcoin_ledger_2es_ray.pipelines.events import time_series_agg

    return time_series_agg(sf_dir, round_decimals=_ROUND)


def _q_bucket_script(sf_dir: str) -> pa.Table:
    """ES ``bucket_script``: per-day purchase revenue ÷ click count,
    null where the denominator bucket is empty."""
    from bitcoin_ledger_2es_ray.pipelines.events import bucket_script_ratio

    return bucket_script_ratio(
        sf_dir, num_type="purchase", den_type="click", bucket_s=86400, round_decimals=_ROUND
    )


def _q_geo_bounds(sf_dir: str) -> pa.Table:
    """ES ``geo_bounds`` per market segment over the derived geo_point
    (wrap_longitude=false semantics)."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_bounds_agg

    return geo_bounds_agg(sf_dir, round_decimals=_ROUND)


def _q_eql_head(sf_dir: str) -> pa.Table:
    """EQL event query + head pipe: vectorized condition mask per batch,
    per-batch partial top-k cap (the stream never lands unbounded on the
    driver), (ts, event_id) total order."""
    from bitcoin_ledger_2es_ray.pipelines.eql import run_eql

    return run_eql("any where value > 250.0 | head 20", sf_dir)


def _q_eql_unique(sf_dir: str) -> pa.Table:
    """EQL ``| unique field``: earliest matching event per distinct field
    value (result bounded by field cardinality)."""
    from bitcoin_ledger_2es_ray.pipelines.eql import run_eql

    return run_eql("any where value > 200.0 | unique event_type", sf_dir)


def _q_eql_sample(sf_dir: str) -> pa.Table:
    """EQL ``sample by key [a where …] [b where …]``: earliest event per
    subquery per key, emitted iff every subquery matched — bitmask
    map_batches pass + one narrow groupby(key)."""
    from bitcoin_ledger_2es_ray.pipelines.eql import run_eql

    return run_eql(
        "sample by user_id [signup where true] "
        "[error where value > 20.0]",
        sf_dir,
    )


def _q_eql_sequence(sf_dir: str) -> pa.Table:
    """EQL ``sequence by key with maxspan … until …`` — FULL
    non-overlapping greedy state machine (every match, not just the
    first completion; pipelines/eql.py docstring pins the semantics).
    Iterative per-key matching is not SQL-expressible: rows-only gate;
    the brute-force reference tests in tests/test_eql.py are the value
    check."""
    from bitcoin_ledger_2es_ray.pipelines.eql import run_eql

    return run_eql(
        "sequence by user_id with maxspan=30d [signup where true] "
        '[click where value > 50.0] [error where true] '
        "until [purchase where value > 140.0]",
        sf_dir,
    )


def _q_eql_funnel(sf_dir: str) -> pa.Table:
    """EQL ``sequence by user_id with maxspan=7d [signup][purchase][error]``
    — first-completion (funnel) semantics; per-user scan after one
    user-keyed shuffle."""
    from bitcoin_ledger_2es_ray.pipelines.events import eql_funnel

    return eql_funnel(sf_dir, steps=("signup", "purchase", "error"), maxspan_s=7 * 86400)


def _q_var_width_histogram(sf_dir: str) -> pa.Table:
    """ES variable_width_histogram (deterministic agglomerative variant
    over exact dl value-counts) — rows-only: the clustering is iterative,
    not SQL-expressible; pytest brute-forces the merge sequence."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import variable_width_histogram

    _, res = _store_for(sf_dir)
    return variable_width_histogram(res.out_dir, buckets=6)


def _q_frequent_item_sets(sf_dir: str) -> pa.Table:
    """ES frequent_item_sets (pair core): token pairs co-occurring in
    ≥ 50 docs via per-batch incidence-matrix matmul partials."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import frequent_item_sets

    return frequent_item_sets(sf_dir, min_support=50)


def _q_terms_partitioned(sf_dir: str) -> pa.Table:
    """ES terms agg with include.partition (1 of 3, md5-hash routed) —
    the huge-cardinality paging pattern."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_agg_partitioned

    _, res = _store_for(sf_dir)
    return terms_agg_partitioned(res.out_dir, partition=1, num_partitions=3)


def _q_geo_polygon(sf_dir: str) -> pa.Table:
    """ES geo_polygon (convex CCW triangle) — half-plane mask filter."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_polygon

    return geo_polygon(sf_dir, [(-70.0, -100.0), (60.0, 20.0), (50.0, -140.0)])


def _q_geo_sort(sf_dir: str) -> pa.Table:
    """ES sort by _geo_distance: 25 nearest customers to the origin —
    per-batch partial top-k, k×blocks driver merge."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_sort_topk

    return geo_sort_topk(sf_dir, k=25, round_decimals=_ROUND)


def _q_geo_shape(sf_dir: str) -> pa.Table:
    """ES geo_shape over derived envelopes: intersects/disjoint/within/
    contains counts + exact membership checksums vs a fixed query box."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_shape_envelope

    return geo_shape_envelope(sf_dir)


def _q_wildcard_field(sf_dir: str) -> pa.Table:
    """ES wildcard FIELD type: trigram-pruned glob matching — prefix,
    leading-wildcard and infix patterns cycling per query."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import wildcard_field_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        t = vocab[(7 * q + 5) % c]
        cls = q % 3
        if cls == 0:
            pattern = t[:2] + "*"
        elif cls == 1:
            pattern = "*" + t[-2:]
        else:
            pattern = t[0] + "*" + t[-1]
        hits = wildcard_field_match(store, pattern)
        qids.extend([q] * len(hits))
        docs.extend(int(d) for d in hits)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    )


def _q_suffix_match(sf_dir: str) -> pa.Table:
    """Leading wildcard *suffix via the reversed-dictionary trick."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import suffix_match

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        sfx = vocab[(11 * q + 3) % len(vocab)][-2:]
        hits = suffix_match(store, sfx)
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_cat_segments(sf_dir: str) -> pa.Table:
    """ES _cat/segments analog: per-shard term/posting/byte stats from
    footers (rows-only — engine-internal artifact layout)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import cat_segments

    _, res = _store_for(sf_dir)
    return cat_segments(res.out_dir)


def _q_max_passage(sf_dir: str) -> pa.Table:
    """Max-passage retrieval: overlapping 32/24 token chunks, BM25 over
    chunk-level stats, doc = best passage (index-free 2-pass stream)."""
    from bitcoin_ledger_2es_ray.pipelines.chunking import max_passage_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    return max_passage_topk(
        sf_dir, queries, window=32, stride=24, k=_TOP_K, round_decimals=_ROUND
    )


def _q_completion_fuzzy(sf_dir: str) -> pa.Table:
    """ES completion suggester with fuzziness 1: typed text = 3-char
    vocab prefix with its 2nd char corrupted to 'z'."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import completion_fuzzy

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, ranks, suggs, dfs = [], [], [], []
    for q in range(_N_QUERIES):
        t = vocab[(19 * q + 2) % len(vocab)]
        typed = t[:1] + "z" + t[2:3]
        for r, (s, df) in enumerate(completion_fuzzy(store, typed, k=5), start=1):
            qids.append(q)
            ranks.append(r)
            suggs.append(s)
            dfs.append(df)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "suggestion": pa.array(suggs, type=pa.string()),
            "df": pa.array(dfs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_zipf_fit(sf_dir: str) -> pa.Table:
    """Zipf fit (ln cf ~ ln rank least squares) over the term dictionary."""
    from bitcoin_ledger_2es_ray.pipelines.textstats import zipf_fit

    _, res = _store_for(sf_dir)
    return zipf_fit(res.out_dir, round_decimals=_ROUND)


def _q_model_rerank(sf_dir: str) -> pa.Table:
    """LTR-style rescore: BM25 top-50 window → model actor pool
    (deterministic stand-in) → top-10 by base + model."""
    from bitcoin_ledger_2es_ray.pipelines.query import model_rerank

    store, res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    return model_rerank(
        res.out_dir, queries, k=_TOP_K, window=50, concurrency=2,
        round_decimals=_ROUND,
    )


def _q_knn_int4(sf_dir: str) -> pa.Table:
    """ES int4 scalar-quantized kNN (8.14+): half-byte packed codes,
    dequantize-scan + exact rescore — rows-only (approximate by nature;
    recall pinned in pytest) (`pipelines/ann.py: knn_int4`)."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_int4

    return knn_int4(sf_dir, n_queries=5, k=5, oversample=8, round_decimals=_ROUND)


def _q_knn_int8(sf_dir: str) -> pa.Table:
    """int8 scalar-quantized kNN with exact rescore of the quantized
    shortlist (approximate — recall pytest-asserted, rows-only gate)."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_int8

    return knn_int8(sf_dir, n_queries=5, k=5, oversample=4, round_decimals=_ROUND)


def _q_knn_bbq(sf_dir: str) -> pa.Table:
    """Binary-quantized kNN (1 bit/dim, Hamming scan + exact rescore of a
    deep shortlist — approximate, recall pytest-asserted, rows-only)."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bbq

    return knn_bbq(sf_dir, n_queries=5, k=5, oversample=24, round_decimals=_ROUND)


def _q_sparse_vector(sf_dir: str) -> pa.Table:
    """ES ``sparse_vector`` / rank_features dot product: fixture terms
    with query weight 1 + q mod 3, doc feature tf/dl."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import sparse_vector_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        w = 1.0 + qid % 3
        weights = {t: w for t in set(tokenize_query(text))}
        top = sparse_vector_topk(store, weights, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_bigram_logprob(sf_dir: str) -> pa.Table:
    """Bigram-LM quality score (add-1 smoothed), docs with ≥ 2 tokens."""
    from bitcoin_ledger_2es_ray.pipelines.ngrams import bigram_logprob

    return bigram_logprob(sf_dir, round_decimals=_ROUND)


def _q_hopping_window(sf_dir: str) -> pa.Table:
    """Hopping windows (size 1h, hop 30m): count + sum per overlapping
    window."""
    from bitcoin_ledger_2es_ray.pipelines.events import hopping_window

    return hopping_window(sf_dir, size_s=3600, hop_s=1800, round_decimals=_ROUND)


def _q_intervals_prefix(sf_dir: str) -> pa.Table:
    """ES ``intervals`` with a multi-term PREFIX source: all_of(ordered,
    max_gaps=3, [prefix "s", match "window"]) — the prefix expands through
    the dictionary into any_of (ES 128-expansion cap contract)
    (`pipelines/intervals.py: expand_spec`)."""
    from bitcoin_ledger_2es_ray.pipelines.intervals import intervals_search
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    spec = {
        "all_of": {
            "ordered": True,
            "max_gaps": 3,
            "intervals": [
                {"prefix": {"prefix": "s"}},
                {"match": {"query": "window"}},
            ],
        }
    }
    return intervals_search(store, spec)


def _q_intervals_algebra(sf_dir: str) -> pa.Table:
    """ES ``intervals`` nested ALGEBRA: all_of(ordered, max_gaps=2,
    [any_of(scan | column), window]) filtered not_containing "order" —
    minimal-interval semantics end to end
    (`pipelines/intervals.py: intervals_search`)."""
    from bitcoin_ledger_2es_ray.pipelines.intervals import intervals_search
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    spec = {
        "all_of": {
            "ordered": True,
            "max_gaps": 2,
            "intervals": [
                {"any_of": {"intervals": [
                    {"match": {"query": "scan"}},
                    {"match": {"query": "column"}},
                ]}},
                {"match": {"query": "window"}},
            ],
            "filter": {"not_containing": {"match": {"query": "order"}}},
        }
    }
    return intervals_search(store, spec)


def _q_intervals(sf_dir: str) -> pa.Table:
    """ES ``intervals`` (match rule, 3 distinct terms, max_gaps = 2+q%3,
    ordered on odd q) over the positional index."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import intervals_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    qids, docs = [], []
    for q in range(_N_QUERIES):
        i1 = q % c
        i2 = (7 * q + 3) % c
        if i2 == i1:
            i2 = (i2 + 1) % c
        i3 = (13 * q + 11) % c
        if i3 in (i1, i2):
            i3 = (i3 + 1) % c
        if i3 in (i1, i2):
            i3 = (i3 + 1) % c
        terms = [vocab[i1], vocab[i2], vocab[i3]]
        hits = intervals_match(
            store, terms, max_gaps=2 + q % 3, ordered=bool(q % 2)
        )
        qids.extend([q] * len(hits))
        docs.extend(hits.astype(np.int64).tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("doc_id", "ascending")])


def _q_percentiles_bucket(sf_dir: str) -> pa.Table:
    """ES ``percentiles_bucket`` over daily doc counts — exact
    quantile_cont interpolation on the coordinator."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentiles_bucket
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    buckets = date_histogram_stats(sf_dir, interval_s=86400)
    return percentiles_bucket(buckets, metric="doc_count", round_decimals=_ROUND)


def _q_bucket_correlation(sf_dir: str) -> pa.Table:
    """ES ``bucket_correlation`` (Pearson) between daily purchase revenue
    and click count series."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_correlation
    from bitcoin_ledger_2es_ray.pipelines.events import bucket_script_ratio

    buckets = bucket_script_ratio(sf_dir, num_type="purchase", den_type="click")
    return bucket_correlation(
        buckets, metric_a="num_sum", metric_b="den_count", round_decimals=_ROUND
    )


def _q_percentiles_tdigest(sf_dir: str) -> pa.Table:
    """ES percentiles via t-digest (the at-scale sketch; approximate by
    nature — rank-error bounds pytest-pinned, rows-only gate)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentiles_tdigest

    return percentiles_tdigest(sf_dir)


def _q_bucket_ks_test(sf_dir: str) -> pa.Table:
    """ES ``bucket_count_ks_test``: KS distances of the daily click-count
    distribution vs uniform fractions."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_count_ks_test
    from bitcoin_ledger_2es_ray.pipelines.events import bucket_script_ratio

    buckets = bucket_script_ratio(sf_dir, num_type="purchase", den_type="click")
    return bucket_count_ks_test(buckets, count_col="den_count", round_decimals=_ROUND)


def _q_geo_line(sf_dir: str) -> pa.Table:
    """ES ``geo_line`` per market segment: top-5 customers by acctbal,
    path string of their derived geo_points."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_line_agg

    return geo_line_agg(sf_dir, size=5, round_decimals=_ROUND)


def _q_hybrid_linear(sf_dir: str) -> pa.Table:
    """ES 8.16 ``linear`` retriever: minmax-normalized BM25 (w=0.7) +
    exact-cosine kNN (w=0.3) legs, top-20 each, fused top-10."""
    from bitcoin_ledger_2es_ray.pipelines.ann import hybrid_linear

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    return hybrid_linear(
        sf_dir, store, queries, k=_TOP_K, k_leg=20, w_lex=0.7, w_vec=0.3,
        round_decimals=_ROUND,
    )


def _q_hybrid_linear_l2(sf_dir: str) -> pa.Table:
    """ES 9.x ``linear`` retriever with the ``l2_norm`` normalizer: each
    leg's top-20 divided by its window's L2 norm before the weighted fuse."""
    from bitcoin_ledger_2es_ray.pipelines.ann import hybrid_linear

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    return hybrid_linear(
        sf_dir, store, queries, k=_TOP_K, k_leg=20, w_lex=0.7, w_vec=0.3,
        round_decimals=_ROUND, normalizer="l2_norm",
    )


def _q_dedup_keep_best(sf_dir: str) -> pa.Table:
    """Quality-aware near-dup resolution: keep max-n_chars doc per
    exact-Jaccard cluster (tie → min doc_id)."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import dedup_keep_best

    return dedup_keep_best(sf_dir, k=3, tau=0.8)


def _q_mixing_weights(sf_dir: str) -> pa.Table:
    """Training-mixture weights per source: weight ∝ n_tokens^0.5,
    one streamed partial pass."""
    from bitcoin_ledger_2es_ray.pipelines.curate import mixing_weights

    return mixing_weights(sf_dir, alpha=0.5, round_decimals=_ROUND)


def _q_geohash_grid(sf_dir: str) -> pa.Table:
    """ES ``geohash_grid`` (precision 2) over the derived geo_point —
    closed-form integer interleave, base-32 render."""
    from bitcoin_ledger_2es_ray.pipelines.geo import geohash_grid

    return geohash_grid(sf_dir, precision=2)


def _q_random_score(sf_dir: str) -> pa.Table:
    """ES ``function_score`` random_score (seeded, deterministic),
    boost_mode replace, filter = vocab term (5q+1) mod |V|, seed = q."""
    from bitcoin_ledger_2es_ray.pipelines.structured import random_score_topk

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for q in range(_N_QUERIES):
        term = vocab[(5 * q + 1) % len(vocab)]
        top = random_score_topk(store, term, seed=q, k=_TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(q)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_runtime_field(sf_dir: str) -> pa.Table:
    """ES runtime field (`chars_per_word` scripted from stored fields) +
    sort on it — per-batch partial top-k, driver merge of ≤ k×batches."""
    from bitcoin_ledger_2es_ray.pipelines.apis import runtime_field_sort

    return runtime_field_sort(sf_dir, k=20, round_decimals=_ROUND)


def _q_duplicate_spans(sf_dir: str) -> pa.Table:
    """Lee-et-al-2022 exact substring dedup: maximal token spans whose
    every 5-gram window occurs ≥ 2× in the corpus."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import duplicate_spans

    return duplicate_spans(sf_dir, k=5)


def _q_match_bool_prefix(sf_dir: str) -> pa.Table:
    """ES ``match_bool_prefix``: fixture terms as scoring term queries +
    a prefix clause (first 2 chars of vocab term (17q+5) mod |V|) under
    the constant-score rewrite (+1.0 per matching doc)."""
    from bitcoin_ledger_2es_ray.pipelines.structured import match_bool_prefix_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        prefix = vocab[(17 * qid + 5) % len(vocab)][:2]
        top = match_bool_prefix_topk(
            store, f"{text} {prefix}", _TOP_K, round_decimals=_ROUND
        )
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_constant_score(sf_dir: str) -> pa.Table:
    """ES ``constant_score``: filter = vocab term (3q+2) mod |V| with
    dl ∈ [8, 40]; every hit scores exactly boost 1.5."""
    from bitcoin_ledger_2es_ray.pipelines.structured import constant_score_topk

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    qids, ranks, docs, scores = [], [], [], []
    for q in range(_N_QUERIES):
        term = vocab[(3 * q + 2) % len(vocab)]
        top = constant_score_topk(store, term, boost=1.5, k=_TOP_K, dl_lo=8, dl_hi=40)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(q)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_pinned(sf_dir: str) -> pa.Table:
    """ES ``pinned`` query: docs (3q) mod N and (3q+7) mod N pinned in
    order (scores PIN_BASE − slot), organic BM25 fixture hits follow
    with pinned ids removed."""
    from bitcoin_ledger_2es_ray.pipelines.structured import pinned_topk

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    n = store.n_docs
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        pins = [(3 * qid) % n, (3 * qid + 7) % n]
        top = pinned_topk(store, text, pins, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_rule_query(sf_dir: str) -> pa.Table:
    """ES query rules: a 3-rule ruleset per query — a `contains` rule
    pinning doc (31q+5) mod n, a never-matching `exact` rule (criteria
    gating exercised), and an `always` rule excluding doc (13q+2) mod n
    from the organic tail."""
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.structured import rule_query

    store, _ = _store_for(sf_dir)
    queries = _fixture_queries(store)
    n = store.n_docs
    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        first = sorted(set(tokenize_query(text)))[0]
        ruleset = [
            {
                "criteria": [
                    {"type": "contains", "metadata": "query_string", "values": [first]}
                ],
                "pinned": [(31 * qid + 5) % n],
            },
            {
                "criteria": [{"type": "exact", "values": ["__never__"]}],
                "pinned": [(qid + 1) % n],
            },
            {
                "criteria": [{"type": "always"}],
                "excluded": [(13 * qid + 2) % n],
            },
        ]
        top = rule_query(store, text, ruleset, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_simple_query_string(sf_dir: str) -> pa.Table:
    """ES ``simple_query_string``: the parsed string
    ``v[q%c] +v[(7q+3)%c] -v[(13q+11)%c]`` → bool(must, should,
    must_not) through the real parser."""
    from bitcoin_ledger_2es_ray.pipelines.structured import simple_query_string_topk

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    qids, ranks, docs, scores = [], [], [], []
    for q in range(_N_QUERIES):
        qstr = f"{vocab[q % c]} +{vocab[(7 * q + 3) % c]} -{vocab[(13 * q + 11) % c]}"
        top = simple_query_string_topk(store, qstr, _TOP_K, round_decimals=_ROUND)
        for r, (d, s) in enumerate(top, start=1):
            qids.append(q)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _q_field_caps(sf_dir: str) -> pa.Table:
    """ES ``_field_caps`` over the documents table: schema-driven types,
    text-vs-keyword inferred from a streamed whitespace scan."""
    from bitcoin_ledger_2es_ray.pipelines.apis import field_caps

    return field_caps(sf_dir, table="documents")


def _q_global_hits(sf_dir: str) -> pa.Table:
    """ES ``global`` aggregation: per query, the filter-ignoring corpus
    bucket next to the AND-hit bucket — one streamed forward-map pass
    computes both (pipelines/aggs.global_agg)."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import global_agg

    _, res = _store_for(sf_dir)
    return global_agg(
        res.out_dir, _q_boolean_and(sf_dir), query_ids=list(range(_N_QUERIES))
    )


def _q_field_presence(sf_dir: str) -> pa.Table:
    """ES ``missing`` agg + ``exists``/``value_count`` counts over runtime
    nullable views (NULLIF(field, sentinel)) of forward-map fields."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import field_presence_agg

    _, res = _store_for(sf_dir)
    return field_presence_agg(
        res.out_dir, {"lang": "en", "repo": "org0/repo0"}
    )


def _q_exists_docs(sf_dir: str) -> pa.Table:
    """ES ``exists`` query over the runtime nullable lang view — predicate
    pushed into the forward-map parquet scan."""
    from bitcoin_ledger_2es_ray.pipelines.apis import exists_docs

    _, res = _store_for(sf_dir)
    return exists_docs(res.out_dir, "lang", "en")


def _q_scripted_metric(sf_dir: str) -> pa.Table:
    """ES ``scripted_metric``: exact per-event_type population variance of
    ``value`` via user map/combine/reduce scripts — the map partial stores
    EXACT integer cent moments (n, Σc, Σc²), so the combine is associative
    and the result bit-deterministic at any batch split."""
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.pipelines.aggs import scripted_metric_agg

    def map_script(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch["value"], 100.0)).cast(pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_c": cents,
                "sum_c2": pc.multiply(cents, cents),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("sum_c", "sum"), ("sum_c2", "sum")]
        )
        return g.select(["event_type", "n_sum", "sum_c_sum", "sum_c2_sum"]).rename_columns(
            ["event_type", "n", "sum_c", "sum_c2"]
        )

    def reduce_script(state: pa.Table) -> pa.Table:
        from bitcoin_ledger_2es_ray.functions.bm25 import sql_round

        ns = state["n"].to_pylist()
        scs = state["sum_c"].to_pylist()
        sc2s = state["sum_c2"].to_pylist()
        var = [
            sql_round((n * s2 - s * s) / (n * n) / 10000.0, _ROUND)
            for n, s, s2 in zip(ns, scs, sc2s)
        ]
        return pa.table(
            {
                "event_type": state["event_type"],
                "n": pa.array(ns, type=pa.int64()),
                "var_value": pa.array(var, type=pa.float64()),
            }
        )

    return scripted_metric_agg(
        f"{sf_dir}/events.parquet",
        key="event_type",
        map_script=map_script,
        reduce_script=reduce_script,
        columns=["event_type", "value"],
    )


def _q_categorize_text(sf_dir: str) -> pa.Table:
    """ES ``categorize_text``: deterministic template clustering (digits →
    ``#``, first-4-token key) over the document stream."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import categorize_text_agg

    return categorize_text_agg(sf_dir, n_tokens=4)


def _q_msearch(sf_dir: str) -> pa.Table:
    """ES ``_msearch``: one call multiplexing a 2-term match, a 2-token
    adjacent phrase (from doc 17 mod n), and a constant-score term filter."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.apis import msearch
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res = _index_pos_for(sf_dir)
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n = docs.num_rows
    sel = 17 % n
    text = docs.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(docs["doc_id"], sel)
    )["text"][0].as_py()
    w = text.split(" ")
    requests = [
        {"kind": "match", "text": f"{vocab[0 % c]} {vocab[5 % c]}"},
        {"kind": "phrase", "text": f"{w[0]} {w[1]}"},
        {"kind": "filter", "term": vocab[7 % c]},
    ]
    return msearch(store, requests, k=_TOP_K, round_decimals=_ROUND)


def _q_search_template(sf_dir: str) -> pa.Table:
    """ES ``search_template``: mustache-rendered 2-term match query."""
    from bitcoin_ledger_2es_ray.pipelines.apis import search_template

    store, _ = _store_for(sf_dir)
    vocab = sorted(store.df)
    c = len(vocab)
    return search_template(
        store,
        "{{a}} {{b}}",
        {"a": vocab[2 % c], "b": vocab[9 % c]},
        k=_TOP_K,
        round_decimals=_ROUND,
    )


_VALIDATE_FIXTURE = [
    "alpha beta beta",
    "",
    "  ",
    "*lead trail",
    "?x y",
    "good one two",
]


def _q_validate(sf_dir: str) -> pa.Table:
    """ES ``_validate/query``: static tokenize + rejection rules over a
    fixed query-string fixture (no execution, like the API)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import validate_query

    return validate_query(_VALIDATE_FIXTURE)


def _lang_of(res) -> dict[int, str]:
    """Doc-values lang column off the forward map (same pattern as
    collapse's repo lookup)."""
    import pyarrow.parquet as pqm

    fwd = pqm.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "lang"]
    )
    return dict(zip(fwd["doc_id"].to_pylist(), fwd["lang"].to_pylist()))


def _post_filter_both(sf_dir: str):
    from bitcoin_ledger_2es_ray.pipelines.structured import post_filter_search

    store, res = _store_for(sf_dir)
    lang_of = _lang_of(res)
    queries = _fixture_queries(store)
    hits_rows, agg_rows = [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        hits, aggs = post_filter_search(
            store, text, _TOP_K, lang_of, "en", round_decimals=_ROUND
        )
        for r, (d, s, tot) in enumerate(hits, start=1):
            hits_rows.append((qid, r, d, s, tot))
        for lang, c in aggs:
            agg_rows.append((qid, lang, c))
    return hits_rows, agg_rows


def _q_post_filter_hits(sf_dir: str) -> pa.Table:
    """ES ``post_filter`` hit list: match query, hits filtered to lang='en'
    AFTER aggs, ``track_total_hits`` = post-filtered match count."""
    hits_rows, _ = _post_filter_both(sf_dir)
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in hits_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in hits_rows], type=pa.int64()),
            "doc_id": pa.array([r[2] for r in hits_rows], type=pa.int64()),
            "score": pa.array([r[3] for r in hits_rows], type=pa.float64()),
            "total_hits": pa.array([r[4] for r in hits_rows], type=pa.int64()),
        }
    )


def _q_post_filter_aggs(sf_dir: str) -> pa.Table:
    """ES ``post_filter`` agg side: the lang facet counts EVERY matching
    doc (the post_filter never reaches the aggregations)."""
    _, agg_rows = _post_filter_both(sf_dir)
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in agg_rows], type=pa.int64()),
            "lang": pa.array([r[1] for r in agg_rows], type=pa.string()),
            "doc_count": pa.array([r[2] for r in agg_rows], type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("lang", "ascending")])


_MIN_SCORE = 0.5


def _q_named_queries(sf_dir: str) -> pa.Table:
    """ES named queries + ``min_score``: per-hit matched_queries (clause
    name = the term), hits below the rounded min_score dropped."""
    from bitcoin_ledger_2es_ray.pipelines.structured import named_queries_topk

    store, _res = _store_for(sf_dir)
    queries = _fixture_queries(store)
    rows = []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = named_queries_topk(
            store, text, _TOP_K, min_score=_MIN_SCORE, round_decimals=_ROUND
        )
        for r, (d, s, m) in enumerate(top, start=1):
            rows.append((qid, r, d, s, m))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "score": pa.array([r[3] for r in rows], type=pa.float64()),
            "matched": pa.array([r[4] for r in rows], type=pa.string()),
        }
    )


# ES|QL (`POST /_query`) pipes — parsed and compiled onto Ray Data by
# pipelines/esql.py; fixed sources so the DuckDB oracles are exact mirrors.
_ESQL_STATS = (
    'FROM documents | WHERE n_chars >= 100 '
    '| STATS cnt = COUNT(*), avg_chars = AVG(n_chars), max_chars = MAX(n_chars) '
    'BY lang | SORT lang'
)
_ESQL_TOPN = (
    'FROM events | WHERE event_type == "click" '
    '| EVAL v2 = ROUND(value * 2, 6) '
    '| SORT v2 DESC, event_id ASC | LIMIT 20 | KEEP event_id, v2'
)
_ESQL_EVAL = (
    'FROM documents | EVAL half = ROUND(LENGTH(text) / 2, 6) '
    '| WHERE half > 150 AND lang == "en" '
    '| KEEP doc_id, n_chars, half | SORT doc_id ASC | LIMIT 50'
)
_ESQL_GROK = (
    r'FROM events | GROK props "\\{\"k\": %{INT:k:int}\\}" '
    '| STATS n = COUNT(*), s = SUM(k) BY event_type | SORT event_type'
)
_ESQL_DISSECT = (
    'FROM events | DISSECT props "{\\"k\\": %{k}}" '
    '| STATS n = COUNT(*) BY k | SORT n DESC, k ASC | LIMIT 10'
)
_SQL_GROUP = (
    "SELECT lang AS l, COUNT(*) AS n, SUM(n_chars) AS total, "
    "MIN(n_chars) AS mn, MAX(n_chars) AS mx "
    "FROM documents WHERE n_chars >= 100 AND source LIKE 'src1%' "
    "GROUP BY lang ORDER BY l"
)
_SQL_SELECT = (
    "SELECT doc_id, n_chars AS size FROM documents "
    "WHERE lang = 'en' AND NOT (n_chars < 400) ORDER BY doc_id LIMIT 40"
)
_ESQL_STRINGS = (
    'FROM documents | EVAL k = CONCAT(TO_UPPER(SUBSTRING(lang, 1, 1)), "-", source) '
    '| WHERE text LIKE "*spark*" AND STARTS_WITH(source, "src") '
    "| STATS n = COUNT(*) BY k | SORT k"
)
_ESQL_MVEXPAND = (
    'FROM documents | EVAL w = SPLIT(text, " ") | MV_EXPAND w '
    "| STATS n = COUNT(*) BY w | SORT n DESC, w ASC | LIMIT 15"
)
_ESQL_MATH = (
    "FROM lineitem | EVAL c = CEIL(l_extendedprice), f = FLOOR(l_discount * 100), "
    "s = ROUND(SQRT(l_quantity), 6), p = ROUND(POW(l_quantity, 2), 6), "
    "lg = ROUND(LOG10(l_extendedprice), 6), ln2 = ROUND(LOG(2.0, l_quantity), 6), "
    "sg = SIGNUM(l_extendedprice - 30000.0) "
    "| KEEP l_orderkey, l_linenumber, c, f, s, p, lg, ln2, sg "
    "| SORT l_orderkey, l_linenumber, c | LIMIT 200"
)
_ESQL_STRING_FNS = (
    'FROM customer | EVAL t = TRIM(c_name), l5 = LEFT(c_name, 5), '
    'r4 = RIGHT(c_name, 4), rev = REVERSE(c_mktsegment), '
    'ew = ENDS_WITH(c_name, "1"), loc = LOCATE(c_name, "er#"), '
    'rep = REPLACE(c_mktsegment, "A", "_") '
    "| KEEP c_custkey, t, l5, r4, rev, ew, loc, rep | SORT c_custkey | LIMIT 120"
)
_ESQL_MV_FNS = (
    'FROM documents | EVAL w = SPLIT(text, " "), n = MV_COUNT(w), '
    "f = MV_FIRST(w), la = MV_LAST(w), mn = MV_MIN(w), mx = MV_MAX(w) "
    "| KEEP doc_id, n, f, la, mn, mx | SORT doc_id | LIMIT 150"
)
_ESQL_DATES = (
    'FROM events | EVAL day = TO_LONG(DATE_TRUNC(1 day, ts)), '
    'dow = DATE_EXTRACT("day_of_week", ts), dstr = DATE_FORMAT("%Y-%m-%d", ts) '
    "| STATS n = COUNT(*) BY day, dow, dstr | SORT day"
)
_ESQL_BUCKET = (
    "FROM events | EVAL b = BUCKET(value, 5.0), w = TO_LONG(BUCKET(ts, 1 week)) "
    "| STATS n = COUNT(*) BY b, w | SORT b, w"
)
_ESQL_STATS_WHERE = (
    "FROM lineitem | EVAL cents = ROUND(l_extendedprice * 100, 0) "
    '| STATS n_ret = COUNT(*) WHERE l_returnflag == "R", '
    "rev_disc = SUM(cents) WHERE l_discount > 0.05, "
    "mx_tax = MAX(l_tax) WHERE l_quantity >= 25, "
    "avg_big = AVG(l_quantity) WHERE l_quantity >= 25 "
    "BY l_linestatus | SORT l_linestatus"
)
_ESQL_INLINESTATS = (
    "FROM lineitem | INLINESTATS a = AVG(l_quantity) BY l_returnflag "
    "| WHERE l_quantity > a "
    "| STATS n = COUNT(*), mx = MAX(l_quantity) BY l_returnflag "
    "| SORT l_returnflag"
)
_ESQL_STDDEV = (
    "FROM lineitem | STATS sd = STD_DEV(l_quantity), "
    "a = AVG(l_quantity) BY l_returnflag | SORT l_returnflag"
)
_ESQL_WEIGHTED_AVG = (
    "FROM lineitem | STATS w = WEIGHTED_AVG(l_quantity, l_linenumber) "
    "BY l_linestatus | SORT l_linestatus"
)
_ESQL_PERCENTILE = (
    "FROM lineitem | STATS p = PERCENTILE(l_quantity, 90) "
    "BY l_returnflag | SORT l_returnflag"
)
_ESQL_MAD = (
    "FROM lineitem | STATS m = MEDIAN_ABSOLUTE_DEVIATION(l_quantity) "
    "BY l_linestatus | SORT l_linestatus"
)
_ESQL_TOP = (
    'FROM lineitem | STATS t = TOP(l_quantity, 5, "desc") '
    "BY l_returnflag | SORT l_returnflag"
)
_ESQL_VALUES = (
    "FROM nation | STATS v = VALUES(n_name), c = COUNT_DISTINCT(n_name) "
    "BY n_regionkey | SORT n_regionkey"
)
_ESQL_SAMPLE = (
    "FROM orders | SAMPLE 0.25 "
    "| STATS n = COUNT(*) BY o_orderstatus | SORT o_orderstatus"
)
_ESQL_FORK = (
    "FROM lineitem | WHERE l_quantity >= 40 | FORK "
    '(WHERE l_returnflag == "R" | STATS n = COUNT(*) BY l_linestatus) '
    "(STATS a = AVG(l_quantity) BY l_returnflag)"
)
_ESQL_CHANGE_POINT = (
    "FROM orders | STATS v = COUNT(*) BY o_orderpriority "
    "| CHANGE_POINT v ON o_orderpriority"
)
_ESQL_COMPLETION = (
    "FROM documents | COMPLETION summary = LEFT(text, 30) WITH test_echo "
    "| KEEP doc_id, summary | SORT doc_id | LIMIT 200"
)
_ESQL_RERANK = (
    'FROM documents | RERANK "data pipeline query engine" ON text '
    "WITH test_reranker | KEEP doc_id, _score "
    "| SORT _score DESC, doc_id ASC | LIMIT 100"
)
_ESQL_POST_STATS = (
    "FROM lineitem | STATS n = COUNT(*) BY l_suppkey, l_returnflag "
    "| WHERE n >= 3 | EVAL half = ROUND(n / 2, 6) "
    "| STATS mx = MAX(half), groups = COUNT(*) BY l_returnflag "
    "| SORT l_returnflag"
)
_ESQL_TS_RATE = (
    "TS events | STATS r = RATE(value) BY user_id | SORT user_id"
)
_ESQL_MATCH = (
    'FROM documents | WHERE MATCH(text, "join vector") '
    "| STATS n = COUNT(*) BY lang | SORT lang"
)
_ESQL_QSTR = (
    "FROM documents | WHERE "
    'QSTR(text, "fast AND (sort OR hash) AND NOT group") '
    "| STATS n = COUNT(*) BY lang | SORT lang"
)
_ESQL_FORK_RRF = (
    "FROM documents | FORK "
    '(RERANK "data pipeline query engine" ON text WITH test_reranker '
    "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 50) "
    '(RERANK "fast sort hash" ON text WITH test_reranker '
    "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 50) "
    "| RRF"
)
_ESQL_FUSE_LINEAR = (
    "FROM documents | FORK "
    '(RERANK "data pipeline query engine" ON text WITH test_reranker '
    "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 50) "
    '(RERANK "fast sort hash" ON text WITH test_reranker '
    "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 50) "
    "| FUSE linear"
)
_ESQL_ENRICH = (
    "FROM customer | EVAL cents = ROUND(c_acctbal * 100, 0) "
    "| ENRICH nations ON c_nationkey "
    "| STATS n = COUNT(*), bal = SUM(cents) BY r_name | SORT r_name"
)
_ESQL_LOOKUP = (
    "FROM events | EVAL cents = ROUND(value * 100, 0) "
    "| RENAME user_id AS c_custkey | LOOKUP JOIN customer ON c_custkey "
    "| STATS n = COUNT(*), cents_sum = SUM(cents) BY c_mktsegment "
    "| SORT c_mktsegment"
)


def _q_esql_stats(sf_dir: str) -> pa.Table:
    """ES|QL STATS..BY pipe: mergeable per-batch partials + driver combine."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_STATS, sf_dir)


def _q_esql_grok(sf_dir: str) -> pa.Table:
    """ES|QL GROK pipe: typed field extraction (one RE2 ``extract_regex``
    per batch) feeding mergeable STATS partials."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_GROK, sf_dir)


def _q_esql_dissect(sf_dir: str) -> pa.Table:
    """ES|QL DISSECT pipe: literal-separator field extraction feeding a
    grouped count with top-n."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_DISSECT, sf_dir)


def _q_sql_group(sf_dir: str) -> pa.Table:
    """ES _sql endpoint: SQL aggregate SELECT translated to the ES|QL pipe
    and executed there — the oracle runs the LITERAL same SQL text."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql(_SQL_GROUP, sf_dir)


def _q_esql_mv_reduce(sf_dir: str) -> pa.Table:
    """ES|QL MV reduction long tail: MV_DEDUPE (vectorized lexsort +
    run-boundary list rebuild) composed with MV_COUNT, aggregated per
    language."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | EVAL parts = SPLIT(text, " ") '
        "| EVAL uniq = MV_COUNT(MV_DEDUPE(parts)) "
        "| STATS tot = SUM(uniq), mx = MAX(uniq) BY lang | SORT lang",
        sf_dir,
    )


def _q_esql_mv_slice(sf_dir: str) -> pa.Table:
    """ES|QL MV_SLICE / MV_APPEND / MV_ZIP — list-kernel trio reduced to
    scalar outputs (slice bounds inclusive, append concatenates per row,
    zip pairwise-joins with a delimiter)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | EVAL w = SPLIT(text, " ") '
        "| EVAL a = MV_SLICE(w, 0, 2) "
        '| EVAL z = MV_ZIP(a, a, "-"), c = MV_APPEND(a, w) '
        "| EVAL first3 = MV_FIRST(a), last3 = MV_LAST(a), "
        "zip_last = MV_LAST(z), app_n = MV_COUNT(c) "
        "| KEEP doc_id, first3, last3, zip_last, app_n "
        "| SORT doc_id | LIMIT 200",
        sf_dir,
    )


def _q_esql_mv_stats(sf_dir: str) -> pa.Table:
    """ES|QL per-row list statistics over the embeddings table:
    MV_PERCENTILE / MV_MEDIAN_ABSOLUTE_DEVIATION (interpolated quantiles,
    DuckDB quantile_cont's lerp formula bit-for-bit) and
    MV_PSERIES_WEIGHTED_SUM (Σ v[i]/(i+1)^p in list order — the bincount
    fold accumulates exactly like the oracle's zipped-unnest sum)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM embeddings "
        "| EVAL p = ROUND(MV_PERCENTILE(embedding, 20), 6), "
        "m = ROUND(MV_MEDIAN_ABSOLUTE_DEVIATION(embedding), 6), "
        "s = ROUND(MV_PSERIES_WEIGHTED_SUM(embedding, 1.5), 6) "
        "| KEEP vec_id, p, m, s | SORT vec_id | LIMIT 300",
        sf_dir,
    )


def _q_esql_mv_concat(sf_dir: str) -> pa.Table:
    """ES|QL MV_CONCAT: per-row join of a sliced SPLIT list — one Arrow
    binary_join kernel per batch."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | EVAL w = SPLIT(text, " "), '
        'j = MV_CONCAT(MV_SLICE(w, 0, 2), "|") '
        "| KEEP doc_id, j | SORT doc_id | LIMIT 300",
        sf_dir,
    )


def _q_esql_ip_prefix(sf_dir: str) -> pa.Table:
    """ES|QL IP_PREFIX + SCALB: derived dotted-quad ips masked to /16
    network prefixes (int64 numpy octet math), SCALB's exact power-of-two
    scaling summed per prefix."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM events | EVAL ip = TO_IP(CONCAT("10.", '
        'TO_STRING(user_id % 200), ".", TO_STRING(event_id % 256), ".9")), '
        "pfx = IP_PREFIX(ip, 16, 0), s = SCALB(TO_DOUBLE(user_id % 10), 3) "
        "| STATS n = COUNT(*), t = SUM(s) BY pfx | SORT pfx",
        sf_dir,
    )


def _q_esql_metadata(sf_dir: str) -> pa.Table:
    """ES|QL FROM ... METADATA: scan-time _index/_id/_version/_score
    columns (_id = the table's id column as a string, the corpus
    convention; _score null outside a scoring context)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM documents METADATA _index, _id, _version "
        "| EVAL i = TO_INTEGER(_id) | WHERE i % 37 == 0 "
        "| KEEP _index, _id, _version, i | SORT i",
        sf_dir,
    )


def _q_esql_chrono_fields(sf_dir: str) -> pa.Table:
    """ES|QL DATE_EXTRACT long-tail ChronoFields: DAY_OF_YEAR (kernel),
    EPOCH_DAY / INSTANT_SECONDS / ALIGNED_WEEK_OF_YEAR (epoch-us integer
    math, Java semantics)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM events | EVAL doy = DATE_EXTRACT("day_of_year", ts), '
        'ed = DATE_EXTRACT("epoch_day", ts), '
        'aw = DATE_EXTRACT("aligned_week_of_year", ts), '
        'isec = DATE_EXTRACT("instant_seconds", ts) '
        "| STATS n = COUNT(*), mn = MIN(isec) BY doy, ed, aw | SORT doy",
        sf_dir,
    )


def _q_esql_spatial(sf_dir: str) -> pa.Table:
    """ES|QL spatial functions: TO_GEOPOINT (canonical WKT string,
    coordinate text preserved verbatim so ST_X/ST_Y round-trip
    bit-exactly) and ST_DISTANCE (haversine meters, 6371 km sphere, op
    order mirrored verbatim in the oracle)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM customer "
        "| EVAL lat = TO_DOUBLE((c_custkey * 7919) % 18000) / 100.0 - 90.0, "
        "lon = TO_DOUBLE((c_custkey * 104729) % 36000) / 100.0 - 180.0, "
        'p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ", '
        'TO_STRING(lat), ")")), '
        'd = ROUND(ST_DISTANCE(p, "POINT (0 0)"), 6), '
        "x = ST_X(p), y = ST_Y(p) "
        "| STATS n = COUNT(*), mx = MAX(d), sx = MIN(x), sy = MAX(y) "
        "BY c_mktsegment | SORT c_mktsegment",
        sf_dir,
    )


# 64-dim deterministic query vector shared by the ES|QL dense-vector
# queries and their oracles (literal text identical on both sides)
_ESQL_QVEC = (
    "[" + ", ".join(str(round(float(np.sin(i + 1)), 4)) for i in range(64)) + "]"
)


def _q_esql_vector(sf_dir: str) -> pa.Table:
    """ES|QL dense-vector function family (9.1+ tech preview): V_COSINE /
    V_DOT_PRODUCT / V_L1_NORM / V_L2_NORM against a literal query vector,
    plus V_MAGNITUDE — each ONE reshaped (n, d) float64 numpy expression
    per batch (`pipelines/esql.py: _dense_matrix`)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        f"FROM embeddings | EVAL cos = ROUND(V_COSINE(embedding, {_ESQL_QVEC}), 6), "
        f"dot = ROUND(V_DOT_PRODUCT(embedding, {_ESQL_QVEC}), 6), "
        f"l1 = ROUND(V_L1_NORM(embedding, {_ESQL_QVEC}), 6), "
        f"l2 = ROUND(V_L2_NORM(embedding, {_ESQL_QVEC}), 6), "
        "mag = ROUND(V_MAGNITUDE(embedding), 6) "
        "| KEEP vec_id, cos, dot, l1, l2, mag | SORT vec_id | LIMIT 600",
        sf_dir,
    )


def _q_esql_knn(sf_dir: str) -> pa.Table:
    """ES|QL KNN predicate (9.1 tech preview, positional k — documented
    deviation from ES's options map): rewritten by the compiler into a
    two-pass plan — pass 1 keeps k SCORES per block and the driver merge
    yields the kth-best cosine, pass 2 streams a plain threshold WHERE.
    The sibling conjunct (label == 1) acts as ES's knn PRE-filter: the k
    nearest among rows passing it."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        f"FROM embeddings | WHERE KNN(embedding, {_ESQL_QVEC}, 10) AND label == 1 "
        f"| EVAL cos = ROUND(V_COSINE(embedding, {_ESQL_QVEC}), 6) "
        "| KEEP vec_id, label, cos | SORT cos DESC, vec_id | LIMIT 100",
        sf_dir,
    )


_ESQL_SPATIAL_POLY = (
    "POLYGON ((-60.05 -45.05, 60.05 -45.05, 60.05 45.05, "
    "-60.05 45.05, -60.05 -45.05))"
)


def _q_esql_spatial_rel(sf_dir: str) -> pa.Table:
    """ES|QL spatial relations: ST_WITHIN / ST_INTERSECTS / ST_DISJOINT /
    ST_CONTAINS of derived geo_points against a literal TO_GEOSHAPE
    polygon (boundary-inclusive even-odd kernel, vectorized over the
    batch), plus ST_ENVELOPE + ST_XMAX/ST_YMIN extent readers."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM customer "
        "| EVAL lat = TO_DOUBLE((c_custkey * 7919) % 18000) / 100.0 - 90.0, "
        "lon = TO_DOUBLE((c_custkey * 104729) % 36000) / 100.0 - 180.0, "
        'p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ", '
        'TO_STRING(lat), ")")), '
        f'win = ST_WITHIN(p, TO_GEOSHAPE("{_ESQL_SPATIAL_POLY}")), '
        f'inter = ST_INTERSECTS(p, TO_GEOSHAPE("{_ESQL_SPATIAL_POLY}")), '
        f'dis = ST_DISJOINT(p, TO_GEOSHAPE("{_ESQL_SPATIAL_POLY}")), '
        f'cont = ST_CONTAINS(TO_GEOSHAPE("{_ESQL_SPATIAL_POLY}"), p), '
        "ex = ST_XMAX(ST_ENVELOPE(p)), ey = ST_YMIN(ST_ENVELOPE(p)) "
        "| STATS n = COUNT(*), nw = COUNT(*) WHERE win, "
        "ni = COUNT(*) WHERE inter, nd = COUNT(*) WHERE dis, "
        "nc = COUNT(*) WHERE cont, mx = MAX(ex), my = MIN(ey) "
        "BY c_mktsegment | SORT c_mktsegment",
        sf_dir,
    )


def _q_esql_score(sf_dir: str) -> pa.Table:
    """ES|QL full-text scoring (8.18+): ``FROM idx METADATA _score |
    WHERE MATCH(...)`` populates _score with the Lucene-BM25 sum of the
    MATCH conjuncts — index-global df/N/avgdl from ONE pre-pass over the
    unfiltered source (partials bounded by the query vocabulary), then
    one vectorized tf/tf_norm evaluation per batch."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM documents METADATA _score "
        '| WHERE MATCH(text, "data pipeline query engine") '
        "| EVAL s = ROUND(_score, 6) "
        "| KEEP doc_id, s | SORT s DESC, doc_id | LIMIT 50",
        sf_dir,
    )


def _q_esql_sort_nulls(sf_dir: str) -> pa.Table:
    """ES|QL SORT null placement: per-key NULLS FIRST/LAST (pc.rank per
    key + one np.lexsort — Arrow's global-placement sort_by can't express
    mixed specs); default = null LARGER than any value (ES|QL)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM events | EVAL price = CASE(event_type == "purchase", value) '
        "| KEEP event_id, price | SORT price DESC NULLS LAST, event_id "
        "| LIMIT 100",
        sf_dir,
    )


def _q_esql_temporal_math(sf_dir: str) -> pa.Table:
    """ES|QL temporal arithmetic: timestamp ± duration literals and the
    8.15 TO_TIMEDURATION / TO_DATEPERIOD string casts (fixed-width
    amounts; calendar periods stay DATE_TRUNC/BUCKET-only, the documented
    contract)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | EVAL later = ts + 2 hours, "
        'earlier = ts - TO_TIMEDURATION("90 minutes"), '
        'nxt = ts + TO_DATEPERIOD("1 week"), '
        'day = DATE_TRUNC(TO_DATEPERIOD("1 day"), ts) '
        "| KEEP event_id, later, earlier, nxt, day "
        "| SORT event_id | LIMIT 200",
        sf_dir,
    )


def _q_esql_grid_conv(sf_dir: str) -> pa.Table:
    """ES|QL 9.2 grid functions + conversion stragglers: ST_GEOHASH /
    ST_GEOTILE (string grid keys — ES's long form + _TO_STRING converters
    collapse into the one rendering the grid aggs use), TO_UNSIGNED_LONG
    (negatives convert to null like ES's range failures) and TO_VERSION
    (validated version strings; malformed → null)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM customer "
        "| EVAL lat = TO_DOUBLE((c_custkey * 7919) % 18000) / 100.0 - 90.0, "
        "lon = TO_DOUBLE((c_custkey * 104729) % 36000) / 100.0 - 180.0, "
        'p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ", '
        'TO_STRING(lat), ")")), '
        "gh = ST_GEOHASH(p, 2), gt = ST_GEOTILE(p, 4), "
        "ul = TO_UNSIGNED_LONG(TO_LONG(c_acctbal * 100.0)), "
        'ver = TO_VERSION(CONCAT(TO_STRING(c_custkey % 10), ".", '
        'TO_STRING(c_custkey % 7), ".0")), '
        "bad = TO_VERSION(c_mktsegment) "
        "| KEEP c_custkey, gh, gt, ul, ver, bad "
        "| SORT c_custkey | LIMIT 150",
        sf_dir,
    )


def _q_esql_cast_op(sf_dir: str) -> pa.Table:
    """ES|QL ``::`` cast operator: postfix sugar for the TO_* conversion
    functions (value::LONG truncates toward zero like ES)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | EVAL d = value::LONG, s = user_id::STRING "
        "| STATS n = COUNT(*), t = SUM(d) BY s | SORT s",
        sf_dir,
    )


def _q_esql_calendar_trunc(sf_dir: str) -> pa.Table:
    """ES|QL calendar-unit DATE_TRUNC / BUCKET (month, quarter, year):
    Arrow's calendar-aware floor_temporal — timestamps spread ×40 so the
    one-month test corpus crosses many calendar boundaries."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | EVAL t2 = TO_DATETIME(TO_LONG(ts) * 40), "
        "m = DATE_TRUNC(1 month, t2), q = BUCKET(t2, 1 quarter), "
        "y = DATE_TRUNC(1 year, t2) "
        "| STATS n = COUNT(*) BY m, q, y | SORT m",
        sf_dir,
    )


def _q_esql_over_time(sf_dir: str) -> pa.Table:
    """ES|QL TS-source *_OVER_TIME aggregates (decomposable trio): the
    STATS group IS the series, so they rewrite to plain MAX/SUM/COUNT at
    parse — integer-cent sum keeps the fold order-exact."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "TS events | EVAL v = ROUND(value * 100, 0) "
        "| STATS mx = MAX_OVER_TIME(value), s = SUM_OVER_TIME(v), "
        "n = COUNT_OVER_TIME(value) BY user_id | SORT user_id",
        sf_dir,
    )


def _q_esql_first_over_time(sf_dir: str) -> pa.Table:
    """ES|QL FIRST_OVER_TIME: ts-ordered endpoint partials (RATE's plan),
    combine keeps the globally earliest value per series."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "TS events | STATS f = FIRST_OVER_TIME(value) BY user_id "
        "| SORT user_id",
        sf_dir,
    )


def _q_esql_last_over_time(sf_dir: str) -> pa.Table:
    """ES|QL LAST_OVER_TIME: the latest endpoint per series."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "TS events | STATS l = LAST_OVER_TIME(value) BY user_id "
        "| SORT user_id",
        sf_dir,
    )


def _q_esql_match_phrase(sf_dir: str) -> pa.Table:
    """ES|QL MATCH_PHRASE full-text predicate: analyzed-adjacency via the
    (doc, pos − i) key-intersection plan, evaluated index-free per batch."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | WHERE MATCH_PHRASE(text, "the fast") '
        "| STATS n = COUNT(*) BY lang | SORT lang",
        sf_dir,
    )


def _q_esql_kql(sf_dir: str) -> pa.Table:
    """ES|QL KQL function: field:value leaves (term / quoted phrase /
    wildcard) with and/or/not + parentheses, resolved against the pipe
    schema; fields inside the literal feed projection pushdown."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | WHERE KQL("lang:en and (text:\\"the fast\\" '
        'or text:qu*ry)") '
        "| STATS n = COUNT(*) BY source | SORT source",
        sf_dir,
    )


def _q_esql_term_round_to(sf_dir: str) -> pa.Table:
    """ES|QL TERM (unanalyzed-query exact term) + ROUND_TO (round down to
    fixed points via one searchsorted)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | WHERE TERM(lang, "en") '
        "| EVAL b = ROUND_TO(n_chars, 0, 100, 200, 400) "
        "| STATS n = COUNT(*) BY b | SORT b",
        sf_dir,
    )


def _q_esql_date_parse(sf_dir: str) -> pa.Table:
    """ES|QL DATE_PARSE (Java pattern → strptime translation): strftime
    round-trip at minute resolution, epoch-ms output."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM events | EVAL s = DATE_FORMAT("%Y-%m-%d %H:%M", ts) '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        "| EVAL d_ms = TO_LONG(d) "
        "| KEEP event_id, d_ms | SORT event_id | LIMIT 200",
        sf_dir,
    )


def _q_esql_cidr(sf_dir: str) -> pa.Table:
    """ES|QL TO_IP + CIDR_MATCH + % operator: client IPs derived from
    user_id (the ip_range_agg convention), bucketed by CIDR membership."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM events | EVAL ip = CONCAT(TO_STRING(user_id % 256), ".", '
        'TO_STRING(user_id % 100), ".0.1") '
        '| EVAL inblock = CIDR_MATCH(TO_IP(ip), "0.0.0.0/2") '
        "| STATS n = COUNT(*) BY inblock, event_type "
        "| SORT inblock, event_type",
        sf_dir,
    )


def _q_esql_categorize(sf_dir: str) -> pa.Table:
    """ES|QL CATEGORIZE (8.18): deterministic log-pattern template
    (digit runs → <NUM>) grouped via STATS — the graft's documented
    variant of ES's drain-style categorizer."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | EVAL pat = CATEGORIZE(props) "
        "| STATS n = COUNT(*) BY pat | SORT pat | LIMIT 100",
        sf_dir,
    )


def _q_esql_stats_by(sf_dir: str) -> pa.Table:
    """ES|QL agg-less ``STATS BY``: DISTINCT over the grouping keys —
    per-batch distinct partial, distinct-again combine (bounded by key
    cardinality, never row count)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM lineitem | STATS BY l_returnflag, l_linestatus "
        "| SORT l_returnflag, l_linestatus",
        sf_dir,
    )


def _q_sql_distinct(sf_dir: str) -> pa.Table:
    """ES _sql endpoint: SELECT DISTINCT → the agg-less ``STATS BY``
    pipe (the same distinct plan as GROUP BY without aggregates)."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql(
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders "
        "ORDER BY o_orderstatus, o_orderpriority",
        sf_dir,
    )


def _q_sql_having(sf_dir: str) -> pa.Table:
    """ES _sql endpoint: HAVING → post-STATS WHERE over the aggregation
    result (alias references, ES SQL's rule) — source-to-source onto the
    ES|QL pipe like every other SQL construct."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql(
        "SELECT l_returnflag, COUNT(*) AS n, AVG(l_quantity) AS a "
        "FROM lineitem GROUP BY l_returnflag HAVING n > 14000 "
        "ORDER BY l_returnflag",
        sf_dir,
    )


def _q_sql_show_tables(sf_dir: str) -> pa.Table:
    """ES SQL ``SHOW TABLES``: the catalog from the table directory —
    independently mirrored by DuckDB's information_schema over the same
    registered views (`pipelines/sql_api.py: show_tables`)."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql("SHOW TABLES", sf_dir)


def _q_sql_describe(sf_dir: str) -> pa.Table:
    """ES SQL ``DESCRIBE embeddings``: (column, type) from the parquet
    FOOTER, Arrow→ES type names (list → dense_vector)
    (`pipelines/sql_api.py: describe_table`)."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql("DESCRIBE embeddings", sf_dir)


def _q_sql_select(sf_dir: str) -> pa.Table:
    """ES _sql endpoint: projection SELECT with alias, NOT and LIMIT."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    return run_sql(_SQL_SELECT, sf_dir)


def _q_esql_strings(sf_dir: str) -> pa.Table:
    """ES|QL string function library: CONCAT/SUBSTRING/TO_UPPER/
    STARTS_WITH in EVAL plus a LIKE wildcard predicate, all Arrow
    kernels."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_STRINGS, sf_dir)


def _q_esql_mv_expand(sf_dir: str) -> pa.Table:
    """ES|QL SPLIT + MV_EXPAND pipe: list column exploded per batch
    (flat_map), term frequencies via pure ES|QL."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_MVEXPAND, sf_dir)


def _q_esql_math(sf_dir: str) -> pa.Table:
    """ES|QL math function library: CEIL/FLOOR/SQRT/POW/LOG10/LOG(base)/
    SIGNUM in EVAL — each a single Arrow kernel per batch."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_MATH, sf_dir)


def _q_esql_string_fns(sf_dir: str) -> pa.Table:
    """ES|QL string long tail: TRIM/LEFT/RIGHT/REVERSE/ENDS_WITH/LOCATE/
    REPLACE(regex, all matches) — Arrow kernels, no per-row Python."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_STRING_FNS, sf_dir)


def _q_esql_mv_fns(sf_dir: str) -> pa.Table:
    """ES|QL multi-value functions over SPLIT lists: MV_COUNT/FIRST/LAST/
    MIN/MAX — parent-index group_by reductions, null for null lists."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_MV_FNS, sf_dir)


def _q_esql_dates(sf_dir: str) -> pa.Table:
    """ES|QL date functions: DATE_TRUNC with a temporal literal (1 day),
    DATE_EXTRACT ChronoFields, DATE_FORMAT strftime; TO_LONG(date) is
    ES's milliseconds-since-epoch."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_DATES, sf_dir)


def _q_esql_bucket(sf_dir: str) -> pa.Table:
    """ES|QL BUCKET (8.14): numeric span and temporal-literal span forms
    feeding STATS BY."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_BUCKET, sf_dir)


def _q_esql_stats_where(sf_dir: str) -> pa.Table:
    """ES|QL per-aggregate WHERE (8.16): ``STATS agg(...) WHERE cond``.
    The partial null-masks the aggregate's source column per batch — Arrow
    count/sum/min/max skip nulls, which is exactly SQL FILTER semantics;
    a fully-filtered group yields COUNT 0 and NULL for the rest."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_STATS_WHERE, sf_dir)


def _q_esql_inlinestats(sf_dir: str) -> pa.Table:
    """ES|QL INLINESTATS (8.18): grouped aggregates joined back as row
    columns — ES's own two-phase plan (agg pass bounded by group
    cardinality, broadcast once, joined per batch); later commands filter
    against the group statistic (the canonical above-average pattern)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_INLINESTATS, sf_dir)


def _q_esql_stddev(sf_dir: str) -> pa.Table:
    """ES|QL STD_DEV: population stddev from exact partial sums
    (Σx, Σx², n per batch — one Arrow hash-agg, mergeable)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_STDDEV, sf_dir)


def _q_esql_weighted_avg(sf_dir: str) -> pa.Table:
    """ES|QL WEIGHTED_AVG(value, weight): Σvw / Σw partials — AVG's
    combine with derived per-batch columns."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_WEIGHTED_AVG, sf_dir)


def _q_esql_percentile(sf_dir: str) -> pa.Table:
    """ES|QL PERCENTILE(field, p): exact value-count partials +
    quantile_cont interpolation at the combine (same plan as MEDIAN)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_PERCENTILE, sf_dir)


def _q_esql_mad(sf_dir: str) -> pa.Table:
    """ES|QL MEDIAN_ABSOLUTE_DEVIATION: median of |x − median| computed
    twice from ONE merged value-count histogram (no second pass)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_MAD, sf_dir)


def _q_esql_top(sf_dir: str) -> pa.Table:
    """ES|QL TOP(field, k, order): top-k multivalue per group expanded
    from the merged value-count histogram, capped at k."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_TOP, sf_dir)


def _q_esql_values(sf_dir: str) -> pa.Table:
    """ES|QL VALUES + COUNT_DISTINCT mixed STATS: both finish from the
    shared distinct-tuple partial; VALUES pins ascending order (ES
    documents no order guarantee) so the result is hash-stable."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_VALUES, sf_dir)


def _q_esql_sample(sf_dir: str) -> pa.Table:
    """ES|QL SAMPLE (deterministic graft variant): keep iff the first two
    sha256 bytes of the table's id column fall below p·2^16 — a pure
    function of the row, so the sample is identical on any cluster size
    or shard order (documented deviation from ES's RNG sampling)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_SAMPLE, sf_dir)


def _q_esql_fork(sf_dir: str) -> pa.Table:
    """ES|QL FORK: branch pipes over the shared head, unioned under a
    ``_fork`` discriminator with null-filled schema alignment (ES 9.x).
    Each branch is its own streamed pass — ES's plan also executes
    branches separately."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_FORK, sf_dir)


def _q_esql_change_point(sf_dir: str) -> pa.Table:
    """ES|QL CHANGE_POINT: deterministic mean-shift detector — split
    minimizing two-segment SSE over the key-sorted series; marks the
    first right-segment row with type/pvalue (unexplained-variance
    ratio).  Driver-side by construction (ES caps the input at 1000
    buckets)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_CHANGE_POINT, sf_dir)


def _q_esql_completion(sf_dir: str) -> pa.Table:
    """ES|QL COMPLETION (9.1): prompt expression → registered inference
    endpoint per batch.  No model runtime in the container, so the
    endpoint is the deterministic ``test_echo`` fake (multimodal-stub
    policy); the command plumbing is real and oracle-gated."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_COMPLETION, sf_dir)


def _q_esql_rerank(sf_dir: str) -> pa.Table:
    """ES|QL RERANK (9.1): per-batch vectorized scorer into ``_score``.
    The registered ``test_reranker`` is a deterministic token-overlap
    relevance (|distinct matched| / |query tokens|) — the semantic-model
    slot is one registry entry."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_RERANK, sf_dir)


def _q_esql_post_stats(sf_dir: str) -> pa.Table:
    """ES|QL post-STATS command tail: WHERE/EVAL and a second STATS over
    the aggregation result — the combined table is group-bounded and
    driver-side, so the tail is a local fold (ES executes the same way:
    each STATS starts a new pipeline stage)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_POST_STATS, sf_dir)


def _q_esql_ts_rate(sf_dir: str) -> pa.Table:
    """ES|QL TS source + RATE aggregate (9.x time-series): per-batch
    per-group endpoint partials (first/last value, min/max ts — one
    sorted Arrow hash-agg), driver combine keeps the globally earliest/
    latest endpoint per group; rate = Δvalue/Δseconds.  Documented
    variant: no counter-reset compensation (events.value is a gauge; the
    TSDS downsample pipeline owns counter semantics)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_TS_RATE, sf_dir)


def _q_esql_match(sf_dir: str) -> pa.Table:
    """ES|QL MATCH(field, query) full-text predicate (9.x): OR of
    analyzed query terms, evaluated index-free per batch with the SAME
    analyzer as the engine's index — one tokenize + is_in kernel."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_MATCH, sf_dir)


def _q_esql_qstr(sf_dir: str) -> pa.Table:
    """ES|QL QSTR full-text predicate: Lucene query_string boolean tree
    (AND/OR/NOT, +/-, parens, wildcards, exact phrases) over the analyzed
    field; fuzzy/range/sloppy leaves refuse at plan time with a pointer
    at the index-backed query_string_topk pipeline."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_QSTR, sf_dir)


def _q_esql_fork_rrf(sf_dir: str) -> pa.Table:
    """ES|QL ``FORK (…) (…) | RRF``: reciprocal-rank fusion of two
    reranked branches — per-branch (score DESC, id ASC) ranks,
    fused = Σ 1/(60 + rank) (ES's rank_constant default), bounded
    driver fold over the already-small branch results."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_FORK_RRF, sf_dir)


def _q_esql_fuse(sf_dir: str) -> pa.Table:
    """ES|QL 9.2 ``FUSE linear``: weight-1 / normalizer-none sum of the
    branch ``_score``s per id (FUSE's defaults) — same bounded driver
    fold as RRF; ``FUSE`` with no method is RRF."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_FUSE_LINEAR, sf_dir)


def _q_esql_insist(sf_dir: str) -> pa.Table:
    """ES|QL ``INSIST_\U0001F414`` (9.x tech preview): a mapped field
    passes through, an unmapped one enters the pipe as a null keyword
    column (COALESCE-able downstream) — both directions in one pipe
    (`pipelines/esql.py`)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM documents | INSIST_\U0001F414 lang | INSIST_\U0001F414 ghost "
        '| EVAL tag = COALESCE(ghost, lang) '
        "| STATS n = COUNT(*) BY tag | SORT tag",
        sf_dir,
    )


def _q_esql_show(sf_dir: str) -> pa.Table:
    """ES|QL ``SHOW INFO``: the deterministic one-row version source,
    composed with EVAL/KEEP tail commands like any ROW pipe."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'SHOW INFO | EVAL major = SUBSTRING(version, 1, 1) '
        "| KEEP version, major, hash, date",
        sf_dir,
    )


def _q_esql_case(sf_dir: str) -> pa.Table:
    """ES|QL CASE conditional + IN list predicate, aggregated by the
    derived bucket."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        'FROM documents | WHERE lang IN ("en", "fr", "es") '
        '| EVAL size = CASE(n_chars > 400, "big", n_chars > 200, "mid", "small") '
        "| STATS n = COUNT(*) BY size | SORT size",
        sf_dir,
    )


def _q_esql_median(sf_dir: str) -> pa.Table:
    """ES|QL MEDIAN: per-batch value-count partials, driver weighted
    quantile_cont interpolation."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | EVAL cents = ROUND(value * 100, 0) "
        "| STATS m = MEDIAN(cents) BY event_type | SORT event_type",
        sf_dir,
    )


def _q_esql_count_distinct(sf_dir: str) -> pa.Table:
    """ES|QL COUNT_DISTINCT: per-batch distinct-row partials, driver
    distinct-then-count combine."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id) BY event_type "
        "| SORT event_type",
        sf_dir,
    )


def _q_esql_enrich(sf_dir: str) -> pa.Table:
    """ES|QL ENRICH: the nations policy index broadcast + per-batch join,
    aggregated by enriched region name."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_ENRICH, sf_dir)


def _q_esql_lookup(sf_dir: str) -> pa.Table:
    """ES|QL RENAME + LOOKUP JOIN pipe: broadcast right side, one Arrow
    join per batch, mergeable STATS over the joined stream (integer-cent
    sums stay order-exact)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_LOOKUP, sf_dir)


def _q_esql_topn(sf_dir: str) -> pa.Table:
    """ES|QL EVAL + SORT/LIMIT pipe: per-batch partial top-k, driver merge."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_TOPN, sf_dir)


def _q_esql_eval(sf_dir: str) -> pa.Table:
    """ES|QL EVAL with functions (LENGTH, ROUND) + WHERE + KEEP projection."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    return run_esql(_ESQL_EVAL, sf_dir)


# The driver's per-round correctness gate samples the FIRST 50 dict entries
# of queries().  Each round rotates a window of not-yet-driver-sampled
# entries to the front so the external hard signal keeps growing: r1-r3
# covered the core engine + spans + suggesters, r4 covered ES|QL/SQL, the
# agg long tail and the ML family.  The r5 window is DISJOINT from all
# 118 previously-sampled names (VERDICT r4 item 1): this session's changed
# paths first (search_api_aggs — full-hit-set agg semantics; nb_predict —
# artifact path; the three new ADVICE-fix queries), then the oldest
# never-sampled families: the Lucene query DSL long tail, EQL, lifecycle
# APIs, fields/rank_feature, and the curation/text-quality operators.
# Everything else follows in its original order, so nothing is removed.
_FRONT_50 = [
    # changed this round — the external gate matters most here
    "search_api_aggs", "nb_predict", "bool_filter_should",
    "bool_must_not_only", "intervals_range", "perplexity_buckets", "match_operator_and",
    # Lucene query DSL long tail (never driver-sampled)
    "simple_query_string", "min_should_match", "dis_max", "boosting",
    "multi_match", "multi_match_cross", "match_bool_prefix",
    "constant_score", "pinned", "rule_query", "wrapper_topk", "bool_query",
    "regexp_match", "wildcard_match", "named_queries", "post_filter_hits",
    "post_filter_aggs",
    # EQL
    "eql_funnel", "eql_head", "eql_unique", "eql_sample",
    # lifecycle / search APIs
    "scroll", "sliced_scroll", "async_search", "mget", "msearch",
    "search_template", "validate_query", "field_caps", "cat_segments",
    "disk_usage", "profile", "filtered_alias",
    # fields / rank features
    "sparse_vector", "rank_feature", "rank_feature_sigmoid",
    "runtime_field", "field_presence", "exists_docs",
    # curation / text quality
    "curriculum", "mixing_weights", "quality_classifier", "redact_pii",
    ]


def _rotate_front(qs: dict[str, Callable[[str], Any]]) -> dict[str, Callable[[str], Any]]:
    out = {k: qs[k] for k in _FRONT_50 if k in qs}
    out.update((k, v) for k, v in qs.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    return _rotate_front({
        # core engine (SURVEY.md §2)
        "doc_stats": _q_doc_stats,
        "token_counts": _q_token_counts,
        "ingest_sha": _q_ingest_sha,
        "term_df": _q_term_df,
        "postings": _q_postings,
        "bm25_topk": _q_bm25_topk,
        "synonym_match": _q_synonym_match,
        "search_api": _q_search_api,
        "search_api_aggs": _q_search_api_aggs,
        "search_api_sorted": _q_search_api_sorted,
        "match_operator_and": _q_match_operator_and,
        "bool_filter_should": _q_bool_filter_should,
        "bool_must_not_only": _q_bool_must_not_only,
        "intervals_range": _q_intervals_range,
        "bm25_topk_routed": _q_bm25_topk_routed,
        "bm25_topk_federated": _q_bm25_topk_federated,
        "indices_boost": _q_indices_boost,
        "reshard_topk": _q_reshard_topk,
        "pit_search": _q_pit_search,
        "boolean_and": _q_boolean_and,
        "boolean_or": _q_boolean_or,
        "boolean_not": _q_boolean_not,
        "phrase_match": _q_phrase_match,
        "phrase_topk": _q_phrase_topk,
        "span_first": _q_span_first,
        "span_near": _q_span_near,
        "span_containing": _q_span_containing,
        "field_masking_span": _q_field_masking_span,
        "span_within": _q_span_within,
        "span_or": _q_span_or,
        "span_multi": _q_span_multi,
        "span_not": _q_span_not,
        "phrase_prefix": _q_phrase_prefix,
        "decay_topk": _q_decay_topk,
        "distance_feature": _q_distance_feature,
        "prefix_match": _q_prefix_match,
        "fuzzy_match": _q_fuzzy_match,
        "fuzzy_transpositions": _q_fuzzy_transpositions,
        "term_suggest": _q_term_suggest,
        "completion_suggest": _q_completion_suggest,
        "completion_contexts": _q_completion_contexts,
        "terms_enum": _q_terms_enum,
        "rescore": _q_rescore,
        "phrase_slop": _q_phrase_slop,
        "analyze": _q_analyze,
        "analyze_stop": _q_analyze_stop,
        "analyze_stem": _q_analyze_stem,
        "stemmed_topk": _q_stemmed_topk,
        "histogram_field": _q_histogram_field,
        "histogram_percentiles": _q_histogram_percentiles,
        "search_as_you_type": _q_search_as_you_type,
        "nested_inner_hits": _q_nested_inner_hits,
        "mixture_select": _q_mixture_select,
        "fim_examples": _q_fim_examples,
        "t5_spans": _q_t5_spans,
        "lg_batches": _q_lg_batches,
        "repo_pack": _q_repo_pack,
        "ip_range": _q_ip_range,
        "ip_prefix": _q_ip_prefix,
        "bulk_apply": _q_bulk_apply,
        "query_string": _q_query_string,
        "parent_id": _q_parent_id,
        "colbert_maxsim": _q_colbert_maxsim,
        "terms_shard_error": _q_terms_shard_error,
        "heavy_hitters": _q_heavy_hitters,
        "latest_event": _q_latest_event,
        "watcher_alerts": _q_watcher_alerts,
        "graph_explore": _q_graph_explore,
        "term_vectors": _q_term_vectors,
        "terms_agg": _q_terms_agg,
        "rare_terms": _q_rare_terms,
        "multi_terms": _q_multi_terms,
        "weighted_avg": _q_weighted_avg,
        "mad_dl": _q_mad_dl,
        "histogram_agg": _q_histogram_agg,
        "range_agg": _q_range_agg,
        "adjacency_matrix": _q_adjacency_matrix,
        "sampler_agg": _q_sampler_agg,
        "extended_stats": _q_extended_stats,
        "matrix_stats": _q_matrix_stats,
        "boxplot": _q_boxplot,
        "string_stats": _q_string_stats,
        "t_test": _q_t_test,
        "moving_fn": _q_moving_fn,
        "filters_agg": _q_filters_agg,
        "date_range": _q_date_range,
        "rate_agg": _q_rate_agg,
        "tsds_downsample": _q_tsds_downsample,
        "time_series": _q_time_series,
        "bucket_script": _q_bucket_script,
        "geo_bounds": _q_geo_bounds,
        "eql_funnel": _q_eql_funnel,
        "eql_head": _q_eql_head,
        "eql_unique": _q_eql_unique,
        "eql_sample": _q_eql_sample,
        "eql_sequence": _q_eql_sequence,  # rows-only (iterative machine)
        "sig_terms": _q_sig_terms,
        "sig_terms_chi2": _q_sig_terms_chi2,
        "significant_text": _q_significant_text,
        "terms_stats": _q_terms_stats_agg,
        "terms_order_metric": _q_terms_order_metric,
        "composite_page2": _q_composite_page2,
        "percentiles": _q_percentiles,
        "percentile_ranks": _q_percentile_ranks,
        "match_count": _q_match_count,
        "count_terminated": _q_count_terminated,
        "index_sorted_topk": _q_index_sorted_topk,
        "mget": _q_mget,
        "ids_query": _q_ids_query,
        "percolate": _q_percolate,
        "percolate_phrase": _q_percolate_phrase,
        "prf_expand": _q_prf_expand,
        "rank_eval": _q_rank_eval,
        "hard_negatives": _q_hard_negatives,
        "bpe_merges": _q_bpe_merges,
        "bpe_corpus_tokens": _q_bpe_corpus_tokens,
        "bpe_pack": _q_bpe_pack,
        "dpr_triples": _q_dpr_triples,
        "date_histogram_pipeline": _q_date_histogram_pipeline,
        "bucket_selector": _q_bucket_selector,
        "sibling_bucket_stats": _q_sibling_bucket_stats,
        "histogram_field_stats": _q_histogram_field_stats,
        "serial_diff": _q_serial_diff,
        "derivative": _q_derivative,
        "cumulative_sum": _q_cumulative_sum,
        "moving_percentiles": _q_moving_percentiles,
        "change_point": _q_change_point,
        "bucket_sort": _q_bucket_sort,
        "terms_set": _q_terms_set,
        "top_metrics": _q_top_metrics,
        "diversified_sampler": _q_diversified_sampler,
        "phrase_suggest": _q_phrase_suggest,
        "stratified_sample": _q_stratified_sample,
        "auto_date_histogram": _q_auto_date_histogram,
        "cumulative_cardinality": _q_cumulative_cardinality,
        "normalize_agg": _q_normalize_agg,
        "geo_rings": _q_geo_rings,
        "rank_feature": _q_rank_feature,
        "rank_feature_sigmoid": _q_rank_feature_sigmoid,
        "scroll": _q_scroll,
        "sliced_scroll": _q_sliced_scroll,
        "unigram_logprob": _q_unigram_logprob,
        "perplexity_buckets": _q_perplexity_buckets,
        "chunk_documents": _q_chunk_documents,
        "pmi_collocations": _q_pmi_collocations,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "pack_sequences": _q_pack_sequences,
        "shuffle_order": _q_shuffle_order,
        "distinct_counts": _q_distinct_counts,
        "cardinality_hll": _q_cardinality_hll,  # rows-only (HLL approximate)
        "more_like_this": _q_more_like_this,
        "mlt_unlike": _q_mlt_unlike,
        "terms_lookup": _q_terms_lookup,
        "search_after": _q_search_after,
        "min_should_match": _q_min_should_match,
        "range_topk": _q_range_topk,
        "sort_by_dl": _q_sort_by_dl,
        "highlight": _q_highlight,
        "highlight_frags": _q_highlight_frags,
        "regexp_match": _q_regexp_match,
        "wildcard_match": _q_wildcard_match,
        "dis_max": _q_dis_max,
        "boosting": _q_boosting,
        "multi_match": _q_multi_match,
        "multi_match_cross": _q_multi_match_cross,
        "combined_fields": _q_combined_fields,
        "dup_clusters": _q_dup_clusters,
        "duplicate_spans": _q_duplicate_spans,
        "geohash_grid": _q_geohash_grid,
        "random_score": _q_random_score,
        "runtime_field": _q_runtime_field,
        "hybrid_linear": _q_hybrid_linear,
        "hybrid_linear_l2": _q_hybrid_linear_l2,
        "dedup_keep_best": _q_dedup_keep_best,
        "mixing_weights": _q_mixing_weights,
        "intervals": _q_intervals,
        "intervals_algebra": _q_intervals_algebra,
        "intervals_prefix": _q_intervals_prefix,
        "sparse_vector": _q_sparse_vector,
        "bigram_logprob": _q_bigram_logprob,
        "hopping_window": _q_hopping_window,
        "max_passage": _q_max_passage,
        "terms_partitioned": _q_terms_partitioned,
        "var_width_histogram": _q_var_width_histogram,
        "frequent_item_sets": _q_frequent_item_sets,
        "geo_polygon": _q_geo_polygon,
        "geo_shape": _q_geo_shape,
        "geo_sort": _q_geo_sort,
        "suffix_match": _q_suffix_match,
        "wildcard_field": _q_wildcard_field,
        "cat_segments": _q_cat_segments,
        "completion_fuzzy": _q_completion_fuzzy,
        "zipf_fit": _q_zipf_fit,
        "model_rerank": _q_model_rerank,
        "knn_int8": _q_knn_int8,
        "knn_int4": _q_knn_int4,
        "knn_bbq": _q_knn_bbq,
        "percentiles_bucket": _q_percentiles_bucket,
        "bucket_correlation": _q_bucket_correlation,
        "bucket_ks_test": _q_bucket_ks_test,
        "percentiles_tdigest": _q_percentiles_tdigest,
        "geo_line": _q_geo_line,
        "match_bool_prefix": _q_match_bool_prefix,
        "constant_score": _q_constant_score,
        "pinned": _q_pinned,
        "rule_query": _q_rule_query,
        "simple_query_string": _q_simple_query_string,
        "field_caps": _q_field_caps,
        "global_hits": _q_global_hits,
        "field_presence": _q_field_presence,
        "exists_docs": _q_exists_docs,
        "scripted_metric": _q_scripted_metric,
        "categorize_text": _q_categorize_text,
        "msearch": _q_msearch,
        "search_template": _q_search_template,
        "validate_query": _q_validate,
        "bool_query": _q_bool_query,
        "wrapper_topk": _q_wrapper,
        "synonym_topk": _q_synonym_topk,
        "delete_query_topk": _q_delete_query_topk,
        "function_score_topk": _q_function_score_topk,
        "function_score_sum": _q_function_score_sum,
        "script_score_topk": _q_script_score,
        "explain": _q_explain,
        "collapse_topk": _q_collapse_topk,
        "collapse_inner": _q_collapse_inner,
        "post_filter_hits": _q_post_filter_hits,
        "post_filter_aggs": _q_post_filter_aggs,
        "named_queries": _q_named_queries,
        "rrf_hybrid": _q_rrf_hybrid,
        "retriever_tree": _q_retriever_tree,
        "ltr_features": _q_ltr_features,
        "rank_eval_graded": _q_rank_eval_graded,
        "mmr_rerank": _q_mmr_rerank,
        "knn_similarity": _q_knn_similarity,
        "ann_hnsw": _q_ann_hnsw,
        "profile": _q_profile,
        "disk_usage": _q_disk_usage,
        "curriculum": _q_curriculum,
        "filtered_alias": _q_filtered_alias,
        "async_search": _q_async_search,
        "top_hits": _q_top_hits,
        "lang_counts": _q_lang_counts,
        "update_lang_counts": _q_update_lang_counts,
        "enrich_customers": _q_enrich,
        "enrich_range": _q_enrich_range,
        "rollup_search": _q_rollup,
        "transform_pivot": _q_transform,
        # training-data operators
        "exact_dedup": _q_exact_dedup,
        "dsir_select": _q_dsir,
        "decontaminate": _q_decontaminate,
        "jaccard_dups": _q_jaccard_dups,
        "minhash_dups": _q_minhash_dups,  # rows-only (probabilistic recall)
        "simhash": _q_simhash,  # rows-only (hash function not SQL-expressible)
        "quality_scores": _q_quality,
        "tokenizer_stats": _q_tokenizer_stats,
        "mlm_examples": _q_mlm_examples,
        "simulate_pipeline": _q_simulate_pipeline,
        "ingest_kv": _q_ingest_kv,
        "simulate_grok": _q_simulate_grok,
        "percolate_bool": _q_percolate_bool,
        "quality_classifier": _q_quality_classifier,
        "token_count_bpe": _q_bpe,
        "lang_id": _q_lang_id,  # rows-only (heuristic model)
        "doc_fingerprints": _q_fingerprints,  # rows-only (rolling hash)
        "redact_pii": _q_redact_pii,
        "repetition_stats": _q_repetition_stats,
        "hash_split": _q_hash_split,
        "ann_topk": _q_ann_topk,
        "ann_filtered": _q_ann_filtered,
        "ann_lsh": _q_ann_lsh,  # rows-only (approximate)
        "ann_ivf": _q_ann_ivf,  # rows-only (approximate)
        "sem_dedup": _q_sem_dedup,  # rows-only (k-means not SQL-expressible)
        "cluster_sample": _q_cluster_sample,  # rows-only (k-means)
        "cosine_dups": _q_cosine_dups,
        "knn_graph": _q_knn_graph,
        "knn_graph_lsh": _q_knn_graph_lsh,  # rows-only (approximate recall)
        "outlier_scores": _q_outlier_scores,
        "outlier_scores_lsh": _q_outlier_scores_lsh,  # rows-only (approximate)
        "cosine_dups_lsh": _q_cosine_dups_lsh,  # rows-only (approximate recall)
        "media_features": _q_media_features,  # rows-only (synthetic media)
        # composed curation pipelines
        "curated_corpus": _q_curated,
        "top_quality_per_lang": _q_top_quality_per_lang,
        "source_stats": _q_source_stats,
        "source_filter": _q_source_filter,
        "nb_train": _q_nb_train,
        "nb_predict": _q_nb_predict,
        "ols_fit": _q_ols_fit,
        "inference_agg": _q_inference_agg,
        "ols_predict": _q_ols_predict,
        "anomaly_scores": _q_anomaly_scores,
        "pca_fit": _q_pca_fit,  # rows-only (eigendecomposition not SQL-expressible)
        "pca_project": _q_pca_project,  # rows-only (same)
        "kmeans_fit": _q_kmeans_fit,  # rows-only (iterative clustering)
        "kmeans_assign": _q_kmeans_assign,  # rows-only (same)
        "embedding_report": _q_embedding_report,  # rows-only (composition)
        # parent-child join queries over orders/lineitem
        "has_child": _q_has_child,
        "nested_query": _q_nested_query,
        "reverse_nested": _q_reverse_nested,
        "children_agg": _q_children_agg,
        "parent_agg": _q_parent_agg,
        "ext_stats_bucket": _q_ext_stats_bucket,
        "count_api": _q_count_api,
        "has_parent": _q_has_parent,
        # geo queries / aggs over the derived customer geo_point
        "geo_distance": _q_geo_distance,
        "geo_bbox": _q_geo_bbox,
        "geo_centroid": _q_geo_centroid,
        "geotile_grid": _q_geotile_grid,
        "geohex_grid": _q_geohex_grid,
        "search_mvt": _q_search_mvt,
        "cartesian_agg": _q_cartesian_agg,
        "ingest_transforms": _q_ingest_transforms,
        # ES|QL pipes (`POST /_query`)
        "esql_stats": _q_esql_stats,
        "esql_topn": _q_esql_topn,
        "esql_eval": _q_esql_eval,
        "esql_grok": _q_esql_grok,
        "esql_dissect": _q_esql_dissect,
        "esql_lookup": _q_esql_lookup,
        "esql_mv_expand": _q_esql_mv_expand,
        "esql_strings": _q_esql_strings,
        "sql_group": _q_sql_group,
        "esql_enrich": _q_esql_enrich,
        "esql_count_distinct": _q_esql_count_distinct,
        "esql_median": _q_esql_median,
        "esql_case": _q_esql_case,
        "esql_show": _q_esql_show,
        "esql_insist": _q_esql_insist,
        "esql_math": _q_esql_math,
        "esql_vector": _q_esql_vector,
        "esql_knn": _q_esql_knn,
        "esql_spatial_rel": _q_esql_spatial_rel,
        "esql_grid_conv": _q_esql_grid_conv,
        "esql_temporal_math": _q_esql_temporal_math,
        "esql_sort_nulls": _q_esql_sort_nulls,
        "esql_fuse": _q_esql_fuse,
        "esql_score": _q_esql_score,
        "esql_string_fns": _q_esql_string_fns,
        "esql_mv_fns": _q_esql_mv_fns,
        "esql_dates": _q_esql_dates,
        "esql_bucket": _q_esql_bucket,
        "esql_stats_where": _q_esql_stats_where,
        "esql_inlinestats": _q_esql_inlinestats,
        "esql_stddev": _q_esql_stddev,
        "esql_weighted_avg": _q_esql_weighted_avg,
        "esql_percentile": _q_esql_percentile,
        "esql_mad": _q_esql_mad,
        "esql_top": _q_esql_top,
        "esql_values": _q_esql_values,
        "esql_sample": _q_esql_sample,
        "esql_fork": _q_esql_fork,
        "esql_change_point": _q_esql_change_point,
        "esql_completion": _q_esql_completion,
        "esql_rerank": _q_esql_rerank,
        "esql_fork_rrf": _q_esql_fork_rrf,
        "esql_post_stats": _q_esql_post_stats,
        "esql_match": _q_esql_match,
        "esql_qstr": _q_esql_qstr,
        "esql_ts_rate": _q_esql_ts_rate,
        "sql_select": _q_sql_select,
        "sql_show_tables": _q_sql_show_tables,
        "sql_describe": _q_sql_describe,
        "sql_having": _q_sql_having,
        "sql_distinct": _q_sql_distinct,
        "esql_stats_by": _q_esql_stats_by,
        "esql_categorize": _q_esql_categorize,
        "esql_mv_reduce": _q_esql_mv_reduce,
        "esql_mv_slice": _q_esql_mv_slice,
        "esql_mv_stats": _q_esql_mv_stats,
        "esql_mv_concat": _q_esql_mv_concat,
        "esql_ip_prefix": _q_esql_ip_prefix,
        "esql_match_phrase": _q_esql_match_phrase,
        "esql_kql": _q_esql_kql,
        "esql_term_round_to": _q_esql_term_round_to,
        "esql_metadata": _q_esql_metadata,
        "esql_chrono_fields": _q_esql_chrono_fields,
        "esql_spatial": _q_esql_spatial,
        "esql_cast_op": _q_esql_cast_op,
        "esql_calendar_trunc": _q_esql_calendar_trunc,
        "esql_over_time": _q_esql_over_time,
        "esql_first_over_time": _q_esql_first_over_time,
        "esql_last_over_time": _q_esql_last_over_time,
        "esql_date_parse": _q_esql_date_parse,
        "esql_cidr": _q_esql_cidr,
        # stream-shaped ops over the ordered events log
        "tumbling_window": _q_tumbling_window,
        "date_histogram": _q_date_histogram,
        "sessionize": _q_sessionize,
    })


# ---------------------------------------------------------------------------
# SQL oracle.  Shared CTE prelude: tokenize documents with string_split —
# exact for this corpus because the engine tokenizer emits plain lowercase
# words once each (FIXTURES.md §A) — plus the deterministic fixture query
# set of FIXTURES.md §C.

_PRELUDE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
df AS (
  SELECT term, count(*)::DOUBLE AS df, sum(tf) AS cf FROM tf GROUP BY term
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS idx
  FROM (SELECT DISTINCT term FROM toks)
),
nv AS (SELECT count(*) AS c FROM vocab),
qidx AS (
  SELECT q, unnest(list_distinct(
           ([q % c, (7*q+3) % c, (13*q+11) % c])[: 1 + q % 3])) AS idx
  FROM generate_series(0, {nq1}) AS t(q), nv
),
qterm AS (
  SELECT q AS query_id, v.term FROM qidx JOIN vocab v ON v.idx = qidx.idx
)
""".replace("{nq1}", str(_N_QUERIES - 1))

# deterministic synthetic geo_point — mirrors pipelines/geo.derive_coords
_GEO_PTS = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon,
         c_mktsegment, c_acctbal
  FROM customer
)
"""


def oracle_sql() -> dict[str, str]:
    sql = {
        "doc_stats": _PRELUDE
        + """
SELECT n::BIGINT AS n_docs, (SELECT sum(dl)::BIGINT FROM dl) AS total_dl,
       round(avgdl, 6) AS avgdl
FROM stats
""",
        "token_counts": """
SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
FROM documents ORDER BY doc_id
""",
        "ingest_sha": """
SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id
""",
        # index sorting: top-50 by (dl ASC, doc_id ASC) — dl is the
        # whitespace token count on this corpus (token_counts oracle)
        "index_sorted_topk": """
SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
FROM documents ORDER BY dl, doc_id LIMIT 50
""",
        "term_df": _PRELUDE
        + """
SELECT term, df::BIGINT AS df, cf::BIGINT AS cf FROM df ORDER BY term
""",
        "postings": _PRELUDE
        + """
SELECT term, doc_id, tf::BIGINT AS tf FROM tf ORDER BY term, doc_id
""",
        "synonym_match": _PRELUDE
        + """
, qg AS (
  SELECT qt.query_id, v.idx AS gid, v.term AS t1, v2.term AS t2
  FROM qterm qt
  JOIN vocab v ON v.term = qt.term
  CROSS JOIN nv
  JOIN vocab v2 ON v2.idx = (v.idx * 31 + 7) % nv.c
),
members AS (
  SELECT DISTINCT query_id, gid, t1 AS term FROM qg
  UNION
  SELECT DISTINCT query_id, gid, t2 AS term FROM qg
),
gdf AS (
  SELECT m.query_id, m.gid, max(df.df) AS df
  FROM members m JOIN df ON df.term = m.term GROUP BY 1, 2
),
gtf AS (
  SELECT m.query_id, m.gid, tf.doc_id, sum(tf.tf) AS tf
  FROM members m JOIN tf ON tf.term = m.term GROUP BY 1, 2, 3
),
scored AS (
  SELECT g.query_id, g.doc_id,
         round(sum( ln(1 + (s.n - gd.df + 0.5) / (gd.df + 0.5))
                    * g.tf / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM gtf g
  JOIN gdf gd ON gd.query_id = g.query_id AND gd.gid = g.gid
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        "search_api_sorted": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT sc.query_id,
         row_number() OVER (
           PARTITION BY sc.query_id
           ORDER BY d2.dl ASC, sc.score DESC, sc.doc_id ASC
         ) AS rank,
         sc.doc_id, sc.score
  FROM scored sc JOIN dl d2 ON d2.doc_id = sc.doc_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        "search_api_aggs": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)
SELECT sc.query_id, d.lang, count(*)::BIGINT AS doc_count
FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # match operator=and: docs holding EVERY distinct query term;
        # scores stay the BM25 sum over the matched terms
        "match_operator_and": _PRELUDE
        + """
, nq AS (SELECT query_id, count(DISTINCT term) AS nt FROM qterm GROUP BY 1),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score,
         count(DISTINCT qt.term) AS n_match
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT sc.query_id,
         row_number() OVER (
           PARTITION BY sc.query_id ORDER BY sc.score DESC, sc.doc_id ASC
         ) AS rank,
         sc.doc_id, sc.score
  FROM scored sc JOIN nq ON nq.query_id = sc.query_id
  WHERE sc.n_match = nq.nt
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # bool filter+should, msm default 0: the filter set IS the hit
        # set; the should term contributes optional score (0 elsewhere)
        "bool_filter_should": _PRELUDE
        + """
, t0 AS (SELECT term FROM vocab WHERE idx = 0),
t1 AS (SELECT term FROM vocab WHERE idx = 1),
filt AS (SELECT DISTINCT tf.doc_id FROM tf JOIN t0 ON tf.term = t0.term),
sc AS (
  SELECT tf.doc_id,
         round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
           AS score
  FROM tf JOIN t1 ON tf.term = t1.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
hits AS (
  SELECT f.doc_id, coalesce(sc.score, 0.0) AS score
  FROM filt f LEFT JOIN sc ON sc.doc_id = f.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
       doc_id, score
FROM hits ORDER BY rank
""",
        # pure must_not bool: every doc except the matches, score 0
        "bool_must_not_only": _PRELUDE
        + """
, t0 AS (SELECT term FROM vocab WHERE idx = 0),
nd AS (SELECT DISTINCT tf.doc_id FROM tf JOIN t0 ON tf.term = t0.term),
hits AS (
  SELECT d.doc_id FROM dl d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM nd)
)
SELECT row_number() OVER (ORDER BY doc_id ASC)::BIGINT AS rank,
       doc_id, 0.0 AS score
FROM hits ORDER BY rank
""",
        # intervals range source: single-token any_of expansion — minimal
        # intervals are exactly the matching token positions
        "intervals_range": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS p
  FROM documents
),
m0 AS (SELECT DISTINCT doc_id, p FROM toks WHERE w >= 't'),
m1 AS (SELECT DISTINCT doc_id, p FROM toks WHERE w > 'o' AND w <= 's'),
u AS (
  SELECT 0 AS spec, doc_id, p FROM m0
  UNION ALL
  SELECT 1, doc_id, p FROM m1
),
sel AS (
  SELECT spec, doc_id, p,
         row_number() OVER (PARTITION BY spec, doc_id ORDER BY p) AS rn,
         count(*) OVER (PARTITION BY spec, doc_id) AS n
  FROM u
)
SELECT spec::BIGINT AS spec, doc_id, n::BIGINT AS n_intervals,
       p AS first_start, p AS first_end
FROM sel WHERE rn = 1 ORDER BY spec, doc_id
""",
        "bm25_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # search_after pagination: page 2 = global ranks k+1..2k (the engine
        # pages through page 1's last (score, doc_id) cursor; strict-after
        # filtering over unique doc_ids equals ranks > k exactly)
        "search_after": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank > {k} AND rank <= 2 * {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        "boolean_and": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
)
SELECT h.query_id, h.doc_id
FROM hits h JOIN qn USING (query_id) WHERE h.m = qn.nt
ORDER BY query_id, doc_id
""",
        # ES _count API: per-query conjunctive match COUNT (no hits fetched)
        "count_api": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
c AS (
  SELECT h.query_id, count(*)::BIGINT AS n
  FROM hits h JOIN qn USING (query_id) WHERE h.m = qn.nt
  GROUP BY h.query_id
)
SELECT q.query_id, coalesce(c.n, 0)::BIGINT AS "count"
FROM qn q LEFT JOIN c USING (query_id)
ORDER BY query_id
""",
        "boolean_or": _PRELUDE
        + """
SELECT DISTINCT qt.query_id, tf.doc_id
FROM qterm qt JOIN tf ON tf.term = qt.term
ORDER BY query_id, doc_id
""",
        "boolean_not": _PRELUDE
        + """
, qfirst AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id ORDER BY term) AS rn,
           count(*) OVER (PARTITION BY query_id) AS nt
    FROM (SELECT DISTINCT query_id, term FROM qterm)
  ) WHERE rn = 1 AND nt >= 2
),
qrest AS (
  SELECT DISTINCT q.query_id, q.term FROM qterm q
  JOIN qfirst f ON f.query_id = q.query_id AND q.term <> f.term
),
pos AS (
  SELECT f.query_id, tf.doc_id FROM qfirst f JOIN tf ON tf.term = f.term
),
neg AS (
  SELECT DISTINCT r.query_id, tf.doc_id FROM qrest r JOIN tf ON tf.term = r.term
)
SELECT p.query_id, p.doc_id FROM pos p
ANTI JOIN neg n ON n.query_id = p.query_id AND n.doc_id = p.doc_id
ORDER BY query_id, doc_id
""",
        # phrase queries: query q = tokens [q%7, q%7+1] of doc (q*17) mod n;
        # the corpus is single-space bag-of-words (FIXTURES.md §A), so
        # "phrase present" == literal ' phrase ' substring of ' text '.
        "phrase_match": """
WITH nd AS (SELECT count(*) AS c FROM documents),
phq AS (
  SELECT q AS query_id, (q * 17) % c AS sel, q % 7 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
phr AS (
  SELECT p.query_id,
         list_extract(string_split(d.text, ' '), 1 + p.off) || ' ' ||
         list_extract(string_split(d.text, ' '), 2 + p.off) AS phrase
  FROM phq p JOIN documents d ON d.doc_id = p.sel
)
SELECT p.query_id::BIGINT AS query_id, d.doc_id::BIGINT AS doc_id
FROM phr p
JOIN documents d ON contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        "phrase_topk": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
phq AS (
  SELECT q AS query_id, (q * 17) % c AS sel, q % 7 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
phr AS (
  SELECT p.query_id,
         list_extract(string_split(d.text, ' '), 1 + p.off) || ' ' ||
         list_extract(string_split(d.text, ' '), 2 + p.off) AS phrase
  FROM phq p JOIN documents d ON d.doc_id = p.sel
),
pterm AS (
  SELECT DISTINCT query_id, unnest(string_split(phrase, ' ')) AS term FROM phr
),
pmatch AS (
  SELECT p.query_id, d.doc_id
  FROM phr p
  JOIN documents d ON contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
),
scored AS (
  SELECT pt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM pterm pt
  JOIN df ON df.term = pt.term
  JOIN tf ON tf.term = pt.term
  JOIN pmatch m ON m.query_id = pt.query_id AND m.doc_id = tf.doc_id
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY pt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # prefix queries: prefix q = first 3 chars of vocab[(13q+7) mod |V|]
        # (vocab CTE = sorted distinct terms, same order as the engine's
        # sorted dictionary); match = any token starting with the prefix.
        "prefix_match": _PRELUDE
        + """
, pf AS (
  SELECT q AS query_id, substr(v.term, 1, 3) AS p
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (13 * q + 7) % nv.c
)
SELECT DISTINCT pf.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM pf JOIN tf ON starts_with(tf.term, pf.p)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # soft-delete: lang='de' docs tombstoned; stats stay pre-delete
        # (Lucene live-docs), hits filtered
        "delete_query_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN documents dd ON dd.doc_id = tf.doc_id AND dd.lang <> 'de'
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # function_score: BM25 × ln(1+dl) (field_value_factor ln1p,
        # multiply boost_mode), ranked on the rounded final score
        "function_score_sum": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
               + ln(1 + max(dl.dl)), 6) AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        "function_score_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
               * ln(1 + max(dl.dl)), 6) AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # script_score: BM25 / (1 + dl/avgdl) (saturation script over
        # _score and the dl field), ranked on the rounded final score
        "script_score_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
               / (1 + max(dl.dl) / max(s.avgdl)), 6) AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # _explain: per-term BM25 breakdown of doc (q*17 mod N) per query
        "explain": _PRELUDE
        + """
, target AS (
  SELECT q AS query_id, (q * 17) % (SELECT n::BIGINT FROM stats) AS doc_id
  FROM generate_series(0, {nq1}) AS t(q)
)
SELECT qt.query_id::BIGINT AS query_id, tg.doc_id::BIGINT AS doc_id, qt.term,
       tf.tf::BIGINT AS tf,
       round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
       round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
         AS contribution
FROM qterm qt
JOIN target tg ON tg.query_id = qt.query_id
JOIN df ON df.term = qt.term
JOIN tf ON tf.term = qt.term AND tf.doc_id = tg.doc_id
JOIN dl ON dl.doc_id = tg.doc_id
CROSS JOIN stats s
ORDER BY query_id, qt.term
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # top_hits sub-agg: top-2 hits per (query, lang) bucket
        "top_hits": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT sc.query_id, d.lang, sc.doc_id, sc.score,
         row_number() OVER (PARTITION BY sc.query_id, d.lang
                            ORDER BY sc.score DESC, sc.doc_id ASC) AS hit_rank
  FROM scored sc JOIN documents d USING (doc_id)
)
SELECT query_id, lang, hit_rank::BIGINT AS hit_rank, doc_id, score
FROM ranked WHERE hit_rank <= 2 ORDER BY query_id, lang, hit_rank
""",
        # RRF hybrid: BM25 top-20 ∪ cosine-kNN top-20, score = Σ 1/(60+rank)
        "rrf_hybrid": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
bmr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM scored
),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}),
ksc AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM qv CROSS JOIN embeddings e
),
knr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id ASC) AS r
  FROM ksc
),
legs AS (
  SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM bmr WHERE r <= 20
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM knr WHERE r <= 20
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score
  FROM legs GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM fused
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq}", str(_N_QUERIES)).replace("{k}", str(_TOP_K)),
        # graded rank_eval: term-overlap grades, DCG/IDCG windows, ERR via
        # a windowed product aggregate
        "rank_eval_graded": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
topk AS (
  SELECT * FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
grades AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term)::DOUBLE AS g
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY 1, tf.doc_id
),
tg AS (
  SELECT t.query_id, t.rank, coalesce(g.g, 0) AS g,
         (pow(2, coalesce(g.g, 0)) - 1) / 8.0 AS r_prob
  FROM topk t LEFT JOIN grades g
    ON g.query_id = t.query_id AND g.doc_id = t.doc_id
),
dcg AS (
  SELECT query_id,
         sum((pow(2, g) - 1) / log2(rank + 1)) AS dcg
  FROM tg GROUP BY query_id
),
ideal AS (
  SELECT query_id, sum((pow(2, g) - 1) / log2(irank + 1)) AS idcg
  FROM (
    SELECT query_id, g,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY g DESC, doc_id ASC) AS irank
    FROM grades
  ) WHERE irank <= 10 GROUP BY query_id
),
err AS (
  SELECT query_id,
         sum(r_prob / rank * coalesce(stop, 1.0)) AS err
  FROM (
    SELECT query_id, rank, r_prob,
           product(1 - r_prob) OVER (
             PARTITION BY query_id ORDER BY rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS stop
    FROM tg
  ) GROUP BY query_id
)
SELECT d.query_id::BIGINT AS query_id,
       round(d.dcg, 6) AS dcg_k,
       round(d.dcg / i.idcg, 6) AS ndcg_k,
       round(e.err, 6) AS err_k
FROM dcg d JOIN ideal i USING (query_id) JOIN err e USING (query_id)
ORDER BY query_id
""",
        # indices_boost: per-member multiplier on the UNROUNDED sum, global
        # stats untouched (A = first third of the corpus)
        "indices_boost": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
           AS raw
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
cut AS (SELECT count(*) // 3 AS c FROM documents),
boosted AS (
  SELECT query_id, doc_id,
         round(raw * CASE WHEN doc_id < cut.c THEN 1.5 ELSE 0.5 END, 6)
           AS score
  FROM scored CROSS JOIN cut
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM boosted
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""",
        # LTR feature logging: features joined onto the BM25 top-10
        "ltr_features": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
topk AS (
  SELECT * FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 10
),
qd AS (SELECT query_id, count(DISTINCT term)::BIGINT AS qlen FROM qterm GROUP BY 1),
feat AS (
  SELECT t.query_id, t.rank, t.doc_id, t.score AS bm25,
         any_value(dl.dl)::BIGINT AS dl,
         count(*)::BIGINT AS n_matched,
         sum(tf.tf)::BIGINT AS sum_tf,
         round(max(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))), 6) AS max_idf
  FROM topk t
  JOIN qterm q ON q.query_id = t.query_id
  JOIN tf ON tf.term = q.term AND tf.doc_id = t.doc_id
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY t.query_id, t.rank, t.doc_id, t.score
)
SELECT f.query_id::BIGINT AS query_id, f.rank::BIGINT AS rank,
       f.doc_id::BIGINT AS doc_id, f.bm25, f.dl, qd.qlen, f.n_matched,
       f.sum_tf, f.max_idf
FROM feat f JOIN qd USING (query_id) ORDER BY query_id, rank
""",
        # retriever tree: the rrf plan's fused top-10, second-staged by the
        # distance_feature-shaped rescorer, re-ranked
        "retriever_tree": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
bmr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM scored
),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}),
ksc AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM qv CROSS JOIN embeddings e
),
knr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id ASC) AS r
  FROM ksc
),
legs AS (
  SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM bmr WHERE r <= 20
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + r) AS c FROM knr WHERE r <= 20
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score
  FROM legs GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM fused
),
resc AS (
  SELECT f.query_id, f.doc_id,
         round(f.score + 0.1 * 10.0 / (10.0 + abs(dl.dl - 32.0)), 6) AS score
  FROM ranked f JOIN dl ON dl.doc_id = f.doc_id
  WHERE f.rank <= 10
),
final AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM resc
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM final ORDER BY query_id, rank
""".replace("{nq}", str(_N_QUERIES)),
        # collapse + inner_hits: group order by representative, members in
        # per-group rank order
        "collapse_inner": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
collapsed AS (
  SELECT query_id, doc_id, score,
         'org' || (doc_id % 7) || '/repo' || (doc_id % 20) AS repo,
         row_number() OVER (
           PARTITION BY query_id, 'org' || (doc_id % 7) || '/repo' || (doc_id % 20)
           ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
),
groups AS (
  SELECT query_id, repo,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS group_rank
  FROM collapsed WHERE rn = 1
)
SELECT c.query_id, g.group_rank::BIGINT AS group_rank, c.repo,
       c.rn::BIGINT AS hit_rank, c.doc_id, c.score
FROM collapsed c
JOIN groups g ON g.query_id = c.query_id AND g.repo = c.repo
WHERE g.group_rank <= 5 AND c.rn <= 3
ORDER BY c.query_id, g.group_rank, c.rn
""",
        # field collapse on repo ('org'||d%7||'/repo'||d%20, FIXTURES §B):
        # one best doc per repo, groups ranked by representative
        "collapse_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
collapsed AS (
  SELECT query_id, doc_id, score,
         'org' || (doc_id % 7) || '/repo' || (doc_id % 20) AS repo,
         row_number() OVER (
           PARTITION BY query_id, 'org' || (doc_id % 7) || '/repo' || (doc_id % 20)
           ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
),
ranked AS (
  SELECT query_id, doc_id, repo, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM collapsed WHERE rn = 1
)
SELECT query_id, rank::BIGINT AS rank, doc_id, repo, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # post_filter: hits filtered to lang='en' AFTER aggs; hits.total
        # counts the post-filtered matches (track_total_hits)
        "post_filter_hits": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
enriched AS (
  SELECT sc.query_id, sc.doc_id, sc.score, d.lang
  FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
),
filt AS (
  SELECT query_id, doc_id, score,
         count(*) OVER (PARTITION BY query_id) AS total_hits,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM enriched WHERE lang = 'en'
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score,
       total_hits::BIGINT AS total_hits
FROM filt WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # post_filter agg side: the lang facet sees EVERY matching doc
        "post_filter_aggs": _PRELUDE
        + """
, scored AS (
  SELECT DISTINCT qt.query_id, tf.doc_id
  FROM qterm qt JOIN tf ON tf.term = qt.term
)
SELECT sc.query_id, d.lang, count(*)::BIGINT AS doc_count
FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
GROUP BY 1, 2 ORDER BY query_id, lang
""",
        # named queries + min_score: matched_queries = sorted clause names
        # (clause name = the term), rounded score >= min_score
        "named_queries": _PRELUDE
        + """
, per AS (
  SELECT qt.query_id, tf.doc_id, qt.term,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS contrib
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
agg AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS score,
         string_agg(term, ',' ORDER BY term) AS matched
  FROM per GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, matched,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg WHERE score >= {ms}
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score, matched
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)).replace("{ms}", str(_MIN_SCORE)),
        # minimum_should_match: query q requires m = 1 + (q mod nt) of its
        # nt distinct fixture terms
        "min_should_match": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS mt
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
)
SELECT h.query_id, h.doc_id
FROM hits h JOIN qn USING (query_id)
WHERE h.mt >= 1 + (h.query_id % qn.nt)
ORDER BY query_id, doc_id
""",
        # range-filtered BM25: dl window [4*(q mod 6), +24] in filter
        # context — scores unchanged, candidates pruned
        "range_topk": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
       AND dl.dl >= 4 * (qt.query_id % 6)
       AND dl.dl <= 4 * (qt.query_id % 6) + 24
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # sort-by-doc-value: OR-match set ordered by (dl DESC, doc ASC)
        "sort_by_dl": _PRELUDE
        + """
, hits AS (
  SELECT DISTINCT qt.query_id, tf.doc_id FROM qterm qt
  JOIN tf ON tf.term = qt.term
),
ranked AS (
  SELECT h.query_id,
         row_number() OVER (PARTITION BY h.query_id
                            ORDER BY dl.dl DESC, h.doc_id ASC) AS rank,
         h.doc_id, dl.dl::BIGINT AS dl
  FROM hits h JOIN dl ON dl.doc_id = h.doc_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, dl
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # highlight: first occurrence of term vocab[(17q+5) mod |V|] per
        # matching doc (positions == string_split ordinals on this corpus),
        # snippet = +-3 tokens clipped to the doc
        # highlight fragments: first-2 occurrence positions per doc via
        # a windowed rank over the positional token stream
        "highlight_frags": _PRELUDE
        + """
, hq AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, 49) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (17 * q + 5) % nv.c
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS p,
         len(string_split(text, ' ')) AS ndl
  FROM documents
),
occ AS (
  SELECT h.query_id, p.doc_id, p.p, p.ndl,
         row_number() OVER (PARTITION BY h.query_id, p.doc_id
                            ORDER BY p.p ASC) AS frag_rank
  FROM hq h JOIN pos p ON p.term = h.term
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       frag_rank::BIGINT AS frag_rank, p::BIGINT AS pos,
       greatest(p - 3, 0)::BIGINT AS snip_start,
       least(p + 3, ndl - 1)::BIGINT AS snip_end
FROM occ WHERE frag_rank <= 2 ORDER BY query_id, doc_id, frag_rank
""",
        "highlight": _PRELUDE
        + """
, hq AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (17 * q + 5) % nv.c
),
occ AS (
  SELECT h.query_id, d.doc_id,
         list_position(string_split(d.text, ' '), h.term) - 1 AS first_pos,
         len(string_split(d.text, ' ')) AS ndl
  FROM hq h JOIN documents d
    ON list_position(string_split(d.text, ' '), h.term) > 0
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       first_pos::BIGINT AS first_pos,
       greatest(first_pos - 3, 0)::BIGINT AS snip_start,
       least(first_pos + 3, ndl - 1)::BIGINT AS snip_end
FROM occ ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # span_first: term within the first 1+(q mod 8) positions
        "span_first": _PRELUDE
        + """
, sq AS (
  SELECT q AS query_id, v.term, 1 + q % 8 AS e
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (23 * q + 1) % nv.c
)
SELECT s.query_id::BIGINT AS query_id, d.doc_id::BIGINT AS doc_id
FROM sq s JOIN documents d
  ON list_position(string_split(d.text, ' '), s.term) BETWEEN 1 AND s.e
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # span_near unordered slop=2: partner within |Δpos| in [1, 3]
        "span_near": _PRELUDE
        + """
, pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
sq AS (
  SELECT q AS query_id,
         (5 * q + 1) % c AS i1,
         CASE WHEN (11 * q + 7) % c = (5 * q + 1) % c
              THEN ((11 * q + 7) % c + 1) % c
              ELSE (11 * q + 7) % c END AS i2
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
),
sterm AS (
  SELECT s.query_id, v1.term AS t1, v2.term AS t2
  FROM sq s JOIN vocab v1 ON v1.idx = s.i1 JOIN vocab v2 ON v2.idx = s.i2
)
SELECT DISTINCT st.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM sterm st
JOIN pos p1 ON p1.term = st.t1
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = st.t2
WHERE abs(p2.p - p1.p) BETWEEN 1 AND 3
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # span_not pre=post=1: a t1 occurrence with no t2 within ±1
        "span_not": _PRELUDE
        + """
, pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
sq AS (
  SELECT q AS query_id,
         (5 * q + 1) % c AS i1,
         CASE WHEN (11 * q + 7) % c = (5 * q + 1) % c
              THEN ((11 * q + 7) % c + 1) % c
              ELSE (11 * q + 7) % c END AS i2
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
),
sterm AS (
  SELECT s.query_id, v1.term AS t1, v2.term AS t2
  FROM sq s JOIN vocab v1 ON v1.idx = s.i1 JOIN vocab v2 ON v2.idx = s.i2
)
SELECT DISTINCT st.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM sterm st
JOIN pos p1 ON p1.term = st.t1
WHERE NOT EXISTS (
  SELECT 1 FROM pos p2
  WHERE p2.doc_id = p1.doc_id AND p2.term = st.t2
    AND p2.p BETWEEN p1.p - 1 AND p1.p + 1
)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # match_phrase_prefix: w1 w2 then any token starting with pf
        "phrase_prefix": """
WITH nd AS (SELECT count(*) AS c FROM documents),
ppq AS (
  SELECT q AS query_id, (q * 23) % c AS sel, q % 5 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
pw AS (
  SELECT p.query_id,
         list_extract(string_split(d.text, ' '), 1 + p.off) AS w1,
         list_extract(string_split(d.text, ' '), 2 + p.off) AS w2,
         substr(list_extract(string_split(d.text, ' '), 3 + p.off), 1, 2) AS pf
  FROM ppq p JOIN documents d ON d.doc_id = p.sel
),
tp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
)
SELECT DISTINCT pw.query_id::BIGINT AS query_id, a.doc_id::BIGINT AS doc_id
FROM pw
JOIN tp a ON a.w = pw.w1
JOIN tp b ON b.doc_id = a.doc_id AND b.i = a.i + 1 AND b.w = pw.w2
JOIN tp c ON c.doc_id = a.doc_id AND c.i = a.i + 2 AND starts_with(c.w, pw.pf)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # gauss decay function_score: BM25 * exp(dist^2 * ln(0.5) / 256)
        "decay_topk": _PRELUDE
        + """
, oq AS (
  SELECT q AS query_id, (10 + 8 * (q % 5))::DOUBLE AS origin
  FROM generate_series(0, {nq1}) t(q)
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
               * exp( (dl.dl - oq.origin) * (dl.dl - oq.origin) * ln(0.5) / 256.0 ),
               6) AS score
  FROM qterm qt
  JOIN oq ON oq.query_id = qt.query_id
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id, dl.dl, oq.origin
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # distance_feature in a bool should: BM25 + boost·pivot/(pivot+|dl−origin|)
        "distance_feature": _PRELUDE
        + """
, oq AS (
  SELECT q AS query_id, (10 + 8 * (q % 5))::DOUBLE AS origin
  FROM generate_series(0, {nq1}) t(q)
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
               + 2.0 * 16.0 / (16.0 + abs(dl.dl - oq.origin)),
               6) AS score
  FROM qterm qt
  JOIN oq ON oq.query_id = qt.query_id
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id, dl.dl, oq.origin
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # deterministic sampler: ~10% content-hash sample, avg dl over it
        "sampler_agg": """
SELECT count(*)::BIGINT AS sample_count,
       round(avg(len(string_split(text, ' '))), 6) AS avg_dl
FROM documents WHERE substr(sha256(text), 1, 2) < '1a'
""",
        # regexp query: pattern q = first + '.*' + last char of
        # vocab[(19q+3) mod |V|], anchored full-term match
        "regexp_match": _PRELUDE
        + """
, rq AS (
  SELECT q AS query_id,
         substr(v.term, 1, 1) || '.*' || substr(v.term, len(v.term), 1) AS pat
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (19 * q + 3) % nv.c
)
SELECT DISTINCT rq.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM rq JOIN tf ON regexp_full_match(tf.term, rq.pat)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # wildcard: 'ab*c'-shaped pattern over the dictionary → LIKE 'ab%c'
        "wildcard_match": _PRELUDE
        + """
, wq AS (
  SELECT q AS query_id,
         substr(v.term, 1, 2) || '%' || substr(v.term, len(v.term), 1) AS pat
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (17 * q + 5) % nv.c
)
SELECT DISTINCT wq.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM wq JOIN tf ON tf.term LIKE wq.pat
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # dis_max: sorted query terms split even/odd into two sub-queries,
        # per-doc score = max(sub) + 0.3*(sum(sub) - max(sub))
        "dis_max": _PRELUDE
        + """
, qsub AS (
  SELECT query_id, term,
         (row_number() OVER (PARTITION BY query_id ORDER BY term) - 1) % 2 AS sub
  FROM (SELECT DISTINCT query_id, term FROM qterm)
),
subscore AS (
  SELECT qs.query_id, qs.sub, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM qsub qs
  JOIN df ON df.term = qs.term
  JOIN tf ON tf.term = qs.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qs.query_id, qs.sub, tf.doc_id
),
combined AS (
  SELECT query_id, doc_id,
         round(max(sc) + 0.3 * (sum(sc) - max(sc)), 6) AS score
  FROM subscore GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM combined
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # boosting: positive = fixture query, negative term =
        # vocab[(11q+2) mod |V|]; negative matches multiplied by 0.5
        "boosting": _PRELUDE
        + """
, posscore AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
negq AS (
  SELECT q AS query_id, v.term AS nterm
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 2) % nv.c
),
negdocs AS (
  SELECT DISTINCT n.query_id, tf.doc_id
  FROM negq n JOIN tf ON tf.term = n.nterm
),
final AS (
  SELECT p.query_id, p.doc_id,
         round(CASE WHEN nd.doc_id IS NOT NULL THEN p.sc * 0.5 ELSE p.sc END, 6) AS score
  FROM posscore p
  LEFT JOIN negdocs nd ON nd.query_id = p.query_id AND nd.doc_id = p.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM final
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # multi_match most_fields over content^1.0 + path^2.0: the path
        # field src/<source>/file_<id>.py tokenizes (code tokenizer:
        # compounds + split parts) into exactly the 8-token multiset the
        # pdoc CTE enumerates; each leg scores with its own field stats
        "multi_match": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
pdoc AS (
  SELECT doc_id, ['src', source, 'file' || doc_id::VARCHAR, 'py',
                  'src', substr(source, 4), 'file', doc_id::VARCHAR] AS toks
  FROM documents
),
ptoks AS (SELECT doc_id, unnest(toks) AS term FROM pdoc),
ptf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ptoks GROUP BY doc_id, term),
pdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ptoks GROUP BY doc_id),
pstats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM pdl),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY term),
qt2 AS (
  SELECT query_id, term FROM qterm
  UNION ALL
  SELECT q, ((q * 17) % c)::VARCHAR FROM generate_series(0, {nq1}) t(q), nd
),
cscore AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM qt2 qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
pscore AS (
  SELECT qt.query_id, ptf.doc_id,
         sum( ln(1 + (ps.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * ptf.tf / (ptf.tf + 1.2 * (1 - 0.75 + 0.75 * pdl.dl / ps.avgdl)) ) AS sc
  FROM qt2 qt
  JOIN pdf ON pdf.term = qt.term
  JOIN ptf ON ptf.term = qt.term
  JOIN pdl ON pdl.doc_id = ptf.doc_id
  CROSS JOIN pstats ps
  GROUP BY qt.query_id, ptf.doc_id
),
contrib AS (
  SELECT query_id, doc_id, sc FROM cscore
  UNION ALL
  SELECT query_id, doc_id, 2.0 * sc FROM pscore
),
combined AS (
  SELECT query_id, doc_id, round(sum(sc), 6) AS score
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM combined
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # combined_fields (BM25F): weighted tf/dl merge, max df, one BM25
        "combined_fields": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
pdoc AS (
  SELECT doc_id, ['src', source, 'file' || doc_id::VARCHAR, 'py',
                  'src', substr(source, 4), 'file', doc_id::VARCHAR] AS toks
  FROM documents
),
ptoks AS (SELECT doc_id, unnest(toks) AS term FROM pdoc),
ptf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ptoks GROUP BY doc_id, term),
pdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ptoks GROUP BY doc_id),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY term),
qt2 AS (
  SELECT query_id, term FROM qterm
  UNION ALL
  SELECT q, ((q * 17) % c)::VARCHAR FROM generate_series(0, {nq1}) t(q), nd
),
utf AS (
  SELECT doc_id, term, sum(w * tf) AS tf
  FROM (SELECT doc_id, term, 1.0 AS w, tf FROM tf
        UNION ALL SELECT doc_id, term, 2.0 AS w, tf FROM ptf)
  GROUP BY doc_id, term
),
udl AS (
  SELECT dl.doc_id, 1.0 * dl.dl + 2.0 * pdl.dl AS dl
  FROM dl JOIN pdl ON pdl.doc_id = dl.doc_id
),
ustats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM udl),
udf AS (
  SELECT term, max(df) AS df
  FROM (SELECT term, df FROM df UNION ALL SELECT term, df FROM pdf)
  GROUP BY term
),
scored AS (
  SELECT qt.query_id, utf.doc_id,
         round(sum( ln(1 + (s.n - udf.df + 0.5) / (udf.df + 0.5))
                    * utf.tf / (utf.tf + 1.2 * (1 - 0.75 + 0.75 * udl.dl / s.avgdl)) ), 6)
           AS score
  FROM qt2 qt
  JOIN udf ON udf.term = qt.term
  JOIN utf ON utf.term = qt.term
  JOIN udl ON udl.doc_id = utf.doc_id
  CROSS JOIN ustats s
  GROUP BY qt.query_id, utf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # near-dup connected components over the exact-Jaccard pair graph
        "dup_clusters": """
WITH RECURSIVE words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words WHERE len(w) >= 3
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM inter
  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE i / (sa.sz + sb.sz - i) >= 0.8
),
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach AS (
  SELECT a AS src, b AS dst FROM sym
  UNION
  SELECT r.src, s.b AS dst FROM reach r JOIN sym s ON s.a = r.dst
)
SELECT src AS doc_id, least(src, min(dst))::BIGINT AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
""",
        # intervals (3 terms, max_gaps, ordered on odd q) over positions
        "intervals_prefix": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS p
  FROM documents
),
va AS (SELECT doc_id, p FROM toks WHERE w LIKE 's%'),
vc AS (SELECT doc_id, p FROM toks WHERE w = 'window'),
cand AS (
  SELECT c.doc_id, c.p AS e, max(a.p) AS s
  FROM vc c JOIN va a ON a.doc_id = c.doc_id AND a.p < c.p
  GROUP BY 1, 2
  HAVING c.p - max(a.p) - 1 <= 3
),
minimal AS (SELECT doc_id, s, min(e) AS e FROM cand GROUP BY 1, 2),
sel AS (
  SELECT doc_id, s, e,
         row_number() OVER (PARTITION BY doc_id ORDER BY s, e) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM minimal
)
SELECT doc_id, n::BIGINT AS n_intervals, s::BIGINT AS first_start,
       e::BIGINT AS first_end
FROM sel WHERE rn = 1 ORDER BY doc_id
""",
        "intervals_algebra": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS p
  FROM documents
),
va AS (SELECT doc_id, p FROM toks WHERE w IN ('scan', 'column')),
vc AS (SELECT doc_id, p FROM toks WHERE w = 'window'),
vd AS (SELECT doc_id, p FROM toks WHERE w = 'order'),
cand AS (
  SELECT c.doc_id, c.p AS e, max(a.p) AS s
  FROM vc c JOIN va a ON a.doc_id = c.doc_id AND a.p < c.p
  GROUP BY 1, 2
  HAVING c.p - max(a.p) - 1 <= 2
),
minimal AS (SELECT doc_id, s, min(e) AS e FROM cand GROUP BY 1, 2),
filtered AS (
  SELECT m.* FROM minimal m
  WHERE NOT EXISTS (
    SELECT 1 FROM vd d
    WHERE d.doc_id = m.doc_id AND d.p BETWEEN m.s AND m.e
  )
),
sel AS (
  SELECT doc_id, s, e,
         row_number() OVER (PARTITION BY doc_id ORDER BY s, e) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM filtered
)
SELECT doc_id, n::BIGINT AS n_intervals, s::BIGINT AS first_start,
       e::BIGINT AS first_end
FROM sel WHERE rn = 1 ORDER BY doc_id
""",
        "intervals": _PRELUDE
        + """
, pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
iq AS (
  SELECT q AS query_id, q % c AS i1,
         CASE WHEN (7 * q + 3) % c = q % c THEN ((7 * q + 3) % c + 1) % c
              ELSE (7 * q + 3) % c END AS i2,
         (13 * q + 11) % c AS r3,
         2 + q % 3 AS g, (q % 2 = 1) AS ord
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
),
iq2 AS (
  SELECT query_id, i1, i2,
         CASE WHEN r3 IN (i1, i2) THEN (r3 + 1) % c ELSE r3 END AS r3b,
         g, ord, c
  FROM iq CROSS JOIN nv
),
iq3 AS (
  SELECT query_id, i1, i2,
         CASE WHEN r3b IN (i1, i2) THEN (r3b + 1) % c ELSE r3b END AS i3,
         g, ord
  FROM iq2
),
sterm AS (
  SELECT s.query_id, v1.term AS t1, v2.term AS t2, v3.term AS t3, s.g, s.ord
  FROM iq3 s
  JOIN vocab v1 ON v1.idx = s.i1
  JOIN vocab v2 ON v2.idx = s.i2
  JOIN vocab v3 ON v3.idx = s.i3
)
, m1 AS (
  SELECT st.query_id, st.g, st.ord, p.doc_id, p.p
  FROM sterm st JOIN pos p ON p.term = st.t1
),
m2 AS (SELECT st.query_id, p.doc_id, p.p FROM sterm st JOIN pos p ON p.term = st.t2),
m3 AS (SELECT st.query_id, p.doc_id, p.p FROM sterm st JOIN pos p ON p.term = st.t3)
SELECT DISTINCT m1.query_id::BIGINT AS query_id, m1.doc_id::BIGINT AS doc_id
FROM m1
JOIN m2 ON m2.query_id = m1.query_id AND m2.doc_id = m1.doc_id
JOIN m3 ON m3.query_id = m1.query_id AND m3.doc_id = m1.doc_id
WHERE (m1.ord AND m1.p < m2.p AND m2.p < m3.p AND m3.p - m1.p - 2 <= m1.g)
   OR ((NOT m1.ord)
       AND greatest(m1.p, m2.p, m3.p) - least(m1.p, m2.p, m3.p) - 2 <= m1.g)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # frequent co-occurring token pairs with min support
        "frequent_item_sets": _PRELUDE
        + """
, dt AS (SELECT DISTINCT doc_id, term FROM tf)
SELECT x.term AS item_a, y.term AS item_b, count(*)::BIGINT AS support
FROM dt x JOIN dt y ON y.doc_id = x.doc_id AND y.term > x.term
GROUP BY 1, 2 HAVING count(*) >= 50 ORDER BY item_a, item_b
""",
        # terms agg partition 1 of 3 via md5_number_upper routing
        "terms_partitioned": _PRELUDE
        + """
SELECT term, df::BIGINT AS doc_count, cf::BIGINT AS cf
FROM df WHERE md5_number_upper(term) % 3 = 1 ORDER BY term
""",
        # geo_polygon: convex CCW triangle via three half-plane tests
        "geo_polygon": _GEO_PTS
        + """
SELECT c_custkey, lat, lon FROM pts
WHERE 120.0 * (lat - -70.0) - 130.0 * (lon - -100.0) >= 0
  AND -160.0 * (lat - 60.0) - -10.0 * (lon - 20.0) >= 0
  AND 40.0 * (lat - 50.0) - -120.0 * (lon - -140.0) >= 0
ORDER BY c_custkey
""",
        # sort by _geo_distance: rounded-distance rank with key tiebreak
        "geo_sort": _GEO_PTS
        + """
, d AS (
  SELECT c_custkey,
         round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat) / 2.0) * sin(radians(lat) / 2.0)
           + cos(radians(lat))
             * sin(radians(lon) / 2.0) * sin(radians(lon) / 2.0)
         )), 6) AS dist_km
  FROM pts
),
ranked AS (
  SELECT row_number() OVER (ORDER BY dist_km ASC, c_custkey ASC) AS rank,
         c_custkey, dist_km
  FROM d
)
SELECT rank::BIGINT AS rank, c_custkey, dist_km
FROM ranked WHERE rank <= 25 ORDER BY rank
""",
        # geo_shape envelopes: interval arithmetic per relation, int64
        # membership checksums
        "geo_shape": """
WITH env AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon,
         ((c_custkey * 31) % 500) / 100.0 AS dlat,
         ((c_custkey * 53) % 1000) / 100.0 AS dlon
  FROM customer
),
r AS (
  SELECT c_custkey,
         lat - dlat AS a_lo, lat + dlat AS a_hi,
         lon - dlon AS o_lo, lon + dlon AS o_hi
  FROM env
),
flags AS (
  SELECT c_custkey,
         (a_lo <= 40.0 AND a_hi >= -30.0 AND o_lo <= 80.0 AND o_hi >= -60.0)
           AS inter,
         (a_lo >= -30.0 AND a_hi <= 40.0 AND o_lo >= -60.0 AND o_hi <= 80.0)
           AS within,
         (a_lo <= -30.0 AND a_hi >= 40.0 AND o_lo <= -60.0 AND o_hi >= 80.0)
           AS contains
  FROM r
)
SELECT rel AS relation, count(*) FILTER (m)::BIGINT AS doc_count,
       coalesce(sum(c_custkey) FILTER (m), 0)::BIGINT AS custkey_sum
FROM (
  SELECT c_custkey, 'intersects' AS rel, inter AS m FROM flags
  UNION ALL SELECT c_custkey, 'disjoint', NOT inter FROM flags
  UNION ALL SELECT c_custkey, 'within', within FROM flags
  UNION ALL SELECT c_custkey, 'contains', contains FROM flags
)
GROUP BY rel ORDER BY rel
""",
        # wildcard FIELD type: trigram-pruned glob; LIKE mirrors the glob
        "wildcard_field": _PRELUDE
        + """
, sq AS (
  SELECT q AS query_id, v.term AS t, q % 3 AS cls
  FROM generate_series(0, 49) tq(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (7 * q + 5) % nv.c
),
pat AS (
  SELECT query_id,
         CASE cls WHEN 0 THEN left(t, 2) || '%'
                  WHEN 1 THEN '%' || right(t, 2)
                  ELSE left(t, 1) || '%' || right(t, 1) END AS p
  FROM sq
)
SELECT DISTINCT s.query_id::BIGINT AS query_id, tk.doc_id::BIGINT AS doc_id
FROM pat s JOIN toks tk ON tk.term LIKE s.p
ORDER BY query_id, doc_id
""",
        # leading wildcard *suffix (reversed-dictionary trick)
        "suffix_match": _PRELUDE
        + """
, sq AS (
  SELECT q AS query_id,
         CASE WHEN len(v.term) >= 2
              THEN substr(v.term, len(v.term) - 1, 2) ELSE v.term END AS sfx
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
)
SELECT DISTINCT sq.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM sq JOIN tf ON ends_with(tf.term, sq.sfx)
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # max-passage: BM25 over 32/24 chunks, doc = best passage
        "max_passage": _PRELUDE
        + """
, d2 AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS dlen
  FROM documents
),
chunks AS (
  SELECT doc_id, c AS chunk_id,
         t[c*24+1 : least(c*24+32, dlen)] AS ctoks,
         (least(c*24+32, dlen) - c*24)::DOUBLE AS cl
  FROM d2, unnest(range(((dlen-1)//24)+1)) AS u(c)
),
cstats AS (SELECT count(*)::DOUBLE AS nc, avg(cl) AS avgcl FROM chunks),
ctoks AS (
  SELECT doc_id, chunk_id, cl, unnest(ctoks) AS term FROM chunks
),
ctf AS (
  SELECT doc_id, chunk_id, any_value(cl) AS cl, term, count(*)::DOUBLE AS tf
  FROM ctoks GROUP BY doc_id, chunk_id, term
),
cdf AS (SELECT term, count(*)::DOUBLE AS df FROM ctf GROUP BY term),
cscored AS (
  SELECT qt.query_id, ctf.doc_id, ctf.chunk_id,
         sum( ln(1 + (s.nc - cdf.df + 0.5) / (cdf.df + 0.5))
              * ctf.tf / (ctf.tf + 1.2 * (1 - 0.75 + 0.75 * ctf.cl / s.avgcl)) )
           AS cs
  FROM qterm qt
  JOIN cdf ON cdf.term = qt.term
  JOIN ctf ON ctf.term = qt.term
  CROSS JOIN cstats s
  GROUP BY 1, 2, 3
),
best AS (
  SELECT query_id, doc_id, round(max(cs), 6) AS score
  FROM cscored GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM best
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # completion suggester with fuzziness 1 over corrupted prefixes
        "completion_fuzzy": _PRELUDE
        + """
, typed AS (
  SELECT q AS query_id,
         substr(v.term, 1, 1) || 'z' || substr(v.term, 3, 1) AS p
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (19 * q + 2) % nv.c
),
cand AS (
  SELECT ty.query_id, v.term AS suggestion, df.df::BIGINT AS df
  FROM typed ty
  JOIN vocab v ON levenshtein(substr(v.term, 1, len(ty.p)), ty.p) <= 1
  JOIN df ON df.term = v.term
),
ranked AS (
  SELECT query_id, suggestion, df,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY df DESC, suggestion ASC) AS rank
  FROM cand
)
SELECT query_id, rank::BIGINT AS rank, suggestion, df
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # zipf fit: ln(cf) ~ ln(rank), rank by (cf DESC, term ASC)
        "zipf_fit": _PRELUDE
        + """
, cfr AS (
  SELECT cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rnk FROM df
)
SELECT count(*)::BIGINT AS n_terms,
       round(regr_slope(ln(cf), ln(rnk)), 6) AS slope,
       round(regr_intercept(ln(cf), ln(rnk)), 6) AS intercept,
       round(regr_r2(ln(cf), ln(rnk)), 6) AS r2
FROM cfr
""",
        # LTR rescore: BM25 top-50 window + deterministic model score
        "model_rerank": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS base
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
win AS (
  SELECT query_id, doc_id, base,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY base DESC, doc_id ASC) AS r
  FROM scored
),
rescored AS (
  SELECT query_id, doc_id,
         round(base + (((doc_id + query_id) * 2654435761) % 1000) / 1000.0, 6)
           AS score
  FROM win WHERE r <= 50
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM rescored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # sparse_vector: query weight (1 + q%3) x doc feature tf/dl
        "sparse_vector": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum((1.0 + qt.query_id % 3) * tf.tf / dl.dl), 6) AS score
  FROM qterm qt
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # bigram LM logprob: add-1 smoothing over corpus bigram counts
        "bigram_logprob": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM toks),
pairs AS (
  SELECT t1.doc_id, t1.w AS a, t2.w AS b
  FROM toks t1 JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.p = t1.p + 1
),
bc AS (SELECT a, b, count(*)::DOUBLE AS n FROM pairs GROUP BY 1, 2),
lc AS (SELECT a, sum(n) AS n FROM bc GROUP BY a),
sc AS (
  SELECT p.doc_id, ln((bc.n + 1) / (lc.n + v.v)) AS lp
  FROM pairs p
  JOIN bc ON bc.a = p.a AND bc.b = p.b
  JOIN lc ON lc.a = p.a
  CROSS JOIN v
)
SELECT doc_id, round(avg(lp), 6) AS logprob FROM sc GROUP BY doc_id ORDER BY doc_id
""",
        # hopping windows: size 1h, hop 30m -> every event in 2 windows
        "hopping_window": """
WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec, value FROM events),
rep AS (
  SELECT ((sec // 1800) - j) * 1800 AS window_start, value
  FROM e, unnest([0, 1]) t(j)
)
SELECT window_start, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM rep GROUP BY 1 ORDER BY 1
""",
        # percentiles_bucket over daily doc counts (quantile_cont exact)
        "percentiles_bucket": """
WITH buckets AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT 0.25 AS q, round(quantile_cont(doc_count, 0.25), 6) AS value FROM buckets
UNION ALL
SELECT 0.5, round(quantile_cont(doc_count, 0.5), 6) FROM buckets
UNION ALL
SELECT 0.75, round(quantile_cont(doc_count, 0.75), 6) FROM buckets
UNION ALL
SELECT 0.99, round(quantile_cont(doc_count, 0.99), 6) FROM buckets
ORDER BY q
""",
        # bucket_correlation: Pearson between two daily bucket series
        "bucket_correlation": """
WITH b AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6) AS a,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS c
  FROM events GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets, round(corr(a, c), 6) AS correlation FROM b
""",
        # KS test: empirical click-count CDF across ordered day buckets vs
        # the uniform expected CDF — the exact distances, mirrored
        "bucket_ks_test": """
WITH b AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE AS c
  FROM events GROUP BY 1
),
w AS (
  SELECT bucket_s,
         sum(c) OVER (ORDER BY bucket_s) / (SELECT sum(c) FROM b) AS femp,
         row_number() OVER (ORDER BY bucket_s)
           / (SELECT count(*)::DOUBLE FROM b) AS fexp
  FROM b
)
SELECT (SELECT count(*) FROM b)::BIGINT AS n_buckets,
       round(max(femp - fexp), 6) AS d_plus,
       round(max(fexp - femp), 6) AS d_minus,
       round(greatest(max(femp - fexp), max(fexp - femp)), 6) AS d
FROM w
""",
        # geo_line: top-5 by acctbal per segment, "lat,lon ..." path
        "geo_line": _GEO_PTS
        + """
, ranked AS (
  SELECT c_mktsegment, lat, lon,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM pts
)
SELECT c_mktsegment, count(*)::BIGINT AS n_points,
       string_agg(round(lat, 6)::VARCHAR || ',' || round(lon, 6)::VARCHAR,
                  ' ' ORDER BY rn) AS line
FROM ranked WHERE rn <= 5 GROUP BY 1 ORDER BY 1
""",
        # hybrid linear retriever: minmax-normalized BM25 + kNN legs
        "hybrid_linear": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
bml AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM scored
),
bmt AS (SELECT query_id, doc_id, score FROM bml WHERE r <= 20),
bmn AS (
  SELECT query_id, doc_id,
         CASE WHEN max(score) OVER w = min(score) OVER w THEN 1.0
              ELSE (score - min(score) OVER w)
                   / (max(score) OVER w - min(score) OVER w) END AS nsc
  FROM bmt WINDOW w AS (PARTITION BY query_id)
),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}),
ksc AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM qv CROSS JOIN embeddings e
),
knr AS (
  SELECT query_id, doc_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id ASC) AS r
  FROM ksc
),
knt AS (SELECT query_id, doc_id, sim FROM knr WHERE r <= 20),
knn AS (
  SELECT query_id, doc_id,
         CASE WHEN max(sim) OVER w = min(sim) OVER w THEN 1.0
              ELSE (sim - min(sim) OVER w)
                   / (max(sim) OVER w - min(sim) OVER w) END AS nsc
  FROM knt WINDOW w AS (PARTITION BY query_id)
),
legs AS (
  SELECT query_id, doc_id, 0.7 * nsc AS c FROM bmn
  UNION ALL
  SELECT query_id, doc_id, 0.3 * nsc FROM knn
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score FROM legs GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM fused
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq}", str(_N_QUERIES)).replace("{k}", str(_TOP_K)),
        # 9.x linear retriever, l2_norm normalizer: leg score / window L2
        "hybrid_linear_l2": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
bml AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM scored
),
bmt AS (SELECT query_id, doc_id, score FROM bml WHERE r <= 20),
bmn AS (
  SELECT query_id, doc_id,
         CASE WHEN sqrt(sum(score * score) OVER w) = 0 THEN 0.0
              ELSE score / sqrt(sum(score * score) OVER w) END AS nsc
  FROM bmt WINDOW w AS (PARTITION BY query_id)
),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}),
ksc AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM qv CROSS JOIN embeddings e
),
knr AS (
  SELECT query_id, doc_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, doc_id ASC) AS r
  FROM ksc
),
knt AS (SELECT query_id, doc_id, sim FROM knr WHERE r <= 20),
knn AS (
  SELECT query_id, doc_id,
         CASE WHEN sqrt(sum(sim * sim) OVER w) = 0 THEN 0.0
              ELSE sim / sqrt(sum(sim * sim) OVER w) END AS nsc
  FROM knt WINDOW w AS (PARTITION BY query_id)
),
legs AS (
  SELECT query_id, doc_id, 0.7 * nsc AS c FROM bmn
  UNION ALL
  SELECT query_id, doc_id, 0.3 * nsc FROM knn
),
fused AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score FROM legs GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM fused
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq}", str(_N_QUERIES)).replace("{k}", str(_TOP_K)),
        # keep best (max n_chars, tie min doc) per exact-Jaccard dup cluster
        "dedup_keep_best": """
WITH RECURSIVE words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words WHERE len(w) >= 3
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT a, b FROM inter
  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
  WHERE i / (sa.sz + sb.sz - i) >= 0.8
),
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach AS (
  SELECT a AS src, b AS dst FROM sym
  UNION
  SELECT r.src, s.b AS dst FROM reach r JOIN sym s ON s.a = r.dst
),
cl AS (
  SELECT src AS doc_id, least(src, min(dst))::BIGINT AS cluster_id
  FROM reach GROUP BY src
),
best AS (
  SELECT cl.doc_id, cl.cluster_id,
         row_number() OVER (PARTITION BY cl.cluster_id
                            ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn
  FROM cl JOIN documents d ON d.doc_id = cl.doc_id
)
SELECT doc_id, cluster_id, (rn = 1) AS kept FROM best ORDER BY doc_id
""",
        # per-source mixture weights: weight ~ tokens^0.5
        "mixing_weights": """
WITH s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS weight
FROM s ORDER BY source
""",
        # geohash_grid precision 2: integer interleave + base32 render
        "geohash_grid": _GEO_PTS
        + """
, cells AS (
  SELECT least(floor((lon + 180.0) / 360.0 * 32), 31)::BIGINT AS x,
         least(floor((lat + 90.0) / 180.0 * 32), 31)::BIGINT AS y
  FROM pts
),
vals AS (
  SELECT ((x // 16) % 2) * 512 + ((y // 16) % 2) * 256
       + ((x // 8) % 2) * 128 + ((y // 8) % 2) * 64
       + ((x // 4) % 2) * 32 + ((y // 4) % 2) * 16
       + ((x // 2) % 2) * 8 + ((y // 2) % 2) * 4
       + (x % 2) * 2 + (y % 2) AS v
  FROM cells
),
gh AS (
  SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', (v // 32)::INT + 1, 1) ||
         substr('0123456789bcdefghjkmnpqrstuvwxyz', (v % 32)::INT + 1, 1) AS geohash
  FROM vals
)
SELECT geohash, count(*)::BIGINT AS doc_count FROM gh GROUP BY 1 ORDER BY 1
""",
        # random_score (seeded multiplicative hash), boost_mode replace
        "random_score": _PRELUDE
        + """
, q1 AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (5 * q + 1) % nv.c
),
hits AS (
  SELECT q1.query_id, tf.doc_id,
         round((((tf.doc_id + q1.query_id) * 2654435761) % 2147483648)
               / 2147483648.0, 6) AS score
  FROM q1 JOIN tf ON tf.term = q1.term
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM hits
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # runtime field chars_per_word + sort on it
        "runtime_field": """
WITH r AS (
  SELECT doc_id, round(n_chars / len(string_split(text, ' ')), 6) AS chars_per_word
  FROM documents
),
ranked AS (
  SELECT doc_id, chars_per_word,
         row_number() OVER (ORDER BY chars_per_word DESC, doc_id ASC) AS rank
  FROM r
)
SELECT doc_id, chars_per_word, rank::BIGINT AS rank
FROM ranked WHERE rank <= 20 ORDER BY rank
""",
        # duplicate token spans: k=5-gram occurrences seen >= 2x, islands merge
        "duplicate_spans": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(list_slice(w, i, i + 4), ' ') AS g
  FROM toks, unnest(generate_series(1, len(w) - 4)) t(i)
  WHERE len(w) >= 5
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
marked AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marked
)
SELECT doc_id, min(pos) AS start_tok, max(pos) + 5 AS end_tok,
       (max(pos) + 5 - min(pos))::BIGINT AS n_tokens
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_tok
""",
        # match_bool_prefix: scoring terms + constant-score prefix clause
        "match_bool_prefix": _PRELUDE
        + """
, pf AS (
  SELECT q AS query_id, substr(v.term, 1, 2) AS p
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (17 * q + 5) % nv.c
),
lead_sc AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS s
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
pdocs AS (
  SELECT DISTINCT pf.query_id, tf.doc_id
  FROM pf JOIN tf ON starts_with(tf.term, pf.p)
),
unioned AS (
  SELECT coalesce(l.query_id, p.query_id) AS query_id,
         coalesce(l.doc_id, p.doc_id) AS doc_id,
         round(coalesce(l.s, 0) + CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0 END, 6)
           AS score
  FROM lead_sc l FULL JOIN pdocs p
    ON p.query_id = l.query_id AND p.doc_id = l.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM unioned
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # constant_score: term filter + dl range, every hit scores boost
        "constant_score": _PRELUDE
        + """
, q1 AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (3 * q + 2) % nv.c
),
hits AS (
  SELECT q1.query_id, tf.doc_id
  FROM q1 JOIN tf ON tf.term = q1.term JOIN dl ON dl.doc_id = tf.doc_id
  WHERE dl.dl BETWEEN 8 AND 40
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rank,
         doc_id
  FROM hits
)
SELECT query_id, rank::BIGINT AS rank, doc_id, 1.5 AS score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # pinned: fixed ids first (PIN_BASE - slot), organic BM25 follows
        "pinned": _PRELUDE
        + """
, ndocs AS (SELECT count(*) AS n FROM documents),
pins AS (
  SELECT q AS query_id, 0 AS slot, (3 * q) % n AS doc_id
  FROM generate_series(0, {nq1}) t(q), ndocs
  UNION ALL
  SELECT q, 1, (3 * q + 7) % n FROM generate_series(0, {nq1}) t(q), ndocs
),
organic AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
org2 AS (
  SELECT o.query_id, o.doc_id, o.score FROM organic o
  WHERE NOT EXISTS (
    SELECT 1 FROM pins p WHERE p.query_id = o.query_id AND p.doc_id = o.doc_id
  )
),
allrows AS (
  SELECT query_id, doc_id, 1000000000.0 - slot AS score,
         0 AS grp, slot::DOUBLE AS ord_a FROM pins
  UNION ALL
  SELECT query_id, doc_id, score, 1, -score FROM org2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY grp, ord_a, doc_id) AS rank
  FROM allrows
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # query rules: pin (31q+5) mod n (contains rule), exclude
        # (13q+2) mod n (always rule); the never-matching rule is inert
        "rule_query": _PRELUDE
        + """
, ndocs AS (SELECT count(*) AS n FROM documents),
pins AS (
  SELECT q AS query_id, 0 AS slot, (31 * q + 5) % n AS doc_id
  FROM generate_series(0, {nq1}) t(q), ndocs
),
exc AS (
  SELECT q AS query_id, (13 * q + 2) % n AS doc_id
  FROM generate_series(0, {nq1}) t(q), ndocs
),
organic AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
org2 AS (
  SELECT o.query_id, o.doc_id, o.score FROM organic o
  WHERE NOT EXISTS (
    SELECT 1 FROM pins p WHERE p.query_id = o.query_id AND p.doc_id = o.doc_id
  )
  AND NOT EXISTS (
    SELECT 1 FROM exc e WHERE e.query_id = o.query_id AND e.doc_id = o.doc_id
  )
),
allrows AS (
  SELECT query_id, doc_id, 1000000000.0 - slot AS score,
         0 AS grp, slot::DOUBLE AS ord_a FROM pins
  UNION ALL
  SELECT query_id, doc_id, score, 1, -score FROM org2
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY grp, ord_a, doc_id) AS rank
  FROM allrows
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # simple_query_string "v1 +v2 -v3" -> bool(must v2, should v1, not v3)
        "simple_query_string": _PRELUDE
        + """
, q3 AS (
  SELECT q AS query_id, v1.term AS t1, v2.term AS t2, v3.term AS t3
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v1 ON v1.idx = q % nv.c
  JOIN vocab v2 ON v2.idx = (7 * q + 3) % nv.c
  JOIN vocab v3 ON v3.idx = (13 * q + 11) % nv.c
),
cand AS (
  SELECT q3.query_id, tf.doc_id, q3.t1, q3.t2, q3.t3
  FROM q3 JOIN tf ON tf.term = q3.t2
  WHERE NOT EXISTS (
    SELECT 1 FROM tf x WHERE x.doc_id = tf.doc_id AND x.term = q3.t3
  )
),
sterm AS (
  SELECT query_id, t2 AS term FROM q3
  UNION
  SELECT query_id, t1 FROM q3
),
scored AS (
  SELECT c.query_id, c.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM cand c
  JOIN sterm st ON st.query_id = c.query_id
  JOIN df ON df.term = st.term
  JOIN tf ON tf.term = st.term AND tf.doc_id = c.doc_id
  JOIN dl ON dl.doc_id = c.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # field_caps: schema-driven types; text-vs-keyword by whitespace scan
        "field_caps": """
WITH cols AS (
  SELECT column_name AS field, column_type
  FROM (DESCRIBE SELECT * FROM documents)
),
sp AS (
  SELECT max(CASE WHEN contains(text, ' ') THEN 1 ELSE 0 END) AS sp_text,
         max(CASE WHEN contains(lang, ' ') THEN 1 ELSE 0 END) AS sp_lang,
         max(CASE WHEN contains(source, ' ') THEN 1 ELSE 0 END) AS sp_source
  FROM documents
),
typed AS (
  SELECT field,
         CASE
           WHEN column_type IN ('BIGINT','INTEGER','SMALLINT','TINYINT','HUGEINT',
                                'UBIGINT','UINTEGER','USMALLINT','UTINYINT') THEN 'long'
           WHEN column_type IN ('DOUBLE','FLOAT','REAL') THEN 'double'
           WHEN column_type LIKE 'TIMESTAMP%' THEN 'date'
           WHEN column_type = 'BOOLEAN' THEN 'boolean'
           WHEN column_type = 'VARCHAR' THEN
             CASE field
               WHEN 'text' THEN CASE WHEN (SELECT sp_text FROM sp) = 1 THEN 'text' ELSE 'keyword' END
               WHEN 'lang' THEN CASE WHEN (SELECT sp_lang FROM sp) = 1 THEN 'text' ELSE 'keyword' END
               WHEN 'source' THEN CASE WHEN (SELECT sp_source FROM sp) = 1 THEN 'text' ELSE 'keyword' END
               ELSE 'keyword'
             END
           ELSE 'object'
         END AS es_type
  FROM cols
)
SELECT field, es_type, true AS searchable, (es_type <> 'text') AS aggregatable
FROM typed ORDER BY field
""",
        # multi_match cross_fields: per-(term,doc) max over boosted field
        # contributions, then sum over terms
        "multi_match_cross": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
pdoc AS (
  SELECT doc_id, ['src', source, 'file' || doc_id::VARCHAR, 'py',
                  'src', substr(source, 4), 'file', doc_id::VARCHAR] AS toks
  FROM documents
),
ptoks AS (SELECT doc_id, unnest(toks) AS term FROM pdoc),
ptf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ptoks GROUP BY doc_id, term),
pdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ptoks GROUP BY doc_id),
pstats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM pdl),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY term),
qt2 AS (
  SELECT query_id, term FROM qterm
  UNION ALL
  SELECT q, ((q * 17) % c)::VARCHAR FROM generate_series(0, {nq1}) t(q), nd
),
tc AS (
  SELECT qt.query_id, qt.term, tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
  FROM qt2 qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
pc AS (
  SELECT qt.query_id, qt.term, ptf.doc_id,
         2.0 * ln(1 + (ps.n - pdf.df + 0.5) / (pdf.df + 0.5))
           * ptf.tf / (ptf.tf + 1.2 * (1 - 0.75 + 0.75 * pdl.dl / ps.avgdl)) AS c
  FROM qt2 qt
  JOIN pdf ON pdf.term = qt.term
  JOIN ptf ON ptf.term = qt.term
  JOIN pdl ON pdl.doc_id = ptf.doc_id
  CROSS JOIN pstats ps
),
m AS (
  SELECT query_id, term, doc_id, max(c) AS c
  FROM (SELECT * FROM tc UNION ALL SELECT * FROM pc)
  GROUP BY query_id, term, doc_id
),
combined AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score
  FROM m GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM combined
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # full bool query: must=first term, should=rest (msm=q%2 when any),
        # must_not=vocab[(7q+1)%|V|] unless it collides, filter dl in [6,48]
        "bool_query": _PRELUDE
        + """
, qts AS (
  SELECT query_id, term,
         row_number() OVER (PARTITION BY query_id ORDER BY term) AS rn
  FROM (SELECT DISTINCT query_id, term FROM qterm)
),
mustq AS (SELECT query_id, term FROM qts WHERE rn = 1),
shouldq AS (SELECT query_id, term FROM qts WHERE rn > 1),
negq AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (7 * q + 1) % nv.c
  WHERE v.term NOT IN (SELECT term FROM qts WHERE query_id = q)
),
msm AS (
  SELECT query_id,
         CASE WHEN EXISTS (SELECT 1 FROM shouldq s WHERE s.query_id = d.query_id)
              THEN query_id % 2 ELSE 0 END AS m
  FROM (SELECT DISTINCT query_id FROM qts) d
),
mdocs AS (SELECT m.query_id, tf.doc_id FROM mustq m JOIN tf ON tf.term = m.term),
scount AS (
  SELECT s.query_id, tf.doc_id, count(DISTINCT s.term) AS ns
  FROM shouldq s JOIN tf ON tf.term = s.term GROUP BY s.query_id, tf.doc_id
),
cand0 AS (
  SELECT md.query_id, md.doc_id
  FROM mdocs md
  JOIN msm ON msm.query_id = md.query_id
  LEFT JOIN scount sc ON sc.query_id = md.query_id AND sc.doc_id = md.doc_id
  WHERE coalesce(sc.ns, 0) >= msm.m
),
cand1 AS (
  SELECT c.* FROM cand0 c
  ANTI JOIN (SELECT n.query_id, tf.doc_id FROM negq n JOIN tf ON tf.term = n.term) x
    ON x.query_id = c.query_id AND x.doc_id = c.doc_id
),
cand AS (
  SELECT c.* FROM cand1 c JOIN dl ON dl.doc_id = c.doc_id
  WHERE dl.dl BETWEEN 6 AND 48
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM (SELECT query_id, term FROM mustq UNION ALL SELECT query_id, term FROM shouldq) qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN cand ON cand.query_id = qt.query_id AND cand.doc_id = tf.doc_id
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # wrapper query: the bool plan above, re-derived from the decoded
        # JSON — msm = (q+1) mod 2, filter dl BETWEEN 4 AND 40
        "wrapper_topk": _PRELUDE
        + """
, qts AS (
  SELECT query_id, term,
         row_number() OVER (PARTITION BY query_id ORDER BY term) AS rn
  FROM (SELECT DISTINCT query_id, term FROM qterm)
),
mustq AS (SELECT query_id, term FROM qts WHERE rn = 1),
shouldq AS (SELECT query_id, term FROM qts WHERE rn > 1),
negq AS (
  SELECT q AS query_id, v.term
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (7 * q + 1) % nv.c
  WHERE v.term NOT IN (SELECT term FROM qts WHERE query_id = q)
),
msm AS (
  SELECT query_id,
         CASE WHEN EXISTS (SELECT 1 FROM shouldq s WHERE s.query_id = d.query_id)
              THEN (query_id + 1) % 2 ELSE 0 END AS m
  FROM (SELECT DISTINCT query_id FROM qts) d
),
mdocs AS (SELECT m.query_id, tf.doc_id FROM mustq m JOIN tf ON tf.term = m.term),
scount AS (
  SELECT s.query_id, tf.doc_id, count(DISTINCT s.term) AS ns
  FROM shouldq s JOIN tf ON tf.term = s.term GROUP BY s.query_id, tf.doc_id
),
cand0 AS (
  SELECT md.query_id, md.doc_id
  FROM mdocs md
  JOIN msm ON msm.query_id = md.query_id
  LEFT JOIN scount sc ON sc.query_id = md.query_id AND sc.doc_id = md.doc_id
  WHERE coalesce(sc.ns, 0) >= msm.m
),
cand1 AS (
  SELECT c.* FROM cand0 c
  ANTI JOIN (SELECT n.query_id, tf.doc_id FROM negq n JOIN tf ON tf.term = n.term) x
    ON x.query_id = c.query_id AND x.doc_id = c.doc_id
),
cand AS (
  SELECT c.* FROM cand1 c JOIN dl ON dl.doc_id = c.doc_id
  WHERE dl.dl BETWEEN 4 AND 40
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM (SELECT query_id, term FROM mustq UNION ALL SELECT query_id, term FROM shouldq) qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN cand ON cand.query_id = qt.query_id AND cand.doc_id = tf.doc_id
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # Lucene SynonymQuery: group = {term_i, vocab[(13q+5+3i) mod |V|]},
        # tf summed per doc, df = max member df
        "synonym_topk": _PRELUDE
        + """
, qti AS (
  SELECT query_id, term,
         row_number() OVER (PARTITION BY query_id ORDER BY term) - 1 AS i
  FROM (SELECT DISTINCT query_id, term FROM qterm)
),
syn AS (
  SELECT qti.query_id, qti.term AS base, v.term AS syn
  FROM qti CROSS JOIN nv
  JOIN vocab v ON v.idx = (13 * qti.query_id + 5 + 3 * qti.i) % nv.c
),
members AS (
  SELECT query_id, base AS grp, base AS term FROM syn
  UNION
  SELECT query_id, base AS grp, syn AS term FROM syn
),
gdf AS (
  SELECT m.query_id, m.grp, max(df.df) AS df
  FROM members m JOIN df ON df.term = m.term GROUP BY m.query_id, m.grp
),
gtf AS (
  SELECT m.query_id, m.grp, tf.doc_id, sum(tf.tf) AS tf
  FROM members m JOIN tf ON tf.term = m.term
  GROUP BY m.query_id, m.grp, tf.doc_id
),
scored AS (
  SELECT g.query_id, g.doc_id,
         round(sum( ln(1 + (s.n - gdf.df + 0.5) / (gdf.df + 0.5))
                    * g.tf / (g.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM gtf g
  JOIN gdf ON gdf.query_id = g.query_id AND gdf.grp = g.grp
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
  GROUP BY g.query_id, g.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # fuzzy query: qterm q = vocab[(11q+3) mod |V|] with char (q mod len)
        # deleted; match = any indexed term within Levenshtein distance 1
        # (DuckDB levenshtein == byte-level DP for this ASCII vocabulary).
        "fuzzy_match": _PRELUDE
        + """
, fq AS (
  SELECT q AS query_id,
         CASE WHEN len(v.term) > 1
              THEN substr(v.term, 1, q % len(v.term))
                   || substr(v.term, (q % len(v.term)) + 2)
              ELSE v.term END AS qt
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
)
SELECT DISTINCT fq.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM fq JOIN tf ON levenshtein(tf.term, fq.qt) <= 1
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # fuzzy with transpositions: qterm q = vocab[(11q+3) mod |V|] with
        # adjacent chars (p, p+1) swapped, p = q mod (len-1); match = any
        # indexed term within TRUE Damerau-Levenshtein distance 1 (DuckDB's
        # damerau_levenshtein is the unrestricted Lowrance-Wagner variant,
        # same as Lucene's transpositions automaton — d('CA','ABC') = 2).
        "fuzzy_transpositions": _PRELUDE
        + """
, fq AS (
  SELECT q AS query_id,
         CASE WHEN len(v.term) > 1
              THEN substr(v.term, 1, q % (len(v.term) - 1))
                   || substr(v.term, (q % (len(v.term) - 1)) + 2, 1)
                   || substr(v.term, (q % (len(v.term) - 1)) + 1, 1)
                   || substr(v.term, (q % (len(v.term) - 1)) + 3)
              ELSE v.term END AS qt
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
)
SELECT DISTINCT fq.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM fq JOIN tf ON damerau_levenshtein(tf.term, fq.qt) <= 1
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # ES term suggester: top-3 corrections, (distance, df DESC, term)
        "term_suggest": _PRELUDE
        + """
, fq AS (
  SELECT q AS query_id,
         CASE WHEN len(v.term) > 1
              THEN substr(v.term, 1, q % len(v.term))
                   || substr(v.term, (q % len(v.term)) + 2)
              ELSE v.term END AS qt
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
),
cand AS (
  SELECT fq.query_id, d.term,
         levenshtein(d.term, fq.qt)::BIGINT AS distance, d.df::BIGINT AS df
  FROM fq JOIN df d ON levenshtein(d.term, fq.qt) <= 2
),
ranked AS (
  SELECT query_id, term, distance, df,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY distance ASC, df DESC, term ASC) AS pos
  FROM cand
)
SELECT query_id::BIGINT AS query_id, pos::BIGINT AS pos, term, distance, df
FROM ranked WHERE pos <= 3 ORDER BY query_id, pos
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # completion suggester: top-5 prefix completions by (df DESC, term)
        # _terms_enum: prefix-matched vocab drained in search_after pages of 4
        "terms_enum": _PRELUDE
        + """
, p AS (
  SELECT substr(v.term, 1, 1) AS pf FROM vocab v CROSS JOIN nv
  WHERE v.idx = 20 % nv.c
),
m AS (
  SELECT v.term, row_number() OVER (ORDER BY v.term) - 1 AS rn
  FROM vocab v, p WHERE starts_with(v.term, p.pf)
)
SELECT (rn // 4)::BIGINT AS page, term FROM m ORDER BY term
""",
        "completion_suggest": _PRELUDE
        + """
, cq AS (
  SELECT q AS query_id, substr(v.term, 1, 3) AS p
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
),
cand AS (
  SELECT cq.query_id, d.term, d.df::BIGINT AS df
  FROM cq JOIN df d ON starts_with(d.term, cq.p)
),
ranked AS (
  SELECT query_id, term, df,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY df DESC, term ASC) AS pos
  FROM cand
)
SELECT query_id::BIGINT AS query_id, pos::BIGINT AS pos, term, df
FROM ranked WHERE pos <= 5 ORDER BY query_id, pos
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # match_phrase slop=2: adjacent token distance in [1, 3]
        "phrase_slop": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
phq AS (
  SELECT q AS query_id, (q * 17) % c AS sel, q % 7 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
phr AS (
  SELECT p.query_id,
         list_extract(string_split(d.text, ' '), 1 + p.off) AS t1,
         list_extract(string_split(d.text, ' '), 2 + p.off) AS t2
  FROM phq p JOIN documents d ON d.doc_id = p.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
)
SELECT DISTINCT ph.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM phr ph
JOIN pos p1 ON p1.term = ph.t1
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = ph.t2
WHERE p2.p - p1.p BETWEEN 1 AND 3
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # ES rescore: top-20 base window, combined = base·(1 + 2·[phrase])
        "rescore": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
phq AS (
  SELECT q AS query_id, (q * 17) % c AS sel, q % 7 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
phr AS (
  SELECT p.query_id,
         list_extract(string_split(d.text, ' '), 1 + p.off) || ' ' ||
         list_extract(string_split(d.text, ' '), 2 + p.off) AS phrase
  FROM phq p JOIN documents d ON d.doc_id = p.sel
),
pterm AS (
  SELECT DISTINCT query_id, unnest(string_split(phrase, ' ')) AS term FROM phr
),
pmatch AS (
  SELECT p.query_id, d.doc_id
  FROM phr p
  JOIN documents d ON contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
),
base AS (
  SELECT pt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM pterm pt
  JOIN df ON df.term = pt.term
  JOIN tf ON tf.term = pt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY pt.query_id, tf.doc_id
),
windowed AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank_b
  FROM base
),
combined AS (
  SELECT w.query_id, w.doc_id,
         round(w.score * (1 + 2 * (CASE WHEN m.doc_id IS NULL THEN 0 ELSE 1 END)), 6)
           AS score
  FROM windowed w
  LEFT JOIN pmatch m ON m.query_id = w.query_id AND m.doc_id = w.doc_id
  WHERE w.rank_b <= 20
),
reranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM combined
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM reranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # ES terms aggregation: boolean-AND hit sets bucketed by lang
        "terms_agg": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id, d.lang, count(*)::BIGINT AS doc_count
FROM anded a JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # _analyze: the indexed token stream of document (29q mod n)
        "analyze_stop": """
WITH nd AS (SELECT count(*) AS c FROM documents),
aq AS (
  SELECT q AS query_id, (29 * q) % c AS sel
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
stream AS (
  SELECT a.query_id::BIGINT AS query_id,
         (generate_subscripts(string_split(d.text, ' '), 1) - 1)::BIGINT AS pos,
         unnest(string_split(d.text, ' ')) AS token
  FROM aq a JOIN documents d ON d.doc_id = a.sel
)
SELECT query_id, pos, token FROM stream
WHERE token NOT IN ('scan', 'column', 'window', 'order')
ORDER BY 1, 2, 3
""".replace("{nq1}", str(_N_QUERIES - 1)),
        "analyze": """
WITH nd AS (SELECT count(*) AS c FROM documents),
aq AS (
  SELECT q AS query_id, (29 * q) % c AS sel
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
)
SELECT a.query_id::BIGINT AS query_id,
       (generate_subscripts(string_split(d.text, ' '), 1) - 1)::BIGINT AS pos,
       unnest(string_split(d.text, ' ')) AS token
FROM aq a JOIN documents d ON d.doc_id = a.sel
ORDER BY 1, 2, 3
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # _termvectors with term_statistics for docs (31q+2) mod n
        "term_vectors": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
sel AS (
  SELECT DISTINCT (31 * q + 2) % c AS doc_id
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
)
SELECT tf.doc_id::BIGINT AS doc_id, tf.term, tf.tf::BIGINT AS tf,
       df.df::BIGINT AS df
FROM tf JOIN sel USING (doc_id) JOIN df USING (term)
ORDER BY 1, 2
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # rare_terms: the df <= 100 tail of the vocabulary
        "rare_terms": _PRELUDE
        + """
SELECT term, df::BIGINT AS doc_count FROM df WHERE df <= 100 ORDER BY term
""",
        # multi_terms: AND-hit counts by the composite (lang, repo) key;
        # repo mirrors the corpus derivation 'org{d%7}/repo{d%20}'
        "multi_terms": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id, d.lang,
       'org' || (d.doc_id % 7) || '/repo' || (d.doc_id % 20) AS repo,
       count(*)::BIGINT AS doc_count
FROM anded a JOIN documents d USING (doc_id)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
        # weighted_avg: per-lang n_chars weighted by token count
        "weighted_avg": """
SELECT lang,
       round(sum(n_chars * len(string_split(text, ' ')))::DOUBLE
             / sum(len(string_split(text, ' '))), 6) AS wavg
FROM documents GROUP BY lang ORDER BY lang
""",
        # median_absolute_deviation of token count per lang
        "mad_dl": """
SELECT lang, round(mad(len(string_split(text, ' '))::DOUBLE), 6) AS mad
FROM documents GROUP BY lang ORDER BY lang
""",
        # terms bucket × stats(dl) sub-agg over the AND-hit sets
        # terms ordered by sub-agg metric: the bucket_rank IS the output
        "terms_order_metric": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
buckets AS (
  SELECT a.query_id::BIGINT AS query_id, d.lang,
         count(*)::BIGINT AS doc_count,
         min(dl.dl)::BIGINT AS min_dl,
         max(dl.dl)::BIGINT AS max_dl,
         sum(dl.dl)::BIGINT AS sum_dl,
         round(sum(dl.dl) / count(*), 6) AS avg_dl
  FROM anded a
  JOIN documents d USING (doc_id)
  JOIN dl USING (doc_id)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY avg_dl DESC, lang ASC) AS bucket_rank
  FROM buckets
)
SELECT query_id, lang, doc_count, min_dl, max_dl, sum_dl, avg_dl,
       bucket_rank::BIGINT AS bucket_rank
FROM ranked WHERE bucket_rank <= 3 ORDER BY query_id, bucket_rank
""",
        "terms_stats": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id, d.lang,
       count(*)::BIGINT AS doc_count,
       min(dl.dl)::BIGINT AS min_dl,
       max(dl.dl)::BIGINT AS max_dl,
       sum(dl.dl)::BIGINT AS sum_dl,
       round(sum(dl.dl) / count(*), 6) AS avg_dl
FROM anded a
JOIN documents d USING (doc_id)
JOIN dl USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # ES composite agg: 2nd 7-bucket page of (lang, dl//16*16) buckets
        "composite_page2": _PRELUDE
        + """
, buckets AS (
  SELECT d.lang, (dl.dl::BIGINT // 16) * 16 AS bucket,
         count(*)::BIGINT AS doc_count
  FROM dl JOIN documents d USING (doc_id)
  GROUP BY 1, 2
),
ranked AS (
  SELECT lang, bucket, doc_count,
         row_number() OVER (ORDER BY lang, bucket) AS rn
  FROM buckets
)
SELECT lang, bucket, doc_count FROM ranked
WHERE rn > 7 AND rn <= 14 ORDER BY lang, bucket
""",
        # ES percentiles agg over doc length, quantile_cont semantics
        "percentiles": _PRELUDE
        + """
, ql AS (
  SELECT quantile_cont(dl, [0.25, 0.5, 0.75, 0.9, 0.99]) AS vs FROM dl
)
SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
       round(unnest(vs), 6) AS value
FROM ql ORDER BY q
""",
        # ES cardinality aggregation — exact gate over events
        "distinct_counts": """
SELECT count(DISTINCT user_id)::BIGINT AS n_distinct_user_id,
       count(DISTINCT event_type)::BIGINT AS n_distinct_event_type
FROM events
""",
        # ES significant_terms: AND-hit foreground vs corpus background,
        # JLH score on 6-dp rounding, positives only, top-10 per query
        # chi_square heuristic over the same foregrounds: 2x2 contingency
        # with the include_negatives=false filter
        "sig_terms_chi2": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
fg_size AS (SELECT query_id, count(*)::DOUBLE AS fgs FROM anded GROUP BY query_id),
fg AS (
  SELECT a.query_id, tf.term, count(*)::DOUBLE AS fg_df
  FROM anded a JOIN tf ON tf.doc_id = a.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT f.query_id, f.term, f.fg_df, d.df AS bg_df,
         round( st.n * pow(f.fg_df * (st.n - s.fgs - (d.df - f.fg_df))
                           - (s.fgs - f.fg_df) * (d.df - f.fg_df), 2)
                / (s.fgs * (st.n - s.fgs) * d.df * (st.n - d.df)), 6)
           AS score,
         (f.fg_df / s.fgs) > (d.df / st.n) AS pos
  FROM fg f JOIN fg_size s USING (query_id)
  JOIN df d ON d.term = f.term CROSS JOIN stats st
),
ranked AS (
  SELECT query_id, term, fg_df, bg_df, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored WHERE pos AND score > 0
)
SELECT query_id::BIGINT AS query_id, term, fg_df::BIGINT AS fg_df,
       bg_df::BIGINT AS bg_df, score
FROM ranked WHERE rnk <= 10 ORDER BY query_id, term
""",
        "sig_terms": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
fg_size AS (SELECT query_id, count(*)::DOUBLE AS fgs FROM anded GROUP BY query_id),
fg AS (
  SELECT a.query_id, tf.term, count(*)::DOUBLE AS fg_df
  FROM anded a JOIN tf ON tf.doc_id = a.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT f.query_id, f.term, f.fg_df, d.df AS bg_df,
         round(((f.fg_df / s.fgs) - (d.df / st.n))
               * ((f.fg_df / s.fgs) / (d.df / st.n)), 6) AS score
  FROM fg f JOIN fg_size s USING (query_id)
  JOIN df d ON d.term = f.term CROSS JOIN stats st
),
ranked AS (
  SELECT query_id, term, fg_df, bg_df, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored WHERE score > 0
)
SELECT query_id::BIGINT AS query_id, term, fg_df::BIGINT AS fg_df,
       bg_df::BIGINT AS bg_df, score
FROM ranked WHERE rnk <= 10 ORDER BY query_id, term
""",
        # significant_text: fg from re-analyzed hit text, exact dupes
        # collapsed to min doc_id (filter_duplicate_text) before counting
        "significant_text": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
dedup AS (
  SELECT a.query_id, min(a.doc_id) AS doc_id
  FROM anded a JOIN documents d ON d.doc_id = a.doc_id
  GROUP BY a.query_id, d.text
),
fg_size AS (SELECT query_id, count(*)::DOUBLE AS fgs FROM dedup GROUP BY query_id),
fg AS (
  SELECT u.query_id, tf.term, count(*)::DOUBLE AS fg_df
  FROM dedup u JOIN tf ON tf.doc_id = u.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT f.query_id, f.term, f.fg_df, d.df AS bg_df,
         round(((f.fg_df / s.fgs) - (d.df / st.n))
               * ((f.fg_df / s.fgs) / (d.df / st.n)), 6) AS score
  FROM fg f JOIN fg_size s USING (query_id)
  JOIN df d ON d.term = f.term CROSS JOIN stats st
),
ranked AS (
  SELECT query_id, term, fg_df, bg_df, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored WHERE score > 0
)
SELECT query_id::BIGINT AS query_id, term, fg_df::BIGINT AS fg_df,
       bg_df::BIGINT AS bg_df, score
FROM ranked WHERE rnk <= 10 ORDER BY query_id, term
""",
        # ES histogram aggregation: same hit sets, dl bucketed by 16
        "histogram_agg": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id,
       (dl.dl::BIGINT // 16) * 16 AS bucket,
       count(*)::BIGINT AS doc_count
FROM anded a JOIN dl USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # range agg: AND-hit counts in dl ranges [*,16) [16,48) [48,*)
        "range_agg": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id,
       CASE WHEN dl.dl < 16 THEN '*-16'
            WHEN dl.dl < 48 THEN '16-48'
            ELSE '48-*' END AS "range",
       count(*)::BIGINT AS doc_count
FROM anded a JOIN dl USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        # adjacency_matrix: per-query term filters — singles + non-empty
        # pairwise intersections, keys 'a' / 'a&b' (names sorted)
        "adjacency_matrix": _PRELUDE
        + """
, f AS (SELECT DISTINCT query_id, term FROM qterm),
sets AS (
  SELECT f.query_id, f.term, tf.doc_id FROM f JOIN tf ON tf.term = f.term
),
singles AS (
  SELECT query_id, term AS k, count(DISTINCT doc_id)::BIGINT AS doc_count
  FROM sets GROUP BY query_id, term
),
pairs AS (
  SELECT a.query_id, a.term || '&' || b.term AS k,
         count(DISTINCT a.doc_id)::BIGINT AS doc_count
  FROM sets a
  JOIN sets b ON a.query_id = b.query_id AND a.doc_id = b.doc_id
             AND a.term < b.term
  GROUP BY a.query_id, a.term, b.term
)
SELECT query_id::BIGINT AS query_id, k AS "key", doc_count
FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
ORDER BY query_id, k
""",
        # extended_stats over dl: exact integral moments + population var/std
        "extended_stats": _PRELUDE
        + """
SELECT count(*)::BIGINT AS doc_count,
       min(dl)::BIGINT AS min_dl, max(dl)::BIGINT AS max_dl,
       sum(dl)::BIGINT AS sum_dl, sum(dl * dl)::BIGINT AS sum_sq,
       round(avg(dl), 6) AS avg_dl,
       round(var_pop(dl), 6) AS variance,
       round(stddev_pop(dl), 6) AS std_dev
FROM dl
""",
        # boxplot over dl: exact min/q1/q2/q3/max (quantile_cont semantics)
        "boxplot": _PRELUDE
        + """
SELECT round(min(dl), 6) AS min_dl,
       round(quantile_cont(dl, 0.25), 6) AS q1,
       round(quantile_cont(dl, 0.5), 6) AS q2,
       round(quantile_cont(dl, 0.75), 6) AS q3,
       round(max(dl), 6) AS max_dl
FROM dl
""",
        # string_stats over documents.text: lengths + char Shannon entropy
        "string_stats": """
WITH ch AS (SELECT unnest(split(text, '')) AS c FROM documents),
l AS (SELECT len(text) AS l FROM documents)
SELECT count(*)::BIGINT AS count, min(l)::BIGINT AS min_length,
       max(l)::BIGINT AS max_length, round(avg(l), 6) AS avg_length,
       (SELECT round(entropy(c), 6) FROM ch) AS entropy
FROM l
""",
        # t_test (Welch): purchase vs error event values
        "t_test": """
WITH a AS (SELECT count(*)::BIGINT n, avg(value) m, var_samp(value) v
           FROM events WHERE event_type = 'purchase'),
b AS (SELECT count(*)::BIGINT n, avg(value) m, var_samp(value) v
      FROM events WHERE event_type = 'error')
SELECT a.n AS n_a, b.n AS n_b, round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_value
FROM a, b
""",
        # moving_fn min/max/sum, window = 3 buckets BEFORE current (shift 0)
        "moving_fn": """
WITH buckets AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       round(min(doc_count) OVER w, 6) AS moving_min,
       round(max(doc_count) OVER w, 6) AS moving_max,
       round(sum(doc_count) OVER w, 6) AS moving_sum
FROM buckets
WINDOW w AS (ORDER BY bucket_s ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
ORDER BY bucket_s
""",
        # filters agg: named term buckets (vocab idx 1/5/11) + dl >= 32
        "filters_agg": _PRELUDE
        + """
, names AS (
  SELECT 'term_' || v.term AS filter_name, v.term
  FROM vocab v CROSS JOIN nv
  WHERE v.idx IN (1 % nv.c, 5 % nv.c, 11 % nv.c)
),
tbuckets AS (
  SELECT n.filter_name, count(*)::BIGINT AS doc_count,
         round(avg(dl.dl), 6) AS avg_dl
  FROM names n JOIN tf ON tf.term = n.term JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY 1
),
dlbucket AS (
  SELECT 'dl_gte_32' AS filter_name, count(*)::BIGINT AS doc_count,
         round(avg(dl), 6) AS avg_dl
  FROM dl WHERE dl >= 32
)
SELECT * FROM tbuckets UNION ALL SELECT * FROM dlbucket ORDER BY filter_name
""",
        # date_range: open head/tail + middle bucket, ES from-to keys
        "date_range": """
WITH e AS (SELECT epoch_us(ts) // 1000000 AS sec, value FROM events),
b AS (
  SELECT CASE WHEN sec < 1704672000 THEN '*-1704672000'
              WHEN sec < 1705276800 THEN '1704672000-1705276800'
              ELSE '1705276800-*' END AS key, value
  FROM e
),
keys AS (SELECT unnest(['*-1704672000', '1704672000-1705276800', '1705276800-*']) AS key)
SELECT k.key, count(b.value)::BIGINT AS doc_count,
       round(coalesce(sum(b.value), 0), 6) AS sum_value
FROM keys k LEFT JOIN b ON b.key = k.key GROUP BY k.key ORDER BY k.key
""",
        # rate agg: per-day bucket at hour unit (sum + value_count modes)
        "rate_agg": """
SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
       count(*)::BIGINT AS doc_count,
       round(sum(value) / 24, 6) AS rate_sum,
       round(count(*) / 24.0, 6) AS rate_count
FROM events GROUP BY 1 ORDER BY 1
""",
        # TSDS downsample: one rollup per (user, type) series per day;
        # last_value = latest by (us, event_id), ES's counter semantics
        "tsds_downsample": """
WITH e AS (SELECT user_id, event_type,
                  ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
                  epoch_us(ts) AS us, event_id, value FROM events),
agg AS (
  SELECT user_id::BIGINT AS user_id, event_type, bucket_s::BIGINT AS bucket_s,
         count(*)::BIGINT AS doc_count,
         round(min(value), 6) AS min_value, round(max(value), 6) AS max_value,
         round(sum(value), 6) AS sum_value,
         round(sum(value) / count(*), 6) AS avg_value
  FROM e GROUP BY 1, 2, 3),
lastv AS (
  SELECT user_id::BIGINT AS user_id, event_type, bucket_s::BIGINT AS bucket_s,
         round(value, 6) AS last_value,
         row_number() OVER (PARTITION BY user_id, event_type, bucket_s
                            ORDER BY us DESC, event_id DESC) AS rn
  FROM e)
SELECT a.user_id, a.event_type, a.bucket_s, a.doc_count, a.min_value,
       a.max_value, a.sum_value, a.avg_value, l.last_value
FROM agg a JOIN lastv l USING (user_id, event_type, bucket_s)
WHERE l.rn = 1 ORDER BY 1, 2, 3
""",
        # time_series agg: one bucket per (user, type) dimension tuple
        "time_series": """
SELECT user_id::BIGINT AS user_id, event_type,
       count(*)::BIGINT AS doc_count,
       min(epoch_us(ts) // 1000000)::BIGINT AS start_s,
       max(epoch_us(ts) // 1000000)::BIGINT AS end_s,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        # bucket_script: daily purchase revenue / click count (null if 0 clicks)
        "bucket_script": """
SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 6) AS num_sum,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS den_count,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
             / nullif(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0), 6)
         AS ratio
FROM events GROUP BY 1 ORDER BY 1
""",
        "eql_head": """
SELECT * FROM events WHERE value > 250.0 ORDER BY ts, event_id LIMIT 20
""",
        "eql_unique": """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
    ORDER BY ts, event_id) AS rn FROM events WHERE value > 200.0
) WHERE rn = 1 ORDER BY ts, event_id
""",
        "eql_sample": """
SELECT user_id,
       epoch_us(min(ts) FILTER (event_type = 'signup')) AS t1_us,
       epoch_us(min(ts) FILTER (event_type = 'error' AND value > 20.0))
         AS t2_us
FROM events GROUP BY 1
HAVING count(*) FILTER (event_type = 'signup') > 0
   AND count(*) FILTER (event_type = 'error' AND value > 20.0) > 0
ORDER BY 1
""",
        # eql funnel: earliest signup -> purchase -> error per user, maxspan 7d
        "eql_funnel": """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_type FROM events),
s1 AS (SELECT user_id, min(sec) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT s1.user_id, t1, min(sec) AS t2
       FROM s1 JOIN e ON e.user_id = s1.user_id AND e.event_type = 'purchase' AND e.sec > s1.t1
       GROUP BY 1, 2),
s3 AS (SELECT s2.user_id, t1, t2, min(sec) AS t3
       FROM s2 JOIN e ON e.user_id = s2.user_id AND e.event_type = 'error' AND e.sec > s2.t2
       GROUP BY 1, 2, 3)
SELECT user_id, t1 AS t1_s, t2 AS t2_s, t3 AS t3_s, (t3 - t1)::BIGINT AS span_s
FROM s3 WHERE t3 - t1 <= 604800 ORDER BY user_id
""",
        # matrix_stats over events (value, user_id): population co-moments
        "matrix_stats": """
WITH s AS (SELECT value AS x, user_id::DOUBLE AS y FROM events)
SELECT * FROM (
  SELECT 'user_id' AS field_a, 'user_id' AS field_b,
         count(*)::BIGINT AS doc_count, round(avg(y), 6) AS mean_a,
         round(var_pop(y), 6) AS covariance, 1.0 AS correlation FROM s
  UNION ALL
  SELECT 'user_id', 'value', count(*)::BIGINT, round(avg(y), 6),
         round(covar_pop(x, y), 6), round(corr(x, y), 6) FROM s
  UNION ALL
  SELECT 'value', 'value', count(*)::BIGINT, round(avg(x), 6),
         round(var_pop(x), 6), 1.0 FROM s
)
ORDER BY field_a, field_b
""",
        # more-like-this: top-5 terms of doc (29q mod n) by
        # (round(tf*idf,6) DESC, term ASC), BM25 with the source excluded
        # mlt with unlike: the negative doc's terms leave the candidate
        # set BEFORE the cutoff; both input docs excluded from results
        "mlt_unlike": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
mq AS (
  SELECT q AS query_id, (q * 29) % c AS src,
         CASE WHEN (q * 31 + 1) % c = (q * 29) % c
              THEN ((q * 31 + 1) % c + 1) % c
              ELSE (q * 31 + 1) % c END AS unl
  FROM generate_series(0, 49) t(q) CROSS JOIN nd
),
cand AS (
  SELECT m.query_id, m.src, m.unl, tf.term,
         round(tf.tf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 6) AS sel
  FROM mq m JOIN tf ON tf.doc_id = m.src
  JOIN df ON df.term = tf.term CROSS JOIN stats s
  WHERE tf.term NOT IN (
    SELECT t2.term FROM tf t2 WHERE t2.doc_id = m.unl
  )
),
selt AS (
  SELECT query_id, src, unl, term FROM (
    SELECT query_id, src, unl, term,
           row_number() OVER (PARTITION BY query_id ORDER BY sel DESC, term ASC)
             AS rn
    FROM cand
  ) WHERE rn <= 5
),
scored AS (
  SELECT st.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM selt st
  JOIN df ON df.term = st.term
  JOIN tf ON tf.term = st.term AND tf.doc_id <> st.src AND tf.doc_id <> st.unl
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY st.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""",
        "more_like_this": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
mq AS (
  SELECT q AS query_id, (q * 29) % c AS src
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
cand AS (
  SELECT m.query_id, m.src, tf.term,
         round(tf.tf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 6) AS sel
  FROM mq m JOIN tf ON tf.doc_id = m.src
  JOIN df ON df.term = tf.term CROSS JOIN stats s
),
selt AS (
  SELECT query_id, src, term FROM (
    SELECT query_id, src, term,
           row_number() OVER (PARTITION BY query_id ORDER BY sel DESC, term ASC)
             AS rn
    FROM cand
  ) WHERE rn <= 5
),
scored AS (
  SELECT st.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM selt st
  JOIN df ON df.term = st.term
  JOIN tf ON tf.term = st.term AND tf.doc_id <> st.src
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY st.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K)),
        # terms lookup: 5 rarest (df ASC, term ASC) terms of doc (23q+3 mod n)
        # → distinct docs containing any (constant-score filter)
        "terms_lookup": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
lk AS (
  SELECT q AS query_id, (q * 23 + 3) % c AS src
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
lterms AS (
  SELECT query_id, term FROM (
    SELECT lk.query_id, tf.term,
           row_number() OVER (PARTITION BY lk.query_id
                              ORDER BY df.df ASC, tf.term ASC) AS rn
    FROM lk JOIN tf ON tf.doc_id = lk.src
    JOIN df ON df.term = tf.term
  ) WHERE rn <= 5
)
SELECT DISTINCT lt.query_id::BIGINT AS query_id, tf.doc_id::BIGINT AS doc_id
FROM lterms lt JOIN tf ON tf.term = lt.term
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        "lang_counts": """
SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang ORDER BY lang
""",
        # enrich processor: nation|>region policy decorates the customer stream
        # range policy: CASE tiers mirror the [lo, hi) interval table
        "enrich_range": """
SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 2500 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
       count(*)::BIGINT AS n,
       sum(round(c_acctbal * 100, 0))::BIGINT AS bal_cents
FROM customer GROUP BY tier ORDER BY tier
""",
        "enrich_customers": """
SELECT c.c_custkey::BIGINT AS c_custkey, c.c_mktsegment, n.n_name, r.r_name
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
ORDER BY c_custkey
""",
        # update_by_query retags lang 'de'→'und' before the same groupby
        "update_lang_counts": """
SELECT CASE WHEN lang = 'de' THEN 'und' ELSE lang END AS lang,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1 ORDER BY lang
""",
        # DSIR: top-200 docs by smoothed unigram LLR toward lang='en'
        "dsir_select": _PRELUDE
        + """
, tcf AS (
  SELECT tf.term, sum(tf.tf) AS cf
  FROM tf JOIN documents d ON d.doc_id = tf.doc_id AND d.lang = 'en'
  GROUP BY tf.term
),
tot AS (
  SELECT (SELECT coalesce(sum(cf), 0) FROM tcf) AS t_total,
         (SELECT sum(cf) FROM df) AS s_total,
         (SELECT c FROM nv) AS v
),
lp AS (
  SELECT df.term,
         ln((coalesce(tcf.cf, 0) + 1) / (tot.t_total + tot.v))
       - ln((df.cf + 1) / (tot.s_total + tot.v)) AS llr
  FROM df LEFT JOIN tcf ON tcf.term = df.term CROSS JOIN tot
),
w AS (
  SELECT tf.doc_id, round(sum(tf.tf * lp.llr), 6) AS logw
  FROM tf JOIN lp ON lp.term = tf.term GROUP BY tf.doc_id
),
sel AS (
  SELECT doc_id, logw,
         row_number() OVER (ORDER BY logw DESC, doc_id ASC) AS rn
  FROM w
)
SELECT doc_id::BIGINT AS doc_id, logw FROM sel WHERE rn <= 200 ORDER BY doc_id
""",
        "exact_dedup": """
SELECT min(doc_id)::BIGINT AS rep_doc_id, count(*)::BIGINT AS n_dups
FROM documents GROUP BY text ORDER BY rep_doc_id
""",
        # decontamination: any shared 3-gram with the doc_id%17==0 benchmark
        "decontaminate": """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words
)
SELECT DISTINCT c.doc_id::BIGINT AS doc_id
FROM sh c JOIN sh b ON b.s = c.s AND b.doc_id % 17 = 0
WHERE c.doc_id % 17 <> 0
ORDER BY doc_id
""",
        "jaccard_dups": """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words WHERE len(w) >= 3
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
)
SELECT a, b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
WHERE i / (sa.sz + sb.sz - i) >= 0.8 ORDER BY a, b
""",
        "quality_scores": """
WITH base AS (
  SELECT doc_id, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents)
SELECT doc_id, n_chars, n_tokens, stop_ratio, mean_tok_len,
       round(0.5 * least(n_tokens, 100) / 100.0
             + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
             + 0.2 * stop_ratio, 6) AS quality
FROM base ORDER BY doc_id
""",
        # tokenizer fertility per language
        "tokenizer_stats": """
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
       round(sum(len(string_split(text, ' ')))::DOUBLE / count(*), 6) AS avg_dl,
       round(sum(len(text))::DOUBLE / sum(len(string_split(text, ' '))), 6)
         AS chars_per_token
FROM documents GROUP BY lang ORDER BY lang
""",
        # ingest-pipeline simulate: gsub ▸ uppercase ▸ set ▸ fingerprint
        "percolate_bool": _PRELUDE
        + """
, mq AS (
  SELECT q AS query_id, v1.term AS t1, v2.term AS t2, v3.term AS t3
  FROM generate_series(0, 49) t(q) CROSS JOIN nv
  JOIN vocab v1 ON v1.idx = q % nv.c
  JOIN vocab v2 ON v2.idx = (7*q+3) % nv.c
  JOIN vocab v3 ON v3.idx = (7*q+1) % nv.c
),
matches AS (
  SELECT m.query_id, tf1.doc_id
  FROM mq m
  JOIN tf tf1 ON tf1.term = m.t1
  JOIN tf tf2 ON tf2.term = m.t2 AND tf2.doc_id = tf1.doc_id
  WHERE m.t3 IN (m.t1, m.t2)
     OR NOT EXISTS (
       SELECT 1 FROM tf tn
       WHERE tn.term = m.t3 AND tn.doc_id = tf1.doc_id
     )
)
SELECT DISTINCT doc_id::BIGINT AS doc_id, query_id::BIGINT AS query_id
FROM matches ORDER BY doc_id, query_id
""",
        "simulate_grok": """
SELECT doc_id, source,
       CAST(regexp_extract(source, '^src([+-]?\\d+)$', 1) AS BIGINT)
         AS srcnum,
       regexp_extract(source, '^src(.*)$', 1) AS srcnum_s
FROM documents ORDER BY doc_id
""",
        # kv over gsub-normalized JSON-ish props: the single numeric value
        "ingest_kv": """
SELECT event_id, regexp_replace(props, '[^0-9]', '', 'g')::BIGINT AS props_k
FROM events ORDER BY event_id
""",
        "simulate_pipeline": """
WITH s AS (
  SELECT doc_id,
         upper(regexp_replace(text, '[aeiou]', '_', 'g')) AS text,
         lang
  FROM documents)
SELECT doc_id, text, lang, 'simulated' AS tag,
       sha256(text || '|' || lang) AS fp
FROM s ORDER BY doc_id
""",
        # MLM masking: (pos + doc_id) mod 7 == 0 → [MASK] (0-based pos)
        "mlm_examples": """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id,
       string_agg(CASE WHEN (pos - 1 + doc_id) % 7 = 0 THEN '[MASK]' ELSE tok END,
                  ' ' ORDER BY pos) AS masked,
       count(*) FILTER ((pos - 1 + doc_id) % 7 = 0)::BIGINT AS n_masked
FROM tok GROUP BY doc_id ORDER BY doc_id
""",
        # fixed-weight logistic quality classifier (threshold on rounded p)
        "quality_classifier": """
WITH base AS (
  SELECT doc_id, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
z AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(3.0 * stop_ratio - 0.4 * mean_tok_len
               + 2.0 * least(n_tokens, 100) / 100.0 + 0.5))), 6) AS prob
  FROM base)
SELECT doc_id, prob, (prob >= 0.5)::BIGINT AS keep
FROM z ORDER BY doc_id
""",
        # curriculum: ntile(4) over (quality ASC, doc_id ASC)
        "curriculum": """
WITH base AS (
  SELECT doc_id, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
q AS (
  SELECT doc_id,
         round(0.5 * least(n_tokens, 100) / 100.0
               + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
               + 0.2 * stop_ratio, 6) AS quality
  FROM base)
SELECT doc_id, quality,
       ntile(4) OVER (ORDER BY quality ASC, doc_id ASC)::BIGINT AS stage
FROM q ORDER BY doc_id
""",
        "curated_corpus": """
WITH base AS (
  SELECT doc_id, lang, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
SELECT b.doc_id, b.lang, b.n_tokens,
       round(0.5 * least(n_tokens, 100) / 100.0
             + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
             + 0.2 * stop_ratio, 6) AS quality
FROM base b JOIN reps USING (doc_id)
WHERE n_tokens >= 20 AND mean_tok_len <= 8.0 AND lang IN ('en', 'fr')
ORDER BY doc_id
""",
        # per-source (domain-level) stats: quality summed as integer
        # micro-units — order-exact on both sides
        "source_stats": """
WITH base AS (
  SELECT doc_id, source, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
q AS (
  SELECT doc_id, source, n_tokens,
         round(0.5 * least(n_tokens, 100) / 100.0
               + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
               + 0.2 * stop_ratio, 6) AS quality
  FROM base)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(CAST(round(quality * 1000000, 0) AS BIGINT))
             / (count(*) * 1000000.0), 6) AS mean_quality,
       round(sum(n_tokens) / count(*)::DOUBLE, 6) AS mean_tokens
FROM q GROUP BY source ORDER BY source
""",
        # CCNet-style domain filter: keep docs whose SOURCE's mean quality
        # clears the bar
        "source_filter": """
WITH base AS (
  SELECT doc_id, source, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
q AS (
  SELECT doc_id, source,
         round(0.5 * least(n_tokens, 100) / 100.0
               + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
               + 0.2 * stop_ratio, 6) AS quality
  FROM base),
s AS (
  SELECT source,
         round(sum(CAST(round(quality * 1000000, 0) AS BIGINT))
               / (count(*) * 1000000.0), 6) AS mean_quality
  FROM q GROUP BY source)
SELECT q.doc_id, q.source, q.quality
FROM q JOIN s ON s.source = q.source
WHERE s.mean_quality >= 0.445 ORDER BY q.doc_id
""",
        # Naive-Bayes training: Laplace-smoothed ln((c+1)/(tokens_lang+V))
        # as integer micro-units (round = half-away, matching the engine)
        "nb_train": """
WITH pairs AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (
  SELECT lang, term, count(*)::BIGINT AS c FROM pairs GROUP BY lang, term),
tot AS (SELECT lang, sum(c)::BIGINT AS t FROM counts GROUP BY lang),
v AS (SELECT count(DISTINCT term)::BIGINT AS v FROM counts)
SELECT c.lang, c.term, c.c,
       CAST(round(ln((c.c + 1.0) / (t.t + v.v)) * 1000000) AS BIGINT) AS w_micro
FROM counts c JOIN tot t USING (lang) CROSS JOIN v
ORDER BY c.lang, c.term
""",
        # ES ML anomaly detection (deterministic robust-z-score core):
        # per-type median/MAD of day-bucket counts, spread floored at 1
        "anomaly_scores": """
WITH b AS (
  SELECT event_type,
         ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS actual
  FROM events GROUP BY event_type, bucket_s),
m AS (
  SELECT event_type,
         median(actual::DOUBLE) AS typical,
         mad(actual::DOUBLE) AS spread
  FROM b GROUP BY event_type)
SELECT b.event_type, b.bucket_s, b.actual,
       round(m.typical, 6) AS typical,
       round(m.spread, 6) AS spread,
       round(abs(b.actual - m.typical) / greatest(m.spread, 1.0), 6)
         AS anomaly_score
FROM b JOIN m USING (event_type)
ORDER BY b.event_type, b.bucket_s
""",
        # x-pack data-frame-analytics regression (deterministic OLS):
        # exact BIGINT moments, each converted to DOUBLE before the closed
        # form — the identical IEEE expression tree as pipelines/regress.py
        "ols_fit": """
WITH m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy,
         sum(CAST(round(l_extendedprice) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS syy
  FROM lineitem),
c AS (
  SELECT n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n,
         n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS var_x,
         n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS var_y
  FROM m),
s AS (SELECT *, cov_n / var_x AS slope FROM c)
SELECT n, round(slope, 6) AS slope,
       round((syd - slope * sxd) / nd, 6) AS intercept,
       round((cov_n * cov_n) / (var_x * var_y), 6) AS r2
FROM s
""",
        "inference_agg": """
WITH m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem),
c AS (
  SELECT n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n,
         n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS var_x
  FROM m),
s AS (SELECT cov_n / var_x AS slope, syd, sxd, nd FROM c),
f AS (SELECT slope, (syd - slope * sxd) / nd AS icept FROM s),
b AS (
  SELECT l_returnflag, count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sq
  FROM lineitem GROUP BY 1)
SELECT b.l_returnflag, b.n,
       round(b.sq::DOUBLE / b.n::DOUBLE, 6) AS avg_qty,
       round(f.slope * (b.sq::DOUBLE / b.n::DOUBLE) + f.icept, 6) AS pred_usd
FROM b, f ORDER BY 1
""",
        "ols_predict": """
WITH m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem),
c AS (
  SELECT n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n,
         n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS var_x
  FROM m),
s AS (SELECT cov_n / var_x AS slope, syd, sxd, nd FROM c),
f AS (SELECT slope, (syd - slope * sxd) / nd AS icept FROM s),
p AS (
  SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
         CAST(round(l_extendedprice) AS BIGINT) AS y_usd,
         round(f.slope * l_quantity + f.icept, 6) AS pred_usd
  FROM lineitem CROSS JOIN f)
SELECT l_orderkey, l_linenumber, y_usd, pred_usd,
       round(y_usd - pred_usd, 6) AS resid_usd
FROM p ORDER BY l_orderkey, l_linenumber
""",
        # Naive-Bayes inference via the sparse identity: score = prior
        # + dl*floor + SUM_present tf*(w - floor)  ==  prior + SUM tf*w_dense
        "nb_predict": """
WITH pairs AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (
  SELECT lang, term, count(*)::BIGINT AS c FROM pairs GROUP BY lang, term),
tot AS (SELECT lang, sum(c)::BIGINT AS t FROM counts GROUP BY lang),
v AS (SELECT count(DISTINCT term)::BIGINT AS v FROM counts),
w AS (
  SELECT c.lang, c.term,
         CAST(round(ln((c.c + 1.0) / (t.t + v.v)) * 1000000) AS BIGINT) AS w
  FROM counts c JOIN tot t USING (lang) CROSS JOIN v),
fl AS (
  SELECT t.lang, CAST(round(ln(1.0 / (t.t + v.v)) * 1000000) AS BIGINT) AS f
  FROM tot t CROSS JOIN v),
nd AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
pr AS (
  SELECT lang,
         CAST(round(ln(n / (SELECT sum(n)::DOUBLE FROM nd)) * 1000000) AS BIGINT) AS p
  FROM nd),
dt AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dtf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM dt GROUP BY doc_id, term),
ddl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM dt GROUP BY doc_id),
contrib AS (
  SELECT dtf.doc_id, w.lang, sum(dtf.tf * (w.w - fl.f))::BIGINT AS s
  FROM dtf JOIN w USING (term) JOIN fl ON fl.lang = w.lang
  GROUP BY dtf.doc_id, w.lang),
scores AS (
  SELECT d.doc_id, pr.lang,
         (pr.p + d.dl * fl.f + coalesce(c.s, 0))::BIGINT AS score
  FROM ddl d CROSS JOIN pr
  JOIN fl ON fl.lang = pr.lang
  LEFT JOIN contrib c ON c.doc_id = d.doc_id AND c.lang = pr.lang)
SELECT doc_id, lang AS pred_lang, score AS score_micro
FROM scores
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) = 1
ORDER BY doc_id
""",
        "top_quality_per_lang": """
WITH base AS (
  SELECT doc_id, lang, len(text)::BIGINT AS n_chars,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
               w -> w IN ('the','and','of','a','to','in','is','it','that','for',
                          'on','with','as','at','by','an','be','or','this','are',
                          'from')))::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
         round((n_chars - (n_tokens - 1))::DOUBLE / greatest(n_tokens, 1), 6)
           AS mean_tok_len
  FROM documents),
q AS (
  SELECT doc_id, lang,
         round(0.5 * least(n_tokens, 100) / 100.0
               + 0.3 * (1 - least(mean_tok_len, 10.0) / 10.0)
               + 0.2 * stop_ratio, 6) AS quality
  FROM base),
ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ASC)
           AS rank,
         doc_id, quality
  FROM q)
SELECT lang, rank::BIGINT AS rank, doc_id, quality
FROM ranked WHERE rank <= 3 ORDER BY lang, rank
""",
        "token_count_bpe": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))::BIGINT
         AS n_bpe
FROM documents ORDER BY doc_id
""",
        # pipeline aggs over the daily doc-count histogram
        "date_histogram_pipeline": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       round(doc_count - lag(doc_count) OVER (ORDER BY bucket_s), 6) AS derivative,
       round(sum(doc_count) OVER (ORDER BY bucket_s), 6) AS cumulative_sum,
       round(avg(doc_count) OVER (ORDER BY bucket_s
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
         AS moving_avg
FROM e ORDER BY bucket_s
""",
        # terms_set: >= M of N distinct terms, M from the per-doc field
        "terms_set": _PRELUDE
        + """
, qn AS (SELECT query_id, count(DISTINCT term) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
)
SELECT h.query_id, h.doc_id, h.m::BIGINT AS n_matched,
       least(qn.nt, 1 + d.n_chars % qn.nt)::BIGINT AS required
FROM hits h JOIN qn USING (query_id) JOIN documents d ON d.doc_id = h.doc_id
WHERE h.m >= least(qn.nt, 1 + d.n_chars % qn.nt)
ORDER BY h.query_id, h.doc_id
""",
        # phrase suggester: per-slot levenshtein candidates ranked by
        # (sum edit, bigram count, cf product, phrase)
        "phrase_suggest": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS dl
  FROM documents
),
toks AS (SELECT unnest(t) AS term FROM d),
cf AS (SELECT term, count(*)::DOUBLE AS cf FROM toks GROUP BY term),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS idx
  FROM (SELECT DISTINCT term FROM toks)
),
nv AS (SELECT count(*) AS c FROM vocab),
bi AS (
  SELECT t[i+1] AS a, t[i+2] AS b, count(*)::BIGINT AS n
  FROM d, unnest(range(dl-1)) AS u(i)
  GROUP BY 1, 2
),
fq AS (
  SELECT q AS query_id, v1.term AS w1,
         CASE WHEN len(v2.term) > 1
              THEN substr(v2.term, 1, q % len(v2.term))
                   || substr(v2.term, (q % len(v2.term)) + 2)
              ELSE v2.term END AS w2
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nv
  JOIN vocab v1 ON v1.idx = (11 * q + 3) % nv.c
  JOIN vocab v2 ON v2.idx = (17 * q + 5) % nv.c
),
c1 AS (
  SELECT fq.query_id, c.term AS t1,
         levenshtein(c.term, fq.w1)::BIGINT AS e1, c.cf AS cf1
  FROM fq JOIN cf c ON levenshtein(c.term, fq.w1) <= 1
),
c2 AS (
  SELECT fq.query_id, c.term AS t2,
         levenshtein(c.term, fq.w2)::BIGINT AS e2, c.cf AS cf2
  FROM fq JOIN cf c ON levenshtein(c.term, fq.w2) <= 1
),
cand AS (
  SELECT c1.query_id, t1, t2, e1 + e2 AS dist,
         coalesce(bi.n, 0) AS pair_count, cf1 * cf2 AS cfp
  FROM c1 JOIN c2 USING (query_id)
  LEFT JOIN bi ON bi.a = c1.t1 AND bi.b = c2.t2
),
ranked AS (
  SELECT query_id, t1, t2, dist, pair_count,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, pair_count DESC, cfp DESC,
                                     t1 ASC, t2 ASC) AS pos
  FROM cand
)
SELECT query_id::BIGINT AS query_id, pos::BIGINT AS pos, t1, t2,
       dist::BIGINT AS dist, pair_count::BIGINT AS pair_count
FROM ranked WHERE pos <= 3 ORDER BY query_id, pos
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # top_metrics: top-3 docs per lang by (n_chars DESC, doc_id ASC)
        "top_metrics": """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
)
SELECT lang, rank::BIGINT AS rank, doc_id, n_chars
FROM r WHERE rank <= 3 ORDER BY lang, rank
""",
        # diversified_sampler: sha-ordered greedy sample, <= 10 per lang,
        # first 40 overall
        "diversified_sampler": """
WITH s AS (SELECT doc_id, lang, sha256(text) AS sha FROM documents),
r AS (
  SELECT doc_id, lang, sha,
         row_number() OVER (PARTITION BY lang ORDER BY sha) AS rn
  FROM s
),
p AS (SELECT doc_id, lang, sha FROM r WHERE rn <= 10 ORDER BY sha LIMIT 40)
SELECT doc_id, lang, sha FROM p ORDER BY doc_id
""",
        # auto_date_histogram: smallest ladder interval with <= 35 buckets
        "auto_date_histogram": """
WITH e AS (SELECT epoch_us(ts) // 1000000 AS ep FROM events),
mm AS (SELECT min(ep) AS mn, max(ep) AS mx FROM e),
iv AS (
  SELECT CASE
    WHEN mx // 60 - mn // 60 + 1 <= 35 THEN 60
    WHEN mx // 300 - mn // 300 + 1 <= 35 THEN 300
    WHEN mx // 600 - mn // 600 + 1 <= 35 THEN 600
    WHEN mx // 1800 - mn // 1800 + 1 <= 35 THEN 1800
    WHEN mx // 3600 - mn // 3600 + 1 <= 35 THEN 3600
    WHEN mx // 10800 - mn // 10800 + 1 <= 35 THEN 10800
    WHEN mx // 43200 - mn // 43200 + 1 <= 35 THEN 43200
    WHEN mx // 86400 - mn // 86400 + 1 <= 35 THEN 86400
    ELSE 604800 END AS interval_s
  FROM mm
)
SELECT iv.interval_s::BIGINT AS interval_s,
       (ep // iv.interval_s) * iv.interval_s AS bucket_s,
       count(*)::BIGINT AS doc_count
FROM e CROSS JOIN iv GROUP BY 1, 2 ORDER BY bucket_s
""",
        # cumulative_cardinality: exact first-seen-day cumsum
        "cumulative_cardinality": """
WITH f AS (
  SELECT user_id,
         min(((epoch_us(ts) // 1000000) // 86400) * 86400) AS d
  FROM events GROUP BY user_id
),
n AS (SELECT d AS bucket_s, count(*)::BIGINT AS new_users FROM f GROUP BY 1)
SELECT bucket_s, new_users,
       sum(new_users) OVER (ORDER BY bucket_s)::BIGINT AS cumulative_users
FROM n ORDER BY bucket_s
""",
        # normalize pipeline agg (percent_of_sum) over lang doc counts
        "normalize_agg": """
WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang)
SELECT lang, n_docs,
       round(n_docs / sum(n_docs) OVER () * 100.0, 6) AS normalized
FROM c ORDER BY lang
""",
        # geo_distance aggregation: distance rings + avg acctbal
        "geo_rings": _GEO_PTS
        + """
, d AS (
  SELECT c_acctbal,
         2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat) / 2.0) * sin(radians(lat) / 2.0)
           + cos(radians(lat))
             * sin(radians(lon) / 2.0) * sin(radians(lon) / 2.0)
         )) AS dist
  FROM pts
)
SELECT CASE WHEN dist < 2500.0 THEN '*-2500'
            WHEN dist < 5000.0 THEN '2500-5000'
            WHEN dist < 10000.0 THEN '5000-10000'
            ELSE '10000-*' END AS ring,
       count(*)::BIGINT AS doc_count,
       round(sum(c_acctbal) / count(*), 6) AS avg_acctbal
FROM d GROUP BY 1 ORDER BY min(dist)
""",
        # rank_feature: BM25 + 1.5 * x/(x+256) saturation on n_chars
        "rank_feature": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
           AS bs
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
comb AS (
  SELECT sc.query_id, sc.doc_id,
         round(sc.bs + 1.5 * (d.n_chars / (d.n_chars + 256.0)), 6) AS score
  FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM comb
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""",
        # rank_feature sigmoid: x^e / (x^e + pivot^e), e = 0.6
        "rank_feature_sigmoid": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) )
           AS bs
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
comb AS (
  SELECT sc.query_id, sc.doc_id,
         round(sc.bs + 1.5 * (pow(d.n_chars, 0.6)
               / (pow(d.n_chars, 0.6) + pow(256.0, 0.6))), 6) AS score
  FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM comb
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""",
        # scroll / PIT deep pagination: full drain in 25-row pages
        "scroll": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE qt.query_id < 10
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id,
       ((rank - 1) // 25 + 1)::BIGINT AS page,
       rank::BIGINT AS rank, doc_id, score
FROM ranked ORDER BY query_id, rank
""",
        # sliced scroll: slice = doc_id mod 3, per-slice rank/page from 1
        "sliced_scroll": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE qt.query_id < 10
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id % 3 AS slice_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id, doc_id % 3
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, slice_id::BIGINT AS slice_id,
       ((rank - 1) // 25 + 1)::BIGINT AS page,
       rank::BIGINT AS rank, doc_id, score
FROM ranked ORDER BY query_id, slice_id, rank
""",
        # stratified per-lang sample: smallest ceil(0.2 n) shas per lang
        "stratified_sample": """
WITH s AS (SELECT doc_id, lang, sha256(text) AS sha FROM documents),
r AS (
  SELECT doc_id, lang, sha,
         row_number() OVER (PARTITION BY lang ORDER BY sha) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM s
)
SELECT doc_id, lang FROM r WHERE rn <= ceil(0.2 * n) ORDER BY doc_id
""",
        # sibling pipeline aggs over the daily doc-count buckets
        "histogram_field_stats": """
SELECT count(*)::BIGINT AS value_count,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS p75,
       round(quantile_cont(l_quantity, 0.90), 6) AS p90,
       round(quantile_cont(l_quantity, 0.99), 6) AS p99
FROM lineitem
""",
        "sibling_bucket_stats": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets,
       round(avg(doc_count), 6) AS avg_bucket,
       min(doc_count)::DOUBLE AS min_bucket,
       max(doc_count)::DOUBLE AS max_bucket,
       round(sum(doc_count), 6) AS sum_bucket
FROM e
""",
        "serial_diff": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       (doc_count - lag(doc_count, 7) OVER (ORDER BY bucket_s))::DOUBLE
         AS serial_diff
FROM e ORDER BY bucket_s
""",
        # derivative + unit-normalized (per hour): Δvalue and Δvalue/Δkey*3600
        "derivative": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       round(doc_count - lag(doc_count) OVER w, 6) AS derivative,
       round((doc_count - lag(doc_count) OVER w)
             / (bucket_s - lag(bucket_s) OVER w) * 3600.0, 6)
         AS normalized_value
FROM e WINDOW w AS (ORDER BY bucket_s) ORDER BY bucket_s
""",
        "cumulative_sum": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       round(sum(doc_count) OVER (ORDER BY bucket_s), 6) AS cumulative_sum
FROM e ORDER BY bucket_s
""",
        # moving_percentiles: window = 5 buckets BEFORE current (shift 0)
        "moving_percentiles": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count,
       round(quantile_cont(doc_count, 0.25) OVER w, 6) AS p25,
       round(quantile_cont(doc_count, 0.50) OVER w, 6) AS p50,
       round(quantile_cont(doc_count, 0.75) OVER w, 6) AS p75
FROM e WINDOW w AS (ORDER BY bucket_s ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
ORDER BY bucket_s
""",
        # change_point: argmax over splits of |Δmean|·sqrt(s(n-s)/n)
        "change_point": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
),
o AS (
  SELECT bucket_s, doc_count,
         row_number() OVER (ORDER BY bucket_s) AS rn,
         sum(doc_count) OVER (ORDER BY bucket_s) AS cum,
         count(*) OVER () AS n,
         sum(doc_count) OVER () AS tot,
         lead(bucket_s) OVER (ORDER BY bucket_s) AS next_key
  FROM e
),
st AS (
  SELECT next_key AS bucket_s,
         round(abs(cum / rn - (tot - cum) / (n - rn))
               * sqrt(rn * (n - rn) / n::DOUBLE), 6) AS stat,
         round(cum / rn, 6) AS mean_before,
         round((tot - cum) / (n - rn), 6) AS mean_after
  FROM o WHERE rn < n
)
SELECT bucket_s, stat, mean_before, mean_after
FROM st ORDER BY stat DESC, bucket_s ASC LIMIT 1
""",
        "bucket_sort": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT bucket_s, doc_count FROM e
ORDER BY doc_count DESC, bucket_s ASC LIMIT 5 OFFSET 2
""",
        # bucket_selector: terms-agg buckets HAVING doc_count >= 3
        "bucket_selector": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
)
SELECT a.query_id::BIGINT AS query_id, d.lang, count(*)::BIGINT AS doc_count
FROM anded a JOIN documents d USING (doc_id)
GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2
""",
        # unigram LM score: avg token ln(cf/C) per doc, from corpus stats
        "unigram_logprob": _PRELUDE
        + """
, c AS (SELECT sum(cf) AS total FROM df)
SELECT tf.doc_id,
       round(sum(tf.tf * ln(df.cf / c.total)) / dl.dl, 6) AS logprob
FROM tf
JOIN df ON df.term = tf.term
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN c
GROUP BY tf.doc_id, dl.dl ORDER BY tf.doc_id
""",
        # CCNet head/middle/tail: ntile(3) per lang over the same
        # unigram-LM logprob, ties (logprob DESC, doc_id ASC)
        "perplexity_buckets": _PRELUDE
        + """
, c AS (SELECT sum(cf) AS total FROM df),
lp AS (
  SELECT tf.doc_id,
         round(sum(tf.tf * ln(df.cf / c.total)) / dl.dl, 6) AS logprob
  FROM tf
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN c
  GROUP BY tf.doc_id, dl.dl
)
SELECT lp.doc_id, d.lang, lp.logprob,
       ntile(3) OVER (
         PARTITION BY d.lang ORDER BY lp.logprob DESC, lp.doc_id
       )::BIGINT AS bucket
FROM lp JOIN documents d ON d.doc_id = lp.doc_id
ORDER BY lp.doc_id
""",
        # token-window chunking: window=32 stride=24; DuckDB 1-based
        # inclusive list slicing t[s+1 : min(s+32, dl)] mirrors the
        # engine's [s, min(s+32, dl)) 0-based half-open window
        "chunk_documents": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS dl
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, c::BIGINT AS chunk_id,
       (c*24)::BIGINT AS start,
       (least(c*24+32, dl) - c*24)::BIGINT AS n_tokens,
       array_to_string(t[c*24+1 : least(c*24+32, dl)], ' ') AS chunk
FROM d, unnest(range(((dl-1)//24)+1)) AS u(c)
ORDER BY doc_id, chunk_id
""",
        # PMI collocations: p(a,b) over B = Σdl − n_docs adjacent slots,
        # p(·) over T = Σdl tokens — cf comes from the SAME tokenization
        # both sides (string_split == index tokenizer on this corpus)
        "pmi_collocations": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS dl
  FROM documents
),
toks AS (SELECT doc_id, unnest(t) AS term FROM d),
cf AS (SELECT term, count(*)::DOUBLE AS cf FROM toks GROUP BY term),
s AS (SELECT (SELECT sum(dl)::DOUBLE FROM d) AS t_tot,
             (SELECT count(*)::DOUBLE FROM d) AS nd),
bi AS (
  SELECT t[i+1] AS a, t[i+2] AS b, count(*)::BIGINT AS pair_count
  FROM d, unnest(range(dl-1)) AS u(i)
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT a, b, pair_count,
       round(ln((pair_count / (t_tot - nd)) /
                ((ca.cf/t_tot)*(cb.cf/t_tot))), 6) AS pmi
FROM bi CROSS JOIN s
JOIN cf ca ON ca.term = bi.a JOIN cf cb ON cb.term = bi.b
ORDER BY a, b
""",
        # per-doc top-3 tf·idf keywords, ranked on the 6-dp-ROUNDED score
        # (ties → term ascending) exactly as the engine ranks
        "tfidf_top_terms": _PRELUDE
        + """
, scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * ln(stats.n / df.df), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id::BIGINT AS doc_id, rank::BIGINT AS rank, term, score
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
""",
        # percolator: boolean_and transposed (the engine computes it by
        # streaming DOCS against broadcast queries — reverse plan)
        "percolate": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
)
SELECT h.doc_id, h.query_id
FROM hits h JOIN qn USING (query_id) WHERE h.m = qn.nt
ORDER BY doc_id, query_id
""",
        # _rank_eval: precision@k / recall@k / MRR vs AND-match qrels
        "rank_eval": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id
  FROM scored
),
qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
relc AS (SELECT query_id, count(*)::DOUBLE AS nrel FROM anded GROUP BY query_id),
hitk AS (
  SELECT r.query_id, r.rank,
         CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ranked r
  LEFT JOIN anded a ON a.query_id = r.query_id AND a.doc_id = r.doc_id
  WHERE r.rank <= {k}
),
agg AS (
  SELECT query_id, sum(rel) AS nhit,
         min(CASE WHEN rel = 1 THEN rank END) AS first
  FROM hitk GROUP BY query_id
)
SELECT a.query_id,
       round(a.nhit / {k}.0, 6) AS precision_k,
       round(a.nhit / relc.nrel, 6) AS recall_k,
       round(coalesce(1.0 / a.first, 0), 6) AS mrr
FROM agg a JOIN relc USING (query_id) ORDER BY query_id
""".replace("{k}", str(_TOP_K)),
        # hard negatives: BM25 ranking anti-joined against the AND-match qrels
        "hard_negatives": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
negs AS (
  SELECT s.query_id, s.doc_id, s.score FROM scored s
  ANTI JOIN anded a ON a.query_id = s.query_id AND a.doc_id = s.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM negs
)
SELECT r.query_id, r.rank::BIGINT AS rank, r.doc_id, r.score
FROM ranked r JOIN (SELECT DISTINCT query_id FROM anded) q USING (query_id)
WHERE r.rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # Rocchio PRF: fb top-3 → 3 expansion terms (Σtf·idf) → weighted rerun
        "prf_expand": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
fb AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= 3
),
cand AS (
  SELECT f.query_id, tf.term, sum(tf.tf) AS sum_tf
  FROM fb f JOIN tf ON tf.doc_id = f.doc_id
  GROUP BY 1, 2
),
expn AS (
  SELECT query_id, term FROM (
    SELECT c.query_id, c.term,
           row_number() OVER (
             PARTITION BY c.query_id
             ORDER BY round(c.sum_tf * ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)), 6)
                        DESC,
                      c.term ASC) AS rnk
    FROM cand c
    JOIN df d ON d.term = c.term
    CROSS JOIN stats st
    ANTI JOIN qterm q ON q.query_id = c.query_id AND q.term = c.term
  ) WHERE rnk <= 3
),
wterms AS (
  SELECT query_id, term, 1.0 AS w FROM qterm
  UNION ALL
  SELECT query_id, term, 0.5 AS w FROM expn
),
final AS (
  SELECT wt.query_id, tf.doc_id,
         round(sum( wt.w * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM wterms wt
  JOIN df ON df.term = wt.term
  JOIN tf ON tf.term = wt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY wt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM final
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # DPR triples: 2 lowest-id positives × 3 hardest negatives per query
        "dpr_triples": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
pos AS (
  SELECT query_id, doc_id AS pos_doc,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS pr
  FROM anded
),
negs AS (
  SELECT s.query_id, s.doc_id, s.score FROM scored s
  ANTI JOIN anded a ON a.query_id = s.query_id AND a.doc_id = s.doc_id
),
nranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
           AS neg_rank,
         doc_id AS neg_doc
  FROM negs
)
SELECT p.query_id, p.pos_doc, n.neg_doc, n.neg_rank::BIGINT AS neg_rank
FROM pos p JOIN nranked n USING (query_id)
WHERE p.pr <= 2 AND n.neg_rank <= 3
ORDER BY query_id, pos_doc, neg_rank
""",
        # filtered alias: lang='en' gate on hits, index-wide stats on scores
        "filtered_alias": _PRELUDE
        + """
, scored AS (
  SELECT qt.query_id, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM qterm qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT sc.query_id,
         row_number() OVER (PARTITION BY sc.query_id
                            ORDER BY sc.score DESC, sc.doc_id ASC) AS rank,
         sc.doc_id, sc.score
  FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
  WHERE d.lang = 'en'
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{k}", str(_TOP_K)),
        # _profile counters: live terms, Σ df, OR-candidate count per query
        "profile": _PRELUDE
        + """
SELECT qt.query_id,
       count(DISTINCT qt.term)::BIGINT AS n_terms,
       sum(df.df)::BIGINT AS n_postings,
       (SELECT count(DISTINCT tf.doc_id) FROM tf
         JOIN qterm q2 ON q2.term = tf.term WHERE q2.query_id = qt.query_id)
         AS n_candidates
FROM qterm qt JOIN df ON df.term = qt.term
GROUP BY qt.query_id ORDER BY query_id
""",
        # _count API: OR-match doc count per query
        "count_terminated": _PRELUDE
        + """
, cnt AS (
  SELECT qt.query_id, count(DISTINCT tf.doc_id)::BIGINT AS total
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id
)
SELECT query_id, least(total, 100)::BIGINT AS n_matches,
       total > 100 AS terminated_early
FROM cnt ORDER BY query_id
""",
        "match_count": _PRELUDE
        + """
SELECT qt.query_id, count(DISTINCT tf.doc_id)::BIGINT AS n_matches
FROM qterm qt JOIN tf ON tf.term = qt.term
GROUP BY qt.query_id ORDER BY query_id
""",
        # _mget: metadata for ids (31q mod N)
        "ids_query": """
WITH nd AS (SELECT count(*) AS c FROM documents),
ids AS (
  SELECT DISTINCT (q * 37) % c AS doc_id
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
)
SELECT d.doc_id, d.lang, 1.0 AS score
FROM documents d JOIN ids USING (doc_id) ORDER BY doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        "mget": """
WITH nd AS (SELECT count(*) AS c FROM documents),
ids AS (
  SELECT DISTINCT (q * 31) % c AS doc_id
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
)
SELECT d.doc_id, d.lang, len(string_split(d.text, ' '))::BIGINT AS dl
FROM documents d JOIN ids USING (doc_id) ORDER BY doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # percentile_ranks: % of docs with dl <= v (exact)
        "percentile_ranks": """
WITH d AS (SELECT len(string_split(text, ' '))::BIGINT AS dl FROM documents),
nn AS (SELECT count(*)::DOUBLE AS n FROM d),
vs AS (SELECT unnest([8, 16, 32, 64]) AS value)
SELECT vs.value::BIGINT AS value,
       round(100.0 * (SELECT count(*) FROM d WHERE d.dl <= vs.value) / nn.n, 6) AS pct
FROM vs, nn ORDER BY value
""",
        # sequence packing: exclusive prefix sum of dl in doc_id order
        "pack_sequences": """
WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
o AS (
  SELECT doc_id,
         coalesce(sum(dl) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tok_offset
  FROM d
)
SELECT doc_id, tok_offset::BIGINT AS tok_offset,
       (tok_offset // 256)::BIGINT AS chunk_id
FROM o ORDER BY doc_id
""",
        # deterministic global shuffle: rank by sha256(doc_id ':' seed)
        "shuffle_order": """
SELECT doc_id,
       (row_number() OVER (ORDER BY sha256(doc_id::VARCHAR || ':s0'), doc_id) - 1)::BIGINT
         AS shuffle_rank
FROM documents ORDER BY doc_id
""",
        # regex redaction pipeline: pattern k counts+replaces on the output
        # of pattern k-1; verified via count + length + sha256(redacted)
        "redact_pii": """
WITH r1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, 'va[a-z]+')) AS c1,
         regexp_replace(text, 'va[a-z]+', '<PII>', 'g') AS t1
  FROM documents
),
r2 AS (
  SELECT doc_id,
         c1 + len(regexp_extract_all(t1, '[a-z]*ab[a-z]*')) AS n_redacted,
         regexp_replace(t1, '[a-z]*ab[a-z]*', '<PII>', 'g') AS t2
  FROM r1
)
SELECT doc_id, n_redacted::BIGINT AS n_redacted,
       length(t2)::BIGINT AS red_len, sha256(t2) AS red_sha
FROM r2 ORDER BY doc_id
""",
        # Gopher-style repetition signals over whitespace tokens
        "repetition_stats": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
agg AS (
  SELECT doc_id, count(*) AS n_distinct, max(c) AS top, sum(c) AS n_tokens
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_tokens::BIGINT AS n_tokens, n_distinct::BIGINT AS n_distinct,
       round(1.0 - n_distinct / n_tokens::DOUBLE, 6) AS dup_frac,
       round(top / n_tokens::DOUBLE, 6) AS top_frac
FROM agg ORDER BY doc_id
""",
        # content-hash split: equal-length lowercase hex compares numerically,
        # so the hex-string thresholds are exactly the engine's byte cuts
        "hash_split": """
SELECT doc_id,
       CASE WHEN substr(sha256(text), 1, 2) < 'cc' THEN 'train'
            WHEN substr(sha256(text), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
""",
        # filtered kNN: candidates restricted to label 3, queries unfiltered
        "ann_filtered": """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM q CROSS JOIN embeddings e WHERE e.label = 3
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank,
         vec_id, sim
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, vec_id, sim
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
""",
        # exact kNN graph: corpus self-join, per-vector top-k by rounded
        # cosine (ties nbr_id ASC), self-pairs excluded
        "knn_graph": """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
           AS sim
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rank,
         nbr_id, sim
  FROM scored
)
SELECT vec_id, rank::BIGINT AS rank, nbr_id, sim
FROM ranked WHERE rank <= 5 ORDER BY vec_id, rank
""",
        # x-pack outlier_detection (deterministic distance-feature subset):
        # integer micro-distances off the ROUNDED cosine, CASE-guarded
        # min-max normalization — mirrors pipelines/ann.outlier_scores
        "outlier_scores": """
WITH scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
           AS sim
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS rk,
         CAST(round((1 - sim) * 1000000) AS BIGINT) AS dmic
  FROM scored
),
feat AS (
  SELECT vec_id,
         round(max(CASE WHEN rk = 5 THEN dmic END) / 1000000.0, 6) AS dist_kth,
         round(sum(dmic) / (5 * 1000000.0), 6) AS dist_avg
  FROM ranked WHERE rk <= 5 GROUP BY vec_id
)
SELECT vec_id, dist_kth, dist_avg,
       round(CASE WHEN max(dist_kth) OVER () = min(dist_kth) OVER () THEN 0
                  ELSE 0.5 * (dist_kth - min(dist_kth) OVER ())
                       / (max(dist_kth) OVER () - min(dist_kth) OVER ()) END
           + CASE WHEN max(dist_avg) OVER () = min(dist_avg) OVER () THEN 0
                  ELSE 0.5 * (dist_avg - min(dist_avg) OVER ())
                       / (max(dist_avg) OVER () - min(dist_avg) OVER ()) END, 6)
         AS outlier_score
FROM feat ORDER BY vec_id
""",
        "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank,
         vec_id, sim
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, vec_id, sim
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
""",
        # ES knn.similarity: threshold on the rounded cosine, may return < k
        "knn_similarity": """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)
           AS sim
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank,
         vec_id, sim
  FROM scored WHERE sim >= 0.3
)
SELECT query_id, rank::BIGINT AS rank, vec_id, sim
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
""",
        # ES has_child: parents with ≥1 matching child, score_mode
        # count/max/sum over the matching children
        "has_child": """
SELECT o.o_orderkey, o.o_orderpriority,
       count(*)::BIGINT AS n_matches,
       max(l.l_quantity) AS max_qty,
       round(sum(l.l_quantity), 6) AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_quantity >= 48
GROUP BY 1, 2 ORDER BY 1
""",
        # ES nested: one lineitem satisfies ALL inner conditions (per-object AND)
        "nested_query": """
SELECT o.o_orderkey, o.o_orderpriority, count(*)::BIGINT AS n_matching
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_quantity >= 45 AND l.l_discount <= 0.01
GROUP BY 1, 2 ORDER BY 1
""",
        # ES reverse_nested: child buckets stepped back to distinct parents
        "reverse_nested": """
SELECT l_returnflag,
       count(DISTINCT l_orderkey)::BIGINT AS n_parents,
       count(*)::BIGINT AS n_children
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        # ES children agg: parent terms buckets stepping into child docs
        "children_agg": """
SELECT o.o_orderpriority,
       count(DISTINCT o.o_orderkey)::BIGINT AS parent_count,
       count(l.l_orderkey)::BIGINT AS child_count,
       round(coalesce(sum(l.l_quantity), 0), 6) AS sum_qty,
       round(avg(l.l_quantity), 6) AS avg_qty
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
""",
        # ES parent agg: child-field buckets stepping UP to distinct parents
        "parent_agg": """
WITH pairs AS (
  SELECT l_returnflag, l_orderkey, count(*)::BIGINT AS n_child
  FROM lineitem GROUP BY 1, 2
)
SELECT p.l_returnflag,
       sum(p.n_child)::BIGINT AS child_count,
       sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS parent_count,
       round(coalesce(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)), 0)
             / 100.0, 6) AS sum_totalprice,
       round((sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) / 100.0)
             / sum(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END), 6)
         AS avg_totalprice
FROM pairs p LEFT JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY 1 ORDER BY 1
""",
        # ES extended_stats_bucket over the daily doc-count buckets
        "ext_stats_bucket": """
WITH e AS (
  SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
         count(*)::BIGINT AS doc_count
  FROM events GROUP BY 1
)
SELECT count(*)::BIGINT AS "count",
       min(doc_count)::DOUBLE AS "min",
       max(doc_count)::DOUBLE AS "max",
       round(sum(doc_count) / count(*), 6) AS "avg",
       round(sum(doc_count), 6) AS "sum",
       round(sum(doc_count * doc_count), 6) AS sum_of_squares,
       round(sum(doc_count * doc_count) / count(*)
             - (sum(doc_count) / count(*)) * (sum(doc_count) / count(*)), 6)
         AS variance,
       round(sqrt(sum(doc_count * doc_count) / count(*)
             - (sum(doc_count) / count(*)) * (sum(doc_count) / count(*))), 6)
         AS std_deviation,
       round(sum(doc_count) / count(*)
             + 2.0 * sqrt(sum(doc_count * doc_count) / count(*)
               - (sum(doc_count) / count(*)) * (sum(doc_count) / count(*))), 6)
         AS std_upper,
       round(sum(doc_count) / count(*)
             - 2.0 * sqrt(sum(doc_count * doc_count) / count(*)
               - (sum(doc_count) / count(*)) * (sum(doc_count) / count(*))), 6)
         AS std_lower
FROM e
""",
        # ES has_parent: children whose parent matches the filter
        "has_parent": """
SELECT l.l_orderkey, l.l_linenumber::BIGINT AS l_linenumber, l.l_quantity
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
ORDER BY 1, 2
""",
        # geo family over the derived deterministic geo_point
        # (int64 arithmetic identical on both sides; see pipelines/geo.py)
        "geo_distance": _GEO_PTS
        + """
, d AS (
  SELECT c_custkey,
         2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat) / 2.0) * sin(radians(lat) / 2.0)
           + cos(radians(lat))
             * sin(radians(lon) / 2.0) * sin(radians(lon) / 2.0)
         )) AS dist
  FROM pts
)
SELECT c_custkey, round(dist, 6) AS dist_km
FROM d WHERE dist <= 3000.0 ORDER BY c_custkey
""",
        "geo_bbox": _GEO_PTS
        + """
SELECT c_custkey, lat, lon FROM pts
WHERE lat >= -50.0 AND lat <= 50.0 AND lon >= -60.0 AND lon <= 60.0
ORDER BY c_custkey
""",
        "geo_centroid": _GEO_PTS
        + """
SELECT c_mktsegment, count(*)::BIGINT AS n,
       round(sum(lat) / count(*), 6) AS lat_centroid,
       round(sum(lon) / count(*), 6) AS lon_centroid
FROM pts GROUP BY 1 ORDER BY 1
""",
        # geo_bounds per segment: min/max box, wrap_longitude=false
        "geo_bounds": _GEO_PTS
        + """
SELECT c_mktsegment, round(max(lat), 6) AS top, round(min(lat), 6) AS bottom,
       round(min(lon), 6) AS "left", round(max(lon), 6) AS "right"
FROM pts GROUP BY 1 ORDER BY 1
""",
        "geohex_grid": _GEO_PTS
        + """
, hexes AS (
  SELECT (sqrt(3.0)/3.0 * lon - lat/3.0) / 30.0 AS q,
         (2.0/3.0 * lat) / 30.0 AS r
  FROM pts
),
rounded AS (
  SELECT q, r, -q - r AS y,
         floor(q + 0.5) AS rq0, floor(-q - r + 0.5) AS ry,
         floor(r + 0.5) AS rr0
  FROM hexes
),
d AS (
  SELECT *, abs(rq0 - q) AS dq, abs(ry - y) AS dy, abs(rr0 - r) AS dr
  FROM rounded
),
fixed AS (
  SELECT CASE WHEN dq > dy AND dq > dr THEN -ry - rr0 ELSE rq0 END AS rq,
         CASE WHEN NOT (dq > dy AND dq > dr) AND dr > dy
              THEN -rq0 - ry ELSE rr0 END AS rr
  FROM d
)
SELECT (rq::BIGINT || '/' || rr::BIGINT) AS cell, count(*)::BIGINT AS n
FROM fixed GROUP BY 1 ORDER BY n DESC, cell ASC
""",
        "geotile_grid": _GEO_PTS
        + """
, latc AS (
  SELECT least(greatest(lat, -85.05112877980659), 85.05112877980659) AS latc, lon
  FROM pts
),
tiles AS (
  SELECT least(greatest(floor((lon + 180.0) / 360.0 * 8.0), 0), 7)::BIGINT AS x,
         least(greatest(floor((1.0 - ln(tan(radians(latc))
                + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 8.0), 0), 7)::BIGINT AS y
  FROM latc
)
SELECT ('3/' || x || '/' || y) AS tile, count(*)::BIGINT AS n
FROM tiles GROUP BY 1 ORDER BY n DESC, tile ASC
""",
        "tumbling_window": """
SELECT user_id, ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        # ES|QL pipes: the oracle is the pipe's literal SQL transliteration
        "esql_stats": """
SELECT lang, count(*)::BIGINT AS cnt, round(avg(n_chars), 6) AS avg_chars,
       max(n_chars) AS max_chars
FROM documents WHERE n_chars >= 100 GROUP BY lang ORDER BY lang
""",
        "esql_topn": """
SELECT event_id, round(value * 2, 6) AS v2
FROM events WHERE event_type = 'click'
ORDER BY v2 DESC, event_id ASC LIMIT 20
""",
        "esql_eval": """
SELECT doc_id, n_chars, half FROM (
  SELECT doc_id, n_chars, round(length(text) / 2, 6) AS half, lang
  FROM documents
) WHERE half > 150 AND lang = 'en' ORDER BY doc_id ASC LIMIT 50
""",
        "esql_grok": """
SELECT event_type, count(*)::BIGINT AS n,
       sum(CAST(regexp_extract(props, '^\\{"k": ([+-]?\\d+)\\}$', 1) AS BIGINT))::BIGINT AS s
FROM events GROUP BY event_type ORDER BY event_type
""",
        "esql_insist": """
SELECT lang AS tag, count(*)::BIGINT AS n FROM documents GROUP BY 1 ORDER BY 1
""",
        "esql_show": """
SELECT '0.1.0' AS version, '0' AS major,
       '0000000000000000000000000000000000000000' AS hash,
       '2026-01-01T00:00:00.000Z' AS date
""",
        "esql_math": """
SELECT l_orderkey, l_linenumber, ceil(l_extendedprice) AS c,
       floor(l_discount * 100) AS f,
       round(sqrt(l_quantity), 6) AS s,
       round(pow(l_quantity, 2), 6) AS p,
       round(log10(l_extendedprice), 6) AS lg,
       round(log2(l_quantity), 6) AS ln2,
       sign(l_extendedprice - 30000.0)::DOUBLE AS sg
FROM lineitem ORDER BY 1, 2, 3 LIMIT 200
""",
        "esql_vector": f"""
WITH qv AS (SELECT {_ESQL_QVEC}::DOUBLE[] AS v)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], v), 6) AS cos,
       round(list_inner_product(embedding::DOUBLE[], v), 6) AS dot,
       round(list_aggregate(list_transform(list_zip(embedding::DOUBLE[], v),
             x -> abs(x[1] - x[2])), 'sum'), 6) AS l1,
       round(list_distance(embedding::DOUBLE[], v), 6) AS l2,
       round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS mag
FROM embeddings, qv ORDER BY vec_id LIMIT 600
""",
        "ingest_transforms": """
SELECT doc_id,
       array_to_string(list_append(list_sort(string_split(text, ' ')), 'zzz'),
                       '-') AS text,
       lang,
       'https://me@' || source || ':8443/p/q?x=1#frag' AS source,
       n_chars * 1024 AS n_chars,
       'https' AS url_scheme,
       'me' AS url_user_info,
       source AS url_domain,
       '/p/q' AS url_path,
       'x=1' AS url_query,
       'frag' AS url_fragment,
       8443::BIGINT AS url_port
FROM documents WHERE lang != 'fr' ORDER BY doc_id
""",
        "cartesian_agg": """
WITH pts AS (
  SELECT c_mktsegment,
         ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS x,
         ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS y
  FROM customer
)
SELECT c_mktsegment, count(*)::BIGINT AS n,
       round(sum(x) / count(*), 6) AS centroid_x,
       round(sum(y) / count(*), 6) AS centroid_y,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM pts GROUP BY 1 ORDER BY 1
""",
        "search_mvt": """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM customer
),
t7 AS (
  SELECT c_custkey, lat, lon,
         least(greatest(floor((lon + 180.0) / 360.0 * 128.0), 0), 127)::BIGINT AS x7,
         least(greatest(floor((1.0 - ln(tan(radians(latc))
             + 1.0 / cos(radians(latc))) / pi()) / 2.0 * 128.0), 0), 127)::BIGINT AS y7
  FROM (SELECT *, least(greatest(lat, -85.05112877980659),
                        85.05112877980659) AS latc FROM pts)
),
intile AS (SELECT * FROM t7 WHERE x7 // 16 = 4 AND y7 // 16 = 3),
hits AS (
  SELECT 'hits' AS layer, c_custkey::VARCHAR AS "key", 1::BIGINT AS doc_count,
         round(lat, 6) AS lat, round(lon, 6) AS lon
  FROM intile ORDER BY c_custkey LIMIT 10
),
aggs AS (
  SELECT 'aggs' AS layer, ('7/' || x7 || '/' || y7) AS "key",
         count(*)::BIGINT AS doc_count,
         round(sum(lat) / count(*), 6) AS lat,
         round(sum(lon) / count(*), 6) AS lon
  FROM intile GROUP BY x7, y7
),
meta AS (
  SELECT 'meta' AS layer, '3/4/3' AS "key",
         (SELECT count(*) FROM intile)::BIGINT AS doc_count,
         round(degrees(atan((exp(pi() * (1.0 - 2.0 * 4.0 / 8.0))
             - exp(-(pi() * (1.0 - 2.0 * 4.0 / 8.0)))) / 2.0)), 6) AS lat,
         round(4.0 / 8.0 * 360.0 - 180.0, 6) AS lon
)
SELECT * FROM hits UNION ALL SELECT * FROM aggs UNION ALL SELECT * FROM meta
ORDER BY layer, "key"
""",
        "esql_score": """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
q AS (SELECT unnest(['data', 'engine', 'pipeline', 'query']) AS term),
sc AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * tf.tf
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))), 6) AS s
  FROM tf JOIN q USING (term) JOIN df USING (term)
       JOIN dl USING (doc_id), stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, s FROM sc ORDER BY s DESC, doc_id LIMIT 50
""",
        "esql_fuse": """
WITH b1 AS (
  SELECT doc_id, round(len(list_intersect(string_split(text, ' '),
    string_split('data pipeline query engine', ' '))) / 4.0, 6) AS s
  FROM documents ORDER BY s DESC, doc_id LIMIT 50
), b2 AS (
  SELECT doc_id, round(len(list_intersect(string_split(text, ' '),
    string_split('fast sort hash', ' '))) / 3.0, 6) AS s
  FROM documents ORDER BY s DESC, doc_id LIMIT 50
), u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
SELECT doc_id, round(sum(s), 6) AS _score FROM u
GROUP BY 1 ORDER BY _score DESC, doc_id
""",
        "esql_sort_nulls": """
SELECT event_id, CASE WHEN event_type = 'purchase' THEN value END AS price
FROM events ORDER BY price DESC NULLS LAST, event_id LIMIT 100
""",
        "esql_temporal_math": """
SELECT event_id, ts + INTERVAL 2 HOUR AS later,
       ts - INTERVAL 90 MINUTE AS earlier,
       ts + INTERVAL 7 DAY AS nxt,
       date_trunc('day', ts) AS day
FROM events ORDER BY event_id LIMIT 200
""",
        "esql_grid_conv": """
WITH pts AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         (c_custkey * 7919) % 18000 / 100.0 - 90.0 AS lat,
         (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
  FROM customer
),
cells AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, lat, lon,
         least(floor((lon + 180.0) / 360.0 * 32), 31)::BIGINT AS x,
         least(floor((lat + 90.0) / 180.0 * 32), 31)::BIGINT AS y,
         greatest(least(floor((lon + 180.0) / 360.0 * 16), 15), 0)::BIGINT AS tx,
         greatest(least(floor((1.0 - ln(tan(radians(
             greatest(least(lat, 85.05112877980659), -85.05112877980659)))
           + 1.0 / cos(radians(
             greatest(least(lat, 85.05112877980659), -85.05112877980659))))
           / pi()) / 2.0 * 16), 15), 0)::BIGINT AS ty
  FROM pts
),
enc AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, tx, ty,
         ((x // 16) % 2) * 512 + ((y // 16) % 2) * 256
       + ((x // 8) % 2) * 128 + ((y // 8) % 2) * 64
       + ((x // 4) % 2) * 32 + ((y // 4) % 2) * 16
       + ((x // 2) % 2) * 8 + ((y // 2) % 2) * 4
       + (x % 2) * 2 + (y % 2) AS v
  FROM cells
)
SELECT c_custkey,
       substr('0123456789bcdefghjkmnpqrstuvwxyz', (v // 32)::INT + 1, 1) ||
       substr('0123456789bcdefghjkmnpqrstuvwxyz', (v % 32)::INT + 1, 1) AS gh,
       '4/' || tx || '/' || ty AS gt,
       CASE WHEN trunc(c_acctbal * 100.0) >= 0
            THEN trunc(c_acctbal * 100.0)::UBIGINT END AS ul,
       (c_custkey % 10) || '.' || (c_custkey % 7) || '.0' AS ver,
       CAST(NULL AS VARCHAR) AS bad
FROM enc ORDER BY c_custkey LIMIT 150
""",
        "esql_spatial_rel": """
WITH pts AS (
  SELECT c_mktsegment,
         (c_custkey * 7919) % 18000 / 100.0 - 90.0 AS lat,
         (c_custkey * 104729) % 36000 / 100.0 - 180.0 AS lon
  FROM customer
),
f AS (
  SELECT c_mktsegment, lat, lon,
         (lon >= -60.05 AND lon <= 60.05
          AND lat >= -45.05 AND lat <= 45.05) AS inside
  FROM pts
)
SELECT c_mktsegment, count(*)::BIGINT AS n,
       count(*) FILTER (inside)::BIGINT AS nw,
       count(*) FILTER (inside)::BIGINT AS ni,
       count(*) FILTER (NOT inside)::BIGINT AS nd,
       count(*) FILTER (inside)::BIGINT AS nc,
       max(lon) AS mx, min(lat) AS my
FROM f GROUP BY 1 ORDER BY 1
""",
        "esql_knn": f"""
WITH qv AS (SELECT {_ESQL_QVEC}::DOUBLE[] AS v),
scored AS (
  SELECT vec_id, label,
         list_cosine_similarity(embedding::DOUBLE[], v) AS c
  FROM embeddings, qv WHERE label = 1
)
SELECT vec_id, label, round(c, 6) AS cos
FROM (SELECT *, rank() OVER (ORDER BY c DESC) AS r FROM scored)
WHERE r <= 10 ORDER BY cos DESC, vec_id LIMIT 100
""",
        "esql_string_fns": """
SELECT c_custkey, trim(c_name) AS t, left(c_name, 5) AS l5,
       right(c_name, 4) AS r4, reverse(c_mktsegment) AS rev,
       c_name LIKE '%1' AS ew, strpos(c_name, 'er#') AS loc,
       regexp_replace(c_mktsegment, 'A', '_', 'g') AS rep
FROM customer ORDER BY 1 LIMIT 120
""",
        "esql_mv_fns": """
WITH w AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents)
SELECT doc_id, len(l)::BIGINT AS n, l[1] AS f, l[-1] AS la,
       list_min(l) AS mn, list_max(l) AS mx
FROM w ORDER BY doc_id LIMIT 150
""",
        "esql_dates": """
SELECT (epoch_us(date_trunc('day', ts)) // 1000)::BIGINT AS day,
       isodow(ts)::BIGINT AS dow,
       strftime(ts, '%Y-%m-%d') AS dstr,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2, 3 ORDER BY 1
""",
        # week bucket is CALENDAR (Monday-anchored, ES semantics)
        "esql_bucket": """
SELECT floor(value / 5.0) * 5.0 AS b,
       epoch_ms(date_trunc('week', ts))::BIGINT AS w,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "esql_stats_where": """
SELECT l_linestatus,
       count(*) FILTER (l_returnflag = 'R')::BIGINT AS n_ret,
       sum(round(l_extendedprice * 100, 0)) FILTER (l_discount > 0.05) AS rev_disc,
       max(l_tax) FILTER (l_quantity >= 25) AS mx_tax,
       round(avg(l_quantity) FILTER (l_quantity >= 25), 6) AS avg_big
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_inlinestats": """
WITH t AS (
  SELECT l_returnflag, l_quantity,
         round(avg(l_quantity) OVER (PARTITION BY l_returnflag), 6) AS a
  FROM lineitem
)
SELECT l_returnflag, count(*)::BIGINT AS n, max(l_quantity) AS mx
FROM t WHERE l_quantity > a GROUP BY 1 ORDER BY 1
""",
        "esql_stddev": """
SELECT l_returnflag, round(stddev_pop(l_quantity), 6) AS sd,
       round(avg(l_quantity), 6) AS a
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_weighted_avg": """
SELECT l_linestatus,
       round(sum(l_quantity * l_linenumber) / sum(l_linenumber), 6) AS w
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_percentile": """
SELECT l_returnflag, round(quantile_cont(l_quantity, 0.9), 6) AS p
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_mad": """
SELECT l_linestatus, round(mad(l_quantity), 6) AS m
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_top": """
SELECT l_returnflag, (list(l_quantity ORDER BY l_quantity DESC))[1:5] AS t
FROM lineitem GROUP BY 1 ORDER BY 1
""",
        "esql_values": """
SELECT n_regionkey, list(n_name ORDER BY n_name) AS v,
       count(DISTINCT n_name)::BIGINT AS c
FROM nation GROUP BY 1 ORDER BY 1
""",
        # deterministic SAMPLE: lowercase-hex compare == the engine's
        # 2-byte digest threshold (0.25 * 2^16 = 0x4000)
        "esql_sample": """
SELECT o_orderstatus, count(*)::BIGINT AS n FROM orders
WHERE substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 4) < '4000'
GROUP BY 1 ORDER BY 1
""",
        "esql_fork": """
WITH f1 AS (
  SELECT l_linestatus, count(*)::BIGINT AS n FROM lineitem
  WHERE l_quantity >= 40 AND l_returnflag = 'R' GROUP BY 1
), f2 AS (
  SELECT l_returnflag, round(avg(l_quantity), 6) AS a FROM lineitem
  WHERE l_quantity >= 40 GROUP BY 1
)
SELECT l_linestatus, n, 'fork1' AS _fork,
       NULL::VARCHAR AS l_returnflag, NULL::DOUBLE AS a FROM f1
UNION ALL
SELECT NULL, NULL, 'fork2', l_returnflag, a FROM f2
ORDER BY _fork, l_linestatus NULLS LAST, n NULLS LAST,
         l_returnflag NULLS LAST, a NULLS LAST
""",
        "esql_completion": """
SELECT doc_id, '[test_echo] ' || lower(left(text, 30)) AS summary
FROM documents ORDER BY doc_id LIMIT 200
""",
        "esql_rerank": """
SELECT doc_id,
       round(len(list_intersect(string_split(text, ' '),
                 string_split('data pipeline query engine', ' '))) / 4.0, 6)
         AS _score
FROM documents ORDER BY _score DESC, doc_id ASC LIMIT 100
""",
        "esql_ts_rate": """
SELECT user_id,
       round((arg_max(value, ts) - arg_min(value, ts)) /
             ((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0), 6) AS r
FROM events GROUP BY 1 ORDER BY 1
""",
        "esql_match": """
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE list_has_any(string_split(text, ' '), ['join', 'vector'])
GROUP BY 1 ORDER BY 1
""",
        "esql_qstr": """
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE list_contains(string_split(text, ' '), 'fast')
  AND (list_contains(string_split(text, ' '), 'sort')
       OR list_contains(string_split(text, ' '), 'hash'))
  AND NOT list_contains(string_split(text, ' '), 'group')
GROUP BY 1 ORDER BY 1
""",
        "esql_post_stats": """
WITH a AS (
  SELECT l_returnflag, count(*)::BIGINT AS n FROM lineitem
  GROUP BY l_suppkey, l_returnflag
), b AS (
  SELECT l_returnflag, round(n / 2, 6) AS half FROM a WHERE n >= 3
)
SELECT l_returnflag, max(half) AS mx, count(*)::BIGINT AS groups
FROM b GROUP BY 1 ORDER BY 1
""",
        "esql_fork_rrf": """
WITH b1 AS (
  SELECT doc_id, round(len(list_intersect(string_split(text, ' '),
    string_split('data pipeline query engine', ' '))) / 4.0, 6) AS s
  FROM documents ORDER BY s DESC, doc_id LIMIT 50
), r1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM b1
), b2 AS (
  SELECT doc_id, round(len(list_intersect(string_split(text, ' '),
    string_split('fast sort hash', ' '))) / 3.0, 6) AS s
  FROM documents ORDER BY s DESC, doc_id LIMIT 50
), r2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM b2
), u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
SELECT doc_id, round(sum(1.0/(60+rn)), 6) AS _score FROM u
GROUP BY 1 ORDER BY _score DESC, doc_id
""",
        # two-segment SSE mean-shift split (ties -> smallest k), marker on
        # the first right-segment row — the engine's documented semantics
        "esql_change_point": """
WITH series AS (
  SELECT o_orderpriority AS k, count(*)::BIGINT AS v FROM orders GROUP BY 1
), s AS (
  SELECT k, v, row_number() OVER (ORDER BY k) AS rn,
         sum(v) OVER (ORDER BY k) AS s1, sum(v*v) OVER (ORDER BY k) AS q1,
         count(*) OVER () AS n, sum(v) OVER () AS st, sum(v*v) OVER () AS qt
  FROM series
), sse AS (
  SELECT rn, (q1 - s1*s1/rn) + ((qt - q1) - (st - s1)*(st - s1)/(n - rn)) AS sse,
         qt - st*st/n AS total
  FROM s WHERE rn < (SELECT max(rn) FROM s)
), best AS (
  SELECT rn, sse, total FROM sse ORDER BY round(sse, 9), rn LIMIT 1
)
SELECT s.k AS o_orderpriority, s.v AS v,
       CASE WHEN s.rn = best.rn + 1 THEN 'step_change' END AS type,
       CASE WHEN s.rn = best.rn + 1 THEN round(best.sse / best.total, 6) END
         AS pvalue
FROM s, best ORDER BY s.k
""",
        "esql_dissect": """
SELECT regexp_extract(props, '^\\{"k": (.*)\\}$', 1) AS k,
       count(*)::BIGINT AS n
FROM events GROUP BY k ORDER BY n DESC, k ASC LIMIT 10
""",
        "esql_lookup": """
SELECT c.c_mktsegment, count(*)::BIGINT AS n,
       sum(round(e.value * 100, 0)) AS cents_sum
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
        "esql_mv_expand": """
SELECT w, count(*)::BIGINT AS n
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w ORDER BY n DESC, w ASC LIMIT 15
""",
        "esql_strings": """
SELECT upper(substring(lang, 1, 1)) || '-' || source AS k,
       count(*)::BIGINT AS n
FROM documents
WHERE text LIKE '%spark%' AND starts_with(source, 'src')
GROUP BY k ORDER BY k
""",
        # _sql endpoint: the oracle is the LITERAL query text the engine
        # translated (count cast for the schema contract)
        "sql_group": """
SELECT lang AS l, count(*)::BIGINT AS n, SUM(n_chars)::BIGINT AS total,
       MIN(n_chars) AS mn, MAX(n_chars) AS mx
FROM documents WHERE n_chars >= 100 AND source LIKE 'src1%'
GROUP BY lang ORDER BY l
""",
        "sql_select": _SQL_SELECT,
        "sql_show_tables": """
SELECT table_name AS name FROM information_schema.tables
WHERE table_schema = 'main' ORDER BY 1
""",
        "sql_describe": """
SELECT column_name AS "column",
       CASE data_type
            WHEN 'BIGINT' THEN 'long'
            WHEN 'INTEGER' THEN 'integer'
            WHEN 'DOUBLE' THEN 'double'
            WHEN 'FLOAT' THEN 'float'
            WHEN 'VARCHAR' THEN 'text'
            WHEN 'BOOLEAN' THEN 'boolean'
            WHEN 'TIMESTAMP' THEN 'datetime'
            ELSE CASE WHEN data_type LIKE '%[]' THEN 'dense_vector'
                      ELSE lower(data_type) END
       END AS type
FROM information_schema.columns WHERE table_name = 'embeddings'
ORDER BY 1
""",

        "sql_having": """
SELECT l_returnflag, count(*)::BIGINT AS n, round(avg(l_quantity), 6) AS a
FROM lineitem GROUP BY 1 HAVING n > 14000 ORDER BY 1
""",
        "sql_distinct": """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2
""",
        "esql_stats_by": """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2
""",
        "esql_categorize": """
SELECT regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS pat,
       count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY 1 LIMIT 100
""",
        "esql_mv_reduce": """
SELECT lang,
       sum(len(list_distinct(string_split(text, ' '))))::BIGINT AS tot,
       max(len(list_distinct(string_split(text, ' '))))::BIGINT AS mx
FROM documents GROUP BY 1 ORDER BY 1
""",
        # MV_SLICE inclusive bounds → DuckDB 1-based inclusive list slice;
        # MV_ZIP(a, a, '-') last = last '-' last; MV_APPEND count = la + lw
        "esql_mv_slice": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
a AS (SELECT doc_id, w, w[1:3] AS a FROM w)
SELECT doc_id, a[1] AS first3, a[len(a)] AS last3,
       a[len(a)] || '-' || a[len(a)] AS zip_last,
       (len(a) + len(w))::BIGINT AS app_n
FROM a ORDER BY doc_id LIMIT 200
""",
        "esql_metadata": """
SELECT 'documents' AS _index, doc_id::VARCHAR AS _id,
       1::BIGINT AS _version, doc_id::BIGINT AS i
FROM documents WHERE doc_id % 37 = 0 ORDER BY i
""",
        # Java ChronoField mirrors: epoch_day/instant_seconds integer math
        "esql_chrono_fields": """
SELECT dayofyear(ts)::BIGINT AS doy,
       (epoch_us(ts) // 86400000000)::BIGINT AS ed,
       ((dayofyear(ts) - 1) // 7 + 1)::BIGINT AS aw,
       count(*)::BIGINT AS n,
       min(epoch_us(ts) // 1000000)::BIGINT AS mn
FROM events GROUP BY 1, 2, 3 ORDER BY doy
""",
        # haversine meters, op order mirrored; WKT round-trip is exact
        # (shortest-repr float rendering), so ST_X/ST_Y == lon/lat
        "esql_spatial": """
WITH pts AS (
  SELECT c_mktsegment,
         ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM customer),
d AS (
  SELECT c_mktsegment, lat, lon,
         round(2.0 * 6371000.0 * asin(sqrt(
           sin(radians(lat) / 2.0) * sin(radians(lat) / 2.0)
           + cos(radians(lat))
             * (sin(radians(lon) / 2.0) * sin(radians(lon) / 2.0))
         )), 6) AS d
  FROM pts)
SELECT c_mktsegment, count(*)::BIGINT AS n, max(d) AS mx,
       min(lon) AS sx, max(lat) AS sy
FROM d GROUP BY 1 ORDER BY 1
""",
        # ::LONG truncates toward zero (trunc, not SQL's round-on-cast)
        "esql_cast_op": """
SELECT user_id::VARCHAR AS s, count(*)::BIGINT AS n,
       sum(trunc(value)::BIGINT)::BIGINT AS t
FROM events GROUP BY s ORDER BY s
""",
        # calendar floor == date_trunc; TO_LONG(ts) == epoch_ms truncation
        "esql_calendar_trunc": """
WITH t AS (SELECT epoch_ms(epoch_ms(ts) * 40) AS t2 FROM events)
SELECT date_trunc('month', t2) AS m, date_trunc('quarter', t2) AS q,
       date_trunc('year', t2) AS y, count(*)::BIGINT AS n
FROM t GROUP BY 1, 2, 3 ORDER BY m
""",
        # *_OVER_TIME over the series group == plain aggregates
        "esql_over_time": """
SELECT user_id::BIGINT AS user_id, round(max(value), 6) AS mx,
       round(sum(round(value * 100, 0)), 6) AS s,
       count(value)::BIGINT AS n
FROM events GROUP BY user_id ORDER BY user_id
""",
        "esql_first_over_time": """
SELECT user_id::BIGINT AS user_id, round(arg_min(value, ts), 6) AS f
FROM events GROUP BY user_id ORDER BY user_id
""",
        "esql_last_over_time": """
SELECT user_id::BIGINT AS user_id, round(arg_max(value, ts), 6) AS l
FROM events GROUP BY user_id ORDER BY user_id
""",
        # analyzed adjacency == whitespace substring on this corpus
        "esql_match_phrase": """
SELECT lang, count(*)::BIGINT AS n FROM documents
WHERE contains(' ' || text || ' ', ' the fast ')
GROUP BY lang ORDER BY lang
""",
        # KQL: term == match membership, quoted == adjacency, wildcard ==
        # per-token regex (qu*ry → ^qu.*ry$)
        "esql_kql": """
SELECT source, count(*)::BIGINT AS n FROM documents
WHERE lang = 'en' AND (contains(' ' || text || ' ', ' the fast ')
   OR len(list_filter(string_split(text, ' '),
           x -> regexp_matches(x, '^qu.*ry$'))) > 0)
GROUP BY source ORDER BY source
""",
        # ROUND_TO: round down to the fixed points, clamped at the lowest
        "esql_term_round_to": """
SELECT CASE WHEN n_chars >= 400 THEN 400.0 WHEN n_chars >= 200 THEN 200.0
            WHEN n_chars >= 100 THEN 100.0 ELSE 0.0 END AS b,
       count(*)::BIGINT AS n
FROM documents WHERE lang = 'en' GROUP BY b ORDER BY b
""",
        # MV_PERCENTILE/MAD == quantile_cont/mad per vec_id group;
        # PSERIES == zipped-unnest Σ x/pow(i,1.5) (both sum in list order)
        "esql_mv_stats": """
WITH f AS (
  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings)
SELECT vec_id,
       round(quantile_cont(x, 0.20), 6) AS p,
       round(mad(x), 6) AS m,
       round(sum(x / pow(i, 1.5)), 6) AS s
FROM f GROUP BY vec_id ORDER BY vec_id LIMIT 300
""",
        # MV_SLICE(w,0,2) inclusive == DuckDB 1-based w[1:3]
        "esql_mv_concat": """
SELECT doc_id,
       array_to_string((string_split(text, ' '))[1:3], '|') AS j
FROM documents ORDER BY doc_id LIMIT 300
""",
        # /16 prefix of 10.(user_id%200).x.9 == '10.<uid%200>.0.0';
        # SCALB(d,3) == d*8 (exact integer-valued floats, order-free sum)
        "esql_ip_prefix": """
SELECT count(*)::BIGINT AS n,
       round(sum((user_id % 10) * 8.0), 6) AS t,
       '10.' || (user_id % 200)::VARCHAR || '.0.0' AS pfx
FROM events GROUP BY pfx ORDER BY pfx
""",
        "esql_date_parse": """
SELECT event_id,
       epoch_ms(strptime(strftime(ts, '%Y-%m-%d %H:%M'),
                         '%Y-%m-%d %H:%M'))::BIGINT AS d_ms
FROM events ORDER BY event_id LIMIT 200
""",
        # CIDR 0.0.0.0/2 membership == first derived octet < 64
        "esql_cidr": """
SELECT (user_id % 256) < 64 AS inblock, event_type, count(*)::BIGINT AS n
FROM events GROUP BY inblock, event_type ORDER BY inblock, event_type
""",
        "esql_count_distinct": """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS u
FROM events GROUP BY event_type ORDER BY event_type
""",
        "esql_median": """
SELECT event_type, round(median(round(value * 100, 0)), 6) AS m
FROM events GROUP BY event_type ORDER BY event_type
""",
        "esql_case": """
SELECT CASE WHEN n_chars > 400 THEN 'big'
            WHEN n_chars > 200 THEN 'mid' ELSE 'small' END AS size,
       count(*)::BIGINT AS n
FROM documents WHERE lang IN ('en', 'fr', 'es')
GROUP BY size ORDER BY size
""",
        "esql_enrich": """
SELECT r.r_name, count(*)::BIGINT AS n,
       sum(round(c.c_acctbal * 100, 0)) AS bal
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name ORDER BY r.r_name
""",
        # ES date_histogram (1-day fixed interval) + stats sub-agg on value
        # transform pivot: entity-centric user aggregates
        "transform_pivot": """
SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value,
       round(round(sum(value), 6) / count(*), 6) AS avg_value,
       (max(epoch_us(ts)) // 1000000)::BIGINT AS last_ts_s
FROM events GROUP BY user_id ORDER BY user_id
""",
        # rollup_search daily-from-hourly == direct daily agg on raw events
        "rollup_search": """
SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s, event_type,
       count(*)::BIGINT AS doc_count,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(sum(value), 6) AS sum_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "date_histogram": """
SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
       count(*)::BIGINT AS doc_count,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(sum(value), 6) AS sum_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events GROUP BY 1 ORDER BY 1
""",
        "sessionize": """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events),
o AS (
  SELECT user_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
),
s AS (
  SELECT user_id, sec,
         sum(new) OVER (PARTITION BY user_id ORDER BY sec
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       min(sec) AS start_s, max(sec) AS end_s
FROM s GROUP BY 1, 2 ORDER BY 1, 2
""",
        "cosine_dups": """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
ORDER BY a, b
""",
        # span_containing: distinct big spans [t1..t2] (ordered, gap<=3)
        # containing a little (t3) occurrence; 1-based SQL positions cancel
        "span_containing": """
WITH nd AS (SELECT count(*) AS c FROM documents),
sq AS (
  SELECT q AS query_id, (23 * q) % c AS sel, q % 5 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
trip AS (
  SELECT s.query_id,
         list_extract(string_split(d.text, ' '), 1 + s.off) AS t1,
         list_extract(string_split(d.text, ' '), 3 + s.off) AS t2,
         list_extract(string_split(d.text, ' '), 2 + s.off) AS t3
  FROM sq s JOIN documents d ON d.doc_id = s.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
big AS (
  SELECT tr.query_id, p1.doc_id, p1.p AS a, p2.p AS b, tr.t3
  FROM trip tr
  JOIN pos p1 ON p1.term = tr.t1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = tr.t2
  WHERE p2.p - p1.p BETWEEN 1 AND 3
)
SELECT b.query_id::BIGINT AS query_id, b.doc_id::BIGINT AS doc_id,
       count(*)::BIGINT AS n
FROM big b
WHERE EXISTS (SELECT 1 FROM pos p3 WHERE p3.doc_id = b.doc_id
              AND p3.term = b.t3 AND p3.p BETWEEN b.a AND b.b)
GROUP BY 1, 2 ORDER BY 1, 2
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # span_within: distinct little positions covered by >=1 big span
        "span_within": """
WITH nd AS (SELECT count(*) AS c FROM documents),
sq AS (
  SELECT q AS query_id, (23 * q) % c AS sel, q % 5 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
trip AS (
  SELECT s.query_id,
         list_extract(string_split(d.text, ' '), 1 + s.off) AS t1,
         list_extract(string_split(d.text, ' '), 3 + s.off) AS t2,
         list_extract(string_split(d.text, ' '), 2 + s.off) AS t3
  FROM sq s JOIN documents d ON d.doc_id = s.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
big AS (
  SELECT tr.query_id, p1.doc_id, p1.p AS a, p2.p AS b, tr.t3
  FROM trip tr
  JOIN pos p1 ON p1.term = tr.t1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = tr.t2
  WHERE p2.p - p1.p BETWEEN 1 AND 3
)
SELECT b.query_id::BIGINT AS query_id, b.doc_id::BIGINT AS doc_id,
       count(DISTINCT p3.p)::BIGINT AS n
FROM big b
JOIN pos p3 ON p3.doc_id = b.doc_id AND p3.term = b.t3
           AND p3.p BETWEEN b.a AND b.b
GROUP BY 1, 2 ORDER BY 1, 2
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # span_or in span_near: (t1 OR t3) within unordered slop-2 of t2
        # span_multi: 3-char-prefix dictionary rewrite as the OR clause
        "span_multi": """
WITH nd AS (SELECT count(*) AS c FROM documents),
sq AS (
  SELECT q AS query_id, (23 * q) % c AS sel, q % 5 AS off
  FROM generate_series(0, 49) t(q) CROSS JOIN nd
),
trip AS (
  SELECT s.query_id,
         left(list_extract(string_split(d.text, ' '), 1 + s.off), 3) AS pre,
         list_extract(string_split(d.text, ' '), 2 + s.off) AS t2
  FROM sq s JOIN documents d ON d.doc_id = s.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
)
SELECT DISTINCT tr.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM trip tr
JOIN pos p1 ON starts_with(p1.term, tr.pre)
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = tr.t2
WHERE abs(p2.p - p1.p) BETWEEN 1 AND 3
ORDER BY query_id, doc_id
""",
        "span_or": """
WITH nd AS (SELECT count(*) AS c FROM documents),
sq AS (
  SELECT q AS query_id, (23 * q) % c AS sel, q % 5 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
trip AS (
  SELECT s.query_id,
         list_extract(string_split(d.text, ' '), 1 + s.off) AS t1a,
         list_extract(string_split(d.text, ' '), 2 + s.off) AS t1b,
         list_extract(string_split(d.text, ' '), 3 + s.off) AS t2
  FROM sq s JOIN documents d ON d.doc_id = s.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
)
SELECT DISTINCT tr.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM trip tr
JOIN pos p1 ON p1.term IN (tr.t1a, tr.t1b)
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = tr.t2
WHERE abs(p2.p - p1.p) BETWEEN 1 AND 3
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # field_masking_span: t1 (text field) within the unordered slop-2
        # window of t2 (masked token-reversed field).  The masked token at
        # position i is reverse(text token i), so the oracle resolves the
        # reversed query term back to the text token at the same position.
        "field_masking_span": """
WITH nd AS (SELECT count(*) AS c FROM documents),
sq AS (
  SELECT q AS query_id, (23 * q) % c AS sel, q % 5 AS off
  FROM generate_series(0, {nq1}) t(q) CROSS JOIN nd
),
trip AS (
  SELECT s.query_id,
         list_extract(string_split(d.text, ' '), 1 + s.off) AS t1,
         list_extract(string_split(d.text, ' '), 3 + s.off) AS t2
  FROM sq s JOIN documents d ON d.doc_id = s.sel
),
pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
)
SELECT DISTINCT tr.query_id::BIGINT AS query_id, p1.doc_id::BIGINT AS doc_id
FROM trip tr
JOIN pos p1 ON p1.term = tr.t1
JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = tr.t2
WHERE abs(p2.p - p1.p) BETWEEN 1 AND 3
ORDER BY query_id, doc_id
""".replace("{nq1}", str(_N_QUERIES - 1)),
        # global agg: per query a filter-ignoring corpus bucket + the AND-hit
        # bucket; zero-hit queries keep an explicit (0, 0) hits row like ES
        "global_hits": _PRELUDE
        + """
, qn AS (SELECT query_id, count(*) AS nt FROM qterm GROUP BY query_id),
hits AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT qt.term) AS m
  FROM qterm qt JOIN tf ON tf.term = qt.term
  GROUP BY qt.query_id, tf.doc_id
),
anded AS (
  SELECT h.query_id, h.doc_id FROM hits h JOIN qn USING (query_id)
  WHERE h.m = qn.nt
),
g AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM dl),
qids AS (SELECT DISTINCT query_id FROM qterm),
h AS (
  SELECT a.query_id, count(*)::BIGINT AS nn, sum(d.dl)::BIGINT AS ss
  FROM anded a JOIN dl d USING (doc_id) GROUP BY a.query_id
)
SELECT q.query_id::BIGINT AS query_id, 'global' AS scope,
       g.n AS doc_count, g.s AS sum_dl
FROM qids q CROSS JOIN g
UNION ALL
SELECT q.query_id::BIGINT, 'hits', coalesce(h.nn, 0), coalesce(h.ss, 0)
FROM qids q LEFT JOIN h USING (query_id)
ORDER BY query_id, scope
""",
        # missing/exists/value_count over runtime NULLIF views; repo is the
        # deterministic derived field org{d%7}/repo{d%20} (FIXTURES.md §B)
        "field_presence": """
SELECT 'lang' AS field,
       (count(*) FILTER (lang <> 'en'))::BIGINT AS exists_count,
       (count(*) FILTER (lang = 'en'))::BIGINT AS missing_count,
       (count(*) FILTER (lang <> 'en'))::BIGINT AS value_count
FROM documents
UNION ALL
SELECT 'repo',
       (count(*) FILTER (r <> 'org0/repo0'))::BIGINT,
       (count(*) FILTER (r = 'org0/repo0'))::BIGINT,
       (count(*) FILTER (r <> 'org0/repo0'))::BIGINT
FROM (SELECT 'org' || (doc_id % 7) || '/repo' || (doc_id % 20) AS r
      FROM documents)
ORDER BY field
""",
        "exists_docs": """
SELECT doc_id FROM documents WHERE lang <> 'en' ORDER BY doc_id
""",
        # scripted_metric: exact integer cent moments -> population variance
        "scripted_metric": """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(cents) AS sc,
         sum(cents * cents) AS sc2
  FROM c GROUP BY event_type
)
SELECT event_type, n,
       round((n * sc2 - sc * sc) / (1.0 * n * n) / 10000, 6) AS var_value
FROM s ORDER BY event_type
""",
        "categorize_text": """
SELECT array_to_string(
         list_slice(
           string_split(regexp_replace(text, '[0-9]+', '#', 'g'), ' '),
           1, 4),
         ' ') AS category,
       count(*)::BIGINT AS doc_count
FROM documents GROUP BY 1 ORDER BY 1
""",
        # _msearch: match + phrase + constant-score filter legs in one call
        "msearch": _PRELUDE
        + """
, nd AS (SELECT count(*) AS c FROM documents),
m_t AS (SELECT term FROM vocab WHERE idx IN (0, 5)),
m_scored AS (
  SELECT tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM m_t JOIN df ON df.term = m_t.term
  JOIN tf ON tf.term = m_t.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
m_ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM m_scored
),
ph AS (
  SELECT list_extract(string_split(d.text, ' '), 1) || ' ' ||
         list_extract(string_split(d.text, ' '), 2) AS phrase
  FROM documents d CROSS JOIN nd WHERE d.doc_id = 17 % nd.c
),
p_term AS (SELECT DISTINCT unnest(string_split(phrase, ' ')) AS term FROM ph),
p_match AS (
  SELECT d.doc_id FROM ph p
  JOIN documents d ON contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
),
p_scored AS (
  SELECT tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM p_term pt JOIN df ON df.term = pt.term
  JOIN tf ON tf.term = pt.term
  JOIN p_match m ON m.doc_id = tf.doc_id
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
p_ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM p_scored
),
f_docs AS (
  SELECT DISTINCT tf.doc_id FROM tf
  JOIN (SELECT term FROM vocab WHERE idx = 7) ft ON ft.term = tf.term
  ORDER BY doc_id LIMIT {k}
)
SELECT 0::BIGINT AS slot, 'match' AS kind, rank::BIGINT AS rank, doc_id, score
FROM m_ranked WHERE rank <= {k}
UNION ALL
SELECT 1::BIGINT, 'phrase', rank::BIGINT, doc_id, score
FROM p_ranked WHERE rank <= {k}
UNION ALL
SELECT 2::BIGINT, 'filter', row_number() OVER (ORDER BY doc_id)::BIGINT,
       doc_id, 1.0
FROM f_docs
ORDER BY slot, rank
""".replace("{k}", str(_TOP_K)),
        "search_template": _PRELUDE
        + """
, st AS (SELECT term FROM vocab WHERE idx IN (2, 9)),
scored AS (
  SELECT tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ), 6)
           AS score
  FROM st JOIN df ON df.term = st.term
  JOIN tf ON tf.term = st.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT rank::BIGINT AS rank, doc_id, score FROM ranked
WHERE rank <= {k} ORDER BY rank
""".replace("{k}", str(_TOP_K)),
        # _validate/query: static analysis only — same tokenize + rules
        "validate_query": """
WITH qs(query) AS (
  VALUES ('alpha beta beta'), (''), ('  '), ('*lead trail'), ('?x y'),
         ('good one two')
),
t AS (
  SELECT query,
         list_filter(string_split(trim(query), ' '), x -> x <> '') AS toks
  FROM qs
)
SELECT query,
  CASE WHEN len(toks) = 0 THEN false
       WHEN len(list_filter(toks,
                x -> starts_with(x, '*') OR starts_with(x, '?'))) > 0 THEN false
       ELSE true END AS valid,
  CASE WHEN len(toks) = 0 THEN 'error:empty'
       WHEN len(list_filter(toks,
                x -> starts_with(x, '*') OR starts_with(x, '?'))) > 0
         THEN 'error:leading_wildcard'
       ELSE 'ok:' || CAST(len(list_distinct(toks)) AS VARCHAR) END AS explanation
FROM t ORDER BY query
""",
    }
    # routed serving is gated against the SAME BM25 oracle (scores and ranks
    # are bit-identical to the batch TAAT path by construction)
    # _analyze through [whitespace, minimal_english stemmer] over the
    # inflected stream — suffix formula and rule table mirrored exactly
    sql["analyze_stem"] = """
WITH toks AS (
  SELECT doc_id,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS pos,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
infl AS (
  SELECT doc_id, pos,
         term || (['', 's', 'es', 'ies'])[1 + ((doc_id + pos) % 4)] AS t
  FROM toks
)
SELECT doc_id, pos,
  CASE
    WHEN t LIKE '%ies' AND t NOT LIKE '%eies' AND t NOT LIKE '%aies'
         AND length(t) > 3 THEN substr(t, 1, length(t) - 3) || 'y'
    WHEN t LIKE '%es' AND t NOT LIKE '%aes' AND t NOT LIKE '%ees'
         AND t NOT LIKE '%oes' AND length(t) > 2 THEN substr(t, 1, length(t) - 1)
    WHEN t LIKE '%s' AND t NOT LIKE '%us' AND t NOT LIKE '%ss'
         AND length(t) > 1 THEN substr(t, 1, length(t) - 1)
    ELSE t
  END AS token
FROM infl
ORDER BY doc_id, pos
"""
    # graph explore: seed derivation, vertex cut and edge weights mirrored
    sql["graph_explore"] = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS idx
  FROM (SELECT DISTINCT term FROM toks)
),
nv AS (SELECT count(*) AS c FROM vocab),
seeds AS (
  SELECT v.term AS seed FROM vocab v, nv WHERE v.idx IN (1 % nv.c, 7 % nv.c)
),
hits AS (
  SELECT DISTINCT t.doc_id, t.term AS seed
  FROM toks t JOIN seeds s ON t.term = s.seed
),
hitdocs AS (SELECT DISTINCT doc_id FROM hits),
fg AS (
  SELECT t.term, count(*)::BIGINT AS fg_df
  FROM toks t JOIN hitdocs USING (doc_id)
  WHERE t.term NOT IN (SELECT seed FROM seeds)
  GROUP BY t.term
),
kept AS (SELECT term FROM fg ORDER BY fg_df DESC, term LIMIT 8),
edges AS (
  SELECT h.seed, t.term, count(DISTINCT t.doc_id)::BIGINT AS co_doc_count
  FROM hits h JOIN toks t ON t.doc_id = h.doc_id
  JOIN kept k ON k.term = t.term
  GROUP BY 1, 2
)
SELECT seed, term, co_doc_count FROM edges ORDER BY seed, term
"""
    # contexts-aware completion: per-(lang, term) distinct-doc popularity
    sql["completion_contexts"] = _PRELUDE + """
, ctx AS (
  SELECT d.lang, t.term, count(DISTINCT t.doc_id)::BIGINT AS cdf
  FROM toks t JOIN documents d USING (doc_id)
  GROUP BY 1, 2
),
sq AS (
  SELECT q AS query_id,
         left(v.term, 3) AS pre,
         (['en','de','fr','es','zh'])[1 + q % 5] AS lng
  FROM generate_series(0, 49) tq(q) CROSS JOIN nv
  JOIN vocab v ON v.idx = (11 * q + 3) % nv.c
),
cand AS (
  SELECT s.query_id, c.term, c.cdf,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY c.cdf DESC, c.term ASC) AS pos
  FROM sq s JOIN ctx c ON c.lang = s.lng AND starts_with(c.term, s.pre)
)
SELECT query_id::BIGINT AS query_id, pos::BIGINT AS pos, term, cdf AS df
FROM cand WHERE pos <= 5 ORDER BY query_id, pos
"""
    # watcher: daily error-count watch history with the trigger flag
    sql["watcher_alerts"] = """
SELECT ((epoch_us(ts) // 1000000) // 86400) * 86400 AS bucket_s,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         AS doc_count,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 10
         AS triggered
FROM events GROUP BY 1 ORDER BY 1
"""
    # latest transform: window argmax by (ts DESC, event_id DESC)
    sql["latest_event"] = """
WITH r AS (
  SELECT user_id,
         (epoch_us(ts) // 1000000)::BIGINT AS ts_s,
         event_type, round(value, 6) AS value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts_s, event_type, value FROM r WHERE rn = 1 ORDER BY user_id
"""
    # terms agg with shard truncation: ES's error-bound mechanism mirrored
    sql["terms_shard_error"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
sdf AS (
  SELECT doc_id % 4 AS shard, term, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT shard, term, df,
         row_number() OVER (PARTITION BY shard ORDER BY df DESC, term ASC) AS r
  FROM sdf
),
kept AS (SELECT shard, term, df FROM ranked WHERE r <= 5),
-- a shard that returned FEWER than shard_size terms was exhausted, not
-- truncated: it provably holds no missing terms, so its bound is 0
last_of AS (
  SELECT shard, CASE WHEN count(*) = 5 THEN min(df) ELSE 0 END AS b
  FROM kept GROUP BY shard
),
summed AS (SELECT term, sum(df)::BIGINT AS doc_count FROM kept GROUP BY term),
err AS (
  SELECT s.term,
         coalesce((SELECT sum(l.b) FROM last_of l
                   WHERE l.shard NOT IN (SELECT k.shard FROM kept k
                                         WHERE k.term = s.term)), 0)::BIGINT
           AS error_bound
  FROM summed s
),
fin AS (
  SELECT s.term, s.doc_count, e.error_bound,
         row_number() OVER (ORDER BY s.doc_count DESC, s.term ASC) AS r
  FROM summed s JOIN err e USING (term)
)
SELECT term, doc_count, error_bound FROM fin WHERE r <= 10 ORDER BY r
"""
    # ColBERT MaxSim: chunk-slice token vectors, cos rounded pre-reduction
    sql["colbert_maxsim"] = """
WITH dim AS (SELECT len(embedding) // 4 AS c FROM embeddings LIMIT 1),
qs AS (
  SELECT vec_id AS qid, embedding FROM embeddings ORDER BY vec_id LIMIT 5
),
qc AS (
  SELECT qid, t, list_slice(embedding, 1 + t * c, (t + 1) * c) AS ch
  FROM qs, dim, range(4) r(t)
),
dc AS (
  SELECT vec_id, t AS s, list_slice(embedding, 1 + t * c, (t + 1) * c) AS ch
  FROM embeddings, dim, range(4) r(t)
),
qu AS (
  SELECT qid, t, generate_subscripts(ch, 1) AS i, unnest(ch)::DOUBLE AS x
  FROM qc
),
du AS (
  SELECT vec_id, s, generate_subscripts(ch, 1) AS i, unnest(ch)::DOUBLE AS x
  FROM dc
),
-- cosine in DOUBLE (list_cosine_similarity accumulates in float32, which
-- diverges from the engine's float64 einsum at the 6-dp boundary)
cos AS (
  SELECT qid, vec_id, t,
         max(round(sim, 6)) AS m
  FROM (
    SELECT qu.qid, qu.t, du.vec_id, du.s,
           sum(qu.x * du.x) / sqrt(sum(qu.x * qu.x) * sum(du.x * du.x)) AS sim
    FROM qu JOIN du ON du.i = qu.i
    GROUP BY 1, 2, 3, 4
  )
  GROUP BY 1, 2, 3
),
sc AS (SELECT qid, vec_id, round(sum(m), 6) AS score FROM cos GROUP BY 1, 2),
ranked AS (
  SELECT qid AS query_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rank,
         vec_id, score
  FROM sc
)
SELECT query_id, rank::BIGINT AS rank, vec_id, score
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""
    # ip_range: multiplicative-hash IP derivation + /2 quarters mirrored
    sql["ip_range"] = """
WITH ip AS (
  SELECT user_id, (user_id * 2654435761) % 4294967296 AS ip FROM events
),
b AS (
  SELECT user_id, least(ip // 1073741824, 3)::BIGINT AS b FROM ip
),
agg AS (
  SELECT b, count(*)::BIGINT AS doc_count,
         count(DISTINCT user_id)::BIGINT AS unique_users
  FROM b GROUP BY b
),
keys AS (
  SELECT unnest([0, 1, 2, 3]) AS b,
         unnest(['*-64.0.0.0', '64.0.0.0-128.0.0.0',
                 '128.0.0.0-192.0.0.0', '192.0.0.0-*']) AS key
)
SELECT k.key, coalesce(a.doc_count, 0) AS doc_count,
       coalesce(a.unique_users, 0) AS unique_users
FROM keys k LEFT JOIN agg a USING (b) ORDER BY k.b
"""
    # ip_prefix: same derived IP, /4 network buckets, empty omitted
    sql["ip_prefix"] = """
WITH ip AS (
  SELECT user_id, (user_id * 2654435761) % 4294967296 AS ip FROM events
),
b AS (
  SELECT user_id, (ip // 268435456) * 268435456 AS net FROM ip
)
SELECT (net // 16777216)::BIGINT || '.' || ((net // 65536) % 256)::BIGINT
         || '.' || ((net // 256) % 256)::BIGINT || '.' || (net % 256)::BIGINT
         AS key,
       4::BIGINT AS prefix_length,
       count(*)::BIGINT AS doc_count,
       count(DISTINCT user_id)::BIGINT AS unique_users
FROM b GROUP BY net ORDER BY net
"""
    # query_string: the four query shapes mirrored — per-CLAUSE-instance
    # BM25 contributions (duplicate terms score twice, like Lucene clauses),
    # candidates per class, range = filter context
    sql["query_string"] = _PRELUDE + """
, qdef AS (
  SELECT q, q % 4 AS cls FROM generate_series(0, 29) t(q)
),
clause AS (
  SELECT qd.q, qd.cls, 'a' AS role, 1.0 AS boost, v.term
  FROM qdef qd CROSS JOIN nv JOIN vocab v ON v.idx = (3*qd.q+1) % nv.c
  UNION ALL
  SELECT qd.q, qd.cls, 'b', CASE WHEN qd.cls = 1 THEN 2.5 ELSE 1.0 END, v.term
  FROM qdef qd CROSS JOIN nv JOIN vocab v ON v.idx = (11*qd.q+5) % nv.c
  WHERE qd.cls IN (0, 1, 2)
  UNION ALL
  SELECT qd.q, qd.cls, 'n', 1.0, v.term
  FROM qdef qd CROSS JOIN nv JOIN vocab v ON v.idx = (17*qd.q+2) % nv.c
  WHERE qd.cls = 2
),
contrib AS (
  SELECT c.q, c.cls, c.role, tf.doc_id,
         c.boost * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS sc
  FROM clause c
  JOIN df ON df.term = c.term
  JOIN tf ON tf.term = c.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE c.role IN ('a', 'b')
),
cand AS (
  SELECT DISTINCT q, doc_id FROM contrib WHERE cls = 0
  UNION ALL
  SELECT DISTINCT q, doc_id FROM contrib WHERE cls = 1 AND role = 'a'
  UNION ALL
  SELECT q, doc_id FROM (
    SELECT DISTINCT co.q, co.doc_id FROM contrib co WHERE co.cls = 2
  ) x ANTI JOIN (
    SELECT cl.q, tf.doc_id FROM clause cl JOIN tf ON tf.term = cl.term
    WHERE cl.role = 'n'
  ) nx USING (q, doc_id)
  UNION ALL
  SELECT DISTINCT co.q, co.doc_id FROM contrib co
  JOIN dl ON dl.doc_id = co.doc_id
  WHERE co.cls = 3 AND co.role = 'a' AND dl.dl BETWEEN 6 AND 48
),
scored AS (
  SELECT ca.q AS query_id, ca.doc_id, round(sum(co.sc), 6) AS score
  FROM cand ca JOIN contrib co ON co.q = ca.q AND co.doc_id = ca.doc_id
  GROUP BY ca.q, ca.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""
    # bulk replay: presence from the previous definitive op (create always
    # leaves the doc present, so no recursion), success flags per op type,
    # final value = last successful set + later successful update increments
    sql["bulk_apply"] = """
WITH ops AS (
  SELECT user_id, value, event_id, (event_id % 4)::BIGINT AS opc,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
d AS (
  SELECT *, CASE WHEN opc <> 2 THEN rn END AS def_rn FROM ops
),
w AS (
  SELECT *, max(def_rn) OVER (
      PARTITION BY user_id ORDER BY rn
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_def_rn
  FROM d
),
s AS (
  SELECT w.*, coalesce(p.opc IN (0, 1), false) AS present_before,
         CASE w.opc WHEN 0 THEN true
                    WHEN 1 THEN NOT coalesce(p.opc IN (0, 1), false)
                    ELSE coalesce(p.opc IN (0, 1), false) END AS ok
  FROM w LEFT JOIN d p ON p.user_id = w.user_id AND p.rn = w.prev_def_rn
),
fin AS (
  SELECT user_id,
         max(CASE WHEN opc <> 2 THEN rn END) AS last_def_rn,
         sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS version,
         sum(CASE WHEN NOT ok THEN 1 ELSE 0 END)::BIGINT AS n_errors,
         max(CASE WHEN opc = 0 OR (opc = 1 AND ok) THEN rn END) AS last_set_rn
  FROM s GROUP BY user_id
)
SELECT f.user_id,
       round(ls.value + coalesce((SELECT sum(u.value) FROM s u
                WHERE u.user_id = f.user_id AND u.opc = 2 AND u.ok
                  AND u.rn > f.last_set_rn), 0), 6) AS value,
       f.version, f.n_errors
FROM fin f
JOIN s ld ON ld.user_id = f.user_id AND ld.rn = f.last_def_rn
JOIN s ls ON ls.user_id = f.user_id AND ls.rn = f.last_set_rn
WHERE ld.opc IN (0, 1)
ORDER BY f.user_id
"""
    # parent_id: 8th-smallest order key's lineitems
    sql["parent_id"] = """
WITH p AS (
  SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 8
)
SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
       l_quantity::DOUBLE AS l_quantity
FROM lineitem WHERE l_orderkey = (SELECT max(o_orderkey) FROM p)
ORDER BY l_linenumber
"""
    # repo packing: derivation + path-ordered string_agg + sha mirrored
    sql["repo_pack"] = """
WITH d AS (
  SELECT 'org' || (doc_id % 7) || '/repo' || (doc_id % 20) AS repo,
         'src/' || source || '/file_' || doc_id || '.py' AS path,
         text, len(string_split(text, ' '))::BIGINT AS dl
  FROM documents
)
SELECT repo, count(*)::BIGINT AS n_files, sum(dl)::BIGINT AS n_tokens,
       sha256(string_agg(text, chr(10) ORDER BY path)) AS sha
FROM d GROUP BY repo ORDER BY repo
"""
    # FIM examples: cut-point formulas and PSM/SPM layouts mirrored
    # batching plans: arrival = doc_id//B, length_grouped = dl-rank//B
    sql["lg_batches"] = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents
),
arr AS (
  SELECT 'arrival' AS strategy, (doc_id // 64)::BIGINT AS batch_id,
         count(*)::BIGINT AS n, max(dl) AS max_dl, sum(dl)::BIGINT AS sum_dl
  FROM d GROUP BY 2
),
lg AS (
  SELECT 'length_grouped' AS strategy, b AS batch_id,
         count(*)::BIGINT AS n, max(dl) AS max_dl, sum(dl)::BIGINT AS sum_dl
  FROM (
    SELECT dl,
           ((row_number() OVER (ORDER BY dl, doc_id) - 1) // 64)::BIGINT AS b
    FROM d
  ) GROUP BY 2
)
SELECT strategy, batch_id, n, max_dl, sum_dl,
       (n * max_dl - sum_dl)::BIGINT AS padding
FROM (SELECT * FROM arr UNION ALL SELECT * FROM lg)
ORDER BY strategy, batch_id
"""
    # t5 span corruption: per-token span arithmetic + ordered filtered
    # string_agg reassembly, final sentinel appended
    sql["t5_spans"] = """
WITH pos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS p,
         len(string_split(text, ' '))::BIGINT AS n
  FROM documents
),
f AS (
  SELECT doc_id, term, p, n, p - (doc_id % 20) AS rel FROM pos
),
g AS (
  SELECT doc_id, term, p, n,
         (rel >= 0 AND rel % 20 < 3) AS in_span,
         (rel >= 0 AND rel % 20 = 0) AS first,
         rel // 20 AS span_id
  FROM f
),
agg AS (
  SELECT doc_id, any_value(n) AS n,
         string_agg(
           CASE WHEN first THEN '<extra_id_' || span_id || '>' ELSE term END,
           ' ' ORDER BY p) FILTER (NOT in_span OR first) AS input,
         string_agg(
           CASE WHEN first THEN '<extra_id_' || span_id || '> ' || term
                ELSE term END,
           ' ' ORDER BY p) FILTER (in_span) AS body
  FROM g GROUP BY doc_id
)
SELECT doc_id, input,
       CASE WHEN body IS NULL
            THEN '<extra_id_' || ns || '>'
            ELSE body || ' <extra_id_' || ns || '>' END AS target,
       ns AS n_spans
FROM (
  SELECT *, CASE WHEN n > doc_id % 20
                 THEN (n - doc_id % 20 + 19) // 20 ELSE 0 END AS ns
  FROM agg
)
ORDER BY doc_id
"""
    sql["fim_examples"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS arr,
         len(string_split(text, ' '))::BIGINT AS n
  FROM documents
),
c AS (
  SELECT doc_id, arr, n,
         (7 * doc_id + 3) % (n + 1) AS a,
         (7 * doc_id + 3) % (n + 1)
           + ((11 * doc_id + 5) % (n - ((7 * doc_id + 3) % (n + 1)) + 1)) AS b
  FROM t
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
       a AS n_prefix, (b - a) AS n_middle, (n - b) AS n_suffix,
       CASE WHEN doc_id % 2 = 0
         THEN '<PRE>' || coalesce(array_to_string(arr[1:a], ' '), '')
              || '<SUF>' || coalesce(array_to_string(arr[b+1:n], ' '), '')
              || '<MID>' || coalesce(array_to_string(arr[a+1:b], ' '), '')
         ELSE '<SUF>' || coalesce(array_to_string(arr[b+1:n], ' '), '')
              || '<PRE>' || coalesce(array_to_string(arr[1:a], ' '), '')
              || '<MID>' || coalesce(array_to_string(arr[a+1:b], ' '), '')
       END AS fim
FROM c ORDER BY doc_id
"""
    # mixture execution: fill-until-budget in (dl DESC, doc ASC) order,
    # budgets = floor(weight * B), weight ∝ tokens^0.5
    sql["mixture_select"] = """
WITH d AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS dl
  FROM documents
),
tot AS (SELECT source, sum(dl)::DOUBLE AS tok FROM d GROUP BY source),
w AS (
  SELECT source, pow(tok, 0.5) / (SELECT sum(pow(tok, 0.5)) FROM tot) AS w
  FROM tot
),
b AS (SELECT source, floor(w * 25000)::BIGINT AS budget FROM w),
r AS (
  SELECT d.*,
         sum(dl) OVER (
           PARTITION BY source ORDER BY dl DESC, doc_id ASC
           ROWS UNBOUNDED PRECEDING) - dl AS cum_before
  FROM d
)
SELECT r.doc_id, r.source, r.dl
FROM r JOIN b USING (source)
WHERE cum_before < budget
ORDER BY doc_id
"""
    # nested inner_hits: per-parent top-3 matching nested objects
    sql["nested_inner_hits"] = """
WITH m AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_quantity DESC, l_linenumber ASC) AS r
  FROM lineitem WHERE l_quantity >= 45.0 AND l_discount <= 0.01
)
SELECT l_orderkey AS o_orderkey, r::BIGINT AS hit_rank,
       l_linenumber::BIGINT AS l_linenumber, l_quantity
FROM m WHERE r <= 3 ORDER BY o_orderkey, hit_rank
"""
    # search_as_you_type: main-field bool_prefix + _2gram shingle subfield
    # (bigram stats from positional adjacency, length stats dl-1/avgdl-1)
    sql["search_as_you_type"] = """
WITH toks AS (
  SELECT doc_id,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS pos,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS c FROM documents),
sel AS (
  SELECT q AS query_id, (13 * q + 7) % c AS doc_id
  FROM generate_series(0, {nq1}) t(q), nd
),
seltok AS (
  SELECT s.query_id, string_split(d.text, ' ') AS arr
  FROM sel s JOIN documents d ON d.doc_id = s.doc_id
),
satq AS (
  SELECT query_id,
         arr[1 + (query_id % (len(arr) - 2))] AS w1,
         arr[2 + (query_id % (len(arr) - 2))] AS w2,
         substr(arr[3 + (query_id % (len(arr) - 2))], 1, 2) AS p
  FROM seltok
),
lead_terms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, w1 AS term FROM satq
    UNION ALL SELECT query_id, w2 FROM satq)
),
lead_sc AS (
  SELECT lt.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS sc
  FROM lead_terms lt JOIN df USING (term) JOIN tf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1, 2
),
pdocs AS (
  SELECT DISTINCT q.query_id, tf.doc_id
  FROM satq q JOIN tf ON starts_with(tf.term, q.p)
),
big AS (
  SELECT a.doc_id, a.term AS t1, b.term AS t2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
btf AS (
  SELECT q.query_id, g.doc_id, count(*)::DOUBLE AS tf
  FROM satq q JOIN big g ON g.t1 = q.w1 AND g.t2 = q.w2
  GROUP BY 1, 2
),
bdf AS (SELECT query_id, count(*)::DOUBLE AS df FROM btf GROUP BY query_id),
big_sc AS (
  SELECT b.query_id, b.doc_id,
         ln(1 + (s.n - bdf.df + 0.5) / (bdf.df + 0.5))
         * b.tf / (b.tf + 1.2 * (1 - 0.75 + 0.75 * (dl.dl - 1) / (s.avgdl - 1))) AS sc
  FROM btf b JOIN bdf USING (query_id)
  JOIN dl ON dl.doc_id = b.doc_id CROSS JOIN stats s
),
bpdocs AS (
  SELECT DISTINCT q.query_id, g.doc_id
  FROM satq q JOIN big g ON g.t1 = q.w2 AND starts_with(g.t2, q.p)
),
all_docs AS (
  SELECT query_id, doc_id FROM lead_sc
  UNION SELECT query_id, doc_id FROM pdocs
  UNION SELECT query_id, doc_id FROM big_sc
  UNION SELECT query_id, doc_id FROM bpdocs
),
unioned AS (
  SELECT a.query_id, a.doc_id,
         round(coalesce(l.sc, 0)
               + CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0 END
               + coalesce(g.sc, 0)
               + CASE WHEN bp.doc_id IS NOT NULL THEN 1.0 ELSE 0 END, 6) AS score
  FROM all_docs a
  LEFT JOIN lead_sc l ON l.query_id = a.query_id AND l.doc_id = a.doc_id
  LEFT JOIN pdocs p ON p.query_id = a.query_id AND p.doc_id = a.doc_id
  LEFT JOIN big_sc g ON g.query_id = a.query_id AND g.doc_id = a.doc_id
  LEFT JOIN bpdocs bp ON bp.query_id = a.query_id AND bp.doc_id = a.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM unioned
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id, score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
""".replace("{nq1}", str(_N_QUERIES - 1)).replace("{k}", str(_TOP_K))
    # histogram field: integer-cent binning mirrored exactly
    sql["histogram_field"] = """
SELECT user_id,
       ((CAST(round(value * 100) AS BIGINT) // 2500) * 2500) / 100.0 AS hbin,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""
    sql["histogram_percentiles"] = """
WITH b AS (
  SELECT (CAST(round(value * 100) AS BIGINT) // 2500) * 2500 AS c FROM events
),
qq AS (
  SELECT unnest([0.25, 0.5, 0.75, 0.95]::DOUBLE[]) AS q,
         unnest(quantile_cont(c, [0.25, 0.5, 0.75, 0.95])) AS v
  FROM b
)
SELECT q, round(v / 100.0, 6) AS value FROM qq ORDER BY q
"""
    # stemmed index over the inflected corpus collapses back to the plain
    # index — rank/score identity means it shares the bm25 oracle
    sql["stemmed_topk"] = sql["bm25_topk"]
    sql["bm25_topk_routed"] = sql["bm25_topk"]
    # federated search is bit-identical to the union index (docBase offsets
    # + dfs-style global stats), so it shares the BM25 oracle too
    sql["bm25_topk_federated"] = sql["bm25_topk"]
    sql["reshard_topk"] = sql["bm25_topk"]
    sql["pit_search"] = sql["bm25_topk"]
    sql["async_search"] = sql["bm25_topk"]
    sql["search_api"] = sql["bm25_topk"]
    sql["percolate_phrase"] = sql["phrase_match"]
    return sql
