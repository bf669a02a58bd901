"""BM25 query pipeline (SURVEY.md §3.2) — batch top-k evaluation.

``SegmentStore`` loads an index directory (term_dict + stats + segment
shards, lazily per shard).  The batch evaluation path distributes a query
*set* with Ray Data: ``queries_ds.map_batches(BM25Scorer, concurrency=N)``
where each actor holds the store (loaded once in ``__init__``, SURVEY.md
§2.3 T4).  Each scorer replica holds all partitions — fine at test scale;
the partition-routed serving path lives in pipelines/serve.py.

Rank-identity rules (BASELINE.json L14):
- per-term contributions are accumulated in **sorted term order** (matches
  the exact oracle bit-for-bit: one contribution per (term, doc), summed
  with np.add.at in concatenation order);
- ties break (score DESC, doc_id ASC);
- when ``round_decimals`` is set, ranking happens on the ROUNDED score so
  the DuckDB SQL oracle (which ranks on its own rounded sum) agrees even
  when the two engines' float sums differ in the last ulp.

A salted head term contributes one posting per doc across its doc-disjoint
salt slices, so scoring needs no slice merge — slices are just extra rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.bm25 import B, K1, idf, sql_round, tf_norm, topk_order
from ..functions.codecs import decode_postings
from ..functions.tokenize import tokenize_query
from ..functions.wand import Cursor, wand_topk
from ..schemas import RESULTS, SEGMENT, SEGMENT_POS, assert_schema


class SegmentStore:
    """In-memory view of a built index; shard files load lazily.

    Term lookups go through ``state.termdict.TermDict``: small vocabularies
    load eagerly into dicts, large ones binary-search the sorted
    ``term_dict.parquet`` with row-group pruning so per-process memory is
    bounded regardless of vocabulary size (``eager_vocab_max`` flips the
    mode; tests assert rank identity across both).
    """

    def __init__(self, index_dir: str, eager_vocab_max: int = 1 << 19):
        self.index_dir = index_dir
        st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
        self.n_docs = int(st["n_docs"][0].as_py())
        self.avgdl = float(st["avgdl"][0].as_py())
        from ..state.termdict import TermDict

        self.td = TermDict(
            os.path.join(index_dir, "term_dict.parquet"), eager_max_rows=eager_vocab_max
        )
        self._df_map: dict[str, int] | None = None
        self._shards: dict[int, pa.Table] = {}
        # soft-deletes (pipelines/lifecycle.py): sorted doc_ids masked at
        # posting decode; stats/df stay stale until compaction (Lucene
        # live-docs semantics)
        from .lifecycle import load_tombstones

        self.tombs: np.ndarray | None = load_tombstones(index_dir)
        # decoded-postings cache: a query STREAM hits the same (head) terms
        # repeatedly; decoded arrays are the expensive part of TAAT.  Capped
        # by term count — at real scale an actor holds one partition and the
        # cap bounds residency.
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._raw: dict[str, list[dict]] = {}
        self._decoded_cap = 1024

    @property
    def df(self) -> dict[str, int]:
        """term → exact df dict (fixture/test convenience — materializes the
        vocabulary; hot paths use ``td.df_of``/``td.rows_of`` instead)."""
        if self._df_map is None:
            self._df_map = self.td.df_map()
        return self._df_map

    def _shard(self, sid: int) -> pa.Table:
        if sid not in self._shards:
            t = pq.read_table(
                os.path.join(self.index_dir, "segments", f"shard-{sid:05d}.parquet")
            )
            assert_schema(
                t,
                SEGMENT_POS if "positions" in t.column_names else SEGMENT,
                where=f"segment shard {sid}",
            )
            self._shards[sid] = t
        return self._shards[sid]

    def postings_positions(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded (doc_ids, tfs, flat_positions) of a positional index's
        term — posting k owns ``flat_positions[sum(tfs[:k]) : sum(tfs[:k+1])]``
        (sorted in-doc positions).  Salt slices concatenate doc-disjointly,
        exactly like ``postings``.  Raises if the index was built without
        ``with_positions``."""
        rows = self.td.rows_of(term)
        if not rows:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e
        from ..functions.codecs import segmented_positions_decode

        docs_l, tfs_l, pos_l = [], [], []
        for part, row in rows:
            shard = self._shard(part)
            if "positions" not in shard.column_names:
                raise ValueError(
                    f"index at {self.index_dir} was built without positions "
                    "(BuildConfig.with_positions) — phrase queries need a "
                    "positional index"
                )
            d, t = decode_postings(
                shard["doc_ids"][row].as_py(), shard["tfs"][row].as_py()
            )
            docs_l.append(d)
            tfs_l.append(t)
            pos_l.append(segmented_positions_decode(shard["positions"][row].as_py(), t))
        d = np.concatenate(docs_l)
        t = np.concatenate(tfs_l)
        p = np.concatenate(pos_l)
        if self.tombs is not None:
            keep = ~np.isin(d, self.tombs)
            p = p[np.repeat(keep, t.astype(np.int64))]
            d, t = d[keep], t[keep]
        return d, t, p

    def raw_rows(self, term: str) -> list[dict]:
        """Compressed segment rows of a term (one per salt slice) — the
        WAND/serving path consumes these without full decode.  Cached per
        store (query streams repeat head terms; Cursor.from_raw further
        caches the columnar block arrays on these dicts)."""
        if self.tombs is not None:
            # block-max metadata pre-dates the deletes — WAND skip bounds
            # would be unsafe-looking and the blocks hold dead docs; the
            # planner routes tombstoned stores to TAAT, compaction restores
            # the fast path (lifecycle.py docstring)
            raise ValueError(
                "raw posting blocks unavailable under live tombstones — "
                "compact the index (lifecycle.compact_index) or use TAAT"
            )
        cached = self._raw.get(term)
        if cached is not None:
            return cached
        rows = self.td.rows_of(term)
        if not rows:
            return []
        out = []
        for part, row in rows:
            shard = self._shard(part)
            out.append(
                {
                    "doc_ids": shard["doc_ids"][row].as_py(),
                    "tfs": shard["tfs"][row].as_py(),
                    "dls": shard["dls"][row].as_py(),
                    "block_meta": shard["block_meta"][row].as_py(),
                }
            )
        if len(self._raw) < self._decoded_cap:
            self._raw[term] = out
        return out

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded (doc_ids, tfs, dls) of a term — all salt slices concatenated.

        Slices are doc-disjoint, so concatenation order cannot change any
        score (exactly one posting per (term, doc)).
        """
        cached = self._decoded.get(term)
        if cached is not None:
            return cached
        rows = self.td.rows_of(term)
        if not rows:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e.astype(np.uint32)
        docs_l, tfs_l, dls_l = [], [], []
        for part, row in rows:
            shard = self._shard(part)
            d, t, l = decode_postings(
                shard["doc_ids"][row].as_py(),
                shard["tfs"][row].as_py(),
                shard["dls"][row].as_py(),
            )
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(l)
        out = (np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l))
        if self.tombs is not None:
            keep = ~np.isin(out[0], self.tombs)
            out = (out[0][keep], out[1][keep], out[2][keep])
        if len(self._decoded) < self._decoded_cap:
            self._decoded[term] = out
        return out

    def set_tombstones(self, doc_ids: np.ndarray | None) -> None:
        """Install an in-memory tombstone set (sorted unique) and drop the
        decoded caches — used by query paths that soft-delete without
        persisting (the persisted path is lifecycle.delete_by_query)."""
        self.tombs = (
            None if doc_ids is None else np.unique(doc_ids.astype(np.uint64))
        )
        self._decoded.clear()
        self._raw.clear()


def taat_topk(
    weighted_lists: list[tuple[float, np.ndarray, np.ndarray, np.ndarray]],
    avgdl: float,
    k: int,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Vectorized term-at-a-time top-k.

    ``weighted_lists`` = [(idf_weight, docs, tfs, dls)] in **sorted term
    order** — contributions are accumulated in that order (np.add.at adds
    sequentially in concat order), which fixes the float sum per doc and
    makes the result bit-identical across every scoring path.
    """
    docs_l, contrib_l = [], []
    for w, d, tf, dl in weighted_lists:
        if len(d) == 0:
            continue
        contrib_l.append(w * tf_norm(tf, dl, avgdl, k1, b))
        docs_l.append(d)
    return merge_contribs(docs_l, contrib_l, k, round_decimals)


def merge_contribs(
    docs_l: list[np.ndarray],
    contrib_l: list[np.ndarray],
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Sum per-posting contributions (same order-sensitive np.add.at as
    taat_topk — callers pass lists in sorted (term, slice) order so every
    scoring path, including routed serving, is bit-identical) → top-k."""
    docs_l = [d for d in docs_l if len(d)]
    contrib_l = [c for c in contrib_l if len(c)]
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    all_contrib = np.concatenate(contrib_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, all_contrib)
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    order = topk_order(scores, uniq, k)
    return [(int(uniq[i]), float(scores[i])) for i in order]


def score_query(
    store: SegmentStore,
    text: str,
    k: int,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Exhaustive top-k for one query — the rank-identity reference path."""
    terms = sorted(set(tokenize_query(text)))
    lists = []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        lists.append((float(idf(store.n_docs, df_t)), d, tf, dl))
    return taat_topk(lists, store.avgdl, k, k1, b, round_decimals)


def score_query_wand(
    store: SegmentStore,
    text: str,
    k: int,
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, float]]:
    """Top-k via block-max WAND over the compressed segments (C5).

    Rank-identical to ``score_query`` by construction (functions/wand.py);
    asserted in tests/test_wand.py.
    """
    terms = sorted(set(tokenize_query(text)))
    cursors = []
    for order, term in enumerate(terms):
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        w = float(idf(store.n_docs, df_t))
        for raw in store.raw_rows(term):
            cursors.append(Cursor.from_raw(order, w, raw, store.avgdl, k1, b))
    return wand_topk(cursors, k)


def function_score_query(
    store: SegmentStore,
    text: str,
    k: int,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
    boost_mode: str = "multiply",
) -> list[tuple[int, float]]:
    """ES ``function_score`` with a ``field_value_factor`` function:
    ``score = BM25 (op) ln(1 + dl)`` (modifier ``ln1p`` on the doc-length
    field), where (op) is ES's ``boost_mode`` — ``multiply`` (the
    default), ``sum``, ``avg``, ``max``, ``min`` or ``replace``.

    The field value needs no extra join: ``dl`` travels with every posting
    (schemas.POSTINGS_RAW), so the factor is read off the decoded lists.
    Ranking happens on the ROUNDED final score (ties doc ASC) so the SQL
    oracle agrees, same rule as ``score_query``.
    """
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l, dls_l = [], [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        w = float(idf(store.n_docs, df_t))
        contrib_l.append(w * tf_norm(tf, dl, store.avgdl, k1, b))
        docs_l.append(d)
        dls_l.append(dl)
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    all_contrib = np.concatenate(contrib_l)
    all_dl = np.concatenate(dls_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, all_contrib)
    dl_of = np.zeros(len(uniq), dtype=np.float64)
    dl_of[inv] = all_dl  # dl is constant per doc — any occurrence works
    factor = np.log1p(dl_of)
    if boost_mode == "multiply":
        final = scores * factor
    elif boost_mode == "sum":
        final = scores + factor
    elif boost_mode == "avg":
        final = (scores + factor) / 2.0
    elif boost_mode == "max":
        final = np.maximum(scores, factor)
    elif boost_mode == "min":
        final = np.minimum(scores, factor)
    elif boost_mode == "replace":
        final = factor
    else:
        raise ValueError(f"function_score: unknown boost_mode {boost_mode!r}")
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def script_score_query(
    store: SegmentStore,
    text: str,
    k: int,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``script_score``: the query score replaced by a script over
    ``_score`` and doc fields — here the saturation-style
    ``_score / (1 + dl / avgdl)`` (shorter docs boosted, the inverse shape
    of function_score's ln1p factor).  Same vectorized accumulation as
    ``function_score_query``; dl rides along with every posting so the
    script needs no extra join.  Ranks on the ROUNDED score (ties doc
    ASC), matching the SQL oracle."""
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l, dls_l = [], [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        w = float(idf(store.n_docs, df_t))
        contrib_l.append(w * tf_norm(tf, dl, store.avgdl, k1, b))
        docs_l.append(d)
        dls_l.append(dl)
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    all_contrib = np.concatenate(contrib_l)
    all_dl = np.concatenate(dls_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, all_contrib)
    dl_of = np.zeros(len(uniq), dtype=np.float64)
    dl_of[inv] = all_dl
    final = scores / (1.0 + dl_of / store.avgdl)
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def decay_score_query(
    store: SegmentStore,
    text: str,
    k: int,
    origin: float,
    scale: float,
    decay: float = 0.5,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``function_score`` with a ``gauss`` decay on doc length:

        score = BM25 × exp( (dl − origin)² · ln(decay) / scale² )

    (ES's gauss with offset 0: σ² = −scale²/(2·ln decay), so the factor is
    ``decay`` exactly at distance ``scale`` from ``origin``.)  Like
    ``function_score_query``, dl rides every posting so no join is needed;
    ranked on the rounded final score, ties doc ASC."""
    if not (0.0 < decay < 1.0) or scale <= 0:
        raise ValueError("need 0 < decay < 1 and scale > 0")
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l, dls_l = [], [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        docs_l.append(d)
        contrib_l.append(float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl, k1, b))
        dls_l.append(dl)
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    dl_of = np.zeros(len(uniq), dtype=np.float64)
    dl_of[inv] = np.concatenate(dls_l)
    dist = dl_of - origin
    final = scores * np.exp(dist * dist * np.log(decay) / (scale * scale))
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def distance_feature_query(
    store: SegmentStore,
    text: str,
    k: int,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``distance_feature`` query (numeric/date flavor) in a bool
    ``should`` clause:

        score = BM25 + boost · pivot / (pivot + |dl − origin|)

    — the documented ES scoring shape: the feature contributes exactly
    ``boost/2`` at distance ``pivot`` and at most ``boost`` at the origin,
    and (unlike ``function_score`` decay) is WAND-friendly because the
    contribution is bounded by ``boost``.  It only boosts docs the query
    already matched, like ES (distance_feature in ``should`` never
    introduces hits).  dl rides every posting, so no join; ranked on the
    rounded final score, ties doc ASC."""
    if pivot <= 0:
        raise ValueError("pivot must be > 0")
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l, dls_l = [], [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        docs_l.append(d)
        contrib_l.append(float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl, k1, b))
        dls_l.append(dl)
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    dl_of = np.zeros(len(uniq), dtype=np.float64)
    dl_of[inv] = np.concatenate(dls_l)
    final = scores + boost * pivot / (pivot + np.abs(dl_of - origin))
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def explain_score(
    store: SegmentStore,
    text: str,
    doc_id: int,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[str, float, int, float]]:
    """ES ``_explain`` analog: the per-term BM25 breakdown of one doc's
    score for one query — [(term, idf, tf, contribution)] in sorted term
    order, omitting terms absent from the doc.  The sum of contributions
    is exactly the doc's ``score_query`` score (same accumulation order).
    """
    out = []
    for term in sorted(set(tokenize_query(text))):
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        # salt slices concatenate doc-DISJOINTLY but not globally sorted —
        # membership needs a scan, fine for a single-doc explain
        hits = np.flatnonzero(d == np.uint64(doc_id))
        if len(hits) == 0:
            continue
        i = int(hits[0])
        w = float(idf(store.n_docs, df_t))
        contrib = w * float(tf_norm(tf[i : i + 1], dl[i : i + 1], store.avgdl, k1, b)[0])
        if round_decimals is not None:
            contrib = float(sql_round(contrib, round_decimals))
        out.append((term, w, int(tf[i]), contrib))
    return out


def rank_eval(
    store: SegmentStore,
    queries: pa.Table,
    k: int = 10,
    round_decimals: int = 6,
) -> pa.Table:
    """ES ``_rank_eval`` API: score the BM25 top-``k`` ranking of each
    query against a relevance set, reporting precision@k, recall@k and
    MRR → (query_id, precision_k, recall_k, mrr).

    The relevance judgments here are DERIVED, not hand-labeled: a doc is
    relevant iff it contains ALL the query's terms (the conjunctive
    AND-match) — a deterministic qrel the SQL oracle reproduces exactly,
    so the metric arithmetic itself is what the gate verifies.  Queries
    with an empty relevant set are skipped (ES omits unjudged requests).
    """
    from ..functions.boolean import intersect_many

    qids, precs, recs, mrrs = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(tokenize_query(text)))
        sets = [np.unique(store.postings(t)[0]) for t in terms if store.td.df_of(t) > 0]
        if len(sets) < len(terms) or not sets:
            continue
        rel = intersect_many(sets)
        if len(rel) == 0:
            continue
        top = score_query(store, text, k, round_decimals=round_decimals)
        hit = np.isin(
            np.array([d for d, _ in top], dtype=np.uint64), rel, assume_unique=True
        )
        first = int(np.argmax(hit)) + 1 if hit.any() else 0
        qids.append(qid)
        precs.append(float(sql_round(hit.sum() / k, round_decimals)))
        recs.append(float(sql_round(hit.sum() / len(rel), round_decimals)))
        mrrs.append(float(sql_round(1.0 / first, round_decimals)) if first else 0.0)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "precision_k": pa.array(precs, type=pa.float64()),
            "recall_k": pa.array(recs, type=pa.float64()),
            "mrr": pa.array(mrrs, type=pa.float64()),
        }
    )


def hard_negatives(
    store: SegmentStore,
    queries: pa.Table,
    k: int = 10,
    round_decimals: int = 6,
) -> pa.Table:
    """Hard-negative mining for retrieval training data: per query, the
    top-``k`` BM25 docs EXCLUDING the relevant set — the standard
    BM25-negatives recipe for training dense retrievers (DPR-style
    in-batch negatives come from exactly this pool).

    Relevance reuses ``rank_eval``'s deterministic qrel (a doc is relevant
    iff it contains ALL query terms), so the SQL oracle can anti-join the
    same set.  Queries with an empty relevant set are skipped (nothing to
    contrast against).  Ranks are over the negatives only."""
    from ..functions.boolean import intersect_many

    qids, ranks, docs, scores = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(tokenize_query(text)))
        sets = [np.unique(store.postings(t)[0]) for t in terms if store.td.df_of(t) > 0]
        if len(sets) < len(terms) or not sets:
            continue
        rel = intersect_many(sets)
        if len(rel) == 0:
            continue
        # k + |rel| candidates always leave >= k negatives after removal
        top = score_query(store, text, k + len(rel), round_decimals=round_decimals)
        r = 0
        rel_set = set(int(d) for d in rel)
        for d, s in top:
            if d in rel_set:
                continue
            r += 1
            if r > k:
                break
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


def dpr_triples(
    store: SegmentStore,
    queries: pa.Table,
    n_pos: int = 2,
    n_neg: int = 3,
    round_decimals: int = 6,
) -> pa.Table:
    """Contrastive training triples for dense-retriever training (DPR):
    per query, the cross product of the ``n_pos`` lowest-id relevant docs
    (the conjunctive AND-match qrels) × the ``n_neg`` hardest BM25
    negatives — the exact (question, positive, hard-negative) triple
    format Karpukhin et al. 2020 train on.

    Both legs are the already-gated kernels (rank_eval's qrels,
    hard_negatives' ranking), so the SQL oracle composes their CTEs.
    Returns (query_id, pos_doc, neg_doc, neg_rank) sorted."""
    from ..functions.boolean import intersect_many

    qids, pos_o, neg_o, nrank_o = [], [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(tokenize_query(text)))
        sets = [np.unique(store.postings(t)[0]) for t in terms if store.td.df_of(t) > 0]
        if len(sets) < len(terms) or not sets:
            continue
        rel = intersect_many(sets)
        if len(rel) == 0:
            continue
        pos = [int(d) for d in rel[:n_pos]]  # lowest doc ids — deterministic
        rel_set = set(int(d) for d in rel)
        top = score_query(store, text, n_neg + len(rel), round_decimals=round_decimals)
        negs = [(r + 1, d) for r, (d, _s) in enumerate(
            [t for t in top if t[0] not in rel_set][:n_neg]
        )]
        for p in pos:
            for nr, nd in negs:
                qids.append(qid)
                pos_o.append(p)
                neg_o.append(nd)
                nrank_o.append(nr)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "pos_doc": pa.array(pos_o, type=pa.int64()),
            "neg_doc": pa.array(neg_o, type=pa.int64()),
            "neg_rank": pa.array(nrank_o, type=pa.int64()),
        }
    )


def score_query_filtered(
    store: SegmentStore,
    text: str,
    k: int,
    allowed: np.ndarray,
    k1: float = K1,
    b: float = B,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """BM25 top-k restricted to an ``allowed`` doc set — ES FILTER-clause
    semantics: the filter gates which docs can be hits but NEVER changes
    scores (df/N/avgdl stay index-wide; Lucene filters are non-scoring).
    ``allowed`` is sorted (``alias_allowed_docs``); the mask is one
    vectorized ``np.isin`` over the candidate set."""
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l = [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        docs_l.append(d)
        contrib_l.append(float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl, k1, b))
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    keep = np.isin(uniq, allowed, assume_unique=False)
    uniq, scores = uniq[keep], scores[keep]
    if len(uniq) == 0:
        return []
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    order = topk_order(scores, uniq, k)
    return [(int(uniq[i]), float(scores[i])) for i in order]


def profile_query(store: SegmentStore, text: str) -> dict:
    """ES ``_profile`` analog, the DETERMINISTIC half: the work a query
    costs, as exact counters rather than wall times (times vary run to
    run; counters are reproducible and gate-able) —

    - n_terms: distinct live query terms,
    - n_lists: posting runs touched (salt slices count separately),
    - n_postings: postings decoded = Σ df (the TAAT decode volume),
    - n_candidates: distinct docs scored (the OR-match set size).

    This is exactly the breakdown a query planner needs (the TAAT/WAND
    planner reads the same df profile)."""
    terms = sorted(set(tokenize_query(text)))
    live = [t for t in terms if store.td.df_of(t) > 0]
    n_lists = sum(len(store.td.rows_of(t)) for t in live)
    n_postings = sum(store.td.df_of(t) for t in live)
    cand: np.ndarray | None = None
    for t in live:
        d = np.unique(store.postings(t)[0])
        cand = d if cand is None else np.union1d(cand, d)
    return {
        "n_terms": len(live),
        "n_lists": int(n_lists),
        "n_postings": int(n_postings),
        "n_candidates": 0 if cand is None else int(len(cand)),
    }


def match_count(store: SegmentStore, text: str) -> int:
    """ES ``_count`` API: the OR-match doc count for a query.

    Single-distinct-term queries answer straight from the dictionary's df
    (no posting decode at all — the fast path Lucene's count API takes);
    multi-term queries union the decoded doc sets."""
    terms = sorted(set(tokenize_query(text)))
    live = [t for t in terms if store.td.df_of(t) > 0]
    if not live:
        return 0
    if len(live) == 1 and store.tombs is None:
        return store.td.df_of(live[0])
    from ..functions.boolean import union_many

    return int(len(union_many([store.postings(t)[0] for t in live])))


def mget(index_dir: str, doc_ids: list[int], columns: list[str] = ("lang", "dl")) -> pa.Table:
    """ES ``_mget``: fetch per-doc metadata for an explicit id list, with
    the id predicate pushed into the forward-map parquet scan (row-group
    pruning + server-side filtering — only requested rows leave storage).
    Returns (doc_id, *columns) sorted by doc_id; missing ids are absent,
    exactly like ES's per-doc found=false."""
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "forward_map"))
    ids = pa.array(sorted({int(d) for d in doc_ids}), type=pa.uint64())
    t = ds.to_table(
        columns=["doc_id", *columns], filter=pads.field("doc_id").isin(ids)
    )
    return t.sort_by("doc_id")


def ids_query(
    index_dir: str, doc_ids: list[int], columns: list[str] = ("lang",)
) -> pa.Table:
    """ES ``ids`` query: a SEARCH (not a GET) whose hit set is an explicit
    id list — every hit carries the ES constant score 1.0; ids absent
    from the index produce no hit.  The id predicate pushes into the
    forward-map parquet scan exactly like ``mget`` (row-group pruning),
    so at scale each partition reads only its own requested rows — the
    full forward map is never materialized."""
    t = mget(index_dir, doc_ids, columns=list(columns))
    score = pa.array(np.ones(t.num_rows), type=pa.float64())
    return t.append_column("score", score)


def collapse_topk(
    store: SegmentStore,
    text: str,
    k: int,
    field_of: dict[int, str],
    round_decimals: int | None = None,
) -> list[tuple[int, str, float]]:
    """ES field ``collapse``: the top-k ranking with at most ONE doc per
    ``field`` value — each group represented by its best (score DESC,
    doc ASC) member, groups ranked by that representative.

    ``field_of`` maps doc_id → collapse-field value (read once from the
    forward map by the caller — at scale this is the owning actor's
    forward-map partition, not a global dict).  Returns
    [(doc_id, field_value, score)].
    """
    full = score_query(store, text, k=store.n_docs, round_decimals=round_decimals)
    seen: set[str] = set()
    out: list[tuple[int, str, float]] = []
    for d, s in full:
        f = field_of[d]
        if f in seen:
            continue
        seen.add(f)
        out.append((d, f, s))
        if len(out) == k:
            break
    return out


def top_hits_agg(
    store: SegmentStore,
    text: str,
    field_of: dict[int, str],
    k_per_bucket: int = 2,
    round_decimals: int | None = None,
) -> list[tuple[str, int, int, float]]:
    """ES ``top_hits`` sub-aggregation: within each bucket (the doc's
    ``field`` value), the top ``k_per_bucket`` hits of the query by
    (score DESC, doc ASC) → [(bucket, hit_rank, doc_id, score)] sorted by
    (bucket, hit_rank).  One pass down the global ranking — each bucket's
    hits surface in global rank order, which IS per-bucket rank order."""
    full = score_query(store, text, k=store.n_docs, round_decimals=round_decimals)
    counts: dict[str, int] = {}
    out: list[tuple[str, int, int, float]] = []
    for d, s in full:
        f = field_of[d]
        c = counts.get(f, 0)
        if c < k_per_bucket:
            out.append((f, c + 1, d, s))
            counts[f] = c + 1
    out.sort(key=lambda r: (r[0], r[1]))
    return out


def search_after(
    store: SegmentStore,
    text: str,
    k: int,
    after: tuple[float, int] | None = None,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Cursor pagination (ES ``search_after``): the next ``k`` results
    STRICTLY after cursor ``(score, doc_id)`` in (score DESC, doc_id ASC)
    order.  Stateless and deterministic — page N+1 needs only page N's last
    row, never a server-side scroll context, so pagination survives router
    restarts and distributes trivially.

    Scoring is the exhaustive TAAT kernel with ``k`` large enough to cover
    the cursor's rank; at cluster scale the cursor score doubles as the
    WAND entry threshold (every doc scoring above it is already paged out).
    """
    terms = sorted(set(tokenize_query(text)))
    lists = []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        lists.append((float(idf(store.n_docs, df_t)), d, tf, dl))
    # rank the full matching set (bounded by docs containing >=1 query term)
    full = taat_topk(lists, store.avgdl, 1 << 62, round_decimals=round_decimals)
    if after is None:
        return full[:k]
    s0, d0 = after
    out = [
        (d, s) for d, s in full if s < s0 or (s == s0 and d > d0)
    ]
    return out[:k]


class BM25Scorer:
    """Actor-pool batch scorer: queries batch in → RESULTS rows out.

    ``scoring="function_score"`` swaps the per-query kernel for the ES
    ``field_value_factor`` variant (BM25 × ln(1+dl)) — same pool shape,
    same RESULTS schema."""

    def __init__(
        self,
        index_dir: str,
        round_decimals: int | None = None,
        scoring: str = "bm25",
    ):
        self.store = SegmentStore(index_dir)
        self.round_decimals = round_decimals
        self._fn = {
            "bm25": score_query,
            "function_score": function_score_query,
            "script_score": script_score_query,
        }[scoring]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [10] * batch.num_rows
        for qid, text, k in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist(), ks):
            top = self._fn(self.store, text, int(k), round_decimals=self.round_decimals)
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


def run_queries(
    index_dir: str,
    queries: pa.Table,
    concurrency: int = 2,
    round_decimals: int | None = None,
    scoring: str = "bm25",
):
    """Distribute a query set over a scorer actor pool → RESULTS Dataset.

    The query table is pre-split into ``concurrency`` blocks so the actor
    pool gets one task per actor — a single ``from_arrow`` block would
    starve all but one actor (functions/blocks.py).
    """
    from ..functions.blocks import from_arrow_blocks

    ds = from_arrow_blocks(queries, concurrency)
    return ds.map_batches(
        BM25Scorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "round_decimals": round_decimals,
            "scoring": scoring,
        },
        batch_size=max(1, -(-queries.num_rows // max(1, concurrency))),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def attach_doc_meta_bulk(results_ds, index_dir: str, num_partitions: int = 16):
    """G5 at scale: hash-partitioned ``Dataset.join`` of a LARGE results
    dataset against the forward map — when the results side is too big to
    broadcast-filter (the small-side path below stays the default)."""
    import ray.data as rd

    fwd = rd.read_parquet(
        os.path.join(index_dir, "forward_map"),
        columns=["doc_id", "repo", "path", "commit"],
    )
    return results_ds.join(
        fwd, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",)
    )


def run_queries_to_parquet(
    index_dir: str,
    queries: pa.Table,
    out_dir: str,
    concurrency: int = 8,
    round_decimals: int | None = None,
    with_meta: bool = True,
    num_partitions: int = 16,
) -> str:
    """Scale results sink (VERDICT r1 §missing-4): score the query set on
    the actor pool, attach doc metadata via the hash-partitioned bulk join,
    and stream the joined RESULTS straight to a partitioned parquet
    directory — the result set NEVER materializes on the driver, so the
    path works for query sets whose results dwarf driver memory.

    Returns ``out_dir`` (one file per output block).  ``mode="overwrite"``
    clears the directory before writing — Ray's default is APPEND, which
    would leave a previous run's files in place and double-count rows on
    re-run (ADVICE r2)."""
    results = run_queries(index_dir, queries, concurrency, round_decimals)
    if with_meta:
        results = attach_doc_meta_bulk(results, index_dir, num_partitions)
    results.write_parquet(out_dir, mode="overwrite")
    return out_dir


BULK_JOIN_THRESHOLD = 200_000  # results rows above which the broadcast
# semi-join stops being "small-side" and the hash-partitioned Dataset.join
# takes over (VERDICT r1 §9)


def attach_doc_meta(
    results: pa.Table, index_dir: str, bulk_threshold: int = BULK_JOIN_THRESHOLD
) -> pa.Table:
    """G5 forward-map join: results → (repo, path, commit).

    Small results (the common top-k case): broadcast-style — the results
    docID set filters the forward map (semi-join pushdown), then an Arrow
    hash join attaches the metadata with no shuffle of the big side.
    Above ``bulk_threshold`` rows the results side is no longer "small" and
    the call routes through the hash-partitioned ``Dataset.join``
    (``attach_doc_meta_bulk``) instead — both paths produce identical rows
    (asserted in tests/test_build_query.py).
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if results.num_rows >= bulk_threshold:
        from ..functions.blocks import from_arrow_blocks

        ds = from_arrow_blocks(results, max(8, results.num_rows // 500_000))
        import ray

        joined = attach_doc_meta_bulk(ds, index_dir)
        out = pa.concat_tables(
            [_t if isinstance(_t := ray.get(r), pa.Table) else pa.Table.from_batches([_t])
             for r in joined.to_arrow_refs()]
        )
        return out.select(results.column_names + ["repo", "path", "commit"]).sort_by(
            [("query_id", "ascending"), ("rank", "ascending")]
        )

    wanted = pc.unique(results["doc_id"])
    fwd = pads.dataset(os.path.join(index_dir, "forward_map")).to_table(
        columns=["doc_id", "repo", "path", "commit"],
        filter=pads.field("doc_id").isin(wanted),
    )
    return results.join(fwd, keys="doc_id", join_type="left outer").sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def scroll_all(
    store: SegmentStore,
    text: str,
    page_size: int,
    round_decimals: int | None = None,
    max_pages: int = 10_000,
) -> list[tuple[int, int, int, float]]:
    """ES ``scroll`` / point-in-time deep pagination: drain the ENTIRE
    match set in ``page_size`` pages → [(page, rank, doc_id, score)].

    Each page is fetched strictly through the previous page's last
    (score, doc_id) cursor — the stateless ``search_after`` loop that
    replaces ES's server-side scroll context.  The segment snapshot the
    store holds IS the point-in-time: a concurrent reindex cannot shift
    pages mid-drain."""
    if page_size < 1:
        raise ValueError("page_size must be >= 1")
    out: list[tuple[int, int, int, float]] = []
    cursor: tuple[float, int] | None = None
    rank = 0
    for page in range(1, max_pages + 1):
        rows = search_after(store, text, page_size, cursor, round_decimals)
        for d, s in rows:
            rank += 1
            out.append((page, rank, d, s))
        if len(rows) < page_size:
            break
        cursor = (rows[-1][1], rows[-1][0])
    else:
        raise RuntimeError("scroll_all: max_pages exhausted")
    return out


def scroll_sliced(
    store: SegmentStore,
    text: str,
    n_slices: int,
    page_size: int,
    round_decimals: int | None = None,
) -> list[tuple[int, int, int, int, float]]:
    """ES *sliced scroll*: ``"slice": {"id": i, "max": m}`` splits one
    scroll into ``m`` independent drains that clients consume in parallel;
    each slice sees a disjoint subset of the hit set and numbers its own
    ranks/pages from 1.  Slice membership here is field-based slicing on
    the doc id — ``doc_id mod m`` (ES's ``floorMod`` on a numeric
    doc-values field; the ``_id``-hash default is the same idea with a
    murmur3 in front).

    One vectorized scoring pass serves every slice (the slices partition
    the SAME point-in-time hit set, so scoring per slice would repeat
    identical work m times); per-slice rank/page numbering is then a
    partitioned renumbering of that ranking — byte-identical to m
    independent cursor drains, which test_es_ops asserts against
    ``scroll_all``.  Returns [(slice_id, page, rank, doc_id, score)],
    slices in id order."""
    if n_slices < 1 or page_size < 1:
        raise ValueError("n_slices and page_size must be >= 1")
    full = score_query(store, text, k=store.n_docs, round_decimals=round_decimals)
    out: list[tuple[int, int, int, int, float]] = []
    ranks = [0] * n_slices
    for d, s in full:
        sl = int(d) % n_slices
        ranks[sl] += 1
        page = (ranks[sl] - 1) // page_size + 1
        out.append((sl, page, ranks[sl], int(d), float(s)))
    out.sort(key=lambda r: (r[0], r[2]))
    return out


class ModelReranker:
    """Actor-pool ML-rerank stage (the LTR / cross-encoder plumbing):
    the "model" loads ONCE per actor in ``__init__`` and scores candidate
    batches in ``__call__`` — exactly where a real ONNX/torch session
    would sit.  The container ships no inference libs, so the model is a
    DETERMINISTIC stand-in (the seeded multiplicative hash of
    (doc, query) scaled to [0,1)) — the Ray-side plumbing (per-actor
    state, batched scoring, schema) is the real, tested part.

    final = base_score + model_score (ES rescore score_mode=total)."""

    MULT = 2654435761
    MOD = 1000

    def __init__(self):
        # stand-in for model deserialization — once per actor
        self._mult = np.int64(self.MULT)
        self._mod = np.int64(self.MOD)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        q = np.asarray(batch["query_id"], dtype=np.int64)
        model = (((d + q) * self._mult) % self._mod) / float(self.MOD)
        out = batch.append_column("model_score", pa.array(model, type=pa.float64()))
        return out


def model_rerank(
    index_dir: str,
    queries: pa.Table,
    k: int = 10,
    window: int = 50,
    concurrency: int = 2,
    round_decimals: int = 6,
) -> pa.Table:
    """ES LTR-style rescore with a model actor pool: BM25 top-``window``
    candidates per query fan into ``map_batches(ModelReranker,
    concurrency=N)`` (stateful actors — the model loads once each), the
    reranked top-``k`` per query comes back as
    (query_id, rank, doc_id, score) with score = base + model.

    The candidate set is queries × window rows — the only data the model
    stage ever sees (never the corpus)."""
    import ray.data as rd

    from ..functions.bm25 import sql_round

    store = SegmentStore(index_dir)
    qids_l, docs_l, base_l = [], [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        top = score_query(store, text, window, round_decimals=round_decimals)
        for d, s in top:
            qids_l.append(qid)
            docs_l.append(d)
            base_l.append(s)
    cand = pa.table(
        {
            "query_id": pa.array(qids_l, type=pa.int64()),
            "doc_id": pa.array(docs_l, type=pa.int64()),
            "base_score": pa.array(base_l, type=pa.float64()),
        }
    )
    if cand.num_rows == 0:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    from ..functions.blocks import from_arrow_blocks

    ds = from_arrow_blocks(cand, concurrency).map_batches(
        ModelReranker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=max(1, -(-cand.num_rows // max(1, concurrency))),
        concurrency=concurrency,
    )
    import ray

    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    t = pa.concat_tables([p for p in parts if p.num_rows])
    q = np.asarray(t["query_id"], dtype=np.int64)
    d = np.asarray(t["doc_id"], dtype=np.int64)
    s = sql_round(
        np.asarray(t["base_score"], dtype=np.float64)
        + np.asarray(t["model_score"], dtype=np.float64),
        round_decimals,
    )
    order = np.lexsort((d, -s, q))
    q, d, s = q[order], d[order], s[order]
    new = np.concatenate(([True], q[1:] != q[:-1]))
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(q)), 0))
    rank = np.arange(len(q)) - run_start + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(q[keep], type=pa.int64()),
            "rank": pa.array(rank[keep], type=pa.int64()),
            "doc_id": pa.array(d[keep], type=pa.int64()),
            "score": pa.array(s[keep], type=pa.float64()),
        }
    )


def ltr_features(
    store: SegmentStore,
    queries_tbl: "pa.Table",
    k: int = 10,
    round_decimals: int = 6,
) -> "pa.Table":
    """ES learning-to-rank feature logging (the LTR plugin's ``_ltr``
    feature-set extraction): for each query's BM25 top-``k`` docs, the
    per-(query, doc) feature vector a ranking model trains on —
    (bm25, dl, qlen, n_matched, sum_tf, max_idf).

    One postings decode per query term; every feature accumulates on the
    k-sized candidate array (bounded by k × query terms, never corpus
    size).  Deterministic and SQL-mirrored, so logged features are
    byte-reproducible across runs — the property feature stores exist
    for."""
    import pyarrow as pa

    qids_o, ranks_o, docs_o = [], [], []
    bm25_o, dl_o, qlen_o, nm_o, stf_o, mi_o = [], [], [], [], [], []
    for qid, text in zip(
        queries_tbl["query_id"].to_pylist(), queries_tbl["text"].to_pylist()
    ):
        top = score_query(store, text, k, round_decimals=round_decimals)
        if not top:
            continue
        docs = np.array([d for d, _ in top], dtype=np.uint64)
        pos = {int(x): i for i, x in enumerate(docs.tolist())}
        terms = sorted(set(tokenize_query(text)))
        n_matched = np.zeros(len(docs), np.int64)
        sum_tf = np.zeros(len(docs), np.int64)
        max_idf = np.zeros(len(docs), np.float64)
        dl_arr = np.zeros(len(docs), np.int64)
        for t in terms:
            df_t = store.td.df_of(t)
            if df_t == 0:
                continue
            d, tf, dl = store.postings(t)
            m = np.isin(d, docs)
            if not m.any():
                continue
            idxs = np.array(
                [pos[int(x)] for x in d[m].tolist()], dtype=np.int64
            )
            n_matched[idxs] += 1
            sum_tf[idxs] += tf[m].astype(np.int64)
            np.maximum.at(
                max_idf, idxs, float(idf(store.n_docs, df_t))
            )
            dl_arr[idxs] = dl[m].astype(np.int64)
        for r, (d_, s_) in enumerate(top, start=1):
            i = pos[d_]
            qids_o.append(int(qid))
            ranks_o.append(r)
            docs_o.append(int(d_))
            bm25_o.append(float(s_))
            dl_o.append(int(dl_arr[i]))
            qlen_o.append(len(terms))
            nm_o.append(int(n_matched[i]))
            stf_o.append(int(sum_tf[i]))
            mi_o.append(float(sql_round(max_idf[i], round_decimals)))
    return pa.table(
        {
            "query_id": pa.array(qids_o, type=pa.int64()),
            "rank": pa.array(ranks_o, type=pa.int64()),
            "doc_id": pa.array(docs_o, type=pa.int64()),
            "bm25": pa.array(bm25_o, type=pa.float64()),
            "dl": pa.array(dl_o, type=pa.int64()),
            "qlen": pa.array(qlen_o, type=pa.int64()),
            "n_matched": pa.array(nm_o, type=pa.int64()),
            "sum_tf": pa.array(stf_o, type=pa.int64()),
            "max_idf": pa.array(mi_o, type=pa.float64()),
        }
    )


def rank_eval_graded(
    store: SegmentStore,
    queries: "pa.Table",
    k: int = 10,
    max_relevance: int = 3,
    round_decimals: int = 6,
) -> "pa.Table":
    """ES ``_rank_eval``'s graded metrics — ``dcg`` (+ normalized form)
    and ``expected_reciprocal_rank`` → (query_id, dcg_k, ndcg_k, err_k).

    Graded relevance is DERIVED (like ``rank_eval``'s binary qrels): a
    doc's grade = how many of the query's distinct terms it contains, so
    the SQL oracle reproduces the judgments and the gate verifies the
    metric arithmetic itself:

        DCG@k  = Σ_r (2^g − 1) / log2(r + 1)          (ES's default gain)
        IDCG@k = DCG of the ideal ordering (grade DESC, doc ASC)
        ERR@k  = Σ_r (R_r / r) · Π_{i<r} (1 − R_i),  R = (2^g − 1)/2^max

    Queries whose every grade is 0 are skipped (unjudged, ES-style)."""
    import pyarrow as pa

    qids, dcgs, ndcgs, errs = [], [], [], []
    denom = float(1 << max_relevance)
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        terms = sorted(set(tokenize_query(text)))
        sets = [
            np.unique(store.postings(t)[0])
            for t in terms
            if store.td.df_of(t) > 0
        ]
        sets = [s for s in sets if len(s)]
        if not sets:
            continue
        all_docs, counts = np.unique(np.concatenate(sets), return_counts=True)
        grade_of = dict(zip(all_docs.tolist(), counts.tolist()))
        top = score_query(store, text, k, round_decimals=round_decimals)
        g = np.array([grade_of.get(d, 0) for d, _ in top], dtype=np.float64)
        ranks = np.arange(1, len(g) + 1, dtype=np.float64)
        gains = (np.power(2.0, g) - 1.0) / np.log2(ranks + 1.0)
        dcg = float(gains.sum())
        ideal = np.sort(counts)[::-1][:k].astype(np.float64)
        iranks = np.arange(1, len(ideal) + 1, dtype=np.float64)
        idcg = float(((np.power(2.0, ideal) - 1.0) / np.log2(iranks + 1.0)).sum())
        r_prob = (np.power(2.0, g) - 1.0) / denom
        stop = np.concatenate(([1.0], np.cumprod(1.0 - r_prob)[:-1]))
        err = float((r_prob / ranks * stop).sum())
        qids.append(int(qid))
        dcgs.append(float(sql_round(dcg, round_decimals)))
        ndcgs.append(float(sql_round(dcg / idcg, round_decimals)) if idcg else 0.0)
        errs.append(float(sql_round(err, round_decimals)))
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "dcg_k": pa.array(dcgs, type=pa.float64()),
            "ndcg_k": pa.array(ndcgs, type=pa.float64()),
            "err_k": pa.array(errs, type=pa.float64()),
        }
    )


def collapse_inner_hits(
    store: SegmentStore,
    text: str,
    k: int,
    inner_size: int,
    field_of: dict[int, str],
    round_decimals: int | None = None,
) -> list[tuple[int, str, int, int, float]]:
    """ES ``collapse`` + ``inner_hits``: the top-``k`` collapse groups
    (ranked by their best member, like ``collapse_topk``), each expanded
    to its top-``inner_size`` members →
    [(group_rank, field_value, hit_rank, doc_id, score)].

    One pass down the global ranking fills both levels: the first
    ``k`` distinct field values fix the group order, later members of
    those groups surface already in per-group rank order."""
    full = score_query(store, text, k=store.n_docs, round_decimals=round_decimals)
    reps: list[str] = []
    members: dict[str, list[tuple[int, float]]] = {}
    for d, s in full:
        f = field_of[d]
        if f not in members:
            if len(members) >= k:
                continue
            members[f] = []
            reps.append(f)
        if len(members[f]) < inner_size:
            members[f].append((d, s))
    out: list[tuple[int, str, int, int, float]] = []
    for gi, f in enumerate(reps, start=1):
        for hi, (d, s) in enumerate(members[f], start=1):
            out.append((gi, f, hi, d, s))
    return out


def match_count_terminated(
    store: SegmentStore, text: str, terminate_after: int
) -> tuple[int, bool]:
    """ES ``terminate_after``: stop counting once ``terminate_after``
    matching docs have been seen → (count, terminated_early).  The scan
    order is doc_id ASC (deterministic — ES's per-shard order is segment
    order, which is exactly what the footer-offset docIDs encode), so
    count = min(true_count, terminate_after) and the flag reports whether
    the cap fired — the semantics a caller pays for when an exact count
    is not worth a full posting scan."""
    if terminate_after < 1:
        raise ValueError("terminate_after must be >= 1")
    total = match_count(store, text)
    if total > terminate_after:
        return terminate_after, True
    return total, False
