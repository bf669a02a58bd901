"""Positional + dictionary-range queries (round 3): phrase, prefix, wildcard.

The reference delegates these to Lucene (`match_phrase`, `prefix`,
`wildcard` in Elasticsearch's query DSL); the graft's analogs:

- **phrase**: the positional index (``BuildConfig.with_positions``;
  schemas.SEGMENT_POS) stores each posting's sorted in-doc token positions
  as a delta-varbyte stream.  A phrase query decomposes into requirements
  ``(term, offset)`` — doc D matches iff some start s has every term at
  position s + offset.  Evaluation is fully vectorized: each requirement
  expands to a sorted set of ``(doc << POS_BITS) | candidate_start`` keys
  and the requirement sets intersect pairwise smallest-first (the same
  sorted-set kernel as boolean AND).  Split *parts* share their source
  identifier's position (Lucene synonym style), so ``getBlockHash`` as a
  one-identifier query matches exactly the docs containing that identifier.
- **prefix / wildcard**: the globally sorted term dictionary is range-scanned
  (``TermDict.terms_with_prefix`` — footer-stat-pruned row groups, cost
  proportional to the match count), wildcard patterns filter the prefix
  range by compiled regex, and the matched terms' posting doc-sets union.

Batch evaluation distributes a query *set* over a ``MatchScorer`` actor
pool exactly like BM25's ``run_queries`` — the store loads once per actor.
Ray is never initialised here (driver contract).
"""

from __future__ import annotations

import fnmatch
import re

import numpy as np
import pyarrow as pa

from ..functions.bm25 import idf
from ..functions.boolean import union_many
from ..functions.tokenize import tokenize_query_positions
from ..pipelines.query import SegmentStore, taat_topk
from ..schemas import RESULTS

POS_BITS = 25  # low bits of a requirement key hold the candidate start
MAX_POS = (1 << POS_BITS) - 1  # ≥ 32M-token docs would need a wider key
MAX_DOC = (1 << (64 - POS_BITS)) - 1

MATCHES = pa.schema([("query_id", pa.uint64()), ("doc_id", pa.uint64())])


def phrase_match(store: SegmentStore, text: str, tokenizer: str = "code") -> np.ndarray:
    """Sorted unique doc_ids containing the phrase (consecutive positions).

    Requires a positional index for multi-position phrases; a single-token
    phrase degrades to a plain term match (works on any index).
    """
    pairs = tokenize_query_positions(text, tokenizer)
    if not pairs:
        return np.empty(0, dtype=np.uint64)
    if len(pairs) == 1:
        return np.unique(store.postings(pairs[0][0])[0])
    qmax = max(p for _, p in pairs)
    key_sets: list[np.ndarray] = []
    for term, qpos in pairs:
        docs, tfs, pos = store.postings_positions(term)
        if len(docs) == 0:
            return np.empty(0, dtype=np.uint64)
        if int(docs.max()) > MAX_DOC:
            raise ValueError(f"doc_id exceeds {64 - POS_BITS}-bit phrase-key budget")
        if int(pos.max()) + qmax > MAX_POS:
            raise ValueError("token position exceeds the 25-bit phrase-key budget")
        docs_per_pos = np.repeat(docs, tfs.astype(np.int64))
        # candidate phrase-start = pos - qpos, shifted by qmax so a token
        # earlier than its offset (start < 0) encodes below every legal
        # start instead of wrapping
        adj = pos + np.uint64(qmax - qpos)
        keys = (docs_per_pos << np.uint64(POS_BITS)) | adj
        key_sets.append(np.unique(keys))
    key_sets.sort(key=len)
    acc = key_sets[0]
    for s in key_sets[1:]:
        if len(acc) == 0:
            break
        acc = acc[np.isin(acc, s, assume_unique=True)]
    # drop starts < 0 (encoded below qmax) and project to docs
    acc = acc[(acc & np.uint64(MAX_POS)) >= np.uint64(qmax)]
    return np.unique(acc >> np.uint64(POS_BITS))


def phrase_match_slop(
    store: SegmentStore, text: str, slop: int = 0, tokenizer: str = "code"
) -> np.ndarray:
    """Ordered proximity phrase (ES ``match_phrase`` + ``slop``, chained-gap
    semantics): doc D matches iff positions p₁ < p₂ < … < pₘ exist for the
    phrase slots in order with every adjacent distance in
    ``[Δ, Δ + slop]`` (Δ = the slots' exact offset difference), so
    ``slop=0`` reduces EXACTLY to ``phrase_match`` (asserted in tests).

    Vectorized chaining, no per-doc loop: slot j's occurrences are sorted
    ``(doc << POS_BITS) | pos`` keys (terms sharing a slot intersect,
    synonym-style); step j keeps occurrences whose best predecessor — the
    largest viable key ≤ (doc, p - Δ), found with one ``searchsorted`` —
    lands in the window and in the same doc.  Each step is O(n log n) in
    the slot's occurrence count, exactly like the exact kernel.
    """
    pairs = tokenize_query_positions(text, tokenizer)
    if not pairs:
        return np.empty(0, dtype=np.uint64)
    slots: dict[int, list[str]] = {}
    for term, qpos in pairs:
        slots.setdefault(qpos, []).append(term)
    order = sorted(slots)

    def slot_keys(terms: list[str]) -> np.ndarray:
        sets = []
        for term in terms:
            docs, tfs, pos = store.postings_positions(term)
            if len(docs) == 0:
                return np.empty(0, dtype=np.uint64)
            if int(docs.max()) > MAX_DOC or int(pos.max()) > MAX_POS:
                raise ValueError("doc_id/position exceeds the phrase-key budget")
            d = np.repeat(docs, tfs.astype(np.int64))
            sets.append(np.unique((d << np.uint64(POS_BITS)) | pos))
        sets.sort(key=len)
        acc = sets[0]
        for s in sets[1:]:
            acc = acc[np.isin(acc, s, assume_unique=True)]
        return acc

    viable = slot_keys(slots[order[0]])
    for j in range(1, len(order)):
        if len(viable) == 0:
            break
        delta = order[j] - order[j - 1]
        cur = slot_keys(slots[order[j]])
        if len(cur) == 0:
            viable = cur
            break
        pos_c = cur & np.uint64(MAX_POS)
        doc_c = cur >> np.uint64(POS_BITS)
        # target upper bound for the predecessor: (doc, p - delta); keys
        # with p < delta can never chain
        ok_range = pos_c >= np.uint64(delta)
        target = (doc_c << np.uint64(POS_BITS)) | np.where(
            ok_range, pos_c - np.uint64(delta), np.uint64(0)
        )
        idx = np.searchsorted(viable, target, side="right") - 1
        has = idx >= 0
        pred = viable[np.clip(idx, 0, None)]
        pred_doc = pred >> np.uint64(POS_BITS)
        pred_pos = pred & np.uint64(MAX_POS)
        good = (
            ok_range
            & has
            & (pred_doc == doc_c)
            & (pred_pos + np.uint64(delta + slop) >= pos_c)
            & (pred_pos < pos_c)
        )
        viable = cur[good]
    return np.unique(viable >> np.uint64(POS_BITS))


def span_first_match(store: SegmentStore, term: str, end: int) -> np.ndarray:
    """ES ``span_first``: sorted unique doc_ids where ``term`` occurs within
    the first ``end`` positions (a single-term span matches iff some
    occurrence has position < end; occurrences are sorted per posting, so
    the FIRST position — ``flat[cum_tf[k]]`` — decides).  Requires a
    positional index."""
    if end <= 0:
        raise ValueError("end must be >= 1")
    docs, tfs, flat = store.postings_positions(term)
    if len(docs) == 0:
        return np.empty(0, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))[:-1]))
    first = flat[starts]
    return np.unique(docs[first < np.uint64(end)])


def _term_keys(store: SegmentStore, term: str) -> np.ndarray:
    """Sorted unique ``(doc << POS_BITS) | pos`` occurrence keys of a term."""
    docs, tfs, pos = store.postings_positions(term)
    if len(docs) == 0:
        return np.empty(0, dtype=np.uint64)
    if int(docs.max()) > MAX_DOC or int(pos.max()) > MAX_POS:
        raise ValueError("doc_id/position exceeds the phrase-key budget")
    d = np.repeat(docs, tfs.astype(np.int64))
    return np.unique((d << np.uint64(POS_BITS)) | pos)


def span_near_match(
    store: SegmentStore, t1: str, t2: str, slop: int = 0, in_order: bool = False
) -> np.ndarray:
    """ES ``span_near`` with two single-term clauses: sorted unique doc_ids
    where occurrences p₁ (of ``t1``) and p₂ (of ``t2``) exist with
    ``1 <= p2 - p1 <= slop + 1`` (``in_order=True``) or
    ``1 <= |p2 - p1| <= slop + 1`` (unordered) — Lucene's slop counts the
    positions *between* the spans, so adjacency is slop 0.

    Vectorized: both occurrence sets become sorted (doc, pos) keys; for
    every ``t2`` occurrence one ``searchsorted`` window over the ``t1``
    keys decides whether a partner exists (no per-doc loop).  The same-doc
    constraint is free — the doc id lives in the key's high bits, so the
    window bounds carry it.
    """
    if slop < 0:
        raise ValueError("slop must be >= 0")
    k1 = _term_keys(store, t1)
    k2 = _term_keys(store, t2)
    if len(k1) == 0 or len(k2) == 0:
        return np.empty(0, dtype=np.uint64)
    win = np.uint64(slop + 1)
    doc2 = k2 >> np.uint64(POS_BITS)
    p2 = k2 & np.uint64(MAX_POS)
    lo_pos = np.where(p2 > win, p2 - win, np.uint64(0))
    lo = (doc2 << np.uint64(POS_BITS)) | lo_pos
    if in_order:
        # partner strictly before: p1 in [p2 - win, p2 - 1]
        hi = k2  # exclusive upper bound at (doc, p2)
        cnt = np.searchsorted(k1, hi, side="left") - np.searchsorted(k1, lo, side="left")
    else:
        hi_pos = np.minimum(p2 + win, np.uint64(MAX_POS))
        hi = (doc2 << np.uint64(POS_BITS)) | hi_pos
        cnt = np.searchsorted(k1, hi, side="right") - np.searchsorted(
            k1, lo, side="left"
        )
        # a t1 occurrence AT p2 (possible only when t1 == t2) is not a span
        # partner — drop it from the window count
        self_hit = k1[
            np.clip(np.searchsorted(k1, k2, side="left"), 0, len(k1) - 1)
        ] == k2
        cnt = cnt - self_hit.astype(cnt.dtype)
    return np.unique(doc2[cnt > 0])


def span_not_match(
    store: SegmentStore, include: str, exclude: str, pre: int = 0, post: int = 0
) -> np.ndarray:
    """ES ``span_not`` (single-term spans): sorted unique doc_ids with an
    ``include`` occurrence at p such that NO ``exclude`` occurrence lies in
    ``[p - pre, p + post]`` — ``pre``/``post`` widen the forbidden window
    exactly like Lucene's ``span_not.pre/post``.

    Same searchsorted-window kernel as ``span_near_match``, inverted: an
    include occurrence survives iff its window over the exclude keys is
    empty, and a doc matches iff any occurrence survives."""
    if pre < 0 or post < 0:
        raise ValueError("pre/post must be >= 0")
    ki = _term_keys(store, include)
    if len(ki) == 0:
        return np.empty(0, dtype=np.uint64)
    ke = _term_keys(store, exclude)
    doci = ki >> np.uint64(POS_BITS)
    if len(ke) == 0:
        return np.unique(doci)
    pi = ki & np.uint64(MAX_POS)
    upre, upost = np.uint64(pre), np.uint64(post)
    lo_pos = np.where(pi > upre, pi - upre, np.uint64(0))
    hi_pos = np.minimum(pi + upost, np.uint64(MAX_POS))
    lo = (doci << np.uint64(POS_BITS)) | lo_pos
    hi = (doci << np.uint64(POS_BITS)) | hi_pos
    cnt = np.searchsorted(ke, hi, side="right") - np.searchsorted(ke, lo, side="left")
    return np.unique(doci[cnt == 0])


def phrase_prefix_match(
    store: SegmentStore,
    text: str,
    prefix: str,
    max_expansions: int = 50,
    tokenizer: str = "code",
) -> np.ndarray:
    """ES ``match_phrase_prefix``: the phrase ``text`` immediately followed
    by ANY term starting with ``prefix`` — Lucene expands the prefix
    against the term dictionary (first ``max_expansions`` in dictionary
    order, ES-exactly) and the last phrase slot becomes the UNION of the
    expansions' occurrence key sets; everything else is the exact phrase
    kernel."""
    pairs = tokenize_query_positions(text, tokenizer)
    exp = store.td.terms_with_prefix(prefix)[:max_expansions]
    if not exp:
        return np.empty(0, dtype=np.uint64)
    qmax = (max(p for _, p in pairs) + 1) if pairs else 0
    key_sets: list[np.ndarray] = []
    for term, qpos in pairs:
        docs, tfs, pos = store.postings_positions(term)
        if len(docs) == 0:
            return np.empty(0, dtype=np.uint64)
        if int(docs.max()) > MAX_DOC or int(pos.max()) + qmax > MAX_POS:
            raise ValueError("doc_id/position exceeds the phrase-key budget")
        docs_per_pos = np.repeat(docs, tfs.astype(np.int64))
        adj = pos + np.uint64(qmax - qpos)
        key_sets.append(np.unique((docs_per_pos << np.uint64(POS_BITS)) | adj))
    union_sets: list[np.ndarray] = []
    for t in exp:  # the prefix slot sits at offset qmax → shift 0
        docs, tfs, pos = store.postings_positions(t)
        if len(docs) == 0:
            continue
        if int(docs.max()) > MAX_DOC or int(pos.max()) > MAX_POS:
            raise ValueError("doc_id/position exceeds the phrase-key budget")
        d = np.repeat(docs, tfs.astype(np.int64))
        union_sets.append((d << np.uint64(POS_BITS)) | pos)
    if not union_sets:
        return np.empty(0, dtype=np.uint64)
    key_sets.append(np.unique(np.concatenate(union_sets)))
    key_sets.sort(key=len)
    acc = key_sets[0]
    for s in key_sets[1:]:
        if len(acc) == 0:
            break
        acc = acc[np.isin(acc, s, assume_unique=True)]
    acc = acc[(acc & np.uint64(MAX_POS)) >= np.uint64(qmax)]
    return np.unique(acc >> np.uint64(POS_BITS))


def phrase_topk(
    store: SegmentStore,
    text: str,
    k: int,
    round_decimals: int | None = None,
    tokenizer: str = "code",
) -> list[tuple[int, float]]:
    """BM25 top-k restricted to phrase-matching docs (ES ``match_phrase``
    semantics: positions filter, full-corpus idf scores the phrase's terms
    on the surviving docs).  Rank/tie rules identical to ``score_query``."""
    match = phrase_match(store, text, tokenizer)
    if len(match) == 0:
        return []
    terms = sorted({t for t, _ in tokenize_query_positions(text, tokenizer)})
    lists = []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        m = np.isin(d, match, assume_unique=True)
        lists.append((float(idf(store.n_docs, df_t)), d[m], tf[m], dl[m]))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)


def prefix_match(store: SegmentStore, prefix: str) -> np.ndarray:
    """Sorted unique doc_ids containing any term starting with ``prefix``."""
    terms = store.td.terms_with_prefix(prefix)
    return union_many([store.postings(t)[0] for t in terms])


def wildcard_match(store: SegmentStore, pattern: str) -> np.ndarray:
    """Sorted unique doc_ids containing any term matching the glob pattern
    (``*`` = any run, ``?`` = one char).  The literal prefix before the
    first wildcard prunes the dictionary scan; a leading wildcard is
    rejected (it would force a full-vocabulary scan — same stance Lucene
    takes by default with ``allow_leading_wildcard: false``)."""
    wc = min(
        [i for i, ch in enumerate(pattern) if ch in "*?"] or [len(pattern)]
    )
    prefix = pattern[:wc]
    if wc == len(pattern):  # no wildcard at all — exact term
        return np.unique(store.postings(pattern)[0])
    if not prefix:
        raise ValueError("leading-wildcard patterns are not allowed (full-vocab scan)")
    rx = re.compile(fnmatch.translate(pattern))
    terms = [t for t in store.td.terms_with_prefix(prefix) if rx.match(t)]
    return union_many([store.postings(t)[0] for t in terms])


def regexp_match(store: SegmentStore, pattern: str) -> np.ndarray:
    """Sorted unique doc_ids containing any term that FULLY matches the
    regex (ES ``regexp`` query semantics: the pattern is anchored to the
    whole term, not a substring search).

    The literal prefix before the first regex metacharacter prunes the
    dictionary range scan exactly like ``wildcard_match``; a pattern with
    no literal prefix falls back to streaming the full dictionary through
    ``TermDict.vocab()`` — O(vocabulary) compute but O(row group) memory,
    the same stance Lucene takes when the regexp automaton has no common
    prefix.  Patterns stay in the RE2-compatible subset (no backrefs) so
    the DuckDB oracle (``regexp_full_match``) agrees.
    """
    meta = set(".?*+()[]{}|\\^$")
    wc = min([i for i, ch in enumerate(pattern) if ch in meta] or [len(pattern)])
    if wc == len(pattern):  # no metacharacter — exact term
        return np.unique(store.postings(pattern)[0])
    prefix = pattern[:wc]
    # a quantifier modifies the PRECEDING atom, so that char is optional /
    # repeatable and cannot be part of a sound literal prefix ('ga*' matches
    # 'g'); an alternation anywhere outside the prefix can restart the match
    # from position 0 ('al|ga'), so no prefix is sound at all then
    if pattern[wc] in "?*+{":
        prefix = prefix[:-1]
    if "|" in pattern:
        prefix = ""
    rx = re.compile(pattern)
    if prefix:
        terms = [t for t in store.td.terms_with_prefix(prefix) if rx.fullmatch(t)]
    else:
        terms = [t for t in store.td.vocab() if rx.fullmatch(t)]
    return union_many([store.postings(t)[0] for t in terms])


def fuzzy_match(
    store: SegmentStore,
    term: str,
    max_dist: int | str = 1,
    transpositions: bool = False,
) -> np.ndarray:
    """Sorted unique doc_ids containing any indexed term within Levenshtein
    distance ``max_dist`` of ``term`` (ES ``fuzzy`` query analog).
    ``transpositions=True`` = ES fuzzy_transpositions (the ES default):
    true Damerau-Levenshtein, adjacent swap costs 1.

    ``max_dist="AUTO"`` applies ES's fuzziness ladder by query-term
    length: 0 edits under 3 chars, 1 for 3-5, 2 above (the AUTO:3,6
    defaults).

    Dictionary expansion via ``TermDict.terms_fuzzy`` (vectorized DP scan,
    ``functions/editdist.py``), then the matched terms' posting doc-sets
    union — same shape as prefix/wildcard."""
    if isinstance(max_dist, str):
        if max_dist.upper() != "AUTO":
            raise ValueError(f"fuzzy_match: bad fuzziness {max_dist!r}")
        max_dist = 0 if len(term) < 3 else 1 if len(term) <= 5 else 2
    terms = store.td.terms_fuzzy(term, max_dist, transpositions)
    return union_many([store.postings(t)[0] for t in terms])


def term_suggest(
    store: SegmentStore, term: str, k: int = 3, max_dist: int = 2
) -> list[tuple[str, int, int]]:
    """ES term suggester: the ``k`` dictionary terms closest to a
    (possibly misspelled) input, ranked ES-style by
    (edit distance ASC, df DESC, term ASC) → [(term, distance, df)].

    Candidates come from the same vectorized Levenshtein dictionary scan
    as ``fuzzy_match``; exact distances are recovered by re-running the
    ≤d mask at each distance tier over the (small) candidate set — the
    expensive full-dictionary pass happens once.
    """
    from ..functions.editdist import levenshtein_leq

    cands = store.td.terms_fuzzy(term, max_dist)
    if not cands:
        return []
    dist = np.full(len(cands), max_dist, dtype=np.int64)
    for d in range(max_dist - 1, -1, -1):
        dist[levenshtein_leq(term, cands, d)] = d
    dfs = [store.td.df_of(t) for t in cands]
    order = sorted(
        range(len(cands)), key=lambda i: (dist[i], -dfs[i], cands[i])
    )
    return [(cands[i], int(dist[i]), int(dfs[i])) for i in order[:k]]


def rescore_topk(
    store: SegmentStore,
    text: str,
    k: int = 10,
    window: int = 20,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    round_decimals: int = 6,
) -> list[tuple[int, float]]:
    """ES ``rescore``: re-rank only the top-``window`` docs of the base
    BM25 match with a more expensive phrase rescorer (score_mode=total):

        combined = query_weight·base + rescore_weight·phrase_score

    where the phrase query's terms are the base query's terms, so a
    phrase-matching doc's rescore score IS its base score — combined
    collapses to ``base·(query_weight + rescore_weight·[phrase matches])``.
    Docs outside the window keep their base ranking (ES semantics: the
    expensive query runs against ``window`` docs per shard, never the full
    hit set).  Ranking on the rounded combined score, ties doc ASC.
    """
    from ..functions.bm25 import sql_round
    from ..pipelines.query import score_query

    base = score_query(store, text, k=window, round_decimals=round_decimals)
    if not base:
        return []
    matches = set(phrase_match(store, text).tolist())
    rescored = [
        (
            d,
            float(
                sql_round(
                    query_weight * s
                    + (rescore_weight * s if d in matches else 0.0),
                    round_decimals,
                )
            ),
        )
        for d, s in base
    ]
    rescored.sort(key=lambda r: (-r[1], r[0]))
    return rescored[:k]


def completion_suggest(
    store: SegmentStore, prefix: str, k: int = 5
) -> list[tuple[str, int]]:
    """ES completion suggester (simplified to the dictionary): the ``k``
    indexed terms with the given prefix, ranked by popularity
    (df DESC, term ASC) — the same footer-pruned dictionary range scan as
    the prefix query, so cost tracks the match count."""
    terms = store.td.terms_with_prefix(prefix)
    dfs = [store.td.df_of(t) for t in terms]
    order = sorted(range(len(terms)), key=lambda i: (-dfs[i], terms[i]))
    return [(terms[i], int(dfs[i])) for i in order[:k]]


class MatchScorer:
    """Actor-pool batch matcher: (query_id, text) rows in → MATCHES rows out.

    ``mode`` picks the operator: ``phrase`` / ``phrase_topk`` / ``prefix`` /
    ``wildcard`` / ``fuzzy`` / ``phrase_slop``.  The store (term dict, lazy
    shards, decoded caches) loads once per actor (__init__), batches stream
    through __call__.
    """

    def __init__(
        self,
        index_dir: str,
        mode: str = "phrase",
        k: int = 10,
        round_decimals: int | None = None,
        tokenizer: str = "code",
        slop: int = 0,
    ):
        self.store = SegmentStore(index_dir)
        self.mode = mode
        self.k = k
        self.round_decimals = round_decimals
        self.tokenizer = tokenizer
        self.slop = slop

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "phrase_topk":
            qids, ranks, docs, scores = [], [], [], []
            for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
                top = phrase_topk(
                    self.store, text, self.k, self.round_decimals, self.tokenizer
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
        fn = {
            "phrase": lambda t: phrase_match(self.store, t, self.tokenizer),
            "prefix": lambda t: prefix_match(self.store, t),
            "wildcard": lambda t: wildcard_match(self.store, t),
            "regexp": lambda t: regexp_match(self.store, t),
            "fuzzy": lambda t: fuzzy_match(self.store, t, max_dist=1),
            "phrase_slop": lambda t: phrase_match_slop(
                self.store, t, self.slop, self.tokenizer
            ),
            # span modes take "t1 t2" query texts (two single-term clauses);
            # span_not reuses ``slop`` as the symmetric pre=post window
            "span_near": lambda t: span_near_match(
                self.store, t.split(" ")[0], t.split(" ")[1], slop=self.slop
            ),
            "span_not": lambda t: span_not_match(
                self.store,
                t.split(" ")[0],
                t.split(" ")[1],
                pre=self.slop,
                post=self.slop,
            ),
        }[self.mode]
        qids_l, docs_l = [], []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            d = fn(text)
            if len(d):
                qids_l.append(np.full(len(d), qid, dtype=np.uint64))
                docs_l.append(d)
        if not qids_l:
            return pa.Table.from_pylist([], schema=MATCHES)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids_l), type=pa.uint64()),
                "doc_id": pa.array(np.concatenate(docs_l), type=pa.uint64()),
            },
            schema=MATCHES,
        )


def run_match_queries(
    index_dir: str,
    queries: pa.Table,
    mode: str = "phrase",
    concurrency: int = 2,
    k: int = 10,
    round_decimals: int | None = None,
    tokenizer: str = "code",
    slop: int = 0,
):
    """Distribute a (query_id, text) set over a MatchScorer pool → Dataset.

    Same pre-split block layout as ``query.run_queries`` so every actor gets
    work immediately (functions/blocks.py)."""
    from ..functions.blocks import from_arrow_blocks

    ds = from_arrow_blocks(queries, concurrency)
    return ds.map_batches(
        MatchScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "mode": mode,
            "k": k,
            "round_decimals": round_decimals,
            "tokenizer": tokenizer,
            "slop": slop,
        },
        batch_size=max(1, -(-queries.num_rows // max(1, concurrency))),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def phrase_suggest(
    store: SegmentStore,
    sf_dir: str,
    queries: list[tuple[int, str, str]],
    k: int = 3,
    max_dist: int = 1,
) -> pa.Table:
    """ES PHRASE suggester (deterministic scoring model): per (query_id,
    w1, w2) input phrase, the top-``k`` corrected phrases.

    Candidate generation is the term suggester's dictionary scan per slot
    (Levenshtein ≤ ``max_dist``); candidate PHRASES rank by
    (Σ edit distance ASC, corpus bigram count DESC, cf(t1)·cf(t2) DESC,
    t1 ASC, t2 ASC) — the deterministic stand-in for ES's shard n-gram
    LM + StupidBackoff (documented divergence: a rank, not a smoothed
    probability).

    Scale plan: the bigram counts come from ONE corpus pass restricted to
    the broadcast candidate sets (`ngrams.bigram_pair_counts`); the cf
    lookup reads the term dictionary for the candidate union only; the
    per-query cross join is tiny (|cand| ≈ edit-ball size).
    """
    import os

    import pyarrow.parquet as pq

    from ..functions.editdist import levenshtein_leq
    from .ngrams import bigram_pair_counts

    def _cands(w: str) -> list[tuple[str, int]]:
        terms = store.td.terms_fuzzy(w, max_dist)
        if not terms:
            return []
        dist = np.full(len(terms), max_dist, dtype=np.int64)
        for d in range(max_dist - 1, -1, -1):
            dist[levenshtein_leq(w, terms, d)] = d
        return list(zip(terms, dist.tolist()))

    per_q = [(qid, _cands(w1), _cands(w2)) for qid, w1, w2 in queries]
    left = sorted({t for _, c1, _ in per_q for t, _ in c1})
    right = sorted({t for _, _, c2 in per_q for t, _ in c2})
    pair_n = bigram_pair_counts(sf_dir, left, right)

    td = pq.read_table(
        os.path.join(store.index_dir, "term_dict.parquet"), columns=["term", "cf"]
    )
    cf_t = td.group_by("term").aggregate([("cf", "sum")])
    cf = dict(zip(cf_t["term"].to_pylist(), (float(x) for x in cf_t["cf_sum"].to_pylist())))

    qids, poss, t1s, t2s, dists, pcs = [], [], [], [], [], []
    for qid, c1, c2 in per_q:
        rows = []
        for t1, e1 in c1:
            for t2, e2 in c2:
                n = pair_n.get((t1, t2), 0)
                rows.append((e1 + e2, -n, -(cf[t1] * cf[t2]), t1, t2, n))
        rows.sort()
        for pos, (dist, _, _, t1, t2, n) in enumerate(rows[:k], start=1):
            qids.append(qid)
            poss.append(pos)
            t1s.append(t1)
            t2s.append(t2)
            dists.append(dist)
            pcs.append(n)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "pos": pa.array(poss, type=pa.int64()),
            "t1": pa.array(t1s, type=pa.string()),
            "t2": pa.array(t2s, type=pa.string()),
            "dist": pa.array(dists, type=pa.int64()),
            "pair_count": pa.array(pcs, type=pa.int64()),
        }
    ).sort_by([("query_id", "ascending"), ("pos", "ascending")])


def intervals_match(
    store: SegmentStore,
    terms: list[str],
    max_gaps: int,
    ordered: bool = False,
) -> np.ndarray:
    """ES ``intervals`` query (``match`` rule with ``max_gaps`` /
    ``ordered``) over single-position term clauses: sorted unique doc_ids
    holding one occurrence per term whose covering window has total gaps
    ``(max_pos - min_pos) - (n-1) <= max_gaps``; ``ordered`` additionally
    requires the occurrences in term order.  Terms must be DISTINCT
    (duplicate clauses would need Lucene's minimal-interval de-overlap).

    Vectorized sliding-window over the merged occurrence stream: all
    occurrences become sorted ``(doc << POS_BITS) | pos`` keys with a term
    label; one ``np.maximum.accumulate`` per label forward-fills the
    latest occurrence of that label (chained through the term sequence
    for ``ordered``), so each candidate window closes in O(1) — no
    per-doc loop.  Key order makes the fills doc-safe: a window whose
    filled starts fall in an earlier doc fails the same-doc check."""
    n = len(terms)
    if n < 2:
        raise ValueError("intervals_match needs >= 2 terms")
    if len(set(terms)) != n:
        raise ValueError("intervals_match terms must be distinct")
    if max_gaps < 0:
        raise ValueError("max_gaps must be >= 0")
    keys_l, labels_l = [], []
    for i, t in enumerate(terms):
        k = _term_keys(store, t)
        if len(k) == 0:
            return np.empty(0, dtype=np.uint64)
        keys_l.append(k)
        labels_l.append(np.full(len(k), i, dtype=np.int64))
    keys = np.concatenate(keys_l)
    labels = np.concatenate(labels_l)
    order = np.argsort(keys, kind="stable")
    keys, labels = keys[order], labels[order]
    NONE = np.uint64(0)  # sentinel: no occurrence seen yet (valid keys > 0
    # never matter: a 0-key window start still fails only via doc/gap checks,
    # so mask explicitly instead)
    if ordered:
        # chain fill: latest occurrence of term i that EXTENDS a chain
        # t0 < t1 < ... < t(i-1) < pos; carry the chain's START key
        chain_start = np.where(labels == 0, keys, NONE)
        chain_ok = labels == 0
        start_fill = np.maximum.accumulate(np.where(chain_ok, chain_start, NONE))
        ok_fill = np.maximum.accumulate(chain_ok.astype(np.int64)) > 0
        for i in range(1, n):
            at_i = labels == i
            # the chain reaching term i at this occurrence starts where the
            # best (latest-starting) chain of length i ended... the start
            # carried forward is the max chain start among chains of length
            # i that END before this occurrence
            chain_start = np.where(at_i & ok_fill, start_fill, NONE)
            chain_ok = at_i & ok_fill
            if i < n - 1:
                start_fill = np.maximum.accumulate(np.where(chain_ok, chain_start, NONE))
                ok_fill = np.maximum.accumulate(chain_ok.astype(np.int64)) > 0
        end_keys = keys[chain_ok]
        start_keys = chain_start[chain_ok]
    else:
        seen = np.zeros((n, len(keys)), dtype=np.uint64)
        valid = np.zeros((n, len(keys)), dtype=bool)
        for i in range(n):
            at_i = labels == i
            seen[i] = np.maximum.accumulate(np.where(at_i, keys, NONE))
            valid[i] = np.maximum.accumulate(at_i.astype(np.int64)) > 0
        all_seen = valid.all(axis=0)
        if not all_seen.any():
            return np.empty(0, dtype=np.uint64)
        start_keys = seen[:, all_seen].min(axis=0)
        end_keys = keys[all_seen]
    if len(end_keys) == 0:
        return np.empty(0, dtype=np.uint64)
    doc_s = start_keys >> np.uint64(POS_BITS)
    doc_e = end_keys >> np.uint64(POS_BITS)
    p_s = (start_keys & np.uint64(MAX_POS)).astype(np.int64)
    p_e = (end_keys & np.uint64(MAX_POS)).astype(np.int64)
    hit = (doc_s == doc_e) & ((p_e - p_s) - (n - 1) <= max_gaps)
    return np.unique(doc_e[hit])


def completion_fuzzy(
    store: SegmentStore, q: str, k: int = 5
) -> list[tuple[str, int]]:
    """ES completion suggester with ``fuzzy`` (fuzziness 1, simplified to
    the dictionary): terms whose prefix OF THE QUERY'S LENGTH is within
    Levenshtein distance 1 of the typed text, ranked (df DESC, term ASC).
    The candidate scan is the vectorized banded Levenshtein kernel over
    the dictionary — the same fuzzy machinery as the fuzzy query, applied
    to prefixes."""
    from ..functions.editdist import levenshtein_leq

    terms = sorted(store.df)
    prefixes = [t[: len(q)] for t in terms]
    ok = levenshtein_leq(q, prefixes, 1)
    cands = [t for t, o in zip(terms, ok) if o]
    dfs = [store.td.df_of(t) for t in cands]
    order = sorted(range(len(cands)), key=lambda i: (-dfs[i], cands[i]))
    return [(cands[i], int(dfs[i])) for i in order[:k]]


def suffix_match(store: SegmentStore, suffix: str) -> np.ndarray:
    """Leading-wildcard search (``*suffix``) via the REVERSED-term trick
    Lucene uses (``reverse`` token filter + prefix query): scan the
    reversed dictionary for ``reversed(suffix)`` prefixes and union the
    matching terms' postings.  The reversed dictionary here derives from
    the in-memory vocab (vocabulary-sized work, cached per store); at
    index scale it is a second sorted term column written at build time —
    the documented scale path."""
    rev = getattr(store, "_reversed_vocab", None)
    if rev is None:
        rev = sorted((t[::-1], t) for t in store.df)
        store._reversed_vocab = rev
    import bisect

    key = suffix[::-1]
    lo = bisect.bisect_left(rev, (key,))
    hits = []
    for i in range(lo, len(rev)):
        if not rev[i][0].startswith(key):
            break
        hits.append(rev[i][1])
    from ..functions.boolean import union_many

    return union_many([store.postings(t)[0] for t in hits])


def _big_spans(
    store: SegmentStore, t1: str, t2: str, gap: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Enumerate ORDERED two-term spans: (doc, p1, p2) with ``t1`` at p1,
    ``t2`` at p2 and ``1 <= p2 - p1 <= gap`` — the 'big' clause of
    span_containing / span_within.  Output arrays are distinct spans (the
    occurrence key sets are unique) sorted by (doc, p2, p1).

    Vectorized: per t2 occurrence one searchsorted window over the t1 keys
    yields its partner RANGE; ranges expand with repeat/arange — the span
    count is bounded by |t2 occurrences| × gap, never |t1|×|t2|."""
    k1 = _term_keys(store, t1)
    k2 = _term_keys(store, t2)
    if len(k1) == 0 or len(k2) == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e, e
    win = np.uint64(gap)
    doc2 = k2 >> np.uint64(POS_BITS)
    p2 = k2 & np.uint64(MAX_POS)
    lo_pos = np.where(p2 > win, p2 - win, np.uint64(0))
    lo = np.searchsorted(k1, (doc2 << np.uint64(POS_BITS)) | lo_pos, side="left")
    hi = np.searchsorted(k1, k2, side="left")  # strictly before p2, same doc
    cnt = (hi - lo).astype(np.int64)
    m = cnt > 0
    if not m.any():
        e = np.empty(0, dtype=np.uint64)
        return e, e, e
    # expand each t2 occurrence's partner range into explicit (p1, p2) pairs
    reps = cnt[m]
    idx = np.repeat(lo[m], reps) + (
        np.arange(int(reps.sum()), dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
    )
    p1 = k1[idx] & np.uint64(MAX_POS)
    d = np.repeat(doc2[m], reps)
    pp2 = np.repeat(p2[m], reps)
    return d, p1, pp2


def span_containing_match(
    store: SegmentStore, t1: str, t2: str, little: str, gap: int = 3
) -> pa.Table:
    """ES/Lucene ``span_containing``: big spans (ordered ``t1``…``t2``
    within ``gap``) that CONTAIN a ``little`` occurrence.  Returns
    (doc_id, n) — n = number of distinct containing big spans per doc
    (the spans Lucene would emit for further composition)."""
    d, p1, p2 = _big_spans(store, t1, t2, gap)
    if len(d) == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
    k3 = _term_keys(store, little)
    lo = np.searchsorted(k3, (d << np.uint64(POS_BITS)) | p1, side="left")
    hi = np.searchsorted(k3, (d << np.uint64(POS_BITS)) | p2, side="right")
    keep = hi > lo
    if not keep.any():
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
    dd = d[keep]
    docs, counts = np.unique(dd, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(docs.astype(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def span_within_match(
    store: SegmentStore, t1: str, t2: str, little: str, gap: int = 3
) -> pa.Table:
    """ES/Lucene ``span_within``: ``little`` occurrences that lie WITHIN a
    big span — same match condition as span_containing but the LITTLE
    spans are the output.  Returns (doc_id, n) — n = number of distinct
    covered little positions per doc (coverage via a difference array over
    the sorted little keys, no per-span loop)."""
    k3 = _term_keys(store, little)
    if len(k3) == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
    d, p1, p2 = _big_spans(store, t1, t2, gap)
    if len(d) == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
    lo = np.searchsorted(k3, (d << np.uint64(POS_BITS)) | p1, side="left")
    hi = np.searchsorted(k3, (d << np.uint64(POS_BITS)) | p2, side="right")
    delta = np.zeros(len(k3) + 1, dtype=np.int64)
    np.add.at(delta, lo, 1)
    np.add.at(delta, hi, -1)
    covered = np.cumsum(delta[:-1]) > 0
    if not covered.any():
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
    cd = (k3[covered] >> np.uint64(POS_BITS)).astype(np.int64)
    docs, counts = np.unique(cd, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(docs),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def span_field_masking_match(
    store: SegmentStore,
    masked_store: SegmentStore,
    t1: str,
    t2: str,
    slop: int = 0,
) -> np.ndarray:
    """ES ``field_masking_span``: a span clause evaluated against ANOTHER
    field's positional index but composed as if its positions came from
    the primary field — ``t1`` from ``store`` (the primary field) within
    the unordered slop window of ``t2`` from ``masked_store`` (the masked
    field).  Sound exactly when the two fields are position-aligned
    analyses of the same text (ES's documented use: stemmed vs exact
    sub-fields), which ``derive_masked_corpus`` guarantees by construction.

    Same searchsorted-window kernel as ``span_near_match`` unordered —
    the key arrays just come from different indexes; the same-position
    exclusion carries over (two spans at one position overlap, not near).
    """
    if slop < 0:
        raise ValueError("slop must be >= 0")
    k1 = _term_keys(store, t1)
    k2 = _term_keys(masked_store, t2)
    if len(k1) == 0 or len(k2) == 0:
        return np.empty(0, dtype=np.uint64)
    win = np.uint64(slop + 1)
    doc2 = k2 >> np.uint64(POS_BITS)
    p2 = k2 & np.uint64(MAX_POS)
    lo_pos = np.where(p2 > win, p2 - win, np.uint64(0))
    lo = (doc2 << np.uint64(POS_BITS)) | lo_pos
    hi_pos = np.minimum(p2 + win, np.uint64(MAX_POS))
    hi = (doc2 << np.uint64(POS_BITS)) | hi_pos
    cnt = np.searchsorted(k1, hi, side="right") - np.searchsorted(k1, lo, side="left")
    self_hit = k1[
        np.clip(np.searchsorted(k1, k2, side="left"), 0, len(k1) - 1)
    ] == k2
    cnt = cnt - self_hit.astype(cnt.dtype)
    return np.unique(doc2[cnt > 0])


def span_or_near_match(
    store: SegmentStore, alts: list[str], t2: str, slop: int = 0
) -> np.ndarray:
    """ES ``span_or`` inside ``span_near``: docs where ANY of ``alts``
    occurs within the unordered slop window of ``t2`` — the OR clause is
    the union of the alternatives' occurrence-key sets, then the standard
    span_near window kernel runs unchanged."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    keys = [_term_keys(store, a) for a in alts]
    keys = [k for k in keys if len(k)]
    if not keys:
        return np.empty(0, dtype=np.uint64)
    k1 = keys[0]
    for k in keys[1:]:
        k1 = np.union1d(k1, k)
    k2 = _term_keys(store, t2)
    if len(k2) == 0:
        return np.empty(0, dtype=np.uint64)
    win = np.uint64(slop + 1)
    doc2 = k2 >> np.uint64(POS_BITS)
    p2 = k2 & np.uint64(MAX_POS)
    lo_pos = np.where(p2 > win, p2 - win, np.uint64(0))
    lo = (doc2 << np.uint64(POS_BITS)) | lo_pos
    hi_pos = np.minimum(p2 + win, np.uint64(MAX_POS))
    hi = (doc2 << np.uint64(POS_BITS)) | hi_pos
    cnt = np.searchsorted(k1, hi, side="right") - np.searchsorted(k1, lo, side="left")
    self_hit = k1[
        np.clip(np.searchsorted(k1, k2, side="left"), 0, len(k1) - 1)
    ] == k2
    cnt = cnt - self_hit.astype(cnt.dtype)
    return np.unique(doc2[cnt > 0])


def search_as_you_type_topk(
    store: SegmentStore,
    text: str,
    prefix: str,
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``search_as_you_type`` field queried with ``multi_match
    type=bool_prefix`` over ``[field, field._2gram]`` — the mid-typing
    query: ``text`` holds the completed tokens, ``prefix`` the partial one.

    Subfield semantics (ES's shingle subfields; ``_3gram`` is the same
    shape one slot wider and intentionally not duplicated):

    - **main field** — ``match_bool_prefix``: every completed token scores
      as a BM25 term query, the partial as a constant-score (+1) prefix
      expansion (Lucene's multi-term rewrite; expansion df never enters).
    - **``_2gram``** — the word-shingle subfield.  No second index is ever
      materialized: bigram postings (per-doc tf, df) derive on the fly from
      the POSITIONAL index by intersecting adjacent occurrence keys, and
      the subfield's length stats are exactly ``dl−1`` per doc and
      ``avgdl−1`` (one fewer bigram slot than tokens, every doc).  Each
      completed consecutive bigram scores BM25 under those stats; the
      trailing ``(last_token, partial·)`` bigram is a constant-score (+1)
      prefix over the dictionary expansions.
    - ``type=bool_prefix`` sums the per-field scores (ES most-fields
      combining for this type); rank (score DESC, doc ASC).
    """
    from ..functions.bm25 import sql_round, tf_norm, topk_order
    from ..functions.tokenize import tokenize_query
    from .structured import _score_map

    toks = tokenize_query(text)
    if not toks:
        return []

    # main field: BM25 over the completed tokens + prefix expansion docs
    docs_m, scores_m = _score_map(store, text)
    pdocs = prefix_match(store, prefix).astype(np.int64)

    # _2gram: BM25 per distinct completed bigram under (dl-1, avgdl-1)
    big_docs: list[np.ndarray] = []
    big_contrib: list[np.ndarray] = []
    avgdl2 = store.avgdl - 1.0
    for w1, w2 in sorted(set(zip(toks, toks[1:]))):
        k1 = _term_keys(store, w1)
        k2 = _term_keys(store, w2)
        if len(k1) == 0 or len(k2) == 0:
            continue
        match = np.intersect1d(k1 + np.uint64(1), k2, assume_unique=True)
        if len(match) == 0:
            continue
        bdocs, btf = np.unique(match >> np.uint64(POS_BITS), return_counts=True)
        df2 = float(len(bdocs))
        d1, _tf1, dl1 = store.postings(w1)
        # postings arrive per-salted-slice sorted, not globally — order first
        order1 = np.argsort(d1, kind="stable")
        dl2 = dl1[order1][np.searchsorted(d1[order1], bdocs)].astype(np.float64) - 1.0
        big_docs.append(bdocs.astype(np.int64))
        big_contrib.append(
            float(idf(store.n_docs, df2))
            * tf_norm(btf.astype(np.float64), dl2, avgdl2)
        )

    # _2gram prefix: last completed token immediately followed by any
    # dictionary expansion of the partial
    k_last = _term_keys(store, toks[-1])
    exp_keys = [
        _term_keys(store, t) for t in store.td.terms_with_prefix(prefix)
    ]
    exp_keys = [e for e in exp_keys if len(e)]
    if len(k_last) and exp_keys:
        union = exp_keys[0]
        for e in exp_keys[1:]:
            union = np.union1d(union, e)
        bp = np.intersect1d(k_last + np.uint64(1), union, assume_unique=True)
        bpdocs = np.unique(bp >> np.uint64(POS_BITS)).astype(np.int64)
    else:
        bpdocs = np.empty(0, dtype=np.int64)

    legs_docs = [docs_m.astype(np.int64), pdocs, bpdocs] + big_docs
    uniq = np.unique(np.concatenate([d for d in legs_docs if len(d)] or [np.empty(0, dtype=np.int64)]))
    if len(uniq) == 0:
        return []
    final = np.zeros(len(uniq), dtype=np.float64)
    if len(docs_m):
        final[np.searchsorted(uniq, docs_m.astype(np.int64))] += scores_m
    if len(pdocs):
        final[np.searchsorted(uniq, pdocs)] += 1.0
    for bdocs, contrib in zip(big_docs, big_contrib):
        final[np.searchsorted(uniq, bdocs)] += contrib
    if len(bpdocs):
        final[np.searchsorted(uniq, bpdocs)] += 1.0
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq.astype(np.uint64), k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def span_multi_near_match(
    store: SegmentStore,
    pattern: str,
    t2: str,
    slop: int = 0,
    max_expansions: int = 128,
) -> np.ndarray:
    """ES ``span_multi`` (Lucene SpanMultiTermQueryWrapper) inside
    ``span_near``: a prefix/wildcard/fuzzy clause rewrites against the
    term DICTIONARY into its matching terms, which then act as one
    ``span_or`` clause in the unordered slop window of ``t2``.

    Lucene caps the rewrite (``top_terms_*``) because an unbounded
    expansion multiplies the span merge; the graft raises past
    ``max_expansions`` instead of silently truncating (truncation changes
    results — a loud cap beats a wrong answer).  Pattern forms: trailing
    ``~d`` → fuzzy (Damerau, like the ``fuzzy`` query), ``*``/``?`` →
    wildcard with the literal-prefix dictionary prune, else exact term."""
    fm = re.fullmatch(r"(.+?)~(\d+)", pattern)
    if fm:
        terms = list(store.td.terms_fuzzy(fm.group(1), int(fm.group(2)), True))
    elif "*" in pattern or "?" in pattern:
        wc = min(i for i, ch in enumerate(pattern) if ch in "*?")
        prefix = pattern[:wc]
        if not prefix:
            raise ValueError("span_multi: leading-wildcard pattern")
        rx = re.compile(fnmatch.translate(pattern))
        terms = [t for t in store.td.terms_with_prefix(prefix) if rx.match(t)]
    else:
        terms = [pattern]
    if len(terms) > max_expansions:
        raise ValueError(
            f"span_multi: {len(terms)} expansions exceed max_expansions="
            f"{max_expansions}"
        )
    if not terms:
        return np.empty(0, dtype=np.uint64)
    return span_or_near_match(store, terms, t2, slop)


def build_context_popularity(sf_dir: str) -> "pa.Table":
    """Per-(context, term) popularity for the contexts-aware completion
    suggester: one streamed pass over the corpus emits per-batch DISTINCT
    (lang, term, doc) partials reduced to (lang, term, df) — bounded by
    #langs × vocab, never doc count."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(flat.flatten())
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lengths)
        langs = np.asarray(batch["lang"].combine_chunks().cast(pa.string()))
        # distinct (row, term) via dictionary codes
        tvals, tcodes = np.unique(terms, return_inverse=True)
        key = np.unique(rows * np.int64(len(tvals)) + tcodes)
        rows_d = key // len(tvals)
        t = pa.table(
            {
                "lang": pa.array(langs[rows_d], type=pa.string()),
                "term": pa.array(tvals[key % len(tvals)], type=pa.string()),
            }
        )
        g = t.group_by(["lang", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["lang", "term", "df"])

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    g = cat.group_by(["lang", "term"]).aggregate([("df", "sum")])
    return g.rename_columns(["lang", "term", "df"])


def completion_contexts(
    popularity: "pa.Table", prefix: str, lang: str, k: int = 5
) -> list[tuple[str, int]]:
    """ES completion suggester with ``contexts`` (category = lang): the
    ``k`` completions of ``prefix`` ranked by popularity WITHIN the
    context (df DESC, term ASC) — a different context reorders and
    filters the same prefix."""
    import pyarrow.compute as pc

    m = pc.and_(
        pc.equal(popularity["lang"], lang),
        pc.starts_with(popularity["term"], pattern=prefix),
    )
    t = popularity.filter(m)
    terms = t["term"].to_pylist()
    dfs = t["df"].to_pylist()
    order = sorted(range(len(terms)), key=lambda i: (-dfs[i], terms[i]))
    return [(terms[i], int(dfs[i])) for i in order[:k]]


def _trigram_index(store: SegmentStore) -> tuple[list[str], dict[str, np.ndarray]]:
    """Trigram → sorted term-id postings over the vocabulary, with ``^``/
    ``$`` boundary markers so anchored pattern pieces prune too.
    Vocabulary-sized work, cached per store; at index scale this is a
    second dictionary artifact written at build time (the same contract
    as the reversed dictionary)."""
    cached = getattr(store, "_trigram_vocab", None)
    if cached is not None:
        return cached
    vocab = sorted(store.df)
    tri: dict[str, list[int]] = {}
    for i, t in enumerate(vocab):
        padded = f"^{t}$"
        for j in range(len(padded) - 2):
            tri.setdefault(padded[j : j + 3], []).append(i)
    idx = {g: np.array(ids, dtype=np.int64) for g, ids in tri.items()}
    store._trigram_vocab = (vocab, idx)
    return vocab, idx


def wildcard_field_match(store: SegmentStore, pattern: str) -> np.ndarray:
    """ES ``wildcard`` FIELD TYPE semantics: glob matching accelerated by
    a trigram index — unlike the ``wildcard`` QUERY (`wildcard_match`),
    LEADING and infix wildcards are first-class, because candidate terms
    come from intersecting the pattern's literal runs' trigram posting
    sets (ES's wildcard field stores exactly such n-grams), then the glob
    verifies only the survivors.  A pattern with no literal trigram
    degrades to the full-vocabulary verify (same as ES's post-filter
    worst case)."""
    vocab, tri = _trigram_index(store)
    runs: list[str] = []
    cur = ["^"]
    for ch in pattern:
        if ch in "*?":
            runs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cur.append("$")
    runs.append("".join(cur))
    grams = [
        run[j : j + 3]
        for run in runs
        for j in range(len(run) - 2)
    ]
    cand_ids: np.ndarray | None = None
    for g in grams:
        ids = tri.get(g)
        if ids is None:
            return np.empty(0, dtype=np.uint64)  # gram absent → no term
        cand_ids = ids if cand_ids is None else np.intersect1d(
            cand_ids, ids, assume_unique=True
        )
        if len(cand_ids) == 0:
            return np.empty(0, dtype=np.uint64)
    cands = vocab if cand_ids is None else [vocab[i] for i in cand_ids.tolist()]
    rx = re.compile(fnmatch.translate(pattern))
    terms = [t for t in cands if rx.match(t)]
    return union_many([store.postings(t)[0] for t in terms])
