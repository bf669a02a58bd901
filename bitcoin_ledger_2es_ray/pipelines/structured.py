"""Structured-query operators (ES bool-DSL long tail, SURVEY §2.5/§10).

Four Elasticsearch query shapes the ledger repo's users reach for beyond
plain match/phrase, each a numpy kernel over the decoded posting arrays:

- ``min_should_match``    bool ``should`` with ``minimum_should_match=m``
- ``range_filtered_topk`` bool ``must`` match + ``filter: range`` on dl
                          (doc-values range filter; scores unchanged by
                          the filter, exactly like ES filter context)
- ``sort_by_field_topk``  query hits sorted by a doc value, not by score
                          (ES ``sort: [{dl: desc}, {_doc: asc}]``)
- ``highlight_first``     positional highlighting: first query-term
                          occurrence per matching doc + a token window
                          (the deterministic core of ES ``highlight``)

All four run per-query over a loaded ``SegmentStore`` (the serving /
MatchScorer shape); distribution is the standard queries-Dataset →
actor-pool ``map_batches`` pattern used by BM25/phrase scorers.
"""

from __future__ import annotations

import numpy as np

from ..functions.bm25 import idf
from .query import SegmentStore, taat_topk, tokenize_query


def min_should_match(store: SegmentStore, text: str, m: int) -> np.ndarray:
    """Sorted unique doc_ids containing at least ``m`` DISTINCT query terms
    (ES bool ``should`` + ``minimum_should_match``).

    One concat + unique-with-counts over the per-term doc sets — each term
    contributes a doc at most once, so the multiplicity of a doc across the
    concatenation IS its matched-term count.
    """
    terms = sorted(set(tokenize_query(text)))
    if m <= 0:
        raise ValueError("minimum_should_match must be >= 1")
    sets = []
    for t in terms:
        d = store.postings(t)[0]
        if len(d):
            sets.append(d)
    if not sets:
        return np.empty(0, dtype=np.uint64)
    docs, counts = np.unique(np.concatenate(sets), return_counts=True)
    return docs[counts >= m]


def range_filtered_topk(
    store: SegmentStore,
    text: str,
    k: int,
    dl_lo: int,
    dl_hi: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """BM25 top-k restricted to docs with ``dl_lo <= dl <= dl_hi`` (ES bool
    ``must`` match + ``filter: {range: {dl: ...}}``).

    Filter context, ES-exactly: the range prunes candidates but does not
    touch scores — idf/avgdl stay corpus-global.  The mask applies per
    posting list BEFORE accumulation, so the taat kernel never sees
    filtered docs (at scale this is the cheap row-elimination the column
    store gives for free; postings carry dl inline).
    """
    terms = sorted(set(tokenize_query(text)))
    lists = []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        mask = (dl >= dl_lo) & (dl <= dl_hi)
        lists.append((float(idf(store.n_docs, df_t)), d[mask], tf[mask], dl[mask]))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)


def sort_by_field_topk(
    store: SegmentStore, text: str, k: int, descending: bool = True
) -> list[tuple[int, int]]:
    """Top-k (doc_id, dl) of the OR-match set ordered by
    (dl DESC|ASC, doc_id ASC) — ES sort-by-doc-value instead of by score.

    Per-doc dl comes straight off the posting arrays (postings carry dl
    inline), deduped with one unique pass; no forward-map read.
    """
    terms = sorted(set(tokenize_query(text)))
    doc_parts, dl_parts = [], []
    for t in terms:
        d, _, dl = store.postings(t)
        if len(d):
            doc_parts.append(d)
            dl_parts.append(dl)
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    dls = np.concatenate(dl_parts)
    docs, first = np.unique(docs, return_index=True)
    dls = dls[first]
    sign = -1 if descending else 1
    order = np.lexsort((docs, sign * dls.astype(np.int64)))[:k]
    return [(int(docs[i]), int(dls[i])) for i in order]


def bool_topk(
    store: SegmentStore,
    must: tuple[str, ...] = (),
    should: tuple[str, ...] = (),
    must_not: tuple[str, ...] = (),
    k: int = 10,
    dl_lo: int | None = None,
    dl_hi: int | None = None,
    minimum_should_match: int = 0,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """The full ES ``bool`` query in one combinator:

    - ``must``       every term required; contributes to the score
    - ``should``     optional terms; contribute when present; with no
                     ``must`` clauses at least max(1, msm) are required
                     (ES's implicit minimum_should_match), otherwise
                     ``minimum_should_match`` applies as given
    - ``must_not``   excludes, never scores
    - ``dl_lo/hi``   filter context on doc length: prunes candidates,
                     leaves scores corpus-global (like ES ``filter``)

    Score = BM25 sum over the doc's matching must+should terms (standard
    taat accumulation, sorted term order), ranked on the rounded value.
    ``must`` and ``should`` clauses must be disjoint (a term in both would
    be two clauses scoring twice — refused for determinism)."""
    from ..functions.boolean import difference, intersect_many, union_many

    must_t = sorted(set(must))
    should_t = sorted(set(should))
    if set(must_t) & set(should_t):
        raise ValueError("must and should clauses must be disjoint")
    must_sets = [np.unique(store.postings(t)[0]) for t in must_t]
    if must_t and any(len(s) == 0 for s in must_sets):
        return []
    cand = intersect_many(must_sets) if must_t else None
    s_sets = [np.unique(store.postings(t)[0]) for t in should_t]
    s_sets = [s for s in s_sets if len(s)]
    msm = minimum_should_match if must_t else max(1, minimum_should_match)
    if should_t and msm > 0:
        if not s_sets:
            return []
        docs, counts = np.unique(np.concatenate(s_sets), return_counts=True)
        ok = docs[counts >= msm]
        cand = ok if cand is None else cand[np.isin(cand, ok, assume_unique=True)]
    elif cand is None:
        cand = union_many(s_sets)
    if cand is None or len(cand) == 0:
        return []
    for t in sorted(set(must_not)):
        d = store.postings(t)[0]
        if len(d):
            cand = difference(cand, np.unique(d))
    if len(cand) == 0:
        return []
    scored_terms = sorted(set(must_t) | set(should_t))
    # one decode per scored term — the dl filter and the taat loop below
    # both read from this cache
    triples = {t: store.postings(t) for t in scored_terms}
    if dl_lo is not None or dl_hi is not None:
        lo = -1 if dl_lo is None else dl_lo
        hi = np.iinfo(np.int64).max if dl_hi is None else dl_hi
        doc_parts, dl_parts = [], []
        for t in scored_terms:
            d, _, dl = triples[t]
            if len(d):
                doc_parts.append(d)
                dl_parts.append(dl)
        docs = np.concatenate(doc_parts)
        dls = np.concatenate(dl_parts)
        docs, first = np.unique(docs, return_index=True)
        dls = dls[first].astype(np.int64)
        ok = docs[(dls >= lo) & (dls <= hi)]
        cand = cand[np.isin(cand, ok, assume_unique=True)]
        if len(cand) == 0:
            return []
    lists = []
    for t in scored_terms:
        df_t = store.td.df_of(t)
        if df_t == 0:
            continue
        d, tf, dl = triples[t]
        m = np.isin(d, cand, assume_unique=True)
        lists.append((float(idf(store.n_docs, df_t)), d[m], tf[m], dl[m]))
    return taat_topk(lists, store.avgdl, k, round_decimals=round_decimals)


def wrapper_query(
    store: SegmentStore,
    encoded: str,
    k: int = 10,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``wrapper`` query: a base64-encoded JSON query, decoded at search
    time and dispatched to the native kernels.  The supported JSON subset
    mirrors the clauses the engine already implements —

    - ``{"bool": {"must"/"should"/"must_not": [clause...],
                  "minimum_should_match": n,
                  "filter": [{"range": {"dl": {"gte": lo, "lte": hi}}}]}}``
      → :func:`bool_topk`
    - ``{"match": {"text": "..."}}`` (top level or as a clause; analyzed
      with the index tokenizer) and ``{"term": {"text": "t"}}`` (verbatim)

    A top-level ``match`` is the ES default-operator-OR match query, i.e.
    a bool of analyzed should terms with the implicit msm of 1 — exactly
    ``bool_topk(should=tokens)``.  Unsupported clause kinds raise, like
    ES's parse errors."""
    import base64
    import json

    obj = json.loads(base64.b64decode(encoded.encode("ascii")).decode("utf-8"))

    def clause_terms(clauses) -> tuple[str, ...]:
        out: list[str] = []
        for c in clauses if isinstance(clauses, list) else [clauses]:
            if "term" in c:
                out.append(c["term"]["text"])
            elif "match" in c:
                out.extend(tokenize_query(c["match"]["text"]))
            else:
                raise ValueError(f"wrapper: unsupported clause {sorted(c)}")
        return tuple(sorted(set(out)))

    if "match" in obj or "term" in obj:
        return bool_topk(
            store, should=clause_terms(obj), k=k, round_decimals=round_decimals
        )
    if "bool" not in obj:
        raise ValueError(f"wrapper: unsupported query {sorted(obj)}")
    b = obj["bool"]
    dl_lo = dl_hi = None
    for f in b.get("filter", []):
        rng = f.get("range", {}).get("dl")
        if rng is None:
            raise ValueError(f"wrapper: unsupported filter {sorted(f)}")
        dl_lo, dl_hi = rng.get("gte"), rng.get("lte")
    return bool_topk(
        store,
        must=clause_terms(b.get("must", [])),
        should=clause_terms(b.get("should", [])),
        must_not=clause_terms(b.get("must_not", [])),
        k=k,
        dl_lo=dl_lo,
        dl_hi=dl_hi,
        minimum_should_match=int(b.get("minimum_should_match", 0)),
        round_decimals=round_decimals,
    )


def synonym_topk(
    store: SegmentStore,
    groups: list[list[str]],
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """Lucene ``SynonymQuery`` (what ES's query-time ``synonym`` filter
    produces): each GROUP of terms scores as ONE pseudo-term —

        tf  = Σ member tf per doc (a doc matching two members counts both)
        df  = max member df       (Lucene's blended document frequency)

    so synonyms never inflate idf the way a bool-should of the members
    would.  Per group: concatenate the members' postings, sum tf per doc
    (one ``np.add.at``), score with idf(max df); groups then accumulate
    exactly like independent query terms (sorted by their first member —
    deterministic taat order).  Ranked on the rounded score, ties doc ASC.
    """
    from ..functions.bm25 import sql_round, tf_norm
    from .query import topk_order

    norm_groups = []
    for g in groups:
        members = sorted(set(g))
        if members:
            norm_groups.append(members)
    norm_groups.sort(key=lambda g: g[0])
    docs_l, contrib_l = [], []
    for members in norm_groups:
        dfs = [store.td.df_of(t) for t in members]
        df_g = max(dfs)
        if df_g == 0:
            continue
        d_parts, tf_parts, dl_parts = [], [], []
        for t in members:
            d, tf, dl = store.postings(t)
            if len(d):
                d_parts.append(d)
                tf_parts.append(tf.astype(np.float64))
                dl_parts.append(dl)
        if not d_parts:  # df > 0 in the dictionary but every live posting
            continue  # tombstoned — the group contributes nothing
        docs = np.concatenate(d_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        tf_sum = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tf_sum, inv, tfs)
        dl_of = np.zeros(len(uniq), dtype=np.float64)
        dl_of[inv] = dls  # dl constant per doc
        w = float(idf(store.n_docs, df_g))
        docs_l.append(uniq)
        contrib_l.append(w * tf_norm(tf_sum, dl_of, store.avgdl))
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    order = topk_order(scores, uniq, k)
    return [(int(uniq[i]), float(scores[i])) for i in order]


def _score_map(store: SegmentStore, text: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique doc_ids, UNROUNDED BM25 scores) of every doc matching
    any term of ``text`` — the full score surface one bool sub-query
    contributes.  Same accumulation order as ``taat_topk`` (sorted terms,
    np.add.at) so compositions stay bit-stable."""
    terms = sorted(set(tokenize_query(text)))
    docs_l, contrib_l = [], []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        from ..functions.bm25 import tf_norm

        docs_l.append(d)
        contrib_l.append(
            float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
        )
    if not docs_l:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, dtype=np.float64)
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    return uniq, scores


def dis_max_topk(
    store: SegmentStore,
    texts: list[str],
    k: int,
    tie_breaker: float = 0.0,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``dis_max`` query: per doc, the BEST sub-query score wins, plus
    ``tie_breaker`` × the sum of the others:

        score = max_i s_i + tie_breaker · (Σ_i s_i − max_i s_i)

    (tie_breaker=0 is pure disjunction-max, 1 degrades to bool should.)
    Each sub-query contributes its full BM25 score surface (``_score_map``);
    the combine is one vectorized segmented max/sum over the concatenated
    (doc, score) pairs.  Ranked on the ROUNDED final score, ties doc ASC.
    """
    from ..functions.bm25 import sql_round
    from .query import topk_order

    doc_parts, score_parts = [], []
    for text in texts:
        d, s = _score_map(store, text)
        if len(d):
            doc_parts.append(d)
            score_parts.append(s)
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    scores = np.concatenate(score_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    mx = np.zeros(len(uniq), dtype=np.float64)
    np.maximum.at(mx, inv, scores)
    sm = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sm, inv, scores)
    final = mx + tie_breaker * (sm - mx)
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def boosting_topk(
    store: SegmentStore,
    positive: str,
    negative: str,
    k: int,
    negative_boost: float = 0.5,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``boosting`` query: docs matching the positive query keep their
    BM25 score, demoted by ``negative_boost`` when they ALSO match the
    negative query (ES semantics: the negative leg never excludes, it only
    multiplies the score down).  Ranked on the rounded final score."""
    from ..functions.bm25 import sql_round
    from .query import topk_order

    uniq, scores = _score_map(store, positive)
    if len(uniq) == 0:
        return []
    neg_docs: list[np.ndarray] = []
    for t in sorted(set(tokenize_query(negative))):
        d = store.postings(t)[0]
        if len(d):
            neg_docs.append(d)
    if neg_docs:
        neg = np.unique(np.concatenate(neg_docs))
        demote = np.isin(uniq, neg)
        scores = np.where(demote, scores * negative_boost, scores)
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    order = topk_order(scores, uniq, k)
    return [(int(uniq[i]), float(scores[i])) for i in order]


def highlight_first(
    store: SegmentStore, text: str, width: int = 3
) -> list[tuple[int, int, int, int]]:
    """Per matching doc: (doc_id, first_pos, snip_start, snip_end) where
    ``first_pos`` is the earliest occurrence of ANY query term and the
    snippet is the ``±width`` token window clipped to the doc
    (ES ``highlight`` reduced to its deterministic core: locating the
    fragment; markup is presentation).  Requires a positional index.

    Positions decode per term (flat stream, posting k owns
    ``flat[cum_tf[k]:cum_tf[k+1]]``); the first position of posting k is
    simply ``flat[cum_tf[k]]`` since in-doc positions are sorted —
    no per-doc Python loop.
    """
    terms = sorted(set(tokenize_query(text)))
    doc_parts, pos_parts, dl_parts = [], [], []
    for t in terms:
        d, tf, flat = store.postings_positions(t)
        if not len(d):
            continue
        starts = np.concatenate(([0], np.cumsum(tf.astype(np.int64))[:-1]))
        doc_parts.append(d)
        pos_parts.append(flat[starts].astype(np.int64))
        dl_parts.append(store.postings(t)[2])
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    firsts = np.concatenate(pos_parts)
    dls = np.concatenate(dl_parts)
    # min first-position per doc: sort by (doc, pos), take each doc's head
    order = np.lexsort((firsts, docs))
    docs, firsts, dls = docs[order], firsts[order], dls[order]
    head = np.concatenate(([True], docs[1:] != docs[:-1]))
    docs, firsts, dls = docs[head], firsts[head], dls[head]
    snip_lo = np.maximum(firsts - width, 0)
    snip_hi = np.minimum(firsts + width, dls.astype(np.int64) - 1)
    return [
        (int(d), int(p), int(lo), int(hi))
        for d, p, lo, hi in zip(docs, firsts, snip_lo, snip_hi)
    ]


def terms_set_match(
    store: SegmentStore,
    terms: list[str],
    doc_ids_sorted: np.ndarray,
    n_chars: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ES ``terms_set`` query with ``minimum_should_match_field``: a doc
    matches when it contains at least M of the N distinct query terms,
    where M comes from a per-DOC field — here
    ``M = min(N, 1 + n_chars % N)`` off the documents' ``n_chars`` column.

    Returns (doc_id, n_matched, required) for matching docs, doc ASC.

    Kernel: each term's posting list has unique docs, so one
    ``np.unique(concat, return_counts)`` IS the per-doc distinct-match
    count; M is a vectorized searchsorted gather off the doc-values
    column.  Scale plan: the doc-values side is the forward map — at
    corpus scale the gather runs inside the scorer partition (candidate
    doc set ≪ corpus), never a full-table read per query.
    """
    terms = sorted(set(terms))
    nt = len(terms)
    if nt == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    alld = np.concatenate([np.sort(store.postings(t)[0]) for t in terms])
    docs, counts = np.unique(alld, return_counts=True)
    idx = np.searchsorted(doc_ids_sorted, docs)
    if len(doc_ids_sorted) == 0 or (doc_ids_sorted[idx.clip(max=len(doc_ids_sorted) - 1)] != docs).any():
        raise KeyError("terms_set: posting doc absent from the doc-values column")
    req = np.minimum(nt, 1 + n_chars[idx] % nt).astype(np.int64)
    keep = counts >= req
    return (
        docs[keep].astype(np.int64),
        counts[keep].astype(np.int64),
        req[keep],
    )


def rank_feature_topk(
    store: SegmentStore,
    text: str,
    doc_ids_sorted: np.ndarray,
    feature: np.ndarray,
    k: int,
    boost: float = 1.5,
    pivot: float = 256.0,
    round_decimals: int | None = None,
    function: str = "saturation",
    scale: float = 1.0,
    exponent: float = 0.6,
) -> list[tuple[int, float]]:
    """ES ``rank_feature`` query inside a bool should: score = BM25(text)
    + boost·f(x) with x a per-doc numeric feature (doc-values column) —
    top-k on the rounded combined score, ties doc ASC.  ``function`` is
    ES's full family: ``saturation`` x/(x+pivot) (default), ``log``
    ln(scale·x + 1), ``sigmoid`` xᵉ/(xᵉ + pivotᵉ), ``linear`` x.

    The feature gather is a vectorized searchsorted over the doc-values
    column restricted to the BM25 candidate set (candidates ≪ corpus at
    any scale)."""
    from ..functions.bm25 import sql_round
    from .query import topk_order

    docs, scores = _score_map(store, text)
    if len(docs) == 0:
        return []
    idx = np.searchsorted(doc_ids_sorted, docs)
    if (doc_ids_sorted[idx.clip(max=len(doc_ids_sorted) - 1)] != docs).any():
        raise KeyError("rank_feature: candidate doc missing from the feature column")
    x = feature[idx].astype(np.float64)
    if function == "saturation":
        fx = x / (x + pivot)
    elif function == "log":
        fx = np.log(scale * x + 1.0)
    elif function == "sigmoid":
        fx = x**exponent / (x**exponent + pivot**exponent)
    elif function == "linear":
        fx = x
    else:
        raise ValueError(f"rank_feature: unknown function {function!r}")
    combined = scores + boost * fx
    if round_decimals is not None:
        combined = sql_round(combined, round_decimals)
    order = topk_order(combined, docs, k)
    return [(int(docs[i]), float(combined[i])) for i in order]


def match_bool_prefix_topk(
    store: SegmentStore,
    text: str,
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``match_bool_prefix``: the analyzed tokens become a bool
    ``should`` — every token but the last as a scoring term query, the
    LAST as a ``prefix`` query under Lucene's constant-score multi-term
    rewrite (each matching doc gets +1.0, df of the expansion never
    enters the score).  A doc matches if it holds any leading term OR any
    prefix expansion (pure should, msm 1)."""
    from ..functions.bm25 import sql_round, topk_order
    from .phrase import prefix_match

    toks = tokenize_query(text)
    if not toks:
        return []
    lead, prefix = toks[:-1], toks[-1]
    docs, scores = _score_map(store, " ".join(lead)) if lead else (
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.float64),
    )
    pdocs = prefix_match(store, prefix).astype(np.uint64)
    uniq = np.union1d(docs.astype(np.int64), pdocs.astype(np.int64))
    if len(uniq) == 0:
        return []
    final = np.zeros(len(uniq), dtype=np.float64)
    if len(docs):
        final[np.searchsorted(uniq, docs.astype(np.int64))] += scores
    if len(pdocs):
        final[np.searchsorted(uniq, pdocs.astype(np.int64))] += 1.0
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq.astype(np.uint64), k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def constant_score_topk(
    store: SegmentStore,
    term: str,
    boost: float,
    k: int,
    dl_lo: int | None = None,
    dl_hi: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``constant_score``: a filter context (term, optional dl range)
    whose every hit scores exactly ``boost`` — no BM25, no per-doc
    variation; ties resolve doc ASC like every ranking here."""
    d, _tf, dl = store.postings(term)
    docs = d.astype(np.int64)
    dls = dl.astype(np.int64)
    if dl_lo is not None:
        keep = dls >= dl_lo
        docs, dls = docs[keep], dls[keep]
    if dl_hi is not None:
        keep = dls <= dl_hi
        docs, dls = docs[keep], dls[keep]
    docs = np.sort(docs)
    return [(int(dd), float(boost)) for dd in docs[:k]]


PIN_BASE = 1.0e9  # ES uses float32-max-region scores; a finite stand-in


def pinned_topk(
    store: SegmentStore,
    text: str,
    pinned_ids: list[int],
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``pinned`` query: the given doc ids rank first IN ORDER
    (scores descending from ``PIN_BASE``, mirroring ES's float32-max
    ladder — the finite base is the documented divergence), organic BM25
    hits follow with pinned ids removed.  Pinned ids that don't exist in
    the index are skipped, duplicates keep their first slot (ES
    semantics)."""
    from ..functions.bm25 import sql_round

    seen: set[int] = set()
    pins: list[int] = []
    for p in pinned_ids:
        p = int(p)
        if 0 <= p < store.n_docs and p not in seen:
            seen.add(p)
            pins.append(p)
    out = [(p, PIN_BASE - i) for i, p in enumerate(pins)]
    if len(out) < k:
        d, s = _score_map(store, text)
        if round_decimals is not None:
            s = sql_round(s, round_decimals)
        from ..functions.bm25 import topk_order

        order = topk_order(s, d, k + len(pins))
        for i in order:
            doc = int(d[i])
            if doc in seen:
                continue
            out.append((doc, float(s[i])))
            if len(out) >= k:
                break
    return out[:k]


def rule_query(
    store: SegmentStore,
    text: str,
    ruleset: list[dict],
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES *query rules* (`PUT _query_rules/<ruleset>` + the ``rule``
    retriever): each rule carries CRITERIA over the query metadata and an
    action — ``pinned`` ids promoted to the top in rule order, or
    ``excluded`` ids dropped from the organic ranking.

    A rule applies when ALL its criteria match the metadata (here
    ``{"query_string": text}``); supported criterion types are ES's
    ``always`` / ``exact`` / ``contains`` / ``prefix``.  Matched pins use
    the same descending ``PIN_BASE`` ladder as :func:`pinned_topk`
    (first rule's pins first, duplicates keep their first slot); matched
    exclusions remove docs from the organic BM25 tail.  A doc both pinned
    and excluded stays pinned — the pin action is the more specific rule,
    matching ES's pinned-wins behavior.  Unknown criterion types raise
    like ES's ruleset validation."""
    from ..functions.bm25 import sql_round, topk_order

    meta = {"query_string": text}
    pins: list[int] = []
    seen: set[int] = set()
    excl: set[int] = set()
    for rule in ruleset:
        ok = True
        for c in rule.get("criteria", []):
            ctype = c.get("type", "always")
            mv = meta.get(c.get("metadata", "query_string"), "")
            vals = c.get("values", [])
            if ctype == "always":
                continue
            if ctype == "exact":
                ok = mv in vals
            elif ctype == "contains":
                ok = any(v in mv for v in vals)
            elif ctype == "prefix":
                ok = any(mv.startswith(v) for v in vals)
            else:
                raise ValueError(f"rule_query: unknown criterion type {ctype!r}")
            if not ok:
                break
        if not ok:
            continue
        for p in rule.get("pinned", []):
            p = int(p)
            if 0 <= p < store.n_docs and p not in seen:
                seen.add(p)
                pins.append(p)
        excl.update(int(x) for x in rule.get("excluded", []))
    excl -= seen  # pinned wins over excluded
    out = [(p, PIN_BASE - i) for i, p in enumerate(pins)]
    if len(out) < k:
        d, s = _score_map(store, text)
        if round_decimals is not None:
            s = sql_round(s, round_decimals)
        order = topk_order(s, d, k + len(pins) + len(excl))
        for i in order:
            doc = int(d[i])
            if doc in seen or doc in excl:
                continue
            out.append((doc, float(s[i])))
            if len(out) >= k:
                break
    return out[:k]


def simple_query_string_topk(
    store: SegmentStore,
    qstr: str,
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``simple_query_string`` (flags ``AND|NOT|OR``, the +/-/plain
    token subset): ``+tok`` → must, ``-tok`` → must_not, plain → should —
    then the standard bool combinator (with must present, should terms
    are optional scorers; duplicate clauses collapse, a term both must
    and should keeps only must).  Unsupported syntax (quotes, ``*``,
    ``|``, parentheses) raises rather than mis-parsing."""
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    for raw in qstr.split():
        if any(c in raw for c in '"*|()'):
            raise ValueError(f"unsupported simple_query_string syntax: {raw!r}")
        if raw in ("+", "-"):
            raise ValueError(f"dangling operator: {raw!r}")
        if raw.startswith("+"):
            must.extend(tokenize_query(raw[1:]))
        elif raw.startswith("-"):
            must_not.extend(tokenize_query(raw[1:]))
        else:
            should.extend(tokenize_query(raw))
    should = [t for t in should if t not in set(must)]
    return bool_topk(
        store,
        must=tuple(must),
        should=tuple(should),
        must_not=tuple(must_not),
        k=k,
        minimum_should_match=0,
        round_decimals=round_decimals,
    )


_RANDOM_MULT = 2654435761  # Knuth multiplicative hash constant
_RANDOM_MOD = 1 << 31


def random_score_topk(
    store: SegmentStore,
    term: str,
    seed: int,
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``function_score`` with ``random_score`` (seeded on a field →
    DETERMINISTIC, like ES's seed+field mode), boost_mode ``replace``:
    every doc matching the term filter scores
    ``(((doc_id + seed)·2654435761) mod 2³¹) / 2³¹`` — a documented
    multiplicative-hash stand-in for Lucene's murmur3.  The seed offsets
    the hash input, so seed s+1 assigns doc d the score seed s gave
    d+1 — per-seed rankings are distinct shifted assignments, NOT
    independent permutations (Weyl-sequence-grade randomness is all the
    deterministic oracle contract needs).  Exact integer arithmetic,
    mirrored by the SQL oracle bit-for-bit."""
    from ..functions.bm25 import sql_round, topk_order

    d = np.unique(store.postings(term)[0]).astype(np.int64)
    if len(d) == 0:
        return []
    score = (((d + seed) * _RANDOM_MULT) % _RANDOM_MOD) / float(_RANDOM_MOD)
    if round_decimals is not None:
        score = sql_round(score, round_decimals)
    order = topk_order(score, d.astype(np.uint64), k)
    return [(int(d[i]), float(score[i])) for i in order]


def sparse_vector_topk(
    store: SegmentStore,
    weights: dict[str, float],
    k: int,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``sparse_vector`` query (the rank_features / learned-sparse
    retrieval shape, ELSER-style): per-doc stored feature weights dotted
    with query term weights.  The deterministic doc-side feature is
    ``tf(t,d) / dl(d)`` — the normalized term frequency the index already
    holds — so score(d) = Σ_t w_t · tf_td / dl_d.  No idf, no length
    saturation: pure dot product, like Lucene's rank_features scorer."""
    from ..functions.bm25 import sql_round, topk_order

    doc_parts, score_parts = [], []
    for t in sorted(weights):
        w = float(weights[t])
        d, tf, dl = store.postings(t)
        if len(d) == 0:
            continue
        doc_parts.append(d)
        score_parts.append(w * tf.astype(np.float64) / dl.astype(np.float64))
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    final = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(final, inv, np.concatenate(score_parts))
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def post_filter_search(
    store: SegmentStore,
    text: str,
    k: int,
    lang_of: dict[int, str],
    filter_lang: str,
    round_decimals: int | None = None,
) -> tuple[list[tuple[int, float, int]], list[tuple[str, int]]]:
    """ES ``post_filter`` + ``track_total_hits`` (the faceted-search
    contract): the match query drives BOTH the hits and the aggregations,
    but ``post_filter`` applies to the HITS ONLY — the lang facet keeps
    counting every matching doc so all filter options stay visible while
    the hit list shows one lang.  ``hits.total`` counts the POST-filtered
    matches (the filter is part of what the user sees as "hits").

    Returns ``(hits, aggs)``: hits = top-k ``(doc_id, score, total_hits)``
    among matches with ``lang_of[doc] == filter_lang``, ranked on the
    rounded score; aggs = ``(lang, doc_count)`` over the UNFILTERED
    matches, sorted by lang.

    ``lang_of`` is the doc-values column (forward-map lang, read once per
    store — the per-actor analog of the dl array the postings already
    carry; at cluster scale it rides the owning actor's partition).
    """
    from ..functions.bm25 import sql_round, topk_order

    uniq, scores = _score_map(store, text)
    if len(uniq) == 0:
        return [], []
    langs = np.array([lang_of[int(d)] for d in uniq])
    agg_langs, agg_counts = np.unique(langs, return_counts=True)
    aggs = [(str(l), int(c)) for l, c in zip(agg_langs, agg_counts)]
    mask = langs == filter_lang
    f_docs, f_scores = uniq[mask], scores[mask]
    total = int(mask.sum())
    if round_decimals is not None:
        f_scores = sql_round(f_scores, round_decimals)
    order = topk_order(f_scores, f_docs, k)
    hits = [(int(f_docs[i]), float(f_scores[i]), total) for i in order]
    return hits, aggs


def named_queries_topk(
    store: SegmentStore,
    text: str,
    k: int,
    min_score: float = 0.0,
    round_decimals: int | None = None,
) -> list[tuple[int, float, str]]:
    """ES named queries + ``min_score``: each query term is a named
    ``should`` clause (``_name`` = the term itself); every hit reports
    ``matched_queries`` — the comma-joined sorted names of the clauses
    that matched it — and hits whose ROUNDED score falls below
    ``min_score`` are dropped before ranking (ES applies min_score to the
    final hit score, after boosting, before pagination).

    One pass over the per-term posting arrays: the concatenated doc/term
    stream sorted by (doc, term) yields both the score accumulation and
    the matched-name runs without a per-doc Python loop over postings.
    """
    from ..functions.bm25 import sql_round, tf_norm, topk_order

    terms = sorted(set(tokenize_query(text)))
    doc_parts, contrib_parts, term_idx_parts = [], [], []
    kept_terms: list[str] = []
    for term in terms:
        df_t = store.td.df_of(term)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(term)
        if len(d) == 0:
            continue
        ti = len(kept_terms)
        kept_terms.append(term)
        doc_parts.append(d)
        contrib_parts.append(
            float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
        )
        term_idx_parts.append(np.full(len(d), ti, dtype=np.int64))
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    contribs = np.concatenate(contrib_parts)
    tidx = np.concatenate(term_idx_parts)
    # sort by (doc, term index): scores sum per run, names join per run
    order = np.lexsort((tidx, docs))
    docs, contribs, tidx = docs[order], contribs[order], tidx[order]
    head = np.concatenate(([True], docs[1:] != docs[:-1]))
    starts = np.flatnonzero(head)
    uniq = docs[starts]
    scores = np.add.reduceat(contribs, starts)
    name_runs = np.split(tidx, starts[1:])
    matched = [",".join(kept_terms[i] for i in run) for run in name_runs]
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    keep = scores >= min_score
    uniq, scores = uniq[keep], scores[keep]
    matched = [m for m, kp in zip(matched, keep) if kp]
    top = topk_order(scores, uniq, k)
    return [(int(uniq[i]), float(scores[i]), matched[i]) for i in top]


def highlight_fragments(
    store: SegmentStore, term: str, n_frags: int = 3, width: int = 3
) -> list[tuple[int, int, int, int, int]]:
    """ES ``highlight`` with ``number_of_fragments``: per matching doc the
    first ``n_frags`` occurrences of the term, each with its ±``width``
    token window clipped to the doc →
    [(doc_id, frag_rank, pos, snip_start, snip_end)].

    Fully vectorized off the positional index: posting k's occurrence
    slice is ``flat[cum_tf[k] : cum_tf[k] + min(tf_k, n)]`` — the
    concatenated ranges build with one repeat + cumsum-offset arange, no
    per-doc Python.  Fragments are reported as located (ES's fragmenter
    markup/merging is presentation)."""
    if n_frags < 1:
        raise ValueError("n_frags must be >= 1")
    d, tf, flat = store.postings_positions(term)
    if not len(d):
        return []
    tf64 = tf.astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(tf64)[:-1]))
    take = np.minimum(tf64, n_frags)
    # concatenated ranges: for posting k, starts[k] + [0..take[k])
    total = int(take.sum())
    reps = np.repeat(starts, take)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(take) - take, take
    )
    pos = flat[reps + offs].astype(np.int64)
    docs = np.repeat(d, take).astype(np.int64)
    ranks = offs + 1
    dls = np.repeat(store.postings(term)[2].astype(np.int64), take)
    lo = np.maximum(pos - width, 0)
    hi = np.minimum(pos + width, dls - 1)
    return [
        (int(a), int(r), int(p), int(l), int(h))
        for a, r, p, l, h in zip(docs, ranks, pos, lo, hi)
    ]


def synonym_match_topk(
    store: SegmentStore,
    groups: list[list[str]],
    k: int,
    round_decimals: int = 6,
) -> list[tuple[int, float]]:
    """ES ``match`` under a search-time ``synonym_graph`` filter — Lucene
    ``SynonymQuery`` semantics: each synonym GROUP scores as one pseudo
    term whose per-doc tf is the SUM over member tfs and whose df is the
    MAX member df (Lucene's blended statistics), so adding synonyms never
    double-counts idf.  Scores sum across groups, rank on the rounded
    score, ties doc ASC — the shared ranking contract.

    Groups resolve against the footer-pruned dictionary exactly like
    plain terms; a group with no indexed member contributes nothing (ES:
    the SynonymQuery matches no docs)."""
    from ..functions.bm25 import idf, sql_round, tf_norm, topk_order

    docs_l: list[np.ndarray] = []
    contrib_l: list[np.ndarray] = []
    for group in groups:
        members = sorted(set(group))
        d_l, tf_l, dl_l, dfs = [], [], [], []
        for t in members:
            df_t = store.td.df_of(t)
            if df_t == 0:
                continue
            d, tf, dl = store.postings(t)
            if len(d) == 0:
                continue
            dfs.append(df_t)
            d_l.append(d.astype(np.int64))
            tf_l.append(tf.astype(np.float64))
            dl_l.append(dl.astype(np.float64))
        if not dfs:
            continue
        d_all = np.concatenate(d_l)
        uniq, inv = np.unique(d_all, return_inverse=True)
        tf_sum = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tf_sum, inv, np.concatenate(tf_l))
        dl_u = np.zeros(len(uniq), dtype=np.float64)
        dl_u[inv] = np.concatenate(dl_l)  # same dl for every member hit
        contrib = float(idf(store.n_docs, max(dfs))) * tf_norm(
            tf_sum, dl_u, store.avgdl
        )
        docs_l.append(uniq)
        contrib_l.append(contrib)
    if not docs_l:
        return []
    all_docs = np.concatenate(docs_l)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, np.concatenate(contrib_l))
    scores = sql_round(scores, round_decimals)
    order = topk_order(scores, uniq.astype(np.uint64), k)
    return [(int(uniq[i]), float(scores[i])) for i in order]
