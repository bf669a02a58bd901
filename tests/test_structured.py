"""Structured-query operators: minimum_should_match, range-filtered BM25,
sort-by-field, positional highlighting (pipelines/structured.py)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_store(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    return docs, SegmentStore(res.out_dir)


def _pick_terms(store, n):
    vocab = sorted(store.df)
    return [vocab[(7 * i + 3) % len(vocab)] for i in range(n)]


def test_min_should_match_brute(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import min_should_match

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 3)))
    text = " ".join(terms)
    for m in (1, 2, len(terms)):
        got = min_should_match(store, text, m).tolist()
        want = sorted(
            i
            for i, d in enumerate(docs)
            if sum(t in d.split(" ") for t in terms) >= m
        )
        assert got == want, m
    # m > nt: empty; m == 1 equals boolean OR
    assert min_should_match(store, text, len(terms) + 1).tolist() == []
    with pytest.raises(ValueError):
        min_should_match(store, text, 0)


def test_range_filtered_topk_matches_filtered_taat(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.structured import range_filtered_topk

    docs, store = corpus_store
    text = " ".join(_pick_terms(store, 2))
    dls = [len(d.split(" ")) for d in docs]
    lo, hi = 8, 40
    got = range_filtered_topk(store, text, 10, lo, hi, round_decimals=6)
    # scores must equal the UNfiltered scores of the same docs (filter
    # context: range prunes candidates, never touches the score)
    full = dict(score_query(store, text, len(docs), round_decimals=6))
    want = sorted(
        ((d, s) for d, s in full.items() if lo <= dls[d] <= hi),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert [(int(d), s) for d, s in got] == want
    assert all(lo <= dls[int(d)] <= hi for d, _ in got)


def test_sort_by_field_topk(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import sort_by_field_topk

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 2)))
    text = " ".join(terms)
    dls = [len(d.split(" ")) for d in docs]
    match = [i for i, d in enumerate(docs) if any(t in d.split(" ") for t in terms)]
    for desc in (True, False):
        got = sort_by_field_topk(store, text, 7, descending=desc)
        want = sorted(
            ((i, dls[i]) for i in match),
            key=lambda kv: (-kv[1] if desc else kv[1], kv[0]),
        )[:7]
        assert got == want
    assert sort_by_field_topk(store, "zzzznone", 5) == []


def test_dis_max_combines_subquery_score_maps(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.structured import dis_max_topk

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 4)))
    texts = [" ".join(terms[0::2]), " ".join(terms[1::2])]
    tb = 0.3
    got = dis_max_topk(store, texts, 10, tie_breaker=tb, round_decimals=6)
    sub_maps = [dict(score_query(store, t, len(docs))) for t in texts]
    want = {}
    for d in set().union(*sub_maps):
        ss = [m[d] for m in sub_maps if d in m]
        want[d] = float(sql_round(max(ss) + tb * (sum(ss) - max(ss)), 6))
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect

    # tie_breaker=1 degrades to bool should (sum of all contributions) —
    # the sub-queries partition the terms, so sums must agree to 6 dp
    full = dict(score_query(store, " ".join(terms), len(docs), round_decimals=6))
    for d, s in dis_max_topk(store, texts, 10, tie_breaker=1.0, round_decimals=6):
        assert abs(full[d] - s) < 2e-6


def test_boosting_demotes_negative_matches(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.structured import boosting_topk

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 3)))
    pos, neg = " ".join(terms[:2]), terms[2]
    nb = 0.5
    got = boosting_topk(store, pos, neg, 10, negative_boost=nb, round_decimals=6)
    base = dict(score_query(store, pos, len(docs)))
    neg_docs = {i for i, d in enumerate(docs) if neg in d.split(" ")}
    want = {
        d: float(sql_round(s * nb if d in neg_docs else s, 6))
        for d, s in base.items()
    }
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    # the negative leg never excludes — hit set is exactly the positive's
    assert {d for d, _ in got} <= set(base)
    assert boosting_topk(store, "zzzznone", neg, 5) == []


@pytest.fixture(scope="module")
def pos_store(built, ray_session, tmp_path_factory):
    """Positional rebuild of the same sf0.001 corpus."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    _, _, corpus = built
    root = tmp_path_factory.mktemp("posidx_struct")
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(root / "idx"),
        num_partitions=4,
        with_positions=True,
    )
    res = build_index(cfg)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    return docs, SegmentStore(res.out_dir)


def test_highlight_first_brute(pos_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import highlight_first

    docs, store = pos_store
    vocab = sorted(store.df)
    for qi in (0, 5, 11):
        term = vocab[(17 * qi + 5) % len(vocab)]
        got = highlight_first(store, term, width=3)
        want = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            if term in toks:
                p = toks.index(term)
                want.append((i, p, max(p - 3, 0), min(p + 3, len(toks) - 1)))
        assert got == want


def test_highlight_multi_term_takes_earliest(pos_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import highlight_first

    docs, store = pos_store
    vocab = sorted(store.df)
    text = " ".join(sorted({vocab[3], vocab[19 % len(vocab)]}))
    got = dict((d, p) for d, p, _, _ in highlight_first(store, text, width=2))
    terms = set(text.split(" "))
    for i, d in enumerate(docs):
        toks = d.split(" ")
        pos = [toks.index(t) for t in terms if t in toks]
        if pos:
            assert got[i] == min(pos)
        else:
            assert i not in got


def test_bool_topk_composes_clauses(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.structured import bool_topk

    docs, store = corpus_store
    toks = [d.split(" ") for d in docs]
    dls = [len(t) for t in toks]
    terms = sorted(set(_pick_terms(store, 4)))
    must, should, neg = (terms[0],), tuple(terms[1:3]), terms[3]
    for msm, lo, hi in ((0, None, None), (1, 8, 40), (2, None, 60)):
        got = bool_topk(
            store, must=must, should=should, must_not=(neg,), k=10,
            dl_lo=lo, dl_hi=hi, minimum_should_match=msm, round_decimals=6,
        )
        cand = [
            i for i, t in enumerate(toks)
            if must[0] in t
            and sum(s in t for s in should) >= msm
            and neg not in t
            and (lo is None or dls[i] >= lo)
            and (hi is None or dls[i] <= hi)
        ]
        # score = full BM25 over must+should restricted to candidates
        full = dict(
            score_query(store, " ".join(sorted(set(must) | set(should))), len(docs))
        )
        want = sorted(
            ((d, float(sql_round(full[d], 6))) for d in cand),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        assert got == want, (msm, lo, hi)
    # pure-should bool: implicit minimum_should_match = 1 (ES)
    got = bool_topk(store, should=should, k=10, round_decimals=6)
    cand = [i for i, t in enumerate(toks) if any(s in t for s in should)]
    full = dict(score_query(store, " ".join(should), len(docs)))
    want = sorted(
        ((d, float(sql_round(full[d], 6))) for d in cand),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == want
    with pytest.raises(ValueError):
        bool_topk(store, must=(terms[0],), should=(terms[0],))
    assert bool_topk(store, must=("zzzznone",), should=should) == []


def test_wrapper_query_decodes_and_dispatches(corpus_store):
    import base64
    import json

    from bitcoin_ledger_2es_ray.pipelines.structured import bool_topk, wrapper_query

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 4)))

    def enc(obj) -> str:
        return base64.b64encode(json.dumps(obj).encode()).decode()

    body = {
        "bool": {
            "must": [{"term": {"text": terms[0]}}],
            "should": [{"term": {"text": t}} for t in terms[1:3]],
            "must_not": [{"term": {"text": terms[3]}}],
            "minimum_should_match": 1,
            "filter": [{"range": {"dl": {"gte": 8, "lte": 40}}}],
        }
    }
    assert wrapper_query(store, enc(body), k=10, round_decimals=6) == bool_topk(
        store, must=(terms[0],), should=tuple(terms[1:3]), must_not=(terms[3],),
        k=10, dl_lo=8, dl_hi=40, minimum_should_match=1, round_decimals=6,
    )
    # top-level match = analyzed OR of the tokens (implicit msm 1)
    assert wrapper_query(
        store, enc({"match": {"text": f"{terms[1]} {terms[2]}"}}), k=10,
        round_decimals=6,
    ) == bool_topk(store, should=tuple(terms[1:3]), k=10, round_decimals=6)
    # match CLAUSES analyze their text too
    assert wrapper_query(
        store,
        enc({"bool": {"should": [{"match": {"text": f"{terms[1]} {terms[2]}"}}]}}),
        k=10, round_decimals=6,
    ) == bool_topk(store, should=tuple(terms[1:3]), k=10, round_decimals=6)
    with pytest.raises(ValueError):
        wrapper_query(store, enc({"fuzzy": {"text": terms[0]}}))
    with pytest.raises(ValueError):
        wrapper_query(store, enc({"bool": {"must": [{"exists": {"field": "x"}}]}}))


def test_synonym_topk_blends_like_one_pseudo_term(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import idf, sql_round, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.query import score_query
    from bitcoin_ledger_2es_ray.pipelines.structured import synonym_topk

    docs, store = corpus_store
    toks = [d.split(" ") for d in docs]
    dls = [len(t) for t in toks]
    terms = sorted(set(_pick_terms(store, 4)))
    groups = [[terms[0], terms[1]], [terms[2]]]
    got = synonym_topk(store, groups, 10, round_decimals=6)
    want: dict[int, float] = {}
    for members in groups:
        df_g = max(sum(1 for t in toks if m in t) for m in members)
        w = float(idf(store.n_docs, df_g))
        for i, t in enumerate(toks):
            tf_sum = sum(t.count(m) for m in set(members))
            if tf_sum:
                import numpy as np

                c = w * float(
                    tf_norm(
                        np.array([float(tf_sum)]),
                        np.array([float(dls[i])]),
                        store.avgdl,
                    )[0]
                )
                want[i] = want.get(i, 0.0) + c
    expect = sorted(
        ((d, float(sql_round(s, 6))) for d, s in want.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect
    # a singleton group degrades exactly to the plain term query
    single = synonym_topk(store, [[terms[2]]], 10, round_decimals=6)
    assert single == score_query(store, terms[2], 10, round_decimals=6)
    # unknown-only group contributes nothing
    assert synonym_topk(store, [["zzzznone"]], 5) == []


# ---------------------------------------------------------------------------
# match_bool_prefix / constant_score / pinned / simple_query_string


def _bm25_map(store, text):
    from bitcoin_ledger_2es_ray.functions.bm25 import idf, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.query import tokenize_query

    want = {}
    for t in sorted(set(tokenize_query(text))):
        df_t = store.td.df_of(t)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(t)
        c = float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
        for dd, cc in zip(d.tolist(), c.tolist()):
            want[dd] = want.get(dd, 0.0) + cc
    return want


def test_match_bool_prefix_bruteforce(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.structured import match_bool_prefix_topk

    docs, store = corpus_store
    vocab = sorted(store.df)
    lead = f"{vocab[2]} {vocab[9 % len(vocab)]}"
    prefix = vocab[5 % len(vocab)][:2]
    got = match_bool_prefix_topk(store, f"{lead} {prefix}", 10, round_decimals=6)
    want = _bm25_map(store, lead)
    for i, text in enumerate(docs):
        if any(tok.startswith(prefix) for tok in text.split()):
            want[i] = want.get(i, 0.0) + 1.0
    expect = sorted(
        ((d, float(sql_round(s, 6))) for d, s in want.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect


def test_constant_score_filter_and_boost(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import constant_score_topk

    docs, store = corpus_store
    term = sorted(store.df)[3]
    got = constant_score_topk(store, term, boost=2.5, k=5, dl_lo=4, dl_hi=60)
    d, _tf, dl = store.postings(term)
    keep = sorted(int(x) for x, l in zip(d, dl) if 4 <= l <= 60)[:5]
    assert got == [(x, 2.5) for x in keep]


def test_pinned_order_and_exclusion(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.structured import PIN_BASE, pinned_topk

    docs, store = corpus_store
    vocab = sorted(store.df)
    text = f"{vocab[0]} {vocab[4 % len(vocab)]}"
    organic = sorted(
        ((d, float(sql_round(s, 6))) for d, s in _bm25_map(store, text).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    pins = [organic[0][0], 9999999, organic[0][0], 1]  # dup + missing id
    got = pinned_topk(store, text, pins, 6, round_decimals=6)
    assert got[0] == (organic[0][0], PIN_BASE)
    assert got[1] == (1, PIN_BASE - 1)
    rest = [x for x in organic if x[0] not in (organic[0][0], 1)][:4]
    assert got[2:] == rest


def test_rule_query_applies_matched_rules_only(corpus_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.structured import PIN_BASE, rule_query

    docs, store = corpus_store
    vocab = sorted(store.df)
    text = f"{vocab[0]} {vocab[4 % len(vocab)]}"
    organic = sorted(
        ((d, float(sql_round(s, 6))) for d, s in _bm25_map(store, text).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    top_doc = organic[0][0]
    second = organic[1][0]
    ruleset = [
        # matches (query contains vocab[0]) → pin doc 2
        {"criteria": [{"type": "contains", "values": [vocab[0]]}], "pinned": [2]},
        # never matches → its pin must NOT appear
        {"criteria": [{"type": "exact", "values": ["nope"]}], "pinned": [0]},
        # matches (prefix) → exclude the top organic doc
        {"criteria": [{"type": "prefix", "values": [vocab[0][:2]]}],
         "excluded": [top_doc]},
        # always → exclude doc 2 as well, but it is pinned: pin wins
        {"criteria": [{"type": "always"}], "excluded": [2]},
    ]
    got = rule_query(store, text, ruleset, 5, round_decimals=6)
    assert got[0] == (2, PIN_BASE)
    assert all(d != top_doc for d, _ in got)
    assert all(d != 0 or s < PIN_BASE - 10 for d, s in got)  # inert rule
    rest = [x for x in organic if x[0] not in (2, top_doc)][:4]
    assert got[1:] == rest
    assert second in [d for d, _ in got]
    with pytest.raises(ValueError):
        rule_query(store, text, [{"criteria": [{"type": "fuzzy"}]}], 5)


def test_simple_query_string_parser(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        bool_topk,
        simple_query_string_topk,
    )

    docs, store = corpus_store
    v = sorted(store.df)
    qstr = f"{v[0]} +{v[3]} -{v[7 % len(v)]}"
    got = simple_query_string_topk(store, qstr, 10, round_decimals=6)
    want = bool_topk(
        store, must=(v[3],), should=(v[0],), must_not=(v[7 % len(v)],),
        k=10, minimum_should_match=0, round_decimals=6,
    )
    assert got == want
    # duplicate must/should collapses instead of raising
    assert simple_query_string_topk(store, f"{v[3]} +{v[3]}", 5, round_decimals=6)
    with pytest.raises(ValueError):
        simple_query_string_topk(store, 'a "quoted phrase"', 5)
    with pytest.raises(ValueError):
        simple_query_string_topk(store, "a + b", 5)


def test_field_caps_types(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.apis import field_caps

    t = field_caps("/root/testdata/sf0.001", table="documents")
    m = {f: ty for f, ty in zip(t["field"].to_pylist(), t["es_type"].to_pylist())}
    assert m == {
        "doc_id": "long", "text": "text", "lang": "keyword",
        "source": "keyword", "n_chars": "long",
    }
    agg = dict(zip(t["field"].to_pylist(), t["aggregatable"].to_pylist()))
    assert agg["text"] is False and agg["lang"] is True


def test_random_score_deterministic_and_uniform(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        _RANDOM_MOD,
        _RANDOM_MULT,
        random_score_topk,
    )

    docs, store = corpus_store
    term = sorted(store.df)[0]
    a = random_score_topk(store, term, seed=7, k=5, round_decimals=6)
    b = random_score_topk(store, term, seed=7, k=5, round_decimals=6)
    assert a == b and len(a) == 5
    c = random_score_topk(store, term, seed=8, k=5, round_decimals=6)
    assert a != c  # seed changes the permutation
    d0 = a[0][0]
    want = round((((d0 + 7) * _RANDOM_MULT) % _RANDOM_MOD) / _RANDOM_MOD, 6)
    assert a[0][1] == pytest.approx(want, abs=1e-9)


def test_runtime_field_sort_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.apis import runtime_field_sort

    sf = "/root/testdata/sf0.001"
    t = runtime_field_sort(sf, k=10)
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text", "n_chars"])
    rows = [
        (d, round(nc / len(txt.split(" ")), 6))
        for d, txt, nc in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["n_chars"].to_pylist()
        )
    ]
    want = sorted(rows, key=lambda r: (-r[1], r[0]))[:10]
    got = list(zip(t["doc_id"].to_pylist(), t["chars_per_word"].to_pylist()))
    assert got == want
    assert t["rank"].to_pylist() == list(range(1, 11))


def test_sparse_vector_dot_product(corpus_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import sparse_vector_topk

    docs, store = corpus_store
    v = sorted(store.df)
    weights = {v[0]: 2.0, v[4 % len(v)]: 0.5}
    got = sparse_vector_topk(store, weights, 10, round_decimals=6)
    want = {}
    for t, w in weights.items():
        d, tf, dl = store.postings(t)
        for dd, tt, ll in zip(d.tolist(), tf.tolist(), dl.tolist()):
            want[dd] = want.get(dd, 0.0) + w * tt / ll
    expect = sorted(
        ((d, round(s, 6)) for d, s in want.items()), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert [(d, round(s, 6)) for d, s in got] == expect


def test_post_filter_hits_vs_brute(corpus_store, built):
    """post_filter: aggs over ALL matches, hits/total over the filtered set."""
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        _score_map,
        post_filter_search,
    )

    res, _, _ = built
    fwd = pq.read_table(res.out_dir + "/forward_map", columns=["doc_id", "lang"])
    lang_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["lang"].to_pylist()))
    docs, store = corpus_store
    text = " ".join(_pick_terms(store, 3))
    for lang in ("en", "zh"):
        hits, aggs = post_filter_search(store, text, 5, lang_of, lang, round_decimals=6)
        uniq, scores = _score_map(store, text)
        scores = np.round(scores, 6)
        # aggs ignore the filter: per-lang counts over every match
        import collections

        want_aggs = sorted(
            collections.Counter(lang_of[int(d)] for d in uniq).items()
        )
        assert aggs == [(l, c) for l, c in want_aggs]
        # hits: filtered, ranked (score DESC, doc ASC), total = filtered count
        filt = [(int(d), float(s)) for d, s in zip(uniq, scores) if lang_of[int(d)] == lang]
        filt.sort(key=lambda t: (-t[1], t[0]))
        assert [(d, s) for d, s, _ in hits] == filt[:5]
        assert all(tot == len(filt) for _, _, tot in hits)


def test_named_queries_matched_and_min_score(corpus_store):
    """matched_queries = sorted matching clause names; min_score drops
    rounded-below hits before ranking."""
    from bitcoin_ledger_2es_ray.functions.bm25 import idf, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.structured import named_queries_topk

    docs, store = corpus_store
    terms = sorted(set(_pick_terms(store, 3)))
    text = " ".join(terms)
    # brute force: per-doc score + matched set from the raw postings
    per_doc: dict[int, float] = {}
    matched: dict[int, list[str]] = {}
    for t in terms:
        d, tf, dl = store.postings(t)
        contribs = float(idf(store.n_docs, store.td.df_of(t))) * tf_norm(
            tf, dl, store.avgdl
        )
        for di, c in zip(d.tolist(), contribs.tolist()):
            per_doc[di] = per_doc.get(di, 0.0) + c
            matched.setdefault(di, []).append(t)
    rows = sorted(
        ((d, round(s, 6), ",".join(sorted(matched[d]))) for d, s in per_doc.items()),
        key=lambda r: (-r[1], r[0]),
    )
    for ms in (0.0, 0.5, 2.0):
        want = [r for r in rows if r[1] >= ms][:10]
        got = named_queries_topk(store, text, 10, min_score=ms, round_decimals=6)
        assert got == want
    # a min_score above every score returns nothing
    assert named_queries_topk(store, text, 10, min_score=1e9, round_decimals=6) == []


def test_highlight_fragments_brute_force(ray_session):
    """First-N occurrence windows equal a direct positional replay; rank 1
    equals highlight_first's fragment."""
    import random

    import pyarrow as pa
    import pytest as _pt

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        highlight_first,
        highlight_fragments,
    )

    rng = random.Random(31)
    words = ["ant", "bee", "cat", "dog", "elk"]
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(8, 20)))
        for _ in range(60)
    ]
    import tempfile, os

    root = tempfile.mkdtemp()
    corpus = os.path.join(root, "corpus.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * len(docs),
                "path": [f"p{i}" for i in range(len(docs))],
                "commit": ["c"] * len(docs),
                "lang": ["en"] * len(docs),
                "content": docs,
            }
        ),
        corpus,
        row_group_size=16,
    )
    res = build_index(
        BuildConfig(
            corpus=corpus, out_dir=os.path.join(root, "idx"),
            num_partitions=4, with_positions=True, sketch_stride=1,
        )
    )
    store = SegmentStore(res.out_dir)
    for term in words:
        frags = highlight_fragments(store, term, n_frags=2, width=3)
        want = []
        for i, text in enumerate(docs):
            ws = text.split(" ")
            occ = [p for p, w in enumerate(ws) if w == term][:2]
            for r, p in enumerate(occ, 1):
                want.append((i, r, p, max(p - 3, 0), min(p + 3, len(ws) - 1)))
        assert sorted(frags) == sorted(want), term
        first = {(d, p, lo, hi) for d, p, lo, hi in highlight_first(store, term)}
        assert {(d, p, lo, hi) for d, r, p, lo, hi in frags if r == 1} == first
    with _pt.raises(ValueError):
        highlight_fragments(store, "ant", n_frags=0)


def test_synonym_match_blended_stats(built):
    """Lucene SynonymQuery: tf sums over the group, df = MAX member df —
    brute force over the oracle postings; singleton group == plain term."""
    import numpy as np

    from bitcoin_ledger_2es_ray.functions.bm25 import idf, sql_round, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import synonym_match_topk

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(oracle.postings)
    g = [vocab[0], vocab[1]]
    got = synonym_match_topk(store, [g], k=10)
    # brute force
    tf_by_doc: dict[int, float] = {}
    for t in g:
        for row, tf in oracle.postings[t].items():
            d = int(oracle.doc_ids[row])
            tf_by_doc[d] = tf_by_doc.get(d, 0.0) + tf
    df_g = max(len(oracle.postings[t]) for t in g)
    dl_of = {int(oracle.doc_ids[i]): float(oracle.dl[i]) for i in range(len(oracle.dl))}
    avgdl = float(oracle.dl.sum()) / len(oracle.dl)
    scored = sorted(
        (
            (d, float(sql_round(idf(len(oracle.dl), df_g) * tf_norm(np.float64(tf), np.float64(dl_of[d]), avgdl), 6)))
            for d, tf in tf_by_doc.items()
        ),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    assert got == scored
    # singleton group reduces to the plain term query
    s1 = synonym_match_topk(store, [[vocab[0]]], k=5)
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    assert s1 == score_query(store, vocab[0], 5, round_decimals=6)


def test_synonym_match_randomized_groups(built):
    """Randomized multi-group synonym queries vs a NumPy brute force over
    the oracle postings (blended stats per group, sum across groups)."""
    import hashlib

    import numpy as np

    from bitcoin_ledger_2es_ray.functions.bm25 import idf, sql_round, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import synonym_match_topk

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(oracle.postings)
    dl_of = {int(oracle.doc_ids[i]): float(oracle.dl[i]) for i in range(len(oracle.dl))}
    avgdl = float(oracle.dl.sum()) / len(oracle.dl)
    n_docs = len(oracle.dl)
    for trial in range(6):
        # deterministic pseudo-random groups off sha256
        def pick(j):
            h = int(hashlib.sha256(f"{trial}:{j}".encode()).hexdigest(), 16)
            return vocab[h % len(vocab)]

        groups = [[pick(3 * g), pick(3 * g + 1), pick(3 * g + 2)][: 1 + g % 3]
                  for g in range(1 + trial % 3)]
        got = synonym_match_topk(store, groups, k=7)
        acc: dict[int, float] = {}
        for group in groups:
            members = sorted(set(group))
            tf_by: dict[int, float] = {}
            dfs = []
            for t in members:
                pl = oracle.postings.get(t)
                if not pl:
                    continue
                dfs.append(len(pl))
                for row, tf in pl.items():
                    d = int(oracle.doc_ids[row])
                    tf_by[d] = tf_by.get(d, 0.0) + tf
            if not dfs:
                continue
            w = float(idf(n_docs, max(dfs)))
            for d, tf in tf_by.items():
                acc[d] = acc.get(d, 0.0) + w * float(
                    tf_norm(np.float64(tf), np.float64(dl_of[d]), avgdl)
                )
        exp = sorted(
            ((d, float(sql_round(s, 6))) for d, s in acc.items()),
            key=lambda r: (-r[1], r[0]),
        )[:7]
        assert got == exp, (trial, groups)
