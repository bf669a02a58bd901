"""JSON _search body compiler (pipelines/search_api.py): every compiled
shape must equal the direct kernel it delegates to."""

from __future__ import annotations

import numpy as np
import pytest

from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
from bitcoin_ledger_2es_ray.pipelines.search_api import run_search


@pytest.fixture(scope="module")
def store(built):
    res, _, _ = built
    return SegmentStore(res.out_dir)


def _pairs(t):
    return list(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))


def test_search_match_equals_score_query(built, store):
    _, oracle, _ = built
    text = " ".join(sorted(oracle.postings)[:2])
    got = run_search(store, {"query": {"match": {"content": text}}, "size": 10})
    assert _pairs(got) == score_query(store, text, 10, round_decimals=6)
    assert got["rank"].to_pylist() == list(range(1, got.num_rows + 1))


def test_search_from_pagination(built, store):
    _, oracle, _ = built
    text = sorted(oracle.postings)[0]
    full = run_search(store, {"query": {"match": {"content": text}}, "size": 20})
    page2 = run_search(
        store, {"query": {"match": {"content": text}}, "size": 10, "from": 10}
    )
    assert _pairs(page2) == _pairs(full)[10:20]
    assert page2["rank"].to_pylist() == list(range(11, 11 + page2.num_rows))


def test_search_bool_equals_bool_topk(built, store):
    from bitcoin_ledger_2es_ray.pipelines.structured import bool_topk

    _, oracle, _ = built
    v = sorted(oracle.postings)
    body = {
        "query": {"bool": {
            "must": [{"term": {"content": v[0]}}],
            "should": [{"term": {"content": v[1]}}],
            "must_not": [{"term": {"content": v[2]}}],
        }},
        "size": 10,
    }
    got = run_search(store, body)
    want = bool_topk(
        store, must=(v[0],), should=(v[1],), must_not=(v[2],), k=10,
        round_decimals=6,
    )
    assert _pairs(got) == want


def test_search_constant_score_and_dis_max(built, store):
    _, oracle, _ = built
    v = sorted(oracle.postings)
    cs = run_search(
        store,
        {"query": {"constant_score": {
            "filter": {"term": {"content": v[0]}}, "boost": 2.5,
        }}, "size": 5},
    )
    assert all(s == 2.5 for _, s in _pairs(cs))
    assert set(d for d, _ in _pairs(cs)) <= set(oracle.doc_ids[list(oracle.postings[v[0]])])
    # dis_max with tie_breaker 0 == max of legs
    dm = run_search(
        store,
        {"query": {"dis_max": {"queries": [
            {"term": {"content": v[0]}}, {"term": {"content": v[1]}},
        ], "tie_breaker": 0.0}}, "size": 8},
    )
    a = dict(score_query(store, v[0], store.n_docs, round_decimals=None) or [])
    b = dict(score_query(store, v[1], store.n_docs, round_decimals=None) or [])
    for d, s in _pairs(dm):
        assert abs(s - round(max(a.get(d, 0.0), b.get(d, 0.0)), 6)) < 1e-9


@pytest.fixture(scope="module")
def pos_store(ray_session, tmp_path_factory):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index

    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12)))
        for _ in range(40)
    ]
    root = tmp_path_factory.mktemp("sapi")
    corpus = str(root / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * len(docs), "path": [f"p{i}" for i in range(len(docs))],
                "commit": ["c"] * len(docs), "lang": ["en"] * len(docs),
                "content": docs,
            }
        ),
        corpus, row_group_size=16,
    )
    res = build_index(BuildConfig(
        corpus=corpus, out_dir=str(root / "idx"), num_partitions=2,
        with_positions=True, head_df_ratio=0.5, n_salt=2, sketch_stride=1,
    ))
    return SegmentStore(res.out_dir)


def test_search_phrase_prefix_intervals(pos_store):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_topk, prefix_match

    ph = run_search(
        pos_store, {"query": {"match_phrase": {"content": "alpha beta"}}, "size": 5}
    )
    want = phrase_topk(pos_store, "alpha beta", 5, round_decimals=6)
    assert _pairs(ph) == want
    pf = run_search(pos_store, {"query": {"prefix": {"content": "ga"}}, "size": 5})
    assert all(s == 1.0 for _, s in _pairs(pf))
    docs = prefix_match(pos_store, "ga")
    assert [d for d, _ in _pairs(pf)] == sorted(docs.tolist())[:5]
    iv = run_search(
        pos_store,
        {"query": {"intervals": {"content": {
            "match": {"query": "alpha gamma", "ordered": True, "max_gaps": 5},
        }}}, "size": 5},
    )
    assert all(s == 1.0 for _, s in _pairs(iv))
    assert iv.num_rows > 0


def test_search_rejections(store):
    with pytest.raises(ValueError):
        run_search(store, {"size": 5})
    with pytest.raises(ValueError):
        run_search(store, {"query": {"bogus": {}}})
    with pytest.raises(ValueError):
        run_search(store, {"query": {"match": {"content": "x"}}, "size": -1})
    with pytest.raises(ValueError):
        run_search(store, {"query": {"match": {"a": 1, "b": 2}}})


def test_search_aggs_terms_over_hits(built, store):
    import duckdb

    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search_aggs

    res, oracle, _ = built
    text = sorted(oracle.postings)[0]
    r = run_search_aggs(
        res.out_dir,
        store,
        {"query": {"match": {"content": text}}, "size": 10,
         "aggs": {"langs": {"terms": {"field": "lang"}}}},
    )
    hits = r["hits"]
    langs = r["langs"]
    # ES contract: aggs run over the FULL query hit set, ignoring the
    # size/from pagination applied to hits
    full = score_query(store, text, store.n_docs, round_decimals=6)
    assert hits.num_rows == 10 < len(full)
    assert int(sum(langs["doc_count"].to_pylist())) == len(full)
    # against the forward map directly
    con = duckdb.connect()
    ids = [d for d, _ in full]
    want = con.sql(
        f"""SELECT lang, count(*) FROM read_parquet(
            '/root/testdata/sf0.001/documents.parquet')
            WHERE doc_id IN ({','.join(map(str, ids))}) GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    got = sorted(zip(langs["lang"].to_pylist(), langs["doc_count"].to_pylist()))
    assert got == [(l, int(n)) for l, n in want]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_search_aggs(
            res.out_dir, store,
            {"query": {"match": {"content": text}},
             "aggs": {"x": {"bogus": {}}}},
        )


def test_search_ids_and_range(built, store):
    _, oracle, _ = built
    ids = [int(oracle.doc_ids[0]), int(oracle.doc_ids[5]), 10**9]
    r = run_search(store, {"query": {"ids": {"values": ids}}, "size": 10})
    # constant score, only the requested ids (missing one included as an
    # id literal — it simply never matches a stored doc in the hit join;
    # ES also scores only by membership here)
    assert all(s == 1.0 for s in r["score"].to_pylist())
    # the nonexistent id is NOT found (ES contract)
    assert set(r["doc_id"].to_pylist()) == {ids[0], ids[1]}
    # range on dl as a bool filter context
    dl_of = {int(oracle.doc_ids[i]): int(oracle.dl[i]) for i in range(len(oracle.dl))}
    lo, hi = 5, 40
    text = sorted(oracle.postings)[0]
    b = run_search(
        store,
        {"query": {"bool": {
            "must": [{"match": {"content": text}}],
            "filter": [{"range": {"dl": {"gte": lo, "lte": hi}}}],
        }}, "size": 50},
    )
    full = score_query(store, text, store.n_docs, round_decimals=6)
    want = [(d, s) for d, s in full if lo <= dl_of[d] <= hi]
    got = list(zip(b["doc_id"].to_pylist(), b["score"].to_pylist()))
    assert got == sorted(want, key=lambda r_: (-r_[1], r_[0]))[:50]


def test_search_bool_filter_only_scores_zero(built, store):
    _, oracle, _ = built
    v = sorted(oracle.postings)
    r = run_search(
        store,
        {"query": {"bool": {"filter": [{"term": {"content": v[0]}}]}}, "size": 8},
    )
    docs = sorted(int(oracle.doc_ids[row]) for row in oracle.postings[v[0]])
    assert r["doc_id"].to_pylist() == docs[:8]
    assert all(s == 0.0 for s in r["score"].to_pylist())
    with pytest.raises(ValueError):
        run_search(store, {"query": {"bool": {}}})


def test_search_body_fuzz_never_crashes(store):
    """Random/mutated _search bodies must either return a table or raise
    the clean ValueError refusal — never leak internal exception types."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    leaf = st.sampled_from([
        {"match": {"content": "scan"}},
        {"term": {"content": "window"}},
        {"prefix": {"content": "sc"}},
        {"ids": {"values": [1, 2]}},
        {"range": {"dl": {"gte": 1}}},
        {"range": {"dl": {"gt": 3, "lt": 50}}},
        {"range": {"dl": {"bogus": 1}}},
        {"bogus": {}},
        {"match": {}},
        {"match": {"a": "x", "b": "y"}},
        {"match": {"content": {"query": "scan window", "operator": "and"}}},
        {"match": {"content": {"query": "scan window",
                               "minimum_should_match": "75%"}}},
        {"match": {"content": {"query": "scan", "operator": "xor"}}},
        {"match": {"content": {"query": "scan",
                               "minimum_should_match": "nope"}}},
        {"terms": {"content": ["scan", "window"]}},
        {"terms": {"content": "notalist"}},
        {"exists": {"field": "lang"}},
        {"exists": {"field": "bogus"}},
        {"constant_score": {"filter": {"term": {"content": "scan"}}}},
    ])

    @settings(max_examples=80, deadline=None)
    @given(
        q=st.recursive(
            leaf,
            lambda inner: st.one_of(
                st.fixed_dictionaries({"bool": st.fixed_dictionaries({
                    "must": st.lists(inner, max_size=2),
                    "should": st.lists(inner, max_size=2),
                })}),
                st.fixed_dictionaries({"dis_max": st.fixed_dictionaries({
                    "queries": st.lists(inner, min_size=1, max_size=2),
                })}),
            ),
            max_leaves=4,
        ),
        size=st.integers(min_value=-1, max_value=5),
        extra=st.sampled_from([{}, {"from": 2}, {"from": -3}]),
    )
    def check(q, size, extra):
        body = {"query": q, "size": size, **extra}
        try:
            t = run_search(store, body)
            assert t.num_rows >= 0
        except ValueError:
            pass
        except (KeyError, IndexError, AttributeError, TypeError) as ex:
            raise AssertionError(
                f"search compiler leaked {type(ex).__name__} on {body!r}"
            ) from ex

    check()


def test_search_sort_section(built, store):
    _, oracle, _ = built
    dl_of = {int(oracle.doc_ids[i]): int(oracle.dl[i]) for i in range(len(oracle.dl))}
    text = sorted(oracle.postings)[0]
    r = run_search(
        store,
        {"query": {"match": {"content": text}}, "size": 15,
         "sort": [{"dl": {"order": "asc"}}, "_score"]},
    )
    rows = list(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
    full = run_search(store, {"query": {"match": {"content": text}},
                              "size": 10_000})
    pool = list(zip(full["doc_id"].to_pylist(), full["score"].to_pylist()))
    want = sorted(pool, key=lambda p: (dl_of[p[0]], -p[1], p[0]))[:15]
    assert rows == want
    # _doc sort == plain doc order
    r2 = run_search(
        store, {"query": {"match": {"content": text}}, "size": 15, "sort": ["_doc"]}
    )
    assert r2["doc_id"].to_pylist() == sorted(d for d, _ in pool)[:15]
    with pytest.raises(ValueError):
        run_search(store, {"query": {"match": {"content": text}},
                           "sort": [{"bogus": "asc"}]})


def test_search_highlight_section(pos_store):
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search_aggs
    from bitcoin_ledger_2es_ray.pipelines.structured import highlight_fragments

    r = run_search_aggs(
        pos_store.index_dir,
        pos_store,
        {"query": {"match": {"content": "alpha"}}, "size": 5,
         "highlight": {"fields": {"content": {"number_of_fragments": 2}}}},
    )
    h = r["highlight"]
    hit_set = set(r["hits"]["doc_id"].to_pylist())
    assert set(h["doc_id"].to_pylist()) <= hit_set
    assert set(h["term"].to_pylist()) == {"alpha"}
    assert max(h["frag_rank"].to_pylist()) <= 2
    # fragment coordinates must agree with the kernel on hit docs
    want = [
        row for row in highlight_fragments(pos_store, "alpha", n_frags=2)
        if row[0] in hit_set
    ]
    got = list(zip(*[h[c].to_pylist() for c in
                     ["doc_id", "frag_rank", "pos", "snip_start", "snip_end"]]))
    assert sorted(got) == sorted(want)


def test_search_collapse_section(built, store):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.query import collapse_topk

    res, oracle, _ = built
    text = " ".join(sorted(oracle.postings)[:2])
    r = run_search(
        store,
        {"query": {"match": {"content": text}}, "size": 4,
         "collapse": {"field": "lang"}},
    )
    fm = pq.read_table(res.out_dir + "/forward_map", columns=["doc_id", "lang"])
    field_of = dict(zip(fm["doc_id"].to_pylist(), fm["lang"].to_pylist()))
    want = collapse_topk(store, text, 4, field_of, round_decimals=6)
    assert list(zip(r["doc_id"].to_pylist(), r["score"].to_pylist())) == [
        (d, s) for d, _f, s in want
    ]
    with pytest.raises(ValueError):
        run_search(store, {"query": {"match": {"content": text}},
                           "collapse": {"field": "lang"}, "sort": ["_doc"]})
    with pytest.raises(ValueError):
        run_search(store, {"query": {"match": {"content": text}},
                           "collapse": {}})


def test_search_bool_filter_should_msm_defaults_zero(built, store):
    """ES defaults minimum_should_match to 0 when the bool has must OR
    filter clauses: filter-matching docs that match no should clause must
    survive (ADVICE round 5)."""
    _, oracle, _ = built
    v = sorted(oracle.postings)
    filt_docs = sorted(int(oracle.doc_ids[r]) for r in oracle.postings[v[0]])
    r = run_search(
        store,
        {"query": {"bool": {
            "filter": [{"term": {"content": v[0]}}],
            "should": [{"term": {"content": v[1]}}],
        }}, "size": store.n_docs},
    )
    # every filter-matching doc present, even those matching no should
    assert sorted(r["doc_id"].to_pylist()) == filt_docs
    # docs matching the should clause carry its score; the rest score 0
    should_set = {int(oracle.doc_ids[row]) for row in oracle.postings[v[1]]}
    for d, s in zip(r["doc_id"].to_pylist(), r["score"].to_pylist()):
        assert (s > 0.0) == (d in should_set)
    # explicit msm=1 restores the restrictive behavior
    r1 = run_search(
        store,
        {"query": {"bool": {
            "filter": [{"term": {"content": v[0]}}],
            "should": [{"term": {"content": v[1]}}],
            "minimum_should_match": 1,
        }}, "size": store.n_docs},
    )
    assert set(r1["doc_id"].to_pylist()) == set(filt_docs) & should_set


def test_search_bool_must_not_only(built, store):
    """ES supports pure must_not bools: all docs except the matches, score
    0 (filter context) (ADVICE round 5)."""
    _, oracle, _ = built
    v = sorted(oracle.postings)
    not_docs = {int(oracle.doc_ids[row]) for row in oracle.postings[v[0]]}
    all_docs = {int(d) for d in oracle.doc_ids}
    r = run_search(
        store,
        {"query": {"bool": {"must_not": [{"term": {"content": v[0]}}]}},
         "size": store.n_docs},
    )
    assert set(r["doc_id"].to_pylist()) == all_docs - not_docs
    assert all(s == 0.0 for s in r["score"].to_pylist())


def test_msearch_aggs_matches_per_body(built, store):
    """run_msearch_aggs ≡ run_search_aggs per body (one agg pipeline for
    all bodies), and bodies with differing aggs specs are refused."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import (
        run_msearch_aggs,
        run_search_aggs,
    )

    res, oracle, _ = built
    terms = sorted(oracle.postings)[:3]
    aggs = {"langs": {"terms": {"field": "lang"}}}
    bodies = [
        {"query": {"match": {"content": t}}, "size": 5, "aggs": aggs}
        for t in terms
    ]
    r = run_msearch_aggs(res.out_dir, store, bodies)
    assert len(r["hits"]) == 3
    for i, body in enumerate(bodies):
        single = run_search_aggs(res.out_dir, store, body)
        assert r["hits"][i].equals(single["hits"])
        mine = (
            r["langs"]
            .filter(np.asarray(r["langs"]["query_id"]) == i)
            .select(["lang", "doc_count"])
            .sort_by("lang")
        )
        want = single["langs"].select(["lang", "doc_count"]).sort_by("lang")
        assert mine.equals(want)
    with pytest.raises(ValueError):
        run_msearch_aggs(
            res.out_dir,
            store,
            [bodies[0], {**bodies[1], "aggs": {"x": {"terms": {"field": "repo"}}}}],
        )
    with pytest.raises(ValueError):
        run_msearch_aggs(res.out_dir, store, [])


def test_search_bool_randomized_vs_naive(built, store):
    """Differential fuzz of the (round-5) bool compiler: random flat bool
    bodies over term leaves vs an independent set-algebra + score-sum
    mirror built from the oracle postings."""
    import random

    _, oracle, _ = built
    vocab = sorted(oracle.postings)
    n_docs = store.n_docs
    all_docs = set(int(d) for d in oracle.doc_ids)
    # per-term doc → unrounded BM25 score maps
    term_scores = {
        t: dict(score_query(store, t, n_docs, round_decimals=None) or [])
        for t in vocab
    }

    def naive(must, should, filt, must_not, msm):
        cand = None
        for t in must:
            s = set(term_scores[t])
            cand = s if cand is None else cand & s
        if msm is None:
            msm_v = 0 if (must or filt) else 1
        else:
            msm_v = msm
        if should and msm_v > 0:
            ok = {
                d
                for d in all_docs
                if sum(d in term_scores[t] for t in should) >= msm_v
            }
            cand = ok if cand is None else cand & ok
        if cand is None:
            if not must and not should:
                if filt:
                    cand = set(term_scores[filt[0]])
                    filt = filt[1:]
                elif must_not:
                    cand = set(all_docs)
                else:
                    return None  # engine refuses
            else:
                # must empty; should at msm 0
                if filt:
                    cand = set(term_scores[filt[0]])
                    filt = filt[1:]
                else:
                    cand = set()
                    for t in should:
                        cand |= set(term_scores[t])
        for t in filt:
            cand &= set(term_scores[t])
        for t in must_not:
            cand -= set(term_scores[t])
        from bitcoin_ledger_2es_ray.functions.bm25 import sql_round

        out = []
        for d in cand:
            s = sum(term_scores[t].get(d, 0.0) for t in must + should)
            out.append((d, float(sql_round(s, 6))))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    rng = random.Random(41)
    checked = 0
    for _trial in range(120):
        must = rng.sample(vocab, rng.randint(0, 2))
        should = rng.sample(vocab, rng.randint(0, 2))
        filt = rng.sample(vocab, rng.randint(0, 2))
        must_not = rng.sample(vocab, rng.randint(0, 1))
        msm = rng.choice([None, None, 0, 1, 2])
        body_q = {}
        if must:
            body_q["must"] = [{"term": {"content": t}} for t in must]
        if should:
            body_q["should"] = [{"term": {"content": t}} for t in should]
        if filt:
            body_q["filter"] = [{"term": {"content": t}} for t in filt]
        if must_not:
            body_q["must_not"] = [{"term": {"content": t}} for t in must_not]
        if msm is not None:
            body_q["minimum_should_match"] = msm
        want = naive(must, should, filt, must_not, msm)
        if want is None or not body_q or set(body_q) == {"minimum_should_match"}:
            continue
        got = run_search(store, {"query": {"bool": body_q}, "size": n_docs})
        assert _pairs(got) == want, (body_q, want[:5])
        checked += 1
    assert checked >= 80


def test_search_match_operator_and(built, store):
    """match operator=and intersects per-term doc sets, scores stay the
    BM25 sum; bad operator values refuse cleanly."""
    _, oracle, _ = built
    v = sorted(oracle.postings)
    text = f"{v[0]} {v[1]}"
    both = run_search(
        store,
        {"query": {"match": {"content": {"query": text, "operator": "and"}}},
         "size": store.n_docs},
    )
    union = run_search(
        store, {"query": {"match": {"content": text}}, "size": store.n_docs}
    )
    a_docs = {int(oracle.doc_ids[r]) for r in oracle.postings[v[0]]}
    b_docs = {int(oracle.doc_ids[r]) for r in oracle.postings[v[1]]}
    assert set(both["doc_id"].to_pylist()) == a_docs & b_docs
    # scores agree with the OR-mode scores on the intersection
    u = dict(_pairs(union))
    for d, s in _pairs(both):
        assert s == u[d]
    with pytest.raises(ValueError):
        run_search(
            store,
            {"query": {"match": {"content": {"query": text, "operator": "xor"}}}},
        )


def test_parse_min_should_match_grammar(store):
    """The Lucene msm grammar, pinned to the documented Solr/ES examples."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import (
        parse_min_should_match as p,
    )

    # integers and negatives
    assert p(3, 4) == 3
    assert p("3", 4) == 3
    assert p("-1", 4) == 3
    # percentages truncate toward zero
    assert p("75%", 4) == 3
    assert p("-25%", 4) == 3
    assert p("75%", 5) == 3  # floor(3.75)
    assert p("-25%", 9) == 7  # 9 - floor(2.25)
    # conditionals: count <= every upper → ALL clauses required
    assert p("2<-25%", 2) == 2
    assert p("2<-25%", 4) == 3
    # multi-segment: the largest applicable upper wins
    assert p("2<-25% 9<-3", 5) == 4   # 25% leg: 5 - floor(1.25)
    assert p("2<-25% 9<-3", 10) == 7  # -3 leg
    assert p("2<-25% 9<-3", 2) == 2   # below both → all required
    # refusals stay clean ValueErrors
    import pytest as _pytest

    for bad in ("x", "5x%", "a<50%", "<50%", "3<", True, 1.5):
        with _pytest.raises(ValueError):
            p(bad, 4)
    # end-to-end: percentage msm through the bool compiler equals the
    # integer form it resolves to
    got_pct = run_search(
        store,
        {"query": {"bool": {
            "should": [{"term": {"content": t}} for t in ("scan", "window", "sort", "merge")],
            "minimum_should_match": "50%",
        }}, "size": store.n_docs},
    )
    got_int = run_search(
        store,
        {"query": {"bool": {
            "should": [{"term": {"content": t}} for t in ("scan", "window", "sort", "merge")],
            "minimum_should_match": 2,
        }}, "size": store.n_docs},
    )
    assert got_pct.equals(got_int)
    # msm above the clause count matches nothing
    none = run_search(
        store,
        {"query": {"bool": {
            "should": [{"term": {"content": "scan"}}],
            "minimum_should_match": "200%",
        }}, "size": 5},
    )
    assert none.num_rows == 0


def test_search_match_msm_and_leaf_boost(built, store):
    """match-level minimum_should_match mirrors the bool-should form, and
    leaf boost scales scores before any enclosing sum."""
    _, oracle, _ = built
    v = sorted(oracle.postings)[:3]
    text = " ".join(v)
    m = run_search(
        store,
        {"query": {"match": {"content": {
            "query": text, "minimum_should_match": 2,
        }}}, "size": store.n_docs},
    )
    b = run_search(
        store,
        {"query": {"bool": {
            "should": [{"term": {"content": t}} for t in v],
            "minimum_should_match": 2,
        }}, "size": store.n_docs},
    )
    assert m.equals(b)
    # percentage form resolves through the same grammar
    mp = run_search(
        store,
        {"query": {"match": {"content": {
            "query": text, "minimum_should_match": "67%",
        }}}, "size": store.n_docs},
    )
    assert mp.equals(m)  # floor(0.67 * 3) == 2
    # leaf boost: term boost 2.5 == 2.5 × the UNROUNDED base scores,
    # rounded once at the end (Lucene boosts before any rounding)
    base = dict(score_query(store, v[0], store.n_docs, round_decimals=None))
    boosted = run_search(
        store,
        {"query": {"term": {"content": {"value": v[0], "boost": 2.5}}},
         "size": store.n_docs},
    )
    for d, s in _pairs(boosted):
        assert abs(s - base[d] * 2.5) < 1e-6


def test_search_exists_terms_range_bounds_bool_boost(built, store):
    """Round-5 leaf closures: exists (all docs, score 1), terms (constant
    OR), exclusive range bounds, and bool boost."""
    _, oracle, _ = built
    v = sorted(oracle.postings)
    all_docs = sorted(int(d) for d in oracle.doc_ids)
    ex = run_search(
        store, {"query": {"exists": {"field": "lang"}}, "size": store.n_docs}
    )
    assert ex["doc_id"].to_pylist() == all_docs
    assert all(s == 1.0 for s in ex["score"].to_pylist())
    with pytest.raises(ValueError):
        run_search(store, {"query": {"exists": {"field": "bogus"}}})
    # terms = union at constant score
    tm = run_search(
        store,
        {"query": {"terms": {"content": [v[0], v[1]]}}, "size": store.n_docs},
    )
    want = {int(oracle.doc_ids[r]) for r in oracle.postings[v[0]]} | {
        int(oracle.doc_ids[r]) for r in oracle.postings[v[1]]
    }
    assert set(tm["doc_id"].to_pylist()) == want
    assert all(s == 1.0 for s in tm["score"].to_pylist())
    # exclusive range bounds: gt/lt vs gte/lte shifted by one
    dl_of = {int(oracle.doc_ids[i]): int(oracle.dl[i]) for i in range(len(oracle.dl))}
    ex_r = run_search(
        store,
        {"query": {"bool": {"filter": [{"range": {"dl": {"gt": 10, "lt": 40}}}]}},
         "size": store.n_docs},
    )
    assert set(ex_r["doc_id"].to_pylist()) == {
        d for d, n in dl_of.items() if 10 < n < 40
    }
    with pytest.raises(ValueError):
        run_search(store, {"query": {"range": {"dl": {"bogus": 1}}}})
    # bool boost scales the summed scores
    plain = run_search(
        store,
        {"query": {"bool": {"must": [{"term": {"content": v[0]}}]}},
         "size": store.n_docs},
    )
    boosted = run_search(
        store,
        {"query": {"bool": {"must": [{"term": {"content": v[0]}}],
                            "boost": 3.0}}, "size": store.n_docs},
    )
    pd_ = dict(_pairs(plain))
    for d, s in _pairs(boosted):
        assert abs(s - pd_[d] * 3.0) < 5e-6


def test_search_embedded_query_string_leaves(built, store):
    """query_string / simple_query_string leaves in _search bodies equal
    their direct kernels, and compose inside bool."""
    from bitcoin_ledger_2es_ray.pipelines.lucene import query_string_topk
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        simple_query_string_topk,
    )

    _, oracle, _ = built
    v = sorted(oracle.postings)
    qs = f"{v[0]} +{v[1]}"
    r = run_search(
        store, {"query": {"query_string": {"query": qs}}, "size": store.n_docs}
    )
    want = query_string_topk(store, qs, k=store.n_docs, round_decimals=6)
    assert _pairs(r) == want
    r2 = run_search(
        store,
        {"query": {"simple_query_string": {"query": qs}},
         "size": store.n_docs},
    )
    want2 = simple_query_string_topk(store, qs, store.n_docs, round_decimals=6)
    assert _pairs(r2) == want2
    # composes in a bool filter context: query_string hits filtered by dl
    b = run_search(
        store,
        {"query": {"bool": {
            "must": [{"query_string": {"query": qs}}],
            "filter": [{"range": {"dl": {"gte": 10}}}],
        }}, "size": store.n_docs},
    )
    assert set(b["doc_id"].to_pylist()) <= {d for d, _ in want}
    with pytest.raises(ValueError):
        run_search(store, {"query": {"query_string": {}}})


def test_search_match_phrase_slop(pos_store):
    """match_phrase with slop delegates to the chained-gap kernel at a
    constant score; slop=0 keeps the scored phrase path."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        phrase_match_slop,
        phrase_topk,
    )

    body0 = {"query": {"match_phrase": {"content": {
        "query": "alpha beta", "slop": 0,
    }}}, "size": 10}
    r0 = run_search(pos_store, body0)
    assert _pairs(r0) == phrase_topk(pos_store, "alpha beta", 10,
                                     round_decimals=6)
    r2 = run_search(
        pos_store,
        {"query": {"match_phrase": {"content": {
            "query": "alpha beta", "slop": 2,
        }}}, "size": pos_store.n_docs},
    )
    want = sorted(phrase_match_slop(pos_store, "alpha beta", slop=2).tolist())
    assert r2["doc_id"].to_pylist() == want
    assert all(s == 1.0 for s in r2["score"].to_pylist())
    # slop widens or keeps the exact-phrase doc set
    assert set(d for d, _ in _pairs(r0)) <= set(want)
    with pytest.raises(ValueError):
        run_search(pos_store, {"query": {"match_phrase": {"content": {
            "query": "alpha beta", "slop": -1,
        }}}})


def test_search_boosting_and_phrase_prefix_leaves(built, store, pos_store):
    """boosting demotes negative-matching hits by negative_boost;
    match_phrase_prefix expands the last slot (single token → prefix)."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        phrase_prefix_match,
        prefix_match,
    )

    _, oracle, _ = built
    v = sorted(oracle.postings)
    plain = run_search(
        store, {"query": {"term": {"content": v[0]}}, "size": store.n_docs}
    )
    bq = run_search(
        store,
        {"query": {"boosting": {
            "positive": {"term": {"content": v[0]}},
            "negative": {"term": {"content": v[1]}},
            "negative_boost": 0.25,
        }}, "size": store.n_docs},
    )
    neg = {int(oracle.doc_ids[r]) for r in oracle.postings[v[1]]}
    pd_ = dict(_pairs(plain))
    assert set(d for d, _ in _pairs(bq)) == set(pd_)
    for d, s in _pairs(bq):
        want = pd_[d] * 0.25 if d in neg else pd_[d]
        assert abs(s - want) < 5e-6
    # phrase prefix: "alpha b" == alpha followed by any b-term
    pp = run_search(
        pos_store,
        {"query": {"match_phrase_prefix": {"content": "alpha b"}},
         "size": pos_store.n_docs},
    )
    want_d = sorted(
        np.unique(phrase_prefix_match(pos_store, "alpha", "b")).tolist()
    )
    assert pp["doc_id"].to_pylist() == want_d
    assert all(s == 1.0 for s in pp["score"].to_pylist())
    # single token degrades to prefix
    one = run_search(
        pos_store,
        {"query": {"match_phrase_prefix": {"content": "ga"}}, "size": 100},
    )
    assert one["doc_id"].to_pylist() == sorted(
        np.unique(prefix_match(pos_store, "ga")).tolist()
    )
