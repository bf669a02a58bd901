"""Intervals algebra (pipelines/intervals.py): engine (greedy/two-pointer
minimal-interval combinators) vs an INDEPENDENT naive reference
(exhaustive enumeration + O(n²) minimality), randomized over position
sets, plus an end-to-end positional-store check."""

from __future__ import annotations

import random
from itertools import product

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.pipelines.intervals import (
    eval_intervals,
    intervals_search,
    minimal_intervals,
)


# ---------------------------------------------------------------- naive


def _naive_minimal(ivs):
    ivs = sorted(set(ivs))
    return sorted(
        iv
        for iv in ivs
        if not any(
            jv != iv and iv[0] <= jv[0] and jv[1] <= iv[1] for jv in ivs
        )
    )


def naive_eval(spec, pos):
    rule, body = next(iter(spec.items()))
    if rule == "match":
        terms = body["query"].split()
        lists = [pos.get(t, []) for t in terms]
        mg = int(body.get("max_gaps", -1))
        mg = mg if mg >= 0 else 10**9
        cands = []
        if body.get("ordered", False):
            for combo in product(*lists):
                if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
                    s, e = combo[0], combo[-1]
                    if (e - s + 1) - len(combo) <= mg:
                        cands.append((s, e))
        else:
            # overlapping positions allowed between DIFFERENT terms
            # (Lucene Intervals.unordered); repeated terms need distinct
            # occurrences per clause
            for combo in product(*lists):
                by_term: dict[str, set] = {}
                for t, p in zip(terms, combo):
                    by_term.setdefault(t, set()).add(p)
                if any(
                    len(by_term[t]) != terms.count(t) for t in by_term
                ):
                    continue
                s, e = min(combo), max(combo)
                if (e - s + 1) - len(combo) <= mg:
                    cands.append((s, e))
        out = _naive_minimal(cands)
    elif rule == "any_of":
        cands = []
        for child in body["intervals"]:
            cands.extend(naive_eval(child, pos))
        out = _naive_minimal(cands)
    elif rule == "all_of":
        children = [naive_eval(c, pos) for c in body["intervals"]]
        cands = []
        if body.get("ordered", False):
            mg = int(body.get("max_gaps", -1))
            for combo in product(*children):
                ok = all(
                    combo[i][1] < combo[i + 1][0] for i in range(len(combo) - 1)
                )
                gaps = sum(
                    combo[i + 1][0] - combo[i][1] - 1
                    for i in range(len(combo) - 1)
                )
                if ok and (mg < 0 or gaps <= mg):
                    cands.append((combo[0][0], combo[-1][1]))
        else:
            # children may overlap (Lucene Intervals.unordered)
            for combo in product(*children):
                cands.append(
                    (min(iv[0] for iv in combo), max(iv[1] for iv in combo))
                )
        out = _naive_minimal(cands)
    else:  # pragma: no cover
        raise AssertionError(rule)
    flt = body.get("filter")
    if flt:
        kind, fspec = next(iter(flt.items()))
        fivs = naive_eval(fspec, pos)
        keep = []
        for iv in out:
            if kind == "containing":
                ok = any(iv[0] <= f[0] and f[1] <= iv[1] for f in fivs)
            elif kind == "not_containing":
                ok = not any(iv[0] <= f[0] and f[1] <= iv[1] for f in fivs)
            elif kind == "contained_by":
                ok = any(f[0] <= iv[0] and iv[1] <= f[1] for f in fivs)
            elif kind == "not_contained_by":
                ok = not any(f[0] <= iv[0] and iv[1] <= f[1] for f in fivs)
            elif kind == "before":
                ok = any(iv[1] < f[0] for f in fivs)
            else:  # after
                ok = any(iv[0] > f[1] for f in fivs)
            if ok:
                keep.append(iv)
        out = keep
    return out


def _np_pos(pos):
    return {t: np.array(sorted(v), dtype=np.int64) for t, v in pos.items()}


def _rand_pos(rng, terms=("a", "b", "c", "d"), n=14):
    return {
        t: sorted(rng.sample(range(n), rng.randint(0, min(5, n))))
        for t in terms
    }


SPECS = [
    {"match": {"query": "a b", "ordered": True, "max_gaps": 1}},
    {"match": {"query": "a b c", "ordered": False, "max_gaps": 3}},
    {"any_of": {"intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "b c", "ordered": True}},
    ]}},
    {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "b"}},
    ]}},
    {"all_of": {"ordered": True, "intervals": [
        {"any_of": {"intervals": [
            {"match": {"query": "a"}}, {"match": {"query": "b"}},
        ]}},
        {"match": {"query": "c"}},
    ]}},
    {"all_of": {"ordered": False, "intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "b"}},
        {"match": {"query": "c"}},
    ]}},
    {"match": {"query": "a b", "ordered": True, "max_gaps": 4,
               "filter": {"not_containing": {"match": {"query": "c"}}}}},
    {"all_of": {"ordered": True, "max_gaps": 3, "intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "c"}},
    ], "filter": {"containing": {"match": {"query": "b"}}}}},
    {"match": {"query": "a", "filter": {
        "before": {"match": {"query": "d"}}}}},
    {"match": {"query": "b", "filter": {
        "after": {"match": {"query": "a"}}}}},
    {"match": {"query": "a b", "ordered": True, "max_gaps": 2, "filter": {
        "contained_by": {"match": {"query": "c d", "ordered": False,
                                   "max_gaps": 9}}}}},
]


def test_intervals_randomized_vs_naive():
    rng = random.Random(7)
    checked = 0
    for trial in range(120):
        pos = _rand_pos(rng)
        spec = SPECS[trial % len(SPECS)]
        got = eval_intervals(spec, _np_pos(pos))
        want = naive_eval(spec, pos)
        assert got == want, (trial, spec, pos)
        checked += 1
    assert checked == 120


def test_minimal_intervals_basic():
    assert minimal_intervals([(0, 5), (1, 3), (1, 3), (2, 8), (6, 7)]) == [
        (1, 3), (6, 7),
    ]
    assert minimal_intervals([]) == []


def test_intervals_unordered_repeated_terms():
    """Repeated-term unordered match requires that many DISTINCT
    occurrences in the window (ADVICE round 5 — Lucene supports duplicate
    terms; the old compiler rejected them)."""
    # one occurrence of "a": "a a" can never match
    assert eval_intervals(
        {"match": {"query": "a a", "ordered": False}},
        _np_pos({"a": [3]}),
    ) == []
    # two occurrences: the window spans both
    assert eval_intervals(
        {"match": {"query": "a a", "ordered": False}},
        _np_pos({"a": [3, 7]}),
    ) == [(3, 7)]
    # minimality: three occurrences yield the two adjacent windows
    assert eval_intervals(
        {"match": {"query": "a a", "ordered": False}},
        _np_pos({"a": [1, 4, 6]}),
    ) == [(1, 4), (4, 6)]
    # mixed with a distinct term, max_gaps bound applies ((e-s+1)-k)
    assert eval_intervals(
        {"match": {"query": "a a b", "ordered": False, "max_gaps": 1}},
        _np_pos({"a": [0, 2], "b": [3]}),
    ) == [(0, 3)]
    assert eval_intervals(
        {"match": {"query": "a a b", "ordered": False, "max_gaps": 0}},
        _np_pos({"a": [0, 2], "b": [3]}),
    ) == []
    # randomized against the naive distinct-occurrence mirror
    rng = random.Random(23)
    for _ in range(60):
        pos = _rand_pos(rng, terms=("a", "b"), n=10)
        for q in ("a a", "a a b", "b b", "a b b"):
            spec = {"match": {"query": q, "ordered": False,
                              "max_gaps": rng.choice([-1, 0, 1, 3])}}
            assert eval_intervals(spec, _np_pos(pos)) == naive_eval(
                spec, pos
            ), (q, pos)


def test_intervals_rejections():
    p = _np_pos({"a": [1], "b": [2]})
    with pytest.raises(ValueError):
        eval_intervals({"bogus": {}}, p)
    with pytest.raises(ValueError):
        eval_intervals(
            {"all_of": {"ordered": False, "max_gaps": 1, "intervals": [
                {"match": {"query": "a"}}, {"match": {"query": "b"}},
            ]}},
            p,
        )
    with pytest.raises(ValueError):
        eval_intervals(
            {"match": {"query": "a", "filter": {"bogus": {"match": {"query": "b"}}}}},
            p,
        )


@pytest.fixture(scope="module")
def ivx(ray_session, tmp_path_factory):
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    rng = random.Random(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 18)))
        for _ in range(60)
    ]
    root = tmp_path_factory.mktemp("ivx")
    corpus = str(root / "corpus.parquet")
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
            corpus=corpus,
            out_dir=str(root / "idx"),
            num_partitions=4,
            with_positions=True,
            head_df_ratio=0.3,
            n_salt=2,
            sketch_stride=1,
        )
    )
    return docs, SegmentStore(res.out_dir)


def test_intervals_search_vs_naive_corpus(ivx):
    docs, store = ivx
    spec = {
        "all_of": {
            "ordered": True,
            "max_gaps": 3,
            "intervals": [
                {"any_of": {"intervals": [
                    {"match": {"query": "alpha"}},
                    {"match": {"query": "beta"}},
                ]}},
                {"match": {"query": "gamma"}},
            ],
            "filter": {"not_containing": {"match": {"query": "delta"}}},
        }
    }
    got = intervals_search(store, spec)
    rows = {
        d: (n, fs, fe)
        for d, n, fs, fe in zip(
            got["doc_id"].to_pylist(), got["n_intervals"].to_pylist(),
            got["first_start"].to_pylist(), got["first_end"].to_pylist(),
        )
    }
    for doc_id, text in enumerate(docs):
        toks = text.split()
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        want = naive_eval(spec, pos)
        if want:
            assert rows.get(doc_id) == (len(want), want[0][0], want[0][1]), doc_id
        else:
            assert doc_id not in rows, doc_id


def test_intervals_expand_multi_term_sources(ivx):
    """prefix / wildcard / fuzzy / range sources expand through the
    dictionary into any_of-of-match (ES 128-expansion cap contract)."""
    docs, store = ivx
    spec = {
        "all_of": {
            "ordered": True,
            "max_gaps": 4,
            "intervals": [
                {"prefix": {"prefix": "al"}},       # alpha
                {"wildcard": {"pattern": "gamm?"}},  # gamma
            ],
        }
    }
    got = intervals_search(store, spec)
    # equivalent literal spec
    lit = {
        "all_of": {
            "ordered": True,
            "max_gaps": 4,
            "intervals": [
                {"match": {"query": "alpha"}},
                {"match": {"query": "gamma"}},
            ],
        }
    }
    assert got.equals(intervals_search(store, lit))
    # fuzzy: beta~1 expands to beta (plus neighbors within dist 1, none here)
    fz = intervals_search(store, {"fuzzy": {"term": "betaa", "fuzziness": 1}})
    assert fz.equals(intervals_search(store, {"match": {"query": "beta"}}))
    # range scan over the dictionary
    rg = intervals_search(store, {"range": {"gte": "delta", "lte": "eps"}})
    lit_rg = intervals_search(store, {"any_of": {"intervals": [
        {"match": {"query": "delta"}}, {"match": {"query": "eps"}},
    ]}})
    assert rg.equals(lit_rg)
    # empty expansion matches nothing
    assert intervals_search(store, {"prefix": {"prefix": "zzz"}}).num_rows == 0
    # leading wildcard refuses
    with pytest.raises(ValueError):
        intervals_search(store, {"wildcard": {"pattern": "*pha"}})


def test_intervals_range_bounds(ivx):
    """range source supports one-sided and exclusive bounds and refuses
    unknown/missing keys with a clean ValueError (ADVICE round 5)."""
    docs, store = ivx
    vocab = sorted({t for d in docs for t in d.split()})
    # one-sided gte: every term >= "delta"
    rg = intervals_search(store, {"range": {"gte": "delta"}})
    lit = intervals_search(store, {"any_of": {"intervals": [
        {"match": {"query": t}} for t in vocab if t >= "delta"
    ]}})
    assert rg.equals(lit)
    # one-sided lt (exclusive)
    rg2 = intervals_search(store, {"range": {"lt": "delta"}})
    lit2 = intervals_search(store, {"any_of": {"intervals": [
        {"match": {"query": t}} for t in vocab if t < "delta"
    ]}})
    assert rg2.equals(lit2)
    # gt + lte combination
    rg3 = intervals_search(store, {"range": {"gt": "alpha", "lte": "delta"}})
    lit3 = intervals_search(store, {"any_of": {"intervals": [
        {"match": {"query": t}} for t in vocab if "alpha" < t <= "delta"
    ]}})
    assert rg3.equals(lit3)
    # no bounds at all → clean refusal, not a KeyError
    with pytest.raises(ValueError):
        intervals_search(store, {"range": {}})
    # unknown key → clean refusal
    with pytest.raises(ValueError):
        intervals_search(store, {"range": {"gte": "a", "bogus": 1}})
