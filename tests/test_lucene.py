"""Lucene query_string: parser shapes and evaluator identity against the
engine's own verified kernels (pipelines/lucene.py)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from bitcoin_ledger_2es_ray.pipelines.lucene import (
    parse_query_string,
    query_string_topk,
)


@pytest.fixture(scope="module")
def qs_store(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    return SegmentStore(res.out_dir)


def _terms(store, *ranks):
    vocab = sorted(store.df)
    return [vocab[r % len(vocab)] for r in ranks]


def test_parse_precedence_and_markers():
    assert parse_query_string("a AND b OR c") == (
        "or",
        [("and", [("term", "a"), ("term", "b")]), ("term", "c")],
    )
    assert parse_query_string("+a b^2") == (
        "bool",
        [("term", "a")],
        [],
        [("boost", ("term", "b"), 2.0)],
    )
    assert parse_query_string('"x y"~3') == ("phrase", "x y", 3)
    assert parse_query_string("dl:[* TO 9]") == ("range", None, 9)
    with pytest.raises(ValueError, match="mix"):
        parse_query_string("a AND +b")
    with pytest.raises(ValueError, match="pure-negative"):
        parse_query_string("-a")
    with pytest.raises(ValueError, match="unknown field"):
        parse_query_string("nope:x")
    with pytest.raises(ValueError, match="only range"):
        parse_query_string("dl:12")


def test_qs_or_equals_bool_topk(qs_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import bool_topk

    t1, t2 = _terms(qs_store, 3, 11)
    assert t1 != t2
    got = query_string_topk(qs_store, f"{t1} {t2}", k=10, round_decimals=6)
    want = bool_topk(qs_store, should=(t1, t2), k=10, round_decimals=6)
    assert got == want


def test_qs_must_should_boost(qs_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import _score_map

    t1, t2 = _terms(qs_store, 5, 17)
    d1, s1 = _score_map(qs_store, t1)
    d2, s2 = _score_map(qs_store, t2)
    exp = {}
    m2 = dict(zip(d2.tolist(), s2.tolist()))
    for d, s in zip(d1.tolist(), s1.tolist()):
        exp[d] = s + 2.5 * m2.get(d, 0.0)
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round

    want = sorted(
        ((d, float(sql_round(s, 6))) for d, s in exp.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = query_string_topk(qs_store, f"+{t1} {t2}^2.5", k=10, round_decimals=6)
    assert got == want


def test_qs_and_not_composition(qs_store):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.structured import _score_map

    t1, t2, t3 = _terms(qs_store, 2, 9, 23)
    d1, s1 = _score_map(qs_store, t1)
    d2, s2 = _score_map(qs_store, t2)
    d3, _ = _score_map(qs_store, t3)
    acc: dict[int, float] = {}
    for d, s in zip(d1.tolist(), s1.tolist()):
        acc[d] = acc.get(d, 0.0) + s
    for d, s in zip(d2.tolist(), s2.tolist()):
        acc[d] = acc.get(d, 0.0) + s
    for d in d3.tolist():
        acc.pop(d, None)
    want = sorted(
        ((d, float(sql_round(s, 6))) for d, s in acc.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = query_string_topk(
        qs_store, f"({t1} OR {t2}) AND NOT {t3}", k=10, round_decimals=6
    )
    assert got == want


def test_qs_range_filter(qs_store):
    from bitcoin_ledger_2es_ray.pipelines.structured import range_filtered_topk

    (t1,) = _terms(qs_store, 7)
    got = query_string_topk(
        qs_store, f"{t1} AND dl:[8 TO 40]", k=10, round_decimals=6
    )
    want = range_filtered_topk(qs_store, t1, 10, 8, 40, round_decimals=6)
    assert got == want


def test_qs_wildcard_fuzzy_constant(qs_store):
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match, wildcard_match

    (t1,) = _terms(qs_store, 13)
    pattern = t1[:2] + "*"
    got = query_string_topk(qs_store, pattern, k=10_000, round_decimals=6)
    want_docs = wildcard_match(qs_store, pattern).tolist()
    assert [d for d, _ in got] == sorted(want_docs)
    assert all(s == 1.0 for _, s in got)
    # boost scales the constant
    got3 = query_string_topk(qs_store, pattern + "^3", k=5, round_decimals=6)
    assert all(s == 3.0 for _, s in got3)
    fz = query_string_topk(qs_store, f"{t1}~1", k=10_000, round_decimals=6)
    want_fz = fuzzy_match(qs_store, t1, 1, transpositions=True).tolist()
    assert [d for d, _ in fz] == sorted(want_fz)


@pytest.fixture(scope="module")
def qs_pos_index(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    docs = [
        "alpha beta gamma delta",
        "beta gamma alpha",
        "alpha beta beta gamma",
        "delta alpha beta",
        "gamma delta epsilon",
    ] * 8
    root = tmp_path_factory.mktemp("qsposidx")
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
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(root / "idx"),
        num_partitions=4,
        with_positions=True,
        sketch_stride=1,
    )
    res = build_index(cfg)
    return docs, SegmentStore(res.out_dir)


def test_qs_phrase_equals_phrase_topk(qs_pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_topk

    docs, store = qs_pos_index
    words = docs[0].split(" ")
    phrase = f"{words[0]} {words[1]}"
    got = query_string_topk(store, f'"{phrase}"', k=10, round_decimals=6)
    want = phrase_topk(store, phrase, 10, round_decimals=6)
    assert got == want


def test_qs_eval_rejections(qs_store):
    (t1,) = _terms(qs_store, 1)
    with pytest.raises(ValueError, match="positive surface"):
        query_string_topk(qs_store, "NOT " + t1)
    with pytest.raises(ValueError, match="positive surface"):
        query_string_topk(qs_store, "dl:[1 TO 2]")
    with pytest.raises(ValueError, match="leading-wildcard"):
        query_string_topk(qs_store, "*foo")
    with pytest.raises(ValueError, match="scoring clause"):
        query_string_topk(qs_store, f"dl:[1 TO 2] AND NOT {t1}")


# ------------------------------------------------------ property tests


def test_qs_parser_properties():
    """Hypothesis: random well-formed boolean trees over a small term
    alphabet always parse, and the AST re-evaluates consistently under
    the documented precedence (NOT > AND > OR, juxtaposition = OR)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    terms = st.sampled_from(["alpha", "beta", "gamma", "delta"])

    @st.composite
    def qs_expr(draw, depth=0):
        if depth >= 3 or draw(st.booleans()):
            t = draw(terms)
            kind = draw(st.sampled_from(["plain", "boost", "fuzzy", "wild"]))
            if kind == "boost":
                return f"{t}^2"
            if kind == "fuzzy":
                return f"{t}~1"
            if kind == "wild":
                return t[:2] + "*"
            return t
        left = draw(qs_expr(depth=depth + 1))
        right = draw(qs_expr(depth=depth + 1))
        op = draw(st.sampled_from([" AND ", " OR ", " "]))
        grouped = draw(st.booleans())
        s = f"{left}{op}{right}"
        return f"({s})" if grouped else s

    @given(qs_expr())
    @settings(max_examples=150, deadline=None)
    def check(src):
        node = parse_query_string(src)
        assert isinstance(node, tuple) and len(node) >= 2
        # re-parsing is stable (parse is a pure function of the text)
        assert parse_query_string(src) == node

    check()


def test_sql_translator_properties():
    """Hypothesis: generated SELECTs always translate to a parseable
    ES|QL pipe (the translator never emits syntax the pipe rejects)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitcoin_ledger_2es_ray.pipelines.esql import _normalize_assign, parse_esql
    from bitcoin_ledger_2es_ray.pipelines.sql_api import sql_to_esql

    cols = st.sampled_from(["a", "b", "c"])
    aggs = st.sampled_from(["COUNT(*)", "SUM(a)", "MIN(b)", "MAX(c)", "AVG(a)"])

    @st.composite
    def select(draw):
        if draw(st.booleans()):
            # aggregate form
            n_aggs = draw(st.integers(1, 3))
            items = [f"{draw(aggs)} AS m{i}" for i in range(n_aggs)]
            g = draw(st.lists(cols, min_size=0, max_size=2, unique=True))
            items = [f"{c}" for c in g] + items
            sql = f"SELECT {', '.join(items)} FROM t"
            if draw(st.booleans()):
                sql += f" WHERE a > {draw(st.integers(0, 9))}"
            if g:
                sql += f" GROUP BY {', '.join(g)}"
            if draw(st.booleans()):
                sql += " ORDER BY m0 DESC"
                sql += f" LIMIT {draw(st.integers(1, 20))}"
            return sql
        proj = draw(st.lists(cols, min_size=1, max_size=3, unique=True))
        sql = f"SELECT {', '.join(proj)} FROM t WHERE b <> 'x'"
        sql += f" ORDER BY {proj[0]}"
        if draw(st.booleans()):
            sql += f" LIMIT {draw(st.integers(1, 20))}"
        return sql

    @given(select())
    @settings(max_examples=150, deadline=None)
    def check(sql):
        pipe = sql_to_esql(sql)
        parse_esql(_normalize_assign(pipe))  # must be syntactically valid

    check()


def test_dissect_compile_properties():
    """Hypothesis: dissect patterns built from random literals/fields
    always compile, and the regex round-trips a matching input exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitcoin_ledger_2es_ray.pipelines.esql import compile_dissect

    lit = st.text(alphabet="-:,. ", min_size=1, max_size=3)
    word = st.text(alphabet="abcdef", min_size=1, max_size=6)

    @given(st.lists(st.tuples(lit, word), min_size=1, max_size=4), word)
    @settings(max_examples=150, deadline=None)
    def check(parts, tail):
        pattern = "".join(
            f"{l}%{{f{i}}}" for i, (l, _) in enumerate(parts)
        )
        text = "".join(l + w for l, w in parts)
        rx, fields = compile_dissect(pattern)
        m = re.match(rx, text)
        # a field's value may absorb a following literal when alphabets
        # collide; when the match succeeds, the concatenation invariant
        # must hold exactly
        if m:
            rebuilt = "".join(
                l + m.group(f"f{i}") for i, (l, _) in enumerate(parts)
            )
            assert rebuilt == text
        _ = tail

    check()


def test_qs_minimum_should_match(qs_store):
    """query_string minimum_should_match applies the Lucene grammar to the
    top-level optional clauses, matching the bool-compiler form."""
    from bitcoin_ledger_2es_ray.pipelines.search_api import run_search

    t1, t2, t3 = _terms(qs_store, 3, 11, 19)
    assert len({t1, t2, t3}) == 3
    got = query_string_topk(
        qs_store, f"{t1} {t2} {t3}", k=qs_store.n_docs,
        round_decimals=6, minimum_should_match=2,
    )
    want = run_search(
        qs_store,
        {"query": {"bool": {
            "should": [{"term": {"content": t}} for t in (t1, t2, t3)],
            "minimum_should_match": 2,
        }}, "size": qs_store.n_docs},
    )
    assert got == list(zip(want["doc_id"].to_pylist(),
                           want["score"].to_pylist()))
    # percentage form resolves identically
    got_pct = query_string_topk(
        qs_store, f"{t1} {t2} {t3}", k=qs_store.n_docs,
        round_decimals=6, minimum_should_match="67%",
    )
    assert got_pct == got
    # mandatory-only queries ignore the parameter (ES behavior)
    base = query_string_topk(qs_store, f"+{t1} +{t2}", k=10, round_decimals=6)
    with_msm = query_string_topk(
        qs_store, f"+{t1} +{t2}", k=10, round_decimals=6,
        minimum_should_match=5,
    )
    assert with_msm == base
