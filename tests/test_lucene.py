"""Lucene query_string: parser shapes and evaluator identity against the
engine's own verified kernels (pipelines/lucene.py)."""

from __future__ import annotations

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
