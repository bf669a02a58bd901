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
