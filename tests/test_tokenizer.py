"""Tokenizer goldens (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bitcoin_ledger_2es_ray.functions.tokenize import (
    term_counts,
    tokenize_docs,
    tokenize_flat,
    tokenize_query,
)


def test_camel_case():
    assert tokenize_query("getBlockHash") == ["getblockhash", "get", "block", "hash"]


def test_snake_case():
    assert tokenize_query("compute_bm25_score") == [
        "computebm25score",
        "compute",
        "bm",
        "25",
        "score",
    ]


def test_acronym_and_digits():
    assert tokenize_query("HTTPServer2") == ["httpserver2", "http", "server", "2"]


def test_plain_words_emitted_once():
    # bag-of-words corpus must tokenize exactly like string_split(text, ' ')
    assert tokenize_query("batch scan batch window") == ["batch", "scan", "batch", "window"]


def test_separators_and_empty():
    assert tokenize_query("foo.bar(baz, qux)") == ["foo", "bar", "baz", "qux"]
    assert tokenize_query("") == []
    assert tokenize_query("...") == []


def test_long_token_dropped():
    assert tokenize_query("x" * 65) == []
    assert tokenize_query("x" * 64) == ["x" * 64]


def test_unicode_identifiers():
    assert tokenize_query("héllo wörld") == ["héllo", "wörld"]
    assert tokenize_query("Größe_MAX") == ["größemax", "größe", "max"]


def test_lang_tagging():
    content = pa.array(["fooBar", "baz"])
    langs = pa.array(["go", "py"])
    terms, doc_idx, dl = tokenize_flat(content, langs=langs, tag_lang=True)
    assert terms.to_pylist() == ["go:foobar", "py:baz", "go:foo", "go:bar"]
    np.testing.assert_array_equal(dl, [3, 1])


def test_dl_counts():
    _, _, dl = tokenize_flat(pa.array(["a b c", "", "getX"]))
    np.testing.assert_array_equal(dl, [3, 0, 3])  # getx, get, x


def test_term_counts():
    terms, doc_idx, _ = tokenize_flat(pa.array(["a b a", "b"]))
    t = term_counts(terms, doc_idx, np.array([10, 20], dtype=np.uint64))
    rows = sorted(zip(t["term"].to_pylist(), t["doc_id"].to_pylist(), t["tf"].to_pylist()))
    assert rows == [("a", 10, 2), ("b", 10, 1), ("b", 20, 1)]


def test_whitespace_tokenizer_and_registry():
    import pytest

    from bitcoin_ledger_2es_ray.functions.tokenize import (
        get_tokenizer,
        whitespace_tokenize_flat,
    )

    terms, doc_idx, dl = whitespace_tokenize_flat(pa.array(["Foo_bar baz", "  a  b "]))
    assert terms.to_pylist() == ["Foo_bar", "baz", "a", "b"]  # no splits, no lowercase
    np.testing.assert_array_equal(dl, [2, 2])
    assert get_tokenizer("code") is not None
    with pytest.raises(ValueError, match="unknown tokenizer"):
        get_tokenizer("nope")


def test_docs_roundtrip():
    docs = tokenize_docs(pa.array(["snake_case fooBar", "plain words here"]))
    assert docs[0] == ["snakecase", "foobar", "snake", "case", "foo", "bar"]
    assert docs[1] == ["plain", "words", "here"]


def test_stop_filter_positions_and_dl():
    """ES `stop` filter: stopwords dropped, position GAPS preserved, dl
    counts only kept tokens; registry chains participate like any
    tokenizer."""
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.functions.tokenize import get_tokenizer

    tok = get_tokenizer("code_stop")
    t, d, dl, p = tok(
        pa.array(["scan the column fast", "order by window", "scan scan"]),
        return_positions=True,
    )
    assert t.to_pylist() == ["the", "fast", "by"]
    assert d.tolist() == [0, 0, 1]
    assert p.tolist() == [1, 3, 1]  # gaps preserved
    assert dl.tolist() == [2, 1, 0]  # all-stop doc has dl 0
    # no-positions path agrees
    t2, d2, dl2 = tok(pa.array(["scan the column fast"]))
    assert t2.to_pylist() == ["the", "fast"] and dl2.tolist() == [2]


def test_stop_filter_synonym_registry():
    from bitcoin_ledger_2es_ray.functions.tokenize import TOKENIZERS

    assert "code_stop" in TOKENIZERS and "whitespace_stop" in TOKENIZERS
