"""S-stemmer analyzer chain (functions/stem.py + *_stem tokenizers).

Pins three layers:
- the vectorized kernel equals the per-word rule-table reference on goldens
  and randomized suffix soup,
- an index built with the ``code_stem`` chain over the deterministically
  INFLECTED corpus is identical (dictionary, stats, ranking) to the plain
  index over the raw corpus — the collapse property the ``stemmed_topk``
  driver query gates on,
- search-side stemming (``stem_query_terms``): a query for ``tables``
  matches docs indexed as ``table``, ES's same-analyzer-at-search-time
  semantics.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.functions.stem import s_stem, s_stem_word, stem_query_terms

SF_DIR = "/root/testdata/sf0.001"

GOLDENS = {
    "tables": "table",
    "ponies": "pony",
    "cats": "cat",
    "values": "value",
    "caress": "caress",  # ss guard
    "bus": "bus",  # us guard
    "bees": "bee",  # ees guard blocks rule 2; rule 3 drops the s
    "goes": "goe",  # oes guard blocks rule 2; rule 3 drops the s
    "glasses": "glasse",  # conservative: S-stemmer only strips one s
    "a": "a",  # length guards
    "s": "s",
    "window": "window",  # no rule fires
}


def test_s_stem_kernel_matches_reference():
    words = list(GOLDENS)
    rng = random.Random(42)
    stems = ["tab", "pon", "glas", "bu", "e", "", "valu", "xe", "qui", "zz"]
    sufs = ["", "s", "es", "ies", "ss", "us", "aes", "ees", "oes", "eies", "aies", "y"]
    words += [rng.choice(stems) + rng.choice(sufs) for _ in range(500)]
    words = [w for w in words if w]
    out = s_stem(pa.array(words, type=pa.string())).to_pylist()
    assert out == [s_stem_word(w) for w in words]
    for w, want in GOLDENS.items():
        assert s_stem_word(w) == want, (w, want)


def test_stemmed_index_collapses_inflection(built, tmp_path):
    """code_stem over the inflected corpus == plain code over the raw corpus:
    same vocabulary, same df, same BM25 ranking on the fixture queries."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query
    from bitcoin_ledger_2es_ray.sources.corpus import derive_inflected_corpus_parquet
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    plain = SegmentStore(res.out_dir)

    corpus = derive_inflected_corpus_parquet(SF_DIR, str(tmp_path / "corpus_infl.parquet"))
    # the inflection actually fired: the raw corpus has no 's'-final tokens
    some = pq.read_table(corpus, columns=["content"])["content"][0].as_py()
    assert any(t.endswith("s") for t in some.split(" "))

    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(tmp_path / "index_stem"),
        num_partitions=8,
        head_df_ratio=0.5,
        n_salt=2,
        sketch_stride=2,
        tokenizer="code_stem",
    )
    stem_res = build_index(cfg)
    stemmed = SegmentStore(stem_res.out_dir)

    assert stemmed.df == plain.df  # vocabulary AND df collapse exactly
    assert stemmed.n_docs == plain.n_docs
    assert stemmed.avgdl == plain.avgdl

    queries = fixture_queries(sorted(plain.df), n=12, k=10)
    for text in queries["text"].to_pylist():
        assert score_query(stemmed, text, 10, round_decimals=6) == score_query(
            plain, text, 10, round_decimals=6
        )


def test_search_side_stemming(built):
    """ES applies the same analyzer at search time: stem_query_terms maps
    inflected query forms onto the plain index's vocabulary."""
    res, _, _ = built
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    store = SegmentStore(res.out_dir)
    base = sorted(store.df)[5]
    assert not base.endswith("s")
    inflected = base + "s"
    # unstemmed inflected query misses (term not in the dictionary)
    assert store.td.df_of(inflected) == 0
    stemmed_terms = stem_query_terms(inflected)
    assert stemmed_terms == [base]
    hits = score_query(store, " ".join(stemmed_terms), 5, round_decimals=6)
    assert hits == score_query(store, base, 5, round_decimals=6)
    assert len(hits) > 0


def test_stemmed_tokenizer_registry():
    from bitcoin_ledger_2es_ray.functions.tokenize import get_tokenizer

    tok = get_tokenizer("whitespace_stem")
    terms, doc_idx, dl, pos = tok(
        pa.array(["tables ponies value", "caress bus"]), return_positions=True
    )
    assert terms.to_pylist() == ["table", "pony", "value", "caress", "bus"]
    assert dl.tolist() == [3, 2]
    assert pos.tolist() == [0, 1, 2, 0, 1]
    with pytest.raises(ValueError):
        get_tokenizer("nope_stem")
