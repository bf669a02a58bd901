"""Multi-field search (pipelines/fields.py): field-swapped corpus derivation
with docID alignment, and multi_match most_fields/best_fields combination."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query


@pytest.fixture(scope="module")
def field_stores(built, ray_session, tmp_path_factory):
    from bitcoin_ledger_2es_ray.pipelines.fields import build_field_index

    res, _, corpus = built
    root = str(tmp_path_factory.mktemp("fields"))
    pres = build_field_index(corpus, "path", root, num_partitions=4)
    paths = pq.read_table(corpus, columns=["path"])["path"].to_pylist()
    return SegmentStore(res.out_dir), SegmentStore(pres.out_dir), paths


def test_field_corpus_docids_align(field_stores):
    content_store, path_store, paths = field_stores
    assert path_store.n_docs == content_store.n_docs
    # every doc's path ends in .py → token 'py' posts for every doc
    d_py = np.unique(path_store.postings("py")[0])
    assert d_py.tolist() == list(range(path_store.n_docs))
    # the digit part of file_<id> posts exactly for docs whose id (or
    # source digits) produce that token — check one specific doc
    doc = 3
    tok = str(doc)
    hit_docs = set(np.unique(path_store.postings(tok)[0]).tolist())
    want = {
        i
        for i, p in enumerate(paths)
        if tok in p.replace("/", " ").replace("_", " ").replace(".", " ").replace("src", "src ").split()
    }
    assert doc in hit_docs
    assert hit_docs == want


def test_derive_field_corpus_rejects_unknown_field(built, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.fields import derive_field_corpus

    _, _, corpus = built
    with pytest.raises(ValueError):
        derive_field_corpus(corpus, "content_sha", str(tmp_path / "x"))


def test_multi_match_most_fields_sums_legs(field_stores):
    from bitcoin_ledger_2es_ray.pipelines.fields import multi_match_topk

    content_store, path_store, _ = field_stores
    vocab = sorted(content_store.df)
    text = f"{vocab[3]} {vocab[11 % len(vocab)]} 3"
    got = multi_match_topk(
        [(content_store, 1.0), (path_store, 2.0)], text, 10,
        mode="most_fields", round_decimals=6,
    )
    c = dict(score_query(content_store, text, content_store.n_docs))
    p = dict(score_query(path_store, text, path_store.n_docs))
    want = {}
    for d in set(c) | set(p):
        want[d] = float(sql_round(c.get(d, 0.0) + 2.0 * p.get(d, 0.0), 6))
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    # the path leg actually contributes (digit token matches doc 3)
    assert any(d in p for d, _ in got)


def test_multi_match_best_fields_is_dis_max(field_stores):
    from bitcoin_ledger_2es_ray.pipelines.fields import multi_match_topk

    content_store, path_store, _ = field_stores
    vocab = sorted(content_store.df)
    text = f"{vocab[5]} 3"
    tb = 0.4
    got = multi_match_topk(
        [(content_store, 1.0), (path_store, 1.5)], text, 10,
        mode="best_fields", tie_breaker=tb, round_decimals=6,
    )
    c = dict(score_query(content_store, text, content_store.n_docs))
    p = dict(score_query(path_store, text, path_store.n_docs))
    want = {}
    for d in set(c) | set(p):
        legs = [x for x in (c.get(d), 1.5 * p.get(d) if d in p else None) if x is not None]
        want[d] = float(sql_round(max(legs) + tb * (sum(legs) - max(legs)), 6))
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    with pytest.raises(ValueError):
        multi_match_topk([(content_store, 1.0)], text, 5, mode="phrase_fields")


def test_multi_match_cross_fields_term_centric(field_stores):
    from bitcoin_ledger_2es_ray.functions.bm25 import idf, sql_round, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.fields import multi_match_topk

    content_store, path_store, _ = field_stores
    vocab = sorted(content_store.df)
    text = f"{vocab[2]} {vocab[13 % len(vocab)]} 3"
    legs = [(content_store, 1.0), (path_store, 2.0)]
    got = multi_match_topk(legs, text, 10, mode="cross_fields", round_decimals=6)

    import numpy as np

    want: dict[int, float] = {}
    for t in sorted(set(text.split(" "))):
        per_doc: dict[int, float] = {}
        for store, boost in legs:
            df_t = store.td.df_of(t)
            if df_t == 0:
                continue
            d, tf, dl = store.postings(t)
            c = boost * float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
            for dd, cc in zip(d.tolist(), c.tolist()):
                per_doc[dd] = max(per_doc.get(dd, -1e18), cc)
        for dd, cc in per_doc.items():
            want[dd] = want.get(dd, 0.0) + cc
    expect = sorted(
        ((d, float(sql_round(s, 6))) for d, s in want.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect


def test_combined_fields_matches_bruteforce_bm25f(field_stores):
    """combined_fields == BM25 over the merged pseudo-field: tf' = Σ w·tf,
    dl' = Σ w·dl, df' = max over fields, avgdl' over combined lengths."""
    from bitcoin_ledger_2es_ray.functions.bm25 import idf, sql_round, tf_norm
    from bitcoin_ledger_2es_ray.pipelines.fields import combined_fields_topk

    content_store, path_store, _ = field_stores
    vocab = sorted(content_store.df)
    text = f"{vocab[2]} {vocab[13 % len(vocab)]} 3 py"
    legs = [(content_store, 1.0), (path_store, 2.0)]
    got = combined_fields_topk(legs, text, 10, round_decimals=6)

    n = content_store.n_docs
    # brute-force pseudo-field stats: build tf'/dl' by walking every term
    dl_comb = np.zeros(n)
    tfc: dict[str, dict[int, float]] = {}
    dl_maps = []
    for store, w in legs:
        per_doc_dl: dict[int, float] = {}
        for t in sorted(store.df):
            d, tf, dl = store.postings(t)
            m = tfc.setdefault(t, {})
            for dd, tt, ll in zip(d.tolist(), tf.tolist(), dl.tolist()):
                m[dd] = m.get(dd, 0.0) + w * tt
                per_doc_dl[dd] = w * ll
        dl_maps.append(per_doc_dl)
    for per_doc_dl in dl_maps:
        for dd, ll in per_doc_dl.items():
            dl_comb[dd] += ll
    avgdl = float(np.mean(dl_comb))
    want: dict[int, float] = {}
    for t in sorted(set(text.split(" "))):
        df_t = max(store.td.df_of(t) for store, _ in legs)
        if df_t == 0 or t not in tfc:
            continue
        w_idf = float(idf(n, df_t))
        for dd, tt in tfc[t].items():
            want[dd] = want.get(dd, 0.0) + w_idf * float(
                tf_norm(np.array([tt]), np.array([dl_comb[dd]]), avgdl)[0]
            )
    expect = sorted(
        ((d, float(sql_round(s, 6))) for d, s in want.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect
