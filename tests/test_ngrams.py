"""Chunking + corpus n-gram statistics (training-data operators):
token-window chunking, PMI collocations, per-doc tf-idf keywords."""

from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute_chunks(docs, window, stride):
    out = []
    for doc_id, text in docs:
        toks = text.split(" ")
        c = 0
        for s in range(0, len(toks), stride):
            piece = toks[s : s + window]
            out.append((doc_id, c, s, len(piece), " ".join(piece)))
            c += 1
    return out


@pytest.mark.parametrize("window,stride", [(32, 24), (8, 8), (5, 7), (1, 1)])
def test_chunk_batch_matches_bruteforce(window, stride):
    from bitcoin_ledger_2es_ray.pipelines.chunking import chunk_batch

    docs = [
        (0, "a b c d e f g h i j"),
        (1, "x"),
        (2, "p q r s t u v w x y z p q r s t u"),
    ]
    batch = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    got = chunk_batch(batch, window, stride)
    want = _brute_chunks(docs, window, stride)
    rows = list(
        zip(
            got["doc_id"].to_pylist(),
            got["chunk_id"].to_pylist(),
            got["start"].to_pylist(),
            got["n_tokens"].to_pylist(),
            got["chunk"].to_pylist(),
        )
    )
    assert rows == want


def test_chunk_batch_empty_input():
    from bitcoin_ledger_2es_ray.pipelines.chunking import chunk_batch

    batch = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    got = chunk_batch(batch, 32, 24)
    assert got.num_rows == 0
    assert got.column_names == ["doc_id", "chunk_id", "start", "n_tokens", "chunk"]


def test_chunk_non_overlapping_reconstructs_docs(ray_session):
    """stride == window ⇒ concatenating a doc's chunks rebuilds its text."""
    from bitcoin_ledger_2es_ray.pipelines.chunking import chunk_documents

    t = chunk_documents(SF, window=16, stride=16)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rebuilt = collections.defaultdict(list)
    for d, c, chunk in zip(
        t["doc_id"].to_pylist(), t["chunk_id"].to_pylist(), t["chunk"].to_pylist()
    ):
        rebuilt[d].append((c, chunk))
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        parts = [c for _, c in sorted(rebuilt[doc_id])]
        assert " ".join(parts) == text


def test_chunk_sink_overwrites(ray_session, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.chunking import (
        chunk_documents,
        chunk_documents_to_parquet,
    )

    out = str(tmp_path / "chunks")
    chunk_documents_to_parquet(SF, out)
    n1 = pq.read_table(out).num_rows
    chunk_documents_to_parquet(SF, out)  # re-run must not append
    n2 = pq.read_table(out).num_rows
    assert n1 == n2 == chunk_documents(SF).num_rows


def test_chunk_rejects_bad_params(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.chunking import chunk_documents_ds

    with pytest.raises(ValueError):
        chunk_documents_ds(SF, window=0)
    with pytest.raises(ValueError):
        chunk_documents_ds(SF, stride=0)


def test_bigram_counts_batch_bruteforce():
    from bitcoin_ledger_2es_ray.pipelines.ngrams import bigram_counts_batch

    docs = ["a b a b c", "b c", "x", "a b"]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }
    )
    got = bigram_counts_batch(batch)
    counts = collections.Counter()
    for d in docs:
        toks = d.split(" ")
        for x, y in zip(toks, toks[1:]):
            counts[(x, y)] += 1
    assert {
        (a, b): n
        for a, b, n in zip(got["a"].to_pylist(), got["b"].to_pylist(), got["n"].to_pylist())
    } == dict(counts)


def test_pmi_matches_bruteforce(built):
    """End-to-end PMI over the sf0.001 index vs a pure-Python model."""
    from bitcoin_ledger_2es_ray.pipelines.ngrams import pmi_collocations

    res, _, _ = built
    got = pmi_collocations(SF, res.out_dir, res.total_dl, res.n_docs, min_count=5)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    uni, bi = collections.Counter(), collections.Counter()
    t_tot = 0
    for text in docs:
        toks = text.split(" ")
        t_tot += len(toks)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    b_tot = t_tot - len(docs)
    want = {
        (a, b): math.log((n / b_tot) / ((uni[a] / t_tot) * (uni[b] / t_tot)))
        for (a, b), n in bi.items()
        if n >= 5
    }
    got_map = {
        (a, b): (n, p)
        for a, b, n, p in zip(
            got["a"].to_pylist(),
            got["b"].to_pylist(),
            got["pair_count"].to_pylist(),
            got["pmi"].to_pylist(),
        )
    }
    assert set(got_map) == set(want)
    for k, (n, p) in got_map.items():
        assert n == bi[k]
        assert p == pytest.approx(want[k], abs=1e-6)
    # a frequent-but-independent pair should score lower than a collocation:
    # pmi orders by association strength, sanity-check the spread is nonzero
    vals = [p for _, p in got_map.values()]
    assert max(vals) > min(vals)


def test_pmi_min_count_validation(built):
    from bitcoin_ledger_2es_ray.pipelines.ngrams import pmi_collocations

    res, _, _ = built
    with pytest.raises(ValueError):
        pmi_collocations(SF, res.out_dir, res.total_dl, res.n_docs, min_count=0)


def test_tfidf_top_terms_bruteforce(built):
    from bitcoin_ledger_2es_ray.pipelines.ngrams import tfidf_top_terms

    res, _, _ = built
    k = 3
    got = tfidf_top_terms(res.out_dir, res.n_docs, k=k)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tf = collections.defaultdict(collections.Counter)
    df = collections.Counter()
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        c = collections.Counter(text.split(" "))
        tf[doc_id] = c
        df.update(c.keys())
    n = float(res.n_docs)
    want = {}
    for doc_id, c in tf.items():
        scored = sorted(
            (
                (round(cnt * math.log(n / df[t]), 6), t)
                for t, cnt in c.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        want[doc_id] = [(r + 1, t, s) for r, (s, t) in enumerate(scored)]
    got_map = collections.defaultdict(list)
    for doc_id, rank, term, score in zip(
        got["doc_id"].to_pylist(),
        got["rank"].to_pylist(),
        got["term"].to_pylist(),
        got["score"].to_pylist(),
    ):
        got_map[doc_id].append((rank, term, score))
    assert set(got_map) == set(want)
    for doc_id in want:
        g, w = got_map[doc_id], want[doc_id]
        assert [(r, t) for r, t, _ in g] == [(r, t) for r, t, _ in w]
        for (_, _, gs), (_, _, ws) in zip(g, w):
            assert gs == pytest.approx(ws, abs=1e-6)


def test_tfidf_k_validation(built):
    from bitcoin_ledger_2es_ray.pipelines.ngrams import tfidf_top_terms

    res, _, _ = built
    with pytest.raises(ValueError):
        tfidf_top_terms(res.out_dir, res.n_docs, k=0)


def test_bigram_logprob_bruteforce(ray_session):
    import collections
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ngrams import bigram_logprob

    sf = "/root/testdata/sf0.001"
    t = bigram_logprob(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    bc = collections.Counter()
    lc = collections.Counter()
    vocab = set()
    toks = {}
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = txt.split(" ")
        toks[d] = w
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            bc[(a, b)] += 1
            lc[a] += 1
    V = len(vocab)
    want = {}
    for d, w in toks.items():
        if len(w) < 2:
            continue
        lps = [
            math.log((bc[(a, b)] + 1) / (lc[a] + V)) for a, b in zip(w, w[1:])
        ]
        want[d] = round(sum(lps) / len(lps), 6)
    got = dict(zip(t["doc_id"].to_pylist(), t["logprob"].to_pylist()))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d
