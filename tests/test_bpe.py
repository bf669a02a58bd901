"""BPE tokenizer training (pipelines/bpe.py): reference identity,
driver-vs-distributed identity, deterministic tie-breaks, encode shape."""

from __future__ import annotations

import pytest

from bitcoin_ledger_2es_ray.pipelines.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_vocab_stats,
    word_freq_from_dict,
)


def _reference_bpe(word_freq, n_merges):
    """Straight-line reimplementation of Sennrich's algorithm 1 (kept
    deliberately naive and separate from the pipeline code)."""
    words = {}
    for w, c in word_freq:
        words[tuple(list(w) + [EOW])] = words.get(tuple(list(w) + [EOW]), 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), f = best
        merges.append((a, b, f))
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return merges


WF = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("low", 1)]


def test_bpe_matches_reference():
    got = bpe_train(WF, n_merges=8)
    want = _reference_bpe(WF, 8)
    assert list(
        zip(got["left"].to_pylist(), got["right"].to_pylist(), got["freq"].to_pylist())
    ) == want
    assert got["rank"].to_pylist() == list(range(1, len(want) + 1))
    # the classic first merges on this corpus: ('e','s') then ('es','t')
    assert (got["left"][0].as_py(), got["right"][0].as_py()) == ("e", "s")
    assert (got["left"][1].as_py(), got["right"][1].as_py()) == ("es", "t")


def test_bpe_distributed_identical(ray_session):
    a = bpe_train(WF, n_merges=8)
    b = bpe_train(WF, n_merges=8, distributed=True)
    assert a.equals(b)


def test_bpe_tie_breaks_deterministic():
    # both pairs occur once: lexicographically smaller pair wins
    wf = [("ab", 1), ("cd", 1)]
    got = bpe_train(wf, n_merges=1)
    assert (got["left"][0].as_py(), got["right"][0].as_py()) == ("a", "b")
    with pytest.raises(ValueError):
        bpe_train(wf, n_merges=0)


def test_bpe_encode_concats_back():
    merges = bpe_train(WF, n_merges=6)
    for w, _ in WF:
        syms = bpe_encode(w, merges)
        assert "".join(syms) == w + EOW
    stats = bpe_vocab_stats(WF, merges).to_pylist()[0]
    assert stats["n_words"] == sum(c for _, c in WF)
    assert stats["tokens_per_word"] >= 1.0
    assert stats["subword_vocab"] > 0


def test_bpe_from_index_dict(built, ray_session):
    import pyarrow.parquet as pq

    res, _, corpus = built
    wf = word_freq_from_dict(res.out_dir)
    # cf sums must equal the corpus token counts
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    from collections import Counter

    want = Counter(t for d in docs for t in d.split(" "))
    assert dict(wf) == dict(want)
    merges = bpe_train(wf, n_merges=10)
    assert merges.num_rows == 10
    # merge frequencies never increase in a run ordered by rank? (not a BPE
    # invariant in general, but every merge freq is positive and <= corpus
    # token count)
    assert all(0 < f <= sum(want.values()) for f in merges["freq"].to_pylist())


def test_bpe_encode_ranked_identical_to_rank_order():
    """Priority encode == full rank-order sweep, for every corpus word and
    a handful of unseen ones (incl. chars outside the training alphabet)."""
    from bitcoin_ledger_2es_ray.pipelines.bpe import bpe_encode_ranked, merge_ranks

    merges = bpe_train(WF, n_merges=8)
    ranks = merge_ranks(merges)
    for w in ["low", "lower", "newest", "widest", "lowest", "news", "", "zz", "wide"]:
        assert bpe_encode_ranked(w, ranks) == bpe_encode(w, merges), w


def test_bpe_corpus_tokenize_matches_vocab_stats(built, ray_session):
    """The distributed corpus encode's totals == bpe_vocab_stats off the
    word-frequency table (corpus-weighted identity), and per-doc subword
    counts == per-word brute force."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.bpe import (
        bpe_tokenize_corpus,
        bpe_encode_ranked,
        merge_ranks,
    )

    res, _, _ = built
    wf = word_freq_from_dict(res.out_dir)
    merges = bpe_train(wf, n_merges=20)
    got = bpe_tokenize_corpus("/root/testdata/sf0.001", merges, concurrency=2)
    stats = bpe_vocab_stats(wf, merges)
    assert int(sum(got["n_words"].to_pylist())) == stats["n_words"][0].as_py()
    total_sub = float(sum(got["n_subwords"].to_pylist()))
    assert abs(
        total_sub / stats["n_words"][0].as_py()
        - stats["tokens_per_word"][0].as_py()
    ) < 1e-12
    # spot per-doc identity on the first 5 docs
    ranks = merge_ranks(merges)
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 5)
    by_id = {d: n for d, n in zip(got["doc_id"].to_pylist(), got["n_subwords"].to_pylist())}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        exp = sum(len(bpe_encode_ranked(w, ranks)) for w in t.split(" "))
        assert by_id[d] == exp, d


def test_bpe_tokenize_sink(built, ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.bpe import (
        bpe_tokenize_corpus,
        bpe_tokenize_to_parquet,
    )

    res, _, _ = built
    wf = word_freq_from_dict(res.out_dir)
    merges = bpe_train(wf, n_merges=10)
    out = bpe_tokenize_to_parquet(
        "/root/testdata/sf0.001", merges, str(tmp_path / "bpe"), concurrency=2
    )
    sink = pq.read_table(out).sort_by("doc_id")
    direct = bpe_tokenize_corpus("/root/testdata/sf0.001", merges, concurrency=2)
    assert sink.equals(direct.cast(sink.schema))


def test_bpe_priority_encode_property():
    """Hypothesis: for ANY trained merge table (random corpora) and ANY
    word, the priority encoder equals the rank-order sweep and its output
    concatenates back to word + EOW."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitcoin_ledger_2es_ray.pipelines.bpe import (
        bpe_encode,
        bpe_encode_ranked,
        merge_ranks,
    )

    words_st = st.text(alphabet="abcd", min_size=1, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(
        corpus=st.lists(
            st.tuples(words_st, st.integers(min_value=1, max_value=9)),
            min_size=1,
            max_size=6,
        ),
        probe=words_st,
        n_merges=st.integers(min_value=1, max_value=12),
    )
    def check(corpus, probe, n_merges):
        merges = bpe_train(corpus, n_merges=n_merges)
        ranks = merge_ranks(merges)
        got = bpe_encode_ranked(probe, ranks)
        assert got == bpe_encode(probe, merges)
        assert "".join(got) == probe + EOW

    check()
