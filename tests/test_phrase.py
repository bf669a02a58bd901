"""Positional index + phrase/prefix/wildcard queries (round 3).

Oracle strategy: a pure-Python brute-force matcher over the same token
stream (split + positions) checks every engine result on randomized
corpora; determinism/bit-identity checks mirror the non-positional suite.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.functions.codecs import (
    segmented_positions_decode,
    varbyte_encode,
)
from bitcoin_ledger_2es_ray.functions.tokenize import (
    term_counts_positions,
    tokenize_flat,
    tokenize_query_positions,
)


# ---------------------------------------------------------------------------
# tokenizer positions


def test_positions_plain_words():
    terms, doc_idx, dl, pos = tokenize_flat(
        pa.array(["a b c", "x y"]), return_positions=True
    )
    got = sorted(zip(doc_idx.tolist(), pos.tolist(), terms.to_pylist()))
    assert got == [(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (1, 0, "x"), (1, 1, "y")]


def test_positions_parts_share_identifier_slot():
    terms, doc_idx, dl, pos = tokenize_flat(
        pa.array(["foo getBlockHash bar"]), return_positions=True
    )
    by_term = {}
    for t, p in zip(terms.to_pylist(), pos.tolist()):
        by_term.setdefault(t, []).append(p)
    assert by_term["foo"] == [0]
    assert by_term["bar"] == [2]
    # compound + its three parts all sit at the identifier's slot
    for t in ("getblockhash", "get", "block", "hash"):
        assert by_term[t] == [1]


def test_positions_dropped_token_keeps_slot():
    long = "x" * 80  # dropped (over MAX_TOKEN_LEN) but still occupies slot 1
    terms, _, _, pos = tokenize_flat(pa.array([f"a {long} b"]), return_positions=True)
    got = dict(zip(terms.to_pylist(), pos.tolist()))
    assert got == {"a": 0, "b": 2}


def test_query_positions_normalized():
    assert tokenize_query_positions("  b c") == [("b", 0), ("c", 1)]
    assert tokenize_query_positions("") == []


# ---------------------------------------------------------------------------
# positional explode + codec


def test_segmented_positions_roundtrip_random():
    rng = random.Random(7)
    for _ in range(20):
        n_postings = rng.randint(1, 30)
        tfs = np.array([rng.randint(1, 8) for _ in range(n_postings)], dtype=np.uint32)
        flat = []
        for tf in tfs:
            base = sorted(rng.sample(range(100000), int(tf)))
            flat.extend(base)
        flat = np.array(flat, dtype=np.uint64)
        # encode the way term_counts_positions does: per-posting delta streams
        gaps = flat.copy()
        starts = np.cumsum(tfs.astype(np.int64)) - tfs
        gaps[1:] = flat[1:] - flat[:-1]
        gaps[starts] = flat[starts]
        buf, _ = varbyte_encode(gaps)
        out = segmented_positions_decode(buf.tobytes(), tfs)
        np.testing.assert_array_equal(out, flat)


def test_term_counts_positions_matches_bruteforce():
    docs = ["b a b a b", "a a a", "c b a"]
    terms, doc_idx, dl, pos = tokenize_flat(pa.array(docs), return_positions=True)
    doc_ids = np.array([10, 20, 30], dtype=np.uint64)
    t = term_counts_positions(terms, doc_idx, pos, doc_ids)
    want = {}
    for d, text in zip(doc_ids.tolist(), docs):
        for p, tok in enumerate(text.split(" ")):
            want.setdefault((tok, d), []).append(p)
    assert t.num_rows == len(want)
    for term, doc, tf, blob in zip(
        t["term"].to_pylist(),
        t["doc_id"].to_pylist(),
        t["tf"].to_pylist(),
        t["positions"].to_pylist(),
    ):
        exp = want[(term, doc)]
        assert tf == len(exp)
        got = segmented_positions_decode(blob, np.array([tf], dtype=np.uint32))
        assert got.tolist() == exp


# ---------------------------------------------------------------------------
# end-to-end positional index


VOCAB = ["alpha", "beta", "gamma", "delta", "head"]


def _random_corpus(rng: random.Random, n_docs: int) -> list[str]:
    out = []
    for _ in range(n_docs):
        n = rng.randint(3, 12)
        toks = [rng.choice(VOCAB) for _ in range(n)]
        toks += ["head"] * rng.randint(0, 2)  # skew a head term
        rng.shuffle(toks)
        out.append(" ".join(toks))
    return out


def _brute_phrase(docs: list[str], phrase: list[str]) -> list[int]:
    hits = []
    for i, d in enumerate(docs):
        toks = d.split(" ")
        for s in range(len(toks) - len(phrase) + 1):
            if toks[s : s + len(phrase)] == phrase:
                hits.append(i)
                break
    return hits


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    rng = random.Random(13)
    docs = _random_corpus(rng, 120)
    root = tmp_path_factory.mktemp("posidx")
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
        row_group_size=32,
    )
    cfg = BuildConfig(
        corpus=corpus,
        out_dir=str(root / "idx"),
        num_partitions=4,
        with_positions=True,
        # force salting so a head term's slices carry positions too
        head_df_ratio=0.3,
        n_salt=2,
        sketch_stride=1,
    )
    res = build_index(cfg)
    assert res.head_terms, "fixture should salt at least one head term"
    return docs, SegmentStore(res.out_dir), res


def test_phrase_match_randomized(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match

    docs, store, _ = pos_index
    rng = random.Random(99)
    n_checked = 0
    for _ in range(40):
        d = rng.randrange(len(docs))
        toks = docs[d].split(" ")
        ln = rng.randint(1, min(3, len(toks)))
        s = rng.randrange(len(toks) - ln + 1)
        phrase = toks[s : s + ln]
        got = phrase_match(store, " ".join(phrase)).tolist()
        assert got == _brute_phrase(docs, phrase)
        n_checked += 1
    assert n_checked == 40


def test_phrase_match_absent_and_nonadjacent(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match

    docs, store, _ = pos_index
    assert phrase_match(store, "alpha zzzz").tolist() == []
    # a phrase longer than any doc
    assert phrase_match(store, " ".join(["alpha"] * 40)).tolist() == []


def test_phrase_topk_scores_match_filtered_taat(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match, phrase_topk
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    docs, store, _ = pos_index
    # pick a phrase with several matches
    phrase = None
    for cand in (["head", "head"], ["alpha", "beta"], ["beta", "alpha"]):
        if len(_brute_phrase(docs, cand)) >= 2:
            phrase = cand
            break
    assert phrase is not None
    text = " ".join(phrase)
    match = set(phrase_match(store, text).tolist())
    top = phrase_topk(store, text, 10)
    assert {d for d, _ in top} <= match
    # scores equal the full BM25 scores of the same docs for the same terms
    full = dict(score_query(store, " ".join(sorted(set(phrase))), len(docs)))
    for d, s in top:
        assert s == pytest.approx(full[d], rel=0, abs=0)
    # ranks: score desc, doc asc
    keys = [(-s, d) for d, s in top]
    assert keys == sorted(keys)


def test_prefix_and_wildcard(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import prefix_match, wildcard_match

    docs, store, _ = pos_index
    for prefix in ("al", "b", "ga", "zz"):
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(t.startswith(prefix) for t in d.split(" "))
        )
        assert prefix_match(store, prefix).tolist() == want
    # wildcard: *a covers gamma/alpha/beta/delta endings
    import fnmatch

    for pat in ("a*a", "b?ta", "de*", "q*"):
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(fnmatch.fnmatchcase(t, pat) for t in d.split(" "))
        )
        assert wildcard_match(store, pat).tolist() == want
    with pytest.raises(ValueError):
        wildcard_match(store, "*tail")


def test_span_first_brute(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_first_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)
    for term in (vocab[0], vocab[7 % len(vocab)], "zzzznone"):
        for end in (1, 2, 5):
            want = sorted(
                i
                for i, d in enumerate(docs)
                if term in d.split(" ") and d.split(" ").index(term) < end
            )
            assert span_first_match(store, term, end).tolist() == want, (term, end)
    with pytest.raises(ValueError):
        span_first_match(store, vocab[0], 0)


def test_phrase_prefix_brute(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_prefix_match

    docs, store, _ = pos_index
    checked = 0
    for qi in range(30):
        toks = docs[(qi * 7) % len(docs)].split(" ")
        if len(toks) < 4:
            continue
        off = qi % 2
        w1, w2, pf = toks[off], toks[off + 1], toks[off + 2][:2]
        got = phrase_prefix_match(store, f"{w1} {w2}", pf).tolist()
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(
                t[j] == w1 and t[j + 1] == w2 and t[j + 2].startswith(pf)
                for t in [d.split(" ")]
                for j in range(len(t) - 2)
            )
        )
        assert got == want, (w1, w2, pf)
        checked += 1
    assert checked >= 20
    # unknown prefix → empty; max_expansions truncates the dictionary range
    assert phrase_prefix_match(store, "alpha", "zz").tolist() == []


def test_regexp_match_brute(pos_index):
    import re

    from bitcoin_ledger_2es_ray.pipelines.phrase import regexp_match

    docs, store, _ = pos_index
    # prefix-pruned, full-scan (no literal prefix), exact-literal, and the
    # quantifier/alternation cases where naive prefix extraction is unsound
    # ('ga*' matches 'g'; 'al|ga' restarts at position 0)
    for pat in (
        "a.*a", "b[ae]ta", "(al|ga).*", ".*ta", "head", "q.*",
        "ga*", "heads?", "al.?.?a|gamma", "bet+a", "b{0,2}eta",
    ):
        rx = re.compile(pat)
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(rx.fullmatch(t) for t in d.split(" "))
        )
        assert regexp_match(store, pat).tolist() == want, pat


def test_batch_matcher_equals_driver_loop(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        phrase_match,
        run_match_queries,
    )

    docs, store, res = pos_index
    texts = ["alpha beta", "head head", "gamma delta", "zzzz", "beta"]
    queries = pa.table(
        {
            "query_id": pa.array(range(len(texts)), type=pa.uint64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = (
        pa.Table.from_pylist(
            run_match_queries(res.out_dir, queries, mode="phrase", concurrency=2).take_all()
        )
        .sort_by([("query_id", "ascending"), ("doc_id", "ascending")])
    )
    want_rows = []
    for qid, text in enumerate(texts):
        for d in phrase_match(store, text).tolist():
            want_rows.append({"query_id": qid, "doc_id": d})
    assert got.to_pylist() == want_rows


def test_positional_flag_in_fingerprint(ray_session, tmp_path_factory):
    """Toggling with_positions on the same out_dir must REBUILD (different
    build fingerprint), not reuse non-positional checkpoints."""
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    root = tmp_path_factory.mktemp("fpidx")
    corpus = str(root / "corpus.parquet")
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a", "b", "c"],
                "commit": ["c"] * 3,
                "lang": ["en"] * 3,
                "content": ["x y z", "y z x", "z x y"],
            }
        ),
        corpus,
    )
    kw = dict(corpus=corpus, out_dir=str(root / "idx"), num_partitions=2, sketch_stride=1)
    build_index(BuildConfig(**kw))  # plain build
    store = SegmentStore(str(root / "idx"))
    with pytest.raises(ValueError, match="without positions"):
        phrase_match(store, "x y")
    res2 = build_index(BuildConfig(**kw, with_positions=True))  # same dir, flag on
    assert res2.skipped_units == 0, "positional toggle must invalidate phase A"
    store2 = SegmentStore(str(root / "idx"))
    assert phrase_match(store2, "x y").tolist() == [0, 2]


def test_positional_shuffle_modes_bit_identical(ray_session, tmp_path_factory):
    """fs and raydata shuffles must produce byte-identical positional
    segments (positions ride the shuffle; encode re-sorts on a unique key)."""
    import os

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index

    rng = random.Random(5)
    docs = _random_corpus(rng, 60)
    root = tmp_path_factory.mktemp("shufidx")
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
    outs = {}
    for mode in ("fs", "raydata"):
        out = str(root / f"idx_{mode}")
        build_index(
            BuildConfig(
                corpus=corpus,
                out_dir=out,
                num_partitions=3,
                with_positions=True,
                shuffle=mode,
                sketch_stride=1,
            )
        )
        outs[mode] = out
    for sid in range(3):
        fa = os.path.join(outs["fs"], "segments", f"shard-{sid:05d}.parquet")
        fb = os.path.join(outs["raydata"], "segments", f"shard-{sid:05d}.parquet")
        if not (os.path.exists(fa) or os.path.exists(fb)):
            continue
        ta = pq.read_table(fa)
        tb = pq.read_table(fb)
        assert ta.equals(tb), f"shard {sid} differs between shuffle modes"


def test_terms_with_prefix_pruned_equals_eager(pos_index):
    from bitcoin_ledger_2es_ray.state.termdict import TermDict

    _, store, res = pos_index
    import os

    path = os.path.join(res.out_dir, "term_dict.parquet")
    eager = TermDict(path, eager_max_rows=1 << 30)
    pruned = TermDict(path, eager_max_rows=0)
    assert eager.eager and not pruned.eager
    for prefix in ("a", "al", "b", "g", "zz", "head"):
        assert eager.terms_with_prefix(prefix) == pruned.terms_with_prefix(prefix)
    with pytest.raises(ValueError):
        eager.terms_with_prefix("")


def test_rescore_promotes_phrase_matches_within_window(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_match, rescore_topk
    from bitcoin_ledger_2es_ray.pipelines.query import score_query

    docs, store, _ = pos_index
    # pick a phrase that occurs in some docs
    text = " ".join(docs[3].split()[:2])
    matches = set(phrase_match(store, text).tolist())
    assert matches

    base = score_query(store, text, k=20, round_decimals=6)
    got = rescore_topk(store, text, k=10, window=20, round_decimals=6)

    base_doc_set = {d for d, _ in base}
    assert all(d in base_doc_set for d, _ in got)  # window-only rescoring
    # every phrase-matching window doc scores 3x its base; others 1x
    base_of = dict(base)
    for d, s in got:
        want = base_of[d] * (3.0 if d in matches else 1.0)
        assert s == pytest.approx(want, abs=1e-6)
    # phrase-matching docs sort before equal-base non-matching docs
    ranks = {d: i for i, (d, _) in enumerate(got)}
    in_win_matches = [d for d in base_doc_set if d in matches]
    if in_win_matches and len(got) == 10:
        best_match = min(ranks.get(d, 99) for d in in_win_matches)
        assert best_match < 10  # a matching doc made the page


def test_phrase_slop_brute_force_and_slop0_equivalence(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        phrase_match,
        phrase_match_slop,
    )

    docs, store, _ = pos_index

    def brute(phrase_toks, slop):
        out = []
        for d, text in enumerate(docs):
            toks = text.split()
            # chained-gap DP: viable end positions per slot
            viable = [i for i, t in enumerate(toks) if t == phrase_toks[0]]
            for w in phrase_toks[1:]:
                nxt = []
                for i, t in enumerate(toks):
                    if t != w:
                        continue
                    if any(1 <= i - q <= 1 + slop for q in viable):
                        nxt.append(i)
                viable = nxt
            if viable:
                out.append(d)
        return out

    rng = random.Random(99)
    for trial in range(25):
        src = rng.randrange(len(docs))
        toks = docs[src].split()
        ln = rng.choice([2, 2, 3])
        if len(toks) < ln:
            continue
        start = rng.randrange(len(toks) - ln + 1)
        phrase = toks[start : start + ln]
        slop = rng.choice([0, 1, 2])
        got = phrase_match_slop(store, " ".join(phrase), slop=slop).tolist()
        assert got == brute(phrase, slop), (phrase, slop)
        if slop == 0:
            assert got == phrase_match(store, " ".join(phrase)).tolist()

    # widening slop only grows the match set
    phrase = " ".join(docs[0].split()[:2])
    prev: set[int] = set()
    for slop in (0, 1, 3, 8):
        cur = set(phrase_match_slop(store, phrase, slop=slop).tolist())
        assert prev <= cur
        prev = cur


def test_span_near_brute(pos_index):
    """span_near vs a positional brute force: unordered and in_order, with
    the same-term self-pair exclusion."""
    import random

    from bitcoin_ledger_2es_ray.pipelines.phrase import span_near_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)

    def brute(t1, t2, slop, in_order):
        out = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            p1s = [p for p, t in enumerate(toks) if t == t1]
            p2s = [p for p, t in enumerate(toks) if t == t2]
            hit = any(
                (0 < p2 - p1 <= slop + 1)
                if in_order
                else (1 <= abs(p2 - p1) <= slop + 1)
                for p1 in p1s
                for p2 in p2s
            )
            if hit:
                out.append(i)
        return out

    rng = random.Random(7)
    for _ in range(30):
        t1 = vocab[rng.randrange(len(vocab))]
        t2 = vocab[rng.randrange(len(vocab))]
        slop = rng.choice([0, 1, 2, 4])
        for in_order in (False, True):
            got = span_near_match(store, t1, t2, slop=slop, in_order=in_order)
            assert got.tolist() == brute(t1, t2, slop, in_order), (
                t1, t2, slop, in_order,
            )
    # same-term query: a position never pairs with itself
    t = vocab[0]
    assert span_near_match(store, t, t, slop=0).tolist() == brute(t, t, 0, False)
    # missing term matches nothing
    assert span_near_match(store, "zzzznone", vocab[0], slop=3).tolist() == []
    with pytest.raises(ValueError):
        span_near_match(store, t, t, slop=-1)


def test_span_not_brute(pos_index):
    import random

    from bitcoin_ledger_2es_ray.pipelines.phrase import span_not_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)

    def brute(inc, exc, pre, post):
        out = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            pis = [p for p, t in enumerate(toks) if t == inc]
            pes = {p for p, t in enumerate(toks) if t == exc}
            if any(
                not any(p - pre <= q <= p + post for q in pes) for p in pis
            ):
                out.append(i)
        return out

    rng = random.Random(11)
    for _ in range(30):
        inc = vocab[rng.randrange(len(vocab))]
        exc = vocab[rng.randrange(len(vocab))]
        pre = rng.choice([0, 1, 2])
        post = rng.choice([0, 1, 2])
        got = span_not_match(store, inc, exc, pre=pre, post=post)
        assert got.tolist() == brute(inc, exc, pre, post), (inc, exc, pre, post)
    # absent exclude term: include's doc set verbatim
    t = vocab[3 % len(vocab)]
    assert span_not_match(store, t, "zzzznone").tolist() == brute(t, "zzzznone", 0, 0)
    assert span_not_match(store, "zzzznone", t).tolist() == []
    with pytest.raises(ValueError):
        span_not_match(store, t, t, pre=-1)


# ---------------------------------------------------------------------------
# phrase suggester


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = dp
        dp = [i] + [0] * lb
        for j in range(1, lb + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[lb]


def test_phrase_suggest_bruteforce(built):
    import collections

    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_suggest
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    sf = "/root/testdata/sf0.001"
    res, _, _ = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
    cf: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    for d in docs:
        toks = d.split(" ")
        cf.update(toks)
        bi.update(zip(toks, toks[1:]))
    vocab = sorted(cf)

    queries = []
    for q in range(6):
        w1 = vocab[(3 * q + 1) % len(vocab)]
        t = vocab[(5 * q + 2) % len(vocab)]
        p = q % len(t)
        w2 = t[:p] + t[p + 1 :] if len(t) > 1 else t
        queries.append((q, w1, w2))

    out = phrase_suggest(store, sf, queries, k=3, max_dist=1)
    got = collections.defaultdict(list)
    for r in out.to_pylist():
        got[r["query_id"]].append((r["t1"], r["t2"], r["dist"], r["pair_count"]))

    for qid, w1, w2 in queries:
        c1 = [(t, _lev(t, w1)) for t in vocab if _lev(t, w1) <= 1]
        c2 = [(t, _lev(t, w2)) for t in vocab if _lev(t, w2) <= 1]
        rows = sorted(
            (e1 + e2, -bi.get((t1, t2), 0), -(cf[t1] * cf[t2]), t1, t2)
            for t1, e1 in c1
            for t2, e2 in c2
        )
        want = [(t1, t2, d, -negn) for d, negn, _, t1, t2 in rows[:3]]
        assert got[qid] == want, (qid, w1, w2)


def test_phrase_suggest_no_candidates(built):
    from bitcoin_ledger_2es_ray.pipelines.phrase import phrase_suggest
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    out = phrase_suggest(
        store, "/root/testdata/sf0.001", [(0, "zzzzzzzzzzzz", "qqqqqqqqqqqq")], k=3
    )
    assert out.num_rows == 0


def test_intervals_match_brute(pos_index):
    """intervals (3 terms, ordered/unordered, max_gaps) vs positional
    brute force over every doc."""
    import itertools
    import random

    from bitcoin_ledger_2es_ray.pipelines.phrase import intervals_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)

    def brute(terms, g, ordered):
        out = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            plists = [[p for p, t in enumerate(toks) if t == term] for term in terms]
            if any(not pl for pl in plists):
                continue
            hit = False
            for combo in itertools.product(*plists):
                if ordered and not all(
                    combo[j] < combo[j + 1] for j in range(len(combo) - 1)
                ):
                    continue
                if max(combo) - min(combo) - (len(terms) - 1) <= g:
                    hit = True
                    break
            if hit:
                out.append(i)
        return out

    rng = random.Random(11)
    for _ in range(20):
        terms = rng.sample(vocab, 3)
        g = rng.choice([0, 1, 2, 5])
        for ordered in (False, True):
            got = intervals_match(store, terms, max_gaps=g, ordered=ordered)
            assert got.tolist() == brute(terms, g, ordered), (terms, g, ordered)
    with pytest.raises(ValueError):
        intervals_match(store, [vocab[0], vocab[0]], max_gaps=1)
    with pytest.raises(ValueError):
        intervals_match(store, [vocab[0]], max_gaps=1)
    with pytest.raises(ValueError):
        intervals_match(store, [vocab[0], vocab[1]], max_gaps=-1)


def test_completion_fuzzy_bruteforce(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import completion_fuzzy

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp = dp, [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (ca != cb))
        return dp[-1]

    docs, store, _ = pos_index
    vocab = sorted(store.df)
    for q in [vocab[0][:3], vocab[1][:1] + "z" + vocab[1][2:3], "zzz"]:
        got = completion_fuzzy(store, q, k=5)
        cands = [t for t in vocab if lev(t[: len(q)], q) <= 1]
        want = sorted(
            ((t, store.td.df_of(t)) for t in cands), key=lambda x: (-x[1], x[0])
        )[:5]
        assert got == want, q


def test_suffix_match_bruteforce(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import suffix_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)
    for sfx in [vocab[0][-2:], vocab[3][-1:], "zz"]:
        got = suffix_match(store, sfx)
        want = sorted(
            {
                i
                for i, d in enumerate(docs)
                if any(tok.endswith(sfx) for tok in d.split(" "))
            }
        )
        assert got.tolist() == want, sfx


def test_span_containing_within_brute(pos_index):
    """span_containing / span_within vs positional brute force: big =
    ordered [t1..t2] within gap, little = t3; containing counts distinct
    big spans with a little inside, within counts distinct covered little
    positions — randomized over the shared fixture vocab."""
    import random

    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        span_containing_match,
        span_within_match,
    )

    docs, store, _ = pos_index
    vocab = sorted(store.df)

    def brute(t1, t2, t3, gap):
        cont, within = {}, {}
        for i, d in enumerate(docs):
            toks = d.split(" ")
            p1s = [p for p, t in enumerate(toks) if t == t1]
            p2s = [p for p, t in enumerate(toks) if t == t2]
            p3s = [p for p, t in enumerate(toks) if t == t3]
            spans = [
                (a, b) for a in p1s for b in p2s if 1 <= b - a <= gap
            ]
            nc = sum(1 for a, b in spans if any(a <= p <= b for p in p3s))
            nw = sum(1 for p in p3s if any(a <= p <= b for a, b in spans))
            if nc:
                cont[i] = nc
            if nw:
                within[i] = nw
        return cont, within

    rng = random.Random(11)
    checked_diff = False
    for _ in range(25):
        t1 = vocab[rng.randrange(len(vocab))]
        t2 = vocab[rng.randrange(len(vocab))]
        t3 = vocab[rng.randrange(len(vocab))]
        gap = rng.choice([1, 2, 3, 5])
        want_c, want_w = brute(t1, t2, t3, gap)
        got_c = span_containing_match(store, t1, t2, t3, gap=gap)
        got_w = span_within_match(store, t1, t2, t3, gap=gap)
        assert {
            int(d): int(n)
            for d, n in zip(got_c["doc_id"].to_pylist(), got_c["n"].to_pylist())
        } == want_c, (t1, t2, t3, gap, "containing")
        assert {
            int(d): int(n)
            for d, n in zip(got_w["doc_id"].to_pylist(), got_w["n"].to_pylist())
        } == want_w, (t1, t2, t3, gap, "within")
        if want_c and want_c != want_w:
            checked_diff = True
    # the two operators matched at least one case where their counts differ
    # (overlapping spans / multiple littles) — they are not the same op
    assert checked_diff
    # missing terms
    assert span_containing_match(store, "zzz", vocab[0], vocab[1]).num_rows == 0
    assert span_within_match(store, vocab[0], "zzz", vocab[1]).num_rows == 0


def test_span_or_near_brute(pos_index):
    """span_or (union of alternatives) feeding span_near vs brute force."""
    import random

    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        span_near_match,
        span_or_near_match,
    )

    docs, store, _ = pos_index
    vocab = sorted(store.df)

    def brute(alts, t2, slop):
        out = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            p1s = [p for p, t in enumerate(toks) if t in alts]
            p2s = [p for p, t in enumerate(toks) if t == t2]
            if any(1 <= abs(b - a) <= slop + 1 for a in p1s for b in p2s):
                out.append(i)
        return out

    rng = random.Random(5)
    for _ in range(20):
        alts = [vocab[rng.randrange(len(vocab))] for _ in range(rng.choice([1, 2, 3]))]
        t2 = vocab[rng.randrange(len(vocab))]
        slop = rng.choice([0, 1, 3])
        got = span_or_near_match(store, alts, t2, slop=slop)
        assert got.tolist() == brute(alts, t2, slop), (alts, t2, slop)
    # single alternative degenerates to plain unordered span_near
    a, b = vocab[2 % len(vocab)], vocab[9 % len(vocab)]
    assert (
        span_or_near_match(store, [a], b, slop=2).tolist()
        == span_near_match(store, a, b, slop=2, in_order=False).tolist()
    )
    # no alternatives present -> empty
    assert span_or_near_match(store, ["zzznope"], b, slop=2).tolist() == []


def test_span_field_masking_brute(pos_index, tmp_path_factory):
    """field_masking_span vs brute force: t1 from the text field, t2 from
    the token-reversed masked field — masked token i == reverse(text token
    i) by construction, so a brute matcher over the primary tokens with
    reversed t2 is the exact oracle."""
    import random

    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.fields import derive_masked_corpus
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_field_masking_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    import os

    docs, store, res = pos_index
    root = tmp_path_factory.mktemp("maskidx")
    corpus = os.path.join(os.path.dirname(res.out_dir), "corpus.parquet")
    masked_dir = derive_masked_corpus(corpus, str(root / "corpus_m"))
    mres = build_index(
        BuildConfig(
            corpus=masked_dir,
            out_dir=str(root / "idx_m"),
            num_partitions=4,
            with_positions=True,
            head_df_ratio=0.3,
            n_salt=2,
            sketch_stride=1,
        )
    )
    mstore = SegmentStore(mres.out_dir)

    def brute(t1, t2rev, slop):
        out = []
        for i, d in enumerate(docs):
            toks = d.split(" ")
            p1s = [p for p, t in enumerate(toks) if t == t1]
            p2s = [p for p, t in enumerate(toks) if t[::-1] == t2rev]
            if any(1 <= abs(b - a) <= slop + 1 for a in p1s for b in p2s):
                out.append(i)
        return out

    vocab = sorted(store.df)
    rng = random.Random(23)
    for _ in range(15):
        t1 = vocab[rng.randrange(len(vocab))]
        t2 = vocab[rng.randrange(len(vocab))][::-1]
        slop = rng.choice([0, 1, 3])
        got = span_field_masking_match(store, mstore, t1, t2, slop=slop)
        assert got.tolist() == brute(t1, t2, slop), (t1, t2, slop)
    # unknown masked term -> empty
    assert span_field_masking_match(store, mstore, vocab[0], "zz", slop=2).tolist() == []


# ---------------------------------------------------------------------------
# search_as_you_type (main bool_prefix + _2gram shingle subfield)


def _brute_sayt(docs: list[str], w1: str, w2: str, p: str, k: int):
    import math

    tokdocs = [d.split(" ") for d in docs]
    dls = [len(t) for t in tokdocs]
    n = len(docs)
    avgdl = sum(dls) / n

    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    scores: dict[int, float] = {}
    for t in sorted({w1, w2}):
        df = sum(1 for td in tokdocs if t in td)
        if df == 0:
            continue
        for i, td in enumerate(tokdocs):
            tf = td.count(t)
            if tf:
                scores[i] = scores.get(i, 0.0) + idf(df) * tf / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl)
                )
    for i, td in enumerate(tokdocs):
        if any(t.startswith(p) for t in td):
            scores[i] = scores.get(i, 0.0) + 1.0
    btf = {
        i: sum(1 for a, b in zip(td, td[1:]) if a == w1 and b == w2)
        for i, td in enumerate(tokdocs)
    }
    bd = sorted(i for i, c in btf.items() if c)
    if bd:
        df2, avgdl2 = len(bd), avgdl - 1.0
        for i in bd:
            c = btf[i]
            scores[i] = scores.get(i, 0.0) + idf(df2) * c / (
                c + 1.2 * (1 - 0.75 + 0.75 * (dls[i] - 1) / avgdl2)
            )
    for i, td in enumerate(tokdocs):
        if any(a == w2 and b.startswith(p) for a, b in zip(td, td[1:])):
            scores[i] = scores.get(i, 0.0) + 1.0
    ranked = sorted(((round(s, 6), i) for i, s in scores.items()), key=lambda x: (-x[0], x[1]))
    return [(i, s) for s, i in ranked[:k]]


def test_search_as_you_type_brute_force(pos_index):
    from bitcoin_ledger_2es_ray.pipelines.phrase import search_as_you_type_topk

    docs, store, _ = pos_index
    rng = random.Random(1234)
    checked = 0
    for _ in range(30):
        d = rng.randrange(len(docs))
        toks = docs[d].split(" ")
        if len(toks) < 3:
            continue
        j = rng.randrange(len(toks) - 2)
        w1, w2, p = toks[j], toks[j + 1], toks[j + 2][:1]
        got = search_as_you_type_topk(store, f"{w1} {w2}", p, 10, round_decimals=6)
        want = _brute_sayt(docs, w1, w2, p, 10)
        assert [g[0] for g in got] == [w[0] for w in want], (w1, w2, p)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=2e-6)
        checked += 1
    assert checked >= 20


def test_span_multi_expansion_brute_force(pos_index):
    """span_multi: prefix rewrite == brute-force window scan over every
    dictionary term sharing the prefix; the cap raises loudly."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import span_multi_near_match

    docs, store, _ = pos_index
    rng = random.Random(7)
    checked = 0
    for _ in range(30):
        words = docs[rng.randrange(len(docs))].split(" ")
        i = rng.randrange(len(words) - 1)
        pre, t2 = words[i][:2], words[i + 1]
        got = span_multi_near_match(store, pre + "*", t2, slop=2).tolist()
        want = set()
        for d_i, text in enumerate(docs):
            ws = text.split(" ")
            for a, wa in enumerate(ws):
                if not wa.startswith(pre):
                    continue
                for b, wb in enumerate(ws):
                    if wb == t2 and 1 <= abs(b - a) <= 3:
                        want.add(d_i)
        assert got == sorted(want), (pre, t2)
        checked += len(want)
    assert checked > 0
    # fuzzy form routes through the dictionary's DL scan
    w0 = docs[0].split(" ")[0]
    fz = span_multi_near_match(store, f"{w0}~1", docs[0].split(" ")[1], slop=2)
    assert len(fz) > 0
    with pytest.raises(ValueError, match="max_expansions"):
        span_multi_near_match(store, "a*", "b", slop=1, max_expansions=0)
    with pytest.raises(ValueError, match="leading-wildcard"):
        span_multi_near_match(store, "*ab", "b")


def test_fuzzy_auto_ladder(pos_index):
    """fuzziness AUTO: 0 edits under 3 chars, 1 for 3-5, 2 above."""
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)
    short = next((t for t in vocab if len(t) < 3), None)
    mid = next((t for t in vocab if 3 <= len(t) <= 5), None)
    long = next((t for t in vocab if len(t) > 5), None)
    if short is not None:
        assert fuzzy_match(store, short, "AUTO").tolist() == fuzzy_match(
            store, short, 0
        ).tolist()
    if mid is not None:
        assert fuzzy_match(store, mid, "AUTO").tolist() == fuzzy_match(
            store, mid, 1
        ).tolist()
    if long is not None:
        assert fuzzy_match(store, long, "AUTO").tolist() == fuzzy_match(
            store, long, 2
        ).tolist()
    with pytest.raises(ValueError, match="bad fuzziness"):
        fuzzy_match(store, "abc", "SOMETIMES")


def test_completion_contexts_brute_force(ray_session):
    """Context filtering: popularity ranks within the lang's docs only; a
    different context reorders/filters the same prefix."""
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.phrase import (
        build_context_popularity,
        completion_contexts,
    )

    sf = "/root/testdata/sf0.001"
    pop = build_context_popularity(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text", "lang"])
    by_lang: dict[str, Counter] = {}
    for text, lang in zip(docs["text"].to_pylist(), docs["lang"].to_pylist()):
        by_lang.setdefault(lang, Counter()).update(set(text.split(" ")))
    for lang in ("en", "zh"):
        got = completion_contexts(pop, "s", lang, k=5)
        want = sorted(
            ((t, n) for t, n in by_lang[lang].items() if t.startswith("s")),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        assert got == want, lang
    # unknown context: empty, never an error
    assert completion_contexts(pop, "s", "klingon", k=5) == []


def test_wildcard_field_trigram_identity(pos_index):
    """Trigram-pruned glob == brute-force glob over the vocabulary, for
    prefix, leading-wildcard and infix patterns; the pruning only removes
    non-matching terms, never hits."""
    import fnmatch as _fn

    from bitcoin_ledger_2es_ray.pipelines.phrase import wildcard_field_match

    docs, store, _ = pos_index
    vocab = sorted(store.df)
    patterns = []
    for t in vocab[:20]:
        patterns += [t[:2] + "*", "*" + t[-2:], t[0] + "*" + t[-1], "*" + t[1:-1] + "*"]
    checked = 0
    for p in patterns:
        got = wildcard_field_match(store, p).tolist()
        want = set()
        for i, text in enumerate(docs):
            if any(_fn.fnmatch(w, p) for w in text.split(" ")):
                want.add(i)
        assert got == sorted(want), p
        checked += len(want)
    assert checked > 0
