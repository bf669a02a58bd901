"""Round-3 ES-analog operators: fuzzy queries (vectorized Levenshtein),
terms/histogram aggregations, more-like-this, search_after pagination."""

from __future__ import annotations

import math
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# editdist kernel


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = dp
        dp = [i] + [0] * lb
        for j in range(1, lb + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[lb]


def test_levenshtein_leq_randomized():
    from bitcoin_ledger_2es_ray.functions.editdist import levenshtein_leq

    rng = random.Random(7)
    alphabet = "abcx"
    for _ in range(30):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
        terms = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
            for _ in range(50)
        ]
        for d in (0, 1, 2):
            got = levenshtein_leq(q, terms, d)
            want = np.array([_lev_ref(q, t) <= d for t in terms])
            assert (got == want).all(), (q, d)


def _dl_ref(a: str, b: str) -> int:
    """Reference TRUE Damerau-Levenshtein (Lowrance–Wagner), O(n·m·alphabet)."""
    la, lb = len(a), len(b)
    inf = la + lb
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k, l = da.get(b[j - 1], 0), db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost, d[i + 1][j] + 1, d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def test_damerau_leq_randomized():
    from bitcoin_ledger_2es_ray.functions.editdist import damerau_leq

    rng = random.Random(13)
    alphabet = "abcx"
    for _ in range(25):
        q = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
        terms = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 7)))
            for _ in range(50)
        ]
        for d in (0, 1, 2):
            got = damerau_leq(q, terms, d)
            want = np.array([_dl_ref(q, t) <= d for t in terms])
            assert (got == want).all(), (q, d)


def test_damerau_unrestricted_not_osa():
    # the classic discriminator: OSA('CA','ABC') = 3, true DL = 2
    from bitcoin_ledger_2es_ray.functions.editdist import damerau_leq

    assert damerau_leq("CA", ["ABC"], 2).tolist() == [True]
    assert damerau_leq("CA", ["ABC"], 1).tolist() == [False]
    # plain swap is distance 1; a swap is 2 under plain Levenshtein
    assert damerau_leq("ab", ["ba"], 1).tolist() == [True]


def test_fuzzy_match_transpositions(built):
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    vocab = sorted(store.df)
    rng = random.Random(17)
    for _ in range(4):
        t = rng.choice(vocab)
        if len(t) > 1:
            p = rng.randrange(len(t) - 1)
            q = t[:p] + t[p + 1] + t[p] + t[p + 2 :]
        else:
            q = t
        got = fuzzy_match(store, q, max_dist=1, transpositions=True).tolist()
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(_dl_ref(q, tok) <= 1 for tok in set(d.split(" ")))
        )
        assert got == want


def test_fuzzy_scan_table_prunes_and_matches():
    from bitcoin_ledger_2es_ray.functions.editdist import fuzzy_scan_table

    col = pa.array(["alpha", "alphx", "alphxy", "beta", "", "a"])
    got = fuzzy_scan_table(col, "alpha", 1)
    assert got.tolist() == [True, True, False, False, False, False]
    assert fuzzy_scan_table(pa.array([], type=pa.string()), "x", 1).tolist() == []
    # empty query: matches terms of length <= max_dist
    assert fuzzy_scan_table(col, "", 1).tolist() == [False] * 4 + [True, True]


# ---------------------------------------------------------------------------
# dictionary scan + posting union (uses the session-built sf0.001 index)


def test_terms_fuzzy_eager_equals_pruned_equals_brute(built):
    from bitcoin_ledger_2es_ray.state.termdict import TermDict

    res, _, _ = built
    td_path = f"{res.out_dir}/term_dict.parquet"
    eager = TermDict(td_path)
    pruned = TermDict(td_path, eager_max_rows=0)
    assert eager.eager and not pruned.eager
    vocab = sorted(eager.df)
    rng = random.Random(3)
    for _ in range(5):
        t = rng.choice(vocab)
        p = rng.randrange(len(t))
        q = t[:p] + t[p + 1 :] if len(t) > 1 else t
        want = sorted(v for v in vocab if _lev_ref(q, v) <= 1)
        assert eager.terms_fuzzy(q, 1) == want
        assert pruned.terms_fuzzy(q, 1) == want


def test_fuzzy_match_brute_force(built):
    from bitcoin_ledger_2es_ray.pipelines.phrase import fuzzy_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, oracle, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    vocab = sorted(store.df)
    rng = random.Random(11)
    for _ in range(4):
        t = rng.choice(vocab)
        q = t[:-1] if len(t) > 1 else t
        got = fuzzy_match(store, q, max_dist=1).tolist()
        want = sorted(
            i
            for i, d in enumerate(docs)
            if any(_lev_ref(q, tok) <= 1 for tok in set(d.split(" ")))
        )
        assert got == want


# ---------------------------------------------------------------------------
# aggregations


@pytest.fixture(scope="module")
def hitset(built):
    """A deterministic (query_id, doc_id) hit table over the sf0.001 index."""
    res, _, corpus = built
    docs = pq.read_table(corpus, columns=["content", "lang"])
    n = docs.num_rows
    qids, dids = [], []
    for q in range(6):
        for d in range((q * 13) % 5, n, 3 + q % 4):
            qids.append(q)
            dids.append(d)
    return (
        pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(dids, type=pa.int64()),
            }
        ),
        docs,
        res,
    )


def test_terms_agg_matches_pandas(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_agg

    matches, docs, res = hitset
    got = terms_agg(res.out_dir, matches, field="lang").to_pandas()
    langs = docs["lang"].to_pylist()
    want: dict[tuple[int, str], int] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        want[(q, langs[d])] = want.get((q, langs[d]), 0) + 1
    got_d = {
        (q, l): c
        for q, l, c in zip(got["query_id"], got["lang"], got["doc_count"])
    }
    assert got_d == want
    # sorted by (query_id, lang)
    keys = list(zip(got["query_id"], got["lang"]))
    assert keys == sorted(keys)


def test_histogram_agg_matches_pandas(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_agg

    matches, docs, res = hitset
    got = histogram_agg(res.out_dir, matches, interval=8).to_pandas()
    dls = [len(t.split(" ")) for t in docs["content"].to_pylist()]
    want: dict[tuple[int, int], int] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        b = (dls[d] // 8) * 8
        want[(q, b)] = want.get((q, b), 0) + 1
    got_d = {
        (q, b): c
        for q, b, c in zip(got["query_id"], got["bucket"], got["doc_count"])
    }
    assert got_d == want


def test_terms_agg_rejects_unknown_field(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_agg

    matches, _, res = hitset
    with pytest.raises(ValueError):
        terms_agg(res.out_dir, matches, field="dl")


def test_agg_empty_hitset(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_agg, terms_agg

    _, _, res = hitset
    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
        }
    )
    assert terms_agg(res.out_dir, empty).num_rows == 0
    assert histogram_agg(res.out_dir, empty).num_rows == 0


# ---------------------------------------------------------------------------
# more-like-this


def _brute_mlt(docs: list[str], src: int, n_terms: int, k: int):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round

    split = [d.split(" ") for d in docs]
    n = len(docs)
    df: dict[str, int] = {}
    for toks in split:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    avgdl = sum(len(t) for t in split) / n

    def idf(t):
        return math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))

    src_tf: dict[str, int] = {}
    for t in split[src]:
        src_tf[t] = src_tf.get(t, 0) + 1
    sel = sorted(
        src_tf,
        key=lambda t: (-sql_round(np.array([src_tf[t] * idf(t)]), 6)[0], t),
    )[:n_terms]
    scores: dict[int, float] = {}
    for d in range(n):
        if d == src:
            continue
        tf = {t: split[d].count(t) for t in sel if t in split[d]}
        if not tf:
            continue
        s = sum(
            idf(t) * f / (f + 1.2 * (1 - 0.75 + 0.75 * len(split[d]) / avgdl))
            for t, f in tf.items()
        )
        scores[d] = float(sql_round(np.array([s]), 6)[0])
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def test_more_like_this_brute_force(built):
    from bitcoin_ledger_2es_ray.pipelines.mlt import more_like_this
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    for src in (0, 7, 23):
        got = more_like_this(store, res.out_dir, src, n_terms=5, k=8, round_decimals=6)
        want = _brute_mlt(docs, src, 5, 8)
        assert [(int(d), s) for d, s in got] == [(d, pytest.approx(s)) for d, s in want]
        assert all(int(d) != src for d, _ in got)


def test_terms_lookup_matches_brute_force(built):
    from bitcoin_ledger_2es_ray.pipelines.mlt import terms_lookup_match
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    split = [d.split(" ") for d in docs]
    df = {}
    for toks in split:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    for src in (0, 5, 19):
        sel, hits = terms_lookup_match(store, res.out_dir, src, n_terms=3)
        want_sel = sorted(
            sorted(set(split[src]), key=lambda t: (df[t], t))[:3]
        )
        assert sel == want_sel
        want_hits = sorted(
            i for i, toks in enumerate(split) if any(t in toks for t in sel)
        )
        assert [int(d) for d in hits] == want_hits
        assert src in want_hits  # the lookup doc contains its own terms


def test_mlt_actor_pool_matches_single(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.mlt import more_like_this, run_mlt_queries
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    srcs = pa.table(
        {
            "query_id": pa.array([0, 1, 2], type=pa.uint64()),
            "src_doc": pa.array([4, 9, 16], type=pa.uint64()),
        }
    )
    rows = run_mlt_queries(res.out_dir, srcs, n_terms=4, k=5, concurrency=2).take_all()
    got: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(int(r["query_id"]), []).append((int(r["doc_id"]), r["score"]))
    for qid, src in zip([0, 1, 2], [4, 9, 16]):
        want = [(int(d), s) for d, s in more_like_this(store, res.out_dir, src, 4, 5)]
        assert got.get(qid, []) == want


# ---------------------------------------------------------------------------
# search_after pagination


def test_search_after_pages_tile_the_full_ranking(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, search_after

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    text = " ".join(vocab[i % len(vocab)] for i in (1, 17, 33))
    full = search_after(store, text, 10**9, None, round_decimals=6)
    assert len(full) > 6
    k = 3
    pages, cursor = [], None
    while True:
        page = search_after(store, text, k, cursor, round_decimals=6)
        if not page:
            break
        pages.extend(page)
        cursor = (page[-1][1], page[-1][0])
        if len(page) < k:
            break
    assert pages == full
    # cursor mid-ranking: strictly-after semantics
    s0, d0 = full[1][1], full[1][0]
    assert search_after(store, text, k, (s0, d0), round_decimals=6) == full[2 : 2 + k]


def test_search_after_unknown_terms_empty(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, search_after

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    assert search_after(store, "zzzzzz qqqqqq", 5, None) == []


# ---------------------------------------------------------------------------
# significant_terms


def test_significant_terms_matches_brute_force(hitset, ray_session):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.functions.tokenize import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    matches, docs, res = hitset
    store = SegmentStore(res.out_dir)
    got = significant_terms(res.out_dir, store, matches, n_top=5).to_pandas()

    # brute force: per-doc distinct term sets from the corpus content
    doc_terms = [set(tokenize_query(t)) for t in docs["content"].to_pylist()]
    n = float(store.n_docs)
    bg = {}
    for s in doc_terms:
        for t in s:
            bg[t] = bg.get(t, 0) + 1
    want_rows = []
    by_q: dict[int, list[int]] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        by_q.setdefault(q, []).append(d)
    for q in sorted(by_q):
        fgs = float(len(by_q[q]))
        fg: dict[str, int] = {}
        for d in by_q[q]:
            for t in doc_terms[d]:
                fg[t] = fg.get(t, 0) + 1
        scored = []
        for t, f in fg.items():
            fp, bp = f / fgs, bg[t] / n
            sc = float(sql_round((fp - bp) * (fp / bp), 6))
            if sc > 0:
                scored.append((t, f, bg[t], sc))
        scored.sort(key=lambda r: (-r[3], r[0]))
        want_rows.extend((q, t, f, b, sc) for t, f, b, sc in scored[:5])
    want_rows.sort(key=lambda r: (r[0], r[1]))

    got_rows = list(
        zip(got["query_id"], got["term"], got["fg_df"], got["bg_df"], got["score"])
    )
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        assert (g[0], g[1], g[2], g[3]) == (w[0], w[1], w[2], w[3])
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_significant_text_dedups_exact_duplicates(ray_session, tmp_path):
    """filter_duplicate_text: mirrored docs collapse to one before fg
    counting — the boilerplate term loses its fake significance."""
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms, significant_text
    from bitcoin_ledger_2es_ray.pipelines.build import BuildConfig, build_index
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    # doc 0..2 identical boilerplate; 3-5 distinct; 6-9 background
    docs = (
        ["spam spam boiler"] * 3
        + ["alpha beta", "alpha gamma", "alpha delta"]
        + ["noise one", "noise two", "noise three", "noise four"]
    )
    corpus = str(tmp_path / "corpus.parquet")
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
        row_group_size=4,
    )
    res = build_index(
        BuildConfig(corpus=corpus, out_dir=str(tmp_path / "idx"), num_partitions=3)
    )
    store = SegmentStore(res.out_dir)
    # one query hitting the three mirrors + the three alpha docs
    matches = pa.table(
        {
            "query_id": pa.array([0] * 6, type=pa.int64()),
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        }
    )
    got = significant_text(corpus, store, matches, n_top=10).to_pandas()
    by_term = {r["term"]: r for _, r in got.iterrows()}
    # deduped foreground = {mirror, alpha×3} → 4 docs; alpha fg_df 3
    assert by_term["alpha"]["fg_df"] == 3
    n, fgs = float(store.n_docs), 4.0
    fp, bp = 3 / fgs, 3 / n
    assert by_term["alpha"]["score"] == pytest.approx(
        float(sql_round((fp - bp) * (fp / bp), 6)), abs=1e-9
    )
    # the boilerplate terms fall OUT entirely: deduped fg_pct (1/4) drops
    # below bg_pct (3/10), so they are no longer positively significant
    assert "spam" not in by_term and "boiler" not in by_term
    # while index-side significant_terms (no dedup) still promotes them
    st = significant_terms(res.out_dir, store, matches, n_top=10).to_pandas()
    st_by_term = {r["term"]: r for _, r in st.iterrows()}
    assert st_by_term["spam"]["fg_df"] == 3 and st_by_term["spam"]["score"] > 0


def test_significant_terms_empty_hitset(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    _, _, res = hitset
    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
        }
    )
    out = significant_terms(res.out_dir, SegmentStore(res.out_dir), empty)
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "term", "fg_df", "bg_df", "score"]


# ---------------------------------------------------------------------------
# function_score + date_histogram


def test_function_score_reweights_full_ranking(built):
    import os

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        function_score_query,
        score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    fwd = pq.read_table(os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "dl"])
    dl_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["dl"].to_pylist()))

    texts = fixture_queries(sorted(store.df), n=10, k=10)["text"].to_pylist()
    for t in texts:
        base = score_query(store, t, k=store.n_docs)  # full unrounded ranking
        want = sorted(
            (
                (d, float(sql_round(s * math.log1p(dl_of[d]), 6)))
                for d, s in base
            ),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        got = function_score_query(store, t, 10, round_decimals=6)
        assert got == want, t


def test_date_histogram_stats_matches_pandas(ray_session):
    import pandas as pd

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.events import date_histogram_stats

    sf = "/root/testdata/sf0.001"
    got = date_histogram_stats(sf, interval_s=86400).to_pandas()

    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "value"]).to_pandas()
    sec = ev["ts"].astype("int64") // 1_000_000
    ev["bucket_s"] = (sec // 86400) * 86400
    want = (
        ev.groupby("bucket_s")["value"]
        .agg(doc_count="count", min_value="min", max_value="max", sum_value="sum")
        .reset_index()
        .sort_values("bucket_s")
        .reset_index(drop=True)
    )
    assert got["bucket_s"].tolist() == want["bucket_s"].tolist()
    assert got["doc_count"].tolist() == want["doc_count"].tolist()
    for col in ("min_value", "max_value", "sum_value"):
        np.testing.assert_allclose(
            got[col].to_numpy(),
            np.asarray(sql_round(want[col].to_numpy(dtype=float), 6)),
            atol=1e-9,
        )
    np.testing.assert_allclose(
        got["avg_value"].to_numpy(),
        np.asarray(
            sql_round(
                want["sum_value"].to_numpy(dtype=float)
                / want["doc_count"].to_numpy(dtype=float),
                6,
            )
        ),
        atol=1e-9,
    )


def test_percentiles_agg_matches_numpy_linear(built, ray_session):
    import os

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentiles_agg

    res, _, _ = built
    qs = (0.1, 0.333, 0.5, 0.777, 0.95)  # odd quantiles force interpolation
    got = percentiles_agg(res.out_dir, quantiles=qs).to_pandas()
    dls = pq.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["dl"]
    )["dl"].to_numpy().astype(float)
    want = [float(sql_round(np.percentile(dls, q * 100, method="linear"), 6)) for q in qs]
    assert got["q"].tolist() == list(qs)
    np.testing.assert_allclose(got["value"].to_numpy(), want, atol=1e-9)


def test_explain_contributions_sum_to_score(built):
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        explain_score,
        score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    texts = fixture_queries(sorted(store.df), n=10, k=10)["text"].to_pylist()
    checked = 0
    for t in texts:
        full = dict(score_query(store, t, k=store.n_docs))
        for doc, want in list(full.items())[:5]:
            parts = explain_score(store, t, doc)
            assert sum(c for _, _, _, c in parts) == pytest.approx(want, abs=1e-12)
            # terms are sorted and unique, idf positive, tf >= 1
            terms = [p[0] for p in parts]
            assert terms == sorted(set(terms))
            assert all(p[1] > 0 and p[2] >= 1 for p in parts)
            checked += 1
    assert checked
    # a doc containing none of the terms explains to an empty breakdown
    absent = [d for d in range(store.n_docs) if d not in full][:1]
    if absent:
        assert explain_score(store, texts[-1], absent[0]) == []


def test_term_suggest_ranks_by_distance_then_df(built):
    from bitcoin_ledger_2es_ray.pipelines.phrase import term_suggest
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)

    # exact vocab term suggests itself first at distance 0
    t = vocab[len(vocab) // 2]
    top = term_suggest(store, t, k=3)
    assert top[0] == (t, 0, store.df[t])

    # mutated term: distance tiers are non-decreasing, df DESC within a tier
    mut = t[:-1] + ("x" if t[-1] != "x" else "y")
    sug = term_suggest(store, mut, k=5, max_dist=2)
    assert sug, mut
    dists = [d for _, d, _ in sug]
    assert dists == sorted(dists)
    for i in range(1, len(sug)):
        if sug[i][1] == sug[i - 1][1]:
            assert (-sug[i][2], sug[i][0]) >= (-sug[i - 1][2], sug[i - 1][0])

    # gibberish far from every term suggests nothing
    assert term_suggest(store, "zzqqxxyyzz", k=3, max_dist=1) == []


def test_collapse_topk_one_best_doc_per_group(built):
    import os

    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        collapse_topk,
        score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    fwd = pq.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "repo"]
    )
    field_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["repo"].to_pylist()))

    texts = fixture_queries(sorted(store.df), n=8, k=10)["text"].to_pylist()
    for t in texts:
        full = score_query(store, t, k=store.n_docs, round_decimals=6)
        got = collapse_topk(store, t, 10, field_of, round_decimals=6)
        repos = [f for _, f, _ in got]
        assert len(repos) == len(set(repos))  # one doc per group
        # each representative is its group's best-ranked member
        rank_of = {d: i for i, (d, _) in enumerate(full)}
        for d, f, s in got:
            better = [
                d2
                for d2, _ in full[: rank_of[d]]
                if field_of[d2] == f
            ]
            assert better == [], (t, d, f)
        # representatives appear in full-ranking order
        idxs = [rank_of[d] for d, _, _ in got]
        assert idxs == sorted(idxs)


def test_composite_agg_pages_tile(built, ray_session):
    import os

    from bitcoin_ledger_2es_ray.pipelines.aggs import composite_agg

    res, _, _ = built
    # full bucket stream in one oversized page
    full = composite_agg(res.out_dir, interval=16, size=10_000)
    fwd = pq.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["lang", "dl"]
    ).to_pandas()
    fwd["bucket"] = (fwd["dl"].astype("int64") // 16) * 16
    want = (
        fwd.groupby(["lang", "bucket"]).size().reset_index(name="doc_count")
        .sort_values(["lang", "bucket"]).reset_index(drop=True)
    )
    assert full.to_pandas().values.tolist() == want.values.tolist()

    # pages tile the stream exactly
    pages, after = [], None
    while True:
        p = composite_agg(res.out_dir, interval=16, after=after, size=4)
        if p.num_rows == 0:
            break
        pages.append(p)
        after = (p["lang"][-1].as_py(), p["bucket"][-1].as_py())
    tiled = pa.concat_tables(pages)
    assert tiled.to_pandas().values.tolist() == full.to_pandas().values.tolist()


def test_rrf_hybrid_fuses_both_legs(ray_session):
    """RRF sanity on the driver query at sf0.001: every fused doc's score
    decomposes into 1/(60+r) terms from the legs that ranked it, and a doc
    ranked by BOTH legs outranks one ranked by a single leg at equal
    positions."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.queries()["rrf_hybrid"]("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
    assert (out.groupby("query_id")["rank"].max() <= 10).all()
    # scores are sums of one or two reciprocal-rank terms
    singles = {round(1.0 / (60 + r), 6) for r in range(1, 21)}
    pair_max = round(2.0 / 61, 6)
    for s in out["score"]:
        assert 0 < s <= pair_max
        one_leg = round(s, 6) in singles
        two_leg = any(
            abs(s - (1.0 / (60 + a) + 1.0 / (60 + b))) < 2e-6
            for a in range(1, 21)
            for b in range(1, 21)
        )
        assert one_leg or two_leg, s


def test_completion_suggest_ranks_by_df(built):
    from bitcoin_ledger_2es_ray.pipelines.phrase import completion_suggest
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    t = vocab[0]
    out = completion_suggest(store, t[:2], k=10)
    want = sorted(
        ((u, store.df[u]) for u in vocab if u.startswith(t[:2])),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    assert out == want
    assert completion_suggest(store, "zzzzzz", k=3) == []


def test_terms_enum_pages_tile_match_set(built):
    from bitcoin_ledger_2es_ray.pipelines.apis import terms_enum
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    prefix = vocab[0][:1]
    want = [t for t in vocab if t.startswith(prefix)]
    # drain in pages of 2 via search_after; pages concatenate to the full set
    got, after = [], None
    while True:
        page = terms_enum(store, prefix, size=2, search_after=after)
        got.extend(page)
        if len(page) < 2:
            break
        after = page[-1]
    assert got == want
    # case folding: uppercase request hits the lowercased dictionary
    assert terms_enum(store, prefix.upper(), size=100) == want[:100]
    assert terms_enum(store, "zzzzzz", size=3) == []
    with pytest.raises(ValueError):
        terms_enum(store, prefix, size=0)


def test_terms_stats_agg_matches_pandas(hitset, ray_session):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_stats_agg

    matches, docs, res = hitset
    got = terms_stats_agg(res.out_dir, matches, field="lang").to_pandas()
    langs = docs["lang"].to_pylist()
    dls = [len(t.split(" ")) for t in docs["content"].to_pylist()]
    agg: dict[tuple[int, str], list[int]] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        agg.setdefault((q, langs[d]), []).append(dls[d])
    got_d = {
        (q, l): (c, mn, mx, sm, av)
        for q, l, c, mn, mx, sm, av in zip(
            got["query_id"], got["lang"], got["doc_count"],
            got["min_dl"], got["max_dl"], got["sum_dl"], got["avg_dl"],
        )
    }
    assert set(got_d) == set(agg)
    for key, vals in agg.items():
        c, mn, mx, sm, av = got_d[key]
        assert (c, mn, mx, sm) == (len(vals), min(vals), max(vals), sum(vals))
        assert av == pytest.approx(float(sql_round(sum(vals) / len(vals), 6)), abs=1e-9)


def test_function_score_pool_equals_driver_loop(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        function_score_query,
        run_queries,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    queries = fixture_queries(sorted(store.df), n=12, k=10)
    rows = run_queries(
        res.out_dir, queries, concurrency=2, round_decimals=6,
        scoring="function_score",
    ).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        want = function_score_query(store, text, 10, round_decimals=6)
        assert got.get(qid, []) == want, text


def test_script_score_rescales_by_doc_length(built):
    import os

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        score_query,
        script_score_query,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    fwd = pq.read_table(os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "dl"])
    dl_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["dl"].to_pylist()))

    texts = fixture_queries(sorted(store.df), n=10, k=10)["text"].to_pylist()
    for t in texts:
        base = score_query(store, t, k=store.n_docs)  # full unrounded ranking
        want = sorted(
            (
                (d, float(sql_round(s / (1.0 + dl_of[d] / store.avgdl), 6)))
                for d, s in base
            ),
            key=lambda r: (-r[1], r[0]),
        )[:10]
        got = script_score_query(store, t, 10, round_decimals=6)
        assert got == want, t


def test_top_hits_agg_per_bucket(built):
    import os

    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        score_query,
        top_hits_agg,
    )
    from bitcoin_ledger_2es_ray.sources.queries import fixture_queries

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    fwd = pq.read_table(
        os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "lang"]
    )
    field_of = dict(zip(fwd["doc_id"].to_pylist(), fwd["lang"].to_pylist()))
    for t in fixture_queries(sorted(store.df), n=8, k=10)["text"].to_pylist():
        got = top_hits_agg(store, t, field_of, k_per_bucket=2, round_decimals=6)
        full = score_query(store, t, k=store.n_docs, round_decimals=6)
        want = {}
        for d, s in full:
            want.setdefault(field_of[d], []).append((d, s))
        expect = []
        for lang in sorted(want):
            for hr, (d, s) in enumerate(want[lang][:2], start=1):
                expect.append((lang, hr, d, s))
        assert got == expect, t


def test_range_agg_matches_pandas(hitset, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import range_agg

    matches, docs, res = hitset
    got = range_agg(res.out_dir, matches, edges=(10, 30)).to_pandas()
    dls = [len(t.split(" ")) for t in docs["content"].to_pylist()]

    def label(dl):
        return "*-10" if dl < 10 else ("10-30" if dl < 30 else "30-*")

    want: dict[tuple[int, str], int] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        k = (q, label(dls[d]))
        want[k] = want.get(k, 0) + 1
    got_d = {
        (q, r): c for q, r, c in zip(got["query_id"], got["range"], got["doc_count"])
    }
    assert got_d == want
    with pytest.raises(ValueError):
        range_agg(res.out_dir, matches, edges=())
    with pytest.raises(ValueError):
        range_agg(res.out_dir, matches, edges=(30, 10))


def test_adjacency_matrix_brute(built):
    from bitcoin_ledger_2es_ray.pipelines.aggs import adjacency_matrix_agg
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = [d.split(" ") for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    vocab = sorted(store.df)
    terms = sorted({vocab[1], vocab[5 % len(vocab)], vocab[9 % len(vocab)]})
    got = adjacency_matrix_agg(store, [(0, terms)])
    want: dict[str, int] = {}
    sets = {t: {i for i, d in enumerate(docs) if t in d} for t in terms}
    for t in terms:
        if sets[t]:
            want[t] = len(sets[t])
    for i, a in enumerate(terms):
        for b in terms[i + 1 :]:
            n = len(sets[a] & sets[b])
            if n:
                want[f"{a}&{b}"] = n
    got_d = dict(zip(got["key"].to_pylist(), got["doc_count"].to_pylist()))
    assert got_d == want
    assert got["query_id"].to_pylist() == [0] * len(want)


def test_extended_stats_matches_numpy(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import extended_stats_agg

    res, _, corpus = built
    dls = np.array(
        [len(t.split(" ")) for t in pq.read_table(corpus, columns=["content"])["content"].to_pylist()],
        dtype=np.int64,
    )
    got = extended_stats_agg(res.out_dir).to_pandas().iloc[0]
    assert got["doc_count"] == len(dls)
    assert got["min_dl"] == dls.min()
    assert got["max_dl"] == dls.max()
    assert got["sum_dl"] == dls.sum()
    assert got["sum_sq"] == (dls * dls).sum()
    assert got["avg_dl"] == pytest.approx(dls.mean(), abs=1e-6)
    assert got["variance"] == pytest.approx(dls.var(), abs=1e-6)
    assert got["std_dev"] == pytest.approx(dls.std(), abs=1e-6)


def test_matrix_stats_matches_numpy(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import matrix_stats

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet", columns=["value", "user_id"])
    x = np.asarray(ev["value"], dtype=np.float64)
    y = np.asarray(ev["user_id"], dtype=np.float64)
    got = matrix_stats(sf, fields=("value", "user_id")).to_pandas()
    assert list(zip(got["field_a"], got["field_b"])) == [
        ("user_id", "user_id"),
        ("user_id", "value"),
        ("value", "value"),
    ]
    rows = {(a, b): r for (a, b), (_, r) in zip(zip(got["field_a"], got["field_b"]), got.iterrows())}
    assert rows[("value", "value")]["covariance"] == pytest.approx(x.var(), abs=1e-6)
    assert rows[("user_id", "user_id")]["covariance"] == pytest.approx(y.var(), abs=1e-6)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    corr = cov / (x.std() * y.std())
    pair = rows[("user_id", "value")]
    assert pair["covariance"] == pytest.approx(cov, abs=1e-6)
    assert pair["correlation"] == pytest.approx(corr, abs=1e-6)
    assert pair["mean_a"] == pytest.approx(y.mean(), abs=1e-6)


def test_decay_score_reweights_full_ranking(built):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        decay_score_query,
        score_query,
    )

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    dls = [len(d.split(" ")) for d in docs]
    vocab = sorted(store.df)
    text = " ".join(sorted({vocab[2], vocab[9 % len(vocab)]}))
    origin, scale, decay = 20.0, 12.0, 0.5
    got = decay_score_query(store, text, 10, origin, scale, decay, round_decimals=6)
    base = dict(score_query(store, text, len(docs)))
    want = {
        d: float(sql_round(s * math.exp((dls[d] - origin) ** 2 * math.log(decay) / scale**2), 6))
        for d, s in base.items()
    }
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    # at dl == origin the factor is 1; at |dl-origin| == scale it is decay
    assert math.exp(scale**2 * math.log(decay) / scale**2) == pytest.approx(decay)
    with pytest.raises(ValueError):
        decay_score_query(store, text, 5, origin, -1.0)


def test_distance_feature_boosts_matched_docs(built):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        distance_feature_query,
        score_query,
    )

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    dls = [len(d.split(" ")) for d in docs]
    vocab = sorted(store.df)
    text = " ".join(sorted({vocab[2], vocab[9 % len(vocab)]}))
    origin, pivot, boost = 20.0, 16.0, 2.0
    got = distance_feature_query(
        store, text, 10, origin=origin, pivot=pivot, boost=boost, round_decimals=6
    )
    base = dict(score_query(store, text, len(docs)))
    want = {
        d: float(sql_round(s + boost * pivot / (pivot + abs(dls[d] - origin)), 6))
        for d, s in base.items()
    }
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    # feature is bounded by boost (max at origin) and equals boost/2 at pivot
    assert boost * pivot / (pivot + pivot) == pytest.approx(boost / 2)
    # it never introduces hits: same doc set as plain BM25
    assert {d for d, _ in got} <= set(base)
    with pytest.raises(ValueError):
        distance_feature_query(store, text, 5, origin, pivot=0.0)


def test_sampler_agg_matches_direct(built, ray_session):
    import hashlib

    from bitcoin_ledger_2es_ray.pipelines.aggs import sampler_agg

    res, _, corpus = built
    texts = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    cut = 0x40  # bigger cut so the small fixture surely samples something
    sample = [len(t.split(" ")) for t in texts if hashlib.sha256(t.encode()).digest()[0] < cut]
    got = sampler_agg(res.out_dir, cut=cut).to_pandas().iloc[0]
    assert got["sample_count"] == len(sample)
    assert got["avg_dl"] == pytest.approx(sum(sample) / len(sample), abs=1e-6)
    with pytest.raises(ValueError):
        sampler_agg(res.out_dir, cut=0)


def test_knn_filtered_restricts_candidates(ray_session):
    import pyarrow.parquet as pqm

    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce

    sf = "/root/testdata/sf0.001"
    lab = dict(
        zip(
            pqm.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"])["vec_id"].to_pylist(),
            pqm.read_table(f"{sf}/embeddings.parquet", columns=["label"])["label"].to_pylist(),
        )
    )
    got = knn_bruteforce(sf, n_queries=3, k=4, label=2)
    assert got.num_rows > 0
    assert all(lab[v] == 2 for v in got["vec_id"].to_pylist())
    # unfiltered results on the label subset agree where they overlap
    full = knn_bruteforce(sf, n_queries=3, k=len(lab))
    for q in set(got["query_id"].to_pylist()):
        f_rows = [
            (v, s)
            for qq, v, s in zip(
                full["query_id"].to_pylist(), full["vec_id"].to_pylist(), full["sim"].to_pylist()
            )
            if qq == q and lab[v] == 2
        ][:4]
        g_rows = [
            (v, s)
            for qq, v, s in zip(
                got["query_id"].to_pylist(), got["vec_id"].to_pylist(), got["sim"].to_pylist()
            )
            if qq == q
        ]
        assert g_rows == f_rows


def test_match_count_matches_union(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, match_count

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = [d.split(" ") for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    vocab = sorted(store.df)
    # single-term fast path == df == brute count
    t = vocab[4 % len(vocab)]
    assert match_count(store, t) == store.td.df_of(t) == sum(t in d for d in docs)
    # multi-term == union size; unknown terms ignored; all-unknown → 0
    text = f"{vocab[0]} {vocab[9 % len(vocab)]} zzzznone"
    want = sum(any(w in d for w in (vocab[0], vocab[9 % len(vocab)])) for d in docs)
    assert match_count(store, text) == want
    assert match_count(store, "zzzznone") == 0


def test_mget_pushdown_matches_direct(built):
    from bitcoin_ledger_2es_ray.pipelines.query import mget

    res, _, corpus = built
    t = pq.read_table(corpus, columns=["content", "lang"])
    n = t.num_rows
    ids = [0, 5, n - 1, n + 100]  # includes a missing id
    got = mget(res.out_dir, ids, columns=["lang", "dl"])
    assert got["doc_id"].to_pylist() == [0, 5, n - 1]  # missing id absent
    langs = t["lang"].to_pylist()
    dls = [len(c.split(" ")) for c in t["content"].to_pylist()]
    for d, l, dl in zip(got["doc_id"].to_pylist(), got["lang"].to_pylist(), got["dl"].to_pylist()):
        assert (l, dl) == (langs[d], dls[d])


def test_ids_query_scores_and_missing(built):
    from bitcoin_ledger_2es_ray.pipelines.query import ids_query

    res, _, corpus = built
    n = pq.read_table(corpus, columns=["lang"]).num_rows
    got = ids_query(res.out_dir, [3, 1, n - 1, n + 50], columns=["lang"])
    assert got["doc_id"].to_pylist() == [1, 3, n - 1]  # sorted, missing absent
    assert got["score"].to_pylist() == [1.0, 1.0, 1.0]  # ES constant score
    assert got.schema.field("score").type == "double"


def test_percentile_ranks_matches_numpy(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentile_ranks_agg

    res, _, corpus = built
    dls = np.array(
        [len(c.split(" ")) for c in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    )
    got = percentile_ranks_agg(res.out_dir, values=(1, 16, 32, 1000)).to_pandas()
    for v, p in zip(got["value"], got["pct"]):
        assert p == pytest.approx(100.0 * (dls <= v).mean(), abs=1e-6)
    assert got["pct"].iloc[-1] == 100.0  # v beyond max dl covers everything


def test_percolate_phrases_brute(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate_phrases

    docs = [
        "alpha beta gamma",
        "beta alpha gamma beta alpha",
        "gamma gamma alpha beta",
        "beta gamma",
    ]
    sf = str(tmp_path)
    _pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": docs}),
        f"{sf}/documents.parquet",
    )
    phrases = pa.table(
        {
            "query_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": ["alpha beta", "gamma beta alpha", "beta zeta"],
        }
    )
    out = percolate_phrases(sf, phrases).to_pylist()
    got = {(r["doc_id"], r["query_id"]) for r in out}
    want = set()
    for qid, p in enumerate(["alpha beta", "gamma beta alpha", "beta zeta"]):
        toks = p.split(" ")
        for d, t in enumerate(docs):
            dt = t.split(" ")
            if any(dt[s : s + len(toks)] == toks for s in range(len(dt) - len(toks) + 1)):
                want.add((d, qid))
    assert got == want and (1, 1) in got and not any(q == 2 for _, q in got)
    with pytest.raises(ValueError):
        percolate_phrases(sf, pa.table(
            {"query_id": pa.array([0], type=pa.int64()), "text": [""]}))


def test_percolate_matches_transposed_and(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate

    res, _, corpus = built
    sf_dir = "/root/testdata/sf0.001"
    docs = [d.split(" ") for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    texts = [
        f"{vocab[0]}",
        f"{vocab[1]} {vocab[5 % len(vocab)]}",
        "zzzznone",
        f"{vocab[2]} zzzznone",
    ]
    queries = pa.table(
        {
            "query_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = percolate(sf_dir, queries)
    pairs = set(zip(got["doc_id"].to_pylist(), got["query_id"].to_pylist()))
    want = set()
    for qid, text in enumerate(texts):
        terms = {t for t in text.split(" ")}
        for i, d in enumerate(docs):
            if all(t in d for t in terms):
                want.add((i, qid))
    assert pairs == want
    # queries with an unknown term never match (conjunctive semantics)
    assert not any(q in (2, 3) for _, q in pairs)


def test_hard_negatives_disjoint_from_qrels(built):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.functions.boolean import intersect_many
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        hard_negatives,
        score_query,
    )
    from bitcoin_ledger_2es_ray.functions.tokenize import tokenize_query

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    texts = [vocab[1], " ".join(sorted({vocab[0], vocab[3]})), "zzznope"]
    queries = pa.table(
        {"query_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = hard_negatives(store, queries, k=5, round_decimals=6)
    rows = out.to_pylist()
    assert rows, "fixture queries should yield negatives"
    # the unknown-term query is skipped (empty relevant set)
    assert 2 not in {r["query_id"] for r in rows}
    for qid, text in enumerate(texts[:2]):
        terms = sorted(set(tokenize_query(text)))
        rel = set(
            int(d) for d in intersect_many(
                [np.unique(store.postings(t)[0]) for t in terms]
            )
        )
        mine = [r for r in rows if r["query_id"] == qid]
        # disjoint from qrels, ranked 1..n, and matching the filtered full ranking
        assert all(r["doc_id"] not in rel for r in mine)
        assert [r["rank"] for r in mine] == list(range(1, len(mine) + 1))
        full = score_query(store, text, store.n_docs, round_decimals=6)
        want = [(d, s) for d, s in full if d not in rel][:5]
        assert [(r["doc_id"], r["score"]) for r in mine] == want


def test_dpr_triples_structure(built):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.functions.boolean import intersect_many
    from bitcoin_ledger_2es_ray.functions.tokenize import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        dpr_triples,
        hard_negatives,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    texts = [
        " ".join(sorted({vocab[0], vocab[3]})),
        " ".join(sorted({vocab[2], vocab[5]})),
    ]
    queries = pa.table(
        {"query_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = dpr_triples(store, queries, n_pos=2, n_neg=3, round_decimals=6).to_pylist()
    assert out
    negs = hard_negatives(store, queries, k=3, round_decimals=6).to_pylist()
    neg_of: dict[int, list] = {}
    for r in negs:
        neg_of.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    for qid, text in enumerate(texts):
        terms = sorted(set(tokenize_query(text)))
        rel = intersect_many([np.unique(store.postings(t)[0]) for t in terms])
        pos_want = [int(d) for d in rel[:2]]
        rows = [r for r in out if r["query_id"] == qid]
        # exact cross product: positives × the hard_negatives top-3
        want = [
            (p, nd, nr) for p in pos_want for nr, nd in sorted(neg_of.get(qid, []))
        ]
        assert [(r["pos_doc"], r["neg_doc"], r["neg_rank"]) for r in rows] == want
        # positives and negatives never overlap
        assert not ({r["pos_doc"] for r in rows} & {r["neg_doc"] for r in rows})
    # a query whose every match is relevant (single term) yields no triples
    one = pa.table(
        {"query_id": pa.array([9], type=pa.int64()), "text": [vocab[1]]}
    )
    assert dpr_triples(store, one, n_pos=2, n_neg=3).num_rows == 0


def test_rank_eval_metrics_brute(built):
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        rank_eval,
        score_query,
    )

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = [d.split(" ") for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    vocab = sorted(store.df)
    texts = [vocab[0], f"{vocab[1]} {vocab[7 % len(vocab)]}", "zzzznone"]
    queries = pa.table(
        {
            "query_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = rank_eval(store, queries, k=5)
    rows = {r["query_id"]: r for r in got.to_pylist()}
    assert 2 not in rows  # unknown-term query skipped (unjudged request)
    for qid, text in enumerate(texts[:2]):
        terms = set(text.split(" "))
        rel = {i for i, d in enumerate(docs) if all(t in d for t in terms)}
        top = [d for d, _ in score_query(store, text, 5, round_decimals=6)]
        hits = [d in rel for d in top]
        first = hits.index(True) + 1 if any(hits) else 0
        r = rows[qid]
        assert r["precision_k"] == pytest.approx(sum(hits) / 5, abs=1e-6)
        assert r["recall_k"] == pytest.approx(sum(hits) / len(rel), abs=1e-6)
        assert r["mrr"] == pytest.approx(1.0 / first if first else 0.0, abs=1e-6)


def test_pipeline_aggs_numpy_identity():
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_selector, pipeline_aggs

    buckets = pa.table(
        {
            "b": pa.array([30, 10, 20, 40], type=pa.int64()),
            "n": pa.array([7, 3, 5, 4], type=pa.int64()),
        }
    )
    got = pipeline_aggs(buckets, key="b", metric="n", window=2)
    assert got["b"].to_pylist() == [10, 20, 30, 40]  # sorted by key
    assert got["n"].to_pylist() == [3, 5, 7, 4]
    assert got["derivative"].to_pylist() == [None, 2.0, 2.0, -3.0]
    assert got["cumulative_sum"].to_pylist() == [3.0, 8.0, 15.0, 19.0]
    assert got["moving_avg"].to_pylist() == [3.0, 4.0, 6.0, 5.5]
    kept = bucket_selector(buckets, metric="n", min_value=5)
    assert sorted(kept["n"].to_pylist()) == [5, 7]


def test_unigram_logprob_brute(built, ray_session):
    import math
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.textstats import unigram_logprob

    res, _, corpus = built
    docs = [d.split(" ") for d in pq.read_table(corpus, columns=["content"])["content"].to_pylist()]
    cf = Counter(t for d in docs for t in d)
    total = sum(cf.values())
    got = unigram_logprob(res.out_dir)
    rows = dict(zip(got["doc_id"].to_pylist(), got["logprob"].to_pylist()))
    assert len(rows) == len(docs)
    for i in (0, 7, len(docs) - 1):
        want = sum(math.log(cf[t] / total) for t in docs[i]) / len(docs[i])
        assert rows[i] == pytest.approx(want, abs=1e-6)
    # every logprob is negative (probabilities < 1)
    assert all(v < 0 for v in rows.values())


def test_rare_terms_agg_matches_brute(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import rare_terms_agg

    res, _, corpus = built
    docs = pq.read_table(corpus, columns=["content"])
    df: dict[str, int] = {}
    for t in docs["content"].to_pylist():
        for term in set(t.split(" ")):
            df[term] = df.get(term, 0) + 1
    for cutoff in (1, min(df.values()), 10**9):
        got = rare_terms_agg(res.out_dir, max_doc_count=cutoff)
        want = sorted((t, c) for t, c in df.items() if c <= cutoff)
        assert list(zip(got["term"].to_pylist(), got["doc_count"].to_pylist())) == want
    with pytest.raises(ValueError):
        rare_terms_agg(res.out_dir, max_doc_count=0)
    # bounded driver residency: size=k returns exactly the first k buckets
    # of the unbounded term-ascending result (distributed sort + limit)
    full = rare_terms_agg(res.out_dir, max_doc_count=10**9)
    for k in (1, 3, full.num_rows + 5):
        capped = rare_terms_agg(res.out_dir, max_doc_count=10**9, size=k)
        assert capped.equals(full.slice(0, min(k, full.num_rows)))
    with pytest.raises(ValueError):
        rare_terms_agg(res.out_dir, size=0)


def test_rare_terms_sink_matches_agg(built, ray_session, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        rare_terms_agg,
        rare_terms_to_parquet,
    )

    res, _, _ = built
    out = rare_terms_to_parquet(res.out_dir, str(tmp_path / "rare"), max_doc_count=10**9)
    got = pq.read_table(out).sort_by("term")
    want = rare_terms_agg(res.out_dir, max_doc_count=10**9)
    assert got.select(["term", "doc_count"]).equals(want)


def test_multi_terms_agg_matches_pandas(hitset, ray_session):
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.aggs import multi_terms_agg

    matches, docs, res = hitset
    got = multi_terms_agg(res.out_dir, matches, fields=("lang", "repo")).to_pandas()
    import os

    fm = pads.dataset(os.path.join(res.out_dir, "forward_map")).to_table(
        columns=["doc_id", "lang", "repo"]
    )
    meta = {
        d: (l, r)
        for d, l, r in zip(
            fm["doc_id"].to_pylist(), fm["lang"].to_pylist(), fm["repo"].to_pylist()
        )
    }
    want: dict[tuple, int] = {}
    for q, d in zip(matches["query_id"].to_pylist(), matches["doc_id"].to_pylist()):
        key = (q, *meta[d])
        want[key] = want.get(key, 0) + 1
    got_d = {
        (q, l, r): c
        for q, l, r, c in zip(
            got["query_id"], got["lang"], got["repo"], got["doc_count"]
        )
    }
    assert got_d == want
    keys = list(zip(got["query_id"], got["lang"], got["repo"]))
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        multi_terms_agg(res.out_dir, matches, fields=("lang", "dl"))


def test_weighted_avg_agg_matches_pandas(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import weighted_avg_agg

    sf = "/root/testdata/sf0.001"
    got = weighted_avg_agg(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    docs["w"] = docs["text"].str.split(" ").str.len()
    want = (
        docs.assign(vw=docs["n_chars"] * docs["w"])
        .groupby("lang")[["vw", "w"]]
        .sum()
    )
    want = (want["vw"] / want["w"]).round(6).sort_index()
    assert got["lang"].tolist() == want.index.tolist()
    np.testing.assert_allclose(got["wavg"].to_numpy(), want.to_numpy(), atol=1e-9)


def test_mad_agg_matches_duckdb(built, ray_session):
    import duckdb

    from bitcoin_ledger_2es_ray.pipelines.aggs import mad_agg

    res, _, corpus = built
    got = mad_agg(res.out_dir).to_pandas()
    want = duckdb.sql(
        f"""SELECT lang, round(mad(len(string_split(content, ' '))::DOUBLE), 6) AS mad
            FROM read_parquet('{corpus}') GROUP BY lang ORDER BY lang"""
    ).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    np.testing.assert_allclose(got["mad"].to_numpy(), want["mad"].to_numpy(), atol=1e-9)


def test_analyze_batch_matches_tokenizer_goldens():
    from bitcoin_ledger_2es_ray.pipelines.apis import analyze_texts

    q = pa.table(
        {
            "query_id": pa.array([0, 1, 2], type=pa.uint64()),
            "text": pa.array(["getBlockHash foo", "", "x y x"]),
        }
    )
    out = analyze_texts(q)
    rows = list(
        zip(out["query_id"].to_pylist(), out["pos"].to_pylist(), out["token"].to_pylist())
    )
    # code tokenizer: camelCase parts share the identifier's position
    assert (0, 0, "get") in rows and (0, 0, "block") in rows and (0, 0, "hash") in rows
    assert (0, 0, "getblockhash") in rows
    assert (0, 1, "foo") in rows
    assert all(r[0] != 1 for r in rows)  # empty text yields nothing
    assert [(r[1], r[2]) for r in rows if r[0] == 2] == [(0, "x"), (1, "y"), (2, "x")]


def test_term_vectors_brute_and_row_group_pruning(built, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.apis import term_vectors
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    ids = [3, 17, 17, 41]
    got = term_vectors(store, corpus, ids)
    want = []
    for d in sorted(set(ids)):
        toks = docs[d].split(" ")
        for term in sorted(set(toks)):
            want.append((d, term, toks.count(term), store.df[term]))
    assert (
        list(
            zip(
                got["doc_id"].to_pylist(),
                got["term"].to_pylist(),
                got["tf"].to_pylist(),
                got["df"].to_pylist(),
            )
        )
        == want
    )
    with pytest.raises(ValueError):
        term_vectors(store, corpus, [len(docs)])

    # multi-row-group corpus: pruning must pick the right rows
    small = str(tmp_path / "rg.parquet")
    pq.write_table(
        pa.table(
            {"content": pa.array([f"tok{'a' * (i + 1)} common" for i in range(40)])}
        ),
        small,
        row_group_size=8,
    )

    class StubTd:
        def df_of(self, term):
            return 40 if term == "common" else 1

    class StubStore:
        td = StubTd()

    got = term_vectors(StubStore(), small, [0, 9, 39])
    assert got["doc_id"].to_pylist() == [0, 0, 9, 9, 39, 39]
    assert got["term"].to_pylist() == [
        "common", "toka", "common", "tok" + "a" * 10, "common", "tok" + "a" * 40,
    ]


# ---------------------------------------------------------------------------
# sibling pipeline aggs / serial_diff / bucket_sort


def _toy_buckets():
    import pyarrow as pa

    return pa.table(
        {"k": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
         "m": pa.array([5, 3, 9, 9, 1], type=pa.int64())}
    )


def test_sibling_bucket_stats_identity():
    from bitcoin_ledger_2es_ray.pipelines.aggs import sibling_bucket_stats

    out = sibling_bucket_stats(_toy_buckets(), metric="m")
    row = out.to_pylist()[0]
    assert row == {
        "n_buckets": 5, "avg_bucket": 5.4, "min_bucket": 1.0,
        "max_bucket": 9.0, "sum_bucket": 27.0,
    }


def test_sibling_bucket_stats_empty_raises():
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.aggs import sibling_bucket_stats

    with _pytest.raises(ValueError):
        sibling_bucket_stats(_toy_buckets().slice(0, 0), metric="m")


def test_derivative_and_normalized():
    from bitcoin_ledger_2es_ray.pipelines.aggs import derivative_agg

    out = derivative_agg(_toy_buckets(), key="k", metric="m")
    assert out["derivative"].to_pylist() == [None, -2.0, 6.0, 0.0, -8.0]
    assert "normalized_value" not in out.column_names
    # key spacing 1, unit 2 => normalized = 2 * derivative
    out = derivative_agg(_toy_buckets(), key="k", metric="m", unit_s=2.0)
    assert out["normalized_value"].to_pylist() == [None, -4.0, 12.0, 0.0, -16.0]


def test_cumulative_sum_running_total():
    from bitcoin_ledger_2es_ray.pipelines.aggs import cumulative_sum_agg

    out = cumulative_sum_agg(_toy_buckets(), key="k", metric="m")
    assert out["cumulative_sum"].to_pylist() == [5.0, 8.0, 17.0, 26.0, 27.0]


def test_moving_percentiles_window_before_current():
    from bitcoin_ledger_2es_ray.pipelines.aggs import moving_percentiles_agg

    out = moving_percentiles_agg(
        _toy_buckets(), key="k", metric="m", window=2, percents=(50.0,)
    )
    # windows: [], [5], [5,3], [3,9], [9,9]
    assert out["p50"].to_pylist() == [None, 5.0, 4.0, 6.0, 9.0]


def test_change_point_finds_planted_step():
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.aggs import change_point_agg

    # flat 10s then flat 50s: the change point is the first 50-bucket
    t = pa.table(
        {"k": pa.array(list(range(8)), type=pa.int64()),
         "m": pa.array([10, 10, 10, 10, 50, 50, 50, 50], type=pa.int64())}
    )
    out = change_point_agg(t, key="k", metric="m").to_pylist()[0]
    assert out["k"] == 4
    assert out["mean_before"] == 10.0 and out["mean_after"] == 50.0
    assert out["stat"] == pytest.approx(40.0 * (4 * 4 / 8) ** 0.5, abs=1e-6)
    with pytest.raises(ValueError):
        change_point_agg(t.slice(0, 1), key="k", metric="m")


def test_serial_diff_lags_and_nulls():
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.aggs import serial_diff

    out = serial_diff(_toy_buckets(), key="k", metric="m", lag=2)
    assert out["serial_diff"].to_pylist() == [None, None, 4.0, 6.0, -8.0]
    # lag >= n: all null, no crash
    out = serial_diff(_toy_buckets(), key="k", metric="m", lag=9)
    assert out["serial_diff"].to_pylist() == [None] * 5
    with _pytest.raises(ValueError):
        serial_diff(_toy_buckets(), key="k", metric="m", lag=0)


def test_bucket_sort_from_size_ties():
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_sort

    out = bucket_sort(_toy_buckets(), metric="m", size=2, from_=1, tiebreak="k")
    # order by m DESC, k ASC: (2,9),(3,9),(0,5),(1,3),(4,1) → skip 1, take 2
    assert out["k"].to_pylist() == [3, 0]
    # from past the end → empty
    assert bucket_sort(_toy_buckets(), metric="m", size=3, from_=10).num_rows == 0


# ---------------------------------------------------------------------------
# terms_set / top_metrics / diversified_sampler


def test_terms_set_bruteforce(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import terms_set_match

    res, oracle, _ = built
    store = SegmentStore(res.out_dir)
    docs_t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars", "text"]
    ).sort_by("doc_id")
    doc_ids = np.asarray(docs_t["doc_id"], dtype=np.int64)
    nchars = np.asarray(docs_t["n_chars"], dtype=np.int64)
    texts = docs_t["text"].to_pylist()
    vocab = sorted(store.df)
    for seed in range(5):
        terms = sorted({vocab[(7 * seed + i * 13) % len(vocab)] for i in range(3)})
        nt = len(terms)
        d, m, r = terms_set_match(store, terms, doc_ids, nchars)
        got = dict(zip(d.tolist(), m.tolist()))
        want = {}
        for did, nch, text in zip(doc_ids.tolist(), nchars.tolist(), texts):
            toks = set(text.split())
            cnt = sum(t in toks for t in terms)
            req = min(nt, 1 + nch % nt)
            if cnt >= req:
                want[did] = cnt
        assert got == want, (seed, terms)
        # required column consistent
        for did, rq in zip(d.tolist(), r.tolist()):
            nch = int(nchars[np.searchsorted(doc_ids, did)])
            assert rq == min(nt, 1 + nch % nt)


def test_terms_set_empty_terms(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import terms_set_match

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    d, m, r = terms_set_match(store, [], np.array([1], dtype=np.int64), np.array([5]))
    assert len(d) == len(m) == len(r) == 0


def test_top_metrics_pandas_identity(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import top_metrics_agg

    out = top_metrics_agg("/root/testdata/sf0.001", size=2).to_pandas()
    df = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
    want = df.groupby("lang").head(2).reset_index(drop=True)
    want["rank"] = want.groupby("lang").cumcount() + 1
    got = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    want = want[["lang", "rank", "doc_id", "n_chars"]].sort_values(["lang", "rank"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_diversified_sampler_properties(built, ray_session):
    import collections
    import hashlib

    from bitcoin_ledger_2es_ray.pipelines.aggs import diversified_sampler_agg

    res, _, _ = built
    cap, size = 3, 10
    out = diversified_sampler_agg(res.out_dir, max_docs_per_lang=cap, shard_size=size)
    assert out.num_rows <= size
    counts = collections.Counter(out["lang"].to_pylist())
    assert all(v <= cap for v in counts.values())
    # greedy brute-force equivalence over the raw documents table
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    rows = sorted(
        (hashlib.sha256(t.encode()).hexdigest(), d, l)
        for d, l, t in zip(
            docs["doc_id"].to_pylist(), docs["lang"].to_pylist(), docs["text"].to_pylist()
        )
    )
    seen, want = collections.Counter(), []
    for sha, did, lang in rows:
        if len(want) == size:
            break
        if seen[lang] < cap:
            seen[lang] += 1
            want.append((did, lang, sha))
    want.sort()
    got = list(zip(out["doc_id"].to_pylist(), out["lang"].to_pylist(), out["sha"].to_pylist()))
    assert got == want


def test_diversified_sampler_bad_params(built):
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.aggs import diversified_sampler_agg

    res, _, _ = built
    with _pytest.raises(ValueError):
        diversified_sampler_agg(res.out_dir, max_docs_per_lang=0)


# ---------------------------------------------------------------------------
# auto_date_histogram / cumulative_cardinality / normalize / geo rings /
# rank_feature / scroll


def test_auto_date_histogram_ladder_and_totals(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import AUTO_LADDER, auto_date_histogram

    sf = "/root/testdata/sf0.001"
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    # huge target -> finest interval; tiny target -> coarsest fallback
    fine = auto_date_histogram(sf, target_buckets=10**9)
    assert fine["interval_s"][0].as_py() == AUTO_LADDER[0]
    coarse = auto_date_histogram(sf, target_buckets=1)
    assert coarse["interval_s"][0].as_py() == AUTO_LADDER[-1]
    for out in (fine, coarse):
        assert int(out["doc_count"].to_pandas().sum()) == n_events
    mid = auto_date_histogram(sf, target_buckets=35)
    assert mid.num_rows <= 35


def test_cumulative_cardinality_bruteforce(ray_session):
    import collections

    from bitcoin_ledger_2es_ray.pipelines.events import cumulative_cardinality

    sf = "/root/testdata/sf0.001"
    out = cumulative_cardinality(sf, interval_s=3600)
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "user_id"]).to_pandas()
    ev["b"] = (ev["ts"].astype("int64") // 10**6 // 3600) * 3600
    first = ev.groupby("user_id")["b"].min()
    want = collections.Counter(first)
    got = dict(zip(out["bucket_s"].to_pylist(), out["new_users"].to_pylist()))
    assert got == dict(want)
    cum = out["cumulative_users"].to_pylist()
    assert cum == list(np.cumsum(out["new_users"].to_pylist()))
    assert cum[-1] == ev["user_id"].nunique()


def test_normalize_agg_identity_and_errors():
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.aggs import normalize_agg

    b = pa.table({"k": ["a", "b"], "m": pa.array([1, 3], type=pa.int64())})
    out = normalize_agg(b, key="k", metric="m")
    assert out["normalized"].to_pylist() == [25.0, 75.0]
    prop = normalize_agg(b, key="k", metric="m", method="proportion_of_sum")
    assert prop["normalized"].to_pylist() == [0.25, 0.75]
    with _pytest.raises(ValueError):
        normalize_agg(b, key="k", metric="m", method="nope")
    zero = pa.table({"k": ["a"], "m": pa.array([0], type=pa.int64())})
    with _pytest.raises(ValueError):
        normalize_agg(zero, key="k", metric="m")


def test_geo_distance_agg_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.geo import (
        derive_coords,
        geo_distance_agg,
        haversine_km,
    )

    sf = "/root/testdata/sf0.001"
    out = geo_distance_agg(sf, lat0=10.0, lon0=-20.0, edges=(3000.0, 8000.0))
    t = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    keys = np.asarray(t["c_custkey"], dtype=np.int64)
    bal = np.asarray(t["c_acctbal"], dtype=np.float64)
    lat, lon = derive_coords(keys)
    d = haversine_km(lat, lon, 10.0, -20.0)
    ring = np.searchsorted(np.array([3000.0, 8000.0]), d, side="right")
    labels = ["*-3000", "3000-8000", "8000-*"]
    got = {r["ring"]: (r["doc_count"], r["avg_acctbal"]) for r in out.to_pylist()}
    for i, lbl in enumerate(labels):
        m = ring == i
        if not m.any():
            assert lbl not in got
            continue
        n, avg = got[lbl]
        assert n == int(m.sum())
        assert abs(avg - bal[m].sum() / m.sum()) < 1e-6


def test_rank_feature_boost_and_bruteforce(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        _score_map,
        rank_feature_topk,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    sf = "/root/testdata/sf0.001"
    dv = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]).sort_by(
        "doc_id"
    )
    ids = np.asarray(dv["doc_id"], dtype=np.int64)
    x = np.asarray(dv["n_chars"], dtype=np.float64)
    term = sorted(store.df)[7]
    out = rank_feature_topk(store, term, ids, x, k=5, boost=2.0, pivot=100.0,
                            round_decimals=6)
    docs, scores = _score_map(store, term)
    idx = np.searchsorted(ids, docs.astype(np.int64))
    comb = scores + 2.0 * (x[idx] / (x[idx] + 100.0))
    want_order = np.lexsort((docs, -np.round(comb, 6)))[:5]
    want = [(int(docs[i]), round(float(np.round(comb[i], 6)), 6)) for i in want_order]
    assert [(d, round(s, 6)) for d, s in out] == want
    # zero boost degrades to plain BM25 ranking
    plain = rank_feature_topk(store, term, ids, x, k=5, boost=0.0, round_decimals=6)
    bm_order = np.lexsort((docs, -np.round(scores, 6)))[:5]
    assert [d for d, _ in plain] == [int(docs[i]) for i in bm_order]


def test_rank_feature_function_family(built):
    """ES's four rank_feature functions: each matches a direct numpy
    recompute; unknown functions refuse."""
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore
    from bitcoin_ledger_2es_ray.pipelines.structured import (
        _score_map,
        rank_feature_topk,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    sf = "/root/testdata/sf0.001"
    dv = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]).sort_by(
        "doc_id"
    )
    ids = np.asarray(dv["doc_id"], dtype=np.int64)
    x = np.asarray(dv["n_chars"], dtype=np.float64)
    term = sorted(store.df)[7]
    docs, scores = _score_map(store, term)
    xi = x[np.searchsorted(ids, docs.astype(np.int64))]
    fns = {
        "log": np.log(2.0 * xi + 1.0),
        "sigmoid": xi**0.6 / (xi**0.6 + 100.0**0.6),
        "linear": xi,
    }
    for fn, fx in fns.items():
        out = rank_feature_topk(
            store, term, ids, x, k=5, boost=1.5, pivot=100.0, scale=2.0,
            exponent=0.6, function=fn, round_decimals=6,
        )
        comb = np.round(scores + 1.5 * fx, 6)
        order = np.lexsort((docs, -comb))[:5]
        assert [(d, s) for d, s in out] == [
            (int(docs[i]), float(comb[i])) for i in order
        ], fn
    with _pytest.raises(ValueError, match="unknown function"):
        rank_feature_topk(store, term, ids, x, k=5, function="exp")


def test_scroll_all_equals_full_ranking(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, scroll_all, search_after

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    text = " ".join(sorted(store.df)[:3])
    full = search_after(store, text, 1 << 30, None, round_decimals=6)
    for size in (1, 7, 1000):
        rows = scroll_all(store, text, page_size=size, round_decimals=6)
        assert [(d, s) for _, _, d, s in rows] == full
        assert [r for _, r, _, _ in rows] == list(range(1, len(full) + 1))
        assert all(p == (r - 1) // size + 1 for p, r, _, _ in rows)


def test_sliced_scroll_partitions_the_drain(built):
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        scroll_all,
        scroll_sliced,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    text = " ".join(sorted(store.df)[:3])
    full = scroll_all(store, text, page_size=7, round_decimals=6)
    for m in (1, 3, 4):
        rows = scroll_sliced(store, text, n_slices=m, page_size=7, round_decimals=6)
        # disjoint union = the unsliced drain, global order preserved per slice
        assert sorted(d for _, _, _, d, _ in rows) == sorted(d for _, _, d, _ in full)
        by_slice: dict[int, list] = {}
        for sl, page, rank, d, s in rows:
            assert d % m == sl
            by_slice.setdefault(sl, []).append((page, rank, d, s))
        order = {d: i for i, (_, _, d, _) in enumerate(full)}
        for sl, seq in by_slice.items():
            assert [r for _, r, _, _ in seq] == list(range(1, len(seq) + 1))
            assert all(p == (r - 1) // 7 + 1 for p, r, _, _ in seq)
            idx = [order[d] for _, _, d, _ in seq]
            assert idx == sorted(idx)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scroll_sliced(store, text, n_slices=0, page_size=7)


def test_scroll_all_bad_page_size(built):
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, scroll_all

    res, _, _ = built
    with _pytest.raises(ValueError):
        scroll_all(SegmentStore(res.out_dir), "x", page_size=0)


# ---------------------------------------------------------------------------
# round-3 continuation 2: boxplot / string_stats / t_test / moving_fn /
# filters / date_range / rate / bucket_script / geo_bounds / eql_funnel

SF_EVENTS = "/root/testdata/sf0.001"


def test_boxplot_matches_numpy(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import boxplot_agg

    res, _, corpus = built
    t = boxplot_agg(res.out_dir)
    dl = pq.read_table(f"{res.out_dir}/forward_map", columns=["dl"])["dl"].to_numpy()
    assert t["min_dl"][0].as_py() == float(dl.min())
    assert t["max_dl"][0].as_py() == float(dl.max())
    for col, q in (("q1", 25), ("q2", 50), ("q3", 75)):
        assert t[col][0].as_py() == pytest.approx(
            round(float(np.percentile(dl, q)), 6), abs=1e-9
        )


def test_string_stats_entropy_bruteforce(ray_session):
    import collections

    from bitcoin_ledger_2es_ray.pipelines.aggs import string_stats_agg

    t = string_stats_agg(SF_EVENTS)
    texts = pq.read_table(f"{SF_EVENTS}/documents.parquet", columns=["text"])["text"].to_pylist()
    lens = [len(s) for s in texts]
    counts = collections.Counter("".join(texts))
    tot = sum(counts.values())
    ent = -sum((c / tot) * math.log2(c / tot) for c in counts.values())
    assert t["count"][0].as_py() == len(texts)
    assert t["min_length"][0].as_py() == min(lens)
    assert t["max_length"][0].as_py() == max(lens)
    assert t["avg_length"][0].as_py() == pytest.approx(sum(lens) / len(lens), abs=1e-6)
    assert t["entropy"][0].as_py() == pytest.approx(ent, abs=1e-6)


def test_t_test_welch_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import t_test_agg

    t = t_test_agg(SF_EVENTS, type_a="purchase", type_b="error")
    ev = pq.read_table(f"{SF_EVENTS}/events.parquet", columns=["event_type", "value"])
    et = np.asarray(ev["event_type"].cast(pa.string()))
    v = np.asarray(ev["value"], dtype=np.float64)
    a, b = v[et == "purchase"], v[et == "error"]
    want = (a.mean() - b.mean()) / math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert t["n_a"][0].as_py() == len(a) and t["n_b"][0].as_py() == len(b)
    assert t["t_value"][0].as_py() == pytest.approx(want, abs=1e-6)


def test_moving_fn_window_excludes_current():
    from bitcoin_ledger_2es_ray.pipelines.aggs import moving_fn_agg

    buckets = pa.table({"k": [0, 1, 2, 3, 4], "m": [5.0, 1.0, 4.0, 2.0, 3.0]})
    t = moving_fn_agg(buckets, key="k", metric="m", window=3)
    assert t["moving_min"].to_pylist() == [None, 5.0, 1.0, 1.0, 1.0]
    assert t["moving_max"].to_pylist() == [None, 5.0, 5.0, 5.0, 4.0]
    assert t["moving_sum"].to_pylist() == [None, 5.0, 6.0, 10.0, 7.0]


def test_filters_agg_bruteforce(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import filters_agg
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    term = sorted(store.df)[1]
    t = filters_agg(store, [(f"term_{term}", term)], dl_gte=("dl_gte_32", 32))
    d, _tf, dl = store.postings(term)
    fm = pq.read_table(f"{res.out_dir}/forward_map", columns=["dl"])["dl"].to_numpy()
    big = fm[fm >= 32]
    rows = {n: (c, a) for n, c, a in zip(
        t["filter_name"].to_pylist(), t["doc_count"].to_pylist(), t["avg_dl"].to_pylist()
    )}
    assert rows[f"term_{term}"][0] == len(d)
    assert rows[f"term_{term}"][1] == pytest.approx(float(np.mean(dl)), abs=1e-6)
    assert rows["dl_gte_32"][0] == len(big)
    if len(big):
        assert rows["dl_gte_32"][1] == pytest.approx(float(big.mean()), abs=1e-6)


def test_date_range_buckets_cover_all_events(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import date_range_agg

    edges = (1704672000, 1705276800)
    t = date_range_agg(SF_EVENTS, edges_s=edges)
    ev = pq.read_table(f"{SF_EVENTS}/events.parquet", columns=["ts", "value"])
    sec = np.asarray(ev["ts"].cast(pa.int64()), dtype=np.int64) // 1_000_000
    v = np.asarray(ev["value"], dtype=np.float64)
    assert t["key"].to_pylist() == [
        "*-1704672000", "1704672000-1705276800", "1705276800-*",
    ]
    masks = [sec < edges[0], (sec >= edges[0]) & (sec < edges[1]), sec >= edges[1]]
    assert t["doc_count"].to_pylist() == [int(m.sum()) for m in masks]
    for got, m in zip(t["sum_value"].to_pylist(), masks):
        assert got == pytest.approx(float(v[m].sum()), abs=1e-5)


def test_rate_and_bucket_script_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import bucket_script_ratio, rate_agg

    ev = pq.read_table(
        f"{SF_EVENTS}/events.parquet", columns=["ts", "event_type", "value"]
    )
    sec = np.asarray(ev["ts"].cast(pa.int64()), dtype=np.int64) // 1_000_000
    day = (sec // 86400) * 86400
    et = np.asarray(ev["event_type"].cast(pa.string()))
    v = np.asarray(ev["value"], dtype=np.float64)

    r = rate_agg(SF_EVENTS)
    for b, rs, rc in zip(
        r["bucket_s"].to_pylist(), r["rate_sum"].to_pylist(), r["rate_count"].to_pylist()
    ):
        m = day == b
        assert rs == pytest.approx(v[m].sum() / 24, abs=1e-5)
        assert rc == pytest.approx(m.sum() / 24, abs=1e-6)  # engine rounds to 6dp

    bs = bucket_script_ratio(SF_EVENTS)
    for b, ratio in zip(bs["bucket_s"].to_pylist(), bs["ratio"].to_pylist()):
        m = day == b
        p = v[m & (et == "purchase")].sum()
        c = int((m & (et == "click")).sum())
        if c == 0:
            assert ratio is None
        else:
            assert ratio == pytest.approx(p / c, abs=1e-5)


def test_geo_bounds_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.geo import derive_coords, geo_bounds_agg

    t = geo_bounds_agg(SF_EVENTS)
    cust = pq.read_table(
        f"{SF_EVENTS}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lat, lon = derive_coords(np.asarray(cust["c_custkey"], dtype=np.int64))
    seg = np.asarray(cust["c_mktsegment"].cast(pa.string()))
    for s, top, bot, left, right in zip(
        t["c_mktsegment"].to_pylist(), t["top"].to_pylist(), t["bottom"].to_pylist(),
        t["left"].to_pylist(), t["right"].to_pylist(),
    ):
        m = seg == s
        assert top == pytest.approx(lat[m].max(), abs=1e-6)
        assert bot == pytest.approx(lat[m].min(), abs=1e-6)
        assert left == pytest.approx(lon[m].min(), abs=1e-6)
        assert right == pytest.approx(lon[m].max(), abs=1e-6)


def test_eql_funnel_bruteforce(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import eql_funnel

    steps = ("signup", "purchase", "error")
    maxspan = 7 * 86400
    t = eql_funnel(SF_EVENTS, steps=steps, maxspan_s=maxspan)
    ev = pq.read_table(
        f"{SF_EVENTS}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    sec = np.asarray(ev["ts"].cast(pa.int64()), dtype=np.int64) // 1_000_000
    uid = np.asarray(ev["user_id"], dtype=np.int64)
    et = np.asarray(ev["event_type"].cast(pa.string()))
    want = {}
    for u in np.unique(uid):
        m = uid == u
        s, e = sec[m], et[m]
        order = np.argsort(s, kind="stable")
        s, e = s[order], e[order]
        prev, times = -1, []
        ok = True
        for step in steps:
            cand = s[(e == step) & (s > prev)]
            if len(cand) == 0:
                ok = False
                break
            prev = int(cand[0])
            times.append(prev)
        if ok and times[-1] - times[0] <= maxspan:
            want[int(u)] = tuple(times)
    got = {
        u: (t1, t2, t3)
        for u, t1, t2, t3 in zip(
            t["user_id"].to_pylist(), t["t1_s"].to_pylist(),
            t["t2_s"].to_pylist(), t["t3_s"].to_pylist(),
        )
    }
    assert got == want


def test_percentiles_bucket_and_correlation():
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        bucket_correlation,
        percentiles_bucket,
    )

    buckets = pa.table({"k": [0, 1, 2, 3], "m": [10.0, 20.0, 40.0, 30.0]})
    t = percentiles_bucket(buckets, "m", quantiles=(0.5,))
    assert t["value"][0].as_py() == 25.0  # median of 10,20,30,40
    b2 = pa.table({"k": [0, 1, 2], "a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0]})
    c = bucket_correlation(b2, "a", "b")
    assert c["correlation"][0].as_py() == 1.0
    with pytest.raises(ValueError):
        percentiles_bucket(pa.table({"m": pa.array([], type=pa.float64())}), "m")
    with pytest.raises(ValueError):
        bucket_correlation(pa.table({"a": [1.0], "b": [1.0]}), "a", "b")
    with pytest.raises(ValueError):
        bucket_correlation(pa.table({"a": [1.0, 1.0], "b": [1.0, 2.0]}), "a", "b")


def test_geo_line_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.geo import derive_coords, geo_line_agg

    sf = "/root/testdata/sf0.001"
    t = geo_line_agg(sf, size=3)
    cust = pq.read_table(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )
    rows = list(
        zip(
            cust["c_mktsegment"].to_pylist(), cust["c_acctbal"].to_pylist(),
            cust["c_custkey"].to_pylist(),
        )
    )
    import collections

    by_seg = collections.defaultdict(list)
    for s, bal, key in rows:
        by_seg[s].append((-bal, key))
    for seg, npts, line in zip(
        t["c_mktsegment"].to_pylist(), t["n_points"].to_pylist(), t["line"].to_pylist()
    ):
        top = sorted(by_seg[seg])[:3]
        keys = np.array([k for _, k in top], dtype=np.int64)
        lat, lon = derive_coords(keys)
        want = " ".join(f"{round(la,6)},{round(lo,6)}" for la, lo in zip(lat, lon))
        assert npts == len(top)
        assert line == want, seg


def test_hopping_window_replication(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.events import hopping_window

    t = hopping_window(SF_EVENTS, size_s=3600, hop_s=1800)
    ev = pq.read_table(f"{SF_EVENTS}/events.parquet", columns=["ts", "value"])
    sec = np.asarray(ev["ts"].cast(pa.int64()), dtype=np.int64) // 1_000_000
    v = np.asarray(ev["value"], dtype=np.float64)
    import collections

    n = collections.Counter()
    s = collections.Counter()
    for x, val in zip(sec.tolist(), v.tolist()):
        for j in (0, 1):
            w = ((x // 1800) - j) * 1800
            n[w] += 1
            s[w] += val
    assert dict(zip(t["window_start"].to_pylist(), t["n_events"].to_pylist())) == dict(n)
    # every event counted exactly twice
    assert sum(t["n_events"].to_pylist()) == 2 * len(sec)
    with pytest.raises(ValueError):
        hopping_window(SF_EVENTS, size_s=3600, hop_s=1000)


def test_zipf_fit_polyfit_identity(built, ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import zipf_fit

    res, _, _corpus = built
    t = zipf_fit(res.out_dir)
    td = pq.read_table(f"{res.out_dir}/term_dict.parquet", columns=["term", "cf"])
    agg = td.group_by("term").aggregate([("cf", "sum")])
    terms = np.array(agg["term"].to_pylist())
    cf = np.asarray(agg["cf_sum"], dtype=np.float64)
    order = np.lexsort((terms, -cf))
    y = np.log(cf[order])
    x = np.log(np.arange(1, len(y) + 1, dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    assert t["n_terms"][0].as_py() == len(y)
    assert t["slope"][0].as_py() == pytest.approx(slope, abs=1e-6)
    assert t["intercept"][0].as_py() == pytest.approx(intercept, abs=1e-6)
    assert 0.0 <= t["r2"][0].as_py() <= 1.0


def test_model_rerank_actor_pool(built, ray_session):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.query import (
        ModelReranker,
        model_rerank,
        score_query,
        SegmentStore,
    )

    res, _, _corpus = built
    store = SegmentStore(res.out_dir)
    text = sorted(store.df)[0]
    q = pa.table({"query_id": [3], "text": [text]})
    t = model_rerank(res.out_dir, q, k=5, window=10, concurrency=2)
    base = score_query(store, text, 10, round_decimals=6)
    want = sorted(
        (
            (d, round(s + (((d + 3) * 2654435761) % 1000) / 1000.0, 6))
            for d, s in base
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    got = list(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    assert got == want
    assert t["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_max_passage_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.chunking import max_passage_topk

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    # brute force: chunk every doc, chunk-level BM25, max per doc
    W, S = 16, 8
    chunks = []
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = txt.split(" ")
        for c in range((len(w) - 1) // S + 1):
            chunks.append((d, w[c * S : c * S + W]))
    nc = len(chunks)
    avgcl = sum(len(c) for _, c in chunks) / nc
    cdf = collections.Counter()
    for _, c in chunks:
        for t in set(c):
            cdf[t] += 1
    text = chunks[0][1][0] + " " + chunks[3][1][-1]
    q = pa.table({"query_id": [0], "text": [text]})
    got = max_passage_topk(sf, q, window=W, stride=S, k=5)
    best = {}
    for d, c in chunks:
        s = 0.0
        cnt = collections.Counter(c)
        for t in set(text.split(" ")):
            if cnt[t] == 0 or cdf[t] == 0:
                continue
            idf = math.log(1 + (nc - cdf[t] + 0.5) / (cdf[t] + 0.5))
            tf = cnt[t]
            s += idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(c) / avgcl))
        if s > 0:
            best[d] = max(best.get(d, 0.0), s)
    want = sorted(
        ((d, round(s, 6)) for d, s in best.items()), key=lambda kv: (-kv[1], kv[0])
    )[:5]
    assert list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist())) == want


def test_terms_partitioned_covers_vocab(built, ray_session):
    import hashlib

    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_agg_partitioned

    res, _, _corpus = built
    P = 3
    parts = [terms_agg_partitioned(res.out_dir, p, P) for p in range(P)]
    all_terms = sorted(t for p in parts for t in p["term"].to_pylist())
    import pyarrow.parquet as pq

    td = pq.read_table(f"{res.out_dir}/term_dict.parquet", columns=["term"])
    assert all_terms == sorted(set(td["term"].to_pylist()))  # exact cover
    for p_idx, p in enumerate(parts):
        for t in p["term"].to_pylist():
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            assert h % P == p_idx
    with pytest.raises(ValueError):
        terms_agg_partitioned(res.out_dir, 3, 3)


def test_geo_polygon_halfplanes(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.geo import derive_coords, geo_polygon

    sf = "/root/testdata/sf0.001"
    poly = [(-70.0, -100.0), (60.0, 20.0), (50.0, -140.0)]
    t = geo_polygon(sf, poly)
    cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
    lat, lon = derive_coords(np.asarray(cust["c_custkey"], dtype=np.int64))
    want = []
    for key, la, lo in zip(cust["c_custkey"].to_pylist(), lat, lon):
        ok = True
        for (a1, o1), (a2, o2) in zip(poly, poly[1:] + poly[:1]):
            if (o2 - o1) * (la - a1) - (a2 - a1) * (lo - o1) < 0:
                ok = False
                break
        if ok:
            want.append(key)
    assert t["c_custkey"].to_pylist() == sorted(want)
    with pytest.raises(ValueError):
        geo_polygon(sf, poly[:2])


def test_cat_segments_consistency(built, ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.apis import cat_segments
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _corpus = built
    t = cat_segments(res.out_dir)
    assert t.num_rows >= 1
    store = SegmentStore(res.out_dir)
    # total postings across shards == sum of df over the term dict
    td = pq.read_table(f"{res.out_dir}/term_dict.parquet", columns=["df"])
    assert sum(t["n_postings"].to_pylist()) == sum(td["df"].to_pylist())
    assert all(b > 0 for b in t["file_bytes"].to_pylist())


def test_variable_width_histogram_bruteforce(built, ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.aggs import variable_width_histogram

    res, _, _corpus = built
    B = 4
    t = variable_width_histogram(res.out_dir, buckets=B)
    dl = pq.read_table(f"{res.out_dir}/forward_map", columns=["dl"])["dl"].to_numpy()
    import collections

    cnt = collections.Counter(dl.tolist())
    cl = [(v * c, c, v, v) for v, c in sorted(cnt.items())]
    while len(cl) > B:
        cents = [s / n for s, n, _, _ in cl]
        gaps = [cents[i + 1] - cents[i] for i in range(len(cl) - 1)]
        i = min(range(len(gaps)), key=lambda j: (gaps[j], j))
        s1, n1, mn1, _ = cl[i]
        s2, n2, _, mx2 = cl[i + 1]
        cl[i : i + 2] = [(s1 + s2, n1 + n2, mn1, mx2)]
    assert t["doc_count"].to_pylist() == [n for _, n, _, _ in cl]
    assert t["min_dl"].to_pylist() == [float(mn) for _, _, mn, _ in cl]
    assert t["max_dl"].to_pylist() == [float(mx) for _, _, _, mx in cl]
    for got, (s, n, _, _) in zip(t["key"].to_pylist(), cl):
        assert got == pytest.approx(s / n, abs=1e-6)
    assert sum(t["doc_count"].to_pylist()) == len(dl)


def test_frequent_item_sets_bruteforce(ray_session):
    import collections
    import itertools

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.aggs import frequent_item_sets

    sf = "/root/testdata/sf0.001"
    minsup = 5
    t = frequent_item_sets(sf, min_support=minsup)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
    sup = collections.Counter()
    for txt in docs:
        for a, b in itertools.combinations(sorted(set(txt.split(" "))), 2):
            sup[(a, b)] += 1
    want = sorted((a, b, c) for (a, b), c in sup.items() if c >= minsup)
    got = list(
        zip(t["item_a"].to_pylist(), t["item_b"].to_pylist(), t["support"].to_pylist())
    )
    assert got == want


# ---------------------------------------------------------------------------
# global / missing / value_count / scripted_metric / categorize_text /
# msearch / search_template / validate


def test_global_agg_bruteforce(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import global_agg
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(f"/root/testdata/sf0.001/documents.parquet")
    dl = {
        int(d): len(t.split(" "))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    terms = sorted(store.df)[:2]
    d0, _, _ = store.postings(terms[0])
    hits = pa.table(
        {
            "query_id": pa.array([0] * len(d0), type=pa.int64()),
            "doc_id": pa.array(d0.astype("int64")),
        }
    )
    out = global_agg(res.out_dir, hits, query_ids=[0, 1])
    rows = {
        (int(q), s): (int(n), int(sd))
        for q, s, n, sd in zip(
            out["query_id"].to_pylist(),
            out["scope"].to_pylist(),
            out["doc_count"].to_pylist(),
            out["sum_dl"].to_pylist(),
        )
    }
    tot = (len(dl), sum(dl.values()))
    assert rows[(0, "global")] == tot and rows[(1, "global")] == tot
    assert rows[(0, "hits")] == (len(d0), sum(dl[int(d)] for d in d0))
    assert rows[(1, "hits")] == (0, 0)  # zero-hit query keeps an explicit row


def test_field_presence_and_exists(built, ray_session):
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.aggs import field_presence_agg
    from bitcoin_ledger_2es_ray.pipelines.apis import exists_docs

    res, _, _ = built
    fm = pads.dataset(f"{res.out_dir}/forward_map").to_table(
        columns=["doc_id", "lang"]
    )
    langs = fm["lang"].to_pylist()
    n_en = sum(1 for x in langs if x == "en")
    out = field_presence_agg(res.out_dir, {"lang": "en"})
    assert out["field"].to_pylist() == ["lang"]
    assert out["missing_count"][0].as_py() == n_en
    assert out["exists_count"][0].as_py() == len(langs) - n_en
    assert out["value_count"][0].as_py() == len(langs) - n_en

    ex = exists_docs(res.out_dir, "lang", "en")
    want = sorted(
        int(d) for d, l in zip(fm["doc_id"].to_pylist(), langs) if l != "en"
    )
    assert ex["doc_id"].to_pylist() == want


def test_scripted_metric_batch_split_invariance(ray_session):
    """The cent-moment state must combine associatively: the metric is
    identical whatever the batch split (here vs one whole-table pass)."""
    import pyarrow.compute as pc

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.aggs import scripted_metric_agg

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])

    def map_script(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch["value"], 100.0)).cast(pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_c": cents,
                "sum_c2": pc.multiply(cents, cents),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("sum_c", "sum"), ("sum_c2", "sum")]
        )
        return g.select(
            ["event_type", "n_sum", "sum_c_sum", "sum_c2_sum"]
        ).rename_columns(["event_type", "n", "sum_c", "sum_c2"])

    def reduce_script(state: pa.Table) -> pa.Table:
        var = [
            sql_round((n * s2 - s * s) / (n * n) / 10000.0, 6)
            for n, s, s2 in zip(
                state["n"].to_pylist(),
                state["sum_c"].to_pylist(),
                state["sum_c2"].to_pylist(),
            )
        ]
        return pa.table(
            {"event_type": state["event_type"], "var_value": pa.array(var)}
        )

    got = scripted_metric_agg(
        f"{sf}/events.parquet", "event_type", map_script, reduce_script,
        columns=["event_type", "value"],
    )
    # brute force with exact integer moments per group
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    types = np.asarray(ev["event_type"].to_pylist())
    want = {}
    for et in sorted(set(types.tolist())):
        c = cents[types == et].tolist()
        n, s, s2 = len(c), sum(c), sum(x * x for x in c)
        want[et] = sql_round((n * s2 - s * s) / (n * n) / 10000.0, 6)
    assert {
        et: v
        for et, v in zip(got["event_type"].to_pylist(), got["var_value"].to_pylist())
    } == want


def test_categorize_text_bruteforce(ray_session):
    import re
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.aggs import categorize_text_agg

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = Counter(
        " ".join(re.sub(r"[0-9]+", "#", t).split(" ")[:4]) for t in texts
    )
    got = categorize_text_agg(sf, n_tokens=4)
    assert {
        c: n
        for c, n in zip(got["category"].to_pylist(), got["doc_count"].to_pylist())
    } == dict(want)
    # categories sorted, counts positive
    cats = got["category"].to_pylist()
    assert cats == sorted(cats)


def test_msearch_legs_equal_kernels(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.apis import msearch
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    terms = sorted(store.df)
    reqs = [
        {"kind": "match", "text": f"{terms[0]} {terms[3]}"},
        {"kind": "filter", "term": terms[1]},
    ]
    out = msearch(store, reqs, k=5, round_decimals=6)
    m = out.filter(pa.compute.equal(out["slot"], 0))
    want = score_query(store, f"{terms[0]} {terms[3]}", 5, round_decimals=6)
    assert list(zip(m["doc_id"].to_pylist(), m["score"].to_pylist())) == [
        (int(d), float(s)) for d, s in want
    ]
    f = out.filter(pa.compute.equal(out["slot"], 1))
    d, _, _ = store.postings(terms[1])
    assert f["doc_id"].to_pylist() == sorted(int(x) for x in d)[:5]
    assert set(f["score"].to_pylist()) == {1.0}
    with pytest.raises(ValueError):
        msearch(store, [{"kind": "nope"}], k=5)


def test_search_template_render_and_errors(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.apis import (
        render_template,
        search_template,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    assert render_template("{{a}} x {{ b }}", {"a": "1", "b": "2"}) == "1 x 2"
    with pytest.raises(KeyError):
        render_template("{{missing}}", {})

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    terms = sorted(store.df)
    out = search_template(store, "{{q}}", {"q": terms[0]}, k=4, round_decimals=6)
    want = score_query(store, terms[0], 4, round_decimals=6)
    assert out["doc_id"].to_pylist() == [int(d) for d, _ in want]
    assert out["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_validate_query_rules():
    from bitcoin_ledger_2es_ray.pipelines.apis import validate_query

    out = validate_query(["a b a", "", "   ", "*x", "y ?z", "ok"])
    rows = {
        q: (v, e)
        for q, v, e in zip(
            out["query"].to_pylist(),
            out["valid"].to_pylist(),
            out["explanation"].to_pylist(),
        )
    }
    assert rows["a b a"] == (True, "ok:2")
    assert rows[""] == (False, "error:empty")
    assert rows["   "] == (False, "error:empty")
    assert rows["*x"] == (False, "error:leading_wildcard")
    assert rows["y ?z"] == (False, "error:leading_wildcard")
    assert rows["ok"] == (True, "ok:1")


# ---------------------------------------------------------------------------
# index sorting (sorted view + early-terminated sorted top-k)


def test_sorted_view_topk(built, tmp_path_factory):
    import json
    import os

    from bitcoin_ledger_2es_ray.pipelines.sortindex import (
        build_sorted_view,
        sorted_topk,
    )

    res, _, corpus = built
    out = str(tmp_path_factory.mktemp("sv") / "sorted_dl")
    view = build_sorted_view(res.out_dir, field="dl", out_dir=out, num_buckets=8)
    fm = pq.read_table(os.path.join(res.out_dir, "forward_map"), columns=["doc_id", "dl"])
    want = sorted(zip(fm["dl"].to_pylist(), fm["doc_id"].to_pylist()))

    # full-read equivalence (k = n)
    t, _ = sorted_topk(view, k=fm.num_rows)
    got = list(zip(t["dl"].to_pylist(), t["doc_id"].to_pylist()))
    assert got == want

    # early termination: small k touches a strict subset of buckets
    t, read = sorted_topk(view, k=10)
    got = list(zip(t["dl"].to_pylist(), t["doc_id"].to_pylist()))
    assert got == want[:10]
    with open(os.path.join(view, "sorted_view.json")) as f:
        man = json.load(f)
    assert read < len(man["buckets"])
    # manifest rows cover every doc exactly once
    assert sum(b["n_rows"] for b in man["buckets"]) == fm.num_rows
    # bucket key ranges are disjoint and ordered
    for a, b in zip(man["buckets"], man["buckets"][1:]):
        assert a["key_max"] <= b["key_min"]

    # idempotent: second call short-circuits on the manifest
    assert build_sorted_view(res.out_dir, field="dl", out_dir=out) == view


def test_disk_usage_footer_only(built):
    from bitcoin_ledger_2es_ray.pipelines.apis import disk_usage
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    out = disk_usage(res.out_dir)
    rows = {(r["artifact"], r["column"]): r for r in out.to_pylist()}
    # every SEGMENT schema column accounted for
    for col in ("term", "salt", "df", "cf", "max_tf", "doc_ids", "tfs", "dls"):
        assert ("segments", col) in rows, col
    for col in ("doc_id", "repo", "path", "lang", "dl"):
        assert ("forward_map", col) in rows, col
    assert ("term_dict", "term") in rows
    for r in rows.values():
        assert 0 < r["compressed_bytes"]
        assert r["compressed_bytes"] <= r["uncompressed_bytes"] * 2  # headers ok
    # posting payloads dominate the segment bytes on a real index
    seg_total = sum(
        r["compressed_bytes"] for (a, _), r in rows.items() if a == "segments"
    )
    payload = sum(
        rows[("segments", c)]["compressed_bytes"] for c in ("doc_ids", "tfs", "dls")
    )
    assert payload > 0.3 * seg_total
    # deterministic
    assert disk_usage(res.out_dir).equals(out)


def test_profile_counters_brute(built):
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, profile_query

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    vocab = sorted(store.df)
    text = " ".join(sorted({vocab[0], vocab[4], "zzznope"}))
    p = profile_query(store, text)
    terms = {vocab[0], vocab[4]}
    doc_sets = [
        {i for i, d in enumerate(docs) if t in d.split(" ")} for t in terms
    ]
    assert p["n_terms"] == 2  # the unknown term is not live
    assert p["n_postings"] == sum(len(s) for s in doc_sets)
    assert p["n_candidates"] == len(set().union(*doc_sets))
    assert p["n_lists"] >= p["n_terms"]  # salt slices only add lists
    assert profile_query(store, "zzznope") == {
        "n_terms": 0, "n_lists": 0, "n_postings": 0, "n_candidates": 0,
    }


def test_prf_expand_brute(built):
    import math
    from collections import Counter

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.functions.tokenize import tokenize_query
    from bitcoin_ledger_2es_ray.pipelines.mlt import prf_expand_topk
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore, score_query

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    toks = [d.split(" ") for d in docs]
    tfs = [Counter(t) for t in toks]
    df = Counter(t for c in tfs for t in c)
    n, avgdl = len(docs), sum(len(t) for t in toks) / len(docs)

    def _idf(t):
        return math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))

    def weighted_rank(wterms, k):
        sc = {}
        for t, w in wterms:
            if df[t] == 0:
                continue
            for d_i, c in enumerate(tfs):
                if t in c:
                    dl = len(toks[d_i])
                    sc[d_i] = sc.get(d_i, 0.0) + w * _idf(t) * c[t] / (
                        c[t] + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                    )
        rows = sorted(
            ((d, float(sql_round(s, 6))) for d, s in sc.items()),
            key=lambda r: (-r[1], r[0]),
        )
        return rows[:k]

    vocab = sorted(store.df)
    for text in [vocab[2], " ".join(sorted({vocab[0], vocab[5]}))]:
        base_terms = sorted(set(tokenize_query(text)))
        fb = [d for d, _ in score_query(store, text, 3, round_decimals=6)]
        cand = Counter()
        for d in fb:
            cand.update(tfs[d])
        sel = sorted(
            (
                (float(sql_round(stf * _idf(t), 6)), t)
                for t, stf in cand.items()
                if t not in base_terms
            ),
            key=lambda r: (-r[0], r[1]),
        )
        expansion = sorted(t for _, t in sel[:3])
        want = weighted_rank(
            [(t, 1.0) for t in base_terms] + [(t, 0.5) for t in expansion], 10
        )
        got = prf_expand_topk(
            store, res.out_dir, text, k=10, n_feedback=3, n_expand=3,
            expand_weight=0.5, round_decimals=6,
        )
        assert got == want, text
        # expansion changed the ranking vs plain BM25 for at least one query
    assert prf_expand_topk(store, res.out_dir, "zzznope", k=5) == []


def test_simulate_pipeline_order_and_errors(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as _pq

    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = str(tmp_path)
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["  Hello World  ", "abc DEF"],
                "lang": ["en", "de"],
            }
        ),
        f"{sf}/documents.parquet",
    )
    out = simulate_pipeline(
        sf,
        [
            {"type": "trim", "field": "text"},
            {"type": "lowercase", "field": "text"},
            {"type": "gsub", "field": "text", "pattern": "o", "replacement": "0"},
            {"type": "fingerprint", "fields": ["text", "lang"], "target": "fp"},
        ],
    ).to_pylist()
    # ORDER matters: trim then lowercase then gsub
    assert out[0]["text"] == "hell0 w0rld"
    assert out[1]["text"] == "abc def"
    for r in out:
        assert r["fp"] == hashlib.sha256(
            f"{r['text']}|{r['lang']}".encode()
        ).hexdigest()
    # unknown processor rejected at registration (pipeline-level, like ES)
    with pytest.raises(ValueError, match="unknown processor"):
        simulate_pipeline(sf, [{"type": "frobnicate", "field": "text"}])


# ---------------------------------------------------------------------------
# histogram field type (pre-aggregated histograms + metric aggs over them)


def test_histogram_field_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        histogram_field,
        histogram_field_lists,
        histogram_percentiles,
    )

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "value"])
    u = np.asarray(ev["user_id"], dtype=np.int64)
    cents = np.rint(np.asarray(ev["value"], dtype=np.float64) * 100).astype(np.int64)
    hbin = (cents // 2500) * 2500

    field = histogram_field(sf, width=25.0)
    # brute force: every (user, bin) count matches
    from collections import Counter

    want = Counter(zip(u.tolist(), hbin.tolist()))
    got = Counter(
        zip(
            field["user_id"].to_pylist(),
            (np.rint(np.asarray(field["hbin"]) * 100).astype(np.int64)).tolist(),
        )
    )
    counts = dict(
        zip(
            zip(
                field["user_id"].to_pylist(),
                np.rint(np.asarray(field["hbin"]) * 100).astype(np.int64).tolist(),
            ),
            field["n"].to_pylist(),
        )
    )
    assert set(got) == set(want)
    assert counts == dict(want)
    # sorted exploded layout
    assert field["user_id"].to_pylist() == sorted(field["user_id"].to_pylist())

    # list-typed wire shape: per-user lists align and re-explode losslessly
    lists = histogram_field_lists(field)
    assert lists.num_rows == len(set(u.tolist()))
    for row in range(min(5, lists.num_rows)):
        vals = lists["values"][row].as_py()
        cnts = lists["counts"][row].as_py()
        assert vals == sorted(vals) and len(vals) == len(cnts)

    # percentiles over the histogram field == numpy quantile_cont over the
    # BINNED raw values (binning is exactly what the field stored)
    pct = histogram_percentiles(sf, width=25.0)
    expanded = hbin / 100.0
    for q, v in zip(pct["q"].to_pylist(), pct["value"].to_pylist()):
        assert v == pytest.approx(
            float(np.quantile(expanded, q, method="linear")), abs=1e-6
        )


def test_ip_range_agg_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import ip_range_agg

    sf = "/root/testdata/sf0.001"
    out = ip_range_agg(sf)
    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id"])
    u = np.asarray(ev["user_id"], dtype=np.int64)
    ip = (u * 2654435761) % (1 << 32)
    b = np.minimum(ip // (1 << 30), 3)
    assert out["doc_count"].to_pylist() == [int((b == i).sum()) for i in range(4)]
    assert out["unique_users"].to_pylist() == [
        len(set(u[b == i].tolist())) for i in range(4)
    ]
    assert out["key"].to_pylist()[0] == "*-64.0.0.0"
    assert sum(out["doc_count"].to_pylist()) == len(u)


def test_terms_shard_error_bounds(ray_session):
    """Shard-truncated terms agg: counts never exceed exact df, undercount
    is bounded by the reported error, un-truncated shards give zero error."""
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_shard_error_agg

    sf = "/root/testdata/sf0.001"
    out = terms_shard_error_agg(sf, n_shards=4, shard_size=5, size=10)

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    exact = Counter()
    shard_df = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        for term in set(t.split(" ")):
            exact[term] += 1
            shard_df.setdefault(d % 4, Counter())[term] += 1

    for row in out.to_pylist():
        true_df = exact[row["term"]]
        assert row["doc_count"] <= true_df  # truncation only undercounts
        assert true_df - row["doc_count"] <= row["error_bound"]  # ES bound

    # shard_size >= vocab: truncation is a no-op, counts exact, errors zero
    full = terms_shard_error_agg(sf, n_shards=4, shard_size=10_000, size=10)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["term"], r["doc_count"]) for r in full.to_pylist()] == want
    assert all(r["error_bound"] == 0 for r in full.to_pylist())


def test_terms_shard_error_exhausted_shard_contributes_zero(ray_session, tmp_path):
    """A shard that returns FEWER than shard_size terms was exhausted, not
    truncated — ES contributes 0 to the error bound for it."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import terms_shard_error_agg

    docs = pa.table(
        {
            "doc_id": pa.array([0, 2, 4, 1, 3], type=pa.int64()),
            "text": pa.array(["a b c d e", "a b", "a c", "x y", "x"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = terms_shard_error_agg(str(tmp_path), n_shards=2, shard_size=3, size=10)
    got = {r["term"]: (r["doc_count"], r["error_bound"]) for r in out.to_pylist()}
    # shard 0 (even docs) truncates at df=2; shard 1 (odd docs) returned
    # only {x, y} < shard_size -> exhausted, bound 0
    assert got == {
        "a": (3, 0),  # missing only from the EXHAUSTED shard -> 0, not 1
        "b": (2, 0),
        "c": (2, 0),
        "x": (2, 2),  # missing from the truncated shard -> its last df
        "y": (1, 2),
    }


def test_heavy_hitters_mg_guarantees(ray_session):
    """Misra-Gries invariants: no overcount, bounded undercount, every
    true heavy hitter (> N/(k+1)) present; k >= vocab is exact."""
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.aggs import heavy_hitters

    sf = "/root/testdata/sf0.001"
    k = 8
    out = heavy_hitters(sf, k=k)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    exact = Counter()
    for t in docs["text"].to_pylist():
        exact.update(t.split(" "))
    n_total = sum(exact.values())

    got = {r["term"]: (r["est_count"], r["max_count"]) for r in out.to_pylist()}
    assert 0 < len(got) <= k
    for term, (est, mx) in got.items():
        assert est <= exact[term] <= mx
    thresh = n_total / (k + 1)
    for term, cnt in exact.items():
        if cnt > thresh:
            assert term in got, (term, cnt, thresh)

    big = heavy_hitters(sf, k=10_000)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["term"], r["est_count"]) for r in big.to_pylist()] == want
    assert all(r["max_count"] == r["est_count"] for r in big.to_pylist())


def test_graph_explore_brute_force(ray_session):
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.apis import graph_explore

    sf = "/root/testdata/sf0.001"
    out = graph_explore(sf, seed_ranks=(1, 7), size=8)

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    docsets = [set(t.split(" ")) for t in docs["text"].to_pylist()]
    vocab = sorted(set().union(*docsets))
    seeds = [vocab[1 % len(vocab)], vocab[7 % len(vocab)]]
    hitdocs = [s_ for s_ in docsets if s_ & set(seeds)]
    fg = Counter()
    for d in hitdocs:
        fg.update(t for t in d if t not in seeds)
    kept = [t for t, _ in sorted(fg.items(), key=lambda kv: (-kv[1], kv[0]))[:8]]
    want = []
    for s in sorted(set(seeds)):
        for t in kept:
            co = sum(1 for d in hitdocs if s in d and t in d)
            if co:
                want.append((s, t, co))
    want.sort()
    got = [(r["seed"], r["term"], r["co_doc_count"]) for r in out.to_pylist()]
    assert got == want


def test_ip_prefix_brute_force(ray_session):
    from collections import defaultdict

    from bitcoin_ledger_2es_ray.pipelines.events import ip_prefix_agg

    sf = "/root/testdata/sf0.001"
    out = ip_prefix_agg(sf, prefix_length=4)

    users = pq.read_table(f"{sf}/events.parquet", columns=["user_id"])["user_id"].to_pylist()
    nets = defaultdict(lambda: [0, set()])
    for u in users:
        ip = (u * 2654435761) % (1 << 32)
        net = (ip >> 28) << 28
        nets[net][0] += 1
        nets[net][1].add(u)
    want = sorted(nets.items())
    assert out["key"].to_pylist() == [
        f"{a >> 24}.{(a >> 16) & 255}.{(a >> 8) & 255}.{a & 255}" for a, _ in want
    ]
    assert out["doc_count"].to_pylist() == [n for _, (n, _) in want]
    assert out["unique_users"].to_pylist() == [len(s) for _, (_, s) in want]
    assert set(out["prefix_length"].to_pylist()) == {4}
    # every bucket present is non-empty (ES min_doc_count=1 semantics)
    assert min(out["doc_count"].to_pylist()) >= 1


def test_bulk_apply_sequential_simulation(ray_session):
    """The vectorized recursion-free fold equals a literal sequential
    replay of ES bulk semantics (index/create/update/delete, version
    bumps on success only)."""
    from bitcoin_ledger_2es_ray.pipelines.apis import bulk_apply

    sf = "/root/testdata/sf0.001"
    out = bulk_apply(sf)

    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    docs, version, errors = {}, {}, {}
    for u, eid, v in zip(ev["user_id"], ev["event_id"], ev["value"]):
        op = eid % 4
        version.setdefault(u, 0)
        errors.setdefault(u, 0)
        if op == 0:  # index: unconditional upsert
            docs[u] = v
            version[u] += 1
        elif op == 1:  # create: conflict if present
            if u in docs:
                errors[u] += 1
            else:
                docs[u] = v
                version[u] += 1
        elif op == 2:  # update: scripted increment, missing → error
            if u in docs:
                docs[u] += v
                version[u] += 1
            else:
                errors[u] += 1
        else:  # delete: not_found if absent
            if u in docs:
                del docs[u]
                version[u] += 1
            else:
                errors[u] += 1
    want = sorted(docs.items())
    assert out["user_id"].to_pylist() == [u for u, _ in want]
    assert out["value"].to_pylist() == [round(v, 6) for _, v in want]
    assert out["version"].to_pylist() == [version[u] for u, _ in want]
    assert out["n_errors"].to_pylist() == [errors[u] for u, _ in want]


def test_bucket_ks_test_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.aggs import bucket_count_ks_test
    from bitcoin_ledger_2es_ray.pipelines.events import bucket_script_ratio

    sf = "/root/testdata/sf0.001"
    buckets = bucket_script_ratio(sf, num_type="purchase", den_type="click")
    out = bucket_count_ks_test(buckets, count_col="den_count")

    c = np.asarray(buckets["den_count"], dtype=np.float64)
    femp = np.cumsum(c) / c.sum()
    fexp = np.arange(1, len(c) + 1) / len(c)
    assert out["n_buckets"][0].as_py() == len(c)
    assert out["d_plus"][0].as_py() == round(float((femp - fexp).max()), 6)
    assert out["d_minus"][0].as_py() == round(float((fexp - femp).max()), 6)
    assert out["d"][0].as_py() == max(
        out["d_plus"][0].as_py(), out["d_minus"][0].as_py()
    )
    # a distribution that exactly matches its fractions scores d == 0
    import pyarrow as pa

    flat = pa.table({"n": pa.array([5, 5, 5, 5], type=pa.int64())})
    z = bucket_count_ks_test(flat, "n")
    assert z["d"][0].as_py() == 0.0
    # fractions shift the expectation
    skew = bucket_count_ks_test(flat, "n", fractions=[0.7, 0.1, 0.1, 0.1])
    assert skew["d"][0].as_py() > 0.0
    with pytest.raises(ValueError, match="bad fractions"):
        bucket_count_ks_test(flat, "n", fractions=[1.0])


def test_geo_shape_envelope_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_shape_envelope

    sf = "/root/testdata/sf0.001"
    box = (-30.0, 40.0, -60.0, 80.0)
    out = geo_shape_envelope(sf, box=box)

    ck = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])[
        "c_custkey"
    ].to_pylist()
    want = {r: [0, 0] for r in ("contains", "disjoint", "intersects", "within")}
    for k in ck:
        lat = ((k * 7919) % 18000) / 100.0 - 90.0
        lon = ((k * 104729) % 36000) / 100.0 - 180.0
        dlat = ((k * 31) % 500) / 100.0
        dlon = ((k * 53) % 1000) / 100.0
        alo, ahi, olo, ohi = lat - dlat, lat + dlat, lon - dlon, lon + dlon
        inter = alo <= box[1] and ahi >= box[0] and olo <= box[3] and ohi >= box[2]
        within = alo >= box[0] and ahi <= box[1] and olo >= box[2] and ohi <= box[3]
        contains = alo <= box[0] and ahi >= box[1] and olo <= box[2] and ohi >= box[3]
        for rel, m in (
            ("intersects", inter),
            ("disjoint", not inter),
            ("within", within),
            ("contains", contains),
        ):
            if m:
                want[rel][0] += 1
                want[rel][1] += k
    rows = {
        r: (n, s)
        for r, n, s in zip(
            out["relation"].to_pylist(),
            out["doc_count"].to_pylist(),
            out["custkey_sum"].to_pylist(),
        )
    }
    assert rows == {r: tuple(v) for r, v in want.items()}
    # the partition property: intersects + disjoint == corpus
    assert rows["intersects"][0] + rows["disjoint"][0] == len(ck)
    # within ⊆ intersects
    assert rows["within"][0] <= rows["intersects"][0]


def test_significant_terms_heuristics(ray_session, built):
    """chi_square and mutual_information equal direct 2x2 recomputes; the
    positive filter holds; unknown heuristic raises."""
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.aggs import significant_terms
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    docs = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    split = [set(d.split(" ")) for d in docs]
    vocab = sorted(store.df)
    t0 = vocab[3 % len(vocab)]
    hits = [i for i, s in enumerate(split) if t0 in s]
    matches = pa.table(
        {
            "query_id": pa.array([0] * len(hits), type=pa.int64()),
            "doc_id": pa.array(hits, type=pa.int64()),
        }
    )
    n = len(docs)
    fgs = len(hits)
    for heur in ("chi_square", "mutual_information"):
        out = significant_terms(
            res.out_dir, store, matches, n_top=5, heuristic=heur
        )
        assert out.num_rows > 0
        for r in out.to_pylist():
            a = r["fg_df"]
            B = r["bg_df"]
            b = fgs - a
            c = B - a
            d = n - fgs - c
            assert a / fgs > B / n  # include_negatives=false
            if heur == "chi_square":
                want = n * (a * d - b * c) ** 2 / (
                    fgs * (n - fgs) * B * (n - B)
                )
            else:
                want = 0.0
                for nxy, px, py in (
                    (a, B / n, fgs / n),
                    (b, 1 - B / n, fgs / n),
                    (c, B / n, 1 - fgs / n),
                    (d, 1 - B / n, 1 - fgs / n),
                ):
                    if nxy > 0:
                        want += (nxy / n) * np.log2((nxy / n) / (px * py))
            assert r["score"] == float(sql_round(want, 6)), (heur, r)
    with pytest.raises(ValueError, match="unknown heuristic"):
        significant_terms(res.out_dir, store, matches, heuristic="gnd")


def test_watcher_check_brute_force(ray_session):
    from collections import Counter

    from bitcoin_ledger_2es_ray.pipelines.apis import watcher_check

    sf = "/root/testdata/sf0.001"
    out = watcher_check(sf, event_type="error", threshold=3)
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["b"] = (ev["ts"].astype("int64") // 1_000_000 // 86400) * 86400
    want = Counter(ev["b"])  # bucket existence from ALL events
    errs = Counter(ev[ev.event_type == "error"]["b"])
    assert out["bucket_s"].to_pylist() == sorted(want)
    assert out["doc_count"].to_pylist() == [errs.get(b, 0) for b in sorted(want)]
    assert out["triggered"].to_pylist() == [
        errs.get(b, 0) > 3 for b in sorted(want)
    ]
    assert any(out["triggered"].to_pylist()) or True


def test_terms_ordered_by_metric(ray_session, built):
    """Metric-ordered terms buckets: rank == pandas re-rank of the plain
    stats buckets; size cuts buckets, not docs."""
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        terms_ordered_by_metric,
        terms_stats_agg,
    )

    res, _, _ = built
    matches = pa.table(
        {
            "query_id": pa.array([0] * 30 + [1] * 40, type=pa.int64()),
            "doc_id": pa.array(list(range(30)) + list(range(100, 140)), type=pa.int64()),
        }
    )
    base = terms_stats_agg(res.out_dir, matches, field="lang").to_pandas()
    out = terms_ordered_by_metric(res.out_dir, matches, field="lang", size=2)
    base["bucket_rank"] = (
        base.sort_values(["avg_dl", "lang"], ascending=[False, True])
        .groupby("query_id")
        .cumcount()
        .add(1)
        .reindex(base.index)
    )
    want = (
        base[base.bucket_rank <= 2]
        .sort_values(["query_id", "bucket_rank"])
        .reset_index(drop=True)
    )
    got = out.to_pandas()
    assert got["query_id"].tolist() == want["query_id"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["bucket_rank"].tolist() == want["bucket_rank"].tolist()
    assert got.groupby("query_id").size().max() <= 2


def test_mlt_unlike_excludes_negative_terms(ray_session, built):
    from bitcoin_ledger_2es_ray.pipelines.mlt import (
        doc_terms,
        more_like_this,
        more_like_this_unlike,
        select_mlt_terms,
    )
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    src, unlike = 7, 19
    out = more_like_this_unlike(store, res.out_dir, src, unlike, n_terms=5, k=10,
                                round_decimals=6)
    # no selected term may appear in the unlike doc, and neither input
    # doc may be in the results
    bad = set(doc_terms(res.out_dir, unlike)["term"].to_pylist())
    like = doc_terms(res.out_dir, src)
    filt = like.to_pandas()
    filt = filt[~filt.term.isin(bad)]
    import pyarrow as pa

    sel = select_mlt_terms(
        store, pa.Table.from_pandas(filt, preserve_index=False), 5
    )
    assert not (set(sel) & bad)
    docs = [d for d, _ in out]
    assert src not in docs and unlike not in docs
    # with an unlike doc sharing no terms, results equal plain MLT minus
    # the unlike doc itself
    lone = more_like_this(store, res.out_dir, src, n_terms=5, k=store.n_docs,
                          round_decimals=6)
    if not (set(doc_terms(res.out_dir, src)["term"].to_pylist()) & bad):
        want = [(d, s) for d, s in lone if d != unlike][:10]
        assert out == want


def test_collapse_inner_hits_consistency(ray_session, built):
    """Group order equals collapse_topk; members are per-group rank-ordered
    and bounded by inner_size."""
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        collapse_inner_hits,
        collapse_topk,
        score_query,
    )

    res, _, _ = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    text = f"{vocab[3 % len(vocab)]} {vocab[9 % len(vocab)]}"
    field_of = {d: f"g{d % 5}" for d in range(store.n_docs)}
    inner = collapse_inner_hits(store, text, 4, 2, field_of, round_decimals=6)
    flat = collapse_topk(store, text, 4, field_of, round_decimals=6)
    # group order and representatives agree
    reps = [(gr, f, d, s) for gr, f, hr, d, s in inner if hr == 1]
    assert [(d, f, s) for _, f, d, s in reps] == flat  # collapse_topk rows
    # per-group: ≤ inner_size members, scores non-increasing
    from collections import defaultdict

    groups = defaultdict(list)
    for gr, f, hr, d, s in inner:
        groups[f].append((hr, s, d))
    full = dict(score_query(store, text, store.n_docs, round_decimals=6))
    for f, ms in groups.items():
        assert len(ms) <= 2
        assert [hr for hr, _, _ in ms] == list(range(1, len(ms) + 1))
        ss = [s for _, s, _ in ms]
        assert ss == sorted(ss, reverse=True)
        for _, s, d in ms:
            assert full[d] == s and field_of[d] == f


def test_geo_sort_topk_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.geo import geo_sort_topk

    sf = "/root/testdata/sf0.001"
    out = geo_sort_topk(sf, k=10)
    ck = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])[
        "c_custkey"
    ].to_pylist()
    rows = []
    for k in ck:
        lat = np.radians(((k * 7919) % 18000) / 100.0 - 90.0)
        lon = np.radians(((k * 104729) % 36000) / 100.0 - 180.0)
        d = 2 * 6371.0 * np.arcsin(
            np.sqrt(np.sin(lat / 2) ** 2 + np.cos(lat) * np.sin(lon / 2) ** 2)
        )
        rows.append((round(float(d), 6), k))
    rows.sort()
    assert out["c_custkey"].to_pylist() == [k for _, k in rows[:10]]
    assert out["dist_km"].to_pylist() == [d for d, _ in rows[:10]]
    assert out["rank"].to_pylist() == list(range(1, 11))


def test_simulate_grok_dissect_processors(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = "/root/testdata/sf0.001"
    out = simulate_pipeline(
        sf,
        [
            {"type": "grok", "field": "source", "pattern": "src%{INT:srcnum:int}"},
            {"type": "dissect", "field": "source", "pattern": "src%{srcnum_s}"},
        ],
        columns=("doc_id", "source"),
    )
    src = out["source"].to_pylist()
    assert out["srcnum"].to_pylist() == [int(s[3:]) for s in src]
    assert out["srcnum_s"].to_pylist() == [s[3:] for s in src]
    # bad grok pattern rejected at registration, not per doc
    with pytest.raises(ValueError, match="unknown grok pattern"):
        simulate_pipeline(
            sf, [{"type": "grok", "field": "source", "pattern": "%{NOPE:x}"}]
        )


def test_percolate_bool_brute_force(ray_session):
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.percolate import percolate_bool

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    split = {
        d: set(t.split(" "))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    vocab = sorted(set().union(*split.values()))
    queries = pa.table(
        {
            "query_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [f"{vocab[0]} {vocab[3]}", vocab[5], f"{vocab[2]} {vocab[2]}"]
            ),
            "neg_text": pa.array([vocab[7], vocab[0], vocab[2]]),
        }
    )
    out = percolate_bool(sf, queries)
    got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    want = set()
    for d, s in split.items():
        if vocab[0] in s and vocab[3] in s and vocab[7] not in s:
            want.add((d, 0))
        if vocab[5] in s and vocab[0] not in s:
            want.add((d, 1))
        # query 2: neg term equals the must term → negation is dropped
        if vocab[2] in s:
            want.add((d, 2))
    assert got == want


def test_function_score_boost_modes(ray_session, built):
    """All six boost_modes equal direct combines of the base score and
    ln(1+dl); unknown mode raises."""
    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.query import (
        SegmentStore,
        function_score_query,
        score_query,
    )

    res, _, corpus = built
    store = SegmentStore(res.out_dir)
    vocab = sorted(store.df)
    text = f"{vocab[4 % len(vocab)]} {vocab[13 % len(vocab)]}"
    dls = [
        len(t.split(" "))
        for t in pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    ]
    base = dict(score_query(store, text, store.n_docs, round_decimals=None))
    combos = {
        "multiply": lambda s, f: s * f,
        "sum": lambda s, f: s + f,
        "avg": lambda s, f: (s + f) / 2,
        "max": max,
        "min": min,
        "replace": lambda s, f: f,
    }
    for mode, fn in combos.items():
        got = function_score_query(
            store, text, 10, round_decimals=6, boost_mode=mode
        )
        want = sorted(
            (
                (d, float(sql_round(fn(s, np.log1p(dls[d])), 6)))
                for d, s in base.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        assert got == want, mode
    with pytest.raises(ValueError, match="unknown boost_mode"):
        function_score_query(store, text, 5, boost_mode="divide")


def test_percentiles_tdigest_vs_exact(ray_session):
    """The distributed t-digest percentiles land within 1.5% rank error of
    the exact empirical quantiles of the value column."""
    from bitcoin_ledger_2es_ray.pipelines.aggs import percentiles_tdigest

    sf = "/root/testdata/sf0.001"
    out = percentiles_tdigest(sf)
    vals = np.sort(
        np.asarray(
            pq.read_table(f"{sf}/events.parquet", columns=["value"])["value"],
            dtype=np.float64,
        )
    )
    n = len(vals)
    for q, est in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        rank = np.searchsorted(vals, est) / n
        assert abs(rank - q) < 0.015, (q, rank)
    assert out["n_centroids"][0].as_py() <= 220


def test_ingest_processors_long_tail(ray_session, tmp_path):
    """rename / remove / convert / date / kv over a hand-built corpus."""
    import pyarrow.parquet as _pq

    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = str(tmp_path)
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["a=1,b=x", "b=y,a=22"],
                "lang": ["2024-03-05 07:09", "2025-01-02 03:04"],
            }
        ),
        f"{sf}/documents.parquet",
    )
    out = simulate_pipeline(
        sf,
        [
            {"type": "kv", "field": "text", "field_split": ",",
             "value_split": "=", "keys": ["a", "b", "c"]},
            {"type": "convert", "field": "a", "to": "integer"},
            {"type": "date", "field": "lang",
             "pattern": "yyyy-MM-dd HH:mm", "target": "ts"},
            {"type": "rename", "field": "b", "target": "bee"},
            {"type": "remove", "field": "text"},
        ],
    )
    assert out["a"].to_pylist() == [1, 22]  # order-independent kv extraction
    assert out["bee"].to_pylist() == ["x", "y"]
    assert out["c"].to_pylist() == [None, None]  # absent key stays null
    assert "text" not in out.column_names and "b" not in out.column_names
    assert str(out["ts"][0].as_py()) == "2024-03-05 07:09:00"
    with pytest.raises(Exception, match="unknown processor"):
        simulate_pipeline(sf, [{"type": "script", "field": "lang"}])


def test_grok_pattern_alternatives_and_definitions(ray_session, tmp_path):
    """ES grok processor options: "patterns" (first match wins) and
    custom "pattern_definitions"."""
    import pyarrow.parquet as _pq

    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = str(tmp_path)
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": ["GET /a 200", "oops: disk full", "PUT /b 503"],
                "lang": ["en", "en", "en"],
            }
        ),
        f"{sf}/documents.parquet",
    )
    out = simulate_pipeline(
        sf,
        [
            {
                "type": "grok",
                "field": "text",
                "patterns": [
                    "%{VERB:what} %{NOTSPACE} %{INT:code:int}",
                    "oops: %{GREEDYDATA:what}",
                ],
                "pattern_definitions": {"VERB": "GET|PUT|POST"},
            }
        ],
    )
    # union schema: first matching alternative wins per row; a field the
    # matching alternative does not extract stays null
    assert out["what"].to_pylist() == ["GET", "disk full", "PUT"]
    assert out["code"].to_pylist() == [200, None, 503]
    with pytest.raises(Exception, match="unknown grok"):
        simulate_pipeline(
            sf, [{"type": "grok", "field": "text", "pattern": "%{NOPE:x}"}]
        )


def test_review_fixes_grok_types_and_kv_separator(ray_session, tmp_path):
    import pyarrow.parquet as _pq

    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = str(tmp_path)
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], type=pa.int64()),
                "text": ["a=1"],
                "lang": ["en"],
            }
        ),
        f"{sf}/documents.parquet",
    )
    # conflicting types across grok alternatives refuse at registration
    with pytest.raises(Exception, match="conflicting types"):
        simulate_pipeline(
            sf,
            [{"type": "grok", "field": "text",
              "patterns": ["%{INT:x:int}", "%{WORD:x}"]}],
        )
    # multi-character kv field_split refuses (RE2 has no lookahead)
    with pytest.raises(Exception, match="single character"):
        simulate_pipeline(
            sf,
            [{"type": "kv", "field": "text", "field_split": "; ",
              "value_split": "=", "keys": ["a"]}],
        )


def test_ingest_processor_long_tail(ray_session):
    """split(regex)/sort/append/join, html_strip entity order, bytes
    units, csv null-fill, uri_parts groups, drop/fail conditions."""
    import pytest

    from bitcoin_ledger_2es_ray.pipelines.apis import simulate_pipeline

    sf = "/root/testdata/sf0.001"
    t = simulate_pipeline(sf, [
        {"type": "set", "field": "s", "value": "b, c,a"},
        {"type": "split", "field": "s", "separator": ", ?"},
        {"type": "sort", "field": "s", "order": "asc"},
        {"type": "append", "field": "s", "value": "d"},
        {"type": "join", "field": "s", "separator": "|"},
        {"type": "set", "field": "h", "value": "<i>x &amp;lt; y &gt; z</i>"},
        {"type": "html_strip", "field": "h"},
        {"type": "set", "field": "b1", "value": "2MB"},
        {"type": "bytes", "field": "b1"},
        {"type": "set", "field": "b2", "value": "nonsense"},
        {"type": "bytes", "field": "b2"},
        {"type": "set", "field": "c", "value": "x,y"},
        {"type": "csv", "field": "c", "target_fields": ["c1", "c2", "c3"]},
        {"type": "set", "field": "u", "value": "http://h.example/p"},
        {"type": "uri_parts", "field": "u"},
    ])
    r = t.to_pylist()[0]
    assert r["s"] == "a|b|c|d"
    assert r["h"] == "x &lt; y > z"  # single-pass entity decode
    assert r["b1"] == 2 * 1024 * 1024 and r["b2"] is None
    assert (r["c1"], r["c2"], r["c3"]) == ("x", "y", None)
    assert r["url_scheme"] == "http" and r["url_domain"] == "h.example"
    assert r["url_path"] == "/p" and r["url_port"] is None
    assert r["url_user_info"] is None
    # drop removes matching rows; fail refuses when any row matches
    kept = simulate_pipeline(sf, [{"type": "drop", "field": "lang", "equals": "en"}])
    assert "en" not in set(kept["lang"].to_pylist()) and len(kept) > 0
    with pytest.raises(Exception, match="tripped"):
        simulate_pipeline(sf, [{"type": "fail", "field": "lang", "equals": "en"}])
    # desc sort order
    t2 = simulate_pipeline(sf, [
        {"type": "set", "field": "s", "value": "a,b,c"},
        {"type": "split", "field": "s", "separator": ","},
        {"type": "sort", "field": "s", "order": "desc"},
        {"type": "join", "field": "s", "separator": ""},
    ])
    assert t2.to_pylist()[0]["s"] == "cba"


def test_extended_stats_bucket_identity():
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.aggs import extended_stats_bucket

    out = extended_stats_bucket(_toy_buckets(), metric="m", sigma=2.0)
    row = out.to_pylist()[0]
    v = np.array([5, 3, 9, 9, 1], dtype=np.float64)
    var = float((v * v).sum() / 5 - (v.sum() / 5) ** 2)
    assert row["count"] == 5
    assert row["min"] == 1.0 and row["max"] == 9.0
    assert row["avg"] == 5.4 and row["sum"] == 27.0
    assert row["sum_of_squares"] == float((v * v).sum())
    assert abs(row["variance"] - round(var, 6)) < 1e-12
    assert abs(row["std_deviation"] - round(var**0.5, 6)) < 1e-12
    assert abs(row["std_upper"] - round(5.4 + 2 * var**0.5, 6)) < 1e-12
    assert abs(row["std_lower"] - round(5.4 - 2 * var**0.5, 6)) < 1e-12


def test_extended_stats_bucket_rejections():
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.aggs import extended_stats_bucket

    with _pytest.raises(ValueError):
        extended_stats_bucket(_toy_buckets().slice(0, 0), metric="m")
    with _pytest.raises(ValueError):
        extended_stats_bucket(_toy_buckets(), metric="m", sigma=-1.0)


def test_histogram_field_stats_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from bitcoin_ledger_2es_ray.pipelines.aggs import histogram_field_stats

    sf = "/root/testdata/sf0.001"
    got = histogram_field_stats(sf).to_pandas()
    con = duckdb.connect()
    orc = con.sql(
        f"""
        SELECT count(*)::BIGINT AS value_count,
               round(sum(l_quantity), 6) AS sum_qty,
               round(sum(l_quantity) / count(*), 6) AS avg_qty,
               round(quantile_cont(l_quantity, 0.25), 6) AS p25,
               round(quantile_cont(l_quantity, 0.50), 6) AS p50,
               round(quantile_cont(l_quantity, 0.75), 6) AS p75,
               round(quantile_cont(l_quantity, 0.90), 6) AS p90,
               round(quantile_cont(l_quantity, 0.99), 6) AS p99
        FROM read_parquet('{sf}/lineitem.parquet')
        """
    ).df()
    pd.testing.assert_frame_equal(got, orc, check_dtype=False, atol=0, rtol=0)


def test_histogram_bins_artifact_cache(ray_session, tmp_path):
    """The histogram-field pre-bin is a persisted, fingerprint-keyed
    artifact (VERDICT r4 item 2): built once, reused on re-call, and
    rebuilt under a different cache key when the source changes."""
    import os

    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.aggs import (
        _source_fingerprint,
        histogram_bins_to_parquet,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "cache")
    p1 = histogram_bins_to_parquet(sf, cache_root=root)
    mtimes = {
        f: os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1)
    }
    # second call reuses the artifact without rewriting any file
    p2 = histogram_bins_to_parquet(sf, cache_root=root)
    assert p2 == p1
    assert mtimes == {
        f: os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1)
    }
    # artifact contents equal the direct binning groupby in DuckDB
    import duckdb

    got = (
        pads.dataset(p1)
        .to_table()
        .sort_by([("doc", "ascending"), ("value", "ascending")])
    )
    want = duckdb.sql(
        f"""SELECT l_orderkey AS doc, l_quantity::DOUBLE AS value,
                   count(*)::BIGINT AS count
            FROM read_parquet('{sf}/lineitem.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).arrow()
    assert got.select(["doc", "value", "count"]).equals(
        want.select(["doc", "value", "count"])
    )
    # a different source yields a different fingerprint (cache key)
    assert _source_fingerprint(f"{sf}/lineitem.parquet") != _source_fingerprint(
        "/root/testdata/sf0.01/lineitem.parquet"
    )
