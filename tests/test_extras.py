"""Training-data pipeline operators: dedup family, ANN, text analysis,
multimodal plumbing (instructions §beyond-the-reference)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_exact_dedup_counts(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.dedup import exact_dedup

    t = exact_dedup(SF)
    assert t["n_dups"].to_pylist() == [1] * t.num_rows or sum(t["n_dups"].to_pylist()) == 500
    assert sum(t["n_dups"].to_pylist()) == 500  # every doc accounted for
    reps = t["rep_doc_id"].to_pylist()
    assert reps == sorted(reps)


def test_minhash_recall_vs_exact(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        shingle_jaccard_pairs,
    )

    exact = shingle_jaccard_pairs(SF, tau=0.8)
    approx = minhash_lsh_pairs(SF, tau=0.8)
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    approx_pairs = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    assert approx_pairs <= exact_pairs  # verified candidates → perfect precision
    recall = len(approx_pairs) / max(1, len(exact_pairs))
    assert recall >= 0.8, f"LSH recall {recall:.2f} too low"
    # verified jaccard values agree with the exact pipeline (keyed by pair —
    # both tables are (a, b)-sorted but cover different pair sets)
    exact_j = {
        (a, b): j
        for a, b, j in zip(
            exact["a"].to_pylist(), exact["b"].to_pylist(), exact["jaccard"].to_pylist()
        )
    }
    for a, b, j in zip(
        approx["a"].to_pylist(), approx["b"].to_pylist(), approx["jaccard"].to_pylist()
    ):
        assert abs(exact_j[(a, b)] - j) < 1e-6


def test_shingles_preserve_document_order():
    """Shingles are word-k-grams of the whitespace stream IN DOCUMENT ORDER
    (ADVICE r1: the identifier-splitting tokenizer would reorder tokens)."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import _batch_shingles

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["alpha beta gamma delta", "gamma beta alpha delta"]})
    d, sh, starts = _batch_shingles(t, k=3)
    # doc 1: {abg, bgd}; doc 2: {gba, bad} — order-sensitive, no overlap
    assert list(starts) == [0, 2]
    assert len(set(sh[:2]) & set(sh[2:])) == 0
    # identical word sequence → identical shingle hashes
    t2 = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                   "text": ["alpha beta gamma delta"]})
    _, sh2, _ = _batch_shingles(t2, k=3)
    assert set(sh2) == set(sh[:2])
    # k-grams never cross document boundaries
    t3 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "text": ["alpha beta", "gamma delta"]})
    _, sh3, _ = _batch_shingles(t3, k=3)
    assert len(sh3) == 0


def test_exact_pairs_overflow_raises():
    """The exact path must not SILENTLY drop oversized shingle groups
    (ADVICE r1) — it raises; the LSH path drops by documented design."""
    from bitcoin_ledger_2es_ray.pipelines.dedup import _make_pairs_fn

    group = pa.table({"doc_id": pa.array(range(100), type=pa.uint64())})
    with pytest.raises(ValueError, match="max_group"):
        _make_pairs_fn(50, "raise")(group)
    dropped = _make_pairs_fn(50, "drop")(group)
    assert dropped.num_rows == 0
    kept = _make_pairs_fn(200, "raise")(group)
    assert kept.num_rows == 100 * 99 // 2


def test_simhash_near_dups_are_close(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.dedup import (
        shingle_jaccard_pairs,
        simhash_fingerprints,
    )

    fp = simhash_fingerprints(SF)
    sims = dict(zip(fp["doc_id"].to_pylist(), fp["simhash"].to_pylist()))

    def ham(a, b):
        return bin((sims[a] & 0xFFFFFFFFFFFFFFFF) ^ (sims[b] & 0xFFFFFFFFFFFFFFFF)).count("1")

    dups = shingle_jaccard_pairs(SF, tau=0.8)
    dup_d = [ham(a, b) for a, b in zip(dups["a"].to_pylist(), dups["b"].to_pylist())]
    rng = np.random.default_rng(0)
    ids = fp["doc_id"].to_pylist()
    rand_d = [ham(*rng.choice(ids, 2, replace=False)) for _ in range(200)]
    assert np.mean(dup_d) < np.mean(rand_d) / 2, (np.mean(dup_d), np.mean(rand_d))


def test_head_by_vec_id_prunes_row_groups(tmp_path):
    """Row-group-pruned head read == full-read sort+slice, on a file whose
    vec_ids are shuffled ACROSS row groups (worst case for pruning), and it
    must not read every group when ids are ordered."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import _head_by_vec_id

    rng = np.random.default_rng(3)
    ids = rng.permutation(1000).astype(np.int64)
    emb = [[float(i), float(i) + 1.0] for i in ids]
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(emb)})
    shuffled = str(tmp_path / "emb_shuffled.parquet")
    pq.write_table(t, shuffled, row_group_size=100)
    want = t.sort_by("vec_id").slice(0, 37)
    got = _head_by_vec_id(shuffled, 37)
    assert got.equals(want)

    ordered = str(tmp_path / "emb_ordered.parquet")
    pq.write_table(t.sort_by("vec_id"), ordered, row_group_size=100)
    got2 = _head_by_vec_id(ordered, 37)
    assert got2.equals(want)
    # whole-file head (n > rows) still works
    assert _head_by_vec_id(ordered, 5000).num_rows == 1000


def test_ann_lsh_recall(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce, knn_lsh

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    approx = knn_lsh(SF, n_queries=5, k=5)
    # rank-1 (the vector itself) must always be found by LSH
    exact_top1 = {
        (q, v)
        for q, r, v in zip(
            exact["query_id"].to_pylist(), exact["rank"].to_pylist(), exact["vec_id"].to_pylist()
        )
        if r == 1
    }
    approx_hits = set(zip(approx["query_id"].to_pylist(), approx["vec_id"].to_pylist()))
    assert exact_top1 <= approx_hits


def test_ann_ivf_recall(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce, knn_ivf

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    approx = knn_ivf(SF, n_queries=5, k=5, n_centroids=8, n_probe=4)
    exact_hits = set(zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()))
    approx_hits = set(zip(approx["query_id"].to_pylist(), approx["vec_id"].to_pylist()))
    recall = len(exact_hits & approx_hits) / len(exact_hits)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"
    # the query's own vector (rank 1, sim 1.0) must always be found
    top1 = {
        (q, v)
        for q, r, v in zip(
            exact["query_id"].to_pylist(), exact["rank"].to_pylist(), exact["vec_id"].to_pylist()
        )
        if r == 1
    }
    assert top1 <= approx_hits
    # determinism: identical result on a second run
    again = knn_ivf(SF, n_queries=5, k=5, n_centroids=8, n_probe=4)
    assert again.equals(approx)


def test_cosine_lsh_pairs_recall(ray_session):
    """LSH-bucketed pair path vs the exact broadcast path: perfect precision
    (within-bucket pairs are exactly verified), measured recall, identical
    sims for every recovered pair."""
    from bitcoin_ledger_2es_ray.pipelines.ann import cosine_dup_pairs, cosine_dup_pairs_lsh

    exact = cosine_dup_pairs(SF, tau=0.4)
    approx = cosine_dup_pairs_lsh(SF, tau=0.4, n_planes=4, n_tables=12)
    exact_m = {
        (a, b): s
        for a, b, s in zip(
            exact["a"].to_pylist(), exact["b"].to_pylist(), exact["sim"].to_pylist()
        )
    }
    approx_m = {
        (a, b): s
        for a, b, s in zip(
            approx["a"].to_pylist(), approx["b"].to_pylist(), approx["sim"].to_pylist()
        )
    }
    assert set(approx_m) <= set(exact_m)  # exact verification → perfect precision
    recall = len(approx_m) / max(1, len(exact_m))
    assert recall >= 0.8, f"cosine-LSH recall {recall:.2f} too low"
    for pair, s in approx_m.items():
        assert abs(exact_m[pair] - s) < 1e-9


def test_langid_goldens(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.textstats import LangId

    lid = LangId()
    assert lid.classify("the cat and the dog are in the house") == "en"
    assert lid.classify("le chat et le chien est dans la maison") == "fr"
    assert lid.classify("el gato y el perro en la casa es que") == "es"
    assert lid.classify("der hund und die katze ist mit ein haus") == "de"
    assert lid.classify("你好世界这是一个测试文档") == "zh"
    assert lid.classify("") == "und"
    assert lid.classify("zzz qqq xxx") == "und"


def test_langid_batch_matches_classify(ray_session):
    """The vectorized __call__ must equal the per-row reference exactly,
    including ties (de vs en share no stopwords, but craft an overlap via
    'en'/'es'), CJK thresholds, empties, whitespace runs and nulls."""
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.textstats import LangId

    lid = LangId()
    texts = [
        "the cat and the dog are in the house",
        "le chat et le chien est dans la maison",
        "el gato y el perro en la casa es que",
        "der hund und die katze ist mit ein haus",
        "你好世界这是一个测试文档",
        "",
        "zzz qqq xxx",
        "de en la",            # shared stopwords across fr/es/en → tie-break
        "en de",               # two-way tie fr/es/de/en territory
        "  spaced   out  the  and  ",  # whitespace runs + edge spaces
        "mixed 你好 text with some cjk 世界 but below threshold ratio here",
        "你好 a",              # CJK just above 0.2 of total chars
        None,
        "THE CAT AND THE DOG",  # case folding
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = lid(batch)
    got = out["lang_pred"].to_pylist()
    want = [lid.classify(t) if t is not None else "und" for t in texts]
    assert got == want, list(zip(texts, got, want))

    # and on the real corpus: every doc identical to the reference loop
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = lid(docs)
    want = [lid.classify(t) for t in docs["text"].to_pylist()]
    assert out["lang_pred"].to_pylist() == want


def test_fingerprints_deterministic(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.textstats import doc_fingerprints

    a = doc_fingerprints(SF)
    b = doc_fingerprints(SF)
    assert a.equals(b)
    # identical texts → identical fingerprint sets
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    by_text: dict[str, list[int]] = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        by_text.setdefault(t, []).append(d)
    fps: dict[int, tuple] = {}
    for row in a.to_pylist():
        fps.setdefault(row["doc_id"], [])
    for row in a.to_pylist():
        fps[row["doc_id"]].append(row["fp"])
    for ids in by_text.values():
        if len(ids) > 1:
            assert fps[ids[0]] == fps[ids[1]]


def test_multimodal_pipeline(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.multimodal import (
        FEATURES,
        MediaDecoder,
        frame_sample,
        media_pipeline,
        synthesize_media,
    )

    media = synthesize_media(150, kind="video")
    out = media_pipeline(media, concurrency=2)
    assert out.num_rows == 150
    assert out.schema == FEATURES
    v = np.array(out["feature"][0].as_py())
    assert len(v) == 64 and abs(v.sum() - 1.0) < 1e-3  # normalized histogram
    # determinism
    out2 = media_pipeline(media, concurrency=2)
    assert out.equals(out2)
    # the real-decode path is a clearly-marked stub
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)(media.slice(0, 1))
    assert frame_sample(12, every=5) == [0, 5, 10]
    # the vectorized decode matches the per-payload hash formula
    import hashlib

    dec = MediaDecoder(fake=True)(media.slice(0, 8))
    for i in range(8):
        h = hashlib.blake2b(
            media["payload"][i].as_py(), digest_size=8
        ).digest()
        assert dec["width"][i].as_py() == 16 + h[0] % 64
        assert dec["height"][i].as_py() == 16 + h[1] % 64
        assert dec["n_frames"][i].as_py() == 1 + h[2] % 30  # video
    # the single-bincount features match per-payload np.histogram
    from bitcoin_ledger_2es_ray.pipelines.multimodal import FeatureExtractor

    feats = FeatureExtractor()(media.slice(0, 8))
    for i in range(8):
        b = np.frombuffer(media["payload"][i].as_py(), dtype=np.uint8)
        hist, _ = np.histogram(b, bins=np.linspace(0, 256, 65))
        want = (hist / (hist.sum() or 1)).astype(np.float32)
        assert np.array_equal(
            np.array(feats["feature"][i].as_py(), dtype=np.float32), want
        )


def test_per_doc_sinks_match_collected(ray_session, tmp_path):
    """Every per-doc operator's parquet sink writes EXACTLY the rows its
    driver-table wrapper returns (VERDICT r2 §missing-2) — and a re-run
    overwrites instead of appending."""
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines import curate, dedup, textstats

    cases = [
        ("quality", textstats.quality_scores(SF),
         textstats.quality_scores_to_parquet(SF, str(tmp_path / "q")), ["doc_id"]),
        ("bpe", textstats.token_count_bpe(SF),
         textstats.token_count_bpe_to_parquet(SF, str(tmp_path / "b")), ["doc_id"]),
        ("langid", textstats.lang_id(SF),
         textstats.lang_id_to_parquet(SF, str(tmp_path / "l")), ["doc_id"]),
        ("fp", textstats.doc_fingerprints(SF),
         textstats.doc_fingerprints_to_parquet(SF, str(tmp_path / "f")), ["doc_id", "fp"]),
        ("simhash", dedup.simhash_fingerprints(SF),
         dedup.simhash_to_parquet(SF, str(tmp_path / "s")), ["doc_id"]),
        ("curate", curate.curate_corpus(SF),
         curate.curate_corpus_to_parquet(SF, str(tmp_path / "c")), ["doc_id"]),
        ("redact", textstats.redact_pii(SF),
         textstats.redact_pii_to_parquet(SF, str(tmp_path / "r")), ["doc_id"]),
        ("repstats", textstats.repetition_stats(SF),
         textstats.repetition_stats_to_parquet(SF, str(tmp_path / "rs")), ["doc_id"]),
        ("split", curate.hash_split(SF),
         curate.hash_split_to_parquet(SF, str(tmp_path / "hs")), ["doc_id"]),
        ("qclf", textstats.quality_classifier(SF),
         textstats.quality_classifier_to_parquet(SF, str(tmp_path / "qc")), ["doc_id"]),
    ]
    for name, mem, out_dir, keys in cases:
        order = [(k, "ascending") for k in keys]
        written = pads.dataset(out_dir).to_table().select(mem.column_names).sort_by(order)
        assert written.equals(mem.cast(written.schema)), name
    # overwrite semantics: second write of the first case → same rows
    textstats.quality_scores_to_parquet(SF, str(tmp_path / "q"))
    again = pads.dataset(str(tmp_path / "q")).to_table()
    assert again.num_rows == cases[0][1].num_rows


def test_redact_pii_brute(ray_session):
    import re

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import redact_pii

    pats = ("va[a-z]+", "[a-z]*ab[a-z]*")
    got = redact_pii(SF, patterns=pats)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    by_doc = dict(zip(got["doc_id"].to_pylist(), zip(
        got["n_redacted"].to_pylist(), got["red_len"].to_pylist(), got["red_sha"].to_pylist()
    )))
    import hashlib

    fired = 0
    for d, t in zip(docs["doc_id"].to_pylist()[:50], docs["text"].to_pylist()[:50]):
        n = 0
        for p in pats:
            n += len(re.findall(p, t))
            t = re.sub(p, "<PII>", t)
        want = (n, len(t), hashlib.sha256(t.encode()).hexdigest())
        assert by_doc[d] == want, d
        fired += n
    assert fired > 0  # the patterns actually match this corpus


def test_repetition_stats_brute(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import repetition_stats

    got = repetition_stats(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    from collections import Counter

    for d, t in zip(docs["doc_id"].to_pylist()[:60], docs["text"].to_pylist()[:60]):
        c = Counter(t.split(" "))
        n = sum(c.values())
        r = rows[d]
        assert r["n_tokens"] == n
        assert r["n_distinct"] == len(c)
        assert r["dup_frac"] == pytest.approx(1 - len(c) / n, abs=1e-6)
        assert r["top_frac"] == pytest.approx(max(c.values()) / n, abs=1e-6)


def test_hash_split_deterministic_and_proportional(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import hash_split

    from collections import Counter

    got = hash_split(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    split_of = dict(zip(got["doc_id"].to_pylist(), got["split"].to_pylist()))
    for d, t in zip(docs["doc_id"].to_pylist()[:80], docs["text"].to_pylist()[:80]):
        b = hashlib.sha256(t.encode()).digest()[0]
        want = "train" if b < 0xCC else ("val" if b < 0xE6 else "test")
        assert split_of[d] == want
    counts = Counter(got["split"].to_pylist())
    n = got.num_rows
    # loose proportion sanity at n=500: ~79.7/10.2/10.2%
    assert 0.70 < counts["train"] / n < 0.88
    assert counts["val"] > 0 and counts["test"] > 0
    # determinism: second run identical
    assert hash_split(SF).equals(got)


def test_quality_monotonic_sanity(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.textstats import quality_scores

    q = quality_scores(SF)
    assert q.num_rows == 500
    vals = np.array(q["quality"].to_pylist())
    assert ((vals >= 0) & (vals <= 1)).all()


def test_event_windows(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.events import sessionize, tumbling_window

    w = tumbling_window(SF, window_s=3600)
    assert w.num_rows > 0
    assert set(w.column_names) == {"user_id", "window_start", "n_events", "sum_value"}
    assert all(ws % 3600 == 0 for ws in w["window_start"].to_pylist()[:100])

    s = sessionize(SF, gap_s=1800)
    assert s.num_rows > 0
    rows = s.to_pylist()
    for r in rows[:200]:
        assert r["end_s"] >= r["start_s"] and r["n_events"] >= 1
    # deterministic
    assert sessionize(SF, gap_s=1800).equals(s)


def test_tsds_downsample_matches_pandas(ray_session, tmp_path):
    """ES _downsample rollup vs an independent pandas recompute, at two
    intervals (hourly ≈ singleton buckets, daily = multi-event folds);
    the sink round-trips to the same rows."""
    import pandas as pd
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.events import (
        downsample,
        downsample_to_parquet,
        time_series_agg,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    for interval in (3600, 86400):
        got = downsample(SF, interval_s=interval).to_pandas()
        ev["bucket_s"] = ev["us"] // 1_000_000 // interval * interval
        g = ev.groupby(["user_id", "event_type", "bucket_s"])
        want = g.agg(
            doc_count=("value", "size"),
            min_value=("value", "min"),
            max_value=("value", "max"),
            sum_value=("value", "sum"),
        ).reset_index()
        want["avg_value"] = want["sum_value"] / want["doc_count"]
        last = (
            ev.sort_values(["us", "event_id"])
            .groupby(["user_id", "event_type", "bucket_s"])
            .tail(1)[["user_id", "event_type", "bucket_s", "value"]]
            .rename(columns={"value": "last_value"})
        )
        want = want.merge(last, on=["user_id", "event_type", "bucket_s"])
        want = want.sort_values(["user_id", "event_type", "bucket_s"]).reset_index(drop=True)
        for c in ("min_value", "max_value", "sum_value", "avg_value", "last_value"):
            want[c] = sql_round(want[c].to_numpy(), 6)
        pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False, atol=1e-9)
    out = downsample_to_parquet(SF, str(tmp_path / "ds"), interval_s=86400)
    sunk = (
        pq.read_table(out)
        .sort_by([("user_id", "ascending"), ("event_type", "ascending"), ("bucket_s", "ascending")])
    )
    assert sunk.to_pandas().reset_index(drop=True).equals(
        downsample(SF, interval_s=86400).to_pandas().reset_index(drop=True)
    )

    # time_series agg: per-series doc_count/start/end/sum
    ts = time_series_agg(SF).to_pandas()
    want = (
        ev.assign(sec=ev["us"] // 1_000_000)
        .groupby(["user_id", "event_type"])
        .agg(doc_count=("value", "size"), start_s=("sec", "min"),
             end_s=("sec", "max"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    want["sum_value"] = sql_round(want["sum_value"].to_numpy(), 6)
    pd.testing.assert_frame_equal(ts, want[ts.columns], check_dtype=False, atol=1e-9)
    # the downsampled store re-aggregates to the same series totals
    daily = downsample(SF, interval_s=86400).to_pandas()
    re = daily.groupby(["user_id", "event_type"])["doc_count"].sum().reset_index()
    assert re.merge(ts, on=["user_id", "event_type"])["doc_count_x"].equals(
        re.merge(ts, on=["user_id", "event_type"])["doc_count_y"]
    )


def test_curation_pipeline(ray_session):
    """Composed curation: filters + dedup-representative join; grouped top-k."""
    from bitcoin_ledger_2es_ray.pipelines.curate import curate_corpus, top_quality_per_lang
    from bitcoin_ledger_2es_ray.pipelines.dedup import exact_dedup

    t = curate_corpus(SF, min_tokens=20, max_mean_tok_len=8.0, langs=("en", "fr"))
    assert t.num_rows > 0
    assert t.column_names == ["doc_id", "lang", "n_tokens", "quality"]
    assert set(t["lang"].to_pylist()) <= {"en", "fr"}
    assert min(t["n_tokens"].to_pylist()) >= 20
    # every kept doc is its content's representative
    reps = set(exact_dedup(SF)["rep_doc_id"].to_pylist())
    assert set(t["doc_id"].to_pylist()) <= reps

    top = top_quality_per_lang(SF, k=3)
    assert top.column_names == ["lang", "rank", "doc_id", "quality"]
    for lang in set(top["lang"].to_pylist()):
        ranks = [r for lg, r in zip(top["lang"].to_pylist(), top["rank"].to_pylist()) if lg == lang]
        assert ranks == list(range(1, len(ranks) + 1))
        qs = [q for lg, q in zip(top["lang"].to_pylist(), top["quality"].to_pylist()) if lg == lang]
        assert qs == sorted(qs, reverse=True)


def test_decontaminate_brute_force(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.dedup import decontaminate

    sf = "/root/testdata/sf0.001"
    got = decontaminate(sf, bench_mod=17, k=3)["doc_id"].to_pylist()

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sh = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = t.split(" ")
        sh[d] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    bench = set()
    for d, s in sh.items():
        if d % 17 == 0:
            bench |= s
    want = sorted(d for d, s in sh.items() if d % 17 != 0 and s & bench)
    assert got == want
    assert all(d % 17 != 0 for d in got)  # benchmark rows never flagged


def test_pack_sequences_prefix_sum(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import pack_sequences

    got = pack_sequences(SF, budget=100)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dls = {d: len(t.split(" ")) for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
    off = 0
    rows = dict(zip(got["doc_id"].to_pylist(), zip(got["tok_offset"].to_pylist(), got["chunk_id"].to_pylist())))
    for d in sorted(dls):
        assert rows[d] == (off, off // 100), d
        off += dls[d]
    # chunk ids are non-decreasing in doc order and start at 0
    chunks = [rows[d][1] for d in sorted(dls)]
    assert chunks[0] == 0 and all(a <= b for a, b in zip(chunks, chunks[1:]))
    with pytest.raises(ValueError):
        pack_sequences(SF, budget=0)


def test_shuffle_order_is_permutation_and_seeded(ray_session):
    import hashlib

    from bitcoin_ledger_2es_ray.pipelines.curate import shuffle_order

    a = shuffle_order(SF, seed="s0")
    ranks = sorted(a["shuffle_rank"].to_pylist())
    assert ranks == list(range(a.num_rows))  # a true permutation
    # matches the hash order exactly
    keys = {
        d: hashlib.sha256(f"{d}:s0".encode()).hexdigest()
        for d in a["doc_id"].to_pylist()
    }
    by_rank = sorted(zip(a["shuffle_rank"].to_pylist(), a["doc_id"].to_pylist()))
    assert [d for _, d in by_rank] == sorted(keys, key=lambda d: (keys[d], d))
    # a different seed yields a different permutation; same seed identical
    b = shuffle_order(SF, seed="s1")
    assert b["shuffle_rank"].to_pylist() != a["shuffle_rank"].to_pylist()
    assert shuffle_order(SF, seed="s0").equals(a)


# ---------------------------------------------------------------------------
# stratified_sample


def test_stratified_sample_exact_allocation(ray_session):
    import collections
    import hashlib
    import math

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import stratified_sample

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang", "text"])
    by_lang = collections.defaultdict(list)
    for d, l, t in zip(
        docs["doc_id"].to_pylist(), docs["lang"].to_pylist(), docs["text"].to_pylist()
    ):
        by_lang[l].append((hashlib.sha256(t.encode()).hexdigest(), d))
    for frac in (0.1, 0.5, 1.0):
        out = stratified_sample(sf, frac=frac)
        got = collections.defaultdict(set)
        for r in out.to_pylist():
            got[r["lang"]].add(r["doc_id"])
        for lang, rows in by_lang.items():
            k = math.ceil(frac * len(rows))
            want = {d for _, d in sorted(rows)[:k]}
            assert got[lang] == want, (frac, lang)


def test_stratified_sample_bad_frac(ray_session):
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.curate import stratified_sample

    with _pytest.raises(ValueError):
        stratified_sample("/root/testdata/sf0.001", frac=0.0)


def test_dup_clusters_are_connected_components(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.dedup import dup_clusters, shingle_jaccard_pairs

    pairs = shingle_jaccard_pairs(SF, tau=0.8)
    got = dup_clusters(SF, tau=0.8)
    # brute-force components via BFS
    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    seen: set[int] = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        rep = min(comp)
        for x in comp:
            want[x] = rep
    got_map = dict(zip(got["doc_id"].to_pylist(), got["cluster_id"].to_pylist()))
    assert got_map == want
    assert got["doc_id"].to_pylist() == sorted(got_map)


def test_duplicate_spans_bruteforce(ray_session):
    import collections

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.dedup import duplicate_spans

    k = 4
    t = duplicate_spans(SF, k=k)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    occ = collections.Counter()
    per_doc = {}
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = txt.split(" ")
        grams = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
        per_doc[d] = grams
        occ.update(grams)
    want = []
    for d, grams in sorted(per_doc.items()):
        marked = [i for i, g in enumerate(grams) if occ[g] >= 2]
        run = []
        for i in marked:
            if run and i == run[-1] + 1:
                run.append(i)
            else:
                if run:
                    want.append((d, run[0], run[-1] + k, run[-1] + k - run[0]))
                run = [i]
        if run:
            want.append((d, run[0], run[-1] + k, run[-1] + k - run[0]))
    got = list(
        zip(
            t["doc_id"].to_pylist(), t["start_tok"].to_pylist(),
            t["end_tok"].to_pylist(), t["n_tokens"].to_pylist(),
        )
    )
    assert got == sorted(want)
    assert all(n >= k for *_xs, n in got)


def test_hybrid_linear_normalization(built, ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import _minmax_norm, hybrid_linear
    from bitcoin_ledger_2es_ray.pipelines.query import SegmentStore

    res, _, _corpus = built
    store = SegmentStore(res.out_dir)
    q = pa.table({"query_id": [0], "text": [sorted(store.df)[0]]})
    t = hybrid_linear(SF, store, q, k=5, k_leg=10, w_lex=1.0, w_vec=0.0)
    # pure-lexical weights: top doc's normalized score is exactly 1.0
    assert t["score"][0].as_py() == 1.0
    assert t["rank"].to_pylist() == list(range(1, t.num_rows + 1))
    # degenerate leg normalizes to all-ones
    assert _minmax_norm(np.array([3.0, 3.0])).tolist() == [1.0, 1.0]
    both = hybrid_linear(SF, store, q, k=5, k_leg=10, w_lex=0.7, w_vec=0.3)
    assert all(0.0 <= s <= 1.0 + 1e-9 for s in both["score"].to_pylist())


def test_dedup_keep_best_policy(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.dedup import dedup_keep_best, dup_clusters

    t = dedup_keep_best(SF, tau=0.8)
    cl = dup_clusters(SF, tau=0.8)
    assert t["doc_id"].to_pylist() == cl["doc_id"].to_pylist()
    meta = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    nch = dict(zip(meta["doc_id"].to_pylist(), meta["n_chars"].to_pylist()))
    import collections

    groups = collections.defaultdict(list)
    for d, c, kept in zip(
        t["doc_id"].to_pylist(), t["cluster_id"].to_pylist(), t["kept"].to_pylist()
    ):
        groups[c].append((d, kept))
    for c, members in groups.items():
        kept = [d for d, k in members if k]
        assert len(kept) == 1
        best = sorted(members, key=lambda m: (-nch[m[0]], m[0]))[0][0]
        assert kept[0] == best


def test_mixing_weights_sublinear(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import mixing_weights

    t = mixing_weights(SF, alpha=0.5)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    import collections

    toks = collections.Counter()
    nd = collections.Counter()
    for s, txt in zip(docs["source"].to_pylist(), docs["text"].to_pylist()):
        toks[s] += len(txt.split(" "))
        nd[s] += 1
    tot = sum(np.sqrt(v) for v in toks.values())
    for s, n, ntok, w in zip(
        t["source"].to_pylist(), t["n_docs"].to_pylist(),
        t["n_tokens"].to_pylist(), t["weight"].to_pylist(),
    ):
        assert n == nd[s] and ntok == toks[s]
        assert w == pytest.approx(np.sqrt(toks[s]) / tot, abs=1e-6)
    assert sum(t["weight"].to_pylist()) == pytest.approx(1.0, abs=1e-4)


def test_knn_int8_recall_vs_exact(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce, knn_int8

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    quant = knn_int8(SF, n_queries=5, k=5, oversample=4)
    ex = {}
    for q, v in zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()):
        ex.setdefault(q, set()).add(v)
    got = {}
    for q, v in zip(quant["query_id"].to_pylist(), quant["vec_id"].to_pylist()):
        got.setdefault(q, set()).add(v)
    hits = sum(len(ex[q] & got.get(q, set())) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.9, f"int8 recall {hits/total:.2f}"
    # sims on agreeing rows are the EXACT cosine (rescore semantics)
    exact_sim = {
        (q, v): s
        for q, v, s in zip(
            exact["query_id"].to_pylist(), exact["vec_id"].to_pylist(),
            exact["sim"].to_pylist(),
        )
    }
    for q, v, s in zip(
        quant["query_id"].to_pylist(), quant["vec_id"].to_pylist(),
        quant["sim"].to_pylist(),
    ):
        if (q, v) in exact_sim:
            assert s == pytest.approx(exact_sim[(q, v)], abs=1e-9)


def test_duplicate_spans_and_bigram_sinks_match_tables(ray_session, tmp_path):
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.dedup import (
        duplicate_spans,
        duplicate_spans_to_parquet,
    )
    from bitcoin_ledger_2es_ray.pipelines.ngrams import (
        bigram_logprob,
        bigram_logprob_to_parquet,
    )

    t = duplicate_spans(SF, k=4)
    out = duplicate_spans_to_parquet(SF, str(tmp_path / "spans"), k=4)
    got = pads.dataset(out).to_table().sort_by(
        [("doc_id", "ascending"), ("start_tok", "ascending")]
    )
    assert got.equals(t)

    t2 = bigram_logprob(SF)
    out2 = bigram_logprob_to_parquet(SF, str(tmp_path / "lp"))
    got2 = pads.dataset(out2).to_table().sort_by("doc_id")
    assert got2.equals(t2)


def test_shingle_jaccard_prefix_filter_identity_randomized(ray_session, tmp_path):
    """PPJoin prefix/length/positional filtering must lose NO pair:
    randomized corpora vs an all-pairs brute force."""
    import itertools
    import random

    import pyarrow.parquet as pq

    rng = random.Random(23)
    words = [f"w{i}" for i in range(12)]
    k, tau = 2, 0.6
    for trial in range(3):
        n_docs = 40
        texts = []
        for d in range(n_docs):
            L = rng.randint(2, 14)
            base = [rng.choice(words) for _ in range(L)]
            texts.append(" ".join(base))
            # plant near-dups: copy with a small mutation
            if rng.random() < 0.4:
                mut = list(base)
                if len(mut) > 3 and rng.random() < 0.5:
                    mut[rng.randrange(len(mut))] = rng.choice(words)
                texts.append(" ".join(mut))
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["py"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
            }
        )
        d = tmp_path / f"corpus{trial}"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))

        from bitcoin_ledger_2es_ray.pipelines.dedup import shingle_jaccard_pairs

        got = shingle_jaccard_pairs(str(d), k=k, tau=tau)
        got_pairs = {
            (a, b): j
            for a, b, j in zip(
                got["a"].to_pylist(), got["b"].to_pylist(), got["jaccard"].to_pylist()
            )
        }

        def shingles(txt):
            w = txt.split(" ")
            return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

        want = {}
        sets = [shingles(x) for x in texts]
        for i, j_ in itertools.combinations(range(len(texts)), 2):
            A, B = sets[i], sets[j_]
            if not A or not B:
                continue
            inter = len(A & B)
            jac = inter / len(A | B)
            if jac >= tau:
                want[(i, j_)] = round(jac, 6)
        assert got_pairs == want, f"trial {trial}"


def test_sem_dedup_matches_numpy_replay(ray_session):
    """sem_dedup == a pure-numpy replay of the same deterministic k-means +
    within-cluster screen (exact identity — trainer and screen are both
    deterministic), plus structural invariants."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import (
        _normalize,
        _train_centroids,
        sem_dedup,
    )

    tau, k = 0.8, 8
    got = sem_dedup(SF, tau=tau, n_centroids=k)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"]).astype(np.int64)
    mat = np.asarray(t["embedding"].combine_chunks().values, dtype=np.float64)
    mat = _normalize(mat.reshape(len(ids), -1))
    cent = _train_centroids(SF, k)
    sims = mat @ cent.T
    ci = np.argmax(sims, axis=1)
    cd = 1.0 - sims[np.arange(len(ids)), ci]

    want = {}
    for c in np.unique(ci):
        m = np.flatnonzero(ci == c)
        order = m[np.lexsort((ids[m], cd[m]))]
        nm = mat[order]
        oids = ids[order]
        for j in range(len(order)):
            if j == 0:
                want[int(oids[j])] = (int(c), True, -1)
                continue
            s = nm[:j] @ nm[j]
            b = int(np.argmax(s))
            if s[b] >= tau:
                want[int(oids[j])] = (int(c), False, int(oids[b]))
            else:
                want[int(oids[j])] = (int(c), True, -1)

    assert got.num_rows == len(ids)
    for vid, c, kept, dof in zip(
        got["vec_id"].to_pylist(),
        got["centroid"].to_pylist(),
        got["kept"].to_pylist(),
        got["dup_of"].to_pylist(),
    ):
        assert want[vid] == (c, kept, dof), vid
    # every dropped vector's dup_of is a kept-or-earlier member of the same cluster
    by_id = {v: (c, kp, d) for v, (c, kp, d) in want.items()}
    for v, (c, kp, d) in by_id.items():
        if not kp:
            assert by_id[d][0] == c


def test_sem_dedup_flags_injected_duplicates(ray_session, tmp_path):
    """A corpus with two exact-duplicate vectors and one orthogonal vector:
    the duplicate pair collapses to one kept row regardless of clustering."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import sem_dedup

    d = 8
    v = np.zeros((4, d), dtype=np.float32)
    v[0, 0] = 1.0
    v[1, 0] = 1.0  # exact duplicate of v0
    v[2, 1] = 1.0  # orthogonal
    v[3, 2] = 1.0  # orthogonal
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "embedding": pa.array(v.tolist(), type=pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0, 0], type=pa.int32()),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    t = sem_dedup(str(sf), tau=0.99, n_centroids=2, sample=4)
    info = dict(zip(t["vec_id"].to_pylist(), zip(t["kept"].to_pylist(), t["dup_of"].to_pylist())))
    assert info[0] == (True, -1)
    assert info[1] == (False, 0)
    assert info[2][0] and info[3][0]


def test_screen_tiled_matches_dense():
    """The tiled earlier-member screen == the dense tril argmax reference,
    including first-occurrence tie-breaks, at tile sizes that force the
    diagonal-mask, multi-row-tile and multi-col-tile paths."""
    from bitcoin_ledger_2es_ray.pipelines.ann import _normalize, _screen_tiled

    rng = np.random.default_rng(7)
    for n, tile in [(1, 4), (5, 2), (97, 16), (200, 64), (50, 7)]:
        mat = rng.standard_normal((n, 8))
        # inject exact duplicates so ties exercise the earliest-argmax rule
        if n >= 10:
            mat[7] = mat[3]
            mat[9] = mat[3]
        nm = _normalize(mat)
        hit, best = _screen_tiled(nm, tau=0.8, tile=tile)
        dense = np.tril(nm @ nm.T, k=-1)
        np.fill_diagonal(dense, -np.inf)
        dense[np.triu_indices(n, k=1)] = -np.inf
        want_best = dense.argmax(axis=1)
        want_max = dense[np.arange(n), want_best]
        want_hit = want_max >= 0.8
        assert not hit[0]
        np.testing.assert_array_equal(hit[1:], want_hit[1:]), (n, tile)
        sel = np.flatnonzero(want_hit)
        np.testing.assert_array_equal(best[sel], want_best[sel]), (n, tile)


def test_sem_dedup_sink_matches_collect(ray_session, tmp_path):
    """sem_dedup_to_parquet writes exactly the rows the collecting variant
    returns (the scale path vs the oracle-gate path)."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import sem_dedup, sem_dedup_to_parquet

    want = sem_dedup(SF, tau=0.8, n_centroids=8)
    out = sem_dedup_to_parquet(SF, str(tmp_path / "semdedup"), tau=0.8, n_centroids=8)
    got = pq.read_table(out).sort_by("vec_id").select(want.column_names)
    assert got.equals(want)


def test_dsir_select_matches_brute_force(ray_session):
    import math

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.dsir import dsir_select

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    cf_s: dict[str, int] = {}
    cf_t: dict[str, int] = {}
    toks_of = {}
    for d, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        toks = text.split(" ")
        toks_of[d] = toks
        for t in toks:
            cf_s[t] = cf_s.get(t, 0) + 1
            if lang == "en":
                cf_t[t] = cf_t.get(t, 0) + 1
    v = len(cf_s)
    t_tot, s_tot = sum(cf_t.values()), sum(cf_s.values())
    llr = {
        t: math.log((cf_t.get(t, 0) + 1) / (t_tot + v))
        - math.log((cf_s[t] + 1) / (s_tot + v))
        for t in cf_s
    }
    w = {
        d: float(sql_round(np.array([sum(llr[t] for t in toks)]), 6)[0])
        for d, toks in toks_of.items()
    }
    want = sorted(sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    got = dsir_select(SF, target_lang="en", n_select=50)
    assert list(zip(got["doc_id"].to_pylist(), got["logw"].to_pylist())) == [
        (d, pytest.approx(s, abs=1e-9)) for d, s in want
    ]
    # selected docs skew toward the target model by construction: every
    # weight is a sum of per-token LLRs, so the top selection's mean weight
    # must exceed the corpus mean
    assert np.mean([s for _, s in want]) > np.mean(list(w.values()))


def test_cluster_sample_matches_numpy_replay(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import (
        _normalize,
        _train_centroids,
        cluster_sample,
    )

    k, per = 8, 5
    got = cluster_sample(SF, n_centroids=k, per_cluster=per)

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"]).astype(np.int64)
    mat = np.asarray(t["embedding"].combine_chunks().values, dtype=np.float64)
    mat = _normalize(mat.reshape(len(ids), -1))
    cent = _train_centroids(SF, k)
    sims = mat @ cent.T
    ci = np.argmax(sims, axis=1)
    cd = 1.0 - sims[np.arange(len(ids)), ci]

    rows = []
    for c in np.unique(ci):
        m = np.flatnonzero(ci == c)
        order = m[np.lexsort((ids[m], cd[m]))][:per]
        for r, j in enumerate(order, start=1):
            rows.append((int(ids[j]), int(c), r, cd[j]))
    want = sorted(rows, key=lambda r: (r[1], r[2]))
    assert [
        (v, c, r) for v, c, r, _ in want
    ] == list(
        zip(
            got["vec_id"].to_pylist(),
            got["centroid"].to_pylist(),
            got["rank_in_cluster"].to_pylist(),
        )
    )
    np.testing.assert_allclose(
        got["cdist"].to_pylist(), [d for _, _, _, d in want], atol=1e-12
    )
    # balance: every non-empty cluster contributes min(per, members)
    from collections import Counter

    sizes = Counter(ci.tolist())
    contrib = Counter(got["centroid"].to_pylist())
    for c, n in sizes.items():
        assert contrib[c] == min(per, n)


def test_rollup_search_is_lossless_for_mergeable_metrics(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.rollup import rollup_events, rollup_search

    out = str(tmp_path / "rollup.parquet")
    rollup_events(SF, out, interval_s=3600)
    got = rollup_search(out, interval_s=86400)

    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    sec = np.asarray(ev["ts"].cast(pa.int64())) // 1_000_000
    day = (sec // 86400) * 86400
    et = ev["event_type"].to_pylist()
    val = np.asarray(ev["value"], dtype=np.float64)
    want: dict[tuple[int, str], list[float]] = {}
    for b, t, v in zip(day.tolist(), et, val.tolist()):
        want.setdefault((b, t), []).append(v)
    rows = {
        (b, t): (
            len(vs),
            float(sql_round(np.array([min(vs)]), 6)[0]),
            float(sql_round(np.array([max(vs)]), 6)[0]),
            float(sql_round(np.array([sum(vs)]), 6)[0]),
        )
        for (b, t), vs in want.items()
    }
    assert got.num_rows == len(rows)
    for b, t, n, mn, mx, sm in zip(
        got["bucket_s"].to_pylist(),
        got["event_type"].to_pylist(),
        got["doc_count"].to_pylist(),
        got["min_value"].to_pylist(),
        got["max_value"].to_pylist(),
        got["sum_value"].to_pylist(),
    ):
        wn, wmn, wmx, wsm = rows[(b, t)]
        assert (n, mn, mx) == (wn, wmn, wmx)
        assert sm == pytest.approx(wsm, abs=1e-6)
    # re-running the job replaces the rollup index (overwrite semantics)
    rollup_events(SF, out, interval_s=3600)
    again = rollup_search(out, interval_s=86400)
    assert again.equals(got)


def test_transform_incremental_merge_equals_full_recompute(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.transform import (
        checkpoint_of,
        read_pivot,
        run_transform,
    )

    ev = pq.read_table(f"{SF}/events.parquet").sort_by("ts")
    cut = int(ev.num_rows * 0.6)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(ev.slice(0, cut), str(src / "events.parquet"))

    dest = str(tmp_path / "dest")
    c1 = run_transform(str(src), dest)
    partial_pivot = read_pivot(dest)

    # new events arrive (full file replaces the truncated one)
    pq.write_table(ev, str(src / "events.parquet"))
    c2 = run_transform(str(src), dest)
    assert c2 > c1
    assert checkpoint_of(dest) == c2
    got = read_pivot(dest)

    # fresh full run == incremental merge
    dest_full = str(tmp_path / "dest_full")
    run_transform(str(src), dest_full)
    want = read_pivot(dest_full)
    assert got.equals(want)
    assert partial_pivot.num_rows <= got.num_rows
    # third run with nothing new is a no-op on the pivot and checkpoint
    c3 = run_transform(str(src), dest)
    assert c3 == c2
    assert read_pivot(dest).equals(got)


def test_tokenizer_stats_brute(ray_session):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import tokenizer_stats

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"])
    want: dict[str, list] = {}
    for text, lang in zip(docs["text"].to_pylist(), docs["lang"].to_pylist()):
        e = want.setdefault(lang, [0, 0, 0])
        e[0] += 1
        e[1] += len(text.split(" "))
        e[2] += len(text)
    got = tokenizer_stats(SF).to_pylist()
    assert [r["lang"] for r in got] == sorted(want)
    for r in got:
        n, tok, ch = want[r["lang"]]
        assert r["n_docs"] == n and r["total_tokens"] == tok
        assert r["avg_dl"] == pytest.approx(tok / n, abs=1e-6)
        assert r["chars_per_token"] == pytest.approx(ch / tok, abs=1e-6)


def test_quality_classifier_threshold_on_rounded_prob(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.textstats import quality_classifier

    out = quality_classifier(SF, threshold=0.5)
    probs = out["prob"].to_pylist()
    keeps = out["keep"].to_pylist()
    assert all(k == int(p >= 0.5) for p, k in zip(probs, keeps))
    assert 0 < sum(keeps) < len(keeps)  # the threshold actually separates


def test_mmr_rerank_brute(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.functions.bm25 import sql_round
    from bitcoin_ledger_2es_ray.pipelines.ann import mmr_rerank

    # planted geometry: docs 0/1 near-identical, 2 orthogonal, 3 diagonal
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.999, 0.045, 0.0],
        2: [0.0, 1.0, 0.0],
        3: [0.7071, 0.7071, 0.0],
        4: [0.0, 0.0, 1.0],
    }
    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), type=pa.int64()),
                "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                                      type=pa.list_(pa.float32())),
                "label": pa.array([0] * len(vecs), type=pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    ranking = {7: [(0, 10.0), (1, 9.5), (2, 5.0), (3, 7.0), (4, 1.0)]}
    lam = 0.6
    out = mmr_rerank(sf, ranking, lam=lam, k=4).to_pylist()

    # brute-force greedy reference
    import numpy as np

    ids = sorted(vecs)
    m = np.array([vecs[i] for i in ids], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    rel_raw = np.array([10.0, 9.5, 5.0, 7.0, 1.0])
    rel = (rel_raw - rel_raw.min()) / (rel_raw.max() - rel_raw.min())
    chosen, max_sim = [], np.full(5, -1.0)
    want = []
    for rank in range(1, 5):
        obj = lam * rel - (0 if not chosen else (1 - lam) * max_sim)
        obj = np.array([float(sql_round(x, 6)) for x in obj])
        cand = [(i, obj[i]) for i in range(5) if i not in chosen]
        best = sorted(cand, key=lambda t: (-t[1], ids[t[0]]))[0][0]
        want.append((rank, ids[best], float(obj[best])))
        chosen.append(best)
        max_sim = np.maximum(max_sim, m @ m[best])
    assert [(r["rank"], r["doc_id"], r["mmr"]) for r in out] == want
    # rank 1 is pure relevance; the near-duplicate of doc 0 is demoted
    # below the far-less-relevant but orthogonal doc 2
    assert out[0]["doc_id"] == 0
    order = [r["doc_id"] for r in out]
    assert order.index(2) < order.index(1)
    # lam=1.0 degenerates to the relevance order
    pure = mmr_rerank(sf, ranking, lam=1.0, k=5).to_pylist()
    assert [r["doc_id"] for r in pure] == [0, 1, 3, 2, 4]
    with pytest.raises(ValueError):
        mmr_rerank(sf, ranking, lam=1.5)


def test_curriculum_stages_ntile(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.curate import curriculum_stages

    out = curriculum_stages(SF, n_stages=3)
    stages = out["stage"].to_pylist()
    quality = out["quality"].to_pylist()
    n = len(stages)
    # ntile sizes: first (n mod 3) stages ceil-sized
    from collections import Counter

    sizes = Counter(stages)
    big, small = -(-n // 3), n // 3
    assert sorted(sizes.values(), reverse=True)[: n % 3] == [big] * (n % 3)
    assert all(v in (big, small) for v in sizes.values())
    # stage order respects quality order: max quality of stage s <= min of s+1
    # (modulo ties at the boundary)
    by_stage = {}
    for s, q in zip(stages, quality):
        by_stage.setdefault(s, []).append(q)
    for s in range(1, 3):
        assert max(by_stage[s]) <= min(by_stage[s + 1]) + 1e-12
    with pytest.raises(ValueError):
        curriculum_stages(SF, n_stages=0)


def test_hnsw_recall_and_determinism(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce, knn_hnsw

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    h = knn_hnsw(SF, n_queries=5, k=5, block_rows=128)
    eh = set(zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()))
    hh = set(zip(h["query_id"].to_pylist(), h["vec_id"].to_pylist()))
    recall = len(eh & hh) / len(eh)
    assert recall >= 0.8, f"HNSW recall {recall:.2f} too low"
    # the query's own vector (rank 1, sim 1.0) must be found
    top1 = {
        (q, v)
        for q, r, v in zip(
            exact["query_id"].to_pylist(), exact["rank"].to_pylist(),
            exact["vec_id"].to_pylist(),
        )
        if r == 1
    }
    assert top1 <= hh
    # hash levels + id-ordered inserts + total tie-breaks → deterministic
    assert knn_hnsw(SF, n_queries=5, k=5, block_rows=128).equals(h)
    # block size changes the graphs but keeps quality (per-segment search)
    h2 = knn_hnsw(SF, n_queries=5, k=5, block_rows=256)
    hh2 = set(zip(h2["query_id"].to_pylist(), h2["vec_id"].to_pylist()))
    assert len(eh & hh2) / len(eh) >= 0.8


def test_hnsw_graph_invariants():
    from bitcoin_ledger_2es_ray.pipelines.ann import (
        _normalize,
        hnsw_build,
        hnsw_search,
    )

    rng = np.random.default_rng(7)
    mat = _normalize(rng.normal(size=(200, 16)))
    ids = np.arange(200, dtype=np.int64)
    layers, top, entry = hnsw_build(ids, mat, m=6, ef_construction=48)
    # degree bounds: <= 2m at layer 0, <= m above (post-pruning)
    assert all(len(v) <= 12 for v in layers[0].values())
    for l in range(1, len(layers)):
        assert all(len(v) <= 6 + 6 for v in layers[l].values())  # pre-prune slack
    # layer populations shrink geometrically-ish
    assert len(layers[0]) == 200
    if len(layers) > 1:
        assert len(layers[1]) < 200
    # brute-force top-1 found for most corpus vectors used as queries
    hit = 0
    for i in range(0, 200, 10):
        got = hnsw_search(mat[i], layers, top, entry, mat, k=1, ef_search=48)
        hit += got and got[0][1] == i
    assert hit >= 18  # >= 90% self-recall


def test_mlm_examples_brute(ray_session, tmp_path):
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import (
        mlm_examples,
        mlm_examples_to_parquet,
    )

    out = mlm_examples(SF, stride=5)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        toks = t.split(" ")
        masked = [
            "[MASK]" if (i + d) % 5 == 0 else w for i, w in enumerate(toks)
        ]
        want[d] = (" ".join(masked), sum((i + d) % 5 == 0 for i in range(len(toks))))
    for r in out.to_pylist():
        assert (r["masked"], r["n_masked"]) == want[r["doc_id"]]
    # sink matches the collected table
    sink = mlm_examples_to_parquet(SF, str(tmp_path / "mlm"), stride=5)
    written = pads.dataset(sink).to_table().sort_by("doc_id")
    assert written.equals(out.cast(written.schema))


def test_mixture_select_brute_force(ray_session):
    """Threshold-plan mixture execution equals the direct per-source
    longest-first fill-until-budget selection."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import mixture_select

    sf = "/root/testdata/sf0.001"
    B = 4_000
    out = mixture_select(sf, budget_total=B, alpha=0.5)

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    d = docs.to_pandas()
    d["dl"] = d["text"].str.split(" ").str.len()
    tok = d.groupby("source")["dl"].sum().astype(float)
    w = tok**0.5
    w = w / w.sum()
    budgets = np.floor(w * B).astype(int)

    want = []
    for s, grp in d.groupby("source"):
        g = grp.sort_values(["dl", "doc_id"], ascending=[False, True])
        cum = 0
        for _, row in g.iterrows():
            if cum < budgets[s]:
                want.append(int(row.doc_id))
            cum += int(row.dl)
    want = sorted(want)
    assert out["doc_id"].to_pylist() == want
    # per-source token totals end within one doc of the budget
    got = out.to_pandas()
    for s, grp in got.groupby("source"):
        assert grp["dl"].sum() >= budgets[s]  # filled
        # removing the last (shortest, highest-doc_id) selected doc drops under budget
        last = grp.sort_values(["dl", "doc_id"], ascending=[False, True]).iloc[-1]
        assert grp["dl"].sum() - last.dl < budgets[s]


def test_fim_examples_brute_force(ray_session):
    """FIM generation: reconstructs the doc exactly (p+m+s partition), cut
    formulas honored, PSM/SPM layouts by parity, sink == collected table."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import (
        fim_examples,
        fim_examples_to_parquet,
    )

    sf = "/root/testdata/sf0.001"
    out = fim_examples(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).sort_by(
        "doc_id"
    )
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert out.num_rows == len(texts)
    for row in out.to_pylist():
        toks = texts[row["doc_id"]].split(" ")
        n = len(toks)
        a = (7 * row["doc_id"] + 3) % (n + 1)
        b = a + (11 * row["doc_id"] + 5) % (n - a + 1)
        assert (row["n_prefix"], row["n_middle"], row["n_suffix"]) == (a, b - a, n - b)
        p, m, s = " ".join(toks[:a]), " ".join(toks[a:b]), " ".join(toks[b:])
        if row["doc_id"] % 2 == 0:
            assert row["mode"] == "psm"
            assert row["fim"] == f"<PRE>{p}<SUF>{s}<MID>{m}"
        else:
            assert row["mode"] == "spm"
            assert row["fim"] == f"<SUF>{s}<PRE>{p}<MID>{m}"

    out_dir = fim_examples_to_parquet(sf, "/tmp/blray_test_fim")
    sunk = pq.read_table(out_dir).sort_by("doc_id")
    assert sunk.equals(out)


def test_repo_pack_brute_force(ray_session):
    """Repo packing: unit shas equal a direct per-repo path-ordered join."""
    import hashlib

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import repo_pack

    sf = "/root/testdata/sf0.001"
    out = repo_pack(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "source", "text"])
    rows = {}
    for d, s, t in zip(
        docs["doc_id"].to_pylist(), docs["source"].to_pylist(), docs["text"].to_pylist()
    ):
        repo = f"org{d % 7}/repo{d % 20}"
        rows.setdefault(repo, []).append((f"src/{s}/file_{d}.py", t))
    want = {}
    for repo, files in rows.items():
        files.sort()
        joined = "\n".join(t for _, t in files)
        want[repo] = (
            len(files),
            sum(len(t.split(" ")) for _, t in files),
            hashlib.sha256(joined.encode()).hexdigest(),
        )
    assert out.num_rows == len(want)
    for row in out.to_pylist():
        nf, ntok, sha = want[row["repo"]]
        assert (row["n_files"], row["n_tokens"], row["sha"]) == (nf, ntok, sha)


def test_colbert_maxsim(ray_session):
    """MaxSim: numpy replay identity; n_chunks=1 degenerates to plain
    cosine kNN (same ranking and scores)."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import colbert_maxsim, knn_bruteforce

    sf = "/root/testdata/sf0.001"
    out = colbert_maxsim(sf, n_queries=4, k=5, n_chunks=4)

    emb = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    ids = np.asarray(emb["vec_id"], dtype=np.int64)
    mat = np.asarray(emb["embedding"].combine_chunks().values, dtype=np.float64).reshape(
        len(ids), -1
    )
    T = 4
    c = mat.shape[1] // T

    def chunks(m):
        t = m.reshape(m.shape[0], T, c)
        n = np.linalg.norm(t, axis=2, keepdims=True)
        n[n == 0] = 1
        return t / n

    dc = chunks(mat)
    qc = dc[:4]
    sims = np.round(np.einsum("qtc,bsc->qtbs", qc, dc), 6)
    score = np.round(sims.max(axis=3).sum(axis=1), 6)
    for qi in range(4):
        order = np.lexsort((ids, -score[qi]))[:5]
        got = [r for r in out.to_pylist() if r["query_id"] == qi]
        assert [g["vec_id"] for g in got] == ids[order].tolist()
        assert [g["score"] for g in got] == score[qi][order].tolist()

    # degenerate: one chunk == whole-vector cosine == knn_bruteforce
    one = colbert_maxsim(sf, n_queries=3, k=5, n_chunks=1)
    knn = knn_bruteforce(sf, n_queries=3, k=5)
    assert one["vec_id"].to_pylist() == knn["vec_id"].to_pylist()
    assert one["score"].to_pylist() == knn["sim"].to_pylist()


def test_latest_transform_brute_force(ray_session):
    """ES `latest` transform: per-user argmax by (ts DESC, event_id DESC),
    merge of per-batch partials equals the direct computation."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.transform import latest_transform

    sf = "/root/testdata/sf0.001"
    out = latest_transform(sf)
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_id", "event_type", "value"]
    ).to_pandas()
    ev["ts_s"] = ev["ts"].astype("int64") // 1_000_000
    want = (
        ev.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        .groupby("user_id", as_index=False)
        .first()
        .sort_values("user_id")
    )
    got = out.to_pandas()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["ts_s"].tolist() == want["ts_s"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["value"].tolist() == [round(v, 6) for v in want["value"].tolist()]


def test_knn_bbq_recall_and_rescore(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bbq, knn_bruteforce

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    bbq = knn_bbq(SF, n_queries=5, k=5, oversample=24)
    ex = {}
    for q, v in zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()):
        ex.setdefault(q, set()).add(v)
    got = {}
    for q, v in zip(bbq["query_id"].to_pylist(), bbq["vec_id"].to_pylist()):
        got.setdefault(q, set()).add(v)
    hits = sum(len(ex[q] & got.get(q, set())) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.85, f"bbq recall {hits/total:.2f}"
    # sims on agreeing rows are the EXACT cosine (rescore semantics)
    exact_sim = {
        (q, v): s
        for q, v, s in zip(
            exact["query_id"].to_pylist(), exact["vec_id"].to_pylist(),
            exact["sim"].to_pylist(),
        )
    }
    for q, v, s in zip(
        bbq["query_id"].to_pylist(), bbq["vec_id"].to_pylist(),
        bbq["sim"].to_pylist(),
    ):
        if (q, v) in exact_sim:
            assert s == pytest.approx(exact_sim[(q, v)], abs=1e-9)
    # a deep-enough shortlist IS the exact scan (degeneracy check)
    full = knn_bbq(SF, n_queries=3, k=5, oversample=1000)
    ex3 = knn_bruteforce(SF, n_queries=3, k=5)
    assert full["vec_id"].to_pylist() == ex3["vec_id"].to_pylist()
    assert full["sim"].to_pylist() == ex3["sim"].to_pylist()


def test_t5_span_corruption_reconstruction(ray_session, tmp_path):
    """Inputs and targets reassemble the original doc exactly: replacing
    each input sentinel with its target span round-trips the text; the
    sink streams the identical table."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import re as _re

    from bitcoin_ledger_2es_ray.pipelines.textstats import (
        t5_span_corruption,
        t5_span_corruption_to_parquet,
    )

    sf = "/root/testdata/sf0.001"
    out = t5_span_corruption(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).sort_by("doc_id")
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert out.num_rows == len(texts)
    checked_spans = 0
    for r in out.to_pylist():
        # parse target into span_id -> tokens
        parts = _re.split(r"<extra_id_(\d+)>", r["target"])
        spans = {}
        ids = parts[1::2]
        bodies = parts[2::2]
        for sid, body in zip(ids[:-1], bodies[:-1] if len(bodies) == len(ids) else bodies):
            spans[int(sid)] = body.strip()
        assert int(ids[-1]) == r["n_spans"]  # closing sentinel
        rebuilt = _re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r["input"]
        )
        rebuilt = " ".join(rebuilt.split())
        assert rebuilt == texts[r["doc_id"]], r["doc_id"]
        checked_spans += r["n_spans"]
    assert checked_spans > 0
    # sink equals the collected table byte-for-byte
    out_dir = str(tmp_path / "t5")
    t5_span_corruption_to_parquet(sf, out_dir)
    sunk = pads.dataset(out_dir).to_table().sort_by("doc_id")
    assert sunk.equals(out)


def test_length_grouped_batches_brute_force(ray_session):
    """Batch stats equal a direct sorted replay; length grouping strictly
    reduces total padding on this corpus."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.textstats import length_grouped_batches

    out = length_grouped_batches(SF, batch_size=64).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    dls = {
        d: len(t.split(" "))
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    # arrival replay
    arr = out[out.strategy == "arrival"].set_index("batch_id")
    for b in arr.index:
        members = [dl for d, dl in dls.items() if d // 64 == b]
        assert arr.loc[b, "n"] == len(members)
        assert arr.loc[b, "max_dl"] == max(members)
        assert arr.loc[b, "sum_dl"] == sum(members)
        assert arr.loc[b, "padding"] == len(members) * max(members) - sum(members)
    # length-grouped replay
    ordered = sorted(dls.items(), key=lambda kv: (kv[1], kv[0]))
    lg = out[out.strategy == "length_grouped"].set_index("batch_id")
    for b in lg.index:
        members = [dl for _, dl in ordered[b * 64 : (b + 1) * 64]]
        assert lg.loc[b, "n"] == len(members)
        assert lg.loc[b, "max_dl"] == max(members)
        assert lg.loc[b, "sum_dl"] == sum(members)
    assert lg["padding"].sum() < arr["padding"].sum()


def test_knn_graph_exact_vs_numpy(ray_session):
    """Exact kNN graph vs an independent dense-numpy recompute (different
    code path: full matrix in one shot, argsort per row)."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import knn_graph

    t = knn_graph(SF, k=5)
    full = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(full["vec_id"])
    mat = np.vstack([np.asarray(e, dtype=np.float64) for e in full["embedding"].to_pylist()])
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(nm @ nm.T, 6)
    np.fill_diagonal(sims, -np.inf)
    expected = []
    for i in range(len(ids)):
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:5]
        for rank, j in enumerate(order, start=1):
            expected.append((int(ids[i]), rank, int(ids[j]), float(sims[i, j])))
    expected.sort()
    got = list(
        zip(
            t["vec_id"].to_pylist(),
            t["rank"].to_pylist(),
            t["nbr_id"].to_pylist(),
            t["sim"].to_pylist(),
        )
    )
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[:3] == e[:3]
        assert abs(g[3] - e[3]) < 1e-9


def test_knn_graph_lsh_recall(ray_session):
    """LSH graph: every edge it returns carries the exact sim (perfect
    precision on sims), recall vs the exact graph measured, deterministic."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_graph, knn_graph_lsh

    exact = knn_graph(SF, k=5)
    approx = knn_graph_lsh(SF, k=5, n_planes=4, n_tables=12)
    exact_edges = set(zip(exact["vec_id"].to_pylist(), exact["nbr_id"].to_pylist()))
    approx_edges = set(zip(approx["vec_id"].to_pylist(), approx["nbr_id"].to_pylist()))
    recall = len(exact_edges & approx_edges) / len(exact_edges)
    assert recall >= 0.75, f"kNN-graph LSH recall {recall:.2f} too low"
    # sims of recovered true edges are the exact cosines
    exact_sim = {
        (a, b): s
        for a, b, s in zip(
            exact["vec_id"].to_pylist(), exact["nbr_id"].to_pylist(), exact["sim"].to_pylist()
        )
    }
    for a, b, s in zip(
        approx["vec_id"].to_pylist(), approx["nbr_id"].to_pylist(), approx["sim"].to_pylist()
    ):
        if (a, b) in exact_sim:
            assert abs(exact_sim[(a, b)] - s) < 1e-9
    again = knn_graph_lsh(SF, k=5, n_planes=4, n_tables=12)
    assert again.equals(approx)


def test_source_stats_and_filter(ray_session):
    """Per-source stats vs a pandas brute force over the same quality
    kernel; the filter keeps exactly the docs of clearing sources, and
    every kept doc's source mean really clears the bar."""
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.curate import source_filter, source_stats
    from bitcoin_ledger_2es_ray.pipelines.textstats import quality_batch

    stats = source_stats(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    feats = quality_batch(docs).to_pandas()
    feats["source"] = docs["source"].to_pylist()
    feats["q_micro"] = np.round(feats["quality"] * 1_000_000).astype(np.int64)
    by = feats.groupby("source")
    expect_mean = (by["q_micro"].sum() / (by.size() * 1_000_000.0)).round(6)
    got = dict(zip(stats["source"].to_pylist(), stats["mean_quality"].to_pylist()))
    assert set(got) == set(expect_mean.index)
    for s, m in expect_mean.items():
        assert abs(got[s] - m) < 1e-9
    assert stats["n_docs"].to_pylist() == by.size().reindex(sorted(got)).tolist()

    kept = source_filter(SF, threshold=0.445)
    keep_sources = {s for s, m in got.items() if m >= 0.445}
    assert set(kept["source"].to_pylist()) == keep_sources
    expected_ids = sorted(feats[feats["source"].isin(keep_sources)]["doc_id"])
    assert kept["doc_id"].to_pylist() == expected_ids
    assert 0 < len(keep_sources) < len(got)  # the bar actually splits


def test_outlier_scores_brute_force(ray_session):
    """x-pack outlier_detection (distance-feature subset) vs an independent
    dense recompute: per-point kth/avg kNN distance off the rounded cosine,
    equal-weight min-max-normalized combine."""
    import math

    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import outlier_scores

    t = outlier_scores(SF, k=5)
    full = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(full["vec_id"])
    mat = np.vstack([np.asarray(e, dtype=np.float64) for e in full["embedding"].to_pylist()])
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(nm @ nm.T, 6)
    np.fill_diagonal(sims, -np.inf)
    dk, da = {}, {}
    for i in range(len(ids)):
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:5]
        dmic = [round((1.0 - sims[i, j]) * 1_000_000) for j in order]
        dk[int(ids[i])] = dmic[-1] / 1_000_000.0
        da[int(ids[i])] = round(sum(dmic) / 5_000_000.0, 6)
    mnk, mxk = min(dk.values()), max(dk.values())
    mna, mxa = min(da.values()), max(da.values())
    for vid, gk, ga, gs in zip(
        t["vec_id"].to_pylist(),
        t["dist_kth"].to_pylist(),
        t["dist_avg"].to_pylist(),
        t["outlier_score"].to_pylist(),
    ):
        assert math.isclose(gk, dk[vid], abs_tol=1e-9)
        assert math.isclose(ga, da[vid], abs_tol=1e-9)
        want = 0.5 * (dk[vid] - mnk) / (mxk - mnk) + 0.5 * (da[vid] - mna) / (mxa - mna)
        assert math.isclose(gs, round(want, 6), abs_tol=1e-6)
    # scores live in [0, 1]; at least one point attains a boundary feature
    scores = t["outlier_score"].to_pylist()
    assert min(scores) >= 0.0 and max(scores) <= 1.0


def test_outlier_scores_sink_round_trip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.ann import outlier_scores, outlier_scores_to_parquet

    out = outlier_scores_to_parquet(SF, str(tmp_path / "outliers"))
    back = pq.read_table(out).sort_by("vec_id")
    direct = outlier_scores(SF)
    assert back.select(direct.column_names).equals(direct)


def test_anomaly_scores_brute_force(ray_session):
    """Robust-z anomaly scores vs an independent pandas recompute
    (np.median / manual MAD — a different quantile code path)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.events import anomaly_scores

    t = anomaly_scores(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["bucket_s"] = (ev["ts"].astype("int64") // 1_000_000 // 86400) * 86400
    b = ev.groupby(["event_type", "bucket_s"]).size().rename("actual").reset_index()
    for ty, grp in b.groupby("event_type"):
        med = float(np.median(grp["actual"]))  # np.median interpolates like quantile_cont at 0.5
        mad = float(np.median(np.abs(grp["actual"] - med)))
        sub = t[t["event_type"] == ty].set_index("bucket_s")
        assert len(sub) == len(grp)
        for _, row in grp.iterrows():
            got = sub.loc[row["bucket_s"]]
            assert got["actual"] == row["actual"]
            assert abs(got["typical"] - med) < 1e-9
            assert abs(got["spread"] - mad) < 1e-9
            want = abs(row["actual"] - med) / max(mad, 1.0)
            assert abs(got["anomaly_score"] - round(want, 6)) < 1e-6
    assert (t["anomaly_score"] >= 0).all()
    assert isinstance(t, pd.DataFrame)


def test_outlier_scores_lsh_vs_exact(ray_session):
    """LSH outlier path: per-vec features off the approximate graph agree
    with the exact scorer wherever the LSH graph recovered the true kNN
    (same distances => same features); coverage and bounds sanity."""
    from bitcoin_ledger_2es_ray.pipelines.ann import (
        knn_graph,
        knn_graph_lsh,
        outlier_scores,
        outlier_scores_lsh,
    )

    exact = outlier_scores(SF, k=5)
    approx = outlier_scores_lsh(SF, k=5)
    assert approx.num_rows > 0.9 * exact.num_rows  # near-total coverage
    # vectors whose approximate neighbour set equals the exact one must get
    # identical dist features (the feature math is shared)
    eg = knn_graph(SF, k=5)
    ag = knn_graph_lsh(SF, k=5)
    def edges(t):
        d = {}
        for v, n in zip(t["vec_id"].to_pylist(), t["nbr_id"].to_pylist()):
            d.setdefault(v, []).append(n)
        return d
    ee, aa = edges(eg), edges(ag)
    same = [v for v in aa if aa[v] == ee.get(v)]
    assert len(same) > 0
    ef = {v: (k_, a_) for v, k_, a_ in zip(
        exact["vec_id"].to_pylist(), exact["dist_kth"].to_pylist(), exact["dist_avg"].to_pylist())}
    af = {v: (k_, a_) for v, k_, a_ in zip(
        approx["vec_id"].to_pylist(), approx["dist_kth"].to_pylist(), approx["dist_avg"].to_pylist())}
    for v in same:
        assert af[v] == ef[v], v
    s = approx["outlier_score"].to_pylist()
    assert min(s) >= 0.0 and max(s) <= 1.0


def test_knn_int4_recall_vs_exact(ray_session):
    """int4 half-byte quantization: recall vs the exact scan holds at the
    larger oversample, and agreeing rows carry the EXACT cosine (rescore
    semantics, same contract as int8)."""
    from bitcoin_ledger_2es_ray.pipelines.ann import knn_bruteforce, knn_int4

    exact = knn_bruteforce(SF, n_queries=5, k=5)
    quant = knn_int4(SF, n_queries=5, k=5, oversample=8)
    ex = {}
    for q, v in zip(exact["query_id"].to_pylist(), exact["vec_id"].to_pylist()):
        ex.setdefault(q, set()).add(v)
    got = {}
    for q, v in zip(quant["query_id"].to_pylist(), quant["vec_id"].to_pylist()):
        got.setdefault(q, set()).add(v)
    hits = sum(len(ex[q] & got.get(q, set())) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.8, f"int4 recall {hits/total:.2f}"
    exact_sim = {
        (q, v): s
        for q, v, s in zip(
            exact["query_id"].to_pylist(), exact["vec_id"].to_pylist(),
            exact["sim"].to_pylist(),
        )
    }
    for q, v, s in zip(
        quant["query_id"].to_pylist(), quant["vec_id"].to_pylist(),
        quant["sim"].to_pylist(),
    ):
        if (q, v) in exact_sim:
            assert s == exact_sim[(q, v)], (q, v)


def test_pack_bpe_sequences_consistency(ray_session, built):
    """BPE packing: offsets are the exclusive prefix sum of the per-doc
    subword counts from bpe_tokenize_corpus, chunk ids floor-divide, and
    the whitespace packer is recovered when no merges apply."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.bpe import (
        bpe_tokenize_corpus,
        bpe_train,
        word_freq_from_dict,
    )
    from bitcoin_ledger_2es_ray.pipelines.curate import pack_bpe_sequences

    res, _, _ = built
    wf = word_freq_from_dict(res.out_dir)
    merges = bpe_train(wf, n_merges=15)
    packed = pack_bpe_sequences(SF, merges, budget=512).sort_by("doc_id")
    counts = bpe_tokenize_corpus(SF, merges, concurrency=2).sort_by("doc_id")
    assert packed["doc_id"].to_pylist() == counts["doc_id"].to_pylist()
    dl = np.asarray(counts["n_subwords"], dtype=np.int64)
    exp_off = np.concatenate(([0], np.cumsum(dl)[:-1]))
    assert packed["tok_offset"].to_pylist() == exp_off.tolist()
    assert packed["chunk_id"].to_pylist() == (exp_off // 512).tolist()


def test_ntile_matches_duckdb(ray_session):
    """_ntile mirrors SQL ntile(k) bucket sizing (first n%k buckets get
    ceil(n/k)) for every partition size 1..40 and k in {1,2,3,4,7}."""
    import duckdb

    from bitcoin_ledger_2es_ray.pipelines.textstats import _ntile

    for k in (1, 2, 3, 4, 7):
        for n in range(1, 41):
            ranks = np.arange(n, dtype=np.int64)
            got = _ntile(ranks, np.full(n, n, dtype=np.int64), k).tolist()
            want = [
                r[0]
                for r in duckdb.sql(
                    f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
                ).fetchall()
            ]
            assert got == want, (k, n)


def test_perplexity_buckets_and_sink(ray_session, built, tmp_path):
    """CCNet bucket split: per lang the bucket sizes follow ntile, bucket 1
    holds the highest-logprob docs, and the parquet sink round-trips."""
    import pyarrow.dataset as pads

    from bitcoin_ledger_2es_ray.pipelines.textstats import (
        perplexity_buckets,
        perplexity_buckets_to_parquet,
    )

    res, _, _ = built
    sf = "/root/testdata/sf0.001"
    t = perplexity_buckets(sf, res.out_dir)
    assert t.column_names == ["doc_id", "lang", "logprob", "bucket"]
    df = t.to_pandas()
    for lang, g in df.groupby("lang"):
        n = len(g)
        sizes = g["bucket"].value_counts().sort_index().tolist()
        base, rem = divmod(n, 3)
        want = [base + 1] * rem + [base] * (3 - rem)
        assert sizes == [w for w in want if w], (lang, sizes)
        # bucket 1 logprobs >= bucket 3 logprobs
        if 1 in set(g["bucket"]) and 3 in set(g["bucket"]):
            assert g[g["bucket"] == 1]["logprob"].min() >= g[
                g["bucket"] == 3
            ]["logprob"].max()
    out = perplexity_buckets_to_parquet(sf, res.out_dir, str(tmp_path / "pb"))
    back = pads.dataset(out).to_table().sort_by("doc_id")
    assert back.select(t.column_names).equals(t)
