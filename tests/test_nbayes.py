"""Distributed Naive-Bayes classifier (pipelines/nbayes.py): brute-force
dense recompute, sparse-identity check, tie rules, sink round-trip."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
MICRO = 1_000_000


def _round_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _brute_model():
    """Pure-Python reference: dense Laplace-smoothed micro-weight matrix."""
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    rows = list(
        zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist())
    )
    counts: Counter = Counter()
    for _, text, lang in rows:
        for w in text.split(" "):
            counts[(lang, w)] += 1
    langs = sorted({l for l, _ in counts})
    vocab = sorted({t for _, t in counts})
    v = len(vocab)
    tot = Counter()
    for (l, _), c in counts.items():
        tot[l] += c
    w = {
        (l, t): _round_away(math.log((c + 1.0) / (tot[l] + v)) * MICRO)
        for (l, t), c in counts.items()
    }
    floors = {l: _round_away(math.log(1.0 / (tot[l] + v)) * MICRO) for l in langs}
    nd = Counter(lang for _, _, lang in rows)
    n_total = sum(nd.values())
    priors = {l: _round_away(math.log(nd[l] / n_total) * MICRO) for l in langs}
    return rows, counts, langs, vocab, w, floors, priors


def test_nb_train_brute_force(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.nbayes import nb_train

    _, counts, _, _, w, _, _ = _brute_model()
    t = nb_train(SF)
    got = {
        (l, term): (c, wm)
        for l, term, c, wm in zip(
            t["lang"].to_pylist(),
            t["term"].to_pylist(),
            t["c"].to_pylist(),
            t["w_micro"].to_pylist(),
        )
    }
    assert set(got) == set(counts)
    for key, (c, wm) in got.items():
        assert c == counts[key]
        assert wm == w[key]
    # sorted (lang, term)
    keys = list(zip(t["lang"].to_pylist(), t["term"].to_pylist()))
    assert keys == sorted(keys)


def test_nb_predict_brute_force(ray_session):
    """Engine scores must equal the DENSE smoothed-matrix computation —
    the sparse present-pair identity the engine (and the SQL oracle) use."""
    from bitcoin_ledger_2es_ray.pipelines.nbayes import nb_predict

    rows, _, langs, vocab, w, floors, priors = _brute_model()
    t = nb_predict(SF)
    got = {
        d: (p, s)
        for d, p, s in zip(
            t["doc_id"].to_pylist(),
            t["pred_lang"].to_pylist(),
            t["score_micro"].to_pylist(),
        )
    }
    assert len(got) == len(rows)
    vset = set(vocab)
    for doc_id, text, _ in rows:
        tf = Counter(text.split(" "))
        scores = []
        for l in langs:
            # dense: every vocab term contributes w (or the floor if absent);
            # OOV terms (none on the training set itself) contribute the floor
            s = priors[l] + sum(
                tf[term] * w.get((l, term), floors[l]) if term in vset
                else tf[term] * floors[l]
                for term in tf
            )
            scores.append((s, l))
        # tie: score DESC, lang ASC
        top = max(s for s, _ in scores)
        pred = min(l for s, l in scores if s == top)
        assert got[doc_id] == (pred, top), doc_id


def test_nb_predict_sink_round_trip(ray_session, tmp_path):
    from bitcoin_ledger_2es_ray.pipelines.nbayes import nb_predict, nb_predict_to_parquet

    out = nb_predict_to_parquet(SF, str(tmp_path / "nb"))
    back = pq.read_table(out).sort_by("doc_id")
    direct = nb_predict(SF)
    assert back.select(direct.column_names).equals(direct)


def test_nb_predict_self_accuracy(ray_session):
    """Training-set self-prediction should beat the majority-class prior on
    this corpus (languages have disjoint-ish synthetic vocabularies)."""
    import pyarrow as pa

    from bitcoin_ledger_2es_ray.pipelines.nbayes import nb_predict

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    truth = dict(zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()))
    t = nb_predict(SF)
    hits = sum(
        truth[d] == p
        for d, p in zip(t["doc_id"].to_pylist(), t["pred_lang"].to_pylist())
    )
    majority = Counter(truth.values()).most_common(1)[0][1]
    assert hits / len(truth) >= majority / len(truth)
    assert isinstance(t, pa.Table)


def test_nb_sparse_equals_dense(ray_session, monkeypatch):
    """Past MAX_DENSE_CELLS the kernel switches to the sparse per-batch
    CSC expansion instead of raising (VERDICT r4 item 4) — and sparse
    predictions are bit-identical to dense."""
    from bitcoin_ledger_2es_ray.pipelines import nbayes

    dense = nbayes.nb_predict(SF, sparse=False)
    explicit_sparse = nbayes.nb_predict(SF, sparse=True)
    assert dense.equals(explicit_sparse)
    # auto mode picks sparse past the cap and still scores exactly
    monkeypatch.setattr(nbayes, "MAX_DENSE_CELLS", 10)
    auto = nbayes.nb_predict(SF)
    assert dense.equals(auto)


def test_nb_artifact_predict_never_trains(ray_session, tmp_path, monkeypatch):
    """nb_train_to_parquet persists the model; nb_predict(model_dir=...)
    loads the artifact and must NEVER call nb_train (VERDICT r4 item 4)."""
    from bitcoin_ledger_2es_ray.pipelines import nbayes

    direct = nbayes.nb_predict(SF)
    model_dir = nbayes.nb_train_to_parquet(SF, str(tmp_path / "model"))

    def boom(_sf):  # pragma: no cover - failure path
        raise AssertionError("nb_predict(model_dir=...) must not train")

    monkeypatch.setattr(nbayes, "nb_train", boom)
    from_artifact = nbayes.nb_predict(SF, model_dir=model_dir)
    assert direct.equals(from_artifact)
    # sparse-from-artifact agrees too
    assert direct.equals(nbayes.nb_predict(SF, model_dir=model_dir, sparse=True))
