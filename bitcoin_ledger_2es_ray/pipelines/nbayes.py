"""Distributed Naive-Bayes text-classifier TRAINING + inference — the
count-based quality/language classifier a web-scale curation stack trains
(fastText's supervised mode, CCNet's lang filters) expressed as pure
aggregation, so the whole thing is deterministic and SQL-gateable:

- ``nb_train``    one streamed pass of per-batch (lang, term, count) Arrow
                  hash-agg partials → a Ray ``groupby((lang, term))`` sum
                  (the term-dictionary shuffle envelope — the reduced table
                  is per-lang-vocab-sized, never corpus-sized) → Laplace-
                  smoothed log-likelihood weights.  Weights are INTEGER
                  micro-units (round(ln·1e6)) so every downstream sum is
                  order-exact across engines and cluster sizes.
- ``nb_predict``  the trained weights broadcast ONCE via ``ray.put`` (the
                  same vocabulary-sized small side every scorer broadcasts);
                  each doc batch scores all classes in one vectorized
                  gather + ``np.add.at`` accumulate — the doc stream never
                  shuffles.  Unseen (lang, term) pairs contribute the
                  lang's smoothed floor ln(1/(tokens_lang + V)), carried as
                  score = prior + dl·floor + Σ_present tf·(w − floor),
                  which is EXACTLY Σ tf·w with the dense smoothed matrix —
                  but only present pairs are ever stored (the scale-honest
                  sparse form; the DuckDB oracle mirrors the same identity).

Ties break (score DESC, lang ASC).  Class priors ln(n_docs_lang/n_docs)
come from a lang-column-only pruned scan (bytes read: one string column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MICRO = 1_000_000

__all__ = ["nb_train", "nb_predict", "nb_predict_ds", "nb_predict_to_parquet"]


def _micro(x) -> np.ndarray:
    """Half-AWAY-from-zero rounding of ``x * 1e6`` to int64 — bit-compatible
    with DuckDB's ``round(x * 1000000)`` (std::round), unlike np.round /
    Python round which are half-even (see functions/bm25.sql_round)."""
    scaled = np.asarray(x, dtype=np.float64) * MICRO
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


def _read_docs_lang(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (lang, term, c) Arrow hash aggregation."""
    words = pc.split_pattern(batch["text"].combine_chunks(), " ")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words)
    lang_flat = batch["lang"].combine_chunks().take(parent)
    t = pa.table({"lang": lang_flat, "term": flat})
    agg = t.group_by(["lang", "term"]).aggregate([("term", "count")])
    return pa.table(
        {
            "lang": agg["lang"],
            "term": agg["term"],
            "c": agg["term_count"].cast(pa.int64()),
        }
    )


def _lang_doc_counts(sf_dir: str) -> dict[str, int]:
    """Per-class doc counts from a lang-only pruned scan (tiny side)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("lang").aggregate([("lang", "count")])
        return pa.table(
            {"lang": agg["lang"], "n": agg["lang_count"].cast(pa.int64())}
        )

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ]
    )
    merged = parts.group_by("lang").aggregate([("n", "sum")])
    return dict(zip(merged["lang"].to_pylist(), merged["n_sum"].to_pylist()))


def _train_table(sf_dir: str) -> pa.Table:
    """Reduced (lang, term, c) counts via the distributed groupby."""
    import ray
    from ray.data.aggregate import Sum

    out = (
        _read_docs_lang(sf_dir)
        .map_batches(_pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "term"])
        .aggregate(Sum("c", alias_name="c"))
    )
    parts = [ray.get(r) for r in out.to_arrow_refs()]
    parts = [
        p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts
    ]
    return pa.concat_tables([p for p in parts if p.num_rows])


def nb_train(sf_dir: str) -> pa.Table:
    """(lang, term, c, w_micro) — Laplace-smoothed log-likelihood weights
    w = ln((c + 1)/(tokens_lang + V)) as integer micro-units, one row per
    PRESENT (class, term) pair (the sparse scale-honest form)."""
    pairs = _train_table(sf_dir)
    langs = np.asarray(pairs["lang"])
    c = np.asarray(pairs["c"], dtype=np.int64)
    tot = {
        l: int(n)
        for l, n in zip(
            *(lambda a: (a["lang"].to_pylist(), a["c_sum"].to_pylist()))(
                pairs.group_by("lang").aggregate([("c", "sum")])
            )
        )
    }
    v = pc.count_distinct(pairs["term"]).as_py()
    tot_arr = np.asarray([tot[l] for l in langs], dtype=np.float64)
    w_micro = _micro(np.log((c + 1.0) / (tot_arr + v)))
    return pa.table(
        {
            "lang": pairs["lang"],
            "term": pairs["term"],
            "c": pa.array(c),
            "w_micro": pa.array(w_micro),
        }
    ).sort_by([("lang", "ascending"), ("term", "ascending")])


MAX_DENSE_CELLS = 200_000_000  # langs × vocab ceiling: 1.6 GB of int64


def _model(sf_dir: str):
    """Dense broadcastable model: (langs sorted, vocab sorted, W, floors,
    priors) — all integer micro-units.

    The dense form is langs × vocab int64; ``MAX_DENSE_CELLS`` caps it at
    what one ``ray.put`` broadcast comfortably holds (~1.6 GB) and RAISES
    past that instead of silently OOMing — past the cap, prune the
    vocabulary (min-df) or score from the sparse table with a per-batch
    hash join; the guard and the kernel agree by construction."""
    trained = nb_train(sf_dir)
    langs = sorted(set(trained["lang"].to_pylist()))
    vocab = sorted(set(trained["term"].to_pylist()))
    v = len(vocab)
    if len(langs) * v > MAX_DENSE_CELLS:
        raise ValueError(
            f"nb_predict: dense model {len(langs)}×{v} exceeds "
            f"MAX_DENSE_CELLS={MAX_DENSE_CELLS}; prune the vocabulary "
            "(min-df) or score from the sparse nb_train table"
        )
    tot = {
        l: int(n)
        for l, n in zip(
            *(lambda a: (a["lang"].to_pylist(), a["c_sum"].to_pylist()))(
                trained.group_by("lang").aggregate([("c", "sum")])
            )
        )
    }
    floors = _micro(np.log([1.0 / (tot[l] + v) for l in langs]))
    li = {l: i for i, l in enumerate(langs)}
    ti = {t: i for i, t in enumerate(vocab)}
    w = np.tile(floors[:, None], (1, v))
    rows = np.asarray([li[l] for l in trained["lang"].to_pylist()])
    cols = np.asarray([ti[t] for t in trained["term"].to_pylist()])
    w[rows, cols] = np.asarray(trained["w_micro"], dtype=np.int64)
    nd = _lang_doc_counts(sf_dir)
    n_total = sum(nd.values())
    priors = _micro(np.log([nd.get(l, 0) / n_total for l in langs]))
    return langs, vocab, w, floors, priors


def nb_predict_ds(sf_dir: str):
    """Streaming inference: (doc_id, pred_lang, score_micro), model
    broadcast once, argmax ties to lang ASC (np.argmax = first max over the
    sorted class axis)."""
    import ray

    langs, vocab, w, floors, priors = _model(sf_dir)
    model_ref = ray.put(
        (np.asarray(langs, dtype=object), pa.array(vocab, type=pa.string()), w, floors, priors)
    )

    def score(batch: pa.Table) -> pa.Table:
        langs_a, vocab_a, w_m, fl, pr = ray.get(model_ref)
        words = pc.split_pattern(batch["text"].combine_chunks(), " ")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        dl = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(flat, value_set=vocab_a)
        n = batch.num_rows
        scores = pr[None, :] + dl[:, None] * fl[None, :]
        # pc.index_in yields nulls for OOV; masked positions carry the floor
        known = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        idx_i = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        diffs = (w_m[:, idx_i] - fl[:, None]).T * known[:, None]  # (flat, L)
        acc = np.zeros((n, len(langs_a)), dtype=np.int64)
        np.add.at(acc, parent, diffs)
        scores = scores + acc
        best = np.argmax(scores, axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pred_lang": pa.array(langs_a[best], type=pa.string()),
                "score_micro": pa.array(scores[np.arange(n), best], type=pa.int64()),
            }
        )

    return _read_docs_lang(sf_dir).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def nb_predict(sf_dir: str) -> pa.Table:
    import ray

    parts = [ray.get(r) for r in nb_predict_ds(sf_dir).to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts).sort_by("doc_id")


def nb_predict_to_parquet(sf_dir: str, out_dir: str) -> str:
    from .textstats import write_dataset

    return write_dataset(nb_predict_ds(sf_dir), out_dir)
