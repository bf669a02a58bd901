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

__all__ = [
    "nb_train",
    "nb_train_to_parquet",
    "nb_predict",
    "nb_predict_ds",
    "nb_predict_to_parquet",
]


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


def nb_train_to_parquet(sf_dir: str, out_dir: str) -> str:
    """Persist the trained model as a parquet artifact: ``weights``
    (lang, term, c, w_micro — the sparse present-pair table) and ``meta``
    (lang, n_docs — the class priors' side).  The production shape:
    train once → artifact → every predict run broadcasts the artifact,
    never re-deriving the shuffle."""
    import os

    import pyarrow.parquet as pq

    trained = nb_train(sf_dir)
    nd = _lang_doc_counts(sf_dir)
    os.makedirs(f"{out_dir}/weights", exist_ok=True)
    os.makedirs(f"{out_dir}/meta", exist_ok=True)
    pq.write_table(trained, f"{out_dir}/weights/part-0.parquet")
    langs = sorted(nd)
    pq.write_table(
        pa.table(
            {
                "lang": pa.array(langs, type=pa.string()),
                "n_docs": pa.array([nd[l] for l in langs], type=pa.int64()),
            }
        ),
        f"{out_dir}/meta/part-0.parquet",
    )
    return out_dir


def _load_artifact(model_dir: str) -> tuple[pa.Table, dict[str, int]]:
    import pyarrow.dataset as pads

    trained = pads.dataset(f"{model_dir}/weights").to_table()
    meta = pads.dataset(f"{model_dir}/meta").to_table()
    return trained, dict(
        zip(meta["lang"].to_pylist(), meta["n_docs"].to_pylist())
    )


def _model_parts(trained: pa.Table, nd: dict[str, int]):
    """Shared model derivation from the sparse trained table: (langs,
    vocab Arrow array, floors, priors, sparse CSC views) — all integer
    micro-units.  The CSC views (per-term entry ranges over lang-row /
    weight arrays) drive the sparse kernel; the dense matrix is built
    lazily only under MAX_DENSE_CELLS."""
    langs = sorted(set(trained["lang"].to_pylist()))
    vocab = sorted(set(trained["term"].to_pylist()))
    v = len(vocab)
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
    rows = np.asarray([li[l] for l in trained["lang"].to_pylist()])
    cols = np.asarray([ti[t] for t in trained["term"].to_pylist()])
    w_vals = np.asarray(trained["w_micro"], dtype=np.int64)
    n_total = sum(nd.values())
    priors = _micro(np.log([nd.get(l, 0) / n_total for l in langs]))
    # CSC: entries sorted by term index; starts[t]..starts[t+1] are the
    # present (lang_row, w) pairs of term t
    o = np.argsort(cols, kind="stable")
    ent_rows, ent_w = rows[o], w_vals[o]
    starts = np.searchsorted(cols[o], np.arange(v + 1))
    return langs, vocab, floors, priors, (starts, ent_rows, ent_w)


def _dense_w(
    floors: np.ndarray, v: int, csc: tuple[np.ndarray, np.ndarray, np.ndarray]
) -> np.ndarray:
    starts, ent_rows, ent_w = csc
    w = np.tile(floors[:, None], (1, v))
    cols = np.repeat(np.arange(v), np.diff(starts))
    w[ent_rows, cols] = ent_w
    return w


def nb_predict_ds(sf_dir: str, model_dir: str | None = None, sparse: bool | None = None):
    """Streaming inference: (doc_id, pred_lang, score_micro), model
    broadcast once, argmax ties to lang ASC (np.argmax = first max over the
    sorted class axis).

    ``model_dir`` scores from a persisted ``nb_train_to_parquet`` artifact
    (no training pass in the predict job); omitted, it trains in-process
    first (the test-scale convenience path).  ``sparse`` picks the kernel:
    None = auto (dense under MAX_DENSE_CELLS, else sparse).  The sparse
    kernel never materializes langs × vocab — per batch it expands only
    the PRESENT (lang, term) pairs of the batch's tokens via the CSC
    ranges (multi-arange gather + np.add.at), so a model past the dense
    broadcast cap still scores exactly; sparse ≡ dense is pytest-pinned."""
    import ray

    if model_dir is not None:
        trained, nd = _load_artifact(model_dir)
    else:
        trained, nd = nb_train(sf_dir), _lang_doc_counts(sf_dir)
    langs, vocab, floors, priors, csc = _model_parts(trained, nd)
    v = len(vocab)
    if sparse is None:
        sparse = len(langs) * v > MAX_DENSE_CELLS
    w_dense = None if sparse else _dense_w(floors, v, csc)
    model_ref = ray.put(
        (
            np.asarray(langs, dtype=object),
            pa.array(vocab, type=pa.string()),
            w_dense,
            csc,
            floors,
            priors,
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        langs_a, vocab_a, w_m, csc_m, fl, pr = ray.get(model_ref)
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
        acc = np.zeros((n, len(langs_a)), dtype=np.int64)
        if w_m is not None:
            diffs = (w_m[:, idx_i] - fl[:, None]).T * known[:, None]  # (flat, L)
            np.add.at(acc, parent, diffs)
        else:
            # sparse kernel: expand each known token to its term's present
            # (lang_row, w) entries only — multi-arange over CSC ranges
            starts, ent_rows, ent_w = csc_m
            kt = idx_i[known]
            kp = parent[known]
            lens = (starts[kt + 1] - starts[kt]).astype(np.int64)
            total = int(lens.sum())
            if total:
                ends = np.cumsum(lens)
                eidx = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(ends - lens, lens)
                    + np.repeat(starts[kt], lens)
                )
                rows_e = ent_rows[eidx]
                np.add.at(
                    acc,
                    (np.repeat(kp, lens), rows_e),
                    ent_w[eidx] - fl[rows_e],
                )
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


def nb_predict(
    sf_dir: str, model_dir: str | None = None, sparse: bool | None = None
) -> pa.Table:
    import ray

    parts = [
        ray.get(r)
        for r in nb_predict_ds(sf_dir, model_dir=model_dir, sparse=sparse).to_arrow_refs()
    ]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts).sort_by("doc_id")


def nb_predict_to_parquet(
    sf_dir: str, out_dir: str, model_dir: str | None = None
) -> str:
    from .textstats import write_dataset

    return write_dataset(nb_predict_ds(sf_dir, model_dir=model_dir), out_dir)
