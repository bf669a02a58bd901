"""Multi-field search (ES ``multi_match``): a second inverted index per
searchable FIELD, query-time score combination across fields.

Elasticsearch analyzes every mapped text field into its own Lucene
inverted structure (own df/avgdl/postings) inside the same index; the
graft's analog keeps one index DIRECTORY per field, built by the standard
build pipeline over a field-swapped view of the corpus:

- ``derive_field_corpus``  rewrite the corpus with ``content := <field>``
  (same files, same row order → the footer-offset docIDs align across
  fields by construction, which is what makes query-time combination a
  pure per-doc score sum).  One Ray task per input file, each writing the
  same-named output file — streams at corpus scale, nothing driver-sized.
- ``multi_match_topk``     per-field BM25 score surfaces (each field's own
  df/avgdl — exactly ES per-field analysis) combined as
  ``most_fields`` (Σ boost_f · score_f, ES's sum semantics) or
  ``best_fields`` (dis_max: best field wins + tie_breaker · rest).

The fixture's ``path`` field (``src/<source>/file_<id>.py``) tokenizes
under the code tokenizer into compounds + split parts, so the DuckDB
oracle can enumerate the token multiset exactly (__ray_entry__).
"""

from __future__ import annotations

import os

import numpy as np

from .query import SegmentStore
from .structured import _score_map

_FIELD_COLS = ("repo", "path", "commit", "lang")


def derive_field_corpus(corpus: str, field: str, out_dir: str) -> str:
    """Field-swapped corpus: same layout, ``content``/``sha256`` replaced by
    the field's text.  ``corpus`` may be a file or a directory of parts;
    every input file maps to ONE same-named output file (row order and
    file-name order preserved ⇒ identical docIDs).  Cached: existing
    outputs are kept.  Parallel Ray tasks per file at many-file scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..schemas import CORPUS_WITH_SHA

    if field not in _FIELD_COLS:
        raise ValueError(f"field must be one of {_FIELD_COLS}, got {field!r}")

    def _swap_file(src: str, dst: str) -> None:
        from ..functions.hashing import sha256_column

        t = pq.read_table(src)
        text = t[field].cast(pa.string())
        out = pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "lang": t["lang"],
                "content": text,
                "sha256": sha256_column(text).cast(pa.binary(32)),
            },
            schema=CORPUS_WITH_SHA,
        )
        tmp = f"{dst}.tmp.{os.getpid()}"
        pq.write_table(out, tmp, row_group_size=512)
        os.replace(tmp, dst)

    if os.path.isdir(corpus):
        names = sorted(
            f for f in os.listdir(corpus) if f.endswith(".parquet")
        )
        pairs = [(os.path.join(corpus, f), os.path.join(out_dir, f)) for f in names]
    else:
        pairs = [(corpus, os.path.join(out_dir, os.path.basename(corpus)))]
    os.makedirs(out_dir, exist_ok=True)
    todo = [(s, d) for s, d in pairs if not os.path.exists(d)]
    if len(todo) > 8:
        import ray

        swap = ray.remote(num_cpus=1)(_swap_file)
        ray.get([swap.remote(s, d) for s, d in todo])
    else:
        for s, d in todo:
            _swap_file(s, d)
    return out_dir


def derive_masked_corpus(corpus: str, out_dir: str) -> str:
    """Position-aligned alternate analysis of ``content`` (the
    field_masking_span fixture): every whitespace token reversed IN PLACE,
    so token i of the masked field sits at exactly position i of the text
    field — the alignment ES's ``field_masking_span`` exploits when one
    field is the same text under a different analyzer (stemmed vs exact).

    All-Arrow rewrite: split → ``utf8_reverse`` on the flattened values →
    rebuild the list on the same offsets → join.  Same file layout and row
    order as the input ⇒ identical footer-offset docIDs."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..schemas import CORPUS_WITH_SHA

    def _mask_file(src: str, dst: str) -> None:
        from ..functions.hashing import sha256_column

        t = pq.read_table(src)
        ls = pc.split_pattern(t["content"].cast(pa.string()), " ").combine_chunks()
        rev = pc.utf8_reverse(ls.values)
        masked = pc.binary_join(
            pa.ListArray.from_arrays(ls.offsets, rev), " "
        )
        out = pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "lang": t["lang"],
                "content": masked,
                "sha256": sha256_column(masked).cast(pa.binary(32)),
            },
            schema=CORPUS_WITH_SHA,
        )
        tmp = f"{dst}.tmp.{os.getpid()}"
        pq.write_table(out, tmp, row_group_size=512)
        os.replace(tmp, dst)

    if os.path.isdir(corpus):
        names = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
        pairs = [(os.path.join(corpus, f), os.path.join(out_dir, f)) for f in names]
    else:
        pairs = [(corpus, os.path.join(out_dir, os.path.basename(corpus)))]
    os.makedirs(out_dir, exist_ok=True)
    todo = [(s, d) for s, d in pairs if not os.path.exists(d)]
    if len(todo) > 8:
        import ray

        mask = ray.remote(num_cpus=1)(_mask_file)
        ray.get([mask.remote(s, d) for s, d in todo])
    else:
        for s, d in todo:
            _mask_file(s, d)
    return out_dir


def build_field_index(corpus: str, field: str, root: str, **cfg_kw):
    """Derive the field corpus and build its index under ``root`` —
    resumable like any build (the manifest is the checkpoint)."""
    from .build import BuildConfig, build_index

    fc = derive_field_corpus(corpus, field, os.path.join(root, f"corpus_{field}"))
    cfg = BuildConfig(corpus=fc, out_dir=os.path.join(root, f"idx_{field}"), **cfg_kw)
    return build_index(cfg)


def multi_match_topk(
    legs: list[tuple[SegmentStore, float]],
    text: str,
    k: int,
    mode: str = "most_fields",
    tie_breaker: float = 0.0,
    round_decimals: int | None = None,
) -> list[tuple[int, float]]:
    """ES ``multi_match`` over ``legs = [(field_store, boost)]``:

    - ``most_fields``: score = Σ_f boost_f · BM25_f(doc) — fields vote
      together (ES sums the per-field query scores).
    - ``best_fields``: dis_max across fields — the best field's boosted
      score + tie_breaker · the rest.

    Each leg scores with its OWN corpus stats (df/avgdl of that field's
    index — per-field analysis, ES-exactly); docIDs align by construction
    (``derive_field_corpus``).  Ranked on the rounded combined score,
    ties doc ASC."""
    from ..functions.bm25 import sql_round
    from .query import topk_order

    if mode == "cross_fields":
        return _cross_fields_topk(legs, text, k, round_decimals)
    doc_parts, score_parts = [], []
    for store, boost in legs:
        d, s = _score_map(store, text)
        if len(d):
            doc_parts.append(d)
            score_parts.append(boost * s)
    if not doc_parts:
        return []
    docs = np.concatenate(doc_parts)
    scores = np.concatenate(score_parts)
    uniq, inv = np.unique(docs, return_inverse=True)
    if mode == "most_fields":
        final = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(final, inv, scores)
    elif mode == "best_fields":
        mx = np.zeros(len(uniq), dtype=np.float64)
        np.maximum.at(mx, inv, scores)
        sm = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sm, inv, scores)
        final = mx + tie_breaker * (sm - mx)
    else:
        raise ValueError(f"unknown multi_match mode {mode!r}")
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def _cross_fields_topk(
    legs: list[tuple[SegmentStore, float]],
    text: str,
    k: int,
    round_decimals: int | None,
) -> list[tuple[int, float]]:
    """``cross_fields``: TERM-centric — each query term contributes the
    best (boosted) per-field BM25 contribution for a doc, and the per-term
    maxima sum across terms:

        score(d) = Σ_t max_f boost_f · contrib_{f,t}(d)

    This is Lucene's blended-term shape with max blending: a term that
    lives in any one field counts once at its strongest field, so an
    entity split across fields ("first name" in one, "last name" in
    another) matches as if the fields were one.  (ES additionally blends
    df across fields; the max form is deterministic and documented.)"""
    from ..functions.bm25 import idf, sql_round, tf_norm
    from .query import tokenize_query, topk_order

    terms = sorted(set(tokenize_query(text)))
    acc_docs: list[np.ndarray] = []
    acc_scores: list[np.ndarray] = []
    for t in terms:
        doc_parts, contrib_parts = [], []
        for store, boost in legs:
            df_t = store.td.df_of(t)
            if df_t == 0:
                continue
            d, tf, dl = store.postings(t)
            if len(d) == 0:
                continue
            doc_parts.append(d)
            contrib_parts.append(
                boost * float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
            )
        if not doc_parts:
            continue
        docs = np.concatenate(doc_parts)
        contribs = np.concatenate(contrib_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        mx = np.zeros(len(uniq), dtype=np.float64)
        np.maximum.at(mx, inv, contribs)
        acc_docs.append(uniq)
        acc_scores.append(mx)
    if not acc_docs:
        return []
    docs = np.concatenate(acc_docs)
    uniq, inv = np.unique(docs, return_inverse=True)
    final = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(final, inv, np.concatenate(acc_scores))
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]


def combined_dl(
    legs: list[tuple[SegmentStore, float]],
) -> tuple[np.ndarray, np.ndarray, float]:
    """(sorted doc_ids, combined weighted dl', avgdl') for a BM25F leg
    set — term- and query-independent, compute ONCE per leg list."""
    import pyarrow.dataset as pads

    dl_ids: np.ndarray | None = None
    dl_comb: np.ndarray | None = None
    for store, w in legs:
        fm = (
            pads.dataset(os.path.join(store.index_dir, "forward_map"))
            .to_table(columns=["doc_id", "dl"])
            .sort_by("doc_id")
        )
        ids = np.asarray(fm["doc_id"]).astype(np.int64)
        dl = np.asarray(fm["dl"], dtype=np.float64) * w
        if dl_ids is None:
            dl_ids, dl_comb = ids, dl
        else:
            if not np.array_equal(dl_ids, ids):
                raise ValueError("combined_fields legs index different doc sets")
            dl_comb = dl_comb + dl
    if dl_ids is None or len(dl_ids) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.float64), 0.0
    return dl_ids, dl_comb, float(np.mean(dl_comb))


def combined_fields_topk(
    legs: list[tuple[SegmentStore, float]],
    text: str,
    k: int,
    round_decimals: int | None = None,
    dl_cache: tuple[np.ndarray, np.ndarray, float] | None = None,
) -> list[tuple[int, float]]:
    """ES ``combined_fields`` query (Lucene ``CombinedFieldQuery``, the
    principled BM25F): score the fields as if merged into ONE field —

        tf'(t,d)  = Σ_f w_f · tf_f(t,d)
        dl'(d)    = Σ_f w_f · dl_f(d)
        df'(t)    = max_f df_f(t)      (Lucene's merged docFreq)
        avgdl'    = mean_d dl'(d)

    then standard BM25 over the pseudo-field.  docIDs align across legs by
    construction (``derive_field_corpus``).

    The dl' doc-values vector comes from the legs' forward maps (one
    two-column read per field — query-INDEPENDENT, so batch callers
    compute it once via ``combined_dl`` and pass ``dl_cache``; at corpus
    scale this gather runs inside the scorer partition restricted to
    candidates, like every doc-values lookup in this repo)."""
    from ..functions.bm25 import idf, sql_round, tf_norm
    from .query import tokenize_query, topk_order

    if dl_cache is None:
        dl_cache = combined_dl(legs)
    dl_ids, dl_comb, avgdl = dl_cache
    if len(dl_ids) == 0:
        return []
    n_docs = len(dl_ids)

    terms = sorted(set(tokenize_query(text)))
    acc_docs, acc_scores = [], []
    for t in terms:
        doc_parts, tf_parts = [], []
        df_t = 0
        for store, w in legs:
            df_f = store.td.df_of(t)
            df_t = max(df_t, df_f)
            if df_f == 0:
                continue
            d, tf, _ = store.postings(t)
            if len(d):
                doc_parts.append(d.astype(np.int64))
                tf_parts.append(w * tf.astype(np.float64))
        if not doc_parts:
            continue
        docs = np.concatenate(doc_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        tfc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tfc, inv, np.concatenate(tf_parts))
        dli = dl_comb[np.searchsorted(dl_ids, uniq)]
        acc_docs.append(uniq)
        acc_scores.append(float(idf(n_docs, df_t)) * tf_norm(tfc, dli, avgdl))
    if not acc_docs:
        return []
    docs = np.concatenate(acc_docs)
    uniq, inv = np.unique(docs, return_inverse=True)
    final = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(final, inv, np.concatenate(acc_scores))
    if round_decimals is not None:
        final = sql_round(final, round_decimals)
    order = topk_order(final, uniq, k)
    return [(int(uniq[i]), float(final[i])) for i in order]
