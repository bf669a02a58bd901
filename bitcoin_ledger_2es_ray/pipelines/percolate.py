"""Percolator (ES ``percolate`` query): REVERSE search — queries are
registered, documents stream in, and each doc reports which registered
queries it matches.

Elasticsearch indexes the registered queries and percolates each incoming
doc against them (alerting / saved-search / routing workloads).  The graft
keeps the same inversion with Ray Data machinery:

- the registered query set (query_id → distinct terms) is tiny next to
  the doc stream → broadcast once via ``ray.put`` as a (query_id, term)
  table + per-query term counts;
- documents stream through ``map_batches``; each batch tokenizes with the
  standard code tokenizer, inner-joins its distinct (doc, term) pairs
  against the broadcast query terms, and a doc matches query q iff the
  join recovers ALL of q's terms (count-distinct == nt — conjunctive
  percolation, the ES default for term queries);
- output is the (doc_id, query_id) match pairs — one partial table per
  batch, nothing corpus-sized on the driver until the caller collects.

The result set equals ``boolean_and`` transposed, which is exactly what
makes it oracle-checkable — but the PLAN is the reverse direction: the
doc stream never touches the inverted index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize_flat
from .query import tokenize_query


def compile_queries(queries: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(query_id, term) pairs + (query_id, nt) counts from a
    (query_id, text) table — the broadcastable registration state."""
    qids, terms = [], []
    for qid, text in zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()):
        for t in sorted(set(tokenize_query(text))):
            qids.append(qid)
            terms.append(t)
    pairs = pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
        }
    )
    nt = pairs.group_by("query_id").aggregate([("term", "count")])
    nt = nt.select(["query_id", "term_count"]).rename_columns(["query_id", "nt"])
    return pairs, nt


def percolate(sf_dir: str, queries: pa.Table) -> pa.Table:
    """(doc_id, query_id) for every registered query whose terms ALL occur
    in the doc — the doc stream percolates against the broadcast query
    set; see module docstring for the plan."""
    import ray
    import ray.data as rd

    pairs, nt = compile_queries(queries)
    pairs_ref = ray.put(pairs)
    nt_ref = ray.put(nt)

    def match_batch(batch: pa.Table) -> pa.Table:
        terms, doc_idx, _ = tokenize_flat(batch["text"])
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[doc_idx]
        dt = pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "term": terms,
            }
        ).group_by(["doc_id", "term"]).aggregate([])  # distinct (doc, term)
        j = dt.join(ray.get(pairs_ref), keys="term", join_type="inner")
        if j.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "query_id": pa.array([], type=pa.int64()),
                }
            )
        g = j.group_by(["doc_id", "query_id"]).aggregate([("term", "count")])
        full = g.join(ray.get(nt_ref), keys="query_id", join_type="inner")
        keep = pa.compute.equal(full["term_count"], full["nt"])
        out = full.filter(keep)
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "query_id": out["query_id"].cast(pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(match_batch, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending"), ("query_id", "ascending")]
    )


def percolate_phrases(sf_dir: str, phrases: pa.Table) -> pa.Table:
    """Percolator over ``match_phrase`` queries: (doc_id, query_id) for
    every registered PHRASE occurring contiguously in the doc.

    ES percolation accepts any query, positional ones included; the graft
    runs the same phrase-key kernel the forward (index-side) phrase query
    uses — ``(doc << 25) | (pos − j)`` candidate-start sets per
    (term, offset) requirement, intersected smallest-first — but over the
    BATCH's freshly tokenized positions instead of the positional index,
    so the doc stream still never touches an index.  Phrase set broadcast
    once; per-batch work is vectorized per registered phrase (#phrases ≪
    stream, the percolator's standing assumption)."""
    import ray
    import ray.data as rd

    compiled = []
    for qid, text in zip(phrases["query_id"].to_pylist(), phrases["text"].to_pylist()):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            raise ValueError(f"empty phrase for query {qid}")
        compiled.append((int(qid), toks))
    comp_ref = ray.put(compiled)
    SHIFT = 25

    def match_batch(batch: pa.Table) -> pa.Table:
        terms, doc_idx, _dl, pos = tokenize_flat(batch["text"], return_positions=True)
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[doc_idx]
        pos = np.asarray(pos, dtype=np.int64)
        term_np = np.asarray(terms)
        out_d, out_q = [], []
        for qid, toks in ray.get(comp_ref):
            keysets = []
            ok = True
            for j, t in enumerate(toks):
                occ = term_np == t.lower()
                if not occ.any():
                    ok = False
                    break
                start = pos[occ] - j
                good = start >= 0
                keys = (doc_ids[occ][good] << SHIFT) | start[good]
                if len(keys) == 0:
                    ok = False
                    break
                keysets.append(np.unique(keys))
            if not ok:
                continue
            keysets.sort(key=len)
            cur = keysets[0]
            for ks in keysets[1:]:
                cur = cur[np.isin(cur, ks, assume_unique=True)]
                if len(cur) == 0:
                    break
            if len(cur) == 0:
                continue
            for d in np.unique(cur >> SHIFT):
                out_d.append(int(d))
                out_q.append(qid)
        return pa.table(
            {
                "doc_id": pa.array(out_d, type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(match_batch, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending"), ("query_id", "ascending")]
    )


def percolate_bool(sf_dir: str, queries: pa.Table) -> pa.Table:
    """Bool-query percolation: registered queries carry ``must`` AND
    ``must_not`` term lists — a doc matches iff it contains EVERY must
    term and NONE of the must_not terms (ES percolates the full query
    DSL; this is the bool extension of the conjunctive kernel).

    Registration state: (query_id, term, neg) pairs + per-query must
    counts, broadcast once.  Per batch: distinct (doc, term) joins the
    pairs; per (doc, query) the positive hits must equal n_must and the
    negative hits must be zero — one Arrow hash-agg, no per-row Python.

    ``queries`` columns: query_id, text (must terms), neg_text (must_not
    terms, space-separated, may be empty)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    qids, terms, negs = [], [], []
    n_must: dict[int, int] = {}
    for qid, text, neg_text in zip(
        queries["query_id"].to_pylist(),
        queries["text"].to_pylist(),
        queries["neg_text"].to_pylist(),
    ):
        must = sorted(set(tokenize_query(text)))
        must_not = sorted(set(tokenize_query(neg_text or "")) - set(must))
        n_must[int(qid)] = len(must)
        for t in must:
            qids.append(int(qid))
            terms.append(t)
            negs.append(0)
        for t in must_not:
            qids.append(int(qid))
            terms.append(t)
            negs.append(1)
    pairs = pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            "neg": pa.array(negs, type=pa.int64()),
        }
    )
    nt = pa.table(
        {
            "query_id": pa.array(sorted(n_must), type=pa.int64()),
            "n_must": pa.array(
                [n_must[q] for q in sorted(n_must)], type=pa.int64()
            ),
        }
    )
    pairs_ref = ray.put(pairs)
    nt_ref = ray.put(nt)

    def match_batch(batch: pa.Table) -> pa.Table:
        terms_f, doc_idx, _ = tokenize_flat(batch["text"])
        doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[doc_idx]
        dt = (
            pa.table({"doc_id": pa.array(doc_ids), "term": terms_f})
            .group_by(["doc_id", "term"])
            .aggregate([])
        )
        j = dt.join(ray.get(pairs_ref), keys="term", join_type="inner")
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
        if j.num_rows == 0:
            return empty
        j = j.append_column(
            "pos", pc.subtract(pa.scalar(1), j["neg"]).cast(pa.int64())
        )
        g = j.group_by(["doc_id", "query_id"]).aggregate(
            [("pos", "sum"), ("neg", "sum")]
        )
        full = g.join(ray.get(nt_ref), keys="query_id", join_type="inner")
        keep = pc.and_(
            pc.equal(full["pos_sum"], full["n_must"]),
            pc.equal(full["neg_sum"], 0),
        )
        out = full.filter(keep)
        if out.num_rows == 0:
            return empty
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "query_id": out["query_id"].cast(pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(match_batch, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "query_id": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts).sort_by(
        [("doc_id", "ascending"), ("query_id", "ascending")]
    )
