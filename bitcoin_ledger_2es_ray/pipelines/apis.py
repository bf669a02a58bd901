"""Document-level ES REST-API analogs: ``_analyze`` and ``_termvectors``.

Elasticsearch exposes the analyzer chain (`POST /_analyze`) and per-document
term statistics (`GET /<index>/_termvectors/<id>`) as first-class APIs; the
graft's equivalents run the SAME tokenizer the index build uses, so what
``analyze`` returns is — by construction — exactly what was indexed.

- ``analyze_batch`` is a pure batch transform: (query_id, text) rows in →
  (query_id, pos, token) rows out, vectorized through the registered
  tokenizer (one Arrow call per batch, no per-row re-entry).  Distributable
  verbatim via ``map_batches``; the driver-gate helper ``analyze_texts``
  applies it to a small fixture table in-process.
- ``term_vectors`` re-analyzes the selected documents (ES's
  ``term_statistics=true`` path for non-stored vectors): the corpus read is
  row-filter pushed down to the selected doc_ids, tf comes from the
  re-analysis, df from the already-built term dictionary — no postings scan,
  no corpus-wide work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import get_tokenizer, term_counts


def analyze_batch(batch: pa.Table, tokenizer: str = "code") -> pa.Table:
    """(query_id, text) → (query_id, pos, token) token stream, ES ``_analyze``.

    Positions are the document-side positional semantics of the tokenizer
    (split parts share their source identifier's position, 0-based).
    """
    tok = get_tokenizer(tokenizer)
    terms, row_idx, _, pos = tok(
        batch["text"].combine_chunks()
        if isinstance(batch["text"], pa.ChunkedArray)
        else batch["text"],
        return_positions=True,
    )
    qids = np.asarray(batch["query_id"], dtype=np.uint64)[row_idx]
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.uint64()),
            "pos": pa.array(pos.astype(np.int64), type=pa.int64()),
            "token": terms,
        }
    )


def analyze_texts(
    queries: pa.Table, tokenizer: str = "code"
) -> pa.Table:
    """ES ``_analyze`` over a query table, sorted (query_id, pos, token)."""
    out = analyze_batch(queries, tokenizer)
    return out.sort_by(
        [("query_id", "ascending"), ("pos", "ascending"), ("token", "ascending")]
    )


def analyze_stemmed(sf_dir: str) -> pa.Table:
    """ES ``_analyze`` with an analyzer chain ``[whitespace, stemmer
    (minimal_english)]`` → (doc_id, pos, token), sorted.

    The test corpus is morphologically flat (no plural forms), so the doc
    stream is first INFLECTED deterministically — the token at position
    ``p`` of doc ``d`` gains suffix ``["", "s", "es", "ies"][(d + p) % 4]``
    — and the S-stemmer (``functions/stem.py``) then runs over the inflected
    stream.  Both steps are single vectorized Arrow passes per batch and the
    DuckDB oracle mirrors the suffix formula and the full rule table, so
    every stemmer rule class is exercised and value-hashed.  Output is
    corpus-token-sized: fine for the sf oracle gate; the Dataset half
    (everything before the driver sort) is the scale path."""
    import ray
    import ray.data as rd

    from ..functions.stem import s_stem
    from ..functions.tokenize import _flatten_list_array

    suffixes = pa.array(["", "s", "es", "ies"], type=pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        terms, row_idx, pos = _flatten_list_array(toks)
        d = np.asarray(batch["doc_id"], dtype=np.int64)[row_idx]
        suf = suffixes.take(pa.array((d + pos) % 4, type=pa.int64()))
        inflected = pc.binary_join_element_wise(terms.cast(pa.string()), suf, "")
        return pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
                "token": s_stem(inflected),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    return cat.sort_by([("doc_id", "ascending"), ("pos", "ascending")])


def term_vectors(
    store, corpus_path: str, doc_ids: list[int], tokenizer: str = "code"
) -> pa.Table:
    """ES ``_termvectors`` with ``term_statistics=true`` for a set of docs:
    (doc_id, term, tf, df) — tf by re-analysis of exactly the selected rows
    (parquet row filter pushdown), df from the term dictionary.
    """
    import os

    import pyarrow.parquet as pq

    wanted = sorted(set(int(d) for d in doc_ids))
    # the corpus carries no doc_id column — docIDs are row offsets (the
    # footer-offset scheme), so "row filter pushdown" here means row-GROUP
    # pruning: read only the groups whose offset range covers a wanted id
    if os.path.isdir(corpus_path):
        files = sorted(
            os.path.join(corpus_path, f)
            for f in os.listdir(corpus_path)
            if f.endswith(".parquet")
        )
    else:
        files = [corpus_path]
    chunks: list[pa.Table] = []
    base = 0
    remaining = list(wanted)
    for path in files:
        pf = pq.ParquetFile(path)
        off = base
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            local = [d - off for d in remaining if off <= d < off + n]
            if local:
                chunks.append(
                    pf.read_row_group(rg, columns=["content"]).take(
                        pa.array(local, type=pa.int64())
                    )
                )
            off += n
        base = off
    if sum(c.num_rows for c in chunks) != len(wanted):
        raise ValueError("doc_id out of range")
    sel = pa.concat_tables(chunks)
    tok = get_tokenizer(tokenizer)
    terms, row_idx, _ = tok(sel["content"].combine_chunks())
    posting = term_counts(
        terms, row_idx, np.asarray(wanted, dtype=np.uint64)
    )
    # pruned dictionary lookups — never materializes the vocabulary
    dfs = [int(store.td.df_of(t)) for t in posting["term"].to_pylist()]
    return pa.table(
        {
            "doc_id": posting["doc_id"].cast(pa.int64()),
            "term": posting["term"],
            "tf": posting["tf"].cast(pa.int64()),
            "df": pa.array(dfs, type=pa.int64()),
        }
    ).sort_by([("doc_id", "ascending"), ("term", "ascending")])


def field_caps(sf_dir: str, table: str = "documents") -> pa.Table:
    """ES ``_field_caps``: per field — the ES type, searchable and
    aggregatable flags.

    Type mapping is schema-driven (int → ``long``, float → ``double``,
    timestamp → ``date``) except strings, where ES's text-vs-keyword
    distinction is INFERRED from the data the way a mapping-less index
    template would: a string field whose values ever contain whitespace
    analyzes into multiple tokens → ``text`` (searchable, NOT
    aggregatable — no doc_values); single-token strings → ``keyword``.
    The inference is one streamed pass emitting a per-batch boolean
    partial per string column — the corpus never leaves the workers."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    str_cols = [
        f.name
        for f in schema
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)
    ]

    has_space: dict[str, bool] = dict.fromkeys(str_cols, False)
    if str_cols:

        def partial(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    c: pa.array(
                        [
                            bool(
                                pc.any(
                                    pc.match_substring(batch[c], " ")
                                ).as_py()
                                or False
                            )
                        ]
                    )
                    for c in str_cols
                }
            )

        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=str_cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        parts = [ray.get(r) for r in ds.to_arrow_refs()]
        parts = [
            p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts
        ]
        for p in parts:
            for c in str_cols:
                if p.num_rows and any(v for v in p[c].to_pylist()):
                    has_space[c] = True

    fields, types = [], []
    for f in schema:
        if pa.types.is_integer(f.type):
            es = "long"
        elif pa.types.is_floating(f.type):
            es = "double"
        elif pa.types.is_timestamp(f.type):
            es = "date"
        elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            es = "text" if has_space[f.name] else "keyword"
        elif pa.types.is_boolean(f.type):
            es = "boolean"
        else:
            es = "object"
        fields.append(f.name)
        types.append(es)
    return pa.table(
        {
            "field": pa.array(fields, type=pa.string()),
            "es_type": pa.array(types, type=pa.string()),
            "searchable": pa.array([True] * len(fields)),
            "aggregatable": pa.array([t != "text" for t in types]),
        }
    ).sort_by("field")


def runtime_field_sort(sf_dir: str, k: int = 20, round_decimals: int = 6) -> pa.Table:
    """ES runtime fields (``runtime_mappings`` + ``sort`` on the scripted
    field): ``chars_per_word = n_chars / word_count`` computed at query
    time from stored fields, top-k docs by (chars_per_word DESC, doc_id
    ASC).

    Per-batch: ONE vectorized split/length + divide, then a partial
    top-k (sort + head) — each batch ships at most k rows to the driver
    merge, never the corpus."""
    import ray
    import ray.data as rd

    from ..functions.bm25 import sql_round

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        nw = np.asarray(words, dtype=np.float64)
        nc = np.asarray(batch["n_chars"], dtype=np.float64)
        r = sql_round(nc / nw, round_decimals)
        d = np.asarray(batch["doc_id"], dtype=np.int64)
        order = np.lexsort((d, -r))[:k]
        return pa.table(
            {
                "doc_id": pa.array(d[order], type=pa.int64()),
                "chars_per_word": pa.array(r[order], type=pa.float64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    cat = pa.concat_tables([p for p in parts if p.num_rows])
    r = np.asarray(cat["chars_per_word"], dtype=np.float64)
    d = np.asarray(cat["doc_id"], dtype=np.int64)
    order = np.lexsort((d, -r))[:k]
    out = pa.table(
        {
            "doc_id": pa.array(d[order], type=pa.int64()),
            "chars_per_word": pa.array(r[order], type=pa.float64()),
        }
    )
    return out.append_column(
        "rank", pa.array(np.arange(1, len(order) + 1), type=pa.int64())
    )


def cat_segments(index_dir: str) -> pa.Table:
    """ES ``_cat/segments`` analog: per segment shard — term count,
    posting count (Σdf), compressed payload bytes, and file size.  Pure
    footer/metadata reads (parquet statistics + file sizes) — no posting
    decode, the same cheap introspection path `_cat` takes."""
    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for path in sorted(glob.glob(os.path.join(index_dir, "segments", "*.parquet"))):
        pf = pq.ParquetFile(path)
        n_terms = pf.metadata.num_rows
        t = pq.read_table(path, columns=["df", "doc_ids", "tfs", "dls"])
        n_postings = int(sum(t["df"].to_pylist()))
        payload = sum(
            sum(len(b) if b is not None else 0 for b in t[c].to_pylist())
            for c in ("doc_ids", "tfs", "dls")
        )
        rows.append(
            {
                "segment": os.path.basename(path),
                "n_terms": n_terms,
                "n_postings": n_postings,
                "payload_bytes": payload,
                "file_bytes": os.path.getsize(path),
            }
        )
    return pa.Table.from_pylist(rows).sort_by("segment")


def msearch(
    store,
    requests: list[dict],
    k: int = 10,
    round_decimals: int | None = 6,
) -> pa.Table:
    """ES ``_msearch``: heterogeneous search requests answered in one call.
    Each request dict is ``{"kind": "match"|"phrase"|"filter", ...}`` —
    ``match`` runs the BM25 taat kernel, ``phrase`` the positional phrase
    kernel, ``filter`` a constant-score term filter (score 1.0, ES
    ``constant_score`` semantics).  Output rows (slot, kind, rank, doc_id,
    score) in request order.

    The per-request kernels are the engine's existing vectorized paths;
    the API's job is multiplexing, exactly like ES's coordinating node
    (batch-scale fan-out stays with ``run_queries``' scorer pool)."""
    import numpy as np

    from .phrase import phrase_topk
    from .query import score_query

    slots, kinds, ranks, docs, scores = [], [], [], [], []
    for slot, req in enumerate(requests):
        kind = req["kind"]
        if kind == "match":
            hits = score_query(store, req["text"], k, round_decimals=round_decimals)
        elif kind == "phrase":
            hits = phrase_topk(store, req["text"], k, round_decimals=round_decimals)
        elif kind == "filter":
            d, _, _ = store.postings(req["term"])
            hits = [(int(x), 1.0) for x in np.sort(d)[:k]]
        else:
            raise ValueError(f"msearch: unknown request kind {kind!r}")
        for r, (d, s) in enumerate(hits, start=1):
            slots.append(slot)
            kinds.append(kind)
            ranks.append(r)
            docs.append(int(d))
            scores.append(float(s))
    import pyarrow as pa

    return pa.table(
        {
            "slot": pa.array(slots, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )


_TEMPLATE_VAR = None  # compiled lazily (module import stays light)


def render_template(template: str, params: dict[str, str]) -> str:
    """ES ``search_template`` (mustache subset): substitute ``{{name}}``
    placeholders; unknown placeholder → error, exactly like ES's render
    endpoint.  Values are plain terms (no nested templates)."""
    import re

    global _TEMPLATE_VAR
    if _TEMPLATE_VAR is None:
        _TEMPLATE_VAR = re.compile(r"\{\{\s*([a-zA-Z0-9_]+)\s*\}\}")

    def sub(m):
        name = m.group(1)
        if name not in params:
            raise KeyError(f"search_template: unbound parameter {{{{{name}}}}}")
        return str(params[name])

    return _TEMPLATE_VAR.sub(sub, template)


def search_template(
    store,
    template: str,
    params: dict[str, str],
    k: int = 10,
    round_decimals: int | None = 6,
) -> "pa.Table":
    """Render the template, then run the resulting match query through the
    standard BM25 kernel — (rank, doc_id, score)."""
    import pyarrow as pa

    from .query import score_query

    text = render_template(template, params)
    hits = score_query(store, text, k, round_decimals=round_decimals)
    return pa.table(
        {
            "rank": pa.array(range(1, len(hits) + 1), type=pa.int64()),
            "doc_id": pa.array([d for d, _ in hits], type=pa.int64()),
            "score": pa.array([s for _, s in hits], type=pa.float64()),
        }
    )


def validate_query(query_strings: list[str]) -> "pa.Table":
    """ES ``_validate/query``: static analysis without execution — each
    query string is tokenized by the WHITESPACE rule the oracle shares and
    checked against the engine's own rejection rules (empty query; leading
    wildcard, Lucene ``allow_leading_wildcard:false``).  Returns
    (query, valid, explanation); the explanation of a valid query reports
    its distinct-term count, so the result is data-derived on both sides."""
    import pyarrow as pa

    qs, valids, expls = [], [], []
    for q in query_strings:
        toks = [t for t in q.strip().split(" ") if t]
        if not toks:
            valid, expl = False, "error:empty"
        elif any(t.startswith("*") or t.startswith("?") for t in toks):
            valid, expl = False, "error:leading_wildcard"
        else:
            valid, expl = True, f"ok:{len(set(toks))}"
        qs.append(q)
        valids.append(valid)
        expls.append(expl)
    return pa.table(
        {
            "query": pa.array(qs, type=pa.string()),
            "valid": pa.array(valids, type=pa.bool_()),
            "explanation": pa.array(expls, type=pa.string()),
        }
    )


def exists_docs(index_dir: str, field: str, sentinel: str) -> "pa.Table":
    """ES ``exists`` query over a runtime nullable view of ``field``
    (``NULLIF(field, sentinel)`` — see ``field_presence_agg``): doc_ids
    whose field is non-null, with the predicate pushed into the parquet
    scan so only matching rows leave storage."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "forward_map"))
    t = ds.to_table(
        columns=["doc_id"], filter=pads.field(field) != sentinel
    )
    return pa.table({"doc_id": t["doc_id"].cast(pa.int64())}).sort_by("doc_id")


def terms_enum(
    store,
    string: str,
    size: int = 10,
    search_after: str | None = None,
    case_insensitive: bool = True,
) -> list[str]:
    """ES ``_terms_enum`` API: up to ``size`` indexed terms starting with
    ``string``, lexicographically ascending, resuming strictly AFTER the
    ``search_after`` cursor — the stateless pagination contract ES uses so
    autocomplete pages survive coordinator restarts.

    Rides the same footer-pruned dictionary range scan as the prefix query
    (TermDict.terms_with_prefix), so cost tracks the match count at any
    vocabulary size; the index is lowercased at tokenize time, so
    ``case_insensitive`` just folds the request string (ES's behavior on a
    lowercase-normalized field)."""
    from bisect import bisect_right

    if size < 1:
        raise ValueError("size must be >= 1")
    p = string.lower() if case_insensitive else string
    terms = store.td.terms_with_prefix(p)
    if search_after is not None:
        terms = terms[bisect_right(terms, search_after):]
    return terms[:size]


def disk_usage(index_dir: str) -> pa.Table:
    """ES ``_disk_usage`` API analog: per (artifact, column) compressed and
    uncompressed byte totals, straight off the parquet FOOTERS of every
    index artifact (segments, forward_map, term_dict, postings exchange if
    kept) — no data pages are read, the same analyze-only contract as ES.

    The per-field breakdown answers the sizing questions ES users run
    _disk_usage for: how much of the index is posting payloads vs terms vs
    metadata, and what a column costs before/after compression."""
    import glob
    import os

    import pyarrow.parquet as pq

    groups = {
        "segments": sorted(glob.glob(os.path.join(index_dir, "segments", "*.parquet"))),
        "forward_map": sorted(
            glob.glob(os.path.join(index_dir, "forward_map", "*.parquet"))
        ),
        "term_dict": [
            p
            for p in [os.path.join(index_dir, "term_dict.parquet")]
            if os.path.exists(p)
        ],
    }
    agg: dict[tuple[str, str], list[int]] = {}
    for artifact, paths in groups.items():
        for path in paths:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    e = agg.setdefault((artifact, name), [0, 0])
                    e[0] += col.total_compressed_size
                    e[1] += col.total_uncompressed_size
    rows = [
        {
            "artifact": a,
            "column": c,
            "compressed_bytes": comp,
            "uncompressed_bytes": unc,
        }
        for (a, c), (comp, unc) in sorted(agg.items())
    ]
    return pa.Table.from_pylist(rows)


def simulate_pipeline(
    sf_dir: str,
    processors: list[dict],
    columns: tuple[str, ...] = ("doc_id", "text", "lang"),
    table: str = "documents",
) -> "pa.Table":
    """ES ``_ingest/pipeline/_simulate``: run an ordered processor chain
    over the document stream and return the transformed docs — the
    try-before-you-ingest API.  Supported processors (each one vectorized
    Arrow, applied in list order exactly like ES):

    - ``{"type": "lowercase", "field": f}``
    - ``{"type": "uppercase", "field": f}``
    - ``{"type": "gsub", "field": f, "pattern": p, "replacement": r}``
      (RE2 semantics — the same engine the redaction pipeline uses)
    - ``{"type": "set", "field": f, "value": v}``  (constant column)
    - ``{"type": "trim", "field": f}``
    - ``{"type": "fingerprint", "fields": [f, ...], "target": t}``
      (sha256 hex of the '|'-joined fields — ES's fingerprint processor
      with its default separator)
    - ``{"type": "grok", "field": f, "pattern": p}`` / ``{"type":
      "dissect", ...}`` — the log-parsing processors, sharing the ES|QL
      compilers (patterns → RE2 named groups at registration, one
      ``extract_regex`` per batch; ``:int``/``:float`` grok conversions)
    - ``{"type": "rename", "field": f, "target": t}`` /
      ``{"type": "remove", "field": f}``
    - ``{"type": "convert", "field": f, "to": "integer"|"long"|"double"|
      "float"|"string"}`` (one Arrow cast; string→int parses like ES)
    - ``{"type": "date", "field": f, "pattern": javaPattern,
      "target": t}`` — the ES date processor, sharing ES|QL DATE_PARSE's
      Java→strptime translation
    - ``{"type": "kv", "field": f, "field_split": fs, "value_split": vs,
      "keys": [k, ...]}`` — key=value extraction into the NAMED keys
      (ES's kv discovers keys dynamically per doc; a fixed key list keeps
      the schema static, the invariant every stage here relies on); one
      ``extract_regex`` per key, absent keys null

    - ``{"type": "split", "field": f, "separator": s}`` (→ list column)
      / ``{"type": "join", "field": f, "separator": s}`` (list → string)
      / ``{"type": "append", "field": f, "value": v}`` (one vectorized
      list rebuild — +1 slot per row, no per-row Python)
      / ``{"type": "sort", "field": f, "order": "asc"|"desc"}`` (per-row
      list sort via one Arrow two-key sort_indices + offset rebuild)
    - ``{"type": "html_strip", "field": f}`` — tags stripped with one
      regex kernel, then the five basic entities decoded (&amp; LAST, so
      ``&amp;lt;`` decodes once to ``&lt;`` — single-pass semantics)
    - ``{"type": "bytes", "field": f}`` — "1.5kb" → 1536 (b/kb/mb/gb/
      tb/pb, case-insensitive); malformed → null (the conversion
      convention here; ES throws per doc)
    - ``{"type": "csv", "field": f, "target_fields": [...],
      "separator": ","}`` — positional split, short rows null-fill the
      trailing targets (ES semantics)
    - ``{"type": "uri_parts", "field": f}`` — scheme/user_info/domain/
      port/path/query/fragment via ONE extract_regex, flattened as
      ``url_*`` columns (the engine's schemas are flat; ES nests under
      ``url``)
    - ``{"type": "drop", "field": f, "equals": v}`` /
      ``{"type": "fail", "field": f, "equals": v}`` — ES takes a painless
      ``if`` script; the graft's condition is the field == value
      predicate (documented deviation).  drop removes matching rows,
      fail refuses the batch when any row matches.

    Unknown processor types raise up front (ES rejects the pipeline at
    registration, not per doc)."""
    import hashlib

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .esql import compile_dissect, compile_grok

    KNOWN = {
        "lowercase", "uppercase", "gsub", "set", "trim", "fingerprint",
        "grok", "dissect", "rename", "remove", "convert", "date", "kv",
        "split", "join", "append", "sort", "html_strip", "bytes", "csv",
        "uri_parts", "drop", "fail",
    }
    _CONVERT = {
        "integer": pa.int64(), "long": pa.int64(),
        "double": pa.float64(), "float": pa.float64(),
        "string": pa.string(),
    }
    compiled: dict[int, list[tuple[str, list[tuple[str, str]]]]] = {}
    for i, p in enumerate(processors):
        if p.get("type") == "grok":
            # ES grok options: "patterns" list (first match wins) and
            # custom "pattern_definitions".  The output schema is the
            # UNION of the alternatives' fields (fixed at registration —
            # the static-schema invariant): a field absent from the
            # matching alternative stays null, like ES
            patterns = p.get("patterns") or [p["pattern"]]
            defs = p.get("pattern_definitions")
            compiled[i] = [compile_grok(pt, defs) for pt in patterns]
            # a field typed differently across alternatives cannot
            # coalesce — refuse at registration like ES
            seen_types: dict[str, object] = {}
            for _, flds in compiled[i]:
                for name, typ in flds:
                    if seen_types.setdefault(name, typ) != typ:
                        raise ValueError(
                            f"grok field {name!r} has conflicting types "
                            "across pattern alternatives"
                        )
        elif p.get("type") == "dissect":
            compiled[i] = [compile_dissect(p["pattern"])]
    for p in processors:
        if p.get("type") not in KNOWN:
            raise ValueError(f"unknown processor type {p.get('type')!r}")
        if p["type"] == "kv" and len(p["field_split"]) != 1:
            # the value terminator compiles to a character class; RE2 has
            # no lookahead to express a multi-character boundary
            raise ValueError("kv field_split must be a single character")

    def apply(batch: pa.Table) -> pa.Table:
        cols = {name: batch[name].combine_chunks() for name in batch.column_names}
        for i, p in enumerate(processors):
            t = p["type"]
            if t in ("grok", "dissect"):
                # FIRST matching alternative wins per row (ES grok
                # "patterns"): later alternatives only apply to rows no
                # earlier one matched, even for fields the earlier one
                # does not extract
                acc: dict[str, object] = {}
                claimed = None  # rows matched by an earlier alternative
                for regex, fields in compiled[i]:
                    st = pc.extract_regex(cols[p["field"]], regex)
                    hit = pc.is_valid(st)
                    if claimed is not None:
                        st = pc.if_else(
                            claimed, pa.nulls(len(st), type=st.type), st
                        )
                    for name, typ in fields:
                        if isinstance(typ, tuple) and typ[0] == "cat":
                            parts = [pc.struct_field(st, g) for g in typ[1]]
                            v = pc.binary_join_element_wise(*parts, typ[2])
                        else:
                            v = pc.struct_field(st, name)
                        if typ == "int":
                            v = pc.cast(v, pa.int64())
                        elif typ == "float":
                            v = pc.cast(v, pa.float64())
                        acc[name] = (
                            v if name not in acc
                            else pc.coalesce(acc[name], v)
                        )
                    claimed = (
                        hit if claimed is None else pc.or_(claimed, hit)
                    )
                cols.update(acc)
                continue
            if t == "lowercase":
                cols[p["field"]] = pc.utf8_lower(cols[p["field"]])
            elif t == "uppercase":
                cols[p["field"]] = pc.utf8_upper(cols[p["field"]])
            elif t == "gsub":
                cols[p["field"]] = pc.replace_substring_regex(
                    cols[p["field"]], p["pattern"], p["replacement"]
                )
            elif t == "set":
                cols[p["field"]] = pa.array(
                    [p["value"]] * batch.num_rows, type=pa.string()
                )
            elif t == "trim":
                cols[p["field"]] = pc.utf8_trim_whitespace(cols[p["field"]])
            elif t == "rename":
                cols[p["target"]] = cols.pop(p["field"])
            elif t == "remove":
                del cols[p["field"]]
            elif t == "convert":
                cols[p["field"]] = pc.cast(
                    cols[p["field"]], _CONVERT[p["to"]]
                )
            elif t == "date":
                from .esql import java_to_strptime

                cols[p["target"]] = pc.strptime(
                    pc.cast(cols[p["field"]], pa.string()),
                    format=java_to_strptime(p["pattern"]),
                    unit="us",
                )
            elif t == "kv":
                import re as _re

                fs, vs = p["field_split"], p["value_split"]
                src = pc.cast(cols[p["field"]], pa.string())
                for key in p["keys"]:
                    rx = (
                        f"(?:^|{_re.escape(fs)}){_re.escape(key)}"
                        f"{_re.escape(vs)}(?P<v>[^{_re.escape(fs)}]*)"
                    )
                    st = pc.extract_regex(src, rx)
                    cols[key] = pc.struct_field(st, "v")
            elif t == "split":
                # the ES split processor's separator is a REGEX
                cols[p["field"]] = pc.split_pattern_regex(
                    pc.cast(cols[p["field"]], pa.string()), p["separator"]
                )
            elif t == "join":
                cols[p["field"]] = pc.binary_join(
                    cols[p["field"]], p["separator"]
                )
            elif t == "append":
                col = cols[p["field"]]
                if not pa.types.is_list(col.type):
                    raise ValueError("append needs a list field (use split)")
                lens = (
                    pc.list_value_length(col)
                    .fill_null(0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                flat = col.flatten()
                n_rows = len(col)
                total = int((lens + 1).sum())
                new_off = np.r_[0, np.cumsum(lens + 1)]
                par = np.repeat(np.arange(n_rows, dtype=np.int64), lens + 1)
                pos = np.arange(total, dtype=np.int64) - np.repeat(
                    new_off[:-1], lens + 1
                )
                is_app = pos == lens[par]
                if len(flat):
                    old_off = np.r_[0, np.cumsum(lens)][:-1]
                    take = pa.array(
                        np.where(is_app, 0, old_off[par] + pos),
                        type=pa.int64(),
                    )
                    vals = flat.take(take)
                    appended = pa.array([p["value"]] * total).cast(flat.type)
                    merged = pc.if_else(pa.array(is_app), appended, vals)
                else:
                    merged = pa.array([p["value"]] * total, type=pa.string())
                cols[p["field"]] = pa.ListArray.from_arrays(
                    pa.array(new_off.astype(np.int32)), merged
                )
            elif t == "sort":
                col = cols[p["field"]]
                if not pa.types.is_list(col.type):
                    raise ValueError("sort needs a list field (use split)")
                par = pc.list_parent_indices(col)
                flat = col.flatten()
                si = pc.sort_indices(
                    pa.table({"p": par, "v": flat}),
                    sort_keys=[
                        ("p", "ascending"),
                        ("v", "descending" if p.get("order") == "desc"
                         else "ascending"),
                    ],
                )
                lens = pc.list_value_length(col).fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                cols[p["field"]] = pa.ListArray.from_arrays(
                    pa.array(np.r_[0, np.cumsum(lens)].astype(np.int32)),
                    flat.take(si),
                )
            elif t == "html_strip":
                v = pc.replace_substring_regex(
                    pc.cast(cols[p["field"]], pa.string()), "<[^>]*>", ""
                )
                for ent, ch in (
                    ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
                ):
                    v = pc.replace_substring(v, ent, ch)
                cols[p["field"]] = v
            elif t == "bytes":
                st = pc.extract_regex(
                    pc.utf8_lower(pc.cast(cols[p["field"]], pa.string())),
                    pattern=r"^\s*(?P<n>\d+(?:\.\d+)?)\s*"
                            r"(?P<u>b|kb|mb|gb|tb|pb)\s*$",
                )
                num = pc.struct_field(st, "n").cast(pa.float64())
                fidx = pc.index_in(
                    pc.struct_field(st, "u"),
                    value_set=pa.array(["b", "kb", "mb", "gb", "tb", "pb"]),
                )
                factor = pc.take(
                    pa.array([1024.0 ** e for e in range(6)]), fidx
                )
                cols[p["field"]] = pc.round(pc.multiply(num, factor)).cast(
                    pa.int64()
                )
            elif t == "csv":
                lists = pc.split_pattern(
                    pc.cast(cols[p["field"]], pa.string()),
                    p.get("separator", ","),
                )
                lens = pc.list_value_length(lists).fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                flat = lists.flatten()
                offs = np.r_[0, np.cumsum(lens)][:-1]
                for i, name in enumerate(p["target_fields"]):
                    valid = lens > i
                    if len(flat):
                        take = pa.array(
                            np.where(valid, offs + i, 0),
                            type=pa.int64(),
                            mask=~valid,
                        )
                        cols[name] = flat.take(take)
                    else:
                        cols[name] = pa.nulls(len(lists), type=pa.string())
            elif t == "uri_parts":
                st = pc.extract_regex(
                    pc.cast(cols[p["field"]], pa.string()),
                    pattern=r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://"
                            r"(?:(?P<user_info>[^@/?#]*)@)?"
                            r"(?P<domain>[^:/?#]*)"
                            r"(?::(?P<port>\d+))?"
                            r"(?P<path>/[^?#]*)?"
                            r"(?:\?(?P<query>[^#]*))?"
                            r"(?:#(?P<fragment>.*))?$",
                )
                # optional regex groups extract as "" when absent —
                # collapse to null (absent and empty are the same here)
                def _opt(g: str):
                    v = pc.struct_field(st, g)
                    return pc.if_else(
                        pc.equal(v, ""), pa.nulls(len(v), pa.string()), v
                    )

                cols["url_scheme"] = pc.struct_field(st, "scheme")
                cols["url_domain"] = pc.struct_field(st, "domain")
                for g in ("user_info", "path", "query", "fragment"):
                    cols[f"url_{g}"] = _opt(g)
                cols["url_port"] = _opt("port").cast(pa.int64())
            elif t == "drop":
                eq = pc.fill_null(
                    pc.equal(cols[p["field"]], p["equals"]), False
                )
                keep = pc.invert(eq)
                t_ = pa.table(cols).filter(keep)
                cols = {
                    name: t_[name].combine_chunks()
                    for name in t_.column_names
                }
            elif t == "fail":
                eq = pc.fill_null(
                    pc.equal(cols[p["field"]], p["equals"]), False
                )
                if len(eq) and pc.any(eq).as_py():
                    raise ValueError(
                        f"fail processor tripped: {p['field']} == "
                        f"{p['equals']!r}"
                    )
            elif t == "fingerprint":
                joined = cols[p["fields"][0]].cast(pa.string())
                for f in p["fields"][1:]:
                    joined = pc.binary_join_element_wise(
                        joined, cols[f].cast(pa.string()), "|"
                    )
                cols[p["target"]] = pa.array(
                    [
                        hashlib.sha256(v.as_py().encode()).hexdigest()
                        for v in joined
                    ],
                    type=pa.string(),
                )
        return pa.table(cols)

    ds = rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=list(columns)
    ).map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
    parts = [ray.get(r) for r in ds.to_arrow_refs()]
    parts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts]
    parts = [p for p in parts if p.num_rows]
    return pa.concat_tables(parts).sort_by(columns[0])


def graph_explore(sf_dir: str, seed_ranks: tuple[int, ...] = (1, 7), size: int = 8) -> pa.Table:
    """ES x-pack ``_graph/explore`` (one hop): seed terms → the documents
    containing them → the strongest co-occurring vertex terms, plus the
    seed→vertex connections weighted by co-occurrence doc count →
    (seed, term, co_doc_count), sorted.

    Seeds are the vocabulary terms at the given sorted ranks (derived in
    BOTH engines, so the oracle needs no parameter plumbing).  Vertices
    keep the top ``size`` non-seed terms by foreground df (ties term ASC)
    — ES's default ``vertices.size`` cut with its doc-count significance.

    Two streamed passes, both with bounded combines: pass A collects the
    vocabulary (partials bounded by vocab); pass B emits, per batch, the
    foreground df partials of hit docs AND the (seed, term) co-occurrence
    partials — bounded by vocab × (n_seeds + 1), never doc count."""
    import ray
    import ray.data as rd

    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        u = np.unique(np.asarray(flat.flatten()))
        return pa.table({"term": pa.array(u, type=pa.string())})

    docs_path = f"{sf_dir}/documents.parquet"
    vds = rd.read_parquet(docs_path, columns=["text"]).map_batches(
        vocab_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    vparts = [ray.get(r) for r in vds.to_arrow_refs()]
    vparts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in vparts]
    vocab = sorted(
        set(pa.concat_tables([p for p in vparts if p.num_rows])["term"].to_pylist())
    )
    seeds = [vocab[r % len(vocab)] for r in seed_ranks]
    seeds_ref = ray.put(sorted(set(seeds)))

    def hop_partial(batch: pa.Table) -> pa.Table:
        sds = ray.get(seeds_ref)
        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lengths = pc.list_value_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(flat.flatten())
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lengths)
        # distinct (row, term) on integer keys: dictionary-encode the terms
        # once, then one int64 unique (no per-element string concat)
        tvals, tcodes = np.unique(terms, return_inverse=True)
        key = np.unique(rows * np.int64(len(tvals)) + tcodes)
        rows_d = key // len(tvals)
        terms_d = tvals[key % len(tvals)]
        is_seed = np.isin(terms_d, sds)
        hit_rows = np.unique(rows_d[is_seed])
        in_hit = np.isin(rows_d, hit_rows)
        rows_h, terms_h = rows_d[in_hit], terms_d[in_hit]
        # fg df partials over hit docs
        fg_u, fg_n = np.unique(terms_h, return_counts=True)
        # (seed, term) co-occurrence partials: for each seed, the terms of
        # the docs that contain THAT seed
        pair_seed, pair_term, pair_n = [], [], []
        for s in sds:
            s_rows = np.unique(rows_h[terms_h == s])
            m = np.isin(rows_h, s_rows)
            u, c = np.unique(terms_h[m], return_counts=True)
            pair_seed.extend([s] * len(u))
            pair_term.extend(u.tolist())
            pair_n.extend(c.tolist())
        return pa.table(
            {
                "seed": pa.array([""] * len(fg_u) + pair_seed, type=pa.string()),
                "term": pa.array(fg_u.tolist() + pair_term, type=pa.string()),
                "n": pa.array(fg_n.tolist() + pair_n, type=pa.int64()),
            }
        )

    hds = rd.read_parquet(docs_path, columns=["text"]).map_batches(
        hop_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    hparts = [ray.get(r) for r in hds.to_arrow_refs()]
    hparts = [p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in hparts]
    cat = pa.concat_tables([p for p in hparts if p.num_rows])
    g = (
        cat.group_by(["seed", "term"])
        .aggregate([("n", "sum")])
        .rename_columns(["seed", "term", "n"])
    )
    seed_col = np.asarray(g["seed"])
    term_col = np.asarray(g["term"])
    n_col = np.asarray(g["n"], dtype=np.int64)
    fg_mask = seed_col == ""
    fg_terms, fg_n = term_col[fg_mask], n_col[fg_mask]
    keep = ~np.isin(fg_terms, seeds)
    fg_terms, fg_n = fg_terms[keep], fg_n[keep]
    order = np.lexsort((fg_terms, -fg_n))[:size]
    kept = set(fg_terms[order].tolist())
    em = ~fg_mask & np.isin(term_col, list(kept))
    out = pa.table(
        {
            "seed": pa.array(seed_col[em], type=pa.string()),
            "term": pa.array(term_col[em], type=pa.string()),
            "co_doc_count": pa.array(n_col[em], type=pa.int64()),
        }
    )
    return out.sort_by([("seed", "ascending"), ("term", "ascending")])


def bulk_apply(sf_dir: str, round_decimals: int = 6) -> pa.Table:
    """ES ``_bulk`` op-type semantics with optimistic concurrency: replay a
    deterministic op log (events table: doc = ``user_id``, op =
    ``event_id % 4`` → index / create / update / delete, applied per doc in
    (ts, event_id) order) and return the surviving docs →
    (user_id, value, version, n_errors), sorted by doc.

    Semantics (ES's): ``index`` upserts unconditionally; ``create`` fails
    with version_conflict if the doc exists; ``update`` (scripted
    ``value += v``) fails with document_missing if it doesn't; ``delete``
    of a missing doc is not_found.  ``version`` counts successful ops on
    the doc across its whole history (bumped by deletes too, ES-style);
    ``n_errors`` counts the failures.

    The fold is recursion-free because ``create`` leaves the doc PRESENT
    whether it succeeds (absent→created) or conflicts (was already
    present) — so presence before any op is decided by the PREVIOUS
    index/create/delete op alone, and the whole replay vectorizes:
    one ``groupby(doc).map_groups`` (ES routes all ops for an id to one
    shard for exactly this reason), numpy accumulate/select in-group, no
    per-op Python.  Output is bounded by #docs; raw ops never leave their
    group."""
    import ray.data as rd

    from ..functions.bm25 import sql_round

    def replay(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, ts))
        eid, val = eid[order], val[order]
        op = eid % 4  # 0=index 1=create 2=update 3=delete
        n = len(op)
        idx = np.arange(n, dtype=np.int64)
        # index of the last definitive (index/create/delete) op at-or-before i
        last_def_incl = np.maximum.accumulate(np.where(op != 2, idx, -1))
        prev_def = np.r_[np.int64(-1), last_def_incl[:-1]]
        present_before = (prev_def >= 0) & (op[np.maximum(prev_def, 0)] <= 1)
        ok = np.select(
            [op == 0, op == 1], [np.ones(n, bool), ~present_before], present_before
        )
        last_def = last_def_incl[-1] if n else -1
        if last_def < 0 or op[last_def] > 1:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                    "version": pa.array([], type=pa.int64()),
                    "n_errors": pa.array([], type=pa.int64()),
                }
            )
        set_mask = (op == 0) | ((op == 1) & ok)
        last_set = int(np.flatnonzero(set_mask)[-1])
        value = float(
            val[last_set] + val[(op == 2) & ok & (idx > last_set)].sum()
        )
        return pa.table(
            {
                "user_id": pa.array(
                    [int(g["user_id"][0].as_py())], type=pa.int64()
                ),
                "value": pa.array(
                    [float(sql_round(value, round_decimals))],
                    type=pa.float64(),
                ),
                "version": pa.array([int(ok.sum())], type=pa.int64()),
                "n_errors": pa.array([int(n - ok.sum())], type=pa.int64()),
            }
        )

    import ray

    ds = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"],
        )
        .groupby("user_id")
        .map_groups(replay, batch_format="pyarrow")
    )
    parts = [p for p in (ray.get(r) for r in ds.to_arrow_refs()) if p.num_rows]
    if not parts:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.float64()),
                "version": pa.array([], type=pa.int64()),
                "n_errors": pa.array([], type=pa.int64()),
            }
        )
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "value": pc.cast(t["value"], pa.float64()),
            "version": t["version"].cast(pa.int64()),
            "n_errors": t["n_errors"].cast(pa.int64()),
        }
    ).sort_by("user_id")


def watcher_check(
    sf_dir: str,
    event_type: str = "error",
    threshold: int = 10,
    window_s: int = 86400,
) -> pa.Table:
    """ES Watcher (x-pack alerting), one deterministic evaluation: input =
    a date_histogram count of ``event_type`` events per window, condition
    = ``doc_count > threshold``, action = the alert row.  Returns EVERY
    bucket with its trigger flag (the watch history ES records), sorted by
    bucket → (bucket_s, doc_count, triggered).

    Same pre-aggregation shape as every date_histogram here: per-batch
    (bucket, n) partials, combine bounded by bucket count."""
    import ray.data as rd

    from ..functions.blocks import collect_tables

    def partial(batch: pa.Table) -> pa.Table:
        sec = np.asarray(batch["ts"].cast(pa.int64())) // 1_000_000
        et = np.asarray(batch["event_type"].combine_chunks().cast(pa.string()))
        b = (sec // window_s) * window_s
        t = pa.table(
            {
                "b": pa.array(b, type=pa.int64()),
                "n": pa.array((et == event_type).astype(np.int64)),
            }
        )
        g = t.group_by("b").aggregate([("n", "sum")])
        return g.rename_columns(["b", "n"])

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cat = pa.concat_tables(collect_tables(ds, on_empty="watcher: no events"))
    g = cat.group_by("b").aggregate([("n", "sum")]).sort_by("b")
    n = np.asarray(g["n_sum"], dtype=np.int64)
    return pa.table(
        {
            "bucket_s": g["b"].cast(pa.int64()),
            "doc_count": pa.array(n, type=pa.int64()),
            "triggered": pa.array(n > threshold),
        }
    )


def count_docs(store, query_terms: list[list[str]]) -> pa.Table:
    """ES ``_count`` API: per query, the NUMBER of docs matching the
    conjunction of its terms — the hits themselves never materialize past
    the per-query intersection, which is the whole point of the endpoint
    (ES skips the fetch phase and scoring entirely for ``_count``).

    → (query_id, count), one row per query in input order.  Each term's
    postings come off the footer-pruned dictionary lookup; the AND is the
    shared vectorized ``intersect_many`` kernel, smallest list first.  At
    serving scale this runs inside the routed scorer actors exactly like
    the boolean queries — per-segment counts SUM across doc-disjoint
    slices, so the distributed count is the sum of per-actor counts with
    no merge state."""
    from ..functions.boolean import intersect_many

    counts = []
    for terms in query_terms:
        sets = [np.sort(store.postings(t)[0]) for t in sorted(set(terms))]
        counts.append(int(len(intersect_many(sets))) if sets else 0)
    return pa.table(
        {
            "query_id": pa.array(range(len(query_terms)), type=pa.int64()),
            "count": pa.array(counts, type=pa.int64()),
        }
    )
