"""Code-aware tokenizer (SURVEY.md §2.2 M3–M5), fully vectorized.

Semantics (normative — the exact oracle, the DuckDB SQL oracle and the engine
all rely on this definition):

1. *Identifiers* are maximal runs of ``[A-Za-z0-9_]`` in ``content``.
2. The *compound* token of an identifier is the identifier lowercased with
   underscores removed (``getBlockHash`` → ``getblockhash``, ``foo_bar`` →
   ``foobar``).
3. The identifier is additionally split into *parts* at underscores,
   lower→Upper camel boundaries (``fooBar`` → ``foo bar``), acronym
   boundaries (``HTTPServer`` → ``http server``) and letter↔digit
   boundaries (``Server2`` → ``server 2``).  When this yields more than one
   part, each part is emitted **in addition to** the compound
   (``getBlockHash`` → ``getblockhash get block hash``).  A plain word emits
   exactly one token — so on a space-separated bag-of-words corpus the
   token stream equals ``string_split(text, ' ')`` and the DuckDB SQL oracle
   is exact (FIXTURES.md §A).
4. Tokens are lowercase; tokens longer than 64 chars are dropped; empties
   are dropped.
5. Optional language tagging prefixes every token with ``{lang}:``
   (BASELINE.json L6 "lang-tagged terms"); off by default because the SQL
   oracle corpus is untagged.

The hot path is pyarrow.compute regex kernels over whole Arrow arrays plus
numpy on the flattened values — no per-row Python (SURVEY.md §2 header).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_TOKEN_LEN = 64

_SPLIT_IDENT = r"[^\p{L}\p{N}_]+"  # unicode letters/digits form identifiers
# order matters: acronym rule first so HTTPServer -> HTTP Server before
# the lower->Upper rule sees it.
_BOUNDARIES = (
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),  # HTTPServer -> HTTP Server
    (r"([a-z0-9])([A-Z])", r"\1 \2"),  # fooBar -> foo Bar ; v2Beta -> v2 Beta
    (r"([A-Za-z])([0-9])", r"\1 \2"),  # server2 -> server 2
    (r"([0-9])([A-Za-z])", r"\1 \2"),  # 2fa -> 2 fa
)


def _flatten_list_array(arr: pa.ListArray) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Flatten list<string> → (values, int64 row index per value, within-row
    ordinal per value).  The ordinal is the value's index in its source list
    — the *raw* token position before any drop filtering, which is what
    positional postings store (phrase semantics count dropped tokens as
    position holders, matching the SQL oracle's ``string_split`` ordinals)."""
    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), lengths)
    within = np.arange(len(row_idx), dtype=np.int64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )
    return pc.list_flatten(arr), row_idx, within


def tokenize_flat(
    content: pa.Array | pa.ChunkedArray,
    langs: pa.Array | None = None,
    tag_lang: bool = False,
    return_positions: bool = False,
):
    """Tokenize a batch of documents.

    Returns ``(terms, doc_idx, dl)`` where ``terms`` is a flat string array of
    every emitted token, ``doc_idx[i]`` is the within-batch row of ``terms[i]``
    (int64, non-decreasing is NOT guaranteed), and ``dl`` is the per-row token
    count (uint32) — the BM25 document length.

    With ``return_positions=True`` a 4th element ``pos`` (int64) is returned:
    the token's POSITION — the ordinal of its source *identifier* in the
    document's raw identifier stream (pre-drop, so a dropped over-long token
    still occupies its slot, matching ``string_split`` ordinals on a
    plain-word corpus).  Split *parts* share their identifier's position
    (Lucene synonym-style position-increment 0), so a phrase query over
    compounds and one over parts both see consistent adjacency.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n = len(content)

    idents_list = pc.split_pattern_regex(content, _SPLIT_IDENT)
    idents, doc_of_ident, pos_of_ident = _flatten_list_array(idents_list)

    # compound tokens: lowercase, underscores removed
    compound = pc.utf8_lower(pc.replace_substring(idents, "_", ""))

    # Only identifiers containing an ASCII uppercase letter, a digit or an
    # underscore can split under the boundary rules — restrict the (pricey)
    # boundary-regex pipeline to that subset.  On a plain-word corpus this
    # skips nearly all of the tokenizer's regex work.
    splittable = pc.match_substring_regex(idents, r"[A-Z0-9_]").to_numpy(zero_copy_only=False)
    splittable = np.nan_to_num(splittable, nan=False).astype(bool)
    split_idx = np.flatnonzero(splittable)
    part_vals = None
    if len(split_idx):
        parts_src = pc.replace_substring(idents.take(pa.array(split_idx)), "_", " ")
        for pat, rep in _BOUNDARIES:
            parts_src = pc.replace_substring_regex(parts_src, pat, rep)
        parts_src = pc.utf8_lower(parts_src)
        # identifiers that split into >1 part contribute their parts too
        multi_mask = pc.match_substring(parts_src, " ").to_numpy(zero_copy_only=False)
        multi_mask = np.nan_to_num(multi_mask, nan=False).astype(bool)
        multi_sub = np.flatnonzero(multi_mask)
        if len(multi_sub):
            parts_list = pc.split_pattern(parts_src.take(pa.array(multi_sub)), " ")
            part_vals, part_row, _ = _flatten_list_array(parts_list)
            part_doc = doc_of_ident[split_idx[multi_sub]][part_row]
            part_pos = pos_of_ident[split_idx[multi_sub]][part_row]
    if part_vals is not None:
        terms = pa.concat_arrays([compound.cast(pa.string()), part_vals.cast(pa.string())])
        doc_idx = np.concatenate([doc_of_ident, part_doc])
        positions = np.concatenate([pos_of_ident, part_pos])
    else:
        terms = compound.cast(pa.string())
        doc_idx = doc_of_ident
        positions = pos_of_ident

    # drop empties and over-long tokens
    tok_len = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
    tok_len = np.nan_to_num(tok_len, nan=0).astype(np.int64)
    keep = (tok_len > 0) & (tok_len <= MAX_TOKEN_LEN)
    if not keep.all():
        keep_idx = np.flatnonzero(keep)
        terms = terms.take(pa.array(keep_idx))
        doc_idx = doc_idx[keep_idx]
        positions = positions[keep_idx]

    if tag_lang:
        if langs is None:
            raise ValueError("tag_lang=True requires the langs column")
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        doc_langs = langs.take(pa.array(doc_idx))
        terms = pc.binary_join_element_wise(doc_langs, terms, ":")

    dl = np.bincount(doc_idx, minlength=n).astype(np.uint32)
    if return_positions:
        return terms, doc_idx, dl, positions
    return terms, doc_idx, dl


def whitespace_tokenize_flat(
    content: pa.Array | pa.ChunkedArray,
    langs: pa.Array | None = None,
    tag_lang: bool = False,
    return_positions: bool = False,
):
    """Plain whitespace tokenizer (no identifier splits, no lowercase) —
    the minimal Tokenizer-protocol implementation and registry example.
    Positions (``return_positions=True``) are raw ``string_split`` ordinals."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n = len(content)
    toks = pc.split_pattern_regex(content, r"\s+")
    terms, doc_idx, positions = _flatten_list_array(toks)
    tok_len = np.nan_to_num(
        pc.utf8_length(terms).to_numpy(zero_copy_only=False), nan=0
    ).astype(np.int64)
    keep = (tok_len > 0) & (tok_len <= MAX_TOKEN_LEN)
    if not keep.all():
        keep_idx = np.flatnonzero(keep)
        terms = terms.take(pa.array(keep_idx))
        doc_idx = doc_idx[keep_idx]
        positions = positions[keep_idx]
    terms = terms.cast(pa.string())
    if tag_lang:
        if langs is None:
            raise ValueError("tag_lang=True requires the langs column")
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        terms = pc.binary_join_element_wise(langs.take(pa.array(doc_idx)), terms, ":")
    dl = np.bincount(doc_idx, minlength=n).astype(np.uint32)
    if return_positions:
        return terms, doc_idx, dl, positions
    return terms, doc_idx, dl


# Tokenizer protocol registry (SURVEY.md §2.7): a tokenizer is any callable
# (content, langs=None, tag_lang=False) -> (terms, doc_idx, dl).  Build
# pipelines select by name (BuildConfig.tokenizer); the name participates in
# the build fingerprint so switching tokenizers invalidates checkpoints.
def _stemmed_lazy(base):
    # late import: stem.py is a leaf module, but keep tokenize importable
    # without it at module-load time (registry entries resolve on first call)
    def tok(content, langs=None, tag_lang=False, return_positions=False):
        from .stem import stemmed

        return stemmed(base)(
            content, langs=langs, tag_lang=tag_lang, return_positions=return_positions
        )

    return tok


TOKENIZERS: dict[str, object] = {
    "code": tokenize_flat,
    "whitespace": whitespace_tokenize_flat,
    # analyzer chains: base tokenizer + S-stemmer token filter (ES
    # `stemmer: minimal_english`); participate in the build fingerprint
    # like any tokenizer, so switching chains invalidates checkpoints
    "code_stem": _stemmed_lazy(tokenize_flat),
    "whitespace_stem": _stemmed_lazy(whitespace_tokenize_flat),
}


def get_tokenizer(name: str):
    try:
        return TOKENIZERS[name]
    except KeyError:
        raise ValueError(f"unknown tokenizer {name!r}; registered: {sorted(TOKENIZERS)}")


def tokenize_docs(content: pa.Array | pa.ChunkedArray) -> list[list[str]]:
    """Per-doc token lists (convenience for the exact oracle and tests)."""
    terms, doc_idx, _ = tokenize_flat(content)
    toks = terms.to_pylist()
    out: list[list[str]] = [[] for _ in range(len(content))]
    for d, t in zip(doc_idx, toks):
        out[d].append(t)
    return out


def tokenize_query(text: str) -> list[str]:
    """Tokenize one query string with the same rules as documents."""
    return tokenize_docs(pa.array([text]))[0]


def tokenize_query_positions(text: str, tokenizer: str = "code") -> list[tuple[str, int]]:
    """Tokenize one phrase query → unique (term, position) pairs, positions
    normalized so the smallest is 0.  Matches the document-side positional
    semantics of the same tokenizer (parts share identifier positions)."""
    tok = get_tokenizer(tokenizer)
    terms, _, _, pos = tok(pa.array([text], type=pa.string()), return_positions=True)
    pairs = sorted(set(zip(terms.to_pylist(), pos.tolist())))
    if not pairs:
        return []
    base = min(p for _, p in pairs)
    return [(t, p - base) for t, p in pairs]


def term_counts_positions(
    terms: pa.Array, doc_idx: np.ndarray, positions: np.ndarray, doc_ids: np.ndarray
) -> pa.Table:
    """Aggregate the flat token stream to (term, doc_id, tf, positions)
    posting rows — ``positions`` out is one delta-varbyte binary blob per
    posting holding the token's sorted in-doc positions (count == tf, so the
    stream needs no length prefix; functions.codecs.segmented_positions_decode
    reverses it).  Sort-based grouping (lexsort + run boundaries) instead of
    term_counts' hash aggregation because the per-group position lists must
    come out sorted; everything is numpy-vectorized.
    """
    from .codecs import slice_concat_binary, varbyte_encode

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("doc_id", pa.uint64()),
            ("tf", pa.uint32()),
            ("positions", pa.binary()),
        ]
    )
    if n == 0:
        return pa.Table.from_pylist([], schema=out_schema)
    dic = pc.dictionary_encode(terms)
    codes = np.asarray(dic.indices).astype(np.int64)
    order = np.lexsort((positions, doc_idx, codes))
    c = codes[order]
    d = doc_idx[order]
    p = positions[order].astype(np.uint64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    tf = (ends - starts).astype(np.uint32)
    gaps = np.diff(p, prepend=np.uint64(0))
    gaps[starts] = p[starts]
    buf, nb = varbyte_encode(gaps)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=off[1:])
    blobs = slice_concat_binary(buf, off, starts, ends)
    return pa.table(
        {
            "term": dic.dictionary.take(pa.array(c[starts])).cast(pa.string()),
            "doc_id": pa.array(doc_ids[d[starts]], type=pa.uint64()),
            "tf": pa.array(tf, type=pa.uint32()),
            "positions": blobs,
        },
        schema=out_schema,
    )


def term_counts(
    terms: pa.Array, doc_idx: np.ndarray, doc_ids: np.ndarray
) -> pa.Table:
    """Aggregate the flat token stream to (term, doc_id, tf) posting triples.

    ``doc_ids`` maps within-batch row → global uint64 docID.  Uses Arrow's
    hash aggregation (C++) — no Python loop.
    """
    t = pa.table(
        {
            "term": terms,
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.uint64()),
        }
    )
    agg = t.group_by(["term", "doc_id"]).aggregate([("doc_id", "count")])
    return pa.table(
        {
            "term": agg["term"],
            "doc_id": agg["doc_id"],
            "tf": agg["doc_id_count"].cast(pa.uint32()),
        }
    )


# ES `stop` token filter: a fixed stopword set dropped AFTER tokenization.
# Positions keep their original ordinals (ES preserves position gaps so
# phrase queries don't collapse across removed words); dl counts only the
# kept tokens (stopped terms are never indexed, so they can't norm).
STOPWORDS: tuple[str, ...] = ("scan", "column", "window", "order")


def stop_filtered(base, stopwords: tuple[str, ...] = STOPWORDS):
    """Wrap a Tokenizer-protocol callable with the ES ``stop`` filter."""
    stop_arr = pa.array(sorted(set(stopwords)), type=pa.string())

    def tok(content, langs=None, tag_lang=False, return_positions=False):
        out = base(
            content, langs=langs, tag_lang=tag_lang,
            return_positions=return_positions,
        )
        if return_positions:
            terms, doc_idx, dl, pos = out
        else:
            terms, doc_idx, dl = out
            pos = None
        drop = pc.is_in(terms, value_set=stop_arr).to_numpy(zero_copy_only=False)
        drop = np.nan_to_num(drop, nan=False).astype(bool)
        if drop.any():
            keep_idx = np.flatnonzero(~drop)
            terms = terms.take(pa.array(keep_idx))
            doc_idx = doc_idx[keep_idx]
            if pos is not None:
                pos = pos[keep_idx]
            dl = np.bincount(doc_idx, minlength=len(dl)).astype(np.uint32)
        if return_positions:
            return terms, doc_idx, dl, pos
        return terms, doc_idx, dl

    return tok


TOKENIZERS["code_stop"] = stop_filtered(tokenize_flat)
TOKENIZERS["whitespace_stop"] = stop_filtered(whitespace_tokenize_flat)
