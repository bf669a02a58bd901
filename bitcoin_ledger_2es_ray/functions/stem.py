"""S-stemmer token filter (ES ``stemmer`` filter, ``minimal_english`` class).

Implements Harman's S-stemmer ("How Effective Is Suffixing?", JASIS 1991)
— the conservative plural stemmer Lucene ships as ``EnglishMinimalStemmer``
and ES exposes as the ``minimal_english`` stemmer token filter.  Exactly one
rule applies per token, checked in order (normative — the DuckDB oracle
mirrors this table verbatim):

1. ends ``ies``  and not ``eies``/``aies``  and len > 3  →  ``ies`` → ``y``
2. ends ``es``   and not ``aes``/``ees``/``oes`` and len > 2  →  drop ``s``
3. ends ``s``    and not ``us``/``ss``      and len > 1  →  drop ``s``
else: unchanged.

The kernel is one pass of pyarrow.compute predicates + slices over the whole
token array — no per-row Python — so it drops into any tokenizer's output
stream at zero marginal cost.  ``stemmed(base)`` wraps a registered
Tokenizer-protocol callable into its stemmed analyzer chain (tokenize →
stem); positions, doc mapping and dl are untouched (a stemmer never changes
the token count).  With ``tag_lang`` the base tokenizer prefixes ``{lang}:``
first; stemming only rewrites the suffix, so stem∘tag == tag∘stem.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def s_stem(terms: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized S-stemmer over a non-null string array."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if len(terms) == 0:
        return terms
    n = pc.utf8_length(terms)

    r1 = pc.and_(
        pc.and_(
            pc.ends_with(terms, pattern="ies"),
            pc.invert(
                pc.or_(
                    pc.ends_with(terms, pattern="eies"),
                    pc.ends_with(terms, pattern="aies"),
                )
            ),
        ),
        pc.greater(n, 3),
    )
    r2 = pc.and_(
        pc.and_(
            pc.ends_with(terms, pattern="es"),
            pc.invert(
                pc.or_(
                    pc.or_(
                        pc.ends_with(terms, pattern="aes"),
                        pc.ends_with(terms, pattern="ees"),
                    ),
                    pc.ends_with(terms, pattern="oes"),
                )
            ),
        ),
        pc.greater(n, 2),
    )
    r3 = pc.and_(
        pc.and_(
            pc.ends_with(terms, pattern="s"),
            pc.invert(
                pc.or_(
                    pc.ends_with(terms, pattern="us"),
                    pc.ends_with(terms, pattern="ss"),
                )
            ),
        ),
        pc.greater(n, 1),
    )

    drop_s = pc.utf8_slice_codeunits(terms, start=0, stop=-1)
    ies_to_y = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(terms, start=0, stop=-3), pa.scalar("y"), ""
    )
    # rule order: r1 wins, else r2/r3 both just drop the final 's'
    return pc.if_else(r1, ies_to_y, pc.if_else(pc.or_(r2, r3), drop_s, terms))


def s_stem_word(w: str) -> str:
    """Per-word Python reference of the same rule table (tests/oracles)."""
    if w.endswith("ies") and not w.endswith(("eies", "aies")) and len(w) > 3:
        return w[:-3] + "y"
    if w.endswith("es") and not w.endswith(("aes", "ees", "oes")) and len(w) > 2:
        return w[:-1]
    if w.endswith("s") and not w.endswith(("us", "ss")) and len(w) > 1:
        return w[:-1]
    return w


def stemmed(base):
    """Wrap a Tokenizer-protocol callable into its stemmed analyzer chain."""

    def tok(content, langs=None, tag_lang=False, return_positions=False):
        out = base(content, langs=langs, tag_lang=tag_lang, return_positions=return_positions)
        if return_positions:
            terms, doc_idx, dl, pos = out
            return s_stem(terms), doc_idx, dl, pos
        terms, doc_idx, dl = out
        return s_stem(terms), doc_idx, dl

    return tok


def stem_query_terms(text: str, tokenizer: str = "code") -> list[str]:
    """Search-side analyzer chain: tokenize one query with the named BASE
    tokenizer, then stem — ES applies the same analyzer at index and search
    time, so a query for ``tables`` matches docs indexed as ``table``."""
    from .tokenize import tokenize_query

    del tokenizer  # tokenize_query is the code tokenizer; explicit for intent
    raw = sorted(set(tokenize_query(text)))
    if not raw:
        return []
    return sorted(set(s_stem(pa.array(raw, type=pa.string())).to_pylist()))
