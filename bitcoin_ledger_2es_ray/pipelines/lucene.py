"""Full Lucene ``query_string`` syntax compiled onto the engine's kernels.

Elasticsearch's ``query_string`` query exposes the classic Lucene
QueryParser: fielded terms, ``AND/OR/NOT`` with parentheses, ``+must`` /
``-must_not`` markers, quoted phrases (with ``~slop``), wildcards
(``te?t``, ``test*``), fuzzy terms (``term~1``), numeric ranges
(``dl:[6 TO 48]``), and per-clause boosts (``term^2.5``).  The graft
parses the same grammar into an AST and compiles each leaf onto the
kernel that already implements it:

- term           → the single-term BM25 score surface (idf × tf-norm from
                   one postings decode — ``structured._score_map``'s shape)
- "a b"(~s)      → ``phrase.phrase_match`` / ``phrase_match_slop`` position
                   filter; surviving docs score as the SUM of the phrase
                   terms' BM25 (``phrase_topk`` semantics)
- wild/prefix    → ``phrase.wildcard_match``'s dictionary expansion,
  fuzzy~d          ``TermDict.terms_fuzzy`` — all CONSTANT-scored 1.0×boost,
                   Lucene's default constant_score multi-term rewrite
- dl:[lo TO hi]  → a FILTER context on doc length (prunes candidates,
                   contributes no score).  A range must be AND-ed with at
                   least one scoring clause: postings carry each matched
                   doc's dl, so the filter applies with zero extra I/O; a
                   pure-filter query has no score surface and is refused
                   (same stance as the engine's ``range_filtered_topk``).

Boolean semantics (ES's): AND intersects and sums scores, OR unions and
sums the matching sides, NOT excludes and never scores; precedence
NOT > AND > OR, and bare juxtaposition (``a b``) is the default operator
OR.  ``+``/``-`` markers build the simple-query-string bool (must /
must_not / plain=should); MIXING markers with explicit AND/OR at one
level is refused — Lucene's behavior there is famously surprising, and a
parse error beats silently surprising ranks.  A pure-negative query
(``NOT a``, ``-a``) matches nothing and is refused like Lucene's
lonely-negative clause.

Every leaf decodes its postings ONCE; composition is numpy set algebra on
(docs, scores, dls) triples — no per-doc Python, no corpus scan.  Ranking
is the house contract: round(score, 6) DESC, doc_id ASC.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..functions.bm25 import idf, sql_round, tf_norm
from ..functions.tokenize import tokenize_query

_QS_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lp>\() | (?P<rp>\))
  | "(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?
  | \[(?P<lo>[^\s\]]+)\s+TO\s+(?P<hi>[^\s\]]+)\]
  | \^(?P<boost>\d+(?:\.\d+)?)
  | (?P<plus>\+) | (?P<minus>-)
  | (?P<word>[^\s()^"\[\]]+)
    """,
    re.VERBOSE,
)


def tokenize_qs(src: str) -> list[tuple[str, object]]:
    """Lex a query string into (kind, value) tokens."""
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(src):
        m = _QS_TOKEN.match(src, pos)
        if m is None:
            raise ValueError(f"query_string: cannot lex at {src[pos:]!r}")
        pos = m.end()
        if m.group("ws"):
            continue
        if m.group("lp"):
            out.append(("lp", "("))
        elif m.group("rp"):
            out.append(("rp", ")"))
        elif m.group("ph") is not None:
            out.append(("phrase", (m.group("ph"), int(m.group("slop") or 0))))
        elif m.group("lo") is not None:
            out.append(("range", (m.group("lo"), m.group("hi"))))
        elif m.group("boost") is not None:
            out.append(("boost", float(m.group("boost"))))
        elif m.group("plus"):
            out.append(("plus", "+"))
        elif m.group("minus"):
            out.append(("minus", "-"))
        else:
            w = m.group("word")
            if w in ("AND", "OR", "NOT"):
                out.append(("kw", w))
            else:
                out.append(("word", w))
    out.append(("eof", ""))
    return out


# AST node shapes (plain tuples):
#   ("term", text) ("phrase", text, slop) ("wild", pattern)
#   ("fuzzy", base, dist) ("range", lo, hi) ("not", node)
#   ("boost", node, factor) ("and", [nodes]) ("or", [nodes])
#   ("bool", must, must_not, should)


class _QSParser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, object]:
        return self.toks[self.i]

    def next(self) -> tuple[str, object]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # sequence level: items separated by AND / OR / juxtaposition
    def sequence(self) -> tuple:
        items: list[tuple[str | None, tuple]] = []  # (marker, node)
        seps: list[str] = []  # between items: "AND" | "OR" | "IMP"
        while True:
            items.append(self.item())
            k, v = self.peek()
            if k == "kw" and v in ("AND", "OR"):
                self.next()
                seps.append(str(v))
                continue
            if k in ("rp", "eof"):
                break
            seps.append("IMP")
        markers = [m for m, _ in items if m]
        if markers:
            if any(s != "IMP" for s in seps):
                raise ValueError(
                    "query_string: +/- markers cannot mix with explicit "
                    "AND/OR at one level"
                )
            must = [n for m, n in items if m == "+"]
            must_not = [n for m, n in items if m == "-"]
            should = [n for m, n in items if m is None]
            if not must and not should:
                raise ValueError("query_string: pure-negative query")
            return ("bool", must, must_not, should)
        # no markers: NOT > AND > OR, juxtaposition = OR
        nodes = [n for _, n in items]
        groups: list[list[tuple]] = [[nodes[0]]]
        for sep, node in zip(seps, nodes[1:]):
            if sep == "AND":
                groups[-1].append(node)
            else:
                groups.append([node])
        ors = [g[0] if len(g) == 1 else ("and", g) for g in groups]
        return ors[0] if len(ors) == 1 else ("or", ors)

    def item(self) -> tuple[str | None, tuple]:
        k, v = self.peek()
        if k == "kw" and v == "NOT":
            self.next()
            _, node = self.item()
            return None, ("not", node)
        marker = None
        if k in ("plus", "minus"):
            marker = "+" if k == "plus" else "-"
            self.next()
        node = self.primary(field=None)
        while self.peek()[0] == "boost":
            node = ("boost", node, float(self.next()[1]))
        return marker, node

    def primary(self, field: str | None) -> tuple:
        k, v = self.next()
        if k == "lp":
            if field is not None:
                raise ValueError("query_string: field-scoped groups unsupported")
            node = self.sequence()
            if self.next()[0] != "rp":
                raise ValueError("query_string: missing ')'")
            return node
        if k == "phrase":
            if field not in (None, "content"):
                raise ValueError(f"query_string: unknown field {field!r}")
            text, slop = v  # type: ignore[misc]
            return ("phrase", text, slop)
        if k == "range":
            if field != "dl":
                raise ValueError(
                    "query_string: range syntax is supported on the dl field"
                )
            lo, hi = v  # type: ignore[misc]
            return (
                "range",
                None if lo == "*" else int(lo),
                None if hi == "*" else int(hi),
            )
        if k != "word":
            raise ValueError(f"query_string: unexpected {v!r}")
        w = str(v)
        if field is None and ":" in w:
            field, rest = w.split(":", 1)
            if rest == "":
                return self.primary(field=field)
            return self._leaf(field, rest)
        return self._leaf(field, w)

    def _leaf(self, field: str | None, w: str) -> tuple:
        if field == "dl":
            raise ValueError("query_string: dl supports only range syntax")
        if field not in (None, "content"):
            raise ValueError(f"query_string: unknown field {field!r}")
        fm = re.fullmatch(r"(.+?)~(\d*)", w)
        if fm:
            base, d = fm.group(1), fm.group(2)
            if "*" in base or "?" in base:
                raise ValueError("query_string: fuzzy on a wildcard pattern")
            return ("fuzzy", base, int(d) if d else 2)
        if "*" in w or "?" in w:
            return ("wild", w)
        return ("term", w)


def parse_query_string(src: str) -> tuple:
    """Parse one Lucene query string into its AST."""
    p = _QSParser(tokenize_qs(src))
    node = p.sequence()
    if p.peek()[0] != "eof":
        raise ValueError("query_string: trailing ')'")
    return node


# ------------------------------------------------------------ evaluator


@dataclass
class _Surface:
    """A positive score surface: sorted unique docs, their summed scores,
    and (when the leaves decoded postings) each doc's length."""

    docs: np.ndarray  # uint64, sorted unique
    scores: np.ndarray  # float64
    dls: np.ndarray | None  # int64 or None (constant-scored leaves)


def _empty() -> _Surface:
    return _Surface(
        np.empty(0, np.uint64), np.empty(0, np.float64), np.empty(0, np.int64)
    )


def _term_surface(store, term: str) -> _Surface:
    toks = tokenize_query(term)
    if not toks:
        return _empty()
    surfaces = []
    for t in sorted(set(toks)):
        df_t = store.td.df_of(t)
        if df_t == 0:
            continue
        d, tf, dl = store.postings(t)
        if len(d) == 0:
            continue
        s = float(idf(store.n_docs, df_t)) * tf_norm(tf, dl, store.avgdl)
        surfaces.append(_Surface(d, s, dl.astype(np.int64)))
    if not surfaces:
        return _empty()
    return _union(surfaces)


def _const_surface(store, terms: list[str]) -> _Surface:
    """Constant-score 1.0 over the union of the given dictionary terms'
    doc sets (Lucene's multi-term constant_score rewrite), dl carried."""
    docs_l, dl_l = [], []
    for t in terms:
        d, _tf, dl = store.postings(t)
        if len(d):
            docs_l.append(d)
            dl_l.append(dl.astype(np.int64))
    if not docs_l:
        return _empty()
    docs = np.concatenate(docs_l)
    dls = np.concatenate(dl_l)
    u, first = np.unique(docs, return_index=True)
    return _Surface(u, np.ones(len(u), np.float64), dls[first])


def _union(surfaces: list[_Surface]) -> _Surface:
    surfaces = [s for s in surfaces if len(s.docs)]
    if not surfaces:
        return _empty()
    docs = np.concatenate([s.docs for s in surfaces])
    scores = np.concatenate([s.scores for s in surfaces])
    u, inv = np.unique(docs, return_inverse=True)
    acc = np.zeros(len(u), np.float64)
    np.add.at(acc, inv, scores)
    if any(s.dls is None for s in surfaces):
        dls = None
    else:
        cat_dl = np.concatenate([s.dls for s in surfaces])
        # any occurrence works (dl is a per-doc constant): walking inv in
        # reverse leaves each slot holding its FIRST occurrence's index
        first = np.zeros(len(u), np.int64)
        first[inv[::-1]] = np.arange(len(cat_dl) - 1, -1, -1, dtype=np.int64)
        dls = cat_dl[first]
    return _Surface(u, acc, dls)


def _intersect(a: _Surface, b: _Surface) -> _Surface:
    common, ia, ib = np.intersect1d(
        a.docs, b.docs, assume_unique=True, return_indices=True
    )
    dls = None
    if a.dls is not None:
        dls = a.dls[ia]
    elif b.dls is not None:
        dls = b.dls[ib]
    return _Surface(common, a.scores[ia] + b.scores[ib], dls)


def _mask(s: _Surface, keep: np.ndarray) -> _Surface:
    return _Surface(
        s.docs[keep], s.scores[keep], None if s.dls is None else s.dls[keep]
    )


def _eval(node: tuple, store):
    """Evaluate one AST node → _Surface | ("neg", docs) | ("filter", lo, hi)."""
    kind = node[0]
    if kind == "term":
        return _term_surface(store, node[1])
    if kind == "phrase":
        from .phrase import phrase_match, phrase_match_slop

        text, slop = node[1], node[2]
        match = (
            phrase_match(store, text)
            if slop == 0
            else phrase_match_slop(store, text, slop)
        )
        if len(match) == 0:
            return _empty()
        base = _term_surface(store, text)
        keep = np.isin(base.docs, match, assume_unique=True)
        return _mask(base, keep)
    if kind == "wild":
        pattern = node[1]
        import fnmatch

        wc = min([i for i, ch in enumerate(pattern) if ch in "*?"])
        prefix = pattern[:wc]
        if not prefix:
            raise ValueError(
                "query_string: leading-wildcard patterns are not allowed"
            )
        rx = re.compile(fnmatch.translate(pattern))
        terms = [t for t in store.td.terms_with_prefix(prefix) if rx.match(t)]
        return _const_surface(store, terms)
    if kind == "fuzzy":
        terms = store.td.terms_fuzzy(node[1], node[2], True)
        return _const_surface(store, list(terms))
    if kind == "range":
        return ("filter", node[1], node[2])
    if kind == "not":
        inner = _eval(node[1], store)
        if not isinstance(inner, _Surface):
            raise ValueError("query_string: NOT of a non-scoring clause")
        return ("neg", inner.docs)
    if kind == "boost":
        inner = _eval(node[1], store)
        if not isinstance(inner, _Surface):
            raise ValueError("query_string: boost on a non-scoring clause")
        return _Surface(inner.docs, inner.scores * node[2], inner.dls)
    if kind == "and":
        return _eval_and([_eval(c, store) for c in node[1]])
    if kind == "or":
        parts = [_eval(c, store) for c in node[1]]
        if any(not isinstance(p, _Surface) for p in parts):
            raise ValueError(
                "query_string: OR of a negative/filter clause has no "
                "document surface"
            )
        return _union(parts)
    if kind == "bool":
        _, must, must_not, should = node
        pos = (
            _eval_and([_eval(c, store) for c in must]) if must else None
        )
        should_s = [_eval(c, store) for c in should]
        if any(not isinstance(s, _Surface) for s in should_s):
            raise ValueError("query_string: plain clause must be scoring")
        if pos is None:
            pos = _union(should_s)
        elif should_s:
            # optional scorers: add each should score on surviving docs
            su = _union(should_s)
            add = np.zeros(len(pos.docs), np.float64)
            common, ip, isv = np.intersect1d(
                pos.docs, su.docs, assume_unique=True, return_indices=True
            )
            add[ip] = su.scores[isv]
            pos = _Surface(pos.docs, pos.scores + add, pos.dls)
        for c in must_not:
            inner = _eval(c, store)
            if not isinstance(inner, _Surface):
                raise ValueError("query_string: '-' of a non-scoring clause")
            keep = ~np.isin(pos.docs, inner.docs, assume_unique=True)
            pos = _mask(pos, keep)
        return pos
    raise ValueError(f"query_string: unknown node {kind}")


def _eval_and(parts: list) -> _Surface:
    pos = [p for p in parts if isinstance(p, _Surface)]
    negs = [p[1] for p in parts if isinstance(p, tuple) and p[0] == "neg"]
    filts = [p for p in parts if isinstance(p, tuple) and p[0] == "filter"]
    if not pos:
        raise ValueError(
            "query_string: a conjunction needs at least one scoring clause"
        )
    acc = pos[0]
    for p in pos[1:]:
        acc = _intersect(acc, p)
    for nd in negs:
        keep = ~np.isin(acc.docs, nd, assume_unique=True)
        acc = _mask(acc, keep)
    for _, lo, hi in filts:
        if acc.dls is None:
            raise ValueError(
                "query_string: dl range needs a postings-backed clause "
                "(constant-scored leaves carry no lengths)"
            )
        keep = np.ones(len(acc.docs), bool)
        if lo is not None:
            keep &= acc.dls >= lo
        if hi is not None:
            keep &= acc.dls <= hi
        acc = _mask(acc, keep)
    return acc


def query_string_topk(
    store,
    qstr: str,
    k: int = 10,
    round_decimals: int | None = None,
    minimum_should_match=None,
) -> list[tuple[int, float]]:
    """Parse + evaluate one Lucene query string; top-k
    (doc_id, score) ranked (rounded score DESC, doc ASC).

    ``minimum_should_match`` (int or the full Lucene grammar string)
    applies to the TOP-LEVEL optional clauses — a plain disjunction or a
    bool with no '+' clauses — exactly like ES's query_string parameter;
    when every top-level clause is mandatory the parameter is a no-op
    (ES behaves the same)."""
    tree = parse_query_string(qstr)
    res = _eval(tree, store)
    if not isinstance(res, _Surface):
        raise ValueError("query_string: query has no positive surface")
    if minimum_should_match is not None and len(res.docs):
        from .search_api import parse_min_should_match

        if tree[0] == "or":
            children = tree[1]
        elif tree[0] == "bool" and not tree[1]:
            children = tree[3]
        else:
            children = None
        if children is not None:
            m = parse_min_should_match(minimum_should_match, len(children))
            if m > 0:
                counts = np.zeros(len(res.docs), dtype=np.int64)
                for c in children:
                    s_ = _eval(c, store)
                    if isinstance(s_, _Surface):
                        counts += np.isin(
                            res.docs, s_.docs, assume_unique=True
                        )
                res = _mask(res, counts >= m)
    if len(res.docs) == 0:
        return []
    scores = res.scores
    if round_decimals is not None:
        scores = sql_round(scores, round_decimals)
    order = np.lexsort((res.docs.astype(np.int64), -scores))[:k]
    return [(int(res.docs[i]), float(scores[i])) for i in order]
