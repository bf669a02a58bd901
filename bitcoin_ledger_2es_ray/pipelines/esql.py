"""ES|QL: Elasticsearch's piped query language compiled onto Ray Data.

Elasticsearch 8.11+ ships ES|QL (``POST /_query``): a pipe-syntax language
(``FROM idx | WHERE ... | EVAL ... | STATS ... BY ... | SORT ... | LIMIT n``)
whose engine computes each command as a streaming transform with mergeable
per-node partial aggregates reduced on the coordinator.  The graft compiles
the same surface onto the same physical shapes this repo already uses
everywhere:

- ``FROM`` → ``ray.data.read_parquet`` with the column set PRUNED to exactly
  the columns the rest of the pipe references (a pipe that keeps 2 columns
  reads 2 columns).
- ``WHERE`` / ``EVAL`` / ``KEEP`` / ``DROP`` → ONE fused ``map_batches``
  stage evaluating the expression AST with vectorized ``pyarrow.compute``
  kernels (no per-row Python).
- ``STATS ... BY`` → per-batch mergeable partials (count/sum/min/max; avg =
  sum/count after the combine) + a driver Arrow combine bounded by #groups ×
  #blocks — never a Ray all-to-all for bounded-cardinality buckets (the
  repo's measured terms_agg/date_histogram pattern).
- ``SORT ... | LIMIT k`` without STATS → per-batch partial top-k, driver
  merge bounded by k × #blocks.  A bare LIMIT without a total-ordering SORT
  is REJECTED (nondeterministic under parallel execution — ES|QL itself
  warns results are arbitrary; the graft refuses instead).

Expression language: ``== != > >= < <=``, ``AND OR NOT``, ``+ - * /``,
``ROUND(x, d)`` (the repo's half-away-from-zero ``sql_round``, so float
outputs meet the 6-dp oracle contract), ``ABS(x)``, ``LENGTH(s)``,
string/numeric literals, and ``COUNT(*) / COUNT / SUM / MIN / MAX / AVG``
in STATS.  ``DISSECT`` / ``GROK`` parse a string column into new columns
via ONE vectorized ``pc.extract_regex`` per batch (patterns compile to RE2
named-group regexes at PARSE time, once — never per batch); non-matching
rows keep the row with null fields, ES|QL's semantics.  ``RENAME old AS
new`` is a zero-copy schema rewrite; ``LOOKUP JOIN idx ON key`` (8.18)
reads the lookup table ONCE, broadcasts it via ``ray.put``, and runs one
order-pinned Arrow left join per batch — the fact stream never shuffles
(lookup indices are small replicated tables by definition).  ``SPLIT(s,
"sep")`` in EVAL makes a multi-value (list) column and ``MV_EXPAND col``
explodes it — one vectorized take+flatten per batch (rows with null or
element-less lists keep ONE row with a null value, ES|QL's semantics).
``ROW a = 1, b = "x"`` is the
literal one-row source; string functions ``CONCAT`` / ``SUBSTRING`` /
``TO_LOWER`` / ``TO_UPPER`` / ``STARTS_WITH`` / ``COALESCE`` and the
``LIKE`` (``*``/``?`` wildcards) / ``RLIKE`` (anchored regex) predicates
are all single Arrow kernels.  ``ENRICH policy ON key`` materializes the
named policy's enrich index (``pipelines/enrich.py``), broadcasts it
once, and decorates the stream with the same order-pinned per-batch join
as LOOKUP (ES's enrich processor semantics: unmatched keys keep the row
with null fields).  ``SHOW INFO`` is the deterministic one-row version
source (the only SHOW item ES|QL defines) and composes with the same
tail commands as ROW.

Round 4 closed the 9.x surface: ``INLINESTATS`` (two-phase agg +
broadcast join-back), ``TS`` + ``RATE`` (endpoint partials), ``SAMPLE``
(deterministic sha256-keyed), ``CHANGE_POINT`` (two-segment-SSE mean
shift), ``FORK`` (+ ``| RRF`` fusion), ``COMPLETION`` / ``RERANK``
(registered deterministic fake inference endpoints), post-STATS command
tails (``WHERE`` / ``EVAL`` / ``RENAME`` / re-aggregating ``STATS`` on
the group-bounded combined result), agg-less ``STATS BY`` (distinct),
KEEP/DROP wildcards, multivalue literals, ``MATCH`` / ``QSTR`` full-text
predicates (index-free, same analyzer as the index), ``IS [NOT] NULL``,
and the aggregate long tail (STD_DEV, WEIGHTED_AVG, PERCENTILE,
MEDIAN_ABSOLUTE_DEVIATION, TOP, VALUES, COUNT_DISTINCT precision hint)
plus math/string/MV functions through CATEGORIZE and DATE_DIFF — every
documented ES|QL command through the 9.x tech previews parses and
executes.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.bm25 import sql_round

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+|\d+)
  | (?P<op>==|!=|>=|<=|::|>|<|\+|-|\*|/|%|,|\(|\)|\[|\]|\|)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.*\U0001F414]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM",
    "WHERE",
    "EVAL",
    "STATS",
    "INLINESTATS",
    "SAMPLE",
    "CHANGE_POINT",
    "INSIST_\U0001F414",
    "FORK",
    "COMPLETION",
    "RERANK",
    "RRF",
    "TS",
    "WITH",
    "IS",
    "NULL",
    "BY",
    "SORT",
    "LIMIT",
    "KEEP",
    "DROP",
    "DISSECT",
    "GROK",
    "RENAME",
    "LOOKUP",
    "JOIN",
    "ON",
    "AS",
    "MV_EXPAND",
    "ROW",
    "SHOW",
    "ENRICH",
    "LIKE",
    "RLIKE",
    "IN",
    "AND",
    "OR",
    "NOT",
    "ASC",
    "DESC",
}

_UNSUPPORTED: set[str] = set()


class Duration(int):
    """ES|QL temporal literal (``1 day``, ``2 hours``) as integer
    MICROSECONDS — an int subclass so it flows through the generic
    literal plumbing; DATE_TRUNC/BUCKET dispatch on the type.  Carries
    the source unit so WEEK can truncate calendar-aware (ES anchors
    weeks to Monday, not to the Thursday epoch) while week ARITHMETIC
    stays the fixed 7 days."""

    unit: str = ""

    def __new__(cls, us: int, unit: str = ""):
        o = super().__new__(cls, us)
        o.unit = unit
        return o


class CalendarPeriod:
    """ES|QL calendar-unit temporal literal (``1 month``, ``2 quarters``,
    ``1 year``) — data-dependent width, so it truncates via Arrow's
    calendar-aware ``floor_temporal`` instead of integer division.  Only
    DATE_TRUNC and BUCKET accept it; arithmetic refuses."""

    __slots__ = ("n", "unit")

    def __init__(self, n: int, unit: str):
        self.n, self.unit = n, unit

    def __repr__(self) -> str:  # error messages
        return f"{self.n} {self.unit}"


_CALENDAR_NORM = {
    "MONTH": "month", "MONTHS": "month",
    "QUARTER": "quarter", "QUARTERS": "quarter",
    "YEAR": "year", "YEARS": "year",
}

# ``expr::type`` cast names → the TO_* conversion function they sugar to
_CAST_TYPES = {
    "LONG": "TO_LONG", "INT": "TO_INTEGER", "INTEGER": "TO_INTEGER",
    "DOUBLE": "TO_DOUBLE", "FLOAT": "TO_DOUBLE",
    "STRING": "TO_STRING", "KEYWORD": "TO_STRING", "TEXT": "TO_STRING",
    "BOOL": "TO_BOOLEAN", "BOOLEAN": "TO_BOOLEAN",
    "DATETIME": "TO_DATETIME", "DATE": "TO_DATETIME",
    "IP": "TO_IP",
}

# fixed-width units resolve to Duration microseconds; calendar units
# (month/quarter/year) become CalendarPeriod and truncate calendar-aware
_DUR_UNITS_US = {
    "MILLISECOND": 1_000, "MILLISECONDS": 1_000, "MS": 1_000,
    "SECOND": 1_000_000, "SECONDS": 1_000_000, "SEC": 1_000_000, "S": 1_000_000,
    "MINUTE": 60_000_000, "MINUTES": 60_000_000, "MIN": 60_000_000,
    "HOUR": 3_600_000_000, "HOURS": 3_600_000_000, "H": 3_600_000_000,
    "DAY": 86_400_000_000, "DAYS": 86_400_000_000, "D": 86_400_000_000,
    "WEEK": 604_800_000_000, "WEEKS": 604_800_000_000, "W": 604_800_000_000,
}
_CALENDAR_UNITS = {"MONTH", "MONTHS", "QUARTER", "QUARTERS", "YEAR", "YEARS"}

# ES|QL DATE_EXTRACT ChronoField names → pyarrow temporal kernels
_CHRONO_FIELDS = {
    "YEAR": "year",
    "MONTH_OF_YEAR": "month",
    "DAY_OF_MONTH": "day",
    "DAY_OF_YEAR": "day_of_year",
    "HOUR_OF_DAY": "hour",
    "MINUTE_OF_HOUR": "minute",
    "SECOND_OF_MINUTE": "second",
    "MILLI_OF_SECOND": "millisecond",
    "DAY_OF_WEEK": "day_of_week",  # ISO: Mon=1 … Sun=7
}
# ChronoFields with no single Arrow kernel — integer math on the epoch-us
# view (Java semantics: EPOCH_DAY = days since 1970-01-01,
# INSTANT_SECONDS = epoch seconds, MICRO_OF_SECOND = micros within the
# second [Arrow's microsecond kernel is micros within the MILLIsecond],
# ALIGNED_WEEK_OF_YEAR = weeks aligned to Jan 1)
_CHRONO_DERIVED = {
    "EPOCH_DAY", "INSTANT_SECONDS", "MICRO_OF_SECOND",
    "ALIGNED_WEEK_OF_YEAR",
}

# SHOW INFO's one deterministic row (ES|QL's only SHOW item; see
# docs: esql-commands.html#esql-show).  The graft pins build date/hash to
# the package release so the row is bit-stable across runs.
_SHOW_INFO_ROW = {
    "date": "2026-01-01T00:00:00.000Z",
    "hash": "0000000000000000000000000000000000000000",
    "version": "0.1.0",
}

# ENRICH policies: name -> (builder(sf_dir) -> lookup table, right key col).
# The builder materializes the policy's enrich index (pipelines/enrich.py).
def _nations_policy(sf_dir):
    from .enrich import execute_enrich_policy

    return execute_enrich_policy(sf_dir)


_ENRICH_POLICIES = {"nations": (_nations_policy, "n_nationkey")}

# ---------------------------------------------------- inference endpoints
#
# ES|QL COMPLETION / RERANK call ES inference endpoints (LLMs, rerankers).
# The container has no model runtime, so the graft registers DETERMINISTIC
# FAKE endpoints (the same policy as pipelines/multimodal.py's codec stub):
# the Ray-side plumbing — parse, per-batch vectorized call, schema,
# streaming — is real and oracle-gated; a real model endpoint is one
# registry entry away.  Unknown endpoints are refused at parse time.


def _echo_completion(prompts: pa.Array) -> pa.Array:
    """Deterministic 'LLM': ``[test_echo] `` + lowercased prompt."""
    return pc.binary_join_element_wise(
        pa.array(["[test_echo]"] * len(prompts)), pc.utf8_lower(prompts), " "
    )


def _overlap_rerank(query: str, field: pa.Array) -> pa.Array:
    """Deterministic reranker: |distinct field tokens ∩ query tokens| /
    |query tokens| over single-space tokens (== DuckDB
    ``len(list_intersect(string_split(f,' '), string_split(q,' ')))/n``),
    rounded to 6 dp.  Fully vectorized: one split, one ``index_in``
    against the (tiny) query vocabulary, one pair-dedup + bincount."""
    qtok = list(dict.fromkeys(query.split(" ")))
    n_rows = len(field)
    if not qtok or n_rows == 0:
        return pa.array(np.zeros(n_rows), type=pa.float64())
    toks = pc.split_pattern(field, " ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    code = pc.index_in(flat, value_set=pa.array(qtok))
    valid = pc.is_valid(code).to_numpy(zero_copy_only=False)
    hits = np.zeros(n_rows, dtype=np.int64)
    if valid.any():
        codes = code.to_numpy(zero_copy_only=False)
        pairs = np.unique(
            parents[valid].astype(np.int64) * len(qtok)
            + codes[valid].astype(np.int64)
        )
        hits = np.bincount(pairs // len(qtok), minlength=n_rows)
    return pa.array(
        sql_round(hits / float(len(qtok)), 6), type=pa.float64()
    )


_INFERENCE_ENDPOINTS: dict[str, tuple[str, object]] = {
    "test_echo": ("completion", _echo_completion),
    "test_reranker": ("rerank", _overlap_rerank),
}

# ------------------------------------------------- full-text predicates
#
# ES|QL 9.x full-text functions: MATCH / QSTR as WHERE predicates.  The
# pipe has no index context, so both evaluate index-free per batch over
# the raw field with the SAME analyzer as the engine's index
# (functions/tokenize) — identical match sets, membership-only (scoring
# stays with the BM25 pipelines).


def _hits_to_rows(n: int, doc_idx: np.ndarray, hit: np.ndarray) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    out[doc_idx[hit]] = True
    return out


def _wild_rx(pattern: str) -> str:
    return "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    ) + "$"


def _expand_cols(patterns: list[str], available: list[str], what: str) -> list[str]:
    """Expand KEEP/DROP name patterns (ES|QL ``*``/``?`` wildcards)
    against the current schema — explicit names keep list order,
    wildcard hits expand in schema order, first occurrence wins."""
    out: list[str] = []
    seen: set[str] = set()
    for p_ in patterns:
        if "*" in p_ or "?" in p_:
            rx = _wild_rx(p_)
            hits = [c for c in available if re.fullmatch(rx, c)]
            if not hits:
                raise ValueError(
                    f"esql: {what} pattern {p_!r} matches no columns"
                )
        else:
            hits = [p_]
        for c in hits:
            if c not in seen:
                seen.add(c)
                out.append(c)
    return out


def _validate_qstr(query: str) -> None:
    """Driver-side QSTR validation (parse + leaf check) so unsupported
    syntax raises before any Ray task runs."""
    from ..functions.tokenize import tokenize_query
    from .lucene import parse_query_string

    def walk(nd) -> None:
        k = nd[0]
        if k in ("fuzzy", "range"):
            raise ValueError(
                f"esql: QSTR {k!r} leaves are index-backed — use the "
                "query_string_topk pipeline"
            )
        if k == "phrase":
            if nd[2]:
                raise ValueError(
                    "esql: QSTR sloppy phrases are index-backed — use the "
                    "query_string_topk pipeline"
                )
            for w in nd[1].split():
                if len(tokenize_query(w)) != 1:
                    raise ValueError(
                        "esql: QSTR phrases over compound tokens are "
                        "index-backed — use the phrase pipelines"
                    )
        elif k in ("not", "boost"):
            walk(nd[1])
        elif k in ("and", "or"):
            for c in nd[1]:
                walk(c)
        elif k == "bool":
            for lst in (nd[1], nd[2], nd[3]):
                for c in lst:
                    walk(c)

    walk(parse_query_string(query))


def _validate_fulltext_exprs(plan: "EsqlPlan") -> None:
    """Check every MATCH/QSTR call in the plan's expressions up front."""

    def walk(node) -> None:
        if isinstance(node, tuple):
            if node and node[0] == "func" and node[1] in (
                "MATCH", "QSTR", "MATCH_PHRASE", "TERM"
            ):
                args = node[2]
                if (
                    len(args) != 2
                    or args[1][0] != "lit"
                    or not isinstance(args[1][1], str)
                ):
                    raise ValueError(
                        f'esql: {node[1]}(field, "query") needs a literal '
                        "query string"
                    )
                if node[1] == "QSTR":
                    _validate_qstr(args[1][1])
            if node and node[0] == "func" and node[1] == "KQL":
                args = node[2]
                if (
                    len(args) != 1
                    or args[0][0] != "lit"
                    or not isinstance(args[0][1], str)
                ):
                    raise ValueError('esql: KQL("query") needs a literal query')
                _kql_parse(args[0][1])  # syntax errors surface on the driver
            for x in node:
                walk(x)
        elif isinstance(node, list):
            for x in node:
                walk(x)

    for op in list(plan.ops) + list(plan.post):
        walk(tuple(op[1:]))
    for s_ in plan.stats:
        walk(s_[3])


def _match_predicate(field: pa.Array, query: str) -> pa.Array:
    """``MATCH(field, "query")``: true iff ANY analyzed query term occurs
    among the field's analyzed tokens (ES match, default OR operator) —
    one vectorized tokenize + ``is_in`` per batch."""
    from ..functions.tokenize import tokenize_flat, tokenize_query

    n = len(field)
    qterms = sorted(set(tokenize_query(query)))
    if not qterms or n == 0:
        return pa.array(np.zeros(n, dtype=bool))
    toks, doc_idx, _dl = tokenize_flat(field)
    hit = pc.fill_null(
        pc.is_in(toks, value_set=pa.array(qterms, type=pa.string())), False
    ).to_numpy(zero_copy_only=False).astype(bool)
    return pa.array(_hits_to_rows(n, doc_idx, hit))


def _phrase_terms(query: str, who: str) -> list[str]:
    """Analyze a phrase string into single-token terms.  Words that
    tokenize to COMPOUND tokens (camelCase/snake_case split parts —
    position-increment-0 in the index) refuse with a pointer at the
    positional pipelines, instead of silently never matching (the split
    parts land at the END of the token stream, so the adjacency
    intersection below cannot see them)."""
    from ..functions.tokenize import tokenize_query

    terms: list[str] = []
    for w in query.split():
        tw = tokenize_query(w)
        if len(tw) != 1:
            raise ValueError(
                f"esql: {who} phrases over compound tokens are "
                "index-backed — use the phrase pipelines"
            )
        terms.append(tw[0])
    if len(terms) > 64:
        raise ValueError(f"esql: {who} phrase longer than 64 words")
    return terms


def _adjacent_rows(
    n: int,
    toks: pa.Array,
    doc_idx: np.ndarray,
    pos: np.ndarray,
    terms: list[str],
) -> np.ndarray:
    """Rows where ``terms`` occur ADJACENT and in order: intersect
    (doc, pos − i) keys across the terms — a surviving key is a run."""
    if not terms:
        return np.zeros(n, dtype=bool)
    keys = None
    for i, t in enumerate(terms):
        m = pc.fill_null(pc.equal(toks, t), False).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        k_i = doc_idx[m].astype(np.int64) * (1 << 32) + (
            pos[m].astype(np.int64) - i + 64
        )
        keys = k_i if keys is None else np.intersect1d(keys, k_i)
        if len(keys) == 0:
            break
    out = np.zeros(n, dtype=bool)
    if keys is not None and len(keys):
        out[np.unique(keys >> 32)] = True
    return out


def _wild_token_rx(patt: str) -> str:
    """Lucene/KQL wildcard pattern → anchored token regex."""
    return "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in patt.lower()
    ) + "$"


def _qstr_predicate(field: pa.Array, query: str) -> pa.Array:
    """``QSTR(field, "query")`` — Lucene query_string syntax as a batch
    PREDICATE (graft signature names the field explicitly: the pipe has
    no default-field index context; documented deviation).

    Supported leaves: terms, AND/OR/NOT and +/- bool groups, parentheses,
    ``*``/``?`` wildcards, exact (slop-0) phrases — the membership subset
    that evaluates index-free.  Fuzzy, ranges and sloppy phrases are
    index-backed features: refused with a pointer at the
    ``query_string_topk`` pipeline."""
    from ..functions.tokenize import tokenize_flat, tokenize_query
    from .lucene import parse_query_string

    node = parse_query_string(query)
    n = len(field)
    if n == 0:
        return pa.array(np.zeros(0, dtype=bool))
    toks, doc_idx, _dl, pos = tokenize_flat(field, return_positions=True)

    def term_any(terms: list[str]) -> np.ndarray:
        if not terms:
            return np.zeros(n, dtype=bool)
        hit = pc.fill_null(
            pc.is_in(
                toks,
                value_set=pa.array(sorted(set(terms)), type=pa.string()),
            ),
            False,
        ).to_numpy(zero_copy_only=False).astype(bool)
        return _hits_to_rows(n, doc_idx, hit)

    def ev(nd) -> np.ndarray:
        k = nd[0]
        if k == "term":
            return term_any(tokenize_query(nd[1]))
        if k == "wild":
            hit = pc.fill_null(
                pc.match_substring_regex(toks, _wild_token_rx(nd[1])), False
            ).to_numpy(zero_copy_only=False).astype(bool)
            return _hits_to_rows(n, doc_idx, hit)
        if k == "phrase":
            text, slop = nd[1], nd[2]
            if slop:
                raise ValueError(
                    "esql: QSTR sloppy phrases are index-backed — use the "
                    "query_string_topk pipeline"
                )
            return _adjacent_rows(
                n, toks, doc_idx, pos, _phrase_terms(text, "QSTR")
            )
        if k == "not":
            return ~ev(nd[1])
        if k == "boost":  # boosts rank, never filters
            return ev(nd[1])
        if k == "and":
            r = ev(nd[1][0])
            for c in nd[1][1:]:
                r &= ev(c)
            return r
        if k == "or":
            r = ev(nd[1][0])
            for c in nd[1][1:]:
                r |= ev(c)
            return r
        if k == "bool":
            must, must_not, should = nd[1], nd[2], nd[3]
            r = np.ones(n, dtype=bool)
            for c in must:
                r &= ev(c)
            for c in must_not:
                r &= ~ev(c)
            if should and not must:  # pure-should: at least one (ES)
                s = np.zeros(n, dtype=bool)
                for c in should:
                    s |= ev(c)
                r &= s
            return r
        raise ValueError(
            f"esql: QSTR {k!r} leaves are index-backed — use the "
            "query_string_topk pipeline"
        )

    return pa.array(ev(node))


def _phrase_predicate(field: pa.Array, query: str) -> pa.Array:
    """``MATCH_PHRASE(field, "query")``: true iff the analyzed query terms
    occur ADJACENT and in order among the field's analyzed tokens — the
    (doc, pos − i) key-intersection plan shared with QSTR quoted phrases
    (``_adjacent_rows``), evaluated index-free per batch.  Compound-token
    phrases refuse like QSTR (see ``_phrase_terms``)."""
    from ..functions.tokenize import tokenize_flat

    n = len(field)
    terms = _phrase_terms(query, "MATCH_PHRASE")
    if not terms or n == 0:
        return pa.array(np.zeros(n, dtype=bool))
    toks, doc_idx, _dl, pos = tokenize_flat(field, return_positions=True)
    return pa.array(_adjacent_rows(n, toks, doc_idx, pos, terms))


# ---------------------------------------------------------------- KQL

_KQL_TOKEN = re.compile(
    r'\s*(\(|\)|"(?:[^"\\]|\\.)*"|[Aa][Nn][Dd]\b|[Oo][Rr]\b|[Nn][Oo][Tt]\b'
    r"|[^\s():]+:|[^\s()]+)"
)


def _kql_parse(src: str):
    """Parse the KQL subset the graft evaluates index-free: ``field:value``
    leaves (bare word, ``"quoted phrase"``, ``*``/``?`` wildcards) combined
    with AND / OR / NOT and parentheses.  ``field:(a or b)`` groups and
    range operators are refused with a pointer at the richer pipelines."""
    src = src.strip()  # the token regex needs a non-space tail to anchor on
    toks: list[str] = []
    i = 0
    while i < len(src):
        m = _KQL_TOKEN.match(src, i)
        if not m:
            raise ValueError(f"esql: KQL cannot lex at {src[i:i+20]!r}")
        toks.append(m.group(1))
        i = m.end()
    p = [0]

    def peek() -> str | None:
        return toks[p[0]] if p[0] < len(toks) else None

    def take() -> str:
        t = toks[p[0]]
        p[0] += 1
        return t

    def primary():
        t = peek()
        if t == "(":
            take()
            node = or_expr()
            if peek() != ")":
                raise ValueError("esql: KQL unbalanced parenthesis")
            take()
            return node
        if t is None or t in (")",):
            raise ValueError("esql: KQL expected a field:value leaf")
        if t.lower() == "not":
            take()
            return ("not", primary())
        if not t.endswith(":"):
            raise ValueError(
                f"esql: KQL leaf {t!r} has no field — the graft signature "
                "requires explicit field:value"
            )
        field = take()[:-1]
        v = peek()
        if v is None or v in ("(", ")"):
            raise ValueError(
                "esql: KQL field:(...) groups are not supported — "
                "distribute the field over the parenthesis"
            )
        take()
        if v.startswith('"'):
            return ("phrase", field, v[1:-1])
        if "*" in v or "?" in v:
            return ("wild", field, v)
        return ("term", field, v)

    def and_expr():
        node = primary()
        while (t := peek()) is not None and t.lower() == "and":
            take()
            node = ("and", node, primary())
        return node

    def or_expr():
        node = and_expr()
        while (t := peek()) is not None and t.lower() == "or":
            take()
            node = ("or", node, and_expr())
        return node

    node = or_expr()
    if p[0] != len(toks):
        raise ValueError(f"esql: KQL trailing input {toks[p[0]]!r}")
    return node


def _kql_fields(node, acc: set[str]) -> None:
    if node[0] in ("term", "phrase", "wild"):
        acc.add(node[1])
    elif node[0] == "not":
        _kql_fields(node[1], acc)
    else:
        _kql_fields(node[1], acc)
        _kql_fields(node[2], acc)


def _kql_predicate(batch: pa.Table, query: str) -> pa.Array:
    """``KQL("query")`` over the batch's own columns (ES KQL resolves
    fields from the index mapping; here, from the pipe schema): term
    leaves reuse the MATCH membership plan, quoted phrases the adjacency
    plan, wildcards a token regex.  Each referenced field is tokenized
    ONCE per batch (cached), however many leaves touch it."""
    from ..functions.tokenize import tokenize_flat, tokenize_query

    node = _kql_parse(query)
    n = batch.num_rows
    tok_cache: dict[str, tuple] = {}

    def field_toks(name: str) -> tuple:
        if name not in tok_cache:
            if name not in batch.column_names:
                raise ValueError(f"esql: KQL unknown field {name!r}")
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if not pa.types.is_string(c.type) and not pa.types.is_large_string(
                c.type
            ):
                c = c.cast(pa.string())
            tok_cache[name] = tokenize_flat(c, return_positions=True)
        return tok_cache[name]

    def ev(nd) -> np.ndarray:
        k = nd[0]
        if k == "term":
            toks, doc_idx, _dl, _pos = field_toks(nd[1])
            qterms = sorted(set(tokenize_query(nd[2])))
            if not qterms:
                return np.zeros(n, dtype=bool)
            hit = pc.fill_null(
                pc.is_in(toks, value_set=pa.array(qterms, type=pa.string())),
                False,
            ).to_numpy(zero_copy_only=False).astype(bool)
            return _hits_to_rows(n, doc_idx, hit)
        if k == "phrase":
            toks, doc_idx, _dl, pos = field_toks(nd[1])
            return _adjacent_rows(
                n, toks, doc_idx, pos, _phrase_terms(nd[2], "KQL")
            )
        if k == "wild":
            toks, doc_idx, _dl, _pos = field_toks(nd[1])
            hit = pc.fill_null(
                pc.match_substring_regex(toks, _wild_token_rx(nd[2])), False
            ).to_numpy(zero_copy_only=False).astype(bool)
            return _hits_to_rows(n, doc_idx, hit)
        if k == "not":
            return ~ev(nd[1])
        if k == "and":
            return ev(nd[1]) & ev(nd[2])
        if k == "or":
            return ev(nd[1]) | ev(nd[2])
        raise AssertionError(k)

    return pa.array(ev(node))


# ---------------------------------------------------- dissect / grok

# the grok pattern library subset the graft ships (Logstash core names)
_GROK_LIB = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(int|float))?\}")


def java_to_strptime(patt: str) -> str:
    """Translate the common Java date-format tokens (yyyy/MM/dd/HH/mm/ss)
    to strptime; unknown alpha tokens refuse.  Shared by ES|QL DATE_PARSE
    and the ingest ``date`` processor."""
    out: list[str] = []
    i = 0
    java = {"yyyy": "%Y", "MM": "%m", "dd": "%d", "HH": "%H", "mm": "%M", "ss": "%S"}
    while i < len(patt):
        for tok in ("yyyy", "MM", "dd", "HH", "mm", "ss"):
            if patt.startswith(tok, i):
                out.append(java[tok])
                i += len(tok)
                break
        else:
            if patt[i].isalpha():
                raise ValueError(
                    f"esql: DATE_PARSE unsupported pattern token at {patt[i:]!r}"
                )
            out.append(patt[i])
            i += 1
    return "".join(out)


def compile_grok(
    pattern: str, pattern_definitions: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str]]]:
    """Grok pattern → (RE2 regex with named groups, [(field, type)]).

    Text outside ``%{...}`` is regex (Logstash semantics); ``%{NAME}``
    without a field name matches without extracting; ``:int``/``:float``
    request the ES|QL typed conversions; ``pattern_definitions`` adds
    custom names for THIS compile (ES grok processor option)."""
    lib = dict(_GROK_LIB, **(pattern_definitions or {}))
    fields: list[tuple[str, str]] = []
    out = ["^"]
    pos = 0
    for m in _GROK_REF.finditer(pattern):
        out.append(pattern[pos : m.start()])
        name, field, typ = m.groups()
        if name not in lib:
            raise ValueError(f"esql: unknown grok pattern %{{{name}}}")
        if field is None:
            out.append(f"(?:{lib[name]})")
        else:
            if any(f == field for f, _ in fields):
                raise ValueError(f"esql: duplicate grok field {field}")
            fields.append((field, typ or "str"))
            out.append(f"(?P<{field}>{lib[name]})")
        pos = m.end()
    out.append(pattern[pos:])
    out.append("$")
    if not fields:
        raise ValueError("esql: grok pattern extracts no fields")
    return "".join(out), fields


def compile_dissect(
    pattern: str, append_separator: str = ""
) -> tuple[str, list[tuple[str, str | tuple]]]:
    """Dissect pattern → (RE2 regex, [(field, typ)]) where typ is ``'str'``
    or ``('cat', [group, ...], separator)`` for append fields.

    Text outside ``%{...}`` is LITERAL (dissect semantics); each field
    matches up to the next literal separator (the last one consumes the
    rest); ``%{}`` / ``%{?skip}`` match without extracting; ``%{key->}``
    (right padding) lets the FOLLOWING separator repeat; ``%{+key}``
    APPENDS to an earlier capture, joined by ``append_separator``
    (DISSECT's APPEND_SEPARATOR option, default empty)."""
    fields: list[tuple[str, str | tuple]] = []
    appends: dict[str, list[str]] = {}
    segs: list[tuple[str, str | None]] = []  # (regex piece, field or None)
    pos = 0
    pad_next = False
    n_app = 0
    for m in re.finditer(r"%\{([^}]*)\}", pattern):
        lit = re.escape(pattern[pos : m.start()])
        if pad_next and lit:
            lit = f"(?:{lit})+"
        segs.append((lit, None))
        key = m.group(1)
        pad_next = key.endswith("->")
        if pad_next:
            key = key[:-2]
        if key == "" or key.startswith("?"):
            segs.append((r".*?", None))
        elif key.startswith("+"):
            base = key[1:]
            if base not in appends and not any(f == base for f, _ in fields):
                raise ValueError(
                    f"esql: dissect append %{{+{base}}} before %{{{base}}}"
                )
            g = f"__app{n_app}"
            n_app += 1
            appends.setdefault(base, []).append(g)
            segs.append((f"(?P<{g}>.*?)", g))
        else:
            if any(f == key for f, _ in fields):
                raise ValueError(f"esql: duplicate dissect field {key}")
            fields.append((key, "str"))
            segs.append((f"(?P<{key}>.*?)", key))
        pos = m.end()
    lit = re.escape(pattern[pos:])
    if pad_next and lit:
        lit = f"(?:{lit})+"
    segs.append((lit, None))
    if not fields:
        raise ValueError("esql: dissect pattern extracts no fields")
    # a trailing field (no literal after it) consumes the rest: greedy
    tail = [s for s in segs if s[0]]
    if tail and tail[-1][1] is not None:
        last_key = tail[-1][1]
        segs = [
            (f"(?P<{last_key}>.*)", last_key) if k == last_key else (r_, k)
            for r_, k in segs
        ]
    # rewrite appended fields to a concatenation instruction over the
    # base capture + its append groups, in pattern order
    fields = [
        (f, ("cat", [f] + appends[f], append_separator)) if f in appends
        else (f, t)
        for f, t in fields
    ]
    return "^" + "".join(r_ for r_, _ in segs) + "$", fields


def tokenize_esql(src: str) -> list[tuple[str, str]]:
    """Lex an ES|QL source string into (kind, text) tokens."""
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise ValueError(f"esql: cannot lex at offset {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        # exact-lowercase ``completion`` / ``ts`` stay idents: they are
        # COLUMN names (COMPLETION's default output; the events table's
        # time column), so commands must be able to reference them; the
        # command keyword is any other casing (the convention everywhere
        # in this engine — gate pipes write commands uppercase)
        if (
            kind == "ident"
            and text.upper() in _KEYWORDS | _UNSUPPORTED
            and text not in ("completion", "ts")
        ):
            out.append(("kw", text.upper()))
        else:
            out.append((kind, text))
    return out


# ---------------------------------------------------------------- parser
#
# Expression AST: ("col", name) | ("lit", value) | ("bin", op, l, r)
#               | ("not", e) | ("func", NAME, [args])


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise ValueError(f"esql: expected {text or kind}, got {t}")
        return t

    # precedence: OR < AND < NOT < comparison < additive < multiplicative
    def expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.peek() == ("kw", "OR"):
            self.next()
            left = ("bin", "or", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.peek() == ("kw", "AND"):
            self.next()
            left = ("bin", "and", left, self._not())
        return left

    def _not(self):
        if self.peek() == ("kw", "NOT"):
            self.next()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        left = self._add()
        if self.peek() == ("kw", "IS"):
            # IS [NOT] NULL — ES|QL's null predicates
            self.next()
            neg = self.peek() == ("kw", "NOT")
            if neg:
                self.next()
            self.expect("kw", "NULL")
            node = ("isnull", left)
            return ("not", node) if neg else node
        if self.peek()[0] == "op" and self.peek()[1] in ("==", "!=", ">", ">=", "<", "<="):
            op = self.next()[1]
            return ("bin", op, left, self._add())
        if self.peek() in (("kw", "LIKE"), ("kw", "RLIKE")):
            op = self.next()[1].lower()
            if self.peek() == ("op", "("):
                # ES|QL 9.1 pattern lists: LIKE ("a*", "b*") — any match
                self.next()
                pats: list[str] = []
                while True:
                    item = self._atom()
                    if item[0] != "lit" or not isinstance(item[1], str):
                        raise ValueError(
                            f"esql: {op.upper()} list items must be string "
                            "literals"
                        )
                    pats.append(item[1])
                    if self.peek() == ("op", ","):
                        self.next()
                        continue
                    break
                self.expect("op", ")")
                return (
                    "bin", op, left,
                    ("lit", pats[0] if len(pats) == 1 else pats),
                )
            return ("bin", op, left, self._add())
        if self.peek() == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            vals = []
            while True:
                item = self._atom()
                if item[0] != "lit":
                    raise ValueError("esql: IN list items must be literals")
                vals.append(item[1])
                if self.peek() == ("op", ","):
                    self.next()
                    continue
                break
            self.expect("op", ")")
            return ("bin", "in", left, ("lit", vals))
        return left

    def _add(self):
        left = self._mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = ("bin", op, left, self._mul())
        return left

    def _mul(self):
        left = self._cast()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = ("bin", op, left, self._cast())
        return left

    def _cast(self):
        # ES|QL postfix cast operator: expr::type — sugar for the TO_*
        # conversion functions, binds tighter than * /
        e = self._atom()
        while self.peek() == ("op", "::"):
            self.next()
            k, t = self.next()
            if k not in ("ident", "kw") or t.upper() not in _CAST_TYPES:
                raise ValueError(
                    f"esql: unknown cast type {t!r} "
                    f"(one of {sorted(_CAST_TYPES)})"
                )
            e = ("func", _CAST_TYPES[t.upper()], [e])
        return e

    def _atom(self):
        kind, text = self.next()
        if kind == "num":
            # ES|QL temporal literal: a number directly followed by a time
            # unit identifier (``1 day``, ``12 hours``)
            nk, nt = self.peek()
            if nk == "ident" and nt.upper() in _DUR_UNITS_US and "." not in text:
                self.next()
                u = nt.upper()
                return ("lit", Duration(int(text) * _DUR_UNITS_US[u], unit=u))
            if nk == "ident" and nt.upper() in _CALENDAR_UNITS and "." not in text:
                self.next()
                n_ = int(text)
                if n_ < 1:
                    raise ValueError("esql: calendar periods need n >= 1")
                return ("lit", CalendarPeriod(n_, _CALENDAR_NORM[nt.upper()]))
            return ("lit", float(text) if "." in text else int(text))
        if kind == "str":
            return ("lit", text[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if kind == "op" and text == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        if kind == "op" and text == "[":
            # ES|QL multivalue literal: [1, 2, 3] / ["a", "b"]
            vals = []
            if self.peek() != ("op", "]"):
                while True:
                    item = self._atom()
                    if item[0] != "lit":
                        raise ValueError(
                            "esql: multivalue literal items must be literals"
                        )
                    vals.append(item[1])
                    if self.peek() == ("op", ","):
                        self.next()
                        continue
                    break
            self.expect("op", "]")
            return ("mvlit", vals)
        if kind == "op" and text == "-":
            inner = self._atom()
            if inner[0] == "lit":
                if isinstance(inner[1], CalendarPeriod):
                    raise ValueError(
                        "esql: calendar periods cannot be negated"
                    )
                return ("lit", -inner[1])
            return ("bin", "-", ("lit", 0), inner)
        if kind == "ident":
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr())
                self.expect("op", ")")
                return ("func", text.upper(), args)
            return ("col", text)
        raise ValueError(f"esql: unexpected token {(kind, text)}")


_AGG_FUNCS = {
    "COUNT", "SUM", "MIN", "MAX", "AVG", "STD_DEV", "WEIGHTED_AVG",
    "COUNT_DISTINCT", "VALUES",
    "MEDIAN", "PERCENTILE", "MEDIAN_ABSOLUTE_DEVIATION", "TOP",
    "RATE",
    "MAX_OVER_TIME", "MIN_OVER_TIME", "SUM_OVER_TIME", "COUNT_OVER_TIME",
    "AVG_OVER_TIME", "FIRST_OVER_TIME", "LAST_OVER_TIME",
}
# TS-source *_OVER_TIME aggregates (9.x): the STATS group IS the
# series × bucket, so the decomposable ones rewrite to their plain
# aggregate at parse; FIRST/LAST need ts-ordered endpoints (RATE's plan)
_OVER_TIME_PLAIN = {
    "MAX_OVER_TIME": "MAX", "MIN_OVER_TIME": "MIN",
    "SUM_OVER_TIME": "SUM", "COUNT_OVER_TIME": "COUNT",
    "AVG_OVER_TIME": "AVG",
}
_ENDPOINT_FAMILY = {"RATE", "FIRST_OVER_TIME", "LAST_OVER_TIME"}
# mergeable-by-column-partial aggregates: compose freely with each other,
# with per-aggregate WHERE, and with INLINESTATS' join-back plan
_DECOMPOSABLE = {"COUNT", "SUM", "MIN", "MAX", "AVG", "STD_DEV", "WEIGHTED_AVG"}
# partial = distinct (by, col) tuples (combine = distinct again)
_DISTINCT_FAMILY = {"COUNT_DISTINCT", "VALUES"}
# partial = per-group value counts (combine = sum counts, then finish)
_VALUECOUNT_FAMILY = {"MEDIAN", "PERCENTILE", "MEDIAN_ABSOLUTE_DEVIATION", "TOP"}


@dataclass
class EsqlPlan:
    table: str | None
    # row ops in PIPE ORDER (a WHERE may reference an earlier EVAL's column):
    # ("where", expr) | ("eval", name, expr)
    ops: list[tuple] = field(default_factory=list)
    # (out, fn, col, filter_expr|None, param) — filter is ES 8.16's
    # per-aggregate ``STATS agg(...) WHERE cond`` predicate; param carries
    # the extra argument of multi-arg aggregates (WEIGHTED_AVG's weight
    # column, PERCENTILE's p, TOP's (k, order))
    stats: list[tuple] = field(default_factory=list)
    by: list[str] = field(default_factory=list)
    # commands AFTER the first STATS (ES|QL: the aggregation result is a
    # new table, so row commands and further STATS may follow) — applied
    # driver-side on the group-bounded combined result:
    # ("where", e) | ("eval", name, e) | ("rename", old, new) |
    # ("stats", stats2, by2)
    post: list[tuple] = field(default_factory=list)
    sort: list[tuple[str, bool]] = field(default_factory=list)  # (col, descending)
    limit: int | None = None
    keep: list[str] | None = None
    drop: list[str] = field(default_factory=list)
    row: dict[str, object] | None = None  # ROW literal source
    ts: bool = False  # TS source command (time-series aggregates legal)
    # CHANGE_POINT value ON key [AS type_name, pvalue_name] — terminal
    changepoint: tuple[str, str, str, str] | None = None
    # FROM idx METADATA _index, _id, ... — requested metadata columns
    metadata: list[str] = field(default_factory=list)


def _parse_agg_list(p: "_Parser") -> tuple[list[tuple], list[str]]:
    """Parse ``out = AGG(col) [WHERE cond], ... [BY k, ...]`` — the shared
    body of STATS and INLINESTATS.  The optional WHERE is ES 8.16's
    per-aggregate filter; it composes with every decomposable aggregate
    because the partial simply null-masks the source column (Arrow
    aggregates skip nulls, exactly SQL ``FILTER`` semantics)."""
    stats: list[tuple] = []
    by: list[str] = []
    if p.peek() == ("kw", "BY"):
        # agg-less ``STATS BY a, b`` — ES|QL's DISTINCT over the keys
        p.next()
        while True:
            by.append(p.expect("ident")[1])
            if p.peek() != ("op", ","):
                break
            p.next()
        return stats, by
    while True:
        name = p.expect("ident")[1]
        p.expect("op", "==")
        fn = p.expect("ident")[1].upper()
        if fn not in _AGG_FUNCS:
            raise ValueError(f"esql: unknown aggregate {fn}")
        p.expect("op", "(")
        col: str | None = None
        if p.peek() != ("op", ")"):
            t = p.next()
            if t == ("ident", "*") or t[1] == "*":
                col = None
            else:
                col = t[1]
        # optional extra literal/column arguments of multi-arg aggregates
        extra: list[tuple[str, str]] = []
        while p.peek() == ("op", ","):
            p.next()
            extra.append(p.next())
        p.expect("op", ")")
        if fn != "COUNT" and col is None:
            raise ValueError(f"esql: {fn} needs a column argument")
        param: object = None
        if fn == "WEIGHTED_AVG":
            if len(extra) != 1 or extra[0][0] != "ident":
                raise ValueError(
                    "esql: WEIGHTED_AVG(value, weight) takes a weight column"
                )
            param = extra[0][1]
        elif fn == "PERCENTILE":
            if len(extra) != 1 or extra[0][0] != "num":
                raise ValueError(
                    "esql: PERCENTILE(field, p) takes a numeric percentile"
                )
            param = float(extra[0][1])
            if not 0.0 <= param <= 100.0:
                raise ValueError("esql: PERCENTILE p must be in [0, 100]")
        elif fn == "TOP":
            order = extra[1][1][1:-1].lower() if len(extra) == 2 else ""
            if (
                len(extra) != 2
                or extra[0][0] != "num"
                or extra[1][0] != "str"
                or order not in ("asc", "desc")
            ):
                raise ValueError(
                    'esql: TOP(field, limit, "asc"|"desc") — limit is a '
                    "positive integer"
                )
            k = int(float(extra[0][1]))
            if k < 1:
                raise ValueError("esql: TOP limit must be >= 1")
            param = (k, order)
        elif fn == "COUNT_DISTINCT" and extra:
            # ES's optional precision_threshold (HLL accuracy hint) —
            # parse-accepted and recorded; the graft's distinct-tuple
            # partial is EXACT at every cardinality, a strict upgrade
            if len(extra) != 1 or extra[0][0] != "num":
                raise ValueError(
                    "esql: COUNT_DISTINCT(field, precision) takes a "
                    "numeric precision threshold"
                )
            param = int(float(extra[0][1]))
        elif extra:
            raise ValueError(f"esql: {fn} takes a single column argument")
        filt = None
        if p.peek() == ("kw", "WHERE"):
            p.next()
            filt = p.expr()
            if fn not in _DECOMPOSABLE:
                raise ValueError(
                    f"esql: {fn} does not support a per-aggregate WHERE "
                    "(its partial is a shared row stream, not a maskable "
                    "column)"
                )
        stats.append((name, fn, col, filt, param))
        if p.peek() != ("op", ","):
            break
        p.next()
    if p.peek() == ("kw", "BY"):
        p.next()
        while True:
            by.append(p.expect("ident")[1])
            if p.peek() != ("op", ","):
                break
            p.next()
    cds = [s_ for s_ in stats if s_[1] in _DISTINCT_FAMILY]
    if cds and len(cds) != len(stats):
        raise ValueError(
            "esql: COUNT_DISTINCT/VALUES cannot mix with other aggregates "
            "in one STATS (their partial is a distinct-row stream)"
        )
    meds = [s_ for s_ in stats if s_[1] in _VALUECOUNT_FAMILY]
    if meds and len(stats) != 1:
        raise ValueError(
            f"esql: {meds[0][1]} must be the only aggregate in STATS (its "
            "partial is a value-count stream)"
        )
    rates = [s_ for s_ in stats if s_[1] in _ENDPOINT_FAMILY]
    if rates and len(stats) != 1:
        raise ValueError(
            f"esql: {rates[0][1]} must be the only aggregate in STATS "
            "(its partial is a per-group endpoint stream)"
        )
    return stats, by


def parse_esql(src: str) -> EsqlPlan:
    """Parse one ES|QL pipe into an :class:`EsqlPlan` (verification included)."""
    toks = tokenize_esql(src)
    p = _Parser(toks)
    kind, first = p.next()
    if kind != "kw" or first not in ("FROM", "ROW", "SHOW", "TS"):
        raise ValueError("esql: a pipe starts with FROM, TS, ROW or SHOW")
    if first in ("FROM", "TS"):
        # TS (9.x time-series source): same scan, but the time-series
        # aggregates (RATE) become legal and bind to the ``ts`` column
        plan = EsqlPlan(table=p.expect("ident")[1], ts=(first == "TS"))
        # FROM idx METADATA _index, _id [, _version, _score] (ES|QL's
        # metadata-field request; exact-case METADATA like the docs)
        if p.peek() == ("ident", "METADATA"):
            p.next()
            while True:
                m_ = p.expect("ident")[1]
                if m_ not in ("_index", "_id", "_version", "_score"):
                    raise ValueError(
                        f"esql: unknown metadata field {m_!r} (one of "
                        "_index, _id, _version, _score)"
                    )
                plan.metadata.append(m_)
                if p.peek() != ("op", ","):
                    break
                p.next()
    elif first == "SHOW":
        # SHOW INFO — the deterministic one-row version source; INFO is
        # the only SHOW item ES|QL defines
        item = p.expect("ident")[1]
        if item.upper() != "INFO":
            raise ValueError(f"esql: SHOW supports only INFO, got {item!r}")
        plan = EsqlPlan(table=None, row=dict(_SHOW_INFO_ROW))
    else:
        # ROW a = 1, b = "x" — a literal one-row source (ES|QL's testing
        # and scripting utility)
        row: dict[str, object] = {}
        while True:
            name = p.expect("ident")[1]
            p.expect("op", "==")
            node = p.expr()
            if node[0] not in ("lit", "mvlit"):
                raise ValueError("esql: ROW values must be literals")
            row[name] = node[1]
            if p.peek() != ("op", ","):
                break
            p.next()
        plan = EsqlPlan(table=None, row=row)
    while p.peek() != ("eof", ""):
        p.expect("op", "|")
        kind, cmd = p.next()
        if kind != "kw":
            raise ValueError(f"esql: expected a command after '|', got {cmd!r}")
        if cmd in _UNSUPPORTED:
            raise ValueError(f"esql: unsupported command {cmd}")
        if plan.changepoint is not None:
            raise ValueError(
                "esql: CHANGE_POINT must be the last command in the pipe"
            )
        if (plan.stats or plan.by) and cmd in ("DISSECT", "GROK", "LOOKUP", "MV_EXPAND",
                                  "ENRICH", "INLINESTATS", "SAMPLE",
                                  "COMPLETION", "RERANK"):
            raise ValueError(
                f"esql: {cmd} after STATS is not supported (only WHERE / "
                "EVAL / RENAME / STATS compose with the aggregated result)"
            )
        # WHERE/EVAL/RENAME after STATS operate on the aggregation result
        # (a new, group-bounded table) — routed to plan.post
        tgt = plan.post if (plan.stats or plan.by) else plan.ops
        if cmd == "WHERE":
            tgt.append(("where", p.expr()))
        elif cmd == "EVAL":
            while True:
                name = p.expect("ident")[1]
                p.expect("op", "==")  # lexer folds '=' ... see below
                tgt.append(("eval", name, p.expr()))
                if p.peek() != ("op", ","):
                    break
                p.next()
        elif cmd == "RENAME":
            while True:
                old = p.expect("ident")[1]
                p.expect("kw", "AS")
                new = p.expect("ident")[1]
                tgt.append(("rename", old, new))
                if p.peek() != ("op", ","):
                    break
                p.next()
        elif cmd == "LOOKUP":
            p.expect("kw", "JOIN")
            table = p.expect("ident")[1]
            p.expect("kw", "ON")
            key = p.expect("ident")[1]
            plan.ops.append(("lookup", table, key))
        elif cmd == "INSIST_\U0001F414":
            # ES|QL 9.x tech preview: coerce a possibly-unmapped field into
            # the pipe — mapped fields pass through, unmapped ones appear
            # as null keyword columns.  ES restricts it to directly after
            # FROM (or another INSIST); mirror that.
            if plan.row is not None or plan.stats or plan.by or any(
                op[0] != "insist" for op in plan.ops
            ):
                raise ValueError(
                    "esql: INSIST_\U0001F414 must directly follow FROM "
                    "(or another INSIST_\U0001F414)"
                )
            plan.ops.append(("insist", p.expect("ident")[1]))
        elif cmd == "MV_EXPAND":
            plan.ops.append(("mvexpand", p.expect("ident")[1]))
        elif cmd == "ENRICH":
            policy = p.expect("ident")[1]
            if policy not in _ENRICH_POLICIES:
                raise ValueError(f"esql: unknown enrich policy {policy!r}")
            p.expect("kw", "ON")
            plan.ops.append(("enrich", policy, p.expect("ident")[1]))
        elif cmd in ("DISSECT", "GROK"):
            src_col = p.expect("ident")[1]
            raw = p.expect("str")[1]
            pat = re.sub(r"\\(.)", r"\1", raw[1:-1])
            app_sep = ""
            if p.peek() == ("ident", "APPEND_SEPARATOR"):
                # DISSECT option: the string joining %{+key} appends
                if cmd != "DISSECT":
                    raise ValueError("esql: APPEND_SEPARATOR is DISSECT-only")
                p.next()
                p.expect("op", "==")  # '=' normalized to '==' by the lexer
                app_sep = p.expect("str")[1][1:-1]
            regex, fields = (
                compile_dissect(pat, append_separator=app_sep)
                if cmd == "DISSECT"
                else compile_grok(pat)
            )
            plan.ops.append(("parse", src_col, regex, fields))
        elif cmd == "STATS":
            if plan.stats or plan.by:
                # re-aggregation of the combined result (ES|QL allows
                # arbitrary STATS depth); decomposable aggregates only —
                # the input is already a driver-side table
                st2, by2 = _parse_agg_list(p)
                bad = [s_ for s_ in st2 if s_[1] not in _DECOMPOSABLE]
                if bad:
                    raise ValueError(
                        f"esql: {bad[0][1]} is not supported in a "
                        "post-STATS re-aggregation (decomposable "
                        "aggregates only)"
                    )
                plan.post.append(("stats", st2, by2))
            else:
                plan.stats, plan.by = _parse_agg_list(p)
                ts_only = [
                    s_ for s_ in plan.stats
                    if s_[1] in _ENDPOINT_FAMILY or s_[1] in _OVER_TIME_PLAIN
                ]
                if ts_only and not plan.ts:
                    raise ValueError(
                        f"esql: {ts_only[0][1]} requires the TS time-series "
                        "source command (start the pipe with TS, not FROM)"
                    )
                # decomposable *_OVER_TIME: over-time == over-group
                plan.stats = [
                    (s_[0], _OVER_TIME_PLAIN.get(s_[1], s_[1]), *s_[2:])
                    for s_ in plan.stats
                ]
        elif cmd == "INLINESTATS":
            # ES|QL INLINESTATS (8.18 tech preview): adds the grouped
            # aggregates as COLUMNS on every row (a window function) —
            # later commands can reference them (the canonical use:
            # WHERE value > avg).  Decomposable aggregates only; the
            # execution is ES's own two-phase agg + join-back plan.
            istats, iby = _parse_agg_list(p)
            if not istats:
                raise ValueError(
                    "esql: INLINESTATS needs at least one aggregate"
                )
            bad = [s_ for s_ in istats if s_[1] not in _DECOMPOSABLE]
            if bad:
                raise ValueError(
                    f"esql: INLINESTATS does not support {bad[0][1]} (only "
                    "decomposable aggregates join back onto the row stream)"
                )
            plan.ops.append(("inline", istats, iby))
        elif cmd == "SAMPLE":
            # deterministic variant of ES|QL SAMPLE (tech preview): the
            # keep decision is a pure function of the row's FIRST projected
            # column (sha256 prefix < p·2^16), not an RNG — same rows on
            # any cluster size / shard order, replayable, and expressible
            # as a SQL oracle.  Documented deviation from ES's random
            # sampling (which is nondeterministic by design).
            prob = float(p.expect("num")[1])
            if not 0.0 < prob < 1.0:
                raise ValueError("esql: SAMPLE probability must be in (0, 1)")
            plan.ops.append(("sample", prob, None))  # key bound at run time
        elif cmd == "CHANGE_POINT":
            # CHANGE_POINT value ON key [AS type_name, pvalue_name] —
            # terminal command; see _apply_change_point for the
            # deterministic mean-shift semantics
            val = p.expect("ident")[1]
            p.expect("kw", "ON")
            key = p.expect("ident")[1]
            tname, pname = "type", "pvalue"
            if p.peek() == ("kw", "AS"):
                p.next()
                tname = p.expect("ident")[1]
                p.expect("op", ",")
                pname = p.expect("ident")[1]
            plan.changepoint = (val, key, tname, pname)
        elif cmd == "COMPLETION":
            # COMPLETION [out =] prompt_expr WITH endpoint_id — the
            # endpoint is a registered deterministic fake (no model
            # runtime in the container); output column defaults to
            # ES's ``completion``
            out_name = "completion"
            if (
                p.peek()[0] == "ident"
                and p.i + 1 < len(p.toks)
                and p.toks[p.i + 1] == ("op", "==")
            ):
                out_name = p.next()[1]
                p.next()
            prompt = p.expr()
            p.expect("kw", "WITH")
            endpoint = p.expect("ident")[1]
            kind_, _fn = _INFERENCE_ENDPOINTS.get(endpoint, (None, None))
            if kind_ != "completion":
                raise ValueError(
                    f"esql: unknown completion endpoint {endpoint!r} "
                    f"(registered: {sorted(_INFERENCE_ENDPOINTS)})"
                )
            plan.ops.append(("completion", out_name, prompt, endpoint))
        elif cmd == "RERANK":
            # RERANK "query" ON field WITH endpoint_id — scores land in
            # ES's ``_score`` column (follow with SORT _score DESC)
            qraw = p.expect("str")[1]
            p.expect("kw", "ON")
            fld = p.expect("ident")[1]
            p.expect("kw", "WITH")
            endpoint = p.expect("ident")[1]
            kind_, _fn = _INFERENCE_ENDPOINTS.get(endpoint, (None, None))
            if kind_ != "rerank":
                raise ValueError(
                    f"esql: unknown rerank endpoint {endpoint!r} "
                    f"(registered: {sorted(_INFERENCE_ENDPOINTS)})"
                )
            plan.ops.append(("rerank", qraw[1:-1], fld, endpoint))
        elif cmd == "FORK":
            raise ValueError(
                "esql: FORK branches are split at the pipe level — "
                "run_esql handles FORK; parse_esql only sees single pipes"
            )
        elif cmd == "SORT":
            while True:
                col = p.expect("ident")[1]
                desc = False
                if p.peek() in (("kw", "ASC"), ("kw", "DESC")):
                    desc = p.next()[1] == "DESC"
                nf = None
                pk, pt = p.peek()
                if pk == "ident" and pt.upper() == "NULLS":
                    p.next()
                    wk, wt = p.next()
                    if wk != "ident" or wt.upper() not in ("FIRST", "LAST"):
                        raise ValueError("esql: SORT ... NULLS FIRST|LAST")
                    nf = wt.upper() == "FIRST"
                plan.sort.append((col, desc, nf))
                if p.peek() != ("op", ","):
                    break
                p.next()
        elif cmd == "LIMIT":
            plan.limit = int(p.expect("num")[1])
        elif cmd == "KEEP":
            cols = []
            while True:
                cols.append(p.expect("ident")[1])
                if p.peek() != ("op", ","):
                    break
                p.next()
            plan.keep = cols
        elif cmd == "DROP":
            while True:
                plan.drop.append(p.expect("ident")[1])
                if p.peek() != ("op", ","):
                    break
                p.next()
        else:
            raise ValueError(f"esql: command {cmd} not valid mid-pipe")
    if (plan.limit is not None and not plan.stats and not plan.by
            and not plan.sort):
        raise ValueError(
            "esql: LIMIT without SORT is nondeterministic under parallel "
            "execution — add a total-ordering SORT"
        )
    return plan


# ES|QL uses a single '=' in EVAL/STATS; the lexer has no '=' token, so map
# it to '==' before lexing (unambiguous: '==' stays '==').
def _normalize_assign(src: str) -> str:
    parts = re.split(r'("(?:[^"\\]|\\.)*")', src)  # leave string literals alone
    return "".join(
        p if i % 2 else re.sub(r"(?<![=!<>])=(?!=)", "==", p)
        for i, p in enumerate(parts)
    )


# ------------------------------------------------------------- evaluator


def _as_array(v):
    return v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v


def _np_group_quantile(par: np.ndarray, vals: np.ndarray, n: int, q: float) -> np.ndarray:
    """Per-group linear-interpolated quantile, vectorized: lexsort the
    (group, value) pairs, lerp at index (len-1)*q within each run.  The
    interpolation is ``lo*(1-f) + hi*f`` — DuckDB's quantile_cont formula
    bit-for-bit (verified empirically; ``lo+(hi-lo)*f`` differs in the
    last ulp), so the SQL oracle can value-hash-match.  Groups absent
    from ``par`` come back NaN."""
    if len(par) == 0:
        return np.full(n, np.nan)
    order = np.lexsort((vals, par))
    par_s, v_s = par[order], vals[order]
    starts = np.flatnonzero(np.r_[True, par_s[1:] != par_s[:-1]])
    lens = np.r_[starts[1:], len(par_s)] - starts
    idx = (lens - 1) * q
    lo = np.floor(idx).astype(np.int64)
    hi = np.ceil(idx).astype(np.int64)
    fr = idx - lo
    res = v_s[starts + lo] * (1.0 - fr) + v_s[starts + hi] * fr
    out = np.full(n, np.nan)
    out[par_s[starts]] = res
    return out


_WKT_POINT = re.compile(
    r"^\s*POINT\s*\(\s*(?P<x>[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s+"
    r"(?P<y>[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s*\)\s*$"
)


def _geopoint_xy(v) -> tuple:
    """(lon, lat) float64 of a WKT-string geo_point column or literal;
    malformed rows come back NaN (masked to null by the callers)."""
    if isinstance(v, str):
        m = _WKT_POINT.match(v)
        if not m:
            raise ValueError(f"esql: not a WKT POINT literal: {v!r}")
        return float(m.group("x")), float(m.group("y"))
    arr = pc.cast(_as_array(v), pa.string())
    st = pc.extract_regex(arr, pattern=_WKT_POINT.pattern)
    ok = pc.is_valid(st).to_numpy(zero_copy_only=False)
    def col(f_: str) -> np.ndarray:
        c = pc.struct_field(st, f_).cast(pa.float64()).to_numpy(zero_copy_only=False)
        return np.where(ok, c, np.nan)
    return col("x"), col("y")


_WKT_POLYGON = re.compile(
    r"^\s*POLYGON\s*\(\s*\(\s*(?P<body>[^()]+?)\s*\)\s*\)\s*$", re.IGNORECASE
)
_WKT_BBOX = re.compile(
    r"^\s*BBOX\s*\(\s*(?P<x0>-?\d+(?:\.\d+)?)\s*,\s*(?P<x1>-?\d+(?:\.\d+)?)"
    r"\s*,\s*(?P<y1>-?\d+(?:\.\d+)?)\s*,\s*(?P<y0>-?\d+(?:\.\d+)?)\s*\)\s*$",
    re.IGNORECASE,
)


def _parse_wkt_shape(s: str):
    """Literal WKT → ``("point", (x, y))`` / ``("polygon", closed ring
    (m, 2) float64)`` / ``("bbox", (xmin, xmax, ymax, ymin))`` / None for
    malformed input.  Single outer ring only — ES|QL's own geo_shape
    grammar is far wider (holes, multi-*); the graft covers the
    point/polygon/envelope relations its queries exercise."""
    m = _WKT_POINT.match(s)
    if m:
        return ("point", (float(m.group("x")), float(m.group("y"))))
    m = _WKT_POLYGON.match(s)
    if m:
        pts = []
        for pair in m.group("body").split(","):
            toks = pair.split()
            if len(toks) != 2:
                return None
            try:
                pts.append((float(toks[0]), float(toks[1])))
            except ValueError:
                return None
        if len(pts) < 3:
            return None
        ring = np.asarray(pts, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        return ("polygon", ring)
    m = _WKT_BBOX.match(s)
    if m:
        return (
            "bbox",
            tuple(float(m.group(g)) for g in ("x0", "x1", "y1", "y0")),
        )
    return None


def _points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boundary-inclusive even-odd point-in-polygon: a loop over EDGES,
    vectorized over points (O(E) numpy passes — never per-row Python).
    Works for any simple polygon; convex CCW rings agree with the
    half-plane kernel in pipelines/geo.py."""
    inside = np.zeros(len(px), dtype=bool)
    onedge = np.zeros(len(px), dtype=bool)
    for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        onedge |= (
            (cross == 0.0)
            & (px >= min(ax, bx)) & (px <= max(ax, bx))
            & (py >= min(ay, by)) & (py <= max(ay, by))
        )
        cond = (ay > py) != (by > py)
        xs = ax + (bx - ax) * (py - ay) / np.where(by != ay, by - ay, 1.0)
        inside ^= cond & (px < xs)
    return inside | onedge


def _mv_numeric_parts(col) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, parent indices, float64 flat values) of a numeric list column."""
    n = len(col)
    par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    flat = pc.cast(col.flatten(), pa.float64()).to_numpy(zero_copy_only=False)
    return n, par, flat


def _dense_matrix(col, what: str) -> tuple[np.ndarray, np.ndarray, int]:
    """A dense_vector (list<numeric>) column → ``(matrix (n, d) float64,
    null-row mask, d)``.  ES dense_vector fields are fixed-dimension by
    mapping, so ragged non-null rows REFUSE rather than mis-align; null
    rows pass through (they come back null from every vector function).
    One flatten + one reshape — no per-row Python."""
    col = _as_array(col)
    if not pa.types.is_list(col.type):
        raise ValueError(f"esql: {what} needs a dense_vector (list) column")
    null = pc.is_null(col).to_numpy(zero_copy_only=False)
    lens = (
        pc.list_value_length(col)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    live = lens[~null]
    if live.size and int(live.min()) != int(live.max()):
        raise ValueError(f"esql: {what}: ragged dense_vector column")
    d = int(live[0]) if live.size else 0
    mat = np.zeros((len(lens), d), dtype=np.float64)
    if d:
        if int(live.min()) == 0:
            raise ValueError(f"esql: {what}: ragged dense_vector column")
        flat = pc.cast(col.flatten(), pa.float64()).to_numpy(zero_copy_only=False)
        mat[~null] = flat.reshape(-1, d)
    return mat, null, d


_VECTOR_FUNCS = {"V_COSINE", "V_DOT_PRODUCT", "V_L1_NORM", "V_L2_NORM", "V_HAMMING"}


def _mv_reduce(col, how: str):
    """Per-row reduction of a list column → scalar column, fully
    vectorized: parent-index group_by for min/max (any orderable type),
    run boundaries on the flattened stream for first/last.  Rows whose
    list is null or empty come back null (ES|QL MV_* semantics)."""
    col = _as_array(col)
    if not pa.types.is_list(col.type):
        raise ValueError("esql: MV_* functions need a multi-value (list) column")
    n = len(col)
    par = pc.list_parent_indices(col)
    flat = col.flatten()
    if how in ("first", "last"):
        pnp = par.to_numpy(zero_copy_only=False)
        if len(pnp) == 0:
            return pa.nulls(n, type=col.type.value_type)
        starts = np.flatnonzero(np.r_[True, pnp[1:] != pnp[:-1]])
        pos = starts if how == "first" else np.r_[starts[1:], len(pnp)] - 1
        rows, vals = pnp[starts], flat.take(pa.array(pos, type=pa.int64()))
    else:
        g = pa.table({"i": par, "v": flat}).group_by("i").aggregate([("v", how)])
        rows = g["i"].to_numpy(zero_copy_only=False)
        vals = g[f"v_{how}"].combine_chunks()
    m = np.full(n, -1, dtype=np.int64)
    m[rows] = np.arange(len(rows))
    return pc.take(vals, pa.array(m, mask=m < 0))


def _eval_expr(node: tuple, batch: pa.Table):
    """Evaluate an expression AST against one Arrow batch → Array/scalar."""
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        col = batch[node[1]]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if kind == "not":
        return pc.invert(_eval_expr(node[1], batch))
    if kind == "mvlit":  # multivalue literal: the same list on every row
        # type from a one-element probe so a 0-row batch keeps the list
        # type (a bare pa.array([]) would come back null-typed)
        one = pa.array([node[1]])
        if batch.num_rows == 0:
            return one.slice(0, 0)
        return pa.array([node[1]] * batch.num_rows, type=one.type)
    if kind == "isnull":
        v = _eval_expr(node[1], batch)
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            return pa.array([v is None] * batch.num_rows)
        return pc.is_null(v)
    if kind == "func":
        name, args = node[1], node[2]
        vals = [_eval_expr(a, batch) for a in args]
        if name == "MATCH":
            if len(args) != 2 or not isinstance(vals[1], str):
                raise ValueError('esql: MATCH(field, "query")')
            return _match_predicate(_as_array(vals[0]), vals[1])
        if name == "QSTR":
            if len(args) != 2 or not isinstance(vals[1], str):
                raise ValueError(
                    'esql: QSTR(field, "query") — the graft signature '
                    "names the field explicitly (no index default field)"
                )
            return _qstr_predicate(_as_array(vals[0]), vals[1])
        if name == "MATCH_PHRASE":
            if len(args) != 2 or not isinstance(vals[1], str):
                raise ValueError('esql: MATCH_PHRASE(field, "query")')
            return _phrase_predicate(_as_array(vals[0]), vals[1])
        if name == "TERM":
            # ES|QL TERM(field, "term"): exact term — the QUERY side is
            # not analyzed (ES term query), the field side is
            if len(args) != 2 or not isinstance(vals[1], str):
                raise ValueError('esql: TERM(field, "term")')
            from ..functions.tokenize import tokenize_flat

            fld = _as_array(vals[0])
            toks, doc_idx, _dl = tokenize_flat(fld)
            hit = pc.fill_null(pc.equal(toks, vals[1]), False).to_numpy(
                zero_copy_only=False
            ).astype(bool)
            return pa.array(_hits_to_rows(len(fld), doc_idx, hit))
        if name == "KQL":
            if len(args) != 1 or not isinstance(vals[0], str):
                raise ValueError('esql: KQL("field:value and ...")')
            return _kql_predicate(batch, vals[0])
        if name == "ROUND_TO":
            # ES|QL ROUND_TO(value, p1, p2, ...): round DOWN to the
            # nearest of the fixed points; values below the smallest
            # point clamp to it — one searchsorted
            if len(vals) < 2 or not all(
                isinstance(v_, (int, float)) for v_ in vals[1:]
            ):
                raise ValueError("esql: ROUND_TO needs numeric literal points")
            pts = np.sort(np.asarray([float(v_) for v_ in vals[1:]]))
            x = pc.cast(_as_array(vals[0]), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            idx = np.clip(np.searchsorted(pts, x, side="right") - 1, 0, None)
            out = pts[idx]
            mask = np.isnan(x)
            return pa.array(out, type=pa.float64(), mask=mask)
        if name == "ROUND":
            x = _as_array(vals[0])
            d = int(vals[1]) if len(vals) > 1 else 0
            if not isinstance(x, pa.Array):
                if isinstance(x, pa.Scalar):
                    x = x.as_py()
                return float(sql_round(float(x), d))
            arr = x.cast(pa.float64()).to_numpy(zero_copy_only=False)
            # null in → null out (numpy surfaces nulls as NaN; ES|QL has
            # no NaN value, so the mask restores them)
            return pa.array(
                sql_round(arr, d), type=pa.float64(), mask=np.isnan(arr)
            )
        if name == "ABS":
            return pc.abs(vals[0])
        if name == "LENGTH":
            return pc.utf8_length(vals[0])
        if name == "SPLIT":
            if len(vals) != 2 or not isinstance(vals[1], str):
                raise ValueError("esql: SPLIT needs (column, \"separator\")")
            return pc.split_pattern(vals[0], vals[1])
        if name == "CONCAT":
            parts = [pa.scalar(v) if isinstance(v, str) else v for v in vals]
            return pc.binary_join_element_wise(*parts, "")
        if name == "SUBSTRING":
            # ES|QL 1-based (start, length); the negative-start form is
            # not supported here — raise rather than mis-slice
            start = int(vals[1])
            if start < 1:
                raise ValueError("esql: SUBSTRING start is 1-based positive")
            length = int(vals[2]) if len(vals) > 2 else None
            stop = None if length is None else start - 1 + length
            return pc.utf8_slice_codeunits(vals[0], start - 1, stop)
        if name == "TO_LOWER":
            return pc.utf8_lower(vals[0])
        if name == "TO_UPPER":
            return pc.utf8_upper(vals[0])
        if name == "STARTS_WITH":
            return pc.starts_with(vals[0], pattern=vals[1])
        if name == "COALESCE":
            return pc.coalesce(*vals)
        if name == "CASE":
            # CASE(cond1, val1, ..., [default]) — ES|QL's conditional
            if len(vals) < 2:
                raise ValueError("esql: CASE needs at least (cond, value)")
            default = vals[-1] if len(vals) % 2 == 1 else None
            pairs = vals[: len(vals) - (len(vals) % 2)]
            acc = default
            for cond, val in reversed(list(zip(pairs[::2], pairs[1::2]))):
                acc = pc.if_else(cond, val, acc)
            return acc
        # ---- math (single Arrow kernels; see esql-functions-operators) --
        if name == "CEIL":
            return pc.ceil(vals[0])
        if name == "FLOOR":
            return pc.floor(vals[0])
        if name == "SQRT":
            return pc.sqrt(vals[0])
        if name == "POW":
            return pc.power(vals[0], vals[1])
        if name == "EXP":
            return pc.exp(vals[0])
        if name == "LOG10":
            return pc.log10(vals[0])
        if name == "LOG":
            # ES|QL LOG([base,] value)
            if len(vals) == 2:
                return pc.logb(vals[1], vals[0])
            return pc.ln(vals[0])
        if name == "SIGNUM":
            return pc.sign(vals[0]).cast(pa.float64())
        if name == "SCALB":
            # ES|QL SCALB(d, scaleFactor) = d * 2^scaleFactor (Java
            # Math.scalb) — numpy ldexp, exact for integer factors
            d, k = vals[0], vals[1]
            if not isinstance(k, int):
                raise ValueError("esql: SCALB scaleFactor must be an integer literal")
            if not isinstance(d, (pa.Array, pa.ChunkedArray)):
                return float(np.ldexp(float(d), k))
            x = pc.cast(_as_array(d), pa.float64()).to_numpy(zero_copy_only=False)
            return pa.array(np.ldexp(x, k), type=pa.float64(), mask=np.isnan(x))
        if name == "PI":
            return float(np.pi)
        if name == "E":
            return float(np.e)
        if name == "TAU":
            return float(2 * np.pi)
        if name in ("SIN", "COS", "TAN", "ASIN", "ACOS", "ATAN"):
            v = vals[0]
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                return float(getattr(np, name.lower())(float(v)))
            return getattr(pc, name.lower())(pc.cast(_as_array(v), pa.float64()))
        if name in ("SINH", "COSH", "TANH"):
            v = vals[0]
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                return float(getattr(np, name.lower())(float(v)))
            x = pc.cast(_as_array(v), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            return pa.array(getattr(np, name.lower())(x), type=pa.float64())
        if name == "ATAN2":
            return pc.atan2(
                pc.cast(_as_array(vals[0]), pa.float64()),
                pc.cast(_as_array(vals[1]), pa.float64()),
            )
        if name == "CBRT":
            v = vals[0]
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                return float(np.cbrt(float(v)))
            x = pc.cast(_as_array(v), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            return pa.array(np.cbrt(x), type=pa.float64())
        if name == "NOW":
            raise ValueError(
                "esql: NOW() is nondeterministic under replay — pass the "
                "reference time as a literal (the engine's determinism "
                "contract, same reason SAMPLE is hash-keyed)"
            )
        if name in ("TO_BASE64", "FROM_BASE64"):
            # C base64 dispatch per row (the sha256_column trade)
            import base64

            arr = pc.cast(_as_array(vals[0]), pa.string())
            enc = (
                (lambda s_: base64.b64encode(s_.encode()).decode())
                if name == "TO_BASE64"
                else (lambda s_: base64.b64decode(s_.encode()).decode())
            )
            return pa.array(
                [None if s_ is None else enc(s_) for s_ in arr.to_pylist()],
                type=pa.string(),
            )
        if name in ("TO_DEGREES", "TO_RADIANS"):
            v = vals[0]
            factor = 180.0 / np.pi if name == "TO_DEGREES" else np.pi / 180.0
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                return float(v) * factor
            return pc.multiply(pc.cast(_as_array(v), pa.float64()), factor)
        if name == "TO_BOOLEAN":
            v = vals[0]
            if isinstance(v, str):
                return v.lower() == "true"
            arr = _as_array(v)
            if pa.types.is_string(arr.type):
                return pc.equal(pc.utf8_lower(arr), "true")
            return pc.cast(arr, pa.bool_())
        if name == "HASH":
            # ES|QL 9.x HASH(algorithm, input) — generic hashlib dispatch;
            # unknown algorithms refuse at eval like ES's invalid-arg error
            import hashlib

            algo = vals[0]
            if not isinstance(algo, str):
                raise ValueError("esql: HASH needs a literal algorithm name")
            algo = algo.lower()
            if algo not in hashlib.algorithms_available:
                raise ValueError(f"esql: HASH unknown algorithm {algo!r}")
            if isinstance(vals[1], str):
                return hashlib.new(algo, vals[1].encode()).hexdigest()
            arr = pc.cast(_as_array(vals[1]), pa.string())
            return pa.array(
                [
                    None if s_ is None else hashlib.new(algo, s_.encode()).hexdigest()
                    for s_ in arr.to_pylist()
                ],
                type=pa.string(),
            )
        if name in ("MD5", "SHA1", "SHA256"):
            # hex digests (ES|QL 9.x hash functions) — the Python loop
            # only dispatches into C hashlib, the same trade as
            # functions/hashing.sha256_column
            import hashlib

            arr = pc.cast(_as_array(vals[0]), pa.string())
            algo = name.lower()
            return pa.array(
                [
                    None
                    if s_ is None
                    else hashlib.new(algo, s_.encode()).hexdigest()
                    for s_ in arr.to_pylist()
                ],
                type=pa.string(),
            )
        if name == "BYTE_LENGTH":
            return pc.binary_length(
                pc.cast(_as_array(vals[0]), pa.string())
            ).cast(pa.int64())
        if name == "BIT_LENGTH":
            return pc.multiply(
                pc.binary_length(
                    pc.cast(_as_array(vals[0]), pa.string())
                ).cast(pa.int64()),
                8,
            )
        if name in ("GREATEST", "LEAST"):
            if len(vals) < 2:
                raise ValueError(f"esql: {name} needs at least two arguments")
            kernel = (
                pc.max_element_wise if name == "GREATEST" else pc.min_element_wise
            )
            return kernel(*vals)
        # ---- strings ----------------------------------------------------
        if name == "TRIM":
            return pc.utf8_trim_whitespace(vals[0])
        if name == "LTRIM":
            return pc.utf8_ltrim_whitespace(vals[0])
        if name == "RTRIM":
            return pc.utf8_rtrim_whitespace(vals[0])
        if name == "REVERSE":
            return pc.utf8_reverse(vals[0])
        if name == "REPEAT":
            if not isinstance(vals[1], (int, float)) or int(vals[1]) < 0:
                raise ValueError("esql: REPEAT count must be a literal >= 0")
            return pc.binary_repeat(_as_array(vals[0]), int(vals[1]))
        if name == "SPACE":
            if not isinstance(vals[0], (int, float)) or int(vals[0]) < 0:
                raise ValueError("esql: SPACE count must be a literal >= 0")
            return " " * int(vals[0])
        if name == "ENDS_WITH":
            return pc.ends_with(vals[0], pattern=vals[1])
        if name == "LEFT":
            return pc.utf8_slice_codeunits(vals[0], 0, int(vals[1]))
        if name == "RIGHT":
            # n>len yields the whole string, like ES/DuckDB right()
            return pc.utf8_reverse(
                pc.utf8_slice_codeunits(pc.utf8_reverse(vals[0]), 0, int(vals[1]))
            )
        if name == "REPLACE":
            # ES|QL REPLACE(string, regex, newString) — replaces ALL matches
            if not isinstance(vals[1], str) or not isinstance(vals[2], str):
                raise ValueError("esql: REPLACE needs literal pattern and replacement")
            return pc.replace_substring_regex(vals[0], pattern=vals[1], replacement=vals[2])
        if name == "LOCATE":
            # ES|QL LOCATE(string, substring): 1-based, 0 when absent
            if not isinstance(vals[1], str):
                raise ValueError("esql: LOCATE needs a literal substring")
            return pc.add(pc.find_substring(vals[0], pattern=vals[1]), 1).cast(pa.int64())
        # ---- type conversions -------------------------------------------
        if name == "TO_STRING":
            x = vals[0]
            if isinstance(x, bool):
                return "true" if x else "false"
            if isinstance(x, (int, float, str)):
                return str(x)
            return _as_array(x).cast(pa.string())
        if name in ("TO_INTEGER", "TO_LONG"):
            x = _as_array(vals[0])
            if isinstance(x, str):
                return int(x)
            if isinstance(x, (int, float)):
                return int(x)  # Python int() truncates toward zero, like ES
            if isinstance(x, pa.Array) and pa.types.is_timestamp(x.type):
                # ES: TO_LONG(date) = milliseconds since epoch
                return pc.divide(x.cast(pa.int64()), 1_000)
            if isinstance(x, pa.Array) and pa.types.is_floating(x.type):
                return pc.trunc(x).cast(pa.int64())  # ES truncates toward zero
            return x.cast(pa.int64())
        if name == "TO_DOUBLE":
            x = vals[0]
            if isinstance(x, (int, float, str)):
                return float(x)
            return _as_array(x).cast(pa.float64())
        if name == "TO_DATETIME":
            # ES|QL TO_DATETIME: epoch-ms long → timestamp (TO_LONG's
            # inverse); timestamps pass through; strings refuse with a
            # pointer at DATE_PARSE (ES parses default-format strings —
            # the graft keeps string parsing in one place)
            x = vals[0]
            if isinstance(x, (int, float)):
                return pa.scalar(int(x) * 1_000, type=pa.timestamp("us"))
            x = _as_array(x)
            if pa.types.is_timestamp(x.type):
                return x
            if pa.types.is_string(x.type):
                raise ValueError(
                    "esql: TO_DATETIME(string) — use DATE_PARSE(pattern, s)"
                )
            return pc.multiply(x.cast(pa.int64()), 1_000).cast(pa.timestamp("us"))
        if name in ("TO_TIMEDURATION", "TO_DATEPERIOD"):
            # ES|QL 8.15 string → temporal-amount casts: TIMEDURATION
            # takes sub-day units, DATEPERIOD takes day/week + calendar
            # units — the same Duration / CalendarPeriod values the bare
            # literals produce, so they flow through the identical
            # arithmetic and DATE_TRUNC/BUCKET plumbing
            if len(vals) != 1 or not isinstance(vals[0], str):
                raise ValueError(f'esql: {name}("n unit") needs a literal string')
            m = re.match(r"^\s*(\d+)\s*([A-Za-z]+)\s*$", vals[0])
            if not m:
                raise ValueError(f"esql: {name}: malformed amount {vals[0]!r}")
            n_, unit = int(m.group(1)), m.group(2).upper()
            sub_day = unit in _DUR_UNITS_US and _DUR_UNITS_US[unit] < 86_400_000_000
            if name == "TO_TIMEDURATION":
                if not sub_day:
                    raise ValueError(
                        "esql: TO_TIMEDURATION takes millisecond/second/"
                        "minute/hour units"
                    )
                return Duration(n_ * _DUR_UNITS_US[unit], unit=unit)
            if unit in _CALENDAR_UNITS:
                if n_ < 1:
                    raise ValueError("esql: calendar periods need n >= 1")
                return CalendarPeriod(n_, _CALENDAR_NORM[unit])
            if unit in _DUR_UNITS_US and not sub_day:
                return Duration(n_ * _DUR_UNITS_US[unit], unit=unit)
            raise ValueError(
                "esql: TO_DATEPERIOD takes day/week/month/quarter/year units"
            )
        if name == "TO_UNSIGNED_LONG":
            # ES range failures convert to null (with a warning header);
            # the graft nulls negatives the same way
            x = vals[0]
            if isinstance(x, pa.Scalar):
                x = x.as_py()
            if x is None or isinstance(x, (int, float, str)):
                if x is None:
                    return None
                v = int(float(x)) if not isinstance(x, str) else int(x)
                return v if v >= 0 else None
            x = _as_array(x)
            if pa.types.is_timestamp(x.type):
                x = pc.divide(x.cast(pa.int64()), 1_000)
            elif pa.types.is_floating(x.type):
                x = pc.trunc(x).cast(pa.int64())
            else:
                x = x.cast(pa.int64())
            neg = pc.fill_null(pc.less(x, 0), False)
            # zero the negatives BEFORE the unsigned cast (Arrow casts are
            # eager — a raw cast would raise on them), then null them out
            safe = pc.if_else(neg, pa.scalar(0, pa.int64()), x).cast(pa.uint64())
            return pc.if_else(neg, pa.nulls(len(x), pa.uint64()), safe)
        if name == "TO_VERSION":
            # ES version type: the graft keeps versions as validated
            # strings (release or pre-release semver shapes); malformed
            # input becomes null like the other conversions
            patt = r"^(?P<v>\d+(?:\.\d+)*(?:[-+][A-Za-z0-9.\-]+)?)$"
            x = vals[0]
            if isinstance(x, str):
                return x if re.match(patt, x) else None
            arr = pc.cast(_as_array(x), pa.string())
            st = pc.extract_regex(arr, pattern=patt)
            return pc.if_else(
                pc.is_valid(st),
                pc.struct_field(st, "v"),
                pa.nulls(len(arr), pa.string()),
            )
        if name == "TO_DATE_NANOS":
            # ES date_nanos: epoch-NANOSECOND long → ns timestamp;
            # datetimes widen exactly (us → ns)
            x = vals[0]
            if isinstance(x, (int, float)):
                return pa.scalar(int(x), type=pa.timestamp("ns"))
            x = _as_array(x)
            if pa.types.is_timestamp(x.type):
                return x.cast(pa.timestamp("ns"))
            return x.cast(pa.int64()).cast(pa.timestamp("ns"))
        if name in ("ST_GEOHASH", "ST_GEOTILE"):
            # ES|QL 9.2 grid functions: the graft returns the STRING grid
            # key directly (geohash base-32 / "z/x/y" — the exact bucket
            # keys the grid aggs use; ES's long form + _TO_STRING
            # converters collapse into this one rendering, documented).
            # ST_GEOHEX is NOT grafted: H3 math, same skip as the agg.
            from .geo import geohash_encode, geotile_xy

            if len(vals) != 2 or not isinstance(vals[1], int):
                raise ValueError(f"esql: {name}(geo_point, precision)")
            p = vals[1]
            limit = 12 if name == "ST_GEOHASH" else 29
            if not (0 if name == "ST_GEOTILE" else 1) <= p <= limit:
                raise ValueError(f"esql: {name}: precision out of range")
            lon, lat = _geopoint_xy(vals[0])
            scalar = isinstance(vals[0], str)
            lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
            lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
            null = np.isnan(lon) | np.isnan(lat)
            safe_lon = np.where(null, 0.0, lon)
            safe_lat = np.where(null, 0.0, lat)
            if name == "ST_GEOHASH":
                keys = np.asarray(geohash_encode(safe_lat, safe_lon, p))
            else:
                tx, ty = geotile_xy(safe_lat, safe_lon, p)
                keys = np.char.add(
                    np.char.add(f"{p}/", tx.astype(np.int64).astype(str)),
                    np.char.add("/", ty.astype(np.int64).astype(str)),
                )
            if scalar:
                return None if null[0] else str(keys[0])
            return pa.array(keys.tolist(), type=pa.string(), mask=null)
        # ---- dates (fixed-width units; calendar units refused at parse) -
        if name == "DATE_TRUNC":
            dur, ts = vals[0], _as_array(vals[1])
            if isinstance(dur, CalendarPeriod):
                return pc.floor_temporal(ts, multiple=dur.n, unit=dur.unit)
            if not isinstance(dur, Duration):
                raise ValueError("esql: DATE_TRUNC needs a temporal literal (1 day, …)")
            if dur.unit in ("WEEK", "WEEKS", "W"):
                # ES anchors weeks to Monday — calendar floor, not
                # epoch-anchored division (the epoch was a Thursday)
                return pc.floor_temporal(
                    ts,
                    multiple=int(dur) // 604_800_000_000,
                    unit="week",
                    week_starts_monday=True,
                )
            us = ts.cast(pa.int64())
            return pc.multiply(pc.divide(us, int(dur)), int(dur)).cast(ts.type)
        if name == "BUCKET":
            x, span = _as_array(vals[0]), vals[1]
            if isinstance(span, CalendarPeriod):
                return pc.floor_temporal(x, multiple=span.n, unit=span.unit)
            if isinstance(span, Duration):
                if span.unit in ("WEEK", "WEEKS", "W"):
                    return pc.floor_temporal(
                        x,
                        multiple=int(span) // 604_800_000_000,
                        unit="week",
                        week_starts_monday=True,
                    )
                us = x.cast(pa.int64())
                return pc.multiply(pc.divide(us, int(span)), int(span)).cast(x.type)
            span = float(span)
            return pc.multiply(pc.floor(pc.divide(x.cast(pa.float64()), span)), span)
        if name == "DATE_EXTRACT":
            # ES|QL DATE_EXTRACT(datePart, date), ChronoField names
            part = vals[0]
            known = set(_CHRONO_FIELDS) | _CHRONO_DERIVED
            if not isinstance(part, str) or part.upper() not in known:
                raise ValueError(
                    f"esql: DATE_EXTRACT part must be one of {sorted(known)}"
                )
            if part.upper() in _CHRONO_DERIVED:
                # numpy // is FLOOR division — Java ChronoField semantics
                # for pre-1970 instants (Arrow's divide truncates toward
                # zero, which would put MICRO_OF_SECOND outside 0..999999)
                us = _as_array(vals[1]).cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                if part.upper() == "EPOCH_DAY":
                    return pa.array(us // 86_400_000_000, type=pa.int64())
                if part.upper() == "INSTANT_SECONDS":
                    return pa.array(us // 1_000_000, type=pa.int64())
                if part.upper() == "MICRO_OF_SECOND":
                    return pa.array(us % 1_000_000, type=pa.int64())
                doy = pc.day_of_year(vals[1]).cast(pa.int64())
                return pc.add(
                    pc.divide(pc.subtract(doy, 1), 7), 1
                )  # ALIGNED_WEEK_OF_YEAR (doy ≥ 1, truncation == floor)
            kernel = _CHRONO_FIELDS[part.upper()]
            if kernel == "day_of_week":
                return pc.day_of_week(vals[1], count_from_zero=False, week_start=1).cast(pa.int64())
            return getattr(pc, kernel)(vals[1]).cast(pa.int64())
        if name == "DATE_FORMAT":
            # ES|QL DATE_FORMAT([format,] date) — strftime-style here
            if not isinstance(vals[0], str):
                raise ValueError("esql: DATE_FORMAT needs a literal format string")
            return pc.strftime(vals[1], format=vals[0])
        if name == "DATE_DIFF":
            # ES|QL DATE_DIFF(unit, start, end): ELAPSED time in whole
            # units, truncated toward zero (ES subtracts timestamps — not
            # SQL-style boundary counting); fixed-width units only, like
            # DATE_TRUNC
            unit = vals[0]
            if not isinstance(unit, str) or unit.upper() not in _DUR_UNITS_US:
                raise ValueError(
                    "esql: DATE_DIFF unit must be a fixed-width literal "
                    f"({sorted(set(_DUR_UNITS_US))})"
                )
            step = _DUR_UNITS_US[unit.upper()]
            s_us = _as_array(vals[1]).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            e_us = _as_array(vals[2]).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            d = np.trunc((e_us - s_us) / float(step)).astype(np.int64)
            return pa.array(d, type=pa.int64())
        if name == "CATEGORIZE":
            # ES|QL CATEGORIZE (8.18, BY-clause categorization): the graft
            # pins a deterministic template — digit runs → <NUM> — usable
            # anywhere an expression is (a superset of ES's BY-only rule;
            # mirrors SQL regexp_replace exactly)
            return pc.replace_substring_regex(
                _as_array(vals[0]), r"\d+", "<NUM>"
            )
        # ---- multi-value ------------------------------------------------
        if name == "MV_COUNT":
            return pc.list_value_length(_as_array(vals[0])).cast(pa.int64())
        if name == "MV_FIRST":
            return _mv_reduce(vals[0], "first")
        if name == "MV_LAST":
            return _mv_reduce(vals[0], "last")
        if name == "MV_MIN":
            return _mv_reduce(vals[0], "min")
        if name == "MV_MAX":
            return _mv_reduce(vals[0], "max")
        if name == "MV_SUM":
            return _mv_reduce(vals[0], "sum")
        if name == "MV_AVG":
            avg = _mv_reduce(vals[0], "mean")
            arr = pc.cast(_as_array(avg), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            return pa.array(
                sql_round(arr, 6), type=pa.float64(), mask=np.isnan(arr)
            )
        if name == "MV_MEDIAN":
            # exact per-row median: sort (parent, value) pairs, interpolate
            # at run midpoints — one vectorized pass
            col = _as_array(vals[0])
            if not pa.types.is_list(col.type):
                raise ValueError("esql: MV_MEDIAN needs a multi-value column")
            n = len(col)
            par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
            flat = pc.cast(col.flatten(), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            if len(par) == 0:
                return pa.nulls(n, type=pa.float64())
            order = np.lexsort((flat, par))
            par, flat = par[order], flat[order]
            starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
            ends = np.r_[starts[1:], len(par)]
            lens = ends - starts
            lo = starts + (lens - 1) // 2
            hi = starts + lens // 2
            med = (flat[lo] + flat[hi]) / 2.0
            out = np.full(n, np.nan)
            out[par[starts]] = med
            return pa.array(out, type=pa.float64(), mask=np.isnan(out))
        if name in ("MV_SORT", "MV_DEDUPE"):
            # per-row sorted (and deduplicated) multivalue — vectorized
            # lexsort + run-boundary rebuild of the list offsets
            col = _as_array(vals[0])
            if not pa.types.is_list(col.type):
                raise ValueError(f"esql: {name} needs a multi-value column")
            n = len(col)
            par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
            flat = col.flatten()
            fnp = flat.to_numpy(zero_copy_only=False)
            order = np.lexsort((fnp, par))
            par_s = par[order]
            flat_s = flat.take(pa.array(order, type=pa.int64()))
            if name == "MV_DEDUPE" and len(par_s):
                fs = flat_s.to_numpy(zero_copy_only=False)
                keep = np.r_[True, (par_s[1:] != par_s[:-1]) | (fs[1:] != fs[:-1])]
                par_s = par_s[keep]
                flat_s = flat_s.filter(pa.array(keep))
            counts = np.bincount(par_s, minlength=n) if len(par_s) else np.zeros(n, np.int64)
            offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                flat_s.combine_chunks() if isinstance(flat_s, pa.ChunkedArray) else flat_s,
                mask=pa.array(~valid),
            )
        if name == "MV_SLICE":
            # ES|QL MV_SLICE(mv, start [, end]) — zero-based, INCLUSIVE end
            # (ES semantics); negative indexes refuse (the graft keeps the
            # kernel a single pc.list_slice)
            col = _as_array(vals[0])
            if not pa.types.is_list(col.type):
                raise ValueError("esql: MV_SLICE needs a multi-value column")
            start = vals[1]
            end = vals[2] if len(vals) > 2 else None
            if not isinstance(start, int) or (end is not None and not isinstance(end, int)):
                raise ValueError("esql: MV_SLICE bounds must be integer literals")
            if start < 0 or (end is not None and end < 0):
                raise ValueError("esql: MV_SLICE negative indexes are not supported")
            stop = None if end is None else end + 1
            return pc.list_slice(col, start=start, stop=stop)
        if name == "MV_APPEND":
            # ES|QL MV_APPEND(mv1, mv2): per-row concatenation; a null list
            # contributes nothing, both-null rows stay null
            a, b = _as_array(vals[0]), _as_array(vals[1])
            if not (pa.types.is_list(a.type) and pa.types.is_list(b.type)):
                raise ValueError("esql: MV_APPEND needs two multi-value columns")
            n = len(a)
            pa_a = pc.list_parent_indices(a).to_numpy(zero_copy_only=False)
            pa_b = pc.list_parent_indices(b).to_numpy(zero_copy_only=False)
            flat = pa.concat_arrays(
                [a.flatten().combine_chunks() if isinstance(a.flatten(), pa.ChunkedArray) else a.flatten(),
                 b.flatten().combine_chunks() if isinstance(b.flatten(), pa.ChunkedArray) else b.flatten()]
            )
            par = np.concatenate([pa_a, pa_b])
            src = np.concatenate([np.zeros(len(pa_a), np.int8), np.ones(len(pa_b), np.int8)])
            order = np.lexsort((src, par))
            counts = np.bincount(par, minlength=n) if len(par) else np.zeros(n, np.int64)
            offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b)).to_numpy(zero_copy_only=False)
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                flat.take(pa.array(order, type=pa.int64())),
                mask=pa.array(both_null),
            )
        if name == "MV_ZIP":
            # ES|QL MV_ZIP(mv1, mv2 [, delim]): pairwise join; past the
            # shorter list the longer's elements pass through alone
            a, b = _as_array(vals[0]), _as_array(vals[1])
            delim = vals[2] if len(vals) > 2 else ","
            if not isinstance(delim, str):
                raise ValueError("esql: MV_ZIP delimiter must be a string literal")
            if not (pa.types.is_list(a.type) and pa.types.is_list(b.type)):
                raise ValueError("esql: MV_ZIP needs two multi-value columns")
            n = len(a)
            la = pc.list_value_length(a).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            lb = pc.list_value_length(b).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.maximum(la, lb)
            total = int(m.sum())
            par = np.repeat(np.arange(n, dtype=np.int64), m)
            offs = np.r_[0, np.cumsum(m)][:-1]
            pos = np.arange(total, dtype=np.int64) - np.repeat(offs, m)
            fa = np.asarray(a.flatten().to_numpy(zero_copy_only=False), dtype=object)
            fb = np.asarray(b.flatten().to_numpy(zero_copy_only=False), dtype=object)
            offa = np.r_[0, np.cumsum(la)][:-1]
            offb = np.r_[0, np.cumsum(lb)][:-1]
            in_a = pos < la[par]
            in_b = pos < lb[par]
            va = np.empty(total, dtype=object)
            vb = np.empty(total, dtype=object)
            va[in_a] = fa[(offa[par] + pos)[in_a]]
            vb[in_b] = fb[(offb[par] + pos)[in_b]]
            out = np.where(
                in_a & in_b,
                np.char.add(np.char.add(va.astype(str), delim), vb.astype(str)),
                np.where(in_a, va, vb),
            )
            offsets = np.r_[0, np.cumsum(m)].astype(np.int32)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b)).to_numpy(zero_copy_only=False)
            return pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(out.tolist(), type=pa.string()),
                mask=pa.array(both_null),
            )
        if name == "MV_CONCAT":
            # ES|QL MV_CONCAT(mv_string, delim): join the row's strings
            # into one value — a single Arrow binary_join kernel
            col = _as_array(vals[0])
            delim = vals[1] if len(vals) > 1 else ","
            if not pa.types.is_list(col.type):
                raise ValueError("esql: MV_CONCAT needs a multi-value column")
            if not isinstance(delim, str):
                raise ValueError("esql: MV_CONCAT delimiter must be a string literal")
            return pc.binary_join(col, delim)
        if name == "MV_PERCENTILE":
            # ES|QL MV_PERCENTILE(mv, p): per-row exact percentile with
            # linear interpolation (quantile_cont lerp — see
            # _np_group_quantile for the float contract)
            col = _as_array(vals[0])
            p = vals[1] if len(vals) > 1 else None
            if not pa.types.is_list(col.type):
                raise ValueError("esql: MV_PERCENTILE needs a multi-value column")
            if not isinstance(p, (int, float)) or not (0 <= float(p) <= 100):
                raise ValueError("esql: MV_PERCENTILE needs a literal 0..100")
            n, par, flat = _mv_numeric_parts(col)
            out = _np_group_quantile(par, flat, n, float(p) / 100.0)
            return pa.array(out, type=pa.float64(), mask=np.isnan(out))
        if name == "MV_MEDIAN_ABSOLUTE_DEVIATION":
            # per-row MAD = median(|x - median(x)|), both medians the
            # interpolated quantile (matches DuckDB mad() per group)
            col = _as_array(vals[0])
            if not pa.types.is_list(col.type):
                raise ValueError(
                    "esql: MV_MEDIAN_ABSOLUTE_DEVIATION needs a multi-value column"
                )
            n, par, flat = _mv_numeric_parts(col)
            med = _np_group_quantile(par, flat, n, 0.5)
            if len(par) == 0:
                return pa.nulls(n, type=pa.float64())
            dev = np.abs(flat - med[par])
            out = _np_group_quantile(par, dev, n, 0.5)
            return pa.array(out, type=pa.float64(), mask=np.isnan(out))
        if name == "MV_PSERIES_WEIGHTED_SUM":
            # ES|QL MV_PSERIES_WEIGHTED_SUM(mv, p): Σ v[i] / (i+1)^p in
            # list order — position weights via one repeat/arange pass,
            # per-row fold via bincount (accumulates in list order, so a
            # SQL oracle summing the zipped unnest matches bit-for-bit)
            col = _as_array(vals[0])
            p = vals[1] if len(vals) > 1 else None
            if not pa.types.is_list(col.type):
                raise ValueError(
                    "esql: MV_PSERIES_WEIGHTED_SUM needs a multi-value column"
                )
            if not isinstance(p, (int, float)):
                raise ValueError(
                    "esql: MV_PSERIES_WEIGHTED_SUM needs a literal exponent"
                )
            n, par, flat = _mv_numeric_parts(col)
            if len(par) == 0:
                return pa.nulls(n, type=pa.float64())
            counts = np.bincount(par, minlength=n)
            offs = np.r_[0, np.cumsum(counts)][:-1]
            pos = np.arange(len(par), dtype=np.int64) - offs[par]
            s = np.bincount(
                par, weights=flat / np.power(pos + 1.0, float(p)), minlength=n
            )
            out = np.where(counts > 0, s, np.nan)
            return pa.array(out, type=pa.float64(), mask=counts == 0)
        if name in ("TO_GEOPOINT", "TO_GEOSHAPE",
                    "TO_CARTESIANPOINT", "TO_CARTESIANSHAPE"):
            # ES|QL TO_GEOPOINT("POINT (lon lat)"): the engine's geo_point
            # is a canonical WKT string (no geometry type in Arrow's core);
            # the coordinate TEXT is preserved verbatim so ST_X/ST_Y parse
            # back bit-exactly; malformed input becomes null like TO_IP.
            # TO_GEOSHAPE additionally accepts literal POLYGON / BBOX WKT
            # (canonicalized textually); shape COLUMNS must be points —
            # polygon columns aren't grafted (documented).
            x = vals[0]
            if isinstance(x, str):
                m = _WKT_POINT.match(x)
                if m:
                    return f"POINT ({m.group(1)} {m.group(2)})"
                if name in ("TO_GEOSHAPE", "TO_CARTESIANSHAPE"):
                    mp = _WKT_POLYGON.match(x)
                    if mp and _parse_wkt_shape(x) is not None:
                        body = ", ".join(
                            " ".join(p.split())
                            for p in mp.group("body").split(",")
                        )
                        return f"POLYGON (({body}))"
                    mb = _WKT_BBOX.match(x)
                    if mb:
                        return "BBOX ({}, {}, {}, {})".format(
                            mb.group("x0"), mb.group("x1"),
                            mb.group("y1"), mb.group("y0"),
                        )
                return None
            arr = pc.cast(_as_array(x), pa.string())
            st = pc.extract_regex(arr, pattern=_WKT_POINT.pattern)
            ok = pc.is_valid(st)
            canon = pc.binary_join_element_wise(
                pa.array(["POINT ("] * len(arr)),
                pc.struct_field(st, "x"),
                pa.array([" "] * len(arr)),
                pc.struct_field(st, "y"),
                pa.array([")"] * len(arr)),
                "",
            )
            return pc.if_else(ok, canon, pa.nulls(len(arr), pa.string()))
        if name in ("ST_X", "ST_Y"):
            lon, lat = _geopoint_xy(vals[0])
            v = lon if name == "ST_X" else lat
            if isinstance(v, float):
                return v
            return pa.array(v, type=pa.float64(), mask=np.isnan(v))
        if name == "ST_DISTANCE":
            # ES|QL ST_DISTANCE(geo_point, geo_point) → METERS; haversine
            # with the repo-wide 6371 km sphere, op order mirrored verbatim
            # in the SQL oracles (see geo.haversine_km)
            lon1, lat1 = _geopoint_xy(vals[0])
            lon2, lat2 = _geopoint_xy(vals[1])
            rlat, rlon = np.radians(lat1), np.radians(lon1)
            rlat0, rlon0 = np.radians(lat2), np.radians(lon2)
            a = (
                np.sin((rlat - rlat0) / 2.0) ** 2
                + np.cos(rlat0) * np.cos(rlat) * np.sin((rlon - rlon0) / 2.0) ** 2
            )
            d = 2.0 * 6_371_000.0 * np.arcsin(np.sqrt(a))
            if isinstance(d, float):
                return d
            return pa.array(d, type=pa.float64(), mask=np.isnan(d))
        if name in ("ST_INTERSECTS", "ST_CONTAINS", "ST_WITHIN", "ST_DISJOINT"):
            # ES|QL spatial relations: each side is a geo_point column /
            # literal, or a literal POLYGON (via TO_GEOSHAPE).  Point vs
            # polygon = boundary-inclusive even-odd test, vectorized over
            # the batch; point vs point = coordinate equality;
            # polygon vs polygon is NOT grafted (refuses — ES delegates to
            # Lucene's full geometry engine).
            if len(vals) != 2:
                raise ValueError(f"esql: {name}(geometry, geometry)")
            sides = []
            for v in vals:
                if isinstance(v, str):
                    shp = _parse_wkt_shape(v)
                    if shp is None:
                        raise ValueError(f"esql: {name}: malformed WKT {v!r}")
                    if shp[0] == "point":
                        px = np.asarray([shp[1][0]])
                        py = np.asarray([shp[1][1]])
                        sides.append(("points", (px, py), True))
                    elif shp[0] == "polygon":
                        sides.append(("polygon", shp[1], True))
                    else:
                        x0, x1, y1, y0 = shp[1]
                        ring = np.asarray(
                            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                        )
                        sides.append(("polygon", ring, True))
                else:
                    sides.append(("points", _geopoint_xy(v), False))
            kinds = (sides[0][0], sides[1][0])
            if kinds == ("polygon", "polygon"):
                raise ValueError(
                    f"esql: {name}: polygon-polygon relations are not grafted"
                )
            scalar_out = all(s[2] for s in sides)
            if "polygon" in kinds:
                poly_first = kinds[0] == "polygon"
                ring = sides[0][1] if poly_first else sides[1][1]
                px, py = sides[1][1] if poly_first else sides[0][1]
                px, py = np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64)
                inside = _points_in_ring(px, py, ring)
                if name == "ST_CONTAINS":
                    out = inside if poly_first else np.zeros(len(px), dtype=bool)
                elif name == "ST_WITHIN":
                    out = inside if not poly_first else np.zeros(len(px), dtype=bool)
                elif name == "ST_DISJOINT":
                    out = ~inside
                else:
                    out = inside
                null = np.isnan(px) | np.isnan(py)
            else:
                ax, ay = (np.asarray(c, dtype=np.float64) for c in sides[0][1])
                bx, by = (np.asarray(c, dtype=np.float64) for c in sides[1][1])
                eq = (ax == bx) & (ay == by)
                out = ~eq if name == "ST_DISJOINT" else eq
                null = np.isnan(ax) | np.isnan(ay) | np.isnan(bx) | np.isnan(by)
            if scalar_out:
                return None if null[0] else bool(out[0])
            return pa.array(out, type=pa.bool_(), mask=null)
        if name == "ST_ENVELOPE":
            # envelope of a literal shape → its BBOX (minX, maxX, maxY,
            # minY — ES's envelope rendering); of a geo_point column →
            # the per-row degenerate BBOX, coordinate TEXT preserved
            x = vals[0]
            if isinstance(x, str):
                shp = _parse_wkt_shape(x)
                if shp is None:
                    return None
                if shp[0] == "point":
                    gx, gy = shp[1]
                    return f"BBOX ({gx!r}, {gx!r}, {gy!r}, {gy!r})"
                if shp[0] == "bbox":
                    x0, x1, y1, y0 = shp[1]
                    return f"BBOX ({x0!r}, {x1!r}, {y1!r}, {y0!r})"
                ring = shp[1]
                return "BBOX ({!r}, {!r}, {!r}, {!r})".format(
                    ring[:, 0].min(), ring[:, 0].max(),
                    ring[:, 1].max(), ring[:, 1].min(),
                )
            arr = pc.cast(_as_array(x), pa.string())
            st = pc.extract_regex(arr, pattern=_WKT_POINT.pattern)
            ok = pc.is_valid(st)
            xs, ys = pc.struct_field(st, "x"), pc.struct_field(st, "y")
            env = pc.binary_join_element_wise(
                pa.array(["BBOX ("] * len(arr)), xs,
                pa.array([", "] * len(arr)), xs,
                pa.array([", "] * len(arr)), ys,
                pa.array([", "] * len(arr)), ys,
                pa.array([")"] * len(arr)), "",
            )
            return pc.if_else(ok, env, pa.nulls(len(arr), pa.string()))
        if name in ("ST_XMIN", "ST_XMAX", "ST_YMIN", "ST_YMAX"):
            x = vals[0]
            if isinstance(x, str):
                shp = _parse_wkt_shape(x)
                if shp is None:
                    return None
                if shp[0] == "point":
                    return float(shp[1][0] if name[3] == "X" else shp[1][1])
                if shp[0] == "bbox":
                    x0, x1, y1, y0 = shp[1]
                    return {
                        "ST_XMIN": x0, "ST_XMAX": x1,
                        "ST_YMIN": y0, "ST_YMAX": y1,
                    }[name]
                ring = shp[1]
                col_i = 0 if name[3] == "X" else 1
                v = ring[:, col_i]
                return float(v.min() if name.endswith("MIN") else v.max())
            # column path: geo_point or BBOX strings, both one extract_regex
            arr = pc.cast(_as_array(x), pa.string())
            lon, lat = _geopoint_xy(arr)
            pt = lon if name[3] == "X" else lat
            stb = pc.extract_regex(arr, pattern=_WKT_BBOX.pattern)
            okb = pc.is_valid(stb).to_numpy(zero_copy_only=False)
            grp = {"ST_XMIN": "x0", "ST_XMAX": "x1",
                   "ST_YMIN": "y0", "ST_YMAX": "y1"}[name]
            bb = pc.struct_field(stb, grp).cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            out = np.where(okb, bb, pt)
            return pa.array(out, type=pa.float64(), mask=np.isnan(out))
        if name == "TO_IP":
            # ES|QL TO_IP(string) — IPv4 dotted-quad validation; the graft
            # keeps IPs as canonical strings (no inet type in the engine),
            # invalid inputs become null like ES's conversion functions
            if isinstance(vals[0], str):  # literal → scalar result
                parts = vals[0].split(".")
                if len(parts) == 4 and all(
                    p_.isdigit() and len(p_) <= 3 and int(p_) <= 255 for p_ in parts
                ):
                    return ".".join(str(int(p_)) for p_ in parts)
                return None
            arr = pc.cast(_as_array(vals[0]), pa.string())
            st = pc.extract_regex(
                arr, pattern=r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$"
            )
            octs = []
            ok = pc.is_valid(st)
            for f_ in ("a", "b", "c", "d"):
                o = pc.struct_field(st, f_).cast(pa.int64())
                ok = pc.and_kleene(ok, pc.less_equal(o, 255))
                octs.append(o.cast(pa.string()))
            canon = pc.binary_join_element_wise(octs[0], octs[1], octs[2], octs[3], ".")
            return pc.if_else(ok.fill_null(False), canon, pa.nulls(len(arr), pa.string()))
        if name == "IP_PREFIX":
            # ES|QL IP_PREFIX(ip, prefixLengthV4, prefixLengthV6): truncate
            # the address to its network prefix.  The engine's IP type is a
            # canonical IPv4 string (see TO_IP), so the v6 length is
            # accepted-and-ignored; octets → uint32 → mask → dotted quad,
            # all int64 numpy — null ips stay null
            plen = vals[1]
            if not isinstance(plen, int) or not (0 <= plen <= 32):
                raise ValueError("esql: IP_PREFIX v4 length must be a literal 0..32")
            arr = pc.cast(_as_array(vals[0]), pa.string())
            st = pc.extract_regex(
                arr,
                pattern=r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$",
            )
            octs = [
                pc.struct_field(st, f_).cast(pa.int64()).to_numpy(zero_copy_only=False)
                for f_ in ("a", "b", "c", "d")
            ]
            valid = pc.is_valid(st).to_numpy(zero_copy_only=False)
            o = [np.where(valid, x, 0).astype(np.int64) for x in octs]
            addr = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
            mask = ((1 << plen) - 1) << (32 - plen) if plen else 0
            net = addr & mask
            quad = np.char.add(
                np.char.add(
                    np.char.add(
                        np.char.add((net >> 24).astype(str), "."),
                        np.char.add(((net >> 16) & 255).astype(str), "."),
                    ),
                    np.char.add(((net >> 8) & 255).astype(str), "."),
                ),
                (net & 255).astype(str),
            )
            return pa.array(
                np.where(valid, quad, None).tolist(), type=pa.string()
            )
        if name == "CIDR_MATCH":
            # ES|QL CIDR_MATCH(ip, "block", ...) — any-match over CIDR
            # literals; prefix compare on the numeric address, null ips
            # stay null
            blocks = vals[1:]
            if not blocks or not all(isinstance(b_, str) for b_ in blocks):
                raise ValueError("esql: CIDR_MATCH needs literal CIDR block strings")
            if vals[0] is None or isinstance(vals[0], str):  # scalar ip
                one = pa.array([vals[0]], type=pa.string())
                res = _eval_expr(
                    ("func", "CIDR_MATCH", [("lit", one)] + [("lit", b_) for b_ in blocks]),
                    batch,
                )
                return res[0].as_py()
            ip = pc.cast(_as_array(vals[0]), pa.string())
            st = pc.extract_regex(
                ip, pattern=r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$"
            )
            nums = np.zeros(len(ip), dtype=np.uint64)
            for f_ in ("a", "b", "c", "d"):
                o = pc.struct_field(st, f_).cast(pa.int64()).fill_null(0)
                nums = nums * 256 + o.to_numpy(zero_copy_only=False).astype(np.uint64)
            null_mask = pc.is_null(st).to_numpy(zero_copy_only=False)
            hit = np.zeros(len(ip), dtype=bool)
            for b_ in blocks:
                base_s, _, bits_s = b_.partition("/")
                parts = base_s.split(".")
                if len(parts) != 4 or not bits_s.isdigit() or not (0 <= int(bits_s) <= 32):
                    raise ValueError(f"esql: CIDR_MATCH malformed block {b_!r}")
                base = 0
                for p_ in parts:
                    if not p_.isdigit() or int(p_) > 255:
                        raise ValueError(f"esql: CIDR_MATCH malformed block {b_!r}")
                    base = base * 256 + int(p_)
                shift = np.uint64(32 - int(bits_s))
                if int(bits_s) == 0:
                    hit |= True
                else:
                    hit |= (nums >> shift) == np.uint64(base >> (32 - int(bits_s)))
            return pa.array(hit, type=pa.bool_(), mask=null_mask)
        if name == "DATE_PARSE":
            # ES|QL DATE_PARSE(javaPattern, string) — the common Java tokens
            # translate to strptime; unknown alpha tokens refuse
            patt = vals[0]
            if not isinstance(patt, str):
                raise ValueError("esql: DATE_PARSE needs a literal pattern")
            return pc.strptime(
                pc.cast(_as_array(vals[1]), pa.string()),
                format=java_to_strptime(patt),
                unit="us",
            )
        if name in _VECTOR_FUNCS:
            # ES|QL 9.1+ dense-vector functions (tech preview): both sides
            # reshape to (n, d) float64 matrices — a multivalue literal
            # broadcasts as the same row repeated — and each metric is ONE
            # vectorized numpy expression.  V_HAMMING is defined here as
            # the element-wise disagreement count (ES's bitwise form needs
            # byte vectors; documented deviation).
            if len(vals) != 2:
                raise ValueError(f"esql: {name}(vector, vector)")
            A, na, da = _dense_matrix(vals[0], name)
            B, nb, db = _dense_matrix(vals[1], name)
            if da and db and da != db:
                raise ValueError(
                    f"esql: {name}: dimension mismatch ({da} vs {db})"
                )
            if da == 0 or db == 0:
                # one side is all-null in this block → every row is null
                out_t = pa.int64() if name == "V_HAMMING" else pa.float64()
                return pa.nulls(len(na), type=out_t)
            null = na | nb
            if name == "V_HAMMING":
                out = (A != B).sum(axis=1).astype(np.int64)
                return pa.array(out, type=pa.int64(), mask=null)
            if name == "V_DOT_PRODUCT":
                out = np.einsum("ij,ij->i", A, B)
            elif name == "V_L1_NORM":
                out = np.abs(A - B).sum(axis=1)
            elif name == "V_L2_NORM":
                out = np.sqrt(np.einsum("ij,ij->i", A - B, A - B))
            else:  # V_COSINE: null where either norm is 0 (undefined)
                num = np.einsum("ij,ij->i", A, B)
                den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                    np.einsum("ij,ij->i", B, B)
                )
                null = null | (den == 0)
                out = np.divide(num, den, out=np.zeros_like(num), where=den != 0)
            return pa.array(out, type=pa.float64(), mask=null)
        if name == "V_MAGNITUDE":
            if len(vals) != 1:
                raise ValueError("esql: V_MAGNITUDE(vector)")
            A, null, _d = _dense_matrix(vals[0], name)
            out = np.sqrt(np.einsum("ij,ij->i", A, A))
            return pa.array(out, type=pa.float64(), mask=null)
        if name == "KNN":
            # KNN never reaches the evaluator: _run_pipe rewrites the WHERE
            # it sits in into a scored two-pass plan (threshold predicate)
            raise ValueError(
                "esql: KNN is only valid as a WHERE predicate directly "
                "after the source command"
            )
        raise ValueError(f"esql: unknown function {name}")
    op = node[1]
    left = _eval_expr(node[2], batch)
    right = _eval_expr(node[3], batch)
    if isinstance(left, CalendarPeriod) or isinstance(right, CalendarPeriod):
        # calendar periods have data-dependent width: only DATE_TRUNC and
        # BUCKET accept them (documented contract on CalendarPeriod)
        raise ValueError(
            "esql: calendar periods are only valid in DATE_TRUNC/BUCKET, "
            f"not in the {op!r} operator"
        )
    if isinstance(left, Duration) or isinstance(right, Duration):
        # ES|QL temporal arithmetic: timestamp ± duration (fixed-width
        # amounts only — calendar periods refused above); duration ±
        # duration folds to a new literal
        if op not in ("+", "-"):
            raise ValueError(
                f"esql: durations are only valid with +/-, not {op!r}"
            )
        if isinstance(left, Duration) and isinstance(right, Duration):
            us = int(left) + int(right) if op == "+" else int(left) - int(right)
            return Duration(us)
        dur = left if isinstance(left, Duration) else right
        other = right if isinstance(left, Duration) else left
        if op == "-" and isinstance(left, Duration):
            raise ValueError("esql: cannot subtract a timestamp from a duration")
        if isinstance(other, pa.ChunkedArray):
            other = other.combine_chunks()
        is_ts = (
            isinstance(other, pa.Array) and pa.types.is_timestamp(other.type)
        ) or (isinstance(other, pa.Scalar) and pa.types.is_timestamp(other.type))
        if not is_ts:
            raise ValueError("esql: duration arithmetic needs a datetime side")
        d = pa.scalar(int(dur), type=pa.duration("us"))
        return pc.add(other, d) if op == "+" else pc.subtract(other, d)
    if op == "in":
        if not isinstance(right, list):
            raise ValueError("esql: IN needs a literal list")
        return pc.is_in(left, value_set=pa.array(right))
    if op in ("like", "rlike"):
        pats = right if isinstance(right, list) else [right]
        if not pats or not all(isinstance(p_, str) for p_ in pats):
            raise ValueError(f"esql: {op.upper()} needs string literal patterns")
        if op == "like":
            # ES|QL LIKE wildcards: * = any run, ? = one char; a pattern
            # LIST matches if ANY alternative matches (9.1 semantics)
            alts = []
            for p_ in pats:
                out = []
                for ch in p_:
                    if ch == "*":
                        out.append(".*")
                    elif ch == "?":
                        out.append(".")
                    else:
                        out.append(re.escape(ch))
                alts.append("".join(out))
        else:
            alts = list(pats)
        pat = "^(?:" + "|".join(alts) + ")$"
        return pc.match_substring_regex(left, pat)
    fns = {
        "==": pc.equal,
        "!=": pc.not_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        "and": pc.and_kleene,
        "or": pc.or_kleene,
        "+": pc.add,
        "-": pc.subtract,
        "*": pc.multiply,
        "/": pc.divide,
    }
    if op == "/":
        # ES|QL integer division truncates; the oracle contract wants float —
        # promote to float64 like DuckDB's '/'
        if isinstance(left, pa.Array) and pa.types.is_integer(left.type):
            left = left.cast(pa.float64())
        if isinstance(right, pa.Array) and pa.types.is_integer(right.type):
            right = right.cast(pa.float64())
    if op == "%":
        # ES|QL % = truncated remainder, sign of the dividend (Java and
        # DuckDB agree); pyarrow has no modulo kernel — np.fmod is exact
        # for int64 and matches both on floats
        la = _as_array(left) if isinstance(left, (pa.Array, pa.ChunkedArray)) else left
        ra = _as_array(right) if isinstance(right, (pa.Array, pa.ChunkedArray)) else right
        mask = None
        if isinstance(la, pa.Array) and la.null_count:
            mask = pc.is_null(la).to_numpy(zero_copy_only=False)
            la = la.fill_null(1)
        if isinstance(ra, pa.Array) and ra.null_count:
            rm = pc.is_null(ra).to_numpy(zero_copy_only=False)
            mask = rm if mask is None else (mask | rm)
            ra = ra.fill_null(1)
        ln = la.to_numpy(zero_copy_only=False) if isinstance(la, pa.Array) else la
        rn = ra.to_numpy(zero_copy_only=False) if isinstance(ra, pa.Array) else ra
        res = np.fmod(ln, rn)
        both_int = not (
            np.asarray(ln).dtype.kind == "f" or np.asarray(rn).dtype.kind == "f"
        )
        return pa.array(
            res, type=pa.int64() if both_int else pa.float64(), mask=mask
        )
    return fns[op](left, right)


def _referenced_cols(node: tuple | None, acc: set[str]) -> None:
    if node is None:
        return
    kind = node[0]
    if kind == "col":
        acc.add(node[1])
    elif kind == "not":
        _referenced_cols(node[1], acc)
    elif kind == "func":
        # KQL names its fields INSIDE the literal query string — surface
        # them so projection pushdown keeps the columns it evaluates
        if node[1] == "KQL" and node[2] and node[2][0][0] == "lit" \
                and isinstance(node[2][0][1], str):
            try:
                _kql_fields(_kql_parse(node[2][0][1]), acc)
            except ValueError:
                pass  # the evaluator raises the real parse error
        for a in node[2]:
            _referenced_cols(a, acc)
    elif kind == "bin":
        _referenced_cols(node[2], acc)
        _referenced_cols(node[3], acc)
    elif kind == "isnull":
        _referenced_cols(node[1], acc)


def _plan_columns(
    plan: EsqlPlan,
    schema_names: list[str],
    extra_produced: set[str] | None = None,
) -> list[str]:
    """Exact read column set: everything the pipe references downstream.

    ``extra_produced``: columns materialized mid-pipe from elsewhere than
    the source table (LOOKUP JOIN right-side columns)."""
    eval_names = {op[1] for op in plan.ops if op[0] == "eval"}
    eval_names |= {
        name for op in plan.ops if op[0] == "parse" for name, _ in op[3]
    }
    eval_names |= {op[2] for op in plan.ops if op[0] == "rename"}
    eval_names |= {
        s_[0] for op in plan.ops if op[0] == "inline" for s_ in op[1]
    }
    eval_names |= {op[1] for op in plan.ops if op[0] == "completion"}
    # INSIST on an unmapped field PRODUCES the (null) column; on a mapped
    # field it is a read (handled in the per-op loop below)
    eval_names |= {
        op[1]
        for op in plan.ops
        if op[0] == "insist" and op[1] not in schema_names
    }
    eval_names |= {"_score" for op in plan.ops if op[0] == "rerank"}
    # post-STATS commands act on the aggregation result, not the source
    # table: their outputs are producible names, their inputs are NOT
    # source reads
    for pop in plan.post:
        if pop[0] == "eval":
            eval_names.add(pop[1])
        elif pop[0] == "rename":
            eval_names.add(pop[2])
        elif pop[0] == "stats":
            eval_names |= {s_[0] for s_ in pop[1]}
    eval_names |= extra_produced or set()
    eval_names |= set(plan.metadata)  # produced at scan time, not read
    need: set[str] = set()
    if "_id" in plan.metadata:
        # _id derives from the table's first schema column (the id by the
        # corpus convention) — force it into the read set
        need.add(schema_names[0])
    for op in plan.ops:
        if op[0] == "parse":
            need.add(op[1])
        elif op[0] == "rename":
            need.add(op[1])
        elif op[0] == "mvexpand":
            need.add(op[1])
        elif op[0] == "insist":
            if op[1] in schema_names:
                need.add(op[1])
        elif op[0] == "lookup":
            need.add(op[2])
        elif op[0] == "enrich":
            need.add(op[2])
        elif op[0] == "sample":
            # keyed on the source table's first schema column (the id by
            # convention) — force it into the read set
            need.add(schema_names[0])
        elif op[0] == "completion":
            _referenced_cols(op[2], need)
        elif op[0] == "rerank":
            need.add(op[2])
        elif op[0] == "inline":
            for s_ in op[1]:
                if s_[2] is not None:
                    need.add(s_[2])
                _referenced_cols(s_[3], need)
                if s_[1] == "WEIGHTED_AVG":
                    need.add(s_[4])
            need.update(op[2])
        else:
            _referenced_cols(op[-1], need)
    for s_ in plan.stats:
        if s_[2] is not None:
            need.add(s_[2])
        _referenced_cols(s_[3], need)
        if s_[1] == "WEIGHTED_AVG":
            need.add(s_[4])
        elif s_[1] in _ENDPOINT_FAMILY:  # ts-ordered endpoints bind ``ts``
            need.add("ts")
    need.update(plan.by)
    for col, *_rest in plan.sort:
        need.add(col)
    if plan.changepoint is not None:
        need.add(plan.changepoint[0])
        need.add(plan.changepoint[1])
    if plan.keep is not None:
        for p_ in plan.keep:
            if "*" in p_ or "?" in p_:  # wildcard: all matching source cols
                rx = _wild_rx(p_)
                hits = [c for c in schema_names if re.fullmatch(rx, c)]
                if not hits and not any(
                    re.fullmatch(rx, c) for c in eval_names
                ):
                    raise ValueError(
                        f"esql: KEEP pattern {p_!r} matches no columns"
                    )
                need.update(hits)
            else:
                need.add(p_)
    elif not plan.stats and not plan.by:
        need.update(schema_names)  # bare SELECT * shape
    # eval/parse/stats outputs aren't read columns — unless they SHADOW a
    # schema column (e.g. ``EVAL v = v + 1``), which must still be read
    need -= (eval_names | {s_[0] for s_ in plan.stats}) - set(schema_names)
    unknown = need - set(schema_names)
    if unknown:
        raise ValueError(f"esql: unknown columns {sorted(unknown)}")
    # a pipe that references no source column at all (bare COUNT(*))
    # still needs one column to carry row counts through the scan
    return [c for c in schema_names if c in need] or [schema_names[0]]


# -------------------------------------------------------------- executor

# mergeable partial per aggregate: (partial column suffixes, batch aggs)
_PARTIAL = {
    "COUNT": [("count", "n")],
    "SUM": [("sum", "s")],
    "MIN": [("min", "mn")],
    "MAX": [("max", "mx")],
    "AVG": [("sum", "s"), ("count", "n")],
}
_COMBINE = {"n": "sum", "s": "sum", "q": "sum", "mn": "min", "mx": "max"}


def _split_fork(src: str) -> tuple[str, list[str], str] | None:
    """Split ``head | FORK (b1) (b2) … [| RRF]`` into
    ``(head, [b1, b2, …], tail)``.

    Textual split (quote-aware, paren-balanced) so each branch re-enters
    :func:`run_esql` as an ordinary pipe; returns None when the pipe has
    no top-level FORK.  ``tail`` is the text after the last branch —
    only ``| RRF`` is accepted there (the fusion command is defined on
    FORK output)."""
    i, n = 0, len(src)
    in_str, depth = False, 0
    fork_at = None
    while i < n:
        ch = src[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and src[i : i + 4].upper() == "FORK"
            and (i + 4 == n or not (src[i + 4].isalnum() or src[i + 4] == "_"))
            and (i == 0 or not (src[i - 1].isalnum() or src[i - 1] == "_"))
        ):
            fork_at = i
            break
        i += 1
    if fork_at is None:
        return None
    head = src[:fork_at].rstrip()
    if not head.endswith("|"):
        raise ValueError("esql: FORK must follow a '|'")
    head = head[:-1].rstrip()
    rest = src[fork_at + 4 :]
    branches: list[str] = []
    j = 0
    while j < len(rest):
        ch = rest[j]
        if ch.isspace():
            j += 1
            continue
        if ch != "(":
            tail = rest[j:].strip()
            if branches and re.fullmatch(r"\|\s*RRF", tail, re.IGNORECASE):
                return head, branches, "RRF"
            # ES|QL 9.2 FUSE command: method rrf (default) or linear
            m = re.fullmatch(
                r"\|\s*FUSE(?:\s+(rrf|linear))?", tail, re.IGNORECASE
            )
            if branches and m:
                return head, branches, f"FUSE:{(m.group(1) or 'rrf').lower()}"
            raise ValueError(
                "esql: FORK branches must be parenthesized and only "
                "'| RRF' or '| FUSE [rrf|linear]' may follow them"
            )
        depth, k, in_str = 1, j + 1, False
        while k < len(rest) and depth:
            c2 = rest[k]
            if in_str:
                if c2 == "\\":
                    k += 2
                    continue
                if c2 == '"':
                    in_str = False
            elif c2 == '"':
                in_str = True
            elif c2 == "(":
                depth += 1
            elif c2 == ")":
                depth -= 1
            k += 1
        if depth:
            raise ValueError("esql: unbalanced parentheses in FORK")
        branches.append(rest[j + 1 : k - 1].strip())
        j = k
    return head, branches, ""


def _rrf_fuse(
    outs: list[pa.Table], round_decimals: int, k: int = 60,
    method: str = "rrf",
) -> pa.Table:
    """ES|QL ``FORK (…) (…) | RRF`` / 9.2 ``| FUSE [rrf|linear]``: fusion
    of the branches.  Each branch must emit ``_score`` plus an id column
    (its first non-``_score``/``_fork`` column, same name in every
    branch); per branch, rows rank by (_score DESC, id ASC); the fused
    score is Σ 1/(k + rank) for ``rrf`` (ES's ``rank_constant`` default
    k=60) or Σ raw ``_score`` for ``linear`` (FUSE's default weight 1 /
    normalizer none).  Output: (id, _score) sorted by fused score DESC,
    id ASC — branch tables are already driver-side (FORK results), so
    fusion is a bounded local fold."""
    id_col = None
    fused: dict[object, float] = {}
    for t in outs:
        cand = [c for c in t.column_names if c not in ("_score", "_fork")]
        if "_score" not in t.column_names or not cand:
            raise ValueError(
                "esql: RRF needs each FORK branch to emit _score and an "
                "id column"
            )
        if id_col is None:
            id_col = cand[0]
        elif cand[0] != id_col:
            raise ValueError(
                f"esql: RRF branches disagree on the id column "
                f"({id_col!r} vs {cand[0]!r})"
            )
        ranked = t.select([id_col, "_score"]).sort_by(
            [("_score", "descending"), (id_col, "ascending")]
        )
        if method == "linear":
            for doc, s in zip(
                ranked[id_col].to_pylist(), ranked["_score"].to_pylist()
            ):
                fused[doc] = fused.get(doc, 0.0) + float(s or 0.0)
        else:
            for rank, doc in enumerate(ranked[id_col].to_pylist(), 1):
                fused[doc] = fused.get(doc, 0.0) + 1.0 / (k + rank)
    ids = sorted(fused)  # deterministic fold order for ties
    scores = np.array([fused[d] for d in ids], dtype=np.float64)
    out = pa.table(
        {
            id_col: pa.array(ids, type=outs[0].schema.field(id_col).type),
            "_score": pa.array(
                sql_round(scores, round_decimals), type=pa.float64()
            ),
        }
    )
    return out.sort_by([("_score", "descending"), (id_col, "ascending")])


def _apply_change_point(
    res: pa.Table, cp: tuple[str, str, str, str], round_decimals: int
) -> pa.Table:
    """``CHANGE_POINT value ON key``: deterministic mean-shift detector.

    Documented graft variant of ES's change_point (which runs a battery
    of stochastic tests): sort the series by key, pick the split k
    minimizing the two-segment sum of squared errors (ties → smallest
    k), and mark the FIRST row of the right segment with
    ``type='step_change'`` and ``pvalue = sse(k)/sse_total`` — the
    unexplained-variance ratio (0 = perfect step, 1 = no shift).  The
    series is driver-side by construction: ES caps the agg's input at
    1000 buckets; the graft raises past 100k points."""
    val, key, tname, pname = cp
    for c in (val, key):
        if c not in res.column_names:
            raise ValueError(f"esql: CHANGE_POINT column {c} not in the pipe")
    if res.num_rows > 100_000:
        raise ValueError("esql: CHANGE_POINT series exceeds 100k points")
    res = res.sort_by([(key, "ascending")])
    n = res.num_rows
    x = res[val].to_numpy(zero_copy_only=False).astype(np.float64)
    tcol = np.full(n, None, dtype=object)
    pvals = np.full(n, np.nan)
    if n >= 4 and not np.isnan(x).any():
        cs, cq = np.cumsum(x), np.cumsum(x * x)
        s_tot, q_tot = cs[-1], cq[-1]
        k = np.arange(1, n, dtype=np.float64)
        s1, q1 = cs[:-1], cq[:-1]
        sse = (q1 - s1 * s1 / k) + (
            (q_tot - q1) - (s_tot - s1) * (s_tot - s1) / (n - k)
        )
        kstar = int(np.argmin(np.round(sse, 9)))
        total = q_tot - s_tot * s_tot / n
        ratio = float(sse[kstar] / total) if total > 0 else 1.0
        tcol[kstar + 1] = "step_change"
        pvals[kstar + 1] = float(sql_round(ratio, round_decimals))
    out = res.append_column(tname, pa.array(tcol, type=pa.string()))
    return out.append_column(
        pname, pa.array(pvals, type=pa.float64(), mask=np.isnan(pvals))
    )


def run_esql(src: str, sf_dir: str, *, round_decimals: int = 6) -> pa.Table:
    """Parse + execute one ES|QL pipe over the ``sf_dir`` parquet tables.

    One streamed Ray Data pass; driver residency is bounded by #groups
    (STATS) or limit × #blocks (SORT/LIMIT) — never the input row count.
    ``FORK`` fans the shared head into independent branch pipes (each its
    own streamed pass — ES's plan also executes branches separately) and
    unions them under a ``_fork`` discriminator; ``CHANGE_POINT`` is a
    terminal driver-side detector over the (small) result series."""
    fork = _split_fork(src)
    if fork is not None:
        head, branches, tail = fork
        if len(branches) < 2:
            raise ValueError("esql: FORK needs at least two branches")
        outs = []
        for i, br in enumerate(branches, 1):
            sub = run_esql(
                f"{head} | {br}" if br.strip() else head,
                sf_dir,
                round_decimals=round_decimals,
            )
            outs.append(
                sub.append_column(
                    "_fork",
                    pa.array([f"fork{i}"] * sub.num_rows, type=pa.string()),
                )
            )
        if tail == "RRF" or tail == "FUSE:rrf":
            return _rrf_fuse(outs, round_decimals)
        if tail == "FUSE:linear":
            return _rrf_fuse(outs, round_decimals, method="linear")
        res = pa.concat_tables(outs, promote_options="default")
        # deterministic output order: branch id, then every flat column
        keys = [("_fork", "ascending")] + [
            (c, "ascending")
            for c in res.column_names
            if c != "_fork"
            and not pa.types.is_nested(res.schema.field(c).type)
        ]
        return res.sort_by(keys)
    plan = parse_esql(_normalize_assign(src))
    res = _run_pipe(src, sf_dir, round_decimals=round_decimals)
    if plan.changepoint is not None:
        res = _apply_change_point(res, plan.changepoint, round_decimals)
    return res


def _node_has_fn(node, fname: str) -> bool:
    """True when the expression tree contains a call to ``fname``."""
    if not isinstance(node, tuple):
        return False
    if node[0] == "func" and node[1] == fname:
        return True
    for part in node[1:]:
        if isinstance(part, tuple) and _node_has_fn(part, fname):
            return True
        if isinstance(part, list) and any(
            _node_has_fn(p, fname) for p in part if isinstance(p, tuple)
        ):
            return True
    return False


def _and_conjuncts(node) -> list:
    """Flatten an AND tree into its conjunct list."""
    if isinstance(node, tuple) and node[0] == "bin" and node[1] == "and":
        return _and_conjuncts(node[2]) + _and_conjuncts(node[3])
    return [node]


def _extract_knn(plan) -> tuple[int, tuple, tuple | None] | None:
    """Locate a ``KNN(field, query_vector, k)`` predicate for the two-pass
    rewrite → ``(where_op_index, knn_node, prefilter_node_or_None)``.

    ES pushes KNN down to the index scan and treats sibling WHERE
    conjuncts as PRE-filters (the k nearest among rows passing them); the
    graft mirrors that by requiring KNN in the first command after the
    source, as a top-level conjunct, at most once per pipe.  The third
    argument is the graft's positional ``k`` (ES spells it as a named
    option map; documented deviation)."""
    hits = [
        i
        for i, op in enumerate(plan.ops)
        if op[0] == "where" and _node_has_fn(op[1], "KNN")
    ]
    if not hits:
        return None
    if len(hits) > 1 or hits[0] != 0:
        raise ValueError(
            "esql: KNN must appear exactly once, in the first WHERE "
            "directly after the source command"
        )
    conj = _and_conjuncts(plan.ops[0][1])
    knn = [c for c in conj if isinstance(c, tuple) and c[0] == "func" and c[1] == "KNN"]
    rest = [c for c in conj if c not in knn]
    if len(knn) != 1 or any(_node_has_fn(c, "KNN") for c in rest):
        raise ValueError(
            "esql: KNN must be a single bare top-level conjunct "
            "(not nested under OR/NOT or repeated)"
        )
    args = knn[0][2]
    if len(args) != 3 or args[2][0] != "lit" or not isinstance(args[2][1], int) \
            or args[2][1] < 1:
        raise ValueError("esql: KNN(field, query_vector, k) needs integer k >= 1")
    rest_node = None
    for c in rest:
        rest_node = c if rest_node is None else ("bin", "and", rest_node, c)
    return hits[0], knn[0], rest_node


def _sorted_by_plan(t: pa.Table, sort_keys: list[tuple]) -> pa.Table:
    """Apply a SORT spec with per-key null placement.  ES|QL treats null
    as LARGER than any value (ascending → nulls last, descending → nulls
    first) unless NULLS FIRST/LAST overrides; Arrow's ``sort_by`` only
    takes one global placement, so each key becomes a ``pc.rank`` array
    (dense, with its own placement) and one ``np.lexsort`` orders the
    table — stable, vectorized, no per-row Python."""
    if not sort_keys or t.num_rows <= 1:
        return t
    ranks = []
    for col, desc, nf in sort_keys:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if nf is None:
            nf = desc  # nulls are largest (ES|QL default)
        r = pc.rank(
            arr,
            sort_keys="descending" if desc else "ascending",
            null_placement="at_start" if nf else "at_end",
            tiebreaker="dense",
        ).to_numpy(zero_copy_only=False)
        ranks.append(r)
    order = np.lexsort(tuple(reversed(ranks)))
    return t.take(pa.array(order, type=pa.int64()))


def _run_pipe(src: str, sf_dir: str, *, round_decimals: int = 6) -> pa.Table:
    """Single-pipe executor behind :func:`run_esql` (no FORK, and
    CHANGE_POINT is applied by the caller on the returned series)."""
    import ray.data as rd

    plan = parse_esql(_normalize_assign(src))
    import pyarrow.parquet as pq

    if plan.row is not None:
        schema_names = list(plan.row)
        path = None
    else:
        path = os.path.join(sf_dir, f"{plan.table}.parquet")
        if not os.path.exists(path):
            raise ValueError(f"esql: unknown index {plan.table}")
        schema_names = pq.read_schema(path).names
    # bind SAMPLE's hash key to the source table's first schema column
    plan.ops = [
        ("sample", op[1], schema_names[0]) if op[0] == "sample" else op
        for op in plan.ops
    ]
    # MATCH/QSTR query strings validate on the driver, not inside a task
    _validate_fulltext_exprs(plan)

    # LOOKUP JOIN right sides: ES|QL lookup indices are small replicated
    # tables by definition — read once, broadcast once via ray.put, one
    # vectorized Arrow join per batch (the enrich-processor pattern)
    import ray

    look_refs: dict[str, object] = {}
    enrich_refs: dict[str, tuple[object, str]] = {}
    extra_produced: set[str] = set()
    for op in plan.ops:
        if op[0] == "lookup":
            lpath = os.path.join(sf_dir, f"{op[1]}.parquet")
            if not os.path.exists(lpath):
                raise ValueError(f"esql: unknown lookup index {op[1]}")
            lt = pq.read_table(lpath)
            look_refs[op[1]] = ray.put(lt)
            extra_produced |= set(lt.column_names)
        elif op[0] == "enrich":
            builder, rkey = _ENRICH_POLICIES[op[1]]
            et = builder(sf_dir)
            enrich_refs[op[1]] = (ray.put(et), rkey)
            extra_produced |= set(et.column_names) - {rkey}

    cols = _plan_columns(
        plan, schema_names, extra_produced=extra_produced - set(schema_names)
    )
    if plan.row is not None:
        ds = rd.from_arrow(pa.table({k: [v] for k, v in plan.row.items()}))
    else:
        ds = rd.read_parquet(path, columns=cols)

    knn_spec = _extract_knn(plan)
    if knn_spec is not None:
        # KNN(field, q, k) → two streamed passes, ES's pushdown shape:
        # pass 1 scores every (pre-filtered) row and keeps only a per-block
        # top-k of SCORES (k floats per block — never the rows); the driver
        # merge yields the kth-best score, and the WHERE is rewritten into
        # a plain threshold predicate for the main pass.  Ties at the
        # threshold all match (SQL rank() semantics) — deterministic, and
        # measure-zero on real-valued vectors.
        where_idx, knn_node, rest = knn_spec
        k = knn_node[2][2][1]
        score_node = ("func", "V_COSINE", [knn_node[2][0], knn_node[2][1]])

        def _knn_prepass(batch: pa.Table) -> pa.Table:
            if rest is not None:
                batch = batch.filter(pc.fill_null(_eval_expr(rest, batch), False))
            s = _as_array(_eval_expr(score_node, batch))
            x = pc.drop_null(s).cast(pa.float64()).to_numpy(zero_copy_only=False)
            if len(x) > k:
                x = np.partition(x, len(x) - k)[len(x) - k:]
            return pa.table({"s": pa.array(x, type=pa.float64())})

        from ..functions.blocks import collect_tables

        parts = collect_tables(
            ds.map_batches(
                _knn_prepass, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        scores = (
            pa.concat_tables(parts)["s"].to_numpy(zero_copy_only=False)
            if parts
            else np.empty(0, dtype=np.float64)
        )
        thr = float(np.sort(scores)[-k]) if len(scores) >= k else -np.inf
        pred = ("bin", ">=", score_node, ("lit", thr))
        if rest is not None:
            pred = ("bin", "and", pred, rest)
        plan.ops[where_idx] = ("where", pred)

    # ---- ES|QL full-text SCORING (8.18+): `FROM idx METADATA _score |
    # WHERE MATCH(field, "query")` populates _score with the Lucene-BM25
    # sum of the MATCH conjuncts (non-scoring conjuncts contribute 0 —
    # ES's own behavior).  The df / N / avgdl statistics are INDEX-global
    # in ES, so a pre-pass streams the unfiltered source once and reduces
    # (N, Σdl, df per analyzed query term) per scored field — partials
    # bounded by the query vocabulary, never row count.  Only MATCH
    # conjuncts in the first WHERE score (QSTR/KQL rows keep _score null
    # semantics via a 0 contribution — documented subset).
    score_specs: list[tuple[str, list[str]]] = []
    if "_score" in plan.metadata and plan.ops and plan.ops[0][0] == "where":
        from ..functions.tokenize import tokenize_query

        for c in _and_conjuncts(plan.ops[0][1]):
            if isinstance(c, tuple) and c[0] == "func" and c[1] == "MATCH":
                fld, q = c[2]
                if fld[0] == "col" and q[0] == "lit" and isinstance(q[1], str):
                    score_specs.append(
                        (fld[1], sorted(set(tokenize_query(q[1]))))
                    )
    score_stats: dict[str, tuple[float, float, dict[str, float]]] = {}
    if score_specs:
        from ..functions.tokenize import tokenize_flat as _tok_flat

        field_terms: dict[str, list[str]] = {}
        for f_, ts_ in score_specs:
            field_terms.setdefault(f_, [])
            field_terms[f_] = sorted(set(field_terms[f_]) | set(ts_))

        def _score_prepass(batch: pa.Table) -> pa.Table:
            fs, ts, dfs, ns, sdls = [], [], [], [], []
            for f_, terms_ in field_terms.items():
                col = batch[f_]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                toks, didx, dl = _tok_flat(col)
                fs.append(f_); ts.append(None)
                dfs.append(0); ns.append(len(col))
                sdls.append(int(np.asarray(dl, dtype=np.int64).sum()))
                tnp = toks.to_numpy(zero_copy_only=False)
                for t_ in terms_:
                    hit = tnp == t_
                    fs.append(f_); ts.append(t_)
                    dfs.append(int(_hits_to_rows(len(col), didx, hit).sum()))
                    ns.append(0); sdls.append(0)
            return pa.table(
                {
                    "f": pa.array(fs, type=pa.string()),
                    "t": pa.array(ts, type=pa.string()),
                    "df": pa.array(dfs, type=pa.int64()),
                    "n": pa.array(ns, type=pa.int64()),
                    "sdl": pa.array(sdls, type=pa.int64()),
                }
            )

        from ..functions.blocks import collect_tables

        sparts = collect_tables(
            ds.map_batches(
                _score_prepass, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        scat = pa.concat_tables(sparts) if sparts else None
        for f_, terms_ in field_terms.items():
            if scat is None:
                score_stats[f_] = (0.0, 1.0, {t_: 0.0 for t_ in terms_})
                continue
            mine = scat.filter(pc.equal(scat["f"], f_))
            n_docs = float(sum(mine["n"].to_pylist()))
            sdl = float(sum(mine["sdl"].to_pylist()))
            avgdl = sdl / n_docs if n_docs else 1.0
            dfmap: dict[str, float] = {}
            for t_ in terms_:
                rows = mine.filter(
                    pc.equal(pc.fill_null(mine["t"], ""), t_)
                )
                dfmap[t_] = float(sum(rows["df"].to_pylist()))
            score_stats[f_] = (n_docs, avgdl, dfmap)

    stats = list(plan.stats)
    by = list(plan.by)

    def _row_ops(batch: pa.Table, ops: list[tuple]) -> pa.Table:
        for op_idx, op in enumerate(ops):
            if op[0] == "where":
                mask = _eval_expr(op[1], batch)
                batch = batch.filter(pc.fill_null(mask, False))
            elif op[0] == "insist":
                name = op[1]
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(batch.num_rows, type=pa.string())
                    )
            elif op[0] == "mvexpand":
                name = op[1]
                col = batch[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if not pa.types.is_list(col.type):
                    raise ValueError(
                        "esql: MV_EXPAND needs a multi-value (list) column"
                    )
                lengths = pc.list_value_length(col).to_numpy(
                    zero_copy_only=False
                )
                lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
                # ES|QL semantics: a null (or element-less) multi-value
                # still yields ONE row, with a null expanded value
                out_counts = np.maximum(lengths, 1)
                src_row = np.repeat(
                    np.arange(batch.num_rows, dtype=np.int64), out_counts
                )
                starts = np.concatenate(
                    [[0], np.cumsum(out_counts)]
                )[:-1].astype(np.int64)
                ordinal = np.arange(len(src_row), dtype=np.int64) - np.repeat(
                    starts, out_counts
                )
                row_off = np.concatenate([[0], np.cumsum(lengths)])[:-1]
                flat = col.flatten()
                valid = lengths[src_row] > 0
                flat_idx = pa.array(
                    np.where(valid, row_off[src_row] + ordinal, 0),
                    type=pa.int64(),
                    mask=~valid,
                )
                vals = (
                    flat.take(flat_idx)
                    if len(flat)
                    else pa.nulls(len(src_row), type=col.type.value_type)
                )
                batch = batch.take(pa.array(src_row)).set_column(
                    batch.schema.get_field_index(name), name, vals
                )
            elif op[0] == "rename":
                old, new = op[1], op[2]
                if old not in batch.column_names:
                    raise ValueError(f"esql: RENAME of unknown column {old}")
                batch = batch.rename_columns(
                    [new if c == old else c for c in batch.column_names]
                )
            elif op[0] == "enrich":
                import ray as _ray

                et_ref, rkey = enrich_refs[op[1]]
                et = _ray.get(et_ref)
                key = op[2]
                if key not in batch.column_names:
                    raise ValueError(f"esql: ENRICH key {key} not in the pipe")
                b2 = batch.append_column(
                    "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
                )
                joined = b2.join(
                    et, keys=[key], right_keys=[rkey], join_type="left outer"
                )
                batch = joined.sort_by("__row").drop_columns(["__row"])
            elif op[0] == "lookup":
                import ray as _ray

                lt = _ray.get(look_refs[op[1]])
                key = op[2]
                if key not in batch.column_names:
                    raise ValueError(f"esql: LOOKUP key {key} not in the pipe")
                # Arrow joins don't preserve order — pin it with a row index
                b2 = batch.append_column(
                    "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
                )
                joined = b2.join(lt, keys=[key], join_type="left outer")
                batch = joined.sort_by("__row").drop_columns(["__row"])
            elif op[0] == "parse":
                src_arr = batch[op[1]]
                if isinstance(src_arr, pa.ChunkedArray):
                    src_arr = src_arr.combine_chunks()
                st = pc.extract_regex(src_arr, op[2])
                for name, typ in op[3]:
                    if isinstance(typ, tuple) and typ[0] == "cat":
                        # dissect %{+key} append: join the capture chain
                        parts = [pc.struct_field(st, g) for g in typ[1]]
                        v = pc.binary_join_element_wise(*parts, typ[2])
                    else:
                        v = pc.struct_field(st, name)
                    if typ == "int":
                        v = pc.cast(v, pa.int64())
                    elif typ == "float":
                        v = pc.cast(v, pa.float64())
                    if name in batch.column_names:
                        batch = batch.set_column(
                            batch.schema.get_field_index(name), name, v
                        )
                    else:
                        batch = batch.append_column(name, v)
            elif op[0] == "inline":
                # INLINESTATS: the pre-computed group table (bounded by
                # group cardinality) was broadcast once via ray.put — one
                # order-pinned Arrow left join per batch, like LOOKUP
                import ray as _ray

                gt = _ray.get(inline_refs[op_idx])
                iby = op[2]
                if not iby:  # global stats: constant columns on every row
                    for c in gt.column_names:
                        v = gt.column(c)[0].as_py() if gt.num_rows else None
                        batch = batch.append_column(
                            c,
                            pa.array(
                                [v] * batch.num_rows,
                                type=gt.schema.field(c).type,
                            ),
                        )
                else:
                    b2 = batch.append_column(
                        "__row",
                        pa.array(np.arange(batch.num_rows, dtype=np.int64)),
                    )
                    joined = b2.join(gt, keys=iby, join_type="left outer")
                    batch = joined.sort_by("__row").drop_columns(["__row"])
            elif op[0] == "sample":
                # deterministic sample: sha256 of the source table's first
                # schema column (stringified); keep iff the first 2 digest
                # bytes fall below p·2^16 — vectorized, shard-order-free
                from ..functions.hashing import sha256_column

                thr = int(op[1] * 65536)
                if op[2] not in batch.column_names:
                    raise ValueError(
                        f"esql: SAMPLE key column {op[2]} was renamed away"
                    )
                keyc = _as_array(batch[op[2]])
                h = sha256_column(pc.cast(keyc, pa.string()))
                hb = np.frombuffer(h.buffers()[1], dtype=np.uint8)
                hb = hb[: 32 * batch.num_rows].reshape(-1, 32)
                first2 = hb[:, 0].astype(np.int64) * 256 + hb[:, 1]
                keep = first2 < thr
                if keyc.null_count:  # null keys never pass
                    keep &= pc.is_valid(keyc).to_numpy(zero_copy_only=False)
                batch = batch.filter(pa.array(keep))
            elif op[0] == "completion":
                # registered (deterministic fake) inference endpoint over
                # the evaluated prompt — one vectorized call per batch
                _, out, prompt_e, endpoint = op
                fn = _INFERENCE_ENDPOINTS[endpoint][1]
                val = _eval_expr(prompt_e, batch)
                if not isinstance(val, (pa.Array, pa.ChunkedArray)):
                    val = pa.array([val] * batch.num_rows)
                comp = fn(_as_array(pc.cast(val, pa.string())))
                if out in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index(out), out, comp
                    )
                else:
                    batch = batch.append_column(out, comp)
            elif op[0] == "rerank":
                _, qtext, fld, endpoint = op
                fn = _INFERENCE_ENDPOINTS[endpoint][1]
                scores = fn(qtext, _as_array(pc.cast(batch[fld], pa.string())))
                if "_score" in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index("_score"), "_score", scores
                    )
                else:
                    batch = batch.append_column("_score", scores)
            else:
                name, e = op[1], op[2]
                val = _eval_expr(e, batch)
                if not isinstance(val, (pa.Array, pa.ChunkedArray)):
                    val = pa.array([val] * batch.num_rows)
                if name in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index(name), name, val
                    )
                else:
                    batch = batch.append_column(name, val)
        return batch

    def transform(batch: pa.Table) -> pa.Table:
        for m_ in plan.metadata:
            # scan-time metadata columns (ES|QL FROM ... METADATA): _index
            # = source index name, _id = the table's id column as a string
            # (the corpus convention: first schema column), _version = 1,
            # _score = null outside a scoring context — ES's own values
            # for a non-scoring pipe
            if m_ == "_index":
                col = pa.array([plan.table] * batch.num_rows, type=pa.string())
            elif m_ == "_id":
                col = pc.cast(batch[schema_names[0]], pa.string())
            elif m_ == "_version":
                col = pa.array(np.ones(batch.num_rows, np.int64))
            elif m_ == "_score" and score_specs:
                from ..functions.bm25 import idf as _idf, tf_norm as _tfn
                from ..functions.tokenize import tokenize_flat as _tf2

                total = np.zeros(batch.num_rows, dtype=np.float64)
                tok_cache: dict[str, tuple] = {}
                for f_, terms_ in score_specs:
                    if f_ not in tok_cache:
                        c_ = batch[f_]
                        if isinstance(c_, pa.ChunkedArray):
                            c_ = c_.combine_chunks()
                        tok_cache[f_] = _tf2(c_)
                    toks, didx, dl = tok_cache[f_]
                    n_docs, avgdl, dfmap = score_stats[f_]
                    tnp = toks.to_numpy(zero_copy_only=False)
                    dlf = np.asarray(dl, dtype=np.float64)
                    for t_ in terms_:
                        df_ = dfmap.get(t_, 0.0)
                        if df_ <= 0:
                            continue
                        tf = np.bincount(
                            didx[tnp == t_], minlength=batch.num_rows
                        ).astype(np.float64)
                        contrib = float(_idf(n_docs, df_)) * _tfn(
                            tf, np.maximum(dlf, 1.0), avgdl
                        )
                        total += np.where(tf > 0, contrib, 0.0)
                col = pa.array(total, type=pa.float64())
            else:  # _score (no scoring context)
                col = pa.nulls(batch.num_rows, type=pa.float64())
            batch = batch.append_column(m_, col)
        batch = _row_ops(batch, plan.ops)
        if not stats and by:
            # agg-less STATS BY: per-batch DISTINCT over the keys
            return batch.select(by).group_by(by).aggregate([])
        if not stats:
            # partial top-k (or full pass-through when no limit)
            if plan.keep:
                out_cols = _expand_cols(plan.keep, batch.column_names, "KEEP")
            else:
                dropped = (
                    set(_expand_cols(plan.drop, batch.column_names, "DROP"))
                    if plan.drop
                    else set()
                )
                out_cols = [
                    c for c in batch.column_names if c not in dropped
                ]
            batch = batch.select(out_cols)
            if plan.sort and plan.limit is not None:
                batch = _sorted_by_plan(batch, plan.sort).slice(0, plan.limit)
            return batch
        if stats and stats[0][1] in _ENDPOINT_FAMILY:
            # per-batch per-group ENDPOINTS — the mergeable partial of
            # RATE / FIRST_OVER_TIME / LAST_OVER_TIME (combine keeps the
            # globally earliest / latest endpoint per group)
            col = stats[0][2]
            b = batch.select(by + [col, "ts"]).sort_by([("ts", "ascending")])
            g = b.group_by(by).aggregate(
                [(col, "first"), (col, "last"), ("ts", "min"), ("ts", "max")]
            )
            return pa.table(
                {
                    **{k_: g[k_] for k_ in by},
                    "__vf": g[f"{col}_first"],
                    "__vl": g[f"{col}_last"],
                    "__tmin": g["ts_min"],
                    "__tmax": g["ts_max"],
                }
            )
        if stats and stats[0][1] in _DISTINCT_FAMILY:
            # per-batch DISTINCT (by + cols) rows — the mergeable partial of
            # COUNT_DISTINCT / VALUES (combine = distinct again, then finish)
            cols = by + sorted({s_[2] for s_ in stats})
            return batch.select(cols).group_by(cols).aggregate([])
        if stats and stats[0][1] in _VALUECOUNT_FAMILY:
            # per-batch VALUE COUNTS — the mergeable partial of the exact
            # order-statistic family (combine = sum counts, then finish:
            # quantile interpolation / MAD re-keying / top-k expansion)
            col = stats[0][2]
            t = batch.select(by + [col]).append_column(
                "__one", pa.array(np.ones(batch.num_rows, np.int64))
            )
            g = t.group_by(by + [col]).aggregate([("__one", "sum")])
            return g.rename_columns(by + [col, "__cnt"])
        return _standard_partials(batch, stats, by)

    def _standard_partials(
        batch: pa.Table, st: list[tuple], gb: list[str]
    ) -> pa.Table:
        # STATS partials: one Arrow hash-agg per batch, mergeable outputs
        aggs, out_names = [], []
        for i, (out, fn, col, filt, param) in enumerate(st):
            src_col = col
            if src_col is None:  # COUNT(*): count a constant marker
                if "__one" not in batch.column_names:
                    batch = batch.append_column(
                        "__one", pa.array(np.ones(batch.num_rows, np.int64))
                    )
                src_col = "__one"
            if filt is not None:
                # per-aggregate WHERE: null out filtered rows — Arrow
                # count/sum/min/max all skip nulls, which IS SQL FILTER
                mask = pc.fill_null(_eval_expr(filt, batch), False)
                src = _as_array(batch[src_col])
                masked = pc.if_else(mask, src, pa.scalar(None, type=src.type))
                src_col = f"__fsrc{i}"
                batch = batch.append_column(src_col, masked)
            if fn == "STD_DEV":
                # partials: sum, count, sum-of-squares of the (masked) column
                src = pc.cast(_as_array(batch[src_col]), pa.float64())
                batch = batch.append_column(f"__sq{i}", pc.multiply(src, src))
                aggs += [(src_col, "sum"), (src_col, "count"),
                         (f"__sq{i}", "sum")]
                out_names += [f"{out}__s", f"{out}__n", f"{out}__q"]
                continue
            if fn == "WEIGHTED_AVG":
                # partials: sum(v*w), sum(w) over rows where BOTH are
                # non-null (ES skips null values) — finish is AVG's s/n
                v = pc.cast(_as_array(batch[src_col]), pa.float64())
                w = pc.cast(_as_array(batch[param]), pa.float64())
                valid = pc.and_kleene(pc.is_valid(v), pc.is_valid(w))
                null_f = pa.scalar(None, type=pa.float64())
                batch = batch.append_column(
                    f"__wv{i}", pc.if_else(valid, pc.multiply(v, w), null_f)
                ).append_column(f"__wm{i}", pc.if_else(valid, w, null_f))
                aggs += [(f"__wv{i}", "sum"), (f"__wm{i}", "sum")]
                out_names += [f"{out}__s", f"{out}__n"]
                continue
            for batch_agg, suffix in _PARTIAL[fn]:
                aggs.append((src_col, batch_agg))
                out_names.append(f"{out}__{suffix}")
        # empty batches still emit a schema-correct partial (group_by([]) on
        # an empty table yields one all-null/0 row — mergeable as-is)
        g = batch.group_by(gb).aggregate(aggs)
        # pyarrow names duplicate agg outputs identically; select by position
        sel = pa.table(
            {
                **{b: g[b] for b in gb},
                **{
                    out_names[i]: g.column(len(gb) + i)
                    for i in range(len(out_names))
                },
            }
        )
        return sel

    def _standard_combine(
        cat: pa.Table, st: list[tuple], gb: list[str]
    ) -> pa.Table:
        # combine mergeable partials (bounded by #groups × #blocks)
        comb = [
            (c, _COMBINE[c.rsplit("__", 1)[1]])
            for c in cat.column_names
            if c not in gb
        ]
        g = (
            cat.group_by(gb).aggregate(comb)
            if gb
            else cat.group_by([]).aggregate(comb)
        )
        final: dict[str, pa.Array] = {b: g[b] for b in gb}
        for out, fn, _col, _filt, _param in st:
            if fn in ("AVG", "WEIGHTED_AVG"):
                s = g[f"{out}__s_sum"].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                n = g[f"{out}__n_sum"].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    vals = sql_round(s / n, round_decimals)
                # a fully-filtered group has n == 0 → NULL (SQL FILTER)
                final[out] = pa.array(vals, type=pa.float64(), mask=(n == 0))
            elif fn == "COUNT":
                final[out] = g[f"{out}__n_sum"].cast(pa.int64())
            elif fn == "SUM":
                col = g[f"{out}__s_sum"]
                final[out] = (
                    col.cast(pa.int64())
                    if pa.types.is_integer(col.type)
                    else col
                )
            elif fn == "MIN":
                final[out] = g[f"{out}__mn_min"]
            elif fn == "MAX":
                final[out] = g[f"{out}__mx_max"]
            elif fn == "STD_DEV":
                # population stddev from exact partial sums:
                # var = (n·Σx² − (Σx)²) / n² — one deterministic finish,
                # no order-dependence beyond the exact sums themselves
                s = g[f"{out}__s_sum"].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                n = g[f"{out}__n_sum"].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                q = g[f"{out}__q_sum"].to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    var = np.maximum((n * q - s * s) / (n * n), 0.0)
                    vals = sql_round(np.sqrt(var), round_decimals)
                final[out] = pa.array(vals, type=pa.float64(), mask=(n == 0))
        return pa.table(final)

    def _finish_result(res: pa.Table, final_by: list[str]) -> pa.Table:
        # post-STATS command tail (ES|QL: the aggregation result is a new
        # table, so WHERE/EVAL/RENAME and further STATS may follow) —
        # applied driver-side on the group-bounded combined result, then
        # the shared KEEP/SORT/LIMIT output shaping
        for pop in plan.post:
            if pop[0] == "stats":
                res = _standard_combine(
                    _standard_partials(res, pop[1], pop[2]), pop[1], pop[2]
                )
                final_by = pop[2]
            else:
                res = _row_ops(res, [pop])
        if plan.keep is not None:
            res = res.select(_expand_cols(plan.keep, res.column_names, "KEEP"))
        if plan.sort:
            res = _sorted_by_plan(res, plan.sort)
        elif final_by:
            res = res.sort_by([(b, "ascending") for b in final_by])
        if plan.limit is not None:
            res = res.slice(0, plan.limit)
        return res

    import ray

    # ---- INLINESTATS pre-passes: each inline op aggregates the stream as
    # of its position in the pipe (ES runs the same two-phase plan: an agg
    # pass, then a join-back).  The group table is bounded by group
    # cardinality, broadcast once, joined per batch in the main pass.
    inline_refs: dict[int, object] = {}
    for op_i, op in enumerate(plan.ops):
        if op[0] != "inline":
            continue
        _, istats, iby = op

        def _inline_tf(batch: pa.Table, _pre=plan.ops[:op_i], _st=istats, _gb=iby):
            return _standard_partials(_row_ops(batch, _pre), _st, _gb)

        im = ds.map_batches(
            _inline_tf, batch_format="pyarrow", zero_copy_batch=True
        )
        iparts = [ray.get(r) for r in im.to_arrow_refs()]
        iparts = [
            p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
            for p in iparts
        ]
        icat = pa.concat_tables(iparts, promote_options="default")
        inline_refs[op_i] = ray.put(_standard_combine(icat, istats, iby))

    mapped = ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)
    if not stats and not by and plan.limit is None and not plan.sort:
        # streaming projection — return the full (small at gate scale) result
        parts = [ray.get(r) for r in mapped.to_arrow_refs()]
        parts = [
            p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
            for p in parts
        ]
        return pa.concat_tables(parts, promote_options="default")
    parts = [ray.get(r) for r in mapped.to_arrow_refs()]
    parts = [
        p if isinstance(p, pa.Table) else pa.Table.from_batches([p]) for p in parts
    ]
    if not stats and not by:
        cat = pa.concat_tables(parts, promote_options="default")
        if plan.sort:
            cat = _sorted_by_plan(cat, plan.sort)
        if plan.limit is not None:
            cat = cat.slice(0, plan.limit)
        return cat
    # combine mergeable partials on the driver (bounded by #groups × #blocks)
    cat = pa.concat_tables(parts, promote_options="default")
    if not stats and by:
        # agg-less STATS BY: DISTINCT over the keys (combine = distinct)
        return _finish_result(cat.group_by(by).aggregate([]), by)
    if stats and stats[0][1] in _ENDPOINT_FAMILY:
        # combine partial endpoints: the globally earliest first-value and
        # latest last-value per group; RATE = Δvalue / Δseconds,
        # FIRST/LAST_OVER_TIME = the endpoint value itself.
        # Documented variant of ES's counter rate: NO reset compensation
        # (events.value is a gauge; counter semantics live in the TSDS
        # downsample pipeline's last_value rollup)
        fn0 = stats[0][1]
        out_name = stats[0][0]
        if cat.num_rows == 0:
            return pa.table(
                {
                    **{b: pa.array([], type=cat.schema.field(b).type) for b in by},
                    out_name: pa.array([], type=pa.float64()),
                }
            )
        ends: dict[tuple, list] = {}
        for r in cat.to_pylist():
            k = tuple(r[b] for b in by)
            e = ends.setdefault(k, [None, None, None, None])
            if e[0] is None or r["__tmin"] < e[0]:
                e[0], e[1] = r["__tmin"], r["__vf"]
            if e[2] is None or r["__tmax"] > e[2]:
                e[2], e[3] = r["__tmax"], r["__vl"]
        uniq = sorted(ends)
        vals = []
        for k in uniq:
            tmin, vf, tmax, vl = ends[k]
            if fn0 == "FIRST_OVER_TIME":
                vals.append(float(sql_round(vf, round_decimals)))
                continue
            if fn0 == "LAST_OVER_TIME":
                vals.append(float(sql_round(vl, round_decimals)))
                continue
            dt_s = (tmax - tmin).total_seconds()
            vals.append(
                None
                if dt_s <= 0
                else float(sql_round((vl - vf) / dt_s, round_decimals))
            )
        final = {
            b: pa.array([k[i] for k in uniq], type=cat.schema.field(b).type)
            for i, b in enumerate(by)
        }
        final[out_name] = pa.array(vals, type=pa.float64())
        return _finish_result(pa.table(final), by)
    if stats and stats[0][1] in _VALUECOUNT_FAMILY:
        out_name, fn0, col = stats[0][:3]
        param0 = stats[0][4]
        out_type = (
            pa.list_(cat.schema.field(col).type)
            if fn0 == "TOP"
            else pa.float64()
        )
        if cat.num_rows == 0:  # empty match: no buckets, ES|QL's shape
            return pa.table(
                {
                    **{b: pa.array([], type=cat.schema.field(b).type) for b in by},
                    out_name: pa.array([], type=out_type),
                }
            )
        g = cat.group_by(by + [col]).aggregate([("__cnt", "sum")])
        cnts = np.asarray(g["__cnt_sum"], dtype=np.int64)
        raw = g[col].to_pylist()
        from .aggs import _weighted_quantile

        def _finish(idx: np.ndarray):
            c = cnts[idx]
            if fn0 == "TOP":
                # expand the (value, count) histogram in order, capped at k
                k, order = param0
                pairs = sorted(
                    ((raw[i], cnts[i]) for i in idx),
                    key=lambda p_: p_[0],
                    reverse=(order == "desc"),
                )
                outv: list = []
                for v_, n_ in pairs:
                    outv.extend([v_] * min(int(n_), k - len(outv)))
                    if len(outv) >= k:
                        break
                return outv
            v = np.asarray([raw[i] for i in idx], dtype=np.float64)
            if fn0 == "MEDIAN":
                r = _weighted_quantile(v, c, 0.5)
            elif fn0 == "PERCENTILE":
                r = _weighted_quantile(v, c, param0 / 100.0)
            else:  # MEDIAN_ABSOLUTE_DEVIATION: median of |x − median(x)|
                m = _weighted_quantile(v, c, 0.5)
                r = _weighted_quantile(np.abs(v - m), c, 0.5)
            return float(sql_round(r, round_decimals))

        final: dict[str, object] = {}
        if by:
            keys = list(zip(*(g[b].to_pylist() for b in by)))
            uniq = sorted(set(keys))
            vals_out = []
            for k in uniq:
                m = np.array([kk == k for kk in keys])
                vals_out.append(_finish(np.nonzero(m)[0]))
            for i, b in enumerate(by):
                final[b] = pa.array([k[i] for k in uniq])
            final[out_name] = pa.array(vals_out, type=out_type)
        else:
            final = {
                out_name: pa.array(
                    [_finish(np.arange(len(raw)))], type=out_type
                )
            }
        return _finish_result(pa.table(final), by)
    if stats and stats[0][1] in _DISTINCT_FAMILY:
        # each COUNT_DISTINCT/VALUES deduplicates ITS OWN column's (by, col)
        # projection of the distinct-tuple partial — counting the deduped
        # tuples directly would count distinct tuples, overcounting
        # whenever two CD columns aren't 1:1.  Every projection shares the
        # same group-key set (each group contributes >=1 tuple), so the
        # per-stat results align after one identical sort by the keys.
        # VALUES returns the distinct non-null values as an ascending-sorted
        # multivalue (ES documents NO order guarantee; the graft pins
        # ascending for determinism — the driver gate hashes values).
        final: dict[str, object] = {}
        if by:
            for out, fn0, c, _f, _prm in stats:
                d = cat.select(by + [c]).group_by(by + [c]).aggregate([])
                if fn0 == "VALUES":
                    keys = list(zip(*(d[b].to_pylist() for b in by)))
                    vv = d[c].to_pylist()
                    byk: dict[tuple, list] = {}
                    for kk, v_ in zip(keys, vv):
                        byk.setdefault(kk, [])
                        if v_ is not None:
                            byk[kk].append(v_)
                    uniq = sorted(byk)
                    if not final:
                        for i, b in enumerate(by):
                            final[b] = pa.array(
                                [k[i] for k in uniq],
                                type=cat.schema.field(b).type,
                            )
                    final[out] = pa.array(
                        [sorted(byk[k]) for k in uniq],
                        type=pa.list_(cat.schema.field(c).type),
                    )
                else:
                    g = d.group_by(by).aggregate([(c, "count")]).sort_by(
                        [(b, "ascending") for b in by]
                    )
                    if not final:
                        final = {b: g[b] for b in by}
                    final[out] = g.column(f"{c}_count").cast(pa.int64())
        else:
            for out, fn0, c, _f, _prm in stats:
                d = cat.select([c]).group_by([c]).aggregate([])
                if fn0 == "VALUES":
                    final[out] = pa.array(
                        [sorted(v_ for v_ in d[c].to_pylist() if v_ is not None)],
                        type=pa.list_(cat.schema.field(c).type),
                    )
                else:
                    final[out] = pa.array([d.num_rows], type=pa.int64())
        return _finish_result(pa.table(final), by)
    return _finish_result(_standard_combine(cat, stats, by), by)
