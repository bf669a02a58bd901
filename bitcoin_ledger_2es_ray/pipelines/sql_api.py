"""ES SQL endpoint (``POST /_sql``) as a source-to-source translation.

Elasticsearch's SQL API compiles SQL onto the same execution engine its
other query languages use — modern ES literally rewrites SQL to ES|QL.
The graft does exactly that: ``sql_to_esql`` translates a SQL SELECT into
an ES|QL pipe string and ``run_sql`` executes it through
``pipelines/esql.run_esql`` — one translator, zero new physical plans,
every scale property (column-pruned read, fused row stage, mergeable
STATS partials, partial top-k) inherited.

Supported surface (ES SQL's core SELECT):

    SELECT col | agg(col) [AS alias], ...
    FROM table
    [WHERE predicate]          =, <>, !=, <,<=,>,>=, AND/OR/NOT, LIKE
    [GROUP BY cols]
    [ORDER BY col [ASC|DESC], ...]
    [LIMIT n]

Translation rules: ``=`` → ``==``, ``<>`` → ``!=``, single-quoted string
literals → double-quoted, SQL LIKE wildcards ``%``/``_`` → ES|QL
``*``/``?``; aggregates become ``STATS alias = AGG(col) BY group-cols``
(each non-aggregate select item must appear in GROUP BY — validated like
any SQL engine); a trailing ``KEEP`` restores the SELECT's column order.
``AVG`` inherits the ES|QL contract (rounded to 6 dp).  ``HAVING``
translates to a post-STATS ``WHERE`` over the aggregation result (alias
references, ES SQL's own rule).  Unsupported constructs (joins,
subqueries, DISTINCT, ``*`` projection) raise a parse error rather than
mis-translating.
"""

from __future__ import annotations

import re

_SQL_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>\d+\.\d+|\d+)
  | (?P<op><>|!=|>=|<=|=|>|<|\+|-|\*|/|,|\(|\))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG"}
_KW = {
    "SELECT", "FROM", "WHERE", "GROUP", "ORDER", "BY", "LIMIT",
    "AS", "AND", "OR", "NOT", "ASC", "DESC", "LIKE", "HAVING", "DISTINCT",
}
_REJECT = {"JOIN", "UNION", "OFFSET"}


def _lex(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _SQL_TOKEN.match(src, pos)
        if m is None:
            raise ValueError(f"sql: cannot lex at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.upper() in _KW | _REJECT | _AGGS:
            out.append(("kw", text.upper()))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


class _T:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise ValueError(f"sql: expected {text or kind}, got {t}")
        return t


def _esql_str(sql_literal: str) -> str:
    inner = sql_literal[1:-1].replace("''", "'")
    return '"' + inner.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _like_pattern(sql_literal: str) -> str:
    inner = sql_literal[1:-1].replace("''", "'")
    trans = inner.replace("%", "*").replace("_", "?")
    return '"' + trans.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _predicate(t: _T) -> str:
    """Re-emit the WHERE predicate token-by-token in ES|QL spelling."""
    out: list[str] = []
    depth = 0
    while True:
        kind, text = t.peek()
        if kind == "eof":
            break
        if (kind == "kw" and depth == 0
                and text in ("GROUP", "ORDER", "LIMIT", "HAVING")):
            break
        if kind == "kw" and text in _REJECT:
            raise ValueError(f"sql: unsupported construct {text}")
        t.next()
        if kind == "op":
            if text == "(":
                depth += 1
            elif text == ")":
                depth -= 1
            out.append("==" if text == "=" else "!=" if text == "<>" else text)
        elif kind == "kw" and text == "LIKE":
            out.append("LIKE")
            nk, nv = t.next()
            if nk != "str":
                raise ValueError("sql: LIKE needs a string literal")
            out.append(_like_pattern(nv))
        elif kind == "str":
            out.append(_esql_str(text))
        else:
            out.append(text)
    if not out:
        raise ValueError("sql: empty WHERE predicate")
    return " ".join(out)


def sql_to_esql(sql: str) -> str:
    """Translate one SQL SELECT into the equivalent ES|QL pipe string."""
    t = _T(_lex(sql.strip().rstrip(";")))
    t.expect("kw", "SELECT")
    distinct = False
    if t.peek() == ("kw", "DISTINCT"):
        t.next()
        distinct = True
    star = False
    if t.peek() == ("op", "*"):
        # SELECT * — a bare projection (the pipe keeps the full schema)
        t.next()
        star = True
        if distinct:
            raise ValueError("sql: SELECT DISTINCT * is not supported")

    # select list: (kind, esql_fragment, output_name)
    items: list[tuple[str, str, str]] = []
    while not star:
        kind, text = t.next()
        if kind == "kw" and text in _AGGS:
            t.expect("op", "(")
            if text == "COUNT" and t.peek() == ("op", "*"):
                t.next()
                frag = "COUNT(*)"
            else:
                col = t.expect("ident")[1]
                frag = f"{text}({col})"
            t.expect("op", ")")
            if t.peek() != ("kw", "AS"):
                raise ValueError("sql: aggregate select items need AS alias")
            t.next()
            alias = t.expect("ident")[1]
            items.append(("agg", frag, alias))
        elif kind == "ident":
            name = text
            if t.peek() == ("kw", "AS"):
                t.next()
                alias = t.expect("ident")[1]
                items.append(("rename", name, alias))
            else:
                items.append(("col", name, name))
        elif kind == "op" and text == "*":
            raise ValueError("sql: SELECT * is not supported — name columns")
        else:
            raise ValueError(f"sql: bad select item at {text!r}")
        if t.peek() == ("op", ","):
            t.next()
            continue
        break

    t.expect("kw", "FROM")
    table = t.expect("ident")[1]
    if t.peek()[0] == "kw" and t.peek()[1] in _REJECT:
        raise ValueError(f"sql: unsupported construct {t.peek()[1]}")

    where = None
    if t.peek() == ("kw", "WHERE"):
        t.next()
        where = _predicate(t)

    group: list[str] = []
    if t.peek() == ("kw", "GROUP"):
        t.next()
        t.expect("kw", "BY")
        while True:
            group.append(t.expect("ident")[1])
            if t.peek() == ("op", ","):
                t.next()
                continue
            break

    having = None
    if t.peek() == ("kw", "HAVING"):
        # HAVING → a post-STATS WHERE over the aggregation result; it may
        # reference select-list ALIASES (ES SQL's own rule) — aggregate
        # EXPRESSIONS repeated inside HAVING are not re-derived
        t.next()
        having = _predicate(t)

    order: list[str] = []
    if t.peek() == ("kw", "ORDER"):
        t.next()
        t.expect("kw", "BY")
        while True:
            col = t.expect("ident")[1]
            d = ""
            if t.peek() in (("kw", "ASC"), ("kw", "DESC")):
                d = " " + t.next()[1]
            order.append(col + d)
            if t.peek() == ("op", ","):
                t.next()
                continue
            break

    limit = None
    if t.peek() == ("kw", "LIMIT"):
        t.next()
        limit = t.expect("num")[1]
    if t.peek()[0] != "eof":
        raise ValueError(f"sql: trailing tokens at {t.peek()[1]!r}")

    aggs = [(f, a) for k, f, a in items if k == "agg"]
    plain = [(f, a) for k, f, a in items if k != "agg"]
    pipe = [f"FROM {table}"]
    if where:
        pipe.append(f"WHERE {where}")
    if star:
        if group or having:
            raise ValueError("sql: SELECT * cannot take GROUP BY / HAVING")
    elif distinct:
        if aggs or group or having:
            raise ValueError(
                "sql: DISTINCT composes with plain columns only "
                "(GROUP BY / aggregates already deduplicate)"
            )
        for f, a in plain:
            if f != a:
                pipe.append(f"RENAME {f} AS {a}")
        # DISTINCT == ES|QL's agg-less STATS BY over the keys
        pipe.append("STATS BY " + ", ".join(a for _, a in plain))
        pipe.append("KEEP " + ", ".join(a for _, a in plain))
    elif aggs:
        missing = [f for f, _ in plain if f not in group]
        if missing:
            raise ValueError(
                f"sql: non-aggregate select items {missing} must appear in "
                "GROUP BY"
            )
        # group-column aliases must rename BEFORE the aggregation (the
        # pipe refuses row commands after STATS), so BY uses the alias
        renames = [(f, a) for k, f, a in items if k == "rename"]
        for f, a in renames:
            pipe.append(f"RENAME {f} AS {a}")
        alias_of = dict(renames)
        stats = ", ".join(f"{a} = {f}" for f, a in aggs)
        by_cols = [alias_of.get(g, g) for g in group]
        by = f" BY {', '.join(by_cols)}" if by_cols else ""
        pipe.append(f"STATS {stats}{by}")
        if having:
            pipe.append(f"WHERE {having}")
        pipe.append("KEEP " + ", ".join(a for _, _, a in items))
    else:
        if having:
            raise ValueError("sql: HAVING needs aggregate select items")
        if group:
            raise ValueError("sql: GROUP BY without aggregates")
        for f, a in plain:
            if f != a:
                pipe.append(f"RENAME {f} AS {a}")
        pipe.append("KEEP " + ", ".join(a for _, _, a in items))
    if order:
        pipe.append("SORT " + ", ".join(order))
    if limit is not None:
        pipe.append(f"LIMIT {limit}")
    return " | ".join(pipe)


def run_sql(sql: str, sf_dir: str):
    """Translate + execute one SQL SELECT over the ``sf_dir`` tables;
    catalog commands (``SHOW TABLES``, ``DESCRIBE t`` / ``SHOW COLUMNS
    [FROM|IN] t``) answer from parquet footers without a scan."""
    import re as _re

    from .esql import run_esql

    stripped = sql.strip().rstrip(";").strip()
    if _re.fullmatch(r"SHOW\s+TABLES", stripped, _re.IGNORECASE):
        return show_tables(sf_dir)
    m = _re.fullmatch(
        r"(?:DESCRIBE|DESC|SHOW\s+COLUMNS\s+(?:FROM|IN))\s+(\w+)",
        stripped,
        _re.IGNORECASE,
    )
    if m:
        return describe_table(sf_dir, m.group(1))
    return run_esql(sql_to_esql(sql), sf_dir)


# ES SQL type names for Arrow physical types (DESCRIBE/SHOW COLUMNS).
# ES maps analyzed strings to "text"; every testdata string column is the
# analyzed kind, so the mapping has no keyword branch (documented).
_ES_TYPE = {
    "int64": "long",
    "int32": "integer",
    "double": "double",
    "float": "float",
    "string": "text",
    "large_string": "text",
    "bool": "boolean",
    "timestamp[us]": "datetime",
    "timestamp[ns]": "datetime",
}


def show_tables(sf_dir: str) -> "pa.Table":
    """ES SQL ``SHOW TABLES``: the catalog — one row per parquet table in
    the directory, name ascending (ES lists indices the same way)."""
    import os

    import pyarrow as pa

    names = sorted(
        f[:-8]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    return pa.table({"name": pa.array(names, type=pa.string())})


def describe_table(sf_dir: str, table: str) -> "pa.Table":
    """ES SQL ``DESCRIBE <table>`` / ``SHOW COLUMNS``: (column, type) rows
    from the parquet SCHEMA (footer only — no data reads), Arrow types
    mapped to ES SQL type names, column name ascending."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        raise ValueError(f"sql: unknown table {table!r}")
    schema = pq.read_schema(path)
    rows = []
    for f in schema:
        t = str(f.type)
        es = _ES_TYPE.get(t)
        if es is None and t.startswith("list"):
            es = "dense_vector"
        rows.append((f.name, es or t))
    rows.sort()
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], type=pa.string()),
            "type": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
