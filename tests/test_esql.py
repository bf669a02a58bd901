"""ES|QL: parser verification, expression evaluation, and plan-vs-DuckDB
identity of the three gate pipes (pipelines/esql.py)."""

from __future__ import annotations

import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitcoin_ledger_2es_ray.pipelines.esql import (
    _normalize_assign,
    _plan_columns,
    parse_esql,
    run_esql,
)

from conftest import SF_DIR


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).arrow()


def _assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names
    assert a.num_rows == b.num_rows
    for name in a.column_names:
        ca, cb = a[name].to_pylist(), b[name].to_pylist()
        if ca and isinstance(ca[0], float):
            assert all(abs(x - y) < 1e-9 for x, y in zip(ca, cb)), name
        else:
            assert ca == cb, name


# ------------------------------------------------------------------ parser


def test_parse_shape():
    p = parse_esql(_normalize_assign(
        'FROM documents | WHERE lang == "en" AND n_chars > 10 '
        "| EVAL x = n_chars * 2 | STATS c = COUNT(*), m = AVG(x) BY lang "
        "| SORT m DESC | LIMIT 3"
    ))
    assert p.table == "documents"
    assert [op[0] for op in p.ops] == ["where", "eval"]
    assert p.stats == [
        ("c", "COUNT", None, None, None),
        ("m", "AVG", "x", None, None),
    ]
    assert p.by == ["lang"] and p.sort == [("m", True, None)] and p.limit == 3


def test_parse_rejections():
    with pytest.raises(ValueError, match="nondeterministic"):
        parse_esql("FROM documents | LIMIT 5")
    with pytest.raises(ValueError, match="not valid mid-pipe"):
        parse_esql('FROM documents | SHOW info')
    with pytest.raises(ValueError, match="extracts no fields"):
        parse_esql('FROM documents | GROK text "%{WORD}"')
    with pytest.raises(ValueError, match="unknown grok pattern"):
        parse_esql('FROM documents | GROK text "%{NOPE:x}"')
    with pytest.raises(ValueError, match="duplicate grok field"):
        parse_esql('FROM documents | GROK text "%{WORD:x} %{WORD:x}"')
    # a second STATS is a post-aggregation (ES|QL allows arbitrary depth)
    p2 = parse_esql(_normalize_assign(
        "FROM documents | STATS c = COUNT(*) | STATS d = COUNT(*)"
    ))
    assert p2.post == [("stats", [("d", "COUNT", None, None, None)], [])]
    with pytest.raises(ValueError, match="unknown aggregate"):
        parse_esql(_normalize_assign("FROM documents | STATS c = MODE(n_chars)"))


def test_normalize_assign_leaves_strings_alone():
    s = _normalize_assign('FROM t | EVAL x = 1 | WHERE a == "p=q"')
    assert 'p=q' in s and "x == 1" in s


def test_column_pruning_exact():
    p = parse_esql(_normalize_assign(
        "FROM documents | WHERE n_chars > 10 | STATS c = COUNT(*) BY lang"
    ))
    cols = _plan_columns(p, ["doc_id", "text", "lang", "source", "n_chars"])
    assert cols == ["lang", "n_chars"]  # text/doc_id/source never read
    with pytest.raises(ValueError, match="unknown columns"):
        _plan_columns(
            parse_esql("FROM documents | WHERE nope > 1 | SORT doc_id"),
            ["doc_id"],
        )


def test_shadowing_eval_keeps_source_column():
    p = parse_esql(_normalize_assign("FROM events | EVAL value = value * 2 | SORT value DESC, event_id ASC | LIMIT 3"))
    cols = _plan_columns(p, ["event_id", "value"])
    assert "value" in cols


# --------------------------------------------------------------- execution


def test_esql_stats_matches_duckdb(ray_session):
    got = run_esql(
        "FROM documents | WHERE n_chars >= 100 "
        "| STATS cnt = COUNT(*), avg_chars = AVG(n_chars), mx = MAX(n_chars), "
        "mn = MIN(n_chars), total = SUM(n_chars) BY lang | SORT lang",
        SF_DIR,
    )
    want = _duck(
        "SELECT lang, count(*)::BIGINT cnt, round(avg(n_chars),6) avg_chars, "
        "max(n_chars) mx, min(n_chars) mn, sum(n_chars)::BIGINT total "
        "FROM documents WHERE n_chars >= 100 GROUP BY lang ORDER BY lang"
    )
    _assert_tables_equal(got, want)


def test_esql_global_stats(ray_session):
    got = run_esql("FROM documents | STATS n = COUNT(*), avg_c = AVG(n_chars)", SF_DIR)
    want = _duck(
        "SELECT count(*)::BIGINT n, round(avg(n_chars),6) avg_c FROM documents"
    )
    _assert_tables_equal(got, want)


def test_esql_eval_then_where_order(ray_session):
    # WHERE referencing the EVAL'd column — command order must hold
    got = run_esql(
        'FROM documents | EVAL half = ROUND(LENGTH(text) / 2, 6) '
        '| WHERE half > 150 AND lang == "en" '
        "| KEEP doc_id, half | SORT doc_id ASC | LIMIT 50",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id, half FROM (SELECT doc_id, lang, "
        "round(length(text)/2, 6) half FROM documents) "
        "WHERE half > 150 AND lang = 'en' ORDER BY doc_id LIMIT 50"
    )
    _assert_tables_equal(got, want)


def test_esql_sort_limit_partial_topk(ray_session):
    got = run_esql(
        'FROM events | WHERE event_type == "click" '
        "| EVAL v2 = ROUND(value * 2, 6) "
        "| SORT v2 DESC, event_id ASC | LIMIT 20 | KEEP event_id, v2",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, round(value*2,6) v2 FROM events "
        "WHERE event_type = 'click' ORDER BY v2 DESC, event_id LIMIT 20"
    )
    _assert_tables_equal(got, want)


def test_esql_empty_match_preserves_schema(ray_session):
    got = run_esql(
        'FROM documents | WHERE lang == "klingon" '
        "| KEEP doc_id, n_chars | SORT doc_id | LIMIT 5",
        SF_DIR,
    )
    assert got.num_rows == 0
    assert got.column_names == ["doc_id", "n_chars"]
    agg = run_esql(
        'FROM documents | WHERE lang == "klingon" | STATS n = COUNT(*) BY lang',
        SF_DIR,
    )
    assert agg.num_rows == 0 and agg.column_names == ["lang", "n"]


def test_esql_not_and_arithmetic(ray_session):
    got = run_esql(
        'FROM documents | WHERE NOT (lang == "en") AND n_chars + 10 > 500 '
        "| KEEP doc_id | SORT doc_id",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id FROM documents "
        "WHERE NOT lang = 'en' AND n_chars + 10 > 500 ORDER BY doc_id"
    )
    _assert_tables_equal(got, want)


# ------------------------------------------------------- dissect / grok


def test_compile_dissect_shapes():
    from bitcoin_ledger_2es_ray.pipelines.esql import compile_dissect

    rx, fields = compile_dissect("%{a}-%{b} %{?skip} %{c}")
    assert fields == [("a", "str"), ("b", "str"), ("c", "str")]
    m = re.match(rx, "x-y z rest of line")
    assert m and m.group("a") == "x" and m.group("b") == "y"
    # trailing field is greedy: consumes the rest
    assert m.group("c") == "rest of line"


def test_esql_grok_typed_extraction(ray_session):
    """GROK %{INT:k:int} over props == direct JSON-ish parse, summed."""
    sf = "/root/testdata/sf0.001"
    out = run_esql(
        r'FROM events | GROK props "\\{\"k\": %{INT:k:int}\\}" '
        "| STATS n = COUNT(*), s = SUM(k) BY event_type | SORT event_type",
        sf,
    )
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_type", "props"]
    ).to_pandas()
    ev["k"] = ev["props"].str.extract(r'\{"k": (\d+)\}')[0].astype("int64")
    want = (
        ev.groupby("event_type")
        .agg(n=("k", "size"), s=("k", "sum"))
        .reset_index()
        .sort_values("event_type")
    )
    assert out["event_type"].to_pylist() == want["event_type"].tolist()
    assert out["n"].to_pylist() == want["n"].tolist()
    assert out["s"].to_pylist() == want["s"].tolist()


def test_esql_dissect_string_fields_and_nulls(ray_session):
    """DISSECT keeps non-matching rows with null fields (ES|QL semantics);
    a WHERE on the parsed field then drops the nulls."""
    sf = "/root/testdata/sf0.001"
    out = run_esql(
        'FROM events | DISSECT props "{\\"k\\": %{k}}" '
        "| STATS n = COUNT(*) BY k | SORT n DESC, k ASC | LIMIT 5",
        sf,
    )
    ev = pq.read_table(f"{sf}/events.parquet", columns=["props"]).to_pandas()
    ks = ev["props"].str.extract(r'^\{"k": (.*)\}$')[0]
    want = (
        ks.value_counts()
        .rename_axis("k")
        .reset_index(name="n")
        .sort_values(["n", "k"], ascending=[False, True])
        .head(5)
    )
    assert out["k"].to_pylist() == want["k"].tolist()
    assert out["n"].to_pylist() == want["n"].tolist()


# ------------------------------------------------- rename / lookup join


def test_esql_rename_then_where(ray_session):
    got = run_esql(
        "FROM documents | RENAME n_chars AS size | WHERE size > 400 "
        "| KEEP doc_id, size | SORT doc_id",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id, n_chars AS size FROM documents WHERE n_chars > 400 "
        "ORDER BY doc_id"
    )
    _assert_tables_equal(got, want)


def test_esql_lookup_join_matches_duckdb(ray_session):
    got = run_esql(
        "FROM events | EVAL cents = ROUND(value * 100, 0) "
        "| RENAME user_id AS c_custkey | LOOKUP JOIN customer ON c_custkey "
        "| STATS n = COUNT(*), cents_sum = SUM(cents) BY c_mktsegment "
        "| SORT c_mktsegment",
        SF_DIR,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    want = con.execute(
        "SELECT c.c_mktsegment, count(*)::BIGINT n, "
        "sum(round(e.value * 100, 0)) cents_sum "
        "FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id "
        "GROUP BY 1 ORDER BY 1"
    ).arrow()
    _assert_tables_equal(got, want)


def test_esql_post_stats_commands(ray_session):
    # ES|QL: the aggregation result is a new table — WHERE/EVAL/RENAME
    # and further STATS compose after the first STATS
    got = run_esql(
        "FROM events | STATS n = COUNT(*) BY user_id, event_type "
        "| WHERE n > 100 | EVAL half = ROUND(n / 2, 6) "
        "| RENAME user_id AS u "
        "| STATS mx = MAX(half), c = COUNT(*) BY u | SORT u",
        SF_DIR,
    )
    want = _duck(
        "WITH a AS (SELECT user_id u, count(*)::BIGINT n FROM events "
        "GROUP BY user_id, event_type), "
        "b AS (SELECT u, round(n / 2, 6) half FROM a WHERE n > 100) "
        "SELECT u, max(half) mx, count(*)::BIGINT c FROM b "
        "GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # commands with source-table semantics still refuse to follow STATS
    with pytest.raises(ValueError, match="after STATS"):
        parse_esql(_normalize_assign(
            "FROM events | STATS n = COUNT(*) BY user_id | SAMPLE 0.5"
        ))
    # non-decomposable re-aggregation refused
    with pytest.raises(ValueError, match="post-STATS re-aggregation"):
        parse_esql(_normalize_assign(
            "FROM events | STATS n = COUNT(*) BY user_id "
            "| STATS m = MEDIAN(n)"
        ))


def test_esql_lookup_unknown_index(ray_session):
    with pytest.raises(ValueError, match="unknown lookup index"):
        run_esql(
            "FROM events | LOOKUP JOIN nope ON user_id "
            "| STATS n = COUNT(*)",
            SF_DIR,
        )


def test_esql_mv_expand_matches_duckdb(ray_session):
    got = run_esql(
        'FROM documents | EVAL w = SPLIT(text, " ") | MV_EXPAND w '
        "| STATS n = COUNT(*) BY w | SORT n DESC, w ASC | LIMIT 15",
        SF_DIR,
    )
    want = _duck(
        "SELECT w, count(*)::BIGINT n FROM "
        "(SELECT unnest(string_split(text, ' ')) w FROM documents) "
        "GROUP BY w ORDER BY n DESC, w LIMIT 15"
    )
    _assert_tables_equal(got, want)
    # MV_EXPAND of a scalar column is a loud (task-side) error
    with pytest.raises(Exception, match="multi-value"):
        run_esql(
            "FROM documents | MV_EXPAND lang | STATS n = COUNT(*) BY lang",
            SF_DIR,
        )


def test_esql_mv_expand_null_and_empty_keep_a_row(ray_session, tmp_path):
    """ES|QL MV_EXPAND keeps one row with a null value for null (and
    element-less) multi-values — it is not a flat_map drop."""
    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "w": pa.array(
                [["a", "b"], None, [], ["c"]], type=pa.list_(pa.string())
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "mv.parquet"))
    got = run_esql(
        "FROM mv | MV_EXPAND w | KEEP id, w | SORT id ASC, w ASC",
        str(tmp_path),
    )
    assert got.to_pydict() == {
        "id": [0, 0, 1, 2, 3],
        "w": ["a", "b", None, None, "c"],
    }


def test_esql_string_functions_match_duckdb(ray_session):
    got = run_esql(
        'FROM documents | EVAL k = CONCAT(TO_UPPER(SUBSTRING(lang, 1, 1)), "-", source) '
        '| WHERE text LIKE "*spark*" AND STARTS_WITH(source, "src") '
        "| STATS n = COUNT(*) BY k | SORT k",
        SF_DIR,
    )
    want = _duck(
        "SELECT upper(substring(lang, 1, 1)) || '-' || source k, "
        "count(*)::BIGINT n FROM documents "
        "WHERE text LIKE '%spark%' AND starts_with(source, 'src') "
        "GROUP BY k ORDER BY k"
    )
    _assert_tables_equal(got, want)


def test_esql_rlike_and_coalesce(ray_session):
    got = run_esql(
        'FROM documents | WHERE lang RLIKE "e." '
        "| EVAL l = COALESCE(lang, \"??\") "
        "| STATS n = COUNT(*) BY l | SORT l",
        SF_DIR,
    )
    want = _duck(
        "SELECT lang l, count(*)::BIGINT n FROM documents "
        "WHERE regexp_full_match(lang, 'e.') GROUP BY l ORDER BY l"
    )
    _assert_tables_equal(got, want)
    # ? in LIKE means exactly one char
    one = run_esql(
        'FROM documents | WHERE lang LIKE "e?" | STATS n = COUNT(*) BY lang | SORT lang',
        SF_DIR,
    )
    assert set(one["lang"].to_pylist()) <= {"en", "es"}
    with pytest.raises(Exception, match="string literal pattern"):
        run_esql(
            "FROM documents | WHERE lang LIKE source | STATS n = COUNT(*)",
            SF_DIR,
        )


# --------------------------------------------------------- _sql endpoint


def test_sql_translation_shapes():
    from bitcoin_ledger_2es_ray.pipelines.sql_api import sql_to_esql

    assert sql_to_esql(
        "SELECT a, COUNT(*) AS n FROM t WHERE x = 1 GROUP BY a ORDER BY a"
    ) == "FROM t | WHERE x == 1 | STATS n = COUNT(*) BY a | KEEP a, n | SORT a"
    assert sql_to_esql(
        "SELECT b AS c FROM t WHERE s LIKE 'a%_b' ORDER BY c DESC LIMIT 3;"
    ) == 'FROM t | WHERE s LIKE "a*?b" | RENAME b AS c | KEEP c | SORT c DESC | LIMIT 3'
    # SELECT * is a bare projection (no KEEP)
    assert sql_to_esql("SELECT * FROM t ORDER BY a") == "FROM t | SORT a"
    with pytest.raises(ValueError, match="must appear in"):
        sql_to_esql("SELECT a, COUNT(*) AS n FROM t GROUP BY b")
    with pytest.raises(ValueError, match="GROUP BY without aggregates"):
        sql_to_esql("SELECT a FROM t GROUP BY a")
    with pytest.raises(ValueError, match="unsupported construct"):
        sql_to_esql("SELECT a FROM t JOIN u")
    with pytest.raises(ValueError, match="AS alias"):
        sql_to_esql("SELECT COUNT(*) FROM t")


def test_sql_endpoint_matches_duckdb_literally(ray_session):
    """run_sql(s) == DuckDB executing the SAME SQL text s."""
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    cases = [
        "SELECT lang AS l, COUNT(*) AS n, SUM(n_chars) AS total "
        "FROM documents WHERE n_chars >= 100 GROUP BY lang ORDER BY l",
        "SELECT doc_id, n_chars FROM documents "
        "WHERE lang = 'en' AND n_chars > 400 ORDER BY doc_id LIMIT 10",
        "SELECT source, MAX(n_chars) AS mx FROM documents "
        "WHERE source LIKE 'src1%' GROUP BY source ORDER BY mx DESC, source LIMIT 5",
    ]
    for sql in cases:
        got = run_sql(sql, SF_DIR)
        want = _duck(sql)
        # integer-typed aggregate columns may differ in width only
        assert got.column_names == want.column_names
        for c in got.column_names:
            assert got[c].to_pylist() == want[c].to_pylist(), (sql, c)


def test_esql_row_literal_source(ray_session):
    got = run_esql('ROW a = 1, b = "x" | EVAL c = ROUND(a / 2, 6) | KEEP a, b, c', "/tmp")
    assert got.to_pydict() == {"a": [1], "b": ["x"], "c": [0.5]}
    with pytest.raises(ValueError, match="literals"):
        run_esql("ROW a = b | KEEP a", "/tmp")
    with pytest.raises(ValueError, match="starts with FROM, TS, ROW or SHOW"):
        run_esql("WHERE a == 1", "/tmp")


def test_esql_show_info(ray_session):
    got = run_esql("SHOW INFO", "/tmp")
    assert got.column_names == ["date", "hash", "version"]
    assert got.num_rows == 1
    assert got["version"].to_pylist() == ["0.1.0"]
    # composes with tail commands like any ROW source
    got = run_esql('SHOW INFO | EVAL v2 = CONCAT(version, "-es") | KEEP v2', "/tmp")
    assert got.to_pydict() == {"v2": ["0.1.0-es"]}
    with pytest.raises(ValueError, match="SHOW supports only INFO"):
        run_esql("SHOW FUNCTIONS", "/tmp")


def test_esql_enrich_matches_duckdb(ray_session):
    got = run_esql(
        "FROM customer | EVAL cents = ROUND(c_acctbal * 100, 0) "
        "| ENRICH nations ON c_nationkey "
        "| STATS n = COUNT(*), bal = SUM(cents) BY r_name | SORT r_name",
        SF_DIR,
    )
    con = duckdb.connect()
    for t in ("customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.execute(
        "SELECT r.r_name, count(*)::BIGINT n, sum(round(c.c_acctbal*100,0)) bal "
        "FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "LEFT JOIN region r ON r.r_regionkey = n.n_regionkey "
        "GROUP BY 1 ORDER BY 1"
    ).arrow()
    _assert_tables_equal(got, want)
    with pytest.raises(ValueError, match="unknown enrich policy"):
        parse_esql("FROM customer | ENRICH bogus ON c_nationkey")


def test_esql_count_distinct(ray_session):
    got = run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id) BY event_type "
        "| SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_type, count(DISTINCT user_id)::BIGINT u "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    glob = run_esql("FROM events | STATS u = COUNT_DISTINCT(user_id)", SF_DIR)
    wantg = _duck("SELECT count(DISTINCT user_id)::BIGINT u FROM events")
    _assert_tables_equal(glob, wantg)
    with pytest.raises(ValueError, match="cannot mix"):
        parse_esql(_normalize_assign(
            "FROM events | STATS u = COUNT_DISTINCT(user_id), n = COUNT(*)"
        ))
    # two COUNT_DISTINCTs over non-1:1 columns: each must count ITS column's
    # distinct values per group, not the distinct (u, s) tuples
    got2 = run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id), "
        "s = COUNT_DISTINCT(props) BY event_type | SORT event_type",
        SF_DIR,
    )
    want2 = _duck(
        "SELECT event_type, count(DISTINCT user_id)::BIGINT u, "
        "count(DISTINCT props)::BIGINT s "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got2, want2)
    glob2 = run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id), "
        "s = COUNT_DISTINCT(props)",
        SF_DIR,
    )
    wantg2 = _duck(
        "SELECT count(DISTINCT user_id)::BIGINT u, "
        "count(DISTINCT props)::BIGINT s FROM events"
    )
    _assert_tables_equal(glob2, wantg2)


def test_esql_median(ray_session):
    got = run_esql(
        "FROM events | EVAL cents = ROUND(value * 100, 0) "
        "| STATS m = MEDIAN(cents) BY event_type | SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_type, round(median(round(value * 100, 0)), 6) m "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    glob = run_esql(
        "FROM events | EVAL cents = ROUND(value * 100, 0) "
        "| STATS m = MEDIAN(cents)",
        SF_DIR,
    )
    wantg = _duck(
        "SELECT round(median(round(value * 100, 0)), 6) m FROM events"
    )
    _assert_tables_equal(glob, wantg)
    with pytest.raises(ValueError, match="only aggregate"):
        parse_esql(_normalize_assign(
            "FROM events | STATS m = MEDIAN(value), n = COUNT(*)"
        ))


def test_esql_in_and_case(ray_session):
    got = run_esql(
        'FROM documents | WHERE lang IN ("en", "fr", "es") '
        '| EVAL size = CASE(n_chars > 400, "big", n_chars > 200, "mid", "small") '
        "| STATS n = COUNT(*) BY size | SORT size",
        SF_DIR,
    )
    want = _duck(
        "SELECT CASE WHEN n_chars > 400 THEN 'big' "
        "WHEN n_chars > 200 THEN 'mid' ELSE 'small' END size, "
        "count(*)::BIGINT n FROM documents "
        "WHERE lang IN ('en','fr','es') GROUP BY size ORDER BY size"
    )
    _assert_tables_equal(got, want)
    with pytest.raises(ValueError, match="IN list items must be literals"):
        parse_esql("FROM documents | WHERE lang IN (source) | SORT doc_id")
    with pytest.raises(Exception, match="at least"):
        run_esql("FROM documents | EVAL x = CASE(lang) | KEEP x", SF_DIR)


def test_esql_median_empty_match(ray_session):
    got = run_esql(
        'FROM documents | WHERE lang == "klingon" '
        "| STATS m = MEDIAN(n_chars) BY lang",
        SF_DIR,
    )
    assert got.num_rows == 0 and got.column_names == ["lang", "m"]


def test_esql_math_functions(ray_session):
    got = run_esql(
        "FROM events | EVAL c = CEIL(value), f = FLOOR(value), "
        "s = ROUND(SQRT(value), 6), p = ROUND(POW(value, 2), 6), "
        "sg = SIGNUM(value - 10.0) "
        "| KEEP event_id, c, f, s, p, sg | SORT event_id | LIMIT 80",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, ceil(value) c, floor(value) f, "
        "round(sqrt(value),6) s, round(pow(value,2),6) p, "
        "sign(value - 10.0)::DOUBLE sg "
        "FROM events ORDER BY 1 LIMIT 80"
    )
    _assert_tables_equal(got, want)


def test_esql_string_functions(ray_session):
    got = run_esql(
        'FROM documents | EVAL t = TRIM(source), lt = LTRIM(source), '
        'rt = RTRIM(source), l2 = LEFT(lang, 2), r1 = RIGHT(source, 1), '
        'rev = REVERSE(lang), ew = ENDS_WITH(source, "1"), '
        'loc = LOCATE(source, "rc"), miss = LOCATE(source, "zzz"), '
        'rep = REPLACE(lang, "[aeiou]", ".") '
        "| KEEP doc_id, t, lt, rt, l2, r1, rev, ew, loc, miss, rep "
        "| SORT doc_id | LIMIT 80",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id, trim(source) t, ltrim(source) lt, rtrim(source) rt, "
        "left(lang,2) l2, right(source,1) r1, reverse(lang) rev, "
        "source LIKE '%1' ew, strpos(source,'rc') loc, strpos(source,'zzz') miss, "
        "regexp_replace(lang, '[aeiou]', '.', 'g') rep "
        "FROM documents ORDER BY 1 LIMIT 80"
    )
    _assert_tables_equal(got, want)
    with pytest.raises(Exception, match="REPLACE"):
        run_esql("FROM documents | EVAL x = REPLACE(lang, lang, lang) | KEEP x", SF_DIR)


def test_esql_mv_functions_and_nulls(ray_session, tmp_path):
    got = run_esql(
        'FROM documents | EVAL w = SPLIT(text, " "), n = MV_COUNT(w), '
        "f = MV_FIRST(w), la = MV_LAST(w), mn = MV_MIN(w), mx = MV_MAX(w) "
        "| KEEP doc_id, n, f, la, mn, mx | SORT doc_id | LIMIT 80",
        SF_DIR,
    )
    want = _duck(
        "WITH w AS (SELECT doc_id, str_split(text,' ') l FROM documents) "
        "SELECT doc_id, len(l)::BIGINT n, l[1] f, l[-1] la, "
        "list_min(l) mn, list_max(l) mx FROM w ORDER BY 1 LIMIT 80"
    )
    _assert_tables_equal(got, want)
    # null lists → null scalars (direct kernel check)
    from bitcoin_ledger_2es_ray.pipelines.esql import _mv_reduce

    col = pa.array([["b", "a", "c"], None, [], ["x"]], type=pa.list_(pa.string()))
    assert _mv_reduce(col, "min").to_pylist() == ["a", None, None, "x"]
    assert _mv_reduce(col, "max").to_pylist() == ["c", None, None, "x"]
    assert _mv_reduce(col, "first").to_pylist() == ["b", None, None, "x"]
    assert _mv_reduce(col, "last").to_pylist() == ["c", None, None, "x"]
    with pytest.raises(Exception, match="multi-value"):
        run_esql("FROM documents | EVAL x = MV_MIN(lang) | KEEP x", SF_DIR)


def test_esql_date_functions(ray_session):
    got = run_esql(
        'FROM events | EVAL day = TO_LONG(DATE_TRUNC(1 day, ts)), '
        'h12 = TO_LONG(DATE_TRUNC(12 hours, ts)), '
        'yr = DATE_EXTRACT("year", ts), mo = DATE_EXTRACT("month_of_year", ts), '
        'dow = DATE_EXTRACT("day_of_week", ts), hr = DATE_EXTRACT("hour_of_day", ts), '
        'dstr = DATE_FORMAT("%Y-%m-%dT%H", ts) '
        "| KEEP event_id, day, h12, yr, mo, dow, hr, dstr | SORT event_id | LIMIT 80",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, (epoch_us(date_trunc('day', ts))//1000)::BIGINT AS day, "
        "(((epoch_us(ts)//1000000)//43200)*43200*1000)::BIGINT h12, "
        "year(ts)::BIGINT yr, month(ts)::BIGINT mo, isodow(ts)::BIGINT dow, "
        "hour(ts)::BIGINT hr, strftime(ts, '%Y-%m-%dT%H') dstr "
        "FROM events ORDER BY 1 LIMIT 80"
    )
    _assert_tables_equal(got, want)
    # calendar units parse to CalendarPeriod (calendar-aware truncation —
    # see test_esql_calendar_trunc_units for the value semantics)
    parse_esql(_normalize_assign(
        "FROM events | EVAL m = DATE_TRUNC(1 month, ts) | KEEP m"
    ))
    with pytest.raises(Exception, match="DATE_EXTRACT part"):
        run_esql('FROM events | EVAL x = DATE_EXTRACT("nano", ts) | KEEP x', SF_DIR)
    with pytest.raises(Exception, match="temporal literal"):
        run_esql("FROM events | EVAL x = DATE_TRUNC(86400, ts) | KEEP x", SF_DIR)


def test_esql_bucket_and_conversions(ray_session):
    got = run_esql(
        "FROM events | EVAL b = BUCKET(value, 2.5), "
        "i = TO_INTEGER(value), d = TO_DOUBLE(user_id), s = TO_STRING(user_id), "
        "ms = TO_LONG(ts) "
        "| KEEP event_id, b, i, d, s, ms | SORT event_id | LIMIT 80",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, floor(value/2.5)*2.5 b, trunc(value)::BIGINT i, "
        "user_id::DOUBLE d, user_id::VARCHAR s, (epoch_us(ts)//1000)::BIGINT ms "
        "FROM events ORDER BY 1 LIMIT 80"
    )
    _assert_tables_equal(got, want)
    # temporal-literal span form groups like DATE_TRUNC
    a = run_esql(
        "FROM events | EVAL w = TO_LONG(BUCKET(ts, 1 week)) "
        "| STATS n = COUNT(*) BY w | SORT w",
        SF_DIR,
    )
    b = run_esql(
        "FROM events | EVAL w = TO_LONG(DATE_TRUNC(1 week, ts)) "
        "| STATS n = COUNT(*) BY w | SORT w",
        SF_DIR,
    )
    assert a.equals(b)


def test_esql_stats_per_agg_where(ray_session):
    got = run_esql(
        'FROM events | STATS n_click = COUNT(*) WHERE event_type == "click", '
        "s_big = SUM(value) WHERE value > 10.0, "
        "mx_small = MAX(value) WHERE value <= 10.0, "
        "a_click = AVG(value) WHERE event_type == \"click\" "
        "BY user_id | SORT user_id | LIMIT 60",
        SF_DIR,
    )
    want = _duck(
        "SELECT user_id, count(*) FILTER (event_type = 'click')::BIGINT n_click, "
        "sum(value) FILTER (value > 10.0) s_big, "
        "max(value) FILTER (value <= 10.0) mx_small, "
        "round(avg(value) FILTER (event_type = 'click'), 6) a_click "
        "FROM events GROUP BY 1 ORDER BY 1 LIMIT 60"
    )
    _assert_tables_equal(got, want)
    # a fully-filtered group: COUNT 0, SUM/AVG/MIN/MAX NULL (SQL FILTER)
    z = run_esql(
        "FROM events | STATS n = COUNT(*) WHERE value > 1000000.0, "
        "s = SUM(value) WHERE value > 1000000.0, "
        "a = AVG(value) WHERE value > 1000000.0 BY event_type | SORT event_type",
        SF_DIR,
    )
    assert z["n"].to_pylist() == [0] * z.num_rows and z.num_rows > 0
    assert z["s"].null_count == z.num_rows and z["a"].null_count == z.num_rows
    # filters are refused on the non-maskable partial streams
    with pytest.raises(ValueError, match="per-aggregate WHERE"):
        parse_esql(_normalize_assign(
            "FROM events | STATS c = COUNT_DISTINCT(user_id) WHERE value > 1.0"
        ))
    with pytest.raises(ValueError, match="per-aggregate WHERE"):
        parse_esql(_normalize_assign(
            "FROM events | STATS m = MEDIAN(value) WHERE value > 1.0"
        ))


def test_esql_inlinestats(ray_session):
    # grouped join-back + downstream WHERE against the group statistic
    got = run_esql(
        "FROM events | INLINESTATS a = AVG(value) BY event_type "
        "| WHERE value > a | STATS n = COUNT(*) BY event_type | SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "WITH t AS (SELECT event_type, value, "
        "round(avg(value) OVER (PARTITION BY event_type), 6) a FROM events) "
        "SELECT event_type, count(*)::BIGINT n FROM t WHERE value > a "
        "GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # global (no BY) inline stats become constant columns
    g2 = run_esql(
        "FROM events | INLINESTATS m = MAX(value) "
        "| EVAL frac = ROUND(value / m, 6) "
        "| KEEP event_id, frac | SORT event_id | LIMIT 30",
        SF_DIR,
    )
    w2 = _duck(
        "WITH t AS (SELECT event_id, value, max(value) OVER () m FROM events) "
        "SELECT event_id, round(value / m, 6) frac FROM t ORDER BY 1 LIMIT 30"
    )
    _assert_tables_equal(g2, w2)
    # two INLINESTATS in one pipe: the second sees the first's columns
    g3 = run_esql(
        "FROM events | INLINESTATS s = SUM(value) BY user_id "
        "| EVAL keyed = ROUND(s, 0) | INLINESTATS c = COUNT(*) BY keyed "
        "| STATS mx = MAX(c) | LIMIT 1",
        SF_DIR,
    )
    w3 = _duck(
        "WITH t AS (SELECT round(sum(value) OVER (PARTITION BY user_id), 0) keyed "
        "FROM events), u AS (SELECT count(*) OVER (PARTITION BY keyed) c FROM t) "
        "SELECT max(c)::BIGINT mx FROM u"
    )
    _assert_tables_equal(g3, w3)
    # non-decomposable aggregates are refused
    with pytest.raises(ValueError, match="INLINESTATS does not support"):
        parse_esql(_normalize_assign(
            "FROM events | INLINESTATS m = MEDIAN(value) BY user_id"
        ))
    # INLINESTATS after STATS is refused like the other row commands
    with pytest.raises(ValueError, match="after STATS"):
        parse_esql(_normalize_assign(
            "FROM events | STATS n = COUNT(*) BY user_id "
            "| INLINESTATS m = MAX(n)"
        ))


def test_esql_std_dev_and_weighted_avg(ray_session):
    got = run_esql(
        "FROM events | STATS sd = STD_DEV(value), a = AVG(value) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_type, round(stddev_pop(value), 6) sd, "
        "round(avg(value), 6) a FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # per-aggregate WHERE composes (STD_DEV is decomposable)
    g2 = run_esql(
        "FROM events | STATS sd = STD_DEV(value) WHERE value > 50.0 "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT event_type, round(stddev_pop(value) "
        "FILTER (value > 50.0), 6) sd FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g2, w2)
    g3 = run_esql(
        "FROM events | STATS w = WEIGHTED_AVG(value, user_id) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    w3 = _duck(
        "SELECT event_type, round(sum(value * user_id) / sum(user_id), 6) w "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g3, w3)
    # INLINESTATS accepts every decomposable aggregate
    g4 = run_esql(
        "FROM events | INLINESTATS sd = STD_DEV(value) BY event_type "
        "| WHERE value > 2 * sd | STATS n = COUNT(*) BY event_type "
        "| SORT event_type",
        SF_DIR,
    )
    w4 = _duck(
        "WITH t AS (SELECT event_type, value, round(stddev_pop(value) "
        "OVER (PARTITION BY event_type), 6) sd FROM events) "
        "SELECT event_type, count(*)::BIGINT n FROM t WHERE value > 2 * sd "
        "GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g4, w4)


def test_esql_percentile_and_mad(ray_session):
    got = run_esql(
        "FROM events | STATS p = PERCENTILE(value, 90) BY event_type "
        "| SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_type, round(quantile_cont(value, 0.9), 6) p "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    g2 = run_esql(
        "FROM events | STATS m = MEDIAN_ABSOLUTE_DEVIATION(value) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT event_type, round(mad(value), 6) m FROM events "
        "GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g2, w2)
    # global (no BY)
    g3 = run_esql("FROM events | STATS p = PERCENTILE(value, 25)", SF_DIR)
    w3 = _duck("SELECT round(quantile_cont(value, 0.25), 6) p FROM events")
    _assert_tables_equal(g3, w3)


def test_esql_values_and_top(ray_session):
    got = run_esql(
        "FROM events | STATS v = VALUES(event_type) BY user_id "
        "| SORT user_id | LIMIT 20",
        SF_DIR,
    )
    want = _duck(
        "SELECT user_id, list(DISTINCT event_type ORDER BY event_type) v "
        "FROM events GROUP BY 1 ORDER BY 1 LIMIT 20"
    )
    _assert_tables_equal(got, want)
    g2 = run_esql(
        'FROM events | STATS t = TOP(value, 3, "desc") BY event_type '
        "| SORT event_type",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT event_type, (list(value ORDER BY value DESC))[1:3] t "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g2, w2)
    g3 = run_esql('FROM events | STATS t = TOP(user_id, 2, "asc")', SF_DIR)
    w3 = _duck("SELECT (list(user_id ORDER BY user_id ASC))[1:2] t FROM events")
    _assert_tables_equal(g3, w3)
    # mixed distinct-family STATS: VALUES + COUNT_DISTINCT share the partial
    g4 = run_esql(
        "FROM events | STATS v = VALUES(event_type), "
        "c = COUNT_DISTINCT(event_type) BY user_id | SORT user_id | LIMIT 10",
        SF_DIR,
    )
    w4 = _duck(
        "SELECT user_id, list(DISTINCT event_type ORDER BY event_type) v, "
        "count(DISTINCT event_type)::BIGINT c "
        "FROM events GROUP BY 1 ORDER BY 1 LIMIT 10"
    )
    _assert_tables_equal(g4, w4)


def test_esql_new_agg_rejections():
    with pytest.raises(ValueError, match="only aggregate"):
        parse_esql(_normalize_assign(
            "FROM events | STATS p = PERCENTILE(value, 50), n = COUNT(*)"
        ))
    with pytest.raises(ValueError, match="weight column"):
        parse_esql(_normalize_assign(
            "FROM events | STATS w = WEIGHTED_AVG(value)"
        ))
    with pytest.raises(ValueError, match="TOP"):
        parse_esql(_normalize_assign(
            'FROM events | STATS t = TOP(value, 0, "desc")'
        ))
    with pytest.raises(ValueError, match="TOP"):
        parse_esql(_normalize_assign(
            'FROM events | STATS t = TOP(value, 3, "sideways")'
        ))
    with pytest.raises(ValueError, match="per-aggregate WHERE"):
        parse_esql(_normalize_assign(
            'FROM events | STATS t = TOP(value, 3, "desc") WHERE value > 1'
        ))
    with pytest.raises(ValueError, match="in \\[0, 100\\]"):
        parse_esql(_normalize_assign(
            "FROM events | STATS p = PERCENTILE(value, 101)"
        ))
    with pytest.raises(ValueError, match="INLINESTATS does not support"):
        parse_esql(_normalize_assign(
            "FROM events | INLINESTATS p = PERCENTILE(value, 50) BY user_id"
        ))


def test_esql_sample_deterministic(ray_session):
    # sha256-keyed deterministic sample == the same predicate in SQL
    got = run_esql(
        "FROM events | SAMPLE 0.25 "
        "| STATS n = COUNT(*) BY event_type | SORT event_type",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_type, count(*)::BIGINT n FROM events "
        "WHERE substr(sha256(CAST(event_id AS VARCHAR)), 1, 4) < '4000' "
        "GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # composes with WHERE either side; key stays the table id column
    g2 = run_esql(
        "FROM events | WHERE value > 10.0 | SAMPLE 0.5 "
        "| STATS n = COUNT(*)",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT count(*)::BIGINT n FROM events WHERE value > 10.0 "
        "AND substr(sha256(CAST(event_id AS VARCHAR)), 1, 4) < '8000'"
    )
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="probability"):
        parse_esql("FROM events | SAMPLE 1.5")
    with pytest.raises(ValueError, match="after STATS"):
        parse_esql(_normalize_assign(
            "FROM events | STATS n = COUNT(*) BY user_id | SAMPLE 0.5"
        ))


def test_esql_fork(ray_session):
    got = run_esql(
        'FROM events | WHERE value > 50.0 | FORK '
        '(WHERE event_type == "click" | STATS n = COUNT(*) BY user_id) '
        "(STATS a = AVG(user_id) BY event_type)",
        SF_DIR,
    )
    want = _duck(
        "WITH f1 AS (SELECT user_id, count(*)::BIGINT n FROM events "
        "  WHERE value > 50.0 AND event_type = 'click' GROUP BY 1), "
        "f2 AS (SELECT event_type, round(avg(user_id), 6) a FROM events "
        "  WHERE value > 50.0 GROUP BY 1) "
        "SELECT user_id, n, 'fork1' AS _fork, NULL::VARCHAR AS event_type, "
        "NULL::DOUBLE AS a FROM f1 "
        "UNION ALL SELECT NULL, NULL, 'fork2', event_type, a FROM f2 "
        "ORDER BY _fork, user_id NULLS LAST, n NULLS LAST, "
        "event_type NULLS LAST, a NULLS LAST"
    )
    _assert_tables_equal(got, want)
    # row-command branches (no STATS) union row streams
    g2 = run_esql(
        "FROM events | FORK "
        "(WHERE value > 320.0 | KEEP event_id | SORT event_id) "
        "(WHERE value < 0.4 | KEEP event_id | SORT event_id)",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT event_id, 'fork1' AS _fork FROM events WHERE value > 320.0 "
        "UNION ALL SELECT event_id, 'fork2' FROM events WHERE value < 0.4 "
        "ORDER BY 2, 1"
    )
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="at least two"):
        run_esql("FROM events | FORK (WHERE value > 1.0)", SF_DIR)
    with pytest.raises(ValueError, match="parenthesized"):
        run_esql(
            "FROM events | FORK (WHERE value > 1.0) (WHERE value < 1.0) "
            "| LIMIT 5",
            SF_DIR,
        )
    # parse_esql never sees FORK pipes
    with pytest.raises(ValueError, match="pipe level"):
        parse_esql("FROM events | FORK")


def test_esql_change_point(ray_session):
    got = run_esql(
        "FROM events | STATS v = COUNT(*) BY user_id "
        "| CHANGE_POINT v ON user_id",
        SF_DIR,
    )
    want = _duck(
        "WITH series AS (SELECT user_id k, count(*)::BIGINT v FROM events "
        "GROUP BY 1), "
        "s AS (SELECT k, v, row_number() OVER (ORDER BY k) rn, "
        "  sum(v) OVER (ORDER BY k) s1, sum(v*v) OVER (ORDER BY k) q1, "
        "  count(*) OVER () n, sum(v) OVER () st, sum(v*v) OVER () qt "
        "  FROM series), "
        "sse AS (SELECT rn, (q1 - s1*s1/rn) + ((qt - q1) - "
        "  (st - s1)*(st - s1)/(n - rn)) sse, qt - st*st/n total "
        "  FROM s WHERE rn < (SELECT max(rn) FROM s)), "
        "best AS (SELECT rn, sse, total FROM sse "
        "  ORDER BY round(sse, 9), rn LIMIT 1) "
        "SELECT s.k AS user_id, s.v AS v, "
        "CASE WHEN s.rn = best.rn + 1 THEN 'step_change' END AS type, "
        "CASE WHEN s.rn = best.rn + 1 THEN round(best.sse / best.total, 6) "
        "END AS pvalue FROM s, best ORDER BY s.k"
    )
    _assert_tables_equal(got, want)
    assert sum(1 for t in got["type"].to_pylist() if t == "step_change") == 1
    # AS renames the marker columns
    g2 = run_esql(
        "FROM events | STATS v = COUNT(*) BY user_id "
        "| CHANGE_POINT v ON user_id AS cp_kind, cp_score",
        SF_DIR,
    )
    assert {"cp_kind", "cp_score"} <= set(g2.column_names)
    with pytest.raises(ValueError, match="last command"):
        parse_esql(_normalize_assign(
            "FROM events | CHANGE_POINT value ON event_id | LIMIT 5"
        ))


def test_esql_completion_and_rerank(ray_session):
    # COMPLETION: deterministic fake endpoint over an evaluated prompt
    got = run_esql(
        "FROM documents | COMPLETION summary = LEFT(text, 25) WITH test_echo "
        "| KEEP doc_id, summary | SORT doc_id | LIMIT 40",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id, '[test_echo] ' || lower(left(text, 25)) AS summary "
        "FROM documents ORDER BY 1 LIMIT 40"
    )
    _assert_tables_equal(got, want)
    # default output column is ES's ``completion``
    g2 = run_esql(
        "FROM documents | COMPLETION LEFT(text, 5) WITH test_echo "
        "| KEEP doc_id, completion | SORT doc_id | LIMIT 3",
        SF_DIR,
    )
    assert g2.column_names == ["doc_id", "completion"]
    # RERANK: deterministic token-overlap scorer == DuckDB list_intersect
    g3 = run_esql(
        'FROM documents | RERANK "data pipeline query engine" ON text '
        "WITH test_reranker | KEEP doc_id, _score "
        "| SORT _score DESC, doc_id ASC | LIMIT 25",
        SF_DIR,
    )
    w3 = _duck(
        "SELECT doc_id, round(len(list_intersect(string_split(text, ' '), "
        "string_split('data pipeline query engine', ' '))) / 4.0, 6) "
        "AS _score FROM documents ORDER BY 2 DESC, 1 LIMIT 25"
    )
    _assert_tables_equal(g3, w3)
    with pytest.raises(ValueError, match="unknown completion endpoint"):
        parse_esql(_normalize_assign(
            "FROM documents | COMPLETION LEFT(text, 5) WITH gpt_real"
        ))
    with pytest.raises(ValueError, match="unknown rerank endpoint"):
        parse_esql(_normalize_assign(
            'FROM documents | RERANK "q" ON text WITH test_echo'
        ))
    with pytest.raises(ValueError, match="after STATS"):
        parse_esql(_normalize_assign(
            "FROM documents | STATS n = COUNT(*) BY lang "
            "| COMPLETION LEFT(lang, 2) WITH test_echo"
        ))


def test_esql_fork_rrf(ray_session):
    got = run_esql(
        'FROM documents | FORK '
        '(RERANK "data pipeline query engine" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20) "
        '(RERANK "fast sort hash" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20) "
        "| RRF",
        SF_DIR,
    )
    want = _duck(
        "WITH b1 AS (SELECT doc_id, round(len(list_intersect("
        "  string_split(text, ' '), "
        "  string_split('data pipeline query engine', ' '))) / 4.0, 6) "
        "  AS s FROM documents ORDER BY s DESC, doc_id LIMIT 20), "
        "r1 AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) "
        "  rn FROM b1), "
        "b2 AS (SELECT doc_id, round(len(list_intersect("
        "  string_split(text, ' '), string_split('fast sort hash', ' '))) "
        "  / 3.0, 6) AS s FROM documents ORDER BY s DESC, doc_id LIMIT 20), "
        "r2 AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) "
        "  rn FROM b2), "
        "u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2) "
        "SELECT doc_id, round(sum(1.0/(60+rn)), 6) AS _score FROM u "
        "GROUP BY 1 ORDER BY _score DESC, doc_id"
    )
    _assert_tables_equal(got, want)
    # RRF needs _score in every branch
    with pytest.raises(ValueError, match="RRF needs"):
        run_esql(
            "FROM documents | FORK "
            "(WHERE n_chars > 100 | KEEP doc_id | SORT doc_id | LIMIT 5) "
            "(WHERE n_chars > 200 | KEEP doc_id | SORT doc_id | LIMIT 5) "
            "| RRF",
            SF_DIR,
        )
    # only RRF may trail the branches
    with pytest.raises(ValueError, match="only '\\| RRF'"):
        run_esql(
            "FROM documents | FORK (WHERE n_chars > 100) "
            "(WHERE n_chars > 200) | LIMIT 3",
            SF_DIR,
        )
    with pytest.raises(ValueError, match="not valid mid-pipe"):
        parse_esql("FROM documents | RRF")


def test_esql_count_distinct_precision_hint(ray_session):
    # ES's precision_threshold is parse-accepted; the exact engine's
    # answer is identical with or without it
    a = run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id, 3000) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    b = run_esql(
        "FROM events | STATS u = COUNT_DISTINCT(user_id) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    _assert_tables_equal(a, b)
    with pytest.raises(ValueError, match="precision"):
        parse_esql(_normalize_assign(
            'FROM events | STATS u = COUNT_DISTINCT(user_id, "hi")'
        ))


def test_esql_match_and_qstr(ray_session):
    # MATCH: OR of analyzed query terms (plain-word corpus == string_split)
    got = run_esql(
        'FROM documents | WHERE MATCH(text, "join vector") '
        "| STATS n = COUNT(*) BY lang | SORT lang",
        SF_DIR,
    )
    want = _duck(
        "SELECT lang, count(*)::BIGINT n FROM documents "
        "WHERE list_has_any(string_split(text, ' '), "
        "['join', 'vector']) GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # QSTR: boolean tree with AND NOT and parens
    g2 = run_esql(
        "FROM documents | WHERE "
        'QSTR(text, "fast AND (sort OR hash) AND NOT group") '
        "| STATS n = COUNT(*)",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT count(*)::BIGINT n FROM documents WHERE "
        "list_contains(string_split(text,' '), 'fast') AND "
        "(list_contains(string_split(text,' '), 'sort') OR "
        " list_contains(string_split(text,' '), 'hash')) AND NOT "
        "list_contains(string_split(text,' '), 'group')"
    )
    _assert_tables_equal(g2, w2)
    # sequence default operator is Lucene's OR: 'a NOT b' == a OR (NOT b)
    g2b = run_esql(
        'FROM documents | WHERE QSTR(text, "fast NOT group") '
        "| STATS n = COUNT(*)",
        SF_DIR,
    )
    w2b = _duck(
        "SELECT count(*)::BIGINT n FROM documents WHERE "
        "list_contains(string_split(text,' '), 'fast') OR NOT "
        "list_contains(string_split(text,' '), 'group')"
    )
    _assert_tables_equal(g2b, w2b)
    # wildcard leaf
    g3 = run_esql(
        'FROM documents | WHERE QSTR(text, "gro*") | STATS n = COUNT(*)',
        SF_DIR,
    )
    w3 = _duck(
        "SELECT count(*)::BIGINT n FROM documents WHERE EXISTS ("
        "SELECT 1 FROM unnest(string_split(text,' ')) t(x) "
        "WHERE x LIKE 'gro%')"
    )
    _assert_tables_equal(g3, w3)
    # exact phrase via adjacent positions == padded-LIKE on the raw text
    g4 = run_esql(
        r'FROM documents | WHERE QSTR(text, "\"data join\"") '
        "| STATS n = COUNT(*)",
        SF_DIR,
    )
    w4 = _duck(
        "SELECT count(*)::BIGINT n FROM documents "
        "WHERE (' ' || text || ' ') LIKE '% data join %'"
    )
    assert w4["n"].to_pylist()[0] > 0  # the bigram exists in the corpus
    _assert_tables_equal(g4, w4)
    # index-backed leaves are refused with a pointer
    with pytest.raises(ValueError, match="index-backed"):
        run_esql(
            'FROM documents | WHERE QSTR(text, "fast~1") | STATS n = COUNT(*)',
            SF_DIR,
        )


def test_esql_ts_rate(ray_session):
    got = run_esql(
        "TS events | STATS r = RATE(value) BY user_id | SORT user_id",
        SF_DIR,
    )
    want = _duck(
        "SELECT user_id, round((arg_max(value, ts) - arg_min(value, ts)) / "
        "((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0), 6) AS r "
        "FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # global rate + a row-command head works through the TS source too
    g2 = run_esql(
        'TS events | WHERE event_type == "click" | STATS r = RATE(value)',
        SF_DIR,
    )
    w2 = _duck(
        "SELECT round((arg_max(value, ts) - arg_min(value, ts)) / "
        "((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0), 6) AS r "
        "FROM events WHERE event_type = 'click'"
    )
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="requires the TS"):
        parse_esql(_normalize_assign(
            "FROM events | STATS r = RATE(value) BY user_id"
        ))
    with pytest.raises(ValueError, match="only aggregate"):
        parse_esql(_normalize_assign(
            "TS events | STATS r = RATE(value), n = COUNT(*) BY user_id"
        ))


def test_esql_keep_drop_wildcards(ray_session):
    got = run_esql(
        "FROM lineitem | KEEP l_quantity, l_ship*, l_return* "
        "| SORT l_quantity, l_shipdate, l_returnflag | LIMIT 5",
        SF_DIR,
    )
    assert got.column_names == ["l_quantity", "l_shipdate", "l_returnflag"]
    g2 = run_esql(
        "FROM events | DROP props, ts | STATS n = COUNT(*)", SF_DIR
    )
    assert g2["n"].to_pylist()[0] > 0
    g3 = run_esql(
        'FROM events | WHERE event_type == "error" | DROP p*, ts '
        "| SORT event_id | LIMIT 3",
        SF_DIR,
    )
    assert "props" not in g3.column_names and "ts" not in g3.column_names
    with pytest.raises(ValueError, match="matches no columns"):
        run_esql(
            "FROM events | KEEP zz_* | SORT event_id | LIMIT 1", SF_DIR
        )


def test_sql_having(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql, sql_to_esql

    assert (
        sql_to_esql(
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
            "HAVING n > 600 ORDER BY user_id"
        )
        == "FROM events | STATS n = COUNT(*) BY user_id | WHERE n > 600 "
        "| KEEP user_id, n | SORT user_id"
    )
    got = run_sql(
        "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
        "HAVING n > 600 ORDER BY user_id",
        SF_DIR,
    )
    want = _duck(
        "SELECT user_id, count(*)::BIGINT n FROM events GROUP BY 1 "
        "HAVING n > 600 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    with pytest.raises(ValueError, match="HAVING needs aggregate"):
        sql_to_esql("SELECT a FROM t HAVING a > 1")


def test_esql_stats_by_distinct(ray_session):
    got = run_esql(
        "FROM lineitem | STATS BY l_returnflag, l_linestatus "
        "| SORT l_returnflag, l_linestatus",
        SF_DIR,
    )
    want = _duck(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM "
        f"'{'/root/testdata/sf0.001'}/lineitem.parquet' ORDER BY 1, 2"
    )
    _assert_tables_equal(got, want)
    # post-STATS agg-less re-aggregation: distinct of the result keys
    g2 = run_esql(
        "FROM events | STATS n = COUNT(*) BY user_id, event_type "
        "| STATS BY event_type | SORT event_type",
        SF_DIR,
    )
    w2 = _duck("SELECT DISTINCT event_type FROM events ORDER BY 1")
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="at least one aggregate"):
        parse_esql(_normalize_assign(
            "FROM events | INLINESTATS BY user_id"
        ))


def test_sql_distinct_and_star(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql, sql_to_esql

    assert (
        sql_to_esql("SELECT DISTINCT lang FROM documents ORDER BY lang")
        == "FROM documents | STATS BY lang | KEEP lang | SORT lang"
    )
    got = run_sql("SELECT DISTINCT lang FROM documents ORDER BY lang", SF_DIR)
    want = _duck("SELECT DISTINCT lang FROM documents ORDER BY 1")
    _assert_tables_equal(got, want)
    g2 = run_sql(
        "SELECT * FROM events WHERE value > 320 ORDER BY event_id LIMIT 5",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT * FROM events WHERE value > 320 ORDER BY event_id LIMIT 5"
    )
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="DISTINCT composes"):
        sql_to_esql("SELECT DISTINCT a, COUNT(*) AS n FROM t GROUP BY a")


def test_esql_is_null(ray_session):
    # the source tables are fully non-null: derive nulls with MV_FIRST
    # over an empty split, then test both predicates
    got = run_esql(
        'FROM documents | EVAL tag = MV_FIRST(SPLIT(text, "zzz_nowhere")) '
        "| WHERE tag IS NOT NULL | STATS n = COUNT(*)",
        SF_DIR,
    )
    assert got["n"].to_pylist() == [_duck(
        "SELECT count(*)::BIGINT n FROM documents"
    )["n"].to_pylist()[0]]  # split never matches -> whole text, non-null
    g2 = run_esql(
        "FROM lineitem | STATS n = COUNT(*) BY l_returnflag "
        "| WHERE l_returnflag IS NULL | SORT l_returnflag",
        SF_DIR,
    )
    assert g2.num_rows == 0  # no null groups in the source
    # post-STATS WHERE ... IS NOT NULL keeps everything
    g3 = run_esql(
        "FROM lineitem | STATS n = COUNT(*) BY l_returnflag "
        "| WHERE n IS NOT NULL | SORT l_returnflag",
        SF_DIR,
    )
    w3 = _duck(
        f"SELECT l_returnflag, count(*)::BIGINT n FROM "
        f"'{SF_DIR}/lineitem.parquet' GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g3, w3)


def test_esql_date_diff_and_categorize(ray_session):
    # DATE_DIFF over two real columns: ts vs the table max (via INLINESTATS)
    g1 = run_esql(
        "FROM events | INLINESTATS m = MAX(ts) "
        '| EVAL d = DATE_DIFF("hour", ts, m) '
        "| STATS mx = MAX(d), mn = MIN(d)",
        SF_DIR,
    )
    w1 = _duck(
        "WITH t AS (SELECT ts, max(ts) OVER () m FROM events) "
        "SELECT max(CAST(trunc((epoch_us(m) - epoch_us(ts)) / 3600000000.0) "
        "AS BIGINT)) mx, min(CAST(trunc((epoch_us(m) - epoch_us(ts)) "
        "/ 3600000000.0) AS BIGINT)) mn FROM t"
    )
    _assert_tables_equal(g1, w1)
    g2 = run_esql(
        "FROM events | EVAL pat = CATEGORIZE(props) "
        "| STATS n = COUNT(*) BY pat | SORT pat",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT regexp_replace(props, '[0-9]+', '<NUM>', 'g') pat, "
        "count(*)::BIGINT n FROM events GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(g2, w2)
    # runtime kernel errors surface wrapped in Ray's task error
    with pytest.raises(Exception, match="DATE_DIFF unit"):
        run_esql(
            'FROM events | EVAL d = DATE_DIFF("month", ts, ts) '
            "| SORT event_id | LIMIT 1",
            SF_DIR,
        )


def test_esql_stats_property(ray_session):
    """Hypothesis: random decomposable-aggregate combinations (with and
    without per-agg WHERE and grouping) match DuckDB on lineitem."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = {
        "COUNT": ("count({c})::BIGINT", False),
        "SUM": ("sum({c})", False),
        "MIN": ("min({c})", False),
        "MAX": ("max({c})", False),
        "AVG": ("round(avg({c}), 6)", True),
        "STD_DEV": ("round(stddev_pop({c}), 6)", True),
    }

    @settings(max_examples=12, deadline=None)
    @given(
        picks=st.lists(
            st.tuples(
                st.sampled_from(sorted(aggs)),
                st.sampled_from(cols),
                st.booleans(),  # per-agg WHERE l_quantity >= 25
            ),
            min_size=1, max_size=4,
        ),
        n_by=st.integers(min_value=0, max_value=2),
    )
    def check(picks, n_by):
        # the repo's float-exactness rule: SUM only over integer-valued
        # columns (float sums are block-order-dependent; every shipped
        # oracle sums integers or integer cents)
        picks = [
            (fn, "l_quantity" if fn == "SUM" else c, f)
            for fn, c, f in picks
        ]
        by = ["l_returnflag", "l_linestatus"][:n_by]
        frags, sels = [], []
        for i, (fn, c, filt) in enumerate(picks):
            w = " WHERE l_quantity >= 25" if filt else ""
            frags.append(f"o{i} = {fn}({c}){w}")
            sql_f = aggs[fn][0].format(c=c)
            sql_w = " FILTER (l_quantity >= 25)" if filt else ""
            # FILTER attaches to the aggregate call, before any round()
            if aggs[fn][1]:
                inner = sql_f[len("round("):-len(", 6)")]
                sels.append(f"round({inner}{sql_w}, 6) AS o{i}")
            else:
                base, cast = (
                    sql_f.split("::") if "::" in sql_f else (sql_f, None)
                )
                sels.append(
                    f"{base}{sql_w}{'::' + cast if cast else ''} AS o{i}"
                )
        pipe = (
            "FROM lineitem | STATS " + ", ".join(frags)
            + (f" BY {', '.join(by)}" if by else "")
            + (" | SORT " + ", ".join(by) if by else "")
        )
        sql = (
            "SELECT "
            + ", ".join((by + sels) if by else sels)
            + f" FROM '/root/testdata/sf0.001/lineitem.parquet'"
            + (f" GROUP BY {', '.join(by)} ORDER BY {', '.join(by)}" if by else "")
        )
        got = run_esql(pipe, "/root/testdata/sf0.001")
        import duckdb

        want = duckdb.connect().execute(sql).arrow()
        assert got.column_names == want.column_names
        for name in got.column_names:
            ga, wa = got[name].to_pylist(), want[name].to_pylist()
            for x, y in zip(ga, wa):
                if isinstance(x, float) and x is not None and y is not None:
                    assert abs(x - y) < 1e-9, name
                else:
                    assert x == y, name

    check()


def test_esql_multivalue_literals(ray_session):
    got = run_esql(
        'ROW a = [1, 2, 3], b = ["x", "y"] '
        "| EVAL n = MV_COUNT(a), mx = MV_MAX(a), f = MV_FIRST(b) "
        "| KEEP n, mx, f",
        "/tmp",
    )
    assert got.to_pydict() == {"n": [3], "mx": [3], "f": ["x"]}
    # EVAL with a multivalue literal expands per row
    g2 = run_esql(
        "FROM events | EVAL tags = [1, 2] | EVAL c = MV_COUNT(tags) "
        "| STATS s = SUM(c)",
        SF_DIR,
    )
    w = _duck("SELECT 2 * count(*)::BIGINT AS s FROM events")
    assert g2["s"].to_pylist() == w["s"].to_pylist()
    with pytest.raises(ValueError, match="must be literals"):
        parse_esql(_normalize_assign("FROM events | EVAL x = [value, 2]"))


def test_esql_function_library_batch(ray_session):
    # new math / string / MV functions vs DuckDB on real columns
    got = run_esql(
        "FROM events | EVAL s = ROUND(SIN(value), 6), "
        "g = GREATEST(value, 100.0), cb = ROUND(CBRT(value), 6) "
        "| KEEP event_id, s, g, cb | SORT event_id | LIMIT 50",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, round(sin(value), 6) s, "
        "greatest(value, 100.0) g, "
        "round(cbrt(value), 6) cb FROM events ORDER BY 1 LIMIT 50"
    )
    # hyperbolics vs numpy (DuckDB 1.0 has no cosh/sinh/tanh)
    import numpy as _np

    hy = run_esql(
        "FROM events | EVAL h = COSH(value / 100) "
        "| KEEP event_id, value, h | SORT event_id | LIMIT 20",
        SF_DIR,
    )
    assert all(
        abs(h - float(_np.cosh(v / 100))) < 1e-12
        for v, h in zip(hy["value"].to_pylist(), hy["h"].to_pylist())
    )
    _assert_tables_equal(got, want)
    # MV reductions over SPLIT lists vs DuckDB list kernels
    g2 = run_esql(
        'FROM documents | EVAL parts = SPLIT(text, " "), '
        "srt = MV_DEDUPE(parts), n = MV_COUNT(srt) "
        "| KEEP doc_id, n | SORT doc_id | LIMIT 40",
        SF_DIR,
    )
    w2 = _duck(
        "SELECT doc_id, len(list_distinct(string_split(text, ' ')))"
        "::BIGINT n FROM documents ORDER BY 1 LIMIT 40"
    )
    _assert_tables_equal(g2, w2)
    # literal smoke of the full batch
    t = run_esql(
        'ROW v = [3, 1, 2, 2] | EVAL sm = MV_SUM(v), av = MV_AVG(v), '
        "md = MV_MEDIAN(v), so = MV_SORT(v), dd = MV_DEDUPE(v), "
        'r = REPEAT("ab", 2), sp = CONCAT("x", SPACE(1), "y"), '
        "a2 = ROUND(ATAN2(1.0, 1.0) * 4, 6) "
        "| KEEP sm, av, md, so, dd, r, sp, a2",
        "/tmp",
    )
    assert t.to_pydict() == {
        "sm": [8], "av": [2.0], "md": [2.0], "so": [[1, 2, 2, 3]],
        "dd": [[1, 2, 3]], "r": ["abab"], "sp": ["x y"],
        "a2": [3.141593],
    }


def test_esql_like_pattern_lists(ray_session):
    got = run_esql(
        'FROM documents | WHERE lang LIKE ("e*", "f?") '
        "| STATS n = COUNT(*) BY lang | SORT lang",
        SF_DIR,
    )
    want = _duck(
        "SELECT lang, count(*)::BIGINT n FROM documents "
        "WHERE lang LIKE 'e%' OR lang LIKE 'f_' GROUP BY 1 ORDER BY 1"
    )
    _assert_tables_equal(got, want)
    # single parenthesized pattern still works
    g2 = run_esql(
        'FROM documents | WHERE lang LIKE ("e*") | STATS n = COUNT(*)',
        SF_DIR,
    )
    w2 = _duck(
        "SELECT count(*)::BIGINT n FROM documents WHERE lang LIKE 'e%'"
    )
    _assert_tables_equal(g2, w2)
    with pytest.raises(ValueError, match="string literals"):
        parse_esql(_normalize_assign(
            "FROM documents | WHERE lang LIKE (n_chars)"
        ))


def test_esql_conversion_and_hash_functions(ray_session):
    got = run_esql(
        "FROM events | EVAL deg = ROUND(TO_DEGREES(value / 100), 6), "
        "h = SHA256(event_type), m = MD5(event_type), "
        "bl = BYTE_LENGTH(event_type), bi = BIT_LENGTH(event_type) "
        "| KEEP event_id, deg, h, m, bl, bi | SORT event_id | LIMIT 30",
        SF_DIR,
    )
    want = _duck(
        "SELECT event_id, round(degrees(value / 100), 6) deg, "
        "sha256(event_type) h, md5(event_type) m, "
        "length(event_type)::BIGINT bl, (8 * length(event_type))::BIGINT bi "
        "FROM events ORDER BY 1 LIMIT 30"
    )
    _assert_tables_equal(got, want)
    g2 = run_esql(
        'ROW x = 90.0, s = "TRUE" '
        "| EVAL r = ROUND(TO_RADIANS(x), 6), b = TO_BOOLEAN(s) "
        "| KEEP r, b",
        "/tmp",
    )
    assert g2.to_pydict() == {"r": [1.570796], "b": [True]}


def test_esql_base64_and_now(ray_session):
    got = run_esql(
        "FROM documents | EVAL b = TO_BASE64(lang), r = FROM_BASE64(TO_BASE64(lang)) "
        "| KEEP doc_id, b, r, lang | SORT doc_id | LIMIT 10",
        SF_DIR,
    )
    want = _duck(
        "SELECT doc_id, to_base64(lang::BLOB) b, lang AS r, lang "
        "FROM documents ORDER BY 1 LIMIT 10"
    )
    _assert_tables_equal(got, want)
    assert got["r"].to_pylist() == got["lang"].to_pylist()
    with pytest.raises(Exception, match="nondeterministic under replay"):
        run_esql("FROM events | EVAL t = NOW() | SORT event_id | LIMIT 1", SF_DIR)


def test_esql_mv_slice_append_zip(ray_session):
    """MV_SLICE inclusive bounds, MV_APPEND concatenation + null rules,
    MV_ZIP pairwise join with unequal lengths; bad args refuse."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "a b c d" | EVAL w = SPLIT(s, " ") '
        "| EVAL sl = MV_SLICE(w, 1, 2) "
        '| EVAL short = MV_SLICE(w, 0, 0) '
        '| EVAL z = MV_ZIP(w, short, "+") '
        "| EVAL ap = MV_APPEND(short, sl) "
        "| EVAL sl_first = MV_FIRST(sl), sl_n = MV_COUNT(sl), "
        "z_first = MV_FIRST(z), z_last = MV_LAST(z), "
        "ap_n = MV_COUNT(ap), ap_last = MV_LAST(ap) "
        "| KEEP sl_first, sl_n, z_first, z_last, ap_n, ap_last",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    # slice [1, 2] inclusive = (b, c)
    assert row["sl_first"] == "b" and row["sl_n"] == 2
    # zip of (a b c d) with (a): first pairs, rest pass through alone
    assert row["z_first"] == "a+a" and row["z_last"] == "d"
    # append (a) ++ (b c) = (a b c)
    assert row["ap_n"] == 3 and row["ap_last"] == "c"
    import pytest as _p

    with _p.raises(Exception, match="negative"):
        run_esql('ROW s = "a b" | EVAL w = SPLIT(s, " ") | EVAL x = MV_SLICE(w, -1) | KEEP x', "/tmp")
    with _p.raises(Exception, match="multi-value"):
        run_esql("ROW a = 1 | EVAL x = MV_SLICE(a, 0) | KEEP x", "/tmp")


def test_esql_date_parse_round_trip_and_rejection(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "2024-03-05 07:09" '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        '| EVAL back = DATE_FORMAT("%Y-%m-%d %H:%M", d) | KEEP back',
        "/tmp",
    )
    assert t["back"][0].as_py() == "2024-03-05 07:09"
    import pytest as _p

    with _p.raises(Exception, match="unsupported pattern token"):
        run_esql('ROW s = "x" | EVAL d = DATE_PARSE("QQ-yyyy", s) | KEEP d', "/tmp")
    with _p.raises(Exception, match="literal pattern"):
        run_esql('ROW s = "x" | EVAL d = DATE_PARSE(s, s) | KEEP d', "/tmp")


def test_esql_modulo_matches_duckdb(ray_session):
    """% operator: truncated remainder on ints and floats vs DuckDB."""
    import duckdb

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    sf = "/root/testdata/sf0.001"
    t = run_esql(
        "FROM lineitem | EVAL m = l_orderkey % 7 "
        "| EVAL f = ROUND(l_discount % 0.03, 6) "
        "| STATS n = COUNT(*) BY m | SORT m",
        sf,
    ).to_pandas()
    want = duckdb.sql(
        f"SELECT l_orderkey % 7 AS m, count(*)::BIGINT AS n "
        f"FROM read_parquet('{sf}/lineitem.parquet') GROUP BY m ORDER BY m"
    ).df()
    assert t["m"].tolist() == want["m"].tolist()
    assert t["n"].tolist() == want["n"].tolist()
    # scalar precedence: % binds like * and /
    r = run_esql("ROW a = 17 | EVAL x = a % 5 + 1 | KEEP x", "/tmp")
    assert r["x"][0].as_py() == 3


def test_esql_to_ip_cidr_match(ray_session):
    """TO_IP canonicalization + validity nulls; CIDR_MATCH any-match,
    scalar and column paths; malformed blocks refuse."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "192.168.001.5" | EVAL ip = TO_IP(s) '
        '| EVAL bad = TO_IP("300.1.1.1"), nb = TO_IP("notip") '
        '| EVAL m = CIDR_MATCH(ip, "192.168.0.0/16"), '
        'm2 = CIDR_MATCH(ip, "10.0.0.0/8", "193.0.0.0/8"), '
        'm3 = CIDR_MATCH(ip, "10.0.0.0/8", "192.0.0.0/4") '
        "| KEEP ip, bad, nb, m, m2, m3",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["ip"] == "192.168.1.5"  # leading zeros canonicalized
    assert row["bad"] is None and row["nb"] is None
    assert row["m"] is True and row["m2"] is False and row["m3"] is True
    with pytest.raises(Exception, match="malformed block"):
        run_esql('ROW s = "1.2.3.4" | EVAL m = CIDR_MATCH(TO_IP(s), "1.2.3/33") | KEEP m', "/tmp")
    with pytest.raises(Exception, match="literal CIDR"):
        run_esql('ROW s = "1.2.3.4" | EVAL m = CIDR_MATCH(TO_IP(s)) | KEEP m', "/tmp")


def test_esql_to_datetime_round_trip(ray_session):
    """TO_DATETIME(TO_LONG(ts)) is the identity at ms resolution; strings
    point at DATE_PARSE."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    sf = "/root/testdata/sf0.001"
    t = run_esql(
        "FROM events | EVAL back = TO_DATETIME(TO_LONG(ts)) "
        "| EVAL same = TO_LONG(back) == TO_LONG(ts) "
        "| STATS n = COUNT(*) BY same | SORT same",
        sf,
    )
    assert t["same"].to_pylist() == [True]
    with pytest.raises(Exception, match="DATE_PARSE"):
        run_esql('ROW s = "2024-01-01" | EVAL d = TO_DATETIME(s) | KEEP d', "/tmp")


def test_esql_hash_generic(ray_session):
    import hashlib

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "hello" | EVAL h = HASH("sha256", s), m = HASH("md5", "abc") | KEEP h, m',
        "/tmp",
    )
    assert t["h"][0].as_py() == hashlib.sha256(b"hello").hexdigest()
    assert t["m"][0].as_py() == hashlib.md5(b"abc").hexdigest()
    with pytest.raises(Exception, match="unknown algorithm"):
        run_esql('ROW s = "x" | EVAL h = HASH("nope", s) | KEEP h', "/tmp")


def test_esql_mv_quantile_family_brute_force(ray_session):
    """MV_PERCENTILE / MV_MEDIAN_ABSOLUTE_DEVIATION / MV_PSERIES_WEIGHTED_SUM
    against an independent numpy recompute on the embeddings table."""
    import numpy as np
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        "FROM embeddings "
        "| EVAL p = MV_PERCENTILE(embedding, 37), "
        "m = MV_MEDIAN_ABSOLUTE_DEVIATION(embedding), "
        "s = MV_PSERIES_WEIGHTED_SUM(embedding, 1.1) "
        "| KEEP vec_id, p, m, s | SORT vec_id | LIMIT 50",
        SF_DIR,
    )
    raw = pq.read_table(f"{SF_DIR}/embeddings.parquet").sort_by("vec_id")

    def lerp_quantile(v: np.ndarray, q: float) -> float:
        v = np.sort(v)
        idx = (len(v) - 1) * q
        lo, hi = int(np.floor(idx)), int(np.ceil(idx))
        fr = idx - lo
        return v[lo] * (1.0 - fr) + v[hi] * fr

    for i in range(50):
        v = np.asarray(raw["embedding"][i].as_py(), dtype=np.float64)
        assert t["p"][i].as_py() == lerp_quantile(v, 0.37)
        med = lerp_quantile(v, 0.5)
        assert t["m"][i].as_py() == lerp_quantile(np.abs(v - med), 0.5)
        w = v / np.power(np.arange(1.0, len(v) + 1.0), 1.1)
        got = t["s"][i].as_py()
        assert abs(got - w.sum()) < 1e-9


def test_esql_mv_concat_and_empty(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "a b c" | EVAL w = SPLIT(s, " ") '
        '| EVAL j = MV_CONCAT(w, "-"), one = MV_CONCAT(MV_SLICE(w, 0, 0), "-") '
        "| KEEP j, one",
        "/tmp",
    )
    assert t["j"][0].as_py() == "a-b-c"
    assert t["one"][0].as_py() == "a"
    with pytest.raises(Exception, match="multi-value"):
        run_esql('ROW a = 1 | EVAL x = MV_CONCAT(a, "-") | KEEP x', "/tmp")


def test_esql_scalb_and_ip_prefix(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW ip = "192.168.213.77", bad = "999.1.2.3", d = 3.5 '
        "| EVAL p24 = IP_PREFIX(TO_IP(ip), 24, 0), "
        "p12 = IP_PREFIX(TO_IP(ip), 12, 0), "
        "p0 = IP_PREFIX(TO_IP(ip), 0, 0), "
        "pbad = IP_PREFIX(TO_IP(bad), 24, 0), "
        "s = SCALB(d, 4), sneg = SCALB(d, -1) "
        "| KEEP p24, p12, p0, pbad, s, sneg",
        "/tmp",
    )
    assert t["p24"][0].as_py() == "192.168.213.0"
    # /12 keeps the top 4 bits of the second octet: 168 & 0xF0 = 160
    assert t["p12"][0].as_py() == "192.160.0.0"
    assert t["p0"][0].as_py() == "0.0.0.0"
    assert t["pbad"][0].as_py() is None
    assert t["s"][0].as_py() == 3.5 * 16
    assert t["sneg"][0].as_py() == 1.75
    with pytest.raises(Exception, match="0..32"):
        run_esql('ROW ip = "1.2.3.4" | EVAL x = IP_PREFIX(ip, 40, 0) | KEEP x', "/tmp")
    with pytest.raises(Exception, match="integer literal"):
        run_esql("ROW d = 1.0 | EVAL x = SCALB(d, 1.5) | KEEP x", "/tmp")


def test_esql_match_phrase_and_term(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "alpha beta gamma" '
        '| EVAL adj = MATCH_PHRASE(s, "alpha beta"), '
        'rev = MATCH_PHRASE(s, "beta alpha"), '
        'gap = MATCH_PHRASE(s, "alpha gamma"), '
        't1 = TERM(s, "beta"), t2 = TERM(s, "Beta") '
        "| KEEP adj, rev, gap, t1, t2",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["adj"] is True and row["rev"] is False and row["gap"] is False
    # TERM does not analyze its query: 'Beta' stays uppercase and misses
    assert row["t1"] is True and row["t2"] is False
    with pytest.raises(Exception, match="literal"):
        run_esql('ROW s = "x" | EVAL b = MATCH_PHRASE(s, s) | KEEP b', "/tmp")


def test_esql_kql_predicate_and_errors(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW lang = "en", s = "alpha beta gamma" '
        '| EVAL a = KQL("lang:en and s:beta"), '
        'b = KQL("lang:fr or s:\\"beta gamma\\""), '
        'c = KQL("not lang:en"), '
        'd = KQL("s:alp*a"), e = KQL("s:be?a and (lang:en or lang:fr)") '
        "| KEEP a, b, c, d, e",
        "/tmp",
    )
    row = {c_: t[c_][0].as_py() for c_ in t.column_names}
    assert row["a"] and row["b"] and not row["c"] and row["d"] and row["e"]
    with pytest.raises(Exception, match="no field"):
        run_esql('ROW s = "x" | EVAL b = KQL("bare") | KEEP b', "/tmp")
    with pytest.raises(Exception, match="unknown (field|columns)"):
        run_esql('ROW s = "x" | EVAL b = KQL("nope:x") | KEEP b', "/tmp")
    with pytest.raises(Exception, match="parenthesis|groups"):
        run_esql('ROW s = "x" | EVAL b = KQL("s:(a or b)") | KEEP b', "/tmp")


def test_esql_round_to(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        "ROW v = 250 | EVAL a = ROUND_TO(v, 0, 100, 200, 400), "
        "b = ROUND_TO(v, 300, 500), c = ROUND_TO(v, 250) "
        "| KEEP a, b, c",
        "/tmp",
    )
    assert t["a"][0].as_py() == 200.0
    assert t["b"][0].as_py() == 300.0  # below the smallest point: clamp
    assert t["c"][0].as_py() == 250.0
    with pytest.raises(Exception, match="numeric literal"):
        run_esql('ROW v = 1 | EVAL x = ROUND_TO(v, "a") | KEEP x', "/tmp")


def test_esql_over_time_family(ray_session):
    """*_OVER_TIME aggregates: decomposable rewrite + endpoint FIRST/LAST,
    against a pandas brute force; FROM-source refusal."""
    import pandas as pd
    import pyarrow.parquet as pq

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        "TS events | STATS mx = MAX_OVER_TIME(value), "
        "a = AVG_OVER_TIME(value), n = COUNT_OVER_TIME(value) "
        "BY event_type | SORT event_type",
        SF_DIR,
    )
    f = run_esql(
        "TS events | STATS f = FIRST_OVER_TIME(value) BY event_type "
        "| SORT event_type",
        SF_DIR,
    )
    l_ = run_esql(
        "TS events | STATS l = LAST_OVER_TIME(value) BY event_type "
        "| SORT event_type",
        SF_DIR,
    )
    df = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    g = df.sort_values("ts").groupby("event_type")["value"]
    want = pd.DataFrame(
        {"mx": g.max(), "a": g.mean().round(6), "n": g.count(),
         "f": g.first(), "l": g.last()}
    ).sort_index()
    assert t["mx"].to_pylist() == want["mx"].tolist()
    assert t["a"].to_pylist() == pytest.approx(want["a"].tolist(), abs=1e-6)
    assert t["n"].to_pylist() == want["n"].tolist()
    assert f["f"].to_pylist() == want["f"].tolist()
    assert l_["l"].to_pylist() == want["l"].tolist()
    with pytest.raises(Exception, match="requires the TS"):
        run_esql("FROM events | STATS x = MAX_OVER_TIME(value) | LIMIT 1", SF_DIR)
    with pytest.raises(Exception, match="only aggregate"):
        run_esql(
            "TS events | STATS x = FIRST_OVER_TIME(value), y = COUNT(*) "
            "BY event_type | SORT event_type",
            SF_DIR,
        )


def test_esql_calendar_trunc_units(ray_session):
    """Calendar DATE_TRUNC/BUCKET: hand-computed month/quarter/year floors,
    including a multi-unit period (months-since-epoch floor)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "2024-04-15 10:30" '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        "| EVAL m = DATE_TRUNC(1 month, d), m2 = DATE_TRUNC(2 months, d), "
        "q = BUCKET(d, 1 quarter), y = DATE_TRUNC(1 year, d) "
        "| KEEP m, m2, q, y",
        "/tmp",
    )
    row = {c: str(t[c][0].as_py()) for c in t.column_names}
    assert row["m"] == "2024-04-01 00:00:00"
    # months since epoch: 2024-04 = 651, floor to even = 650 = 2024-03
    assert row["m2"] == "2024-03-01 00:00:00"
    assert row["q"] == "2024-04-01 00:00:00"
    assert row["y"] == "2024-01-01 00:00:00"
    with pytest.raises(Exception, match="n >= 1"):
        run_esql(
            'ROW s = "2024-01-01 00:00" '
            '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
            "| EVAL m = DATE_TRUNC(0 months, d) | KEEP m",
            "/tmp",
        )


def test_esql_week_is_monday_anchored(ray_session):
    """ES DATE_TRUNC/BUCKET weeks anchor to Monday (the epoch was a
    Thursday, so epoch-division would differ)."""
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "2024-04-17 10:00" '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        "| EVAL w = DATE_TRUNC(1 week, d), wb = BUCKET(d, 1 week) "
        "| KEEP w, wb",
        "/tmp",
    )
    assert str(t["w"][0].as_py()) == "2024-04-15 00:00:00"  # a Monday
    assert str(t["wb"][0].as_py()) == "2024-04-15 00:00:00"


def test_esql_cast_operator(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW v = 3.9, u = 7 | EVAL a = v::LONG, b = u::DOUBLE, '
        'c = u::STRING, d = "12"::INT, e = (v > 1.0)::STRING, '
        "f = v::INT::DOUBLE | KEEP a, b, c, d, e, f",
        "/tmp",
    )
    row = {c_: t[c_][0].as_py() for c_ in t.column_names}
    assert row["a"] == 3  # truncation toward zero, not rounding
    assert row["b"] == 7.0 and row["c"] == "7" and row["d"] == 12
    assert row["e"] == "true"  # ES renders booleans lowercase
    assert row["f"] == 3.0  # casts chain left-to-right
    with pytest.raises(Exception, match="unknown cast type"):
        run_esql("ROW v = 1 | EVAL x = v::NOPE | KEEP x", "/tmp")


def test_esql_spatial_functions(ray_session):
    """TO_GEOPOINT WKT round-trip, ST_X/ST_Y extraction, ST_DISTANCE
    haversine (pole-to-equator quarter circumference), malformed → null."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW w = "POINT (12.5 -33.25)" '
        "| EVAL p = TO_GEOPOINT(w), x = ST_X(p), y = ST_Y(p), "
        'dq = ST_DISTANCE("POINT (0 90)", "POINT (0 0)"), '
        'dz = ST_DISTANCE(p, p), bad = TO_GEOPOINT("nope") '
        "| KEEP p, x, y, dq, dz, bad",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["p"] == "POINT (12.5 -33.25)"
    assert row["x"] == 12.5 and row["y"] == -33.25
    # quarter of the 6371 km sphere's circumference, in meters
    assert row["dq"] == pytest.approx(np.pi / 2 * 6_371_000.0, rel=1e-12)
    assert row["dz"] == 0.0
    assert row["bad"] is None
    with pytest.raises(Exception, match="WKT POINT"):
        run_esql('ROW a = 1 | EVAL d = ST_DISTANCE("junk", "POINT (0 0)") | KEEP d', "/tmp")


def test_esql_chrono_fields_long_tail(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "2024-03-05 07:09" '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        '| EVAL doy = DATE_EXTRACT("day_of_year", d), '
        'ed = DATE_EXTRACT("epoch_day", d), '
        'isec = DATE_EXTRACT("instant_seconds", d), '
        'aw = DATE_EXTRACT("aligned_week_of_year", d), '
        'ms = DATE_EXTRACT("milli_of_second", d), '
        'mus = DATE_EXTRACT("micro_of_second", d) '
        "| KEEP doy, ed, isec, aw, ms, mus",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    # 2024-03-05: leap year, day 31+29+5
    assert row["doy"] == 65 and row["aw"] == 10  # ceil(65/7)
    assert row["ed"] == 19787  # days since 1970-01-01
    assert row["isec"] == row["ed"] * 86400 + 7 * 3600 + 9 * 60
    assert row["ms"] == 0 and row["mus"] == 0
    with pytest.raises(Exception, match="DATE_EXTRACT part"):
        run_esql(
            'ROW s = "2024-01-01 00:00" '
            '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
            '| EVAL x = DATE_EXTRACT("nope", d) | KEEP x',
            "/tmp",
        )


def test_esql_metadata_clause(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        "FROM documents METADATA _index, _id, _version, _score "
        "| EVAL i = TO_INTEGER(_id) | WHERE i < 3 "
        "| KEEP _index, _id, _version, _score, i | SORT i",
        SF_DIR,
    )
    assert t["_index"].to_pylist() == ["documents"] * 3
    assert t["_id"].to_pylist() == ["0", "1", "2"]  # strings, like ES _id
    assert t["_version"].to_pylist() == [1, 1, 1]
    assert t["_score"].to_pylist() == [None, None, None]  # non-scoring pipe
    with pytest.raises(Exception, match="unknown metadata"):
        run_esql("FROM documents METADATA _nope | LIMIT 1", SF_DIR)


def test_esql_dissect_right_padding(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "[t1]   [INFO]  alpha" '
        '| DISSECT s "[%{ts}]%{->}[%{level}]%{sp->} %{msg}" '
        "| KEEP ts, level, msg",
        "/tmp",
    )
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["ts"] == "t1" and row["level"] == "INFO"
    assert row["msg"] == "alpha"


def test_esql_dissect_append_modifier(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    t = run_esql(
        'ROW s = "john jacob smith" '
        '| DISSECT s "%{name} %{+name} %{last}" APPEND_SEPARATOR = "-" '
        "| KEEP name, last",
        "/tmp",
    )
    assert t["name"][0].as_py() == "john-jacob"
    assert t["last"][0].as_py() == "smith"
    # default separator is empty
    t2 = run_esql('ROW s = "ab cd" | DISSECT s "%{x} %{+x}" | KEEP x', "/tmp")
    assert t2["x"][0].as_py() == "abcd"
    with pytest.raises(Exception, match=r"append %\{\+x\} before"):
        run_esql('ROW s = "a" | DISSECT s "%{+x}" | KEEP x', "/tmp")
    with pytest.raises(Exception, match="DISSECT-only"):
        run_esql(
            'ROW s = "a" | GROK s "%{WORD:w}" APPEND_SEPARATOR = "-" | KEEP w',
            "/tmp",
        )


def test_review_fixes_phrase_compound_chrono_floor_kql_ws(ray_session):
    """Round-4 review fixes: compound-token phrases refuse (not silently
    false), derived ChronoFields floor for pre-1970 instants, KQL accepts
    trailing whitespace, calendar periods refuse arithmetic."""
    import numpy as np

    from bitcoin_ledger_2es_ray.pipelines.esql import (
        _kql_parse,
        _phrase_predicate,
        run_esql,
    )
    import pyarrow as _pa
    import pytest as _p

    # a doc literally containing the compound phrase must NOT silently miss
    with _p.raises(ValueError, match="compound tokens"):
        _phrase_predicate(_pa.array(["the fooBar baz end"]), "fooBar baz")
    with _p.raises(Exception, match="compound tokens"):
        run_esql(
            'ROW s = "x" | EVAL b = KQL("s:\\"fooBar baz\\"") | KEEP b', "/tmp"
        )
    # KQL trailing whitespace lexes
    assert _kql_parse("lang:en ") == ("term", "lang", "en")
    # pre-1970: floor semantics (Java ChronoField), micro in 0..999999
    t = run_esql(
        'ROW s = "1969-12-31 12:00" '
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm", s) '
        '| EVAL ed = DATE_EXTRACT("epoch_day", d), '
        'isec = DATE_EXTRACT("instant_seconds", d), '
        'mus = DATE_EXTRACT("micro_of_second", d) '
        "| KEEP ed, isec, mus",
        "/tmp",
    )
    assert t["ed"][0].as_py() == -1
    assert t["isec"][0].as_py() == -12 * 3600
    assert t["mus"][0].as_py() == 0
    # calendar periods refuse arithmetic with a clean esql error
    with _p.raises(Exception, match="calendar periods"):
        run_esql("ROW a = 1 | EVAL x = a + 1 month | KEEP x", "/tmp")
    with _p.raises(Exception, match="negated"):
        run_esql("ROW a = 1 | EVAL x = -1 month | KEEP x", "/tmp")


def test_esql_vector_functions(ray_session, tmp_path):
    """V_COSINE/V_DOT_PRODUCT/V_L1_NORM/V_L2_NORM/V_MAGNITUDE/V_HAMMING vs a
    plain-python recompute; null rows come back null."""
    import math

    vecs = [[1.0, 2.0, 2.0], [0.0, 3.0, 4.0], None, [-1.0, 0.0, 1.0]]
    q = [2.0, 1.0, 2.0]
    t = pa.table({"vid": [0, 1, 2, 3], "v": pa.array(vecs, type=pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / "vecs.parquet"))
    out = run_esql(
        "FROM vecs | EVAL cos = ROUND(V_COSINE(v, [2.0, 1.0, 2.0]), 6), "
        "dot = ROUND(V_DOT_PRODUCT(v, [2.0, 1.0, 2.0]), 6), "
        "l1 = ROUND(V_L1_NORM(v, [2.0, 1.0, 2.0]), 6), "
        "l2 = ROUND(V_L2_NORM(v, [2.0, 1.0, 2.0]), 6), "
        "ham = V_HAMMING(v, [2.0, 1.0, 2.0]), "
        "mag = ROUND(V_MAGNITUDE(v), 6) "
        "| KEEP vid, cos, dot, l1, l2, ham, mag | SORT vid | LIMIT 10",
        str(tmp_path),
    )
    rows = {r["vid"]: r for r in out.to_pylist()}
    for vid, vec in enumerate(vecs):
        if vec is None:
            assert all(rows[vid][c] is None for c in ("cos", "dot", "l1", "l2", "ham", "mag"))
            continue
        dot = sum(a * b for a, b in zip(vec, q))
        na = math.sqrt(sum(a * a for a in vec))
        nq = math.sqrt(sum(b * b for b in q))
        assert rows[vid]["dot"] == round(dot, 6)
        assert rows[vid]["cos"] == round(dot / (na * nq), 6)
        assert rows[vid]["l1"] == round(sum(abs(a - b) for a, b in zip(vec, q)), 6)
        assert rows[vid]["l2"] == round(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(vec, q))), 6
        )
        assert rows[vid]["ham"] == sum(1 for a, b in zip(vec, q) if a != b)
        assert rows[vid]["mag"] == round(na, 6)
    # dimension mismatch and ragged columns refuse loudly
    with pytest.raises(Exception, match="dimension mismatch"):
        run_esql("FROM vecs | EVAL x = V_COSINE(v, [1.0, 2.0]) | KEEP x "
                 "| SORT x | LIMIT 5", str(tmp_path))
    # raggedness is checked per block (dense_vector fields are fixed-dim
    # by mapping) — unit-test the kernel helper directly
    from bitcoin_ledger_2es_ray.pipelines.esql import _dense_matrix

    with pytest.raises(Exception, match="ragged"):
        _dense_matrix(pa.array([[1.0], [1.0, 2.0]]), "V_MAGNITUDE")


def test_esql_knn_two_pass(ray_session, tmp_path):
    """KNN(field, q, k): threshold rewrite equals the brute-force top-k;
    sibling conjuncts act as PRE-filters; misplaced KNN refuses."""
    import math

    rng = [[float((7 * i + j) % 5 - 2) for j in range(4)] for i in range(20)]
    labels = [i % 2 for i in range(20)]
    t = pa.table({
        "vid": list(range(20)),
        "v": pa.array(rng, type=pa.list_(pa.float32())),
        "lab": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "kv.parquet"))
    q = [1.0, 0.5, -1.0, 2.0]

    def cos(a):
        d = sum(x * y for x, y in zip(a, q))
        na = math.sqrt(sum(x * x for x in a))
        nq = math.sqrt(sum(y * y for y in q))
        return d / (na * nq) if na else None

    out = run_esql(
        "FROM kv | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 3) "
        "| KEEP vid | SORT vid | LIMIT 50",
        str(tmp_path),
    )
    scored = sorted(
        (c, vid) for vid, a in enumerate(rng) if (c := cos(a)) is not None
    )
    thr = scored[-3][0]
    expect = sorted(vid for c, vid in scored if c >= thr)
    assert out["vid"].to_pylist() == expect

    # pre-filter: the 3 nearest AMONG lab == 1 rows
    out2 = run_esql(
        "FROM kv | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 3) AND lab == 1 "
        "| KEEP vid | SORT vid | LIMIT 50",
        str(tmp_path),
    )
    scored1 = sorted((c, vid) for vid, a in enumerate(rng)
                     if labels[vid] == 1 and (c := cos(a)) is not None)
    thr1 = scored1[-3][0]
    assert out2["vid"].to_pylist() == sorted(v for c, v in scored1 if c >= thr1)

    # k >= row count keeps everything
    out3 = run_esql(
        "FROM kv | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 99) "
        "| KEEP vid | SORT vid | LIMIT 50",
        str(tmp_path),
    )
    assert len(out3) == 20
    # misuse refuses: not the first command / under OR / bad k
    with pytest.raises(Exception, match="first WHERE"):
        run_esql("FROM kv | EVAL z = vid + 1 | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 3) "
                 "| KEEP vid | SORT vid | LIMIT 5", str(tmp_path))
    with pytest.raises(Exception, match="bare top-level conjunct"):
        run_esql("FROM kv | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 3) OR lab == 1 "
                 "| KEEP vid | SORT vid | LIMIT 5", str(tmp_path))
    with pytest.raises(Exception, match="integer k"):
        run_esql("FROM kv | WHERE KNN(v, [1.0, 0.5, -1.0, 2.0], 0) "
                 "| KEEP vid | SORT vid | LIMIT 5", str(tmp_path))


def test_esql_spatial_relations(ray_session, tmp_path):
    """ST_WITHIN/ST_CONTAINS/ST_INTERSECTS/ST_DISJOINT vs a brute-force
    matplotlib-free even-odd recompute over a NON-convex polygon, plus
    envelope/extent readers and refusals."""
    import pyarrow.parquet as pq_

    # a concave "arrow" polygon
    poly = "POLYGON ((0 0, 4 0, 4 4, 2 1.5, 0 4, 0 0))"
    pts = [(x / 2.0, y / 2.0) for x in range(-2, 10) for y in range(-2, 10)]
    t = pa.table({
        "pid": list(range(len(pts))),
        "wkt": [f"POINT ({x} {y})" for x, y in pts],
    })
    pq_.write_table(t, str(tmp_path / "pts.parquet"))
    out = run_esql(
        f'FROM pts | EVAL w = ST_WITHIN(wkt, TO_GEOSHAPE("{poly}")), '
        f'c = ST_CONTAINS(TO_GEOSHAPE("{poly}"), wkt), '
        f'i = ST_INTERSECTS(wkt, TO_GEOSHAPE("{poly}")), '
        f'd = ST_DISJOINT(wkt, TO_GEOSHAPE("{poly}")) '
        "| KEEP pid, w, c, i, d | SORT pid | LIMIT 500",
        str(tmp_path),
    )

    ring = [(0, 0), (4, 0), (4, 4), (2, 1.5), (0, 4), (0, 0)]

    def brute_inside(px, py):
        ins = False
        on = False
        for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            if cross == 0 and min(ax, bx) <= px <= max(ax, bx) \
                    and min(ay, by) <= py <= max(ay, by):
                on = True
            if (ay > py) != (by > py):
                xs = ax + (bx - ax) * (py - ay) / (by - ay)
                if px < xs:
                    ins = not ins
        return ins or on

    rows = out.to_pylist()
    assert len(rows) == len(pts)
    n_in = 0
    for r in rows:
        px, py = pts[r["pid"]]
        exp = brute_inside(px, py)
        n_in += exp
        assert r["w"] == exp and r["c"] == exp and r["i"] == exp
        assert r["d"] == (not exp)
    assert 0 < n_in < len(pts)  # the grid straddles the polygon

    # scalar point-point relations + envelope / extents of shapes
    row = run_esql(
        'ROW a = 1 | EVAL '
        'eqp = ST_INTERSECTS("POINT (5 5)", "POINT (5 5)"), '
        'dsj = ST_DISJOINT("POINT (5 5)", "POINT (5 6)"), '
        f'env = ST_ENVELOPE(TO_GEOSHAPE("{poly}")), '
        f'x0 = ST_XMIN(TO_GEOSHAPE("{poly}")), '
        f'x1 = ST_XMAX(TO_GEOSHAPE("{poly}")), '
        f'y0 = ST_YMIN(TO_GEOSHAPE("{poly}")), '
        f'y1 = ST_YMAX(TO_GEOSHAPE("{poly}")), '
        'bx = ST_XMAX("BBOX (1.0, 2.0, 4.0, 3.0)") '
        "| KEEP eqp, dsj, env, x0, x1, y0, y1, bx",
        "/tmp",
    ).to_pylist()[0]
    assert row["eqp"] is True and row["dsj"] is True
    assert row["env"] == "BBOX (0.0, 4.0, 4.0, 0.0)"
    assert (row["x0"], row["x1"], row["y0"], row["y1"]) == (0.0, 4.0, 0.0, 4.0)
    assert row["bx"] == 2.0
    # TO_GEOSHAPE canonicalization and malformed → null
    row2 = run_esql(
        'ROW a = 1 | EVAL g = TO_GEOSHAPE("POLYGON((0 0,1 0,1 1,0 0))"), '
        'bad = TO_GEOSHAPE("POLYGON ((0 0, 1 1))") | KEEP g, bad',
        "/tmp",
    ).to_pylist()[0]
    assert row2["g"] == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    assert row2["bad"] is None
    # polygon-polygon refuses
    with pytest.raises(Exception, match="polygon-polygon"):
        run_esql(
            f'ROW a = 1 | EVAL x = ST_INTERSECTS(TO_GEOSHAPE("{poly}"), '
            f'TO_GEOSHAPE("{poly}")) | KEEP x',
            "/tmp",
        )


def test_esql_grid_and_conversion_stragglers(ray_session):
    """ST_GEOHASH/ST_GEOTILE string grid keys (known city fixture),
    TO_UNSIGNED_LONG null-on-negative, TO_VERSION validation,
    TO_DATE_NANOS exact widening, TO_CARTESIAN* canonicalization."""
    row = run_esql(
        'ROW a = 1 | EVAL '
        'gh = ST_GEOHASH("POINT (13.361389 38.115556)", 5), '
        'gt = ST_GEOTILE("POINT (13.361389 38.115556)", 8), '
        'u = TO_UNSIGNED_LONG(42), un = TO_UNSIGNED_LONG(0 - 5), '
        'v = TO_VERSION("1.2.3-beta.1"), vb = TO_VERSION("not a version"), '
        'cp = TO_CARTESIANPOINT("POINT (10 20)"), '
        'cs = TO_CARTESIANSHAPE("POLYGON((0 0,1 0,1 1,0 0))"), '
        'dn = TO_DATE_NANOS(TO_DATETIME(1704067200000)) '
        "| KEEP gh, gt, u, un, v, vb, cp, cs, dn",
        "/tmp",
    ).to_pylist()[0]
    assert row["gh"] == "sqc8b"  # Palermo, the geohash reference fixture
    assert row["gt"] == "8/137/98"
    assert row["u"] == 42 and row["un"] is None
    assert row["v"] == "1.2.3-beta.1" and row["vb"] is None
    assert row["cp"] == "POINT (10 20)"
    assert row["cs"] == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    assert str(row["dn"]) == "2024-01-01 00:00:00"
    with pytest.raises(Exception, match="precision out of range"):
        run_esql('ROW a = 1 | EVAL x = ST_GEOHASH("POINT (1 1)", 13) | KEEP x', "/tmp")
    with pytest.raises(Exception, match="precision out of range"):
        run_esql('ROW a = 1 | EVAL x = ST_GEOTILE("POINT (1 1)", 30) | KEEP x', "/tmp")


def test_esql_temporal_math_and_amount_casts(ray_session):
    """timestamp ± duration (literal and TO_TIMEDURATION/TO_DATEPERIOD
    casts) with exact expectations, plus the refusal matrix."""
    rows = run_esql(
        "ROW t = 1704067200000 | EVAL d = TO_DATETIME(t), "
        "a = d + 2 hours, "
        'b = d - TO_TIMEDURATION("90 minutes"), '
        'c = d + TO_DATEPERIOD("1 week"), '
        'e = DATE_TRUNC(TO_DATEPERIOD("1 day"), d + 26 hours) '
        "| KEEP a, b, c, e",
        "/tmp",
    ).to_pylist()[0]
    assert str(rows["a"]) == "2024-01-01 02:00:00"
    assert str(rows["b"]) == "2023-12-31 22:30:00"
    assert str(rows["c"]) == "2024-01-08 00:00:00"
    assert str(rows["e"]) == "2024-01-02 00:00:00"
    for bad, msg in [
        ('TO_TIMEDURATION("3 days")', "millisecond/second"),
        ('TO_DATEPERIOD("5 minutes")', "day/week/month"),
        ("TO_DATETIME(1) * 2 hours", "only valid with"),
        ("1 + 2 hours", "datetime side"),
        ('2 hours - TO_DATETIME(1)', "subtract a timestamp"),
    ]:
        with pytest.raises(Exception, match=msg):
            run_esql(f"ROW t = 1 | EVAL x = {bad} | KEEP x", "/tmp")
    # duration ± duration folds
    row2 = run_esql(
        'ROW t = 1704067200000 | EVAL x = TO_DATETIME(t) + '
        '(2 hours - TO_TIMEDURATION("30 minutes")) | KEEP x',
        "/tmp",
    ).to_pylist()[0]
    assert str(row2["x"]) == "2024-01-01 01:30:00"


def test_esql_sort_nulls_placement(ray_session, tmp_path):
    """SORT NULLS FIRST/LAST and the ES|QL default (null is LARGER than
    any value: ASC → last, DESC → first)."""
    t = pa.table({
        "k": [1, 2, 3, 4],
        "v": pa.array([10.0, None, 5.0, None], type=pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "nv.parquet"))

    def keys(src):
        return run_esql(src, str(tmp_path))["k"].to_pylist()

    assert keys("FROM nv | KEEP k, v | SORT v, k | LIMIT 10") == [3, 1, 2, 4]
    assert keys("FROM nv | KEEP k, v | SORT v DESC, k | LIMIT 10") == [2, 4, 1, 3]
    assert keys("FROM nv | KEEP k, v | SORT v NULLS FIRST, k | LIMIT 10") == [2, 4, 3, 1]
    assert keys("FROM nv | KEEP k, v | SORT v DESC NULLS LAST, k | LIMIT 10") == [1, 3, 2, 4]
    with pytest.raises(Exception, match="NULLS FIRST"):
        run_esql("FROM nv | KEEP k, v | SORT v NULLS SOMETIMES | LIMIT 5", str(tmp_path))


def test_esql_fuse_command(ray_session, tmp_path):
    """FUSE (default rrf) == | RRF; FUSE linear sums raw branch scores;
    unknown methods refuse."""
    base = (
        "FROM documents | FORK "
        '(RERANK "code data" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20) "
        '(RERANK "query sort" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20) "
    )
    sf = "/root/testdata/sf0.001"
    rrf_tail = run_esql(base + "| RRF", sf)
    fuse_default = run_esql(base + "| FUSE", sf)
    fuse_rrf = run_esql(base + "| FUSE rrf", sf)
    assert rrf_tail.equals(fuse_default) and rrf_tail.equals(fuse_rrf)
    lin = run_esql(base + "| FUSE linear", sf).to_pylist()
    # brute force: per-branch score maps summed
    b1 = {r["doc_id"]: r["_score"] for r in run_esql(
        'FROM documents | RERANK "code data" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20", sf
    ).to_pylist()}
    b2 = {r["doc_id"]: r["_score"] for r in run_esql(
        'FROM documents | RERANK "query sort" ON text WITH test_reranker '
        "| KEEP doc_id, _score | SORT _score DESC, doc_id ASC | LIMIT 20", sf
    ).to_pylist()}
    expect = {d: round(b1.get(d, 0.0) + b2.get(d, 0.0), 6) for d in set(b1) | set(b2)}
    assert {r["doc_id"]: r["_score"] for r in lin} == expect
    with pytest.raises(Exception, match="FUSE"):
        run_esql(base + "| FUSE cubic", sf)


def test_esql_metadata_score_bm25(ray_session):
    """METADATA _score + MATCH populates Lucene BM25 — brute-forced from
    the corpus; non-scoring pipes keep _score null; pre-filter conjuncts
    don't change the index-global statistics."""
    import math

    import pyarrow.parquet as pq_

    sf = "/root/testdata/sf0.001"
    docs = pq_.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text", "lang"])
    toks = [t.as_py().split(" ") for t in docs["text"]]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    terms = ["data", "pipeline"]
    df = {t: sum(1 for d in toks if t in d) for t in terms}

    def bm25(d):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf:
                s += math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) * tf / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * len(d) / avgdl)
                )
        return round(s, 6)

    out = run_esql(
        'FROM documents METADATA _score | WHERE MATCH(text, "data pipeline") '
        "| EVAL s = ROUND(_score, 6) | KEEP doc_id, s "
        "| SORT doc_id | LIMIT 100000",
        sf,
    )
    got = {r["doc_id"]: r["s"] for r in out.to_pylist()}
    ids = docs["doc_id"].to_pylist()
    expect = {i: bm25(d) for i, d in zip(ids, toks) if set(d) & set(terms)}
    assert got == expect

    # a pre-filter conjunct narrows the rows but NOT the statistics
    out2 = run_esql(
        'FROM documents METADATA _score | WHERE MATCH(text, "data pipeline") '
        'AND lang == "en" | EVAL s = ROUND(_score, 6) | KEEP doc_id, s '
        "| SORT doc_id | LIMIT 100000",
        sf,
    )
    langs = {i: l_ for i, l_ in zip(ids, docs["lang"].to_pylist())}
    got2 = {r["doc_id"]: r["s"] for r in out2.to_pylist()}
    assert got2 == {i: v for i, v in expect.items() if langs[i] == "en"}

    # no scoring context → _score stays null
    out3 = run_esql(
        "FROM documents METADATA _score | KEEP doc_id, _score "
        "| SORT doc_id | LIMIT 5",
        sf,
    )
    assert all(v is None for v in out3["_score"].to_pylist())


def test_esql_insist_unmapped_and_mapped(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    sf = "/root/testdata/sf0.001"
    t = run_esql(
        "FROM documents | INSIST_\U0001F414 ghost "
        '| EVAL tag = COALESCE(ghost, "absent") | STATS n = COUNT(*) BY tag',
        sf,
    )
    assert t.to_pylist() == [{"tag": "absent", "n": 500}]
    # mapped field passes through untouched
    t2 = run_esql(
        "FROM documents | INSIST_\U0001F414 lang | STATS n = COUNT(*) BY lang"
        " | SORT lang",
        sf,
    )
    t3 = run_esql("FROM documents | STATS n = COUNT(*) BY lang | SORT lang", sf)
    assert t2.equals(t3)


def test_esql_insist_rejections(ray_session):
    import pytest as _pytest

    from bitcoin_ledger_2es_ray.pipelines.esql import run_esql

    sf = "/root/testdata/sf0.001"
    with _pytest.raises(ValueError):
        run_esql(
            'FROM documents | WHERE lang == "py" | INSIST_\U0001F414 x', sf
        )
    with _pytest.raises(ValueError):
        run_esql(
            "FROM documents | STATS n = COUNT(*) BY lang "
            "| INSIST_\U0001F414 x",
            sf,
        )


def test_sql_catalog_commands(ray_session):
    from bitcoin_ledger_2es_ray.pipelines.sql_api import run_sql

    sf = "/root/testdata/sf0.001"
    tables = run_sql("SHOW TABLES", sf)["name"].to_pylist()
    assert tables == sorted(tables) and "documents" in tables and len(tables) == 10
    d = run_sql("DESCRIBE documents;", sf)
    assert dict(zip(d["column"].to_pylist(), d["type"].to_pylist())) == {
        "doc_id": "long", "lang": "text", "n_chars": "long",
        "source": "text", "text": "text",
    }
    e = run_sql("show columns from embeddings", sf)
    assert dict(zip(e["column"].to_pylist(), e["type"].to_pylist())) == {
        "embedding": "dense_vector", "label": "integer", "vec_id": "long",
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_sql("DESCRIBE nosuch", sf)


def test_parser_fuzz_never_crashes():
    """Garbage into the ES|QL / EQL / SQL parsers must raise a clean
    ValueError (the engine's refusal contract) — never an internal
    exception type.  Hypothesis drives random strings plus mutated
    fragments of valid pipes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bitcoin_ledger_2es_ray.pipelines.eql import parse_eql
    from bitcoin_ledger_2es_ray.pipelines.esql import parse_esql
    from bitcoin_ledger_2es_ray.pipelines.sql_api import sql_to_esql

    seeds = [
        "FROM documents | STATS n = COUNT(*) BY lang",
        "FROM events | WHERE value > 1 | SORT ts | LIMIT 3",
        "ROW a = 1 | EVAL b = a + 2",
        'sequence by user_id [a where true] [b where true]',
        "SELECT lang FROM documents WHERE n_chars > 10",
    ]

    @settings(max_examples=150, deadline=None)
    @given(
        base=st.sampled_from(seeds),
        junk=st.text(min_size=0, max_size=12),
        cut=st.integers(min_value=0, max_value=60),
        mode=st.sampled_from(["esql", "eql", "sql"]),
    )
    def check(base, junk, cut, mode):
        src = base[:cut] + junk + base[cut:]
        fn = {"esql": parse_esql, "eql": parse_eql, "sql": sql_to_esql}[mode]
        try:
            fn(src)
        except ValueError:
            pass  # the refusal contract
        except (KeyError, IndexError, AttributeError, TypeError) as ex:
            raise AssertionError(f"{mode} parser leaked {type(ex).__name__} on {src!r}") from ex

    check()
