"""DuckDB ENUM emulation (enums.py): CREATE/DROP TYPE lifecycle,
membership guards on cast/INSERT/UPDATE, enum_range introspection
parity (reference server/core/duckdb_schema.go:124-161)."""

import pytest

from shaper_spark.engine import query_dashboard
from shaper_spark.tasks import execute_task


@pytest.fixture()
def mood(spark):
    execute_task(spark, "DROP TYPE IF EXISTS t_mood;")
    r = execute_task(
        spark, "CREATE TYPE t_mood AS ENUM ('sad', 'ok', 'happy');"
    )
    assert r.success
    yield "t_mood"
    execute_task(spark, "DROP TYPE IF EXISTS t_mood;")
    spark.sql("DROP TABLE IF EXISTS t_feelings")


def test_create_duplicate_and_drop_missing(spark, mood):
    r = execute_task(spark, "CREATE TYPE t_mood AS ENUM ('x');")
    assert not r.success
    assert "already exists" in r.queries[-1].error
    r2 = execute_task(spark, "CREATE TYPE IF NOT EXISTS t_mood AS ENUM ('x');")
    assert r2.success  # no-op, keeps original values
    r3 = execute_task(spark, "DROP TYPE t_nope;")
    assert not r3.success and "does not exist" in r3.queries[-1].error


def test_enum_range_first_last(spark, mood):
    d = query_dashboard(
        spark,
        "SELECT enum_range(NULL::t_mood) AS r,"
        " enum_first(NULL::t_mood) AS f,"
        " enum_last(NULL::t_mood) AS l;",
        dashboard_id="e1",
    )
    q = d.sections[0].queries[0]
    assert q.rows[0][1] == "sad" and q.rows[0][2] == "happy"
    assert "sad" in q.rows[0][0] and "happy" in q.rows[0][0]


def test_cast_guard_valid_and_invalid(spark, mood):
    r = execute_task(spark, "SELECT 'ok'::t_mood AS m;")
    assert r.success and r.queries[0].result_rows == [["ok"]]
    r2 = execute_task(spark, "SELECT 'angry'::t_mood AS m;")
    assert not r2.success
    assert "Could not convert string 'angry' to t_mood" in r2.queries[0].error
    r3 = execute_task(spark, "SELECT CAST(NULL AS t_mood) AS m;")
    assert r3.success and r3.queries[0].result_rows == [[None]]


def test_table_lifecycle_insert_update_guards(spark, mood):
    r = execute_task(
        spark,
        """
        CREATE OR REPLACE TABLE t_feelings (who VARCHAR, m t_mood);
        INSERT INTO t_feelings VALUES ('ann', 'happy'), ('bob', 'sad');
        SELECT count(*) AS n FROM t_feelings;
        """,
    )
    assert r.success, [q.error for q in r.queries]
    assert r.queries[-1].result_rows == [[2]]
    # stored as STRING
    assert dict(spark.table("t_feelings").dtypes)["m"] == "string"

    bad = execute_task(
        spark, "INSERT INTO t_feelings VALUES ('eve', 'angry');"
    )
    assert not bad.success
    assert "Could not convert" in bad.queries[0].error
    # nothing committed by the failed statement
    assert spark.table("t_feelings").count() == 2

    badcol = execute_task(
        spark,
        "INSERT INTO t_feelings (m, who) VALUES ('angry', 'eve');",
    )
    assert not badcol.success

    upd = execute_task(
        spark, "UPDATE t_feelings SET m = 'livid' WHERE who = 'ann';"
    )
    assert not upd.success and "Could not convert" in upd.queries[0].error
    ok = execute_task(
        spark, "UPDATE t_feelings SET m = 'ok' WHERE who = 'ann';"
    )
    assert ok.success
    assert (
        spark.sql("SELECT m FROM t_feelings WHERE who='ann'").collect()[0].m
        == "ok"
    )


def test_introspection_lists_enum(spark, mood):
    from shaper_spark.introspect import get_schema

    found = [
        e
        for db in get_schema(spark).databases
        for s in db.schemas
        for e in s.enums
        if e["name"] == "t_mood"
    ]
    assert found == [{"name": "t_mood", "values": ["sad", "ok", "happy"]}]


def test_drop_clears_table_mapping(spark, mood):
    execute_task(
        spark,
        "CREATE OR REPLACE TABLE t_feelings (who VARCHAR, m t_mood);",
    )
    execute_task(spark, "DROP TYPE t_mood;")
    # with the type gone the column is a plain VARCHAR: no guard
    r = execute_task(
        spark, "INSERT INTO t_feelings VALUES ('eve', 'anything');"
    )
    assert r.success


def test_non_enum_create_type_is_loud(spark):
    r = execute_task(
        spark, "CREATE TYPE t_pair AS STRUCT(a INTEGER, b INTEGER);"
    )
    assert not r.success
    assert "only ENUM" in r.queries[0].error


def test_duckdb_types_lists_enums(spark, mood):
    r = execute_task(
        spark,
        "SELECT type_name FROM duckdb_types() "
        "WHERE logical_type = 'ENUM' AND NOT internal "
        "AND type_name = 't_mood';",
    )
    assert r.success and r.queries[0].result_rows == [["t_mood"]]


def test_insert_parenthesized_source_query_is_guarded(spark, mood):
    """r12 ADVICE: `INSERT INTO t (SELECT …)` — the paren group is a
    SOURCE QUERY, not a column list; the guard must fire positionally."""
    execute_task(
        spark,
        "CREATE OR REPLACE TABLE t_feelings (who VARCHAR, m t_mood);",
    )
    bad = execute_task(
        spark, "INSERT INTO t_feelings (SELECT 'eve', 'angry');"
    )
    assert not bad.success
    assert "Could not convert" in bad.queries[0].error
    ok = execute_task(
        spark, "INSERT INTO t_feelings (SELECT 'eve', 'happy');"
    )
    assert ok.success, [q.error for q in ok.queries]
    assert spark.table("t_feelings").count() == 1


def test_insert_by_name_is_guarded(spark, mood):
    """r12 ADVICE: INSERT … BY NAME maps by column NAME — enum columns
    found in the source schema get the membership guard."""
    execute_task(
        spark,
        "CREATE OR REPLACE TABLE t_feelings (who VARCHAR, m t_mood);",
    )
    bad = execute_task(
        spark,
        "INSERT INTO t_feelings BY NAME "
        "SELECT 'angry' AS m, 'eve' AS who;",
    )
    assert not bad.success
    assert "Could not convert" in bad.queries[0].error
    ok = execute_task(
        spark,
        "INSERT INTO t_feelings BY NAME SELECT 'ok' AS m, 'eve' AS who;",
    )
    assert ok.success, [q.error for q in ok.queries]
    row = spark.table("t_feelings").collect()[0]
    assert (row.who, row.m) == ("eve", "ok")


def test_guard_evaluates_compound_expression_once(spark, mood):
    """r12 ADVICE: a nondeterministic expression must be bound once —
    the value checked IS the value stored (and the eval count is 1)."""
    from shaper_spark.enums import _guard

    spark.sql("DROP TABLE IF EXISTS t_evalcount")
    spark.sql("CREATE TABLE t_evalcount (n INT) USING parquet")
    spark.sql("INSERT INTO t_evalcount VALUES (0)")
    # a guarded expression that flips per evaluation: if the guard
    # evaluated it more than once, the membership branch could pass
    # on one value and return/store another
    expr = "element_at(array('sad', 'ok'), 1 + CAST(rand() < 2 AS INT))"
    g = _guard(expr, "t_mood", ["sad", "ok", "happy"])
    vals = {spark.sql(f"SELECT {g} AS v").collect()[0].v for _ in range(5)}
    assert vals <= {"sad", "ok"}
    # single evaluation is structural: exactly one occurrence of the
    # expression text in the guard SQL
    assert g.count("rand()") == 1
    spark.sql("DROP TABLE IF EXISTS t_evalcount")
