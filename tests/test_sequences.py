"""DuckDB sequence emulation (sequences.py): CREATE/DROP lifecycle,
nextval/currval dealing, bounds/cycle semantics, error wording — every
behavior in this file was pinned against DuckDB 1.0.0 live (r13)."""

import pytest

from shaper_spark.engine import query_dashboard
from shaper_spark.tasks import execute_task


@pytest.fixture()
def seq(spark):
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_seq;")
    r = execute_task(spark, "CREATE SEQUENCE t_seq;")
    assert r.success, [q.error for q in r.queries]
    yield "t_seq"
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_seq;")


def _one(spark, sql, did="sq"):
    d = query_dashboard(spark, sql, dashboard_id=did)
    return d.sections[0].queries[0].rows


def test_nextval_deals_and_currval_reads(spark, seq):
    rows = _one(spark, "SELECT nextval('t_seq') AS a, nextval('t_seq') AS b;")
    assert rows == [[1, 2]]
    assert _one(spark, "SELECT currval('t_seq') AS c;") == [[2]]


def test_per_row_dealing(spark, seq):
    rows = _one(
        spark,
        "SELECT nextval('t_seq') AS v FROM range(3) ORDER BY v;",
    )
    assert [r[0] for r in rows] == [1, 2, 3]


def test_start_increment_maxvalue_and_error_wording(spark):
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_s2;")
    r = execute_task(
        spark, "CREATE SEQUENCE t_s2 START 5 INCREMENT 3 MAXVALUE 12;"
    )
    assert r.success
    rows = _one(spark, "SELECT nextval('t_s2') AS v FROM range(3) ORDER BY v;")
    assert [r[0] for r in rows] == [5, 8, 11]
    bad = execute_task(spark, "SELECT nextval('t_s2');")
    assert not bad.success
    assert (
        'reached maximum value of sequence "t_s2" (12)'
        in bad.queries[0].error
    )
    execute_task(spark, "DROP SEQUENCE t_s2;")


def test_cycle_wraps_to_minvalue(spark):
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_s3;")
    execute_task(spark, "CREATE SEQUENCE t_s3 START 2 MAXVALUE 3 CYCLE;")
    vals = [
        _one(spark, "SELECT nextval('t_s3') AS v;", f"c{i}")[0][0]
        for i in range(4)
    ]
    assert vals == [2, 3, 1, 2]  # DuckDB 1.0 pinned
    execute_task(spark, "DROP SEQUENCE t_s3;")


def test_descending_defaults_and_minimum_error(spark):
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_s4;")
    execute_task(spark, "CREATE SEQUENCE t_s4 INCREMENT -1 MINVALUE -2;")
    vals = [
        _one(spark, "SELECT nextval('t_s4') AS v;", f"d{i}")[0][0]
        for i in range(2)
    ]
    assert vals == [-1, -2]  # descending starts at MAXVALUE (-1)
    bad = execute_task(spark, "SELECT nextval('t_s4');")
    assert not bad.success
    assert (
        'reached minimum value of sequence "t_s4" (-2)'
        in bad.queries[0].error
    )
    execute_task(spark, "DROP SEQUENCE t_s4;")


def test_catalog_errors_match_duckdb(spark, seq):
    dup = execute_task(spark, "CREATE SEQUENCE t_seq;")
    assert not dup.success
    assert 'Sequence with name "t_seq" already exists!' in dup.queries[0].error
    assert execute_task(spark, "CREATE SEQUENCE IF NOT EXISTS t_seq;").success
    missing = execute_task(spark, "SELECT nextval('t_nope');")
    assert not missing.success
    assert (
        "Sequence with name t_nope does not exist!"
        in missing.queries[0].error
    )
    drop = execute_task(spark, "DROP SEQUENCE t_nope;")
    assert not drop.success
    assert "does not exist!" in drop.queries[0].error
    assert execute_task(spark, "DROP SEQUENCE IF EXISTS t_nope;").success


def test_or_replace_resets(spark, seq):
    _one(spark, "SELECT nextval('t_seq') AS v;")
    r = execute_task(spark, "CREATE OR REPLACE SEQUENCE t_seq START 9;")
    assert r.success
    assert _one(spark, "SELECT nextval('t_seq') AS v;", "orr") == [[9]]


def test_currval_before_nextval_and_null_args(spark):
    execute_task(spark, "DROP SEQUENCE IF EXISTS t_s5;")
    execute_task(spark, "CREATE SEQUENCE t_s5;")
    bad = execute_task(spark, "SELECT currval('t_s5');")
    assert not bad.success
    assert "sequence is not yet defined in this session" in bad.queries[0].error
    assert _one(spark, "SELECT nextval(NULL) AS a, currval(NULL) AS b;") == [
        [None, None]
    ]
    execute_task(spark, "DROP SEQUENCE t_s5;")


def test_start_beyond_maxvalue_is_parse_error(spark):
    r = execute_task(spark, "CREATE SEQUENCE t_bad START 20 MAXVALUE 10;")
    assert not r.success
    assert (
        "START value (20) cannot be greater than MAXVALUE (10)"
        in r.queries[0].error
    )


def test_insert_with_nextval_ids(spark, seq):
    r = execute_task(
        spark,
        """
        CREATE OR REPLACE TABLE t_seq_rows AS
        SELECT nextval('t_seq') AS id, r AS payload
        FROM (SELECT range AS r FROM range(4)) t;
        SELECT count(*) AS n, count(DISTINCT id) AS d,
               min(id) AS lo, max(id) AS hi FROM t_seq_rows;
        """,
    )
    assert r.success, [q.error for q in r.queries]
    assert r.queries[-1].result_rows == [[4, 4, 1, 4]]
    spark.sql("DROP TABLE IF EXISTS t_seq_rows")


def test_duckdb_sequences_introspection(spark, seq):
    rows = _one(
        spark,
        "SELECT sequence_name, start_value, increment_by, cycle "
        "FROM duckdb_sequences() WHERE sequence_name = 't_seq';",
        "intro",
    )
    assert rows == [["t_seq", 1, 1, False]]


def test_string_literal_mention_is_not_a_call(spark, seq):
    rows = _one(spark, "SELECT 'nextval(''t_seq'')' AS s;", "lit")
    assert rows == [["nextval('t_seq')"]]
    # and the sequence was not advanced by the literal
    assert _one(spark, "SELECT nextval('t_seq') AS v;", "lit2") == [[1]]
