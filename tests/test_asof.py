"""As-of join operator tests (semantics: DuckDB ASOF JOIN — latest right
row at-or-before each left row per key)."""

from __future__ import annotations

import datetime as dt

from shaper_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _build(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 11:00:00")),
            (4, "u3", _ts("2024-01-01 09:00:00")),  # no right rows for u3
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), "a"),
            ("u1", _ts("2024-01-01 10:00:00"), "b"),  # exact tie with left id=1
            ("u1", _ts("2024-01-01 11:30:00"), "c"),
            ("u2", _ts("2024-01-01 10:59:00"), "d"),
            ("u2", _ts("2024-01-01 11:01:00"), "e"),  # after left id=3
        ],
        "user string, rts timestamp, tag string",
    )
    return left, right


class TestAsofJoin:
    def test_basic_at_or_before(self, spark):
        left, right = _build(spark)
        out = asof_join(left, right, "user", "ts", "rts", ["tag"])
        got = {r["id"]: r["tag"] for r in out.collect()}
        assert got[1] == "b"  # exact timestamp tie matches
        assert got[2] == "c"  # latest before 12:00
        assert got[3] == "d"  # 11:01 row excluded (after left ts)
        assert got[4] is None  # no right rows for the key

    def test_left_columns_preserved(self, spark):
        left, right = _build(spark)
        out = asof_join(left, right, "user", "ts", "rts", ["tag"])
        assert out.columns == ["id", "user", "ts", "tag"]
        assert out.count() == 4

    def test_tolerance_window(self, spark):
        left, right = _build(spark)
        out = asof_join(
            left, right, "user", "ts", "rts", ["tag"], tolerance_ms=60 * 60 * 1000
        )
        got = {r["id"]: r["tag"] for r in out.collect()}
        assert got[1] == "b"  # 0ms back
        assert got[2] == "c"  # 30min back, inside 1h
        assert got[3] == "d"  # 1min back
        # id=4 still None
        assert got[4] is None

    def test_tolerance_excludes_stale(self, spark):
        left, right = _build(spark)
        out = asof_join(
            left, right, "user", "ts", "rts", ["tag"], tolerance_ms=10 * 60 * 1000
        )
        got = {r["id"]: r["tag"] for r in out.collect()}
        assert got[1] == "b"  # tie: 0 back
        assert got[2] is None  # 30min back > 10min tolerance


class TestAsofQuadraticGuard:
    """engine._asof_quadratic_guard: the ASOF JOIN SQL compatibility
    rewrite runs an O(left × right) nested-loop plan (rewrite.py
    _rewrite_asof_join docstring: 125 s at 60k×60k where DuckDB's
    native ASOF takes 34 ms); the guard refuses it when BOTH inputs
    exceed the limit and points at the linear operator."""

    GUARD_SQL = """
    WITH l AS (SELECT range AS k, range AS t FROM range(200)),
         r AS (SELECT range AS k, range AS t FROM range(200))
    SELECT count(*) AS n FROM l ASOF JOIN r ON l.k = r.k AND l.t >= r.t;
    """

    def test_large_both_sides_errors_with_pointer(self, spark):
        import pytest

        from shaper_spark.engine import DashboardError, query_dashboard

        with pytest.raises(DashboardError) as exc:
            query_dashboard(
                spark,
                "SET VARIABLE asof_guard_limit = 50;" + self.GUARD_SQL,
            )
        msg = str(exc.value)
        assert "operators/asof.py" in msg  # the linear-path pointer
        assert "asof_guard_limit" in msg  # the override knob

    def test_one_small_side_passes(self, spark):
        from shaper_spark.engine import query_dashboard

        sql = """
        SET VARIABLE asof_guard_limit = 50;
        WITH l AS (SELECT range AS k, range AS t FROM range(200)),
             r AS (SELECT range AS k, range AS t FROM range(10))
        SELECT count(*) AS n FROM l ASOF JOIN r ON l.k = r.k AND l.t >= r.t;
        """
        r = query_dashboard(spark, sql)
        # inner ASOF: only the 10 left keys with a right match survive
        assert r.sections[0].queries[0].rows[0][0] == 10

    def test_guard_disabled_runs(self, spark):
        from shaper_spark.engine import query_dashboard

        r = query_dashboard(
            spark, "SET VARIABLE asof_guard_limit = 0;" + self.GUARD_SQL
        )
        assert r.sections[0].queries[0].rows[0][0] == 200

    def test_default_limit_allows_small_inputs(self, spark):
        from shaper_spark.engine import query_dashboard

        r = query_dashboard(spark, self.GUARD_SQL)
        assert r.sections[0].queries[0].rows[0][0] == 200
