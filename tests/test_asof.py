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
