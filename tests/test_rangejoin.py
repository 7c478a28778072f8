"""Interval (range) join via time-bin blocking — equivalence against
the naive nested-loop formulation, left-join semantics, and the plan
property that motivates the operator (equi-join, no BNLJ)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.rangejoin import interval_join


@pytest.fixture()
def data(spark):
    ts = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    points = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:30:00"), 10.0),
            (2, ts("2024-01-01 05:00:00"), 20.0),
            (3, ts("2024-01-02 12:00:00"), 30.0),
            (4, ts("2024-01-05 00:00:00"), 40.0),  # matches nothing
            (5, ts("2024-01-03 00:00:00"), 50.0),  # boundary == start
        ],
        "event_id long, ts timestamp, value double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")),
            ("b", ts("2024-01-01 04:00:00"), ts("2024-01-03 00:00:00")),  # overlaps a
            ("c", ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59")),
        ],
        "win_id string, win_start timestamp, win_end timestamp",
    )
    return points, intervals


class TestIntervalJoin:
    def _naive(self, points, intervals):
        return points.join(
            intervals,
            (points["ts"] >= intervals["win_start"])
            & (points["ts"] <= intervals["win_end"]),
        )

    @pytest.mark.parametrize("bin_seconds", [60, 3600, 86400, 604800])
    def test_matches_naive_join_at_any_bin_width(self, spark, data, bin_seconds):
        points, intervals = data
        got = {
            (r["event_id"], r["win_id"])
            for r in interval_join(
                points, intervals, "ts", "win_start", "win_end", bin_seconds
            ).collect()
        }
        want = {
            (r["event_id"], r["win_id"])
            for r in self._naive(points, intervals).collect()
        }
        assert got == want
        # overlapping intervals multiply matches; boundaries inclusive
        assert (2, "a") in got and (2, "b") in got
        assert (5, "b") in got
        assert not any(e == 4 for e, _ in got)

    def test_no_duplicate_pairs(self, spark, data):
        points, intervals = data
        out = interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600
        )
        n = out.count()
        assert n == out.dropDuplicates(["event_id", "win_id"]).count()

    def test_left_join_keeps_unmatched_points(self, spark, data):
        points, intervals = data
        out = interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600, how="left"
        )
        rows = {r["event_id"]: r for r in out.collect() if r["win_id"] is None}
        assert set(rows) == {4}
        assert out.count() == self._naive(points, intervals).count() + 1

    def test_plan_is_equi_join_not_bnlj(self, spark, data):
        points, intervals = data
        out = interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        naive = self._naive(points, intervals)
        naive_plan = naive._jdf.queryExecution().executedPlan().toString()
        # the formulation we avoid: Spark plans the raw BETWEEN join as
        # a nested loop (BNLJ or cartesian-with-condition)
        assert (
            "BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan
        )

    def test_left_join_null_and_duplicate_point_rows(self, spark, data):
        """Row identity, not row equality: a matched point row with a
        NULL column must not also be emitted unmatched (NULL != NULL
        under null-unsafe equality), and exact-duplicate point rows must
        each keep their own matched/unmatched row."""
        _, intervals = data
        ts = dt.datetime.fromisoformat
        points = spark.createDataFrame(
            [
                (1, ts("2024-01-01 05:00:00"), None),  # matched a+b, NULL col
                (4, ts("2024-01-05 00:00:00"), None),  # unmatched, NULL col
                (7, ts("2024-01-06 00:00:00"), 70.0),  # unmatched dup ×2
                (7, ts("2024-01-06 00:00:00"), 70.0),
            ],
            "event_id long, ts timestamp, value double",
        )
        out = interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600, how="left"
        ).collect()
        assert "__rj_id" not in interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600, how="left"
        ).columns
        by_event = {}
        for r in out:
            by_event.setdefault(r["event_id"], []).append(r["win_id"])
        # event 1 matched both overlapping intervals a/b — and is NOT
        # also emitted with a NULL win_id
        assert sorted(by_event[1]) == ["a", "b"]
        # unmatched NULL-bearing row appears exactly once
        assert by_event[4] == [None]
        # both duplicate unmatched rows survive
        assert by_event[7] == [None, None]

    def test_inner_matches_naive_with_nulls(self, spark, data):
        _, intervals = data
        ts = dt.datetime.fromisoformat
        points = spark.createDataFrame(
            [
                (1, ts("2024-01-01 00:30:00"), None),
                (1, ts("2024-01-01 00:30:00"), None),  # duplicate
                (3, ts("2024-01-02 12:00:00"), 30.0),
            ],
            "event_id long, ts timestamp, value double",
        )
        got = interval_join(
            points, intervals, "ts", "win_start", "win_end", 3600
        )
        assert "__rj_id" not in got.columns
        pairs = sorted(
            (r["event_id"], r["win_id"]) for r in got.collect()
        )
        want = sorted(
            (r["event_id"], r["win_id"])
            for r in self._naive(points, intervals).collect()
        )
        assert pairs == want

    def test_invalid_args(self, spark, data):
        points, intervals = data
        with pytest.raises(ValueError):
            interval_join(points, intervals, "ts", "win_start", "win_end", 0)
        with pytest.raises(ValueError):
            interval_join(
                points, intervals, "ts", "win_start", "win_end", 60, how="full"
            )
