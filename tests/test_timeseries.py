"""Unit + property tests for operators/timeseries.py — rolling
integer-z² anomaly bands, ordered funnel conversion, and cohort
retention (hand-computed fixtures plus hypothesis arms vs pure-Python
references; the engine differential runs via the events_rate_anomaly /
events_funnel_ordered / events_retention_cohorts entries in
tests/oracle_check.py, and the streaming sibling via
test_streaming.TestRateAnomalyStream)."""

from __future__ import annotations

import datetime as dt

import pytest

from shaper_spark.operators.timeseries import (
    event_funnel,
    rolling_anomaly_bands,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _hour(i: int) -> dt.datetime:
    return BASE + dt.timedelta(hours=i)


class TestRollingAnomalyBands:
    def _mk(self, spark, counts):
        rows = []
        for i, c in enumerate(counts):
            rows += [("g", _hour(i)) for _ in range(c)]
        return spark.createDataFrame(rows, "grp string, ts timestamp")

    def test_spike_over_flat_history_flags(self, spark):
        df = self._mk(spark, [10, 10, 10, 10, 100])
        out = rolling_anomaly_bands(
            df, "ts", "grp", window=4, min_periods=2
        ).collect()
        assert [r.n_events for r in out] == [10, 10, 10, 10, 100]
        # rows 0-1: not enough history -> NULL
        assert out[0].is_anomaly is None
        assert out[1].is_anomaly is None
        # rows 2-3: flat history, on-mean value -> not anomalous
        assert out[2].is_anomaly is False
        assert out[3].is_anomaly is False
        # the spike: zero-variance history, any deviation flags
        assert out[4].is_anomaly is True
        assert out[4].hist_n == 4
        assert out[4].hist_mean_micro == 10_000_000

    def test_mild_wiggle_does_not_flag(self, spark):
        df = self._mk(spark, [10, 12, 9, 11, 10, 12])
        out = rolling_anomaly_bands(
            df, "ts", "grp", window=4, min_periods=3
        ).collect()
        flagged = [r.bucket_ts for r in out if r.is_anomaly]
        assert flagged == []

    def test_baseline_excludes_current_bucket(self, spark):
        # history of the spike row must be the 4 PRECEDING buckets
        # only: mean stays 10 even though the current row is 100
        df = self._mk(spark, [10, 10, 10, 10, 100])
        out = rolling_anomaly_bands(
            df, "ts", "grp", window=4, min_periods=2
        ).collect()
        assert out[4].hist_mean_micro == 10_000_000

    def test_validates_params(self, spark):
        df = self._mk(spark, [1])
        with pytest.raises(ValueError):
            rolling_anomaly_bands(df, "ts", "grp", window=1)
        with pytest.raises(ValueError):
            rolling_anomaly_bands(df, "ts", "grp", min_periods=1)


class TestEventFunnel:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            [(u, BASE + dt.timedelta(seconds=s), t) for u, s, t in rows],
            "user_id long, ts timestamp, event_type string",
        )

    def test_ordered_semantics(self, spark):
        df = self._mk(spark, [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
            # u2's only click PRECEDES the view: ordered funnel must
            # NOT count it (the unordered-min funnel would)
            (2, 1, "click"), (2, 2, "view"),
            (3, 1, "view"), (3, 2, "purchase"),  # skips click
        ])
        out = event_funnel(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
        assert [(r.step_idx, r.step, r.n_users) for r in out] == [
            (0, "view", 3), (1, "click", 1), (2, "purchase", 1),
        ]
        assert out[0].conv_from_prev_micro == 1_000_000
        assert out[1].conv_from_prev_micro == 333333  # half-up 1/3
        assert out[2].conv_from_prev_micro == 1_000_000
        assert out[2].conv_from_first_micro == 333333

    def test_same_timestamp_counts(self, spark):
        # at-or-after: a click at exactly the view's timestamp counts
        df = self._mk(spark, [(1, 5, "view"), (1, 5, "click")])
        out = event_funnel(
            df, "user_id", "ts", "event_type", ["view", "click"]
        ).collect()
        assert [r.n_users for r in out] == [1, 1]

    def test_within_seconds_bounds_each_hop(self, spark):
        df = self._mk(spark, [
            (1, 0, "view"), (1, 3, "click"),
            (2, 0, "view"), (2, 60, "click"),
        ])
        out = event_funnel(
            df, "user_id", "ts", "event_type", ["view", "click"],
            within_seconds=5,
        ).collect()
        assert [r.n_users for r in out] == [2, 1]

    def test_greedy_earliest_chains(self, spark):
        # u1: view@0, click@1, purchase@2 BUT also click@10 — greedy
        # takes click@1 so purchase@2 qualifies
        df = self._mk(spark, [
            (1, 0, "view"), (1, 1, "click"), (1, 10, "click"),
            (1, 2, "purchase"),
        ])
        out = event_funnel(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
        assert [r.n_users for r in out] == [1, 1, 1]

    def test_validates_steps(self, spark):
        df = self._mk(spark, [(1, 0, "view")])
        with pytest.raises(ValueError):
            event_funnel(df, "user_id", "ts", "event_type", ["view"])
        with pytest.raises(ValueError):
            event_funnel(
                df, "user_id", "ts", "event_type", ["view", "view"]
            )


class TestRetentionCohorts:
    def _mk(self, spark, rows):
        # BASE (2024-01-01) is a Monday, so week k = BASE + 7k days
        return spark.createDataFrame(
            [(u, BASE + dt.timedelta(days=d), "e") for u, d in rows],
            "user_id long, ts timestamp, event_type string",
        )

    def test_hand_computed_triangle(self, spark):
        from shaper_spark.operators.timeseries import retention_cohorts

        df = self._mk(spark, [
            (1, 0), (1, 7),        # cohort W0, active W0+W1
            (2, 1),                # cohort W0, active W0 only
            (3, 8), (3, 15),       # cohort W1, active W1+W2
        ])
        out = retention_cohorts(df, "user_id", "ts").collect()
        w0 = BASE
        w1 = BASE + dt.timedelta(days=7)
        got = {
            (r.cohort, r.offset): (r.cohort_n, r.active_n, r.retention_micro)
            for r in out
        }
        assert got == {
            (w0, 0): (2, 2, 1_000_000),
            (w0, 1): (2, 1, 500_000),
            (w1, 0): (1, 1, 1_000_000),
            (w1, 1): (1, 1, 1_000_000),
        }

    def test_mid_week_events_truncate_to_same_cohort(self, spark):
        from shaper_spark.operators.timeseries import retention_cohorts

        # events on Tue and Sun of the same week are one bucket
        df = self._mk(spark, [(1, 1), (1, 6)])
        out = retention_cohorts(df, "user_id", "ts").collect()
        assert len(out) == 1 and out[0].offset == 0

    def test_day_grain(self, spark):
        from shaper_spark.operators.timeseries import retention_cohorts

        df = self._mk(spark, [(1, 0), (1, 2)])
        out = retention_cohorts(df, "user_id", "ts", grain="day").collect()
        assert [(r.offset, r.active_n) for r in out] == [(0, 1), (2, 1)]

    def test_validates_grain(self, spark):
        from shaper_spark.operators.timeseries import retention_cohorts

        df = self._mk(spark, [(1, 0)])
        with pytest.raises(ValueError):
            retention_cohorts(df, "user_id", "ts", grain="month")


# ---------------------------------------------------------------------------
# Property tests vs pure-Python references
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_STEPS = ["view", "click", "purchase"]


def _ref_funnel(events, steps):
    cur = {}
    for u, t, et in events:
        if et == steps[0] and (u not in cur or t < cur[u]):
            cur[u] = t
    counts = [len(cur)]
    for s in steps[1:]:
        nxt = {}
        for u, t, et in events:
            if et == s and u in cur and t >= cur[u]:
                if u not in nxt or t < nxt[u]:
                    nxt[u] = t
        cur = nxt
        counts.append(len(cur))
    return counts


class TestFunnelProperties:
    @given(
        st.lists(
            st.tuples(
                st.integers(1, 3),
                st.integers(0, 20),
                st.sampled_from(_STEPS + ["error"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_reference(self, spark, events):
        df = spark.createDataFrame(
            [
                (u, BASE + dt.timedelta(seconds=s), et)
                for u, s, et in events
            ],
            "user_id long, ts timestamp, event_type string",
        )
        out = event_funnel(
            df, "user_id", "ts", "event_type", _STEPS
        ).collect()
        assert [r.n_users for r in out] == _ref_funnel(events, _STEPS)


def _ref_bands(counts, window, min_periods, z2):
    flags = []
    for i, n in enumerate(counts):
        hist = counts[max(0, i - window):i]
        h = len(hist)
        if h < min_periods:
            flags.append(None)
            continue
        s, q = sum(hist), sum(x * x for x in hist)
        flags.append((h * n - s) ** 2 * (h - 1) > z2 * h * (h * q - s * s))
    return flags


class TestAnomalyBandsProperties:
    @given(
        st.lists(st.integers(1, 40), min_size=1, max_size=15),
        st.integers(2, 6),
        st.integers(2, 4),
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_reference(self, spark, counts, window, min_periods):
        rows = []
        for i, c in enumerate(counts):
            rows += [("g", BASE + dt.timedelta(hours=i))] * c
        df = spark.createDataFrame(rows, "grp string, ts timestamp")
        out = rolling_anomaly_bands(
            df, "ts", "grp", window=window, min_periods=min_periods
        ).collect()
        assert [r.is_anomaly for r in out] == _ref_bands(
            counts, window, min_periods, 9
        )
        assert [r.n_events for r in out] == counts


def _ref_retention(events):
    first = {}
    for u, d in events:
        w = (d // 7) * 7
        if u not in first or w < first[u]:
            first[u] = w
    act = {(u, (d // 7) * 7) for u, d in events}
    from collections import Counter

    size = Counter(first.values())
    ret = Counter((first[u], (w - first[u]) // 7) for u, w in act)
    return {
        (cw, off): (size[cw], n) for (cw, off), n in sorted(ret.items())
    }


class TestRetentionProperties:
    @given(
        st.lists(
            st.tuples(st.integers(1, 4), st.integers(0, 27)),
            min_size=1,
            max_size=25,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_reference(self, spark, events):
        from shaper_spark.operators.timeseries import retention_cohorts

        df = spark.createDataFrame(
            [
                (u, BASE + dt.timedelta(days=d), "e")
                for u, d in events
            ],
            "user_id long, ts timestamp, event_type string",
        )
        out = retention_cohorts(df, "user_id", "ts").collect()
        got = {
            (
                (r.cohort - BASE).days,
                r.offset,
            ): (r.cohort_n, r.active_n)
            for r in out
        }
        assert got == _ref_retention(events)
