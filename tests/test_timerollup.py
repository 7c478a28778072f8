"""Hypertable rollup cascade: coarse grains from fine-grain partials
must equal direct aggregation of the raw table at every level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.timerollup import rollup_cascade, time_bucket


@pytest.fixture()
def events(spark, sf_dir):
    from shaper_spark.session import register_sf_tables

    register_sf_tables(spark, sf_dir)
    return spark.table("events")


class TestTimeBucket:
    def test_arbitrary_width(self, spark):
        df = spark.sql(
            "SELECT TIMESTAMP '2024-01-01 01:37:45' AS ts"
        ).select(time_bucket(90, "ts").alias("b"))
        assert str(df.first()["b"]) == "2024-01-01 01:37:30"

    def test_invalid_width(self, spark):
        with pytest.raises(ValueError):
            time_bucket(0, "ts")


class TestRollupCascade:
    MEASURES = {
        "n": ("count", "*"),
        "total": ("sum", "value"),
        "vmin": ("min", "value"),
        "vmax": ("max", "value"),
        "vavg": ("avg", "value"),
    }

    def _direct(self, events, width):
        return (
            events.groupBy(
                time_bucket(width, "ts").alias("bucket"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
                F.avg("value").alias("vavg"),
            )
        )

    def test_every_level_matches_direct_aggregation(self, events):
        levels = rollup_cascade(
            events, "ts", [3600, 86400, 7 * 86400], ["event_type"], self.MEASURES
        )
        for width, frame in levels.items():
            got = {
                (str(r["bucket"]), r["event_type"]): (
                    r["n"],
                    round(r["total"], 6),
                    round(r["vavg"], 9),
                )
                for r in frame.collect()
            }
            want = {
                (str(r["bucket"]), r["event_type"]): (
                    r["n"],
                    round(r["total"], 6),
                    round(r["vavg"], 9),
                )
                for r in self._direct(events, width).collect()
            }
            assert got == want, f"width {width} diverged"

    def test_coarse_level_reads_partials_not_raw(self, events):
        levels = rollup_cascade(
            events, "ts", [3600, 86400], ["event_type"], self.MEASURES
        )
        day_plan = levels[86400]._jdf.queryExecution().executedPlan().toString()
        # exactly two aggregation exchanges (hour from raw, day from
        # hour partials) — not a fresh scan+agg of the raw table
        assert day_plan.count("Exchange") <= 3

    def test_non_nesting_widths_rejected(self, events):
        with pytest.raises(ValueError, match="nest"):
            rollup_cascade(events, "ts", [3600, 5000], [], self.MEASURES)

    def test_unsupported_fn_rejected(self, events):
        with pytest.raises(ValueError, match="unsupported fn"):
            rollup_cascade(
                events, "ts", [60], [], {"x": ("median", "value")}
            )
