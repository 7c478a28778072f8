"""HLL sketch rollups: mergeability and error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.sketches import hll_merge, hll_rollup


@pytest.fixture(scope="module")
def users(spark):
    # 4000 distinct users spread over 10 days, many repeats
    rows = [
        (f"d{(i * 7) % 10}", f"u{i % 4000}") for i in range(20_000)
    ]
    return spark.createDataFrame(rows, ["day", "user"])


def test_estimate_within_hll_error(users):
    daily = hll_rollup(users, "user", ["day"])
    total = hll_merge(daily, []).collect()[0]["approx_distinct"]
    assert abs(total - 4000) / 4000 < 0.05  # lg_k=12 ~1.6% rse


def test_union_of_partials_equals_direct_sketch(users):
    # the re-aggregability contract: merging per-day sketches gives the
    # same estimate as sketching the whole column in one pass
    via_rollup = hll_merge(hll_rollup(users, "user", ["day"]), []).collect()[
        0
    ]["approx_distinct"]
    direct = users.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user"), F.lit(12))
        ).alias("d")
    ).collect()[0]["d"]
    assert via_rollup == direct


def test_partial_merge_to_intermediate_grain(users):
    with_week = users.withColumn(
        "week", F.when(F.col("day").isin("d0", "d1", "d2", "d3", "d4"), "w0")
        .otherwise("w1")
    )
    daily = hll_rollup(with_week, "user", ["week", "day"])
    weekly = hll_merge(daily, ["week"])
    rows = {r["week"]: r["approx_distinct"] for r in weekly.collect()}
    assert set(rows) == {"w0", "w1"}
    exact = {
        r["week"]: r["n"]
        for r in with_week.groupBy("week")
        .agg(F.countDistinct("user").alias("n"))
        .collect()
    }
    for w in exact:
        assert abs(rows[w] - exact[w]) / exact[w] < 0.05


def test_sketches_are_compact(users):
    daily = hll_rollup(users, "user", ["day"], lg_k=12)
    sizes = daily.select(F.octet_length("hll").alias("b")).collect()
    assert all(r["b"] <= 6000 for r in sizes)  # ~4KiB + header


class TestExactHeavyHitters:
    def test_equals_naive_groupby(self, spark):
        import random

        from shaper_spark.operators.sketches import exact_heavy_hitters

        rnd = random.Random(3)
        # zipf-ish: few hot values + long tail
        vals = (
            ["hot_a"] * 400 + ["hot_b"] * 250 + ["warm"] * 60
            + [f"tail{i}" for i in range(800)]
        )
        rnd.shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(7)
        got = [
            (r["value"], r["n"])
            for r in exact_heavy_hitters(df, "x", min_frac=0.02, sketch_k=64).collect()
        ]
        from collections import Counter

        c = Counter(vals)
        want = sorted(
            ((v, n) for v, n in c.items() if n > len(vals) * 0.02),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == want
        assert [v for v, _ in got] == ["hot_a", "hot_b", "warm"]

    def test_partitioning_invariance(self, spark):
        from shaper_spark.operators.sketches import exact_heavy_hitters

        vals = ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(200)]
        df1 = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(2)
        df2 = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(13)
        r1 = [tuple(r) for r in exact_heavy_hitters(df1, "x", 0.05, 32).collect()]
        r2 = [tuple(r) for r in exact_heavy_hitters(df2, "x", 0.05, 32).collect()]
        assert r1 == r2 != []

    def test_guard_on_threshold_below_guarantee(self, spark):
        from shaper_spark.operators.sketches import exact_heavy_hitters

        df = spark.createDataFrame([("a",)], ["x"])
        with pytest.raises(ValueError):
            exact_heavy_hitters(df, "x", min_frac=0.0001, sketch_k=100)


class TestHeavyHittersBothPaths:
    """The size-gated fast path and the MG sketch path must agree
    exactly (the gate changes the plan, never the output)."""

    def test_sketch_path_equals_fast_path(self, spark):
        from shaper_spark.operators.sketches import exact_heavy_hitters

        vals = (["hot"] * 40 + ["warm"] * 25 + [f"cold{i}" for i in range(35)])
        df = spark.createDataFrame([(v,) for v in vals], "x string")
        fast = [tuple(r) for r in
                exact_heavy_hitters(df, "x", 0.05, 32).collect()]
        sketch = [tuple(r) for r in
                  exact_heavy_hitters(df, "x", 0.05, 32,
                                      small_input_bytes=0).collect()]
        assert fast == sketch
        assert fast[0] == ("hot", 40)

    def test_fast_path_matches_sketch_path_on_nullable_ints(self, spark):
        """The size-gated fast path must share the sketch path's
        normalized source (cast to string, NULLs dropped): NULLs never
        form a countable group or inflate the total, and the value
        column is string on both paths (r9 ADVICE)."""
        from shaper_spark.operators import sketches as sk

        vals = [7] * 40 + [9] * 25 + [None] * 30 + list(range(100, 160))
        df = spark.createDataFrame([(v,) for v in vals], "x int")
        fast = sk.exact_heavy_hitters(df, "x", min_frac=0.1, sketch_k=32)
        assert [f.dataType.simpleString() for f in fast.schema.fields] == [
            "string",
            "bigint",
        ]
        got_fast = [tuple(r) for r in fast.collect()]
        # force the sketch path by making the size gate reject
        slow = sk.exact_heavy_hitters(
            df, "x", min_frac=0.1, sketch_k=32, small_input_bytes=0
        )
        got_slow = [tuple(r) for r in slow.collect()]
        assert got_fast == got_slow
        # 30 NULLs out of 125 rows: with NULLs dropped the total is 95,
        # so 9 (25 hits) clears the 10% bar; with NULLs counted it would
        # also appear as a heavy value — assert it does not
        assert ("9", 25) in got_fast
        assert all(v is not None for v, _ in got_fast)
