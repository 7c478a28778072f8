"""Range (interval) join: match point events to time intervals without
a nested-loop join.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so
Spark plans BroadcastNestedLoopJoin (or a cartesian) — O(|L|·|R|) and
a broadcast of one whole side. The scalable formulation is time-bin
blocking, the same trick big-data interval joins use everywhere: pick a
bin width ≥ 0, explode each interval into the bins it overlaps, bin the
point side once, equi-join on the bin, then re-check the exact
predicate. Work scales with Σ (events per bin × intervals per bin) —
a shuffle join on the bin key, skew-safe via AQE.

Bin width trades duplication for selectivity: intervals spanning many
bins produce that many posting rows (deduped by the exact predicate —
each (event, interval) pair matches in exactly the event's bin, so no
distinct is needed). Pick the width near the median interval length.

Reference has no interval operator (DuckDB executes such joins with its
IEJoin); this is the Spark-native equivalent for the 100 TB regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where
    ``start_col <= point_ts <= end_col``.

    Returns all columns of both inputs. ``how`` supports "inner" and
    "left" (points without a containing interval keep NULL interval
    columns). Column name collisions must be resolved by the caller.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    bin_s = int(bin_seconds)
    if bin_s <= 0:
        raise ValueError("interval_join: bin_seconds must be positive")

    p_bin = (F.unix_timestamp(F.col(point_ts)) / bin_s).cast("bigint")
    s_bin = (F.unix_timestamp(F.col(start_col)) / bin_s).cast("bigint")
    e_bin = (F.unix_timestamp(F.col(end_col)) / bin_s).cast("bigint")

    # Surrogate row id so the LEFT path can identify unmatched points by
    # identity, not row equality: NULL-bearing rows never equal
    # themselves under null-unsafe equality, and exact-duplicate rows
    # must each keep their own matched/unmatched status. The id is
    # (partition << 33 | offset) — stable across the two subtrees
    # because the scan's partition layout is deterministic.
    p0 = points.withColumn("__rj_id", F.monotonically_increasing_id())
    p = p0.withColumn("__bin", p_bin)
    # One posting row per bin the interval overlaps. sequence() here is
    # a native (codegen'd) generator, not a lambda HOF.
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(s_bin, e_bin))
    )
    cond = [
        p["__bin"] == iv["__bin"],
        p[point_ts] >= iv[start_col],
        p[point_ts] <= iv[end_col],
    ]
    joined = p.join(iv, cond, "inner").drop("__bin")
    if how == "inner":
        return joined.drop("__rj_id")
    # LEFT: events in empty bins never reach the equi-join, so recover
    # unmatched points with an anti-join on the surrogate id and null
    # interval columns.
    matched_ids = joined.select(p["__rj_id"])
    unmatched = p0.join(matched_ids, on="__rj_id", how="left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return joined.unionByName(unmatched).drop("__rj_id")
