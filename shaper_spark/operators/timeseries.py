"""Time-series / product-analytics operators over event streams.

The dashboards the reference serves (get_dashboard.go renders
time-bucketed aggregates; §2B rows 7-13) stop at plain grouped counts;
these operators add the readouts a monitoring/growth dashboard is
actually built from — rolling anomaly detection over bucketed event
rates, ordered funnel conversion, and cohort retention — all
engine-proof by construction so they differential-test against any
ANSI engine.

Scale notes (100 TB):
- ``rolling_anomaly_bands``: ONE corpus-scale hash-agg to
  (group, bucket) counts; the rolling window sorts only within each
  group's bucket frame (|buckets| rows per group, e.g. 8760 for a
  year of hours) — never the raw events.
- ``event_funnel``: per-step user-keyed join+agg chain; after the
  first shuffle every step is co-partitioned on the user hash.  The
  per-step count frames are single rows; the conversion window runs
  over ≤|steps| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "rolling_anomaly_bands",
    "anomaly_flags_from_counts",
    "event_funnel",
    "retention_cohorts",
]


def rolling_anomaly_bands(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    grain: str = "hour",
    window: int = 24,
    min_periods: int = 8,
    z2_threshold: int = 9,
) -> DataFrame:
    """Rolling z-score anomaly flags over per-``grain`` event counts —
    the "did error rates spike this hour" readout.  For each (group,
    bucket) the trailing ``window`` buckets (EXCLUDING the current
    one: the anomaly must not contaminate its own baseline) give a
    mean and variance; the bucket is anomalous when z² exceeds
    ``z2_threshold`` (default 9 = |z| > 3).

    Engine-proof by construction: the flag is the cross-multiplied
    INTEGER predicate

        (h·n − S)²·(h−1)  >  z2 · h · (h·Q − S²)

    over h = trailing bucket count, S = Σcounts, Q = Σcounts² — no
    floating-point mean/stddev anywhere, so any ANSI engine replays
    the exact flag set.  (Per-bucket counts beyond ~2·10⁶ with a
    24-bucket window approach BIGINT range in the cubed term; at that
    volume pre-scale the counts — the flag is scale-invariant.)
    ``hist_mean_micro`` is the half-up BIGINT micro mean for display.
    Buckets with no events produce no row and therefore no baseline
    entry; densify with a spine (``date_spine_fill``) first when
    silent-gap detection matters.

    Returns (group, bucket_ts, n_events, hist_n, hist_mean_micro,
    is_anomaly), ordered; is_anomaly is NULL until ``min_periods``
    history exists."""
    if window <= 1 or min_periods < 2:
        raise ValueError(
            "rolling_anomaly_bands: window must be > 1, min_periods >= 2"
        )
    counts = df.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return anomaly_flags_from_counts(
        counts, window, min_periods, z2_threshold
    ).select(
        F.col("grp").alias(group_col),
        "bucket_ts",
        "n_events",
        "hist_n",
        "hist_mean_micro",
        "is_anomaly",
    ).orderBy(group_col, "bucket_ts")


def anomaly_flags_from_counts(
    counts: DataFrame,
    window: int = 24,
    min_periods: int = 8,
    z2_threshold: int = 9,
) -> DataFrame:
    """The scoring half of :func:`rolling_anomaly_bands` over an
    already-bucketed (grp, bucket_ts, n_events) frame — shared with
    the streaming monitor (``streaming.start_rate_anomaly_stream``),
    whose counts table accumulates across micro-batches.  Same
    cross-multiplied BIGINT z² predicate; input column names are the
    contract (grp, bucket_ts, n_events)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bucket_ts")
        .rowsBetween(-window, -1)
    )
    hist = counts.select(
        "grp",
        "bucket_ts",
        F.col("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).over(w).cast("long").alias("__h"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0))
        .cast("long")
        .alias("__s"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        )
        .cast("long")
        .alias("__q"),
    )
    lhs = (
        "(__h * n_events - __s) * (__h * n_events - __s) * (__h - 1)"
    )
    rhs = f"{int(z2_threshold)} * __h * (__h * __q - __s * __s)"
    return hist.select(
        "grp",
        "bucket_ts",
        "n_events",
        F.col("__h").alias("hist_n"),
        F.expr(
            "CASE WHEN __h > 0 THEN "
            "(2 * 1000000 * __s + __h) DIV (2 * __h) END"
        ).alias("hist_mean_micro"),
        F.expr(
            f"CASE WHEN __h >= {int(min_periods)} "
            f"THEN {lhs} > {rhs} END"
        ).alias("is_anomaly"),
    )


def event_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion: how many users performed
    ``steps[0]``, then ``steps[1]`` at-or-after it, then ``steps[2]``
    at-or-after that, … — the canonical product-analytics readout
    (signup → view → purchase).  A user's step-i timestamp is the
    EARLIEST qualifying event at-or-after their step-(i−1) timestamp
    (greedy-earliest; the standard unordered-min funnel overcounts
    whenever a later step precedes the first).  ``within_seconds``
    optionally bounds each hop.

    Returns (step_idx, step, n_users, conv_from_prev_micro,
    conv_from_first_micro), conversions as half-up BIGINT micro with
    step 0 pinned at 1000000.

    Spark shape: per step one user-keyed join + min-agg against the
    previous step's (user, ts) frame — co-partitioned on the user hash
    after the first exchange, never events×events; the per-step count
    rows union into a ≤|steps| frame where a lag/first window computes
    the conversions.  ANSI-replayable as a CTE chain."""
    if len(steps) < 2:
        raise ValueError("event_funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("event_funnel: steps must be distinct")
    from pyspark.sql.window import Window

    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    ).filter(F.col("et").isin(list(steps)))

    cur = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("st"))
    )
    levels = [cur]
    for s in steps[1:]:
        prev = levels[-1].select("u", F.col("st").alias("__pt"))
        cond = F.col("t") >= F.col("__pt")
        if within_seconds is not None:
            cond = cond & (
                F.col("t")
                <= F.col("__pt") + F.expr(
                    f"INTERVAL {int(within_seconds)} SECOND"
                )
            )
        nxt = (
            ev.filter(F.col("et") == s)
            .join(prev, "u")
            .filter(cond)
            .groupBy("u")
            .agg(F.min("t").alias("st"))
        )
        levels.append(nxt)

    count_frames = [
        lvl.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, lvl in enumerate(levels)
    ]
    funnel = count_frames[0]
    for fr in count_frames[1:]:
        funnel = funnel.unionByName(fr)

    w = Window.orderBy("step_idx")
    funnel = funnel.select(
        "step_idx",
        "step",
        "n_users",
        F.lag("n_users").over(w).cast("long").alias("__pn"),
        F.first("n_users")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("__fn"),
    )
    return funnel.select(
        "step_idx",
        "step",
        "n_users",
        F.expr(
            "CASE WHEN step_idx = 0 THEN CAST(1000000 AS BIGINT) ELSE "
            "(2 * 1000000 * n_users + greatest(__pn, CAST(1 AS BIGINT)))"
            " DIV (2 * greatest(__pn, CAST(1 AS BIGINT))) END"
        ).alias("conv_from_prev_micro"),
        F.expr(
            "CASE WHEN step_idx = 0 THEN CAST(1000000 AS BIGINT) ELSE "
            "(2 * 1000000 * n_users + greatest(__fn, CAST(1 AS BIGINT)))"
            " DIV (2 * greatest(__fn, CAST(1 AS BIGINT))) END"
        ).alias("conv_from_first_micro"),
    ).orderBy("step_idx")


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix — users bucketed by the ``grain`` of
    their FIRST event, then per (cohort, offset) the count still
    active that many grains later: the canonical "week-0 100 %,
    week-1 X %" retention triangle every growth dashboard renders.

    Engine-proof: offsets are exact integer day-diffs of
    ``date_trunc``'ed boundaries (week diffs are always multiples of
    7, so the integer division is exact), retention is the half-up
    BIGINT micro share — no floats anywhere.

    Returns (cohort, offset, cohort_n, active_n, retention_micro),
    ordered; the offset-0 row is always 1000000 by construction.

    Spark shape: one user-keyed min-agg (cohort), one corpus-scale
    (user, bucket) distinct, one user-keyed join co-partitioned with
    the distinct's exchange; everything after is bounded by
    |cohorts| × |offsets|.  Nothing is events² and no windows."""
    divisors = {"week": 7, "day": 1}
    if grain not in divisors:
        raise ValueError(
            "retention_cohorts: grain must be 'week' or 'day'"
        )
    div = divisors[grain]
    firstv = df.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc(grain, F.min(ts_col)).alias("cw")
    )
    act = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc(grain, F.col(ts_col)).alias("aw"),
    ).distinct()
    joined = act.join(firstv, "u").select(
        "cw",
        (F.datediff(F.col("aw"), F.col("cw")).cast("long") / F.lit(div))
        .cast("long")
        .alias("offset"),
    )
    ret = joined.groupBy("cw", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_n")
    )
    size = firstv.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_n")
    )
    return (
        ret.join(size, "cw")
        .select(
            F.col("cw").alias("cohort"),
            "offset",
            "cohort_n",
            "active_n",
            F.expr(
                "(2 * 1000000 * active_n + cohort_n) DIV (2 * cohort_n)"
            ).alias("retention_micro"),
        )
        .orderBy("cohort", "offset")
    )
