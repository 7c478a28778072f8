"""As-of join: for each left row, the latest right row at-or-before its
timestamp within the same key — DuckDB's ``ASOF JOIN``
(a dashboard-reachable DuckDB feature; Spark has no native operator).

Spark-first design: union both sides with a side flag, one window pass
per key ordered by (ts, side) carrying the right side's payload forward
with ``last(..., ignorenulls=True)``, then keep left rows. Cost is a
single shuffle on the key — same as the sort-merge an engine-native
as-of join would do, with no Python in the row path. Skewed keys are
handled by AQE; at 100 TB the key (e.g. user id) is high-cardinality so
the window partitions stay small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Left as-of join: all ``left`` columns plus, for each left row, the
    ``right_payload`` columns of the latest ``right`` row with the same
    ``on`` key and ``right_ts`` <= ``left_ts`` (NULLs when none).

    ``tolerance_ms`` bounds the lookback like pandas ``merge_asof``'s
    tolerance: matches older than the window are nulled out.
    """
    lcols = left.columns
    payload = [f"__r_{c}" for c in right_payload]

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_payload, payload)],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(p) for c, p in zip(right_payload, payload)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at equal timestamps, so "at or
    # before" includes exact ties — ASOF JOIN ... ON l.ts >= r.ts.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(p, ignorenulls=True).over(w).alias(f"{p}__c") for p in payload
    ]
    carried_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)

    out = unioned.select(
        "*",
        *carried,
        carried_ts.alias("__match_ts"),
    ).filter(F.col("__side") == 1)

    keep = [F.col(c) for c in lcols]
    if tolerance_ms is None:
        matched = [
            F.col(f"{p}__c").alias(c) for c, p in zip(right_payload, payload)
        ]
    else:
        in_window = (
            F.col("__match_ts").isNotNull()
            & (
                F.col("__ts").cast("double") - F.col("__match_ts").cast("double")
                <= tolerance_ms / 1000.0
            )
        )
        matched = [
            F.when(in_window, F.col(f"{p}__c")).alias(c)
            for c, p in zip(right_payload, payload)
        ]
    return out.select(*keep, *matched)
