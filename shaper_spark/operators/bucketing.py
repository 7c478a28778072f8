"""Bucketed-table helpers: pre-shuffle data once at write time so
repeated joins/aggregations on the bucket key run shuffle-free.

The 100 TB play: fact tables are written ``bucketBy(key)`` once during
ingestion/compaction; every subsequent join or aggregation on that key
reads co-located buckets and Catalyst drops the Exchange entirely.
``assert_no_shuffle_join`` makes that property testable so it can't
silently regress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_plan_has_no_shuffle"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_plan_has_no_shuffle(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """True when joining the two bucketed tables on ``on`` produces a
    physical plan without a shuffle Exchange (hash repartition).

    Broadcast is disabled for the check — a broadcast join would mask
    the property being verified (bucket co-location), and at real scale
    neither side of a fact-fact join broadcasts."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(left_table).join(spark.table(right_table), on)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange hashpartitioning" not in plan
