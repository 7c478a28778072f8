"""SparkSession construction and test-data table registration.

One long-lived session per process (the reference's per-request DuckDB
re-init — server/core/app.go:238-334 — is an anti-pattern on Spark where
session startup costs seconds; dashboard isolation instead uses
``spark.newSession()`` clones sharing the same SparkContext).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "register_sf_tables", "TPCH_TABLES"]

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "shaper_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = str(cpus or os.cpu_count() or 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Shuffle partitions sized to local cores; on a real cluster this
        # would be ~2-3× total executor cores (AQE coalesces the excess).
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # The synthetic test parquet uses TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as int64 nanos and convert in
        # register_sf_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def register_sf_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every parquet table under ``sf_dir`` as a temp view.

    Uses ``spark.read.parquet`` directly — scans stay columnar with
    predicate pushdown and column pruning (verify via
    ``df.explain('formatted')`` → PushedFilters/ReadSchema).
    """
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_parquet(spark, path).createOrReplaceTempView(name)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (read by Spark as int64
    under nanosAsLong)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return []
    out = []
    for field_ in schema:
        t = field_.type
        if str(t).startswith("timestamp[ns"):
            out.append(field_.name)
    return out


def load_parquet(spark: SparkSession, path: str):
    """Read a parquet file, converting nano-timestamp columns back to
    TimestampType (micros). At real scale this conversion would be a
    one-time ETL rewrite; the view-level cast keeps tests exact."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    for col in _nanos_timestamp_columns(path):
        df = df.withColumn(
            col, F.timestamp_micros((F.col(col) / 1000).cast("long"))
        )
    return df
