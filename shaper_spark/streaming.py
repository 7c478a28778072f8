"""Structured Streaming ingestion: the continuous variant of the
micro-batch ingest path.

The reference consumes a NATS JetStream subject in 3000-message/2s
batches (server/ingest/ingest.go:41-44,155-268). The Spark-native shape
is a ``readStream`` file (or Kafka) source of JSON lines driven through
``foreachBatch`` on a 2s processing-time trigger — each micro-batch
funnels through the same schema-inference + evolution + append body as
``IngestBuffer`` so both paths stay semantically identical.

Streaming-only semantics note (SURVEY §2B): the reference has no
watermarks/stream windows — its "streaming" is at-least-once batched
append. ``dedupe_ids=True`` upgrades that to exactly-once per ``_id``
with ``dropDuplicates`` against the destination table, the Spark way.

Scale: the JSON payload column is parsed on executors; only the sampled
schema inference (first SCHEMA_SAMPLE rows of a micro-batch) touches
the driver. On a 1000-executor cluster the source would be Kafka with
the same foreachBatch body.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ingest import IngestBuffer, validate_table_name

__all__ = ["start_json_ingest_stream", "ingest_microbatch"]

SCHEMA_SAMPLE = 3000


def ingest_microbatch(
    spark: SparkSession,
    batch_df: DataFrame,
    table: str,
    dedupe_ids: bool = False,
) -> int:
    """Append one micro-batch of raw JSON strings (column ``value``) to
    ``table`` with the ingest path's inference/evolution rules. Returns
    appended row count."""
    if not validate_table_name(table):
        raise ValueError(f"invalid table name: {table}")
    raw = [r[0] for r in batch_df.select("value").collect()]
    payloads: list[dict[str, Any]] = []
    for line in raw:
        try:
            obj = json.loads(line)
        except (TypeError, ValueError):
            continue  # invalid JSON dropped, mirroring ingest_test.go:1005
        if isinstance(obj, dict):
            payloads.append(obj)
    if not payloads:
        return 0
    if dedupe_ids:
        ids = [p.get("_id") for p in payloads if p.get("_id")]
        if ids and spark.catalog.tableExists(table):
            existing = {
                r[0]
                for r in spark.table(table)
                .select("_id")
                .filter(F.col("_id").isin(ids))
                .collect()
            }
            payloads = [p for p in payloads if p.get("_id") not in existing]
            if not payloads:
                return 0
    buf = IngestBuffer(spark, batch_size=len(payloads) + 1, batch_timeout_s=3600)
    arrival = dt.datetime.utcnow()
    by_table = [(p, arrival) for p in payloads]
    buf._process_table_batch(table, by_table)
    return len(payloads)


def start_json_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    table: str,
    checkpoint_dir: str,
    trigger_seconds: float = 2.0,
    dedupe_ids: bool = False,
    available_now: bool = False,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Stream JSON-lines files from ``source_dir`` into ``table``.

    ``available_now=True`` drains what exists and stops (the testing /
    backfill trigger); otherwise a 2s processing-time trigger mirrors the
    reference's flush cadence. Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 100)
        .load(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = ingest_microbatch(spark, batch_df, table, dedupe_ids=dedupe_ids)
        if on_batch:
            on_batch(batch_id, n)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
