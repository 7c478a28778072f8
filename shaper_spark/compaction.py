"""Warehouse table compaction — the small-files answer to micro-batch
ingest.

The reference's ingest funnels into a single DuckDB file, so file-count
hygiene is free (``server/ingest/ingest.go`` appends rows, storage is
one database).  A Spark warehouse pays for the same semantics with ONE
PARQUET FILE PER MICRO-BATCH PARTITION: a 2-second ingest cadence
(ingest.py's 3000/2s batching) produces tens of thousands of kilobyte
files per day, and every later scan pays per-file open/footer cost —
the classic small-files problem.  ``compact_table`` rewrites a table
into size-targeted files using the DML module's staging swap (write
staging fully, then INSERT OVERWRITE — never a destructive step before
the expensive one has succeeded), and ``table_file_stats`` is the
monitor that tells a scheduled task when compaction is worth running
(the reference runs maintenance as SQL tasks; so does this — wire
``compact_table`` into a task callback or call it from init-SQL
tooling).

Scale notes: the rewrite is one ``repartition(ceil(bytes/target))``
round-robin shuffle of the table — no skew (round-robin), no driver
materialization (file listings come from the catalog/FS metadata, never
data).  On object stores the same call fixes both file count AND the
tiny-object read-amplification problem.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession

__all__ = ["table_file_stats", "compact_table"]

DEFAULT_TARGET_BYTES = 128 << 20


def _file_size(spark: SparkSession, uri: str) -> int:
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        try:
            return os.path.getsize(parsed.path)
        except OSError:
            return 0
    # non-local filesystems: ask Hadoop
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(conf)
        return fs.getFileStatus(path).getLen()
    except Exception:
        return 0


def table_file_stats(spark: SparkSession, table: str) -> dict:
    """File-level shape of a warehouse table: ``{"n_files", "total_bytes",
    "avg_bytes", "files_under_target"}`` — metadata only (catalog file
    listing + FS stat), no data scan.  The monitor a maintenance task
    polls to decide when ``compact_table`` pays for itself."""
    files = spark.table(table).inputFiles()
    sizes = [_file_size(spark, f) for f in files]
    total = sum(sizes)
    n = len(sizes)
    return {
        "n_files": n,
        "total_bytes": total,
        "avg_bytes": (total // n) if n else 0,
        "files_under_target": sum(
            1 for s in sizes if s < DEFAULT_TARGET_BYTES
        ),
    }


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    force: bool = False,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite ``table`` into ``ceil(total_bytes / target_file_bytes)``
    files (≥1).  Returns a before/after report dict; a table already at
    or below the target file count is left untouched (``compacted``
    False) unless ``force``.

    ``sort_by`` turns the rewrite into a CLUSTERING compaction: rows
    are range-partitioned on the given columns and sorted within each
    file, so parquet row-group min/max statistics become selective and
    later range predicates (time windows, id ranges) skip whole files —
    the linear-order half of what table formats call Z-ordering, and
    the single biggest scan-cost lever for time-series tables at
    warehouse scale.  Without it the rewrite stays a round-robin
    shuffle (size hygiene only, skew-proof by construction).

    Uses the DML staging swap (``dml._swap_in``): the full rewrite
    lands in a staging table first, then INSERT OVERWRITEs the target
    and flushes the analyzed-plan cache — readers never see a partial
    table, and a mid-rewrite failure leaves the target intact."""
    if target_file_bytes <= 0:
        raise ValueError("compact_table: target_file_bytes must be > 0")
    before = table_file_stats(spark, table)
    n_target = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    if before["n_files"] <= n_target and not force and not sort_by:
        return dict(
            before, compacted=False, n_target_files=n_target, after=before
        )
    from pyspark.sql import functions as F

    from .dml import _swap_in

    df = spark.table(table)
    if sort_by:
        cols = [F.col(c) for c in sort_by]
        df = df.repartitionByRange(n_target, *cols).sortWithinPartitions(
            *cols
        )
    else:
        df = df.repartition(n_target)
    _swap_in(spark, table, df)
    after = table_file_stats(spark, table)
    return dict(
        before, compacted=True, n_target_files=n_target, after=after
    )
