"""Snapshots: export/restore every catalog table as parquet.

The reference snapshots DuckDB with ``EXPORT DATABASE '<s3>' (FORMAT
parquet, COMPRESSION zstd)`` and restores on boot
(server/snapshots/snapshots.go:199,233, restore.go). Parquet-per-table
is already Spark's native layout, so the port is a thin walk over the
catalog; pointing ``target`` at an object store path is the same call
on a cluster.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession

__all__ = ["export_database", "restore_database"]

_MANIFEST = "_shaper_manifest.json"


def export_database(
    spark: SparkSession,
    target: str,
    database: str | None = None,
    compression: str = "zstd",
) -> list[str]:
    """Write every (non-temporary) table of ``database`` to
    ``target/<table>/`` as parquet. Returns exported table names."""
    db = database or spark.catalog.currentDatabase()
    os.makedirs(target, exist_ok=True)
    exported: list[str] = []
    for t in spark.catalog.listTables(db):
        if t.isTemporary or t.tableType == "VIEW":
            continue
        spark.table(f"`{db}`.`{t.name}`").write.mode("overwrite").option(
            "compression", compression
        ).parquet(os.path.join(target, t.name))
        exported.append(t.name)
    manifest: dict[str, Any] = {"database": db, "tables": exported}
    with open(os.path.join(target, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return exported


def restore_database(
    spark: SparkSession,
    source: str,
    database: str | None = None,
    overwrite: bool = False,
) -> list[str]:
    """Recreate the exported tables from ``source`` (boot-time restore).
    Returns restored table names."""
    with open(os.path.join(source, _MANIFEST)) as f:
        manifest = json.load(f)
    db = database or manifest["database"]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    restored: list[str] = []
    for name in manifest["tables"]:
        qualified = f"`{db}`.`{name}`"
        if spark.catalog.tableExists(qualified):
            if not overwrite:
                continue
            spark.sql(f"DROP TABLE {qualified}")
        df = spark.read.parquet(os.path.join(source, name))
        df.write.saveAsTable(qualified)
        restored.append(name)
    from .plancache import bump

    bump()  # restored tables invalidate memoized analyzed plans
    return restored
