"""ATTACH / DETACH — external data as a Spark catalog database.

The reference attaches external DuckDB/postgres databases so queries
can address ``db.table`` across sources (tasks may ATTACH/DETACH
freely, ``server/core/sql_validation.go:247-249``; memory-mode treats
ATTACH as a side-effect statement, ``sql_validation.go:64-68``). The
Spark-native mapping: ``ATTACH '<path>' AS name`` creates a catalog
database ``name`` holding one view per parquet table found at the
path, so ``name.table`` works in any subsequent query with full
predicate pushdown (views inline into the scan).

Supported paths: a directory containing ``<table>.parquet`` files or
directories, or a single ``.parquet`` file (one table named after the
file stem). Native ``.duckdb``/``.sqlite`` files have no in-process
Spark reader; when the ``duckdb``/``sqlite3`` Python modules are
available the file's tables are exported once to a temporary parquet
directory and attached as views — the same materialization shape the
reference's snapshot path uses (``EXPORT DATABASE ... (FORMAT
parquet)``, ``server/snapshots/snapshots.go:233``). Without the
module, the statement errors with the cluster-native pointer: expose
the engine over JDBC and ``ATTACH 'jdbc:...'`` (JDBCTableCatalog).

DETACH drops the database. Views carry no data, so the external files
are never touched — matching DuckDB detach semantics.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from .session import _nanos_timestamp_columns

__all__ = ["try_execute_attach"]

_ATTACH_RE = re.compile(
    r"^\s*ATTACH\s+(?:DATABASE\s+)?(?P<ine>IF\s+NOT\s+EXISTS\s+)?'([^']+)'"
    r"\s+AS\s+(`[^`]+`|[A-Za-z_]\w*)"
    r"\s*(?:\(\s*READ_?ONLY\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_DETACH_RE = re.compile(
    r"^\s*DETACH\s+(?:DATABASE\s+)?(?P<ie>IF\s+EXISTS\s+)?"
    r"(`[^`]+`|[A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)

# Databases created by try_execute_attach.  Spark databases live in the
# metastore shared by every newSession(), so one process-wide registry.
# DETACH only disconnects catalogs this module attached — a DETACH naming
# a regular Spark database (typo/collision) must error, not CASCADE-drop
# managed tables; likewise ATTACH refuses to merge into an existing
# un-attached database (DuckDB errors on duplicate catalog names).
# Values record the attach kind ("views" or "jdbc") and, for native-file
# attaches, the temporary parquet export directory DETACH must remove.
_ATTACHED: dict[str, tuple[str, str | None]] = {}

# JDBC scheme → driver class, for the ``ATTACH 'jdbc:...' AS name``
# extension seam. The reference attaches any DuckDB-readable database
# (sql_validation.go:64-68,247-249); the Spark-native equivalent for
# other engines is a JDBCTableCatalog entry, which needs the engine's
# driver jar on the classpath (spark.jars / --jars).
_JDBC_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
    "duckdb": "org.duckdb.DuckDBDriver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle": "oracle.jdbc.OracleDriver",
}


def _jdbc_driver_available(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def _attach_jdbc(spark: SparkSession, url: str, name: str) -> None:
    """Register ``name`` as a Spark JDBCTableCatalog over ``url`` so
    ``name.schema.table`` resolves through the remote engine with
    predicate pushdown. Errors helpfully when the driver jar is absent
    instead of failing later at first table resolution."""
    scheme = url.split(":", 2)[1].lower() if url.count(":") >= 2 else ""
    driver = _JDBC_DRIVERS.get(scheme)
    if driver is None or not _jdbc_driver_available(spark, driver):
        hint = driver or "<engine JDBC driver>"
        raise ValueError(
            f"ATTACH: JDBC driver for {scheme or url!r} ({hint}) is not on "
            "the classpath; start the session with the driver jar "
            "(spark.jars=/path/to/driver.jar or --jars) and re-run ATTACH"
        )
    prefix = f"spark.sql.catalog.{name}"
    spark.conf.set(
        prefix,
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(f"{prefix}.url", url)
    spark.conf.set(f"{prefix}.driver", driver)


def _detach_jdbc(spark: SparkSession, name: str) -> None:
    prefix = f"spark.sql.catalog.{name}"
    for key in (prefix, f"{prefix}.url", f"{prefix}.driver"):
        try:
            spark.conf.unset(key)
        except Exception:
            pass


def _export_duckdb(path: str, out_dir: str) -> dict[str, str]:
    """Export every main-schema table/view of a DuckDB file to
    ``out_dir/<table>.parquet``; returns table → parquet path."""
    import duckdb

    con = duckdb.connect(path, read_only=True)
    try:
        names = [
            r[0]
            for r in con.execute(
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_schema = 'main' "
                "AND table_type IN ('BASE TABLE', 'VIEW') ORDER BY 1"
            ).fetchall()
        ]
        out = {}
        for t in names:
            dest = os.path.join(out_dir, f"{t}.parquet")
            q = t.replace('"', '""')
            d = dest.replace("'", "''")
            con.execute(
                f'COPY (SELECT * FROM "{q}") TO \'{d}\' (FORMAT parquet)'
            )
            out[t] = dest
        return out
    finally:
        con.close()


def _export_sqlite(path: str, out_dir: str) -> dict[str, str]:
    """Export every table of a SQLite file to parquet via Arrow. A
    single-file SQLite database is inherently single-node data, so the
    driver-side pass-through mirrors what any reader must do."""
    import sqlite3

    import pyarrow as pa
    import pyarrow.parquet as pq

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        names = [
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type IN "
                "('table', 'view') AND name NOT LIKE 'sqlite_%' ORDER BY 1"
            )
        ]
        out = {}
        for t in names:
            q = t.replace('"', '""')
            cur = con.execute(f'SELECT * FROM "{q}"')
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            table = pa.table(
                {c: [r[i] for r in rows] for i, c in enumerate(cols)}
            )
            dest = os.path.join(out_dir, f"{t}.parquet")
            pq.write_table(table, dest)
            out[t] = dest
        return out
    finally:
        con.close()


def _export_native(path: str, name: str) -> tuple[dict[str, str], str]:
    """Materialize a native .duckdb/.sqlite file as parquet in a fresh
    temp dir. ``.db`` is tried as DuckDB first, then SQLite (both
    engines use the extension in the wild)."""
    import shutil
    import tempfile

    lower = path.lower()
    attempts = (
        [_export_duckdb, _export_sqlite]
        if lower.endswith((".db", ".duckdb"))
        else [_export_sqlite, _export_duckdb]
    )
    out_dir = tempfile.mkdtemp(prefix=f"shaper_attach_{name}_")
    errors = []
    for exporter in attempts:
        try:
            tables = exporter(path, out_dir)
            if tables:
                return tables, out_dir
            errors.append(f"{exporter.__name__}: no tables")
        except ImportError as exc:
            errors.append(f"{exporter.__name__}: module missing ({exc})")
        except Exception as exc:  # wrong format / corrupt file
            errors.append(f"{exporter.__name__}: {exc}")
    shutil.rmtree(out_dir, ignore_errors=True)
    raise ValueError(
        f"ATTACH: could not read {path!r} in-process "
        f"({'; '.join(errors)}); alternatively expose the engine over "
        "JDBC and ATTACH 'jdbc:<engine>://...' with its driver jar on "
        "the classpath"
    )


def _table_paths(path: str) -> dict[str, str]:
    """Map table name → parquet path for an attach target."""
    if os.path.isfile(path) or path.endswith(".parquet") and os.path.exists(path):
        stem = os.path.basename(path)
        if stem.endswith(".parquet"):
            stem = stem[: -len(".parquet")]
        return {stem: path}
    if os.path.isdir(path):
        out = {}
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                out[entry[: -len(".parquet")]] = os.path.join(path, entry)
        return out
    return {}


def _view_sql(db: str, table: str, path: str) -> str:
    """A view over the parquet file; nano-timestamp columns convert to
    micros exactly like session.load_parquet (integer div — a float
    intermediate would lose the last microsecond digit)."""
    nanos = set(_nanos_timestamp_columns(path))
    if not nanos:
        select = "*"
    else:
        import pyarrow.parquet as pq

        names = pq.read_schema(path).names
        parts = [
            f"timestamp_micros(`{c}` div 1000) AS `{c}`" if c in nanos else f"`{c}`"
            for c in names
        ]
        select = ", ".join(parts)
    return (
        f"CREATE OR REPLACE VIEW `{db}`.`{table}` AS "
        f"SELECT {select} FROM parquet.`{path}`"
    )


def try_execute_attach(spark: SparkSession, sql_string: str) -> bool:
    """Execute ATTACH/DETACH; return True if the statement was one."""
    m = _ATTACH_RE.match(sql_string)
    if m:
        path, name = m.group(2), m.group(3).strip("`")
        if spark.catalog.databaseExists(name) and name not in _ATTACHED:
            if m.group("ine"):
                return True
            raise ValueError(
                f"ATTACH: database {name!r} already exists and was not "
                "created by ATTACH; pick another alias or DROP it first"
            )
        lower = path.lower()
        if lower.startswith("jdbc:"):
            _attach_jdbc(spark, path, name)
            _ATTACHED[name] = ("jdbc", None)
            return True
        tmpdir = None
        if lower.endswith((".db", ".duckdb", ".sqlite", ".sqlite3")):
            if not os.path.exists(path):
                raise ValueError(f"ATTACH: {path!r} does not exist")
            tables, tmpdir = _export_native(path, name)
        else:
            tables = _table_paths(path)
        if not tables:
            raise ValueError(f"ATTACH: no parquet tables found at {path!r}")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
        for table, tpath in tables.items():
            spark.sql(_view_sql(name, table, tpath))
        _ATTACHED[name] = ("views", tmpdir)
        return True
    m = _DETACH_RE.match(sql_string)
    if m:
        name = m.group(2).strip("`")
        if name not in _ATTACHED:
            if m.group("ie"):
                return True
            raise ValueError(
                f"DETACH: {name!r} is not an attached database"
            )
        kind, tmpdir = _ATTACHED[name]
        if kind == "jdbc":
            _detach_jdbc(spark, name)
        else:
            spark.sql(f"DROP DATABASE IF EXISTS `{name}` CASCADE")
        if tmpdir:
            import shutil

            shutil.rmtree(tmpdir, ignore_errors=True)
        _ATTACHED.pop(name, None)
        return True
    return False
