"""Schema introspection: the reference's GetSchema tree
(databases → schemas → tables(columns, comment) / views(definition) /
enums) re-expressed over the Spark catalog.

Reference: server/core/duckdb_schema.go:10-360 (duckdb_databases()/
schemas()/tables()/columns()/views()/types() table functions) and the
ignore-list filter (duckdb_schema.go:346-360).

Spark mapping: catalog → database level, namespace → schema level,
``spark.catalog.listTables/listColumns`` for the leaves, ``SHOW CREATE
TABLE`` for view definitions. Enums/constraints/secrets have no Spark
catalog notion — returned as empty lists so the response shape is
stable for API consumers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

__all__ = ["get_schema", "should_ignore", "SchemaResponse"]


@dataclass
class ColumnInfo:
    name: str
    type: str
    nullable: bool = True
    default: str | None = None
    comment: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "type": self.type,
            "nullable": self.nullable,
            "default": self.default,
            "comment": self.comment,
        }


@dataclass
class TableInfo:
    name: str
    columns: list[ColumnInfo] = field(default_factory=list)
    constraints: list[dict[str, Any]] = field(default_factory=list)
    comment: str = ""
    is_temporary: bool = False

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "columns": [c.to_dict() for c in self.columns],
            "constraints": self.constraints,
            "comment": self.comment,
            "isTemporary": self.is_temporary,
        }


@dataclass
class ViewInfo:
    name: str
    definition: str = ""
    comment: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "definition": self.definition,
            "comment": self.comment,
        }


@dataclass
class SchemaInfo:
    name: str
    tables: list[TableInfo] = field(default_factory=list)
    views: list[ViewInfo] = field(default_factory=list)
    enums: list[dict[str, Any]] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "tables": [t.to_dict() for t in self.tables],
            "views": [v.to_dict() for v in self.views],
            "enums": self.enums,
        }


@dataclass
class DatabaseInfo:
    name: str
    schemas: list[SchemaInfo] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {"name": self.name, "schemas": [s.to_dict() for s in self.schemas]}


@dataclass
class SchemaResponse:
    databases: list[DatabaseInfo] = field(default_factory=list)
    extensions: list[dict[str, Any]] = field(default_factory=list)
    secrets: list[dict[str, Any]] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "databases": [d.to_dict() for d in self.databases],
            "extensions": self.extensions,
            "secrets": self.secrets,
        }


def should_ignore(
    database: str, schema: str, obj: str, ignore_list: list[str] | None
) -> bool:
    """Dot-path prefix filter (duckdb_schema.go:346-360): ``db``,
    ``db.schema``, or ``db.schema.object``."""
    for entry in ignore_list or []:
        parts = entry.split(".")
        if len(parts) == 1 and database == parts[0]:
            return True
        if len(parts) == 2 and schema and database == parts[0] and schema == parts[1]:
            return True
        if (
            len(parts) == 3
            and obj
            and database == parts[0]
            and schema == parts[1]
            and obj == parts[2]
        ):
            return True
    return False


def _view_definition(spark: SparkSession, qualified: str, temporary: bool) -> str:
    if not temporary:
        try:
            row = spark.sql(f"SHOW CREATE TABLE {qualified}").collect()
            return row[0][0] if row else ""
        except Exception:
            return ""
    # Temp views store a plan, not SQL text (SHOW CREATE TABLE refuses
    # them) — the analyzed plan is the faithful "definition".
    try:
        return str(spark.table(qualified)._jdf.queryExecution().analyzed())
    except Exception:
        return ""


def get_schema(
    spark: SparkSession,
    ignore: list[str] | None = None,
    include_temporary: bool = True,
) -> SchemaResponse:
    """Build the full catalog tree. Scale note: this is metadata-only —
    ``listTables``/``listColumns`` hit the catalog, never the data."""
    res = SchemaResponse()
    catalog_name = spark.catalog.currentCatalog()
    db = DatabaseInfo(name=catalog_name)
    if should_ignore(catalog_name, "", "", ignore):
        res.databases = []
        return res

    current_db = spark.catalog.currentDatabase()
    for ns in spark.catalog.listDatabases():
        if should_ignore(catalog_name, ns.name, "", ignore):
            continue
        schema = SchemaInfo(name=ns.name)
        if ns.name == current_db:
            # emulated ENUM types (enums.py registry; the reference
            # fills the same per-schema list from duckdb_types() +
            # enum_range — duckdb_schema.go:124-161)
            from .enums import list_enums

            schema.enums = [
                {"name": n, "values": vs}
                for n, vs in list_enums(spark).items()
            ]
        for t in spark.catalog.listTables(ns.name):
            if should_ignore(catalog_name, ns.name, t.name, ignore):
                continue
            if t.isTemporary:
                # Temp views are session-global: listTables returns them
                # for EVERY database. Attribute them once, to the current
                # database, so they don't multiply across namespaces.
                if not include_temporary or ns.name != current_db:
                    continue
            qualified = (
                t.name if t.isTemporary else f"`{ns.name}`.`{t.name}`"
            )
            try:
                cols = spark.catalog.listColumns(t.name, None if t.isTemporary else ns.name)
            except Exception:
                cols = []
            col_infos = [
                ColumnInfo(
                    name=c.name,
                    type=c.dataType,
                    nullable=c.nullable,
                    comment=c.description or "",
                )
                for c in cols
            ]
            if t.tableType in ("VIEW", "TEMPORARY"):
                schema.views.append(
                    ViewInfo(
                        name=t.name,
                        definition=_view_definition(spark, qualified, t.isTemporary),
                        comment=t.description or "",
                    )
                )
                # temp views also surface as tables so dashboards listing
                # "what can I query" see one flat namespace, mirroring the
                # reference where query_table() accepts both
                schema.tables.append(
                    TableInfo(
                        name=t.name,
                        columns=col_infos,
                        comment=t.description or "",
                        is_temporary=t.isTemporary,
                    )
                )
            else:
                schema.tables.append(
                    TableInfo(
                        name=t.name,
                        columns=col_infos,
                        comment=t.description or "",
                        is_temporary=t.isTemporary,
                    )
                )
        db.schemas.append(schema)
    res.databases.append(db)
    # live secret/extension surface (reference duckdb_schema.go:38-87
    # fills the same two lists; redacted projection only)
    from .secrets import list_secrets

    res.secrets = [
        {"name": n, "type": t, "provider": p, "scope": s.split(";") if s else []}
        for n, t, p, s in list_secrets()
    ]
    res.extensions = [
        {"name": ds, "description": f"core {ds} data source"}
        for ds in ("parquet", "json", "csv", "orc", "text", "jdbc")
    ]
    return res
