"""The dashboard custom type system, re-expressed for Spark.

The reference defines 61 DuckDB UNION types (reference:
server/core/custom_types.go:17-84) whose only job is to carry a *render
tag* through the query into the result metadata while behaving like their
member type in expressions. Spark has no UNION type and no CREATE TYPE, so
here a cast to a custom type is removed from the SQL by the dialect
rewriter (see rewrite.py) and recorded as a column tag. The per-row union
member (e.g. xaxis_time vs xaxis_timestamp) is resolved statically from the
Spark type of the cast operand — see member_for_spark_type().
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "CUSTOM_TYPES",
    "CUSTOM_TYPE_NAMES",
    "CustomType",
    "member_for_spark_type",
]


@dataclass(frozen=True)
class CustomType:
    name: str
    # Allowed member kinds in priority order. Kinds are Spark-ish:
    # varchar, timestamp, timestamptz, time, date, double, interval,
    # interval_list, double_list, varchar_list.
    members: tuple[str, ...]
    # The reference's "result type" bucket used by render inference.
    result_type: str


def _ct(name: str, members: tuple[str, ...], result_type: str) -> CustomType:
    return CustomType(name, members, result_type)


_AXIS = ("varchar", "timestamp", "timestamptz", "time", "double", "interval")

# Mirrors server/core/custom_types.go:22-83 (names, member sets, result
# buckets — the data, not the Go code).
CUSTOM_TYPES: dict[str, CustomType] = {
    t.name: t
    for t in [
        _ct("LABEL", ("varchar",), "string"),
        _ct("XAXIS", _AXIS, "axis"),
        _ct("YAXIS", _AXIS, "axis"),
        _ct("XLINE", _AXIS, "axis"),
        _ct("YLINE", ("timestamp", "timestamptz", "time", "double", "interval"), "axis"),
        _ct("LINECHART", ("interval", "double"), "chart"),
        _ct("LINECHART_PERCENT", ("double",), "percent"),
        _ct("LINECHART_CATEGORY", ("varchar",), "string"),
        _ct("SCATTERPLOT", ("interval", "double"), "chart"),
        _ct("SCATTERPLOT_PERCENT", ("double",), "percent"),
        _ct("SCATTERPLOT_CATEGORY", ("varchar",), "string"),
        _ct("BARCHART", ("interval", "double"), "chart"),
        _ct("BARCHART_PERCENT", ("double",), "percent"),
        _ct("BARCHART_STACKED", ("interval", "double"), "chart"),
        _ct("BARCHART_STACKED_PERCENT", ("double",), "percent"),
        _ct("BARCHART_PERCENT_STACKED", ("double",), "percent"),  # alias
        _ct("BARCHART_CATEGORY", ("varchar",), "string"),
        _ct("CATEGORY", ("varchar",), "string"),
        _ct("DROPDOWN", ("varchar",), "string"),
        _ct("DROPDOWN_MULTI", ("varchar",), "string"),
        _ct("HINT", ("varchar",), "string"),
        _ct("SECTION", ("varchar",), "string"),
        _ct("DOWNLOAD_CSV", ("varchar",), "string"),
        _ct("DOWNLOAD_XLSX", ("varchar",), "string"),
        _ct("DOWNLOAD_JSON", ("varchar",), "string"),
        _ct("DOWNLOAD_PDF", ("varchar",), "string"),
        _ct("DATEPICKER", ("date", "timestamp", "timestamptz"), "date"),
        _ct("DATEPICKER_FROM", ("date", "timestamp", "timestamptz"), "date"),
        _ct("DATEPICKER_TO", ("date", "timestamp", "timestamptz"), "date"),
        _ct("COMPARE", ("double", "interval"), "chart"),
        _ct("TREND", ("double",), "number"),
        _ct("PLACEHOLDER", ("varchar",), "string"),
        _ct("INPUT", ("varchar",), "string"),
        _ct("PERCENT", ("double",), "percent"),
        _ct("RELOAD", ("timestamp", "timestamptz", "interval"), "timestamp"),
        _ct("SCHEDULE", ("timestamp", "timestamptz", "interval", "varchar"), "timestamp"),
        _ct("SCHEDULE_ALL", ("timestamp", "timestamptz", "interval", "varchar"), "timestamp"),
        _ct("GAUGE", ("interval", "double"), "chart"),
        _ct("GAUGE_PERCENT", ("double",), "percent"),
        _ct("PIECHART", ("double",), "chart"),
        _ct("PIECHART_PERCENT", ("double",), "percent"),
        _ct("PIECHART_CATEGORY", ("varchar",), "string"),
        _ct("PIECHART_COLOR", ("varchar",), "string"),
        _ct("DONUTCHART", ("double",), "chart"),
        _ct("DONUTCHART_PERCENT", ("double",), "percent"),
        _ct("DONUTCHART_CATEGORY", ("varchar",), "string"),
        _ct("RANGE", ("interval_list", "double_list"), "array"),
        _ct("LABELS", ("varchar_list",), "array"),
        _ct("COLORS", ("varchar_list",), "array"),
        _ct("COLOR", ("varchar",), "string"),
        _ct("LINECHART_COLOR", ("varchar",), "string"),
        _ct("BARCHART_COLOR", ("varchar",), "string"),
        _ct("SCATTERPLOT_COLOR", ("varchar",), "string"),
        _ct("HEADER_IMAGE", ("varchar",), "string"),
        _ct("FOOTER_LINK", ("varchar",), "string"),
        _ct("ID", ("varchar",), "string"),
        _ct("TEXT_SMALL", ("varchar",), "string"),
        _ct("TEXT_MEDIUM", ("varchar",), "string"),
        _ct("TEXT_LARGE", ("varchar",), "string"),
        _ct("BAND_LOWER", ("interval", "double"), "chart"),
        _ct("BAND_UPPER", ("interval", "double"), "chart"),
    ]
}

CUSTOM_TYPE_NAMES = frozenset(CUSTOM_TYPES)


def member_for_spark_type(custom_type: str, spark_type_name: str) -> str:
    """Resolve the union member kind for a cast operand's Spark type.

    ``spark_type_name`` is a Spark simpleString (e.g. ``timestamp``,
    ``double``, ``string``). The reference resolves the member per row from
    DuckDB union tags (server/core/get_dashboard.go:1480-1505); here the
    member is static per column because Spark columns are mono-typed.
    """
    ct = CUSTOM_TYPES[custom_type.upper()]
    s = spark_type_name.lower()
    if s.startswith("decimal") or s in (
        "double", "float", "int", "bigint", "smallint", "tinyint", "long",
        "integer",
    ):
        kind = "double"
    elif s.startswith("timestamp_ntz"):
        kind = "timestamp"
    elif s.startswith("timestamp"):
        kind = "timestamptz" if "timestamptz" in ct.members else "timestamp"
    elif s == "date":
        kind = "date" if "date" in ct.members else "timestamp"
    elif s.startswith("interval"):
        kind = "interval"
    elif s.startswith("array<string"):
        kind = "varchar_list"
    elif s.startswith("array"):
        kind = "double_list"
    else:
        kind = "varchar"
    if kind in ct.members:
        return kind
    # Fall back in the type's member priority order (mirrors DuckDB's
    # implicit union cast choosing the first compatible member).
    return ct.members[0]
