"""Exports: streaming CSV / JSON, in-memory XLSX, and the download-query
resolution + variable-replay protocol around them.

Reference behavior being re-expressed (not copied):
  * resolveDownloadQueryID — server/core/stream_query.go:29-65
  * getVarPrefix replay  — server/core/stream_query.go:737-816
  * CSV/JSON streamers   — server/core/stream_query.go:246-397
  * value formatting     — server/core/stream_query.go:653-730
  * XLSX writer/styles   — server/core/stream_query.go:406-651

Scale notes: CSV/JSON use ``df.toLocalIterator()`` so exports stream
row-at-a-time from executors without materializing the result on the
driver — an unbounded export of a 100 TB scan is bounded by one
partition in memory at a time. XLSX is inherently bounded (a workbook
is random-access) and collects.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import json
import math
import re
import uuid as uuid_mod
from decimal import Decimal
from typing import IO, Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from . import sqltool
from .engine import (
    _collect_vars,
    _execute_side_effect,
    _Macro,
    _run_query,
    _VarState,
)
from .render import (
    can_start_section,
    get_render_info,
    is_label,
    is_section_title,
    map_tag,
)

__all__ = [
    "resolve_download_query_id",
    "validate_dashboard_download",
    "replay_var_state",
    "format_value",
    "interval_to_string",
    "stream_csv",
    "stream_json",
    "write_xlsx",
    "stream_dashboard_export",
]

MICROS_PER_DAY = 24 * 3600 * 1_000_000

# Widget/control custom types whose queries are never "the" download query
# (reference stream_query.go:29).
_EXCLUDED_TYPES_RE = re.compile(
    r"\b(LABEL|SECTION|XLINE|YLINE|DROPDOWN|DOWNLOAD_CSV|DOWNLOAD_XLSX|"
    r"DOWNLOAD_JSON|DOWNLOAD_PDF|DATEPICKER|DATEPICKER_FROM|DATEPICKER_TO|"
    r"PLACEHOLDER|INPUT|RELOAD|HEADER_IMAGE|FOOTER_LINK)\b"
)


def resolve_download_query_id(statements: list[str], download_type: str) -> int:
    """Find which statement a csv/xlsx/json download refers to.

    Exactly one ``DOWNLOAD_<TYPE>`` marker → the statement *after* it;
    else exactly one visible (non-side-effect, non-widget) query → that
    statement. Ambiguity or absence raises ValueError."""
    marker = "DOWNLOAD_" + download_type.upper()
    found, count = -1, 0
    for i, s in enumerate(statements):
        if marker in s.upper():
            found, count = i, count + 1
    if count == 1:
        return found + 1

    found, count = -1, 0
    for i, s in enumerate(statements):
        if sqltool.is_side_effect(s):
            continue
        if not _EXCLUDED_TYPES_RE.search(s.upper()):
            found, count = i, count + 1
    if count == 1:
        return found
    if count == 0:
        raise ValueError(
            f"could not find a matching query for {download_type.upper()} download"
        )
    raise ValueError(
        f"found {count} potential queries for {download_type.upper()} download, "
        "please specify which one with query_id"
    )


def replay_var_state(
    spark: SparkSession,
    statements: list[str],
    params: dict[str, Any] | None = None,
    variables: dict[str, Any] | None = None,
    max_rows: int = 3000,
) -> _VarState:
    """Re-execute the statements *before* a download target so its
    variables (dropdown selections, datepickers, SET VARIABLE, …) are in
    place — the reference's getVarPrefix loop."""
    params = params or {}
    vars_ = _VarState(variables)
    macros: dict[str, _Macro] = {}
    next_is_download = False
    hide_next_content_section = False
    for query_index, sql_string in enumerate(statements):
        sql_string = sql_string.strip()
        if not sql_string:
            continue
        if not sqltool.is_allowed_statement(sql_string):
            raise ValueError(f"disallowed SQL statement in query {query_index + 1}")
        if next_is_download:
            next_is_download = False
            continue
        # Queries under an empty SECTION TITLE never run in the
        # reference (get_dashboard.go:443-467) — their variables must
        # not be collected here either.
        if (
            hide_next_content_section
            and not sqltool.is_side_effect(sql_string)
            and not can_start_section(sql_string)
        ):
            continue
        if sqltool.is_side_effect(sql_string):
            _execute_side_effect(spark, sql_string, vars_, macros)
            continue
        columns, rows = _run_query(spark, sql_string, vars_, macros, max_rows)
        if is_label(columns, rows):
            continue
        if is_section_title(columns, rows):
            hide_next_content_section = len(rows) == 0
            continue
        rinfo = get_render_info(columns, rows, "", [])
        if rinfo.download:
            next_is_download = True
        for ci, col in enumerate(columns):
            col.tag = map_tag(ci, rinfo)
        _collect_vars(vars_, rinfo.type, params, columns, rows)
    return vars_


def validate_dashboard_download(
    spark: SparkSession,
    content: str,
    target_dashboard_id: str,
    source_dashboard_id: str = "",
    params: dict[str, Any] | None = None,
    variables: dict[str, Any] | None = None,
) -> bool:
    """Does this dashboard contain a PDF-download button pointing at
    ``target_dashboard_id``? (reference ValidateDashboardDownload,
    get_dashboard.go:402-519 — gates minting download JWTs for other
    dashboards). A DOWNLOAD_PDF with an ``::ID`` column targets that id;
    without one it targets the source dashboard itself."""
    params = params or {}
    vars_ = _VarState(variables)
    macros: dict[str, _Macro] = {}
    next_is_download = False
    hide_next_content_section = False
    clean = sqltool.strip_sql_comments(content)
    for query_index, sql_string in enumerate(sqltool.split_sql_queries(clean)):
        sql_string = sql_string.strip()
        if not sql_string:
            continue
        if not sqltool.is_allowed_statement(sql_string):
            raise ValueError(f"disallowed SQL statement in query {query_index + 1}")
        if next_is_download:
            next_is_download = False
            continue
        # A DOWNLOAD_PDF inside a hidden (empty-SECTION-TITLE) section is
        # never rendered by the reference, so it must not validate as a
        # download target either (get_dashboard.go:443-467).
        if (
            hide_next_content_section
            and not sqltool.is_side_effect(sql_string)
            and not can_start_section(sql_string)
        ):
            continue
        if sqltool.is_side_effect(sql_string):
            _execute_side_effect(spark, sql_string, vars_, macros)
            continue
        columns, rows = _run_query(spark, sql_string, vars_, macros, 3000)
        if is_label(columns, rows):
            continue
        if is_section_title(columns, rows):
            hide_next_content_section = len(rows) == 0
            continue
        rinfo = get_render_info(columns, rows, "", [])
        if rinfo.download == "pdf":
            target = source_dashboard_id
            if rinfo.download_id_index is not None and rows:
                v = rows[0][rinfo.download_id_index]
                target = v if isinstance(v, str) else ""
            if target == target_dashboard_id:
                return True
        if rinfo.download in ("csv", "xlsx", "json"):
            next_is_download = True
        for ci, col in enumerate(columns):
            col.tag = map_tag(ci, rinfo)
        _collect_vars(vars_, rinfo.type, params, columns, rows)
    return False


# ---------------------------------------------------------------------------
# Value formatting (CSV / JSON cell values)
# ---------------------------------------------------------------------------


def interval_to_string(td: dt.timedelta) -> str:
    """``10d 5h 30m 15.068s`` — days plus h/m/s from the sub-day part
    (reference intervalToString, stream_query.go:698-730; the months≈30d
    approximation happens upstream where months exist)."""
    total_micros = round(td.total_seconds() * 1_000_000)
    sign = "-" if total_micros < 0 else ""
    total_micros = abs(total_micros)
    days, rem = divmod(total_micros, MICROS_PER_DAY)
    parts: list[str] = []
    if days:
        parts.append(f"{sign}{days}d")
    hours, rem = divmod(rem, 3600 * 1_000_000)
    if hours:
        parts.append(f"{sign}{hours}h")
    minutes, rem = divmod(rem, 60 * 1_000_000)
    if minutes:
        parts.append(f"{sign}{minutes}m")
    seconds = rem / 1_000_000
    if seconds or not parts:
        parts.append(f"{sign}{seconds:.3f}s")
    return " ".join(parts)


def interval_to_days(td: dt.timedelta) -> float:
    """Interval as fractional days — the XLSX duration representation
    (reference intervalToDays, stream_query.go:688-695)."""
    return td.total_seconds() / 86400.0


def _format_ts(v: dt.datetime) -> str:
    # Go time.Format(time.RFC3339): UTC prints a literal Z.
    if v.tzinfo is None:
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    return v.isoformat()


def format_value(v: Any) -> str:
    """CSV cell representation (reference formatValue,
    stream_query.go:659-686)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        if len(v) == 16:
            return str(uuid_mod.UUID(bytes=v))
        return v.decode("utf-8", errors="replace")
    if isinstance(v, dt.timedelta):
        return interval_to_string(v)
    if isinstance(v, dt.datetime):
        return _format_ts(v)
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return ", ".join(format_value(x) for x in v)
    if isinstance(v, dict):
        return json.dumps({k: json_value(x) for k, x in v.items()})
    if isinstance(v, Decimal):
        return str(float(v))
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return ""
        return repr(v)
    return str(v)


def json_value(v: Any) -> Any:
    """JSON cell representation (reference jsonValue,
    stream_query.go:310-334): native types pass through, engine-specific
    ones are stringified the same way as CSV."""
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return v
    if isinstance(v, bytes):
        return format_value(v)
    if isinstance(v, dt.timedelta):
        return interval_to_string(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return format_value(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (list, tuple)):
        return [json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: json_value(x) for k, x in v.items()}
    return str(v)


# ---------------------------------------------------------------------------
# Streamers
# ---------------------------------------------------------------------------


def stream_csv(df: DataFrame, writer: IO[str]) -> int:
    """Header + rows as CSV, streamed via toLocalIterator (no driver
    materialization, no row cap). Returns row count."""
    w = csv.writer(writer, lineterminator="\n")
    w.writerow(df.columns)
    n = 0
    for row in df.toLocalIterator():
        w.writerow([format_value(v) for v in row])
        n += 1
    return n


def stream_json(df: DataFrame, writer: IO[str]) -> int:
    """``[{col: val}, …]`` streamed row-at-a-time. Returns row count."""
    cols = df.columns
    writer.write("[")
    n = 0
    for row in df.toLocalIterator():
        if n:
            writer.write(",")
        json.dump(
            {c: json_value(v) for c, v in zip(cols, row)},
            writer,
            ensure_ascii=False,
        )
        writer.write("\n")
        n += 1
    writer.write("]")
    return n


def write_xlsx(df: DataFrame, out: IO[bytes] | str, sheet_name: str = "Sheet1") -> int:
    """Styled XLSX: bold centered header, frozen header row, autofilter,
    m/d/yy h:mm datetimes, [h]:mm:ss intervals (stored as fractional
    days), fitted column widths (reference stream_query.go:406-651).

    Uses openpyxl when available; otherwise falls back to the built-in
    stdlib SpreadsheetML writer (shaper_spark.xlsx) with the same
    styling."""
    try:
        from openpyxl import Workbook
        from openpyxl.styles import Alignment, Font
        from openpyxl.utils import get_column_letter
    except ImportError:
        return _write_xlsx_stdlib(df, out, sheet_name)

    wb = Workbook(write_only=False)
    ws = wb.active
    ws.title = sheet_name

    cols = df.columns
    header_font = Font(bold=True)
    header_align = Alignment(horizontal="center", vertical="center")
    widths = [len(c) for c in cols]
    for j, c in enumerate(cols, start=1):
        cell = ws.cell(row=1, column=j, value=c)
        cell.font = header_font
        cell.alignment = header_align

    n = 0
    for row in df.toLocalIterator():
        n += 1
        for j, v in enumerate(row, start=1):
            cell = ws.cell(row=n + 1, column=j)
            if v is None:
                continue
            if isinstance(v, dt.timedelta):
                cell.value = interval_to_days(v)
                cell.number_format = "[h]:mm:ss"
                cell.alignment = Alignment(horizontal="center")
                text_len = 8
            elif isinstance(v, dt.datetime):
                cell.value = v.replace(tzinfo=None)
                cell.number_format = "m/d/yy h:mm"
                cell.alignment = Alignment(horizontal="center")
                text_len = 14
            elif isinstance(v, bool):
                cell.value = v
                text_len = 5
            elif isinstance(v, (int, float, Decimal)):
                if isinstance(v, Decimal):
                    v = float(v)
                if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                    continue
                cell.value = v
                cell.alignment = Alignment(horizontal="right")
                text_len = len(str(v))
            else:
                s = format_value(v)
                cell.value = s
                cell.alignment = Alignment(horizontal="left", wrap_text=True)
                text_len = len(s)
            if text_len > widths[j - 1]:
                widths[j - 1] = text_len
    for j, width in enumerate(widths, start=1):
        ws.column_dimensions[get_column_letter(j)].width = min(width + 2, 60)
    ws.auto_filter.ref = f"A1:{get_column_letter(len(cols))}{n + 1}"
    ws.freeze_panes = "A2"

    if isinstance(out, str):
        wb.save(out)
    else:
        buf = io.BytesIO()
        wb.save(buf)
        out.write(buf.getvalue())
    return n


def _write_xlsx_stdlib(
    df: DataFrame, out: IO[bytes] | str, sheet_name: str = "Sheet1"
) -> int:
    """openpyxl-free XLSX path (shaper_spark.xlsx MiniWorkbook)."""
    from .xlsx import (
        DATETIME_STYLE,
        DURATION_STYLE,
        HEADER_STYLE,
        NUMBER_STYLE,
        TEXT_STYLE,
        MiniWorkbook,
    )

    wb = MiniWorkbook(sheet_name)
    cols = df.columns
    widths = [len(c) for c in cols]
    wb.add_row([(c, HEADER_STYLE) for c in cols])
    n = 0
    for row in df.toLocalIterator():
        n += 1
        cells: list[tuple[Any, int]] = []
        for j, v in enumerate(row):
            if v is None:
                cells.append((None, 0))
                continue
            if isinstance(v, dt.timedelta):
                cells.append((interval_to_days(v), DURATION_STYLE))
                text_len = 8
            elif isinstance(v, dt.datetime):
                cells.append((v, DATETIME_STYLE))
                text_len = 14
            elif isinstance(v, bool):
                cells.append((v, 0))
                text_len = 5
            elif isinstance(v, (int, float, Decimal)):
                if isinstance(v, Decimal):
                    v = float(v)
                if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                    cells.append((None, 0))
                    continue
                cells.append((v, NUMBER_STYLE))
                text_len = len(str(v))
            else:
                s = format_value(v)
                cells.append((s, TEXT_STYLE))
                text_len = len(s)
            if text_len > widths[j]:
                widths[j] = text_len
        wb.add_row(cells)
    wb.widths = [min(w + 2, 60) for w in widths]
    wb.save(out)
    return n


# ---------------------------------------------------------------------------
# Dashboard-level export entry point
# ---------------------------------------------------------------------------


def stream_dashboard_export(
    spark: SparkSession,
    content: str,
    fmt: str,
    writer: IO[Any],
    query_id: int = -1,
    params: dict[str, Any] | None = None,
    variables: dict[str, Any] | None = None,
) -> int:
    """Export one query of a dashboard script as csv/json/xlsx: split the
    script, resolve the target statement, replay preceding statements for
    variables, then stream. Returns row count."""
    from .rewrite import rewrite_statement

    clean = sqltool.strip_sql_comments(content)
    statements = sqltool.split_sql_queries(clean)
    if query_id == -1:
        query_id = resolve_download_query_id(statements, fmt)
    if not 0 <= query_id < len(statements):
        raise ValueError(f"no query for query index {query_id}")
    target = statements[query_id]
    if not sqltool.is_allowed_statement(target):
        raise ValueError(f"disallowed SQL statement in query {query_id + 1}")

    vars_ = replay_var_state(spark, statements[:query_id], params, variables)
    rewritten = rewrite_statement(vars_.substitute(target)).sql
    df = spark.sql(rewritten)
    if fmt == "csv":
        return stream_csv(df, writer)
    if fmt == "json":
        return stream_json(df, writer)
    if fmt == "xlsx":
        return write_xlsx(df, writer)
    raise ValueError(f"unsupported export format: {fmt}")
