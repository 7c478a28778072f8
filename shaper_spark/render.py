"""Render-type inference: the priority cascade that decides how a query
result is displayed, driven by custom-type column tags.

Behavior parity with reference server/core/get_dashboard.go:874-1347
(getRenderInfo), :535-608 (mapTag), :710-785 (tag finders / label /
section / placeholder detection). Operates on driver-side metadata only —
no Spark calls — so inference cost is independent of data size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any

__all__ = [
    "Column",
    "RenderInfo",
    "MarkLine",
    "GaugeCategory",
    "get_render_info",
    "map_tag",
    "find_column_by_tag",
    "is_label",
    "is_section_title",
    "is_reload",
    "is_header_image",
    "is_footer_link",
    "can_start_section",
    "interval_to_ms",
]


@dataclass
class Column:
    name: str
    type: str = ""  # wire type (filled by normalize)
    nullable: bool = True
    tag: str = ""  # render role tag (filled by map_tag)
    custom_type: str | None = None  # e.g. "XAXIS" (from the rewriter)
    spark_type: str = ""  # Spark simpleString of the result column


@dataclass
class MarkLine:
    value: Any = None
    label: str = ""
    is_yaxis: bool = False

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"value": self.value, "isYaxis": self.is_yaxis}
        if self.label:
            d["label"] = self.label
        return d


@dataclass
class GaugeCategory:
    from_: float
    to: float
    label: str = ""
    color: str = ""

    def to_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"from": self.from_, "to": self.to}
        if self.label:
            d["label"] = self.label
        if self.color:
            d["color"] = self.color
        return d


@dataclass
class RenderInfo:
    type: str = "table"
    label: str | None = None
    index_axis_index: int | None = None
    value_axis_index: int | None = None
    category_index: int | None = None
    color_index: int | None = None
    band_lower_index: int | None = None
    band_upper_index: int | None = None
    value_index: int | None = None
    label_index: int | None = None
    hint_index: int | None = None
    from_index: int | None = None
    to_index: int | None = None
    compare_index: int | None = None
    trend_index: list[int] = field(default_factory=list)
    download: str = ""
    download_id_index: int | None = None
    value_size: str = ""
    gauge_categories: list[GaugeCategory] = field(default_factory=list)
    mark_lines: list[MarkLine] = field(default_factory=list)


def interval_to_ms(v: Any) -> int:
    """Interval → milliseconds with the reference's months≈30d convention
    (server/core/get_dashboard.go:2095-2101)."""
    if isinstance(v, timedelta):
        return int(v.total_seconds() * 1000)
    if isinstance(v, int):  # year-month interval arrives as months
        return v * 30 * 24 * 60 * 60 * 1000
    raise TypeError(f"not an interval: {v!r}")


def find_column_by_tag(columns: list[Column], tag: str) -> int:
    for i, c in enumerate(columns):
        if c.custom_type == tag:
            return i
    return -1


def find_all_columns_by_tag(columns: list[Column], tag: str) -> list[int]:
    return [i for i, c in enumerate(columns) if c.custom_type == tag]


def _find_first(columns: list[Column], *tags: str) -> int:
    for t in tags:
        i = find_column_by_tag(columns, t)
        if i != -1:
            return i
    return -1


def find_boxplot_column_index(columns: list[Column]) -> int:
    """Boxplot columns are structs with the macro's field shape
    (reference detects by struct type name, get_dashboard.go:749-756)."""
    for i, c in enumerate(columns):
        s = c.spark_type.replace(" ", "").lower()
        if s.startswith("struct<max:") and "q1:" in s and "outliers:" in s:
            return i
    return -1


def is_label(columns: list[Column], rows: list) -> bool:
    return (
        find_column_by_tag(columns, "LABEL") != -1
        and len(rows) == 1
        and len(rows[0]) == 1
    )


def is_section_title(columns: list[Column], rows: list) -> bool:
    if find_column_by_tag(columns, "SECTION") == -1:
        return False
    return len(rows) == 0 or (len(rows) == 1 and len(rows[0]) == 1)


def is_placeholder(columns: list[Column], rows: list) -> bool:
    return (
        find_column_by_tag(columns, "PLACEHOLDER") != -1
        and len(rows) == 1
        and len(rows[0]) == 1
    )


def is_reload(columns: list[Column], rows: list) -> bool:
    if find_column_by_tag(columns, "RELOAD") == -1:
        return False
    return len(rows) == 0 or (len(rows) == 1 and len(rows[0]) == 1)


def is_header_image(columns: list[Column], rows: list) -> bool:
    return (
        find_column_by_tag(columns, "HEADER_IMAGE") != -1
        and len(rows) == 1
        and len(rows[0]) == 1
    )


def is_footer_link(columns: list[Column], rows: list) -> bool:
    return (
        find_column_by_tag(columns, "FOOTER_LINK") != -1
        and len(rows) == 1
        and len(rows[0]) == 1
    )


def can_start_section(sql: str) -> bool:
    upper = sql.upper()
    return any(
        kw in upper
        for kw in ("SECTION", "DROPDOWN", "DATEPICKER", "DOWNLOAD_", "INPUT")
    )


def get_download_type(columns: list[Column]) -> str:
    for tag, kind in (
        ("DOWNLOAD_CSV", "csv"),
        ("DOWNLOAD_XLSX", "xlsx"),
        ("DOWNLOAD_JSON", "json"),
        ("DOWNLOAD_PDF", "pdf"),
    ):
        if find_column_by_tag(columns, tag) != -1:
            return kind
    return ""


def _gauge_categories(columns: list[Column], rows: list, gauge_idx: int,
                      is_percent: bool) -> list[GaugeCategory]:
    row = rows[0]

    def as_ms_or_float(v: Any) -> float:
        from decimal import Decimal

        if isinstance(v, (int, float, Decimal)) and not isinstance(v, bool):
            return float(v)
        return float(interval_to_ms(v))

    range_idx = find_column_by_tag(columns, "RANGE")
    range_arr: list[Any] = []
    if range_idx != -1 and row[range_idx] is not None:
        range_arr = list(row[range_idx])

    unique = set()
    ok_types = True
    for v in range_arr:
        try:
            unique.add(as_ms_or_float(v))
        except TypeError:
            ok_types = False
            break
    if len(unique) < 2 or not ok_types:
        gauge_value = 0.0
        is_interval = False
        single_value = None
        if len(range_arr) == 1:
            try:
                single_value = as_ms_or_float(range_arr[0])
            except TypeError:
                single_value = None
        from decimal import Decimal

        gv = row[gauge_idx]
        if isinstance(gv, (int, float, Decimal)) and not isinstance(gv, bool):
            gauge_value = float(gv)
        elif isinstance(gv, timedelta):
            is_interval = True
        if single_value is not None and single_value > 0 and gauge_value >= 0:
            range_arr = [0.0, single_value]
        elif is_interval:
            range_arr = [0.0, float(60 * 60 * 1000)]
        elif is_percent and 0 <= gauge_value <= 1:
            range_arr = [0.0, 1.0]
        else:
            abs_value = abs(gauge_value)
            next_power = 10.0
            if abs_value > 0:
                next_power = math.pow(10, math.ceil(math.log10(abs_value)))
            if gauge_value < 0:
                range_arr = [-next_power, next_power]
            elif gauge_value > 0:
                range_arr = [0.0, next_power]
            else:
                range_arr = [0.0, 10.0]

    labels_idx = find_column_by_tag(columns, "LABELS")
    labels = list(row[labels_idx]) if labels_idx != -1 and row[labels_idx] else []
    colors_idx = find_column_by_tag(columns, "COLORS")
    colors = list(row[colors_idx]) if colors_idx != -1 and row[colors_idx] else []

    cats: list[GaugeCategory] = []
    frm = as_ms_or_float(range_arr[0])
    for i in range(1, len(range_arr)):
        to = as_ms_or_float(range_arr[i])
        g = GaugeCategory(from_=frm, to=to)
        if len(labels) >= i and isinstance(labels[i - 1], str):
            g.label = labels[i - 1]
        if len(colors) >= i and isinstance(colors[i - 1], str):
            g.color = colors[i - 1]
        cats.append(g)
        frm = to
    return cats


def get_render_info(
    columns: list[Column],
    rows: list,
    label: str = "",
    mark_lines: list[MarkLine] | None = None,
) -> RenderInfo:
    """Priority cascade: linechart → scatterplot → barchart (H / stacked /
    V) → dropdown(s) → datepicker(s) → download button → placeholder →
    gauge → pie/donut → boxplot → input → single value → table."""
    mark_lines = mark_lines or []
    label_value = label if label else None

    xaxis_idx = find_column_by_tag(columns, "XAXIS")

    line_idx = _find_first(columns, "LINECHART", "LINECHART_PERCENT")
    if line_idx != -1 and xaxis_idx != -1:
        r = RenderInfo(
            type="linechart", label=label_value,
            index_axis_index=xaxis_idx, value_axis_index=line_idx,
            mark_lines=mark_lines,
        )
        i = _find_first(columns, "LINECHART_CATEGORY", "CATEGORY")
        if i != -1:
            r.category_index = i
        i = _find_first(columns, "LINECHART_COLOR", "COLOR")
        if i != -1:
            r.color_index = i
        i = find_column_by_tag(columns, "BAND_LOWER")
        if i != -1:
            r.band_lower_index = i
        i = find_column_by_tag(columns, "BAND_UPPER")
        if i != -1:
            r.band_upper_index = i
        return r

    scatter_idx = _find_first(columns, "SCATTERPLOT", "SCATTERPLOT_PERCENT")
    if scatter_idx != -1 and xaxis_idx != -1:
        r = RenderInfo(
            type="scatterplot", label=label_value,
            index_axis_index=xaxis_idx, value_axis_index=scatter_idx,
            mark_lines=mark_lines,
        )
        i = _find_first(columns, "SCATTERPLOT_CATEGORY", "CATEGORY")
        if i != -1:
            r.category_index = i
        i = _find_first(columns, "SCATTERPLOT_COLOR", "COLOR")
        if i != -1:
            r.color_index = i
        return r

    bar_idx = _find_first(columns, "BARCHART", "BARCHART_PERCENT")
    bar_cat_idx = _find_first(columns, "BARCHART_CATEGORY", "CATEGORY")
    bar_color_idx = _find_first(columns, "BARCHART_COLOR", "COLOR")
    if bar_idx != -1 and xaxis_idx != -1:
        r = RenderInfo(
            type="barchartHorizontal", label=label_value,
            index_axis_index=xaxis_idx, value_axis_index=bar_idx,
            mark_lines=mark_lines,
        )
        if bar_cat_idx != -1:
            r.category_index = bar_cat_idx
        if bar_color_idx != -1:
            r.color_index = bar_color_idx
        return r

    bar_stacked_idx = _find_first(
        columns, "BARCHART_STACKED", "BARCHART_STACKED_PERCENT",
        "BARCHART_PERCENT_STACKED",
    )
    if bar_stacked_idx != -1 and xaxis_idx != -1:
        r = RenderInfo(
            type="barchartHorizontalStacked", label=label_value,
            index_axis_index=xaxis_idx, value_axis_index=bar_stacked_idx,
            mark_lines=mark_lines,
        )
        if bar_cat_idx != -1:
            r.category_index = bar_cat_idx
        if bar_color_idx != -1:
            r.color_index = bar_color_idx
        return r

    yaxis_idx = find_column_by_tag(columns, "YAXIS")
    if bar_idx != -1 and yaxis_idx != -1:
        r = RenderInfo(
            type="barchartVertical", label=label_value,
            index_axis_index=yaxis_idx, value_axis_index=bar_idx,
            mark_lines=mark_lines,
        )
        if bar_cat_idx != -1:
            r.category_index = bar_cat_idx
        if bar_color_idx != -1:
            r.color_index = bar_color_idx
        return r
    if bar_stacked_idx != -1 and yaxis_idx != -1:
        r = RenderInfo(
            type="barchartVerticalStacked", label=label_value,
            index_axis_index=yaxis_idx, value_axis_index=bar_stacked_idx,
            mark_lines=mark_lines,
        )
        if bar_cat_idx != -1:
            r.category_index = bar_cat_idx
        if bar_color_idx != -1:
            r.color_index = bar_color_idx
        return r

    i = find_column_by_tag(columns, "DROPDOWN")
    if i != -1:
        r = RenderInfo(type="dropdown", label=label_value, value_index=i)
        j = find_column_by_tag(columns, "LABEL")
        if j != -1:
            r.label_index = j
        return r

    i = find_column_by_tag(columns, "DROPDOWN_MULTI")
    if i != -1:
        r = RenderInfo(type="dropdownMulti", label=label_value, value_index=i)
        j = find_column_by_tag(columns, "LABEL")
        if j != -1:
            r.label_index = j
        j = find_column_by_tag(columns, "HINT")
        if j != -1:
            r.hint_index = j
        return r

    i = find_column_by_tag(columns, "DATEPICKER")
    if i != -1:
        return RenderInfo(type="datepicker", label=label_value, value_index=i)

    from_idx = find_column_by_tag(columns, "DATEPICKER_FROM")
    to_idx = find_column_by_tag(columns, "DATEPICKER_TO")
    if from_idx != -1 and to_idx != -1:
        return RenderInfo(
            type="daterangePicker", label=label_value,
            from_index=from_idx, to_index=to_idx,
        )

    download_type = get_download_type(columns)
    if download_type:
        r = RenderInfo(type="button", label=label_value, download=download_type)
        if download_type == "pdf":
            j = find_column_by_tag(columns, "ID")
            if j != -1:
                r.download_id_index = j
        return r

    if is_placeholder(columns, rows):
        return RenderInfo(type="placeholder", label=label_value)

    gauge_idx = find_column_by_tag(columns, "GAUGE")
    is_gauge_percent = False
    if gauge_idx == -1:
        gauge_idx = find_column_by_tag(columns, "GAUGE_PERCENT")
        is_gauge_percent = True
    if gauge_idx != -1 and len(rows) == 1:
        return RenderInfo(
            type="gauge", label=label_value, value_axis_index=gauge_idx,
            gauge_categories=_gauge_categories(
                columns, rows, gauge_idx, is_gauge_percent
            ),
        )

    pie_idx = _find_first(columns, "PIECHART", "PIECHART_PERCENT")
    is_donut = False
    if pie_idx == -1:
        pie_idx = _find_first(columns, "DONUTCHART", "DONUTCHART_PERCENT")
        is_donut = pie_idx != -1
    if pie_idx != -1:
        r = RenderInfo(
            type="donutchart" if is_donut else "piechart",
            label=label_value, value_axis_index=pie_idx,
        )
        i = _find_first(
            columns, "PIECHART_CATEGORY", "DONUTCHART_CATEGORY", "CATEGORY"
        )
        if i != -1:
            r.category_index = i
        i = _find_first(columns, "PIECHART_COLOR", "COLOR")
        if i != -1:
            r.color_index = i
        return r

    box_idx = find_boxplot_column_index(columns)
    if box_idx != -1 and xaxis_idx != -1:
        r = RenderInfo(
            type="boxplot", label=label_value,
            index_axis_index=xaxis_idx, value_axis_index=box_idx,
            mark_lines=mark_lines,
        )
        i = find_column_by_tag(columns, "COLOR")
        if i != -1:
            r.color_index = i
        return r

    i = find_column_by_tag(columns, "INPUT")
    if i != -1 and len(rows) == 1:
        return RenderInfo(type="input", label=label_value, hint_index=i)

    if len(rows) == 1:
        first_row = rows[0]
        value_size = ""
        value_index = None
        for tag, size in (
            ("TEXT_SMALL", "small"),
            ("TEXT_MEDIUM", "medium"),
            ("TEXT_LARGE", "large"),
        ):
            j = find_column_by_tag(columns, tag)
            if j != -1:
                value_size = size
                value_index = j
                break
        if len(first_row) == 1:
            return RenderInfo(
                type="value", label=label_value,
                value_size=value_size, value_index=value_index,
            )
        compare_idx = find_column_by_tag(columns, "COMPARE")
        if compare_idx != -1 and len(first_row) == 2:
            return RenderInfo(
                type="value", label=label_value, compare_index=compare_idx,
                value_size=value_size, value_index=value_index,
            )

    r = RenderInfo(type="table", label=label_value)
    trend = find_all_columns_by_tag(columns, "TREND")
    if trend:
        r.trend_index = trend
    return r


_CHART_TYPES = frozenset(
    {
        "linechart", "scatterplot", "barchartHorizontal",
        "barchartHorizontalStacked", "barchartVertical",
        "barchartVerticalStacked", "boxplot", "piechart", "donutchart",
    }
)


def map_tag(index: int, r: RenderInfo) -> str:
    """Column render-role tag per render type
    (reference server/core/get_dashboard.go:535-608)."""
    if r.type in _CHART_TYPES:
        if r.index_axis_index == index:
            return "index"
        if r.value_axis_index == index:
            return "value"
        if r.category_index == index:
            return "category"
        if r.color_index == index:
            return "color"
        if r.band_lower_index == index:
            return "band_lower"
        if r.band_upper_index == index:
            return "band_upper"
    if r.type in ("dropdown", "dropdownMulti"):
        if r.value_index == index:
            return "value"
        if r.label_index == index:
            return "label"
        if r.hint_index == index:
            return "hint"
    if r.type == "datepicker" and r.value_index == index:
        return "default"
    if r.type == "daterangePicker":
        if r.from_index == index:
            return "defaultFrom"
        if r.to_index == index:
            return "defaultTo"
    if r.download and (r.download_id_index is None or index != r.download_id_index):
        return "download"
    if r.type == "gauge" and r.value_axis_index == index:
        return "value"
    if r.type == "input" and r.hint_index == index:
        return "hint"
    if r.type == "value":
        if r.compare_index == index:
            return "compare"
        if r.value_size and (r.value_index is None or index == r.value_index):
            return r.value_size
        return "value"
    if index in r.trend_index:
        return "trend"
    return ""
