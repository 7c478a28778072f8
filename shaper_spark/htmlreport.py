"""Static HTML rendering of a dashboard result tree — the printable
stand-in for the reference's PDF export.

The reference renders dashboards to PDF by driving headless Chrome over
the dashboard URL (``server/pdf/pdf.go:33-133``). No browser exists in
this build, so ``DOWNLOAD_PDF`` buttons resolve to a self-contained
static HTML document of the same GetResult tree instead: every section,
query, chart (as inline SVG) and table, with no external assets — it
prints from any browser, which is what the PDF was for. The divergence
is documented (MIGRATION.md): content-type is text/html.

Only the stdlib is used; charts are deliberately minimal (bars, lines,
stat values) — enough to make the exported document faithful to the
dashboard's structure and data, not a pixel-accurate clone of the UI.
"""

from __future__ import annotations

import datetime as _dt
import html
from typing import Any

__all__ = ["render_dashboard_html"]

_MAX_TABLE_ROWS = 200
_SVG_W, _SVG_H, _PAD = 560, 180, 28

# Default date format mirrors the reference's --pdf-date-format default
# "02.01.2006" (Go layout, day.month.year — main.go:417).
_DATE_FORMAT = "%d.%m.%Y"

_CSS = """
body{font-family:system-ui,sans-serif;margin:24px;color:#1a1a2e}
h1{font-size:22px;border-bottom:2px solid #1a1a2e;padding-bottom:6px}
h2{font-size:17px;margin-top:28px}
table{border-collapse:collapse;margin:10px 0;font-size:13px}
th,td{border:1px solid #c5c5d2;padding:3px 9px;text-align:left}
th{background:#ececf4}
.stat{font-size:34px;font-weight:700;margin:8px 0}
.query{margin:14px 0}.truncated{color:#888;font-size:12px}
svg{background:#fafafc;border:1px solid #e2e2ea}
.bar{fill:#4464ad}.line{stroke:#4464ad;stroke-width:2;fill:none}
.report-header img{max-height:40px;margin-left:35px;object-fit:contain}
.report-footer{display:flex;justify-content:space-between;color:#6b6b7b;
font-size:9px;margin:24px 35px 0}
.report-footer a{color:#6b6b7b;text-decoration:none}
@page{size:A4;margin:12mm}
@media print{
body{margin:0}
.query,table{break-inside:avoid}
.report-footer{position:fixed;bottom:0;left:0;right:0}
}
"""

# Reference adds @page{margin-top:20mm} only when a HEADER_IMAGE is set,
# so the printed header never overlaps content (pdf.go:92-99).
_HEADER_PAGE_CSS = "@page{margin-top:20mm}"


def _esc(v: Any) -> str:
    return html.escape("" if v is None else str(v))


def _numeric_series(columns: list[dict], rows: list[list]) -> tuple[int, int]:
    """(x_index, y_index) — first index/xaxis-tagged column (else 0) and
    first value-tagged numeric column (else last numeric)."""
    xi, yi = 0, -1
    for i, c in enumerate(columns):
        if c.get("tag") in ("index", "xaxis") and xi == 0:
            xi = i
    for i, c in enumerate(columns):
        if c.get("type") == "number" and c.get("tag") == "value":
            yi = i
            break
    if yi < 0:
        for i, c in enumerate(columns):
            if c.get("type") == "number" and i != xi:
                yi = i
    return xi, yi


def _chart_scale(vals: list[float]) -> tuple[float, float, float]:
    """Shared bar/line axis scale (html/pdf/png renderers): the axis
    always includes zero; a zero span (constant series) falls back to 1
    so division is safe. vmax is NOT falsy-promoted — an all-negative
    series must not draw phantom headroom up to +1."""
    vmax = max(max(vals), 0.0)
    vmin = min(min(vals), 0.0)
    span = (vmax - vmin) or 1.0
    return vmin, vmax, span


def _svg_chart(kind: str, columns: list[dict], rows: list[list]) -> str:
    """Inline SVG bar/line chart of (x, y) pairs; returns '' when no
    numeric series can be extracted (caller falls back to a table)."""
    xi, yi = _numeric_series(columns, rows)
    if yi < 0 or not rows:
        return ""
    pts = [(r[xi], r[yi]) for r in rows if r[yi] is not None][: 2 * _SVG_W]
    if not pts:
        return ""
    vals = [float(p[1]) for p in pts]
    vmin, vmax, span = _chart_scale(vals)
    iw = _SVG_W - 2 * _PAD
    ih = _SVG_H - 2 * _PAD

    def ypix(v: float) -> float:
        return _PAD + ih * (1 - (v - vmin) / span)

    parts = [
        f'<svg viewBox="0 0 {_SVG_W} {_SVG_H}" width="{_SVG_W}" '
        f'height="{_SVG_H}" role="img">'
    ]
    n = len(pts)
    if kind == "bar":
        bw = max(1.0, iw / n - 2)
        for i, (_, v) in enumerate(pts):
            x = _PAD + i * iw / n
            y = ypix(float(v))
            h = ypix(vmin if vmin < 0 else 0.0) - y
            if h < 0:
                y, h = y + h, -h
            parts.append(
                f'<rect class="bar" x="{x:.1f}" y="{y:.1f}" '
                f'width="{bw:.1f}" height="{max(h, 0.5):.1f}"/>'
            )
    else:
        coords = " ".join(
            f"{_PAD + i * iw / max(n - 1, 1):.1f},{ypix(float(v)):.1f}"
            for i, (_, v) in enumerate(pts)
        )
        parts.append(f'<polyline class="line" points="{coords}"/>')
    parts.append(
        f'<text x="{_PAD}" y="14" font-size="11">'
        f"{_esc(columns[yi]['name'])} — {n} points, "
        f"min {vmin:g}, max {vmax:g}</text>"
    )
    parts.append("</svg>")
    return "".join(parts)


def _table(columns: list[dict], rows: list[list]) -> str:
    head = "".join(f"<th>{_esc(c['name'])}</th>" for c in columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(v)}</td>" for v in r) + "</tr>"
        for r in rows[:_MAX_TABLE_ROWS]
    )
    note = (
        f'<div class="truncated">{len(rows) - _MAX_TABLE_ROWS} more rows '
        "not shown</div>"
        if len(rows) > _MAX_TABLE_ROWS
        else ""
    )
    return f"<table><tr>{head}</tr>{body}</table>{note}"


def _render_query(q: dict) -> str:
    rtype = (q.get("render") or {}).get("type") or "table"
    columns = q.get("columns") or []
    rows = q.get("rows") or []
    inner = ""
    low = rtype.lower()
    if low in ("value", "stat"):
        v = rows[0][0] if rows and rows[0] else None
        inner = f'<div class="stat">{_esc(v)}</div>'
    elif "barchart" in low:
        inner = _svg_chart("bar", columns, rows)
    elif "linechart" in low or "areachart" in low:
        inner = _svg_chart("line", columns, rows)
    elif low in ("dropdown", "multiselect", "buttongroup"):
        opts = "".join(
            f"<li>{_esc(r[0] if r else None)}</li>" for r in rows[:50]
        )
        inner = f"<ul>{opts}</ul>"
    if not inner:
        inner = _table(columns, rows)
    return (
        f'<div class="query" data-render-type="{_esc(rtype)}">{inner}</div>'
    )


def _strip_scheme(link: str) -> str:
    for prefix in ("http://", "https://", "mailto:"):
        if link.startswith(prefix):
            return link[len(prefix):]
    return link


def render_dashboard_html(
    result: dict,
    title: str | None = None,
    date_format: str = _DATE_FORMAT,
    now: _dt.datetime | None = None,
) -> str:
    """Render a ``GetResult.to_dict()`` tree to one self-contained HTML
    document (sections → h2, queries → chart/table/stat).

    Page layout follows the reference's PDF template
    (``server/pdf/pdf.go:259-270`` header, ``:324-340`` footer): the
    dashboard's HEADER_IMAGE renders at the top (max-height 40px),
    the footer carries the render date (``date_format``, default
    day.month.year like the reference's ``--pdf-date-format``) on the
    left and the FOOTER_LINK — scheme stripped for display, kept in
    href — on the right; ``@page`` CSS sets A4 with extra top margin
    when a header image is present, so "print to PDF" output matches
    the reference's page intent. Chrome's pageNumber/totalPages
    counters need the print engine itself, so they are the one
    divergence."""
    name = title or result.get("name") or "Dashboard"
    header_image = result.get("headerImage") or ""
    footer_link = result.get("footerLink") or ""
    stamp = (now or _dt.datetime.now()).strftime(date_format)
    css = _CSS + (_HEADER_PAGE_CSS if header_image else "")
    out = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_esc(name)}</title><style>{css}</style></head><body>",
    ]
    if header_image:
        out.append(
            f'<div class="report-header"><img src="{_esc(header_image)}" '
            'alt=""/></div>'
        )
    out.append(f"<h1>{_esc(name)}</h1>")
    for section in result.get("sections") or []:
        stype = section.get("type") or "content"
        stitle = section.get("title")
        out.append(f'<section data-section-type="{_esc(stype)}">')
        if stitle:
            out.append(f"<h2>{_esc(stitle)}</h2>")
        for q in section.get("queries") or []:
            out.append(_render_query(q))
        out.append("</section>")
    link = (
        f'<a href="{_esc(footer_link)}">{_esc(_strip_scheme(footer_link))}</a>'
        if footer_link
        else ""
    )
    out.append(
        f'<footer class="report-footer"><span>{_esc(stamp)}</span>{link}'
        "</footer>"
    )
    out.append("</body></html>")
    return "".join(out)
