"""True-PDF rendering of a dashboard result tree — pure stdlib.

The reference produces PDFs by driving headless Chrome over the
dashboard URL (``server/pdf/pdf.go:33-133``) with a header/footer
template (``:256-340``). No browser exists in this build, so this
module writes the PDF **directly**: a minimal PDF 1.4 generator
(objects, xref, Helvetica text, vector rects/polylines — nothing
outside the stdlib) plus a cursor layout engine that maps the GetResult
tree to pages: sections → headings, stats → large numerals, bar/line
charts → vector graphics, everything else → ruled tables.

Parity notes vs the reference template:
* footer carries the render date (left, ``--pdf-date-format`` default
  ``02.01.2006`` → ``%d.%m.%Y``), the FOOTER_LINK (right), and — unlike
  the HTML stand-in — real ``page/total`` numbers (center), since this
  writer knows the page count (pdf.go:324-340 uses Chrome's
  pageNumber/totalPages counters for the same thing).
* HEADER_IMAGE is a URL in the result tree; embedding would require an
  image codec + fetch, so the header renders the dashboard name in its
  place (documented divergence; ``codecs.decode_bmp`` covers the
  bytes-in-hand case elsewhere).
* Text is written with PDF's built-in Helvetica (WinAnsi); characters
  outside Latin-1 are replaced — faithful layout for the Latin scripts
  the template targets, honest fallback otherwise.

``render_dashboard_pdf`` returns ``bytes`` that every PDF reader opens;
``api.py`` serves it as ``application/pdf``, closing the content-type
divergence the round-3 review flagged.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from .htmlreport import _chart_scale, _numeric_series

__all__ = ["render_dashboard_pdf"]

_DATE_FORMAT = "%d.%m.%Y"

A4_W, A4_H = 595.28, 841.89
MARGIN = 40.0
BOTTOM = 52.0  # leave room for the footer band
USABLE_W = A4_W - 2 * MARGIN

_MAX_TABLE_ROWS = 40
_MAX_COLS = 8
_CHART_W, _CHART_H = 420.0, 140.0


def _pdf_escape(s: str) -> bytes:
    # WinAnsiEncoding is cp1252: keeps the clip ellipsis (0x85) and the
    # other Windows-1252 punctuation latin-1 lacks
    out = s.encode("cp1252", "replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


# Rough Helvetica advance width (em fraction) — enough for clipping and
# right-alignment; exact metrics are unnecessary for report layout.
_CHAR_W = 0.5


def _clip(s: str, size: float, width: float) -> str:
    max_chars = max(1, int(width / (_CHAR_W * size)))
    return s if len(s) <= max_chars else s[: max_chars - 1] + "…"


class _Page:
    def __init__(self) -> None:
        self.ops: list[bytes] = []

    def text(
        self, x: float, y: float, s: str, size: float = 10, bold: bool = False
    ) -> None:
        font = b"/F2" if bold else b"/F1"
        self.ops.append(
            b"BT %s %.1f Tf %.2f %.2f Td (%s) Tj ET"
            % (font, size, x, y, _pdf_escape(s))
        )

    def rect(
        self,
        x: float,
        y: float,
        w: float,
        h: float,
        gray: float = 0.0,
        fill: bool = True,
    ) -> None:
        op = b"f" if fill else b"S"
        self.ops.append(
            b"%.3f g %.2f %.2f %.2f %.2f re %s 0 g" % (gray, x, y, w, h, op)
        )

    def hline(self, x0: float, x1: float, y: float, width: float = 0.8) -> None:
        self.ops.append(
            b"%.2f w %.2f %.2f m %.2f %.2f l S 1 w" % (width, x0, y, x1, y)
        )

    def polyline(self, pts: list[tuple[float, float]]) -> None:
        if len(pts) < 2:
            return
        parts = [b"0.8 w 0.27 0.39 0.68 RG %.2f %.2f m" % pts[0]]
        parts += [b"%.2f %.2f l" % p for p in pts[1:]]
        parts.append(b"S 0 0 0 RG 1 w")
        self.ops.append(b" ".join(parts))

    def stream(self) -> bytes:
        return b"\n".join(self.ops)


class _Doc:
    """Cursor-based top-down layout over A4 pages."""

    def __init__(self) -> None:
        self.pages: list[_Page] = []
        self.y = 0.0
        self.new_page()

    def new_page(self) -> None:
        self.pages.append(_Page())
        self.y = A4_H - MARGIN

    @property
    def page(self) -> _Page:
        return self.pages[-1]

    def need(self, h: float) -> None:
        if self.y - h < BOTTOM:
            self.new_page()

    def heading(self, s: str, size: float, rule: bool = False) -> None:
        self.need(size + 14)
        self.y -= size + 6
        self.page.text(MARGIN, self.y, _clip(s, size, USABLE_W), size, bold=True)
        if rule:
            self.y -= 5
            self.page.hline(MARGIN, A4_W - MARGIN, self.y, 1.2)
        self.y -= 6

    def stat(self, v: Any) -> None:
        self.need(34)
        self.y -= 28
        self.page.text(MARGIN, self.y, _clip(str(v), 24, USABLE_W), 24, bold=True)
        self.y -= 6

    def note(self, s: str) -> None:
        self.need(14)
        self.y -= 11
        self.page.text(MARGIN, self.y, _clip(s, 8, USABLE_W), 8)
        self.y -= 3

    def table(self, columns: list[dict], rows: list[list]) -> None:
        cols = columns[:_MAX_COLS]
        if not cols:
            return
        cw = USABLE_W / len(cols)
        row_h = 14.0
        self.need(row_h * 2)
        def header_band() -> None:
            self.y -= row_h
            self.page.rect(MARGIN, self.y - 3, USABLE_W, row_h, gray=0.92)
            for i, c in enumerate(cols):
                self.page.text(
                    MARGIN + 3 + i * cw,
                    self.y,
                    _clip(str(c.get("name", "")), 9, cw - 6),
                    9,
                    bold=True,
                )

        header_band()
        shown = rows[:_MAX_TABLE_ROWS]
        for r in shown:
            if self.y - row_h < BOTTOM:
                self.new_page()
                header_band()  # continuation pages keep column labels
            self.y -= row_h
            for i in range(len(cols)):
                v = r[i] if i < len(r) else None
                self.page.text(
                    MARGIN + 3 + i * cw,
                    self.y,
                    _clip("" if v is None else str(v), 9, cw - 6),
                    9,
                )
            self.page.hline(MARGIN, A4_W - MARGIN, self.y - 3, 0.3)
        hidden = len(rows) - len(shown)
        if len(columns) > _MAX_COLS:
            self.note(f"{len(columns) - _MAX_COLS} more columns not shown")
        if hidden > 0:
            self.note(f"{hidden} more rows not shown")
        self.y -= 4

    def chart(self, kind: str, columns: list[dict], rows: list[list]) -> bool:
        xi, yi = _numeric_series(columns, rows)
        if yi < 0 or not rows:
            return False
        pts = [(r[xi], r[yi]) for r in rows if r[yi] is not None][:800]
        if not pts:
            return False
        vals = [float(p[1]) for p in pts]
        vmin, vmax, span = _chart_scale(vals)
        box_h = _CHART_H + 18
        self.need(box_h)
        self.y -= box_h
        x0, y0 = MARGIN, self.y  # chart box lower-left
        self.page.rect(x0, y0, _CHART_W, _CHART_H, gray=0.97)
        self.page.rect(x0, y0, _CHART_W, _CHART_H, gray=0.75, fill=False)

        def ypix(v: float) -> float:
            return y0 + _CHART_H * (v - vmin) / span

        n = len(pts)
        if kind == "bar":
            bw = max(0.5, _CHART_W / n - 1.5)
            base = ypix(0.0 if vmin < 0 else vmin)
            for i, v in enumerate(vals):
                yv = ypix(v)
                lo, h = (base, yv - base) if yv >= base else (yv, base - yv)
                self.page.ops.append(
                    b"0.27 0.39 0.68 rg %.2f %.2f %.2f %.2f re f 0 g"
                    % (x0 + i * _CHART_W / n, lo, bw, max(h, 0.4))
                )
        else:
            step = _CHART_W / max(n - 1, 1)
            self.page.polyline(
                [(x0 + i * step, ypix(v)) for i, v in enumerate(vals)]
            )
        label = (
            f"{columns[yi].get('name', '')} — {n} points, "
            f"min {vmin:g}, max {vmax:g}"
        )
        self.page.text(x0, y0 + _CHART_H + 5, _clip(label, 8, _CHART_W), 8)
        self.y -= 6
        return True

    def build(
        self, stamp: str, footer_link: str, title: str
    ) -> bytes:
        total = len(self.pages)
        for idx, pg in enumerate(self.pages, 1):
            pg.hline(MARGIN, A4_W - MARGIN, BOTTOM - 14, 0.4)
            pg.text(MARGIN, BOTTOM - 26, stamp, 8)
            center = f"{idx}/{total}"
            pg.text(A4_W / 2 - len(center) * _CHAR_W * 8 / 2, BOTTOM - 26, center, 8)
            if footer_link:
                link = footer_link
                for pre in ("http://", "https://", "mailto:"):
                    if link.startswith(pre):
                        link = link[len(pre):]
                x = A4_W - MARGIN - len(link) * _CHAR_W * 8
                pg.text(max(x, A4_W / 2 + 30), BOTTOM - 26, _clip(link, 8, USABLE_W / 2 - 30), 8)

        objs: list[bytes] = []  # 1-indexed

        def add(body: bytes) -> int:
            objs.append(body)
            return len(objs)

        font1 = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )
        font2 = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
            b"/Encoding /WinAnsiEncoding >>"
        )
        content_ids = []
        for pg in self.pages:
            s = pg.stream()
            content_ids.append(
                add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(s), s))
            )
        pages_id_placeholder = len(objs) + len(self.pages) + 1
        page_ids = []
        for cid in content_ids:
            page_ids.append(
                add(
                    b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %.2f %.2f] "
                    b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> "
                    b"/Contents %d 0 R >>"
                    % (pages_id_placeholder, A4_W, A4_H, font1, font2, cid)
                )
            )
        kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
        pages_id = add(
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
        )
        assert pages_id == pages_id_placeholder
        catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
        info = add(b"<< /Title (%s) /Producer (shaper-spark) >>" % _pdf_escape(title))

        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0] * (len(objs) + 1)
        for i, body in enumerate(objs, 1):
            offsets[i] = len(out)
            out += b"%d 0 obj\n" % i
            out += body
            out += b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, catalog, info, xref_at)
        )
        return bytes(out)


def render_dashboard_pdf(
    result: dict,
    title: str | None = None,
    date_format: str = _DATE_FORMAT,
    now: _dt.datetime | None = None,
) -> bytes:
    """Render a ``GetResult.to_dict()`` tree to real PDF bytes."""
    name = title or result.get("name") or "Dashboard"
    doc = _Doc()
    doc.heading(name, 16, rule=True)
    for section in result.get("sections") or []:
        stitle = section.get("title")
        if stitle:
            doc.heading(str(stitle), 12)
        for q in section.get("queries") or []:
            rtype = ((q.get("render") or {}).get("type") or "table").lower()
            columns = q.get("columns") or []
            rows = q.get("rows") or []
            if rtype in ("value", "stat"):
                v = rows[0][0] if rows and rows[0] else None
                doc.stat("" if v is None else v)
            elif "barchart" in rtype and doc.chart("bar", columns, rows):
                pass
            elif (
                "linechart" in rtype or "areachart" in rtype
            ) and doc.chart("line", columns, rows):
                pass
            elif rtype in ("dropdown", "multiselect", "buttongroup"):
                opts = ", ".join(
                    str(r[0]) for r in rows[:50] if r and r[0] is not None
                )
                doc.note(f"[{rtype}] {opts}")
            else:
                doc.table(columns, rows)
    stamp = (now or _dt.datetime.now()).strftime(date_format)
    return doc.build(stamp, result.get("footerLink") or "", str(name))
