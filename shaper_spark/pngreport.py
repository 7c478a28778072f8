"""True-PNG rendering of a dashboard result tree — pure stdlib + numpy.

The reference's PNG export screenshots the dashboard with headless
Chrome (``server/pdf/pdf.go:134+`` Png). No browser exists in this
build, so this module rasterizes the GetResult tree directly: a numpy
RGB canvas with rect/line primitives and a built-in 5×7 bitmap font,
encoded to PNG with the stdlib ``zlib``/``struct`` (one IDAT,
filter-0 scanlines). The output is a real, viewable ``image/png``
dashboard snapshot — schematic rather than pixel-identical to the
React UI (documented divergence, like the PDF writer's).

Text uses an uppercase-folded 5×7 ASCII subset (letters, digits, basic
punctuation); anything else renders as '·'. That is enough for titles,
axis summaries, and table cells at snapshot scale.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

from .htmlreport import _chart_scale, _numeric_series

__all__ = ["render_dashboard_png"]

W = 900
MARGIN = 24
_CHART_W, _CHART_H = 560, 160
_ROW_H = 16
_MAX_TABLE_ROWS = 15
_MAX_COLS = 6

_INK = (26, 26, 46)
_ACCENT = (68, 100, 173)
_GRID = (197, 197, 210)
_BAND = (236, 236, 244)

# 5×7 glyphs, rows top→bottom, 5 bits each (MSB = left column).
_GLYPHS: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b11011, 0b10001),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    ".": (0, 0, 0, 0, 0, 0b01100, 0b01100),
    ",": (0, 0, 0, 0, 0b01100, 0b00100, 0b01000),
    ":": (0, 0b01100, 0b01100, 0, 0b01100, 0b01100, 0),
    "/": (0b00001, 0b00010, 0b00010, 0b00100, 0b01000, 0b01000, 0b10000),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    "+": (0, 0b00100, 0b00100, 0b11111, 0b00100, 0b00100, 0),
    "%": (0b11001, 0b11010, 0b00010, 0b00100, 0b01000, 0b01011, 0b10011),
    "(": (0b00010, 0b00100, 0b01000, 0b01000, 0b01000, 0b00100, 0b00010),
    ")": (0b01000, 0b00100, 0b00010, 0b00010, 0b00010, 0b00100, 0b01000),
    "'": (0b00100, 0b00100, 0, 0, 0, 0, 0),
    "=": (0, 0, 0b11111, 0, 0b11111, 0, 0),
    "·": (0, 0, 0, 0b00100, 0, 0, 0),
}


class _Canvas:
    def __init__(self, h: int) -> None:
        self.px = np.full((h, W, 3), 255, dtype=np.uint8)

    def rect(self, x: int, y: int, w: int, h: int, color) -> None:
        x0, y0 = max(0, x), max(0, y)
        x1 = min(W, x + w)
        y1 = min(self.px.shape[0], y + h)
        if x1 > x0 and y1 > y0:
            self.px[y0:y1, x0:x1] = color

    def hline(self, x0: int, x1: int, y: int, color) -> None:
        self.rect(x0, y, x1 - x0, 1, color)

    def polyline(self, pts: list[tuple[int, int]], color) -> None:
        for (xa, ya), (xb, yb) in zip(pts, pts[1:]):
            n = max(abs(xb - xa), abs(yb - ya), 1)
            for t in range(n + 1):
                x = xa + (xb - xa) * t // n
                y = ya + (yb - ya) * t // n
                self.rect(x, y, 2, 2, color)

    def text(self, x: int, y: int, s: str, scale: int = 1, color=_INK) -> None:
        cx = x
        for ch in s:
            g = _GLYPHS.get(ch.upper(), _GLYPHS["·"])
            for r, bits in enumerate(g):
                for c in range(5):
                    if bits & (1 << (4 - c)):
                        self.rect(
                            cx + c * scale, y + r * scale, scale, scale, color
                        )
            cx += 6 * scale
            if cx > W - MARGIN:
                break

    def png(self) -> bytes:
        h = self.px.shape[0]
        raw = b"".join(
            b"\x00" + self.px[r].tobytes() for r in range(h)
        )

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", W, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


def _fmt(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def render_dashboard_png(result: dict, title: str | None = None) -> bytes:
    """Rasterize a ``GetResult.to_dict()`` tree to real PNG bytes."""
    name = str(title or result.get("name") or "Dashboard")

    # First pass: measure height.
    items: list[tuple] = [("title", name)]
    for section in result.get("sections") or []:
        if section.get("title"):
            items.append(("h2", str(section["title"])))
        for q in section.get("queries") or []:
            rtype = ((q.get("render") or {}).get("type") or "table").lower()
            columns = q.get("columns") or []
            rows = q.get("rows") or []
            if rtype in ("value", "stat"):
                items.append(("stat", _fmt(rows[0][0] if rows and rows[0] else "")))
            elif "barchart" in rtype or "linechart" in rtype or "areachart" in rtype:
                xi, yi = _numeric_series(columns, rows)
                pts = (
                    [float(r[yi]) for r in rows if r[yi] is not None][:400]
                    if yi >= 0
                    else []
                )
                if pts:
                    kind = "bar" if "barchart" in rtype else "line"
                    label = f"{columns[yi].get('name','')} ({len(pts)} points)"
                    items.append(("chart", kind, pts, label))
                else:
                    items.append(("table", columns, rows))
            else:
                items.append(("table", columns, rows))

    def item_h(it) -> int:
        k = it[0]
        if k == "title":
            return 40
        if k == "h2":
            return 30
        if k == "stat":
            return 44
        if k == "chart":
            return _CHART_H + 34
        cols, rows = it[1], it[2]
        return _ROW_H * (1 + min(len(rows), _MAX_TABLE_ROWS)) + 22

    height = MARGIN * 2 + sum(item_h(it) for it in items)
    cv = _Canvas(max(height, 120))
    y = MARGIN
    for it in items:
        k = it[0]
        if k == "title":
            cv.text(MARGIN, y, it[1], scale=2)
            cv.hline(MARGIN, W - MARGIN, y + 20, _INK)
            y += 40
        elif k == "h2":
            cv.text(MARGIN, y + 4, it[1], scale=2, color=_ACCENT)
            y += 30
        elif k == "stat":
            cv.text(MARGIN, y + 4, it[1], scale=4)
            y += 44
        elif k == "chart":
            _, kind, pts, label = it
            cv.rect(MARGIN, y, _CHART_W, _CHART_H, (250, 250, 252))
            vmin, vmax, span = _chart_scale(pts)
            n = len(pts)

            def ypix(v: float) -> int:
                return y + int(_CHART_H * (1 - (v - vmin) / span))

            if kind == "bar":
                bw = max(1, _CHART_W // n - 1)
                base = ypix(0.0 if vmin < 0 else vmin)
                for i, v in enumerate(pts):
                    yv = ypix(v)
                    lo, hh = (yv, base - yv) if yv <= base else (base, yv - base)
                    cv.rect(
                        MARGIN + i * _CHART_W // n, lo, bw, max(hh, 1), _ACCENT
                    )
            else:
                step = _CHART_W / max(n - 1, 1)
                cv.polyline(
                    [(MARGIN + int(i * step), ypix(v)) for i, v in enumerate(pts)],
                    _ACCENT,
                )
            cv.text(MARGIN, y + _CHART_H + 6, label)
            y += _CHART_H + 34
        else:
            _, columns, rows = it
            cols = columns[:_MAX_COLS]
            if not cols:
                continue
            cw = (W - 2 * MARGIN) // len(cols)
            cv.rect(MARGIN, y, W - 2 * MARGIN, _ROW_H, _BAND)
            for i, c in enumerate(cols):
                cv.text(MARGIN + 4 + i * cw, y + 4, str(c.get("name", ""))[: cw // 6 - 1])
            y += _ROW_H
            for r in rows[:_MAX_TABLE_ROWS]:
                for i in range(len(cols)):
                    v = r[i] if i < len(r) else None
                    cv.text(MARGIN + 4 + i * cw, y + 4, _fmt(v)[: cw // 6 - 1])
                cv.hline(MARGIN, W - MARGIN, y + _ROW_H - 1, _GRID)
                y += _ROW_H
            if len(rows) > _MAX_TABLE_ROWS:
                cv.text(MARGIN, y + 4, f"+{len(rows) - _MAX_TABLE_ROWS} MORE ROWS")
            y += 22
    return cv.png()
