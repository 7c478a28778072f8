"""True-PNG writer: decode the emitted PNG with a strict minimal reader
(signature, chunks, CRCs, inflate, filter-0 unfilter) and assert on the
reconstructed pixels — no image library."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from shaper_spark.pngreport import render_dashboard_png


def _decode(png: bytes) -> np.ndarray:
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(png):
        ln = struct.unpack(">I", png[pos : pos + 4])[0]
        tag = png[pos + 4 : pos + 8]
        body = png[pos + 8 : pos + 8 + ln]
        crc = struct.unpack(">I", png[pos + 8 + ln : pos + 12 + ln])[0]
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF, tag
        chunks.append((tag, body))
        pos += 12 + ln
    assert chunks[0][0] == b"IHDR" and chunks[-1][0] == b"IEND"
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[0][1][:10])
    assert (depth, ctype) == (8, 2)  # 8-bit RGB
    raw = zlib.decompress(b"".join(b for t, b in chunks if t == b"IDAT"))
    stride = 1 + w * 3
    assert len(raw) == h * stride
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0  # filter type 0 everywhere
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def _tree():
    return {
        "name": "Snap",
        "sections": [
            {
                "title": "Charts",
                "queries": [
                    {
                        "render": {"type": "barchart"},
                        "columns": [
                            {"name": "k", "tag": "index"},
                            {"name": "v", "type": "number", "tag": "value"},
                        ],
                        "rows": [[f"k{i}", 1 + i] for i in range(8)],
                    },
                    {
                        "render": {"type": "table"},
                        "columns": [{"name": "a"}, {"name": "b"}],
                        "rows": [[1, "x"], [2, "y"]],
                    },
                ],
            }
        ],
    }


class TestPngStructure:
    def test_decodes_and_has_content(self):
        img = _decode(render_dashboard_png(_tree()))
        h, w, _ = img.shape
        assert w == 900 and h > 200
        # white background dominates
        white = (img == 255).all(axis=2).mean()
        assert white > 0.5
        # accent-colored bar pixels present
        accent = (img == np.array([68, 100, 173], np.uint8)).all(axis=2).sum()
        assert accent > 500
        # ink text pixels present
        ink = (img == np.array([26, 26, 46], np.uint8)).all(axis=2).sum()
        assert ink > 100

    def test_bar_heights_monotone(self):
        # increasing values → the columns' ink extends higher up
        img = _decode(render_dashboard_png(_tree()))
        # crop below the title + accent-colored section heading so only
        # chart pixels remain in the accent mask
        img = img[110:]
        accent = (img == np.array([68, 100, 173], np.uint8)).all(axis=2)
        cols = np.where(accent.any(axis=0))[0]
        assert len(cols) > 0
        # topmost accent pixel per x-column: later bars reach higher (smaller y)
        tops = {x: np.where(accent[:, x])[0].min() for x in cols}
        xs = sorted(tops)
        first_top = tops[xs[0]]
        last_top = tops[xs[-1]]
        assert last_top < first_top

    def test_empty_tree(self):
        img = _decode(render_dashboard_png({"name": "E", "sections": []}))
        assert img.shape[1] == 900
