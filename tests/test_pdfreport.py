"""True-PDF writer: structural validity (xref, objects, streams) and
content checks, parsed with a strict minimal reader — no PDF library."""

from __future__ import annotations

import datetime as dt
import re

from shaper_spark.pdfreport import render_dashboard_pdf


def _result_tree(n_rows=5, n_points=10):
    return {
        "name": "Report X",
        "footerLink": "https://ex.org/d",
        "sections": [
            {
                "title": "KPIs",
                "queries": [
                    {
                        "render": {"type": "value"},
                        "columns": [{"name": "total", "type": "number"}],
                        "rows": [[42]],
                    },
                    {
                        "render": {"type": "barchart"},
                        "columns": [
                            {"name": "k", "tag": "index"},
                            {"name": "v", "type": "number", "tag": "value"},
                        ],
                        "rows": [[f"k{i}", i % 7] for i in range(n_points)],
                    },
                ],
            },
            {
                "title": "Detail",
                "queries": [
                    {
                        "render": {"type": "table"},
                        "columns": [{"name": "a"}, {"name": "b"}],
                        "rows": [[i, f"r{i}"] for i in range(n_rows)],
                    }
                ],
            },
        ],
    }


def _parse(pdf: bytes) -> dict:
    """Strict minimal reader: header, xref offsets → objects, trailer."""
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    xr = pdf.rindex(b"startxref")
    off = int(pdf[xr + 9 : pdf.index(b"%%EOF", xr)].strip())
    assert pdf[off : off + 4] == b"xref"
    header = pdf[off : pdf.index(b"trailer", off)].split(b"\n")
    n = int(header[1].split()[1])
    objs = {}
    for i, line in enumerate(header[2 : 2 + n]):
        o = int(line[:10])
        if i == 0:
            continue  # free head
        assert pdf[o:].startswith(b"%d 0 obj" % i), (i, pdf[o : o + 20])
        objs[i] = pdf[o : pdf.index(b"endobj", o)]
    trailer = pdf[pdf.index(b"trailer", off) :]
    root = int(re.search(rb"/Root (\d+) 0 R", trailer).group(1))
    return {"objs": objs, "root": root, "count": n - 1}


class TestPdfStructure:
    def test_xref_offsets_and_objects(self):
        pdf = render_dashboard_pdf(_result_tree())
        p = _parse(pdf)
        assert p["count"] == len(p["objs"])
        cat = p["objs"][p["root"]]
        assert b"/Type /Catalog" in cat
        pages_id = int(re.search(rb"/Pages (\d+) 0 R", cat).group(1))
        pages = p["objs"][pages_id]
        count = int(re.search(rb"/Count (\d+)", pages).group(1))
        kids = re.findall(rb"(\d+) 0 R", re.search(rb"/Kids \[([^\]]*)\]", pages).group(1))
        assert len(kids) == count >= 1
        for kid in kids:
            page = p["objs"][int(kid)]
            assert b"/Type /Page" in page and b"/MediaBox" in page

    def test_stream_lengths_exact(self):
        pdf = render_dashboard_pdf(_result_tree())
        for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", pdf):
            ln = int(m.group(1))
            body = pdf[m.end() : m.end() + ln]
            assert pdf[m.end() + ln : m.end() + ln + 10] == b"\nendstream"
            assert len(body) == ln

    def test_content_and_footer(self):
        pdf = render_dashboard_pdf(
            _result_tree(), now=dt.datetime(2026, 8, 14)
        )
        assert b"Report X" in pdf
        assert b"14.08.2026" in pdf
        assert b"ex.org/d" in pdf  # scheme stripped in footer
        assert b"1/1" in pdf  # page counter
        assert b"KPIs" in pdf and b"Detail" in pdf

    def test_pagination_and_page_numbers(self):
        pdf = render_dashboard_pdf(_result_tree(n_rows=200))
        p = _parse(pdf)
        pages = [o for o in p["objs"].values() if b"/Type /Page " in o]
        assert len(pages) >= 2
        assert b"1/%d" % len(pages) in pdf
        assert b"%d/%d" % (len(pages), len(pages)) in pdf
        # table cap note present
        assert b"more rows not shown" in pdf

    def test_special_chars_escaped(self):
        tree = _result_tree()
        tree["name"] = "paren (x) \\ back"
        pdf = render_dashboard_pdf(tree)
        _parse(pdf)  # must stay structurally valid
        assert b"paren \\(x\\) \\\\ back" in pdf

    def test_chart_ops_present(self):
        pdf = render_dashboard_pdf(_result_tree(n_points=12))
        # bar chart rect fills in chart color
        assert b"0.27 0.39 0.68 rg" in pdf
