"""UI shell tests: the SPA fallback route and its render-type parity.

The reference serves the built React bundle for every non-/api path
(server/web/routes.go); here the bundle is shaper_spark.ui.shell().
Behavioral JS is exercised in-browser during development; these tests
pin the server contract and the render-type coverage guard.
"""

from __future__ import annotations

import re
import urllib.request

import pytest

from shaper_spark import render, ui
from shaper_spark.api import ShaperServer


@pytest.fixture(scope="module")
def server(spark):
    srv = ShaperServer(spark).start()
    yield srv
    srv.stop()


def _get(srv, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
            return r.status, r.read(), r.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


class TestShellRoutes:
    @pytest.mark.parametrize(
        "path",
        [
            "/",
            "/login",
            "/signup",
            "/new",
            "/settings",
            "/admin/keys",
            "/admin/security",
            "/dashboards/some-id",
            "/dashboards/some-id/edit",
            "/tasks/t1",
        ],
    )
    def test_ui_routes_serve_shell(self, server, path):
        status, body, ctype = _get(server, path)
        assert status == 200
        assert ctype.startswith("text/html")
        assert b"<div id='app'>" in body

    def test_non_ui_path_is_404(self, server):
        status, _, ctype = _get(server, "/definitely/not/a/route")
        assert status == 404
        assert "json" in ctype

    def test_api_paths_not_shadowed(self, server):
        status, body, ctype = _get(server, "/health")
        assert status == 200 and b"ok" in body and "json" in ctype

    def test_query_string_still_routes(self, server):
        status, _, ctype = _get(server, "/dashboards/x?region=ASIA&embed=1")
        assert status == 200 and ctype.startswith("text/html")


class TestRenderTypeParity:
    def test_every_emitted_render_type_has_a_js_renderer(self):
        """Every RenderInfo(type=...) literal in render.py must appear
        in the UI JS — render.py can never grow a type the UI drops."""
        src = open(render.__file__.replace(".pyc", ".py")).read()
        emitted = set(re.findall(r'RenderInfo\(\s*\n?\s*type="(\w+)"', src))
        emitted |= set(re.findall(r'type="(\w+)"', src))
        emitted.discard("")
        missing = {
            t for t in emitted if t not in ui._JS and t not in ("table",)
        }
        # 'table' is the default branch of renderChart
        assert "table" in ui._JS
        assert not missing, f"UI lacks renderers for {sorted(missing)}"

    def test_declared_types_all_present_in_js(self):
        for t in ui._RENDER_TYPES:
            assert t in ui._JS, t

    def test_widget_param_contract_names(self):
        # engine._collect_vars keys params by the tagged column NAME;
        # the JS must read tags, not positions.
        for tag in ("value", "label", "hint", "default", "defaultFrom",
                    "defaultTo", "compare", "trend", "category",
                    "band_lower", "band_upper", "index"):
            assert f"'{tag}'" in ui._JS, tag


class TestIsUiPath:
    @pytest.mark.parametrize(
        "path,expect",
        [
            ("/", True),
            ("/login", True),
            ("/dashboards/abc", True),
            ("/dashboards/abc/edit", True),
            ("/tasks/t", True),
            ("/admin/keys", True),
            ("/api/dashboards", False),
            ("/health", False),
            ("/random", False),
            ("/dashboardsx/abc", False),
        ],
    )
    def test_cases(self, path, expect):
        assert ui.is_ui_path(path) is expect
