"""Execute the UI SPA under node against a live ShaperServer.

tests/ui_dom_harness.js provides a minimal DOM shim, runs the real
shell JS, visits every route, and asserts the pages build from real API
responses: charts materialize SVG nodes, the dropdown writes its URL
param and refetches, the login form mints a session. Skipped when node
is unavailable (it is baked into this container; the guard keeps the
suite portable)."""

from __future__ import annotations

import json
import shutil
import subprocess
import urllib.request

import pytest

from shaper_spark import ui
from shaper_spark.api import ShaperServer

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None, reason="node not available"
)

DEMO = """
SELECT 'Regional revenue'::SECTION;
SELECT r_name::DROPDOWN AS region FROM region ORDER BY r_name;
SELECT DISTINCT n_name::DROPDOWN_MULTI AS nations FROM nation ORDER BY 1 LIMIT 6;
SELECT 'search term'::INPUT AS term;
SELECT
  date_trunc('month', o_orderdate)::XAXIS AS month,
  sum(o_totalprice)::LINECHART AS revenue,
  o_orderpriority::CATEGORY
FROM orders GROUP BY 1, 3 ORDER BY 1;
SELECT o_orderpriority::XAXIS, count(*)::BARCHART AS orders
FROM orders GROUP BY 1 ORDER BY 1;
SELECT o_orderstatus::PIECHART_CATEGORY, count(*)::PIECHART AS n
FROM orders GROUP BY 1;
SELECT count(*) AS total_orders FROM orders;
SELECT CAST(avg(o_totalprice) AS DOUBLE)::GAUGE AS avg_price FROM orders;
SELECT o_orderpriority::XAXIS, BOXPLOT(o_totalprice) AS price
FROM orders GROUP BY 1 ORDER BY 1;
SELECT 'Raw data'::SECTION;
SELECT 'Download CSV'::DOWNLOAD_CSV;
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderkey LIMIT 20;
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderkey LIMIT 15;
"""

FILTERED = """
SELECT r_name::DROPDOWN AS region FROM region ORDER BY r_name;
SELECT n_name::XAXIS AS nation, sum(c_acctbal)::BARCHART AS balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = getvariable('region')
GROUP BY 1 ORDER BY 2 DESC;
"""


def _seed(srv: ShaperServer) -> None:
    srv.store.record(
        "create_dashboard",
        {"id": "demo", "content": DEMO, "name": "Demo dashboard"},
    )
    srv.store.record(
        "create_dashboard",
        {"id": "filtered", "content": FILTERED, "name": "Filtered"},
    )
    srv.store.record(
        "create_task",
        {
            "id": "t-demo",
            "content": "SELECT count(*) AS docs FROM documents;",
            "name": "Count docs",
        },
    )


def _run_harness(srv: ShaperServer, tmp_path, *creds: str) -> None:
    app_js = tmp_path / "app.js"
    app_js.write_text(ui._JS)
    harness = __file__.replace("test_ui_js.py", "ui_dom_harness.js")
    proc = subprocess.run(
        ["node", harness, str(app_js), f"http://127.0.0.1:{srv.port}",
         *creds],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "UI_HARNESS_OK" in proc.stdout


def test_spa_end_to_end(spark, tmp_path):
    srv = ShaperServer(spark).start()
    try:
        _seed(srv)
        _run_harness(srv, tmp_path)
    finally:
        srv.stop()


def test_spa_login_flow(spark, tmp_path):
    srv = ShaperServer(spark).start()
    try:
        _seed(srv)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/auth/setup",
            data=json.dumps(
                {"email": "ui@test.dev", "password": "hunter22",
                 "name": "UI Tester"}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        _run_harness(srv, tmp_path, "ui@test.dev", "hunter22")
    finally:
        srv.stop()
