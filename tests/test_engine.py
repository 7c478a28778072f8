"""Dashboard-executor tests — ports of the reference's TestQueryDashboard
table-driven subtests (server/core/get_dashboard_test.go) plus
Spark-specific coverage."""

import pytest

from shaper_spark.engine import DashboardError, query_dashboard


def test_basic_query(spark):
    r = query_dashboard(spark, "SELECT 1 AS val")
    assert len(r.sections) == 1
    s = r.sections[0]
    assert s.type == "content"
    assert len(s.queries) == 1
    q = s.queries[0]
    assert q.render["type"] == "value"
    assert q.columns[0].name == "val"
    assert q.columns[0].type == "number"
    assert q.rows == [[1]]


def test_label_then_value(spark):
    r = query_dashboard(spark, "SELECT 'Revenue'::LABEL; SELECT 42 AS total;")
    q = r.sections[0].queries[0]
    assert q.render["type"] == "value"
    assert q.render["label"] == "Revenue"


def test_section_title(spark):
    r = query_dashboard(
        spark, "SELECT 'My Dash'::SECTION; SELECT 1 AS x;"
    )
    assert r.sections[0].type == "header"
    assert r.sections[0].title == "My Dash"
    assert r.name == "My Dash"
    assert r.sections[1].type == "content"


def test_barchart_stacked(spark):
    r = query_dashboard(
        spark,
        """
        SELECT 'Events per day'::LABEL;
        SELECT date_trunc('day', ts)::XAXIS, event_type::CATEGORY,
               count()::BARCHART_STACKED AS n
        FROM events GROUP BY ALL ORDER BY ALL;
        """,
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "barchartHorizontalStacked"
    assert q.render["label"] == "Events per day"
    tags = [c.tag for c in q.columns]
    assert tags == ["index", "category", "value"]
    assert q.columns[0].type == "date"
    # index values are unix ms
    assert isinstance(q.rows[0][0], int)
    assert r.min_time_value is not None and r.max_time_value is not None
    assert r.min_time_value <= r.max_time_value


def test_linechart_with_bands(spark):
    r = query_dashboard(
        spark,
        """
        SELECT date_trunc('day', ts)::XAXIS,
               avg(value)::LINECHART AS v,
               avg(value) - 1::BAND_LOWER AS lo,
               avg(value) + 1::BAND_UPPER AS hi
        FROM events GROUP BY 1 ORDER BY 1;
        """,
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "linechart"
    assert [c.tag for c in q.columns] == ["index", "value", "band_lower", "band_upper"]


def test_table_fallback(spark):
    r = query_dashboard(spark, "SELECT event_type, value FROM events LIMIT 5")
    q = r.sections[0].queries[0]
    assert q.render["type"] == "table"
    assert len(q.rows) == 5


def test_row_cap(spark):
    r = query_dashboard(spark, "SELECT * FROM events", max_rows=10)
    assert len(r.sections[0].queries[0].rows) == 10


def test_dropdown_sets_variable(spark):
    r = query_dashboard(
        spark,
        """
        SELECT DISTINCT event_type::DROPDOWN AS etype FROM events ORDER BY 1;
        SELECT count(*) AS n FROM events WHERE event_type = getvariable('etype');
        """,
    )
    assert r.sections[0].type == "header"
    content = r.sections[1]
    assert content.queries[0].render["type"] == "value"
    assert content.queries[0].rows[0][0] > 0


def test_dropdown_param_override(spark):
    types = [
        r[0]
        for r in spark.sql("SELECT DISTINCT event_type FROM events ORDER BY 1").collect()
    ]
    chosen = types[-1]
    r = query_dashboard(
        spark,
        """
        SELECT DISTINCT event_type::DROPDOWN AS etype FROM events ORDER BY 1;
        SELECT getvariable('etype') AS chosen;
        """,
        params={"etype": chosen},
    )
    assert r.sections[1].queries[0].rows[0][0] == chosen


def test_set_variable(spark):
    r = query_dashboard(
        spark,
        """
        SET VARIABLE lim = 3;
        SELECT count(*) AS n FROM (SELECT * FROM events LIMIT 3)
        WHERE 3 = getvariable('lim');
        """,
    )
    assert r.sections[0].queries[0].rows[0][0] == 3


def test_unset_variable_reported(spark):
    r = query_dashboard(spark, "SELECT getvariable('nope') AS x")
    assert r.unset_variables == ["nope"]


def test_disallowed_statement(spark):
    with pytest.raises(DashboardError):
        query_dashboard(spark, "DROP TABLE events")


def test_hidden_section(spark):
    r = query_dashboard(
        spark,
        """
        SELECT ''::SECTION WHERE 1 = 0;
        SELECT 1 AS hidden_query;
        SELECT 'Visible'::SECTION;
        SELECT 2 AS visible_query;
        """,
    )
    all_queries = [q for s in r.sections for q in s.queries]
    assert len(all_queries) == 1
    assert all_queries[0].rows == [[2]]


def test_placeholder(spark):
    r = query_dashboard(spark, "SELECT 'coming soon'::PLACEHOLDER")
    assert r.sections[0].queries[0].render["type"] == "placeholder"


def test_compare_value(spark):
    r = query_dashboard(spark, "SELECT 10.5 AS cur, 9.0::COMPARE AS prev")
    q = r.sections[0].queries[0]
    assert q.render["type"] == "value"
    assert q.columns[1].tag == "compare"


def test_gauge(spark):
    r = query_dashboard(
        spark,
        "SELECT 0.75::GAUGE_PERCENT AS pct, [0.0, 0.5, 1.0]::RANGE AS rng",
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "gauge"
    cats = q.render["gaugeCategories"]
    assert [(c["from"], c["to"]) for c in cats] == [(0.0, 0.5), (0.5, 1.0)]


def test_piechart(spark):
    r = query_dashboard(
        spark,
        """
        SELECT event_type::PIECHART_CATEGORY, count()::PIECHART AS n
        FROM events GROUP BY 1;
        """,
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "piechart"
    assert q.columns[0].tag == "category"
    assert q.columns[1].tag == "value"


def test_boxplot(spark):
    r = query_dashboard(
        spark,
        """
        SELECT event_type::XAXIS, BOXPLOT(value) AS bp
        FROM events GROUP BY event_type;
        """,
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "boxplot"
    row0 = q.rows[0]
    bp = row0[1]
    assert set(bp) == {"max", "min", "outliers", "q1", "q2", "q3"}
    assert bp["min"] <= bp["q1"] <= bp["q2"] <= bp["q3"] <= bp["max"]


def test_marklines(spark):
    r = query_dashboard(
        spark,
        """
        SELECT 'target'::LABEL, 50.0::YLINE;
        SELECT date_trunc('day', ts)::XAXIS, avg(value)::LINECHART AS v
        FROM events GROUP BY 1 ORDER BY 1;
        """,
    )
    q = r.sections[0].queries[0]
    assert q.render["type"] == "linechart"
    marks = q.render["markLines"]
    assert marks == [{"value": 50.0, "isYaxis": True, "label": "target"}]


def test_reload(spark):
    r = query_dashboard(spark, "SELECT INTERVAL 1 HOUR AS r"
                                "; SELECT 1 AS x;")
    # no RELOAD tag → just a table/value; now with the tag:
    r = query_dashboard(spark, "SELECT (INTERVAL 1 HOUR)::RELOAD; SELECT 1 AS x;")
    assert r.reload_at > 0


def test_download_button(spark):
    r = query_dashboard(
        spark,
        """
        SELECT 'report'::DOWNLOAD_CSV;
        SELECT * FROM events;
        """,
        dashboard_id="dash1",
    )
    secs = [q for s in r.sections for q in s.queries]
    assert len(secs) == 1  # the query after the download marker is skipped
    q = secs[0]
    assert q.render["type"] == "button"
    assert q.rows[0][0].startswith("api/dashboards/dash1/download/report.csv")


def test_temp_view_side_effect(spark):
    r = query_dashboard(
        spark,
        """
        CREATE OR REPLACE TEMP VIEW my_tmp AS SELECT 99 AS v;
        SELECT v FROM my_tmp;
        """,
    )
    assert r.sections[0].queries[0].rows == [[99]]


def test_macro(spark):
    r = query_dashboard(
        spark,
        """
        CREATE TEMP MACRO double_it(x) AS x * 2;
        SELECT double_it(21) AS v;
        """,
    )
    assert r.sections[0].queries[0].rows == [[42]]


def test_summarize(spark):
    r = query_dashboard(spark, "SUMMARIZE events")
    q = r.sections[0].queries[0]
    assert q.render["type"] == "table"
    names = [c.name for c in q.columns]
    assert names[:4] == ["column_name", "column_type", "min", "max"]
    assert len(q.rows) == 6  # one per events column


def test_from_first(spark):
    r = query_dashboard(spark, "FROM events LIMIT 3")
    assert len(r.sections[0].queries[0].rows) == 3


def test_json_object_sniff(spark):
    r = query_dashboard(spark, "SELECT props FROM events LIMIT 3")
    q = r.sections[0].queries[0]
    assert q.columns[0].type == "object"
    assert isinstance(q.rows[0][0], dict)


def test_interval_duration_ms(spark):
    r = query_dashboard(spark, "SELECT INTERVAL 90 MINUTE AS dur")
    q = r.sections[0].queries[0]
    assert q.columns[0].type == "duration"
    assert q.rows[0][0] == 90 * 60 * 1000
