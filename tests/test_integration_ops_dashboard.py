"""Unified-engine integration: training-pipeline operator output feeds
the dashboard surface (dialect rewrite, custom types, render inference)
in one SparkSession — the composition the reference cannot express
(its engine has no corpus operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shaper_spark.engine import query_dashboard
from shaper_spark.session import register_sf_tables


class TestOperatorOutputsAsDashboards:
    def test_dup_span_stats_chart_dashboard(self, spark):
        from shaper_spark.operators.dupspans import duplicated_span_stats

        register_sf_tables(spark, "/root/testdata/sf0.001")
        docs = spark.table("documents")
        stats = duplicated_span_stats(docs, "doc_id", "text", k=8).join(
            docs.select(F.col("doc_id").alias("id"), "source"), "id"
        )
        stats.createOrReplaceTempView("dup_stats")
        result = query_dashboard(
            spark,
            """
            SELECT 'Duplication by Source'::SECTION;
            SELECT round(avg(dup_frac) * 100, 2)::PERCENT AS avg_dup
            FROM dup_stats;
            SELECT source::XAXIS, round(avg(dup_frac), 4)::BARCHART AS frac
            FROM dup_stats GROUP BY ALL ORDER BY ALL;
            """,
            dashboard_id="intg",
        )
        tree = result.to_dict()
        sections = tree["sections"]
        # SECTION emits a header section; the queries fill the content
        # section after it (engine.py section classifier)
        assert sections[0]["type"] == "header"
        assert sections[0]["title"] == "Duplication by Source"
        queries = sections[1]["queries"]
        # 1x1 percent-tagged result → value widget; string x-axis → the
        # horizontal barchart variant — the normal inference cascade
        assert queries[0]["render"]["type"] == "value"
        assert queries[1]["render"]["type"] == "barchartHorizontal"
        assert len(queries[1]["rows"]) == 20  # one bar per source

    def test_gopher_verdicts_drive_dropdown_variable(self, spark):
        from shaper_spark.operators.text import gopher_quality_filter

        register_sf_tables(spark, "/root/testdata/sf0.001")
        docs = spark.table("documents")
        gopher_quality_filter(docs, "doc_id", "text").createOrReplaceTempView(
            "verdicts"
        )
        result = query_dashboard(
            spark,
            """
            SELECT 'Filter Explorer'::SECTION;
            SELECT DISTINCT explode(reasons)::DROPDOWN AS reason
            FROM verdicts ORDER BY 1;
            SELECT count(*)::TEXT_LARGE AS n FROM verdicts
            WHERE array_contains(reasons, getvariable('reason'));
            """,
            params={"reason": "dup_words"},
            dashboard_id="intg2",
        )
        tree = result.to_dict()
        allq = [
            q for s in tree["sections"] for q in (s.get("queries") or [])
        ]
        dropdown = next(
            q for q in allq if (q.get("render") or {}).get("type") == "dropdown"
        )
        # the dropdown options come from the operator's reason array
        opts = [r[0] for r in dropdown["rows"]]
        assert opts and set(opts) <= {
            "word_count", "avg_word_len", "dup_words", "top_bigram"
        }
        count_q = allq[-1]
        # TEXT_LARGE renders as a value widget with the large size, per
        # the reference cascade (render.py:478-492)
        assert count_q["render"]["type"] == "value"
        assert count_q["rows"][0][0] >= 0
