"""Introspection tests (reference server/core/duckdb_schema_test.go:18,117
semantics: schema tree + ignore filters)."""

from __future__ import annotations

from shaper_spark.introspect import get_schema, should_ignore


class TestShouldIgnore:
    def test_database_level(self):
        assert should_ignore("db1", "main", "t", ["db1"]) is True
        assert should_ignore("db2", "main", "t", ["db1"]) is False

    def test_schema_level(self):
        assert should_ignore("db1", "main", "t", ["db1.main"]) is True
        assert should_ignore("db1", "other", "t", ["db1.main"]) is False

    def test_object_level(self):
        assert should_ignore("db1", "main", "t", ["db1.main.t"]) is True
        assert should_ignore("db1", "main", "u", ["db1.main.t"]) is False

    def test_empty_list(self):
        assert should_ignore("db1", "main", "t", None) is False
        assert should_ignore("db1", "main", "t", []) is False


class TestGetSchema:
    def test_tree_contains_temp_views(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW introspect_v AS "
            "SELECT 1 AS a, 'x' AS b"
        )
        res = get_schema(spark)
        assert len(res.databases) == 1
        db = res.databases[0]
        assert db.name == "spark_catalog"
        all_tables = {t.name: t for s in db.schemas for t in s.tables}
        assert "introspect_v" in all_tables
        cols = {c.name: c for c in all_tables["introspect_v"].columns}
        assert cols["a"].type == "int"
        assert cols["b"].type == "string"

    def test_view_definition_captured(self, spark):
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW introspect_def AS SELECT 42 AS v")
        res = get_schema(spark)
        views = {
            v.name: v for s in res.databases[0].schemas for v in s.views
        }
        assert "introspect_def" in views
        assert "42" in views["introspect_def"].definition

    def test_ignore_filters_objects(self, spark):
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW introspect_hide AS SELECT 1 AS v")
        res = get_schema(spark, ignore=["spark_catalog.default.introspect_hide"])
        names = {t.name for s in res.databases[0].schemas for t in s.tables}
        assert "introspect_hide" not in names

    def test_ignore_whole_catalog(self, spark):
        res = get_schema(spark, ignore=["spark_catalog"])
        assert res.databases == []

    def test_to_dict_shape(self, spark):
        d = get_schema(spark).to_dict()
        assert set(d) == {"databases", "extensions", "secrets"}
        assert all(
            set(s) == {"name", "tables", "views", "enums"}
            for db in d["databases"]
            for s in db["schemas"]
        )


class TestResponseShapeParity:
    """UI-shape parity with the reference response
    (server/core/duckdb_schema.go:31-35 initializes Databases,
    Extensions, Secrets even when empty; schemas carry enums)."""

    def test_top_level_keys(self, spark):
        from shaper_spark.secrets import clear_secrets

        clear_secrets(spark)
        d = get_schema(spark).to_dict()
        assert set(d.keys()) == {"databases", "extensions", "secrets"}
        # r7: extensions report the session's real core sources;
        # secrets mirror the (empty until CREATE SECRET) registry
        assert {e["name"] for e in d["extensions"]} >= {"parquet", "json"}
        assert d["secrets"] == []

    def test_schema_level_keys(self, spark):
        d = get_schema(spark).to_dict()
        schema = d["databases"][0]["schemas"][0]
        assert set(schema.keys()) == {"name", "tables", "views", "enums"}
        assert schema["enums"] == []

    def test_column_keys(self, spark, sf_dir):
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        d = get_schema(spark).to_dict()
        tables = {
            t["name"]: t
            for s in d["databases"][0]["schemas"]
            for t in s["tables"] + s["views"]
        }
        assert "region" in tables
