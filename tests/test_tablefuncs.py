"""SQL-callable duckdb_*() catalog table functions — the reference's
schema queries (server/core/duckdb_schema.go:21-287) run verbatim
through the engine."""

from shaper_spark.engine import _run_query, _VarState


def _q(spark, sql):
    cols, rows = _run_query(spark, sql, _VarState(), {}, 3000)
    return [c.name for c in cols], rows


class TestDuckdbTableFunctions:
    def test_databases_shape(self, spark):
        cols, rows = _q(
            spark,
            "SELECT database_name FROM duckdb_databases() "
            "WHERE NOT internal ORDER BY database_name",
        )
        assert cols == ["database_name"]
        assert [r[0] for r in rows] == [spark.catalog.currentCatalog()]

    def test_schemas_filtered_like_reference(self, spark):
        cols, rows = _q(
            spark,
            "SELECT schema_name FROM duckdb_schemas() "
            "WHERE schema_name NOT IN ('information_schema', 'pg_catalog') "
            "ORDER BY schema_name",
        )
        names = [r[0] for r in rows]
        assert spark.catalog.currentDatabase() in names

    def test_tables_lists_registered_views(self, spark):
        spark.range(3).createOrReplaceTempView("tf_probe")
        cols, rows = _q(
            spark,
            "SELECT table_name FROM duckdb_tables() "
            "WHERE NOT internal ORDER BY table_name",
        )
        assert "tf_probe" in [r[0] for r in rows]

    def test_columns_match_reference_projection(self, spark):
        spark.sql(
            "SELECT CAST(1 AS INT) AS a, CAST('x' AS STRING) AS b"
        ).createOrReplaceTempView("tf_cols")
        cols, rows = _q(
            spark,
            "SELECT column_name, data_type, is_nullable, column_default "
            "FROM duckdb_columns() WHERE table_name = 'tf_cols' "
            "ORDER BY column_index",
        )
        assert cols == [
            "column_name",
            "data_type",
            "is_nullable",
            "column_default",
        ]
        assert [r[0] for r in rows] == ["a", "b"]
        assert rows[0][1].lower() in ("int", "integer")

    def test_snapshot_is_fresh_per_call(self, spark):
        sql = (
            "SELECT count(*) AS n FROM duckdb_tables() "
            "WHERE table_name = 'tf_fresh'"
        )
        _, rows = _q(spark, sql)
        assert rows[0][0] == 0
        spark.range(1).createOrReplaceTempView("tf_fresh")
        _, rows = _q(spark, sql)
        assert rows[0][0] == 1
        spark.catalog.dropTempView("tf_fresh")
        _, rows = _q(spark, sql)
        assert rows[0][0] == 0

    def test_empty_but_shaped_families(self, spark):
        # types/constraints: no Spark counterpart, empty but shaped;
        # secrets: live registry, empty until a CREATE SECRET runs
        for fn, col in [
            ("duckdb_secrets()", "name"),
            ("duckdb_types()", "type_name"),
            ("duckdb_constraints()", "constraint_type"),
        ]:
            cols, rows = _q(spark, f"SELECT {col} FROM {fn}")
            assert cols == [col]
            assert rows == []

    def test_reference_loaded_installed_predicate_runs(self, spark):
        # the exact extension query the reference issues; since r7 the
        # view reports Spark's real core data sources, so the rows
        # surviving the reference's core-name exclusions are Spark's
        # additional built-ins
        _, rows = _q(
            spark,
            "SELECT extension_name, description FROM duckdb_extensions() "
            "WHERE loaded AND installed AND extension_name NOT IN "
            "('autocomplete', 'core_functions', 'icu', 'jemalloc', "
            "'json', 'parquet') ORDER BY extension_name",
        )
        assert [r[0] for r in rows] == ["csv", "jdbc", "orc", "text"]

    def test_call_inside_string_literal_untouched(self, spark):
        # r5 advice: 'duckdb_tables()' as DATA must not be rewritten
        # (and must not bypass the plan cache)
        from shaper_spark.tablefuncs import expand_table_functions

        sql = "SELECT 'duckdb_tables()' AS hint"
        rewritten, used = expand_table_functions(spark, sql)
        assert rewritten == sql
        assert used is False
        _, rows = _q(spark, sql)
        assert rows[0][0] == "duckdb_tables()"

    def test_literal_and_real_call_mixed(self, spark):
        from shaper_spark.tablefuncs import expand_table_functions

        sql = (
            "SELECT 'see duckdb_tables() docs' AS hint, count(*) AS n "
            "FROM duckdb_tables()"
        )
        rewritten, used = expand_table_functions(spark, sql)
        assert used is True
        assert "'see duckdb_tables() docs'" in rewritten
        assert "FROM __duckdb_tables" in rewritten

    def test_escaped_quote_literal(self, spark):
        from shaper_spark.tablefuncs import expand_table_functions

        sql = "SELECT 'it''s duckdb_views() here' AS s"
        rewritten, used = expand_table_functions(spark, sql)
        assert rewritten == sql and used is False


class TestInformationSchema:
    """information_schema.{tables,columns,schemata} (r11): ANSI
    introspection with DuckDB shapes — each relation listed once,
    DuckDB type spellings."""

    def test_tables_lists_each_relation_once(self, spark):
        from shaper_spark.engine import query_dashboard

        r = query_dashboard(
            spark,
            "SELECT table_name, table_type FROM information_schema.tables"
            " WHERE table_name = 'region';",
            dashboard_id="is1",
        )
        rows = r.sections[0].queries[0].rows
        assert len(rows) == 1 and rows[0][1] in ("VIEW", "BASE TABLE")

    def test_columns_duck_spellings(self, spark):
        from shaper_spark.engine import query_dashboard

        r = query_dashboard(
            spark,
            "SELECT column_name, data_type, is_nullable, ordinal_position"
            " FROM information_schema.columns WHERE table_name = 'region'"
            " ORDER BY ordinal_position;",
            dashboard_id="is2",
        )
        rows = r.sections[0].queries[0].rows
        assert rows[0] == ["r_regionkey", "INTEGER", "YES", 1]
        assert rows[1][1] == "VARCHAR"

    def test_string_literal_untouched(self, spark):
        from shaper_spark.engine import query_dashboard

        r = query_dashboard(
            spark,
            "SELECT 'information_schema.tables' AS s;",
            dashboard_id="is3",
        )
        assert r.sections[0].queries[0].rows == [
            ["information_schema.tables"]
        ]
