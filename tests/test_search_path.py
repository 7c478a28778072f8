"""DuckDB-style search_path: unqualified names fall back through the
configured schema list (reference: server/core/app.go:546-561 prepends
SET search_path = 'main,"<internal>".main,system' to every query)."""

import pytest

from shaper_spark.engine import (
    _execute_side_effect,
    _parse_search_path,
    _run_query,
    _VarState,
)


class TestParse:
    def test_reference_shape(self):
        assert _parse_search_path('main,"mydb".main,system') == ["mydb"]

    def test_plain_and_dotted(self):
        assert _parse_search_path("a, b.main , main") == ["a", "b"]

    def test_dedup_and_empty(self):
        assert _parse_search_path("x,x,,system") == ["x"]


class TestResolution:
    @pytest.fixture()
    def extra_db(self, spark):
        spark.sql("CREATE DATABASE IF NOT EXISTS sp_extra")
        spark.sql("DROP TABLE IF EXISTS sp_extra.sp_hidden")
        spark.sql(
            "CREATE TABLE sp_extra.sp_hidden USING parquet AS "
            "SELECT 42 AS answer"
        )
        yield "sp_extra"
        spark.sql("DROP TABLE IF EXISTS sp_extra.sp_hidden")
        spark.sql("DROP DATABASE IF EXISTS sp_extra")

    def test_unqualified_resolves_through_path(self, spark, extra_db):
        vars_ = _VarState()
        _execute_side_effect(
            spark,
            "SET search_path = 'main,\"sp_extra\".main,system'",
            vars_,
            {},
        )
        assert vars_.search_path == ["sp_extra"]
        cols, rows = _run_query(
            spark, "SELECT answer FROM sp_hidden", vars_, {}, 100
        )
        assert rows == [[42]]

    def test_current_namespace_wins_first(self, spark, extra_db):
        # a temp view with the same name shadows the search-path schema
        spark.sql("SELECT 7 AS answer").createOrReplaceTempView("sp_hidden")
        try:
            vars_ = _VarState()
            _execute_side_effect(
                spark, "SET search_path = '\"sp_extra\".main'", vars_, {}
            )
            _, rows = _run_query(
                spark, "SELECT answer FROM sp_hidden", vars_, {}, 100
            )
            assert rows == [[7]]
        finally:
            spark.catalog.dropTempView("sp_hidden")

    def test_without_path_still_fails(self, spark, extra_db):
        with pytest.raises(Exception):
            _run_query(
                spark, "SELECT answer FROM sp_hidden", _VarState(), {}, 100
            )

    def test_reset_clears(self, spark, extra_db):
        vars_ = _VarState()
        _execute_side_effect(
            spark, "SET search_path = 'sp_extra'", vars_, {}
        )
        _execute_side_effect(spark, "RESET search_path", vars_, {})
        assert vars_.search_path == []
        with pytest.raises(Exception):
            _run_query(
                spark, "SELECT answer FROM sp_hidden", vars_, {}, 100
            )

    def test_current_database_restored_after_fallback(self, spark, extra_db):
        before = spark.catalog.currentDatabase()
        vars_ = _VarState()
        _execute_side_effect(
            spark, "SET search_path = 'sp_extra'", vars_, {}
        )
        _run_query(spark, "SELECT answer FROM sp_hidden", vars_, {}, 100)
        assert spark.catalog.currentDatabase() == before
