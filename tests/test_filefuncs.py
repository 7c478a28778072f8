"""DuckDB file-reading surface: read_parquet/read_csv/read_json and the
``FROM 'file.ext'`` sugar (reference admits these as plain SELECT
surface — server/core/sql_validation.go gates the statement head only).
"""

import os

import pytest

from shaper_spark.engine import _run_query, _VarState
from shaper_spark.filefuncs import (
    FileFunctionError,
    expand_file_functions,
)


def _q(spark, sql):
    cols, rows = _run_query(spark, sql, _VarState(), {}, 3000)
    return [c.name for c in cols], rows


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("filefuncs") / "people.csv"
    p.write_text("id|name\n1|ada\n2|bob\n3|eve\n")
    return str(p)


@pytest.fixture(scope="module")
def json_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("filefuncs") / "rows.jsonl"
    p.write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n')
    return str(p)


class TestReadParquet:
    def test_read_parquet_counts_match_registered_table(self, spark, sf_dir):
        path = os.path.join(sf_dir, "region.parquet")
        cols, rows = _q(
            spark, f"SELECT count(*) AS n FROM read_parquet('{path}')"
        )
        assert cols == ["n"]
        (expected,) = spark.table("region").selectExpr("count(*)").first()
        assert rows[0][0] == expected

    def test_parquet_scan_alias(self, spark, sf_dir):
        path = os.path.join(sf_dir, "nation.parquet")
        _, rows = _q(
            spark,
            f"SELECT n_name FROM parquet_scan('{path}') ORDER BY n_name LIMIT 2",
        )
        assert len(rows) == 2

    def test_from_file_sugar(self, spark, sf_dir):
        path = os.path.join(sf_dir, "region.parquet")
        cols, rows = _q(
            spark, f"SELECT r_name FROM '{path}' ORDER BY r_name"
        )
        assert cols == ["r_name"]
        assert len(rows) == 5

    def test_from_first_with_file(self, spark, sf_dir):
        path = os.path.join(sf_dir, "region.parquet")
        _, rows = _q(spark, f"FROM '{path}' SELECT count(*) AS n")
        assert rows[0][0] == 5

    def test_join_file_against_table(self, spark, sf_dir):
        path = os.path.join(sf_dir, "nation.parquet")
        _, rows = _q(
            spark,
            "SELECT r.r_name, count(*) AS n FROM region r "
            f"JOIN '{path}' n ON r.r_regionkey = n.n_regionkey "
            "GROUP BY ALL ORDER BY r.r_name",
        )
        assert len(rows) == 5
        assert sum(r[1] for r in rows) == 25

    def test_glob_paths(self, spark, sf_dir):
        glob = os.path.join(sf_dir, "reg*.parquet")
        _, rows = _q(
            spark, f"SELECT count(*) AS n FROM read_parquet('{glob}')"
        )
        assert rows[0][0] == 5

    def test_path_list(self, spark, sf_dir):
        p = os.path.join(sf_dir, "region.parquet")
        _, rows = _q(
            spark,
            f"SELECT count(*) AS n FROM read_parquet(['{p}', '{p}'])",
        )
        assert rows[0][0] == 10


class TestReadCsvJson:
    def test_read_csv_with_options(self, spark, csv_path):
        cols, rows = _q(
            spark,
            f"SELECT id, name FROM read_csv('{csv_path}', delim='|', "
            "header=true) ORDER BY id",
        )
        assert cols == ["id", "name"]
        assert [tuple(r) for r in rows] == [(1, "ada"), (2, "bob"), (3, "eve")]

    def test_read_csv_auto(self, spark, csv_path):
        _, rows = _q(
            spark,
            f"SELECT count(*) AS n FROM read_csv_auto('{csv_path}', sep='|')",
        )
        assert rows[0][0] == 3

    def test_columns_cast_select(self, spark, csv_path):
        cols, rows = _q(
            spark,
            f"SELECT * FROM read_csv('{csv_path}', delim='|', "
            "columns={'id': 'BIGINT', 'name': 'VARCHAR'}) ORDER BY id",
        )
        assert cols == ["id", "name"]
        assert rows[0][0] == 1

    def test_read_json(self, spark, json_path):
        _, rows = _q(
            spark,
            f"SELECT k, v FROM read_json_auto('{json_path}') ORDER BY k",
        )
        assert [tuple(r) for r in rows] == [(1, "x"), (2, "y")]

    def test_from_jsonl_sugar(self, spark, json_path):
        _, rows = _q(spark, f"SELECT count(*) AS n FROM '{json_path}'")
        assert rows[0][0] == 2


class TestExpansionMechanics:
    def test_quoted_literal_not_expanded(self, spark):
        sql = "SELECT 'call read_parquet(''x'')' AS s"
        out, used = expand_file_functions(spark, sql)
        assert out == sql and not used

    def test_no_file_calls_is_noop(self, spark):
        sql = "SELECT count(*) FROM region"
        out, used = expand_file_functions(spark, sql)
        assert out == sql and not used

    def test_used_flag_set(self, spark, sf_dir):
        p = os.path.join(sf_dir, "region.parquet")
        out, used = expand_file_functions(
            spark, f"SELECT * FROM read_parquet('{p}')"
        )
        assert used and "read_parquet" not in out and "__file_" in out

    def test_unsupported_option_raises(self, spark, sf_dir):
        p = os.path.join(sf_dir, "region.parquet")
        with pytest.raises(FileFunctionError, match="unsupported"):
            expand_file_functions(
                spark, f"SELECT * FROM read_csv('{p}', bogus=1)"
            )

    def test_non_literal_path_raises(self, spark):
        with pytest.raises(FileFunctionError, match="string literal"):
            expand_file_functions(
                spark, "SELECT * FROM read_parquet(some_col)"
            )

    def test_filter_pushdown_reaches_scan(self, spark, sf_dir):
        p = os.path.join(sf_dir, "orders.parquet")
        out, _ = expand_file_functions(
            spark, f"SELECT o_orderkey FROM read_parquet('{p}')"
        )
        plan = spark.sql(
            out.replace(
                "SELECT o_orderkey",
                "SELECT o_orderkey",
            )
            + " WHERE o_orderkey = 1"
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)" in plan


class TestSummarizeFiles:
    def test_summarize_read_parquet(self, spark, sf_dir):
        p = os.path.join(sf_dir, "region.parquet")
        cols, rows = _q(spark, f"SUMMARIZE read_parquet('{p}')")
        names = [getattr(c, "name", c) for c in cols]
        assert "column_name" in names
        assert {r[0] for r in rows} == {"r_regionkey", "r_name"}

    def test_summarize_bare_path(self, spark, sf_dir):
        p = os.path.join(sf_dir, "nation.parquet")
        _, rows = _q(spark, f"SUMMARIZE '{p}'")
        assert len(rows) == 3  # nation's three columns
