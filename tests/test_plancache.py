"""Analyzed-plan cache: hit/miss accounting, mutation invalidation, and
the read-only gate that keeps eagerly-executed commands out of it."""

import pytest
from pyspark.sql import functions as F

from shaper_spark import plancache
from shaper_spark.engine import _Macro, _run_query, _VarState


def _vars():
    return _VarState()


@pytest.fixture(autouse=True)
def _fresh_cache():
    plancache.bump()
    yield
    plancache.bump()


class TestPlanCache:
    def test_hit_returns_same_dataframe_and_results(self, spark):
        sql = "SELECT r_regionkey, count(*) AS c FROM region GROUP BY 1"
        before = plancache.stats()
        a = plancache.analyzed(spark, sql)
        b = plancache.analyzed(spark, sql)
        after = plancache.stats()
        assert b is a  # the analyzed plan object is reused
        assert after["hits"] == before["hits"] + 1
        assert sorted(tuple(r) for r in a.collect()) == sorted(
            tuple(r) for r in spark.sql(sql).collect()
        )

    def test_execution_still_runs_on_every_collect(self, spark):
        # a cached plan over a temp view must re-read the view's data on
        # each collect (laziness): mutate the underlying view between
        # collects WITH a bump and observe fresh results
        spark.range(3).createOrReplaceTempView("pc_src")
        sql = "SELECT count(*) AS n FROM pc_src"
        df = plancache.analyzed(spark, sql)
        assert df.collect()[0]["n"] == 3
        spark.range(7).createOrReplaceTempView("pc_src")
        plancache.bump()
        assert plancache.analyzed(spark, sql).collect()[0]["n"] == 7

    def test_bump_invalidates(self, spark):
        sql = "SELECT 1 AS one"
        a = plancache.analyzed(spark, sql)
        plancache.bump()
        b = plancache.analyzed(spark, sql)
        assert b is not a

    def test_capacity_is_bounded(self, spark):
        for i in range(plancache._CAPACITY + 10):
            plancache.analyzed(spark, f"SELECT {i} AS v")
        assert plancache.stats()["size"] <= plancache._CAPACITY


class TestEngineIntegration:
    def test_repeated_select_hits_cache(self, spark):
        sql = "SELECT n_name FROM nation ORDER BY n_name LIMIT 3"
        _run_query(spark, sql, _vars(), {}, 100)
        before = plancache.stats()["hits"]
        cols, rows = _run_query(spark, sql, _vars(), {}, 100)
        assert plancache.stats()["hits"] == before + 1
        assert len(rows) == 3

    def test_repeated_insert_is_not_cached_and_reexecutes(
        self, spark, tmp_path
    ):
        # Commands execute eagerly inside spark.sql(); a cache hit would
        # silently skip the second INSERT. The read-only gate must route
        # them around the cache — and each run must mutate the table.
        spark.sql("DROP TABLE IF EXISTS pc_tbl")
        spark.sql("CREATE TABLE pc_tbl (v INT) USING parquet")
        ins = "INSERT INTO pc_tbl VALUES (1)"
        _run_query(spark, ins, _vars(), {}, 100)
        _run_query(spark, ins, _vars(), {}, 100)
        assert spark.table("pc_tbl").count() == 2
        spark.sql("DROP TABLE pc_tbl")

    def test_create_temp_view_invalidates_cached_select(self, spark):
        from shaper_spark.engine import _execute_side_effect

        spark.range(2).createOrReplaceTempView("pc_view_src")
        _execute_side_effect(
            spark,
            "CREATE OR REPLACE TEMP VIEW pc_v AS SELECT * FROM pc_view_src",
            _vars(),
            {},
        )
        sel = "SELECT count(*) AS n FROM pc_v"
        _, rows = _run_query(spark, sel, _vars(), {}, 100)
        assert rows[0][0] == 2
        spark.range(5).createOrReplaceTempView("pc_view_src")
        _execute_side_effect(
            spark,
            "CREATE OR REPLACE TEMP VIEW pc_v AS SELECT * FROM pc_view_src",
            _vars(),
            {},
        )
        _, rows = _run_query(spark, sel, _vars(), {}, 100)
        assert rows[0][0] == 5

    def test_dml_invalidates_cached_select(self, spark):
        spark.sql("DROP TABLE IF EXISTS pc_dml")
        spark.sql("CREATE TABLE pc_dml USING parquet AS SELECT 1 AS v")
        sel = "SELECT sum(v) AS s FROM pc_dml"
        _, rows = _run_query(spark, sel, _vars(), {}, 100)
        assert rows[0][0] == 1
        _run_query(spark, "UPDATE pc_dml SET v = 9", _vars(), {}, 100)
        _, rows = _run_query(spark, sel, _vars(), {}, 100)
        assert rows[0][0] == 9
        spark.sql("DROP TABLE pc_dml")


class TestConcurrency:
    def test_threaded_dashboard_renders_share_the_cache(self, spark):
        import threading

        sql = "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1"
        plancache.bump()
        results, errors = [], []

        def render():
            try:
                _, rows = _run_query(spark, sql, _vars(), {}, 100)
                results.append(sorted(tuple(r) for r in rows))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=render) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len({str(r) for r in results}) == 1  # all identical
        st = plancache.stats()
        assert st["size"] >= 1
        assert st["hits"] + st["misses"] >= 8
