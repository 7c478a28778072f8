"""Warehouse compaction: the small-files maintenance loop for
micro-batch ingest (ingest appends one parquet file per batch
partition; compact_table rewrites to size-targeted files)."""

import pytest
from pyspark.sql import functions as F

from shaper_spark import plancache
from shaper_spark.compaction import compact_table, table_file_stats


def _fresh(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestCompaction:
    def test_many_small_appends_compact_to_one_file(self, spark):
        _fresh(spark, "cmp_t")
        spark.sql("CREATE TABLE cmp_t (v BIGINT) USING parquet")
        # simulate 12 tiny ingest batches -> >= 12 files
        for i in range(12):
            spark.range(i * 10, (i + 1) * 10).toDF("v").coalesce(
                1
            ).write.mode("append").insertInto("cmp_t")
        before = table_file_stats(spark, "cmp_t")
        assert before["n_files"] >= 12
        assert before["total_bytes"] > 0

        report = compact_table(spark, "cmp_t")
        assert report["compacted"] is True
        assert report["after"]["n_files"] == 1  # tiny table -> one file
        # contents untouched
        assert spark.table("cmp_t").count() == 120
        assert spark.table("cmp_t").agg(F.sum("v")).collect()[0][0] == sum(
            range(120)
        )
        _fresh(spark, "cmp_t")

    def test_already_compact_is_noop(self, spark):
        _fresh(spark, "cmp_n")
        spark.sql(
            "CREATE TABLE cmp_n USING parquet AS SELECT id AS v FROM range(10)"
        )
        first = compact_table(spark, "cmp_n")
        # CTAS of range(10) may produce multiple files; after one
        # compaction the table must be a no-op for the next call
        if first["compacted"]:
            assert first["after"]["n_files"] == 1
        report = compact_table(spark, "cmp_n")
        assert report["compacted"] is False
        assert spark.table("cmp_n").count() == 10
        _fresh(spark, "cmp_n")

    def test_compaction_flushes_plan_cache(self, spark):
        _fresh(spark, "cmp_pc")
        spark.sql("CREATE TABLE cmp_pc (v BIGINT) USING parquet")
        for i in range(3):
            spark.range(5).toDF("v").coalesce(1).write.mode(
                "append"
            ).insertInto("cmp_pc")
        sql = "SELECT count(*) AS n FROM cmp_pc"
        assert plancache.analyzed(spark, sql).collect()[0]["n"] == 15
        gen = plancache.stats()["generation"]
        compact_table(spark, "cmp_pc", force=True)
        # the staging swap bump()ed — a post-compaction render must not
        # serve the pre-compaction file listing
        assert plancache.stats()["generation"] > gen
        assert plancache.analyzed(spark, sql).collect()[0]["n"] == 15
        _fresh(spark, "cmp_pc")

    def test_rejects_bad_target(self, spark):
        with pytest.raises(ValueError):
            compact_table(spark, "whatever", target_file_bytes=0)
