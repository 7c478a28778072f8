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


class TestCompactTaskStatement:
    def test_task_runs_compact_table(self, spark):
        import shutil
        from urllib.parse import urlparse

        from shaper_spark.tasks import execute_task

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        spark.sql("DROP TABLE IF EXISTS cmp_task")
        shutil.rmtree(f"{warehouse}/cmp_task", ignore_errors=True)
        spark.sql("CREATE TABLE cmp_task (v BIGINT) USING parquet")
        for i in range(6):
            spark.range(4).toDF("v").coalesce(1).write.mode(
                "append"
            ).insertInto("cmp_task")

        result = execute_task(spark, "COMPACT TABLE cmp_task;")
        assert result.success, [q.error for q in result.queries]
        q = result.queries[0]
        assert q.result_columns == [
            "compacted",
            "n_files_before",
            "n_files_after",
            "total_bytes",
            "n_target_files",
        ]
        row = q.result_rows[0]
        assert row[0] is True and row[1] >= 6 and row[2] == 1
        assert spark.table("cmp_task").count() == 24
        spark.sql("DROP TABLE cmp_task")

    def test_checkpoint_is_noop(self, spark):
        from shaper_spark.tasks import execute_task

        result = execute_task(spark, "CHECKPOINT;")
        assert result.success
        assert result.queries[0].result_rows == []

    def test_dashboard_gate_rejects_compact(self, spark):
        from shaper_spark.sqltool import (
            is_allowed_statement,
            is_allowed_task_statement,
        )

        assert not is_allowed_statement("COMPACT TABLE t")
        assert is_allowed_task_statement("COMPACT TABLE t")
        assert is_allowed_task_statement("CHECKPOINT")


def _fresh_dir(spark, name):
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


class TestClusteringCompaction:
    def test_sort_by_clusters_and_preserves_contents(self, spark):
        _fresh_dir(spark, "cmp_s")
        spark.sql("CREATE TABLE cmp_s (ts BIGINT, v BIGINT) USING parquet")
        # interleaved appends: every file spans the whole ts range
        for i in range(6):
            spark.createDataFrame(
                [(t, i) for t in range(0, 600, 6)], "ts long, v long"
            ).coalesce(1).write.mode("append").insertInto("cmp_s")
        report = compact_table(
            spark, "cmp_s", target_file_bytes=4096, sort_by=["ts"]
        )
        assert report["compacted"] is True
        assert spark.table("cmp_s").count() == 600
        # clustering: each output file covers a DISJOINT ts range
        files = spark.table("cmp_s").inputFiles()
        if len(files) > 1:
            import pyarrow.parquet as pq
            from urllib.parse import urlparse

            ranges = []
            for f in files:
                t = pq.read_table(urlparse(f).path, columns=["ts"])
                col = t.column("ts").to_pylist()
                ranges.append((min(col), max(col)))
            ranges.sort()
            for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
                assert hi1 <= lo2  # no overlap -> min/max skipping works
        _fresh_dir(spark, "cmp_s")

    def test_compact_statement_order_by(self, spark):
        from shaper_spark.tasks import execute_task

        _fresh_dir(spark, "cmp_o")
        spark.sql("CREATE TABLE cmp_o (ts BIGINT) USING parquet")
        for i in range(4):
            spark.range(100).selectExpr("id AS ts").coalesce(1).write.mode(
                "append"
            ).insertInto("cmp_o")
        result = execute_task(spark, "COMPACT TABLE cmp_o ORDER BY ts;")
        assert result.success, [q.error for q in result.queries]
        q = result.queries[0]
        assert q.result_columns[0] == "compacted"
        assert q.result_rows[0][0] is True
        assert spark.table("cmp_o").count() == 400
        _fresh_dir(spark, "cmp_o")


class TestExportImportDatabase:
    def test_export_then_import_roundtrip(self, spark, tmp_path):
        from shaper_spark.tasks import execute_task

        spark.sql("CREATE DATABASE IF NOT EXISTS snap_db")
        spark.sql("DROP TABLE IF EXISTS snap_db.snap_t")
        spark.sql(
            "CREATE TABLE snap_db.snap_t USING parquet AS "
            "SELECT id AS v FROM range(25)"
        )
        target = str(tmp_path / "snap")
        try:
            result = execute_task(
                spark,
                f"USE snap_db; EXPORT DATABASE '{target}' "
                "(FORMAT parquet, COMPRESSION zstd);",
            )
            assert result.success, [q.error for q in result.queries]
            exported = [r[0] for r in result.queries[-1].result_rows]
            assert "snap_t" in exported
            import os

            assert os.path.isdir(os.path.join(target, "snap_t"))
            assert os.path.exists(
                os.path.join(target, "_shaper_manifest.json")
            )

            spark.sql("DROP TABLE snap_db.snap_t")
            result2 = execute_task(spark, f"IMPORT DATABASE '{target}';")
            assert result2.success, [q.error for q in result2.queries]
            assert spark.table("snap_db.snap_t").count() == 25
            spark.sql("DROP TABLE snap_db.snap_t")
        finally:
            # USE leaks to the shared test session like on a real
            # server — restore so later tests resolve unqualified names
            spark.sql("USE default")

    def test_missing_path_is_error(self, spark):
        from shaper_spark.tasks import execute_task

        result = execute_task(spark, "EXPORT DATABASE;")
        assert not result.success
