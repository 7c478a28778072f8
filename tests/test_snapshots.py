"""Snapshot export/restore tests (reference snapshots.go semantics:
EXPORT DATABASE as parquet, restore on boot)."""

from __future__ import annotations

from shaper_spark.snapshots import export_database, restore_database


def _fresh(spark, table):
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.replace('.', '.db/')}", ignore_errors=True)


class TestSnapshots:
    def test_roundtrip(self, spark, tmp_path):
        _fresh(spark, "snap_a")
        _fresh(spark, "snap_b")
        spark.sql("CREATE TABLE snap_a AS SELECT 1 AS v UNION ALL SELECT 2")
        spark.sql("CREATE TABLE snap_b AS SELECT 'x' AS s")

        exported = export_database(spark, str(tmp_path / "snap"))
        assert {"snap_a", "snap_b"} <= set(exported)

        _fresh(spark, "snap_a")
        _fresh(spark, "snap_b")
        assert not spark.catalog.tableExists("snap_a")

        restored = restore_database(spark, str(tmp_path / "snap"))
        assert {"snap_a", "snap_b"} <= set(restored)
        assert sorted(r.v for r in spark.table("snap_a").collect()) == [1, 2]
        assert spark.table("snap_b").collect()[0].s == "x"
        _fresh(spark, "snap_a")
        _fresh(spark, "snap_b")

    def test_restore_skips_existing_without_overwrite(self, spark, tmp_path):
        _fresh(spark, "snap_keep")
        spark.sql("CREATE TABLE snap_keep AS SELECT 1 AS v")
        export_database(spark, str(tmp_path / "snap2"))
        spark.sql("INSERT INTO snap_keep VALUES (99)")
        restored = restore_database(spark, str(tmp_path / "snap2"))
        assert "snap_keep" not in restored  # left untouched
        assert spark.table("snap_keep").count() == 2
        _fresh(spark, "snap_keep")

    def test_temp_views_not_exported(self, spark, tmp_path):
        spark.sql("CREATE OR REPLACE TEMP VIEW snap_tmp AS SELECT 1 AS v")
        exported = export_database(spark, str(tmp_path / "snap3"))
        assert "snap_tmp" not in exported
