"""ATTACH/DETACH federation (reference: sql_validation.go:64-68
memory-mode side effect, :247-249 task allowance; Spark mapping =
catalog database of parquet-backed views)."""

import os

import pytest

from shaper_spark.attach import try_execute_attach
from shaper_spark.tasks import execute_task

SF = "/root/testdata/sf0.001"


class TestAttach:
    def test_attach_directory_creates_database(self, spark):
        try:
            assert try_execute_attach(spark, f"ATTACH '{SF}' AS extdb")
            rows = spark.sql(
                "SELECT count(*) AS n FROM extdb.nation"
            ).collect()
            assert rows[0]["n"] == 25
            # nano-timestamp table converts to proper timestamps
            assert (
                dict(spark.table("extdb.events").dtypes)["ts"] == "timestamp"
            )
        finally:
            try_execute_attach(spark, "DETACH extdb")

    def test_cross_database_join(self, spark, sf_dir):
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        try:
            try_execute_attach(spark, f"ATTACH '{SF}' AS extdb")
            rows = spark.sql(
                """SELECT r.r_name, count(*) AS n
                   FROM extdb.nation n JOIN region r
                     ON n.n_regionkey = r.r_regionkey
                   GROUP BY r.r_name ORDER BY r.r_name"""
            ).collect()
            assert len(rows) == 5
            assert sum(r["n"] for r in rows) == 25
        finally:
            try_execute_attach(spark, "DETACH extdb")

    def test_attach_single_file(self, spark):
        try:
            assert try_execute_attach(
                spark, f"ATTACH '{SF}/region.parquet' AS onetbl"
            )
            assert spark.sql("SELECT count(*) AS n FROM onetbl.region").collect()[
                0
            ]["n"] == 5
        finally:
            try_execute_attach(spark, "DETACH DATABASE IF EXISTS onetbl")

    def test_detach_leaves_files(self, spark, tmp_path):
        import os

        try_execute_attach(spark, f"ATTACH '{SF}' AS extdb2")
        try_execute_attach(spark, "DETACH extdb2")
        assert os.path.exists(f"{SF}/nation.parquet")
        assert "extdb2" not in [d.name for d in spark.catalog.listDatabases()]

    def test_missing_native_file_rejected(self, spark):
        with pytest.raises(ValueError, match="does not exist"):
            try_execute_attach(spark, "ATTACH '/tmp/nope_x.duckdb' AS ddb")

    def test_attach_native_duckdb_file(self, spark, tmp_path):
        """A real .duckdb file attaches via the export-to-parquet
        fallback (reference shape: EXPORT DATABASE (FORMAT parquet),
        snapshots.go:233) and its tables are queryable as db.table."""
        import duckdb

        dbfile = str(tmp_path / "ext.duckdb")
        con = duckdb.connect(dbfile)
        con.execute("CREATE TABLE colors (id INTEGER, name VARCHAR)")
        con.execute(
            "INSERT INTO colors VALUES (1,'red'), (2,'green'), (3,'blue')"
        )
        con.execute("CREATE TABLE nums AS SELECT range AS n FROM range(10)")
        con.close()
        from shaper_spark.attach import _ATTACHED

        try:
            assert try_execute_attach(spark, f"ATTACH '{dbfile}' AS ddbf")
            rows = spark.sql(
                "SELECT name FROM ddbf.colors ORDER BY id"
            ).collect()
            assert [r["name"] for r in rows] == ["red", "green", "blue"]
            assert (
                spark.sql("SELECT sum(n) AS s FROM ddbf.nums").collect()[0]["s"]
                == 45
            )
            tmpdir = _ATTACHED["ddbf"][1]
            assert tmpdir is not None and os.path.isdir(tmpdir)
        finally:
            try_execute_attach(spark, "DETACH IF EXISTS ddbf")
        # DETACH removes the temporary export, not the source file
        assert not os.path.exists(tmpdir)
        assert os.path.exists(dbfile)

    def test_attach_native_sqlite_file(self, spark, tmp_path):
        import sqlite3

        dbfile = str(tmp_path / "ext.sqlite")
        con = sqlite3.connect(dbfile)
        con.execute("CREATE TABLE pets (id INTEGER, name TEXT)")
        con.executemany(
            "INSERT INTO pets VALUES (?, ?)", [(1, "cat"), (2, "dog")]
        )
        con.commit()
        con.close()
        try:
            assert try_execute_attach(spark, f"ATTACH '{dbfile}' AS sqlf")
            rows = spark.sql("SELECT name FROM sqlf.pets ORDER BY id").collect()
            assert [r["name"] for r in rows] == ["cat", "dog"]
        finally:
            try_execute_attach(spark, "DETACH IF EXISTS sqlf")

    def test_missing_path_rejected(self, spark):
        with pytest.raises(ValueError, match="no parquet tables"):
            try_execute_attach(spark, "ATTACH '/nonexistent/dir' AS nodb")

    def test_non_attach_returns_false(self, spark):
        assert try_execute_attach(spark, "SELECT 1") is False

    def test_task_can_attach_and_query(self, spark):
        r = execute_task(
            spark,
            f"""
            ATTACH '{SF}' AS taskdb;
            SELECT count(*) AS n FROM taskdb.supplier;
            DETACH taskdb;
            """,
        )
        assert r.success is True
        assert r.queries[1].result_rows[0][0] > 0

    def test_detach_unknown_name_errors(self, spark):
        """DETACH must not CASCADE-drop a regular Spark database it did
        not attach (DuckDB errors on unknown catalog names too)."""
        spark.sql("CREATE DATABASE IF NOT EXISTS real_db")
        try:
            with pytest.raises(ValueError, match="not an attached"):
                try_execute_attach(spark, "DETACH real_db")
            assert "real_db" in [d.name for d in spark.catalog.listDatabases()]
        finally:
            spark.sql("DROP DATABASE IF EXISTS real_db")

    def test_detach_if_exists_unknown_is_noop(self, spark):
        assert try_execute_attach(spark, "DETACH IF EXISTS never_attached")

    def test_attach_over_existing_database_errors(self, spark):
        """ATTACH must not silently merge views into an existing
        un-attached database."""
        spark.sql("CREATE DATABASE IF NOT EXISTS owned_db")
        try:
            with pytest.raises(ValueError, match="already exists"):
                try_execute_attach(spark, f"ATTACH '{SF}' AS owned_db")
            # IF NOT EXISTS form: no-op instead of error, like DuckDB.
            assert try_execute_attach(
                spark, f"ATTACH IF NOT EXISTS '{SF}' AS owned_db"
            )
            assert not spark.catalog.tableExists("owned_db.nation")
        finally:
            spark.sql("DROP DATABASE IF EXISTS owned_db")


class TestJdbcAttach:
    """ATTACH 'jdbc:...' AS name — JDBCTableCatalog seam. No driver jars
    exist in this environment, so success is exercised by stubbing the
    availability probe; the real-world failure mode (no jar) must raise
    a ValueError that says how to fix it."""

    def test_missing_driver_errors_helpfully(self, spark):
        with pytest.raises(ValueError, match="driver.*classpath|classpath"):
            try_execute_attach(
                spark, "ATTACH 'jdbc:postgresql://db.example/warehouse' AS pg"
            )

    def test_unknown_scheme_errors(self, spark):
        with pytest.raises(ValueError, match="JDBC driver"):
            try_execute_attach(spark, "ATTACH 'jdbc:weirddb://x' AS w")

    def test_attach_detach_sets_and_clears_catalog_confs(self, spark, monkeypatch):
        from shaper_spark import attach as attach_mod

        monkeypatch.setattr(
            attach_mod, "_jdbc_driver_available", lambda s, c: True
        )
        assert try_execute_attach(
            spark, "ATTACH 'jdbc:postgresql://db.example/warehouse' AS pgc"
        )
        assert (
            spark.conf.get("spark.sql.catalog.pgc")
            == "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog"
        )
        assert (
            spark.conf.get("spark.sql.catalog.pgc.url")
            == "jdbc:postgresql://db.example/warehouse"
        )
        assert try_execute_attach(spark, "DETACH pgc")
        with pytest.raises(Exception):
            spark.conf.get("spark.sql.catalog.pgc")
