"""Structured Streaming ingest tests: file-source JSON lines through
foreachBatch into a catalog table, with schema evolution and _id dedupe."""

from __future__ import annotations

import json
import time

from shaper_spark.streaming import start_json_ingest_stream


def _fresh(spark, table):
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


class TestJsonIngestStream:
    def test_available_now_drains_files(self, spark, tmp_path):
        _fresh(spark, "stream_events")
        src = tmp_path / "src"
        src.mkdir()
        _write_jsonl(
            src / "a.jsonl",
            [
                {"user": "u1", "n": 1},
                {"user": "u2", "n": 2, "extra": "later-column"},
            ],
        )
        counts = []
        q = start_json_ingest_stream(
            spark,
            str(src),
            "stream_events",
            str(tmp_path / "ckpt"),
            available_now=True,
            on_batch=lambda bid, n: counts.append(n),
        )
        q.awaitTermination(60)
        rows = {r["user"]: r.asDict() for r in spark.table("stream_events").collect()}
        assert set(rows) == {"u1", "u2"}
        assert rows["u1"]["extra"] is None
        assert rows["u2"]["extra"] == "later-column"
        assert sum(counts) == 2

    def test_invalid_json_dropped(self, spark, tmp_path):
        _fresh(spark, "stream_bad")
        src = tmp_path / "src2"
        src.mkdir()
        with open(src / "b.jsonl", "w") as f:
            f.write('{"ok": 1}\n')
            f.write("this is not json\n")
            f.write('{"ok": 2}\n')
        q = start_json_ingest_stream(
            spark, str(src), "stream_bad", str(tmp_path / "ckpt2"), available_now=True
        )
        q.awaitTermination(60)
        assert spark.table("stream_bad").count() == 2

    def test_id_dedupe_across_batches(self, spark, tmp_path):
        _fresh(spark, "stream_dedup")
        src = tmp_path / "src3"
        src.mkdir()
        _write_jsonl(src / "c1.jsonl", [{"_id": "same", "v": 1}])
        q = start_json_ingest_stream(
            spark,
            str(src),
            "stream_dedup",
            str(tmp_path / "ckpt3"),
            available_now=True,
            dedupe_ids=True,
        )
        q.awaitTermination(60)
        _write_jsonl(src / "c2.jsonl", [{"_id": "same", "v": 2}, {"_id": "new", "v": 3}])
        q = start_json_ingest_stream(
            spark,
            str(src),
            "stream_dedup",
            str(tmp_path / "ckpt3"),
            available_now=True,
            dedupe_ids=True,
        )
        q.awaitTermination(60)
        rows = spark.table("stream_dedup").collect()
        assert len(rows) == 2  # "same" appended once, "new" once
        ids = sorted(r["_id"] for r in rows)
        assert ids == ["new", "same"]

    def test_processing_time_trigger_picks_up_new_files(self, spark, tmp_path):
        _fresh(spark, "stream_live")
        src = tmp_path / "src4"
        src.mkdir()
        _write_jsonl(src / "d1.jsonl", [{"v": 1}])
        q = start_json_ingest_stream(
            spark,
            str(src),
            "stream_live",
            str(tmp_path / "ckpt4"),
            trigger_seconds=0.5,
        )
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                if (
                    spark.catalog.tableExists("stream_live")
                    and spark.table("stream_live").count() >= 1
                ):
                    break
                time.sleep(0.5)
            _write_jsonl(src / "d2.jsonl", [{"v": 2}])
            deadline = time.time() + 30
            while time.time() < deadline:
                if spark.table("stream_live").count() >= 2:
                    break
                time.sleep(0.5)
            assert spark.table("stream_live").count() == 2
        finally:
            q.stop()
