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


class TestSessionAggregateStream:
    def test_streaming_session_window(self, spark, tmp_path):
        src = tmp_path / "sess_src"
        src.mkdir()
        _write_jsonl(
            src / "e.jsonl",
            [
                {"user_id": 1, "ts": "2024-01-01T10:00:00", "value": 5.0},
                {"user_id": 1, "ts": "2024-01-01T10:10:00", "value": 3.0},
                {"user_id": 1, "ts": "2024-01-01T12:00:00", "value": 7.0},  # new session
                {"user_id": 2, "ts": "2024-01-01T10:05:00", "value": 1.0},
            ],
        )
        from shaper_spark.streaming import session_aggregate_stream

        events = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .json(str(src))
        )
        sessions = session_aggregate_stream(events, gap="30 minutes")
        q = (
            sessions.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            (r["user"], r["session_start"].isoformat()): r
            for r in spark.table("sess_out").collect()
        }
        assert len(rows) == 3
        first = rows[(1, "2024-01-01T10:00:00")]
        assert first["n_events"] == 2
        assert first["total_value"] == 8.0
        # session_window end = last event + gap
        assert first["session_end"].isoformat() == "2024-01-01T10:40:00"

    def test_batch_equivalence(self, spark):
        # Same operator body works on a batch frame (windows close at once)
        import datetime as dt

        from shaper_spark.streaming import session_aggregate_stream

        df = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 10, 0), 5.0),
                (1, dt.datetime(2024, 1, 1, 10, 10), 3.0),
            ],
            "user_id long, ts timestamp, value double",
        )
        out = session_aggregate_stream(df, gap="30 minutes").collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 2


class TestThresholdAlertStream:
    def test_emits_once_on_crossing(self, spark, tmp_path):
        src = tmp_path / "alert_src"
        src.mkdir()
        _write_jsonl(
            src / "a.jsonl",
            [
                {"user_id": 1, "ts": "2024-01-01T10:00:00", "value": 40.0},
                {"user_id": 1, "ts": "2024-01-01T10:01:00", "value": 40.0},
                {"user_id": 1, "ts": "2024-01-01T10:02:00", "value": 40.0},  # crosses 100 here
                {"user_id": 2, "ts": "2024-01-01T10:00:00", "value": 10.0},  # never crosses
            ],
        )
        from shaper_spark.streaming import threshold_alert_stream

        events = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .json(str(src))
        )
        alerts = threshold_alert_stream(events, threshold=100.0)
        q = (
            alerts.writeStream.format("memory")
            .queryName("alerts_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120), "stream did not drain in time"
        finally:
            q.stop()
        rows = spark.table("alerts_out").collect()
        assert len(rows) == 1
        assert rows[0]["user_id"] == 1
        assert rows[0]["total"] == 120.0
        assert rows[0]["crossed_at"].isoformat() == "2024-01-01T10:02:00"


class TestExecutorSideParse:
    """VERDICT r2 'What's wrong' #3: the file/Kafka stream path must not
    collect whole micro-batches to the driver — schema inference runs on
    a bounded sample, the data parses executor-side."""

    def test_driver_collect_is_bounded_to_sample(self, spark, tmp_path, monkeypatch):
        from shaper_spark import streaming

        _fresh(spark, "bounded_ingest")
        monkeypatch.setattr(streaming, "SCHEMA_SAMPLE", 50)
        records = [{"user": f"u{i}", "n": i} for i in range(2000)]
        src = tmp_path / "src"
        src.mkdir()
        _write_jsonl(src / "big.jsonl", records)

        collected_sizes = []
        raw = spark.read.text(str(src))
        df_cls = type(raw)  # classic.DataFrame in pyspark 4
        orig_collect = df_cls.collect

        def spy_collect(self):
            out = orig_collect(self)
            collected_sizes.append(len(out))
            return out

        monkeypatch.setattr(df_cls, "collect", spy_collect)
        n = streaming.ingest_microbatch(spark, raw, "bounded_ingest")
        monkeypatch.setattr(df_cls, "collect", orig_collect)
        assert n == 2000
        assert spark.table("bounded_ingest").count() == 2000
        # the only driver materialization was the 50-row schema sample
        assert collected_sizes and max(collected_sizes) <= 50

    def test_post_sample_fields_join_on_next_batch(self, spark, tmp_path, monkeypatch):
        """A field first appearing beyond the sample prefix is dropped in
        that batch and added by evolution in the next batch that samples
        it — the documented sample-inference trade-off."""
        from shaper_spark import streaming

        _fresh(spark, "evolve_ingest")
        monkeypatch.setattr(streaming, "SCHEMA_SAMPLE", 10)
        batch1 = [{"user": f"u{i}"} for i in range(10)] + [
            {"user": "late", "newcol": "missed"}
        ]
        src = tmp_path / "b1"
        src.mkdir()
        _write_jsonl(src / "a.jsonl", batch1)
        streaming.ingest_microbatch(spark, spark.read.text(str(src)), "evolve_ingest")
        assert "newcol" not in spark.table("evolve_ingest").columns

        src2 = tmp_path / "b2"
        src2.mkdir()
        _write_jsonl(src2 / "b.jsonl", [{"user": "u-next", "newcol": "present"}])
        streaming.ingest_microbatch(spark, spark.read.text(str(src2)), "evolve_ingest")
        cols = spark.table("evolve_ingest").columns
        assert "newcol" in cols
        got = {
            r["user"]: r["newcol"] for r in spark.table("evolve_ingest").collect()
        }
        assert got["u-next"] == "present"
        assert got["late"] is None


class TestDedupStream:
    def test_replays_dropped_across_batches(self, spark, tmp_path):
        from shaper_spark.streaming import dedup_stream

        src = tmp_path / "dd_src"
        src.mkdir()
        _write_jsonl(
            src / "a.jsonl",
            [
                {"k": "e1", "ts": "2024-01-01T10:00:00", "v": 1},
                {"k": "e2", "ts": "2024-01-01T10:01:00", "v": 2},
                {"k": "e1", "ts": "2024-01-01T10:02:00", "v": 99},  # replay
            ],
        )
        _write_jsonl(
            src / "b.jsonl",
            [
                {"k": "e2", "ts": "2024-01-01T10:03:00", "v": 98},  # replay
                {"k": "e3", "ts": "2024-01-01T10:04:00", "v": 3},
            ],
        )
        events = (
            spark.readStream.schema("k string, ts timestamp, v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        out = dedup_stream(events, ["k"], watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("dd_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = [r.asDict() for r in spark.table("dd_out").collect()]
        keys = sorted(r["k"] for r in rows)
        # exactly one survivor per key, however many replays arrived
        assert keys == ["e1", "e2", "e3"]
        # the survivor is a real arrival (which one wins depends on
        # micro-batch file order — the engine keeps the first PROCESSED)
        by_k = {r["k"]: r["v"] for r in rows}
        assert by_k["e1"] in (1, 99) and by_k["e2"] in (2, 98)
        assert by_k["e3"] == 3

    def test_batch_degrades_to_drop_duplicates(self, spark):
        from shaper_spark.streaming import dedup_stream

        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], ["k", "v"]
        )
        out = dedup_stream(df, ["k"])
        assert out.count() == 2


class TestRollupStream:
    def test_streaming_buckets_match_batch(self, spark, tmp_path):
        from shaper_spark.streaming import rollup_stream

        src = tmp_path / "ru_src"
        src.mkdir()
        recs = [
            {"k": "a", "ts": "2024-01-01T10:05:00", "v": 1.0},
            {"k": "a", "ts": "2024-01-01T10:55:00", "v": 2.0},
            {"k": "a", "ts": "2024-01-01T11:05:00", "v": 4.0},
            {"k": "b", "ts": "2024-01-01T10:30:00", "v": 8.0},
        ]
        _write_jsonl(src / "a.jsonl", recs)
        schema = "k string, ts timestamp, v double"
        stream = spark.readStream.schema(schema).json(str(src))
        out = rollup_stream(
            stream, ts_col="ts", value_col="v", key_cols=["k"], grain="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ru_out")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["k"], r["bucket"].isoformat()): (r["n"], r["total"], r["vmin"], r["vmax"])
            for r in spark.table("ru_out").collect()
        }
        assert got[("a", "2024-01-01T10:00:00")] == (2, 3.0, 1.0, 2.0)
        assert got[("a", "2024-01-01T11:00:00")] == (1, 4.0, 4.0, 4.0)
        assert got[("b", "2024-01-01T10:00:00")] == (1, 8.0, 8.0, 8.0)

        # batch frame through the same body → identical rollup
        batch = spark.read.schema(schema).json(str(src))
        brows = {
            (r["k"], r["bucket"].isoformat()): (r["n"], r["total"], r["vmin"], r["vmax"])
            for r in rollup_stream(
                batch, ts_col="ts", value_col="v", key_cols=["k"], grain="1 hour"
            ).collect()
        }
        assert brows == got

    def test_partials_reaggregate_to_coarser_grain(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from shaper_spark.streaming import rollup_stream

        src = tmp_path / "ru2_src"
        src.mkdir()
        recs = [
            {"ts": f"2024-01-01T{h:02d}:{m:02d}:00", "v": float(h * 60 + m)}
            for h in (0, 1, 2)
            for m in (1, 31)
        ]
        _write_jsonl(src / "a.jsonl", recs)
        batch = spark.read.schema("ts timestamp, v double").json(str(src))
        hourly = rollup_stream(batch, value_col="v", grain="1 hour")
        daily = (
            hourly.groupBy(F.date_trunc("day", "bucket").alias("day"))
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
            .collect()[0]
        )
        vals = [r["v"] for r in batch.collect()]
        assert daily["n"] == len(vals)
        assert daily["total"] == sum(vals)
        assert daily["vmin"] == min(vals) and daily["vmax"] == max(vals)


class TestCorpusDedupStream:
    def test_dedup_on_arrival_builds_clean_corpus(self, spark, tmp_path):
        import shutil
        from urllib.parse import urlparse

        from shaper_spark.streaming import start_corpus_dedup_stream

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in ("sc_corpus", "sc_rejects"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        spark.sql(
            "CREATE TABLE sc_corpus (doc_id BIGINT, text STRING) USING parquet"
        )
        spark.sql(
            "CREATE TABLE sc_rejects (doc_id BIGINT, reason STRING) USING parquet"
        )
        seed_txt = "the quick brown fox jumps over the lazy dog and then runs home"
        spark.createDataFrame(
            [(1, seed_txt)], "doc_id long, text string"
        ).write.mode("append").insertInto("sc_corpus")

        src = tmp_path / "incoming"
        src.mkdir()
        batch = [
            (10, seed_txt),  # exact vs corpus
            (11, "fresh words that appear nowhere else at all today"),
            (12, "fresh words that appear nowhere else at all today"),  # exact vs 11
            (13, "totally different new document body for the corpus"),
        ]
        spark.createDataFrame(
            batch, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(str(src / "b1"))
        q = start_corpus_dedup_stream(
            stream,
            "sc_corpus",
            checkpoint=str(tmp_path / "ckpt"),
            trigger_available_now=True,
            rejects_table="sc_rejects",
        )
        assert q.awaitTermination(120), "stream did not drain in time"

        kept = sorted(
            r["doc_id"] for r in spark.table("sc_corpus").collect()
        )
        assert kept == [1, 11, 13]  # 10 exact_corpus, 12 exact_batch
        rejects = {
            r["doc_id"]: r["reason"]
            for r in spark.table("sc_rejects").collect()
        }
        assert rejects == {10: "exact_corpus", 12: "exact_batch"}
        spark.sql("DROP TABLE sc_corpus")
        spark.sql("DROP TABLE sc_rejects")


class TestDriftMonitorStream:
    def _setup_alerts(self, spark, name):
        import shutil
        from urllib.parse import urlparse

        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        spark.sql(
            f"CREATE TABLE {name} (batch_id BIGINT, n_rows BIGINT, "
            "psi DOUBLE, drifted BOOLEAN) USING parquet"
        )

    def _run(self, spark, tmp_path, values, reference_vals, name):
        from shaper_spark.streaming import start_drift_monitor_stream

        self._setup_alerts(spark, name)
        src = tmp_path / "src"
        src.mkdir()
        (src / "batch.jsonl").write_text(
            "\n".join(f'{{"v": {v}}}' for v in values)
        )
        ref = spark.createDataFrame([(v,) for v in reference_vals], "v long")
        stream = (
            spark.readStream.schema("v long").json(str(src))
        )
        q = start_drift_monitor_stream(
            stream,
            ref,
            "v",
            name,
            checkpoint=str(tmp_path / "ckpt"),
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        return spark.table(name).collect()

    def test_same_distribution_not_drifted(self, spark, tmp_path):
        vals = [3, 9, 40, 40, 700] * 4
        rows = self._run(spark, tmp_path, vals, vals, "drift_alerts_same")
        assert len(rows) == 1
        r = rows[0]
        assert r.n_rows == 20 and r.psi == 0.0 and not r.drifted

    def test_shifted_distribution_flags(self, spark, tmp_path):
        rows = self._run(
            spark,
            tmp_path,
            [500, 600, 700, 800, 900] * 4,
            [2, 3, 2, 3, 2] * 4,
            "drift_alerts_shift",
        )
        assert len(rows) == 1
        assert rows[0].drifted and rows[0].psi > 0.25

    def test_psi_matches_batch_operator(self, spark, tmp_path):
        # the stream's per-batch PSI equals psi_drift_matrix on the
        # union frame labeled by side
        from shaper_spark.operators.text import psi_drift_matrix

        batch_vals = [2, 9, 40, 700, 40] * 3
        ref_vals = [3, 9, 30, 600, 2000] * 3
        rows = self._run(
            spark, tmp_path, batch_vals, ref_vals, "drift_alerts_eq"
        )
        both = spark.createDataFrame(
            [("ref", v) for v in ref_vals] + [("new", v) for v in batch_vals],
            "grp string, v long",
        )
        (expected,) = psi_drift_matrix(both, "v", "grp").collect()
        assert abs(rows[0].psi - expected.psi) < 1e-6

    def test_empty_reference_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from shaper_spark.streaming import start_drift_monitor_stream

        ref = spark.createDataFrame([(0,), (-1,)], "v long")
        stream = spark.readStream.schema("v long").json(str(tmp_path))
        with _pytest.raises(ValueError, match="no positive"):
            start_drift_monitor_stream(stream, ref, "v", "t")


class TestRateAnomalyStream:
    def _setup_tables(self, spark, cname, aname):
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for name, ddl in (
            (cname, "grp STRING, bucket_ts TIMESTAMP, n_events BIGINT"),
            (
                aname,
                "batch_id BIGINT, grp STRING, bucket_ts TIMESTAMP, "
                "n_events BIGINT, hist_n BIGINT, is_anomaly BOOLEAN",
            ),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
            spark.sql(f"CREATE TABLE {name} ({ddl}) USING parquet")

    @staticmethod
    def _write_events(path, counts, start_hour=0):
        import json as _json

        lines = []
        for i, (g, c) in enumerate(counts):
            for _ in range(c):
                lines.append(_json.dumps({
                    "grp": g,
                    "ts": f"2024-01-01 {start_hour + i:02d}:30:00",
                }))
        path.write_text("\n".join(lines))

    def _stream(self, spark, src, max_files=None):
        reader = spark.readStream.schema("grp string, ts timestamp")
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        return reader.json(str(src))

    def test_single_batch_equals_batch_operator(self, spark, tmp_path):
        from shaper_spark.operators.timeseries import rolling_anomaly_bands
        from shaper_spark.streaming import start_rate_anomaly_stream

        self._setup_tables(spark, "ra_counts1", "ra_alerts1")
        src = tmp_path / "src"
        src.mkdir()
        counts = [("g", 10), ("g", 10), ("g", 10), ("g", 10), ("g", 95)]
        self._write_events(src / "b0.jsonl", counts)

        q = start_rate_anomaly_stream(
            self._stream(spark, src), "ts", "grp",
            "ra_counts1", "ra_alerts1",
            window=4, min_periods=2,
            checkpoint=str(tmp_path / "ck1"),
            trigger_available_now=True,
        )
        q.awaitTermination(120)

        raw = spark.createDataFrame(
            [(g, f"2024-01-01 {i:02d}:30:00") for i, (g, c) in
             enumerate(counts) for _ in range(c)],
            "grp string, ts_s string",
        ).selectExpr("grp", "CAST(ts_s AS TIMESTAMP) AS ts")
        expected = {
            (r.grp, r.bucket_ts): (r.n_events, r.hist_n, r.is_anomaly)
            for r in rolling_anomaly_bands(
                raw, "ts", "grp", window=4, min_periods=2
            ).collect()
        }
        got = {
            (r.grp, r.bucket_ts): (r.n_events, r.hist_n, r.is_anomaly)
            for r in spark.table("ra_alerts1").collect()
        }
        assert got == expected
        assert {r.batch_id for r in spark.table("ra_alerts1").collect()} == {0}
        # the spike hour is flagged
        spike = [v for v in got.values() if v[0] == 95]
        assert spike and spike[0][2] is True
        spark.sql("DROP TABLE ra_counts1")
        spark.sql("DROP TABLE ra_alerts1")

    def test_second_batch_baseline_includes_first(self, spark, tmp_path):
        from shaper_spark.streaming import start_rate_anomaly_stream

        self._setup_tables(spark, "ra_counts2", "ra_alerts2")
        src = tmp_path / "src2"
        src.mkdir()
        # batch 0: four flat hours; batch 1: one spike hour
        self._write_events(
            src / "a_first.jsonl", [("g", 10), ("g", 10), ("g", 10), ("g", 10)]
        )
        self._write_events(src / "b_second.jsonl", [("g", 80)], start_hour=4)

        q = start_rate_anomaly_stream(
            self._stream(spark, src, max_files=1), "ts", "grp",
            "ra_counts2", "ra_alerts2",
            window=4, min_periods=2,
            checkpoint=str(tmp_path / "ck2"),
            trigger_available_now=True,
        )
        q.awaitTermination(180)

        alerts = {
            (r.batch_id, r.n_events): (r.hist_n, r.is_anomaly)
            for r in spark.table("ra_alerts2").collect()
        }
        # the spike arrived in its own batch, scored against the
        # PRIOR batch's four flat buckets
        spike = [v for (b, n), v in alerts.items() if n == 80]
        assert spike and spike[0] == (4, True)
        spark.sql("DROP TABLE ra_counts2")
        spark.sql("DROP TABLE ra_alerts2")

    def test_validates_params(self, spark, tmp_path):
        import pytest as _pytest

        from shaper_spark.streaming import start_rate_anomaly_stream

        stream = spark.readStream.schema("grp string, ts timestamp").json(
            str(tmp_path)
        )
        with _pytest.raises(ValueError):
            start_rate_anomaly_stream(
                stream, "ts", "grp", "t1", "t2", window=1
            )


class TestAttributionJoinStream:
    def _write_events(self, d, name, rows):
        (d / name).write_text(
            "\n".join(
                f'{{"user_id": {u}, "ts": "{ts}"}}' for u, ts in rows
            )
        )

    def test_streaming_matches_batch_semantics(self, spark, tmp_path):
        from shaper_spark.streaming import attribution_join_stream

        clicks_dir = tmp_path / "clicks"
        buys_dir = tmp_path / "buys"
        clicks_dir.mkdir(), buys_dir.mkdir()
        self._write_events(
            clicks_dir,
            "c.jsonl",
            [
                (1, "2024-01-01 10:00:00"),
                (1, "2024-01-01 10:20:00"),
                (1, "2024-01-01 09:00:00"),  # too early (> 30 min)
                (2, "2024-01-01 10:05:00"),
            ],
        )
        self._write_events(
            buys_dir,
            "b.jsonl",
            [(1, "2024-01-01 10:30:00"), (3, "2024-01-01 10:30:00")],
        )
        schema = "user_id long, ts timestamp"
        out = attribution_join_stream(
            spark.readStream.schema(schema).json(str(clicks_dir)),
            spark.readStream.schema(schema).json(str(buys_dir)),
        )
        q = (
            out.writeStream.format("memory")
            .queryName("attrib_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.user_id, r.lag_seconds)
            for r in spark.table("attrib_out").collect()
        )
        # user 1: both in-window clicks pair with the purchase; the
        # 09:00 click is outside `within`; user 2 has no purchase,
        # user 3 no click
        assert got == [(1, 600), (1, 1800)]

        # batch path gives identical rows
        clicks_b = spark.read.schema(schema).json(str(clicks_dir))
        buys_b = spark.read.schema(schema).json(str(buys_dir))
        batch = sorted(
            (r.user_id, r.lag_seconds)
            for r in attribution_join_stream(clicks_b, buys_b).collect()
        )
        assert batch == got

    def test_unwatermarked_stream_join_is_guarded(self, spark, tmp_path):
        # both sides get watermarks automatically — the query plans and
        # runs in append mode (Spark would reject it otherwise)
        from shaper_spark.streaming import attribution_join_stream

        d = tmp_path / "e"
        d.mkdir()
        self._write_events(d, "x.jsonl", [(1, "2024-01-01 00:00:00")])
        schema = "user_id long, ts timestamp"
        s1 = spark.readStream.schema(schema).json(str(d))
        s2 = spark.readStream.schema(schema).json(str(d))
        out = attribution_join_stream(s1, s2)
        q = (
            out.writeStream.format("memory")
            .queryName("attrib_guard")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("attrib_guard").count() == 1  # self-pair


class TestLateDataMonitor:
    def _run(self, spark, tmp_path, name):
        import time

        from shaper_spark.streaming import start_late_data_monitor_stream

        src = tmp_path / "late_src"
        src.mkdir()
        # batch 0: advances max event time to 12:00 (wm -> 11:50)
        _write_jsonl(
            src / "a.jsonl",
            [
                {"ts": "2024-01-01T10:00:00", "v": 1},
                {"ts": "2024-01-01T12:00:00", "v": 2},
            ],
        )
        time.sleep(1.1)
        # batch 1: 10:00 window state evicted at batch end (wm 11:50)
        _write_jsonl(src / "b.jsonl", [{"ts": "2024-01-01T12:30:00", "v": 4}])
        time.sleep(1.1)
        # batch 2: 10:05 arrives AFTER its window's state is gone
        _write_jsonl(
            src / "c.jsonl",
            [
                {"ts": "2024-01-01T10:05:00", "v": 3},
                {"ts": "2024-01-01T12:40:00", "v": 5},
            ],
        )
        events = (
            spark.readStream.schema("ts timestamp, v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = start_late_data_monitor_stream(
            events,
            "ts",
            grain="1 hour",
            watermark="10 minutes",
            query_name=name,
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        return q

    def test_dropped_only_after_state_eviction(self, spark, tmp_path):
        from shaper_spark.streaming import watermark_audit_report

        q = self._run(spark, tmp_path, "late_mon1")
        audit = {
            r.batch_id: r
            for r in watermark_audit_report(q, spark).collect()
        }
        # the late 10:05 row lands in batch 2, AFTER the 10:00 window
        # state was evicted — exactly one genuinely-lost row
        assert audit[2].late_rows_dropped == 1
        # earlier batches merged or evicted without loss
        assert audit[0].late_rows_dropped == 0
        assert audit[1].late_rows_dropped == 0
        # watermark telemetry rides along
        assert audit[2].watermark.startswith("2024-01-01T12:20")
        # total loss across the run
        total = sum(r.late_rows_dropped for r in audit.values())
        assert total == 1

    def test_counts_exclude_only_lost_rows(self, spark, tmp_path):
        q = self._run(spark, tmp_path, "late_mon2")
        rows = spark.table("late_mon2").collect()
        # update-mode sink: take the LAST emission per bucket
        last = {}
        for r in rows:
            last[str(r.bucket)] = r.n
        # 10:00 bucket keeps only the on-time row; the evicted-late
        # 10:05 row is lost (that is what the audit counts)
        assert last["2024-01-01 10:00:00"] == 1
        assert last["2024-01-01 12:00:00"] == 3  # 12:00, 12:30, 12:40
