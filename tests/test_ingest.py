"""Ingest pipeline tests — ports of the reference suite's semantics
(reference server/ingest/ingest_test.go:137-1817; 27 table-driven tests
against embedded NATS+DuckDB, re-expressed against IngestBuffer+Spark).
"""

from __future__ import annotations

import datetime as dt

import pytest

from shaper_spark.ingest import (
    IngestBuffer,
    detect_schema_from_batch,
    determine_column_type,
    is_date_string,
    is_timestamp_string,
    validate_table_name,
)


# ---------------------------------------------------------------------------
# Pure-function tests (no Spark)
# ---------------------------------------------------------------------------


class TestDetermineColumnType:
    # ingest_test.go:173-232
    @pytest.mark.parametrize(
        "samples,expected",
        [
            ([True, False, True, None], "BOOLEAN"),
            ([1, 2, 3, None], "DOUBLE"),
            ([1.1, 2.2, 3.3, None], "DOUBLE"),
            (["abc", "def", "ghi", None], "VARCHAR"),
            (["2023-01-01", "2023-02-15", None], "DATE"),
            (["2023-01-01T12:30:45Z", "2023-02-15T08:15:30Z", None], "TIMESTAMP"),
            ([[1, 2, 3], ["a", "b", "c"], None], "JSON"),
            ([{"a": 1}, {"b": 2}, None], "JSON"),
            (["abc", 123, True, None], "JSON"),  # mixed → JSON
        ],
    )
    def test_cases(self, samples, expected):
        assert determine_column_type(samples) == expected

    def test_mixed_date_and_timestamp_strings_fall_back_to_varchar(self):
        assert determine_column_type(["2023-01-01", "2023-01-01T10:00:00Z"]) == "VARCHAR"

    def test_date_strings_mixed_with_plain_strings_stay_date(self):
        # ingest.go:485-494: non-date strings don't veto DATE — only a
        # timestamp sighting does (hasDate && !hasTimestamp → DATE).
        assert determine_column_type(["2023-01-01", "hello"]) == "DATE"


class TestTimestampAndDateDetection:
    # ingest_test.go:234-289
    @pytest.mark.parametrize(
        "value,expected",
        [
            ("2023-01-01T12:30:45Z", True),
            ("2023-01-01 12:30:45", True),
            ("2023-01-01T12:30:45.123Z", True),
            ("2023-01-01", False),
            ("01/02/2023", False),
            ("not a timestamp", False),
        ],
    )
    def test_is_timestamp(self, value, expected):
        assert is_timestamp_string(value) is expected

    @pytest.mark.parametrize(
        "value,expected",
        [
            ("2023-01-01T12:30:45Z", False),
            ("2023-01-01 12:30:45", False),
            ("2023-01-01", True),
            ("01/02/2023", True),
            ("15.03.2023", True),  # DD.MM.YYYY
            ("not a date", False),
        ],
    )
    def test_is_date(self, value, expected):
        assert is_date_string(value) is expected

    def test_seven_decimal_timestamps(self):
        # ingest_test.go:1674-1756 (RFC3339Nano, 7 fractional digits)
        for v in [
            "2024-11-08T09:34:25.5785161+01:00",
            "2006-01-02T15:04:05.0000000+07:00",
            "2023-12-25T23:59:59.9999999-05:00",
            "2024-01-01T00:00:00.1234567Z",
        ]:
            assert is_timestamp_string(v), v


class TestDetectSchemaFromBatch:
    # ingest_test.go:137-171
    def test_mixed_batch(self):
        batch = [
            {
                "id": 1,
                "name": "John Doe",
                "is_active": True,
                "created": "2023-01-15T10:30:45Z",
                "tags": ["tag1", "tag2"],
                "metadata": {"key": "value"},
            },
            {
                "id": 2,
                "name": "Jane Smith",
                "is_active": False,
                "created": "2023-02-20T14:15:30Z",
                "score": 95.5,
                "birth_date": "1990-05-15",
            },
        ]
        types, ordered = detect_schema_from_batch(batch)
        assert types["id"] == "DOUBLE"
        assert types["name"] == "VARCHAR"
        assert types["is_active"] == "BOOLEAN"
        assert types["created"] == "TIMESTAMP"
        assert types["tags"] == "JSON"
        assert types["metadata"] == "JSON"
        assert types["score"] == "DOUBLE"
        assert types["birth_date"] == "DATE"

    def test_id_ts_first_and_key_order_preserved(self):
        # ingest_test.go:1248-1378, 1515-1551
        batch = [{"zebra": 1, "apple": 2, "mango": 3}]
        _, ordered = detect_schema_from_batch(batch)
        assert ordered[:2] == ["_id", "_ts"]
        assert ordered[2:] == ["zebra", "apple", "mango"]

    def test_empty_batch_raises(self):
        # ingest_test.go:1092-1106
        with pytest.raises(ValueError):
            detect_schema_from_batch([])


class TestValidateTableName:
    # server/core/events.go:20-31
    @pytest.mark.parametrize(
        "name,ok",
        [
            ("users", True),
            ("test.users", True),
            ("cat.schema.users", True),
            ("a.b.c.d", False),
            ("1users", False),
            ("us-ers", False),
            ("", False),
            ("a" * 128, True),
            ("a" * 129, False),
        ],
    )
    def test_cases(self, name, ok):
        assert validate_table_name(name) is ok


# ---------------------------------------------------------------------------
# Spark-backed batch processing
# ---------------------------------------------------------------------------


@pytest.fixture()
def buffer(spark):
    return IngestBuffer(spark, batch_size=1000, batch_timeout_s=0.01)


def _fresh(spark, table):
    """Drop the table AND its warehouse directory — the in-memory catalog
    resets per session while managed-table files persist on disk, so a
    plain DROP IF EXISTS can leave LOCATION_ALREADY_EXISTS behind."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.split('.')[-1]}", ignore_errors=True)


def _rows(spark, table):
    return [r.asDict() for r in spark.table(table).collect()]


class TestProcessBatch:
    def test_basic_create_and_append(self, spark, buffer):
        # ingest_test.go:290-362
        _fresh(spark, "ing_users")
        buffer.publish("ing_users", {"name": "alice", "age": 31, "active": True})
        buffer.publish("ing_users", {"name": "bob", "age": 25, "active": False})
        buffer.flush()
        rows = _rows(spark, "ing_users")
        assert len(rows) == 2
        by_name = {r["name"]: r for r in rows}
        assert by_name["alice"]["age"] == 31.0
        assert by_name["bob"]["active"] is False
        for r in rows:
            assert r["_id"] and isinstance(r["_id"], str)
            assert isinstance(r["_ts"], dt.datetime)

    def test_multiple_tables_one_flush(self, spark, buffer):
        # ingest_test.go:364-420
        _fresh(spark, "ing_a")
        _fresh(spark, "ing_b")
        buffer.publish("ing_a", {"x": 1})
        buffer.publish("ing_b", {"y": "two"})
        buffer.publish("ing_a", {"x": 3})
        buffer.flush()
        assert len(_rows(spark, "ing_a")) == 2
        assert len(_rows(spark, "ing_b")) == 1

    def test_schema_evolution_add_column(self, spark, buffer):
        # ingest_test.go:592-657
        _fresh(spark, "ing_evo")
        buffer.publish("ing_evo", {"a": 1})
        buffer.flush()
        buffer.publish("ing_evo", {"a": 2, "b": "new"})
        buffer.flush()
        rows = _rows(spark, "ing_evo")
        assert len(rows) == 2
        cols = set(rows[0].keys())
        assert {"_id", "_ts", "a", "b"} == cols
        by_a = {r["a"]: r for r in rows}
        assert by_a[1.0]["b"] is None
        assert by_a[2.0]["b"] == "new"

    def test_removed_columns_become_null(self, spark, buffer):
        # ingest_test.go:1148-1204: later messages missing a column → NULL
        _fresh(spark, "ing_rm")
        buffer.publish("ing_rm", {"keep": 1, "gone": "x"})
        buffer.flush()
        buffer.publish("ing_rm", {"keep": 2})
        buffer.flush()
        by_keep = {r["keep"]: r for r in _rows(spark, "ing_rm")}
        assert by_keep[2.0]["gone"] is None

    def test_no_type_widening(self, spark, buffer):
        # ingest.go:9 — types never change; non-conforming values → NULL
        _fresh(spark, "ing_widen")
        buffer.publish("ing_widen", {"v": 1})
        buffer.flush()
        buffer.publish("ing_widen", {"v": "not a number"})
        buffer.flush()
        vals = sorted(
            (r["v"] for r in _rows(spark, "ing_widen")),
            key=lambda x: (x is None, x),
        )
        assert vals == [1.0, None]

    def test_supplied_id_and_ts(self, spark, buffer):
        # ingest_test.go:1427-1513
        _fresh(spark, "ing_idts")
        buffer.publish(
            "ing_idts", {"_id": "custom-id", "_ts": "2023-05-01T10:00:00Z", "v": 1}
        )
        buffer.flush()
        (row,) = _rows(spark, "ing_idts")
        assert row["_id"] == "custom-id"
        assert row["_ts"] == dt.datetime(2023, 5, 1, 10, 0, 0)

    def test_unix_seconds_and_millis_ts(self, spark, buffer):
        # ingest.go:835-839 — >1e11 means milliseconds
        _fresh(spark, "ing_unix")
        buffer.publish("ing_unix", {"_ts": 1700000000, "v": 1})
        buffer.publish("ing_unix", {"_ts": 1700000000000, "v": 2})
        buffer.flush()
        by_v = {r["v"]: r for r in _rows(spark, "ing_unix")}
        assert by_v[1.0]["_ts"] == by_v[2.0]["_ts"] == dt.datetime(
            2023, 11, 14, 22, 13, 20
        )

    def test_nested_json_stored_as_string(self, spark, buffer):
        # ingest_test.go:514-590
        _fresh(spark, "ing_nested")
        buffer.publish(
            "ing_nested",
            {"user": {"name": "x", "roles": ["a", "b"]}, "counts": [1, 2, 3]},
        )
        buffer.flush()
        (row,) = _rows(spark, "ing_nested")
        import json

        assert json.loads(row["user"]) == {"name": "x", "roles": ["a", "b"]}
        assert json.loads(row["counts"]) == [1, 2, 3]

    def test_generated_ids_unique(self, spark, buffer):
        # ingest_test.go:1553-1597
        _fresh(spark, "ing_ids")
        for i in range(20):
            buffer.publish("ing_ids", {"i": i})
        buffer.flush()
        ids = [r["_id"] for r in _rows(spark, "ing_ids")]
        assert len(set(ids)) == 20
        assert all(i[0] == "c" and len(i) == 24 for i in ids)

    def test_invalid_table_name_rejected(self, buffer):
        with pytest.raises(ValueError):
            buffer.publish("bad-name!", {"v": 1})

    def test_batch_size_triggers_flush(self, spark):
        buf = IngestBuffer(spark, batch_size=3, batch_timeout_s=60)
        _fresh(spark, "ing_auto")
        buf.publish("ing_auto", {"v": 1})
        buf.publish("ing_auto", {"v": 2})
        assert not spark.catalog.tableExists("ing_auto")
        buf.publish("ing_auto", {"v": 3})  # hits batch_size → flush
        assert len(_rows(spark, "ing_auto")) == 3


class TestMultiPartTableNames:
    def test_two_part_name_with_precreated_database(self, spark, buffer):
        # ingest_test.go:422-466: schemas are not auto-created — the
        # caller pre-creates them (same contract here)
        spark.sql("CREATE DATABASE IF NOT EXISTS custom_schema")
        _fresh(spark, "custom_schema.users")
        import shutil
        shutil.rmtree("spark-warehouse/custom_schema.db/users", ignore_errors=True)
        buffer.publish("custom_schema.users", {"id": 1, "name": "John Doe"})
        buffer.flush()
        rows = spark.table("custom_schema.users").collect()
        assert len(rows) == 1
        assert rows[0]["name"] == "John Doe"

    def test_three_part_name(self, spark, buffer):
        spark.sql("CREATE DATABASE IF NOT EXISTS cat3")
        spark.sql("DROP TABLE IF EXISTS spark_catalog.cat3.users3")
        import shutil
        shutil.rmtree("spark-warehouse/cat3.db/users3", ignore_errors=True)
        buffer.publish("spark_catalog.cat3.users3", {"id": 2})
        buffer.flush()
        assert spark.table("spark_catalog.cat3.users3").count() == 1

    def test_missing_schema_errors(self, spark, buffer):
        import pytest as _pytest

        buffer.publish("no_such_schema_xyz.t", {"id": 1})
        with _pytest.raises(Exception):
            buffer.flush()


class TestTimestampHandling:
    # ingest_test.go:863-1003
    UNIX = 1686838245  # 2023-06-15 14:10:45 UTC

    def test_formats_in_one_batch(self, spark, buffer):
        _fresh(spark, "ing_ts_formats")
        buffer.publish(
            "ing_ts_formats",
            {
                "id": 1,
                "ts1": "2023-06-15T14:10:45Z",             # RFC3339
                "ts2": "2023-06-15 14:10:45",              # SQL format
                "ts3": self.UNIX,                          # unix seconds → DOUBLE
                "ts4": self.UNIX * 1000,                   # unix millis → DOUBLE
                "ts5": "2023-06-15T14:10:45.123456Z",      # fractional
                "ts6": "2023-06-15T16:10:45.0001000+02:00",  # 7 decimals + tz
            },
        )
        buffer.flush()
        (row,) = _rows(spark, "ing_ts_formats")
        # string timestamps become TIMESTAMP columns, normalized to UTC
        for col in ("ts1", "ts2", "ts5", "ts6"):
            assert isinstance(row[col], dt.datetime), col
            assert (row[col].year, row[col].month, row[col].day) == (2023, 6, 15)
            assert row[col].hour == 14
        # numeric payloads in regular columns stay numbers — only _ts
        # applies the unix-seconds/millis heuristic (ingest.go:835-839)
        assert row["ts3"] == float(self.UNIX)
        assert row["ts4"] == float(self.UNIX * 1000)


class TestLargeAndMixedPayloads:
    def test_large_message(self, spark, buffer):
        # ingest_test.go:1108-1146 (~30KB field)
        _fresh(spark, "ing_large")
        desc = "This is a test of a large field value. " * 1000
        buffer.publish("ing_large", {"id": 1, "name": "Large record", "description": desc})
        buffer.flush()
        (row,) = _rows(spark, "ing_large")
        assert row["description"] == desc
        assert len(row["description"]) > 30000

    def test_mixed_types_in_column_become_json(self, spark, buffer):
        # ingest_test.go:780-861: one column, many types → JSON strings
        _fresh(spark, "ing_mixed")
        buffer.publish("ing_mixed", {"v": 42})
        buffer.publish("ing_mixed", {"v": "text"})
        buffer.publish("ing_mixed", {"v": {"nested": True}})
        buffer.flush()
        rows = _rows(spark, "ing_mixed")
        assert len(rows) == 3
        import json as _json

        vals = {r["v"] for r in rows}
        assert "text" in vals
        assert any(v == "42" or v == 42.0 for v in vals)
        assert any(isinstance(v, str) and _json.loads(v) == {"nested": True}
                   for v in vals if isinstance(v, str) and v.startswith("{"))

    def test_special_characters_in_column_names(self, spark, buffer):
        # ingest_test.go:1027-1090: unusual-but-legal JSON keys
        _fresh(spark, "ing_special")
        buffer.publish("ing_special", {"user name": "x", "a-b": 1, "größe": 2})
        buffer.flush()
        (row,) = _rows(spark, "ing_special")
        assert row["user name"] == "x"
        assert row["a-b"] == 1.0
        assert row["größe"] == 2.0


class TestWalDurability:
    """Durable ingest queue (WalIngestQueue): the reference's JetStream
    work-queue guarantee — a publish accepted by a node that dies
    before flushing is redelivered on restart, and an acked batch is
    never delivered twice (kill-a-node, r8 verdict task #7)."""

    def test_kill_node_before_flush_loses_nothing(self, spark, tmp_path):
        from shaper_spark.ingest import IngestBuffer

        _fresh(spark, "ing_wal_t")
        wal_dir = str(tmp_path / "wal")
        node1 = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        node1.publish("ing_wal_t", {"name": "alice", "n": 1})
        node1.publish("ing_wal_t", {"name": "bob", "n": 2})
        # node1 dies here: no flush, in-memory buffer gone
        del node1
        node2 = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        node2.flush()  # replayed entries land in the warehouse
        rows = _rows(spark, "ing_wal_t")
        assert sorted(r["name"] for r in rows) == ["alice", "bob"]
        assert all(isinstance(r["_ts"], dt.datetime) for r in rows)

    def test_acked_batch_not_redelivered(self, spark, tmp_path):
        from shaper_spark.ingest import IngestBuffer

        _fresh(spark, "ing_wal_ack")
        wal_dir = str(tmp_path / "wal2")
        node1 = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        node1.publish("ing_wal_ack", {"name": "carol"})
        node1.flush()
        assert len(_rows(spark, "ing_wal_ack")) == 1
        # restart: nothing unacked, so nothing replays
        node2 = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        assert node2._buffer == []
        node2.flush()
        assert len(_rows(spark, "ing_wal_ack")) == 1

    def test_segment_truncates_when_fully_acked(self, spark, tmp_path):
        import os

        from shaper_spark.ingest import WalIngestQueue

        wal_dir = str(tmp_path / "wal3")
        q = WalIngestQueue(wal_dir)
        s1 = q.append("t", {"a": 1}, dt.datetime.utcnow())
        s2 = q.append("t", {"a": 2}, dt.datetime.utcnow())
        assert [e[0] for e in q.pending()] == [s1, s2]
        q.ack(s2)
        assert q.pending() == []
        assert os.path.getsize(q._seg) == 0
        # seqs stay monotonic after truncation
        s3 = q.append("t", {"a": 3}, dt.datetime.utcnow())
        assert s3 > s2
        assert [e[0] for e in q.pending()] == [s3]

    def test_partial_ack_redelivers_tail_only(self, spark, tmp_path):
        from shaper_spark.ingest import WalIngestQueue

        wal_dir = str(tmp_path / "wal4")
        q = WalIngestQueue(wal_dir)
        s1 = q.append("t", {"a": 1}, dt.datetime.utcnow())
        q.append("t", {"a": 2}, dt.datetime.utcnow())
        q.ack(s1)
        q.close()  # node dies; its segment lock releases
        # new queue on the same dir (restart) adopts only the tail
        q2 = WalIngestQueue(wal_dir)
        assert [e[1:3] for e in q2.pending()] == [("t", {"a": 2})]

    def test_arrival_preserved_across_replay(self, spark, tmp_path):
        from shaper_spark.ingest import WalIngestQueue

        wal_dir = str(tmp_path / "wal5")
        q = WalIngestQueue(wal_dir)
        arrival = dt.datetime(2024, 3, 1, 12, 0, 0)
        q.append("t", {"a": 1}, arrival)
        q.close()
        q2 = WalIngestQueue(wal_dir)
        assert q2.pending()[0][3] == arrival

    def test_publish_many_one_wal_write(self, spark, tmp_path):
        from shaper_spark.ingest import IngestBuffer

        _fresh(spark, "ing_wal_bulk")
        wal_dir = str(tmp_path / "wal6")
        node = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        node.publish_many(
            "ing_wal_bulk", [{"name": f"u{i}", "n": i} for i in range(5)]
        )
        # all five persisted before any flush
        assert len(node.wal.pending()) == 5
        node.close()  # node dies without flushing
        node2 = IngestBuffer(spark, batch_size=1000, wal_dir=wal_dir)
        node2.flush()
        assert len(_rows(spark, "ing_wal_bulk")) == 5

    def test_torn_trailing_record_tolerated(self, spark, tmp_path):
        """A crash mid-append leaves a partial final JSONL line; the
        next queue must still restart and keep the intact prefix."""
        from shaper_spark.ingest import WalIngestQueue

        wal_dir = str(tmp_path / "wal7")
        q = WalIngestQueue(wal_dir)
        q.append("t", {"a": 1}, dt.datetime.utcnow())
        q.append("t", {"a": 2}, dt.datetime.utcnow())
        with open(q._seg, "a") as f:
            f.write('{"seq": 3, "table": "t", "payl')  # torn mid-write
        assert [e[2] for e in q.pending()] == [{"a": 1}, {"a": 2}]
        q.close()
        q2 = WalIngestQueue(wal_dir)  # restart must not raise
        assert [e[2] for e in q2.pending()] == [{"a": 1}, {"a": 2}]

    def test_out_of_order_ack_never_passes_unapplied(self, tmp_path):
        """A later batch finishing first must not advance the
        watermark past an earlier batch that has not applied yet."""
        from shaper_spark.ingest import WalIngestQueue

        q = WalIngestQueue(str(tmp_path / "wal8"))
        now = dt.datetime.utcnow()
        seqs = [q.append("t", {"i": i}, now) for i in range(4)]
        q.ack_range(seqs[2], seqs[3])  # later batch lands first
        assert q._acked == 0  # watermark held back
        assert [e[0] for e in q.pending()] == seqs  # nothing released
        q.ack_range(seqs[0], seqs[1])  # earlier batch completes
        assert q._acked == seqs[3]
        assert q.pending() == []

    def test_failed_flush_not_acked_past(self, spark, tmp_path, monkeypatch):
        """Flush failure leaves its entries unacked AND re-queued; a
        later successful flush must not truncate them away."""
        from shaper_spark import ingest as ing

        _fresh(spark, "ing_wal_fail")
        node = ing.IngestBuffer(
            spark, batch_size=1000, wal_dir=str(tmp_path / "wal9")
        )
        node.publish("ing_wal_fail", {"name": "early"})
        real = ing.IngestBuffer._process_table_batch
        calls = {"n": 0}

        def boom(self, table, msgs):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("executor lost")
            return real(self, table, msgs)

        monkeypatch.setattr(ing.IngestBuffer, "_process_table_batch", boom)
        try:
            node.flush()
        except RuntimeError:
            pass
        assert node.wal._acked == 0  # failed batch still owed
        node.publish("ing_wal_fail", {"name": "late"})
        node.flush()  # retries the re-queued batch with the new one
        rows = _rows(spark, "ing_wal_fail")
        assert sorted(r["name"] for r in rows) == ["early", "late"]
        assert node.wal.pending() == []  # everything applied -> acked

    def test_two_live_instances_share_one_wal_dir(self, spark, tmp_path):
        """Two server instances on one metastore share the WAL
        directory without interleaving, seq collisions, or one
        truncating the other's unflushed entries; a third instance
        adopts both after they die."""
        from shaper_spark.ingest import WalIngestQueue

        wal_dir = str(tmp_path / "wal10")
        a = WalIngestQueue(wal_dir)
        b = WalIngestQueue(wal_dir)
        assert a._seg != b._seg  # private segments
        now = dt.datetime.utcnow()
        sa = a.append("t", {"who": "a"}, now)
        b.append("t", {"who": "b"}, now)
        a.ack(sa)  # a fully acked + truncated; must not touch b's
        assert a.pending() == []
        assert [e[2] for e in b.pending()] == [{"who": "b"}]
        b.append("t", {"who": "b2"}, now)
        a.close()
        b.close()
        c = WalIngestQueue(wal_dir)
        got = sorted(e[2]["who"] for e in c.pending())
        assert got == ["b", "b2"]  # adopts the dead peers' unacked

    def test_two_servers_one_metastore_no_wal_interference(
        self, spark, tmp_path
    ):
        """The r9 ADVICE scenario end-to-end: two ShaperServer
        instances on one metastore share the WAL directory; each
        buffers its own publishes, neither's flush/ack can discard the
        other's unflushed entries, and a dead instance's tail is
        adopted by the next starting buffer."""
        from shaper_spark.api import ShaperServer

        _fresh(spark, "ing_two_srv")
        db = str(tmp_path / "meta.sqlite")
        a = ShaperServer(spark, db_path=db).start()
        b = ShaperServer(spark, db_path=db).start()
        try:
            a.ingest.publish("ing_two_srv", {"who": "a1"})
            b.ingest.publish("ing_two_srv", {"who": "b1"})
            a.ingest.flush()  # a acks + truncates ITS segment only
            assert [e[2] for e in b.ingest.wal.pending()] == [
                {"who": "b1"}
            ]
            b.ingest.publish("ing_two_srv", {"who": "b2"})
        finally:
            a.stop()
            b.stop()  # b dies with b1 (flushed? no) b1+b2 unacked
        # b never flushed: a fresh buffer on the shared dir adopts
        from shaper_spark.ingest import IngestBuffer

        node = IngestBuffer(spark, batch_size=1000, wal_dir=db + ".ingest-wal")
        node.flush()
        rows = sorted(r["who"] for r in _rows(spark, "ing_two_srv"))
        assert rows == ["a1", "b1", "b2"]
        node.close()
