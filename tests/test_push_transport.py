"""Push half of the cross-instance task-result transport: the
executing instance POSTs results to live peers registered in the
shared metastore (the NATS-publish analogue), with the shared-log poll
as catch-up. The poll thread on the receiver is STOPPED in these tests
so only the push path can deliver."""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from shaper_spark.api import ShaperServer
from shaper_spark.tasks import TaskResult


@pytest.fixture()
def pair(spark, tmp_path):
    db = str(tmp_path / "meta.sqlite")
    a = ShaperServer(spark, db_path=db).start()
    b = ShaperServer(spark, db_path=db).start()
    yield a, b
    a.stop()
    b.stop()


def _result(tid="pt1"):
    return TaskResult(
        started_at=1, success=True, total_queries=1,
        next_run_at=0, schedule_type="single",
    )


class TestPushTransport:
    def test_instances_registered(self, pair):
        a, b = pair
        live = a.store.live_instances(exclude=a.scheduler.instance_id)
        assert any(
            iid == b.scheduler.instance_id and url.startswith("http://")
            for iid, url in live
        )

    def test_result_pushed_without_polling(self, pair):
        a, b = pair
        # receiver's poll thread off: push is the only delivery path
        b.scheduler._poll_stop.set()
        b.scheduler._poll_thread.join(timeout=3)
        tid = "pt1"
        content = "SELECT 1 AS x;"
        for srv in (a, b):
            srv.store.record(
                "create_task", {"id": tid, "content": content}
            )
            srv.scheduler._contents[tid] = content
        res = _result(tid)
        a.scheduler.results.setdefault(tid, []).append(res)
        a.scheduler._broadcast_result(tid, res)
        deadline = time.time() + 5
        while time.time() < deadline and not b.scheduler.results.get(tid):
            time.sleep(0.05)
        got = b.scheduler.results.get(tid)
        assert got and got[0].success and got[0].total_queries == 1

    def test_poll_skips_pushed_seq(self, pair):
        a, b = pair
        tid = "pt2"
        content = "SELECT 1 AS x;"
        for srv in (a, b):
            srv.scheduler._contents[tid] = content
        res = _result(tid)
        a.scheduler._broadcast_result(tid, res)
        # wait for push delivery, then give the poll a full interval to
        # (wrongly) double-apply
        deadline = time.time() + 5
        while time.time() < deadline and not b.scheduler.results.get(tid):
            time.sleep(0.05)
        time.sleep(1.2)
        assert len(b.scheduler.results.get(tid, [])) == 1

    def test_unregistered_sender_rejected(self, pair):
        a, b = pair
        req = urllib.request.Request(
            f"http://127.0.0.1:{b.port}/api/internal/task-result",
            data=json.dumps(
                {"instance": "ghost", "task_id": "x", "seq": 999,
                 "result_json": "{}"}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 403

    def test_registered_sender_without_signature_rejected(self, pair):
        """Instance ids are broadcast in the clear, so a matching id
        alone must not admit a forged result: the HMAC over the body
        (shared per-metastore push secret) is the trust proof."""
        a, b = pair
        payload = json.dumps(
            {"instance": a.scheduler.instance_id, "task_id": "forge",
             "seq": 998, "result_json": "{}"}
        ).encode()
        for headers in (
            {"Content-Type": "application/json"},
            {"Content-Type": "application/json",
             "X-Shaper-Push-Signature": "00" * 32},
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{b.port}/api/internal/task-result",
                data=payload, headers=headers, method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    code = r.status
            except urllib.error.HTTPError as e:
                code = e.code
            assert code == 403
        assert not b.scheduler.results.get("forge")

    def test_signed_push_accepted(self, pair):
        from shaper_spark.tasks import push_signature

        a, b = pair
        tid = "pt-signed"
        content = "SELECT 1 AS x;"
        b.scheduler._contents[tid] = content
        res = _result(tid)
        payload = json.dumps(
            {"seq": 997, "instance": a.scheduler.instance_id,
             "task_id": tid,
             "result_json": json.dumps(res.to_dict(), default=str)}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{b.port}/api/internal/task-result",
            data=payload,
            headers={"Content-Type": "application/json",
                     "X-Shaper-Push-Signature":
                         push_signature(a.store, payload)},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert json.loads(r.read())["applied"] is True
        assert b.scheduler.results.get(tid)

    def test_instance_ids_unpredictable(self, pair):
        a, b = pair
        for srv in (a, b):
            iid = srv.scheduler.instance_id
            assert iid.startswith("inst-") and len(iid) == 5 + 16


class TestPushReplayAfterRestart:
    def test_replay_after_restart_rejected(self, spark, tmp_path):
        """A captured signed body (valid HMAC, registered instance)
        must not re-apply after a receiver restart: the push seq is the
        event-log sequence of the recorded result, and a fresh
        scheduler's cursor starts at latest_event_seq(), so replays of
        anything already in the log are dropped even though the
        in-memory seen-set died with the old process."""
        from shaper_spark.tasks import push_signature

        db = str(tmp_path / "replay.sqlite")
        a = ShaperServer(spark, db_path=db).start()
        tid = "pt-replay"
        res = _result(tid)
        payload_dict = {
            "task_id": tid,
            "instance": a.scheduler.instance_id,
            "result_json": json.dumps(res.to_dict(), default=str),
        }
        seq = a.store.record("task_run_result", payload_dict)
        body = json.dumps({"seq": seq, **payload_dict}).encode()
        sig = push_signature(a.store, body)
        # "restart": a new receiver on the same metastore, started
        # AFTER the event was recorded
        b = ShaperServer(spark, db_path=db).start()
        b.scheduler._contents[tid] = "SELECT 1 AS x;"
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{b.port}/api/internal/task-result",
                data=body,
                headers={"Content-Type": "application/json",
                         "X-Shaper-Push-Signature": sig},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                assert r.status == 200
                assert json.loads(r.read())["applied"] is False
            assert not b.scheduler.results.get(tid)
        finally:
            a.stop()
            b.stop()

    def test_secret_setdefault_is_create_once(self, spark, tmp_path):
        """Two stores racing on first use converge on ONE push secret
        (insert-if-absent + read-back, not last-write-wins)."""
        from shaper_spark.metastore import Metastore

        db = str(tmp_path / "race.sqlite")
        s1 = Metastore(db)
        s2 = Metastore(db)
        v1 = s1.config_setdefault("race_key", "alpha")
        v2 = s2.config_setdefault("race_key", "beta")
        assert v1 == v2 == "alpha"


class TestResultWalDurability:
    """Outgoing task results ride a WAL (same segment+ack design as
    the ingest queue): a node dying — or a store outage — between
    executing a task and recording its result redelivers on restart
    instead of losing it (kill-a-node, r9 verdict task #8)."""

    def test_store_outage_then_restart_loses_nothing(self, spark, tmp_path):
        from shaper_spark.tasks import TaskScheduler

        from shaper_spark.metastore import Metastore

        db = str(tmp_path / "meta.sqlite")
        wal_dir = str(tmp_path / "results-wal")
        store = Metastore(db)
        sched = TaskScheduler(spark, store=store, result_wal_dir=wal_dir)
        before = store.latest_event_seq()
        # store goes down exactly between run and record
        real_record = store.record
        store.record = lambda *a, **k: (_ for _ in ()).throw(OSError("down"))
        sched._broadcast_result("twal1", TaskResult(
            started_at=1, success=True, total_queries=3,
            next_run_at=0, schedule_type="single",
        ))
        assert store.latest_event_seq() == before  # nothing recorded
        assert len(sched.result_wal.pending()) == 1  # but persisted
        store.record = real_record
        sched.shutdown()  # node dies; segment lock releases
        # restart on the same WAL dir replays the owed record
        sched2 = TaskScheduler(spark, store=store, result_wal_dir=wal_dir)
        rows = store.task_results_since(before)
        assert len(rows) == 1
        payload = rows[0][1]
        assert payload["task_id"] == "twal1"
        assert json.loads(payload["result_json"])["totalQueries"] == 3
        assert sched2.result_wal.pending() == []  # acked after record
        sched2.shutdown()
        store.close()

    def test_recorded_result_not_replayed(self, spark, tmp_path):
        from shaper_spark.tasks import TaskScheduler

        from shaper_spark.metastore import Metastore

        db = str(tmp_path / "meta2.sqlite")
        wal_dir = str(tmp_path / "results-wal2")
        store = Metastore(db)
        sched = TaskScheduler(spark, store=store, result_wal_dir=wal_dir)
        before = store.latest_event_seq()
        sched._broadcast_result("twal2", _result("twal2"))
        assert sched.result_wal.pending() == []  # acked immediately
        sched.shutdown()
        sched2 = TaskScheduler(spark, store=store, result_wal_dir=wal_dir)
        # restart records nothing new: exactly the one original event
        assert len(store.task_results_since(before)) == 1
        sched2.shutdown()
        store.close()

    def test_replayed_record_deduped_by_uid_on_receivers(
        self, spark, tmp_path
    ):
        """A WAL replay re-records under a NEW event seq; receivers
        must dedupe on result_uid, not seq."""
        from shaper_spark.tasks import TaskScheduler

        from shaper_spark.metastore import Metastore

        db = str(tmp_path / "meta3.sqlite")
        store = Metastore(db)
        recv = TaskScheduler(spark, store=store)
        recv._contents["twal3"] = "SELECT 1 AS x;"
        payload = {
            "task_id": "twal3",
            "instance": "other-node",
            "result_uid": "uid-abc",
            "result_json": json.dumps(_result("twal3").to_dict()),
        }
        assert recv._apply_remote(payload) is True
        assert recv._apply_remote(payload) is False  # replayed record
        assert len(recv.results["twal3"]) == 1
        recv.shutdown()
        store.close()
