"""Metastore durability + event-sourcing semantics (reference:
server/core/db_schema.go:13-166 materialized tables, state.go:29-163
idempotent event handlers and replay)."""

import json
import urllib.request

import pytest

from shaper_spark.metastore import Metastore


class TestMetastore:
    def test_create_and_get_dashboard(self):
        m = Metastore()
        m.record("create_dashboard", {"id": "d1", "content": "SELECT 1", "name": "One"})
        app = m.get_app("d1")
        assert app["content"] == "SELECT 1"
        assert app["name"] == "One"
        assert app["type"] == "dashboard"

    def test_handlers_are_idempotent(self):
        m = Metastore()
        for _ in range(3):
            m.record("create_dashboard", {"id": "d1", "content": "SELECT 1"})
        assert len(m.list_apps()) == 1

    def test_update_and_delete(self):
        m = Metastore()
        m.record("create_task", {"id": "t1", "content": "SELECT 1"})
        m.record("update_task_content", {"id": "t1", "content": "SELECT 2"})
        assert m.get_app("t1")["content"] == "SELECT 2"
        m.record("delete_task", {"id": "t1"})
        assert m.get_app("t1") is None

    def test_task_run_upsert(self):
        m = Metastore()
        m.record("record_task_run", {"task_id": "t1", "last_run_success": True})
        m.record("record_task_run", {"task_id": "t1", "last_run_success": False})
        run = m.get_task_run("t1")
        assert run["last_run_success"] == 0
        assert run["next_run_type"] == "single"

    def test_durability_across_instances(self, tmp_path):
        db = str(tmp_path / "meta.db")
        m1 = Metastore(db)
        m1.record("create_dashboard", {"id": "d1", "content": "SELECT 1"})
        m1.close()
        m2 = Metastore(db)
        assert m2.get_app("d1")["content"] == "SELECT 1"
        m2.close()

    def test_rebuild_replays_event_log(self, tmp_path):
        db = str(tmp_path / "meta.db")
        m = Metastore(db)
        m.record("create_dashboard", {"id": "d1", "content": "SELECT 1"})
        m.record("update_dashboard_content", {"id": "d1", "content": "SELECT 2"})
        m.record("create_task", {"id": "t1", "content": "SELECT 3"})
        m.record("delete_task", {"id": "t1"})
        # Corrupt the materialized state, then replay the log.
        m._db.execute("DELETE FROM apps")
        m.rebuild()
        assert m.get_app("d1")["content"] == "SELECT 2"
        assert m.get_app("t1") is None
        m.close()

    def test_unknown_event_rejected(self):
        with pytest.raises(ValueError):
            Metastore().record("drop_everything", {})


class TestServerRestart:
    """Reference behavior: metadata survives a process restart."""

    @pytest.fixture()
    def _servers(self, spark, tmp_path):
        from shaper_spark.api import ShaperServer

        db = str(tmp_path / "meta.db")
        first = ShaperServer(spark, db_path=db).start()
        yield first, db
        first.stop()

    def test_dashboard_survives_restart(self, spark, _servers):
        from shaper_spark.api import ShaperServer

        first, db = _servers
        body = json.dumps(
            {"id": "d1", "content": "SELECT 42 AS answer"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{first.port}/api/dashboards",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req).status == 200
        first.stop()

        second = ShaperServer(spark, db_path=db).start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{second.port}/api/dashboards/d1"
            ) as resp:
                assert resp.status == 200
                tree = json.loads(resp.read())
            assert tree["sections"]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{second.port}/api/dashboards"
            ) as resp:
                listed = json.loads(resp.read())
            assert [d["id"] for d in listed] == ["d1"]
        finally:
            second.stop()

    def test_task_reregistered_on_restart(self, spark, tmp_path):
        from shaper_spark.api import ShaperServer

        db = str(tmp_path / "meta2.db")
        first = ShaperServer(spark, db_path=db).start()
        body = json.dumps(
            {"id": "t1", "content": "SELECT 1 AS x"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{first.port}/api/tasks",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req).status == 200
        first.stop()

        second = ShaperServer(spark, db_path=db).start()
        try:
            assert "t1" in second.scheduler._contents
            with urllib.request.urlopen(
                f"http://127.0.0.1:{second.port}/api/tasks"
            ) as resp:
                listed = json.loads(resp.read())
            assert [t["id"] for t in listed] == ["t1"]
        finally:
            second.stop()


class TestListAppsFilters:
    """Reference list semantics (list_apps.go:141-212 +
    list_apps_test.go:156-215): query filter with relevance ranking,
    sort, pagination."""

    def _store(self):
        m = Metastore()
        for i, name in enumerate(
            ["Root Dashboard", "Folder A Dashboard", "Folder B Dashboard",
             "Alpha", "beta"]
        ):
            m.record(
                "create_dashboard",
                {"id": f"d{i}", "content": "SELECT 1", "name": name},
            )
        return m

    def test_query_filter_case_insensitive(self):
        m = self._store()
        hits = m.list_apps("dashboard", query="folder a")
        assert [h["name"] for h in hits] == ["Folder A Dashboard"]

    def test_query_relevance_exact_prefix_contains(self):
        m = Metastore()
        for i, name in enumerate(["xyz alpha", "alpha xyz", "alpha"]):
            m.record(
                "create_dashboard",
                {"id": f"r{i}", "content": "SELECT 1", "name": name},
            )
        hits = m.list_apps("dashboard", query="alpha")
        assert [h["name"] for h in hits] == ["alpha", "alpha xyz", "xyz alpha"]

    def test_pagination_with_name_sort(self):
        m = self._store()
        # name ASC (binary collation): Alpha, Folder A, Folder B, Root, beta
        page = m.list_apps("dashboard", sort="name", limit=2, offset=3)
        assert [p["name"] for p in page] == ["Root Dashboard", "beta"]

    def test_sort_desc(self):
        m = self._store()
        names = [a["name"] for a in m.list_apps("dashboard", sort="name", order="desc")]
        assert names == sorted(names, reverse=True)

    def test_sort_column_whitelisted(self):
        m = self._store()
        # unknown sort falls back to id rather than injecting SQL
        assert [a["id"] for a in m.list_apps("dashboard", sort="1; DROP TABLE apps")] == [
            "d0", "d1", "d2", "d3", "d4"
        ]


class TestReplayTimestamps:
    def test_rebuild_preserves_event_times(self, tmp_path):
        """Replay is a faithful restore: created_at/updated_at come back
        identical to the original event times, not the rebuild time."""
        from shaper_spark.metastore import Metastore

        db = str(tmp_path / "meta_ts.db")
        m = Metastore(db)
        m.record("create_dashboard", {"id": "d1", "content": "SELECT 1"})
        m.record("update_dashboard_content", {"id": "d1", "content": "SELECT 2"})
        before = m.get_app("d1")
        m.rebuild()
        after = m.get_app("d1")
        assert after["created_at"] == before["created_at"]
        assert after["updated_at"] == before["updated_at"]
        m.close()
