"""Auth layer (shaper_spark/auth.py + folders.py over the event-sourced
Metastore): setup-only first user, HMAC session/API-key tokens,
invites, permissions, folder tree ops — and event-log replay restoring
all of it (the reference's restore-from-partial-state property)."""

from __future__ import annotations

import pytest

from shaper_spark.auth import (
    ALL_PERMISSIONS,
    API_KEY_PREFIX,
    Actor,
    AuthError,
    AuthService,
    SESSION_TOKEN_PREFIX,
)
from shaper_spark.folders import FolderService
from shaper_spark.metastore import Metastore


@pytest.fixture()
def store():
    s = Metastore()
    yield s
    s.close()


@pytest.fixture()
def auth(store):
    return AuthService(store)


ADMIN = Actor("user", "admin")


class TestUsersAndSessions:
    def test_no_auth_passthrough_until_first_user(self, auth):
        assert not auth.login_required()
        assert auth.valid_token("").valid  # no_auth mode
        auth.create_user("a@b.c", "pw12345678", "Alice")
        assert auth.login_required()
        assert not auth.valid_token("").valid

    def test_first_user_only(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        with pytest.raises(AuthError, match="setup already completed"):
            auth.create_user("x@y.z", "pw12345678")

    def test_login_token_roundtrip(self, auth):
        auth.create_user("A@B.c ", "pw12345678", "Alice")
        token = auth.login("a@b.c", "pw12345678")
        assert token.startswith(SESSION_TOKEN_PREFIX)
        info = auth.valid_token(token)
        assert info.valid and info.is_user
        assert info.user_email == "a@b.c" and info.user_name == "Alice"
        # wrong password / garbage tokens fail
        with pytest.raises(AuthError, match="invalid password"):
            auth.login("a@b.c", "nope")
        assert not auth.valid_token(token + "x").valid
        assert not auth.valid_token(SESSION_TOKEN_PREFIX + "zz.yy").valid

    def test_logout_invalidates(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        token = auth.login("a@b.c", "pw12345678")
        sid = auth.valid_token(token).session_id
        auth.logout(sid)
        assert not auth.valid_token(token).valid

    def test_session_expiry(self, store):
        auth = AuthService(store, session_exp_s=0.0)
        auth.create_user("a@b.c", "pw12345678")
        token = auth.login("a@b.c", "pw12345678")
        assert not auth.valid_token(token).valid

    def test_password_change_invalidates_other_sessions(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        t1 = auth.login("a@b.c", "pw12345678")
        t2 = auth.login("a@b.c", "pw12345678")
        info = auth.valid_token(t1)
        with pytest.raises(AuthError, match="invalid current password"):
            auth.update_user_password(
                info.user_id, "wrong", "newpw123456", ADMIN
            )
        auth.update_user_password(
            info.user_id, "pw12345678", "newpw123456", ADMIN,
            exclude_session_id=info.session_id,
        )
        assert auth.valid_token(t1).valid  # excluded session survives
        assert not auth.valid_token(t2).valid
        auth.login("a@b.c", "newpw123456")

    def test_cannot_delete_last_user(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        uid = auth.valid_token(auth.login("a@b.c", "pw12345678")).user_id
        with pytest.raises(AuthError, match="last user"):
            auth.delete_user(uid, ADMIN)

    def test_invite_claim_flow(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        inv = auth.create_invite("new@b.c", ADMIN)
        token = auth.claim_invite(inv["code"], "Newbie", "claimpw12345")
        info = auth.valid_token(token)
        assert info.valid and info.user_email == "new@b.c"
        # invite is consumed
        assert auth.get_invite(inv["code"]) is None
        with pytest.raises(AuthError, match="not found or expired"):
            auth.claim_invite(inv["code"], "Again", "claimpw12345")
        # two active users now; deleting one works
        auth.delete_user(info.user_id, ADMIN)
        assert not auth.valid_token(token).valid  # sessions went with it

    def test_invite_expiry(self, store):
        auth = AuthService(store, invite_exp_s=0.0)
        auth.create_user("a@b.c", "pw12345678")
        inv = auth.create_invite("x@y.z", ADMIN)
        assert auth.get_invite(inv["code"]) is None

    def test_list_users(self, auth):
        auth.create_user("a@b.c", "pw12345678", "Alice")
        auth.create_invite("p@q.r", ADMIN)
        out = auth.list_users()
        assert [u["email"] for u in out["users"]] == ["a@b.c"]
        assert [i["email"] for i in out["invites"]] == ["p@q.r"]
        assert out["inviteValidTimeInSeconds"] > 0


class TestApiKeys:
    def test_key_lifecycle_and_permissions(self, auth):
        auth.create_user("a@b.c", "pw12345678")
        kid, token = auth.create_api_key("ci", ["data:query"], ADMIN)
        assert token.startswith(API_KEY_PREFIX)
        info = auth.valid_token(token)
        assert info.valid and not info.is_user and info.api_key_id == kid
        assert auth.has_permission(info, "data:query")
        assert not auth.has_permission(info, "deploy")
        # users hold everything
        uinfo = auth.valid_token(auth.login("a@b.c", "pw12345678"))
        assert all(auth.has_permission(uinfo, p) for p in ALL_PERMISSIONS)
        auth.update_api_key_permissions(kid, ["deploy"], ADMIN)
        info = auth.valid_token(token)
        assert auth.has_permission(info, "deploy")
        assert not auth.has_permission(info, "data:query")
        auth.delete_api_key(kid, ADMIN)
        assert not auth.valid_token(token).valid

    def test_unknown_permission_rejected(self, auth):
        with pytest.raises(AuthError, match="unknown permission"):
            auth.create_api_key("k", ["root"], ADMIN)


class TestFolders:
    def test_tree_paths_and_moves(self, store):
        f = FolderService(store)
        a = f.create_folder("Marketing", "/", ADMIN)
        b = f.create_folder("Q3", "/Marketing", ADMIN)
        assert f.resolve_path("/Marketing/Q3/") == b["id"]
        assert f.id_to_path(b["id"]) == "/Marketing/Q3/"
        assert f.resolve_path("/") is None
        with pytest.raises(AuthError, match="already exists"):
            f.create_folder("Marketing", "/", ADMIN)
        with pytest.raises(AuthError, match="slashes"):
            f.create_folder("a/b", "/", ADMIN)
        # app into folder, then move it
        store.record(
            "create_dashboard",
            {"id": "d1", "name": "D1", "content": "SELECT 1",
             "folder_id": a["id"]},
        )
        f.move_items(["d1"], [], "/Marketing/Q3", ADMIN)
        assert store.get_app("d1")["folder_id"] == b["id"]
        listing = f.list_folder("/Marketing/Q3")
        assert [x["id"] for x in listing["apps"]] == ["d1"]
        # cycle: Marketing into its own subtree
        with pytest.raises(AuthError, match="own subtree"):
            f.move_items([], [a["id"]], "/Marketing/Q3", ADMIN)

    def test_rename_and_duplicate_guard(self, store):
        f = FolderService(store)
        a = f.create_folder("A", "/", ADMIN)
        f.create_folder("B", "/", ADMIN)
        with pytest.raises(AuthError, match="already exists"):
            f.rename_folder(a["id"], "B", ADMIN)
        f.rename_folder(a["id"], "C", ADMIN)
        assert f.resolve_path("/C") == a["id"]

    def test_delete_cascades_subtree_and_apps(self, store):
        f = FolderService(store)
        a = f.create_folder("A", "/", ADMIN)
        b = f.create_folder("B", "/A", ADMIN)
        store.record(
            "create_task",
            {"id": "t1", "name": "T1", "content": "SELECT 1",
             "folder_id": b["id"]},
        )
        store.record(
            "record_task_run",
            {"task_id": "t1", "last_run_at": "2026-01-01T00:00:00"},
        )
        f.delete_folder(a["id"], ADMIN)
        assert store.query("SELECT * FROM folders") == []
        assert store.get_app("t1") is None
        assert store.get_task_run("t1") is None


class TestReplay:
    def test_rebuild_restores_auth_state(self, store):
        auth = AuthService(store)
        f = FolderService(store)
        auth.create_user("a@b.c", "pw12345678", "Alice")
        token = auth.login("a@b.c", "pw12345678")
        kid, ktoken = auth.create_api_key("ci", ["data:query"], ADMIN)
        folder = f.create_folder("F", "/", ADMIN)
        store.rebuild()
        assert auth.valid_token(token).valid
        assert auth.valid_token(ktoken).api_key_id == kid
        assert f.resolve_path("/F") == folder["id"]
        assert auth.list_users()["users"][0]["name"] == "Alice"
