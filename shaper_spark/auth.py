"""Users, sessions, invites and API keys — the reference's auth layer
(server/core/auth.go, users.go, keys.go) re-expressed over the
event-sourced Metastore.

Semantics mirrored from the reference:

- **Setup-only first user** (users.go:44-86): ``create_user`` succeeds
  only while no active user exists; every later account arrives via an
  invite (``create_invite`` → ``claim_invite``). Once a user exists,
  ``login_required`` flips on and stays on.
- **Opaque HMAC tokens** (auth.go:239-327): a token is
  ``shapersession.<id>.<random>`` / ``shaperkey.<id>.<random>``; the
  store keeps only (hash, salt) where hash = HMAC-SHA256(salt, token),
  compared constant-time. Sessions expire ``session_exp_s`` after
  creation; expired rows are garbage-collected on the next login.
- **Actors** (auth.go:29-106): user/api_key/no_auth/task/public;
  users hold every permission, API keys only their granted list
  (keys.go:22-40 names the grantable permissions).
- **Password hashing**: the reference uses bcrypt; this build uses
  stdlib ``hashlib.scrypt`` (same role — salted, memory-hard KDF) so
  no non-baked dependency is needed. Hash strings are self-describing
  (``scrypt$<salt>$<hex>``).

State writes flow through ``Metastore.record`` exactly like dashboards
and tasks, so ``rebuild()`` replays auth history too. Scale note: auth
metadata is tiny and driver-local; nothing here touches Spark.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import secrets
from dataclasses import dataclass, field
from typing import Any

from .metastore import Metastore

__all__ = [
    "Actor",
    "AuthError",
    "AuthInfo",
    "AuthService",
    "ALL_PERMISSIONS",
    "SESSION_TOKEN_PREFIX",
    "API_KEY_PREFIX",
]

SESSION_TOKEN_PREFIX = "shapersession."  # auth.go:108
API_KEY_PREFIX = "shaperkey."  # keys.go:20

# keys.go:22-40
PERMISSION_GENERATE_JWT = "jwt"
PERMISSION_DEPLOY = "deploy"
PERMISSION_QUERY_DATA = "data:query"
PERMISSION_INGEST_DATA = "data:ingest"
PERMISSION_READ_METRICS = "metrics"
PERMISSION_READ_DASHBOARD = "dashboard:read"
PERMISSION_READ_SCHEMA = "schema:read"
ALL_PERMISSIONS = [
    PERMISSION_GENERATE_JWT,
    PERMISSION_DEPLOY,
    PERMISSION_QUERY_DATA,
    PERMISSION_INGEST_DATA,
    PERMISSION_READ_METRICS,
    PERMISSION_READ_DASHBOARD,
    PERMISSION_READ_SCHEMA,
]

SESSION_EXP_S = 30 * 24 * 3600  # main.go:433 --sessionexp default
INVITE_EXP_S = 7 * 24 * 3600  # main.go:434 --inviteexp default
JWT_EXP_S = 15 * 60  # main.go:430 --jwtexp default
CONFIG_KEY_JWT_SECRET = "jwt_secret"


class AuthError(Exception):
    """Validation failure in the pre-event layer (reference returns
    these as plain errors before SubmitState)."""


@dataclass
class Actor:
    """auth.go:29-76."""

    type: str  # user | api_key | no_auth | task | public
    id: str = ""

    def __str__(self) -> str:
        return f"{self.type}:{self.id}" if self.id else self.type

    @classmethod
    def from_string(cls, s: str) -> "Actor":
        t, _, i = s.partition(":")
        return cls(t, i)


@dataclass
class AuthInfo:
    """auth.go:128-137."""

    valid: bool
    is_user: bool = False
    user_id: str = ""
    user_email: str = ""
    user_name: str = ""
    session_id: str = ""
    api_key_id: str = ""
    api_key_name: str = ""
    permissions: list[str] = field(default_factory=list)


def _hash_password(password: str) -> str:
    salt = secrets.token_hex(16)
    digest = hashlib.scrypt(
        password.encode(), salt=salt.encode(), n=2**14, r=8, p=1
    )
    return f"scrypt${salt}${digest.hex()}"


def _check_password(password: str, stored: str) -> bool:
    try:
        algo, salt, digest = stored.split("$", 2)
    except ValueError:
        return False
    if algo != "scrypt":
        return False
    candidate = hashlib.scrypt(
        password.encode(), salt=salt.encode(), n=2**14, r=8, p=1
    )
    return hmac.compare_digest(candidate.hex(), digest)


def _token_hash(token: str, salt: str) -> str:
    # auth.go:244-247 — HMAC-SHA256 keyed on the per-row salt
    return hmac.new(salt.encode(), token.encode(), hashlib.sha256).hexdigest()


def _now_s() -> float:
    import time

    return time.time()


def _iso(ts: float) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).isoformat()


def _parse_iso_s(s: str) -> float:
    import datetime as dt

    t = dt.datetime.fromisoformat(s)
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return t.timestamp()


def _new_id() -> str:
    # stands in for the reference's cuid2 (users.go:75)
    return secrets.token_hex(12)


class AuthService:
    """The validating layer in front of the Metastore's auth events —
    reference ``core`` functions keyed 1:1 (docstrings cite each)."""

    def __init__(
        self,
        store: Metastore,
        session_exp_s: float = SESSION_EXP_S,
        invite_exp_s: float = INVITE_EXP_S,
    ):
        self.store = store
        self.session_exp_s = session_exp_s
        self.invite_exp_s = invite_exp_s

    # -- login-required / setup (users.go:44-86, auth.go:342-346) ------

    def login_required(self) -> bool:
        rows = self.store.query(
            "SELECT COUNT(*) AS c FROM users WHERE deleted_at IS NULL"
        )
        return rows[0]["c"] > 0

    def create_user(
        self, email: str, password: str, name: str = "", actor: Actor | None = None
    ) -> str:
        """Setup-only: the FIRST user (users.go:44-86). Later users
        claim invites."""
        email = email.strip().lower()
        name = name.strip() or email
        if self.login_required():
            raise AuthError("user setup already completed")
        uid = _new_id()
        self.store.record(
            "create_user",
            {
                "id": uid,
                "email": email,
                "name": name,
                "password_hash": _hash_password(password),
                "created_by": str(actor) if actor else "",
            },
        )
        return uid

    # -- sessions (auth.go:139-264) ------------------------------------

    def login(self, email: str, password: str) -> str:
        """auth.go:213-237 → session token on success."""
        email = email.strip().lower()
        rows = self.store.query(
            "SELECT id, password_hash FROM users"
            " WHERE deleted_at IS NULL AND email = ?",
            (email,),
        )
        if not rows:
            raise AuthError("error finding user")
        if not _check_password(password, rows[0]["password_hash"]):
            raise AuthError("invalid password")
        return self.create_session_for_user(rows[0]["id"])

    def create_session_for_user(self, user_id: str) -> str:
        """auth.go:239-264; expired-session GC piggybacks here like the
        reference's HandleCreateSession (auth.go:168-199)."""
        cutoff = _iso(_now_s() - self.session_exp_s)
        for row in self.store.query(
            "SELECT id FROM sessions WHERE user_id = ? AND created_at < ?",
            (user_id, cutoff),
        ):
            self.store.record("delete_session", {"id": row["id"]})
        sid = _new_id()
        token = f"{SESSION_TOKEN_PREFIX}{sid}.{secrets.token_hex(16)}"
        salt = secrets.token_hex(16)
        self.store.record(
            "create_session",
            {
                "id": sid,
                "user_id": user_id,
                "hash": _token_hash(token, salt),
                "salt": salt,
            },
        )
        return token

    def logout(self, session_id: str) -> None:
        if not session_id:
            raise AuthError("session ID is required")
        self.store.record("delete_session", {"id": session_id})

    def valid_token(self, token: str) -> AuthInfo:
        """auth.go:342-398: no-auth passthrough until a user exists,
        then session tokens, then API keys."""
        if not self.login_required() and not token:
            return AuthInfo(valid=True)
        if token.startswith(SESSION_TOKEN_PREFIX):
            sid = token[len(SESSION_TOKEN_PREFIX):].split(".", 1)[0]
            rows = self.store.query(
                "SELECT s.id AS sid, s.hash, s.salt, s.created_at,"
                "       u.id AS uid, u.email, u.name"
                " FROM sessions s JOIN users u ON s.user_id = u.id"
                " WHERE s.id = ?",
                (sid,),
            )
            if rows:
                r = rows[0]
                fresh = (
                    _now_s() - _parse_iso_s(r["created_at"])
                    <= self.session_exp_s
                )
                if fresh and hmac.compare_digest(
                    _token_hash(token, r["salt"]), r["hash"]
                ):
                    return AuthInfo(
                        valid=True,
                        is_user=True,
                        user_id=r["uid"],
                        user_email=r["email"],
                        user_name=r["name"],
                        session_id=r["sid"],
                    )
        if token.startswith(API_KEY_PREFIX):
            kid = token[len(API_KEY_PREFIX):].split(".", 1)[0]
            rows = self.store.query(
                "SELECT id, hash, salt, name, permissions FROM api_keys"
                " WHERE id = ?",
                (kid,),
            )
            if rows and hmac.compare_digest(
                _token_hash(token, rows[0]["salt"]), rows[0]["hash"]
            ):
                perms = json.loads(rows[0]["permissions"] or "[]")
                return AuthInfo(
                    valid=True,
                    is_user=False,
                    api_key_id=kid,
                    api_key_name=rows[0]["name"],
                    permissions=perms,
                )
        return AuthInfo(valid=False)

    def has_permission(self, info: AuthInfo, permission: str) -> bool:
        """auth.go:44-69: users (and no-auth mode) hold every
        permission; API keys only their granted list."""
        if not info.valid:
            return False
        if not info.api_key_id:
            return True
        return permission in info.permissions

    # -- user management (users.go:168-445) ----------------------------

    def update_user_password(
        self,
        user_id: str,
        current_password: str,
        new_password: str,
        actor: Actor,
        exclude_session_id: str = "",
    ) -> None:
        rows = self.store.query(
            "SELECT password_hash FROM users"
            " WHERE id = ? AND deleted_at IS NULL",
            (user_id,),
        )
        if not rows:
            raise AuthError("user not found")
        if not _check_password(current_password, rows[0]["password_hash"]):
            raise AuthError("invalid current password")
        self.store.record(
            "update_user_password",
            {
                "user_id": user_id,
                "password_hash": _hash_password(new_password),
                "updated_by": str(actor),
                "exclude_session_id": exclude_session_id,
            },
        )

    def update_user_name(self, user_id: str, name: str, actor: Actor) -> None:
        name = name.strip()
        if not name:
            raise AuthError("name cannot be empty")
        self.store.record(
            "update_user_name",
            {"user_id": user_id, "name": name, "updated_by": str(actor)},
        )

    def delete_user(self, user_id: str, actor: Actor) -> None:
        rows = self.store.query(
            "SELECT COUNT(*) AS c FROM users"
            " WHERE id = ? AND deleted_at IS NULL",
            (user_id,),
        )
        if rows[0]["c"] == 0:
            raise AuthError("user not found")
        total = self.store.query(
            "SELECT COUNT(*) AS c FROM users WHERE deleted_at IS NULL"
        )[0]["c"]
        if total <= 1:
            raise AuthError("cannot delete the last user")
        self.store.record(
            "delete_user", {"id": user_id, "deleted_by": str(actor)}
        )

    def list_users(
        self, sort: str = "created_at", order: str = "desc"
    ) -> dict[str, Any]:
        """users.go:320-343 — UserList incl. invites + validity window."""
        order_by = sort if sort in ("name", "email") else "created_at"
        direction = "ASC" if order == "asc" else "DESC"
        users = self.store.query(
            "SELECT id, email, name, created_at, updated_at FROM users"
            f" WHERE deleted_at IS NULL ORDER BY {order_by} {direction}"
        )
        invites = self.store.query(
            "SELECT code, email, created_at FROM invites"
            " ORDER BY created_at DESC"
        )
        return {
            "users": users,
            "invites": invites,
            "inviteValidTimeInSeconds": int(self.invite_exp_s),
        }

    # -- invites (users.go:447-703) ------------------------------------

    def create_invite(self, email: str, actor: Actor) -> dict[str, Any]:
        email = email.strip().lower()
        code = secrets.token_hex(8)  # generateInviteCode (users.go:567)
        self.store.record(
            "create_invite",
            {"code": code, "email": email, "created_by": str(actor)},
        )
        return {"code": code, "email": email}

    def get_invite(self, code: str) -> dict[str, Any] | None:
        rows = self.store.query(
            "SELECT code, email, created_at FROM invites WHERE code = ?",
            (code,),
        )
        if not rows:
            return None
        if _now_s() - _parse_iso_s(rows[0]["created_at"]) > self.invite_exp_s:
            return None  # isInviteExpired (users.go:454-456)
        return rows[0]

    def delete_invite(self, code: str, actor: Actor) -> None:
        if not self.store.query(
            "SELECT 1 FROM invites WHERE code = ?", (code,)
        ):
            raise AuthError("invite not found")
        self.store.record(
            "delete_invite", {"code": code, "deleted_by": str(actor)}
        )

    def claim_invite(self, code: str, name: str, password: str) -> str:
        """users.go:594-641: invite → new user → session token."""
        invite = self.get_invite(code)
        if invite is None:
            raise AuthError("invite not found or expired")
        uid = _new_id()
        self.store.record(
            "claim_invite",
            {
                "id": uid,
                "code": code,
                "email": invite["email"],
                "name": name.strip() or invite["email"],
                "password_hash": _hash_password(password),
                "created_by": f"invite:{code}",
            },
        )
        return self.create_session_for_user(uid)

    # -- API keys (keys.go:66-236) -------------------------------------

    def create_api_key(
        self, name: str, permissions: list[str], actor: Actor
    ) -> tuple[str, str]:
        """Returns (id, token); only (hash, salt) persists."""
        for p in permissions:
            if p not in ALL_PERMISSIONS:
                raise AuthError(f"unknown permission: {p}")
        kid = _new_id()
        token = f"{API_KEY_PREFIX}{kid}.{secrets.token_hex(16)}"
        salt = secrets.token_hex(16)
        self.store.record(
            "create_api_key",
            {
                "id": kid,
                "hash": _token_hash(token, salt),
                "salt": salt,
                "name": name.strip(),
                "permissions": permissions,
                "created_by": str(actor),
            },
        )
        return kid, token

    def list_api_keys(self) -> list[dict[str, Any]]:
        rows = self.store.query(
            "SELECT id, name, permissions, created_at, created_by"
            " FROM api_keys ORDER BY created_at DESC"
        )
        for r in rows:
            r["permissions"] = json.loads(r.pop("permissions") or "[]")
        return rows

    def delete_api_key(self, key_id: str, actor: Actor) -> None:
        if not self.store.query(
            "SELECT 1 FROM api_keys WHERE id = ?", (key_id,)
        ):
            raise AuthError("api key not found")
        self.store.record(
            "delete_api_key", {"id": key_id, "deleted_by": str(actor)}
        )

    # -- JWTs (dashboard embedding; web/handler/auth.go:163-230) --------

    def jwt_secret(self) -> bytes:
        """Shared HS256 signing secret, created on first use and stored
        in the metastore's config KV (reference LoadJWTSecret/
        ResetJWTSecret over the NATS config bucket, auth.go:401-430)."""
        val = self.store.config_get(CONFIG_KEY_JWT_SECRET)
        if val is None:
            # create-once: insert-if-absent then read back, so two
            # instances racing on first use converge on one secret (a
            # last-write-wins put left the loser minting tokens the
            # winner's verifier rejects)
            val = self.store.config_setdefault(
                CONFIG_KEY_JWT_SECRET, secrets.token_hex(32)
            )
        return val.encode()

    def reset_jwt_secret(self) -> None:
        """Rotate the shared signing secret (reference ResetJWTSecret,
        auth.go:341-356 → core auth.go:401-430): every outstanding JWT
        — embed tokens included — stops verifying immediately."""
        self.store.config_put(CONFIG_KEY_JWT_SECRET, secrets.token_hex(32))

    def mint_jwt(self, claims: dict[str, Any], exp_s: float | None = None) -> str:
        import base64
        import time

        payload = dict(claims)
        payload["exp"] = int(time.time() + (exp_s or JWT_EXP_S))

        def b64(b: bytes) -> bytes:
            return base64.urlsafe_b64encode(b).rstrip(b"=")

        head = b64(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
        body = b64(json.dumps(payload, separators=(",", ":")).encode())
        signing = head + b"." + body
        sig = b64(
            hmac.new(self.jwt_secret(), signing, hashlib.sha256).digest()
        )
        return (signing + b"." + sig).decode()

    def verify_jwt(self, token: str) -> dict[str, Any] | None:
        """Claims dict if signature and expiry check out, else None."""
        import base64
        import time

        parts = token.split(".")
        if len(parts) != 3:
            return None

        def unb64(s: str) -> bytes:
            return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

        signing = (parts[0] + "." + parts[1]).encode()
        expect = base64.urlsafe_b64encode(
            hmac.new(self.jwt_secret(), signing, hashlib.sha256).digest()
        ).rstrip(b"=")
        if not hmac.compare_digest(expect.decode(), parts[2]):
            return None
        try:
            head = json.loads(unb64(parts[0]))
            claims = json.loads(unb64(parts[1]))
        except Exception:
            return None
        if head.get("alg") != "HS256":
            return None  # reference rejects non-HMAC methods
        exp = claims.get("exp")
        if exp is not None and time.time() > float(exp):
            return None
        return claims

    def generate_dashboard_jwt(
        self,
        info: AuthInfo,
        dashboard_id: str = "",
        variables: dict[str, Any] | None = None,
        exp_s: float | None = None,
    ) -> str:
        """web/handler/auth.go:163-230 TokenAuth: a JWT carrying the
        caller's identity, an optional dashboard scope, and render
        variables (string or list-of-string values only)."""
        variables = variables or {}
        for k, v in variables.items():
            if isinstance(v, str):
                continue
            if isinstance(v, list) and all(isinstance(x, str) for x in v):
                continue
            raise AuthError(f"unsupported type for key {k}")
        if info.api_key_id and not self.has_permission(
            info, PERMISSION_GENERATE_JWT
        ):
            raise AuthError(
                "Missing required permission: " + PERMISSION_GENERATE_JWT
            )
        claims: dict[str, Any] = {}
        if info.is_user:
            claims["userId"] = info.user_id
            claims["sessionId"] = info.session_id
        elif info.api_key_id:
            claims["apiKeyId"] = info.api_key_id
            claims["apiKeyName"] = info.api_key_name
            if not dashboard_id:
                raise AuthError("Missing dashboardId")
        if dashboard_id:
            claims["dashboardId"] = dashboard_id
        if variables:
            claims["variables"] = variables
        return self.mint_jwt(claims, exp_s)

    # -- public dashboard sharing (web/handler/auth.go:233-300) ---------

    def set_dashboard_password(
        self, dashboard_id: str, password: str, actor: Actor
    ) -> None:
        """Set (or clear, with an empty password) the share password
        for a password-protected dashboard (edit_dashboard.go:350)."""
        app = self.store.get_app(dashboard_id)
        if app is None or app["type"] != "dashboard":
            raise AuthError("dashboard not found")
        self.store.record(
            "update_dashboard_password",
            {
                "id": dashboard_id,
                "password_hash": _hash_password(password)
                if password
                else None,
                "updated_by": str(actor),
            },
        )

    def verify_dashboard_password(
        self, dashboard_id: str, password: str
    ) -> bool:
        app = self.store.get_app(dashboard_id)
        if app is None or not app.get("password_hash"):
            return False
        return _check_password(password, app["password_hash"])

    def public_dashboard_jwt(
        self, dashboard_id: str, password: str = ""
    ) -> str:
        """PublicAuth: a dashboard whose visibility is ``public`` (or
        ``password-protected`` with the right password) yields a
        dashboard-scoped embed JWT; private/unset visibility is
        indistinguishable from a missing dashboard (the reference's
        404-for-private rule)."""
        app = self.store.get_app(dashboard_id)
        visibility = (app or {}).get("visibility")
        if (
            app is None
            or app["type"] != "dashboard"
            or visibility not in ("public", "password-protected")
        ):
            raise AuthError("not found")
        if visibility == "password-protected":
            if not password:
                raise AuthError("Password required")
            if not self.verify_dashboard_password(dashboard_id, password):
                raise AuthError("Invalid password")
        return self.mint_jwt(
            {"dashboardId": dashboard_id, "public": visibility}
        )

    def update_api_key_permissions(
        self, key_id: str, permissions: list[str], actor: Actor
    ) -> None:
        for p in permissions:
            if p not in ALL_PERMISSIONS:
                raise AuthError(f"unknown permission: {p}")
        if not self.store.query(
            "SELECT 1 FROM api_keys WHERE id = ?", (key_id,)
        ):
            raise AuthError("api key not found")
        self.store.record(
            "update_api_key_permissions",
            {"id": key_id, "permissions": permissions, "updated_by": str(actor)},
        )
