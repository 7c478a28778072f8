"""Folder hierarchy for dashboards/tasks — the reference's
server/core/folder.go re-expressed over the event-sourced Metastore.

Folders form a tree (``parent_folder_id``); apps carry ``folder_id``.
Paths are slash-joined names resolved by walking from the root
(folder.go:30-115). Validation (duplicate names per parent, cycle
detection on move, name cannot contain slashes) happens here before
the event is recorded; the handlers in metastore.py apply the
materialized change idempotently, with the reference's FK
ON DELETE CASCADE replayed as an explicit recursive-subtree delete.
"""

from __future__ import annotations

import secrets
from typing import Any

from .auth import Actor, AuthError
from .metastore import Metastore

__all__ = ["FolderService"]


class FolderService:
    def __init__(self, store: Metastore):
        self.store = store

    # -- path resolution (folder.go:30-115) -----------------------------

    def resolve_path(self, path: str) -> str | None:
        """Path → folder id; None for root. Raises on a missing
        component (folder.go:68-72)."""
        components = [c for c in (path or "").split("/") if c]
        current: str | None = None
        for name in components:
            rows = self.store.query(
                "SELECT id FROM folders WHERE parent_folder_id IS ?"
                " AND name = ?",
                (current, name),
            )
            if not rows:
                raise AuthError(f"folder not found in path '{path}'")
            current = rows[0]["id"]
        return current

    def id_to_path(self, folder_id: str | None) -> str:
        """Folder id → '/'-rooted path (folder.go:81-115)."""
        if folder_id is None:
            return "/"
        parts: list[str] = []
        current: str | None = folder_id
        while current is not None:
            rows = self.store.query(
                "SELECT name, parent_folder_id FROM folders WHERE id = ?",
                (current,),
            )
            if not rows:
                raise AuthError("failed to get folder info")
            parts.insert(0, rows[0]["name"])
            current = rows[0]["parent_folder_id"]
        return "/" + "/".join(parts) + "/"

    # -- mutations (folder.go:116-382) ----------------------------------

    def create_folder(
        self, name: str, path: str, actor: Actor
    ) -> dict[str, Any]:
        if "/" in name:
            raise AuthError("folder name cannot contain slashes")
        parent = self.resolve_path(path)
        if self.store.query(
            "SELECT 1 FROM folders WHERE parent_folder_id IS ? AND name = ?",
            (parent, name),
        ):
            raise AuthError(
                f"a folder with the name '{name}' already exists"
            )
        fid = secrets.token_hex(12)
        self.store.record(
            "create_folder",
            {
                "id": fid,
                "parent_folder_id": parent,
                "name": name,
                "created_by": str(actor),
            },
        )
        return {"id": fid, "parentFolderId": parent, "name": name}

    def delete_folder(self, folder_id: str, actor: Actor) -> None:
        if not self.store.query(
            "SELECT 1 FROM folders WHERE id = ?", (folder_id,)
        ):
            raise AuthError("folder not found")
        self.store.record(
            "delete_folder", {"id": folder_id, "deleted_by": str(actor)}
        )

    def rename_folder(self, folder_id: str, name: str, actor: Actor) -> None:
        if "/" in name:
            raise AuthError("folder name cannot contain slashes")
        rows = self.store.query(
            "SELECT parent_folder_id FROM folders WHERE id = ?",
            (folder_id,),
        )
        if not rows:
            raise AuthError("folder not found")
        if self.store.query(
            "SELECT 1 FROM folders WHERE parent_folder_id IS ? AND name = ?"
            " AND id != ?",
            (rows[0]["parent_folder_id"], name, folder_id),
        ):
            raise AuthError(
                f"a folder with the name '{name}' already exists"
            )
        self.store.record(
            "rename_folder",
            {"id": folder_id, "name": name, "updated_by": str(actor)},
        )

    def move_items(
        self,
        apps: list[str],
        folders: list[str],
        path: str,
        actor: Actor,
    ) -> None:
        """folder.go:210-316 incl. subtree-cycle and duplicate-name
        checks."""
        if not apps and not folders:
            raise AuthError("no items to move")
        to_id = self.resolve_path(path)
        for app_id in apps:
            if app_id and not self.store.query(
                "SELECT 1 FROM apps WHERE id = ?", (app_id,)
            ):
                raise AuthError(f"app {app_id} not found")
        for folder_id in filter(None, folders):
            if not self.store.query(
                "SELECT 1 FROM folders WHERE id = ?", (folder_id,)
            ):
                raise AuthError(f"folder {folder_id} not found")
            if to_id is not None:
                ancestors = self.store.query(
                    """WITH RECURSIVE anc(id) AS (
                         SELECT parent_folder_id FROM folders WHERE id = ?
                         UNION ALL
                         SELECT f.parent_folder_id FROM folders f
                           JOIN anc a ON f.id = a.id
                         WHERE f.parent_folder_id IS NOT NULL
                       ) SELECT id FROM anc""",
                    (to_id,),
                )
                if to_id == folder_id or any(
                    r["id"] == folder_id for r in ancestors
                ):
                    raise AuthError(
                        "cannot move folder into its own subtree"
                    )
            name = self.store.query(
                "SELECT name FROM folders WHERE id = ?", (folder_id,)
            )[0]["name"]
            if self.store.query(
                "SELECT 1 FROM folders WHERE parent_folder_id IS ?"
                " AND name = ? AND id != ?",
                (to_id, name, folder_id),
            ):
                raise AuthError(
                    f"a folder with the name '{name}' already exists"
                )
        self.store.record(
            "move_items",
            {
                "apps": apps,
                "folders": folders,
                "to_folder_id": to_id,
                "moved_by": str(actor),
            },
        )

    # -- listing --------------------------------------------------------

    def list_folder(self, path: str) -> dict[str, Any]:
        """Contents of one folder level: subfolders + apps
        (list_apps.go's folder filter)."""
        fid = self.resolve_path(path)
        folders = self.store.query(
            "SELECT id, name, created_at, updated_at FROM folders"
            " WHERE parent_folder_id IS ? ORDER BY name",
            (fid,),
        )
        apps = self.store.query(
            "SELECT id, name, type, updated_at FROM apps"
            " WHERE folder_id IS ? ORDER BY name",
            (fid,),
        )
        return {"path": self.id_to_path(fid), "folders": folders, "apps": apps}
