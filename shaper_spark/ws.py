"""Minimal RFC 6455 WebSocket support for server-push endpoints.

The reference pushes task results to the UI over a WebSocket
(``server/web/handler/task.go``, ``gobwas/ws`` in ``go.mod:10``). This
module implements just the server side of that contract with the
stdlib: the upgrade handshake, unmasked server→client text frames, and
client close-frame detection — enough for one-directional result push
plus clean shutdown. Long-polling on the runs endpoint remains the
transport for clients that don't upgrade.
"""

from __future__ import annotations

import base64
import hashlib
import struct

__all__ = [
    "is_upgrade_request",
    "accept_key",
    "encode_text_frame",
    "decode_frame_header",
    "CLOSE_OPCODE",
]

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
CLOSE_OPCODE = 0x8


def is_upgrade_request(headers) -> bool:
    upgrade = (headers.get("Upgrade") or "").lower()
    connection = (headers.get("Connection") or "").lower()
    return upgrade == "websocket" and "upgrade" in connection


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key."""
    digest = hashlib.sha1((client_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_text_frame(payload: str) -> bytes:
    """One final unmasked text frame (server→client frames are never
    masked, RFC 6455 §5.1)."""
    data = payload.encode()
    n = len(data)
    head = b"\x81"  # FIN + text opcode
    if n < 126:
        head += struct.pack("!B", n)
    elif n < 1 << 16:
        head += struct.pack("!BH", 126, n)
    else:
        head += struct.pack("!BQ", 127, n)
    return head + data


def decode_frame_header(two_bytes: bytes) -> tuple[int, bool, int]:
    """(opcode, masked, payload_len_field) from a frame's first two
    bytes — enough to recognize a client close frame."""
    if len(two_bytes) < 2:
        return -1, False, 0
    opcode = two_bytes[0] & 0x0F
    masked = bool(two_bytes[1] & 0x80)
    length = two_bytes[1] & 0x7F
    return opcode, masked, length
