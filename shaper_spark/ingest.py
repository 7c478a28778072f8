"""JSON ingestion with schema inference, evolution, and micro-batched
appends — the Spark rebuild of the reference's NATS/DuckDB ingest path
(reference: server/ingest/ingest.go).

Semantics preserved:
  * type inference per column from sampled values: BOOLEAN / DOUBLE (any
    number) / TIMESTAMP / DATE (string-format sniffing) / VARCHAR / JSON
    (mixed or nested) — ingest.go:346-497. Spark's own JSON inference is
    NOT used (it infers long vs double and no date sniffing).
  * mandatory ``_id`` VARCHAR (supplied or generated) and ``_ts``
    TIMESTAMP (payload value, else arrival time) first — ingest.go:46-47.
  * auto CREATE TABLE preserving JSON key order; auto ALTER TABLE ADD
    COLUMN for new fields; NO type widening — ingest.go:9,531-618.
  * batching: ≤3000 messages or 2s timeout — ingest.go:41-44.

Scale: each flush is one ``spark.createDataFrame`` (Arrow) + one
columnar append to a catalog parquet table — no per-row inserts. On a
cluster the same ``IngestBuffer.flush`` body runs inside
``foreachBatch`` of a Structured Streaming query (see streaming/).
"""

from __future__ import annotations

import datetime as dt
import json
import re
import secrets
import threading
import time
from typing import Any

from pyspark.sql import SparkSession, functions as F, types as T

__all__ = [
    "determine_column_type",
    "detect_schema_from_batch",
    "IngestBuffer",
    "WalIngestQueue",
    "validate_table_name",
    "BATCH_SIZE",
    "BATCH_TIMEOUT_S",
]

BATCH_SIZE = 3000
BATCH_TIMEOUT_S = 2.0
ID_COLUMN = "_id"
TS_COLUMN = "_ts"

_TABLE_PART_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]{0,127}$")

# String formats sniffed for TIMESTAMP/DATE (ingest.go:57-68). Formats
# containing a time component classify as TIMESTAMP, the rest as DATE.
_TS_FORMATS = [
    ("%Y-%m-%dT%H:%M:%S%z", True),
    ("%Y-%m-%dT%H:%M:%S.%f%z", True),
    ("%Y-%m-%d %H:%M:%S", True),
    ("%Y-%m-%dT%H:%M:%S", True),
    ("%Y-%m-%dT%H:%M:%S.%f", True),
    ("%Y-%m-%d %H:%M:%S.%f%z", True),
    ("%Y-%m-%d %H:%M:%S.%f", True),
    ("%Y-%m-%d", False),
    ("%m/%d/%Y", False),
    ("%d/%m/%Y", False),
    ("%d.%m.%Y", False),
]


_FRACTION_RE = re.compile(r"(\.\d{1,9})")


def _parse_string_temporal(value: str) -> tuple[dt.datetime | None, bool]:
    """(parsed, has_time_component) — first matching format wins.

    RFC3339Nano allows up to 9 fractional digits (reference
    ingest.go:57-68 uses Go's RFC3339Nano); Python's %f takes at most 6,
    so fractions are truncated to micros before matching."""
    normalized = _FRACTION_RE.sub(lambda m: m.group(1)[:7], value)
    for fmt, has_time in _TS_FORMATS:
        try:
            return dt.datetime.strptime(normalized, fmt), has_time
        except ValueError:
            continue
    return None, False


def is_timestamp_string(value: str) -> bool:
    parsed, has_time = _parse_string_temporal(value)
    return parsed is not None and has_time


def is_date_string(value: str) -> bool:
    parsed, has_time = _parse_string_temporal(value)
    return parsed is not None and not has_time


def determine_column_type(samples: list[Any]) -> str:
    """BOOLEAN | DOUBLE | TIMESTAMP | DATE | VARCHAR | JSON
    (port of ingest.go:434-497; bool is checked before number because
    Python bool is an int subtype)."""
    if not samples:
        return "JSON"
    has_ts = has_date = has_string = has_number = has_bool = has_complex = False
    for s in samples:
        if s is None:
            continue
        if isinstance(s, bool):
            has_bool = True
        elif isinstance(s, (int, float)):
            has_number = True
        elif isinstance(s, str):
            has_string = True
            if is_timestamp_string(s):
                has_ts = True
            elif is_date_string(s):
                has_date = True
        elif isinstance(s, (dict, list)):
            has_complex = True
    if has_bool and not (has_string or has_number or has_complex):
        return "BOOLEAN"
    if has_number and not (has_string or has_bool or has_complex):
        return "DOUBLE"
    if has_string and not (has_number or has_bool or has_complex):
        if has_ts and not has_date:
            return "TIMESTAMP"
        if has_date and not has_ts:
            return "DATE"
        return "VARCHAR"
    return "JSON"


def detect_schema_from_batch(
    messages: list[dict[str, Any]],
) -> tuple[dict[str, str], list[str]]:
    """(column → SQL type, ordered column names); ``_id``/``_ts`` first,
    then fields in first-appearance order (key order preserved — Python
    dicts are ordered, matching the reference's OrderedJSON)."""
    if not messages:
        raise ValueError("cannot detect schema from empty batch")
    samples: dict[str, list[Any]] = {ID_COLUMN: [], TS_COLUMN: []}
    ordered = [ID_COLUMN, TS_COLUMN]
    seen = {ID_COLUMN, TS_COLUMN}
    for msg in messages:
        samples[ID_COLUMN].append(msg.get(ID_COLUMN, "placeholder_for_cuid"))
        samples[TS_COLUMN].append(msg.get(TS_COLUMN, dt.datetime.now()))
        for field, value in msg.items():
            if field in (ID_COLUMN, TS_COLUMN):
                continue
            if field not in seen:
                seen.add(field)
                ordered.append(field)
                samples[field] = []
            samples[field].append(value)
    types = {ID_COLUMN: "VARCHAR", TS_COLUMN: "TIMESTAMP"}
    for field, vals in samples.items():
        if field in (ID_COLUMN, TS_COLUMN):
            continue
        types[field] = determine_column_type(vals)
    return types, ordered


def validate_table_name(name: str) -> bool:
    """≤3 dot-separated parts, each [a-zA-Z][a-zA-Z0-9_]{0,127}
    (reference server/core/events.go:20-31)."""
    parts = name.split(".")
    if not 1 <= len(parts) <= 3:
        return False
    return all(_TABLE_PART_RE.match(p) for p in parts)


_SQL_TO_SPARK = {
    "BOOLEAN": T.BooleanType(),
    "DOUBLE": T.DoubleType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "VARCHAR": T.StringType(),
    # No JSON type in Spark — stored as a JSON string column. The
    # dashboard layer re-detects object-ness by sniffing (normalize.py).
    "JSON": T.StringType(),
}


def _gen_id() -> str:
    """cuid2-shaped unique id (lowercase letter + 23 base36 chars)."""
    alphabet = "0123456789abcdefghijklmnopqrstuvwxyz"
    return "c" + "".join(secrets.choice(alphabet) for _ in range(23))


def _coerce(value: Any, sql_type: str, arrival: dt.datetime) -> Any:
    if value is None:
        return None
    if sql_type == "BOOLEAN":
        return bool(value) if isinstance(value, bool) else None
    if sql_type == "DOUBLE":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        return float(value)
    if sql_type in ("TIMESTAMP", "DATE"):
        parsed: dt.datetime | None = None
        if isinstance(value, dt.datetime):
            parsed = value
        elif isinstance(value, (int, float)) and not isinstance(value, bool):
            # Unix seconds, or milliseconds when too large (ingest.go:835-839)
            parsed = (
                dt.datetime.fromtimestamp(value / 1000.0, dt.timezone.utc)
                if value > 1e11
                else dt.datetime.fromtimestamp(float(value), dt.timezone.utc)
            )
        elif isinstance(value, str):
            parsed, _ = _parse_string_temporal(value)
        if parsed is None:
            return None
        if parsed.tzinfo is not None:
            parsed = parsed.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return parsed.date() if sql_type == "DATE" else parsed
    if sql_type == "VARCHAR":
        return value if isinstance(value, str) else json.dumps(value)
    # JSON: store the serialized value
    return value if isinstance(value, str) else json.dumps(value)


class WalIngestQueue:
    """File-backed write-ahead ingest queue — the durability seam the
    reference gets from its NATS JetStream work-queue stream
    (server/core/app.go:425-489): a publish is persisted BEFORE it is
    buffered, and acknowledged only AFTER the batch append lands in
    the warehouse (ack-after-append, the reference's consumer acks in
    server/ingest/ingest.go:86-128) — so a node dying between publish
    and flush REDELIVERS on restart instead of losing the batch.

    At-least-once, like JetStream: a crash after the warehouse append
    but before the ack replays that batch once on restart (same
    redelivery window the reference consumer has).  Arrival times ride
    the log so replayed rows keep their original ``_ts``.

    Multi-writer safe: every queue owns a PRIVATE segment file
    (``seg-<token>.jsonl`` + ``.ack`` watermark + held ``flock`` on a
    ``.lock`` file), so any number of server instances can point at
    the same WAL directory without interleaving appends, colliding
    seqs, or truncating each other's entries.  On startup a queue
    scans the directory and ADOPTS any segment whose lock it can take
    (the owner is dead): the orphan's unacked entries are re-appended
    to the new queue's own segment and the orphan's files removed —
    the JetStream redelivery-to-any-consumer behavior.  A crash
    mid-adoption only duplicates (at-least-once), never loses.

    Acking is interval-based: :meth:`ack_range` marks a seq range
    applied and the persisted watermark only advances over the
    CONTIGUOUS applied prefix — a later batch that finishes first can
    never push the watermark past an earlier batch that failed, so the
    failed batch stays in the segment for redelivery.  The segment
    truncates whenever everything in it is acked, so its size is
    bounded by the in-flight window, not by history.  The seam is
    duck-typed (append / ack / pending): a deployment can swap in a
    real broker client without touching ``IngestBuffer``.
    """

    def __init__(self, dir_path: str, fsync: bool = True):
        import os

        os.makedirs(dir_path, exist_ok=True)
        self._dir = dir_path
        self._fsync = fsync
        self._lock = threading.Lock()
        token = secrets.token_hex(8)
        self._seg = os.path.join(dir_path, f"seg-{token}.jsonl")
        self._ackf = os.path.join(dir_path, f"seg-{token}.ack")
        self._lockf = os.path.join(dir_path, f"seg-{token}.jsonl.lock")
        self._lock_fd = self._acquire_lock(self._lockf)
        open(self._seg, "a").close()
        self._acked = 0
        self._seq = 0
        # applied-but-not-yet-contiguous seq intervals (sorted, merged)
        self._applied: list[list[int]] = []
        self._adopt_orphans()

    # -- segment ownership -------------------------------------------------

    @staticmethod
    def _acquire_lock(path: str) -> int | None:
        """Exclusive non-blocking flock; None when unavailable (either
        the lock is held by a live owner, or the platform lacks
        fcntl — then single-writer use is assumed, the pre-lock
        behavior)."""
        import os

        try:
            import fcntl
        except ImportError:  # non-POSIX: degrade to single-writer
            return None
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            raise _SegmentBusy(path)
        return fd

    def _adopt_orphans(self) -> None:
        """Re-queue every dead writer's unacked entries into OUR
        segment (then remove the orphan's files).  Segments whose lock
        is held by a live process are skipped — their owner is still
        responsible for them.  Covers the legacy single-segment name
        (``ingest-wal.jsonl``) from before per-writer segments."""
        import os

        try:
            names = sorted(os.listdir(self._dir))
        except OSError:
            return
        for name in names:
            if not name.endswith(".jsonl"):
                continue
            seg = os.path.join(self._dir, name)
            if seg == self._seg:
                continue
            lockf = seg + ".lock"
            try:
                fd = self._acquire_lock(lockf)
            except _SegmentBusy:
                continue  # live owner
            try:
                ackf = seg[: -len(".jsonl")] + ".ack"
                # legacy layout used ingest-wal.jsonl / ingest-wal.ack
                acked = 0
                try:
                    with open(ackf) as f:
                        acked = int(f.read().strip() or 0)
                except (OSError, ValueError):
                    acked = 0
                entries = _read_segment(seg, min_seq_exclusive=acked)
                if entries:
                    self.append_many(
                        [(t, p, a) for _seq, t, p, a in entries]
                    )
                for path in (seg, ackf, lockf):
                    try:
                        os.remove(path)
                    except OSError:
                        pass
            finally:
                if fd is not None:
                    os.close(fd)

    def close(self) -> None:
        """Release segment ownership (node shutdown). Unacked entries
        stay on disk for the next queue on this directory to adopt."""
        import os

        if getattr(self, "_lock_fd", None) is not None:
            try:
                os.close(self._lock_fd)
            except OSError:
                pass
            self._lock_fd = None

    def __del__(self):  # release the flock when the owner is collected
        try:
            self.close()
        except Exception:
            pass

    # -- log operations ----------------------------------------------------

    def append(self, table: str, payload: dict[str, Any], arrival: dt.datetime) -> int:
        return self.append_many([(table, payload, arrival)])[0]

    def append_many(
        self, entries: list[tuple[str, dict[str, Any], dt.datetime]]
    ) -> list[int]:
        """Persist a batch of publishes with ONE write + fsync — the
        bulk-ingest endpoint posts arrays, and one fsync per message
        would put a disk round-trip inside every row of a 3000-row
        batch (the broker analogue is a single publish batch ack)."""
        import os

        seqs: list[int] = []
        with self._lock:
            lines: list[str] = []
            for table, payload, arrival in entries:
                self._seq += 1
                seqs.append(self._seq)
                lines.append(
                    json.dumps(
                        {
                            "seq": self._seq,
                            "table": table,
                            "payload": payload,
                            "arrival": arrival.isoformat(),
                        },
                        default=str,
                    )
                )
            with open(self._seg, "a") as f:
                f.write("\n".join(lines) + "\n")
                f.flush()
                if self._fsync:
                    os.fsync(f.fileno())
        return seqs

    def ack(self, seq: int) -> None:
        """Mark everything up to ``seq`` applied (single-flusher
        convenience; concurrent flushers must use :meth:`ack_range` so
        a fast later batch cannot ack past a failed earlier one)."""
        with self._lock:
            if seq <= self._acked:
                return
            self._applied.insert(0, [self._acked + 1, seq])
            self._advance_watermark()

    def ack_range(self, lo: int, hi: int) -> None:
        """Mark the seq interval [lo, hi] applied.  The persisted
        watermark advances only over the contiguous applied prefix, so
        out-of-order completions never release unapplied entries."""
        if hi < lo:
            return
        with self._lock:
            if hi <= self._acked:
                return
            self._applied.append([max(lo, self._acked + 1), hi])
            self._applied.sort()
            merged: list[list[int]] = []
            for itv in self._applied:
                if merged and itv[0] <= merged[-1][1] + 1:
                    merged[-1][1] = max(merged[-1][1], itv[1])
                else:
                    merged.append(itv)
            self._applied = merged
            self._advance_watermark()

    def _advance_watermark(self) -> None:
        """Persist the highest contiguously-applied seq; truncate the
        segment when everything in it is acked.  Caller holds _lock."""
        import os

        if not (self._applied and self._applied[0][0] == self._acked + 1):
            return
        self._acked = self._applied.pop(0)[1]
        tmp = self._ackf + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(self._acked))
            f.flush()
            if self._fsync:
                os.fsync(f.fileno())
        os.replace(tmp, self._ackf)
        if self._acked >= self._seq:
            # everything applied: truncate the segment (seq keeps
            # counting from self._seq, so ids stay monotonic)
            open(self._seg, "w").close()

    def pending(self) -> list[tuple[int, str, dict[str, Any], dt.datetime]]:
        """Unacked entries in seq order — the redelivery set."""
        with self._lock:
            out = _read_segment(self._seg, min_seq_exclusive=self._acked)
        out.sort(key=lambda t: t[0])
        return out


class _SegmentBusy(OSError):
    """Another live process owns this WAL segment."""


def _read_segment(
    path: str, min_seq_exclusive: int = 0
) -> list[tuple[int, str, dict[str, Any], dt.datetime]]:
    """Parse a JSONL segment, tolerating a TORN final record: a crash
    mid-append can leave a partial last line, and refusing to restart
    on it would defeat the WAL's purpose.  A corrupt record is treated
    as end-of-log — everything intact before it is kept."""
    out: list[tuple[int, str, dict[str, Any], dt.datetime]] = []
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            e = json.loads(line)
            seq = int(e["seq"])
            table = e["table"]
            payload = e["payload"]
            raw_arrival = e["arrival"]
        except (ValueError, KeyError, TypeError):
            break  # torn tail: keep the intact prefix
        if seq <= min_seq_exclusive:
            continue
        try:
            arrival = dt.datetime.fromisoformat(raw_arrival)
        except (ValueError, TypeError):
            arrival = dt.datetime.utcnow()
        out.append((seq, table, payload, arrival))
    return out

class IngestBuffer:
    """Micro-batch ingestion front end.

    ``publish(table, payload)`` buffers; a flush happens at BATCH_SIZE
    messages or BATCH_TIMEOUT_S seconds (whichever first), grouped by
    table — mirroring the reference's JetStream consumer
    (ingest.go:155-268).

    ``wal_dir`` (or an explicit ``wal`` queue) makes the buffer
    durable: publishes persist to a :class:`WalIngestQueue` before
    buffering, acks land only after the warehouse append, and a new
    buffer on the same directory REPLAYS whatever a dead node left
    unacked (the kill-a-node guarantee the reference gets from
    JetStream).  Without it the buffer is in-memory-only, matching the
    previous behavior (tests, ephemeral sessions).
    """

    def __init__(
        self,
        spark: SparkSession,
        batch_size: int = BATCH_SIZE,
        batch_timeout_s: float = BATCH_TIMEOUT_S,
        wal: WalIngestQueue | None = None,
        wal_dir: str | None = None,
    ):
        self.spark = spark
        self.batch_size = batch_size
        self.batch_timeout_s = batch_timeout_s
        self._buffer: list[
            tuple[str, dict[str, Any], dt.datetime, int]
        ] = []
        self._lock = threading.Lock()
        # flushes are SERIALIZED: ThreadingHTTPServer can drive two
        # concurrent flushes, and without this a later batch could
        # finish (and ack) while an earlier one is still appending
        self._flush_lock = threading.Lock()
        self._last_flush = time.monotonic()
        self._schema_cache: dict[str, dict[str, str]] = {}
        self.wal = wal if wal is not None else (
            WalIngestQueue(wal_dir) if wal_dir else None
        )
        if self.wal is not None:
            # redeliver what a dead predecessor left unacked
            with self._lock:
                for seq, table, payload, arrival in self.wal.pending():
                    self._buffer.append((table, payload, arrival, seq))

    # -- publishing --------------------------------------------------------

    def publish(self, table: str, payload: dict[str, Any]) -> None:
        if not validate_table_name(table):
            raise ValueError(f"invalid table name: {table}")
        arrival = dt.datetime.utcnow()
        seq = self.wal.append(table, payload, arrival) if self.wal else 0
        with self._lock:
            self._buffer.append((table, payload, arrival, seq))
            should_flush = len(self._buffer) >= self.batch_size
        if should_flush:
            self.flush()

    def publish_many(self, table: str, payloads: list[dict[str, Any]]) -> None:
        """Bulk publish: one WAL write + fsync for the whole batch (the
        /api/data array form; per-message fsync would serialize a disk
        round-trip into every row)."""
        if not validate_table_name(table):
            raise ValueError(f"invalid table name: {table}")
        if not payloads:
            return
        arrival = dt.datetime.utcnow()
        if self.wal is not None:
            seqs = self.wal.append_many(
                [(table, p, arrival) for p in payloads]
            )
        else:
            seqs = [0] * len(payloads)
        with self._lock:
            self._buffer.extend(
                (table, p, arrival, s) for p, s in zip(payloads, seqs)
            )
            should_flush = len(self._buffer) >= self.batch_size
        if should_flush:
            self.flush()

    def maybe_flush(self) -> None:
        if (
            self._buffer
            and time.monotonic() - self._last_flush >= self.batch_timeout_s
        ):
            self.flush()

    # -- flushing ----------------------------------------------------------

    def flush(self) -> None:
        # pop + process + ack under ONE flush lock: without it a later
        # batch can complete and ack while an earlier batch is still
        # appending, advancing the WAL watermark past unapplied rows
        with self._flush_lock:
            with self._lock:
                batch = self._buffer
                self._buffer = []
                self._last_flush = time.monotonic()
            by_table: dict[str, list[tuple[dict[str, Any], dt.datetime]]] = {}
            min_seq = 0
            max_seq = 0
            for table, payload, arrival, seq in batch:
                by_table.setdefault(table, []).append((payload, arrival))
                max_seq = max(max_seq, seq)
                if seq and (min_seq == 0 or seq < min_seq):
                    min_seq = seq
            try:
                for table, msgs in by_table.items():
                    self._process_table_batch(table, msgs)
            except BaseException:
                # re-queue at the front so the batch retries in order;
                # the WAL entries stay unacked either way, so a crash
                # before the retry still redelivers on restart
                with self._lock:
                    self._buffer[:0] = batch
                raise
            if self.wal is not None and max_seq:
                # ack AFTER every append landed, as an INTERVAL: the
                # watermark only moves over the contiguous applied
                # prefix, never past another batch that failed
                self.wal.ack_range(min_seq, max_seq)

    def close(self) -> None:
        """Release WAL segment ownership (node shutdown); a queue on
        the same directory can then adopt any unacked entries."""
        if self.wal is not None:
            self.wal.close()

    def _table_schema(self, table: str) -> dict[str, str] | None:
        if table in self._schema_cache:
            return self._schema_cache[table]
        if not self.spark.catalog.tableExists(table):
            return None
        fields = self.spark.table(table).schema.fields
        out: dict[str, str] = {}
        for f in fields:
            s = f.dataType.simpleString()
            out[f.name] = {
                "boolean": "BOOLEAN",
                "double": "DOUBLE",
                "timestamp": "TIMESTAMP",
                "date": "DATE",
                "string": "VARCHAR",
            }.get(s, "VARCHAR")
        self._schema_cache[table] = out
        return out

    def ensure_table_schema(
        self, table: str, payloads: list[dict[str, Any]]
    ) -> dict[str, str]:
        """Create or evolve ``table`` for a batch of payloads and return
        the effective column → SQL-type mapping (insertion-ordered).
        Pure metadata work — safe to drive from a bounded sample while
        the data itself stays on executors (streaming path)."""
        detected_types, ordered = detect_schema_from_batch(payloads)

        existing = self._table_schema(table)
        if existing is None:
            cols_sql = ", ".join(
                f"`{c}` {_spark_ddl(detected_types[c])}" for c in ordered
            )
            self.spark.sql(f"CREATE TABLE IF NOT EXISTS {table} ({cols_sql}) USING PARQUET")
            existing = dict.fromkeys(ordered)
            for c in ordered:
                existing[c] = detected_types[c]
            self._schema_cache[table] = existing
        else:
            # Schema evolution: add new columns, never change types
            # (ingest.go:9,601-618).
            new_cols = [c for c in ordered if c not in existing]
            if new_cols:
                add_sql = ", ".join(
                    f"`{c}` {_spark_ddl(detected_types[c])}" for c in new_cols
                )
                self.spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({add_sql})")
                for c in new_cols:
                    existing[c] = detected_types[c]
        return existing

    def _process_table_batch(
        self, table: str, msgs: list[tuple[dict[str, Any], dt.datetime]]
    ) -> None:
        payloads = [m[0] for m in msgs]
        existing = self.ensure_table_schema(table, payloads)
        table_cols = list(existing.keys())
        rows = []
        for payload, arrival in msgs:
            row = []
            for c in table_cols:
                sql_type = existing[c]
                if c == ID_COLUMN:
                    v = payload.get(ID_COLUMN) or _gen_id()
                elif c == TS_COLUMN:
                    v = _coerce(payload.get(TS_COLUMN), "TIMESTAMP", arrival)
                    if v is None:
                        v = arrival
                else:
                    v = _coerce(payload.get(c), sql_type, arrival)
                row.append(v)
            rows.append(tuple(rows_val for rows_val in row))

        schema = T.StructType(
            [
                T.StructField(c, _SQL_TO_SPARK[existing[c]], True)
                for c in table_cols
            ]
        )
        df = self.spark.createDataFrame(rows, schema=schema)
        df.write.mode("append").insertInto(table)
        from .plancache import bump

        bump()  # appended rows: memoized plans pin old file listings


def _spark_ddl(sql_type: str) -> str:
    return {
        "BOOLEAN": "BOOLEAN",
        "DOUBLE": "DOUBLE",
        "TIMESTAMP": "TIMESTAMP",
        "DATE": "DATE",
        "VARCHAR": "STRING",
        "JSON": "STRING",
    }[sql_type]
