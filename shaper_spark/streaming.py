"""Structured Streaming ingestion: the continuous variant of the
micro-batch ingest path.

The reference consumes a NATS JetStream subject in 3000-message/2s
batches (server/ingest/ingest.go:41-44,155-268). The Spark-native shape
is a ``readStream`` file (or Kafka) source of JSON lines driven through
``foreachBatch`` on a 2s processing-time trigger — each micro-batch
funnels through the same schema-inference + evolution + append body as
``IngestBuffer`` so both paths stay semantically identical.

Streaming-only semantics note (SURVEY §2B): the reference has no
watermarks/stream windows — its "streaming" is at-least-once batched
append. ``dedupe_ids=True`` upgrades that to exactly-once per ``_id``
with ``dropDuplicates`` against the destination table, the Spark way.

Scale: the JSON payload column is parsed on executors; only the sampled
schema inference (first SCHEMA_SAMPLE rows of a micro-batch) touches
the driver. On a 1000-executor cluster the source would be Kafka with
the same foreachBatch body.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .ingest import IngestBuffer, validate_table_name

__all__ = [
    "start_json_ingest_stream",
    "ingest_microbatch",
    "session_aggregate_stream",
    "threshold_alert_stream",
    "dedup_stream",
    "rollup_stream",
    "start_corpus_dedup_stream",
    "bootstrap_signature_table",
    "start_corpus_sig_dedup_stream",
    "start_drift_monitor_stream",
    "start_rate_anomaly_stream",
    "attribution_join_stream",
    "start_late_data_monitor_stream",
    "watermark_audit_report",
]

SCHEMA_SAMPLE = 3000


def ingest_microbatch(
    spark: SparkSession,
    batch_df: DataFrame,
    table: str,
    dedupe_ids: bool = False,
) -> int:
    """Append one micro-batch of raw JSON strings (column ``value``) to
    ``table`` with the ingest path's inference/evolution rules. Returns
    appended row count.

    Scale shape: only a bounded SCHEMA_SAMPLE-row prefix is collected to
    the driver, and only to run the schema inference/evolution rules
    (pure metadata).  The full batch is parsed and coerced on executors
    by an Arrow-batched ``mapInPandas`` running the *same* Python rules
    (``_coerce``/``_gen_id``), so a backfill micro-batch of any size
    never materializes on the driver.  Fields that first appear after
    the sample prefix are dropped this batch and picked up by evolution
    on the next batch containing them — the documented trade-off for a
    driver-unbounded path."""
    from .ingest import _SQL_TO_SPARK, _coerce, _gen_id, ID_COLUMN, TS_COLUMN

    if not validate_table_name(table):
        raise ValueError(f"invalid table name: {table}")
    values = batch_df.select("value")
    sample = [r[0] for r in values.limit(SCHEMA_SAMPLE).collect()]
    payloads: list[dict[str, Any]] = []
    for line in sample:
        try:
            obj = json.loads(line)
        except (TypeError, ValueError):
            continue  # invalid JSON dropped, mirroring ingest_test.go:1005
        if isinstance(obj, dict):
            payloads.append(obj)
    if not payloads:
        return 0
    table_existed = spark.catalog.tableExists(table)
    buf = IngestBuffer(spark)
    types = dict(buf.ensure_table_schema(table, payloads))
    table_cols = list(types.keys())
    arrival = dt.datetime.utcnow()

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField(c, _SQL_TO_SPARK[types[c]], True) for c in table_cols]
    )

    def parse_partition(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            rows = []
            for line in pdf["value"]:
                try:
                    obj = json.loads(line)
                except (TypeError, ValueError):
                    continue
                if not isinstance(obj, dict):
                    continue
                row = {}
                for c in table_cols:
                    if c == ID_COLUMN:
                        row[c] = obj.get(ID_COLUMN) or _gen_id()
                    elif c == TS_COLUMN:
                        v = _coerce(obj.get(TS_COLUMN), "TIMESTAMP", arrival)
                        row[c] = arrival if v is None else v
                    else:
                        row[c] = _coerce(obj.get(c), types[c], arrival)
                rows.append(row)
            yield pd.DataFrame(rows, columns=table_cols)

    parsed = values.mapInPandas(parse_partition, schema=out_schema)
    if dedupe_ids and table_existed:
        parsed = parsed.join(
            spark.table(table).select(ID_COLUMN), on=ID_COLUMN, how="left_anti"
        ).select(*table_cols)
    parsed = parsed.persist()
    try:
        n = parsed.count()
        if n:
            parsed.write.mode("append").insertInto(table)
            # The write executes on the micro-batch's cloned session
            # (structured streaming isolates each batch), whose commit
            # only refreshes the clone's relation cache — invalidate the
            # caller session's so concurrent readers see the new rows.
            spark.catalog.refreshTable(table)
    finally:
        parsed.unpersist()
    return n


def start_json_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    table: str,
    checkpoint_dir: str,
    trigger_seconds: float = 2.0,
    dedupe_ids: bool = False,
    available_now: bool = False,
    on_batch: Callable[[int, int], None] | None = None,
):
    """Stream JSON-lines files from ``source_dir`` into ``table``.

    ``available_now=True`` drains what exists and stops (the testing /
    backfill trigger); otherwise a 2s processing-time trigger mirrors the
    reference's flush cadence. Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 100)
        .load(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = ingest_microbatch(spark, batch_df, table, dedupe_ids=dedupe_ids)
        if on_batch:
            on_batch(batch_id, n)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# ---------------------------------------------------------------------------
# Stream analytics beyond the reference (SURVEY §2B note: the reference
# has no watermarks/stream windows — these are the Spark-native
# capabilities a training-data pipeline would add on top).
# ---------------------------------------------------------------------------


def rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    grain: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Continuously-maintained time-bucket rollup — the streaming twin
    of ``operators/timerollup.py``'s batch cascade. Tumbling windows of
    ``grain`` per key; the watermark closes buckets once late data can
    no longer arrive, so append-mode sinks receive each bucket exactly
    once and state stays bounded to the watermark horizon.

    Emits the same MERGEABLE partials the batch cascade carries
    (n / total / vmin / vmax): a coarser grain (hour → day → month)
    re-aggregates these outputs without touching raw events — sum of
    sums, min of mins — which is what makes a 100 TB/day rollup
    pipeline single-scan end-to-end, batch or streaming.

    On a batch frame the same body computes the identical rollup with
    no watermark/state (windows close immediately)."""
    with_wm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    keys = [F.col(c) for c in (key_cols or [])]
    return (
        with_wm.groupBy(*keys, F.window(F.col(ts_col), grain).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col)).alias("total"),
            F.min(F.col(value_col)).alias("vmin"),
            F.max(F.col(value_col)).alias("vmax"),
        )
        .select(
            *(key_cols or []),
            F.col("__w.start").alias("bucket"),
            "n",
            "total",
            "vmin",
            "vmax",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication — the continuous form of the batch
    ``dedup.exact_duplicates`` operator: keep the first arrival of each
    key, drop replays. ``dropDuplicatesWithinWatermark`` bounds the
    dedup state to the watermark horizon, so state size is
    O(keys per watermark window), not O(all keys ever) — the property
    that keeps a 100 TB/day ingest stream's state store finite. (Plain
    ``dropDuplicates`` on a stream retains every key forever unless the
    event-time column is part of the key; the *WithinWatermark* variant
    is the operationally safe default.)

    On a batch DataFrame this degrades to plain ``dropDuplicates`` on
    the same keys — identical results, no state.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def session_aggregate_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessionization as a *streaming* aggregate: Spark's built-in
    ``session_window`` merges events closer than ``gap`` per user, the
    watermark bounds state for late data. Works identically on a batch
    DataFrame (the windows just close immediately).

    Returns (user, session_start, session_end, n_events, total_value).
    """
    with_wm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        with_wm.groupBy(
            F.col(user_col).alias("user"),
            F.session_window(F.col(ts_col), gap),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("total_value"),
        )
        .select(
            "user",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_ALERT_SCHEMA = "user_id long, total double, crossed_at timestamp"
_ALERT_STATE_SCHEMA = "total double"


def threshold_alert_stream(
    events: DataFrame,
    threshold: float,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    state_timeout_ms: int | None = None,
):
    """Custom stateful operator: emit one row the first time a user's
    *cumulative* value crosses ``threshold`` — semantics no built-in
    aggregate expresses (emit-once-on-crossing), so this is the
    ``applyInPandasWithState`` escape hatch done the intended way:
    Arrow-batched per-group state, no row-at-a-time Python in the
    shuffle path.

    ``state_timeout_ms`` turns on processing-time state expiry for
    long-running streams (idle users' state is GC'd). Leave it None for
    ``availableNow`` backfills: pending timeouts force the engine to keep
    scheduling no-data micro-batches, so a drain-and-stop run with
    timeouts never terminates.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["user_id", "total", "crossed_at"])
            return
        (total,) = state.get if state.exists else (0.0,)
        crossed = total >= threshold
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                total += float(row[value_col] or 0.0)
                if not crossed and total >= threshold:
                    crossed = True
                    out.append(
                        {
                            "user_id": user_id,
                            "total": total,
                            "crossed_at": row[ts_col],
                        }
                    )
        state.update((total,))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(out, columns=["user_id", "total", "crossed_at"])

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=_ALERT_SCHEMA,
        stateStructType=_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def start_corpus_dedup_stream(
    stream_df: DataFrame,
    corpus_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 50,
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
    rejects_table: str | None = None,
):
    """Continuous corpus building with dedup-on-arrival: every
    micro-batch of new documents is classified against the CURRENT
    corpus table with :func:`operators.dedup.incremental_dedup` (exact
    hash vs corpus, exact hash vs earlier-in-batch, k-gram Jaccard ≥
    ``threshold`` vs corpus), survivors are appended to
    ``corpus_table``, and (optionally) the dropped docs land in
    ``rejects_table`` with their reason — the audit trail a curation
    pipeline keeps.

    ``foreachBatch`` on purpose: the batch body IS the batch operator
    (one code path, the engine's streaming convention), each batch sees
    the corpus as-of its start (batch-internal dups handled by the
    exact_batch rule), and the append + plan-cache bump happen once per
    batch.  The per-batch cost profile matches ``incremental_dedup``'s
    broadcast-batch regime: a micro-batch is small by construction, so
    the corpus gram stream is probed map-side and never shuffles.

    Returns the StreamingQuery.  Exactly-once note: the appends are
    idempotent per batch only if the checkpoint survives — reuse
    ``checkpoint`` across restarts like every other sink here."""
    from .operators.dedup import incremental_dedup
    from .plancache import bump

    caller = stream_df.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        corpus = spark.table(corpus_table)
        # MATERIALIZE the verdict before mutating the corpus, and pin it
        # OFF the corpus lineage entirely: appending to corpus_table
        # invalidates every cached plan that scans it (CacheManager
        # refresh), so a persist() would silently recompute post-append
        # and classify against the corpus-plus-this-batch (an
        # exact_batch dup of a kept doc would re-resolve to
        # exact_corpus, and a kept doc would look like a dup of
        # itself).  The verdict is micro-batch-sized and 3 narrow
        # columns (id, keep, reason — never text) by construction, so a
        # driver-side pin is bounded.
        verdict_df = incremental_dedup(
            corpus,
            batch_df,
            id_col,
            text_col,
            k=k,
            threshold=threshold,
            max_df=max_df,
        )
        verdict = spark.createDataFrame(
            verdict_df.collect(), schema=verdict_df.schema
        )
        keep_ids = verdict.filter(F.col("keep")).select(
            F.col("id").alias(id_col)
        )
        kept = batch_df.join(keep_ids, id_col, "left_semi")
        # insertInto matches POSITIONALLY: project into the target
        # table's column order so a stream whose columns arrive in a
        # different order can't be silently misaligned.
        kept.select(*spark.table(corpus_table).columns).write.mode(
            "append"
        ).insertInto(corpus_table)
        # Rejects AFTER the corpus append: if the batch dies between
        # the two writes, the checkpoint retry reclassifies against the
        # corpus-including-kept-rows, so the corpus append is naturally
        # idempotent — whereas rejects-first would duplicate audit rows
        # on every such retry.  The pinned verdict can't be affected by
        # the append (local data, no corpus lineage).
        if rejects_table is not None:
            verdict.filter(~F.col("keep")).select(
                F.col("id").alias(id_col), "reason"
            ).select(
                *spark.table(rejects_table).columns
            ).write.mode("append").insertInto(rejects_table)
        # The appends commit on the micro-batch's CLONED session; the
        # caller session's relation cache still lists the old files —
        # refresh it (the ingest_microbatch rule) so its readers see
        # the new rows.
        for s in (spark, caller):
            for t in filter(None, (corpus_table, rejects_table)):
                try:
                    s.catalog.refreshTable(t)
                except Exception:
                    pass
        bump()  # corpus mutated: flush memoized analyzed plans

    writer = stream_df.writeStream.foreachBatch(body).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_signature_table(
    spark: SparkSession,
    corpus_table: str,
    sig_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    max_df: int | None = None,
) -> int:
    """One-time build of the (id, h, sig) signature store for an
    existing corpus (:func:`operators.dedup.signature_records`) — the
    last full-corpus text scan the ingest pipeline ever performs;
    afterwards :func:`start_corpus_sig_dedup_stream` maintains the
    store incrementally.  Returns the row count written."""
    from .operators.dedup import signature_records
    from .plancache import bump

    recs = signature_records(
        spark.table(corpus_table), id_col, text_col, k, num_hashes, max_df
    )
    recs.write.mode("overwrite").saveAsTable(sig_table)
    bump()
    return spark.table(sig_table).count()


def start_corpus_sig_dedup_stream(
    stream_df: DataFrame,
    corpus_table: str,
    sig_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
    rejects_table: str | None = None,
):
    """Steady-state continuous corpus building: like
    :func:`start_corpus_dedup_stream`, but the near-dup check runs
    against the incrementally-maintained SIGNATURE table instead of
    re-shingling the whole corpus every micro-batch — the missing
    piece of the 100 TB ingest story.  Per batch:

    1. classify the batch with
       :func:`operators.dedup.incremental_sig_dedup` (exact hash vs
       store ``h``; exact vs earlier-in-batch; MinHash-estimate ≥
       ``threshold`` over LSH band collisions vs store ``sig``),
    2. append survivors to ``corpus_table``,
    3. append the survivors' (id, h, sig) records to ``sig_table`` —
       signatures are computed from BATCH text only, so the store
       stays consistent without a corpus scan,
    4. optionally append dropped docs to ``rejects_table`` with their
       reason.

    Steady-state cost per batch: batch-sized shingling + joins against
    a store ~100× narrower than the corpus; corpus TEXT is never read
    after :func:`bootstrap_signature_table`.  The near rule is the
    signature ESTIMATE (see incremental_sig_dedup's docstring for the
    exactness trade).  Write ordering and the driver-side verdict pin
    follow start_corpus_dedup_stream (append-idempotent on checkpoint
    retry; rejects last)."""
    from .operators.dedup import incremental_sig_dedup, signature_records
    from .plancache import bump

    caller = stream_df.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store = spark.table(sig_table)
        verdict_df = incremental_sig_dedup(
            store,
            batch_df,
            id_col,
            text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            max_df=max_df,
        )
        # pin driver-side: appending to sig_table/corpus_table below
        # invalidates cached plans scanning them (see
        # start_corpus_dedup_stream) — the verdict must not recompute
        verdict = spark.createDataFrame(
            verdict_df.collect(), schema=verdict_df.schema
        )
        keep_ids = verdict.filter(F.col("keep")).select(
            F.col("id").alias(id_col)
        )
        kept = batch_df.join(keep_ids, id_col, "left_semi")
        kept.select(*spark.table(corpus_table).columns).write.mode(
            "append"
        ).insertInto(corpus_table)
        # maintain the store: batch-text-only work, no corpus lineage
        signature_records(
            kept, id_col, text_col, k, num_hashes, max_df
        ).select(*spark.table(sig_table).columns).write.mode(
            "append"
        ).insertInto(sig_table)
        if rejects_table is not None:
            verdict.filter(~F.col("keep")).select(
                F.col("id").alias(id_col), "reason"
            ).select(
                *spark.table(rejects_table).columns
            ).write.mode("append").insertInto(rejects_table)
        # Refresh the relation caches on BOTH sessions: the clone's so
        # the next micro-batch's store/corpus reads see this batch's
        # appends, the caller's so its readers do (ingest_microbatch
        # rule — the clone's commit only refreshes the clone).
        for s in (spark, caller):
            for t in filter(
                None, (corpus_table, sig_table, rejects_table)
            ):
                try:
                    s.catalog.refreshTable(t)
                except Exception:
                    pass
        bump()  # corpus + store mutated: flush memoized analyzed plans

    writer = stream_df.writeStream.foreachBatch(body).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_drift_monitor_stream(
    stream_df: DataFrame,
    reference_df: DataFrame,
    value_col: str,
    alerts_table: str,
    alpha: float = 0.5,
    psi_threshold: float = 0.25,
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
):
    """Continuous distribution-drift monitoring: every micro-batch's
    distribution of ``value_col`` is scored against a REFERENCE
    distribution with the same smoothed PSI as
    :func:`operators.text.psi_drift_matrix` (power-of-two buckets,
    add-α over the union of bins), and one audit row
    (batch_id, n_rows, psi, drifted) is appended to ``alerts_table``
    — the ingest-time alarm that a source changed shape (new crawler,
    encoding regression, spam wave) BEFORE the data lands in the
    corpus.

    Scale shape: the reference histogram is computed ONCE at stream
    start (one hash-agg over ≤64 buckets — bounded collect by
    construction) and closed over; each micro-batch pays one ≤64-row
    hash-agg, and the PSI itself is O(bins) driver arithmetic on two
    bounded histograms.  No per-row Python, no state store — the
    monitor is stateless across batches on purpose (each batch is
    scored independently against the fixed reference; a drifting
    reference would mask slow drift).

    Returns the StreamingQuery."""
    if psi_threshold <= 0:
        raise ValueError("start_drift_monitor_stream: psi_threshold must be > 0")

    def _hist(df: DataFrame) -> dict[int, int]:
        v = F.col(value_col)
        bucket = F.pow(F.lit(2.0), F.floor(F.log2(v))).cast("long")
        return {
            r["b"]: r["c"]
            for r in df.filter(v > 0)
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    ref = _hist(reference_df)
    if not ref:
        raise ValueError(
            "start_drift_monitor_stream: reference has no positive "
            f"{value_col!r} values"
        )
    caller = stream_df.sparkSession

    def _psi(batch: dict[int, int]) -> float:
        import math

        bins = sorted(set(ref) | set(batch))
        nb = len(bins)
        n_ref = sum(ref.values())
        n_new = sum(batch.values())
        total = 0.0
        for b in bins:
            pa = (ref.get(b, 0) + alpha) / (n_ref + alpha * nb)
            pb = (batch.get(b, 0) + alpha) / (n_new + alpha * nb)
            total += (pa - pb) * (math.log(pa) - math.log(pb))
        return total

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        hist = _hist(batch_df)
        n_rows = sum(hist.values())
        psi = _psi(hist) if hist else float("inf")
        row_df = spark.createDataFrame(
            [(int(batch_id), int(n_rows), float(psi), psi >= psi_threshold)],
            "batch_id BIGINT, n_rows BIGINT, psi DOUBLE, drifted BOOLEAN",
        )
        row_df.select(*spark.table(alerts_table).columns).write.mode(
            "append"
        ).insertInto(alerts_table)
        for s in (spark, caller):
            try:
                s.catalog.refreshTable(alerts_table)
            except Exception:
                pass

    writer = stream_df.writeStream.foreachBatch(body).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_rate_anomaly_stream(
    stream_df: DataFrame,
    ts_col: str,
    group_col: str,
    counts_table: str,
    alerts_table: str,
    grain: str = "hour",
    window: int = 24,
    min_periods: int = 8,
    z2_threshold: int = 9,
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
):
    """Continuous event-rate anomaly monitoring — the streaming
    sibling of :func:`operators.timeseries.rolling_anomaly_bands`.
    Every micro-batch (1) aggregates to (group, grain-bucket) counts
    and APPENDS them to ``counts_table`` (append-only partial counts:
    a bucket's true count is the SUM of its rows, so no upsert is
    needed on a parquet warehouse and a replayed batch only inflates
    history it already contributed to), then (2) re-scores the
    accumulated counts with the SAME cross-multiplied BIGINT z²
    predicate and appends one alert row per bucket THIS batch touched
    (batch_id, grp, bucket_ts, n_events, hist_n, is_anomaly) to
    ``alerts_table`` — the "error rates spiked while the stream was
    live" alarm.

    Scale shape: the per-batch work is one batch-sized hash-agg, one
    bounded append, and the scoring window over the counts table —
    |groups| × |buckets| rows, NOT raw events (a year of hourly
    buckets is 8 760 rows per group).  On a finite source processed
    in one ``availableNow`` batch the alert rows equal the batch
    operator's flags exactly (pytest-pinned), so the streaming entry
    hash-checks against the rolling_anomaly_bands oracle.

    Returns the StreamingQuery."""
    from .operators.timeseries import anomaly_flags_from_counts

    if window <= 1 or min_periods < 2:
        raise ValueError(
            "start_rate_anomaly_stream: window must be > 1, "
            "min_periods >= 2"
        )
    caller = stream_df.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ONE batch job pins the (grp, bucket) counts driver-side —
        # they are |groups|×|buckets touched| rows, the same bound the
        # scoring pass already relies on (a year of hourly buckets is
        # 8 760 rows per group).  This replaces the r13 shape's THREE
        # batch-scan jobs — the isEmpty() probe, the counts-write
        # aggregation, and the alerts job re-aggregating the batch for
        # ``touched`` — with one; the write and the semi-join probe
        # both serve from the local relation (r14, entry steady
        # 2.4 s → measured below).
        rows = (
            batch_df.groupBy(
                F.col(group_col).alias("grp"),
                F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .collect()
        )
        if not rows:
            return
        import pandas as pd

        batch_counts = spark.createDataFrame(
            pd.DataFrame(
                ((r[0], r[1], r[2]) for r in rows),
                columns=["grp", "bucket_ts", "n_events"],
            ),
            schema="grp string, bucket_ts timestamp, n_events long",
        )
        batch_counts.select(
            *spark.table(counts_table).columns
        ).write.mode("append").insertInto(counts_table)
        spark.catalog.refreshTable(counts_table)
        total = (
            spark.table(counts_table)
            .groupBy("grp", "bucket_ts")
            .agg(F.sum("n_events").cast("long").alias("n_events"))
        )
        flags = anomaly_flags_from_counts(
            total, window, min_periods, z2_threshold
        )
        # local relation — broadcast explicitly so the AQE-off serving
        # profile never shuffles the flags side for this probe
        touched = F.broadcast(batch_counts.select("grp", "bucket_ts"))
        alerts = (
            flags.join(touched, ["grp", "bucket_ts"], "left_semi")
            .select(
                F.lit(int(batch_id)).cast("long").alias("batch_id"),
                "grp",
                "bucket_ts",
                "n_events",
                "hist_n",
                "is_anomaly",
            )
        )
        alerts.select(*spark.table(alerts_table).columns).write.mode(
            "append"
        ).insertInto(alerts_table)
        for s in (spark, caller):
            try:
                s.catalog.refreshTable(counts_table)
                s.catalog.refreshTable(alerts_table)
            except Exception:
                pass

    writer = stream_df.writeStream.foreachBatch(body).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_late_data_monitor_stream(
    events: DataFrame,
    ts_col: str = "ts",
    grain: str = "1 hour",
    watermark: str = "10 minutes",
    query_name: str = "late_monitor",
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
):
    """Watermark late-data monitor: a windowed event-time count in
    UPDATE mode whose per-micro-batch progress metrics expose exactly
    how the watermark treated arriving data — read them back with
    :func:`watermark_audit_report`.  The operational audit every
    event-time pipeline needs before trusting a watermark setting:
    how late data actually arrives, and how much the chosen horizon
    silently discards.

    Semantics this surfaces (pinned in tests — Spark 4.1 measured
    behavior, not folklore): a late row whose window state is STILL
    LIVE is merged (the engine applies the update, then evicts
    past-watermark state at batch end), so it is NOT counted dropped;
    ``numRowsDroppedByWatermark`` counts only rows arriving after
    their window's state was already evicted — the rows whose data is
    genuinely lost.  Tuning loop: dropped > 0 means the watermark
    horizon is shorter than real arrival lag — widen it (more state,
    no loss) or accept the loss rate this monitor quantifies.

    Scale shape: one windowed hash-agg with watermark-bounded state
    (the same plan as ``rollup_stream``); the audit itself costs
    nothing — it reads the engine's own progress telemetry, no second
    aggregation, no listener thread.  Returns the StreamingQuery
    (memory sink under ``query_name``: the counts are a by-product;
    swap ``foreachBatch`` in for a durable sink)."""
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), grain).alias("__w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__w.start").alias("bucket"), "n")
    )
    writer = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def watermark_audit_report(query, spark: SparkSession) -> DataFrame:
    """Per-micro-batch watermark audit from a streaming query's
    progress telemetry: (batch_id, input_rows, late_rows_dropped,
    state_rows, watermark).  ``late_rows_dropped`` is the engine's
    ``numRowsDroppedByWatermark`` — rows that arrived after their
    window's state was evicted and were silently discarded.  Bounded
    by the number of retained progress events (Spark keeps the last
    ~100); works for ANY stateful query, not just the monitor."""
    rows = []
    for p in query.recentProgress:
        if isinstance(p, str):  # some Spark versions hand back JSON text
            import json as _json

            p = _json.loads(p)
        so = (p.get("stateOperators") or [{}])[0]
        rows.append(
            (
                int(p["batchId"]),
                int(p.get("numInputRows") or 0),
                int(so.get("numRowsDroppedByWatermark") or 0),
                int(so.get("numRowsTotal") or 0),
                str((p.get("eventTime") or {}).get("watermark") or ""),
            )
        )
    return spark.createDataFrame(
        rows,
        "batch_id BIGINT, input_rows BIGINT, late_rows_dropped BIGINT, "
        "state_rows BIGINT, watermark STRING",
    )


def attribution_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join — the attribution primitive: pair
    each ``right`` event (e.g. a purchase) with every ``left`` event
    (e.g. a click) by the SAME key that happened AT OR BEFORE it and
    no more than ``within`` earlier. Watermarks on both sides bound
    the join state (without them a stream-stream inner join buffers
    forever — Spark refuses unwatermarked interval joins in append
    mode for exactly that reason).

    Works identically on batch frames (the interval condition is the
    same range join; ``operators/rangejoin.py`` is the scale path when
    both sides are static). Returns
    (key, left_ts, right_ts, lag_seconds)."""
    l_ = left.select(
        F.col(key_col).alias("__k"),
        F.col(left_ts).alias("__lts"),
    )
    r_ = right.select(
        F.col(key_col).alias("__rk"),
        F.col(right_ts).alias("__rts"),
    )
    if left.isStreaming:
        l_ = l_.withWatermark("__lts", watermark)
    if right.isStreaming:
        r_ = r_.withWatermark("__rts", watermark)
    joined = l_.join(
        r_,
        (F.col("__k") == F.col("__rk"))
        & (F.col("__lts") <= F.col("__rts"))
        & (
            F.col("__lts")
            >= F.col("__rts") - F.expr(f"INTERVAL {within}")
        ),
    )
    return joined.select(
        F.col("__k").alias(key_col),
        F.col("__lts").alias("left_ts"),
        F.col("__rts").alias("right_ts"),
        (
            F.unix_timestamp("__rts") - F.unix_timestamp("__lts")
        ).alias("lag_seconds"),
    )
