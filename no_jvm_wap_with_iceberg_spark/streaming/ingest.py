"""Streaming ingest: the S3-event → Lambda trigger, Spark-first.

The reference wires S3 ``ObjectCreated`` events to a Lambda that runs
one WAP cycle per landed Parquet file
(``src/serverless/serverless.yml:40-44``, ``app.py:255-273``). The
Structured Streaming equivalent is a file-source stream over the
landing directory with the WAP pipeline as the ``foreachBatch`` body:

- ``Trigger.AvailableNow`` reproduces the Lambda's "process what has
  landed, then stop" semantics for batch-style runs; leave it off for
  a continuously-running ingester.
- Checkpointing upgrades the reference's at-least-once event handling
  to exactly-once file tracking (its acknowledged gap — SURVEY §2.7):
  a restarted stream never re-appends a processed file.
- ``maxFilesPerTrigger`` bounds micro-batch size so commit/audit
  latency stays flat under a backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
from no_jvm_wap_with_iceberg_spark.wap.pipeline import WapPipeline


def stream_wap(
    spark: SparkSession,
    landing_dir: str,
    pipeline: WapPipeline,
    schema: T.StructType,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    format: str = "parquet",
):
    """Run the WAP pipeline over files landing in ``landing_dir``.

    Returns the StreamingQuery; with ``available_now`` the caller
    should ``awaitTermination()`` and the query drains the backlog
    then stops (one WAP cycle per micro-batch).

    ``format``: ``parquet`` (default), ``json`` (newline-delimited)
    or ``csv`` (with header) — S3-event pipelines commonly land all
    three; the explicit ``schema`` applies to every format, so a
    malformed landed file surfaces as nulls for the audit checks to
    catch rather than as a stream crash.
    """
    if format not in ("parquet", "json", "csv"):
        raise ValueError(f"unsupported landing format {format!r}")
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"*.{format if format != 'json' else 'json*'}")
        .option("recursiveFileLookup", "true")
    )
    if format == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = getattr(reader, format)(landing_dir)

    def _batch(df: DataFrame, batch_id: int) -> None:
        if df.isEmpty():
            return
        pipeline.run_batch(spark, df, ingest_key=f"stream-batch-{batch_id}")

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge(
    spark: SparkSession,
    landing_dir: str,
    cat,
    table: str,
    key: str,
    schema: T.StructType,
    checkpoint_dir: str,
    delete_col: str | None = None,
    branch: str = "main",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming CDC apply: land CDC batches (upserts + optional
    ``delete_col`` tombstones) as parquet files and MERGE each
    micro-batch into a catalog table via :meth:`Catalog.merge_rows` —
    the streaming front door for an update-heavy table (a Kafka/Debezium
    consumer in production; the file source stands in for the queue the
    same way it stands in for S3 events in :func:`stream_wap`).

    Delivery is exactly-once at the STATE level by two layers:

    - the checkpoint makes micro-batch ids stable across restarts, and
      an ingest key per (table, batch) skips a batch whose merge
      already committed (crash between commit and checkpoint ack);
    - even a replayed merge converges: MERGE by key masks every older
      row holding an incoming key — including rows the first attempt
      inserted — and re-inserts the same rows, so applying a batch
      twice yields byte-identical table state (asserted in
      tests/test_streaming.py).

    Ordering: within one stream the file source processes micro-batches
    sequentially, so CDC batches apply in arrival order;
    ``maxFilesPerTrigger=1`` forces one landed file per merge commit
    when per-file ordering matters.

    At 100 TB each micro-batch costs O(batch) — merge-on-read commit,
    no table rewrite — with :meth:`Catalog.compact` folding pending
    deletes on its own cadence.
    """
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    def _batch(df: DataFrame, batch_id: int) -> None:
        ingest_key = f"stream-merge-{table}-{branch}-{batch_id}"
        if df.isEmpty() or cat.has_ingest_key(ingest_key):
            return
        cat.merge_rows(df, table, key=key, branch=branch, delete_col=delete_col)
        cat.stamp_ingest_key(ingest_key)

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a (possibly
    streaming) events DataFrame — late rows beyond the watermark are
    dropped, state is bounded. Works identically on a batch DataFrame
    (watermark becomes a no-op), which is how the oracle checks it.
    Aggregates are restricted to streaming-supported exact ops (no
    distinct aggregation in streaming; use approx_count_distinct if a
    user-count is needed on a live stream).
    """
    ts = F.col(ts_col)
    # streaming state requires TIMESTAMP (not NTZ) event time
    df = events.withColumn("_evt", ts.cast("timestamp")).withWatermark(
        "_evt", watermark
    )
    return (
        df.groupBy(F.window("_evt", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "streaming_windowed_counts",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="batch view of the watermarked tumbling-window streaming aggregate "
    "(same plan runs under readStream; see tests/test_streaming.py)",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str):
    # window() operates on TIMESTAMP; pin the session to UTC so the
    # NTZ->LTZ->NTZ round trip is the identity in any driver session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return windowed_event_counts(load_table(spark, sf_dir, "events"))


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Row-level exact dedup on a stream with BOUNDED state.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps the first row
    per key and holds each key in state only until the watermark
    passes it — the production shape for at-least-once upstreams
    (duplicate deliveries land within minutes, state stays O(keys in
    the watermark window), a plain ``dropDuplicates`` on a stream
    would grow state forever). Batch: the same call degenerates to
    keep-one-per-key, which is how the oracle checks it.

    Complements the file-level ``ingest_key`` idempotence in
    :func:`stream_wap` (reference: one Lambda invoke per S3 object,
    ``app.py:255-273``, which dedups nothing within a file).
    """
    ts = F.col(ts_col)
    df = events.withColumn("_evt", ts.cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("_evt", watermark)
        return df.dropDuplicatesWithinWatermark(keys).drop("_evt")
    return df.dropDuplicates(keys).drop("_evt")


@register(
    "streaming_dedup_slots",
    """
    WITH slots AS (
      SELECT DISTINCT user_id, event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slot
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_slots,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM slots GROUP BY event_type
    """,
    doc="batch view of watermark-scoped streaming dedup: collapse "
    "events to one row per (user_id, event_type, hour) slot via "
    "dedup_within_watermark, then count surviving slots per type. "
    "The output depends only on WHICH slots exist, never on which "
    "row survived, so the streaming and batch answers are identical "
    "by construction (cross-batch duplicate handling is asserted on "
    "a real stream in tests/test_streaming.py). State on a live "
    "stream is O(slots inside the watermark window).",
)
def streaming_dedup_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("slot"),
    )
    slots = dedup_within_watermark(
        ev, ["user_id", "event_type", "slot"], ts_col="slot"
    )
    return slots.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval:
    right rows within ``[left_ts - max_lag, left_ts]`` of a same-key
    left row (the click->purchase attribution shape).

    Streaming: BOTH sides get watermarks — together with the interval
    condition that bounds the join state (Spark evicts a buffered row
    once the other side's watermark passes its reachable window), so
    state is O(events inside the watermark horizon), never unbounded.
    Inner joins emit eagerly on arrival, so with availableNow drains
    the streamed output equals the batch run of the identical plan —
    which is how the oracle checks it (parity on a REAL stream is
    asserted in tests/test_streaming.py). Batch: ``withWatermark`` is
    a no-op and the same plan is an ordinary range join.

    Columns out: every left column, every right column (caller
    pre-aliases collisions), plus ``lag_seconds``.
    """
    lts, rts = F.col(left_ts), F.col(right_ts)
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    lkey = f"__l_{key}"
    lw = lw.withColumnRenamed(key, lkey)
    joined = lw.join(
        rw,
        (F.col(lkey) == F.col(key))
        & (rts <= lts)
        & (rts >= lts - F.expr(max_lag)),
        "inner",
    )
    return joined.drop(lkey).withColumn(
        "lag_seconds",
        F.unix_timestamp(lts) - F.unix_timestamp(rts),
    )


@register(
    "streaming_interval_join",
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT p.purchase_id, c.click_id,
             date_diff('second', c.c_ts, p.p_ts) AS lag_seconds
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND c.c_ts <= p.p_ts
       AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_attributed,
           CAST(SUM(lag_seconds) AS BIGINT) AS sum_lag_seconds
    FROM pairs
    """,
    doc="batch view of the watermarked stream-stream interval join "
    "(interval_join): purchases attributed to same-user clicks within "
    "the preceding hour; lag summed in integer seconds (no float "
    "boundary effects). The identical plan runs under readStream with "
    "bounded state — stream/batch output parity is asserted on a real "
    "stream in tests/test_streaming.py.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    pairs = interval_join(
        purchases, clicks, "user_id", "p_ts", "c_ts",
        max_lag="INTERVAL 1 HOUR",
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_attributed"),
        F.sum("lag_seconds").alias("sum_lag_seconds"),
    )


def follow_changes(
    spark: SparkSession,
    cat,
    table: str,
    cursor: int | None,
    branch: str = "main",
):
    """Incremental change-feed consumption: returns ``(feed_df,
    new_cursor)`` where the feed covers every commit after ``cursor``
    (a snapshot id; None = from table creation, i.e. the full current
    state as inserts) and ``new_cursor`` resumes after them.

    The poll-loop shape of a downstream CDC consumer: persist the
    cursor with your output (the same transactional-cursor pattern as
    ``stream_wap``'s ingest keys) and each call costs O(changed
    data) — `Catalog.read_changes` replays only the files the new
    commits touched. An unchanged table returns an empty frame and
    the same cursor.
    """
    meta = cat.load_table(table, branch)
    head = meta.current_snapshot_id
    if cursor is None:
        # initial load: current state as one insert batch
        df = cat.read(spark, table, branch)
        feed = df.select(
            *df.columns,
            F.lit("insert").alias("_change_type"),
            F.lit(head if head is not None else -1).alias("_snapshot_id"),
        )
        return feed, head
    if head == cursor:
        empty = cat.read(spark, table, branch).limit(0)
        feed = empty.select(
            *empty.columns,
            F.lit("insert").alias("_change_type"),
            F.lit(-1).alias("_snapshot_id"),
        ).limit(0)
        return feed, cursor
    return cat.read_changes(spark, table, cursor, head, branch), head
