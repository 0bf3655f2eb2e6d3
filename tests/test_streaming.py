"""Streaming ingest: file-source WAP with exactly-once semantics, and
the windowed aggregate running under a real readStream."""

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.sources.datagen import BATCH_SCHEMA, land_batch
from no_jvm_wap_with_iceberg_spark.streaming import stream_wap, windowed_event_counts
from no_jvm_wap_with_iceberg_spark.wap import NotNullCheck, WapPipeline
from tests.conftest import SF_DIR


def test_stream_wap_available_now(spark, warehouse, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    for seed in range(3):
        land_batch(spark, landing, n=50, no_null=True, seed=seed)
    land_batch(spark, landing, n=50, no_null=False, seed=99)  # dirty

    cat = Catalog(warehouse)
    pipe = WapPipeline(cat, "customer_data_log", [NotNullCheck("my_col_1")])
    q = stream_wap(spark, landing, pipe, BATCH_SCHEMA, ckpt)
    q.awaitTermination(120)

    # published rows from clean batches only; dirty batch branch open.
    # (AvailableNow may group landed files into one or more micro-batches;
    # totals are what matters.)
    main_rows = cat.row_count("customer_data_log", "main")
    open_branches = [b for b in cat.list_branches() if b != "main"]
    branch_rows = sum(
        cat.row_count("customer_data_log", b) - main_rows for b in open_branches
    )
    assert main_rows + branch_rows >= 150  # every clean row landed somewhere
    assert open_branches, "dirty batch should leave a forensic branch"

    # restart with same checkpoint: nothing new -> no double append
    q2 = stream_wap(spark, landing, pipe, BATCH_SCHEMA, ckpt)
    q2.awaitTermination(60)
    assert cat.row_count("customer_data_log", "main") == main_rows


def test_windowed_counts_under_readstream(spark, tmp_path):
    """The SAME windowed aggregation must run as a genuine streaming
    query (memory sink, complete mode) and agree with the batch run."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    events = load_table(spark, SF_DIR, "events").limit(500)
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    batch_df = spark.read.parquet(src)
    expected = {
        tuple(r)
        for r in windowed_event_counts(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == expected


def test_sessionize_stream_parity(spark, tmp_path):
    """Closed sessions emitted by the applyInPandasWithState path must
    equal the batch window-plan sessions, except each user's final
    (still-open) session, which correctly stays in state."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from no_jvm_wap_with_iceberg_spark.streaming.sessionize import (
        sessionize,
        sessionize_stream,
    )

    events = load_table(spark, SF_DIR, "events").limit(2000)
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    batch_df = spark.read.parquet(src)

    batch = sessionize(batch_df).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    expected = {
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in batch
        if r.session_seq != last_seq[r.user_id]
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == expected


def test_multimodal_stub_paths(spark):
    """Resize/frame-sample stubs: shapes, determinism, and the
    NotImplementedError gate on the real-codec path."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from no_jvm_wap_with_iceberg_spark.operators.multimodal import (
        as_media_table,
        frame_sample_plan,
        resize_plan,
    )
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    d = load_table(spark, SF_DIR, "documents").limit(50)
    media = as_media_table(
        d.select("doc_id", F.encode("text", "UTF-8").alias("p")), "doc_id", "p", "image"
    )
    rp = resize_plan(media).collect()
    assert len(rp) == 50
    assert all(max(r.dst_width, r.dst_height) <= 256 for r in rp)
    fs = frame_sample_plan(media)
    joined = (
        fs.groupBy("media_id").count().join(media, "media_id").collect()
    )
    for r in joined:
        assert r["count"] == len(r.payload) // 4096 + 1

    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_plan(media, decode_stub=False).collect()


def test_streaming_exact_dedup_by_event_id(spark, tmp_path):
    """Streaming exact dedup: dropDuplicates on the event key under a
    watermark — re-delivered events are dropped exactly once across
    micro-batches (the delivery-idempotence the reference lacks,
    SURVEY §2.7)."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    events = load_table(spark, SF_DIR, "events").limit(300)
    src = str(tmp_path / "dup_src")
    # land the same 300 events twice -> stream sees 600 rows
    events.write.parquet(src)
    events.write.mode("append").parquet(src)
    batch_df = spark.read.parquet(src)
    assert batch_df.count() == 600

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    deduped = (
        stream.withColumn("_evt", F.col("ts").cast("timestamp"))
        .withWatermark("_evt", "1 day")
        .dropDuplicates(["event_id"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM dedup_stream").collect()[0]
    assert got.c == 300 and got.d == 300


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with watermarks and an event-time interval:
    each purchase joined to same-user clicks within the preceding hour
    — state bounded by the watermark on both sides. Batch run of the
    identical plan is the oracle."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

    ev = load_table(spark, SF_DIR, "events").limit(1500)
    src = str(tmp_path / "ssj_src")
    ev.write.parquet(src)
    batch = spark.read.parquet(src).withColumn("_evt", F.col("ts").cast("timestamp"))

    from no_jvm_wap_with_iceberg_spark.streaming.ingest import interval_join

    def plan(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("_evt").alias("c_ts"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("_evt").alias("p_ts"),
        )
        return interval_join(
            purchases, clicks, "user_id", "p_ts", "c_ts",
            max_lag="INTERVAL 1 HOUR",
        ).select("purchase_id", "click_id")

    expected = {tuple(r) for r in plan(batch).collect()}

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withColumn("_evt", F.col("ts").cast("timestamp"))
    )
    q = (
        plan(stream)
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == expected and expected


def test_dedup_within_watermark_stream_batch_parity(spark, tmp_path):
    """dedup_within_watermark: the BOUNDED-state dedup
    (dropDuplicatesWithinWatermark) drops cross-micro-batch
    re-deliveries inside the watermark, and its streaming result
    matches the batch degenerate form on slot-level aggregates."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from no_jvm_wap_with_iceberg_spark.streaming.ingest import (
        dedup_within_watermark,
    )

    events = load_table(spark, SF_DIR, "events").limit(400)
    src = str(tmp_path / "wdup_src")
    events.write.parquet(src)  # first delivery
    events.write.mode("append").parquet(src)  # duplicate delivery
    batch_df = spark.read.parquet(src)

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="1 day")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wdedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM wdedup_stream"
    ).collect()[0]
    want = dedup_within_watermark(batch_df, ["event_id"]).count()
    assert got.c == got.d == want == 400


def test_stream_merge_cdc_apply(spark, warehouse, tmp_path):
    """CDC batches land as files; stream_merge applies each as one
    merge-on-read commit, in arrival order; a checkpoint restart
    re-applies nothing; a replayed merge converges to the same state."""
    import os
    import time

    from no_jvm_wap_with_iceberg_spark.streaming.ingest import stream_merge

    cat = Catalog(warehouse)
    seed = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(20)],
        "id long, name string, score double",
    )
    cat.create_table_from_df(seed, "t")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    schema = "id long, name string, score double, _del boolean"
    # batch A: update ids 0-4, insert 100; batch B (later mtime):
    # re-update ids 0-2 (must win over A) and delete id 3
    a = spark.createDataFrame(
        [(i, f"a{i}", -1.0, False) for i in range(5)] + [(100, "new", 9.0, False)],
        schema,
    )
    b = spark.createDataFrame(
        [(i, f"b{i}", -2.0, False) for i in range(3)] + [(3, "x", 0.0, True)],
        schema,
    )
    a.coalesce(1).write.parquet(os.path.join(landing, "a"))
    time.sleep(1.1)  # file-source orders micro-batches by mtime
    b.coalesce(1).write.parquet(os.path.join(landing, "b"))

    ckpt = str(tmp_path / "ckpt")
    q = stream_merge(
        spark, landing, cat, "t", key="id", schema=a.schema,
        checkpoint_dir=ckpt, delete_col="_del", max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    def state():
        return {(r.id, r.name, r.score) for r in cat.read(spark, "t").collect()}

    expect = (
        {(i, f"b{i}", -2.0) for i in range(3)}  # B wins over A
        | {(4, "a4", -1.0)}  # A's update, untouched by B
        | {(i, f"v{i}", float(i)) for i in range(5, 20)}  # never touched
        | {(100, "new", 9.0)}  # A's insert; id 3 deleted by B
    )
    assert state() == expect
    n_snaps = len(cat.load_table("t").snapshots)

    # restart on the same checkpoint: no new files -> no new commits
    q2 = stream_merge(
        spark, landing, cat, "t", key="id", schema=a.schema,
        checkpoint_dir=ckpt, delete_col="_del",
    )
    q2.awaitTermination(60)
    assert state() == expect
    assert len(cat.load_table("t").snapshots) == n_snaps

    # replayed merge (crash after commit, before checkpoint ack):
    # applying the LAST batch again converges to identical state
    cat.merge_rows(b, "t", key="id", delete_col="_del")
    assert state() == expect


def test_changefeed_stream_source(spark, warehouse, tmp_path):
    """The catalog commit log as a real readStream source: availableNow
    drains existing commits per startingOffsets, a checkpoint restart
    sees only NEW appends, schema-era mapping survives a rename, and a
    row-level delete in the span streams as a ``delete`` row."""
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, name string"
        ),
        "t",
    )
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame([(10, "ten")], "id long, title string"), "t"
    )

    def drain(ckpt, sink):
        q = (
            spark.readStream.format("wap_changefeed")
            .option("warehouse", warehouse)
            .option("table", "t")
            .option("startingOffsets", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / sink))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(tmp_path / sink))

    out = drain("ckpt", "sink")
    rows = {(r.id, r.title, r._change_type) for r in out.collect()}
    # pre-rename files map through the history; all rows are inserts
    assert rows == {(i, f"v{i}", "insert") for i in range(10)} | {
        (10, "ten", "insert")
    }
    assert out.select("_snapshot_id").distinct().count() == 2

    # restart on the same checkpoint: only the NEW append arrives
    cat.append(
        spark.createDataFrame([(11, "eleven")], "id long, title string"), "t"
    )
    out2 = drain("ckpt", "sink")
    assert {(r.id, r.title) for r in out2.collect()} == {
        (i, f"v{i}") for i in range(10)
    } | {(10, "ten"), (11, "eleven")}
    assert out2.count() == 12

    # a row-level (MoR predicate) delete streams as a delete row,
    # replayed inside the partition reader against parent-visible state
    cat.delete_where(spark, "t", [], "id = 0", mode="mor")
    cat.append(
        spark.createDataFrame([(12, "twelve")], "id long, title string"), "t"
    )
    out3 = drain("ckpt", "sink")
    rows3 = sorted(
        (r.id, r.title, r._change_type) for r in out3.collect()
    )
    inserts = [(i, f"v{i}", "insert") for i in range(10)] + [
        (10, "ten", "insert"),
        (11, "eleven", "insert"),
        (12, "twelve", "insert"),
    ]
    assert rows3 == sorted(inserts + [(0, "v0", "delete")])
    # the cumulative feed folds to the table's current state
    alive = (
        out3.groupBy("id", "title")
        .agg(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(-1))
            .alias("n")
        )
        .filter("n > 0")
    )
    assert {(r.id, r.title) for r in alive.collect()} == {
        (r.id, r.title) for r in cat.read(spark, "t").collect()
    }


def test_changefeed_stream_matches_read_changes(spark, warehouse, tmp_path):
    """Row-level-change parity: the streamed feed over a mutation-heavy
    span (append, MoR predicate delete, COW update with SET exprs,
    MERGE with tombstones, COW delete-by-key) must equal
    Catalog.read_changes row-for-row — the partition-reader replay and
    the Spark-side replay implement one semantics."""
    from no_jvm_wap_with_iceberg_spark.catalog import Predicate
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = Catalog(warehouse)
    df0 = spark.range(0, 100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    m0 = cat.create_table_from_df(df0, "t")
    base_sid = m0.current_snapshot_id
    cat.append(
        spark.range(100, 130).select(
            F.col("id"), F.lit("batch2").alias("name")
        ),
        "t",
    )
    cat.delete_where(
        spark, "t", Predicate.between("id", 10, 19),
        "id BETWEEN 10 AND 19", mode="mor",
    )
    cat.update_where(
        spark, "t", Predicate.between("id", 40, 44),
        "id BETWEEN 40 AND 44", {"name": "'upd'"},
    )
    cdc = (
        spark.range(90, 110)
        .select(F.col("id"), F.lit("merged").alias("name"))
        .withColumn("_del", F.col("id") < 95)
    )
    cat.merge_rows(cdc, "t", key="id", delete_col="_del")
    keys = spark.createDataFrame([(5,), (6,), (7,)], "id long")
    cat.delete_keys(keys, "t", "id", mode="cow")

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", warehouse)
        .option("table", "t")
        .option("startingOffsets", str(base_sid))
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = sorted(
        (r.id, r.name, r._change_type, r._snapshot_id)
        for r in spark.read.parquet(sink).collect()
    )
    batch = sorted(
        (r.id, r.name, r._change_type, r._snapshot_id)
        for r in cat.read_changes(spark, "t", base_sid).collect()
    )
    assert streamed == batch
    assert {c for _, _, c, _ in streamed} == {"insert", "delete"}


def test_session_window_native_matches_custom_plan(spark):
    """Spark's built-in session_window must produce the same session
    partitioning and aggregates as the custom lag/running-sum plan."""
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from no_jvm_wap_with_iceberg_spark.streaming.sessionize import (
        events_session_window_native,
        sessionize,
    )

    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in events_session_window_native(spark, SF_DIR).collect()
    }
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
    custom = {
        tuple(r)
        for r in sessionize(load_table(spark, SF_DIR, "events"))
        .select(
            "user_id",
            F.expr(us.format("session_start")).alias("s"),
            F.expr(us.format("session_end")).alias("e"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert native == custom


def test_changefeed_stream_replays_prerename_condition(spark, warehouse, tmp_path):
    """A predicate delete recorded BEFORE a rename_column must replay
    through the streaming source AFTER the rename: the partition
    reader maps file columns to current names and exposes historical
    names as SQL aliases, so the old-name condition still resolves."""
    from no_jvm_wap_with_iceberg_spark.catalog import Predicate
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, name string"
        ),
        "t",
    )
    # condition recorded against the OLD column name...
    cat.delete_where(spark, "t", [], "name = 'v3'", mode="mor")
    # ...then folded (rename refuses while a pending delete references
    # the old name), renamed, and more rows arrive — the HISTORICAL
    # delete snapshot still replays its old-name condition
    cat.compact(spark, "t", target_file_mb=64, min_files=1)
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame([(8, "v8")], "id long, title string"), "t"
    )

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", warehouse)
        .option("table", "t")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.id, r.title, r._change_type)
        for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        [(i, f"v{i}", "insert") for i in range(9)] + [(3, "v3", "delete")]
    )
    assert rows == want


def test_changefeed_stream_partitioned_table_with_merge(spark, warehouse, tmp_path):
    """Identity-partitioned tables drop the partition column from the
    data files (hive layout); both the insert fast path and the
    row-level replay partitions must restore it from the manifest's
    recorded partition values."""
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = Catalog(warehouse)
    df0 = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", i * 10) for i in range(20)],
        "id long, parity string, v long",
    )
    cat.create_table_from_df(df0, "t", partition_by=["parity"])
    cdc = spark.createDataFrame(
        [(4, "even", 999, False), (5, "odd", 0, True), (30, "even", 300, False)],
        "id long, parity string, v long, _del boolean",
    )
    cat.merge_rows(cdc, "t", key="id", delete_col="_del")

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", warehouse)
        .option("table", "t")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    feed = spark.read.parquet(sink)
    assert feed.filter(F.col("parity").isNull()).count() == 0, (
        "partition column lost in replay"
    )
    rows = sorted(
        (r.id, r.parity, r.v, r._change_type) for r in feed.collect()
    )
    batch = sorted(
        (r.id, r.parity, r.v, r._change_type)
        for r in cat.read_changes(spark, "t", 1).collect()
    ) + sorted(
        (r.id, r.parity, r.v, "insert") for r in df0.collect()
    )
    assert rows == sorted(batch)


def test_changefeed_max_commits_per_trigger_throttles_catchup(
    spark, warehouse, tmp_path
):
    """Admission control under the real engine: commits landing while
    a capped query runs drain as one-commit micro-batches, not one
    lag-sized batch. (The first planned batch is uncapped by design —
    the engine prefetches latestOffset before the reader learns its
    start; see the source docstring.)"""
    import time

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = Catalog(warehouse)
    cat.create_table_from_df(spark.range(0, 10).select(F.col("id")), "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", warehouse)
        .option("table", "t")
        .option("startingOffsets", "earliest")
        .option("maxCommitsPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:  # seed commit drained?
            done = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if sum(p["numInputRows"] for p in done) >= 10:
                break
            time.sleep(1)
        for lo in (10, 20, 30):  # lag builds while the query runs
            cat.append(spark.range(lo, lo + 10).select(F.col("id")), "t")
        deadline = time.time() + 90
        while time.time() < deadline:
            done = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if sum(p["numInputRows"] for p in done) >= 40:
                break
            time.sleep(1)
    finally:
        q.stop()
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert sum(sizes) == 40
    # the 3 catch-up commits must arrive as separate one-commit batches
    assert sizes[-3:] == [10, 10, 10], sizes
    out = spark.read.parquet(sink)
    assert out.count() == 40
    assert out.select("_snapshot_id").distinct().count() == 4


def test_stream_wap_json_and_csv_landing(spark, tmp_path):
    """S3-event pipelines land JSON/CSV too: the same WAP loop runs
    over either format with the explicit schema; dirty rows still gate
    publish."""
    from no_jvm_wap_with_iceberg_spark.sources.datagen import generate_batch

    for fmt, writer in (
        ("json", lambda df, p: df.write.json(p)),
        ("csv", lambda df, p: df.write.option("header", True).csv(p)),
    ):
        landing = str(tmp_path / f"landing_{fmt}")
        ckpt = str(tmp_path / f"ckpt_{fmt}")
        wh = str(tmp_path / f"wh_{fmt}")
        clean = generate_batch(spark, n=80, no_null=True, seed=3)
        writer(clean, landing)
        cat = Catalog(wh)
        pipe = WapPipeline(cat, "landed", [NotNullCheck("my_col_1")])
        q = stream_wap(
            spark, landing, pipe, clean.schema, ckpt, format=fmt
        )
        q.awaitTermination(120)
        assert cat.row_count("landed", "main") == 80, fmt
        got = {
            tuple(r)
            for r in cat.read(spark, "landed").select(*clean.columns).collect()
        }
        want = {tuple(r) for r in clean.collect()}
        assert got == want, f"{fmt}: landed rows must round-trip exactly"
