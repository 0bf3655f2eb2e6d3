"""REPLACE WHERE (Delta's replaceWhere / INSERT INTO ... REPLACE WHERE):
atomic predicate-scoped replace in ONE snapshot.

- result parity (delete cond + insert, atomically);
- predicate enforcement on incoming rows (Delta's default);
- partition-aligned predicates drop whole files via metadata;
- idempotence: re-running the same slice lands the same final state;
- CDC exactness: kept rows carried through the rewrite appear in
  NEITHER side of the feed — batch read_changes and the streaming
  changefeed source agree.
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _base(spark, warehouse, partition_by=None):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(12)],
        "id INT, day STRING, v DOUBLE",
    )
    cat.create_table_from_df(df, "t", partition_by=partition_by)
    return cat


def test_replace_where_api_and_idempotence(spark, warehouse):
    cat = _base(spark, warehouse)
    repl = spark.createDataFrame(
        [(100, "d1", 100.0), (101, "d1", 101.0)], "id INT, day STRING, v DOUBLE"
    )
    cat.replace_where(repl, "t", "day = 'd1'")
    expect = {(i, f"d{i % 3}") for i in range(12) if i % 3 != 1} | {
        (100, "d1"), (101, "d1"),
    }
    got = {(r.id, r.day) for r in cat.read(spark, "t").collect()}
    assert got == expect
    # idempotent: the same slice again -> the same final state
    cat.replace_where(repl, "t", "day = 'd1'")
    assert {(r.id, r.day) for r in cat.read(spark, "t").collect()} == expect


def test_replace_where_enforces_predicate(spark, warehouse):
    cat = _base(spark, warehouse)
    bad = spark.createDataFrame(
        [(100, "d2", 1.0)], "id INT, day STRING, v DOUBLE"
    )
    with pytest.raises(ValueError, match="violates the predicate"):
        cat.replace_where(bad, "t", "day = 'd1'")
    assert cat.read(spark, "t").count() == 12  # untouched


def test_partition_aligned_replace_is_metadata_drop(spark, warehouse):
    cat = _base(spark, warehouse, partition_by=["day"])
    repl = spark.createDataFrame(
        [(200, "d0", 0.5)], "id INT, day STRING, v DOUBLE"
    )
    cat.replace_where(repl, "t", "day = 'd0'")
    snap = cat.load_table("t").snapshot()
    assert int(snap.summary.get("metadata-deleted-files", 0)) >= 1
    got = {r.id for r in cat.read(spark, "t").filter("day = 'd0'").collect()}
    assert got == {200}


def test_sql_spelling_with_subquery_predicate(spark, warehouse):
    cat = _base(spark, warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([("d2",)], "day STRING"), "stale_days"
    )
    spark.createDataFrame(
        [(300, "d2", 3.0)], "id INT, day STRING, v DOUBLE"
    ).createOrReplaceTempView("reload_src")
    cat.sql(
        spark,
        "INSERT INTO t REPLACE WHERE day IN (SELECT day FROM stale_days) "
        "SELECT * FROM reload_src",
    )
    d2 = {r.id for r in cat.read(spark, "t").filter("day = 'd2'").collect()}
    assert d2 == {300}
    assert cat.read(spark, "t").count() == 9  # 8 kept + 1 new


def test_cdc_excludes_kept_rows(spark, warehouse):
    cat = _base(spark, warehouse)  # unpartitioned: kept rows REWRITE
    before = cat.load_table("t").current_snapshot_id
    repl = spark.createDataFrame(
        [(100, "d1", 100.0)], "id INT, day STRING, v DOUBLE"
    )
    cat.replace_where(repl, "t", "day = 'd1'")
    feed = cat.read_changes(spark, "t", from_snapshot_id=before)
    rows = {(r.id, r._change_type) for r in feed.collect()}
    assert rows == {(1, "delete"), (4, "delete"), (7, "delete"),
                    (10, "delete"), (100, "insert")}


def test_changefeed_stream_matches_read_changes_for_replace(
    spark, warehouse, tmp_path
):
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        register_changefeed_source,
    )

    register_changefeed_source(spark)
    cat = _base(spark, warehouse)
    repl = spark.createDataFrame(
        [(100, "d1", 100.0), (101, "d1", 101.0)],
        "id INT, day STRING, v DOUBLE",
    )
    cat.replace_where(repl, "t", "day = 'd1'")
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", warehouse)
        .option("table", "t")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.id, r.day, r._change_type, r._snapshot_id)
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    batch = {
        (r.id, r.day, r._change_type, r._snapshot_id)
        for r in cat.read_changes(spark, "t", from_snapshot_id=None).collect()
    }
    assert streamed == batch
    # and the replace commit contributed exactly 4 deletes + 2 inserts
    sid = cat.load_table("t").current_snapshot_id
    this_commit = {t for t in streamed if t[3] == sid}
    assert {(i, c) for i, _d, c, _s in this_commit} == {
        (1, "delete"), (4, "delete"), (7, "delete"), (10, "delete"),
        (100, "insert"), (101, "insert"),
    }
