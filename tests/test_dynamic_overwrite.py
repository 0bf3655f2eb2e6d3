"""Dynamic partition overwrite (Iceberg's INSERT OVERWRITE semantics
on partitioned tables): only the partitions the incoming rows touch
are replaced; other partitions carry over by reference. CDC replays
as delete(prior partition rows) + insert(incoming), in both
read_changes and the streaming changefeed source."""

from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _rows(spark, part, ids, v=0):
    return spark.createDataFrame(
        [(i, part, v) for i in ids], SCHEMA
    )


def _state(cat, spark, t):
    return {
        (r["id"], r["part"], r["v"])
        for r in cat.read(spark, t).collect()
    }


def test_dynamic_overwrite_replaces_only_touched_partitions(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, partition_by=["part"])
    cat.append(_rows(spark, "a", range(3)), "t")
    cat.append(_rows(spark, "b", range(10, 13)), "t")
    b_paths = {
        f.path
        for f in cat.load_table("t").files()
        if f.partition.get("part") == "b"
    }

    cat.dynamic_overwrite(_rows(spark, "a", range(100, 102), v=9), "t")

    got = _state(cat, spark, "t")
    assert got == {(100, "a", 9), (101, "a", 9)} | {
        (i, "b", 0) for i in range(10, 13)
    }
    # untouched partition's files carried over by reference
    after_b = {
        f.path
        for f in cat.load_table("t").files()
        if f.partition.get("part") == "b"
    }
    assert after_b == b_paths
    # commit is O(touched): 'rewrite' op, not a table-wide overwrite
    assert cat.load_table("t").snapshots[-1].operation == "rewrite"


def test_dynamic_overwrite_unpartitioned_full_replace(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("u", SCHEMA)
    cat.append(_rows(spark, "a", range(5)), "u")
    cat.dynamic_overwrite(_rows(spark, "z", [42], v=1), "u")
    assert _state(cat, spark, "u") == {(42, "z", 1)}
    assert cat.load_table("u").snapshots[-1].operation == "overwrite"


def test_sql_insert_overwrite_is_dynamic_on_partitioned(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, partition_by=["part"])
    cat.append(_rows(spark, "a", range(2)), "t")
    cat.append(_rows(spark, "b", range(10, 12)), "t")
    _rows(spark, "a", [7], v=5).createOrReplaceTempView("dyn_src")
    st = cat.sql(spark, "INSERT OVERWRITE t SELECT * FROM dyn_src")
    assert st.collect()[0]["operation"] == "INSERT OVERWRITE"
    assert _state(cat, spark, "t") == {(7, "a", 5), (10, "b", 0), (11, "b", 0)}


def test_dynamic_overwrite_hidden_partitioning(spark, warehouse):
    """Touched-partition matching goes through the derived transform
    value, so a bucket/day-partitioned table replaces by the hidden
    value the writer derives."""
    import datetime as dt

    sch = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    cat = Catalog(warehouse)
    cat.create_table("h", sch, partition_by=["day(ts)"])
    d1, d2 = dt.datetime(2024, 1, 1, 5), dt.datetime(2024, 1, 2, 6)
    cat.append(
        spark.createDataFrame([(1, d1), (2, d2)], sch), "h"
    )
    # reload day 1 only
    cat.dynamic_overwrite(
        spark.createDataFrame([(9, d1.replace(hour=23))], sch), "h"
    )
    got = {(r["id"], r["ts"]) for r in cat.read(spark, "h").collect()}
    assert got == {(9, d1.replace(hour=23)), (2, d2)}


def test_dynamic_overwrite_cdc_read_changes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, partition_by=["part"])
    cat.append(_rows(spark, "a", range(2)), "t")
    v1 = cat.load_table("t").current_snapshot_id
    cat.append(_rows(spark, "b", [10]), "t")
    v2 = cat.load_table("t").current_snapshot_id
    cat.dynamic_overwrite(_rows(spark, "a", [5], v=3), "t")

    changes = cat.read_changes(spark, "t", v2).collect()
    got = {
        (r["id"], r["part"], r["v"], r["_change_type"]) for r in changes
    }
    assert got == {
        (0, "a", 0, "delete"),
        (1, "a", 0, "delete"),
        (5, "a", 3, "insert"),
    }
    # replay invariant: from v1 the feed reconstructs the final state
    base = {
        (r["id"], r["part"], r["v"])
        for r in cat.read(spark, "t", snapshot_id=v1).collect()
    }
    for r in sorted(
        cat.read_changes(spark, "t", v1).collect(),
        key=lambda r: r["_snapshot_id"],
    ):
        key = (r["id"], r["part"], r["v"])
        if r["_change_type"] == "insert":
            base.add(key)
        else:
            base.discard(key)
    assert base == _state(cat, spark, "t")


def test_dynamic_overwrite_cdc_stream_source(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, partition_by=["part"])
    cat.append(_rows(spark, "a", range(2)), "t")
    cat.dynamic_overwrite(_rows(spark, "a", [5], v=3), "t")
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
        {"warehouse": warehouse, "table": "t", "startingoffsets": "earliest"},
    )
    parts = r.partitions({"snapshot_id": 0}, {"snapshot_id": head})
    rows = []
    for p in parts:
        for rb in r.read(p):
            rows.extend(rb.to_pylist())
    got = {
        (x["id"], x["part"], x["v"], x["_change_type"]) for x in rows
    }
    assert got == {
        (0, "a", 0, "insert"),  # the original append
        (1, "a", 0, "insert"),
        (0, "a", 0, "delete"),  # the replacement
        (1, "a", 0, "delete"),
        (5, "a", 3, "insert"),
    }


def test_insert_partition_static_clause(spark, warehouse):
    """INSERT INTO t PARTITION (part='x'): the static column is a
    constant filled into every row and omitted from the select list."""
    cat = Catalog(warehouse)
    cat.create_table("s", SCHEMA, partition_by=["part"])
    cat.sql(spark, "INSERT INTO s PARTITION (part = 'a') VALUES (1, 10), (2, 20)")
    assert _state(cat, spark, "s") == {(1, "a", 10), (2, "a", 20)}
    # column-list form: static name may not repeat in the list
    import pytest

    with pytest.raises(ValueError, match="both"):
        cat.sql(
            spark,
            "INSERT INTO s PARTITION (part='a') (id, part, v) "
            "VALUES (3, 'a', 30)",
        )
    # non-partition column in PARTITION clause refuses
    with pytest.raises(ValueError, match="identity partition"):
        cat.sql(spark, "INSERT INTO s PARTITION (v = 1) VALUES (3, 'b')")


def test_insert_overwrite_static_partition(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("s", SCHEMA, partition_by=["part"])
    cat.append(_rows(spark, "a", range(2)), "s")
    cat.append(_rows(spark, "b", range(10, 12)), "s")
    # static overwrite replaces exactly that partition
    cat.sql(
        spark,
        "INSERT OVERWRITE s PARTITION (part = 'a') VALUES (7, 77)",
    )
    assert _state(cat, spark, "s") == {
        (7, "a", 77),
        (10, "b", 0),
        (11, "b", 0),
    }
    # empty source + fully-static clause TRUNCATES the partition
    cat.sql(
        spark,
        "INSERT OVERWRITE s PARTITION (part = 'b') "
        "SELECT CAST(1 AS BIGINT) AS id, CAST(1 AS BIGINT) AS v "
        "WHERE false",
    )
    assert _state(cat, spark, "s") == {(7, "a", 77)}


def test_insert_partition_mixed_static_dynamic(spark, warehouse):
    """PARTITION (part) — declared-dynamic name: values come from the
    data (same as omitting the clause)."""
    cat = Catalog(warehouse)
    cat.create_table("s", SCHEMA, partition_by=["part"])
    cat.sql(
        spark,
        "INSERT INTO s PARTITION (part) VALUES (1, 'a', 10), (2, 'b', 20)",
    )
    assert _state(cat, spark, "s") == {(1, "a", 10), (2, "b", 20)}
