"""mergeSchema appends, SHOW PARTITIONS, and CALL
create_changelog_view — round-6 parity verbs (Delta's auto schema
evolution; Spark's partition listing answered from the manifest;
Iceberg's queryable-CDC procedure)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _k(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


# ----------------------------------------------------------------------
# mergeSchema
# ----------------------------------------------------------------------


def test_merge_schema_adds_columns_atomically(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_k(spark, 0, 3), "t")
    v_before = cat.load_table("t").version
    cat.append(
        _k(spark, 3, 5).withColumn("tag", F.lit("x")),
        "t",
        merge_schema=True,
    )
    rows = {
        (r["k"], r["tag"]) for r in cat.read(spark, "t").collect()
    }
    assert rows == {(0, None), (1, None), (2, None), (3, "x"), (4, "x")}
    # ONE commit: schema + rows landed together
    assert cat.load_table("t").version == v_before + 1
    assert [f.name for f in cat.load_table("t").spark_schema.fields] == [
        "k",
        "tag",
    ]


def test_strict_append_drops_unknown_columns(spark, warehouse):
    # the long-standing strict-alignment contract mergeSchema opts
    # out of: extra batch columns project away
    cat = Catalog(warehouse)
    cat.create_table_from_df(_k(spark, 0, 2), "t")
    cat.append(_k(spark, 2, 4).withColumn("extra", F.lit(1)), "t")
    assert cat.read(spark, "t").columns == ["k"]


def test_merge_schema_refuses_zombie_columns(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        _k(spark, 0, 3).withColumn("old", F.lit("v")), "t"
    )
    cat.drop_column("t", "old")
    with pytest.raises(ValueError, match="dropped"):
        cat.append(
            _k(spark, 3, 4).withColumn("old", F.lit("z")),
            "t",
            merge_schema=True,
        )


def test_merge_schema_noop_when_schema_matches(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_k(spark, 0, 3), "t")
    cat.append(_k(spark, 3, 5), "t", merge_schema=True)
    assert cat.read(spark, "t").count() == 5
    assert cat.load_table("t").spark_schema.fieldNames() == ["k"]


# ----------------------------------------------------------------------
# SHOW PARTITIONS
# ----------------------------------------------------------------------


def test_show_partitions_identity(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, None)], "k long, part string"
    )
    cat.create_table("t", df.schema, partition_by=["part"])
    cat.append(df, "t")
    out = [
        r["partition"]
        for r in cat.sql(spark, "SHOW PARTITIONS t").collect()
    ]
    assert out == [
        "part=__HIVE_DEFAULT_PARTITION__",
        "part=a",
        "part=b",
    ]


def test_show_partitions_hidden_transform(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 5)),
            (2, dt.datetime(2024, 1, 2, 6)),
            (3, dt.datetime(2024, 1, 1, 9)),
        ],
        "k long, ts timestamp",
    )
    cat.create_table("t", df.schema, partition_by=["day(ts)"])
    cat.append(df, "t")
    out = [
        r["partition"]
        for r in cat.sql(spark, "SHOW PARTITIONS t").collect()
    ]
    assert out == ["ts_day=2024-01-01", "ts_day=2024-01-02"]


def test_show_partitions_unpartitioned_raises(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_k(spark, 0, 2), "t")
    with pytest.raises(ValueError, match="not partitioned"):
        cat.sql(spark, "SHOW PARTITIONS t")


# ----------------------------------------------------------------------
# CALL create_changelog_view
# ----------------------------------------------------------------------


def test_changelog_view_span_and_columns(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        _k(spark, 0, 4).withColumn("v", F.col("k") * 2), "t"
    )
    base = cat.load_table("t").current_snapshot_id
    cat.append(_k(spark, 4, 6).withColumn("v", F.col("k") * 2), "t")
    cat.sql(
        spark,
        f"CALL create_changelog_view(table => 't', "
        f"start_snapshot_id => {base}, changelog_view => 'tcl')",
    )
    rows = spark.sql(
        "SELECT _change_type, _change_ordinal, _commit_snapshot_id, k "
        "FROM tcl ORDER BY k"
    ).collect()
    assert [r["k"] for r in rows] == [4, 5]
    assert {r["_change_type"] for r in rows} == {"INSERT"}
    snap = cat.load_table("t").snapshots[-1]
    assert all(r["_commit_snapshot_id"] == snap.snapshot_id for r in rows)


def test_changelog_view_updates_replay_as_delete_insert(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        _k(spark, 0, 4).withColumn("v", F.col("k") * 2), "t"
    )
    base = cat.load_table("t").current_snapshot_id
    upd = spark.createDataFrame([(1, 999)], "k long, v long")
    cat.merge_rows(upd, "t", key="k")
    cat.sql(
        spark,
        f"CALL create_changelog_view(table => 't', "
        f"start_snapshot_id => {base}, changelog_view => 'tcl2')",
    )
    got = {
        (r["_change_type"], r["k"], r["v"])
        for r in spark.sql("SELECT * FROM tcl2").collect()
    }
    assert got == {("DELETE", 1, 2), ("INSERT", 1, 999)}


def test_changelog_view_defaults_full_history_and_name(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_k(spark, 0, 3), "t")
    cat.append(_k(spark, 3, 5), "t")
    cat.sql(spark, "CALL create_changelog_view(table => 't')")
    rows = spark.sql(
        "SELECT _change_ordinal, COUNT(*) AS n FROM t_changes "
        "GROUP BY _change_ordinal ORDER BY _change_ordinal"
    ).collect()
    assert [(r["_change_ordinal"], r["n"]) for r in rows] == [
        (0, 3),
        (1, 2),
    ]


# ----------------------------------------------------------------------
# ANALYZE TABLE
# ----------------------------------------------------------------------


def test_analyze_table_stats_persist(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("v"),
    )
    cat.create_table_from_df(df, "t")
    out = cat.sql(
        spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS"
    ).collect()[0]
    assert out["num_rows"] == 100
    assert out["analyzed_columns"] == "k,grp,v"
    props = cat.load_table("t").properties
    assert props["stats.numRows"] == "100"
    assert props["stats.col.grp.ndv"] == "7"
    assert props["stats.col.v.nullCount"] == "10"
    # stamped with the snapshot it measured, so staleness is visible
    assert props["stats.analyzedSnapshot"] == str(
        cat.load_table("t").current_snapshot_id
    )


def test_analyze_table_column_subset_and_validation(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        ),
        "t",
    )
    out = cat.sql(
        spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS g"
    ).collect()[0]
    assert out["analyzed_columns"] == "g"
    props = cat.load_table("t").properties
    assert props["stats.col.g.ndv"] == "3"
    assert "stats.col.k.ndv" not in props
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql(
            spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS nope"
        )


def test_analyze_table_metadata_only_without_columns(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.range(50).select(F.col("id").alias("k")), "t"
    )
    out = cat.sql(
        spark, "ANALYZE TABLE t COMPUTE STATISTICS"
    ).collect()[0]
    assert out["num_rows"] == 50 and out["analyzed_columns"] == ""
    assert out["total_size"] > 0
