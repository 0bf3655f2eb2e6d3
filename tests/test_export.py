"""External-engine read path: DuckDB queries published tables directly."""

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate
from no_jvm_wap_with_iceberg_spark.catalog.export import (
    duckdb_view_sql,
    export_manifest,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _df(spark, lo, hi, name="x"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(name).alias("name"))


def test_duckdb_reads_published_table(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    cat.create_branch("dev")
    cat.append(_df(spark, 100, 130, name="dev-only"), "t", branch="dev")

    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t"))
    con.execute(duckdb_view_sql(cat, "t", branch="dev"))
    assert con.execute("SELECT COUNT(*) FROM t_main").fetchone()[0] == 100
    assert con.execute("SELECT COUNT(*) FROM t_dev").fetchone()[0] == 130
    # values, not just counts
    spark_sum = cat.read(spark, "t", "dev").agg(F.sum("id")).first()[0]
    duck_sum = con.execute("SELECT SUM(id) FROM t_dev").fetchone()[0]
    assert spark_sum == duck_sum


def test_duckdb_view_applies_mor_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 29), "id BETWEEN 0 AND 29", mode="mor"
    )
    cat.append(_df(spark, 0, 5, name="reborn"), "t")  # post-delete rows survive
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t", view_name="v"))
    assert con.execute("SELECT COUNT(*) FROM v").fetchone()[0] == 75
    assert (
        con.execute("SELECT COUNT(*) FROM v WHERE id < 30 AND name = 'x'").fetchone()[0]
        == 0
    )
    assert con.execute("SELECT COUNT(*) FROM v WHERE name = 'reborn'").fetchone()[0] == 5
    # cross-engine agreement with the Spark read path
    assert cat.read(spark, "t").count() == 75


def test_duckdb_view_time_travel(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m1 = cat.append(_df(spark, 0, 10), "t")
    cat.append(_df(spark, 10, 30), "t")
    con = duckdb.connect()
    con.execute(
        duckdb_view_sql(cat, "t", snapshot_id=m1.current_snapshot_id, view_name="v1")
    )
    con.execute(duckdb_view_sql(cat, "t", view_name="v2"))
    assert con.execute("SELECT COUNT(*) FROM v1").fetchone()[0] == 10
    assert con.execute("SELECT COUNT(*) FROM v2").fetchone()[0] == 30


def test_manifest_carries_plan_facts(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, sort_by=["id"])
    cat.append(_df(spark, 0, 50), "t")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 9), "id BETWEEN 0 AND 9", mode="mor"
    )
    m = export_manifest(cat, "t")
    assert m["schema"] == SCHEMA.jsonValue()
    assert m["sort_by"] == ["id"]
    assert m["total_rows_before_deletes"] == 50
    assert all(f["path"].startswith("/") for f in m["files"])
    assert any(f["delete_filters"] for f in m["files"])
    # stats present for pruning
    assert all("id" in f["column_stats"] for f in m["files"])
    ops = [s["operation"] for s in m["snapshots"]]
    assert ops == ["append", "delete"]


def test_duckdb_view_hive_partitioned_table(spark, warehouse):
    import duckdb

    cat = Catalog(warehouse)
    part_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("region", T.StringType()),
        ]
    )
    cat.create_table("p", part_schema, partition_by=["region"])
    cat.append(
        spark.createDataFrame(
            [(i, "east" if i % 2 else "west") for i in range(40)], part_schema
        ),
        "p",
    )
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "p", view_name="vp"))
    assert con.execute("SELECT COUNT(*) FROM vp").fetchone()[0] == 40
    assert (
        con.execute("SELECT COUNT(*) FROM vp WHERE region = 'east'").fetchone()[0]
        == 20
    )
    # partition column round-trips with values, matching Spark
    assert cat.read(spark, "p").filter("region = 'east'").count() == 20
