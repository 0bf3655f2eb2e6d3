"""Column DEFAULT values (Iceberg v3 initial/write defaults).

``add_column(..., default=<SQL literal>)``: rows in files written
BEFORE the column existed read as the literal — genuine NULLs written
after stay NULL, because presence is decided per FILE from the
manifest's physical footer columns, never by coalescing values. The
writer may omit the column (the write fills the default). The
reference has no schema evolution at all
(``pyiceberg_patch_nessie.py:230-264``).
"""

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _seed(cat, spark, n=6, table="t"):
    cat.create_table(table, SCHEMA)
    cat.append(
        spark.range(n).select(F.col("id"), F.lit("x").alias("name")).coalesce(1),
        table,
    )


def test_old_files_read_default_new_nulls_stay_null(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.add_column("t", "region", "string", default="'eu'")
    # post-add append with an EXPLICIT NULL region for id 100
    post = spark.createDataFrame(
        [(100, "y", None), (101, "y", "us")],
        "id long, name string, region string",
    ).coalesce(1)
    cat.append(post, "t")
    out = {r.id: r.region for r in cat.read(spark, "t").collect()}
    assert out[0] == "eu" and out[5] == "eu"  # pre-add rows: default
    assert out[100] is None  # genuine NULL survives
    assert out[101] == "us"


def test_writer_may_omit_defaulted_column(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.add_column("t", "score", "bigint", default="7")
    cat.append(
        spark.range(50, 52)
        .select(F.col("id"), F.lit("z").alias("name"))
        .coalesce(1),
        "t",
    )
    out = {r.id: r.score for r in cat.read(spark, "t").collect()}
    assert out[50] == 7 and out[51] == 7
    assert out[0] == 7  # pre-add default too
    # a column WITHOUT a default still refuses omission
    cat.add_column("t", "strict_col", "bigint")
    with pytest.raises(ValueError, match="missing columns"):
        cat.append(
            spark.range(60, 61)
            .select(F.col("id"), F.lit("z").alias("name"))
            .coalesce(1),
            "t",
        )


def test_alter_sql_add_column_default(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "ALTER TABLE t ADD COLUMN prio bigint DEFAULT 3")
    got = cat.sql(
        spark, "SELECT CAST(SUM(prio) AS BIGINT) AS s FROM t"
    ).collect()[0]["s"]
    assert got == 3 * 6


def test_rename_moves_and_drop_removes_default(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.add_column("t", "region", "string", default="'eu'")
    cat.rename_column("t", "region", "zone")
    assert cat.load_table("t").column_defaults == {"zone": "'eu'"}
    assert {r.zone for r in cat.read(spark, "t").collect()} == {"eu"}
    cat.drop_column("t", "zone")
    assert cat.load_table("t").column_defaults == {}


def test_default_rejects_expressions_and_null(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    with pytest.raises(ValueError, match="literal"):
        cat.add_column("t", "bad", "bigint", default="id + 1")
    with pytest.raises(ValueError, match="NULL default"):
        cat.add_column("t", "bad", "bigint", default="NULL")


def test_default_with_mor_delete_and_predicates(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, n=20)
    cat.add_column("t", "region", "string", default="'eu'")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 4), "id BETWEEN 0 AND 4",
        mode="mor",
    )
    out = cat.read(spark, "t")
    assert out.count() == 15
    assert out.filter("region = 'eu'").count() == 15
    pruned = cat.read(spark, "t", predicates=[Predicate("ge", "id", 10)])
    assert pruned.filter("id >= 10").filter("region = 'eu'").count() == 10


def test_default_on_identity_partitioned_table(spark, warehouse):
    cat = Catalog(warehouse)
    schema = T.StructType(
        [
            T.StructField("part", T.StringType()),
            T.StructField("id", T.LongType()),
        ]
    )
    cat.create_table("t", schema, partition_by=["part"])
    cat.append(
        spark.createDataFrame([("a", 1), ("b", 2)], schema), "t"
    )
    cat.add_column("t", "v", "bigint", default="9")
    cat.append(
        spark.createDataFrame(
            [("a", 3, None)], "part string, id long, v long"
        ),
        "t",
    )
    out = {r.id: r.v for r in cat.read(spark, "t").collect()}
    assert out == {1: 9, 2: 9, 3: None}


def test_compact_materializes_defaults(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.add_column("t", "region", "string", default="'eu'")
    cat.compact(spark, "t")
    # post-compact every file physically carries the column
    meta = cat.load_table("t")
    assert all(
        any(k == "region" for k in f.columns) for f in meta.files()
    )
    assert {r.region for r in cat.read(spark, "t").collect()} == {"eu"}


def test_duckdb_export_matches_spark_defaults(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.add_column("t", "region", "string", default="'eu'")
    cat.append(
        spark.createDataFrame(
            [(100, "y", None), (101, "y", "us")],
            "id long, name string, region string",
        ).coalesce(1),
        "t",
    )
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t"))
    got = {
        r[0]: r[1]
        for r in con.execute("SELECT id, region FROM t_main").fetchall()
    }
    want = {r.id: r.region for r in cat.read(spark, "t").collect()}
    assert got == want
    assert got[0] == "eu" and got[100] is None and got[101] == "us"
