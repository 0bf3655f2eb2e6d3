"""Type widening (Iceberg's safe promotions), metadata-only.

Each promotion is locked against a REAL mixed-width table: files
written at the narrow type must read back through the widened schema
(Spark's parquet upcast), new appends land wide, stats pruning and
bucket-partition pruning keep working across the width change.
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate


def test_int_to_long_mixed_files(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame([(1, 5), (2, 6)], "id INT, v INT")
    cat.create_table_from_df(df, "t")
    cat.widen_column("t", "v", "BIGINT")
    cat.append(
        spark.createDataFrame([(3, 2**40)], "id INT, v BIGINT"), "t"
    )
    out = cat.read(spark, "t")
    assert dict(out.dtypes)["v"] == "bigint"
    assert {r.v for r in out.collect()} == {5, 6, 2**40}


def test_float_to_double_and_decimal_precision(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame([(1.5,)], "f FLOAT").selectExpr(
        "f", "CAST(1.25 AS DECIMAL(10,2)) AS d"
    )
    cat.create_table_from_df(df, "t")
    cat.widen_column("t", "f", "DOUBLE")
    cat.widen_column("t", "d", "DECIMAL(18,2)")
    out = cat.read(spark, "t")
    types = dict(out.dtypes)
    assert types == {"f": "double", "d": "decimal(18,2)"}
    row = out.collect()[0]
    assert row.f == 1.5 and str(row.d) == "1.25"


def test_unsafe_promotions_raise(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(1, 1.5, "x")], "i BIGINT, f DOUBLE, s STRING"
    )
    cat.create_table_from_df(df, "t")
    with pytest.raises(ValueError, match="safe promotions"):
        cat.widen_column("t", "i", "INT")  # narrowing
    with pytest.raises(ValueError, match="safe promotions"):
        cat.widen_column("t", "f", "FLOAT")  # narrowing
    with pytest.raises(ValueError, match="safe promotions"):
        cat.widen_column("t", "s", "BIGINT")  # cross-family
    with pytest.raises(ValueError, match="already has type"):
        cat.widen_column("t", "i", "BIGINT")


def test_decimal_scale_change_raises(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame([("1.25",)], "x STRING").selectExpr(
        "CAST(x AS DECIMAL(10,2)) AS d"
    )
    cat.create_table_from_df(df, "t")
    with pytest.raises(ValueError, match="safe promotions"):
        cat.widen_column("t", "d", "DECIMAL(18,4)")


def test_sql_spelling_and_stats_pruning_across_widths(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([(i, i) for i in range(10)], "id INT, v INT"),
        "t",
    )
    cat.sql(spark, "ALTER TABLE t ALTER COLUMN v TYPE BIGINT")
    cat.append(
        spark.createDataFrame(
            [(100 + i, 10**10 + i) for i in range(10)], "id INT, v BIGINT"
        ),
        "t",
    )
    # stats pruning with a long literal must keep the narrow file's
    # rows visible (ints and longs compare numerically in _norm space)
    out = cat.read(spark, "t", predicates=[Predicate("le", "v", 5)])
    assert out.filter(F.col("v") <= 5).count() == 6
    # and a DELETE through the front door still proves/prunes cleanly
    cat.sql(spark, "DELETE FROM t WHERE v >= 10000000000")
    assert cat.read(spark, "t").count() == 10


def test_widen_bucket_partition_source_keeps_pruning(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(40)],
        "id INT, k INT, v DOUBLE",
    )
    cat.create_table_from_df(df, "t", partition_by=["bucket(4, k)"])
    cat.widen_column("t", "k", "BIGINT")
    cat.append(
        spark.createDataFrame(
            [(100, 3, 100.0)], "id INT, k BIGINT, v DOUBLE"
        ),
        "t",
    )
    # bucket(str(v)) is width-independent: pre-widening files for k=3
    # and the new long row both match the probe
    out = cat.read(spark, "t", predicates=[Predicate("eq", "k", 3)])
    got = {r.id for r in out.filter(F.col("k") == 3).collect()}
    assert got == {3, 10, 17, 24, 31, 38, 100}


def test_export_survives_mixed_width_files(spark, warehouse):
    # a widened table holds files of BOTH physical widths: the DuckDB
    # export must take the union_by_name path and CAST to the table
    # type (a plain read_parquet refuses the mix)
    import duckdb

    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([(1, 5)], "id INT, v INT"), "t"
    )
    cat.widen_column("t", "v", "BIGINT")
    cat.append(
        spark.createDataFrame([(2, 2**40)], "id INT, v BIGINT"), "t"
    )
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t", view_name="t_v"))
    got = con.execute("SELECT v FROM t_v ORDER BY v").fetchall()
    assert [r[0] for r in got] == [5, 2**40]
    (vtype,) = con.execute(
        "SELECT data_type FROM duckdb_columns() "
        "WHERE table_name = 't_v' AND column_name = 'v'"
    ).fetchone()
    assert vtype == "BIGINT"
