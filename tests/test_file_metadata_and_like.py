"""_file metadata column on reads (Iceberg parity) and
CREATE TABLE ... LIKE (Spark verb: schema+layout+properties, no data).
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def test_file_column_matches_manifest(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([(1, "a")], "id INT, s STRING"), "t"
    )
    cat.append(spark.createDataFrame([(2, "b")], "id INT, s STRING"), "t")
    out = cat.read(spark, "t", with_metadata=True)
    assert "_file" in out.columns
    got = {r.id: r._file for r in out.collect()}
    manifest = {f.path for f in cat.load_table("t").files()}
    assert set(got.values()) <= manifest
    assert got[1] != got[2]  # two appends -> two files
    # default read stays clean
    assert "_file" not in cat.read(spark, "t").columns


def test_file_column_survives_mor_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([(i, f"v{i}") for i in range(6)],
                              "id INT, s STRING"),
        "t",
    )
    cat.delete_where(spark, "t", [], "id < 2", mode="mor")
    out = cat.read(spark, "t", with_metadata=True)
    rows = {r.id for r in out.collect()}
    assert rows == {2, 3, 4, 5}
    assert all(r._file is not None for r in out.collect())


def test_file_column_on_partitioned_table(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame(
            [(i, f"g{i % 2}") for i in range(8)], "id INT, g STRING"
        ),
        "t",
        partition_by=["g"],
    )
    out = cat.read(spark, "t", with_metadata=True).collect()
    for r in out:
        assert f"g={r.g}" in r._file  # hive dir encodes the partition


def test_create_table_like(spark, warehouse):
    cat = Catalog(warehouse)
    cat.sql(
        spark,
        "CREATE TABLE src (id INT, ts TIMESTAMP, v DOUBLE "
        "GENERATED ALWAYS AS (id * 2.0)) "
        "PARTITIONED BY (day(ts)) TBLPROPERTIES ('owner' = 'me')",
    )
    cat.sql(spark, "CREATE TABLE dst LIKE src")
    src, dst = cat.load_table("src"), cat.load_table("dst")
    assert dst.spark_schema == src.spark_schema
    assert dst.partition_by == src.partition_by
    assert dst.properties.get("owner") == "me"
    assert dst.properties.get("generated.v") == "id * 2.0"
    assert dst.row_count() == 0
    # IF NOT EXISTS is a no-op on the second run
    cat.sql(spark, "CREATE TABLE IF NOT EXISTS dst LIKE src")
