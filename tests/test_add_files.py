"""Iceberg's add_files procedure — zero-copy onboarding of existing
parquet: footer reads + one metadata commit, never a data rewrite.
External files are recorded under absolute paths, so warehouse
maintenance can never reclaim them and DROP TABLE leaves the source
directory untouched."""

import os

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _ext(spark, tmp_path, name="ext", n=10, files=2):
    p = str(tmp_path / name)
    spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(files).write.parquet(p)
    return p


def test_add_files_registers_without_rewrite(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    ext = _ext(spark, tmp_path)
    before = {
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(ext)
        for f in fs
    }
    r = cat.add_files(spark, "t", ext)
    assert r["files_added"] == 2 and r["rows_added"] == 10
    # zero data movement: source untouched, nothing under the
    # warehouse's own data dir
    after = {
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(ext)
        for f in fs
    }
    assert after == before
    assert not os.path.isdir(
        os.path.join(warehouse, "tables", "t", "data")
    )
    assert {
        (r["k"], r["v"]) for r in cat.read(spark, "t").collect()
    } == {(i, 2 * i) for i in range(10)}
    # footer stats flowed into the manifest: metadata-only count and
    # stats pruning both work on external files
    assert cat.row_count("t") == 10
    assert cat.read(spark, "t").filter("k >= 8").count() == 2


def test_add_files_duplicate_guard(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    ext = _ext(spark, tmp_path)
    cat.add_files(spark, "t", ext)
    with pytest.raises(ValueError, match="already registered"):
        cat.add_files(spark, "t", ext)
    r = cat.add_files(spark, "t", ext, check_duplicate_files=False)
    assert r == {
        "files_added": 0,
        "files_skipped": 2,
        "rows_added": 0,
        "snapshot_id": 1,
    }


def test_add_files_hive_partitions_autocreate(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    ext = str(tmp_path / "hive")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k long, p string"
    ).write.partitionBy("p").parquet(ext)
    out = cat.sql(
        spark,
        f"CALL add_files(table => 't', "
        f"source_table => '`parquet`.`{ext}`')",
    ).collect()[0]
    assert out["added_rows_count"] == 3
    assert {
        (r["k"], r["p"]) for r in cat.read(spark, "t").collect()
    } == {(1, "a"), (2, "a"), (3, "b")}
    assert [
        r["partition"]
        for r in cat.sql(spark, "SHOW PARTITIONS t").collect()
    ] == ["p=a", "p=b"]
    # partition pruning via the manifest values
    assert cat.read(spark, "t").filter("p = 'a'").count() == 2


def test_add_files_partition_mismatch_raises(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    ext = _ext(spark, tmp_path)  # flat files, no k=v segments
    df = spark.createDataFrame([(1, "a")], "k long, p string")
    cat.create_table("t", df.schema, partition_by=["p"])
    with pytest.raises(ValueError, match="partition"):
        cat.add_files(spark, "t", ext)


def test_maintenance_never_reclaims_external_files(
    spark, warehouse, tmp_path
):
    cat = Catalog(warehouse)
    ext = _ext(spark, tmp_path, files=4)
    cat.add_files(spark, "t", ext)
    want = {
        (r["k"], r["v"]) for r in cat.read(spark, "t").collect()
    }
    # compact pulls the data INTO the warehouse; the external originals
    # are now unreferenced — and must still not be deleted (they are
    # outside every swept table directory)
    cat.compact(spark, "t")
    cat.expire_snapshots("t", keep_last=1)
    cat.remove_orphan_files("t", dry_run=False, older_than_ms=0)
    assert {
        (r["k"], r["v"]) for r in spark.read.parquet(ext).collect()
    } == want
    assert {
        (r["k"], r["v"]) for r in cat.read(spark, "t").collect()
    } == want
    # dropping the table leaves the source directory intact
    cat.drop_table("t")
    assert spark.read.parquet(ext).count() == len(want)


def test_add_files_refuses_warehouse_internal_sources(
    spark, warehouse, tmp_path
):
    cat = Catalog(warehouse)
    ext = _ext(spark, tmp_path)
    cat.add_files(spark, "t", ext)
    inner = os.path.join(warehouse, "tables", "t")
    with pytest.raises(ValueError, match="outside the warehouse"):
        cat.add_files(spark, "t2", warehouse)
    with pytest.raises(ValueError, match="outside the warehouse"):
        cat.add_files(spark, "t2", inner)
