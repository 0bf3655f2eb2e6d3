"""Z-order clustering: multi-column data skipping on the file layout.

A sort_by layout only skips files for predicates on the FIRST sort
key; the Morton-curve rewrite (catalog/zorder.py) makes footer min/max
stats prune files on ANY clustered column — the Delta OPTIMIZE ZORDER
BY / Iceberg z-order rewrite_data_files layout, rebuilt on plain
DataFrame ops (one bounds aggregate + one range shuffle, no UDF).
"""

import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import (
    Catalog,
    Predicate,
    prune_files,
    zorder_key,
    zorder_key_py,
)
from no_jvm_wap_with_iceberg_spark.catalog.zorder import (
    bits_per_column,
    column_bounds,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def _grid(spark, side=100):
    """side x side grid: x and y are independent, uniformly spread."""
    return spark.range(side * side).select(
        F.col("id"),
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )


def test_zorder_key_matches_python_reference(spark):
    df = _grid(spark, side=16)
    cols = ["x", "y"]
    bounds = column_bounds(df, cols)
    got = (
        df.withColumn("_z", zorder_key(cols, bounds))
        .select("x", "y", "_z")
        .collect()
    )
    for r in got:
        expect = zorder_key_py({"x": float(r.x), "y": float(r.y)}, bounds, cols)
        assert r._z == expect, (r.x, r.y)


def test_zorder_key_interleaves_fairly(spark):
    # neither column dominates: restricting either column to a narrow
    # band restricts the key to a proportionally narrow set of values
    df = _grid(spark, side=64)
    cols = ["x", "y"]
    bounds = column_bounds(df, cols)
    keyed = df.withColumn("_z", zorder_key(cols, bounds))
    full = keyed.agg(F.max("_z") - F.min("_z")).collect()[0][0]
    for c in cols:
        band = keyed.filter(F.col(c) < 8)  # 1/8 of the domain
        spread = band.agg(F.max("_z") - F.min("_z")).collect()[0][0]
        # a z-curve band on one of two dims covers <= ~1/8 of key space
        # per contiguous run; its total spread stays well under full
        assert spread < full, c


def test_zorder_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 7), (2, 5, 7), (3, 9, 7)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("x", T.LongType()),
                T.StructField("y", T.LongType()),  # constant
            ]
        ),
    )
    bounds = column_bounds(df, ["x", "y"])
    rows = df.withColumn("_z", zorder_key(["x", "y"], bounds)).collect()
    by_id = {r.id: r._z for r in rows}
    assert by_id[1] == 0  # NULL -> bucket 0
    assert by_id[2] < by_id[3]  # ordering preserved on the live column


def test_bits_per_column_caps_key_width():
    assert bits_per_column(1) == 16
    assert bits_per_column(2) == 16
    assert bits_per_column(4) == 15  # 63 // 4
    assert bits_per_column(8) == 7
    with pytest.raises(ValueError):
        bits_per_column(0)


def test_zorder_rewrite_prunes_on_both_columns(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("grid", SCHEMA)
    cat.append(_grid(spark), "grid")

    meta = cat.zorder(spark, "grid", ["x", "y"], min_files=16)
    files = meta.files()
    assert len(files) >= 8  # min_files forced a real multi-file layout

    # data unchanged by the rewrite
    assert cat.row_count("grid") == 100 * 100
    got = cat.read(spark, "grid").agg(
        F.sum("id"), F.sum("x"), F.sum("y")
    ).collect()[0]
    assert list(got) == [
        sum(range(100 * 100)),
        100 * sum(range(100)),
        100 * sum(range(100)),
    ]

    # footer stats now skip files for predicates on EITHER column
    for col in ("x", "y"):
        kept = prune_files(files, [Predicate.eq(col, 3)])
        assert len(kept) <= len(files) // 2, (col, len(kept), len(files))

    # and reads through the pruning path stay correct
    df = cat.read(spark, "grid", predicates=[Predicate.eq("y", 3)])
    assert df.filter(F.col("y") == 3).count() == 100


def test_sort_by_layout_only_prunes_first_key(spark, warehouse):
    """The contrast that motivates zorder: a sort_by=[x] layout gives
    every file the full y range, so y predicates prune nothing."""
    cat = Catalog(warehouse)
    cat.create_table("sorted_grid", SCHEMA, sort_by=["x"])
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")  # tiny test batch: keep 4 range files
    try:
        cat.append(_grid(spark), "sorted_grid")
    finally:
        spark.conf.set(key, prev)
    files = cat.load_table("sorted_grid").files()
    assert len(files) >= 2
    assert len(prune_files(files, [Predicate.eq("x", 3)])) < len(files)
    assert len(prune_files(files, [Predicate.eq("y", 3)])) == len(files)


def test_compact_preserves_zorder_layout(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("grid", SCHEMA)
    cat.append(_grid(spark), "grid")
    cat.zorder(spark, "grid", ["x", "y"], min_files=16)
    # post-zorder appends arrive unclustered...
    cat.append(_grid(spark).withColumn("id", F.col("id") + 100 * 100), "grid")

    meta = cat.compact(spark, "grid", target_file_mb=1, min_files=8)
    assert meta.properties.get("zorder_by") == "x,y"
    assert cat.row_count("grid") == 2 * 100 * 100
    files = meta.files()
    assert len(files) >= 4  # min_files forced a real multi-file layout
    for col in ("x", "y"):
        kept = prune_files(files, [Predicate.eq(col, 3)])
        assert len(kept) < len(files), col


def test_compact_preserves_sort_by_range_layout(spark, warehouse):
    """Compaction on a sort_by table must range-repartition, not
    round-robin: otherwise every compacted file spans the full key
    range and point-predicate pruning silently dies (ADVICE r2)."""
    cat = Catalog(warehouse)
    cat.create_table("sorted_grid", SCHEMA, sort_by=["x"])
    cat.append(_grid(spark), "sorted_grid")
    cat.append(_grid(spark).withColumn("id", F.col("id") + 100 * 100), "sorted_grid")

    meta = cat.compact(spark, "sorted_grid", target_file_mb=1, min_files=8)
    files = meta.files()
    assert len(files) >= 4
    assert cat.row_count("sorted_grid") == 2 * 100 * 100
    # disjoint x ranges: an x point predicate prunes to O(1) files
    kept = prune_files(files, [Predicate.eq("x", 3)])
    assert len(kept) <= max(1, len(files) // 4), (len(kept), len(files))
    # and the pruned read stays correct
    df = cat.read(spark, "sorted_grid", predicates=[Predicate.eq("x", 3)])
    assert df.filter(F.col("x") == 3).count() == 2 * 100


def test_compact_ignores_stale_zorder_property(spark, warehouse):
    """A zorder_by naming columns that no longer exist must not wedge
    compaction forever (ADVICE r2): cluster on surviving columns, or
    fall back to sort_by."""
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, sort_by=["x"])
    cat.append(_grid(spark), "t")
    # a legacy/external writer left zorder_by naming a column this
    # schema does not have
    cat.set_properties("t", zorder_by="x,gone_col")
    meta = cat.compact(spark, "t", target_file_mb=1, min_files=4)
    assert cat.row_count("t") == 100 * 100
    files = meta.files()
    # clustering used the surviving column; x still prunes
    kept = prune_files(files, [Predicate.eq("x", 3)])
    assert len(kept) < len(files)
    # a fully-stale property (no surviving columns) falls back to
    # sort_by instead of raising, and can be cleared via the API
    cat.set_properties("t", zorder_by="gone_col")
    cat.compact(spark, "t", target_file_mb=1, min_files=4)
    cat.set_properties("t", zorder_by=None)
    assert "zorder_by" not in cat.load_table("t").properties


# ----------------------------------------------------------------------
# binpack compaction (Iceberg rewrite_data_files strategy=binpack)
# ----------------------------------------------------------------------
def test_binpack_rewrites_only_small_and_deleted(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(warehouse)
    cat.create_table("t", schema)
    # one big file (incompressible values so it clears the MB-floor
    # threshold), several small micro-batch files
    cat.append(
        spark.range(0, 200000).select(
            F.col("id"), F.xxhash64(F.col("id")).alias("v")
        ).coalesce(1),
        "t",
    )
    big_path = cat.load_table("t").files()[0].path
    for lo in (200000, 200010, 200020):
        cat.append(
            spark.range(lo, lo + 10).select(
                F.col("id"), F.xxhash64(F.col("id")).alias("v")
            ).coalesce(1),
            "t",
        )
    meta0 = cat.load_table("t")
    assert len(meta0.files()) == 4
    big_bytes = next(f.bytes for f in meta0.files() if f.path == big_path)
    assert big_bytes > 1024 * 1024  # must clear the 0.75*target floor

    # threshold below the big file: binpack must carry it byte-identical
    target_mb = max(1, int(big_bytes / (1024 * 1024 * 0.75)))
    meta = cat.compact(spark, "t", target_file_mb=target_mb, mode="binpack")
    paths = {f.path for f in meta.files()}
    assert big_path in paths  # carried, not rewritten
    assert len(paths) == 2  # big + one packed file
    assert meta.snapshots[-1].operation == "rewrite"
    assert cat.read(spark, "t").count() == 200030
    # a second binpack is a no-op (one small packed file left, clean)
    v0 = cat.load_table("t").current_snapshot_id
    cat.compact(spark, "t", target_file_mb=target_mb, mode="binpack")
    assert cat.load_table("t").current_snapshot_id == v0


def test_binpack_folds_pending_deletes_on_targeted_files(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(warehouse)
    cat.create_table("t", schema)
    cat.append(
        spark.range(0, 100).select(F.col("id"), F.col("id").alias("v")).coalesce(1),
        "t",
    )
    cat.append(
        spark.range(100, 200).select(F.col("id"), F.col("id").alias("v")).coalesce(1),
        "t",
    )
    cat.delete_where(
        spark, "t", Predicate.between("id", 10, 19), "id BETWEEN 10 AND 19",
        mode="mor",
    )
    meta = cat.compact(spark, "t", mode="binpack")
    # the pending delete folded into the rewrite and no spec applies
    # to any live file anymore
    assert not meta.has_pending_deletes()
    out = cat.read(spark, "t")
    assert out.count() == 190
    assert out.filter("id BETWEEN 10 AND 19").count() == 0
    # re-inserting the deleted ids works (delete must not re-apply)
    cat.append(
        spark.range(10, 20).select(F.col("id"), F.lit(-1).alias("v")).coalesce(1),
        "t",
    )
    assert cat.read(spark, "t").count() == 200
