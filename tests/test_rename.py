"""Column RENAME: metadata-only, name-mapped via rename history.

The format maps columns by name (no Iceberg field ids), so
``rename_column`` records an ``old -> new`` pair and the read path
scans both names and coalesces — one scan for any mix of pre/ and
post-rename files. These tests pin the semantics: mixed-era reads,
chained renames, zombie-name guards, stats/bloom pruning fallback,
CDC replay across a rename, DuckDB export of mixed-era file sets,
and compaction retiring the indirection.
"""

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate
from no_jvm_wap_with_iceberg_spark.catalog.pruning import prune_files


def _mk(spark, warehouse, rows=None, name="t"):
    cat = Catalog(warehouse)
    rows = rows or [(i, f"v{i}", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    cat.create_table_from_df(df, name)
    return cat


def test_rename_basic_read(spark, warehouse):
    cat = _mk(spark, warehouse)
    cat.rename_column("t", "name", "title")
    out = cat.read(spark, "t")
    assert out.columns == ["id", "title", "score"]
    got = {(r.id, r.title) for r in out.collect()}
    assert got == {(i, f"v{i}") for i in range(10)}


def test_rename_mixed_eras_and_nulls(spark, warehouse):
    cat = _mk(
        spark,
        warehouse,
        rows=[(0, "a", 1.0), (1, None, 2.0)],  # NULL survives coalesce
    )
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame(
            [(2, "c", 3.0), (3, None, 4.0)], "id long, title string, score double"
        ),
        "t",
    )
    got = {(r.id, r.title) for r in cat.read(spark, "t").collect()}
    assert got == {(0, "a"), (1, None), (2, "c"), (3, None)}


def test_rename_chained(spark, warehouse):
    cat = _mk(spark, warehouse)
    cat.rename_column("t", "name", "label")
    cat.append(
        spark.createDataFrame(
            [(100, "mid", 0.0)], "id long, label string, score double"
        ),
        "t",
    )
    cat.rename_column("t", "label", "title")
    meta = cat.load_table("t")
    assert meta.rename_history == {"title": ["label", "name"]}
    got = {(r.id, r.title) for r in cat.read(spark, "t").collect()}
    assert got == {(i, f"v{i}") for i in range(10)} | {(100, "mid")}


def test_rename_guards(spark, warehouse):
    cat = _mk(spark, warehouse)
    with pytest.raises(KeyError):
        cat.rename_column("t", "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_column("t", "name", "score")
    with pytest.raises(ValueError, match="invalid column name"):
        cat.rename_column("t", "name", "bad name")
    cat.rename_column("t", "name", "title")
    # the old name is barred from reuse forever (files still carry it)
    with pytest.raises(ValueError, match="previously dropped"):
        cat.add_column("t", "name", "string")
    with pytest.raises(ValueError, match="previously dropped"):
        cat.rename_column("t", "score", "name")


def test_rename_sort_key_refused(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    cat.create_table_from_df(df, "s", sort_by=["id"])
    with pytest.raises(ValueError, match="partition/sort/z-order"):
        cat.rename_column("s", "id", "pk")


def test_rename_partition_source_refused(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, bucket string"
    )
    cat.create_table_from_df(df, "p", partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition/sort/z-order"):
        cat.rename_column("p", "bucket", "shard")
    # non-partition columns still rename fine on a partitioned table
    cat.rename_column("p", "id", "pk")
    got = {(r.pk, r.bucket) for r in cat.read(spark, "p").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_rename_pending_mor_delete_refused(spark, warehouse):
    cat = _mk(spark, warehouse)
    cat.delete_where(
        spark, "t", [Predicate("lt", "id", 2)], "id < 2", mode="mor"
    )
    with pytest.raises(ValueError, match="pending merge-on-read"):
        cat.rename_column("t", "id", "pk")
    # an untouched column still renames with deletes pending
    cat.rename_column("t", "name", "title")
    got = {r.id for r in cat.read(spark, "t").collect()}
    assert got == set(range(2, 10))


def test_rename_stats_pruning_falls_back(spark, warehouse):
    cat = Catalog(warehouse)
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, float(i)) for i in range(10)], "id long, v double"
        ).coalesce(1)
        if lo == 0:
            cat.create_table_from_df(df, "t")
        else:
            cat.append(df, "t")
    cat.rename_column("t", "id", "pk")
    meta = cat.load_table("t")
    files = meta.files()
    assert len(files) == 3
    # old-era files keep stats under 'id'; predicate names 'pk'
    pruned = prune_files(
        files,
        [Predicate("ge", "pk", 200)],
        name_history=meta.rename_history,
    )
    assert len(pruned) == 1
    # without the history the lookup misses and nothing prunes —
    # the conservative (sound) fallback
    assert len(prune_files(files, [Predicate("ge", "pk", 200)])) == 3
    # end-to-end: the read-path hint prunes and values are right
    got = {
        r.pk
        for r in cat.read(
            spark, "t", predicates=[Predicate("ge", "pk", 200)]
        )
        .filter(F.col("pk") >= 200)
        .collect()
    }
    assert got == {200 + i for i in range(10)}


def test_rename_then_mor_delete_and_merge(spark, warehouse):
    cat = _mk(spark, warehouse)
    cat.rename_column("t", "id", "pk")
    cat.delete_where(
        spark, "t", [Predicate("ge", "pk", 8)], "pk >= 8", mode="mor"
    )
    assert {r.pk for r in cat.read(spark, "t").collect()} == set(range(8))
    cat.rename_column("t", "name", "title")
    cdc = spark.createDataFrame(
        [(0, "zero", 0.5, False), (50, "fifty", 5.0, False), (3, "x", 0.0, True)],
        "pk long, title string, score double, _del boolean",
    )
    cat.merge_rows(cdc, "t", key="pk", delete_col="_del")
    got = {(r.pk, r.title, r.score) for r in cat.read(spark, "t").collect()}
    expect = {(i, f"v{i}", float(i)) for i in range(8) if i not in (0, 3)} | {
        (0, "zero", 0.5),
        (50, "fifty", 5.0),
    }
    assert got == expect


def test_rename_compact_retires_indirection(spark, warehouse):
    cat = _mk(spark, warehouse)
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame(
            [(10, "ten", 10.0)], "id long, title string, score double"
        ),
        "t",
    )
    cat.compact(spark, "t", min_files=1)
    meta = cat.load_table("t")
    carried = {k.split(".")[0] for f in meta.files() for k in f.columns}
    assert "name" not in carried and "title" in carried
    got = {(r.id, r.title) for r in cat.read(spark, "t").collect()}
    assert got == {(i, f"v{i}") for i in range(10)} | {(10, "ten")}


def test_rename_time_travel_uses_current_schema(spark, warehouse):
    cat = _mk(spark, warehouse)
    m1 = cat.load_table("t")
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame(
            [(10, "ten", 10.0)], "id long, title string, score double"
        ),
        "t",
    )
    old = cat.read(spark, "t", snapshot_id=m1.current_snapshot_id)
    # Iceberg semantics: schema follows the TABLE, not the snapshot
    assert old.columns == ["id", "title", "score"]
    assert old.count() == 10


def test_rename_null_count_falls_back(spark, warehouse):
    cat = _mk(spark, warehouse, rows=[(0, None, 1.0), (1, "b", 2.0)])
    assert cat.null_count("t", "name") == 1
    cat.rename_column("t", "name", "title")
    assert cat.null_count("t", "title") == 1


def test_rename_cdc_replay_across_rename(spark, warehouse):
    cat = _mk(spark, warehouse)
    m0 = cat.load_table("t")
    cat.update_where(
        spark, "t", [Predicate("lt", "id", 3)], "id < 3", {"name": "upper(name)"}
    )
    cat.rename_column("t", "name", "title")
    feed = cat.read_changes(spark, "t", from_snapshot_id=m0.current_snapshot_id)
    assert set(feed.columns) == {"id", "title", "score", "_change_type", "_snapshot_id"}
    rows = {(r._change_type, r.id, r.title) for r in feed.collect()}
    assert rows == {("delete", i, f"v{i}") for i in range(3)} | {
        ("insert", i, f"V{i}") for i in range(3)
    }


def test_rename_duckdb_export_mixed_eras(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = _mk(spark, warehouse)
    cat.rename_column("t", "name", "title")
    cat.append(
        spark.createDataFrame(
            [(10, "ten", 10.0)], "id long, title string, score double"
        ),
        "t",
    )
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t"))
    got = set(con.execute("SELECT id, title FROM t_main").fetchall())
    assert got == {(i, f"v{i}") for i in range(10)} | {(10, "ten")}


def test_export_survives_add_and_drop(spark, warehouse):
    """Schema-era-aware export: add_column then append (mixed file
    schemas in one view) and drop_column (files carrying an extra
    column) both read back correctly from plain DuckDB."""
    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = _mk(spark, warehouse)
    cat.add_column("t", "note", "string")
    cat.append(
        spark.createDataFrame(
            [(10, "ten", 10.0, "n1")],
            "id long, name string, score double, note string",
        ),
        "t",
    )
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "t", view_name="v1"))
    got = set(con.execute("SELECT id, note FROM v1").fetchall())
    assert got == {(i, None) for i in range(10)} | {(10, "n1")}
    cat.drop_column("t", "score")
    con.execute(duckdb_view_sql(cat, "t", view_name="v2"))
    cols = [d[0] for d in con.execute("SELECT * FROM v2 LIMIT 1").description]
    assert cols == ["id", "name", "note"]
    assert con.execute("SELECT COUNT(*) FROM v2").fetchone()[0] == 11


def test_set_sort_order_evolves_then_rename(spark, warehouse):
    """Sort-order evolution: new writes cluster on the new key, compact
    re-clusters old files, and a former sort key becomes renameable."""
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(i, (i * 37) % 1000, float(i)) for i in range(4000)],
        "a long, b long, v double",
    )
    cat.create_table_from_df(df, "t", sort_by=["a"])
    with pytest.raises(ValueError, match="partition/sort/z-order"):
        cat.rename_column("t", "a", "a2")

    with pytest.raises(KeyError):
        cat.set_sort_order("t", ["nope"])
    cat.set_sort_order("t", ["b"])
    assert cat.load_table("t").sort_by == ["b"]

    # compact under the new order: files become disjoint in b, so a
    # range predicate on b prunes
    cat.compact(spark, "t", target_file_mb=1, min_files=4)
    meta = cat.load_table("t")
    files = meta.files()
    assert len(files) >= 4  # forced multi-file so the prune check bites
    pruned = prune_files(files, [Predicate("ge", "b", 990)])
    assert len(pruned) < len(files)
    # the former sort key is now renameable; reads still correct
    cat.rename_column("t", "a", "a2")
    got = cat.read(spark, "t").agg(
        F.count(F.lit(1)).alias("n"), F.sum("a2").alias("s")
    ).first()
    assert (got.n, got.s) == (4000, sum(range(4000)))
