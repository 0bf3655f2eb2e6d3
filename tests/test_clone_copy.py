"""SHALLOW/DEEP CLONE, COPY INTO, and the table_changes() TVF —
the Delta-parity verbs round 6 added (the reference's catalog has no
table-management verbs at all, pyiceberg_patch_nessie.py:230-264).

The load-bearing guarantees locked here:
- a shallow clone copies ZERO data files and still reads bit-identical,
  at head or at a pinned version, including pending merge-on-read state;
- vacuum (remove_orphan_files) on the SOURCE can never reclaim a file a
  clone still references — stronger than Delta, where that is a
  documented footgun;
- COPY INTO is exactly-once per file path, its ledger commits atomically
  with the rows, and it SURVIVES expire_snapshots' history squash;
- table_changes(...) is usable anywhere a table reference is and
  carries Delta's CDF column contract.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _df(spark, lo, hi, mul=2):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * mul).alias("v")
    )


def _state(cat, spark, t, **kw):
    return {
        (r["k"], r["v"]) for r in cat.read(spark, t, **kw).collect()
    }


def _data_files_on_disk(warehouse, table):
    root = os.path.join(warehouse, "tables", table, "data")
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet")
        ]
    return out


# ----------------------------------------------------------------------
# shallow clone
# ----------------------------------------------------------------------


def test_shallow_clone_zero_copy_and_bit_identical(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 10), "src")
    cat.clone_table("src", "cl")
    assert _state(cat, spark, "cl") == _state(cat, spark, "src")
    # zero-copy: the clone has NO data directory of its own, and every
    # file it lists lives under the source's path
    assert _data_files_on_disk(warehouse, "cl") == []
    assert all(
        f.path.startswith("tables/src/") for f in cat.load_table("cl").files()
    )
    # provenance recorded
    props = cat.load_table("cl").properties
    assert props["clone.source"] == "src"


def test_shallow_clone_version_pin_and_sql_spellings(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 5), "src")
    v1 = cat.load_table("src").current_snapshot_id
    cat.append(_df(spark, 5, 9), "src")

    cat.sql(spark, f"CREATE TABLE cl1 SHALLOW CLONE src VERSION AS OF {v1}")
    assert _state(cat, spark, "cl1") == {(i, 2 * i) for i in range(5)}

    # TIMESTAMP AS OF resolves through snapshot_as_of
    ts = cat.load_table("src").snapshots[-1].timestamp_ms
    import datetime as dt

    lit = dt.datetime.fromtimestamp(
        ts / 1000 + 1, dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S+00:00")
    cat.sql(
        spark, f"CREATE TABLE cl2 SHALLOW CLONE src TIMESTAMP AS OF '{lit}'"
    )
    assert _state(cat, spark, "cl2") == _state(cat, spark, "src")


def test_clones_evolve_independently(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 6), "src")
    cat.clone_table("src", "cl")
    cat.append(_df(spark, 100, 102), "cl")
    cat.sql(spark, "DELETE FROM src WHERE k >= 3")
    assert _state(cat, spark, "cl") == {
        (i, 2 * i) for i in range(6)
    } | {(100, 200), (101, 202)}
    assert _state(cat, spark, "src") == {(i, 2 * i) for i in range(3)}
    # the clone's own new files land under the clone's directory
    new = [
        f.path
        for f in cat.load_table("cl").files()
        if not f.path.startswith("tables/src/")
    ]
    assert new and all(p.startswith("tables/cl/") for p in new)


def test_shallow_clone_carries_pending_mor_deletes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 8), "src")
    upd = spark.createDataFrame([(2, 999), (50, 500)], SCHEMA)
    cat.merge_rows(upd, "src", key="k")  # pending equality delete
    cat.clone_table("src", "cl")
    want = {(i, 2 * i) for i in range(8) if i != 2} | {(2, 999), (50, 500)}
    assert _state(cat, spark, "cl") == want
    # and time travel on the clone still works across the carried chain
    first = min(s.snapshot_id for s in cat.load_table("cl").snapshots)
    assert _state(cat, spark, "cl", snapshot_id=first) == {
        (i, 2 * i) for i in range(8)
    }


def test_source_vacuum_cannot_break_a_shallow_clone(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 4), "src")
    for lo in (4, 8, 12):
        cat.append(_df(spark, lo, lo + 4).coalesce(1), "src")
    cat.clone_table("src", "cl")
    before = _state(cat, spark, "cl")

    # compact rewrites the source's layout; its old files are now
    # unreferenced BY THE SOURCE but still listed by the clone
    cat.compact(spark, "src")
    cat.expire_snapshots("src", keep_last=1)
    removed = cat.remove_orphan_files("src", dry_run=False, older_than_ms=0)
    assert removed == []  # every candidate is protected by the clone
    assert _state(cat, spark, "cl") == before

    # control: drop the clone and the same sweep DOES reclaim — proves
    # the protection (not a vacuously-empty candidate set)
    cat.drop_table("cl")
    removed = cat.remove_orphan_files("src", dry_run=False, older_than_ms=0)
    assert len(removed) > 0
    assert _state(cat, spark, "src") == {(i, 2 * i) for i in range(16)}


def test_deep_clone_owns_its_files(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 6), "src")
    cat.sql(spark, "CREATE TABLE cl CLONE src")  # bare CLONE = deep
    assert _state(cat, spark, "cl") == _state(cat, spark, "src")
    assert all(
        f.path.startswith("tables/cl/") for f in cat.load_table("cl").files()
    )


def test_clone_argument_validation(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 3), "src")
    with pytest.raises(ValueError, match="onto itself"):
        cat.clone_table("src", "src")
    cat.clone_table("src", "cl")
    with pytest.raises(ValueError, match="already exists"):
        cat.clone_table("src", "cl")
    # IF NOT EXISTS no-ops, OR REPLACE replaces
    cat.clone_table("src", "cl", if_not_exists=True)
    cat.append(_df(spark, 10, 12), "src")
    cat.sql(spark, "CREATE OR REPLACE TABLE cl SHALLOW CLONE src")
    assert _state(cat, spark, "cl") == _state(cat, spark, "src")
    with pytest.raises(ValueError, match="not found|snapshot"):
        cat.clone_table("src", "cl3", snapshot_id=999999)


def test_clone_from_another_branch(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 4), "t")
    cat.create_branch("audit")
    cat.append(_df(spark, 4, 7), "t", branch="audit")
    # pull the audit branch's staged state into main under a new name
    cat.clone_table("t", "t_audit_copy", source_branch="audit")
    assert _state(cat, spark, "t_audit_copy") == {
        (i, 2 * i) for i in range(7)
    }
    assert _state(cat, spark, "t") == {(i, 2 * i) for i in range(4)}


# ----------------------------------------------------------------------
# COPY INTO
# ----------------------------------------------------------------------


def _land(spark, tmp_path, name, lo, hi):
    p = str(tmp_path / "land" / name)
    _df(spark, lo, hi, mul=3).coalesce(1).write.parquet(p)
    return str(tmp_path / "land")


def test_copy_into_exactly_once(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    land = _land(spark, tmp_path, "b1", 0, 5)
    r1 = cat.copy_into(spark, "t", land)
    assert r1["rows_loaded"] == 5 and r1["files_loaded"] >= 1
    r2 = cat.copy_into(spark, "t", land)
    assert r2 == {
        "files_skipped": r1["files_loaded"],
        "files_loaded": 0,
        "rows_loaded": 0,
        "snapshot_id": r1["snapshot_id"],
    }
    # a late-arriving file loads alone
    _land(spark, tmp_path, "b2", 5, 8)
    r3 = cat.copy_into(spark, "t", land)
    assert r3["rows_loaded"] == 3
    assert _state(cat, spark, "t") == {(i, 3 * i) for i in range(8)}


def test_copy_into_force_and_pattern(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    land = _land(spark, tmp_path, "b1", 0, 4)
    _land(spark, tmp_path, "b2", 10, 12)
    r = cat.copy_into(spark, "t", land, pattern="b1/*")
    assert r["rows_loaded"] == 4
    r = cat.copy_into(spark, "t", land, pattern="b1/*", force=True)
    assert r["rows_loaded"] == 4 and r["files_skipped"] == 0
    assert cat.read(spark, "t").count() == 8  # force = duplicate load


def test_copy_into_sql_csv_with_format_options(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    p = str(tmp_path / "csvland")
    _df(spark, 0, 6).coalesce(1).write.option("header", "true").csv(p)
    out = cat.sql(
        spark,
        f"COPY INTO t FROM '{p}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS('header' = 'true')",
    ).collect()[0]
    assert out["num_inserted_rows"] == 6
    assert _state(cat, spark, "t") == {(i, 2 * i) for i in range(6)}
    # idempotent through SQL too
    out = cat.sql(
        spark,
        f"COPY INTO t FROM '{p}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS('header' = 'true')",
    ).collect()[0]
    assert out["num_inserted_rows"] == 0 and out["files_skipped"] >= 1


def test_copy_into_ledger_survives_expire(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    land = _land(spark, tmp_path, "b1", 0, 5)
    cat.copy_into(spark, "t", land)
    # bury the copy commit under ordinary appends, then squash history
    for lo in (100, 200, 300):
        cat.append(_df(spark, lo, lo + 2), "t")
    cat.expire_snapshots("t", keep_last=1)
    r = cat.copy_into(spark, "t", land)
    assert r["files_loaded"] == 0, (
        "expire_snapshots dropped the COPY INTO ledger — already-loaded "
        "files re-admitted"
    )


def test_copy_into_skips_hidden_files(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    land = _land(spark, tmp_path, "b1", 0, 3)
    # parquet writers leave _SUCCESS markers; add dot/underscore noise
    open(os.path.join(land, "_stray"), "w").write("x")
    open(os.path.join(land, ".hidden"), "w").write("x")
    r = cat.copy_into(spark, "t", land)
    assert r["rows_loaded"] == 3
    assert not any(
        os.path.basename(p).startswith(("_", "."))
        for p in cat._copy_into_loaded(cat.load_table("t"))
    )


# ----------------------------------------------------------------------
# table_changes() TVF
# ----------------------------------------------------------------------


def test_table_changes_tvf_matches_read_changes(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 5), "t")
    base = cat.load_table("t").current_snapshot_id
    cat.append(_df(spark, 5, 8), "t")
    upd = spark.createDataFrame([(0, 111)], SCHEMA)
    cat.merge_rows(upd, "t", key="k")
    api = (
        cat.read_changes(spark, "t", base)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    tvf = cat.sql(
        spark,
        f"SELECT _change_type, COUNT(*) AS count "
        f"FROM table_changes('t', {base}) GROUP BY _change_type",
    ).collect()
    assert {(r["_change_type"], r["count"]) for r in tvf} == {
        (r["_change_type"], r["count"]) for r in api
    }
    # bounded 3-arg form: only the first append
    mid = cat.load_table("t").snapshots[-2].snapshot_id
    n = cat.sql(
        spark,
        f"SELECT COUNT(*) AS n FROM table_changes('t', {base}, {mid})",
    ).collect()[0]["n"]
    assert n == 3


def test_table_changes_delta_columns_and_joins(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 4), "t")
    base = cat.load_table("t").current_snapshot_id
    cat.append(_df(spark, 4, 6), "t")
    snap = cat.load_table("t").snapshots[-1]
    rows = cat.sql(
        spark,
        f"SELECT c.k, c._commit_version, c._commit_timestamp "
        f"FROM table_changes('t', {base}) c JOIN t ON c.k = t.k",
    ).collect()
    assert {r["k"] for r in rows} == {4, 5}
    assert all(r["_commit_version"] == snap.snapshot_id for r in rows)
    import datetime as dt

    want_ts = dt.datetime.fromtimestamp(snap.timestamp_ms / 1000)
    assert all(
        abs((r["_commit_timestamp"] - want_ts).total_seconds()) < 1
        for r in rows
    )


def test_table_changes_inside_string_literal_untouched(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 2), "t")
    out = cat.sql(
        spark, "SELECT 'table_changes(''t'', 1)' AS s"
    ).collect()
    assert out[0]["s"] == "table_changes('t', 1)"


def test_deep_clone_replace_is_atomic(spark, warehouse):
    """CREATE OR REPLACE ... CLONE writes the copy FIRST and lands
    schema+data in one CAS: a failed copy leaves the existing target
    untouched (no drop+create window, no empty-table state)."""
    cat = Catalog(warehouse)
    cat.create_table_from_df(_df(spark, 0, 5), "src")
    cat.create_table_from_df(_df(spark, 100, 103), "tgt")
    before = _state(cat, spark, "tgt")
    # sabotage the copy: a CHECK constraint the source rows violate
    # (installed via raw properties so the write path is what trips)
    cat.set_properties("src", **{"constraint.bad": "k > 100"})
    with pytest.raises(Exception, match="bad"):
        cat.sql(spark, "CREATE OR REPLACE TABLE tgt CLONE src")
    assert _state(cat, spark, "tgt") == before
    # and the healthy path replaces in one commit
    cat.set_properties("src", **{"constraint.bad": None})
    cat.sql(spark, "CREATE OR REPLACE TABLE tgt CLONE src")
    assert _state(cat, spark, "tgt") == _state(cat, spark, "src")


def test_copy_into_csv_autocreate_infers_types(spark, warehouse, tmp_path):
    cat = Catalog(warehouse)
    p = str(tmp_path / "csvauto")
    _df(spark, 0, 4).coalesce(1).write.option("header", "true").csv(p)
    cat.copy_into(
        spark, "t", p, file_format="csv",
        format_options={"header": "true"},
    )
    types = {
        f.name: f.dataType.typeName()
        for f in cat.load_table("t").spark_schema.fields
    }
    assert types == {"k": "integer", "v": "integer"} or types == {
        "k": "long",
        "v": "long",
    }
