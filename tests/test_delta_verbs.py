"""Delta-spelling maintenance verbs through the SQL front door:
OPTIMIZE [ZORDER BY], VACUUM [RETAIN n HOURS] [DRY RUN],
RESTORE TABLE ... TO VERSION|TIMESTAMP AS OF, DESCRIBE DETAIL —
mapped to the same primitives the Iceberg CALL procedures reach."""

import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def _seed_many_files(cat, spark, table, n_commits=4):
    cat.create_table(table, SCHEMA)
    for i in range(n_commits):
        cat.append(
            spark.range(i * 10, i * 10 + 10)
            .select(F.col("id"), (F.col("id") % 5).alias("v"))
            .coalesce(1),
            table,
        )


def test_optimize_binpack_and_zorder(spark, warehouse):
    cat = Catalog(warehouse)
    _seed_many_files(cat, spark, "t")
    row = cat.sql(spark, "OPTIMIZE t").collect()[0]
    assert row["files_before"] == 4 and row["files_after"] < 4
    assert cat.read(spark, "t").count() == 40

    _seed_many_files(cat, spark, "z")
    row = cat.sql(spark, "OPTIMIZE z ZORDER BY (id, v)").collect()[0]
    assert row["files_after"] >= 1
    assert cat.load_table("z").properties.get("zorder_by") == "id,v"
    assert cat.read(spark, "z").count() == 40


def test_vacuum_dry_run_and_delete(spark, warehouse):
    import glob
    import os

    cat = Catalog(warehouse)
    _seed_many_files(cat, spark, "t")
    # full compact starts a new era; expiring history then orphans the
    # pre-compaction files (binpack's rewrite keeps its era base, so
    # its inputs stay referenced until an overwrite — engine behavior)
    cat.compact(spark, "t")
    cat.expire_snapshots("t", keep_last=1)
    dry = cat.sql(spark, "VACUUM t RETAIN 0 HOURS DRY RUN").collect()
    assert len(dry) >= 4  # the compacted-away small files
    n_before = len(
        glob.glob(os.path.join(warehouse, "**", "*.parquet"), recursive=True)
    )
    gone = cat.sql(spark, "VACUUM t RETAIN 0 HOURS").collect()
    assert {r["path"] for r in gone} == {r["path"] for r in dry}
    n_after = len(
        glob.glob(os.path.join(warehouse, "**", "*.parquet"), recursive=True)
    )
    assert n_after == n_before - len(gone)
    assert cat.read(spark, "t").count() == 40  # live data intact
    # default retention keeps young files (a fresh orphan survives)
    assert cat.sql(spark, "VACUUM t DRY RUN").collect() == []


def test_restore_table_version_and_timestamp(spark, warehouse):
    import datetime as dt
    import time

    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(spark.createDataFrame([(1, 1)], SCHEMA), "t")
    v1 = cat.load_table("t").current_snapshot_id
    t_between = time.time()
    time.sleep(0.05)
    cat.append(spark.createDataFrame([(2, 2)], SCHEMA), "t")

    st = cat.sql(spark, f"RESTORE TABLE t TO VERSION AS OF {v1}")
    assert st.collect()[0]["operation"] == "RESTORE"
    assert cat.read(spark, "t").count() == 1

    # restore forward again (rollback is undoable), then by timestamp
    ts = dt.datetime.fromtimestamp(
        t_between, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    cat.sql(spark, f"RESTORE t TO TIMESTAMP AS OF '{ts}'")
    assert cat.read(spark, "t").count() == 1
    with pytest.raises(ValueError, match="no snapshot"):
        cat.sql(
            spark, "RESTORE TABLE t TO TIMESTAMP AS OF '1990-01-01 00:00:00'"
        )


def test_describe_detail(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table(
        "t", SCHEMA, partition_by=["v"], sort_by=["id"]
    )
    cat.append(
        spark.range(20).select(F.col("id"), (F.col("id") % 2).alias("v")),
        "t",
    )
    row = cat.sql(spark, "DESCRIBE DETAIL t").collect()[0]
    assert row["format"] == "wap" and row["name"] == "t"
    assert row["num_files"] >= 1 and row["size_in_bytes"] > 0
    assert row["partition_columns"] == "v"
    assert row["sort_columns"] == "id"
    assert row["num_snapshots"] == 1
    # unknown table falls through to spark.sql -> Spark's own error
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(Exception) as ei:
        cat.sql(spark, "DESCRIBE DETAIL no_such_t")
    assert not isinstance(ei.value, KeyError)
