"""Hidden-partitioning transforms: spec parsing, write layout, exact
partition pruning, read-back fidelity, MoR/compact/export interplay.

The invariant under test everywhere: hidden partitioning changes IO
(file layout + pruning), NEVER results.
"""

import datetime as dt
import zlib

import duckdb
import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate
from no_jvm_wap_with_iceberg_spark.catalog.pruning import prune_files
from no_jvm_wap_with_iceberg_spark.catalog.transforms import (
    parse_partition_spec,
    partition_all_match,
    partition_may_match,
    transform_value,
)


def _events_df(spark, n=200):
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1 + i % 5, 8 + i % 3, i % 60),
            f"u{i % 7}",
            float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user string, value double"
    )


# ----------------------------------------------------------------------
# spec parsing / validation
# ----------------------------------------------------------------------
def test_parse_spec_shapes():
    fields = parse_partition_spec(
        ["ts", "day(ts)", "bucket(16, user)", "truncate(4, name)"]
    )
    assert [f.transform for f in fields] == [
        "identity",
        "day",
        "bucket",
        "truncate",
    ]
    assert [f.name for f in fields] == [
        "ts",
        "ts_day",
        "user_bucket16",
        "name_truncate4",
    ]


def test_parse_spec_rejects_garbage():
    with pytest.raises(ValueError):
        parse_partition_spec(["sha256(ts)"])
    with pytest.raises(ValueError):
        parse_partition_spec(["bucket(0, user)"])
    with pytest.raises(ValueError):
        parse_partition_spec(["day(ts)", "day(ts)"])


def test_create_table_validates_spec(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    with pytest.raises(ValueError, match="not in schema"):
        cat.create_table("t1", df.schema, partition_by=["day(missing)"])
    with pytest.raises(ValueError, match="timestamp"):
        cat.create_table("t2", df.schema, partition_by=["day(user)"])
    with pytest.raises(ValueError, match="integral/string"):
        cat.create_table("t3", df.schema, partition_by=["bucket(4, value)"])


# ----------------------------------------------------------------------
# transform math: Spark write values == Python planning values
# ----------------------------------------------------------------------
def test_bucket_dirs_match_python_crc(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["bucket(4, user)"])
    cat.append(df, "ev")
    meta = cat.load_table("ev")
    for f in meta.files():
        got = int(f.partition["user_bucket4"])
        users = spark.read.parquet(warehouse + "/" + f.path).select(
            "user"
        ).distinct().collect()
        for r in users:
            assert zlib.crc32(r["user"].encode()) % 4 == got


def test_truncate_int_negative_floors(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([-7, -5, -1, 0, 3, 9, 10])],
        "id long, v long",
    )
    cat.create_table("t", df.schema, partition_by=["truncate(5, v)"])
    cat.append(df, "t")
    meta = cat.load_table("t")
    dirs = {f.partition["v_truncate5"] for f in meta.files()}
    # Iceberg floor semantics: -7 -> -10, -1 -> -5, 3 -> 0, 10 -> 10
    assert dirs == {"-10", "-5", "0", "5", "10"}
    # python side agrees
    assert transform_value(
        parse_partition_spec(["truncate(5, v)"])[0], -7
    ) == -10


# ----------------------------------------------------------------------
# pruning
# ----------------------------------------------------------------------
def test_day_range_prunes_files_exactly(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    cat.append(df, "ev")
    meta = cat.load_table("ev")
    files = meta.files()
    assert len({f.partition["ts_day"] for f in files}) == 5
    kept = prune_files(
        files,
        Predicate.between(
            "ts", dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3, 23)
        ),
        meta.partition_fields,
    )
    assert {f.partition["ts_day"] for f in kept} == {
        "2024-01-02",
        "2024-01-03",
    }
    # strict bound AT A BUCKET BOUNDARY: the partition layer alone is
    # now exact (day 02 cannot hold rows before its own midnight); a
    # mid-bucket bound still weakens to le and composes with stats
    fld = meta.partition_fields[0]
    assert not partition_may_match(fld, "2024-01-02", "lt", dt.datetime(2024, 1, 2))
    assert partition_may_match(fld, "2024-01-02", "lt", dt.datetime(2024, 1, 2, 5))
    kept2 = prune_files(
        files,
        [Predicate("lt", "ts", dt.datetime(2024, 1, 2))],
        meta.partition_fields,
    )
    assert {f.partition["ts_day"] for f in kept2} == {"2024-01-01"}


def test_bucket_eq_prunes_to_one_bucket(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["bucket(4, user)"])
    cat.append(df, "ev")
    meta = cat.load_table("ev")
    kept = prune_files(
        meta.files(), [Predicate("eq", "user", "u3")], meta.partition_fields
    )
    want = str(zlib.crc32(b"u3") % 4)
    assert kept and all(f.partition["user_bucket4"] == want for f in kept)
    # range predicates can never prune at the BUCKET layer (the
    # transform is not monotonic); only column stats may
    fld = meta.partition_fields[0]
    for b in range(4):
        assert partition_may_match(fld, str(b), "ge", "u3")
        assert partition_may_match(fld, str(b), "lt", "u3")


def test_partition_may_match_never_false_positive_drop():
    fld = parse_partition_spec(["day(ts)"])[0]
    # a row at 2024-01-02 10:00 lives in dir 2024-01-02; every
    # predicate it satisfies must keep that dir
    v = dt.datetime(2024, 1, 2, 10)
    raw = "2024-01-02"
    for op, c in [
        ("eq", v),
        ("le", dt.datetime(2024, 1, 2, 10)),
        ("ge", dt.datetime(2024, 1, 2, 10)),
        ("lt", dt.datetime(2024, 1, 2, 11)),
        ("gt", dt.datetime(2024, 1, 2, 9)),
    ]:
        assert partition_may_match(fld, raw, op, c)


# ----------------------------------------------------------------------
# read-back fidelity
# ----------------------------------------------------------------------
def test_roundtrip_derived_only(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table(
        "ev", df.schema, partition_by=["day(ts)", "bucket(4, user)"]
    )
    cat.append(df, "ev")
    back = cat.read(spark, "ev")
    assert back.columns == df.columns  # derived values stay hidden
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_roundtrip_mixed_identity_and_derived(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["user", "day(ts)"])
    cat.append(df, "ev")
    back = cat.read(spark, "ev")
    assert set(back.columns) == set(df.columns)
    assert sorted(map(tuple, back.select(*df.columns).collect())) == sorted(
        map(tuple, df.collect())
    )


def test_predicate_read_results_unchanged(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    cat.append(df, "ev")
    lo = dt.datetime(2024, 1, 3)
    got = (
        cat.read(spark, "ev", predicates=[Predicate("ge", "ts", lo)])
        .filter(F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz"))
        .count()
    )
    want = df.filter(
        F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp_ntz")
    ).count()
    assert got == want


# ----------------------------------------------------------------------
# interplay: MoR deletes, compaction, export
# ----------------------------------------------------------------------
def test_mor_delete_on_transform_partitioned_table(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    cat.append(df, "ev")
    cat.delete_where(
        spark,
        "ev",
        [Predicate("eq", "user", "u2")],
        "user = 'u2'",
        mode="mor",
    )
    back = cat.read(spark, "ev")
    assert back.filter("user = 'u2'").count() == 0
    assert back.count() == df.filter("user != 'u2'").count()


def test_compact_preserves_hidden_layout(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    for s in range(3):
        cat.append(df.filter(F.col("event_id") % 3 == s), "ev")
    cat.compact(spark, "ev", min_files=2)
    meta = cat.load_table("ev")
    files = meta.files()
    # every post-compact file still lives in exactly one day dir
    assert files and all("ts_day" in f.partition for f in files)
    kept = prune_files(
        files,
        [Predicate("eq", "ts", dt.datetime(2024, 1, 2, 9))],
        meta.partition_fields,
    )
    assert {f.partition["ts_day"] for f in kept} == {"2024-01-02"}
    assert sorted(map(tuple, cat.read(spark, "ev").collect())) == sorted(
        map(tuple, df.collect())
    )


def test_duckdb_export_transform_partitioned(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.catalog.export import duckdb_view_sql

    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table(
        "ev", df.schema, partition_by=["user", "day(ts)"]
    )  # mixed: identity + derived
    cat.append(df, "ev")
    con = duckdb.connect()
    con.execute(duckdb_view_sql(cat, "ev"))
    n, users = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT user) FROM ev_main"
    ).fetchone()
    assert (n, users) == (200, 7)
    cols = {
        r[0]
        for r in con.execute(
            "SELECT column_name FROM (DESCRIBE ev_main)"
        ).fetchall()
    }
    assert cols == set(df.columns)  # derived value does not leak


def test_wap_pipeline_with_hidden_partitioning(spark, warehouse):
    from no_jvm_wap_with_iceberg_spark.wap.checks import NotNullCheck
    from no_jvm_wap_with_iceberg_spark.wap.pipeline import WapPipeline

    cat = Catalog(warehouse)
    df = _events_df(spark)
    wap = WapPipeline(
        cat, "ev", checks=[NotNullCheck("event_id")], partition_by=["day(ts)"]
    )
    r = wap.run_batch(spark, df)
    assert r.published
    assert cat.read(spark, "ev").count() == 200
    meta = cat.load_table("ev")
    assert {f.partition["ts_day"] for f in meta.files()} == {
        f"2024-01-0{d}" for d in range(1, 6)
    }


# ----------------------------------------------------------------------
# partition evolution
# ----------------------------------------------------------------------
def test_partition_evolution_mixed_eras(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    cat.append(df.filter("event_id < 100"), "ev")  # era 1: day dirs
    cat.evolve_partition_spec("ev", ["bucket(4, user)"])
    cat.append(df.filter("event_id >= 100"), "ev")  # era 2: bucket dirs

    meta = cat.load_table("ev")
    files = meta.files()
    era1 = [f for f in files if "ts_day" in f.partition]
    era2 = [f for f in files if "user_bucket4" in f.partition]
    assert era1 and era2 and len(era1) + len(era2) == len(files)

    # read unions both eras losslessly
    back = cat.read(spark, "ev")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )

    # pruning applies each file's own era: a ts predicate prunes era-1
    # files by day dir and keeps every era-2 file (no ts_day key);
    # stats may tighten further, so assert against per-file stats-free
    # partition behavior via the historical field set
    fields = meta.all_partition_fields
    assert {f.name for f in fields} == {"user_bucket4", "ts_day"}
    kept = prune_files(files, [Predicate("eq", "user", "u1")], fields)
    want_bucket = str(zlib.crc32(b"u1") % 4)
    for f in kept:
        if "user_bucket4" in f.partition:
            assert f.partition["user_bucket4"] == want_bucket


def test_partition_evolution_rejects_identity_change(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["user", "day(ts)"])
    with pytest.raises(ValueError, match="identity"):
        cat.evolve_partition_spec("ev", ["day(ts)"])
    with pytest.raises(ValueError, match="identity"):
        cat.evolve_partition_spec("ev", ["user", "event_id", "day(ts)"])
    # transform-only changes are fine even alongside identity fields
    cat.evolve_partition_spec("ev", ["user", "hour(ts)"])
    assert cat.load_table("ev").partition_by == ["user", "hour(ts)"]


def test_partition_evolution_compact_migrates_layout(spark, warehouse):
    cat = Catalog(warehouse)
    df = _events_df(spark)
    cat.create_table("ev", df.schema, partition_by=["day(ts)"])
    cat.append(df.filter("event_id % 2 = 0"), "ev")
    cat.evolve_partition_spec("ev", ["bucket(4, user)"])
    cat.append(df.filter("event_id % 2 = 1"), "ev")
    cat.compact(spark, "ev", min_files=2)
    meta = cat.load_table("ev")
    # compaction rewrites everything under the CURRENT spec
    assert all("user_bucket4" in f.partition for f in meta.files())
    assert sorted(map(tuple, cat.read(spark, "ev").collect())) == sorted(
        map(tuple, df.collect())
    )


# ----------------------------------------------------------------------
# write distribution (Iceberg write.distribution-mode)
# ----------------------------------------------------------------------
def _dist_df(spark):
    # 8 round-robin input partitions, each holding rows of all 3 months:
    # an unclustered write would emit up to 8 files PER month
    return (
        spark.createDataFrame(
            [
                (dt.datetime(2024, m, 1 + (i % 5), 6), i)
                for i in range(60)
                for m in (1, 2, 3)
            ],
            "ts timestamp, v long",
        )
        .repartition(8)
    )


def _n_files(cat, table):
    return len(cat.load_table(table).files())


def test_partitioned_write_clusters_by_default(spark, warehouse):
    """Default hash distribution: one write task per partition value, so
    the file count equals the partition count — not tasks x partitions
    (the small-files explosion at 100 TB)."""
    cat = Catalog(warehouse)
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    cat.create_table("t", schema, partition_by=["month(ts)"])
    cat.append(_dist_df(spark), "t")
    assert _n_files(cat, "t") == 3
    assert cat.read(spark, "t").count() == 180


def test_distribution_mode_none_and_range(spark, warehouse):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
    )
    cat = Catalog(warehouse)
    cat.create_table(
        "t_none",
        schema,
        partition_by=["month(ts)"],
        properties={"write.distribution-mode": "none"},
    )
    cat.append(_dist_df(spark), "t_none")
    assert _n_files(cat, "t_none") > 3  # unclustered: tasks x partitions
    cat.create_table(
        "t_range",
        schema,
        partition_by=["month(ts)"],
        properties={"write.distribution-mode": "range"},
    )
    cat.append(_dist_df(spark), "t_range")
    assert _n_files(cat, "t_range") == 3
    # distribution is layout-only: results identical across modes
    a = sorted(tuple(r) for r in cat.read(spark, "t_none").collect())
    b = sorted(tuple(r) for r in cat.read(spark, "t_range").collect())
    assert a == b and len(a) == 180


def test_boundary_strict_pruning_and_proofs():
    """A constant on a bucket boundary makes partition-space mapping
    STRICT: `ts < month-start` excludes the cutoff's own month (the
    retention-delete shape used to keep/rewrite it needlessly), and
    `ts >= month-start` proves the month whole."""
    (fld,) = parse_partition_spec(["month(ts)"])
    V = dt.datetime(2024, 4, 1)
    assert not partition_may_match(fld, "2024-04", "lt", V)
    assert partition_may_match(fld, "2024-03", "lt", V)
    # a mid-bucket constant keeps the inclusive (sound) mapping
    assert partition_may_match(fld, "2024-04", "lt", dt.datetime(2024, 4, 1, 5))
    assert partition_all_match(fld, "2024-04", "ge", V)
    assert not partition_all_match(fld, "2024-04", "gt", V)
    assert not partition_all_match(
        fld, "2024-04", "ge", dt.datetime(2024, 4, 1, 5)
    )
    (tr,) = parse_partition_spec(["truncate(10, v)"])
    assert not partition_may_match(tr, "20", "lt", 20)
    assert partition_may_match(tr, "20", "lt", 21)
    assert partition_all_match(tr, "20", "ge", 20)


def test_boundary_retention_delete_touches_nothing_extra(spark, warehouse):
    """End-to-end: a month-boundary DELETE drops whole months as
    metadata and the cutoff's own month is not even AFFECTED (no
    rewrite, no removal) — plus engine-written timestamp files now
    carry footer stats (TIMESTAMP_MICROS), so the ts column prunes
    by stats as well as by partition."""
    cat = Catalog(warehouse)
    schema = _ts_schema()
    cat.create_table("t", schema, partition_by=["month(ts)"])
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, m, d, 6), m * 100 + d)
            for m in (1, 2, 3, 4)
            for d in (1, 10, 20)
        ],
        schema,
    )
    cat.append(df, "t")
    meta0 = cat.load_table("t")
    # TIMESTAMP_MICROS footer stats present on engine-written files
    assert all(
        f.columns.get("ts", {}).get("min") is not None
        for f in meta0.files()
    )
    cat.sql(spark, "DELETE FROM t WHERE ts < TIMESTAMP '2024-04-01 00:00:00'")
    snap = cat.load_table("t").snapshots[-1]
    assert snap.summary["metadata-deleted-files"] == 3
    assert snap.summary["added-files"] == 0
    # ONLY the three dropped months were touched at all
    assert snap.summary["removed-files"] == 3
    out = cat.read(spark, "t")
    assert out.count() == 3
    assert out.agg(F.min("ts")).collect()[0][0] == dt.datetime(2024, 4, 1, 6)


def _ts_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
