"""Self-tending merge-on-read (VERDICT r5 #3): sustained merge load
must fold its pending equality-delete specs back WITHOUT a manual
maintenance cron. A merge/MoR-delete commit whose resulting max
per-file spec depth reaches ``write.merge.auto-fold-specs`` (default
Catalog.AUTO_FOLD_SPECS_DEFAULT) fires a best-effort binpack compact.
"""

from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def _spec_depth(cat, table):
    meta = cat.load_table(table)
    return max(
        (len(specs) for _f, specs in meta.files_with_deletes()), default=0
    )


def _seed(cat, spark, table, props=None):
    cat.create_table(table, SCHEMA)
    if props:
        cat.set_properties(table, **props)
    cat.append(
        spark.range(2_000)
        .select(F.col("id"), (F.col("id") % 7).alias("v"))
        .coalesce(1),
        table,
    )


def test_auto_fold_bounds_spec_depth(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, "m", {"write.merge.auto-fold-specs": "4"})
    for i in range(10):
        src = spark.range(i * 10, i * 10 + 20).select(
            F.col("id"), F.lit(999 + i).alias("v")
        )
        cat.merge_rows(src, "m", key="id")
        # depth can never exceed the threshold: the commit that
        # reaches it folds immediately
        assert _spec_depth(cat, "m") < 4 or _spec_depth(cat, "m") == 4
    assert _spec_depth(cat, "m") < 4
    # a fold actually happened (rewrite/overwrite snapshot present)
    ops = {s.operation for s in cat.load_table("m").snapshots}
    assert ops & {"rewrite", "overwrite"}
    # and the data is exactly what 10 sequential merges produce
    got = {
        r["id"]: r["v"]
        for r in cat.read(spark, "m").filter(F.col("id") < 110).collect()
    }
    for i in range(10):
        for k in range(i * 10, i * 10 + 20):
            if k >= 110:
                continue
            # later merges overwrite earlier overlapping keys
            expect = 999 + max(
                j for j in range(10) if j * 10 <= k < j * 10 + 20
            )
            assert got[k] == expect, (k, got[k], expect)


def test_auto_fold_disabled_by_property(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, "m0", {"write.merge.auto-fold-specs": "0"})
    for i in range(6):
        src = spark.range(0, 20).select(
            F.col("id"), F.lit(100 + i).alias("v")
        )
        cat.merge_rows(src, "m0", key="id")
    # disabled: specs accumulate freely
    assert _spec_depth(cat, "m0") == 6
    ops = {s.operation for s in cat.load_table("m0").snapshots}
    assert "rewrite" not in ops and "overwrite" not in ops


def test_auto_fold_default_threshold_applies(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, "m1")  # no property: default threshold (16)
    for i in range(Catalog.AUTO_FOLD_SPECS_DEFAULT + 2):
        src = spark.range(0, 10).select(
            F.col("id"), F.lit(200 + i).alias("v")
        )
        cat.merge_rows(src, "m1", key="id")
    assert _spec_depth(cat, "m1") < Catalog.AUTO_FOLD_SPECS_DEFAULT
    # final state is the last merge's values
    got = {
        r["id"]: r["v"]
        for r in cat.read(spark, "m1").filter(F.col("id") < 10).collect()
    }
    assert set(got.values()) == {200 + Catalog.AUTO_FOLD_SPECS_DEFAULT + 1}


def test_auto_fold_fires_on_mor_delete_keys(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, "m2", {"write.merge.auto-fold-specs": "3"})
    for i in range(5):
        keys = spark.range(i * 5, i * 5 + 5).select("id")
        cat.delete_keys(keys, "m2", key="id", mode="mor")
    assert _spec_depth(cat, "m2") < 3
    assert cat.read(spark, "m2").filter(F.col("id") < 25).count() == 0
    assert cat.row_count("m2", spark=spark) == 2_000 - 25


def test_fold_deletes_preserves_file_boundaries(spark, warehouse):
    """fold_deletes rewrites ONLY spec-carrying files one-to-one —
    clean files keep their paths, so the layout's key-range pruning
    granularity survives the fold (the binpack fold measurably
    destroyed it: 32 range-disjoint files -> 1, and every later
    merge scanned the table)."""
    cat = Catalog(warehouse)
    cat.create_table("f", SCHEMA)
    # 4 range-disjoint files
    for lo in (0, 1000, 2000, 3000):
        cat.append(
            spark.range(lo, lo + 1000)
            .select(F.col("id"), (F.col("id") % 7).alias("v"))
            .coalesce(1),
            "f",
        )
    before = {f.path for f in cat.load_table("f").files()}
    assert len(before) == 4
    # merge touching ONLY the first file's range
    cat.set_properties("f", **{"write.merge.auto-fold-specs": "0"})
    cat.merge_rows(
        spark.range(0, 50).select(F.col("id"), F.lit(999).alias("v")),
        "f",
        key="id",
    )
    meta = cat.fold_deletes(spark, "f")
    after = {f.path for f in meta.files_with_deletes() for f in [f[0]]}
    # the three untouched range files carry over with identical paths
    assert len(before & after) >= 3
    # no pending specs remain
    assert all(not c for _f, c in meta.files_with_deletes())
    # data intact
    got = {
        r["id"]: r["v"]
        for r in cat.read(spark, "f").filter(F.col("id") < 60).collect()
    }
    assert all(got[i] == 999 for i in range(50))
    assert got[55] == 55 % 7


def test_call_rewrite_position_delete_files(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark, "c", {"write.merge.auto-fold-specs": "0"})
    cat.merge_rows(
        spark.range(0, 30).select(F.col("id"), F.lit(7).alias("v")),
        "c",
        key="id",
    )
    row = cat.sql(
        spark, "CALL rewrite_position_delete_files('c')"
    ).collect()[0]
    assert row["carrying_files_before"] >= 1
    assert row["carrying_files_after"] == 0
    got = {
        r["id"]: r["v"]
        for r in cat.read(spark, "c").filter(F.col("id") < 35).collect()
    }
    assert all(got[i] == 7 for i in range(30))


def test_maintain_folds_when_only_specs_pend(spark, warehouse):
    """maintain(): pending specs WITHOUT a small-file problem fold in
    place (fold_deletes) instead of triggering a table rewrite."""
    cat = Catalog(warehouse)
    _seed(cat, spark, "w", {"write.merge.auto-fold-specs": "0"})
    cat.merge_rows(
        spark.range(0, 30).select(F.col("id"), F.lit(1).alias("v")),
        "w",
        key="id",
    )
    assert _spec_depth(cat, "w") == 1
    rep = cat.maintain(spark, "w", small_file_threshold=1000)
    assert rep["folded"] and not rep["compacted"]
    assert _spec_depth(cat, "w") == 0
    assert not cat.load_table("w").has_pending_deletes()
