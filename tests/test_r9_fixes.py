"""Round-9 fixes pinned by test.

1. The near-dup in-batch collapse window runs over an
   ``(_id, xxhash64(_sh))`` projection — the exchange no longer
   ships/sort-compares the full shingle arrays (VERDICT r8 #3) — and
   its hash-collision guard is exact (verified under a FORCED
   universal collision).
2. ``probe_files_spark``'s sorted-keys fast path admits nothing on an
   empty probe, matching the general mask path (ADVICE r8).
3. ``create_table(..., if_not_exists=True)`` returns False for an
   existing table even when THIS call's partition spec would not
   parse (ADVICE r8 contract restoration).
"""

import pytest
from pyspark.sql import functions as F

import no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup as idd
from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import probe_files_spark
from no_jvm_wap_with_iceberg_spark.operators.dedup import minhash_signatures


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten eleven"


def _sigs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signatures(df, "doc_id", "text").filter(
        F.size("_sh") > 0
    )


def _window_partition_types(df):
    """Data types of each Window node's partition-spec expressions in
    the optimized plan (the analyzer hoists computed keys into a
    child projection, so inspect the expression types directly)."""
    lp = df._jdf.queryExecution().optimizedPlan()
    outs = []

    def walk(node):
        if node.nodeName() == "Window":
            spec = node.partitionSpec()
            outs.append(
                [
                    spec.apply(i).dataType().simpleString()
                    for i in range(spec.size())
                ]
            )
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(lp)
    return outs


def test_collapse_window_partitions_on_hash_not_array(spark):
    """The keep-first window's partition key is the 8-byte xxhash64 of
    the shingle set — the exchange partitioner and the per-partition
    sort compare longs, never whole arrays (VERDICT r8 #3)."""
    sigs = _sigs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    collapsed = idd._collapse_identical(sigs)
    windows = _window_partition_types(collapsed)
    assert windows, "collapse lost its keep-first window"
    for types in windows:
        assert types == ["bigint"], types  # not array<bigint>
    # and the hash really is the set hash: the hoisted window key
    # (_wN) is an xxhash64 over the shingle-set column
    import re

    plan = collapsed._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"xxhash64\([^)]*sh[^)]*\) AS _w\d+", plan), plan


def test_collapse_keeps_first_and_distinct(spark):
    sigs = _sigs(
        spark, [(5, BASE), (1, BASE), (9, BASE), (3, OTHER)]
    )
    kept = {r._id for r in idd._collapse_identical(sigs).collect()}
    assert kept == {1, 3}  # min key per identical set; distinct kept


def test_collapse_exact_under_forced_hash_collision(spark, monkeypatch):
    """Force EVERY shingle set into one hash bucket: identical sets
    must still collapse keep-first, and distinct sets must all
    survive (the equality verify, not the hash, decides)."""
    # build sigs BEFORE patching: column expressions are constructed
    # eagerly, so the patch below hits only the collapse's set hash,
    # not the signature kernel's word hashing
    sigs = _sigs(
        spark, [(5, BASE), (1, BASE), (3, OTHER), (7, OTHER)]
    )
    monkeypatch.setattr(idd.F, "xxhash64", lambda *a: F.lit(0))
    kept = {r._id for r in idd._collapse_identical(sigs).collect()}
    # reps: min over the single bucket is doc 1 (BASE). Doc 5 equals
    # the rep's set -> collapses. Docs 3/7 differ from the rep's set
    # -> both survive the collapse (the pair pass would handle their
    # mutual similarity; here we test the collapse alone).
    assert kept == {1, 3, 7}


def test_empty_probe_admits_nothing(spark):
    """Zero-row probe + evidence-free candidate (no bounds, no bloom):
    the fast path must admit nothing, like the general mask path
    (ADVICE r8 — it used to admit every evidence-free candidate)."""
    empty = spark.createDataFrame([], "fp string").repartition(4)
    evidence_free = [(0, [(None, None, None)])]
    assert probe_files_spark(empty, ["fp"], evidence_free) == set()
    # sanity: one real row admits the same candidate
    one = spark.createDataFrame([("abc",)], "fp string")
    assert probe_files_spark(one, ["fp"], evidence_free) == {0}


def test_empty_probe_admits_nothing_numeric(spark):
    empty = spark.createDataFrame([], "k long").repartition(4)
    assert probe_files_spark(empty, ["k"], [(0, [(None, None, None)])]) == set()


def test_create_if_not_exists_ignores_bad_spec_when_exists(
    spark, warehouse
):
    cat = Catalog(warehouse)
    df = spark.range(3).select("id")
    cat.create_table("t", df.schema)
    # bad spec: no such column, unparseable transform — must NOT raise
    # for the already-exists if_not_exists case
    assert (
        cat.create_table(
            "t",
            df.schema,
            partition_by=["truncate(2, nonexistent_col)"],
            if_not_exists=True,
        )
        is False
    )
    # the create case still validates specs eagerly
    with pytest.raises(Exception):
        cat.create_table(
            "t2", df.schema, partition_by=["truncate(2, nope)"]
        )
