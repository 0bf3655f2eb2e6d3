"""Incremental near-dup dedup against persisted MinHash state
(pipelines/incremental_dedup.near_dedup_ingest).
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
    near_dedup_ingest,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sleepy badgers watch from the mossy riverbank in the pale light"
)
NEAR = BASE.replace("pale light", "dim light")  # one-word edit: j >= 0.9
FAR = (
    "completely different content about spark catalysts shuffling "
    "partitioned analytics over columnar storage at massive scale"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_in_batch_and_cross_batch_near_dups(spark, warehouse):
    cat = Catalog(warehouse)
    r1 = near_dedup_ingest(
        spark, cat, _df(spark, [(1, BASE), (2, NEAR), (3, FAR)]),
        "docs", "sigs", "bands",
    )
    assert (r1.published, r1.in_batch_dups, r1.seen_dups,
            r1.rows_published) == (True, 1, 0, 2)  # 2 is near-dup of 1
    r2 = near_dedup_ingest(
        spark, cat, _df(spark, [(10, NEAR), (11, "tiny doc here today "
                                                 "with enough words to "
                                                 "form shingles clearly")]),
        "docs", "sigs", "bands",
    )
    assert (r2.published, r2.seen_dups, r2.rows_published) == (True, 1, 1)
    kept = {r.doc_id for r in cat.read(spark, "docs").collect()}
    assert kept == {1, 3, 11}
    # indexes stay consistent with the corpus
    assert cat.read(spark, "sigs").count() == 3
    assert cat.read(spark, "bands").count() == 3 * 16  # 16 bands/doc


def test_all_dup_batch_publishes_nothing(spark, warehouse):
    cat = Catalog(warehouse)
    near_dedup_ingest(spark, cat, _df(spark, [(1, BASE)]),
                      "docs", "sigs", "bands")
    r = near_dedup_ingest(spark, cat, _df(spark, [(2, NEAR), (3, BASE)]),
                          "docs", "sigs", "bands")
    assert r.published is False and r.rows_published == 0
    assert cat.read(spark, "docs").count() == 1


def test_short_docs_pass_through(spark, warehouse):
    # sub-3-word docs have no shingles: always admitted, never indexed
    cat = Catalog(warehouse)
    r = near_dedup_ingest(
        spark, cat, _df(spark, [(1, "hi"), (2, "hi"), (3, BASE)]),
        "docs", "sigs", "bands",
    )
    assert r.rows_published == 3
    assert cat.read(spark, "docs").count() == 3
    assert cat.read(spark, "sigs").count() == 1  # only the long doc


def test_racing_ingest_cannot_admit_similar_twice(spark, warehouse):
    cat = Catalog(warehouse)
    near_dedup_ingest(spark, cat, _df(spark, [(1, FAR)]),
                      "docs", "sigs", "bands")
    original_append_many = Catalog.append_many
    fired = {"done": False}

    def racing_append_many(self, appends, branch="main", **kw):
        if not fired["done"]:
            fired["done"] = True
            near_dedup_ingest(
                spark, cat, _df(spark, [(50, BASE)]), "docs", "sigs", "bands"
            )
        return original_append_many(self, appends, branch, **kw)

    try:
        Catalog.append_many = racing_append_many
        r = near_dedup_ingest(
            spark, cat, _df(spark, [(9, NEAR)]), "docs", "sigs", "bands"
        )
    finally:
        Catalog.append_many = original_append_many
    assert r.published is False and r.attempts == 2
    kept = {r_.doc_id for r_ in cat.read(spark, "docs").collect()}
    assert kept == {1, 50}
