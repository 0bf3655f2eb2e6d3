"""RefStore abstraction: the catalog metadata path assumes nothing POSIX.

The same commit protocol the local catalog runs (CAS on refs,
immutable commit/metadata blobs) maps onto S3 conditional puts / GCS
generation preconditions — store.py documents the mapping; these tests
prove the catalog works end-to-end against the in-memory fake, with
zero metadata files on disk.
"""

import os
import threading

import pytest

from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.catalog.store import InMemoryStore, LocalFSStore
from no_jvm_wap_with_iceberg_spark.wap.pipeline import WapPipeline
from no_jvm_wap_with_iceberg_spark.wap.checks import NotNullCheck

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _df(spark, lo, hi, name="x"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(name).alias("name"))


# ----------------------------------------------------------------------
# store contract (both implementations)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("make", [InMemoryStore, lambda: None], ids=["mem", "fs"])
def test_store_cas_contract(make, tmp_path):
    store = make() if make() is not None else LocalFSStore(str(tmp_path))
    assert store.get("k") is None
    # create-if-absent
    assert store.put_if("k", {"v": 1}, None) is True
    assert store.put_if("k", {"v": 9}, None) is False  # already exists
    payload, token = store.get("k")
    assert payload == {"v": 1}
    # stale token loses, fresh token wins
    assert store.put_if("k", {"v": 2}, "stale") is False
    assert store.put_if("k", {"v": 2}, token) is True
    assert store.get("k")[0] == {"v": 2}
    # immutable puts + listing
    store.put("commits/a.json", {"id": "a"})
    store.put("commits/b.json", {"id": "b"})
    assert store.list_keys("commits") == ["commits/a.json", "commits/b.json"]
    store.delete("commits/a.json")
    assert store.list_keys("commits") == ["commits/b.json"]


def test_store_concurrent_cas_single_winner_per_round(tmp_path):
    store = LocalFSStore(str(tmp_path))
    store.put_if("n", {"v": 0}, None)
    n_threads, n_incr = 8, 10

    def bump():
        for _ in range(n_incr):
            while True:
                payload, token = store.get("n")
                if store.put_if("n", {"v": payload["v"] + 1}, token):
                    break

    threads = [threading.Thread(target=bump) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert store.get("n")[0]["v"] == n_threads * n_incr  # no lost updates


# ----------------------------------------------------------------------
# catalog on the in-memory fake: full WAP cycle, zero metadata on disk
# ----------------------------------------------------------------------
def test_full_wap_cycle_on_memory_store(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(wh, store=InMemoryStore())
    pipe = WapPipeline(cat, "t", [NotNullCheck("name")])
    assert pipe.run_batch(spark, _df(spark, 0, 100), ingest_key="b1").published
    assert not pipe.run_batch(
        spark,
        _df(spark, 0, 10).unionByName(
            spark.createDataFrame([(999, None)], SCHEMA)
        ),
    ).published
    assert cat.row_count("t") == 100
    assert pipe.run_batch(spark, _df(spark, 0, 10), ingest_key="b1").skipped
    # branch surface
    cat.create_branch("dev")
    cat.append(_df(spark, 100, 150), "t", branch="dev")
    assert cat.row_count("t") == 100
    assert cat.row_count("t", "dev") == 150
    cat.merge("dev")
    assert cat.row_count("t") == 150
    # time travel + upsert still work
    cat.upsert(spark.createDataFrame([(5, "upd")], SCHEMA), "t", key="id")
    assert cat.read(spark, "t").filter("id = 5").collect()[0]["name"] == "upd"
    # the ONLY things on disk are parquet data files — no metadata JSON
    on_disk = []
    for dirpath, _d, names in os.walk(wh):
        on_disk.extend(os.path.join(dirpath, n) for n in names)
    assert on_disk, "data files should exist on disk"
    assert all(p.endswith(".parquet") or "_SUCCESS" in p or p.endswith(".crc") for p in on_disk), (
        f"unexpected non-data files: {[p for p in on_disk if not (p.endswith('.parquet') or '_SUCCESS' in p or p.endswith('.crc'))][:5]}"
    )


def test_mor_delete_on_memory_store(spark, tmp_path):
    from no_jvm_wap_with_iceberg_spark.catalog import Predicate

    cat = Catalog(str(tmp_path / "wh"), store=InMemoryStore())
    cat.create_table("t", SCHEMA)
    cat.append(_df(spark, 0, 50), "t")
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 9), "id BETWEEN 0 AND 9", mode="mor"
    )
    assert cat.read(spark, "t").count() == 40
    cat.compact(spark, "t")
    assert cat.row_count("t") == 40
