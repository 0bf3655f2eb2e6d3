"""Per-phase profile of the streaming_changefeed_merge bench entry.

Round-12 brief item 1: decompose the ~5.4-6.1 s entry into
setup-write / merge / stream(start..stop) / readback shares, and split
the stream share into triggerExecution (from recentProgress) vs
machinery (start/stop + Python source-runner spawn).

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_changefeed.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
    register_changefeed_source,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, tag: str) -> dict:
    t = {}
    t0 = time.time()
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix=f"cfs_prof_{tag}_")
    cat = Catalog(os.path.join(base, "wh"))
    seed = orders.filter(F.col("o_orderkey") % 3 != 0)
    cat.create_table_from_df(seed, "ord")
    t["seed_create"] = time.time() - t0

    t0 = time.time()
    upd = (
        seed.filter(F.col("o_orderkey") % 3 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
        .withColumn("_del", F.lit(False))
    )
    dels = seed.filter(
        (F.col("o_orderkey") % 3 == 2) & (F.col("o_orderkey") % 5 == 0)
    ).withColumn("_del", F.lit(True))
    ins = orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "_del", F.lit(False)
    )
    cat.merge_rows(
        upd.unionByName(dels).unionByName(ins),
        "ord",
        key="o_orderkey",
        delete_col="_del",
    )
    t["merge"] = time.time() - t0

    sink = os.path.join(base, "sink")
    t0 = time.time()
    q = (
        spark.readStream.format("wap_changefeed")
        .option("warehouse", os.path.join(base, "wh"))
        .option("table", "ord")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    t["stream_start_call"] = time.time() - t0
    q.awaitTermination()
    t["stream_total"] = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    t["n_batches"] = len(prog)
    t["trigger_ms"] = sum(p["durationMs"].get("triggerExecution", 0) for p in prog)
    t["addBatch_ms"] = sum(p["durationMs"].get("addBatch", 0) for p in prog)
    t["latestOffset_ms"] = sum(p["durationMs"].get("latestOffset", 0) for p in prog)
    t["queryPlanning_ms"] = sum(p["durationMs"].get("queryPlanning", 0) for p in prog)
    t["walCommit_ms"] = sum(p["durationMs"].get("walCommit", 0) for p in prog)
    t["commitOffsets_ms"] = sum(p["durationMs"].get("commitOffsets", 0) for p in prog)
    t["machinery"] = t["stream_total"] - t["trigger_ms"] / 1000.0

    t0 = time.time()
    feed = spark.read.parquet(sink)
    res = feed.groupBy("_change_type", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.count_distinct(F.col("_snapshot_id")).alias("n_commits"),
    )
    res.collect()
    t["readback_agg"] = time.time() - t0
    t["total"] = sum(
        v for k, v in t.items()
        if k in ("seed_create", "merge", "stream_total", "readback_agg")
    )
    return {k: (round(v, 3) if isinstance(v, float) else v) for k, v in t.items()}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="profile_changefeed")
    register_changefeed_source(spark)
    # warm pass at sf0.001 like the bench warmup
    global SF_DIR
    real = SF_DIR
    SF_DIR = "/root/testdata/sf0.001"
    run_once(spark, "warm")
    SF_DIR = real
    for i in range(reps):
        spark.catalog.clearCache()
        print(json.dumps(run_once(spark, f"r{i}")), flush=True)


if __name__ == "__main__":
    main()
