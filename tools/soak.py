"""Scaling soak: run key operators at amplified input sizes and print
the time ratios (the SCALE.md "Measured scaling" evidence,
reproducibly).

Union-amplifies the sf0.1 testdata in memory — inputs are the driver's
tables, only replicated; results are timings, not correctness claims.

Usage: python tools/soak.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from no_jvm_wap_with_iceberg_spark.operators.dedup import minhash_dedup_pairs  # noqa: E402
from no_jvm_wap_with_iceberg_spark.plans.relational import dec  # noqa: E402
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="soak")

    li = load_table(spark, sf, "lineitem")
    li10 = li
    for _ in range(9):
        li10 = li10.unionByName(li)
    li10 = li10.cache()
    n10 = li10.count()

    def q1(df):
        df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(dec("l_quantity")).cast("double"),
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))).cast("double"),
            F.count(F.lit(1)),
        ).collect()

    q1(li)  # warm
    t0 = time.time(); q1(li); t1x = time.time() - t0
    t0 = time.time(); q1(li10); t10x = time.time() - t0
    print(f"q1-agg: 1x={t1x:.2f}s 10x({n10} rows)={t10x:.2f}s ratio={t10x / t1x:.2f}")

    d = load_table(spark, sf, "documents")
    d4 = d
    for i in range(1, 4):
        d4 = d4.unionByName(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    d4 = d4.cache()
    nd = d4.count()
    minhash_dedup_pairs(d, "doc_id", "text").count()  # warm
    t0 = time.time(); p1 = minhash_dedup_pairs(d, "doc_id", "text").count(); t1 = time.time() - t0
    t0 = time.time(); p4 = minhash_dedup_pairs(d4, "doc_id", "text").count(); t4 = time.time() - t0
    print(
        f"minhash: 1x={t1:.2f}s/{p1} pairs 4x({nd} docs)={t4:.2f}s/{p4} pairs "
        f"ratio={t4 / t1:.2f}"
    )

    from no_jvm_wap_with_iceberg_spark.operators.corpus import decontaminate

    ev = d.filter(F.col("doc_id") % 83 == 0)
    decontaminate(d, ev, "doc_id", "text").count()  # warm
    t0 = time.time(); h1 = decontaminate(d, ev, "doc_id", "text").count(); td1 = time.time() - t0
    t0 = time.time(); h4 = decontaminate(d4, ev, "doc_id", "text").count(); td4 = time.time() - t0
    print(
        f"decontaminate: 1x={td1:.2f}s/{h1} hit-docs 4x={td4:.2f}s/{h4} "
        f"ratio={td4 / td1:.2f}"
    )

    wap_ingest_soak(spark, n_batches=100)
    merge_soak(spark)
    merge_into_soak(spark)
    merge_into_scale_soak(spark)
    metadata_delete_scale_soak(spark)
    changefeed_soak(spark)
    incremental_agg_soak(spark)
    stream_plan_soak(spark)
    clone_onboard_scale_soak(spark)
    incremental_dedup_soak(spark)


def merge_soak(spark, n_merges: int = 50, base_rows: int = 500_000):
    """Update-heavy-table simulation: N merge-on-read MERGE commits
    against a half-million-row base, periodic compaction, early-vs-late
    commit latency plus read latency at three delete depths. Flat
    commit cost proves O(batch) commits; the read probes prove the
    same-key anti-join union keeps read amplification bounded until
    compaction folds the pending deletes."""
    import tempfile

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    with tempfile.TemporaryDirectory() as wh:
        cat = Catalog(wh)
        cat.create_table("m", schema)
        cat.append(
            spark.range(base_rows).select(
                F.col("id"), F.lit("base").alias("v")
            ),
            "m",
        )

        def read_time():
            t0 = time.time()
            n = cat.read(spark, "m").count()
            return time.time() - t0, n

        r0, _ = read_time()
        lat: list[float] = []
        for i in range(n_merges):
            batch = spark.range(i * 100, i * 100 + 150).select(
                F.col("id"), F.lit(f"m{i}").alias("v")
            )
            t0 = time.time()
            cat.merge_rows(batch, "m", key="id")
            lat.append(time.time() - t0)
        r50, n50 = read_time()
        t0 = time.time()
        cat.compact(spark, "m")
        t_compact = time.time() - t0
        rc, nc = read_time()
        head = sum(lat[:10]) / 10
        tail = sum(lat[-10:]) / 10
        print(
            f"merge-soak: {n_merges} merges on {base_rows} rows; "
            f"commit first-10 avg={head:.2f}s last-10 avg={tail:.2f}s "
            f"ratio={tail / head:.2f}; read 0-deletes={r0:.2f}s "
            f"50-deletes={r50:.2f}s post-compact={rc:.2f}s "
            f"(compact={t_compact:.2f}s); rows {n50}=={nc}"
        )
        assert n50 == nc


def wap_ingest_soak(spark, n_batches: int = 100, rows_per_batch: int = 2_000):
    """Long-running streaming-ingest simulation: N full WAP cycles
    (branch → append → audit → publish → idempotence stamp) with
    periodic compaction, comparing early vs late per-batch latency.
    Flat cost proves the O(1) ingest index, the bounded commit chain,
    and compaction keeping the file count in check."""
    import tempfile

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.sources.datagen import generate_batch
    from no_jvm_wap_with_iceberg_spark.wap import NotNullCheck, WapPipeline

    with tempfile.TemporaryDirectory() as wh:
        cat = Catalog(wh)
        pipe = WapPipeline(
            cat, "soak_table", [NotNullCheck("my_col_1")], compact_every=20
        )
        batch = generate_batch(spark, n=rows_per_batch, no_null=True).cache()
        batch.count()
        lat: list[float] = []
        for i in range(n_batches):
            t0 = time.time()
            res = pipe.run_batch(spark, batch, ingest_key=f"batch-{i}")
            assert res.published, res
            lat.append(time.time() - t0)
        cat.cut_history(keep_last=50)
        cat.gc_metadata(dry_run=False)
        head = sum(lat[:20]) / 20
        tail = sum(lat[-20:]) / 20
        files = len(cat.load_table("soak_table").files())
        print(
            f"wap-ingest-soak: {n_batches} batches x {rows_per_batch} rows; "
            f"first-20 avg={head:.2f}s last-20 avg={tail:.2f}s "
            f"ratio={tail / head:.2f} live-files={files} "
            f"commits={len(cat.log())}"
        )


def changefeed_soak(spark, sizes=(100_000, 400_000), batch=5_000):
    """O(changed data) evidence for read_changes: the SAME mutation
    batch (one append + one MoR delete) against bases of different
    sizes must cost the feed roughly the same — the feed touches the
    files the commits touched, never the table."""
    import tempfile

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    for base_rows in sizes:
        with tempfile.TemporaryDirectory() as wh:
            cat = Catalog(wh)
            cat.create_table("t", schema)
            m0 = cat.append(
                spark.range(base_rows).select(
                    F.col("id"), F.lit("base").alias("v")
                ),
                "t",
            )
            cat.append(
                spark.range(base_rows, base_rows + batch).select(
                    F.col("id"), F.lit("new").alias("v")
                ),
                "t",
            )
            cat.delete_where(
                spark, "t", [],
                f"id < {batch // 2}", mode="mor",
            )
            t0 = time.time()
            n = cat.read_changes(
                spark, "t", m0.current_snapshot_id
            ).count()
            dt = time.time() - t0
            print(
                f"changefeed-soak: base={base_rows} rows, feed of "
                f"{n} change rows in {dt:.2f}s"
            )


def incremental_agg_soak(spark, sizes=(100_000, 1_600_000), batch=5_000):
    """Materialized-view maintenance evidence: the SAME change batch
    against bases of different sizes. Both strategies MATERIALIZE the
    result (a real refresh commits the new aggregate state):
    incremental folds the feed + affected groups and merges — cost
    tracks the batch; full recompute scans the whole source and
    overwrites — cost tracks the base. The crossover is why 100 TB
    pipelines cannot schedule recomputes."""
    import tempfile

    from pyspark.sql import functions as F

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.pipelines import IncrementalAggregate

    def src_rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.col("id") % 50).cast("string").alias("grp"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )

    for base_rows in sizes:
        with tempfile.TemporaryDirectory() as wh:
            cat = Catalog(wh)
            cat.create_table_from_df(src_rows(0, base_rows), "s")
            agg = IncrementalAggregate(
                cat, "s", "a", key="grp", sum_cols={"sv": "v"}
            )
            agg.init(spark)
            # warm one full cycle (JIT + python-worker startup for the
            # merge machinery), then time a second identical cycle
            cat.append(src_rows(base_rows, base_rows + batch), "s")
            agg.refresh(spark)
            cat.append(
                src_rows(base_rows + batch, base_rows + 2 * batch), "s"
            )
            t0 = time.time()
            agg.refresh(spark)
            t_inc = time.time() - t0

            def recompute_materialize():
                full = cat.read(spark, "s").groupBy("grp").agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
                )
                cat.overwrite(full, "a2") if cat.table_exists("a2") \
                    else cat.create_table_from_df(full, "a2")

            recompute_materialize()  # warm
            t0 = time.time()
            recompute_materialize()
            t_full = time.time() - t0
            print(
                f"incr-agg-soak: base={base_rows} rows, "
                f"incremental refresh of {batch}-row change={t_inc:.2f}s "
                f"vs full recompute+overwrite={t_full:.2f}s"
            )


def merge_into_soak(spark, n_merges: int = 40, base_rows: int = 500_000):
    """Conditional MERGE INTO soak: N clause-bearing merges (update
    when s.v differs, delete a sliver, insert new keys) against a
    growing table. Flat commit latency proves the conditional path
    kept merge_rows' O(batch) shape — condition evaluation scans only
    the stats/bloom-pruned matched files, never the table."""
    import tempfile

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    with tempfile.TemporaryDirectory() as wh:
        cat = Catalog(wh)
        cat.create_table("m", schema)
        cat.append(
            spark.range(base_rows).select(F.col("id"), (F.col("id") % 97).alias("v")),
            "m",
        )
        lat: list[float] = []
        for i in range(n_merges):
            src = spark.range(i * 200, i * 200 + 300).select(
                F.col("id"),
                (F.col("id") % 89).alias("v"),
                (F.col("id") % 31 == 0).alias("_del"),
            )
            t0 = time.time()
            cat.merge_into(
                src,
                "m",
                key="id",
                when_matched_delete="s._del",
                when_matched_update="s.v <> t.v",
                when_not_matched_insert="NOT s._del",
                update_set={"v": "s.v"},
            )
            lat.append(time.time() - t0)
        head = sum(lat[:8]) / 8
        tail = sum(lat[-8:]) / 8
        n = cat.read(spark, "m").count()
        print(
            f"merge-into-soak: {n_merges} conditional merges on "
            f"{base_rows} rows; commit first-8 avg={head:.2f}s "
            f"last-8 avg={tail:.2f}s ratio={tail / head:.2f}; rows={n}"
        )


def merge_into_scale_soak(spark, sizes=(100_000, 400_000, 1_600_000), batch=300):
    """The O(batch + matched files) claim (catalog.py merge_into),
    MEASURED rather than asserted (VERDICT r4 #7): the SAME
    clause-bearing merge batch against bases of different sizes.
    Condition evaluation reads only the stats/bloom-pruned files an
    incoming key may live in, and the MoR commit writes O(batch)
    bytes — so commit latency must stay flat as the base grows 16x."""
    import tempfile

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    for base_rows in sizes:
        with tempfile.TemporaryDirectory() as wh:
            cat = Catalog(wh)
            cat.create_table("m", schema)
            cat.append(
                spark.range(base_rows).select(
                    F.col("id"), (F.col("id") % 97).alias("v")
                ),
                "m",
            )

            def one_merge(i):
                src = spark.range(i * 1000, i * 1000 + batch).select(
                    F.col("id"),
                    (F.col("id") % 89).alias("v"),
                    (F.col("id") % 31 == 0).alias("_del"),
                )
                cat.merge_into(
                    src,
                    "m",
                    key="id",
                    when_matched_delete="s._del",
                    when_matched_update="s.v <> t.v",
                    when_not_matched_insert="NOT s._del",
                    update_set={"v": "s.v"},
                )

            one_merge(0)  # warm (JIT + python workers)
            t0 = time.time()
            one_merge(1)
            dt = time.time() - t0
            print(
                f"merge-into-scale-soak: base={base_rows} rows, "
                f"{batch}-row conditional merge commit={dt:.2f}s"
            )


def stream_plan_soak(spark, histories=(10, 200)):
    """Streaming-source planning cost vs commit-log length: time
    latestOffset + partitions for a ONE-commit span on a table with
    short vs long history. Planning is a driver-side metadata walk —
    it must grow only with the metadata JSON, never run a Spark job."""
    import tempfile

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
        ChangeFeedStreamReader,
    )

    for n_commits in histories:
        with tempfile.TemporaryDirectory() as wh:
            cat = Catalog(wh)
            cat.create_table(
                "t",
                T.StructType([T.StructField("id", T.LongType())]),
            )
            df = spark.range(0, 1000).select("id")
            sids = [
                cat.append(df, "t").current_snapshot_id
                for _ in range(n_commits)
            ]
            schema = T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_snapshot_id", T.LongType()),
                ]
            )
            r = ChangeFeedStreamReader(
                schema,
                {"warehouse": wh, "table": "t", "startingoffsets": "earliest"},
            )
            t0 = time.time()
            for _ in range(20):
                end = r.latestOffset()
                parts = r.partitions({"snapshot_id": sids[-2]}, end)
            dt = (time.time() - t0) / 20
            print(
                f"stream-plan-soak: history={n_commits} commits, "
                f"one-commit span plan={dt * 1000:.1f} ms "
                f"({len(parts)} partitions)"
            )




def metadata_delete_scale_soak(spark, sizes=(100_000, 400_000, 1_600_000)):
    """The O(metadata) claim for the whole-file DELETE fast path,
    MEASURED: the same month-boundary retention delete against bases
    16x apart. The exact-condition SQL path drops whole files via
    removed_paths (zero rows read/written), so wall time must stay
    flat in table size; the CONTROL is the same condition made
    uncertifiable (a redundant function conjunct forces the ordinary
    COW rewrite), whose cost grows with the data it rewrites."""
    import datetime as dt
    import tempfile
    import time as _time

    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    for rows in sizes:
        res = {}
        for label, cond in (
            ("fast", "ts < TIMESTAMP '2024-04-01 00:00:00'"),
            (
                "cow",
                "ts < TIMESTAMP '2024-04-01 00:00:00' "
                "AND length('x') = 1",  # uncertifiable: forces rewrite
            ),
        ):
            with tempfile.TemporaryDirectory() as wh:
                cat = Catalog(wh)
                cat.create_table("t", schema, partition_by=["month(ts)"])
                cat.append(
                    spark.range(rows).select(
                        (
                            F.lit(base)
                            + F.make_interval(
                                mins=(F.col("id") % (6 * 30 * 24 * 60))
                            )
                        ).alias("ts"),
                        F.col("id").alias("v"),
                    ),
                    "t",
                )
                t0 = _time.time()
                cat.sql(spark, f"DELETE FROM t WHERE {cond}")
                took = _time.time() - t0
                snap = cat.load_table("t").snapshots[-1]
                res[label] = (
                    took,
                    snap.summary.get("metadata-deleted-files", 0),
                    snap.summary.get("added-files"),
                )
        f, c = res["fast"], res["cow"]
        print(
            f"metadata-delete {rows} rows: fast={f[0]:.2f}s "
            f"(dropped {f[1]} files, wrote {f[2]}) "
            f"cow={c[0]:.2f}s (wrote {c[2]})"
        )


def clone_onboard_scale_soak(spark, sizes=(100_000, 400_000, 1_600_000)):
    """SHALLOW CLONE and add_files must be O(metadata), flat in table
    size: clone cost is the commit-chain copy + one ref CAS; add_files
    cost is one footer read per file + one commit. Measured across 16x
    row growth at a FIXED file count (so the add_files footer work is
    constant and any size-dependence would be a data-path leak)."""
    import tempfile as _tf
    import time as _time

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog

    for rows in sizes:
        with _tf.TemporaryDirectory(prefix="clonesoak_") as d:
            cat = Catalog(os.path.join(d, "wh"))
            ext = os.path.join(d, "ext")
            spark.range(rows).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).repartition(16).write.parquet(ext)
            t0 = _time.time()
            r = cat.add_files(spark, "t", ext)
            t_add = _time.time() - t0
            # grow history so the clone copies a realistic chain
            for i in range(10):
                cat.append(
                    spark.range(i, i + 10).select(
                        F.col("id").alias("k"),
                        (F.col("id") * 2).alias("v"),
                    ),
                    "t",
                )
            t0 = _time.time()
            cat.clone_table("t", "t2")
            t_clone = _time.time() - t0
            assert cat.row_count("t2") == rows + 100
            print(
                f"clone-onboard {rows} rows: add_files={t_add:.2f}s "
                f"({r['files_added']} files) shallow_clone={t_clone:.3f}s"
            )


def incremental_dedup_soak(
    spark, n_ingests: int = 24, rows_per_batch: int = 20_000
):
    """Per-ingest latency of the cross-batch dedup pipeline as the
    corpus grows: each ingest probes the persisted fingerprint index
    (range + per-file bloom pruning) before publishing. Cost per
    ingest is O(batch + bloom-hit files); the component that grows
    with corpus size is the DRIVER-side bloom probing, O(index files
    x batch keys) with a ~2-hash constant — this soak measures where
    that curve actually bends so SCALE.md can state the bucketed
    digest-prefix evolution point honestly instead of guessing."""
    import tempfile as _tf
    import time as _time

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
        dedup_ingest,
    )

    with _tf.TemporaryDirectory(prefix="dedupsoak_") as wh:
        cat = Catalog(wh)
        timings = []
        for i in range(n_ingests):
            lo = i * rows_per_batch
            # 10% of each batch duplicates the previous batch's content
            batch = spark.range(lo, lo + rows_per_batch).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("doc-"),
                    (F.col("id") - (F.col("id") % 10 == 0).cast("long")
                     * rows_per_batch).cast("string"),
                ).alias("text"),
            )
            t0 = _time.time()
            dedup_ingest(spark, cat, batch, "docs", "fp_index")
            timings.append(_time.time() - t0)
        head = sum(timings[1:5]) / 4
        tail = sum(timings[-4:]) / 4
        n_files = len(cat.load_table("fp_index").files())
        print(
            f"incremental-dedup-soak: {n_ingests} ingests x "
            f"{rows_per_batch} rows, index files={n_files}, "
            f"head={head:.2f}s tail={tail:.2f}s ratio={tail / head:.2f}"
        )


def near_dedup_soak(spark, n_ingests: int = 12, rows_per_batch: int = 4_000):
    """Per-ingest latency of the NEAR-dup pipeline as the band index
    grows: each ingest computes batch signatures (fixed cost), probes
    the persisted band index, and verifies candidates exactly. The
    growing component is the band-index probe/scan (16 longs per
    admitted doc); this measures whether it stays invisible at the
    tested scale."""
    import tempfile as _tf
    import time as _time

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
        near_dedup_ingest,
    )

    words = [f"w{i}" for i in range(50)]
    with _tf.TemporaryDirectory(prefix="neardedupsoak_") as wh:
        cat = Catalog(wh)
        timings = []
        for i in range(n_ingests):
            lo = i * rows_per_batch
            # unique 20-word docs (word stream keyed by a large-modulus
            # id mix); ~10% of each batch near-dups the PREVIOUS batch:
            # same 19-word tail, different head word -> j ~ 0.8 >= 0.7
            batch = spark.range(lo, lo + rows_per_batch).selectExpr(
                "id AS doc_id",
                f"""concat(
                  CASE WHEN id % 10 = 0 AND id >= {rows_per_batch}
                       THEN concat('x', id) ELSE concat('h', id) END,
                  ' ',
                  concat_ws(' ', transform(sequence(1, 19), j -> concat(
                    'w',
                    pmod((CASE WHEN id % 10 = 0 AND id >= {rows_per_batch}
                               THEN id - {rows_per_batch} ELSE id END)
                         * 37 + j * 13, 99991)
                  )))
                ) AS text""",
            )
            t0 = _time.time()
            near_dedup_ingest(spark, cat, batch, "docs", "sigs", "bands")
            timings.append(_time.time() - t0)
        head = sum(timings[1:4]) / 3
        tail = sum(timings[-3:]) / 3
        n_files = len(cat.load_table("bands").files())
        print(
            f"near-dedup-soak: {n_ingests} ingests x {rows_per_batch} "
            f"docs, band-index files={n_files}, head={head:.2f}s "
            f"tail={tail:.2f}s ratio={tail / head:.2f}"
        )


if __name__ == "__main__":
    main()
