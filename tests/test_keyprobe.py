"""Key-probe pruning (catalog/keyprobe.py + _files_overlapping_keys).

The round-6 probe silently skipped bloom probing above 10k sampled
keys and knew nothing of partition values, so a uniform-digest batch
degraded to a full index scan. These tests pin the three layers of the
round-7 probe:

1. partition-value SET pruning (no key-count cap, exact for the
   transforms the write path derives),
2. per-tuple range slicing driver-side,
3. executor-side bloom/range probing above the driver sample cap.

Every test asserts BOTH directions: no file that truly holds a probe
key is ever pruned (soundness), and provably-clean files are dropped
(effectiveness).
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
    partition_prunes_file,
    partition_value_sets,
)


def _digest_df(spark, ids):
    return spark.createDataFrame(
        [(i,) for i in ids], "id long"
    ).select(F.sha2(F.col("id").cast("string"), 256).alias("fp"), "id")


def _true_hit_paths(cat, meta, fps):
    """Ground truth by reading every live file's key column."""
    hits = set()
    import os

    for f in meta.files():
        vals = set(
            pq.read_table(
                os.path.join(cat.warehouse, f.path), columns=["fp"]
            )["fp"].to_pylist()
        )
        if vals & fps:
            hits.add(f.path)
    return hits


@pytest.fixture()
def indexed(spark, warehouse):
    cat = Catalog(warehouse)
    df = _digest_df(spark, range(0, 400))
    cat.create_table(
        "idx",
        df.schema,
        partition_by=["truncate(2, fp)"],
        sort_by=["fp"],
        bloom_cols=["fp"],
    )
    cat.append(df, "idx")
    return cat


def test_partition_set_prunes_and_never_misses(spark, indexed):
    cat = indexed
    meta = cat.load_table("idx")
    assert len(meta.files()) > 20  # one file per touched 2-hex prefix
    probe_ids = list(range(350, 420))  # 50 present, 20 absent
    probe = _digest_df(spark, probe_ids).select("fp")
    fps = {r["fp"] for r in probe.collect()}
    affected = cat._files_overlapping_keys(meta, ["fp"], probe)
    got = {f.path for f, _ in affected}
    truth = _true_hit_paths(cat, meta, fps)
    assert truth <= got, "probe pruned a file that holds a probe key"
    # 70 probe prefixes cannot touch all ~150+ index files
    assert len(got) < len(meta.files()) * 0.75


def test_partition_value_sets_bounded_and_exact(spark, indexed):
    cat = indexed
    meta = cat.load_table("idx")
    probe = _digest_df(spark, [1, 2, 3]).select("fp")
    sets = partition_value_sets(meta, ["fp"], probe)
    assert len(sets) == 1
    ps = sets[0]
    assert ps.key_index == 0 and "fp_truncate2" in ps.pnames
    fps = sorted(r["fp"] for r in probe.collect())
    expect = {v[:2] for v in fps}
    assert ps.values == frozenset(expect)
    # per-partition bounds are exactly the batch keys' min/max there
    for pv, (lo, hi) in ps.bounds.items():
        in_p = [v for v in fps if v[:2] == pv]
        assert (lo, hi) == (min(in_p), max(in_p))
    # a file in a non-probed prefix proves clean; a probed one doesn't
    for f in meta.files():
        pv = f.partition["fp_truncate2"]
        assert partition_prunes_file(f, sets) == (pv not in expect)


def test_executor_probe_above_driver_cap(spark, indexed, monkeypatch):
    cat = indexed
    # force the executor path with a tiny driver cap
    monkeypatch.setattr(Catalog, "PROBE_DRIVER_KEYS_MAX", 8)
    meta = cat.load_table("idx")
    probe_ids = list(range(380, 460))  # 80 keys > cap; 20 present
    probe = _digest_df(spark, probe_ids).select("fp")
    fps = {r["fp"] for r in probe.collect()}
    affected = cat._files_overlapping_keys(meta, ["fp"], probe)
    got = {f.path for f, _ in affected}
    truth = _true_hit_paths(cat, meta, fps)
    assert truth <= got
    # range+bloom on ~2-row files must cut nearly everything clean
    assert len(got) < len(meta.files()) * 0.75


def test_executor_probe_without_partitioning(spark, warehouse, monkeypatch):
    """The executor path alone (sorted+bloomed, unpartitioned index)
    must both stay sound and actually prune — this is the layout every
    pre-r7 index table has on disk."""
    cat = Catalog(warehouse)
    df = _digest_df(spark, range(0, 2000))
    cat.create_table("flat", df.schema, sort_by=["fp"], bloom_cols=["fp"])
    for lo in range(0, 2000, 250):  # several appends -> several files
        cat.append(_digest_df(spark, range(lo, lo + 250)), "flat")
    monkeypatch.setattr(Catalog, "PROBE_DRIVER_KEYS_MAX", 10)
    meta = cat.load_table("flat")
    n_files = len(meta.files())
    assert n_files > 3
    probe_ids = list(range(1900, 2100))  # 100 present, 100 absent
    probe = _digest_df(spark, probe_ids).select("fp")
    fps = {r["fp"] for r in probe.collect()}
    affected = cat._files_overlapping_keys(meta, ["fp"], probe)
    got = {f.path for f, _ in affected}
    truth = _true_hit_paths(cat, meta, fps)
    assert truth <= got


def test_partition_evolution_prunes_both_eras(spark, warehouse):
    cat = Catalog(warehouse)
    df1 = _digest_df(spark, range(0, 200))
    cat.create_table(
        "evo",
        df1.schema,
        partition_by=["truncate(2, fp)"],
        sort_by=["fp"],
        bloom_cols=["fp"],
    )
    cat.append(df1, "evo")
    cat.evolve_partition_spec("evo", ["truncate(4, fp)"])
    cat.append(_digest_df(spark, range(200, 400)), "evo")
    meta = cat.load_table("evo")
    names = {k for f in meta.files() for k in f.partition}
    assert {"fp_truncate2", "fp_truncate4"} <= names
    probe_ids = list(range(150, 260))  # spans both eras
    probe = _digest_df(spark, probe_ids).select("fp")
    fps = {r["fp"] for r in probe.collect()}
    affected = cat._files_overlapping_keys(meta, ["fp"], probe)
    got = {f.path for f, _ in affected}
    truth = _true_hit_paths(cat, meta, fps)
    assert truth <= got
    assert len(got) < len(meta.files())  # both eras contributed prunes


def test_null_and_missing_partition_values_keep_conservatively():
    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import PartSet
    from no_jvm_wap_with_iceberg_spark.catalog.table import FileEntry

    sets = [PartSet(0, ["p_truncate2"], frozenset({"ab"}), {})]
    null_f = FileEntry(
        path="a", rows=1, bytes=1, columns={},
        partition={"p_truncate2": "__HIVE_DEFAULT_PARTITION__"},
    )
    missing_f = FileEntry(path="b", rows=1, bytes=1, columns={}, partition={})
    hit_f = FileEntry(
        path="c", rows=1, bytes=1, columns={}, partition={"p_truncate2": "ab"}
    )
    miss_f = FileEntry(
        path="d", rows=1, bytes=1, columns={}, partition={"p_truncate2": "cd"}
    )
    assert not partition_prunes_file(null_f, sets)
    assert not partition_prunes_file(missing_f, sets)
    assert not partition_prunes_file(hit_f, sets)
    assert partition_prunes_file(miss_f, sets)


def test_upsert_on_partitioned_table_stays_exact(spark, warehouse):
    """End-to-end: keyed mutation through the probe on a bucketed
    table — rewrite only touches files that may hold the keys, and
    the result is byte-equal to a plain overwrite-by-key."""
    cat = Catalog(warehouse)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(300)], "k long, v string"
    )
    cat.create_table(
        "upt", base.schema, partition_by=["bucket(16, k)"],
        sort_by=["k"], bloom_cols=["k"],
    )
    cat.append(base, "upt")
    ups = spark.createDataFrame(
        [(5, "NEW5"), (250, "NEW250"), (999, "NEW999")], "k long, v string"
    )
    cat.upsert(ups, "upt", key="k")
    got = {(r["k"], r["v"]) for r in cat.read(spark, "upt").collect()}
    expect = {(i, f"v{i}") for i in range(300) if i not in (5, 250)}
    expect |= {(5, "NEW5"), (250, "NEW250"), (999, "NEW999")}
    assert got == expect


def test_partitioned_index_binpack_keeps_pruning(spark, warehouse):
    """Maintenance story for the prefix-partitioned dedup index: small
    per-ingest files accumulate one-per-touched-prefix; binpack folds
    them back (the rewrite re-derives partition values, so the layout
    survives) and the probe stays sound AND effective afterwards."""
    from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
        dedup_ingest,
    )

    cat = Catalog(warehouse)

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("text"),
        )

    for lo in (0, 150, 300):
        dedup_ingest(
            spark, cat, batch(lo, lo + 150), "docs", "fp_index",
            index_prefix_width=2,  # pinned: the test asserts THIS layout
        )
    n_before = len(cat.load_table("fp_index").files())
    cat.compact(spark, "fp_index", mode="binpack")
    meta = cat.load_table("fp_index")
    n_after = len(meta.files())
    assert n_after < n_before  # small files folded
    assert all("fp" not in f.partition or True for f in meta.files())
    pname = "fingerprint_truncate2"
    assert all(pname in f.partition for f in meta.files())  # layout kept
    probe = batch(400, 500).select(
        F.sha2(F.col("text"), 256).alias("fingerprint")
    )
    # probe digests are sha256(sha256(id)) -> disjoint from the index
    affected = cat._files_overlapping_keys(meta, ["fingerprint"], probe)
    assert len(affected) < n_after  # still prunes post-compaction
    # and a RE-INGEST of old content still dedups exactly (soundness)
    res = dedup_ingest(spark, cat, batch(0, 150), "docs", "fp_index")
    assert res.rows_published == 0 and not res.published


def test_partition_value_sets_multi_era_single_job(spark, warehouse):
    """Round-8 (ADVICE r7): an evolved table has several eras over the
    same key column; the combined groupBy must return one EXACT
    PartSet per era — identical to what the per-field fallback
    computes — and the fallback must engage when the combined
    cardinality blows the cap."""
    import no_jvm_wap_with_iceberg_spark.catalog.keyprobe as kp

    cat = Catalog(warehouse)
    df1 = _digest_df(spark, range(0, 50))
    cat.create_table(
        "evo2", df1.schema, partition_by=["truncate(2, fp)"],
        sort_by=["fp"], bloom_cols=["fp"],
    )
    cat.append(df1, "evo2")
    cat.evolve_partition_spec("evo2", ["truncate(4, fp)"])
    cat.append(_digest_df(spark, range(50, 100)), "evo2")
    meta = cat.load_table("evo2")
    probe = _digest_df(spark, [3, 7, 99]).select("fp")
    sets = kp.partition_value_sets(meta, ["fp"], probe)
    assert len(sets) == 2  # one per era
    by_name = {ps.pnames[0]: ps for ps in sets}
    fps = sorted(r["fp"] for r in probe.collect())
    for width, pname in ((2, "fp_truncate2"), (4, "fp_truncate4")):
        ps = by_name[pname]
        assert ps.values == frozenset(v[:width] for v in fps)
        for pv, (lo, hi) in ps.bounds.items():
            in_p = [v for v in fps if v[:width] == pv]
            assert (lo, hi) == (min(in_p), max(in_p))
    # the per-field fallback (cap exceeded) computes the same evidence
    usable = [(0, f, "fp") for f in meta.all_partition_fields]
    fb = kp._per_field_sets(meta, ["fp"], probe, usable)
    assert {ps.pnames[0]: (ps.values, ps.bounds) for ps in fb} == {
        ps.pnames[0]: (ps.values, ps.bounds) for ps in sets
    }


def test_probe_fast_path_matches_general_and_reference(spark):
    """probe_files_spark's sorted-keys fast path (single STRING key
    column — the digest hot path) must produce the same admit set as
    (a) the general multi-column mask path, forced by padding a
    constant second key column with evidence-free specs (which cannot
    change admissions: absent bounds pass, absent bloom passes), and
    (b) a pure-python reference of the documented semantics — across
    str bounds, absent bounds, incomparable (non-str) bounds, and
    blooms that genuinely reject."""
    import random

    from no_jvm_wap_with_iceberg_spark.catalog.bloom import (
        bloom_may_contain,
        build_bloom,
    )
    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        probe_files_spark,
    )

    rnd = random.Random(7)

    def hexk():
        return f"{rnd.randrange(16**8):08x}"

    keys = sorted({hexk() for _ in range(400)})
    kdf1 = spark.createDataFrame([(k,) for k in keys], "k string")
    kdf2 = kdf1.withColumn("pad", F.lit("x"))

    cands = []
    for j in range(150):
        r = rnd.random()
        if r < 0.55:  # honest string ranges, some bloomed
            lo, hi = sorted((hexk(), hexk()))
            if rnd.random() < 0.6:
                # half the blooms hold IN-RANGE keys (can admit), half
                # hold unrelated values (must reject in-range keys)
                in_range = [k for k in keys if lo <= k <= hi]
                vals = (
                    in_range[:4]
                    if in_range and rnd.random() < 0.5
                    else [hexk() + "zz" for _ in range(4)]
                )
                bloom = build_bloom(vals)
            else:
                bloom = None
            cands.append((j, [(lo, hi, bloom)]))
        elif r < 0.75:  # absent bounds, bloom optional
            bloom = build_bloom([keys[0], "nope"]) if rnd.random() < 0.5 else None
            cands.append((j, [(None, None, bloom)]))
        else:  # incomparable (non-str) bounds: conservative range-pass
            bloom = build_bloom(["nothing"]) if rnd.random() < 0.4 else None
            cands.append((j, [(5, 9_000_000, bloom)]))

    got_fast = probe_files_spark(kdf1, ["k"], cands)
    pad = (None, None, None)
    got_general = probe_files_spark(
        kdf2, ["k", "pad"], [(j, cols + [pad]) for j, cols in cands]
    )

    expect = set()
    for j, ((lo, hi, bloom),) in [(j, tuple(c)) for j, c in cands]:
        for k in keys:
            if isinstance(lo, str) and isinstance(hi, str) and not (
                lo <= k <= hi
            ):
                continue
            if bloom is not None and not bloom_may_contain(bloom, k):
                continue
            expect.add(j)
            break

    assert got_fast == expect
    assert got_general == expect


def test_probe_fast_path_numeric_keys(spark):
    """Same three-way consistency for a single NUMERIC key column
    (band-hash longs, integer-id upserts): fast sorted path ==
    general mask path == pure-python reference."""
    import random

    from no_jvm_wap_with_iceberg_spark.catalog.bloom import (
        bloom_may_contain,
        build_bloom,
    )
    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        probe_files_spark,
    )

    rnd = random.Random(11)
    keys = sorted({rnd.randrange(-(2**40), 2**40) for _ in range(300)})
    kdf1 = spark.createDataFrame([(k,) for k in keys], "k long")
    kdf2 = kdf1.withColumn("pad", F.lit("x"))

    cands = []
    for j in range(120):
        r = rnd.random()
        if r < 0.6:  # honest numeric ranges, some bloomed
            lo, hi = sorted(
                (rnd.randrange(-(2**40), 2**40), rnd.randrange(-(2**40), 2**40))
            )
            if rnd.random() < 0.6:
                in_range = [k for k in keys if lo <= k <= hi]
                vals = (
                    in_range[:4]
                    if in_range and rnd.random() < 0.5
                    else [2**50 + i for i in range(4)]
                )
                bloom = build_bloom(vals)
            else:
                bloom = None
            cands.append((j, [(lo, hi, bloom)]))
        elif r < 0.8:  # absent bounds
            bloom = build_bloom([keys[0]]) if rnd.random() < 0.5 else None
            cands.append((j, [(None, None, bloom)]))
        else:  # incomparable (str) bounds against numeric keys
            bloom = build_bloom(["nothing"]) if rnd.random() < 0.4 else None
            cands.append((j, [("aa", "zz", bloom)]))

    got_fast = probe_files_spark(kdf1, ["k"], cands)
    pad = (None, None, None)
    got_general = probe_files_spark(
        kdf2, ["k", "pad"], [(j, cols + [pad]) for j, cols in cands]
    )

    expect = set()
    for j, ((lo, hi, bloom),) in [(j, tuple(c)) for j, c in cands]:
        for k in keys:
            if (
                isinstance(lo, (int, float))
                and isinstance(hi, (int, float))
                and not (lo <= k <= hi)
            ):
                continue
            if bloom is not None and not bloom_may_contain(bloom, k):
                continue
            expect.add(j)
            break

    assert got_fast == expect
    assert got_general == expect


def test_folded_bounds_equal_agg_bounds(spark, warehouse):
    """When every key column is a partition source, the probe folds
    global key bounds from the partition-value sets instead of paying
    a second full-batch agg job. The fold must equal the agg exactly —
    including null keys (both ignore them) and across an evolved
    (two-era) spec."""
    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        partition_value_sets,
    )
    from no_jvm_wap_with_iceberg_spark.catalog.pruning import _norm

    cat = Catalog(warehouse)
    df = _digest_df(spark, range(0, 50))
    cat.create_table(
        "fb", df.schema, partition_by=["truncate(2, fp)"], sort_by=["fp"]
    )
    cat.append(df, "fb")
    cat.evolve_partition_spec("fb", ["truncate(4, fp)"])
    meta = cat.load_table("fb")

    kdf = _digest_df(spark, range(10, 40)).select("fp").unionByName(
        spark.createDataFrame([(None,)], "fp string")
    )
    sets = partition_value_sets(meta, ["fp"], kdf)
    assert {ps.key_index for ps in sets} == {0}
    assert len(sets) == 2  # both eras contribute
    los = [
        lo
        for ps in sets
        for lo, _hi in ps.bounds.values()
        if lo is not None
    ]
    his = [
        hi
        for ps in sets
        for _lo, hi in ps.bounds.values()
        if hi is not None
    ]
    row = kdf.agg(F.min("fp"), F.max("fp")).first()
    assert (min(los), max(his)) == (_norm(row[0]), _norm(row[1]))

    # and the probe path end-to-end (fold active: no dup_guard) stays
    # sound against ground truth
    fps = {r["fp"] for r in kdf.collect() if r["fp"] is not None}
    affected = cat._files_overlapping_keys(meta, ["fp"], kdf)
    got = {f.path for f, _ in affected}
    assert _true_hit_paths(cat, meta, fps) <= got


def test_executor_probe_numeric_key_end_to_end(spark, warehouse, monkeypatch):
    """The numeric sorted fast path through the full keyed-mutation
    stack: a long-keyed sorted+bloomed table upserted with a batch
    ABOVE the driver sample cap (forcing the executor probe), result
    byte-equal to an overwrite-by-key — and the probe actually pruned
    (the untouched key range's files were not rewritten)."""
    cat = Catalog(warehouse)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k long, v string"
    )
    cat.create_table("num", base.schema, sort_by=["k"], bloom_cols=["k"])
    for lo in range(0, 2000, 500):  # 4 appends -> >= 4 files
        cat.append(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(lo, lo + 500)],
                "k long, v string",
            ),
            "num",
        )
    files_before = {f.path for f in cat.load_table("num").files()}
    assert len(files_before) >= 4
    monkeypatch.setattr(Catalog, "PROBE_DRIVER_KEYS_MAX", 10)
    ups = spark.createDataFrame(
        [(i, f"NEW{i}") for i in range(1500, 1600)] + [(5000, "NEW5000")],
        "k long, v string",
    )
    cat.upsert(ups, "num", key="k")
    got = {(r["k"], r["v"]) for r in cat.read(spark, "num").collect()}
    expect = {
        (i, f"v{i}") for i in range(2000) if not 1500 <= i < 1600
    }
    expect |= {(i, f"NEW{i}") for i in range(1500, 1600)}
    expect |= {(5000, "NEW5000")}
    assert got == expect
    # effectiveness: files wholly outside [1500, 1600) survive untouched
    files_after = {f.path for f in cat.load_table("num").files()}
    assert files_before & files_after, "probe rewrote every file"


def test_probe_bucket_evidence_prunes_per_tuple(spark):
    """Per-tuple bucket-identity evidence (4th evidence element): a
    hash-bucketed column's value range scatters across the space and
    its bloom saturates at production rows/file, so the file's OWN
    bucket(N, col) partition value is the only evidence that can
    reject a tuple belonging to another bucket. Pinned on BOTH probe
    paths (executor-side via probe_files_spark directly; driver-side
    via _files_overlapping_keys with a small key set) after
    tools/soak_forget_manifest.py showed the composite band delete
    degrading to O(table) without it."""
    import zlib

    from pyspark.sql import types as T

    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        probe_files_spark,
    )
    from no_jvm_wap_with_iceberg_spark.catalog.table import (
        FileEntry,
        Snapshot,
        TableMetadata,
    )

    def bucket(v, n=4):
        return zlib.crc32(str(v).encode()) % n

    vals = list(range(100, 140))  # spread across all 4 buckets
    kdf = spark.createDataFrame([(v,) for v in vals], "k long")

    # every candidate's range covers every key (the scatter regime);
    # no blooms; only the bucket evidence distinguishes them
    cands = [
        (b, [(0, 10_000, None, (4, b))]) for b in range(4)
    ]
    got = probe_files_spark(kdf, ["k"], cands)
    assert got == {bucket(v) for v in vals}  # admitted iff a key maps to it
    # a key set confined to one bucket admits exactly that file
    one = [v for v in vals if bucket(v) == 2][:3]
    got_one = probe_files_spark(
        spark.createDataFrame([(v,) for v in one], "k long"), ["k"], cands
    )
    assert got_one == {2}
    # legacy 3-tuple evidence still accepted (range admits everything)
    got_legacy = probe_files_spark(
        kdf, ["k"], [(j, [(0, 10_000, None)]) for j in range(4)]
    )
    assert got_legacy == {0, 1, 2, 3}

    # driver-side path through _files_overlapping_keys: a composite
    # (band_hash, key) probe against a bucket-partitioned manifest
    # whose per-file ranges all cover the probe hashes — only the
    # tuple's own bucket file may be targeted
    files = [
        FileEntry(
            path=f"tables/band/data/{b}/f{b}.parquet",
            rows=1000,
            bytes=1 << 20,
            columns={
                "band_hash": {"nulls": 0, "min": 0, "max": 10_000},
                "doc_id": {"nulls": 0, "min": 0, "max": 10_000},
            },
            partition={"band_hash_bucket4": str(b)},
        )
        for b in range(4)
    ]
    schema = T.StructType(
        [
            T.StructField("band_hash", T.LongType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    meta = TableMetadata(
        table="band",
        schema_json=schema.jsonValue(),
        snapshots=[Snapshot(1, None, 0, "append", files)],
        current_snapshot_id=1,
        version=1,
        partition_by=["bucket(4, band_hash)"],
        sort_by=["band_hash"],
    )
    import tempfile

    cat = Catalog(tempfile.mkdtemp(prefix="bucket_ev_"))
    h = next(v for v in range(200, 300) if bucket(v) == 1)
    pairs = spark.createDataFrame([(h, 7)], "band_hash LONG, doc_id LONG")
    hit = cat._files_overlapping_keys(meta, ["band_hash", "doc_id"], pairs)
    assert [f.partition["band_hash_bucket4"] for f, _ in hit] == ["1"]


def test_probe_bucket_grouping_matches_pure_reference(spark):
    """The bucket-grouped row-subset path (a per-(column, N)
    bucket-sorted index replaced the full-chunk masks) must admit
    exactly the documented semantics across randomized mixed
    evidence — ranges, blooms, bucket identity, nulls, multiple
    moduli (partition-evolution eras) — pinned against a pure-python
    reference of the tuple-admission rule."""
    import random
    import zlib

    from no_jvm_wap_with_iceberg_spark.catalog.bloom import (
        bloom_may_contain,
        build_bloom,
    )
    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        probe_files_spark,
    )

    rnd = random.Random(41)
    rows = [
        (
            rnd.randrange(0, 1000) if rnd.random() > 0.05 else None,
            rnd.randrange(0, 10_000),
        )
        for _ in range(300)
    ]
    kdf = spark.createDataFrame(rows, "a long, b long")

    def bucket(v, n):
        return zlib.crc32(str(v).encode()) % n

    cands = []
    for j in range(120):
        specs = []
        for col in range(2):
            mn = rnd.randrange(0, 800) if rnd.random() < 0.6 else None
            mx = mn + rnd.randrange(50, 4000) if mn is not None else None
            bloom = None
            if rnd.random() < 0.3:
                vals = [r[col] for r in rows if r[col] is not None]
                bloom = build_bloom(rnd.sample(vals, 5) if rnd.random() < 0.5
                                    else [999_999 + k for k in range(5)])
            bk = None
            if col == 0 and rnd.random() < 0.6:
                n = rnd.choice((4, 8, 64))
                bk = (n, rnd.randrange(0, n))
            specs.append((mn, mx, bloom, bk))
        cands.append((j, specs))

    got = probe_files_spark(kdf, ["a", "b"], cands)

    def tuple_admits(t, specs):
        for i, (mn, mx, bloom, bk) in enumerate(specs):
            v = t[i]
            if v is None:
                continue  # null component: no evidence applies
            if bk is not None and bucket(v, bk[0]) != bk[1]:
                return False
            if mn is not None and mx is not None and not (mn <= v <= mx):
                return False
            if bloom is not None and not bloom_may_contain(bloom, v):
                return False
        return True

    expect = {
        j
        for j, specs in cands
        if any(tuple_admits(t, specs) for t in set(rows))
    }
    assert got == expect


def test_local_partition_sets_match_spark(spark, warehouse):
    """partition_value_sets_local (the probe's zero-job driver-side
    derivation over a complete key sample) must produce EXACTLY the
    PartSets the Spark aggregation produces — same values, same
    per-partition bounds, same pnames — for every transform/type it
    accepts, and must refuse (return None) whenever byte-identity with
    the write path's partition expressions is not provable."""
    import random

    from no_jvm_wap_with_iceberg_spark.catalog.keyprobe import (
        partition_value_sets,
        partition_value_sets_local,
    )

    rnd = random.Random(0xBEEF)
    cat = Catalog(warehouse)

    def assert_match(meta, key_cols, kdf):
        keys = [tuple(r) for r in kdf.select(*key_cols).collect()]
        local = partition_value_sets_local(meta, key_cols, keys)
        assert local is not None
        via_spark = partition_value_sets(meta, key_cols, kdf)
        assert len(local) == len(via_spark)
        for a, b in zip(local, via_spark):
            assert a.key_index == b.key_index
            assert a.pnames == b.pnames
            assert a.values == b.values
            assert a.bounds == b.bounds

    # truncate(string) across an evolution (two eras), with nulls
    df = _digest_df(spark, range(0, 60))
    cat.create_table("lt", df.schema, partition_by=["truncate(2, fp)"])
    cat.append(df, "lt")
    cat.evolve_partition_spec("lt", ["truncate(4, fp)"])
    kdf = _digest_df(spark, rnd.sample(range(0, 100), 30)).select(
        "fp"
    ).unionByName(spark.createDataFrame([(None,)], "fp string"))
    assert_match(cat.load_table("lt"), ["fp"], kdf)

    # bucket(long) + truncate(long) + identity(long), negative values
    ids = [rnd.randint(-10_000, 10_000) for _ in range(200)] + [None]
    iddf = spark.createDataFrame([(i,) for i in ids], "id long")
    for spec in (["bucket(8, id)"], ["truncate(1000, id)"], ["id"]):
        t = f"lt_{spec[0][:2]}{len(spec[0])}"
        cat.create_table(t, iddf.schema, partition_by=spec)
        assert_match(cat.load_table(t), ["id"], iddf)

    # bucket(string) including non-ascii values (utf-8 crc is exact)
    sdf = spark.createDataFrame(
        [("héllo-ünïcode",), ("plain",), (None,), ("Ωmega",)], "s string"
    )
    cat.create_table("lbs", sdf.schema, partition_by=["bucket(4, s)"])
    assert_match(cat.load_table("lbs"), ["s"], sdf)

    # composite key over a bucketed band index shape
    bdf = spark.createDataFrame(
        [(rnd.randint(-(2**62), 2**62), rnd.randint(0, 50)) for _ in range(150)],
        "band_hash long, doc_id long",
    )
    cat.create_table(
        "lbb", bdf.schema, partition_by=["bucket(8, band_hash)"]
    )
    assert_match(cat.load_table("lbb"), ["band_hash", "doc_id"], bdf)

    # refusals: non-ascii TRUNCATE strings, calendar transforms,
    # non-int/str key values
    meta_t = cat.load_table("lt")
    assert partition_value_sets_local(meta_t, ["fp"], [("héllo",)]) is None
    tdf = spark.createDataFrame(
        [("2024-01-02 03:04:05",)], "ts string"
    ).select(F.col("ts").cast("timestamp"))
    cat.create_table("lcal", tdf.schema, partition_by=["day(ts)"])
    import datetime

    assert (
        partition_value_sets_local(
            cat.load_table("lcal"), ["ts"], [(datetime.datetime(2024, 1, 2),)]
        )
        is None
    )
