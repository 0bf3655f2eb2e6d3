"""Round-8 scale hardening of the incremental dedup pipelines
(VERDICT r7 next-round items 1, 3, 4 + ADVICE r7):

- the exact-dedup index's prefix width is SELF-SIZING: new indexes
  start at truncate(1, fingerprint) and auto-evolve per
  INDEX_WIDTH_SCHEDULE as the digest count grows; both eras keep
  pruning and dedup stays exact across an evolution step;
- a pinned ``index_prefix_width`` against an EXISTING index warns
  instead of silently doing nothing;
- batch-derived sets are broadcast-hinted only under
  BROADCAST_MAX_ROWS — above it the pipelines run unhinted (AQE
  decides) and stay correct;
- a batch of thousands of IDENTICAL docs collapses keep-first BEFORE
  the band self-join, so the candidate pair set is bounded instead of
  quadratic in the copy count.
"""

import time
import warnings

import pytest
from pyspark.sql import functions as F

import no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup as idd
from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
    )


# ---------------------------------------------------------------------------
# self-sizing index width
# ---------------------------------------------------------------------------
def test_new_index_starts_at_width_one(spark, warehouse):
    cat = Catalog(warehouse)
    idd.dedup_ingest(spark, cat, _batch(spark, 0, 10), "docs", "fp_index")
    meta = cat.load_table("fp_index")
    assert meta.partition_by == ["truncate(1, fingerprint)"]


def test_index_width_auto_evolves_and_stays_exact(
    spark, warehouse, monkeypatch
):
    # shrink the schedule so a test-sized corpus crosses both steps
    monkeypatch.setattr(
        idd, "INDEX_WIDTH_SCHEDULE", ((900, 4), (300, 2))
    )
    cat = Catalog(warehouse)
    widths = []
    for i in range(3):
        idd.dedup_ingest(
            spark, cat, _batch(spark, i * 400, (i + 1) * 400),
            "docs", "fp_index",
        )
        widths.append(idd._index_width(cat.load_table("fp_index")))
    # 400 digests -> width 2 after batch 1; 800 still < 900 after
    # batch 2; 1200 -> width 4 after batch 3
    assert widths == [2, 2, 4]
    meta = cat.load_table("fp_index")
    assert meta.partition_by == ["truncate(4, fingerprint)"]
    # the evolution's full rewrite MIGRATED every narrow-era file into
    # the current layout (a narrow-era file's saturated bloom and
    # full-span range would be admitted by every probe forever)
    assert all(
        "fingerprint_truncate4" in f.partition for f in meta.files()
    )
    # dedup stays exact across the evolution: full replay admits nothing
    res = idd.dedup_ingest(
        spark, cat, _batch(spark, 0, 1200), "docs", "fp_index"
    )
    assert res.rows_published == 0 and res.seen_dups == 1200
    # and a probe for absent digests still touches zero files
    probe = _docs(spark, [(1, "never-seen-xyz")]).select(
        idd.fingerprint_expr("text").alias("fingerprint")
    )
    assert not cat._files_overlapping_keys(meta, ["fingerprint"], probe)


def test_pinned_width_respected_and_not_evolved(spark, warehouse):
    cat = Catalog(warehouse)
    idd.dedup_ingest(
        spark, cat, _batch(spark, 0, 10), "docs", "fp_index",
        index_prefix_width=3,
    )
    meta = cat.load_table("fp_index")
    assert meta.partition_by == ["truncate(3, fingerprint)"]
    assert idd._index_width(meta) == 3


def test_pinned_width_against_existing_index_warns(spark, warehouse):
    cat = Catalog(warehouse)
    idd.dedup_ingest(spark, cat, _batch(spark, 0, 5), "docs", "fp_index")
    with pytest.warns(UserWarning, match="index_prefix_width=4 ignored"):
        idd.dedup_ingest(
            spark, cat, _batch(spark, 5, 10), "docs", "fp_index",
            index_prefix_width=4,
        )
    # the no-op is only for the WIDTH; the ingest itself still landed
    assert cat.read(spark, "docs").count() == 10
    # matching pin (width 1 == creation default) stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        idd.dedup_ingest(
            spark, cat, _batch(spark, 10, 15), "docs", "fp_index",
            index_prefix_width=1,
        )


def test_target_width_schedule():
    assert idd._target_width(0) == 1
    assert idd._target_width(99_999) == 1
    assert idd._target_width(100_000) == 2
    assert idd._target_width(9_999_999) == 2
    assert idd._target_width(10_000_000) == 4


# ---------------------------------------------------------------------------
# size-gated broadcasts
# ---------------------------------------------------------------------------
def test_hint_small_gates_on_row_count(spark):
    df = spark.range(5)
    hinted = idd._hint_small(df, 10)
    assert hinted is not df  # under the cap: hint applied
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    over = idd._hint_small(df, idd.BROADCAST_MAX_ROWS + 1)
    assert over is df  # over the cap: the plan is untouched
    assert idd._hint_small(df, None) is df  # unknown count: no hint


def test_pipelines_correct_without_any_broadcast_hint(
    spark, warehouse, monkeypatch
):
    """With the cap forced to 0 every _hint_small call must pass the
    frame through UNHINTED (asserted via a spy), and both pipelines
    still produce exactly the same admissions."""
    monkeypatch.setattr(idd, "BROADCAST_MAX_ROWS", 0)
    passed_through = []
    real = idd._hint_small

    def spy(df, n_rows):
        out = real(df, n_rows)
        passed_through.append(out is df)
        return out

    monkeypatch.setattr(idd, "_hint_small", spy)
    cat = Catalog(warehouse)
    r1 = idd.dedup_ingest(
        spark, cat, _docs(spark, [(1, "aa"), (2, "bb"), (3, "aa")]),
        "docs", "fp_index",
    )
    r2 = idd.dedup_ingest(
        spark, cat, _docs(spark, [(4, "bb"), (5, "cc")]), "docs", "fp_index"
    )
    assert (r1.rows_published, r2.rows_published, r2.seen_dups) == (2, 1, 1)
    near = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "totally different words entirely here"),
    ]
    n1 = idd.near_dedup_ingest(
        spark, cat, _docs(spark, near), "nd_docs", "nd_sigs", "nd_bands"
    )
    n2 = idd.near_dedup_ingest(
        spark, cat, _docs(spark, [(9, "alpha beta gamma delta epsilon")]),
        "nd_docs", "nd_sigs", "nd_bands",
    )
    assert (n1.rows_published, n2.rows_published, n2.seen_dups) == (2, 0, 1)
    assert passed_through and all(passed_through)


# ---------------------------------------------------------------------------
# identical-doc batches: bounded, not quadratic
# ---------------------------------------------------------------------------
def test_identical_doc_batch_is_not_quadratic(spark, warehouse):
    """5,000 byte-identical docs in ONE batch: before the keep-first
    collapse this was a 12.5M-pair band self-join; now the self-join
    sees a single representative. Bounded wall-clock is the symptom;
    the admission counts prove the collapse is outcome-identical."""
    cat = Catalog(warehouse)
    batch = spark.range(5_000).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("the same exact document body repeated many times").alias(
            "text"
        ),
    )
    t0 = time.time()
    res = idd.near_dedup_ingest(
        spark, cat, batch, "docs", "sigs", "bands"
    )
    elapsed = time.time() - t0
    assert res.rows_published == 1
    assert res.in_batch_dups == 4_999 and res.seen_dups == 0
    kept = cat.read(spark, "docs").collect()
    assert [r.doc_id for r in kept] == [0]  # keep-first = min key
    # generous bound: the quadratic path took minutes at this size
    assert elapsed < 120, f"in-batch self-join no longer bounded: {elapsed}s"


def test_collapse_preserves_near_dup_outcomes(spark, warehouse):
    """Mixed batch: copies collapse, a genuine near-dup of the
    representative still drops, distinct docs and shingle-less docs
    pass exactly as before the collapse existed."""
    cat = Catalog(warehouse)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (5, base),
        (1, base),          # identical, smaller key -> representative
        (3, near),          # j = 9/11 < 0.7? no: 9 shared 3-grams of 8/8 ... verified exactly below
        (7, "completely unrelated content with many different words"),
        (8, "tiny doc"),    # < 3 words: no shingles, passes through
        (9, "tiny doc"),    # identical tiny doc ALSO passes (no shingle set)
    ]
    res = idd.near_dedup_ingest(
        spark, cat, _docs(spark, rows), "docs", "sigs", "bands"
    )
    kept = sorted(r.doc_id for r in cat.read(spark, "docs").collect())
    # 1 keeps (min of the identical pair); 3's fate is decided by the
    # EXACT jaccard rule, same as pre-collapse: shingles(base) has 8
    # 3-grams, shingles(near) 8, intersection 7 -> 10*7 >= 7*(8+8-7)
    # -> 70 >= 63 -> near-dup, drops against smaller key 1
    assert kept == [1, 7, 8, 9]
    assert res.rows_published == 4
    assert res.in_batch_dups == 2  # doc 5 (copy) + doc 3 (near-dup)


# ---------------------------------------------------------------------------
# width-logic properties (no Spark)
# ---------------------------------------------------------------------------
def test_target_width_is_monotone():
    from hypothesis import given, strategies as st

    @given(st.integers(min_value=0, max_value=10**12),
           st.integers(min_value=0, max_value=10**12))
    def prop(a, b):
        lo, hi = sorted((a, b))
        assert idd._target_width(lo) <= idd._target_width(hi)

    prop()


def test_index_width_parses_only_fingerprint_prefix_specs():
    class M:
        def __init__(self, pb):
            self.partition_by = pb

    assert idd._index_width(M(["truncate(1, fingerprint)"])) == 1
    assert idd._index_width(M(["truncate(16, fingerprint)"])) == 16
    assert idd._index_width(M(["truncate( 2 , fingerprint )"])) == 2
    # anything else is a caller-pinned layout: leave it alone
    assert idd._index_width(M([])) is None
    assert idd._index_width(M(None)) is None
    assert idd._index_width(M(["bucket(64, fingerprint)"])) is None
    assert idd._index_width(M(["truncate(2, other_col)"])) is None
    assert idd._index_width(
        M(["truncate(2, fingerprint)", "bucket(4, doc_id)"])
    ) is None


# ---------------------------------------------------------------------------
# self-sizing bucket counts (near-dup indexes)
# ---------------------------------------------------------------------------
def _near_batch(spark, lo, hi):
    # >= 3 distinct words per doc so every doc has shingles
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(
            F.lit("unique body "),
            F.sha2(F.col("id").cast("string"), 256),
            F.lit(" alpha beta"),
        ).alias("text"),
    )


def test_near_indexes_start_at_eight_buckets(spark, warehouse):
    cat = Catalog(warehouse)
    idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 0, 10), "d", "s", "bt"
    )
    assert cat.load_table("s").partition_by == ["bucket(8, doc_id)"]
    assert cat.load_table("bt").partition_by == ["bucket(8, band_hash)"]


def test_near_bucket_counts_evolve_independently(
    spark, warehouse, monkeypatch
):
    """The band table holds 16 rows per doc, so it crosses a row
    threshold ~16x sooner than the signature table — each must evolve
    on its OWN count, and dedup must stay exact across the step."""
    monkeypatch.setattr(idd, "BUCKET_COUNT_SCHEDULE", ((1_000, 64),))
    cat = Catalog(warehouse)
    # 100 docs -> sigs 100 rows (< 1000), bands 1600 rows (>= 1000)
    idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 0, 100), "d", "s", "bt"
    )
    assert cat.load_table("s").partition_by == ["bucket(8, doc_id)"]
    bmeta = cat.load_table("bt")
    assert bmeta.partition_by == ["bucket(64, band_hash)"]
    # migration rewrote the 8-bucket era under the new spec
    assert all("band_hash_bucket64" in f.partition for f in bmeta.files())
    # exactness across the evolution: full replay admits nothing
    res = idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 0, 100), "d", "s", "bt"
    )
    assert res.rows_published == 0 and res.seen_dups == 100


def test_pinned_buckets_against_existing_index_warns(spark, warehouse):
    cat = Catalog(warehouse)
    idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 0, 5), "d", "s", "bt"
    )
    with pytest.warns(UserWarning, match="index_buckets=32 ignored"):
        idd.near_dedup_ingest(
            spark, cat, _near_batch(spark, 5, 10), "d", "s", "bt",
            index_buckets=32,
        )
    assert cat.read(spark, "d").count() == 10


# ---------------------------------------------------------------------------
# review hardening: interrupted migration + durable pins
# ---------------------------------------------------------------------------
def test_interrupted_migration_is_finished_by_next_ingest(
    spark, warehouse, monkeypatch
):
    """Evolution is two commits (spec change, then the migration
    rewrite). If the rewrite is lost between them, the width check
    alone would never retry — old-era files would be admitted by
    every probe forever. The next ingest must detect the debris (live
    files lacking the current spec's field) and finish the rewrite."""
    monkeypatch.setattr(idd, "INDEX_WIDTH_SCHEDULE", ((300, 2),))
    cat = Catalog(warehouse)
    real_compact = Catalog.compact
    fail_once = {"armed": True}

    def flaky_compact(self, spark_, table, branch="main", **kw):
        if kw.get("mode") == "full" and fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("simulated crash between the two commits")
        return real_compact(self, spark_, table, branch, **kw)

    monkeypatch.setattr(Catalog, "compact", flaky_compact)
    idd.dedup_ingest(spark, cat, _batch(spark, 0, 400), "docs", "fp_index")
    meta = cat.load_table("fp_index")
    assert meta.partition_by == ["truncate(2, fingerprint)"]  # spec landed
    # ...but the migration did not: width-1 debris is still live
    assert any(
        "fingerprint_truncate2" not in f.partition for f in meta.files()
    )
    idd.dedup_ingest(spark, cat, _batch(spark, 400, 410), "docs", "fp_index")
    meta = cat.load_table("fp_index")
    assert all(
        "fingerprint_truncate2" in f.partition for f in meta.files()
    ), "next ingest must finish the interrupted migration"
    # and dedup stayed exact throughout
    res = idd.dedup_ingest(
        spark, cat, _batch(spark, 0, 410), "docs", "fp_index"
    )
    assert res.rows_published == 0


def test_pinned_layout_survives_unpinned_ingests(
    spark, warehouse, monkeypatch
):
    """The pin is recorded on the TABLE at creation, so maintenance
    must never evolve a pinned layout even when later ingest calls
    omit the parameter and the corpus is far past every threshold."""
    monkeypatch.setattr(idd, "INDEX_WIDTH_SCHEDULE", ((10, 2),))
    monkeypatch.setattr(idd, "BUCKET_COUNT_SCHEDULE", ((10, 64),))
    cat = Catalog(warehouse)
    idd.dedup_ingest(
        spark, cat, _batch(spark, 0, 50), "docs", "fp_index",
        index_prefix_width=3,
    )
    idd.dedup_ingest(spark, cat, _batch(spark, 50, 100), "docs", "fp_index")
    assert cat.load_table("fp_index").partition_by == [
        "truncate(3, fingerprint)"
    ]
    idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 0, 50), "d", "s", "bt",
        index_buckets=16,
    )
    idd.near_dedup_ingest(
        spark, cat, _near_batch(spark, 50, 100), "d", "s", "bt"
    )
    assert cat.load_table("bt").partition_by == ["bucket(16, band_hash)"]
    assert cat.load_table("s").partition_by == ["bucket(16, doc_id)"]
