"""End-to-end curation pipeline: WAP + dedup + quality composed."""

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.pipelines import curate_documents
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_curation_pipeline_end_to_end(spark, warehouse):
    cat = Catalog(warehouse)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    res = curate_documents(spark, cat, docs)
    assert res.published, res.failed_checks
    assert res.raw_rows == docs.count()
    removed = (
        res.exact_dups_removed + res.near_dups_removed + res.low_quality_removed
    )
    assert res.curated_rows == res.raw_rows - removed
    assert res.curated_rows > 0

    # curated table is published on main, has no exact dups left, and
    # the branch is gone
    curated = cat.read(spark, "documents_curated")
    assert curated.count() == curated.select("text").distinct().count()
    assert res.branch not in cat.list_branches()

    # a dirty batch (null text) fails the audit, leaves the branch open,
    # and publishes nothing new
    dirty = spark.createDataFrame([(10_000_000, None)], "doc_id long, text string")
    rows_before = cat.row_count("documents_raw", "main")
    res2 = curate_documents(spark, cat, dirty)
    assert not res2.published and res2.failed_checks
    assert cat.row_count("documents_raw", "main") == rows_before
    assert res2.branch in cat.list_branches()  # forensic handle


def test_curation_rule_gate_and_span_ratio(spark, warehouse):
    """The rule gate and the duplicated-span cap drop exactly the docs
    that fail them, on top of exact/near dedup."""
    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.pipelines.curation import curate_documents

    boiler = "the shared boilerplate passage repeats one two three four five"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),  # clean
        (2, "@#$% ^&*! @#$% ^&*! the @#$% !!!! ???? ++++"),  # fails rules
        (3, boiler + " unique alpha beta"),  # boilerplate-heavy
        (4, boiler + " unique gamma delta"),  # boilerplate-heavy
        (5, "a genuinely distinct document about the weather and tea"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cat = Catalog(warehouse)
    res = curate_documents(
        spark,
        cat,
        docs,
        apply_rules=True,
        max_span_dup_ratio=0.5,
    )
    assert res.published
    kept = {
        r["doc_id"] for r in cat.read(spark, "documents_curated").collect()
    }
    assert 1 in kept and 5 in kept
    assert 2 not in kept  # symbol-heavy fails the rule gate
    # docs 3/4 share most spans -> dup_ratio above the cap for both
    assert 3 not in kept and 4 not in kept
    assert res.low_quality_removed >= 3


def test_curation_decontaminate_repetition_and_sample(spark, warehouse):
    """The opt-in corpus gates: repetition cap drops the looping doc,
    eval-set decontamination drops the doc sharing a 5-gram with the
    benchmark, and the deterministic downsample reproduces exactly."""
    eval_doc = "canonical benchmark question about the meaning of life"
    rows = [
        (1, "a perfectly normal document describing tea ceremonies in depth"),
        # contains the eval doc's 5-gram "benchmark question about the meaning"
        (2, "students ask a benchmark question about the meaning of tests"),
        # intra-doc loop: dup 2-gram ratio near 1
        (3, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (4, "another clean and unique document mentioning rivers and stars"),
        (5, "yet another unique document on the economics of small farms"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eval_set = spark.createDataFrame([(100, eval_doc)], "doc_id long, text string")
    cat = Catalog(warehouse)
    res = curate_documents(
        spark,
        cat,
        docs,
        eval_set=eval_set,
        max_dup_gram_ratio=0.5,
    )
    assert res.published
    kept = {r["doc_id"] for r in cat.read(spark, "documents_curated").collect()}
    assert kept == {1, 4, 5}
    assert res.contaminated_removed == 1
    assert res.low_quality_removed == 1  # the repetition loop
    assert res.sampled_out == 0

    # sampling: deterministic and counted
    cat2 = Catalog(warehouse + "_s")
    big = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with enough words to pass the gates easily")).alias("text"),
    )
    r1 = curate_documents(spark, cat2, big, sample_rate=0.5)
    assert r1.published and 0 < r1.sampled_out < 500
    ids1 = {r["doc_id"] for r in cat2.read(spark, "documents_curated").collect()}
    cat3 = Catalog(warehouse + "_s2")
    r2 = curate_documents(spark, cat3, big, sample_rate=0.5)
    ids2 = {r["doc_id"] for r in cat3.read(spark, "documents_curated").collect()}
    assert ids1 == ids2  # byte-identical sample on re-run


def test_curation_learned_classifier_gate(spark, warehouse):
    """Train a logistic quality model on labeled docs, then gate the
    curation flow with it: the published corpus contains exactly the
    docs the model accepts (among those surviving earlier gates), and
    the bookkeeping splits model removals from rule removals."""
    from no_jvm_wap_with_iceberg_spark.operators.classify import (
        logreg_fit,
        logreg_score,
        text_features,
    )

    cat = Catalog(warehouse)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    # label: English docs are "high quality" for this test
    labeled = text_features(docs, "doc_id", "text").join(
        docs.select(
            "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
        ),
        "doc_id",
    )
    w = logreg_fit(labeled, "y", ["x1", "x2", "x3"], iters=4, lr=0.5)

    res = curate_documents(
        spark,
        cat,
        docs.select("doc_id", "text"),
        classifier_weights=w,
        classifier_threshold=0.4,
    )
    assert res.published
    curated = cat.read(spark, "documents_curated")
    scored = logreg_score(
        text_features(curated, "doc_id", "text"), w, ["x1", "x2", "x3"]
    )
    assert scored.filter(F.col("prob") < 0.4).count() == 0
    assert res.curated_rows == res.raw_rows - (
        res.exact_dups_removed
        + res.near_dups_removed
        + res.low_quality_removed
        + res.model_filtered
    )


def test_incremental_aggregate_tracks_recompute(spark, warehouse):
    """Incremental refresh must be BIT-identical to a from-scratch
    recompute after every mutation kind, tombstone emptied groups,
    advance the cursor atomically with the merge, and no-op on an
    unchanged source."""
    from pyspark.sql import functions as F

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.pipelines import IncrementalAggregate

    cat = Catalog(warehouse)
    rows = [(i, f"g{i % 3}", float(i)) for i in range(30)]
    src = spark.createDataFrame(rows, "id long, grp string, v double")
    cat.create_table_from_df(src.filter("id < 20"), "src")

    agg = IncrementalAggregate(
        cat, "src", "dst", key="grp", sum_cols={"sv": "v"}
    )
    agg.init(spark)

    def recompute():
        return {
            (r.grp, r.n_rows, float(r.sv))
            for r in cat.read(spark, "src")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
            )
            .collect()
        }

    def state():
        return {
            (r.grp, r.n_rows, float(r.sv))
            for r in cat.read(spark, "dst").collect()
        }

    assert state() == recompute()

    cat.append(src.filter("id >= 20"), "src")  # append
    cur1 = agg.refresh(spark)
    assert state() == recompute()
    # cursor rode the merge commit
    props = cat.load_table("dst").properties
    assert props["incr_src_cursor"] == str(cur1)

    # unchanged source: refresh is a no-op, same cursor
    n_snaps = len(cat.load_table("dst").snapshots)
    assert agg.refresh(spark) == cur1
    assert len(cat.load_table("dst").snapshots) == n_snaps

    cat.delete_where(spark, "src", [], "id % 4 = 1", mode="mor")  # MoR delete
    agg.refresh(spark)
    assert state() == recompute()

    cat.update_where(  # COW update changes a group's sum
        spark, "src", [], "id % 5 = 0", {"v": "v + 100.0"}
    )
    agg.refresh(spark)
    assert state() == recompute()

    # empty an entire group -> its aggregate row must disappear
    cat.delete_where(spark, "src", [], "grp = 'g2'", mode="mor")
    agg.refresh(spark)
    assert state() == recompute()
    assert not any(g == "g2" for g, _, _ in state())
