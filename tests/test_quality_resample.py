"""Deterministic weighted downsample (operators/corpus.quality_resample)."""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.operators.corpus import quality_resample


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 + 1).cast("int").alias("w"),
    )


def test_deterministic_and_nested(spark):
    d = _docs(spark)
    a1 = {r.doc_id for r in quality_resample(d, "doc_id", "w", 0.2).collect()}
    a2 = {r.doc_id for r in quality_resample(d, "doc_id", "w", 0.2).collect()}
    assert a1 == a2  # same sample on every run
    b = {r.doc_id for r in quality_resample(d, "doc_id", "w", 0.5).collect()}
    assert a1 <= b  # raising the fraction only adds rows


def test_weighting_biases_toward_heavy_rows(spark):
    d = _docs(spark)
    kept = quality_resample(d, "doc_id", "w", 0.3)
    rates = (
        kept.groupBy((F.col("w") > 50).alias("heavy"))
        .count()
        .collect()
    )
    got = {r.heavy: r["count"] for r in rates}
    assert got[True] > got[False] * 1.5  # heavy rows kept ~3x more


def test_full_rate_keeps_nearly_everything(spark):
    d = _docs(spark, 500)
    # frac * w/max caps at 1.0 for the max-weight rows; a frac far
    # above 1 saturates every row's threshold
    kept = quality_resample(d, "doc_id", "w", 200.0)
    assert kept.count() == 500


def test_nonpositive_weights_raise(spark):
    d = _docs(spark, 10).withColumn("w", F.lit(0))
    with pytest.raises(ValueError, match="positive max weight"):
        quality_resample(d, "doc_id", "w", 0.5)


def test_perplexity_filter_keeps_fluent_majority(spark):
    # the corpus-MLE LM scores the synthetic docs in a tight band;
    # the threshold keeps the fluent majority and drops a tail
    from no_jvm_wap_with_iceberg_spark.operators.text import (
        text_perplexity_filter,
    )
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    row = text_perplexity_filter(spark, sf).collect()[0]
    assert 0 < row.n_kept and row.sum_bigrams > 0
