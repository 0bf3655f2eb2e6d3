"""Corpus-pipeline operator tests: decontamination, repetition,
stratified sampling, sequence packing — semantics plus the plan
shapes that make them scale."""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    pack_bins,
    repetition_profile,
    stratified_keep,
)
from no_jvm_wap_with_iceberg_spark.functions.textfn import words


def test_decontaminate_flags_exact_ngram_overlap(spark):
    eval_set = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares the 5-gram "quick brown fox jumps over"
            (10, "a quick brown fox jumps over fences daily it seems"),
            # no 5-gram overlap
            (11, "completely unrelated text with no shared phrases at all"),
        ],
        ["doc_id", "text"],
    )
    out = decontaminate(corpus, eval_set, "doc_id", "text", n=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {10}
    assert rows[10]["n_hit"] >= 1
    assert rows[10]["n_grams"] == 6  # 10 words -> 6 distinct 5-grams


def test_decontaminate_broadcasts_eval_side(spark):
    eval_set = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(2, "a b c d e g")], ["doc_id", "text"])
    plan = (
        decontaminate(corpus, eval_set, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # eval grams ship to corpus tasks


def test_repetition_profile_counts(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    row = repetition_profile(df, "doc_id", "text").collect()[0]
    # 2-grams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, max 3
    assert row["n_grams_total"] == 5
    assert row["n_grams_distinct"] == 2
    assert row["max_gram_count"] == 3
    assert row["dup_ratio"] == pytest.approx(0.6)


def test_stratified_keep_rate_and_nesting(spark):
    n = 5000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    kept = {
        b: set(
            r["doc_id"]
            for r in stratified_keep(df, "doc_id", F.lit(b))
            .filter("keep = 1")
            .collect()
        )
        for b in range(4)
    }
    rates = [0.2, 0.4, 0.6, 0.8]
    for b, rate in enumerate(rates):
        # md5 output is uniform: observed rate within ~4 sigma
        assert abs(len(kept[b]) / n - rate) < 0.03
    # thresholds are nested, so sample sets are nested (a doc kept at a
    # lower rate is always kept at a higher one — stable downsampling)
    assert kept[0] <= kept[1] <= kept[2] <= kept[3]
    # determinism: same decision on recompute
    again = set(
        r["doc_id"]
        for r in stratified_keep(df, "doc_id", F.lit(1))
        .filter("keep = 1")
        .collect()
    )
    assert again == kept[1]


@pytest.mark.parametrize("n_words", [1, 5, 8, 9, 16, 17, 25])
def test_chunk_documents_covers_and_overlaps(spark, n_words):
    text = " ".join(f"t{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=8, stride=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    # chunk_ids dense from 0; starts advance by the stride
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    toks = text.split(" ")
    seen = set()
    for c in chunks:
        start = c["chunk_id"] * 4
        expect = toks[start : start + 8]
        assert c["chunk_text"].split(" ") == expect
        assert c["n_tokens"] == len(expect)
        seen.update(range(start, start + len(expect)))
    # every token appears in at least one chunk; no phantom windows
    assert seen == set(range(n_words))
    if n_words > 8:
        # last chunk introduces new tokens beyond the previous one
        assert (len(chunks) - 2) * 4 + 8 < n_words


def test_pack_bins_matches_sequential_reference(spark):
    rows = [
        ("s1", i, "w " * (3 + (i * 7) % 11)) for i in range(40)
    ] + [("s2", i, "w " * (2 + (i * 5) % 9)) for i in range(30)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    out = (
        pack_bins(df, "source", "doc_id", F.size(words(F.col("text"))), 16)
        .select("source", "doc_id", "_tok", "bin")
        .collect()
    )
    # sequential reference per shard
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        cum = by_shard.get(r["source"], 0)
        assert r["bin"] == cum // 16
        by_shard[r["source"]] = cum + r["_tok"]
    # bins are dense from 0 per shard
    for src in ("s1", "s2"):
        bins = sorted({r["bin"] for r in out if r["source"] == src})
        assert bins == list(range(len(bins)))


def test_train_val_test_split_nested_and_exhaustive(spark):
    from no_jvm_wap_with_iceberg_spark.operators.corpus import (
        train_val_test_split,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {
        r.doc_id: r.split
        for r in train_val_test_split(df, "doc_id", 0.9, 0.05).collect()
    }
    assert set(s1.values()) == {"train", "val", "test"}
    assert len(s1) == 2000
    n_train = sum(1 for v in s1.values() if v == "train")
    assert 0.85 < n_train / 2000 < 0.95  # md5 uniformity at n=2000
    # nested: growing train only promotes, never demotes
    s2 = {
        r.doc_id: r.split
        for r in train_val_test_split(df, "doc_id", 0.95, 0.025).collect()
    }
    for k, v in s1.items():
        if v == "train":
            assert s2[k] == "train"
    # deterministic across physical layouts
    s3 = {
        r.doc_id: r.split
        for r in train_val_test_split(
            df.repartition(13), "doc_id", 0.9, 0.05
        ).collect()
    }
    assert s1 == s3


def test_token_budget_mix_semantics(spark):
    """Greedy prefix: per-source kept tokens reach the budget with
    overshoot < one document; selection is partitioning-invariant."""
    from pyspark.sql import functions as F

    from no_jvm_wap_with_iceberg_spark.operators.corpus import (
        token_budget_mix,
    )
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    documents = load_table(spark, SF_DIR, "documents")

    out = token_budget_mix(documents, budgets={"src0": 200}, default_budget=400)
    toks = F.size(F.split(F.col("text"), " "))
    stats = {
        r.source: (r.n, r.total, r.biggest)
        for r in out.withColumn("_t", toks)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_t").alias("total"),
            F.max("_t").alias("biggest"),
        )
        .collect()
    }
    for src, (n, total, biggest) in stats.items():
        budget = 200 if src == "src0" else 400
        assert total < budget + biggest, (src, total, budget, biggest)
    # every source with data makes progress
    srcs = {r.source for r in documents.select("source").distinct().collect()}
    assert set(stats) == srcs

    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in token_budget_mix(
            documents.repartition(13), budgets={"src0": 200}, default_budget=400
        ).collect()
    }
    assert a == b, "selection must be partitioning-invariant"


def test_epoch_shuffle_deterministic_and_seeded(spark):
    from pyspark.sql import functions as F

    from no_jvm_wap_with_iceberg_spark.operators.corpus import epoch_shuffle
    from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    documents = load_table(spark, SF_DIR, "documents")

    def ordered_ids(df, seed):
        out = epoch_shuffle(df, seed=seed, shards=8)
        return [
            (r.shard, r.doc_id)
            for r in out.select("shard", "doc_id").collect()
        ]

    a = ordered_ids(documents, seed=1)
    b = ordered_ids(documents.repartition(11), seed=1)
    assert a == b, "same seed: identical permutation on any partitioning"
    c = ordered_ids(documents, seed=2)
    assert sorted(a) != sorted(c) or a != c, "different seed: different order"
    assert {s for s, _ in a} == set(range(8)), "every shard populated"
    assert sorted(i for _, i in a) == sorted(i for _, i in c), "same corpus"
