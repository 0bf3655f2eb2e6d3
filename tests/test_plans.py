"""Physical-plan regression tests: the optimizations SCALE.md claims
must actually appear in the executed plans, and stay there."""

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    df.collect()  # let AQE finalize
    full = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial Plan
    # ==": assert against the final (executed) section only
    return full.split("== Initial Plan ==")[0]


def test_scan_pushdown_and_column_pruning(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # ReadSchema prunes to the two referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_q5_broadcasts_all_joins_single_shuffle(spark):
    plan = _plan(get_queries()["q5_local_supplier_volume"].spark(spark, SF_DIR))
    assert "SortMergeJoin" not in plan  # every join broadcast at test SF
    assert "BroadcastHashJoin" in plan
    # exactly one real shuffle: the final groupBy exchange
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles == 1, f"expected 1 shuffle, plan has {shuffles}"


def test_q18_preaggregates_before_join(spark):
    """The lineitem aggregate must sit BELOW the orders join (the
    rewrite that keeps the shuffle narrow)."""
    plan = _plan(get_queries()["q18_large_orders"].spark(spark, SF_DIR))
    agg_pos = plan.find("sum(")  # quantity pre-aggregation
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_topk_uses_take_ordered(spark):
    plan = _plan(get_queries()["topk_expensive_items"].spark(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_no_cartesian_products_in_equi_queries(spark):
    for name in ("q3_shipping_priority", "q10_returned_items", "join_semi_anti"):
        plan = _plan(get_queries()[name].spark(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_whole_stage_codegen_covers_relational_core(spark):
    plan = _plan(get_queries()["q1_pricing_summary"].spark(spark, SF_DIR))
    # "*(n)" prefixes mark whole-stage-codegen'd operators
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_two_pass_ranking_has_no_data_sized_global_sort(spark):
    """window_ranking_suite: the only single-partition exchange may be
    the per-range stats (32 rows); the data path range-partitions
    (now materialized behind a localCheckpoint so the sampled
    boundaries are consistent across consumers — the checkpoint
    truncates the visible plan to a Scan ExistingRDD) and takes the
    offsets via broadcast. Global-rank uniqueness proves the ranges
    composed correctly."""
    df = get_queries()["window_ranking_suite"].spark(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange SinglePartition") <= 1
    # the checkpointed range-partitioned stage feeds both consumers
    assert "Scan ExistingRDD" in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    ranks = [r.rnk for r in df.select("rnk").collect()]
    assert len(ranks) == len(set(ranks)), "global ranks must be unique"


def test_mor_read_filters_only_targeted_files(spark, tmp_path):
    """A pending MoR delete is applied in ONE pass: a single scan of
    the live files (no per-group union), the seq-gated NOT(cond)
    filter exactly once, and rows from files newer than the delete are
    untouched by construction (seq comparison, asserted on data)."""
    from pyspark.sql import functions as F, types as T

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    cat = Catalog(str(tmp_path / "wh"))
    cat.create_table("t", schema, sort_by=["id"])
    cat.append(
        spark.range(100).select(F.col("id"), F.lit("x").alias("name")), "t"
    )
    cat.append(
        spark.range(100, 200).select(F.col("id"), F.lit("y").alias("name")), "t"
    )
    cat.delete_where(
        spark, "t", Predicate.between("id", 0, 9), "id BETWEEN 0 AND 9", mode="mor"
    )
    # a post-delete append: the delete must NOT apply to it even
    # though its rows match the condition
    cat.append(
        spark.range(0, 5).select(F.col("id"), F.lit("late").alias("name")), "t"
    )
    plan = _plan(cat.read(spark, "t"))
    # single-pass read: no per-group union, one data FileScan relation
    # plus one key/seq attach, the seq-gated delete condition once
    assert plan.count("NOT coalesce") == 1, plan
    out = cat.read(spark, "t")
    assert out.count() == 195  # 200 - 10 deleted + 5 late
    assert out.filter("name = 'late'").count() == 5  # late rows survive
    assert out.filter("name = 'x' AND id < 10").count() == 0


def test_gram_construction_never_runs_in_scan_filters(spark):
    """Regression lock for the InferFiltersFromGenerate pathology: a
    plain explode(computed_grams) lets Catalyst infer size(grams) > 0
    and predicate pushdown substitutes the WHOLE gram expression into
    the parquet scan's DataFilters — below any repartition, so the
    heaviest expression runs single-task and is evaluated twice
    (measured 10.5 s vs 0.5 s on decontamination at sf0.1). The
    gram-exploding operators use explode_outer + a post-generate null
    filter, which the rule skips; the scan filters must therefore
    never contain gram construction (concat_ws) again."""
    for name in (
        "corpus_decontaminate_eval",
        "corpus_repetition_profile",
        "corpus_chunk_windows",
        "dedup_ngram_jaccard",
        "dedup_substring_spans",
    ):
        plan = _plan(get_queries()[name].spark(spark, SF_DIR))
        for node in plan.splitlines():
            if "FileScan" in node or "DataFilters" in node:
                assert "concat_ws" not in node, (name, node[:200])


def test_plan_audit_sweep_is_clean(spark):
    """No registered query may regress into a scale anti-pattern:
    cartesian/nested-loop joins outside the deliberate broadcast
    scorers, data-sized single-partition exchanges, or row-at-a-time
    Python UDFs (tools/plan_audit.py holds the whitelists + reasons)."""
    import tools.plan_audit as pa

    from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries

    failures = []
    for name, q in sorted(get_queries().items()):
        plan = _plan(q.spark(spark, SF_DIR))
        if "CartesianProduct" in plan and name not in pa.CROSS_OK:
            failures.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in pa.CROSS_OK:
            failures.append((name, "BroadcastNestedLoopJoin"))
        if "Exchange SinglePartition" in plan and name not in pa.SINGLE_OK:
            failures.append((name, "Exchange SinglePartition"))
        if "BatchEvalPython" in plan:
            failures.append((name, "row-at-a-time Python UDF"))
    assert not failures, failures
