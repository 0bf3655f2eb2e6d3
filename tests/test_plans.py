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
