"""Physical-plan anti-pattern sweep over every registered query.

For each query, builds the DataFrame at the given sf_dir and inspects
the executed plan string for the scale anti-patterns the 100 TB goal
cares about:

- ``CartesianProduct`` outside the two queries that are cross-joins
  by construction (broadcast brute-force scorers);
- ``Exchange SinglePartition`` feeding data-sized inputs (the global
  windows that die at scale). Whitelisted: queries whose single
  partition provably holds O(ranges)/O(groups) rows, documented
  inline;
- row-at-a-time Python UDFs (``BatchEvalPython``) — Arrow forms
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
  are the sanctioned Python path;
- missing whole-stage codegen entirely.

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any unexpected anti-pattern is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries

# cross joins that are deliberate broadcast-nested-loop scorers: the
# broadcast side is a bounded query/key set, so no shuffle of the big side
CROSS_OK = {
    "similarity_cosine_topk",
    "dedup_embedding_cosine",
    "range_join_price_bands",  # theta join by construction
    "q22_dormant_customers",  # scalar-subquery pattern: single-row
    # threshold broadcast-crossed onto the customer scan
    "q15_top_supplier",  # scalar MAX broadcast-crossed onto the
    # per-supplier aggregate
    "catalog_time_travel",  # crossJoin of two SINGLE-ROW snapshot
    # aggregates (s1 x s2 summary row)
    "sql_time_travel",  # same shape via SQL scalar subqueries
    "q11_important_stock",  # TPC-H Q11's scalar HAVING: the 1-row
    # group total broadcast-crossed onto the per-part aggregate
}
# single-partition exchanges over provably tiny inputs:
SINGLE_OK = {
    "window_ranking_suite",  # 32-row per-range stats only (plan-asserted)
    "dedup_simhash_agreement_gate",  # two single-row cohort fractions
    "q11_important_stock",  # single-row group-total aggregate (HAVING)
    "q6_revenue_forecast",  # single-row aggregate
    "q14_promo_revenue",  # single-row aggregate
    "events_user_funnel",  # per-funnel-step counts (5 rows)
    "setops_customer_cohorts",  # single-row summary
    "dedup_exact_stats",  # single-row summary
    "histogram_order_totals",  # O(buckets) rows
    "events_value_percentiles",  # O(event_types) rows
    "text_corpus_token_stats",  # O(langs) rows
    "text_bpe_token_counts",  # O(langs) rows
    "agg_collect_ordered",  # O(groups) rows
    "fn_scalar_suite",  # 150-row constant-space suite
    "events_anomaly_iqr",  # O(event_types) bounds
    "sketch_events_approx_stats",  # O(event_types) sketches
    "audit_profile_lineitem",  # single-row table profile
    "q17_small_quantity_revenue",  # single-row final aggregate
    "q22_dormant_customers",  # single-row scalar threshold aggregate
    "window_moving_avg_daily_revenue",  # window over DAILY grain after
    # pre-aggregation: O(days) rows (3.7k/decade), not O(orders)
    "q15_top_supplier",  # single-row MAX over the supplier aggregate
    "q19_discounted_revenue",  # single-row final aggregate
    "catalog_time_travel",  # two single-row snapshot summaries crossed
    "sql_time_travel",  # four single-row scalar subqueries joined
    "catalog_schema_evolution",  # single-row final table summary
    "catalog_files_metadata",  # aggregate over O(files) manifest rows
    "catalog_rollback_read",  # single-row final table summary
    "catalog_sql_views",  # single-row summary through the outer view
    # (the per_cust inner view aggregates with a normal hash exchange)
    "dedup_incremental_index",  # single-row corpus summary (the dedup
    # itself shuffles on digests; only the final scalar agg collapses)
    "streaming_interval_join",  # single-row attribution summary (the
    # interval join exchanges hash-partitioned on user_id)
    "dedup_incremental_near",  # single-row corpus summary (banding,
    # verification and publishes all shuffle hash-partitioned)
    "dedup_index_evolution",  # single-row corpus summary, same shape
    # as dedup_incremental_index (the ingests shuffle on digests; the
    # evolution/migration steps repartition by range)
    "dedup_forget_readmit",  # single-row corpus summary, same shape
    "sql_forget_rebuild",  # single-row corpus summary, same shape
    # as dedup_incremental_index (ingests shuffle on digests; the
    # forget's MoR delete reads anti-join broadcast key sets)
    "dedup_index_rebuild",  # single-row corpus summary, same shape
    # as dedup_incremental_index (the rebuild's fingerprint pass
    # shuffles on digests; only the final scalar agg collapses)
    "corpus_quality_resample",  # single-row sample summary (the
    # keep-filter itself is a scan-level predicate, no shuffle)
    "text_perplexity_filter",  # single-row keep-set summary (the LM
    # scoring shuffles per doc_id; only the final scalar collapses)
}


def audit(sf_dir: str) -> int:
    spark = get_spark(app_name="plan_audit")
    failures = []
    for name, q in sorted(get_queries().items()):
        try:
            df = q.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"plan build failed: {e}"))
            continue
        problems = []
        if "CartesianProduct" in plan and name not in CROSS_OK:
            problems.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in CROSS_OK:
            problems.append("BroadcastNestedLoopJoin")
        if "Exchange SinglePartition" in plan and name not in SINGLE_OK:
            problems.append("Exchange SinglePartition")
        if "BatchEvalPython" in plan:
            problems.append("row-at-a-time Python UDF")
        if problems:
            failures.append((name, ", ".join(problems)))
        else:
            print(f"OK    {name}")
    for name, why in failures:
        print(f"BAD   {name}: {why}")
    print(f"\n{len(get_queries()) - len(failures)} clean, {len(failures)} flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
