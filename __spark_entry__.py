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


# The round-1 driver gate recorded rows for exactly the first 50
# registered queries (registration-order prefix; the absent 11 were
# positions 50-60), so ordering is load-bearing. The first 50 slots
# are curated by hand: one fast canary, every query that has never
# been driver-checked (the 11 r1-absent ones, the round-2 additions),
# the 7 round-1 hash-mismatch queries whose oracle typing was fixed,
# then ONE representative per operator family from the r1-bit-exact
# set so no family vanishes from the gate if it again stops at 50.
# The tail is r1-green redundancy WITHIN families — the least is lost
# if it is cut; rotate it into the head in later rounds.
_HEAD = [
    "q1_pricing_summary",  # canary: green r1, sub-second
    # --- the 11 queries absent from CORRECTNESS_r01 ---
    "asof_purchase_last_click",
    "streaming_windowed_counts",
    "events_sessionization",
    "similarity_cosine_topk",
    "similarity_label_centroid_stats",
    "similarity_ann_lsh_topk",
    "similarity_ann_ivf_topk",
    "multimodal_payload_stats",
    "multimodal_feature_extract",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    # --- new in round 2, never driver-checked ---
    "dedup_embedding_lsh",
    "dedup_substring_spans",
    "text_quality_rules",
    "corpus_decontaminate_eval",
    "corpus_repetition_profile",
    "corpus_stratified_sample",
    "corpus_pack_sequences",
    "corpus_chunk_windows",
    # TPC-H subquery shapes (EXISTS / NOT EXISTS / correlated scalar)
    "q4_order_priority",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    "q22_dormant_customers",
    # --- new in round 2 (late): TPC-H joins + text pipeline ops ---
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "text_pii_scrub",
    "text_vocab_top_terms",
    # --- the 7 round-1 hash-mismatch queries (oracle typing fixed) ---
    "events_json_extract",
    "fn_array_map_suite",
    "q12_shipmode_priority",
    "events_anomaly_iqr",
    "fn_json_map_suite",
    "text_source_lang_matrix",
    "text_bpe_token_counts",
    # --- family representatives from the r1-bit-exact set (slots
    # 33-50): joins, dedup, text, windows, events, grouping, audit ---
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_embedding_cosine",
    "text_quality_profile",
    "text_lang_id_confusion",
    "window_top3_orders_per_customer",
    "window_ranking_suite",
    "events_hourly_rollup",
    "events_user_funnel",
    "agg_orders_cube",
    "audit_profile_lineitem",
]
_TAIL = [
    "q5_local_supplier_volume",
    "q18_large_orders",
    "dedup_ngram_jaccard",
    "dedup_exact_keep_first",
    "text_corpus_token_stats",
    "window_running_revenue",
    "q6_revenue_forecast",
    "q7_nation_pair_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "join_semi_anti",
    "range_join_price_bands",
    "topk_expensive_items",
    "setops_customer_cohorts",
    "subquery_parts_above_brand_avg",
    "rollup_nation_region",
    "pivot_orders_status_by_priority",
    "unpivot_nation_measures",
    "window_moving_avg_daily_revenue",
    "window_event_gaps",
    "events_value_percentiles",
    "sketch_events_approx_stats",
    "fn_scalar_suite",
    "histogram_order_totals",
    "agg_collect_ordered",
    "dedup_exact_stats",
    "dedup_simhash_profile",
    "dedup_normalized_fingerprints",
    "text_fingerprints",
    "text_punct_stopword_profile",
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
