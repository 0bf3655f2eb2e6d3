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
# positions 50-60), so ordering is load-bearing. Priority: one fast
# canary, then the 11 queries that have never been driver-checked
# (pure-JVM plans first, Python-stage plans last within the block),
# then the broad middle. The tail holds queries that were bit-exact
# green in round 1 AND whose operator class keeps other in-prefix
# coverage — the least is lost if the gate again stops at 50.
_HEAD = [
    "q1_pricing_summary",  # canary: green r1, sub-second
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
    "dedup_embedding_lsh",  # new in round 2, never driver-checked
    "dedup_substring_spans",  # new in round 2, never driver-checked
    "text_quality_rules",  # new in round 2, never driver-checked
    "corpus_decontaminate_eval",  # new in round 2, never driver-checked
    "corpus_repetition_profile",  # new in round 2, never driver-checked
    "corpus_stratified_sample",  # new in round 2, never driver-checked
    "corpus_pack_sequences",  # new in round 2, never driver-checked
    "corpus_chunk_windows",  # new in round 2, never driver-checked
    # TPC-H subquery shapes (EXISTS / NOT EXISTS / correlated scalar
    # aggs), new in round 2, never driver-checked
    "q4_order_priority",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    "q22_dormant_customers",
    # the 7 round-1 hash-mismatch queries (oracle typing fixed in
    # round 2) — must be re-checked, so they sit in the guaranteed slots
    "events_json_extract",
    "fn_array_map_suite",
    "q12_shipmode_priority",
    "events_anomaly_iqr",
    "fn_json_map_suite",
    "text_source_lang_matrix",
    "text_bpe_token_counts",
]
_TAIL = [
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "window_moving_avg_daily_revenue",
    "window_event_gaps",
    "dedup_exact_stats",
    "text_punct_stopword_profile",
    "text_fingerprints",
    "events_value_percentiles",
    "agg_collect_ordered",
    "histogram_order_totals",
    "text_lang_id_confusion",
    "dedup_normalized_fingerprints",
    "unpivot_nation_measures",
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
