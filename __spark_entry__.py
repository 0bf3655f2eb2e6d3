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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in get_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: q.oracle for name, q in get_queries().items() if q.oracle is not None
    }
