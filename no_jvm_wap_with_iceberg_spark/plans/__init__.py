from no_jvm_wap_with_iceberg_spark.plans.registry import QUERIES, Query, get_queries

__all__ = ["QUERIES", "Query", "get_queries"]
