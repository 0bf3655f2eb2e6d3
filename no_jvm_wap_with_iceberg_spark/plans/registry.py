"""Query registry: named (Spark plan, DuckDB oracle) pairs.

Every query the engine claims is registered here with

- ``spark``: a function ``(SparkSession, sf_dir) -> DataFrame`` built
  with the DataFrame API (Catalyst optimizes: pushdown, pruning, join
  selection), and
- ``oracle``: equivalent ANSI SQL for DuckDB over the same parquet
  views (or None for ops SQL cannot express — those get a weaker
  rows-only check).

Cross-engine determinism rules used throughout (so value hashes match
bit-for-bit):

- Sums/avgs over doubles go through exact DECIMAL arithmetic and are
  cast back to DOUBLE at the end: float addition is not associative,
  so a parallel Spark sum and a sequential DuckDB sum would otherwise
  differ in the last ulp. Decimal sums are exact in both engines.
- Every top-k ORDER BY carries a unique tie-break key.
- Every computed column is aliased identically in both dialects.
- FLOAT columns are cast to DOUBLE before any decimal rounding: Spark
  casts float->decimal through the shortest round-trip string
  ("0.1"), DuckDB through the exact binary expansion
  (0.100000001...), so a direct float->decimal diverges at the ulp.
  float->double is exact in both engines.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def get_queries() -> dict[str, Query]:
    # import for side effects: modules register their queries
    import no_jvm_wap_with_iceberg_spark.plans.relational  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.dedup  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.text  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.similarity  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.clustering  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.pca  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.classify  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.bpe  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.multimodal  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.asof  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.operators.corpus  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.streaming.ingest  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.streaming.sessionize  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.plans.catalog_queries  # noqa: F401
    import no_jvm_wap_with_iceberg_spark.plans.partsupp  # noqa: F401

    return QUERIES
