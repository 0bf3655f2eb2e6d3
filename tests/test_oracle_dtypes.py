"""Dtype-class regression lock for every DuckDB oracle string.

The driver's correctness gate hashes both result sets through a
pandas/Arrow conversion that is *type-sensitive*: a DuckDB HUGEINT or
DECIMAL output column arrives as float64 and hashes as ``1.0`` even
when the Spark side produced a bit-identical BIGINT ``1``.  That
exact artifact kept ``events_sessionization`` driver-red for two
rounds while values were identical cell-by-cell (VERDICT r3 #1).

This test walks ALL registered oracle strings through DuckDB's
``.df()`` (the dtype-collapsing path) at sf0.001 and asserts every
output column's pandas dtype *class* is compatible with the Spark
plan's declared schema:

- Spark int-like  -> int dtype (or float64 only when the column
  actually contains NULLs — pandas promotes nullable ints on BOTH
  sides of the driver compare, so that case still hashes equal)
- Spark float-like -> float dtype
- Spark decimal output -> always red (convention: cast to
  DOUBLE/BIGINT at the end; Decimal objects never hash equal to
  float64 across the driver's pandas path)

One DuckDB pass + one lazy Spark plan-build per query; no Spark jobs
for plain relational queries.
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import types as T

from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries
from no_jvm_wap_with_iceberg_spark.sources.registry import TESTDATA_TABLES
from tests.conftest import SF_DIR

_INT_SPARK = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_SPARK = (T.FloatType, T.DoubleType)
_TIME_SPARK = (T.TimestampType, T.TimestampNTZType, T.DateType)


def _spark_class(dt: T.DataType) -> str:
    if isinstance(dt, _INT_SPARK):
        return "int"
    if isinstance(dt, _FLOAT_SPARK):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, _TIME_SPARK):
        return "time"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    return "other"


def _pandas_class(col: pd.Series) -> tuple[str, bool]:
    """(dtype class, column-has-nulls) for one oracle output column."""
    has_null = bool(col.isna().any())
    if pd.api.types.is_bool_dtype(col):
        return "bool", has_null
    if pd.api.types.is_integer_dtype(col):
        return "int", has_null
    if pd.api.types.is_float_dtype(col):
        return "float", has_null
    if pd.api.types.is_datetime64_any_dtype(col):
        return "time", has_null
    # object column: classify from the first non-null value
    sample = col.dropna()
    if len(sample) == 0:
        return "empty", has_null
    v = sample.iloc[0]
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool", has_null
    if isinstance(v, str):
        return "str", has_null
    if isinstance(v, (bytes, bytearray)):
        return "bytes", has_null
    if isinstance(v, decimal.Decimal):
        return "decimal", has_null
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list", has_null
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return "time", has_null
    if isinstance(v, (int, np.integer)):
        return "int", has_null
    if isinstance(v, (float, np.floating)):
        return "float", has_null
    return "other", has_null


def _compatible(spark_cls: str, pd_cls: str, has_null: bool) -> bool:
    if spark_cls == "decimal":
        return False  # convention violation on the Spark side itself
    if spark_cls == pd_cls:
        return True
    # pandas promotes nullable int/bool to float/object on BOTH sides
    # of the driver compare, so only-with-nulls promotion is benign
    if spark_cls in ("int", "bool") and pd_cls == "float" and has_null:
        return True
    if pd_cls == "empty":
        return True  # zero rows at sf0.001: nothing to hash
    return False


def test_all_oracles_dtype_class_matches_spark_schema(spark):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    problems = []
    checked = 0
    for name, q in sorted(get_queries().items()):
        if q.oracle is None:
            continue
        schema = q.spark(spark, SF_DIR).schema
        opdf = con.execute(q.oracle).df()
        spark_by_col = {f.name: _spark_class(f.dataType) for f in schema.fields}
        for col in opdf.columns:
            if col not in spark_by_col:
                continue  # column-name drift is the mimic's job
            pd_cls, has_null = _pandas_class(opdf[col])
            if not _compatible(spark_by_col[col], pd_cls, has_null):
                problems.append(
                    f"{name}.{col}: spark={spark_by_col[col]} "
                    f"oracle-pandas={pd_cls} (has_null={has_null})"
                )
        checked += 1
    assert checked > 100, f"sweep only reached {checked} oracles"
    assert not problems, "dtype-class drift (driver hash would diverge):\n" + "\n".join(
        problems
    )
