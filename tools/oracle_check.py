"""Local mimic of the driver's t2 correctness gate.

Runs every registered query's Spark plan and DuckDB oracle on the
same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name — the
driver's documented compare).

The compare is **dtype-class sensitive**, mimicking the driver's
pandas/Arrow hashing path: both sides are materialized as pandas
DataFrames (Spark via ``toPandas()``, DuckDB via ``.df()``) and every
cell is tagged with its numeric class before hashing, so an oracle
column that DuckDB types as HUGEINT/DECIMAL (rendered float64 by the
pandas conversion) fails against a Spark BIGINT even when the values
are numerically identical.  The previous ``fetchall()``-based compare
collapsed HUGEINT to Python ``int`` and hid exactly that bug class
for two rounds (events_sessionization, VERDICT r3 finding #1/#2).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.sources.registry import TESTDATA_TABLES
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries


def norm_cell(v):
    """Normalize one pandas cell into a hashable, dtype-class-tagged value.

    Integer-class and float-class values get distinct tags so that a
    ``1`` (int64) never compares equal to ``1.0`` (float64) — the
    driver's hash is type-sensitive in exactly this way.
    """
    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()  # np.int64 -> int, np.float64 -> float: class preserved
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NaT"
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat() + "T00:00:00")
    try:
        if pd.isna(v):
            return "NaN"
    except (TypeError, ValueError):
        pass
    return v


def norm_frame(df: pd.DataFrame) -> Counter:
    order = sorted(df.columns)
    sub = df[order]
    return Counter(
        tuple(norm_cell(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = get_queries()
    n_pass = n_fail = n_weak = 0
    for name, q in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.spark(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"WEAK  {name}: rows={len(spdf)} (no oracle)")
            n_weak += 1
            continue
        try:
            opdf = con.execute(q.oracle).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if not problems:
            sm, om = norm_frame(spdf), norm_frame(opdf)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(spdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
