"""Parquet source registry for the driver testdata star schema.

Mirrors the reference's source surface: single-file Parquet scans
(``src/serverless/app.py:100-114``) generalized to a table registry.
Spark's vectorized Parquet reader gives column pruning + predicate
pushdown for free once the plan is declared with select/filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as either parquet TIMESTAMP(MICROS)
    (reads as TIMESTAMP_NTZ directly) or TIMESTAMP(NANOS), which
    vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). For the nanos layout
    we read it as int64 nanos (legacy conf) and rebuild a
    TIMESTAMP_NTZ at microsecond precision with pure integer
    arithmetic — ``ts div 1000`` — because a double division would
    lose precision at 1e18-nanosecond magnitudes, and timestampadd
    over an NTZ epoch is timezone-independent (no session timezone
    involved). DuckDB oracles use ``epoch_ns(ts) // 1000`` where they
    need epoch micros, which is exact for both layouts.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TESTDATA_TABLES}")
    if name == "events":
        # defensive: the calling session may not have our factory confs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif isinstance(df.schema["ts"].dataType, TimestampType):
            # a TIMESTAMP(MICROS) file with isAdjustedToUTC=true reads
            # as session-TZ TimestampType; pin it to the instant's UTC
            # wall clock as NTZ so year()/window results cannot drift
            # with the session timezone (the DuckDB oracle is epoch-
            # based and would diverge silently otherwise)
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts), "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register testdata tables as temp views for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-general source: parquet (columnar, the hot path), or
    csv/json/text (row formats for landing zones and interchange).

    Parquet is the only format the reference reads
    (``src/serverless/app.py:109`` asserts ``.parquet``); the rest is
    Spark's DataSource surface exposed uniformly. CSV/JSON get header/
    schema handling; at scale prefer converting row formats to Parquet
    at ingest (one pass) so every later scan gets pushdown + pruning.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", schema is None)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.format(fmt).load(path)
