"""Deterministic synthetic batch generator (reference data_loader parity).

The reference generates seeded random batches of
``(my_col_0 int32, my_col_1 string, my_col_2 float64)`` with exactly one
trailing NULL per column unless ``--no-null`` is passed
(``src/data_loader.py:36-78``; schema also at ``README.md:135-139``)
and lands them as Parquet files that trigger the WAP pipeline.

Spark-first version: columns are generated *in the plan* over
``spark.range(n)`` with seeded ``F.rand`` — per-partition deterministic
under parallelism (the reference's single-process ``seed(10)`` does not
distribute; SURVEY §7.2). The null row is appended as a deterministic
final row, matching the reference's "one None per column" fixture
(``src/data_loader.py:69-70``).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("my_col_0", T.IntegerType(), True),
        T.StructField("my_col_1", T.StringType(), True),
        T.StructField("my_col_2", T.DoubleType(), True),
    ]
)

# a small neutral word list for human-readable strings (the reference
# uses the `friendlywords` package's predicate/object triples)
_WORDS = (
    "amber birch cedar delta ember fjord grove harbor inlet juniper "
    "kestrel lagoon meadow nectar orchid prairie quartz ridge summit "
    "thicket umber vale willow zenith"
).split()
_MAX_INT = 1317317  # reference's randint upper bound (src/data_loader.py:72)


def word_triple_expr(seed: int):
    """Three seeded word picks joined by spaces (parity with the
    reference's 'predicate-predicate-object' strings)."""
    n = len(_WORDS)
    arr = F.array(*[F.lit(w) for w in _WORDS])
    picks = [
        arr[(F.rand(seed + i) * n).cast("int")]
        for i in range(3)
    ]
    return F.concat_ws(" ", *picks)


def generate_batch(
    spark: SparkSession,
    n: int = 100,
    no_null: bool = False,
    seed: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Build one synthetic batch as a DataFrame.

    With ``no_null=False`` the batch has ``n`` rows of which the last
    carries a NULL in every column — the reference's built-in failing
    fixture (``src/data_loader.py:64-70``: nulls appended, total rows
    still ``n``).
    """
    rows = n if no_null else n - 1
    base = spark.range(0, rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    df = base.select(
        (F.rand(seed) * (_MAX_INT - 1) + 1).cast("int").alias("my_col_0"),
        word_triple_expr(seed).alias("my_col_1"),
        (F.col("id") * F.rand(seed + 100)).alias("my_col_2"),
    )
    if not no_null:
        null_row = spark.createDataFrame([(None, None, None)], BATCH_SCHEMA)
        df = df.unionByName(null_row)
    return df


def land_batch(
    spark: SparkSession,
    landing_dir: str,
    n: int = 100,
    no_null: bool = False,
    seed: int = 10,
) -> str:
    """Write a batch to the landing dir under a UUID name (reference
    uploads a UUID-keyed parquet to the source bucket,
    ``src/data_loader.py:128-140``). Returns the file's directory path.

    Note: one *directory* of parquet parts per batch — the Spark
    equivalent of the reference's single file; the streaming source
    and `run_file` treat it as one unit.
    """
    path = os.path.join(landing_dir, f"{uuid.uuid4()}.parquet")
    generate_batch(spark, n, no_null, seed).coalesce(1).write.parquet(path)
    return path
