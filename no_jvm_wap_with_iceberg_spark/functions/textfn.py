"""Text primitives shared by the dedup / text-analysis operators.

Performance contract: the ``*_from`` builders take an ALREADY-SPLIT
token-array column. Passing ``words(text)`` inline instead of staging
it through a projection embeds a copy of the ``split`` expression at
every ``element_at`` reference, and codegen re-evaluates each copy —
measured 11x slower on the 5-gram explode at sf0.1 (7.5 s -> 0.65 s).
Hot paths must do::

    df.select(id, words(text).alias("_w")).select(id, gram_strings("_w", n))

The legacy ``word_shingles`` / ``word_shingle_hashes`` wrappers keep
the inline-text signature for row-level (non-exploding) uses where a
handful of split copies per row is noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a narrow input across all cores before CPU-heavy per-row
    stages (gram construction, hashing, chunking).

    A small-SF table is often a single parquet file = a single input
    split = ONE task, which serializes the whole stage (measured: the
    5-gram decontamination explode at sf0.1 ran 10.5 s on one core,
    0.5 s spread). Conditional on the input's split count so the 100 TB
    path — where the scan already yields >= cores splits — keeps its
    shuffle-free plan; only undersplit inputs pay the one narrow
    exchange, which is by definition a small dataset."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def words(text: Column) -> Column:
    """Whitespace tokenization (the documents corpus is single-space
    separated; richer tokenizers belong to the caller)."""
    return F.split(text, " ")


def gram_strings(w, n: int = 3) -> Column:
    """Distinct word n-grams as strings from a token-array column
    (JVM-side, no UDF). Guarded for arrays shorter than ``n``:
    Spark's ``sequence`` generates DESCENDING sequences when
    start > stop, so an unguarded ``sequence(1, size-2)`` would
    fabricate shingles for short docs."""
    w = F.col(w) if isinstance(w, str) else w
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + k) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def gram_hashes(w, n: int = 3) -> Column:
    """Distinct word n-grams as 64-bit hashes (array<long>) from a
    token-array column.

    Set semantics are preserved up to xxhash64 collisions (~1e-15 for
    300-shingle docs) while shuffle width and comparison cost drop
    ~3x vs string shingles — the representation the MinHash path uses
    at scale."""
    w = F.col(w) if isinstance(w, str) else w
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Inline-text convenience wrapper over :func:`gram_strings`.

    Row-level use only — see the module docstring's performance
    contract before putting this under an ``explode``."""
    return gram_strings(words(text), n)


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """Inline-text convenience wrapper over :func:`gram_hashes` (same
    performance contract as :func:`word_shingles`)."""
    return gram_hashes(words(text), n)
