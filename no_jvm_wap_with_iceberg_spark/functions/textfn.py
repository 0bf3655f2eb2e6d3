"""Text primitives shared by the dedup / text-analysis operators."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def words(text: Column) -> Column:
    """Whitespace tokenization (the documents corpus is single-space
    separated; richer tokenizers belong to the caller)."""
    return F.split(text, " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array column (JVM-side, no UDF).

    Guarded for texts shorter than ``n`` words: Spark's ``sequence``
    generates DESCENDING sequences when start > stop, so an unguarded
    ``sequence(1, size-2)`` would fabricate shingles for short docs.
    """
    w = words(text)
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


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as 64-bit hashes (array<long>).

    Set semantics are preserved up to xxhash64 collisions (~1e-15 for
    300-shingle docs) while shuffle width and comparison cost drop
    ~3x vs string shingles — the representation the MinHash path uses
    at scale.
    """
    w = words(text)
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
