"""Vector math over ``array<float>`` columns — pure JVM expressions.

No UDFs: ``zip_with`` + ``aggregate`` keep the arithmetic inside
whole-stage codegen, so a 100 TB embedding scan never crosses the
Python boundary. Elements are cast to double before any arithmetic
(float32 accumulation would both lose precision and diverge across
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _dbl(c: Column) -> Column:
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order, exact given inputs)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL instead of killing the
    # job under ANSI mode (one degenerate row in a 100 TB corpus must
    # not fail the scan); callers treat NULL as "no similarity"
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
