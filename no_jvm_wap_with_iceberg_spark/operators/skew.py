"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (on in `session.py`) handles most runtime
skew by splitting oversized partitions. These explicit forms cover the
cases AQE cannot: a *single* join key so hot that one task would still
process it alone (the classic power-law head at 100 TB), and
high-cardinality-but-skewed aggregations where the partial-agg hash
map overflows on the hot key.

- ``salted_join(left, right, on, salt)``: the skewed (large) side
  gets a deterministic salt in [0, salt); the small side is exploded
  ``salt``× so every (key, salt) bucket still finds its match. One
  hot key's rows now land in ``salt`` tasks instead of one. Identical
  output to the plain join (verified by test).
- ``two_stage_agg``: groupBy (key, salt) partial → groupBy key final,
  for algebraic aggregates. Spark's own partial aggregation already
  does this per-partition; the explicit salt matters only when the
  DISTINCT path or huge per-key state defeats map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the
    right side replicated ``salt`` times.

    Correctness: salting refines the partitioning, never the match —
    every left row keeps exactly the right matches it had. Cost: the
    small side's shuffle volume × salt (pick salt ~ hot-key rows /
    target-task rows; 16-64 is typical).
    """
    l_salted = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)),
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_salted, on + ["_salt"], how).drop("_salt")


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for re-aggregatable (algebraic) measures.

    ``aggs`` maps output name -> (partial aggregate expression,
    combiner), where the combiner is one of ``"sum"`` / ``"min"`` /
    ``"max"`` — declared by the CALLER, because only the caller knows
    how its partial re-aggregates (counts recombine by sum; inspecting
    the expression text to guess is unstable across Spark versions).
    A plain-Column value is rejected with a pointer to the new shape.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)),
    )
    for name, spec in aggs.items():
        if isinstance(spec, Column) or not (
            isinstance(spec, tuple) and len(spec) == 2 and spec[1] in _COMBINERS
        ):
            raise TypeError(
                f"aggs[{name!r}] must be (partial_expr, 'sum'|'min'|'max'); "
                "counts recombine with 'sum'"
            )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINERS[comb](F.col(f"_p_{name}")).alias(name)
            for name, (_e, comb) in aggs.items()
        ]
    )
