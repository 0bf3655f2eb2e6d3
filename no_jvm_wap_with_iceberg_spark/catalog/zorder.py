"""Z-order (Morton-curve) clustering for multi-column data skipping.

A ``sort_by`` layout gives disjoint per-file ranges on ONE key;
predicates on any other column scan every file. Interleaving the bits
of several normalized columns into one Morton key and range-writing on
that key instead makes each file cover a small hyper-rectangle of the
value space, so footer min/max stats prune files for predicates on ANY
of the clustered columns (the same layout Delta's OPTIMIZE ZORDER BY
and Iceberg's z-order rewrite produce).

Everything is built-in Spark expressions (casts, floor, shift, and/or)
— JVM-side, codegen'd, no UDF — so the clustering pass is just a
repartitionByRange on a computed column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MAX_KEY_BITS = 63  # keep the Morton key in a signed 64-bit long


def bits_per_column(n_cols: int, bits: int = 16) -> int:
    """Bits each column contributes, capped so the key fits a long."""
    if n_cols < 1:
        raise ValueError("zorder needs at least one column")
    return min(bits, MAX_KEY_BITS // n_cols)


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global (min, max) per clustered column as doubles, one
    column-pruned aggregate scan (two scalars per column — bounded
    driver state at any table size). Timestamps/dates normalize via
    their double cast (epoch seconds)."""
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [F.min(d).alias(f"_mn_{c}"), F.max(d).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        # all-NULL column: any constant works, everything lands in 0
        out[c] = (mn if mn is not None else 0.0, mx if mx is not None else 0.0)
    return out


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton key column: each input is min/max-normalized to a
    ``bits``-bit integer, then the bits are interleaved (column 0 gets
    the most significant position of each group). NULLs sort first
    (bucket 0). 16 bits/column resolves 65k buckets per dimension —
    far finer than any realistic file count."""
    b = bits_per_column(len(cols), bits)
    top = (1 << b) - 1
    scaled: list[Column] = []
    for c in cols:
        mn, mx = bounds[c]
        v = F.col(c).cast("double")
        if mx > mn:
            s = F.floor((v - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(top)))
            s = F.least(F.lit(top).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), s.cast("bigint")))
        else:
            s = F.lit(0).cast("bigint")
        scaled.append(F.coalesce(s, F.lit(0).cast("bigint")))
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for j in range(b):
        for k in range(n):
            bit = F.shiftright(scaled[k], j).bitwiseAND(F.lit(1).cast("bigint"))
            pos = j * n + (n - 1 - k)
            z = z.bitwiseOR(F.shiftleft(bit, pos))
    return z


def zorder_key_py(
    values: dict[str, float | None],
    bounds: dict[str, tuple[float, float]],
    cols: list[str],
    bits: int = 16,
) -> int:
    """Pure-Python reference of :func:`zorder_key` for tests."""
    b = bits_per_column(len(cols), bits)
    top = (1 << b) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[c]
        v = values.get(c)
        if v is None or mx <= mn:
            scaled.append(0)
        else:
            import math

            scaled.append(max(0, min(top, math.floor((v - mn) / (mx - mn) * top))))
    n = len(cols)
    z = 0
    for j in range(b):
        for k in range(n):
            z |= ((scaled[k] >> j) & 1) << (j * n + (n - 1 - k))
    return z
