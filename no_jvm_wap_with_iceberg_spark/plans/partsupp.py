"""Derived PARTSUPP and the four TPC-H queries it unblocks.

The driver testdata ships no ``partsupp`` table, which blocked the
TPC-H Q2/Q11/Q16/Q20 shapes for six rounds. Rather than skipping the
coverage, this module DERIVES a deterministic part-supplier relation
from the tables that do exist — the same move TPC-H's own generator
makes (dbgen computes ps_suppkey from partkey with modular stepping;
availqty/supplycost are seeded pseudo-random). The derivation is pure
integer arithmetic, so Spark and DuckDB produce bit-identical rows and
every query below carries a full value-hash oracle:

- the pair set is lineitem's REAL distinct ``(l_partkey, l_suppkey)``
  pairs (in dbgen, lineitem suppliers are drawn FROM partsupp — the
  driver's generator didn't do that, so the lineitem pairs ARE the
  ground-truth supply relationships; Q20's availqty-vs-shipped
  comparison only makes sense over them) UNION a synthetic 4-per-part
  stepping ``ps_suppkey = (p_partkey + i*(S div 4)) mod S`` for i in
  0..3, S = |supplier| (supplier keys are 0-based in this testdata; so
  never-shipped parts still have suppliers, as in TPC-H)
- ``ps_availqty  = (ps_partkey*37 + ps_suppkey*11) mod 9999 + 1``
- ``ps_supplycost = ((ps_partkey*31 + ps_suppkey*7) mod 100000)/100 + 1``
  (an exact 2-decimal value; aggregates go through DECIMAL per the
  registry's determinism rules)

Column adaptations to the driver schema (documented, not hidden):
p_brand stands in for the absent p_mfgr in Q2's output; Q16's
"customer complaints" supplier exclusion keys on s_acctbal < 0 (no
s_comment column); Q20 keeps only s_name (no s_address).

Reference: the repo this engine re-expresses has no TPC-H surface at
all (its reads are single-table scans — ``src/serverless/app.py``);
the q-series exists because SURVEY.md 2 claims the full relational
operator surface, and these four close its last gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.plans.relational import dec
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp relation (see module docstring). |supplier|
    is a one-scalar dimension count (metadata-cheap at any scale); the
    rest is a generated column stack over the part scan — no shuffle.
    """
    s_count = load_table(spark, sf_dir, "supplier").count()
    step = max(s_count // 4, 1)
    pk = F.col("ps_partkey")
    sk = F.col("ps_suppkey")
    real = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").cast("long").alias("ps_suppkey"),
        )
    )
    synthetic = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .select(
            "ps_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_i"),
        )
        .select(
            "ps_partkey",
            ((pk + F.col("_i") * step) % s_count)
            .cast("long")
            .alias("ps_suppkey"),
        )
    )
    return real.unionByName(synthetic).distinct().select(
        "ps_partkey",
        "ps_suppkey",
        ((pk * 37 + sk * 11) % 9999 + 1).cast("int").alias("ps_availqty"),
        (
            ((pk * 31 + sk * 7) % 100_000).cast("double") / 100.0 + 1.0
        ).alias("ps_supplycost"),
    )


# the same derivation as a DuckDB CTE, interpolated into each oracle
_PS_CTE = """
    sup_n AS (SELECT COUNT(*) AS s FROM supplier),
    ps_pairs AS (
      SELECT DISTINCT l_partkey AS ps_partkey,
             CAST(l_suppkey AS BIGINT) AS ps_suppkey
      FROM lineitem
      UNION
      SELECT p_partkey,
             CAST((p_partkey + i.i * GREATEST(s // 4, 1)) % s AS BIGINT)
      FROM part, (SELECT UNNEST([0, 1, 2, 3]) AS i) i, sup_n
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 37 + ps_suppkey * 11) % 9999 + 1
                  AS INTEGER) AS ps_availqty,
             CAST((ps_partkey * 31 + ps_suppkey * 7) % 100000 AS DOUBLE)
               / 100.0 + 1.0 AS ps_supplycost
      FROM ps_pairs
    )
"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_CTE},
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_brand, s_name, s_acctbal, n_name,
             ps_supplycost,
             MIN(ps_supplycost) OVER (PARTITION BY p_partkey)
               AS min_cost
      FROM part
      JOIN partsupp ON p_partkey = ps_partkey
      JOIN eu ON ps_suppkey = s_suppkey
      WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_supplycost AS supplycost
    FROM cand WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (min-cost supplier) over the derived "
    "partsupp: per qualifying part, the EUROPE supplier(s) offering "
    "the minimum supply cost — a window-min + filter instead of "
    "Q2's correlated subquery (same rows, one shuffle). p_brand "
    "stands in for the absent p_mfgr.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    region,
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        part.select("p_partkey", "p_brand")
        .join(ps, part.p_partkey == ps.ps_partkey)
        .join(F.broadcast(eu), ps.ps_suppkey == F.col("s_suppkey"))
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PS_CTE},
    de AS (
      SELECT ps_partkey,
             CAST(ps_supplycost AS DECIMAL(18,2))
               * CAST(ps_availqty AS DECIMAL(18,0)) AS v
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_nationkey % 5 = 2
    )
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
    FROM de
    GROUP BY ps_partkey
    HAVING SUM(v) > (SELECT SUM(v) * 0.001 FROM de)
    ORDER BY stock_value DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape (important stock) over the derived "
    "partsupp: per-part supplycost*availqty value for one nation's "
    "suppliers (a nation GROUP, n_nationkey%5=2 — a single named "
    "nation is empty at sf0.001's 10-supplier scale), kept where "
    "above 0.1% of the group total — a "
    "scalar-aggregate HAVING (Spark: cross-join the 1-row total, "
    "Catalyst broadcasts). Exact DECIMAL arithmetic both sides.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 5 == 2
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    de = ps.join(
        F.broadcast(sup.select("s_suppkey")),
        ps.ps_suppkey == F.col("s_suppkey"),
    ).select(
        "ps_partkey",
        (
            dec("ps_supplycost")
            * F.col("ps_availqty").cast("decimal(18,0)")
        ).alias("v"),
    )
    total = de.agg((F.sum("v") * F.lit(0.001)).alias("_cut"))
    return (
        de.groupBy("ps_partkey")
        .agg(F.sum("v").alias("_sv"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("_sv") > F.col("_cut"))
        .select(
            "ps_partkey", F.col("_sv").cast("double").alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )


@register(
    "q16_parts_supplier_relationship",
    f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship) over the "
    "derived partsupp: distinct supplier count per (brand, type, "
    "size) bucket, excluding one brand, one type, and blacklisted "
    "suppliers (s_acctbal < 0 stands in for the absent 'customer "
    "complaints' comment scan) — NOT IN as a broadcast anti-join.",
)
def q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        ps.join(
            F.broadcast(bad.select("s_suppkey")),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part.select("p_partkey", "p_brand", "p_type", "p_size"),
              ps.ps_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "q20_potential_promotion",
    f"""
    WITH {_PS_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_name
    FROM partsupp
    JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey % 5 = 3 AND ps_availqty > 0.5 * qty
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion) over the derived "
    "partsupp: suppliers in one nation group (n_nationkey%5=3; a "
    "named nation is empty at sf0.001) whose available quantity of "
    "'small%' parts exceeds half of what they shipped in 1996 — the "
    "classic agg-then-join decorrelation of Q20's nested subqueries "
    "(no per-row subquery execution; one shuffle on the (part, "
    "supplier) key).",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum_qty().alias("qty"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 5 == 3
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        ps.join(
            F.broadcast(part.select("p_partkey")),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            shipped,
            (ps.ps_partkey == F.col("l_partkey"))
            & (ps.ps_suppkey == F.col("l_suppkey")),
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )


def dsum_qty():
    """Exact decimal sum of l_quantity, surfaced as double (registry
    determinism rule: float addition isn't associative)."""
    return F.sum(dec("l_quantity")).cast("double")
