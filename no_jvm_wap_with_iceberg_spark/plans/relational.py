"""Relational audit-query surface: projections, predicates, joins,
aggregations, windows, sorts/top-k, set ops, date/JSON functions.

The reference exercises only projection + IsNull + counts (SURVEY
§2.2-2.6); everything richer is the Spark-native surface the new
engine exposes for audits and downstream analytics. Queries follow
TPC-H shapes adapted to the driver testdata schema (FIXTURES.md §B).

Scale notes baked into the plans:

- dimension joins (region/nation/supplier/part at sf-independent or
  slowly-growing cardinality) are explicitly ``F.broadcast`` so the
  100 TB fact scan never shuffles for them;
- fact-fact joins (orders-lineitem) shuffle on the join key and rely
  on AQE for skew splitting;
- aggregates use map-side partial combine (plain groupBy.agg);
- top-k uses ``orderBy().limit(k)`` which Spark executes as a
  per-partition TakeOrdered + driver merge, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table


# ----------------------------------------------------------------------
# cross-engine exact aggregation helpers (see registry docstring)
# ----------------------------------------------------------------------
def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a double column via decimal, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum average: decimal sum cast double, divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------------
# Aggregations over one fact table
# ----------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter-aggregate with exact decimal sums",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: highly selective filter + scalar aggregate (pushdown showcase)",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "agg_orders_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="multi-key aggregate with distinct count and min/max",
)
def agg_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    doc="GROUP BY GROUPING SETS with a grouping_id disambiguator: "
    "three aggregation grains in ONE pass (detail, per-status, grand "
    "total) — Spark expands the sets with a single Expand node over "
    "one shuffle, which at 100 TB beats three separate scans+shuffles "
    "by ~3x. gid distinguishes a genuinely-NULL group key from a "
    "rolled-up one (the classic grouping-sets trap). DuckDB's "
    "GROUPING() bit order matches Spark's (left-to-right, "
    "most-significant first) once spelled explicitly per column.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 +
                    GROUPING(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@register(
    "audit_profile_lineitem",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS nulls_quantity,
           COUNT(*) - COUNT(l_shipdate) AS nulls_shipdate,
           COUNT(*) - COUNT(l_returnflag) AS nulls_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate
    FROM lineitem
    """,
    doc="the engine's audit surface as a query: null counts + ranges (reference A1-A3)",
)
def audit_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("nulls_quantity"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("nulls_shipdate"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).alias("nulls_returnflag"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


# ----------------------------------------------------------------------
# Joins
# ----------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + top-k by exact revenue",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey   = s.s_suppkey
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: star join through broadcast dims, grouped revenue per nation",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    dims = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: revenue lost to returns per customer, top 20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(100.0 AS DOUBLE) *
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregate ratio over a broadcast part join",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    disc = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: group-having over join, top-100",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # Aggregate lineitem by its own key BEFORE the joins (valid because
    # o_orderkey is the orders PK, so per-order sums are join-invariant):
    # the shuffle carries bare (key, qty) pairs instead of wide
    # customer-name rows, and the >150 filter shrinks the order-key set
    # ahead of both joins — AQE sees its runtime size and converts the
    # join to broadcast when it fits. At 100 TB this is the difference
    # between shuffling lineitem once on a long key and shuffling the
    # 3-way join output on a 5-column composite.
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_sum_qty_dec"))
        .filter(F.col("_sum_qty_dec") > 150)
    )
    return (
        o.join(qty, o.o_orderkey == qty.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("_sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "join_semi_anti",
    """
    SELECT
      (SELECT COUNT(*) FROM customer c WHERE EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS customers_with_orders,
      (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS customers_without_orders,
      (SELECT COUNT(*) FROM part p WHERE NOT EXISTS
         (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)) AS parts_never_ordered
    """,
    doc="semi/anti join surface (EXISTS / NOT EXISTS)",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    never = p.join(li, p.p_partkey == li.l_partkey, "left_anti").count()
    return spark.createDataFrame(
        [(with_orders, without, never)],
        "customers_with_orders long, customers_without_orders long, parts_never_ordered long",
    )


# ----------------------------------------------------------------------
# Windows
# ----------------------------------------------------------------------
@register(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3 AND o_custkey < 100
    """,
    doc="ranked window: top 3 orders per customer",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") < 100))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rn",
        )
    )


@register(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey < 50
    """,
    doc="running total per customer (frame-bounded window, exact decimal)",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_event_gaps",
    """
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0 AS avg_gap_s,
           CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
    FROM (
      SELECT event_type,
             (epoch_ns(ts) // 1000) -
             LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) AS gap_us
      FROM events
    ) WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc="lag() window over event stream: inter-event gap stats per type "
    "(all gap math in exact integer microseconds so engines agree bit-for-bit)",
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # exact long micros (UTC)
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    gaps = e.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1000000.0)).alias(
            "avg_gap_s"
        ),
        (F.max("gap_us").cast("double") / F.lit(1000000.0)).alias("max_gap_s"),
    )


# ----------------------------------------------------------------------
# Sorts / top-k / set ops
# ----------------------------------------------------------------------
@register(
    "topk_expensive_items",
    """
    SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
           l_returnflag
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    doc="global top-k with unique tie-break (TakeOrdered, no full sort)",
)
def topk_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            "l_returnflag",
        )
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@register(
    "setops_customer_cohorts",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich   AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
         all_c  AS (SELECT c_custkey AS k FROM customer)
    SELECT
      (SELECT COUNT(*) FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)) AS rich_buyers,
      (SELECT COUNT(*) FROM (SELECT k FROM all_c EXCEPT SELECT k FROM buyers)) AS never_bought,
      (SELECT COUNT(*) FROM (SELECT k FROM buyers UNION SELECT k FROM rich)) AS union_count,
      (SELECT COUNT(*) FROM (SELECT k FROM buyers UNION ALL SELECT k FROM rich)) AS union_all_count
    """,
    doc="set operations: INTERSECT / EXCEPT / UNION / UNION ALL",
)
def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    all_c = c.select(F.col("c_custkey").alias("k"))
    return spark.createDataFrame(
        [
            (
                buyers.intersect(rich).count(),
                all_c.exceptAll(buyers.distinct()).count(),
                buyers.union(rich).distinct().count(),
                buyers.unionAll(rich).count(),
            )
        ],
        "rich_buyers long, never_bought long, union_count long, union_all_count long",
    )


# ----------------------------------------------------------------------
# Event-stream analytics (date / JSON functions)
# ----------------------------------------------------------------------
@register(
    "events_hourly_rollup",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="time-bucketed rollup of the event stream (batch view of the streaming agg)",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value", 4)).cast("double").alias("total_value"),
        )
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS min_k,
           MAX(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="semi-structured extraction from the props payload column",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_user_funnel",
    """
    SELECT n_event_types, COUNT(*) AS n_users FROM (
      SELECT user_id, COUNT(DISTINCT event_type) AS n_event_types
      FROM events GROUP BY user_id
    ) GROUP BY n_event_types
    """,
    doc="two-level aggregate: distribution of per-user event-type breadth",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_event_types")
    )
    return per_user.groupBy("n_event_types").agg(F.count(F.lit(1)).alias("n_users"))


# ----------------------------------------------------------------------
# Grouping sets / rollup
# ----------------------------------------------------------------------
@register(
    "rollup_nation_region",
    """
    SELECT n.n_name, r.r_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY 1, 2
    """,
    doc="ROLLUP grouping over the geography dims",
)
def rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
        .select("n_name", "r_name", "n_customers", "total_balance")
        .orderBy("n_name", "r_name")
    )


@register(
    "events_value_percentiles",
    """
    SELECT event_type,
           CAST(CAST(quantile_cont(value, 0.50) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
           CAST(CAST(quantile_cont(value, 0.90) AS DECIMAL(18,6)) AS DOUBLE) AS p90,
           CAST(CAST(quantile_cont(value, 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS p99,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="exact linear-interpolated percentiles per event type (the "
    "approx_percentile sketch is the 100 TB drop-in at fixed memory); "
    "outputs rounded to DECIMAL(18,6) to absorb interpolation-order ulps",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    def p(q: float, name: str):
        return (
            F.percentile(F.col("value"), F.lit(q))
            .cast("decimal(18,6)")
            .cast("double")
            .alias(name)
        )
    return ev.groupBy("event_type").agg(
        p(0.50, "p50"), p(0.90, "p90"), p(0.99, "p99"),
        F.count(F.lit(1)).alias("n"),
    )


_PRICE_BANDS = [
    ("budget", 0, 900),
    ("mid", 900, 1400),
    ("premium", 1400, 1900),
    ("luxury", 1900, 10**9),
]


@register(
    "range_join_price_bands",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      {', '.join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)})
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part JOIN bands
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    doc="range (theta) join: parts binned into price bands via a "
    "broadcast non-equi join (BroadcastNestedLoopJoin with a "
    "4-row build side — the right plan for interval dims)",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    bands = p.sparkSession.createDataFrame(_PRICE_BANDS, "band string, lo long, hi long")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("total_price"),
        )
    )


_STATUSES = ["F", "O", "P"]


@register(
    "pivot_orders_status_by_priority",
    f"""
    SELECT o_orderpriority,
           {', '.join(f"COUNT(*) FILTER (o_orderstatus = '{s}') AS status_{s}" for s in _STATUSES)},
           {', '.join(
               f"CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = '{s}'), 0) AS DOUBLE) AS price_{s}"
               for s in _STATUSES)}
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot: order counts and exact price sums per priority, one "
    "column pair per status (F.pivot -> conditional-agg expansion)",
)
def pivot_orders_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).alias("p"),
        )
    )
    return p.select(
        "o_orderpriority",
        *[F.col(f"{s}_n").alias(f"status_{s}") for s in _STATUSES],
        *[
            F.coalesce(F.col(f"{s}_p"), F.lit(0)).cast("double").alias(f"price_{s}")
            for s in _STATUSES
        ],
    )


@register(
    "unpivot_nation_measures",
    """
    SELECT n_name, measure, CAST(value AS BIGINT) AS value FROM (
      SELECT n.n_name,
             COUNT(DISTINCT c.c_custkey) AS customers,
             COUNT(DISTINCT s.s_suppkey) AS suppliers
      FROM nation n
      LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ) UNPIVOT (value FOR measure IN (customers, suppliers))
    """,
    doc="unpivot/melt: per-nation entity counts to long form "
    "(df.unpivot -> UNPIVOT)",
)
def unpivot_nation_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    wide = (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.countDistinct("s_suppkey").alias("suppliers"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["customers", "suppliers"], "measure", "value"
    ).select("n_name", "measure", F.col("value").cast("bigint").alias("value"))


@register(
    "window_moving_avg_daily_revenue",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(SUM(revenue) OVER w AS DOUBLE) AS revenue_7d,
           COUNT(*) OVER w AS days_in_window
    FROM daily
    WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
    """,
    doc="time-range window frame: trailing-7-day revenue over the "
    "daily series (RANGE frame on event time, exact decimal sums); "
    "the window is global but its input is one row per DAY — bounded "
    "by the calendar, not the data, at any scale",
)
def window_moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("timestamp_ntz").alias("day")
    ).agg(F.sum(dec("o_totalprice")).alias("revenue"))
    w = (
        W.orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "day",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("double").alias("revenue_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


@register(
    "subquery_parts_above_brand_avg",
    """
    SELECT p_brand, COUNT(*) AS n_above,
           CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
    FROM part p
    WHERE CAST(p_retailprice AS DECIMAL(18,2))
          * (SELECT COUNT(*) FROM part c WHERE c.p_brand = p.p_brand)
        > (SELECT SUM(CAST(p2.p_retailprice AS DECIMAL(18,2)))
           FROM part p2 WHERE p2.p_brand = p.p_brand)
    GROUP BY p_brand
    """,
    doc="correlated scalar subqueries, price*n > sum cross-multiplied so "
    "the mean comparison is decimal-exact (Catalyst decorrelates to "
    "aggregate + self-join; no per-row subquery execution)",
)
def subquery_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    p.createOrReplaceTempView("_part_sq")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above,
               CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
        FROM _part_sq p
        WHERE CAST(p_retailprice AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM _part_sq c WHERE c.p_brand = p.p_brand)
            > (SELECT SUM(CAST(p2.p_retailprice AS DECIMAL(18,2)))
               FROM _part_sq p2 WHERE p2.p_brand = p.p_brand)
        GROUP BY p_brand
        """
    )


@register(
    "sketch_events_approx_stats",
    None,  # sketches are approximate by construction -> rows-only;
    # pytest bounds the error against exact answers
    doc="fixed-memory sketches per event type: HLL distinct users "
    "(approx_count_distinct) and KLL-style p50/p99 "
    "(approx_percentile) — the 100 TB substitutes for exact "
    "countDistinct/percentile, whose state grows with cardinality",
)
def sketch_events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
        F.percentile_approx("value", 0.99, 10_000).alias("approx_p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sketch_events_error_gate",
    """
    SELECT event_type,
           true AS distinct_ok, true AS p50_ok, true AS p99_ok
    FROM events GROUP BY event_type
    """,
    doc="assertion-gate companion to the rows-only sketch query: per "
    "event type, the HLL distinct-user estimate must sit within 4x "
    "its configured rsd (1%) of the EXACT distinct count, and each "
    "approx percentile must satisfy the KLL rank guarantee against "
    "the raw rows — #rows <= estimate covers at least (p - eps)*n "
    "and #rows < estimate at most (p + eps)*n, eps = 1/accuracy "
    "plus one row of discreteness slack. Rank checks (not value "
    "bands) because exact percentile() interpolates while the "
    "sketch returns a data element — value bands false-alarm at "
    "small n and the rank bound is the sketch's actual contract at "
    "every scale.",
)
def sketch_events_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # exact distinct via distinct-then-count, NOT countDistinct in the
    # same agg as the sketches: a mixed distinct/non-distinct agg
    # plans an Expand that re-feeds every row through the percentile
    # sketch twice (measured 15.6 s vs <2 s split at sf0.1)
    # ONE KLL digest queried at both quantiles — two scalar
    # percentile_approx calls would build two identical digests from
    # the same rows (same data, same accuracy, same merge tree), i.e.
    # pay the per-row sketch update twice for byte-identical estimates
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("_au"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.99)), 10_000
        ).alias("_ap"),
        F.count("value").alias("_n"),
    ).select(
        "event_type",
        "_au",
        F.col("_ap")[0].alias("_ap50"),
        F.col("_ap")[1].alias("_ap99"),
        "_n",
    )
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("_eu"))
    )
    approx = sketches.join(exact, "event_type")
    joined = ev.join(F.broadcast(approx), "event_type")
    v = F.col("value")
    ranked = joined.groupBy("event_type").agg(
        F.sum((v < F.col("_ap50")).cast("long")).alias("_lt50"),
        F.sum((v <= F.col("_ap50")).cast("long")).alias("_le50"),
        F.sum((v < F.col("_ap99")).cast("long")).alias("_lt99"),
        F.sum((v <= F.col("_ap99")).cast("long")).alias("_le99"),
        F.first("_au").alias("_au"),
        F.first("_eu").alias("_eu"),
        F.first("_n").alias("_n"),
    )
    n = F.col("_n").cast("double")
    tol = n / 10_000.0 + 1.0  # 1/accuracy rank error + discreteness

    def rank_ok(p, lt, le):
        return (F.col(le) >= p * n - tol) & (F.col(lt) <= p * n + tol)

    return ranked.select(
        "event_type",
        (
            F.abs(F.col("_au") - F.col("_eu"))
            <= F.greatest(0.04 * F.col("_eu"), F.lit(1.0))
        ).alias("distinct_ok"),
        rank_ok(0.5, "_lt50", "_le50").alias("p50_ok"),
        rank_ok(0.99, "_lt99", "_le99").alias("p99_ok"),
    )


@register(
    "fn_scalar_suite",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           dayofweek(o_orderdate) + 1 AS dow,  -- DuckDB 0-based, Spark 1-based
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           upper(o_orderstatus) AS status_u,
           substring(o_orderpriority, 1, 1) AS prio_code,
           length(o_orderpriority) AS prio_len,
           replace(o_orderpriority, '-', '_') AS prio_norm,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
           concat(o_orderstatus, ':', o_orderpriority) AS status_prio
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    doc="scalar-function surface: date extraction/trunc/diff + string "
    "upper/substr/length/replace/lpad/concat (all JVM built-ins, "
    "whole-stage codegen)",
)
def fn_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias(
            "days_to_eoy"
        ),
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("prio_norm"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_prio"),
    )


@register(
    "fn_array_map_suite",
    """
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(len(embedding)) AS BIGINT) AS total_elems,
           CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(20,6))) AS DOUBLE) AS first_sum,
           CAST(SUM(CAST(CAST(list_max(embedding) AS DOUBLE) AS DECIMAL(20,6))) AS DOUBLE) AS max_sum,
           CAST(SUM(CASE WHEN embedding[1] > embedding[2] THEN 1 ELSE 0 END) AS BIGINT) AS first_gt_second
    FROM embeddings GROUP BY label
    """,
    doc="array-function surface: size, element_at, array_max, "
    "element comparisons — JVM higher-order functions over "
    "array<float>, decimal-exact sums",
)
def fn_array_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(emb)).alias("total_elems"),
        F.sum(F.element_at(emb, 1).cast("double").cast("decimal(20,6)"))
        .cast("double")
        .alias("first_sum"),
        F.sum(F.array_max(emb).cast("double").cast("decimal(20,6)"))
        .cast("double")
        .alias("max_sum"),
        F.sum(
            F.when(F.element_at(emb, 1) > F.element_at(emb, 2), 1).otherwise(0)
        ).alias("first_gt_second"),
    )


@register(
    "window_ranking_suite",
    """
    SELECT c_custkey, n_orders, total_price,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(10,6)) AS DOUBLE) AS pct_rank,
           CAST(CAST(CUME_DIST() OVER w AS DECIMAL(10,6)) AS DOUBLE) AS cume
    FROM (
      SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders GROUP BY o_custkey
    )
    WINDOW w AS (ORDER BY n_orders DESC, c_custkey)
    """,
    doc="ranking-function surface: rank / dense_rank / ntile / "
    "percent_rank / cume_dist over per-customer order counts "
    "(unique tie-break key keeps every rank deterministic). "
    "Global ranking runs as TWO PASSES — range-partition on the sort "
    "key, rank within each range, add per-range offsets via a "
    "broadcast of one tiny row per range — so no stage ever sorts the "
    "whole table in a single task (the naive unpartitioned window "
    "does, and dies at 100 TB)",
)
def window_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )
    sort_cols = [F.col("n_orders").desc(), F.col("c_custkey").asc()]
    # pass 1: range-partition on the global sort key, rank locally.
    # The ordering key (n_orders, c_custkey) is unique, so rank ==
    # dense_rank == row_number and every global rank is local rank +
    # the count of rows in earlier ranges — exact regardless of where
    # the range sampler places boundaries.
    local = (
        per_cust.repartitionByRange(32, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn", F.row_number().over(W.partitionBy("_pid").orderBy(*sort_cols))
        )
        # materialize ONCE: the range partitioner samples boundaries,
        # and the offsets aggregation + the final join would otherwise
        # recompute `local` with independently-sampled (different)
        # boundaries — offsets then disagree with pids and global
        # ranks collide (observed at sf0.1: 14689 distinct ranks for
        # 14999 rows)
        .localCheckpoint(eager=True)
    )
    # pass 2: per-range counts -> prefix-sum offsets + grand total.
    # One row per range; the only unpartitioned window runs over those
    # 32 rows, and they broadcast back to the ranked data.
    stats = local.groupBy("_pid").agg(F.max("_lrn").alias("_cnt"))
    w_prev = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = stats.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(W.partitionBy()).alias("_n"),
    )
    ranked = local.join(F.broadcast(offsets), "_pid")
    rn = F.col("_lrn") + F.col("_off")
    n = F.col("_n")
    # Spark NTILE(k): the first N%k buckets get ceil(N/k) rows
    base, rem = F.floor(n / 4), n % 4
    big = base + 1
    quartile = (
        F.when(rn <= rem * big, ((rn - 1) / big).cast("long") + 1)
        .otherwise(rem + ((rn - rem * big - 1) / base).cast("long") + 1)
    )
    pct = F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0))
    return ranked.select(
        "c_custkey",
        "n_orders",
        "total_price",
        rn.cast("int").alias("rnk"),
        rn.cast("int").alias("drnk"),
        quartile.cast("int").alias("quartile"),
        pct.cast("decimal(10,6)").cast("double").alias("pct_rank"),
        (rn / n).cast("decimal(10,6)").cast("double").alias("cume"),
    )


@register(
    "q7_nation_pair_volume",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS yr, l.l_extendedprice, l.l_discount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
        AND ns.n_nationkey <> nc.n_nationkey
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume — 6-table join with "
    "two roles for the same dim (supplier vs customer nation), both "
    "broadcast",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    ns = n.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), s.s_nationkey == ns._snk)
        .join(F.broadcast(nc), c.c_nationkey == nc._cnk)
        .filter(F.col("_snk") != F.col("_cnk"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional aggregation over a fact-fact "
    "join with a selective pushed-down filter",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "events_anomaly_iqr",
    """
    WITH bounds AS (
      SELECT event_type,
             CAST(CAST(quantile_cont(value, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS q1,
             CAST(CAST(quantile_cont(value, 0.75) AS DECIMAL(18,6)) AS DOUBLE) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value > b.q3 + 1.5 * (b.q3 - b.q1) THEN 1 ELSE 0 END) AS BIGINT) AS high_outliers,
           CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1) THEN 1 ELSE 0 END) AS BIGINT) AS low_outliers
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    GROUP BY e.event_type
    """,
    doc="IQR anomaly rule per event type: quartiles once (rounded "
    "decimal-exact), outlier counts via a broadcast join of the "
    "5-row bounds table back onto the stream",
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    def q(p, name):
        return (
            F.percentile(F.col("value"), F.lit(p))
            .cast("decimal(18,6)")
            .cast("double")
            .alias(name)
        )
    bounds = ev.groupBy(F.col("event_type").alias("_et")).agg(
        q(0.25, "q1"), q(0.75, "q3")
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(bounds), ev.event_type == bounds._et)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
            ).alias("high_outliers"),
            F.sum(
                F.when(F.col("value") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
            ).alias("low_outliers"),
        )
    )


@register(
    "histogram_order_totals",
    """
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 6000 THEN 13
                ELSE CAST(floor(CAST(o_totalprice AS DOUBLE) / 500.0) + 1 AS BIGINT)
           END AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
    """,
    doc="fixed-width histogram of order totals via width_bucket — the "
    "single-pass distribution profile an audit dashboard plots",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(
                F.col("o_totalprice").cast("double"),
                F.lit(0.0),
                F.lit(6000.0),
                F.lit(12),
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "fn_json_map_suite",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(len(json_keys(props))) AS BIGINT) AS total_keys,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_k
    FROM events GROUP BY event_type
    """,
    doc="typed JSON->map parsing (from_json to map<string,bigint>) "
    "with map_keys/element_at/map_contains_key — the structured "
    "complement to the regex-extraction query",
)
def fn_json_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at(m, "k")).alias("sum_k"),
        F.sum(F.size(m)).alias("total_keys"),
        F.sum(
            F.when(F.map_contains_key(m, "k"), 1).otherwise(0)
        ).alias("rows_with_k"),
    )


@register(
    "agg_collect_ordered",
    """
    SELECT o_custkey AS c_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey HAVING COUNT(*) <= 2
    """,
    doc="array aggregation: per-customer order-key list. collect_list "
    "is partition-order-dependent, so determinism REQUIRES sort_array "
    "around it; emitted as a joined string (canonical across engines)",
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("o_orderkey")), ","
            ).alias("order_keys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") <= 2)
    )


# ----------------------------------------------------------------------
# TPC-H subquery shapes: EXISTS / NOT EXISTS / correlated scalar aggs.
# The reference has no subqueries at all (SURVEY §2.2: IsNull is its
# only predicate); these queries prove the decorrelation surface a
# migrating user gets. Each Spark plan is the DECORRELATED form
# (aggregate-then-join) rather than a per-row subquery: at 100 TB the
# correlated sides are one extra shuffle each, never N executions.
# (testdata has no partsupp table, so Q2/Q11/Q16/Q20 have no
# faithful adaptation; date predicates use l_shipdate vs o_orderdate
# lag since there is no commit/receipt date — FIXTURES.md §B.)
# ----------------------------------------------------------------------
@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS with a correlated inequality "
    "(late-shipping orders by priority). Spark plan is a left-semi "
    "join on the order key with the lag predicate as join condition — "
    "one shuffle, no per-row subquery",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey)
            & (late.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an ON-clause filter "
    "(kept rows with zero matches count 0), then the distribution of "
    "per-customer order counts — two aggregations, the second over "
    "customer-cardinality input",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    doc="TPC-H Q17 shape: correlated scalar AVG subquery "
    "(small-quantity revenue). Spark plan decorrelates explicitly: "
    "per-part thresholds aggregated once from the fact table, joined "
    "back on the part key — the threshold comparison is exact because "
    "l_quantity is integral (sum exact below 2^53 in both engines)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    thresholds = li.groupBy(F.col("l_partkey").alias("_tk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_qty_cap")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("_tk"))
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders o
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      )
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS self-joins (the sole "
    "late supplier in multi-supplier orders). The Spark plan replaces "
    "both correlated self-joins with ONE per-order aggregate "
    "(n_suppliers, n_late_suppliers) joined back to the late rows: "
    "l1 qualifies iff the order has >=2 suppliers and exactly 1 late "
    "one (which must then be l1's). Two shuffles on the order key "
    "total, vs three self-join passes for the literal translation",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
        ).alias("_late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    waiting = (
        lo.filter(F.col("_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late_supp") == 1))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: uncorrelated scalar subquery + NOT EXISTS "
    "anti join (high-balance customers with no urgent orders; the "
    "phone-prefix filter has no testdata analogue so the segment "
    "column stands in). The global average is decimal-exact "
    "(sum(decimal)/count) so the boundary comparison cannot diverge "
    "cross-engine; the anti side is the filtered orders scan",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (dsum("c_acctbal") / F.count(F.lit(1))).alias("_thr")
        )
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q8_market_share",
    """
    SELECT yr,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT year(o.o_orderdate) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY yr
    """,
    doc="TPC-H Q8 shape: national market share — 8-table join with the "
    "nation dim in two roles (customer region gate vs supplier "
    "nationality). The share is a ratio of two decimal-exact sums cast "
    "to double before an IEEE division, so both engines divide "
    "bit-identical operands; a year with no NATION_3 volume yields "
    "NULL in both (SUM over an empty CASE branch). Spark plan: one "
    "orders-lineitem shuffle and one customer shuffle; part, supplier, "
    "both nation roles and region are broadcast",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nation")
    )
    volume = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("_cnk"))
        .join(F.broadcast(r), F.col("_crk") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("_snk"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("yr"),
            volume.alias("_vol"),
            F.col("nation"),
        )
        .groupBy("yr")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("_vol"))).cast(
                    "double"
                )
                / F.sum("_vol").cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate) AS yr,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape (adapted: testdata has no partsupp, so profit "
    "is discounted revenue without supply cost): product-line profit "
    "by supplier nation and order year, gated by a LIKE filter on the "
    "part name. The LIKE lands on the broadcast part side before the "
    "join, so the fact scan only keeps matching partkeys",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top supplier by quarterly revenue via a "
    "scalar MAX subquery over a derived aggregate. Both engines "
    "compute total_revenue from the same exact decimal sums, so the "
    "double equality against MAX selects identical rows. Spark plan: "
    "one shuffle for the per-supplier aggregate; the 1-row max is "
    "broadcast back over it, and the supplier dim is broadcast",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape (adapted: p_container/l_shipmode don't exist "
    "in testdata, so brand+size bands stand in): a disjunction whose "
    "branches mix predicates from BOTH join sides. Catalyst derives "
    "the single-side residues it can (p_brand IN (...) onto the "
    "broadcast part scan, l_quantity <= 40 onto the fact scan) and "
    "evaluates the full OR after the join — the join itself stays a "
    "plain broadcast equi-join on the part key",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "window_frame_suite",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                       o_orderdate) AS day
      FROM orders WHERE o_custkey < 100
    )
    SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY day
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_30d,
           CAST(ntile(4) OVER (
                  PARTITION BY o_custkey
                  ORDER BY day, o_orderkey) AS INT) AS quartile,
           CAST(first_value(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY day, o_orderkey) AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice) OVER (
                  PARTITION BY o_custkey ORDER BY day, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS DOUBLE)
             AS last_price,
           CAST(nth_value(o_totalprice, 2) OVER (
                  PARTITION BY o_custkey ORDER BY day, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS DOUBLE)
             AS second_price
    FROM o
    """,
    doc="window FRAME coverage beyond the running/moving/rank suites: "
    "a value-based RANGE frame (30-day trailing revenue over integer "
    "epoch-days — rows sharing an order value share the frame, so no "
    "tie-break is needed for determinism), ntile quartiles and "
    "first/last/nth_value over full-partition ROWS frames (unique "
    "(day, orderkey) tie-break). One exchange on o_custkey serves "
    "every window; sums stage through DECIMAL(18,2).",
)
def window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day"),
        )
    )
    w_range = (
        W.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    )
    w_ord = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    w_full = w_ord.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_range)
        .cast("double")
        .alias("sum_30d"),
        F.ntile(4).over(w_ord).cast("int").alias("quartile"),
        F.first("o_totalprice").over(w_ord).cast("double").alias(
            "first_price"
        ),
        F.last("o_totalprice").over(w_full).cast("double").alias(
            "last_price"
        ),
        F.nth_value("o_totalprice", 2).over(w_full).cast("double").alias(
            "second_price"
        ),
    )


@register(
    "agg_stats_moments",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(38,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / CAST(n AS DOUBLE) AS mean_qty,
           (CAST(n AS DOUBLE) * sxx - sx * sx)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
             AS var_qty,
           sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             AS stddev_qty,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
             AS corr_qty_price
    FROM m
    """,
    doc="statistical aggregates the deterministic way: stddev/var/"
    "corr are NOT cross-engine stable as built-ins (parallel merge "
    "formulas vs sequential accumulation differ in the last ulp), so "
    "they are computed from EXACT decimal moment sums (2-decimal "
    "inputs make scale-4 products exact — zero rounding) followed by "
    "an identical double expression tree in both engines. The moment "
    "sums partial-aggregate map-side: one shuffle of 5 decimals per "
    "group regardless of data size — the same shape the classifier "
    "and k-means training use.",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    dec = "decimal(38,4)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    var = (nd * F.col("sxx") - F.col("sx") * F.col("sx")) / (nd * (nd - 1))
    corr = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "l_returnflag",
        "n",
        (F.col("sx") / nd).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        corr.alias("corr_qty_price"),
    )


@register(
    "sketch_error_bounds_gate",
    """
    SELECT event_type,
           true AS users_within_1pct,
           true AS p50_within_band,
           true AS p99_within_band
    FROM events GROUP BY event_type
    """,
    doc="assertion-gate companion to sketch_events_approx_stats "
    "(which is rows-only by construction): Spark computes BOTH the "
    "sketch and the exact answer, emits per-group booleans asserting "
    "the sketch landed inside its documented error envelope (HLL "
    "rsd=1% -> +-5 sigma; approx_percentile accuracy=10k -> the "
    "returned value's exact rank within n/1000 of the target), and "
    "the oracle states those booleans must all be true. A sketch "
    "regression now fails the driver hash gate instead of hiding "
    "behind a rows-only check.",
)
def sketch_error_bounds_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("au"),
        F.percentile_approx("value", 0.5, 10_000).alias("p50"),
        F.percentile_approx("value", 0.99, 10_000).alias("p99"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("eu"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact rank of the sketch's percentile answers
    ranked = ev.join(approx.select("event_type", "p50", "p99"), "event_type")
    ranks = ranked.groupBy("event_type").agg(
        F.sum((F.col("value") <= F.col("p50")).cast("long")).alias("r50"),
        F.sum((F.col("value") <= F.col("p99")).cast("long")).alias("r99"),
    )
    j = approx.join(exact, "event_type").join(ranks, "event_type")
    n = F.col("n").cast("double")
    return j.select(
        "event_type",
        (F.abs(F.col("au") - F.col("eu")) <= F.col("eu") * 0.05).alias(
            "users_within_1pct"
        ),
        (
            F.abs(F.col("r50") - n * 0.5) <= F.greatest(n / 1000, F.lit(1.0))
        ).alias("p50_within_band"),
        (
            F.abs(F.col("r99") - n * 0.99) <= F.greatest(n / 1000, F.lit(1.0))
        ).alias("p99_within_band"),
    )
