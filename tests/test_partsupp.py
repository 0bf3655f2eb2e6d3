"""Derived partsupp (plans/partsupp.py): the relation's invariants and
the four TPC-H query shapes it unblocks. Value-level correctness is
oracle-checked by the driver gate; these tests pin the derivation's
contract so an oracle edit can't silently drift from the Spark side.
"""

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.plans.partsupp import derived_partsupp
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_partsupp_invariants(spark):
    ps = derived_partsupp(spark, SF).cache()
    s_count = load_table(spark, SF, "supplier").count()
    row = ps.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("d"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
        F.min("ps_availqty").alias("q_lo"),
        F.max("ps_availqty").alias("q_hi"),
        F.min("ps_supplycost").alias("c_lo"),
    ).first()
    assert row["n"] == row["d"], "pairs must be distinct"
    assert 0 <= row["lo"] and row["hi"] <= s_count - 1  # 0-based keys
    assert 1 <= row["q_lo"] and row["q_hi"] <= 9999
    assert row["c_lo"] >= 1.0
    # covers every real lineitem pair AND every part (synthetic floor)
    li_pairs = (
        load_table(spark, SF, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").cast("long").alias("ps_suppkey"),
        )
        .distinct()
    )
    assert li_pairs.join(ps, ["ps_partkey", "ps_suppkey"], "left_anti").count() == 0
    n_parts = load_table(spark, SF, "part").count()
    assert ps.select("ps_partkey").distinct().count() == n_parts
    # derivation is deterministic: a second build is identical
    again = derived_partsupp(spark, SF)
    assert ps.exceptAll(again).count() == 0
    assert again.exceptAll(ps).count() == 0
    ps.unpersist()


def test_q2_rows_are_per_part_minima(spark):
    q = get_queries()["q2_min_cost_supplier"]
    rows = q.spark(spark, SF).collect()
    assert rows, "q2 empty at sf0.001 — filters too tight"
    ps = derived_partsupp(spark, SF)
    eu_min = {
        r["ps_partkey"]: r["m"]
        for r in ps.join(
            load_table(spark, SF, "supplier")
            .join(
                load_table(spark, SF, "nation"),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
            .join(
                load_table(spark, SF, "region").filter(
                    F.col("r_name") == "EUROPE"
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("s_suppkey"),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("m"))
        .collect()
    }
    for r in rows:
        assert r["supplycost"] == eu_min[r["p_partkey"]]


def test_q16_excludes_blacklisted_suppliers(spark):
    q = get_queries()["q16_parts_supplier_relationship"]
    total = sum(
        r["supplier_cnt"] for r in q.spark(spark, SF).collect()
    )
    assert total > 0
    # the blacklist is empty at sf0.001 (no negative balances among 10
    # suppliers) — the anti-join must then be a no-op, not a filter
    ps = derived_partsupp(spark, SF)
    assert total <= ps.count()
