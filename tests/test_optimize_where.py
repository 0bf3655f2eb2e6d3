"""OPTIMIZE ... WHERE (Delta's selective compaction): binpack only the
files may-matching the predicate; everything else carries by reference.
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _frag_table(spark, warehouse):
    """Partitioned table with 4 small files per partition."""
    cat = Catalog(warehouse)
    cat.create_table(
        "t",
        spark.createDataFrame([], "id INT, day STRING, v DOUBLE").schema,
        partition_by=["day"],
    )
    for i in range(4):
        cat.append(
            spark.createDataFrame(
                [(10 * i + j, f"d{j % 2}", float(j)) for j in range(6)],
                "id INT, day STRING, v DOUBLE",
            ),
            "t",
        )
    return cat


def test_scoped_optimize_compacts_only_matching_partition(spark, warehouse):
    cat = _frag_table(spark, warehouse)
    files0 = cat.load_table("t").files()
    d1_before = [f.path for f in files0 if f.partition.get("day") == "d1"]
    d0_before = {f.path for f in files0 if f.partition.get("day") == "d0"}
    assert len(d1_before) == 4
    out = cat.sql(spark, "OPTIMIZE t WHERE day = 'd1'").collect()[0]
    files1 = cat.load_table("t").files()
    d0_after = {f.path for f in files1 if f.partition.get("day") == "d0"}
    d1_after = [f.path for f in files1 if f.partition.get("day") == "d1"]
    assert d0_after == d0_before  # untouched partition carried over
    assert len(d1_after) < 4 and not set(d1_after) & set(d1_before)
    assert out.files_before == 8 and out.files_after == len(files1)
    # contents unchanged
    assert cat.read(spark, "t").count() == 24


def test_scoped_optimize_api_with_stats_predicate(spark, warehouse):
    cat = Catalog(warehouse)
    from no_jvm_wap_with_iceberg_spark.catalog import Predicate

    cat.create_table_from_df(
        spark.createDataFrame([(i, float(i)) for i in range(10)],
                              "id INT, v DOUBLE"),
        "u",
        sort_by=["id"],
    )
    for i in range(3):
        cat.append(
            spark.createDataFrame([(100 + i, 1.0)], "id INT, v DOUBLE"), "u"
        )
    before = {f.path for f in cat.load_table("u").files()}
    cat.compact(
        spark, "u", mode="binpack",
        scope_groups=[[Predicate("ge", "id", 100)]],
    )
    after = {f.path for f in cat.load_table("u").files()}
    # the id<100 base file's stats exclude it from the scope
    assert before & after  # something carried over
    assert cat.read(spark, "u").count() == 13


def test_scope_requires_binpack_and_prunable_predicate(spark, warehouse):
    cat = _frag_table(spark, warehouse)
    from no_jvm_wap_with_iceberg_spark.catalog import Predicate

    with pytest.raises(ValueError, match="binpack"):
        cat.compact(
            spark, "t", mode="full",
            scope_groups=[[Predicate("eq", "day", "d1")]],
        )
    with pytest.raises(ValueError, match="not prunable"):
        cat.sql(spark, "OPTIMIZE t WHERE length(day) > 0")
    with pytest.raises(ValueError, match="ZORDER"):
        cat.sql(spark, "OPTIMIZE t WHERE day = 'd1' ZORDER BY (id)")
