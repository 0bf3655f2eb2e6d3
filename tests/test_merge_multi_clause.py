"""MERGE with ANY number of WHEN MATCHED / WHEN NOT MATCHED clauses
(the full Spark/Delta grammar) — first-match-wins in statement order,
folded by the router into the primitive's two arms
(sqldml._fold_matched_clauses / _fold_insert_clauses).
"""

import pytest
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _setup(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id INT, grp STRING, v DOUBLE",
    )
    cat.create_table_from_df(df, "t")
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (9, "z", 9.0)],
        "id INT, grp STRING, v DOUBLE",
    )
    src.createOrReplaceTempView("msrc")
    return cat


def test_three_matched_clauses_first_match_wins(spark, warehouse):
    cat = _setup(spark, warehouse)
    cat.sql(
        spark,
        "MERGE INTO t USING msrc s ON t.id = s.id "
        "WHEN MATCHED AND t.id = 1 THEN UPDATE SET v = t.v + 100 "
        "WHEN MATCHED AND t.id = 2 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.id: r.v for r in cat.read(spark, "t").collect()}
    # id=1: first clause (+100); id=2: deleted; id=3: catch-all (s.v);
    # id=4: untouched (no source match); id=9: inserted
    assert got == {1: 110.0, 3: 3.0, 4: 40.0, 9: 9.0}


def test_earlier_clause_shadows_later(spark, warehouse):
    cat = _setup(spark, warehouse)
    cat.sql(
        spark,
        "MERGE INTO t USING msrc s ON t.id = s.id "
        "WHEN MATCHED AND t.v >= 10 THEN UPDATE SET grp = 'big' "
        "WHEN MATCHED AND t.id = 1 THEN DELETE",
    )
    got = {r.id: r.grp for r in cat.read(spark, "t").collect()}
    # id=1 satisfies BOTH; the UPDATE comes first and claims it
    assert got == {1: "big", 2: "big", 3: "big", 4: "d"}


def test_two_deletes_and_update_ordering(spark, warehouse):
    cat = _setup(spark, warehouse)
    cat.sql(
        spark,
        "MERGE INTO t USING msrc s ON t.id = s.id "
        "WHEN MATCHED AND t.id = 1 THEN DELETE "
        "WHEN MATCHED AND t.v < 25 THEN UPDATE SET v = 0.0 "
        "WHEN MATCHED THEN DELETE",
    )
    got = {r.id: r.v for r in cat.read(spark, "t").collect()}
    # 1 deleted (clause 1); 2 updated (v=20<25); 3 deleted (catch-all)
    assert got == {2: 0.0, 4: 40.0}


def test_multiple_insert_clauses(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table_from_df(
        spark.createDataFrame([(0, "seed", 0.0)], "id INT, grp STRING, v DOUBLE"),
        "t",
    )
    spark.createDataFrame(
        [(10, "x", 1.0), (11, "y", 2.0), (12, "z", 3.0)],
        "id INT, grp STRING, v DOUBLE",
    ).createOrReplaceTempView("isrc")
    cat.sql(
        spark,
        "MERGE INTO t USING isrc s ON t.id = s.id "
        "WHEN NOT MATCHED AND s.id = 10 THEN "
        "  INSERT (id, grp) VALUES (s.id, 'first') "
        "WHEN NOT MATCHED AND s.id = 11 THEN INSERT * "
        "WHEN NOT MATCHED AND s.v > 99 THEN INSERT *",
    )
    got = {r.id: (r.grp, r.v) for r in cat.read(spark, "t").collect()}
    # 10: first clause (explicit list; v unmentioned -> NULL);
    # 11: INSERT *; 12: matches NO insert clause -> not inserted
    assert got == {0: ("seed", 0.0), 10: ("first", None), 11: ("y", 2.0)}


def test_single_clause_paths_unchanged(spark, warehouse):
    cat = _setup(spark, warehouse)
    cat.sql(
        spark,
        "MERGE INTO t USING msrc s ON t.id = s.id "
        "WHEN MATCHED AND s.v < 2 THEN UPDATE SET * "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.id: r.v for r in cat.read(spark, "t").collect()}
    assert got == {1: 1.0, 4: 40.0, 9: 9.0}  # 2,3 deleted


def test_multiple_by_source_clauses(spark, warehouse):
    cat = _setup(spark, warehouse)
    # source misses ids 4 (and seeds 9 which is not in target)
    cat.sql(
        spark,
        "MERGE INTO t USING msrc s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.v > 35 THEN "
        "  UPDATE SET grp = 'stale-big' "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    got = {r.id: r.grp for r in cat.read(spark, "t").collect()}
    # 4 (v=40) hits the first clause; no other target row is unmatched
    assert got == {1: "a", 2: "b", 3: "c", 4: "stale-big"}


def test_by_source_first_match_wins_delete_first(spark, warehouse):
    cat = _setup(spark, warehouse)
    cat.sql(
        spark,
        "MERGE INTO t USING (SELECT id FROM msrc WHERE id <= 2) s "
        "ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1.0",
    )
    got = {r.id: r.v for r in cat.read(spark, "t").collect()}
    assert got == {1: 10.0, 2: 20.0, 4: -1.0}  # 3 deleted, 4 updated
