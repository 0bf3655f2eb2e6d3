"""MERGE WITH SCHEMA EVOLUTION (Delta's autoMerge surface).

``merge_into(schema_evolution=True)`` / ``MERGE WITH SCHEMA EVOLUTION
INTO`` adds the source's extra top-level columns to the target schema
(nullable, source types) in the SAME commit as the merged rows:

- SET * / INSERT *: updated+inserted rows carry source values, old
  rows read NULL (files simply lack the column);
- explicit SET list: a MENTIONED new column takes its expression, an
  UNMENTIONED new column keeps the target value (NULL) — Delta's
  clause semantics;
- explicit INSERT list: unmentioned new columns insert NULL;
- re-adding a dropped name raises (zombie-column hazard, shared with
  append(merge_schema=True));
- without the flag, extra source columns are silently projected away
  (the strict contract, unchanged).
"""

import pytest

from no_jvm_wap_with_iceberg_spark.catalog import Catalog


def _base(spark, warehouse):
    cat = Catalog(warehouse)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id INT, grp STRING, v DOUBLE",
    )
    cat.create_table_from_df(df, "t")
    return cat


def _wide_source(spark, rows=None):
    rows = rows or [(2, "b2", 22.0, "eu"), (9, "i", 90.0, "us")]
    return spark.createDataFrame(
        rows, "id INT, grp STRING, v DOUBLE, region STRING"
    )


def test_api_set_star_insert_star(spark, warehouse):
    cat = _base(spark, warehouse)
    cat.merge_into(_wide_source(spark), "t", "id", schema_evolution=True)
    got = {r.id: (r.grp, r.v, r.region) for r in cat.read(spark, "t").collect()}
    assert got == {
        1: ("a", 10.0, None),
        2: ("b2", 22.0, "eu"),
        3: ("c", 30.0, None),
        9: ("i", 90.0, "us"),
    }
    fields = {f.name: f.dataType.simpleString()
              for f in cat.load_table("t").spark_schema.fields}
    assert fields["region"] == "string"


def test_without_flag_extra_columns_project_away(spark, warehouse):
    cat = _base(spark, warehouse)
    cat.merge_into(_wide_source(spark), "t", "id")
    df = cat.read(spark, "t")
    assert "region" not in df.columns
    assert df.count() == 4


def test_sql_spelling_set_star(spark, warehouse):
    cat = _base(spark, warehouse)
    src = _wide_source(spark)
    src.createOrReplaceTempView("wide_src")
    cat.sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING wide_src s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.id: r.region for r in cat.read(spark, "t").collect()}
    assert got == {1: None, 2: "eu", 3: None, 9: "us"}


def test_sql_explicit_set_mentioning_new_column(spark, warehouse):
    cat = _base(spark, warehouse)
    _wide_source(spark).createOrReplaceTempView("wide_src")
    cat.sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING wide_src s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET region = upper(s.region)",
    )
    got = {r.id: r.region for r in cat.read(spark, "t").collect()}
    assert got == {1: None, 2: "EU", 3: None}
    # other columns of the matched row kept their TARGET values
    row2 = {r.id: (r.grp, r.v) for r in cat.read(spark, "t").collect()}[2]
    assert row2 == ("b", 20.0)


def test_explicit_set_unmentioned_new_column_stays_null(spark, warehouse):
    # explicit SET list that does NOT assign the new column: the
    # schema still evolves, but updated rows keep the target value
    # (NULL) for it — Delta's unmentioned-column rule
    cat = _base(spark, warehouse)
    _wide_source(spark).createOrReplaceTempView("wide_src")
    cat.sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING wide_src s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r.id: (r.v, r.region) for r in cat.read(spark, "t").collect()}
    assert got[2] == (22.0, None)  # updated: new col unmentioned -> NULL
    assert got[9] == (90.0, "us")  # inserted via INSERT * -> source value


def test_explicit_insert_list_unmentioned_new_column_null(spark, warehouse):
    cat = _base(spark, warehouse)
    _wide_source(spark).createOrReplaceTempView("wide_src")
    cat.sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING wide_src s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT (id, grp, v) "
        "VALUES (s.id, s.grp, s.v)",
    )
    got = {r.id: r.region for r in cat.read(spark, "t").collect()}
    assert got[2] == "eu"  # SET * takes the source value
    assert got[9] is None  # explicit INSERT list: unmentioned -> NULL


def test_zombie_column_guard(spark, warehouse):
    cat = _base(spark, warehouse)
    cat.add_column("t", "region", "string")
    cat.drop_column("t", "region")
    with pytest.raises(ValueError, match="zombie"):
        cat.merge_into(_wide_source(spark), "t", "id", schema_evolution=True)


def test_without_flag_sql_set_unknown_column_still_raises(spark, warehouse):
    cat = _base(spark, warehouse)
    _wide_source(spark).createOrReplaceTempView("wide_src")
    with pytest.raises(ValueError, match="not columns of"):
        cat.sql(
            spark,
            "MERGE INTO t USING wide_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET region = s.region",
        )


def test_changefeed_survives_evolution(spark, warehouse):
    cat = _base(spark, warehouse)
    before = cat.load_table("t").current_snapshot_id
    cat.merge_into(_wide_source(spark), "t", "id", schema_evolution=True)
    changes = cat.read_changes(spark, "t", from_snapshot_id=before)
    kinds = {r["_change_type"] for r in changes.collect()}
    assert kinds == {"insert", "delete"}  # update = delete+insert pair
    assert "region" in changes.columns
