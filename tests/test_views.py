"""Catalog-persisted SQL views (Iceberg view-spec parity).

Definitions live inline in the commit payload — branch-addressed,
versioned (REPLACE appends a version), zero-copy, and published
atomically with table changes by the same fast-forward ref CAS.
Resolution is late-binding: every ``Catalog.sql`` call re-registers
stored views over that call's snapshot-pinned table views, so a view
always reads the session's pinned state (the reference has no view
surface at all — its users drop to pandas).
"""

import pytest
from pyspark.sql import functions as F, types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _seed(cat, spark, table="t", n=10):
    cat.create_table(table, SCHEMA)
    cat.append(
        spark.range(n).select(F.col("id"), F.lit("x").alias("name")), table
    )


def test_create_select_drop_round_trip(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "CREATE VIEW big AS SELECT * FROM t WHERE id >= 5")
    assert cat.list_views() == ["big"]
    out = cat.sql(spark, "SELECT COUNT(*) AS n FROM big").collect()
    assert out[0]["n"] == 5
    cat.sql(spark, "DROP VIEW big")
    assert cat.list_views() == []
    with pytest.raises(Exception):
        cat.sql(spark, "SELECT * FROM big").collect()


def test_view_is_late_binding(spark, warehouse):
    """A stored view reads the CURRENT pinned snapshot, not the state
    at definition time."""
    cat = Catalog(warehouse)
    _seed(cat, spark, n=5)
    cat.sql(spark, "CREATE VIEW v AS SELECT COUNT(*) AS n FROM t")
    assert cat.sql(spark, "SELECT n FROM v").collect()[0]["n"] == 5
    cat.append(
        spark.range(100, 103).select(F.col("id"), F.lit("y").alias("name")),
        "t",
    )
    assert cat.sql(spark, "SELECT n FROM v").collect()[0]["n"] == 8


def test_view_on_view_any_declaration_order(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    # outer stored FIRST (unvalidated API path — e.g. its dependency
    # was later dropped and recreated), so registration iterates outer
    # before zinner exists as a temp view: the fixpoint must retry
    # outer after zinner lands instead of skipping it
    cat.create_view("outer_v", "SELECT id FROM zinner WHERE id < 8")
    cat.sql(spark, "CREATE VIEW zinner AS SELECT id FROM t WHERE id >= 4")
    out = cat.sql(spark, "SELECT CAST(SUM(id) AS BIGINT) AS s FROM outer_v")
    assert out.collect()[0]["s"] == 4 + 5 + 6 + 7


def test_create_view_validates_up_front(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    with pytest.raises(Exception):
        cat.sql(spark, "CREATE VIEW bad AS SELECT nope FROM t")
    assert cat.list_views() == []


def test_or_replace_keeps_version_history(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "CREATE VIEW v AS SELECT id FROM t")
    cat.sql(spark, "CREATE OR REPLACE VIEW v AS SELECT id FROM t WHERE id < 3")
    rec = cat.load_view("v")
    assert len(rec["versions"]) == 2
    assert rec["versions"][0]["version"] == 1
    assert "id < 3" in rec["sql"]
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM v").collect()[0]["n"] == 3
    # plain CREATE on an existing view refuses; IF NOT EXISTS no-ops
    with pytest.raises(Exception):
        cat.sql(spark, "CREATE VIEW v AS SELECT 1 AS one")
    cat.sql(spark, "CREATE VIEW IF NOT EXISTS v AS SELECT 1 AS one")
    assert len(cat.load_view("v")["versions"]) == 2


def test_namespace_collisions_both_directions(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "CREATE VIEW v AS SELECT id FROM t")
    with pytest.raises(ValueError):
        cat.create_table("v", SCHEMA)
    with pytest.raises(ValueError):
        cat.create_view("t", "SELECT 1 AS one")
    cat.create_table("u", SCHEMA)
    with pytest.raises(ValueError):
        cat.rename_table("u", "v")


def test_views_survive_table_commits_and_drops(spark, warehouse):
    """The views map must ride through every commit writer — a table
    append/drop/rename that silently dropped it would eat all views."""
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "CREATE VIEW v AS SELECT id FROM t")
    cat.append(
        spark.range(50, 52).select(F.col("id"), F.lit("z").alias("name")), "t"
    )
    cat.create_table("other", SCHEMA)
    cat.rename_table("other", "other2")
    cat.drop_table("other2")
    assert cat.list_views() == ["v"]
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM v").collect()[0]["n"] == 12


def test_broken_view_degrades_not_poisons(spark, warehouse):
    """Dropping a view's base table breaks THAT view on use; every
    other query keeps working (late-binding skip, loud on reference)."""
    cat = Catalog(warehouse)
    _seed(cat, spark, "t")
    # a view whose base never resolves (stored via the unvalidated API
    # path — the dangling-reference shape a drop+rename history leaves)
    cat.create_view("v", "SELECT id FROM ghost_table_nope")
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM t").collect()[0]["n"] == 10
    with pytest.raises(Exception):
        cat.sql(spark, "SELECT * FROM v").collect()


def test_branch_isolation_and_atomic_publish(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.create_branch("wip")
    cat.create_view("v", "SELECT id FROM t WHERE id < 4", branch="wip")
    assert cat.list_views("main") == []
    assert cat.list_views("wip") == ["v"]
    cat.merge("wip")  # fast-forward publish carries the views map
    assert cat.list_views("main") == ["v"]
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM v").collect()[0]["n"]
    assert n == 4


def test_sql_transaction_creates_view_atomically(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql_transaction(
        spark,
        """
        DELETE FROM t WHERE id >= 8;
        CREATE VIEW small AS SELECT id FROM t WHERE id < 3;
        """,
    )
    assert cat.list_views() == ["small"]
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM small").collect()[0]["n"] == 3
    assert cat.read(spark, "t").count() == 8


def test_show_create_table_on_view_and_temp_passthrough(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(
        spark,
        "CREATE VIEW v COMMENT 'it''s five' AS SELECT id FROM t WHERE id < 5",
    )
    assert cat.load_view("v")["comment"] == "it's five"
    stmt = cat.sql(spark, "SHOW CREATE TABLE v").collect()[0]["createtab_stmt"]
    assert stmt.startswith("CREATE VIEW v")
    assert "it''s five" in stmt and "id < 5" in stmt
    # CREATE TEMP VIEW stays Spark's (session-scoped, not persisted)
    cat.sql(spark, "CREATE OR REPLACE TEMPORARY VIEW tv AS SELECT 1 AS one")
    assert cat.list_views() == ["v"]
    assert spark.sql("SELECT one FROM tv").collect()[0]["one"] == 1


def test_drop_view_if_exists_and_unknown(spark, warehouse):
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "DROP VIEW IF EXISTS nope")
    with pytest.raises(KeyError):
        cat.drop_view("nope")


def test_api_drop_view_does_not_leave_stale_resolution(spark, warehouse):
    """drop_view through the API (no router, so no dropTempView there):
    the NEXT sql() call must unregister the stale temp view instead of
    letting the dropped name keep resolving."""
    cat = Catalog(warehouse)
    _seed(cat, spark)
    cat.sql(spark, "CREATE VIEW v AS SELECT id FROM t")
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM v").collect()[0]["n"] == 10
    cat.drop_view("v")
    with pytest.raises(Exception):
        cat.sql(spark, "SELECT * FROM v").collect()
