"""Spark's SQL-2011 time-travel spellings (FOR SYSTEM_VERSION AS OF /
FOR SYSTEM_TIME AS OF) route identically to VERSION AS OF /
TIMESTAMP AS OF — both forms are in Spark's own grammar and Iceberg
docs use them interchangeably."""

import datetime
import time

from pyspark.sql import types as T

from no_jvm_wap_with_iceberg_spark.catalog import Catalog

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def test_for_system_version_and_time_spellings(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table("t", SCHEMA)
    cat.append(spark.createDataFrame([(1, "a")], SCHEMA), "t")
    v1 = cat.load_table("t").current_snapshot_id
    t_between = time.time()
    time.sleep(0.05)
    cat.append(spark.createDataFrame([(2, "b")], SCHEMA), "t")

    got = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM t FOR SYSTEM_VERSION AS OF {v1}"
    ).collect()[0]["n"]
    assert got == 1

    ts = datetime.datetime.fromtimestamp(
        t_between, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    got_ts = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME AS OF '{ts}'"
    ).collect()[0]["n"]
    assert got_ts == 1

    # ref-name form works through the SYSTEM_VERSION spelling too
    cat.create_branch("b1")
    cat.append(spark.createDataFrame([(3, "c")], SCHEMA), "t", branch="b1")
    got_ref = cat.sql(
        spark,
        "SELECT COUNT(*) AS n FROM t FOR SYSTEM_VERSION AS OF 'b1'",
    ).collect()[0]["n"]
    assert got_ref == 3
