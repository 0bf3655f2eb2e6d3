"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to every left row the latest
right row with ``right.ts <= left.ts`` within the same key group —
the canonical "state as of event time" lookup (quotes-to-trades,
feature-to-example, last-heartbeat-to-alert).

Spark-first implementation — **no Python, one shuffle**: tag both
sides, union them, and run a single ``last_value(..., ignorenulls)``
window over ``(key) ORDER BY (ts, side)``; right rows sort before
left rows at equal timestamps so an exactly-simultaneous right row is
visible (inclusive semantics, matching ``ASOF JOIN ... ON l.ts >=
r.ts``). Cost: one hash shuffle of ``|L|+|R|`` rows on the key plus a
per-key sort — the same lower bound a native as-of join pays.

A merge-join formulation (``union`` → ``repartitionByRange`` +
``sortWithinPartitions``) is what a range-partitioned table layout
would use at 100 TB; the window form expresses the identical plan and
lets AQE size the exchange.

Ties on the right side are resolved before the join (keep the row
with the largest ``seq_col`` per (key, ts)) so results are
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    right_prefix: str = "r_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction='backward'``, default) or at-or-after (``'forward'``)
    its timestamp within the same key — pandas ``merge_asof``
    semantics, one shuffle. Right columns come back
    ``right_prefix``ed; unmatched left rows keep nulls (left-join
    shape). ``tolerance_seconds`` drops matches further than the bound
    from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_cols = [c for c in right.columns if c not in (key_col,)]
    # deterministic ties: one right row per (key, ts) — the max seq
    dedup_w = W.partitionBy(key_col, ts_col).orderBy(F.col(seq_col).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    r_payload = F.struct(*[F.col(c) for c in r_cols])
    # right rows sort on the matching side of equal timestamps so an
    # exactly-simultaneous right row is visible (inclusive semantics)
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    r_tagged = r.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(r_side).alias("_side"),
        r_payload.alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key_col],
    )
    l_tagged = left.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c) for c in left.columns if c != key_col],
    )
    base = W.partitionBy(key_col).orderBy("_ts", "_side")
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, 0)
        pick = F.last("_rp", ignorenulls=True)
        pick_ts = F.last(F.when(F.col("_rp").isNotNull(), F.col("_ts")), ignorenulls=True)
    else:
        w = base.rowsBetween(0, W.unboundedFollowing)
        pick = F.first("_rp", ignorenulls=True)
        pick_ts = F.first(F.when(F.col("_rp").isNotNull(), F.col("_ts")), ignorenulls=True)
    joined = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_asof", pick.over(w))
        .withColumn("_asof_ts", pick_ts.over(w))
        .filter(F.col("_side") == (1 if direction == "backward" else 0))
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col("_asof_ts").cast("timestamp"))
        )
        within = gap <= int(tolerance_seconds * 1_000_000)
        joined = joined.withColumn(
            "_asof", F.when(within, F.col("_asof"))
        )
    out_cols = [F.col(key_col)] + [
        F.col(c) for c in left.columns if c != key_col
    ]
    out_cols += [
        F.col(f"_asof.{c}").alias(f"{right_prefix}{c}") for c in r_cols
    ]
    return joined.select(*out_cols)


@register(
    "asof_purchase_last_click",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT p.event_id, c.event_id AS r_event_id, c.ts AS r_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM purchases p
      JOIN clicks c ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(p.value AS DOUBLE) AS value,
           m.r_event_id,
           date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', m.r_ts)
             AS r_ts_us,
           date_diff('microsecond', m.r_ts, p.ts) AS us_since_click
    FROM purchases p
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
      ON m.event_id = p.event_id
    """,
    doc="as-of join: each purchase matched to the same user's latest "
    "at-or-before click (union + last_value window, one shuffle)",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").cast("double").alias("value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(purchases, clicks, "user_id", "ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    # the matched timestamp goes out as epoch-micros: a NULLable
    # timestamp column would hash engine-dependently (NaT resolution)
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "r_event_id",
        us("r_ts").alias("r_ts_us"),
        F.when(
            F.col("r_ts").isNull(), F.lit(None).cast("long")
        ).otherwise(us("ts") - us("r_ts")).alias("us_since_click"),
    )
