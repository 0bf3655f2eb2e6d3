"""Gap-based sessionization — batch plan + custom stateful streaming.

The reference has no stateful operators at all (state lives in the
Iceberg table between Lambda invocations — SURVEY §2.7); this module
adds the canonical training-data-pipeline one: split each user's
event stream into sessions separated by >= ``gap`` of inactivity.

Two implementations with identical session semantics:

- ``sessionize`` — pure DataFrame plan (lag -> gap flag -> running
  sum -> groupBy): one shuffle on ``user_id`` for the window, the
  session aggregation reuses the same partitioning, so Catalyst plans
  a single exchange. This is the batch/backfill path and the oracle
  the streaming path is tested against.
- ``sessionize_stream`` — ``applyInPandasWithState`` over a streaming
  DataFrame: per-user state carries the open session; a session is
  emitted when a new event arrives after the gap (closing it) or the
  state times out. This is the live path; state size is O(users),
  not O(events).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window as W

from no_jvm_wap_with_iceberg_spark.plans.registry import register
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table

SESSION_GAP_MINUTES = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_seq", T.LongType(), False),
        T.StructField("session_start", T.TimestampNTZType(), True),
        T.StructField("session_end", T.TimestampNTZType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: one row per (user, session).

    ``order_col`` breaks ties for events sharing a timestamp so the
    session assignment is deterministic under any partitioning.
    """
    # an undersplit input (one file locally; never a 100 TB scan) gets
    # an explicit keyed repartition, which then IS the window's single
    # exchange — AQE would otherwise coalesce the tiny shuffle to 1-2
    # partitions and serialize the per-row timestamp work
    spark = events.sparkSession
    par = spark.sparkContext.defaultParallelism
    if events.rdd.getNumPartitions() < par:
        events = events.repartition(par, user_col)
    w = W.partitionBy(user_col).orderBy(ts_col, order_col)
    # microsecond-exact gap test (cast-to-long would truncate
    # sub-second parts and disagree with the oracle's epoch_us);
    # epoch-micros staged ONCE per row — lag reads the staged value,
    # so the NTZ->TS conversion does not run again per window frame
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    # NTZ -> epoch-micros via timestampdiff against an NTZ epoch: NO
    # session-timezone dependency. A cast-to-timestamp + unix_micros
    # round-trip is only the identity under TZ=UTC — under a DST
    # timezone the spring-forward hour would shrink a >30-min true gap
    # below the threshold and silently merge two sessions.
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"{ts_col})"
    )
    staged = events.withColumn("_us", us)
    prev = F.lag(F.col("_us")).over(w)
    is_new = (prev.isNull() | (F.col("_us") - prev >= gap)).cast("long")
    tagged = staged.withColumn(
        "_sess", F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        tagged.groupBy(
            F.col(user_col).alias("user_id"), F.col("_sess").alias("session_seq")
        )
        .agg(
            F.min(ts_col).cast("timestamp_ntz").alias("session_start"),
            F.max(ts_col).cast("timestamp_ntz").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    Emits a session row the moment an event >= gap after the open
    session's end arrives (or the per-user state times out after the
    gap of processing time). The final still-open session per user
    stays in state — identical to how a live sessionizer behaves;
    tests compare emitted (closed) sessions against the batch plan.
    """
    gap_s = gap_minutes * 60

    # session bounds carried as integer epoch-MICROSECONDS: a float
    # seconds value cannot represent microsecond timestamps exactly and
    # fails the us-precision Arrow cast on the way out
    state_schema = "start long, end long, n long, total double, seq long"

    def _fn(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            (start, end, n, total, seq) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_seq": [seq],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values([ts_col, "event_id"])
        ts = rows[ts_col].astype("datetime64[us]").astype("int64")
        vals = rows[value_col].fillna(0.0)

        if state.exists:
            start, end, n, total, seq = state.get
        else:
            start, end, n, total, seq = None, None, 0, 0.0, 0

        out = []
        gap_us = gap_s * 1_000_000
        for t, v in zip(ts, vals):
            t = int(t)
            if start is None:
                start, end, n, total, seq = t, t, 1, float(v), seq + 1
            elif t - end >= gap_us:
                out.append((user_id, seq, start, end, n, total))
                start, end, n, total, seq = t, t, 1, float(v), seq + 1
            else:
                end, n, total = t, n + 1, total + float(v)
        state.update((start, end, n, total, seq))
        state.setTimeoutDuration(gap_s * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_seq": [r[1] for r in out],
                    "session_start": [pd.Timestamp(r[2], unit="us") for r in out],
                    "session_end": [pd.Timestamp(r[3], unit="us") for r in out],
                    "n_events": [r[4] for r in out],
                    "total_value": [r[5] for r in out],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


@register(
    "events_sessionization",
    """
    WITH tagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq
      FROM tagged
    )
    SELECT user_id, session_seq,
           epoch_ns(MIN(ts)) // 1000 AS session_start,
           epoch_ns(MAX(ts)) // 1000 AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="30-min-gap sessionization (batch window plan; the streaming "
    "applyInPandasWithState twin is tested for parity in "
    "tests/test_streaming.py). Session bounds are emitted as epoch-micros "
    "BIGINT per the cross-engine determinism rule (NOTES.md): a raw "
    "MIN(ts)/MAX(ts) on a TIMESTAMP(NANOS)-layout events file keeps "
    "sub-microsecond digits in DuckDB that Spark's micros rebuild "
    "(sources/registry.py) cannot carry; epoch_ns // 1000 is exact for "
    "both the micros and nanos layouts.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(load_table(spark, sf_dir, "events"))
    # NTZ -> epoch-micros via timestampdiff against an NTZ epoch: NO
    # session-timezone dependency (a cast-to-timestamp + unix_micros
    # round-trip is the identity only under TZ=UTC, and the driver's
    # session may not carry our factory confs)
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
    return s.select(
        "user_id",
        "session_seq",
        F.expr(us.format("session_start")).alias("session_start"),
        F.expr(us.format("session_end")).alias("session_end"),
        "n_events",
        "total_value",
    )


@register(
    "events_session_window_native",
    """
    WITH tagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_seq
      FROM tagged
    )
    SELECT user_id,
           epoch_ns(MIN(ts)) // 1000 AS session_start,
           epoch_ns(MAX(ts)) // 1000 AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="the SAME 30-min-gap sessions through Spark's BUILT-IN "
    "session_window operator — one whole-stage-codegen aggregation, "
    "zero Python, the plan to prefer at 100 TB when per-session "
    "ordering logic isn't needed. session_window merges events whose "
    "gap is < the duration (a >= gap starts a new session), exactly "
    "the custom plan's rule, so the DuckDB oracle is the same "
    "lag/running-sum reconstruction; session bounds are emitted from "
    "MIN/MAX(ts) aggregates (not window.start/end, whose end carries "
    "the +gap padding) as epoch-micros BIGINT per the cross-engine "
    "determinism rule. Parity with the custom sessionize plan is "
    "asserted in tests/test_streaming.py.",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
        )
        .agg(
            F.min("ts").alias("_start"),
            F.max("ts").alias("_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.expr(us.format("_start")).alias("session_start"),
            F.expr(us.format("_end")).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
