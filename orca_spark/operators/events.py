"""Event-stream operators (batch form) over the ``events`` table.

Streaming forms of these (watermark + windowed agg over readStream)
live in ``orca_spark.streaming``; the batch forms here are the
oracle-checkable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_hourly_rollup",
    oracle="""
        SELECT date_trunc('hour', ts) AS bucket,
               event_type,
               count(*)               AS n_events,
               round(sum(value), 4)   AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    description="time-bucketed aggregation (tumbling 1h window, batch form)",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "events_tumbling_15min",
    oracle="""
        SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start,
               count(*) AS n_events
        FROM events
        WHERE ts IS NOT NULL  -- F.window drops NULL event times
        GROUP BY 1
    """,
    description="15-minute tumbling window via F.window (epoch-aligned, "
    "matching the oracle's floor(epoch/900) bucketing)",
)
def events_tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "events_json_extract",
    oracle="""
        SELECT event_type,
               round(avg(k), 4) AS avg_k,
               max(k)           AS max_k,
               count(*)         AS n
        FROM (
            -- json_valid + TRY_CAST mirror Spark's NULL-on-malformed
            -- get_json_object/try_cast (DuckDB's json_* RAISE instead)
            SELECT event_type,
                   CASE WHEN json_valid(props)
                        THEN TRY_CAST(json_extract_string(props, '$.k')
                                      AS BIGINT) END AS k
            FROM events
        )
        GROUP BY event_type
    """,
    description="semi-structured extraction: JSON props column → typed agg",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # try_cast: a non-numeric k is NULL on both engines, never an ANSI abort
    k = F.get_json_object("props", "$.k").try_cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WHERE ts IS NOT NULL  -- no position in time => no session
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   CAST(sum(new_session) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts)  AS session_start,
               max(ts)  AS session_end
        FROM sessions
        GROUP BY user_id, session_id
    """,
    description="sessionization: 30-min inactivity gap → session ids via "
    "lag + running sum (batch analog of session_window)",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL-ts event has no position in time and therefore no session —
    # excluded on both engines (their NULL sort orders differ, so leaving
    # them in would make session boundaries engine-dependent)
    e = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap so the 30-min threshold compares identically
    # in Spark and the oracle (no truncation at second granularity)
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_pivot_types",
    oracle="""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error
        FROM events
        GROUP BY user_id
    """,
    description="pivot event_type → per-user count columns (conditional agg)",
)
def events_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return e.groupBy("user_id").agg(*aggs)
