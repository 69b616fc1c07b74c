"""Streaming batch 3: stream-stream joins — the remaining big
Structured Streaming primitive (jobs.py covers windowed aggs, session
windows, stream-static joins, stateful ops and sinks).

A stream-stream inner join buffers BOTH sides in the state store; the
watermarks plus the time-range join condition are what make that state
finite — Spark derives "a click older than (watermark - 1h) can never
match a future purchase" and evicts it. Without the range condition
the state grows forever; with it, state is bounded by (rate x horizon)
regardless of total stream length. That is the 100 TB/day contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events


@register(
    "streaming_click_purchase_attribution",
    oracle="""
        SELECT c.event_id                          AS click_id,
               p.event_id                          AS purchase_id,
               c.user_id                           AS user_id,
               epoch_us(p.ts) - epoch_us(c.ts)     AS lag_us
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    description="stream-stream inner join: each purchase attributed to "
    "the same user's clicks in the preceding hour, both sides "
    "watermarked (1h) with a time-range join condition so the join "
    "state is evicted at the watermark horizon — bounded state at any "
    "stream length; oracle is the identical batch join",
)
def streaming_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    out = run_to_memory(joined, output_mode="append")
    return out.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
