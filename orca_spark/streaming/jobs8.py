"""Streaming batch 8: SLIDING (overlapping) window aggregation.

``streaming_sliding_window_counts`` — the tumbling hourly job (jobs.py)
assigns each event to exactly one bucket; the sliding form assigns it
to every window whose span covers it (1-hour windows sliding every 15
minutes → 4 windows per event), which is what rate monitors and
rolling SLAs actually want: a spike is visible within one slide
interval instead of waiting for a bucket boundary. State cost scales
by the overlap factor (window/slide = 4 rows of state per key-hour),
bounded by the same watermark.

The batch oracle expands the window-assignment rule explicitly — each
event joins to offsets 0..3 and its window start is
floor-to-15-minutes minus offset*15min — so the streaming operator's
window math is checked value-for-value, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events


@register(
    "streaming_sliding_window_counts",
    oracle="""
        WITH base AS (
            SELECT ts, event_type FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
        ),
        assigned AS (
            SELECT event_type,
                   to_timestamp(
                       (epoch_us(ts) // 900000000) * 900
                       - o.k * 900
                   ) AS w_start
            FROM base, UNNEST(generate_series(0, 3)) AS o(k)
        )
        SELECT CAST(w_start AS TIMESTAMP) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM assigned
        GROUP BY 1, 2
    """,
    description="sliding-window streaming aggregation: 1-hour windows "
    "sliding every 15 minutes (each event counted in 4 overlapping "
    "windows — the rolling-SLA shape where a spike is visible within "
    "one slide interval); the batch oracle expands the assignment rule "
    "explicitly (floor-to-slide minus offset*slide), checking the "
    "window math value-for-value; state is overlap-factor x keys, "
    "watermark-bounded",
)
def streaming_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("ts", "event_type")
    # explicit event-time admission, same rule as jobs7 (NULL and
    # epoch-0 rows behave nondeterministically at the initial watermark)
    ev = ev.where(F.col("ts").isNotNull() & (F.col("ts") > F.timestamp_micros(F.lit(0))))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )
