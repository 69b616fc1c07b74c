"""Growth accounting and series repair.

* ``events_daily_new_vs_returning`` — the growth-accounting split:
  per day, how many active users are NEW (first ever seen that day)
  vs RETURNING. The first chart in any engagement review, and the
  denominator source for retention curves.
* ``events_hourly_gap_interpolation`` — linear interpolation of
  MISSING hours in the hourly count series: the series-repair step
  between zero-filling (a real "nothing happened") and model input
  (where a collector outage must not read as zero demand). Interior
  gaps get the linear blend of the nearest observed neighbors;
  leading/trailing gaps (no neighbor on one side) stay NULL — repair
  never invents data beyond the observed span. A window showcase:
  IGNORE NULLS last/first over asymmetric unbounded frames.

Determinism: the new/returning split is all integer date arithmetic;
interpolation blends two BIGINT counts with a ratio of exact integer
distances — identical doubles both engines — rounded at the surface.

Scale: first-seen is one user-keyed min; the daily split is a
date-keyed aggregation. The interpolation series is time-length-sized
(hour spine), so its ordered windows are model-sized; at corpus scale
only the initial hour aggregation touches the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_daily_new_vs_returning",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS first_d
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id
        ),
        daily AS (
            SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT CAST(d.d AS VARCHAR) AS day,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN d.d = f.first_d THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN d.d = f.first_d THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_returning
        FROM daily d JOIN firsts f USING (user_id)
        GROUP BY d.d
    """,
    description="daily growth accounting: active users split into new "
    "(first-ever-seen that day) vs returning — the retention-curve "
    "denominator table; one user-keyed min for first-seen, one "
    "date-keyed aggregation over distinct (day, user) activity, all "
    "integer date arithmetic with ISO date-string surfaces",
)
def events_daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    daily = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    firsts = daily.groupBy("user_id").agg(F.min("d").alias("first_d"))
    is_new = F.when(F.col("d") == F.col("first_d"), 1).otherwise(0)
    return (
        daily.join(firsts, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(is_new).cast("long").alias("n_new"),
            (F.count(F.lit(1)) - F.sum(is_new)).cast("long").alias(
                "n_returning"
            ),
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "n_active",
            "n_new",
            "n_returning",
        )
    )


@register(
    "events_hourly_gap_interpolation",
    oracle="""
        WITH counts AS (
            SELECT CAST(floor(epoch(date_trunc('hour', ts)) / 3600)
                        AS BIGINT) AS h,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE ts IS NOT NULL
              AND ts >= TIMESTAMP '1970-01-01'
              AND ts < TIMESTAMP '2100-01-01'
            GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series((SELECT min(h) FROM counts),
                                          (SELECT max(h) FROM counts))) AS h
        ),
        series AS MATERIALIZED (
            SELECT s.h, c.n
            FROM spine s LEFT JOIN counts c USING (h)
        ),
        bounded AS (
            SELECT h, n,
                   last_value(n IGNORE NULLS) OVER
                       (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS prev_n,
                   last_value(CASE WHEN n IS NOT NULL THEN h END
                              IGNORE NULLS) OVER
                       (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS prev_h,
                   first_value(n IGNORE NULLS) OVER
                       (ORDER BY h ROWS BETWEEN CURRENT ROW
                                            AND UNBOUNDED FOLLOWING) AS next_n,
                   first_value(CASE WHEN n IS NOT NULL THEN h END
                               IGNORE NULLS) OVER
                       (ORDER BY h ROWS BETWEEN CURRENT ROW
                                            AND UNBOUNDED FOLLOWING) AS next_h
            FROM series
        )
        SELECT h,
               n IS NOT NULL AS observed,
               round(CASE
                   WHEN n IS NOT NULL THEN n * 1.0
                   WHEN prev_n IS NOT NULL AND next_n IS NOT NULL
                   THEN prev_n
                        + (next_n - prev_n) * (h - prev_h) * 1.0
                          / (next_h - prev_h)
               END, 4) AS n_filled
        FROM bounded
    """,
    description="linear interpolation of MISSING hours in the hourly "
    "count series (collector-outage repair — unlike zero-filling, a "
    "gap must not read as zero demand): interior gaps blend the "
    "nearest observed neighbors by exact integer distances, "
    "leading/trailing gaps stay NULL (never invent data beyond the "
    "observed span); IGNORE-NULLS last/first over asymmetric "
    "unbounded frames on the time-length-sized spine, blend rounded "
    "at the surface",
)
def events_hourly_gap_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & (F.col("ts") >= F.lit("1970-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
    )
    counts = ev.select(
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
        .cast("long")
        .alias("h")
    ).groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    span = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    series = spine.join(counts, "h", "left")
    # both directions as GROWING frames: Spark's shrinking
    # ([current, unbounded following]) frame processor re-evaluates the
    # function per row — O(n²), a multi-minute hang on a 473k-hour
    # spine — while growing frames update incrementally in O(n); the
    # forward-looking neighbor is just the backward-looking one under a
    # DESC ordering
    wb = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    wr = W.orderBy(F.col("h").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    obs_h = F.when(F.col("n").isNotNull(), F.col("h"))
    bounded = series.select(
        "h",
        "n",
        F.last("n", ignorenulls=True).over(wb).alias("prev_n"),
        F.last(obs_h, ignorenulls=True).over(wb).alias("prev_h"),
        F.last("n", ignorenulls=True).over(wr).alias("next_n"),
        F.last(obs_h, ignorenulls=True).over(wr).alias("next_h"),
    )
    blend = F.col("prev_n") + (F.col("next_n") - F.col("prev_n")) * (
        F.col("h") - F.col("prev_h")
    ) * F.lit(1.0) / (F.col("next_h") - F.col("prev_h"))
    return bounded.select(
        "h",
        F.col("n").isNotNull().alias("observed"),
        F.round(
            F.when(F.col("n").isNotNull(), F.col("n") * F.lit(1.0)).when(
                F.col("prev_n").isNotNull() & F.col("next_n").isNotNull(),
                blend,
            ),
            4,
        ).alias("n_filled"),
    )
