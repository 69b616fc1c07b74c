"""CUSUM change-point detection over the dense hourly event series.

``events_cusum_changepoint`` locates, per event type, the hour where
the cumulative deviation from the series mean peaks — the classic
CUSUM statistic S_t = sum_{i<=t}(x_i - mean). |S| peaking sharply is
the standard "when did the rate change?" diagnostic (a level shift
puts the peak AT the shift; a flat series keeps S near zero), the
complement of events6's ACF (is there structure?) and of the trailing
z-score anomaly flags (events3: is this bucket weird?) — CUSUM answers
WHERE the regime boundary sits.

Exactness: mean = total/n is rational, so the statistic is carried
integer-scaled by n — S_t * n = n * prefix_t - t * total, a BIGINT
identity both engines compute bit-identically (the same
cross-multiplication trick as the engine's float-average threshold
rule). The argmax tie-breaks on earliest hour, making the answer a
total order. Bounds: prefix <= total <= corpus events, t <= n <= 1.1M
hours (the 1970-2100 garbage window), so n*prefix fits BIGINT for any
corpus under ~8.4e12 events per type.

Scale: per-type dense series are time-length-bounded (a decade is 88k
hours), not corpus-bounded — counts aggregate map-side, the window
runs per type over model-sized series. 100 TB of events changes the
counts, not the series length.

Reference parity: core.clj has no time-series surface (SURVEY §2.5);
events-family extension alongside events6/events10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_cusum_changepoint",
    oracle="""
        WITH ev AS (
            SELECT event_type,
                   CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT) AS h
            FROM events
            WHERE ts IS NOT NULL
              AND ts >= TIMESTAMP '1970-01-01'
              AND ts < TIMESTAMP '2100-01-01'
              AND event_type IS NOT NULL
        ),
        counts AS (
            SELECT event_type, h, CAST(count(*) AS BIGINT) AS x
            FROM ev GROUP BY event_type, h
        ),
        span AS (
            SELECT min(h) AS lo, max(h) AS hi FROM counts
        ),
        spine AS MATERIALIZED (
            SELECT t.event_type,
                   unnest(generate_series((SELECT lo FROM span),
                                          (SELECT hi FROM span))) AS h
            FROM (SELECT DISTINCT event_type FROM counts) t
        ),
        series AS (
            SELECT s.event_type, s.h, COALESCE(c.x, 0) AS x
            FROM spine s
            LEFT JOIN counts c
              ON c.event_type = s.event_type AND c.h = s.h
        ),
        cusum AS (
            SELECT event_type, h,
                   CAST(row_number() OVER w AS BIGINT) AS t_idx,
                   CAST(sum(x) OVER (w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS prefix,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n_hours,
                   CAST(sum(x) OVER (PARTITION BY event_type)
                        AS BIGINT) AS total
            FROM series
            WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ),
        scored AS (
            SELECT event_type, h, t_idx, n_hours, total,
                   CAST(n_hours * prefix - t_idx * total AS BIGINT)
                       AS s_scaled,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(n_hours * prefix - t_idx * total) DESC,
                                h
                   ) AS rnk
            FROM cusum
        )
        SELECT event_type,
               h      AS cp_hour,
               t_idx  AS cp_idx,
               s_scaled,
               n_hours,
               total  AS total_events
        FROM scored WHERE rnk = 1
    """,
    description="CUSUM change-point per event type over the dense "
    "zero-filled hourly series: the hour maximizing |sum_{i<=t}(x_i - "
    "mean)| (earliest-hour tie-break) — the where-did-the-rate-shift "
    "diagnostic complementing ACF (structure) and trailing z-scores "
    "(local spikes); the statistic is integer-scaled by n (S*n = "
    "n*prefix - t*total, the cross-multiplied-mean trick) so both "
    "engines compute it in exact BIGINT arithmetic; series are "
    "time-length-bounded, so the window is model-sized at any corpus "
    "scale",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & (F.col("ts") >= F.lit("1970-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
        & F.col("event_type").isNotNull()
    )
    counts = (
        ev.select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
            .cast("long")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    span = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = counts.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(span)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    series = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("x", F.lit(0).cast("long")).alias("x")
    )
    w = W.partitionBy("event_type").orderBy("h")
    wall = W.partitionBy("event_type")
    cusum = series.select(
        "event_type",
        "h",
        F.row_number().over(w).cast("long").alias("t_idx"),
        F.sum("x").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("prefix"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_hours"),
        F.sum("x").over(wall).alias("total"),
    )
    scored = cusum.select(
        "event_type",
        "h",
        "t_idx",
        "n_hours",
        "total",
        (F.col("n_hours") * F.col("prefix") - F.col("t_idx") * F.col("total"))
        .cast("long")
        .alias("s_scaled"),
    ).withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.abs("s_scaled").desc(), "h")
        ),
    )
    return scored.where(F.col("rnk") == 1).select(
        "event_type",
        F.col("h").alias("cp_hour"),
        F.col("t_idx").alias("cp_idx"),
        "s_scaled",
        "n_hours",
        F.col("total").alias("total_events"),
    )
