"""Time-series regularization: resample to a fixed grid with forward
fill — the shape that turns an irregular event stream into the regular
matrix every downstream consumer (features, anomaly monitors, training
curricula) actually wants.

The grid is generated per key with ``sequence()`` bounded by that key's
own [min(ts), max(ts)] span, so grid size is span/step per key — never
a global cross join.  Forward fill is one window ``last(ignorenulls)``
per key ordered by bucket; empty buckets get event-count 0 and the last
observed aggregate carried forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_STEP_S = 21_600  # 6-hour buckets: ~29-day user spans -> ~120 buckets/user


@register(
    "events_resample_ffill",
    oracle=f"""
        WITH b AS (
            SELECT user_id,
                   CAST(to_timestamp(floor(epoch(ts) / {_STEP_S}) * {_STEP_S})
                        AS TIMESTAMP) AS bucket,
                   value
            FROM events
        ),
        agg AS (
            SELECT user_id, bucket,
                   count(*) AS n, round(sum(value), 4) AS v
            FROM b GROUP BY user_id, bucket
        ),
        spans AS (
            SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
            FROM agg GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL {_STEP_S} SECONDS))
                       AS bucket
            FROM spans
        ),
        joined AS (
            SELECT g.user_id, g.bucket,
                   coalesce(a.n, 0) AS n_events, a.v AS v
            FROM grid g LEFT JOIN agg a
              ON g.user_id = a.user_id AND g.bucket = a.bucket
        )
        SELECT user_id, bucket, CAST(n_events AS BIGINT) AS n_events,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM joined
    """,
    description=f"resample to a fixed {_STEP_S // 3600}h grid with "
    "forward fill: per-user sequence() over the user's own span (grid "
    "size = span/step per key, never a global cross join), left join "
    "the bucketed aggregates, one last(ignorenulls) window carries the "
    "latest observation across empty buckets — the regularization pass "
    "before feature extraction or anomaly monitoring",
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two shuffles (bucket agg, per-user window), both on
    user_id-rooted keys.  Grid density is the operator's own lever —
    the step bounds output to span/step rows per key, and a key whose
    span/step exceeds the sort budget wants a coarser step, not a
    different algorithm.  The fill is null until a key's first
    observed bucket (nothing to carry) — deliberately preserved, the
    standard resample semantic."""
    ev = load(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / _STEP_S) * _STEP_S
    )
    agg = (
        ev.select("user_id", bucket.alias("bucket"), "value")
        .groupBy("user_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
    )
    spans = agg.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {_STEP_S} seconds"))
        ).alias("bucket"),
    )
    joined = grid.join(agg, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        "v",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        "n_events",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
    )


_ANOM_LOOKBACK = 8
_ANOM_Z = 3.0


@register(
    "events_anomaly_flags",
    oracle=f"""
        WITH b AS (
            SELECT user_id,
                   CAST(to_timestamp(floor(epoch(ts) / {_STEP_S}) * {_STEP_S})
                        AS TIMESTAMP) AS bucket,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
            FROM b GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL {_STEP_S} SECONDS))
                       AS bucket
            FROM spans
        ),
        series AS (
            SELECT g.user_id, g.bucket, coalesce(b.n, 0) AS n
            FROM grid g LEFT JOIN b
              ON g.user_id = b.user_id AND g.bucket = b.bucket
        ),
        scored AS (
            SELECT user_id, bucket, CAST(n AS BIGINT) AS n_events,
                   avg(n) OVER w AS mu,
                   stddev_samp(n) OVER w AS sd
            FROM series
            WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN {_ANOM_LOOKBACK} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT user_id, bucket, n_events,
               round((n_events - mu) / sd, 4) AS zscore,
               coalesce(abs((n_events - mu) / sd) > {_ANOM_Z!r}, FALSE)
                   AS is_anomaly
        FROM scored
        WHERE sd IS NOT NULL AND sd > 0
    """,
    description=f"time-series anomaly flags: per-user event counts on "
    f"the {_STEP_S // 3600}h grid scored against a trailing "
    f"{_ANOM_LOOKBACK}-bucket window (mean/stddev EXCLUDING the "
    f"current bucket — the classic leakage mistake avoided), "
    f"|z| > {_ANOM_Z} flags the spike/outage buckets; composes the "
    "gap-filled resample with one additional frame-bounded window, "
    "same single user_id shuffle",
)
def events_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / _STEP_S) * _STEP_S
    )
    b = (
        ev.select("user_id", bucket.alias("bucket"))
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spans = b.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval {_STEP_S} seconds"))
        ).alias("bucket"),
    )
    series = grid.join(b, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-_ANOM_LOOKBACK, -1)
    )
    scored = series.select(
        "user_id",
        "bucket",
        F.col("n").cast("long").alias("n_events"),
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sd")
    return (
        scored.where(F.col("sd").isNotNull() & (F.col("sd") > 0))
        .select(
            "user_id",
            "bucket",
            "n_events",
            F.round(z, 4).alias("zscore"),
            F.coalesce(F.abs(z) > _ANOM_Z, F.lit(False)).alias("is_anomaly"),
        )
    )
