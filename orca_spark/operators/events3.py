"""Sequence mining, rolling reach, and robust dispersion over events.

* ``events_trigram_sequences`` — order-2 behavioral chains: counts of
  consecutive event-type trigrams across user timelines (the next step
  up from ``events_markov_transitions``' order-1 matrix; what a
  session-intent model trains on).
* ``events_rolling_dau_7d`` — 7-day rolling distinct users per day
  ("weekly reach"): the windowed COUNT DISTINCT that plain window
  frames cannot express, via a bounded day-level self-join.
* ``events_mad_robust`` — median / MAD per event type with a robust
  outlier count: the dispersion profile that, unlike stddev-based
  z-scores (``events_anomaly_flags``), a single corrupt magnitude
  cannot poison.

Reference parity: the reference (core.clj) aggregates only
sum/min/max/count (core.clj:220-226).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

# events rows eligible for sequencing: every column the ordering or the
# chain itself depends on must be present (a NULL ts/event_id would
# order differently across engines; a NULL type is a broken chain link)
_SEQ_FILTER = (
    "ts IS NOT NULL AND event_id IS NOT NULL AND event_type IS NOT NULL"
)


@register(
    "events_trigram_sequences",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type, 1) OVER w AS prev1,
                   lag(event_type, 2) OVER w AS prev2
            FROM events
            WHERE {_SEQ_FILTER}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT prev2 AS t1, prev1 AS t2, event_type AS t3,
               CAST(count(*) AS BIGINT) AS n
        FROM seq
        WHERE prev2 IS NOT NULL AND prev1 IS NOT NULL
        GROUP BY 1, 2, 3
    """,
    description="order-2 behavioral sequence counts: consecutive "
    "event-type trigrams over per-user timelines (two lag windows, one "
    "shared user_id shuffle), pure integer counts — the training table "
    "for session-intent models, one order above the Markov matrix",
)
def events_trigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both lags share ONE user_id-partitioned sort; the trigram
    count partial-aggregates on (t1, t2, t3) — a |types|³-bounded key
    space, model-sized however large the log. Determinism: rows
    lacking ts/event_id/event_type are excluded up front (ordering
    tiebreaks and chain links), everything else is integer."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load(spark, sf_dir, "events")
        .where(F.expr(_SEQ_FILTER))
        .select(
            "event_type",
            F.lag("event_type", 1).over(w).alias("prev1"),
            F.lag("event_type", 2).over(w).alias("prev2"),
        )
    )
    return (
        seq.where(F.col("prev2").isNotNull() & F.col("prev1").isNotNull())
        .groupBy(
            F.col("prev2").alias("t1"),
            F.col("prev1").alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_rolling_dau_7d",
    oracle="""
        WITH daily AS (
            -- day as a midnight-aligned TIMESTAMP (date_trunc), the
            -- engine-wide bucket convention: DATE columns surface as
            -- python date objects from Spark but datetime64 from
            -- DuckDB and defeat the comparator's dtype unification
            SELECT DISTINCT date_trunc('day', ts) AS day, user_id
            FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        days AS (SELECT DISTINCT day FROM daily)
        SELECT d.day,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS dau_7d
        FROM days d
        JOIN daily u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY d.day
    """,
    description="7-day rolling distinct users per day (weekly reach): "
    "day-level dedup first, then a bounded 7-day band join between the "
    "DAY table and the (day, user) table — the windowed COUNT DISTINCT "
    "that frame-based windows cannot express",
)
def events_rolling_dau_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the corpus-sized work is the FIRST dedup (distinct (day,
    user) — one shuffle with partial dedup map-side); the band join
    then runs days × (day, user) where the left side is |days| rows,
    broadcast, and each daily-user row fans out at most 7× before the
    final count-distinct shuffle on day. Determinism: pure
    integers/dates; NULL ts/user excluded up front."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
    daily = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    days = daily.select("day").distinct()
    return (
        F.broadcast(days.alias("d"))
        .join(
            daily.alias("u"),
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("dau_7d"))
    )


@register(
    "events_mad_robust",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m ON e.event_type = m.event_type
            WHERE e.value IS NOT NULL
        ),
        mad AS (
            SELECT event_type, any_value(med) AS med,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad,
                   count(*) AS n
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               round(m.med, 4) AS med,
               round(m.mad, 4) AS mad,
               CAST(m.n AS BIGINT) AS n,
               CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type, m.med, m.mad, m.n
    """,
    description="median / MAD per event type with a robust outlier "
    "count (|x - med| > 3*MAD): the dispersion profile a single corrupt "
    "magnitude cannot poison, unlike the stddev z-score family; exact "
    "interpolated medians on both engines (approx_percentile is the "
    "100 TB swap)",
)
def events_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two grouped exact-percentile passes plus one broadcast of
    the per-type medians (|types| rows) back over the stream; at real
    scale swap F.percentile for approx_percentile (same shape, the
    documented trade in percentiles_exact). Determinism: interpolated
    medians come from SORTED identical value sets (no summation-order
    sensitivity); the outlier comparison operates on bit-identical
    doubles on both engines; display columns rounded (4)."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med2"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med2", "mad", "n")
        .agg(
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers")
        )
        .select(
            "event_type",
            F.round("med2", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n",
            "n_outliers",
        )
    )
