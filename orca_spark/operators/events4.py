"""Temporal burst detection over the event stream.

``events_burst_hours`` flags, per event type, the hours whose event
count is more than three standard deviations above that type's mean
hourly count — the anomaly primitive behind rate-limit forensics, bot
detection, and incident timelines.

Determinism is the interesting part: a naive ``cnt > avg + 3*stddev``
compares floats whose last bits differ across engines (avg/stddev are
float folds). Here the flag is computed ENTIRELY in BIGINT by clearing
denominators — with S = sum of counts, SS = sum of squared counts over
n hours:

    cnt > mean + 3*sigma
    <=> (n*cnt - S) > 0  AND  (n*cnt - S)^2 > 9 * (n*SS - S^2)

(population sigma; both sides multiplied by n^2). Counts are bounded
by the data, so the squares stay far inside 64 bits. The REPORTED
z-score is then a double derived from the same integers and rounded —
the comparison itself never touches a float.

Scale: one map-side-combinable groupBy (type, hour) over two narrow
columns, then a |types|-row moment aggregation broadcast back — the
corpus is scanned once, and the second aggregation input is already
aggregate-sized.

Reference parity: no reference counterpart (core.clj is ORC I/O only);
§2.5 engine-surface extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_burst_hours",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, date_trunc('hour', ts)
        ),
        moments AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT)       AS n,
                   CAST(sum(cnt) AS BIGINT)       AS s,
                   CAST(sum(cnt * cnt) AS BIGINT) AS ss
            FROM hourly GROUP BY event_type
        )
        SELECT h.event_type, h.hour, h.cnt,
               round((m.n * h.cnt - m.s)
                     / nullif(sqrt(CAST(m.n * m.ss - m.s * m.s
                                        AS DOUBLE)), 0), 4)
                   AS zscore
        FROM hourly h JOIN moments m USING (event_type)
        WHERE (m.n * h.cnt - m.s) > 0
          AND (m.n * h.cnt - m.s) * (m.n * h.cnt - m.s)
              > 9 * (m.n * m.ss - m.s * m.s)
    """,
    description="per-type hourly burst detection: hours whose event "
    "count exceeds mean + 3 sigma for that type — the flag is pure "
    "BIGINT arithmetic with denominators cleared ((n*cnt-S)^2 > "
    "9*(n*SS-S^2)), so burst membership is cross-engine exact and "
    "only the reported z-score is a rounded double; one narrow "
    "map-side-combined groupBy then a types-row moment join",
)
def events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = hourly.join(F.broadcast(moments), "event_type")
    dev = F.col("n") * F.col("cnt") - F.col("s")  # n*(cnt - mean), BIGINT
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")  # n^2*var
    return (
        j.where((dev > 0) & (dev * dev > 9 * var_n2))
        .select(
            "event_type",
            "hour",
            "cnt",
            F.round(
                dev
                / F.expr("nullif(sqrt(CAST(n * ss - s * s AS DOUBLE)), 0)"),
                4,
            ).alias("zscore"),
        )
    )
