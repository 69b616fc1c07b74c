"""Robust statistics batch: Theil-Sen trend estimation and the
Kaplan-Meier survival curve.

``events_theilsen_trend`` fits the Theil-Sen slope (Theil 1950, Sen
1968) to each event type's hourly-count series: the MEDIAN of all
pairwise slopes. It is the standard robust alternative to OLS trend —
up to ~29% outlier contamination (one corrupted ingest hour, a bot
burst) cannot move it, where a single wild hour drags a least-squares
slope arbitrarily. The pairwise self-join is O(H^2) per type, but H is
CALENDAR-bounded (hours in the observation window — 720 for a month —
independent of row volume), so at 100 TB the expensive part is the
hourly pre-aggregation, which is the usual partial-agg shuffle; the
pair stage stays a few hundred thousand rows per type forever.

``orders_survival_km`` is the Kaplan-Meier product-limit estimator
(Kaplan & Meier 1958) over customer inter-order gaps: each pair of
consecutive orders contributes an observed re-order duration, and each
customer's span from last order to the end of the observation window
contributes a RIGHT-CENSORED duration (they hadn't re-ordered *yet* —
dropping these, as a naive gap histogram does, biases re-order time
low). S(t) = prod_{t_i <= t} (1 - d_i / n_i) over event times t_i with
d_i events and n_i at risk.

Determinism: all counts are integers; slopes and hazard terms are
single double divisions of integers (IEEE-exact, identical both
engines); the exact median takes the two middle ORDER-STATISTICS (tie
order cannot change the value at a rank); the KM product runs as
exp(running-sum of ln terms) where the running frame fixes the
summation ORDER, so even float accumulation is bit-reproducible
cross-engine; every surfaced float uses the power-of-two fixed-point
encoding (floor(x * 2^16) — multiply-by-2^16 and floor are exact on
binary doubles), immune to the round-half repr divergence.

Scale: theilsen = one partial-agg shuffle + a bounded self-join;
KM = one window per customer (lag), one global date broadcast, then
an aggregation whose key cardinality is DISTINCT GAP DAYS (bounded by
the calendar window), so the final curve stage is tiny at any volume.

Reference parity: core.clj (683 LoC) has no analytics surface; this is
the SURVEY §2.5 engine-extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_theilsen_trend",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   (b.c - a.c) * 3600.0 / (b.h - a.h) AS slope
            FROM hourly a JOIN hourly b
              ON a.event_type = b.event_type AND a.h < b.h
        ),
        ranked AS (
            SELECT event_type, slope,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM pairs
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_pairs,
               CAST(floor(avg(slope) * 65536) AS BIGINT) AS slope_fp
        FROM ranked
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY event_type
    """,
    description="Theil-Sen robust trend per event type (Theil 1950 / "
    "Sen 1968): median of all pairwise slopes of the hourly-count "
    "series, immune to outlier hours that wreck an OLS fit — hourly "
    "partial-agg shuffle, then a CALENDAR-bounded O(H^2) pair join "
    "(H never grows with data volume), exact two-middle median, "
    "2^16 fixed-point surface",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = hourly.select(
        F.col("event_type"), F.col("h").alias("h1"), F.col("c").alias("c1")
    )
    b = hourly.select(
        F.col("event_type").alias("et2"),
        F.col("h").alias("h2"),
        F.col("c").alias("c2"),
    )
    pairs = a.join(
        b, (a.event_type == b.et2) & (F.col("h1") < F.col("h2"))
    ).select(
        "event_type",
        ((F.col("c2") - F.col("c1")) * F.lit(3600.0) / (F.col("h2") - F.col("h1"))).alias(
            "slope"
        ),
    )
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("slope"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("event_type"))
        .alias("n"),
    )
    mid = ranked.where(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return mid.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.floor(F.avg("slope") * F.lit(65536.0)).cast("long").alias("slope_fp"),
    )


@register(
    "orders_survival_km",
    oracle="""
        WITH o AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        ),
        horizon AS (SELECT max(od) AS maxd FROM o),
        gaps AS (
            SELECT datediff('day', prev_od, od) AS t, 1 AS ev
            FROM (SELECT od,
                         lag(od) OVER (PARTITION BY o_custkey
                                       ORDER BY od, o_orderkey) AS prev_od
                  FROM o)
            WHERE prev_od IS NOT NULL
        ),
        censored AS (
            SELECT datediff('day', max(od), (SELECT maxd FROM horizon)) AS t,
                   0 AS ev
            FROM o GROUP BY o_custkey
        ),
        obs AS (SELECT * FROM gaps UNION ALL SELECT * FROM censored),
        per_t AS (
            SELECT t,
                   CAST(count(*) FILTER (WHERE ev = 1) AS BIGINT) AS d,
                   CAST(count(*) FILTER (WHERE ev = 0) AS BIGINT) AS cns,
                   CAST(count(*) AS BIGINT) AS total
            FROM obs GROUP BY t
        ),
        at_risk AS (
            SELECT t, d, cns,
                   CAST(sum(total) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS n_risk
            FROM per_t
        ),
        curve AS (
            SELECT t, d, cns, n_risk,
                   CASE WHEN sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                            OVER (ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) > 0
                        THEN 0.0
                        ELSE exp(sum(ln(CASE WHEN d = n_risk THEN 1.0
                                        ELSE 1.0 - d * 1.0 / n_risk END))
                                 OVER (ORDER BY t
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW))
                   END AS s
            FROM at_risk
        )
        SELECT CAST(t AS BIGINT) AS t_days, n_risk,
               d AS n_events, cns AS n_censored,
               CAST(floor(s * 65536) AS BIGINT) AS survival_fp
        FROM curve
        WHERE d > 0
    """,
    description="Kaplan-Meier product-limit survival of customer "
    "re-order time (Kaplan & Meier 1958): observed gaps between "
    "consecutive orders are events, last-order-to-horizon spans are "
    "right-censored; S(t) = prod(1 - d_i/n_i) computed as an exp of an "
    "ORDERED running ln-sum (bit-reproducible cross-engine) — per-"
    "customer lag window, then a curve over distinct gap days "
    "(calendar-bounded key space), 2^16 fixed-point surface",
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("od"),
            "o_orderkey",
        )
    )
    horizon = o.agg(F.max("od").alias("maxd"))
    wc = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = (
        o.withColumn("prev_od", F.lag("od").over(wc))
        .where(F.col("prev_od").isNotNull())
        .select(F.datediff("od", "prev_od").alias("t"), F.lit(1).alias("ev"))
    )
    censored = (
        o.groupBy("o_custkey")
        .agg(F.max("od").alias("last_od"))
        .crossJoin(F.broadcast(horizon))
        .select(F.datediff("maxd", "last_od").alias("t"), F.lit(0).alias("ev"))
    )
    obs = gaps.unionAll(censored)
    per_t = obs.groupBy("t").agg(
        F.count(F.when(F.col("ev") == 1, 1)).cast("long").alias("d"),
        F.count(F.when(F.col("ev") == 0, 1)).cast("long").alias("cns"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    w_desc = W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_asc = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    # when d == n_risk the survivor function hits EXACTLY zero and stays
    # there (ln(0) is undefined; DuckDB raises, Spark would null-skip the
    # term inside the window sum — both wrong): carry an absorbing-zero
    # flag and feed ln a neutral 1.0 on those rows instead
    hit_zero = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    safe_term = F.when(F.col("d") == F.col("n_risk"), F.lit(1.0)).otherwise(
        F.lit(1.0) - F.col("d") * F.lit(1.0) / F.col("n_risk")
    )
    curve = per_t.withColumn(
        "n_risk", F.sum("total").over(w_desc).cast("long")
    ).withColumn(
        "s",
        F.when(F.sum(hit_zero).over(w_asc) > 0, F.lit(0.0)).otherwise(
            F.exp(F.sum(F.log(safe_term)).over(w_asc))
        ),
    )
    return curve.where(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("cns").alias("n_censored"),
        F.floor(F.col("s") * F.lit(65536.0)).cast("long").alias("survival_fp"),
    )
