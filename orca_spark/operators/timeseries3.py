"""Seasonal structure: classical decomposition and cross-series
correlation.

* ``orders_seasonal_decomposition`` — the classical trend/seasonal
  split of monthly revenue: trend = centered 12-month moving average
  (defined only where a full window exists), seasonal ratio =
  month / trend. The first decomposition every demand-planning
  analysis draws; months without a complete window surface with NULL
  trend rather than a silently-shortened average.
* ``events_type_correlation_hourly`` — Pearson correlation between
  the dense zero-filled hourly count series of every event-type pair:
  the cross-stream dependence map ("do errors spike with clicks?").
  Complements ``events_acf_hourly`` (one series vs its own past) with
  series-vs-series structure at lag 0.

Determinism: monthly revenue rides as BIGINT cents (per-row
double→cents rounding is unambiguous — see spark4.py's rationale);
the moving average divides an exact BIGINT by an exact count; all
correlation moments are BIGINT sums over exact integer counts, so
both engines evaluate the identical IEEE expression, rounded at the
surface. Hour spines are generated min..max with the engine's
standard event-time garbage window.

Scale: everything aggregates to month- or hour-granularity before any
window or join; the correlation's pair join runs on |types|² × spine
rows — time-length-sized, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.events6 import _hourly_series  # noqa: F401 (doc link)
from orca_spark.registry import register
from orca_spark.tables import load

_MA = 12  # centered moving-average width (months)


@register(
    "orders_seasonal_decomposition",
    oracle=f"""
        WITH monthly AS (
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                        AS BIGINT) AS ym,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        win AS (
            SELECT ym, cents,
                   CAST(sum(cents) OVER w AS BIGINT) AS wsum,
                   CAST(count(*) OVER w AS BIGINT) AS wn
            FROM monthly
            WINDOW w AS (ORDER BY ym
                         ROWS BETWEEN {_MA // 2 - 1} PRECEDING
                                  AND {_MA // 2} FOLLOWING)
        )
        SELECT ym,
               CAST(round(cents / 100.0, 2) AS DOUBLE) AS revenue,
               CASE WHEN wn = {_MA}
                    THEN round(wsum / 100.0 / {_MA}, 4) END AS trend,
               CASE WHEN wn = {_MA}
                    THEN round(cents * {_MA} * 1.0 / wsum, 4) END
                   AS seasonal_ratio
        FROM win
    """,
    description=f"classical seasonal decomposition of monthly revenue: "
    f"centered {_MA}-month moving-average trend (NULL where the window "
    "is incomplete, never a silently-shortened average) and the "
    "month/trend seasonal ratio — the demand-planning baseline; "
    "revenue rides as BIGINT cents so every surfaced value derives "
    "from exact integers, ratios rounded at the surface; one "
    "aggregation to |months| rows, then a model-sized ordered window",
)
def orders_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    monthly = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents")
    )
    w = W.orderBy("ym").rowsBetween(-(_MA // 2 - 1), _MA // 2)
    win = monthly.select(
        "ym",
        "cents",
        F.sum("cents").over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    full = F.col("wn") == _MA
    return win.select(
        "ym",
        F.round(F.col("cents") / F.lit(100.0), 2).cast("double").alias("revenue"),
        F.when(full, F.round(F.col("wsum") / 100.0 / _MA, 4)).alias("trend"),
        F.when(
            full,
            F.round(F.col("cents") * _MA * F.lit(1.0) / F.col("wsum"), 4),
        ).alias("seasonal_ratio"),
    )


@register(
    "events_type_correlation_hourly",
    oracle="""
        WITH counts AS (
            SELECT event_type,
                   CAST(floor(epoch(date_trunc('hour', ts)) / 3600)
                        AS BIGINT) AS h,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
              AND ts >= TIMESTAMP '1970-01-01'
              AND ts < TIMESTAMP '2100-01-01'
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT unnest(generate_series((SELECT min(h) FROM counts),
                                          (SELECT max(h) FROM counts))) AS h
        ),
        types AS (SELECT DISTINCT event_type FROM counts),
        series AS MATERIALIZED (
            SELECT t.event_type, s.h, COALESCE(c.n, 0) AS n
            FROM types t
            CROSS JOIN spine s
            LEFT JOIN counts c
              ON c.event_type = t.event_type AND c.h = s.h
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(a.n) AS BIGINT) AS sx,
                   CAST(sum(b.n) AS BIGINT) AS sy,
                   CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
                   CAST(sum(b.n * b.n) AS BIGINT) AS syy,
                   CAST(sum(a.n * b.n) AS BIGINT) AS sxy
            FROM series a
            JOIN series b ON b.h = a.h AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, m AS n_hours,
               round((m * sxy - sx * sy)
                     / nullif(sqrt((m * sxx - sx * sx) * 1.0
                                   * (m * syy - sy * sy)), 0), 4) AS corr
        FROM pairs
    """,
    description="Pearson correlation between every event-type pair's "
    "dense zero-filled hourly count series: the cross-stream "
    "dependence map complementing the single-series autocorrelation; "
    "all moments are BIGINT sums over exact integer counts (identical "
    "IEEE expression both engines, rounded at the surface), the pair "
    "join runs on |types|^2 x spine rows — time-length-sized at any "
    "corpus scale, with the standard event-time garbage window",
)
def events_type_correlation_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & (F.col("ts") >= F.lit("1970-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
    )
    counts = ev.select(
        "event_type",
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / F.lit(3600))
        .cast("long")
        .alias("h"),
    ).groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    span = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    types = counts.select("event_type").distinct()
    series = (
        F.broadcast(types)
        .crossJoin(spine)
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type", "h", F.coalesce("n", F.lit(0).cast("long")).alias("n")
        )
        .localCheckpoint(eager=False)
    )
    a = series.select(
        F.col("event_type").alias("type_a"), "h", F.col("n").alias("x")
    )
    b = series.select(
        F.col("event_type").alias("type_b"), "h", F.col("n").alias("y")
    )
    sums = (
        a.join(b, "h")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "type_a",
        "type_b",
        F.col("m").alias("n_hours"),
        F.round(num / F.nullif(den, F.lit(0.0)), 4).alias("corr"),
    )
