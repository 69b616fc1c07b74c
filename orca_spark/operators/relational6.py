"""Relational surface, batch 6: the remaining join/window/aggregate
shapes — full-outer reconciliation, positional window values, and the
statistical aggregate family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "join_full_outer_ledger",
    oracle="""
        WITH spend AS (
            SELECT o_custkey AS id, round(sum(o_totalprice), 2) AS order_spend
            FROM orders GROUP BY o_custkey
        ),
        activity AS (
            SELECT user_id AS id, round(CAST(sum(value) AS DOUBLE), 2) AS event_value
            FROM events GROUP BY user_id
        )
        SELECT coalesce(s.id, a.id) AS id,
               coalesce(s.order_spend, 0.0) AS order_spend,
               coalesce(a.event_value, 0.0) AS event_value,
               (s.id IS NOT NULL AND a.id IS NOT NULL) AS in_both
        FROM spend s FULL OUTER JOIN activity a ON s.id = a.id
    """,
    description="full-outer reconciliation: order spend vs event value "
    "per id, keeping rows present on either side (the ledger-diff "
    "pattern); both sides pre-aggregated to one row per key before the "
    "join, so the full-outer shuffle carries aggregates, not facts",
)
def join_full_outer_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    spend = o.groupBy(F.col("o_custkey").alias("id")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("order_spend")
    )
    activity = e.groupBy(F.col("user_id").alias("id")).agg(
        F.round(F.sum("value").cast("double"), 2).alias("event_value")
    )
    s, a = spend.alias("s"), activity.alias("a")
    return (
        s.join(a, F.col("s.id") == F.col("a.id"), "full_outer")
        .select(
            F.coalesce(F.col("s.id"), F.col("a.id")).alias("id"),
            F.coalesce("order_spend", F.lit(0.0)).alias("order_spend"),
            F.coalesce("event_value", F.lit(0.0)).alias("event_value"),
            (F.col("s.id").isNotNull() & F.col("a.id").isNotNull()).alias("in_both"),
        )
    )


@register(
    "window_first_last_orders",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    description="positional window values: first/last/nth order price "
    "per customer over the full-partition frame (explicit UNBOUNDED "
    "frame — the default RANGE..CURRENT ROW frame makes last_value a "
    "running value, the classic SQL footgun)",
)
def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "stats_moments_lineitem",
    oracle="""
        WITH s AS (
            SELECT count(*)::DOUBLE AS n,
                   round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
                   round(stddev_samp(l_extendedprice), 4)            AS price_stddev,
                   sum(l_extendedprice)            AS s1,
                   sum(l_extendedprice ^ 2)        AS s2,
                   sum(l_extendedprice ^ 3)        AS s3
            FROM lineitem
        )
        SELECT qty_price_corr, qty_price_covar, price_stddev,
               round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)^3)
                     / ((s2/n - (s1/n)^2) ^ 1.5), 6) AS price_pop_skew
        FROM s
    """,
    description="statistical aggregate family in one partial-aggregated "
    "pass: correlation, sample covariance/stddev, and population "
    "skewness computed from raw power sums — engines disagree on "
    "skewness bias correction, so the moment formula is pinned "
    "explicitly on both sides; all single-scan streaming aggregates",
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.sum("l_extendedprice").alias("s1"),
        F.sum(F.pow("l_extendedprice", 2)).alias("s2"),
        F.sum(F.pow("l_extendedprice", 3)).alias("s3"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    return s.select(
        "qty_price_corr",
        "qty_price_covar",
        "price_stddev",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("price_pop_skew"),
    )


@register(
    "events_rollup_hierarchy",
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               count(*)::BIGINT      AS n,
               round(CAST(sum(value) AS DOUBLE), 2) AS total
        FROM events
        GROUP BY 1
    """,
    description="hierarchical rollup reuse (continuous-aggregate "
    "pattern): minute-level partials computed once, hour derived by "
    "re-aggregating minutes, day by re-aggregating hours — each level "
    "reduces ~60x, so the day rollup touches minutes-level rows, never "
    "raw events twice; oracle computes day directly from raw events, "
    "proving the re-aggregation exact",
)
def events_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    minute = e.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    hour = minute.groupBy(F.date_trunc("hour", "minute").alias("hour")).agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )
    day = hour.groupBy(F.date_trunc("day", "hour").alias("day")).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("total").cast("double"), 2).alias("total"),
    )
    return day
