"""Exact distributed quantiles by rank, and gaps-and-islands runs.

``orders_exact_median_by_rank`` computes the exact per-group median —
no approxQuantile, no engine ``median()`` — by the rank definition
itself: the value(s) at ranks floor((n+1)/2) and ceil((n+1)/2),
averaged. Engines disagree on interpolation conventions and approx
sketches are non-deterministic across partitionings; ranks over a
deterministic (value, key) order are neither. This is the pattern the
engine prescribes wherever an exact percentile must be reproducible:
one groupBy for counts, one ranking window, one filtered join.
(The two-value average divides decimal money by 2 exactly; the exact
decimal is cast to double at the surface ONLY for the comparison
harness — both engines cast the identical decimal, so the doubles are
bit-equal.)

``events_active_day_islands`` is the canonical gaps-and-islands
rewrite: each user's set of active days collapses into maximal runs of
CONSECUTIVE days using the rank-difference trick — day - rank is
constant within a run — entirely in integer date arithmetic. The
sessionization idiom at daily granularity: retention analyses consume
exactly these (user, streak) rows.

Scale: both are user/group-partitioned windows over narrow columns —
no global windows, no joins beyond group-sized aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "orders_exact_median_by_rank",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice,
                                               coalesce(o_orderkey, -1)) AS r,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
            WHERE o_totalprice IS NOT NULL
        )
        SELECT o_orderpriority,
               CAST(max(n) AS BIGINT) AS n_orders,
               CAST(CAST(avg(o_totalprice) AS DECIMAL(18, 4)) AS DOUBLE)
                   AS median_price
        FROM ranked
        WHERE r = (n + 1) // 2 OR r = (n + 2) // 2
        GROUP BY o_orderpriority
    """,
    description="exact per-group median by the rank definition (values "
    "at ranks floor/ceil of (n+1)/2, averaged; orderkey tie-break) — "
    "reproducible across engines and partitionings where approx "
    "sketches and interpolation conventions are not; decimal money "
    "stays exact since the two-value average divides by 2",
)
def orders_exact_median_by_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL prices are excluded (median over values, the aggregate-function
    # convention) BEFORE ranking: engines disagree on NULL sort position
    # (Spark NULLS FIRST asc, DuckDB NULLS LAST), so a NULL inside the
    # ranked frame would shift the median ranks differently per engine;
    # the orderkey tie-break is coalesced for the same reason.
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    w = W.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", F.coalesce("o_orderkey", F.lit(-1))
    )
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    return (
        ranked.where(
            (F.col("r") == F.expr("(n + 1) div 2"))
            | (F.col("r") == F.expr("(n + 2) div 2"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.avg("o_totalprice")
            .cast("decimal(18,4)")
            .cast("double")
            .alias("median_price"),
        )
    )


@register(
    "events_active_day_islands",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        grp AS (
            SELECT user_id, d,
                   d - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
            FROM days
        )
        SELECT user_id,
               CAST(min(d) AS VARCHAR)   AS streak_start,
               CAST(max(d) AS VARCHAR)   AS streak_end,
               CAST(count(*) AS BIGINT)  AS streak_days
        FROM grp
        GROUP BY user_id, anchor
    """,
    description="gaps-and-islands: each user's distinct active days "
    "collapsed into maximal consecutive-day streaks via the "
    "rank-difference trick (day minus rank is constant within a run) — "
    "pure integer date arithmetic, user-partitioned windows, the daily "
    "retention/streak primitive",
)
def events_active_day_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    return (
        grp.groupBy("user_id", "anchor")
        .agg(
            F.min("d").cast("string").alias("streak_start"),
            F.max("d").cast("string").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("anchor")
    )
