"""Range (interval) joins without a cartesian plan.

Spark has no native range-join optimization: a plain non-equi join
compiles to BroadcastNestedLoopJoin (or worse, a cartesian product with
post-filter) — both are O(n·m) and unusable at 100 TB. The standard
scale-safe rewrite is BUCKETIZATION: quantize the range dimension into
fixed-width buckets, expand the *interval* side to every bucket its
interval touches (bounded fan-out = interval_width / bucket_width + 1),
equi-join on (key, bucket), then apply the exact range predicate.
Candidates per pair are generated exactly once because the *point* side
lands in exactly one bucket. The join is then a plain shuffled/broadcast
hash join — skew handled by AQE like any other equi-join.

The reference (an ORC codec library) has none of this; it is engine
surface per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    interval_lo: str,
    interval_hi: str,
    bucket_seconds: int,
) -> DataFrame:
    """Equi-key + ``lo <= ts < hi`` join via bucket expansion.

    ``points`` carries one timestamp column ``point_ts``; ``intervals``
    carries ``[interval_lo, interval_hi)``. ``bucket_seconds`` should be
    on the order of the typical interval width: the interval side fans
    out to ``width/bucket + 1`` rows (choose the bucket so this stays
    single-digit), the point side stays 1:1, and every qualifying pair
    matches in exactly one bucket, so no post-join dedup is needed.
    """
    b = F.lit(bucket_seconds).cast("long")
    p = points.withColumn("_bkt", (F.unix_timestamp(F.col(point_ts)) / b).cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(interval_lo)) / b).cast("long"),
                (F.unix_timestamp(F.col(interval_hi)) / b).cast("long"),
            )
        ),
    )
    cond = [p["_bkt"] == iv["_bkt"]] + [p[k] == iv[k] for k in keys]
    exact = (F.col(point_ts) >= F.col(interval_lo)) & (F.col(point_ts) < F.col(interval_hi))
    out = p.join(iv, cond, "inner").where(exact)
    for k in keys:
        out = out.drop(iv[k])
    return out.drop(p["_bkt"]).drop(iv["_bkt"])


@register(
    "range_join_view_attribution",
    oracle="""
        SELECT p.event_id AS purchase_id,
               count(v.event_id) AS views_1h
        FROM events p
        LEFT JOIN events v
          ON v.user_id = p.user_id
         AND v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 1 HOUR
         AND v.ts <  p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """,
    description="attribution range join: views in the hour before each "
    "purchase by the same user — bucketized interval join (1h buckets, "
    "purchase side fans out to <=2 buckets) + exact predicate, compiled "
    "to a plain equi-join; never a BroadcastNestedLoopJoin",
)
def range_join_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    matched = interval_join(
        views, purchases, ["user_id"], "v_ts", "lo", "hi", bucket_seconds=3600
    ).groupBy("purchase_id").agg(F.count(F.lit(1)).alias("views_1h"))
    # LEFT-join semantics: purchases with zero prior views keep a 0 row
    return (
        purchases.select("purchase_id")
        .join(matched, "purchase_id", "left")
        .select("purchase_id", F.coalesce("views_1h", F.lit(0)).alias("views_1h"))
    )


@register(
    "window_range_30d_sum",
    oracle="""
        SELECT o_orderkey, o_custkey,
               round(CAST(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 2) AS spend_30d
        FROM orders
    """,
    description="time-RANGE window frame: per-customer trailing-30-day "
    "spend — rangeBetween on epoch seconds (value-based frame, not row "
    "counts), one shuffle on the partition key; ties on the same "
    "timestamp aggregate together exactly like the SQL RANGE frame",
)
def window_range_30d_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )
