"""Ordered funnel analysis over the event stream.

``events_funnel_conversion`` — the product-analytics staple: of the
users who ever viewed, how many went on to click STRICTLY AFTER their
first view, and then to purchase strictly after that first qualifying
click? Order matters (a purchase before the first view is not funnel
progress), which is what separates this from a per-type distinct-user
count. Each step reports its user count and parts-per-million
conversion from the funnel head, in BIGINT arithmetic.

The step semantics are the standard "earliest qualifying event" chain:
t1 = first view; t2 = first click with ts > t1; t3 = first purchase
with ts > t2. Every stage is a user-keyed aggregation joined back to
the (already user-keyed, aggregate-sized) previous stage — the joins
shuffle per-user scalars, never the event stream, and each stage's
input prunes to one event type at the scan.

Scale: three filtered scans (or one scan reused from cache), three
user-keyed shuffles of (user, ts) pairs, final counts are one row per
step. Funnel depth is static so the plan is a fixed-size DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_STEPS = ["view", "click", "purchase"]


@register(
    "events_funnel_conversion",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' AND ts IS NOT NULL
              AND user_id IS NOT NULL
            GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        ),
        counts AS (
            SELECT 1 AS step_no, 'view' AS step,
                   CAST(count(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        ),
        head AS (SELECT n_users AS n1 FROM counts WHERE step_no = 1)
        SELECT step_no, step, n_users,
               CASE WHEN n1 = 0 THEN NULL
                    ELSE n_users * 1000000 // n1 END AS conv_ppm
        FROM counts, head
    """,
    description="ordered funnel view -> click -> purchase: per step, "
    "users whose first qualifying event came strictly after the "
    "previous step's (earliest-qualifying-event chain), with integer "
    "ppm conversion from the funnel head — order-aware, so a purchase "
    "before the first view is not progress; user-keyed scalar "
    "aggregations joined stage-to-stage, never an event-stream join",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    s1 = (
        ev.where(F.col("event_type") == _STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == _STEPS[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == _STEPS[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("step_no"), F.lit("view").alias("step"), "n_users")
        .unionAll(
            s2.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("step_no"), F.lit("click").alias("step"), "n_users"
            )
        )
        .unionAll(
            s3.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("step_no"),
                F.lit("purchase").alias("step"),
                "n_users",
            )
        )
    )
    head = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
    )
    return counts.crossJoin(F.broadcast(head)).select(
        "step_no",
        "step",
        "n_users",
        F.when(F.col("n1") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("n_users * 1000000 div n1"))
        .alias("conv_ppm"),
    )
