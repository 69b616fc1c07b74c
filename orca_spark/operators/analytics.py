"""Product-analytics operators: funnels, cohort retention, stratified
sampling — the event-table workloads a warehouse engine gets asked for
daily, each one shuffle-disciplined (pre-aggregate per user before any
join; hash-based sampling instead of rand())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_funnel",
    oracle="""
        WITH steps AS (
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
                   min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
                   min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT count(*)                                            AS n_users,
               count(t_view)                                       AS reached_view,
               count(CASE WHEN t_click > t_view THEN 1 END)        AS reached_click,
               count(CASE WHEN t_purchase > t_click
                           AND t_click > t_view THEN 1 END)        AS reached_purchase
        FROM steps
    """,
    description="funnel analysis (view → click → purchase in order): one "
    "grouped conditional-min pass per user, then a global rollup — no "
    "self-joins, no per-event window",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    steps = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("reached_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_view")), 1
            )
        ).alias("reached_purchase"),
    )


@register(
    "events_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            -- day-diff // 7, NOT date_diff('week', ...): both operands
            -- are week-truncated Mondays so the day span is an exact
            -- multiple of 7, while DuckDB's 'week' part counts
            -- partition boundaries and loses one at ISO year-end
            -- spans (1969-12-29 .. 2199-12-30 = 84007 days = 12001
            -- weeks, but date_diff('week') says 12000)
            SELECT DISTINCT e.user_id, f.cohort_week,
                   CAST(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) // 7 AS INT)
                       AS week_offset
            FROM events e JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT cohort_week, week_offset, count(*) AS n_active_users
        FROM activity
        GROUP BY cohort_week, week_offset
    """,
    description="cohort retention: users bucketed by first-activity week, "
    "counted per week offset — the firsts table is per-user (small), the "
    "join broadcasts at scale",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    joined = e.join(firsts, "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.floor(
                (F.unix_date(F.date_trunc("week", "ts").cast("date"))
                 - F.unix_date(F.col("cohort_week").cast("date"))) / 7
            ).cast("int")
        ).alias("week_offset"),
    )
    return (
        joined.distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "documents_stratified_sample",
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE (lang = 'en'  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0'))
           OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                               IN ('0', '1', '2', '3'))
    """,
    description="stratified sampling by content hash: downsample the "
    "majority language (~6%%) while keeping ~25%% of the rest — the "
    "language-rebalancing primitive for training mixes, reproducible "
    "across engines and partitionings",
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1)
    keep = F.when(F.col("lang") == "en", nibble.isin("0")).otherwise(
        nibble.isin("0", "1", "2", "3")
    )
    return d.where(keep).select("doc_id", "lang")
