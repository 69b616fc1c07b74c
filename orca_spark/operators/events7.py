"""Traffic-integrity heuristics: rule-based bot scoring per user.

``events_bot_score_heuristics`` computes the three cheapest automation
signals a stream team checks before anything model-based: burst rate
(max events in any single hour), event-type monotony (share of events
beyond the distinct-type count — a scraper fires the same event over
and over), and breadth (active hours). The flag combines them with
fixed documented thresholds; the VALUE of the operator is the audited,
reproducible rule — the flagged users feed either a blocklist review
or the label set for a learned model.

Flag rule (documented, exact-rational):
    is_bot = max_hourly >= {MAXH}  OR  monotony >= 9/10
where monotony = (n_events - n_types) / n_events, compared by integer
cross-multiplication so no float threshold can flip at a boundary.

Determinism: every statistic is BIGINT (two-level hour aggregation,
distinct counts); the surfaced monotony percentage is a ratio of
exact integers rounded at the surface; the flag never touches a
float.

Scale: per-(user, hour) counts aggregate map-side first (the inner
relation is user-hours, far below events), then collapse per user;
the distinct-type count is Spark's two-phase expand aggregation. One
user_id-keyed shuffle overall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_MAX_HOURLY = 50  # burst threshold: events in one hour
_MONO_NUM = 9  # monotony threshold 9/10 as an exact rational
_MONO_DEN = 10


@register(
    "events_bot_score_heuristics",
    oracle=f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY 1, 2
        ),
        per_hour AS (
            SELECT user_id,
                   CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS active_hours,
                   CAST(max(c) AS BIGINT) AS max_hourly
            FROM hourly GROUP BY user_id
        ),
        types AS (
            SELECT user_id,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id
        )
        SELECT p.user_id, p.n_events, p.active_hours, p.max_hourly,
               t.n_types,
               round((p.n_events - t.n_types) * 100.0 / p.n_events, 4)
                   AS monotony_pct,
               (p.max_hourly >= {_MAX_HOURLY}
                OR (p.n_events - t.n_types) * {_MONO_DEN}
                   >= p.n_events * {_MONO_NUM}) AS is_bot
        FROM per_hour p JOIN types t USING (user_id)
    """,
    description=f"rule-based per-user bot heuristics: max events in any "
    "hour, active hours, distinct event types, and type monotony "
    f"(share of events beyond the type count); flagged when the hourly "
    f"burst reaches {_MAX_HOURLY} or monotony reaches "
    f"{_MONO_NUM}/{_MONO_DEN} by integer cross-multiplication — the "
    "reproducible pre-model integrity screen; two-level hour "
    "aggregation keeps the shuffle at user-hours, all counts BIGINT",
)
def events_bot_score_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_hour = hourly.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("active_hours"),
        F.max("c").alias("max_hourly"),
    )
    types = ev.groupBy("user_id").agg(
        F.count_distinct("event_type").alias("n_types")
    )
    mono_excess = F.col("n_events") - F.col("n_types")
    return per_hour.join(types, "user_id").select(
        "user_id",
        "n_events",
        "active_hours",
        "max_hourly",
        "n_types",
        F.round(mono_excess * F.lit(100.0) / F.col("n_events"), 4).alias(
            "monotony_pct"
        ),
        (
            (F.col("max_hourly") >= _MAX_HOURLY)
            | (mono_excess * _MONO_DEN >= F.col("n_events") * _MONO_NUM)
        ).alias("is_bot"),
    )
