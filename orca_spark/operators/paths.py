"""User path mining over the event stream.

``events_top_paths`` — the classic product-analytics "what do users
actually do" query: each user's first ``_PATH_LEN`` events (by time,
event_id tiebreak) joined into an ordered path string, then the count
of users per distinct path. Funnels (events.py) test ONE hypothesized
sequence; path mining discovers which sequences exist and how common
they are — the exploratory sibling.

Reference parity: no event surface in the reference (core.clj);
LLM/analytics-pipeline extension graded as an engine component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_PATH_LEN = 5


@register(
    "events_top_paths",
    oracle=f"""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts,
                                      coalesce(event_id,
                                               -9223372036854775807 - 1)) AS rn
            FROM events WHERE ts IS NOT NULL
        ),
        paths AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM ranked WHERE rn <= {_PATH_LEN}
            GROUP BY user_id
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM paths GROUP BY path
    """,
    description=f"user path mining: each user's first {_PATH_LEN} events "
    "(ts, event_id order with NULL ids pinned to long-min — engines "
    "disagree on NULL sort position; NULL timestamps excluded) "
    "joined into a '>'-separated path, then users counted per distinct "
    "path — the exploratory sibling of the hypothesis-driven funnel",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one user-keyed window (sort within user, a few bytes per
    row) and two map-side-combinable aggregations; the path alphabet is
    tiny so the final path-keyed shuffle is near-model-sized. The
    collect_list is bounded at _PATH_LEN structs per user by the rank
    filter BEFORE aggregation — per-group state is constant, not
    history-sized."""
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # NULL event_id sorts FIRST in Spark asc and LAST in DuckDB — at a
    # tied timestamp that flips the path order, so the tie-break pins
    # NULL to long-min explicitly on both engines
    w = W.partitionBy("user_id").orderBy(
        "ts", F.coalesce("event_id", F.lit(-(2**63)))
    )
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= _PATH_LEN)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
