"""Dynamic-gap session windows: per-event inactivity timeouts.

``events_session_window_dynamic_gap`` exercises the expression form of
``F.session_window`` — the gap is computed PER EVENT (clicks close
fast at 5 minutes, everything else gets 30), which is how production
sessionization actually works: a checkout page and an article page do
not share an inactivity timeout. Spark merges each event's
[ts, ts + gap) interval into sessions per user; the oracle replicates
the interval-union semantics with the gaps-and-islands construction
(an event opens a new session iff its ts exceeds the running max of
all previous events' interval ends — a GROWING-frame max, never the
O(n²) shrinking frame, the events10 lesson).

Everything is integer µs arithmetic (unix_micros + literal gap
constants), so session boundaries are cross-engine exact.

Scale: one shuffle on user_id; per-user state is the running max —
linear in the stream. The session merge is the same state machine the
streaming session_window job runs with watermark eviction.

Reference parity: core.clj has no sessionization (SURVEY §2.5);
events-family extension (events.py sessionize, events9 session_window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_FAST_GAP_US = 5 * 60 * 1_000_000  # clicks: 5 minutes
_SLOW_GAP_US = 30 * 60 * 1_000_000  # everything else: 30 minutes


@register(
    "events_session_window_dynamic_gap",
    oracle=f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(epoch_us(ts) AS BIGINT)
                   + CASE WHEN event_type = 'click'
                          THEN {_FAST_GAP_US} ELSE {_SLOW_GAP_US} END
                       AS end_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        flagged AS (
            SELECT user_id, ts_us, end_us,
                   CASE WHEN ts_us > COALESCE(max(end_us) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), -9223372036854775808) THEN 1 ELSE 0 END AS is_new
            FROM ev
        ),
        islands AS (
            SELECT user_id, ts_us, end_us,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               CAST(min(ts_us) AS BIGINT)  AS session_start_us,
               CAST(max(end_us) AS BIGINT) AS session_end_us,
               CAST(count(*) AS BIGINT)    AS n_events
        FROM islands
        GROUP BY user_id, session_id
    """,
    description="dynamic-gap session windows (the expression form of "
    "F.session_window): each event carries its own inactivity timeout "
    "— clicks 5 min, others 30 — and Spark merges the per-event "
    "[ts, ts+gap) intervals into sessions per user; the oracle "
    "replicates interval-union with gaps-and-islands over a GROWING-"
    "frame running max (never the O(n^2) shrinking frame); all-integer "
    "µs arithmetic, one user_id shuffle, linear per-user state",
)
def events_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    gap = F.when(
        F.col("event_type") == "click", F.lit(f"{_FAST_GAP_US} microseconds")
    ).otherwise(F.lit(f"{_SLOW_GAP_US} microseconds"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )
