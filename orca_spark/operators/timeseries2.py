"""Exponentially-weighted moving average over per-user event streams.

The streaming-metrics smoother (loss curves, rate dashboards, anomaly
baselines): ``ewma_t = Σ_{j=0..K-1} α^j · x_{t-j} / Σ_{j} α^j`` — the
K-term truncation of the classic recursive EWMA, normalized so the
head of each series (fewer than K points available) is an unbiased
weighted mean rather than biased toward zero.

The truncated form is chosen deliberately: the infinite recursion
``e_t = αx_t + (1-α)e_{t-1}`` is inherently sequential (its closed
form needs α^{-t}, which overflows), while the K-term window is a
bounded relational join both engines — and a 1000-executor cluster —
compute identically and in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_K = 8  # window length (terms)
# decay as an exact dyadic rational (α = 1/2): every weight α^j is a
# power of two, so weight·value products are EXACT in IEEE double and
# the weighted sum of exact dyadic test values cannot depend on
# engine-specific addition order
_ALPHA = 0.5


@register(
    "events_ewma_smoothed",
    oracle=f"""
        WITH seq AS (
            SELECT event_id, user_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
            WHERE ts IS NOT NULL AND event_id IS NOT NULL
              AND value IS NOT NULL
        )
        SELECT a.event_id, a.user_id, CAST(a.rn AS BIGINT) AS rn,
               round(
                   sum(pow({_ALPHA}, a.rn - b.rn) * b.value)
                   / sum(pow({_ALPHA}, a.rn - b.rn)), 4) AS ewma
        FROM seq a JOIN seq b
          ON a.user_id = b.user_id
         AND b.rn BETWEEN a.rn - {_K - 1} AND a.rn
        GROUP BY a.event_id, a.user_id, a.rn
    """,
    description=f"truncated EWMA (K={_K}, alpha={_ALPHA}) per user over "
    "the event stream: bounded-band self-join on row_number, "
    "normalized exponential weights — the parallel, "
    "order-insensitive form of the sequential recursive smoother",
)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id shared by the row_number window and
    the band self-join; the join expands each row into at most K
    partners, so the blow-up is a constant factor, never quadratic. A
    single hot user is the skew hazard (same as every per-user window
    here) — AQE skew-join split is on session-wide, and salting the
    band join by rn-range is the documented escape.

    Determinism: α = 1/2 makes every weight a power of two, so each
    weight·value product is exact in IEEE double; the division
    normalizes by the exact dyadic Σα^j. Rows with NULL ts/event_id/
    value are excluded UP FRONT: ts/event_id anchor the row_number
    tiebreak (a NULL there orders differently across engines) and a
    NULL value would silently shorten the window's effective weight
    mass. The remaining float aggregate is rounded (4) on both sides,
    the engine-wide convention."""
    seq = (
        load(spark, sf_dir, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "value",
            F.row_number()
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("rn"),
        )
    )
    a, b = seq.alias("a"), seq.alias("b")
    w = F.pow(F.lit(_ALPHA), F.col("a.rn") - F.col("b.rn"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & F.col("b.rn").between(F.col("a.rn") - (_K - 1), F.col("a.rn")),
        )
        .groupBy(
            F.col("a.event_id").alias("event_id"),
            F.col("a.user_id").alias("user_id"),
            F.col("a.rn").alias("rn"),
        )
        .agg(
            F.round(
                F.sum(w * F.col("b.value")) / F.sum(w), 4
            ).alias("ewma")
        )
    )
