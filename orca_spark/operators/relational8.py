"""Customer RFM (recency / frequency / monetary) scoring over orders.

The classic segmentation table: per customer, days since last order
(anchored to the corpus's max order date — a pipeline has no "today"),
order count, and DECIMAL-exact lifetime spend, each bucketed into
quintiles by ``ntile(5)`` with an explicit customer-key tiebreak so
the bucketing is a pure function of the data on every engine.

Reference parity: the reference (core.clj) has no relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "orders_rfm_scores",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   -- anchor over the SAME eligibility filter as the
                   -- scored rows: an order with a NULL custkey or
                   -- price can't be scored, so it can't move the
                   -- anchor either (a mismatch here skewed every
                   -- recency by decades on the degenerate corpus)
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             (SELECT CAST(max(o_orderdate) AS DATE)
                              FROM orders
                              WHERE o_custkey IS NOT NULL
                                AND o_orderdate IS NOT NULL
                                AND o_totalprice IS NOT NULL))
                       AS recency_days,
                   count(*) AS frequency,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS monetary
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL
            GROUP BY o_custkey
        )
        SELECT o_custkey, CAST(recency_days AS INT) AS recency_days,
               CAST(frequency AS BIGINT) AS frequency, monetary,
               CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
                    AS INT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                    AS INT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                    AS INT) AS m_score
        FROM base
    """,
    description="customer RFM quintiles: recency anchored to the corpus "
    "max order date, DECIMAL-exact monetary sums, ntile(5) with an "
    "explicit o_custkey tiebreak (without it, equal metric values land "
    "in engine-dependent buckets)",
)
def orders_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one grouped aggregation on o_custkey builds the base
    (customer-sized); the anchor date is a one-row broadcast scalar;
    the three ntile windows sort the CUSTOMER table, not orders — at a
    scale where even that sort is too wide, the two-pass partial-rank
    pattern (window_distribution_scalable) is the swap. Determinism:
    recency/frequency are integers, monetary accumulates in DECIMAL
    (the relational7 money convention), and every ntile order has the
    o_custkey tiebreak — equal metrics bucket identically on both
    engines."""
    o = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
    )
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("anchor"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_day").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy("recency_days", "o_custkey"))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").desc(), "o_custkey"))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary").desc(), "o_custkey"))
        .cast("int")
        .alias("m_score"),
    )
