"""Revenue cohort retention matrix over orders.

The monetary companion to ``events_cohort_retention`` (which counts
active users): customers are cohorted by their FIRST order month, and
each (cohort, months-since-first) cell reports how many customers
ordered again and how much DECIMAL-exact revenue they brought — the
LTV decay curve finance actually reads.

Reference parity: the reference (core.clj) has no relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "orders_revenue_cohorts",
    oracle="""
        WITH base AS (
            SELECT o_custkey, o_totalprice,
                   date_trunc('month', o_orderdate) AS om
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL
        ),
        firsts AS (
            SELECT o_custkey, min(om) AS cohort FROM base GROUP BY o_custkey
        )
        SELECT f.cohort,
               CAST((date_part('year', b.om) - date_part('year', f.cohort)) * 12
                    + (date_part('month', b.om) - date_part('month', f.cohort))
                    AS INT) AS months_since,
               CAST(count(DISTINCT b.o_custkey) AS BIGINT) AS n_customers,
               CAST(round(sum(CAST(b.o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM base b JOIN firsts f ON b.o_custkey = f.o_custkey
        GROUP BY f.cohort, months_since
    """,
    description="revenue cohort matrix: customers cohorted by first "
    "order month, per (cohort, months-since-first) cell the returning "
    "customer count and DECIMAL-exact revenue — the LTV decay curve; "
    "one customer-keyed window-free aggregation plus a cohort join",
)
def orders_revenue_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the firsts table is one customer-keyed aggregation
    (customer-sized output); joining it back is customer-keyed (at a
    skewed key, AQE splits); the cell rollup partial-aggregates onto a
    (|cohorts| × |horizon|)-row matrix — model-sized however many
    orders exist. Determinism: month arithmetic is integer, revenue
    accumulates in DECIMAL, NULL custkey/date/price rows are excluded
    up front on both sides."""
    base = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            "o_custkey",
            "o_totalprice",
            F.date_trunc("month", "o_orderdate").alias("om"),
        )
    )
    firsts = base.groupBy("o_custkey").agg(F.min("om").alias("cohort"))
    months_since = (
        (F.year("om") - F.year("cohort")) * 12 + (F.month("om") - F.month("cohort"))
    ).cast("int")
    return (
        base.join(firsts, "o_custkey")
        .groupBy("cohort", months_since.alias("months_since"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )
