"""Relational batch 13: interval-overlap self-join and the
running-distinct window rewrite.

``orders_interval_overlap_pairs`` — true INTERVAL x INTERVAL overlap
(two spans intersect), the harder sibling of the point-in-window range
join (range_join_view_attribution): within each customer, count pairs
of orders whose 30-day fulfillment windows [orderdate, orderdate+29d]
overlap — concurrently-active orders per account. The join is keyed on
custkey, so the pair enumeration is co-partitioned and bounded by the
per-customer order count (~10 in TPC-H shape) — the scale contract is
"fanout bounded by group size", never a time-bucket cross product.

``orders_running_distinct_customers`` — COUNT(DISTINCT) OVER a running
window is unsupported in Spark (and quadratic where supported); the
standard rewrite is first-seen flags + a running SUM: a customer
contributes 1 to their nation's cumulative distinct count only in
their first order month. Monthly actives come from a plain
two-key distinct; both are exact integers.

Reference parity: core.clj has no relational surface (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "orders_interval_overlap_pairs",
    oracle="""
        WITH spans AS (
            SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS lo,
                   CAST(o_orderdate AS DATE) + INTERVAL 29 DAY AS hi
            FROM orders
            WHERE o_orderdate IS NOT NULL
        ),
        pairs AS (
            SELECT a.o_custkey,
                   count(*) AS n_overlap_pairs
            FROM spans a
            JOIN spans b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey
             AND a.lo <= b.hi
             AND b.lo <= a.hi
            GROUP BY a.o_custkey
        ),
        sizes AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
            FROM spans GROUP BY o_custkey
        )
        SELECT s.o_custkey,
               s.n_orders,
               CAST(p.n_overlap_pairs AS BIGINT) AS n_overlap_pairs
        FROM sizes s JOIN pairs p USING (o_custkey)
    """,
    description="interval x interval overlap self-join: within each "
    "customer, pairs of orders whose 30-day fulfillment windows "
    "[orderdate, orderdate+29d] intersect (a.lo <= b.hi AND b.lo <= "
    "a.hi, orderkey-ordered to emit each pair once) — concurrently-"
    "active orders per account, the co-partitioned overlap-join shape "
    "whose fanout is bounded by group size, not by a time-bucket "
    "cross product; customers with zero overlapping pairs are omitted",
)
def orders_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("lo"),
            F.date_add(F.to_date("o_orderdate"), 29).alias("hi"),
        )
    )
    a = spans.alias("a")
    b = spans.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n_overlap_pairs"))
    )
    sizes = spans.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return sizes.join(pairs, "o_custkey").select(
        "o_custkey", "n_orders", F.col("n_overlap_pairs").cast("long")
    )


@register(
    "orders_running_distinct_customers",
    oracle="""
        WITH om AS (
            SELECT o_custkey,
                   c_nationkey,
                   CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderdate IS NOT NULL
        ),
        monthly AS (
            SELECT c_nationkey, month,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
            FROM om GROUP BY c_nationkey, month
        ),
        first_seen AS (
            SELECT c_nationkey, o_custkey, min(month) AS month
            FROM om GROUP BY c_nationkey, o_custkey
        ),
        news AS (
            SELECT c_nationkey, month,
                   CAST(count(*) AS BIGINT) AS new_customers
            FROM first_seen GROUP BY c_nationkey, month
        )
        SELECT m.c_nationkey, m.month, m.active_customers,
               CAST(COALESCE(n.new_customers, 0) AS BIGINT) AS new_customers,
               CAST(sum(COALESCE(n.new_customers, 0)) OVER (
                   PARTITION BY m.c_nationkey ORDER BY m.month
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cumulative_distinct
        FROM monthly m
        LEFT JOIN news n
          ON n.c_nationkey = m.c_nationkey AND n.month = m.month
    """,
    description="running COUNT(DISTINCT) rewrite: per nation and order "
    "month, the active distinct customers, first-ever customers, and "
    "the cumulative distinct customer count to date — expressed as "
    "first-seen flags + a running SUM because a distinct-count window "
    "is unsupported (and would be quadratic anyway); two "
    "map-side-combinable aggs and one model-sized window, all exact "
    "integers",
)
def orders_running_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    om = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull())
        .join(
            load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_custkey",
            "c_nationkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
    )
    monthly = om.groupBy("c_nationkey", "month").agg(
        F.countDistinct("o_custkey").cast("long").alias("active_customers")
    )
    first_seen = om.groupBy("c_nationkey", "o_custkey").agg(
        F.min("month").alias("month")
    )
    news = first_seen.groupBy("c_nationkey", "month").agg(
        F.count(F.lit(1)).cast("long").alias("new_customers")
    )
    w = (
        W.partitionBy("c_nationkey")
        .orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    joined = monthly.join(news, ["c_nationkey", "month"], "left").select(
        "c_nationkey",
        "month",
        "active_customers",
        F.coalesce("new_customers", F.lit(0)).cast("long").alias("new_customers"),
    )
    return joined.withColumn(
        "cumulative_distinct", F.sum("new_customers").over(w).cast("long")
    )
