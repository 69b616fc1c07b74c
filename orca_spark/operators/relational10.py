"""Business-calendar analytics: year-over-year growth and SLA breaches.

* ``orders_yoy_growth`` — yearly gross revenue from the lineitem fact
  table with year-over-year growth percentage: the first chart every
  revenue dashboard draws, and the template for "window over a tiny
  aggregate" plans — the corpus-scale work is one map-side-combinable
  aggregation to |years| rows; the lag window then runs on a
  model-sized relation where a single-partition window is CORRECT, not
  a smell.
* ``orders_shipping_sla_breach`` — per-priority shipping latency: line
  count, mean days from order to ship, and the share of lines beyond a
  90-day SLA. The canonical fact-to-dimension join profile (lineitem ⋈
  orders on orderkey) aggregated to a 5-row answer.

Determinism: revenue sums are made EXACT by casting the per-row
price product to DECIMAL(18,4) before summation — the per-row double
product is bit-identical in both engines, its decimal cast is
unambiguous (no binary double sits exactly on a 4dp tie), and the
decimal sum is then order-independent, so the YoY ratio divides two
identical values. (The plain double-sum-then-round form flips a
half-ulp money boundary on adversarial inputs — this operator hit
273408.975 on the degenerate corpus.) Day counts are integer date
arithmetic on CAST-to-DATE values; ratios are rounded at the surface.

Scale: both queries aggregate the scan before anything else; the SLA
join is an orderkey-keyed shuffle join of two co-partitioned-by-key
relations (bucketable at 100 TB — bucketing.py's move), never wider
than the fact table, and the final groupBy lands on single-digit
cardinality with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_SLA_DAYS = 90


@register(
    "orders_yoy_growth",
    oracle="""
        WITH yearly AS (
            SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18, 4))) AS rev
            FROM lineitem
            WHERE l_shipdate IS NOT NULL
            GROUP BY 1
        )
        SELECT yr,
               CAST(round(rev, 2) AS DOUBLE) AS revenue,
               round(CAST((rev - lag(rev) OVER (ORDER BY yr)) AS DOUBLE)
                     * 100.0
                     / nullif(CAST(lag(rev) OVER (ORDER BY yr) AS DOUBLE), 0),
                     4) AS yoy_growth_pct
        FROM yearly
    """,
    description="yearly gross revenue (double sum, q1's money rounding "
    "rule) with year-over-year growth percentage via a lag "
    "window: corpus work is one aggregation to |years| rows, the "
    "window then runs single-partition on the model-sized result — "
    "the legitimate use of an unpartitioned window; first year's "
    "growth is NULL by construction",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate").isNotNull())
    yearly = li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr")
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("rev")
    )
    w = W.orderBy("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "yr",
        # round in DECIMAL space, cast after: both engines round the
        # exact decimal tie half-away-from-zero, where rounding the
        # double repr diverges (Spark rounds the shortest decimal
        # string of the double, DuckDB the binary value)
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            (F.col("rev") - prev).cast("double")
            * F.lit(100.0)
            / F.nullif(prev.cast("double"), F.lit(0.0)),
            4,
        ).alias("yoy_growth_pct"),
    )


@register(
    "orders_shipping_sla_breach",
    oracle=f"""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               round(sum(CAST(l.l_shipdate AS DATE)
                         - CAST(o.o_orderdate AS DATE)) * 1.0
                     / count(*), 4) AS avg_days_to_ship,
               CAST(sum(CASE WHEN CAST(l.l_shipdate AS DATE)
                                  - CAST(o.o_orderdate AS DATE)
                                  > {_SLA_DAYS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches,
               round(sum(CASE WHEN CAST(l.l_shipdate AS DATE)
                                   - CAST(o.o_orderdate AS DATE)
                                   > {_SLA_DAYS}
                              THEN 1 ELSE 0 END) * 100.0
                     / count(*), 4) AS breach_pct
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate IS NOT NULL
          AND o.o_orderdate IS NOT NULL
          AND o.o_orderpriority IS NOT NULL
        GROUP BY o.o_orderpriority
    """,
    description=f"per-priority shipping latency profile: line count, "
    f"mean order-to-ship days, and the share of lines beyond a "
    f"{_SLA_DAYS}-day SLA — the canonical fact-to-dimension join "
    "(orderkey-keyed, bucketable at scale) collapsing to a 5-row "
    "answer; day counts are integer date arithmetic, ratios rounded "
    "at the surface",
)
def orders_shipping_sla_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate").isNotNull())
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull() & F.col("o_orderpriority").isNotNull()
    )
    days = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    joined = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    breach = F.sum(F.when(days > _SLA_DAYS, 1).otherwise(0))
    n = F.count(F.lit(1))
    return joined.groupBy("o_orderpriority").agg(
        n.alias("n_lines"),
        F.round(F.sum(days) / n, 4).alias("avg_days_to_ship"),
        breach.cast("long").alias("n_breaches"),
        F.round(breach * F.lit(100.0) / n, 4).alias("breach_pct"),
    )
