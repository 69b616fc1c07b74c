"""Distribution drift over time and customer cadence.

* ``orders_priority_mix_drift`` — month-over-month total-variation
  distance of the order-priority mix: the time-axis twin of the
  t-closeness audit's TV metric (privacy3.py). A stable business
  shows near-zero drift; a spike marks the month the order mix
  actually changed (product launch, policy change, data bug) — the
  one-number change detector for any categorical composition.
* ``customer_order_gap_median`` — the exact median days between
  consecutive orders per customer nation (rank-based median, the
  orders_exact_median_by_rank discipline — never approximate): the
  purchase-cadence statistic behind replenishment and churn windows.

Determinism: TV terms are ratios of exact BIGINT counts (identical
doubles), summed per month-pair and rounded at the surface; gaps are
integer day arithmetic and the median is rank-selected (average of
the two middle values for even counts — exact halves only, no float
accumulation).

Scale: both aggregate the scan before any join. The drift pair join
runs on (month × priority) cardinality; the gap median shuffles once
on customer for the lag, once on nation for the rank selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "orders_priority_mix_drift",
    oracle="""
        WITH c AS (
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                        AS BIGINT) AS ym,
                   o_orderpriority AS pr,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
            GROUP BY 1, 2
        ),
        months AS (
            SELECT ym, CAST(sum(n) AS BIGINT) AS tot,
                   lag(ym) OVER (ORDER BY ym) AS prev_ym
            FROM c GROUP BY ym
        ),
        pairs AS (
            SELECT m.ym, m.prev_ym, m.tot,
                   p.tot AS prev_tot
            FROM months m JOIN months p ON p.ym = m.prev_ym
        ),
        merged AS (
            SELECT pr.ym, pr.tot, pr.prev_tot,
                   COALESCE(cur.n, 0) AS cn, COALESCE(prv.n, 0) AS pn
            FROM pairs pr
            JOIN (SELECT DISTINCT pr FROM c) d ON true
            LEFT JOIN c cur ON cur.ym = pr.ym AND cur.pr = d.pr
            LEFT JOIN c prv ON prv.ym = pr.prev_ym AND prv.pr = d.pr
        )
        SELECT ym,
               round(0.5 * sum(abs(cn * 1.0 / tot - pn * 1.0 / prev_tot)),
                     4) AS tv_drift
        FROM merged
        GROUP BY ym
    """,
    description="month-over-month total-variation distance of the "
    "order-priority mix: the categorical-composition change detector "
    "(near zero = stable mix, a spike = the month the mix actually "
    "moved) — the time-axis twin of the t-closeness TV metric; first "
    "month has no predecessor and is omitted, shares derive from "
    "exact BIGINT counts over the full priority domain (absent "
    "priorities count zero), sum rounded at the surface; everything "
    "runs at (month x priority) cardinality",
)
def orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull() & F.col("o_orderpriority").isNotNull()
    )
    c = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.col("o_orderpriority").alias("pr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    months = (
        c.groupBy("ym")
        .agg(F.sum("n").alias("tot"))
        .withColumn("prev_ym", F.lag("ym").over(W.orderBy("ym")))
    )
    pairs = (
        months.alias("m")
        .join(
            months.select(
                F.col("ym").alias("p_ym"), F.col("tot").alias("prev_tot")
            ),
            F.col("m.prev_ym") == F.col("p_ym"),
        )
        .select("ym", "prev_ym", "tot", "prev_tot")
    )
    dom = c.select("pr").distinct()
    merged = (
        pairs.crossJoin(F.broadcast(dom))
        .join(
            c.select(F.col("ym").alias("c_ym"), F.col("pr").alias("c_pr"), F.col("n").alias("cn")),
            (F.col("ym") == F.col("c_ym")) & (F.col("pr") == F.col("c_pr")),
            "left",
        )
        .drop("c_ym", "c_pr")
        .join(
            c.select(F.col("ym").alias("v_ym"), F.col("pr").alias("v_pr"), F.col("n").alias("pn")),
            (F.col("prev_ym") == F.col("v_ym")) & (F.col("pr") == F.col("v_pr")),
            "left",
        )
        .drop("v_ym", "v_pr")
        .select(
            "ym",
            "tot",
            "prev_tot",
            F.coalesce("cn", F.lit(0).cast("long")).alias("cn"),
            F.coalesce("pn", F.lit(0).cast("long")).alias("pn"),
        )
    )
    term = F.abs(
        F.col("cn") * F.lit(1.0) / F.col("tot")
        - F.col("pn") * F.lit(1.0) / F.col("prev_tot")
    )
    return merged.groupBy("ym").agg(
        F.round(F.lit(0.5) * F.sum(term), 4).alias("tv_drift")
    )


@register(
    "customer_order_gap_median",
    oracle="""
        WITH og AS (
            SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d
            FROM orders WHERE o_orderdate IS NOT NULL
        ),
        -- lag BEFORE the dimension join (both engines): an order whose
        -- customer is missing must still separate its neighbors' gaps
        gaps0 AS (
            SELECT o_custkey,
                   CAST(d - lag(d) OVER (PARTITION BY o_custkey
                                         ORDER BY d, o_orderkey)
                        AS BIGINT) AS gap_days
            FROM og
        ),
        gaps AS (
            SELECT n.n_name, g.gap_days
            FROM gaps0 g
            JOIN customer cu ON cu.c_custkey = g.o_custkey
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
        ),
        valid AS (SELECT n_name, gap_days FROM gaps WHERE gap_days IS NOT NULL),
        ranked AS (
            SELECT n_name, gap_days,
                   row_number() OVER (PARTITION BY n_name
                                      ORDER BY gap_days) AS rn,
                   count(*) OVER (PARTITION BY n_name) AS cnt
            FROM valid
        )
        SELECT n_name,
               CAST(max(cnt) AS BIGINT) AS n_gaps,
               round(avg(gap_days), 1) AS median_gap_days
        FROM ranked
        WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
        GROUP BY n_name
    """,
    description="exact median days between consecutive orders per "
    "customer nation (rank-based median: the two middle ranks "
    "averaged for even counts — exact halves, never an approximate "
    "percentile): the purchase-cadence statistic behind replenishment "
    "and churn windows; gaps are integer date arithmetic via a "
    "customer-partitioned lag, the median a nation-partitioned rank "
    "selection",
)
def customer_order_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate").isNotNull())
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wlag = W.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    gaps = (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn(
            "gap_days",
            F.datediff(
                F.to_date("o_orderdate"),
                F.lag(F.to_date("o_orderdate")).over(wlag),
            ).cast("long"),
        )
        .where(F.col("gap_days").isNotNull())
        # customer is dimension-sized but grows with SF — keyed join;
        # nation is constant-sized — broadcast
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "gap_days")
    )
    wr = W.partitionBy("n_name").orderBy("gap_days")
    ranked = gaps.select(
        "n_name",
        "gap_days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("n_name")).alias("cnt"),
    )
    # integer mid-rank selection (floor division on longs)
    lo = F.floor((F.col("cnt") + 1) / 2)
    hi = F.floor((F.col("cnt") + 2) / 2)
    return (
        ranked.where((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("n_name")
        .agg(
            F.max("cnt").cast("long").alias("n_gaps"),
            F.round(F.avg("gap_days"), 1).alias("median_gap_days"),
        )
    )
