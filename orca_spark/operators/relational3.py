"""Relational surface, batch 3: HAVING, OR-of-ANDs pushdown, scalar
subquery + anti join (TPC-H Q18/Q19/Q22 shapes), stream-static style
dim enrichment in batch form."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey
        HAVING sum(l_quantity) > 250
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 100
    """,
    description="TPC-H Q18: grouped HAVING over a 3-way join, top-100",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"), F.sum("l_quantity").alias("_raw"))
        .where(F.col("_raw") > 250)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
    """,
    description="TPC-H Q19: OR-of-ANDs predicate across joined tables "
    "(Catalyst extracts common conjuncts for pushdown)",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
        SELECT substr(c_name, 1, 9) AS name_prefix,
               count(*)             AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY 1
    """,
    description="TPC-H Q22: uncorrelated scalar subquery + anti join + "
    "grouped agg",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000).select("o_custkey")
    # uncorrelated scalar: computed once, folded into the filter as a
    # literal join-free broadcast (crossJoin of a 1-row agg)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "events_user_enrichment",
    oracle="""
        SELECT c_mktsegment, event_type,
               count(*)              AS n,
               round(sum(value), 4)  AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    description="fact-stream enrichment against a dimension (batch form of "
    "a stream-static join; see streaming_static_join for the stream form)",
)
def events_user_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
