"""Bucketed tables: pre-shuffled storage so repeated joins/aggregations
on the bucket key run with NO exchange.

At 100 TB the fact-fact join (orders x lineitem on orderkey) is the
dominant shuffle; bucketing both sides by the join key at write time
moves that shuffle to ingestion, amortized over every later query.
``bucketBy`` requires a catalog table (``saveAsTable``); if the hosting
session's catalog can't persist tables the query falls back to the
plain join — same results, the bucketing advantage is asserted
separately in tests/test_plans.py where the catalog is known-good.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

N_BUCKETS = 8


def write_bucketed(df: DataFrame, table: str, key: str, path: str) -> None:
    """Persist a DataFrame as a bucketed+sorted external table."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame] | None:
    """orders + lineitem as bucketed tables (created once per sf_dir);
    None if the session's catalog can't persist tables."""
    import hashlib

    from orca_spark.operators.io_ops import scratch_path

    # hash the FULL sf_dir: suffix-colliding paths must never share a
    # catalog table, or one sf would silently serve another's data
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    t_orders, t_li = f"orca_orders_{tag}", f"orca_lineitem_{tag}"

    def _fresh(table: str, path: str) -> bool:
        """Reuse only a table that still points at the expected location."""
        if not spark.catalog.tableExists(table):
            return False
        loc = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where(F.col("col_name") == "Location")
            .select("data_type")
            .collect()
        )
        if not loc or not loc[0][0].rstrip("/").endswith(path.rstrip("/").lstrip("/")):
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            return False
        return True

    try:
        p_orders = scratch_path("bucketed_orders", sf_dir)
        p_li = scratch_path("bucketed_lineitem", sf_dir)
        if not _fresh(t_orders, p_orders):
            write_bucketed(load(spark, sf_dir, "orders"), t_orders, "o_orderkey", p_orders)
        if not _fresh(t_li, p_li):
            write_bucketed(load(spark, sf_dir, "lineitem"), t_li, "l_orderkey", p_li)
        return spark.table(t_orders), spark.table(t_li)
    except Exception:
        return None


@register(
    "bucketed_join_orders_lineitem",
    oracle="""
        SELECT o_orderpriority,
               count(*)                  AS n,
               round(sum(l_quantity), 2) AS qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    description="fact-fact join on pre-bucketed tables (bucketBy 8 on the "
    "join key at write time) — the join runs with no exchange on either "
    "side; falls back to the plain join if the catalog can't persist",
)
def bucketed_join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = bucketed_tables(spark, sf_dir)
    if pair is None:
        o = load(spark, sf_dir, "orders")
        li = load(spark, sf_dir, "lineitem")
    else:
        o, li = pair
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "bucketed_agg_orders",
    oracle="""
        SELECT l_orderkey AS o_orderkey,
               CAST(count(*) AS BIGINT)       AS n_lines,
               round(sum(l_quantity), 2)      AS qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING count(*) >= 4
    """,
    description="aggregation on the bucket key of a pre-bucketed table: "
    "the groupBy(l_orderkey) runs with NO exchange (bucketing satisfies "
    "the agg's required distribution, same as the join case) — the "
    "second query shape bucketed storage amortizes; falls back to the "
    "plain scan if the catalog can't persist",
)
def bucketed_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = bucketed_tables(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem") if pair is None else pair[1]
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .where(F.col("n_lines") >= 4)
        .select(
            F.col("l_orderkey").alias("o_orderkey"), "n_lines", "qty"
        )
    )
