"""Table profiling: per-column quality statistics in one pass.

The data-quality primitive every ingestion pipeline runs first: null
counts and distinct counts per column, computed in a single aggregate
job over one scan (not one job per column), then unpivoted to one row
per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct).

    Single aggregation pass — at 100 TB this is one scan regardless of
    column count. Distinct counts are exact here; swap in
    approx_count_distinct for trillion-row profiling.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.column", "s.n_rows", "s.n_nulls", "s.n_distinct")
    )


@register(
    "profile_lineitem",
    oracle="""
        SELECT 'l_orderkey' AS column, count(*) AS n_rows,
               count(*) - count(l_orderkey) AS n_nulls,
               count(DISTINCT l_orderkey)   AS n_distinct
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag) FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
               count(DISTINCT l_quantity) FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
               count(DISTINCT l_shipdate) FROM lineitem
    """,
    description="one-pass table profile: per-column null + exact distinct "
    "counts (single scan for any column count)",
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return profile(li, ["l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"])
