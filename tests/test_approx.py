"""Approximate aggregates: the 100 TB substitutes for exact distinct /
percentile. No SQL oracle (engine-specific sketches) — instead assert
error bounds against the exact answers."""

from pyspark.sql import functions as F

from orca_spark.tables import load
from tests.conftest import SF_DIR


def test_approx_count_distinct_error_bound(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_close_to_exact(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01
