"""Sketch-based profiling: the 100 TB form of profile.py.

``profile_lineitem`` computes EXACT distinct counts — one expand+shuffle
per profiled column, which is the right answer at test scale and the
wrong one at 100 TB. This module is the scale path: HyperLogLog++
(``approx_count_distinct``) and KLL-style quantile sketches
(``percentile_approx``) fold the whole profile into ONE partial-agg
pass — no expand, one tiny shuffle of fixed-size sketch buffers,
constant memory per executor regardless of cardinality.

No DuckDB oracle: both engines implement HLL/quantile sketches with
different hash seeds and compaction schedules, so the approximate
values legitimately differ. Accuracy is asserted in
tests/test_approx.py instead (HLL rsd=0.01 vs exact distinct counts;
approx quantiles within rank tolerance of the exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_RSD = 0.01            # HLL++ target relative standard deviation
_PCT_ACCURACY = 10000  # percentile_approx accuracy (rank error <= n/accuracy)


@register(
    "profile_lineitem_approx",
    oracle=None,  # sketch outputs are engine-specific by construction;
    # accuracy vs the exact profile is asserted in tests/test_approx.py
    description="one-pass sketch profile: HLL++ distinct counts "
    f"(rsd={_RSD}) + approx percentiles (accuracy={_PCT_ACCURACY}) for "
    "every profiled column in a single partial-aggregated scan — "
    "fixed-size sketch buffers instead of per-column expand shuffles; "
    "the 100 TB form of profile_lineitem",
)
def profile_lineitem_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("l_orderkey", rsd=_RSD).alias("orderkeys_approx"),
        F.approx_count_distinct("l_partkey", rsd=_RSD).alias("partkeys_approx"),
        F.approx_count_distinct("l_suppkey", rsd=_RSD).alias("suppkeys_approx"),
        F.percentile_approx("l_extendedprice", 0.5, _PCT_ACCURACY).alias("price_p50"),
        F.percentile_approx("l_extendedprice", 0.95, _PCT_ACCURACY).alias("price_p95"),
        F.percentile_approx("l_quantity", 0.5, _PCT_ACCURACY).alias("qty_p50"),
    )
