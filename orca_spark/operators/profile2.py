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


@register(
    "profile_sketch_persist_union",
    oracle=None,  # sketch binaries and estimates are engine-specific;
    # estimate-vs-exact bounds are asserted in tests/test_approx.py
    description="mergeable-sketch profiling: per-source Datasketches "
    "HLL sketches (hll_sketch_agg over content hashes) PERSISTED to "
    "parquet, read back, and hll_union_agg'd into the corpus-wide "
    "distinct estimate — the incremental shape where each ingest batch "
    "stores model-sized sketches and global cardinality never rescans "
    "history; emits per-source estimates plus the ALL union row",
)
def profile_sketch_persist_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why this exists next to ``profile_lineitem_approx``: that op's
    ``approx_count_distinct`` folds to ONE number per query —
    re-profiling after every daily ingest rescans everything.  Storing
    the per-batch HLL binaries instead makes the profile additive:
    union(sketches) is exact over the sketch algebra, so day N's global
    profile costs one scan of N model-sized rows, not N days of data.
    """
    from orca_spark.operators.io_ops import scratch_path

    docs = load(spark, sf_dir, "documents")
    sketches = docs.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text")).alias("sk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    path = scratch_path("hll_sketches", sf_dir)
    sketches.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    per_source = back.select(
        "source",
        F.hll_sketch_estimate("sk").alias("distinct_est"),
        "n_docs",
    )
    merged = back.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_est"),
        F.sum("n_docs").alias("n_docs"),
    ).select(F.lit("ALL").alias("source"), "distinct_est", "n_docs")
    return per_source.unionByName(merged).orderBy("source")
