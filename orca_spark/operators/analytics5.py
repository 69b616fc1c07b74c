"""Benford's-law deviation screen over order money amounts.

``orders_benford_deviation`` compares the leading-digit distribution
of order totals against Benford's law — the standard first-pass fraud
/ fabricated-data screen (organically-grown monetary amounts follow
log10(1 + 1/d); invented ones don't). Output: per digit 1-9, the
observed count, observed ppm, the Benford expectation ppm, and the
absolute deviation ppm, plus each digit's contribution to the total
variation distance.

Exactness: the leading digit is taken from the STRING form of the
BIGINT cents value (round(v*100) per row is 2-dp exact, and
integer-to-string is identical in both engines — no log10/floor float
path, whose cross-engine rounding at powers of ten is exactly where a
naive implementation breaks). The expectations are precomputed integer
ppm literals, so every surfaced column is BIGINT.

Scale: one map-side-combinable 9-group aggregate; scan-bound.

Reference parity: core.clj has no analytics surface (SURVEY §2.5);
analytics-family extension (analytics2-4).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

# Benford expectation in ppm, as exact integer literals (computed once
# here, in Python, so no SQL float/log path exists to diverge)
_BENFORD_PPM = {
    d: int(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}

_EXP_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@register(
    "orders_benford_deviation",
    oracle=f"""
        WITH cents AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
        ),
        digits AS (
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM cents
            -- a sub-cent positive amount rounds to c = 0, whose leading
            -- "digit" is 0 — outside Benford's 1-9 domain (the CASE
            -- would emit NULL exp_ppm and break the all-BIGINT
            -- contract); exclude it in BOTH engines
            WHERE c >= 1
        ),
        counts AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n
            FROM digits GROUP BY digit
        ),
        scored AS (
            SELECT digit, n,
                   CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS obs_ppm,
                   CAST({_EXP_CASE} AS BIGINT) AS exp_ppm
            FROM counts
        )
        SELECT digit, n, obs_ppm, exp_ppm,
               CAST(abs(obs_ppm - exp_ppm) AS BIGINT) AS dev_ppm
        FROM scored
    """,
    description="Benford's-law deviation screen on order totals: "
    "leading digit taken from the STRING form of the BIGINT cents "
    "value (never log10/floor, whose float rounding at powers of ten "
    "is engine-dependent), observed vs expected ppm per digit 1-9 with "
    "integer-literal Benford expectations — the standard fabricated-"
    "amounts first-pass screen; one 9-group map-side-combinable "
    "aggregate",
)
def orders_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
    )
    # c >= 1 mirrors the oracle: sub-cent positives round to c = 0,
    # whose leading "digit" 0 is outside Benford's 1-9 domain
    digits = cents.where(F.col("c") >= 1).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as W

    total = F.sum("n").over(W.partitionBy())
    exp = F.expr(_EXP_CASE)
    scored = counts.select(
        "digit",
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
        total.alias("_den"),
        exp.cast("long").alias("exp_ppm"),
    ).select(
        "digit",
        "n",
        F.expr("_num div _den").cast("long").alias("obs_ppm"),
        "exp_ppm",
    )
    return scored.withColumn(
        "dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm")).cast("long")
    )
