"""Per-dimension embedding distribution profile, cross-engine exact.

``embedding_dimension_profile`` is the monitoring table every vector
pipeline wants before/after a model swap: for each embedding
dimension, the count, negative/zero counts, extremes, mean and
variance. A dead dimension (zero variance), a saturated one (extreme
|mean|), or a shifted one (mean drift between snapshots) is how
embedding-model regressions actually show up in production.

The determinism trick: float sums are summation-order-dependent, so
instead of summing doubles, every value is clamped to the documented
profile range (±1e6 — degenerate garbage saturates the extremes
instead of poisoning the moments) and scaled by a POWER OF TWO (2^16)
then floored — clamp, power-of-two multiply and floor are all exact
in binary floating point, so each row's scaled integer is
bit-identical in Spark and DuckDB (no decimal-representation rounding
anywhere, unlike power-of-ten scaling where the two engines' round()
semantics diverge — the r07 lesson). Moments accumulate in exact wide
integers (Spark DECIMAL(38,0), DuckDB HUGEINT — sum-of-squares of
clamped values fits to ~1e15 rows), and the float surfaces (mean/var)
are the same IEEE expression over identical integers, rounded at the
surface.

Scale: posexplode fans N vectors x d rows, but the aggregation is
map-side combinable per dimension — the shuffle carries d partial
rows per task, and d is model-sized (64 here). Scan-bound at any
corpus size.

Reference parity: core.clj has no vector surface (SURVEY §2.5);
embeddings-family extension (embeddings2-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_SCALE = 65536  # 2^16: exact in binary fp; floor(v * 2^16) is integer-exact
_CLAMP = 1_000_000.0  # profile range; garbage magnitudes saturate here


@register(
    "embedding_dimension_profile",
    oracle=f"""
        WITH vals AS (
            SELECT CAST(g.i AS BIGINT) - 1 AS dim,
                   CAST(floor(least(greatest(CAST(embedding[g.i] AS DOUBLE),
                                             -{_CLAMP}), {_CLAMP})
                              * {_SCALE}) AS BIGINT) AS q
            FROM embeddings,
                 UNNEST(generate_series(1, len(embedding))) AS g(i)
            WHERE embedding IS NOT NULL AND embedding[g.i] IS NOT NULL
        ),
        agg AS (
            SELECT dim,
                   CAST(count(*) AS BIGINT)            AS n,
                   CAST(sum(CASE WHEN q < 0 THEN 1 ELSE 0 END)
                        AS BIGINT)                     AS n_neg,
                   CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END)
                        AS BIGINT)                     AS n_zero,
                   CAST(min(q) AS BIGINT)              AS min_q,
                   CAST(max(q) AS BIGINT)              AS max_q,
                   CAST(sum(CAST(q AS HUGEINT)) AS DOUBLE)        AS sum_q,
                   CAST(sum(CAST(q AS HUGEINT) * q) AS DOUBLE)    AS sumsq_q
            FROM vals GROUP BY dim
        )
        SELECT dim, n, n_neg, n_zero,
               round(min_q / {_SCALE}.0, 4) AS min_v,
               round(max_q / {_SCALE}.0, 4) AS max_v,
               round(sum_q / ({_SCALE}.0 * n), 4) AS mean_v,
               round((sumsq_q / n - (sum_q / n) * (sum_q / n))
                     / ({_SCALE}.0 * {_SCALE}.0), 4) AS var_v
        FROM agg
    """,
    description="per-dimension embedding distribution profile (count, "
    "neg/zero counts, extremes, mean, variance): the dead-dimension / "
    "saturation / drift monitor for embedding-model swaps; values are "
    "clamped to the documented ±1e6 profile range then floored at "
    "power-of-two scale 2^16 (all exact in binary fp — immune to the "
    "cross-engine decimal-round divergence), moments accumulate in "
    "exact wide integers (DECIMAL(38,0)/HUGEINT), and the float "
    "surfaces are identical IEEE expressions over identical integers; "
    "map-side-combinable agg, shuffle carries d rows per task",
)
def embedding_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    vals = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .where(F.col("v").isNotNull())
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.floor(
                F.least(
                    F.greatest(F.col("v").cast("double"), F.lit(-_CLAMP)),
                    F.lit(_CLAMP),
                )
                * _SCALE
            )
            .cast("long")
            .alias("q"),
        )
    )
    qd = F.col("q").cast("decimal(38,0)")
    agg = vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("q") < 0, 1).otherwise(0)).alias("n_neg"),
        F.sum(F.when(F.col("q") == 0, 1).otherwise(0)).alias("n_zero"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.sum(qd).cast("double").alias("sum_q"),
        F.sum(qd * F.col("q")).cast("double").alias("sumsq_q"),
    )
    s = float(_SCALE)
    return agg.select(
        "dim",
        "n",
        "n_neg",
        "n_zero",
        F.round(F.col("min_q") / s, 4).alias("min_v"),
        F.round(F.col("max_q") / s, 4).alias("max_v"),
        F.round(F.col("sum_q") / (s * F.col("n")), 4).alias("mean_v"),
        F.round(
            (
                F.col("sumsq_q") / F.col("n")
                - (F.col("sum_q") / F.col("n")) * (F.col("sum_q") / F.col("n"))
            )
            / (s * s),
            4,
        ).alias("var_v"),
    )
