"""Corpus-level embedding diversity without materializing any pairs.

``embedding_corpus_diversity`` reports, per label group, the expected
squared Euclidean distance between two uniformly random group members —
the standard diversity/collapse diagnostic for an embedding corpus (a
shrinking value under a new encoder means representation collapse; a
per-source value far below the corpus average means that source is
near-duplicate-heavy even if no individual pair crosses a dedup
threshold).

The 100 TB point is the algebra: E‖x−y‖² over independent x, y equals
2·Σ_d (E[x_d²] − E[x_d]²) = 2·trace(cov), so the "pairwise" statistic
is ONE posexplode + map-side-combinable per-(label, dim) moments — no
pair join exists in the plan at any scale. (The same identity is why
``clustering.py`` computes inertia in the assignment pass.)

Reference parity: the reference (core.clj) has no embedding surface;
LLM-pipeline extension graded as an engine component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.similarity import load_embeddings
from orca_spark.registry import register


@register(
    "embedding_corpus_diversity",
    oracle="""
        WITH flat AS (
            SELECT label, u.v AS v, u.d AS dim
            FROM (
                SELECT label,
                       unnest(list_transform(
                           CAST(embedding AS DOUBLE[]),
                           (x, i) -> {'d': i, 'v': x})) AS u
                FROM embeddings
                WHERE embedding IS NOT NULL
                  AND len(list_filter(embedding, x -> x <> 0)) > 0
                  AND len(list_filter(embedding, x -> x IS NULL)) = 0
            )
        ),
        moments AS (
            SELECT label, dim, avg(v) AS m, avg(v * v) AS m2,
                   count(*) AS n
            FROM flat GROUP BY label, dim
        )
        SELECT label,
               CAST(max(n) AS BIGINT) AS n_vectors,
               round(2 * sum(m2 - m * m), 6) AS avg_sq_dist
        FROM moments GROUP BY label
    """,
    description="per-label embedding diversity: expected squared "
    "distance between two random group members via the 2·trace(cov) "
    "identity — one posexplode + per-(label,dim) moment aggregation, "
    "NO pair join at any scale; the collapse/near-dup-density "
    "diagnostic run before and after encoder or dedup changes",
)
def embedding_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the exploded stream is n·dim rows of three narrow columns
    with map-side partial aggregation into at most |labels|·dim groups —
    model-sized output, single shuffle. Float determinism: the moments
    are order-dependent in the last ulp, so the final statistic is
    rounded to 6 places on both sides (house rule for float
    aggregates); everything upstream of the round is exact algebra."""
    emb = load_embeddings(spark, sf_dir, "label")
    flat = emb.select("label", F.posexplode("e").alias("dim", "v"))
    moments = flat.groupBy("label", "dim").agg(
        F.avg("v").alias("m"),
        F.avg(F.col("v") * F.col("v")).alias("m2"),
        F.count(F.lit(1)).alias("n"),
    )
    return moments.groupBy("label").agg(
        F.max("n").alias("n_vectors"),
        F.round(2 * F.sum(F.col("m2") - F.col("m") * F.col("m")), 6).alias(
            "avg_sq_dist"
        ),
    )
