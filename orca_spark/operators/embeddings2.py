"""Per-dimension quantile normalization of the embedding corpus.

Feature scaling for downstream consumers that assume rank-uniform
inputs (quantile-transform in the sklearn sense, computed exactly and
distributed): each embedding coordinate is replaced by its percent
rank within its DIMENSION — (rank − 1) / (n − 1), ties sharing the
smaller rank. Emitted in exploded (vec_id, d, q) form: the flat shape
joins straight back onto ``posexplode``-ed consumers, and keeps the
oracle comparison row-per-value exact.

Reference parity: the reference (core.clj) has no vector surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "embedding_quantile_normalized",
    oracle="""
        WITH flat AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS d,
                   unnest(embedding) AS v
            FROM embeddings WHERE embedding IS NOT NULL
        )
        SELECT vec_id, CAST(d AS INT) AS d,
               round(percent_rank() OVER (PARTITION BY d ORDER BY v), 6) AS q
        FROM flat
        -- NULL elements excluded BEFORE ranking: Spark windows order
        -- NULLS FIRST ascending, DuckDB NULLS LAST — a single NULL
        -- coordinate would shift q for every value in its dimension
        WHERE v IS NOT NULL
    """,
    description="exact distributed quantile transform: every embedding "
    "coordinate replaced by its percent rank within its dimension "
    "((rank-1)/(n-1), ties share the smaller rank) — rank-uniform "
    "feature scaling, emitted exploded for exact per-value comparison",
)
def embedding_quantile_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: posexplode fans n×dim values into ONE shuffle partitioned
    by dimension (64 partitions of n values each); percent_rank then
    sorts within each dimension — per-dimension data must fit a
    partition's sort spill budget, and the two-pass partial-rank
    pattern (window_distribution_scalable) is the documented escape
    when one dimension outgrows it. No other stage touches more than
    the exploded stream once.

    Determinism: percent_rank is (rank−1)/(n−1) with rank ties decided
    by VALUE only — identical float inputs give identical integer
    ranks on both engines, and the division is one float op on those
    integers. round(6) is display-only. The raw embeddings table is
    used directly (NULL arrays excluded): zero-norm vectors are VALID
    here — their coordinates rank like any other value — so the
    similarity loaders' zero-norm exclusion contract deliberately does
    not apply."""
    flat = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
        # NULL elements out before ranking (NULLS FIRST/LAST divergence
        # between engines would shift every rank in the dimension)
        .where(F.col("v").isNotNull())
    )
    return flat.select(
        "vec_id",
        F.col("d").cast("int").alias("d"),
        F.round(
            F.percent_rank().over(W.partitionBy("d").orderBy("v")), 6
        ).alias("q"),
    )
