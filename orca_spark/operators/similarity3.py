"""Similarity batch 3: contrastive-training data mining.

Hard-negative mining is the embedding-training counterpart of dedup:
for each anchor, the most-similar vectors with a DIFFERENT label are
exactly the pairs a contrastive loss learns most from.  Structurally it
is the brute-force top-k scan with a label-inequality predicate — the
same broadcast-queries × streamed-corpus shape, so everything proven
about that path (norms hoisted, single corpus scan, windowed top-k)
carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.operators.similarity import _with_norm, dot, load_embeddings
from orca_spark.registry import register

_N_ANCHORS = 20
_K_NEG = 3


@register(
    "contrastive_hard_negatives",
    oracle=f"""
        WITH a AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x <> 0)) > 0 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND vec_id < {_N_ANCHORS}
        ),
        c AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x <> 0)) > 0 AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ),
        scored AS (
            SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
                   round(list_dot_product(a.e, c.e)
                         / (sqrt(list_dot_product(a.e, a.e))
                            * sqrt(list_dot_product(c.e, c.e))), 4) AS cosine
            FROM a JOIN c
              ON a.label <> c.label
        )
        SELECT anchor_id, negative_id, cosine, rank
        FROM (
            SELECT anchor_id, negative_id, cosine,
                   row_number() OVER (PARTITION BY anchor_id
                                      ORDER BY cosine DESC, negative_id) AS rank
            FROM scored
        )
        WHERE rank <= {_K_NEG}
    """,
    description=f"hard-negative mining for contrastive training: per "
    f"anchor ({_N_ANCHORS} of them) the top-{_K_NEG} most-similar "
    "vectors with a DIFFERENT label — broadcast anchors × one corpus "
    "scan with the label-inequality folded into the join predicate, "
    "then a per-anchor window top-k; the pairs a contrastive loss "
    "learns most from, mined without any pairwise materialization",
)
def contrastive_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir, "label")
    anchors = F.broadcast(
        _with_norm(emb.where(F.col("vec_id") < _N_ANCHORS), "an").select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("a_label"),
            F.col("e").alias("ae"),
            "an",
        )
    )
    scored = (
        _with_norm(emb, "en")
        .join(anchors, F.col("a_label") != F.col("label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.round(
                dot("ae", "e", validated=True) / (F.col("an") * F.col("en")), 4
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K_NEG)
        .select("anchor_id", "negative_id", "cosine", "rank")
    )


@register(
    "embedding_dimension_stats",
    oracle="""
        WITH flat AS (
            SELECT u.d - 1 AS dim, u.v AS v
            FROM (
                SELECT unnest(list_transform(
                           CAST(embedding AS DOUBLE[]),
                           (x, i) -> {'d': i, 'v': x})) AS u
                FROM embeddings WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x <> 0)) > 0 AND len(list_filter(embedding, x -> x IS NULL)) = 0
            )
        )
        SELECT CAST(dim AS INT) AS dim,
               round(avg(v), 6)         AS mean,
               round(stddev_pop(v), 6)  AS std,
               round(min(v), 6)         AS lo,
               round(max(v), 6)         AS hi
        FROM flat GROUP BY dim
    """,
    description="per-dimension embedding corpus statistics (mean/std/"
    "min/max over each of the 64 dims): one posexplode + map-side-"
    "combined aggregation producing a model-sized (dim-count) result — "
    "the normalization/whitening statistics pass that precedes "
    "standardized similarity search, and the per-dim drift monitor "
    "between embedding model versions",
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    flat = emb.select(F.posexplode("e").alias("dim", "v"))
    return flat.groupBy("dim").agg(
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_pop("v"), 6).alias("std"),
        F.round(F.min("v"), 6).alias("lo"),
        F.round(F.max("v"), 6).alias("hi"),
    )
