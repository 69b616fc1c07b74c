"""Deterministic-pair cosine profile of the embedding corpus.

``embedding_adjacent_cosine_profile`` pairs every vector with the NEXT
vec_id inside its label (a deterministic, id-ordered pairing) and
histograms the pair cosines into width-0.1 bins per label. This is the
cheap corpus-geometry health check: a healthy embedding space puts
same-label adjacent pairs in a broad positive band; a collapsed
encoder (all cosines ~ 1.0) or a dead one (~ 0.0) shows up instantly,
per label, without any O(n²) pair enumeration — the fixed-size
histogram is the statistic, the id-pairing is just an unbiased-enough
deterministic sample of same-label pairs.

Determinism: the pairing is a window ``lead`` over (label, vec_id) —
set-determined, no floats; each cosine is the engine's standard
index-ordered dot-product fold over exact inputs (bit-identical across
engines, similarity.py's contract), and the bin is ``floor(cos*10)``
of that identical double, so even bin-boundary values land identically.
Counts are BIGINT; nothing needs rounding.

Scale: one label-partitioned window (the engine's standard distributed
window shape), one narrow cosine map, and a (label, bin)-keyed
aggregation to a model-sized histogram. No pair join exists anywhere.

Reference parity: core.clj has no embedding surface; LLM-pipeline
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.similarity import dot, load_embeddings
from orca_spark.registry import register

_VALID = (
    "embedding IS NOT NULL "
    "AND len(list_filter(embedding, x -> x <> 0)) > 0 "
    "AND len(list_filter(embedding, x -> x IS NULL)) = 0"
)


@register(
    "embedding_adjacent_cosine_profile",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE {_VALID}
        ),
        paired AS (
            SELECT label, v,
                   lead(v) OVER (PARTITION BY label ORDER BY vec_id) AS v2
            FROM e
        ),
        scored AS (
            SELECT label,
                   list_dot_product(v, v2)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(v2, v2))) AS cos
            FROM paired WHERE v2 IS NOT NULL
        )
        SELECT label, CAST(floor(cos * 10) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM scored GROUP BY label, bin
    """,
    description="per-label histogram (width-0.1 bins) of cosines between "
    "id-adjacent same-label vector pairs: the O(n) corpus-geometry "
    "health check — encoder collapse (mass at bin 9-10) or dead space "
    "(mass at 0) shows per label without any pair join; pairing is a "
    "deterministic lead window, cosines the engine's index-ordered "
    "fold (bit-identical), bins floor(cos*10) of identical doubles, "
    "counts BIGINT",
)
def embedding_adjacent_cosine_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_embeddings(spark, sf_dir, "label")
    w = W.partitionBy("label").orderBy("vec_id")
    paired = emb.select(
        "label",
        "e",
        F.lead("e").over(w).alias("e2"),
    ).where(F.col("e2").isNotNull())
    cos = dot("e", "e2", validated=True) / (
        F.sqrt(dot("e", "e", validated=True))
        * F.sqrt(dot("e2", "e2", validated=True))
    )
    return (
        paired.select("label", F.floor(cos * 10).alias("bin"))
        .groupBy("label", "bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
