"""The hashing trick: fixed-dimension bag-of-words featurization.

``text_feature_hashing`` maps each document's token counts into a
FIXED 64-bucket feature space by hashing tokens to dimensions — the
classic hashing-trick featurizer (Weinberger et al., 2009; Spark
MLlib's HashingTF is the same construction). No vocabulary is built,
no dictionary is broadcast, and the feature width is a constant: the
properties that make it the featurizer of choice when the vocabulary
is unbounded or the pipeline must be stateless (streaming scoring,
per-batch training). Output is the sparse form (doc_id, dim, weight)
plus each document's squared norm — exactly what a linear model or an
LSH stage consumes.

The hash is md5-derived (first 8 hex digits as an integer, mod 64) so
both engines compute identical dimensions — Spark's xxhash64 has no
DuckDB twin, and a featurizer whose buckets differ across engines
would be unverifiable. At production scale the hash function is
swappable (xxhash64 JVM-side is faster); the CONSTRUCTION — hash, mod,
group — is what this operator pins.

Scale: one explode → (doc, dim) count aggregation, map-side combined;
no joins, no vocabulary state, output bounded by 64 rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_DIMS = 64


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS w
            FROM documents WHERE text IS NOT NULL
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)
                        % {_DIMS} AS BIGINT) AS dim
            FROM tok
        ),
        sparse AS (
            SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS weight
            FROM hashed GROUP BY doc_id, dim
        )
        SELECT doc_id, dim, weight,
               CAST(sum(weight * weight) OVER (PARTITION BY doc_id)
                    AS BIGINT) AS doc_sq_norm
        FROM sparse
    """,
    description=f"hashing-trick featurizer: token counts hashed into a "
    f"fixed {_DIMS}-bucket space (md5-derived dimension so both engines "
    "bucket identically), emitted sparse as (doc_id, dim, weight) with "
    "the per-doc squared norm — vocabulary-free, stateless, constant "
    "width: the featurizer for unbounded vocabularies and streaming "
    "scoring; one explode + one map-side-combined groupBy, no joins",
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    hashed = tok.select(
        "doc_id",
        F.pmod(F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long"), F.lit(_DIMS))
        .cast("long")
        .alias("dim"),
    )
    sparse = hashed.groupBy("doc_id", "dim").agg(
        F.count(F.lit(1)).alias("weight")
    )
    return sparse.withColumn(
        "doc_sq_norm",
        F.sum(F.col("weight") * F.col("weight")).over(W.partitionBy("doc_id")),
    )
