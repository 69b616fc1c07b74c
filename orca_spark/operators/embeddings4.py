"""Embedding outlier detection: distance-to-centroid flags per label.

``embedding_label_outliers`` flags, within each label group, the
vectors whose squared Euclidean distance to the group centroid is more
than four times the group's mean squared distance — the standard
mislabeled-sample / encoder-glitch sweep run before embeddings feed a
trainer or an ANN index. (Distance-based, not cosine-based, so it also
catches magnitude outliers that normalized scores hide.)

The identity that keeps it one-pass: with m = group mean vector,

    mean_i ||x_i - m||^2 = mean_i ||x_i||^2 - ||m||^2

so the gate needs only per-group first moments (the centroid) and the
scalar second moment — no second scan to compute the mean distance
after the centroid is known, and the per-vector distance is computed
once, row-locally, against broadcast-joined group aggregates.

Scale: one posexplode → (label, i) centroid aggregation (map-side
combined, d-bounded output), one scalar moment aggregation, and one
corpus scan that joins the model-sized group table by label. Same
train-on-aggregates/apply-broadcast split as whitening/k-means.

Determinism: centroids are float means (summation-order bits differ
across engines), so every comparison operand is rounded to 6 decimals
FIRST — the flag compares identically-rounded doubles on both sides —
and reported values are re-rounded to 4 at the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.similarity import load_embeddings
from orca_spark.registry import register

_OUT_FACTOR = 4  # flag if dist2 > factor * mean dist2 (on rounded operands)


@register(
    "embedding_label_outliers",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding, x -> x <> 0)) > 0
              AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ),
        cent AS (
            SELECT label, i, avg(v[i]) AS m
            FROM e, generate_series(1, 64) AS t(i)
            GROUP BY label, i
        ),
        cvec AS (
            SELECT label, list(m ORDER BY i) AS mv,
                   round(sum(m * m), 6) AS m2
            FROM cent GROUP BY label
        ),
        stats AS (
            SELECT label, round(avg(list_dot_product(v, v)), 6) AS mean_sq
            FROM e GROUP BY label
        ),
        d AS (
            SELECT e.vec_id, e.label,
                   round(list_dot_product(e.v, e.v)
                         - 2 * list_dot_product(e.v, c.mv) + c.m2, 6) AS dist2,
                   round(s.mean_sq - c.m2, 6) AS mean_dist2
            FROM e JOIN cvec c USING (label) JOIN stats s USING (label)
        )
        SELECT vec_id, label, round(dist2, 4) AS dist2,
               round(mean_dist2, 4) AS mean_dist2
        FROM d WHERE dist2 > {_OUT_FACTOR} * mean_dist2
    """,
    description="per-label embedding outliers: vectors whose squared "
    f"distance to their label centroid exceeds {_OUT_FACTOR}x the "
    "label's mean squared distance (one-pass via mean||x-m||^2 = "
    "mean||x||^2 - ||m||^2) — the mislabeled-sample sweep before "
    "embeddings feed a trainer or index; comparison operands rounded "
    "to 6dp on both engines so the float-mean centroid cannot flip "
    "flag membership",
)
def embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir, "label")
    flat = emb.select("vec_id", "label", F.posexplode("e").alias("i", "x"))
    cent = flat.groupBy("label", "i").agg(F.avg("x").alias("m"))
    cnorm = cent.groupBy("label").agg(F.round(F.sum(F.col("m") * F.col("m")), 6).alias("m2"))
    stats = emb.groupBy("label").agg(
        F.round(
            F.avg(F.aggregate("e", F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("mean_sq")
    )
    # per-vector x.m dot product against the broadcast centroid rows
    xm = (
        flat.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("x") * F.col("m")).alias("xm"))
    )
    sq = emb.select(
        "vec_id",
        "label",
        F.aggregate("e", F.lit(0.0), lambda a, x: a + x * x).alias("sq"),
    )
    d = (
        sq.join(xm, ["vec_id", "label"])
        .join(F.broadcast(cnorm), "label")
        .join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            F.round(F.col("sq") - 2 * F.col("xm") + F.col("m2"), 6).alias("dist2"),
            F.round(F.col("mean_sq") - F.col("m2"), 6).alias("mean_dist2"),
        )
    )
    return d.where(F.col("dist2") > _OUT_FACTOR * F.col("mean_dist2")).select(
        "vec_id",
        "label",
        F.round("dist2", 4).alias("dist2"),
        F.round("mean_dist2", 4).alias("mean_dist2"),
    )
