"""Matryoshka-style dimension-truncation fidelity report.

``embedding_dim_truncation_fidelity`` answers the capacity question
behind every truncated-embedding deployment (Matryoshka representation
learning, prefix-dim ANN tiers): if similarity is computed on only the
first k of d dimensions, how far do cosines drift from the full-width
scores? For each prefix width (16/32/48 of 64) the report gives, over
a deterministic pair sample, the mean absolute cosine error (rounded)
and the parts-per-million of pairs whose >=0.4-near-dup verdict FLIPS
— the number that decides whether a cheap prefix tier can pre-filter
for the full-width scorer.

The pair sample is hash-free and engine-exact: vectors pair with the
next vec_id in the (vec_id mod 17) residue class — a fixed-size,
reproducible O(n) sample, no RNG, no all-pairs join (at 100 TB the
sample is a window-lag over one sorted shuffle of the id column,
|sample| = |vectors|).

Determinism: per-pair dots fold the array in index order (bit-equal
across engines); cosine errors are rounded before aggregation and the
flip flag compares rounded cosines, so membership is cross-engine
exact; the final means are rounded at the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.similarity import load_embeddings
from orca_spark.registry import register

_WIDTHS = [16, 32, 48]
_RES = 17  # pair stride: neighbor within the (vec_id mod 17) class
_THR = 0.4  # the near-dup verdict whose flips are counted


def _duck_cos(a: str, b: str, k: int | None) -> str:
    va = a if k is None else f"list_slice({a}, 1, {k})"
    vb = b if k is None else f"list_slice({b}, 1, {k})"
    return (
        f"list_dot_product({va}, {vb}) / nullif(sqrt(list_dot_product({va}, {va}))"
        f" * sqrt(list_dot_product({vb}, {vb})), 0)"
    )


@register(
    "embedding_dim_truncation_fidelity",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(list_filter(embedding, x -> x <> 0)) > 0
              AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ),
        nbr AS (
            SELECT vec_id, v,
                   lead(v) OVER (PARTITION BY vec_id % {_RES}
                                 ORDER BY vec_id) AS v2
            FROM e
        ),
        pairs AS (SELECT v, v2 FROM nbr WHERE v2 IS NOT NULL),
        widths AS (SELECT unnest([{", ".join(str(w) for w in _WIDTHS)}]) AS k),
        scored AS (
            SELECT k,
                   round({_duck_cos("v", "v2", None)}, 6) AS cf,
                   round(CASE
                       WHEN k = 16 THEN {_duck_cos("v", "v2", 16)}
                       WHEN k = 32 THEN {_duck_cos("v", "v2", 32)}
                       ELSE {_duck_cos("v", "v2", 48)}
                   END, 6) AS ct
            FROM pairs, widths
        )
        SELECT k AS width,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(abs(cf - ct)), 4) AS mean_abs_err,
               CAST(sum(CASE WHEN (cf >= {_THR}) <> (ct >= {_THR})
                             THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS flip_ppm
        FROM scored
        GROUP BY k
    """,
    description="Matryoshka truncation fidelity: for prefix widths "
    f"{_WIDTHS} of 64, the mean absolute cosine error and the ppm of "
    f"pairs whose >= {_THR} near-dup verdict flips, over the "
    "deterministic neighbor-in-residue-class pair sample (O(n) pairs "
    "via one window lag, no RNG, no all-pairs join) — the go/no-go "
    "number for a cheap prefix-dimension ANN pre-filter tier; rounded "
    "operands make flip membership cross-engine exact",
)
def embedding_dim_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    w = W.partitionBy(F.pmod("vec_id", F.lit(_RES))).orderBy("vec_id")
    pairs = (
        emb.select("vec_id", "e", F.lead("e").over(w).alias("e2"))
        .where(F.col("e2").isNotNull())
        .select("e", "e2")
    )

    def cos(a, b, k=None):
        va = F.col(a) if k is None else F.slice(a, 1, k)
        vb = F.col(b) if k is None else F.slice(b, 1, k)

        def s(arr):
            return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

        def sq(arr):
            return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)

        norms = F.sqrt(sq(va)) * F.sqrt(sq(vb))
        return s(F.zip_with(va, vb, lambda x, y: x * y)) / F.when(
            norms == 0, None
        ).otherwise(norms)

    scored = None
    for k in _WIDTHS:
        part = pairs.select(
            F.lit(k).alias("width"),
            F.round(cos("e", "e2"), 6).alias("cf"),
            F.round(cos("e", "e2", k), 6).alias("ct"),
        )
        scored = part if scored is None else scored.unionAll(part)
    return scored.groupBy("width").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("cf") - F.col("ct"))), 4).alias("mean_abs_err"),
        F.expr(
            f"CAST(sum(CASE WHEN (cf >= {_THR}) != (ct >= {_THR}) THEN 1 ELSE 0 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("flip_ppm"),
    )
