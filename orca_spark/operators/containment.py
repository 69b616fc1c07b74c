"""Asymmetric token-set containment pairs (boilerplate inclusion).

Jaccard treats both documents symmetrically, so a short boilerplate
block quoted inside a much larger document scores LOW — exactly the
pairs a contamination sweep must catch. Containment fixes the
asymmetry: ``C(A, B) = |A ∩ B| / |A|`` — "what fraction of A's tokens
appear in B" — flags A as (near-)contained in B regardless of how much
larger B is.

Blocking is asymmetric too: if ``C(A, B) >= t`` then B must contain at
least ``ceil(t·|A|)`` of A's tokens, so B shares a token with ANY
``|A| - ceil(t·|A|) + 1``-subset of A — in particular with A's
rarest-token prefix. Candidates therefore join A-side PREFIXES against
B's FULL token sets; the bucket keys are A's rare tokens, so the join
never keys on stopwords even though B is fully indexed.

Reference parity: the reference (core.clj) has no similarity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

# containment threshold as an exact rational (9/10): integer
# cross-multiplication decides membership, never a float compare
_THR_NUM = 9
_THR_DEN = 10


@register(
    "dedup_containment_pairs",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
            FROM documents WHERE text IS NOT NULL
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.t, b.t)) * 1.0 / len(a.t), 4)
                   AS containment
        FROM s a JOIN s b ON a.doc_id <> b.doc_id
        WHERE len(list_intersect(a.t, b.t)) * {_THR_DEN}
              >= len(a.t) * {_THR_NUM}
    """,
    description=f"asymmetric containment >= {_THR_NUM}/{_THR_DEN} pairs "
    "(|A∩B|/|A|): catches boilerplate/quote inclusion that symmetric "
    "Jaccard under-scores; A-side rare-token prefix blocked against "
    "B's full token sets (recall 1 by the containment prefix bound), "
    "integer threshold arithmetic; oracle runs the all-pairs form",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: A-side prefixes hold each document's
    ``sz - ceil(t·sz) + 1`` RAREST tokens (df-ordered, deterministic
    tiebreak), so candidate buckets key on rare tokens even though the
    B side indexes every token; the explicit repartition is the same
    AQE expansion guard as blocking.prefix_candidates (tiny input,
    possibly quadratic output inside dup families). Verification is
    one array_intersect per candidate — O(candidates), never n².

    Determinism: the threshold is integer cross-multiplication; the
    displayed containment is one division of identical integers."""
    sets = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .select("doc_id", "toks", F.size("toks").alias("sz"))
    )
    exploded = sets.select("doc_id", "sz", F.explode("toks").alias("w"))
    freq = exploded.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    rn = F.row_number().over(W.partitionBy("doc_id").orderBy("df", "w"))
    prefix_len = (
        F.col("sz") - F.ceil(F.col("sz") * _THR_NUM / F.lit(_THR_DEN)) + 1
    )
    a_prefix = (
        exploded.join(freq, "w")
        .withColumn("rn", rn)
        .where(F.col("rn") <= prefix_len)
        .select(F.col("doc_id").alias("doc_a"), "w")
        .repartition(32, "w")
    )
    b_tokens = exploded.select(F.col("doc_id").alias("doc_b"), "w")
    cand = (
        a_prefix.join(
            b_tokens, (a_prefix.w == b_tokens.w) & (F.col("doc_a") != F.col("doc_b"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("t_a"), F.col("sz").alias("sa")
    )
    gb = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("t_b"))
    inter = F.size(F.array_intersect("t_a", "t_b"))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .where(inter * _THR_DEN >= F.col("sa") * _THR_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter * F.lit(1.0) / F.col("sa"), 4).alias("containment"),
        )
    )
