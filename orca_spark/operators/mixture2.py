"""Temperature-based multilingual mixing weights, integer-exact.

``corpus_sqrt_mix_weights`` computes the alpha=0.5 temperature-sampling
weights used to rebalance multilingual corpora (sampling probability
proportional to n^alpha flattens the head and lifts the tail — the
published multilingual-pretraining recipe; alpha=0.5 is the square-root
schedule). Per language, each source's weight is

    w = isqrt(n_tokens) * 1e6 // sum_over_sources(isqrt(n_tokens))

with isqrt the EXACT integer square root: floor(sqrt(double(n))) can
round a near-perfect-square up, so the candidate is verified and
corrected with integer multiplications — after which everything is
BIGINT arithmetic and the manifest is cross-engine hash-exact (a float
sum over sources would be summation-order-dependent; the r05-r07 rule).

Scale: one map-side-combinable (lang, source) aggregate over the
corpus; the weight table is model-sized. At 100 TB this is scan-bound.

Reference parity: core.clj has no corpus surface (SURVEY §2.5); the
sampling-side sibling of mixture.py's mix plan and packing2's budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.packing import _N_TOKENS_SQL
from orca_spark.registry import register
from orca_spark.tables import load


def _with_isqrt(df: DataFrame) -> DataFrame:
    """Exact integer sqrt of ``n_tokens`` as ``root``: double candidate,
    integer-verified ±1 correction (floor(sqrt(double)) can round a
    near-perfect-square up). One implementation, three call sites
    (sqrt mix weights, the CCNet schedule, the curation pipeline, the
    budget apportionment) — a correction lands everywhere at once."""
    cand = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    return (
        df.withColumn("_s", cand)
        .withColumn(
            "root",
            F.when(F.col("_s") * F.col("_s") > F.col("n_tokens"), F.col("_s") - 1)
            .when(
                (F.col("_s") + 1) * (F.col("_s") + 1) <= F.col("n_tokens"),
                F.col("_s") + 1,
            )
            .otherwise(F.col("_s"))
            .cast("long"),
        )
        .drop("_s")
    )


@register(
    "corpus_sqrt_mix_weights",
    oracle=f"""
        WITH sized AS (
            SELECT lang, source, {_N_TOKENS_SQL} AS n_toks
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
        ),
        agg AS (
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens
            FROM sized GROUP BY lang, source
        ),
        cand AS (
            SELECT *,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s
            FROM agg
        ),
        rooted AS (
            -- exact integer sqrt: the double candidate can round up at
            -- k^2 - 1; verify and correct with integer multiplications
            SELECT lang, source, n_docs, n_tokens,
                   CAST(CASE
                       WHEN s * s > n_tokens THEN s - 1
                       WHEN (s + 1) * (s + 1) <= n_tokens THEN s + 1
                       ELSE s
                   END AS BIGINT) AS root
            FROM cand
        )
        SELECT lang, source, n_docs, n_tokens, root,
               -- zero-mass language (every doc tokenizes empty): no
               -- samplable mass, weight is explicitly NULL in BOTH
               -- engines (DuckDB's // 0 happens to yield NULL already,
               -- but Spark's ANSI div would RAISE — the contract must
               -- be spelled out, not inherited from either engine)
               CAST(CASE WHEN sum(root) OVER (PARTITION BY lang) = 0
                         THEN NULL
                         ELSE root * 1000000
                              // sum(root) OVER (PARTITION BY lang)
                    END AS BIGINT) AS weight_ppm
        FROM rooted
    """,
    description="alpha=0.5 temperature-sampling weights per (lang, "
    "source): sampling mass proportional to sqrt(token count) — the "
    "published multilingual rebalancing schedule that flattens head "
    "languages and lifts tail ones; sqrt is EXACT integer sqrt "
    "(floor-of-double candidate, integer-verified ±1 correction) and "
    "the normalization is BIGINT ppm division, so the manifest is "
    "cross-engine hash-exact with no float sum anywhere; a zero-mass "
    "language (every doc tokenizes empty) gets an explicit NULL weight "
    "in both engines rather than an ANSI divide-by-zero; one "
    "map-side-combinable aggregate, model-sized output",
)
def corpus_sqrt_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
    )
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    agg = (
        docs.select("lang", "source", F.size(toks).cast("long").alias("n_toks"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    rooted = _with_isqrt(agg)
    wlang = W.partitionBy("lang")
    return rooted.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "root",
        F.expr("root * 1000000").cast("long").alias("_num"),
        F.sum("root").over(wlang).alias("_den"),
    ).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "root",
        # zero-mass language: NULL weight, mirrored in the oracle. The
        # guard must come FIRST — ANSI div raises DIVIDE_BY_ZERO, and
        # CASE short-circuits so the division never evaluates on the
        # _den = 0 rows.
        F.when(F.col("_den") == 0, F.lit(None))
        .otherwise(F.expr("_num div _den"))
        .cast("long")
        .alias("weight_ppm"),
    )
