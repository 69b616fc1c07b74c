"""Corpus concentration: per-source Gini coefficient of token mass.

``corpus_gini_concentration`` — how unevenly a source's token mass is
distributed over its documents. A source where 1% of docs carry half
the tokens behaves very differently under document-level dedup,
sampling, and packing than a uniform one; the Gini coefficient is the
one-number diagnostic (0 = uniform, →1 = a few giant docs), computed
from the rank identity

    G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)

with x sorted ascending and i the 1-based rank. Every term is a BIGINT
(integer token counts, integer ranks), so the statistic is the same
double on any engine; ties rank by doc_id so the weighted sum is fully
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "corpus_gini_concentration",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS BIGINT) AS x
            FROM documents WHERE text IS NOT NULL
        ),
        ranked AS (
            SELECT source, x,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY x, doc_id) AS i
            FROM scored
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(x) AS BIGINT) AS total_tokens,
               round((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1.0
                     / nullif(count(*) * sum(x), 0), 6) AS gini
        FROM ranked GROUP BY source
    """,
    description="per-source Gini coefficient of token mass over "
    "documents (rank-identity form: all terms BIGINT, ties ranked by "
    "doc_id, so the statistic is cross-engine exact before the final "
    "round) — the concentration diagnostic that predicts how a source "
    "responds to doc-level dedup, sampling, and packing; all-empty "
    "sources yield NULL via nullif",
)
def corpus_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one source-keyed window over (source, x, doc_id) — 24
    bytes of state per row, text never enters the sort — then one
    map-side-combinable aggregation to |sources| rows. The rank sort is
    the honest cost of an order statistic; a source too large to sort
    gets the binned approximation (histogram Gini) instead, which this
    exact form validates at test scale."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        .cast("long")
        .alias("x"),
    )
    ranked = scored.select(
        "source",
        "x",
        F.row_number()
        .over(W.partitionBy("source").orderBy("x", "doc_id"))
        .alias("i"),
    )
    n, sx, six = F.count(F.lit(1)), F.sum("x"), F.sum(F.col("i") * F.col("x"))
    return ranked.groupBy("source").agg(
        n.alias("n_docs"),
        sx.alias("total_tokens"),
        F.round(
            (2 * six - (n + 1) * sx)
            / F.nullif(n * sx, F.lit(0)),
            6,
        ).alias("gini"),
    )
