"""Zipf-law fit of the corpus token frequency distribution.

``text_zipf_exponent`` fits the power-law exponent of the corpus
unigram distribution — ln(freq) regressed on ln(rank) by ordinary
least squares — per language. Natural text famously sits near slope
-1; the fitted slope is the cheapest corpus-health statistic there is:
a much flatter slope flags synthetic/templated text (token mass too
evenly spread), a much steeper one flags degenerate repetition. The
r-squared reports how power-law-like the distribution actually is.

Determinism: ranks come from a row_number over (count DESC, token) —
integer-derived and tie-broken, so rank and frequency are exact; each
regression input (ln of an exact integer) is bit-identical across
engines; the OLS sums are float folds, so the two outputs (slope, r2)
are rounded at the surface like every float aggregate in the engine.

Scale: the regression runs on the aggregated (lang, token, count)
table — vocabulary-sized, orders of magnitude below the corpus — and
the ranking window partitions by lang. The corpus itself is scanned
once for the count aggregation (map-side combined). At extreme vocab
sizes the window within one language is the pressure point; the
standard mitigation (rank only the top-N tokens by a pre-filter) is a
one-line addition that does not change the fit materially since OLS
on ln-ln data is dominated by the head anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "text_zipf_exponent",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS w
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        counts AS (
            SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY lang, w
        ),
        ranked AS (
            SELECT lang,
                   ln(row_number() OVER (PARTITION BY lang
                                         ORDER BY c DESC, w)) AS x,
                   ln(c) AS y
            FROM counts
        ),
        fit AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_tokens_vocab,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM ranked GROUP BY lang
        )
        SELECT lang, n_tokens_vocab,
               round((n_tokens_vocab * sxy - sx * sy)
                     / nullif(n_tokens_vocab * sxx - sx * sx, 0), 4) AS slope,
               round(pow(n_tokens_vocab * sxy - sx * sy, 2)
                     / nullif((n_tokens_vocab * sxx - sx * sx)
                              * (n_tokens_vocab * syy - sy * sy), 0), 4)
                   AS r2
        FROM fit
    """,
    description="per-language Zipf fit: OLS slope and r-squared of "
    "ln(freq) on ln(rank) over the unigram table — natural text sits "
    "near slope -1, flatter flags synthetic/templated mass, steeper "
    "flags degenerate repetition; ranks are integer-derived with a "
    "token tie-break, regression runs on the vocabulary-sized count "
    "table with a lang-partitioned window, floats rounded at the "
    "surface",
)
def text_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    counts = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    rw = W.partitionBy("lang").orderBy(F.col("c").desc(), F.col("w"))
    ranked = counts.select(
        "lang",
        F.log(F.row_number().over(rw).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    fit = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens_vocab"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n_tokens_vocab") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n_tokens_vocab") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n_tokens_vocab") * F.col("syy") - F.col("sy") * F.col("sy")
    return fit.select(
        "lang",
        "n_tokens_vocab",
        F.round(num / F.expr("nullif(n_tokens_vocab * sxx - sx * sx, 0)"), 4).alias(
            "slope"
        ),
        F.round(
            F.pow(num, F.lit(2)) / F.when(denx * deny == 0, None).otherwise(denx * deny),
            4,
        ).alias("r2"),
    )
