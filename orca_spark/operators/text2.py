"""Text analysis, batch 2: BPE-style token estimation and per-language
corpus statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "text_bpe_token_estimate",
    oracle=r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\w{1,4}')) AS BIGINT) AS n_bpe_tokens,
               round(length(text)
                     / nullif(len(regexp_extract_all(text, '\w{1,4}')), 0), 4)
                   AS chars_per_token
        FROM documents
    """,
    description="BPE-ish token count estimate: greedy <=4-char word-chunk "
    "regex (the standard ~4 chars/token heuristic), all codegen'd",
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = F.regexp_extract_all("text", F.lit(r"\w{1,4}"), 0)
    n = F.size(chunks)
    return d.select(
        "doc_id",
        n.cast("long").alias("n_bpe_tokens"),
        # nullif: a doc with no word chars (empty text) is NULL, not an
        # ANSI divide-by-zero abort
        F.round(
            F.length("text") / F.nullif(n.cast("double"), F.lit(0.0)), 4
        ).alias("chars_per_token"),
    )


@register(
    "text_lang_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(avg(len(list_distinct(string_split(text, ' ')))
                         / len(string_split(text, ' '))), 4) AS avg_ttr,
               round(CAST(sum(n_chars) AS DOUBLE), 2) AS total_chars
        FROM documents
        GROUP BY lang
    """,
    description="per-language corpus profile: doc counts, token lengths, "
    "type-token ratios (the aggregate view behind language-aware sampling)",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size(toks).cast("double")), 4).alias("avg_tokens"),
        F.round(F.avg(ttr), 4).alias("avg_ttr"),
        F.round(F.sum(F.col("n_chars").cast("double")), 2).alias("total_chars"),
    )


@register(
    "text_top_terms_per_lang",
    oracle="""
        SELECT lang, word, freq
        FROM (
            SELECT lang, w AS word, count(*) AS freq,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY count(*) DESC, w) AS rn
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY lang, w
        )
        WHERE rn <= 5
    """,
    description="top-5 terms per language: the frequency profile that "
    "distinguishes languages in this corpus (explode → agg → window top-k)",
)
def text_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("word"))
    freq = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("freq"))
    w = W.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("word"))
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "word", "freq")
    )
