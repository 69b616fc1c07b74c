"""Boilerplate removal accounting: manifest applied to the corpus.

``text_boilerplate_strip_accounting`` composes the detection manifest
(``text_prefix_boilerplate``, text17.py) with its application: every
document whose leading {K} tokens match a flagged shared prefix is
listed with its token count before and after the strip — the
accounting record a curation run commits alongside the cleaned
corpus (what was removed, from which documents, at what token cost).
Detection and application share one definition by construction, so
the strip can never remove a prefix the manifest didn't flag.

Determinism: exact string prefix keys and BIGINT token counts; no
floats anywhere.

Scale: the manifest is a prefix-keyed aggregation (far below corpus
size); application is a broadcast-friendly semi-join of documents
against the flagged-prefix set followed by a narrow map. One corpus
scan feeds both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.text17 import _K, _MIN_DOCS
from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "text_boilerplate_strip_accounting",
    oracle=f"""
        WITH pre AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ),
        keyed AS (
            SELECT doc_id, toks,
                   array_to_string(toks[1:{_K}], ' ') AS prefix
            FROM pre WHERE len(toks) > 0
        ),
        flagged AS (
            SELECT prefix FROM keyed
            GROUP BY prefix HAVING count(*) >= {_MIN_DOCS}
        )
        SELECT k.doc_id, k.prefix,
               CAST(len(k.toks) AS BIGINT) AS n_tokens_before,
               CAST(greatest(len(k.toks) - {_K}, 0) AS BIGINT)
                   AS n_tokens_after
        FROM keyed k JOIN flagged f USING (prefix)
    """,
    description=f"boilerplate strip accounting: every document whose "
    f"leading {_K} tokens match a shared (>= {_MIN_DOCS} docs) prefix, "
    "with token counts before/after removal — the committed record of "
    "what a boilerplate pass stripped and its token cost, sharing one "
    "prefix definition with the detection manifest so application can "
    "never outrun detection; broadcast semi-join of docs against the "
    "flagged set, all BIGINT counts",
)
def text_boilerplate_strip_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    keyed = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.concat_ws(" ", F.slice(toks, 1, _K)).alias("prefix"),
    ).where(F.col("n_toks") > 0)
    flagged = (
        keyed.groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _MIN_DOCS)
        .select("prefix")
    )
    return keyed.join(F.broadcast(flagged), "prefix").select(
        "doc_id",
        "prefix",
        F.col("n_toks").alias("n_tokens_before"),
        F.greatest(F.col("n_toks") - _K, F.lit(0).cast("long")).alias(
            "n_tokens_after"
        ),
    )
