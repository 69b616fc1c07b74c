"""Data-governance audit, part 2: l-diversity of sensitive values.

k-anonymity (privacy.py) counts group SIZE; it is famously insufficient
when a group is large but homogeneous — if all 50 records in a
quasi-identifier group share one sensitive value, membership alone
discloses it. ``privacy_l_diversity_audit`` closes that gap: for the
same quasi-identifier groups as the k-audit (lang, source, size
bucket), it reports the number of DISTINCT sensitive values (the
document's language-independent content marker here: the leading text
token, standing in for any sensitive attribute column) and flags
groups below l — the homogeneity-attack surface a release must
generalize even when k holds.

Scale: identical shuffle shape to the k-audit — one groupBy over
narrow derived columns; the distinct count runs as Spark's two-phase
expand + partial aggregation, and the quasi-identifier space stays
bounded, so output is near-model-sized at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_L = 3
_BUCKET = 100  # same size-bucket granularity as the k-anonymity audit


@register(
    "privacy_l_diversity_audit",
    oracle=f"""
        SELECT lang, source,
               CAST((n_chars - ((n_chars % {_BUCKET} + {_BUCKET}) % {_BUCKET}))
                    // {_BUCKET} AS BIGINT) AS size_bucket,
               CAST(count(*) AS BIGINT) AS group_n,
               CAST(count(DISTINCT string_split(text, ' ')[1]) AS BIGINT)
                   AS n_sensitive,
               count(DISTINCT string_split(text, ' ')[1]) >= {_L}
                   AS l_diverse
        FROM documents
        WHERE text IS NOT NULL
        GROUP BY 1, 2, 3
    """,
    description=f"l-diversity audit (l={_L}) over the same "
    "quasi-identifier groups as the k-anonymity audit: distinct "
    "sensitive-value counts (leading token as the stand-in sensitive "
    "attribute) with the below-l flag — catches the homogeneity attack "
    "k-anonymity misses (a large group whose members all share one "
    "sensitive value still discloses it); exact distinct via two-phase "
    "expand aggregation, bounded quasi-identifier space",
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bucket = (
        (F.col("n_chars") - F.pmod(F.col("n_chars"), F.lit(_BUCKET)))
        / F.lit(_BUCKET)
    ).cast("long")
    sensitive = F.split("text", " ").getItem(0)
    return (
        docs.select(
            "lang", "source", bucket.alias("size_bucket"), sensitive.alias("sv")
        )
        .groupBy("lang", "source", "size_bucket")
        .agg(
            F.count(F.lit(1)).alias("group_n"),
            F.count_distinct("sv").alias("n_sensitive"),
        )
        .select(
            "lang",
            "source",
            "size_bucket",
            "group_n",
            "n_sensitive",
            (F.col("n_sensitive") >= _L).alias("l_diverse"),
        )
    )
