"""Data-governance audit: k-anonymity of quasi-identifier combinations.

``privacy_k_anonymity_audit`` — before a corpus (or its metadata) is
shared, the governance question is whether any combination of
quasi-identifiers isolates fewer than k records: such groups
re-identify individuals by joining with outside knowledge. The audit
groups documents by (lang, source, size bucket), reports each
combination's cardinality, and flags groups below the k threshold —
the flagged rows are exactly what a release process must suppress or
generalize (the remediation is a policy choice; the audit is the
engine's job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_K = 5
_BUCKET = 100  # n_chars granularity for the size quasi-identifier


@register(
    "privacy_k_anonymity_audit",
    oracle=f"""
        SELECT lang, source,
               CAST((n_chars - ((n_chars % {_BUCKET} + {_BUCKET}) % {_BUCKET}))
                    // {_BUCKET} AS BIGINT) AS size_bucket,
               CAST(count(*) AS BIGINT) AS group_n,
               count(*) >= {_K} AS k_anonymous
        FROM documents
        GROUP BY 1, 2, 3
    """,
    description=f"k-anonymity audit (k={_K}) over the quasi-identifier "
    f"combination (lang, source, n_chars/{_BUCKET} bucket): group "
    "cardinalities with the below-k flag — the rows a release process "
    "must suppress or generalize; floor-bucketing uses pmod so negative "
    "sizes bucket identically across engines",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one map-side-combinable groupBy over three narrow columns;
    the quasi-identifier space is bounded (langs × sources × buckets) so
    the shuffle output is near-model-sized regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        (F.col("n_chars") - F.pmod(F.col("n_chars"), F.lit(_BUCKET)))
        / F.lit(_BUCKET)
    ).cast("long")
    return (
        docs.select("lang", "source", bucket.alias("size_bucket"))
        .groupBy("lang", "source", "size_bucket")
        .agg(F.count(F.lit(1)).alias("group_n"))
        .select(
            "lang",
            "source",
            "size_bucket",
            "group_n",
            (F.col("group_n") >= _K).alias("k_anonymous"),
        )
    )
