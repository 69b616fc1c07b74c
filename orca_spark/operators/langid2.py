"""Language-ID evaluation: the classifier's confusion matrix.

``langid_confusion_matrix`` aggregates the Cavnar-Trenkle trigram
classifier's per-document predictions (langid.py) into the (true lang,
predicted lang) matrix with per-true-language share — the evaluation
artifact that turns "the classifier exists" into "the classifier is
safe to gate a mixture on": off-diagonal mass shows exactly which
language pairs confuse (and therefore which mixture buckets would be
polluted by routing on the prediction).

The oracle REUSES the classifier's full oracle SQL as a CTE
(`_LANGID_SQL`), so classifier and evaluation can never drift apart.

Scale: everything downstream of the per-doc prediction is a
|langs|^2-bounded aggregation; shares are integer ppm against a
lang-partitioned window over the already-aggregated matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.langid import _LANGID_SQL, langid_trigram_df
from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "langid_confusion_matrix",
    oracle=f"""
        WITH pred AS ({_LANGID_SQL})
        SELECT lang, predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) * 1000000
                    // sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
                   AS share_ppm
        FROM pred
        WHERE lang IS NOT NULL
        GROUP BY lang, predicted_lang
    """,
    description="language-ID confusion matrix: (true, predicted) doc "
    "counts with integer ppm share of each true language — the "
    "evaluation that shows which language pairs confuse before a "
    "mixture routes on the prediction; reuses the classifier's oracle "
    "SQL as a CTE so the eval can never drift from the classifier",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = langid_trigram_df(load(spark, sf_dir, "documents")).where(
        F.col("lang").isNotNull()
    )
    cell = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = W.partitionBy("lang")
    return cell.select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.expr("n_docs * 1000000").cast("long").alias("_num"),
        F.sum("n_docs").over(total).alias("_den"),
    ).select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.expr("_num div _den").alias("share_ppm"),
    )
