"""Count-preserving dedup: survivors that remember their multiplicity.

Plain dedup throws away a signal: HOW duplicated a document was. For
training-data work the duplicate count is the natural loss/sampling
weight (a doc that appeared 50 times earned its mass once, but the
fact that the web repeated it 50x is itself information), and for
forensics it is the boilerplate detector. ``dedup_survivors_weighted``
keeps one survivor per exact-content group together with its copy
count and the integer parts-per-million share of corpus mass the group
held — everything a reweighted training run or a duplication report
needs, in one pass.

Scale: identical shuffle shape to ``dedup_exact`` — group keys are
64-bit content hashes (xxhash64 Spark-side; the oracle groups on
md5(text), same equality classes), the shuffle carries (hash, count)
partials via map-side combine, never documents. The ppm share is
BIGINT truncating arithmetic against the total doc count (one scalar
subquery / broadcast join), so every column is cross-engine exact.

Reference parity: no reference counterpart (core.clj is ORC I/O);
§2.5 LLM-family extension alongside dedup.py (cited there at 41-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "dedup_survivors_weighted",
    oracle="""
        WITH groups AS (
            SELECT min(doc_id) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents WHERE text IS NOT NULL
            GROUP BY md5(text)
        ),
        total AS (
            SELECT CAST(count(*) AS BIGINT) AS n
            FROM documents WHERE text IS NOT NULL
        )
        SELECT g.doc_id, g.n_copies,
               g.n_copies * 1000000 // t.n AS mass_ppm
        FROM groups g, total t
    """,
    description="count-preserving exact dedup: one survivor (lowest "
    "doc_id) per content group with its duplicate count and integer "
    "parts-per-million share of corpus mass — the natural sampling/"
    "loss weight for a reweighted training run and the boilerplate "
    "mass report; same 8-byte-hash shuffle shape as dedup_exact, all "
    "columns BIGINT-exact",
)
def dedup_survivors_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    groups = docs.groupBy(F.xxhash64("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("n"))
    return groups.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_copies",
        F.expr("n_copies * 1000000 div n").alias("mass_ppm"),
    )
