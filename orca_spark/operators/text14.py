"""Cross-source n-gram novelty: what each source uniquely contributes.

``source_ngram_novelty`` measures, per source, the share of its
distinct word trigrams that appear in NO other source — the
set-level complement of ``source_unigram_kl``'s distribution drift:
KL says a source's token mix is unusual, novelty says the source
contains material nobody else has. Together they drive the keep/
downsample call in mixture curation (high-novelty sources are
irreplaceable regardless of their KL; zero-novelty sources are pure
redundancy). Shares are integer parts-per-million over the source's
distinct-trigram vocabulary.

Scale: one gram explode → (gram, source) DISTINCT aggregation (the
heavy reduction, map-side combined on hashable gram keys), then a
gram-keyed count of contributing sources and one groupBy(source) —
every post-explode relation is gram-vocabulary-sized, never
corpus-sized, and nothing joins document pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_N = 3  # trigrams


@register(
    "source_ngram_novelty",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL
        ),
        grams AS (
            SELECT DISTINCT source,
                   array_to_string(list_slice(ts, i, i + {_N - 1}), ' ') AS g
            FROM toks, UNNEST(generate_series(1, len(ts) - {_N - 1})) AS t(i)
            WHERE len(ts) >= {_N}
        ),
        spread AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n_sources
            FROM grams GROUP BY g
        )
        SELECT gr.source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN sp.n_sources = 1 THEN 1 ELSE 0 END)
                    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        FROM grams gr JOIN spread sp USING (g)
        GROUP BY gr.source
    """,
    description=f"per-source {_N}-gram novelty: of each source's "
    "distinct word trigrams, the count and ppm share found in no other "
    "source — the set-level complement of source_unigram_kl (high "
    "novelty = irreplaceable material, zero = pure redundancy); one "
    "explode, gram-keyed distinct + source-spread counts, no pair "
    "joins, all-BIGINT output",
)
def source_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    toks = docs.select(
        "source",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("ts"),
    ).where(F.size("ts") >= _N)
    grams = (
        toks.select(
            "source",
            F.explode(F.expr(f"sequence(1, size(ts) - {_N - 1})")).alias("i"),
            "ts",
        )
        .select(
            "source",
            F.array_join(F.expr(f"slice(ts, i, {_N})"), " ").alias("g"),
        )
        .distinct()
    )
    spread = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n_sources"))
    return (
        grams.join(spread, "g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn("novelty_ppm", F.expr("n_novel * 1000000 div n_grams"))
    )
