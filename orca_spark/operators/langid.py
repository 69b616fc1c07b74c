"""Character-n-gram language identification (Cavnar–Trenkle).

The classic rank-profile method (Cavnar & Trenkle, "N-Gram-Based Text
Categorization", SDAIR 1994): a language's profile is its top-N
character trigrams ranked by frequency; a document is scored against
each profile by the OUT-OF-PLACE measure — for each trigram in the
document's own ranked profile, the absolute rank difference in the
language profile (a fixed penalty when absent) — and classified to the
minimum-distance language.

Two properties make it the right fit here:

* It is the published n-gram language-ID heuristic (no model files, no
  external deps), trained from the corpus itself — the labeled ``lang``
  column provides the training counts, and self-classification accuracy
  is a measurable quality signal.
* The distance is PURE INTEGER arithmetic (rank differences), so the
  classification is bit-deterministic across engines — unlike log-prob
  scoring, where cross-engine summation order could flip an argmax
  between two close languages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load, widen

_PROFILE_N = 300  # profile size; also the out-of-profile penalty


def _trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, tri) — one row per character-trigram occurrence.
    The explode fans out ~len(text) rows per doc and is aggregated
    immediately by every consumer; docs too short for a trigram are
    excluded by contract (nothing to classify on)."""
    # the documents parquet arrives as ONE split at test scale and the
    # ~len(text)x explode+substring fan-out is the dense per-row compute
    # feeding the (doc_id, lang, tri) partial aggregation — run it wide
    # (measured 2.05 s in ONE task of the checkpoint job at sf0.1 while
    # 31 cores idled); widen() is a no-op once the scan has >= core
    # splits, so the shape is scale-invariant
    return (
        widen(docs.where(F.col("text").isNotNull() & (F.length("text") >= 3)))
        .select("doc_id", "lang", F.lower("text").alias("t"))
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
            "t",
        )
        .select("doc_id", "lang", F.expr("substring(t, i, 3)").alias("tri"))
    )


def langid_trigram_df(docs: DataFrame, n: int = _PROFILE_N) -> DataFrame:
    """Classify each doc: (doc_id, lang, predicted_lang, oop_distance,
    correct).

    Candidate languages come from the SAME filtered frame the profiles
    train on (non-null text long enough for a trigram) and exclude a
    NULL label: a lang value carried only by unclassifiable docs has an
    empty (all-penalty) profile and would win ties purely by sort
    order — and NULL sorts differently across engines, so it must
    never enter the tiebreak at all. Docs with a NULL label but valid
    text are still classified (their ``correct`` is NULL)."""
    tri = _trigrams(docs)

    # ONE pass over the exploded trigrams: the per-doc counts are the
    # finest grain, and both the language profiles (sum of per-doc
    # counts) and the candidate list derive from them — left as three
    # independent consumers of `tri`, each re-ran the ~len(text)-per-doc
    # explode+substring fan-out from the scan. Materialized via
    # localCheckpoint: corpus-linear skinny rows, recomputed per
    # invocation.
    doc_counts = (
        tri.groupBy("doc_id", "lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )

    lang_counts = doc_counts.groupBy("lang", "tri").agg(
        F.sum("c").alias("c")
    )
    lw = W.partitionBy("lang").orderBy(F.col("c").desc(), "tri")
    lang_prof = (
        lang_counts.withColumn("lrank", F.row_number().over(lw))
        .where(F.col("lrank") <= n)
        .select(F.col("lang").alias("cand_lang"), "tri", "lrank")
    )

    dw = W.partitionBy("doc_id").orderBy(F.col("c").desc(), "tri")
    doc_prof = (
        doc_counts.withColumn("drank", F.row_number().over(dw))
        .where(F.col("drank") <= n)
        .select("doc_id", "lang", "tri", "drank")
    )

    # candidates from the same aggregated frame (one source of truth
    # with the profile training filter — a re-stated doc filter here
    # could silently drift from _trigrams' eligibility rule)
    langs = (
        doc_counts.where(F.col("lang").isNotNull())
        .select(F.col("lang").alias("cand_lang"))
        .distinct()
    )
    # score every (doc, candidate lang): both the candidate-language list
    # and the rank profiles are |langs|-bounded — broadcast, so the only
    # event-scale shuffle left is the per-doc distance aggregation
    scored = (
        doc_prof.join(F.broadcast(langs))
        .join(F.broadcast(lang_prof), ["cand_lang", "tri"], "left")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(
            F.sum(
                F.coalesce(F.abs(F.col("drank") - F.col("lrank")), F.lit(n))
            ).alias("oop")
        )
    )
    best = W.partitionBy("doc_id").orderBy(F.col("oop").asc(), "cand_lang")
    return (
        scored.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand_lang").alias("predicted_lang"),
            F.col("oop").alias("oop_distance"),
            (F.col("cand_lang") == F.col("lang")).alias("correct"),
        )
    )


_LANGID_SQL = f"""
        WITH base AS (
            SELECT doc_id, lang, lower(text) AS t
            FROM documents WHERE text IS NOT NULL AND length(text) >= 3
        ),
        pos AS (
            SELECT doc_id, lang, t,
                   unnest(generate_series(1, length(t) - 2)) AS i
            FROM base
        ),
        tri AS (SELECT doc_id, lang, substr(t, i, 3) AS tri FROM pos),
        lc AS (SELECT lang, tri, count(*) AS c FROM tri GROUP BY lang, tri),
        lp AS (
            SELECT lang AS cand_lang, tri, lrank FROM (
                SELECT lang, tri,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY c DESC, tri) AS lrank
                FROM lc
            ) WHERE lrank <= {_PROFILE_N}
        ),
        dc AS (SELECT doc_id, lang, tri, count(*) AS c
               FROM tri GROUP BY doc_id, lang, tri),
        dp AS (
            SELECT doc_id, lang, tri, drank FROM (
                SELECT doc_id, lang, tri,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY c DESC, tri) AS drank
                FROM dc
            ) WHERE drank <= {_PROFILE_N}
        ),
        langs AS (SELECT DISTINCT lang AS cand_lang FROM base
                  WHERE lang IS NOT NULL),
        scored AS (
            SELECT dp.doc_id, dp.lang, l.cand_lang,
                   sum(coalesce(abs(dp.drank - lp.lrank),
                                {_PROFILE_N})) AS oop
            FROM dp CROSS JOIN langs l
            LEFT JOIN lp ON lp.cand_lang = l.cand_lang AND lp.tri = dp.tri
            GROUP BY dp.doc_id, dp.lang, l.cand_lang
        )
        SELECT doc_id, lang, cand_lang AS predicted_lang,
               CAST(oop AS BIGINT) AS oop_distance,
               cand_lang = lang AS correct
        FROM (
            SELECT doc_id, lang, cand_lang, oop,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY oop ASC, cand_lang) AS rn
            FROM scored
        ) WHERE rn = 1
    """


@register(
    "text_langid_trigram",
    oracle=_LANGID_SQL,
    description=f"Cavnar-Trenkle n-gram language ID: top-{_PROFILE_N} "
    "char-trigram rank profiles per language (trained from the labeled "
    "corpus), integer out-of-place distance per (doc, language), "
    "min-distance classification with accuracy flag — rank arithmetic "
    "keeps the argmax bit-deterministic across engines",
)
def text_langid_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the trigram explode is a ~len(text)× fan-out consumed
    immediately by partial-aggregated counts (the same shape as the
    engine's word-frequency family); language profiles are |langs|·N
    rows — broadcast into the scoring join, as is the distinct-language
    list — so scoring never shuffles the corpus side, and the per-doc
    distance aggregation + argmin window shuffle on doc_id once."""
    return langid_trigram_df(load(spark, sf_dir, "documents"))
