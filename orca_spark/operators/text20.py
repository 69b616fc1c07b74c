"""Corpus quality batch 20: the C4 cleaning rules (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", §2.2 — the published filter set that produced C4 from
Common Crawl), adapted to a page-level integer scorecard.

The published rules: keep only text ending in terminal punctuation,
drop pages with fewer than 3 sentences, drop lines with fewer than 5
words (page-level here: mean words-per-sentence >= 5, in centi-words
so it stays integer), drop any page containing "lorem ipsum", a curly
brace ``{`` (code markers), or the word "javascript" (script-warning
boilerplate). Each signal is surfaced as its own column plus the
composed ``keep`` flag, so downstream curation can re-weight rules
instead of re-scanning.

Note on this corpus: the synthetic documents table is
punctuation-free word soup, so the sentence-derived columns are
degenerate there (1 "sentence", keep = false) — the discriminating
behavior is pinned by planted punctuation-rich fixtures in
tests/test_r08_ops.py and the nasty-corpus harness; on real web text
every column varies.

Determinism: pure per-row string ops and integer arithmetic — counts,
contains, centi-word ratios via integer division. No floats anywhere.

Scale: shuffle-free row-local map; scan-bound at 100 TB, which is the
floor. The regex sentence split stays inside codegen (no Python).

Reference parity: core.clj has no text surface (SURVEY §2.5);
LLM-pipeline extension alongside text19 (Gopher rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_MIN_SENTENCES = 3
_MIN_WPS_CENTI = 500  # mean words per sentence >= 5.00


@register(
    "text_c4_filter_rules",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS BIGINT) AS n_words,
                   CAST(len(list_filter(
                            string_split_regex(text, '[.!?]'),
                            s -> trim(s) <> '')) AS BIGINT) AS n_sentences,
                   (rtrim(text) LIKE '%.' OR rtrim(text) LIKE '%!'
                    OR rtrim(text) LIKE '%?') AS ends_terminal,
                   contains(text, '{{') AS has_brace,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(lower(text), 'javascript') AS has_javascript
            FROM documents WHERE text IS NOT NULL
        )
        SELECT *,
               CAST(CASE WHEN n_sentences = 0 THEN 0
                    ELSE n_words * 100 // n_sentences END AS BIGINT)
                   AS wps_centi,
               (ends_terminal
                AND n_sentences >= {_MIN_SENTENCES}
                AND CASE WHEN n_sentences = 0 THEN 0
                    ELSE n_words * 100 // n_sentences END
                    >= {_MIN_WPS_CENTI}
                AND NOT has_brace AND NOT has_lorem
                AND NOT has_javascript) AS keep
        FROM m
    """,
    description="the published C4 cleaning rules (Raffel et al. 2020 "
    "§2.2) as a page-level integer scorecard: terminal-punctuation "
    "ending, sentence count >= 3, mean words-per-sentence (centi-words) "
    ">= 5, and the lorem-ipsum / curly-brace / javascript content "
    "flags, plus the composed keep flag — shuffle-free row-local map, "
    "all-integer arithmetic",
)
def text_c4_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    m = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_words"),
        F.size(
            F.filter(
                F.split("text", r"[.!?]"), lambda s: F.trim(s) != F.lit("")
            )
        )
        .cast("long")
        .alias("n_sentences"),
        (
            F.rtrim(F.col("text")).like("%.")
            | F.rtrim(F.col("text")).like("%!")
            | F.rtrim(F.col("text")).like("%?")
        ).alias("ends_terminal"),
        F.col("text").contains("{").alias("has_brace"),
        F.lower("text").contains("lorem ipsum").alias("has_lorem"),
        F.lower("text").contains("javascript").alias("has_javascript"),
    )
    wps = F.when(F.col("n_sentences") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("n_words * 100 div n_sentences")
    )
    return m.withColumn("wps_centi", wps).withColumn(
        "keep",
        F.col("ends_terminal")
        & (F.col("n_sentences") >= _MIN_SENTENCES)
        & (F.col("wps_centi") >= _MIN_WPS_CENTI)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
        & ~F.col("has_javascript"),
    )
