"""Corpus quality batch 19: Gopher-style rule filters and the
compression-ratio signal.

``text_gopher_quality_rules`` implements the published MassiveText /
Gopher document-quality heuristics (Rae et al. 2021, "Scaling Language
Models", appendix A1.1 — public paper): word-count bounds, mean word
length bounds, bullet-line and ellipsis-line fractions, symbol-to-word
ratio, and the minimum-stopword-hits rule, each surfaced as an exact
integer column plus the composed keep flag. These are THE standard
first-pass web-corpus filters; every signal here is integer arithmetic
(ppm fractions via integer division, mean word length in centi-chars)
so the scorecard is cross-engine hash-exact.

``text_compression_ratio`` is the complementary entropy-style signal
(low zlib ratio = boilerplate/repetition, near-1 ratio = high-entropy
noise — both ends are what quality pipelines cut). zlib at a fixed
level is bit-deterministic for a given input, but no SQL engine
exposes it, so this is a behavior-tested (rows-only) operator: an
Arrow-batched ``mapInPandas`` kernel — the UDF is the honest cost here
and it is the vectorized form, never per-row Python registered UDFs.

Scale: both are embarrassingly parallel row-local maps; the Gopher
scorecard never shuffles at all, the compression pass shuffles
nothing either (pure map). At 100 TB these are scan-bound, which is
the floor.

Reference parity: core.clj has no text surface (SURVEY §2.5);
LLM-pipeline extension alongside text2 (quality score) and text18
(boilerplate strip).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

# Gopher A1.1 thresholds (ppm where fractional)
_MIN_WORDS, _MAX_WORDS = 50, 100_000
_MIN_MWL_C, _MAX_MWL_C = 300, 1000  # mean word length in [3, 10] chars
_MAX_BULLET_PPM = 900_000  # <= 90% of lines bullet-started
_MAX_ELLIPSIS_PPM = 300_000  # <= 30% of lines ellipsis-ended
_MAX_HASH_PPM = 100_000  # '#' symbols <= 10% of words
_MIN_STOPWORD_HITS = 2
_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "text_gopher_quality_rules",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks,
                   string_split(text, chr(10)) AS lines
            FROM documents WHERE text IS NOT NULL
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(CASE WHEN len(toks) = 0 THEN 0
                        ELSE len(array_to_string(toks, '')) * 100 // len(toks)
                        END AS BIGINT) AS mean_word_len_c,
                   CAST(len(list_filter(lines,
                            l -> l LIKE '-%' OR l LIKE '*%'))
                        * 1000000 // len(lines) AS BIGINT) AS bullet_ppm,
                   CAST(len(list_filter(lines, l -> l LIKE '%...'))
                        * 1000000 // len(lines) AS BIGINT) AS ellipsis_ppm,
                   CAST(CASE WHEN len(toks) = 0 THEN 0
                        ELSE (len(array_to_string(toks, ''))
                              - len(replace(array_to_string(toks, ''), '#', '')))
                             * 1000000 // len(toks)
                        END AS BIGINT) AS hash_ppm,
                   CAST(len(list_intersect(toks,
                            [{", ".join(repr(s) for s in _STOPWORDS)}]))
                        AS BIGINT) AS n_stopword_hits
            FROM scored
        )
        SELECT *,
               (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                AND mean_word_len_c BETWEEN {_MIN_MWL_C} AND {_MAX_MWL_C}
                AND bullet_ppm <= {_MAX_BULLET_PPM}
                AND ellipsis_ppm <= {_MAX_ELLIPSIS_PPM}
                AND hash_ppm <= {_MAX_HASH_PPM}
                AND n_stopword_hits >= {_MIN_STOPWORD_HITS}) AS keep
        FROM m
    """,
    description="the published Gopher/MassiveText document-quality "
    "rules (Rae et al. 2021 A1.1) as an exact integer scorecard: word "
    "count, mean word length (centi-chars), bullet-started and "
    "ellipsis-ended line fractions (ppm), '#'-symbol-per-word ppm, "
    "stopword hits, and the composed keep flag — the standard web "
    "first-pass filter; all-integer arithmetic, shuffle-free row-local "
    "map",
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    lines = F.split("text", "\n")
    # tok_chars derives from the already-computed toks column in a
    # second select — tokenizing once per row, not twice (split+filter
    # dominates this scan-bound operator on web-scale docs)
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        lines.alias("lines"),
    ).withColumn("tok_chars", F.length(F.array_join(F.col("toks"), "")))
    m = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.size("lines").cast("long").alias("n_lines"),
        # every ppm/centi multiply is widened to BIGINT *before* the
        # multiply: size()/length() are INT, and INT * 1000000 overflows
        # (ANSI ARITHMETIC_OVERFLOW) past ~2147 qualifying lines / ~21M
        # chars — exactly the web-scale docs this filter exists for.
        F.when(F.size("toks") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("CAST(tok_chars AS BIGINT) * 100 div size(toks)"))
        .alias("mean_word_len_c"),
        F.expr(
            "CAST(size(filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) "
            "AS BIGINT) * 1000000 div size(lines)"
        )
        .cast("long")
        .alias("bullet_ppm"),
        F.expr(
            "CAST(size(filter(lines, l -> l LIKE '%...')) AS BIGINT) "
            "* 1000000 div size(lines)"
        )
        .cast("long")
        .alias("ellipsis_ppm"),
        F.when(F.size("toks") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(tok_chars - length(replace(concat_ws('', toks), '#', ''))"
                " AS BIGINT) * 1000000 div size(toks)"
            )
        )
        .alias("hash_ppm"),
        F.size(
            F.array_intersect("toks", F.array(*[F.lit(s) for s in _STOPWORDS]))
        )
        .cast("long")
        .alias("n_stopword_hits"),
    )
    return m.withColumn(
        "keep",
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & F.col("mean_word_len_c").between(_MIN_MWL_C, _MAX_MWL_C)
        & (F.col("bullet_ppm") <= _MAX_BULLET_PPM)
        & (F.col("ellipsis_ppm") <= _MAX_ELLIPSIS_PPM)
        & (F.col("hash_ppm") <= _MAX_HASH_PPM)
        & (F.col("n_stopword_hits") >= _MIN_STOPWORD_HITS),
    )


def _compress_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched zlib scoring kernel (module scope: picklable, and
    testable without Spark)."""
    import zlib

    for pdf in batches:
        raw = pdf["text"].str.encode("utf-8")
        raw_len = raw.str.len().astype("int64")
        comp_len = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "raw_bytes": raw_len,
                "zlib_bytes": comp_len,
                "ratio_ppm": comp_len * 1_000_000 // raw_len.clip(lower=1),
            }
        )


@register(
    "text_compression_ratio",
    # no oracle: zlib is not expressible in SQL — behavior-tested in
    # tests/test_r08_ops.py (repetition compresses, randomness doesn't,
    # determinism across runs) and rows-only checked by the driver
    description="zlib-6 compression ratio per document (ppm): the "
    "entropy-style quality signal — near-zero flags boilerplate/"
    "repetition, near-1e6 flags high-entropy noise, both standard cut "
    "ends in web-corpus curation; Arrow-batched mapInPandas (zlib is "
    "deterministic at a fixed level but not expressible in SQL, so "
    "this operator is behavior-tested rather than oracled), pure "
    "row-local map, zero shuffles",
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return docs.mapInPandas(
        _compress_batches,
        "doc_id bigint, raw_bytes bigint, zlib_bytes bigint, ratio_ppm bigint",
    )
