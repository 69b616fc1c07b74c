"""Experiment statistics and content-routing signals.

* ``events_ab_welch_t`` — Welch's unequal-variance t statistic between
  every pair of event types' value distributions: the A/B-test
  primitive (does 'click' carry a different value distribution than
  'view'?), reported with both sample sizes and the degrees-of-freedom
  estimate so a consumer can threshold however their test prescribes.
  The engine reports the STATISTIC, deterministically — decision
  thresholds are the caller's policy.
* ``dedup_cross_lingual_exact`` — texts appearing under MORE THAN ONE
  language label: byte-identical content with conflicting lang tags is
  either mislabeled (fix the labels) or untranslated boilerplate
  (dedup it across languages) — the cross-lingual contamination
  manifest monolingual dedup never sees, keyed by the text itself.
* ``text_code_score`` — rule-based code-vs-prose routing: symbol
  density (braces/semicolons/operators) and digit density per
  document, with the is-code-like flag decided by integer
  cross-multiplication. The router that sends documents to a code
  tokenizer vs the prose quality stack.

Determinism: Welch terms derive from count/sum/sum-of-squares over
the raw value column — float sums, so every derived statistic is
rounded at the surface (the stats-family contract); the cross-lingual
manifest is exact strings and BIGINT counts with a sorted-list lang
surface; code scores are BIGINT regex counts with exact-rational
flags.

Scale: all three are single-scan map-side-combinable aggregations;
the Welch pair join runs on |types|² over a |types|-row moment table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_SYM_RE = "[{};()=<>\\[\\]|&+*/%#]"
_DIG_RE = "[0-9]"
# is_code_like when symbols * DEN >= chars * NUM  (symbol share >= 5%)
_CODE_NUM = 1
_CODE_DEN = 20


@register(
    "events_ab_welch_t",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(value) AS s,
                   sum(value * value) AS ss
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.n AS na, b.n AS nb,
                   a.s / a.n AS ma, b.s / b.n AS mb,
                   (a.ss - a.s * a.s / a.n) / (a.n - 1) AS va,
                   (b.ss - b.s * b.s / b.n) / (b.n - 1) AS vb
            FROM m a JOIN m b ON a.event_type < b.event_type
            WHERE a.n >= 2 AND b.n >= 2
        )
        SELECT type_a, type_b, na, nb,
               round((ma - mb)
                     / nullif(sqrt(va / na + vb / nb), 0), 4) AS welch_t,
               round(pow(va / na + vb / nb, 2)
                     / nullif(pow(va / na, 2) / (na - 1)
                              + pow(vb / nb, 2) / (nb - 1), 0), 4) AS dof
        FROM pairs
    """,
    description="Welch's unequal-variance t statistic (and "
    "Welch-Satterthwaite degrees of freedom) between every event-type "
    "pair's value distribution: the A/B-test primitive, reported as a "
    "statistic with sample sizes so thresholds stay caller policy; "
    "moments are one map-side-combinable pass, the pair join runs on "
    "the |types|-row moment table, float-derived outputs rounded at "
    "the surface",
)
def events_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    a = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        (F.col("s") / F.col("n")).alias("ma"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("va"),
    )
    b = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        (F.col("s") / F.col("n")).alias("mb"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dof = F.pow(se2, 2) / F.nullif(
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1),
        F.lit(0.0),
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .where((F.col("na") >= 2) & (F.col("nb") >= 2))
        .select(
            "type_a",
            "type_b",
            "na",
            "nb",
            F.round(
                (F.col("ma") - F.col("mb")) / F.nullif(F.sqrt(se2), F.lit(0.0)),
                4,
            ).alias("welch_t"),
            F.round(dof, 4).alias("dof"),
        )
    )


@register(
    "dedup_cross_lingual_exact",
    oracle="""
        SELECT text,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL
        GROUP BY text
        HAVING count(DISTINCT lang) >= 2
    """,
    description="byte-identical texts carrying MORE THAN ONE language "
    "label, with the sorted label list and doc count: the cross-lingual "
    "contamination manifest (mislabeled docs or untranslated "
    "boilerplate) that per-language dedup never sees; one text-keyed "
    "aggregation, exact strings and BIGINT counts, lang list sorted so "
    "the surface is order-free",
)
def dedup_cross_lingual_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    return (
        docs.groupBy("text")
        .agg(
            F.countDistinct("lang").alias("n_langs"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias(
                "langs"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_langs") >= 2)
    )


@register(
    "text_code_score",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_exact,
                   CAST(len(regexp_extract_all(text, '{_SYM_RE}'))
                        AS BIGINT) AS n_symbols,
                   CAST(len(regexp_extract_all(text, '{_DIG_RE}'))
                        AS BIGINT) AS n_digits
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
              AND length(text) > 0
        )
        SELECT doc_id, n_symbols, n_digits,
               round(n_symbols * 100.0 / n_chars_exact, 4) AS symbol_pct,
               n_symbols * {_CODE_DEN} >= n_chars_exact * {_CODE_NUM}
                   AS is_code_like
        FROM scored
    """,
    description="rule-based code-vs-prose router: per-document symbol "
    f"({_SYM_RE}) and digit counts with the is-code-like flag decided "
    f"by integer cross-multiplication (symbol share >= "
    f"{_CODE_NUM}/{_CODE_DEN}) — the gate that sends documents to a "
    "code tokenizer instead of the prose quality stack; one narrow "
    "regex map, BIGINT counts, percentage rounded at the surface",
)
def text_code_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("doc_id").isNotNull()
        & (F.length("text") > 0)
    )
    n_chars = F.length("text").cast("long")
    n_sym = F.regexp_count("text", F.lit(_SYM_RE)).cast("long")
    n_dig = F.regexp_count("text", F.lit(_DIG_RE)).cast("long")
    return docs.select(
        "doc_id",
        n_sym.alias("n_symbols"),
        n_dig.alias("n_digits"),
        F.round(n_sym * F.lit(100.0) / n_chars, 4).alias("symbol_pct"),
        (n_sym * _CODE_DEN >= n_chars * _CODE_NUM).alias("is_code_like"),
    )
