"""Corpus-health lexical statistics: hapax/TTR, source JSD, per-source
duplication rate, and sentence-shape profiles.

* ``text_hapax_ttr_by_lang`` — vocabulary size, token count, hapax
  count (tokens occurring exactly once), hapax ratio, and type-token
  ratio per language. The fastest lexical-diversity screen there is:
  natural corpora sit near 40-60% hapax share; far below means
  templated/duplicated mass, far above means tokenizer damage or OCR
  noise.
* ``source_unigram_jsd`` — pairwise Jensen-Shannon divergence (nats)
  between source unigram distributions: the SYMMETRIC companion to
  ``source_unigram_kl`` (text12.py), bounded by ln 2, defined even
  where vocabularies don't overlap — the input to "which sources are
  interchangeable" clustering when planning a training mixture.
* ``corpus_dedup_rate_by_source`` — per-source exact-duplicate share
  (docs minus distinct texts): the first number a curation run reports,
  and the cheap prior for ordering the expensive near-dup passes
  (a 40%-exact-dup source gets MinHash'd first).
* ``text_sentence_stats`` — per-language sentence counts (terminal-
  punctuation runs) and mean words-per-sentence: the C4-style
  structural quality signal distinguishing prose from listings/tables.

Determinism: all counts are BIGINT; ratios are rounded at the surface;
each JSD term is computed from exact integer counts and totals, so the
per-term doubles are bit-identical across engines and only the final
(order-dependent) sum is rounded — the same contract as the KL module.

Scale: every surface aggregates the one corpus scan down to
vocabulary- or source-sized tables before any join; the JSD pair join
is (source-pairs x vocab)-sized with per-source totals broadcast —
sources number in the dozens, never corpus-scale.

Reference parity: core.clj has no text surface; these are LLM-pipeline
extensions graded as engine components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_SENT_RE = "[.!?]+"


@register(
    "text_hapax_ttr_by_lang",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS w
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        counts AS (
            SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY lang, w
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count,
               round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS hapax_ratio,
               round(count(*) * 1.0 / sum(c), 4) AS ttr
        FROM counts GROUP BY lang
    """,
    description="per-language lexical diversity: vocabulary size, token "
    "count, hapax count/ratio (tokens seen exactly once), type-token "
    "ratio — the one-scan diversity screen (low hapax share flags "
    "templated mass, very high flags tokenizer/OCR damage); computed "
    "on the vocabulary-sized count table, counts BIGINT, ratios of "
    "exact integers rounded at the surface",
)
def text_hapax_ttr_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    counts = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("n_tokens"),
        hapax.alias("hapax_count"),
        F.round(hapax / F.count(F.lit(1)), 4).alias("hapax_ratio"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 4).alias("ttr"),
    )


@register(
    "source_unigram_jsd",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS w
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL
        ),
        st AS (
            SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY source, w
        ),
        totals AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n
            FROM st GROUP BY source
        ),
        pairs AS (
            SELECT a.source AS source_a, a.n AS na,
                   b.source AS source_b, b.n AS nb
            FROM totals a JOIN totals b ON a.source < b.source
        ),
        ja AS (
            SELECT p.source_a, p.source_b, s.w, s.c AS ca
            FROM pairs p JOIN st s ON s.source = p.source_a
        ),
        jb AS (
            SELECT p.source_a, p.source_b, s.w, s.c AS cb
            FROM pairs p JOIN st s ON s.source = p.source_b
        ),
        merged AS (
            SELECT COALESCE(ja.source_a, jb.source_a) AS source_a,
                   COALESCE(ja.source_b, jb.source_b) AS source_b,
                   COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
            FROM ja FULL JOIN jb
              ON ja.source_a = jb.source_a
             AND ja.source_b = jb.source_b
             AND ja.w = jb.w
        ),
        terms AS (
            SELECT m.source_a, m.source_b,
                   (CASE WHEN ca > 0 THEN
                        (ca * 1.0 / p.na)
                        * ln((ca * 1.0 / p.na)
                             / ((ca * 1.0 / p.na + cb * 1.0 / p.nb) / 2))
                    ELSE 0.0 END)
                 + (CASE WHEN cb > 0 THEN
                        (cb * 1.0 / p.nb)
                        * ln((cb * 1.0 / p.nb)
                             / ((ca * 1.0 / p.na + cb * 1.0 / p.nb) / 2))
                    ELSE 0.0 END) AS t
            FROM merged m
            JOIN pairs p USING (source_a, source_b)
        )
        SELECT source_a, source_b, round(0.5 * sum(t), 4) AS jsd_nats
        FROM terms GROUP BY source_a, source_b
    """,
    description="pairwise Jensen-Shannon divergence (nats, bounded by "
    "ln 2) between source unigram distributions: the symmetric, "
    "always-finite companion to source_unigram_kl, feeding "
    "which-sources-are-interchangeable mixture decisions; per-term "
    "values derive from exact BIGINT counts (bit-identical across "
    "engines), only the order-dependent final sum is rounded; the "
    "pair join is (source-pairs x vocab)-sized with broadcast totals",
)
def source_unigram_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    st = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = st.groupBy("source").agg(F.sum("c").alias("n"))
    pairs = (
        totals.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
        .join(
            totals.select(
                F.col("source").alias("source_b"), F.col("n").alias("nb")
            ),
            F.col("source_a") < F.col("source_b"),
        )
    )
    ja = pairs.select("source_a", "source_b").join(
        st.select(F.col("source").alias("source_a"), "w", F.col("c").alias("ca")),
        "source_a",
    )
    jb = pairs.select("source_a", "source_b").join(
        st.select(F.col("source").alias("source_b"), "w", F.col("c").alias("cb")),
        "source_b",
    )
    merged = (
        ja.join(jb, ["source_a", "source_b", "w"], "full_outer")
        .select(
            "source_a",
            "source_b",
            F.coalesce("ca", F.lit(0).cast("long")).alias("ca"),
            F.coalesce("cb", F.lit(0).cast("long")).alias("cb"),
        )
        .join(F.broadcast(pairs), ["source_a", "source_b"])
    )
    p = F.col("ca") / F.col("na")
    q = F.col("cb") / F.col("nb")
    mid = (p + q) / F.lit(2)
    term = F.when(F.col("ca") > 0, p * F.log(p / mid)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cb") > 0, q * F.log(q / mid)).otherwise(F.lit(0.0))
    return (
        merged.select("source_a", "source_b", term.alias("t"))
        .groupBy("source_a", "source_b")
        .agg(F.round(F.lit(0.5) * F.sum("t"), 4).alias("jsd_nats"))
    )


@register(
    "corpus_dedup_rate_by_source",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
               CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dups,
               round((count(*) - count(DISTINCT text)) * 100.0
                     / count(*), 4) AS dup_pct
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
        GROUP BY source
    """,
    description="per-source exact-duplicate share (docs minus distinct "
    "texts, as a percentage): the first number a curation run reports "
    "and the prior for ordering expensive near-dup passes; one "
    "source-keyed aggregation, counts BIGINT, percentage a ratio of "
    "exact integers rounded at the surface",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note: countDistinct over full text shuffles text values;
    at 100 TB swap the distinct key to xxhash64(text) (the engine's
    8-byte dedup key rule, dedup.py) — kept as the raw column here so
    the oracle comparison is hash-function-free."""
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    n = F.count(F.lit(1))
    u = F.countDistinct("text")
    return docs.groupBy("source").agg(
        n.alias("n_docs"),
        u.alias("n_unique"),
        (n - u).alias("n_dups"),
        F.round((n - u) * F.lit(100.0) / n, 4).alias("dup_pct"),
    )


@register(
    "text_sentence_stats",
    oracle=f"""
        WITH per_doc AS (
            SELECT lang,
                   len(regexp_extract_all(text, '{_SENT_RE}')) AS n_sent,
                   len(list_filter(string_split(text, ' '),
                                   t -> t <> '')) AS n_words
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_sent) AS BIGINT) AS n_sentences,
               CAST(sum(n_words) AS BIGINT) AS n_words,
               round(sum(n_sent) * 1.0 / count(*), 4) AS sents_per_doc,
               round(sum(n_words) * 1.0 / nullif(sum(n_sent), 0), 4)
                   AS words_per_sentence
        FROM per_doc GROUP BY lang
    """,
    description="per-language sentence-shape profile: sentence count "
    "(runs of terminal punctuation), word count, sentences per doc, "
    "mean words per sentence — the C4-style structural quality signal "
    "separating prose from listings/tables; regex counting is one "
    "narrow map before a lang-keyed aggregation, counts BIGINT, "
    "ratios rounded at the surface",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    per_doc = docs.select(
        "lang",
        F.regexp_count("text", F.lit(_SENT_RE)).alias("n_sent"),
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("n_words"),
    )
    ns = F.sum("n_sent")
    nw = F.sum("n_words")
    nd = F.count(F.lit(1))
    return per_doc.groupBy("lang").agg(
        nd.alias("n_docs"),
        ns.cast("long").alias("n_sentences"),
        nw.cast("long").alias("n_words"),
        F.round(ns / nd, 4).alias("sents_per_doc"),
        F.round(nw / F.nullif(ns, F.lit(0)), 4).alias("words_per_sentence"),
    )
