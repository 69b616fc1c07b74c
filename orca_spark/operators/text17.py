"""Lexical structure diagnostics: entropy rate and shared-prefix
boilerplate detection.

* ``text_ngram_entropy_rate`` — per-language unigram entropy H1,
  bigram entropy H2, and the conditional entropy rate H2 - H1 =
  H(w2 | w1), in nats. The information-theoretic companion to the
  Zipf fit (text13.py): natural language sits around 6-9 nats H1 with
  a conditional rate well below it (context predicts); templated or
  shuffled text shows a rate close to H1 (context predicts nothing),
  and degenerate repetition collapses both. Used to rank sources for
  "actually prose?" before expensive model-based scoring.
* ``text_prefix_boilerplate`` — shared leading-token prefixes: groups
  of documents opening with the same first {K} tokens, with document
  and source counts. The CCNet/C4-style header detector — crawled
  corpora are full of licence headers, cookie banners, and template
  openings that exact-dedup misses because the BODIES differ; a
  prefix shared by many docs across sources is the boilerplate to
  strip, and this manifest is the strip list.

Determinism: entropies are sums of p*ln(p) terms over exact
BIGINT-count-derived probabilities (identical doubles per term, final
sums rounded — the KL/JSD contract); the boilerplate surface is all
integer counts over exact string keys.

Scale: both aggregate the one corpus scan to vocabulary-sized (or
prefix-key-sized) tables with map-side combining before anything
joins; nothing is ever pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_K = 5  # prefix length (tokens)
_MIN_DOCS = 3  # prefixes shared by fewer docs are not boilerplate


@register(
    "text_ngram_entropy_rate",
    oracle="""
        WITH tk AS (
            SELECT lang, list_filter(string_split(text, ' '),
                                     t -> t <> '') AS t
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        uni AS (
            SELECT lang, unnest(t) AS w FROM tk
        ),
        uc AS (
            SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM uni GROUP BY lang, w
        ),
        un AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM uc GROUP BY lang),
        h1 AS (
            SELECT uc.lang,
                   sum(-(uc.c * 1.0 / un.n) * ln(uc.c * 1.0 / un.n)) AS h
            FROM uc JOIN un USING (lang) GROUP BY uc.lang
        ),
        bi AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1])) AS g
            FROM tk WHERE len(t) >= 2
        ),
        bc AS (
            SELECT lang, g, CAST(count(*) AS BIGINT) AS c
            FROM bi GROUP BY lang, g
        ),
        bn AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM bc GROUP BY lang),
        h2 AS (
            SELECT bc.lang,
                   sum(-(bc.c * 1.0 / bn.n) * ln(bc.c * 1.0 / bn.n)) AS h
            FROM bc JOIN bn USING (lang) GROUP BY bc.lang
        )
        SELECT h1.lang,
               round(h1.h, 4) AS h1_nats,
               round(h2.h, 4) AS h2_nats,
               round(h2.h - h1.h, 4) AS cond_entropy_nats
        FROM h1 JOIN h2 USING (lang)
    """,
    description="per-language unigram entropy, bigram entropy, and the "
    "conditional entropy rate H(w2|w1) = H2 - H1 in nats: the "
    "information-theoretic prose detector (natural text's context "
    "predicts, so the rate sits well below H1; templated/shuffled "
    "text's doesn't) ranking sources before model-based scoring; "
    "per-term values derive from exact BIGINT counts, final sums "
    "rounded — the KL/JSD contract; languages with no bigrams are "
    "omitted by the inner join",
)
def text_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tk = docs.select(
        "lang",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("t"),
    )

    def entropy(counts: DataFrame) -> DataFrame:
        n = counts.groupBy("lang").agg(F.sum("c").alias("n"))
        p = F.col("c") / F.col("n")
        return (
            counts.join(F.broadcast(n), "lang")
            .groupBy("lang")
            .agg(F.sum(-p * F.log(p)).alias("h"))
        )

    uc = (
        tk.select("lang", F.explode("t").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("t", i), F.element_at("t", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bc = (
        tk.select("lang", F.explode(bigrams).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h1 = entropy(uc).withColumnRenamed("h", "ha")
    h2 = entropy(bc).withColumnRenamed("h", "hb")
    return h1.join(h2, "lang").select(
        "lang",
        F.round("ha", 4).alias("h1_nats"),
        F.round("hb", 4).alias("h2_nats"),
        F.round(F.col("hb") - F.col("ha"), 4).alias("cond_entropy_nats"),
    )


@register(
    "text_prefix_boilerplate",
    oracle=f"""
        WITH pre AS (
            SELECT doc_id, source,
                   array_to_string(
                       list_filter(string_split(text, ' '),
                                   t -> t <> '')[1:{_K}], ' ') AS prefix
            FROM documents
            WHERE text IS NOT NULL
        )
        SELECT prefix,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM pre
        WHERE prefix <> ''
        GROUP BY prefix
        HAVING count(*) >= {_MIN_DOCS}
    """,
    description=f"shared leading-{_K}-token prefixes held by >= "
    f"{_MIN_DOCS} documents, with doc and distinct-source counts: the "
    "header/cookie-banner/template-opening detector exact dedup misses "
    "because bodies differ — the returned manifest is the strip list a "
    "boilerplate-removal pass consumes; one prefix-keyed aggregation "
    "over exact string keys, all counts BIGINT",
)
def text_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    prefix = F.concat_ws(
        " ",
        F.slice(
            F.filter(F.split("text", " "), lambda t: t != F.lit("")),
            1,
            _K,
        ),
    )
    return (
        docs.select(prefix.alias("prefix"), "source")
        .where(F.col("prefix") != "")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .where(F.col("n_docs") >= _MIN_DOCS)
    )
