"""Term-weighting operators over the documents table: TF-IDF and BM25.

The reference has no text processing at all (it is an ORC encode/decode
library — ``/root/reference/src/orca/core.clj``); these extend the
LLM-data-pipeline surface with the two standard term-weighting schemes
a corpus pipeline needs — TF-IDF for per-document salient-term
extraction (quality filtering, topic tagging) and BM25 for scoring
documents against a query term set (retrieval-based decontamination,
targeted corpus slicing).

Scale shape (both): one explode over tokens, partial-aggregated counts
(map-side combine before the shuffle), the vocabulary-keyed document-
frequency table joined back on the term key, and scalar corpus
statistics (N, avgdl) as one-row broadcasts. No driver-side loops, no
Python in the hot path — every expression is codegen'd SQL. Ranking
happens on the ROUNDED score with a term tiebreak so ordering is
deterministic across engines (same device as similarity's top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_TOP_TERMS = 3
_BM25_K1 = 1.2
_BM25_B = 0.75
# query terms for the registered BM25 scoring (common corpus terms)
_BM25_QUERY = ("join", "hash", "scan")


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, w) pairs: whitespace tokens with empties dropped —
    consistent with the text.py family's space tokenizer, minus the
    empty tokens that double spaces produce (a term weight for ''
    is meaningless)."""
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )


def tfidf_terms_df(docs: DataFrame, top: int = _TOP_TERMS) -> DataFrame:
    """Top-``top`` TF-IDF terms per document.

    idf is the smoothed sklearn form ln((N+1)/(df+1)) + 1 — never
    negative, never divides by zero, and keeps corpus-wide terms at a
    small positive weight instead of exactly zero (which would make
    every such term tie at 0.0 and leave top-k selection to the
    tiebreak). The document-frequency table is vocabulary-sized: small
    enough to broadcast on most corpora, but left as an equi-join so
    AQE picks broadcast vs shuffle from actual stats — at 100 TB a
    web-scale vocabulary (1e8+ terms) must shuffle on the term key.
    """
    tok = _tokens(docs)
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= top)
        .select("doc_id", "term", "tfidf", "rank")
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM tok WHERE w <> '' GROUP BY 1, 2),
        dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM docs),
        scored AS (
            SELECT tf.doc_id, tf.w AS term,
                   round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS tfidf
            FROM tf JOIN dfreq USING (w) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, rank
        FROM (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term) AS rank
            FROM scored
        )
        WHERE rank <= {_TOP_TERMS}
    """,
    description=f"top-{_TOP_TERMS} TF-IDF terms per document (smoothed "
    "idf, rank on rounded score + term tiebreak): per-document salient "
    "terms for tagging/quality pipelines — one token explode, partial-"
    "agg counts, vocabulary-keyed df join, scalar N broadcast",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return tfidf_terms_df(docs)


def bm25_scores_df(
    docs: DataFrame,
    query_terms: tuple[str, ...] = _BM25_QUERY,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """BM25 score of every document against a fixed query term set.

    Robertson idf ln(1 + (N-df+0.5)/(df+0.5)); per-term contribution
    idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)). Document length is the
    non-empty token count; N/avgdl are one-row broadcast scalars; the
    per-term document frequency is a |query|-row broadcast. Only
    documents containing at least one query term appear (the retrieval
    contract) — a corpus with no matches yields an empty frame, not an
    error."""
    tok = _tokens(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tfq = (
        tok.where(F.col("w").isin(*query_terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tfq.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    idf = F.log(
        1.0
        + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tfq.join(dl, "doc_id")
        .join(F.broadcast(dfq), "w")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(contrib), 4).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )


@register(
    "text_bm25_query_scores",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        tok AS (
            SELECT doc_id, w
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs)
            WHERE w <> ''
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        tfq AS (
            SELECT doc_id, w, count(*) AS tf FROM tok
            WHERE w IN {str(tuple(_BM25_QUERY))}
            GROUP BY 1, 2
        ),
        dfq AS (SELECT w, count(*) AS df FROM tfq GROUP BY 1),
        n AS (SELECT count(*) AS n FROM docs),
        avgdl AS (SELECT avg(dl) AS avgdl FROM dl)
        SELECT tfq.doc_id,
               round(sum(
                   ln(1.0 + (n.n - dfq.df + 0.5) / (dfq.df + 0.5))
                   * tfq.tf * ({_BM25_K1} + 1.0)
                   / (tfq.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / avgdl.avgdl))
               ), 4) AS bm25,
               CAST(count(*) AS BIGINT) AS n_terms_matched
        FROM tfq
        JOIN dl ON dl.doc_id = tfq.doc_id
        JOIN dfq ON dfq.w = tfq.w
        CROSS JOIN n CROSS JOIN avgdl
        GROUP BY tfq.doc_id
    """,
    description=f"BM25 (k1={_BM25_K1}, b={_BM25_B}) of every document "
    f"against the query terms {_BM25_QUERY}: Robertson idf, length-"
    "normalized tf saturation — retrieval-grade scoring for targeted "
    "corpus slicing/decontamination; scalars (N, avgdl) and the "
    "query-sized df table ride as broadcasts",
)
def text_bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return bm25_scores_df(docs)


def unigram_logprob_df(docs: DataFrame) -> DataFrame:
    """Mean unigram log-probability per document — the standard
    perplexity-proxy quality score (docs whose tokens are improbable
    under the corpus unigram LM are boilerplate/garbled/off-language
    candidates; very high scores flag repetitive boilerplate).

    p(w) = count(w)/total over the whole corpus; score = mean over the
    document's token OCCURRENCES (repeats count) of ln p(w). Shape:
    token explode -> partial-agg term counts -> term-keyed join back ->
    one per-doc avg; corpus total rides as a one-row broadcast. Every
    token's probability is > 0 by construction (it was counted), so no
    smoothing is needed for scoring the training corpus itself; scoring
    NEW text against these counts needs the add-k variant."""
    tok = _tokens(docs)
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    return (
        tok.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c") / F.col("total"))), 4).alias(
                "avg_logprob"
            ),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


@register(
    "text_unigram_logprob",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        tok AS (
            SELECT doc_id, w
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs)
            WHERE w <> ''
        ),
        counts AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
        total AS (SELECT sum(c) AS total FROM counts)
        SELECT tok.doc_id,
               round(avg(ln(counts.c / total.total)), 4) AS avg_logprob,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM tok
        JOIN counts ON counts.w = tok.w
        CROSS JOIN total
        GROUP BY tok.doc_id
    """,
    description="mean unigram log-probability per document (corpus-fit "
    "LM, repeats counted): the perplexity-proxy quality filter — token "
    "explode, partial-agg term counts, term-keyed join, per-doc avg; "
    "corpus total as a one-row broadcast",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return unigram_logprob_df(docs)
