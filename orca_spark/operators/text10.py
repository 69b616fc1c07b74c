"""Positional phrase search over the document corpus.

A positional inverted index probe: find the corpus's single most
frequent bigram (the "phrase", chosen with a fully deterministic
integer tiebreak) and return every document containing it with its
occurrence count. The two halves are the two classic index structures:
the phrase-frequency table (a bigram index) and the per-document
positional match (a positional postings scan).

Tokenization is the engine-wide whitespace convention (text.py).
Reference parity: the reference (core.clj) has no text surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "text_phrase_topbigram_docs",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents WHERE text IS NOT NULL
        ),
        big AS (
            SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        top AS (
            SELECT w1, w2 FROM big
            GROUP BY w1, w2
            ORDER BY count(*) DESC, w1, w2
            LIMIT 1
        )
        SELECT big.doc_id, big.w1, big.w2,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM big JOIN top ON big.w1 = top.w1 AND big.w2 = top.w2
        GROUP BY big.doc_id, big.w1, big.w2
    """,
    description="positional phrase search: the corpus's most frequent "
    "bigram (integer count, lexicographic tiebreak) probed back into "
    "the positional index — every containing document with its "
    "occurrence count; the one-row phrase table broadcasts",
)
def text_phrase_topbigram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the bigram stream is built once (posexplode + doc-local
    pos+1 self-join, the text_bigram_logprob shape); the argmax phrase
    is a one-row top-k (TakeOrderedAndProject, never a global sort)
    that broadcasts back over the stream, so the probe is a broadcast
    semi-filter — the corpus is scanned, never shuffled, for the
    match. Occurrence counts partial-aggregate on doc_id.

    Determinism: counts and the (count desc, w1, w2) tiebreak are pure
    integer/string comparisons — no floats anywhere."""
    tok = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    )
    big = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
        )
    )
    top = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
    )
    return (
        big.join(F.broadcast(top), ["w1", "w2"])
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select("doc_id", "w1", "w2", "n_occurrences")
    )
