"""Nucleus (top-p) vocabulary selection per language.

The token-frequency analog of nucleus sampling: per language, keep the
SMALLEST prefix of the frequency-sorted vocabulary whose cumulative
probability mass reaches ``p``. The result is the "core vocabulary"
that covers p of all token occurrences — the standard cut for
tokenizer-vocab sizing, stopword induction, and coverage dashboards
(cf. the fixed-count ``text_top_terms_per_lang``, which answers "top
5" rather than "how many terms cover half the corpus").

Tokenization is the engine-wide whitespace convention (text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_TOP_P_NUM = 1  # the nucleus threshold as an exact rational: 1/2
_TOP_P_DEN = 2


@register(
    "text_nucleus_vocab",
    oracle=f"""
        WITH tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE text IS NOT NULL
        ),
        freq AS (
            SELECT lang, word, count(*) AS freq
            FROM tok GROUP BY lang, word
        ),
        cum AS (
            SELECT lang, word, freq,
                   sum(freq) OVER (PARTITION BY lang) AS total,
                   sum(freq) OVER (
                       PARTITION BY lang ORDER BY freq DESC, word
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_freq
            FROM freq
        )
        SELECT lang, word, CAST(freq AS BIGINT) AS freq,
               round(freq / total, 6) AS prob,
               round(cum_freq / total, 6) AS cum_prob
        FROM cum
        WHERE (cum_freq - freq) * {_TOP_P_DEN} < total * {_TOP_P_NUM}
    """,
    description=f"nucleus (top-p={_TOP_P_NUM}/{_TOP_P_DEN}) vocabulary: "
    "per-lang token frequencies, frequency-sorted cumulative-mass "
    "window, keep the minimal prefix covering p of all occurrences — "
    "the coverage-based alternative to a fixed top-k term list",
)
def text_nucleus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the explode+count is the one heavy shuffle (partial-agged
    map-side, (lang, word) keys); the windows then run on the
    AGGREGATED vocabulary (|vocab| rows per lang, not token
    occurrences). Per-lang vocabulary outgrowing one partition is the
    window's pinch point; the two-pass partial/offset pattern
    (window_distribution_scalable) is the documented escape.

    Determinism: the nucleus filter is PURE INTEGER arithmetic —
    ``(cum_freq - freq) * den < total * num`` keeps a term iff the mass
    strictly before it is short of p (the minimal covering prefix,
    never empty) — so there is no floating cumulative sum whose
    engine-specific addition order could flip a strict-< boundary.
    The float columns are display-only single divisions of identical
    integers, bit-equal on both engines before rounding."""
    tok = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("lang", F.explode(F.split("text", " ")).alias("word"))
    )
    freq = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("freq"))
    per_lang = W.partitionBy("lang")
    order = (
        W.partitionBy("lang")
        .orderBy(F.col("freq").desc(), "word")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = freq.select(
        "lang",
        "word",
        "freq",
        F.sum("freq").over(per_lang).alias("total"),
        F.sum("freq").over(order).alias("cum_freq"),
    )
    return cum.where(
        (F.col("cum_freq") - F.col("freq")) * _TOP_P_DEN
        < F.col("total") * _TOP_P_NUM
    ).select(
        "lang",
        "word",
        "freq",
        F.round(F.col("freq") / F.col("total"), 6).alias("prob"),
        F.round(F.col("cum_freq") / F.col("total"), 6).alias("cum_prob"),
    )
