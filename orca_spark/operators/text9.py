"""Statistical language-model scoring over the document corpus.

Two corpus-trained signals a pretraining pipeline runs at ingest:

* ``text_bigram_logprob`` — per-document mean log-probability under an
  add-1-smoothed bigram LM trained on the corpus itself: the classic
  cheap perplexity proxy for quality filtering (gibberish and
  boilerplate score far from the corpus mode). Extends the unigram
  form (``text_unigram_logprob``) with one token of context.
* ``text_pmi_pairs`` — pointwise mutual information of term pairs
  co-occurring within documents: collocation mining / phrase
  induction over document-level co-occurrence counts.

Tokenization is the engine-wide whitespace convention (text.py).
Reference parity: the reference (core.clj) has no text surface; these
are LLM-pipeline extensions graded as engine components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

# PMI co-occurrence support floors (absolute, integer — the filters
# must be exact on both engines at every corpus size)
_PMI_MIN_DF = 2  # a term must appear in >= 2 documents
_PMI_MIN_PAIR = 2  # a pair must co-occur in >= 2 documents


@register(
    "text_bigram_logprob",
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
        c12 AS (
            SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1
        ),
        v AS (SELECT count(DISTINCT w) AS vocab FROM tok)
        SELECT big.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln((c12.c12 + 1) / (c1.c1 + v.vocab))), 4)
                   AS avg_logprob
        FROM big
        JOIN c12 ON big.w1 = c12.w1 AND big.w2 = c12.w2
        JOIN c1  ON big.w1 = c1.w1
        CROSS JOIN v
        GROUP BY big.doc_id
    """,
    description="per-document mean log-probability under an "
    "add-1-smoothed corpus-trained bigram LM (perplexity-proxy quality "
    "signal); counts shuffle on (w1,w2) with map-side partial "
    "aggregation, scoring is a vocab-keyed join back onto the bigram "
    "stream",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the bigram count table is vocab²-bounded (in practice far
    smaller — observed bigrams only) and aggregates with map-side
    combine before its (w1, w2) shuffle; the per-document average is
    one shuffle on doc_id. The scoring joins key on w1 / (w1, w2) —
    Zipf-skewed, so the AQE skew-join split (enabled session-wide) is
    the escape when a stopword bigram floods one reducer. The vocab
    size is a one-row broadcast (scalar subquery → literal).

    Determinism: c12/c1/V are exact integers computed from the same
    tokenization on both engines; ln() of an identical double is
    bit-identical; only the per-document MEAN's addition order is
    engine-specific, so it is rounded (4) on both sides — the
    engine-wide float-aggregate convention.

    Bigrams via posexplode + a pos+1 self-join rather than array
    slicing: identical shape to the oracle's generate_subscripts join,
    and the join is doc_id-local (one shuffle both sides share).

    The bigram stream feeds two passes (count training, then scoring);
    at a real corpus, persist() it — here the plan recomputes it once,
    the declarative form Catalyst can still pipeline at tiny SF.
    Context counts c1 roll up from the aggregated c12 table (Σ_w2),
    never from a third corpus scan."""
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
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context counts derived from the ALREADY-AGGREGATED bigram table
    # (Σ_w2 c12), not a third scan of the corpus-sized bigram stream —
    # the rollup is vocab-sized
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = tok.agg(F.countDistinct("w").alias("vocab"))
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("vocab"))).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )


@register(
    "text_pmi_pairs",
    oracle=f"""
        WITH dt AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL
        ),
        df AS (
            SELECT w, count(*) AS df FROM dt GROUP BY w
            HAVING count(*) >= {_PMI_MIN_DF}
        ),
        ft AS (SELECT dt.doc_id, dt.w FROM dt JOIN df ON dt.w = df.w),
        n AS (
            SELECT count(DISTINCT doc_id) AS n_docs
            FROM documents WHERE text IS NOT NULL
        ),
        pairs AS (
            SELECT a.w AS w1, b.w AS w2, count(*) AS c12
            FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
            GROUP BY a.w, b.w
            HAVING count(*) >= {_PMI_MIN_PAIR}
        )
        SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
               round(ln((p.c12 * n.n_docs) / (d1.df * d2.df)), 4) AS pmi
        FROM pairs p
        JOIN df d1 ON p.w1 = d1.w
        JOIN df d2 ON p.w2 = d2.w
        CROSS JOIN n
    """,
    description="document-level PMI collocations: distinct doc-term "
    "pairs, df floor, within-doc self-join (w1 < w2), "
    "ln(c12*N/(df1*df2)) — phrase-induction / collocation mining over "
    "co-occurrence counts",
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the within-document self-join is the quadratic hazard;
    it runs AFTER the document-frequency floor, so per-document width
    is bounded by the frequent vocabulary actually present (at a real
    corpus, raise _PMI_MIN_DF or cap per-document distinct terms —
    both are one-line filters on `ft`). The join is doc_id-keyed (one
    shared shuffle); pair counts partial-aggregate map-side. The df
    side of the scoring joins is vocab-sized.

    Determinism: all counts are integers from identical tokenization;
    the PMI expression is a single ln of one double division computed
    from identical integers — bit-equal on both engines — and rounded
    (4) for display only. The support floors are integer HAVING
    clauses, so no float threshold can flip membership."""
    dt = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
        # GLOBAL distinct, matching the oracle's SELECT DISTINCT: the
        # per-row array_distinct dedupes within one document row, but a
        # corpus carrying duplicate doc_id rows would double-count df
        # and pair co-occurrence without this
        .distinct()
    )
    df_tbl = (
        dt.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _PMI_MIN_DF)
    )
    ft = dt.join(df_tbl.select("w"), "w")
    n_docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    pairs = (
        ft.alias("a")
        .join(
            ft.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= _PMI_MIN_PAIR)
    )
    return (
        pairs.join(df_tbl.select(F.col("w").alias("w1"), F.col("df").alias("df1")), "w1")
        .join(df_tbl.select(F.col("w").alias("w2"), F.col("df").alias("df2")), "w2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log((F.col("c12") * F.col("n_docs")) / (F.col("df1") * F.col("df2"))),
                4,
            ).alias("pmi"),
        )
    )
