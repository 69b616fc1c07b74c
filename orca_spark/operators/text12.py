"""Per-source distribution drift: unigram KL divergence from the corpus.

``source_unigram_kl`` scores each source by the Kullback-Leibler
divergence of its unigram token distribution from the whole-corpus
distribution — the standard domain-shift diagnostic for mixture
curation: a source with near-zero KL is redundant with the corpus
bulk; a high-KL source is the one contributing novel vocabulary (or
noise — the token count column distinguishes a small weird source
from a large divergent one). Because every source term is also a
corpus term, the divergence is finite by construction (no smoothing
needed):

    KL(src || corpus) = sum_t (c_st / C_s) * ln((c_st * C) / (C_s * c_t))

with c_st = count of token t in source s, C_s = source total, c_t =
corpus count, C = corpus total — all BIGINT; each term's log takes a
ratio of exact integer products, so per-term values are bit-identical
across engines and only the final sum is rounded.

Scale: one token explode → (source, token) count aggregation (map-side
combined), a token-keyed join of the per-source counts against the
corpus counts (both already aggregate-sized relative to the corpus),
and a |sources|-row result. The corpus is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "source_unigram_kl",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS w
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL
        ),
        st AS (
            SELECT source, w, CAST(count(*) AS BIGINT) AS c_st
            FROM tok GROUP BY source, w
        ),
        ct AS (SELECT w, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY w),
        totals AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS c_s FROM st GROUP BY source),
        corpus AS (SELECT CAST(sum(c_t) AS BIGINT) AS c FROM ct)
        SELECT s.source,
               t.c_s AS n_tokens,
               round(sum((s.c_st * 1.0 / t.c_s)
                         * ln((s.c_st * corpus.c) * 1.0 / (t.c_s * ct.c_t))), 4)
                   AS kl_nats
        FROM st s
        JOIN ct USING (w)
        JOIN totals t USING (source)
        CROSS JOIN corpus
        GROUP BY s.source, t.c_s
    """,
    description="per-source unigram KL divergence from the corpus "
    "distribution (nats): the domain-shift score behind mixture "
    "curation — near-zero = redundant with the bulk, high = novel "
    "vocabulary; finite without smoothing since source vocab is a "
    "subset of corpus vocab, each log term a ratio of exact BIGINT "
    "products, final sum rounded at the surface",
)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    st = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_st"))
    ct = st.groupBy("w").agg(F.sum("c_st").alias("c_t"))
    totals = st.groupBy("source").agg(F.sum("c_st").alias("c_s"))
    corpus = ct.agg(F.sum("c_t").alias("c"))
    return (
        st.join(ct, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(corpus))
        .groupBy("source", F.col("c_s").alias("n_tokens"))
        .agg(
            F.round(
                F.sum(
                    (F.col("c_st") / F.col("c_s"))
                    * F.log(
                        (F.col("c_st") * F.col("c"))
                        / (F.col("c_s") * F.col("c_t"))
                    )
                ),
                4,
            ).alias("kl_nats")
        )
    )
