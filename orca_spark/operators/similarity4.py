"""TF-IDF weighted document similarity with rare-term blocking.

The weighted companion to the token-set Jaccard family: document pairs
scored by cosine over tf·idf term weights, with candidates generated
by a FIXED-K rare-term prefix block (each document indexes only its
``_PREFIX_K`` rarest tokens; a pair is a candidate iff the prefixes
share a token). Blocking is part of the operator's SEMANTICS — both
the Spark form and the oracle compute the identical candidate set, so
the comparison is exact; completeness relative to all-pairs is a
documented trade (rare shared vocabulary is what makes a pair worth
scoring, which is exactly what the block keys on).

Reference parity: the reference (core.clj) has no similarity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.blocking import prefix_candidates
from orca_spark.registry import register
from orca_spark.tables import load

_PREFIX_K = 8  # each doc indexes its 8 rarest tokens
_MIN_COSINE = 0.6


@register(
    "similarity_tfidf_cosine_pairs",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL
        ),
        tf AS (
            SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w
        ),
        df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        n AS (
            SELECT count(DISTINCT doc_id) AS n_docs
            FROM documents WHERE text IS NOT NULL
        ),
        wt AS (
            SELECT tf.doc_id, tf.w,
                   tf.tf * ln(n.n_docs / df.df) AS wgt
            FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
        ),
        nrm AS (
            SELECT doc_id, sqrt(sum(wgt * wgt)) AS nrm
            FROM wt GROUP BY doc_id
        ),
        pfx AS (
            SELECT doc_id, w FROM (
                SELECT tf.doc_id, tf.w,
                       row_number() OVER (
                           PARTITION BY tf.doc_id ORDER BY df.df, tf.w
                       ) AS rn
                FROM tf JOIN df ON tf.w = df.w
            ) WHERE rn <= {_PREFIX_K}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pfx a JOIN pfx b
              ON a.w = b.w AND a.doc_id < b.doc_id
        ),
        dot AS (
            SELECT c.doc_a, c.doc_b, sum(wa.wgt * wb.wgt) AS dp
            FROM cand c
            JOIN wt wa ON wa.doc_id = c.doc_a
            JOIN wt wb ON wb.doc_id = c.doc_b AND wb.w = wa.w
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT d.doc_a, d.doc_b,
               round(d.dp / (na.nrm * nb.nrm), 4) AS cosine
        FROM dot d
        JOIN nrm na ON na.doc_id = d.doc_a
        JOIN nrm nb ON nb.doc_id = d.doc_b
        -- threshold on the ROUNDED cosine: the dot/norm sums are
        -- summation-order-sensitive floats, so an unrounded >= would
        -- let a last-ulp difference flip pair membership between
        -- engines; rounding first coarsens the boundary to the same
        -- residual every rounded aggregate carries
        WHERE na.nrm > 0 AND nb.nrm > 0
          AND round(d.dp / (na.nrm * nb.nrm), 4) >= {_MIN_COSINE}
    """,
    description=f"tf-idf cosine >= {_MIN_COSINE} document pairs over "
    f"rare-term blocked candidates (each doc indexes its {_PREFIX_K} "
    "rarest tokens): the weighted counterpart to the Jaccard family — "
    "blocking is part of the semantics and identical on both engines",
)
def similarity_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: term weights and norms aggregate with map-side combine on
    (doc_id, w) / doc_id; candidates come from the fixed-K rare-token
    prefix join (bucket sizes bounded by how many documents rank a
    token among their K rarest — rare by construction), and the dot
    product joins run over candidates × shared terms, never all-pairs.
    The explicit repartition before the prefix self-join is the same
    AQE guard as graph.neardup_edges (tiny input, quadratic output).

    Determinism: the candidate set is integer/string-ordered (df, w
    tiebreak) and identical on both engines; idf = ln(N/df) of
    identical integers is bit-equal; the dot/norm SUMS are the only
    order-sensitive floats, rounded (4) per convention — and the
    zero-norm guard excludes single-token '' docs whose idf can be 0."""
    tf = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    wt = (
        tf.join(df_tbl, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "w", (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("wgt")
        )
    )
    nrm = wt.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wgt") * F.col("wgt"))).alias("nrm"))
    # blocking machinery (df ranking, AQE-expansion guard, bucket
    # self-join) shared with graph.neardup_edges
    cand = prefix_candidates(tf.select("doc_id", "w"), F.lit(_PREFIX_K))
    wa = wt.select(F.col("doc_id").alias("doc_a"), "w", F.col("wgt").alias("wgt_a"))
    wb = wt.select(F.col("doc_id").alias("doc_b"), "w", F.col("wgt").alias("wgt_b"))
    dot = (
        cand.join(wa, "doc_a")
        .join(wb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wgt_a") * F.col("wgt_b")).alias("dp"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    # threshold on the ROUNDED cosine (matches the oracle): the sums
    # feeding dp/norms are order-sensitive floats and an unrounded >=
    # would let a last-ulp difference flip pair membership
    cos = F.round(F.col("dp") / (F.col("na") * F.col("nb")), 4)
    return (
        dot.join(na, "doc_a")
        .join(nb, "doc_b")
        .where((F.col("na") > 0) & (F.col("nb") > 0) & (cos >= _MIN_COSINE))
        .select("doc_a", "doc_b", cos.alias("cosine"))
    )
