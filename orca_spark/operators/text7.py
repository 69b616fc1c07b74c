"""Text analysis batch 4: vocabulary coverage and distribution drift —
the monitoring ops a training-data pipeline runs per ingest batch.

Vocabulary/OOV: build the top-N vocabulary by DOCUMENT frequency (not
raw counts — df is robust to one spammy doc), broadcast it, and score
every document's out-of-vocabulary token rate.  High OOV flags
mis-languaged or corrupted batches before they hit the tokenizer.

PSI: population-stability-index of each source's length distribution
against the whole corpus — the standard drift score (PSI > 0.2 = "the
source changed") computed over fixed buckets so two snapshots are
comparable.  All pure SQL aggregation; both ops are one shuffle plus a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_VOCAB_N = 16  # the driver corpus has ~31 distinct tokens; 16 leaves a
# real OOV tail. Production sizing (32k-256k) changes nothing
# structurally — the vocab stays broadcast-range either way.

_N_BUCKETS = 12
_BUCKET_W = 50  # n_chars in [0, 600) across the corpus; cap the tail


@register(
    "text_vocab_oov",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        df AS (
            SELECT token, count(DISTINCT doc_id) AS dfreq
            FROM tok GROUP BY token
        ),
        vocab AS (
            SELECT token FROM df
            ORDER BY dfreq DESC, token ASC LIMIT {_VOCAB_N}
        ),
        per AS (
            SELECT doc_id,
                   count(*) AS n_tokens,
                   sum(CASE WHEN token NOT IN (SELECT token FROM vocab)
                            THEN 1 ELSE 0 END) AS n_oov
            FROM tok GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_oov AS BIGINT) AS n_oov,
               round(n_oov * 1.0 / n_tokens, 6) AS oov_rate
        FROM per
    """,
    description=f"vocabulary build + OOV scoring: top-{_VOCAB_N} tokens "
    "by document frequency (ties broken by token for determinism), "
    "broadcast anti-join scores every doc's out-of-vocabulary token "
    "rate — the batch-health signal that catches mis-languaged or "
    "corrupted ingests; df-count shuffles once map-side-combined, the "
    "vocab itself is model-sized and broadcast",
)
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dfreq = (
        tok.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    wv = W.orderBy(F.col("dfreq").desc(), F.col("token").asc())
    # rank the (tiny: distinct-token-sized) df table on a single task —
    # at web scale the df table is still only vocabulary-sized (< 10M
    # rows), and the two-phase form (per-partition top-N then merge)
    # drops in if it ever isn't
    vocab = (
        dfreq.withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") <= _VOCAB_N)
        .select("token")
    )
    totals = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    oov = (
        tok.join(F.broadcast(vocab), "token", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return (
        totals.join(oov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.round(
                F.coalesce("n_oov", F.lit(0)) * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


@register(
    "source_length_psi",
    oracle=f"""
        WITH bucketed AS (
            SELECT source,
                   least(CAST(floor(n_chars / {_BUCKET_W}) AS BIGINT),
                         {_N_BUCKETS - 1}) AS bucket
            FROM documents
        ),
        grid AS (
            SELECT s.source, b.bucket
            FROM (SELECT DISTINCT source FROM bucketed) s
            CROSS JOIN (SELECT unnest(range({_N_BUCKETS})) AS bucket) b
        ),
        src AS (
            SELECT source, bucket, count(*) AS c
            FROM bucketed GROUP BY source, bucket
        ),
        tot AS (
            SELECT bucket, count(*) AS c FROM bucketed GROUP BY bucket
        ),
        sums AS (
            SELECT CAST(sum(c) AS DOUBLE) AS n_all FROM tot
        ),
        persrc AS (
            SELECT source, CAST(sum(c) AS DOUBLE) AS n_src FROM src GROUP BY source
        ),
        terms AS (
            SELECT g.source,
                   (coalesce(s.c, 0) + 0.5) / (p.n_src + {0.5 * _N_BUCKETS!r}) AS p,
                   (coalesce(t.c, 0) + 0.5) / (m.n_all + {0.5 * _N_BUCKETS!r}) AS q
            FROM grid g
            LEFT JOIN src s ON g.source = s.source AND g.bucket = s.bucket
            LEFT JOIN tot t ON g.bucket = t.bucket
            CROSS JOIN sums m
            JOIN persrc p ON g.source = p.source
        )
        SELECT source, round(sum((p - q) * ln(p / q)), 6) AS psi
        FROM terms GROUP BY source
    """,
    description=f"population stability index per source: each source's "
    f"n_chars distribution over {_N_BUCKETS} fixed {_BUCKET_W}-char "
    "buckets vs the whole corpus, Laplace-smoothed so empty buckets "
    "stay finite — the per-ingest drift monitor (PSI > 0.2 flags a "
    "changed source); two partial-agg passes plus a broadcast of the "
    "bucket-count tables, which are grid-sized, never corpus-sized",
)
def source_length_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucketed = d.select(
        "source",
        F.least(
            F.floor(F.col("n_chars") / _BUCKET_W).cast("long"),
            F.lit(_N_BUCKETS - 1),
        ).alias("bucket"),
    )
    src = bucketed.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    tot = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        bucketed.select("source")
        .distinct()
        .crossJoin(
            spark.range(_N_BUCKETS).select(F.col("id").alias("bucket"))
        )
    )
    n_all = tot.agg(F.sum("c").cast("double").alias("n_all"))
    persrc = src.groupBy("source").agg(F.sum("c").cast("double").alias("n_src"))
    smooth = 0.5 * _N_BUCKETS
    terms = (
        grid.join(src, ["source", "bucket"], "left")
        .withColumnRenamed("c", "sc")
        .join(F.broadcast(tot.withColumnRenamed("c", "tc")), "bucket", "left")
        .crossJoin(F.broadcast(n_all))
        .join(F.broadcast(persrc), "source")
        .select(
            "source",
            (
                (F.coalesce("sc", F.lit(0)) + 0.5)
                / (F.col("n_src") + F.lit(smooth))
            ).alias("p"),
            (
                (F.coalesce("tc", F.lit(0)) + 0.5)
                / (F.col("n_all") + F.lit(smooth))
            ).alias("q"),
        )
    )
    psi = F.round(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
    )
    return terms.groupBy("source").agg(psi.alias("psi"))


@register(
    "source_token_cosine",
    oracle="""
        WITH c AS (
            SELECT source, token, CAST(count(*) AS DOUBLE) AS c
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS token
                FROM documents
            )
            GROUP BY source, token
        ),
        n AS (
            SELECT source, sqrt(sum(c * c)) AS nrm FROM c GROUP BY source
        )
        SELECT a.source AS source_a, b.source AS source_b,
               round(sum(a.c * b.c) / (max(na.nrm) * max(nb.nrm)), 6) AS cosine
        FROM c a
        JOIN c b ON a.token = b.token AND a.source < b.source
        JOIN n na ON na.source = a.source
        JOIN n nb ON nb.source = b.source
        GROUP BY a.source, b.source
    """,
    description="pairwise source similarity: cosine between per-source "
    "unigram count vectors — corpus reduces to a vocabulary-sized "
    "(source, token) count table first (one map-side-combinable "
    "shuffle), the pairwise stage then joins that MODEL-sized table "
    "with itself on token; the mix-monitoring view that shows which "
    "ingest sources are near-duplicates of each other",
)
def source_token_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = c.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a = c.select(
        F.col("source").alias("source_a"), "token", F.col("c").alias("ca")
    )
    b = c.select(
        F.col("source").alias("source_b"), "token", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = F.broadcast(n.select(F.col("source").alias("source_a"), F.col("nrm").alias("na")))
    nb = F.broadcast(n.select(F.col("source").alias("source_b"), F.col("nrm").alias("nb")))
    return (
        dots.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )


@register(
    "text_canonicalize",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g')) AS canonical,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS canonical_hash
        FROM documents
        WHERE text IS NOT NULL
    """,
    description="canonicalization before hashing: lowercase, strip "
    "non-alphanumerics, collapse whitespace runs, trim — the "
    "normalization pass that makes exact dedup robust to cosmetic "
    "variation ('Hello,  World!' == 'hello world'); emits the "
    "canonical form and its md5, one codegen'd projection with "
    "RE2-compatible patterns so the oracle matches byte-for-byte",
)
def text_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id", canon.alias("canonical"), F.md5(canon).alias("canonical_hash")
    )
