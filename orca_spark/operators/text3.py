"""Text batch 3: rolling-gram document fingerprints (winnowing) and an
exact n-gram Jaccard similarity join with prefix filtering.

Two classic document-pipeline operators the earlier text/dedup modules
don't cover:

* ``text_winnowing_fingerprints`` — the winnowing scheme (Schleimer,
  Wilkerson, Aiken, SIGMOD'03 — the MOSS algorithm): hash every token
  3-gram, slide a window of ``_WIN`` consecutive gram hashes, keep the
  window minimum, distinct. Guarantees any shared token run of length
  >= 3 + _WIN - 1 produces at least one shared fingerprint, while
  storing only ~2/(_WIN+1) of the grams. Pure codegen (split/md5/window
  min), one shuffle on doc_id.

* ``dedup_ngram_jaccard`` — EXACT 3-gram-set Jaccard >= 0.8 pairs via
  PREFIX FILTERING (SSJoin/PPJoin family): order each doc's gram set by
  a global total order (document-frequency ascending, so prefixes hold
  the RAREST grams), index only the first ``|g| - ceil(t*|g|) + 1``
  grams — two sets with Jaccard >= t MUST share a prefix gram, so
  pairing only within prefix-gram buckets has recall 1 by construction.
  Candidates are verified with a full ``array_intersect``. This is the
  scale-safe exact form of the all-pairs join the oracle runs: work is
  O(candidates), and candidates are bounded by rare-gram bucket sizes,
  not n².

Grams ride as ``xxhash64`` i64s through the joins (8-byte shuffle keys,
same trick as dedup.py's shingles); the DuckDB oracle intersects the
gram *strings* — identical results absent a 64-bit collision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_N = 3          # token n-gram width
_WIN = 4        # winnowing window (in grams)
_JACCARD_T = 0.8


def _gram_structs(doc: DataFrame, expr) -> DataFrame:
    """(doc_id, n_grams, pos, gram-expr) for every token 3-gram; docs
    shorter than _N tokens have no grams and drop out (their near-dup
    handling belongs to the token-set paths in dedup.py)."""
    toks = F.split(F.col("text"), " ")
    d = doc.select("doc_id", toks.alias("tk")).where(F.size("tk") >= _N)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("tk") - (_N - 1)),
        lambda i: expr(
            F.concat_ws(
                " ",
                F.element_at("tk", i.cast("int")),
                F.element_at("tk", (i + 1).cast("int")),
                F.element_at("tk", (i + 2).cast("int")),
            )
        ),
    )
    return d.select(
        "doc_id",
        (F.size("tk") - (_N - 1)).alias("n_grams"),
        F.posexplode(grams).alias("pos0", "g"),
    ).select("doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "g")


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents
            WHERE len(string_split(text, ' ')) >= {_N}
        ),
        g0 AS (
            SELECT doc_id, len(tk) - {_N - 1} AS n_grams,
                   unnest(list_transform(range(1, len(tk) - {_N - 2}),
                       i -> {{'pos': i,
                             'h': substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 16)}})) AS ph
            FROM t
        ),
        wm AS (
            SELECT doc_id, ph.pos AS pos, n_grams,
                   min(ph.h) OVER (PARTITION BY doc_id ORDER BY ph.pos
                        ROWS BETWEEN CURRENT ROW AND {_WIN - 1} FOLLOWING) AS fp
            FROM g0
        )
        SELECT DISTINCT doc_id, fp
        FROM wm
        WHERE pos <= greatest(n_grams - {_WIN - 1}, 1)
    """,
    description="winnowing document fingerprints (MOSS): md5 of each "
    f"token {_N}-gram, min over a {_WIN}-gram sliding window, distinct — "
    "guarantees shared fingerprints for any sufficiently long shared run "
    "while keeping ~2/(w+1) of the grams; codegen'd, one shuffle",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnowing_fingerprints(load(spark, sf_dir, "documents"))


def winnowing_fingerprints(doc: DataFrame) -> DataFrame:
    """(doc_id, text) → distinct (doc_id, fp) winnowing fingerprints."""
    grams = _gram_structs(doc, lambda s: F.substring(F.md5(s), 1, 16))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN - 1)
    return (
        grams.withColumn("fp", F.min("g").over(w))
        # full windows only; docs with < _WIN grams keep their single
        # all-grams window (pos 1, frame shrinks at the tail)
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - (_WIN - 1), F.lit(1)))
        .select("doc_id", "fp")
        .distinct()
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - {_N - 2}),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
            WHERE len(tk) >= {_N}
        ),
        p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.g, b.g)) AS inter,
                   len(a.g) AS sa, len(b.g) AS sb
            FROM s a JOIN s b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(inter::DOUBLE / (sa + sb - inter), 4) AS jaccard
        FROM p
        WHERE inter::DOUBLE / (sa + sb - inter) >= {_JACCARD_T}
    """,
    description=f"exact {_N}-gram-set Jaccard >= {_JACCARD_T} pairs via "
    "prefix filtering (SSJoin): grams globally ordered by document "
    "frequency, only the |g|-ceil(t|g|)+1 rarest indexed, candidates "
    "bucket-joined on prefix grams (recall 1 by the prefix theorem), "
    "then verified with array_intersect — O(candidates), never n^2; "
    "oracle runs the all-pairs form",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sets = (
        _gram_structs(d, lambda s: F.xxhash64(s))
        .groupBy("doc_id")
        .agg(F.array_distinct(F.collect_list("g")).alias("g"))
        .select("doc_id", "g", F.size("g").alias("sz"))
    )
    exploded = sets.select("doc_id", "sz", F.explode("g").alias("gh"))
    freq = exploded.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    # global total order (df asc, gh asc): prefixes prefer rare grams,
    # shrinking candidate buckets; any total order preserves recall
    rn = F.row_number().over(W.partitionBy("doc_id").orderBy("df", "gh"))
    prefix_len = F.col("sz") - F.ceil(F.lit(_JACCARD_T) * F.col("sz")) + 1
    prefix = (
        exploded.join(freq, "gh")
        .withColumn("rn", rn)
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "gh")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), (F.col("a.gh") == F.col("b.gh"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = sets.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"), F.col("sz").alias("sa"))
    gb = sets.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g_b"), F.col("sz").alias("sb"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    jac = inter / (F.col("sa") + F.col("sb") - inter)
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .where(jac >= _JACCARD_T)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
