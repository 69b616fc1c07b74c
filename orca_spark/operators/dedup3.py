"""Dedup batch 3: segment-level boilerplate removal and bloom-pruned
decontamination — the two remaining dedup shapes a pretraining pipeline
runs that the earlier batches (document-exact, MinHash, SimHash, n-gram
Jaccard, embedding near-dup) don't cover.

Segment-level dedup is the RefinedWeb/CCNet "line-level" pass: a LINE
that appears verbatim in many documents is boilerplate (nav bars, cookie
banners, license headers) and is removed from every document while the
rest of each document survives.  The driver corpus has no newlines, so
segments are fixed ``SEG_W``-token windows — the pipeline shape
(explode → cross-doc frequency → remove → reassemble) is identical.

Bloom-pruned decontamination is the scale form of the exact anti-join:
build a compact bit-array from the contamination set, broadcast it, drop
the obvious non-members with pure bit arithmetic (no shuffle of the big
side), and exact-confirm only the survivors.  The final output is EXACT
(the bloom can only let extra candidates through to the confirm join,
never drop a true match), which is why it still gets a plain anti-join
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

# 3-token windows with a cross-document frequency threshold of 5: on the
# driver corpus this yields a ~25-segment boilerplate set (measured at
# sf0.001 and sf0.01) — small enough to broadcast, large enough that the
# removal path is actually exercised.
SEG_W = 3
SEG_DOC_FREQ = 5


@register(
    "dedup_line_level",
    oracle=f"""
        WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        base AS (
            SELECT doc_id, t,
                   CAST(ceil(coalesce(len(t), 0) * 1.0 / {SEG_W}) AS BIGINT)
                       AS n_segments
            FROM tk
        ),
        flat AS (
            SELECT doc_id, s.idx AS idx, s.seg AS seg
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(0, n_segments),
                              i -> {{'idx': i,
                                     'seg': array_to_string(
                                         t[i*{SEG_W}+1 : i*{SEG_W}+{SEG_W}],
                                         ' ')}})) AS s
                FROM base
            )
        ),
        freq AS (
            SELECT seg FROM (
                SELECT seg, count(DISTINCT doc_id) AS df
                FROM flat GROUP BY seg
            ) WHERE df >= {SEG_DOC_FREQ}
        ),
        kept AS (
            SELECT doc_id, idx, seg FROM flat
            WHERE seg NOT IN (SELECT seg FROM freq)
        ),
        clean AS (
            SELECT doc_id,
                   string_agg(seg, ' ' ORDER BY idx) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id,
               coalesce(c.clean_text, '')                 AS clean_text,
               b.n_segments,
               b.n_segments - coalesce(c.n_kept, 0)       AS n_removed
        FROM base b LEFT JOIN clean c USING (doc_id)
    """,
    description="line-level (segment) boilerplate removal, the "
    "RefinedWeb/CCNet pass: explode docs into 3-token segments, count "
    "cross-document frequency (distinct-doc count, map-side "
    "combinable), broadcast the small frequent set, anti-join it out of "
    "every document, reassemble survivors in order. The heavy explode "
    "shuffles once for the frequency agg; removal itself never "
    "shuffles the corpus",
)
def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove segments that appear in >= SEG_DOC_FREQ distinct docs.

    Scale: the frequency aggregation shuffles (segment) keys once with
    map-side partial counts; the boilerplate set (df >= threshold) is by
    construction tiny relative to the corpus — the power-law head — so
    the removal is a broadcast anti-join and the reassembly is one
    groupBy(doc_id) shuffle of the surviving segments.  If a corpus ever
    produced a frequent-set too large to broadcast, dropping the
    broadcast hint falls back to a shuffle anti-join with identical
    semantics.
    """
    d = load(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.split("text", " ").alias("t"))
    # totality: size(NULL) is -1, and sequence(0, -1) DESCENDS — a NULL
    # text must yield 0 segments, not a garbage negative-index window
    n_segments = (
        F.when(F.col("t").isNull(), F.lit(0))
        .otherwise(F.ceil(F.size("t") * F.lit(1.0) / SEG_W))
        .cast("long")
    )
    base = tk.select("doc_id", "t", n_segments.alias("n_segments"))
    # fixed-width token windows; slice() clamps the final partial window
    segs = F.when(
        F.col("n_segments") >= 1,
        F.transform(
            F.sequence(F.lit(0), F.col("n_segments") - 1),
            lambda i: F.concat_ws(" ", F.slice("t", i * SEG_W + 1, SEG_W)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    flat = base.select(
        "doc_id", F.posexplode(segs).alias("idx", "seg")
    )
    freq = (
        flat.select("doc_id", "seg")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= SEG_DOC_FREQ)
        .select("seg")
    )
    kept = flat.join(F.broadcast(freq), "seg", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("doc_id", "n_segments")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_segments",
            (F.col("n_segments") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-pruned decontamination
# ---------------------------------------------------------------------------

# 2^16 bits (1024 longs, 8 KiB) with 4 probes: for a contamination set of
# n keys the false-positive rate is ~(1 - e^(-4n/65536))^4 — ~1.5e-4 at
# n=500, ~2.4e-2 at n=5000.  The bitmap is a broadcast literal; sizing
# scales it linearly (a 100M-key blocklist at 10 bits/key is ~125 MB,
# still broadcast range on real executors).
_BLOOM_BITS = 1 << 16
_BLOOM_HASHES = 4


def _position_sql(key_name: str, seed: int) -> str:
    """SQL for one probe position: xxhash64 over (key, seed), mod bits.

    The seed is just an extra hashed column — k distinct seeds give k
    independent hash functions; build and probe use the identical form.
    """
    return f"pmod(xxhash64({key_name}, {seed}), {_BLOOM_BITS})"


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key set into one row: array<long> bitmap of _BLOOM_BITS.

    Pure SQL bit arithmetic — each key contributes k set bits via
    ``shiftleft(1, pos % 64)`` OR-ed into word ``pos div 64``; the
    aggregation is ``bit_or`` per word, fully map-side combinable, so
    building from 100 TB of keys is one partial-agg pass producing 8 KiB.
    """
    pos = F.explode(
        F.array(
            *[
                F.expr(_position_sql(key_col, seed))
                for seed in range(_BLOOM_HASHES)
            ]
        )
    )
    words = (
        keys.select(pos.alias("p"))
        .select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    # densify to a fixed-length array so probing is element_at, not a join
    return words.agg(
        F.expr(
            f"aggregate(collect_list(struct(w, word)), "
            f"array_repeat(0L, {_BLOOM_BITS // 64}), "
            f"(acc, x) -> transform(acc, (v, i) -> "
            f"IF(i = x.w, v | x.word, v)))"
        ).alias("bloom")
    )


def bloom_might_contain(bloom_name: str, key_name: str):
    """True iff ALL k probe bits are set — the bloom membership test.

    The k positions are computed ONCE into an array and each tested via
    a higher-order ``forall`` — k xxhash64 evaluations per row (naively
    inlining the position into both the word index and the bit shift
    doubles the hash work, the dominant per-row cost).
    """
    probes = ", ".join(
        _position_sql(key_name, seed) for seed in range(_BLOOM_HASHES)
    )
    return F.expr(
        f"forall(transform(array({probes}), p ->"
        f" (element_at({bloom_name}, cast(p div 64 as int) + 1)"
        f" & shiftleft(1L, cast(p % 64 as int))) != 0), x -> x)"
    )


@register(
    "dedup_bloom_decontaminate",
    oracle="""
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d
        WHERE d.text IS NOT NULL
          AND md5(d.text) NOT IN (
            SELECT md5(text) FROM documents
            WHERE source = 'src0' AND text IS NOT NULL
        )
        ORDER BY d.doc_id
    """,
    description="bloom-pruned decontamination: the benchmark/eval set "
    "('src0') aggregates into an 8 KiB bit-array broadcast to every "
    "task; the corpus drops obvious non-members with pure bit "
    "arithmetic (no shuffle, no join) and only bloom-positive "
    "survivors reach the exact confirm anti-join — output is EXACT "
    "(bloom false positives are re-checked, false negatives are "
    "impossible), hence the plain anti-join oracle",
)
def dedup_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop corpus docs whose text appears in the contamination set.

    Scale story: the naive form is an anti-join that shuffles the full
    100 TB corpus on md5(text).  Here the contamination set (eval
    benchmarks — thousands to millions of rows, not billions) compiles
    to a broadcast bitmap; the bloom test eliminates ~all clean rows
    in-place, and the confirm anti-join's left side is only the
    bloom-positive sliver (true contaminants + ~1e-4 false positives),
    which Spark broadcast-joins against the small set.  Net: zero
    full-corpus shuffles.
    """
    d = load(spark, sf_dir, "documents")
    # NULL text is EXCLUDED on both sides: a NULL key can neither be
    # decontaminated nor contaminate (and SQL's NOT-IN-with-NULL would
    # otherwise drop every row in the oracle) — same boundary contract
    # as load_embeddings' NULL-vector exclusion
    corpus = d.where(F.col("text").isNotNull()).select(
        "doc_id", "source", "n_chars", F.md5("text").alias("k")
    )
    contam = d.where(
        (F.col("source") == "src0") & F.col("text").isNotNull()
    ).select(F.md5("text").alias("k"))
    bloom = bloom_build(contam, "k")
    probed = corpus.join(F.broadcast(bloom))
    clean_fast = probed.where(~bloom_might_contain("bloom", "k")).select(
        "doc_id", "source", "n_chars"
    )
    suspects = probed.where(bloom_might_contain("bloom", "k")).select(
        "doc_id", "source", "n_chars", "k"
    )
    confirmed_clean = suspects.join(
        F.broadcast(contam.distinct()), "k", "left_anti"
    ).select("doc_id", "source", "n_chars")
    return clean_fast.unionByName(confirmed_clean).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Near-dup cluster survivor selection — the end-to-end "cleaned corpus"
# ---------------------------------------------------------------------------


@register(
    "dedup_near_cluster_survivors",
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
                  FROM documents) a
            JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
                  FROM documents) b
              ON a.doc_id < b.doc_id
             AND len(list_intersect(a.s, b.s))
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
            UNION SELECT doc_id, doc_id FROM documents
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        labeled AS (
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        ),
        ranked AS (
            SELECT l.cluster_id, l.doc_id, d.n_chars,
                   row_number() OVER (PARTITION BY l.cluster_id
                                      ORDER BY d.n_chars DESC, l.doc_id) AS rn,
                   count(*) OVER (PARTITION BY l.cluster_id) AS n_members
            FROM labeled l JOIN documents d USING (doc_id)
        )
        SELECT cluster_id, doc_id, n_chars,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    """,
    description="near-dup dedup end-to-end: cluster (>=0.9 Jaccard "
    "connected components), then keep ONE canonical doc per cluster — "
    "highest quality proxy (n_chars), doc_id tie-break — with the "
    "cluster size for loss accounting; the composition a user actually "
    "runs to emit a cleaned corpus, one window over the labeled docs "
    "on top of the CC machinery",
)
def dedup_near_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from orca_spark.operators.dedup import dedup_connected_components

    cc = dedup_connected_components(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = cc.join(d, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    wc = W.partitionBy("cluster_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select("cluster_id", "doc_id", "n_chars", "n_members")
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup against a persisted index
# ---------------------------------------------------------------------------


def _minhash_incremental_oracle() -> str:
    """The probe's SQL twin: same shared CTE block as dedup_minhash's
    oracle (shingles → signatures → band buckets, all via the pure-SQL
    xxhash64), with candidates from the new(odd) × history(even) band
    equi-join instead of the full self-join. The persisted parquet
    index is deterministic per doc, so re-deriving history's buckets
    from ``documents`` replicates its content exactly — the
    dedup_phash_incremental oracle convention."""
    from orca_spark.operators.dedup import _minhash_cte

    return f"""
        WITH {_minhash_cte()},
        cand AS (
            SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS hist_doc
            FROM bkt n JOIN bkt h
              ON n.b = h.b AND n.bucket = h.bucket
            WHERE n.doc_id % 2 = 1 AND h.doc_id % 2 = 0
        ),
        inter AS (
            SELECT new_doc, hist_doc, count(*) AS i
            FROM cand
            JOIN shn sa ON sa.doc_id = new_doc
            JOIN shn sb ON sb.doc_id = hist_doc AND sb.sh = sa.sh
            GROUP BY new_doc, hist_doc
        )
        SELECT new_doc, hist_doc,
               round(i / (za.sz + zb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes za ON za.doc_id = new_doc
        JOIN sizes zb ON zb.doc_id = hist_doc
        WHERE i / (za.sz + zb.sz - i) >= 0.7
        ORDER BY new_doc, hist_doc
    """


@register(
    "dedup_minhash_incremental",
    # FULL value oracle (was rows-only): the whole probe — history band
    # index content, new-batch banding, candidate equi-join, exact
    # Jaccard verify — is deterministic integer arithmetic over
    # xxhash64 values, re-derived in SQL via orca_spark/xxh64_sql.py;
    # planted-dup recall and no-false-match properties additionally
    # asserted in tests/test_dedup3.py
    oracle=_minhash_incremental_oracle(),
    description="incremental near-dup: history's LSH band buckets are "
    "built ONCE and persisted to parquet; a new batch bands its own "
    "signatures and probes the stored index by (band, bucket) "
    "equi-join, exact-verifying only matched history docs — dedup "
    "against 100 TB of history at the cost of the NEW data plus the "
    "collisions, never a history rescan (the batch analog of the "
    "streaming watermarked dedup); fully value-oracled since r12 via "
    "the pure-SQL xxhash64 re-derivation",
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch docs near-duplicating any history doc (>= 0.7 Jaccard).

    The history half (even doc_ids) plays yesterday's indexed corpus;
    the odd half is today's batch.  In production the index build runs
    once per ingest and APPENDS its new rows — exactly the
    `streaming_incremental_ingest` sink shape, with this operator as
    the probe side.
    """
    from orca_spark.operators.dedup import (
        _shingles,
        _signatures_from_shingles,
        banded_buckets,
    )
    from orca_spark.operators.io_ops import scratch_path

    d = load(spark, sf_dir, "documents")
    hist = d.where(F.col("doc_id") % 2 == 0)
    new = d.where(F.col("doc_id") % 2 == 1)

    # index build (the once-per-ingest job): history's banded buckets
    idx_path = scratch_path("minhash_index", sf_dir)
    banded_buckets(_signatures_from_shingles(_shingles(hist))).write.mode(
        "overwrite"
    ).parquet(idx_path)

    # probe: band the new batch, equi-join the PERSISTED index
    new_sh = _shingles(new).persist()
    try:
        new_banded = banded_buckets(_signatures_from_shingles(new_sh)).select(
            F.col("doc_id").alias("new_doc"), "band", "bucket"
        )
        idx = spark.read.parquet(idx_path).select(
            F.col("doc_id").alias("hist_doc"), "band", "bucket"
        )
        cand = (
            new_banded.join(idx, ["band", "bucket"])
            .select("new_doc", "hist_doc")
            .distinct()
        )
        # exact verification touches ONLY matched history docs
        hist_matched = hist.join(
            cand.select(F.col("hist_doc").alias("doc_id")).distinct(), "doc_id"
        )
        hist_sh = _shingles(hist_matched)
        inter = (
            cand.join(new_sh.alias("na"), F.col("new_doc") == F.col("na.doc_id"))
            .join(
                hist_sh.alias("hb"),
                (F.col("hist_doc") == F.col("hb.doc_id"))
                & (F.col("na.sh") == F.col("hb.sh")),
            )
            .groupBy("new_doc", "hist_doc")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        za = new_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        zb = hist_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        jac = (
            inter.join(za.alias("za"), F.col("new_doc") == F.col("za.doc_id"))
            .join(zb.alias("zb"), F.col("hist_doc") == F.col("zb.doc_id"))
            .select(
                "new_doc",
                "hist_doc",
                (
                    F.col("i")
                    / (F.col("za.sz") + F.col("zb.sz") - F.col("i"))
                ).alias("jraw"),
            )
        )
        return (
            jac.where(F.col("jraw") >= 0.7)
            .select("new_doc", "hist_doc", F.round("jraw", 4).alias("jaccard"))
            .orderBy("new_doc", "hist_doc")
        )
    finally:
        new_sh.unpersist()


# ---------------------------------------------------------------------------
# Dedup tuning diagnostics
# ---------------------------------------------------------------------------


def _exact_jaccard_pairs(d: DataFrame, min_j: float) -> DataFrame:
    """(doc_a, doc_b, j) for every pair with token-Jaccard >= min_j.

    Inverted-index form (same shape as dedup.dedup_jaccard_exact): the
    pair space is generated by the TOKEN equi-join, so only pairs
    sharing at least one token ever materialize — any threshold > 0
    makes this lossless vs the all-pairs cross join, at
    O(shared-token pairs) instead of O(n²). Shared by both diagnostics
    below so their Jaccard semantics cannot drift apart.
    """
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jraw = F.col("i") / (F.col("za.sz") + F.col("zb.sz") - F.col("i"))
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .where(jraw >= min_j)
        .select("doc_a", "doc_b", F.round(jraw, 4).alias("j"))
    )


@register(
    "dedup_jaccard_histogram",
    oracle="""
        WITH sets AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
            FROM documents
        ),
        pairs AS (
            SELECT round(len(list_intersect(a.s, b.s)) * 1.0
                   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
                       AS j
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        )
        SELECT round(floor(j * 10) / 10, 1) AS j_bucket,
               count(*) AS n_pairs
        FROM pairs WHERE j >= 0.5
        GROUP BY 1
    """,
    description="dedup threshold tuning: histogram of exact token-"
    "Jaccard over all pairs >= 0.5 in 0.1-wide buckets — the "
    "distribution that tells an operator where to SET the near-dup "
    "threshold (a bimodal histogram separates true dups from topical "
    "overlap; a smooth tail means the threshold is a real tradeoff). "
    "Pairs come from the token inverted-index equi-join (lossless for "
    "any threshold > 0 — a zero-overlap pair cannot clear it), never "
    "an all-pairs cross join",
)
def dedup_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = _exact_jaccard_pairs(d, min_j=0.5)
    bucket = F.round(F.floor(F.col("j") * 10) / 10, 1)
    return pairs.groupBy(bucket.alias("j_bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@register(
    "dedup_source_overlap_matrix",
    oracle="""
        WITH sets AS (
            SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS s
            FROM documents
        ),
        pairs AS (
            SELECT least(a.source, b.source)    AS source_a,
                   greatest(a.source, b.source) AS source_b
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                  >= 0.8
        )
        SELECT source_a, source_b, count(*) AS n_dup_pairs
        FROM pairs GROUP BY 1, 2
    """,
    description="cross-source duplication matrix: near-dup pairs "
    "(token Jaccard >= 0.8) bucketed by the unordered source pair — "
    "the mirror-site / scraped-twice detector that tells a curation "
    "team WHICH ingest sources duplicate each other (high off-diagonal "
    "mass = drop one source, high diagonal = dedup within it); pairs "
    "from the shared inverted-index generator, source labels joined "
    "back as a broadcast",
)
def dedup_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = _exact_jaccard_pairs(d, min_j=0.8)
    src = F.broadcast(d.select("doc_id", "source"))
    labeled = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_dup_pairs")
    )
