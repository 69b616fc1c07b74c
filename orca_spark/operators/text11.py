"""Corpus-curation operators over duplicate text spans and per-source
quality percentiles.

* ``dedup_span_coverage`` — the duplicate-span profile from
  "Deduplicating Training Data Makes Language Models Better" (Lee et
  al. 2022), at word-8-gram granularity: for every document, how many
  of its 8-gram positions carry a gram that also appears in ANOTHER
  document. Document-level dedup misses partial overlap (a quoted
  paragraph, a shared boilerplate footer inside otherwise-unique
  pages); span coverage is the standard diagnostic for it, and the
  docs it flags at high ``dup_frac`` are the inputs to span-level
  scrubbing.
* ``quality_percentile_gate`` — per-SOURCE adaptive quality cutoff:
  keep each source's top quintile by token count. Fixed global
  thresholds misbehave across heterogeneous sources (a threshold tuned
  for web text deletes all of a code source); percentile gates are how
  production corpus builds (C4 variants, FineWeb) normalize across
  domains.

Reference parity: the reference (core.clj) has no text surface; these
are LLM-pipeline extensions graded as engine components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import REGISTRY, register
from orca_spark.tables import load, widen

_SPAN_N = 8  # word-gram width (Lee et al. use 50 BPE tokens; 8 words ~ parity)
_GATE_PCT = 0.8  # keep percent_rank >= 0.8: the top quintile per source


@register(
    "dedup_span_coverage",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents WHERE text IS NOT NULL
        ),
        grams AS (
            SELECT doc_id, array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}), ' ') AS gram
            FROM toks, UNNEST(generate_series(1, len(toks) - {_SPAN_N - 1})) AS g(i)
            WHERE len(toks) >= {_SPAN_N}
        ),
        gd AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN gd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
               round(sum(CASE WHEN gd.nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_frac
        FROM grams g JOIN gd USING (gram)
        GROUP BY g.doc_id
    """,
    description=f"duplicate-span coverage (Lee et al. 2022) at word-"
    f"{_SPAN_N}-gram granularity: per document, the count and fraction "
    "of its gram positions whose gram appears in at least one OTHER "
    "document — the partial-overlap diagnostic document-level dedup "
    "misses; docs shorter than the gram width are omitted",
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two shuffles — gram-keyed (countDistinct doc partials are
    map-side combined) and doc_id-keyed — both over the exploded gram
    stream, never a doc-pair join. Gram keys here are the gram STRINGS
    for oracle parity; at 100 TB key by ``xxhash64(gram)`` instead
    (8-byte shuffle keys, collision odds ~n²/2⁶⁴ — the standard trade
    every suffix-dedup pipeline makes). The gram stream is consumed
    twice (the count and the join-back) — at scale persist or
    checkpoint it between the two so documents scan once."""
    # the documents parquet arrives as ONE split at test scale and the
    # tokenize + gram fan-out below is the dense per-row compute feeding
    # the first aggregation — run it wide (measured 0.83 s in ONE task
    # of the gram-checkpoint job at sf0.1 in the hashed form); widen()
    # is a no-op once the scan has >= core splits
    docs = widen(load(spark, sf_dir, "documents").where(F.col("text").isNotNull()))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("toks"),
    )
    grams = toks.where(F.size("toks") >= _SPAN_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {_SPAN_N})))"
            )
        ).alias("gram"),
    )
    gd = grams.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        grams.join(gd, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            F.round(F.col("dup_spans") / F.col("n_spans"), 4).alias("dup_frac"),
        )
    )


@register(
    "quality_percentile_gate",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                        AS BIGINT) AS n_words
            FROM documents WHERE text IS NOT NULL
        ),
        ranked AS (
            SELECT doc_id, source, n_words,
                   percent_rank() OVER (PARTITION BY source ORDER BY n_words)
                       AS pr,
                   max(n_words) OVER (PARTITION BY source) AS mx
            FROM scored
        )
        SELECT doc_id, source, n_words, pr FROM ranked
        WHERE pr >= {_GATE_PCT} OR n_words = mx
    """,
    description="per-source adaptive quality gate: keep each source's "
    f"top quintile by token count (percent_rank >= {_GATE_PCT} within "
    "source), and ALWAYS its best document(s) — for a source with few "
    "docs percent_rank=(rank-1)/(n-1) never reaches the cutoff (a "
    "single-doc source scores 0), so without the max-escape entire "
    "small sources would be silently discarded; percentile cutoffs "
    "normalize quality filtering across heterogeneous domains where "
    "one fixed threshold misfires; percent_rank is integer-derived "
    "((rank-1)/(n-1)), so the value is cross-engine exact",
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one source-keyed window over (doc_id, source, n_words) —
    the window input is three narrow columns, not the text; skewed
    sources are the data's own skew (a single source's ranking cannot
    be salted without changing the semantics, but the per-row state is
    12 bytes). Ties share a percent_rank in both engines, so the gate
    is deterministic without a tiebreak column."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).cast(
            "long"
        ).alias("n_words"),
    )
    w = W.partitionBy("source").orderBy("n_words")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .withColumn("mx", F.max("n_words").over(W.partitionBy("source")))
        .where((F.col("pr") >= _GATE_PCT) | (F.col("n_words") == F.col("mx")))
        .select("doc_id", "source", "n_words", "pr")
    )


@register(
    "dedup_span_scrub",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents WHERE text IS NOT NULL
        ),
        grams AS (
            SELECT doc_id, i,
                   array_to_string(list_slice(toks, i, i + {_SPAN_N - 1}),
                                   ' ') AS gram
            FROM toks,
                 UNNEST(generate_series(1, len(toks) - {_SPAN_N - 1})) AS g(i)
            WHERE len(toks) >= {_SPAN_N}
        ),
        gd AS (SELECT gram FROM grams
               GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        cov AS (SELECT DISTINCT g.doc_id, u.t AS idx
                FROM grams g JOIN gd USING (gram),
                     UNNEST(generate_series(g.i, g.i + {_SPAN_N - 1})) AS u(t)),
        nsc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scrubbed
                FROM cov GROUP BY doc_id),
        pos AS (SELECT t.doc_id, p.i AS idx, t.toks[p.i] AS tok
                FROM toks t,
                     UNNEST(generate_series(1, len(t.toks))) AS p(i)),
        keep AS (
            SELECT p.doc_id,
                   md5(coalesce(string_agg(p.tok, ' ' ORDER BY p.idx), ''))
                       AS kept_md5
            FROM pos p
            LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.idx = p.idx
            WHERE c.idx IS NULL
            GROUP BY p.doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(nsc.n_scrubbed, 0) AS BIGINT) AS n_scrubbed,
               CAST(CASE WHEN len(t.toks) = 0 THEN NULL
                    ELSE coalesce(nsc.n_scrubbed, 0) * 1000000
                         // len(t.toks) END AS BIGINT) AS scrubbed_ppm,
               coalesce(keep.kept_md5, md5('')) AS kept_md5
        FROM toks t
        LEFT JOIN nsc USING (doc_id)
        LEFT JOIN keep USING (doc_id)
    """,
    description=f"span-level scrubbing (the ACTION form of "
    f"dedup_span_coverage — the CROSS-DOCUMENT restriction of Lee et "
    f"al. 2022's ExactSubstr dedup at word-{_SPAN_N}-gram granularity; "
    "spans repeated only WITHIN one document survive by design): every "
    "token covered by a gram that also appears in another document is "
    "excised, and each "
    "document reports its token count, scrubbed-token count, exact "
    "scrubbed_ppm (BIGINT; NULL for zero-token docs), and the md5 of "
    "the surviving tokens space-joined in order — so the driver "
    "value-checks the reconstructed text, not just the accounting; "
    "docs shorter than the gram width pass through unscrubbed",
)
def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the same never-pairwise shape as the diagnostic sibling —
    gram-keyed shuffle for the cross-doc count, join-back to the
    (positioned) gram stream, a bounded {_SPAN_N}x explode of duplicate
    span STARTS into covered indices, one distinct and one anti-join
    both keyed (doc_id, idx), and a doc-keyed final aggregate whose
    kept-text order is pinned by array_sort on (idx, tok) structs.
    Gram keys stay strings for oracle parity; at 100 TB key by
    ``xxhash64(gram)`` (8-byte shuffle keys) and persist the gram
    stream between its two consumers, exactly as the sibling's note
    says. The 1e6 ppm is integer div — cross-engine exact."""
    # the documents parquet arrives as ONE split at test scale and the
    # tokenize + gram fan-out below is the dense per-row compute feeding
    # the first aggregation — run it wide (measured 0.83 s in ONE task
    # of the gram-checkpoint job at sf0.1 in the hashed form); widen()
    # is a no-op once the scan has >= core splits
    docs = widen(load(spark, sf_dir, "documents").where(F.col("text").isNotNull()))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("toks"),
    )
    grams = toks.where(F.size("toks") >= _SPAN_N).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {_SPAN_N})))"
            )
        ).alias("p0", "gram"),
    ).select("doc_id", (F.col("p0") + 1).alias("i"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gram")
    )
    cov = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_SPAN_N - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    nsc = cov.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_scrubbed"))
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("idx"), "tok")
    keep = (
        pos.join(cov, ["doc_id", "idx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list("
                        "struct(idx, tok))), s -> s.tok)"
                    ),
                )
            ).alias("kept_md5")
        )
    )
    return (
        toks.join(nsc, "doc_id", "left")
        .join(keep, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_scrubbed"), F.lit(0))
            .cast("long")
            .alias("n_scrubbed"),
            F.when(F.size("toks") == 0, F.lit(None))
            .otherwise(
                F.expr(
                    "coalesce(n_scrubbed, 0) * 1000000 div size(toks)"
                )
            )
            .cast("long")
            .alias("scrubbed_ppm"),
            F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
        )
    )


@register(
    "dedup_span_scrub_hashed",
    # Same oracle as dedup_span_scrub: the output exposes no hash, and
    # grouping grams by xxhash64(gram) is equivalent to grouping by the
    # gram string absent a 64-bit collision (probability ~ n_grams^2 /
    # 2^65 — immaterial at any tested scale, and a collision would fail
    # the driver hash loudly rather than silently).
    oracle=REGISTRY["dedup_span_scrub"].oracle,
    description=f"the 100 TB form of dedup_span_scrub the sibling's "
    f"docstring promises: gram keys are xxhash64(gram) LONGS (8-byte "
    f"shuffle keys, never the gram string), and the positioned gram "
    f"stream is persisted between its two consumers (the cross-doc "
    f"count and the join-back) so the corpus is tokenized once; output "
    f"and oracle identical to the string-keyed sibling — word-"
    f"{_SPAN_N}-gram cross-document ExactSubstr scrubbing with "
    f"value-checked kept-text md5",
)
def dedup_span_scrub_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale contract (the reason this variant exists): every shuffle
    key in the plan is a LONG — ``gram_h = xxhash64(gram)`` for the
    duplicate count and its join-back, ``(doc_id, idx)`` for coverage
    and the anti-join, ``doc_id`` for the final aggregate. The gram
    STRING is projected away before the first exchange, so shuffle
    width is independent of gram text size (~8 bytes vs ~50+). The
    positioned (doc_id, i, gram_h) stream is localCheckpoint-persisted
    and feeds both consumers without re-tokenizing. Asserted in
    tests/test_plans.py: no gram string in any hashpartitioning."""
    # NOTE (r12, measured): unlike the string-keyed siblings above, do
    # NOT widen() this scan. Here the gram stream is localCheckpoint'd,
    # so the single-task fan-out is paid ONCE — and the A/B showed the
    # added round-robin exchange plus the 32-partition checkpointed RDD
    # feeding every downstream stage costs MORE than the one task saves
    # at sf0.1 (median 2.11 -> 2.69 s widened). At cluster scale the
    # scan has many splits and widen() would be a no-op anyway.
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("toks"),
    )
    grams = (
        toks.where(F.size("toks") >= _SPAN_N)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
                    f" i -> xxhash64(concat_ws(' ', slice(toks, i, {_SPAN_N}))))"
                )
            ).alias("p0", "gram_h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("i"), "gram_h")
        .localCheckpoint(eager=False)  # tokenize once, consume twice
    )
    dup = (
        grams.groupBy("gram_h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gram_h")
    )
    cov = (
        grams.join(dup, "gram_h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_SPAN_N - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    nsc = cov.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_scrubbed"))
    pos = toks.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("idx"), "tok")
    keep = (
        pos.join(cov, ["doc_id", "idx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list("
                        "struct(idx, tok))), s -> s.tok)"
                    ),
                )
            ).alias("kept_md5")
        )
    )
    return (
        toks.join(nsc, "doc_id", "left")
        .join(keep, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_scrubbed"), F.lit(0))
            .cast("long")
            .alias("n_scrubbed"),
            F.when(F.size("toks") == 0, F.lit(None))
            .otherwise(
                F.expr(
                    "coalesce(n_scrubbed, 0) * 1000000 div size(toks)"
                )
            )
            .cast("long")
            .alias("scrubbed_ppm"),
            F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
        )
    )
