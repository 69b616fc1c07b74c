"""Budget-constrained corpus selection: greedy fill by lexical density.

``corpus_budget_pack`` answers the curation question "I can afford B
training tokens per language — which documents do I keep?" with the
standard greedy knapsack relaxation: rank each language's documents by
lexical density (distinct tokens / total tokens — cheap, monotone with
the dedup-aware value signals), admit documents in rank order, and cut
when the running token total passes the budget. The admitted set plus
each document's rank and cumulative cost is the output — a curation
MANIFEST, reproducible and auditable, which is what an actual corpus
build pins in its provenance record.

Selection rule: a document is admitted while the cumulative token
count INCLUDING itself is <= budget; the first straddler is excluded
(hard budget). Ties in density break by doc_id, so the manifest is
total-order deterministic.

Determinism: density is a ratio of two exact integers (bit-identical
doubles both engines), the ordering key is (density DESC, doc_id),
and the running sum is BIGINT — no float accumulates anywhere.

Scale: one narrow map computes (lang, doc_id, n_toks, density); the
window runs per language. At 100 TB a per-language sort-window is the
pressure point — the standard mitigation is a density pre-filter
(drop the provably-never-admitted tail: any doc below the density of
the budget-sized prefix of a sample) before the exact window; noted,
not needed at current scales.

Reference parity: core.clj has no curation surface; LLM-pipeline
extension (the packing.py / mixture.py family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_BUDGET = 5_000  # tokens per language


@register(
    "corpus_budget_pack",
    oracle=f"""
        WITH scored AS (
            SELECT lang, doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> t <> '')) AS BIGINT) AS n_toks,
                   len(list_distinct(list_filter(string_split(text, ' '),
                                                 t -> t <> ''))) * 1.0
                   / nullif(len(list_filter(string_split(text, ' '),
                                            t -> t <> '')), 0) AS density
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        ranked AS (
            SELECT lang, doc_id, n_toks,
                   round(density, 6) AS density,
                   CAST(row_number() OVER w AS BIGINT) AS rnk,
                   CAST(sum(n_toks) OVER (w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_tokens
            FROM scored
            WHERE n_toks > 0
            WINDOW w AS (PARTITION BY lang ORDER BY density DESC, doc_id)
        )
        SELECT lang, doc_id, n_toks, density, rnk, cum_tokens
        FROM ranked
        WHERE cum_tokens <= {_BUDGET}
    """,
    description=f"greedy token-budget curation manifest: per language, "
    "documents ranked by lexical density (distinct/total tokens, "
    "doc_id tie-break) and admitted while the running token total "
    f"stays within {_BUDGET:,} tokens (hard budget, straddler "
    "excluded) — the reproducible which-docs-made-the-cut record a "
    "corpus build pins; density is a ratio of exact integers, the "
    "running sum BIGINT, the window per-language",
)
def corpus_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    scored = docs.select(
        "lang",
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        (
            F.size(F.array_distinct(toks))
            / F.nullif(F.size(toks), F.lit(0))
        ).alias("density"),
    ).where(F.col("n_toks") > 0)
    w = W.partitionBy("lang").orderBy(F.col("density").desc(), "doc_id")
    ranked = scored.select(
        "lang",
        "doc_id",
        "n_toks",
        F.round("density", 6).alias("density"),
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("n_toks")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_tokens"),
    )
    return ranked.where(F.col("cum_tokens") <= _BUDGET)
