"""Sequence packing & context chunking: the two layout primitives that
turn a cleaned document corpus into fixed-shape training inputs.

``corpus_sequence_pack`` is the concat-and-split accounting every LLM
data loader performs — documents are concatenated in a deterministic
order and cut into fixed token blocks — surfaced as a per-block card
(docs starting in the block, tokens contributed, fill). It answers the
capacity questions (how many blocks does this corpus yield? how much
padding/waste?) BEFORE the expensive tokenize-and-write job runs.

``corpus_chunk_windows`` is the retrieval/embedding-side sibling:
overlapping sliding windows over each document's token stream (width
64, stride 32 here), emitted as (doc_id, chunk_id, start, len) offset
rows — the deterministic chunk plan an embedding or RAG indexing job
executes.

Scale design: packing is embarrassingly parallel across (lang, source)
shards — the running-total window is PARTITIONED, never global (a
global cumulative sum would serialize the corpus through one task; a
real 100 TB run additionally sub-shards big sources on a hash prefix
and offsets block ids per shard). Chunking is a row-local generator —
no shuffle at all until the final per-doc ordering the caller asks for.

Determinism: token counts, cumulative sums, block ids, and chunk
offsets are all BIGINT arithmetic (truncating division), so both
operators are cross-engine exact with no rounding anywhere.

Reference parity: the reference (core.clj) has no corpus surface; this
extends §2.5's absent-in-reference LLM family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_BLOCK = 2048  # tokens per training block
_CHUNK_W = 64  # chunk window width (tokens)
_CHUNK_S = 32  # chunk stride (tokens)

_N_TOKENS_SQL = (
    "CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)"
)


@register(
    "corpus_sequence_pack",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, source, {_N_TOKENS_SQL} AS n_tokens
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
        ),
        placed AS (
            SELECT lang, source, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang, source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS cum_before
            FROM toks
        ),
        blocks AS (
            SELECT lang, source,
                   CAST(COALESCE(cum_before, 0) // {_BLOCK} AS BIGINT) AS block_id,
                   n_tokens
            FROM placed
        )
        SELECT lang, source, block_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) * 100 // {_BLOCK} AS BIGINT) AS fill_pct
        FROM blocks
        GROUP BY lang, source, block_id
    """,
    description=f"sequence-packing accounting: docs concatenated in "
    "doc_id order within each (lang, source) shard and cut into "
    f"{_BLOCK}-token blocks — per block, the docs starting in it, their "
    "token mass, and integer fill percent (straddling docs may push a "
    "block past 100). The capacity/waste card a data loader needs "
    "before materializing training sequences; the running total is a "
    "PARTITIONED window (shard-parallel, never a global sort), and all "
    "arithmetic is BIGINT truncating division — cross-engine exact",
)
def corpus_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = toks.select(
        "lang",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        placed.withColumn("block_id", F.expr(f"cum_before div {_BLOCK}"))
        .groupBy("lang", "source", "block_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn("fill_pct", F.expr(f"n_tokens * 100 div {_BLOCK}"))
    )


@register(
    "corpus_chunk_windows",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens
            FROM documents WHERE text IS NOT NULL
        ),
        sized AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens <= {_CHUNK_W} THEN CAST(1 AS BIGINT)
                        ELSE (n_tokens - {_CHUNK_W} + {_CHUNK_S} - 1)
                             // {_CHUNK_S} + 1
                   END AS n_chunks
            FROM toks WHERE n_tokens > 0
        )
        SELECT doc_id,
               CAST(g.i AS BIGINT) AS chunk_id,
               CAST(g.i * {_CHUNK_S} AS BIGINT) AS start_tok,
               CAST(least({_CHUNK_W}, n_tokens - g.i * {_CHUNK_S}) AS BIGINT)
                   AS len_tok
        FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
    """,
    description=f"sliding-window context chunking: each document's "
    f"token stream cut into width-{_CHUNK_W} windows at stride "
    f"{_CHUNK_S} (last window clipped, ceil semantics so every token "
    "is covered and no window is fully contained in another) — the "
    "deterministic (doc_id, chunk_id, start, len) plan an embedding / "
    "RAG indexing job executes; row-local generation, zero shuffle, "
    "all-BIGINT arithmetic",
)
def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sized = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    sized = sized.withColumn(
        "n_chunks",
        F.when(F.col("n_tokens") <= _CHUNK_W, F.lit(1).cast("long")).otherwise(
            F.expr(
                f"(n_tokens - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S} + 1"
            )
        ),
    )
    return sized.select(
        "doc_id",
        "n_tokens",
        F.posexplode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id", "_i"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.expr(f"chunk_id * {_CHUNK_S}").cast("long").alias("start_tok"),
        F.least(
            F.lit(_CHUNK_W).cast("long"),
            F.expr(f"n_tokens - chunk_id * {_CHUNK_S}"),
        ).alias("len_tok"),
    )
