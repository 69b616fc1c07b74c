"""Composed pipeline #2: the RAG/embedding ingestion plan.

``pipeline_chunk_dedup_index`` chains the layout and dedup families
into the plan every retrieval-index build runs: documents → sliding
token windows (packing.py's width-64/stride-32 chunking) → chunk-text
materialization → EXACT CHUNK-LEVEL DEDUP (cross-document: the same
boilerplate paragraph appearing in 10k documents embeds ONCE) → the
surviving (chunk key, owner doc, offsets) index rows. Chunk-level
dedup is where the money is in a real ingestion pipeline — embedding
compute scales with surviving chunks, and boilerplate is exactly what
duplicates at chunk granularity even when whole documents don't.

Because every stage is declarative, the whole pipeline is one plan:
the chunk generator fuses into the scan projection and the dedup is
the single shuffle (groupBy chunk hash, min-owner survivor), so
composition again adds zero extra passes over the corpus.

Determinism: chunk boundaries are the BIGINT arithmetic of
corpus_chunk_windows; the survivor per chunk key is the (doc_id,
chunk_id)-minimal owner; the chunk key surfaces as md5 text (both
engines hash the identical reconstructed chunk string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.packing import _CHUNK_S, _CHUNK_W
from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "pipeline_chunk_dedup_index",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE text IS NOT NULL
        ),
        sized AS (
            SELECT doc_id, ts, len(ts) AS n_tokens,
                   CASE WHEN len(ts) <= {_CHUNK_W} THEN CAST(1 AS BIGINT)
                        ELSE (len(ts) - {_CHUNK_W} + {_CHUNK_S} - 1)
                             // {_CHUNK_S} + 1
                   END AS n_chunks
            FROM toks WHERE len(ts) > 0
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(g.i AS BIGINT) AS chunk_id,
                   CAST(g.i * {_CHUNK_S} AS BIGINT) AS start_tok,
                   CAST(least({_CHUNK_W}, n_tokens - g.i * {_CHUNK_S}) AS BIGINT)
                       AS len_tok,
                   md5(array_to_string(
                       list_slice(ts, g.i * {_CHUNK_S} + 1,
                                  g.i * {_CHUNK_S}
                                  + least({_CHUNK_W},
                                          n_tokens - g.i * {_CHUNK_S})),
                       ' ')) AS chunk_md5
            FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
        ),
        survivors AS (
            SELECT chunk_md5,
                   min(doc_id * 1000000 + chunk_id) AS owner_key,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM chunks GROUP BY chunk_md5
        )
        SELECT c.chunk_md5, c.doc_id, c.chunk_id, c.start_tok, c.len_tok,
               s.n_copies
        FROM chunks c
        JOIN survivors s
          ON s.chunk_md5 = c.chunk_md5
         AND s.owner_key = c.doc_id * 1000000 + c.chunk_id
    """,
    description="composed RAG ingestion plan: sliding-window chunking "
    "-> chunk-text reconstruction -> exact CHUNK-LEVEL dedup across "
    "documents (the boilerplate paragraph shared by 10k docs embeds "
    "once) -> surviving (chunk key, minimal owner, offsets, copy "
    "count) index rows — embedding compute scales with survivors, and "
    "the whole pipeline is one plan with the dedup groupBy as its "
    "single shuffle",
)
def pipeline_chunk_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return chunk_dedup_index(docs)


def chunk_dedup_index(docs: DataFrame) -> DataFrame:
    """The chunk→dedup stages as a reusable plan fragment (pipeline3's
    RAG composition chains it into embed-join → budget pack)."""
    sized = (
        docs.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("ts"),
        )
        .withColumn("n_tokens", F.size("ts").cast("long"))
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "n_chunks",
            F.when(F.col("n_tokens") <= _CHUNK_W, F.lit(1).cast("long")).otherwise(
                F.expr(
                    f"(n_tokens - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S} + 1"
                )
            ),
        )
    )
    chunks = (
        sized.select(
            "doc_id",
            "ts",
            "n_tokens",
            F.posexplode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(f"chunk_id * {_CHUNK_S}").cast("long").alias("start_tok"),
            F.least(
                F.lit(_CHUNK_W).cast("long"),
                F.expr(f"n_tokens - chunk_id * {_CHUNK_S}"),
            ).alias("len_tok"),
            F.md5(
                F.array_join(
                    F.expr(
                        f"slice(ts, chunk_id * {_CHUNK_S} + 1, "
                        f"least({_CHUNK_W}, n_tokens - chunk_id * {_CHUNK_S}))"
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )
    survivors = chunks.groupBy("chunk_md5").agg(
        F.min(F.expr("doc_id * 1000000 + chunk_id")).alias("owner_key"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    c = chunks.alias("c")
    s = survivors.alias("s")
    return c.join(
        s,
        (F.col("c.chunk_md5") == F.col("s.chunk_md5"))
        & (
            F.col("c.doc_id") * 1000000 + F.col("c.chunk_id")
            == F.col("s.owner_key")
        ),
    ).select(
        F.col("c.chunk_md5").alias("chunk_md5"),
        "c.doc_id",
        "c.chunk_id",
        "c.start_tok",
        "c.len_tok",
        "s.n_copies",
    )


# NOTE on the survivor owner key: doc_id * 1_000_000 + chunk_id is a
# total order only while chunk_id < 1e6 — i.e. documents under ~32M
# tokens at stride 32, far above any real document. A corpus that
# genuinely violates it should switch the survivor selection to
# min(struct(doc_id, chunk_id)), at the cost of a struct-typed
# aggregate the SQL oracle must mirror with arg_min.
