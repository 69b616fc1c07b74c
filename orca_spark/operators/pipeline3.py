"""Composed pipeline #3: the full RAG corpus build, end to end.

``pipeline_rag_corpus`` is the composition a retrieval deployment
actually ships (r07 verdict item 8): sliding-window chunking →
cross-document exact chunk dedup (pipeline2's fragment) → an
embed-join that attaches each surviving chunk's owner-document
embedding label (the vector table is keyed 1:1 ``vec_id = doc_id``) →
a per-language token-budget pack that admits the highest-VALUE chunks
first. Value here is coverage: a chunk that appeared in many documents
(``n_copies``) answers more retrieval queries per embedded token, so
the greedy rank is (n_copies DESC, doc_id, chunk_id) — total-order
deterministic — and admission stops when the language's cumulative
surviving-chunk tokens pass the budget (hard cut, straddler excluded,
same rule as corpus_budget_pack).

One plan, three shuffles, each irreducible: the dedup groupBy (chunk
key), the owner join back (broadcastable survivor side at any scale —
survivors are the SMALL side by construction), and the per-language
pack window. The embed-join rides the owner join's key (doc_id), so
Catalyst plans it into the same exchange family; nothing rescans the
corpus.

Determinism: every stage is BIGINT arithmetic or md5 text; the
embedding table contributes only its exact INTEGER label (the float
vector itself is consumed by the downstream embedder, not this
manifest), so the composition is cross-engine hash-exact.

Reference parity: core.clj has no pipeline surface; §2.5 LLM-family
extension (composition sibling of pipeline.py / pipeline2.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from orca_spark.operators.packing import _CHUNK_S, _CHUNK_W
from orca_spark.operators.pipeline2 import chunk_dedup_index
from orca_spark.registry import register
from orca_spark.tables import load

_CHUNK_BUDGET = 4096  # surviving-chunk tokens admitted per language


@register(
    "pipeline_rag_corpus",
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
        ),
        index_rows AS (
            SELECT c.chunk_md5, c.doc_id, c.chunk_id, c.start_tok,
                   c.len_tok, s.n_copies
            FROM chunks c
            JOIN survivors s
              ON s.chunk_md5 = c.chunk_md5
             AND s.owner_key = c.doc_id * 1000000 + c.chunk_id
        ),
        embedded AS (
            SELECT i.*, d.lang,
                   CAST(e.label AS BIGINT) AS owner_label
            FROM index_rows i
            JOIN documents d ON d.doc_id = i.doc_id
            JOIN embeddings e ON e.vec_id = i.doc_id
            WHERE d.lang IS NOT NULL
        ),
        packed AS (
            SELECT lang, chunk_md5, doc_id, chunk_id, start_tok, len_tok,
                   n_copies, owner_label,
                   CAST(row_number() OVER w AS BIGINT) AS rnk,
                   CAST(sum(len_tok) OVER (w ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_tokens
            FROM embedded
            WINDOW w AS (PARTITION BY lang
                         ORDER BY n_copies DESC, doc_id, chunk_id)
        )
        SELECT lang, chunk_md5, doc_id, chunk_id, start_tok, len_tok,
               n_copies, owner_label, rnk, cum_tokens
        FROM packed
        WHERE cum_tokens <= {_CHUNK_BUDGET}
    """,
    description="the full RAG corpus build as ONE composed plan: "
    "sliding-window chunking -> cross-document exact chunk dedup -> "
    "embed-join attaching the owner document's embedding label "
    "(vec_id = doc_id) -> per-language token-budget pack admitting "
    "highest-coverage chunks first (n_copies DESC, doc/chunk "
    f"tie-break) under a hard {_CHUNK_BUDGET:,}-token budget — three "
    "irreducible shuffles (dedup groupBy, owner join, pack window), "
    "zero corpus rescans, all-BIGINT/md5 deterministic",
)
def pipeline_rag_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    index_rows = chunk_dedup_index(docs)
    langs = docs.where(F.col("lang").isNotNull()).select("doc_id", "lang")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("label").cast("long").alias("owner_label"),
    )
    embedded = index_rows.join(langs, "doc_id").join(emb, "doc_id")
    w = W.partitionBy("lang").orderBy(
        F.col("n_copies").desc(), "doc_id", "chunk_id"
    )
    packed = embedded.select(
        "lang",
        "chunk_md5",
        "doc_id",
        "chunk_id",
        "start_tok",
        "len_tok",
        "n_copies",
        "owner_label",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("len_tok")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_tokens"),
    )
    return packed.where(F.col("cum_tokens") <= _CHUNK_BUDGET)
