"""Text batch 4: the training-data assembly stage.

After dedup/quality/similarity (earlier modules), a pretraining pipeline
still has to CUT the corpus into model-shaped pieces:

* ``text_chunk_windows`` — overlapping fixed-size token windows per
  document (size ``_CHUNK``, stride ``_STRIDE``): the standard long-doc
  treatment before tokenization. Pure codegen (split → sequence →
  slice → posexplode), shuffle-free, output ~n_tokens/stride rows/doc.

* ``text_greedy_pack`` — concatenation packing: documents are streamed
  in deterministic order and cut into fixed token budgets
  (``_BUDGET``), the way training sequences are packed from a shuffled
  corpus. Packing state is a running token count — ONE window cumsum
  within each of 16 deterministic md5 partitions (parallel, no global
  order), each doc tagged with the pack it starts in and its offset.
  Reproducible across engines, runs, and partitionings.

* ``documents_train_val_test`` — deterministic 3-way split on the
  CONTENT hash (train ~12/16, val ~2/16, test ~2/16): same md5-nibble
  primitive as the sampling operators, so membership is a pure function
  of document content — stable under re-partitioning, re-ingestion,
  and engine choice.

* ``dedup_cross_split_contamination`` — decontamination: test-split
  documents sharing a winnowing fingerprint with any train-split
  document (the train/test leakage check run before every evaluation).
  Composes the split with text3's fingerprints; the join is
  fingerprint-keyed (8-byte-ish keys), never document-pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.operators.text3 import winnowing_fingerprints
from orca_spark.registry import register
from orca_spark.tables import load

_CHUNK = 50     # tokens per window
_STRIDE = 40    # window stride (10-token overlap)
_BUDGET = 256   # tokens per packed training sequence

# split boundaries on the first md5 nibble of the text: 0-b train (12/16),
# c-d val (2/16), e-f test (2/16)
_SPLIT_CASE_SQL = (
    "CASE WHEN substr(md5(text), 1, 1) < 'c' THEN 'train' "
    "WHEN substr(md5(text), 1, 1) < 'e' THEN 'val' ELSE 'test' END"
)


@register(
    "text_chunk_windows",
    oracle=f"""
        SELECT doc_id, ch.i AS chunk_idx, ch.c AS chunk_text,
               ch.n AS n_chunk_tokens
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(0, ((len(tk) - 1) // {_STRIDE}) + 1),
                       i -> {{'i': i,
                             'c': array_to_string(tk[i*{_STRIDE}+1 : i*{_STRIDE}+{_CHUNK}], ' '),
                             'n': least({_CHUNK}, len(tk) - i*{_STRIDE})}})) AS ch
            FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        )
    """,
    description=f"overlapping token windows per document (size {_CHUNK}, "
    f"stride {_STRIDE}): the long-document chunking pass before "
    "tokenization — split/sequence/slice codegen, shuffle-free",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = F.expr(
        f"transform(sequence(0, cast((size(split(text, ' ')) - 1) / {_STRIDE} as int)), "
        f"i -> named_struct("
        f"'c', concat_ws(' ', slice(split(text, ' '), i*{_STRIDE} + 1, {_CHUNK})), "
        f"'n', least({_CHUNK}, size(split(text, ' ')) - i*{_STRIDE})))"
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "ch")
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("ch.c").alias("chunk_text"),
        F.col("ch.n").alias("n_chunk_tokens"),
    )


@register(
    "text_greedy_pack",
    oracle=f"""
        WITH sized AS (
            SELECT doc_id,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS part,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        placed AS (
            SELECT doc_id, part, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM sized
        )
        SELECT doc_id, part, n_tokens,
               CAST((cum - n_tokens) // {_BUDGET} AS BIGINT) AS pack_id,
               CAST((cum - n_tokens) % {_BUDGET} AS BIGINT) AS pack_offset
        FROM placed
    """,
    description=f"concatenation packing into {_BUDGET}-token training "
    "sequences: docs streamed in deterministic order within 16 md5 "
    "partitions, each tagged with the pack it starts in and its offset "
    "— one window cumsum per partition, no global ordering, "
    "reproducible across engines and partitionings",
)
def text_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("part"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = W.partitionBy("part").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    placed = sized.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return placed.select(
        "doc_id",
        "part",
        "n_tokens",
        (start / _BUDGET).cast("long").alias("pack_id"),
        (start % _BUDGET).cast("long").alias("pack_offset"),
    )


@register(
    "documents_train_val_test",
    oracle=f"""
        SELECT doc_id, {_SPLIT_CASE_SQL} AS split
        FROM documents
    """,
    description="deterministic train/val/test split (~75/12.5/12.5) on "
    "the CONTENT md5 nibble: membership is a pure function of the "
    "document text — stable under repartitioning, re-ingestion, and "
    "engine choice; identical duplicates always land in the same split",
)
def documents_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.expr(_SPLIT_CASE_SQL).alias("split"))


@register(
    "dedup_cross_split_contamination",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_SPLIT_CASE_SQL} AS split, string_split(text, ' ') AS tk
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ),
        g0 AS (
            SELECT doc_id, split, len(tk) - 2 AS n_grams,
                   unnest(list_transform(range(1, len(tk) - 1),
                       i -> {{'pos': i,
                             'h': substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 16)}})) AS ph
            FROM t
        ),
        wm AS (
            SELECT doc_id, split, ph.pos AS pos, n_grams,
                   min(ph.h) OVER (PARTITION BY doc_id ORDER BY ph.pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g0
        ),
        fps AS (
            SELECT DISTINCT doc_id, split, fp
            FROM wm WHERE pos <= greatest(n_grams - 3, 1)
        )
        SELECT te.doc_id, count(DISTINCT te.fp) AS n_shared_fps
        FROM fps te
        JOIN (SELECT DISTINCT fp FROM fps WHERE split = 'train') tr
          ON te.fp = tr.fp
        WHERE te.split = 'test'
        GROUP BY te.doc_id
    """,
    description="train/test decontamination: test documents sharing a "
    "winnowing fingerprint with ANY train document, with the shared-"
    "fingerprint count — the leakage check before every eval. Join is "
    "fingerprint-keyed (train side deduplicated to distinct "
    "fingerprints), never document-pairwise",
)
def dedup_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    split = d.select("doc_id", F.expr(_SPLIT_CASE_SQL).alias("split"))
    fps = winnowing_fingerprints(d).join(split, "doc_id")
    train_fps = fps.where(F.col("split") == "train").select("fp").distinct()
    test_fps = fps.where(F.col("split") == "test")
    return (
        test_fps.join(train_fps, "fp")
        .groupBy("doc_id")
        .agg(F.count_distinct("fp").alias("n_shared_fps"))
    )
