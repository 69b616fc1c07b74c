"""Apply trained BPE merges back to the corpus: exact token accounting.

``text_bpe_apply_token_counts`` = train the ``bpe.py`` merges, then
tokenize every document with them and report per-document token counts
— the number a context-window packer, a mixture planner, or a billing
estimate actually needs (cf. ``text_bpe_token_estimate``, which only
approximates with a fixed regex).

The apply step is PURE JVM via the separator-replace trick: a word's
symbols are encoded as ``␟s1␟s2␟...␟`` and merge (l, r) is the literal
replacement ``␟l␟r␟ → ␟lr␟``. Because each match consumes its trailing
separator, the engine's standard scan-forward replace IS the greedy
left-to-right non-overlapping BPE merge ("␟a␟a␟a␟" → "␟aa␟a␟"), and
multi-symbol tokens from earlier merges compose for free. Six chained
``replace`` calls run inside whole-stage codegen — no Python in the
apply path; the only driver work is the trainer's one-row argmax per
merge.

Words containing the separator char itself (U+001F) are excluded from
the count on BOTH engines — the one input class the encoding cannot
represent; real tokenizers byte-escape it, a unit-separator control
char carries no token signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.bpe import _N_MERGES, _bpe_train_ctes, bpe_train
from orca_spark.registry import register
from orca_spark.tables import load

_SEP = "\x1f"


def _bpe_apply_oracle_sql(n_merges: int = _N_MERGES) -> str:
    """Extends the trainer's CTE prefix (t0..t{n-1} hold the learned
    merges) with the corpus apply: the same separator-replace per step,
    LEFT JOIN ON TRUE so an exhausted vocabulary (empty t{i}) passes
    the text through unchanged instead of deleting it."""
    steps = []
    for i in range(n_merges):
        steps.append(f"""
enc{i + 1} AS (
  SELECT doc_id,
         CASE WHEN t.l IS NULL THEN s
              ELSE replace(s, chr(31) || t.l || chr(31) || t.r || chr(31),
                              chr(31) || t.l || t.r || chr(31)) END AS s
  FROM enc{i} LEFT JOIN t{i} t ON TRUE
)""")
    return (
        "WITH "
        + _bpe_train_ctes(n_merges)
        + """,
enc0 AS (
  SELECT doc_id,
         chr(31) || array_to_string(string_split(word, ''), chr(31))
                 || chr(31) AS s
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE text IS NOT NULL
  )
  WHERE word <> '' AND strpos(word, chr(31)) = 0
),"""
        + ",".join(steps)
        + f"""
SELECT doc_id,
       CAST(sum(len(string_split(s, chr(31))) - 2) AS BIGINT) AS n_tokens
FROM enc{n_merges} GROUP BY doc_id"""
    )


@register(
    "text_bpe_apply_token_counts",
    oracle=_bpe_apply_oracle_sql(),
    description=f"train the {_N_MERGES} BPE merges, then tokenize every "
    "document with them and count tokens per doc — exact token "
    "accounting with the learned tokenizer (vs the regex ESTIMATE in "
    "text_bpe_token_estimate); the apply is pure JVM: symbols encoded "
    "as separator-joined strings, each merge one literal replace whose "
    "consumed trailing separator makes scan-forward replacement exactly "
    "the greedy non-overlapping BPE step",
)
def text_bpe_apply_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: training pays the corpus once (see bpe.py); the apply is
    one scan with 6 codegen'd replaces and a doc_id-keyed partial-agg
    sum — no Python, no extra shuffle beyond the final groupBy. The
    merge literals arrive via the trainer's one-row collects, the same
    model-sized driver traffic every tokenizer deployment ships."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    merges = bpe_train(vocab, cache_key=sf_dir)

    applied = words.where(~F.col("word").contains(_SEP))
    enc = F.concat(
        F.lit(_SEP),
        F.array_join(
            F.filter(F.split("word", ""), lambda c: c != F.lit("")), _SEP
        ),
        F.lit(_SEP),
    )
    for _rank, left, right, _n in merges:
        enc = F.replace(
            enc, F.lit(_SEP + left + _SEP + right + _SEP),
            F.lit(_SEP + left + right + _SEP),
        )
    return (
        applied.select("doc_id", (F.size(F.split(enc, _SEP)) - 2).alias("t"))
        .groupBy("doc_id")
        .agg(F.sum("t").alias("n_tokens"))
    )
