"""Shared prefix-filter candidate generation (SSJoin blocking).

One implementation of the machinery two operators must keep in
lockstep (``graph.neardup_edges``, ``similarity4``): tokens globally
ordered by document frequency, each document indexing only a prefix of
its rarest tokens, candidates = pairs whose prefixes share a token.
For a Jaccard threshold t the prefix length ``sz - ceil(t*sz) + 1``
makes the block recall-1 (prefix theorem); a fixed-K prefix makes it a
deliberate recall trade. Either way the caller owns the verify step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# explicit fan-out width for the bucket self-join: the prefix table is
# tiny relative to its join OUTPUT (dense dup families make candidates
# quadratic in family size), and AQE — sizing stages by INPUT — would
# coalesce it to one partition and run the expansion serially
# (measured 100 s -> 2.5 s at sf0.1)
_EXPAND_WIDTH = 32


def prefix_candidates(exploded: DataFrame, prefix_len: Column) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing a prefix token.

    ``exploded`` holds one row per DISTINCT (doc_id, w) — plus any
    columns ``prefix_len`` references (e.g. a per-doc set size). Tokens
    are ranked per document by global document frequency (rarest
    first, ``(df, w)`` total order so the rank is deterministic), and
    only ranks <= ``prefix_len`` are indexed.
    """
    freq = exploded.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    rn = F.row_number().over(W.partitionBy("doc_id").orderBy("df", "w"))
    prefix = (
        exploded.join(freq, "w")
        .withColumn("rn", rn)
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "w")
        .repartition(_EXPAND_WIDTH, "w")
    )
    return (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
