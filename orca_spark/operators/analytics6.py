"""Analytics batch 6: chi-square contingency analysis and boundary-
overlap deduplication.

``customer_segment_nation_chi2`` is the Pearson chi-square independence
scan over the market-segment x nation contingency table: per-cell
observed count, expected count under independence (row_total *
col_total / N), and the cell's chi-square contribution
(obs - exp)^2 / exp. Cells with outsized contributions are exactly the
segment-nation skews a data-balance audit flags. The global statistic
is the sum of the surfaced contributions, left per-cell so the audit
can rank cells (and so every number stays order-insensitive).

``dedup_prefix_suffix_overlap`` catches BOUNDARY duplication: document
pairs where one document's trailing k tokens equal another's leading k
tokens — the signature of re-crawled pagination, stitched shards, and
sliding-window re-chunking, which exact and MinHash whole-doc dedup
both miss (the docs as wholes are different). An equality hash-join on
the k-token boundary key finds every such pair exactly.

Determinism: contingency cells, row/col totals, and boundary keys are
integers/strings; expected and contribution values are single IEEE
expressions over integers (identical operand order both engines -> the
identical double), surfaced in the 2^16 fixed-point encoding.

Scale: the chi2 pass is two partial-agg shuffles over a TINY key space
(segments x nations — dims, not facts) plus one-row broadcasts; the
boundary join shuffles on the k-token key, whose cardinality grows
with corpus size (healthy partitioning), and skewed hot keys (a
boilerplate header shared by millions of pages) are exactly what AQE
skew-split handles.

Reference parity: core.clj has no analytics surface; SURVEY §2.5
engine-extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_K = 4  # boundary width in tokens


@register(
    "customer_segment_nation_chi2",
    oracle="""
        WITH cells AS (
            SELECT c_mktsegment AS segment, c_nationkey,
                   CAST(count(*) AS BIGINT) AS observed
            FROM customer
            WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
            GROUP BY 1, 2
        ),
        rowt AS (SELECT segment, CAST(sum(observed) AS BIGINT) AS r
                 FROM cells GROUP BY 1),
        colt AS (SELECT c_nationkey, CAST(sum(observed) AS BIGINT) AS c
                 FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells)
        SELECT segment, n_name AS nation, observed,
               CAST(floor((r * c * 1.0 / n) * 65536) AS BIGINT)
                   AS expected_fp,
               CAST(floor(((observed - r * c * 1.0 / n)
                           * (observed - r * c * 1.0 / n)
                           / (r * c * 1.0 / n)) * 65536) AS BIGINT)
                   AS contrib_fp
        FROM cells
        JOIN rowt USING (segment)
        JOIN colt USING (c_nationkey)
        JOIN nation ON n_nationkey = c_nationkey
        CROSS JOIN tot
    """,
    description="Pearson chi-square independence scan of the market-"
    "segment x nation contingency table: per-cell observed, expected "
    "under independence, and chi2 contribution (2^16 fixed point) — "
    "the segment/geography skew audit; dim-sized key space, partial "
    "aggs + one-row broadcast, all expressions identical-operand-order "
    "IEEE so the doubles match cross-engine",
)
def customer_segment_nation_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isNotNull() & F.col("c_nationkey").isNotNull()
    )
    cells = cust.groupBy(
        F.col("c_mktsegment").alias("segment"), "c_nationkey"
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    rowt = cells.groupBy("segment").agg(F.sum("observed").cast("long").alias("r"))
    colt = cells.groupBy("c_nationkey").agg(
        F.sum("observed").cast("long").alias("c")
    )
    tot = cells.agg(F.sum("observed").cast("long").alias("n"))
    nat = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    exp = F.col("r") * F.col("c") * F.lit(1.0) / F.col("n")
    dev = F.col("observed") - exp
    return (
        cells.join(F.broadcast(rowt), "segment")
        .join(F.broadcast(colt), "c_nationkey")
        .join(nat, F.col("n_nationkey") == F.col("c_nationkey"))
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.col("n_name").alias("nation"),
            "observed",
            F.floor(exp * F.lit(65536.0)).cast("long").alias("expected_fp"),
            F.floor((dev * dev / exp) * F.lit(65536.0))
            .cast("long")
            .alias("contrib_fp"),
        )
    )


@register(
    "dedup_prefix_suffix_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS w
            FROM documents WHERE text IS NOT NULL
        ),
        ends AS (
            SELECT doc_id,
                   array_to_string(w[1:{_K}], ' ') AS prefix_key,
                   array_to_string(w[-{_K}:], ' ') AS suffix_key
            FROM toks WHERE len(w) >= {_K}
        )
        SELECT a.doc_id AS tail_doc_id, b.doc_id AS head_doc_id,
               a.suffix_key AS boundary_key
        FROM ends a JOIN ends b
          ON a.suffix_key = b.prefix_key AND a.doc_id <> b.doc_id
    """,
    description="boundary-duplication dedup: pairs where one document's "
    "trailing 4 tokens equal another's leading 4 tokens — re-crawled "
    "pagination / stitched-shard / re-chunking signature that whole-doc "
    "exact and MinHash dedup miss; exact equality hash-join on the "
    "boundary key (key cardinality grows with the corpus, AQE "
    "skew-split covers boilerplate hot keys)",
)
def dedup_prefix_suffix_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != F.lit("")).alias("w"),
    ).where(F.size("w") >= _K)
    ends = toks.select(
        "doc_id",
        F.array_join(F.slice("w", 1, _K), " ").alias("prefix_key"),
        F.array_join(F.slice(F.col("w"), F.size("w") - _K + 1, _K), " ").alias(
            "suffix_key"
        ),
    )
    a = ends.select(
        F.col("doc_id").alias("tail_doc_id"),
        F.col("suffix_key").alias("boundary_key"),
    )
    b = ends.select(
        F.col("doc_id").alias("head_doc_id"),
        F.col("prefix_key").alias("pk"),
    )
    return (
        a.join(b, a.boundary_key == b.pk)
        .where(F.col("tail_doc_id") != F.col("head_doc_id"))
        .select("tail_doc_id", "head_doc_id", "boundary_key")
    )
