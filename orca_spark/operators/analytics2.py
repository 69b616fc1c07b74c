"""Market-structure analytics and the composed dedup funnel.

* ``brand_supplier_hhi`` — the Herfindahl–Hirschman concentration
  index of supplier revenue share per part brand: the standard
  market-structure statistic (10000 = single supplier, → 0 =
  perfectly fragmented). The procurement-risk companion to
  ``corpus_gini_concentration``'s corpus view — the same
  shares-of-a-total shape graded on a different axis.
* ``pipeline_dedup_funnel`` — the dedup FUNNEL: per source, document
  counts surviving each stage of the standard cascade — raw → exact
  dedup (keep each identical text's lowest doc_id, globally) →
  near-dup dedup (keep each >=0.9-Jaccard connected component's
  lowest doc_id). This is the one-table answer to "what did dedup
  actually cost each source", composed from the SAME building blocks
  as ``dedup_exact_survivors`` and ``dedup_connected_components`` —
  and value-checked end-to-end against a DuckDB oracle that recomputes
  the exact pair graph and its recursive transitive closure.

Determinism: HHI shares derive from BIGINT revenue cents (identical
doubles, rounded at the surface); the funnel is all BIGINT counts
over min-id survivor rules (set-determined, no floats), with the
removal percentage rounded at the surface.

Scale: HHI is two map-side-combinable aggregations ending at brand
cardinality. The funnel's expensive stage is the near-dup component
computation — the engine side reuses dedup.py's contracted adaptive
pair generation + pointer-jumping components (never all-pairs; the
O(n²) form exists only in the ORACLE, whose job is to be obviously
correct, not fast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "brand_supplier_hhi",
    oracle="""
        WITH rev AS (
            SELECT p.p_brand, l.l_suppkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_suppkey IS NOT NULL AND p.p_brand IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT p_brand, CAST(sum(cents) AS BIGINT) AS brand_cents
            FROM rev GROUP BY p_brand
        )
        SELECT r.p_brand,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum((r.cents * 10000.0 / t.brand_cents)
                         * (r.cents * 1.0 / t.brand_cents)), 4) AS hhi
        FROM rev r JOIN tot t USING (p_brand)
        WHERE t.brand_cents > 0
        GROUP BY r.p_brand
    """,
    description="Herfindahl-Hirschman supplier-concentration index per "
    "part brand (10000 = sole supplier): sum over suppliers of squared "
    "revenue share x10000 — the procurement-risk statistic; shares "
    "derive from BIGINT revenue cents so per-supplier terms are "
    "identical doubles, the brand-level sum rounded at the surface; "
    "two map-side-combinable aggregations ending at brand cardinality",
)
def brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_suppkey").isNotNull())
    part = load(spark, sf_dir, "part").where(F.col("p_brand").isNotNull())
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("cents")
        )
    )
    tot = rev.groupBy("p_brand").agg(F.sum("cents").alias("brand_cents"))
    share_sq = (F.col("cents") * 10000.0 / F.col("brand_cents")) * (
        F.col("cents") * 1.0 / F.col("brand_cents")
    )
    return (
        rev.join(tot, "p_brand")
        .where(F.col("brand_cents") > 0)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share_sq), 4).alias("hhi"),
        )
    )


@register(
    "pipeline_dedup_funnel",
    oracle="""
        WITH docs AS (
            SELECT doc_id, source, text FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        ),
        exact_surv AS (
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       min(doc_id) OVER (PARTITION BY text) AS keeper
                FROM docs
            ) WHERE doc_id = keeper
        ),
        sets AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
            FROM docs
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sets a JOIN sets b
              ON a.doc_id < b.doc_id
             AND len(list_intersect(a.s, b.s))
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                 >= 0.9
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
            UNION SELECT doc_id, doc_id FROM docs
        ),
        reach AS MATERIALIZED (
            WITH RECURSIVE r AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
            ) SELECT * FROM r
        ),
        clusters AS (
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        ),
        near_surv AS (
            SELECT d.doc_id, d.source
            FROM docs d JOIN clusters c USING (doc_id)
            WHERE d.doc_id = c.cluster_id
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST((SELECT count(*) FROM exact_surv e
                     WHERE e.source IS NOT DISTINCT FROM d.source)
                    AS BIGINT) AS n_exact_survivors,
               CAST((SELECT count(*) FROM near_surv n
                     WHERE n.source IS NOT DISTINCT FROM d.source)
                    AS BIGINT) AS n_neardup_survivors,
               round((count(*) - (SELECT count(*) FROM near_surv n
                                  WHERE n.source IS NOT DISTINCT FROM d.source))
                     * 100.0 / count(*), 4) AS pct_removed
        FROM docs d
        GROUP BY d.source
    """,
    description="the dedup funnel per source: raw docs -> exact-text "
    "survivors (global min-id per identical text) -> near-dup "
    "survivors (global min-id per >=0.9-Jaccard connected component), "
    "with the total removal percentage — the one-table answer to what "
    "dedup cost each source, composed from the engine's contracted "
    "adaptive pair generation + pointer-jumping components and checked "
    "against a recursive-closure oracle; all BIGINT counts, "
    "set-determined survivor rules, percentage rounded at the surface",
)
def pipeline_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from orca_spark.operators.dedup import dedup_connected_components

    docs = load(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    # stage 1: exact survivors — min doc_id per identical text, via a
    # window (NULL-safe on text is moot post-filter; source can be NULL
    # and stays a group)
    exact_surv = (
        docs.withColumn(
            "keeper", F.min("doc_id").over(W.partitionBy("text"))
        )
        .where(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "source")
    )
    # stage 2: near-dup survivors — reuse the registered component
    # operator (contracted candidates + pointer jumping) wholesale
    clusters = dedup_connected_components(spark, sf_dir)
    near_surv = (
        docs.join(clusters, "doc_id")
        .where(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id", "source")
    )
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # distinct column names before joining: all three aggregates share
    # docs' lineage, so same-named join conditions resolve trivially true
    ex = exact_surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_exact_survivors")
    ).withColumnRenamed("source", "src_e")
    nr = near_surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_neardup_survivors")
    ).withColumnRenamed("source", "src_n")
    # NULL-safe joins: a NULL source is a real group in every stage
    joined = (
        raw.join(ex, F.col("source").eqNullSafe(F.col("src_e")), "left")
        .drop("src_e")
        .join(nr, F.col("source").eqNullSafe(F.col("src_n")), "left")
        .drop("src_n")
    )
    return joined.select(
        "source",
        "n_docs",
        F.coalesce("n_exact_survivors", F.lit(0).cast("long")).alias(
            "n_exact_survivors"
        ),
        F.coalesce("n_neardup_survivors", F.lit(0).cast("long")).alias(
            "n_neardup_survivors"
        ),
        F.round(
            (
                F.col("n_docs")
                - F.coalesce("n_neardup_survivors", F.lit(0).cast("long"))
            )
            * F.lit(100.0)
            / F.col("n_docs"),
            4,
        ).alias("pct_removed"),
    )
