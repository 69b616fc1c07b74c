"""Scalar/array surface batch: deterministic sampling, array
higher-order functions, JSON struct parsing, null-handling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "deterministic_sample_10pct",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 1)
              IN ('0', '1')
    """,
    description="deterministic ~12.5%% sample via content hash (md5 nibble) "
    "— reproducible across engines/runs/partitionings, unlike rand()-based "
    "TABLESAMPLE; THE sampling primitive for 100 TB experiment cuts",
)
def deterministic_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rowkey = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    nibble = F.substring(F.md5(F.encode(rowkey, "UTF-8")), 1, 1)
    return li.where(nibble.isin("0", "1")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "array_functions_showcase",
    oracle="""
        WITH nn AS (
            -- NULL elements dropped up front: the engines' array
            -- kernels disagree on them (Spark's fold poisons the sum
            -- to NULL, DuckDB's list_sum skips) — SQL-aggregate
            -- semantics, stated once
            SELECT vec_id, embedding,
                   list_filter(CAST(embedding AS DOUBLE[]),
                               x -> x IS NOT NULL) AS e
            FROM embeddings
        )
        SELECT vec_id,
               CAST(len(embedding) AS INT)                             AS dim,
               round(list_max(e), 4)                                   AS max_val,
               round(list_min(e), 4)                                   AS min_val,
               CAST(len(list_filter(e, x -> x > 0)) AS INT)            AS n_positive,
               round(list_sum(list_transform(e, x -> abs(x))), 4)      AS l1_norm
        FROM nn
    """,
    description="array higher-order functions: size, min/max, filter, "
    "transform+aggregate — all codegen'd, no Python",
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # NULL elements dropped before every kernel (matches the oracle's
    # list_filter): Spark's fold would poison l1 to NULL from one NULL
    # element while DuckDB's list_sum skips it
    e = F.filter(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        lambda x: x.isNotNull(),
    )
    l1 = F.aggregate(
        F.transform(e, lambda x: F.abs(x)), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(e), 4).alias("max_val"),
        F.round(F.array_min(e), 4).alias("min_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.round(l1, 4).alias("l1_norm"),
    )


@register(
    "events_from_json_struct",
    oracle="""
        SELECT event_id, k FROM (
            -- json_valid + TRY_CAST mirror from_json's NULL-on-malformed
            SELECT event_id,
                   CASE WHEN json_valid(props)
                        THEN TRY_CAST(json_extract_string(props, '$.k')
                                      AS BIGINT) END AS k
            FROM events
        ) WHERE k > 50
    """,
    description="typed JSON parsing: from_json into a struct schema (vs "
    "get_json_object string extraction) + pushable predicate on the field",
)
def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", T.StructType([T.StructField("k", T.LongType())])))
    return (
        parsed.where(F.col("p.k") > 50)
        .select("event_id", F.col("p.k").alias("k"))
    )


@register(
    "scalar_null_handling",
    oracle="""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), 'pending')     AS status_norm,
               CASE WHEN nullif(o_orderstatus, 'P') IS NULL
                    THEN 0.0 ELSE round(o_totalprice, 2) END        AS effective_price,
               (o_orderstatus = 'P')                                AS is_pending
        FROM orders
    """,
    description="null-handling surface: nullif/coalesce/conditional "
    "defaults (nvl2 semantics via CASE)",
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    nulled = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.coalesce(nulled, F.lit("pending")).alias("status_norm"),
        F.when(nulled.isNull(), F.lit(0.0))
        .otherwise(F.round("o_totalprice", 2))
        .alias("effective_price"),
        (F.col("o_orderstatus") == "P").alias("is_pending"),
    )
