"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting handles most cases at runtime; explicit
salting is the deterministic fallback when one key dominates (the
classic hot-user / hot-token case in event and text data). The salt is
derived from a stable row attribute with ``xxhash64`` — deterministic
across runs, no ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the fact side salted into ``buckets`` sub-keys and
    the dim side replicated per salt — splits a hot key across
    ``buckets`` reducers. Result rows identical to the plain join."""
    salted_fact = fact.withColumn("_salt", F.pmod(F.xxhash64(salt_from), F.lit(buckets)))
    salted_dim = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    joined = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact._salt == salted_dim._salt),
    )
    return joined.drop("_salt")


def salted_aggregate(
    df: DataFrame, key: str, salt_from: str, aggs: list, buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation through a salt: partial agg on (key, salt),
    final agg on key. For algebraic aggregates (sum/count/min/max) the
    result equals the direct groupBy; the hot key's partials spread
    over ``buckets`` reducers first."""
    partial = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_from), F.lit(buckets))
    ).groupBy(key, "_salt").agg(*aggs)
    # re-aggregate the partials: sum of sums / sum of counts / min of mins…
    finals = []
    for f in partial.schema.fields[2:]:
        name = f.name
        if name.startswith("min_"):
            finals.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            finals.append(F.max(name).alias(name))
        else:  # sums and counts both re-combine by summation
            finals.append(F.sum(name).alias(name))
    return partial.groupBy(key).agg(*finals)


@register(
    "skew_salted_join",
    oracle="""
        SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    description="salted join (8 deterministic buckets, dim replicated) — "
    "result-identical to the plain join, hot keys split across reducers",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(e, c, "user_id", "c_custkey", salt_from="event_id", buckets=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )


@register(
    "skew_salted_aggregate",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT)  AS cnt_events,
               round(sum(value), 4)      AS sum_value
        FROM events
        GROUP BY event_type
    """,
    description="two-phase salted aggregation (16 buckets): partials on "
    "(key, salt), recombined on key — equals the direct groupBy",
)
def skew_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    out = salted_aggregate(
        e,
        "event_type",
        salt_from="event_id",
        aggs=[
            F.count(F.lit(1)).alias("cnt_events"),
            F.sum("value").alias("sum_value"),
        ],
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("cnt_events").alias("cnt_events"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@register(
    "skew_key_profile",
    oracle="""
        WITH kc AS (
            SELECT o_custkey AS key, count(*) AS c
            FROM orders GROUP BY o_custkey
        ),
        stats AS (
            SELECT CAST(max(c) AS DOUBLE) / avg(c) AS skew_ratio FROM kc
        )
        SELECT key, c AS n_rows,
               round((SELECT skew_ratio FROM stats), 4) AS skew_ratio
        FROM kc
        ORDER BY c DESC, key
        LIMIT 10
    """,
    description="join-key skew profiler: per-key counts (one partial-agg "
    "pass), the top heavy hitters via TakeOrdered (never a global "
    "sort), and the max/avg skew ratio — the diagnostic that decides "
    "whether a join needs salting or AQE skew splitting BEFORE it runs; "
    "at 100 TB this one cheap pass is how the 16-bucket salt factor in "
    "salted_join/salted_aggregate gets chosen",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    kc = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = kc.agg(
        (F.max("n_rows").cast("double") / F.avg("n_rows")).alias("skew_ratio")
    )
    return (
        kc.crossJoin(F.broadcast(stats))
        .select("key", "n_rows", F.round("skew_ratio", 4).alias("skew_ratio"))
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(10)
    )


@register(
    "join_cardinality_estimate",
    oracle="""
        WITH a AS (SELECT o_custkey AS key, count(*) AS ca
                   FROM orders GROUP BY o_custkey),
        b AS (SELECT c_custkey AS key, count(*) AS cb
              FROM customer GROUP BY c_custkey)
        SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS join_rows,
               CAST((SELECT count(*) FROM orders) AS BIGINT)   AS left_rows,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS right_rows
        FROM a JOIN b ON a.key = b.key
    """,
    description="exact pre-join cardinality: sum over shared keys of "
    "count_left x count_right, computed from the two key-count tables "
    "(key-cardinality-sized, not row-sized) — predicts the join's "
    "output rows WITHOUT running the join; the guard that catches an "
    "accidental many-to-many blow-up before it costs a 100 TB shuffle",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    a = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = c.groupBy(F.col("c_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    est = a.join(b, "key").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("join_rows")
    )
    lr = o.agg(F.count(F.lit(1)).cast("long").alias("left_rows"))
    rr = c.agg(F.count(F.lit(1)).cast("long").alias("right_rows"))
    return est.crossJoin(F.broadcast(lr)).crossJoin(F.broadcast(rr))
