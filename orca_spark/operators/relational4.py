"""Relational surface, batch 4: nation-pair trade (TPC-H Q7 shape),
distribution window functions, rolling time-window aggregates, regex
extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "q7_nation_trade",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_3', 'NATION_7')
              AND n2.n_name IN ('NATION_3', 'NATION_7')
              AND n1.n_name <> n2.n_name
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: bilateral nation trade volume by year — double "
    "dim broadcast, fact joins under AQE",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    nations = load(spark, sf_dir, "nation")
    n1 = F.broadcast(nations.where(F.col("n_name").isin("NATION_3", "NATION_7")).alias("n1"))
    n2 = F.broadcast(nations.where(F.col("n_name").isin("NATION_3", "NATION_7")).alias("n2"))
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, s.s_nationkey == F.col("n1.n_nationkey"))
        .join(n2, c.c_nationkey == F.col("n2.n_nationkey"))
        .where(F.col("n1.n_name") != F.col("n2.n_name"))
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "window_distribution",
    oracle="""
        SELECT o_orderkey,
               ntile(4)       OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey NULLS FIRST)
    """,
    description="distribution window functions: ntile quartiles, "
    "percent_rank, cume_dist over a global ordering. NOTE: an unpartitioned "
    "window is inherently single-reducer; at 100 TB prefer approx "
    "percentile cutoffs (percentile_approx) or partition the ranking",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_distribution_scalable",
    oracle="""
        SELECT o_orderkey,
               ntile(4)       OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey NULLS FIRST)
    """,
    description="EXACT distribution stats (ntile/percent_rank/cume_dist) "
    "without the single-reducer global window: range-repartition on the "
    "sort key, rank locally per partition in parallel, then add broadcast "
    "cumulative partition offsets — the classic two-phase distributed "
    "ranking. Identical results to window_distribution at any scale",
)
def window_distribution_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    # materialize the partitioning: range-exchange boundary sampling is
    # seeded per-job, so without this the counts job and the final query
    # could land rows in different partitions and corrupt the offsets
    ranged = (
        o.repartitionByRange(n_parts, "o_totalprice", "o_orderkey")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-partition counts are tiny (one row per partition) — collect them,
    # turn into cumulative offsets, and ship back as a literal map
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(n for _, n in counts)
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("_pid")
    )
    # the ordering (o_totalprice, o_orderkey) is unique, so
    # rank == row_number, percent_rank == (rank-1)/(n-1), cume_dist == rank/n
    lw = W.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    ranked = ranged.withColumn(
        "_grank", off_expr + F.row_number().over(lw)
    )
    # ntile(4) over n rows: the first n%4 tiles take ceil(n/4) rows each
    q, r = divmod(total, 4)
    big = r * (q + 1)
    quartile = F.when(
        F.col("_grank") <= big, ((F.col("_grank") - 1) / (q + 1)).cast("int") + 1
    ).otherwise(((F.col("_grank") - 1 - big) / F.greatest(F.lit(q), F.lit(1))).cast("int") + r + 1)
    return ranked.select(
        "o_orderkey",
        quartile.alias("quartile"),
        F.round((F.col("_grank") - 1) / F.lit(max(total - 1, 1)), 6).alias("pct_rank"),
        F.round(F.col("_grank") / F.lit(total), 6).alias("cume"),
    )


@register(
    "events_rolling_7day",
    oracle="""
        WITH daily AS (
            -- no position in time => no day bucket (also sidesteps a
            -- DuckDB 1.0 window-sort quirk where a NULL timestamp from
            -- a parquet scan ties with epoch-0 under NULLS FIRST)
            SELECT date_trunc('day', ts) AS day, count(*) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT day, n,
               CAST(sum(n) OVER (ORDER BY day
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7day
        FROM daily
    """,
    description="rolling 7-day event counts: daily pre-aggregation (tiny) "
    "then an ordered window — never a per-event range scan",
)
def events_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events have no day bucket — excluded on both engines
    e = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # day stays a timestamp: DATE round-trips differently through the
    # comparison layer (datetime.date vs datetime64) than TIMESTAMP does
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select("day", "n", F.sum("n").over(w).alias("n_7day"))


@register(
    "correlated_min_per_group",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal
        FROM supplier s
        WHERE s_acctbal = (SELECT min(s_acctbal) FROM supplier i
                           WHERE i.s_nationkey = s.s_nationkey)
    """,
    description="correlated min subquery (TPC-H Q2 shape): the row(s) "
    "achieving each group's minimum, decorrelated to a join on the agg",
)
def correlated_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    mins = s.groupBy(F.col("s_nationkey").alias("k")).agg(F.min("s_acctbal").alias("m"))
    return (
        s.join(mins, (s.s_nationkey == mins.k) & (s.s_acctbal == mins.m))
        .select("s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "scalar_regex_extract",
    oracle=r"""
        SELECT event_id,
               CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
                    AS BIGINT)                                          AS k_value,
               regexp_matches(props, '^\{.*\}$')                        AS looks_like_json
        FROM events
    """,
    description="regex extraction + predicate over the JSON-ish props "
    "column (codegen'd regexp, no UDF)",
)
def scalar_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # no-match yields '' — nullif before the cast (ANSI aborts on '')
        F.nullif(
            F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit("")
        ).cast("long").alias("k_value"),
        F.col("props").rlike(r"^\{.*\}$").alias("looks_like_json"),
    )

