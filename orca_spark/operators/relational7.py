"""Relational batch 7: the remaining TPC-H query patterns, adapted to
the driver schema (no partsupp table, no shipmode/commit-date columns —
each query keeps the PATTERN that makes its TPC-H original
interesting and maps it onto the columns that exist).

Plan notes: dims broadcast (nation/supplier/part are constant-size);
the scalar-subquery thresholds (q11/q20 shapes) compile to a
one-row broadcast, never a shuffle; the multi-exists (q21 shape) is a
semi-join + grouped filter, not a correlated per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "q9_product_profit",
    oracle="""
        SELECT n_name                                   AS nation,
               year(o_orderdate)                        AS o_year,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(1 - l_discount AS DECIMAL(18,4))), 2)
                    AS DOUBLE)                  AS profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%a%'
        GROUP BY 1, 2
    """,
    description="TPC-H q9 pattern (product profit by nation and year): "
    "four-way join fanning a fact against three broadcast dims + the "
    "orders fact, filtered on a part-name predicate, two-level group — "
    "adapted to the schema (no partsupp: profit omits supplycost)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part").where(F.col("p_name").like("%a%")).select("p_partkey")
    )
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nat = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            # DECIMAL accumulation: double sums differ from the oracle by
            # an ulp under Spark's partial-agg ordering, which flips
            # round(x, 2) on boundary groups (seen at sf0.01: 3 of 175
            # groups off by 0.01); exact decimal arithmetic on BOTH
            # engines removes the order sensitivity entirely
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "q11_important_suppliers",
    oracle="""
        WITH v AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))) AS value
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey AS suppkey,
               CAST(round(value, 2) AS DOUBLE) AS value
        FROM v
        WHERE value > (SELECT sum(value) * 0.0102 FROM v)
    """,
    description="TPC-H q11 pattern (important stock): per-supplier value "
    "with a HAVING threshold that is a SCALAR SUBQUERY over the global "
    "total — the threshold compiles to a one-row broadcast, the per-"
    "supplier agg shuffles once; adapted to lineitem value (no partsupp)",
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # decimal accumulation for the same boundary-rounding reason as q9
    v = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        ).alias("value")
    )
    total = v.agg((F.sum("value") * F.lit("0.0102").cast("decimal(6,4)")).alias("thr"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("thr"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.round("value", 2).cast("double").alias("value"),
        )
    )


@register(
    "q12_priority_by_status",
    oracle="""
        SELECT l_linestatus,
               CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                    AS BIGINT) AS high_line_count,
               CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                    AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE year(l_shipdate) = 1995
        GROUP BY l_linestatus
    """,
    description="TPC-H q12 pattern (two-level conditional counts over a "
    "fact-fact join): per-linestatus counts split by order priority "
    "class for one ship year — the filter reaches the lineitem scan, "
    "the conditional split is agg-side, one shuffle; adapted to "
    "orderpriority (no shipmode column)",
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1995)
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q20_part_supply_candidates",
    oracle="""
        WITH apart AS (
            SELECT l_suppkey, sum(l_quantity) AS qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%widget%'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey AS suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM apart
            WHERE qty > (SELECT avg(qty) FROM apart)
        )
    """,
    description="TPC-H q20 pattern (nested IN + HAVING over a scalar "
    "subquery): suppliers whose widget-part quantity exceeds the average "
    "across widget suppliers (scale-invariant threshold) — inner agg "
    "keyed by suppkey, scalar threshold broadcast, outer membership as "
    "a left-semi join",
)
def q20_part_supply_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier")
    apart = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = apart.agg(F.avg("qty").alias("thr"))
    movers = (
        apart.crossJoin(F.broadcast(thr))
        .where(F.col("qty") > F.col("thr"))
        .select("l_suppkey")
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), "s_name")
    )


@register(
    "q21_multi_supplier_orders",
    oracle="""
        WITH multi AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING count(DISTINCT l_suppkey) >= 2
        )
        SELECT s_name,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS numwait
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE l_orderkey IN (SELECT l_orderkey FROM multi)
          AND l_returnflag = 'R'
        GROUP BY s_name
    """,
    description="TPC-H q21 pattern (multi-exists turned into a grouped "
    "semi-join): per-supplier count of returned-line orders that involve "
    "at least two suppliers — the EXISTS probes become one grouped "
    "distinct-count + left-semi join, never a correlated per-row "
    "subquery; adapted to returnflag (no receipt/commit dates)",
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    flagged = li.where(F.col("l_returnflag") == "R").join(
        multi, "l_orderkey", "left_semi"
    )
    return (
        flagged.join(supp, flagged.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "events_props_typed",
    oracle="""
        SELECT event_type,
               CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k,
               round(avg(k), 4)       AS avg_k
        FROM (
            SELECT event_type,
                   CASE WHEN json_valid(props)
                        THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
                        END AS k
            FROM events
        )
        GROUP BY event_type
    """,
    description="typed semi-structured parsing: from_json with an "
    "explicit struct schema (vs events_json_extract's per-path "
    "get_json_object) — one parse per row no matter how many fields are "
    "read, malformed rows surface as NULL structs (counted, not "
    "dropped); the production shape for wide JSON payloads",
)
def events_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k bigint").alias("p")
    )
    k = F.col("p.k")
    return parsed.groupBy("event_type").agg(
        F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("n_unparsed"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@register(
    "events_changelog_compact",
    oracle="""
        SELECT user_id, event_type, ts AS latest_ts, value AS latest_value
        FROM (
            SELECT user_id, event_type, ts, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    description="changelog compaction (SCD1 / upsert-merge semantics): "
    "keep each (user, event_type) key's latest record by event time — "
    "one window shuffle on the key, deterministic event_id tie-break; "
    "the batch form of what the streaming ingest-dedup job does "
    "incrementally",
)
def events_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )


@register(
    "events_scd2_intervals",
    oracle="""
        SELECT user_id, event_type,
               ts                                        AS valid_from,
               coalesce(lead(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                        TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
               lead(ts) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) IS NULL AS is_current,
               value
        FROM events
    """,
    description="SCD2 intervalization: each change record becomes a "
    "validity interval [ts, next_ts) via lead(), the open-ended current "
    "version closed with the conventional high date (2200-01-01 — 9999-12-31 overflows Arrow's ns timestamps on collection) plus an "
    "is_current flag; one window shuffle, the standard "
    "dimension-history build",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit("2200-01-01 00:00:00").cast("timestamp")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
        "value",
    )


@register(
    "join_null_safe_priority",
    oracle="""
        WITH a AS (
            SELECT nullif(o_orderpriority, '3-MEDIUM') AS pk,
                   count(*) AS n_all
            FROM orders GROUP BY 1
        ),
        b AS (
            SELECT nullif(o_orderpriority, '3-MEDIUM') AS pk,
                   count(*) AS n_big
            FROM orders WHERE o_totalprice > 100000 GROUP BY 1
        )
        SELECT coalesce(a.pk, 'MEDIUM-OR-NULL') AS priority,
               n_all, n_big
        FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk
    """,
    description="null-safe equi-join (<=> / IS NOT DISTINCT FROM): the "
    "NULL-keyed groups match each other instead of silently dropping — "
    "the semantics dimension joins over nullable business keys need; "
    "Spark plans it as a regular hash join (NULL hashes to a bucket), "
    "no fallback to nested-loop",
)
def join_null_safe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pk = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    a = o.groupBy(pk.alias("pk")).agg(F.count(F.lit(1)).alias("n_all")).alias("a")
    b = (
        o.where(F.col("o_totalprice") > 100000)
        .groupBy(pk.alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_big"))
        .alias("b")
    )
    return (
        a.join(b, F.col("a.pk").eqNullSafe(F.col("b.pk")))
        .select(
            F.coalesce(F.col("a.pk"), F.lit("MEDIUM-OR-NULL")).alias("priority"),
            "n_all",
            "n_big",
        )
    )


@register(
    "stats_regression_lineitem",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price,
               round(regr_slope(l_extendedprice, l_quantity), 4)  AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6)     AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    description="statistical aggregate family: correlation, sample "
    "covariance and the regr_* linear-regression aggregates per return "
    "flag — all single-pass partial-aggregable moments (one shuffle, "
    "map-side combine), the in-engine alternative to exporting samples "
    "for scipy",
)
def stats_regression_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, p), 4).alias("covar_qty_price"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("intercept"),
        F.round(F.regr_r2(p, q), 6).alias("r2"),
        F.regr_count(p, q).cast("long").alias("n"),
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
        SELECT p_brand, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size IN (1, 2, 3, 4, 5)
          AND l_suppkey IS NOT NULL
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier
              WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL
          )
        GROUP BY p_brand, p_size
    """,
    description="TPC-H q16 pattern (NOT IN exclusion + grouped distinct "
    "count): distinct suppliers per (brand, size) for small parts, "
    "excluding complaint suppliers — NULL keys are filtered explicitly "
    "on both sides so NOT IN's null-aware UNKNOWN semantics and the "
    "anti-join agree by construction; the distinct count is a two-phase "
    "expand aggregate; adapted to acctbal (no comment column)",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_suppkey").isNotNull())
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .where(F.col("p_size").isin(1, 2, 3, 4, 5))
        .select("p_partkey", "p_brand", "p_size")
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .where((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            WHERE l_quantity > 0
            GROUP BY 1, 2
        ),
        eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
            FROM ps
            JOIN part ON p_partkey = l_partkey
            JOIN eur  ON s_suppkey = l_suppkey
            WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        ),
        mc AS (SELECT p_partkey, min(unit_cost) AS min_cost
               FROM cand GROUP BY 1)
        SELECT cand.p_partkey AS partkey, p_name AS part_name,
               s_name AS supp_name, round(s_acctbal, 2) AS acctbal,
               n_name AS nation,
               CAST(floor(unit_cost * 65536) AS BIGINT) AS unit_cost_fp
        FROM cand JOIN mc ON mc.p_partkey = cand.p_partkey
                         AND cand.unit_cost = mc.min_cost
    """,
    description="TPC-H q2 pattern (minimum-cost supplier): per-part "
    "minimum unit cost across region-restricted suppliers, then the "
    "supplier rows achieving that minimum — the correlated-min "
    "subquery becomes a per-part agg joined back on (partkey, cost); "
    "dims broadcast, the derived part-supplier cost table replaces the "
    "absent partsupp (unit cost = min extendedprice/quantity observed "
    "in lineitem); equality on the min is safe because both sides "
    "carry the identical IEEE double produced by the same division",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .where(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(reg, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(eur, ps.l_suppkey == eur.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    mc = cand.groupBy("p_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cand.join(mc, "p_partkey")
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            # fixed-point 2^16 encoding: multiply-by-power-of-two and
            # floor are both exact on binary doubles, so the surfaced
            # integer is cross-engine hash-exact (round(x, 4) is not:
            # Spark rounds the shortest decimal repr, DuckDB the exact
            # binary value, and they disagree on .xxxx5 boundaries)
            F.floor(F.col("unit_cost") * F.lit(65536.0))
            .cast("long")
            .alias("unit_cost_fp"),
        )
    )
