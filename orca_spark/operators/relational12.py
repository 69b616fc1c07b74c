"""Join-strategy control and ANSI-safe arithmetic.

* ``join_hinted_shuffle_hash`` — the join-strategy HINT surface:
  the orders⋈lineitem aggregation with an explicit ``shuffle_hash``
  hint. Catalyst's default for two large relations is a sort-merge
  join; when one side's per-partition hash table fits executor
  memory, shuffle-hash skips both sorts — the classic fact-to-fact
  tuning move a migrating user expects `.hint()` to deliver. The
  result is oracle-checked and the PLAN is asserted
  (``ShuffledHashJoin``, test_plans.py) — proving the hint actually
  changed the physical strategy, not just decorated the plan.
* ``scalar_try_arithmetic`` — the ``try_*`` arithmetic family under
  ANSI mode: ``try_divide`` / ``try_add`` return NULL where strict
  ANSI would abort the job (division by zero, overflow). The engine
  runs ANSI-on everywhere (session.py), so these are the documented
  escape hatch for ratio columns over dirty data — NULL-safe ratios
  per order priority with explicit zero-denominator cases.

Determinism: the hint changes strategy, never results (same oracle
discipline as every join); try-arithmetic surfaces are exact-count
ratios rounded at the surface with NULL where undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "join_hinted_shuffle_hash",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority IS NOT NULL
        GROUP BY o.o_orderpriority
    """,
    description="join-strategy hint surface: the fact-to-fact "
    "orders-lineitem join under an explicit shuffle_hash hint "
    "(skipping sort-merge's two sorts when one side's partitions fit "
    "a hash table) — results oracle-checked, the physical plan "
    "asserted to actually be a ShuffledHashJoin; money carried as "
    "BIGINT cents",
)
def join_hinted_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isNotNull())
        .select("o_orderkey", "o_orderpriority")
        .hint("shuffle_hash")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("price_cents"),
        )
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(CASE WHEN CAST(o_orderkey % 3 AS BIGINT) = 0
                              THEN NULL
                              ELSE o_totalprice
                                   / CAST(o_orderkey % 3 AS BIGINT) END),
                     4) AS ratio_sum,
               CAST(sum(CASE WHEN CAST(o_orderkey % 3 AS BIGINT) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_div
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderkey IS NOT NULL
          AND o_totalprice IS NOT NULL AND o_orderkey >= 0
        GROUP BY o_orderpriority
    """,
    description="the try_* ANSI escape hatch: try_divide returns NULL "
    "on division by zero where the engine's ANSI mode would abort the "
    "job — NULL-safe ratio aggregation with the zero-denominator "
    "count surfaced; per-row quotients are identical doubles, the "
    "order-dependent sum rounded at the surface",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & (F.col("o_orderkey") >= 0)
    )
    den = F.pmod(F.col("o_orderkey"), F.lit(3)).cast("long")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.try_divide(F.col("o_totalprice"), den)),
            4,
        ).alias("ratio_sum"),
        F.sum(F.when(den == 0, 1).otherwise(0)).cast("long").alias("n_null_div"),
    )
