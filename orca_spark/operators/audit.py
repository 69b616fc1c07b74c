"""Data-quality audit: the cross-table invariants a warehouse checks
after every load — key uniqueness and referential integrity — as one
operator emitting a (check, n_violations) scorecard.

Each check is an aggregate or anti-join count; the whole audit is a
union of small results, every branch independently partial-aggregated.
At 100 TB each FK check is one shuffle-on-key anti-join (or broadcast
when the parent side is dimension-sized), and the scorecard stays a
handful of rows however large the tables are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def _dupes(df: DataFrame, *keys: str):
    """Count of rows beyond the first per key group (0 = key is unique)."""
    return df.groupBy(*keys).agg(
        (F.count(F.lit(1)) - 1).alias("extra")
    ).agg(F.sum("extra").cast("long").alias("n"))


def _orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str):
    """Count of child rows whose NON-NULL FK has no parent row.

    A NULL FK means "no reference" — it is the NOT-NULL contract's
    business (a separate check), not a dangling reference; counting it
    here would also diverge from any NOT IN-style oracle, where a NULL
    probe is UNKNOWN, never a violation."""
    return (
        child.select(F.col(ckey).alias("k"))
        .where(F.col("k").isNotNull())
        .join(parent.select(F.col(pkey).alias("k")).distinct(), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "data_quality_audit",
    oracle="""
        SELECT 'orders_pk_unique' AS check_name,
               CAST(sum(c - 1) AS BIGINT) AS n_violations
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        UNION ALL
        SELECT 'customer_pk_unique',
               CAST(sum(c - 1) AS BIGINT)
        FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)
        UNION ALL
        SELECT 'lineitem_pk_unique',
               CAST(sum(c - 1) AS BIGINT)
        FROM (SELECT count(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderkey IS NOT NULL)
        UNION ALL
        SELECT 'orders_custkey_fk',
               CAST(count(*) AS BIGINT)
        FROM orders WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey IS NOT NULL)
        UNION ALL
        SELECT 'customer_nationkey_fk',
               CAST(count(*) AS BIGINT)
        FROM customer
        WHERE c_nationkey IS NOT NULL
          AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                  WHERE n_nationkey IS NOT NULL)
        UNION ALL
        SELECT 'nation_regionkey_fk',
               CAST(count(*) AS BIGINT)
        FROM nation WHERE n_regionkey IS NOT NULL
          AND n_regionkey NOT IN (SELECT r_regionkey FROM region
                                  WHERE r_regionkey IS NOT NULL)
        UNION ALL
        SELECT 'events_user_nonnull',
               CAST(count(*) AS BIGINT)
        FROM events WHERE user_id IS NULL
    """,
    description="cross-table data-quality scorecard: primary-key "
    "uniqueness (orders, customer, lineitem composite), referential "
    "integrity along the star schema's FK chain (lineitem->orders->"
    "customer->nation->region), and a NOT NULL contract on the events "
    "stream — each check one partial-aggregated anti-join or group "
    "count, the union a handful of rows at any scale; the post-load "
    "gate that catches a broken ingest before queries silently join "
    "against it",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    events = load(spark, sf_dir, "events")

    def tag(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_violations"),
        )

    checks = [
        tag("orders_pk_unique", _dupes(orders, "o_orderkey")),
        tag("customer_pk_unique", _dupes(customer, "c_custkey")),
        tag(
            "lineitem_pk_unique",
            _dupes(lineitem, "l_orderkey", "l_linenumber"),
        ),
        tag(
            "lineitem_orderkey_fk",
            _orphans(lineitem, "l_orderkey", orders, "o_orderkey"),
        ),
        tag(
            "orders_custkey_fk",
            _orphans(orders, "o_custkey", customer, "c_custkey"),
        ),
        tag(
            "customer_nationkey_fk",
            _orphans(customer, "c_nationkey", nation, "n_nationkey"),
        ),
        tag(
            "nation_regionkey_fk",
            _orphans(nation, "n_regionkey", region, "r_regionkey"),
        ),
        tag(
            "events_user_nonnull",
            events.where(F.col("user_id").isNull()).agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
