"""Market-basket brand affinity over orders (association rules).

The classic co-purchase analysis: which part BRANDS appear in the same
order more often than independence predicts. Per unordered brand pair
(b1 < b2): support (co-occurring orders), each brand's own order
count, and lift = P(b1,b2) / (P(b1)·P(b2)) — the association-rule core
(confidence follows as support/count directly).

Brands (25 values) are the right itemset granularity for TPC-H-shaped
data: per-order distinct brand sets stay small, so the within-order
pair expansion is bounded by C(|brands-in-order|, 2), never by line
count.

Reference parity: the reference (core.clj) has no relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_MIN_SUPPORT = 2  # a pair must co-occur in >= 2 orders (integer floor)


@register(
    "orders_brand_affinity",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
        bc AS (SELECT brand, count(*) AS c FROM ob GROUP BY brand),
        pairs AS (
            SELECT a.brand AS b1, b.brand AS b2, count(*) AS support
            FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
            GROUP BY a.brand, b.brand
            HAVING count(*) >= {_MIN_SUPPORT}
        )
        SELECT p.b1, p.b2, CAST(p.support AS BIGINT) AS support,
               CAST(c1.c AS BIGINT) AS n_b1, CAST(c2.c AS BIGINT) AS n_b2,
               round(p.support * n.n_orders * 1.0 / (c1.c * c2.c), 4) AS lift
        FROM pairs p
        JOIN bc c1 ON p.b1 = c1.brand
        JOIN bc c2 ON p.b2 = c2.brand
        CROSS JOIN n
    """,
    description="market-basket brand affinity: distinct (order, brand) "
    "sets, within-order pair counts (b1 < b2), integer support floor, "
    "lift = support*N/(c1*c2) — the association-rule core over the "
    "order/part join",
)
def orders_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the lineitem→part join broadcasts the part dim's (key,
    brand) projection; the distinct (order, brand) set is one dedup
    shuffle; the within-order self-join expands each order by its
    distinct-brand pair count (brands are a 25-value alphabet, so the
    fan-out is bounded per order regardless of line count); pair
    counts and brand counts partial-aggregate map-side; the order
    count is a one-row broadcast.

    Determinism: support/counts are integers, the support floor is an
    integer HAVING, and lift is one float expression over identical
    integers on both engines, rounded (4) for display."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = ob.agg(F.countDistinct("okey").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        ob.alias("a")
        .join(
            ob.alias("b"),
            (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _MIN_SUPPORT)
    )
    return (
        pairs.join(bc.select(F.col("brand").alias("b1"), F.col("c").alias("n_b1")), "b1")
        .join(bc.select(F.col("brand").alias("b2"), F.col("c").alias("n_b2")), "b2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "b1",
            "b2",
            "support",
            "n_b1",
            "n_b2",
            F.round(
                F.col("support") * F.col("n_orders") * F.lit(1.0)
                / (F.col("n_b1") * F.col("n_b2")),
                4,
            ).alias("lift"),
        )
    )
