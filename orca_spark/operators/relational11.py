"""Fuzzy structured-data duplicate detection: repeated payments.

``orders_duplicate_payment_flags`` finds pairs of orders by the SAME
customer for the SAME amount within a 7-day window — the classic
double-charge / replayed-order audit. It is the relational cousin of
the text near-dup family: exact keys (customer, amount) do the
blocking, a bounded temporal predicate does the verification, and the
output is the pair manifest an operations team reviews.

Determinism: the join keys are exact column values (double equality on
identical parquet bytes is exact), the window predicate is integer
date arithmetic, and the surface is all integers plus the raw amount —
nothing floats through an aggregation.

Scale: the self-join is keyed on (custkey, totalprice) — a hash join
whose buckets are per-customer-per-amount order counts (tiny in any
real ledger; a pathological single-key pile-up is the standard salt
candidate, same rule as skew.py). The date window prunes pairs inside
each bucket; no cross-bucket pair is ever considered, and nothing is
quadratic in the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_WINDOW_DAYS = 7


@register(
    "orders_duplicate_payment_flags",
    oracle=f"""
        SELECT a.o_custkey,
               a.o_orderkey AS order_a,
               b.o_orderkey AS order_b,
               a.o_totalprice AS amount,
               CAST(CAST(b.o_orderdate AS DATE)
                    - CAST(a.o_orderdate AS DATE) AS BIGINT) AS days_apart
        FROM orders a
        JOIN orders b
          ON b.o_custkey = a.o_custkey
         AND b.o_totalprice = a.o_totalprice
         AND a.o_orderkey < b.o_orderkey
        WHERE a.o_orderdate IS NOT NULL AND b.o_orderdate IS NOT NULL
          AND abs(CAST(b.o_orderdate AS DATE)
                  - CAST(a.o_orderdate AS DATE)) <= {_WINDOW_DAYS}
          AND a.o_custkey IS NOT NULL AND a.o_totalprice IS NOT NULL
    """,
    description=f"same-customer same-amount order pairs within "
    f"{_WINDOW_DAYS} days (double-charge / replayed-order audit): "
    "exact (custkey, amount) keys block, the temporal predicate "
    "verifies, orderkey order orients each pair once — the relational "
    "cousin of the text near-dup family, never quadratic in the "
    "table; integer date arithmetic throughout",
)
def orders_duplicate_payment_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("amt"),
        F.col("o_orderkey").alias("order_a"),
        F.to_date("o_orderdate").alias("da"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("amt"),
        F.col("o_orderkey").alias("order_b"),
        F.to_date("o_orderdate").alias("db"),
    )
    gap = F.datediff("db", "da")
    return (
        a.join(b, ["ck", "amt"])
        .where(
            (F.col("order_a") < F.col("order_b"))
            & (F.abs(gap) <= _WINDOW_DAYS)
        )
        .select(
            F.col("ck").alias("o_custkey"),
            "order_a",
            "order_b",
            F.col("amt").alias("amount"),
            gap.cast("long").alias("days_apart"),
        )
    )
