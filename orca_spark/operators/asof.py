"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, left_ts, right_ts)`` attaches to each left
row the most recent right row for the same key with ``right_ts <=
left_ts`` — the canonical point-in-time enrichment (trades vs quotes,
events vs dimension snapshots).

Scale design — the union+window pattern, NOT a range cross join:

1. tag and union both sides (schema-aligned with nulls),
2. one shuffle: window partitioned by key, ordered by (ts, side-tag),
3. ``last_value(..., ignorenulls)`` carries the latest right-side
   attributes forward onto each left row,
4. filter back to left rows.

Cost is one shuffle + one sort of |L|+|R| rows — no per-row range scan
and no candidate explosion, so it holds at 100 TB where the naive
``L join R on key and r_ts <= l_ts`` + argmax approach produces
|L| x |matching R| intermediates. DuckDB's native ASOF JOIN is the
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts <= left_ts.

    ``on``: equi-key present on both sides. ``value_cols``: right-side
    columns to attach (null when no right row precedes the left row).
    """
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")
    # the union/window plumbing claims _k/_ts/_side plus _r_*/_c_* tags;
    # input columns with those names would silently corrupt the carry
    reserved = {"_k", "_ts", "_side"}
    for df, side in ((left, "left"), (right, "right")):
        clash = sorted(
            c
            for c in df.columns
            if c in reserved or c.startswith("_r_") or c.startswith("_c_")
        )
        if clash:
            raise ValueError(
                f"{side} columns collide with asof_join internals: {clash}; "
                "rename them before joining"
            )
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows sort first on ts ties
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    # a right row with a NULL key or NULL timestamp can match no left
    # row under equi+>= semantics (NULL comparisons are never true) —
    # and unfiltered, a NULL-ts row would sort FIRST in the carry
    # window (Spark ASC = NULLS FIRST) and leak its values into every
    # event of the partition
    right = right.where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(c) for c in value_cols],
    )


@register(
    "asof_join_latest_order",
    oracle="""
        WITH o AS (
            -- one row per (customer, date): ties on the as-of timestamp
            -- would make "the latest order" engine-dependent, so both
            -- engines dedupe identically first (keep max orderkey)
            SELECT o_custkey, o_orderdate,
                   arg_max(o_orderkey, o_orderkey)   AS o_orderkey,
                   -- struct-wrapped: arg_max would SKIP a NULL
                   -- totalprice on the max-orderkey row (Spark's
                   -- max_by would return it) — see the temporal join
                   arg_max({'v': o_totalprice}, o_orderkey).v AS o_totalprice
            FROM orders
            GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS o_orderkey,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM events e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    description="as-of join: each event enriched with the user's most "
    "recent order at event time — union+window pattern (one shuffle, "
    "no range-join explosion); oracle is DuckDB's native ASOF JOIN",
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by(
                F.struct(F.col("o_totalprice").alias("v")), "o_orderkey"
            ).getField("v").alias("o_totalprice"),
        )
    )
    # one struct, not two bare columns: the carry window's
    # last(ignorenulls) would otherwise skip a legitimately-NULL
    # totalprice and resurrect an older order's price (the struct is
    # non-null whenever an order exists, so NULL fields carry
    # faithfully)
    o = o.select(
        "user_id", "o_orderdate",
        F.struct("o_orderkey", "o_totalprice").alias("o"),
    )
    out = asof_join(
        e, o, on="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.round(F.col("o.o_totalprice"), 2).alias("o_totalprice"),
    )


@register(
    "orders_temporal_state_join",
    oracle="""
        WITH dedup AS (
            -- same-instant changes: the max-event_id record wins (its
            -- interval is the live one; the others are zero-length) —
            -- deduped BEFORE intervalization so the as-of carry has a
            -- unique row per (user, instant) and no tiebreak ambiguity
            -- value rides inside a struct: DuckDB's arg_max SKIPS rows
            -- whose value argument is NULL (Spark's max_by does not) —
            -- a never-NULL struct makes both engines pick the same
            -- max-event_id row and carry its value even when NULL
            SELECT user_id, ts AS valid_from,
                   arg_max({'v': value}, event_id).v AS value
            FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
            GROUP BY user_id, ts
        ),
        iv AS (
            SELECT user_id, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY valid_from) AS valid_to,
                   value
            FROM dedup
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               iv.valid_from AS state_since,
               round(iv.value, 4) AS state_value
        FROM orders o LEFT JOIN iv
          ON o.o_custkey = iv.user_id
         AND o.o_orderdate >= iv.valid_from
         AND (o.o_orderdate < iv.valid_to OR iv.valid_to IS NULL)
    """,
    description="temporal (SCD2) state join: each order enriched with "
    "the user's event-state interval ACTIVE at order time. Because "
    "consecutive intervals tile each user's timeline, interval "
    "containment is equivalent to an as-of join on valid_from — one "
    "union+window shuffle, never a range-join explosion; zero-length "
    "intervals (same-instant changes) match nothing on both engines "
    "by the half-open [from, to) convention",
)
def orders_temporal_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: identical to asof_join — one shuffle on the user key, no
    per-event interval scan. The state rides as ONE STRUCT column
    through the carry window: asof_join's last(ignorenulls) carry
    would otherwise skip over a legitimately-NULL state VALUE and
    resurrect an older one; the struct is non-null whenever a state
    row exists, so NULL-valued states carry faithfully."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
    )
    # same-instant dedupe (max event_id wins): without it, two state
    # rows sharing a timestamp have no defined order in the carry
    # window and the surviving value would be partition-order luck
    state = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_id").isNotNull())
        .groupBy("user_id", F.col("ts").alias("valid_from"))
        # struct-wrapped for the same reason as the oracle's arg_max
        .agg(F.max_by(F.struct(F.col("value").alias("v")), "event_id").alias("_w"))
        .select("user_id", "valid_from", F.col("_w.v").alias("value"))
        .select(
            "user_id",
            "valid_from",
            F.struct(F.col("valid_from").alias("since"), "value").alias("state"),
        )
    )
    out = asof_join(
        o, state, on="user_id", left_ts="ts", right_ts="valid_from",
        value_cols=["state"],
    )
    return out.select(
        "o_orderkey",
        F.col("user_id").alias("o_custkey"),
        F.col("ts").alias("o_orderdate"),
        F.col("state.since").alias("state_since"),
        F.round(F.col("state.value"), 4).alias("state_value"),
    )
