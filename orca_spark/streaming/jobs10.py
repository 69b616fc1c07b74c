"""Streaming batch 10: the rest of the ``transformWithStateInPandas``
state-variable family — ListState and MapState.

jobs5.py proved the TWS transport (ValueState) the moment the vendored
protobuf runtime landed (orca_spark/vendor.py); these two jobs cover
the remaining composable state shapes a production processor actually
uses:

* ``ListState`` — a bounded per-key buffer (here: the 3 latest events
  by event_id), the streaming form of every "last K interactions per
  user" feature store. The fold keeps the buffer trimmed INSIDE the
  processor so state size is O(K) per key regardless of stream length.
* ``MapState`` — a per-key sub-keyed aggregate (here: per-user
  per-event-type counts), the shape that would otherwise force a
  composite grouping key and lose the ability to evict whole users.

Both run on the RocksDB state store and are driven to completion with
availableNow + memory sink, so the oracle is the identical batch
aggregation. Money-valued doubles are folded as BIGINT cents
(round(v*100) per row is 2-dp-exact) so emission order and float
summation order cannot drift the hash (the r05–r07 cross-engine rule).

Reference parity: core.clj has no streaming (SURVEY §2.5); Spark-4 API
surface extension alongside jobs5.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events
from orca_spark.streaming.jobs5 import tws_available

_K = 3


def cents_half_away(v: float) -> int:
    """Money to integer cents with HALF-AWAY-FROM-ZERO ties — the tie
    rule SQL round() uses in BOTH engines (Spark HALF_UP, DuckDB
    std::round). Python's builtin round() is banker's (half-to-even)
    and silently diverges on exact halves: 0.125 * 100 = 12.5 is
    representable, round(12.5) = 12 but SQL round gives 13 — a real
    driver-hash mismatch class for any Python-side kernel.

    NOT floor(x + 0.5): the addition itself rounds, so one-ulp-below-
    half values (1.005 * 100 = 100.49999999999999) can tie UP in the
    add while std::round correctly truncates. Comparing the exact
    fractional part (x - floor(x) is exact for |x| < 2^52) has no such
    double-rounding. (2.675 * 100 is EXACTLY 267.5 in binary — the
    product rounds to the half — so 268 is the correct SQL answer
    there, duckdb-verified; see test_tws_cents_round_half_away.)

    NaN never reaches this fold: the jobs filter NOT isnan(value) on
    both the stream and the oracle (int(NaN) raises here; CAST(NaN AS
    BIGINT) aborts in both engines — the filter is the contract)."""
    x = v * 100.0
    if x >= 0:
        f = math.floor(x)
        return int(f) + (1 if x - f >= 0.5 else 0)
    c = math.ceil(x)
    return int(c) - (1 if c - x >= 0.5 else 0)


def cents_half_away_np(values) -> "pd.Series":
    """Vectorized twin of cents_half_away for Arrow-batched kernels —
    one implementation site per shape, bit-identical tie behavior."""
    import numpy as np

    x = np.asarray(values, dtype="float64") * 100.0
    f, c = np.floor(x), np.ceil(x)
    return np.where(x >= 0, f + (x - f >= 0.5), c - (c - x >= 0.5)).astype(
        "int64"
    )


def make_last_k_processor():
    """ListState fold: keep the _K events with the largest event_id per
    user, emit (n_kept, cents sum of kept values, max event_id). Module
    scope so the fold is testable without the transport (jobs5's
    pattern)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class LastK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getListState("buf", "event_id BIGINT, cents BIGINT")
            # monotonic progress counter: total events ever folded for
            # this key. max_event_id is NOT monotonic evidence of
            # progress (a later batch can displace buffer members
            # without raising the max), so the final-emission reducer
            # orders by this instead.
            self._seen = handle.getValueState("n_seen", "n BIGINT")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            kept = [tuple(t) for t in self._buf.get()] if self._buf.exists() else []
            seen = int(self._seen.get()[0]) if self._seen.exists() else 0
            for pdf in rows:
                seen += len(pdf)
                kept.extend(
                    (int(e), cents_half_away(float(v)))
                    for e, v in zip(pdf["event_id"], pdf["value"])
                )
            kept.sort(key=lambda t: -t[0])
            kept = kept[:_K]
            self._buf.put(kept)
            self._seen.update((seen,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_kept": [len(kept)],
                    "cents_kept": [sum(c for _, c in kept)],
                    "max_event_id": [kept[0][0]],
                    "n_seen": [seen],
                }
            )

        def close(self) -> None:
            pass

    return LastK()


def make_type_count_processor():
    """MapState fold: per-user map event_type -> count, flattened to
    (user_id, event_type, n_events) rows on emission."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type STRING", "n BIGINT"
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            for pdf in rows:
                for et, n in pdf["event_type"].value_counts().items():
                    k = (et,)
                    prev = (
                        self._counts.getValue(k)[0]
                        if self._counts.containsKey(k)
                        else 0
                    )
                    self._counts.updateValue(k, (prev + int(n),))
            types, counts = [], []
            for (et,), (n,) in self._counts.iterator():
                types.append(et)
                counts.append(n)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n_events": counts,
                }
            )

        def close(self) -> None:
            pass

    return TypeCounts()


def _final_per_key(out: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Update-mode streams emit once per key per micro-batch; keep each
    key's final (largest-progress) emission, robust to multi-batch."""
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_tws_last_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL contract: a row without an event_id or value cannot enter a
    # last-K-by-id buffer, and a NULL user_id cannot be a TWS grouping
    # key (jobs11's rule, applied uniformly) — filtered on both sides.
    # NaN too: int(NaN) raises in the Python fold and CAST(NaN AS
    # BIGINT) aborts in both engines, so NaN money is unrepresentable
    # in a cents column by contract, not by accident.
    ev = (
        stream_events(spark, sf_dir)
        .where(
            F.col("event_id").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("user_id").isNotNull()
        )
        .select("user_id", "event_id", "value")
    )
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_last_k_processor(),
        outputStructType="user_id bigint, n_kept bigint, cents_kept bigint, "
        "max_event_id bigint, n_seen bigint",
        outputMode="Update",
        timeMode="None",
    )
    out = run_to_memory(updated, "update")
    # reduce on the monotonic fold counter, NOT max_event_id: two
    # emissions can tie on max_event_id while differing in cents_kept
    # (a later batch displacing smaller buffer members), and a tied
    # row_number pick would keep a stale row nondeterministically
    return _final_per_key(out, ["user_id"], "n_seen").select(
        "user_id", "n_kept", "cents_kept", "max_event_id"
    )


def streaming_tws_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL contract: NULL cannot be a MapState sub-key (the state row
    # schema is non-null) nor a TWS grouping key — filtered on both
    # sides, explicitly. The n_events reducer below is tie-safe: counts
    # only grow, and emissions tied on n_events are identical rows.
    ev = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type")
    )
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_type_count_processor(),
        outputStructType="user_id bigint, event_type string, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )
    out = run_to_memory(updated, "update")
    return _final_per_key(out, ["user_id", "event_type"], "n_events").select(
        "user_id", "event_type", "n_events"
    )


if tws_available():
    register(
        "streaming_tws_last_k_events",
        oracle=f"""
            WITH ranked AS (
                SELECT user_id, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) AS rn
                FROM events
                WHERE event_id IS NOT NULL AND value IS NOT NULL
                  AND NOT isnan(value) AND user_id IS NOT NULL
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT)    AS n_kept,
                   CAST(sum(cents) AS BIGINT)  AS cents_kept,
                   CAST(max(event_id) AS BIGINT) AS max_event_id
            FROM ranked WHERE rn <= {_K}
            GROUP BY user_id
        """,
        description=f"transformWithStateInPandas ListState: per-user "
        f"bounded buffer of the {_K} latest events (by event_id) — the "
        "streaming last-K feature-store shape, state O(K) per key "
        "because the fold trims inside the processor; values carried "
        "as BIGINT cents, oracle is the batch top-K window",
    )(streaming_tws_last_k_events)

    register(
        "streaming_tws_type_counts",
        oracle="""
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id, event_type
        """,
        description="transformWithStateInPandas MapState: per-user map "
        "of event_type -> running count, flattened to rows at emission "
        "— the sub-keyed aggregate shape that keeps the grouping key "
        "evictable per user; oracle is the batch two-key groupBy",
    )(streaming_tws_type_counts)
