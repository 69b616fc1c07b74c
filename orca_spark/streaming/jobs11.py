"""Streaming batch 11: transformWithStateInPandas EVENT-TIME TIMERS —
the emit-on-timer pattern that completes the TWS facility coverage
(jobs5: ValueState; jobs10: ListState/MapState; here: timers).

``streaming_tws_timer_flush`` accumulates per-user totals SILENTLY on
the data path (handleInputRows emits nothing) and lets a registered
event-time timer flush the final row in ``handleExpiredTimer`` when
the watermark passes — the production shape for "emit once per key
when the key goes quiet" (session finalization, abandoned-cart
emission) where emitting per micro-batch would flood downstream. The
processor registers an already-expired timer each batch, so the flush
fires in the availableNow run's final timer micro-batch, after all
input — making the bounded-run result the exact batch aggregate, which
is the oracle. In a multi-batch continuous run intermediate flushes
are possible by design; the update-mode reducer keeps each key's
final (max-count) emission, same as the other TWS jobs.

Money folds as BIGINT cents (2-dp exact, the cross-engine rule).

Reference parity: core.clj has no streaming (SURVEY §2.5); Spark-4 API
surface extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events
from orca_spark.streaming.jobs5 import tws_available
from orca_spark.streaming.jobs10 import _final_per_key, cents_half_away_np


def make_timer_flush_processor():
    """Module scope so the fold + timer logic is testable without the
    transport (jobs5's pattern)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TimerFlush(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT")
            self._handle = handle

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._agg.exists():
                n, cents = self._agg.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                # round PER ROW then sum: 2-dp money is exact per row
                # (the jobs10 convention); summing doubles first would
                # reintroduce float accumulation. SQL-tie rounding via
                # the shared helper (pandas .round() is banker's and
                # diverges on exact halves; see jobs10.cents_half_away).
                cents += int(cents_half_away_np(pdf["value"]).sum())
            self._agg.update((n, cents))
            # an already-expired expiry: fires on the next watermark
            # advance — i.e. the final timer micro-batch of a bounded
            # run, after all input
            self._handle.registerTimer(1)
            return iter([])

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            n, cents = self._agg.get() if self._agg.exists() else (0, 0)
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents_total": [cents]}
            )

        def close(self) -> None:
            pass

    return TimerFlush()


def streaming_tws_timer_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL contract: value participates in the cents fold (NaN money is
    # unrepresentable — int(NaN) raises, CAST(NaN AS BIGINT) aborts in
    # both engines), user_id NULL keys cannot group in TWS, and the
    # watermark drops NULL event times (jobs.py:86's invariant) — ALL
    # filtered on both sides so neither engine's implicit drop behavior
    # is load-bearing
    ev = (
        stream_events(spark, sf_dir)
        .where(
            F.col("value").isNotNull()
            & ~F.isnan("value")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .withWatermark("ts", "1 hour")
        .select("user_id", "value")
    )
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_timer_flush_processor(),
        outputStructType="user_id bigint, n_events bigint, cents_total bigint",
        outputMode="Update",
        timeMode="EventTime",
    )
    out = run_to_memory(updated, "update")
    return _final_per_key(out, ["user_id"], "n_events").select(
        "user_id", "n_events", "cents_total"
    )


if tws_available():
    register(
        "streaming_tws_timer_flush",
        oracle="""
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS cents_total
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
              AND user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY user_id
        """,
        description="transformWithStateInPandas EVENT-TIME TIMERS: the "
        "data path accumulates silently and a registered timer flushes "
        "each key's final row in handleExpiredTimer when the watermark "
        "passes — the emit-when-quiet production shape (session "
        "finalization, abandoned carts) that avoids per-micro-batch "
        "flooding; completes the TWS facility coverage (ValueState/"
        "ListState/MapState/timers); money folds as BIGINT cents",
    )(streaming_tws_timer_flush)
