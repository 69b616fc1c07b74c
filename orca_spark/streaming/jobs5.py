"""Streaming batch 5: the Spark 4 arbitrary-state API
(``transformWithStateInPandas`` + ``StatefulProcessor``).

``jobs.py`` covers the legacy ``applyInPandasWithState`` shape; this is
its successor — a processor OBJECT with named state variables
(ValueState here; ListState/MapState, timers and per-state TTL are the
API's other facilities) initialized once per partition, with Arrow
batches flowing through ``handleInputRows``.  Same RocksDB-backed
state store, same watermark-bounded scaling story; the win is
compositional state (N named variables instead of one tuple) and
first-class timers for timeout logic.

GATED: the TWS Python worker speaks protobuf to the JVM
(``pyspark/sql/streaming/proto``); in environments without a working
``google.protobuf`` the query cannot execute, so it only REGISTERS when
the import succeeds — the function itself stays importable either way
(tests skip accordingly, and ``applyInPandasWithState`` remains the
always-available stateful path).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events

_OUT = "user_id bigint, n_events bigint, max_value double"


def tws_available() -> bool:
    """True iff the TWS Python worker's protobuf dependency imports
    (vendored fallback included — see orca_spark/vendor.py)."""
    from orca_spark.vendor import ensure_protobuf

    return ensure_protobuf()


def make_running_max():
    """The StatefulProcessor for the registered TWS query, built at
    module scope so its fold logic is executable WITHOUT the protobuf
    transport: ``StatefulProcessor`` itself imports clean (only the
    worker's wire protocol needs ``google.protobuf``), so tests drive
    ``init``/``handleInputRows`` against a fake handle and prove the
    per-batch semantics match the batch oracle even in images where the
    full operator can't run (tests/test_streaming.py)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, mx DOUBLE")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._agg.exists():
                n, mx = self._agg.get()
            else:
                n, mx = 0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._agg.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningMax()


def streaming_tws_user_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("user_id", "value")
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_max(),
        outputStructType=_OUT,
        outputMode="Update",
        timeMode="None",
    )
    out = run_to_memory(updated, "update")
    # update mode emits once per key per micro-batch; keep the final
    # (largest-n) emission per key, robust to multi-batch runs
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("max_value", 4).alias("max_value"))
    )


if tws_available():
    register(
        "streaming_tws_user_running_max",
        oracle="""
            SELECT user_id, count(*) AS n_events,
                   round(max(value), 4) AS max_value
            FROM events
            GROUP BY user_id
        """,
        description="transformWithStateInPandas (Spark 4 "
        "StatefulProcessor API) per-user running count + max: a named "
        "ValueState variable folds each Arrow batch, update-mode "
        "emissions are reduced to the final row per key — the "
        "successor API to applyInPandasWithState, proven against the "
        "same batch-semantics oracle. Registered only when the TWS "
        "protobuf dependency is importable",
    )(streaming_tws_user_running_max)
