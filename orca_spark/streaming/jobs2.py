"""Streaming batch 2: ingestion-time deduplication.

The one stateful pattern jobs.py doesn't cover, and the first stage of
any streaming training-data pipeline: drop duplicate records AT INGEST,
with state bounded by a watermark instead of growing forever.
``dropDuplicatesWithinWatermark`` keeps the first arrival of each key
and evicts a key's state once the watermark passes its event time — at
100 TB/day the state store holds only the active watermark horizon, not
the full key history (a plain ``dropDuplicates`` would OOM the state
store in hours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events


@register(
    "streaming_dedup_user_event_types",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    description="streaming ingestion dedup: dropDuplicatesWithinWatermark "
    "on (user_id, event_type) with a 2h watermark — emits each key's "
    "first arrival, state evicted at the watermark horizon (bounded "
    "store, unlike plain dropDuplicates); oracle is the batch DISTINCT",
)
def streaming_dedup_user_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(deduped, output_mode="append")
