"""Streaming batch 7: watermark-bounded streaming deduplication.

``streaming_dedup_within_watermark`` runs Spark's
``dropDuplicatesWithinWatermark`` over the event stream — the
streaming-native dedup whose state is EVICTABLE: a key's dedup state
lives only while the watermark can still admit a duplicate for it,
so state size is bounded by (arrival rate x watermark delay) instead
of growing with the stream's lifetime key cardinality. This is the
operator that makes at-least-once ingest (Kafka replays, retried
batch loads) exactly-once-per-key downstream, and the eviction bound
is what lets it run forever — the plain ``dropDuplicates`` sibling
keeps every key's state until the query dies.

Verification surface: the emitted row per key is whichever duplicate
arrived first in micro-batch order — nondeterministic across file
split orderings — so the registered query projects the surviving KEYS
only, which are deterministic (the set of distinct keys with a
watermark-admissible event time). The batch oracle is the same
DISTINCT under the watermark's admission rules: NULL event times
never pass an event-time operator, and rows at-or-before the INITIAL
watermark (epoch 0) are dropped as late on arrival — the engine-wide
epoch-0 trap, asserted by the degenerate-corpus suite.

Scale: state is keyed (RocksDB-backed in production), shuffled once
on the dedup key; eviction is driven by the same watermark the
sessionization jobs use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.streaming.jobs import run_to_memory, stream_events


@register(
    "streaming_dedup_within_watermark",
    oracle="""
        SELECT DISTINCT user_id, event_type
        FROM events
        -- the watermark drops NULL event times, and
        -- dropDuplicatesWithinWatermark drops rows at-or-before the
        -- INITIAL watermark (epoch 0) — the engine-wide epoch-0 trap
        WHERE ts IS NOT NULL AND epoch_us(ts) > 0
    """,
    description="dropDuplicatesWithinWatermark over the event stream: "
    "watermark-evictable dedup state (bounded by rate x delay, not "
    "lifetime key cardinality) — the exactly-once-per-key gate for "
    "at-least-once ingest; the registered surface projects the "
    "deterministic surviving key set (first-arrival payloads depend "
    "on micro-batch file order), proven against batch DISTINCT under "
    "the watermark's NULL-event-time exclusion",
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir).select("ts", "user_id", "event_type")
    # Admission is made EXPLICIT before the stateful operator: whether
    # the operator itself drops a NULL or epoch-0 event time turned out
    # to vary run-to-run (the row straddles the initial-watermark
    # boundary), and a stateful op fed nondeterministic input is
    # unverifiable. Production streams do the same — garbage event
    # times are filtered before they can poison watermark state.
    ev = ev.where(F.col("ts").isNotNull() & (F.col("ts") > F.timestamp_micros(F.lit(0))))
    deduped = (
        ev.withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = run_to_memory(deduped, "append")
    return out.select("user_id", "event_type").distinct()
