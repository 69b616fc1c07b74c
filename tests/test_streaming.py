"""Streaming semantics the SQL oracle can't express: append-mode
finalization under watermarks, and re-run determinism."""

from pyspark.sql import functions as F

from orca_spark.streaming.jobs import run_to_memory, stream_events
from tests.conftest import SF_DIR


def test_append_mode_emits_only_finalized_windows(spark):
    """In append mode a window is emitted only once the watermark passes
    its end; with one availableNow batch the trailing window(s) near
    max(ts) stay open and unemitted — strictly fewer rows than complete
    mode, and a subset of it."""
    def agg(df):
        return (
            df.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("bucket"), "n")
        )

    complete = {
        (r.bucket, r.n) for r in run_to_memory(agg(stream_events(spark, SF_DIR)), "complete").collect()
    }
    appended = {
        (r.bucket, r.n) for r in run_to_memory(agg(stream_events(spark, SF_DIR)), "append").collect()
    }
    assert appended  # watermark passed for all but the trailing window(s)
    assert len(appended) < len(complete)
    assert appended <= complete  # finalized windows agree exactly


def test_streaming_rerun_deterministic(spark):
    from orca_spark.queries import queries

    q = queries()["streaming_hourly_counts"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b
