"""Streaming batch 9: a custom PYTHON streaming source end-to-end.

``streaming_pysource_jsonl_ingest`` closes the loop on the engine's
custom-connector story: documents are sharded to JSONL by the custom
two-phase-commit writer (sources/jsonl.py), then ingested back as a
STREAM through the same source's partitioned
``DataSourceStreamReader`` — offsets are positions in the sorted shard
listing, each micro-batch plans one input partition per new file — and
aggregated with a streaming groupBy driven to completion under
``availableNow``. The oracle aggregates the original parquet, so the
whole chain (writer commit protocol → stream offset tracking →
per-file partition planning → executor-side JSON decode → streaming
aggregation state) is value-checked, not just smoke-tested.

This is the replay/ingest pattern a 100 TB pipeline uses for
file-dropped feeds with no JVM connector: the source plans partitions
(never reads on the driver — that is the `simple` reader variant this
module deliberately avoids), parallelism per trigger equals newly
arrived shards, and any committed offset range replays exactly the
same sorted files on recovery.

Trigger note: Spark 4's PythonMicroBatchStream does not implement the
AvailableNow admission protocol, so the engine's availableNow driver
falls back to ONE micro-batch spanning initialOffset→latestOffset
(Spark logs this). For this bounded job that single batch IS the
whole input — deterministic and value-checked; a continuous
deployment would run the same source under a processing-time trigger
where the per-trigger offset ranges do the incremental work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.sources.jsonl import register_jsonl_source
from orca_spark.streaming.jobs import run_to_memory
from orca_spark.tables import load


@register(
    "streaming_pysource_jsonl_ingest",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT)     AS n_docs,
               CAST(sum(doc_id) AS BIGINT)  AS id_sum,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
    description="custom PYTHON streaming source end-to-end: documents "
    "sharded by the two-phase-commit JSONL writer, re-ingested through "
    "the partitioned DataSourceStreamReader (offset = position in the "
    "sorted shard listing, one input partition per new file, "
    "executor-side decode) and aggregated to completion under "
    "availableNow — the oracle aggregates the original parquet, so "
    "offset tracking, partition planning, decode, and streaming state "
    "are all value-checked",
)
def streaming_pysource_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    register_jsonl_source(spark)
    out = os.path.join(
        tempfile.gettempdir(),
        "orca_jsonl_stream_src",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.write.format("orca_jsonl").mode("overwrite").option("path", out).save()

    stream = spark.readStream.format("orca_jsonl").option("path", out).load()
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("total_chars"),
    )
    return run_to_memory(agg, "complete")
