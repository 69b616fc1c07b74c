"""A custom JSONL source on Spark 4's Python DataSource API.

``OrcaJsonlDataSource`` is a from-scratch file source: one input
partition PER SHARD FILE (the planner contract that gives a 100 TB
directory its parallelism), each partition streaming line-delimited
JSON records through a generator — no driver-side materialization.
The Python DataSource API is the extension point Spark 4 added for
exactly this: sources whose format or access protocol has no JVM
connector, written in Python but planned and scheduled like any scan.

``json_pysource_roundtrip`` proves the machinery end-to-end: the
documents table is sharded to JSONL by Spark's writer, read BACK
through the custom source, and aggregated — the oracle aggregates the
original parquet directly, so a wrong schema, a dropped line, a
missed shard, or a mis-typed field all surface as a value mismatch.

Scale notes: partition-per-file is the right granularity for
line-delimited formats (no intra-file splitting without an index —
the same rule JVM JSON sources follow for multiline payloads);
records stream through the Arrow batch writer without buffering a
shard in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_SCHEMA = "doc_id bigint, lang string, n_chars bigint"


def _build_source():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self._path = options["path"]

        def partitions(self):
            import glob
            import os

            files = sorted(
                f
                for f in glob.glob(os.path.join(self._path, "*.json"))
                if os.path.getsize(f) > 0
            )
            return [InputPartition(f) for f in files]

        def read(self, partition):
            import json

            with open(partition.value) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    yield (
                        rec.get("doc_id"),
                        rec.get("lang"),
                        rec.get("n_chars"),
                    )

    class OrcaJsonlDataSource(DataSource):
        @classmethod
        def name(cls):
            return "orca_jsonl"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):
            return _Reader(self.options)

    return OrcaJsonlDataSource


def register_jsonl_source(spark: SparkSession) -> None:
    spark.dataSource.register(_build_source())


@register(
    "json_pysource_roundtrip",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT)      AS n_docs,
               CAST(sum(n_chars) AS BIGINT)  AS total_chars
        FROM documents
        GROUP BY lang
    """,
    description="custom Python DataSource (Spark 4 API) proven "
    "end-to-end: documents sharded to JSONL by the engine's writer, "
    "read back through a from-scratch source with one input partition "
    "per shard file and generator-streamed records, then aggregated — "
    "the oracle aggregates the original parquet, so schema drift, "
    "dropped lines, or missed shards surface as value mismatches",
)
def json_pysource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    register_jsonl_source(spark)
    out = os.path.join(
        tempfile.gettempdir(), "orca_jsonl_src", os.path.basename(os.path.normpath(sf_dir))
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").json(out)
    back = spark.read.format("orca_jsonl").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
