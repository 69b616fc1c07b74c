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

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _CommitMsg(WriterCommitMessage):
        def __init__(self, tmp_path):
            self.tmp_path = tmp_path

    class _Writer(DataSourceWriter):
        """Two-phase-commit JSONL writer: each task streams its
        partition to a ``.tmp`` shard named by its task attempt id
        (attempt-unique, so speculative/retried tasks never collide),
        and only the driver-side ``commit`` renames the shards reported
        by SUCCESSFUL tasks to their final ``part-*.json`` names —
        a failed or abandoned attempt leaves at most an orphan .tmp
        that ``abort`` (or the next overwrite) sweeps. This is the
        standard output-commit protocol scoped to a shared filesystem;
        on object storage the rename step becomes a manifest write
        (noted in the module docstring)."""

        def __init__(self, options, overwrite):
            self._path = options["path"]
            self._overwrite = overwrite

        def write(self, iterator):
            import json
            import os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            os.makedirs(self._path, exist_ok=True)
            tmp = os.path.join(
                self._path, f"attempt-{ctx.taskAttemptId()}.tmp"
            )
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(
                        json.dumps(
                            {
                                "doc_id": row.doc_id,
                                "lang": row.lang,
                                "n_chars": row.n_chars,
                            }
                        )
                    )
                    f.write("\n")
            return _CommitMsg(tmp)

        def commit(self, messages):
            import glob
            import os

            if self._overwrite:
                for old in glob.glob(os.path.join(self._path, "*.json")):
                    os.remove(old)
            for i, m in enumerate(messages):
                os.replace(
                    m.tmp_path, os.path.join(self._path, f"part-{i:05d}.json")
                )
            for leftover in glob.glob(os.path.join(self._path, "*.tmp")):
                os.remove(leftover)

        def abort(self, messages):
            import os

            for m in messages:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)

    from pyspark.sql.datasource import DataSourceStreamReader

    class _StreamReader(DataSourceStreamReader):
        """Streaming form of the same source, on the PARTITIONED
        stream-reader API (not the driver-side `simple` variant): an
        offset is the count of shard files consumed (files sorted by
        name — the producer's append order), ``partitions(start, end)``
        plans one input partition per newly-arrived file, and ``read``
        streams that file on an executor. This is the scale-correct
        shape for file-shard replay: micro-batch parallelism equals new
        files per trigger, and replaying any committed offset range
        re-reads exactly the same files (offsets are durable against
        the sorted listing, so recovery is deterministic)."""

        def __init__(self, options):
            self._path = options["path"]

        def _files(self):
            import glob
            import os

            return sorted(
                f
                for f in glob.glob(os.path.join(self._path, "*.json"))
                if os.path.getsize(f) > 0
            )

        def initialOffset(self):
            return {"idx": 0}

        def latestOffset(self):
            return {"idx": len(self._files())}

        def partitions(self, start, end):
            files = self._files()
            return [
                InputPartition(f) for f in files[start["idx"] : end["idx"]]
            ]

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

        def commit(self, end):
            pass  # offsets are positions in a durable sorted listing

    class OrcaJsonlDataSource(DataSource):
        @classmethod
        def name(cls):
            return "orca_jsonl"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):
            return _Reader(self.options)

        def writer(self, schema, overwrite):
            return _Writer(self.options, overwrite)

        def streamReader(self, schema):
            return _StreamReader(self.options)

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


@register(
    "json_pysource_write_roundtrip",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT)     AS n_docs,
               CAST(sum(doc_id) AS BIGINT)  AS id_sum,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
    description="custom Python DataSource WRITE path proven end-to-end: "
    "documents written through the from-scratch two-phase-commit JSONL "
    "writer (per-task-attempt .tmp shards, driver-side commit renames "
    "only successful attempts' output), read back through the matching "
    "custom reader, and aggregated — the oracle aggregates the "
    "original parquet, so a dropped row, a double-committed retry, or "
    "a type mangled in serialization all surface as value mismatches",
)
def json_pysource_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    register_jsonl_source(spark)
    out = os.path.join(
        tempfile.gettempdir(),
        "orca_jsonl_sink",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.write.format("orca_jsonl").mode("overwrite").option("path", out).save()
    back = spark.read.format("orca_jsonl").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("total_chars"),
    )
