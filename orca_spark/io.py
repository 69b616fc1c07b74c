"""ORC (and parquet) sources/sinks — the heart of the reference.

The reference encodes row-seqs to ORC through hand-managed
``VectorizedRowBatch``es (``/root/reference/src/orca/core.clj:622-671``)
and decodes ORC to columnar frames (``core.clj:60-89``). Spark's
vectorized ORC datasource does the batching, null bitmaps, stripe
flushing, compression, and predicate pushdown natively, so the module
surface is thin option-mapping:

* ``:overwrite?``      → ``mode("overwrite")``       (core.clj:627-628)
* ``:stripe-size``     → ``orc.stripe.size``         (core.clj:632-635)
* ``:row-index-stride``→ ``orc.row.index.stride``    (core.clj:632-635)
* ``:batch-size``      → internal to Spark's writer (always vectorized;
  the reference's 1024-row default, core.clj:670, has no user knob here)
* compression          → ``option("compression", ...)`` — reference
  golden files show ZLIB and uncompressed (test-resources/*.orc)

Error-tolerant writes (bad cell → null + warn, core.clj:443-450) are
reproduced by :func:`coerce_or_null` — an explicit ``try_cast``
projection, because Spark's writer (correctly) throws on type
mismatches.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_orc(
    df: DataFrame,
    path: str,
    *,
    overwrite: bool = True,
    stripe_size: int | None = None,
    row_index_stride: int | None = None,
    compression: str | None = None,
    partition_by: list[str] | None = None,
    orc_options: dict | None = None,
    memory_pool: float | None = None,
    enforce_buffer_size: bool | None = None,
) -> None:
    """Write a DataFrame as ORC with the reference's writer knobs.

    Distributed sink: each task writes its partition as an ORC file;
    ``partition_by`` produces hive-style directory partitioning for
    partition pruning on later reads (essential at 100 TB).

    ``orc_options`` passes any further ``orc.*`` table properties through
    (e.g. ``orc.compress.size``, ``orc.bloom.filter.columns``).
    ``memory_pool`` (fraction of heap the ORC writers may buffer,
    ``:orc-memory-pool``) and ``enforce_buffer_size``
    (``:enforce-buffer-size?``) mirror core.clj:624-635: the former is a
    JVM-wide hadoop conf (applied to the session, since the ORC memory
    manager is per-JVM), the latter a per-write option.
    """
    hconf = None
    prev_pool = None
    if memory_pool is not None:
        # must go to the live hadoop conf: spark.hadoop.* session confs
        # are only read at context startup. Save the previous value and
        # restore it after the write — the conf is JVM-wide, and leaving
        # it set would silently apply this write's knob to every later
        # ORC write in the session.
        hconf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()
        prev_pool = hconf.get("hive.exec.orc.memory.pool")
        hconf.set("hive.exec.orc.memory.pool", str(memory_pool))
    writer = df.write.mode("overwrite" if overwrite else "errorifexists")
    if enforce_buffer_size is not None:
        writer = writer.option(
            "orc.buffer.size.enforce", "true" if enforce_buffer_size else "false"
        )
    for k, v in (orc_options or {}).items():
        writer = writer.option(k, str(v))
    if stripe_size is not None:
        writer = writer.option("orc.stripe.size", str(stripe_size))
    if row_index_stride is not None:
        writer = writer.option("orc.row.index.stride", str(row_index_stride))
    if compression is not None:
        # reference files show ZLIB + uncompressed; Spark also offers
        # snappy/zstd/lz4 — zstd is the right default at scale.
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.orc(path)
    finally:
        if hconf is not None:
            if prev_pool is None:
                hconf.unset("hive.exec.orc.memory.pool")
            else:
                hconf.set("hive.exec.orc.memory.pool", prev_pool)


def read_orc(spark: SparkSession, path: str, *, merge_schema: bool = False) -> DataFrame:
    """Open ORC file(s) as a DataFrame (``read-vectors``, core.clj:79-89).

    Schema comes from the footer; scans are vectorized with predicate
    pushdown and column pruning. ``merge_schema=True`` unions struct
    fields across files (the cross-file half of the reference's
    merge lattice, core.clj:378-429).
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.orc(path)


def read_frame(spark: SparkSession, path: str) -> dict[str, list]:
    """ORC file → driver-side columnar frame ``{col → list}``.

    Exact analog of the reference's ``read-vectors`` return value
    (core.clj:79-89). Only for small results — the distributed answer
    is :func:`read_orc`.
    """
    from orca_spark.frame import to_frame

    return to_frame(read_orc(spark, path))


def write_rows(
    spark: SparkSession,
    path: str,
    rows: Iterable[Any],
    schema: str | T.StructType,
    *,
    overwrite: bool = True,
    lenient: bool = False,
    **orc_opts: Any,
) -> None:
    """Row-seq → ORC file (``write-rows``, core.clj:662-671).

    ``rows`` may be dicts (fields matched by name) or tuples
    (positional), matching the reference's map/sequential row writers
    (core.clj:610-620). ``schema`` is a DDL string or StructType —
    the reference likewise takes an explicit schema (core.clj:626).
    ``lenient=True`` reproduces the reference's cell-error→null
    tolerance (core.clj:443-450) via :func:`coerce_or_null`.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if lenient:
        # accept anything stringifiable, then try_cast column-wise
        rows = list(rows)
        raw = spark.createDataFrame(
            [_stringify_row(r, schema) for r in rows],
            T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields]),
        )
        df = coerce_or_null(raw, schema)
    else:
        df = spark.createDataFrame(list(rows), schema)
    write_orc(df, path, overwrite=overwrite, **orc_opts)


def _stringify_row(row: Any, schema: T.StructType) -> tuple:
    names = [f.name for f in schema.fields]
    if isinstance(row, dict):
        vals = [row.get(n) for n in names]
    else:
        vals = list(row) + [None] * (len(names) - len(row))
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        elif isinstance(v, bool):
            out.append("true" if v else "false")  # JVM-style, not Python's 'True'
        else:
            out.append(str(v))
    return tuple(out)


def coerce_or_null(df: DataFrame, target: T.StructType | str) -> DataFrame:
    """Lenient projection: each column cast to its target type, cell
    becoming NULL (never failing the job) on a bad value.

    Parity with ``write-value``'s error containment (core.clj:443-450)
    and the string-probe coercions (core.clj:278-303). Pure Catalyst
    expressions (``try_cast`` / ``try_to_timestamp``) — whole-stage
    codegen, no Python in the hot path.
    """
    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    cols = []
    for field in target.fields:
        c = F.col(field.name) if field.name in df.columns else F.lit(None)
        cols.append(_try_cast(c, field.dataType).alias(field.name))
    return df.select(*cols)


def _try_cast(col, dtype: T.DataType):
    if isinstance(dtype, T.TimestampType):
        # bare numbers are epoch-millis in the reference (core.clj:469-470);
        # check digits FIRST — Spark's try_to_timestamp would otherwise
        # read '1500' as the year 1500
        return F.when(
            col.rlike(r"^[+-]?\d+$"),
            F.timestamp_millis(col.try_cast(T.LongType())),
        ).otherwise(F.try_to_timestamp(col))
    if isinstance(dtype, T.DateType):
        return col.try_cast(T.DateType())
    return col.try_cast(dtype)
