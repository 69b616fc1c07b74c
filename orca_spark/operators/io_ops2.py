"""Sources/sinks batch 2: CSV and JSON round-trips, partitioned ORC
with partition pruning — the multi-format surface a format library's
successor owes its users."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.io_ops import scratch_path
from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "csv_roundtrip_agg",
    oracle="""
        SELECT o_orderstatus,
               count(*)                  AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_orderstatus
    """,
    description="parquet → CSV (header, ISO timestamps) → typed read-back "
    "→ aggregate; proves lossless text-format round-trip",
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    path = scratch_path("csv_roundtrip", sf_dir)
    # explicit NULL sentinel: CSV's default collapses NULL and '' into
    # one token, silently merging their groups on read-back — the \\N
    # convention keeps the distinction round-trip-safe
    (
        o.write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
    back = (
        spark.read.schema(o.schema)  # explicit schema: no inference pass at scale
        .option("header", "true")
        .option("nullValue", "\\N")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "json_roundtrip_agg",
    oracle="""
        SELECT event_type,
               count(*)             AS n,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY event_type
    """,
    description="parquet → JSON lines → typed read-back → aggregate "
    "(timestamps survive via ISO format)",
)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    path = scratch_path("json_roundtrip", sf_dir)
    e.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(path)
    back = spark.read.schema(e.schema).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "orc_merge_schema_read",
    oracle="""
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders
        UNION ALL
        SELECT o_orderkey, NULL, o_orderpriority FROM orders
    """,
    description="schema evolution: two ORC files with different-but-"
    "mergeable column sets read back with mergeSchema=true → union of "
    "fields, nulls where absent (the distributed form of the reference's "
    "struct-union merge lattice, core.clj:413-417)",
)
def orc_merge_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orca_spark.io import read_orc, write_orc

    o = load(spark, sf_dir, "orders")
    base = scratch_path("orc_mergeschema", sf_dir)
    write_orc(o.select("o_orderkey", "o_totalprice"), f"{base}/a")
    write_orc(o.select("o_orderkey", "o_orderpriority"), f"{base}/b")
    back = spark.read.option("mergeSchema", "true").orc([f"{base}/a", f"{base}/b"])
    return back.select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "orc_partitioned_pruned",
    oracle="""
        SELECT l_linestatus,
               count(*)                  AS n,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem
        WHERE l_returnflag = 'R'
        GROUP BY l_linestatus
    """,
    description="hive-partitioned ORC write (partitionBy l_returnflag) + "
    "partition-pruned read: the filter prunes directories, the scan never "
    "touches other partitions — THE layout lever at 100 TB",
)
def orc_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orca_spark.io import read_orc, write_orc

    li = load(spark, sf_dir, "lineitem")
    path = scratch_path("orc_partitioned", sf_dir)
    write_orc(li, path, compression="zstd", partition_by=["l_returnflag"])
    back = read_orc(spark, path).where(F.col("l_returnflag") == "R")
    return back.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "text_source_roundtrip",
    oracle="""
        SELECT count(*) AS n_docs,
               CAST(sum(len(text)) AS BIGINT) AS total_chars,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM documents
        -- the line format can only represent rows with both fields
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    """,
    description="line-oriented text source round-trip: documents written "
    "as tab-separated lines (spark.write.text), read back with the text "
    "source and re-parsed — the raw-corpus ingestion format of most "
    "crawled datasets; aggregate proves lossless round-trip",
)
def text_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a tab-separated line cannot represent a NULL id or NULL text
    # (concat_ws would silently SKIP the null and shift fields on
    # re-parse) — the representable subset is the operator's contract.
    # Embedded line terminators are normalized to spaces on write, the
    # standard one-doc-per-line corpus convention: a raw \n would split
    # one doc into several lines whose continuations re-parse as
    # doc_ids (a CAST crash on read-back). translate is 1:1 so
    # total_chars still proves the round-trip exactly.
    d = load(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    path = scratch_path("text_roundtrip", sf_dir)
    (
        d.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.translate("text", "\n\r", "  "),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    back = spark.read.text(path).select(
        F.substring_index("value", "\t", 1).cast("long").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@register(
    "xml_source_roundtrip",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT)           AS n_docs,
               CAST(sum(n_chars) AS BIGINT)       AS total_chars,
               CAST(max(doc_id) AS BIGINT)        AS max_doc
        FROM documents
        GROUP BY lang
    """,
    description="XML source round-trip (Spark 4 built-in xml format): "
    "documents written as <doc> elements, read back with rowTag "
    "schema inference, aggregated per lang — covers the remaining "
    "semi-structured ingestion format (after CSV/JSON/ORC/text); the "
    "matching aggregate proves the round-trip lossless",
)
def xml_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orca_spark.operators.io_ops import scratch_path

    path = scratch_path("xml_docs", sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    (
        docs.write.mode("overwrite")
        .option("rootTag", "corpus")
        .option("rowTag", "doc")
        .format("xml")
        .save(path)
    )
    back = spark.read.option("rowTag", "doc").format("xml").load(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@register(
    "parquet_compaction_roundtrip",
    oracle="""
        SELECT l_returnflag,
               count(*)                       AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        WHERE l_orderkey <= 1000
        GROUP BY l_returnflag
    """,
    description="compaction sink: repartitionByRange(l_orderkey) + "
    "sortWithinPartitions + maxRecordsPerFile writes a key-clustered, "
    "size-bounded parquet layout (disjoint per-file key ranges, so "
    "later key-range scans prune whole files on min/max stats); the "
    "registered query re-reads the compacted layout with a key "
    "predicate and must aggregate identically to the raw table",
)
def parquet_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance job every long-lived 100 TB table needs: collapse
    small/unordered files into few, key-sorted, bounded-size files.

    ``repartitionByRange`` samples the key to build balanced range
    bounds (one shuffle — the cost of the rewrite), the in-partition
    sort makes parquet column min/max stats tight, and
    ``maxRecordsPerFile`` caps file size without another shuffle. The
    read-back predicate is served by footer stats + row-group pruning —
    on the compacted layout a key-range scan touches one file, on the
    incoming layout it touches all of them.
    """
    li = load(spark, sf_dir, "lineitem")
    path = scratch_path("parquet_compaction", sf_dir)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 100_000)
        .parquet(path)
    )
    back = spark.read.parquet(path).where(F.col("l_orderkey") <= 1000)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@register(
    "json_corrupt_quarantine",
    oracle="""
        SELECT 'clean' AS status,
               count(*) AS n,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        -- NULL doc_id: the mangling rule can't select it (NULL % 10 is
        -- UNKNOWN), so the line is written as JSON and parses clean
        FROM documents WHERE doc_id % 10 <> 0 OR doc_id IS NULL
        UNION ALL
        SELECT 'quarantined' AS status,
               count(*) AS n,
               NULL AS sum_doc_id
        FROM documents WHERE doc_id % 10 = 0
    """,
    description="corrupt-record quarantine ingest: a JSON-lines batch "
    "with every 10th line deterministically mangled is read PERMISSIVE "
    "with columnNameOfCorruptRecord — malformed rows land in the "
    "quarantine column with the raw line preserved (nothing is "
    "silently dropped, nothing aborts the job), clean rows parse "
    "typed; the oracle recomputes both populations from the mangling "
    "rule. The ingest contract every large-scale pipeline needs: "
    "row-level fault isolation, not job-level failure",
)
def json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    path = scratch_path("json_corrupt", sf_dir)
    # coalesce: concat(NULL) would make the whole line NULL, and the
    # text sink rejects NULL values — a NULL-text doc still quarantines.
    # translate \n away: the corrupt payload goes RAW into a line-based
    # text sink, so embedded newlines would split one mangled doc into
    # many corrupt records and break the doc<->line bijection the oracle
    # counts on (to_json escapes newlines on the clean branch; the
    # mangled branch must stay single-line by construction too)
    line = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.lit("CORRUPT "),
            F.translate(F.coalesce(F.col("text"), F.lit("")), "\n\r", "  "),
        ),
    ).otherwise(F.to_json(F.struct("doc_id", "text", "lang")))
    d.select(line.alias("value")).write.mode("overwrite").text(path)
    back = spark.read.schema(
        "doc_id long, text string, lang string, _corrupt string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    ).json(path)
    # Spark's analyzer forbids queries whose pruned scan touches ONLY the
    # corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    # _COLUMN); the documented pattern is to materialize the parsed rows
    # first — localCheckpoint severs the file-source lineage so the
    # downstream aggregate is free to reference _corrupt alone
    back = back.localCheckpoint(eager=False)
    return (
        back.select(
            F.when(F.col("_corrupt").isNull(), "clean")
            .otherwise("quarantined")
            .alias("status"),
            "doc_id",
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # doc_id is null on quarantined rows, so the sum is NULL
            # there by SQL semantics — matching the oracle's literal NULL
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
        )
    )


def zorder_key(
    xcol: str,
    ycol: str,
    xbounds: tuple[int, int],
    ybounds: tuple[int, int],
    bits: int = 8,
):
    """Morton (z-order) interleave of two int keys, min-max scaled.

    Each key is first scaled to [0, 2^bits) from its (min, max) bounds —
    WITHOUT this the wider-domain key owns all the high interleaved bits
    and the curve degenerates to a single-key sort (the column-stats
    step every real z-order implementation performs).  Bit i of scaled x
    lands at position 2i, of scaled y at 2i+1 — one codegen'd
    expression, no UDF.
    """

    def scaled(col: str, lo: int, hi: int) -> str:
        span = max(1, hi - lo)
        return (
            f"CAST((CAST({col} AS DOUBLE) - {lo}D) * {(1 << bits) - 1}D"
            f" / {span}D AS BIGINT)"
        )

    sx, sy = scaled(xcol, *xbounds), scaled(ycol, *ybounds)
    terms = " | ".join(
        f"(shiftleft(shiftright({sx}, {i}) & 1, {2 * i})"
        f" | shiftleft(shiftright({sy}, {i}) & 1, {2 * i + 1}))"
        for i in range(bits)
    )
    return F.expr(terms)


@register(
    "zorder_layout_roundtrip",
    oracle="""
        SELECT count(*)                  AS n,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem
        WHERE l_orderkey <= 1000 AND l_partkey <= 100
    """,
    description="z-order (Morton) layout: lineitem rewritten clustered "
    "on the bit-interleave of (l_orderkey, l_partkey) via "
    "repartitionByRange + sort on the z-key — ONE layout that serves "
    "min/max file pruning for predicates on EITHER or BOTH dimensions "
    "(single-key clustering serves only its own key); the read-back "
    "two-dimensional range query must match the raw-table oracle",
)
def zorder_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-dimensional sibling of parquet_compaction_roundtrip.
    Sorting by (l_orderkey, l_partkey) lexicographically makes partkey
    stats useless (every file spans all partkeys within an orderkey run);
    the z-curve keeps both dimensions locally contiguous so both
    columns' per-file min/max ranges stay narrow — the standard layout
    trick (Delta OPTIMIZE ZORDER) expressed with stock Spark: an
    interleave expression, a range repartition, a sort."""
    li = load(spark, sf_dir, "lineitem")
    path = scratch_path("zorder_layout", sf_dir)
    # column stats for the scaling — one bounded agg, the same stats a
    # table format already has in its metadata
    b = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]
    (
        li.withColumn(
            "_z",
            zorder_key(
                "l_orderkey", "l_partkey", (b[0], b[1]), (b[2], b[3])
            ),
        )
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(
        (F.col("l_orderkey") <= 1000) & (F.col("l_partkey") <= 100)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "provenance_file_lineage",
    oracle="""
        -- the driver corpus stores each table as ONE parquet file, so
        -- the expected manifest is a single row whose file_name is the
        -- literal; the Spark side must surface the same name from the
        -- scan's _metadata column
        SELECT 'documents.parquet'         AS file_name,
               count(*)                    AS n_rows,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM documents
    """,
    description="row-level provenance via the hidden _metadata column: "
    "every scanned row carries its physical source file, aggregated "
    "here to a per-file manifest (row count, key range) — the lineage "
    "primitive behind attribution, incremental reconciliation and "
    "takedown compliance, at zero storage cost (the file path is scan "
    "metadata, not a materialized column)",
)
def provenance_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bypass tables.load: _metadata must be selected at scan time
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("_metadata.file_name").alias("file_name")
    )
    return d.groupBy("file_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )
