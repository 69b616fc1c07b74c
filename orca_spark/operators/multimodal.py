"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct; codecs are NOT in this environment, so the decode /
feature-extract stage is a clearly-marked deterministic stub behind the
real Spark plumbing (schema, Arrow batching via ``mapInPandas``,
partition sizing). The plumbing — what actually matters at 100 TB — is
real and tested: binary payloads stay off the driver, flow Arrow-batched
through Python only in the stubbed stage, and all bookkeeping
(byte sizes, digests, grouping) is JVM-side SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_channels int, "
    "feature_mean double"
)


@register(
    "multimodal_binary_stats",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text)                               AS digest
        FROM documents
    """,
    description="binary payload bookkeeping: byte length + sha256 digest, "
    "all JVM-side (payloads here synthesized from text; real pipelines "
    "read them from object storage)",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")  # stand-in binary payload
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the canonical multimodal row shape:
    (id, payload binary, meta struct<mime,n_bytes>)."""
    payload = F.encode(text_col, "UTF-8")
    return df.where(F.col(text_col).isNotNull()).select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_stub(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB image decoder — no codec libraries in this container.

    Real deployments replace the body with e.g. PIL/ffmpeg on
    ``payload`` bytes; the signature, Arrow batch shape, and output
    schema are the production contract. The stub derives deterministic
    fake dimensions from payload length so tests can assert plumbing.
    """
    batch = batch[batch["payload"].notna()].reset_index(drop=True)
    n = batch["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": n.astype("int64"),
            "width": (n % 640 + 1).astype("int32"),
            "height": (n % 480 + 1).astype("int32"),
            "n_channels": pd.Series([3] * len(batch), dtype="int32"),
            "feature_mean": (n.astype("float64") % 255.0) / 255.0,
        }
    )


def decode_images(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas (the multimodal slow path).

    One pass, no shuffle; Python touches each binary batch exactly once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decode_image_stub(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id,
               CAST(i AS INT)                         AS frame_idx,
               md5(substr(text, i * 64 + 1, 64))      AS frame_digest,
               CAST(length(substr(text, i * 64 + 1, 64)) AS BIGINT) AS frame_bytes
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(floor((length(text) - 1) / 64) AS BIGINT) + 1)) AS i
            FROM documents
            WHERE length(text) > 0
        )
    """,
    description="frame sampling for video-like payloads: payload split "
    "into fixed-size frames (64-byte stand-ins), one row per frame with "
    "digest — explode stays JVM-side; a real decoder slots into the same "
    "(doc_id, frame_idx, bytes) shape via mapInPandas",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty docs have no frames: without the filter sequence(0, -1)
    # infers step -1 and emits phantom frame indices [0, -1]
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    n_frames = F.floor((F.length("text") - 1) / 64).cast("int")
    idx = F.sequence(F.lit(0), n_frames)
    frames = d.select("doc_id", "text", F.explode(idx).alias("frame_idx"))
    chunk = F.substring(F.col("text"), F.col("frame_idx") * 64 + 1, F.lit(64))
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(F.encode(chunk, "UTF-8")).alias("frame_digest"),
        F.length(chunk).cast("long").alias("frame_bytes"),
    )


def _parse_ppm_header(data: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header: magic, width, height, maxval.

    Returns (width, height, maxval, pixel_offset). Real parser — handles
    arbitrary whitespace and ``#`` comments per the netpbm spec; raises
    ``ValueError`` on malformed input. This is the proof that the
    multimodal mapInPandas path decodes actual image bytes, not only the
    deterministic stub.
    """
    if data[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {data[:2]!r})")
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":  # comment to end of line
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        # a token ends at whitespace or at a directly-appended comment
        while j < n and not data[j : j + 1].isspace() and data[j : j + 1] != b"#":
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(data[i:j]))
        i = j
    def _raster_size(flds):
        return flds[0] * flds[1] * 3

    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not (0 < maxval < 256):
        # 2-byte-sample PPMs (maxval 256-65535) are spec-valid but this
        # decoder reads 1 byte per sample — reject rather than silently
        # decode the interleaved high/low bytes as pixels
        raise ValueError(f"unsupported maxval {maxval} (8-bit samples only)")
    # The first whitespace after the header IS the raster delimiter —
    # never look past it (a raster whose first byte happens to be 0x23
    # '#' must not be eaten as a comment). Comments are only recognized
    # when they directly follow the maxval digits, their terminating
    # newline serving as the delimiter.
    while True:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            # the comment's line terminator delimits the raster; treat
            # \r\n as ONE delimiter (a Windows-authored comment would
            # otherwise leave the \n as the first raster byte) — UNLESS
            # consuming only the \r already leaves an exactly-sized
            # raster whose first pixel byte happens to be 0x0A (a
            # Mac-style bare-\r comment): the raster size disambiguates,
            # and exact-size is the stronger signal than CRLF convention
            if data[i : i + 1] == b"\r" and data[i + 1 : i + 2] == b"\n":
                exact_after_cr = (n - (i + 1)) == _raster_size(fields)
                if not exact_after_cr:
                    i += 1
            i += 1
            if data[i : i + 1] == b"#":  # ... unless another comment follows
                continue
            break
        if c.isspace():
            i += 1
            break
        raise ValueError("missing raster delimiter after maxval")
    if n - i < width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, maxval, i


def decode_ppm(batch: pd.DataFrame) -> pd.DataFrame:
    """REAL decoder for binary-PPM (P6) payloads — same output contract
    as ``decode_image_stub``, but dims come from the parsed header and
    ``feature_mean`` from the actual pixel bytes."""
    import numpy as np

    ids, nbytes, ws, hs, cs, means = [], [], [], [], [], []
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        if payload is None:  # missing object -> no decoded row
            continue
        data = bytes(payload)
        w, h, maxval, off = _parse_ppm_header(data)
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
        ids.append(doc_id)
        nbytes.append(len(data))
        ws.append(w)
        hs.append(h)
        cs.append(3)
        means.append(float(px.astype(np.float64).mean()) / float(maxval))
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_bytes": pd.Series(nbytes, dtype="int64"),
            "width": pd.Series(ws, dtype="int32"),
            "height": pd.Series(hs, dtype="int32"),
            "n_channels": pd.Series(cs, dtype="int32"),
            "feature_mean": pd.Series(means, dtype="float64"),
        }
    )


def decode_ppm_images(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL PPM decode over mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decode_ppm(batch)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


@register(
    "multimodal_ppm_decode",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   list_transform(range(0, 12), i ->
                       (strpos('0123456789abcdef', substr(md5(text), i*2+1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substr(md5(text), i*2+2, 1)) - 1)
                   ) AS px
            FROM documents
            WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(23 AS BIGINT)                              AS n_bytes,
               2                                               AS width,
               2                                               AS height,
               3                                               AS n_channels,
               round(list_aggregate(px, 'avg') / 255.0, 6)     AS feature_mean
        FROM b
    """,
    description="REAL image decode through the multimodal path: a 2x2 P6 "
    "PPM payload is synthesized JVM-side per document (header + 12 pixel "
    "bytes from unhex(md5(text))), then parsed by an actual netpbm "
    "header parser + numpy pixel pass inside mapInPandas — proving the "
    "Arrow decode plumbing on genuine image bytes, not a stub; the "
    "oracle recomputes the pixel mean from the same md5 bytes in SQL",
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # P6 header "P6\n2 2\n255\n" (11 bytes) + 12 RGB bytes = 23 bytes
    payload = F.concat(
        F.encode(F.lit("P6\n2 2\n255\n"), "UTF-8"),
        F.expr("substring(unhex(md5(text)), 1, 12)"),
    )
    src = d.where(F.col("text").isNotNull()).select("doc_id", payload.alias("payload"))
    decoded = decode_ppm_images(src)
    return decoded.withColumn("feature_mean", F.round("feature_mean", 6))


@register(
    "multimodal_decode_features",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT)                    AS n_bytes,
               CAST(octet_length(encode(text)) % 640 + 1 AS INT)             AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS INT)             AS height,
               3                                                             AS n_channels,
               round((octet_length(encode(text)) % 255.0) / 255.0, 6)        AS feature_mean
        FROM documents
        WHERE text IS NOT NULL
    """,
    description="multimodal decode pipeline: binary payload → mapInPandas "
    "(Arrow) → typed features; decode body is a deterministic stub, "
    "plumbing is production-shaped",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    decoded = decode_images(attach_payload(d))
    return decoded.withColumn("feature_mean", F.round("feature_mean", 6))


@register(
    "multimodal_binaryfile_ingest",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   list_transform(range(0, 12), i ->
                       (strpos('0123456789abcdef', substr(md5(text), i*2+1, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substr(md5(text), i*2+2, 1)) - 1)
                   ) AS px
            FROM documents
            WHERE text IS NOT NULL AND doc_id < 50
        )
        SELECT doc_id,
               CAST(23 AS BIGINT)                              AS n_bytes,
               2                                               AS width,
               2                                               AS height,
               3                                               AS n_channels,
               round(list_aggregate(px, 'avg') / 255.0, 6)     AS feature_mean
        FROM b
    """,
    description="file-system image ingest through the binaryFile source: "
    "real .ppm FILES on disk -> spark.read.format('binaryFile') with a "
    "pathGlobFilter -> doc_id parsed from the path -> the same netpbm "
    "mapInPandas decoder as multimodal_ppm_decode. The source "
    "parallelizes over files (one row per file, content as binary) — "
    "the standard ingest shape for an image/audio corpus laid out as "
    "objects; the bounded fixture-materialization step stands in for "
    "files that already exist at scale",
)
def multimodal_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    d = load(spark, sf_dir, "documents")
    payload = F.concat(
        F.encode(F.lit("P6\n2 2\n255\n"), "UTF-8"),
        F.expr("substring(unhex(md5(text)), 1, 12)"),
    )
    # bounded fixture write (50 files, 23 bytes each): the operator under
    # test is the INGEST — at scale the files already exist in object
    # storage and this step disappears
    rows = (
        d.where(F.col("text").isNotNull() & (F.col("doc_id") < 50))
        .select("doc_id", payload.alias("payload"))
        .collect()
    )
    img_dir = tempfile.mkdtemp(prefix="orca_binaryfile_")
    for r in rows:
        with open(os.path.join(img_dir, f"{int(r.doc_id)}.ppm"), "wb") as f:
            f.write(bytes(r.payload))
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(img_dir)
    )
    src = files.select(
        F.regexp_extract("path", r"(\d+)\.ppm$", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return decode_ppm_images(src).withColumn(
        "feature_mean", F.round("feature_mean", 6)
    )
