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
    return df.select(
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
        )
    """,
    description="frame sampling for video-like payloads: payload split "
    "into fixed-size frames (64-byte stand-ins), one row per frame with "
    "digest — explode stays JVM-side; a real decoder slots into the same "
    "(doc_id, frame_idx, bytes) shape via mapInPandas",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
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
    """,
    description="multimodal decode pipeline: binary payload → mapInPandas "
    "(Arrow) → typed features; decode body is a deterministic stub, "
    "plumbing is production-shaped",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    decoded = decode_images(attach_payload(d))
    return decoded.withColumn("feature_mean", F.round("feature_mean", 6))
