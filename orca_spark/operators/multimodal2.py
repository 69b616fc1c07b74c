"""Multimodal, part 2: a REAL image-resize kernel through the Arrow path.

``multimodal_ppm_resize`` completes the decode → transform story the
multimodal family promises: a 4x4 P6 PPM payload is synthesized
JVM-side per document (header + 48 pixel bytes from three salted md5
digests), decoded by the real netpbm parser (multimodal.py), and
BLOCK-MEAN DOWNSAMPLED 4x4 -> 2x2 inside the same mapInPandas pass —
numpy reshape/mean, the exact arithmetic a production thumbnailer
runs, not a stub. The output is one row per resized sample
(doc_id, qy, qx, channel, value): 12 scalar rows per document, where
each value is the mean of four known source bytes — which is what
makes the whole kernel SQL-checkable: the DuckDB oracle recomputes
every resized sample from the same md5 bytes with explicit index
arithmetic. Quarters of integer sums are exactly representable, so
the comparison needs no rounding at all.

Scale: payload synthesis and hashing are JVM codegen; the decode+
resize kernel is Arrow-batched with 12 output rows per input row —
the shape (binary in, small typed rows out) that a 100 TB
image-corpus featurization job has, with the image library swapped in
for the numpy kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.multimodal import _parse_ppm_header
from orca_spark.registry import register
from orca_spark.tables import load

_RESIZED_SCHEMA = "doc_id bigint, qy int, qx int, channel int, value double"

# 48 raster bytes: one digest per 16-byte third, selected by i // 16
_PX_SQL = (
    "list_transform(range(0, 48), i ->"
    " (strpos('0123456789abcdef',"
    "   substr(CASE WHEN i < 16 THEN md5(text)"
    "               WHEN i < 32 THEN md5(text || 'a')"
    "               ELSE md5(text || 'b') END, (i % 16)*2+1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef',"
    "   substr(CASE WHEN i < 16 THEN md5(text)"
    "               WHEN i < 32 THEN md5(text || 'a')"
    "               ELSE md5(text || 'b') END, (i % 16)*2+2, 1)) - 1)"
    ")"
)


def resize_ppm_block_mean(df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, qy, qx, channel, value): decode the
    P6 payload and 2x-downsample by 2x2 block mean, Arrow-batched."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, qys, qxs, chs, vals = [], [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                w, h, _maxval, off = _parse_ppm_header(data)
                px = (
                    np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
                    .reshape(h, w, 3)
                    .astype(np.float64)
                )
                # block-mean 2x downsample: (h, w, c) -> (h/2, w/2, c)
                small = px.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
                for qy in range(h // 2):
                    for qx in range(w // 2):
                        for c in range(3):
                            ids.append(doc_id)
                            qys.append(qy)
                            qxs.append(qx)
                            chs.append(c)
                            vals.append(float(small[qy, qx, c]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "qy": pd.Series(qys, dtype="int32"),
                    "qx": pd.Series(qxs, dtype="int32"),
                    "channel": pd.Series(chs, dtype="int32"),
                    "value": pd.Series(vals, dtype="float64"),
                }
            )

    return df.mapInPandas(run, schema=_RESIZED_SCHEMA)


@register(
    "multimodal_ppm_resize",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, {_PX_SQL} AS px
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(qy AS INT) AS qy,
               CAST(qx AS INT) AS qx,
               CAST(ch AS INT) AS channel,
               (px[(qy*2*4 + qx*2)*3 + ch + 1]
                + px[(qy*2*4 + qx*2 + 1)*3 + ch + 1]
                + px[((qy*2+1)*4 + qx*2)*3 + ch + 1]
                + px[((qy*2+1)*4 + qx*2 + 1)*3 + ch + 1]) / 4.0 AS value
        FROM b,
             UNNEST(generate_series(0, 1)) AS a(qy),
             UNNEST(generate_series(0, 1)) AS c(qx),
             UNNEST(generate_series(0, 2)) AS d(ch)
    """,
    description="REAL image resize through the Arrow path: 4x4 P6 PPM "
    "payloads (48 raster bytes from salted md5 digests) decoded by the "
    "netpbm parser and block-mean downsampled to 2x2x3 inside one "
    "mapInPandas kernel — 12 scalar rows per document, each the mean "
    "of four known source bytes, recomputed by the oracle with "
    "explicit index arithmetic; quarters of integer sums are exact, "
    "so no rounding anywhere",
)
def multimodal_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    payload = F.concat(
        F.encode(F.lit("P6\n4 4\n255\n"), "UTF-8"),
        F.expr("unhex(md5(text))"),
        F.expr("unhex(md5(text || 'a'))"),
        F.expr("unhex(md5(text || 'b'))"),
    )
    return resize_ppm_block_mean(
        d.select("doc_id", payload.alias("payload"))
    )
