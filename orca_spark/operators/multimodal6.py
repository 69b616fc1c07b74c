"""Multimodal batch 6: ORACLED real-container roundtrips — the first
hash-checked driver evidence for the audio and video decode paths.

The registered audio/video feature queries are rows-only at the driver
(byte-level DSP has no SQL twin for arbitrary payloads), so their real
decoders (stdlib ``wave`` since r09, the Y4M stream parser since r10)
were proven only by local fixture tests. These two queries close that
gap: the kernel SYNTHESIZES a genuine container per document from
nothing but ``doc_id`` (pure integer arithmetic, no RNG), feeds it
through the SAME production kernel the rows-only queries run
(``audio_features_kernel`` / ``video_scene_kernel`` — real header
parse, real PCM/plane decode), and the expected features have CLOSED
FORMS a DuckDB oracle states directly:

* WAV: a 16-bit mono square wave, 64 samples, half-period
  h = 1 + doc_id%4, amplitude A = 40 + (doc_id*53)%32000. Then
  energy = 64*A^2 exactly, rms_fp = A*65536 exactly (sqrt of a perfect
  square is IEEE-exact), zero crossings = 63//h, peak = A, and the
  silence/clip buckets are step functions of A against the 16-bit
  thresholds (512 / 15360) — every branch of the threshold logic gets
  corpus-wide coverage because A sweeps the full scale.
* Y4M: an 8x4 C420 stream of n = 2 + doc_id%4 flat-luma scenes, each
  f = 1 + doc_id%3 frames, luma_j = 30 + (doc_id*37 + j*83)%200. Then
  n_frames = n*f, a cut fires exactly when adjacent scene lumas differ
  by >= 8 (the per-pixel threshold at 32 pixels), max_delta =
  32*max|diff|, first_frame_sum = 32*luma_0.

A decoder regression (sign extension, channel stride, chroma stride,
frame framing, threshold scaling) breaks the closed form and fails the
driver hash — the roundtrip turns 'the parser runs' into 'the parser
is right', at sf scale, every round.

Scale: one Arrow-batched mapInPandas pass, zero shuffles, zero joins —
synthesis+decode is row-local, embarrassingly parallel at any corpus
size. Reference parity: core.clj has no binary-payload surface
(SURVEY §2.5); multimodal-family extension.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.multimodal4 import phash_table
from orca_spark.operators.multimodal5 import (
    _AUDIO_SCHEMA,
    _VIDEO_SCHEMA,
    audio_features_kernel,
    video_scene_kernel,
)
from orca_spark.registry import register
from orca_spark.tables import load

_N_SAMPLES = 64
_W, _H = 8, 4  # Y4M frame geometry: 32 luma pixels, C420 chroma = 16


def synth_wav(doc_id: int) -> bytes:
    """Genuine 16-bit mono RIFF/WAVE container: a square wave of
    amplitude A = 40 + (doc_id*53)%32000 and half-period 1+doc_id%4,
    starting positive."""
    h = 1 + doc_id % 4
    amp = 40 + (doc_id * 53) % 32000
    samples = [amp if (i // h) % 2 == 0 else -amp for i in range(_N_SAMPLES)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def synth_y4m(doc_id: int) -> bytes:
    """Genuine YUV4MPEG2 stream: 8x4 C420, n_scenes flat-luma scenes of
    fps frames each (see module docstring for the formulas)."""
    n_scenes = 2 + doc_id % 4
    fps = 1 + doc_id % 3
    ysize = _W * _H
    out = [f"YUV4MPEG2 W{_W} H{_H} F25:1 Ip A1:1 C420".encode() + b"\n"]
    for j in range(n_scenes):
        luma = 30 + (doc_id * 37 + j * 83) % 200
        frame = b"FRAME\n" + bytes([luma]) * ysize + bytes([128]) * (ysize // 2)
        out.extend([frame] * fps)
    return b"".join(out)


@register(
    "multimodal_wav_roundtrip_features",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   1 + doc_id % 4 AS h,
                   40 + (doc_id * 53) % 32000 AS a
            FROM documents WHERE doc_id IS NOT NULL
        )
        SELECT doc_id,
               CAST(64 AS BIGINT)          AS n_samples,
               CAST(64 * a * a AS BIGINT)  AS energy,
               CAST(a * 65536 AS BIGINT)   AS rms_fp,
               CAST(63 // h AS BIGINT)     AS n_zero_cross,
               CAST(a AS BIGINT)           AS peak,
               CAST(CASE WHEN a <= 512 THEN 1000000 ELSE 0 END
                    AS BIGINT)             AS silence_ppm,
               CAST(CASE WHEN a >= 15360 THEN 64 ELSE 0 END
                    AS BIGINT)             AS n_clipped
        FROM p
    """,
    description="ORACLED real-WAV roundtrip: per document a genuine "
    "16-bit RIFF/WAVE square wave (amplitude/period derived from "
    "doc_id) is synthesized and decoded by the production "
    "audio_features_kernel — stdlib wave header parse + PCM decode — "
    "whose outputs (exact energy 64*A^2, rms A*65536, crossings 63//h, "
    "threshold step functions) the oracle states in closed form; a "
    "decode regression fails the driver hash",
)
def multimodal_wav_roundtrip_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "payload": [synth_wav(int(d)) for d in b["doc_id"]],
                }
            )
            yield audio_features_kernel(payloads)

    return ids.mapInPandas(run, schema=_AUDIO_SCHEMA)


@register(
    "multimodal_y4m_roundtrip_cuts",
    oracle="""
        WITH p AS (
            SELECT doc_id,
                   2 + doc_id % 4 AS n_scenes,
                   1 + doc_id % 3 AS fps
            FROM documents WHERE doc_id IS NOT NULL
        ),
        scenes AS (
            SELECT doc_id, n_scenes, fps, j,
                   30 + (doc_id * 37 + j * 83) % 200 AS luma
            FROM p, UNNEST(range(n_scenes)) AS t(j)
        ),
        diffs AS (
            SELECT doc_id, n_scenes, fps, j, luma,
                   lead(luma) OVER (PARTITION BY doc_id ORDER BY j) AS nxt
            FROM scenes
        )
        SELECT doc_id,
               CAST(any_value(n_scenes * fps) AS BIGINT) AS n_frames,
               CAST(coalesce(sum(CASE WHEN nxt IS NOT NULL
                                      AND abs(nxt - luma) >= 8
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_cuts,
               CAST(max(CASE WHEN nxt IS NULL THEN 0
                        ELSE abs(nxt - luma) * 32 END) AS BIGINT)
                   AS max_delta,
               CAST(32 * (30 + (doc_id * 37) % 200) AS BIGINT)
                   AS first_frame_sum
        FROM diffs
        GROUP BY doc_id
    """,
    description="ORACLED real-Y4M roundtrip: per document a genuine "
    "YUV4MPEG2 stream (8x4 C420, doc_id-derived scene count/length/"
    "lumas) is synthesized and decoded by the production "
    "video_scene_kernel — header tokens, chroma stride, frame framing, "
    "per-pixel cut threshold — whose outputs the oracle states in "
    "closed form (cut iff adjacent scene lumas differ >= 8); a parse "
    "regression fails the driver hash",
)
def multimodal_y4m_roundtrip_cuts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ids = load(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    ).select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "payload": [synth_y4m(int(d)) for d in b["doc_id"]],
                }
            )
            yield video_scene_kernel(payloads)

    return ids.mapInPandas(run, schema=_VIDEO_SCHEMA)


# The phash tile is four chained md5 digests of the text — exactly the
# bytes DuckDB's md5() produces — so the oracle can re-derive the FULL
# production hash independently: decode the 64 tile bytes from the hex
# digests, run the 8x8 orthonormal DCT-II as an explicit 64-term
# weighted sum per (k,l), quantize to the kernel's 2^-10 fixed-point
# grid (floor(c*1024+0.5) — integers from here on, so the comparison
# is exact), take the median of the 63 non-DC quantized coefficients
# (63 is odd: the middle ELEMENT, no interpolation), and assemble the
# 64 sign bits row-major MSB-first with HUGEINT shifts (``**`` returns
# DOUBLE in DuckDB and corrupts the low bits; ``<<`` does not).
_PHASH_PX_SQL = """list_transform(range(0,64), i ->
  CAST((strpos('0123456789abcdef', substr(CASE WHEN i<16 THEN md5(text)
       WHEN i<32 THEN md5(text||'a') WHEN i<48 THEN md5(text||'b')
       ELSE md5(text||'c') END, (i%16)*2+1,1))-1)*16
 + (strpos('0123456789abcdef', substr(CASE WHEN i<16 THEN md5(text)
       WHEN i<32 THEN md5(text||'a') WHEN i<48 THEN md5(text||'b')
       ELSE md5(text||'c') END, (i%16)*2+2,1))-1) AS DOUBLE))"""


@register(
    "multimodal_phash_dct_roundtrip",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_PHASH_PX_SQL} AS px
            FROM documents WHERE text IS NOT NULL
        ),
        coef AS (
            SELECT doc_id, k, l,
                   floor((CASE WHEN k=0 THEN sqrt(0.125)
                               ELSE sqrt(0.25) END)
                       * (CASE WHEN l=0 THEN sqrt(0.125)
                               ELSE sqrt(0.25) END)
                       * sum(px[i+1] * cos(pi()*k*(2*(i//8)+1)/16.0)
                                     * cos(pi()*l*(2*(i%8)+1)/16.0))
                       * 1024.0 + 0.5) AS q
            FROM t,
                 UNNEST(range(8)) AS kk(k),
                 UNNEST(range(8)) AS ll(l),
                 UNNEST(range(64)) AS ii(i)
            GROUP BY doc_id, k, l
        ),
        med AS (
            SELECT doc_id,
                   median(q) FILTER (WHERE NOT (k=0 AND l=0)) AS m
            FROM coef GROUP BY doc_id
        ),
        bits AS (
            SELECT coef.doc_id,
                   sum(CASE WHEN q > m
                       THEN CAST(1 AS HUGEINT) << CAST(63-(k*8+l) AS INT)
                       ELSE CAST(0 AS HUGEINT) END) AS u
            FROM coef JOIN med ON coef.doc_id = med.doc_id
            GROUP BY coef.doc_id
        )
        SELECT doc_id,
               CAST(CASE WHEN u >= CAST(1 AS HUGEINT) << 63
                    THEN u - (CAST(1 AS HUGEINT) << 64)
                    ELSE u END AS BIGINT) AS phash
        FROM bits
    """,
    description="ORACLED DCT perceptual-hash roundtrip: the PRODUCTION "
    "phash_table kernel (the same BLAS matrix-multiply DCT that feeds "
    "multimodal_phash_neardup's banded pair search) runs over every "
    "document's chained-md5 tile, and the oracle re-derives the hash "
    "INDEPENDENTLY — explicit 64-term DCT sums, the 2^-10 fixed-point "
    "quantization, the 63-element median, HUGEINT bit assembly — so "
    "all 64 bits of every hash are value-checked by the driver; a "
    "basis, normalization, median, quantization, or bit-order "
    "regression fails the hash. The quantization exists because "
    "summation order (pairwise matmul vs plain loop) flips one-ulp "
    "ties at the median on real corpus data",
)
def multimodal_phash_dct_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return phash_table(docs)
