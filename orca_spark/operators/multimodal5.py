"""Multimodal batch 5: the audio and video modalities — feature
extraction over opaque binary payloads, same plumbing contract as the
image family (multimodal/multimodal2/multimodal4).

``multimodal_audio_features`` is the audio profiling pass every
speech/audio curation pipeline runs before training: per-clip RMS
energy, zero-crossing rate, peak amplitude, silence ratio, and
clipping count — the signals used to drop silent, clipped, or
pure-noise clips. Codecs are NOT in this container, so the decode
stage is the documented stub (payload bytes stand in for 8-bit PCM
centered at 64, the printable-band midrange, so planted fixtures have
both signs); a real deployment replaces ONE line (``np.frombuffer`` of
decoded PCM) and keeps the identical kernel, schema, and batching.

``multimodal_video_scene_cuts`` is shot-boundary detection, the first
pass of video curation (sample-per-shot instead of per-frame): the
payload is framed into fixed 64-byte tiles, per-frame integer
luminance sums are compared pairwise, and a cut is an adjacent-frame
delta above threshold. Frame decode is stubbed the same way; the
framing, batching, and integer comparisons are the production shape.

Both kernels are Arrow-batched ``mapInPandas`` over vectorized numpy —
integer accumulators throughout (exact at any clip length; the only
float is the final RMS sqrt, which IEEE-754 defines exactly for a
given quotient), one pass, zero shuffles. At 100 TB these are
scan-bound maps that scale linearly with executor count.

No oracle: byte-level signal processing has no SQL twin — planted
waveform/cut fixtures pin the semantics (tests/test_r08_ops.py) and
the driver records a rows-only check.

Reference parity: core.clj has no binary-payload surface (SURVEY
§2.5); multimodal-family extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from orca_spark.operators.multimodal import attach_payload
from orca_spark.registry import register
from orca_spark.tables import load

_PCM_CENTER = 64  # stub decode: bytes -> centered 8-bit samples
_SILENCE_ABS = 2  # |sample| <= this counts as silence
_CLIP_ABS = 60  # |sample| >= this counts as clipped
_FRAME_BYTES = 64  # video stub: one 8x8 tile per frame
_CUT_DELTA = 512  # adjacent-frame |sum delta| >= this is a cut

_AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, energy bigint, rms_fp bigint, "
    "n_zero_cross bigint, peak bigint, silence_ppm bigint, n_clipped bigint"
)

_VIDEO_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_cuts bigint, max_delta bigint, "
    "first_frame_sum bigint"
)


def audio_features_kernel(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode + real DSP. Real deployments replace the frombuffer
    line with the decoded PCM of ``payload``; everything below it is
    the production feature math (integer-exact accumulators)."""
    out = {k: [] for k in (
        "doc_id", "n_samples", "energy", "rms_fp", "n_zero_cross",
        "peak", "silence_ppm", "n_clipped",
    )}
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        if payload is None:
            continue
        s = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
        s -= _PCM_CENTER
        n = int(s.size)
        out["doc_id"].append(int(doc_id))
        out["n_samples"].append(n)
        if n == 0:
            for k in ("energy", "rms_fp", "n_zero_cross", "peak",
                      "silence_ppm", "n_clipped"):
                out[k].append(0)
            continue
        energy = int(np.dot(s, s))
        out["energy"].append(energy)
        out["rms_fp"].append(int(np.floor(np.sqrt(energy / n) * 65536.0)))
        out["n_zero_cross"].append(int(np.sum(s[:-1] * s[1:] < 0)))
        out["peak"].append(int(np.max(np.abs(s))))
        out["silence_ppm"].append(
            int(np.sum(np.abs(s) <= _SILENCE_ABS)) * 1_000_000 // n
        )
        out["n_clipped"].append(int(np.sum(np.abs(s) >= _CLIP_ABS)))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


@register(
    "multimodal_audio_features",
    # no oracle: byte-level DSP has no SQL twin — planted waveform
    # fixtures in tests/test_r08_ops.py; rows-only driver check
    description="audio-clip profiling (RMS energy, zero-crossing rate, "
    "peak, silence ppm, clip count) — the drop-silent/clipped/noise "
    "pass of audio curation; stubbed PCM decode behind an Arrow-batched "
    "mapInPandas kernel with integer-exact accumulators, one pass, "
    "zero shuffles",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payloads = attach_payload(docs).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield audio_features_kernel(batch)

    return payloads.mapInPandas(run, schema=_AUDIO_SCHEMA)


def video_scene_kernel(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB frame decode + real shot-boundary math: 64-byte tiles as
    frames, integer luminance sums, cut = |adjacent delta| >= threshold."""
    out = {k: [] for k in (
        "doc_id", "n_frames", "n_cuts", "max_delta", "first_frame_sum",
    )}
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        if payload is None:
            continue
        raw = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
        n_frames = int(raw.size // _FRAME_BYTES)
        out["doc_id"].append(int(doc_id))
        out["n_frames"].append(n_frames)
        if n_frames == 0:
            out["n_cuts"].append(0)
            out["max_delta"].append(0)
            out["first_frame_sum"].append(0)
            continue
        frames = raw[: n_frames * _FRAME_BYTES].reshape(n_frames, _FRAME_BYTES)
        sums = frames.sum(axis=1)
        deltas = np.abs(np.diff(sums))
        out["n_cuts"].append(int(np.sum(deltas >= _CUT_DELTA)))
        out["max_delta"].append(int(deltas.max()) if deltas.size else 0)
        out["first_frame_sum"].append(int(sums[0]))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


@register(
    "multimodal_video_scene_cuts",
    # no oracle: framed byte-level diffing has no SQL twin — planted
    # cut fixtures in tests/test_r08_ops.py; rows-only driver check
    description="video shot-boundary detection (sample-per-shot "
    "curation): payload framed into 64-byte tiles, integer per-frame "
    "luminance sums, cut = adjacent delta >= threshold — stubbed frame "
    "decode behind Arrow-batched mapInPandas, integer-exact, one pass, "
    "zero shuffles",
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payloads = attach_payload(docs).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield video_scene_kernel(batch)

    return payloads.mapInPandas(run, schema=_VIDEO_SCHEMA)
