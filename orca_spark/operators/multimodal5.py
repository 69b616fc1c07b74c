"""Multimodal batch 5: the audio and video modalities — feature
extraction over opaque binary payloads, same plumbing contract as the
image family (multimodal/multimodal2/multimodal4).

``multimodal_audio_features`` is the audio profiling pass every
speech/audio curation pipeline runs before training: per-clip RMS
energy, zero-crossing rate, peak amplitude, silence ratio, and
clipping count — the signals used to drop silent, clipped, or
pure-noise clips. The decode stage is format-dispatched: a payload
that IS a RIFF/WAVE container is parsed for real — stdlib ``wave``
header parse + PCM frame decode (8/16/24/32-bit, channel 0 of
interleaved multi-channel), zero new dependencies, genuine fixture
files in ``tests/fixtures/wav/`` — and everything else falls back to
the documented synthesis stub (payload bytes stand in for 8-bit PCM
centered at 64, the printable-band midrange, so planted fixtures have
both signs). Compressed codecs (mp3/opus/flac) are NOT in this
container; adding one extends ``_decode_pcm``'s dispatch, the kernel,
schema, and batching are already the production shape. Thresholds are
expressed as fractions of full scale so the same rules grade 8-bit
stub samples and 16-bit studio PCM identically.

``multimodal_video_scene_cuts`` is shot-boundary detection, the first
pass of video curation (sample-per-shot instead of per-frame):
per-frame integer luminance sums are compared pairwise, and a cut is
an adjacent-frame delta above a per-pixel threshold. Frame decode is
format-dispatched like audio: a payload that IS a YUV4MPEG2 (Y4M)
stream is parsed for real — plain-text header + raw planar YUV
frames, the Y plane read directly as luminance, 420/422/444/mono
chroma strides, zero new dependencies, genuine fixture files in
``tests/fixtures/y4m/`` — and everything else falls back to the
documented synthesis stub (payload framed into fixed 64-byte tiles).
Compressed codecs (h264/vp9/av1) are NOT in this container; adding
one extends ``_decode_luma_sums``'s dispatch, the kernel, schema, and
batching are already the production shape.

Both kernels are Arrow-batched ``mapInPandas`` over vectorized numpy —
integer accumulators throughout (exact at any clip length; the only
float is the final RMS sqrt, which IEEE-754 defines exactly for a
given quotient), one pass, zero shuffles. At 100 TB these are
scan-bound maps that scale linearly with executor count.

Both carry FULL value oracles since r12: the corpus payloads are UTF-8
text bytes, so on every test corpus the kernels take the documented
stub branch, whose math is pure integer byte arithmetic — a DuckDB
twin extracts each byte via two hex-nibble lookups (the multimodal7
device) and re-derives every feature exactly. The real-container
branches (RIFF/WAVE, Y4M) stay pinned by the planted fixture files in
tests/test_r08_ops.py, which also asserts no test corpus text can
reach them (a text would have to be a byte-valid container AND valid
UTF-8).

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
_STUB_FULL_SCALE = 128  # stub samples live in the 8-bit-ish band
# thresholds as integer fractions of full scale: at the stub's scale of
# 128 these reduce to the original |s| <= 2 silence / |s| >= 60 clip
# constants, and a 16-bit WAV grades at the same physical levels
# (silence 512, clip 15360) — one rule set across decoders
_SILENCE_NUM = 2  # silence: |s| <= full_scale * 2 // 128
_CLIP_NUM = 60  # clipped: |s| >= full_scale * 60 // 128
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


def _decode_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Format-dispatched decode: (int64 samples, full_scale).

    A genuine RIFF/WAVE payload is parsed for real — stdlib ``wave``
    reads the header (sample width, channel count) and the PCM frames;
    8-bit WAV is unsigned (centered at 128), 16/32-bit are signed
    little-endian, 24-bit is 3-byte two's complement sign-extended with
    integer ops. Interleaved multi-channel keeps channel 0 (a curation
    profile wants one representative stream; mixdown choice is
    deterministic either way). Anything else — including a payload that
    merely starts with 'RIFF' but fails the container parse — falls
    back to the documented synthesis stub: raw bytes as 8-bit PCM
    centered at ``_PCM_CENTER``."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                width, nch = w.getsampwidth(), w.getnchannels()
                raw = w.readframes(w.getnframes())
            if width == 1:
                s = np.frombuffer(raw, np.uint8).astype(np.int64) - 128
            elif width == 2:
                s = np.frombuffer(raw, "<i2").astype(np.int64)
            elif width == 4:
                s = np.frombuffer(raw, "<i4").astype(np.int64)
            elif width == 3:
                b = np.frombuffer(raw, np.uint8)
                b = b[: (b.size // 3) * 3].reshape(-1, 3).astype(np.int64)
                s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                s = (s ^ 0x800000) - 0x800000  # sign-extend bit 23
            else:
                raise ValueError(f"unsupported sample width {width}")
            return s[::nch], 1 << (8 * width - 1)
        except (wave.Error, EOFError, ValueError, RuntimeError):
            # not a decodable WAV after all — stub path below. wave
            # surfaces truncated/garbage chunks as wave.Error OR
            # RuntimeError (chunk parse) depending on where it dies.
            pass
    s = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
    return s - _PCM_CENTER, _STUB_FULL_SCALE


def audio_features_kernel(batch: pd.DataFrame) -> pd.DataFrame:
    """Dispatching decode (real WAV parse or documented stub) + real
    DSP: everything below ``_decode_pcm`` is the production feature
    math (integer-exact accumulators), identical for both paths."""
    out = {k: [] for k in (
        "doc_id", "n_samples", "energy", "rms_fp", "n_zero_cross",
        "peak", "silence_ppm", "n_clipped",
    )}
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        if payload is None:
            continue
        s, full_scale = _decode_pcm(bytes(payload))
        silence_abs = full_scale * _SILENCE_NUM // _STUB_FULL_SCALE
        clip_abs = full_scale * _CLIP_NUM // _STUB_FULL_SCALE
        n = int(s.size)
        out["doc_id"].append(int(doc_id))
        out["n_samples"].append(n)
        if n == 0:
            for k in ("energy", "rms_fp", "n_zero_cross", "peak",
                      "silence_ppm", "n_clipped"):
                out[k].append(0)
            continue
        # exact energy at ANY sample width: an int64 np.dot silently
        # wraps once Σs² crosses 2^63 (two full-scale 32-bit squares
        # already do). Each element square fits int64 (max (−2^31)² =
        # 2^62), so split squares into 31-bit halves and recombine in
        # Python big-int — vectorized, exact for clips up to 2^31
        # samples (~13 h at 44.1 kHz) per accumulator term.
        sq = s * s
        energy = (int((sq >> 31).sum()) << 31) + int((sq & 0x7FFFFFFF).sum())
        # the column is BIGINT: a pathological full-scale 32-bit clip
        # can push exact energy past int64 — saturate deterministically
        # (rms_fp below uses the exact value first)
        out["energy"].append(min(energy, (1 << 63) - 1))
        out["rms_fp"].append(int(np.floor(np.sqrt(energy / n) * 65536.0)))
        out["n_zero_cross"].append(int(np.sum(s[:-1] * s[1:] < 0)))
        out["peak"].append(int(np.max(np.abs(s))))
        out["silence_ppm"].append(
            int(np.sum(np.abs(s) <= silence_abs)) * 1_000_000 // n
        )
        out["n_clipped"].append(int(np.sum(np.abs(s) >= clip_abs)))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


# --------------------------------------------------------------------------
# Oracle fragments (r12): the corpus payloads are UTF-8 text bytes
# (attach_payload), so on every test corpus the kernels take the
# DOCUMENTED STUB branch — whose feature math is pure integer byte
# arithmetic, re-derivable in SQL exactly like the PPM phash chain
# (multimodal7). Byte extraction: hex() the whole blob once, then two
# strpos nibble lookups per byte (DuckDB has no substr over BLOB).
# The oracle replicates the stub branch only; the real-container
# branches (RIFF/WAVE, YUV4MPEG2) fire on none of the corpora — a text
# would have to be a byte-valid WAV/Y4M stream AND valid UTF-8 — and
# tests/test_r08_ops.py::test_corpora_never_hit_container_branches
# makes that assumption structural rather than hoped.
# --------------------------------------------------------------------------

_BYTES_SQL = """
        bh AS (
            SELECT doc_id, octet_length(encode(text)) AS n,
                   hex(encode(text)) AS h
            FROM documents
            WHERE text IS NOT NULL
        ),
        b AS (
            SELECT doc_id, n,
                   list_transform(range(0, n), i ->
                       (strpos('0123456789ABCDEF',
                               substr(h, CAST(2*i+1 AS BIGINT), 1)) - 1) * 16
                     + (strpos('0123456789ABCDEF',
                               substr(h, CAST(2*i+2 AS BIGINT), 1)) - 1)) AS bs
            FROM bh
        )
"""

_AUDIO_ORACLE = f"""
    WITH {_BYTES_SQL},
    s AS (
        SELECT doc_id, n,
               list_transform(bs, v -> v - {_PCM_CENTER}) AS sm
        FROM b
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(CASE WHEN n = 0 THEN 0 ELSE
                list_sum(list_transform(sm, v -> v*v)) END AS BIGINT)
               AS energy,
           CAST(CASE WHEN n = 0 THEN 0 ELSE
                floor(sqrt(CAST(list_sum(list_transform(sm, v -> v*v))
                                AS DOUBLE) / n) * 65536.0) END AS BIGINT)
               AS rms_fp,
           CAST(CASE WHEN n = 0 THEN 0 ELSE coalesce(
                list_sum(list_transform(range(1, n), i ->
                    CASE WHEN sm[i] * sm[i+1] < 0 THEN 1 ELSE 0 END)), 0)
                END AS BIGINT) AS n_zero_cross,
           CAST(CASE WHEN n = 0 THEN 0 ELSE
                list_max(list_transform(sm, v -> abs(v))) END AS BIGINT)
               AS peak,
           CAST(CASE WHEN n = 0 THEN 0 ELSE
                list_sum(list_transform(sm, v ->
                    CASE WHEN abs(v) <= {_SILENCE_NUM} THEN 1 ELSE 0 END))
                * 1000000 // n END AS BIGINT) AS silence_ppm,
           CAST(CASE WHEN n = 0 THEN 0 ELSE
                list_sum(list_transform(sm, v ->
                    CASE WHEN abs(v) >= {_CLIP_NUM} THEN 1 ELSE 0 END))
                END AS BIGINT) AS n_clipped
    FROM s
"""

_VIDEO_ORACLE = f"""
    WITH {_BYTES_SQL},
    fr AS (
        SELECT doc_id, n // {_FRAME_BYTES} AS n_frames,
               list_transform(range(0, n // {_FRAME_BYTES}), f ->
                   list_sum(list_transform(range(0, {_FRAME_BYTES}), i ->
                       bs[f*{_FRAME_BYTES} + i + 1]))) AS fsums
        FROM b
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(CASE WHEN n_frames <= 1 THEN 0 ELSE coalesce(
                list_sum(list_transform(range(1, n_frames), j ->
                    CASE WHEN abs(fsums[j+1] - fsums[j]) >= {_CUT_DELTA}
                         THEN 1 ELSE 0 END)), 0) END AS BIGINT) AS n_cuts,
           CAST(CASE WHEN n_frames <= 1 THEN 0 ELSE
                list_max(list_transform(range(1, n_frames), j ->
                    abs(fsums[j+1] - fsums[j]))) END AS BIGINT) AS max_delta,
           CAST(CASE WHEN n_frames = 0 THEN 0 ELSE fsums[1] END AS BIGINT)
               AS first_frame_sum
    FROM fr
"""


@register(
    "multimodal_audio_features",
    oracle=_AUDIO_ORACLE,
    description="audio-clip profiling (RMS energy, zero-crossing rate, "
    "peak, silence ppm, clip count) — the drop-silent/clipped/noise "
    "pass of audio curation; stubbed PCM decode behind an Arrow-batched "
    "mapInPandas kernel with integer-exact accumulators, one pass, "
    "zero shuffles; fully value-oracled since r12 (the stub branch is "
    "byte arithmetic a hex-nibble SQL twin re-derives exactly — the "
    "real-WAV branch stays fixture-tested)",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payloads = attach_payload(docs).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield audio_features_kernel(batch)

    return payloads.mapInPandas(run, schema=_AUDIO_SCHEMA)


def _decode_luma_sums(payload: bytes) -> tuple[np.ndarray, int]:
    """Format-dispatched video decode: (per-frame luma sums, pixels per
    frame).

    A genuine YUV4MPEG2 (Y4M) stream is parsed for real — the format is
    a plain-text header (``YUV4MPEG2 W<w> H<h> ... C<chroma>\\n``)
    followed by ``FRAME[params]\\n`` + raw planar YUV per frame, so the
    parse is pure stdlib/numpy: the Y plane (the first w*h bytes of
    each frame) IS the luminance the scene-cut math wants, no color
    conversion needed. 420/422/444/mono chroma subsamplings are
    supported (they only change the per-frame byte stride; the luma
    plane is identical). Anything else — including a payload that
    merely starts with the magic but fails the stream parse (missing
    dims, bad FRAME marker, truncated frame) — falls back to the
    documented synthesis stub: raw bytes framed into fixed
    ``_FRAME_BYTES``-byte tiles. Genuine fixture files live in
    ``tests/fixtures/y4m/`` (tools/gen_y4m_fixtures.py)."""
    if payload[:9] == b"YUV4MPEG2":
        parsed = _parse_y4m(payload)
        if parsed is not None:
            return parsed
    raw = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
    n_frames = int(raw.size // _FRAME_BYTES)
    if n_frames == 0:
        return np.zeros(0, dtype=np.int64), _FRAME_BYTES
    tiles = raw[: n_frames * _FRAME_BYTES].reshape(n_frames, _FRAME_BYTES)
    return tiles.sum(axis=1), _FRAME_BYTES


def _parse_y4m(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Strict Y4M stream parse; None on any malformation (caller
    stubs). Returns (per-frame Y-plane sums, w*h)."""
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    chroma = b"420"  # the Y4M default when no C parameter is present
    for tok in payload[9:nl].split(b" "):
        if tok[:1] == b"W" and tok[1:].isdigit():
            w = int(tok[1:])
        elif tok[:1] == b"H" and tok[1:].isdigit():
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:]
    if w <= 0 or h <= 0:
        return None
    ysize = w * h
    if chroma[:4] == b"mono":
        fsize = ysize
    elif chroma[:3] == b"420":
        fsize = ysize + ysize // 2
    elif chroma[:3] == b"422":
        fsize = ysize * 2
    elif chroma[:3] == b"444":
        fsize = ysize * 3
    else:
        return None
    sums: list[int] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            return None
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + fsize > n:
            return None
        y = np.frombuffer(payload[fnl + 1 : fnl + 1 + ysize], np.uint8)
        sums.append(int(y.astype(np.int64).sum()))
        pos = fnl + 1 + fsize
    if not sums:
        return None
    return np.asarray(sums, dtype=np.int64), ysize


def video_scene_kernel(batch: pd.DataFrame) -> pd.DataFrame:
    """Dispatching decode (real Y4M parse or documented tile stub) +
    real shot-boundary math: integer per-frame luminance sums, cut =
    |adjacent delta| >= threshold. The threshold is expressed PER
    PIXEL (``_CUT_DELTA / _FRAME_BYTES`` = 8 luma levels), so the same
    rule grades 64-byte stub tiles and real W*H Y4M frames at the same
    physical level — the WAV family's fraction-of-full-scale idea."""
    out = {k: [] for k in (
        "doc_id", "n_frames", "n_cuts", "max_delta", "first_frame_sum",
    )}
    for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
        if payload is None:
            continue
        sums, frame_pixels = _decode_luma_sums(bytes(payload))
        n_frames = int(sums.size)
        out["doc_id"].append(int(doc_id))
        out["n_frames"].append(n_frames)
        if n_frames == 0:
            out["n_cuts"].append(0)
            out["max_delta"].append(0)
            out["first_frame_sum"].append(0)
            continue
        # per-pixel threshold scaled to this decoder's frame size: at
        # the stub's 64-byte tiles this reduces to the original 512
        cut_abs = frame_pixels * _CUT_DELTA // _FRAME_BYTES
        deltas = np.abs(np.diff(sums))
        out["n_cuts"].append(int(np.sum(deltas >= cut_abs)))
        out["max_delta"].append(int(deltas.max()) if deltas.size else 0)
        out["first_frame_sum"].append(int(sums[0]))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


@register(
    "multimodal_video_scene_cuts",
    oracle=_VIDEO_ORACLE,
    description="video shot-boundary detection (sample-per-shot "
    "curation): integer per-frame luminance sums, cut = adjacent "
    "delta >= per-pixel threshold — REAL YUV4MPEG2 (Y4M) stream parse "
    "(Y plane as luma, 420/422/444/mono) with documented 64-byte-tile "
    "stub fallback, behind Arrow-batched mapInPandas, integer-exact, "
    "one pass, zero shuffles; fully value-oracled since r12 (the tile "
    "stub is framed byte sums a hex-nibble SQL twin re-derives exactly "
    "— the real-Y4M branch stays fixture-tested)",
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payloads = attach_payload(docs).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield video_scene_kernel(batch)

    return payloads.mapInPandas(run, schema=_VIDEO_SCHEMA)
