"""Round-9 operator tests: the real RIFF/WAVE decode path.

The audio kernel's decode stage is format-dispatched since r09: genuine
WAV containers (committed fixtures under tests/fixtures/wav/, generated
by tools/gen_wav_fixtures.py) parse for real via stdlib ``wave``;
everything else keeps the documented byte-synthesis stub. These tests
pin both paths and the exactness of the feature math at 16/32-bit
scales.
"""

from __future__ import annotations

import io
import math
import os
import struct
import wave

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR

from orca_spark.operators.multimodal5 import (
    _PCM_CENTER,
    _decode_pcm,
    audio_features_kernel,
)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "wav")


def _read(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def _features(payload: bytes, doc_id: int = 1) -> dict:
    out = audio_features_kernel(
        pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})
    )
    assert len(out) == 1
    return {k: int(v) for k, v in out.iloc[0].items()}


def test_wav_mix_16bit_mono_exact_features():
    """The threshold-bucket fixture: 16 silent, 8 clipped, 8 quiet
    samples — every feature checked against hand arithmetic at the
    16-bit scale (silence |s|<=512, clip |s|>=15360)."""
    payload = _read("mix_16bit_mono.wav")
    s, full_scale = _decode_pcm(payload)
    expected = [100, -100] * 8 + [20000, -20000] * 4 + [1000, -1000] * 4
    assert full_scale == 32768
    assert s.tolist() == expected

    f = _features(payload)
    energy = 16 * 100**2 + 8 * 20000**2 + 8 * 1000**2
    assert f["n_samples"] == 32
    assert f["energy"] == energy
    assert f["rms_fp"] == int(math.floor(math.sqrt(energy / 32) * 65536.0))
    assert f["n_zero_cross"] == 31  # strict alternation throughout
    assert f["peak"] == 20000
    assert f["silence_ppm"] == 16 * 1_000_000 // 32
    assert f["n_clipped"] == 8


def test_wav_stereo_keeps_channel_zero():
    """Channel 0 is a ±12000 square wave; channel 1 ramps to -30000+.
    A decode that mixed channels or picked channel 1 would change the
    peak and the sample count."""
    payload = _read("tones_16bit_stereo.wav")
    s, full_scale = _decode_pcm(payload)
    assert full_scale == 32768
    assert s.size == 96
    assert int(np.max(np.abs(s))) == 12000
    assert set(s.tolist()) == {12000, -12000}


def test_wav_8bit_unsigned_center():
    """8-bit WAV is unsigned with center 128 (NOT the stub's 64): one
    sine period decodes to symmetric ±100 extremes and zero mean-ish."""
    payload = _read("sine_8bit_mono.wav")
    s, full_scale = _decode_pcm(payload)
    assert full_scale == 128
    assert s.size == 64
    assert int(np.max(s)) == 100 and int(np.min(s)) == -100
    assert s[0] == 0  # sin(0), centered exactly


def test_non_riff_payload_keeps_stub_semantics():
    """The synthesis stub is byte-for-byte what it was before the WAV
    dispatch landed: raw bytes minus the 8-bit-ish center."""
    payload = b"hello orca"
    s, full_scale = _decode_pcm(payload)
    assert full_scale == 128
    assert s.tolist() == [b - _PCM_CENTER for b in payload]


def test_riff_garbage_falls_back_to_stub():
    """A payload that merely STARTS like a RIFF/WAVE container but fails
    the parse must not crash the kernel — it degrades to the stub."""
    payload = b"RIFF\x10\x00\x00\x00WAVEnot-a-real-container"
    s, full_scale = _decode_pcm(payload)
    assert full_scale == 128
    assert s.size == len(payload)


def _wav_pcm(samples: list[int], width: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(8000)
        if width == 3:
            raw = b"".join(
                struct.pack("<i", v)[:3] for v in samples
            )  # little-endian keeps the low 3 bytes
        else:
            raw = b"".join(struct.pack("<i", v) for v in samples)
        w.writeframes(raw)
    return buf.getvalue()


def _wav_32bit(samples: list[int]) -> bytes:
    return _wav_pcm(samples, 4)


def test_wav_24bit_sign_extension():
    """24-bit PCM is 3-byte two's complement: both full-scale extremes
    and a small negative must sign-extend exactly."""
    samples = [8388607, -8388608, -1, 2]
    s, full_scale = _decode_pcm(_wav_pcm(samples, 3))
    assert full_scale == 1 << 23
    assert s.tolist() == samples


def test_energy_exact_past_int64_dot():
    """Σs² for 32-bit samples overflows a plain int64 np.dot; the
    31-bit-split accumulator stays exact, and the BIGINT column
    saturates deterministically when even the exact value won't fit."""
    lo, hi = -(2**31), 2**31 - 1
    # exact value fits int64: checked against Python big-int arithmetic
    f = _features(_wav_32bit([hi, lo]))
    assert f["energy"] == hi * hi + lo * lo
    # three full-scale squares exceed int64: np.dot would wrap negative;
    # the column reports the documented saturation value instead
    f = _features(_wav_32bit([lo, lo, lo]))
    assert f["energy"] == (1 << 63) - 1
    assert f["peak"] == 2**31


def test_budget_allocation_is_exact_hamilton(spark):
    """Largest-remainder apportionment invariants at sf0.001: the
    allocations sum to the budget EXACTLY (the property floats cannot
    give), every allocation is within 1 of its real-valued quota
    (Hamilton's defining bound), and a zero-mass shard receives
    nothing."""
    from orca_spark.operators.mixture3 import _BUDGET
    from orca_spark.registry import REGISTRY

    rows = (
        REGISTRY["corpus_token_budget_allocation"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    assert sum(r.alloc_tokens for r in rows) == _BUDGET
    total_root = sum(r.root for r in rows)
    for r in rows:
        exact = _BUDGET * r.root / total_root
        assert exact - 1 < r.alloc_tokens < exact + 1, (r, exact)
        if r.root == 0:
            assert r.alloc_tokens == 0, r


def test_ccnet_schedule_drops_tail_and_normalizes(spark):
    """The schedule has only head/middle buckets, and each language's
    kept-bucket weights are a ppm partition (sum within ~1 of 1e6,
    truncating division loses at most one ppm per bucket)."""
    from orca_spark.registry import REGISTRY

    rows = (
        REGISTRY["corpus_ccnet_mix_schedule"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    assert {r.bucket for r in rows} <= {"head", "middle"}
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, shard in by_lang.items():
        s = sum(r.weight_ppm for r in shard)
        assert 1_000_000 - len(shard) < s <= 1_000_000, (lang, s)


def test_wav_payload_through_spark_kernel(spark):
    """The same kernel the registered query runs (Arrow-batched
    mapInPandas, identical schema) decodes a genuine WAV payload
    end-to-end through Spark."""
    from orca_spark.operators.multimodal5 import _AUDIO_SCHEMA

    payload = _read("mix_16bit_mono.wav")
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")

    def run(batches):
        for b in batches:
            yield audio_features_kernel(b)

    row = df.mapInPandas(run, schema=_AUDIO_SCHEMA).collect()[0]
    assert row.n_samples == 32
    assert row.peak == 20000
    assert row.n_clipped == 8
    assert row.silence_ppm == 500000
