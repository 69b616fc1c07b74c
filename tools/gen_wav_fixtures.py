#!/usr/bin/env python
"""Generate the genuine RIFF/WAVE fixtures under tests/fixtures/wav/.

Run once and commit the outputs (they are deterministic — integer
sample synthesis, no RNG, no timestamps in the WAV container format):

    python tools/gen_wav_fixtures.py

These are real WAV containers written by stdlib ``wave`` so the
engine's audio decode path (orca_spark/operators/multimodal5.py
``_decode_pcm``) exercises an actual format parse — header, sample
width, channel interleave — not a synthesized stand-in. Three shapes:

* ``sine_8bit_mono.wav``   — 8-bit unsigned mono, one sine period:
  the minimal smoke fixture (unsigned-center handling).
* ``tones_16bit_stereo.wav`` — 16-bit signed stereo with DIFFERENT
  per-channel content: pins the channel-0 de-interleave (a decode
  that mixes channels or picks channel 1 fails the expected values).
* ``mix_16bit_mono.wav``   — 16-bit mono with a silent run, a loud
  clipped run, and a quiet run: exercises every threshold bucket
  (silence / normal / clipped) at the 16-bit scale.
"""

from __future__ import annotations

import math
import os
import struct
import wave

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "wav",
)


def write_wav(path: str, width: int, nch: int, frames: list[tuple[int, ...]]):
    with wave.open(path, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(8000)
        fmt = {1: "B", 2: "<h"}[width]
        raw = b"".join(
            struct.pack(fmt, v) for frame in frames for v in frame
        )
        w.writeframes(raw)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # one full sine period, 64 samples, amplitude 100 around the 8-bit
    # unsigned center 128
    sine = [
        (128 + round(100 * math.sin(2 * math.pi * i / 64)),)
        for i in range(64)
    ]
    write_wav(os.path.join(OUT, "sine_8bit_mono.wav"), 1, 1, sine)

    # stereo: channel 0 is a slow square wave, channel 1 is a ramp —
    # deliberately different so channel selection is observable
    stereo = [
        (12000 if (i // 8) % 2 == 0 else -12000, -30000 + 500 * i)
        for i in range(96)
    ]
    write_wav(os.path.join(OUT, "tones_16bit_stereo.wav"), 2, 2, stereo)

    # silence (16 samples at |s| <= 512), loud clipped (8 samples at
    # ±20000, past the 15360 clip line), quiet normal (8 at ±1000)
    mix = (
        [(100,), (-100,)] * 8
        + [(20000,), (-20000,)] * 4
        + [(1000,), (-1000,)] * 4
    )
    write_wav(os.path.join(OUT, "mix_16bit_mono.wav"), 2, 1, mix)

    for f in sorted(os.listdir(OUT)):
        p = os.path.join(OUT, f)
        print(f"{f}: {os.path.getsize(p)} bytes")


if __name__ == "__main__":
    main()
