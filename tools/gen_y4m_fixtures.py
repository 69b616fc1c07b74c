#!/usr/bin/env python
"""Generate the genuine YUV4MPEG2 fixtures under tests/fixtures/y4m/.

Run once and commit the outputs (they are deterministic — integer
pixel synthesis, no RNG; the Y4M container carries no timestamps):

    python tools/gen_y4m_fixtures.py

These are real Y4M streams (plain-text header + FRAME markers + raw
planar YUV) so the engine's video decode path
(orca_spark/operators/multimodal5.py ``_decode_luma_sums``) exercises
an actual format parse — header tokens, chroma strides, frame
framing — not a synthesized stand-in. Three shapes:

* ``cuts_420.y4m``     — 8x4 C420, six frames with two hard scene
  cuts (flat luma 16 -> 200 -> 16): the planted-cut smoke fixture.
  The default-chroma twin of the same stream (no C token) is derived
  in-test, pinning the 420 default.
* ``still_mono.y4m``   — 4x4 Cmono, four identical gradient frames:
  zero cuts, pins the mono stride (no chroma planes to skip) and the
  first-frame sum.
* ``fade_422.y4m``     — 4x2 C422, five frames stepping luma by +4
  per frame: sub-threshold deltas everywhere (a FADE, which
  shot-boundary detection must NOT call a cut), pins the 422 stride.
"""

from __future__ import annotations

import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "y4m",
)


def write_y4m(
    path: str, w: int, h: int, chroma: str | None, frame_lumas: list[int]
) -> None:
    """One flat-luma frame per entry; chroma planes filled with 128
    (neutral), sized by the subsampling's stride."""
    ysize = w * h
    strides = {"420": ysize // 2, "422": ysize, "444": ysize * 2, "mono": 0}
    cbytes = strides[chroma or "420"]
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1"
    if chroma is not None:
        header += f" C{chroma}"
    out = [header.encode() + b"\n"]
    for luma in frame_lumas:
        out.append(b"FRAME\n")
        out.append(bytes([luma]) * ysize + bytes([128]) * cbytes)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def write_y4m_rows(
    path: str, w: int, h: int, chroma: str, frames: list[list[int]]
) -> None:
    """Per-pixel luma rows (len w*h each) for the gradient fixtures."""
    ysize = w * h
    strides = {"420": ysize // 2, "422": ysize, "444": ysize * 2, "mono": 0}
    cbytes = strides[chroma]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 C{chroma}".encode() + b"\n"]
    for px in frames:
        assert len(px) == ysize
        out.append(b"FRAME\n" + bytes(px) + bytes([128]) * cbytes)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # 8x4 C420: flat 16 for 2 frames, hard cut to flat 200 for 2,
    # cut back to 16 for 2 — exactly two cuts of |delta| = 32*184
    write_y4m(
        os.path.join(OUT, "cuts_420.y4m"),
        8, 4, "420", [16, 16, 200, 200, 16, 16],
    )

    # 4x4 mono: four identical gradient frames (pixel i has luma i*10)
    grad = [i * 10 for i in range(16)]
    write_y4m_rows(
        os.path.join(OUT, "still_mono.y4m"), 4, 4, "mono", [grad] * 4
    )

    # 4x2 C422: luma fades 100 -> 116 in +4 steps; per-frame delta is
    # 8 pixels * 4 = 32 < the per-pixel-8 threshold (8*8=64) — no cuts
    write_y4m(
        os.path.join(OUT, "fade_422.y4m"),
        4, 2, "422", [100, 104, 108, 112, 116],
    )


if __name__ == "__main__":
    main()
