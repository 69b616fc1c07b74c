"""Round-11 operators: the end-to-end real image path (PPM decode →
grayscale → 8x8 block resample → DCT phash) and the persisted-phash-
index probe. The full-hash SQL re-derivations are exercised against
DuckDB by tests/test_adversarial_corpus.py and tests/test_sf01_oracle.py;
these tests pin the kernel pieces and the probe semantics directly."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from orca_spark.queries import queries


def _write_docs(d, rows):
    """rows: (doc_id, text, lang, source)"""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_decode_gray_tile_known_pixels():
    """Hand-built 16x16 P6: pure-red left half, pure-blue right half.
    Integer BT.601: red luma = 77*255//256 = 76, blue = 29*255//256 = 28;
    2x2 block means stay exactly 76 / 28 (floor of equal values)."""
    from orca_spark.operators.multimodal7 import decode_gray_tile

    raster = bytearray()
    for _r in range(16):
        raster += bytes([255, 0, 0]) * 8 + bytes([0, 0, 255]) * 8
    data = b"P6\n16 16\n255\n" + bytes(raster)
    tile = decode_gray_tile(data)
    assert tile.shape == (8, 8)
    assert (tile[:, :4] == 76).all()
    assert (tile[:, 4:] == 28).all()


def test_decode_gray_tile_block_mean_floors():
    """A 2x2 block of lumas {0,0,0,1} must floor to 0 (not round to 0.25
    or banker's-round); {1,1,1,0} floors to 0 as well via //4=0... use
    {2,2,2,2}->2 and {3,0,0,0}->0 to pin the floor."""
    from orca_spark.operators.multimodal7 import decode_gray_tile

    # gray pixel (g,g,g) has luma (77+150+29)*g//256 = g (exact for any g)
    raster = bytearray()
    for r in range(16):
        for c in range(16):
            g = 3 if (r == 0 and c == 0) else 0
            raster += bytes([g, g, g])
    data = b"P6\n16 16\n255\n" + bytes(raster)
    tile = decode_gray_tile(data)
    assert tile[0, 0] == 0  # (3+0+0+0)//4 — floor, not round
    assert (tile == 0).all()


def test_gray_weights_sum_keeps_gray_identity():
    """(77+150+29) = 256, so a pure-gray pixel's luma equals its value
    exactly — the property that makes the luma stage lossless for
    grayscale sources."""
    from orca_spark.operators.multimodal7 import decode_gray_tile

    raster = bytes(
        b for r in range(16) for c in range(16)
        for b in ([(r * 16 + c) % 256] * 3)
    )
    data = b"P6\n16 16\n255\n" + raster
    tile = decode_gray_tile(data)
    # block mean of 2x2 gray values == integer mean of those values
    for r8 in range(8):
        for c8 in range(8):
            vals = [
                (2 * r8 * 16 + (2 * c8 + dc) + dr * 16) % 256
                for dr in (0, 1)
                for dc in (0, 1)
            ]
            assert tile[r8, c8] == sum(vals) // 4


def test_ppm_payload_matches_python_md5_chain(spark, tmp_path):
    """The JVM-synthesized payload must byte-equal the Python-side
    synthesis convention (header + 48 suffixed md5 digests) — the
    contract both the kernel and the DuckDB oracle assume."""
    from orca_spark.operators.multimodal7 import ppm16_payload
    from orca_spark.tables import load

    _write_docs(tmp_path, [(7, "hello world", "en", "s")])
    row = (
        load(spark, str(tmp_path), "documents")
        .select(ppm16_payload().alias("p"))
        .collect()[0]
    )
    expect = b"P6\n16 16\n255\n" + b"".join(
        hashlib.md5(f"hello world{'p'}{i}".encode()).digest() for i in range(48)
    )
    assert bytes(row.p) == expect


def test_phash_ppm_identity_and_separation(spark, tmp_path):
    """Same text -> same container -> hamming-0 pair through the real
    decode chain; unrelated text -> no pair (independent md5 rasters)."""
    _write_docs(
        tmp_path,
        [(1, "the same text", "en", "s"), (2, "the same text", "en", "s"),
         (3, "completely different words here", "en", "s")],
    )
    rows = queries()["multimodal_phash_neardup"](spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_phash_incremental_probe_finds_reingested_and_only_those(
    spark, tmp_path
):
    """doc 10 (history, %10==0) is replayed in the probe batch and must
    self-match at hamming 0 via the PERSISTED index; doc 3 (new, odd)
    matches doc 4 only if their rasters collide — with distinct texts
    they must not. doc 5's text equals doc 2's -> cross-parity exact
    dup must surface at hamming 0."""
    _write_docs(
        tmp_path,
        [
            (2, "shared duplicate text", "en", "s"),
            (3, "a unique new document", "en", "s"),
            (4, "an old indexed document", "en", "s"),
            (5, "shared duplicate text", "en", "s"),
            (10, "replayed known content", "en", "s"),
        ],
    )
    rows = queries()["dedup_phash_incremental"](spark, str(tmp_path)).collect()
    got = [(r.new_doc, r.hist_doc, r.hamming) for r in rows]
    assert (5, 2, 0) in got  # new doc duplicating indexed content
    assert (10, 10, 0) in got  # re-ingested doc caught by the index
    assert all(h == 0 for (_, _, h) in got)
    assert {(3, 4)}.isdisjoint({(a, b) for a, b, _ in got})


def test_phash_ppm_roundtrip_matches_kernel_recomputation(spark, tmp_path):
    """The registered roundtrip query must equal a direct Python
    recomputation: synthesize the container, decode, hash — no Spark in
    the expectation path."""
    from orca_spark.operators.multimodal4 import phash64
    from orca_spark.operators.multimodal7 import decode_gray_tile

    texts = ["alpha beta", "gamma", ""]
    _write_docs(
        tmp_path, [(i, t, "en", "s") for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: r.phash
        for r in queries()["multimodal_phash_ppm_roundtrip"](
            spark, str(tmp_path)
        ).collect()
    }
    for i, t in enumerate(texts):
        data = b"P6\n16 16\n255\n" + b"".join(
            hashlib.md5(f"{t}p{j}".encode()).digest() for j in range(48)
        )
        assert got[i] == phash64(decode_gray_tile(data)), t
