"""Perceptual-hash near-duplicate detection for the image modality.

``multimodal_phash_neardup`` extends the dedup family to images: each
document's payload — since r11 a genuine 16x16 P6 PPM container run
through the production decode→grayscale→8x8-resample chain
(multimodal7.phash_ppm_table); before that a bare md5-derived tile —
is reduced to a 64-bit DCT perceptual hash in an Arrow-batched
``mapInPandas`` kernel (type-II DCT as two 8x8 matrix multiplies —
numpy BLAS, no per-row Python), and near-duplicate pairs are found by
BANDED hamming search: the 64-bit hash splits into four 16-bit bands,
candidates collide on at least one band, and the exact hamming
distance is verified with ``bit_count(xor)`` — JVM-side popcount on
longs, never arrays.

HASH-FORMAT HISTORY (a persisted index must be rebuilt across these
breaks — r10 advisor note): r10 added the 2^-10 fixed-point
quantization before the median (cross-BLAS bit stability); r11 switched
the payload from bare md5 tiles to real PPM containers through the
decode path, changing every emitted hash value once more. The format
is now covered by two driver-hashed roundtrip oracles
(multimodal_phash_dct_roundtrip for the DCT kernel on raw tiles,
multimodal_phash_ppm_roundtrip for the full container chain), so any
future break fails the driver hash instead of landing silently.

Pigeonhole guarantee: hamming <= 3 flips at most 3 of 4 bands, so every
such pair shares a band — exact recall at the emitted threshold
(pairs are emitted up to hamming <= 6; between 4 and 6 recall is
band-probabilistic, documented). Identical source bytes give distance 0
always, so exact image dups are guaranteed caught.

Scale contract: the pair generation is banded (never all-pairs); band
buckets are capped by construction of the 16-bit keyspace, and the
verify is a long-xor popcount. The hash kernel touches each image once.

Fully oracled since r11: the whole chain (PPM pixels from md5 hex →
integer luma → block-mean resample → DCT → quantized median bits →
band collision → popcount verify) is re-derived in SQL, so the driver
hash-checks values, not just row counts; behavior tests (planted
identical / perturbed / unrelated images, recall floors) remain.

Reference parity: core.clj has no image surface (SURVEY §2.5);
multimodal-family extension (multimodal/multimodal2/multimodal3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_MAX_HAMMING = 6

# 8x8 type-II DCT basis, orthonormal — built once, reused per batch
_N = 8
_DCT = np.zeros((_N, _N))
for _k in range(_N):
    for _i in range(_N):
        _DCT[_k, _i] = np.cos(np.pi * _k * (2 * _i + 1) / (2 * _N))
_DCT[0, :] *= np.sqrt(1.0 / _N)
_DCT[1:, :] *= np.sqrt(2.0 / _N)


_QUANT = 1024.0  # fixed-point grid (2^-10) for the median comparison


def phash64(tile: np.ndarray) -> int:
    """64-bit perceptual hash of an 8x8 grayscale tile: 2-D DCT-II,
    then each coefficient's sign relative to the median of the 63
    non-DC coefficients becomes one bit (row-major).

    Coefficients are quantized to a 2^-10 fixed-point grid
    (``floor(c*1024 + 0.5)`` — round-half-up, identical in every
    engine) BEFORE the median/sign comparison. Without this, two
    mathematically-equal coefficients that land at the median can
    differ by one ulp depending on summation order (matmul pairwise
    sums vs a plain loop — observed on real corpus data), so the same
    tile bytes could hash differently across BLAS builds. A persisted
    phash index probed by a later job (dedup_phash_incremental) needs
    bit-for-bit reproducibility; the grid is ~1e-3 wide, nine orders
    above float noise. Strictly, quantization RELOCATES rather than
    eliminates the tie point (a true value within ~1 ulp of a
    half-integer boundary of the grid could still round differently),
    but the grid moves the boundary off the values this tile family
    produces — the observed equal-coefficient ties (e.g. the
    all-equal non-DC case) land mid-bucket at +0.5 and resolve
    identically; a tie within ~1 ulp of a grid boundary remains
    theoretically possible, just not observed and nine orders less
    likely than the unquantized median tie it replaced.
    """
    coef = _DCT @ tile.astype(np.float64) @ _DCT.T
    flat = np.floor(coef.flatten() * _QUANT + 0.5)
    med = np.median(flat[1:])
    bits = flat > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # interpret as signed 64-bit so it fits a Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        hashes = []
        for buf in pdf["tile"]:
            tile = np.frombuffer(bytes(buf), dtype=np.uint8)[:64].reshape(8, 8)
            hashes.append(phash64(tile))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "phash": pd.Series(hashes, dtype="int64")}
        )


def phash_table(docs: DataFrame) -> DataFrame:
    """(doc_id, phash) for every document: 64 deterministic tile bytes
    from chained md5, hashed by the Arrow DCT kernel."""
    tiles = docs.select(
        "doc_id",
        F.expr(
            "unhex(concat(md5(text), md5(concat(text, 'a')), "
            "md5(concat(text, 'b')), md5(concat(text, 'c'))))"
        ).alias("tile"),
    )
    return tiles.mapInPandas(_phash_batches, "doc_id bigint, phash bigint")


def _neardup_oracle() -> str:
    """Full SQL twin (new in r11 — this query was rows-only from r08
    through r10): the PPM phash chain is SQL-derivable end to end
    (multimodal7._PPM_TILE_SQL), and the banded pair search is
    deterministic, so the oracle replicates it EXACTLY — a pair is
    emitted iff some 16-bit band of the xor is zero (the band-collision
    condition) and the popcount is <= 6. The oracle's pair generation
    is a naive cross join (fine for DuckDB at driver scale); the Spark
    plan stays banded."""
    from orca_spark.operators.multimodal7 import _PPM_TILE_SQL

    return f"""
        WITH {_PPM_TILE_SQL}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM ph a, ph b
        WHERE a.doc_id < b.doc_id
          AND (((xor(a.u, b.u) >> 0)  & 65535) = 0
            OR ((xor(a.u, b.u) >> 16) & 65535) = 0
            OR ((xor(a.u, b.u) >> 32) & 65535) = 0
            OR ((xor(a.u, b.u) >> 48) & 65535) = 0)
          AND bit_count(xor(a.phash, b.phash)) <= {_MAX_HAMMING}
    """


@register(
    "multimodal_phash_neardup",
    oracle=_neardup_oracle(),
    description="image near-dup via 64-bit DCT perceptual hash: each "
    "document's genuine 16x16 P6 PPM container runs the production "
    "decode → integer-BT.601 grayscale → 8x8 block-mean resample → "
    "DCT-phash chain (multimodal7; hash values driver-verified by "
    "multimodal_phash_ppm_roundtrip), then pairs are found by 4x16-bit "
    "BAND collision + bit_count(xor) verify — exact recall at hamming "
    "<= 3 by pigeonhole, emitted up to <= 6; banded (never all-pairs), "
    "popcount on longs, one image pass",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orca_spark.operators.multimodal7 import phash_ppm_table

    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    hashes = phash_ppm_table(docs).localCheckpoint(eager=False)
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"(phash >> {16 * i}) & 65535").alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
        )
        .where(F.col("hamming") <= _MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )
