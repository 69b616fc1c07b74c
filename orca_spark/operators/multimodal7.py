"""Multimodal batch 7: the image modality goes end-to-end REAL.

Since r10 the audio (WAV) and video (Y4M) paths decode genuine
containers through production kernels with closed-form DuckDB oracles
(multimodal6). The image path lagged: ``multimodal_phash_neardup``
hashed bare 8x8 md5 tiles that never passed through the PPM decoder.
This module closes the gap (r10 verdict item 5):

* ``phash_ppm_table`` — per document a genuine 16x16 P6 PPM container
  is synthesized JVM-side (netpbm header + 768 RGB bytes from 48
  suffixed md5 digests of the text), then an Arrow-batched kernel runs
  the PRODUCTION chain: real netpbm header parse
  (``multimodal._parse_ppm_header``) → integer BT.601 grayscale
  ``(77r + 150g + 29b) // 256`` → 8x8 block-mean resample
  (2x2 blocks, floor) → the bit-stable ``phash64`` DCT kernel.
  Every stage is integer or fixed-point, so the hash is bit-for-bit
  reproducible across BLAS builds and SQL engines.

* ``multimodal_phash_ppm_roundtrip`` — the driver-facing proof: the
  oracle re-derives ALL 64 bits of every document's hash independently
  in SQL — pixel bytes from the md5 hex, the same integer luma, the
  same floor block mean, explicit 64-term DCT sums, 2^-10
  quantization, 63-element median, HUGEINT bit assembly. A regression
  in the header parse, channel order, luma weights, block indexing, or
  the DCT fails the driver hash.

* ``dedup_phash_incremental`` — the persisted-index probe the phash's
  bit-stability exists for (multimodal4 docstring): history docs (even
  ids) build a (band, key) index written ONCE to parquet; the new
  batch (odd ids) probes the stored index by band equi-join and
  verifies candidates with ``bit_count(xor)``. Cost is proportional to
  the new batch + collisions, never a history rescan — and because
  every stage is deterministic, the oracle replicates band recall
  EXACTLY, so even this incremental ANN surface is hash-checked.

Scale contract: synthesis+decode+hash is row-local (zero shuffles,
embarrassingly parallel); the pair search is banded (never all-pairs)
with 16-bit band keys and long-popcount verify; the probe touches the
persisted index only through a band equi-join.

Reference parity: core.clj has no image surface (SURVEY §2.5);
multimodal-family extension (multimodal4/multimodal6 siblings).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_W = _H = 16  # synthesized container geometry: 16x16 RGB, 8-bit
_N_DIGESTS = _W * _H * 3 // 16  # 48 md5 digests = 768 pixel bytes
_MAX_HAMMING = 6


def ppm16_payload() -> "F.Column":
    """Genuine 16x16 P6 PPM payload column: 13-byte netpbm header +
    768 RGB bytes from 48 suffixed md5 digests (md5(text || 'p0') ..
    md5(text || 'p47') — suffixing, not chaining, so the oracle derives
    each byte independently)."""
    parts = ", ".join(f"md5(concat(text, 'p{i}'))" for i in range(_N_DIGESTS))
    return F.concat(
        F.encode(F.lit(f"P6\n{_W} {_H}\n255\n"), "UTF-8"),
        F.expr(f"unhex(concat({parts}))"),
    )


def decode_gray_tile(data: bytes) -> np.ndarray:
    """PRODUCTION image→tile chain: parse the netpbm header, decode the
    RGB raster, integer BT.601 grayscale, block-mean resample to 8x8.

    All-integer on purpose: ``(77r + 150g + 29b) // 256`` and the
    floor block mean keep every intermediate exactly representable, so
    the tile (and therefore the phash) is identical across numpy/BLAS
    builds and re-derivable in SQL. Width/height must be multiples of 8
    (the synthesized corpus is 16x16; a general resampler would
    interpolate — out of scope for the hash contract).
    """
    from orca_spark.operators.multimodal import _parse_ppm_header

    w, h, _maxval, off = _parse_ppm_header(data)
    if w % 8 or h % 8:
        raise ValueError(f"dimensions {w}x{h} not multiples of 8")
    px = (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
        .astype(np.int64)
    )
    luma = (77 * px[:, :, 0] + 150 * px[:, :, 1] + 29 * px[:, :, 2]) // 256
    bh, bw = h // 8, w // 8
    return luma.reshape(8, bh, 8, bw).sum(axis=(1, 3)) // (bh * bw)


def _phash_ppm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from orca_spark.operators.multimodal4 import phash64

    for pdf in batches:
        ids, hashes = [], []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            if buf is None:
                continue
            ids.append(doc_id)
            hashes.append(phash64(decode_gray_tile(bytes(buf))))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "phash": pd.Series(hashes, dtype="int64"),
            }
        )


def phash_ppm_table(docs: DataFrame) -> DataFrame:
    """(doc_id, phash) with the hash computed from a genuine PPM
    container through the full production decode→gray→resample→DCT
    chain (one Arrow pass, zero shuffles)."""
    src = docs.where(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    ).select("doc_id", ppm16_payload().alias("payload"))
    return src.mapInPandas(_phash_ppm_batches, "doc_id bigint, phash bigint")


# --------------------------------------------------------------------------
# Oracle fragments: full SQL re-derivation of the production hash.
# px: 768 pixel bytes from the 48 suffixed md5 hex digests; lum: 16x16
# integer luma row-major; tl: 8x8 block-mean tile as DOUBLE (the DCT
# consumes doubles; the values are exact small integers). The DCT /
# median / bit-assembly stages are the proven multimodal6 pattern
# (HUGEINT shifts — `**` returns DOUBLE in DuckDB and corrupts low
# bits; floor(c*1024+0.5) is round-half-up in every engine).
# --------------------------------------------------------------------------

_PPM_TILE_SQL = """
        t AS (
            SELECT doc_id, list_transform(range(0,768), i ->
                (strpos('0123456789abcdef',
                        substr(md5(text || 'p' || CAST(i//16 AS VARCHAR)),
                               (i%16)*2+1, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(text || 'p' || CAST(i//16 AS VARCHAR)),
                               (i%16)*2+2, 1)) - 1)) AS px
            FROM documents
            WHERE text IS NOT NULL AND doc_id IS NOT NULL
        ),
        lm AS (
            SELECT doc_id, list_transform(range(0,256), j ->
                (77*px[3*j+1] + 150*px[3*j+2] + 29*px[3*j+3]) // 256) AS lum
            FROM t
        ),
        tile AS (
            SELECT doc_id, list_transform(range(0,64), s ->
                CAST((lum[(s//8)*32 + (s%8)*2 + 1]
                    + lum[(s//8)*32 + (s%8)*2 + 2]
                    + lum[(s//8)*32 + (s%8)*2 + 17]
                    + lum[(s//8)*32 + (s%8)*2 + 18]) // 4 AS DOUBLE)) AS tl
            FROM lm
        ),
        coef AS (
            SELECT doc_id, k, l,
                   floor((CASE WHEN k=0 THEN sqrt(0.125)
                               ELSE sqrt(0.25) END)
                       * (CASE WHEN l=0 THEN sqrt(0.125)
                               ELSE sqrt(0.25) END)
                       * sum(tl[i+1] * cos(pi()*k*(2*(i//8)+1)/16.0)
                                     * cos(pi()*l*(2*(i%8)+1)/16.0))
                       * 1024.0 + 0.5) AS q
            FROM tile,
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
        uhash AS (
            SELECT coef.doc_id,
                   sum(CASE WHEN q > m
                       THEN CAST(1 AS HUGEINT) << CAST(63-(k*8+l) AS INT)
                       ELSE CAST(0 AS HUGEINT) END) AS u
            FROM coef JOIN med ON coef.doc_id = med.doc_id
            GROUP BY coef.doc_id
        ),
        ph AS (
            SELECT doc_id, u,
                   CAST(CASE WHEN u >= CAST(1 AS HUGEINT) << 63
                        THEN u - (CAST(1 AS HUGEINT) << 64)
                        ELSE u END AS BIGINT) AS phash
            FROM uhash
        )
"""


@register(
    "multimodal_phash_ppm_roundtrip",
    oracle=f"""
        WITH {_PPM_TILE_SQL}
        SELECT doc_id, phash FROM ph
    """,
    description="ORACLED end-to-end image roundtrip: per document a "
    "genuine 16x16 P6 PPM container (netpbm header + 768 md5-derived "
    "RGB bytes) runs the PRODUCTION chain — real header parse, integer "
    "BT.601 grayscale (77r+150g+29b)//256, 2x2 floor block-mean "
    "resample to 8x8, bit-stable DCT phash — and the oracle re-derives "
    "all 64 bits independently in SQL (pixels from md5 hex, same "
    "integer luma/resample, explicit DCT sums, 2^-10 quantization, "
    "median, HUGEINT bit assembly); the image modality now meets the "
    "WAV/Y4M standard: a decode/resample/hash regression fails the "
    "driver hash",
)
def multimodal_phash_ppm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return phash_ppm_table(docs)


@register(
    "dedup_phash_incremental",
    oracle=f"""
        WITH {_PPM_TILE_SQL},
        hist AS (SELECT doc_id, u, phash FROM ph WHERE doc_id % 2 = 0),
        probe AS (SELECT doc_id, u, phash FROM ph
                  WHERE doc_id % 2 = 1 OR doc_id % 10 = 0),
        cand AS (
            SELECT p.doc_id AS new_doc, h.doc_id AS hist_doc,
                   p.phash AS pp, h.phash AS hp
            FROM probe p, hist h
            WHERE ((xor(p.u, h.u) >> 0)  & 65535) = 0
               OR ((xor(p.u, h.u) >> 16) & 65535) = 0
               OR ((xor(p.u, h.u) >> 32) & 65535) = 0
               OR ((xor(p.u, h.u) >> 48) & 65535) = 0
        )
        SELECT new_doc, hist_doc,
               CAST(bit_count(xor(pp, hp)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(pp, hp)) <= 6
        ORDER BY new_doc, hist_doc
    """,
    description="incremental image near-dup against a PERSISTED phash "
    "index — the probe pattern the phash's 2^-10 bit-stability exists "
    "for: history docs (even ids) write their 4x16-bit band keys to "
    "parquet ONCE; the new batch (odd ids + re-ingested %10 docs, so "
    "re-submitted known content is guaranteed present) hashes its own "
    "PPM payloads through the production chain, probes the stored "
    "index by (band, key) equi-join, and verifies with bit_count(xor) "
    "<= 6 — cost proportional to the new batch + collisions, never a "
    "history rescan; fully deterministic, so the oracle replicates "
    "band recall exactly and the driver hash-checks even this ANN "
    "surface",
)
def dedup_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch docs within hamming 6 of any indexed history doc,
    found via the persisted band index (the multimodal analog of
    dedup_minhash_incremental — same ingest/probe split, but exact).

    The probe batch is the odd-id docs plus the %10==0 history docs
    played back as re-ingests: detecting already-indexed content is
    the operator's whole job, and the replayed docs guarantee
    nontrivial (hamming-0) output for the driver hash instead of an
    all-distinct corpus's empty result."""
    from orca_spark.operators.io_ops import scratch_path

    d = load(spark, sf_dir, "documents")
    hist = d.where(F.col("doc_id") % 2 == 0)
    new = d.where((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0))

    def banded(hashes: DataFrame) -> DataFrame:
        return hashes.select(
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

    # index build (the once-per-ingest job): history's banded phashes
    idx_path = scratch_path("phash_index", sf_dir)
    banded(phash_ppm_table(hist)).write.mode("overwrite").parquet(idx_path)

    # probe: hash ONLY the new batch, equi-join the persisted index
    probe = banded(phash_ppm_table(new)).select(
        F.col("doc_id").alias("new_doc"),
        F.col("phash").alias("pp"),
        "band",
        "key",
    )
    idx = spark.read.parquet(idx_path).select(
        F.col("doc_id").alias("hist_doc"),
        F.col("phash").alias("hp"),
        "band",
        "key",
    )
    cand = (
        probe.join(idx, ["band", "key"])
        .select("new_doc", "hist_doc", "pp", "hp")
        .dropDuplicates(["new_doc", "hist_doc"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("pp").bitwiseXOR(F.col("hp"))).cast("long"),
        )
        .where(F.col("hamming") <= _MAX_HAMMING)
        .select("new_doc", "hist_doc", "hamming")
        .orderBy("new_doc", "hist_doc")
    )
