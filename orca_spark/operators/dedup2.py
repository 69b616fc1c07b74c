"""SimHash near-dup pairing: hamming-distance candidate pairs at scale.

``dedup_simhash`` (dedup.py) emits 64-bit signatures; this module turns
them into near-dup PAIRS without an all-pairs scan. The standard
pigeonhole trick: split the 64 bits into 4 chunks of 16 — any pair at
hamming distance <= 3 differs in at most 3 chunks, so it MUST agree
exactly on at least one chunk. Pair only within per-chunk equality
buckets (4 equi-join-able buckets per doc), verify with
``bit_count(xor)`` on the candidates, and the result is EXACT for
k <= 3 while the work is O(candidates).

At 100 TB each chunk bucket is a plain 2-byte-key equi-join — skew-safe
under AQE, no cartesian anywhere.

No DuckDB oracle: the signature is built from ``xxhash64`` bit votes,
which has no DuckDB twin (same reason as ``dedup_simhash``); planted
near-dup behavior is asserted in tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.operators.dedup import simhash_signatures
from orca_spark.tables import load

_N_CHUNKS = 4          # 64 bits -> 4 x 16-bit chunks
_MAX_HAMMING = 3       # pigeonhole-exact for k <= _N_CHUNKS - 1


def simhash_pairs(sig: DataFrame, max_hamming: int = _MAX_HAMMING) -> DataFrame:
    """(doc_id, simhash) → (doc_a, doc_b, hamming) with hamming <= k.

    Exact for ``max_hamming < _N_CHUNKS`` (pigeonhole); for larger k the
    chunk buckets become a recall-<1 candidate generator (documented,
    not the registered configuration).
    """
    width = 64 // _N_CHUNKS
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bucket"),
            )
            for c in range(_N_CHUNKS)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.explode(chunks).alias("cb")).select(
        "doc_id",
        "simhash",
        F.col("cb.chunk").alias("chunk"),
        F.col("cb.bucket").alias("bucket"),
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sig_a"),
            F.col("r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


@register(
    "dedup_simhash_pairs",
    oracle=None,  # xxhash64-based signature has no DuckDB twin; planted
    # near-dup recovery + exactness vs brute force asserted in tests
    description=f"SimHash near-dup pairs: 4x16-bit chunk buckets "
    f"(pigeonhole: hamming<={_MAX_HAMMING} implies an equal chunk), "
    "bit_count(xor) verification on candidates only — exact for k<=3 "
    "with equi-join work, no all-pairs scan",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash_signatures(load(spark, sf_dir, "documents"))
    return simhash_pairs(sig)
