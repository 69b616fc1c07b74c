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

Fully value-oracled since r12: the signature build replicates in
DuckDB via the generated pure-SQL xxhash64 (orca_spark/xxh64_sql.py),
and the chunk bucketing / hamming verify are plain integer SQL — the
driver hash-checks the PAIR SET exactly, pigeonhole recall included
(planted near-dup behavior additionally asserted in tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.operators.dedup import simhash_oracle_cte, simhash_signatures
from orca_spark.tables import load

_N_CHUNKS = 4          # 64 bits -> 4 x 16-bit chunks
_MAX_HAMMING = 3       # pigeonhole-exact for k <= _N_CHUNKS - 1


def simhash_banded_cand_cte() -> str:
    """``chunks`` + ``cand`` CTE block (assumes the ``sig`` CTE from
    dedup.simhash_oracle_cte is in scope): chunk pigeonhole buckets on
    the unsigned signature, DISTINCT candidate pairs carrying both
    signatures as ``sa``/``sb``. Parametrized on _N_CHUNKS so a retune
    moves every consumer — the registered pairs oracle here AND the
    banded label-propagation edge oracle (graph.py) — together;
    consumers apply their own hamming verify against _MAX_HAMMING."""
    return f"""chunks AS (
            SELECT doc_id, simhash, c,
                   (u // (CAST(1 AS HUGEINT) << CAST({64 // _N_CHUNKS}*c AS INT)))
                       % {1 << (64 // _N_CHUNKS)} AS bucket
            FROM sig, UNNEST(range({_N_CHUNKS})) AS cc(c)
        ),
        cand AS (
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                   l.simhash AS sa, r.simhash AS sb
            FROM chunks l JOIN chunks r
              ON l.c = r.c AND l.bucket = r.bucket AND l.doc_id < r.doc_id
        )"""


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
    # materialize before the self-join: referenced twice below, Spark
    # otherwise evaluates the 64-vote signature aggregation once per
    # side — and plans the smaller side as a broadcast build whose
    # single-threaded job re-runs the whole signature pipeline
    banded = (
        sig.select("doc_id", "simhash", F.explode(chunks).alias("cb"))
        .select(
            "doc_id",
            "simhash",
            F.col("cb.chunk").alias("chunk"),
            F.col("cb.bucket").alias("bucket"),
        )
        .localCheckpoint(eager=False)
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
    # FULL value oracle: signatures from the shared pure-SQL xxhash64
    # CTE (dedup.simhash_oracle_cte), chunk buckets as HUGEINT shift/mod
    # on the unsigned form, candidates from the same chunk equi-join,
    # hamming via bit_count(xor) on the signed signatures — the driver
    # hash-checks the pair set exactly, pigeonhole recall included.
    oracle=f"""
        WITH {simhash_oracle_cte()},
        {simhash_banded_cand_cte()}
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {_MAX_HAMMING}
    """,
    description=f"SimHash near-dup pairs: 4x16-bit chunk buckets "
    f"(pigeonhole: hamming<={_MAX_HAMMING} implies an equal chunk), "
    "bit_count(xor) verification on candidates only — exact for k<=3 "
    "with equi-join work, no all-pairs scan; fully value-oracled via "
    "the pure-SQL xxhash64 signature re-derivation",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash_signatures(load(spark, sf_dir, "documents"))
    return simhash_pairs(sig)
