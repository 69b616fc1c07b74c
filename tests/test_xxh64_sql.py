"""Bit-exactness of the generated DuckDB xxhash64 fragment vs Spark.

The fragment (orca_spark/xxh64_sql.py) is the oracle substrate for the
MinHash/SimHash dedup family — a single wrong bit anywhere silently
flips band buckets and signature bits, so the property here is strict
equality against a live Spark session across every XXH64 phase
boundary (0/4/8/31/32/33 bytes, multi-stripe, multi-byte UTF-8) and
across seed chaining (Spark's multi-argument form).
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from orca_spark.xxh64_sql import to_signed, xxh64

# stress every phase: empty, byte-tail only, 4-byte step, exact word,
# stripe boundary at 32, multi-stripe, and multi-byte UTF-8 (the bytes
# hashed are the UTF-8 encoding, so é/☃/𝄞 exercise 2/3/4-byte chars)
_ALPHABET = string.ascii_letters + string.digits + " ,.'-éü☃中字𝄞"
_BOUNDARY_LENGTHS = [
    0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 15, 16, 17, 24, 31, 32, 33,
    39, 40, 47, 48, 63, 64, 65, 95, 96, 97, 130, 200,
]


def _corpus(rng: random.Random) -> list[str]:
    vals = [""]
    for n in _BOUNDARY_LENGTHS:
        vals.append("".join(rng.choice(_ALPHABET) for _ in range(n)))
    for _ in range(30):
        vals.append(
            "".join(
                rng.choice(_ALPHABET) for _ in range(rng.randrange(0, 120))
            )
        )
    return vals


def test_known_vectors(duck):
    """Pinned values (computed from Spark 4.1 ``xxhash64``, seed 42) —
    catches a regression in the generator without needing a session."""
    frag = to_signed(xxh64("s", 42))
    got = dict(
        duck.execute(
            f"SELECT s, {frag} FROM (VALUES (''), ('a'), ('hello')) v(s)"
        ).fetchall()
    )
    assert got[""] == -7444071767201028348
    assert got["a"] == -8582455328737087284
    assert got["hello"] == -4367754540140381902


def test_single_arg_bit_exact(spark, duck):
    vals = _corpus(random.Random(7))
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    want = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    duck.execute("CREATE OR REPLACE TABLE _xxh_t (s VARCHAR)")
    duck.executemany("INSERT INTO _xxh_t VALUES (?)", [(v,) for v in vals])
    frag = to_signed(xxh64("s", 42))
    got = dict(duck.execute(f"SELECT s, {frag} FROM _xxh_t").fetchall())
    mismatches = {v: (want[v], got[v]) for v in vals if want[v] != got[v]}
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches}"


def test_chained_multi_arg_bit_exact(spark, duck):
    """Spark's xxhash64(a, b, c) == per-stage fragments with the running
    hash as the next seed, applied across CTE columns (the oracle
    composition shape — nesting fragments inside the seed slot instead
    blows up DuckDB's binder)."""
    rng = random.Random(13)
    vals = _corpus(rng)
    triples = [
        (rng.choice(vals), rng.choice(vals), rng.choice(vals))
        for _ in range(40)
    ]
    df = spark.createDataFrame(triples, "a string, b string, c string")
    want = sorted(
        r.h for r in df.select(F.xxhash64("a", "b", "c").alias("h")).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE _xxh_t3 (a VARCHAR, b VARCHAR, c VARCHAR)")
    duck.executemany("INSERT INTO _xxh_t3 VALUES (?,?,?)", triples)
    q = f"""
        WITH s1 AS (SELECT a, b, c, {xxh64('a', 42)} AS h1 FROM _xxh_t3),
        s2 AS (SELECT b, c, {xxh64('b', 'h1')} AS h2 FROM s1)
        SELECT {to_signed(xxh64('c', 'h2'))} AS h FROM s2
    """
    got = sorted(r[0] for r in duck.execute(q).fetchall())
    assert got == want


def test_long_column_seed(spark, duck):
    """Seeding from a negative BIGINT column (a previous Spark hash) —
    the sign normalization in the fragment must reproduce Spark's
    unsigned reinterpretation of the running hash."""
    pairs = [("alpha", "beta"), ("", "tail"), ("léft", "righ☃")]
    df = spark.createDataFrame(pairs, "a string, b string")
    want = sorted(
        r.h for r in df.select(F.xxhash64("a", "b").alias("h")).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE _xxh_t2 (a VARCHAR, b VARCHAR)")
    duck.executemany("INSERT INTO _xxh_t2 VALUES (?,?)", pairs)
    # route the stage-1 hash through SIGNED BIGINT (what a realistic
    # oracle CTE column would carry) before seeding stage 2
    q = f"""
        WITH s1 AS (SELECT b, {to_signed(xxh64('a', 42))} AS h1 FROM _xxh_t2)
        SELECT {to_signed(xxh64('b', 'h1'))} AS h FROM s1
    """
    got = sorted(r[0] for r in duck.execute(q).fetchall())
    assert got == want
