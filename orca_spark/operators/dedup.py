"""Deduplication operators: exact, MinHash+LSH, SimHash, exact Jaccard.

Scale design (the point of this module):

* **exact**: group on a 64-bit content hash (``xxhash64``), never on the
  raw text — at 100 TB the shuffle moves 8-byte keys, not documents.
* **MinHash+LSH**: shingle → k min-hashes → band buckets → candidate
  pairs only within buckets → exact-Jaccard verification of candidates.
  Work is O(candidates), not O(n²); band count/width tune the
  recall/cost curve. All stages are DataFrame ops (explode / groupBy /
  self-join) — no Python in the loop.
* **SimHash**: 64-bit signature via per-bit majority vote over token
  hashes; near-dups differ in few bits. Signature build is one
  explode + one groupBy.
* **exact Jaccard** (the oracle-checkable baseline): token-set
  self-join; quadratic in the worst case — the MinHash path is the
  one that scales, this one verifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

# deterministic MinHash parameters (fixed seed, same every run).
# p = 2^31-1 keeps a*x + b < 2^62 — no int64 overflow under ANSI mode.
import random as _random

_MERSENNE = (1 << 31) - 1
_K = 64            # signature length
_BANDS = 16        # LSH bands (rows per band = _K // _BANDS = 4)
_rng = _random.Random(42)
_A = [_rng.randrange(1, _MERSENNE) for _ in range(_K)]
_B = [_rng.randrange(0, _MERSENNE) for _ in range(_K)]


@register(
    "dedup_exact",
    oracle="""
        SELECT min(doc_id) AS keep_doc_id,
               count(*)    AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    description="exact dedup: group by content hash, keep lowest doc_id; "
    "Spark side groups on xxhash64 (8-byte shuffle keys at scale)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # 64-bit grouping key: the shuffle carries hashes, not documents.
    # (collision probability at 100 TB doc counts ~ n²/2⁶⁵ — for a
    # guaranteed-exact variant group by (xxhash64, length).)
    return (
        d.groupBy(F.xxhash64("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


@register(
    "dedup_exact_survivors",
    oracle="""
        SELECT doc_id, lang, source
        FROM (
            SELECT doc_id, lang, source,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn = 1
    """,
    description="exact dedup keeping full surviving rows (window rank on "
    "content hash)",
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


_last_persisted: list = []


def _persist_scoped(df: DataFrame) -> DataFrame:
    """Persist df, releasing whatever this module persisted previously —
    repeated query invocations in one session hold at most one cached
    shingle relation instead of leaking executor storage."""
    while _last_persisted:
        try:
            _last_persisted.pop().unpersist()
        except Exception:
            pass
    df = df.persist()
    _last_persisted.append(df)
    return df


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → exploded distinct token n-gram shingle hashes (i64).

    Hashes each n-gram directly with multi-arg xxhash64 over the token
    slice — no intermediate concatenated strings (2-3× cheaper than
    string-building at 260k shingles/5k docs; at 100 TB this is the
    difference between hashing and allocating the corpus twice).

    Documents shorter than ``n`` tokens fall back to per-token hashes
    (a token-set signature), so ultra-short docs still participate in
    near-dup candidacy instead of silently dropping out.
    """
    toks = F.split(F.col("text"), " ")
    d = df.withColumn("_tk", toks)
    idx = F.sequence(F.lit(1), F.size(F.col("_tk")) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(F.col("_tk"), i + j) for j in range(n)]),
    )
    short = F.transform(F.col("_tk"), lambda t: F.xxhash64(t))
    picked = grams if n == 1 else F.when(F.size(F.col("_tk")) >= n, grams).otherwise(short)
    return d.select("doc_id", F.explode(F.array_distinct(picked)).alias("sh"))


def minhash_signatures(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → array<long> MinHash signature of length _K.

    One explode + one groupBy(doc_id) with K min-aggregates — a single
    shuffle keyed by doc_id regardless of K.
    """
    return _signatures_from_shingles(_shingles(df, n))


def _signatures_from_shingles(sh: DataFrame) -> DataFrame:
    x = F.pmod(F.col("sh"), F.lit(_MERSENNE))
    mins = [
        F.min(F.pmod(F.lit(_A[i]) * x + F.lit(_B[i]), F.lit(_MERSENNE))).alias(f"m{i}")
        for i in range(_K)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"m{i}" for i in range(_K)]).alias("sig"))


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket."""
    r = _K // _BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)])).alias("bucket"),
            )
            for b in range(_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dup_pairs(d: DataFrame, threshold: float = 0.7, n: int = 3) -> DataFrame:
    """MinHash+LSH near-dup pipeline over any (doc_id, text) DataFrame:
    candidates from band buckets, then exact shingle-Jaccard verification
    — work is O(candidates), never O(n²).

    The shingle relation feeds both the signature build and the
    verification join; persist it so the corpus is tokenized+hashed
    once, not three times (at 100 TB: one scan instead of three).
    """
    sh = _persist_scoped(_shingles(d, n))
    cand = lsh_candidate_pairs(_signatures_from_shingles(sh))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("i") / (F.col("za.sz") + F.col("zb.sz") - F.col("i"))).alias("jraw"),
        )
    )
    return (
        jac.where(F.col("jraw") >= threshold)
        .select("doc_a", "doc_b", F.round("jraw", 4).alias("jaccard"))
    )


@register(
    "dedup_minhash",
    oracle=None,  # LSH candidate generation is probabilistic-by-design;
    # recall vs the exact path is asserted in tests/test_dedup.py instead.
    description="near-dup detection at scale: MinHash(64) + LSH(16 bands) "
    "candidates, verified with exact shingle-Jaccard >= 0.7",
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs(load(spark, sf_dir, "documents"), threshold=0.7)


@register(
    "dedup_jaccard_exact",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(i / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i / (sa.sz + sb.sz - i) >= 0.9
    """,
    description="exact token-set Jaccard pairs (>= 0.9): the verifiable "
    "baseline the MinHash path approximates",
)
def dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jraw = F.col("i") / (F.col("za.sz") + F.col("zb.sz") - F.col("i"))
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .where(jraw >= 0.9)
        .select("doc_a", "doc_b", F.round(jraw, 4).alias("jaccard"))
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Cluster ids via iterative min-label propagation.

    ``nodes``: (doc_id); ``edges``: (doc_a, doc_b) undirected. Each
    round joins current labels across edges and keeps the minimum —
    labels converge to the component's minimum id in O(diameter)
    rounds (with an early-exit convergence check). Every round is one
    join + one aggregate; this is the dedup-clustering step that picks
    one canonical document per near-duplicate group.
    """
    # localCheckpoint (not persist): truncates the lineage each round so
    # the k-th iteration plans a 2-join query, not a 2k-join one — without
    # it, driver-side re-planning dominates past ~10 rounds.
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.withColumnRenamed("label", "old_label")
            .join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                "old_label",
                F.least(F.col("old_label"), F.coalesce("nmin", F.col("old_label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.where(F.col("label") != F.col("old_label")).count()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        # silently-wrong labels are worse than a loud failure: a component
        # with diameter > max_iter has not converged
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


@register(
    "dedup_connected_components",
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
                  FROM documents) a
            JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
                  FROM documents) b
              ON a.doc_id < b.doc_id
             AND len(list_intersect(a.s, b.s))
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
            UNION SELECT doc_id, doc_id FROM documents
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, min(dst) AS cluster_id
        FROM reach GROUP BY src
    """,
    description="near-dup clustering: connected components over the "
    ">=0.9 token-Jaccard pair graph via iterative min-label propagation "
    "(one join+agg per round, O(diameter) rounds). Edges come from the "
    "MinHash+LSH candidate path over token-level (n=1) shingles with "
    "exact-Jaccard verification — O(candidates), never O(n²); at j>=0.9 "
    "the 16-band LSH miss probability is (1-0.9^4)^16 ~= 4e-8, so the "
    "edge set equals the exact all-pairs one (asserted in tests). Oracle "
    "is a recursive-CTE transitive closure of the exact pair graph",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # n=1 shingles == distinct token hashes, so the verified Jaccard here
    # is exactly the oracle's token-set Jaccard — the LSH stage only
    # prunes candidates, it does not change the measure
    pairs = minhash_near_dup_pairs(d, threshold=0.9, n=1).select("doc_a", "doc_b")
    return connected_components(d.select("doc_id"), pairs)


def simhash_signatures(d: DataFrame) -> DataFrame:
    """64-bit SimHash per (doc_id, text) row via per-bit majority vote."""
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = F.xxhash64("w")
    # per-bit vote: +1 when bit set, -1 otherwise; sign of the sum is the bit
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(64)
    ]
    sigbits = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: XOR == OR == +
    return sigbits.select("doc_id", sim.alias("simhash"))


@register(
    "dedup_simhash",
    oracle=None,  # 64-bit xxhash64 majority-vote signature has no DuckDB
    # twin; determinism + hamming-neighbor behavior covered in tests.
    description="SimHash: 64-bit per-doc signature (majority vote over "
    "token hash bits); near-dups = small hamming distance",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signatures(load(spark, sf_dir, "documents"))
