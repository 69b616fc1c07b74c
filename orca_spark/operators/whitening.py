"""Embedding whitening (ZCA): the two-tier train/apply pattern.

Embedding sets from one encoder are notoriously anisotropic — a few
directions carry most variance, which skews cosine similarity and
IVF/PQ quantizers alike. Whitening fixes it: transform vectors so the
corpus covariance becomes the identity.

The implementation is the canonical 100 TB split the engine uses for
every trained model (k-means, PQ codebooks):

1. **Distributed accumulation, model-sized result**: the mean vector
   and second-moment matrix are ONE aggregation pass — d sums and
   d·(d+1)/2 pair sums (posexplode self-join per row stays JVM-side) —
   whose output is d×d, independent of corpus size.
2. **Driver-side math on the model**: eigendecomposition of the d×d
   covariance in numpy (64×64 — microseconds; this is model
   arithmetic, not data movement).
3. **Broadcast apply**: the whitening matrix returns to the cluster
   inside a vectorized Arrow kernel's closure — one BLAS gemm per
   batch over the corpus scan, plan size independent of d.

No SQL oracle (eigendecomposition has no DuckDB twin); the gate is
behavioral: whitened covariance ≈ I on an anisotropic planted corpus,
determinism, and mean-centering (tests/test_text9_graph.py).

Reference parity: the reference (core.clj) has no vector surface.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves signature hints via module globals

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.similarity import _DIM, load_embeddings
from orca_spark.registry import register

_EPS = 1e-6  # eigenvalue floor: degenerate directions are damped, not 1/0


def covariance_agg(emb: DataFrame, dim: int = _DIM) -> DataFrame:
    """The moment-accumulation plan pre-collect: d·(d+1)/2 rows of
    (i, j, sxy, sx, cnt). Split out so test_plans can assert the plan
    is join-free (the r06 version self-joined the n·d exploded stream;
    the pairs are row-local, so a join never belonged in the plan)."""
    pairs = (
        emb.select(F.posexplode("e").alias("i", "x"), "e")
        .select(
            "i",
            "x",
            F.posexplode(
                F.slice("e", F.col("i") + F.lit(1), F.lit(dim) - F.col("i"))
            ).alias("jo", "y"),
        )
        .select("i", (F.col("i") + F.col("jo")).alias("j"), "x", "y")
    )
    return pairs.groupBy("i", "j").agg(
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.when(F.col("i") == F.col("j"), F.col("x"))).alias("sx"),
        F.count(
            F.when((F.col("i") == 0) & (F.col("j") == 0), F.lit(1))
        ).alias("cnt"),
    )


def covariance_stats(emb: DataFrame, dim: int = _DIM):
    """ONE job -> (n, mean[d], cov[d][d]) as plain Python (model-sized).

    The (i, j <= i+jo) second moments are generated ROW-LOCALLY from
    the intact array — posexplode gives (i, x), then a second generator
    over slice(e, i+1, d-i) yields every y = e[j] with j >= i — so no
    join (and no n·d-row shuffle) ever happens. The single groupBy
    (i, j) aggregation also carries the first moments (sum of x on the
    diagonal keys, where each row contributes x exactly once) and the
    row count (count on the (0, 0) key), fusing what used to be three
    jobs into one map-side-combined pass whose shuffle is d·(d+1)/2
    partial-sum rows per partition, never data rows."""
    import numpy as np

    rows = covariance_agg(emb, dim).collect()
    n = sum(int(r.cnt) for r in rows)
    mean = np.zeros(dim)
    for r in rows:
        if int(r.i) == int(r.j):
            mean[int(r.i)] = float(r.sx) / n
    cov = np.zeros((dim, dim))
    for r in rows:
        i, j = int(r.i), int(r.j)
        c = float(r.sxy) / n - mean[i] * mean[j]
        cov[i][j] = c
        cov[j][i] = c
    return n, mean, cov


def whitening_matrix(cov, eps: float = _EPS):
    """ZCA whitening matrix W = E diag(1/sqrt(l+eps)) E^T (symmetric,
    so whitened vectors stay maximally close to the originals)."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)
    return (vecs * (1.0 / np.sqrt(np.maximum(vals, 0.0) + eps))) @ vecs.T


@register(
    "embedding_whitening",
    description="ZCA whitening: one distributed pass accumulates the "
    "d x d covariance (model-sized shuffle), numpy eigendecomposition "
    "runs driver-side on the 64x64 model, and the whitening matrix "
    "broadcasts back as literals in a single projection — the "
    "train-on-aggregates/apply-broadcast pattern; gated behaviorally "
    "(whitened covariance ~ identity on an anisotropic corpus); the "
    "registered surface posexplodes to scalar (vec_id, i, w_i) rows "
    "so the driver's pandas canonicalizer can sort it (array columns "
    "are unhashable there — the r06 red-row lesson)",
)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    return (
        whiten(emb)
        .select("vec_id", F.posexplode("w").alias("i", "w_i"))
        .select("vec_id", "i", F.round("w_i", 4).alias("w_i"))
    )


def whiten(emb: DataFrame, dim: int = _DIM) -> DataFrame:
    """(vec_id, e) -> (vec_id, w) with w = W (e - mean), W from ZCA.

    The apply step is a vectorized Arrow kernel, not a literal
    projection: W and mean travel to executors inside the UDF closure
    (model-sized broadcast) and each Arrow batch pays ONE BLAS gemm.
    The r06 version assembled w as a d^2-term SQL array expression —
    fine standalone, but plan size grew as d^2 (already past janino's
    64 KB codegen limit at d=64 once a generator on top duplicated the
    expression into its output filter, forcing interpreted fallback),
    and at d=1024 the expression tree itself would be untenable. The
    kernel's plan cost is d-independent."""
    import numpy as np

    _, mean, cov = covariance_stats(emb, dim)
    W = whitening_matrix(cov)

    @F.pandas_udf("array<double>")
    def _apply(es: pd.Series) -> pd.Series:
        X = np.stack(es.to_numpy())  # batch x d, float64
        Y = (X - mean) @ W.T  # one gemm per Arrow batch
        return pd.Series(Y.tolist())

    return emb.select("vec_id", _apply("e").alias("w"))
