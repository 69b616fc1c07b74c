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
   as literals inside one projection over the corpus scan.

No SQL oracle (eigendecomposition has no DuckDB twin); the gate is
behavioral: whitened covariance ≈ I on an anisotropic planted corpus,
determinism, and mean-centering (tests/test_text9_graph.py).

Reference parity: the reference (core.clj) has no vector surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.similarity import _DIM, load_embeddings
from orca_spark.registry import register

_EPS = 1e-6  # eigenvalue floor: degenerate directions are damped, not 1/0


def covariance_stats(emb: DataFrame, dim: int = _DIM):
    """One pass -> (n, mean[d], cov[d][d]) as plain Python (model-sized).

    The (i, j) second moments come from a doc-local pair expansion of
    the exploded coordinates (i <= j — the matrix is symmetric), each
    row contributing dim·(dim+1)/2 products; the aggregation is
    map-side combined on (i, j) keys, so the shuffle carries d² partial
    sums per partition, never rows."""
    import numpy as np

    flat = emb.select("vec_id", F.posexplode("e").alias("i", "x"))
    moments = (
        flat.alias("a")
        .join(
            flat.alias("b"),
            (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"))
        .collect()
    )
    sums = flat.groupBy("i").agg(F.sum("x").alias("sx")).collect()
    n = emb.count()
    mean = np.zeros(dim)
    for r in sums:
        mean[int(r.i)] = float(r.sx) / n
    cov = np.zeros((dim, dim))
    for r in moments:
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
    "(whitened covariance ~ identity on an anisotropic corpus)",
)
def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    return whiten(emb)


def whiten(emb: DataFrame, dim: int = _DIM) -> DataFrame:
    """(vec_id, e) -> (vec_id, w) with w = W (e - mean), W from ZCA."""
    _, mean, cov = covariance_stats(emb, dim)
    W = whitening_matrix(cov)
    # apply as ONE literal projection: w_k = sum_j W[k][j]*(e[j]-mu[j]);
    # assembled as a SQL string parsed JVM-side in one call (the
    # engine-wide wide-literal-expression convention — Column-object
    # assembly costs py4j round trips per node)
    terms = []
    for k in range(dim):
        # float(): numpy scalars repr as 'np.float64(...)' on numpy>=2,
        # which is not SQL
        expr = " + ".join(
            f"{float(W[k][j])!r} * (e[{j}] - {float(mean[j])!r})"
            for j in range(dim)
        )
        terms.append(f"({expr})")
    arr = "array(" + ", ".join(terms) + ")"
    return emb.select("vec_id", F.expr(arr).alias("w"))
