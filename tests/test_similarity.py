"""Behavioral tests for similarity search: exactness of the brute-force
path on planted vectors, and a recall floor for the LSH scale path."""

import math
import random

import pytest
from pyspark.sql import functions as F

from orca_spark.operators.similarity import brute_topk_df, lsh_bucket, lsh_topk_df

DIM = 64


def _vec(rng):
    return [rng.gauss(0.0, 1.0) for _ in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(123)
    rows = [(i, _vec(rng)) for i in range(100)]
    # plant: vec 50 is an exact copy of vec 0; vec 51 a tiny perturbation
    rows[50] = (50, rows[0][1])
    rows[51] = (51, [x + 0.01 for x in rows[0][1]])
    return spark.createDataFrame(rows, "vec_id long, e array<double>")


def test_brute_topk_finds_planted_duplicate(emb):
    q = emb.where(F.col("vec_id") == 0)
    top = brute_topk_df(emb, q, k=3).orderBy("rank").collect()
    assert top[0].neighbor_id == 50 and top[0].cosine == 1.0
    assert top[1].neighbor_id == 51 and top[1].cosine > 0.999


def test_lsh_bucket_deterministic_and_colocates_duplicates(emb):
    b = emb.select("vec_id", lsh_bucket(F.col("e")).alias("bucket")).collect()
    buckets = {r.vec_id: r.bucket for r in b}
    assert buckets[0] == buckets[50]  # identical vectors share a bucket
    b2 = {r.vec_id: r.bucket for r in
          emb.select("vec_id", lsh_bucket(F.col("e")).alias("bucket")).collect()}
    assert buckets == b2  # fixed hyperplanes → stable bucketing


def test_ivf_topk_finds_planted_duplicate(emb):
    from orca_spark.operators.similarity import ivf_topk_df

    q = emb.where(F.col("vec_id") == 0)
    top = ivf_topk_df(emb, q, k=3, nprobe=2).orderBy("rank").collect()
    # identical vector maps to the identical nearest centroid → always found
    assert top[0].neighbor_id == 50 and top[0].cosine == 1.0
    brute = {r.neighbor_id: r.cosine for r in brute_topk_df(emb, q, k=100).collect()}
    for r in top:  # scores within probed clusters must match brute force
        assert math.isclose(brute[r.neighbor_id], r.cosine, abs_tol=1e-9)


def test_lsh_topk_exact_within_bucket(emb):
    """The LSH path must return exactly the brute-force ranking restricted
    to the query's bucket — approximation comes only from bucketing."""
    q = emb.where(F.col("vec_id") == 0)
    lsh = lsh_topk_df(emb, q, k=5).orderBy("rank").collect()
    # planted exact duplicate is in the same bucket, so it must be rank 1
    assert lsh[0].neighbor_id == 50 and lsh[0].cosine == 1.0
    brute = {r.neighbor_id: r.cosine for r in brute_topk_df(emb, q, k=100).collect()}
    for r in lsh:
        assert math.isclose(brute[r.neighbor_id], r.cosine, abs_tol=1e-9)
