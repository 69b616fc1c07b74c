"""Adversarial embeddings corpus: NULL vectors must be EXCLUDED (a
vectorization gap cannot abort a corpus-wide job), wrong-width vectors
must RAISE through the dot() width guards with a readable message
(silently-wrong similarity is worse than a loud failure)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_spark.queries import queries

_DIM = 64


def _write(dirpath, rows):
    ids, vecs, labels = zip(*rows)
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(dirpath), "embeddings.parquet"))
    return str(dirpath)


@pytest.fixture(scope="module")
def null_vec_dir(tmp_path_factory):
    rows = [(i, [0.01 * (i + j) for j in range(_DIM)], "a") for i in range(20)]
    rows[3] = (3, None, "a")          # vectorization gap
    rows[7] = (7, None, "b")
    return _write(tmp_path_factory.mktemp("nullvec_sf"), rows)


@pytest.fixture(scope="module")
def bad_width_dir(tmp_path_factory):
    rows = [(i, [0.01 * (i + j) for j in range(_DIM)], "a") for i in range(20)]
    rows[5] = (5, [1.0, 2.0, 3.0], "a")  # wrong-width vector
    return _write(tmp_path_factory.mktemp("badwidth_sf"), rows)


@pytest.mark.parametrize(
    "name",
    ["similarity_norms", "embedding_near_dup_pairs", "embedding_label_centroids",
     "similarity_brute_topk", "embedding_near_dup_pairs_ivf", "similarity_pq_topk",
     "similarity_ivf_topk", "similarity_lsh_topk",
     "embeddings_kmeans_distributed", "contrastive_hard_negatives"],
)
def test_null_embeddings_are_excluded_not_fatal(spark, null_vec_dir, name):
    df = queries()[name](spark, null_vec_dir)
    rows = df.collect()  # must not raise
    if name == "similarity_norms":
        assert {r.vec_id for r in rows} == set(range(20)) - {3, 7}


@pytest.mark.parametrize(
    "name",
    ["embedding_near_dup_pairs", "similarity_lsh_topk",
     "embeddings_kmeans_distributed", "contrastive_hard_negatives"],
)
def test_wrong_width_embedding_raises_loudly(spark, bad_width_dir, name):
    with pytest.raises(Exception, match="expected array width 64"):
        queries()[name](spark, bad_width_dir).collect()
