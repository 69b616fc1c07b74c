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


# every embeddings-only query (derived ground truth:
# test_emb_queries_list_is_complete) — totality over the degenerate
# corpus below. The oracled members also run the value-level compare
# against the full-schema nasty corpus (tests/test_adversarial_full.py);
# THIS lane exists for the non-oracled similarity/ANN/clustering family,
# which had no degenerate-input coverage at all before r08.
_EMB_QUERIES = [
    "array_functions_showcase",
    "contrastive_hard_negatives",
    "embedding_adjacent_cosine_profile",
    "embedding_corpus_diversity",
    "embedding_dim_truncation_fidelity",
    "embedding_dimension_profile",
    "embedding_dimension_stats",
    "embedding_label_centroids",
    "embedding_label_outliers",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_gram",
    "embedding_near_dup_pairs_ivf",
    "embedding_quantile_normalized",
    "embedding_whitening",
    "embeddings_kmeans_distributed",
    "embeddings_kmeans_vs_sampled",
    "similarity_brute_topk",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "similarity_norms",
    "similarity_pq_topk",
    # r11: int8 scalar quantization — the degenerate magnitudes are the
    # interesting inputs (1e6 and denormal vectors both quantize to the
    # all-127 code; load_embeddings excludes the zero-norm one before
    # the divide)
    "similarity_sq8_topk",
    # r11 batch 4: the SQ8-vs-brute recall audit — on the degenerate
    # fixture both sides exclude the same pathological vectors, so the
    # audit must still emit one row per surviving query
    "similarity_sq8_recall_audit",
    # r12: the persisted SQ8+SRP index probe — the degenerate corpus
    # exercises the build half (pathological vectors must quantize or
    # be excluded exactly as in similarity_sq8_topk) and the banded
    # probe half on the odd/even split of what survives
    "similarity_sq8_incremental",
]


@pytest.fixture(scope="module")
def degenerate_vec_dir(tmp_path_factory):
    """Valid-width but numerically nasty vectors: an all-zero vector
    (cosine denominator 0), a 1e6-magnitude vector (norm² ≈ 6.4e13), a
    denormal-scale vector, an exact duplicate pair, and a NULL label —
    the contents a real embedding column accumulates from upstream
    model bugs."""
    rows = [(i, [0.01 * (i + j) for j in range(_DIM)], "a") for i in range(40)]
    rows[10] = (10, [0.0] * _DIM, "a")            # zero norm
    rows[11] = (11, [1.0e6] * _DIM, "b")          # huge magnitude
    rows[12] = (12, [1.0e-30] * _DIM, "b")        # denormal scale
    rows[13] = (13, rows[20][1], "a")             # exact duplicate of 20
    rows[14] = (14, rows[14][1], None)            # NULL label
    return _write(tmp_path_factory.mktemp("degenvec_sf"), rows)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_query_total_over_degenerate_embeddings(spark, degenerate_vec_dir, name):
    """Zero-norm / extreme-magnitude vectors must not abort any
    embeddings query (NaN or exclusion are both acceptable; a crash or
    an ANSI abort is not). collect(), NOT count(): count() would let
    Catalyst prune the projected similarity/norm expressions this lane
    exists to crash-test, and this non-oracled family has no
    value-compare lane backing it up."""
    rows = queries()[name](spark, degenerate_vec_dir).collect()
    assert len(rows) >= 0  # must not raise


def test_emb_queries_list_is_complete(table_usage):
    """Derived completeness contract, same as the documents and events
    harnesses: every embeddings-only query must be in _EMB_QUERIES."""
    emb_only = {n for n, t in table_usage.items() if t == {"embeddings"}}
    missing = sorted(emb_only - set(_EMB_QUERIES))
    assert not missing, (
        f"embeddings-only queries absent from _EMB_QUERIES (add them so "
        f"the degenerate-embeddings totality lane covers them): {missing}"
    )
