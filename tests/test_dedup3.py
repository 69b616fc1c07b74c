"""Behavior tests for segment-level dedup and the bloom primitive.

The registered queries are value-checked against DuckDB in
test_queries_oracle; these tests pin the properties the oracle can't
express — bloom no-false-negatives / bounded false positives, and the
line-level pass's edge semantics on planted corpora.
"""

import pyspark.sql.functions as F
import pytest

from orca_spark.operators.dedup3 import (
    SEG_DOC_FREQ,
    bloom_build,
    bloom_might_contain,
    dedup_line_level,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bloom_frames(spark):
    keys = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    bloom = bloom_build(keys, "k")
    probes = spark.range(0, 20000).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        (F.col("id") < 500).alias("is_member"),
    )
    hits = (
        probes.join(F.broadcast(bloom))
        .select("is_member", bloom_might_contain("bloom", "k").alias("hit"))
        .groupBy("is_member")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("hit").cast("long")).alias("n_hit"),
        )
        .collect()
    )
    return {r.is_member: (r.n, r.n_hit) for r in hits}


def test_bloom_no_false_negatives(bloom_frames):
    n, n_hit = bloom_frames[True]
    assert n == 500
    # every inserted key MUST probe positive — blooms cannot drop members
    assert n_hit == 500


def test_bloom_false_positive_rate_bounded(bloom_frames):
    n, n_hit = bloom_frames[False]
    assert n == 19500
    # theory: (1 - e^(-4*500/65536))^4 ≈ 8e-7 at this fill; allow slack
    # of orders of magnitude and still catch a broken probe (which reads
    # ~ (1/2)^4 = 6%+ when bits land wrong, or 100% when always-true)
    assert n_hit / n < 0.01


def test_line_level_removes_planted_boilerplate(spark, tmp_path):
    # 6 docs share an identical 3-token banner; each also has unique text
    banner = "cookie policy accepted"
    rows = [
        (i, banner + f" unique{i}a unique{i}b unique{i}c") for i in range(6)
    ] + [(99, "entirely unique document text here now")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in dedup_line_level(spark, str(tmp_path)).collect()
    }
    assert SEG_DOC_FREQ <= 6
    for i in range(6):
        assert out[i].n_removed == 1
        assert out[i].clean_text == f"unique{i}a unique{i}b unique{i}c"
    assert out[99].n_removed == 0
    assert out[99].clean_text == "entirely unique document text here now"


def test_line_level_doc_entirely_boilerplate_survives_empty(spark, tmp_path):
    # a doc that is ONLY the banner keeps its row with empty clean_text
    banner = "all rights reserved"
    rows = [(i, banner) for i in range(SEG_DOC_FREQ)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = dedup_line_level(spark, str(tmp_path)).collect()
    assert len(out) == SEG_DOC_FREQ
    for r in out:
        assert r.clean_text == ""
        assert r.n_segments == 1
        assert r.n_removed == 1


def test_line_level_total_on_driver_corpus(spark):
    # every input doc appears exactly once in the output
    from orca_spark.tables import load

    n_docs = load(spark, SF_DIR, "documents").count()
    out = dedup_line_level(spark, SF_DIR)
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_incremental_minhash_finds_cross_batch_dup(spark, tmp_path):
    """A new-batch doc near-duplicating a history doc must be found by
    probing the persisted index; unique new docs must not match."""
    from orca_spark.operators.dedup3 import dedup_minhash_incremental

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        # history (even ids)
        (0, base),
        (2, "completely different historic content one two three four five six seven"),
        (4, "another unrelated historical document with its own tokens here now"),
        # new batch (odd ids): 1 near-dups history doc 0; 3 and 5 are unique
        (1, base.replace("kappa", "kappa2")),
        (3, "fresh unseen text with novel vocabulary entirely distinct words"),
        (5, "yet another brand new document sharing nothing with history at all"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = dedup_minhash_incremental(spark, str(tmp_path)).collect()
    pairs = {(r.new_doc, r.hist_doc) for r in out}
    assert (1, 0) in pairs, pairs
    matched_new = {r.new_doc for r in out}
    assert 3 not in matched_new and 5 not in matched_new
    for r in out:
        assert r.jaccard >= 0.7
