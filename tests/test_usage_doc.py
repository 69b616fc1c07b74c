"""USAGE.md's centerpiece example must actually run — executable docs.

Extracts the first ```python block (setup) is trivial; the contract
here is the hand-composed corpus pipeline: same operators, same
thresholds as the document shows."""

from pyspark.sql import functions as F

from orca_spark.operators.dedup import connected_components, minhash_near_dup_pairs
from orca_spark.tables import load
from tests.conftest import SF_DIR


def test_usage_count_matches_registry():
    """USAGE.md's 'N at this writing' was stale by 24 in round 7 —
    gen_inventory.py now rewrites it; this pins the drift."""
    from orca_spark.queries import queries
    from orca_spark.registry import REGISTRY

    queries()  # populate
    with open("USAGE.md") as f:
        usage = f.read()
    assert f"{len(REGISTRY)} at this writing" in usage, len(REGISTRY)


def test_usage_centerpiece_runs(spark):
    docs = load(spark, SF_DIR, "documents").where("text IS NOT NULL")
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    sig = docs.select(
        "*",
        F.size(toks).alias("n_tokens"),
        (1 - F.size(F.array_distinct(toks)) / F.size(toks)).alias("dup_frac"),
    )
    kept = sig.where("n_tokens BETWEEN 20 AND 10000 AND dup_frac <= 0.85")
    pairs = minhash_near_dup_pairs(kept, threshold=0.9)
    comps = connected_components(
        kept.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    survivor = comps.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    deduped = kept.join(survivor.select("doc_id"), "doc_id", "left_semi")
    out = deduped.withColumn(
        "split",
        F.when(F.substring(F.md5("text"), 1, 1) < "c", "train")
        .when(F.substring(F.md5("text"), 1, 1) < "e", "val")
        .otherwise("test"),
    )
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) <= kept.count()  # dedup only removes
    assert counts["train"] > counts["val"]  # 12/16 vs 2/16 hash mass
