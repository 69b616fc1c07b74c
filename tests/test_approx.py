"""Approximate aggregates: the 100 TB substitutes for exact distinct /
percentile. No SQL oracle (engine-specific sketches) — instead assert
error bounds against the exact answers.

Bounds are validated at BOTH test scales — sf0.001 and the driver's
sf0.01 — so the sketch accuracy claims hold at the scale the
CORRECTNESS gate actually runs."""

import pytest
from pyspark.sql import functions as F

from orca_spark.tables import load
from tests.conftest import SF_DIR, SF_DIR_ORACLE

_SCALES = [SF_DIR, SF_DIR_ORACLE]


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_profile_lineitem_approx_accuracy(spark, sf_dir):
    """The registered sketch profile must track the exact profile within
    the sketches' advertised error (HLL rsd=0.01 → assert 5%; quantile
    accuracy=10000 → assert 1% value error on this distribution)."""
    from orca_spark.operators.profile2 import profile_lineitem_approx

    got = profile_lineitem_approx(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("l_orderkey").alias("orderkeys"),
        F.countDistinct("l_partkey").alias("partkeys"),
        F.countDistinct("l_suppkey").alias("suppkeys"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("price_p50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("price_p95"),
        F.percentile("l_quantity", F.lit(0.5)).alias("qty_p50"),
    ).collect()[0]
    assert got.rows == exact.rows
    for a, e in [
        (got.orderkeys_approx, exact.orderkeys),
        (got.partkeys_approx, exact.partkeys),
        (got.suppkeys_approx, exact.suppkeys),
    ]:
        assert abs(a - e) / e < 0.05, (a, e)
    for a, e in [
        (got.price_p50, exact.price_p50),
        (got.price_p95, exact.price_p95),
        (got.qty_p50, exact.qty_p50),
    ]:
        assert abs(a - e) / e < 0.01, (a, e)


def test_sketch_union_matches_exact_distincts(spark):
    """Persisted per-source sketches and their union estimate the exact
    per-source / global distinct text-hash counts within HLL error."""
    from pyspark.sql import functions as F

    from orca_spark.operators.profile2 import profile_sketch_persist_union
    from orca_spark.tables import load
    from tests.conftest import SF_DIR

    got = {
        r.source: r.distinct_est
        for r in profile_sketch_persist_union(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents")
    exact_global = docs.select(F.md5("text")).distinct().count()
    exact_src = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    assert abs(got["ALL"] - exact_global) / exact_global < 0.05
    for s, n in exact_src.items():
        assert abs(got[s] - n) / n < 0.05, (s, got[s], n)
    # the union row must cover every per-source sketch
    assert got["ALL"] >= max(v for k, v in got.items() if k != "ALL")


@pytest.mark.parametrize("sf_dir", _SCALES)
def test_cms_one_sided_error_all_keys(spark, sf_dir):
    """CMS contract over EVERY key (not just the top-k readout): never
    undercounts, and overcounts within eps*N for all keys here (the
    probabilistic bound is per-query at confidence 0.99; a blanket
    violation would mean a broken sketch, not bad luck)."""
    from orca_spark.operators.sketches import _CONF, _EPS, _SEED, _read_cms
    from orca_spark.tables import load

    ev = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sk_row = ev.agg(
        F.count_min_sketch(
            "user_id", F.lit(_EPS), F.lit(_CONF), F.lit(_SEED)
        ).alias("sk"),
        F.count(F.lit(1)).alias("total"),
    ).collect()[0]
    cms = _read_cms(spark, bytes(sk_row["sk"]))
    exact = {
        int(r.user_id): r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    margin = int(_EPS * sk_row["total"]) + 1
    violations = [
        (k, n, int(cms.estimateCount(k)))
        for k, n in exact.items()
        if not (n <= cms.estimateCount(k) <= n + margin)
    ]
    assert not violations, violations[:5]


def test_cms_merge_is_exact(spark):
    """Merging per-group partial sketches must equal the one-shot global
    sketch on every estimate — CMS merge is integer counter addition,
    so this is exact equality, not a tolerance check."""
    from orca_spark.operators.sketches import _CONF, _EPS, _SEED, _read_cms
    from orca_spark.tables import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events").where(F.col("user_id").isNotNull())
    args = (F.lit(_EPS), F.lit(_CONF), F.lit(_SEED))
    parts = ev.groupBy("event_type").agg(
        F.count_min_sketch("user_id", *args).alias("sk")
    ).collect()
    merged = _read_cms(spark, bytes(parts[0]["sk"]))
    for r in parts[1:]:
        merged.mergeInPlace(_read_cms(spark, bytes(r["sk"])))
    one_shot = _read_cms(
        spark,
        bytes(ev.agg(F.count_min_sketch("user_id", *args).alias("sk")).collect()[0]["sk"]),
    )
    keys = [int(r.user_id) for r in ev.select("user_id").distinct().collect()]
    assert all(
        merged.estimateCount(k) == one_shot.estimateCount(k) for k in keys
    )
    assert merged.totalCount() == one_shot.totalCount()


def test_cms_string_key_path(spark):
    """String keys hash through the CMS byte path, not the long path —
    the estimate call must present the same Java type the aggregate
    sketched. event_type exercises it end-to-end."""
    from orca_spark.operators.sketches import heavy_hitters_cms_df
    from orca_spark.tables import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events")
    rows = heavy_hitters_cms_df(spark, ev, "event_type", k=5).collect()
    assert rows and all(r.no_undercount for r in rows)
    exact = {
        r.event_type: r.n
        for r in ev.where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.exact_n == exact[r.event_type]
        assert r.exact_n <= r.cms_n <= r.exact_n + r.eps_margin


def test_cms_hash_replica_matches_spark_sketch(spark):
    """The r12 value oracle re-derives CountMinSketchImpl's long-key
    hash from first principles; pin both layers of the replica against
    the real JVM sketch:

    (1) the seeded multipliers, read OUT OF a real serialized sketch
        (version int, totalCount long, depth int, width int,
        hashA[depth] longs, ... — big-endian). This is the check that
        would have caught the first-draft replica, which assumed
        ``nextLong()`` seeding where the real impl draws
        ``nextInt(2^31-1)``: a collision-free toy sweep cannot
        distinguish hash functions, so the pin MUST compare hashA
        itself;
    (2) end-to-end estimateCount over a COLLISION-DENSE key set (more
        keys than sketch width, plus negative / >2^32 outliers), where
        a wrong hash shifts some min over collided cells.
    """
    import struct

    from orca_spark.operators.sketches import (
        _CMS_DEPTH,
        _CMS_HASH_A,
        _CMS_WIDTH,
        _SEED,
        _jrandom_ints,
    )

    assert _jrandom_ints(_SEED, _CMS_DEPTH) == _CMS_HASH_A

    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.create(
        0.001, 0.99, _SEED
    )
    assert cms.depth() == _CMS_DEPTH and cms.width() == _CMS_WIDTH

    items = list(range(3 * _CMS_WIDTH)) + [-5, -5, 2**40 + 3, -(2**62), 0]
    for it in items:
        cms.addLong(it)

    hdr = struct.unpack_from(">iqii", bytes(cms.toByteArray()), 0)
    assert hdr == (1, len(items), _CMS_DEPTH, _CMS_WIDTH)
    stored_hash_a = struct.unpack_from(
        f">{_CMS_DEPTH}q", bytes(cms.toByteArray()), 20
    )
    assert list(stored_hash_a) == _CMS_HASH_A

    m64 = (1 << 64) - 1

    def cell(item, i):
        x = (_CMS_HASH_A[i] * item) & m64
        xs = x - (1 << 64) if x >= (1 << 63) else x
        t = (xs + (xs >> 32)) & m64
        return (t & 0x7FFFFFFF) % _CMS_WIDTH

    table = [{} for _ in range(_CMS_DEPTH)]
    for it in items:
        for i in range(_CMS_DEPTH):
            c = cell(it, i)
            table[i][c] = table[i].get(c, 0) + 1
    mismatches = 0
    for probe in items + [99999999, -1, 2**55]:
        expected = min(
            table[i].get(cell(probe, i), 0) for i in range(_CMS_DEPTH)
        )
        assert cms.estimateCount(probe) == expected, probe
        mismatches += expected > items.count(probe)
    # the sweep must actually have exercised collisions to mean anything
    assert mismatches > 0, "collision-free sweep cannot pin the hash"
