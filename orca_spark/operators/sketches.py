"""Count–min-sketch heavy hitters over the event stream.

Completes the engine's mergeable-sketch family (HLL distinct counts and
KLL-style quantiles in ``profile2``, bloom pruning in ``dedup3``): the
CMS answers point-frequency queries with one-sided error — estimates
never undercount, and overcount by at most ``eps·N`` with probability
``confidence`` — from a fixed-size counter table that merges by plain
addition. That makes it the standard distributed heavy-hitter shape:

* one partial-aggregated pass builds per-partition sketches that the
  aggregate merges into a single ``depth×width`` table (KiBs, corpus
  size independent);
* a cheap exact top-k pass supplies the CANDIDATE set (bounded, so its
  TakeOrdered is driver-safe);
* the sketch then serves point estimates for candidates — or, in the
  production setting, for keys arriving LATER without re-scanning the
  corpus (the sketch persists; the corpus need not).

Estimates use Spark's own ``CountMinSketch.readFrom`` (the public
sketch API the SQL aggregate serializes for) rather than a hand-rolled
parser of the binary layout — the format is owned by Spark.

Determinism: the sketch is seeded, hashing is fixed, and merging sums
integer counters (commutative/associative), so estimates are exactly
reproducible across runs and partitionings — unlike HLL, whose
register-merge interplay is engine-specific. There is still no DuckDB
oracle (DuckDB has no CMS); correctness is the one-sided-error bound
asserted in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_EPS = 0.001     # overcount bound: eps * total_count
_CONF = 0.99     # probability the bound holds per query
_SEED = 42
_TOP_K = 20


def _read_cms(spark: SparkSession, sk_bytes: bytes):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(sk_bytes)


def heavy_hitters_cms_df(
    spark: SparkSession, ev: DataFrame, key: str, k: int = _TOP_K
) -> DataFrame:
    """Top-k keys by exact count, with the CMS point estimate and the
    one-sided error margin alongside — the estimate-vs-truth readout a
    sketch deployment monitors.

    ``key`` may be an integral or string column: CMS hashes the two
    differently (long path vs UTF-8 bytes), so the point query must
    present the SAME Java type the aggregate sketched — the estimate
    call below branches on the column's Spark type to guarantee it."""
    from pyspark.sql.types import StringType

    keyed = ev.where(F.col(key).isNotNull())
    key_is_str = isinstance(keyed.schema[key].dataType, StringType)
    sk_row = keyed.agg(
        F.count_min_sketch(key, F.lit(_EPS), F.lit(_CONF), F.lit(_SEED)).alias("sk"),
        F.count(F.lit(1)).alias("total"),
    ).collect()[0]
    cms = _read_cms(spark, bytes(sk_row["sk"]))
    total = int(sk_row["total"])

    # candidate set: exact top-k (TakeOrdered — bounded driver result)
    cands = (
        keyed.groupBy(key)
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col(key))
        .limit(k)
        .collect()
    )
    def _est(v):
        return int(cms.estimateCount(str(v) if key_is_str else int(v)))

    rows = [
        (str(r[key]) if key_is_str else int(r[key]), int(r["exact_n"]), _est(r[key]))
        for r in cands
    ]
    out = spark.createDataFrame(
        rows, f"{key} {'string' if key_is_str else 'long'}, exact_n long, cms_n long"
    )
    return out.select(
        key,
        "exact_n",
        "cms_n",
        (F.col("cms_n") >= F.col("exact_n")).alias("no_undercount"),
        F.lit(int(_EPS * total) + 1).alias("eps_margin"),
    )


@register(
    "events_heavy_hitters_cms",
    oracle=None,  # DuckDB has no count-min sketch; the one-sided error
    # contract (never undercounts, overcount <= eps*N w.p. confidence)
    # and merge-exactness are asserted in tests/test_approx.py
    description=f"count-min-sketch heavy hitters: one partial-agged "
    f"pass merges per-partition CMS tables (eps={_EPS}, "
    f"confidence={_CONF}, seeded), exact top-{_TOP_K} candidates get "
    "sketch point estimates with the one-sided error margin — the "
    "mergeable-sketch answer to point-frequency queries at stream scale",
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the sketch aggregate shuffles fixed-size counter tables
    (depth×width longs, set by eps/confidence — independent of corpus
    size); the candidate pass is the engine's standard partial-agg +
    TakeOrdered top-k. At 100 TB the sketch is built once per window
    and PERSISTED — later point queries cost zero scans; the exact
    candidate pass here exists to expose estimate-vs-truth, not because
    the sketch needs it."""
    return heavy_hitters_cms_df(spark, load(spark, sf_dir, "events"), "user_id")
