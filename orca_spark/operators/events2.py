"""Event-sequence and robust-statistics operators over the stream table.

* ``events_markov_transitions`` — first-order Markov transition matrix
  of per-user event-type sequences: the standard summary of behavioral
  flows (what follows what), and the input to next-event prediction
  baselines and anomaly scoring (improbable transitions).
* ``events_value_winsorized`` — per-type robust value statistics:
  clamp to the [p01, p99] span before averaging, the usual guard
  against heavy-tailed metrics poisoning a mean.
* ``orders_pareto_classes`` — ABC/Pareto classification of customers
  by cumulative revenue share (A ≲ 80%, B ≲ 95%, C the tail).
* ``events_value_histogram`` / ``events_value_deciles`` — equi-width
  and equal-frequency binning per event_type: the two standard
  discretizations for feature buckets and distribution dashboards.

All of these are pure built-in expressions (windows + aggregates),
fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_WINSOR_LO = 0.01
_WINSOR_HI = 0.99


@register(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id NULLS FIRST
                   ) AS prev_type
            FROM events WHERE ts IS NOT NULL
        ),
        pairs AS (
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
               round(n / sum(n) OVER (PARTITION BY prev_type), 4) AS prob
        FROM pairs
    """,
    description="first-order Markov transition matrix: per-user lag "
    "window (ordered by ts with event_id tiebreak for determinism) "
    "pairs each event with its predecessor, then one global "
    "(prev, next) count with row-normalized probabilities",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle for the per-user window (user_id-partitioned,
    bounded per-key state), one for the tiny (|types|² ≤ dozens)
    transition aggregate — which partial-aggregates map-side, so the
    second shuffle moves counts, not events. The normalizing window
    runs on the aggregated matrix, not the event stream."""
    # a NULL-ts event has no position in a sequence — excluded by
    # contract on BOTH engines (their NULL sort orders differ: Spark
    # NULLS FIRST asc, DuckDB NULLS LAST — leaving them in would make
    # the transition pairs engine-dependent)
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 4).alias("prob"),
    )


@register(
    "events_value_winsorized",
    oracle=f"""
        WITH cuts AS (
            SELECT event_type,
                   quantile_cont(value, {_WINSOR_LO}) AS lo,
                   quantile_cont(value, {_WINSOR_HI}) AS hi
            FROM events WHERE value IS NOT NULL GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(any_value(c.lo), 4) AS p01,
               round(any_value(c.hi), 4) AS p99,
               round(avg(e.value), 4) AS mean_raw,
               round(avg(least(greatest(e.value, c.lo), c.hi)), 4)
                   AS mean_winsorized
        FROM events e JOIN cuts c ON e.event_type = c.event_type
        WHERE e.value IS NOT NULL
        GROUP BY e.event_type
    """,
    description="winsorized per-type value statistics: exact "
    "interpolated p01/p99 cuts per event_type (percentile = DuckDB "
    "quantile_cont, both linear-interpolation), broadcast the tiny "
    "cuts table back, clamp, and compare raw vs robust means",
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the cuts aggregate is one shuffle on event_type (exact
    percentile needs the per-group sort; switch to approx_percentile
    when cardinality-per-group outgrows a partition), the cuts frame is
    |types| rows — broadcast back over the stream, so the clamp pass is
    shuffle-free map work plus one final partial-agged groupBy."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(_WINSOR_LO)).alias("lo"),
        F.percentile("value", F.lit(_WINSOR_HI)).alias("hi"),
    )
    clamped = ev.join(F.broadcast(cuts), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("lo"), 4).alias("p01"),
        F.round(F.first("hi"), 4).alias("p99"),
        F.round(F.avg("value"), 4).alias("mean_raw"),
        F.round(F.avg("wv"), 4).alias("mean_winsorized"),
    )


@register(
    "orders_pareto_classes",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   sum(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, revenue,
                   round(CAST(sum(revenue) OVER (
                             ORDER BY revenue DESC, o_custkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW
                         ) AS DOUBLE)
                         / CAST(sum(revenue) OVER () AS DOUBLE),
                         4) AS cum_share
            FROM rev
        )
        SELECT o_custkey, CAST(round(revenue, 2) AS DOUBLE) AS revenue,
               cum_share,
               CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    """,
    description="ABC/Pareto revenue classes: decimal-exact per-customer "
    "revenue, global cumulative-share window (revenue-desc with key "
    "tiebreak), banded into A (<=80%), B (<=95%), C",
)
def orders_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the per-customer aggregate partial-aggregates map-side;
    the cumulative window is a GLOBAL sort over the aggregated (one row
    per customer) frame — the documented single-partition pinch point,
    same trade-off as any exact cumulative share. When customers
    outgrow one partition, the scalable form is the two-pass
    window_distribution_scalable pattern (per-partition partials +
    broadcast offsets) already in this engine; the classification
    logic is unchanged.

    Determinism: revenue accumulates in DECIMAL(18,4) (the relational7
    money pattern) — double sums differ from the oracle by summation
    order, and here an ulp flip would also REORDER near-equal customers
    under the revenue-desc window, cascading into every later
    cum_share. Exact decimals make the sort order and the cumulative
    sums bit-identical on both engines; the single decimal→double
    division then rounds identically, so the band CASE sees the same
    number."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("revenue"))
    )
    cum = W.orderBy(F.col("revenue").desc(), "o_custkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    whole = W.partitionBy()
    ranked = rev.withColumn(
        "cum_share",
        F.round(
            F.sum("revenue").over(cum).cast("double")
            / F.sum("revenue").over(whole).cast("double"),
            4,
        ),
    )
    return ranked.select(
        "o_custkey",
        F.round("revenue", 2).cast("double").alias("revenue"),
        "cum_share",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


_N_BINS = 20


@register(
    "events_value_histogram",
    oracle=f"""
        WITH ext AS (
            SELECT event_type, min(value) AS lo, max(value) AS hi
            FROM events WHERE value IS NOT NULL GROUP BY event_type
        ),
        binned AS (
            SELECT e.event_type,
                   CASE WHEN x.hi > x.lo
                        THEN least(CAST(floor((e.value - x.lo)
                                              / (x.hi - x.lo)
                                              * {_N_BINS}) AS INT),
                                   {_N_BINS - 1})
                        ELSE 0 END AS bin
            FROM events e JOIN ext x ON e.event_type = x.event_type
            WHERE e.value IS NOT NULL
        )
        SELECT b.event_type, b.bin, CAST(count(*) AS BIGINT) AS n,
               round(any_value(x.lo)
                     + b.bin * (any_value(x.hi) - any_value(x.lo))
                       / {_N_BINS}, 4) AS bin_lo
        FROM binned b JOIN ext x ON b.event_type = x.event_type
        GROUP BY b.event_type, b.bin
    """,
    description=f"equi-width histogram: {_N_BINS} bins per event_type "
    "over the type's own [min, max] span — per-type extent aggregate "
    "broadcast back, single-expression binning (bit-deterministic: no "
    "accumulation, one division per row), top bin right-closed",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one partial-agged extent pass, the tiny per-type extent
    frame broadcast back over the stream (same shape as the winsorize
    cuts), then one partial-agged (type, bin) count — bins are derived
    column values, so no sort anywhere."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ext = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = ev.join(F.broadcast(ext), "event_type").withColumn(
        "bin",
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * _N_BINS
                ).cast("int"),
                F.lit(_N_BINS - 1),
            ),
        ).otherwise(0),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.first("lo") + F.col("bin") * (F.first("hi") - F.first("lo")) / _N_BINS,
            4,
        ).alias("bin_lo"),
    )


_N_TILES = 10


@register(
    "events_value_deciles",
    oracle=f"""
        WITH tiled AS (
            SELECT event_type, value,
                   ntile({_N_TILES}) OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS decile
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
               round(min(value), 4) AS lo,
               round(max(value), 4) AS hi,
               round(avg(value), 4) AS mean
        FROM tiled GROUP BY event_type, decile
    """,
    description=f"equal-frequency discretization: ntile({_N_TILES}) per "
    "event_type (value order, event_id tiebreak for cross-engine "
    "determinism) with per-decile count/extent/mean — the quantile-"
    "binning complement to the equi-width histogram",
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one per-type sort (the window shuffle) then a partial-
    agged (type, decile) aggregate. Exact ntile needs the per-type
    sort; when a type outgrows a partition the approx-percentile cut
    points (profile2's sketch) replace the window, trading exact equal
    counts for fixed memory."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(_N_TILES).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.avg("value"), 4).alias("mean"),
        )
    )
