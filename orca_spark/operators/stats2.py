"""Categorical association profiling: event_type × hour-of-day.

The feature-association diagnostic a pipeline runs before trusting a
categorical feature: the observed/expected contingency table between
``event_type`` and hour-of-day, with each cell's chi-square
contribution and pointwise mutual information. Summing the cells gives
the chi-square statistic and the mutual information of the pair; the
per-cell form is emitted because the CELLS are what you read when the
association is real (which hours does `purchase` over-index on?).

Reference parity: the reference (core.clj) has only sum/min/max/count
``stats`` (core.clj:220-226); association measures are part of the
added engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load


@register(
    "events_type_hour_association",
    oracle="""
        WITH cells AS (
            SELECT event_type, CAST(hour(ts) AS INT) AS hr,
                   count(*) AS obs
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, hr, obs,
                   sum(obs) OVER (PARTITION BY event_type) AS row_tot,
                   sum(obs) OVER (PARTITION BY hr) AS col_tot,
                   sum(obs) OVER () AS n
            FROM cells
        )
        SELECT event_type, hr, CAST(obs AS BIGINT) AS obs,
               round(row_tot * col_tot / n, 4) AS expected,
               round(pow(obs - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n), 4) AS chi2_cell,
               round(ln(obs * n / (row_tot * col_tot)), 4) AS pmi
        FROM tot
    """,
    description="event_type x hour-of-day contingency cells with "
    "expected counts, per-cell chi-square contribution and pointwise "
    "mutual information — the categorical-association diagnostic; all "
    "inputs are integer counts from one aggregation pass",
)
def events_type_hour_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE corpus aggregation (event_type, hour) with map-side
    combine produces the cell table (|types| × 24 rows — model-sized);
    the margin windows then run on cells, not events. At a 100 TB
    event log nothing after the first groupBy touches more than the
    contingency table itself.

    Determinism: obs/row_tot/col_tot/n are exact integers; every float
    column is a fixed composition of arithmetic on those integers
    (same expression both engines), rounded (4) for display. NULL ts
    and NULL type are excluded up front — hour(NULL) rows would form a
    phantom margin differing between engines' NULL grouping."""
    cells = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type", F.hour("ts").cast("int").alias("hr"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    tot = cells.select(
        "event_type",
        "hr",
        "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("hr")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return tot.select(
        "event_type",
        "hr",
        "obs",
        F.round(exp, 4).alias("expected"),
        F.round(F.pow(F.col("obs") - exp, 2) / exp, 4).alias("chi2_cell"),
        F.round(
            F.log(F.col("obs") * F.col("n") / (F.col("row_tot") * F.col("col_tot"))),
            4,
        ).alias("pmi"),
    )
