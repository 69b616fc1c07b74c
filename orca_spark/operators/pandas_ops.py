"""The deliberate Python path: Arrow-batched grouped-map UDFs.

Everything else in this engine is JVM-side codegen by design (see
tests/test_plans.py, which asserts the ABSENCE of Python from the hot
paths). This module is the counter-example done right — when per-group
logic genuinely needs Python (numpy/scipy models, custom science code),
the shape to use is ``applyInPandas``: one Arrow batch per group, a
vectorized pandas function, typed output schema. Never a row-at-a-time
``udf()``.

``events_user_zscore_pandas`` intentionally computes something SQL can
also express (per-user z-scores), so the DuckDB oracle can prove the
Arrow path BIT-EXACT against the relational form — the guarantee that
matters before trusting the same harness with non-SQL science code.

Scale notes: ``applyInPandas`` shuffles once on the group key and holds
ONE group per Arrow batch in memory — per-user event counts bound the
batch, not the corpus. Skewed group sizes are the hazard; at 100 TB
pre-split giant keys (salt) or bound group size upstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_OUT_SCHEMA = "user_id bigint, event_id bigint, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # ddof=1 (sample stddev) matches SQL stddev_samp; a single-event
    # group gets NaN -> emitted as NULL, same as SQL. Raw z here —
    # rounding happens outside via F.round (HALF_UP like SQL; pandas
    # .round is half-even and flips on boundary values)
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)
    z = (pdf["value"] - mean) / std if std and std == std and std > 0.0 else None
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["zscore"] = None if z is None else z
    return out


@register(
    "events_user_zscore_pandas",
    oracle="""
        SELECT user_id, event_id, value,
               round((value - avg(value) OVER w)
                     / nullif(stddev_samp(value) OVER w, 0), 4) AS zscore
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """,
    description="per-user z-scores via applyInPandas (Arrow grouped-map "
    "— ONE batch per group, vectorized pandas, typed schema; the "
    "sanctioned Python path for per-group science code). Oracle is the "
    "pure-SQL window form, proving the Arrow path value-exact",
)
def events_user_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    raw = e.groupBy("user_id").applyInPandas(_zscore_group, _OUT_SCHEMA)
    return raw.withColumn("zscore", F.round("zscore", 4))


@register(
    "events_type_median_pandas_agg",
    oracle="""
        SELECT event_type,
               round(median(value), 4)          AS median_value,
               round(quantile_cont(value, 0.9), 4) AS p90_value
        FROM events
        GROUP BY event_type
    """,
    description="pandas_udf GROUPED_AGG (Series -> scalar): exact median "
    "and p90 per event type via numpy inside an Arrow aggregate UDF — "
    "the third sanctioned Python shape (after grouped-map and cogroup); "
    "one shuffle on the group key, one Arrow batch per group. Oracle is "
    "DuckDB's interpolating median/quantile_cont, proving the numpy "
    "percentile (linear interpolation) value-exact",
)
def events_type_median_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # SQL aggregate semantics: NULLs are ignored, an all-NULL group is
    # NULL — np.percentile would instead poison the whole group to NaN
    # from one missing value
    def _pct(v: pd.Series, q: float):
        arr = v.dropna().to_numpy()
        if arr.size == 0:
            return None
        return float(np.percentile(arr, q))

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return _pct(v, 50)

    @pandas_udf("double")
    def p90_udf(v: pd.Series) -> float:
        return _pct(v, 90)

    # round OUTSIDE Python (F.round is HALF_UP like SQL; Python's
    # round() is half-even and flips on boundary values)
    e = load(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").agg(
        F.round(median_udf("value"), 4).alias("median_value"),
        F.round(p90_udf("value"), 4).alias("p90_value"),
    )


@register(
    "events_log_value_arrow",
    oracle="""
        SELECT event_id, value,
               round(ln(1 + value), 6) AS log1p_value
        FROM events
        WHERE value >= 0
    """,
    description="mapInArrow (zero-copy RecordBatch path): per-batch "
    "pyarrow.compute transform with NO pandas materialization — the "
    "fourth Arrow shape (after grouped-map, cogroup, grouped-agg), for "
    "per-batch numeric/binary kernels where even the pandas conversion "
    "overhead matters. Oracle is the SQL form, proving the Arrow "
    "kernel value-exact",
)
def events_log_value_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pyarrow as pa

    def transform(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            value = batch.column("value")
            # half_away_from_zero matches SQL round (pyarrow's default
            # is half_to_even, which flips on boundary values)
            log1p = pc.round(
                pc.ln(pc.add(value, 1.0)),
                ndigits=6,
                round_mode="half_towards_infinity",
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), value, log1p],
                ["event_id", "value", "log1p_value"],
            )

    e = load(spark, sf_dir, "events").select("event_id", "value").where(
        F.col("value") >= 0
    )
    return e.mapInArrow(
        transform, "event_id bigint, value double, log1p_value double"
    )


_COGROUP_SCHEMA = (
    "user_id bigint, n_events bigint, events_value double,"
    " n_orders bigint, orders_value double"
)


def _activity_cogroup(key: tuple, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
    # empty side -> count 0, sum NULL (exactly the SQL full-outer
    # aggregate semantics the oracle expresses)
    return pd.DataFrame(
        {
            # nullable Int64: a NULL grouping key is a legitimate group
            # (cogroup pairs it across both sides) and must not crash
            # the int64 cast — it flows through Arrow as a NULL bigint
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_events": pd.Series([len(ev)], dtype="int64"),
            # raw sums — rounding happens OUTSIDE Python via F.round
            # (HALF_UP, matching SQL) because Python's round() is
            # round-half-even and flips on boundary values
            "events_value": [float(ev["value"].sum()) if len(ev) else None],
            "n_orders": pd.Series([len(od)], dtype="int64"),
            "orders_value": [
                float(od["o_totalprice"].sum()) if len(od) else None
            ],
        }
    )


@register(
    "events_orders_activity_cogroup",
    oracle="""
        WITH e AS (
            SELECT user_id, count(*) AS n_events,
                   round(sum(value), 4) AS events_value
            FROM events GROUP BY user_id
        ),
        o AS (
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS orders_value
            FROM orders GROUP BY o_custkey
        )
        SELECT coalesce(user_id, o_custkey)   AS user_id,
               coalesce(n_events, 0)          AS n_events,
               events_value,
               coalesce(n_orders, 0)          AS n_orders,
               orders_value
        -- null-safe equality: cogroup pairs the NULL-key GROUPS of the
        -- two sides (grouping semantics), unlike a plain join's
        -- NULL <> NULL — IS NOT DISTINCT FROM expresses exactly that
        FROM e FULL OUTER JOIN o ON user_id IS NOT DISTINCT FROM o_custkey
    """,
    description="cogrouped Arrow map (groupBy.cogroup.applyInPandas): "
    "each user's events AND orders arrive as two aligned pandas frames "
    "in one Python call — the shape for per-key reconciliation logic "
    "that needs both sides at once (feature joins, account rollups). "
    "Both sides shuffle once on the key; oracle is the full-outer "
    "aggregate join, proving the cogroup path value-exact",
)
def events_orders_activity_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    od = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    raw = (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("o_custkey"))
        .applyInPandas(_activity_cogroup, _COGROUP_SCHEMA)
    )
    return raw.select(
        "user_id",
        "n_events",
        F.round("events_value", 4).alias("events_value"),
        "n_orders",
        F.round("orders_value", 2).alias("orders_value"),
    )
