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
    # group gets NaN -> emitted as NULL, same as SQL
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)
    z = (pdf["value"] - mean) / std if std and std == std and std > 0.0 else None
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["zscore"] = None if z is None else z.round(4)
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
    return e.groupBy("user_id").applyInPandas(_zscore_group, _OUT_SCHEMA)
