"""Columnar-frame helpers and the reference's one aggregate.

The reference materializes ORC files as a "frame" — a dict of
``column → vector`` (``/root/reference/src/orca/core.clj:69-89``) — and
reshapes frames to row vectors / row maps (``core.clj:679-683``). In
Spark the DataFrame *is* the frame; these helpers only exist at the
driver-side materialization boundary and are never part of a
distributed plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats(df: DataFrame, column: str) -> dict[str, Any]:
    """Per-column ``{sum, min, max, count}``.

    Parity with the reference's ``stats`` (``core.clj:220-226``):
    ``count`` is the *row count including nulls*; ``sum``/``min``/``max``
    skip nulls. Executes as a single distributed aggregate (map-side
    partial aggregation, one shuffle to a single reduce group).
    """
    row = df.agg(
        F.sum(column).alias("sum"),
        F.min(column).alias("min"),
        F.max(column).alias("max"),
        F.count(F.lit(1)).alias("count"),
    ).collect()[0]
    return {"sum": row["sum"], "min": row["min"], "max": row["max"], "count": row["count"]}


def stats_df(df: DataFrame, column: str) -> DataFrame:
    """`stats` as a 1-row DataFrame (for the query/oracle harness)."""
    return df.agg(
        F.sum(column).alias("sum"),
        F.min(column).alias("min"),
        F.max(column).alias("max"),
        F.count(F.lit(1)).alias("count"),
    )


def to_frame(df: DataFrame) -> dict[str, list]:
    """Materialize a DataFrame into a columnar frame ``{col → list}``.

    Driver-side only (equivalent of ``read-vectors``'s return shape,
    ``core.clj:79-89``); do not call inside a transform.
    """
    cols = df.columns
    rows = df.collect()
    return {c: [r[i] for r in rows] for i, c in enumerate(cols)}


def frame_to_rows(frame: dict[str, list]) -> list[tuple]:
    """Transpose frame → positional row tuples (``frame->vecs``, core.clj:679-680)."""
    cols = list(frame)
    if not cols:
        return []
    return [tuple(frame[c][i] for c in cols) for i in range(len(frame[cols[0]]))]


def frame_to_maps(frame: dict[str, list]) -> list[dict]:
    """Transpose frame → row dicts (``frame->maps``, core.clj:682-683)."""
    cols = list(frame)
    if not cols:
        return []
    return [{c: frame[c][i] for c in cols} for i in range(len(frame[cols[0]]))]
