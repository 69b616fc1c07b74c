"""Aggregated query surface: importing this module populates the registry."""

from __future__ import annotations

from orca_spark.registry import REGISTRY, QuerySpec

# importing the operator modules registers their queries
from orca_spark.operators import (  # noqa: F401
    analytics,
    asof,
    bucketing,
    dedup,
    events,
    io_ops,
    io_ops2,
    multimodal,
    profile,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    scalars2,
    similarity,
    skew,
    text,
    text2,
)
from orca_spark.streaming import jobs  # noqa: F401


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def describe() -> dict[str, str]:
    return {name: spec.description for name, spec in REGISTRY.items()}
