"""Aggregated query surface: importing this module populates the registry."""

from __future__ import annotations

from orca_spark.registry import REGISTRY, QuerySpec

# Importing the operator modules registers their queries. ORDER MATTERS:
# the correctness harness verifies registry entries in insertion order and
# may only cover a prefix per round, so each round rotates the modules
# whose queries most need fresh verification to the front (round 3: the
# 19 round-2 additions that have no driver row yet — io_ops2, dedup2,
# similarity2, ranges, text3, text4, profile2, pandas_ops, relational6,
# jobs2 — plus any queries newly added this round, then two
# previously-verified canary modules, then the long-verified tail).
from orca_spark.operators import (  # noqa: F401
    io_ops2,
    dedup2,
    similarity2,
    ranges,
    text3,
    text4,
    profile2,
    pandas_ops,
    relational6,
)
from orca_spark.streaming import jobs2  # noqa: F401

# Canaries: one relational + one similarity module that already have green
# driver rows, re-verified every round as a regression tripwire.
from orca_spark.operators import (  # noqa: F401
    relational,
    similarity,
)

# Long-verified tail (green in r01/r02).
from orca_spark.operators import (  # noqa: F401
    relational2,
    relational3,
    relational4,
    relational5,
    scalars2,
    skew,
    text,
    text2,
    dedup,
    analytics,
    asof,
    bucketing,
    events,
    io_ops,
    multimodal,
    profile,
)
from orca_spark.streaming import jobs  # noqa: F401


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def describe() -> dict[str, str]:
    return {name: spec.description for name, spec in REGISTRY.items()}
