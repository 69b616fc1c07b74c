"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine itself lives in ``orca_spark/``; this module is the thin
adapter over its query registry.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from orca_spark import queries as _q  # noqa: E402
from orca_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    configure_session(spark)
    return _q.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _evidence_priority() -> dict[str, int]:
    """Per-query scheduling key from the committed CORRECTNESS evidence:
    -1 (verify first) for queries never green OR whose latest driver row
    was a crash/mismatch (a regression must re-enter the prefix), else
    the round of the most recent green row (oldest re-verified first).

    Parsed once per process — both queries() and oracle_sql() share it.
    A malformed evidence file (wrong shape, unreadable, bad JSON) is
    skipped, never fatal: this runs inside the driver's entry import.
    """
    if _evidence_priority.cache is not None:
        return _evidence_priority.cache
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
            with open(path) as f:
                rows = json.load(f)
            if not isinstance(rows, dict):
                continue
            for name, row in rows.items():
                if not isinstance(row, dict):
                    continue
                last_seen[name] = max(last_seen.get(name, 0), rnd)
                green = row.get("hash_match") is True or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if green:
                    last_green[name] = max(last_green.get(name, 0), rnd)
        except (ValueError, OSError, TypeError, AttributeError,
                json.JSONDecodeError):
            continue
    prio = {
        name: (last_green[name]
               if name in last_green and last_green[name] >= last_seen[name]
               else -1)
        for name in last_seen
    }
    _evidence_priority.cache = prio
    return prio


_evidence_priority.cache = None


def verification_order(names: list[str]) -> list[str]:
    """Rotate the registry so the driver's per-round verification prefix
    always lands on the queries that need it most.

    The driver verifies a fixed-size prefix of ``queries()`` per round, so
    ordering IS the verification schedule. Rather than hand-rotating
    module imports (the r02–r05 approach, which went stale the moment a
    module mixed verified and unverified queries), derive the schedule
    from the committed ``CORRECTNESS_r*.json`` evidence:

    1. queries with no green driver row ever — or whose LATEST driver
       row regressed (crash/mismatch after an earlier green) — in
       registry order;
    2. then green queries, oldest verification round first (true
       round-robin re-verification), registry order as tiebreak.

    A row counts as green only if the value-hash matched or the driver
    recorded the documented ``no_oracle`` rows-only pass.
    """
    prio = _evidence_priority()
    order = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (prio.get(n, -1), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    base = _q.queries()
    return {name: wrap(base[name]) for name in verification_order(list(base))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same aliases, same rounding)."""
    base = _q.oracle_sql()
    full = _q.queries()
    return {n: base[n] for n in verification_order(list(full)) if n in base}
