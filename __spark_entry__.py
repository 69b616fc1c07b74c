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


def _evidence_paths() -> list[str]:
    """Every committed-or-dropped CORRECTNESS file, oldest round first."""
    return sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")))


def _parse_evidence(paths: list[str]) -> dict[str, int]:
    """Parse CORRECTNESS files into a per-query scheduling key:
    -1 (verify first) for queries never green OR whose latest driver row
    was a crash/mismatch (a regression must re-enter the prefix), else
    the round of the most recent green row (oldest re-verified first).

    A malformed evidence file (wrong shape, unreadable, bad JSON) is
    skipped, never fatal: this runs inside the driver's entry import.
    """
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for path in paths:
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
    return {
        name: (last_green[name]
               if name in last_green and last_green[name] >= last_seen[name]
               else -1)
        for name in last_seen
    }


def _evidence_priority() -> dict[str, int]:
    """Cached `_parse_evidence` over everything on disk — both queries()
    and oracle_sql() share one parse per process."""
    if _evidence_priority.cache is None:
        _evidence_priority.cache = _parse_evidence(_evidence_paths())
    return _evidence_priority.cache


_evidence_priority.cache = None


def _current_fingerprints() -> dict[str, str]:
    """Per-query content fingerprint: sha256 over the registered function's
    source + its oracle SQL. Approximate by design (helper-function edits
    aren't captured), but it catches the failure mode that bit round 10:
    a query whose plan/oracle changed while its driver evidence stayed
    green-at-an-old-round, so the rotation treated it as merely stale.
    """
    import hashlib
    import inspect

    from orca_spark.registry import REGISTRY

    fps: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = ""
        blob = src + "\0" + (spec.oracle or "")
        fps[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return fps


def _changed_since_green() -> frozenset[str]:
    """Queries whose current fingerprint differs from the one recorded at
    their last green driver row (FINGERPRINTS.json, refreshed by
    tools/gen_inventory.py at round start from the newest CORRECTNESS
    drop). Missing entries count as unchanged; any failure here must
    degrade to 'nothing changed', never break the driver's entry import.
    """
    if _changed_since_green.cache is not None:
        return _changed_since_green.cache
    changed: set[str] = set()
    try:
        with open(os.path.join(_HERE, "FINGERPRINTS.json")) as f:
            stored = json.load(f)
        if isinstance(stored, dict):
            current = _current_fingerprints()
            changed = {
                n for n, fp in current.items()
                if n in stored and stored[n] != fp
            }
    except (OSError, ValueError, TypeError, json.JSONDecodeError):
        changed = set()
    _changed_since_green.cache = frozenset(changed)
    return _changed_since_green.cache


_changed_since_green.cache = None


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
    2. then queries whose code/oracle fingerprint no longer matches the
       one recorded at their last green row (r10 verdict item 2: a
       semantics change must re-enter the prefix immediately, not wait
       out the round-robin while stale evidence vouches for old code);
    3. then green unchanged queries, oldest verification round first
       (true round-robin re-verification), registry order as tiebreak.

    A row counts as green only if the value-hash matched or the driver
    recorded the documented ``no_oracle`` rows-only pass.
    """
    prio = _evidence_priority()
    changed = _changed_since_green()
    order = {n: i for i, n in enumerate(names)}

    def key(n: str):
        p = prio.get(n, -1)
        if p == -1:
            return (0, 0, order[n])
        if n in changed:
            return (1, p, order[n])
        return (2, p, order[n])

    return sorted(names, key=key)


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
