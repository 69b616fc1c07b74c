#!/usr/bin/env python
"""Regenerate OPERATORS.md (and README registry counts) from the query
registry. Run from the repo root after adding/changing registered
queries:

    python tools/gen_inventory.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import orca_spark.queries as q  # noqa: E402  (populates the registry)
from orca_spark.registry import REGISTRY  # noqa: E402

HEADER = """# OPERATORS — the engine surface, generated from the query registry

One row per `queries()` entry. Oracle = has a DuckDB-equivalent SQL
string hash-compared by the correctness gate; behavior-tested = the
probabilistic/sketch operators asserted on planted duplicates or error
bounds instead.

{staleness}

| # | query | oracle | description |
|---|---|---|---|
"""


def staleness_line(paths: list[str] | None = None) -> str:
    """One generated line showing the re-verification debt at a glance
    (r08 verdict item 7): per registered query, the round of its most
    recent green driver row (never = no green row yet), histogrammed.
    Reuses the same evidence parse the verification rotation schedules
    from, so the dashboard and the schedule cannot disagree. ``paths``
    restricts the parse to a subset of CORRECTNESS files (the contract
    test uses it to tolerate the round-boundary driver drop)."""
    import __spark_entry__ as entry

    prio = (entry._evidence_priority() if paths is None
            else entry._parse_evidence(paths))
    hist: dict[int, int] = {}
    for name in REGISTRY:
        hist[prio.get(name, -1)] = hist.get(prio.get(name, -1), 0) + 1
    parts = [
        ("never" if rnd == -1 else f"r{rnd:02d}") + f"×{hist[rnd]}"
        for rnd in sorted(hist)
    ]
    return (
        "Verification staleness (latest green driver round per query): "
        + " ".join(parts)
    )


def refresh_fingerprints() -> int:
    """Update FINGERPRINTS.json — the per-query code/oracle fingerprint as
    of each query's most recent green driver row (r10 verdict item 2).

    Run at round start (before any code changes), when the current source
    is exactly what the driver just verified: every query green in the
    NEWEST CORRECTNESS file gets its stored fingerprint set to the
    current one. Queries not green in that file keep their stored value,
    so a semantics change stays flagged (`verification_order` tier 2)
    until the driver re-hashes it. Missing entries bootstrap to current
    (unchanged-by-assumption). Returns the number of flagged queries.
    """
    import json

    import __spark_entry__ as entry

    path = "FINGERPRINTS.json"
    stored: dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
    current = entry._current_fingerprints()
    paths = entry._evidence_paths()
    newest_green: set[str] = set()
    newest_round = 0
    if paths:
        newest = entry._parse_evidence(paths[-1:])
        newest_round = int(
            "".join(c for c in os.path.basename(paths[-1]) if c.isdigit())
        )
        newest_green = {n for n, rnd in newest.items() if rnd != -1}
    # The newest-round refresh is one-shot per round (`_round` marker):
    # the first run after the driver drops CORRECTNESS_r{N} sees pristine
    # round-start code and records it as each green query's verified
    # fingerprint; mid-round reruns (after code edits) must NOT re-absorb
    # those edits or a changed query would silently unflag itself.
    already_refreshed = stored.get("_round") == newest_round
    for name in REGISTRY:
        if (name in newest_green and not already_refreshed) or name not in stored:
            stored[name] = current[name]
    stored = {n: fp for n, fp in stored.items() if n in REGISTRY}
    stored["_round"] = newest_round
    with open(path, "w") as f:
        json.dump(stored, f, indent=1, sort_keys=True)
        f.write("\n")
    flagged = sorted(n for n in REGISTRY
                     if stored.get(n) not in (None, current[n]))
    print(f"FINGERPRINTS.json: {len(stored) - 1} entries; "
          f"changed-since-green: {flagged or 'none'}")
    return len(flagged)


def main() -> None:
    assert REGISTRY, "registry is empty — import order bug"
    rows = []
    for i, name in enumerate(sorted(REGISTRY), 1):
        spec = REGISTRY[name]
        status = "yes" if spec.oracle else "behavior-tested"
        desc = " ".join(spec.description.split())
        rows.append(f"| {i} | `{name}` | {status} | {desc} |")
    stale = staleness_line()
    with open("OPERATORS.md", "w") as f:
        f.write(HEADER.format(staleness=stale) + "\n".join(rows) + "\n")
    print(stale)

    n_q, n_o = len(q.queries()), len(q.oracle_sql())
    with open("README.md") as f:
        readme = f.read()
    readme = re.sub(r"\*\*\d+ operators\*\*", f"**{n_q} operators**", readme)
    readme = re.sub(
        r"\*\*\d+ DuckDB-equivalent SQL strings\*\*",
        f"**{n_o} DuckDB-equivalent SQL strings**",
        readme,
    )
    readme = re.sub(r"\d+-query surface", f"{n_q}-query surface", readme)
    from bench import HEADLINE  # late import: bench imports the registry

    readme = re.sub(
        r"times \d+ headline queries",
        f"times {len(HEADLINE)} headline queries",
        readme,
    )
    with open("README.md", "w") as f:
        f.write(readme)

    with open("USAGE.md") as f:
        usage = f.read()
    usage = re.sub(
        r"\d+ at this writing", f"{len(REGISTRY)} at this writing", usage
    )
    with open("USAGE.md", "w") as f:
        f.write(usage)
    print(f"OPERATORS.md: {len(rows)} rows; README counts: {n_q}/{n_o}")
    refresh_fingerprints()


if __name__ == "__main__":
    main()
