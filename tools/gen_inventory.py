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


def staleness_line() -> str:
    """One generated line showing the re-verification debt at a glance
    (r08 verdict item 7): per registered query, the round of its most
    recent green driver row (never = no green row yet), histogrammed.
    Reuses the same evidence parse the verification rotation schedules
    from, so the dashboard and the schedule cannot disagree."""
    import __spark_entry__ as entry

    prio = entry._evidence_priority()
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


if __name__ == "__main__":
    main()
