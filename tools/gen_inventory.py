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

| # | query | oracle | description |
|---|---|---|---|
"""


def main() -> None:
    assert REGISTRY, "registry is empty — import order bug"
    rows = []
    for i, name in enumerate(sorted(REGISTRY), 1):
        spec = REGISTRY[name]
        status = "yes" if spec.oracle else "behavior-tested"
        desc = " ".join(spec.description.split())
        rows.append(f"| {i} | `{name}` | {status} | {desc} |")
    with open("OPERATORS.md", "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")

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
