"""Simulate the external verify driver over the verification prefix.

Runs the first N entries of ``verification_order`` (what the driver
will check this round) against their DuckDB oracles at sf0.01 with the
same value + dtype-family compare the local gate uses, and a rows-only
check for oracleless entries. Prints one line per query and a summary.

Usage: python tools/simulate_driver.py [N] [sf_dir]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from conftest import compare_query  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = entry.queries()
    o = entry.oracle_sql()
    con = duckdb.connect()
    names = list(q)[:n]
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            if name in o:
                compare_query(spark, con, q[name], o[name], sf_dir)
                status = "HASH-GREEN"
            else:
                # toLocalIterator(), NOT count(): count() lets Catalyst
                # prune the projected expressions, so a query whose output
                # column ANSI-aborts at evaluation would pass here yet fail
                # the real driver, which materializes values (same pruning
                # hazard tests/test_adversarial_embeddings.py documents).
                # And NOT collect(): full evaluation must not require the
                # whole result to fit in driver memory — streaming the rows
                # keeps the anti-pruning intent at any output size.
                rows = sum(1 for _ in q[name](spark, sf_dir).toLocalIterator())
                status = f"ROWS-ONLY ({rows} rows)"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(name)
            traceback.print_exc()
        print(f"[{i+1:2d}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)",
              flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
