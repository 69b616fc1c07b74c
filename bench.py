#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect overhead) — the honest analog of a cluster job
writing results out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orca_spark.queries import queries  # noqa: E402
from orca_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "window_topk_orders",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash",
    "text_word_frequencies",
    "similarity_brute_topk",
    "orc_roundtrip_agg",
    "asof_join_latest_order",
    "orc_partitioned_pruned",
    # round-2 additions: the former scale-weak queries (post-fix) and the
    # new scale paths, so their shape is tracked as data grows
    "dedup_connected_components",
    "dedup_simhash_pairs",
    "embedding_near_dup_pairs_ivf",
    "similarity_pq_topk",
    "window_distribution_scalable",
    "dedup_cross_split_contamination",
    # round-4 additions: the real-codec Arrow decode path and the
    # BLAS-scored near-dup form (vs the expression-scored ivf sibling)
    "multimodal_ppm_decode",
    "embedding_near_dup_pairs_gram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("orca_spark_bench")
    allq = queries()

    # warm the JVM with a trivial action and resolve every table once
    # (footer reads = catalog setup, shared across all queries) so the
    # first measured query doesn't pay session startup
    from orca_spark.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t)
    allq["stats_extendedprice"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # t0 before plan construction: queries with eager side effects
        # (ORC writes, checkpoints, codebook training) must pay for them
        # inside their measurement, not before it
        t0 = time.perf_counter()
        df = allq[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # r01 timed from AFTER plan construction, so eager side
                # effects (ORC writes, index training) escaped the clock;
                # per ADVICE r1 the clock now starts BEFORE construction —
                # r01-vs-r02 per-query deltas include that honesty fix
                "timing_note": "t0 precedes plan construction since r02. r04: host load on this shared box adds up to +/-50% per run (q1 spans 1.2-1.9s across runs with identical plans); quiet-run medians after this round's plan work: pq_topk ~5 (r02 7.9), connected_components ~4.8 (r02 5.6), minhash ~2.8 steady (its first run pays ~2.7s of one-time whole-stage-codegen JIT for the 64-permutation aggregate — measured 5.6s then 2.8s back-to-back in one session)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
