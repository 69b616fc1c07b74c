#!/usr/bin/env python
"""Large-SF scaling lane (r12 verdict item 8): time the loop-shaped
queries on the k-fold corpus from tools/gen_scaled_corpus.py at the
given core count. The committed evidence (SF_SCALING.log) pairs a
32-core and an 8-core run so parallel-path claims are measured where
the suite is compute-bound, not at sf0.1 where fixed per-job overhead
dominates (the r12 8-vs-32 inversion).

Usage: python tools/sf_scaling_lane.py <cpus> [data_dir] [runs]
Prints one line per query: name, median, all samples (run 1 = cold).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_edit_distance",
    "text_langid_trigram",
    "dedup_minhash",
    "dedup_connected_components",
    "graph_label_propagation_simhash",
    "embeddings_kmeans_distributed",
]


def main() -> None:
    cpus = int(sys.argv[1])
    data = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from orca_spark.queries import queries
    from orca_spark.session import get_spark

    spark = get_spark(f"sf_scaling_{cpus}", cpus=cpus)
    allq = queries()
    from orca_spark.tables import load

    for t in ("documents", "embeddings"):
        load(spark, data, t)
    # JVM warm-up action, as in bench.py
    load(spark, data, "documents").count()
    print(f"# cpus={cpus} data={data} runs={runs}")
    for name in QUERIES:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = allq[name](spark, data)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        med = sorted(samples)[len(samples) // 2]
        print(f"{name} cpus={cpus} median={med} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
