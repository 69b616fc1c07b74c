"""orca_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference library
``bpoweski/orca`` (a Clojure ORC encode/decode library,
``/root/reference/src/orca/core.clj``), re-expressed Spark-first:

* ORC read/write via Spark's vectorized ORC datasource
  (reference: ``core.clj:25-89, 622-671``).
* Schema inference and the Hive implicit-conversion merge lattice
  (reference: ``core.clj:91-437``) as pure-Python ``DataType`` tree ops.
* A full relational query surface (filter/project/join/agg/window/
  sort/set-ops) over DataFrames — absent in the reference, native here.
* Large-scale LLM-data-pipeline operators: dedup (exact + MinHash LSH +
  SimHash + Jaccard), embedding similarity search, text analysis,
  multimodal binary columns.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and AQE handles skew/coalescing at scale.
"""

from orca_spark.session import get_spark
from orca_spark.frame import stats, frame_to_rows, frame_to_maps
from orca_spark.io import read_orc, read_frame, write_orc, write_rows

__all__ = [
    "get_spark",
    "stats",
    "frame_to_rows",
    "frame_to_maps",
    "read_orc",
    "read_frame",
    "write_orc",
    "write_rows",
]

__version__ = "0.1.0"
