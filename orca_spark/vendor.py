"""Vendored-dependency bootstrap.

The container image ships no ``google.protobuf`` and has no pip network
route, which left PySpark 4's ``transformWithStateInPandas`` (whose
Python worker speaks protobuf to the JVM state server) permanently
gated in rounds 5-7.  ``third_party/protobuf_python`` vendors the
pure-Python protobuf 4.23.2 runtime (provenance + the one-file
``runtime_version`` compat shim documented in its README); this module
makes it importable everywhere a real install would be:

* the current process (``sys.path``) — covers the driver and tests;
* ``os.environ['PYTHONPATH']`` — inherited by the local-mode JVM we
  launch, and from it by the Python worker daemons;
* ``SparkContext.environment`` for externally-created sessions (the
  verify driver's) — pyspark passes that dict as the worker env for
  every Python UDF, so workers forked after this call resolve it too.

A real ``google.protobuf`` install always wins: nothing is touched when
the import already succeeds.
"""

from __future__ import annotations

import os
import sys

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "third_party",
    "protobuf_python",
)


def _protobuf_importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable, vendored fallback last.

    Returns True iff the import works after the call.  Pass a live
    ``SparkSession`` to also route the vendor dir to its Python workers
    (needed when the JVM predates this process's environ mutation).
    """
    if not _protobuf_importable():
        if not os.path.isdir(_VENDOR_DIR):
            return False
        if _VENDOR_DIR not in sys.path:
            sys.path.insert(0, _VENDOR_DIR)
        prev = os.environ.get("PYTHONPATH", "")
        if _VENDOR_DIR not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _VENDOR_DIR + (os.pathsep + prev if prev else "")
            )
        if not _protobuf_importable():
            return False
    if spark is not None and os.path.isdir(_VENDOR_DIR):
        try:
            env = spark.sparkContext.environment
            prev = env.get("PYTHONPATH", "")
            if _VENDOR_DIR not in prev.split(os.pathsep):
                env["PYTHONPATH"] = (
                    _VENDOR_DIR + (os.pathsep + prev if prev else "")
                )
        except Exception:
            pass  # connect-mode sessions have no sparkContext; driver-side
            # import still works, and workers there have their own env
    return _protobuf_importable()
