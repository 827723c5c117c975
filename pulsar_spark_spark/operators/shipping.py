"""Ship the engine package to Python workers.

Grouped-map kernels are cloudpickled BY REFERENCE to this package, so
every Python worker must be able to ``import pulsar_spark_spark``.
When the host application built its own SparkSession (the driver
harness does), the repo directory is not on the workers' sys.path —
``addPyFile`` with a zip of the package fixes that locally and is also
exactly how the package ships to a real 1000-executor cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Idempotently add a zip of pulsar_spark_spark to the context.

    The idempotence key is ``applicationId`` — a context-LIFETIME
    identity. ``id(sc)`` is not one: after ``spark.stop()`` and GC a
    new context can land at the same CPython heap address, and the
    stale entry would silently skip ``addPyFile`` — every grouped-map
    kernel then fails on executors with ModuleNotFoundError."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"pulsar_spark_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
