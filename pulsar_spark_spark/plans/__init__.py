"""Named query library.

Each module registers queries with the @query decorator; the driver
surface (``__spark_entry__.py``) re-exports the merged registry.
"""

from pulsar_spark_spark.plans.registry import ORACLES, QUERIES, query

# Import for registration side-effects.
from pulsar_spark_spark.plans import relational  # noqa: E402,F401
from pulsar_spark_spark.plans import events  # noqa: E402,F401
from pulsar_spark_spark.plans import text  # noqa: E402,F401
from pulsar_spark_spark.plans import similarity  # noqa: E402,F401
from pulsar_spark_spark.plans import geo  # noqa: E402,F401
from pulsar_spark_spark.plans import kernels  # noqa: E402,F401
from pulsar_spark_spark.plans import attrs  # noqa: E402,F401
from pulsar_spark_spark.plans import multimodal  # noqa: E402,F401
from pulsar_spark_spark.plans import address  # noqa: E402,F401
from pulsar_spark_spark.plans import timeseries  # noqa: E402,F401
from pulsar_spark_spark.plans import curation  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
