"""pulsar_spark_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``vineetsha/pulsar-spark`` (a Pulsar DStream connector
plus Flipkart's "Compass" geo-analytics Spark jobs) on idiomatic
PySpark: DataFrame/SQL plans optimized by Catalyst, grouped-map pandas
UDF kernels for the procedural geo-clustering algorithms, and
Structured Streaming for the micro-batch ingest surface.

Layout
------
- ``session``    SparkSession factory with engine defaults
- ``sources``    batch table catalog + micro-batch stream source with
                 offset-range planning / backpressure (reference:
                 pulsar-spark-dstream offset model)
- ``functions``  scalar function library (geo, text, time, maps)
- ``operators``  relational + dataflow operators (dedup, similarity,
                 joins, state merge, multimodal) and the G1-G9
                 grouped-map kernels
- ``plans``      the named query library exposed to the driver via
                 ``__spark_entry__``
- ``streaming``  foreachBatch pipelines, watermark/dedup, stateful
                 geofence machine
"""

from pulsar_spark_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
