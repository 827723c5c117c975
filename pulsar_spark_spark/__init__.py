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
- ``sources``    batch table catalog (tables.py) + write paths
                 (sinks.py: keyed upsert, CSV report)
- ``functions``  scalar function library (geo, text, time, maps)
- ``operators``  G1-G8 procedural geo kernels (geo_kernels.py), their
                 applyInPandas wrappers (grouped.py), executor package
                 shipping (shipping.py)
- ``plans``      the named query library exposed to the driver via
                 ``__spark_entry__``: relational spine, event
                 analytics, text dedup/quality, similarity search,
                 geo predicates + history merge, kernel queries,
                 KV-attribute/time queries, multimodal columns
- ``streaming``  micro-batch rate planning (rate.py), file-source
                 pipelines with checkpointed foreachBatch upsert and
                 watermark windows (pipeline.py)
"""

from pulsar_spark_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
