"""Bucketed-table path: co-located joins/aggregations without a
runtime shuffle.

The reference repartitions by hand before heavy stages
(SmartAddressBuildService.scala:92 ``repartition(400)``) and re-pays
that shuffle on every run. Spark's native bucketing moves the shuffle
to WRITE time: ``bucketBy(n, key)`` hash-partitions the files once,
and every later equi-join or groupBy on the key between same-bucketed
tables runs with NO Exchange on either side — at 100 TB that deletes
the largest shuffle of a fact-fact join (e.g. events ⋈ events history
merges, orders ⋈ lineitem) from every downstream job.

Bucketed tables must live in a metastore catalog (bucket metadata
rides in the table definition, not the parquet files), so this module
manages ``saveAsTable`` targets under the session's warehouse dir.

Sizing rule: pick n_buckets so one bucket of the LARGER table is
~100-200 MB (compressed); both sides of a co-located join need the
same bucket count (or an exact multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally enables shuffle-free
    sort-merge joins (no per-task sort at read time)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket key skip their Exchange)."""
    return spark.table(table)
