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

import contextlib

from pyspark.sql import DataFrame, SparkSession

_AUTO_SCAN = "spark.sql.sources.bucketing.autoBucketedScan.enabled"


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.
    Sorting within buckets additionally enables shuffle-free
    sort-merge joins (no per-task sort at read time). ``path`` makes
    the table external (data at ``path``, bucket spec in the catalog)
    — the normal shape for a shared 100 TB layout."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket key skip their Exchange)."""
    return spark.table(table)


@contextlib.contextmanager
def bucketed_scan_pinned(spark: SparkSession):
    """Force bucketed scans while the context is active.

    By default Spark only performs a bucketed scan (one task per
    bucket) when the plan contains an operator that provably benefits
    — joins and aggregations on the bucket key. A ``mapInPandas``
    kernel declares no required distribution, so the planner would
    silently fall back to a split-based scan whose partitions do NOT
    align with buckets, breaking the "every key in exactly one
    partition" guarantee that ``pre_partitioned=True`` kernels
    (operators/grouped.py::stream_key_runs) rely on. Pin the scan for
    the duration of any action that executes such a kernel.
    """
    prev = spark.conf.get(_AUTO_SCAN)
    spark.conf.set(_AUTO_SCAN, "false")
    try:
        yield
    finally:
        spark.conf.set(_AUTO_SCAN, prev)


def save_kernel_points(
    points: DataFrame,
    table: str = "geo_points_by_user",
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """One-time bucketed layout of a kernel-input points relation
    (user_id, event_id, ts_ms, lat, lng[, ...]).

    This is the write-once-analyze-many shape for the G1-G8 family:
    pay the user_id shuffle at layout time, then EVERY kernel pass
    (plus sessionization, history merges, per-user rollups — anything
    keyed on user_id) reads the buckets with zero hash Exchange. At
    100 TB the per-run saving is the full fact-table shuffle the
    reference re-pays in every job via hand repartition
    (StreamingAppNew.scala:30 ``HashPartitioner(60)``,
    SmartAddressBuildService.scala:92 ``repartition(400)``).

    Buckets are additionally sorted by (user_id) so read-side
    ``sortWithinPartitions(user_id)`` is a near-no-op merge.
    """
    save_bucketed(
        points, table, "user_id", n_buckets, sort_cols=("user_id",), path=path
    )
