"""Partitioned-table loading + partition pruning.

At 100 TB the catalog tables are date-partitioned directories (the
reference partitions Cassandra by date strings, utils/DateUtils.scala:
5-6); sources/tables.py claims the same loader works unchanged and
that partition pruning falls out of filter expressions. These tests
pin that claim: a hive-layout ``events.parquet/date=YYYY-MM-DD/``
tree loads through ``load_table`` with timestamps normalized, a date
filter prunes partitions in the physical plan (PartitionFilters, not
a post-scan filter), and values survive the round trip.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from pulsar_spark_spark.sources.tables import load_table

_DATES = ["2024-01-01", "2024-01-02", "2024-01-03"]


def _write_partitioned_events(root) -> str:
    """events.parquet/date=<d>/part-0.parquet with NANOS timestamps —
    the hardest encoding — so partition layout and ts normalization
    are exercised together."""
    table_dir = root / "events.parquet"
    for i, d in enumerate(_DATES):
        part_dir = table_dir / f"date={d}"
        os.makedirs(part_dir)
        base = dt.datetime.fromisoformat(d + "T08:00:00")
        epoch = dt.datetime(1970, 1, 1)
        ns = [
            int((base - epoch).total_seconds() * 1e9) + k * 60_000_000_000
            for k in range(4)
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([i * 10 + k for k in range(4)], pa.int64()),
                    "user_id": pa.array([1, 2, 1, 2], pa.int64()),
                    "value": pa.array([float(k) for k in range(4)], pa.float64()),
                    "ts": pa.array(ns, pa.timestamp("ns")),
                }
            ),
            str(part_dir / "part-0.parquet"),
            version="2.6",
        )
    return str(table_dir)


def test_partitioned_table_loads_and_normalizes(spark, tmp_path):
    _write_partitioned_events(tmp_path)
    df = load_table(spark, "events", str(tmp_path))
    d = dict(df.dtypes)
    assert d["ts"] == "timestamp"  # NANOS normalized inside partitions
    assert "date" in d  # partition column surfaces
    assert df.count() == 12
    one = df.filter(F.col("date") == _DATES[1])
    rows = one.select("event_id").orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [10, 11, 12, 13]


def test_date_filter_becomes_partition_filter(spark, tmp_path):
    _write_partitioned_events(tmp_path)
    df = load_table(spark, "events", str(tmp_path)).filter(
        F.col("date") == _DATES[0]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the scan as a PartitionFilters entry —
    # partition pruning, not a read-everything-then-filter plan
    assert "PartitionFilters" in plan and "date" in plan.split("PartitionFilters", 1)[1][:200]
    # and only the matching partition's rows are read
    assert df.count() == 4
