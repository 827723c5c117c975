"""Write paths: keyed upsert sink (K1), CSV report writer (K2).

The reference's Cassandra writes are primary-key UPSERTS
(``saveToCassandra`` — service/KafkaStreamingService.scala:47,
GeoTagOptimizedService.scala:82-83): writing a row with an existing
key replaces it. The Spark-native equivalent without a table format
dependency is a partitioned-parquet read-merge-write: new rows win
over stored rows per key (argmax by a version column), rewritten
atomically via a temp directory swap. On a real deployment this is a
one-line swap to ``MERGE INTO`` on Delta/Iceberg — the call-site
contract (idempotent keyed upsert) is identical, which is what the
streaming layer's exactly-once story relies on (checkpoint + replayed
micro-batch ⇒ same state).

The CSV report writer mirrors AccuracyAnalysis.scala:148-166 /
GoodData.scala:140-147, which collect() to the driver and hand-write
rows with opencsv. Here: ``coalesce(1).write.csv`` — single output
file for report consumers, computed distributed, never collected.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col


def upsert_parquet(
    new_rows: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
) -> None:
    """Keyed upsert into a parquet directory (K1 analog).

    Merge discipline: per key keep the single row with the highest
    (version_col, is_new) — new rows win ties, so replaying the same
    micro-batch is idempotent (T3's commit-after-write guarantee
    becomes "replay is harmless").
    """
    spark = new_rows.sparkSession
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    new_tagged = new_rows.withColumn("__is_new", F.lit(1))
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = existing.withColumn("__is_new", F.lit(0)).unionByName(new_tagged)
    else:
        merged = new_tagged
    w = Window.partitionBy(*key_cols).orderBy(
        col(version_col).desc(), col("__is_new").desc()
    )
    winner = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(col("__rn") == 1)
        .drop("__rn", "__is_new")
    )
    tmp = f"{path}.__tmp_{uuid.uuid4().hex}"
    winner.write.mode("overwrite").parquet(tmp)
    # Atomic-ish swap: the reader never sees a half-written directory.
    old = f"{path}.__old_{uuid.uuid4().hex}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def read_upsert_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back a keyed upsert table."""
    return spark.read.parquet(path)


def write_csv_report(df: DataFrame, path: str, header: bool = True) -> str:
    """Single-file CSV report (K2 analog). Returns the csv file path.

    ``coalesce(1)`` only collapses the FINAL write stage — upstream
    aggregation still runs distributed, unlike the reference's
    driver-side collect()+opencsv loop.
    """
    tmp = f"{path}.__tmp_{uuid.uuid4().hex}"
    df.coalesce(1).write.mode("overwrite").option("header", str(header).lower()).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def dump_blobs(df: DataFrame, out_dir: str, id_col: str, payload_col: str) -> int:
    """Per-row binary dump (K4 analog of batch/ImageDump.scala:17-49).

    Writes each row's payload as ``<id>.bin`` under ``out_dir`` from
    the executors via ``foreachPartition`` — distributed, no driver
    collect (the reference's version also wrote per-row from a
    ``foreach``). Returns the number of files written.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            payload = row[payload_col]
            if payload is None:
                continue
            with open(os.path.join(out_dir, f"{row[id_col]}.bin"), "wb") as f:
                f.write(bytes(payload))

    df.select(id_col, payload_col).foreachPartition(write_partition)
    return len([f for f in os.listdir(out_dir) if f.endswith(".bin")])
