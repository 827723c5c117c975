"""Round-trip tests for the write paths (K1 keyed upsert, K2 CSV)."""

from __future__ import annotations

import csv
import os

import pyspark.sql.functions as F

from pulsar_spark_spark.sources.sinks import (
    read_upsert_table,
    upsert_parquet,
    write_csv_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, version bigint")


def test_upsert_insert_then_update(spark, tmp_path):
    path = str(tmp_path / "state")
    upsert_parquet(_df(spark, [(1, "a", 1), (2, "b", 1)]), path, ["k"], "version")
    upsert_parquet(_df(spark, [(2, "b2", 2), (3, "c", 2)]), path, ["k"], "version")
    got = {
        r["k"]: (r["v"], r["version"])
        for r in read_upsert_table(spark, path).collect()
    }
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 2)}


def test_upsert_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "state")
    batch = _df(spark, [(1, "a", 5), (2, "b", 5)])
    upsert_parquet(batch, path, ["k"], "version")
    before = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    upsert_parquet(batch, path, ["k"], "version")  # replayed micro-batch
    after = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    assert before == after


def test_upsert_stale_version_loses(spark, tmp_path):
    path = str(tmp_path / "state")
    upsert_parquet(_df(spark, [(1, "new", 9)]), path, ["k"], "version")
    upsert_parquet(_df(spark, [(1, "stale", 3)]), path, ["k"], "version")
    got = read_upsert_table(spark, path).collect()
    assert len(got) == 1 and got[0]["v"] == "new" and got[0]["version"] == 9


def test_csv_report_roundtrip(spark, tmp_path):
    path = str(tmp_path / "report.csv")
    df = (
        spark.range(10)
        .withColumn("bucket", (F.col("id") % 3).cast("string"))
        .groupBy("bucket")
        .count()
        .orderBy("bucket")
    )
    out = write_csv_report(df, path)
    assert out == path and os.path.exists(path)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [(r["bucket"], r["count"]) for r in rows] == [
        ("0", "4"), ("1", "3"), ("2", "3"),
    ]
