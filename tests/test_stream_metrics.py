"""Metrics-subsystem analog (streaming/metrics.py): the progress-feed
collector must reproduce the reference's consumer-metric totals for a
real micro-batch run."""

from __future__ import annotations

import time

from pulsar_spark_spark.sources.tables import load_table
from pulsar_spark_spark.streaming.metrics import attach_metrics, detach_metrics
from pulsar_spark_spark.streaming.pipeline import run_dedup_upsert_stream, stream_events
from tests.conftest import SF_DIR_SMALL


def _wait_until(pred, timeout_s: float = 30.0) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.25)
    return pred()


def test_metrics_listener_collects_batch_totals(spark, tmp_path):
    ev = load_table(spark, "events", SF_DIR_SMALL)
    n_rows = ev.count()
    input_dir = str(tmp_path / "incoming")
    ev.repartition(2).write.parquet(input_dir)  # 2 files → ≥2 micro-batches
    schema = spark.read.parquet(input_dir).schema

    listener = attach_metrics(spark)
    try:
        q = run_dedup_upsert_stream(
            stream_events(spark, input_dir, schema, max_files_per_trigger=1),
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        assert not q.isActive

        # listener callbacks arrive async on the listener-bus thread
        assert _wait_until(lambda: listener.total_input_rows() >= n_rows), (
            f"collected {listener.total_input_rows()} of {n_rows} rows"
        )
        snap = listener.snapshot()
        (qid,) = [k for k, v in snap.items() if v["sources"]]
        qm = snap[qid]
        # totalMsgsReceived analog: every input row accounted, across
        # >= 2 batches (maxFilesPerTrigger=1 over 2 files)
        assert sum(s["totalMsgsReceived"] for s in qm["sources"].values()) == n_rows
        assert qm["nBatches"] >= 2
        # consumerRuntime analog accumulates real batch durations
        assert qm["consumerRuntimeMs"] > 0
        # per-source attribution carries the directory (topic analog)
        assert any("incoming" in d for d in qm["sources"])
        # clean termination is not a failure
        assert _wait_until(lambda: listener.snapshot()[qid]["terminated"])
        assert listener.snapshot()[qid]["totalReceiveFailed"] == 0
        # maxReceiveRate observed something positive
        assert all(
            s["maxReceiveRate"] >= 0 for s in qm["sources"].values()
        )
    finally:
        detach_metrics(spark, listener)


def test_metrics_listener_detach_stops_collection(spark, tmp_path):
    ev = load_table(spark, "events", SF_DIR_SMALL).limit(100)
    input_dir = str(tmp_path / "in2")
    ev.coalesce(1).write.parquet(input_dir)
    schema = spark.read.parquet(input_dir).schema

    listener = attach_metrics(spark)
    detach_metrics(spark, listener)
    q = (
        stream_events(spark, input_dir, schema)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    time.sleep(1.0)
    assert listener.total_input_rows() == 0
