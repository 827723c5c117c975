"""Decompose geotag_history_merge / user_sessions walls at scale.

Round-12 verdict item 1: geotag_history_merge's last decade measured
×11.6 (5.6 → 65.1 s for ×10 rows) and user_sessions ×10.1 — the only
non-corpus rows clearly at/above linear. This tool answers WHERE the
wall lives, stage by stage, the way profile_neardup.py decomposed the
text family:

geotag_history_merge stages
  scan_union      projection + union only (map work, no shuffle)
  dedup_window    + the (user_id,lat,lng,accuracy) row_number window
                  (full-corpus shuffle + sort on 4 keys)
  dedup_groupby   the map-side-combinable alternative:
                  groupBy(key).agg(min(struct(ts,event_id)))
                  (partial agg collapses the engineered ≤75 distinct
                  triples/user BEFORE the shuffle)
  full            the registered query (dedup window + cap window)
  full_candidate  groupBy dedup + cap window on the collapsed rows

user_sessions stages
  scan            projection only
  session_agg     + native session_window aggregation (the one
                  shuffle)
  full            the registered query (+ tiny per-user numbering)

Methodology matches tools/scale_slope.py's big-scale cells: fresh
session per (query, scale) under the cluster shuffle profile, COLD
single pass per stage (clearCache between stages), scratch-deletion
wait between sessions. Writes profile_merge.json.

Usage:  python tools/profile_merge.py [sf10] [sf100]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pulsar_spark_spark.plans import QUERIES  # noqa: E402
from pulsar_spark_spark.plans.geo import _geotag_points  # noqa: E402
from pulsar_spark_spark.session import get_session  # noqa: E402
from pulsar_spark_spark.sources.tables import load_table  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = {
    "sf10": (os.path.join(ROOT, ".scale", "sf10"), 100),
    "sf100": (os.path.join(ROOT, ".scale", "sf100"), 1000),
}


def _session():
    return get_session(
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256"
        }
    )


def _timed(spark, label, df_thunk, out, runs=1):
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        n = df_thunk().count()
        best = min(best, time.time() - t0)
    out[label] = {"sec": round(best, 3), "rows": int(n)}
    print(f"  {label:16s} {best:8.2f}s  ({n:,} rows)")


def _geotag_stages(spark, sf_dir, out):
    pts = _geotag_points(spark, sf_dir)
    _timed(spark, "scan_union", lambda: pts, out)
    w_dup = Window.partitionBy("user_id", "lat", "lng", "accuracy").orderBy(
        "ts", "event_id"
    )
    _timed(
        spark,
        "dedup_window",
        lambda: pts.withColumn("dup_rn", F.row_number().over(w_dup)).filter(
            F.col("dup_rn") == 1
        ),
        out,
    )
    _timed(
        spark,
        "dedup_groupby",
        lambda: pts.groupBy("user_id", "lat", "lng", "accuracy").agg(
            F.min(F.struct("ts", "event_id")).alias("__first")
        ),
        out,
    )
    _timed(
        spark,
        "full",
        lambda: QUERIES["geotag_history_merge"](spark, sf_dir),
        out,
    )
    w_cap = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def _candidate():
        dedup = (
            pts.groupBy("user_id", "lat", "lng", "accuracy")
            .agg(F.min(F.struct("ts", "event_id")).alias("__first"))
            .select(
                "user_id",
                F.col("__first.event_id").alias("event_id"),
                F.col("__first.ts").alias("ts"),
                "lat",
                "lng",
                "accuracy",
            )
        )
        return (
            dedup.withColumn("cap_rn", F.row_number().over(w_cap))
            .filter(F.col("cap_rn") <= 100)
            .select("user_id", "event_id", "ts", "lat", "lng", "accuracy")
        )

    _timed(spark, "full_candidate", _candidate, out)


def _sessions_stages(spark, sf_dir, out):
    ev = load_table(spark, "events", sf_dir)
    proj = ev.select("user_id", "ts", "event_id", "value")
    _timed(spark, "scan", lambda: proj, out)
    _timed(
        spark,
        "session_agg",
        lambda: ev.groupBy(
            "user_id", F.session_window("ts", "1800 seconds")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        ),
        out,
    )
    _timed(spark, "full", lambda: QUERIES["user_sessions"](spark, sf_dir), out)


def main(argv):
    labels = [a for a in argv if a in SCALES] or ["sf10", "sf100"]
    sidecar = os.path.join(ROOT, "profile_merge.json")
    results = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            results = json.load(f).get("profiles", {})
    from bench import _warm_python_workers

    for qname, stages in (
        ("geotag_history_merge", _geotag_stages),
        ("user_sessions", _sessions_stages),
    ):
        for label in labels:
            sf_dir, factor = SCALES[label]
            if not os.path.isdir(sf_dir):
                print(f"skip {label}: {sf_dir} missing")
                continue
            print(f"{qname} @ {label} ({factor}x)")
            spark = _session()
            _warm_python_workers(spark)
            out = {}
            stages(spark, sf_dir, out)
            results.setdefault(qname, {})[label] = out
            spark.stop()
            deadline = time.time() + 300
            while glob.glob("/tmp/blockmgr-*") and time.time() < deadline:
                time.sleep(2)
    with open(sidecar, "w") as f:
        json.dump({"profiles": results}, f, indent=2)
    print(f"wrote {sidecar}")


if __name__ == "__main__":
    main(sys.argv[1:])
