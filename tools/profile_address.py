"""Decompose smart_address_candidates' big-scale wall, stage by stage.

Round-13 verdict item 6: the query's 1000× cell is the steepest
committed slope (×86.1 for ×1000 data — sublinear, but not yet
attributed the way the doc family and the merge walls were). Same
methodology as tools/profile_merge.py: fresh session per (scale),
cluster shuffle profile, COLD single pass per stage with
clearCache between, scratch-deletion wait between sessions.

Stages (the plan's own seams — plans/address.py):
  scan_gate       documents scan + salted-geo projection + tokenize +
                  P4 validity gate (NO gram explode; map-only)
  gram_explode    + the word 2-/3-gram explode + md5 per gram — the
                  corpus-proportional row blowup (~200 gram rows/doc),
                  counted WITHOUT the checkpoint write
  gram_ckpt       the registered plan's materialize() of that
                  relation (DISK_ONLY checkpoint write + read-back) —
                  the pay-once price of its three consumers
  hot_agg         posting-list document frequencies over the lookup
                  side + the >cap hot-gram set (one narrow shuffle)
  pair_agg        probe ⋈ pruned postings on the gram hash + the
                  (query_doc, cand_doc) shared-gram aggregate, served
                  from an already-materialized gram relation — the
                  quadratic-term stage in isolation
  full            the registered query end-to-end

Writes profile_address.json.

Usage:  python tools/profile_address.py [sf10] [sf100]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql.functions import col  # noqa: E402

from pulsar_spark_spark.operators.checkpoint import materialize  # noqa: E402
from pulsar_spark_spark.plans import QUERIES  # noqa: E402
from pulsar_spark_spark.plans.address import (  # noqa: E402
    _ACCURACY_CEILING,
    _BBOX,
    _MAX_GRAM_DF,
    _MIN_SHARED,
    _addr_geo,
    _grams_hashed,
)
from pulsar_spark_spark.functions.text import tokens  # noqa: E402
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


def _stages(spark, sf_dir, out):
    valid = (
        col("lat").between(_BBOX[0], _BBOX[2])
        & col("lng").between(_BBOX[1], _BBOX[3])
        & (col("accuracy") < _ACCURACY_CEILING)
        & col("is_verified")
    )
    is_probe = col("doc_id") % 10 == 0

    def gated():
        return (
            _addr_geo(load_table(spark, "documents", sf_dir))
            .withColumn("toks", tokens(col("text")))
            .withColumn("valid", valid)
            .filter(is_probe | col("valid"))
        )

    _timed(spark, "scan_gate", gated, out)

    def exploded():
        return gated().select(
            "doc_id", "valid", F.explode(_grams_hashed()).alias("g")
        )

    _timed(spark, "gram_explode", exploded, out)
    _timed(spark, "gram_ckpt", lambda: materialize(exploded(), spill=True), out)

    # downstream stages read a PRE-materialized gram relation (built
    # once here, untimed relative to the stage rows) so each stage
    # isolates its own shuffle, not the explode
    grams = materialize(exploded(), spill=True)
    lookup = grams.filter(~is_probe & col("valid")).select("doc_id", "g")

    def hot():
        return (
            lookup.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(col("df") > _MAX_GRAM_DF)
            .select("g")
        )

    _timed(spark, "hot_agg", hot, out)

    def pair_agg():
        h = hot()
        pruned = lookup.join(F.broadcast(h), "g", "left_anti")
        probe = (
            grams.filter(is_probe)
            .select(col("doc_id").alias("query_doc"), "g")
            .join(F.broadcast(h), "g", "left_anti")
        )
        return (
            probe.join(pruned, "g")
            .groupBy("query_doc", col("doc_id").alias("cand_doc"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(col("n_shared") >= _MIN_SHARED)
        )

    _timed(spark, "pair_agg", pair_agg, out)
    _timed(
        spark,
        "full",
        lambda: QUERIES["smart_address_candidates"](spark, sf_dir),
        out,
    )


def main(argv):
    labels = [a for a in argv if a in SCALES] or ["sf10", "sf100"]
    sidecar = os.path.join(ROOT, "profile_address.json")
    results = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            results = json.load(f).get("profiles", {})
    from bench import _warm_python_workers

    for label in labels:
        sf_dir, factor = SCALES[label]
        if not os.path.isdir(sf_dir):
            print(f"skip {label}: {sf_dir} missing")
            continue
        print(f"smart_address_candidates @ {label} ({factor}x)")
        spark = _session()
        _warm_python_workers(spark)
        out = {}
        _stages(spark, sf_dir, out)
        results.setdefault("smart_address_candidates", {})[label] = out
        spark.stop()
        deadline = time.time() + 300
        while glob.glob("/tmp/blockmgr-*") and time.time() < deadline:
            time.sleep(2)
    with open(sidecar, "w") as f:
        json.dump({"profiles": results}, f, indent=2)
    print(f"wrote {sidecar}")


if __name__ == "__main__":
    main(sys.argv[1:])
