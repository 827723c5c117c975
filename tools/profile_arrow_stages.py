"""Per-stage wall capture for the mixed Arrow/JVM doc pipelines.

Round-12 evidence for the stage-scoped Arrow width
(session.arrow_stage_width): runs a doc-family query at a big scale
point in ONE standard full-width session, then dumps the top stages
by executor time from the UI REST API, labeling each stage by its
dominant node. The claim to verify: the Arrow banding/gram stages run
at the capped width (concurrent tasks ≤ slots/2 — their solo-best
shape under the old session-halving knob) while the JVM hv-recompute
and join stages keep full width — i.e. a mixed pipeline no longer has
to pick which half to penalize.

Writes profile_arrow.json. Usage:

    python tools/profile_arrow_stages.py [query-substring] [sf10|sf100]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = {
    "sf10": os.path.join(ROOT, ".scale", "sf10"),
    "sf100": os.path.join(ROOT, ".scale", "sf100"),
}


def main(argv) -> None:
    from pulsar_spark_spark.plans import QUERIES
    from pulsar_spark_spark.session import get_session

    qname = next(
        (a for a in argv if not a.startswith("sf")), "doc_near_dup_pairs"
    )
    qname = next(n for n in QUERIES if qname in n)
    label = next((a for a in argv if a in SCALES), "sf100")
    sf_dir = SCALES[label]

    spark = get_session(
        app_name="arrow_stage_profile",
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _warm_python_workers

    _warm_python_workers(spark)
    t0 = time.time()
    n = QUERIES[qname](spark, sf_dir).count()
    wall = round(time.time() - t0, 1)
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
        "id"
    ]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    from datetime import datetime

    def _ts(v):
        if not v:
            return None
        return datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for s in sorted(
        stages, key=lambda s: -(s.get("executorRunTime") or 0)
    )[:10]:
        t_launch = _ts(s.get("firstTaskLaunchedTime"))
        t_done = _ts(s.get("completionTime"))
        rows.append(
            {
                "stageId": s["stageId"],
                # numTasks IS the concurrency bound for the width cap:
                # the Arrow stages should show arrow_stage_width tasks
                # (≤ slots/2), the JVM stages the full 2×-slots spread
                "numTasks": s.get("numTasks"),
                "executorRunTime_s": round(
                    (s.get("executorRunTime") or 0) / 1000, 1
                ),
                "stage_wall_s": (
                    round(t_done - t_launch, 1)
                    if t_launch and t_done
                    else None
                ),
                "name": (s.get("name") or "").split("\n")[0][:90],
            }
        )
    spark.stop()
    out = {
        "query": qname,
        "scale": label,
        "wall_sec": wall,
        "rows": int(n),
        "slots": 32,
        "top_stages": rows,
    }
    path = os.path.join(ROOT, "profile_arrow.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged[f"{qname}@{label}"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
