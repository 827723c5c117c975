"""Interleaved FIFO-vs-FAIR A/B over the six streaming bench rows.

Round 15 (r14 VERDICT wrong #1): every streaming throughput row ran at
~x0.5 of its round-13 rate across a window whose one every-session
change was the global `spark.scheduler.mode=FAIR` default
(session.py, commit cb340a8). The builder's fair_pool_ab.json measured
FAIR's isolation BENEFIT under a background hog but never its COST on
an uncontended streaming bench — this tool measures exactly that:
alternating fresh-JVM child runs of the bench's own streaming
functions (`bench._stream_ingest_bench`, `_session_stream_bench` both
arms, `_geotag_rescore_bench`, `_geofence_stream_bench`) with the
scheduler mode as the ONLY difference between arms.

Usage:
  python tools/stream_sched_ab.py --child <fifo|fair>   # one arm, one JVM
  python tools/stream_sched_ab.py [--rounds N] [--out stream_sched_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = (
    "ingest_rows_per_sec",
    "session_rows_per_sec",
    "session_native_rows_per_sec",
    "rescore_rows_per_sec",
    "rescore_bucketed_rows_per_sec",
    "geofence_rows_per_sec",
)


def child(mode: str, root: "str | None" = None) -> None:
    if root:
        # cross-tree arm: run THAT tree's bench/session code (mode
        # "default" keeps the tree's own scheduler default)
        sys.path.insert(0, root)
        os.chdir(root)
    import bench
    from pulsar_spark_spark.session import get_session

    if mode == "fair":
        from pulsar_spark_spark.session import _fair_pools_file

        extra = {
            "spark.scheduler.mode": "FAIR",
            "spark.scheduler.allocation.file": _fair_pools_file(),
        }
    elif mode == "fifo":
        extra = {"spark.scheduler.mode": "FIFO"}
    else:
        extra = {}
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name=f"stream_sched_ab_{mode}",
        master=f"local[{cpus}]",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("fifo", "fair"):
        assert spark.conf.get("spark.scheduler.mode").upper() == mode.upper()
    bench._warm_python_workers(spark)

    out: dict[str, object] = {"mode": mode}
    ingest = bench._stream_ingest_bench(spark)
    out["ingest_rows_per_sec"] = ingest.get("rows_per_sec")
    prior = os.environ.get("SPARK_GRAFT_SESSIONIZER")
    try:
        os.environ["SPARK_GRAFT_SESSIONIZER"] = "python"
        out["session_rows_per_sec"] = bench._session_stream_bench(spark).get(
            "rows_per_sec"
        )
        os.environ["SPARK_GRAFT_SESSIONIZER"] = "native"
        out["session_native_rows_per_sec"] = bench._session_stream_bench(
            spark
        ).get("rows_per_sec")
    finally:
        if prior is None:
            os.environ.pop("SPARK_GRAFT_SESSIONIZER", None)
        else:
            os.environ["SPARK_GRAFT_SESSIONIZER"] = prior
    rescore = bench._geotag_rescore_bench(spark)
    out["rescore_rows_per_sec"] = rescore.get("rows_per_sec")
    out["rescore_bucketed_rows_per_sec"] = rescore.get(
        "bucketed_state_rows_per_sec"
    )
    out["geofence_rows_per_sec"] = bench._geofence_stream_bench(spark).get(
        "rows_per_sec"
    )
    spark.stop()
    print("CHILD_JSON " + json.dumps(out))


def run_child(mode: str, root: "str | None" = None) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", mode]
    if root:
        cmd += ["--root", root]
    p = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=root or REPO,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    raise RuntimeError(
        f"child {mode} produced no result; rc={p.returncode}\n"
        f"stdout tail: {p.stdout[-2000:]}\nstderr tail: {p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=("fifo", "fair", "default"))
    ap.add_argument("--root", default=None)
    ap.add_argument(
        "--trees",
        nargs=2,
        default=None,
        help="cross-tree mode: two repo roots, each run at its own "
        "session default ('r13tree headtree')",
    )
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "stream_sched_ab.json")
    )
    args = ap.parse_args()
    if args.child:
        child(args.child, args.root)
        return

    if args.trees:
        ra, rb = (os.path.abspath(t) for t in args.trees)
        arms = [("treeA", "default", ra), ("treeB", "default", rb)]
        method = (
            "interleaved fresh-JVM cross-tree runs of each tree's own "
            "bench streaming functions at its own session defaults; "
            "best-of-rounds per arm; arm order alternates per round"
        )
    else:
        arms = [("fifo", "fifo", None), ("fair", "fair", None)]
        method = (
            "interleaved fresh-JVM child runs of bench.py's streaming "
            "functions; scheduler mode is the only arm difference; "
            "best-of-rounds per arm; arm order alternates per round"
        )
    la, lb = arms[0][0], arms[1][0]
    runs: list[dict] = []
    for r in range(args.rounds):
        # alternate which arm goes first so slot-in-time bias cancels
        order = arms if r % 2 == 0 else arms[::-1]
        for label, mode, root in order:
            res = run_child(mode, root)
            res["round"] = r
            res["label"] = label
            runs.append(res)
            print(json.dumps(res), flush=True)

    summary: dict[str, dict] = {}
    for row in ROWS:
        per = {
            m: [x[row] for x in runs if x["label"] == m and x.get(row)]
            for m in (la, lb)
        }
        best = {m: max(v) if v else None for m, v in per.items()}
        summary[row] = {
            f"{la}_all": per[la],
            f"{lb}_all": per[lb],
            f"{la}_best": best[la],
            f"{lb}_best": best[lb],
            f"{la}_over_{lb}": (
                round(best[la] / best[lb], 3)
                if best[la] and best[lb]
                else None
            ),
        }
    result = {
        "method": method,
        "trees": {a[0]: a[2] for a in arms} if args.trees else None,
        "rounds": args.rounds,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "runs": runs,
        "summary": summary,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"summary": summary}, indent=2))


if __name__ == "__main__":
    main()
