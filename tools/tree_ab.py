"""Interleaved cross-tree A/B of registered queries (fresh JVM per run).

The round-13/14 lesson: this host's multicore throughput swings
±15-20% between minutes, so cross-capture deltas lie. The only
trustworthy comparison is interleaved: tree A, tree B, tree A, ... in
alternating fresh JVMs, minutes apart at most, then per-query min per
arm.

Each child replicates the driver bench's per-query conditions: one
q1 warmup + python-worker warmup, then for each requested query
min-of-2 back-to-back collect() passes with clearCache between.

Usage:
  python tools/tree_ab.py --trees <rootA> <rootB> --queries q1,q2 \
      [--rounds 3] [--out tree_ab.json]
  python tools/tree_ab.py --child <root> --queries q1,q2   # one JVM
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def child(root: str, queries: list[str]) -> None:
    sys.path.insert(0, root)
    os.chdir(root)
    from pulsar_spark_spark.plans import QUERIES
    from pulsar_spark_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="tree_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    import bench

    bench._warm_python_workers(spark)
    sink = os.environ.get("TREE_AB_SINK", "collect")
    out: dict[str, float] = {}
    for name in queries:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if sink == "noop":
                # scale corpora: a full collect would bottleneck on (or
                # OOM) the driver; the noop sink computes every column
                # of every row (guide §1.4)
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            sec = round(time.perf_counter() - t0, 3)
            best = sec if best is None or sec < best else best
            spark.catalog.clearCache()
        out[name] = best
    spark.stop()
    print("CHILD_JSON " + json.dumps(out))


def run_child(root: str, queries: list[str]) -> dict:
    p = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            root,
            "--queries",
            ",".join(queries),
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    raise RuntimeError(
        f"child at {root} failed rc={p.returncode}\n"
        f"stdout: {p.stdout[-2000:]}\nstderr: {p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child")
    ap.add_argument("--trees", nargs=2)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--labels", nargs=2, default=["A", "B"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    queries = args.queries.split(",")
    if args.child:
        child(args.child, queries)
        return
    ra, rb = (os.path.abspath(t) for t in args.trees)
    la, lb = args.labels
    runs: list[dict] = []
    for r in range(args.rounds):
        order = [(la, ra), (lb, rb)] if r % 2 == 0 else [(lb, rb), (la, ra)]
        for label, root in order:
            res = run_child(root, queries)
            runs.append({"label": label, "round": r, "timings": res})
            print(json.dumps(runs[-1]), flush=True)
    summary = {}
    for q in queries:
        per = {
            lbl: [
                x["timings"][q]
                for x in runs
                if x["label"] == lbl and q in x["timings"]
            ]
            for lbl in (la, lb)
        }
        mins = {lbl: min(v) if v else None for lbl, v in per.items()}
        summary[q] = {
            f"{la}_all": per[la],
            f"{lb}_all": per[lb],
            f"{la}_min": mins[la],
            f"{lb}_min": mins[lb],
            "a_over_b": (
                round(mins[la] / mins[lb], 3)
                if mins[la] and mins[lb]
                else None
            ),
        }
    result = {
        "method": (
            "interleaved fresh-JVM per-tree runs, alternating order per "
            "round; per child: q1+python-worker warmup then min-of-2 "
            "back-to-back collect() per query (the bench's per-query "
            "conditions); per-arm min over rounds"
        ),
        "trees": {la: ra, lb: rb},
        "rounds": args.rounds,
        "runs": runs,
        "summary": summary,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps({"summary": summary}, indent=2))


if __name__ == "__main__":
    main()
