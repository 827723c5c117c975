"""Interleaved A/B of doc_dedup_clusters at sf0.1: r9 tree vs HEAD.

Settles VERDICT r10 "What's wrong #2" (doc_dedup_clusters read
x1.21 calibration-normalized slower in BENCH_r10 vs BENCH_r09): one
subprocess per (tree, round) so each measurement is a fresh JVM;
rounds alternate trees so host drift hits both arms equally. Requires
a round-9 worktree: ``git worktree add /tmp/r9tree 2a3d671``.
Result (committed in dedup_ab.json): HEAD best 4.362 s vs r9 best
4.956 s — the r10 plan is FASTER at matched conditions; the bench
delta was environment.
"""
import json
import subprocess
import sys

RUNNER = r"""
import sys, time, json
root = sys.argv[1]
sys.path.insert(0, root)
from pulsar_spark_spark.session import get_session
from pulsar_spark_spark.plans import QUERIES
spark = get_session()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, root)
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", root + "/bench.py")
# bench imports at module scope run argv parsing? no - it has main guard.
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m._warm_python_workers(spark)
QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").collect()
walls = []
for _ in range(3):
    t0 = time.perf_counter()
    QUERIES["doc_dedup_clusters"](spark, "/root/testdata/sf0.1").collect()
    walls.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"root": root, "walls": walls, "best": min(walls)}))
spark.stop()
"""

trees = {"r9": "/tmp/r9tree", "head": "/root/repo"}
results = {k: [] for k in trees}
for rnd in range(3):
    for name in ("r9", "head") if rnd % 2 == 0 else ("head", "r9"):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, trees[name]],
            capture_output=True, text=True, timeout=600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(name, "FAILED", out.stderr[-2000:])
            sys.exit(1)
        rec = json.loads(line[-1])
        results[name].append(rec)
        print(name, rec["walls"], flush=True)
best = {k: min(r["best"] for r in v) for k, v in results.items()}
print(json.dumps({"best": best, "all": results}))
