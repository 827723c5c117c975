"""Interleaved A/B of the probe-serving bench family: r11 tree vs HEAD.

Settles VERDICT r12 "What's wrong #1" (lsh_probe_index read x1.26 and
ivf_probe_index x1.21 slower in BENCH_r12 vs BENCH_r11 at a FASTER
calibration, with no round-12 code on the probe path): one subprocess
per (tree, round) so each measurement is a fresh JVM; rounds
alternate trees so host drift hits both arms equally; each subprocess
replays the bench's own measurement verbatim (bench._ivf_probe_bench /
_lsh_probe_bench: fresh untimed build into a tempdir, then ONE timed
probe — the bench row is that single cold-position probe) twice, so
the artifact shows both the bench-faithful first probe and the
within-JVM repeat. Requires a round-11 worktree:
``git worktree add /tmp/r11tree 2c4c1d8``.

Result (committed in probe_ab.json): see that file's "conclusion".
"""
import json
import subprocess
import sys

RUNNER = r"""
import sys, time, json, os
root = sys.argv[1]
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, root)
from pulsar_spark_spark.session import get_session
from pulsar_spark_spark.plans import QUERIES
spark = get_session()
spark.sparkContext.setLogLevel("ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", root + "/bench.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m._warm_python_workers(spark)
QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.1").collect()
out = {"root": root}
for name, fn in (("ivf", m._ivf_probe_bench), ("lsh", m._lsh_probe_bench)):
    walls = []
    for _ in range(2):
        probe_sec, _detail = fn(spark)
        walls.append(probe_sec)
    out[name] = walls
print(json.dumps(out))
spark.stop()
"""

trees = {"r11": "/tmp/r11tree", "head": "/root/repo"}
results = {k: [] for k in trees}
for rnd in range(3):
    for name in ("r11", "head") if rnd % 2 == 0 else ("head", "r11"):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER, trees[name]],
            capture_output=True, text=True, timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(name, "FAILED", out.stderr[-2000:])
            sys.exit(1)
        rec = json.loads(line[-1])
        results[name].append(rec)
        print(name, {k: rec[k] for k in ("ivf", "lsh")}, flush=True)

summary = {}
for fam in ("ivf", "lsh"):
    summary[fam] = {
        k: {
            "first_probes": [r[fam][0] for r in v],
            "all": [w for r in v for w in r[fam]],
            "best_first": min(r[fam][0] for r in v),
            "best": min(w for r in v for w in r[fam]),
        }
        for k, v in results.items()
    }
print(json.dumps({"summary": summary, "all": results}))
