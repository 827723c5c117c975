"""Positional A/B for the geotag-rescore stream (round-10 verdict
item: rescore measured 17.4k rows/s in round 9 vs 21.4k in round 7,
with the same-session plain-vs-bucketed A/B showing the two arms equal
— so the residual had to be either session history or capture drift).

The plain rescore path is CODE-IDENTICAL between rounds 7 and 9/10
(verified by `git diff r7..HEAD` over streaming/pipeline.py,
operators/grouped.py, sources/sinks.py: the only addition on the
plain arm is a `_bucketed_now()` call that returns False immediately
when state_table is None; the bench driver for the plain pass is
byte-identical). So the A/B here is POSITIONAL, not code-vs-code:

- N back-to-back rescore benches in a FRESH session (bench profile,
  workers warmed) — the "early" arm;
- the same bench again after a heavy-query prelude that mimics the
  real bench.py position (~40 queries deep) — the "late" arm.

If early ≈ late ≈ round 7's number, the round-9 dip was capture
drift (the calibration-row class of noise). If late < early, the
session accumulates something (listener state, checkpoint blocks, GC
debt) worth hunting. Results land in rescore_ab.json; bench.py's
ab_note quotes the conclusion.

Usage: python tools/rescore_ab.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_spark_spark.session import get_session  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import bench
    from bench import _geotag_rescore_bench, _warm_python_workers
    from pulsar_spark_spark.plans import QUERIES

    spark = get_session(app_name="rescore_ab")
    _warm_python_workers(spark)

    early = []
    for _ in range(3):
        r = _geotag_rescore_bench(spark)
        early.append(r["rows_per_sec"])
        print(f"early pass: {r['rows_per_sec']} rows/s "
              f"(bucketed {r.get('bucketed_state_rows_per_sec')})",
              flush=True)

    # heavy prelude — the queries that precede the streaming section
    # in bench.py, one pass each (position simulation, untimed)
    prelude = [
        "doc_dedup_clusters", "doc_near_dup_pairs",
        "embedding_dedup_clusters", "delivery_refined_history",
        "delivery_refinement", "best_latlng_per_user",
        "doc_winnow_fingerprints", "doc_ngram_jaccard",
    ]
    for name in prelude:
        QUERIES[name](spark, bench.SF_DIR).count()

    late = []
    for _ in range(2):
        r = _geotag_rescore_bench(spark)
        late.append(r["rows_per_sec"])
        print(f"late pass:  {r['rows_per_sec']} rows/s", flush=True)

    out = {
        "early_rows_per_sec": early,
        "late_rows_per_sec": late,
        "r7_reference": 21400,
        "r9_reference": 17400,
        "method": (
            "same session, bench profile, 3 early + heavy-query "
            "prelude + 2 late passes; plain arm, code-identical to "
            "round 7 (see module docstring)"
        ),
    }
    with open(os.path.join(ROOT, "rescore_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
