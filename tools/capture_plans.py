"""Capture ``explain("formatted")`` for registered queries into
``plans/<round dir>/<query>_<tag>.txt`` (dir from $SPARK_GRAFT_PLAN_DIR, default r15; tag = before/after) — the per-round
optimization evidence files. Queries whose registered form hides the
expensive stage behind a lazy localCheckpoint (kernels'
``_sorted_out``) show ``Scan ExistingRDD`` above the checkpoint — for
those, the stage structure is audited at the operator level in
tests/test_plans.py; the captured file still shows the final-stage
plan shape and any change to it.

Usage: python tools/capture_plans.py <tag> [query ...]
       (no query args = every registered query)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_spark_spark.plans import QUERIES  # noqa: E402
from pulsar_spark_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15")
)


def _formatted(df) -> str:
    qe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or sorted(QUERIES)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session(
        app_name="plan_capture", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} ({tag})\n")
            f.write(_formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
