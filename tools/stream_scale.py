"""Streaming throughput vs STATE CARDINALITY: sf0.1 → 10× → 100×.

The batch slope table (scale_slope.json) answers "does the plan stay
linear in rows"; this tool answers the streaming twin the 100 TB story
needs: does micro-batch throughput HOLD as the keyed state grows?
Users (= state-store keys for the sessionizer, the geofence machine
and the dedup-upsert sink) scale 1 500 → 15 000 → 150 000 across the
three points, and rows 100 k → 1 M → 10 M, while the batch COUNT per
stream stays fixed by construction (the benches split arrivals into a
constant number of files) — so rows/s across scales isolates per-row
state cost from trigger overhead. A flat-or-rising rows/s line means
the state path is O(rows), not O(state); HDFSBackedStateStore rewrites
every key per batch, so a falling line here would be the first sign
the RocksDB provider is needed at cluster scale.

Reuses bench.py's stream benches verbatim (same pipelines the driver
times at sf0.1) — one fresh session per (scale, stream), results into
``stream_scale.json`` (rendered into SCALE.md by scale_slope.py
--render-only).

Usage:  python tools/stream_scale.py [ingest|session|geofence ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf1", os.path.join(ROOT, ".scale", "sf1"), 10),
    ("sf10", os.path.join(ROOT, ".scale", "sf10"), 100),
    # 1000×: ingest only — at 10M rows the sessionizer (~100k rows/s)
    # and geofence machine (~46k rows/s) already fill most of the
    # benches' 600 s awaitTermination budget, so their 100M-row points
    # would time out by construction, not by state cost; the ingest
    # path (~670k rows/s at 100×) is the one with fourth-decade
    # headroom
    ("sf100", os.path.join(ROOT, ".scale", "sf100"), 1000),
]

STREAMS = ["ingest", "session", "geofence"]
SCALE_STREAMS = {"sf100": {"ingest"}}


def main(filters) -> None:
    import bench  # the driver-facing bench module, reused verbatim

    from pulsar_spark_spark.session import get_session

    which = [s for s in STREAMS if not filters or any(f in s for f in filters)]
    fns = {
        "ingest": bench._stream_ingest_bench,
        "session": bench._session_stream_bench,
        "geofence": bench._geofence_stream_bench,
    }
    out_path = os.path.join(ROOT, "stream_scale.json")
    rows = {}
    if os.path.exists(out_path):
        rows = json.load(open(out_path)).get("rows", {})
    for label, sf_dir, factor in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"{label}: {sf_dir} missing — generate with tools/gen_scale.py",
                  file=sys.stderr)
            continue
        for name in which:
            if label in SCALE_STREAMS and name not in SCALE_STREAMS[label]:
                continue
            bench.SF_DIR = sf_dir
            spark = get_session(
                app_name=f"stream_scale_{name}_{label}",
                master=f"local[{CPUS}]",
            )
            try:
                t0 = time.time()
                r = fns[name](spark)
                r["capture_wall_sec"] = round(time.time() - t0, 1)
            finally:
                spark.stop()
            r["scale"] = label
            r["factor"] = factor
            rows.setdefault(name, {})[label] = r
            print(
                f"{name:<10} {label:<6} rows={r.get('rows', 0):>12,} "
                f"rows/s={r.get('rows_per_sec', 0):>8,} "
                f"batches={r.get('n_batches', '?')}",
                flush=True,
            )
    with open(out_path, "w") as f:
        json.dump({"cpus": CPUS, "rows": rows}, f, indent=1, sort_keys=True)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
