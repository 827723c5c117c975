"""Local replica of the driver's correctness gate.

Runs each registered query at sf=0.01 on Spark AND its DuckDB oracle
SQL, then compares row count, sorted column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple — the driver's documented compare).

Usage:
    python tools/check_correctness.py                    # all queries
    python tools/check_correctness.py q1 ann_topk        # substring filter
    python tools/check_correctness.py --sf sf0.001 ...   # other scale
    (or SPARK_GRAFT_CHECK_SF=/path/to/sf_dir)
"""

from __future__ import annotations

import decimal
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pulsar_spark_spark.plans import ORACLES, QUERIES  # noqa: E402
from pulsar_spark_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(filters):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    spark = get_session()
    # Fail loudly on fixture schema drift BEFORE comparing values —
    # the round-3 failure class (sources/contracts.py).
    from pulsar_spark_spark.sources.contracts import assert_fixture_contract

    assert_fixture_contract(spark, SF_DIR)
    results = {}
    for name, fn in QUERIES.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        rec = {"err": None}
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                rec.update(
                    rows_match=None, err="no_oracle", spark_rows=len(srows)
                )
            else:
                ores = con.execute(ORACLES[name])
                ocols = [d[0] for d in ores.description]
                orows = ores.fetchall()
                rec.update(
                    spark_rows=len(srows),
                    oracle_rows=len(orows),
                    rows_match=len(srows) == len(orows),
                    schema_match=sorted(scols) == sorted(ocols),
                    hash_match=_hash(scols, srows) == _hash(ocols, orows),
                )
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = (
            "PASS"
            if rec.get("hash_match")
            else ("rows-only" if rec.get("err") == "no_oracle" else "FAIL")
        )
        print(f"{ok:9s} {name:40s} {rec['sec']:6.2f}s  {rec.get('err') or ''}")
    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    n_ro = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    n_fail = len(results) - n_pass - n_ro
    print(
        f"\n{len(results)} queries: {n_pass} pass, {n_ro} rows-only, "
        f"{n_fail} FAIL"
    )
    with open("/tmp/check_correctness.json", "w") as f:
        json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--sf" in args:
        i = args.index("--sf")
        val = args[i + 1]
        SF_DIR = val if "/" in val else f"/root/testdata/{val}"
        del args[i : i + 2]
    sys.exit(main(args))
