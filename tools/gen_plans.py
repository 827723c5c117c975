"""Generate PLANS.md: a physical-plan audit of every registered query.

For each registry entry, compile the query at the given SF dir and
extract the plan facts that matter at 100 TB: shuffle count, broadcast
joins, sort-merge joins, whole-stage-codegen spans, Python stages, and
whether parquet scans carry pushed filters / pruned schemas.

Usage:  python tools/gen_plans.py [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_spark_spark.plans import QUERIES  # noqa: E402
from pulsar_spark_spark.session import get_session  # noqa: E402

# Queries whose registered form hides stages behind a pre-sort
# localCheckpoint (kernels._sorted_out) — their audited plan is the
# underlying operator's, noted in the table.
_CHECKPOINTED = {
    "best_latlng_per_user",
    "cluster_score_per_user",
    "ping_cluster_score_per_user",
    "delivery_refinement",
    "delivery_refined_history",
    "media_feature_extract",
    "media_frame_sample",
    "doc_near_dup_pairs",
    "doc_ngram_jaccard",
    "doc_dedup_clusters",
    "smart_address_candidates",
    "doc_winnow_fingerprints",
    "doc_curation",
    "event_rollup_multires",
}

# Flagship queries whose full formatted plan is embedded.
_FLAGSHIP = [
    "q5_region_revenue",
    "purchase_click_attribution",
    "events_asof_join",
    "geofence_containment",
]


def _plan_strings(df):
    qe = df._jdf.queryExecution()
    formatted = df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")
    return qe.executedPlan().toString(), formatted


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="plan_audit", master="local[4]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # Static plans for the audit: under AQE the compiled plan is an
    # AdaptiveSparkPlan placeholder without codegen span markers (they
    # are assigned at execution). Production runs keep AQE on.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows = []
    flag_sections = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, sf_dir)
        plan, formatted = _plan_strings(df)
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", formatted)))
        py = (
            "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
            or "ArrowEvalPython" in plan
        )
        scans = plan.count("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", formatted))
        note = "operator plan behind checkpoint" if name in _CHECKPOINTED else ""
        rows.append(
            f"| `{name}` | {shuffles} | {bhj} | {smj} | {codegen} | "
            f"{'yes' if py else '—'} | {scans} | {pushed} | {note} |"
        )
        if name in _FLAGSHIP:
            trimmed = "\n".join(formatted.splitlines()[:70])
            flag_sections.append(
                f"### `{name}`\n\n```\n{trimmed}\n```\n"
            )

    header = f"""# Physical-plan audit (generated)

Compiled from the live registry at `{sf_dir}` by
`python tools/gen_plans.py` — regenerate after plan-affecting changes.
Columns: **shuffles** = hash+range exchanges in the executed plan;
**BHJ/SMJ** = broadcast-hash vs sort-merge joins; **codegen** =
distinct WholeStageCodegen spans; **Python** = Arrow-batched Python
stage present; **scans** / **pushed** = parquet scans and how many
carry non-empty PushedFilters. Queries marked "operator plan behind
checkpoint" materialize their expensive stage via a lazy
localCheckpoint before the final sort (see
`plans/kernels.py::_sorted_out`), so the registered query's own plan
shows `Scan ExistingRDD` — their stage structure is audited at the
operator level in `tests/test_plans.py`.

Counts are compiled at fixture scale: AQE may re-plan exchanges at
runtime (broadcast promotion, partition coalescing), and broadcast
choices can differ at 100 TB — the INVARIANTS the test suite pins are
no cartesian products, no row-at-a-time Python, bounded-side-only
broadcasts, and hash/band/bucket join keys for every candidate
generator.

| Query | shuffles | BHJ | SMJ | codegen | Python | scans | pushed | note |
|---|---|---|---|---|---|---|---|---|
"""
    doc = (
        header
        + "\n".join(rows)
        + "\n\n## Flagship formatted plans (first 70 lines)\n\n"
        + "\n".join(flag_sections)
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PLANS.md")
    with open(out, "w") as f:
        f.write(doc)
    print(f"wrote {out}: {len(rows)} queries audited")
    spark.stop()


if __name__ == "__main__":
    main()
