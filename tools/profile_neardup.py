"""Stage-level decomposition of the doc near-dup pipeline wall.

Round 9's first profiling run with this tool caught the text-dedup
family's superlinear decade red-handed: 1.58 M candidates from 500 k
docs at 100x with 252 surviving the exact verify — a fixed banding
plan's per-pair false-candidate floor, quadratic in the corpus. The
fix (corpus-adaptive BAND_PLANS + the Arrow signature stage + the
narrow-checkpoint restructure) is measured with this same tool.

Caveat: sequential stage counts double-count work that a single-action
run shares through its plan DAG (only the materialize()d relations are
reused across counts here), so the per-stage walls are upper bounds —
the TOTAL of a real single-action run is lower. Candidate/row COUNTS
are exact either way.

Usage:  python tools/profile_neardup.py /root/repo/.scale/sf10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql.functions import col  # noqa: E402


def main(sf_dir: str) -> None:
    from pulsar_spark_spark.operators.checkpoint import (
        broadcast_if_bounded,
        materialize,
    )
    from pulsar_spark_spark.plans.text import (
        _JACCARD_MIN,
        _SHINGLE_K,
        near_dup_candidates,
    )
    from pulsar_spark_spark.functions.text import (
        char_shingles_of_clean,
        shingle_hashes,
    )
    from pulsar_spark_spark.session import get_session
    from pulsar_spark_spark.sources.tables import load_table

    spark = get_session(
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256"
        }
    )
    docs = load_table(spark, "documents", sf_dir)

    def step(label, df):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        print(f"{label:<28} {dt:>8.2f} s   {n:>12,} rows", flush=True)
        return n

    t_all = time.time()
    keyed, rel, cand = near_dup_candidates(docs)
    step("keyed (materialize)", keyed)
    step("rel collapse (materialize)", rel)
    # decomposition of the fused stage (adaptive tiers only): time the
    # signature+banding Arrow pass ALONE, then the full candidate
    # build — the delta is the band self-join + cap + distinct. The
    # sig pass is re-run inside the full build (shared via rel's
    # checkpoint), so the two prints are upper bounds that OVERLAP;
    # counts are exact.
    from pulsar_spark_spark.plans.text import (
        _text_bands_arrow,
        resolve_band_plan,
    )

    n_hashes, n_bands, rows_per_band = resolve_band_plan(docs, "auto")
    if n_hashes > 16 and "ctext" in rel.columns:
        sigb = _text_bands_arrow(rel, n_hashes, n_bands, rows_per_band)
        step(f"sig+bands arrow ({n_hashes},{n_bands},{rows_per_band})", sigb)
    t0 = time.time()
    cand = materialize(cand)
    print(
        f"{'cand materialize (sig+band+join)':<28} {time.time() - t0:>8.2f} s",
        flush=True,
    )
    step("cand band+cap+sizefilter", cand)

    # mirrors verified_rep_pairs: candidate-rep hv recompute + verify
    cand_reps = (
        cand.select(col("rep_a").alias("rep"))
        .unionByName(cand.select(col("rep_b").alias("rep")))
        .distinct()
    )
    hv_small = (
        rel.join(cand_reps, "rep")
        .select(
            "rep",
            "ckey",
            shingle_hashes(
                char_shingles_of_clean(col("ctext"), _SHINGLE_K)
            ).alias("hv"),
        )
        .transform(materialize)
    )
    step("hv recompute (cand reps)", hv_small)
    sa = hv_small.select(
        col("rep").alias("rep_a"), col("hv").alias("sh_a"), col("ckey").alias("ckey_a")
    )
    sb = hv_small.select(
        col("rep").alias("rep_b"), col("hv").alias("sh_b"), col("ckey").alias("ckey_b")
    )
    jac = F.size(F.array_intersect(col("sh_a"), col("sh_b"))).cast("double") / F.size(
        F.array_union(col("sh_a"), col("sh_b"))
    )
    verified = (
        cand.join(sa, "rep_a")
        .join(sb, "rep_b")
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= _JACCARD_MIN)
        .select("ckey_a", "ckey_b", "rep_a", "rep_b", "jaccard")
        .transform(materialize)
    )
    step("verified (exact Jaccard)", verified)

    ma = keyed.select(col("ckey").alias("ckey_a"), col("doc_id").alias("m_a"))
    mb = keyed.select(col("ckey").alias("ckey_b"), col("doc_id").alias("m_b"))
    pairs = (
        ma.join(broadcast_if_bounded(verified), "ckey_a")
        .join(mb, "ckey_b")
        .filter((col("rep_a") != col("rep_b")) | (col("m_a") < col("m_b")))
    )
    step("pairs fan-out", pairs)
    print(f"{'TOTAL':<28} {time.time() - t_all:>8.2f} s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10")
