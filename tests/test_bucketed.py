"""Bucketed co-located joins: the write-time shuffle replaces every
read-time Exchange (X1's scale generalization)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from pulsar_spark_spark.sources.bucketed import read_bucketed, save_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_shuffles(plan: str) -> int:
    """Count shuffle Exchange nodes in a formatted plan (broadcast
    exchanges print as BroadcastExchange and don't count)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(10_000).select(
        col("id").alias("k"), (col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        col("id").alias("k"), (col("id") * 3).alias("vb")
    )
    save_bucketed(a, "bk_a", "k", n_buckets=8, sort_cols=("k",))
    save_bucketed(b, "bk_b", "k", n_buckets=8, sort_cols=("k",))
    # the fixture tables are tiny, so pin the fact-fact plan shape
    # (broadcast would hide the bucketing benefit being asserted)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "bk_a").join(read_bucketed(spark, "bk_b"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
        # groupBy on the bucket key also skips its shuffle
        agg = read_bucketed(spark, "bk_a").groupBy("k").agg(F.sum("va"))
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_kernel_runs_shuffle_free(spark, tmp_path):
    """A user_id-bucketed layout of the kernel points lets the G1
    dispatch (guard agg + keyset join + Python stage) run with zero
    hash Exchange — and the result is bit-identical to the shuffled
    path."""
    from pulsar_spark_spark.operators.grouped import apply_best_latlng
    from pulsar_spark_spark.plans.kernels import _geo_points
    from pulsar_spark_spark.sources.bucketed import (
        bucketed_scan_pinned,
        save_kernel_points,
    )
    from tests.conftest import SF_DIR_SMALL

    from pulsar_spark_spark.operators.grouped import (
        apply_cluster_score,
        apply_cluster_score_v3,
        apply_trimmed_centroid,
    )

    pts = _geo_points(spark, SF_DIR_SMALL)
    save_kernel_points(pts, "bk_geo_points", n_buckets=8)
    try:
        kernels = (
            apply_best_latlng,
            apply_cluster_score,
            apply_cluster_score_v3,
            apply_trimmed_centroid,
        )
        for kern in kernels:
            with bucketed_scan_pinned(spark):
                bucketed = read_bucketed(spark, "bk_geo_points")
                out = kern(bucketed, pre_partitioned=True)
                plan = _plan(out)
                # broadcast of a tiny keyset is fine; a hash shuffle is not
                assert _n_shuffles(plan) == 0, (kern.__name__, plan)
                got = sorted(map(tuple, out.collect()))
            want = sorted(map(tuple, kern(pts).collect()))
            assert got == want, kern.__name__
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_geo_points")


def test_kernel_shuffles_without_prepartition_control(spark):
    """Control: the default path keeps its explicit repartition, so
    the previous test's no-Exchange assertion is meaningful."""
    from pulsar_spark_spark.operators.grouped import apply_best_latlng
    from pulsar_spark_spark.plans.kernels import _geo_points
    from tests.conftest import SF_DIR_SMALL

    out = apply_best_latlng(_geo_points(spark, SF_DIR_SMALL))
    assert _n_shuffles(_plan(out)) >= 1


def test_unbucketed_join_needs_exchange_control(spark):
    # control: the same join without bucketing DOES shuffle — proves
    # the previous test's assertion is meaningful
    a = spark.range(10_000).select(col("id").alias("k"), (col("id") * 2).alias("va"))
    b = spark.range(10_000).select(col("id").alias("k"), (col("id") * 3).alias("vb"))
    af = a.filter(col("va") % 2 == 0)  # defeat trivial self-join reuse
    plan = _plan(af.join(b, "k"))
    assert "Exchange" in plan or "BroadcastExchange" in plan
