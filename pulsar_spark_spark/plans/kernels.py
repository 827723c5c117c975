"""Registered queries for the G1-G7 geo kernels.

These are the reference's flagship analytics
(GeoTagOptimizedService.scala:74-76 best-lat-lng + cluster score over
per-address history; DeliveryLocationRefinementService.scala:85-130
ping-based delivery refinement), run over the deterministic geo
projection of ``events`` (plans/geo.py) with ``user_id`` standing in
for addr_hash/agent_id.

The kernels are procedural (O(n²) scoring, iterative trimming, a
stateful single-pass clusterer) and NOT SQL-expressible, so these
queries register WITHOUT oracle SQL — the driver applies its weaker
rows-only check, and exact semantics are enforced in pytest against an
independent pure-Python transliteration of the reference algorithms
(tests/geo_oracle.py, mirroring the reference's own service-test
strategy, CompassSparkServiceTest.scala:113-136).

Plan shape at 100 TB: one shuffle on the group key into
``applyInPandas``; groups are bounded (kernel guards + upstream
cap-100 state), Arrow moves each group once. The delivery-refinement
input is the T4 interval join (equi-join on user + time-range
residual), never a cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from pulsar_spark_spark.operators.grouped import (
    apply_best_latlng,
    apply_cluster_score,
    apply_cluster_score_v3,
    apply_delivery_refinement,
    apply_trimmed_centroid,
)
from pulsar_spark_spark.plans.geo import geo_events
from pulsar_spark_spark.plans.registry import query


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ge = geo_events(spark, sf_dir)
    return ge.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "lat",
        "lng",
        "accuracy",
    )


@query("best_latlng_per_user")
def best_latlng_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: per-user best location by 300 m Vincenty neighbor count."""
    return apply_best_latlng(_geo_points(spark, sf_dir)).orderBy("user_id")


@query("cluster_score_per_user")
def cluster_score_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: per-user best location + 0/1 cluster confidence score."""
    return apply_cluster_score(_geo_points(spark, sf_dir)).orderBy("user_id")


@query("ping_cluster_score_per_user")
def ping_cluster_score_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: ping-cluster scoring variant (argmax neighbors, real ceil)."""
    return apply_cluster_score_v3(_geo_points(spark, sf_dir)).orderBy("user_id")


@query("trimmed_centroid_per_user")
def trimmed_centroid_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: per-user outlier-trimmed centroid over accurate points."""
    return apply_trimmed_centroid(_geo_points(spark, sf_dir)).orderBy("user_id")


@query("delivery_refinement")
def delivery_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5-G7: refine each 'purchase' (delivery analog) from the user's
    surrounding pings via DBSCAN → best-cluster → score/centroid.

    The candidate set is the reference's T4 interval join: pings of
    the same user in [delivery−120 s, +300 s] with accuracy ≤ 100
    (DeliveryLocationRefinementService.scala:99-106) — an equi-join on
    user_id with a range residual, one shuffle, and the kernel runs
    per delivery group.
    """
    pts = _geo_points(spark, sf_dir)
    ge = geo_events(spark, sf_dir)
    deliveries = ge.filter(col("event_type") == "purchase").select(
        col("event_id").alias("delivery_id"),
        col("user_id"),
        F.unix_millis("ts").alias("del_ts_ms"),
        col("lat").alias("del_lat"),
        col("lng").alias("del_lng"),
        col("accuracy").alias("del_accuracy"),
    )
    pings = pts.select(
        col("user_id").alias("p_user_id"),
        col("event_id").alias("p_event_id"),
        col("ts_ms").alias("p_ts_ms"),
        col("lat").alias("p_lat"),
        col("lng").alias("p_lng"),
        col("accuracy").alias("p_accuracy"),
    ).filter(col("p_accuracy") <= 100.0)
    joined = deliveries.join(
        pings,
        (col("user_id") == col("p_user_id"))
        & (col("p_ts_ms") >= col("del_ts_ms") - 120_000)
        & (col("p_ts_ms") <= col("del_ts_ms") + 300_000),
        "left",
    ).drop("p_user_id")
    return apply_delivery_refinement(joined).orderBy("delivery_id", "method")
