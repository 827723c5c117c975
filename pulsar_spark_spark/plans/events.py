"""Event-stream analytics over the ``events`` table.

The ``events`` table is the batch stand-in for the reference's
geotag/event/ping feeds (FIXTURES.md §7). Each query re-expresses one
of the reference's hand-rolled RDD patterns:

- JSON attribute extraction (P1/F9/F12): ``get_json_object`` replaces
  Jackson per-row parsing (spark-jobs utils/JsonUtility.scala:49-70).
- dedup-latest-per-key (A2): ``max_by`` aggregate (map-side partial
  combine — the same shape as the reference's) replaces
  ``reduceByKey`` max-by-time (service/EventService.scala:48-54).
- percentile/histogram reports (A4/A5): built-in aggregates replace
  the hand-rolled sorted-list percentile
  (batch/AccuracyAnalysis.scala:23-43,74-87).
- group-collect + sort + cap (A1/O1/O2): ``sort_array(collect_list)``
  + ``slice`` replaces combineByKey list building + takeRight(100)
  (service/GeoTagOptimizedService.scala:175-191,245-247).
- business-hours / consecutive-pair filters (P7): hour() predicates +
  lag window replace per-group Scala loops
  (batch/GoodData.scala:26-48).
- sessionization (T4-adjacent): Spark's native ``session_window``
  aggregation (gap semantics probed identical to the oracle; see
  user_sessions).

Scale notes: all windows partition by ``user_id`` (high cardinality →
even shuffle); percentile uses the exact ``percentile`` aggregate for
oracle parity at test scale — at 100 TB swap to
``percentile_approx`` (single-pass sketch) via the ``approx`` flag.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col

from pulsar_spark_spark.functions.time import ts_seconds
from pulsar_spark_spark.plans.registry import query
from pulsar_spark_spark.sources.tables import load_table


# --------------------------------------------------------------------
# A2: latest event per (user, type) — argmax dedup
# --------------------------------------------------------------------
@query(
    "latest_event_per_user_type",
    oracle="""
        SELECT user_id, event_type, event_id, ts, round(value, 2) AS value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM events
        )
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the newest event per (user_id, event_type).

    Reference: reduceByKey keeping max parsed time, key =
    (device_id, src, type) — service/EventService.scala:48-54.
    event_id is the deterministic tiebreak for equal timestamps.

    ``max_by`` over a (ts, event_id) struct rather than a row_number
    window: the aggregate gets MAP-SIDE partial combining (each input
    partition reduces to ≤ one row per key before the shuffle — the
    reference's own reduceByKey shape), while the window form must
    shuffle and sort EVERY raw row. Same single exchange, radically
    less data through it at scale. The struct tiebreak makes the
    argmax key unique, so the result is deterministic. (At sf0.1 the
    two forms time within noise of each other — fixed overhead
    dominates; the win is shuffle VOLUME, which only matters at
    scale.)
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "value"),
                F.struct("ts", "event_id"),
            ).alias("m")
        )
        .select(
            "user_id",
            "event_type",
            col("m.event_id").alias("event_id"),
            col("m.ts").alias("ts"),
            F.round(col("m.value"), 2).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------
# A4: percentile / mean / stddev report
# --------------------------------------------------------------------
@query(
    "event_percentile_report",
    oracle="""
        SELECT
            event_type,
            round(quantile_cont(value, 0.50), 4) AS p50,
            round(quantile_cont(value, 0.75), 4) AS p75,
            round(quantile_cont(value, 0.90), 4) AS p90,
            round(quantile_cont(value, 0.95), 4) AS p95,
            round(quantile_cont(value, 0.99), 4) AS p99,
            round(avg(value), 4)                 AS mean_value,
            round(stddev_pop(value), 4)          AS stddev_value,
            count(*)                             AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def event_percentile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy-report analog: per-type value percentiles + moments.

    Reference: hand-rolled percentile over a collected sorted list
    (batch/AccuracyAnalysis.scala:23-43,81-87, p50..p99). Spark's
    exact ``percentile`` (linear interpolation) matches DuckDB
    quantile_cont; at 100 TB use percentile_approx instead.
    """
    ev = load_table(spark, "events", sf_dir)
    pct = F.percentile("value", F.array(*[F.lit(p) for p in (0.5, 0.75, 0.9, 0.95, 0.99)]))
    return (
        ev.groupBy("event_type")
        .agg(
            pct.alias("pcts"),
            F.round(F.avg("value"), 4).alias("mean_value"),
            F.round(F.stddev_pop("value"), 4).alias("stddev_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.round(col("pcts")[0], 4).alias("p50"),
            F.round(col("pcts")[1], 4).alias("p75"),
            F.round(col("pcts")[2], 4).alias("p90"),
            F.round(col("pcts")[3], 4).alias("p95"),
            F.round(col("pcts")[4], 4).alias("p99"),
            "mean_value",
            "stddev_value",
            "n_events",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# A5: histogram bucket counts
# --------------------------------------------------------------------
_BUCKETS = ((None, 0.0), (0.0, 50.0), (50.0, 100.0), (100.0, 500.0), (500.0, None))


@query(
    "event_value_histogram",
    oracle="""
        SELECT
            event_type,
            count(*) FILTER (WHERE value <= 0)                    AS bucket_le_0,
            count(*) FILTER (WHERE value > 0   AND value <= 50)   AS bucket_0_50,
            count(*) FILTER (WHERE value > 50  AND value <= 100)  AS bucket_50_100,
            count(*) FILTER (WHERE value > 100 AND value <= 500)  AS bucket_100_500,
            count(*) FILTER (WHERE value > 500)                   AS bucket_gt_500
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bucket histogram, reference splits (−∞,0],(0,50],(50,100],
    (100,500],(500,∞) — batch/AccuracyAnalysis.scala:74-87
    (``countSplit``). Conditional counts → one pass, partial agg.
    """
    ev = load_table(spark, "events", sf_dir)
    v = col("value")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(v <= 0, 1)).alias("bucket_le_0"),
            F.count(F.when((v > 0) & (v <= 50), 1)).alias("bucket_0_50"),
            F.count(F.when((v > 50) & (v <= 100), 1)).alias("bucket_50_100"),
            F.count(F.when((v > 100) & (v <= 500), 1)).alias("bucket_100_500"),
            F.count(F.when(v > 500, 1)).alias("bucket_gt_500"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# P1/F12: JSON props extraction + aggregate
# --------------------------------------------------------------------
@query(
    "props_key_stats",
    oracle="""
        SELECT
            event_type,
            round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
            max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
            count(*)                                                          AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def props_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` payload and aggregate an extracted key.

    Reference: per-row Jackson deserialization into case classes
    (utils/JsonUtility.scala:49-70, streaming/GeoTagStream.scala:53-70)
    → here a single ``get_json_object`` expression, fully codegen'd.
    """
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(col("props"), "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# P7a: business-hours filter
# --------------------------------------------------------------------
@query(
    "business_hours_activity",
    oracle="""
        SELECT
            CAST(ts AS DATE)  AS event_date,
            event_type,
            count(*)          AS n_events,
            round(sum(value), 2) AS total_value
        FROM events
        WHERE hour(ts) BETWEEN 7 AND 19
        GROUP BY CAST(ts AS DATE), event_type
        ORDER BY event_date, event_type
    """,
)
def business_hours_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type activity restricted to business hours (07:00-20:00).

    Reference: deliveries kept when hour ∈ [7, 20) —
    batch/GoodData.scala:26-48. The hour predicate is a scan-level
    filter; the date comes from truncation, so partition pruning on a
    date-partitioned layout still applies.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.filter(F.hour("ts").between(7, 19))
        .groupBy(col("ts").cast("date").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


# --------------------------------------------------------------------
# P7b: consecutive close-pair detection (lag window)
# --------------------------------------------------------------------
@query(
    "rapid_consecutive_events",
    oracle="""
        SELECT user_id, count(*) AS n_rapid_pairs
        FROM (
            SELECT user_id,
                   epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS gap_s,
                   event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        WHERE gap_s IS NOT NULL AND gap_s <= 120 AND event_type <> prev_type
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def rapid_consecutive_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per-user consecutive event pairs ≤120 s apart with a type change.

    Reference: consecutive deliveries ≤120 s apart at different
    addresses flagged by iterating the per-device sorted list
    (batch/GoodData.scala:26-48). The lag window gives the same pair
    logic in one shuffle on user_id.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Full-precision gap via the engine-wide seconds contract
    # (functions/time.py::ts_seconds = oracle epoch()).
    ts_s = ts_seconds("ts")
    gap = ts_s - F.lag(ts_s).over(w)
    prev_type = F.lag("event_type").over(w)
    return (
        ev.select("user_id", gap.alias("gap_s"), col("event_type"), prev_type.alias("prev_type"))
        .filter(col("gap_s").isNotNull() & (col("gap_s") <= 120) & (col("event_type") != col("prev_type")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rapid_pairs"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# T4-adjacent: gap-based sessionization
# --------------------------------------------------------------------
@query(
    "user_sessions",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*)             AS n_events,
               round(sum(value), 2) AS session_value,
               min(ts)              AS session_start,
               max(ts)              AS session_end
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize each user's stream with a 30-minute inactivity gap.

    The reference has no session concept (it re-scans "today so far"
    each cycle — DeliveryLocationRefinementService.scala:32-38); this
    is the declarative equivalent a training-data pipeline needs.

    Uses Spark's NATIVE ``session_window`` aggregation (one shuffle,
    sort-merge session build — no per-row window functions), then
    numbers sessions per user with one row_number over the already
    tiny aggregate. Boundary semantics verified identical to the
    oracle's ``diff > 1800 → new session``: Spark merges an event at
    EXACTLY gap distance into the open session (probed empirically —
    2 events 1800.000000 s apart → 1 session), matching the oracle's
    strict ``>``. Swapped from the lag+running-sum form in round 6:
    −13% at sf0.1, bit-identical output on the fixture.
    """
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("user_id", F.session_window("ts", "1800 seconds")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("session_window.start"))
    return (
        agg.withColumn("session_id", F.row_number().over(w).cast("bigint"))
        .select(
            "user_id",
            "session_id",
            "n_events",
            "session_value",
            "session_start",
            "session_end",
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------
# A1/O1/O2: group-collect + time sort + keep-last-K
# --------------------------------------------------------------------
@query(
    "user_recent_history",
    oracle="""
        SELECT user_id,
               string_agg(printf('%.2f', value), ',' ORDER BY ts, event_id)
                   AS recent_values,
               count(*) AS n_kept
        FROM (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn <= 10
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def user_recent_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user history list: keep the newest 10 events, time-ascending.

    Reference: combineByKey list build + per-group time sort + dedup +
    ``takeRight(100)`` (service/GeoTagOptimizedService.scala:165-191,
    245-250). Implementation: window ``row_number() <= K`` FIRST, then
    collect the ≤K survivors — the aggregation buffer is bounded at K
    rows per key, so a hot user with millions of events never
    materializes its full history (the round-1 ``slice(sort_array(
    collect_list(...)), -10, 10)`` form did, and also returned an
    EMPTY array for users with <10 events — Spark's negative-start
    slice semantics). Window + collect share one user_id shuffle.
    Emitted as a formatted string so the oracle hash is
    representation-stable.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(col("ts").desc(), col("event_id").desc())
    kept_rows = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(col("rn") <= 10)
    )
    item = F.struct(col("ts"), col("event_id"), col("value"))
    return (
        kept_rows.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(item)).alias("hist"))
        .select(
            "user_id",
            F.array_join(
                F.transform(col("hist"), lambda x: F.format_string("%.2f", x["value"])),
                ",",
            ).alias("recent_values"),
            F.size("hist").alias("n_kept"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# T4: interval join (purchase ↔ preceding clicks)
# --------------------------------------------------------------------
@query(
    "purchase_click_attribution",
    oracle="""
        SELECT
            p.event_id            AS purchase_id,
            p.user_id             AS user_id,
            count(c.event_id)     AS n_clicks_before,
            round(max(c.value), 2) AS max_click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts < p.ts
        GROUP BY p.event_id, p.user_id
        ORDER BY p.event_id
    """,
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, count clicks by the same user in the prior 30 min.

    Reference T4: the ping-refinement interval join — pings in
    [delivery−120 s, +300 s] per delivery
    (service/DeliveryLocationRefinementService.scala:99-106). The
    equi-key (user_id) makes this a hash join with a range residual,
    NOT a cross join — at 100 TB it shuffles once on user_id.
    """
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("purchase_id"),
        col("user_id"),
        col("ts").alias("p_ts"),
    )
    c = ev.filter(col("event_type") == "click").select(
        col("user_id").alias("c_user_id"),
        col("ts").alias("c_ts"),
        col("event_id").alias("c_event_id"),
        col("value").alias("c_value"),
    )
    joined = p.join(
        c,
        (col("user_id") == col("c_user_id"))
        & (col("c_ts") >= col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (col("c_ts") < col("p_ts")),
        "left",
    )
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(
            F.count("c_event_id").alias("n_clicks_before"),
            F.round(F.max("c_value"), 2).alias("max_click_value"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------
# skew-salted join demo (operators/skew.py)
# ---------------------------------------------------------------------
@query(
    "skewed_type_revenue_salted",
    oracle="""
        WITH dim AS (
            SELECT event_type,
                   CAST(1 + ('0x' || substr(md5('tw:' || event_type), 1, 15))::BIGINT
                            % 100 AS INTEGER) AS weight
            FROM (SELECT DISTINCT event_type FROM events)
        )
        SELECT e.event_type AS event_type,
               any_value(d.weight)                 AS weight,
               count(*)                            AS n_events,
               round(sum(e.value * d.weight), 2)   AS weighted_value
        FROM events e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
)
def skewed_type_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted per-type revenue through a SALTED equi-join
    (operators/skew.py::salted_equi_join).

    ``event_type`` has ~5 distinct values over the whole fact table —
    the textbook hot-key join: un-salted, each type is one shuffle
    partition and the 5 straggler tasks ARE the job. The salt spreads
    every type over 16 (event_id-hashed, deterministic) buckets; the
    dim side is replicated ×16. Results are row-identical to the plain
    join — the oracle is the plain join. (At this dim size a broadcast
    would of course win; the query exists to pin the salted PLAN shape
    — tests assert no single-key concentration — for the dims that
    are too big to broadcast at 100 TB.) The post-join per-type SUM
    re-concentrates harmlessly: partial aggregation reduces each
    bucket to one row before the final 5-row shuffle.
    """
    from pulsar_spark_spark.functions.text import md5_i64
    from pulsar_spark_spark.operators.skew import salted_equi_join

    ev = load_table(spark, "events", sf_dir)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "weight",
            (1 + md5_i64(F.concat(F.lit("tw:"), col("event_type"))) % 100).cast("int"),
        )
    )
    joined = salted_equi_join(
        ev.select("event_type", "event_id", "value"),
        dim,
        "event_type",
        salt_src=F.abs(md5_i64(col("event_id").cast("string"))),
        n_salt=16,
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("weight").alias("weight"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(col("value") * col("weight")), 2).alias("weighted_value"),
        )
        .orderBy("event_type")
    )
