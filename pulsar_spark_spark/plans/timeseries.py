"""Time-series operators over the ``events`` table: as-of join and
multi-resolution (hypertable-style) rollups.

Both are standard time-series-store operations the reference
approximates procedurally (the ping-window scan in
DeliveryLocationRefinementService.scala:99-106 is a hand-rolled as-of
probe; the per-date report jobs in batch/AccuracyAnalysis.scala are
single-resolution rollups re-scanning the facts per granularity).
Re-expressed Spark-first:

- **as-of join** (``events_asof_join``): the classic kdb/QuestDB
  ``aj``: for each left row, the single most recent right row at or
  before it. NOT implemented as a range join (whose candidate fanout
  is unbounded — every prior click is a candidate) but as the
  union-tag + window formulation: tag both sides, union, one window
  over (user_id ORDER BY ts) carrying the last click forward via
  ``last(..., ignorenulls=True)``. ONE shuffle on the join key, no
  candidate blowup, and Catalyst keeps the whole thing in
  WholeStageCodegen. At 100 TB this is the only as-of shape that
  survives: the range-join alternative materializes O(clicks-in-
  window) rows per purchase before picking one.
- **multi-resolution rollup** (``event_rollup_multires``):
  TimescaleDB-continuous-aggregate-style hierarchy: the fact table is
  scanned ONCE for the finest grain (hour); each coarser grain (day)
  re-aggregates the previous rollup, which is orders of magnitude
  smaller. Counts/sums compose exactly (avg is re-derived sum/count,
  never averaged-of-averages). The naive alternative — one
  grouping-sets pass — also scans once but shuffles the full fact
  table per grouping set; the hierarchy shuffles facts once and then
  only rollup rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col

from pulsar_spark_spark.functions.time import ts_millis
from pulsar_spark_spark.operators.checkpoint import materialize
from pulsar_spark_spark.plans.registry import query
from pulsar_spark_spark.sources.tables import load_table


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
    tiebreak: "str | None" = None,
) -> DataFrame:
    """Generic backward as-of join: for every ``left`` row, attach the
    most recent ``right`` row of the same ``on`` key with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``).

    Union-tag + window shape (see module docstring): right rows sort
    AFTER left rows at equal timestamps when ``strict`` (so a same-ts
    right row is excluded), BEFORE them otherwise. Ties inside the
    right side resolve to the largest ``tiebreak`` value —
    deterministic on both engines. ``tiebreak`` must be an integral
    right-side column (an event/row id); it defaults to
    ``right_cols[0]`` for the id-first column convention the engine's
    own callers use, but a non-integral first column is a hard error
    rather than a silently nondeterministic cast (a double or string
    cast to long is non-unique/NULL, and the window's tie order would
    then vary across runs and partitionings).

    Output: all ``left`` columns plus ``right_cols`` (null when no
    prior right row exists).
    """
    tiebreak = tiebreak or right_cols[0]
    tb_type = dict(right.dtypes).get(tiebreak)
    if tb_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"asof_backward_join tiebreak column {tiebreak!r} has type "
            f"{tb_type!r}; pass tiebreak=<an integral right-side id "
            "column> — tie order would otherwise be nondeterministic"
        )
    lt = left.withColumn("__is_r", F.lit(0))
    rt = right.withColumn("__is_r", F.lit(1))
    l_cols = [c for c in left.columns]
    payload = F.struct(*[col(c) for c in right_cols])
    tagged = lt.select(
        col(on).alias("__k"),
        col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__seq"),
        col("__is_r"),
        F.struct(*[col(c) for c in l_cols]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols) + ">"
        ).alias("__r"),
    ).unionByName(
        rt.select(
            col(on).alias("__k"),
            col(right_ts).alias("__ts"),
            col(tiebreak).cast("long").alias("__seq"),
            col("__is_r"),
            F.lit(None).cast(
                "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in l_cols) + ">"
            ).alias("__l"),
            payload.alias("__r"),
        )
    )
    is_right_rank = col("__is_r") if strict else (1 - col("__is_r"))
    w = (
        Window.partitionBy("__k")
        .orderBy(col("__ts"), is_right_rank, col("__seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "__last_r", F.last(col("__r"), ignorenulls=True).over(w)
    )
    out = carried.filter(col("__l").isNotNull()).select(
        *[col(f"__l.{c}").alias(c) for c in l_cols],
        *[col(f"__last_r.{c}").alias(c) for c in right_cols],
    )
    return out


@query(
    "events_asof_join",
    oracle="""
        WITH t AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_r
            FROM events WHERE event_type IN ('click', 'purchase')
        ), carried AS (
            SELECT *,
                   last_value(
                       CASE WHEN is_r = 1
                            THEN struct_pack(cid := event_id, cts := ts, cval := value)
                       END IGNORE NULLS
                   ) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_r, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_click
            FROM t
        )
        SELECT event_id                 AS purchase_id,
               user_id                  AS user_id,
               ts                       AS purchase_ts,
               last_click.cid           AS click_id,
               last_click.cts           AS click_ts,
               round(last_click.cval, 2) AS click_value,
               epoch_ms(ts) - epoch_ms(last_click.cts) AS gap_ms
        FROM carried
        WHERE is_r = 0
        ORDER BY purchase_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the single most recent strictly-prior click
    by the same user (backward as-of join), with the gap in ms.

    The kdb ``aj`` / QuestDB ``ASOF JOIN`` / pandas ``merge_asof``
    operator, which the reference's ping-window probe approximates.
    Purchases with no prior click keep null click columns (left as-of).
    """
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("purchase_id"),
        "user_id",
        col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(col("event_type") == "click").select(
        "user_id",
        col("event_id").alias("click_id"),
        col("ts").alias("click_ts"),
        col("value").alias("click_value"),
    )
    joined = asof_backward_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts", "click_value"],
        strict=True,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.round("click_value", 2).alias("click_value"),
        (ts_millis("purchase_ts") - ts_millis("click_ts")).alias("gap_ms"),
    ).orderBy("purchase_id")


@query(
    "event_rollup_multires",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_start,
                   count(*)    AS n_events,
                   CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sc
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
        ), daily AS (
            SELECT event_type,
                   date_trunc('day', bucket_start) AS bucket_start,
                   sum(n_events) AS n_events,
                   sum(sc)       AS sc
            FROM hourly
            GROUP BY event_type, date_trunc('day', bucket_start)
        )
        SELECT resolution, event_type, bucket_start,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(sc AS BIGINT) / 100.0 AS sum_value,
               floor(CAST(sc AS DOUBLE) / n_events + 0.5) / 100.0 AS avg_value
        FROM (
            SELECT 'hour' AS resolution, * FROM hourly
            UNION ALL
            SELECT 'day' AS resolution, * FROM daily
        )
        ORDER BY resolution, event_type, bucket_start
    """,
)
def event_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time rollup: hourly buckets
    aggregated from the facts, daily buckets re-aggregated FROM THE
    HOURLY ROLLUP (never rescanning the fact table).

    count/sum compose exactly across the hierarchy; avg is re-derived
    as sum/count at each level (averaging averages would be wrong
    under uneven bucket sizes). At 100 TB the facts are shuffled once
    (into hour grain); every coarser grain shuffles only rollup rows —
    thousands, not billions. The hourly relation feeds two consumers
    (its own output + the daily re-aggregate), so it is materialized
    once via a lazy localCheckpoint instead of being recomputed from
    the scan per branch.
    """
    ev = load_table(spark, "events", sf_dir)
    # Rollup state is INTEGER CENTS, not a double sum. Two reasons:
    # (1) engine portability — Spark's round() re-reads doubles through
    # their shortest DECIMAL string (5.315 rounds UP) while DuckDB
    # rounds the binary value (5.3149999… DOWN), and the avg division
    # lands exactly on x.xx5 whenever a cent-sum is divided by an even
    # count, so double rounding flips ~1% of buckets; (2) the rollup
    # HIERARCHY itself — re-aggregating integer cents is exact and
    # association-free, so day-from-hour equals day-from-facts bit-for-
    # bit, which is false for float sums. floor(x*100+0.5) is the same
    # IEEE op sequence on both engines.
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", col("ts")).alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("sc"),
        )
        .transform(materialize)
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", col("bucket_start")).alias("bucket_start")
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sc").alias("sc"))
    stacked = hourly.withColumn("resolution", F.lit("hour")).unionByName(
        daily.withColumn("resolution", F.lit("day"))
    )
    return stacked.select(
        "resolution",
        "event_type",
        "bucket_start",
        "n_events",
        (col("sc") / F.lit(100.0)).alias("sum_value"),
        (
            F.floor(col("sc").cast("double") / col("n_events") + F.lit(0.5))
            / F.lit(100.0)
        ).alias("avg_value"),
    ).orderBy("resolution", "event_type", "bucket_start")
