"""Attribute/KV-list and time-function queries (P2, P5, P6, F6-F10).

The reference carries per-row attributes as Cassandra key-value UDT
*lists* with possible duplicate keys, and reads them with two
different disciplines: loop-overwrite accessors take the LAST
duplicate (GeoTagOptimizedService.scala:23-34) while ``.filter.head``
reads take the FIRST (AccuracyAnalysis.scala:61-66). The queries here
build a deterministic KV list (with real duplicate keys) from the
events table, run it through the MapType normalization layer
(functions/maps.py), and aggregate — the DuckDB oracle computes the
same first/last-wins ground truth DIRECTLY from the generating
hashes, so it independently verifies the map semantics rather than
re-implementing them.

Time functions (functions/time.py) are exercised against synthetic
receive-time skew: F6 reformat, F7 fixed-offset wire-string parse,
F8 duration rendering, P6 future/past audit
(batch/FuturePastEvents.scala:21-34).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.functions import col

from pulsar_spark_spark.functions.maps import (
    attrs_to_struct,
    get_attr,
    has_attr,
    kv_list_to_map_first_wins,
    kv_list_to_map_last_wins,
)
from pulsar_spark_spark.functions.text import md5_i64
from pulsar_spark_spark.operators.checkpoint import materialize
from pulsar_spark_spark.functions.time import (
    convert_time,
    format_duration,
    future_past_flag,
    ist_epoch_millis,
)
from pulsar_spark_spark.plans.registry import query
from pulsar_spark_spark.sources.tables import load_table, spread_scan


def _h(prefix: str, key: Column, mod: int) -> Column:
    return md5_i64(F.concat(F.lit(prefix), key.cast("string"))) % mod


def _sql_h(prefix: str, key_expr: str, mod: int) -> str:
    return (
        f"(('0x' || substr(md5('{prefix}' || CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {mod})"
    )


# ---------------------------------------------------------------------
# P2/P5/F9/F10: KV list → map → struct, first/last-wins disciplines
# ---------------------------------------------------------------------
@query(
    "event_attrs_quality",
    oracle=f"""
        SELECT
            agent_id,
            count(*)                                   AS n_with_acc,
            CAST(sum(acc_first) AS BIGINT)             AS sum_acc_first,
            CAST(sum(acc_last) AS BIGINT)              AS sum_acc_last,
            count(*) FILTER (WHERE has_city)           AS n_with_city,
            min(city)                                  AS min_city
        FROM (
            SELECT
                'A' || CAST({_sql_h('agent:', 'user_id', 20)} AS VARCHAR) AS agent_id,
                {_sql_h('acc1:', 'event_id', 250)}  AS acc_first,
                CASE WHEN {_sql_h('dup:', 'event_id', 3)} = 0
                     THEN {_sql_h('acc2:', 'event_id', 250)}
                     ELSE {_sql_h('acc1:', 'event_id', 250)} END AS acc_last,
                {_sql_h('city:', 'event_id', 10)} < 8 AS has_city,
                CASE WHEN {_sql_h('city:', 'event_id', 10)} < 8
                     THEN 'C' || CAST({_sql_h('city:', 'event_id', 10)} AS VARCHAR)
                END AS city
            FROM events
        )
        GROUP BY agent_id
        ORDER BY agent_id
    """,
)
def event_attrs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-attribute pipeline: build a duplicate-keyed KV list, convert
    with BOTH map disciplines, filter on attribute presence, reshape to
    a fixed struct, aggregate per agent.

    The KV list per event: [(accuracy_level, a1), (agent_id, A<n>),
    (accuracy_level, a2)?, (city, C<n>)?] — a duplicated
    accuracy_level on 1/3 of rows makes first-wins and last-wins
    observably different, and the oracle derives both answers straight
    from the generating hashes (it never builds a map), so this is a
    true independent check of functions/maps.py. All expression-level:
    the maps fold is the documented O(k²) on ≤4-entry lists.

    The two map columns are MATERIALIZED before fan-out: five output
    columns read them, and project-collapsing re-inlines the whole
    4-md5 kv chain into every consumer (Spark does not CSE through
    the map_from_entries lambdas — same pathology as
    functions/text.py::shingle_hashes). One narrow two-column
    checkpoint write beats five re-derivations (measured 2.24 →
    1.61 s at sf0.1). The blocks are pinned DISK_ONLY
    (``spill=True``): two map-of-struct columns deserialize fat
    (~300 B/row), and at 100×/1000× their on-heap blocks turn into
    GC churn that measured 16.8 s (memory blocks) vs 9.7 s (disk
    blocks) vs 8.2 s (no checkpoint at all) at 100× under the
    cluster shuffle profile — and explains the row's earlier 10.7 →
    68 s capture variance. Disk blocks land in page cache at
    fixture scale, keeping the sf0.1 win.

    spread_scan (round 15): the 5-md5 kv chain otherwise runs on the
    single-file scan's one partition (measured 0.61 → 0.30 s at
    sf0.1), and the checkpoint inherits that width for every
    downstream consumer.
    """
    ev = spread_scan(load_table(spark, "events", sf_dir))
    acc1 = _h("acc1:", col("event_id"), 250).cast("string")
    acc2 = _h("acc2:", col("event_id"), 250).cast("string")
    agent = F.concat(F.lit("A"), _h("agent:", col("user_id"), 20).cast("string"))
    cityn = _h("city:", col("event_id"), 10)
    entry = lambda k, v: F.struct(F.lit(k).alias("key"), v.alias("value"))  # noqa: E731
    kv = F.filter(
        F.array(
            entry("accuracy_level", acc1),
            entry("agent_id", agent),
            F.when(_h("dup:", col("event_id"), 3) == 0, entry("accuracy_level", acc2)),
            F.when(cityn < 8, entry("city", F.concat(F.lit("C"), cityn.cast("string")))),
        ),
        lambda e: e.isNotNull(),
    )
    maps = materialize(
        ev.select(
            kv_list_to_map_first_wins(kv).alias("first"),
            kv_list_to_map_last_wins(kv).alias("last"),
        ),
        spill=True,  # fat map blocks — see the docstring's numbers
    )
    reshaped = attrs_to_struct(col("last"), ("agent_id", "city"))
    rows = maps.select(
        get_attr(col("first"), "accuracy_level").cast("bigint").alias("acc_first"),
        get_attr(col("last"), "accuracy_level").cast("bigint").alias("acc_last"),
        has_attr(col("last"), "city").alias("has_city"),
        reshaped["agent_id"].alias("agent_id"),
        reshaped["city"].alias("city"),
    ).filter(has_attr(col("last"), "accuracy_level"))
    return (
        rows.groupBy("agent_id")
        .agg(
            F.count(F.lit(1)).alias("n_with_acc"),
            F.sum("acc_first").alias("sum_acc_first"),
            F.sum("acc_last").alias("sum_acc_last"),
            F.count(F.when(col("has_city"), 1)).alias("n_with_city"),
            F.min("city").alias("min_city"),
        )
        .orderBy("agent_id")
    )


# ---------------------------------------------------------------------
# P6/F6/F7/F8: time audit
# ---------------------------------------------------------------------
@query(
    "event_time_audit",
    oracle=f"""
        SELECT
            flag,
            count(*)                                        AS n_events,
            max(dur)                                        AS max_duration,
            min(reformatted)                                AS first_hour,
            CAST(min(ist_millis) AS BIGINT)                 AS min_ist_millis
        FROM (
            SELECT
                CASE WHEN -skew > 0 THEN 'FUTURE'
                     WHEN -skew < -86400 THEN 'PAST'
                     ELSE 'OK' END AS flag,
                printf('%d days %d hours %d minutes %d seconds',
                       CAST(floor(abs(skew) / 86400.0) AS BIGINT),
                       CAST(floor((abs(skew) % 86400) / 3600.0) AS BIGINT),
                       CAST(floor((abs(skew) % 3600) / 60.0) AS BIGINT),
                       abs(skew) % 60) AS dur,
                strftime(ts - INTERVAL 19800 SECOND, '%Y/%m/%d %H') AS reformatted,
                (CAST(floor(epoch(ts)) AS BIGINT) - 19800) * 1000 AS ist_millis
            FROM (
                SELECT ts, {_sql_h('skew:', 'event_id', 200000)} - 100000 AS skew
                FROM events
            )
        )
        GROUP BY flag
        ORDER BY flag
    """,
)
def event_time_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Future/past receive-time audit with duration rendering and
    fixed-offset wire-timestamp parsing.

    device_time = ts, received_time = ts + skew (deterministic ±27.8 h
    hash skew) → P6 flags FUTURE (device ahead) / PAST (>24 h behind).
    F8 renders |skew| as the reference's duration string; F6 reformats
    the event time; F7 parses the event time re-serialized as a
    ``yyyy-MM-dd HH:mm:ss+0530`` wire string back to epoch millis
    (which lands 19800 s before the UTC epoch of the same wall-clock —
    exactly the oracle's arithmetic, verifying the offset handling).

    All expression-only; the session timezone is pinned UTC by the
    table loader so date_format is host-independent.
    """
    ev = load_table(spark, "events", sf_dir)
    skew = _h("skew:", col("event_id"), 200000) - 100000
    device = col("ts")
    received = F.timestamp_seconds(F.unix_timestamp(col("ts")) + skew)
    flag = F.coalesce(future_past_flag(device, received), F.lit("OK"))
    dur = format_duration(F.abs(skew) * 1000)
    wire = F.concat(F.date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), F.lit("+0530"))
    # F6 on the wire string: the +0530 instant rendered back in UTC is
    # the wall clock minus 5h30 — which the oracle derives directly.
    reformatted = convert_time(wire, "yyyy-MM-dd HH:mm:ssZ", "yyyy/MM/dd HH")
    ist_ms = ist_epoch_millis(wire)
    return (
        ev.select(
            flag.alias("flag"),
            dur.alias("dur"),
            reformatted.alias("reformatted"),
            ist_ms.alias("ist_millis"),
        )
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("dur").alias("max_duration"),
            F.min("reformatted").alias("first_hour"),
            F.min("ist_millis").alias("min_ist_millis"),
        )
        .orderBy("flag")
    )
