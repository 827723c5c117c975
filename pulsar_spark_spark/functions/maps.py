"""Key-value attribute accessors.

The reference stores attributes as Cassandra key-value UDT *lists*
and scans them linearly per access (get_accuracy_level,
service/GeoTagOptimizedService.scala:23-34; ``.filter(key==k).head``
batch/AccuracyAnalysis.scala:61-66). We normalize to MapType columns
(SURVEY.md §1.2) and document the duplicate-key rule per call site:
the reference's loop-overwrite reads take the LAST duplicate, the
``.head`` reads take the FIRST (SURVEY.md §7.3.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _entries(kv: Column) -> Column:
    _pin_last_win_policy()
    return F.transform(
        kv, lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value"))
    )


def _pin_last_win_policy() -> None:
    """Both map builders require spark.sql.mapKeyDedupPolicy=LAST_WIN
    (the default EXCEPTION policy throws DUPLICATED_MAP_KEY on the
    duplicate-keyed KV lists these functions exist to normalize). The
    table loader pins it, but callers building maps on a session that
    never loaded a catalog table must not depend on that side effect —
    pin it at expression-build time too. The flip is session-wide
    (Spark has no per-expression dedup policy, and the expression-
    level alternative is the O(k²) exists-fold this single-pass form
    measurably replaced), so on a session that was NOT already at
    LAST_WIN it warns: a user relying on the EXCEPTION default to
    catch duplicate map keys in unrelated queries loses that
    protection, and should see it happen rather than discover it from
    silently-last-wins data."""
    import warnings

    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    cur = (s.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION") or "").upper()
    if cur != "LAST_WIN":
        warnings.warn(
            "kv_list_to_map_* requires spark.sql.mapKeyDedupPolicy="
            "LAST_WIN; setting it for this session — duplicate map "
            "keys in other queries will now resolve last-wins instead "
            "of raising DUPLICATED_MAP_KEY",
            stacklevel=3,
        )
        s.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")


def kv_list_to_map_last_wins(kv: Column) -> Column:
    """ARRAY<STRUCT<key,value>> → MAP, last duplicate wins (matches the
    reference's loop-overwrite accessor).

    Uses the native ``map_from_entries`` under the LAST_WIN dedup
    policy (set by the table loader) — a single linear pass, unlike
    the O(k²) exists-fold it replaces.
    """
    return F.map_from_entries(_entries(kv))


def kv_list_to_map_first_wins(kv: Column) -> Column:
    """ARRAY<STRUCT<key,value>> → MAP, first duplicate wins (matches the
    reference's ``.filter(...).head`` accessor): reverse + LAST_WIN."""
    return F.map_from_entries(F.reverse(_entries(kv)))


def get_attr(attributes: Column, key: str) -> Column:
    """element_at with missing→NULL (reference F9 accessors)."""
    return F.element_at(attributes, key)


def attrs_to_struct(attributes: Column, fields: tuple[str, ...]) -> Column:
    """MAP → fixed struct projection (reference F10,
    utils/KeyValuePairGenerator.scala:40-77)."""
    return F.struct(*[F.element_at(attributes, f).alias(f) for f in fields])


def has_attr(attributes: Column, key: str) -> Column:
    """Attribute-presence predicate (reference P5)."""
    return F.element_at(attributes, key).isNotNull()
