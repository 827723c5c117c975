"""Query registry.

``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` (optional) is the equivalent ANSI SQL for DuckDB
run over the same parquet tables. Queries without an oracle would get
the driver's weaker rows-only check; since round 6 every registered
query carries a full value oracle — the procedural kernels included
(recursive-CTE Vincenty, walk-replay recursion, unrolled trim loops;
see plans/kernels.py).

Column-name parity between the two is load-bearing: the driver sorts
columns by name before value-hashing, so every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
