"""External-side adapters: queue/HTTP push sink (K3), validation
guard (P8), retry wrapper (F14).

The reference pushes rows to REST buses from ``foreachPartition``
loops (client/BigfootClient.scala:13-45 posts groups of 200 with
restbus headers; service/CacheRefreshService.scala:99-111,
service/TripTrackingService.scala:28-44), guards sink writes with
null/shape checks (GeoTagOptimizedService.scala:110-133), and wraps
flaky calls in exponential-backoff retries (utils/Utility.scala:
116-134). The engine keeps these OUT of query plans: a pluggable
poster callable (no-op/collector by default — no network in tests),
batched per partition so the RPC count is O(partitions × batches),
never O(rows).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_retry(
    fn: Callable,
    attempts: int = 3,
    base_delay_s: float = 0.05,
    retryable: type[Exception] = Exception,
) -> Callable:
    """F14: exponential-backoff retry wrapper (2× backoff per attempt,
    re-raises after the final one)."""

    def wrapped(*args, **kwargs):
        delay = base_delay_s
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            except retryable:
                if attempt == attempts - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        return None  # unreachable

    return wrapped


def validate_for_sink(
    df: DataFrame, required_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """P8: split a frame into (valid, rejected) on non-null required
    columns — the reference's checkNullUDTValues guard before its
    Cassandra write, kept relational so both sides stay queryable.
    With no required columns every row is valid (degenerate input,
    not an error)."""
    cond = F.lit(True)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond), df.filter(~cond)


def push_partitions(
    df: DataFrame,
    poster: Callable[[list[dict]], None],
    batch_size: int = 200,
    attempts: int = 3,
) -> None:
    """K3: batched queue/HTTP push from the executors.

    Rows are grouped into ``batch_size`` chunks per partition (the
    reference's Bigfoot group size) and handed to ``poster`` — a
    callable like ``lambda rows: requests.post(url, json=rows)`` in
    production, a local collector in tests. Retries with backoff per
    batch; a batch that keeps failing fails the task (and Spark's task
    retry takes over), so delivery is at-least-once like the
    reference's.
    """
    posted = with_retry(poster, attempts=attempts)

    def handle(rows) -> None:
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                posted(buf)
                buf = []
        if buf:
            posted(buf)

    df.foreachPartition(handle)
