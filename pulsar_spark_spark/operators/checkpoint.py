"""Mid-plan materialization with a local/reliable checkpoint switch.

Several pipelines materialize an expensive scratch relation that feeds
multiple consumers (kernel outputs before a global sort, the MinHash /
pruned-gram relations, connected-components iteration state). The
default vehicle is ``localCheckpoint(eager=False)``: blocks live on
executors, the ContextCleaner reclaims them when the plan is
garbage-collected, and there is no filesystem round-trip.

The 100×-scale caveat: localCheckpoint blocks are NOT recomputable on
executor loss — on a real cluster a lost executor kills the query
mid-flight. For cluster runs, switch the same call sites to RELIABLE
checkpoints (written to a fault-tolerant checkpoint dir, HDFS/S3):

    configure_reliable_checkpoints(spark, "hdfs://.../ckpt")
    ... run queries ...
    configure_reliable_checkpoints(spark, None)   # back to local

or set ``SPARK_GRAFT_CHECKPOINT_DIR`` before building the session
(session.py wires it through automatically).

The switch is process-global deliberately: it is an environment
property (what kind of cluster am I on?), not a per-query decision.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_STATE: dict[str, bool] = {"reliable": False}

ENV_CHECKPOINT_DIR = "SPARK_GRAFT_CHECKPOINT_DIR"


def configure_reliable_checkpoints(
    spark: SparkSession, checkpoint_dir: str | None
) -> None:
    """Route subsequent :func:`materialize` calls through RELIABLE
    checkpoints rooted at ``checkpoint_dir`` (fault-tolerant storage on
    a real cluster; any path in local mode). ``None`` switches back to
    executor-local checkpoints."""
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        _STATE["reliable"] = True
    else:
        _STATE["reliable"] = False


def configure_from_env(spark: SparkSession) -> None:
    """Apply ``SPARK_GRAFT_CHECKPOINT_DIR`` if set (session bootstrap)."""
    d = os.environ.get(ENV_CHECKPOINT_DIR)
    if d:
        configure_reliable_checkpoints(spark, d)


def reliable_enabled() -> bool:
    return _STATE["reliable"]


def materialize(df: DataFrame, eager: bool = False, spill: bool = False) -> DataFrame:
    """Checkpoint ``df`` so downstream consumers reuse its result
    instead of recomputing lineage.

    Local mode (default): ``localCheckpoint`` — fastest, reclaimed by
    the ContextCleaner, not recomputable on executor loss.
    Reliable mode (:func:`configure_reliable_checkpoints`): a true
    ``checkpoint`` to the configured directory — survives executor
    loss; the extra filesystem write is the price of fault tolerance.

    ``spill=True`` pins the local checkpoint's blocks to DISK_ONLY —
    for scratch relations that are HUGE by construction relative to
    their corpus (the smart-address gram explosion: ~200 gram rows
    per doc). Default MEMORY_AND_DISK blocks of such a relation fill
    the unified pool's protected storage region and starve downstream
    aggregates into SparkOutOfMemoryError (measured at 1000×: the
    pair aggregate died under a 17 GB gram checkpoint); disk blocks
    cost one serialized write that lands in page cache at small scale
    and sequential IO at large — strictly bounded, never starving.
    Reliable mode already writes to the checkpoint dir, so ``spill``
    is a no-op there.
    """
    if _STATE["reliable"]:
        # The flag is process-global but the checkpoint dir is
        # per-SparkContext state: a DataFrame from a DIFFERENT session
        # than the one configure_reliable_checkpoints saw would crash
        # with 'Checkpoint directory has not been set'. Verify THIS
        # df's context actually has a dir; fall through to the local
        # arm otherwise (the behavior that session would have had).
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isDefined():
            return df.checkpoint(eager=eager)
    if spill:
        from pyspark.storagelevel import StorageLevel

        return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=eager)


def broadcast_if_bounded(df: DataFrame, max_rows: int = 5_000_000) -> DataFrame:
    """Broadcast ``df`` only while its row count stays under
    ``max_rows``; above it, return it unhinted so the planner picks a
    shuffle join.

    For data-dependent relations that are EXPECTED tiny (the verified
    near-dup rep pairs) but unbounded in the adversarial case, an
    unconditional broadcast hint can blow past the broadcast-table
    limit / driver memory on a near-dup-dense 100 TB corpus. The
    guard count is cheap by contract: callers pass an
    already-:func:`materialize`'d relation, so the count scans
    checkpoint blocks, not lineage. Past the bound the relation is a
    real fact table and the shuffle join is the right plan anyway.
    The 5M default is ~0.5 GB at ~100 B/row — comfortably inside
    Spark's 8 GB broadcast hard limit with headroom for executor-side
    hash-table expansion.
    """
    from pyspark.sql.functions import broadcast

    return broadcast(df) if df.count() <= max_rows else df
