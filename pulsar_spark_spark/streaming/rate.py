"""Backpressure-driven per-partition rate planning (T2 analog).

Mirrors the reference's driver-side offset planning math
(PulsarHelper.scala:70-110): given Spark's PID-estimated rate, split
it across partitions proportionally to their backlog, clamp each share
to [minRatePerPartition, maxRatePerPartition/avgMsgsPerEntry], convert
to entries for the batch interval (ceil), and cap by the partition's
actual backlog. Unit expectations are taken from the reference's own
test (PulsarHelperTest.scala:83-97: 5/0/46 at rate 10, 19/0/100 at
rate 40, 100/0/100 with no estimate, maxRate 20).

In the Structured Streaming pipeline this planner value feeds
``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` — Spark's built-in
admission control — so the math lives here as the policy and the
engine does the enforcement (SURVEY.md §2.11 T2 mapping).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class RateConfig:
    """Defaults per PulsarConf.scala:6-41."""

    max_rate_per_partition: float = 1000.0
    min_rate_per_partition: float = 1.0
    avg_msgs_per_entry: float = 1.0


def default_entries_per_partition(cfg: RateConfig, batch_interval_ms: int) -> int:
    """Fallback batch size when no metadata row exists for a partition
    (PulsarHelper.scala:70-72)."""
    return int(
        (cfg.max_rate_per_partition * batch_interval_ms / 1000)
        / cfg.avg_msgs_per_entry
    )


def compute_max_entries_per_partition(
    estimated_rate: int | None,
    backlogs: dict[str, int],
    batch_interval_ms: int,
    cfg: RateConfig = RateConfig(),
) -> dict[str, int]:
    """Per-partition entry budget for the next micro-batch.

    Exact reference semantics (PulsarHelper.scala:74-110): a
    non-positive estimate counts as absent; each partition's
    backpressure share is backlog/total_backlog × rate; the share is
    clamped to [min_rate, max_rate/avg_msgs] (the max clamp only when
    positive); entries = ceil(share × batch_seconds) capped by the
    partition's backlog. A positive estimate with ZERO total backlog
    (nothing to split proportionally) falls back to the no-estimate
    defaults — every budget is then backlog-capped to 0 anyway,
    instead of dividing by zero.
    """
    effective: dict[str, float] = {}
    total_lag = sum(backlogs.values())
    if estimated_rate is not None and estimated_rate > 0 and total_lag > 0:
        for tp, backlog in backlogs.items():
            max_limit = cfg.max_rate_per_partition / cfg.avg_msgs_per_entry
            backpressure = backlog / float(total_lag) * estimated_rate
            if max_limit > 0:
                effective[tp] = max(
                    min(backpressure, max_limit), cfg.min_rate_per_partition
                )
            else:
                effective[tp] = backpressure
    else:
        for tp in backlogs:
            effective[tp] = cfg.max_rate_per_partition / cfg.avg_msgs_per_entry

    secs = batch_interval_ms / 1000.0
    return {
        tp: min(math.ceil(secs * limit), backlogs[tp])
        for tp, limit in effective.items()
    }


def max_offsets_for_trigger(
    estimated_rate: int | None,
    backlogs: dict[str, int],
    batch_interval_ms: int,
    cfg: RateConfig = RateConfig(),
) -> int:
    """The planner's output as the Structured Streaming admission knob.

    ``maxOffsetsPerTrigger`` is a TOTAL per batch that Spark's Kafka
    source itself splits across partitions proportionally to backlog —
    the same proportional policy the reference implements by hand — so
    the faithful knob value is simply the sum of the per-partition
    budgets. Wire it as::

        total = max_offsets_for_trigger(rate, lags, interval_ms)
        stream_events_kafka(..., max_offsets_per_trigger=total)
    """
    return sum(
        compute_max_entries_per_partition(
            estimated_rate, backlogs, batch_interval_ms, cfg
        ).values()
    )
