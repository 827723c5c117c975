"""Streaming metrics collector — the connector metrics-subsystem analog.

The reference registers per-topic consumer metrics (msg/byte rates,
totals, failure counts) as Spark accumulators and flushes them to the
metrics system on every batch boundary via a StreamingListener
(DSTREAM/PulsarMetricType.scala:11-143 ConsumerMetric/
TopicConsumerMetrics, BatchListener.scala:13-32 onBatchCompleted →
metricsSystem.report()).

Structured Streaming already publishes the equivalent observability
feed as StreamingQueryProgress events; this module condenses that feed
into the reference's metric shape with a ``StreamingQueryListener``:

====================  ==============================================
reference metric      Structured Streaming twin collected here
====================  ==============================================
receivedMsgsRate      progress.inputRowsPerSecond (last batch)
maxReceiveRate        max(processedRowsPerSecond) over the run
totalMsgsReceived     Σ progress.numInputRows
consumerRuntime       Σ batch durationMs (triggerExecution)
totalReceiveFailed    queries terminated with an exception
====================  ==============================================

``receivedBytesRate`` has no file/kafka-source-independent twin
(sources report rows, not bytes); it is representable only where the
source exposes byte metrics — documented, not faked.

Keyed per (query, source description) — the topic-name analog: a
file-source description carries its directory, a kafka source its
topic list, so per-topic attribution survives.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


def _finite_rate(v) -> float:
    """Absent OR NaN rate → 0.0 (see the progress-event note below)."""
    import math

    r = float(v or 0.0)
    return 0.0 if math.isnan(r) else r


@dataclass
class SourceMetrics:
    """Per-(query, source) counters — TopicConsumerMetrics twin."""

    source: str
    total_input_rows: int = 0
    n_batches: int = 0
    last_input_rows_per_second: float = 0.0
    last_processed_rows_per_second: float = 0.0
    max_receive_rate: float = 0.0

    def as_dict(self) -> dict:
        return {
            "source": self.source,
            "totalMsgsReceived": self.total_input_rows,
            "nBatches": self.n_batches,
            "receivedMsgsRate": self.last_input_rows_per_second,
            "processedMsgsRate": self.last_processed_rows_per_second,
            "maxReceiveRate": self.max_receive_rate,
        }


@dataclass
class QueryMetrics:
    """Per-query rollup (consumer-runtime + failure counters)."""

    name: str
    total_duration_ms: int = 0
    n_progress_events: int = 0
    terminated: bool = False
    failed: bool = False
    sources: dict[str, SourceMetrics] = field(default_factory=dict)


class StreamMetricsListener(StreamingQueryListener):
    """Collects the reference's consumer-metric set from the progress
    feed. Thread-safe: listener callbacks arrive on Spark's listener
    bus thread while tests/operators read snapshots from the driver
    thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._queries: dict[str, QueryMetrics] = {}

    # -- listener callbacks ------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._queries.setdefault(
                str(event.id), QueryMetrics(name=event.name or str(event.id))
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            qm = self._queries.setdefault(
                str(p.id), QueryMetrics(name=p.name or str(p.id))
            )
            qm.n_progress_events += 1
            qm.total_duration_ms += int(
                (p.durationMs or {}).get("triggerExecution", 0)
            )
            for s in p.sources:
                desc = s.description or "unknown"
                sm = qm.sources.setdefault(desc, SourceMetrics(source=desc))
                sm.total_input_rows += int(s.numInputRows or 0)
                sm.n_batches += 1
                # Structured Streaming reports the rates as NaN on a
                # query's first progress event; NaN is truthy so the
                # `or 0.0` absent-value guard alone passes it through
                # — and a NaN in the snapshot breaks JSON serializers
                # and numeric comparisons downstream.
                sm.last_input_rows_per_second = _finite_rate(
                    s.inputRowsPerSecond
                )
                sm.last_processed_rows_per_second = _finite_rate(
                    s.processedRowsPerSecond
                )
                sm.max_receive_rate = max(
                    sm.max_receive_rate, sm.last_processed_rows_per_second
                )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            qm = self._queries.setdefault(
                str(event.id), QueryMetrics(name=str(event.id))
            )
            qm.terminated = True
            qm.failed = event.exception is not None

    # -- read side ---------------------------------------------------------
    def snapshot(self) -> dict[str, dict]:
        """The reference's getAllAccumulators() analog: every query's
        counters, totals and per-source rates as plain dicts."""
        with self._lock:
            return {
                qid: {
                    "name": qm.name,
                    "consumerRuntimeMs": qm.total_duration_ms,
                    "nBatches": qm.n_progress_events,
                    "terminated": qm.terminated,
                    "totalReceiveFailed": 1 if qm.failed else 0,
                    "sources": {
                        d: sm.as_dict() for d, sm in qm.sources.items()
                    },
                }
                for qid, qm in self._queries.items()
            }

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(
                sm.total_input_rows
                for qm in self._queries.values()
                for sm in qm.sources.values()
            )


def attach_metrics(spark: SparkSession) -> StreamMetricsListener:
    """Register a fresh collector on the session's listener bus
    (BatchListener registration analog). Caller detaches with
    :func:`detach_metrics`."""
    listener = StreamMetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark: SparkSession, listener: StreamMetricsListener) -> None:
    spark.streams.removeListener(listener)
