"""Adapter tests: retry backoff, sink validation guard, batched push."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pulsar_spark_spark.sources.adapters import (
    push_partitions,
    validate_for_sink,
    with_retry,
)


class Flaky:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, x):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ValueError("transient")
        return x * 2


def test_retry_recovers_after_transient_failures():
    f = Flaky(fail_times=2)
    assert with_retry(f, attempts=3, base_delay_s=0.001)(21) == 42
    assert f.calls == 3


def test_retry_reraises_after_exhaustion():
    f = Flaky(fail_times=5)
    with pytest.raises(ValueError):
        with_retry(f, attempts=3, base_delay_s=0.001)(1)
    assert f.calls == 3


def test_validate_for_sink_splits(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "c", None), (4, "d", 4.0)],
        "k bigint, name string, v double",
    )
    valid, rejected = validate_for_sink(df, ["name", "v"])
    assert sorted(r["k"] for r in valid.collect()) == [1, 4]
    assert sorted(r["k"] for r in rejected.collect()) == [2, 3]


def test_push_partitions_batches(spark, tmp_path):
    out = str(tmp_path / "pushed")
    os.makedirs(out, exist_ok=True)

    def poster(rows: list[dict]) -> None:
        # executor-side collector: one file per posted batch
        with open(os.path.join(out, f"{uuid.uuid4().hex}.json"), "w") as f:
            json.dump(rows, f)

    df = spark.range(450).withColumnRenamed("id", "k").coalesce(1)
    push_partitions(df, poster, batch_size=200)
    batches = []
    for fname in os.listdir(out):
        with open(os.path.join(out, fname)) as f:
            batches.append(json.load(f))
    sizes = sorted(len(b) for b in batches)
    assert sizes == [50, 200, 200]  # reference group size, remainder last
    got = sorted(r["k"] for b in batches for r in b)
    assert got == list(range(450))
