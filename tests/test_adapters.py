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


def test_validate_for_sink_no_required_cols_is_all_valid(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    valid, rejected = validate_for_sink(df, [])
    assert valid.count() == 2 and rejected.count() == 0


def test_rate_planner_zero_backlog_with_estimate():
    from pulsar_spark_spark.streaming.rate import (
        RateConfig,
        compute_max_entries_per_partition,
    )

    got = compute_max_entries_per_partition(
        25, {"p0": 0, "p1": 0}, 5000, RateConfig(max_rate_per_partition=20.0)
    )
    assert got == {"p0": 0, "p1": 0}  # no division by zero, budgets 0


def test_kv_map_builders_pin_dedup_policy(spark):
    """Map builders must work on a session that never loaded a catalog
    table (the conf is pinned at expression-build time, not only as a
    load_table side effect)."""
    import pyspark.sql.functions as F

    from pulsar_spark_spark.functions.maps import kv_list_to_map_last_wins

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    df = spark.createDataFrame(
        [([("a", "1"), ("a", "2")],)],
        "kv array<struct<key string, value string>>",
    )
    row = df.select(
        F.element_at(kv_list_to_map_last_wins(F.col("kv")), "a").alias("v")
    ).first()
    assert row["v"] == "2"  # last wins, no DUPLICATED_MAP_KEY error


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


def test_email_report_gate_and_payload(spark, tmp_path, monkeypatch):
    """K5 analog: env-gated like the reference's APP_ENV=='nm' check
    (AccuracyAnalysis.scala:168-181); the built payload carries the
    K2 CSV report as attachment bytes."""
    from pulsar_spark_spark.sources.adapters import email_report
    from pulsar_spark_spark.sources.sinks import write_csv_report

    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], ["event_type", "n"]
    ).coalesce(1)
    csv_path = write_csv_report(df, str(tmp_path / "report.csv"))

    sent: list[dict] = []

    # gate closed (reference: env != "nm" -> no mail) — nothing built
    monkeypatch.delenv("SPARK_GRAFT_MAIL_ENV", raising=False)
    assert (
        email_report(csv_path, "s", "m", ["x@y"], mailer=sent.append) is None
    )
    assert sent == []

    # gate open — payload built and handed to the mailer
    monkeypatch.setenv("SPARK_GRAFT_MAIL_ENV", "nm")
    payload = email_report(
        csv_path,
        "Data Accuracy Report",
        "PFA the report....",
        ["flip-dev@example.com"],
        cc=["sourav@example.com"],
        mailer=sent.append,
    )
    assert sent == [payload]
    assert payload["subject"] == "Data Accuracy Report"
    assert payload["to"] == ["flip-dev@example.com"]
    assert payload["cc"] == ["sourav@example.com"]
    assert payload["attachment_name"] == "report.csv"
    with open(csv_path, "rb") as f:
        assert payload["attachment"] == f.read()

    # gate open but nothing configured — loud, not a silent drop
    with pytest.raises(ValueError):
        email_report(csv_path, "s", "m", ["x@y"])
