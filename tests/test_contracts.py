"""Fixture-schema contracts (sources/contracts.py): dataset drift must
fail loudly at load, not silently three plans downstream."""

from __future__ import annotations

import os

import pytest

from pulsar_spark_spark.sources.contracts import (
    EXPECTED,
    assert_fixture_contract,
    fixture_contract_report,
)
from tests.conftest import SF_DIR, SF_DIR_SMALL


def test_contract_holds_on_fixtures(spark):
    assert fixture_contract_report(spark, SF_DIR_SMALL) == []
    assert fixture_contract_report(spark, SF_DIR) == []
    assert_fixture_contract(spark, SF_DIR)  # no raise


def test_contract_flags_drift_and_missing_columns(spark, tmp_path):
    # events with ts re-typed to bigint AND value dropped — both must
    # be reported, in one pass
    ev = spark.read.parquet(os.path.join(SF_DIR_SMALL, "events.parquet"))
    drifted = ev.withColumn("ts", ev["ts"].cast("string")).drop("value")
    drifted.write.parquet(str(tmp_path / "events.parquet"))
    problems = fixture_contract_report(spark, str(tmp_path))
    assert any(p.startswith("events.ts:") for p in problems), problems
    assert any("events.value: MISSING" in p for p in problems), problems
    with pytest.raises(AssertionError, match="events.value"):
        assert_fixture_contract(spark, str(tmp_path))


def test_contract_flags_empty_or_typod_dir(spark, tmp_path):
    # a dir with no fixture tables at all (typo'd path, empty dir)
    # must be a violation, not a clean pass
    problems = fixture_contract_report(spark, str(tmp_path / "nope"))
    assert problems == [f"no fixture tables found under {tmp_path / 'nope'}"]
    with pytest.raises(AssertionError, match="no fixture tables"):
        assert_fixture_contract(spark, str(tmp_path / "nope"))


def test_contract_ignores_absent_tables_and_extra_columns(spark, tmp_path):
    # partial dir with only documents (plus an extra column) is clean
    docs = spark.read.parquet(os.path.join(SF_DIR_SMALL, "documents.parquet"))
    docs.withColumn("extra", docs["doc_id"] * 2).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    assert fixture_contract_report(spark, str(tmp_path)) == []
    assert set(EXPECTED) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
