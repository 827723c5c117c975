"""Fixture-schema contracts: make dataset drift fail LOUDLY.

Round 3 of this build was zeroed by a silent parquet dtype drift
(events.ts changed encoding and five modules miscomputed epoch math
until the oracles caught it at the driver gate). The loader now
normalizes encodings (sources/tables.py::_normalize_timestamps), and
this module pins what every query is entitled to assume AFTER that
normalization: if a regenerated dataset ships a new column type, the
run fails at load with a message naming every drifted column, instead
of producing silently-wrong epoch arithmetic three plans downstream.

``EXPECTED`` is the post-loader contract, not the raw parquet footer —
e.g. ``events.ts`` is TIMESTAMP here even when the file stores
TIMESTAMP(NANOS) as int64. Extra columns are allowed (additive schema
evolution is fine); missing columns and type changes are violations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# table -> {column -> Catalyst simpleString type} (post-normalization)
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def _check_catalog_sync() -> None:
    """EXPECTED must track the table catalog exactly — a table added
    to sources/tables.TABLES without a schema contract would silently
    escape the drift gate."""
    from pulsar_spark_spark.sources.tables import TABLES

    if set(EXPECTED) != set(TABLES):  # explicit raise: `python -O`
        # strips asserts, and this gate must survive optimized runs
        raise RuntimeError(
            f"contracts.EXPECTED out of sync with tables.TABLES: "
            f"missing={set(TABLES) - set(EXPECTED)}, "
            f"stale={set(EXPECTED) - set(TABLES)}"
        )


def fixture_contract_report(spark: SparkSession, sf_dir: str) -> list[str]:
    """Every contract violation under ``sf_dir``, one message each.

    Checks only tables present on disk (partial dirs are a supported
    input) — but reports a violation if NO contract table exists at
    all: a nonexistent or typo'd ``sf_dir`` must not read as a clean
    contract. Empty list = contract holds.
    """
    import os

    _check_catalog_sync()
    from pulsar_spark_spark.sources.tables import load_table

    if not any(
        os.path.exists(os.path.join(sf_dir, f"{t}.parquet")) for t in EXPECTED
    ):
        return [f"no fixture tables found under {sf_dir}"]
    problems: list[str] = []
    for table, expected in EXPECTED.items():
        if not os.path.exists(os.path.join(sf_dir, f"{table}.parquet")):
            continue
        actual = {
            f.name: f.dataType.simpleString()
            for f in load_table(spark, table, sf_dir).schema.fields
        }
        for colname, want in expected.items():
            got = actual.get(colname)
            if got is None:
                problems.append(f"{table}.{colname}: MISSING (expected {want})")
            elif got != want:
                problems.append(f"{table}.{colname}: {got} (expected {want})")
    return problems


def assert_fixture_contract(spark: SparkSession, sf_dir: str) -> None:
    """Raise with EVERY violation listed if the contract is broken."""
    problems = fixture_contract_report(spark, sf_dir)
    if problems:
        raise AssertionError(
            f"fixture contract violated under {sf_dir} "
            f"({len(problems)} problem(s)):\n  " + "\n  ".join(problems)
        )
