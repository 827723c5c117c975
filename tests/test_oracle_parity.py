"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This mirrors the driver's CORRECTNESS gate so breakage surfaces locally.
"""

from __future__ import annotations

import pytest

from pulsar_spark_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    """Weak check for oracle-less queries: they run and have stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()
