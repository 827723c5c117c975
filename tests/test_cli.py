"""The `python -m pulsar_spark_spark` launch surface (reference
analog: spark-submit job mains, spark-jobs/pom.xml fat-jar classes)."""

from __future__ import annotations

import os

from pulsar_spark_spark.__main__ import main
from tests.conftest import SF_DIR_SMALL


def test_list_prints_all_queries(spark, capsys):
    from pulsar_spark_spark.plans import QUERIES

    assert main(["list"]) == 0
    out = capsys.readouterr().out.split()
    assert out == list(QUERIES)


def test_oracle_prints_sql(spark, capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    assert main(["oracle", "nope"]) == 2


def test_run_writes_csv(spark, tmp_path):
    out = str(tmp_path / "q1")
    rc = main(
        [
            "run", "q1_pricing_summary",
            "--sf-dir", SF_DIR_SMALL,
            "--output", out, "--format", "csv",
        ]
    )
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    header = open(os.path.join(out, files[0])).readline().strip().split(",")
    assert header[:2] == ["l_returnflag", "l_linestatus"]
    assert main(["run", "nope"]) == 2


def test_check_contract(spark, capsys, tmp_path):
    assert main(["check", "--sf-dir", SF_DIR_SMALL]) == 0
    assert "contract OK" in capsys.readouterr().out
    # drifted dir -> nonzero exit, problems on stderr
    ev = spark.read.parquet(os.path.join(SF_DIR_SMALL, "events.parquet"))
    ev.drop("value").write.parquet(str(tmp_path / "events.parquet"))
    assert main(["check", "--sf-dir", str(tmp_path)]) == 1
    assert "events.value: MISSING" in capsys.readouterr().err


def test_sql_over_registered_surface(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM documents WHERE lang_id(text) = 'en'",
            "--sf-dir", SF_DIR_SMALL,
        ]
    )
    assert rc == 0
    assert "n" in capsys.readouterr().out
