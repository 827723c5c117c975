"""Command-line entry point: ``python -m pulsar_spark_spark ...``.

The reference ships every pipeline as a spark-submit job with a main
class (spark-jobs/pom.xml builds one fat jar; apps like
streaming/StreamingAppV3.scala and batch/AccuracyAnalysis.scala are
launched by class name). This is the same launch surface for this
engine: every registered query is runnable by name from a shell, plus
an ad-hoc SQL mode over the registered tables/functions/views.

Subcommands
-----------
- ``list``                         registered query names (one per line)
- ``run <query> [...]``            run a registered query, print or write
- ``sql "<statement>" [...]``      run ad-hoc SQL with the full surface
                                   (functions + tables + derived +
                                   query views) registered
- ``oracle <query>``               print the query's DuckDB oracle SQL

Common options: ``--sf-dir`` (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.01), ``--output PATH --format parquet|csv|json``
to write instead of printing, ``--limit N`` for show (default 20),
``--master`` (default local[$SPARK_GRAFT_CPUS]).
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pulsar_spark_spark",
        description="PySpark-native analytics engine CLI",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
            help="fixture directory with the parquet tables",
        )
        sp.add_argument("--master", default=None, help="Spark master override")
        sp.add_argument("--output", default=None, help="write result here")
        sp.add_argument(
            "--format", default="parquet", choices=("parquet", "csv", "json")
        )
        sp.add_argument("--limit", type=int, default=20, help="rows to print")

    sub.add_parser("list", help="list registered query names")

    runp = sub.add_parser("run", help="run a registered query by name")
    runp.add_argument("query")
    common(runp)

    sqlp = sub.add_parser("sql", help="run ad-hoc SQL over the full surface")
    sqlp.add_argument("statement")
    sqlp.add_argument(
        "--views",
        action="store_true",
        help="also register every engine query and derived relation as "
        "a view (builds all 50 query plans up front — slower startup; "
        "default registers functions + tables only)",
    )
    common(sqlp)

    orp = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orp.add_argument("query")

    chk = sub.add_parser(
        "check", help="verify the fixture-schema contract under --sf-dir"
    )
    common(chk)
    return p


def _session(master: str | None):
    from pulsar_spark_spark.session import get_session

    s = get_session(app_name="pulsar_spark_spark_cli", master=master)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _emit(df, args) -> None:
    if args.output:
        w = df.write.mode("overwrite")
        if args.format == "csv":
            w = w.option("header", "true")
        getattr(w, args.format)(args.output)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        from pulsar_spark_spark.plans import QUERIES

        for name in QUERIES:
            print(name)
        return 0

    if args.cmd == "oracle":
        from pulsar_spark_spark.plans import ORACLES

        if args.query not in ORACLES:
            print(f"no oracle for {args.query!r}", file=sys.stderr)
            return 2
        print(ORACLES[args.query])
        return 0

    if args.cmd == "run":
        from pulsar_spark_spark.plans import QUERIES

        if args.query not in QUERIES:
            print(
                f"unknown query {args.query!r} — see `list`", file=sys.stderr
            )
            return 2
        spark = _session(args.master)
        _emit(QUERIES[args.query](spark, args.sf_dir), args)
        return 0

    if args.cmd == "check":
        from pulsar_spark_spark.sources.contracts import fixture_contract_report

        spark = _session(args.master)
        problems = fixture_contract_report(spark, args.sf_dir)
        if problems:
            for p in problems:
                print(p, file=sys.stderr)
            return 1
        print(f"contract OK under {args.sf_dir}")
        return 0

    if args.cmd == "sql":
        from pulsar_spark_spark.sql import (
            register_all,
            register_functions,
            register_tables,
        )

        spark = _session(args.master)
        if args.views:
            register_all(spark, args.sf_dir)
        else:
            # functions + tables only: a trivial statement shouldn't
            # pay for building all 50 query-view plans up front
            register_functions(spark)
            register_tables(spark, args.sf_dir)
        _emit(spark.sql(args.statement), args)
        return 0

    return 2  # pragma: no cover - argparse enforces the choices


if __name__ == "__main__":
    sys.exit(main())
