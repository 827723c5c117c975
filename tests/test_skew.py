"""Salted-join / salted-collect equivalence to their plain forms."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from pulsar_spark_spark.operators.skew import salted_collect_list, salted_equi_join


def test_salted_equi_join_row_identical(spark):
    fact = spark.range(1000).select(
        (col("id") % 3).cast("string").alias("k"), col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [("0", 10), ("1", 20), ("2", 30)], "k string, w int"
    )
    plain = fact.join(dim, "k").select("k", "v", "w")
    salted = salted_equi_join(
        fact, dim, "k", salt_src=col("v"), n_salt=8
    ).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_equi_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([("a", 1), ("zzz", 2)], "k string, v int")
    dim = spark.createDataFrame([("a", 10)], "k string, w int")
    out = salted_equi_join(fact, dim, "k", salt_src=col("v"), n_salt=4, how="left")
    rows = {tuple(r) for r in out.select("k", "v", "w").collect()}
    assert rows == {("a", 1, 10), ("zzz", 2, None)}


def test_salted_collect_list_same_multiset(spark):
    df = spark.range(500).select(
        (col("id") % 2).alias("k"), col("id").alias("v")
    )
    out = salted_collect_list(df, "k", col("v"), salt_src=col("v"), n_salt=8)
    got = {r["k"]: sorted(r["values"]) for r in out.collect()}
    assert got == {0: list(range(0, 500, 2)), 1: list(range(1, 500, 2))}
