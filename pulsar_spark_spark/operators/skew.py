"""Skew-mitigation operators: salted equi-join and salted heavy aggs.

At 100 TB a hot join key turns one shuffle partition into the job's
critical path (one straggler task holds the n_hot × m rows). AQE's
skew-join split handles sort-merge joins automatically, but two shapes
still need manual salting:

- a hot-key equi-join where the build side must be replicated anyway
  (AQE can split the probe side, but per-key output order / grouping
  downstream re-concentrates the key), and
- non-reducing aggregations (``collect_list``-style), where map-side
  partial aggregation cannot shrink a hot key's data before the
  shuffle.

``salted_equi_join`` keeps results IDENTICAL to a plain equi-join:
the probe side gets a deterministic salt from an existing high-card
column (never ``rand()`` — keeps retries/oracles deterministic), the
dim side is exploded × n_salt, and the join key becomes (key, salt) so
a hot key spreads over n_salt partitions. Replication cost is
|dim| × n_salt rows — use for dims too big to broadcast but far
smaller than the fact side.

Reference lineage: the reference relies on partition-count repartition
only (X1, SmartAddressBuildService.scala:92 ``repartition(400)``);
salting is part of the scale surface this engine adds on top.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with an ``n_salt``-way salt.

    ``salt_src`` must be a deterministic, roughly-uniform expression
    over fact columns (an id hash, never ``rand()``). The dim side is
    exploded with every salt value, so each (key, salt) bucket holds
    ~1/n_salt of a hot key's fact rows and exactly one copy of its dim
    row. Result is row-identical to ``fact.join(dim, key, how)``.
    """
    f = fact.withColumn(SALT_COL, F.pmod(salt_src, F.lit(n_salt)).cast("int"))
    d = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    return f.join(d, [key, SALT_COL], how).drop(SALT_COL)


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: Column,
    salt_src: Column,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase ``collect_list`` for skewed keys: partial collect per
    (key, salt), then flatten per key. The first shuffle spreads a hot
    key over ``n_salt`` partitions and the second moves n_salt
    already-packed arrays per key instead of every row.

    NOTE: list order is salt-major and therefore differs from a
    single-phase collect (which is itself unordered in Spark) — sort
    the flattened array afterwards if order matters.
    """
    partial = (
        df.withColumn(SALT_COL, F.pmod(salt_src, F.lit(n_salt)).cast("int"))
        .groupBy(key, SALT_COL)
        .agg(F.collect_list(value).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("__part")).alias("values"))
    )
