"""Local mirror of the driver's Spark-vs-DuckDB correctness check.

Sorts columns by name, sorts rows, and compares values exactly
(floats must already be rounded inside the queries — that is part of
the contract, since the driver hashes values).
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} duck={list(b.columns)}"]
    # The driver's value-hash sees representation, not just value:
    # bigint 1 vs float64 1.0 hash-mismatch there even though == here.
    # Mirror that by requiring the same dtype *kind* per column
    # (int vs float vs object), which caught the round-1
    # user_sessions HUGEINT→float64 oracle divergence.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            problems.append(f"col {c}: dtype kind mismatch spark={a[c].dtype} duck={b[c].dtype}")
    if problems:
        return problems
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = 0
        first = None
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    bad += 1
                    first = first or (i, x, y)
            elif x != y:
                bad += 1
                first = first or (i, x, y)
        if bad:
            problems.append(f"col {c}: {bad}/{len(av)} differ, first at {first}")
    return problems
