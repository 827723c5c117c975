"""Reliable-checkpoint switch (operators/checkpoint.py).

localCheckpoint blocks are not recomputable on executor loss, so real
clusters flip materialize() to reliable checkpoints. These tests pin:
the switch actually routes through sparkContext.setCheckpointDir
(files appear under the dir), results are identical in both modes for
a checkpoint-heavy query, and the env bootstrap wires through.
"""

from __future__ import annotations

import os

import pytest

from pulsar_spark_spark.operators.checkpoint import (
    configure_reliable_checkpoints,
    materialize,
    reliable_enabled,
)
from pulsar_spark_spark.plans import QUERIES
from tests.conftest import SF_DIR_SMALL


@pytest.fixture()
def reliable_ckpt(spark, tmp_path):
    d = str(tmp_path / "reliable_ckpt")
    configure_reliable_checkpoints(spark, d)
    yield d
    configure_reliable_checkpoints(spark, None)


def _tree_files(root: str) -> list[str]:
    out = []
    for base, _dirs, files in os.walk(root):
        out.extend(os.path.join(base, f) for f in files)
    return out


def test_materialize_writes_reliable_blocks(spark, reliable_ckpt):
    df = materialize(spark.range(100).withColumnRenamed("id", "v"))
    assert reliable_enabled()
    assert df.count() == 100
    assert df.agg({"v": "sum"}).first()[0] == 4950
    # the lazy checkpoint materialized into the configured dir
    assert _tree_files(reliable_ckpt), "no reliable checkpoint files written"


def test_checkpoint_heavy_query_identical_under_reliable(spark, tmp_path):
    """doc_near_dup_pairs materializes its MinHash scratch relation via
    materialize(); the switch must not change a single value."""
    want = [tuple(r) for r in QUERIES["doc_near_dup_pairs"](spark, SF_DIR_SMALL).collect()]
    configure_reliable_checkpoints(spark, str(tmp_path / "ck"))
    try:
        got = [tuple(r) for r in QUERIES["doc_near_dup_pairs"](spark, SF_DIR_SMALL).collect()]
    finally:
        configure_reliable_checkpoints(spark, None)
    assert got == want
    assert _tree_files(str(tmp_path / "ck"))


def test_kernel_query_runs_under_reliable(spark, reliable_ckpt):
    """_sorted_out (kernel pre-sort materialization) under the reliable
    path: one row per user, exactly as local mode."""
    from pulsar_spark_spark.sources.tables import load_table

    n_users = (
        load_table(spark, "events", SF_DIR_SMALL).select("user_id").distinct().count()
    )
    rows = QUERIES["best_latlng_per_user"](spark, SF_DIR_SMALL).collect()
    assert len(rows) == n_users


def test_switch_resets(spark, tmp_path):
    configure_reliable_checkpoints(spark, str(tmp_path / "x"))
    assert reliable_enabled()
    configure_reliable_checkpoints(spark, None)
    assert not reliable_enabled()


def test_env_bootstrap(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT_DIR wires the reliable mode at session
    bootstrap (the cluster deployment path)."""
    from pulsar_spark_spark.operators import checkpoint as cp

    monkeypatch.setenv(cp.ENV_CHECKPOINT_DIR, str(tmp_path / "envck"))
    cp.configure_from_env(spark)
    try:
        assert cp.reliable_enabled()
        df = cp.materialize(spark.range(10))
        assert df.count() == 10
        assert _tree_files(str(tmp_path / "envck"))
    finally:
        cp.configure_reliable_checkpoints(spark, None)

    monkeypatch.delenv(cp.ENV_CHECKPOINT_DIR)
    cp.configure_from_env(spark)  # absent env → stays local
    assert not cp.reliable_enabled()
