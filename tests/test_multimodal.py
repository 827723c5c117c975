"""Multimodal plumbing tests: binary schema, mapInPandas batch shape,
feature values vs local numpy recomputation, frame-expansion math,
and the env-gated real-decode stub."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pulsar_spark_spark.plans import ORACLES, QUERIES
from pulsar_spark_spark.plans.multimodal import (
    decode_image_real,
    fake_decode_features,
    media_table,
)
from tests.conftest import SF_DIR_SMALL
from tests.oracle_utils import compare


def test_media_schema_and_determinism(spark):
    m = media_table(spark, SF_DIR_SMALL)
    d = dict(m.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<width:int,height:int,n_frames:int")
    rows = m.orderBy("media_id").limit(5).collect()
    rows2 = media_table(spark, SF_DIR_SMALL).orderBy("media_id").limit(5).collect()
    assert [bytes(r["payload"]) for r in rows] == [bytes(r["payload"]) for r in rows2]
    assert all(len(bytes(r["payload"])) == 64 for r in rows)


def test_metadata_stats_oracle(spark, duck):
    spdf = QUERIES["media_metadata_stats"](spark, "/root/testdata/sf0.01").toPandas()
    dpdf = duck.execute(ORACLES["media_metadata_stats"]).fetchdf()
    probs = compare(spdf, dpdf)
    assert not probs, probs
    # every payload must survive the base64 round-trip (F11)
    assert (spdf["n_b64_ok"] == spdf["n_media"]).all()


def _pool2(payload: bytes) -> np.ndarray:
    mat = np.frombuffer(payload, dtype=np.uint8).astype(np.float64).reshape(8, 8)
    return mat.reshape(4, 2, 4, 2).sum(axis=(1, 3)) / 4.0


def test_feature_extract_matches_local_numpy(spark):
    m = media_table(spark, SF_DIR_SMALL)
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in m.limit(20).collect()
    }
    got = {
        r["media_id"]: r
        for r in QUERIES["media_feature_extract"](spark, SF_DIR_SMALL).collect()
    }
    assert len(got) == m.count()
    for mid, payload in payloads.items():
        mean, std, hist = fake_decode_features(payload)
        assert got[mid]["n_bytes"] == 64
        assert got[mid]["byte_mean"] == pytest.approx(round(mean, 6))
        assert got[mid]["byte_std"] == pytest.approx(round(std, 6))
        assert got[mid]["hist_bin1"] == pytest.approx(round(hist[0], 6))
        # fused resize columns (the former media_resize query)
        pooled = _pool2(payload)
        assert got[mid]["r00"] == pooled[0, 0] and got[mid]["r33"] == pooled[3, 3]
        assert got[mid]["r03"] == pooled[0, 3] and got[mid]["r30"] == pooled[3, 0]
        assert got[mid]["pool_sum"] == pytest.approx(pooled.sum())


def test_standalone_resize_matches_fused_columns(spark):
    """resize_pool2 (no longer its own registered query) must agree
    bit-for-bit with the pooled columns of the fused pipeline."""
    from pulsar_spark_spark.plans.multimodal import media_resize

    fused = {
        r["media_id"]: r
        for r in QUERIES["media_feature_extract"](spark, SF_DIR_SMALL).collect()
    }
    for r in media_resize(spark, SF_DIR_SMALL).collect():
        f = fused[r["media_id"]]
        assert (r["r00"], r["r03"], r["r30"], r["r33"], r["pool_sum"]) == (
            f["r00"], f["r03"], f["r30"], f["r33"], f["pool_sum"]
        )


def test_frame_sample_expansion(spark):
    m = media_table(spark, SF_DIR_SMALL)
    videos = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in m.filter("media_type = 'video'").collect()
    }
    rows = QUERIES["media_frame_sample"](spark, SF_DIR_SMALL).collect()
    per_media: dict = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    assert set(per_media) == set(videos)
    for mid, n_frames in videos.items():
        got = sorted(r["frame_idx"] for r in per_media[mid])
        assert got == list(range(0, n_frames, 8))  # ceil(n/8) sampled frames
        assert all(r["frame_len"] == 64 for r in per_media[mid])
        assert len(got) == math.ceil(n_frames / 8)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n")


def test_fake_decode_is_pure():
    payload = bytes(range(64))
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    mean, std, hist = fake_decode_features(payload)
    assert mean == a.mean() and std == a.std()
    assert sum(hist) == pytest.approx(1.0)
