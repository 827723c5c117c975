"""Property-based tests (hypothesis) — the level SURVEY §5 notes the
reference lacks entirely.

Pure-Python properties (no SparkSession): the scalar↔batch Vincenty
bit-parity contract, geohash structure, and kernel↔transliteration
equivalence on adversarial random inputs (duplicate coordinates, the
lat==0 sentinel, tiny groups) far beyond the fixed-seed spot checks in
test_geo_kernels.py.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_spark_spark.functions.geo import (
    geohash_decode_py,
    geohash_encode_py,
    vincenty_np,
    vincenty_py,
)
from pulsar_spark_spark.operators.geo_kernels import (
    best_lat_lng,
    best_lat_lng_with_cluster_score,
    cluster_best_lat_lng_with_score,
    trimmed_centroid,
)
from tests import geo_oracle

# The fixture's geographic domain (plans/geo.py) with slack.
lat_st = st.floats(min_value=1.0, max_value=42.0, allow_nan=False)
lng_st = st.floats(min_value=58.0, max_value=102.0, allow_nan=False)


# ---------------------------------------------------------------------
# F1: scalar and batch Vincenty are bit-identical (the contract every
# kernel and the SQL oracle margin analysis rely on)
# ---------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(lat1=lat_st, lng1=lng_st, lat2=lat_st, lng2=lng_st)
def test_vincenty_scalar_batch_bit_identical(lat1, lng1, lat2, lng2):
    s = vincenty_py(lat1, lng1, lat2, lng2)
    b = float(vincenty_np(np.array([lat1]), np.array([lng1]),
                          np.array([lat2]), np.array([lng2]))[0])
    assert s == b  # bitwise, not approx


@settings(max_examples=50, deadline=None)
@given(lat=lat_st, lng=lng_st)
def test_vincenty_identity_and_sentinel(lat, lng):
    assert vincenty_py(lat, lng, lat, lng) == 0.0
    assert vincenty_py(0.0, lng, lat, lng) == 1.0e7
    assert vincenty_py(lat, lng, 0.0, lng) == 1.0e7


@settings(max_examples=100, deadline=None)
@given(lat1=lat_st, lng1=lng_st, lat2=lat_st, lng2=lng_st)
def test_vincenty_near_symmetric_and_sane(lat1, lng1, lat2, lng2):
    """Directions agree to float noise (NOT bitwise — documented), and
    the ellipsoidal distance stays within 0.7% of spherical."""
    d1 = vincenty_py(lat1, lng1, lat2, lng2)
    d2 = vincenty_py(lat2, lng2, lat1, lng1)
    assert d1 == pytest.approx(d2, rel=1e-9, abs=1e-6)
    from pulsar_spark_spark.functions.geo import haversine_py

    h = haversine_py(lat1, lng1, lat2, lng2)
    if d1 > 1.0:  # below a meter the relative bound is meaningless
        assert abs(d1 - h) / d1 < 0.007


# ---------------------------------------------------------------------
# F3: geohash structural properties
# ---------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(lat=st.floats(-89.9, 89.9, allow_nan=False),
       lng=st.floats(-179.9, 179.9, allow_nan=False),
       precision=st.integers(1, 12))
def test_geohash_prefix_and_roundtrip(lat, lng, precision):
    full = geohash_encode_py(lat, lng, 12)
    assert geohash_encode_py(lat, lng, precision) == full[:precision]
    clat, clng = geohash_decode_py(full[:precision])
    # decoded center is within the cell: half-cell in each axis
    nbits = 5 * precision
    lng_cell = 360.0 / (1 << ((nbits + 1) // 2))
    lat_cell = 180.0 / (1 << (nbits // 2))
    assert abs(clat - lat) <= lat_cell and abs(clng - lng) <= lng_cell


# ---------------------------------------------------------------------
# G1/G2/G3/G4 kernels == independent transliteration on adversarial
# clouds: duplicated coordinates, micro/macro jitter, tiny n
# ---------------------------------------------------------------------
cloud_st = st.lists(
    st.tuples(
        st.integers(-300, 300),   # lat jitter steps
        st.integers(-300, 300),   # lng jitter steps
        st.integers(0, 3),        # duplicate multiplicity - 1
        st.integers(0, 350),      # accuracy
    ),
    min_size=1,
    max_size=25,
)


def _expand(base_lat, base_lng, cloud):
    lats, lngs, accs = [], [], []
    for dla, dln, dup, acc in cloud:
        for _ in range(dup + 1):
            lats.append(base_lat + dla * 1e-5)
            lngs.append(base_lng + dln * 1e-5)
            accs.append(float(acc))
    return np.array(lats), np.array(lngs), np.array(accs)


@settings(max_examples=60, deadline=None)
@given(base_lat=st.floats(5.0, 38.0), base_lng=st.floats(62.0, 98.0),
       cloud=cloud_st)
def test_g1_matches_transliteration(base_lat, base_lng, cloud):
    lats, lngs, _ = _expand(base_lat, base_lng, cloud)
    got = best_lat_lng(lats, lngs)
    want = geo_oracle.best_lat_lng_oracle(list(zip(lats, lngs)))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(base_lat=st.floats(5.0, 38.0), base_lng=st.floats(62.0, 98.0),
       cloud=cloud_st)
def test_g2_matches_transliteration(base_lat, base_lng, cloud):
    lats, lngs, _ = _expand(base_lat, base_lng, cloud)
    got = best_lat_lng_with_cluster_score(lats, lngs)
    want = geo_oracle.cluster_score_oracle(list(zip(lats, lngs)))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(base_lat=st.floats(5.0, 38.0), base_lng=st.floats(62.0, 98.0),
       cloud=cloud_st)
def test_g3_matches_transliteration(base_lat, base_lng, cloud):
    lats, lngs, _ = _expand(base_lat, base_lng, cloud)
    got = cluster_best_lat_lng_with_score(lats, lngs)
    want = geo_oracle.cluster_score_v3_oracle(list(zip(lats, lngs)))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(base_lat=st.floats(5.0, 38.0), base_lng=st.floats(62.0, 98.0),
       cloud=cloud_st)
def test_g4_matches_transliteration(base_lat, base_lng, cloud):
    lats, lngs, accs = _expand(base_lat, base_lng, cloud)
    got = trimmed_centroid(lats, lngs, accs)
    want = geo_oracle.trimmed_centroid_oracle(list(zip(lats, lngs, accs)))
    if got is None or want is None:
        assert got is None and want is None
    else:
        # centroid sums run pairwise (numpy) vs sequential (oracle) —
        # values agree to accumulated float noise, selection steps
        # (which points were trimmed) must agree exactly for this to
        # hold at such a tight bound
        assert got[0] == pytest.approx(want[0], abs=1e-9)
        assert got[1] == pytest.approx(want[1], abs=1e-9)


@settings(max_examples=40, deadline=None)
@given(cloud=cloud_st)
def test_g1_guard_returns_last_point(cloud):
    lats, lngs, _ = _expand(20.0, 77.0, cloud)
    if not (4 <= len(lats) <= 500):
        assert best_lat_lng(lats, lngs) == (float(lats[-1]), float(lngs[-1]))
    else:
        n = len(lats)
        big_lats = np.tile(lats, (501 // n) + 1)[:501]
        big_lngs = np.tile(lngs, (501 // n) + 1)[:501]
        assert best_lat_lng(big_lats, big_lngs) == (
            float(big_lats[-1]), float(big_lngs[-1]))
