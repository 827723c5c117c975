"""Measured numeric margins behind the G2+G4 value oracle.

plans/kernels.py:_g2g4_oracle upgrades ``cluster_score_per_user`` from
rows-only to a hash-exact oracle on the strength of three measured
properties of the sf0.01 fixture (the scale the driver's gate runs
at). This module pins each one, so a fixture or kernel change that
erodes a margin fails HERE with a number, not in the driver gate with
a bare hash mismatch:

1. G2 candidate-band separation: no exact float score ties at any
   user's max, and the top-two DISTINCT scores are ≥ 1e-4 relative
   apart (measured 2.3e-3) — so the oracle's 1e-6 band admits exactly
   the kernel's candidate set while cross-engine wobble (~1e-9
   relative) cannot move a score across the band edge.
2. Decision stability: neither kernel changes ANY output under 1e-9
   relative multiplicative noise on every distance — 1000× the real
   numpy↔SQL atan2 wobble (~1e-9 m on metre-scale distances).
3. G4 rounding robustness: after the +1e-10° nudge, every centroid
   sits ≥ 1e-5 grid-units from a 6 dp rounding half-boundary
   (engine-order summation spread measured ≤ 4.3e-14° ≈ 4e-8 units).
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np
import pytest

import pulsar_spark_spark.operators.geo_kernels as gk
from pulsar_spark_spark.plans.geo import _SQL_GEO_EVENTS
from pulsar_spark_spark.plans.kernels import _CENTROID_NUDGE

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def geo_groups():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    rows = con.execute(
        f"""
        SELECT user_id, lat, lng, accuracy
        FROM (SELECT user_id, event_id,
                     (epoch_ns(ts) // 1000) // 1000 AS ts_ms,
                     lat, lng, accuracy
              FROM ({_SQL_GEO_EVENTS}))
        ORDER BY user_id, ts_ms, event_id
        """
    ).fetchall()
    groups = defaultdict(list)
    for u, la, ln, a in rows:
        groups[u].append((la, ln, a))
    return groups


def test_g2_score_band_separation(geo_groups):
    min_rel_gap = 1.0
    for pts in geo_groups.values():
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        if len(lats) < 3:
            continue
        _uniq, score, _count = gk._score_maps(lats, lngs, 200.0)
        vals = sorted(set(score.values()), reverse=True)
        assert (
            sum(1 for s in score.values() if s == vals[0]) == 1
        ), "exact float tie at max score — band oracle assumption broken"
        if len(vals) > 1:
            min_rel_gap = min(min_rel_gap, (vals[0] - vals[1]) / vals[0])
    # oracle band is 1e-6; engine wobble ~1e-9 — require 100× headroom
    # above the band on the fixture (measured 2.3e-3).
    assert min_rel_gap > 1e-4, f"distinct-score gap shrank to {min_rel_gap:.3e}"


def test_kernel_decisions_stable_under_distance_noise(geo_groups):
    orig = gk.vincenty_np
    base_g2, base_g4 = {}, {}
    for u, pts in geo_groups.items():
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        accs = np.array([p[2] for p in pts])
        base_g2[u] = gk.best_lat_lng_with_cluster_score(lats, lngs)
        base_g4[u] = gk.trimmed_centroid(lats, lngs, accs)

    state = {}

    def noisy(lat1, lng1, lat2, lng2):
        d = orig(lat1, lng1, lat2, lng2)
        return d * (1.0 + (state["rng"].random(d.shape) * 2 - 1) * 1e-9)

    gk.vincenty_np = noisy
    try:
        for trial in range(3):
            state["rng"] = np.random.default_rng(1000 + trial)
            for u, pts in geo_groups.items():
                lats = np.array([p[0] for p in pts])
                lngs = np.array([p[1] for p in pts])
                accs = np.array([p[2] for p in pts])
                assert gk.best_lat_lng_with_cluster_score(lats, lngs) == base_g2[u]
                got = gk.trimmed_centroid(lats, lngs, accs)
                assert got == base_g4[u], f"G4 trim decision flipped, user {u}"
    finally:
        gk.vincenty_np = orig


@pytest.fixture(scope="module")
def refinement_inputs(geo_groups):
    """Per-delivery refinement inputs on the compressed clock (the
    registered query's T4 interval-join shape, rebuilt directly)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    rows = con.execute(
        f"""
        SELECT user_id, event_id, event_type,
               ((epoch_ns(ts) // 1000) // 1000) // 1500 AS ts_ms,
               lat, lng, accuracy
        FROM ({_SQL_GEO_EVENTS})
        ORDER BY user_id, ts_ms, event_id
        """
    ).fetchall()
    pts = defaultdict(list)
    dels = []
    for u, ev, et, t, la, ln, a in rows:
        pts[u].append((int(t), la, ln, a, ev))
        if et == "purchase":
            dels.append((u, ev, int(t), la, ln, a))
    out = []
    for u, ev, t, la, ln, a in dels:
        pl = [
            (p[0], p[1], p[2], p[3])
            for p in sorted(pts[u], key=lambda p: (p[0], p[4]))
            if p[3] <= 100.0 and t - 120_000 <= p[0] <= t + 300_000
        ]
        out.append((ev, la, ln, t, a, pl))
    return out


def test_g5g7_refinement_stable_under_distance_noise(refinement_inputs):
    """Zero output flips across the full G5→G6→G3/G4 chain under 1e-9
    relative noise on every distance — the measurement behind the
    round-6 delivery_refinement / delivery_refined_history oracles."""
    orig_py, orig_np = gk.vincenty_py, gk.vincenty_np
    base = {
        ev: gk.refine_delivery(la, ln, t, a, pl)
        for ev, la, ln, t, a, pl in refinement_inputs
    }
    assert sum(1 for v in base.values() if v[0]) > 100  # chain really runs

    state = {}

    def noisy_py(a, b, c, d):
        return orig_py(a, b, c, d) * (
            1.0 + (state["rng"].random() * 2 - 1) * 1e-9
        )

    def noisy_np(a, b, c, d):
        v = orig_np(a, b, c, d)
        return v * (1.0 + (state["rng"].random(v.shape) * 2 - 1) * 1e-9)

    gk.vincenty_py, gk.vincenty_np = noisy_py, noisy_np
    try:
        for trial in range(2):
            state["rng"] = np.random.default_rng(7000 + trial)
            for ev, la, ln, t, a, pl in refinement_inputs:
                assert gk.refine_delivery(la, ln, t, a, pl) == base[ev], (
                    f"refinement output flipped, delivery {ev}"
                )
    finally:
        gk.vincenty_py, gk.vincenty_np = orig_py, orig_np


def test_refinement_centroid_rounding_margin(refinement_inputs):
    """The CLUSTER_CENTROID rows are the only computed doubles on the
    refinement surface; after the nudge they must clear every 6 dp
    half-boundary (same grid-rational argument as G4 — cluster
    centroids are s/m means of 1e-6-grid coordinates)."""
    min_half = 1.0
    n_centroids = 0
    for _ev, la, ln, t, a, pl in refinement_inputs:
        _refined, results = gk.refine_delivery(la, ln, t, a, pl)
        for lat, lng, label in results:
            if label != "CLUSTER_CENTROID":
                continue
            n_centroids += 1
            for v in (lat, lng):
                scaled = (v + _CENTROID_NUDGE) * 1e6
                min_half = min(
                    min_half, abs(scaled - math.floor(scaled) - 0.5)
                )
    assert n_centroids > 100
    assert min_half > 1e-5, f"6dp half-boundary margin {min_half:.3e}"


def test_g4_rounding_boundary_margin(geo_groups):
    min_half = 1.0
    for pts in geo_groups.values():
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        accs = np.array([p[2] for p in pts])
        cen = gk.trimmed_centroid(lats, lngs, accs)
        if cen is None:
            continue
        for v in cen:
            scaled = (v + _CENTROID_NUDGE) * 1e6
            min_half = min(min_half, abs(scaled - math.floor(scaled) - 0.5))
    # engine summation-order spread is ~4e-8 grid-units; require 250×.
    assert min_half > 1e-5, f"6dp half-boundary margin shrank to {min_half:.3e}"
