"""G1-G7 kernel tests: hand-built semantic cases + Spark-vs-oracle
parity on the real geo projection at sf0.001.

The hand-built cases pin the reference quirks (guards, drop case,
tie directions, sentinel behavior); the parity tests run the full
applyInPandas queries and compare every group against the independent
loop oracle in tests/geo_oracle.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pulsar_spark_spark.operators.geo_kernels import (
    best_cluster,
    best_lat_lng,
    best_lat_lng_with_cluster_score,
    cluster_best_lat_lng_with_score,
    dbscan_clusters,
    merge_refined_history,
    trimmed_centroid,
)
from pulsar_spark_spark.plans import QUERIES
from pulsar_spark_spark.plans.geo import geo_events
from tests import geo_oracle
from tests.conftest import SF_DIR_SMALL

BLR = (12.9716, 77.5946)  # a realistic base point


def _jitter(base, dlat_m, dlng_m):
    # ~1e-5 deg ≈ 1.1 m in lat; cheap offsets for test geometry
    return (base[0] + dlat_m * 9e-6, base[1] + dlng_m * 9e-6)


# ---------------------------------------------------------------------
# G1
# ---------------------------------------------------------------------
class TestBestLatLng:
    def test_small_group_returns_last(self):
        pts = [_jitter(BLR, i, 0) for i in range(3)]
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        assert best_lat_lng(lats, lngs) == (pts[-1][0], pts[-1][1])

    def test_oversized_group_returns_last(self):
        pts = [_jitter(BLR, i, 0) for i in range(501)]
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        assert best_lat_lng(lats, lngs) == (pts[-1][0], pts[-1][1])

    def test_densest_point_wins(self):
        # 4 tight points + 1 outlier 10 km away: any tight point has 4
        # neighbors (incl. self), outlier has 1 → first tight point wins
        tight = [_jitter(BLR, i * 10, 0) for i in range(4)]
        outlier = [_jitter(BLR, 10_000, 0)]
        pts = outlier + tight
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        assert best_lat_lng(lats, lngs) == (tight[0][0], tight[0][1])

    def test_zero_lat_sentinel_kills_neighbors(self):
        # lat==0 rows get the 1e7 sentinel to everything (incl. self)
        pts = [(0.0, 77.0)] * 3 + [_jitter(BLR, i, 0) for i in range(2)]
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        # the two real points have 2 neighbors each, zero-lat rows 0 →
        # first real point wins
        assert best_lat_lng(lats, lngs) == pts[3]

    def test_batch_kernel_bit_parity_per_group(self):
        # best_lat_lng_batch (the one-Vincenty-per-Arrow-body path the
        # grouped wrapper dispatches) must be BIT-identical to the
        # per-group kernel on every group shape: tiny guards, the 4 and
        # 500 boundaries, the 501 guard, sentinel zero-lat rows, ties.
        from pulsar_spark_spark.operators.geo_kernels import best_lat_lng_batch

        rng = np.random.default_rng(7)
        sizes = rng.integers(1, 40, size=120).tolist() + [3, 4, 500, 501, 1]
        lats, lngs, starts, ends = [], [], [], []
        pos = 0
        for s in sizes:
            base = (rng.uniform(-60, 60), rng.uniform(-170, 170))
            la = base[0] + rng.normal(0, 0.002, s)
            ln = base[1] + rng.normal(0, 0.002, s)
            la[rng.random(s) < 0.05] = 0.0  # sentinel rows
            # force exact-duplicate points so count ties exercise the
            # first-max-wins rule
            if s >= 6:
                la[3], ln[3] = la[1], ln[1]
            lats.append(la)
            lngs.append(ln)
            starts.append(pos)
            ends.append(pos + s)
            pos += s
        lat = np.concatenate(lats)
        lng = np.concatenate(lngs)
        idx = best_lat_lng_batch(
            lat, lng, np.asarray(starts), np.asarray(ends)
        )
        for g, (a, b) in enumerate(zip(starts, ends)):
            exp = best_lat_lng(lat[a:b], lng[a:b])
            assert (float(lat[idx[g]]), float(lng[idx[g]])) == exp


# ---------------------------------------------------------------------
# G2
# ---------------------------------------------------------------------
class TestClusterScore:
    def test_batch_kernels_adversarial_geometry(self):
        # Chord-band soundness under the geometries the randomized
        # tests never sample: polar clusters (wild longitudes,
        # geodetic-vs-geocentric latitude distortion at its maximum),
        # antimeridian-straddling clusters (lng ±179.999 — physically
        # tight, coordinate-distant), grids engineered INSIDE the
        # [250,350] m and [160,240] m prefilter rings (the exact-
        # Vincenty arbitration path), and equator sentinel mixes.
        # All three batch kernels must match their scalar twins
        # bit-exactly.
        from pulsar_spark_spark.operators.geo_kernels import (
            best_lat_lng_batch,
            best_score_batch,
            cluster_score_batch,
        )

        rng = np.random.default_rng(99)
        groups = []
        for base_lat in [89.5, -89.5, 89.99, -89.99]:
            m = 12
            groups.append((
                base_lat + rng.normal(0, 0.002, m),
                rng.uniform(-180, 180, m),
            ))
        for _ in range(6):
            m = 14
            la = rng.uniform(-60, 60) + rng.normal(0, 0.001, m)
            ln = np.where(
                rng.random(m) < 0.5, 179.999, -179.999
            ) + rng.normal(0, 0.0005, m)
            groups.append((la, ln))
        for lo, hi, n in ((240, 360, 13), (150, 250, 11)):
            for d0 in np.linspace(lo, hi, n):
                m = 10 if hi > 300 else 8
                base = (rng.uniform(-70, 70), rng.uniform(-179, 179))
                la = np.full(m, base[0])
                ln = np.full(m, base[1])
                for i in range(1, m):
                    la[i] = base[0] + (d0 + rng.normal(0, 4)) / 110567.0 * (
                        1 if i % 2 else -1
                    )
                groups.append((la, ln))
        for _ in range(4):
            m = 9
            la = rng.normal(0, 0.003, m)
            la[rng.random(m) < 0.3] = 0.0
            groups.append((la, 77 + rng.normal(0, 0.003, m)))

        lat = np.concatenate([g[0] for g in groups])
        lng = np.concatenate([g[1] for g in groups])
        sizes = [len(g[0]) for g in groups]
        starts = np.cumsum([0] + sizes[:-1])
        ends = np.cumsum(sizes)
        idx = best_lat_lng_batch(lat, lng, starts, ends)
        bl3, bn3, sc3, hi3 = cluster_score_batch(lat, lng, starts, ends)
        bl2, bn2, sc2 = best_score_batch(lat, lng, starts, ends)
        for g, (a, b) in enumerate(zip(starts, ends)):
            assert (float(lat[idx[g]]), float(lng[idx[g]])) == best_lat_lng(
                lat[a:b], lng[a:b]
            )
            assert (
                float(bl3[g]), float(bn3[g]), float(sc3[g]), bool(hi3[g])
            ) == cluster_best_lat_lng_with_score(lat[a:b], lng[a:b])
            assert (
                float(bl2[g]), float(bn2[g]), float(sc2[g])
            ) == best_lat_lng_with_cluster_score(lat[a:b], lng[a:b])

    def test_cluster_score_batch_bit_parity_per_group(self):
        # cluster_score_batch (the G3 chord-band batch arm) must be
        # BIT-identical to the scalar kernel on every group shape:
        # tiny groups, sentinel rows, exact-duplicate coords (the
        # unique-coord fold + first-occurrence tie rule).
        from pulsar_spark_spark.operators.geo_kernels import cluster_score_batch

        rng = np.random.default_rng(21)
        lats, lngs, starts, ends = [], [], [], []
        pos = 0
        for _ in range(250):
            m = int(rng.integers(1, 40))
            base = (rng.uniform(-60, 60), rng.uniform(-170, 170))
            la = base[0] + rng.normal(0, 0.0015, m)
            ln = base[1] + rng.normal(0, 0.0015, m)
            la[rng.random(m) < 0.05] = 0.0
            if m >= 6:
                la[3], ln[3] = la[1], ln[1]
                la[5], ln[5] = la[1], ln[1]
            lats.append(la)
            lngs.append(ln)
            starts.append(pos)
            ends.append(pos + m)
            pos += m
        lat = np.concatenate(lats)
        lng = np.concatenate(lngs)
        bl, bn, sc, hi = cluster_score_batch(
            lat, lng, np.asarray(starts), np.asarray(ends)
        )
        for g, (a, b) in enumerate(zip(starts, ends)):
            exp = cluster_best_lat_lng_with_score(lat[a:b], lng[a:b])
            assert (float(bl[g]), float(bn[g]), float(sc[g]), bool(hi[g])) == exp

    def test_best_score_batch_bit_parity_per_group(self):
        # best_score_batch (the G2 batch arm) must be BIT-identical on
        # every group shape: single-coord groups (score never
        # written), duplicates of the LAST row's coord (the M-vs-L
        # last-differing-neighbor split), sentinels, sub-3 guards.
        from pulsar_spark_spark.operators.geo_kernels import best_score_batch

        rng = np.random.default_rng(33)
        lats, lngs, starts, ends = [], [], [], []
        pos = 0
        for _ in range(300):
            m = int(rng.integers(1, 45))
            base = (rng.uniform(-60, 60), rng.uniform(-170, 170))
            la = base[0] + rng.normal(0, 0.0015, m)
            ln = base[1] + rng.normal(0, 0.0015, m)
            la[rng.random(m) < 0.06] = 0.0
            if m >= 6:
                la[3], ln[3] = la[1], ln[1]
                la[2], ln[2] = la[m - 1], ln[m - 1]
            if rng.random() < 0.05 and m >= 2:
                la[:], ln[:] = la[0], ln[0]
            lats.append(la)
            lngs.append(ln)
            starts.append(pos)
            ends.append(pos + m)
            pos += m
        lat = np.concatenate(lats)
        lng = np.concatenate(lngs)
        bl, bn, sc = best_score_batch(
            lat, lng, np.asarray(starts), np.asarray(ends)
        )
        for g, (a, b) in enumerate(zip(starts, ends)):
            exp = best_lat_lng_with_cluster_score(lat[a:b], lng[a:b])
            assert (float(bl[g]), float(bn[g]), float(sc[g])) == exp

    def test_cluster_score_batch_nondefault_threshold_parity(self):
        # Round-11 advice: the batch arm hardcoded its chord band to
        # the 200 m default, so thr=100/500 silently diverged from the
        # scalar kernel. The band must derive from the parameter.
        from pulsar_spark_spark.operators.geo_kernels import cluster_score_batch

        rng = np.random.default_rng(77)
        lats, lngs, starts, ends = [], [], [], []
        pos = 0
        for _ in range(120):
            m = int(rng.integers(3, 30))
            base = (rng.uniform(-60, 60), rng.uniform(-170, 170))
            # spread chosen so 100/200/500 m thresholds all cut the
            # pair population differently (~0-800 m pair distances)
            la = base[0] + rng.normal(0, 0.002, m)
            ln = base[1] + rng.normal(0, 0.002, m)
            lats.append(la)
            lngs.append(ln)
            starts.append(pos)
            ends.append(pos + m)
            pos += m
        lat = np.concatenate(lats)
        lng = np.concatenate(lngs)
        for thr in (100.0, 500.0):
            bl, bn, sc, hi = cluster_score_batch(
                lat,
                lng,
                np.asarray(starts),
                np.asarray(ends),
                distance_threshold_m=thr,
            )
            for g, (a, b) in enumerate(zip(starts, ends)):
                exp = cluster_best_lat_lng_with_score(
                    lat[a:b], lng[a:b], distance_threshold_m=thr
                )
                got = (float(bl[g]), float(bn[g]), float(sc[g]), bool(hi[g]))
                assert got == exp, f"thr={thr} group={g}"

    def test_batch_kernels_signed_zero_parity(self):
        # Round-11 advice: -0.0 and 0.0 are the SAME coordinate to the
        # scalar kernels (dict keys on float equality) and to the
        # batch arms' differs masks; the unique-coord fold must not
        # split them on raw bit patterns.
        from pulsar_spark_spark.operators.geo_kernels import (
            best_score_batch,
            cluster_score_batch,
        )

        la = np.array([0.001, 0.001, 0.001, 0.0012, 0.0012, 0.0011])
        ln = np.array([-0.0, 0.0, -0.0, 0.0005, 0.0005, 0.0002])
        starts = np.array([0])
        ends = np.array([6])
        exp3 = cluster_best_lat_lng_with_score(la, ln)
        bl, bn, sc, hi = cluster_score_batch(la, ln, starts, ends)
        assert (float(bl[0]), float(bn[0]), float(sc[0]), bool(hi[0])) == exp3
        exp2 = best_lat_lng_with_cluster_score(la, ln)
        bl, bn, sc = best_score_batch(la, ln, starts, ends)
        assert (float(bl[0]), float(bn[0]), float(sc[0])) == exp2

    def test_below_min_points_last_and_zero(self):
        pts = [_jitter(BLR, 0, 0), _jitter(BLR, 5, 0)]
        lat, lng, score = best_lat_lng_with_cluster_score(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        )
        assert (lat, lng) == pts[-1] and score == 0.0

    def test_all_identical_coords_scores_zero(self):
        pts = [BLR] * 5
        lat, lng, score = best_lat_lng_with_cluster_score(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        )
        assert (lat, lng) == BLR and score == 0.0

    def test_majority_cluster_high_confidence(self):
        # 5 points within 200 m of each other → each has 4 differing
        # neighbors ≥ ceil-int(5/2)=2 → confidence 1.0
        pts = [_jitter(BLR, i * 20, 0) for i in range(5)]
        _lat, _lng, score = best_lat_lng_with_cluster_score(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        )
        assert score == 1.0

    def test_matches_oracle_on_random_points(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            n = int(rng.integers(3, 40))
            lats = BLR[0] + rng.integers(-30, 30, n) * 9e-6 * 10
            lngs = BLR[1] + rng.integers(-30, 30, n) * 9e-6 * 10
            got = best_lat_lng_with_cluster_score(lats, lngs)
            want = geo_oracle.cluster_score_oracle(list(zip(lats, lngs)))
            assert got == want


# ---------------------------------------------------------------------
# G4
# ---------------------------------------------------------------------
class TestTrimmedCentroid:
    def test_too_few_accurate_points_none(self):
        pts = [_jitter(BLR, i, 0) for i in range(6)]
        accs = np.array([10.0, 10.0, 10.0, 500.0, 500.0, 500.0])
        assert (
            trimmed_centroid(
                np.array([p[0] for p in pts]), np.array([p[1] for p in pts]), accs
            )
            is None
        )

    def test_outlier_trimmed(self):
        tight = [_jitter(BLR, i, i) for i in range(8)]
        far = [_jitter(BLR, 5000, 5000)]
        pts = tight + far
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        accs = np.full(len(pts), 10.0)
        cen = trimmed_centroid(lats, lngs, accs)
        want = geo_oracle.trimmed_centroid_oracle(
            [(la, ln, a) for la, ln, a in zip(lats, lngs, accs)]
        )
        assert cen is not None and want is not None
        assert cen[0] == pytest.approx(want[0], abs=1e-9)
        assert cen[1] == pytest.approx(want[1], abs=1e-9)
        # the far point must not dominate: centroid within the tight patch
        assert abs(cen[0] - BLR[0]) < 0.001

    def test_batch_bit_parity_per_job(self):
        # trimmed_centroid_batch (the lockstep arm the refinement body
        # dispatches) must be BIT-identical to the scalar trim loop on
        # every cloud shape: sub-4 None cases, accuracy-filtered rows,
        # forced multi-iteration trims, single-point clouds.
        from pulsar_spark_spark.operators.geo_kernels import trimmed_centroid_batch

        rng = np.random.default_rng(11)
        jobs = []
        for _ in range(300):
            m = int(rng.integers(1, 15))
            la = BLR[0] + rng.normal(0, 0.001, m)
            ln = BLR[1] + rng.normal(0, 0.001, m)
            if m > 4:
                la[:2] += rng.choice([-1.0, 1.0], 2) * 0.01  # force trims
            ac = rng.uniform(0, 200, m)
            jobs.append((la, ln, ac))
        assert trimmed_centroid_batch(jobs) == [trimmed_centroid(*j) for j in jobs]

    def test_deferred_refine_delivery_matches_plain(self):
        # refine_delivery(defer_centroid=True) + trimmed_centroid_batch
        # must reproduce the plain call's (refined, results) exactly.
        from pulsar_spark_spark.operators.geo_kernels import (
            LABEL_CENTROID,
            refine_delivery,
            trimmed_centroid_batch,
        )

        rng = np.random.default_rng(13)
        per_del, cen_jobs, cen_ref, plain = [], [], [], []
        for _ in range(200):
            m = int(rng.integers(0, 12))
            pl = [
                (
                    int(rng.integers(-130_000, 310_000)),
                    BLR[0] + float(rng.normal(0, 0.0005)),
                    BLR[1] + float(rng.normal(0, 0.0005)),
                    float(rng.uniform(0, 150)),
                )
                for _ in range(m)
            ]
            args = (BLR[0], BLR[1], 0, float(rng.uniform(0, 150)), pl)
            plain.append(refine_delivery(*args))
            r, res, job = refine_delivery(*args, defer_centroid=True)
            per_del.append((r, list(res)))
            if job is not None:
                cen_jobs.append(job)
                cen_ref.append(len(per_del) - 1)
        for slot, cen in zip(cen_ref, trimmed_centroid_batch(cen_jobs)):
            if cen is not None:
                per_del[slot][1].append((cen[0], cen[1], LABEL_CENTROID))
        assert plain == per_del


# ---------------------------------------------------------------------
# G5 / G6
# ---------------------------------------------------------------------
class TestDbscan:
    def test_basic_clustering_and_min_count(self):
        a = [(1000 * i, *_jitter(BLR, i, 0), 10.0) for i in range(4)]
        hop = [(10_000, *_jitter(BLR, 100_000, 0), 10.0)]  # isolated → dropped
        b = [(20_000 + 1000 * i, *_jitter((13.5, 78.0), i, 0), 10.0) for i in range(3)]
        pings = [(t, la, ln, ac) for t, la, ln, ac in a + hop + b]
        clusters = dbscan_clusters(pings)
        assert len(clusters) == 2
        assert len(clusters[0][0]) == 4 and len(clusters[1][0]) == 3

    def test_drop_case_head_far_tail_near(self):
        # Build a chain where a point is within eps of the OLDEST point
        # (tail) but beyond eps of the newest (head): reference drops it.
        p0 = (0, *BLR, 10.0)
        p1 = (1000, *_jitter(BLR, 45, 0), 10.0)   # within 50 m of p0 (head=p0)
        p2 = (2000, *_jitter(BLR, 90, 0), 10.0)   # 45 m from p1(head), 90 m from p0
        p3 = (3000, *_jitter(BLR, 30, 0), 10.0)   # 60 m from head p2, 30 m from tail p0
        clusters = dbscan_clusters([p0, p1, p2, p3], eps_m=50.0, min_count=3)
        # p3 dropped; remaining cluster has 3 points
        assert len(clusters) == 1
        assert len(clusters[0][0]) == 3
        got_ts = [p[3] for p in clusters[0][0]]
        assert got_ts == [2000, 1000, 0]  # prepend order, newest first

    def test_best_cluster_tie_goes_to_later(self):
        c1 = ([(1.0, 2.0, 3.0, 100)], BLR[0], BLR[1], 1000)
        c2 = ([(4.0, 5.0, 6.0, 200)], BLR[0], BLR[1], 1000)
        # round 11: best_cluster returns the whole winning RECORD
        # (so index-carrying records pass through); points are [0]
        best = best_cluster(BLR[0], BLR[1], 0, 50.0, [c1, c2])
        assert best[0] == c2[0]  # ≤ comparison → later cluster wins ties


# ---------------------------------------------------------------------
# G8
# ---------------------------------------------------------------------
class TestMergeRefinedHistory:
    def test_and_removal_and_cap(self):
        # entries sharing EITHER coordinate with the delivery are
        # removed (the reference's && keeps only fully-different rows)
        hist = [
            ("t1", 1.0, 2.0, 50.0),   # both differ → kept
            ("t2", 9.0, 2.5, 50.0),   # lat differs, lng differs → kept
            ("t3", 5.0, 6.0, 50.0),   # lat == del_lat → dropped
            ("t4", 1.5, 6.5, 50.0),   # lng == del_lng → dropped
        ]
        out = merge_refined_history(hist, 5.0, 6.5, [(7.0, 8.0, "X")], "t9")
        assert [e[0] for e in out] == ["t1", "t2", "t9"]
        assert out[-1] == ("t9", 7.0, 8.0, 198.0)

    def test_cap_keeps_newest_100(self):
        hist = [(f"t{i}", 1.0 + i, 2.0 + i, 9.0) for i in range(150)]
        out = merge_refined_history(hist, 0.0, 0.0, [], "tx")
        assert len(out) == 100
        assert out[0][0] == "t50" and out[-1][0] == "t149"


# ---------------------------------------------------------------------
# JVM pre-dispatch routing: guard-tripped groups resolve JVM-side,
# kernel groups in Python — both must match the oracle, and the union
# must cover every group exactly once.
# ---------------------------------------------------------------------
class TestPreDispatchRouting:
    SIZES = {1: 2, 2: 10, 3: 600, 4: 499}

    @pytest.fixture(scope="class")
    def routed(self, spark):
        rng = np.random.default_rng(3)
        rows = []
        for uid, n in self.SIZES.items():
            for i in range(n):
                rows.append(
                    (
                        uid,
                        i,
                        1000 * i,
                        BLR[0] + int(rng.integers(-30, 30)) * 9e-5,
                        BLR[1] + int(rng.integers(-30, 30)) * 9e-5,
                        float(int(rng.integers(0, 300))),
                    )
                )
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts_ms", "lat", "lng", "accuracy"]
        )
        return pdf, spark.createDataFrame(pdf)

    def test_best_latlng_mixed_routes(self, routed):
        from pulsar_spark_spark.operators.grouped import apply_best_latlng

        pdf, df = routed
        got = {r["user_id"]: r for r in apply_best_latlng(df).collect()}
        assert set(got) == set(self.SIZES)
        for uid, n in self.SIZES.items():
            g = pdf[pdf["user_id"] == uid].sort_values(["ts_ms", "event_id"])
            want = geo_oracle.best_lat_lng_oracle(list(zip(g["lat"], g["lng"])))
            assert (got[uid]["best_lat"], got[uid]["best_lng"]) == want, f"user {uid}"
            assert got[uid]["n_points"] == n

    def test_cluster_score_small_group_routes_jvm(self, routed):
        from pulsar_spark_spark.operators.grouped import apply_cluster_score

        pdf, df = routed
        got = {r["user_id"]: r for r in apply_cluster_score(df).collect()}
        assert set(got) == set(self.SIZES)
        for uid in (1, 2):  # guard (n<3) and kernel routes
            g = pdf[pdf["user_id"] == uid].sort_values(["ts_ms", "event_id"])
            want = geo_oracle.cluster_score_oracle(list(zip(g["lat"], g["lng"])))
            r = got[uid]
            assert (r["lat"], r["lng"], r["cluster_score"]) == want, f"user {uid}"

    def test_trimmed_centroid_sparse_group_routes_jvm(self, spark):
        from pulsar_spark_spark.operators.grouped import apply_trimmed_centroid

        rows = []
        # user 1: 6 points but only 3 accurate → JVM null-centroid route
        for i in range(6):
            rows.append((1, i, 1000 * i, BLR[0] + i * 9e-6, BLR[1],
                         10.0 if i < 3 else 500.0))
        # user 2: 8 accurate points → kernel route
        for i in range(8):
            rows.append((2, i, 1000 * i, BLR[0] + i * 9e-6, BLR[1], 10.0))
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts_ms", "lat", "lng", "accuracy"]
        )
        got = {r["user_id"]: r for r in apply_trimmed_centroid(
            spark.createDataFrame(pdf)).collect()}
        assert got[1]["centroid_lat"] is None and got[1]["n_accurate"] == 3
        g2 = pdf[pdf["user_id"] == 2]
        want = geo_oracle.trimmed_centroid_oracle(
            list(zip(g2["lat"], g2["lng"], g2["accuracy"]))
        )
        assert want is not None
        assert got[2]["centroid_lat"] == pytest.approx(want[0], abs=1e-9)
        assert got[2]["n_accurate"] == 8

    def test_delivery_under_min_count_routes_jvm(self, spark):
        from pulsar_spark_spark.operators.grouped import apply_delivery_refinement

        cols = ["delivery_id", "user_id", "del_ts_ms", "del_lat", "del_lng",
                "del_accuracy", "p_ts_ms", "p_lat", "p_lng", "p_accuracy",
                "p_event_id"]
        rows = [
            # delivery 1: pingless left-join row → ORIGINAL via JVM
            (1, 7, 100_000, BLR[0], BLR[1], 50.0, None, None, None, None, None),
            # delivery 2: 2 pings (< min_count 3) → ORIGINAL via JVM
            (2, 7, 100_000, BLR[0], BLR[1], 50.0, 100_500.0,
             BLR[0] + 1e-5, BLR[1], 10.0, 11.0),
            (2, 7, 100_000, BLR[0], BLR[1], 50.0, 101_000.0,
             BLR[0] + 2e-5, BLR[1], 10.0, 12.0),
        ]
        # delivery 3: 5 tight pings → kernel refinement route
        for i in range(5):
            rows.append((3, 7, 100_000, BLR[0], BLR[1], 50.0,
                         float(100_000 + 1000 * i), BLR[0] + i * 9e-6, BLR[1],
                         10.0, float(20 + i)))
        pdf = pd.DataFrame(rows, columns=cols)
        df = spark.createDataFrame(pdf)
        got: dict = {}
        for r in apply_delivery_refinement(df).collect():
            got.setdefault(r["delivery_id"], []).append(r)
        assert [r["method"] for r in got[1]] == ["ORIGINAL_DELIVERED_LOCATION"]
        assert [r["method"] for r in got[2]] == ["ORIGINAL_DELIVERED_LOCATION"]
        assert got[2][0]["is_refined"] is False
        assert got[2][0]["ref_lat"] == BLR[0] and got[2][0]["ref_lng"] == BLR[1]
        refined, results = geo_oracle.refine_oracle(
            BLR[0], BLR[1], 100_000, 50.0,
            [(100_000 + 1000 * i, BLR[0] + i * 9e-6, BLR[1], 10.0) for i in range(5)],
        )
        assert refined is True
        assert sorted(r["method"] for r in got[3]) == sorted(r[2] for r in results)


# ---------------------------------------------------------------------
# Spark ↔ oracle parity on real data (sf0.001)
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def geo_pdf(spark):
    import pyspark.sql.functions as F

    ge = geo_events(spark, SF_DIR_SMALL).select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "lat",
        "lng",
        "accuracy",
        "event_type",
    )
    return ge.toPandas()


def _groups(geo_pdf):
    for uid, g in geo_pdf.sort_values(["ts_ms", "event_id"]).groupby("user_id"):
        yield uid, g


def test_best_latlng_parity(spark, geo_pdf):
    got = {
        r["user_id"]: (r["best_lat"], r["best_lng"])
        for r in QUERIES["best_latlng_per_user"](spark, SF_DIR_SMALL).collect()
    }
    for uid, g in _groups(geo_pdf):
        want = geo_oracle.best_lat_lng_oracle(list(zip(g["lat"], g["lng"])))
        assert got[uid] == want, f"user {uid}"


def test_cluster_score_parity(spark, geo_pdf):
    got = {
        r["user_id"]: (r["lat"], r["lng"], r["cluster_score"])
        for r in QUERIES["cluster_score_per_user"](spark, SF_DIR_SMALL).collect()
    }
    for uid, g in _groups(geo_pdf):
        want = geo_oracle.cluster_score_oracle(list(zip(g["lat"], g["lng"])))
        assert got[uid] == want, f"user {uid}"


def test_trimmed_centroid_parity_in_merged_query(spark, geo_pdf):
    """G4 rides the merged cluster_score_per_user query (round-5
    registry consolidation): centroid columns must match the
    pure-Python transliteration under the registered surface's
    nudged 6 dp rounding (round 6 — see plans/kernels.py
    _CENTROID_NUDGE; full-precision kernel parity is pinned
    separately in TestTrimmedCentroid)."""
    from pulsar_spark_spark.plans.kernels import _CENTROID_NUDGE

    got = {
        r["user_id"]: (r["centroid_lat"], r["centroid_lng"])
        for r in QUERIES["cluster_score_per_user"](spark, SF_DIR_SMALL).collect()
    }
    for uid, g in _groups(geo_pdf):
        want = geo_oracle.trimmed_centroid_oracle(
            list(zip(g["lat"], g["lng"], g["accuracy"]))
        )
        if want is None:
            assert got[uid] == (None, None), f"user {uid}"
        else:
            want6 = (
                round(want[0] + _CENTROID_NUDGE, 6),
                round(want[1] + _CENTROID_NUDGE, 6),
            )
            assert got[uid][0] == pytest.approx(want6[0], abs=1e-12), f"user {uid}"
            assert got[uid][1] == pytest.approx(want6[1], abs=1e-12), f"user {uid}"


def test_ping_cluster_score_parity(spark, geo_pdf):
    got = {
        r["user_id"]: (r["lat"], r["lng"], r["cluster_score"], r["is_high_confidence"])
        for r in QUERIES["ping_cluster_score_per_user"](spark, SF_DIR_SMALL).collect()
    }
    for uid, g in _groups(geo_pdf):
        want = geo_oracle.cluster_score_v3_oracle(list(zip(g["lat"], g["lng"])))
        assert got[uid] == want, f"user {uid}"


def _scaled(geo_pdf):
    from pulsar_spark_spark.plans.kernels import _PING_CLOCK_DIV

    return geo_pdf.assign(ts_ms=geo_pdf["ts_ms"] // _PING_CLOCK_DIV).sort_values(
        ["ts_ms", "event_id"]
    )


def test_delivery_refinement_parity(spark, geo_pdf):
    rows = QUERIES["delivery_refinement"](spark, SF_DIR_SMALL).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["delivery_id"], []).append(
            (r["is_refined"], r["method"], r["ref_lat"], r["ref_lng"])
        )
    gp = _scaled(geo_pdf)
    deliveries = gp[gp["event_type"] == "purchase"]
    assert set(got) == set(deliveries["event_id"])
    # the compressed clock must make the kernel chain actually run:
    # at least one delivery refines instead of falling back
    assert any(v[0][0] for v in got.values())
    for _, d in deliveries.iterrows():
        cand = gp[
            (gp["user_id"] == d["user_id"])
            & (gp["accuracy"] <= 100.0)
            & (gp["ts_ms"] >= d["ts_ms"] - 120_000)
            & (gp["ts_ms"] <= d["ts_ms"] + 300_000)
        ].sort_values(["ts_ms", "event_id"])
        pings = list(zip(cand["ts_ms"], cand["lat"], cand["lng"], cand["accuracy"]))
        refined, results = geo_oracle.refine_oracle(
            d["lat"], d["lng"], int(d["ts_ms"]), d["accuracy"], pings
        )
        want = sorted(
            [(refined, lbl, la, ln) for la, ln, lbl in results], key=lambda x: x[1]
        )
        got_d = sorted(got[d["event_id"]], key=lambda x: x[1])
        assert len(got_d) == len(want), f"delivery {d['event_id']}"
        # round-6 registered surface: nudged 6 dp coordinates (see
        # plans/kernels.py _CENTROID_NUDGE)
        from pulsar_spark_spark.plans.kernels import _CENTROID_NUDGE

        for g, w in zip(got_d, want):
            assert g[0] == w[0] and g[1] == w[1], f"delivery {d['event_id']}"
            assert g[2] == pytest.approx(round(w[2] + _CENTROID_NUDGE, 6), abs=1e-12)
            assert g[3] == pytest.approx(round(w[3] + _CENTROID_NUDGE, 6), abs=1e-12)


def test_delivery_refined_history_parity(spark, geo_pdf):
    got: dict = {}
    for r in QUERIES["delivery_refined_history"](spark, SF_DIR_SMALL).collect():
        got.setdefault(r["user_id"], []).append(
            (r["ts_ms"], r["event_id"], r["lat"], r["lng"], r["accuracy"],
             r["method"])
        )
    n_checked = 0
    for uid, g in _scaled(geo_pdf).groupby("user_id"):
        g = g.sort_values(["ts_ms", "event_id"])
        deliveries = g[g["event_type"] == "purchase"]
        if not len(deliveries):
            assert uid not in got
            continue
        # the query merges the newest delivery whose refinement
        # SUCCEEDED — walk purchases newest-first to find it
        pings = list(zip(g["ts_ms"], g["lat"], g["lng"], g["accuracy"]))
        d = results = None
        for _, cand_d in deliveries[::-1].iterrows():
            cand = [p for p in pings
                    if cand_d["ts_ms"] - 120_000 <= p[0] <= cand_d["ts_ms"] + 300_000
                    and p[3] <= 100.0]
            refined, res = geo_oracle.refine_oracle(
                cand_d["lat"], cand_d["lng"], int(cand_d["ts_ms"]),
                cand_d["accuracy"], cand,
            )
            if refined:
                d, results = cand_d, res
                break
        if d is None:
            assert uid not in got, f"user {uid}: unrefined user emitted"
            continue
        history = [
            (int(r[0]), int(r[1]), r[2], r[3], r[4])
            for r in zip(g["ts_ms"], g["event_id"], g["lat"], g["lng"],
                         g["accuracy"])
        ]
        want = geo_oracle.merge_refined_history_oracle(
            history, d["lat"], d["lng"], results, int(d["ts_ms"]),
            int(d["event_id"]),
        )
        got_u = sorted(got[uid], key=lambda e: (e[0], e[1], e[5] or ""))
        want_s = sorted(want, key=lambda e: (e[0], e[1], e[5] or ""))
        assert len(got_u) == len(want_s), f"user {uid}"
        from pulsar_spark_spark.plans.kernels import _CENTROID_NUDGE

        for gr, wr in zip(got_u, want_s):
            assert gr[0] == wr[0] and gr[1] == wr[1] and gr[5] == wr[5], f"user {uid}"
            assert gr[2] == pytest.approx(round(wr[2] + _CENTROID_NUDGE, 6), abs=1e-12)
            assert gr[3] == pytest.approx(round(wr[3] + _CENTROID_NUDGE, 6), abs=1e-12)
            assert gr[4] == wr[4]
        n_checked += 1
    assert n_checked > 0  # the fixture must actually exercise the merge


def test_merge_refined_into_history_cap(spark):
    """Positional cap: refined rows always survive; history keeps
    100 − n_refined newest rows."""
    from pulsar_spark_spark.plans.kernels import merge_refined_into_history

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1] * 150,
                "event_id": range(150),
                "ts_ms": [1000 * i for i in range(150)],
                "lat": [10.0 + i * 1e-4 for i in range(150)],
                "lng": [70.0 + i * 1e-4 for i in range(150)],
                "accuracy": [50.0] * 150,
            }
        )
    )
    refined = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "delivery_id": [900, 900],
                "del_ts_ms": [200_000, 200_000],
                # delivered point equals history row 10 → that row and
                # ONLY rows sharing both coords are dropped
                "del_lat": [10.0 + 10 * 1e-4] * 2,
                "del_lng": [70.0 + 10 * 1e-4] * 2,
                "method": ["CLUSTER_GEOCODE_SCORE_HIGH", "CLUSTER_CENTROID"],
                "ref_lat": [11.5, 11.6],
                "ref_lng": [71.5, 71.6],
            }
        )
    )
    rows = merge_refined_into_history(pts, refined).collect()
    hist = [r for r in rows if r["method"] is None]
    ref = [r for r in rows if r["method"] is not None]
    assert len(ref) == 2 and all(r["accuracy"] == 198.0 for r in ref)
    assert len(hist) == 98  # 100 − n_refined
    # newest survivors kept (ids 52..149); the both-coords match (10)
    # and everything older than the cap window are out
    ids = {r["event_id"] for r in hist}
    assert ids == set(range(52, 150))


def test_merge_refined_into_history_no_broadcast_parity(spark):
    """The broadcast hint is a pure physical choice: with
    broadcast_survivor_dim=False (the unbounded-batch safety arm) the
    shuffle-join plan must produce the identical row set."""
    from pulsar_spark_spark.plans.kernels import merge_refined_into_history

    rng = np.random.default_rng(5)
    n_u, n_pts = 8, 40
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": np.repeat(np.arange(n_u), n_pts),
                "event_id": np.arange(n_u * n_pts),
                "ts_ms": np.tile(np.arange(n_pts) * 1000, n_u),
                "lat": 10.0 + rng.normal(0, 0.01, n_u * n_pts),
                "lng": 70.0 + rng.normal(0, 0.01, n_u * n_pts),
                "accuracy": np.full(n_u * n_pts, 50.0),
            }
        )
    )
    refined = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [0, 0, 3, 5],
                "delivery_id": [900, 900, 901, 902],
                "del_ts_ms": [200_000] * 4,
                "del_lat": [10.0, 10.0, 10.2, 10.3],
                "del_lng": [70.0, 70.0, 70.2, 70.3],
                "method": [
                    "CLUSTER_GEOCODE_SCORE_HIGH",
                    "CLUSTER_CENTROID",
                    "CLUSTER_CENTROID",
                    "CLUSTER_CENTROID",
                ],
                "ref_lat": [11.5, 11.6, 11.7, 11.8],
                "ref_lng": [71.5, 71.6, 71.7, 71.8],
            }
        )
    )
    key = lambda r: (r["user_id"], r["ts_ms"], r["event_id"], r["method"] or "")
    a = sorted(
        merge_refined_into_history(pts, refined).collect(), key=key
    )
    b = sorted(
        merge_refined_into_history(
            pts, refined, broadcast_survivor_dim=False
        ).collect(),
        key=key,
    )
    assert a == b and len(a) > 0
    # the un-hinted arm must leave the join strategy to the planner's
    # size estimate (no explicit ResolvedHint in the analyzed plan)
    plan_b = merge_refined_into_history(
        pts, refined, broadcast_survivor_dim=False
    )._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in plan_b and "broadcast" not in plan_b.lower()


class TestClusterScoreDuplicates:
    def test_duplicate_coords_collapse_and_multiply(self):
        # Reference maps are keyed by COORDINATE: duplicates collapse
        # to one entry whose neighbor count accumulates once per ROW
        # (multiplicity × differing neighbors within threshold).
        pts = [BLR, BLR, _jitter(BLR, 50, 0), _jitter(BLR, 100, 0)]
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        got = best_lat_lng_with_cluster_score(lats, lngs)
        want = geo_oracle.cluster_score_oracle(list(zip(lats, lngs)))
        assert got == want

    def test_matches_oracle_with_random_duplicates(self):
        rng = np.random.default_rng(11)
        for _ in range(5):
            n = int(rng.integers(4, 25))
            # coarse grid → frequent exact-duplicate coordinates
            lats = BLR[0] + rng.integers(-3, 4, n) * 9e-5
            lngs = BLR[1] + rng.integers(-3, 4, n) * 9e-5
            got = best_lat_lng_with_cluster_score(lats, lngs)
            want = geo_oracle.cluster_score_oracle(list(zip(lats, lngs)))
            assert got == want
            got3 = cluster_best_lat_lng_with_score(lats, lngs)
            want3 = geo_oracle.cluster_score_v3_oracle(list(zip(lats, lngs)))
            assert got3 == want3


def test_nan_coordinates_guarded(spark):
    """Round 14 review fix: a NaN coordinate used to CRASH the scalar
    scoring walk (nan != nan breaks its coordinate-tuple dict keying
    with a KeyError deep in the loop) while the batch arm silently
    propagated NaN scores. Non-finite rows are now dropped JVM-side
    in every grouped wrapper (operators/grouped._finite_points), so
    a dirty input produces exactly the clean input's answer; the
    kernel itself fails loudly if reached directly."""
    import math

    import numpy as np
    import pytest

    from pulsar_spark_spark.operators.geo_kernels import _score_maps
    from pulsar_spark_spark.operators.grouped import (
        apply_cluster_score,
        apply_cluster_score_v3,
    )

    with pytest.raises(ValueError, match="non-finite"):
        _score_maps(
            np.array([1.0, float("nan"), 2.0]),
            np.array([1.0, 2.0, 3.0]),
            300.0,
        )

    rows = [
        (1, i, 1000 + i, 10.0 + i * 1e-5, 70.0 + i * 1e-5)
        for i in range(6)
    ]
    clean = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, lat double, lng double"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [
                (1, 100, 1100, float("nan"), 70.0),
                (1, 101, 1101, None, 70.0),
                (1, 102, 1102, 10.0, float("nan")),
            ],
            "user_id long, event_id long, ts_ms long, lat double, lng double",
        )
    )
    for op in (apply_cluster_score, apply_cluster_score_v3):
        want = sorted(map(tuple, op(clean).collect()))
        got = sorted(map(tuple, op(dirty).collect()))
        assert got == want, op.__name__
        assert not any(
            isinstance(x, float) and math.isnan(x) for t in got for x in t
        )


def test_assume_finite_skips_guard_same_answer(spark):
    """Round 14 optimization: engine call sites whose lat/lng are
    total md5 derivations pass ``assume_finite=True`` (the finite
    guard re-inlines the derivation chain into a Filter on both
    kernel subtrees — measured ×1.9 on the G1 headline row). Pins
    (a) identical results on finite input with and without the
    guard, and (b) that the skipping arm really removed the Filter
    from the plan."""
    import pyspark.sql.functions as F

    from pulsar_spark_spark.operators.grouped import (
        apply_best_latlng,
        apply_cluster_score,
        apply_cluster_score_v3,
        apply_trimmed_centroid,
    )

    rows = [
        (u, u * 100 + i, 1000 + i, 10.0 + (u + i) * 1e-5, 70.0 + i * 1e-5)
        for u in (1, 2)
        for i in range(6)
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, lat double, lng double"
    ).withColumn("accuracy", F.lit(50.0))
    for op in (
        apply_best_latlng,
        apply_cluster_score,
        apply_cluster_score_v3,
        apply_trimmed_centroid,
    ):
        want = sorted(map(tuple, op(pts).collect()))
        fast = op(pts, assume_finite=True)
        got = sorted(map(tuple, fast.collect()))
        assert got == want, op.__name__
        assert "isnan" not in fast._jdf.queryExecution().executedPlan().toString(), (
            op.__name__
        )
