"""Property tests: the kernel-pipeline DuckDB oracles vs the Python
kernels on ARBITRARY synthetic events — not just the driver fixture.

The round-6 oracles transliterate procedural kernels into SQL (the
G5 sequential DBSCAN walk as a recursive CTE, the G2 band-argmax, the
G4/G7 unrolled trim loops). The driver gate only ever exercises the
sf0.01 fixture; these tests drive the same ORACLES[...] SQL against
generated `events` tables and compare with the kernels run on the
same deterministic geo projection, so transliteration bugs that the
fixture's geometry happens to avoid (drop-quirk orderings, min-count
boundaries, duplicate coordinates, equal compressed timestamps,
empty windows) still get caught.

Coordinate duplicates are forced via the jitter construction: two
events of one user whose ids differ by a multiple of 1001 share the
per-event jitter (plans/geo.py: jitter = salted_mod(event_id, 1001))
and therefore the exact coordinate pair. Equal kernel timestamps come
from the //1500 clock compression of close-together raw timestamps.

Hypothesis runs derandomized so the example set — and the test
verdict — is stable run to run.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timedelta

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import pulsar_spark_spark.operators.geo_kernels as gk
from pulsar_spark_spark.plans import ORACLES
from pulsar_spark_spark.plans.geo import _SQL_GEO_EVENTS
from pulsar_spark_spark.plans.kernels import _CENTROID_NUDGE

BASE_TS = datetime(2024, 1, 1)


def _connect(rows):
    """DuckDB connection with an `events` view over generated rows
    (event_id, ts, user_id, event_type, value, props)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    if rows:
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows)
    return con


def _geo_rows(con, clock_div=1):
    """The deterministic geo projection, exactly as plans/kernels.py
    consumes it (validated against Spark by 48 other oracle-checked
    queries). G2/G4 run on the raw ms clock (clock_div=1); the
    refinement pipeline runs on the compressed clock (1500)."""
    return con.execute(
        f"""
        SELECT user_id, event_id, event_type,
               ((epoch_ns(ts) // 1000) // 1000) // {clock_div} AS ts_ms,
               lat, lng, accuracy
        FROM ({_SQL_GEO_EVENTS})
        ORDER BY user_id, ts_ms, event_id
        """
    ).fetchall()


def _kernel_refinement(geo_rows):
    pts = defaultdict(list)
    dels = []
    for u, ev, et, t, la, ln, a in geo_rows:
        pts[u].append((int(t), la, ln, a, ev))
        if et == "purchase":
            dels.append((u, ev, int(t), la, ln, a))
    out = {}
    for u, ev, t, la, ln, a in dels:
        pl = [
            (p[0], p[1], p[2], p[3])
            for p in sorted(pts[u], key=lambda p: (p[0], p[4]))
            if p[3] <= 100.0 and t - 120_000 <= p[0] <= t + 300_000
        ]
        refined, results = gk.refine_delivery(la, ln, t, a, pl)
        out[ev] = (
            u,
            refined,
            sorted(
                (m, round(x + _CENTROID_NUDGE, 6), round(y + _CENTROID_NUDGE, 6))
                for x, y, m in results
            ),
        )
    return out


def _kernel_g2g4(geo_rows):
    """Kernel expectation per user, plus the ulp-tie candidate set.

    The G2 score argmax is a strict float-equality selection; when the
    top scores are separated only by the ulps between the two
    DIRECTIONS of one symmetric Vincenty pair (~1e-12 relative —
    the documented fragility class, see plans/kernels.py), no portable
    oracle can reproduce the kernel's pick. For such users the test
    accepts any coordinate whose kernel score is within 1e-6 relative
    of the max (the oracle's own band), instead of demanding the
    kernel's exact pick.
    """
    groups = defaultdict(list)
    for u, ev, _et, t, la, ln, a in geo_rows:
        groups[u].append((la, ln, a))
    out = {}
    for u, pts in groups.items():
        lats = np.array([p[0] for p in pts])
        lngs = np.array([p[1] for p in pts])
        accs = np.array([p[2] for p in pts])
        if len(lats) < 3:
            g2 = (float(lats[-1]), float(lngs[-1]), 0.0)
            tie_set = {(g2[0], g2[1])}
        else:
            g2 = gk.best_lat_lng_with_cluster_score(lats, lngs)
            uniq, score, _cnt = gk._score_maps(lats, lngs, 200.0)
            mx = max(score.values())
            band = {c for c in uniq if score[c] >= mx * (1.0 - 1e-6)}
            tie_set = band if len(band) > 1 else {(g2[0], g2[1])}
        n_acc = int((accs <= 100.0).sum())
        cen = (
            gk.trimmed_centroid(lats, lngs, accs) if n_acc >= 4 else None
        )
        if cen is None:
            c6 = (None, None)
        else:
            c6 = (
                round(cen[0] + _CENTROID_NUDGE, 6),
                round(cen[1] + _CENTROID_NUDGE, 6),
            )
        out[u] = (g2[0], g2[1], g2[2], len(pts), c6[0], c6[1], n_acc, tie_set)
    return out


# -- strategies ------------------------------------------------------

def _events_strategy():
    """A small corpus: 1-4 users, 0-24 events each; ids sometimes
    collide mod 1001 (duplicate coordinates), timestamps cluster
    within minutes (equal compressed ts + dense windows) or spread
    over hours (empty windows)."""

    @st.composite
    def corpus(draw):
        n_users = draw(st.integers(1, 4))
        rows = []
        next_id = draw(st.integers(0, 5000))
        for u in range(n_users):
            n_events = draw(st.integers(0, 24))
            spread_s = draw(st.sampled_from([60, 600, 7200]))
            ids: list[int] = []
            for _ in range(n_events):
                if ids and draw(st.booleans()) and draw(st.booleans()):
                    # force a jitter collision -> exact duplicate coords
                    ids.append(draw(st.sampled_from(ids)) + 1001)
                else:
                    next_id += draw(st.integers(1, 7))
                    ids.append(next_id)
            for eid in ids:
                off = draw(st.integers(0, spread_s))
                et = draw(
                    st.sampled_from(
                        ["purchase", "click", "view", "purchase"]
                    )
                )
                rows.append(
                    (
                        eid,
                        BASE_TS + timedelta(seconds=off),
                        u * 17 + 3,
                        et,
                        1.0,
                        "{}",
                    )
                )
        # unique event ids across the corpus (collisions only in-user
        # via the +1001 trick; cross-user id reuse would break joins)
        seen = set()
        rows = [r for r in rows if not (r[0] in seen or seen.add(r[0]))]
        return rows

    return corpus()


@settings(max_examples=25, deadline=None, derandomize=True)
@given(_events_strategy())
def test_refinement_oracle_matches_kernel_on_arbitrary_events(rows):
    con = _connect(rows)
    geo = _geo_rows(con, clock_div=1500)
    want = _kernel_refinement(geo)
    got = defaultdict(list)
    got_flags = {}
    for did, uid, isref, meth, rla, rln in con.execute(
        ORACLES["delivery_refinement"]
    ).fetchall():
        got[did].append((meth, rla, rln))
        got_flags[did] = (uid, isref)
    assert set(got) == set(want)
    for ev, (u, refined, res) in want.items():
        assert got_flags[ev] == (u, refined), f"delivery {ev}"
        assert sorted(got[ev]) == res, f"delivery {ev}"


@settings(max_examples=25, deadline=None, derandomize=True)
@given(_events_strategy())
def test_g2g4_oracle_matches_kernel_on_arbitrary_events(rows):
    if not rows:
        return
    con = _connect(rows)
    geo = _geo_rows(con)
    want = _kernel_g2g4(geo)
    got = {}
    for (
        uid,
        lat,
        lng,
        score,
        n_points,
        clat,
        clng,
        n_acc,
    ) in con.execute(
        "SELECT user_id, lat, lng, cluster_score, n_points, "
        "centroid_lat, centroid_lng, n_accurate FROM ("
        + ORACLES["cluster_score_per_user"]
        + ")"
    ).fetchall():
        got[uid] = (lat, lng, score, n_points, clat, clng, n_acc)
    assert set(got) == set(want)
    for u, w in want.items():
        g = got[u]
        tie_set = w[7]
        if len(tie_set) > 1:
            # documented ulp-tie class: the oracle must land INSIDE
            # the band candidates; the exact direction (and the
            # downstream 0/1 score of the direction it picked) is not
            # portable across engines.
            assert (g[0], g[1]) in tie_set, f"user {u} outside tie set"
        else:
            assert g[0] == w[0] and g[1] == w[1], f"user {u} best point"
            assert g[2] == w[2], f"user {u} score"
        assert g[3] == w[3] and g[6] == w[6], f"user {u} counts"
        assert g[4] == pytest.approx(w[4], abs=1e-9) if w[4] is not None else g[4] is None
        assert g[5] == pytest.approx(w[5], abs=1e-9) if w[5] is not None else g[5] is None
