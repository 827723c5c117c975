"""Geo-analytics kernels G1-G8: per-group procedural algorithms.

These reproduce the reference's per-address / per-agent scoring and
clustering logic EXACTLY, including its documented quirks:

- G1 ``best_lat_lng`` (BestLatLngCalculator.scala:33-58): n<4 / n>500
  guards return the last point; O(n²) Vincenty neighbor counts within
  300 m (self-pairs count, because the reference has no i≠j check and
  d(i,i)=0); first-max wins.
- G2 ``best_lat_lng_with_cluster_score`` (:65-121): score map keyed by
  COORDINATE (duplicates collapse), score overwritten by the LAST
  differing neighbor (1/(1+d) inside the j-loop — reproduced, not
  "fixed"); neighbor counts accumulate per ROW so duplicate coords
  multiply; the majority bar is ``ceil(numPoints/2)`` where the
  division is Scala Int division — i.e. effectively n//2; confidence
  1.0 only when a max-score location clears the bar.
- G3 ``get_cluster_best_lat_lng_with_score`` (:123-163): argmax by
  neighbor count, real ``ceil((majority%/100)*n)`` bar, min-points 3.
- G4 ``get_cluster_centroid_lat_lng`` (:165-198): iterative
  outlier-trimmed centroid. The reference loops thresholds
  [100,75,50,25] but each run starts from scratch and only the LAST
  (25) is kept — reproduced by running threshold 25 once. Trimming
  re-orders the point list by distance, which changes subsequent
  centroid summation order — preserved.
- G5 ``get_dbscan_clusters``
  (DeliveryLocationRefinementService.scala:132-174): time-sorted
  single-pass variant. Points are PREPENDED, so "head" is the most
  recently added point and "last" the oldest; a point farther than
  eps from the head but within eps of the tail is silently DROPPED
  (neither added nor cluster-closing) — reproduced. avg timestamp is
  integer (floor) division.
- G6 ``get_best_cluster`` (:176-204): min centroid distance (≤100 m)
  under good delivery accuracy, else min |avg_ts − delivery_ts|; ties
  go to the LATER cluster (the reference compares with ≤).
- G7 ``get_refined_lat_lng`` (:97-130, labels :206-224): orchestration
  with ORIGINAL_DELIVERED_LOCATION / CLUSTER_GEOCODE_SCORE_{HIGH,LOW}
  / CLUSTER_CENTROID fallback labels.
- G8 ``removeDelValuesAndAddRefinedLocation`` (:257-284): keeps
  history entries only when BOTH lat and lng differ from the delivered
  point (the reference's && — an entry sharing just one coordinate is
  dropped), appends refined points with the 198.0 accuracy sentinel,
  caps to the newest 100 (takeRight).

One pinned deviation, documented: where the reference iterates a Scala
``mutable.HashMap`` (tie order among equal-score locations in G2/G3),
iteration order is implementation-defined; we use FIRST-OCCURRENCE
order of the coordinate in the input list, which is deterministic.

Everything here is pure Python/numpy over one group's points — the
Spark integration is ``groupBy(key).applyInPandas`` (operators/
grouped.py), so the O(n²) work is bounded by the reference's own
n ≤ 500 guard and parallelizes across groups.
"""

from __future__ import annotations

import math

import numpy as np

from pulsar_spark_spark.functions.geo import vincenty_np, vincenty_py

# Reference defaults (BestLatLngCalculator.scala config getOrElse's,
# DeliveryLocationRefinementService.scala:99-106).
NEIGHBOR_RADIUS_M = 300.0
SCORE_DISTANCE_THRESHOLD_M = 200.0
SCORE_MIN_POINTS = 3
SCORE_MAJORITY_PCT = 50.0
CENTROID_THRESHOLDS = (100, 75, 50, 25)
CENTROID_ACCURACY_LIMIT = 100.0
DBSCAN_EPS_M = 50.0
DBSCAN_MIN_COUNT = 3
PINGS_WINDOW_START_MS = -120_000
PINGS_WINDOW_END_MS = 300_000
PINGS_ACCURACY_THRESHOLD = 100.0
DELIVERED_ACCURACY_THRESHOLD = 100.0
CLUSTER_DEL_DISTANCE_THRESHOLD = 100.0
REFINED_ACCURACY_SENTINEL = 198.0
HISTORY_CAP = 100

LABEL_ORIGINAL = "ORIGINAL_DELIVERED_LOCATION"
LABEL_SCORE_HIGH = "CLUSTER_GEOCODE_SCORE_HIGH"
LABEL_SCORE_LOW = "CLUSTER_GEOCODE_SCORE_LOW"
LABEL_CENTROID = "CLUSTER_CENTROID"


def _pairwise_vincenty(lats: np.ndarray, lngs: np.ndarray) -> np.ndarray:
    """n×n Vincenty distance matrix (meters), lat==0 sentinel applied."""
    n = len(lats)
    d = vincenty_np(
        np.repeat(lats, n), np.repeat(lngs, n), np.tile(lats, n), np.tile(lngs, n)
    )
    return d.reshape(n, n)


def _dist(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    # scalar fast path: the sequential kernels (DBSCAN walk, cluster
    # probe) compute one distance at a time, where a 1-element numpy
    # call pays ~100× overhead; vincenty_py is arithmetic-identical.
    return vincenty_py(lat1, lng1, lat2, lng2)


# ---------------------------------------------------------------------
# G1
# ---------------------------------------------------------------------
def best_lat_lng(lats: np.ndarray, lngs: np.ndarray) -> tuple[float, float]:
    """G1: point with the most neighbors within 300 m; guards to last."""
    n = len(lats)
    if n < 4 or n > 500:
        return float(lats[n - 1]), float(lngs[n - 1])
    d = _pairwise_vincenty(np.asarray(lats, float), np.asarray(lngs, float))
    counts = (d < NEIGHBOR_RADIUS_M).sum(axis=1)
    max_index = int(np.argmax(counts))  # first max wins, like the reference loop
    return float(lats[max_index]), float(lngs[max_index])


_PRE_R_M = 6371008.8  # IUGG mean radius — prefilter geometry only

# Conservative prefilter band around the 300 m neighbor cut. A WGS-84
# geodesic and a mean-radius great circle differ by at most the
# flattening-scale curvature spread: local curvature radii span
# [6335.4, 6399.6] km vs R=6371.0088 km, a ratio within [0.9944,
# 1.0045] (±0.56%). The band below allows ±17% — a ~30× margin — so
# great-circle < LO ⇒ Vincenty < 300 and great-circle > HI ⇒
# Vincenty ≥ 300 are mathematically safe, and ONLY pairs inside
# [LO, HI] pay the exact (iterative) Vincenty. The great-circle test
# itself is chord²-based: with per-POINT unit vectors precomputed,
# each pair costs ~8 flops and zero transcendentals, and chord is
# monotonic in arc, so comparing chord² against the band's chord²
# thresholds is an exact great-circle band test.
_BAND_LO_M = 250.0
_BAND_HI_M = 350.0
_CHORD2_LO = float((2.0 * np.sin(_BAND_LO_M / (2.0 * _PRE_R_M))) ** 2)
_CHORD2_HI = float((2.0 * np.sin(_BAND_HI_M / (2.0 * _PRE_R_M))) ** 2)
_PAIR_CHUNK = 2_000_000  # ~16 MB per temporary — stays cache-friendly


def _unit_xyz(lat: np.ndarray, lng: np.ndarray):
    """Unit-sphere coordinates per POINT (n transcendentals, not n²)."""
    p = np.radians(lat)
    l = np.radians(lng)
    cp = np.cos(p)
    return cp * np.cos(l), cp * np.sin(l), np.sin(p)


def best_lat_lng_batch(
    lat: np.ndarray, lng: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """G1 over MANY groups in one call: returns the best point's GLOBAL
    index per group (``lat``/``lng`` are the whole batch; group ``g``
    is rows ``starts[g]:ends[g]``, already time-sorted).

    Result-identical to calling :func:`best_lat_lng` per group, but
    O(n²/2) and mostly Vincenty-free: neighbor counts are symmetric,
    so only upper-triangle pairs are evaluated (scatter-added to both
    endpoints), and each pair's ``< 300 m`` verdict is decided by the
    chord² band test above — exact Vincenty only inside the ambiguous
    [250, 350] m ring, equal points (chord 0) in by rule, the lat==0
    sentinel out by rule (vincenty_np's own precedence: equal → 0 m,
    then sentinel → 1e7 m overrides). Counts are exact integers
    either way, so the per-group first-max argmax — the reference
    loop's tie rule (BestLatLngCalculator.scala:37-39) — cannot
    differ. Guard groups (n<4 / n>500) resolve to the last sorted
    row. Pairs are processed in ~2M-element chunks: one giant flat
    Vincenty measured ~10× slower per element than chunked (iteration
    over a >100 MB working set thrashes cache).
    """
    k_g = ends - starts
    best_idx = ends - 1  # guard arm: last time-sorted point
    ker = (k_g >= 4) & (k_g <= 500)
    if not ker.any():
        return best_idx
    ks = k_g[ker]
    ss = starts[ker]
    nrows = int(ks.sum())
    g_off = np.concatenate(([0], np.cumsum(ks)))[:-1]
    pos = np.arange(nrows)
    glob = np.repeat(ss, ks) + (pos - np.repeat(g_off, ks))
    # upper-triangle pair construction: kernel row r (global glob[r])
    # pairs with the (k-1-r_within) rows after it in the same group
    row_len = np.repeat(ks, ks) - 1 - (pos - np.repeat(g_off, ks))
    row_off = np.concatenate(([0], np.cumsum(row_len)))[:-1]
    totp = int(row_len.sum())
    ux, uy, uz = _unit_xyz(lat, lng)
    nonsent = lat != 0.0
    counts = np.zeros(len(lat), dtype=np.int64)
    # self-neighbor: d=0 < 300 unless the sentinel kills it
    counts[glob] = nonsent[glob].astype(np.int64)
    for c0 in range(0, totp, _PAIR_CHUNK):
        c1 = min(c0 + _PAIR_CHUNK, totp)
        p = np.arange(c0, c1)
        r = np.searchsorted(row_off, p, side="right") - 1
        ii = glob[r]
        jj = ii + (p - row_off[r]) + 1
        dx = ux[ii] - ux[jj]
        dy = uy[ii] - uy[jj]
        dz = uz[ii] - uz[jj]
        c2 = dx * dx + dy * dy + dz * dz
        inn = c2 < _CHORD2_LO
        ring = ~inn & (c2 <= _CHORD2_HI)
        if ring.any():
            q = np.nonzero(ring)[0]
            dv = vincenty_np(lat[ii[q]], lng[ii[q]], lat[jj[q]], lng[jj[q]])
            inn[q] = dv < NEIGHBOR_RADIUS_M
        inn &= nonsent[ii] & nonsent[jj]  # sentinel overrides everything
        both = np.concatenate((ii[inn], jj[inn]))
        counts += np.bincount(both, minlength=len(lat))
    ck = counts[glob]
    gmax = np.maximum.reduceat(ck, g_off)
    cand = ck == np.repeat(gmax, ks)
    first = np.minimum.reduceat(np.where(cand, pos, nrows), g_off)
    best_idx[ker] = glob[first]
    return best_idx


# ---------------------------------------------------------------------
# G2 / G3 shared score + neighbor-count maps
# ---------------------------------------------------------------------
def _score_maps(
    lats: np.ndarray,
    lngs: np.ndarray,
    threshold_m: float,
    d: "np.ndarray | None" = None,
) -> tuple[list[tuple[float, float]], dict, dict]:
    """Coordinate-keyed score/neighbor maps with the reference's
    overwrite-by-last-differing-neighbor scoring and per-row count
    accumulation. Returns (unique coords in first-occurrence order,
    score map, count map). ``d`` optionally supplies the pairwise
    Vincenty matrix for these points (row order == input order) —
    bit-identical to computing it here (vincenty_np is the only
    producer either way), used by the batched refinement path to
    avoid one tiny-array numpy dispatch per cluster."""
    n = len(lats)
    lat_a = np.asarray(lats, float)
    lng_a = np.asarray(lngs, float)
    if np.isnan(lat_a).any() or np.isnan(lng_a).any():
        # NaN breaks the coordinate-tuple keying below (nan != nan →
        # a fresh (nan, nan) tuple never matches the stored one →
        # KeyError deep in the walk). Non-finite coordinates are
        # outside the kernel contract — operators/grouped.py's
        # _finite_points drops them JVM-side before dispatch; a
        # direct caller gets this loud error instead of the KeyError.
        raise ValueError(
            "non-finite coordinates in scoring kernel input — filter "
            "them upstream (operators/grouped._finite_points)"
        )
    if d is None:
        d = _pairwise_vincenty(lat_a, lng_a)
    differs = (lat_a[None, :] != lat_a[:, None]) | (lng_a[None, :] != lng_a[:, None])

    uniq: list[tuple[float, float]] = []
    seen: set[tuple[float, float]] = set()
    for i in range(n):
        c = (float(lat_a[i]), float(lng_a[i]))
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    score = {c: 0.0 for c in uniq}
    count = {c: 0 for c in uniq}
    for i in range(n):
        c = (float(lat_a[i]), float(lng_a[i]))
        js = np.nonzero(differs[i])[0]
        if len(js):
            # the reference overwrites the score on every differing j,
            # so the surviving value is from the last one
            score[c] = 1.0 / (1.0 + float(d[i, js[-1]]))
        count[c] += int(((d[i] <= threshold_m) & differs[i]).sum())
    return uniq, score, count


def best_lat_lng_with_cluster_score(
    lats: np.ndarray,
    lngs: np.ndarray,
    distance_threshold_m: float = SCORE_DISTANCE_THRESHOLD_M,
    d: "np.ndarray | None" = None,
) -> tuple[float, float, float]:
    """G2: max-score location, high-confidence iff a max-score location
    has ≥ n//2 neighbors within the threshold (ties by neighbor count).
    ``d``: optional precomputed pairwise Vincenty matrix in input order
    (see :func:`_score_maps` — bit-identical either way)."""
    n = len(lats)
    if n < 3:
        return float(lats[n - 1]), float(lngs[n - 1]), 0.0
    uniq, score, count = _score_maps(lats, lngs, distance_threshold_m, d=d)
    max_score = max(score.values())
    candidates = [c for c in uniq if score[c] == max_score]
    best = candidates[0]
    max_neighbors = 0
    high = False
    # Scala: math.ceil(numPoints / 2) — Int division happens first.
    majority_bar = n // 2
    for c in candidates:
        if count[c] >= majority_bar and count[c] > max_neighbors:
            max_neighbors = count[c]
            best = c
            high = True
    return best[0], best[1], (1.0 if high else 0.0)


def cluster_best_lat_lng_with_score(
    lats: np.ndarray,
    lngs: np.ndarray,
    distance_threshold_m: float = SCORE_DISTANCE_THRESHOLD_M,
    min_points: int = SCORE_MIN_POINTS,
    majority_pct: float = SCORE_MAJORITY_PCT,
    d: "np.ndarray | None" = None,
) -> tuple[float, float, float, bool]:
    """G3: argmax-by-neighbor-count location with a real-ceil majority
    bar; score 0.0 below min_points. ``d``: see :func:`_score_maps`."""
    n = len(lats)
    uniq, _score, count = _score_maps(lats, lngs, distance_threshold_m, d=d)
    best = uniq[0]
    best_count = count[best]
    for c in uniq[1:]:  # first max wins in first-occurrence order
        if count[c] > best_count:
            best, best_count = c, count[c]
    if n < min_points:
        return best[0], best[1], 0.0, False
    if best_count >= math.ceil((majority_pct / 100.0) * n):
        return best[0], best[1], 1.0, True
    return best[0], best[1], 0.0, False


def _pair_neighbor_counts(
    lat: np.ndarray,
    lng: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    threshold_m: float,
) -> np.ndarray:
    """Per-ROW counts of ``d <= threshold & differs`` neighbors within
    each group, via upper-triangle chord-band pair verdicts (exact
    Vincenty only inside the ±20% ring; lat==0 sentinel forces a pair
    out, exactly vincenty_np's 1e7). Shared by the G2/G3 batch arms."""
    n_rows = len(lat)
    k_g = ends - starts
    pos = np.arange(n_rows)
    g_off = starts
    c2_lo = float(
        (2.0 * np.sin(threshold_m * 0.8 / (2.0 * _PRE_R_M))) ** 2
    )
    c2_hi = float(
        (2.0 * np.sin(threshold_m * 1.2 / (2.0 * _PRE_R_M))) ** 2
    )
    ux, uy, uz = _unit_xyz(lat, lng)
    nonsent = lat != 0.0
    row_len = np.repeat(k_g, k_g) - 1 - (pos - np.repeat(g_off, k_g))
    row_off = np.concatenate(([0], np.cumsum(row_len)))[:-1]
    totp = int(row_len.sum())
    counts = np.zeros(n_rows, dtype=np.int64)
    for a in range(0, totp, _PAIR_CHUNK):
        b = min(a + _PAIR_CHUNK, totp)
        p = np.arange(a, b)
        r = np.searchsorted(row_off, p, side="right") - 1
        ii = r
        jj = ii + (p - row_off[r]) + 1
        dx = ux[ii] - ux[jj]
        dy = uy[ii] - uy[jj]
        dz = uz[ii] - uz[jj]
        c2 = dx * dx + dy * dy + dz * dz
        inn = c2 < c2_lo
        ring = ~inn & (c2 <= c2_hi)
        if ring.any():
            q = np.nonzero(ring)[0]
            dv = vincenty_np(lat[ii[q]], lng[ii[q]], lat[jj[q]], lng[jj[q]])
            inn[q] = dv <= threshold_m
        differs = (lat[ii] != lat[jj]) | (lng[ii] != lng[jj])
        inn &= differs & nonsent[ii] & nonsent[jj]
        counts += np.bincount(
            np.concatenate((ii[inn], jj[inn])), minlength=n_rows
        )
    return counts


def _unique_coords_ordered(lat, lng, gidx, n_g):
    """Per-group unique coordinates in FIRST-OCCURRENCE order (the
    reference's insertion order): returns (first, inv, order-of-first
    ``of``, per-group unique segment bounds ``u_starts``/``u_ends``).
    np.unique's stable sort (return_index) guarantees ``first`` is the
    earliest row of each (group, coord) key.

    Signed zeros are canonicalized BEFORE the int64 bit view: the
    scalar kernels key their dicts on float equality (-0.0 == 0.0) and
    the batch arms' own ``differs`` masks compare floats, so folding
    on raw bit patterns would split a coordinate the rest of the
    kernel treats as one (round-11 advice)."""
    lat = np.where(lat == 0.0, 0.0, lat)
    lng = np.where(lng == 0.0, 0.0, lng)
    key = np.stack([gidx, lat.view(np.int64), lng.view(np.int64)], axis=1)
    _u, first, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    inv = inv.ravel()  # numpy 2.x returns (n,1) for axis unique
    order = np.argsort(first, kind="stable")
    of = first[order]
    og = gidx[of]
    u_starts = np.searchsorted(og, np.arange(n_g), side="left")
    u_ends = np.searchsorted(og, np.arange(n_g), side="right")
    return first, inv, order, of, u_starts, u_ends


def best_score_batch(
    lat: np.ndarray,
    lng: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    distance_threshold_m: float = SCORE_DISTANCE_THRESHOLD_M,
):
    """G2 over MANY groups in one call → (best_lat, best_lng, score)
    arrays (groups are time-sorted row segments; caller guards n<3).

    Result-identical to :func:`best_lat_lng_with_cluster_score`
    per group, Vincenty reduced from O(n²) per group to O(uniq):

    - neighbor counts: the shared chord-band pair stage
      (:func:`_pair_neighbor_counts`) — exact integers, as in G3;
    - scores: the reference's overwrite-by-last-differing-neighbor
      discipline collapses algebraically — ``js`` depends only on the
      ROW'S COORD (differs is coord-level), so js[-1] is the group's
      last row L for rows off L's coord and the last row M with a
      coord ≠ L's otherwise, and the surviving map value is written by
      the LAST row of each unique coord. One exact Vincenty per
      unique coord (the same elementwise vincenty_np the matrix path
      used — identical doubles, sentinel included), zero for
      single-coord groups (score stays 0.0, never written);
    - selection: first max-score candidate in first-occurrence order,
      upgraded to the first strictly-max-count candidate meeting the
      n//2 (INT division) majority bar — the scalar loop verbatim,
      segment-vectorized.
    """
    n_rows = len(lat)
    n_g = len(starts)
    k_g = ends - starts
    gidx = np.repeat(np.arange(n_g), k_g)
    pos = np.arange(n_rows)
    counts = _pair_neighbor_counts(
        lat, lng, starts, ends, distance_threshold_m
    )
    first, inv, order, of, u_starts, u_ends = _unique_coords_ordered(
        lat, lng, gidx, n_g
    )
    n_u = len(first)
    nu = u_ends - u_starts
    coord_counts = np.bincount(
        inv, weights=counts.astype(np.float64), minlength=n_u
    ).astype(np.int64)
    # --- per-unique score: last writer row × its last differing j ---
    last_occ = np.full(n_u, -1, dtype=np.int64)
    np.maximum.at(last_occ, inv, pos)
    L = np.repeat(ends - 1, k_g)  # group's last row, per row
    same_as_L = (lat == lat[L]) & (lng == lng[L])
    M_g = np.maximum.reduceat(np.where(same_as_L, -1, pos), starts)
    j_last = np.where(same_as_L, np.repeat(M_g, k_g), L)
    # per-unique (in np.unique's own index space): does its GROUP have
    # ≥2 distinct coords? single-coord groups never write a score.
    multi = nu[gidx[first]] > 1
    w = last_occ  # writer row per unique
    jl = j_last[w]
    scores = np.zeros(n_u, dtype=np.float64)
    if multi.any():
        q = np.nonzero(multi)[0]
        dv = vincenty_np(lat[w[q]], lng[w[q]], lat[jl[q]], lng[jl[q]])
        scores[q] = 1.0 / (1.0 + dv)
    # --- selection over first-occurrence-ordered uniques ---
    oscore = scores[order]
    ocount = coord_counts[order]
    upos = np.arange(n_u)
    smax = np.maximum.reduceat(oscore, u_starts)
    cand = oscore == np.repeat(smax, nu)
    first_cand = np.minimum.reduceat(np.where(cand, upos, n_u), u_starts)
    bar = k_g // 2  # Scala Int division (math.ceil(n/2) after int div)
    qual = cand & (ocount >= np.repeat(bar, nu))
    high = np.maximum.reduceat(qual.astype(np.int64), u_starts) > 0
    qmax = np.maximum.reduceat(np.where(qual, ocount, -1), u_starts)
    first_qmax = np.minimum.reduceat(
        np.where(qual & (ocount == np.repeat(qmax, nu)), upos, n_u),
        u_starts,
    )
    winner = np.where(high, first_qmax, first_cand)
    best_row = of[winner]
    # inline n<3 guard (BestLatLngCalculator.scala:76-78): callers
    # normally pre-dispatch these JVM-side; keep the batch total
    small = k_g < 3
    best_row = np.where(small, ends - 1, best_row)
    return (
        lat[best_row],
        lng[best_row],
        np.where(high & ~small, 1.0, 0.0),
    )


def cluster_score_batch(
    lat: np.ndarray,
    lng: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    distance_threshold_m: float = SCORE_DISTANCE_THRESHOLD_M,
    min_points: int = SCORE_MIN_POINTS,
    majority_pct: float = SCORE_MAJORITY_PCT,
):
    """G3 over MANY groups in one call → (best_lat, best_lng, score,
    high) arrays, one entry per group (group ``g`` = rows
    ``starts[g]:ends[g]``, time-sorted).

    Result-identical to :func:`cluster_best_lat_lng_with_score` per
    group: per-row neighbor counts use the same ``d <= threshold &
    differs`` predicate — decided by the shared chord² band stage
    (:func:`_pair_neighbor_counts`, band [0.8, 1.2]×threshold derived
    FROM the parameter, exact Vincenty only inside the ring; the
    lat==0 sentinel forces a pair out exactly like vincenty_np's
    1e7) — counts fold onto first-occurrence-ordered unique
    coordinates (np.unique's stable sort), the winner is the first
    strict max in that order (the reference loop's rule,
    BestLatLngCalculator.scala:123-163), and the real-ceil majority
    bar is evaluated with the same float expression.
    """
    n_g = len(starts)
    k_g = ends - starts
    gidx = np.repeat(np.arange(n_g), k_g)
    counts = _pair_neighbor_counts(
        lat, lng, starts, ends, distance_threshold_m
    )
    # ---- fold row counts onto unique (group, coord) keys, in
    # FIRST-OCCURRENCE order per group (the reference's insertion
    # order) ----
    first, inv, order, of, u_starts, u_ends = _unique_coords_ordered(
        lat, lng, gidx, n_g
    )
    coord_counts = np.bincount(
        inv, weights=counts.astype(np.float64)
    ).astype(np.int64)
    oc = coord_counts[order]
    nu = u_ends - u_starts
    gmax = np.maximum.reduceat(oc, u_starts)
    upos = np.arange(len(oc))
    cand = oc == np.repeat(gmax, nu)
    winner = np.minimum.reduceat(np.where(cand, upos, len(oc)), u_starts)
    best_row = of[winner]
    best_count = oc[winner]
    # ---- score / high (same float expression as the scalar kernel) ----
    n = k_g
    bar = np.ceil((majority_pct / 100.0) * n)
    high = (n >= min_points) & (best_count >= bar)
    score = np.where(high, 1.0, 0.0)
    return lat[best_row], lng[best_row], score, high


# ---------------------------------------------------------------------
# G4
# ---------------------------------------------------------------------
def trimmed_centroid(
    lats: np.ndarray,
    lngs: np.ndarray,
    accuracies: np.ndarray,
    threshold_m: float = CENTROID_THRESHOLDS[-1],
    accuracy_limit: float = CENTROID_ACCURACY_LIMIT,
) -> tuple[float, float] | None:
    """G4: iterative outlier-trimmed centroid at the final threshold.

    The reference runs thresholds [100,75,50,25] from scratch and keeps
    only the last run's centroid, so a single run at 25 is equivalent.
    Returns None when fewer than 4 accurate points exist (the reference
    yields a null centroid there and the caller skips the result).
    """
    pts = [
        (float(la), float(ln))
        for la, ln, a in zip(lats, lngs, accuracies)
        if a <= accuracy_limit
    ]
    centroid: tuple[float, float] | None = None
    while len(pts) > 3:
        m = len(pts)
        # SEQUENTIAL sums, not np.sum: numpy's pairwise summation
        # differs from the reference's fold by ~1 ulp, which can flip
        # which point gets trimmed at a distance near-tie and walk the
        # centroid to a different fixpoint (hypothesis found such a
        # cloud round 8). The loop is already Python-list-shaped, so
        # this costs nothing.
        c_lat = sum(p[0] for p in pts) / m
        c_lng = sum(p[1] for p in pts) / m
        centroid = (c_lat, c_lng)
        d = vincenty_np(
            np.full(m, c_lat),
            np.full(m, c_lng),
            np.fromiter((p[0] for p in pts), float, m),
            np.fromiter((p[1] for p in pts), float, m),
        )
        # avg in SORTED-distance order, sequentially — the reference
        # sorts first and folds the sorted list, and a different
        # summation order can flip the `avg > threshold` branch at the
        # boundary (same 1-ulp class as the centroid sums above)
        order = np.argsort(d, kind="stable")
        avg = sum(float(d[int(k)]) for k in order) / m
        if avg > threshold_m:
            outliers = max(m * 0.1, 1)
            keep = order[: m - int(outliers)]
            # NB: the kept list is re-ordered by distance, like the
            # reference's sortBy — later centroids sum in that order.
            pts = [pts[int(k)] for k in keep]
        else:
            break
    return centroid


def trimmed_centroid_batch(
    jobs: list,
    threshold_m: float = CENTROID_THRESHOLDS[-1],
    accuracy_limit: float = CENTROID_ACCURACY_LIMIT,
) -> list:
    """:func:`trimmed_centroid` over MANY point clouds in lockstep.

    Bit-identical per job: the per-group centroid sums, the
    stable-argsort, the sorted-order average fold and the trim rule
    are the scalar function's exact statements — only the per-trim-
    iteration Vincenty dispatch is fused into ONE vectorized call
    across every still-active group (profiled: on ~8-point clusters
    the tiny-array numpy dispatch was ~1.1 s of the refinement body's
    3.2 s walk at 10×, ~300 µs/call of pure overhead). Returns one
    ``(lat, lng) | None`` per job, job order preserved.
    """
    state: list[list[tuple[float, float]]] = []
    for lats, lngs, accs in jobs:
        state.append(
            [
                (float(la), float(ln))
                for la, ln, a in zip(lats, lngs, accs)
                if a <= accuracy_limit
            ]
        )
    cents: list[tuple[float, float] | None] = [None] * len(jobs)
    active = [g for g, p in enumerate(state) if len(p) > 3]
    while active:
        c_lats, c_lngs, ms = [], [], []
        for g in active:
            pts = state[g]
            m = len(pts)
            # SEQUENTIAL sums — see trimmed_centroid's parity note
            c_lat = sum(p[0] for p in pts) / m
            c_lng = sum(p[1] for p in pts) / m
            cents[g] = (c_lat, c_lng)
            c_lats.append(c_lat)
            c_lngs.append(c_lng)
            ms.append(m)
        tot = int(sum(ms))
        la2 = np.fromiter((p[0] for g in active for p in state[g]), float, tot)
        ln2 = np.fromiter((p[1] for g in active for p in state[g]), float, tot)
        dall = vincenty_np(
            np.repeat(np.asarray(c_lats), ms),
            np.repeat(np.asarray(c_lngs), ms),
            la2,
            ln2,
        )
        nxt = []
        off = 0
        for g, m in zip(active, ms):
            d = dall[off : off + m]
            off += m
            order = np.argsort(d, kind="stable")
            avg = sum(float(d[int(k)]) for k in order) / m
            if avg > threshold_m:
                outliers = max(m * 0.1, 1)
                keep = order[: m - int(outliers)]
                pts = state[g]
                state[g] = [pts[int(k)] for k in keep]
                if len(state[g]) > 3:
                    nxt.append(g)
        active = nxt
    return cents


# ---------------------------------------------------------------------
# G5
# ---------------------------------------------------------------------
def dbscan_clusters(
    pings: list[tuple[int, float, float, float]],
    eps_m: float = DBSCAN_EPS_M,
    min_count: int = DBSCAN_MIN_COUNT,
    pair_dist: "np.ndarray | None" = None,
    return_indices: bool = False,
) -> list:
    """G5: time-sorted single-pass DBSCAN variant.

    ``pings`` are (ts_ms, lat, lng, accuracy) tuples; they are sorted
    by ts (stable — equal timestamps keep input order, which callers
    pin with a secondary key). Cluster points are stored in PREPEND
    order (newest first), matching the reference's ``+=:``; the
    head/tail asymmetry and the silent drop case are reproduced.
    Returns (points, centroid_lat, centroid_lng, floor-avg ts) tuples;
    points are (lat, lng, accuracy, ts_ms).

    ``pair_dist`` optionally supplies the pings' pairwise Vincenty
    matrix IN INPUT ORDER — bit-identical values to the scalar
    fallback (the batch and scalar Vincenty are engineered
    ulp-identical, pinned in tests), used by the batched refinement
    path: the walk queries ~1-2 distances per ping and paying a
    scalar Python Vincenty for each was ~45% of the pipeline's
    measured kernel wall. ``return_indices=True`` appends each
    cluster's INPUT-ORDER index list (head-first, matching the point
    list) as a 5th element so callers can slice ``pair_dist``
    submatrices for downstream scoring.
    """
    clusters: list = []
    cur: list[tuple[float, float, float, int]] = []
    cur_idx: list[int] = []
    sum_lat = sum_lng = 0.0
    sum_ts = 0
    order = sorted(range(len(pings)), key=lambda k: pings[k][0])
    if pair_dist is not None:
        dist = lambda i, j: float(pair_dist[i, j])  # noqa: E731
    else:
        dist = lambda i, j: _dist(  # noqa: E731
            pings[i][1], pings[i][2], pings[j][1], pings[j][2]
        )

    def _close() -> None:
        if len(cur) >= min_count:
            m = len(cur)
            rec = [list(cur), sum_lat / m, sum_lng / m, sum_ts // m]
            if return_indices:
                rec.append(list(cur_idx))
            clusters.append(tuple(rec))

    for k in order:
        ts_ms, lat, lng, acc = pings[k]
        if not cur or dist(k, cur_idx[0]) <= eps_m:
            cur.insert(0, (lat, lng, acc, ts_ms))
            cur_idx.insert(0, k)
            sum_lat += lat
            sum_lng += lng
            sum_ts += ts_ms
        elif dist(k, cur_idx[-1]) > eps_m:
            _close()
            cur = [(lat, lng, acc, ts_ms)]
            cur_idx = [k]
            sum_lat, sum_lng, sum_ts = lat, lng, ts_ms
        # else: within eps of the tail but not the head → dropped
        # (reference quirk — no branch handles this case)
    _close()
    return clusters


# ---------------------------------------------------------------------
# G6
# ---------------------------------------------------------------------
def best_cluster(
    del_lat: float,
    del_lng: float,
    del_time_ms: int,
    del_accuracy: float,
    clusters: list,
    del_accuracy_threshold: float = DELIVERED_ACCURACY_THRESHOLD,
    cluster_del_distance_threshold: float = CLUSTER_DEL_DISTANCE_THRESHOLD,
) -> list:
    """G6: choose by min centroid distance (bounded) when the delivery
    fix is accurate, else by min |avg_ts − delivery_ts|. The reference
    compares with ≤, so ties go to the LATER cluster. Cluster records
    may carry a trailing index list (``dbscan_clusters``'s
    ``return_indices`` form) — only the first four fields are read,
    and the WHOLE winning record is returned (callers using the plain
    form see the points list as before via ``best_cluster(...)[0]``
    — see :func:`refine_delivery`)."""
    min_distance = float("inf")
    min_time_diff = float("inf")
    best: "tuple | None" = None
    for rec in clusters:
        _points, c_lat, c_lng, avg_ts = rec[0], rec[1], rec[2], rec[3]
        if del_accuracy <= del_accuracy_threshold:
            d = _dist(c_lat, c_lng, del_lat, del_lng)
            if d <= min_distance and d <= cluster_del_distance_threshold:
                min_distance = d
                best = rec
        else:
            td = abs(avg_ts - del_time_ms)
            if td <= min_time_diff:
                min_time_diff = td
                best = rec
    return best


# ---------------------------------------------------------------------
# G7
# ---------------------------------------------------------------------
def refine_delivery(
    del_lat: float,
    del_lng: float,
    del_time_ms: int,
    del_accuracy: float,
    pings: list[tuple[int, float, float, float]],
    pair_dist: "np.ndarray | None" = None,
    defer_centroid: bool = False,
):
    """G7: full refinement orchestration → (is_refined, [(lat, lng,
    label)]). Pings are (ts_ms, lat, lng, accuracy).

    ``pair_dist`` optionally supplies the pings' pairwise Vincenty
    matrix in INPUT ORDER (rows/cols = ping position). The DBSCAN walk
    and the cluster scoring then read precomputed entries instead of
    dispatching one scalar (walk) / one tiny-array (scoring) Vincenty
    per query — the batched path `apply_delivery_refinement` uses to
    compute ALL deliveries' distances in one vectorized call per Arrow
    body (profiled: ~75% of the kernel wall was that dispatch
    overhead). Values are bit-identical either way (vincenty_np ≡
    vincenty_py by construction, pinned in tests), so results cannot
    differ; the default None keeps the self-contained scalar form the
    parity oracles call.

    ``defer_centroid=True`` returns a THREE-tuple ``(refined, results,
    centroid_job)`` where the G4 trimmed centroid has NOT been run:
    ``centroid_job`` is ``(c_lats, c_lngs, c_accs) | None`` for the
    caller to evaluate via :func:`trimmed_centroid_batch` in lockstep
    across many deliveries (the centroid row, when produced, belongs
    at the END of ``results``). Same values by construction — the
    batch function is statement-identical per job."""
    fidx = [
        k
        for k, p in enumerate(pings)
        if p[3] <= PINGS_ACCURACY_THRESHOLD
        and del_time_ms + PINGS_WINDOW_START_MS <= p[0] <= del_time_ms + PINGS_WINDOW_END_MS
    ]
    filtered = [pings[k] for k in fidx]
    if pair_dist is not None and fidx:
        fa = np.asarray(fidx)
        sub = pair_dist[fa[:, None], fa]  # np.ix_ without the mesh tax
    else:
        sub = None
    clusters = dbscan_clusters(
        filtered, pair_dist=sub, return_indices=sub is not None
    )
    if not clusters:
        out = False, [(del_lat, del_lng, LABEL_ORIGINAL)]
        return (*out, None) if defer_centroid else out
    chosen = best_cluster(del_lat, del_lng, del_time_ms, del_accuracy, clusters)
    if not chosen:
        out = False, [(del_lat, del_lng, LABEL_ORIGINAL)]
        return (*out, None) if defer_centroid else out
    points = chosen[0]
    c_lats = np.array([p[0] for p in points])
    c_lngs = np.array([p[1] for p in points])
    c_accs = np.array([p[2] for p in points])
    if sub is not None and len(chosen) > 4:
        ca = np.asarray(chosen[4])
        d_sub = sub[ca[:, None], ca]
    else:
        d_sub = None
    s_lat, s_lng, _score, high = cluster_best_lat_lng_with_score(
        c_lats, c_lngs, d=d_sub
    )
    results = [(s_lat, s_lng, LABEL_SCORE_HIGH if high else LABEL_SCORE_LOW)]
    if defer_centroid:
        return True, results, (c_lats, c_lngs, c_accs)
    cen = trimmed_centroid(c_lats, c_lngs, c_accs)
    if cen is not None:
        results.append((cen[0], cen[1], LABEL_CENTROID))
    return True, results


# ---------------------------------------------------------------------
# G8
# ---------------------------------------------------------------------
def merge_refined_history(
    history: list[tuple[str, float, float, float]],
    del_lat: float,
    del_lng: float,
    refined: list[tuple[float, float, str]],
    refined_time: str,
) -> list[tuple[str, float, float, float]]:
    """G8: swap refined locations into a (time, lat, lng, accuracy)
    history list. An entry survives only if BOTH coordinates differ
    from the delivered point (the reference's &&); refined points are
    appended with the 198.0 accuracy sentinel; newest 100 kept."""
    final = [e for e in history if e[1] != del_lat and e[2] != del_lng]
    for lat, lng, _label in refined:
        final.append((refined_time, lat, lng, REFINED_ACCURACY_SENTINEL))
    if len(final) > HISTORY_CAP:
        final = final[-HISTORY_CAP:]
    return final
