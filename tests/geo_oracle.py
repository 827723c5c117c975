"""Independent pure-Python oracle for the G1-G7 kernels.

Straightforward loop transliterations of the reference algorithms
(BestLatLngCalculator.scala:33-198,
DeliveryLocationRefinementService.scala:97-224), kept deliberately
naive — no numpy vectorization, no shared code with the production
kernels except the Vincenty distance primitive — so a logic bug in
``operators/geo_kernels.py`` cannot be mirrored here.
"""

from __future__ import annotations

import math

from pulsar_spark_spark.functions.geo import vincenty_py


def best_lat_lng_oracle(points: list[tuple[float, float]]) -> tuple[float, float]:
    n = len(points)
    if n < 4 or n > 500:
        return points[-1]
    counts = [0] * n
    max_index = 0
    for i in range(n):
        for j in range(n):
            if vincenty_py(points[i][0], points[i][1], points[j][0], points[j][1]) < 300:
                counts[i] += 1
        if counts[max_index] < counts[i]:
            max_index = i
    return points[max_index]


def cluster_score_oracle(
    points: list[tuple[float, float]], threshold: float = 200.0
) -> tuple[float, float, float]:
    n = len(points)
    if n < 3:
        return points[-1][0], points[-1][1], 0.0
    order: list[tuple[float, float]] = []
    score: dict = {}
    count: dict = {}
    for p in points:
        if p not in score:
            order.append(p)
            score[p] = 0.0
            count[p] = 0
    for i in range(n):
        for j in range(n):
            if points[i] != points[j]:
                d = vincenty_py(points[i][0], points[i][1], points[j][0], points[j][1])
                score[points[i]] = 1.0 / (1.0 + d)
                if d <= threshold:
                    count[points[i]] += 1
    mx = max(score.values())
    cands = [p for p in order if score[p] == mx]
    best = cands[0]
    max_neighbors = 0
    high = False
    for p in cands:
        if count[p] >= n // 2 and count[p] > max_neighbors:
            max_neighbors = count[p]
            best = p
            high = True
    return best[0], best[1], (1.0 if high else 0.0)


def cluster_score_v3_oracle(
    points: list[tuple[float, float]],
    threshold: float = 200.0,
    min_points: int = 3,
    majority_pct: float = 50.0,
) -> tuple[float, float, float, bool]:
    n = len(points)
    order: list[tuple[float, float]] = []
    count: dict = {}
    for p in points:
        if p not in count:
            order.append(p)
            count[p] = 0
    for i in range(n):
        for j in range(n):
            if points[i] != points[j]:
                d = vincenty_py(points[i][0], points[i][1], points[j][0], points[j][1])
                if d <= threshold:
                    count[points[i]] += 1
    best = order[0]
    for p in order[1:]:
        if count[p] > count[best]:
            best = p
    if n < min_points:
        return best[0], best[1], 0.0, False
    if count[best] >= math.ceil((majority_pct / 100.0) * n):
        return best[0], best[1], 1.0, True
    return best[0], best[1], 0.0, False


def trimmed_centroid_oracle(
    points: list[tuple[float, float, float]], threshold: float = 25.0
) -> tuple[float, float] | None:
    """points are (lat, lng, accuracy)."""
    pts = [(p[0], p[1]) for p in points if p[2] <= 100.0]
    centroid = None
    while len(pts) > 3:
        m = len(pts)
        centroid = (sum(p[0] for p in pts) / m, sum(p[1] for p in pts) / m)
        dists = [
            (p, vincenty_py(centroid[0], centroid[1], p[0], p[1])) for p in pts
        ]
        dists.sort(key=lambda x: x[1])  # python sort is stable
        avg = sum(d for _, d in dists) / m
        if avg > threshold:
            outliers = max(m * 0.1, 1)
            pts = [p for p, _ in dists[: m - int(outliers)]]
        else:
            break
    return centroid


def dbscan_oracle(
    pings: list[tuple[int, float, float, float]],
    eps: float = 50.0,
    min_count: int = 3,
):
    """pings are (ts_ms, lat, lng, accuracy); returns reference-shaped
    clusters (points newest-first, centroid, floor-avg ts)."""
    clusters = []
    cur: list[tuple[float, float, float, int]] = []
    s_lat = s_lng = 0.0
    s_ts = 0
    for ts, lat, lng, acc in sorted(pings, key=lambda p: p[0]):
        if not cur or vincenty_py(lat, lng, cur[0][0], cur[0][1]) <= eps:
            cur.insert(0, (lat, lng, acc, ts))
            s_lat += lat
            s_lng += lng
            s_ts += ts
        elif vincenty_py(lat, lng, cur[-1][0], cur[-1][1]) > eps:
            if len(cur) >= min_count:
                clusters.append(
                    (list(cur), s_lat / len(cur), s_lng / len(cur), s_ts // len(cur))
                )
            cur = [(lat, lng, acc, ts)]
            s_lat, s_lng, s_ts = lat, lng, ts
    if len(cur) >= min_count:
        clusters.append(
            (list(cur), s_lat / len(cur), s_lng / len(cur), s_ts // len(cur))
        )
    return clusters


def merge_refined_history_oracle(
    history: list[tuple[int, int, float, float, float]],
    del_lat: float,
    del_lng: float,
    refined: list[tuple[float, float, str]],
    del_ts_ms: int,
    delivery_id: int,
) -> list[tuple]:
    """G8 transliteration (DeliveryLocationRefinementService.scala:
    257-284). ``history`` rows are (ts_ms, event_id, lat, lng,
    accuracy), time-sorted. Survivors need BOTH coordinates to differ
    from the delivered point; refined points append with the 198.0
    sentinel; takeRight(100) keeps the newest positionally."""
    final = [e + (None,) for e in history if e[2] != del_lat and e[3] != del_lng]
    for lat, lng, label in refined:
        final.append((del_ts_ms, delivery_id, lat, lng, 198.0, label))
    if len(final) > 100:
        final = final[-100:]
    return final


def refine_oracle(
    del_lat: float,
    del_lng: float,
    del_ts_ms: int,
    del_acc: float,
    pings: list[tuple[int, float, float, float]],
) -> tuple[bool, list[tuple[float, float, str]]]:
    filtered = [
        p
        for p in pings
        if p[3] <= 100 and del_ts_ms - 120000 <= p[0] <= del_ts_ms + 300000
    ]
    clusters = dbscan_oracle(filtered)
    if not clusters:
        return False, [(del_lat, del_lng, "ORIGINAL_DELIVERED_LOCATION")]
    min_d = float("inf")
    min_td = float("inf")
    best: list = []
    for pts, c_lat, c_lng, avg_ts in clusters:
        if del_acc <= 100:
            d = vincenty_py(c_lat, c_lng, del_lat, del_lng)
            if d <= min_d and d <= 100:
                min_d = d
                best = pts
        else:
            td = abs(avg_ts - del_ts_ms)
            if td <= min_td:
                min_td = td
                best = pts
    if not best:
        return False, [(del_lat, del_lng, "ORIGINAL_DELIVERED_LOCATION")]
    coords = [(p[0], p[1]) for p in best]
    s_lat, s_lng, _score, high = cluster_score_v3_oracle(coords)
    results = [
        (s_lat, s_lng,
         "CLUSTER_GEOCODE_SCORE_HIGH" if high else "CLUSTER_GEOCODE_SCORE_LOW")
    ]
    cen = trimmed_centroid_oracle([(p[0], p[1], p[2]) for p in best])
    if cen is not None:
        results.append((cen[0], cen[1], "CLUSTER_CENTROID"))
    return True, results
