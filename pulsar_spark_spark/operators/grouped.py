"""Grouped-map Spark operators wrapping the G1-G8 kernels.

The reference applies these algorithms inside per-key Scala ``map``
calls after a ``combineByKey`` list build (e.g.
GeoTagOptimizedService.scala:74-76,
DeliveryLocationRefinementService.scala:85-88). The Spark-native home
is a grouped map over Arrow batches; all wrappers here run through
:func:`grouped_map_in_pandas` (partition-stream pattern) because the
group populations are large-N-small-groups, where per-group
``applyInPandas`` overhead (one Arrow batch + pandas frame + Python
call per group, ~10 ms) would dominate the kernels themselves.

Scale rules baked in:

- an EXPLICIT numPartitions repartition precedes the Python stage —
  Python work is invisible to AQE's size-based coalescing, which
  would otherwise collapse the small shuffle to one partition and
  serialize every kernel;
- groups are bounded (the reference's own n ≤ 500 kernel guard;
  cap-100 history upstream), so skew cannot concentrate unbounded
  Python work on one key;
- **JVM pre-dispatch**: every kernel whose guard clause is
  SQL-expressible routes guard-tripped groups through pure JVM
  aggregation instead of Arrow+Python. The reference guards return
  the LAST point of the time-sorted group
  (BestLatLngCalculator.scala:37-39 n<4 / n>500; :76-78 n<3), which
  is exactly ``max_by(struct(lat, lng), struct(ts_ms, event_id))``.
  One hash aggregate computes count + last point per group; its
  guard rows ARE the result rows, and the non-guard keys equi-join
  back against the input to feed the Python stage. Guard groups
  never cross the JVM↔Python boundary (the fixture corpora sit at
  ~45-99 events/user, inside the kernel band, so the real win there
  is the batched kernels below; corpora with out-of-band groups
  skip Python entirely for them). The routing costs one
  partial-agg shuffle (tiny output)
  plus re-reading the (cheap, columnar) source — it is applied only
  where the input is a scan-shaped relation, NOT to the
  delivery-refinement kernel whose input is an expensive join that
  must not be evaluated twice.

Determinism: no grouped map promises in-group order, so every kernel
sorts its batch by (ts_ms, event_id) first — the reference's
time-sorted list order with a pinned tiebreak (SURVEY.md §7.3.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col

from pulsar_spark_spark.operators.shipping import ensure_package_on_executors
from pulsar_spark_spark.operators.geo_kernels import (
    LABEL_CENTROID,
    best_lat_lng_batch,
    best_score_batch,
    cluster_score_batch,
    refine_delivery,
    trimmed_centroid_batch,
)

_SORT = ["ts_ms", "event_id"]


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Explicit repartition ahead of Python work (AQE-proof)."""
    n = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n, key)


def _finite_points(df: DataFrame, cols: tuple = ("lat", "lng")) -> DataFrame:
    """Total-function guard on the kernel inputs: rows with null/NaN
    coordinates are dropped JVM-side before any kernel sees them. The
    reference runs its validity filter (P4) upstream of every kernel,
    so a non-finite coordinate is outside the kernels' contract — but
    without this guard it would CRASH the scalar scoring walk (NaN
    breaks its coordinate-tuple dict keying: nan != nan) while the
    batch arm silently propagated NaN scores. Engine-internal
    producers synthesize finite coordinates, so on every registered
    plan this filter removes zero rows.

    Cost note (round 14): when lat/lng are DERIVED expressions (the
    registered kernel queries compute them from an md5 chain), this
    filter is NOT free — Catalyst pushes the predicate through the
    projection, re-inlining the whole derivation chain into the
    Filter condition of BOTH kernel subtrees (the guard aggregate and
    the kernel join re-read the input), and codegen does not CSE
    across the Filter/Project boundary. Measured ×1.9 on
    ``best_latlng_per_user`` at sf0.1 (2.47 → 4.62 s min-of-6).
    Engine call sites whose lat/lng derivation is PROVABLY total
    (md5-derived — every output is a finite double) pass
    ``assume_finite=True`` to skip the redundant filter; the public
    operator surface keeps the guard by default, and over physical
    (stored) columns it costs nothing measurable."""
    cond = None
    for c in cols:
        this = col(c).isNotNull() & ~F.isnan(col(c))
        cond = this if cond is None else (cond & this)
    return df.filter(cond)


def _last_point(lat_col: str = "lat", lng_col: str = "lng") -> F.Column:
    """The reference guard's 'last point of the time-sorted list' as a
    JVM aggregate: argmax by (ts_ms, event_id)."""
    return F.max_by(F.struct(col(lat_col), col(lng_col)), F.struct("ts_ms", "event_id"))


def apply_best_latlng(
    points: DataFrame,
    pre_partitioned: bool = False,
    assume_finite: bool = False,
) -> DataFrame:
    """G1 per group. Input columns: user_id, event_id, ts_ms, lat, lng.

    Output: user_id, best_lat, best_lng, n_points.

    ``pre_partitioned=True``: the input is already hash-partitioned by
    user_id (a bucketed-table scan under
    sources/bucketed.py::bucketed_scan_pinned) — the kernel dispatch
    then runs with zero hash Exchange: the guard aggregate reuses the
    bucket partitioning, the keyset join broadcasts (preserving the
    stream side's partitioning), and the Python stage skips its
    explicit repartition.

    Pre-dispatch: n<4 / n>500 groups return the last time-sorted point
    (BestLatLngCalculator.scala:37-39) — resolved entirely JVM-side.
    One hash aggregate (map-side partial, tiny post-shuffle output)
    computes per-group count + max_by; its guard rows ARE the result,
    and its non-guard keys route the surviving rows into the Python
    kernel via an equi-join (AQE broadcasts the small keyset; at real
    scale with a huge keyset it degrades to the same user_id shuffle
    the kernel needs anyway).

    The Python stage is fully batched (round 11): ONE sort + ONE flat
    vectorized Vincenty + segmented reduceat counts/argmax per Arrow
    body (geo_kernels.best_lat_lng_batch, bit-identical to the
    per-group kernel by construction) — the per-group pandas
    slice/sort/frame cost plus one numpy dispatch per ~67-point group
    dominated the 1000× wall before this.
    """
    ensure_package_on_executors(points.sparkSession)
    if not assume_finite:
        points = _finite_points(points)
    agg = points.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n"), _last_point().alias("__last")
    )
    guard = (col("__n") < 4) | (col("__n") > 500)

    jvm = agg.filter(guard).select(
        "user_id",
        col("__last.lat").alias("best_lat"),
        col("__last.lng").alias("best_lng"),
        col("__n").cast("int").alias("n_points"),
    )

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", *_SORT], kind="mergesort")
        uid = pdf["user_id"].to_numpy()
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        change = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(uid)]))
        best = best_lat_lng_batch(lat, lng, starts, ends)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "best_lat": lat[best],
                "best_lng": lng[best],
                "n_points": (ends - starts).astype(np.int32),
            }
        )

    schema = "user_id bigint, best_lat double, best_lng double, n_points int"
    keyset = agg.filter(~guard).select("user_id")
    if pre_partitioned:
        # broadcast explicitly: an SMJ here would re-shuffle the
        # stream side and destroy the bucket partitioning the caller
        # is promising downstream
        keyset = F.broadcast(keyset)
    kernel_in = points.join(keyset, "user_id")
    py = stream_key_runs(
        kernel_in, "user_id", body, schema, pre_partitioned=pre_partitioned
    )
    return py.unionByName(jvm)


def apply_cluster_score(
    points: DataFrame,
    pre_partitioned: bool = False,
    assume_finite: bool = False,
) -> DataFrame:
    """G2 per group. Output: user_id, lat, lng, cluster_score, n_points.

    Pre-dispatch: n<3 groups return (last point, score 0.0)
    (BestLatLngCalculator.scala:76-78) JVM-side, same routing shape as
    :func:`apply_best_latlng`.
    """
    ensure_package_on_executors(points.sparkSession)
    if not assume_finite:
        points = _finite_points(points)
    agg = points.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n"), _last_point().alias("__last")
    )
    guard = col("__n") < 3

    jvm = agg.filter(guard).select(
        "user_id",
        col("__last.lat").alias("lat"),
        col("__last.lng").alias("lng"),
        F.lit(0.0).alias("cluster_score"),
        col("__n").cast("int").alias("n_points"),
    )

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        # fully batched G2 (geo_kernels.best_score_batch): chord-band
        # neighbor counts + ONE exact Vincenty per unique coordinate
        # (the overwrite-by-last-differing-neighbor score collapses
        # algebraically to that — see the kernel's docstring), instead
        # of the O(n²) per-group matrix. Bit-identical, pinned by a
        # randomized parity test.
        pdf = pdf.sort_values(["user_id", *_SORT], kind="mergesort")
        uid = pdf["user_id"].to_numpy()
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        change = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(uid)]))
        bl, bn, sc = best_score_batch(lat, lng, starts, ends)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "lat": bl,
                "lng": bn,
                "cluster_score": sc,
                "n_points": (ends - starts).astype(np.int32),
            }
        )

    schema = "user_id bigint, lat double, lng double, cluster_score double, n_points int"
    keyset = agg.filter(~guard).select("user_id")
    if pre_partitioned:
        keyset = F.broadcast(keyset)  # see apply_best_latlng
    kernel_in = points.join(keyset, "user_id")
    py = stream_key_runs(
        kernel_in, "user_id", body, schema, pre_partitioned=pre_partitioned
    )
    return py.unionByName(jvm)


def apply_cluster_score_v3(
    points: DataFrame,
    pre_partitioned: bool = False,
    assume_finite: bool = False,
) -> DataFrame:
    """G3 per group (ping-cluster scoring with the real-ceil majority).

    Output: user_id, lat, lng, cluster_score, is_high_confidence.

    No pre-dispatch: the reference's G3 has no size guard — even a
    2-point group's winner is the argmax over per-coordinate neighbor
    counts (BestLatLngCalculator.scala:123-163), which is not a plain
    last-point and must run in the kernel. The Python stage is fully
    batched (geo_kernels.cluster_score_batch — chord-band pair
    verdicts + stable-unique coord fold, bit-identical to the scalar
    kernel, pinned by a randomized parity test).
    """
    ensure_package_on_executors(points.sparkSession)
    if not assume_finite:
        points = _finite_points(points)

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", *_SORT], kind="mergesort")
        uid = pdf["user_id"].to_numpy()
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        change = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(uid)]))
        bl, bn, sc, hi = cluster_score_batch(lat, lng, starts, ends)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "lat": bl,
                "lng": bn,
                "cluster_score": sc,
                "is_high_confidence": hi,
            }
        )

    schema = (
        "user_id bigint, lat double, lng double, cluster_score double, "
        "is_high_confidence boolean"
    )
    return stream_key_runs(
        points, "user_id", body, schema, pre_partitioned=pre_partitioned
    )


def apply_trimmed_centroid(
    points: DataFrame,
    pre_partitioned: bool = False,
    assume_finite: bool = False,
) -> DataFrame:
    """G4 per group. Input adds an ``accuracy`` column.

    Output: user_id, centroid_lat, centroid_lng (null when fewer than
    4 accurate points), n_accurate.

    Pre-dispatch: the kernel's trim loop never runs with ≤ 3 accurate
    points (BestLatLngCalculator.scala:165-198 `while len > 3`) — those
    groups yield a null centroid, resolved JVM-side from a conditional
    count alone (same routing shape as :func:`apply_best_latlng`).
    """
    ensure_package_on_executors(points.sparkSession)
    if not assume_finite:
        points = _finite_points(points)
    agg = points.groupBy("user_id").agg(
        F.count(F.when(col("accuracy") <= 100.0, 1)).alias("__n_acc")
    )
    guard = col("__n_acc") < 4

    jvm = agg.filter(guard).select(
        "user_id",
        F.lit(None).cast("double").alias("centroid_lat"),
        F.lit(None).cast("double").alias("centroid_lng"),
        col("__n_acc").cast("int").alias("n_accurate"),
    )

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        # lockstep trim loops across the whole Arrow body — same
        # batched arm the refinement kernel uses (one Vincenty
        # dispatch per trim ITERATION per body, statement-identical
        # math; see geo_kernels.trimmed_centroid_batch)
        pdf = pdf.sort_values(["user_id", *_SORT], kind="mergesort")
        uid = pdf["user_id"].to_numpy()
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lng = pdf["lng"].to_numpy(dtype=np.float64)
        acc = pdf["accuracy"].to_numpy(dtype=np.float64)
        change = np.nonzero(uid[1:] != uid[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(uid)]))
        jobs = [
            (lat[a:b], lng[a:b], acc[a:b]) for a, b in zip(starts, ends)
        ]
        cents = trimmed_centroid_batch(jobs)
        cv = np.concatenate(([0], np.cumsum(acc <= 100.0)))
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "centroid_lat": [c[0] if c else None for c in cents],
                "centroid_lng": [c[1] if c else None for c in cents],
                "n_accurate": (cv[ends] - cv[starts]).astype(np.int32),
            }
        )

    schema = "user_id bigint, centroid_lat double, centroid_lng double, n_accurate int"
    keyset = agg.filter(~guard).select("user_id")
    if pre_partitioned:
        keyset = F.broadcast(keyset)  # see apply_best_latlng
    kernel_in = points.join(keyset, "user_id")
    py = stream_key_runs(
        kernel_in, "user_id", body, schema, pre_partitioned=pre_partitioned
    )
    return py.unionByName(jvm)


def apply_delivery_refinement(
    joined: DataFrame, pre_partitioned: bool = False
) -> DataFrame:
    """G5-G7 per delivery. Input: one row per (delivery × candidate
    ping) from a left interval join, columns delivery_id, user_id,
    del_ts_ms, del_lat, del_lng, del_accuracy, p_ts_ms, p_lat, p_lng,
    p_accuracy, p_event_id (ping columns null for pingless deliveries).

    Output: one row per refinement result (1-2 per delivery):
    delivery_id, user_id, is_refined, method, ref_lat, ref_lng.

    ``pre_partitioned=True`` skips the kernel's delivery_id shuffle.
    Unlike the bucketed-scan kernels this is SAFE FOR ANY input that
    came out of the interval join: delivery_id is unique on the join's
    left side (one row per delivery), so every delivery's joined rows
    are produced inside one task under any join strategy — the
    "every key in exactly one partition" guarantee holds by
    construction, no scan pinning required.

    No pre-dispatch here, deliberately: a < 3-ping delivery can never
    form a cluster (DBSCAN min_count) and always resolves to the
    ORIGINAL fallback, but the input is the T4 interval-join OUTPUT —
    routing would evaluate that join twice (measured 12.1 s vs 7.1 s
    at sf0.1), and the guard groups are ≤ 2 rows each, so their Arrow
    cost inside the single-pass stream is already negligible. The
    kernel handles them in-line.
    """
    ensure_package_on_executors(joined.sparkSession)

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized run-walk: ONE sort + ONE set of numpy extractions
        # per Arrow body, zero per-group pandas objects. Profiled at
        # sf0.1 (20k groups), per-group iloc/sort_values/DataFrame
        # construction cost as much as the G5-G7 math itself. The
        # batch sort (delivery_id, p_ts_ms, p_event_id; NaN ts last)
        # reproduces the old per-group filtered sort exactly, and
        # refine_delivery is untouched — bit-identical results.
        pdf = pdf.sort_values(
            ["delivery_id", "p_ts_ms", "p_event_id"], kind="mergesort"
        )
        did = pdf["delivery_id"].to_numpy()
        uid = pdf["user_id"].to_numpy()
        dlat = pdf["del_lat"].to_numpy()
        dlng = pdf["del_lng"].to_numpy()
        dts = pdf["del_ts_ms"].to_numpy()
        dacc = pdf["del_accuracy"].to_numpy()
        pts_ = pdf["p_ts_ms"].to_numpy(dtype=np.float64, na_value=np.nan)
        plat = pdf["p_lat"].to_numpy(dtype=np.float64, na_value=np.nan)
        plng = pdf["p_lng"].to_numpy(dtype=np.float64, na_value=np.nan)
        pacc = pdf["p_accuracy"].to_numpy(dtype=np.float64, na_value=np.nan)
        # a ping is valid only when FULLY finite: p_ts_ms NaN marks
        # the pingless left-join rows, and a NaN coordinate/accuracy
        # is outside the kernels' contract (see _finite_points) — a
        # half-null ping row is dropped, not walked
        valid = ~(
            np.isnan(pts_) | np.isnan(plat) | np.isnan(plng) | np.isnan(pacc)
        )
        change = np.nonzero(did[1:] != did[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(did)]))
        # ONE vectorized Vincenty call for every delivery's pairwise
        # ping distances (round 11): the walk + scoring inside
        # refine_delivery query ~1-2 distances per ping and a handful
        # per cluster, and paying a scalar-Python (walk) or tiny-array
        # numpy (scoring) Vincenty per query profiled as ~75% of this
        # kernel's wall at 10× data (tools-profiled: 44 s of 1.48M
        # scalar walk calls + 30 s of 101k tiny-array scoring calls in
        # a 105 s profiled body).
        # Values are bit-identical (vincenty_np ≡ vincenty_py
        # by construction). Degenerate groups are guarded: a delivery
        # with > 1500 candidate pings would put a > 2.25M-entry block
        # in the flat matrix — it falls back to the lazy scalar path
        # (same results), bounding memory at ~n_body × k̄² doubles.
        from pulsar_spark_spark.functions.geo import vincenty_np

        cv = np.concatenate(([0], np.cumsum(valid)))
        k_g = (cv[ends] - cv[starts]).astype(np.int64)
        big = k_g > 1500
        k2 = np.where(big, 0, k_g * k_g)
        tot = int(k2.sum())
        v_idx = np.nonzero(valid)[0]
        vlat = plat[v_idx]
        vlng = plng[v_idx]
        o_g = np.concatenate(([0], np.cumsum(k_g)))[:-1]
        off2 = np.concatenate(([0], np.cumsum(k2)))[:-1]
        if tot:
            within = np.arange(tot) - np.repeat(off2, k2)
            kk = np.repeat(k_g, k2)
            base = np.repeat(o_g, k2)
            ii = base + within // kk
            jj = base + within % kk
            dflat = vincenty_np(vlat[ii], vlng[ii], vlat[jj], vlng[jj])
        else:
            dflat = None
        # G4 centroids are DEFERRED: refine_delivery hands back the
        # chosen cluster's points, and every delivery's trim loop runs
        # in lockstep through trimmed_centroid_batch — one Vincenty
        # dispatch per trim ITERATION per body instead of one per
        # delivery per iteration (profiled ~1.1 s of the 3.2 s walk at
        # 10×, pure tiny-array dispatch overhead). Statement-identical
        # math; row order preserved by flattening per-delivery lists.
        per_del = []
        cen_jobs, cen_ref = [], []
        for g, (a, b) in enumerate(zip(starts, ends)):
            pl = [
                (int(pts_[k]), float(plat[k]), float(plng[k]), float(pacc[k]))
                for k in range(a, b)
                if valid[k]
            ]
            kg = int(k_g[g])
            pd_g = (
                dflat[off2[g] : off2[g] + kg * kg].reshape(kg, kg)
                if dflat is not None and kg and not big[g]
                else None
            )
            refined, results, job = refine_delivery(
                float(dlat[a]), float(dlng[a]), int(dts[a]), float(dacc[a]), pl,
                pair_dist=pd_g, defer_centroid=True,
            )
            per_del.append((did[a], uid[a], refined, results))
            if job is not None:
                cen_jobs.append(job)
                cen_ref.append(len(per_del) - 1)
        if cen_jobs:
            for slot, cen in zip(cen_ref, trimmed_centroid_batch(cen_jobs)):
                if cen is not None:
                    per_del[slot][3].append((cen[0], cen[1], LABEL_CENTROID))
        o_did, o_uid, o_ref, o_m, o_la, o_ln = [], [], [], [], [], []
        for d_id, u_id, refined, results in per_del:
            for la, ln, m in results:
                o_did.append(d_id)
                o_uid.append(u_id)
                o_ref.append(refined)
                o_m.append(m)
                o_la.append(la)
                o_ln.append(ln)
        return pd.DataFrame(
            {
                "delivery_id": np.asarray(o_did, dtype=np.int64),
                "user_id": np.asarray(o_uid, dtype=np.int64),
                "is_refined": o_ref,
                "method": o_m,
                "ref_lat": o_la,
                "ref_lng": o_ln,
            }
        )

    schema = (
        "delivery_id bigint, user_id bigint, is_refined boolean, "
        "method string, ref_lat double, ref_lng double"
    )
    # tens of thousands of ~1-row groups → partition-stream grouped map
    # (per-group applyInPandas overhead would dominate the kernel)
    return stream_key_runs(
        joined, "delivery_id", body, schema, pre_partitioned=pre_partitioned
    )


def grouped_map_in_pandas(
    df: DataFrame,
    key: str,
    process_group,
    schema: str,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Many-small-groups grouped map without per-group Arrow overhead.

    ``applyInPandas`` materializes one Arrow batch + pandas frame +
    Python call PER GROUP (~10 ms each) — ruinous for tens of
    thousands of tiny groups (the delivery-refinement shape: 20k
    deliveries × ~1 ping). This runs the same per-group kernel through
    ``mapInPandas`` instead: hash-partition + sort by the key, stream
    each partition's Arrow batches through ONE Python call, and walk
    contiguous key runs with a pandas groupby. A group can span two
    Arrow batches, so the trailing key run of every batch is carried
    into the next before processing (the standard partition-stream
    pattern). ~10× faster at the 20k-group scale, identical results.
    """
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [
            process_group(g) for _, g in pdf.groupby(key, sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    return stream_key_runs(df, key, run, schema, pre_partitioned=pre_partitioned)


def stream_key_runs(
    df: DataFrame,
    key: str,
    process_body,
    schema: str,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Partition-stream plumbing shared by the grouped-map wrappers:
    hash-partition + sort by ``key``, stream Arrow batches through one
    Python call, carry the trailing key run across batch boundaries
    (a group can span two batches), and hand each complete body frame
    to ``process_body`` (which must handle 1..n whole groups).

    ``pre_partitioned=True`` skips the explicit hash repartition: the
    caller guarantees every key already lives in exactly one input
    partition (e.g. a scan of a table bucketed on ``key`` —
    sources/bucketed.py). That deletes the kernel's only shuffle — the
    whole point of a write-time bucketed layout at 100 TB. CAUTION:
    mapInPandas declares no required distribution, so Spark will NOT
    insert a repairing Exchange if the guarantee is wrong; for
    bucketed scans that means pinning
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
    (sources/bucketed.py::bucketed_scan_pinned) — otherwise the
    planner may silently fall back to an unbucketed split-based scan
    and keys would span partitions."""
    ensure_package_on_executors(df.sparkSession)
    parts = (df if pre_partitioned else _spread(df, key)).sortWithinPartitions(key)

    def fn(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf[key].iloc[-1]
            tail = pdf[key] == last_key
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield process_body(body)
        if carry is not None and len(carry):
            yield process_body(carry)

    return parts.mapInPandas(fn, schema)
