"""Geo scalar functions: haversine (pure expression), Vincenty and
geohash (vectorized pandas UDFs / numpy kernels).

Reference semantics reproduced:
- ``vincenty_distance`` — utils/BestLatLngCalculator.scala:16-23:
  ellipsoidal distance in meters, returning the 1e7 sentinel when
  either latitude is exactly 0 (the reference treats (0,0) as "no
  fix"). The reference delegates to Lucene's
  ``GeoDistanceUtils.vincentyDistance``; this is an independent
  implementation of the published Vincenty inverse formula on the
  WGS-84 ellipsoid.
- ``haversine_m`` — service/TripTrackingService.scala:69-75: great
  circle with R = 6371 km, returned in meters. Built entirely from
  JVM-side Column expressions (stays inside whole-stage codegen).
- ``geohash_encode``/``geohash_decode`` — utils/Geohash.scala:6-71:
  standard base-32 geohash, default precision 12 (used at 7).

Scale notes: haversine is the hot-path predicate (geofence joins) and
is codegen'd; Vincenty appears only inside grouped kernels where it
runs as numpy pairwise math, never as a row-at-a-time Python UDF.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

# Sentinel the reference returns when a point has latitude 0 ("no GPS
# fix") — BestLatLngCalculator.scala:17-18.
NO_FIX_DISTANCE_M = 1.0e7


def _atan2(y: float, x: float) -> float:
    """numpy's scalar arctan2 (ufunc path), for batch↔scalar parity in
    vincenty_py — see the note there."""
    return float(np.arctan2(y, x))

# WGS-84 ellipsoid.
_WGS84_A = 6378137.0
_WGS84_B = 6356752.314245
_WGS84_F = 1.0 / 298.257223563

EARTH_RADIUS_M = 6371_000.0  # reference's haversine radius (km × 1000)


# --------------------------------------------------------------------
# haversine — pure Column expression (codegen-friendly)
# --------------------------------------------------------------------
def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in meters, R=6371 km (reference F2)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


# --------------------------------------------------------------------
# Vincenty — numpy kernel + pandas UDF wrapper
# --------------------------------------------------------------------
# The iterative loop below walks ~20 array temporaries per pass; past
# ~100k elements that working set falls out of cache and every
# iteration pays main-memory bandwidth (measured: 1630 ns/elt at 2M
# flat vs 320 ns/elt chunked). Chunking is bit-identical — convergence
# is tracked per element, so element k's history is independent of its
# neighbors — and transparent to every caller.
_VINCENTY_CHUNK = 65_536


def vincenty_np(
    lat1: np.ndarray,
    lng1: np.ndarray,
    lat2: np.ndarray,
    lng2: np.ndarray,
    max_iter: int = 200,
    tol: float = 1e-12,
) -> np.ndarray:
    """Vectorized Vincenty inverse distance (meters) on WGS-84.

    Large inputs are evaluated in cache-resident chunks (see
    ``_VINCENTY_CHUNK`` — bit-identical, ~5× faster past ~1M
    elements); each chunk runs the standard published iteration.
    """
    lat1 = np.asarray(lat1, dtype=np.float64)
    n = lat1.shape[0] if lat1.ndim else 1
    if lat1.ndim != 1 or n <= _VINCENTY_CHUNK:
        return _vincenty_np_core(lat1, lng1, lat2, lng2, max_iter, tol)
    lng1 = np.asarray(lng1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lng2 = np.asarray(lng2, dtype=np.float64)
    out = np.empty(n, dtype=np.float64)
    for a in range(0, n, _VINCENTY_CHUNK):
        b = min(a + _VINCENTY_CHUNK, n)
        out[a:b] = _vincenty_np_core(
            lat1[a:b], lng1[a:b], lat2[a:b], lng2[a:b], max_iter, tol
        )
    return out


def _vincenty_np_core(
    lat1: np.ndarray,
    lng1: np.ndarray,
    lat2: np.ndarray,
    lng2: np.ndarray,
    max_iter: int = 200,
    tol: float = 1e-12,
) -> np.ndarray:
    """Single-chunk Vincenty kernel.

    Standard published iteration; antipodal non-convergence falls back
    to haversine (the reference's Lucene impl throws there — the data
    domain never hits it). Applies the reference's lat==0 sentinel.

    Convergence is tracked PER ELEMENT: once an element's |Δλ| drops
    below ``tol`` its λ and derived quantities freeze, so every
    element sees exactly the iteration history the scalar
    :func:`vincenty_py` gives it — batch and scalar paths are
    bit-identical (kernels mix both; threshold comparisons like the
    300 m / 50 m cuts must never flip between them).
    """
    lat1 = np.asarray(lat1, dtype=np.float64)
    lng1 = np.asarray(lng1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lng2 = np.asarray(lng2, dtype=np.float64)

    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    # atan2((1-f)·sin, cos) ≡ atan((1-f)·tan) for |φ|<90°, but uses
    # only primitives whose numpy SIMD array paths are bit-identical
    # to scalar libm (sin/cos/atan2 are; tan/arctan are NOT — ~40% of
    # inputs differ by 1 ulp, which broke batch↔scalar parity)
    U1 = np.arctan2((1 - _WGS84_F) * np.sin(phi1), np.cos(phi1))
    U2 = np.arctan2((1 - _WGS84_F) * np.sin(phi2), np.cos(phi2))
    L = np.radians(lng2 - lng1)
    lam = L.copy()

    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)
    active = np.ones_like(lam, dtype=bool)

    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        new_sin_sigma = np.sqrt(
            (cosU2 * sin_lam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        new_cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        new_sigma = np.arctan2(new_sin_sigma, new_cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(
                new_sin_sigma != 0,
                cosU1 * cosU2 * sin_lam / np.maximum(new_sin_sigma, 1e-300),
                0.0,
            )
        new_cos_sq_alpha = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            new_cos2sm = np.where(
                new_cos_sq_alpha != 0,
                new_cos_sigma
                - 2.0 * sinU1 * sinU2 / np.maximum(new_cos_sq_alpha, 1e-300),
                0.0,
            )
        C = _WGS84_F / 16.0 * new_cos_sq_alpha * (
            4 + _WGS84_F * (4 - 3 * new_cos_sq_alpha)
        )
        lam_new = L + (1 - C) * _WGS84_F * sin_alpha * (
            new_sigma
            + C
            * new_sin_sigma
            * (new_cos2sm + C * new_cos_sigma * (-1 + 2 * new_cos2sm**2))
        )
        # freeze converged elements: update only while active, exactly
        # like the scalar loop's per-element stopping rule
        sin_sigma = np.where(active, new_sin_sigma, sin_sigma)
        cos_sigma = np.where(active, new_cos_sigma, cos_sigma)
        sigma = np.where(active, new_sigma, sigma)
        cos_sq_alpha = np.where(active, new_cos_sq_alpha, cos_sq_alpha)
        cos2sm = np.where(active, new_cos2sm, cos2sm)
        converged = np.abs(lam_new - lam) < tol
        lam = np.where(active, lam_new, lam)
        active = active & ~converged
        if not active.any():
            break

    u_sq = cos_sq_alpha * (_WGS84_A**2 - _WGS84_B**2) / _WGS84_B**2
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = (
        B
        * sin_sigma
        * (
            cos2sm
            + B
            / 4
            * (
                cos_sigma * (-1 + 2 * cos2sm**2)
                - B / 6 * cos2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2sm**2)
            )
        )
    )
    dist = _WGS84_B * A * (sigma - delta_sigma)
    dist = np.where(np.isnan(dist), 0.0, dist)
    # Same-point short circuit and the reference's no-fix sentinel.
    dist = np.where((lat1 == lat2) & (lng1 == lng2), 0.0, dist)
    dist = np.where((lat1 == 0.0) | (lat2 == 0.0), NO_FIX_DISTANCE_M, dist)
    # Non-finite INPUTS propagate as NaN — the scalar vincenty_py
    # returns NaN for them, and the isnan→0 line above exists only
    # for the batch analogs of the scalar path's degenerate-geometry
    # guards; without this mask a NULL coordinate (NaN through
    # Arrow) came back as "0 meters away", silently matching every
    # proximity predicate.
    bad = np.isnan(lat1) | np.isnan(lng1) | np.isnan(lat2) | np.isnan(lng2)
    if bad.any():
        dist = np.where(bad, np.nan, dist)
    return dist


@pandas_udf(DoubleType())
def vincenty_udf(
    lat1: pd.Series, lng1: pd.Series, lat2: pd.Series, lng2: pd.Series
) -> pd.Series:
    """Arrow-batched Vincenty distance column (meters). NULL/NaN
    coordinates yield SQL NULL — the same null propagation as the
    ``hav_m`` expression twin, so the two registered distance
    functions agree on null semantics."""
    out = vincenty_np(
        lat1.to_numpy(), lng1.to_numpy(), lat2.to_numpy(), lng2.to_numpy()
    )
    bad = np.isnan(out)
    if bad.any():
        return pd.Series(pd.arrays.FloatingArray(out, bad))
    return pd.Series(out)


# --------------------------------------------------------------------
# geohash — pure-python port of the public base-32 algorithm
# --------------------------------------------------------------------
_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_IDX = {c: i for i, c in enumerate(_BASE32)}


def geohash_encode_py(lat: float, lng: float, precision: int = 12) -> str:
    """Standard geohash encoding (reference utils/Geohash.scala:40-70)."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    bits = 0
    bit_count = 0
    even = True
    out: list[str] = []
    while len(out) < precision:
        if even:
            mid = (lng_lo + lng_hi) / 2
            if lng >= mid:
                bits = (bits << 1) | 1
                lng_lo = mid
            else:
                bits <<= 1
                lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(_BASE32[bits])
            bits = 0
            bit_count = 0
    return "".join(out)


def geohash_decode_py(gh: str) -> tuple[float, float]:
    """Decode to the cell-center (lat, lng) (reference Geohash.scala:9-38)."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    even = True
    for c in gh:
        cd = _BASE32_IDX[c]
        for shift in (4, 3, 2, 1, 0):
            bit = (cd >> shift) & 1
            if even:
                mid = (lng_lo + lng_hi) / 2
                if bit:
                    lng_lo = mid
                else:
                    lng_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lat_lo + lat_hi) / 2, (lng_lo + lng_hi) / 2)


@pandas_udf(StringType())
def geohash_udf(lat: pd.Series, lng: pd.Series, precision: pd.Series) -> pd.Series:
    """Arrow-batched geohash encode; precision is a column (pass
    lit(7)). NULL coordinates encode to NULL — Spark NULL doubles
    arrive in the pandas Series as NaN (never None, so an
    ``is not None`` guard cannot fire), and without the isnan check a
    null-coordinate row encoded to the all-zero-bits cell at
    (-90, -180), bucketing every such row into a spurious
    south-pole geohash."""
    import math

    return pd.Series(
        [
            geohash_encode_py(a, b, int(p))
            if a is not None
            and b is not None
            and not math.isnan(a)
            and not math.isnan(b)
            else None
            for a, b, p in zip(lat, lng, precision)
        ]
    )


def geohash_quantize(lat, lng, precision: int = 7):
    """JVM-expression geohash quantization: (x, y) fixed-point cell
    indices whose bits are exactly the encoder's subdivision decisions.

    The per-bit binary subdivision of geohash_encode_py is equivalent
    to quantizing each axis once: after n halvings the lng decisions
    are the n MSBs of floor((lng+180)/360 · 2ⁿ). Doing it closed-form
    keeps the whole encode inside whole-stage codegen (no Python) and
    is reproducible verbatim in the DuckDB oracle.
    """
    import pyspark.sql.functions as F

    n_lng = (5 * precision + 1) // 2
    n_lat = 5 * precision // 2
    x = F.least(
        F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lng))),
        F.lit((1 << n_lng) - 1),
    ).cast("bigint")
    y = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat))),
        F.lit((1 << n_lat) - 1),
    ).cast("bigint")
    return x, y


def geohash_from_xy(x, y, precision: int = 7):
    """Interleave quantized cell indices into the base-32 geohash
    string — pure bigint shifts/masks + char lookups, codegen-friendly.
    Pass the (x, y) from :func:`geohash_quantize`, ideally through a
    projection boundary so the quantization is computed once."""
    import pyspark.sql.functions as F

    nbits = 5 * precision
    n_lng = (nbits + 1) // 2
    n_lat = nbits // 2
    code = F.lit(0).cast("bigint")
    for p in range(nbits):
        if p % 2 == 0:
            src, bit = x, n_lng - 1 - p // 2
        else:
            src, bit = y, n_lat - 1 - (p - 1) // 2
        code = code + F.shiftright(src, bit).bitwiseAND(F.lit(1)) * F.lit(
            1 << (nbits - 1 - p)
        )
    alphabet = F.array(*[F.lit(c) for c in _BASE32])
    return F.concat(
        *[
            F.element_at(
                alphabet,
                (F.shiftright(code, nbits - 5 * (k + 1)).bitwiseAND(F.lit(31)) + 1)
                .cast("int"),
            )
            for k in range(precision)
        ]
    )


def sql_geohash_ctes(src: str, lat: str, lng: str, precision: int = 7) -> tuple[str, str]:
    """DuckDB twin of geohash_quantize + geohash_from_xy: returns
    (cte_sql, final_relation_name); the final relation carries every
    ``src`` column plus ``gh``. Bit-identical to the Spark expressions
    (same IEEE ops in the same order, integer shifts thereafter)."""
    nbits = 5 * precision
    n_lng = (nbits + 1) // 2
    n_lat = nbits // 2
    terms = []
    for p in range(nbits):
        if p % 2 == 0:
            src_c, bit = "x", n_lng - 1 - p // 2
        else:
            src_c, bit = "y", n_lat - 1 - (p - 1) // 2
        terms.append(f"(({src_c} >> {bit}) & 1) * {1 << (nbits - 1 - p)}")
    chars = " || ".join(
        f"substr('{_BASE32}', CAST(((code >> {nbits - 5 * (k + 1)}) & 31) AS INTEGER) + 1, 1)"
        for k in range(precision)
    )
    cte = f"""
        __gh_xy AS (
            SELECT *,
                   least(CAST(floor((({lng}) + 180.0) / 360.0 * {float(1 << n_lng)}) AS BIGINT),
                         {(1 << n_lng) - 1}) AS x,
                   least(CAST(floor((({lat}) + 90.0) / 180.0 * {float(1 << n_lat)}) AS BIGINT),
                         {(1 << n_lat) - 1}) AS y
            FROM {src}
        ),
        __gh_code AS (SELECT *, ({' + '.join(terms)}) AS code FROM __gh_xy),
        __gh AS (SELECT *, ({chars}) AS gh FROM __gh_code)
    """
    return cte, "__gh"


def sql_vincenty_alldist_ctes(n_where: str = "") -> str:
    """DuckDB twin of the per-group all-pairs Vincenty matrix
    (:func:`vincenty_np` over ``_pairwise_vincenty``'s repeat/tile
    layout), as a WITH-RECURSIVE CTE chain.

    Expects an ``ord`` CTE with columns (user_id, i, n, lat, lng) —
    rows numbered 1..n per user in kernel input order. Emits
    ``alldist(user_id, i, j, d, differs)`` covering every ordered pair
    (i, j) including self-pairs, with the lat==0 → 1e7 sentinel and
    same-coordinate → 0 short-circuit applied in the reference's
    precedence (sentinel wins).

    Parity engineering (the same rules as the numpy↔math twins,
    applied numpy↔SQL):

    - every arithmetic expression is transcribed VERBATIM from
      ``vincenty_np`` — left-associative products, ``x*x`` never
      ``pow``, scalar constants (``f/16``, ``a²−b²``, ``b²``)
      pre-evaluated in Python and inlined via ``repr`` so SQL sees the
      exact doubles numpy uses;
    - numpy's per-element convergence freeze maps exactly onto
      recursion: a pair row stops being re-emitted on the iteration
      where |Δλ| < tol, and its final state is the state written BY
      that iteration — identical to the ``np.where(active, ...)``
      update discipline;
    - the one remaining engine difference is atan2 (numpy's ufunc vs
      libm differ by 1 ulp on some inputs → distances can differ by
      ~1e-9 m). That is why only SELECTION-shaped kernels (G1/G3,
      whose outputs are input coordinates picked by integer-count
      argmax) get full oracles: at the fixture's geometry the closest
      any pair sits to a decision threshold is ~1e-4 m (measured), so
      a 1e-9 m wobble can never flip a count, while score-equality
      kernels (G2) compare the two ulp-separated DIRECTIONS of one
      symmetric pair and could legitimately flip between engines.
    """
    f = repr(_WGS84_F)
    one_mf = repr(1 - _WGS84_F)
    f16 = repr(_WGS84_F / 16.0)
    ab = repr(_WGS84_A**2 - _WGS84_B**2)
    b2 = repr(_WGS84_B**2)
    b = repr(_WGS84_B)
    nofix = repr(NO_FIX_DISTANCE_M)
    bterm = "(u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq))))"
    return f"""
rowtrig AS (
    SELECT user_id, i, n, lat, lng,
           sin(atan2({one_mf} * sin(radians(lat)), cos(radians(lat)))) AS sinU,
           cos(atan2({one_mf} * sin(radians(lat)), cos(radians(lat)))) AS cosU
    FROM ord {n_where}
), vpairs AS (
    SELECT a.user_id AS user_id, a.i AS i, b.i AS j,
           a.sinU AS sinU1, a.cosU AS cosU1,
           b.sinU AS sinU2, b.cosU AS cosU2,
           radians(b.lng - a.lng) AS L
    FROM rowtrig a JOIN rowtrig b ON a.user_id = b.user_id
    WHERE NOT (a.lat = b.lat AND a.lng = b.lng)
      AND a.lat != 0 AND b.lat != 0
), it AS (
    SELECT user_id, i, j, sinU1, cosU1, sinU2, cosU2, L,
           L AS lam,
           0.0::DOUBLE AS ss, 1.0::DOUBLE AS cs, 0.0::DOUBLE AS sig,
           1.0::DOUBLE AS csa, 0.0::DOUBLE AS c2m,
           TRUE AS active, 0 AS iter
    FROM vpairs
    UNION ALL
    SELECT user_id, i, j, sinU1, cosU1, sinU2, cosU2, L,
           lam_new, nss, ncs, nsig, ncsa, nc2m,
           (abs(lam_new - lam) >= 1e-12) AND (iter + 1 < 200), iter + 1
    FROM (
        SELECT *,
               L + (1 - C) * {f} * sin_alpha *
                   (nsig + C * nss * (nc2m + C * ncs * (-1 + 2 * nc2m * nc2m)))
                   AS lam_new
        FROM (
            SELECT *, {f16} * ncsa * (4 + {f} * (4 - 3 * ncsa)) AS C
            FROM (
                SELECT *,
                       atan2(nss, ncs) AS nsig,
                       1.0 - sin_alpha * sin_alpha AS ncsa,
                       CASE WHEN 1.0 - sin_alpha * sin_alpha != 0
                            THEN ncs - 2.0 * sinU1 * sinU2
                                 / greatest(1.0 - sin_alpha * sin_alpha, 1e-300)
                            ELSE 0.0 END AS nc2m
                FROM (
                    SELECT *,
                           CASE WHEN nss != 0
                                THEN cosU1 * cosU2 * sin_lam / greatest(nss, 1e-300)
                                ELSE 0.0 END AS sin_alpha
                    FROM (
                        SELECT *,
                               sqrt((cosU2 * sin_lam) * (cosU2 * sin_lam)
                                    + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam)
                                      * (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam))
                                   AS nss,
                               sinU1 * sinU2 + cosU1 * cosU2 * cos_lam AS ncs
                        FROM (
                            SELECT *, sin(lam) AS sin_lam, cos(lam) AS cos_lam
                            FROM it WHERE active
                        )
                    )
                )
            )
        )
    )
), vdist AS (
    SELECT user_id, i, j,
           CASE WHEN isnan(d0) THEN 0.0 ELSE d0 END AS d
    FROM (
        SELECT user_id, i, j,
               {b} * (1 + u_sq / 16384 *
                      (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq))))
               * (sig - {bterm} * ss *
                  (c2m + {bterm} / 4 *
                   (cs * (-1 + 2 * c2m * c2m)
                    - {bterm} / 6 * c2m
                      * (-3 + 4 * ss * ss) * (-3 + 4 * c2m * c2m)))) AS d0
        FROM (
            SELECT *, csa * {ab} / {b2} AS u_sq
            FROM it WHERE NOT active
        )
    )
), alldist AS (
    -- literals MUST be cast: DuckDB types bare `10000000.0` as
    -- DECIMAL(9,1) and the UNION would coerce every Vincenty double
    -- to one decimal place (silently surviving thresholds with
    -- metre-scale margins, corrupting anything finer)
    SELECT a.user_id AS user_id, a.i AS i, b.i AS j,
           CASE WHEN a.lat = 0 OR b.lat = 0
                THEN {nofix}::DOUBLE ELSE 0.0::DOUBLE END AS d,
           NOT (a.lat = b.lat AND a.lng = b.lng) AS differs
    FROM rowtrig a JOIN rowtrig b ON a.user_id = b.user_id
    WHERE (a.lat = 0 OR b.lat = 0) OR (a.lat = b.lat AND a.lng = b.lng)
    UNION ALL
    SELECT user_id, i, j, d, TRUE AS differs FROM vdist
)"""


def sql_vincenty_center_ctes(points_rel: str, cent_rel: str, tag: str) -> str:
    """Vincenty from a per-user center to each of that user's points.

    SQL twin of the G4 trim loop's ``vincenty_np(full(m, c_lat),
    full(m, c_lng), lats, lngs)`` call — the CENTER is argument 1, the
    point argument 2, same direction as the kernel (Vincenty is only
    symmetric up to ulps, so direction is part of parity). Expects
    ``{cent_rel}(user_id, clat, clng, ...)`` and
    ``{points_rel}(user_id, pos, lat, lng, ...)``; emits
    ``cdist{tag}(user_id, pos, d)``. All arithmetic is transcribed
    verbatim from :func:`sql_vincenty_alldist_ctes` (same formulas,
    constants inlined via ``repr``, same convergence freeze), with the
    same sentinel precedence: lat==0 on either side → 1e7, identical
    coordinates → 0.

    Every generated CTE name carries ``tag`` so many instances can
    coexist in one WITH RECURSIVE chain (the G4 oracle unrolls the
    trim loop, one instance per iteration).
    """
    f = repr(_WGS84_F)
    one_mf = repr(1 - _WGS84_F)
    f16 = repr(_WGS84_F / 16.0)
    ab = repr(_WGS84_A**2 - _WGS84_B**2)
    b2 = repr(_WGS84_B**2)
    b = repr(_WGS84_B)
    nofix = repr(NO_FIX_DISTANCE_M)
    bterm = "(u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq))))"
    return f"""
cpair{tag} AS (
    SELECT c.user_id AS user_id, p.pos AS pos,
           sin(atan2({one_mf} * sin(radians(c.clat)), cos(radians(c.clat)))) AS sinU1,
           cos(atan2({one_mf} * sin(radians(c.clat)), cos(radians(c.clat)))) AS cosU1,
           sin(atan2({one_mf} * sin(radians(p.lat)), cos(radians(p.lat)))) AS sinU2,
           cos(atan2({one_mf} * sin(radians(p.lat)), cos(radians(p.lat)))) AS cosU2,
           radians(p.lng - c.clng) AS L
    FROM {cent_rel} c JOIN {points_rel} p ON c.user_id = p.user_id
    WHERE NOT (c.clat = p.lat AND c.clng = p.lng)
      AND c.clat != 0 AND p.lat != 0
), cit{tag} AS (
    SELECT user_id, pos, sinU1, cosU1, sinU2, cosU2, L,
           L AS lam,
           0.0::DOUBLE AS ss, 1.0::DOUBLE AS cs, 0.0::DOUBLE AS sig,
           1.0::DOUBLE AS csa, 0.0::DOUBLE AS c2m,
           TRUE AS active, 0 AS iter
    FROM cpair{tag}
    UNION ALL
    SELECT user_id, pos, sinU1, cosU1, sinU2, cosU2, L,
           lam_new, nss, ncs, nsig, ncsa, nc2m,
           (abs(lam_new - lam) >= 1e-12) AND (iter + 1 < 200), iter + 1
    FROM (
        SELECT *,
               L + (1 - C) * {f} * sin_alpha *
                   (nsig + C * nss * (nc2m + C * ncs * (-1 + 2 * nc2m * nc2m)))
                   AS lam_new
        FROM (
            SELECT *, {f16} * ncsa * (4 + {f} * (4 - 3 * ncsa)) AS C
            FROM (
                SELECT *,
                       atan2(nss, ncs) AS nsig,
                       1.0 - sin_alpha * sin_alpha AS ncsa,
                       CASE WHEN 1.0 - sin_alpha * sin_alpha != 0
                            THEN ncs - 2.0 * sinU1 * sinU2
                                 / greatest(1.0 - sin_alpha * sin_alpha, 1e-300)
                            ELSE 0.0 END AS nc2m
                FROM (
                    SELECT *,
                           CASE WHEN nss != 0
                                THEN cosU1 * cosU2 * sin_lam / greatest(nss, 1e-300)
                                ELSE 0.0 END AS sin_alpha
                    FROM (
                        SELECT *,
                               sqrt((cosU2 * sin_lam) * (cosU2 * sin_lam)
                                    + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam)
                                      * (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam))
                                   AS nss,
                               sinU1 * sinU2 + cosU1 * cosU2 * cos_lam AS ncs
                        FROM (
                            SELECT *, sin(lam) AS sin_lam, cos(lam) AS cos_lam
                            FROM cit{tag} WHERE active
                        )
                    )
                )
            )
        )
    )
), cdist{tag} AS MATERIALIZED (
    SELECT c.user_id AS user_id, p.pos AS pos,
           CASE WHEN c.clat = 0 OR p.lat = 0
                THEN {nofix}::DOUBLE ELSE 0.0::DOUBLE END AS d
    FROM {cent_rel} c JOIN {points_rel} p ON c.user_id = p.user_id
    WHERE (c.clat = 0 OR p.lat = 0) OR (c.clat = p.lat AND c.clng = p.lng)
    UNION ALL
    SELECT user_id, pos,
           CASE WHEN isnan(d0) THEN 0.0 ELSE d0 END AS d
    FROM (
        SELECT user_id, pos,
               {b} * (1 + u_sq / 16384 *
                      (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq))))
               * (sig - {bterm} * ss *
                  (c2m + {bterm} / 4 *
                   (cs * (-1 + 2 * c2m * c2m)
                    - {bterm} / 6 * c2m
                      * (-3 + 4 * ss * ss) * (-3 + 4 * c2m * c2m)))) AS d0
        FROM (
            SELECT *, csa * {ab} / {b2} AS u_sq
            FROM cit{tag} WHERE NOT active
        )
    )
)"""


def vincenty_py(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Scalar Vincenty, arithmetic-identical to :func:`vincenty_np`.

    Pure-``math`` fast path (~100× less overhead than a 1-element
    numpy call) for the sequential kernels (DBSCAN walk, best-cluster
    probe) where distances are inherently one-at-a-time. Mirrors the
    numpy version's operation order exactly, and the batch version
    freezes each element at ITS first |Δλ| < tol iteration — the same
    stopping rule as this loop — so batch and scalar paths agree
    bit-for-bit by construction (gated in tests/test_functions.py).
    """
    if lat1 == 0.0 or lat2 == 0.0:
        return NO_FIX_DISTANCE_M
    if lat1 == lat2 and lng1 == lng2:
        return 0.0
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    # same atan2(sin, cos) formulation as vincenty_np — see the
    # SIMD-parity note there. atan2 itself goes through numpy's scalar
    # ufunc: np.arctan2 is self-consistent between its scalar and SIMD
    # array paths (0/8192 sampled mismatches) but differs from libm's
    # atan2 by 1 ulp on ~30% of inputs, so math.atan2 would break
    # batch↔scalar parity. sin/cos/sqrt match libm everywhere sampled
    # and stay on the fast math.* path.
    U1 = _atan2((1 - _WGS84_F) * math.sin(phi1), math.cos(phi1))
    U2 = _atan2((1 - _WGS84_F) * math.sin(phi2), math.cos(phi2))
    L = math.radians(lng2 - lng1)
    lam = L
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    sin_sigma = 0.0
    cos_sigma = 1.0
    sigma = 0.0
    cos_sq_alpha = 1.0
    cos2sm = 0.0
    # NB: squares are written x*x, never x**2 — CPython's float ** 2
    # goes through C pow() and disagrees with IEEE multiplication by
    # 1 ulp on ~0.2% of inputs, while numpy's array ** 2 lowers to a
    # multiply; x*x keeps both paths bit-identical.
    for _ in range(200):
        sin_lam, cos_lam = math.sin(lam), math.cos(lam)
        t1 = cosU2 * sin_lam
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cos_lam
        sin_sigma = math.sqrt(t1 * t1 + t2 * t2)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = _atan2(sin_sigma, cos_sigma)
        sin_alpha = (
            cosU1 * cosU2 * sin_lam / max(sin_sigma, 1e-300)
            if sin_sigma != 0
            else 0.0
        )
        cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
        cos2sm = (
            cos_sigma - 2.0 * sinU1 * sinU2 / max(cos_sq_alpha, 1e-300)
            if cos_sq_alpha != 0
            else 0.0
        )
        C = _WGS84_F / 16.0 * cos_sq_alpha * (4 + _WGS84_F * (4 - 3 * cos_sq_alpha))
        lam_new = L + (1 - C) * _WGS84_F * sin_alpha * (
            sigma
            + C * sin_sigma * (cos2sm + C * cos_sigma * (-1 + 2 * (cos2sm * cos2sm)))
        )
        if abs(lam_new - lam) < 1e-12:
            lam = lam_new
            break
        lam = lam_new
    u_sq = cos_sq_alpha * (_WGS84_A**2 - _WGS84_B**2) / _WGS84_B**2
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    delta_sigma = (
        B
        * sin_sigma
        * (
            cos2sm
            + B
            / 4
            * (
                cos_sigma * (-1 + 2 * (cos2sm * cos2sm))
                - B
                / 6
                * cos2sm
                * (-3 + 4 * (sin_sigma * sin_sigma))
                * (-3 + 4 * (cos2sm * cos2sm))
            )
        )
    )
    dist = _WGS84_B * A * (sigma - delta_sigma)
    return 0.0 if math.isnan(dist) else dist


def haversine_py(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Scalar haversine (meters), same constants as haversine_m."""
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1)
    dlng = math.radians(lng2 - lng1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlng / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))
