"""Geodesic (ellipsoidal-earth) distance — the geography-style
companion to the deliberately planar `geom/kernel.py` (kernel line 9:
the reference inherits JTS's Cartesian semantics, so every ST_ measure
there is planar by contract). At planetary extents a planar degree
metric is meaningless, so this module adds the PostGIS-parity
geography measures as an explicit, separately named surface:

- ``sphere_distance`` — great-circle distance on the mean-radius
  sphere (haversine; PostGIS ``ST_DistanceSphere`` semantics). Also
  available as a pure Spark ``Column`` (`sphere_distance_cols`) so the
  hot path — a 10^12-row distance filter — stays inside whole-stage
  codegen with zero Python.
- ``spheroid_distance`` — Vincenty's inverse on the true ellipsoid
  (PostGIS ``ST_DistanceSpheroid`` semantics), vectorized over numpy
  with masked fixed-point iteration. Vincenty's iteration famously
  fails to converge for nearly-antipodal pairs (|Δλ'| → π); those rows
  (and only those) fall back to the mean-sphere great circle, whose
  worst-case ellipsoidal error is ≤0.56% — documented, deterministic,
  never NaN. (The reference has no geodesic surface at all; PostGIS
  delegates to GeographicLib. A from-scratch Karney solver is the
  upgrade path if sub-mm antipodal distances ever matter.)

Verification anchors (tests/test_geodesic.py): the Geoscience
Australia Vincenty worked example (Flinders Peak → Buninyong on
GRS80 = 54 972.271 m), the WGS84 meridian quadrant (10 001 965.729 m)
and equatorial quadrant (a·π/2), plus symmetry/zero/NULL laws and
bit-parity between the numpy and Column haversines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# WGS84 / GRS80 ellipsoids (duplicated from geom/crs.py's private
# constants to keep this module importable without the CRS registry).
WGS84 = (6378137.0, 1.0 / 298.257223563)
GRS80 = (6378137.0, 1.0 / 298.257222101)

# PostGIS ST_DistanceSphere's radius: the WGS84 mean radius (2a+b)/3.
MEAN_RADIUS = (2.0 * WGS84[0] + WGS84[0] * (1.0 - WGS84[1])) / 3.0

# Cap-cover radius: the WGS84 POLAR radius b. Smaller than every radius
# of curvature the haversine sphere uses, so an angular radius computed
# as m/COVER_RADIUS always over-states the cap — covers built from it
# are proven supersets of the refine sphere's caps.
COVER_RADIUS = WGS84[0] * (1.0 - WGS84[1])

# No two points are farther apart than half the mean-sphere
# circumference — the world-covered test for expanding-radius searches.
MAX_DISTANCE = np.pi * MEAN_RADIUS


def sphere_deg_bounds(y, meters: float):
    """Per-row conservative (Δlat°, Δlon°) extents of the ``meters``-
    radius spherical cap centred at latitude ``y`` (degrees, array).
    Latitude: |Δφ| ≤ c by the colatitude triangle inequality. Longitude:
    the cap's max excursion obeys sin Δλ = sin c / cos φ, evaluated with
    c = m/COVER_RADIUS (over-stated) at the band edge |φ|+Δφ (cos no
    larger) — so the box is a superset of the true cap. Bands reaching
    a pole (or sine ratio ≥ 1) get the full 180° span."""
    dlat = np.degrees(meters / COVER_RADIUS)
    band = np.minimum(89.9999, np.abs(y) + dlat)
    s = np.sin(min(meters / COVER_RADIUS, np.pi / 2.0)) / np.cos(
        np.radians(band)
    )
    dlon = np.where(
        s >= 1.0, 180.0, np.degrees(np.arcsin(np.minimum(s, 1.0)))
    )
    return dlat, dlon


def sphere_deg_bounds_cols(qy: Column, meters: float):
    """The same cap bounds as (scalar Δlat°, Column Δlon°) — pure Spark
    Column arithmetic for JVM-side prune predicates. NULL latitude →
    NULL Δlon: both clamps here go through least/when, and least SKIPS
    nulls (CLAUDE.md) — unguarded, a NULL lat would silently become a
    FULL-SPAN cover instead of a no-match row, exploding downstream
    state; the trailing isNotNull gate restores SQL semantics."""
    import math

    dlat = math.degrees(meters / COVER_RADIUS)
    band = F.least(F.lit(89.9999), F.abs(qy) + F.lit(dlat))
    s = F.lit(math.sin(min(meters / COVER_RADIUS, math.pi / 2.0))) / F.cos(
        F.radians(band)
    )
    dlon = F.when(s >= F.lit(1.0), F.lit(180.0)).otherwise(
        F.degrees(F.asin(s))
    )
    return dlat, F.when(qy.isNotNull(), dlon)


def sphere_distance(lon1, lat1, lon2, lat2,
                    radius: float = MEAN_RADIUS) -> np.ndarray:
    """Great-circle distance in metres (haversine — numerically stable
    for small separations where the spherical law of cosines loses all
    its digits). Inputs are degrees, scalars or broadcastable arrays;
    NaN propagates (Arrow delivers SQL NULL doubles as NaN)."""
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(v, dtype=np.float64))
        for v in (lon1, lat1, lon2, lat2)
    )
    sdp = np.sin((lat2 - lat1) / 2.0)
    sdl = np.sin((lon2 - lon1) / 2.0)
    h = sdp * sdp + np.cos(lat1) * np.cos(lat2) * sdl * sdl
    # rounding can push h an ulp past 1 for antipodes
    return 2.0 * radius * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


def sphere_distance_cols(lon1: Column, lat1: Column,
                         lon2: Column, lat2: Column,
                         radius: float = MEAN_RADIUS) -> Column:
    """The same haversine as a pure Spark Column — whole-stage codegen,
    no Python worker, safe on a join key. The ≤1 clamp is gated with
    ``when`` rather than ``least`` because least/greatest SKIP nulls
    (CLAUDE.md): ``least(1.0, NULL)`` would turn a NULL coordinate into
    a hard 1.0 instead of propagating NULL."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    sdp = F.sin((p2 - p1) / F.lit(2.0))
    sdl = F.sin((F.radians(lon2) - F.radians(lon1)) / F.lit(2.0))
    h = sdp * sdp + F.cos(p1) * F.cos(p2) * sdl * sdl
    root = F.sqrt(h)
    return F.lit(2.0 * radius) * F.asin(
        F.when(root > F.lit(1.0), F.lit(1.0)).otherwise(root)
    )


def spheroid_distance(lon1, lat1, lon2, lat2,
                      ellipsoid=WGS84, max_iter: int = 100,
                      tol: float = 1e-12) -> np.ndarray:
    """Vincenty inverse geodesic distance in metres on ``ellipsoid``
    (degrees in; scalars or equal-length arrays). Vectorized masked
    fixed-point iteration on λ: rows converge independently and drop
    out of the active mask; typical inputs settle in 3–5 rounds, so the
    loop cost is the converged-row fraction, not max_iter. Coincident
    points short-circuit to 0 exactly; non-converged (nearly antipodal)
    rows take the documented mean-sphere fallback."""
    a, f = ellipsoid
    b = a * (1.0 - f)
    lon1, lat1, lon2, lat2 = (
        np.atleast_1d(np.asarray(v, dtype=np.float64))
        for v in (lon1, lat1, lon2, lat2)
    )
    lon1, lat1, lon2, lat2 = np.broadcast_arrays(lon1, lat1, lon2, lat2)
    # Vincenty is formulated for |L| <= pi: wrap the longitude
    # difference so antimeridian-crossing pairs solve exactly instead
    # of tripping the divergence guard into the sphere fallback
    # (r5 review: (-179,0)-(179,0) lost 249 m to the fallback)
    L = np.radians((lon2 - lon1 + 180.0) % 360.0 - 180.0)
    u1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    u2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2), np.cos(u2)

    lam = L.copy()
    n = L.shape[0]
    sig = np.zeros(n)
    ssig = np.zeros(n)
    csig = np.ones(n)
    cos2sm = np.zeros(n)
    csqa = np.ones(n)
    finite = np.isfinite(L + u1 + u2)
    active = finite.copy()
    coincident = active & (np.abs(lat1 - lat2) < 1e-15) & (
        np.abs(((lon1 - lon2) + 180.0) % 360.0 - 180.0) < 1e-15
    )
    active &= ~coincident

    for _ in range(max_iter):
        if not active.any():
            break
        sl, cl = np.sin(lam[active]), np.cos(lam[active])
        a_cu1, a_su1 = cu1[active], su1[active]
        a_cu2, a_su2 = cu2[active], su2[active]
        t1 = a_cu2 * sl
        t2 = a_cu1 * a_su2 - a_su1 * a_cu2 * cl
        s_sig = np.hypot(t1, t2)
        c_sig = a_su1 * a_su2 + a_cu1 * a_cu2 * cl
        sg = np.arctan2(s_sig, c_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(s_sig == 0.0, 0.0,
                                 a_cu1 * a_cu2 * sl / s_sig)
        csq = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(csq == 0.0, 0.0,  # equatorial line
                            c_sig - 2.0 * a_su1 * a_su2 / np.where(
                                csq == 0.0, 1.0, csq))
        C = f / 16.0 * csq * (4.0 + f * (4.0 - 3.0 * csq))
        new_lam = L[active] + (1.0 - C) * f * sin_alpha * (
            sg + C * s_sig * (
                c2sm + C * c_sig * (-1.0 + 2.0 * c2sm * c2sm)
            )
        )
        done = np.abs(new_lam - lam[active]) < tol
        idx = np.flatnonzero(active)
        lam[idx] = new_lam
        sig[idx] = sg
        ssig[idx] = s_sig
        csig[idx] = c_sig
        cos2sm[idx] = c2sm
        csqa[idx] = csq
        # |λ| past π means the iteration is diverging (antipodal):
        # freeze those rows as non-converged rather than oscillating
        diverged = np.abs(new_lam) > np.pi
        active[idx[done | diverged]] = False
        if diverged.any():
            sig[idx[diverged]] = np.nan

    failed = active | ~np.isfinite(sig)

    usq = csqa * (a * a - b * b) / (b * b)
    A = 1.0 + usq / 16384.0 * (
        4096.0 + usq * (-768.0 + usq * (320.0 - 175.0 * usq))
    )
    B = usq / 1024.0 * (256.0 + usq * (-128.0 + usq * (74.0 - 47.0 * usq)))
    dsig = B * ssig * (
        cos2sm + B / 4.0 * (
            csig * (-1.0 + 2.0 * cos2sm * cos2sm)
            - B / 6.0 * cos2sm * (-3.0 + 4.0 * ssig * ssig)
            * (-3.0 + 4.0 * cos2sm * cos2sm)
        )
    )
    out = b * A * (sig - dsig)
    out[coincident] = 0.0
    if failed.any():
        out[failed] = sphere_distance(
            lon1[failed], lat1[failed], lon2[failed], lat2[failed]
        )
    out[~finite] = np.nan  # NULL/NaN coordinates stay NULL
    return out


# Authalic radius: the sphere with exactly the WGS84 ellipsoid's
# surface area — the principled radius for AREA measures (the mean
# radius above is the one for distances). R_A² = a²/2 + b²/2·atanh(e)/e.
def _authalic_radius() -> float:
    a, f = WGS84
    b = a * (1.0 - f)
    e = np.sqrt(f * (2.0 - f))
    return float(np.sqrt(a * a / 2.0 + b * b / 2.0 * np.arctanh(e) / e))


AUTHALIC_RADIUS = _authalic_radius()


def _unit_vectors(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lam = np.radians(lon)
    phi = np.radians(lat)
    cphi = np.cos(phi)
    return np.column_stack(
        [cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi)]
    )


def sphere_ring_area(lon: np.ndarray, lat: np.ndarray,
                     radius: float = AUTHALIC_RADIUS) -> float:
    """UNSIGNED area (m²) of a simple spherical polygon ring whose
    edges are great-circle arcs — the exact signed solid angle via the
    van Oosterom–Strackee triangle formula summed over a fan from the
    first vertex:

        tan(Ω/2) = a·(b×c) / (1 + a·b + b·c + c·a)

    (each fan triangle's SIGNED solid angle in one atan2 — no angle
    accumulation, no pole special cases). Exact for rings enclosing
    less than a hemisphere (the PostGIS geography convention: a ring
    means the smaller side); beyond that the fan sum aliases mod 4π.
    Closed or open rings accepted (a closing duplicate vertex
    contributes a zero triangle)."""
    v = _unit_vectors(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    if len(v) < 3:
        return 0.0
    a = v[0]
    b = v[1:-1]
    c = v[2:]
    triple = np.einsum("ij,ij->i", np.cross(b, c), np.broadcast_to(a, b.shape))
    denom = (
        1.0
        + b @ a
        + np.einsum("ij,ij->i", b, c)
        + c @ a
    )
    omega = 2.0 * np.arctan2(triple, denom)
    return abs(float(omega.sum())) * radius * radius


def sphere_geom_area(g, radius: float = AUTHALIC_RADIUS) -> float:
    """Geodesic area of a Polygon/MultiPolygon ``Geom`` (m²): exterior
    rings minus holes, great-circle edges, authalic-sphere radius.
    Non-areal types are 0.0 (planar ST_Area parity)."""
    from geomesa_sql_spark.geom import model

    if g.type == model.POLYGON:
        rings = g.coords
        if not rings:
            return 0.0
        area = sphere_ring_area(rings[0][:, 0], rings[0][:, 1], radius)
        for hole in rings[1:]:
            area -= sphere_ring_area(hole[:, 0], hole[:, 1], radius)
        return max(area, 0.0)
    if g.type in (model.MULTIPOLYGON, model.GEOMETRYCOLLECTION):
        return float(sum(sphere_geom_area(p, radius) for p in g.coords))
    return 0.0


def sphere_geom_perimeter(g, radius: float = MEAN_RADIUS) -> float:
    """Geodesic perimeter/length (m): the haversine sum over the
    vertex chain of every LineString / ring (great-circle edge
    lengths on the mean sphere — the same metric ST_DistanceSphere
    uses). Points contribute 0."""
    from geomesa_sql_spark.geom import model

    def ring_len(arr) -> float:
        if len(arr) < 2:
            return 0.0
        return float(
            sphere_distance(
                arr[:-1, 0], arr[:-1, 1], arr[1:, 0], arr[1:, 1], radius
            ).sum()
        )

    if g.type == model.LINESTRING:
        return ring_len(g.coords)
    if g.type == model.POLYGON:
        return float(sum(ring_len(r) for r in g.coords))
    if g.type in (model.MULTIPOINT,):
        return 0.0
    if isinstance(g.coords, list) and g.coords and hasattr(g.coords[0], "type"):
        return float(sum(sphere_geom_perimeter(p, radius) for p in g.coords))
    return 0.0
