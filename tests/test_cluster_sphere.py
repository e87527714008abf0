"""Geodesic DBSCAN (metric='sphere'): the 3-D chordal embedding makes
eps-in-metres clustering exactly Euclidean DBSCAN in chord space, so
the oracle here is a brute-force all-pairs replay of the same
embedding. Every dataset keeps a >1 m margin between any pairwise
distance and eps (guard-asserted) so JVM-vs-numpy ulp differences in
the trig cannot flip a boundary pair."""

import math

import numpy as np
import pandas as pd
import pytest

from geomesa_sql_spark.geom.geodesic import MAX_DISTANCE, MEAN_RADIUS
from geomesa_sql_spark.ops.cluster import dbscan

R = MEAN_RADIUS
_M_PER_DEG = math.pi * R / 180.0  # metres per degree of latitude


def _embed(lon, lat):
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    return np.stack(
        [
            R * np.cos(phi) * np.cos(lam),
            R * np.cos(phi) * np.sin(lam),
            R * np.sin(phi),
        ],
        axis=1,
    )


def _brute(ids, lon, lat, eps_m, min_pts, margin_guard=True):
    """All-pairs geodesic DBSCAN with the engine's label rule
    (cluster = min core id; border takes the min core-neighbor
    label). Returns {id: (cluster, role)}."""
    X = _embed(lon, lat)
    eps_c = 2.0 * R * math.sin(min(eps_m, math.pi * R) / (2.0 * R))
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    d = np.sqrt(d2)
    if margin_guard:
        off = np.abs(d - eps_c)
        np.fill_diagonal(off, np.inf)
        assert off.min() > 1.0, "fixture pair within 1 m of eps — reseed"
    within = d2 <= eps_c * eps_c
    core = within.sum(axis=1) >= min_pts
    n = len(ids)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.nonzero(core)[0]
    for i in ci:
        for j in ci[ci > i]:
            if within[i, j]:
                ra, rb = find(int(i)), find(int(j))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for i in ci:
        r = find(int(i))
        comp_min[r] = min(comp_min.get(r, 1 << 62), int(ids[i]))
    out = {}
    for i in ci:
        out[int(ids[i])] = (comp_min[find(int(i))], "core")
    for i in range(n):
        if core[i]:
            continue
        labs = [comp_min[find(int(j))] for j in ci if within[i, j]]
        out[int(ids[i])] = (min(labs), "border") if labs else (-1, "noise")
    return out


def _run(spark, lon, lat, eps_m, min_pts, **kw):
    ids = np.arange(len(lon), dtype=np.int64)
    df = spark.createDataFrame(
        pd.DataFrame({"id": ids, "lon": lon, "lat": lat})
    )
    res = dbscan(
        df, "id", "lon", "lat", eps=eps_m, min_pts=min_pts,
        metric="sphere", **kw,
    )
    got = {int(r["id"]): (int(r["cluster"]), r["role"]) for r in res.collect()}
    assert len(got) == len(ids)  # one row per input point
    return got


def _cap_points(rng, lon0, lat0, radius_m, n):
    """n points whose lon/lat-axis offsets from (lon0, lat0) are each
    ≤ radius_m surface metres (so pairwise ≤ 2√2·radius_m): the lon
    offset in degrees shrinks by the LARGEST cos(lat) the band can
    reach (its most equatorward latitude) — dividing by a larger cos
    gives a smaller degree offset, so the metre bound holds at every
    latitude in the band. (Dividing by the smallest cos — the first
    version's bug — INFLATES the offset ~12% at lat 89.)"""
    dlat = rng.uniform(-radius_m, radius_m, n) / _M_PER_DEG
    lat = lat0 + dlat
    band_min_abs = max(0.0, abs(lat0) - radius_m / _M_PER_DEG)
    cos_max = max(math.cos(math.radians(band_min_abs)), 1e-6)
    dlon = rng.uniform(-radius_m, radius_m, n) / (_M_PER_DEG * cos_max)
    return lon0 + dlon, lat


def test_sphere_matches_bruteforce_global(spark):
    rng = np.random.default_rng(20260820)
    eps = 50_000.0
    lons, lats = [], []
    # clusters straddling the antimeridian, near a pole, and at
    # mid-latitudes; axis offsets <= 15 km => pairwise <= 2*sqrt(2)*15
    # = 42.4 km < eps (chord distance is shorter still)
    for lon0, lat0, n in [
        (179.98, 0.2, 12),
        (5.0, 88.9, 10),
        (-45.0, -33.0, 14),
        (120.5, 48.7, 9),
        (-170.2, -61.0, 8),
    ]:
        lo, la = _cap_points(rng, lon0, lat0, 15_000.0, n)
        lons.append(lo)
        lats.append(la)
    # sparse global noise, far from everything with high probability
    lons.append(rng.uniform(-180.0, 180.0, 25))
    lats.append(np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 25))))
    lon = np.concatenate(lons)
    lat = np.concatenate(lats)
    ids = np.arange(len(lon), dtype=np.int64)
    exp = _brute(ids, lon, lat, eps, 4)
    got = _run(spark, lon, lat, eps, 4)
    assert got == exp
    # the fixture is non-trivial: some of everything
    roles = {v[1] for v in got.values()}
    assert roles == {"core", "border", "noise"} or roles == {"core", "noise"}
    assert len({v[0] for v in got.values() if v[0] >= 0}) >= 5


def test_antimeridian_cluster_is_whole(spark):
    lon = np.array([179.90, 179.95, 180.00, -179.95, -179.90])
    lat = np.zeros(5)
    got = _run(spark, lon, lat, 10_000.0, 2)
    labs = {v[0] for v in got.values()}
    assert labs == {0}, f"antimeridian cluster split: {got}"
    ids = np.arange(5, dtype=np.int64)
    assert got == _brute(ids, lon, lat, 10_000.0, 2)


def test_polar_ring_single_cluster(spark):
    # a ring around the north pole: adjacent 10-degree steps at
    # lat 89.95 are ~970 m apart — a chain cluster crossing every
    # longitude, impossible for a planar-degrees grid
    lon = np.arange(0.0, 360.0, 10.0)
    lat = np.full(lon.shape, 89.95)
    got = _run(spark, lon, lat, 2_000.0, 3)
    assert {v for v in got.values()} == {(0, "core")}
    ids = np.arange(len(lon), dtype=np.int64)
    assert got == _brute(ids, lon, lat, 2_000.0, 3)


def test_longitude_shift_invariance(spark):
    rng = np.random.default_rng(7)
    lo1, la1 = _cap_points(rng, 10.0, 40.0, 20_000.0, 12)
    lo2, la2 = _cap_points(rng, 10.9, 40.0, 20_000.0, 3)
    lon = np.concatenate([lo1, lo2])
    lat = np.concatenate([la1, la2])
    base = _run(spark, lon, lat, 30_000.0, 4)
    shifted = _run(spark, lon + 137.0, lat, 30_000.0, 4)
    assert base == shifted


def test_world_covering_eps(spark):
    lon = np.array([0.0, 90.0, -90.0, 179.0, -37.0])
    lat = np.array([0.0, 45.0, -80.0, 10.0, 89.0])
    got = _run(spark, lon, lat, MAX_DISTANCE, 5)
    assert {v for v in got.values()} == {(0, "core")}
    # and beyond the world circumference clamps rather than wrapping
    got2 = _run(spark, lon, lat, 10.0 * MAX_DISTANCE, 5)
    assert got2 == got


def test_sphere_rejects_state_and_bad_metric(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "lon": [0.0], "lat": [0.0]})
    )
    with pytest.raises(NotImplementedError, match="planar-only"):
        dbscan(df, "id", "lon", "lat", eps=10.0, min_pts=1,
               metric="sphere", return_state=True)
    with pytest.raises(ValueError, match="metric"):
        dbscan(df, "id", "lon", "lat", eps=10.0, min_pts=1,
               metric="euclid")


def test_sphere_null_coords_dropped(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "lon": [0.0, None, 0.001, 0.002],
            "lat": [0.0, 0.0, None, 0.0],
        }
    )
    df = spark.createDataFrame(pdf)
    res = dbscan(df, "id", "lon", "lat", eps=1_000.0, min_pts=2,
                 metric="sphere")
    got = {int(r["id"]): (int(r["cluster"]), r["role"]) for r in res.collect()}
    assert set(got) == {1, 4}
    assert got[1] == (1, "core") and got[4] == (1, "core")


def test_sphere_custom_coarse_cell_and_min_pts_boundary(spark):
    # min_pts counts the point itself; exactly min_pts-1 neighbors
    # within eps => core. 3 points in a 1 km chain, eps 1.5 km.
    lon = np.array([0.0, 0.009, 0.018])  # ~1 km spacing at the equator
    lat = np.zeros(3)
    eps = 1_500.0
    for cc in (None, 3_100.0, 50_000.0):
        got = _run(spark, lon, lat, eps, 3, coarse_cell=cc)
        ids = np.arange(3, dtype=np.int64)
        assert got == _brute(ids, lon, lat, eps, 3)
    with pytest.raises(ValueError, match="coarse_cell"):
        _run(spark, lon, lat, eps, 3, coarse_cell=2_000.0)
