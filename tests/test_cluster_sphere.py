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


def test_sphere_rejects_bad_metric_and_state_mismatch(spark):
    from geomesa_sql_spark.ops.cluster import dbscan_incremental

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "lon": [0.0], "lat": [0.0]})
    )
    with pytest.raises(ValueError, match="metric"):
        dbscan(df, "id", "lon", "lat", eps=10.0, min_pts=1,
               metric="euclid")
    # a state's cell-key dimension pins the metric it was built with:
    # continuing a planar state as sphere (or vice versa) must raise,
    # not silently mis-slice the dirty cells
    _, planar_state = dbscan(
        df, "id", "lon", "lat", eps=10.0, min_pts=1, return_state=True
    )
    with pytest.raises(ValueError, match="cell key"):
        dbscan_incremental(
            df, df, planar_state, "id", "lon", "lat",
            eps=10.0, min_pts=1, metric="sphere",
        )
    _, sphere_state = dbscan(
        df, "id", "lon", "lat", eps=10.0, min_pts=1,
        metric="sphere", return_state=True,
    )
    with pytest.raises(ValueError, match="cell key"):
        dbscan_incremental(
            df, df, sphere_state, "id", "lon", "lat",
            eps=10.0, min_pts=1,
        )


def _rows(df):
    return {
        (int(r["id"]), int(r["cluster"]), r["role"]) for r in df.collect()
    }


def _sphere_df(spark, ids, lon, lat):
    return spark.createDataFrame(
        pd.DataFrame(
            {"id": np.asarray(ids, np.int64), "lon": lon, "lat": lat}
        )
    )


def test_sphere_incremental_equals_full_rebuild(spark):
    """Geodesic incremental maintenance == full geodesic rebuild,
    chained over batches that extend an antimeridian-straddling
    cluster, grow a polar ring, merge two clusters, and add noise —
    the cases a planar-degrees dirty-cell grid would get wrong."""
    from geomesa_sql_spark.ops.cluster import dbscan, dbscan_incremental

    rng = np.random.default_rng(20260821)
    eps, min_pts = 50_000.0, 3

    am_lo, am_la = _cap_points(rng, 179.97, -5.0, 12_000.0, 6)
    po_lo, po_la = _cap_points(rng, 40.0, 89.2, 12_000.0, 5)
    a_lo, a_la = _cap_points(rng, 30.0, 10.0, 12_000.0, 5)
    b_lo, b_la = _cap_points(rng, 31.3, 10.0, 12_000.0, 5)  # ~143 km away
    base_lon = np.concatenate([am_lo, po_lo, a_lo, b_lo])
    base_lat = np.concatenate([am_la, po_la, a_la, b_la])

    # batch 1: extend the antimeridian cluster FROM THE OTHER SIDE of
    # the seam + sparse noise
    d1_lo, d1_la = _cap_points(rng, -179.96, -5.0, 12_000.0, 4)
    d1_lon = np.concatenate([d1_lo, np.array([-60.0, 100.0])])
    d1_lat = np.concatenate([d1_la, np.array([-40.0, 55.0])])
    # batch 2: a bridge point midway between clusters a and b (merges
    # them: 31.3° of lon at lat 10 is ~143 km; the midpoint is ~72 km
    # from each — outside eps; use a 3-point chain) + polar growth
    br_lo = np.array([30.45, 30.65, 30.85])
    br_la = np.full(3, 10.0)
    d2_lo, d2_la = _cap_points(rng, 42.0, 89.25, 12_000.0, 3)
    d2_lon = np.concatenate([br_lo, d2_lo])
    d2_lat = np.concatenate([br_la, d2_la])

    n0, n1, n2 = len(base_lon), len(d1_lon), len(d2_lon)
    ids0 = np.arange(n0)
    ids1 = np.arange(n0, n0 + n1)
    ids2 = np.arange(n0 + n1, n0 + n1 + n2)

    base = _sphere_df(spark, ids0, base_lon, base_lat)
    d1 = _sphere_df(spark, ids1, d1_lon, d1_lat)
    d2 = _sphere_df(spark, ids2, d2_lon, d2_lat)

    _, state = dbscan(
        base, "id", "lon", "lat", eps=eps, min_pts=min_pts,
        metric="sphere", return_state=True,
    )
    all1 = base.unionByName(d1)
    inc1, state = dbscan_incremental(
        all1, d1, state, "id", "lon", "lat",
        eps=eps, min_pts=min_pts, metric="sphere",
    )
    full1 = dbscan(
        all1, "id", "lon", "lat", eps=eps, min_pts=min_pts,
        metric="sphere",
    )
    assert _rows(inc1) == _rows(full1)

    all2 = all1.unionByName(d2)
    inc2, state = dbscan_incremental(
        all2, d2, state, "id", "lon", "lat",
        eps=eps, min_pts=min_pts, metric="sphere",
    )
    full2 = dbscan(
        all2, "id", "lon", "lat", eps=eps, min_pts=min_pts,
        metric="sphere",
    )
    got2 = _rows(inc2)
    assert got2 == _rows(full2)
    # the bridge really merged a and b: ids of both caps share a label
    lab_of = {i: c for (i, c, _) in got2}
    a_ids = range(6 + 5, 6 + 5 + 5)
    b_ids = range(6 + 5 + 5, 6 + 5 + 5 + 5)
    labs = {lab_of[i] for i in a_ids} | {lab_of[i] for i in b_ids}
    assert len(labs) == 1 and -1 not in labs
    # and the antimeridian cluster is one component including batch-1
    am_labs = {lab_of[i] for i in range(6)} | {lab_of[int(i)] for i in ids1[:4]}
    assert len(am_labs) == 1 and -1 not in am_labs


def test_sphere_incremental_removal_splits_seam_cluster(spark):
    """Removing the points ON the antimeridian splits a seam-straddling
    geodesic cluster into an east and a west half — the removal delta
    path must equal a full rebuild in the 3-D embedding too."""
    from geomesa_sql_spark.ops.cluster import dbscan, dbscan_incremental

    lon = np.array([179.80, 179.90, 180.00, -179.95, -179.85, -179.75])
    lat = np.zeros(6)
    ids = np.arange(6)
    base = _sphere_df(spark, ids, lon, lat)
    _, st = dbscan(
        base, "id", "lon", "lat", eps=13_000.0, min_pts=2,
        metric="sphere", return_state=True,
    )
    # drop the two seam points (ids 2, 3): ~11 km gaps become ~22 km
    keep = np.array([0, 1, 4, 5])
    after = _sphere_df(spark, keep, lon[keep], lat[keep])
    delta = _sphere_df(spark, [2, 3], lon[[2, 3]], lat[[2, 3]])
    inc, st = dbscan_incremental(
        after, delta, st, "id", "lon", "lat",
        eps=13_000.0, min_pts=2, metric="sphere",
    )
    got = _rows(inc)
    ref = dbscan(
        after, "id", "lon", "lat", eps=13_000.0, min_pts=2, metric="sphere"
    )
    assert got == _rows(ref)
    lab_of = {i: c for (i, c, _) in got}
    assert set(lab_of) == {0, 1, 4, 5}
    assert lab_of[0] == lab_of[1] >= 0
    assert lab_of[4] == lab_of[5] >= 0
    assert lab_of[0] != lab_of[4], "seam cluster did not split"


def test_sphere_incremental_driver_cap_and_single_eps_conversion(spark):
    """Two review regressions: (1) the driver-dilation cell cap scales
    down with grid dimension (the r=4 ring is 9× more offsets in 3-D,
    so the same cap would mean 9× the driver rows and broadcast size);
    (2) both _validated_pts calls in dbscan_incremental receive the
    USER eps in metres — feeding the first call's chord-converted eps
    into the second would chord-convert it twice."""
    import geomesa_sql_spark.ops.cluster as C

    assert C._driver_cells_cap(2) == C._DRIVER_CELLS_MAX
    assert C._driver_cells_cap(3) == C._DRIVER_CELLS_MAX // 9

    seen = []
    orig = C._validated_pts

    def spy(df, key, x, y, eps, min_pts, coarse_cell, metric="planar"):
        seen.append(float(eps))
        return orig(df, key, x, y, eps, min_pts, coarse_cell, metric)

    rng = np.random.default_rng(2)
    lo, la = _cap_points(rng, 5.0, 5.0, 10_000.0, 4)
    base = _sphere_df(spark, np.arange(4), lo, la)
    d_lo, d_la = _cap_points(rng, 5.1, 5.0, 10_000.0, 2)
    delta = _sphere_df(spark, [10, 11], d_lo, d_la)
    _, st = dbscan(base, "id", "lon", "lat", eps=30_000.0, min_pts=2,
                   metric="sphere", return_state=True)
    try:
        C._validated_pts = spy
        C.dbscan_incremental(
            base.unionByName(delta), delta, st, "id", "lon", "lat",
            eps=30_000.0, min_pts=2, metric="sphere",
        )
    finally:
        C._validated_pts = orig
    assert seen == [30_000.0, 30_000.0]


def test_sphere_incremental_state_save_load_roundtrip(spark, tmp_path):
    """3-D (ccz-carrying) state survives the durable parquet
    snapshot and continues correctly after a reload."""
    from geomesa_sql_spark.ops.cluster import (
        dbscan,
        dbscan_incremental,
        load_dbscan_state,
        save_dbscan_state,
    )

    rng = np.random.default_rng(11)
    lo, la = _cap_points(rng, 179.98, 0.0, 10_000.0, 5)
    base = _sphere_df(spark, np.arange(5), lo, la)
    d_lo, d_la = _cap_points(rng, -179.97, 0.0, 10_000.0, 3)
    delta = _sphere_df(spark, np.arange(5, 8), d_lo, d_la)

    _, state = dbscan(
        base, "id", "lon", "lat", eps=40_000.0, min_pts=2,
        metric="sphere", return_state=True,
    )
    save_dbscan_state(state, str(tmp_path), applied=[0])
    loaded, applied = load_dbscan_state(spark, str(tmp_path))
    assert applied == [0]
    assert "ccz" in loaded["local"].columns
    full = base.unionByName(delta)
    inc, _ = dbscan_incremental(
        full, delta, loaded, "id", "lon", "lat",
        eps=40_000.0, min_pts=2, metric="sphere",
    )
    ref = dbscan(
        full, "id", "lon", "lat", eps=40_000.0, min_pts=2, metric="sphere"
    )
    assert _rows(inc) == _rows(ref)


def test_sphere_streaming_maintainer_matches_batch(spark):
    """DbscanMaintainer(metric='sphere') driven directly (the
    foreachBatch calling convention) equals batch geodesic DBSCAN
    after every batch, and replays are idempotent."""
    from geomesa_sql_spark.streaming.cluster import DbscanMaintainer

    rng = np.random.default_rng(3)
    lo0, la0 = _cap_points(rng, 10.0, 45.0, 10_000.0, 4)
    lo1, la1 = _cap_points(rng, 10.0, 45.3, 10_000.0, 3)
    b0 = _sphere_df(spark, np.arange(4), lo0, la0)
    b1 = _sphere_df(spark, np.arange(4, 7), lo1, la1)

    m = DbscanMaintainer(
        "id", "lon", "lat", eps=45_000.0, min_pts=2, metric="sphere"
    )
    m(b0, 0)
    assert _rows(m.labels) == _rows(
        dbscan(b0, "id", "lon", "lat", eps=45_000.0, min_pts=2,
               metric="sphere")
    )
    m(b1, 1)
    want = _rows(
        dbscan(b0.unionByName(b1), "id", "lon", "lat",
               eps=45_000.0, min_pts=2, metric="sphere")
    )
    assert _rows(m.labels) == want
    m(b1, 1)  # replayed batch: state unchanged
    assert _rows(m.labels) == want


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
