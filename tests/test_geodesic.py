"""Geodesic distance surface (geom/geodesic.py + the ST_DistanceSphere/
ST_DistanceSpheroid SQL names). Anchored to PUBLISHED values, not
self-derivation: the Geoscience Australia Vincenty worked example
(Flinders Peak → Buninyong on GRS80), the WGS84 meridian quadrant, and
the exact equatorial closed form a·π/2 (an equatorial geodesic is the
equator itself, so Vincenty must reproduce the arc length of a circle
of radius a)."""

import numpy as np
import pytest

from geomesa_sql_spark.geom.geodesic import (
    GRS80,
    MEAN_RADIUS,
    sphere_distance,
    sphere_distance_cols,
    spheroid_distance,
)

# Geoscience Australia (GDA technical manual) Vincenty worked example.
_FLINDERS = (144 + 25 / 60 + 29.52440 / 3600, -(37 + 57 / 60 + 3.72030 / 3600))
_BUNINYONG = (143 + 55 / 60 + 35.38390 / 3600, -(37 + 39 / 60 + 10.15610 / 3600))


def test_vincenty_published_anchors():
    d = spheroid_distance(*_FLINDERS, *_BUNINYONG, ellipsoid=GRS80)
    assert abs(float(d[0]) - 54972.271) < 1e-3  # published to the mm
    # WGS84 meridian quadrant (equator → pole along a meridian)
    q = spheroid_distance(0.0, 0.0, 0.0, 90.0)
    assert abs(float(q[0]) - 10001965.7293) < 1e-3
    # equatorial quadrant: exactly a·π/2 (sin_alpha=1 branch)
    e = spheroid_distance(0.0, 0.0, 90.0, 0.0)
    assert abs(float(e[0]) - 6378137.0 * np.pi / 2.0) < 1e-2


def test_vincenty_laws():
    rng = np.random.default_rng(7)
    lon1 = rng.uniform(-180, 180, 200)
    lat1 = rng.uniform(-85, 85, 200)
    lon2 = rng.uniform(-180, 180, 200)
    lat2 = rng.uniform(-85, 85, 200)
    d12 = spheroid_distance(lon1, lat1, lon2, lat2)
    d21 = spheroid_distance(lon2, lat2, lon1, lat1)
    assert np.allclose(d12, d21, rtol=0, atol=1e-6)  # symmetry
    assert np.all(d12 >= 0)
    assert np.all(spheroid_distance(lon1, lat1, lon1, lat1) == 0.0)
    # spheroid vs mean-sphere: within the 0.56% flattening bound
    s = sphere_distance(lon1, lat1, lon2, lat2)
    far = s > 1000.0  # relative bound is meaningless at ulp distances
    assert np.all(np.abs(d12[far] - s[far]) <= 0.0056 * s[far] + 1.0)


def test_antipodal_fallback_finite():
    # Vincenty's divergence zone: the documented mean-sphere fallback
    # must kick in and stay finite/positive, never NaN or an oscillation
    d = spheroid_distance(
        np.array([0.0, 10.0]), np.array([0.0, 5.0]),
        np.array([179.99999, -169.99999]), np.array([0.001, -5.0001]),
    )
    assert np.all(np.isfinite(d)) and np.all(d > 1.9e7)
    # NaN (SQL NULL) coordinates propagate
    assert np.isnan(spheroid_distance(np.nan, 0.0, 10.0, 10.0)[0])
    assert np.isnan(sphere_distance(np.nan, 0.0, 10.0, 10.0))


def test_sphere_column_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 500),
        "lat1": rng.uniform(-89, 89, 500),
        "lon2": rng.uniform(-180, 180, 500),
        "lat2": rng.uniform(-89, 89, 500),
    })
    df = spark.createDataFrame(pdf)
    got = np.array(
        df.select(
            sphere_distance_cols(
                F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
            ).alias("d")
        ).toPandas()["d"]
    )
    want = sphere_distance(pdf.lon1, pdf.lat1, pdf.lon2, pdf.lat2)
    # same formula, JVM libm vs numpy libm: ulp-level agreement
    assert np.allclose(got, want, rtol=1e-12, atol=1e-6)
    # NULL propagation through the gated clamp (least() would eat it)
    row = spark.sql(
        "SELECT CAST(NULL AS DOUBLE) AS lon1, 1.0D AS lat1, "
        "2.0D AS lon2, 3.0D AS lat2"
    ).select(
        sphere_distance_cols(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("d")
    ).collect()[0]
    assert row["d"] is None


def test_sql_surface(spark):
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    row = spark.sql(
        f"""SELECT ST_DistanceSphere(ST_MakePoint({_FLINDERS[0]}, {_FLINDERS[1]}),
                                     ST_MakePoint({_BUNINYONG[0]}, {_BUNINYONG[1]})) AS ds,
                   ST_DistanceSpheroid(ST_MakePoint({_FLINDERS[0]}, {_FLINDERS[1]}),
                                       ST_MakePoint({_BUNINYONG[0]}, {_BUNINYONG[1]})) AS dv,
                   ST_DistanceSphere(CAST(NULL AS BINARY),
                                     ST_MakePoint(0.0D, 0.0D)) AS dn"""
    ).collect()[0]
    # WGS84 vs the GRS80 published value: identical at the mm for this
    # line (the ellipsoids differ in f at the 1e-11 level)
    assert abs(row["dv"] - 54972.271) < 5e-3
    # sphere vs spheroid within the flattening bound
    assert abs(row["ds"] - row["dv"]) <= 0.0056 * row["dv"]
    assert row["dn"] is None or (
        isinstance(row["dn"], float) and np.isnan(row["dn"])
    )


def test_sql_surface_non_point_is_loud(spark):
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    with pytest.raises(Exception, match="POINT"):
        spark.sql(
            "SELECT ST_DistanceSphere("
            "ST_GeomFromText('LINESTRING (0 0, 1 1)'), "
            "ST_MakePoint(0.0D, 0.0D))"
        ).collect()


def test_dwithin_sphere_join_vs_bruteforce(spark):
    """spatial_join(predicate='dwithin_sphere') must equal the all-pairs
    haversine relation, including near-pole points (full-longitude
    covers) and pairs straddling the antimeridian (split covers)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side

    n = 4000
    k = np.arange(n, dtype=np.int64)
    lon = ((k * 7919) % 36000) / 100.0 - 180.0
    lat = ((k * 104729) % 17000) / 100.0 - 85.0
    # force antimeridian + polar coverage
    lon[:50] = 179.5 + (k[:50] % 10) / 25.0   # right at the seam
    lon[50:100] = -179.5 - (k[50:100] % 10) / 25.0
    lat[100:150] = 88.0 + (k[100:150] % 10) / 10.0
    left = spark.createDataFrame(
        pd.DataFrame({"pid": k, "lon": lon, "lat": lat})
    )
    pois = pd.DataFrame({
        "poi": np.arange(8),
        "plon": np.array([0.0, 179.9, -179.9, 10.0, -60.0, 120.0, 0.0, -45.0]),
        "plat": np.array([0.0, 10.0, 10.2, 89.2, -45.0, 45.0, 88.5, 30.0]),
    })
    right = spark.createDataFrame(pois)
    radius_m = 300_000.0

    got = (
        spatial_join(
            left, right, point_side("lon", "lat"), point_side("plon", "plat"),
            predicate="dwithin_sphere", distance=radius_m, broadcast=True,
        )
        .select("pid", "poi")
        .toPandas()
    )
    got_pairs = set(zip(got.pid.astype(int), got.poi.astype(int)))

    want_pairs = set()
    for _, p in pois.iterrows():
        d = sphere_distance(lon, lat, p.plon, p.plat)
        for pid in np.flatnonzero(d <= radius_m):
            want_pairs.add((int(pid), int(p.poi)))
    assert got_pairs == want_pairs
    assert len(want_pairs) > 20  # the fixture actually exercises matches
    # seam + pole pairs specifically present
    assert any(p for p in want_pairs if p[1] in (1, 2)) and any(
        p for p in want_pairs if p[1] in (3, 6)
    )


def test_dwithin_sphere_wkb_side_is_loud(spark):
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side

    df = spark.range(1).selectExpr("1.0D AS lon", "2.0D AS lat", "CAST(NULL AS BINARY) AS g")
    with pytest.raises(NotImplementedError, match="dwithin_sphere"):
        spatial_join(
            df, df, point_side("lon", "lat"), wkb_side("g"),
            predicate="dwithin_sphere", distance=10.0,
        )


def test_dwithin_sphere_sql_router(spark):
    """SQL-text ST_DWithinSphere: the join router plans the optimized
    cell join; the scalar UDF answers WHERE-shaped uses directly."""
    import pandas as pd

    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="pid")
    k = np.arange(500, dtype=np.int64)
    lon = ((k * 7919) % 36000) / 100.0 - 180.0
    lat = ((k * 104729) % 17000) / 100.0 - 85.0
    eng.register_view(
        "gpts", spark.createDataFrame(pd.DataFrame({"pid": k, "lon": lon, "lat": lat}))
    )
    eng.register_view(
        "gpois",
        spark.createDataFrame(
            pd.DataFrame({"poi": [0, 1], "plon": [0.0, 100.0], "plat": [0.0, 45.0]})
        ),
    )
    got = eng.sql(
        """SELECT pid, poi FROM gpts JOIN gpois
           ON ST_DWithinSphere(ST_MakePoint(lon, lat),
                               ST_MakePoint(plon, plat), 2000000.0)"""
    ).toPandas()
    want = set()
    for poi, (plon, plat) in enumerate([(0.0, 0.0), (100.0, 45.0)]):
        d = sphere_distance(lon, lat, plon, plat)
        want |= {(int(i), poi) for i in np.flatnonzero(d <= 2000000.0)}
    assert set(zip(got.pid.astype(int), got.poi.astype(int))) == want
    assert len(want) > 5

    # scalar fallback shape (WHERE over one table, WKB constructors)
    n = spark.sql(
        """SELECT count(*) AS n FROM (
             SELECT ST_DWithinSphere(ST_MakePoint(0.0D, 0.0D),
                                     ST_MakePoint(1.0D, 1.0D),
                                     200000.0D) AS ok) WHERE ok"""
    ).collect()[0]["n"]
    assert n == 1  # ~157 km < 200 km
    row = spark.sql(
        "SELECT ST_DWithinSphere(CAST(NULL AS BINARY), "
        "ST_MakePoint(0.0D, 0.0D), 1.0D) AS v"
    ).collect()[0]
    assert row["v"] is None


def test_dwithin_sphere_filter_vs_bruteforce(spark):
    """spatial_filter('dwithin_sphere') — pushdown ladder + haversine
    refine — equals the brute-force relation, incl. a center whose cap
    crosses the antimeridian (two bbox segments)."""
    import pandas as pd

    from geomesa_sql_spark.plan import spatial_filter

    n = 5000
    k = np.arange(n, dtype=np.int64)
    lon = ((k * 7919) % 36000) / 100.0 - 180.0
    lat = ((k * 104729) % 17000) / 100.0 - 85.0
    df = spark.createDataFrame(pd.DataFrame({"pid": k, "lon": lon, "lat": lat}))
    for cx, cy, m in [(10.0, 45.0, 800_000.0), (179.8, -20.0, 600_000.0)]:
        got = (
            spatial_filter(
                df, "dwithin_sphere", f"POINT ({cx} {cy})",
                x="lon", y="lat", distance=m,
            )
            .select("pid").toPandas().pid.astype(int)
        )
        want = set(np.flatnonzero(sphere_distance(lon, lat, cx, cy) <= m).tolist())
        assert set(got) == want and len(want) > 0


def test_dwithin_sphere_where_rewrite(spark):
    """Engine.sql WHERE ST_DWithinSphere gains a sargable degree bbox
    (in-range centers) and stays exact; seam centers skip the bbox but
    still answer through the scalar UDF."""
    import pandas as pd

    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="pid")
    k = np.arange(2000, dtype=np.int64)
    lon = ((k * 7919) % 36000) / 100.0 - 180.0
    lat = ((k * 104729) % 17000) / 100.0 - 85.0
    eng.register_view(
        "wpts", spark.createDataFrame(pd.DataFrame({"pid": k, "lon": lon, "lat": lat}))
    )
    for cx, cy, m in [(10.0, 45.0, 800000.0), (179.9, 0.0, 2500000.0)]:
        got = eng.sql(
            f"""SELECT pid FROM wpts
                WHERE ST_DWithinSphere(ST_MakePoint(lon, lat),
                                       ST_GeomFromText('POINT ({cx} {cy})'),
                                       {m})"""
        ).toPandas().pid.astype(int)
        want = set(np.flatnonzero(sphere_distance(lon, lat, cx, cy) <= m).tolist())
        assert set(got) == want and len(want) > 0


def test_dwithin_sphere_filter_cell_prune(spark, sf_dir, tmp_path):
    """Over a write_geo_table layout the geodesic filter's cell ranges
    and bbox reach the parquet scan (PushedFilters), and the pruned
    result equals the unpruned (cell_col=None) oracle."""
    from geomesa_sql_spark.io.fixtures import orders_points
    from geomesa_sql_spark.io.layout import write_geo_table
    from geomesa_sql_spark.plan import spatial_filter

    path = str(tmp_path / "geo_sphere")
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    write_geo_table(pts, path)
    laid = spark.read.parquet(path)
    kw = dict(x="lon", y="lat", distance=1_500_000.0)
    pruned = spatial_filter(
        laid, "dwithin_sphere", "POINT (10.005 10.005)", **kw
    )
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters:" in plan and "cell" in plan
    got = sorted(r.o_orderkey for r in pruned.select("o_orderkey").collect())
    oracle = spatial_filter(
        laid, "dwithin_sphere", "POINT (10.005 10.005)",
        cell_col=None, **kw
    )
    want = sorted(r.o_orderkey for r in oracle.select("o_orderkey").collect())
    assert got == want and len(got) > 0


def test_knn_sphere_vs_bruteforce(spark):
    """metric='sphere' kNN (brute and adaptive) equals the numpy
    haversine top-k, incl. a seam query and a near-pole query whose
    true neighbours sit across the antimeridian / pole."""
    import pandas as pd

    from geomesa_sql_spark.join.knn import knn_join, knn_join_adaptive

    n = 3000
    rng = np.random.default_rng(23)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-88, 88, n)
    lon[:40] = rng.uniform(178.5, 180.0, 40)      # seam east
    lon[40:80] = rng.uniform(-180.0, -178.5, 40)  # seam west
    lat[80:120] = rng.uniform(86.0, 88.0, 40)     # near pole, all lons
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(n), "lon": lon, "lat": lat})
    )
    queries = [("seam", 179.9, 10.0), ("pole", 0.0, 89.5), ("mid", 5.0, 48.0)]
    k = 7

    def brute(qlon, qlat):
        d = sphere_distance(lon, lat, qlon, qlat)
        order = np.lexsort((np.arange(n), d))[:k]
        return d[order]

    for fn in (knn_join, knn_join_adaptive):
        got = fn(pts, queries, k, metric="sphere").toPandas()
        assert len(got) == k * len(queries)
        assert got.dist.max() > 1000.0  # metres, not degrees
        for qid, qlon, qlat in queries:
            gd = np.sort(got[got.query_id == qid].dist.to_numpy())
            wd = np.sort(brute(qlon, qlat))
            assert np.allclose(gd, wd, rtol=1e-9, atol=1e-6), (fn, qid)


def test_knn_sphere_large_queryset_is_loud(spark):
    from geomesa_sql_spark.join.knn import knn_join_adaptive

    pts = spark.range(10).selectExpr(
        "CAST(id AS DOUBLE) AS lon", "CAST(id AS DOUBLE) AS lat"
    )
    big = spark.range(0, 200000).selectExpr(
        "id AS query_id", "CAST(id % 360 - 180 AS DOUBLE) AS qx",
        "CAST(id % 170 - 85 AS DOUBLE) AS qy"
    )
    with pytest.raises(NotImplementedError, match="sphere"):
        knn_join_adaptive(pts, big, 3, metric="sphere")


def test_knn_sphere_small_queryset_survives_missing_stats(
    spark, monkeypatch
):
    """r5 review: _should_broadcast returns False when plan stats are
    merely UNAVAILABLE, not only when the set is large — for
    metric='sphere' (no cells fallback) a tiny query set must proceed
    through the capped collect instead of hard-failing on a stats
    quirk."""
    from geomesa_sql_spark.join import knn as knn_mod
    from geomesa_sql_spark.join import spatial as spatial_mod
    from geomesa_sql_spark.join.knn import knn_join, knn_join_adaptive

    pts = spark.range(60).selectExpr(
        "CAST(id % 12 AS DOUBLE) AS lon", "CAST(id % 7 AS DOUBLE) AS lat"
    )
    q = spark.range(3).selectExpr(
        "id AS query_id", "CAST(id * 3 AS DOUBLE) AS qx",
        "CAST(id AS DOUBLE) AS qy"
    )
    monkeypatch.setattr(spatial_mod, "_should_broadcast",
                        lambda *a, **k: False)
    got = knn_join_adaptive(pts, q, 4, metric="sphere")
    want = knn_join(
        pts,
        [(int(r.query_id), float(r.qx), float(r.qy)) for r in q.collect()],
        4,
        metric="sphere",
    )
    gk = {(r.query_id, round(r.dist, 6)) for r in got.collect()}
    wk = {(r.query_id, round(r.dist, 6)) for r in want.collect()}
    assert gk == wk and len(gk) >= 4  # 4 per query, distinct dists vary


def test_vincenty_antimeridian_exact():
    """r5 review: pairs crossing ±180 must solve exactly (wrapped L),
    not fall back to the sphere. (-179,0)-(179,0) is a 2° equatorial
    arc = a·radians(2), and the result must equal the identical
    unwrapped pair (1,0)-(-1,0) bit-for-bit."""
    d = spheroid_distance(-179.0, 0.0, 179.0, 0.0)
    assert abs(float(d[0]) - 6378137.0 * np.radians(2.0)) < 1e-2
    d2 = spheroid_distance(1.0, 0.0, -1.0, 0.0)
    assert float(d[0]) == float(d2[0])
    # and a mid-latitude seam pair vs its shifted twin (same geometry
    # rotated in longitude — geodesic length is rotation-invariant)
    a = spheroid_distance(179.5, 40.0, -179.5, 41.0)
    b = spheroid_distance(0.5, 40.0, 1.5, 41.0)
    assert abs(float(a[0]) - float(b[0])) < 1e-6


def test_sphere_area_perimeter_sql(spark):
    """ST_AreaSphere / ST_PerimeterSphere anchors: the octant polygon
    is EXACTLY 1/8 of the sphere (πR²/2, van Oosterom–Strackee solid
    angle is closed-form there); a rectangle with a hole subtracts;
    the equatorial quadrant line is πR/2 on the mean sphere."""
    from geomesa_sql_spark.functions import register_all
    from geomesa_sql_spark.geom.geodesic import AUTHALIC_RADIUS

    register_all(spark)
    row = spark.sql(
        """SELECT ST_AreaSphere(ST_GeomFromText(
                     'POLYGON ((0 0, 90 0, 0 90, 0 0))')) AS octant,
                  ST_AreaSphere(ST_GeomFromText(
                     'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0),
                               (1 1, 2 1, 2 2, 1 2, 1 1))')) AS holed,
                  ST_AreaSphere(ST_GeomFromText(
                     'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS full,
                  ST_AreaSphere(ST_GeomFromText(
                     'POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))')) AS hole_alone,
                  ST_AreaSphere(ST_GeomFromText('POINT (3 4)')) AS pt,
                  ST_AreaSphere(CAST(NULL AS BINARY)) AS nul,
                  ST_PerimeterSphere(ST_GeomFromText(
                     'LINESTRING (0 0, 90 0)')) AS quad,
                  ST_PerimeterSphere(ST_GeomFromText(
                     'LINESTRING (179 0, -179 0)')) AS seam
           """
    ).collect()[0]
    R = AUTHALIC_RADIUS
    assert abs(row["octant"] - np.pi * R * R / 2.0) < 1.0  # m² on 6e13
    assert abs(row["holed"] - (row["full"] - row["hole_alone"])) < 1e-3
    assert row["pt"] == 0.0 and row["nul"] is None
    assert abs(row["quad"] - np.pi * MEAN_RADIUS / 2.0) < 1e-6
    # haversine wraps: the 2° seam segment, not the 358° way round
    assert abs(row["seam"] - MEAN_RADIUS * np.radians(2.0)) < 1e-6
