"""SQL-surface parity: the reference exposes Calcite's fun=spatial ST_*
names over SQL (jdbc/Driver.scala:51-56, tests GeoMesaCalciteTestUtils
.scala:64,86); register_all gives spark.sql the same names backed by
the vectorized kernels."""

from pyspark.sql import functions as F

from geomesa_sql_spark.functions import register_all


def test_st_astext_geomfromtext_roundtrip(spark):
    register_all(spark)
    wkts = [
        "POINT (10.5 -3.25)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "MULTIPOINT ((1 1), (2 2))",
    ]
    df = spark.createDataFrame([(w,) for w in wkts], "wkt string")
    df.createOrReplaceTempView("wkts")
    got = spark.sql(
        "SELECT wkt, ST_AsText(ST_GeomFromText(wkt)) AS rt FROM wkts"
    ).collect()
    for r in got:
        assert r.rt == r.wkt


def test_st_predicates_sql_vs_column(spark, sf_dir):
    from geomesa_sql_spark.io.fixtures import orders_points
    from geomesa_sql_spark.plan import spatial_filter

    register_all(spark)
    pts = orders_points(spark, sf_dir)
    pts.createOrReplaceTempView("pts_sql")
    poly = "POLYGON ((-10.005 -10.005, 50.005 -10.005, 50.005 40.005, -10.005 40.005, -10.005 -10.005))"
    via_sql = spark.sql(
        f"""SELECT o_orderkey FROM pts_sql
            WHERE ST_Within(ST_MakePoint(lon, lat), ST_GeomFromText('{poly}'))"""
    )
    via_col = spatial_filter(pts, "within", poly, x="lon", y="lat").select("o_orderkey")
    a = {r[0] for r in via_sql.collect()}
    b = {r[0] for r in via_col.collect()}
    assert a == b and len(a) > 0


def test_st_distance_envelope_sql(spark):
    register_all(spark)
    df = spark.sql(
        """SELECT ST_Distance(ST_GeomFromText('POINT (0 0)'),
                              ST_GeomFromText('POINT (3 4)')) AS d,
                  ST_Envelope(ST_GeomFromText(
                      'POLYGON ((1 2, 5 2, 5 9, 1 9, 1 2))')) AS env"""
    ).first()
    assert abs(df.d - 5.0) < 1e-12
    assert (df.env.minx, df.env.miny, df.env.maxx, df.env.maxy) == (1.0, 2.0, 5.0, 9.0)
