"""DataTypeTest parity (DataTypeTest.scala:42-97): exact Spark type and
value for every column type of the engine's mapping (SURVEY.md §1.2
table), round-tripped through the cell-clustered layout and the
GeoTable scan, plus geometry WKB→WKT identity through ST_AsText
(DriverTest.scala:96-103)."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_sql_spark.functions import register_all
from geomesa_sql_spark.geom.model import point
from geomesa_sql_spark.geom.wkb import geom_to_wkb
from geomesa_sql_spark.io.layout import write_geo_table
from geomesa_sql_spark.plan.scan import GeoTable


def test_typed_roundtrip_through_geo_layout(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("fid", T.StringType()),        # __FID__/VARCHAR
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("f", T.FloatType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),      # UTC session
            T.StructField("bin", T.BinaryType()),        # VARBINARY
            T.StructField("geom", T.BinaryType()),       # GEOMETRY as WKB
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]
    )
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45)
    rows = [
        ("a", 1, 10**12, 1.5, 2.5, True, ts, bytes([0, 1, 2, 3, 4]),
         geom_to_wkb(point(10.0, 20.0)), 10.0, 20.0),
        ("b", None, None, None, None, None, None, None, None, 0.0, 0.0),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "typed")
    write_geo_table(df, path)

    got = GeoTable(spark, path).df()
    fields = {f.name: f.dataType for f in got.schema.fields}
    for name, dt in [
        ("fid", T.StringType()), ("i", T.IntegerType()), ("l", T.LongType()),
        ("d", T.DoubleType()), ("f", T.FloatType()), ("b", T.BooleanType()),
        ("ts", T.TimestampType()), ("bin", T.BinaryType()),
        ("geom", T.BinaryType()), ("cell", T.LongType()),
    ]:
        assert fields[name] == dt, name

    r = {row.fid: row for row in got.collect()}
    a = r["a"]
    assert (a.i, a.l, a.d, a.f, a.b) == (1, 10**12, 1.5, 2.5, True)
    assert a.ts == ts                      # UTC round-trip, no local shift
    assert bytes(a.bin) == bytes([0, 1, 2, 3, 4])  # test_complex_data parity
    # all-null row (test_null_data parity) survives every stage
    n = r["b"]
    assert n.i is None and n.ts is None and n.bin is None and n.geom is None

    # GEOMETRY column → object identity via ST_AsText (DriverTest parity)
    register_all(spark)
    got.createOrReplaceTempView("typed_v")
    wkt = spark.sql(
        "SELECT ST_AsText(geom) AS w FROM typed_v WHERE fid = 'a'"
    ).first().w
    assert wkt == "POINT (10 20)"
