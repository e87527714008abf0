"""GeoJSONL source/sink (io/geojson.py): round-trip, malformed-line
tolerance, flatten inference, ST_ surface interop."""

import json

from pyspark.sql import functions as F

from geomesa_sql_spark.geom import model
from geomesa_sql_spark.geom.geojson import geom_from_geojson, geom_to_geojson
from geomesa_sql_spark.geom.wkb import geom_from_wkb, geom_to_wkb
from geomesa_sql_spark.io.geojson import read_geojsonl, write_geojsonl


def _src_df(spark):
    rows = [
        (0, bytes(geom_to_wkb(model.point(1.0, 2.0))), "alpha", 10),
        (1, bytes(geom_to_wkb(model.box(0.0, 0.0, 2.0, 2.0))), "beta", 20),
        (2, None, "gamma", 30),
    ]
    return spark.createDataFrame(rows, "fid int, geom binary, name string, score int")


def test_write_read_round_trip(spark, tmp_path):
    path = str(tmp_path / "gj")
    write_geojsonl(_src_df(spark), path)
    out = read_geojsonl(spark, path)
    rows = {r.fid: r for r in out.collect()}
    assert set(out.columns) == {"id", "geom", "fid", "name", "score"}
    assert len(rows) == 3
    g = geom_from_wkb(bytes(rows[0].geom))
    assert g.type == "Point" and tuple(g.coords) == (1.0, 2.0)
    assert geom_from_wkb(bytes(rows[1].geom)).envelope() == (0.0, 0.0, 2.0, 2.0)
    assert rows[2].geom is None and rows[2].name == "gamma"


def test_lines_are_valid_single_features(spark, tmp_path):
    path = str(tmp_path / "gj")
    write_geojsonl(_src_df(spark), path, id_col="fid")
    lines = [
        json.loads(ln)
        for p in (tmp_path / "gj").glob("part-*")
        for ln in p.read_text().splitlines()
    ]
    assert len(lines) == 3
    by_id = {f["id"]: f for f in lines}
    assert by_id[0]["type"] == "Feature"
    assert by_id[0]["geometry"]["type"] == "Point"
    assert by_id[2]["geometry"] is None
    assert by_id[1]["properties"] == {"name": "beta", "score": 20}
    assert "fid" not in by_id[1]["properties"]  # promoted to Feature id


def test_malformed_and_bare_geometry_lines(spark, tmp_path):
    p = tmp_path / "hand.jsonl"
    p.write_text(
        '{"type":"Point","coordinates":[3,4]}\n'
        "not json at all\n"
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[5,6]},'
        '"properties":{"k":1}}\n'
    )
    out = read_geojsonl(spark, str(p), flatten=False).collect()
    assert len(out) == 3
    geoms = [None if r.geom is None else geom_from_wkb(bytes(r.geom)) for r in out]
    coords = sorted(tuple(g.coords) for g in geoms if g is not None)
    assert coords == [(3.0, 4.0), (5.0, 6.0)]
    assert sum(g is None for g in geoms) == 1


def test_st_surface_on_read_result(spark, tmp_path):
    path = str(tmp_path / "gj")
    write_geojsonl(_src_df(spark), path)
    from geomesa_sql_spark.functions.st import register_all

    register_all(spark)
    read_geojsonl(spark, path).createOrReplaceTempView("gj")
    got = {
        r.fid: r.a
        for r in spark.sql(
            "SELECT fid, ST_Area(geom) AS a FROM gj ORDER BY fid"
        ).collect()
    }
    assert got == {0: 0.0, 1: 4.0, 2: None}


def test_streaming_read_matches_batch(spark, tmp_path):
    """readStream over a GeoJSONL directory (available-now drain)
    produces exactly the batch parse of the same files."""
    src = tmp_path / "stream_src"
    src.mkdir()
    for part in range(3):
        lines = "\n".join(
            '{"type":"Feature","geometry":{"type":"Point","coordinates":[%d,%d]},'
            '"properties":{"k":%d}}' % (i, part, i)
            for i in range(part * 4, part * 4 + 4)
        )
        (src / f"f{part}.geojsonl").write_text(lines + "\n")
    stream = read_geojsonl(spark, str(src), stream=True)
    assert stream.isStreaming and stream.columns == ["id", "geom", "properties"]
    q = (
        stream.writeStream.format("memory").queryName("gj_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (geom_from_wkb(bytes(r.geom)).coords[0], json.loads(r.properties)["k"])
        for r in spark.table("gj_stream").collect()
    }
    want = {
        (geom_from_wkb(bytes(r.geom)).coords[0], json.loads(r.properties)["k"])
        for r in read_geojsonl(spark, str(src), flatten=False).collect()
    }
    assert got == want and len(got) == 12


def test_geojson_text_converter_parity():
    g = model.box(1.0, 1.0, 3.0, 5.0)
    assert geom_from_geojson(geom_to_geojson(g)).envelope() == g.envelope()


def test_flatten_dotted_and_colliding_property_names(spark, tmp_path):
    """Dotted property names are literal fields, not nested paths; a
    property named like a reserved output column gets a unique alias
    (review r3c)."""
    p = tmp_path / "dotty.geojsonl"
    p.write_text(
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,1]},'
        '"properties":{"user.name":"bob","id":7,"prop_id":8}}\n'
    )
    out = read_geojsonl(spark, str(p))
    row = out.collect()[0]
    assert row["user.name"] == "bob"
    # property "id" collides with the Feature-id column, then with the
    # existing prop_id property → pushed to prop_prop_id
    assert row["prop_id"] == 8 and row["prop_prop_id"] == 7
    assert len(out.columns) == len(set(out.columns))


def test_write_id_col_validation_and_odd_names(spark, tmp_path):
    df = spark.createDataFrame([(1, None)], "`feature id` int, geom binary")
    path = str(tmp_path / "odd")
    write_geojsonl(df, path, id_col="feature id")
    feats = [
        json.loads(ln)
        for p in (tmp_path / "odd").glob("part-*")
        for ln in p.read_text().splitlines()
    ]
    assert feats[0]["id"] == 1 and feats[0]["properties"] == {}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no id column"):
        write_geojsonl(df, path, id_col="nope")
