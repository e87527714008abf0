"""MVT codec (io/mvt.py) + vector-tile ops (ops/vector_tiles.py).

The encode∘decode identity over the live quantization law is ALSO
hash-gated in the driver contract (tile_assign routes through
render_mvt → mvt_stats against DuckDB's FLOOR replay); these tests pin
the codec surface the gate can't see: geometry command semantics,
ring orientation, typed properties, the bulk varint encoder, and the
per-tile Spark plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_sql_spark.io import mvt


def test_varints_bulk_matches_scalar():
    rng = np.random.default_rng(4)
    vals = np.concatenate(
        [
            rng.integers(0, 128, 50),
            rng.integers(128, 1 << 20, 50),
            rng.integers(0, 1 << 62, 50),
            np.array([0, 1, 127, 128, (1 << 64) - 1], dtype=np.uint64).astype(np.int64),
        ]
    ).astype(np.uint64)
    bulk = mvt.varints(vals)
    scalar = b"".join(mvt._varint(int(v)) for v in vals)
    assert bulk == scalar
    # and they parse back
    r = mvt._Reader(bulk)
    got = [r.varint() for _ in range(len(vals))]
    assert got == [int(v) for v in vals]


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2**62, -(2**62)], dtype=np.int64)
    z = mvt.zigzag(v)
    back = np.array([mvt._unzigzag(int(u)) for u in z])
    assert (back == v).all()


def test_point_layer_roundtrip_with_ids():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 4096, 200)
    py = rng.integers(0, 4096, 200)
    blob = mvt.encode_point_layer("pts", px, py, ids=np.arange(200), extent=4096)
    t = mvt.decode_tile(blob)
    fs = t["pts"]["features"]
    assert t["pts"]["version"] == 2 and t["pts"]["extent"] == 4096
    got = np.array([f["parts"][0][0] for f in fs])
    assert (got[:, 0] == px).all() and (got[:, 1] == py).all()
    assert [f["id"] for f in fs] == list(range(200))
    assert all(f["type"] == mvt.GEOM_POINT for f in fs)


def test_polygon_orientation_and_props():
    ext = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    hole = np.array([[20, 20], [20, 40], [40, 40], [40, 20], [20, 20]])
    feats = [
        {
            "id": 7,
            "type": mvt.GEOM_POLYGON,
            "parts": [ext, hole],
            "props": {"name": "sq", "area": 9600.0, "rank": -3, "ok": True},
        }
    ]
    t = mvt.decode_tile(mvt.encode_tile({"geo": feats}, extent=512))
    f = t["geo"]["features"][0]
    assert f["props"] == {"name": "sq", "area": 9600.0, "rank": -3, "ok": True}
    r0, r1 = f["parts"]
    # rings decode closed; spec orientation: exterior CW (positive
    # screen area), interior CCW
    assert (r0[0] == r0[-1]).all() and (r1[0] == r1[-1]).all()
    assert mvt._ring_signed_area2(r0[:-1]) > 0
    assert mvt._ring_signed_area2(r1[:-1]) < 0
    # same vertex sets as the inputs
    assert set(map(tuple, r0[:-1])) == set(map(tuple, ext[:-1]))
    assert set(map(tuple, r1[:-1])) == set(map(tuple, hole[:-1]))


def test_linestring_and_multipoint():
    line = np.array([[5, 5], [50, 60], [80, 10]])
    feats = [
        {"id": 1, "type": mvt.GEOM_LINESTRING, "parts": [line], "props": {"n": 1}},
        {"id": 2, "type": mvt.GEOM_POINT, "parts": [np.array([[7, 8], [9, 10]])],
         "props": {}},
    ]
    t = mvt.decode_tile(mvt.encode_tile({"v": feats}))
    ln = t["v"]["features"][0]["parts"][0]
    assert (ln == line).all()
    mp = t["v"]["features"][1]["parts"]
    assert [tuple(p[0]) for p in mp] == [(7, 8), (9, 10)]


def test_value_dedup_across_features():
    feats = [
        {"id": i, "type": mvt.GEOM_POINT, "parts": [np.array([[i, i]])],
         "props": {"cls": "road"}}
        for i in range(50)
    ]
    blob = mvt.encode_tile({"l": feats})
    # the shared "road" value must be stored once, not 50 times
    assert blob.count(b"road") == 1
    t = mvt.decode_tile(blob)
    assert all(f["props"] == {"cls": "road"} for f in t["l"]["features"])


def test_malformed_rejection():
    blob = mvt.encode_point_layer("p", np.array([1, 2]), np.array([3, 4]))
    for bad in [blob[:-3], b"\x1a\x05xxx", bytes([0x1a, 200]), blob + b"\xff"]:
        with pytest.raises(ValueError):
            mvt.decode_tile(bad)


def test_geometry_param_bomb_rejected():
    # MoveTo with a huge count but no parameters must raise, not hang
    words = mvt.varints(np.array([mvt._cmd(mvt.CMD_MOVE, 1 << 40)], dtype=np.uint64))
    fb = mvt._varint_field(3, mvt.GEOM_POINT) + mvt._len_field(4, words)
    layer = (
        mvt._varint_field(15, 2)
        + mvt._len_field(1, b"l")
        + mvt._len_field(2, fb)
        + mvt._varint_field(5, 4096)
    )
    with pytest.raises(ValueError, match="truncated geometry"):
        mvt.decode_tile(mvt._len_field(3, layer))


def test_render_mvt_spark_pipeline(spark):
    from geomesa_sql_spark.ops import mvt_stats, render_mvt

    df = spark.range(0, 3000).selectExpr(
        "id",
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat",
    )
    tiles = render_mvt(df, zoom=4, extent=256, id_col="id")
    pt = tiles.toPandas()
    assert pt["n_features"].sum() == 3000
    assert (pt["tile_x"] < 16).all() and (pt["tile_y"] < 16).all()
    # every blob is a valid standalone tile whose ids partition range(3000)
    seen = set()
    for blob in pt["mvt"]:
        t = mvt.decode_tile(bytes(blob))
        for f in t["points"]["features"]:
            seen.add(f["id"])
    assert seen == set(range(3000))
    # stats equal a plain quantization rollup computed in Spark SQL
    st = mvt_stats(tiles).toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    n = 16
    spanx, spany, ext = 360.0 / n, 180.0 / n, 256
    want = (
        df.selectExpr(
            f"GREATEST(0, LEAST({n-1}, CAST(FLOOR((lon + 180.0) / 360.0 * {n}) AS BIGINT))) AS tile_x",
            f"GREATEST(0, LEAST({n-1}, CAST(FLOOR((90.0 - lat) / 180.0 * {n}) AS BIGINT))) AS tile_y",
            "lon", "lat",
        )
        .selectExpr(
            "tile_x", "tile_y",
            f"GREATEST(0, LEAST({ext-1}, CAST(FLOOR((lon - (tile_x * {spanx} - 180.0)) / {spanx} * {float(ext)}) AS BIGINT))) AS px",
            f"GREATEST(0, LEAST({ext-1}, CAST(FLOOR(((90.0 - tile_y * {spany}) - lat) / {spany} * {float(ext)}) AS BIGINT))) AS py",
        )
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("px").alias("spx"),
            F.sum("py").alias("spy"),
        )
        .toPandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    assert (st[["tile_x", "tile_y", "n_rows", "spx", "spy"]].to_numpy()
            == want.to_numpy()).all()


def test_render_mvt_wkb_polygons(spark):
    """WKB polygons fan out to every covered tile; each tile's decoded
    geometry carries tile-local coords (possibly outside the extent —
    whole-geometry encoding), orientation spec-valid, ids preserved."""
    import pandas as pd

    from geomesa_sql_spark.geom.model import box
    from geomesa_sql_spark.geom.wkb import geom_to_wkb
    from geomesa_sql_spark.ops import render_mvt_wkb

    # zoom 3: 45°x22.5° tiles. A square spanning 2x2 tiles + a tiny one.
    rows = [
        (1, geom_to_wkb(box(10.0, 10.0, 50.0, 30.0))),   # crosses 45° lon and 22.5° lat
        (2, geom_to_wkb(box(-3.0, -3.0, -1.0, -1.0))),   # single tile
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["gid", "geom"]), "gid long, geom binary"
    )
    tiles = render_mvt_wkb(df, zoom=3, wkb="geom", id_col="gid").toPandas()
    # geometry 1 covers tiles x in {4,5}, y in {2,3} per the FLOOR law;
    # geometry 2 covers exactly (3, 4)
    got = {(r.tile_x, r.tile_y) for r in tiles.itertuples()}
    assert got == {(4, 2), (4, 3), (5, 2), (5, 3), (3, 4)}, got
    for r in tiles.itertuples():
        t = mvt.decode_tile(bytes(r.mvt))
        feats = t["shapes"]["features"]
        assert r.n_features == len(feats) == 1
        f = feats[0]
        assert f["type"] == mvt.GEOM_POLYGON
        ring = f["parts"][0]
        assert (ring[0] == ring[-1]).all()
        assert mvt._ring_signed_area2(ring[:-1]) > 0  # exterior CW
        if (r.tile_x, r.tile_y) == (3, 4):
            assert f["id"] == 2
            # fully inside: all coords within the extent
            assert (ring >= 0).all() and (ring < 4096).all()
        else:
            assert f["id"] == 1
    # width in pixels across the whole geometry: 40° of lon at 45°/tile
    # and 4096 px/tile → ~3641 px; check via the (4,2) tile's x-range
    r42 = next(r for r in tiles.itertuples() if (r.tile_x, r.tile_y) == (4, 2))
    ring = mvt.decode_tile(bytes(r42.mvt))["shapes"]["features"][0]["parts"][0]
    xs = ring[:, 0]
    # tile (4,2) spans lon [0,45): same FLOOR law as the encoder
    import math

    want = math.floor(50.0 / 45.0 * 4096) - math.floor(10.0 / 45.0 * 4096)
    assert xs.max() - xs.min() == want
    assert xs.max() >= 4096  # whole-geometry encoding exceeds the tile


def test_render_mvt_wkb_oversize_raises(spark):
    import pandas as pd

    from geomesa_sql_spark.geom.model import box
    from geomesa_sql_spark.geom.wkb import geom_to_wkb
    from geomesa_sql_spark.ops import render_mvt_wkb

    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, geom_to_wkb(box(-170.0, -80.0, 170.0, 80.0)))],
            columns=["gid", "geom"],
        ),
        "gid long, geom binary",
    )
    with pytest.raises(Exception, match="coarser zoom"):
        render_mvt_wkb(df, zoom=6, wkb="geom", max_tiles_per_row=16).count()


# ---- review r4l regression tests ----------------------------------


def test_hole_wound_like_exterior_still_a_hole():
    """Ring roles are positional: a hole wound the SAME way as its
    exterior must still encode as a hole (CCW), not a second filled
    polygon (r4l finding)."""
    ext_cw = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    hole_cw = np.array([[20, 20], [40, 20], [40, 40], [20, 40], [20, 20]])
    # both rings wound the SAME way (the degenerate input the old
    # winding-inference misread as two exteriors)
    a_ext = mvt._ring_signed_area2(ext_cw[:-1])
    a_hole = mvt._ring_signed_area2(hole_cw[:-1])
    assert (a_ext > 0) == (a_hole > 0)
    t = mvt.decode_tile(mvt.encode_tile({"g": [
        {"id": 1, "type": mvt.GEOM_POLYGON,
         "parts": [[ext_cw, hole_cw]], "props": {}}
    ]}))
    r0, r1 = t["g"]["features"][0]["parts"]
    assert mvt._ring_signed_area2(r0[:-1]) > 0   # exterior stays CW
    assert mvt._ring_signed_area2(r1[:-1]) < 0   # hole forced CCW


def test_multipolygon_nested_parts():
    p1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    p2 = np.array([[50, 50], [60, 50], [60, 60], [50, 60], [50, 50]])
    t = mvt.decode_tile(mvt.encode_tile({"g": [
        {"id": 1, "type": mvt.GEOM_POLYGON, "parts": [[p1], [p2]], "props": {}}
    ]}))
    rings = t["g"]["features"][0]["parts"]
    assert len(rings) == 2
    assert all(mvt._ring_signed_area2(r[:-1]) > 0 for r in rings)


def test_negative_int_property_roundtrip():
    t = mvt.decode_tile(mvt.encode_tile({"g": [
        {"id": 1, "type": mvt.GEOM_POINT, "parts": [np.array([[1, 1]])],
         "props": {"neg": -1, "big_neg": -(2**40), "pos": 7}}
    ]}))
    assert t["g"]["features"][0]["props"] == {
        "neg": -1, "big_neg": -(2**40), "pos": 7}


def test_bytes_property_rejected():
    with pytest.raises(ValueError, match="bytes"):
        mvt.encode_tile({"g": [
            {"id": 1, "type": mvt.GEOM_POINT, "parts": [np.array([[1, 1]])],
             "props": {"blob": b"\xff\xfe"}}
        ]})


def test_truncated_fixed_width_field_raises():
    # a layer with an unknown fixed64 field truncated mid-value
    inner = mvt._varint_field(15, 2) + mvt._len_field(1, b"l") + mvt._key(
        20, 1) + b"\x01\x02"  # unknown fixed64 field with only 2 bytes
    with pytest.raises(ValueError, match="truncated fixed"):
        mvt.decode_tile(mvt._len_field(3, inner + mvt._varint_field(5, 4096)))


def test_null_feature_ids_omitted(spark):
    """NULL ids (Arrow NaN) must omit the id field, never encode
    INT64_MIN garbage (r4l finding)."""
    import pandas as pd

    from geomesa_sql_spark.ops import render_mvt

    df = spark.createDataFrame(
        pd.DataFrame({"fid": [1.0, None, 3.0],
                      "lon": [1.0, 2.0, 3.0], "lat": [1.0, 2.0, 3.0]}),
        "fid long, lon double, lat double",
    )
    tiles = render_mvt(df, zoom=2, id_col="fid").toPandas()
    ids = []
    for blob in tiles["mvt"]:
        for f in mvt.decode_tile(bytes(blob))["points"]["features"]:
            ids.append(f["id"])
    assert sorted(i for i in ids if i is not None) == [1, 3]
    assert ids.count(None) == 1


def test_render_mvt_group_spans_arrow_batches(spark):
    """The mapInPandas carry must reassemble a tile whose rows span
    Arrow batch boundaries (8192-row batches)."""
    from geomesa_sql_spark.ops import mvt_stats, render_mvt

    # 20k rows all landing in ONE tile, single partition → 3 batches
    df = spark.range(0, 20000).selectExpr(
        "id",
        "10.0 + CAST(id % 100 AS DOUBLE) / 1000.0 AS lon",
        "10.0 + CAST(id % 77 AS DOUBLE) / 1000.0 AS lat",
    )
    tiles = render_mvt(df, zoom=4, id_col="id", partitions=1).toPandas()
    assert len(tiles) == 1 and tiles["n_features"].iloc[0] == 20000
    st = mvt_stats(
        spark.createDataFrame(tiles[["tile_x", "tile_y", "mvt"]])
    ).toPandas()
    assert st["n_rows"].iloc[0] == 20000


def test_render_mvt_wkb_null_and_garbage_rows_drop(spark):
    """NULL and undecodable WKB rows must vanish (r5: the isNotNull
    filter on the UDF struct was replaced by NULL-propagating tile
    bounds — least/greatest SKIP nulls, so an unguarded clamp would
    have sent bad rows to tile 0)."""
    import pandas as pd

    from geomesa_sql_spark.geom.model import box
    from geomesa_sql_spark.geom.wkb import geom_to_wkb
    from geomesa_sql_spark.ops import render_mvt_wkb

    rows = [
        (1, geom_to_wkb(box(100.0, 40.0, 101.0, 41.0))),  # one tile, not (0,0)
        (2, None),
        (3, b"\x01\x99garbage"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["gid", "geom"]), "gid long, geom binary"
    )
    tiles = render_mvt_wkb(df, zoom=3, wkb="geom", id_col="gid").toPandas()
    assert len(tiles) == 1
    assert (int(tiles.tile_x.iloc[0]), int(tiles.tile_y.iloc[0])) != (0, 0)
    assert int(tiles.n_features.iloc[0]) == 1


def test_render_mvt_wkb_group_spans_arrow_batches(spark):
    """r5 rewrite twin: the WKB leg now rides the same carry walk —
    a tile whose fanned rows span Arrow batches must still encode as
    ONE tile with every feature."""
    import pandas as pd

    from geomesa_sql_spark.geom.model import box
    from geomesa_sql_spark.geom.wkb import geom_to_wkb
    from geomesa_sql_spark.ops import render_mvt_wkb

    # 10k tiny boxes all inside one zoom-3 tile (45°x22.5°): a single
    # repartition(1) partition → two Arrow batches for the one group
    wb = geom_to_wkb(box(1.0, 1.0, 1.5, 1.5))
    df = spark.createDataFrame(
        pd.DataFrame({"gid": range(10000), "geom": [wb] * 10000}),
        "gid long, geom binary",
    ).coalesce(1)
    tiles = render_mvt_wkb(df, zoom=3, wkb="geom", id_col="gid").toPandas()
    assert len(tiles) == 1 and tiles["n_features"].iloc[0] == 10000


def test_render_mvt_typed_props(spark):
    """Optional props columns ride as typed MVT properties; NULLs
    drop from the feature's tag list."""
    import pandas as pd

    from geomesa_sql_spark.ops import render_mvt

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2, 3],
                "lon": [1.0, 2.0, 3.0],
                "lat": [1.0, 2.0, 3.0],
                "name": ["a", None, "c"],
                "score": [0.5, 1.5, None],
                "rank": [7, 8, 9],
                "ok": [True, False, True],
            }
        ),
        "fid long, lon double, lat double, name string, score double, "
        "rank long, ok boolean",
    )
    tiles = render_mvt(
        df, zoom=2, id_col="fid", props=["name", "score", "rank", "ok"]
    ).toPandas()
    got = {}
    for blob in tiles["mvt"]:
        for f in mvt.decode_tile(bytes(blob))["points"]["features"]:
            got[f["id"]] = f["props"]
    assert got[1] == {"name": "a", "score": 0.5, "rank": 7, "ok": True}
    assert got[2] == {"score": 1.5, "rank": 8, "ok": False}  # null name dropped
    assert got[3] == {"name": "c", "rank": 9, "ok": True}  # null score dropped


def test_mvt_features_roundtrip(spark):
    """Foreign-tile input surface: decode MVT blobs into feature rows;
    point lon/lat re-projection inverts the quantization to within a
    half-pixel of the original coordinates."""
    from geomesa_sql_spark.ops import mvt_features, render_mvt

    df = spark.range(0, 2000).selectExpr(
        "id",
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat",
    )
    tiles = render_mvt(df, zoom=5, id_col="id")
    feats = mvt_features(tiles, layer="points", zoom=5).toPandas()
    assert len(feats) == 2000
    assert set(feats["feature_id"]) == set(range(2000))
    assert (feats["geom_type"] == 1).all() and (feats["n_points"] == 1).all()
    orig = df.toPandas().set_index("id")
    merged = feats.set_index("feature_id").join(
        orig, lsuffix="_dec", rsuffix="_orig"
    )
    # half-pixel tolerance: span/extent/2 at zoom 5 = 11.25/4096/2
    tol = 11.25 / 4096
    assert (merged["lon_dec"] - merged["lon_orig"]).abs().max() <= tol
    assert (merged["lat_dec"] - merged["lat_orig"]).abs().max() <= tol


def test_st_as_mvt_geom_sql(spark):
    """PostGIS-parity ST_AsMVTGeom: tile-local integer coords, y-down,
    NULL/degenerate bounds → NULL."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        """SELECT ST_AsText(ST_AsMVTGeom(
               ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),
               0.0D, 0.0D, 40.0D, 40.0D, 4096)) AS t,
           ST_AsMVTGeom(CAST(NULL AS BINARY), 0D, 0D, 1D, 1D, 256) AS n,
           ST_AsMVTGeom(ST_GeomFromText('POINT (5 5)'),
                        0D, 0D, 0D, 1D, 256) AS degenerate"""
    ).first()
    assert r.n is None and r.degenerate is None
    assert "0 4096" in r.t and "1024 3072" in r.t  # y-down quantization


def test_empty_geometry_rejected():
    with pytest.raises(ValueError, match="empty geometry"):
        mvt.encode_geometry(mvt.GEOM_POINT, [np.empty((0, 2), dtype=np.int64)])
    with pytest.raises(ValueError, match="empty geometry"):
        mvt.encode_geometry(mvt.GEOM_LINESTRING, [])
    with pytest.raises(ValueError, match="empty geometry"):
        mvt.encode_geometry(
            mvt.GEOM_POLYGON, [[np.empty((0, 2), dtype=np.int64)]]
        )


def test_randomized_geometry_roundtrip_law():
    """Random mixed-type features survive encode→decode with exact
    vertex sets (rings may reverse for orientation, never mutate)."""
    rng = np.random.default_rng(123)
    for trial in range(40):
        feats = []
        for fid in range(int(rng.integers(1, 8))):
            kind = int(rng.integers(0, 3))
            if kind == 0:  # multipoint
                pts = rng.integers(-500, 4600, (int(rng.integers(1, 6)), 2))
                feats.append({"id": fid, "type": mvt.GEOM_POINT,
                              "parts": [pts], "props": {}})
            elif kind == 1:  # linestring(s)
                nparts = int(rng.integers(1, 3))
                parts = [
                    rng.integers(-500, 4600, (int(rng.integers(2, 9)), 2))
                    for _ in range(nparts)
                ]
                feats.append({"id": fid, "type": mvt.GEOM_LINESTRING,
                              "parts": parts, "props": {}})
            else:  # polygon with optional hole
                cx, cy = rng.integers(500, 3500, 2)
                w, h = rng.integers(100, 500, 2)
                ext = np.array([[cx - w, cy - h], [cx + w, cy - h],
                                [cx + w, cy + h], [cx - w, cy + h],
                                [cx - w, cy - h]])
                rings = [ext]
                if rng.integers(0, 2):
                    hw = max(1, w // 3)
                    rings.append(np.array(
                        [[cx - hw, cy - hw], [cx + hw, cy - hw],
                         [cx + hw, cy + hw], [cx - hw, cy + hw],
                         [cx - hw, cy - hw]]))
                feats.append({"id": fid, "type": mvt.GEOM_POLYGON,
                              "parts": [rings], "props": {}})
        t = mvt.decode_tile(mvt.encode_tile({"g": feats}))
        dec = t["g"]["features"]
        assert len(dec) == len(feats)
        for orig, got in zip(feats, dec):
            assert got["type"] == orig["type"]
            if orig["type"] == mvt.GEOM_POINT:
                want = {tuple(p) for p in orig["parts"][0]}
                have = {tuple(p[0]) for p in got["parts"]}
            elif orig["type"] == mvt.GEOM_LINESTRING:
                want = {tuple(v) for part in orig["parts"] for v in part}
                have = {tuple(v) for part in got["parts"] for v in part}
            else:
                want = {tuple(v) for ring in orig["parts"][0]
                        for v in ring[:-1]}
                have = {tuple(v) for ring in got["parts"] for v in ring[:-1]}
            assert want == have, (trial, orig["type"])
