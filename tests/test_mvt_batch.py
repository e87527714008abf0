"""Byte-identity of the r6 batched MVT polygon encoder against the
scalar encode_layer path (the batch path must be a pure speedup:
same blobs, same decode)."""

import numpy as np
import pytest

from geomesa_sql_spark.geom.model import box
from geomesa_sql_spark.geom.wkb import (
    geom_to_wkb,
    wkb_envelopes,
    wkb_single_ring_polygons,
    geom_from_wkb,
)
from geomesa_sql_spark.io import mvt


def _rings(rng, g, m=5):
    base = rng.randint(-2000, 266000, size=(g, 2))
    w = rng.randint(1, 3000, size=(g, 2))
    rings = np.empty((g, m, 2), dtype=np.int64)
    rings[:, 0] = base
    rings[:, 1] = base + np.column_stack([w[:, 0], np.zeros(g, int)])
    rings[:, 2] = base + w
    rings[:, 3] = base + np.column_stack([np.zeros(g, int), w[:, 1]])
    rings[:, 4] = base
    flip = rng.rand(g) < 0.5  # mixed winding: orientation enforcement
    rings[flip] = rings[flip, ::-1, :]
    open_mask = rng.rand(g) < 0.3  # some rings without the closing dup
    rings[open_mask, -1, 0] += 1
    return rings


def test_batch_features_byte_identical_to_encode_layer():
    rng = np.random.RandomState(11)
    g = 300
    rings = _rings(rng, g)
    ids = rng.randint(0, 2**40, size=g)
    id_mask = rng.rand(g) < 0.9  # NULL ids omit the field
    feats = [
        {
            "id": int(ids[i]) if id_mask[i] else None,
            "type": mvt.GEOM_POLYGON,
            "parts": [[rings[i]]],
            "props": {},
        }
        for i in range(g)
    ]
    want = mvt.encode_tile({"shapes": feats}, extent=4096)
    buf, offs = mvt.encode_polygon_features_batch(rings, ids, id_mask)
    got = mvt.encode_tile_from_features("shapes", buf.tobytes(), 4096)
    assert want == got
    # and without ids entirely
    want2 = mvt.encode_tile(
        {"s": [dict(f, id=None) for f in feats]}, extent=4096
    )
    buf2, _ = mvt.encode_polygon_features_batch(rings, None)
    assert mvt.encode_tile_from_features("s", buf2.tobytes(), 4096) == want2


def test_encode_feature_wrapped_matches_layer_section():
    rng = np.random.RandomState(3)
    ring = _rings(rng, 1)[0]
    feats = [
        {"id": 7, "type": mvt.GEOM_POLYGON, "parts": [[ring]], "props": {}}
    ]
    want = mvt.encode_tile({"z": feats}, extent=512)
    got = mvt.encode_tile_from_features(
        "z",
        bytes(mvt.encode_feature_wrapped(7, mvt.GEOM_POLYGON, [[ring]])),
        512,
    )
    assert want == got


def test_wkb_single_ring_polygons_grouping_and_rest():
    from geomesa_sql_spark.geom import model
    from geomesa_sql_spark.geom.model import Geom

    b1 = geom_to_wkb(box(0, 0, 2, 3))
    ring = np.asarray([(0, 0), (4, 0), (4, 3), (0, 3), (1, 1), (0, 0)], float)
    b2 = geom_to_wkb(Geom(model.POLYGON, [ring]))  # 6-pt ring: own group
    hole = Geom(
        model.POLYGON,
        [
            np.asarray([(0, 0), (9, 0), (9, 9), (0, 9), (0, 0)], float),
            np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], float),
        ],
    )
    b3 = geom_to_wkb(hole)  # multi-ring → rest
    b4 = geom_to_wkb(Geom(model.POINT, np.array([1.0, 2.0])))  # point → rest
    blobs = [b1, None, b2, b3, b4, b1]
    groups, rest = wkb_single_ring_polygons(blobs)
    covered = sorted(int(i) for g_, _ in groups for i in g_)
    assert covered == [0, 2, 5]
    assert sorted(int(i) for i in rest) == [3, 4]
    for g_, rings in groups:
        for j, i in enumerate(g_):
            np.testing.assert_array_equal(
                rings[j], geom_from_wkb(blobs[i]).coords[0]
            )


def test_wkb_envelopes_matches_reader():
    from geomesa_sql_spark.geom import model
    from geomesa_sql_spark.geom.model import Geom

    rng = np.random.RandomState(5)
    blobs = [
        geom_to_wkb(box(a, b, a + 1, b + 2))
        for a, b in rng.uniform(-80, 80, size=(50, 2))
    ]
    blobs += [
        None,
        geom_to_wkb(Geom(model.POINT, np.array([3.0, -4.0]))),
        geom_to_wkb(
            Geom(model.LINESTRING, np.asarray([(0, 0), (5, 1), (2, 9)], float))
        ),
        geom_to_wkb(
            Geom(
                model.MULTIPOINT,
                [Geom(model.POINT, np.array([1.0, 1.0])),
                 Geom(model.POINT, np.array([8.0, -2.0]))],
            )
        ),
    ]
    env = wkb_envelopes(blobs)
    for i, b in enumerate(blobs):
        if b is None:
            assert np.isnan(env[i]).all()
            continue
        assert tuple(env[i]) == geom_from_wkb(b).envelope()
    with pytest.raises(Exception):
        wkb_envelopes([b"\x01\x03garbage-not-wkb-garbage!!"], strict=True)
    assert np.isnan(
        wkb_envelopes([b"\x01\x03garbage-not-wkb-garbage!!"], strict=False)
    ).all()
