"""Pure GeoJSON (RFC 7946, 2D) ↔ Geom converters.

Shared by the SQL surface (functions/st.py: ST_AsGeoJSON /
ST_GeomFromGeoJSON) and the file source (io/geojson.py). Z values in
input coordinates are dropped (engine is 2D — SURVEY.md §1.2).
"""

from __future__ import annotations

import json

import numpy as np

from geomesa_sql_spark.geom import model as _m
from geomesa_sql_spark.geom.model import Geom


def _gj_coords(g: Geom):
    if g.type == _m.POINT:
        return [float(g.coords[0]), float(g.coords[1])]
    if g.type == _m.LINESTRING:
        return [[float(x), float(y)] for x, y in np.asarray(g.coords)]
    if g.type == _m.POLYGON:
        return [
            [[float(x), float(y)] for x, y in np.asarray(r)] for r in g.coords
        ]
    return [_gj_coords(p) for p in g.coords]


def geom_to_geojson(g: Geom) -> str:
    """Geom → compact GeoJSON geometry-object text."""
    if g.type == _m.GEOMETRYCOLLECTION:
        return json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [json.loads(geom_to_geojson(p)) for p in g.coords],
            },
            separators=(",", ":"),
        )
    return json.dumps(
        {"type": g.type, "coordinates": _gj_coords(g)}, separators=(",", ":")
    )


def geom_from_geojson(obj) -> Geom:
    """GeoJSON geometry object (parsed dict, or JSON text) → Geom."""
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    t = obj["type"]
    if t == "GeometryCollection":
        return Geom(
            _m.GEOMETRYCOLLECTION, [geom_from_geojson(p) for p in obj["geometries"]]
        )
    c = obj["coordinates"]
    if t == _m.POINT:
        return Geom(_m.POINT, np.asarray(c[:2], dtype=np.float64))
    if t == _m.LINESTRING:
        return Geom(_m.LINESTRING, np.asarray([p[:2] for p in c], dtype=np.float64))
    if t == _m.POLYGON:
        return Geom(
            _m.POLYGON,
            [np.asarray([p[:2] for p in r], dtype=np.float64) for r in c],
        )
    part_type = {
        _m.MULTIPOINT: _m.POINT,
        _m.MULTILINESTRING: _m.LINESTRING,
        _m.MULTIPOLYGON: _m.POLYGON,
    }.get(t)
    if part_type is None:
        raise ValueError(f"unknown GeoJSON type {t!r}")
    return Geom(
        t,
        [geom_from_geojson({"type": part_type, "coordinates": pc}) for pc in c],
    )
