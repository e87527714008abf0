"""In-memory geometry model — minimal, numpy-backed.

The reference treats all geometry as one opaque GEOMETRY SQL type backed
by JTS objects (GeoMesaTable.scala:91-98). Our model is a small tagged
union over numpy coordinate arrays; DataFrames carry geometry as WKB
``BinaryType`` columns and kernels decode per batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

POINT = "Point"
LINESTRING = "LineString"
POLYGON = "Polygon"
MULTIPOINT = "MultiPoint"
MULTILINESTRING = "MultiLineString"
MULTIPOLYGON = "MultiPolygon"
GEOMETRYCOLLECTION = "GeometryCollection"

_MULTI_OF = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING, MULTIPOLYGON: POLYGON}


@dataclass
class Geom:
    """Tagged geometry.

    ``coords`` by type:
      Point            -> (2,) float64 array
      LineString       -> (n, 2) float64 array
      Polygon          -> list[(n, 2) arrays], ring 0 = exterior, rest holes;
                          rings are closed (first == last vertex)
      Multi*/Collection-> list[Geom]
    """

    type: str
    coords: Any

    def envelope(self) -> tuple[float, float, float, float]:
        pts = self.all_coords()
        if pts.size == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    def all_coords(self) -> np.ndarray:
        """All vertices as an (n, 2) array."""
        if self.type == POINT:
            return self.coords.reshape(1, 2)
        if self.type == LINESTRING:
            return self.coords
        if self.type == POLYGON:
            return np.concatenate(self.coords) if self.coords else np.empty((0, 2))
        parts = [g.all_coords() for g in self.coords]
        return np.concatenate(parts) if parts else np.empty((0, 2))

    def flatten(self) -> list["Geom"]:
        """Decompose into simple (Point/LineString/Polygon) parts."""
        if self.type in (POINT, LINESTRING, POLYGON):
            return [self]
        out: list[Geom] = []
        for g in self.coords:
            out.extend(g.flatten())
        return out

    def dimension(self) -> int:
        if self.type == POINT or self.type == MULTIPOINT:
            return 0
        if self.type == LINESTRING or self.type == MULTILINESTRING:
            return 1
        if self.type == POLYGON or self.type == MULTIPOLYGON:
            return 2
        return max((g.dimension() for g in self.coords), default=0)

    def segments(self) -> np.ndarray:
        """All edges as (m, 4) array [x1, y1, x2, y2] (lines + rings)."""
        segs = []
        for g in self.flatten():
            if g.type == LINESTRING:
                c = g.coords
                if len(c) >= 2:
                    segs.append(np.hstack([c[:-1], c[1:]]))
            elif g.type == POLYGON:
                for ring in g.coords:
                    if len(ring) >= 2:
                        segs.append(np.hstack([ring[:-1], ring[1:]]))
        return np.concatenate(segs) if segs else np.empty((0, 4))


def point(x: float, y: float) -> Geom:
    return Geom(POINT, np.array([x, y], dtype=np.float64))


def linestring(coords) -> Geom:
    return Geom(LINESTRING, np.asarray(coords, dtype=np.float64))


def _close(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def polygon(*rings) -> Geom:
    return Geom(POLYGON, [_close(np.asarray(r, dtype=np.float64)) for r in rings])


def multi(type_: str, parts: list[Geom]) -> Geom:
    return Geom(type_, parts)


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geom:
    """Envelope polygon — the ST_MakeEnvelope constructor."""
    return polygon(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
