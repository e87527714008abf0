"""WKT parser/emitter (subset: 7 simple/multi types + collection).

Covers the constructor surface the reference tests exercise through
Calcite's spatial functions: ST_GeomFromText / ST_AsWKT / ST_AsText
(reference tests DataTypeTest.scala:73-85, FilterTest.scala:195-205).
"""

from __future__ import annotations

import re

import numpy as np

from geomesa_sql_spark.geom import model
from geomesa_sql_spark.geom.model import Geom

_TYPES = (
    "GEOMETRYCOLLECTION",
    "MULTIPOLYGON",
    "MULTILINESTRING",
    "MULTIPOINT",
    "POLYGON",
    "LINESTRING",
    "POINT",
)

_CANON = {
    "POINT": model.POINT,
    "LINESTRING": model.LINESTRING,
    "POLYGON": model.POLYGON,
    "MULTIPOINT": model.MULTIPOINT,
    "MULTILINESTRING": model.MULTILINESTRING,
    "MULTIPOLYGON": model.MULTIPOLYGON,
    "GEOMETRYCOLLECTION": model.GEOMETRYCOLLECTION,
}


def _find_balanced(s: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(f"unbalanced parentheses in WKT: {s[start:start+40]!r}")


def _coords(body: str) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        parts = tok.split()
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _rings(body: str) -> list[np.ndarray]:
    rings = []
    i = 0
    while i < len(body):
        if body[i] == "(":
            j = _find_balanced(body, i)
            rings.append(_coords(body[i + 1 : j - 1]))
            i = j
        else:
            i += 1
    return rings


def geom_from_wkt(wkt: str) -> Geom:
    s = wkt.strip()
    m = re.match(r"(?i)\s*([A-Z]+)\s*", s)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:60]!r}")
    tname = m.group(1).upper()
    if tname not in _CANON:
        raise ValueError(f"unsupported WKT type {tname!r}")
    rest = s[m.end() :].strip()
    if rest.upper().startswith("EMPTY"):
        t = _CANON[tname]
        if t == model.POINT:
            return Geom(t, np.array([np.nan, np.nan]))
        return Geom(t, [])
    if not rest.startswith("("):
        raise ValueError(f"bad WKT body: {wkt[:60]!r}")
    body = rest[1 : _find_balanced(rest, 0) - 1].strip()
    t = _CANON[tname]
    if t == model.POINT:
        return Geom(t, _coords(body)[0])
    if t == model.LINESTRING:
        return Geom(t, _coords(body))
    if t == model.POLYGON:
        return model.polygon(*_rings(body))
    if t == model.MULTIPOINT:
        # both MULTIPOINT(0 0, 1 1) and MULTIPOINT((0 0), (1 1))
        if "(" in body:
            pts = [r[0] for r in _rings(body)]
        else:
            pts = list(_coords(body))
        return Geom(t, [Geom(model.POINT, np.asarray(p)) for p in pts])
    if t == model.MULTILINESTRING:
        return Geom(t, [Geom(model.LINESTRING, r) for r in _rings(body)])
    if t == model.MULTIPOLYGON:
        parts = []
        i = 0
        while i < len(body):
            if body[i] == "(":
                j = _find_balanced(body, i)
                parts.append(model.polygon(*_rings(body[i + 1 : j - 1])))
                i = j
            else:
                i += 1
        return Geom(t, parts)
    # GEOMETRYCOLLECTION: parse sub-geometries
    parts = []
    i = 0
    while i < len(body):
        m2 = re.match(r"(?i)\s*,?\s*([A-Z]+)\s*", body[i:])
        if not m2:
            break
        sub_t = m2.group(1).upper()
        k = i + m2.end()
        if body[k:].strip().upper().startswith("EMPTY"):
            parts.append(geom_from_wkt(body[i:].strip(" ,")))
            i = k + body[k:].upper().index("EMPTY") + 5
            continue
        j = _find_balanced(body, body.index("(", k))
        parts.append(geom_from_wkt(body[i:j].strip(" ,")))
        i = j
        del sub_t
    return Geom(t, parts)


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt_num(p[0])} {_fmt_num(p[1])}" for p in arr)


def geom_to_wkt(g: Geom) -> str:
    t = g.type
    if t == model.POINT:
        if np.isnan(g.coords).any():
            return "POINT EMPTY"
        return f"POINT ({_fmt_num(g.coords[0])} {_fmt_num(g.coords[1])})"
    if t == model.LINESTRING:
        return f"LINESTRING ({_fmt_coords(g.coords)})"
    if t == model.POLYGON:
        rings = ", ".join(f"({_fmt_coords(r)})" for r in g.coords)
        return f"POLYGON ({rings})"
    if t == model.MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(
            f"({_fmt_num(p.coords[0])} {_fmt_num(p.coords[1])})" for p in g.coords
        ) + ")"
    if t == model.MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(
            f"({_fmt_coords(l.coords)})" for l in g.coords
        ) + ")"
    if t == model.MULTIPOLYGON:
        polys = []
        for p in g.coords:
            polys.append("(" + ", ".join(f"({_fmt_coords(r)})" for r in p.coords) + ")")
        return "MULTIPOLYGON (" + ", ".join(polys) + ")"
    return "GEOMETRYCOLLECTION (" + ", ".join(geom_to_wkt(s) for s in g.coords) + ")"
