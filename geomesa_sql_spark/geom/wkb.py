"""OGC WKB codec (little-endian, 2D, types 1-7).

DataFrame geometry columns are WKB ``BinaryType``; this is the boundary
codec between Spark rows and the numpy kernel. The reference ships
geometry as JTS objects over JDBC (GeoMesaPrepareImpl.scala:44-71); WKB
is the portable equivalent for a columnar engine.
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_sql_spark.geom import model
from geomesa_sql_spark.geom.model import Geom

_CODE = {
    model.POINT: 1,
    model.LINESTRING: 2,
    model.POLYGON: 3,
    model.MULTIPOINT: 4,
    model.MULTILINESTRING: 5,
    model.MULTIPOLYGON: 6,
    model.GEOMETRYCOLLECTION: 7,
}
_TYPE = {v: k for k, v in _CODE.items()}


def geom_to_wkb(g: Geom) -> bytes:
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _write(g: Geom, out: bytearray) -> None:
    out += b"\x01"
    out += struct.pack("<I", _CODE[g.type])
    t = g.type
    if t == model.POINT:
        out += struct.pack("<2d", float(g.coords[0]), float(g.coords[1]))
    elif t == model.LINESTRING:
        out += struct.pack("<I", len(g.coords))
        out += np.ascontiguousarray(g.coords, dtype="<f8").tobytes()
    elif t == model.POLYGON:
        out += struct.pack("<I", len(g.coords))
        for ring in g.coords:
            out += struct.pack("<I", len(ring))
            out += np.ascontiguousarray(ring, dtype="<f8").tobytes()
    else:
        out += struct.pack("<I", len(g.coords))
        for sub in g.coords:
            _write(sub, out)


_EWKB_SRID_FLAG = 0x20000000


def geom_to_ewkb(g: Geom, srid: int) -> bytes:
    """PostGIS-style EWKB: the top-level header carries the SRID flag +
    a 4-byte SRID. srid=0 degenerates to plain WKB (matching PostGIS
    ST_SetSRID(g, 0))."""
    plain = geom_to_wkb(g)
    if not srid:
        return plain
    return (
        plain[:1]
        + struct.pack("<I", struct.unpack_from("<I", plain, 1)[0] | _EWKB_SRID_FLAG)
        + struct.pack("<i", srid)
        + plain[5:]
    )


def wkb_srid(buf: bytes) -> int:
    """SRID of an (E)WKB buffer — 0 when untagged (Calcite/PostGIS
    ST_SRID default)."""
    if len(buf) < 5:
        return 0
    fmt = "<" if buf[0] == 1 else ">"
    code = struct.unpack_from(fmt + "I", buf, 1)[0]
    if code & _EWKB_SRID_FLAG:
        return struct.unpack_from(fmt + "i", buf, 5)[0]
    return 0


def geom_from_wkb(buf: bytes) -> Geom:
    g, _ = _read(memoryview(buf), 0)
    return g


def _read(mv: memoryview, off: int) -> tuple[Geom, int]:
    little = mv[off] == 1
    fmt = "<" if little else ">"
    raw = struct.unpack_from(fmt + "I", mv, off + 1)[0]
    code = raw & 0xFF
    off += 5
    if raw & _EWKB_SRID_FLAG:
        off += 4  # EWKB: skip the embedded SRID
    t = _TYPE[code]
    if t == model.POINT:
        x, y = struct.unpack_from(fmt + "2d", mv, off)
        return Geom(t, np.array([x, y], dtype=np.float64)), off + 16
    if t == model.LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2)
        return Geom(t, arr.astype(np.float64)), off + 16 * n
    if t == model.POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off).reshape(
                n, 2
            )
            rings.append(arr.astype(np.float64))
            off += 16 * n
        return Geom(t, rings), off
    (np_,) = struct.unpack_from(fmt + "I", mv, off)
    off += 4
    parts = []
    for _ in range(np_):
        sub, off = _read(mv, off)
        parts.append(sub)
    return Geom(t, parts), off
