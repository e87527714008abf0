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


def wkb_envelopes(blobs, strict: bool = True) -> np.ndarray:
    """(n, 4) float64 [minx, miny, maxx, maxy] per WKB buffer; NaN rows
    for NULL or empty geometries.

    Vectorized (r6, guide §4.2): buffers are grouped by byte length,
    each group stacked into one uint8 matrix, and groups whose rows all
    carry one of the uniform little-endian layouts — Point, LineString,
    single-ring Polygon (layout pinned by the length equation AND the
    header/count fields, so a row either matches exactly or falls back)
    — reduce with axis min/max over a single float64 view: zero
    per-row Python beyond ``len``. Everything else (multi-part,
    multi-ring, big-endian, EWKB, trailing bytes) takes the exact
    per-row reader. Results are bit-identical to
    ``geom_from_wkb(b).envelope()`` either way (min/max over the same
    float64 values; NaN coords propagate identically).

    ``strict=False`` maps per-row parse errors to NaN rows instead of
    raising (the render_mvt_wkb drop-malformed contract)."""
    n = len(blobs)
    out = np.full((n, 4), np.nan, dtype=np.float64)
    lens = np.empty(n, dtype=np.int64)
    for i, b in enumerate(blobs):
        lens[i] = -1 if b is None else len(b)

    def fallback(rows) -> None:
        for i in rows:
            try:
                out[i] = geom_from_wkb(bytes(blobs[i])).envelope()
            except Exception:
                if strict:
                    raise
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(slens[1:] != slens[:-1]) + 1]
    ) if n else np.zeros(0, dtype=np.int64)
    for s in starts:
        e = s + np.searchsorted(slens[s:], slens[s], side="right")
        L = int(slens[s])
        idx = order[s:e]
        if L < 0:
            continue  # NULL rows stay NaN
        if L == 21:
            gtype, off = 1, 5
        elif L >= 25 and (L - 9) % 16 == 0:
            gtype, off = 2, 9
        elif L >= 29 and (L - 13) % 16 == 0:
            gtype, off = 3, 13
        else:
            fallback(idx)
            continue
        npts = (L - off) // 16
        m = np.frombuffer(
            b"".join(bytes(blobs[i]) for i in idx), dtype=np.uint8
        ).reshape(len(idx), L)
        ok = (m[:, 0] == 1) & (m[:, 1] == gtype) & (m[:, 2:5] == 0).all(axis=1)
        if gtype >= 2:  # declared count(s) must match the length equation
            cnt = m[:, off - 4 : off].copy().view("<u4")[:, 0]
            ok &= cnt == npts
            if gtype == 3:
                nr = m[:, 5:9].copy().view("<u4")[:, 0]
                ok &= nr == 1
        good = idx[ok]
        if len(good):
            coords = (
                np.ascontiguousarray(m[ok, off:])
                .view("<f8")
                .reshape(len(good), npts, 2)
            )
            out[good, 0] = coords[:, :, 0].min(axis=1)
            out[good, 1] = coords[:, :, 1].min(axis=1)
            out[good, 2] = coords[:, :, 0].max(axis=1)
            out[good, 3] = coords[:, :, 1].max(axis=1)
        if not ok.all():
            fallback(idx[~ok])
    return out


def wkb_single_ring_polygons(blobs):
    """Vectorized ring extraction for uniform little-endian single-ring
    Polygons (the bulk shape of ingested footprint/box tables).

    Returns ``(groups, rest)``: ``groups`` is a list of
    ``(row_idx int64 array, rings float64 (g, m, 2))`` — one entry per
    distinct ring length, rows grouped by the same length-equation +
    header checks as :func:`wkb_envelopes` (a row either matches the
    layout exactly or lands in ``rest``); ``rest`` is the int64 array
    of non-NULL row indices needing the general reader (other
    geometry types, multi-ring, big-endian, EWKB, rings of < 3 points,
    trailing bytes). NULL rows appear in neither. Ring coords are
    bit-identical to ``geom_from_wkb(b).coords[0]``."""
    n = len(blobs)
    lens = np.empty(n, dtype=np.int64)
    for i, b in enumerate(blobs):
        lens[i] = -1 if b is None else len(b)
    groups: list[tuple[np.ndarray, np.ndarray]] = []
    rest: list[np.ndarray] = []
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(slens[1:] != slens[:-1]) + 1]
    ) if n else np.zeros(0, dtype=np.int64)
    for s in starts:
        e = s + np.searchsorted(slens[s:], slens[s], side="right")
        L = int(slens[s])
        idx = order[s:e]
        if L < 0:
            continue  # NULL rows: neither group nor rest
        if L < 13 + 3 * 16 or (L - 13) % 16 != 0:
            rest.append(idx)
            continue
        npts = (L - 13) // 16
        m = np.frombuffer(
            b"".join(bytes(blobs[i]) for i in idx), dtype=np.uint8
        ).reshape(len(idx), L)
        ok = (m[:, 0] == 1) & (m[:, 1] == 3) & (m[:, 2:5] == 0).all(axis=1)
        ok &= m[:, 5:9].copy().view("<u4")[:, 0] == 1
        ok &= m[:, 9:13].copy().view("<u4")[:, 0] == npts
        good = idx[ok]
        if len(good):
            rings = (
                np.ascontiguousarray(m[ok, 13:])
                .view("<f8")
                .reshape(len(good), npts, 2)
                .astype(np.float64)
            )
            groups.append((good, rings))
        if not ok.all():
            rest.append(idx[~ok])
    rest_idx = (
        np.concatenate(rest) if rest else np.zeros(0, dtype=np.int64)
    )
    return groups, rest_idx


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
