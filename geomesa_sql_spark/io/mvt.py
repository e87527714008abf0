"""From-scratch Mapbox Vector Tile (MVT 2.1) codec, numpy + stdlib.

The tiling engine's vector-side handoff: render_tiles emits raster
GeoTIFFs; this module emits the standard vector-tile payload (the
format every slippy-map client and tile server speaks). Implemented
from the published spec (github.com/mapbox/vector-tile-spec, 2.1):
protobuf wire format (varints, zigzag, length-delimited messages) and
the command-encoded geometry stream (MoveTo/LineTo/ClosePath with
zigzag-delta parameters against a running cursor).

Scope: POINT / LINESTRING / POLYGON features with typed properties
(string/double/int/bool), multi-geometries, ring-orientation
enforcement per spec §4.3.4.4 (exterior CW in screen coords via the
surveyor's formula), and a full decoder for foreign tiles (used by the
tests as the round-trip twin and by ops.mvt_stats). Coordinates may
legally exceed [0, extent) — clipping is the producer's choice; the
engine encodes whole geometries per covering tile and lets renderers
buffer, like most tile servers.

The point hot path is vectorized: command/zigzag words for all point
features in a tile are computed as one numpy pass and serialized by a
bulk varint encoder (no per-byte Python). Per-feature framing is a
Python loop — that is per FEATURE, not per coordinate, and runs inside
one Arrow batch per tile.
"""

from __future__ import annotations

import struct

import numpy as np

# wire types
_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5

CMD_MOVE = 1
CMD_LINE = 2
CMD_CLOSE = 7

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


# ----------------------------------------------------------- varint plumbing


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varints_counts(arr: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Bulk varint-encode a uint64 array (one numpy pass: per-value
    byte counts → byte matrix → mask → ravel). Also returns the
    per-value encoded byte count (the batch encoders use it to compute
    field offsets without re-walking the stream)."""
    a = np.asarray(arr, dtype=np.uint64).ravel()
    if a.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # number of 7-bit groups per value (>=1)
    nb = np.ones(a.shape, dtype=np.int64)
    t = a >> np.uint64(7)
    while t.any():
        nb += (t != 0).astype(np.int64)
        t >>= np.uint64(7)
    maxb = int(nb.max())
    mat = np.zeros((a.size, maxb), dtype=np.uint8)
    t = a.copy()
    for k in range(maxb):
        mat[:, k] = (t & np.uint64(0x7F)).astype(np.uint8)
        t >>= np.uint64(7)
    idx = np.arange(maxb)
    cont = idx[None, :] < (nb[:, None] - 1)
    mat |= cont.astype(np.uint8) << 7
    keep = idx[None, :] < nb[:, None]
    return mat[keep].tobytes(), nb


def varints(arr: np.ndarray) -> bytes:
    """Bulk varint-encode a uint64 array."""
    return varints_counts(arr)[0]


def zigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _key(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, _LEN) + _varint(len(payload)) + payload


def _varint_field(field: int, v: int) -> bytes:
    return _key(field, _VARINT) + _varint(v)


# -------------------------------------------------------------- value typing


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _varint_field(7, int(v))
    if isinstance(v, (int, np.integer)):
        v = int(v)
        return _key(6, _VARINT) + varints(zigzag(np.array([v])))
    if isinstance(v, (float, np.floating)):
        return _key(3, _I64) + struct.pack("<d", float(v))
    if isinstance(v, bytes):
        # MVT 2.1 has no bytes value type; silently stuffing raw bytes
        # into string_value makes the tile's own decode raise
        # UnicodeDecodeError (review r4l) — reject loudly instead
        raise ValueError(
            "mvt: bytes property values are not representable in MVT 2.1 "
            "(hex-encode or drop the column)"
        )
    return _len_field(1, str(v).encode("utf-8"))


# ----------------------------------------------------------------- geometry


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _ring_signed_area2(xy: np.ndarray) -> float:
    """2× surveyor's area in SCREEN coords (y down): positive = CW on
    screen, which the spec requires for exterior rings."""
    x, y = xy[:, 0].astype(np.float64), xy[:, 1].astype(np.float64)
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def encode_geometry(geom_type: int, parts) -> np.ndarray:
    """Command-word stream (uint64 array, pre-varint) for one feature.

    ``parts``: for POINT one (n,2) array (n>1 = multipoint); for
    LINESTRING each part a (n,2) path; for POLYGON a list of POLYGONS,
    each a list of rings with ring 0 the exterior (a flat list of
    arrays is accepted as one polygon). Ring roles are POSITIONAL —
    the spec's orientation rule (exterior CW in screen coords, holes
    CCW) is ENFORCED from the structure, never inferred from input
    winding (review r4l: a hole wound like its exterior must not
    become a second filled polygon)."""
    if not parts or any(len(p) == 0 for p in (
        parts if parts and isinstance(parts[0], np.ndarray)
        else [r for poly in parts for r in poly]
    )):
        raise ValueError(
            "mvt: empty geometry (a MoveTo with count 0 is spec-invalid)"
        )
    words: list[np.ndarray] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = parts[0].astype(np.int64)
        d = np.diff(np.vstack([[[cx, cy]], pts]), axis=0)
        words.append(np.array([_cmd(CMD_MOVE, len(pts))], dtype=np.uint64))
        words.append(zigzag(d.ravel()))
        return np.concatenate(words)
    if geom_type == GEOM_POLYGON:
        polygons = (
            [parts] if parts and isinstance(parts[0], np.ndarray) else parts
        )
        ring_iter = [
            (ring, hole_idx > 0)
            for poly in polygons
            for hole_idx, ring in enumerate(poly)
        ]
    else:
        ring_iter = [(p, False) for p in parts]
    for part, is_hole in ring_iter:
        p = part.astype(np.int64)
        if geom_type == GEOM_POLYGON:
            # drop a duplicated closing vertex; ClosePath implies it
            if len(p) > 1 and (p[0] == p[-1]).all():
                p = p[:-1]
            area2 = _ring_signed_area2(p)
            want_pos = not is_hole  # exterior CW (positive screen area)
            if (area2 >= 0) != want_pos:
                p = p[::-1]
        d = np.diff(np.vstack([[[cx, cy]], p]), axis=0)
        words.append(np.array([_cmd(CMD_MOVE, 1)], dtype=np.uint64))
        words.append(zigzag(d[:1].ravel()))
        if len(p) > 1:
            words.append(np.array([_cmd(CMD_LINE, len(p) - 1)], dtype=np.uint64))
            words.append(zigzag(d[1:].ravel()))
        if geom_type == GEOM_POLYGON:
            words.append(np.array([_cmd(CMD_CLOSE, 1)], dtype=np.uint64))
        cx, cy = int(p[-1, 0]), int(p[-1, 1])
    return np.concatenate(words)


# ------------------------------------------------------- batched encode (r6)


def _seg_positions(starts: np.ndarray, runs: np.ndarray) -> np.ndarray:
    """Flat index array: for each segment i the run
    starts[i], starts[i]+1, …, starts[i]+runs[i]-1, concatenated —
    the scatter/gather backbone of the batch encoder (one cumsum, no
    per-segment Python)."""
    runs = np.asarray(runs, dtype=np.int64)
    total = int(runs.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    keep = runs > 0
    starts = np.asarray(starts, dtype=np.int64)[keep]
    runs = runs[keep]
    out = np.ones(total, dtype=np.int64)
    out[0] = starts[0]
    ends = np.cumsum(runs)
    out[ends[:-1]] = starts[1:] - (starts[:-1] + runs[:-1] - 1)
    return np.cumsum(out)


def encode_polygon_features_batch(
    q: np.ndarray,
    ids: np.ndarray | None = None,
    id_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Wrapped Feature messages for ``g`` single-ring polygons with no
    properties — BYTE-IDENTICAL to :func:`encode_layer`'s per-feature
    section (tag-2 wrapper + Feature{id?, type=POLYGON, geometry}) but
    one numpy pass per stage instead of ~10 small-array numpy calls
    per feature (guide §4.2; the per-feature shape was the
    render_mvt_wkb encode stage's throughput ceiling).

    ``q``: (g, m, 2) int64 tile-local coords, m >= 3; a duplicated
    closing vertex is dropped exactly like encode_geometry, and ring
    orientation is enforced from the same signed area (integer-valued
    float64 products, exact, so the flip decision is bit-identical).
    ``ids``: optional (g,) int64; ``id_mask`` marks rows WITH an id
    (None = all, when ids given). Returns (uint8 buffer, (g+1,) int64
    per-feature offsets into it)."""
    q = np.asarray(q, dtype=np.int64)
    g, m, _ = q.shape
    if m < 3:
        raise ValueError("batch encoder needs rings of >= 3 points")
    closed = (q[:, 0, :] == q[:, -1, :]).all(axis=1)
    geom_len = np.zeros(g, dtype=np.int64)
    sub_results = []
    for mask, mm in ((closed, m - 1), (~closed, m)):
        idx = np.flatnonzero(mask)
        if not len(idx):
            continue
        p = q[idx, :mm, :]
        x = p[:, :, 0].astype(np.float64)
        y = p[:, :, 1].astype(np.float64)
        xr = np.roll(x, -1, axis=1)
        yr = np.roll(y, -1, axis=1)
        # 2× signed screen area; coords are integers, so every product
        # and partial sum is exact in float64 and the comparison
        # matches _ring_signed_area2 regardless of summation order
        area2 = (x * yr - xr * y).sum(axis=1)
        flip = area2 < 0  # exterior rings want CW (area2 >= 0)
        pf = p.copy()
        pf[flip] = pf[flip, ::-1, :]
        d = np.empty_like(pf)
        d[:, 0, :] = pf[:, 0, :]
        d[:, 1:, :] = pf[:, 1:, :] - pf[:, :-1, :]
        zz = zigzag(d.reshape(len(idx), 2 * mm))
        w = np.empty((len(idx), 2 * mm + 3), dtype=np.uint64)
        w[:, 0] = _cmd(CMD_MOVE, 1)
        w[:, 1:3] = zz[:, :2]
        w[:, 3] = _cmd(CMD_LINE, mm - 1)
        w[:, 4 : 4 + 2 * (mm - 1)] = zz[:, 2:]
        w[:, -1] = _cmd(CMD_CLOSE, 1)
        gb, cnt = varints_counts(w.ravel())
        lens = cnt.reshape(len(idx), -1).sum(axis=1)
        geom_len[idx] = lens
        sub_results.append((idx, np.frombuffer(gb, dtype=np.uint8), lens))
    # per-feature field byte budgets
    glen_pre, glen_cnt = varints_counts(geom_len.astype(np.uint64))
    id_part = np.zeros(g, dtype=np.int64)
    if ids is not None:
        ids = np.asarray(ids, dtype=np.int64)
        if id_mask is None:
            id_mask = np.ones(g, dtype=bool)
        idv, idc = varints_counts(ids[id_mask].astype(np.uint64))
        id_cnt = np.zeros(g, dtype=np.int64)
        id_cnt[id_mask] = idc
        id_part[id_mask] = 1 + idc  # 0x08 key + varint(id)
    fb_len = id_part + 2 + 1 + glen_cnt + geom_len  # type + geom fields
    fbl_pre, fbl_cnt = varints_counts(fb_len.astype(np.uint64))
    feat_total = 1 + fbl_cnt + fb_len  # 0x12 wrapper + length + body
    offs = np.concatenate([[0], np.cumsum(feat_total)])
    buf = np.empty(int(offs[-1]), dtype=np.uint8)
    s_wrap = offs[:-1]
    s_fbl = s_wrap + 1
    s_id = s_fbl + fbl_cnt
    s_type = s_id + id_part
    s_gkey = s_type + 2
    s_glen = s_gkey + 1
    s_geom = s_glen + glen_cnt
    buf[s_wrap] = 0x12  # key(2, LEN): Layer.features
    buf[_seg_positions(s_fbl, fbl_cnt)] = np.frombuffer(fbl_pre, dtype=np.uint8)
    if ids is not None and id_mask.any():
        buf[s_id[id_mask]] = 0x08  # key(1, VARINT): Feature.id
        buf[_seg_positions(s_id[id_mask] + 1, idc)] = np.frombuffer(
            idv, dtype=np.uint8
        )
    buf[s_type] = 0x18  # key(3, VARINT): Feature.type
    buf[s_type + 1] = GEOM_POLYGON
    buf[s_gkey] = 0x22  # key(4, LEN): Feature.geometry
    buf[_seg_positions(s_glen, glen_cnt)] = np.frombuffer(
        glen_pre, dtype=np.uint8
    )
    for idx, gb, lens in sub_results:
        buf[_seg_positions(s_geom[idx], lens)] = gb
    return buf, offs


def encode_feature_wrapped(fid, gtype: int, parts) -> bytes:
    """One wrapped no-properties Feature message (the scalar fallback
    of the batch encoder — byte-identical to encode_layer's per-feature
    section for props={})."""
    fb = bytearray()
    if fid is not None:
        fb += _varint_field(1, int(fid))
    fb += _varint_field(3, int(gtype))
    fb += _len_field(4, varints(encode_geometry(int(gtype), parts)))
    return _len_field(2, bytes(fb))


def encode_tile_from_features(
    name: str, features_payload: bytes, extent: int = 4096
) -> bytes:
    """One Tile message wrapping a no-properties Layer whose feature
    section bytes are already encoded (the batch encoder's output) —
    byte-identical to ``encode_tile({name: feats}, extent)`` for
    features without props."""
    body = bytearray()
    body += _varint_field(15, 2)  # version
    body += _len_field(1, name.encode("utf-8"))
    body += features_payload
    body += _varint_field(5, extent)
    return bytes(_len_field(3, bytes(body)))


# ------------------------------------------------------------------- encode


def encode_layer(
    name: str,
    features: list[dict],
    extent: int = 4096,
) -> bytes:
    """One Layer message. Each feature:
    ``{"id": int|None, "type": GEOM_*, "parts": [np.ndarray(n,2)],
    "props": {k: v}}`` with tile-local integer coords."""
    keys: list = []
    key_idx: dict = {}
    vals: list = []
    val_idx: dict = {}
    body = bytearray()
    body += _varint_field(15, 2)  # version
    body += _len_field(1, name.encode("utf-8"))
    feat_blobs = []
    for f in features:
        tags = []
        for k, v in (f.get("props") or {}).items():
            if v is None:
                continue
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vk = (type(v).__name__, v)
            if vk not in val_idx:
                val_idx[vk] = len(vals)
                vals.append(v)
            tags += [key_idx[k], val_idx[vk]]
        fb = bytearray()
        if f.get("id") is not None:
            fb += _varint_field(1, int(f["id"]))
        if tags:
            fb += _len_field(2, varints(np.array(tags, dtype=np.uint64)))
        fb += _varint_field(3, int(f["type"]))
        fb += _len_field(4, varints(encode_geometry(int(f["type"]), f["parts"])))
        feat_blobs.append(bytes(fb))
    for k in keys:
        body += _len_field(3, k.encode("utf-8"))
    for v in vals:
        body += _len_field(4, _encode_value(v))
    for fb in feat_blobs:
        body += _len_field(2, fb)
    body += _varint_field(5, extent)
    return bytes(body)


def encode_tile(layers: dict[str, list[dict]], extent: int = 4096) -> bytes:
    out = bytearray()
    for name, feats in layers.items():
        out += _len_field(3, encode_layer(name, feats, extent))
    return bytes(out)


def encode_point_layer(
    name: str,
    px: np.ndarray,
    py: np.ndarray,
    ids=None,
    extent: int = 4096,
) -> bytes:
    """Vectorized fast path: one POINT feature per row. All command
    words for all features are computed in one numpy pass; only the
    protobuf framing loops per feature. ``ids`` may carry NULLs
    (pandas NA / NaN — Arrow delivers NULL longs as float NaN): those
    features omit the optional id field, per the pd.isna UDF rule."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    n = len(px)
    id_mask = None
    if ids is not None:
        import pandas as pd

        isna = pd.isna(ids)
        id_mask = ~np.asarray(isna)
        ids = np.where(id_mask, np.asarray(pd.Series(ids).fillna(0)), 0).astype(
            np.int64
        )
    move = np.uint64(_cmd(CMD_MOVE, 1))
    words = np.empty((n, 3), dtype=np.uint64)
    words[:, 0] = move
    words[:, 1] = zigzag(px)
    words[:, 2] = zigzag(py)
    body = bytearray()
    body += _varint_field(15, 2)
    body += _len_field(1, name.encode("utf-8"))
    type_f = _varint_field(3, GEOM_POINT)
    for i in range(n):
        geo = varints(words[i])
        fb = bytearray()
        if ids is not None and id_mask[i]:
            fb += _varint_field(1, int(ids[i]))
        fb += type_f
        fb += _len_field(4, geo)
        body += _len_field(2, bytes(fb))
    body += _varint_field(5, extent)
    return _len_field(3, bytes(body))


# ------------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def varint(self) -> int:
        r = 0
        sh = 0
        while True:
            if self.pos >= len(self.b):
                raise ValueError("mvt: truncated varint")
            c = self.b[self.pos]
            self.pos += 1
            r |= (c & 0x7F) << sh
            if not (c & 0x80):
                return r
            sh += 7
            if sh > 63:
                raise ValueError("mvt: varint too long")

    def bytes_(self) -> bytes:
        ln = self.varint()
        if ln < 0 or self.pos + ln > len(self.b):
            raise ValueError("mvt: truncated length-delimited field")
        out = self.b[self.pos : self.pos + ln]
        self.pos += ln
        return out

    def skip(self, wt: int) -> None:
        if wt == _VARINT:
            self.varint()
        elif wt == _I64:
            if self.pos + 8 > len(self.b):
                raise ValueError("mvt: truncated fixed64 field")
            self.pos += 8
        elif wt == _LEN:
            self.bytes_()
        elif wt == _I32:
            if self.pos + 4 > len(self.b):
                raise ValueError("mvt: truncated fixed32 field")
            self.pos += 4
        else:
            raise ValueError(f"mvt: unknown wire type {wt}")

    def fields(self):
        while self.pos < len(self.b):
            key = self.varint()
            yield key >> 3, key & 0x7


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _decode_value(buf: bytes):
    r = _Reader(buf)
    for f, wt in r.fields():
        if f == 1:
            return r.bytes_().decode("utf-8")
        if f == 2:
            if r.pos + 4 > len(r.b):
                raise ValueError("mvt: truncated float value")
            v = struct.unpack("<f", r.b[r.pos : r.pos + 4])[0]
            r.pos += 4
            return v
        if f == 3:
            if r.pos + 8 > len(r.b):
                raise ValueError("mvt: truncated double value")
            v = struct.unpack("<d", r.b[r.pos : r.pos + 8])[0]
            r.pos += 8
            return v
        if f == 4:
            # int_value is a signed 64-bit varint: reinterpret the
            # raw two's-complement word (review r4l: -1 decoded as
            # 2^64-1 from foreign tiles)
            v = r.varint()
            return v - (1 << 64) if v >= (1 << 63) else v
        if f == 5:
            return r.varint()
        if f == 6:
            return _unzigzag(r.varint())
        if f == 7:
            return bool(r.varint())
        r.skip(wt)
    return None


def _decode_geometry(words: list[int]):
    """Command stream → list of (n,2) absolute-coordinate parts; a
    closed ring repeats its first vertex so round trips are explicit."""
    parts = []
    cx = cy = 0
    i = 0
    while i < len(words):
        cmd = words[i] & 0x7
        count = words[i] >> 3
        i += 1
        if cmd in (CMD_MOVE, CMD_LINE) and i + 2 * count > len(words):
            raise ValueError("mvt: truncated geometry parameter stream")
        if cmd == CMD_MOVE:
            for _ in range(count):
                cx += _unzigzag(words[i])
                cy += _unzigzag(words[i + 1])
                i += 2
                parts.append([(cx, cy)])
        elif cmd == CMD_LINE:
            if not parts:
                raise ValueError("mvt: LineTo before MoveTo")
            for _ in range(count):
                cx += _unzigzag(words[i])
                cy += _unzigzag(words[i + 1])
                i += 2
                parts[-1].append((cx, cy))
        elif cmd == CMD_CLOSE:
            if not parts:
                raise ValueError("mvt: ClosePath before MoveTo")
            parts[-1].append(tuple(parts[-1][0]))
        else:
            raise ValueError(f"mvt: unknown geometry command {cmd}")
    return [np.array(p, dtype=np.int64) for p in parts]


def _decode_feature(buf: bytes, keys: list[str], vals: list) -> dict:
    r = _Reader(buf)
    out = {"id": None, "type": None, "parts": [], "props": {}}
    tags: list[int] = []
    for f, wt in r.fields():
        if f == 1:
            out["id"] = r.varint()
        elif f == 2:
            tr = _Reader(r.bytes_())
            while tr.pos < len(tr.b):
                tags.append(tr.varint())
        elif f == 3:
            out["type"] = r.varint()
        elif f == 4:
            gr = _Reader(r.bytes_())
            words = []
            while gr.pos < len(gr.b):
                words.append(gr.varint())
            out["parts"] = _decode_geometry(words)
        else:
            r.skip(wt)
    if len(tags) % 2:
        raise ValueError("mvt: odd tag count")
    for k_i, v_i in zip(tags[::2], tags[1::2]):
        if k_i >= len(keys) or v_i >= len(vals):
            raise ValueError("mvt: tag index out of range")
        out["props"][keys[k_i]] = vals[v_i]
    return out


def decode_tile(buf: bytes) -> dict[str, dict]:
    """Full tile decode → {layer: {"extent": int, "version": int,
    "features": [feature dicts]}}. Strict: malformed streams raise
    ValueError (codec-hardening convention, io/errors.py)."""
    layers: dict[str, dict] = {}
    r = _Reader(bytes(buf))
    for f, wt in r.fields():
        if f != 3:
            r.skip(wt)
            continue
        lr = _Reader(r.bytes_())
        name = None
        extent = 4096
        version = None
        keys: list[str] = []
        vals: list = []
        feat_bufs: list[bytes] = []
        for lf, lwt in lr.fields():
            if lf == 15:
                version = lr.varint()
            elif lf == 1:
                name = lr.bytes_().decode("utf-8")
            elif lf == 2:
                feat_bufs.append(lr.bytes_())
            elif lf == 3:
                keys.append(lr.bytes_().decode("utf-8"))
            elif lf == 4:
                vals.append(_decode_value(lr.bytes_()))
            elif lf == 5:
                extent = lr.varint()
            else:
                lr.skip(lwt)
        if name is None:
            raise ValueError("mvt: layer without a name")
        if version not in (1, 2):
            raise ValueError(f"mvt: unsupported layer version {version}")
        layers[name] = {
            "extent": extent,
            "version": version,
            "features": [_decode_feature(fb, keys, vals) for fb in feat_bufs],
        }
    return layers
