"""From-scratch S2 cell index, pure numpy (vectorized, batch-safe).

The north rule names an "H3/S2 index" explicitly; the engine's default
layout is the equirectangular Z-order/Hilbert grid (cells/curve.py),
which plays the same join/prune role, but this module adds the *real*
S2 cell system — the quadrilateralized spherical cube with a Hilbert
curve on each face — as an alternative cell encoder for joins, tiling
and pruning. Reference behavior surface: GeoMesa's Z2 index role
(reference RexNodeTranslator.scala:170-196 compiles ST_* predicates to
index range scans); the S2 id layout and curve follow the published S2
geometry spec (s2geometry.io, "S2 Cell Hierarchy" — the 64-bit id =
3 face bits + 2·30 Hilbert position bits + trailing 1 sentinel, with
the quadratic ST↔UV projection).

Everything here is implemented from the public algorithm description,
vectorized over numpy arrays so million-row pandas-UDF batches never
loop per row (loops run over the ≤8 lookup chunks / ≤30 levels only).

Key invariants (tests/test_s2.py pins each):
- ids are canonical S2: level-0 face cells are ``(2·face+1) << 60``
  (two's-complement int64 for faces 4-5), the curve is continuous
  across face boundaries (adjacent leaf positions are spatially
  adjacent), parent/child ranges nest by ``[id-lsb+1, id+lsb-1]``.
- ``face_uv`` / ``st`` transforms are closed-form and IEEE-exact
  (ratios + sqrt + floor only), so the DuckDB oracle can replay the
  whole (face,i,j) → curve-position pipeline bit-for-bit from the same
  lookup tables (__spark_entry__._s2_leaf_sql) — the trig leg
  (lon/lat → xyz) is engine-side and pinned by pytest laws instead.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal: for each of the 4 curve orientations,
# the (i,j) sub-position visited at curve position p, and the
# orientation change applied when descending into position p.
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """Expand the 1-level traversal tables to 4 levels (1024 entries):
    index = (ij << 2) | orientation → (pos << 2) | new_orientation,
    and the inverse. Built once at import; the same arrays feed the
    DuckDB oracle literal (single source of truth)."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros_like(lookup_pos)

    def rec(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            rec(
                level + 1,
                (i << 1) + (r[idx] >> 1),
                (j << 1) + (r[idx] & 1),
                orig,
                (pos << 2) + idx,
                orient ^ _POS_TO_ORIENT[idx],
            )

    for o in range(4):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


# ------------------------------------------------------------ projections


def lonlat_to_xyz(lon, lat):
    """Degrees → unit vectors (the only trig in the pipeline)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_lonlat(x, y, z):
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def xyz_to_face_uv(x, y, z):
    """Cube-face selection + in-face (u, v) coordinates.

    Pure comparisons and divisions (no trig/norm), so the exact same
    CASE/ratio text replays in SQL. Face = axis of the largest
    |component| (+3 when that component is negative)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where((ax > ay) & (ax > az), 0, np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0, 3, 0)
    # per-face (u, v) as ratios against the major component
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(_FACE_UV_EXPR):
        m = face == f
        if not m.any():
            continue
        u[m] = ue(x[m], y[m], z[m])
        v[m] = ve(x[m], y[m], z[m])
    return face.astype(np.int64), u, v


_FACE_UV_EXPR = (
    (lambda x, y, z: y / x, lambda x, y, z: z / x),  # face 0: +x
    (lambda x, y, z: -x / y, lambda x, y, z: z / y),  # face 1: +y
    (lambda x, y, z: -x / z, lambda x, y, z: -y / z),  # face 2: +z
    (lambda x, y, z: z / x, lambda x, y, z: y / x),  # face 3: -x
    (lambda x, y, z: z / y, lambda x, y, z: -x / y),  # face 4: -y
    (lambda x, y, z: -y / z, lambda x, y, z: -x / z),  # face 5: -z
)

# face → xyz as linear functions of (u, v); the inverse of the table
# above (consistency pinned by tests/test_s2.py round trips).
_FACE_XYZ = (
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
)


def face_uv_to_xyz(face, u, v):
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, fn in enumerate(_FACE_XYZ):
        m = face == f
        if not m.any():
            continue
        x[m], y[m], z[m] = fn(u[m], v[m])
    return x, y, z


def uv_to_st(u):
    """Quadratic projection (the S2 default): equalizes cell areas."""
    u = np.asarray(u, dtype=np.float64)
    # maximum(0, ·) only guards the branch np.where discards (both
    # branches evaluate; radicands are non-negative where selected)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(0.0, 1.0 + 3.0 * u)),
        1.0 - 0.5 * np.sqrt(np.maximum(0.0, 1.0 - 3.0 * u)),
    )


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s):
    n = np.int64(1) << MAX_LEVEL
    i = np.floor(np.asarray(s, dtype=np.float64) * n).astype(np.int64)
    return np.clip(i, 0, n - 1)


# ------------------------------------------------------------ cell ids


def face_ij_to_id(face, i, j) -> np.ndarray:
    """(face, leaf i, leaf j) → leaf cell id (int64, two's complement
    for faces 4-5). The table-driven chunk walk, 8 iterations of 4
    bits — vectorized via fancy indexing into the 1024-entry table."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.int64)
    mask = np.int64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        sh = np.uint64(k * _LOOKUP_BITS)
        bits += (((i >> sh).astype(np.int64)) & mask) << (_LOOKUP_BITS + 2)
        bits += (((j >> sh).astype(np.int64)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return (n * np.uint64(2) + np.uint64(1)).astype(np.int64)


def id_to_face_ij(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Any cell id → (face, i, j) of a leaf inside it (the canonical
    ToFaceIJOrientation walk; for non-leaf cells the leaf is at the
    cell's curve-order position, see :func:`cell_center_lonlat`)."""
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros(cid.shape, dtype=np.int64)
    j = np.zeros(cid.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        chunk = (cid >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64) & (
            (1 << (2 * nbits)) - 1
        )
        bits += chunk << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def cell_lsb(cell) -> np.ndarray:
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    return cid & (~cid + np.uint64(1))


def cell_level(cell) -> np.ndarray:
    """Level from the trailing-1 sentinel position."""
    lsb = cell_lsb(cell)
    # position of the single set bit: float log2 is exact for powers of
    # two up to 2^62
    pos = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - pos // 2


def parent_id(cell, level: int) -> np.ndarray:
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((cid & ~(new_lsb - np.uint64(1))) | new_lsb).astype(np.int64)


def range_min(cell) -> np.ndarray:
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    return (cid - (cell_lsb(cell) - np.uint64(1))).astype(np.int64)


def range_max(cell) -> np.ndarray:
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    return (cid + (cell_lsb(cell) - np.uint64(1))).astype(np.int64)


def contains_id(parent, child) -> np.ndarray:
    """id-range containment; correct under two's complement because a
    cell's whole range shares the face bits (sign)."""
    pmin = range_min(parent).astype(np.uint64)
    pmax = range_max(parent).astype(np.uint64)
    c = np.asarray(child, dtype=np.int64).astype(np.uint64)
    return (pmin <= c) & (c <= pmax)


def xyz_to_leaf_id(x, y, z) -> np.ndarray:
    """Any (not necessarily unit) vector → leaf cell id. Trig-free —
    ratios + sqrt + floor + integer walk only, every step IEEE-exact,
    which is what lets the DuckDB oracle replay it bit-for-bit
    (__spark_entry__ tile_hilbert s2 leg)."""
    face, u, v = xyz_to_face_uv(x, y, z)
    return face_ij_to_id(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))


def lonlat_to_cell_id(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """Degrees → S2 cell id at ``level`` (the point-encode hot path)."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = face_ij_to_id(face, i, j)
    if level >= MAX_LEVEL:
        return leaf
    return parent_id(leaf, level)


def cell_center_lonlat(cell) -> tuple[np.ndarray, np.ndarray]:
    """Exact cell center (the canonical GetCenterSiTi correction)."""
    cid = np.asarray(cell, dtype=np.int64)
    face, i, j = id_to_face_ij(cid)
    is_leaf = (np.asarray(cid).astype(np.uint64) & np.uint64(1)) == 1
    bit = ((i ^ (cid >> 2)) & 1).astype(np.int64)
    delta = np.where(is_leaf, 1, np.where(bit == 1, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    scale = 1.0 / float(2 << MAX_LEVEL)
    u = st_to_uv(si * scale)
    v = st_to_uv(ti * scale)
    return xyz_to_lonlat(*face_uv_to_xyz(face, u, v))


def token(cell) -> np.ndarray:
    """Canonical hex tokens (trailing zeros stripped)."""
    cid = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    out = []
    for c in cid.ravel():
        h = format(int(c), "016x").rstrip("0")
        out.append(h or "X")
    return np.array(out).reshape(cid.shape)


# ------------------------------------------------------- cell lat/lng bounds


def _lat_eq(w0, w1, t0, t1):
    """Exact lat range of atan2(w, sqrt(1+t^2)) over a (w,t) box.
    For fixed w, |lat| is maximal at the t of smallest |t| and minimal
    at the largest |t| — so extremes live on the 4 corners plus the
    two t=0 edge points when the box spans t=0."""
    tmin_abs = np.where((t0 <= 0) & (t1 >= 0), 0.0, np.minimum(np.abs(t0), np.abs(t1)))
    tmax_abs = np.maximum(np.abs(t0), np.abs(t1))
    cands = [
        np.arctan2(w, np.sqrt(1.0 + t * t))
        for w in (w0, w1)
        for t in (tmin_abs, tmax_abs)
    ]
    return np.minimum.reduce(cands), np.maximum.reduce(cands)


def _rect_dist_to_origin(u0, v0, u1, v1):
    du = np.maximum(np.maximum(u0, -u1), 0.0)
    dv = np.maximum(np.maximum(v0, -v1), 0.0)
    return np.hypot(du, dv)


def _rect_max_dist(u0, v0, u1, v1):
    return np.hypot(np.maximum(np.abs(u0), np.abs(u1)), np.maximum(np.abs(v0), np.abs(v1)))


def cell_bounds_uv(face, u0, v0, u1, v1):
    """Exact lat/lng bounds (degrees) of a uv-rectangle on one face.

    Equatorial faces: lon is a monotone function of one coordinate,
    lat is the atan2(w, sqrt(1+t²)) form → closed-form extremes.
    Polar faces: lat from min/max distance to the face origin; lon
    from corner polar angles (a convex set avoiding the origin
    subtends < π, so the minimal covering arc of the corner angles is
    the exact range); a rect containing the origin wraps fully.
    Returns (lat_lo, lat_hi, lon_lo, lon_hi, full_lon) — lon interval
    may wrap (lo > hi means it crosses ±180°)."""
    face = np.asarray(face, dtype=np.int64)
    u0, v0, u1, v1 = (np.asarray(a, dtype=np.float64) for a in (u0, v0, u1, v1))
    n = u0.shape[0] if u0.ndim else 1
    lat_lo = np.empty(n)
    lat_hi = np.empty(n)
    lon_lo = np.empty(n)
    lon_hi = np.empty(n)
    full = np.zeros(n, dtype=bool)

    # --- equatorial faces: (lon_param, lon(c) fn, lat w/t mapping)
    #   face 0: lon=atan(u)            lat=(w=v, t=u)
    #   face 1: lon=atan2(1,-u)        lat=(w=v, t=u)
    #   face 3: lon=atan2(-v,-1) wraps lat=(w=-u, t=v)
    #   face 4: lon=atan2(-1, v)       lat=(w=-u, t=v)
    for f, lon_of, w_box, t_box in (
        (0, lambda c: np.arctan(c), ("v",), ("u",)),
        (1, lambda c: np.arctan2(1.0, -c), ("v",), ("u",)),
        (3, lambda c: np.arctan2(-c, -1.0), ("nu",), ("v",)),
        (4, lambda c: np.arctan2(-1.0, c), ("nu",), ("v",)),
    ):
        m = face == f
        if not m.any():
            continue
        box = {
            "u": (u0[m], u1[m]),
            "v": (v0[m], v1[m]),
            "nu": (-u1[m], -u0[m]),
        }
        w0w, w1w = box[w_box[0]]
        t0t, t1t = box[t_box[0]]
        la, lb = _lat_eq(w0w, w1w, t0t, t1t)
        lat_lo[m], lat_hi[m] = la, lb
        # lon parameter: face 0/1 → u (monotone increasing); face 3 → v
        # (atan2(-v,-1): v=-1 → +3π/4 … v=+1 → -3π/4, DEcreasing with a
        # wrap at ±π); face 4 → v (increasing)
        if f in (0, 1):
            c0, c1 = u0[m], u1[m]
        else:
            c0, c1 = v0[m], v1[m]
        a, b = lon_of(c0), lon_of(c1)
        if f == 3:
            # lon is CIRCULARLY increasing in v through the ±π wrap
            # (3π/4 → π ≡ -π → -3π/4): lo=lon(v0), hi=lon(v1); lo > hi
            # encodes the wrap exactly when the v-interval spans 0
            lon_lo[m], lon_hi[m] = a, b
        else:
            lon_lo[m], lon_hi[m] = np.minimum(a, b), np.maximum(a, b)

    # --- polar faces
    for f in (2, 5):
        m = face == f
        if not m.any():
            continue
        rmin = _rect_dist_to_origin(u0[m], v0[m], u1[m], v1[m])
        rmax = _rect_max_dist(u0[m], v0[m], u1[m], v1[m])
        if f == 2:
            lat_lo[m] = np.arctan2(1.0, rmax)
            lat_hi[m] = np.arctan2(1.0, rmin)
        else:
            lat_lo[m] = -np.arctan2(1.0, rmin)
            lat_hi[m] = -np.arctan2(1.0, rmax)
        inside = rmin == 0.0
        # corner angles per face-lon convention
        if f == 2:
            ang = lambda uu, vv: np.arctan2(-vv, -uu)  # noqa: E731
        else:
            ang = lambda uu, vv: np.arctan2(uu, vv)  # noqa: E731
        c = np.stack(
            [
                ang(u0[m], v0[m]),
                ang(u0[m], v1[m]),
                ang(u1[m], v0[m]),
                ang(u1[m], v1[m]),
            ],
            axis=0,
        )
        # minimal covering arc: sort, take complement of the largest gap
        cs = np.sort(c, axis=0)
        gaps = np.diff(np.concatenate([cs, cs[:1] + 2.0 * np.pi], axis=0), axis=0)
        gi = np.argmax(gaps, axis=0)
        idx = np.arange(cs.shape[1])
        lo = cs[(gi + 1) % 4, idx]
        hi = cs[gi, idx] + np.where(gi == 3, 2.0 * np.pi, 0.0)
        # normalize hi into (-π, π]; lo>hi then encodes the wrap
        hi = np.where(hi > np.pi, hi - 2.0 * np.pi, hi)
        lon_lo[m] = np.where(inside, -np.pi, lo)
        lon_hi[m] = np.where(inside, np.pi, hi)
        full[m] = inside

    return (
        np.degrees(lat_lo),
        np.degrees(lat_hi),
        np.degrees(lon_lo),
        np.degrees(lon_hi),
        full,
    )


def _lon_overlap(lo, hi, full, qlo: float, qhi: float):
    """Circular interval overlap (cell interval may wrap: lo > hi)."""
    plain = (lo <= hi) & (lo <= qhi) & (qlo <= hi)
    wrapped = (lo > hi) & ((qlo <= hi) | (lo <= qhi))
    return full | plain | wrapped


def cover_rect(
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
    level: int,
    max_cells: int = 4096,
) -> np.ndarray:
    """All level-``level`` S2 cells intersecting a lon/lat rectangle.

    Hierarchical subdivision from the 6 face cells with the EXACT
    per-cell lat/lng bounds above — over-inclusion is impossible beyond
    bound tightness and under-inclusion is impossible full stop (the
    bounds are supersets of the cell), so the cover is sound for join
    explode / index pruning. Raises when the cover exceeds
    ``max_cells`` (callers pick ``level`` from rect extent — silently
    dropping cells would drop join candidates, same contract as
    curve.cover_envelopes)."""
    if not (-180.0 <= minlon <= maxlon <= 180.0 and -90.0 <= minlat <= maxlat <= 90.0):
        raise ValueError("cover_rect expects a normalized lon/lat rectangle")
    faces = np.arange(6, dtype=np.int64)
    cur_face = faces
    cur_i = np.zeros(6, dtype=np.int64)
    cur_j = np.zeros(6, dtype=np.int64)
    for lvl in range(0, level + 1):
        size = np.int64(1) << (MAX_LEVEL - lvl)
        scale = 1.0 / float(np.int64(1) << MAX_LEVEL)
        u0 = st_to_uv(cur_i * scale)
        v0 = st_to_uv(cur_j * scale)
        u1 = st_to_uv((cur_i + size) * scale)
        v1 = st_to_uv((cur_j + size) * scale)
        lat_lo, lat_hi, lon_lo, lon_hi, full = cell_bounds_uv(cur_face, u0, v0, u1, v1)
        keep = (
            (lat_lo <= maxlat)
            & (minlat <= lat_hi)
            & _lon_overlap(lon_lo, lon_hi, full, minlon, maxlon)
        )
        cur_face = cur_face[keep]
        cur_i = cur_i[keep]
        cur_j = cur_j[keep]
        if lvl == level:
            break
        if len(cur_face) * 4 > max_cells * 4:
            raise ValueError(
                f"s2 cover exceeds {max_cells} cells at level {lvl}; "
                "choose a coarser level for this rect"
            )
        half = size >> 1
        cur_face = np.repeat(cur_face, 4)
        di = np.tile(np.array([0, 0, 1, 1], dtype=np.int64) * half, len(cur_i))
        dj = np.tile(np.array([0, 1, 0, 1], dtype=np.int64) * half, len(cur_j))
        cur_i = np.repeat(cur_i, 4) + di
        cur_j = np.repeat(cur_j, 4) + dj
    if len(cur_face) > max_cells:
        raise ValueError(
            f"s2 cover of {len(cur_face)} cells exceeds cap {max_cells}; "
            "choose a coarser level"
        )
    leaf = face_ij_to_id(cur_face, cur_i, cur_j)
    return np.sort(parent_id(leaf, level))


def cover_rect_ranges(
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
    max_cells: int = 64,
    max_level: int | None = None,
) -> list[tuple[int, int]]:
    """Adaptive mixed-level covering as sorted, merged id ranges
    [(range_min, range_max)] — the prune-predicate shape (cell BETWEEN
    lo AND hi OR …) an Iceberg/parquet scan consumes. Subdivides
    breadth-first until the frontier would exceed ``max_cells``,
    keeping every intersecting cell (superset guarantee as above).
    Rejects non-normalized rects like cover_rect does (review r4n: an
    inverted or antimeridian-crossing bbox would silently produce an
    under-inclusive predicate — split dateline queries into two
    rects).

    ``max_level`` caps subdivision depth and MUST be set to the stored
    column's level when pruning a level-``res`` cell column: a stored
    id is the midpoint of its own level-``res`` range, so ranges built
    from cells finer than ``res`` exclude it and the predicate silently
    drops matching rows (advice r4: a 0.001-degree bbox vs a level-10
    column subdivided to level 18 and missed everything)."""
    if not (
        -180.0 <= minlon <= maxlon <= 180.0 and -90.0 <= minlat <= maxlat <= 90.0
    ):
        raise ValueError(
            "cover_rect_ranges expects a normalized lon/lat rectangle "
            "(split antimeridian-crossing queries into two rects)"
        )
    cur_face = np.arange(6, dtype=np.int64)
    cur_i = np.zeros(6, dtype=np.int64)
    cur_j = np.zeros(6, dtype=np.int64)
    lvl = 0
    while True:
        size = np.int64(1) << (MAX_LEVEL - lvl)
        scale = 1.0 / float(np.int64(1) << MAX_LEVEL)
        lat_lo, lat_hi, lon_lo, lon_hi, full = cell_bounds_uv(
            cur_face,
            st_to_uv(cur_i * scale),
            st_to_uv(cur_j * scale),
            st_to_uv((cur_i + size) * scale),
            st_to_uv((cur_j + size) * scale),
        )
        keep = (
            (lat_lo <= maxlat)
            & (minlat <= lat_hi)
            & _lon_overlap(lon_lo, lon_hi, full, minlon, maxlon)
        )
        cur_face, cur_i, cur_j = cur_face[keep], cur_i[keep], cur_j[keep]
        floor = MAX_LEVEL if max_level is None else min(max_level, MAX_LEVEL)
        if lvl >= floor or len(cur_face) * 4 > max_cells:
            break
        half = size >> 1
        n_prev = len(cur_i)
        cur_face = np.repeat(cur_face, 4)
        cur_i = np.repeat(cur_i, 4) + np.tile(
            np.array([0, 0, 1, 1], dtype=np.int64) * half, n_prev
        )
        cur_j = np.repeat(cur_j, 4) + np.tile(
            np.array([0, 1, 0, 1], dtype=np.int64) * half, n_prev
        )
        lvl += 1
    ids = parent_id(face_ij_to_id(cur_face, cur_i, cur_j), lvl)
    lo = range_min(ids).astype(np.uint64)
    hi = range_max(ids).astype(np.uint64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    merged: list[tuple[int, int]] = []
    wall = 1 << 63  # int64 sign flip: faces 3|4 are uint64-adjacent,
    # but a merged range straddling the wall breaks signed BETWEEN
    # predicates over the id column — never merge across it
    for a, b in zip(lo.tolist(), hi.tolist()):
        if merged and a <= merged[-1][1] + 1 and not (
            merged[-1][1] < wall <= b
        ):
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    # back to signed int64 for the Column predicates
    return [
        (int(np.uint64(a).astype(np.int64)), int(np.uint64(b).astype(np.int64)))
        for a, b in merged
    ]
