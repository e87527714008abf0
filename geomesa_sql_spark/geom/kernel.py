"""Vectorized geometry predicates — pure numpy.

Implements the predicate surface the reference exposes through Calcite's
spatial operator table and pushes into GeoMesa filters
(RexNodeTranslator.scala:170-196): ST_Intersects, ST_Equals, ST_Crosses,
ST_Contains, ST_Overlaps, ST_Touches, ST_Within, ST_DWithin — planar
(coordinate-unit) semantics, exactly like the reference
(EnumerableSpatialJoinEnumerator.scala:106-109 expands envelopes in
coordinate units, no geodesic math anywhere).

Two API tiers:
- hot path: ``points_*`` functions — one geometry vs an *array* of
  points (x[], y[]), fully vectorized; this serves point datasets kept
  as lon/lat double columns (no WKB decode at all).
- general path: ``relate(a, b, pred)`` — pairwise Geom vs Geom used by
  the spatial join refine step on candidate pairs after cell pruning.

Boundary semantics follow JTS/DE-9IM where the reference's test fixtures
exercise them: ``contains``/``within`` require an interior-interior
intersection (boundary-only contact is NOT contains), ``intersects``
includes boundary contact. ``crosses``/``overlaps``/``touches`` are
implemented for the type combinations the reference tests (point/line/
polygon and their multis over the F4×F5 fixtures); exotic combinations
raise NotImplementedError rather than silently guessing.
"""

from __future__ import annotations

import numpy as np

from geomesa_sql_spark.geom import model
from geomesa_sql_spark.geom.model import Geom

EPS = 0.0  # exact arithmetic for on-boundary tests (fixtures are exact)


# ---------------------------------------------------------------- primitives


def envelope(g: Geom) -> tuple[float, float, float, float]:
    return g.envelope()


def _env_disjoint(a: Geom, b: Geom, pad: float = 0.0) -> bool:
    ax0, ay0, ax1, ay1 = a.envelope()
    bx0, by0, bx1, by1 = b.envelope()
    return ax1 + pad < bx0 or bx1 + pad < ax0 or ay1 + pad < by0 or by1 + pad < ay0


def _pip_rings(x: np.ndarray, y: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd (crossing-number) point-in-polygon over closed rings.

    Holes are handled by parity: a point inside the exterior and inside
    a hole crosses an even number of edges. Boundary points are NOT
    reliably classified here — use :func:`_points_on_segs` for that.
    """
    inside = np.zeros(len(x), dtype=bool)
    for ring in rings:
        if len(ring) < 4:
            continue
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        # (n_pts, n_edges) broadcasting; edge straddles the ray iff the
        # endpoints are on opposite sides of the horizontal line at y
        yp = y[:, None]
        xp = x[:, None]
        cond = (y1[None, :] > yp) != (y2[None, :] > yp)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (yp - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            )
        crossings = (cond & (xp < xint)).sum(axis=1)
        inside ^= (crossings % 2).astype(bool)
    return inside


def _points_on_segs(x: np.ndarray, y: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """True where point i lies exactly on any segment (incl. endpoints)."""
    if len(segs) == 0:
        return np.zeros(len(x), dtype=bool)
    d = _point_seg_dist_matrix(x, y, segs)
    return (d <= EPS).any(axis=1)


def _point_seg_dist_matrix(x: np.ndarray, y: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(n_pts, n_segs) matrix of point→segment distances."""
    p = np.stack([x, y], axis=1)[:, None, :]  # (n,1,2)
    a = segs[None, :, 0:2]  # (1,m,2)
    b = segs[None, :, 2:4]
    ab = b - a
    ap = p - a
    denom = (ab * ab).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(denom > 0, (ap * ab).sum(-1) / denom, 0.0)
    t = np.clip(t, 0.0, 1.0)
    closest = a + t[..., None] * ab
    diff = p - closest
    return np.sqrt((diff * diff).sum(-1))


def _orient(ax, ay, bx, by, cx, cy):
    """Sign of cross product (b-a) x (c-a); broadcasts."""
    return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _seg_seg_intersect_matrix(sa: np.ndarray, sb: np.ndarray, proper: bool = False):
    """(len(sa), len(sb)) bool matrix of segment intersections.

    ``proper=True`` counts only transversal crossings through interiors
    (used for the contains/crosses interior tests); ``proper=False``
    counts any shared point, including endpoint touches and collinear
    overlap.
    """
    if len(sa) == 0 or len(sb) == 0:
        return np.zeros((len(sa), len(sb)), dtype=bool)
    ax, ay, bx, by = (sa[:, i][:, None] for i in range(4))
    cx, cy, dx, dy = (sb[:, i][None, :] for i in range(4))
    d1 = _orient(cx, cy, dx, dy, ax, ay)
    d2 = _orient(cx, cy, dx, dy, bx, by)
    d3 = _orient(ax, ay, bx, by, cx, cy)
    d4 = _orient(ax, ay, bx, by, dx, dy)
    strict = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper:
        return strict
    # collinear / endpoint-touch cases: any orient zero with bbox overlap
    def _on(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx)
            & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry)
            & (ry <= np.maximum(py, qy))
        )

    touch = (
        ((d1 == 0) & _on(cx, cy, dx, dy, ax, ay))
        | ((d2 == 0) & _on(cx, cy, dx, dy, bx, by))
        | ((d3 == 0) & _on(ax, ay, bx, by, cx, cy))
        | ((d4 == 0) & _on(ax, ay, bx, by, dx, dy))
    )
    return strict | touch


def _seg_seg_dist_min(sa: np.ndarray, sb: np.ndarray) -> float:
    """Min distance between two segment sets."""
    if len(sa) == 0 or len(sb) == 0:
        return np.inf
    if _seg_seg_intersect_matrix(sa, sb).any():
        return 0.0
    d1 = _point_seg_dist_matrix(sa[:, 0], sa[:, 1], sb).min()
    d2 = _point_seg_dist_matrix(sa[:, 2], sa[:, 3], sb).min()
    d3 = _point_seg_dist_matrix(sb[:, 0], sb[:, 1], sa).min()
    d4 = _point_seg_dist_matrix(sb[:, 2], sb[:, 3], sa).min()
    return float(min(d1, d2, d3, d4))


# --------------------------------------------------------- point hot path


def points_in_polygon(
    x: np.ndarray, y: np.ndarray, poly: Geom, boundary: str = "include"
) -> np.ndarray:
    """Vectorized PIP for Polygon / MultiPolygon.

    boundary='include' → ST_Intersects/ST_Covers semantics for points;
    boundary='exclude' → strict interior (ST_Contains(poly, pt)).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rings: list[np.ndarray] = []
    for part in poly.flatten():
        if part.type != model.POLYGON:
            raise ValueError("points_in_polygon needs polygonal geometry")
        rings.extend(part.coords)
    inside = _pip_rings(x, y, rings)
    segs = poly.segments()
    on_b = _points_on_segs(x, y, segs)
    if boundary == "include":
        return inside | on_b
    return inside & ~on_b


def points_intersect_geom(x: np.ndarray, y: np.ndarray, g: Geom) -> np.ndarray:
    """point INTERSECTS g, vectorized over points."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.zeros(len(x), dtype=bool)
    for part in g.flatten():
        if part.type == model.POINT:
            out |= (x == part.coords[0]) & (y == part.coords[1])
        elif part.type == model.LINESTRING:
            out |= _points_on_segs(x, y, part.segments())
        else:
            out |= points_in_polygon(x, y, part, boundary="include")
    return out


def points_to_geom_dist(x: np.ndarray, y: np.ndarray, g: Geom) -> np.ndarray:
    """Planar distance from each point to g (0 inside polygons)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    best = np.full(len(x), np.inf)
    for part in g.flatten():
        if part.type == model.POINT:
            d = np.hypot(x - part.coords[0], y - part.coords[1])
        else:
            segs = part.segments()
            d = (
                _point_seg_dist_matrix(x, y, segs).min(axis=1)
                if len(segs)
                else np.full(len(x), np.inf)
            )
            if part.type == model.POLYGON:
                d = np.where(_pip_rings(x, y, part.coords), 0.0, d)
        best = np.minimum(best, d)
    return best


# ------------------------------------------------------------ pairwise relate


def _rep_point(g: Geom) -> tuple[float, float]:
    """A point in the interior of a polygon (centroid fallback: sample)."""
    if g.type == model.POLYGON:
        ring = g.coords[0]
        cx, cy = float(ring[:-1, 0].mean()), float(ring[:-1, 1].mean())
        if _pip_rings(np.array([cx]), np.array([cy]), g.coords)[0]:
            return cx, cy
        # centroid outside (concave/holed): sample midpoints of a diagonal fan
        x0, y0, x1, y1 = g.envelope()
        for t in np.linspace(0.25, 0.75, 41):
            px, py = x0 + (x1 - x0) * t, y0 + (y1 - y0) * t
            if _pip_rings(np.array([px]), np.array([py]), g.coords)[0]:
                return float(px), float(py)
    pts = g.all_coords()
    return float(pts[0, 0]), float(pts[0, 1])


def _interior_samples(g: Geom) -> np.ndarray:
    """Vertices + segment midpoints — proxy sample of a 1D geometry."""
    pts = [g.all_coords()]
    segs = g.segments()
    if len(segs):
        pts.append(np.stack([(segs[:, 0] + segs[:, 2]) / 2, (segs[:, 1] + segs[:, 3]) / 2], 1))
    return np.concatenate(pts)


def _poly_rings(g: Geom) -> list[np.ndarray]:
    rings = []
    for p in g.flatten():
        if p.type == model.POLYGON:
            rings.extend(p.coords)
    return rings


def _strictly_inside(pts: np.ndarray, poly: Geom) -> np.ndarray:
    rings = _poly_rings(poly)
    inside = _pip_rings(pts[:, 0], pts[:, 1], rings)
    on_b = _points_on_segs(pts[:, 0], pts[:, 1], poly.segments())
    return inside & ~on_b


def _covered_by_poly(pts: np.ndarray, poly: Geom) -> np.ndarray:
    rings = _poly_rings(poly)
    inside = _pip_rings(pts[:, 0], pts[:, 1], rings)
    on_b = _points_on_segs(pts[:, 0], pts[:, 1], poly.segments())
    return inside | on_b


def intersects(a: Geom, b: Geom) -> bool:
    if _env_disjoint(a, b):
        return False
    for pa in a.flatten():
        for pb in b.flatten():
            if _simple_intersects(pa, pb):
                return True
    return False


def _simple_intersects(a: Geom, b: Geom) -> bool:
    ta, tb = a.type, b.type
    if ta != model.POINT and tb == model.POINT:
        return _simple_intersects(b, a)
    if ta == model.POINT:
        x = np.array([a.coords[0]])
        y = np.array([a.coords[1]])
        return bool(points_intersect_geom(x, y, b)[0])
    if ta == model.LINESTRING and tb == model.LINESTRING:
        return bool(_seg_seg_intersect_matrix(a.segments(), b.segments()).any())
    if ta == model.LINESTRING and tb == model.POLYGON:
        line, poly = a, b
    elif ta == model.POLYGON and tb == model.LINESTRING:
        line, poly = b, a
    else:  # polygon / polygon
        va = a.all_coords()
        vb = b.all_coords()
        if _covered_by_poly(va, b).any() or _covered_by_poly(vb, a).any():
            return True
        return bool(_seg_seg_intersect_matrix(a.segments(), b.segments()).any())
    verts = line.all_coords()
    if _covered_by_poly(verts, poly).any():
        return True
    return bool(_seg_seg_intersect_matrix(line.segments(), poly.segments()).any())


def distance(a: Geom, b: Geom) -> float:
    if intersects(a, b):
        return 0.0
    best = np.inf
    for pa in a.flatten():
        for pb in b.flatten():
            best = min(best, _simple_distance(pa, pb))
    return float(best)


def _simple_distance(a: Geom, b: Geom) -> float:
    if a.type == model.POINT:
        return float(points_to_geom_dist(np.array([a.coords[0]]), np.array([a.coords[1]]), b)[0])
    if b.type == model.POINT:
        return _simple_distance(b, a)
    # inside-ness already handled by intersects() in distance(); here only
    # boundary-to-boundary remains, except a polygon fully containing the
    # other geometry without touching (covered by intersects → dist 0).
    return _seg_seg_dist_min(a.segments(), b.segments())


def _line_boundary_pts(g: Geom) -> np.ndarray:
    """Mod-2 boundary points of g's line parts (JTS: a closed ring has
    an EMPTY boundary; an endpoint shared by an even number of parts is
    interior — review r3: the naive all-endpoints set misclassified
    closed-ring closure vertices as boundary in contains/touches)."""
    counts: dict[tuple, int] = {}
    for p in g.flatten():
        if p.type != model.LINESTRING or len(p.coords) == 0:
            continue
        pts = p.coords
        if bool((pts[0] == pts[-1]).all()):
            continue
        for q in (pts[0], pts[-1]):
            k = (float(q[0]), float(q[1]))
            counts[k] = counts.get(k, 0) + 1
    odd = [k for k, v in counts.items() if v % 2 == 1]
    return np.array(odd, dtype=np.float64).reshape(-1, 2)


def contains(a: Geom, b: Geom) -> bool:
    """JTS contains: every point of b in a, interiors intersect."""
    if _env_disjoint(a, b):
        return False
    ax0, ay0, ax1, ay1 = a.envelope()
    bx0, by0, bx1, by1 = b.envelope()
    if bx0 < ax0 or by0 < ay0 or bx1 > ax1 or by1 > ay1:
        return False
    if a.dimension() == 2:
        samples = _interior_samples(b) if b.dimension() >= 1 else b.all_coords()
        if not _covered_by_poly(samples, a).all():
            return False
        # no proper crossing of b's edges through a's boundary
        if _seg_seg_intersect_matrix(b.segments(), a.segments(), proper=True).any():
            return False
        # interior-interior requirement
        if b.dimension() == 2:
            rx, ry = _rep_point(b.flatten()[0])
            return bool(_strictly_inside(np.array([[rx, ry]]), a)[0])
        return bool(_strictly_inside(samples, a).any())
    if a.dimension() == 1:
        if b.dimension() == 0:
            pts = b.all_coords()
            segs = a.segments()
            if not _points_on_segs(pts[:, 0], pts[:, 1], segs).all():
                return False
            # boundary of a line = its MOD-2 endpoints; a point equal
            # to one is boundary-contact only → not contained
            ends = _line_boundary_pts(a)
            if len(ends):
                interior = ~(
                    (pts[:, None, 0] == ends[None, :, 0])
                    & (pts[:, None, 1] == ends[None, :, 1])
                ).any(axis=1)
            else:
                interior = np.ones(len(pts), dtype=bool)
            return bool(interior.any())
        if b.dimension() == 1:
            samples = _interior_samples(b)
            return bool(_points_on_segs(samples[:, 0], samples[:, 1], a.segments()).all())
        return False
    # a is point(s)
    pa = a.all_coords()
    pb = b.all_coords()
    return b.dimension() == 0 and all(
        ((pa[:, 0] == q[0]) & (pa[:, 1] == q[1])).any() for q in pb
    )


def within(a: Geom, b: Geom) -> bool:
    return contains(b, a)


def geom_equals(a: Geom, b: Geom) -> bool:
    if a.envelope() != b.envelope() or a.dimension() != b.dimension():
        return False
    d = a.dimension()
    if d == 0:
        pa = {tuple(p) for p in a.all_coords()}
        pb = {tuple(p) for p in b.all_coords()}
        return pa == pb
    if d == 1:
        sa = _interior_samples(a)
        sb = _interior_samples(b)
        return bool(
            _points_on_segs(sa[:, 0], sa[:, 1], b.segments()).all()
            and _points_on_segs(sb[:, 0], sb[:, 1], a.segments()).all()
        )
    return contains(a, b) and contains(b, a)


def _interiors_intersect(a: Geom, b: Geom) -> bool:
    da, db = a.dimension(), b.dimension()
    if da == 2 and db == 2:
        if _seg_seg_intersect_matrix(a.segments(), b.segments(), proper=True).any():
            return True
        for pa in a.flatten():
            rx, ry = _rep_point(pa)
            if _strictly_inside(np.array([[rx, ry]]), b).any():
                return True
        for pb in b.flatten():
            rx, ry = _rep_point(pb)
            if _strictly_inside(np.array([[rx, ry]]), a).any():
                return True
        # vertex of one strictly inside the other
        if _strictly_inside(a.all_coords(), b).any():
            return True
        return bool(_strictly_inside(b.all_coords(), a).any())
    if da == 2 or db == 2:
        poly, other = (a, b) if da == 2 else (b, a)
        if other.dimension() == 0:
            pts = other.all_coords()
            return bool(_strictly_inside(pts, poly).any())
        samples = _interior_samples(other)
        if _strictly_inside(samples, poly).any():
            return True
        return bool(
            _seg_seg_intersect_matrix(other.segments(), poly.segments(), proper=True).any()
        )
    if da == 1 and db == 1:
        if _seg_seg_intersect_matrix(a.segments(), b.segments(), proper=True).any():
            return True
        # collinear overlap: midpoint of one seg on the other's interior
        sa = _interior_samples(a)
        ends_b = _line_boundary_pts(b)
        on_b = _points_on_segs(sa[:, 0], sa[:, 1], b.segments())
        if len(ends_b):
            at_end = (
                (sa[:, None, 0] == ends_b[None, :, 0])
                & (sa[:, None, 1] == ends_b[None, :, 1])
            ).any(axis=1)
        else:
            at_end = np.zeros(len(sa), dtype=bool)
        return bool((on_b & ~at_end).any())
    # point vs point/line
    pts = a.all_coords() if da == 0 else b.all_coords()
    other = b if da == 0 else a
    if other.dimension() == 0:
        po = other.all_coords()
        return bool(
            ((pts[:, None, 0] == po[None, :, 0]) & (pts[:, None, 1] == po[None, :, 1])).any()
        )
    ends = _line_boundary_pts(other)
    on = _points_on_segs(pts[:, 0], pts[:, 1], other.segments())
    if len(ends):
        at_end = (
            (pts[:, None, 0] == ends[None, :, 0])
            & (pts[:, None, 1] == ends[None, :, 1])
        ).any(axis=1)
    else:
        at_end = np.zeros(len(pts), dtype=bool)
    return bool((on & ~at_end).any())


def touches(a: Geom, b: Geom) -> bool:
    """JTS touches: some point in common, interiors disjoint — via the
    DE-9IM matrix (r3: the sampling-based predicate misclassified a
    line endpoint resting on another line's interior, which the
    randomized DE-9IM agreement law caught). GeometryCollections keep
    the legacy path (RelateOp rejects them)."""
    try:
        m = _de9im(a, b)
    except ValueError:
        if not intersects(a, b):
            return False
        return not _interiors_intersect(a, b)
    return m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F")


def crosses(a: Geom, b: Geom) -> bool:
    """JTS crosses via DE-9IM: 'T*T******' (dim a < dim b),
    'T*****T**' (dim a > dim b), '0********' (line-line)."""
    try:
        m = _de9im(a, b)
    except ValueError:
        return False  # GC: undefined, match RelateOp's refusal shape
    da, db = a.dimension(), b.dimension()
    if da < db:
        return m[0] != "F" and m[2] != "F"
    if da > db:
        return m[0] != "F" and m[6] != "F"
    if da == 1:
        return m[0] == "0"
    return False


def overlaps(a: Geom, b: Geom) -> bool:
    """JTS overlaps via DE-9IM: equal dims, interiors meet at full
    dimension, and each geometry keeps interior outside the other
    ('T*T***T**'; lines need '1*T***T**' — a mere crossing point is
    crosses, not overlaps, which the old contains-based predicate got
    wrong)."""
    da, db = a.dimension(), b.dimension()
    if da != db:
        return False
    try:
        m = _de9im(a, b)
    except ValueError:
        if not _interiors_intersect(a, b):
            return False
        return not contains(a, b) and not contains(b, a)
    if da == 1:
        return m[0] == "1" and m[2] != "F" and m[6] != "F"
    return m[0] != "F" and m[2] != "F" and m[6] != "F"


def _de9im(a: Geom, b: Geom) -> str:
    from geomesa_sql_spark.geom.de9im import de9im  # lazy: avoids cycle

    return de9im(a, b)


def dwithin(a: Geom, b: Geom, d: float) -> bool:
    if _env_disjoint(a, b, pad=d):
        return False
    return distance(a, b) <= d


_PRED = {
    "intersects": intersects,
    "contains": contains,
    "within": within,
    "equals": geom_equals,
    "touches": touches,
    "crosses": crosses,
    "overlaps": overlaps,
}


def relate(a: Geom, b: Geom, pred: str, d: float | None = None) -> bool:
    pred = pred.lower()
    if pred == "dwithin":
        return dwithin(a, b, float(d))
    return _PRED[pred](a, b)


def relate_many(wkb_a: list, wkb_b: list, pred: str, d=None) -> np.ndarray:
    """Pairwise predicate over two aligned lists of WKB buffers.

    The spatial-join refine kernel: candidate pairs after cell pruning.
    Decodes each WKB once per batch (cached by id) then evaluates the
    pairwise predicate. NULL geometry (None) → False, matching the
    reference's null handling (EnumerableSpatialJoinEnumerator.scala:80-104:
    null geoms are neither indexed nor probed).

    ``d`` (dwithin distance) is a scalar OR a per-row array aligned
    with the pair lists (r4 verdict #4: a join on a non-constant
    ``ST_DWithin(a, b, r.radius)`` used to degrade to a per-row Python
    loop that re-decoded both WKBs for every row); NaN rows → False.
    """
    from geomesa_sql_spark.geom.wkb import geom_from_wkb

    # np.ndim, not isinstance: np.float32/np.int64 scalars are not
    # Python int/float, and np.asarray on them yields a 0-d array whose
    # [i] indexing raises (r5 review)
    d_arr = None
    if d is not None and np.ndim(d) != 0:
        d_arr = np.asarray(d, dtype=np.float64)
    elif d is not None:
        d = float(d)

    cache: dict[bytes, Geom] = {}

    def dec(buf):
        if buf is None:
            return None
        g = cache.get(buf)
        if g is None:
            g = cache[buf] = geom_from_wkb(bytes(buf))
        return g

    out = np.zeros(len(wkb_a), dtype=bool)
    for i, (ba, bb) in enumerate(zip(wkb_a, wkb_b)):
        ga = dec(ba)
        gb = dec(bb)
        if ga is None or gb is None:
            continue
        dd = float(d_arr[i]) if d_arr is not None else d
        if dd is not None and dd != dd:  # NaN distance (Arrow NULL)
            continue
        out[i] = relate(ga, gb, pred, dd)
    return out


def relate_points_to_wkb(
    x: np.ndarray, y: np.ndarray, wkb_list: list, pred: str, d: float | None = None
) -> np.ndarray:
    """Predicate between point[i] and geometry wkb_list[i], grouped.

    The spatial-join refine fast path when the probe side is points:
    candidate lists repeat the same few geometries many times per batch,
    so we group rows by geometry and run the vectorized point kernels
    once per distinct geometry instead of per pair.
    """
    from geomesa_sql_spark.geom.wkb import geom_from_wkb

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.zeros(len(x), dtype=bool)
    pred = pred.lower()
    groups: dict[bytes, list] = {}
    for i, b in enumerate(wkb_list):
        if b is None:
            continue
        groups.setdefault(bytes(b), []).append(i)
    for buf, idxs in groups.items():
        g = geom_from_wkb(buf)
        ii = np.asarray(idxs, dtype=np.int64)
        px, py = x[ii], y[ii]
        if pred == "dwithin":
            out[ii] = points_to_geom_dist(px, py, g) <= float(d)
        elif pred == "within" and g.dimension() == 2:
            out[ii] = points_in_polygon(px, py, g, boundary="exclude")
        elif pred == "intersects":
            out[ii] = points_intersect_geom(px, py, g)
        elif pred in ("contains", "equals", "touches", "crosses", "overlaps", "within"):
            # point-vs-geom general: fall back to pairwise relate on the group
            pt_geoms = [Geom(model.POINT, np.array([a, b_])) for a, b_ in zip(px, py)]
            out[ii] = np.array([relate(p, g, pred, d) for p in pt_geoms], dtype=bool)
        else:
            raise ValueError(f"unknown predicate {pred!r}")
    return out


# ----------------------------------------------------------- constructive ops


def buffer_geom(g: Geom, d: float, quad_segs: int = 16, dissolve: bool = True) -> Geom:
    """Planar buffer, dissolved into valid single-shell ring(s).

    Exact buffer region up to circle discretization (4·quad_segs-gon
    per vertex, inscribed — so the region is a subset of the true
    buffer by at most d·(1−cos(π/(4·quad_segs))) ≈ d·1.9e-3):
    per simple part, the Minkowski sum decomposes into vertex circles ∪
    segment capsule rectangles ∪ (for polygons) the part itself, then
    the pieces dissolve through the overlay kernel's aggregate union so
    ST_Area/ST_AsText see one valid shell per connected component — JTS
    BufferOp parity for measures and rendering, not just predicates
    (DataTypeTest.scala:83-85, SpatialJoinTest.scala:46). Closed forms
    for the dissolved discretization, with A_k = (k/2)·d²·sin(2π/k) the
    inscribed k-gon area (k = 4·quad_segs): point buffer = A_k; single
    segment = 2dL + A_k; convex polygon = A + P·d + A_k.

    ``dissolve=False`` returns the raw overlapping piece set
    (predicate-equivalent, much cheaper — for internal predicate-only
    callers).

    JTS/PostGIS parity for d ≤ 0 (late r4): buffer(0) passes polygonal
    parts through and collapses points/lines to POLYGON EMPTY; d < 0
    erodes — P ⊖ |d| = P − dilate(∂P, |d|), exact along straight edges
    (convex erosion = the inner offset polygon exactly), with holes
    growing by the dilated-ring closed form.
    """
    if d == 0.0:
        # JTS BufferOp(0): polygonal parts pass through (the buffer(0)
        # fix idiom); points/lines collapse to POLYGON EMPTY.
        # Zero-ring (empty) polygons are excluded — boundary/overlay of
        # an empty part would propagate NaN coords (review r4d)
        polys = [p for p in g.flatten()
                 if p.type == model.POLYGON and len(p.coords)]
        if not polys:
            return Geom(model.POLYGON, [])
        if len(polys) == 1:
            return polys[0]
        from geomesa_sql_spark.geom import overlay as _overlay

        return _overlay.dissolve(Geom(model.MULTIPOLYGON, polys))
    if d < 0:
        # negative buffer = erosion (JTS/PostGIS semantics): polygonal
        # parts shrink by |d|, points/lines erode to POLYGON EMPTY.
        # P ⊖ |d| = P − dilate(∂P, |d|): exact along straight edges
        # (the capsule rectangles dominate the inscribed-k-gon vertex
        # circles on the interior side), so convex-polygon erosion has
        # the exact closed form of the inner offset polygon.
        polys = [p for p in g.flatten()
                 if p.type == model.POLYGON and len(p.coords)]
        if not polys:
            return Geom(model.POLYGON, [])
        from geomesa_sql_spark.geom import overlay as _overlay

        area_g = (
            polys[0]
            if len(polys) == 1
            else _overlay.dissolve(Geom(model.MULTIPOLYGON, polys))
        )
        rings = boundary(area_g)
        shrink = buffer_geom(rings, -d, quad_segs, dissolve=True)
        return _overlay.overlay(area_g, shrink, "difference")
    k = 4 * quad_segs
    ang = np.linspace(0.0, 2 * np.pi, k, endpoint=False)
    circ = np.column_stack([np.cos(ang), np.sin(ang)]) * d

    pieces: list[Geom] = []
    for part in g.flatten():
        verts = part.all_coords()
        for vx, vy in verts:
            ring = circ + (vx, vy)
            pieces.append(model.polygon(ring))
        segs = part.segments()
        for x1, y1, x2, y2 in segs:
            dx, dy = x2 - x1, y2 - y1
            ln = float(np.hypot(dx, dy))
            if ln == 0.0:
                continue
            nx, ny = -dy / ln * d, dx / ln * d
            pieces.append(
                model.polygon(
                    [
                        [x1 + nx, y1 + ny],
                        [x2 + nx, y2 + ny],
                        [x2 - nx, y2 - ny],
                        [x1 - nx, y1 - ny],
                    ]
                )
            )
        if part.type == model.POLYGON:
            pieces.append(part)
    if dissolve and len(pieces) == 1:
        return pieces[0]  # a lone piece is already a valid shell
    raw = Geom(model.MULTIPOLYGON, pieces)
    if not dissolve:
        return raw
    from geomesa_sql_spark.geom import overlay as _overlay

    return _overlay.dissolve(raw)


def union_geom(a: Geom, b: Geom) -> Geom:
    """Non-dissolutive union: GEOMETRYCOLLECTION(a, b).

    Predicate-equivalent to the dissolved union under this kernel —
    relate(x, union(a,b)) ≡ relate(x,a) OR relate(x,b) for the
    intersects-family predicates, which is the only way the reference's
    SQL surface exercises ST_Union (SpatialJoinTest.scala:59). Not a
    polygon-dissolve; documented as such.
    """
    return Geom(model.GEOMETRYCOLLECTION, [a, b])


# ------------------------------------------------------------ measures


def area(g: Geom) -> float:
    """Planar area (shoelace; holes subtract; JTS getArea semantics —
    0 for points/lines)."""
    total = 0.0
    for part in g.flatten():
        if part.type != model.POLYGON:
            continue
        for k, ring in enumerate(part.coords):
            x, y = ring[:, 0], ring[:, 1]
            a = 0.5 * abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])))
            total += a if k == 0 else -a
    return total


def length(g: Geom) -> float:
    """JTS getLength semantics: line length; polygon perimeter; 0 for
    points."""
    segs = g.segments()
    if not len(segs):
        return 0.0
    return float(np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1]).sum())


def centroid(g: Geom) -> tuple[float, float]:
    """Centroid of the highest-dimension component set (JTS rule):
    area-weighted for polygons, length-weighted for lines, mean for
    points."""
    d = g.dimension()
    if d == 2:
        sx = sy = sa = 0.0
        for part in g.flatten():
            if part.type != model.POLYGON:
                continue
            for k, ring in enumerate(part.coords):
                x, y = ring[:, 0], ring[:, 1]
                cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                a = float(cross.sum()) / 2.0
                if a == 0.0:
                    continue
                cx = float(((x[:-1] + x[1:]) * cross).sum()) / (6.0 * a)
                cy = float(((y[:-1] + y[1:]) * cross).sum()) / (6.0 * a)
                w = abs(a) * (1.0 if k == 0 else -1.0)
                sx += cx * w
                sy += cy * w
                sa += w
        if sa != 0.0:
            return sx / sa, sy / sa
    if d >= 1:
        segs = g.segments()
        if len(segs):
            ln = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
            tot = float(ln.sum())
            if tot > 0:
                mx = (segs[:, 0] + segs[:, 2]) / 2
                my = (segs[:, 1] + segs[:, 3]) / 2
                return float((mx * ln).sum() / tot), float((my * ln).sum() / tot)
    pts = g.all_coords()
    return float(pts[:, 0].mean()), float(pts[:, 1].mean())


def _pts_seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from each point in (n,2) ``pts`` to segment a-b."""
    ab = b - a
    denom = float(ab @ ab)
    if denom == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])


def _dp_keep(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep mask over an open vertex chain."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d = _pts_seg_dist(pts[i + 1 : j], pts[i], pts[j])
        k = int(np.argmax(d))
        if float(d[k]) > tol:
            ki = i + 1 + k
            keep[ki] = True
            stack.append((i, ki))
            stack.append((ki, j))
    return keep


def simplify(g: Geom, tol: float) -> Geom:
    """Douglas-Peucker simplification (ST_Simplify semantics: endpoints
    kept; polygon rings that would collapse below a triangle keep their
    original vertices). Surface extension beyond the reference — its
    Calcite fun=spatial table has no simplifier; semantics follow the
    de-facto PostGIS/JTS contract."""
    if g.type == model.POINT:
        return g
    if g.type == model.LINESTRING:
        if len(g.coords) <= 2:
            return g
        return Geom(model.LINESTRING, g.coords[_dp_keep(g.coords, tol)])
    if g.type == model.POLYGON:
        rings = []
        for ring in g.coords:
            if len(ring) <= 4:
                rings.append(ring)
                continue
            kept = ring[_dp_keep(ring, tol)]
            rings.append(kept if len(kept) >= 4 else ring)
        return Geom(model.POLYGON, rings)
    if g.type in (model.MULTIPOINT,):
        return g
    return Geom(g.type, [simplify(p, tol) for p in g.coords])


def convex_hull(g: Geom) -> Geom:
    """Convex hull via Andrew's monotone chain. Degenerate inputs follow
    JTS: 1 unique point -> Point, collinear -> LineString of the two
    extremes, else CCW Polygon."""
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return Geom(model.GEOMETRYCOLLECTION, [])
    if len(pts) == 1:
        return Geom(model.POINT, pts[0].copy())
    # pts sorted lexicographically by np.unique already
    def half(chain_pts):
        out: list[np.ndarray] = []
        for p in chain_pts:
            while len(out) >= 2 and _orient(
                out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        return Geom(model.LINESTRING, np.array([pts[0], pts[-1]]))
    ring = np.vstack([hull, hull[:1]])
    return Geom(model.POLYGON, [ring])


def closest_point(a: Geom, b: Geom) -> np.ndarray:
    """Point of ``a`` nearest to ``b`` (PostGIS/JTS ``ST_ClosestPoint``
    A-side semantics) as an ``(2,)`` coordinate array.

    Candidate points on A: A's vertices, projections of B's vertices
    onto A's segments, and proper A-segment x B-segment crossings (the
    closest pair between two segment sets is always realised at one of
    these). Each candidate is scored by its TRUE distance to B (min
    point-to-segment distance over B's segments, plus B's bare
    vertices for point components), not merely to B's nearest vertex.
    """
    pa = a.all_coords()
    pb = b.all_coords()
    asegs = a.segments()
    bsegs = b.segments()
    cands = [pa]
    if len(asegs):
        sa, d = asegs[:, :2], asegs[:, 2:] - asegs[:, :2]
        L2 = (d * d).sum(axis=1)
        safe = np.where(L2 > 0, L2, 1.0)
        # (n_b, n_aseg) parametric feet of B vertices on A segments
        t = np.clip(((pb[:, None, :] - sa[None]) * d[None]).sum(-1) / safe[None], 0.0, 1.0)
        cands.append((sa[None] + t[..., None] * d[None]).reshape(-1, 2))
        if len(bsegs):
            # proper crossings: at a crossing the A-side point is interior
            # to both segments, so neither candidate family above finds it
            p = sa[:, None]
            r = d[:, None]
            q = bsegs[None, :, :2]
            s = (bsegs[:, 2:] - bsegs[:, :2])[None]
            denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
            qp = q - p
            with np.errstate(divide="ignore", invalid="ignore"):
                tt = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / denom
                uu = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / denom
            ok = (denom != 0) & (tt >= 0) & (tt <= 1) & (uu >= 0) & (uu <= 1)
            if ok.any():
                pi = np.broadcast_to(p, tt.shape + (2,))[ok]
                ri = np.broadcast_to(r, tt.shape + (2,))[ok]
                cands.append(pi + tt[ok][:, None] * ri)
    cand = np.concatenate(cands, axis=0)
    if len(bsegs):
        score = _point_seg_dist_matrix(cand[:, 0], cand[:, 1], bsegs).min(axis=1)
    else:
        score = np.full(len(cand), np.inf)
    if len(pb):
        dv = np.sqrt(((cand[:, None, :] - pb[None]) ** 2).sum(-1)).min(axis=1)
        score = np.minimum(score, dv)
    return cand[int(np.argmin(score))].copy()


def boundary(g: Geom) -> Geom | None:
    """JTS getBoundary: points → empty GEOMETRYCOLLECTION; open lines →
    their endpoints (mod-2 rule for multilines); polygons → their rings
    as (MULTI)LINESTRING. GeometryCollection boundary is undefined in
    JTS (throws) — we surface NULL."""
    t = g.type
    if t in (model.POINT, model.MULTIPOINT):
        return Geom(model.GEOMETRYCOLLECTION, [])
    if t == model.LINESTRING:
        pts = g.coords
        if len(pts) == 0 or bool((pts[0] == pts[-1]).all()):
            return Geom(model.MULTIPOINT, [])
        return Geom(model.MULTIPOINT, [
            Geom(model.POINT, pts[0].copy()),
            Geom(model.POINT, pts[-1].copy()),
        ])
    if t == model.MULTILINESTRING:
        counts: dict[tuple, int] = {}
        for sub in g.coords:
            pts = sub.coords
            if len(pts) == 0 or bool((pts[0] == pts[-1]).all()):
                continue
            for p in (pts[0], pts[-1]):
                key = (float(p[0]), float(p[1]))
                counts[key] = counts.get(key, 0) + 1
        odd = [k for k in sorted(counts) if counts[k] % 2 == 1]
        return Geom(model.MULTIPOINT, [
            Geom(model.POINT, np.array(k, dtype=np.float64)) for k in odd
        ])
    if t == model.POLYGON:
        rings = [Geom(model.LINESTRING, r.copy()) for r in g.coords]
        return rings[0] if len(rings) == 1 else Geom(model.MULTILINESTRING, rings)
    if t == model.MULTIPOLYGON:
        rings = [
            Geom(model.LINESTRING, r.copy())
            for poly in g.coords
            for r in poly.coords
        ]
        return rings[0] if len(rings) == 1 else Geom(model.MULTILINESTRING, rings)
    return None


def _ring_segs(ring: np.ndarray) -> np.ndarray:
    return np.concatenate([ring[:-1], ring[1:]], axis=1)


def is_valid(g: Geom) -> bool:
    """Structural OGC validity (the checks JTS IsValidOp performs that
    matter for this engine's inputs): finite coordinates; lines with ≥2
    points; polygon rings closed, ≥4 points, non-zero area, no proper
    self-crossings, and no proper crossings between rings. Exotic
    failure modes (hole outside shell, nested shells) are out of scope
    and documented as such."""
    t = g.type
    if t == model.POINT:
        return bool(np.isfinite(g.coords).all())
    if t == model.LINESTRING:
        return len(g.coords) >= 2 and bool(np.isfinite(g.coords).all())
    if t == model.POLYGON:
        ring_segs = []
        for ring in g.coords:
            if (
                len(ring) < 4
                or not bool((ring[0] == ring[-1]).all())
                or not bool(np.isfinite(ring).all())
            ):
                return False
            x, y = ring[:, 0], ring[:, 1]
            if abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))) == 0.0:
                return False  # collapsed ring
            segs = _ring_segs(ring)
            if _seg_seg_intersect_matrix(segs, segs, proper=True).any():
                return False  # ring self-crossing
            ring_segs.append(segs)
        for i in range(len(ring_segs)):
            for j in range(i + 1, len(ring_segs)):
                if _seg_seg_intersect_matrix(
                    ring_segs[i], ring_segs[j], proper=True
                ).any():
                    return False  # rings cross
        return True
    # multis / collections: every member valid
    return all(is_valid(sub) for sub in g.coords)


def dimension(g: Geom) -> int:
    """Topological dimension (JTS getDimension): 0 points, 1 lines,
    2 polygons; collections take the max over members (0 when empty)."""
    t = g.type
    if t in (model.POINT, model.MULTIPOINT):
        return 0
    if t in (model.LINESTRING, model.MULTILINESTRING):
        return 1
    if t in (model.POLYGON, model.MULTIPOLYGON):
        return 2
    return max((dimension(sub) for sub in g.coords), default=0)
