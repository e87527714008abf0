"""DE-9IM intersection matrix (ST_Relate).

The reference inherits ST_Relate from Calcite's spatial operator table
(jdbc/Driver.scala:51-56, backed by JTS RelateOp); this is a planar
numpy re-derivation for Point/Line/Polygon and their multis (no
GeometryCollection — JTS's RelateOp rejects those too).

Method: every 1-dimensional feature (line segments, polygon rings) is
SPLIT at all of its intersection points with the other geometry's
segments; each resulting piece lies entirely within one region
(interior / boundary / exterior) of the other geometry, so its
midpoint classifies it exactly. Interiors of open pieces keep
dimension 1 after removing finitely many boundary points, which
settles every "0 vs 1 vs F" entry without tolerance knobs; area-area
interior tests reuse the kernel's exact predicates.

Entries are computed as ints (-1 = F, else the dimension) and
rendered to the standard 9-character string in row-major
(Interior, Boundary, Exterior) x (Interior, Boundary, Exterior)
order. ``relate_pattern`` implements the JTS matcher
('T' = any non-F, '*' = anything, 'F'/'0'/'1'/'2' literal).
"""

from __future__ import annotations

import numpy as np

from geomesa_sql_spark.geom import kernel, model
from geomesa_sql_spark.geom.model import Geom

_F = -1

# relative tolerance for on-curve / collinearity classification: float
# midpoints and intersection points are computed arithmetically, so an
# exactly-collinear piece can land ~1e-16 off its carrier. JTS uses
# exact predicates; we scale the point-distance epsilon to the
# coordinate magnitude (set per de9im() call). Cross-product
# (collinearity/parallelism) tests instead scale with the PRODUCT OF
# SEGMENT LENGTHS — an angle tolerance — because |u x v| = |u||v|sinθ:
# a coordinate-magnitude-squared threshold misclassified genuinely
# crossing small segments as parallel at Web-Mercator-scale offsets
# (review r3).
_EPS = 1e-9
_EPS_ANG = 1e-9


def _set_scale(*geoms: Geom) -> None:
    global _EPS
    m = 1.0
    for g in geoms:
        c = g.all_coords()
        if len(c):
            m = max(m, float(np.abs(c).max()))
    _EPS = 1e-9 * m


def _cross_tol(u: np.ndarray, v: np.ndarray) -> float:
    return _EPS_ANG * float(np.hypot(u[0], u[1]) * np.hypot(v[0], v[1])) + 1e-30


def _dim_class(g: Geom) -> int:
    t = g.type
    if t in (model.POINT, model.MULTIPOINT):
        return 0
    if t in (model.LINESTRING, model.MULTILINESTRING):
        return 1
    if t in (model.POLYGON, model.MULTIPOLYGON):
        return 2
    raise ValueError(f"DE-9IM is undefined for {t} (JTS RelateOp parity)")


def _points_of(g: Geom) -> np.ndarray:
    """(n, 2) coordinates of a 0-dim geometry."""
    return g.all_coords()


def _segs_of(g: Geom) -> np.ndarray:
    """(n, 4) segments of a 1- or 2-dim geometry (rings for areas),
    zero-length segments dropped."""
    segs = g.segments()
    if not len(segs):
        return segs.reshape(0, 4)
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    return segs[keep]


def _boundary_pts(g: Geom) -> np.ndarray:
    """Boundary points of a 1-dim geometry (mod-2 endpoints)."""
    b = kernel.boundary(g)
    pts = b.all_coords() if b is not None else np.zeros((0, 2))
    return pts.reshape(-1, 2)


def _on_segs(pts: np.ndarray, segs: np.ndarray) -> np.ndarray:
    if not len(pts):
        return np.zeros(0, dtype=bool)
    if not len(segs):
        return np.zeros(len(pts), dtype=bool)
    return kernel._point_seg_dist_matrix(pts[:, 0], pts[:, 1], segs).min(axis=1) <= _EPS


def _pts_equal_any(pts: np.ndarray, others: np.ndarray) -> np.ndarray:
    """Per-point: does it coincide with any point in ``others``?"""
    if not len(pts):
        return np.zeros(0, dtype=bool)
    if not len(others):
        return np.zeros(len(pts), dtype=bool)
    return (
        (np.abs(pts[:, None, 0] - others[None, :, 0]) <= _EPS)
        & (np.abs(pts[:, None, 1] - others[None, :, 1]) <= _EPS)
    ).any(axis=1)


def _strict_in_area(pts: np.ndarray, area: Geom) -> np.ndarray:
    if not len(pts):
        return np.zeros(0, dtype=bool)
    return kernel._strictly_inside(pts, area)


def _collinear_overlap(sa: np.ndarray, sb: np.ndarray) -> bool:
    """Any positive-length shared sub-segment between the two sets?"""
    if not len(sa) or not len(sb):
        return False
    for seg in sa:
        if _cover_intervals(seg, sb):
            return True
    return False


def _cover_intervals(seg: np.ndarray, sb: np.ndarray) -> list[tuple[float, float]]:
    """Parameter intervals [t0, t1] ⊆ [0, 1] of ``seg`` that are
    collinear-covered by segments of ``sb`` (positive length only)."""
    a = seg[:2]
    d = seg[2:] - seg[:2]
    L2 = float(d @ d)
    out: list[tuple[float, float]] = []
    for s in sb:
        p, q = s[:2], s[2:]
        # both endpoints of s on the LINE of seg?
        if (
            abs(_cross(d, p - a)) > _cross_tol(d, p - a)
            or abs(_cross(d, q - a)) > _cross_tol(d, q - a)
        ):
            continue
        tp = float((p - a) @ d) / L2
        tq = float((q - a) @ d) / L2
        lo, hi = (tp, tq) if tp <= tq else (tq, tp)
        lo, hi = max(lo, 0.0), min(hi, 1.0)
        if hi > lo:
            out.append((lo, hi))
    return out


def _cross(u: np.ndarray, v: np.ndarray) -> float:
    return float(u[0] * v[1] - u[1] * v[0])


def _covered(sa: np.ndarray, sb: np.ndarray) -> bool:
    """Is every point of sa's segments on some sb segment? (interval
    union cover per segment)."""
    if not len(sa):
        return True
    if not len(sb):
        return False
    for seg in sa:
        ivs = sorted(_cover_intervals(seg, sb))
        reach = 0.0
        for lo, hi in ivs:
            if lo > reach:
                return False
            reach = max(reach, hi)
        if reach < 1.0:
            return False
    return True


def _split_ts(seg: np.ndarray, other: np.ndarray) -> list[float]:
    """Parameters t in (0,1) where ``seg`` meets any segment of
    ``other`` (crossings, touches, collinear-overlap endpoints)."""
    a = seg[:2]
    d = seg[2:] - seg[:2]
    L2 = float(d @ d)
    ts: set[float] = set()
    for s in other:
        p, q = s[:2], s[2:]
        r = q - p
        denom = _cross(d, r)
        if abs(denom) > _cross_tol(d, r):
            ap = p - a
            t = _cross(ap, r) / denom
            u = _cross(ap, d) / denom
            if 0.0 < t < 1.0 and 0.0 <= u <= 1.0:
                ts.add(t)
        else:
            # parallel: collinear endpoints project as split points
            if abs(_cross(d, p - a)) <= _cross_tol(d, p - a):
                for e in (p, q):
                    t = float((e - a) @ d) / L2
                    if 0.0 < t < 1.0:
                        ts.add(t)
    return sorted(ts)


def _piece_midpoints(segs: np.ndarray, other: np.ndarray) -> np.ndarray:
    """Midpoints of every piece of ``segs`` after splitting at all
    meeting points with ``other`` — each piece lies wholly in one
    region of the other geometry."""
    mids = []
    for seg in segs:
        a = seg[:2]
        d = seg[2:] - seg[:2]
        ts = [0.0] + _split_ts(seg, other) + [1.0]
        for t0, t1 in zip(ts[:-1], ts[1:]):
            mids.append(a + d * ((t0 + t1) / 2.0))
    return np.asarray(mids).reshape(-1, 2)


def _meet_points(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Finite candidate meeting points of two segment sets: proper
    crossings, endpoint touches, collinear-overlap endpoints — every
    isolated intersection point is among these."""
    pts = []
    for seg in sa:
        a = seg[:2]
        d = seg[2:] - seg[:2]
        L2 = float(d @ d)
        for s in sb:
            p, q = s[:2], s[2:]
            r = q - p
            denom = _cross(d, r)
            if abs(denom) > _cross_tol(d, r):
                ap = p - a
                t = _cross(ap, r) / denom
                u = _cross(ap, d) / denom
                if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                    pts.append(a + d * t)
            else:
                if abs(_cross(d, p - a)) <= _cross_tol(d, p - a):
                    for e in (p, q):
                        t = float((e - a) @ d) / L2
                        if 0.0 <= t <= 1.0:
                            pts.append(a + d * t)
                    for e in (a, seg[2:]):
                        tt = float((e - p) @ r) / float(r @ r)
                        if 0.0 <= tt <= 1.0:
                            pts.append(e.copy())
    if not pts:
        return np.zeros((0, 2))
    return np.unique(np.asarray(pts), axis=0)


class _Feat:
    """Classification surface of one geometry: which region
    (0 = interior, 1 = boundary, 2 = exterior) each point falls in."""

    def __init__(self, g: Geom):
        self.g = g
        self.dim = _dim_class(g)
        if self.dim == 0:
            self.pts = _points_of(g)
            self.segs = np.zeros((0, 4))
            self.bpts = np.zeros((0, 2))
        elif self.dim == 1:
            self.pts = np.zeros((0, 2))
            self.segs = _segs_of(g)
            self.bpts = _boundary_pts(g)
        else:
            self.pts = np.zeros((0, 2))
            self.segs = _segs_of(g)  # rings
            self.bpts = np.zeros((0, 2))

    def classify(self, pts: np.ndarray) -> np.ndarray:
        """0/1/2 region per point."""
        n = len(pts)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        out = np.full(n, 2, dtype=np.int64)
        if self.dim == 0:
            out[_pts_equal_any(pts, self.pts)] = 0
        elif self.dim == 1:
            on = _on_segs(pts, self.segs)
            out[on] = 0
            out[on & _pts_equal_any(pts, self.bpts)] = 1
        else:
            out[_on_segs(pts, self.segs)] = 1
            inside = _strict_in_area(pts, self.g)
            out[(out == 2) & inside] = 0
        return out


def de9im(a: Geom, b: Geom) -> str:
    """9-character DE-9IM matrix of a vs b (row-major I/B/E × I/B/E)."""
    _set_scale(a, b)
    fa, fb = _Feat(a), _Feat(b)
    m = np.full((3, 3), _F, dtype=np.int64)
    m[2][2] = 2  # planar, bounded geometries: exteriors always overlap

    def bump(i: int, j: int, d: int) -> None:
        if d > m[i][j]:
            m[i][j] = d

    # ---- 0-dim features: A's bare points and A's boundary points
    for pts, row in ((fa.pts, 0), (fa.bpts, 1)):
        cls = fb.classify(pts)
        for reg in (0, 1, 2):
            if (cls == reg).any():
                bump(row, reg, 0)
    for pts, col in ((fb.pts, 0), (fb.bpts, 1)):
        cls = fa.classify(pts)
        for reg in (0, 1, 2):
            if (cls == reg).any():
                bump(reg, col, 0)

    # ---- A's curves (line segments / rings) vs B
    if len(fa.segs):
        arow = 0 if fa.dim == 1 else 1  # rings ARE the area's boundary
        if fb.dim == 0:
            # curve minus finite points keeps its dimension everywhere;
            # B points on A's curve are handled by the point loop above
            bump(arow, 2, 1)
        else:
            mids = _piece_midpoints(fa.segs, fb.segs)
            cls = fb.classify(mids)
            for reg in (0, 1, 2):
                if (cls == reg).any():
                    bump(arow, reg, 1)
            # isolated meeting points can add dim-0 entries the pieces
            # don't see (a crossing point is interior-of-A on
            # boundary-of-B etc.)
            meets = _meet_points(fa.segs, fb.segs)
            if len(meets):
                ca = fa.classify(meets)
                cb = fb.classify(meets)
                for i in range(len(meets)):
                    bump(int(ca[i]), int(cb[i]), 0)
    # ---- B's curves vs A
    if len(fb.segs):
        bcol = 0 if fb.dim == 1 else 1
        if fa.dim == 0:
            bump(2, bcol, 1)
        else:
            mids = _piece_midpoints(fb.segs, fa.segs)
            cls = fa.classify(mids)
            for reg in (0, 1, 2):
                if (cls == reg).any():
                    bump(reg, bcol, 1)

    # ---- open-region entries only areas can witness
    if fa.dim == 2:
        if not _area_within(fa, fb):
            bump(0, 2, 2)  # A's interior pokes into B's exterior
            # (points/curves can never cover an open region, so this
            # also settles area-vs-point and area-vs-line)
        if fb.dim == 2 and _area_interiors_intersect(fa, fb):
            bump(0, 0, 2)
    if fb.dim == 2 and not _area_within(fb, fa):
        bump(2, 0, 2)

    pat = "".join(
        "F" if v == _F else str(int(v)) for v in m.reshape(-1)
    )
    return pat


def _area_within(fa: "_Feat", fb: "_Feat") -> bool:
    """Is area A's interior contained in closure(B)? (False settles
    the Interior-x-Exterior entry to dimension 2.)"""
    if fb.dim != 2:
        return False  # points/curves can never cover an open region
    # (i) any A-ring piece strictly outside B
    mids = _piece_midpoints(fa.segs, fb.segs)
    cls = fb.classify(mids)
    if (cls == 2).any():
        return False
    # (ii) any B-ring piece strictly inside A (a pocket of B-exterior
    # inside A — hole case)
    midsb = _piece_midpoints(fb.segs, fa.segs)
    clsb = fa.classify(midsb)
    if (clsb == 0).any():
        return False
    # (iii) a true interior point of each A part strictly outside B
    # (disjoint / A-inside-B's-hole cases where no ring of either
    # pierces the other)
    samples = _interior_points(fa.g)
    if len(samples):
        cs = fb.classify(samples)
        if (cs == 2).any():
            return False
    return True


def _interior_points(g: Geom) -> np.ndarray:
    """One guaranteed-strictly-interior point per polygon part
    (scanline span midpoint — the standard point-on-surface trick;
    kernel._interior_samples yields BOUNDARY proxies, useless here)."""
    pts = []
    for part in g.flatten():
        if part.type != model.POLYGON or not len(part.coords):
            continue
        rings = part.coords
        ys = np.unique(np.concatenate([r[:, 1] for r in rings]))
        # scan between consecutive distinct vertex ys (avoids vertices)
        for ym in (ys[:-1] + ys[1:]) / 2.0:
            xs = []
            for r in rings:
                y1, y2 = r[:-1, 1], r[1:, 1]
                x1, x2 = r[:-1, 0], r[1:, 0]
                hit = ((y1 <= ym) & (ym < y2)) | ((y2 <= ym) & (ym < y1))
                if hit.any():
                    t = (ym - y1[hit]) / (y2[hit] - y1[hit])
                    xs.append(x1[hit] + t * (x2[hit] - x1[hit]))
            if not xs:
                continue
            xv = np.sort(np.concatenate(xs))
            if len(xv) >= 2 and xv[1] > xv[0]:
                pts.append(np.array([(xv[0] + xv[1]) / 2.0, ym]))
                break
    return np.asarray(pts).reshape(-1, 2)


def relate_pattern(a: Geom, b: Geom, pattern: str) -> bool:
    """JTS IntersectionMatrix.matches: 'T' any non-F, '*' anything,
    'F'/'0'/'1'/'2' literal."""
    if len(pattern) != 9:
        raise ValueError("DE-9IM pattern must be 9 characters")
    m = de9im(a, b)
    for got, want in zip(m, pattern.upper()):
        if want == "*":
            continue
        if want == "T":
            if got == "F":
                return False
        elif got != want:
            return False
    return True


def is_simple(g: Geom) -> bool:
    """JTS isSimple: points always; multipoints iff no duplicates;
    polygons always (validity owns ring checks); a curve iff it
    self-intersects only at shared endpoints of consecutive segments
    (plus the closing point of a ring), and multi-curves additionally
    only meet at points that are endpoints of both parts."""
    _set_scale(g)
    t = g.type
    if t == model.POINT:
        return True
    if t == model.MULTIPOINT:
        pts = g.all_coords()
        return len(np.unique(pts, axis=0)) == len(pts)
    if t in (model.POLYGON, model.MULTIPOLYGON):
        return True
    parts = [p for p in g.flatten() if p.type == model.LINESTRING]
    for p in parts:
        if not _line_self_simple(p):
            return False
    # cross-part: meetings must be endpoints of BOTH parts
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            sa, sb = _segs_of(parts[i]), _segs_of(parts[j])
            if kernel._seg_seg_intersect_matrix(sa, sb, proper=True).any():
                return False
            if _collinear_overlap(sa, sb):
                return False
            meets = _meet_points(sa, sb)
            if len(meets):
                ea = np.stack([parts[i].coords[0], parts[i].coords[-1]])
                eb = np.stack([parts[j].coords[0], parts[j].coords[-1]])
                ok = _pts_equal_any(meets, ea) & _pts_equal_any(meets, eb)
                if not ok.all():
                    return False
    return True


def _line_self_simple(p: Geom) -> bool:
    pts = p.coords
    segs = _segs_of(p)
    m = len(segs)
    if m <= 1:
        return True
    closed = bool((pts[0] == pts[-1]).all())
    hit = kernel._seg_seg_intersect_matrix(segs, segs)
    for i in range(m):
        for j in range(i + 1, m):
            if not hit[i][j]:
                continue
            if j == i + 1 or (closed and i == 0 and j == m - 1):
                # consecutive (or ring-closing) segments share one
                # endpoint — allowed unless they overlap collinearly
                # (backtracking) or cross properly elsewhere
                if _cover_intervals(segs[i], segs[j : j + 1]):
                    return False
                if kernel._seg_seg_intersect_matrix(
                    segs[i : i + 1], segs[j : j + 1], proper=True
                ).any():
                    return False
            else:
                return False
    return True


def _area_interiors_intersect(fa: "_Feat", fb: "_Feat") -> bool:
    """Do two polygon interiors share a point? Stronger than
    kernel._interiors_intersect (r3): geometries whose rings overlap
    COLLINEARLY (shared edges) with interiors on the same side have no
    proper crossing and no strictly-inside vertex — caught here by
    nudging a boundary-on-boundary ring piece perpendicular into A's
    interior and testing the nudged point against B."""
    if kernel._seg_seg_intersect_matrix(fa.segs, fb.segs, proper=True).any():
        return True
    mids_a = _piece_midpoints(fa.segs, fb.segs)
    if (fb.classify(mids_a) == 0).any():
        return True
    mids_b = _piece_midpoints(fb.segs, fa.segs)
    if (fa.classify(mids_b) == 0).any():
        return True
    pa = _interior_points(fa.g)
    if len(pa) and (fb.classify(pa) == 0).any():
        return True
    pb = _interior_points(fb.g)
    if len(pb) and (fa.classify(pb) == 0).any():
        return True
    off = _EPS * 1e3
    for seg in fa.segs:
        a = seg[:2]
        d = seg[2:] - seg[:2]
        L = float(np.hypot(d[0], d[1]))
        if L == 0.0:
            continue
        n = np.array([-d[1], d[0]]) / L
        ts = [0.0] + _split_ts(seg, fb.segs) + [1.0]
        for t0, t1 in zip(ts[:-1], ts[1:]):
            m = (a + d * ((t0 + t1) / 2.0)).reshape(1, 2)
            if fb.classify(m)[0] != 1:
                continue  # only boundary-on-boundary pieces need a nudge
            for sgn in (1.0, -1.0):
                p = m + sgn * off * n
                if fa.classify(p)[0] == 0 and fb.classify(p)[0] == 0:
                    return True
    return False
