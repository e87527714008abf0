"""Planar boolean overlay: intersection / union / difference /
symmetric difference / split / dissolve.

The reference inherits the overlay constructors (ST_Intersection,
ST_Difference, ST_SymDifference, ST_Union as a geometry constructor)
from Calcite's spatial operator table (jdbc/Driver.scala:51-56, backed
by JTS OverlayOp); no reference test exercises them (SURVEY §2.7), but
they complete the migrating user's surface. This is a from-scratch
numpy overlay, not a JTS translation.

Method (area x area), reusing the split/classify machinery of
geom/de9im.py:

1. every ring segment of both inputs is split at all meeting points
   with the pooled segment set (bbox-prefiltered), so each piece lies
   wholly inside / outside / on-boundary of each input;
2. each piece's midpoint is nudged perpendicular to both sides; each
   side is classified against input A and input B (even-odd per
   polygon part, OR across parts — so self-overlapping multi-parts
   dissolve for free) and the boolean op maps (inA, inB) to
   result-membership per side;
3. a piece is a boundary edge of the result iff exactly one side is
   inside; it is oriented result-interior-on-left. Shared collinear
   edges contributed by both inputs snap to the same directed edge and
   dedup;
4. endpoints are eps-clustered into nodes; rings reassemble by
   walking, at each node, the outgoing edge with the smallest
   clockwise turn from the reversed incoming direction (DCEL face
   traversal), which decomposes pinch points the way JTS does;
5. CCW rings are shells, CW rings are holes; each hole attaches to
   the smallest containing shell.

Lower-dimensional operands (points, lines) go through the same piece
machinery: clip pieces by midpoint classification, collinear-overlap
intervals, and isolated meet points. For an area x area INTERSECTION
whose areal result is empty, the lower-dimensional contact set
(shared edges / touch points) is returned, JTS-style.

Tolerance model matches de9im.py: scale-relative epsilons set per
call, not exact arithmetic — same class as the rest of this kernel
and documented as such.
"""

from __future__ import annotations

import numpy as np

from geomesa_sql_spark.geom import de9im, kernel, model
from geomesa_sql_spark.geom.model import Geom

_OPS = ("intersection", "union", "difference", "symdifference")

_TWO_PI = 2.0 * np.pi


# --------------------------------------------------------------- util


def _is_empty(g: Geom) -> bool:
    if g is None:
        return True
    if g.type == model.POINT:
        return bool(np.isnan(np.asarray(g.coords)).any())
    c = g.all_coords()
    return c.size == 0


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _normalize_parts(g: Geom) -> list[Geom]:
    """Polygon parts with shells forced CCW and holes CW (interior on
    the left of every directed ring edge); degenerate rings dropped."""
    parts: list[Geom] = []
    for p in g.flatten():
        if p.type != model.POLYGON or not len(p.coords):
            continue
        rings = []
        for k, ring in enumerate(p.coords):
            ring = np.asarray(ring, dtype=np.float64)
            if len(ring) < 4:
                continue
            a = _signed_area(ring)
            if a == 0.0:
                continue
            want_ccw = k == 0
            if (a > 0) != want_ccw:
                ring = ring[::-1].copy()
            rings.append(ring)
        if rings:
            parts.append(Geom(model.POLYGON, rings))
    return parts


def _part_segs(parts: list[Geom]) -> np.ndarray:
    segs = []
    for p in parts:
        for ring in p.coords:
            s = np.hstack([ring[:-1], ring[1:]])
            keep = (s[:, 0] != s[:, 2]) | (s[:, 1] != s[:, 3])
            segs.append(s[keep])
    return np.concatenate(segs) if segs else np.zeros((0, 4))


def _in_area(pts: np.ndarray, parts: list[Geom]) -> np.ndarray:
    """Inside ANY part (even-odd per part handles holes; OR across
    parts gives union semantics for overlapping parts — unlike
    kernel._pip_rings over pooled rings, which would XOR them)."""
    out = np.zeros(len(pts), dtype=bool)
    if not len(pts):
        return out
    for p in parts:
        x0, y0, x1, y1 = p.envelope()
        near = (
            (pts[:, 0] >= x0 - de9im._EPS)
            & (pts[:, 0] <= x1 + de9im._EPS)
            & (pts[:, 1] >= y0 - de9im._EPS)
            & (pts[:, 1] <= y1 + de9im._EPS)
            & ~out
        )
        if near.any():
            sub = pts[near]
            out[near] = kernel._pip_rings(sub[:, 0], sub[:, 1], p.coords)
    return out


def _covered(pts: np.ndarray, g: Geom) -> np.ndarray:
    """Point covered by closure(g) — interior or boundary — for any
    geometry dimension."""
    if not len(pts):
        return np.zeros(0, dtype=bool)
    out = np.zeros(len(pts), dtype=bool)
    parts = [p for p in g.flatten() if not _is_empty(p)]
    area_parts = [p for p in parts if p.type == model.POLYGON]
    if area_parts:
        out |= _in_area(pts, area_parts)
    segs = _prefix_segs(parts)
    if len(segs):
        out |= (
            kernel._point_seg_dist_matrix(pts[:, 0], pts[:, 1], segs).min(axis=1)
            <= de9im._EPS
        )
    pt_parts = np.asarray(
        [p.coords for p in parts if p.type == model.POINT], dtype=np.float64
    ).reshape(-1, 2)
    if len(pt_parts):
        out |= de9im._pts_equal_any(pts, pt_parts)
    return out


def _prefix_segs(parts: list[Geom]) -> np.ndarray:
    segs = [p.segments() for p in parts if p.type != model.POINT]
    segs = [s for s in segs if len(s)]
    return np.concatenate(segs) if segs else np.zeros((0, 4))


def _split_pieces(segs: np.ndarray, pool: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split every directed segment at all meeting points with the
    pooled segment set (bbox-prefiltered); returns (start, end) pairs
    preserving direction."""
    pieces: list[tuple[np.ndarray, np.ndarray]] = []
    if not len(segs):
        return pieces
    if len(pool):
        px0 = np.minimum(pool[:, 0], pool[:, 2])
        px1 = np.maximum(pool[:, 0], pool[:, 2])
        py0 = np.minimum(pool[:, 1], pool[:, 3])
        py1 = np.maximum(pool[:, 1], pool[:, 3])
    eps = de9im._EPS
    for seg in segs:
        a = seg[:2]
        d = seg[2:] - seg[:2]
        if len(pool):
            sx0, sx1 = min(seg[0], seg[2]) - eps, max(seg[0], seg[2]) + eps
            sy0, sy1 = min(seg[1], seg[3]) - eps, max(seg[1], seg[3]) + eps
            near = (px0 <= sx1) & (px1 >= sx0) & (py0 <= sy1) & (py1 >= sy0)
            ts = de9im._split_ts(seg, pool[near]) if near.any() else []
        else:
            ts = []
        tt = [0.0] + ts + [1.0]
        for t0, t1 in zip(tt[:-1], tt[1:]):
            if t1 > t0:
                pieces.append((a + d * t0, a + d * t1))
    return pieces


def _snap_nodes(pts: np.ndarray, eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Cluster points within eps (union-find over the close-pair graph,
    discovered via eps-grid bucketing so complex inputs stay near-linear
    instead of materializing an n×n close-pair matrix); returns
    (representative_xy per cluster, cluster_id per input point)."""
    n = len(pts)
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:  # attach larger root to smaller: rep = min index,
            if rj < ri:  # deterministic regardless of discovery order
                ri, rj = rj, ri
            parent[rj] = ri

    # two points within eps (Chebyshev) land in the same or an adjacent
    # cell of an eps-sized grid; same-cell points are ALWAYS within eps,
    # so they union without any pairwise test
    gx = np.floor(pts[:, 0] / eps).astype(np.int64)
    gy = np.floor(pts[:, 1] / eps).astype(np.int64)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        buckets.setdefault((int(gx[i]), int(gy[i])), []).append(i)
    for (cx, cy), idxs in buckets.items():
        for j in idxs[1:]:
            union(idxs[0], j)
        a = pts[idxs]
        # half the 8-neighborhood so each cell pair is tested once
        for dx, dy in ((1, -1), (1, 0), (1, 1), (0, 1)):
            nb = buckets.get((cx + dx, cy + dy))
            if not nb:
                continue
            b = pts[nb]
            close = (np.abs(a[:, None, 0] - b[None, :, 0]) <= eps) & (
                np.abs(a[:, None, 1] - b[None, :, 1]) <= eps
            )
            for ii, jj in zip(*np.nonzero(close)):
                union(idxs[int(ii)], nb[int(jj)])
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    uniq, ids = np.unique(roots, return_inverse=True)
    return pts[uniq], ids


def _assemble_rings(node_xy: np.ndarray, edges: list[tuple[int, int]]) -> list[np.ndarray]:
    """Decompose the directed-edge set into boundary rings via face
    traversal: at each node take the outgoing edge with the smallest
    clockwise angle from the reversed incoming direction."""
    out_edges: dict[int, list[int]] = {}
    ang = np.zeros(len(edges))
    for eid, (u, v) in enumerate(edges):
        out_edges.setdefault(u, []).append(eid)
        d = node_xy[v] - node_xy[u]
        ang[eid] = np.arctan2(d[1], d[0])
    used = np.zeros(len(edges), dtype=bool)
    rings: list[np.ndarray] = []
    for start in range(len(edges)):
        if used[start]:
            continue
        nodes: list[int] | None = []
        walk: list[int] = []  # edges consumed by THIS walk, for rollback
        eid = start
        for _ in range(len(edges) + 1):
            used[eid] = True
            walk.append(eid)
            u, v = edges[eid]
            nodes.append(u)
            best, best_th = -1, np.inf
            rev = ang[eid] + np.pi
            for cand in out_edges.get(v, ()):  # pick the face successor
                th = (rev - ang[cand]) % _TWO_PI
                if th < 1e-12:
                    th = _TWO_PI  # exact backtrack: last resort
                if th < best_th:
                    best, best_th = cand, th
            if best < 0:
                nodes = None  # dangling node — malformed, drop walk
                break
            eid = best
            if eid == start:
                break
            if used[eid]:
                nodes = None  # successor consumed by another face
                break
        else:
            nodes = None
        if nodes:
            ring = node_xy[np.asarray(nodes + [nodes[0]], dtype=np.int64)]
            rings.append(ring)
        else:
            # roll back the abandoned walk: a valid adjacent ring may
            # still recover these edges from a different start
            used[np.asarray(walk, dtype=np.int64)] = False
    return rings


def _ring_interior_point(ring: np.ndarray) -> np.ndarray | None:
    a = _signed_area(ring)
    if a < 0:
        ring = ring[::-1]
    pts = de9im._interior_points(Geom(model.POLYGON, [ring]))
    return pts[0] if len(pts) else None


def _build_area(rings: list[np.ndarray]) -> Geom:
    """Shells (CCW) + holes (CW) → Polygon / MultiPolygon; holes attach
    to the smallest containing shell. Slivers thinner than eps drop."""
    shells: list[tuple[np.ndarray, float]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        a = _signed_area(r)
        perim = float(
            np.hypot(np.diff(r[:, 0]), np.diff(r[:, 1])).sum()
        )
        if abs(a) <= de9im._EPS * max(perim, 1.0):
            continue
        if a > 0:
            shells.append((r, a))
        else:
            holes.append(r)
    if not shells:
        return Geom(model.POLYGON, [])
    groups: list[list[np.ndarray]] = [[s] for s, _ in shells]
    for h in holes:
        pt = _ring_interior_point(h)
        if pt is None:
            continue
        # the parent shell must CONTAIN the hole, not merely the test
        # point: a shell nested INSIDE the hole (a donut's inner island
        # band) also contains the hole's interior point and, being
        # smaller, would steal it. Rings of a planar arrangement never
        # cross, so envelope containment separates hole ⊂ shell from
        # shell ⊂ hole (equal-envelope contact degenerates aside).
        env_tol = de9im._EPS
        cands = []
        for i, (s, a) in enumerate(shells):
            if (
                s[:, 0].min() <= h[:, 0].min() + env_tol
                and s[:, 1].min() <= h[:, 1].min() + env_tol
                and s[:, 0].max() >= h[:, 0].max() - env_tol
                and s[:, 1].max() >= h[:, 1].max() - env_tol
                and kernel._pip_rings(pt[:1], pt[1:2], [s])[0]
            ):
                cands.append((a, i))
        if cands:
            groups[min(cands)[1]].append(h)
    parts = [Geom(model.POLYGON, rs) for rs in groups]
    return parts[0] if len(parts) == 1 else Geom(model.MULTIPOLYGON, parts)


def _combine(ina: np.ndarray, inb: np.ndarray, op: str) -> np.ndarray:
    if op == "intersection":
        return ina & inb
    if op == "union":
        return ina | inb
    if op == "difference":
        return ina & ~inb
    return ina ^ inb  # symdifference


# ------------------------------------------------------ area x area


def _area_overlay(a_parts: list[Geom], b_parts: list[Geom], op: str) -> Geom:
    sa, sb = _part_segs(a_parts), _part_segs(b_parts)
    pool = np.concatenate([sa, sb]) if len(sb) else sa
    pieces = _split_pieces(pool, pool)
    if not pieces:
        return Geom(model.POLYGON, [])
    p0 = np.asarray([p[0] for p in pieces])
    p1 = np.asarray([p[1] for p in pieces])
    d = p1 - p0
    ln = np.hypot(d[:, 0], d[:, 1])
    ok = ln > 0
    p0, p1, d, ln = p0[ok], p1[ok], d[ok], ln[ok]
    mid = (p0 + p1) / 2.0
    nrm = np.column_stack([-d[:, 1], d[:, 0]]) / ln[:, None]
    off = de9im._EPS * 1e3
    left = mid + off * nrm
    right = mid - off * nrm
    res_l = _combine(_in_area(left, a_parts), _in_area(left, b_parts), op)
    res_r = _combine(_in_area(right, a_parts), _in_area(right, b_parts), op)
    keep = res_l != res_r
    if not keep.any():
        return Geom(model.POLYGON, [])
    flip = (~res_l)[keep]
    ks, ke = p0[keep], p1[keep]
    starts = np.where(flip[:, None], ke, ks)
    ends = np.where(flip[:, None], ks, ke)
    node_xy, ids = _snap_nodes(np.concatenate([starts, ends]), de9im._EPS * 4)
    m = len(starts)
    seen: set[tuple[int, int]] = set()
    edges: list[tuple[int, int]] = []
    for u, v in zip(ids[:m], ids[m:]):
        u, v = int(u), int(v)
        if u == v or (u, v) in seen:
            continue  # snapped-degenerate or shared collinear duplicate
        seen.add((u, v))
        edges.append((u, v))
    return _build_area(_assemble_rings(node_xy, edges))


def _area_touch_set(a_parts: list[Geom], b_parts: list[Geom]) -> Geom:
    """Lower-dimensional contact of two areas whose areal intersection
    is empty: shared collinear boundary runs + isolated touch points."""
    sa, sb = _part_segs(a_parts), _part_segs(b_parts)
    lines: list[np.ndarray] = []
    for seg in sa:
        a = seg[:2]
        d = seg[2:] - seg[:2]
        for lo, hi in de9im._cover_intervals(seg, sb):
            lines.append(np.vstack([a + d * lo, a + d * hi]))
    pts = de9im._meet_points(sa, sb)
    if len(lines):
        lsegs = np.asarray([[l[0, 0], l[0, 1], l[1, 0], l[1, 1]] for l in lines])
        if len(pts):
            on = (
                kernel._point_seg_dist_matrix(pts[:, 0], pts[:, 1], lsegs).min(axis=1)
                <= de9im._EPS
            )
            pts = pts[~on]
    out: list[Geom] = [Geom(model.LINESTRING, l) for l in lines]
    out.extend(Geom(model.POINT, p) for p in pts)
    return _pack(out, empty_dim=2)


# ----------------------------------------------------- line clipping


def _line_parts(g: Geom) -> list[Geom]:
    return [p for p in g.flatten() if p.type == model.LINESTRING and len(p.coords) >= 2]


def _point_rows(g: Geom) -> np.ndarray:
    pts = [
        np.asarray(p.coords, dtype=np.float64)
        for p in g.flatten()
        if p.type == model.POINT and not np.isnan(p.coords).any()
    ]
    return np.asarray(pts).reshape(-1, 2)


def _clip_lines(lines: list[Geom], other: Geom, want_inside: bool) -> list[Geom]:
    """Pieces of ``lines`` whose midpoint is covered by (want_inside)
    or strictly outside (not want_inside) closure(other); contiguous
    kept pieces stitch back into linestrings."""
    other_segs = _prefix_segs([p for p in other.flatten()])
    out: list[Geom] = []
    for part in lines:
        c = part.coords
        segs = np.hstack([c[:-1], c[1:]])
        keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
        pieces = _split_pieces(segs[keep], other_segs)
        if not pieces:
            continue
        mids = np.asarray([(p[0] + p[1]) / 2.0 for p in pieces])
        cov = _covered(mids, other)
        sel = cov if want_inside else ~cov
        run: list[np.ndarray] = []
        for i, (s, e) in enumerate(pieces):
            if sel[i]:
                if run and not np.allclose(run[-1], s, atol=de9im._EPS):
                    out.append(Geom(model.LINESTRING, np.vstack(run)))
                    run = []
                if not run:
                    run.append(s)
                run.append(e)
            elif run:
                out.append(Geom(model.LINESTRING, np.vstack(run)))
                run = []
        if run:
            out.append(Geom(model.LINESTRING, np.vstack(run)))
    return out


def _pack(parts: list[Geom], empty_dim: int) -> Geom:
    parts = [p for p in parts if not _is_empty(p)]
    if not parts:
        if empty_dim == 2:
            return Geom(model.POLYGON, [])
        if empty_dim == 1:
            return Geom(model.LINESTRING, np.zeros((0, 2)))
        return Geom(model.POINT, np.array([np.nan, np.nan]))
    types = {p.type for p in parts}
    if len(parts) == 1:
        return parts[0]
    multi_of = {
        model.POINT: model.MULTIPOINT,
        model.LINESTRING: model.MULTILINESTRING,
        model.POLYGON: model.MULTIPOLYGON,
    }
    if len(types) == 1 and (t := types.pop()) in multi_of:
        return Geom(multi_of[t], parts)
    return Geom(model.GEOMETRYCOLLECTION, parts)


def _dedup_points(pts: np.ndarray) -> np.ndarray:
    if len(pts) <= 1:
        return pts
    keep = np.ones(len(pts), dtype=bool)
    for i in range(1, len(pts)):
        if de9im._pts_equal_any(pts[i : i + 1], pts[:i][keep[:i]]).any():
            keep[i] = False
    return pts[keep]


# ------------------------------------------------------------ public


def overlay(a: Geom, b: Geom, op: str) -> Geom:
    """Boolean overlay of two geometries. ``op`` in {'intersection',
    'union', 'difference', 'symdifference'}. GeometryCollection
    operands are rejected (JTS OverlayOp parity)."""
    if op not in _OPS:
        raise ValueError(f"unknown overlay op {op!r}")
    for g in (a, b):
        if g.type == model.GEOMETRYCOLLECTION:
            raise ValueError("overlay is undefined for GeometryCollection")
    de9im._set_scale(a, b)
    ea, eb = _is_empty(a), _is_empty(b)
    da = a.dimension() if not ea else -1
    db = b.dimension() if not eb else -1
    if ea and eb:
        return _pack([], empty_dim=max(da, db, 0))
    if ea:
        if op in ("union", "symdifference"):
            return b
        return _pack([], empty_dim=db if op == "intersection" else 0)
    if eb:
        if op == "intersection":
            return _pack([], empty_dim=min(da, db) if db >= 0 else da)
        return a

    if op == "intersection":
        return _intersection(a, b, da, db)
    if op == "difference":
        return _difference(a, b, da, db)
    if op == "union":
        return _union(a, b, da, db)
    # symdifference
    if da == db == 2:
        return _area_overlay(_normalize_parts(a), _normalize_parts(b), "symdifference")
    if da == db:
        return _pack(
            _flat(_difference(a, b, da, db)) + _flat(_difference(b, a, db, da)),
            empty_dim=da,
        )
    return _pack(
        _flat(_difference(a, b, da, db)) + _flat(_difference(b, a, db, da)),
        empty_dim=max(da, db),
    )


def _flat(g: Geom) -> list[Geom]:
    return [] if _is_empty(g) else [p for p in g.flatten() if not _is_empty(p)]


def _intersection(a: Geom, b: Geom, da: int, db: int) -> Geom:
    if da > db:  # symmetric; put the lower dimension first
        return _intersection(b, a, db, da)
    if da == 0:
        pts = _point_rows(a)
        pts = pts[_covered(pts, b)] if len(pts) else pts
        return _pack([Geom(model.POINT, p) for p in _dedup_points(pts)], empty_dim=0)
    if da == 1 and db == 2:
        lines = _clip_lines(_line_parts(a), b, want_inside=True)
        return _pack(lines, empty_dim=1)
    if da == 1 and db == 1:
        sa = _prefix_segs(_line_parts(a))
        sb = _prefix_segs(_line_parts(b))
        lines: list[Geom] = []
        lsegs = []
        for seg in sa:
            p = seg[:2]
            d = seg[2:] - seg[:2]
            for lo, hi in _merge_intervals(de9im._cover_intervals(seg, sb)):
                lines.append(Geom(model.LINESTRING, np.vstack([p + d * lo, p + d * hi])))
                lsegs.append([*(p + d * lo), *(p + d * hi)])
        pts = de9im._meet_points(sa, sb)
        if len(pts) and lsegs:
            on = (
                kernel._point_seg_dist_matrix(
                    pts[:, 0], pts[:, 1], np.asarray(lsegs)
                ).min(axis=1)
                <= de9im._EPS
            )
            pts = pts[~on]
        pts = _dedup_points(pts)
        return _pack(lines + [Geom(model.POINT, p) for p in pts], empty_dim=1)
    # area x area
    ap, bp = _normalize_parts(a), _normalize_parts(b)
    out = _area_overlay(ap, bp, "intersection")
    if _is_empty(out) and kernel.intersects(a, b):
        return _area_touch_set(ap, bp)
    return out


def _merge_intervals(ivs: list[tuple[float, float]]) -> list[tuple[float, float]]:
    out: list[list[float]] = []
    for lo, hi in sorted(ivs):
        if out and lo <= out[-1][1] + 1e-12:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [(lo, hi) for lo, hi in out]


def _difference(a: Geom, b: Geom, da: int, db: int) -> Geom:
    if da == 0:
        pts = _point_rows(a)
        pts = pts[~_covered(pts, b)] if len(pts) else pts
        return _pack([Geom(model.POINT, p) for p in _dedup_points(pts)], empty_dim=0)
    if da == 1:
        if db == 0:
            return a  # removing finitely many points keeps the line (JTS)
        if db == 2:
            return _pack(_clip_lines(_line_parts(a), b, want_inside=False), empty_dim=1)
        # line minus line: drop collinear-covered intervals
        sb = _prefix_segs(_line_parts(b))
        out: list[Geom] = []
        for part in _line_parts(a):
            c = part.coords
            segs = np.hstack([c[:-1], c[1:]])
            run: list[np.ndarray] = []
            for seg in segs:
                p = seg[:2]
                d = seg[2:] - seg[:2]
                covered = _merge_intervals(de9im._cover_intervals(seg, sb))
                t = 0.0
                for lo, hi in covered + [(1.0, 1.0)]:
                    if lo > t:
                        s, e = p + d * t, p + d * lo
                        if run and not np.allclose(run[-1], s, atol=de9im._EPS):
                            out.append(Geom(model.LINESTRING, np.vstack(run)))
                            run = []
                        if not run:
                            run.append(s)
                        run.append(e)
                    elif run and lo < 1.0:
                        out.append(Geom(model.LINESTRING, np.vstack(run)))
                        run = []
                    t = max(t, hi)
            if run:
                out.append(Geom(model.LINESTRING, np.vstack(run)))
        return _pack(out, empty_dim=1)
    # a is areal
    if db < 2:
        return a  # subtracting a measure-zero set (JTS)
    return _area_overlay(_normalize_parts(a), _normalize_parts(b), "difference")


def _union(a: Geom, b: Geom, da: int, db: int) -> Geom:
    if da == db == 2:
        return _area_overlay(_normalize_parts(a), _normalize_parts(b), "union")
    if da == db == 0:
        pts = _dedup_points(np.concatenate([_point_rows(a), _point_rows(b)]))
        return _pack([Geom(model.POINT, p) for p in pts], empty_dim=0)
    if da == db == 1:
        # noded union: B's collinear-covered intervals drop, the rest
        # of B joins A unchanged
        return _pack(_flat(a) + _flat(_difference(b, a, 1, 1)), empty_dim=1)
    # mixed dimensions: higher-dim geometry + lower-dim remainder
    hi, lo = (a, b) if da > db else (b, a)
    dhi, dlo = max(da, db), min(da, db)
    rem = _difference(lo, hi, dlo, dhi)
    return _pack(_flat(hi) + _flat(rem), empty_dim=dhi)


def dissolve(g: Geom) -> Geom:
    """Union of all polygon parts of one geometry (self-overlaps
    merge); non-areal parts are ignored. Empty input → POLYGON EMPTY."""
    de9im._set_scale(g)
    parts = _normalize_parts(g)
    if not parts:
        return Geom(model.POLYGON, [])
    return _area_overlay(parts, [], "union")


def union_all(geoms: list[Geom]) -> Geom:
    """Aggregate union (ST_UnionAggr). Areal parts dissolve in one
    overlay pass (parts whose envelope touches no other part skip the
    splitting entirely); lines/points pass through noded against the
    dissolved area via the pairwise rules."""
    flat: list[Geom] = []
    for g in geoms:
        if g is not None and not _is_empty(g):
            flat.extend(p for p in g.flatten() if not _is_empty(p))
    areal = [p for p in flat if p.type == model.POLYGON]
    rest = [p for p in flat if p.type != model.POLYGON]
    out: list[Geom] = []
    if areal:
        pooled = Geom(model.MULTIPOLYGON, areal)
        de9im._set_scale(pooled)
        parts = _normalize_parts(pooled)
        # isolated parts skip the O(n^2) split entirely
        envs = np.asarray([p.envelope() for p in parts])
        inter = (
            (envs[:, None, 0] <= envs[None, :, 2])
            & (envs[:, None, 2] >= envs[None, :, 0])
            & (envs[:, None, 1] <= envs[None, :, 3])
            & (envs[:, None, 3] >= envs[None, :, 1])
        )
        np.fill_diagonal(inter, False)
        touched = inter.any(axis=1)
        alone = [p for p, t in zip(parts, touched) if not t]
        grouped = [p for p, t in zip(parts, touched) if t]
        dsv = _area_overlay(grouped, [], "union") if grouped else Geom(model.POLYGON, [])
        out.extend(_flat(dsv) + alone)
    area_g = _pack([p for p in out], empty_dim=2) if out else None
    for p in rest:
        if area_g is not None and not _is_empty(area_g):
            rem = overlay(p, area_g, "difference")
            out.extend(_flat(rem))
        else:
            out.append(p)
    return _pack(out, empty_dim=2 if areal else (1 if rest else 2))


def split_geom(g: Geom, blade: Geom) -> Geom:
    """ST_Split: polygon by line, line by line, line by point(s).
    Returns a GeometryCollection of the parts (PostGIS semantics);
    a blade that doesn't cross returns collection(g)."""
    de9im._set_scale(g, blade)
    dg = g.dimension()
    dbl = blade.dimension()
    if dg == 2 and dbl == 1:
        return _split_area_by_line(g, blade)
    if dg == 1 and dbl == 1:
        pts = de9im._meet_points(
            _prefix_segs(_line_parts(g)), _prefix_segs(_line_parts(blade))
        )
        return _split_lines_at(g, pts)
    if dg == 1 and dbl == 0:
        return _split_lines_at(g, _point_rows(blade))
    raise ValueError(f"ST_Split: unsupported dimensions ({dg} by {dbl})")


def _split_lines_at(g: Geom, pts: np.ndarray) -> Geom:
    out: list[Geom] = []
    for part in _line_parts(g):
        c = part.coords
        segs = np.hstack([c[:-1], c[1:]])
        run: list[np.ndarray] = [c[0]]
        for seg in segs:
            a = seg[:2]
            d = seg[2:] - seg[:2]
            L2 = float(d @ d)
            cuts = []
            if len(pts) and L2 > 0:
                dist = kernel._point_seg_dist_matrix(
                    pts[:, 0], pts[:, 1], seg.reshape(1, 4)
                )[:, 0]
                for p in pts[dist <= de9im._EPS]:
                    t = float((p - a) @ d) / L2
                    if 1e-12 < t < 1 - 1e-12:
                        cuts.append(t)
            for t in sorted(cuts):
                run.append(a + d * t)
                out.append(Geom(model.LINESTRING, np.vstack(run)))
                run = [a + d * t]
            run.append(seg[2:])
            # interior VERTEX hit: cut between segments
            if len(pts) and de9im._pts_equal_any(seg[2:].reshape(1, 2), pts)[0] and not np.array_equal(seg[2:], c[-1]):
                out.append(Geom(model.LINESTRING, np.vstack(run)))
                run = [seg[2:]]
        if len(run) >= 2:
            out.append(Geom(model.LINESTRING, np.vstack(run)))
    return Geom(model.GEOMETRYCOLLECTION, out)


def _split_area_by_line(g: Geom, blade: Geom) -> Geom:
    parts = _normalize_parts(g)
    poly_segs = _part_segs(parts)
    blade_segs = _prefix_segs(_line_parts(blade))
    pool = np.concatenate([poly_segs, blade_segs])
    ring_pieces = _split_pieces(poly_segs, pool)
    blade_pieces = _split_pieces(blade_segs, pool)
    if blade_pieces:
        mids = np.asarray([(p[0] + p[1]) / 2.0 for p in blade_pieces])
        on_b = (
            kernel._point_seg_dist_matrix(mids[:, 0], mids[:, 1], poly_segs).min(axis=1)
            <= de9im._EPS
        )
        inside = _in_area(mids, parts) & ~on_b
        blade_pieces = [p for p, k in zip(blade_pieces, inside) if k]
    starts = [p[0] for p in ring_pieces] + [
        p[0] for p in blade_pieces
    ] + [p[1] for p in blade_pieces]
    ends = [p[1] for p in ring_pieces] + [
        p[1] for p in blade_pieces
    ] + [p[0] for p in blade_pieces]
    if not starts:
        return Geom(model.GEOMETRYCOLLECTION, [g])
    sxy = np.asarray(starts)
    exy = np.asarray(ends)
    node_xy, ids = _snap_nodes(np.concatenate([sxy, exy]), de9im._EPS * 4)
    m = len(sxy)
    seen: set[tuple[int, int]] = set()
    edges: list[tuple[int, int]] = []
    for u, v in zip(ids[:m], ids[m:]):
        u, v = int(u), int(v)
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        edges.append((u, v))
    rings = _assemble_rings(node_xy, edges)
    built = _build_area(rings)
    out = _flat(built)
    if not out:
        return Geom(model.GEOMETRYCOLLECTION, [g])
    return Geom(model.GEOMETRYCOLLECTION, out)
