"""Boolean overlay kernel (geom/overlay.py) + its SQL surface.

The reference inherits ST_Intersection / ST_Difference /
ST_SymDifference / ST_Union from Calcite's spatial operator table
(jdbc/Driver.scala:51-56, backed by JTS OverlayOp); no reference test
exercises them, so the batteries here are built from closed forms
(rect x rect), structural identities (area inclusion-exclusion), and
a randomized membership law against the kernel's own point-in-area
classifier.
"""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_sql_spark.geom import de9im, kernel, model, overlay
from geomesa_sql_spark.geom.wkb import geom_to_wkb
from geomesa_sql_spark.geom.wkt import geom_from_wkt, geom_to_wkt

OPS = ("intersection", "union", "difference", "symdifference")


def sq(x0, y0, x1, y1):
    return model.box(x0, y0, x1, y1)


# ------------------------------------------------------- closed forms


def test_rect_rect_closed_form():
    A, B = sq(0, 0, 2, 2), sq(1, 1, 3, 3)
    want = {"intersection": 1.0, "union": 7.0, "difference": 3.0, "symdifference": 6.0}
    for op, w in want.items():
        r = overlay.overlay(A, B, op)
        assert kernel.area(r) == pytest.approx(w, abs=1e-12), op
    # intersection is the overlap rect exactly
    r = overlay.overlay(A, B, "intersection")
    assert sorted(map(tuple, r.coords[0][:-1])) == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_contained_and_disjoint():
    A, C, D = sq(0, 0, 2, 2), sq(0.5, 0.5, 1.5, 1.5), sq(10, 10, 11, 11)
    assert kernel.area(overlay.overlay(A, C, "intersection")) == pytest.approx(1.0)
    assert kernel.area(overlay.overlay(A, C, "union")) == pytest.approx(4.0)
    donut = overlay.overlay(A, C, "difference")
    assert kernel.area(donut) == pytest.approx(3.0)
    assert donut.type == model.POLYGON and len(donut.coords) == 2  # hole!
    # disjoint
    i = overlay.overlay(A, D, "intersection")
    assert i.type == model.POLYGON and not i.coords  # POLYGON EMPTY
    u = overlay.overlay(A, D, "union")
    assert u.type == model.MULTIPOLYGON and len(u.coords) == 2
    assert kernel.area(u) == pytest.approx(5.0)


def test_donut_plus_plug_dissolves():
    A, C = sq(0, 0, 2, 2), sq(0.5, 0.5, 1.5, 1.5)
    donut = overlay.overlay(A, C, "difference")
    back = overlay.overlay(donut, C, "union")
    assert back.type == model.POLYGON and len(back.coords) == 1
    assert kernel.area(back) == pytest.approx(4.0)


def test_lower_dim_contact_sets():
    A = sq(0, 0, 2, 2)
    # shared edge → LINESTRING; corner touch → POINT (JTS-style)
    e = overlay.overlay(A, sq(2, 0, 4, 2), "intersection")
    assert e.type == model.LINESTRING and kernel.length(e) == pytest.approx(2.0)
    c = overlay.overlay(A, sq(2, 2, 3, 3), "intersection")
    assert c.type == model.POINT and tuple(c.coords) == (2.0, 2.0)
    # shared-edge union dissolves the interior edge: one 4-vertex-loop
    # region of area 8 with perimeter 12 (no seam)
    u = overlay.overlay(A, sq(2, 0, 4, 2), "union")
    assert kernel.area(u) == pytest.approx(8.0)
    assert kernel.length(u) == pytest.approx(12.0)


def test_pinch_point_decomposition():
    # corner-touching squares: symdifference decomposes at the pinch
    # into two simple rings, JTS-style, not one self-touching ring
    A, F = sq(0, 0, 2, 2), sq(2, 2, 3, 3)
    s = overlay.overlay(A, F, "symdifference")
    assert s.type == model.MULTIPOLYGON and len(s.coords) == 2
    assert kernel.area(s) == pytest.approx(5.0)


# ------------------------------------------------------- mixed dims


def test_line_area_clip():
    A = sq(0, 0, 2, 2)
    L = model.linestring([[-1, 1], [3, 1]])
    i = overlay.overlay(L, A, "intersection")
    assert i.type == model.LINESTRING
    np.testing.assert_allclose(i.coords, [[0, 1], [2, 1]])
    d = overlay.overlay(L, A, "difference")
    assert d.type == model.MULTILINESTRING and kernel.length(d) == pytest.approx(2.0)
    # area minus line / area union line (JTS: measure-zero subtraction)
    assert kernel.area(overlay.overlay(A, L, "difference")) == pytest.approx(4.0)
    u = overlay.overlay(L, A, "union")
    assert u.type == model.GEOMETRYCOLLECTION
    assert kernel.area(u) == pytest.approx(4.0)
    assert kernel.length(u) == pytest.approx(8.0 + 2.0)  # perimeter + overhangs


def test_line_line_and_points():
    L2 = model.linestring([[0, 0], [4, 0]])
    L3 = model.linestring([[1, 0], [2, 0]])
    i = overlay.overlay(L2, L3, "intersection")
    assert i.type == model.LINESTRING and kernel.length(i) == pytest.approx(1.0)
    d = overlay.overlay(L2, L3, "difference")
    assert d.type == model.MULTILINESTRING and kernel.length(d) == pytest.approx(3.0)
    x = overlay.overlay(
        model.linestring([[0, -1], [0, 1]]), model.linestring([[-1, 0], [1, 0]]), "intersection"
    )
    assert x.type == model.POINT and tuple(x.coords) == (0.0, 0.0)
    A = sq(0, 0, 2, 2)
    assert overlay.overlay(model.point(1, 1), A, "intersection").type == model.POINT
    empty = overlay.overlay(model.point(5, 5), A, "intersection")
    assert overlay._is_empty(empty)
    mp = model.multi(model.MULTIPOINT, [model.point(1, 1), model.point(5, 5)])
    r = overlay.overlay(mp, A, "difference")
    assert r.type == model.POINT and tuple(r.coords) == (5.0, 5.0)


# ------------------------------------------------------------- split


def test_split_square_and_donut():
    A = sq(0, 0, 2, 2)
    blade = model.linestring([[1, -1], [1, 3]])
    r = overlay.split_geom(A, blade)
    assert r.type == model.GEOMETRYCOLLECTION and len(r.coords) == 2
    assert sorted(kernel.area(p) for p in r.coords) == pytest.approx([2.0, 2.0])
    donut = overlay.overlay(A, sq(0.5, 0.5, 1.5, 1.5), "difference")
    r2 = overlay.split_geom(donut, blade)
    areas = sorted(kernel.area(p) for p in r2.coords)
    assert areas == pytest.approx([1.5, 1.5])
    # non-crossing blade → collection(original)
    r3 = overlay.split_geom(A, model.linestring([[5, 0], [5, 2]]))
    assert len(r3.coords) == 1 and kernel.area(r3.coords[0]) == pytest.approx(4.0)


def test_split_lines():
    r = overlay.split_geom(
        model.linestring([[0, 0], [2, 0], [4, 0]]), model.point(1, 0)
    )
    assert [len(p.coords) for p in r.coords] == [2, 3]
    r2 = overlay.split_geom(
        model.linestring([[0, 0], [2, 0]]), model.linestring([[1, -1], [1, 1]])
    )
    assert len(r2.coords) == 2
    assert all(kernel.length(p) == pytest.approx(1.0) for p in r2.coords)
    # splitting at an interior VERTEX cuts there too
    r3 = overlay.split_geom(
        model.linestring([[0, 0], [2, 0], [4, 0]]), model.point(2, 0)
    )
    assert len(r3.coords) == 2


# ------------------------------------------- dissolve / aggregate


def test_dissolve_and_union_all():
    mp = model.multi(
        model.MULTIPOLYGON, [sq(0, 0, 2, 2), sq(1, 1, 3, 3), sq(10, 10, 11, 11)]
    )
    dv = overlay.dissolve(mp)
    assert dv.type == model.MULTIPOLYGON and len(dv.coords) == 2
    assert kernel.area(dv) == pytest.approx(8.0)
    ua = overlay.union_all(
        [sq(0, 0, 2, 2), sq(1, 1, 3, 3), model.point(50, 50), model.linestring([[0, 1], [5, 1]])]
    )
    assert ua.type == model.GEOMETRYCOLLECTION
    assert kernel.area(ua) == pytest.approx(7.0)
    # the line keeps only its run outside the dissolved area
    lines = [p for p in ua.coords if p.type == model.LINESTRING]
    assert len(lines) == 1 and kernel.length(lines[0]) == pytest.approx(2.0)


# ------------------------------------------------- randomized laws


def _star_ring(rng, cx, cy, rmin, rmax, n):
    # stratified angles keep every gap < pi, which guarantees the
    # radial polygon is simple (a free-sorted draw does NOT: a gap
    # > pi lets an edge cross the far side)
    ang = 2 * np.pi * (np.arange(n) + rng.uniform(0, 0.9, n)) / n
    rad = rng.uniform(rmin, rmax, n)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _rand_geom(rng, kind):
    cx, cy = rng.uniform(-1, 1, 2)
    if kind == 0:  # plain star polygon
        return model.polygon(_star_ring(rng, cx, cy, 0.3, 2.0, int(rng.integers(4, 14))))
    if kind == 1:  # with hole
        return model.polygon(
            _star_ring(rng, cx, cy, 1.2, 2.2, int(rng.integers(5, 12))),
            _star_ring(rng, cx, cy, 0.2, 0.8, int(rng.integers(4, 9))),
        )
    return model.multi(  # two-part multipolygon
        model.MULTIPOLYGON,
        [
            model.polygon(_star_ring(rng, cx - 1.2, cy, 0.3, 1.0, int(rng.integers(4, 10)))),
            model.polygon(_star_ring(rng, cx + 1.2, cy, 0.3, 1.0, int(rng.integers(4, 10)))),
        ],
    )


def test_randomized_overlay_laws():
    """Inclusion-exclusion + membership agreement on 60 random pairs
    covering plain/holed/multi polygons."""
    rng = np.random.default_rng(20260817)
    for trial in range(60):
        A = _rand_geom(rng, trial % 3)
        B = _rand_geom(rng, (trial // 3) % 3)
        res = {op: overlay.overlay(A, B, op) for op in OPS}
        aA, aB = kernel.area(A), kernel.area(B)
        aI = kernel.area(res["intersection"])
        aU = kernel.area(res["union"])
        tol = 1e-6 * max(aA, aB, 1.0)
        assert abs(aA + aB - aU - aI) < tol, trial
        assert abs(kernel.area(res["difference"]) - (aA - aI)) < tol, trial
        assert abs(kernel.area(res["symdifference"]) - (aU - aI)) < tol, trial
        # membership law at points clear of every boundary involved
        pts = rng.uniform(-4, 4, size=(250, 2))
        de9im._set_scale(A, B)
        segs = np.vstack([A.segments(), B.segments()])
        pts = pts[
            kernel._point_seg_dist_matrix(pts[:, 0], pts[:, 1], segs).min(axis=1) > 1e-3
        ]
        in_a = overlay._in_area(pts, overlay._normalize_parts(A))
        in_b = overlay._in_area(pts, overlay._normalize_parts(B))
        want = {
            "intersection": in_a & in_b,
            "union": in_a | in_b,
            "difference": in_a & ~in_b,
            "symdifference": in_a ^ in_b,
        }
        for op in OPS:
            parts = overlay._normalize_parts(res[op])
            got = overlay._in_area(pts, parts)
            bad = got != want[op]
            if bad.any():
                rs = res[op].segments() if parts else np.zeros((0, 4))
                if len(rs):
                    dr = kernel._point_seg_dist_matrix(
                        pts[bad, 0], pts[bad, 1], rs
                    ).min(axis=1)
                    assert (dr <= 1e-3).all(), (trial, op)
                else:
                    raise AssertionError((trial, op, int(bad.sum())))


def test_split_partition_law():
    """split pieces partition the polygon: areas sum to the original
    and pieces are interior-disjoint (pairwise intersection ~ 0)."""
    rng = np.random.default_rng(99)
    for _ in range(15):
        P = model.polygon(_star_ring(rng, 0, 0, 0.5, 2.0, int(rng.integers(5, 12))))
        y0 = rng.uniform(-0.4, 0.4)
        blade = model.linestring([[-3, y0], [3, y0 + rng.uniform(-0.5, 0.5)]])
        r = overlay.split_geom(P, blade)
        assert sum(kernel.area(p) for p in r.coords) == pytest.approx(
            kernel.area(P), rel=1e-9
        )
        for i in range(len(r.coords)):
            for j in range(i + 1, len(r.coords)):
                aij = kernel.area(overlay.overlay(r.coords[i], r.coords[j], "intersection"))
                assert aij < 1e-9


# --------------------------------------------------------- SQL surface


def test_sql_overlay_surface(spark):
    from geomesa_sql_spark.functions.st import register_all

    register_all(spark)
    r = spark.sql(
        """SELECT
             ST_Area(ST_Intersection(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                                     ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS ai,
             ST_Area(ST_Difference(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                                   ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS ad,
             ST_Area(ST_SymDifference(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                                      ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS asym,
             ST_Area(ST_Union(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                              ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS au,
             ST_NumGeometries(ST_Split(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                                       ST_GeomFromText('LINESTRING (1 -1, 1 3)'))) AS nsplit
        """
    ).first()
    assert r.ai == pytest.approx(1.0)
    assert r.ad == pytest.approx(3.0)
    assert r.asym == pytest.approx(6.0)
    assert r.au == pytest.approx(7.0)
    assert r.nsplit == 2


def test_sql_union_aggr(spark):
    from geomesa_sql_spark.functions.st import register_all

    register_all(spark)
    rows = [
        ("a", geom_to_wkb(sq(0, 0, 2, 2))),
        ("a", geom_to_wkb(sq(1, 1, 3, 3))),
        ("a", geom_to_wkb(sq(10, 10, 11, 11))),
        ("b", geom_to_wkb(sq(0, 0, 1, 1))),
        ("b", None),
    ]
    spark.createDataFrame(rows, "k string, g binary").createOrReplaceTempView(
        "ua_probe"
    )
    got = {
        r.k: (r.area, r.nparts)
        for r in spark.sql(
            """SELECT k, ST_Area(ST_UnionAggr(g)) AS area,
                      ST_NumGeometries(ST_UnionAggr(g)) AS nparts
               FROM ua_probe GROUP BY k"""
        ).collect()
    }
    assert got["a"][0] == pytest.approx(8.0) and got["a"][1] == 2
    assert got["b"][0] == pytest.approx(1.0) and got["b"][1] == 1


def test_union_collection_fallback(spark):
    """GeometryCollection operands (JTS rejects) keep the documented
    predicate-equivalent collection-union semantics."""
    from geomesa_sql_spark.functions.st import register_all

    register_all(spark)
    got = spark.sql(
        """SELECT ST_Intersects(ST_MakePoint(9.0, 9.0),
                      ST_Union(ST_Union(ST_GeomFromText('POINT (9 9)'),
                                        ST_GeomFromText('LINESTRING (0 0, 1 1)')),
                               ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))) AS hit"""
    ).first()
    assert got.hit


def test_overlay_wkt_roundtrip_stability():
    """Overlay output survives WKT round-trip (rings closed, types
    canonical)."""
    A, B = sq(0, 0, 2, 2), sq(1, 1, 3, 3)
    for op in OPS:
        g = overlay.overlay(A, B, op)
        g2 = geom_from_wkt(geom_to_wkt(g))
        assert kernel.area(g2) == pytest.approx(kernel.area(g))


def test_self_overlay_idempotence():
    """A op A with every edge collinear-shared: the dedup/orientation
    path must not double or drop edges."""
    rng = np.random.default_rng(7)
    A = model.polygon(
        _star_ring(rng, 0, 0, 1.2, 2.2, 9), _star_ring(rng, 0, 0, 0.2, 0.8, 6)
    )
    aA = kernel.area(A)
    assert kernel.area(overlay.overlay(A, A, "intersection")) == pytest.approx(aA)
    assert kernel.area(overlay.overlay(A, A, "union")) == pytest.approx(aA)
    assert kernel.area(overlay.overlay(A, A, "difference")) == 0.0
    assert kernel.area(overlay.overlay(A, A, "symdifference")) == 0.0


def test_island_in_hole_nesting():
    outer = model.polygon(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]],
    )
    island = model.polygon([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]])
    assert kernel.area(overlay.overlay(outer, island, "union")) == pytest.approx(68.0)
    assert kernel.area(overlay.overlay(outer, island, "intersection")) == 0.0
    assert kernel.area(overlay.overlay(island, outer, "difference")) == pytest.approx(4.0)


def test_difference_creates_hole():
    big = model.polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    small = model.polygon([[3, 3], [5, 3], [5, 5], [3, 5], [3, 3]])
    d = overlay.overlay(big, small, "difference")
    assert d.type == model.POLYGON and len(d.coords) == 2  # shell + hole
    assert kernel.area(d) == pytest.approx(96.0)


def test_shared_edge_and_corner_touch():
    a = model.polygon([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])
    b = model.polygon([[2, 0], [4, 0], [4, 2], [2, 2], [2, 0]])
    u = overlay.overlay(a, b, "union")
    # interior edge dissolves: one shell, no hole
    assert u.type == model.POLYGON and len(u.coords) == 1
    assert kernel.area(u) == pytest.approx(8.0)
    # edge-only contact → 1-dimensional intersection (JTS parity)
    i = overlay.overlay(a, b, "intersection")
    assert i.type == model.LINESTRING and kernel.length(i) == pytest.approx(2.0)
    # corner touch decomposes the pinch into two shells
    c = model.polygon([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]])
    u2 = overlay.overlay(a, c, "union")
    assert u2.type == model.MULTIPOLYGON and kernel.area(u2) == pytest.approx(8.0)


def test_split_multi_entry_blade():
    """A W-shaped blade entering and leaving the polygon multiple times
    splits it into one piece per crossing band."""
    rect = model.polygon([[0, 0], [12, 0], [12, 4], [0, 4], [0, 0]])
    blade = model.linestring([[1, -1], [3, 5], [5, -1], [7, 5], [9, -1]])
    s = overlay.split_geom(rect, blade)
    assert len(s.coords) == 5
    assert sum(kernel.area(p) for p in s.coords) == pytest.approx(48.0)
    # blade entirely outside: collection(g) unchanged
    s2 = overlay.split_geom(rect, model.linestring([[20, 0], [25, 5]]))
    assert len(s2.coords) == 1 and kernel.area(s2.coords[0]) == pytest.approx(48.0)


def test_line_symdifference_lengths():
    l1 = model.linestring([[0, 0], [10, 0]])
    l2 = model.linestring([[5, 0], [15, 0]])
    sd = overlay.overlay(l1, l2, "symdifference")
    assert kernel.length(sd) == pytest.approx(10.0)


def test_randomized_nested_band_dissolve_and_erosion():
    """Regression class for the r4c _build_area fix: shapes whose ring
    tree nests shell-in-hole-in-shell (band with an island inside its
    hole, the island holding its own sub-hole). The hole used to attach
    to the smallest shell containing one of its interior points — a
    shell nested INSIDE the hole steals it, yielding negative-area
    parts. 40 randomized configurations: exact membership law, exact
    area arithmetic, positive part areas, and the negative-buffer
    closed form over the multi-component result."""
    rng = np.random.default_rng(20260818)

    def jbox(cx, cy, hx, hy):
        return model.box(cx - hx, cy - hy, cx + hx, cy + hy), 4 * hx * hy

    for trial in range(40):
        cx, cy = rng.uniform(-3, 3, 2)
        h1 = rng.uniform(8, 10)
        h2 = h1 * rng.uniform(0.55, 0.68)
        h3 = h2 * rng.uniform(0.5, 0.65)
        h4 = h3 * rng.uniform(0.3, 0.45)
        # jitter inner centers within the nesting margin so the hole's
        # sampled interior point lands in varying components
        j2 = rng.uniform(-0.05, 0.05, 2) * h1
        j3 = rng.uniform(-0.05, 0.05, 2) * h2
        big, a_big = jbox(cx, cy, h1, h1 * rng.uniform(0.8, 1.0))
        hole, a_hole = jbox(cx + j2[0], cy + j2[1], h2, h2)
        island, a_isl = jbox(cx + j3[0], cy + j3[1], h3, h3)
        sub, a_sub = jbox(cx + j3[0], cy + j3[1], h4, h4)

        band = overlay.overlay(big, hole, "difference")
        ring_island = overlay.overlay(island, sub, "difference")
        res = overlay.overlay(band, ring_island, "union")

        # every assembled part carries positive area (the bug produced
        # a part whose stolen hole exceeded its shell)
        for p in res.flatten():
            assert kernel.area(p) > 0.0, trial

        want_area = (a_big - a_hole) + (a_isl - a_sub)
        assert abs(kernel.area(res) - want_area) < 1e-9 * want_area, trial

        # exact membership at points clear of all boundaries
        pts = rng.uniform(cx - h1, cx + h1, size=(300, 2))
        edges = np.vstack([g.segments() for g in (big, hole, island, sub)])
        pts = pts[
            kernel._point_seg_dist_matrix(pts[:, 0], pts[:, 1], edges).min(axis=1)
            > 1e-3
        ]
        want = (
            overlay._in_area(pts, overlay._normalize_parts(big))
            & ~overlay._in_area(pts, overlay._normalize_parts(hole))
        ) | (
            overlay._in_area(pts, overlay._normalize_parts(island))
            & ~overlay._in_area(pts, overlay._normalize_parts(sub))
        )
        got = overlay._in_area(pts, overlay._normalize_parts(res))
        assert (got == want).all(), trial

        # erosion by d=0.25 (every band is wider than 2d by
        # construction): each component erodes independently;
        # rectangle holes grow by A + P*d + A_64(d)
        d = 0.25
        a64d = 32.0 * d * d * np.sin(2 * np.pi / 64.0)
        ero = kernel.buffer_geom(res, -d)
        ex1 = (big.coords[0][:, 0].max() - big.coords[0][:, 0].min()) / 2
        ey1 = (big.coords[0][:, 1].max() - big.coords[0][:, 1].min()) / 2
        want_ero = (
            4 * (ex1 - d) * (ey1 - d) - (a_hole + 8 * h2 * d + a64d)
            + 4 * (h3 - d) * (h3 - d) - (a_sub + 8 * h4 * d + a64d)
        )
        assert abs(kernel.area(ero) - want_ero) < 1e-7 * want_area, trial
