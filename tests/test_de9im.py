"""DE-9IM (ST_Relate) matrices against JTS/PostGIS-derived truth.

Each expected string was derived by hand from the DE-9IM definition
(and cross-checked against the published PostGIS/JTS results for the
standard configurations). Pure-numpy — no Spark session needed.
"""

import pytest

from geomesa_sql_spark.geom import geom_from_wkt as W
from geomesa_sql_spark.geom.de9im import de9im, relate_pattern

SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ_HOLE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"

CASES = [
    # points
    ("POINT (1 2)", "POINT (1 2)", "0FFFFFFF2"),
    ("POINT (1 2)", "POINT (3 4)", "FF0FFF0F2"),
    ("MULTIPOINT ((1 1), (5 5))", "POINT (5 5)", "0F0FFFFF2"),
    # line-line
    ("LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)", "0F1FF0102"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)", "1FFF0FFF2"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (10 0, 20 0)", "FF1F00102"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 15 0)", "1010F0102"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (2 0, 8 0)", "101FF0FF2"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 5 5)", "F01FF0102"),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (0 5, 10 5)", "FF1FF0102"),
    # polygon-point
    (SQ, "POINT (5 5)", "0F2FF1FF2"),
    (SQ, "POINT (0 5)", "FF20F1FF2"),
    (SQ, "POINT (20 5)", "FF2FF10F2"),
    # polygon-line
    (SQ, "LINESTRING (-5 5, 15 5)", "1F20F1102"),
    (SQ, "LINESTRING (2 5, 8 5)", "102FF1FF2"),     # line inside
    (SQ, "LINESTRING (2 0, 8 0)", "FF2101FF2"),     # line on edge
    (SQ, "LINESTRING (5 5, 15 5)", "1020F1102"),    # inside -> out
    (SQ, "LINESTRING (10 2, 10 8)", "FF2101FF2"),   # ON right edge, endpoints ON ring
    # polygon-polygon
    (SQ, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", "212101212"),
    (SQ, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "212FF1FF2"),
    (SQ, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))", "FF2F11212"),
    (SQ, "POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))", "FF2FF1212"),
    (SQ, SQ, "2FFF1FFF2"),
    # corner touch (single point)
    (SQ, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", "FF2F01212"),
    # holes: B inside A's hole (disjoint through the hole)
    (SQ_HOLE, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))", "FF2FF1212"),
    # B covers A's hole exactly (B boundary == hole ring)
    (SQ_HOLE, "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))", "FF2F112F2"),
    # B overlaps A's material and pokes into the hole
    (SQ_HOLE, "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))", "212101212"),
    # A simple square vs B with a hole, A fills B's hole + more
    ("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", SQ_HOLE, "2121FF212"),
    # multi-geometries
    ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
     "((10 0, 14 0, 14 4, 10 4, 10 0)))",
     "POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))", "212101212"),
    ("MULTILINESTRING ((1 1, 2 2), (20 20, 21 21))", SQ, "1F10F0212"),
    ("MULTIPOINT ((5 5), (0 5), (20 20))", SQ, "000FFF212"),
]


@pytest.mark.parametrize("wa,wb,want", CASES, ids=range(len(CASES)))
def test_de9im_matrix(wa, wb, want):
    assert de9im(W(wa), W(wb)) == want


def test_de9im_transpose_symmetry():
    """de9im(b, a) is the transpose of de9im(a, b) for every case."""
    for wa, wb, want in CASES:
        m = de9im(W(wa), W(wb))
        t = de9im(W(wb), W(wa))
        got = "".join(m[3 * (i % 3) + i // 3] for i in range(9))
        assert got == t, (wa, wb)


def test_relate_pattern_matcher():
    a, b = W(SQ), W("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    assert relate_pattern(a, b, "T*T***T**")      # overlaps-ish
    assert relate_pattern(a, b, "212101212")
    assert not relate_pattern(a, b, "FF*FF****")  # disjoint pattern
    assert relate_pattern(a, W("POINT (5 5)"), "T*****FF*")  # contains
    with pytest.raises(ValueError):
        relate_pattern(a, b, "TT")


def test_de9im_agrees_with_named_predicates():
    """The matrix patterns must reproduce the kernel's own relate
    predicates (JTS pattern definitions) on a mixed battery."""
    from geomesa_sql_spark.geom import kernel

    geoms = [
        "POINT (5 5)", "POINT (0 0)", "POINT (20 20)",
        "LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)",
        "LINESTRING (2 2, 8 8)",
        SQ, SQ_HOLE,
        "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",
        "POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))",
    ]

    def im_intersects(m):
        return (m[0] != "F" or m[1] != "F" or m[3] != "F" or m[4] != "F")

    def im_within(m):
        return m[0] != "F" and m[2] == "F" and m[5] == "F"

    for wa in geoms:
        for wb in geoms:
            a, b = W(wa), W(wb)
            m = de9im(a, b)
            assert im_intersects(m) == kernel.intersects(a, b), (wa, wb, m)
            assert im_within(m) == kernel.within(a, b), (wa, wb, m)


def test_is_simple():
    from geomesa_sql_spark.geom.de9im import is_simple

    cases = [
        ("POINT (1 1)", True),
        ("MULTIPOINT ((1 1), (2 2))", True),
        ("MULTIPOINT ((1 1), (1 1))", False),
        ("LINESTRING (0 0, 10 0)", True),
        ("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)", True),    # closed ring
        ("LINESTRING (0 0, 10 10, 10 0, 0 10)", False),        # bowtie cross
        ("LINESTRING (0 0, 10 0, 5 0)", False),                # backtrack
        ("LINESTRING (0 0, 10 0, 10 10, 5 0)", False),         # touch interior
        ("MULTILINESTRING ((0 0, 10 0), (10 0, 20 0))", True),
        ("MULTILINESTRING ((0 0, 10 0), (5 -5, 5 5))", False),
        ("MULTILINESTRING ((0 0, 10 0), (5 0, 5 5))", False),  # T onto interior
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", True),
    ]
    for w, want in cases:
        assert is_simple(W(w)) == want, w


def test_rect_closed_form_matches_de9im():
    """The interval-arithmetic DE-9IM closed form for axis-aligned
    rectangles (replayed by the sql_st_measures DuckDB oracle) agrees
    with geom/de9im.py on random integer rectangles — including the
    shared-collinear-edge overlaps that motivated
    _area_interiors_intersect."""
    import random

    def rect_wkt(x0, y0, x1, y1):
        return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                f"{x0} {y1}, {x0} {y0}))")

    def rect_de9im(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
        ox = min(ax1, bx1) - max(ax0, bx0)
        oy = min(ay1, by1) - max(ay0, by0)
        if ox < 0 or oy < 0:
            return "FF2FF1212"
        if ox == 0 or oy == 0:
            return "FF2F01212" if (ox == 0 and oy == 0) else "FF2F11212"
        a_in_b = ax0 >= bx0 and ax1 <= bx1 and ay0 >= by0 and ay1 <= by1
        b_in_a = bx0 >= ax0 and bx1 <= ax1 and by0 >= ay0 and by1 <= ay1
        ib = ((ax0 < bx0 < ax1) or (ax0 < bx1 < ax1)
              or (ay0 < by0 < ay1) or (ay0 < by1 < ay1))
        bi = ((bx0 < ax0 < bx1) or (bx0 < ax1 < bx1)
              or (by0 < ay0 < by1) or (by0 < ay1 < by1))
        shared = (ax0 in (bx0, bx1) or ax1 in (bx0, bx1)
                  or ay0 in (by0, by1) or ay1 in (by0, by1))
        bb = "1" if shared else ("0" if (ib and bi) else "F")
        return ("2" + ("1" if ib else "F") + ("F" if a_in_b else "2")
                + ("1" if bi else "F") + bb + ("F" if a_in_b else "1")
                + ("F" if b_in_a else "2") + ("F" if b_in_a else "1") + "2")

    rng = random.Random(1)
    for _ in range(800):
        ax0, ay0 = rng.randint(-6, 4), rng.randint(-6, 4)
        ax1, ay1 = ax0 + rng.randint(1, 5), ay0 + rng.randint(1, 5)
        bx0, by0 = rng.randint(-6, 4), rng.randint(-6, 4)
        bx1, by1 = bx0 + rng.randint(1, 5), by0 + rng.randint(1, 5)
        want = de9im(
            W(rect_wkt(ax0, ay0, ax1, ay1)), W(rect_wkt(bx0, by0, bx1, by1))
        )
        got = rect_de9im(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
        assert got == want, ((ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1))


def test_de9im_translation_invariant_at_mercator_scale():
    """Review r3: the collinearity tolerance must be an ANGLE
    tolerance (segment-length product), not coordinate-magnitude
    squared — identical shapes translated to Web-Mercator-scale
    offsets (2e7, which ST_Transform itself produces) must keep the
    same matrix."""
    from geomesa_sql_spark.geom import kernel

    pairs = [
        ("LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)"),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "LINESTRING (-5 5, 15 5)"),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
    ]

    def shift(wkt, dx):
        import re
        return re.sub(
            r"(-?\d+(?:\.\d+)?) (-?\d+(?:\.\d+)?)",
            lambda m: f"{float(m.group(1)) + dx} {m.group(2)}", wkt,
        )

    for wa, wb in pairs:
        m0 = de9im(W(wa), W(wb))
        m1 = de9im(W(shift(wa, 2e7)), W(shift(wb, 2e7)))
        assert m0 == m1, (wa, wb, m0, m1)
        assert kernel.crosses(W(shift(wa, 2e7)), W(shift(wb, 2e7))) == \
            kernel.crosses(W(wa), W(wb))
