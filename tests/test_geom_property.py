"""Property-based kernel tests (hypothesis) — pure numpy, no Spark.

The reference has no randomized tests (SURVEY.md §5.1); these harden
the from-scratch geometry kernel where differential oracles are
thinnest: codec round-trips, predicate symmetry, and PIP consistency
between the vectorized batch kernel and the pairwise relate path.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from geomesa_sql_spark.geom import geom_from_wkb, geom_from_wkt, geom_to_wkt
from geomesa_sql_spark.geom import kernel
from geomesa_sql_spark.geom.model import box, linestring, point
from geomesa_sql_spark.geom.wkb import geom_to_wkb

coord = st.floats(-180.0, 180.0, allow_nan=False, width=64).map(
    lambda v: round(v, 6)
)


@st.composite
def points(draw):
    return point(draw(coord), draw(coord))


@st.composite
def lines(draw):
    n = draw(st.integers(2, 6))
    return linestring([[draw(coord), draw(coord)] for _ in range(n)])


@st.composite
def boxes(draw):
    x0, x1 = sorted((draw(coord), draw(coord)))
    y0, y1 = sorted((draw(coord), draw(coord)))
    return box(x0, y0, x1 + 1e-6, y1 + 1e-6)


geoms = st.one_of(points(), lines(), boxes())


@settings(max_examples=80, deadline=None)
@given(geoms)
def test_wkb_roundtrip_property(g):
    g2 = geom_from_wkb(geom_to_wkb(g))
    assert g2.type == g.type
    assert np.allclose(g2.all_coords(), g.all_coords())


@settings(max_examples=80, deadline=None)
@given(geoms)
def test_wkt_roundtrip_property(g):
    g2 = geom_from_wkt(geom_to_wkt(g))
    assert g2.type == g.type
    assert np.allclose(g2.all_coords(), g.all_coords(), atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(geoms, geoms)
def test_intersects_symmetric(a, b):
    assert kernel.relate(a, b, "intersects") == kernel.relate(b, a, "intersects")


@settings(max_examples=60, deadline=None)
@given(geoms, geoms)
def test_dwithin_symmetric_and_contains_distance_zero(a, b):
    d = 5.0
    assert kernel.relate(a, b, "dwithin", d) == kernel.relate(b, a, "dwithin", d)
    # intersecting geometries are within any positive distance
    if kernel.relate(a, b, "intersects"):
        assert kernel.relate(a, b, "dwithin", 1e-9)


@settings(max_examples=60, deadline=None)
@given(boxes(), st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
def test_batch_pip_matches_pairwise(b, pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    batch = kernel.points_intersect_geom(xs, ys, b)
    for i, (x, y) in enumerate(pts):
        pairwise = kernel.relate(point(x, y), b, "intersects")
        assert bool(batch[i]) == pairwise, (x, y, b.envelope())


@settings(max_examples=60, deadline=None)
@given(boxes(), st.tuples(coord, coord))
def test_pip_agrees_with_envelope_for_boxes(b, p):
    """For an axis-aligned box, point-intersects ≡ envelope test."""
    x, y = p
    minx, miny, maxx, maxy = b.envelope()
    want = (minx <= x <= maxx) and (miny <= y <= maxy)
    got = kernel.relate(point(x, y), b, "intersects")
    assert got == want


@settings(max_examples=40, deadline=None)
@given(points(), geoms, st.floats(0.01, 30.0, allow_nan=False))
def test_dwithin_matches_distance(pt, g, d):
    dist = kernel.points_to_geom_dist(
        np.array([pt.coords[0]]), np.array([pt.coords[1]]), g
    )[0]
    assert kernel.relate(pt, g, "dwithin", d) == (dist <= d)


_pts_lists = st.lists(st.tuples(coord, coord), min_size=1, max_size=40)


@settings(max_examples=60, deadline=None)
@given(_pts_lists)
def test_convex_hull_properties(pts):
    """Hull invariants: idempotent; contains every input point (distance
    0); hull area ≥ 0 and ≥ any triangle of input points is implied by
    containment, so we check containment directly."""
    from geomesa_sql_spark.geom.model import Geom

    mp = Geom("MultiPoint", [point(x, y) for x, y in pts])
    h = kernel.convex_hull(mp)
    h2 = kernel.convex_hull(h)
    assert kernel.geom_equals(h, h2) or abs(kernel.area(h) - kernel.area(h2)) < 1e-9
    for x, y in pts:
        assert kernel.distance(point(x, y), h) <= 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=30), st.floats(0, 10))
def test_simplify_properties(pts, tol):
    """Simplify invariants: endpoints kept; vertex count never grows;
    tol=0 keeps every non-collinear vertex set's length within the
    original (simplified length ≤ original length for any tol)."""
    ls = linestring(pts)
    s = kernel.simplify(ls, tol)
    assert s.coords[0].tolist() == list(pts[0])
    assert s.coords[-1].tolist() == list(pts[-1])
    assert len(s.coords) <= len(pts)
    assert kernel.length(s) <= kernel.length(ls) + 1e-9


# ---------------------------------------------------- pipeline-op kernels


@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=0, max_size=300),
    st.integers(min_value=1, max_value=150),
)
@settings(max_examples=200, deadline=None)
def test_pack_walk_matches_sequential_greedy(toks, budget):
    """The searchsorted jump walk == the obvious per-doc greedy loop,
    for any token sequence including zeros and oversize docs."""
    from geomesa_sql_spark.ops.pack import _pack_walk

    tok = np.array(toks, dtype=np.int64)
    bins, offs = _pack_walk(tok, budget)

    b, cur, want_bins, want_offs = 0, 0, [], []
    for t in toks:
        if cur and cur + t > budget:
            b += 1
            cur = 0
        want_bins.append(b)
        want_offs.append(cur)
        cur += t
        if cur > budget:
            b += 1
            cur = 0
    assert bins.tolist() == want_bins
    assert offs.tolist() == want_offs


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=0, max_value=12),
)
@settings(max_examples=100, deadline=None)
def test_hamming_pigeonhole_slices_complete(sigs, t):
    """Pigeonhole guarantee behind hamming_near_dup_pairs: any pair
    within radius t agrees on >= 1 of the t+2 bit slices (the band
    join's candidate generation can therefore never miss one)."""
    k = t + 2
    w = 64 // k

    def slices(v):
        u = v & 0xFFFFFFFFFFFFFFFF
        out = []
        for i in range(k):
            lo = i * w
            width = 64 - lo if i == k - 1 else w
            out.append((i, (u >> lo) & ((1 << width) - 1)))
        return set(out)

    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            ham = bin((sigs[i] ^ sigs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if ham <= t:
                assert slices(sigs[i]) & slices(sigs[j]), (sigs[i], sigs[j], t)


# ---- DE-9IM vs named predicates (r3) — integer lattice keeps every
# intersection exactly representable, so epsilon effects are nil

icoord = st.integers(-8, 8).map(float)


@st.composite
def int_points(draw):
    return point(draw(icoord), draw(icoord))


@st.composite
def int_lines(draw):
    n = draw(st.integers(2, 4))
    pts = [[draw(icoord), draw(icoord)] for _ in range(n)]
    # zero-length degenerate lines are not valid OGC input
    for a, b in zip(pts[:-1], pts[1:]):
        if a == b:
            b[0] += 1.0
    return linestring(pts)


@st.composite
def int_boxes(draw):
    x0 = draw(st.integers(-8, 6))
    y0 = draw(st.integers(-8, 6))
    w = draw(st.integers(1, 6))
    h = draw(st.integers(1, 6))
    return box(float(x0), float(y0), float(x0 + w), float(y0 + h))


int_geoms = st.one_of(int_points(), int_lines(), int_boxes())


def _dim(g):
    from geomesa_sql_spark.geom.de9im import _dim_class

    return _dim_class(g)


@settings(max_examples=150, deadline=None)
@given(int_geoms, int_geoms)
def test_de9im_agrees_with_all_named_predicates(a, b):
    """The matrix must reproduce every named relate predicate via its
    JTS pattern definition — one randomized consistency law tying the
    r3 DE-9IM derivation to the kernel's independent implementations."""
    from geomesa_sql_spark.geom.de9im import de9im

    m = de9im(a, b)
    da, db = _dim(a), _dim(b)

    im_intersects = any(m[i] != "F" for i in (0, 1, 3, 4))
    im_within = m[0] != "F" and m[2] == "F" and m[5] == "F"
    im_touches = m[0] == "F" and any(m[i] != "F" for i in (1, 3, 4))
    if da != db:
        if da < db:
            im_crosses = m[0] != "F" and m[2] != "F"
        else:
            im_crosses = m[0] != "F" and m[6] != "F"
    elif da == 1:
        im_crosses = m[0] == "0"
    else:
        im_crosses = False
    if da == db:
        if da == 1:
            im_overlaps = m[0] == "1" and m[2] != "F" and m[6] != "F"
        else:
            im_overlaps = m[0] != "F" and m[2] != "F" and m[6] != "F"
    else:
        im_overlaps = False
    im_equals = (
        m[0] != "F" and m[2] == "F" and m[5] == "F"
        and m[6] == "F" and m[7] == "F"
    )

    assert im_intersects == kernel.intersects(a, b), m
    assert im_within == kernel.within(a, b), m
    assert im_touches == kernel.touches(a, b), m
    assert im_crosses == kernel.crosses(a, b), m
    assert im_overlaps == kernel.overlaps(a, b), m
    assert im_equals == kernel.geom_equals(a, b), m


@settings(max_examples=80, deadline=None)
@given(geoms)
def test_geojson_roundtrip_property(g):
    """GeoJSON text round-trip preserves type and coordinates exactly
    (json.dumps emits full double precision; io/geojson.py and the
    ST_AsGeoJSON/ST_GeomFromGeoJSON pair both ride these converters)."""
    from geomesa_sql_spark.geom.geojson import geom_from_geojson, geom_to_geojson

    g2 = geom_from_geojson(geom_to_geojson(g))
    assert g2.type == g.type
    assert np.array_equal(g2.all_coords(), g.all_coords())


@settings(max_examples=60, deadline=None)
@given(geoms)
def test_geojson_multi_collection_roundtrip(g):
    """Multi-geometries and collections round-trip too (wrap each drawn
    simple geometry both ways)."""
    from geomesa_sql_spark.geom import model as m
    from geomesa_sql_spark.geom.geojson import geom_from_geojson, geom_to_geojson

    multi_type = {
        m.POINT: m.MULTIPOINT,
        m.LINESTRING: m.MULTILINESTRING,
        m.POLYGON: m.MULTIPOLYGON,
    }[g.type]
    for wrapped in (
        m.Geom(multi_type, [g, g]),
        m.Geom(m.GEOMETRYCOLLECTION, [g]),
    ):
        g2 = geom_from_geojson(geom_to_geojson(wrapped))
        assert g2.type == wrapped.type
        assert np.array_equal(g2.all_coords(), wrapped.all_coords())
