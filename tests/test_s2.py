"""S2 cell index laws (cells/s2.py) — pure numpy, no Spark session.

The module is from-scratch (no s2 library in the container to oracle
against), so correctness is pinned by structural laws that only the
canonical S2 layout satisfies simultaneously: face-cell id anatomy,
curve continuity across face boundaries, parent/child range nesting,
exact-bounds soundness, and covering completeness on randomized rects
including the antimeridian and the poles. The (face,i,j) → curve
position pipeline is additionally hash-gated relationally in the
driver contract (tile_hilbert's s2 columns replay the lookup tables in
DuckDB — __spark_entry__._s2_leaf_sql)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_sql_spark.cells import s2


def _rand_lonlat(rng, n):
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # sphere-uniform
    return lon, lat


def test_lookup_tables_are_inverse_permutations():
    for orient in range(4):
        idx = (np.arange(256) << 2) + orient
        pos = s2._LOOKUP_POS[idx]
        back = s2._LOOKUP_IJ[(pos & ~3) + orient]
        assert ((back >> 2) == np.arange(256)).all()
        # orientation bits agree between the two tables
        assert ((pos & 3) == (back & 3)).all()


def test_face_center_level0_ids():
    centers = [(0, 0), (90, 0), (0, 90), (180, 0), (-90, 0), (0, -90)]
    for f, (lo, la) in enumerate(centers):
        cid = s2.lonlat_to_cell_id([lo], [la], 0)[0]
        assert np.uint64(cid) == (np.uint64(2 * f + 1) << np.uint64(60))
        assert s2.cell_level([cid])[0] == 0


def test_leaf_roundtrip_center_within_leaf():
    rng = np.random.default_rng(7)
    lon, lat = _rand_lonlat(rng, 20000)
    leaf = s2.lonlat_to_cell_id(lon, lat)
    clon, clat = s2.cell_center_lonlat(leaf)
    dlon = np.abs((clon - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlon.max() < 2e-7
    assert np.abs(clat - lat).max() < 2e-7


def test_uv_st_roundtrip_exact():
    rng = np.random.default_rng(1)
    u = rng.uniform(-1, 1, 10000)
    assert np.abs(s2.st_to_uv(s2.uv_to_st(u)) - u).max() < 1e-14
    s = rng.uniform(0, 1, 10000)
    assert np.abs(s2.uv_to_st(s2.st_to_uv(s)) - s).max() < 1e-14


def test_face_uv_roundtrip():
    rng = np.random.default_rng(2)
    lon, lat = _rand_lonlat(rng, 10000)
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert (u >= -1 - 1e-12).all() and (u <= 1 + 1e-12).all()
    assert (v >= -1 - 1e-12).all() and (v <= 1 + 1e-12).all()
    x2, y2, z2 = s2.face_uv_to_xyz(face, u, v)
    lon2, lat2 = s2.xyz_to_lonlat(x2, y2, z2)
    dlon = np.abs((lon2 - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlon.max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_curve_continuity_across_faces():
    """Consecutive leaf positions (id ± 2) are spatially adjacent —
    the one law that breaks under ANY traversal-table transcription
    error, including at face boundaries."""
    rng = np.random.default_rng(11)
    lon, lat = _rand_lonlat(rng, 50000)
    leaf = s2.lonlat_to_cell_id(lon, lat)
    m = leaf.astype(np.uint64) < np.uint64((6 << 61) - 2)
    clon, clat = s2.cell_center_lonlat(leaf[m])
    nxt = (leaf[m].astype(np.uint64) + np.uint64(2)).astype(np.int64)
    nlon, nlat = s2.cell_center_lonlat(nxt)
    dx = np.abs((nlon - clon + 180) % 360 - 180) * np.cos(np.radians(clat))
    assert np.hypot(dx, nlat - clat).max() < 1e-6  # ~3 leaf diagonals


def test_parent_child_ranges_nest():
    rng = np.random.default_rng(5)
    lon, lat = _rand_lonlat(rng, 5000)
    leaf = s2.lonlat_to_cell_id(lon, lat)
    for lvl in (0, 5, 12, 29):
        p = s2.parent_id(leaf, lvl)
        assert (s2.cell_level(p) == lvl).all()
        assert s2.contains_id(p, leaf).all()
        # deeper parents nest inside shallower ones
        if lvl > 0:
            assert s2.contains_id(s2.parent_id(leaf, lvl - 1), p).all()
    # fixed-level assignment == parent of leaf
    assert (s2.lonlat_to_cell_id(lon, lat, 9) == s2.parent_id(leaf, 9)).all()


def test_cell_bounds_sound_random_cells():
    rng = np.random.default_rng(3)
    for _ in range(120):
        lvl = int(rng.integers(1, 13))
        lon, lat = _rand_lonlat(rng, 1)
        cid = s2.lonlat_to_cell_id(lon, lat, lvl)
        face, i, j = s2.id_to_face_ij(cid)
        size = np.int64(1) << (s2.MAX_LEVEL - lvl)
        i0, j0 = (i // size) * size, (j // size) * size
        sc = 1.0 / float(np.int64(1) << s2.MAX_LEVEL)
        lat_lo, lat_hi, lon_lo, lon_hi, full = s2.cell_bounds_uv(
            face,
            s2.st_to_uv(i0 * sc),
            s2.st_to_uv(j0 * sc),
            s2.st_to_uv((i0 + size) * sc),
            s2.st_to_uv((j0 + size) * sc),
        )
        us = rng.uniform(s2.st_to_uv(i0 * sc), s2.st_to_uv((i0 + size) * sc), 300)
        vs = rng.uniform(s2.st_to_uv(j0 * sc), s2.st_to_uv((j0 + size) * sc), 300)
        plon, plat = s2.xyz_to_lonlat(
            *s2.face_uv_to_xyz(np.repeat(face, 300), us, vs)
        )
        assert (plat >= lat_lo[0] - 1e-9).all() and (plat <= lat_hi[0] + 1e-9).all()
        if not full[0]:
            lo, hi = lon_lo[0], lon_hi[0]
            ok = (
                (plon >= lo - 1e-9) & (plon <= hi + 1e-9)
                if lo <= hi
                else (plon >= lo - 1e-9) | (plon <= hi + 1e-9)
            )
            assert ok.all()


@pytest.mark.parametrize(
    "rect,lvl",
    [
        ((170.0, -10.0, 180.0, 10.0), 6),  # antimeridian face
        ((-180.0, 85.0, 180.0, 90.0), 5),  # north polar cap
        ((-180.0, -90.0, 180.0, -85.0), 5),  # south polar cap
        ((-0.5, -0.5, 0.5, 0.5), 8),  # face-0 center
        ((44.0, 44.0, 46.0, 46.0), 8),  # face corner region
    ],
)
def test_cover_rect_complete(rect, lvl):
    cover = s2.cover_rect(*rect, lvl, max_cells=200000)
    rng = np.random.default_rng(abs(int(rect[0])) + lvl)
    pl = rng.uniform(rect[0], rect[2], 4000)
    pb = rng.uniform(rect[1], rect[3], 4000)
    assert np.isin(s2.lonlat_to_cell_id(pl, pb, lvl), cover).all()
    assert len(np.unique(cover)) == len(cover)


def test_cover_rect_complete_randomized():
    for seed in range(25):
        rng = np.random.default_rng(seed)
        cx, cy = rng.uniform(-175, 175), rng.uniform(-85, 85)
        w, h = rng.uniform(0.1, 25), rng.uniform(0.1, 25)
        rect = (
            max(-180.0, cx - w / 2),
            max(-90.0, cy - h / 2),
            min(180.0, cx + w / 2),
            min(90.0, cy + h / 2),
        )
        cover = s2.cover_rect(*rect, 8, max_cells=200000)
        pl = rng.uniform(rect[0], rect[2], 1500)
        pb = rng.uniform(rect[1], rect[3], 1500)
        assert np.isin(s2.lonlat_to_cell_id(pl, pb, 8), cover).all(), seed


def test_cover_rect_ranges_superset_and_bounded():
    rng = np.random.default_rng(17)
    rr = s2.cover_rect_ranges(10, 10, 20, 20, max_cells=64)
    assert 0 < len(rr) <= 64
    # ranges sorted + disjoint (as uint64)
    lo = np.array([a for a, _ in rr], dtype=np.int64).astype(np.uint64)
    hi = np.array([b for _, b in rr], dtype=np.int64).astype(np.uint64)
    assert (lo <= hi).all() and (lo[1:] > hi[:-1]).all()
    cells = s2.lonlat_to_cell_id(
        rng.uniform(10, 20, 5000), rng.uniform(10, 20, 5000)
    ).astype(np.uint64)
    covered = np.zeros(len(cells), dtype=bool)
    for a, b in rr:
        covered |= (cells >= np.int64(a).astype(np.uint64)) & (
            cells <= np.int64(b).astype(np.uint64)
        )
    assert covered.all()


def test_cover_rect_ranges_level_floor_small_bbox():
    """Advice r4 (high): a bbox small relative to the stored cell level
    subdivides finer than the stored cells, and the stored id (midpoint
    of its own range) falls outside every fine range — matching rows
    silently dropped. max_level caps the descent at the stored level."""
    cell = int(s2.lonlat_to_cell_id(np.array([20.0005]), np.array([10.0005]), 10)[0])
    bbox = (20.0, 10.0, 20.001, 10.001)

    def hits(rr):
        return any(lo <= cell <= hi for lo, hi in rr)

    # uncapped covering demonstrably misses the level-10 id...
    assert not hits(s2.cover_rect_ranges(*bbox, max_cells=64))
    # ...the capped one keeps it
    capped = s2.cover_rect_ranges(*bbox, max_cells=64, max_level=10)
    assert hits(capped)
    # and capped ranges are still a superset cover for level-10 ids of
    # random points inside the bbox
    rng = np.random.default_rng(41)
    pts = s2.lonlat_to_cell_id(
        rng.uniform(20.0, 20.001, 500), rng.uniform(10.0, 10.001, 500), 10
    )
    for c in pts.tolist():
        assert any(lo <= c <= hi for lo, hi in capped)


def test_s2_range_predicate_small_bbox_vs_plain_filter(spark):
    """End-to-end twin of the level-floor fix: s2_range_predicate with
    level= must keep every row a plain lon/lat filter keeps, even when
    the bbox is far smaller than one stored cell."""
    from geomesa_sql_spark.tiles import assign_s2_cells, s2_range_predicate

    df = spark.range(0, 3000).selectExpr(
        "id",
        "20.0 + CAST(id % 100 AS DOUBLE) / 20000.0 AS lon",
        "10.0 + CAST(id % 97 AS DOUBLE) / 19000.0 AS lat",
    )
    stored = assign_s2_cells(df, level=10)
    rect = (20.0, 10.0, 20.001, 10.001)
    pred = s2_range_predicate("s2_cell", *rect, level=10)
    got = set(stored.filter(pred).toPandas()["id"])
    want = set(
        stored.filter(
            (F.col("lon") >= rect[0]) & (F.col("lon") <= rect[2])
            & (F.col("lat") >= rect[1]) & (F.col("lat") <= rect[3])
        ).toPandas()["id"]
    )
    assert want and want.issubset(got)


def test_cover_cap_raises():
    with pytest.raises(ValueError, match="cover"):
        s2.cover_rect(-180, -90, 180, 90, 12, max_cells=100)


def test_tokens():
    t = s2.token(s2.lonlat_to_cell_id([0.0], [0.0], 0))
    assert t[0] == "1"  # face-0 level-0 cell = 0x1000... → "1"
    leaf = s2.lonlat_to_cell_id([12.3], [45.6])
    assert len(s2.token(leaf)[0]) <= 16


def test_assign_s2_cells_and_range_predicate(spark):
    from geomesa_sql_spark.tiles import assign_s2_cells, s2_range_predicate

    df = spark.range(0, 4000).selectExpr(
        "id",
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat",
    )
    out = assign_s2_cells(df, level=12).toPandas()
    expect = s2.lonlat_to_cell_id(
        out["lon"].to_numpy(), out["lat"].to_numpy(), 12
    )
    assert (out["s2_cell"].to_numpy() == expect).all()
    assert (s2.cell_level(out["s2_cell"].to_numpy()) == 12).all()

    # range predicate over LEAF cells: everything in the bbox passes,
    # and the false-positive ring stays bounded (covering, not filter)
    leaf = assign_s2_cells(df, level=s2.MAX_LEVEL)
    rect = (20.0, 10.0, 60.0, 40.0)
    pred = s2_range_predicate(
        "s2_cell", *rect, max_cells=128, level=s2.MAX_LEVEL
    )
    got = leaf.filter(pred).toPandas()
    inside = leaf.filter(
        (F.col("lon") >= rect[0]) & (F.col("lon") <= rect[2])
        & (F.col("lat") >= rect[1]) & (F.col("lat") <= rect[3])
    ).toPandas()
    assert set(inside["id"]).issubset(set(got["id"]))
    assert len(got) < 4 * max(1, len(inside))  # coarse covering ring


def test_s2_sql_functions(spark):
    """S2_CellId / S2_Token / S2_Level registered alongside the ST_*
    surface (BigQuery/DuckDB-spatial naming convention)."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        """SELECT S2_CellId(12.3D, 45.6D, 12) AS c,
                  S2_Token(S2_CellId(12.3D, 45.6D, 12)) AS t,
                  S2_Level(S2_CellId(12.3D, 45.6D, 12)) AS l,
                  S2_CellId(CAST(NULL AS DOUBLE), 1.0D, 12) AS nl"""
    ).first()
    assert r.c == int(s2.lonlat_to_cell_id([12.3], [45.6], 12)[0])
    assert r.l == 12 and r.nl is None and 1 <= len(r.t) <= 16
    # mixed levels in one batch take the per-distinct-level path
    got = spark.sql(
        """SELECT id, S2_CellId(1.0D, 2.0D, CAST(id % 3 + 4 AS INT)) AS c
           FROM range(30)"""
    ).toPandas()
    for lvl in (4, 5, 6):
        want = int(s2.lonlat_to_cell_id([1.0], [2.0], lvl)[0])
        assert (got[got["id"] % 3 == lvl - 4]["c"] == want).all()


# ---- review r4n regression tests ----------------------------------


def test_s2_token_level_exact_with_null_in_batch(spark):
    """One NULL in an Arrow batch converts an int64 pandas series to
    float64 (bits above 2^53 lost) — S2_Token/S2_Level must stay exact
    for the non-null ids in the same batch (r4n reproduced a corrupt
    token under the old pandas-UDF path)."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    leaf = int(s2.lonlat_to_cell_id([12.3], [45.6])[0])  # level 30: low bits live
    got = spark.sql(
        f"""SELECT S2_Token(c) AS t, S2_Level(c) AS l
            FROM VALUES (CAST({leaf} AS BIGINT)), (CAST(NULL AS BIGINT)) v(c)
            ORDER BY c IS NULL"""
    ).collect()
    want_token = str(s2.token(np.array([leaf], dtype=np.int64))[0])
    assert got[0].t == want_token and got[0].l == 30
    assert got[1].t is None and got[1].l is None


def test_assign_s2_cells_null_coords(spark):
    import pandas as pd

    from geomesa_sql_spark.tiles import assign_s2_cells

    df = spark.createDataFrame(
        pd.DataFrame({"lon": [1.0, None, 3.0], "lat": [1.0, 2.0, None]}),
        "lon double, lat double",
    )
    out = assign_s2_cells(df, level=10).toPandas()
    assert out["s2_cell"].isna().tolist() == [False, True, True]
    assert out["s2_cell"].iloc[0] == s2.lonlat_to_cell_id([1.0], [1.0], 10)[0]


def test_cover_rect_ranges_rejects_bad_bbox():
    with pytest.raises(ValueError, match="normalized"):
        s2.cover_rect_ranges(170, 10, -170, 20)  # antimeridian-crossing
    with pytest.raises(ValueError, match="normalized"):
        s2.cover_rect_ranges(10, 30, 20, 10)  # inverted lat


def test_s2_sql_family_parent_contains_center(spark):
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    leaf = int(s2.lonlat_to_cell_id([12.3], [45.6])[0])
    r = spark.sql(
        f"""SELECT S2_Parent(CAST({leaf} AS BIGINT), 8) AS p,
                   S2_Parent(CAST({leaf} AS BIGINT), 99) AS bad,
                   S2_Contains(S2_Parent(CAST({leaf} AS BIGINT), 8),
                               CAST({leaf} AS BIGINT)) AS c,
                   S2_Contains(S2_Parent(CAST({leaf} AS BIGINT), 8),
                               S2_CellId(-120.0D, -45.0D, 30)) AS far,
                   ST_X(S2_CellCenter(S2_Parent(CAST({leaf} AS BIGINT), 8))) AS cx,
                   S2_Parent(CAST(NULL AS BIGINT), 8) AS n"""
    ).first()
    assert r.p == int(s2.parent_id(np.array([leaf]), 8)[0])
    assert r.bad is None and r.n is None
    assert r.c is True and r.far is False
    want_lon = float(s2.cell_center_lonlat(np.array([r.p]))[0][0])
    assert abs(r.cx - want_lon) < 1e-12
    # coarser cell has no deeper parent
    lvl5 = int(s2.lonlat_to_cell_id([1.0], [1.0], 5)[0])
    r2 = spark.sql(f"SELECT S2_Parent(CAST({lvl5} AS BIGINT), 10) AS p").first()
    assert r2.p is None


def test_s2_covering_sql(spark):
    """S2_Covering: every point of the geometry's envelope falls in a
    covering cell; NULL/empty handled."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    rows = spark.sql(
        """SELECT S2_Covering(ST_GeomFromText(
               'POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))'), 8) AS c,
           S2_Covering(CAST(NULL AS BINARY), 8) AS n"""
    ).first()
    assert rows.n is None and len(rows.c) > 0
    cover = np.array(rows.c, dtype=np.int64)
    assert (s2.cell_level(cover) == 8).all()
    rng = np.random.default_rng(5)
    pts = s2.lonlat_to_cell_id(
        rng.uniform(10, 20, 2000), rng.uniform(10, 20, 2000), 8
    )
    assert np.isin(pts, cover).all()
    # usable as a prune predicate against an s2-indexed column
    got = spark.sql(
        f"""SELECT COUNT(*) AS n FROM (
              SELECT S2_CellId(CAST((id*7919)%1000 AS DOUBLE)/100.0 + 10.0,
                               CAST((id*104729)%1000 AS DOUBLE)/100.0 + 10.0,
                               8) AS cell
              FROM range(500))
            WHERE array_contains(S2_Covering(ST_GeomFromText(
              'POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))'), 8), cell)"""
    ).first()
    assert got.n == 500  # all generated points lie inside the polygon
