"""Spatial filter pushdown: predicate → cell-range prune + refine.

The analog of the reference's filter pipeline: GeoMesaFilterRule splits
a condition into conjuncts and pushes the translatable ones into the
scan as ECQL, which GeoMesa executes as Z-index range scans
(rules/GeoMesaFilterRule.scala:31-81, RexNodeTranslator.scala:170-196);
the untranslatable remainder stays above as a residual filter.

Spark-side shape of the same idea, for a table laid out by
``io.layout.write_geo_table`` (lon/lat doubles + ``cell`` Z-order
column, files range-partitioned and sorted by cell):

1. envelope → coarse cover cells → contiguous Z-order ranges at the
   data resolution → ``cell BETWEEN lo AND hi OR ...`` — a plain
   Column predicate Catalyst pushes into the parquet scan, pruning
   row groups (and, with cell-partitioned layouts, whole files) by
   footer min/max stats. This is the ECQL/Z-index analog.
2. lon/lat bbox prefilter — also storage-pushable, and cheap JVM-side.
3. exact refine (vectorized kernel UDF) only when the geometry is not
   a rectangle — the residual-filter analog. The refine re-checks the
   full predicate, so cover false positives never leak.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_sql_spark.cells import cover_envelope
from geomesa_sql_spark.cells.curve import res_for_extent
from geomesa_sql_spark.functions.st import (
    _is_rectangle,
    st_predicate_point_cols,
    st_predicate_wkb,
)
from geomesa_sql_spark.geom import geom_from_wkt
from geomesa_sql_spark.geom.model import Geom
from geomesa_sql_spark.geom.wkb import geom_to_wkb
from geomesa_sql_spark.io.layout import DEFAULT_DATA_RES


def cell_prune_ranges(
    minx: float, miny: float, maxx: float, maxy: float, data_res: int, max_ranges: int = 64
) -> list[tuple[int, int]]:
    """Envelope → merged [lo, hi] ranges over the Z-order ``cell`` column.

    Cover at a coarse resolution (picked so ≤ ~max_ranges cells), then
    expand each coarse cell c to its Z-range at data_res:
    [c << 2k, ((c+1) << 2k) - 1] — Z-order children of a cell are a
    contiguous block. Adjacent ranges are merged.
    """
    width = max(maxx - minx, 1e-12)
    height = max(maxy - miny, 1e-12)
    coarse = min(data_res, res_for_extent(width / 4, height / 4, max_res=data_res))
    while True:
        cells = cover_envelope(minx, miny, maxx, maxy, coarse)
        k = 2 * (data_res - coarse)
        los = cells.astype(np.int64) << k
        his = ((cells.astype(np.int64) + 1) << k) - 1
        ranges: list[tuple[int, int]] = []
        for lo, hi in zip(los.tolist(), his.tolist()):
            if ranges and lo == ranges[-1][1] + 1:
                ranges[-1] = (ranges[-1][0], hi)
            else:
                ranges.append((lo, hi))
        # max_ranges is now ENFORCED (review r3: it was documented but
        # never read) — coarsen until the predicate stays bounded
        if len(ranges) <= max_ranges or coarse <= 1:
            return ranges
        coarse -= 1


def _ranges_predicate(cell_col: str, ranges: list[tuple[int, int]]) -> Column:
    pred = None
    for lo, hi in ranges:
        c = F.col(cell_col).between(lo, hi)
        pred = c if pred is None else (pred | c)
    return pred if pred is not None else F.lit(True)


def spatial_filter(
    df: DataFrame,
    predicate: str,
    geom: str | Geom,
    x: str | None = None,
    y: str | None = None,
    wkb: str | None = None,
    distance: float | None = None,
    cell_col: str | None = "cell",
    data_res: int | None = DEFAULT_DATA_RES,
) -> DataFrame:
    """Filter rows by ``ST_<predicate>(row_geometry, literal geom)``.

    Point rows: pass ``x``/``y`` lon-lat columns. WKB rows: pass
    ``wkb``. Set ``cell_col=None`` to disable cell pruning (the
    "scannable"-table oracle mode, GeoMesaScannableTable.scala:29-44).
    """
    g = geom_from_wkt(geom) if isinstance(geom, str) else geom
    pred = predicate.lower()
    if pred == "dwithin_sphere":
        return _sphere_filter(df, g, float(distance), x, y, cell_col, data_res)
    pad = float(distance) if pred == "dwithin" else 0.0
    minx, miny, maxx, maxy = g.envelope()
    minx, miny, maxx, maxy = minx - pad, miny - pad, maxx + pad, maxy + pad

    out = df
    # 1. cell-range prune (storage-level, analog of the Z-index scan)
    if cell_col is not None and cell_col in df.columns and data_res is not None:
        ranges = cell_prune_ranges(minx, miny, maxx, maxy, data_res)
        out = out.filter(_ranges_predicate(cell_col, ranges))

    if x is not None:
        # 2. bbox prefilter on the coordinate columns (parquet-pushable)
        out = out.filter(
            (F.col(x) >= minx) & (F.col(x) <= maxx) & (F.col(y) >= miny) & (F.col(y) <= maxy)
        )
        # 3. exact refine, skipped when the bbox IS the exact predicate
        needs_refine = not (
            _is_rectangle(g) and pred in ("intersects", "coveredby")
        )
        if needs_refine:
            out = out.filter(st_predicate_point_cols(pred, F.col(x), F.col(y), g, distance))
        return out

    if wkb is None:
        raise ValueError("need x/y or wkb")
    lit = F.lit(bytearray(geom_to_wkb(g)))
    return out.filter(st_predicate_wkb(pred, F.col(wkb), lit, distance))


def _sphere_filter(
    df: DataFrame,
    g: Geom,
    meters: float,
    x: str | None,
    y: str | None,
    cell_col: str | None,
    data_res: int | None,
) -> DataFrame:
    """``ST_DWithinSphere(point_rows, literal point, metres)`` with the
    same push-down ladder as the planar path: conservative degree bbox
    (split into two longitude segments when the cap spills past ±180,
    since the haversine metric wraps) → cell ranges → sargable bbox →
    pure-Column haversine refine (geom/geodesic.py). The degree bounds
    are the proven over-cover of join/spatial._sphere_deg_bounds, so
    pruning never drops a true row."""
    from geomesa_sql_spark.geom.geodesic import sphere_distance_cols
    from geomesa_sql_spark.join.spatial import _sphere_deg_bounds

    if x is None or y is None:
        raise NotImplementedError(
            "dwithin_sphere filters point rows (x/y lon-lat columns); "
            "for WKB rows use the scalar ST_DWithinSphere UDF"
        )
    from geomesa_sql_spark.geom import model

    if g.type != model.POINT:
        raise NotImplementedError(
            "dwithin_sphere needs a POINT literal (geodesic distance to "
            "an extended geometry is undefined here — buffer+intersects "
            "or the planar dwithin cover those)"
        )
    cx, cy = float(g.coords[0]), float(g.coords[1])
    dlat_a, dlon_a = _sphere_deg_bounds(np.array([cy]), float(meters))
    dlat, dlon = float(np.atleast_1d(dlat_a)[0]), float(dlon_a[0])
    ylo, yhi = max(cy - dlat, -90.0), min(cy + dlat, 90.0)
    lo, hi = cx - dlon, cx + dlon
    if dlon >= 180.0:
        segs = [(-180.0, 180.0)]
    elif lo < -180.0:
        segs = [(-180.0, hi), (lo + 360.0, 180.0)]
    elif hi > 180.0:
        segs = [(lo, 180.0), (-180.0, hi - 360.0)]
    else:
        segs = [(lo, hi)]

    out = df
    if cell_col is not None and cell_col in df.columns and data_res is not None:
        ranges: list[tuple[int, int]] = []
        for slo, shi in segs:
            ranges.extend(cell_prune_ranges(slo, ylo, shi, yhi, data_res))
        out = out.filter(_ranges_predicate(cell_col, ranges))
    box = None
    for slo, shi in segs:
        c = (F.col(x) >= slo) & (F.col(x) <= shi)
        box = c if box is None else (box | c)
    out = out.filter(box & (F.col(y) >= ylo) & (F.col(y) <= yhi))
    return out.filter(
        sphere_distance_cols(F.col(x), F.col(y), F.lit(cx), F.lit(cy))
        <= float(meters)
    )
