"""Z-order cell encoding as pure JVM Column expressions.

Bit-for-bit identical to :func:`cells.curve.lonlat_to_cell` (asserted by
tests/test_cells.py::test_zorder_col_matches_numpy): grid snap is the
same IEEE double arithmetic, the interleave the same magic-mask spread.

Why this exists: the point side of a spatial join is the 10^12-row side
(every image is a point). Encoding it in a pandas UDF costs an Arrow
round-trip per batch — and Catalyst's inferred not-null constraint on
join keys evaluates a UDF key twice. As a Column expression the encode
runs inside whole-stage codegen: no Python, no double eval, and the
expression survives into parquet/Iceberg pushdown analysis. Measured on
the bench headline join: 4.6 s → 0.7 s at 100k rows, local[32].

The polygon-cover side (explode to multiple cells) and the Hilbert
curve (loop with data-dependent rotations) stay numpy/pandas-UDF — they
run on small/broadcast sides or for layout ordering only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    """Column analog of curve._part1by1: low 32 bits → even positions."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def grid_xy_cols(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Column analog of curve.lonlat_to_xy (same rounding + edge clamp)."""
    n = 1 << res
    gx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    gy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    gx = F.greatest(F.lit(0), F.least(F.lit(n - 1), gx)).cast("long")
    gy = F.greatest(F.lit(0), F.least(F.lit(n - 1), gy)).cast("long")
    return gx, gy


def zorder_cell_col(lon: Column, lat: Column, res: int) -> Column:
    """lon/lat Columns → int64 Z-order cell id at ``res`` (JVM-side)."""
    gx, gy = grid_xy_cols(lon, lat, res)
    return _spread_bits(gx).bitwiseOR(F.shiftleft(_spread_bits(gy), 1))
