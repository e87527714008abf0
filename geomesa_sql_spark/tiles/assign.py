"""Z-order/Hilbert tile assignment — the raster↔vector handoff.

North-rule component (BASELINE.json:14: "Z-order/Hilbert tile
assignment for raster<->vector handoff"); no analog exists in the
reference (it has no raster path), so semantics are defined here:

- grid: equirectangular XYZ-style tiling of lon∈[-180,180),
  lat∈[-90,90) into 2^z × 2^z tiles; ``tile_x`` grows east,
  ``tile_y`` grows north→south (row 0 at lat=+90, like slippy tiles).
- ``tile_x``/``tile_y`` are pure Column arithmetic (JVM codegen,
  oracle-expressible in ANSI SQL as FLOOR expressions).
- ``tile_id`` is the Hilbert index of (tile_x, tile_y) at zoom z —
  adjacent tiles get adjacent ids, so range-partitioning by tile_id
  co-locates spatially-adjacent imagery (the property that matters
  when a 1000-executor job hands tiles to a raster stage).

Image payload discipline: assignment needs only lon/lat, so callers
should project ``bytes`` out before a shuffle and re-join by image_id
after, or rely on this module's ``assign_tiles`` being a narrow
transformation (no shuffle of its own).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_sql_spark.cells import hilbert_xy2d


def lon_tile_col(x: str, n: int):
    """THE clamped-FLOOR lon→tile_x law, as a Column. Single source:
    every consumer (assign_tiles, ops/raster's fan-out and pixel
    grids) must build the expression HERE — a re-derived copy that
    diverges at a ulp would break the raster↔vector handoff keys at
    tile boundaries."""
    tx = F.floor((F.col(x) + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    return F.least(F.greatest(tx, F.lit(0)), F.lit(n - 1))


def lat_tile_col(y: str, n: int):
    """lat→tile_y twin of ``lon_tile_col`` (row 0 at lat=+90)."""
    ty = F.floor((F.lit(90.0) - F.col(y)) / F.lit(180.0) * n).cast("long")
    return F.least(F.greatest(ty, F.lit(0)), F.lit(n - 1))


def assign_tiles(
    df: DataFrame,
    zoom: int,
    x: str = "lon",
    y: str = "lat",
    with_hilbert: bool = True,
) -> DataFrame:
    """Add tile_x, tile_y (+ tile_id: Hilbert index) at ``zoom``."""
    n = 1 << zoom
    out = df.withColumn("tile_x", lon_tile_col(x, n)).withColumn(
        "tile_y", lat_tile_col(y, n))
    if with_hilbert:

        @F.pandas_udf(T.LongType())
        def _hilbert(txs: pd.Series, tys: pd.Series) -> pd.Series:
            return pd.Series(
                hilbert_xy2d(txs.to_numpy(np.int64), tys.to_numpy(np.int64), zoom)
            )

        out = out.withColumn("tile_id", _hilbert("tile_x", "tile_y"))
    return out


def tile_stats(df: DataFrame) -> DataFrame:
    """Per-tile row counts — skew diagnostics for the bench report."""
    return df.groupBy("tile_x", "tile_y").agg(F.count(F.lit(1)).alias("n_rows"))


def pyramid_rollup(
    tile_stats_df: DataFrame,
    levels: int = 1,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Roll per-tile stats up one or more zoom levels (tile pyramid).

    Input: (tile_x, tile_y, <measures>) at zoom z. Each level halves
    the grid: parent = (tile_x >> 1, tile_y >> 1), measures summed (or
    per-column agg from ``agg_cols``: col → 'sum'|'min'|'max'). This is
    the raster-side reduction of the raster↔vector handoff — the
    z, z-1, ..., z-levels pyramid a tile server consumes, built with
    plain shuffles on integer keys (no UDF anywhere).
    """
    out = tile_stats_df
    # structural columns are never measures (review r3: a frame straight
    # from assign_tiles(with_hilbert=True) or build_pyramid summed
    # Hilbert ids / zoom levels into garbage); agg_cols entries default
    # to 'sum' per column instead of KeyError-ing on partial dicts
    measures = [
        c for c in out.columns
        if c not in ("tile_x", "tile_y", "tile_id", "zoom")
    ]
    aggs = {c: (agg_cols or {}).get(c, "sum") for c in measures}
    out = out.select("tile_x", "tile_y", *measures)
    for _ in range(levels):
        out = (
            out.withColumn("tile_x", F.shiftright("tile_x", 1))
            .withColumn("tile_y", F.shiftright("tile_y", 1))
            .groupBy("tile_x", "tile_y")
            .agg(*[getattr(F, aggs[c])(c).alias(c) for c in measures])
        )
    return out


def build_pyramid(
    tile_stats_df: DataFrame,
    zoom: int,
    min_zoom: int = 0,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Stacked multi-zoom pyramid: (zoom, tile_x, tile_y, <measures>)
    for every level from ``zoom`` down to ``min_zoom``.

    Input is per-tile stats at ``zoom`` (one row per tile). Each level
    is one integer-shift rollup of the previous — zoom levels share
    work instead of re-aggregating the base table per level. Total
    shuffle volume is Σ_z |tiles at z| ≤ 4/3 · |tiles at max zoom|,
    independent of input row count (the base aggregation already
    happened in ``tile_stats``).
    """
    measures = [
        c for c in tile_stats_df.columns
        if c not in ("tile_x", "tile_y", "tile_id", "zoom")
    ]
    tile_stats_df = tile_stats_df.select("tile_x", "tile_y", *measures)
    frames = [tile_stats_df.withColumn("zoom", F.lit(zoom))]
    cur = tile_stats_df
    for z in range(zoom - 1, min_zoom - 1, -1):
        cur = pyramid_rollup(cur, levels=1, agg_cols=agg_cols)
        frames.append(cur.withColumn("zoom", F.lit(z)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("zoom", "tile_x", "tile_y", *measures)


def merge_pyramids(
    existing: DataFrame,
    delta: DataFrame,
    agg_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental pyramid maintenance: merge a (small) delta pyramid
    into an existing one per (zoom, tile_x, tile_y) key.

    Valid for DECOMPOSABLE measures only — sum/count/min/max (carry avg
    as sum+count; deletions as signed counts). The merged result is
    provably equal to rebuilding the pyramid from scratch over
    base ∪ delta, which is exactly what the driver oracle asserts.

    100 TB shape: the expensive side of an append is aggregating the
    DELTA (map-side partial agg over the new rows only); this merge
    then shuffles |existing ∩ affected| + |delta| pyramid rows — NOT
    the base table. When the pyramid is stored hive-partitioned by
    zoom (io/layout.py style), pair this with dynamic partition
    overwrite so only the delta's footprint is rewritten.
    """
    measures = [
        c for c in existing.columns
        if c not in ("zoom", "tile_x", "tile_y", "tile_id")
    ]
    aggs = {c: (agg_cols or {}).get(c, "sum") for c in measures}
    return (
        existing.unionByName(delta)
        .groupBy("zoom", "tile_x", "tile_y")
        .agg(*[getattr(F, aggs[c])(c).alias(c) for c in measures])
    )


def tile_mosaic(
    df: DataFrame,
    zoom: int,
    thumb: int = 8,
    id_col: str = "image_id",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Per-tile representative thumbnail — the raster side of the
    raster↔vector handoff made concrete: (tile_x, tile_y, image_id,
    bytes raw thumb×thumb, w, h, px_sum).

    Payload discipline is the whole point of the plan shape:
    1. pick each tile's representative (min id) from a PROJECTED frame
       (id + tile only) — the groupBy shuffle carries ~16 bytes/row,
       never the image payload;
    2. semi-join the representatives back to fetch ONLY their payloads
       (at 10^12 rows: one fetch per tile, not per image);
    3. decode + nearest-neighbour thumbnail via ops.resize_images.
    """
    from pyspark.sql import functions as F

    from geomesa_sql_spark.ops.multimodal import resize_images

    tiled = assign_tiles(df, zoom=zoom, x=x, y=y, with_hilbert=False)
    rep = (
        tiled.select("tile_x", "tile_y", id_col)
        .groupBy("tile_x", "tile_y")
        .agg(F.min(id_col).alias(id_col))
    )
    payload = df.select(id_col, "bytes", "fmt", "w", "h").join(
        rep.select(id_col), on=id_col, how="left_semi"
    )
    thumbs = resize_images(payload, out_size=thumb, id_col=id_col)
    return rep.join(thumbs, on=id_col).select(
        "tile_x", "tile_y", id_col, "bytes", "w", "h", "px_sum"
    )


def invert_tiles(
    df: DataFrame,
    zoom: int,
    tile_id: str = "tile_id",
    out: tuple[str, str] = ("tile_x", "tile_y"),
) -> DataFrame:
    """Inverse tile assignment: Hilbert ``tile_id`` → grid coords.

    The raster→vector back-edge: a frame of per-tile aggregates (tile
    server output, pyramid levels) keyed only by tile_id recovers its
    grid position — and, through ``tile_envelope``, a geometry that can
    re-enter ``spatial_join``. Vectorized ``hilbert_d2xy`` over Arrow
    batches; exact inverse of ``assign_tiles`` (cells/curve.py d2xy ∘
    xy2d = id, tested per-bit, and gated relationally: the driver
    oracle emits the forward (x, y) while this path emits the inverse
    from the id alone — hash equality proves them equal).

    Joining downstream? Join on ``tile_id`` itself, not on the
    recovered coords: a Python-UDF-derived column used as an equi-join
    key gets double-evaluated by Catalyst's inferred not-null
    constraint (the repo-wide rule) — if you must key on (x, y),
    localCheckpoint this frame first."""
    from geomesa_sql_spark.cells import hilbert_d2xy

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField(out[0], T.LongType()),
                T.StructField(out[1], T.LongType()),
            ]
        )
    )
    def _d2xy(ids: pd.Series) -> pd.DataFrame:
        x, y = hilbert_d2xy(ids.to_numpy(np.int64), zoom)
        return pd.DataFrame({out[0]: x, out[1]: y})

    tmp = "_inv_xy"
    res = df.withColumn(tmp, _d2xy(tile_id))
    for c in out:
        res = res.withColumn(c, F.col(f"{tmp}.{c}"))
    return res.drop(tmp)


def tile_envelope(
    df: DataFrame,
    zoom: int,
    x: str = "tile_x",
    y: str = "tile_y",
    prefix: str = "t",
) -> DataFrame:
    """Add the tile's lon/lat envelope (<prefix>minx/miny/maxx/maxy) as
    pure Column arithmetic (JVM codegen, no UDF) — the inverse of the
    FLOOR expressions in ``assign_tiles``. Feed the corners to
    ST_MakeEnvelope for a WKB polygon that re-enters the spatial-join
    surface (the raster→vector handoff's vector side)."""
    n = 1 << zoom
    return (
        df.withColumn(f"{prefix}minx", F.col(x) * (360.0 / n) - 180.0)
        .withColumn(f"{prefix}maxx", (F.col(x) + 1) * (360.0 / n) - 180.0)
        .withColumn(f"{prefix}miny", 90.0 - (F.col(y) + 1) * (180.0 / n))
        .withColumn(f"{prefix}maxy", 90.0 - F.col(y) * (180.0 / n))
    )


def assign_s2_cells(
    df: DataFrame,
    level: int,
    x: str = "lon",
    y: str = "lat",
    out: str = "s2_cell",
) -> DataFrame:
    """Add the canonical S2 cell id (cells/s2.py) at ``level``.

    The S2 grid is the north rule's named "H3/S2 index": the
    quadrilateralized-cube Hilbert layout, whose cells are near-equal
    area on the SPHERE (the equirect Z grid's cells shrink by cos(lat)
    toward the poles), so range-partitioning imagery by s2_cell keeps
    per-partition ground coverage uniform at any latitude — the right
    layout key for polar/global datasets.

    Encoding needs the table-driven Hilbert walk, so this is an
    Arrow-batched pandas UDF, NOT Column arithmetic. Per the engine's
    join-key rule (Catalyst double-evaluates UDF join keys through its
    inferred not-null constraint), do not feed ``out`` straight into a
    join key: materialize first (localCheckpoint / write) — the
    intended use is layout (repartitionByRange / writer sort),
    pruning (s2_range_predicate) and rollups, where the column is
    evaluated exactly once anyway."""
    from geomesa_sql_spark.cells import s2 as _s2

    @F.pandas_udf(T.LongType())
    def _enc(lons: pd.Series, lats: pd.Series) -> pd.Series:
        # pd.isna guard (CLAUDE.md NaN-encoded-NULL rule): NaN coords
        # would flow through the face CASE as face 2 / corner cell —
        # a valid-LOOKING id that mislocates the row (review r4n);
        # NULL in → NULL out, matching the registered S2_CellId UDF
        bad = (pd.isna(lons) | pd.isna(lats)).to_numpy()
        lo = lons.fillna(0.0).to_numpy(np.float64)
        la = lats.fillna(0.0).to_numpy(np.float64)
        res = pd.Series(_s2.lonlat_to_cell_id(lo, la, level)).astype("Int64")
        res[bad] = None
        return res

    return df.withColumn(out, _enc(x, y))


def s2_range_predicate(
    col: str,
    minlon: float,
    minlat: float,
    maxlon: float,
    maxlat: float,
    max_cells: int = 64,
    *,
    level: int,
):
    """Sargable bbox predicate over an S2 cell column: OR of BETWEEN
    ranges from the adaptive covering (cells/s2.cover_rect_ranges).
    Plain comparisons on an int64 column, so parquet/Iceberg min-max
    stats prune row groups/files when the data is s2-clustered —
    exactly how the engine's Z ``cell`` column prunes, but on the
    spherical grid. NOTE: S2 ids of faces 4-5 are NEGATIVE int64s
    (two's complement); ranges never straddle the sign flip because a
    cell's children share its face bits, so BETWEEN stays correct.

    ``level`` (REQUIRED, keyword-only since r5) = the level ``col``
    was encoded at (assign_s2_cells' ``level``; ``s2.MAX_LEVEL`` for
    leaf ids): without the floor, a bbox smaller than one stored cell
    covers at a finer level whose ranges exclude the stored id (the
    id is the midpoint of its own level-``level`` range) and the
    predicate silently drops matching rows (advice r4) — which is why
    the old ``level=None`` default was removed."""
    from geomesa_sql_spark.cells import s2 as _s2

    ranges = _s2.cover_rect_ranges(
        minlon, minlat, maxlon, maxlat, max_cells, max_level=level
    )
    pred = None
    for lo, hi in ranges:
        p = F.col(col).between(F.lit(int(lo)), F.lit(int(hi)))
        pred = p if pred is None else pred | p
    return pred if pred is not None else F.lit(False)
