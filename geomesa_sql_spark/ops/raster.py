"""Raster (GeoTIFF) ingest operators — the raster side of the
raster↔vector handoff.

The reference engine (bxkftechteam/geomesa-sql) is vector-only; the
north-star surface adds "Z-order/Hilbert tile assignment for
raster<->vector handoff", and these operators are the ingest edge of
it: opaque GeoTIFF payload columns (`bytes`) become georeferenced
rows that join the vector/tiling surface (`tiles.assign_tiles`,
`spatial_join`, `ST_MakeEnvelope`).

Scale shape (100 TB of imagery):

- ``raster_info`` parses ONLY the TIFF header/IFD (geotiff_info) — no
  decompression — so the catalog pass that prunes by bbox/CRS costs
  header bytes per file, not pixel decode. It still ships the payload
  into the Python worker once (Arrow batch); run it at ingest and
  persist the result, the same discipline as ops/multimodal.py.
- ``raster_band_stats`` is the full-decode pass; like image_stats it
  projects only what it needs and survives corrupt payloads as null
  rows (a bad file must not kill a 100 TB pass).
- ``raster_tiles`` is pure Column arithmetic + ``sequence``/``explode``
  (JVM codegen, no UDF): the covered-tile fan-out happens after the
  tiny info frame exists, so the explode never carries payload bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_sql_spark.ops.tilewalk import tile_carry_map

_INFO_FIELDS = [
    ("rw", T.IntegerType()),
    ("rh", T.IntegerType()),
    ("epsg", T.IntegerType()),
    ("minx", T.DoubleType()),
    ("miny", T.DoubleType()),
    ("maxx", T.DoubleType()),
    ("maxy", T.DoubleType()),
    ("minlon", T.DoubleType()),
    ("minlat", T.DoubleType()),
    ("maxlon", T.DoubleType()),
    ("maxlat", T.DoubleType()),
    ("pages", T.IntegerType()),
]


def raster_info(df: DataFrame, id_col: str = "raster_id") -> DataFrame:
    """(id, rw, rh, epsg, CRS-unit bbox, lon/lat bbox) per GeoTIFF.

    Header-only (io/tiff.geotiff_info): IFD + GeoKey parse, zero
    decompression. lon/lat columns are null when the CRS is absent or
    outside geom/crs.py's registry (never a guess); a corrupt payload
    survives as one null row. ``pages`` counts the IFD chain (1 +
    overview-pyramid levels — decode_tiff_raster(page=k) reads them)."""
    from geomesa_sql_spark.io.tiff import (
        geotiff_bbox_lonlat,
        geotiff_info,
        tiff_page_count,
    )

    schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(n, t) for n, t in _INFO_FIELDS]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf["bytes"]):
                if blob is None:
                    rows.append((rid,) + (None,) * len(_INFO_FIELDS))
                    continue
                b = bytes(blob)
                try:
                    info = geotiff_info(b)
                except Exception:
                    rows.append((rid,) + (None,) * len(_INFO_FIELDS))
                    continue
                try:
                    # a corrupt next-IFD CHAIN must not kill the row:
                    # page 0 parsed fine, so keep it and null the count
                    pages = tiff_page_count(b)
                except Exception:
                    pages = None
                bbox = info.get("bbox") or (None, None, None, None)
                ll = geotiff_bbox_lonlat(info) or (None, None, None, None)
                rows.append(
                    (rid, info["w"], info["h"], info.get("epsg"), *bbox, *ll,
                     pages))
            yield pd.DataFrame(rows, columns=[id_col] + [n for n, _ in _INFO_FIELDS])

    return df.select(id_col, "bytes").mapInPandas(gen, schema)


def raster_band_stats(
    df: DataFrame, id_col: str = "raster_id", band: int = 0
) -> DataFrame:
    """(id, px_sum, px_min, px_max, px_mean) over one band — the
    full-decode pass (decode_tiff_raster: strips or tiles, any native
    dtype). Integer sums are exact (int64 accumulator); float bands
    sum in float64. Corrupt payloads — and rows whose file has fewer
    bands than ``band`` asks for — survive as null rows (never
    another band's numbers)."""
    from geomesa_sql_spark.io.tiff import decode_tiff_raster

    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("px_sum", T.DoubleType()),
            T.StructField("px_min", T.DoubleType()),
            T.StructField("px_max", T.DoubleType()),
            T.StructField("px_mean", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf["bytes"]):
                try:
                    arr, _info = decode_tiff_raster(bytes(blob))
                    if band >= arr.shape[2]:
                        raise ValueError("band index beyond file bands")
                    b = arr[..., band]
                    if b.dtype.kind in "ui":
                        s = float(b.sum(dtype=np.int64))
                    else:
                        s = float(b.sum(dtype=np.float64))
                    rows.append(
                        (rid, s, float(b.min()), float(b.max()), s / b.size))
                except Exception:
                    rows.append((rid, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[id_col, "px_sum", "px_min", "px_max", "px_mean"])

    return df.select(id_col, "bytes").mapInPandas(gen, schema)


def raster_checksum(
    df: DataFrame, id_cols: tuple[str, ...] = ("tile_x", "tile_y"),
    band: int = 0,
) -> DataFrame:
    """(…id_cols, checksum, n_sum, epsg, minlon/minlat/maxlon/maxlat)
    per GeoTIFF payload: a position-weighted band checksum
    Σ v[r,c]·(r·W + c + 1) plus the plain sum and the DECODED
    georeferencing — the relational gate for rendered rasters (the
    DuckDB oracle recomputes both sums from closed-form counts and the
    bbox from the tile-envelope law, so hash equality proves the
    encode→decode loop preserved every pixel AND the geo tags)."""
    from geomesa_sql_spark.io.tiff import decode_tiff_raster

    schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("checksum", T.LongType()),
            T.StructField("n_sum", T.LongType()),
            T.StructField("epsg", T.IntegerType()),
            T.StructField("minlon", T.DoubleType()),
            T.StructField("minlat", T.DoubleType()),
            T.StructField("maxlon", T.DoubleType()),
            T.StructField("maxlat", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in range(len(pdf)):
                ids = tuple(pdf[c].iloc[k] for c in id_cols)
                blob = pdf["bytes"].iloc[k]
                try:
                    arr, info = decode_tiff_raster(bytes(blob))
                    if band >= arr.shape[2]:
                        raise ValueError("band index beyond file bands")
                    b = arr[..., band].astype(np.int64)
                    h, w = b.shape
                    wgt = (np.arange(h)[:, None] * w + np.arange(w)[None, :] + 1)
                    # int64 wraps silently above ~2^63; big-value rasters
                    # near the pixel cap go through exact Python ints,
                    # and a result that doesn't FIT the BIGINT column is
                    # reported null — never a wrapped number
                    if float(np.abs(b).max(initial=0)) * (h * w + 1) * b.size \
                            > 2**62:
                        cks = sum(int(v) * int(g)
                                  for v, g in zip(b.reshape(-1), wgt.reshape(-1)))
                        tot = sum(int(v) for v in b.reshape(-1))
                    else:
                        cks = int((b * wgt).sum())
                        tot = int(b.sum())
                    i64 = 2**63
                    cks = cks if -i64 <= cks < i64 else None
                    tot = tot if -i64 <= tot < i64 else None
                    bbox = info.get("bbox") or (None,) * 4
                    rows.append(ids + (cks, tot, info.get("epsg"), *bbox))
                except Exception:
                    rows.append(ids + (None,) * 7)
            yield pd.DataFrame(
                rows,
                columns=list(id_cols)
                + ["checksum", "n_sum", "epsg",
                   "minlon", "minlat", "maxlon", "maxlat"],
            )

    return df.select(*id_cols, "bytes").mapInPandas(gen, schema)


def raster_tiles(
    info_df: DataFrame,
    zoom: int,
    id_col: str = "raster_id",
    with_hilbert: bool = False,
) -> DataFrame:
    """Covered-tile fan-out: one row per (raster, tile) the raster's
    lon/lat bbox overlaps at ``zoom`` — the raster→vector handoff key.

    Input is ``raster_info`` output (or any frame with minlon/minlat/
    maxlon/maxlat). Pure Column arithmetic: the same FLOOR tile law as
    tiles.assign_tiles, ranges expanded JVM-side with
    ``sequence``+``explode`` (no UDF, no payload bytes in the fan-out).
    Rows with a null bbox (corrupt / unsupported CRS) drop out of the
    explode — callers keep them from ``raster_info`` if they need the
    audit trail. ``with_hilbert`` adds the Hilbert ``tile_id`` so the
    fan-out range-partitions like every other tile frame."""
    from geomesa_sql_spark.tiles.assign import lat_tile_col, lon_tile_col

    n = 1 << zoom

    def _tx(col):
        return lon_tile_col(col, n)

    def _ty(col):
        return lat_tile_col(col, n)

    out = (
        info_df.where(
            F.col("minlon").isNotNull() & F.col("maxlat").isNotNull()
        )
        .withColumn("_tx0", _tx("minlon"))
        .withColumn("_tx1", _tx("maxlon"))
        # tile_y grows north→south: maxlat gives the smaller row
        .withColumn("_ty0", _ty("maxlat"))
        .withColumn("_ty1", _ty("minlat"))
        .withColumn("tile_x", F.explode(F.sequence("_tx0", "_tx1")))
        .withColumn("tile_y", F.explode(F.sequence("_ty0", "_ty1")))
        .drop("_tx0", "_tx1", "_ty0", "_ty1")
    )
    if with_hilbert:
        from geomesa_sql_spark.cells import hilbert_xy2d

        @F.pandas_udf(T.LongType())
        def _hilbert(txs: pd.Series, tys: pd.Series) -> pd.Series:
            return pd.Series(
                hilbert_xy2d(txs.to_numpy(np.int64), tys.to_numpy(np.int64), zoom)
            )

        out = out.withColumn("tile_id", _hilbert("tile_x", "tile_y"))
    return out


def render_tiles(
    df: DataFrame,
    zoom: int,
    tile_px: int = 64,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Vector→raster render: aggregate points into per-tile count grids
    written as REAL georeferenced GeoTIFF payloads — the tile-server
    render stage of the raster↔vector handoff.

    Output: (tile_x, tile_y, n_points, bytes) where ``bytes`` is a
    deflate GeoTIFF (uint32 counts, EPSG:4326, pixel scale = tile
    extent / ``tile_px``, tiepoint at the tile's NW corner) that
    ``raster_info``/``decode_tiff_raster`` — or any GeoTIFF reader —
    round-trips.

    Plan shape (the part that matters at 10^12 points):
    1. global pixel index (gx, gy) at zoom+log2(tile_px) as pure Column
       FLOOR arithmetic (same law as tiles.assign_tiles, JVM codegen);
    2. groupBy(gx, gy).count() — map-side partial agg collapses the
       point set to ≤ (2^z·tile_px)² pixel rows BEFORE any wide
       exchange carries coordinates;
    3. one shuffle on the tile key over the pixel counts (≤ tile_px²
       rows per tile), then the sorted mapInPandas carry walk
       (ops/tilewalk.py) assembles the grid and encodes — payload
       bytes are BORN in the last stage and never shuffle.

    ``tile_px`` must be a power of two so tile/pixel split is exact bit
    arithmetic on the shared global index (no float re-derivation that
    could disagree with assign_tiles at ulp boundaries)."""
    counts = _pixel_counts(df, zoom, tile_px, x, y)
    return _assemble_tiles(counts, zoom, tile_px)


def _pixel_counts(df: DataFrame, zoom: int, tile_px: int, x: str, y: str
                  ) -> DataFrame:
    """(gx, gy, cnt) at the global pixel grid of zoom+log2(tile_px) —
    the pixel grid IS the tile law at a deeper zoom, built from the
    same single-source expressions (tiles/assign.py)."""
    from geomesa_sql_spark.tiles.assign import lat_tile_col, lon_tile_col

    if tile_px < 1 or tile_px & (tile_px - 1):
        raise ValueError("tile_px must be a power of two")
    m = (1 << zoom) * tile_px
    return (
        df.select(lon_tile_col(x, m).alias("gx"), lat_tile_col(y, m).alias("gy"))
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_RENDER_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def _assemble_tiles(counts: DataFrame, zoom: int, tile_px: int) -> DataFrame:
    """(gx, gy, cnt) pixel counts → per-tile GeoTIFF rows at ``zoom``."""
    p2 = tile_px.bit_length() - 1
    n = 1 << zoom
    m = n * tile_px
    split = counts.select(
        F.shiftright("gx", p2).alias("tile_x"),
        F.shiftright("gy", p2).alias("tile_y"),
        (F.col("gx") % F.lit(tile_px)).cast("int").alias("px"),
        (F.col("gy") % F.lit(tile_px)).cast("int").alias("py"),
        "cnt",
    )

    def build(tx, ty, pdf):
        from geomesa_sql_spark.io.tiff import encode_geotiff

        grid = np.zeros((tile_px, tile_px), dtype=np.uint32)
        # SATURATE at the uint32 ceiling instead of wrapping: a zoom-0
        # pixel over 10^12 points can exceed 2^32 counts, and a wrapped
        # value is silent corruption (n_points stays exact int64)
        cnt = np.minimum(pdf["cnt"].to_numpy(np.int64), 0xFFFFFFFF)
        grid[pdf["py"].to_numpy(np.int64), pdf["px"].to_numpy(np.int64)] = (
            cnt.astype(np.uint32))
        # NW-corner tiepoint per the tile_envelope law (same expression
        # text the DuckDB oracle re-derives)
        tminx = tx * (360.0 / n) - 180.0
        tmaxy = 90.0 - ty * (180.0 / n)
        blob = encode_geotiff(
            grid,
            pixel_scale=(360.0 / m, 180.0 / m),
            tiepoint_xy=(tminx, tmaxy),
            epsg=4326,
            tile=tile_px if tile_px >= 16 else None,
            compression="deflate",
        )
        return (tx, ty, int(pdf["cnt"].sum()), blob)

    # NOT groupBy().applyInPandas (the banned per-group dispatch shape,
    # r4 verdict #1): a pyramid render hits millions of tiles and the
    # ~2 ms/group Python dispatch dominates; the shared sorted carry
    # walk pays one dispatch per Arrow batch. Rows per tile are already
    # collapsed to ≤ tile_px² pixel counts before this shuffle.
    def _encode_groups(pdf):
        rows = [
            build(int(tx), int(ty), g)
            for (tx, ty), g in pdf.groupby(["tile_x", "tile_y"], sort=False)
        ]
        return pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "n_points", "bytes"]
        )

    return tile_carry_map(split, _encode_groups, _RENDER_SCHEMA)


def render_pyramid(
    df: DataFrame,
    zoom: int,
    min_zoom: int = 0,
    tile_px: int = 64,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Multi-zoom render: (zoom, tile_x, tile_y, n_points, bytes) for
    every level from ``zoom`` down to ``min_zoom`` — the full tile-server
    pyramid from ONE pass over the points.

    The point set collapses to finest-grid pixel counts once (the
    expensive shuffle); each coarser level is one integer-shift rollup
    of the previous level's pixel counts (gx>>1, gy>>1 — the same
    shared-work shape as tiles.build_pyramid), so total shuffle volume
    is Σ_z |pixels at z| ≤ 4/3·|pixels at max zoom|, independent of the
    input row count. Each level's pixel frame is the next level's
    input, so Spark reuses the lineage; for very deep pyramids persist
    the finest counts first."""
    if min_zoom < 0 or min_zoom > zoom:
        raise ValueError("need 0 <= min_zoom <= zoom")
    cur = _pixel_counts(df, zoom, tile_px, x, y)
    frames = []
    for z in range(zoom, min_zoom - 1, -1):
        frames.append(
            _assemble_tiles(cur, z, tile_px).withColumn("zoom", F.lit(z)))
        if z > min_zoom:
            cur = (
                cur.select(
                    F.shiftright("gx", 1).alias("gx"),
                    F.shiftright("gy", 1).alias("gy"),
                    "cnt",
                )
                .groupBy("gx", "gy")
                .agg(F.sum("cnt").alias("cnt"))
            )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("zoom", "tile_x", "tile_y", "n_points", "bytes")
