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
]


def raster_info(df: DataFrame, id_col: str = "raster_id") -> DataFrame:
    """(id, rw, rh, epsg, CRS-unit bbox, lon/lat bbox) per GeoTIFF.

    Header-only (io/tiff.geotiff_info): IFD + GeoKey parse, zero
    decompression. lon/lat columns are null when the CRS is absent or
    outside geom/crs.py's registry (never a guess); a corrupt payload
    survives as one null row."""
    from geomesa_sql_spark.io.tiff import geotiff_bbox_lonlat, geotiff_info

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
                try:
                    info = geotiff_info(bytes(blob))
                except Exception:
                    rows.append((rid,) + (None,) * len(_INFO_FIELDS))
                    continue
                bbox = info.get("bbox") or (None, None, None, None)
                ll = geotiff_bbox_lonlat(info) or (None, None, None, None)
                rows.append(
                    (rid, info["w"], info["h"], info.get("epsg"), *bbox, *ll))
            yield pd.DataFrame(rows, columns=[id_col] + [n for n, _ in _INFO_FIELDS])

    return df.select(id_col, "bytes").mapInPandas(gen, schema)


def raster_band_stats(
    df: DataFrame, id_col: str = "raster_id", band: int = 0
) -> DataFrame:
    """(id, px_sum, px_min, px_max, px_mean) over one band — the
    full-decode pass (decode_tiff_raster: strips or tiles, any native
    dtype). Integer sums are exact (int64 accumulator); float bands
    sum in float64. Corrupt payloads survive as null rows."""
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
                    b = arr[..., min(band, arr.shape[2] - 1)]
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
    n = 1 << zoom

    def _tx(col):
        return F.least(
            F.greatest(
                F.floor((F.col(col) + F.lit(180.0)) / F.lit(360.0) * n), F.lit(0)
            ),
            F.lit(n - 1),
        ).cast("long")

    def _ty(col):
        return F.least(
            F.greatest(
                F.floor((F.lit(90.0) - F.col(col)) / F.lit(180.0) * n), F.lit(0)
            ),
            F.lit(n - 1),
        ).cast("long")

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
