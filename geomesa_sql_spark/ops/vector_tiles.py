"""Vector-tile rendering: point DataFrames → MVT blobs per tile.

The vector twin of ops/raster.render_tiles (which emits GeoTIFF count
grids): one standard Mapbox Vector Tile (io/mvt.py) per slippy tile,
servable directly by any tile server / map client. Shapes for scale:

- tile assignment + pixel quantization are plain Column arithmetic
  sharing tiles/assign.py's FLOOR laws (the one-source-of-truth rule
  for handoff keys), so the only Python stage is the per-tile encode;
- exactly one shuffle (groupBy tile), carrying only the quantized
  int coords + optional id/props columns — never payload bytes;
- encode is the vectorized point fast path (io/mvt.encode_point_layer:
  one numpy pass for all command words, bulk varint serialization).

``mvt_stats`` decodes blobs back into per-tile feature counts and
coordinate sums — the encode∘decode consistency surface the driver
gate (`tile_assign`) checks relationally against DuckDB's replay of
the same FLOOR quantization laws.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_sql_spark.io import mvt
from geomesa_sql_spark.tiles.assign import lat_tile_col, lon_tile_col


def _quantize_cols(zoom: int, extent: int, x: str, y: str):
    """Tile-local integer pixel coords as Columns — IEEE-exact twins
    of the oracle SQL in __spark_entry__ (exact-binary spans, shared
    op order), clamped into [0, extent-1]."""
    n = 1 << zoom
    spanx = 360.0 / n  # exact binary for zoom <= 53
    spany = 180.0 / n
    px = F.floor(
        (F.col(x) - (F.col("tile_x") * F.lit(spanx) - F.lit(180.0)))
        / F.lit(spanx) * F.lit(float(extent))
    ).cast("long")
    py = F.floor(
        ((F.lit(90.0) - F.col("tile_y") * F.lit(spany)) - F.col(y))
        / F.lit(spany) * F.lit(float(extent))
    ).cast("long")
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(extent - 1))  # noqa: E731
    return clamp(px), clamp(py)


def render_mvt(
    df: DataFrame,
    zoom: int,
    extent: int = 4096,
    x: str = "lon",
    y: str = "lat",
    id_col: str | None = None,
    layer: str = "points",
) -> DataFrame:
    """→ (tile_x, tile_y, n_features, mvt binary), one row per
    non-empty tile at ``zoom``."""
    n = 1 << zoom
    px, py = None, None
    base = df.withColumn("tile_x", lon_tile_col(x, n)).withColumn(
        "tile_y", lat_tile_col(y, n)
    )
    px, py = _quantize_cols(zoom, extent, x, y)
    cols = ["tile_x", "tile_y"]
    sel = [F.col("tile_x"), F.col("tile_y"), px.alias("px"), py.alias("py")]
    if id_col is not None:
        sel.append(F.col(id_col).cast("long").alias("fid"))
    quant = base.select(*sel)

    schema = "tile_x long, tile_y long, n_features long, mvt binary"

    def _encode(key, pdf):
        ids = pdf["fid"].to_numpy(np.int64) if "fid" in pdf.columns else None
        blob = mvt.encode_point_layer(
            layer,
            pdf["px"].to_numpy(np.int64),
            pdf["py"].to_numpy(np.int64),
            ids=ids,
            extent=extent,
        )
        return pd.DataFrame(
            {
                "tile_x": [key[0]],
                "tile_y": [key[1]],
                "n_features": [len(pdf)],
                "mvt": [blob],
            }
        )

    return quant.groupBy(*cols).applyInPandas(_encode, schema)


def mvt_stats(tiles: DataFrame, layer: str = "points") -> DataFrame:
    """Decode MVT blobs → per-tile (n_rows, spx, spy): feature count
    and sums of decoded pixel coords. Every coordinate round-trips
    through the command/zigzag/varint stream, so equality against the
    quantization closed form proves encode∘decode identity."""

    def _dec(it):
        for pdf in it:
            rows = []
            for tx, ty, blob in zip(pdf["tile_x"], pdf["tile_y"], pdf["mvt"]):
                t = mvt.decode_tile(bytes(blob))
                feats = t[layer]["features"]
                pts = np.array(
                    [f["parts"][0][0] for f in feats], dtype=np.int64
                ).reshape(-1, 2)
                rows.append((tx, ty, len(feats), int(pts[:, 0].sum()), int(pts[:, 1].sum())))
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "n_rows", "spx", "spy"]
            )

    return tiles.mapInPandas(_dec, "tile_x long, tile_y long, n_rows long, spx long, spy long")
