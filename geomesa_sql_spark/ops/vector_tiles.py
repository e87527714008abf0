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
from geomesa_sql_spark.ops.tilewalk import tile_carry_map
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
    partitions: int | None = None,
    props: list[str] | None = None,
) -> DataFrame:
    """→ (tile_x, tile_y, n_features, mvt binary), one row per
    non-empty tile at ``zoom``.

    Grouping shape (review r4l): NOT ``groupBy().applyInPandas`` — at
    fine zooms that is one Python call + one pandas frame per TILE
    (~2 ms each; 4011 tiles at sf0.01 cost ~8 s of pure per-group
    overhead). Instead: repartition on the tile key, sort within
    partitions, then ONE ``mapInPandas`` pass per partition that walks
    contiguous tile groups with a carry across Arrow batch boundaries.
    Same single shuffle, per-tile cost drops to a pandas groupby
    slice. NULL ids are legal: those features are emitted without the
    optional id field (never cast NaN→INT64_MIN garbage).

    ``props``: optional column names carried as typed per-feature MVT
    properties (string/int/double/bool; NULL values dropped from the
    feature's tag list) — takes the per-feature framing path instead
    of the vectorized one, so prefer id-only tiles for the hot path."""
    n = 1 << zoom
    base = df.withColumn("tile_x", lon_tile_col(x, n)).withColumn(
        "tile_y", lat_tile_col(y, n)
    )
    px, py = _quantize_cols(zoom, extent, x, y)
    sel = [F.col("tile_x"), F.col("tile_y"), px.alias("px"), py.alias("py")]
    if id_col is not None:
        sel.append(F.col(id_col).cast("long").alias("fid"))
    for p in props or []:
        sel.append(F.col(p))
    quant = base.select(*sel)

    schema = "tile_x long, tile_y long, n_features long, mvt binary"

    def _encode_groups(pdf):
        rows = []
        for (tx, ty), g in pdf.groupby(["tile_x", "tile_y"], sort=False):
            ids = g["fid"] if "fid" in g.columns else None
            if props:
                feats = []
                px_a = g["px"].to_numpy(np.int64)
                py_a = g["py"].to_numpy(np.int64)
                for i in range(len(g)):
                    fid = None
                    if ids is not None and not pd.isna(ids.iloc[i]):
                        fid = int(ids.iloc[i])
                    fp = {}
                    for p in props:
                        v = g[p].iloc[i]
                        if v is None or (
                            isinstance(v, float) and v != v
                        ) or v is pd.NaT:
                            continue
                        fp[p] = v.item() if hasattr(v, "item") else v
                    feats.append(
                        {
                            "id": fid,
                            "type": mvt.GEOM_POINT,
                            "parts": [np.array([[px_a[i], py_a[i]]])],
                            "props": fp,
                        }
                    )
                blob = mvt.encode_tile({layer: feats}, extent=extent)
            else:
                blob = mvt.encode_point_layer(
                    layer,
                    g["px"].to_numpy(np.int64),
                    g["py"].to_numpy(np.int64),
                    ids=ids,
                    extent=extent,
                )
            rows.append((int(tx), int(ty), len(g), blob))
        return pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "n_features", "mvt"]
        )

    return tile_carry_map(quant, _encode_groups, schema, partitions)


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


def render_mvt_wkb(
    df: DataFrame,
    zoom: int,
    wkb: str = "geom",
    id_col: str | None = None,
    extent: int = 4096,
    layer: str = "shapes",
    max_tiles_per_row: int = 4096,
) -> DataFrame:
    """Geometry (WKB) → MVT: one tile per (geometry, covered tile).

    Scale shape mirrors raster_tiles: envelopes come from ONE Arrow
    stage and the tile fan-out is JVM ``sequence``+``explode`` on the
    shared FLOOR law; one shuffle groups per tile and the single
    Python stage decodes + quantizes + encodes. Unlike the point path,
    the WKB column DOES ride that shuffle, duplicated once per
    covering tile — inherent to whole-geometry encoding (every tile
    needs the coords), bounded by ``max_tiles_per_row``; a geometry
    covering more raises (``raise_error`` in the plan — silently
    capping would drop tiles; such a geometry belongs at a coarser
    zoom). Geometries are encoded WHOLE per covering tile with
    tile-local coordinates (legally outside [0, extent) — renderers
    clip; the MVT producer-clipping tradeoff, documented in
    io/mvt.py)."""
    from geomesa_sql_spark.geom.wkb import geom_from_wkb, wkb_envelopes
    from geomesa_sql_spark.tiles.assign import lat_tile_col, lon_tile_col

    n = 1 << zoom
    spanx, spany = 360.0 / n, 180.0 / n

    @F.pandas_udf("minx double, miny double, maxx double, maxy double")
    def _env(wb: pd.Series) -> pd.DataFrame:
        # batched envelope (r6): uniform-layout WKB reduces in numpy,
        # zero per-row Python; strict=False keeps the drop-malformed
        # contract (parse errors → NaN → NULL → explode drops the row)
        env = wkb_envelopes(wb.to_numpy(), strict=False)
        return pd.DataFrame(
            {
                "minx": env[:, 0],
                "miny": env[:, 1],
                "maxx": env[:, 2],
                "maxy": env[:, 3],
            }
        )

    keep = [wkb] + ([id_col] if id_col else [])
    env = df.select(*keep, _env(wkb).alias("_e")).select(
        *keep, "_e.minx", "_e.miny", "_e.maxx", "_e.maxy"
    )
    # NULL/undecodable geometries drop WITHOUT a filter: a Filter on a
    # UDF-struct field splits the plan and Catalyst re-evaluates the
    # envelope UDF on both sides (caught by the r5 plan assertion —
    # every WKB decoded twice). Instead NULL propagates into the tile
    # bounds (the clamp's least/greatest SKIP nulls, so it must be
    # gated explicitly), sequence(NULL, …) is NULL, and explode of a
    # NULL array emits no rows.
    def _guard(c):
        return F.when(F.col("minx").isNotNull(), c)

    fan = (
        env.withColumn("_tx0", _guard(lon_tile_col("minx", n)))
        .withColumn("_tx1", _guard(lon_tile_col("maxx", n)))
        .withColumn("_ty0", _guard(lat_tile_col("maxy", n)))
        .withColumn("_ty1", _guard(lat_tile_col("miny", n)))
        # the cap check must gate a column the plan actually CONSUMES
        # (an unused check column gets pruned by Catalyst and the
        # raise_error never evaluates): fold it into the sequence's
        # upper bound
        .withColumn(
            "_tx1",
            F.when(
                (F.col("_tx1") - F.col("_tx0") + 1)
                * (F.col("_ty1") - F.col("_ty0") + 1)
                > max_tiles_per_row,
                F.raise_error(F.lit(
                    f"geometry covers more than {max_tiles_per_row} tiles "
                    f"at zoom {zoom}; render at a coarser zoom"
                )).cast("long"),
            ).otherwise(F.col("_tx1")),
        )
        .withColumn("tile_x", F.explode(F.sequence("_tx0", "_tx1")))
        .withColumn("tile_y", F.explode(F.sequence("_ty0", "_ty1")))
        .drop("_tx0", "_tx1", "_ty0", "_ty1", "minx", "miny", "maxx", "maxy")
    )

    schema = "tile_x long, tile_y long, n_features long, mvt binary"

    # NOT groupBy().applyInPandas (the banned per-group dispatch shape,
    # r4 verdict #1): one shuffle on the tile key, then the shared
    # sorted carry walk. The encode itself is BATCHED (r6, guide §4.2):
    # uniform single-ring polygon WKB decodes, quantizes, orients and
    # protobuf-encodes as whole-batch numpy passes
    # (wkb_single_ring_polygons + mvt.encode_polygon_features_batch —
    # byte-identical to the per-feature path, which remains as the
    # fallback for multi-part/multi-ring/point/line rows), and tiles
    # are assembled by slicing the row-ordered feature-byte buffer at
    # tile boundaries — the rows arrive tile-sorted from the carry
    # walk, so a tile's features are one contiguous range.
    from geomesa_sql_spark.geom.wkb import wkb_single_ring_polygons

    def _encode_groups(pdf):
        n = len(pdf)
        txs = pdf["tile_x"].to_numpy(np.int64)
        tys = pdf["tile_y"].to_numpy(np.int64)
        blobs = pdf[wkb].to_numpy()
        if id_col:
            id_ser = pdf[id_col]
            id_na = id_ser.isna().to_numpy()
            # NULL-free int64 stays int64; a nullable column arrives
            # float64 and takes the same int() conversion the scalar
            # path applied per row
            ids64 = (
                id_ser.to_numpy()
                if id_ser.dtype == np.int64
                else np.where(id_na, 0, id_ser.to_numpy()).astype(np.int64)
            )
        tminx_all = txs * spanx - 180.0
        tmaxy_all = 90.0 - tys * spany
        row_len = np.zeros(n, dtype=np.int64)
        row_nfeat = np.zeros(n, dtype=np.int64)
        pieces: list[tuple[np.ndarray, np.ndarray]] = []
        groups, rest_idx = wkb_single_ring_polygons(blobs)
        for ridx, rings in groups:
            if rings.shape[1] < 3:
                rest_idx = np.concatenate([rest_idx, ridx])
                continue
            tmi = tminx_all[ridx][:, None]
            tma = tmaxy_all[ridx][:, None]
            # same floor→int64 ops as the scalar _q, whole-group
            qx = np.floor((rings[:, :, 0] - tmi) / spanx * extent)
            qy = np.floor((tma - rings[:, :, 1]) / spany * extent)
            qq = np.stack([qx, qy], axis=2).astype(np.int64)
            if id_col:
                buf, offs = mvt.encode_polygon_features_batch(
                    qq, ids64[ridx], ~id_na[ridx]
                )
            else:
                buf, offs = mvt.encode_polygon_features_batch(qq)
            row_len[ridx] = np.diff(offs)
            row_nfeat[ridx] = 1
            pieces.append((ridx, buf))
        for i in rest_idx.tolist():
            b = blobs[i]
            try:
                g = geom_from_wkb(bytes(b))
            except Exception:
                continue
            fid = None
            if id_col and not id_na[i]:
                fid = int(ids64[i])
            tminx, tmaxy = tminx_all[i], tmaxy_all[i]

            def _q(p):
                return np.column_stack([
                    np.floor((p[:, 0] - tminx) / spanx * extent),
                    np.floor((tmaxy - p[:, 1]) / spany * extent),
                ]).astype(np.int64)

            fb = bytearray()
            nf = 0
            for part in g.flatten():
                if part.type == "Point":
                    gtype, parts = mvt.GEOM_POINT, [_q(part.coords.reshape(1, 2))]
                elif part.type == "LineString":
                    if len(part.coords) < 2:
                        continue
                    gtype, parts = mvt.GEOM_LINESTRING, [_q(part.coords)]
                else:  # Polygon: NESTED [rings] so ring roles stay
                    # positional (ext first) — orientation is enforced
                    # structurally, never inferred from input winding
                    gtype, parts = (
                        mvt.GEOM_POLYGON,
                        [[_q(r) for r in part.coords]],
                    )
                fb += mvt.encode_feature_wrapped(fid, gtype, parts)
                nf += 1
            if nf:
                row_len[i] = len(fb)
                row_nfeat[i] = nf
                pieces.append(
                    (np.array([i]), np.frombuffer(bytes(fb), dtype=np.uint8))
                )
        dst_off = np.concatenate([[0], np.cumsum(row_len)])
        allbuf = np.empty(int(dst_off[-1]), dtype=np.uint8)
        for ridx, buf in pieces:
            allbuf[mvt._seg_positions(dst_off[ridx], row_len[ridx])] = buf
        change = (txs[1:] != txs[:-1]) | (tys[1:] != tys[:-1])
        tstarts = np.concatenate([[0], np.flatnonzero(change) + 1])
        tends = np.concatenate([tstarts[1:], [n]])
        rows = [
            (
                int(txs[s0]),
                int(tys[s0]),
                int(row_nfeat[s0:e0].sum()),
                mvt.encode_tile_from_features(
                    layer,
                    allbuf[dst_off[s0] : dst_off[e0]].tobytes(),
                    extent,
                ),
            )
            for s0, e0 in zip(tstarts, tends)
        ]
        return pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "n_features", "mvt"]
        )

    return tile_carry_map(fan, _encode_groups, schema)


def mvt_features(
    tiles: DataFrame,
    layer: str | None = None,
    zoom: int | None = None,
) -> DataFrame:
    """Foreign-tile INPUT surface: decode MVT blobs → one row per
    feature: (tile_x, tile_y, layer, feature_id, geom_type, n_parts,
    n_points, px, py[, lon, lat]) with (px, py) the first vertex in
    tile-local coords; when ``zoom`` is given, point features also get
    lon/lat re-projected through the tile envelope (the inverse of the
    render quantization, cell-center convention). Strict decode —
    malformed blobs raise (io/errors.py convention), they do not
    silently drop."""

    def _dec(it):
        for pdf in it:
            rows = []
            for tx, ty, blob in zip(pdf["tile_x"], pdf["tile_y"], pdf["mvt"]):
                t = mvt.decode_tile(bytes(blob))
                for lname, ldata in t.items():
                    if layer is not None and lname != layer:
                        continue
                    ext = ldata["extent"]
                    for f in ldata["features"]:
                        p0 = f["parts"][0][0] if f["parts"] else (None, None)
                        npts = sum(len(p) for p in f["parts"])
                        lon = lat = None
                        if zoom is not None and p0[0] is not None:
                            n = 1 << zoom
                            spanx, spany = 360.0 / n, 180.0 / n
                            lon = (tx * spanx - 180.0) + (
                                (float(p0[0]) + 0.5) / ext * spanx
                            )
                            lat = (90.0 - ty * spany) - (
                                (float(p0[1]) + 0.5) / ext * spany
                            )
                        rows.append(
                            (
                                int(tx), int(ty), lname, f["id"],
                                int(f["type"]), len(f["parts"]), int(npts),
                                int(p0[0]) if p0[0] is not None else None,
                                int(p0[1]) if p0[1] is not None else None,
                                lon, lat,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "tile_x", "tile_y", "layer", "feature_id", "geom_type",
                    "n_parts", "n_points", "px", "py", "lon", "lat",
                ],
            )

    return tiles.mapInPandas(
        _dec,
        "tile_x long, tile_y long, layer string, feature_id long, "
        "geom_type int, n_parts int, n_points long, px long, py long, "
        "lon double, lat double",
    )
