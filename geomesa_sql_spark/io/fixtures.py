"""Deterministic fixtures: the graft images table + geo derivations.

Two kinds of test input (FIXTURES.md):

1. **The canonical images table (F0)** — synthesized here exactly per
   the BASELINE.json input_hint shape
   ``(image_id, bytes, w, h, fmt, caption, phash)``, geo-anchored by
   phash bits with EXIF-style overrides. Generated distributed
   (mapInPandas over spark.range) and deterministically (splitmix64 of
   the row index; no RNG state).

2. **Geo derivations over the driver's parquet tables** — lon/lat and
   polygon columns computed from integer keys with *pure arithmetic*,
   expressed once as SQL text used verbatim by BOTH the Spark engine
   (F.expr) and the DuckDB oracle, so every spatial operator gets an
   exact relational oracle (SURVEY.md §5.3 differential-testing model;
   the reference's analog is its 'scannable' no-pushdown table flavor +
   CSV adapter, GeoMesaCalciteTestUtils.scala:34-39).

The multiplicative constants (7919, 104729 — primes) spread keys over
the full lon/lat range; offsets of +0.005 on polygon corners keep
geometry edges off the 0.01-degree point lattice so boundary
classification can never disagree between engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_sql_spark.geom.model import box
from geomesa_sql_spark.geom.wkb import geom_to_wkb
from geomesa_sql_spark.io.images import encode_png, encode_raw

# ------------------------------------------------------------ SQL derivations
# These strings are valid in BOTH Spark SQL and DuckDB; engine and
# oracle evaluate literally the same expression text.

ORDERS_LON_SQL = "CAST((o_orderkey * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0"
ORDERS_LAT_SQL = "CAST((o_orderkey * 104729 + o_custkey) % 18000 AS DOUBLE) / 100.0 - 90.0"

SUPPLIER_LON_SQL = "CAST((s_suppkey * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0"
SUPPLIER_LAT_SQL = "CAST((s_suppkey * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0"

NATION_CX_SQL = "CAST(((n_nationkey * 7919) % 340) - 170 AS DOUBLE) + 0.005"
NATION_CY_SQL = "CAST(((n_nationkey * 104729) % 160) - 80 AS DOUBLE) + 0.005"
NATION_HS_SQL = "CAST(3 + (n_nationkey % 5) AS DOUBLE)"


def orders_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders + deterministic (lon, lat) point columns."""
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("lon", F.expr(ORDERS_LON_SQL))
        .withColumn("lat", F.expr(ORDERS_LAT_SQL))
    )


def orders_points_sql(sf_dir: str | None = None) -> str:
    t = "orders" if sf_dir is None else f"'{sf_dir}/orders.parquet'"
    return (
        f"SELECT *, {ORDERS_LON_SQL} AS lon, {ORDERS_LAT_SQL} AS lat FROM {t}"
    )


# Clustered-points fixture for density clustering (ops/cluster.py):
# 3/4 of the subset land in dense ±1-degree blobs around a 10×6 grid of
# centers 7 degrees apart (only the orderkey residues TPC-H emits are
# populated — ~30 blobs); the rest scatter uniformly over the same
# window, giving core/border/noise structure at every SF. Pure
# arithmetic, evaluated verbatim by Spark and DuckDB.
CLUSTER_SUBSET_SQL = "o_orderkey % 3 <> 0"
CLUSTER_X_SQL = (
    "CASE WHEN o_orderkey % 2 = 0 "
    "THEN CAST((o_orderkey * 7919) % 7200 AS DOUBLE) / 100.0 - 36.0 "
    "ELSE CAST((o_orderkey % 60) % 10 AS DOUBLE) * 7.0 - 31.5 "
    "+ CAST((o_orderkey * 7919) % 2000 AS DOUBLE) / 1000.0 - 1.0 END"
)
CLUSTER_Y_SQL = (
    "CASE WHEN o_orderkey % 2 = 0 "
    "THEN CAST((o_orderkey * 104729) % 3600 AS DOUBLE) / 100.0 - 18.0 "
    "ELSE FLOOR(CAST(o_orderkey % 60 AS DOUBLE) / 10.0) * 7.0 - 17.5 "
    "+ CAST((o_orderkey * 104729) % 2000 AS DOUBLE) / 1000.0 - 1.0 END"
)


def cluster_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders subset + deterministic clustered (x, y) point columns."""
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.expr(CLUSTER_SUBSET_SQL))
        .withColumn("x", F.expr(CLUSTER_X_SQL))
        .withColumn("y", F.expr(CLUSTER_Y_SQL))
    )


def supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .withColumn("slon", F.expr(SUPPLIER_LON_SQL))
        .withColumn("slat", F.expr(SUPPLIER_LAT_SQL))
    )


def supplier_points_sql(sf_dir: str | None = None) -> str:
    t = "supplier" if sf_dir is None else f"'{sf_dir}/supplier.parquet'"
    return f"SELECT *, {SUPPLIER_LON_SQL} AS slon, {SUPPLIER_LAT_SQL} AS slat FROM {t}"


def nation_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation + square polygon (WKB) + its corner columns.

    The polygon set for spatial-join tests: 25 axis-aligned squares of
    half-extent 3..7°, centers spread over the world, corners offset
    +0.005 off the point lattice.
    """
    df = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .withColumn("cx", F.expr(NATION_CX_SQL))
        .withColumn("cy", F.expr(NATION_CY_SQL))
        .withColumn("hs", F.expr(NATION_HS_SQL))
        .withColumn("pminx", F.col("cx") - F.col("hs"))
        .withColumn("pminy", F.col("cy") - F.col("hs"))
        .withColumn("pmaxx", F.col("cx") + F.col("hs"))
        .withColumn("pmaxy", F.col("cy") + F.col("hs"))
    )

    @F.pandas_udf(T.BinaryType())
    def _boxwkb(
        minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                geom_to_wkb(box(a, b, c, d))
                for a, b, c, d in zip(minx, miny, maxx, maxy)
            ],
            dtype=object,
        )

    return df.withColumn("poly", _boxwkb("pminx", "pminy", "pmaxx", "pmaxy"))


def nation_squares_sql(sf_dir: str | None = None) -> str:
    t = "nation" if sf_dir is None else f"'{sf_dir}/nation.parquet'"
    return (
        f"SELECT *, {NATION_CX_SQL} AS cx, {NATION_CY_SQL} AS cy, {NATION_HS_SQL} AS hs, "
        f"{NATION_CX_SQL} - {NATION_HS_SQL} AS pminx, "
        f"{NATION_CY_SQL} - {NATION_HS_SQL} AS pminy, "
        f"{NATION_CX_SQL} + {NATION_HS_SQL} AS pmaxx, "
        f"{NATION_CY_SQL} + {NATION_HS_SQL} AS pmaxy FROM {t}"
    )


# ------------------------------------------------------------ images table


def _splitmix64(i: np.ndarray) -> np.ndarray:
    z = i.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_WORDS = (
    "ocean river mountain forest desert island valley canyon glacier coast "
    "harbor bridge tower temple market castle garden station museum plaza "
    "sunset sunrise storm aurora horizon meadow lagoon reef dune summit"
).split()


def _captions(idx: np.ndarray) -> list[str]:
    base = (idx.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(len(_WORDS))
    out = []
    for i, b in zip(idx.tolist(), base.tolist()):
        words = [_WORDS[(b + j * 97) % len(_WORDS)] for j in range(5)]
        out.append(f"caption {i:06d} " + " ".join(words))
    return out


def image_pixels(i: int, size: int) -> np.ndarray:
    """Deterministic test image per FIXTURES.md F0."""
    x = np.arange(size)[None, :, None]
    y = np.arange(size)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((i * 31 + x * 7 + y * 13 + c * 97) % 256).astype(np.uint8)


def images_table(
    spark: SparkSession,
    n: int,
    size: int = 16,
    partitions: int | None = None,
    fmt: str = "mixed",
) -> DataFrame:
    """Synthesize the canonical image+caption table, geo-anchored.

    Columns: image_id, bytes, w, h, fmt, caption, phash, lon, lat.
    lon/lat derive from phash bits; every 10th row takes EXIF-style
    overrides (FIXTURES.md F0 geo-anchoring).
    """
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("phash", T.LongType()),
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy(np.int64)
            ph = _splitmix64(idx)
            lon = (ph & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 360 - 180
            lat = (ph >> np.uint64(32)).astype(np.float64) / 2**32 * 180 - 90
            exif = idx % 10 == 0
            lon[exif] = (idx[exif] % 90).astype(np.float64)
            lat[exif] = ((idx[exif] + 1) % 90).astype(np.float64)
            payloads = []
            fmts = []
            for i in idx.tolist():
                px = image_pixels(i, size)
                use_png = fmt == "png" or (fmt == "mixed" and i % 2 == 1)
                if use_png:
                    payloads.append(encode_png(px))
                    fmts.append("png")
                else:
                    payloads.append(encode_raw(px))
                    fmts.append("raw")
            yield pd.DataFrame(
                {
                    "image_id": [f"#{i}" for i in idx.tolist()],
                    "bytes": payloads,
                    "w": np.full(len(idx), size, dtype=np.int32),
                    "h": np.full(len(idx), size, dtype=np.int32),
                    "fmt": fmts,
                    "caption": _captions(idx),
                    "phash": ph.view(np.int64),
                    "lon": lon,
                    "lat": lat,
                }
            )

    if partitions is None:
        # don't over-partition tiny tables: each Python-UDF partition
        # costs a worker round-trip, so give every task ≥256 rows
        partitions = max(1, min(spark.sparkContext.defaultParallelism, n // 256))
    rng = spark.range(0, n, 1, partitions)
    return rng.mapInPandas(gen, schema)


# ----------------------------------------------------------- GeoTIFF fixture

# closed-form georeferencing laws (FIXTURES.md F10) — the DuckDB oracle
# re-derives these as SQL text, so keep engine and oracle in lockstep
GEOTIFF_SIZE = 16
GEOTIFF_SCALE = (0.05, 0.1)  # CRS units per pixel (sx, sy)


def geotiff_pixels(i: int) -> np.ndarray:
    """Deterministic uint16 band per raster: (i·31 + x·7 + y·13) mod 4096."""
    x = np.arange(GEOTIFF_SIZE)[None, :]
    y = np.arange(GEOTIFF_SIZE)[:, None]
    return ((i * 31 + x * 7 + y * 13) % 4096).astype(np.uint16)


def geotiff_anchor(i: int) -> tuple[float, float]:
    """Upper-left tiepoint (lon0, lat0): integer-grid anchors inside
    the valid range (bbox extends +0.8 lon, −1.6 lat from here)."""
    return (-170.0 + (i * 37) % 320, -75.0 + (i * 53) % 160)


def geotiff_table(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Synthesize the canonical GeoTIFF raster table (raster_id, bytes).

    Every payload is a real GeoTIFF from io/tiff.encode_geotiff —
    16×16 uint16 band with closed-form pixels and EPSG:4326
    georeferencing — and the ORGANIZATION cycles through the decode
    surface (strip vs tiled × none/lzw/deflate/packbits × predictor on
    i%3==0 × BigTIFF on i%5==0), so the driver-gated query exercises
    every layout the decoder claims, not just the writer's
    favourite."""
    from geomesa_sql_spark.io.tiff import encode_geotiff

    comps = ("none", "lzw", "deflate", "packbits")
    schema = T.StructType(
        [
            T.StructField("raster_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy(np.int64)
            ids, blobs = [], []
            for i in idx.tolist():
                lon0, lat0 = geotiff_anchor(i)
                blob = encode_geotiff(
                    geotiff_pixels(i),
                    pixel_scale=GEOTIFF_SCALE,
                    tiepoint_xy=(lon0, lat0),
                    epsg=4326,
                    tile=8 if i % 2 else None,
                    compression=comps[i % 4],
                    predictor=i % 3 == 0,
                    rows_per_strip=6,
                    bigtiff=i % 5 == 0,
                )
                ids.append(f"r{i}")
                blobs.append(blob)
            yield pd.DataFrame({"raster_id": ids, "bytes": blobs})

    if partitions is None:
        partitions = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    rng = spark.range(0, n, 1, partitions)
    return rng.mapInPandas(gen, schema)
