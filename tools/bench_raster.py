"""Raster-path benchmark → BENCH/RASTER.md + one JSON line.

Separate from bench.py on purpose: bench.py's content hash keys the
scaling-evidence state (tools/bench_scaling.py), so the raster numbers
live in their own artifact. Three measurements over synthesized
GeoTIFF payloads (io/fixtures-style closed-form content, cached as
parquet under /tmp/spark_graft_bench/):

- raster_info_catalog: header-only IFD/GeoKey pass (the 100 TB
  catalog-prune shape — no decompression)
- geotiff_decode_stats: full band decode (deflate, tiled)
- render_tiles: vector→raster render of N points into GeoTIFF count
  grids (two shuffles: pixel combine + tile assembly)

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_RASTERS (default
40_000), SPARK_GRAFT_RENDER_POINTS (default 5_000_000). Refuses to
REWRITE BENCH/RASTER.md below 0.5 host calibration (numbers print
regardless, stamped with the probe).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CACHE = Path("/tmp/spark_graft_bench")


def _fixture(spark, n: int) -> str:
    """n GeoTIFF payloads (64×64 uint16, tiled 32, deflate), cached as
    parquet with an explicit ≥64-file layout (the r4 executor-scaling
    lesson: fixture partitioning must not depend on who wrote it)."""
    path = CACHE / f"rasters_{n}_v1.parquet"
    if path.exists():
        return str(path)
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("raster_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def gen(batches):
        from geomesa_sql_spark.io.tiff import encode_geotiff

        x = np.arange(64)[None, :]
        y = np.arange(64)[:, None]
        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["id"].to_numpy(np.int64).tolist():
                px = ((i * 31 + x * 7 + y * 13) % 4096).astype(np.uint16)
                lon0 = -170.0 + (i * 37) % 320
                lat0 = -75.0 + (i * 53) % 160
                blobs.append(
                    encode_geotiff(px, pixel_scale=(0.01, 0.01),
                                   tiepoint_xy=(lon0, lat0), epsg=4326,
                                   tile=32, compression="deflate"))
                ids.append(f"r{i}")
            yield pd.DataFrame({"raster_id": ids, "bytes": blobs})

    df = spark.range(0, n, 1, 64).mapInPandas(gen, schema)
    df.repartition(64).write.mode("overwrite").parquet(str(path))
    return str(path)


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rasters = int(os.environ.get("SPARK_GRAFT_RASTERS", "40000"))
    n_points = int(os.environ.get("SPARK_GRAFT_RENDER_POINTS", "5000000"))
    from bench import host_calibration

    cal = host_calibration(min(cpus, 32))
    print(f"host calibration: {cal}", file=sys.stderr)

    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.ops import (
        raster_band_stats,
        raster_info,
        raster_tiles,
        render_tiles,
    )

    spark = get_spark("bench-raster", master=f"local[{cpus}]")
    src = spark.read.parquet(_fixture(spark, n_rasters))

    def timed(fn, warm: int = 1, runs: int = 2) -> float:
        for _ in range(warm):
            fn()
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    results: dict[str, dict] = {}

    sec = timed(lambda: raster_info(src).selectExpr(
        "count(*) c", "sum(pages) p", "min(minlon) ml").collect())
    results["raster_info_catalog"] = {
        "sec": sec, "rows": n_rasters,
        "rows_per_sec": round(n_rasters / sec, 1)}

    sec = timed(lambda: raster_band_stats(src).selectExpr(
        "count(*) c", "sum(px_sum) s").collect())
    results["geotiff_decode_stats"] = {
        "sec": sec, "rows": n_rasters,
        "rows_per_sec": round(n_rasters / sec, 1)}

    sec = timed(lambda: raster_tiles(raster_info(src), zoom=6).selectExpr(
        "count(*) c").collect())
    results["raster_tiles_fanout"] = {
        "sec": sec, "rows": n_rasters,
        "rows_per_sec": round(n_rasters / sec, 1)}

    pts = spark.range(0, n_points, 1, cpus * 2).selectExpr(
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat")
    sec = timed(
        lambda: render_tiles(pts, zoom=6, tile_px=16).selectExpr(
            "count(*) c", "sum(n_points) p").collect(),
        warm=1, runs=2)
    results["render_tiles"] = {
        "sec": sec, "rows": n_points,
        "rows_per_sec": round(n_points / sec, 1)}

    out = {
        "metric": "raster-path throughput",
        "cpus": cpus,
        "host": cal,
        "queries": results,
    }
    print(json.dumps(out))

    if cal["parallel_efficiency"] >= 0.5 or os.environ.get(
        "SPARK_GRAFT_FORCE_BASELINE"
    ):
        md = [
            "# Raster-path benchmark (tools/bench_raster.py)",
            "",
            f"local[{cpus}], {n_rasters} GeoTIFFs (64×64 uint16, tiled,",
            f"deflate), {n_points} render points. Host calibration at "
            f"capture: {cal}.",
            "",
            "| query | sec (min of 2, warmed) | rows | rows/sec |",
            "|---|---|---|---|",
        ]
        for k, v in results.items():
            md.append(f"| {k} | {v['sec']} | {v['rows']} | {v['rows_per_sec']} |")
        md += [
            "",
            "Reading: the catalog pass (header-only) vs full decode gap is",
            "the row-group/bbox-prune argument made measurable; render_tiles",
            "is two integer-key shuffles (pixel combine, tile assembly) with",
            "payload bytes born in the final stage.",
            "",
            "```json",
            json.dumps(out),
            "```",
        ]
        (REPO / "BENCH" / "RASTER.md").write_text("\n".join(md) + "\n")
        print("wrote BENCH/RASTER.md", file=sys.stderr)
    else:
        print("host degraded: not rewriting BENCH/RASTER.md", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
