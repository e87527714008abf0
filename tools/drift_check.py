"""Calibrated confirmation run for the two drifting bench keys
(r4 verdict #6): `spatial_join_repartition_salted` (1.53× baseline in
BENCH_r04) and `image_stats_full` (1.44×), both of which regressed
r3→r4 while their code and bench definitions were byte-identical —
the post-pass probes showed the host collapsing mid-run, so the
hypothesis is window noise, not a code path.

Replicates bench.py's exact protocol for just these keys (same
fixture, same local[32] session, warm + 3-run minima) inside a
calibration-gated window, and records the window stamp before AND
after the timings so the artifact is self-describing. Writes
BENCH/DRIFT_r5.md.

Usage: python tools/drift_check.py   (env: SPARK_GRAFT_DRIFT_MIN_CAL,
default 0.7; SPARK_GRAFT_CALIB_ATTEMPTS/SLEEP bound the wait)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# r4 BASELINE.md local[32] minima for the two keys + headline control.
# big_join_10m rides along (r5): it read 1.59x in BENCH_r04 — the
# largest residual ratio of any key — with byte-identical code, the
# same window-noise hypothesis, and it costs ~10 s inside the window.
BASELINE = {
    "headline_spatial_join_tiles": 1.491,
    "image_stats_full": 0.685,
    "spatial_join_repartition_salted": 1.536,
    "big_join_10m": 1.244,
}


def main() -> None:
    min_cal = float(os.environ.get("SPARK_GRAFT_DRIFT_MIN_CAL", "0.7"))
    from bench import _bench_images_path, host_calibration, wait_for_calibration

    cal_start, trail = wait_for_calibration(32, min_eff=min_cal)

    from pyspark.sql import functions as F  # noqa: F401

    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.io.fixtures import nation_squares
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side
    from geomesa_sql_spark.ops import image_stats
    from geomesa_sql_spark.tiles import assign_tiles

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_IMAGES", "600000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("drift_check", master=f"local[{cpus}]")
    img_path = _bench_images_path(spark, n_images, size=8)
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")

    results: dict[str, float] = {}

    def timed(key: str, fn) -> None:
        fn()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        results[key] = round(best, 3)

    def headline():
        pts = spark.read.parquet(img_path).select("image_id", "lon", "lat")
        joined = spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=True,
        )
        (
            assign_tiles(joined, zoom=8)
            .groupBy("n_nationkey", "tile_x", "tile_y")
            .count()
            .count()
        )

    def stats_full():
        image_stats(spark.read.parquet(img_path)).count()

    def salted():
        big_pts = spark.read.parquet(img_path).select("image_id", "lon", "lat")
        spatial_join(
            big_pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=False, salt=8,
            hot_cell_threshold=50_000,
        ).count()

    # bench.py's big_join_10m, byte-for-byte (same cached fixture path)
    from bench import IMAGES_CACHE

    big_path = f"{IMAGES_CACHE}/points_n10000000"

    def big_join():
        pts = spark.read.parquet(big_path)
        joined = spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=True,
        )
        (
            assign_tiles(joined, zoom=8)
            .groupBy("n_nationkey", "tile_x", "tile_y")
            .count()
            .count()
        )

    timed("headline_spatial_join_tiles", headline)
    timed("image_stats_full", stats_full)
    timed("spatial_join_repartition_salted", salted)
    if os.path.exists(f"{big_path}/_SUCCESS"):
        timed("big_join_10m", big_join)
    else:
        del BASELINE["big_join_10m"]
    cal_end = host_calibration(32)
    spark.stop()

    ratios = {k: round(results[k] / BASELINE[k], 2) for k in results}
    payload = {
        "results_sec": results,
        "baseline_sec": BASELINE,
        "ratio_vs_baseline": ratios,
        "window": {
            "start_parallel_efficiency": cal_start["parallel_efficiency"],
            "end_parallel_efficiency": cal_end["parallel_efficiency"],
            "min_cal_requested": min_cal,
            "attempts": len(trail),
        },
        "n_images": n_images,
        "cpus": cpus,
    }
    md = REPO / "BENCH" / "DRIFT_r5.md"
    md.write_text("\n".join([
        "# Calibrated drift confirmation (r4 verdict #6)",
        "",
        "`spatial_join_repartition_salted` and `image_stats_full`",
        "regressed r3→r4 with byte-identical code and bench",
        "definitions (verified: `git diff r3..r4 -- join/spatial.py`",
        "is empty and the bench blocks only re-indented), so the",
        "hypothesis was host-window noise. This artifact re-times",
        "exactly those keys with bench.py's protocol inside a",
        "calibration-gated window, stamped before and after.",
        "`big_join_10m` (1.59× in r4, the largest residual ratio,",
        "same unchanged-code situation) rides along as a third probe.",
        "",
        "| key | baseline (r4 local[32] min) | this run | ratio |",
        "|---|---|---|---|",
    ] + [
        f"| {k} | {BASELINE[k]} | {results[k]} | {ratios[k]}× |"
        for k in results
    ] + [
        "",
        f"Window: start calibration "
        f"{cal_start['parallel_efficiency']}, end "
        f"{cal_end['parallel_efficiency']} (requested ≥{min_cal}).",
        "",
        "```json",
        json.dumps(payload),
        "```",
        "",
    ]))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
