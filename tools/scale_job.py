"""The scaling-evidence job: the full image pipeline at a compute-bound
size, run via spark-submit at two parallelism levels by
tools/bench_scaling.py.

Pipeline (one job, no driver loops):
    read image table (bytes stay out of every shuffle)
      → decode + featurize (mean RGB / luma, Arrow-batched mapInPandas)
      → broadcast spatial hash join vs the polygon set (JVM cell
        encode, vectorized PIP refine)
      → Hilbert tile assignment at zoom 8
      → per-(polygon, tile) rollup: count + mean luma

Why a heavier job than bench.py's headline: scaling efficiency is only
measurable when compute dominates fixed overhead (task scheduling, AQE
stage commits, Python worker spin-up). At 600k rows the headline join
finishes in ~1 s of compute and local[32] measures overhead, not
scaling. This job decodes every image — the shape of a real 100 TB
pass — so a 4× core increase has actual work to parallelize.

Prints ONE JSON line: {"n": ..., "sec": ..., "rows_per_sec": ..., "cpus": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "1000000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # SPARK_GRAFT_MASTER overrides local[cpus] — used by bench_scaling's
    # executor mode to submit the same job under local-cluster[E,C,M]
    # (real separate executor JVMs: BlockManager shuffle fetches, torrent
    # broadcast over the network stack, one Python worker pool per
    # executor — the execution shape of a multi-node cluster).
    # cpus must still be set to the TOTAL core count so shuffle
    # partitions size correctly (get_spark falls back to it when the
    # master string is not local[...]).
    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"

    from pyspark.sql import functions as F

    from bench import _bench_images_path
    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.io.fixtures import nation_squares
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side
    from geomesa_sql_spark.ops import image_stats
    from geomesa_sql_spark.tiles import assign_tiles

    # Split sizing (r5): Spark's maxSplitBytes formula clamps to
    # totalBytes/defaultParallelism, so the ~320 MB fixture scans as
    # EXACTLY one task per core at every level (4 tasks at 4 cores, 16
    # at 16) — single-wave scheduling, where the wall time is the
    # SLOWEST task and the measurement is straggler luck, not scaling.
    # Worse, a cap between those sizes (e.g. 32 MB → 10 tasks at 4
    # cores) creates ceil-imbalance waves (4,4,2) costing +25% at the
    # N level only, which would fake the N→4N ratio. 8 MB caps below
    # the ~5 MB per-file size, pinning one task per file: 64 tasks at
    # BOTH levels (16 waves at 4 cores, 4 waves at 16), so both levels
    # get straggler smoothing and neither is handicapped — the same
    # 2-4-tasks-per-core rule a production job uses. Verified A/B at
    # the 1-exec level: 8 MB ≈ 128 MB wall (within noise), 32 MB +25%.
    split_mb = int(os.environ.get("SPARK_GRAFT_MAX_SPLIT_MB", "8"))
    spark = get_spark(
        "scale_job", master=master,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(split_mb * 1024 * 1024)},
    )
    # 64×64 all-PNG: ~235 µs of zlib+unfilter decode per image, so the
    # job is CPU-bound (the regime where scaling is measurable), while
    # the synthetic gradient compresses to ~1.2 KB stored per image
    img_path = _bench_images_path(spark, n, size=64, fmt="png")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")

    def job():
        imgs = spark.read.parquet(img_path)
        feats = image_stats(imgs, carry=("lon", "lat"))
        joined = spatial_join(
            feats, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=True,
        )
        return (
            assign_tiles(joined, zoom=8)
            .groupBy("n_nationkey", "tile_id")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("mean_r").alias("avg_r"))
        )

    job().count()  # warm: codegen, broadcast, Python workers
    runs = []
    for _ in range(3):
        t0 = time.time()
        job().count()
        runs.append(time.time() - t0)
    # min, not median: host-level noise in this sandbox only ever slows
    # a run down, so the fastest observation is the closest to the
    # machine's true capability at each parallelism level
    sec = min(runs)
    print(json.dumps({
        "n": n, "sec": round(sec, 2), "runs": [round(r, 2) for r in runs],
        "median_sec": round(statistics.median(runs), 2),
        "rows_per_sec": round(n / sec, 1), "cpus": cpus, "master": master,
    }))


if __name__ == "__main__":
    main()
