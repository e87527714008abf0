"""Structural breakdown of the scale job's wall time at one level.

Runs the exact scale_job pipeline once warm + once timed under the
given master, then reads the Spark REST API for per-stage submission /
completion times. The gaps between stages (and before the first stage)
are DRIVER-SERIAL time — planning, broadcast build, stage commit — the
Amdahl component that caps pair efficiency when the parallel section is
only ~10 s. Degraded host windows distort task *durations* but not the
structural split, so this is safe to run any time.

Usage: python tools/profile_scale_job.py [master] [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[4,4,5120]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

    from pyspark.sql import functions as F

    from bench import _bench_images_path
    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.io.fixtures import nation_squares
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side
    from geomesa_sql_spark.ops import image_stats
    from geomesa_sql_spark.tiles import assign_tiles

    split_mb = int(os.environ.get("SPARK_GRAFT_MAX_SPLIT_MB", "32"))
    spark = get_spark(
        "profile_scale", master=master,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": str(split_mb * 1024 * 1024),
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    job().count()  # warm
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return json.loads(r.read())

    seen = {s["stageId"] for s in stages()}
    t0 = time.time()
    job().count()
    wall = time.time() - t0
    rows = []
    for s in stages():
        if s["stageId"] in seen or s["status"] not in ("COMPLETE", "ACTIVE"):
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "submit": s.get("submissionTime"),
            "launch": s.get("firstTaskLaunchedTime"),
            "done": s.get("completionTime"),
            "task_time_s": round(s.get("executorRunTime", 0) / 1000.0, 2),
        })
        _ = sub
    # order by submission
    import datetime as dt

    def ts(x):
        return (
            dt.datetime.strptime(x.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()
            if x else None
        )

    rows.sort(key=lambda r: ts(r["submit"]) or 0)
    print(f"wall={wall:.2f}s  master={master}  n={n}")
    prev_done = None
    stage_span = 0.0
    gap_total = 0.0
    for r in rows:
        s, l, d = ts(r["submit"]), ts(r["launch"]), ts(r["done"])
        gap = (s - prev_done) if prev_done and s else None
        if gap is not None and gap > 0:
            gap_total += gap
        if s and d:
            stage_span += d - s
        launch_lag = (l - s) if (l and s) else None
        print(
            f"  stage {r['stage']:>3} tasks={r['tasks']:>3} "
            f"span={(d - s) if s and d else -1:6.2f}s "
            f"launch_lag={launch_lag if launch_lag is not None else -1:5.2f}s "
            f"gap_before={gap if gap is not None else 0:5.2f}s "
            f"task_time={r['task_time_s']:8.2f}s  {r['name']}"
        )
        prev_done = d or prev_done
    first_sub = ts(rows[0]["submit"]) if rows else None
    pre = (first_sub - t0) if first_sub else None
    post = (t0 + wall - ts(rows[-1]["done"])) if rows and ts(rows[-1]["done"]) else None
    pre = -1.0 if pre is None else pre
    post = -1.0 if post is None else post
    print(
        f"  pre-first-stage={pre:.2f}s inter-stage-gaps={gap_total:.2f}s "
        f"post-last-stage={post:.2f}s stage-span-sum={stage_span:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
