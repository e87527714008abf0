"""Benchmark harness — prints ONE JSON line with per-query latencies.

Headline metric (BASELINE.json): spatial-join + tile-assignment
throughput over the derived point set, plus per-query latency for a
representative slice of the reference-suite re-expressions.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Scaling-efficiency evidence (N vs 4N executors per the north rule,
stood in by local[8] vs local[32] per driver instruction) is produced
by tools/bench_scaling.py, which shells out to this file at two
parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.io.fixtures import nation_squares, orders_points
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side
    from geomesa_sql_spark.tiles import assign_tiles

    spark = get_spark("bench", master=f"local[{cpus}]")

    def headline():
        """Flagship pipeline: cell encode → spatial join → refine → tiles."""
        pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
        polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
        joined = spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=True,
        )
        return (
            assign_tiles(joined, zoom=8)
            .groupBy("n_nationkey", "tile_x", "tile_y")
            .count()
        )

    all_q = entrymod.queries()
    bench_queries = [
        "agg_group",
        "join_equi",
        "window_topn",
        "events_hourly",
        "st_within_pentagon",
        "st_dwithin",
        "spatial_join_pairs",
        "spatial_join_dwithin",
        "knn",
        "tile_assign",
        "dedup_exact",
        "text_quality",
        "ann_topk",
        "minhash_near_dup",
        "image_stats",
    ]

    # warm the JVM + parquet footers with a trivial action
    orders_points(spark, sf_dir).count()

    results: dict[str, float] = {}
    t0 = time.time()
    n_input = orders_points(spark, sf_dir).count()
    h0 = time.time()
    headline().count()
    headline_sec = time.time() - h0
    results["headline_spatial_join_tiles"] = round(headline_sec, 3)

    for name in bench_queries:
        q0 = time.time()
        all_q[name](spark, sf_dir).count()
        results[name] = round(time.time() - q0, 3)

    total = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "spatial-join+tile-assignment latency (headline) + per-query latency",
                "value": round(headline_sec, 3),
                "unit": "sec",
                "queries": results,
                "sf": sf_dir,
                "cpus": cpus,
                "headline_rows_per_sec": round(n_input / headline_sec, 1),
                "total_sec": round(total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
