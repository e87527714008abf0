"""Capture .explain('formatted') plans for the r06-touched queries.

Usage: python tools/capture_plans_r06.py <outdir> [suffix]
Writes <outdir>/<name>_<suffix>.txt (suffix default 'before').

localCheckpoint is monkeypatched to identity so eager materialization
does not truncate the captured lineage (the plan files document the
full operator graph, which the checkpoints would otherwise hide).
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pandas as _pd  # noqa: F401

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.dataframe as _D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_D.DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore

from geomesa_sql_spark import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plans_r06", master="local[8]")

    import __spark_entry__ as entry

    from geomesa_sql_spark.io.fixtures import (
        cluster_points,
        nation_squares,
        orders_points,
    )
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side
    from geomesa_sql_spark.ops import lsh_near_dup_pairs
    from geomesa_sql_spark.ops.cluster import dbscan

    q = entry.queries()
    only = os.environ.get("SPARK_GRAFT_PLAN_ONLY")
    only = set(only.split(",")) if only else None

    def cap(name, df_thunk):
        if only is not None and name not in only:
            return
        df = df_thunk() if callable(df_thunk) else df_thunk
        p = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(p, "w") as f, redirect_stdout(f):
            df.explain("formatted")
        print(f"wrote {p}")

    cap("dbscan", q["dbscan"](spark, sf_dir))
    cap("st_dwithin", q["st_dwithin"](spark, sf_dir))
    cap("spatial_join_dwithin", q["spatial_join_dwithin"](spark, sf_dir))
    cap("near_dup_text", q["near_dup_text"](spark, sf_dir))

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    centers = nation_squares(spark, sf_dir).select("n_nationkey", "cx", "cy")
    cap(
        "spatial_join_sphere_500km",
        spatial_join(
            pts, centers, point_side("lon", "lat"), point_side("cx", "cy"),
            predicate="dwithin_sphere", distance=500_000.0, broadcast=True,
        ),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 10_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzz"))
    )
    cap(
        "minhash_near_dup",
        lsh_near_dup_pairs(
            docs.unionByName(dup), "text", "doc_id", jaccard_threshold=0.6
        ),
    )
    cpts = cluster_points(spark, sf_dir)
    cap("dbscan_planar_bare", dbscan(cpts, "o_orderkey", "x", "y", eps=0.5, min_pts=5))
    cap(
        "dbscan_sphere_60km",
        dbscan(cpts, "o_orderkey", "x", "y", eps=60_000.0, min_pts=5,
               metric="sphere"),
    )

    # big_selfjoin shape: dwithin point x point through the repartition
    # path (the planar expand cover is on the left side)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    pts2 = spark.range(10_000).selectExpr(
        "id",
        "cast(pmod(hash(id, 1), 3600000) as double) / 10000.0 - 180.0 as lon",
        "cast(pmod(hash(id, 2), 1800000) as double) / 10000.0 - 90.0 as lat",
    )
    other = pts2.selectExpr("id as id_b", "lon as lon_b", "lat as lat_b")
    cap(
        "big_selfjoin_2m",
        spatial_join(
            pts2, other, point_side("lon", "lat"), point_side("lon_b", "lat_b"),
            predicate="dwithin", distance=0.02, res=12, broadcast=False,
        ),
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    from geomesa_sql_spark.geom.model import box as _box
    from geomesa_sql_spark.geom.wkb import geom_to_wkb as _g2w
    from geomesa_sql_spark.ops import render_mvt_wkb

    @F.pandas_udf("binary")
    def _bx(lon: _pd.Series, lat: _pd.Series) -> _pd.Series:
        return _pd.Series(
            [
                _g2w(_box(a - 0.2, b - 0.2, a + 0.2, b + 0.2))
                for a, b in zip(lon, lat)
            ],
            dtype=object,
        )

    pts_b = orders_points(spark, sf_dir)
    wkb_src = pts_b.select(
        F.col("o_orderkey").alias("gid"),
        _bx(
            F.greatest(F.lit(-179.5), F.least(F.lit(179.5), F.col("lon"))),
            F.greatest(F.lit(-89.5), F.least(F.lit(89.5), F.col("lat"))),
        ).alias("geom"),
    )
    cap("mvt_render_wkb", render_mvt_wkb(wkb_src, zoom=6, id_col="gid"))

    # ---- keys added to the r06 surface mid-round ----
    from geomesa_sql_spark.join.knn import knn_join_cells
    from geomesa_sql_spark.ops import (
        geotag_images,
        hamming_clusters,
        phash_images,
    )
    from geomesa_sql_spark.tiles import assign_tiles

    knn_q = spark.range(10_000).select(
        F.col("id").alias("query_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0).alias("qx"),
        ((F.col("id") * 104729 % 1700) / 10.0 - 85.0).alias("qy"),
    )
    # checkpoint=False keeps the round plans symbolic (the loop's
    # per-round driver probes still run)
    cap(
        "knn_10k_queries",
        lambda: knn_join_cells(pts, knn_q, k=10, checkpoint=False),
    )

    img_path = os.environ.get(
        "SPARK_GRAFT_IMG", "/tmp/spark_graft_bench/images_n600000_s8_p64"
    )
    if os.path.exists(f"{img_path}/_SUCCESS"):
        imgs = spark.read.parquet(img_path)
        sigs = (
            phash_images(imgs)
            .filter(F.col("ahash").isNotNull())
            .withColumn("iid", F.substring("image_id", 2, 12).cast("long"))
        )
        cap(
            "image_dedup_clusters",
            lambda: hamming_clusters(sigs, "ahash", "iid", max_hamming=2),
        )
        cap("exif_geotag", lambda: geotag_images(imgs))
        polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
        from geomesa_sql_spark.join.spatial import wkb_side

        def _headline():
            hp = imgs.select("image_id", "lon", "lat")
            joined = spatial_join(
                hp, polys, point_side("lon", "lat"), wkb_side("poly"),
                predicate="intersects", res=6, broadcast=True,
            )
            return (
                assign_tiles(joined, zoom=8)
                .groupBy("n_nationkey", "tile_x", "tile_y")
                .count()
            )

        cap("headline_spatial_join_tiles", _headline)
        cap(
            "spatial_join_repartition_salted",
            lambda: spatial_join(
                imgs.select("image_id", "lon", "lat"), polys,
                point_side("lon", "lat"), wkb_side("poly"),
                predicate="intersects", res=6, broadcast=False, salt=8,
                hot_cell_threshold=50_000,
            ),
        )


if __name__ == "__main__":
    main()
