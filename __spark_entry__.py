"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator family from SURVEY.md §2,
re-expressed Spark-first through ``geomesa_sql_spark``; the matching
``oracle_sql()`` entry is the same computation in DuckDB SQL over the
same parquet views. Spatial inputs derive from the driver tables with
pure arithmetic (geomesa_sql_spark.io.fixtures) so even spatial joins,
kNN and tiling have exact relational oracles — the differential-testing
model of the reference (GeoMesaCalciteTestUtils.scala:34-39: optimized
path vs 'scannable'/CSV oracle).

Float discipline (so value-hashes match bit-for-bit):
- money sums go through DECIMAL(18,2) before SUM, cast to DOUBLE after;
- derived lon/lat use CAST(int AS DOUBLE)/100.0 (identical IEEE ops);
- timestamps are emitted as formatted strings;
- ranks/top-k order by (metric, unique key) in both engines.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from geomesa_sql_spark.io.fixtures import (  # noqa: E402
    nation_squares,
    nation_squares_sql,
    orders_points,
    orders_points_sql,
    supplier_points,
    supplier_points_sql,
)

RECT = "POLYGON ((-10.005 -10.005, 50.005 -10.005, 50.005 40.005, -10.005 40.005, -10.005 -10.005))"
PENTA = "POLYGON ((-40.0037 -20.0013, 30.0041 -45.0029, 80.0017 10.0023, 20.0031 60.0019, -55.0043 25.0037))"
PENTA_VERTS = [
    (-40.0037, -20.0013),
    (30.0041, -45.0029),
    (80.0017, 10.0023),
    (20.0031, 60.0019),
    (-55.0043, 25.0037),
]
KNN_QUERIES = [(1, 0.0, 0.0), (2, 100.0, 50.0), (3, -120.0, -30.0)]
MONEY = "CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _penta_halfplane_sql() -> str:
    conds = []
    for (ax, ay), (bx, by) in zip(PENTA_VERTS, PENTA_VERTS[1:] + PENTA_VERTS[:1]):
        conds.append(f"(({bx} - {ax}) * (lat - {ay}) - ({by} - {ay}) * (lon - {ax})) >= 0")
    return " AND ".join(conds)


# --------------------------------------------------------------- relational


def q_filter_range_like(spark, sf_dir):
    """P2/P3 parity: conjunctive pushdown — range + equality + LIKE + IN."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 30)
            & (F.col("l_quantity") <= 40)
            & (F.col("l_returnflag") == "R")
            & F.col("l_linestatus").isin("F", "O")
            & F.col("l_shipdate").cast("string").like("1996%")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


def q_project_prune(spark, sf_dir):
    """P1 parity: bare-column projection (incl. computed stays above scan)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice") > 100000.0).alias("is_big"),
    )


def q_agg_group(spark, sf_dir):
    """A1/A4 parity: grouped aggregation (TPC-H Q1 shape) over ROLLUP —
    one query covers both §2.4 rows (plain grouped agg = the finest
    grouping set; Calcite's inherited ROLLUP surface = the coarser
    sets), freeing a driver slot for merge_readback (VERDICT r2 #5)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min(F.col("l_shipdate").cast("date")).cast("string").alias("min_ship"),
            F.max(F.col("l_shipdate").cast("date")).cast("string").alias("max_ship"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("status"),
            "sum_qty", "cnt", "sum_price", "min_ship", "max_ship",
        )
    )


def q_agg_global(spark, sf_dir):
    """A1 parity: global COUNT/MIN/MAX (+ COUNT DISTINCT, inherited A4)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


def q_distinct_enum(spark, sf_dir):
    """A1 enumeration parity: GROUP BY without agg ≡ SELECT DISTINCT."""
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()


def q_merge_readback(spark, sf_dir):
    """MERGE INTO under the driver's hash gate (reference surface
    ModificationTest.scala:36-175, previously pytest-only — VERDICT r2
    missing #3): create nation as a real Iceberg v2 table in /tmp
    (r4: io/iceberg_meta.py — field-id-annotated data files, Avro
    manifests), MERGE a deterministic source (lowercase the names of
    keys < 10, insert keys 100-104), return the id-resolved read-back.
    So the gate now exercises Iceberg create + MERGE snapshot commit +
    manifest-planned read. Re-runnable: the dir is recreated per call."""
    import os
    import shutil
    import tempfile

    from geomesa_sql_spark.engine import Engine

    base = _t(spark, sf_dir, "nation")
    path = os.path.join(
        tempfile.gettempdir(),
        # pid suffix: concurrent gate/bench processes over the same
        # scale factor must not race on rmtree/create (review r3)
        f"gsj_merge_gate_{os.path.basename(str(sf_dir).rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(path, ignore_errors=True)
    eng = Engine(spark, fid_col="n_nationkey")
    eng.create_table("merge_gate_t", path, base, format="iceberg")
    upd = base.filter("n_nationkey < 10").withColumn("n_name", F.lower("n_name"))
    ins = spark.range(100, 105).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("new_"), F.col("id").cast("string")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    eng.merge("merge_gate_t", upd.unionByName(ins), on="n_nationkey")
    return eng.df("merge_gate_t").select("n_nationkey", "n_name", "n_regionkey")


def q_topk(spark, sf_dir):
    """L1+L2 parity in one tagged slot (merged r3 to free a slot for
    events_streamed): ORDER BY + LIMIT top-k → TakeOrderedAndProject
    (tag='price_topk') and LIMIT/OFFSET pushdown (offset client-side
    in the reference; tag='key_offset')."""
    o = _t(spark, sf_dir, "orders")
    top = (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .select(
            F.lit("price_topk").alias("tag"),
            "o_orderkey",
            "o_totalprice",
            F.lit(None).cast("string").alias("o_orderstatus"),
        )
        .limit(10)
    )
    off = (
        o.orderBy("o_orderkey")
        .select(
            F.lit("key_offset").alias("tag"),
            "o_orderkey",
            F.lit(None).cast("double").alias("o_totalprice"),
            "o_orderstatus",
        )
        .offset(5)
        .limit(10)
    )
    return top.unionByName(off)


def q_fid_in(spark, sf_dir):
    """P3 parity: __FID__ = literal / IN (...) → ID filter fast path."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin(1, 7, 32, 100001, 999999999))
        .select("o_orderkey", "o_custkey")
    )


def q_join_equi(spark, sf_dir):
    """J3/J4/J5 parity: indexed equijoin chain + aggregation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
        )
    )


def q_join_theta_computed(spark, sf_dir):
    """J5 parity: join on computed keys (reference: EnumerableCalc + hash join)."""
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    return (
        o.join(F.broadcast(s), (o.o_orderkey % 100) == (s.s_suppkey % 100))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_lookup_join(spark, sf_dir):
    """J3/J4 parity: index-lookup equijoin — small filtered left side's
    keys pushed into the right scan as an IN filter (parquet row-group
    pruning), then hash join + residual re-check."""
    from geomesa_sql_spark.join import index_lookup_join

    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500.0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders")
    return index_lookup_join(
        c, o, ("c_custkey", "o_custkey"),
        residual=F.col("o_totalprice") > 100000.0,
    ).select("c_custkey", "o_orderkey", "o_totalprice")


def q_join_semi_anti(spark, sf_dir):
    """Inherited semi + anti joins, tagged and unioned (one contract
    slot covers both J5 shapes): customers having orders > 300k
    (tag='semi') and customers with no orders at all (tag='anti')."""
    c = _t(spark, sf_dir, "customer")
    o_big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    o = _t(spark, sf_dir, "orders")
    semi = (
        c.join(o_big, c.c_custkey == o_big.o_custkey, "left_semi")
        .select("c_custkey", F.lit("semi").alias("tag"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", F.lit("anti").alias("tag"))
    )
    return semi.unionByName(anti)


# the dbscan gate's geodesic eps: shared by q_dbscan and _dbscan_sql
# so the engine and the oracle can never desync. Chosen for threshold
# margin (nearest pair distance to eps: 24.7 m at sf0.01, 91 m at
# sf0.001) — retune in ONE place if the fixture ever changes.
DBSCAN_SPHERE_EPS_M = 60_000.0


def q_dbscan(spark, sf_dir):
    """Distributed DBSCAN over the deterministic clustered-points
    fixture (30 dense blobs + uniform scatter derived from orders by
    pure arithmetic — io/fixtures.py CLUSTER_X/Y_SQL, same expression
    text the DuckDB oracle evaluates). Partition-local clustering with
    eps-halo replication + label-level merge (ops/cluster.py); labels
    are the min core id, border ties break to the MIN core-neighbor
    label, so the output is fully deterministic and oracle-hashable.

    Two legs, union-tagged: 'planar' (Cartesian eps=0.5) and 'sphere'
    (the same x/y read as lon/lat degrees, eps=60 km of great-circle
    distance via the 3-D chordal embedding — metric='sphere'). The
    60 km eps was chosen so the nearest pairwise distance to the
    threshold is 24.7 m at sf0.01 (91 m at sf0.001) — ten orders of
    magnitude above JVM-vs-DuckDB trig ulp noise, so the hash gate
    cannot flip on a boundary pair."""
    from geomesa_sql_spark.io.fixtures import cluster_points
    from geomesa_sql_spark.ops.cluster import dbscan

    pts = cluster_points(spark, sf_dir)
    planar = dbscan(
        pts, "o_orderkey", "x", "y", eps=0.5, min_pts=5
    ).withColumn("leg", F.lit("planar"))
    sphere = dbscan(
        pts, "o_orderkey", "x", "y", eps=DBSCAN_SPHERE_EPS_M, min_pts=5,
        metric="sphere",
    ).withColumn("leg", F.lit("sphere"))
    return planar.unionByName(sphere)


def q_set_ops(spark, sf_dir):
    """Inherited set ops: custkeys with orders ∩ big-balance custkeys."""
    with_orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    big_bal = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return with_orders.intersect(big_bal)


def q_window_topn(spark, sf_dir):
    """Inherited window functions: top-2 orders per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_json_extract(spark, sf_dir):
    """Semi-structured column: JSON field extraction + rollup (Spark
    get_json_object ≡ DuckDB json_extract_string)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
        )
    )


def q_filter_null_forms(spark, sf_dir):
    """P3 parity: IS NULL / IS NOT NULL pushdown forms over a derived
    nullable column (driver tables carry no physical nulls)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("prio_null", F.nullif("o_orderpriority", F.lit("1-URGENT")))
        .filter(F.col("prio_null").isNull() & F.col("o_orderstatus").isNotNull())
        .select("o_orderkey", "o_orderpriority")
    )


def q_events_hourly(spark, sf_dir):
    """Time-bucketed aggregation over the events table (UTC strings)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_events_streamed(spark, sf_dir):
    """§2.8 under the driver gate (r3): the same hourly aggregation as
    events_hourly computed through Structured Streaming — parquet
    directory source, watermarked 1-hour event-time windows, complete
    mode drained into a memory sink by the available-now trigger.
    Value sums ride DECIMAL(18,6) so micro-batch order cannot move a
    ulp (repo money-sum convention); the oracle is the plain batch
    GROUP BY, so the streamed ≡ batch law itself is hash-gated. At
    scale the memory sink becomes drain_merge_into (state in a
    snapshot table); the streaming plan is identical."""
    from geomesa_sql_spark.streaming.windowed import (
        run_available_now,
        stream_events,
        windowed_counts,
    )

    ev = stream_events(spark, f"{sf_dir}/events.parquet").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    agg = windowed_counts(ev, window="1 hour", watermark="2 hours")
    sink = run_available_now(agg, mode="complete")
    return sink.select(
        F.date_format("win.start", "yyyy-MM-dd HH").alias("hour"),
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------------ spatial


def q_st_within_shapes(spark, sf_dir):
    """Spatial filter pushdown, both kernels in one slot: rectangle →
    pure range predicates (tag='rect') and convex polygon →
    ray-casting PIP refine (tag='penta')."""
    from geomesa_sql_spark.plan import spatial_filter

    pts = orders_points(spark, sf_dir)
    rect = spatial_filter(pts, "intersects", RECT, x="lon", y="lat").select(
        "o_orderkey", F.lit("rect").alias("tag")
    )
    penta = spatial_filter(pts, "intersects", PENTA, x="lon", y="lat").select(
        "o_orderkey", F.lit("penta").alias("tag")
    )
    return rect.unionByName(penta)


def q_image_near_dup(spark, sf_dir):
    """Image near-duplicate pairs over the synthesized images table +
    20 planted byte-identical copies: 64-bit average-hash → pigeonhole
    band equi-join (EXACT, recall 1.0) → JVM bit_count verify. The
    DuckDB oracle recomputes every average hash from the closed-form
    fixture pixels (same CTEs as image_stats) and takes ALL pairs with
    hamming ≤ 6 by brute force — so the gate proves the band join
    misses nothing, planted or natural."""
    from geomesa_sql_spark.io.fixtures import images_table
    from geomesa_sql_spark.ops import near_dup_images

    imgs = images_table(spark, 500, size=16)
    dup = imgs.filter(
        F.substring("image_id", 2, 10).cast("long") % 25 == 0
    ).withColumn("image_id", F.concat(F.lit("d"), F.col("image_id")))
    out = near_dup_images(imgs.unionByName(dup), max_hamming=6)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_st_dwithin(spark, sf_dir):
    """ST_DWithin literal-distance filter (planar units, reference
    parity) UNION'd with the r5 geography leg: a dwithin_sphere
    spatial JOIN (metres on the mean sphere, geom/geodesic.py) of the
    full-globe orders points against the 25 nation centers — the
    oracle brute-forces the haversine relation over the cross product,
    so the per-row longitude-radius cell cover, antimeridian split
    covers, and the pure-Column haversine refine are all under the
    hash gate. Legs distinguished by k (-1 planar, nationkey sphere)."""
    from pyspark.sql import functions as F

    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side
    from geomesa_sql_spark.plan import spatial_filter

    pts = orders_points(spark, sf_dir)
    planar = spatial_filter(
        pts, "dwithin", "POINT (10.005 10.005)", x="lon", y="lat", distance=20.0
    ).select("o_orderkey", F.lit(-1).cast("long").alias("k"))
    pois = nation_squares(spark, sf_dir).select("n_nationkey", "cx", "cy")
    sphere = spatial_join(
        pts.select("o_orderkey", "lon", "lat"), pois,
        point_side("lon", "lat"), point_side("cx", "cy"),
        predicate="dwithin_sphere", distance=1_000_000.0, broadcast=True,
    ).select("o_orderkey", F.col("n_nationkey").cast("long").alias("k"))
    return planar.unionByName(sphere)


def q_st_filter_wkb_rows(spark, sf_dir):
    """Spatial filter over WKB geometry rows (not point columns): the
    reference's geometry-attribute predicate path. Oracle is exact
    because the fixture polygons are axis-aligned rectangles, where
    intersects ≡ envelope overlap."""
    from geomesa_sql_spark.plan import spatial_filter

    polys = nation_squares(spark, sf_dir)
    return spatial_filter(
        polys, "intersects", RECT, wkb="poly", cell_col=None
    ).select("n_nationkey")


def q_spatial_join_pairs(spark, sf_dir):
    """J2 parity: spatial join row output (point-in-polygon pairs),
    driven through the SQL-TEXT surface like the reference's own test
    queries (SpatialJoinTest.scala): Engine.sql routes the ST_Intersects
    JOIN to the optimized cell join (engine.py::_route_spatial_join),
    not a cartesian nested loop."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark)
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    eng.register_view("sjp_pts", pts)
    eng.register_view("sjp_polys", polys)
    return eng.sql(
        "SELECT p.o_orderkey, s.n_nationkey FROM sjp_pts p JOIN sjp_polys s "
        "ON ST_Intersects(ST_MakePoint(p.lon, p.lat), s.poly)"
    )


def q_spatial_join_agg(spark, sf_dir):
    """Smoke-query parity (build/smoke_test/queries.sql:1-10): spatial
    join + GROUP BY count — driven through the SQL-TEXT router since
    late round 2: Engine.sql plans the ON ST_Intersects join via the
    cell join and runs the aggregate tail as plain SQL on top, so the
    driver gate also covers `_route_spatial_join`'s GROUP BY path."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark)
    eng.register_view(
        "sja_pts", orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    )
    eng.register_view(
        "sja_polys", nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    )
    return eng.sql(
        "SELECT n_nationkey, count(*) AS n_points FROM sja_pts JOIN sja_polys "
        "ON ST_Intersects(ST_MakePoint(lon, lat), poly) GROUP BY n_nationkey"
    )


def q_spatial_join_dwithin(spark, sf_dir):
    """J2 DWithin join: orders points × supplier points within 5°."""
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    sup = supplier_points(spark, sf_dir).select("s_suppkey", "slon", "slat")
    return (
        spatial_join(
            pts, sup, point_side("lon", "lat"), point_side("slon", "slat"),
            predicate="dwithin", distance=5.0, res=5, broadcast=True,
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )


def q_spatial_join_dwithin_poly(spark, sf_dir):
    """J2 DWithin with a polygon side: distance from point to rectangle
    (oracle: closed-form point-to-axis-aligned-rect distance)."""
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    return (
        spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="dwithin", distance=3.0, res=6, broadcast=True,
        )
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )


def q_spatial_join_left(spark, sf_dir):
    """J2 LEFT join: every left point appears; non-matching rows
    null-padded (EnumerableSpatialJoinEnumerator.scala:88-90)."""
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side

    pts = (
        orders_points(spark, sf_dir)
        .filter(F.col("o_orderkey") <= 20000)
        .select("o_orderkey", "lon", "lat")
    )
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    return spatial_join(
        pts, polys, point_side("lon", "lat"), wkb_side("poly"),
        predicate="intersects", res=6, broadcast=True,
        how="left", left_key="o_orderkey",
    ).select("o_orderkey", "n_nationkey")


def q_spatial_join_buffered(spark, sf_dir):
    """Expression operand parity (EnumerableSpatialJoinRule.scala:89-115;
    SpatialJoinTest.scala:45-47 joins on ST_INTERSECTS(ST_Buffer(a.pt,
    2), b.geom)): the left operand here is a Column expression — the
    envelope of the ±2° buffered point, built by an ST_* expression, not
    a materialized column. The envelope (vs the round buffer) keeps the
    oracle exact: box ∩ axis-aligned square ≡ interval overlap with ±2
    slack.

    Scale note: this deliberately exercises the wkb-expression cover
    path on the left (parity demo). When the left is the 10^12-row
    point table, the hot plan for buffered-point joins is point_side +
    predicate='dwithin' (JVM cell encode with envelope expansion,
    join/spatial.py::_cells_for_side fast path), not a per-row cover."""
    from geomesa_sql_spark.functions import register_all
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import wkb_side

    register_all(spark)
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    buffered_env = F.expr(
        "ST_MakeEnvelope(lon - 2.0D, lat - 2.0D, lon + 2.0D, lat + 2.0D)"
    )
    return spatial_join(
        pts, polys, wkb_side(buffered_env), wkb_side("poly"),
        predicate="intersects", res=6, broadcast=True,
    ).select("o_orderkey", "n_nationkey")


def q_spatial_join_right(spark, sf_dir):
    """RIGHT spatial join (reference answers RIGHT/FULL via the
    enumerable fallback, SpatialJoinTest.scala:54-60; here the optimized
    INNER plan + anti-join null padding — join/spatial.py)."""
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side

    pts = (
        orders_points(spark, sf_dir)
        .filter(F.col("o_orderkey") <= 20000)
        .select("o_orderkey", "lon", "lat")
    )
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    return spatial_join(
        pts, polys, point_side("lon", "lat"), wkb_side("poly"),
        predicate="intersects", res=6, broadcast=True,
        how="right", right_key="n_nationkey",
    ).select("o_orderkey", "n_nationkey")


def q_knn(spark, sf_dir):
    """kNN (north-star operator): 10 nearest order-points per query.

    Uses the scale path — expanding-radius bbox pruning
    (join/knn.py::knn_join_adaptive), which at 10^12 rows touches a
    city instead of the world; the brute-force knn_join stays as its
    differential oracle (test_spatial_ops.py::
    test_knn_adaptive_matches_bruteforce) and this DuckDB oracle is the
    brute-force formulation."""
    from geomesa_sql_spark.join import knn_join_adaptive

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    return knn_join_adaptive(pts, KNN_QUERIES, k=10, x="lon", y="lat").select(
        "query_id", "o_orderkey", "rank"
    )


def q_tile_assign(spark, sf_dir):
    """Tile assignment (raster↔vector handoff), zoom 6, with rollup —
    r4: routed through the from-scratch MVT vector-tile codec
    (io/mvt.py, ops/vector_tiles.py): points are quantized to
    tile-local pixels, encoded as real Mapbox Vector Tile protobuf
    blobs (one per tile), then DECODED back; n_rows/spx/spy come from
    the decoded command stream, so the oracle's FLOOR-law replay gates
    tile assignment AND the protobuf/zigzag/varint round trip
    relationally."""
    from geomesa_sql_spark.ops import mvt_stats, render_mvt

    pts = orders_points(spark, sf_dir)
    return mvt_stats(render_mvt(pts, zoom=6, extent=4096))


def q_tile_pyramid(spark, sf_dir):
    """Raster-side pyramid (zooms 6→4) built INCREMENTALLY: ~2/3 of
    the points build the base pyramid, the rest arrive as an append
    delta whose (tiny) pyramid is merged additively per (zoom, tile) —
    tiles/assign.py merge_pyramids. The incremental result provably
    equals a full recompute, which is exactly what the oracle asserts:
    one flat SQL rollup per zoom over ALL rows. At 100 TB the delta
    path shuffles only the delta's tile footprint, never the base
    table."""
    from geomesa_sql_spark.tiles import (
        assign_tiles,
        build_pyramid,
        merge_pyramids,
        tile_stats,
    )

    pts = orders_points(spark, sf_dir)
    base = pts.filter(F.col("o_orderkey") % 3 != 0)
    delta = pts.filter(F.col("o_orderkey") % 3 == 0)

    def pyr(df):
        return build_pyramid(
            tile_stats(assign_tiles(df, zoom=6, with_hilbert=False)),
            zoom=6,
            min_zoom=4,
        )

    return merge_pyramids(pyr(base), pyr(delta))


# ------------------------------------------------------------- SQL surface
# The reference's user-facing surface is SQL with Calcite's fun=spatial
# operator table (jdbc/Driver.scala:51-56). functions.register_all
# exposes the same ST_* names to spark.sql; these queries drive the
# engine purely through SQL text, like a sqlline user would.


def _sql_points_view(spark, sf_dir) -> str:
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    orders_points(spark, sf_dir).createOrReplaceTempView("orders_pts")
    return "orders_pts"


def q_sql_st_intersects(spark, sf_dir):
    """SQL text → registered ST_* UDFs: polygon containment filter,
    through the engine's SQL-text spatial rewrite (SpatialFilterRule
    analog: sargable bbox conjunction injected ahead of the exact UDF
    residual — engine.py::_rewrite_spatial_predicates)."""
    from geomesa_sql_spark.engine import _rewrite_spatial_predicates

    v = _sql_points_view(spark, sf_dir)
    return spark.sql(_rewrite_spatial_predicates(
        f"""SELECT o_orderkey FROM {v}
            WHERE ST_Intersects(ST_MakePoint(lon, lat), ST_GeomFromText('{PENTA}'))"""
    ))


def q_sql_st_xy_dist(spark, sf_dir):
    """ST_X/ST_Y/ST_MakePoint WKB round-trip + ST_Distance + ST_DWithin
    in one SQL-surface query (merged from round-1's sql_st_xy and
    sql_st_dwithin — the driver records at most 50 contract queries, so
    redundant pairs are folded; distance rounded: np.hypot and
    sqrt(dx²+dy²) differ at ulp level)."""
    v = _sql_points_view(spark, sf_dir)
    return spark.sql(
        f"""SELECT o_orderkey,
                   ST_X(ST_MakePoint(lon, lat)) AS px,
                   ST_Y(ST_MakePoint(lon, lat)) AS py,
                   ROUND(ST_Distance(ST_MakePoint(lon, lat),
                                     ST_GeomFromText('POINT (10.005 10.005)')), 6) AS d_r,
                   ROUND(ST_DistanceSphere(ST_MakePoint(lon, lat),
                                     ST_GeomFromText('POINT (10.005 10.005)')), 3) AS d_sph_r
            FROM {v}
            WHERE ST_DWithin(ST_MakePoint(lon, lat),
                             ST_GeomFromText('POINT (10.005 10.005)'), 20.0)"""
    )


def q_st_simplify_hull(spark, sf_dir):
    """ST_Simplify (Douglas-Peucker) + ST_ConvexHull + ST_NumPoints over
    SQL-built WKT (surface extensions; Calcite's fun=spatial table has
    neither — semantics follow the PostGIS/JTS contract), plus the
    boolean overlay constructors (geom/overlay.py) against an
    hs-shifted twin of the nation square. Exact oracle: a 3-point
    zigzag per nation collapses to its endpoints iff the peak
    deviation (n_nationkey%5)/1000 ≤ tol 0.0025; the hull of the
    square's 4 corners + center is the square itself (area 4·hs²);
    shifting an axis-aligned square of side 2·hs by hs overlaps a
    hs × 2·hs band (∩ = 2·hs², ∪ = 6·hs², △ = 4·hs², all exact
    integers since hs ∈ {3..7}); a vertical blade through the center
    splits the square into exactly 2 pieces."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    nation_squares(spark, sf_dir).createOrReplaceTempView("nsq_sh")
    return spark.sql(
        """SELECT n_nationkey,
                  ST_NumPoints(ST_Simplify(ST_GeomFromText(
                      concat('LINESTRING (', cx - 1.0D, ' ', cy, ', ',
                             cx, ' ', cy + (n_nationkey % 5) / 1000.0D, ', ',
                             cx + 1.0D, ' ', cy, ')')), 0.0025)) AS simp_n,
                  ROUND(ST_Area(ST_ConvexHull(ST_GeomFromText(
                      concat('MULTIPOINT (', pminx, ' ', pminy, ', ',
                             pmaxx, ' ', pminy, ', ', pmaxx, ' ', pmaxy, ', ',
                             pminx, ' ', pmaxy, ', ', cx, ' ', cy, ')')))), 6)
                      AS hull_area,
                  ROUND(ST_Area(ST_Intersection(
                      poly, ST_Translate(poly, hs, 0.0D))), 6) AS inter_area,
                  ROUND(ST_Area(ST_Union(
                      poly, ST_Translate(poly, hs, 0.0D))), 6) AS union_area,
                  ROUND(ST_Area(ST_SymDifference(
                      poly, ST_Translate(poly, hs, 0.0D))), 6) AS symdiff_area,
                  ST_NumGeometries(ST_Split(poly, ST_GeomFromText(
                      concat('LINESTRING (', cx, ' ', pminy - 1.0D, ', ',
                             cx, ' ', pmaxy + 1.0D, ')')))) AS split_n
           FROM nsq_sh"""
    )


def q_sql_st_measures(spark, sf_dir):
    """ST_Area / ST_Centroid / ST_Transform(4326→3857) over WKB rows;
    oracle is closed-form for axis-aligned squares (area = (2·hs)²,
    centroid = center; a lat-lon rectangle maps to a mercator rectangle
    since x depends only on lon and y only on lat, so the transformed
    envelope corners are the per-corner spherical-mercator formulas —
    rounded to 4 decimals of a meter to absorb libm ulp differences).
    r4: ST_Buffer area + type under the gate — the dissolved buffer of a
    convex polygon has the exact closed form A + P·d + A_64 (kernel
    buffer_geom docstring), proving the single-shell dissolve, JTS
    BufferOp parity for measures (DataTypeTest.scala:83-85). Also r4:
    ST_Transform to UTM 18N of the in-zone-mapped square center — the
    geom/crs.py Krüger path vs a DuckDB exp/ln re-derivation of the
    same series (_utm18n_parts). Late r4: the closure/WKB-constructor
    batch under the gate too — ST_NPoints (5), ST_Perimeter (8·hs),
    ST_IsClosed/ST_IsRing of the exterior ring, ST_CoordDim,
    ST_MakePolygon(ring) area round-trip, ST_PointFromWKB round-trip
    X, and ST_LineFromWKB's NULL-on-type-mismatch contract."""
    from geomesa_sql_spark.functions import register_all

    register_all(spark)
    nation_squares(spark, sf_dir).createOrReplaceTempView("nsq_v")
    return spark.sql(
        """SELECT n_nationkey,
                  ST_Area(ST_GeomFromWKB(ST_AsBinary(poly))) AS area,
                  ROUND(ST_X(ST_Centroid(poly)), 6) AS cx_r,
                  ROUND(ST_Y(ST_Centroid(poly)), 6) AS cy_r,
                  ROUND(ST_XMin(ST_Transform(poly, 'EPSG:4326', 'EPSG:3857')), 4)
                      AS mminx_r,
                  ROUND(ST_YMax(ST_Transform(poly, 'EPSG:4326', 'EPSG:3857')), 4)
                      AS mmaxy_r,
                  ST_SRID(ST_SetSRID(poly, 4326)) AS srid_rt,
                  ST_IsValid(poly) AS is_valid,
                  ST_Dimension(poly) AS dim,
                  ROUND(ST_Area(ST_Buffer(poly, 0.5D)), 6) AS buf_area_r,
                  ST_GeometryType(ST_Buffer(poly, 0.5D)) AS buf_type,
                  ST_Relate(poly, ST_GeomFromText(
                      'POLYGON ((-60 -40, 40 -40, 40 40, -60 40, -60 -40))'
                  )) AS rel_m,
                  ROUND(ST_X(ST_Transform(
                      ST_Point(-78.0 + (cx + 170.0) * 6.0 / 340.0, cy * 0.98),
                      'EPSG:4326', 'EPSG:32618')), 1) AS utm_e_r,
                  ROUND(ST_Y(ST_Transform(
                      ST_Point(-78.0 + (cx + 170.0) * 6.0 / 340.0, cy * 0.98),
                      'EPSG:4326', 'EPSG:32618')), 1) AS utm_n_r,
                  ST_NPoints(poly) AS npts,
                  ROUND(ST_Perimeter(poly), 6) AS perim_r,
                  ST_IsClosed(ST_ExteriorRing(poly)) AS ring_closed,
                  ST_IsRing(ST_ExteriorRing(poly)) AS ring_is_ring,
                  ST_CoordDim(poly) AS coord_dim,
                  ROUND(ST_Area(ST_MakePolygon(ST_ExteriorRing(poly))), 6)
                      AS mkpoly_area_r,
                  ROUND(ST_X(ST_PointFromWKB(ST_AsBinary(ST_Centroid(poly)))), 6)
                      AS pfwkb_x_r,
                  (ST_LineFromWKB(ST_AsBinary(poly)) IS NULL) AS lfwkb_null,
                  ROUND(ST_Area(ST_Buffer(poly, -1.0D)), 6) AS ebuf_area_r
           FROM nsq_v"""
    )


# ------------------------------------------------------- pipeline operators


def q_dedup_exact(spark, sf_dir):
    """Exact dedup (hash-groupBy) of documents ∪ shifted copy."""
    from geomesa_sql_spark.ops import exact_dedup

    d = _t(spark, sf_dir, "documents")
    dup = d.withColumn("doc_id", F.col("doc_id") + 1000000)
    return exact_dedup(d.unionByName(dup), ["text"], "doc_id").select(
        "doc_id", "lang", "n_chars"
    )


def q_text_quality(spark, sf_dir):
    """Token counting + quality scoring (JVM Column expressions)."""
    from geomesa_sql_spark.ops import quality_score

    d = _t(spark, sf_dir, "documents")
    return quality_score(d).select(
        "doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "quality"
    )


def q_token_stats(spark, sf_dir):
    """Token counting both ways: whitespace + BPE-ish regex (JVM
    regexp_count ≡ DuckDB regexp_extract_all length)."""
    from geomesa_sql_spark.ops.text import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
    )


def q_doc_fingerprints(spark, sf_dir):
    """Rolling-hash CDC fingerprints. ORACLE-GATED since late round 2:
    DuckDB re-derives every boundary and hash bit-for-bit — the greedy
    (sequentially-dependent) boundary walk becomes a recursive CTE
    stepping to the minimal eligible cut (see _doc_fingerprints_sql).
    CDC prefix-edit stability is separately asserted in tests."""
    from geomesa_sql_spark.ops import doc_fingerprints

    return doc_fingerprints(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_seq_pack(spark, sf_dir):
    """Greedy sequence packing of documents into 64-token context
    windows, sharded by doc_id % 8 (ops/pack.py). The whitespace token
    count uses literally the oracle's SQL expression text; budget 64 <
    max doc length so the oversize-doc-alone rule is exercised. The
    DuckDB oracle replays the greedy walk as a recursive CTE stepping
    from bin boundary to bin boundary (same pattern as the CDC cut
    walk) and assigns docs to bins by prefix-sum range join."""
    from geomesa_sql_spark.ops.pack import pack_sequences

    d = _t(spark, sf_dir, "documents")
    out = pack_sequences(
        d,
        "doc_id",
        F.expr("length(text) - length(replace(text, ' ', '')) + 1"),
        budget=64,
        shard_col=F.expr("doc_id % 8"),
    )
    return out.select(F.col("id").alias("doc_id"), "shard", "bin", "off")


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 embedding."""
    from geomesa_sql_spark.ops import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    return cosine_topk(e, q, k=20).select(
        "vec_id", "rank", F.round("sim", 6).alias("sim_r")
    )


def q_ann_ivf(spark, sf_dir):
    """IVF ANN (coarse k-means quantizer → probe nprobe lists → exact
    rerank; recall vs brute force asserted in tests)."""
    from geomesa_sql_spark.ops.ann import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    return ivf_topk(e, q, k=10, n_lists=8, nprobe=3).select("q_id", "vec_id", "rank")


def q_embed_clusters(spark, sf_dir):
    """Semantic-dedup groups: near-dup pairs (exact cosine path; the
    LSH path's recall is pytest-gated) closed into connected
    components — (vec_id, cluster) for every vector, cluster = min
    vec_id of the component. The DuckDB oracle recomputes the exact
    pairs relationally and closes them with a label-pruned recursive
    CTE, so the gate checks the whole group structure, not just the
    pair list."""
    from geomesa_sql_spark.ops import embedding_clusters

    e = _t(spark, sf_dir, "embeddings")
    return embedding_clusters(e, threshold=0.45, exact=True)


# ------------------------------------------ non-SQL-expressible (rows-only)


def q_near_dup_text(spark, sf_dir):
    """Near-dup text pairs both ways over the same corpus: MinHash+LSH
    (the 10^12-row band-bucket path) ∪ exact n-gram Jaccard (its
    brute-force recall twin), tagged by method. ORACLE-GATED since
    round 2: DuckDB recomputes the exact 3-token-shingle Jaccard
    relationally (tokenize → distinct shingles → equality self-join)
    and expects the SAME pair set under both method tags — so the
    driver gate asserts LSH recall == 1.0 on this corpus, not merely
    twin parity. Deterministic (splitmix64-seeded hashing, fixed
    corpus); LSH recall ≥0.95 on adversarial corpora is separately
    asserted in tests/test_ops.py."""
    from geomesa_sql_spark.ops import lsh_near_dup_pairs, ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    mod = d.withColumn("doc_id", F.col("doc_id") + 1000000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" qqq"))
    )
    u = d.unionByName(mod)
    lsh = lsh_near_dup_pairs(u, "text", "doc_id", jaccard_threshold=0.6).select(
        F.lit("minhash_lsh").alias("method"), "id_a", "id_b"
    )
    exact = ngram_jaccard_pairs(u, "text", "doc_id", threshold=0.6).select(
        F.lit("ngram_exact").alias("method"), "id_a", "id_b"
    )
    return lsh.unionByName(exact)


def q_text_signals(spark, sf_dir):
    """Per-document signals: 64-bit SimHash + marker-word language ID.
    ORACLE-GATED since late round 2: DuckDB replays FNV-1a via
    list_reduce over token bytes, splitmix64 with 32-bit-split
    multiplies mod 2^64, and all 64 Charikar bit votes — bit-for-bit
    (see _text_signals_sql)."""
    from geomesa_sql_spark.ops import simhash64
    from geomesa_sql_spark.ops.text import lang_id

    d = _t(spark, sf_dir, "documents")
    sh = simhash64(d, "text", "doc_id")
    li = lang_id(d).select("doc_id", "lang_pred")
    return sh.join(li, "doc_id")


def q_ann_approx(spark, sf_dir):
    """Approximate ANN both ways, tagged by method: sign-LSH bucket join
    (bits sized so 2^6 buckets over ~500 vectors ≈ 8/bucket; at 10^12
    rows bits≈30) ∪ IVF (coarse quantizer, nprobe lists, exact rerank).

    ORACLE-GATED since round 3 (was the one rows-only query): the
    hyperplanes AND the IVF coarse centroids are data-independent
    splitmix64 constants (ops.ann.fixed_centroids), so DuckDB replays
    bucket assignment, multiprobe, list probing and the rerank ordering
    from embedded DOUBLE[] literals (_ann_approx_sql). K-means
    TRAINING (the default ivf_topk path) stays recall-gated in
    tests/test_ops.py, as does LSH recall on adversarial corpora."""
    from geomesa_sql_spark.ops.ann import (
        fixed_centroids,
        ivf_topk,
        lsh_bucket_ann,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    lsh = lsh_bucket_ann(e, q, k=10, bits=6, multiprobe=2).select(
        F.lit("sign_lsh").alias("method"), "q_id", "vec_id", "rank"
    )
    ivf = ivf_topk(
        e, q, k=10, n_lists=8, nprobe=3, centroids=fixed_centroids(64, 8)
    ).select(F.lit("ivf").alias("method"), "q_id", "vec_id", "rank")
    return lsh.unionByName(ivf)


def q_image_stats(spark, sf_dir):
    """Multimodal decode/feature-extract + 64-bit average-hash
    fingerprint over the synthesized images table (merged with round-1's
    separate phash query; both mapInPandas over Arrow batches).

    ORACLE-GATED since round 2: per-channel means are integer sums over
    the closed-form fixture pixels divided by 2^8 (exact in binary), the
    luma bucket is the same double expression in both engines, and the
    average hash compares integer luma block sums (ops/multimodal.py
    phash_images — order-independent integer arithmetic), so DuckDB
    recomputes every column bit-for-bit from range() cross-products."""
    from geomesa_sql_spark.io.fixtures import images_table
    from geomesa_sql_spark.ops import image_stats, phash_images

    imgs = images_table(spark, 500, size=16)
    return image_stats(imgs).join(phash_images(imgs), "image_id")


def q_resize(spark, sf_dir):
    """Multimodal resize/transcode template + the GeoTIFF raster-ingest
    edge of the raster→vector handoff, unioned under one gate.

    Leg 1 (kind='resize'): decode → nearest-neighbour resample → raw
    re-encode; oracle-gated via the px_sum payload checksum (fixture
    pixel (i·31 + x·7 + y·13 + c·97) mod 256 is closed-form —
    FIXTURES.md F0; io/fixtures.py:image_pixels).

    Leg 2 (kind='geotiff'): real GeoTIFF payloads (strip AND tiled ×
    none/lzw/deflate/packbits × predictor — io/fixtures.geotiff_table)
    through ops/raster.py: header-only georeferencing (raster_info →
    EPSG + lon/lat bbox), full band decode (raster_band_stats →
    px_sum), and the covered-tile fan-out (raster_tiles at zoom 6,
    JVM sequence/explode). DuckDB re-derives every column from the
    closed-form pixel/anchor laws — bbox from the tiepoint affine,
    tile range from the same FLOOR law the tile_hilbert oracle uses,
    n_tiles as the closed-form range product the explode must match.

    Leg 3 (kind='render'): the vector→raster back-edge — 2000
    closed-form points rendered into per-tile uint32 count grids
    written as REAL georeferenced GeoTIFF payloads (ops/raster.py
    render_tiles, zoom 4 × 8px tiles), then DECODED back
    (raster_checksum): px_sum carries the position-weighted band
    checksum Σ cnt·(py·8+px+1), n_tiles the decoded count total, and
    the bbox columns the georeferencing read back from the emitted
    file. DuckDB recomputes the same counts from the FLOOR pixel law
    and the bbox from the tile-envelope closed form — hash equality
    proves render → GeoTIFF encode → decode preserved every pixel and
    every geo tag."""
    from geomesa_sql_spark.io.fixtures import geotiff_table, images_table
    from geomesa_sql_spark.ops import (
        raster_band_stats,
        raster_checksum,
        raster_info,
        raster_tiles,
        render_tiles,
        resize_images,
    )

    null_geo = [
        F.lit(None).cast("int").alias("epsg"),
        F.lit(None).cast("double").alias("minlon_r"),
        F.lit(None).cast("double").alias("minlat_r"),
        F.lit(None).cast("double").alias("maxlon_r"),
        F.lit(None).cast("double").alias("maxlat_r"),
        F.lit(None).cast("long").alias("tx0"),
        F.lit(None).cast("long").alias("ty0"),
        F.lit(None).cast("long").alias("n_tiles"),
    ]
    rs = resize_images(images_table(spark, 300, size=16), out_size=8).select(
        F.col("image_id").alias("id"), F.lit("resize").alias("kind"),
        "w", "h", "px_sum", *null_geo,
    )
    g = geotiff_table(spark, 200)
    info = raster_info(g)
    st = raster_band_stats(g)
    tl = raster_tiles(info, zoom=6).groupBy("raster_id").agg(
        F.min("tile_x").alias("tx0"),
        F.min("tile_y").alias("ty0"),
        F.count(F.lit(1)).alias("n_tiles"),
    )
    gt = (
        info.join(st, "raster_id")
        .join(tl, "raster_id")
        .select(
            F.col("raster_id").alias("id"), F.lit("geotiff").alias("kind"),
            F.col("rw").alias("w"), F.col("rh").alias("h"),
            F.col("px_sum").cast("long").alias("px_sum"),
            "epsg",
            F.round("minlon", 6).alias("minlon_r"),
            F.round("minlat", 6).alias("minlat_r"),
            F.round("maxlon", 6).alias("maxlon_r"),
            F.round("maxlat", 6).alias("maxlat_r"),
            "tx0", "ty0", "n_tiles",
        )
    )
    pts = spark.range(0, 2000).selectExpr(
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat",
    )
    rend = raster_checksum(render_tiles(pts, zoom=4, tile_px=8)).select(
        F.concat(F.lit("t"), F.col("tile_x").cast("string"), F.lit("_"),
                 F.col("tile_y").cast("string")).alias("id"),
        F.lit("render").alias("kind"),
        F.lit(8).cast("int").alias("w"), F.lit(8).cast("int").alias("h"),
        F.col("checksum").alias("px_sum"),
        "epsg",
        F.round("minlon", 6).alias("minlon_r"),
        F.round("minlat", 6).alias("minlat_r"),
        F.round("maxlon", 6).alias("maxlon_r"),
        F.round("maxlat", 6).alias("maxlat_r"),
        F.col("tile_x").alias("tx0"), F.col("tile_y").alias("ty0"),
        F.col("n_sum").alias("n_tiles"),
    )
    return rs.unionByName(gt).unionByName(rend)


# S2 gate leg: a vector derived RATIONALLY from the row (no trig), so
# every step from xyz to the curve position is IEEE-exact in both
# engines — division/sqrt/floor are correctly rounded, and the Hilbert
# descent is integer. The c component is an odd numerator over 17, so
# the vector is never all-zero. Same text evaluated by Spark (F.expr)
# and DuckDB (oracle CTE).
S2_A_SQL = "lon / 180.0"
S2_B_SQL = "lat / 90.0"
S2_C_SQL = "CAST((o_orderkey % 19) * 2 - 17 AS DOUBLE) / 17.0"


def q_tile_hilbert(spark, sf_dir):
    """Hilbert tile ids. Oracle-gated since round 2: the xy2d rotate
    loop is unrolled into chained CTEs of integer CASE/bitwise SQL
    (_hilbert_xy2d_sql), so the curve itself is relationally verified.
    Late r4, the raster→vector back-edge under the same gate: ix/iy
    come from ``invert_tiles`` (hilbert_d2xy from the id ALONE) while
    the oracle emits the forward (x, y) it fed into xy2d — hash
    equality proves the inverse relationally; the tile lon/lat
    envelope (pure Column arithmetic) is gated against the oracle's
    closed forms, with per-tile closed-envelope containment of every
    member point asserted on the Spark side.

    r4 adds the S2 leg (cells/s2.py — the north rule's named H3/S2
    index): per point, a trig-free rational vector (S2_A/B/C_SQL) maps
    through cube-face selection, the quadratic ST projection and the
    30-level Hilbert descent to the canonical S2 leaf id; face and
    61-bit position are XOR-folded per tile. The oracle replays the
    WHOLE pipeline from the primitive 4×4 traversal tables
    (_s2_leaf_sql) — face CASE, uv ratios, sqrt ST, floor ij, 30
    unrolled descent stages — so the S2 curve itself is relationally
    verified on live data, the same standard the zoom-6 Hilbert gate
    set."""
    from geomesa_sql_spark.cells import s2 as s2mod
    from geomesa_sql_spark.tiles import assign_tiles, invert_tiles, tile_envelope

    @F.pandas_udf("long")
    def _s2leaf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
        # pd.isna guard per the r4n rule; the TPC-H fixture columns are
        # non-null so the gate never exercises it, but a NaN flowing
        # through would otherwise mint a valid-LOOKING garbage id
        bad = (pd.isna(a) | pd.isna(b) | pd.isna(c)).to_numpy()
        out = pd.Series(
            s2mod.xyz_to_leaf_id(
                a.fillna(0.0).to_numpy(np.float64),
                b.fillna(0.0).to_numpy(np.float64),
                c.fillna(1.0).to_numpy(np.float64),
            )
        ).astype("Int64")
        out[bad] = None
        return out

    pts = (
        orders_points(spark, sf_dir)
        .withColumn(
            "s2id", _s2leaf(F.expr(S2_A_SQL), F.expr(S2_B_SQL), F.expr(S2_C_SQL))
        )
        .withColumn("s2f", F.expr("shiftrightunsigned(s2id, 61)"))
        .withColumn("s2p", F.expr("s2id & 2305843009213693951"))
    )
    t = tile_envelope(assign_tiles(pts, zoom=6, with_hilbert=True), 6)
    agg = t.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(
            (F.col("lon") >= F.col("tminx")) & (F.col("lon") <= F.col("tmaxx"))
            & (F.col("lat") >= F.col("tminy")) & (F.col("lat") <= F.col("tmaxy"))
        ).alias("contained"),
        F.expr("bit_xor(s2f)").alias("s2fx"),
        F.expr("bit_xor(s2p)").alias("s2px"),
    )
    inv = tile_envelope(invert_tiles(agg, 6, out=("ix", "iy")), 6, x="ix", y="iy")
    return inv.select(
        "tile_id", "n_rows", "ix", "iy",
        F.round("tminx", 6).alias("tminx_r"),
        F.round("tminy", 6).alias("tminy_r"),
        F.round("tmaxx", 6).alias("tmaxx_r"),
        F.round("tmaxy", 6).alias("tmaxy_r"),
        "contained", "s2fx", "s2px",
    )


# ------------------------------------------------------------------- oracle


def _utm18n_parts() -> tuple[str, str, str]:
    """DuckDB-evaluable Krüger forward for UTM zone 18N, split into
    (staged_columns_sql, easting_expr, northing_expr). Hyperbolics go
    through exp/ln identities (DuckDB has no sinh/atanh); coefficients
    are generated from geom/crs.py so the oracle and the engine share
    one source — the implementation-parity gate convention the other
    derived fixtures use. Stage columns rely on lateral column aliases
    (supported by both DuckDB and the Spark parser). The nation-square
    centers map into the zone via shared arithmetic (lon_z/lat_z), so
    every row is well-conditioned; agreement with the numpy path
    measured at ~2e-9 m, gated after ROUND(..., 1)."""
    import math as _math

    from geomesa_sql_spark.geom.crs import _WGS84, _kruger_coeffs

    a, f = _WGS84
    rect_a, alpha, _, _ = _kruger_coeffs(f)
    k0a = repr(0.9996 * a * rect_a)
    es = repr(_math.sqrt(f * (2.0 - f)))
    stage = f"""
                     -78.0 + (cx + 170.0) * 6.0 / 340.0 AS lon_z,
                     cy * 0.98 AS lat_z,
                     radians(lat_z) AS u_phi,
                     radians(lon_z - (-75.0)) AS u_dl,
                     sin(u_phi) AS u_s,
                     0.5 * ln((1.0 + u_s) / (1.0 - u_s))
                       - {es} * 0.5 * ln((1.0 + {es} * u_s) / (1.0 - {es} * u_s)) AS u_q,
                     (exp(u_q) - exp(-u_q)) / 2.0 AS u_t,
                     atan2(u_t, cos(u_dl)) AS u_xip,
                     sin(u_dl) / sqrt(u_t * u_t + cos(u_dl) * cos(u_dl)) AS u_w,
                     ln(u_w + sqrt(u_w * u_w + 1.0)) AS u_etap"""
    series_n, series_e = "u_xip", "u_etap"
    for j, aj in enumerate(alpha, start=1):
        c, w = repr(float(aj)), repr(2.0 * j)
        series_n += (
            f" + {c}*sin({w}*u_xip)*((exp({w}*u_etap)+exp(-({w})*u_etap))/2.0)"
        )
        series_e += (
            f" + {c}*cos({w}*u_xip)*((exp({w}*u_etap)-exp(-({w})*u_etap))/2.0)"
        )
    return stage, f"(500000.0 + {k0a}*({series_e}))", f"({k0a}*({series_n}))"


def _oracles() -> dict[str, str]:
    opts = orders_points_sql()
    sup = supplier_points_sql()
    nsq = nation_squares_sql()
    utm_stage, utm_e, utm_n = _utm18n_parts()
    return {
        "filter_range_like": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem
            WHERE l_quantity BETWEEN 30 AND 40 AND l_returnflag = 'R'
              AND l_linestatus IN ('F','O')
              AND CAST(l_shipdate AS VARCHAR) LIKE '1996%'
        """,
        "project_prune": """
            SELECT o_orderkey, o_orderpriority, o_totalprice > 100000.0 AS is_big
            FROM orders
        """,
        "agg_group": """
            SELECT COALESCE(l_returnflag, '<all>') AS flag,
                   COALESCE(l_linestatus, '<all>') AS status,
                   SUM(l_quantity) AS sum_qty,
                   COUNT(*) AS cnt,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   CAST(MIN(CAST(l_shipdate AS DATE)) AS VARCHAR) AS min_ship,
                   CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR) AS max_ship
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "agg_global": """
            SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
                   MAX(o_orderkey) AS max_key,
                   COUNT(DISTINCT o_custkey) AS n_cust
            FROM orders
        """,
        "distinct_enum": "SELECT DISTINCT o_orderpriority FROM orders",
        "merge_readback": """
            SELECT n_nationkey,
                   CASE WHEN n_nationkey < 10 THEN lower(n_name)
                        ELSE n_name END AS n_name,
                   n_regionkey
            FROM nation
            UNION ALL
            SELECT CAST(100 + i AS INTEGER) AS n_nationkey,
                   'new_' || CAST(100 + i AS VARCHAR) AS n_name,
                   CAST((100 + i) % 5 AS INTEGER) AS n_regionkey
            FROM range(5) AS t(i)
        """,
        "topk": """
            (SELECT 'price_topk' AS tag, o_orderkey, o_totalprice,
                    CAST(NULL AS VARCHAR) AS o_orderstatus
             FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
            UNION ALL
            (SELECT 'key_offset', o_orderkey, CAST(NULL AS DOUBLE),
                    o_orderstatus
             FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5)
        """,
        "fid_in": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderkey IN (1, 7, 32, 100001, 999999999)
        """,
        "join_equi": """
            SELECT r_name, COUNT(*) AS n_cust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "join_theta_computed": """
            SELECT s_suppkey, COUNT(*) AS n_orders
            FROM orders JOIN supplier ON (o_orderkey % 100) = (s_suppkey % 100)
            GROUP BY s_suppkey
        """,
        "lookup_join": """
            SELECT c_custkey, o_orderkey, o_totalprice
            FROM customer JOIN orders ON c_custkey = o_custkey
            WHERE c_acctbal > 9500.0 AND o_totalprice > 100000.0
        """,
        "join_semi_anti": """
            SELECT c_custkey, 'semi' AS tag FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            UNION ALL
            SELECT c_custkey, 'anti' AS tag FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "dbscan": _dbscan_sql(),
        "set_ops": """
            SELECT o_custkey AS custkey FROM orders
            INTERSECT
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        """,
        "window_topn": """
            SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) WHERE rn <= 2
        """,
        "json_extract": """
            -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark yields BIGINT —
            -- the driver's value hash is type-sensitive (VERDICT r01 §wrong.1)
            SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            WHERE k >= 50 GROUP BY event_type
        """,
        "filter_null_forms": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE NULLIF(o_orderpriority, '1-URGENT') IS NULL
              AND o_orderstatus IS NOT NULL
        """,
        "events_hourly": """
            SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_streamed": """
            -- the BATCH aggregation: hash-equality against the streamed
            -- plan is the streamed-equals-batch law under the gate
            SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "st_within_shapes": f"""
            SELECT o_orderkey, 'rect' AS tag FROM ({opts})
            WHERE lon >= -10.005 AND lon <= 50.005 AND lat >= -10.005 AND lat <= 40.005
            UNION ALL
            SELECT o_orderkey, 'penta' AS tag FROM ({opts}) WHERE {_penta_halfplane_sql()}
        """,
        "image_near_dup": """
            WITH px AS (
                SELECT i, x, y,
                       (i*31 + x*7 + y*13) % 256 AS r,
                       (i*31 + x*7 + y*13 + 97) % 256 AS g,
                       (i*31 + x*7 + y*13 + 194) % 256 AS b
                FROM range(500) t(i), range(16) tx(x), range(16) ty(y)
            ), img AS (
                SELECT i, CAST(SUM(299*r + 587*g + 114*b) AS HUGEINT) AS stot
                FROM px GROUP BY i
            ), blk AS (
                SELECT i, y // 2 AS yb, x // 2 AS xb,
                       CAST(SUM(299*r + 587*g + 114*b) AS HUGEINT) AS bsum
                FROM px GROUP BY 1, 2, 3
            ), ah AS (
                SELECT b.i,
                       CAST(SUM(CASE WHEN b.bsum * 64 >= m.stot
                                THEN CAST(1 AS HUGEINT) << CAST(b.yb * 8 + b.xb AS INTEGER)
                                ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS a
                FROM blk b JOIN img m ON b.i = m.i GROUP BY 1
            ), sigs AS (
                SELECT '#' || CAST(i AS VARCHAR) AS id,
                       CAST(CASE WHEN a >= CAST('9223372036854775808' AS HUGEINT)
                                 THEN a - CAST('18446744073709551616' AS HUGEINT)
                                 ELSE a END AS BIGINT) AS sig
                FROM ah
                UNION ALL
                SELECT 'd#' || CAST(i AS VARCHAR),
                       CAST(CASE WHEN a >= CAST('9223372036854775808' AS HUGEINT)
                                 THEN a - CAST('18446744073709551616' AS HUGEINT)
                                 ELSE a END AS BIGINT)
                FROM ah WHERE i % 25 = 0
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
            FROM sigs a JOIN sigs b ON a.id < b.id
            WHERE bit_count(xor(a.sig, b.sig)) <= 6
        """,
        "st_dwithin": f"""
            SELECT o_orderkey, CAST(-1 AS BIGINT) AS k FROM ({opts})
            WHERE (lon - 10.005) * (lon - 10.005) + (lat - 10.005) * (lat - 10.005) <= 400.0
            UNION ALL
            -- geography leg: brute-force haversine relation over the
            -- full orders x nation-centers product — the EXACT
            -- operation-order replay of sphere_distance_cols (RADIANS
            -- per coordinate then subtract; h<=1 clamp) so threshold
            -- membership can't flip on an ulp (r5 review)
            SELECT p.o_orderkey, CAST(s.n_nationkey AS BIGINT) AS k
            FROM ({opts}) p, ({nsq}) s
            WHERE 2.0 * 6371008.771415059 * ASIN(SQRT(LEAST(1.0,
                      SIN((RADIANS(s.cy) - RADIANS(p.lat)) / 2.0)
                    * SIN((RADIANS(s.cy) - RADIANS(p.lat)) / 2.0)
                    + COS(RADIANS(p.lat)) * COS(RADIANS(s.cy))
                      * SIN((RADIANS(s.cx) - RADIANS(p.lon)) / 2.0)
                      * SIN((RADIANS(s.cx) - RADIANS(p.lon)) / 2.0)
                  ))) <= 1000000.0
        """,
        "st_filter_wkb_rows": f"""
            SELECT n_nationkey FROM ({nsq})
            WHERE pminx <= 50.005 AND pmaxx >= -10.005
              AND pminy <= 40.005 AND pmaxy >= -10.005
        """,
        "spatial_join_pairs": f"""
            SELECT o_orderkey, n_nationkey
            FROM ({opts}) p JOIN ({nsq}) s
              ON p.lon >= s.pminx AND p.lon <= s.pmaxx
             AND p.lat >= s.pminy AND p.lat <= s.pmaxy
        """,
        "spatial_join_agg": f"""
            SELECT n_nationkey, COUNT(*) AS n_points
            FROM ({opts}) p JOIN ({nsq}) s
              ON p.lon >= s.pminx AND p.lon <= s.pmaxx
             AND p.lat >= s.pminy AND p.lat <= s.pmaxy
            GROUP BY n_nationkey
        """,
        "spatial_join_dwithin": f"""
            SELECT s_suppkey, COUNT(*) AS n_near
            FROM ({opts}) p JOIN ({sup}) s
              ON (p.lon - s.slon) * (p.lon - s.slon)
               + (p.lat - s.slat) * (p.lat - s.slat) <= 25.0
            GROUP BY s_suppkey
        """,
        "spatial_join_dwithin_poly": f"""
            SELECT n_nationkey, COUNT(*) AS n_near
            FROM ({opts}) p JOIN ({nsq}) s
              ON power(GREATEST(s.pminx - p.lon, 0.0, p.lon - s.pmaxx), 2)
               + power(GREATEST(s.pminy - p.lat, 0.0, p.lat - s.pmaxy), 2) <= 9.0
            GROUP BY n_nationkey
        """,
        "spatial_join_left": f"""
            SELECT p.o_orderkey, s.n_nationkey
            FROM (SELECT * FROM ({opts}) WHERE o_orderkey <= 20000) p
            LEFT JOIN ({nsq}) s
              ON p.lon >= s.pminx AND p.lon <= s.pmaxx
             AND p.lat >= s.pminy AND p.lat <= s.pmaxy
        """,
        "knn": f"""
            SELECT CAST(query_id AS BIGINT) AS query_id, o_orderkey,
                   CAST(rank AS INTEGER) AS rank FROM (
                SELECT q.query_id, p.o_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY sqrt((p.lon - q.qx) * (p.lon - q.qx)
                                       + (p.lat - q.qy) * (p.lat - q.qy)),
                                    p.o_orderkey, p.lon, p.lat) AS rank
                FROM ({opts}) p
                CROSS JOIN (VALUES (1, 0.0, 0.0), (2, 100.0, 50.0),
                                   (3, -120.0, -30.0)) q(query_id, qx, qy)
            ) WHERE rank <= 10
        """,
        # full recompute per zoom — equality with the Spark side proves
        # the incremental merge path (base pyramid + delta pyramid)
        # is invisible in the result
        "tile_pyramid": f"""
            WITH t6 AS (
                SELECT GREATEST(0, LEAST(63, CAST(FLOOR((lon + 180.0) / 360.0 * 64) AS BIGINT))) AS tile_x,
                       GREATEST(0, LEAST(63, CAST(FLOOR((90.0 - lat) / 180.0 * 64) AS BIGINT))) AS tile_y,
                       COUNT(*) AS n
                FROM ({opts}) GROUP BY 1, 2
            )
            SELECT CAST(6 AS INTEGER) AS zoom, tile_x, tile_y,
                   CAST(SUM(n) AS BIGINT) AS n_rows FROM t6 GROUP BY 2, 3
            UNION ALL
            SELECT CAST(5 AS INTEGER), tile_x // 2, tile_y // 2,
                   CAST(SUM(n) AS BIGINT) FROM t6 GROUP BY 2, 3
            UNION ALL
            SELECT CAST(4 AS INTEGER), tile_x // 4, tile_y // 4,
                   CAST(SUM(n) AS BIGINT) FROM t6 GROUP BY 2, 3
        """,
        "tile_assign": f"""
            -- r4: the Spark side now routes through the MVT vector-tile
            -- codec (render_mvt -> mvt_stats): spx/spy are sums of pixel
            -- coords DECODED from the protobuf command stream, so hash
            -- equality proves encode . decode == the FLOOR quantization
            -- closed form replayed here (spans 5.625 / 2.8125 are exact
            -- binary doubles; op order mirrored in ops/vector_tiles.py)
            SELECT tile_x, tile_y, COUNT(*) AS n_rows,
                   CAST(SUM(GREATEST(0, LEAST(4095, CAST(FLOOR((lon - (tile_x * 5.625 - 180.0)) / 5.625 * 4096.0) AS BIGINT)))) AS BIGINT) AS spx,
                   CAST(SUM(GREATEST(0, LEAST(4095, CAST(FLOOR(((90.0 - tile_y * 2.8125) - lat) / 2.8125 * 4096.0) AS BIGINT)))) AS BIGINT) AS spy
            FROM (
                SELECT lon, lat,
                       GREATEST(0, LEAST(63, CAST(FLOOR((lon + 180.0) / 360.0 * 64) AS BIGINT))) AS tile_x,
                       GREATEST(0, LEAST(63, CAST(FLOOR((90.0 - lat) / 180.0 * 64) AS BIGINT))) AS tile_y
                FROM ({opts})
            ) GROUP BY 1, 2
        """,
        "sql_st_intersects": f"""
            SELECT o_orderkey FROM ({opts}) WHERE {_penta_halfplane_sql()}
        """,
        "sql_st_xy_dist": f"""
            SELECT o_orderkey, lon AS px, lat AS py,
                   ROUND(sqrt((lon - 10.005) * (lon - 10.005)
                            + (lat - 10.005) * (lat - 10.005)), 6) AS d_r,
                   -- haversine replay of geom/geodesic.sphere_distance:
                   -- same mean radius (2a+b)/3 AND the same operation
                   -- order — RADIANS per coordinate THEN subtract, and
                   -- the h<=1 clamp — so the float64 result is bitwise
                   -- comparable (r5 review: RADIANS(a-b) differs at ulp
                   -- level from RADIANS(a)-RADIANS(b))
                   ROUND(2.0 * 6371008.771415059 * ASIN(SQRT(LEAST(1.0,
                       SIN((RADIANS(10.005) - RADIANS(lat)) / 2.0)
                     * SIN((RADIANS(10.005) - RADIANS(lat)) / 2.0)
                     + COS(RADIANS(lat)) * COS(RADIANS(10.005))
                       * SIN((RADIANS(10.005) - RADIANS(lon)) / 2.0)
                       * SIN((RADIANS(10.005) - RADIANS(lon)) / 2.0)
                   ))), 3) AS d_sph_r
            FROM ({opts})
            WHERE (lon - 10.005) * (lon - 10.005) + (lat - 10.005) * (lat - 10.005) <= 400.0
        """,
        "st_simplify_hull": f"""
            SELECT n_nationkey,
                   CASE WHEN (n_nationkey % 5) <= 2 THEN 2 ELSE 3 END AS simp_n,
                   ROUND(4.0 * hs * hs, 6) AS hull_area,
                   ROUND(2.0 * hs * hs, 6) AS inter_area,
                   ROUND(6.0 * hs * hs, 6) AS union_area,
                   ROUND(4.0 * hs * hs, 6) AS symdiff_area,
                   CAST(2 AS INTEGER) AS split_n
            FROM ({nsq})
        """,
        "spatial_join_buffered": f"""
            SELECT o_orderkey, n_nationkey
            FROM ({opts}) p JOIN ({nsq}) s
              ON p.lon - 2.0 <= s.pmaxx AND p.lon + 2.0 >= s.pminx
             AND p.lat - 2.0 <= s.pmaxy AND p.lat + 2.0 >= s.pminy
        """,
        "spatial_join_right": f"""
            SELECT p.o_orderkey, s.n_nationkey
            FROM (SELECT * FROM ({opts}) WHERE o_orderkey <= 20000) p
            RIGHT JOIN ({nsq}) s
              ON p.lon >= s.pminx AND p.lon <= s.pmaxx
             AND p.lat >= s.pminy AND p.lat <= s.pmaxy
        """,
        "resize": """
            -- leg 1: closed-form checksum of the nearest-neighbour 16->8
            -- resize of FIXTURES.md F0 pixels (sampled grid (2x', 2y'))
            SELECT id, kind, w, h, px_sum,
                   CAST(NULL AS INTEGER) AS epsg,
                   CAST(NULL AS DOUBLE) AS minlon_r, CAST(NULL AS DOUBLE) AS minlat_r,
                   CAST(NULL AS DOUBLE) AS maxlon_r, CAST(NULL AS DOUBLE) AS maxlat_r,
                   CAST(NULL AS BIGINT) AS tx0, CAST(NULL AS BIGINT) AS ty0,
                   CAST(NULL AS BIGINT) AS n_tiles
            FROM (
                SELECT id, kind, w, h, CAST(SUM(v) AS BIGINT) AS px_sum FROM (
                    SELECT '#' || CAST(i AS VARCHAR) AS id, 'resize' AS kind,
                           CAST(8 AS INTEGER) AS w, CAST(8 AS INTEGER) AS h,
                           (i * 31 + 2 * x * 7 + 2 * y * 13 + c * 97) % 256 AS v
                    FROM range(300) t(i), range(8) tx(x), range(8) ty(y), range(3) tc(c)
                ) GROUP BY 1, 2, 3, 4
            )
            UNION ALL
            -- leg 2: GeoTIFF ingest closed forms (FIXTURES.md F10):
            -- px law (i*31 + x*7 + y*13) % 4096, anchor lon0/lat0, bbox
            -- from the tiepoint affine in the engine's evaluation order,
            -- tile range via the tile_hilbert FLOOR law at zoom 6
            SELECT 'r' || CAST(t.i AS VARCHAR) AS id, 'geotiff' AS kind,
                   CAST(16 AS INTEGER) AS w, CAST(16 AS INTEGER) AS h,
                   s.px_sum, CAST(4326 AS INTEGER) AS epsg,
                   ROUND(t.minlon, 6) AS minlon_r, ROUND(t.minlat, 6) AS minlat_r,
                   ROUND(t.maxlon, 6) AS maxlon_r, ROUND(t.maxlat, 6) AS maxlat_r,
                   t.tx0, t.ty0,
                   (t.tx1 - t.tx0 + 1) * (t.ty1 - t.ty0 + 1) AS n_tiles
            FROM (
                SELECT i, minlon, minlat, maxlon, maxlat,
                       GREATEST(0, LEAST(63, CAST(FLOOR((minlon + 180.0) / 360.0 * 64) AS BIGINT))) AS tx0,
                       GREATEST(0, LEAST(63, CAST(FLOOR((maxlon + 180.0) / 360.0 * 64) AS BIGINT))) AS tx1,
                       GREATEST(0, LEAST(63, CAST(FLOOR((90.0 - maxlat) / 180.0 * 64) AS BIGINT))) AS ty0,
                       GREATEST(0, LEAST(63, CAST(FLOOR((90.0 - minlat) / 180.0 * 64) AS BIGINT))) AS ty1
                FROM (
                    SELECT i, lon0 AS minlon,
                           (0.05 * 16.0 + 0.0 * 0.0) + lon0 AS maxlon,
                           (0.0 * 0.0 + (-(0.1)) * 16.0) + lat0 AS minlat,
                           lat0 AS maxlat
                    FROM (
                        SELECT CAST(range AS BIGINT) AS i,
                               CAST(-170 + (range * 37) % 320 AS DOUBLE) AS lon0,
                               CAST(-75 + (range * 53) % 160 AS DOUBLE) AS lat0
                        FROM range(200)
                    )
                )
            ) t JOIN (
                SELECT i, CAST(SUM((i * 31 + x * 7 + y * 13) % 4096) AS BIGINT) AS px_sum
                FROM range(200) t(i), range(16) tx(x), range(16) ty(y)
                GROUP BY i
            ) s ON s.i = t.i
            UNION ALL
            -- leg 3: vector->raster render closed forms — per-pixel
            -- counts from the FLOOR law at zoom 4 x 8px tiles, the
            -- position-weighted checksum the decoded GeoTIFF must
            -- reproduce, and the tile-envelope bbox the emitted file's
            -- geo tags must carry (powers-of-two pixel scales: exact)
            SELECT 't' || CAST(tile_x AS VARCHAR) || '_' || CAST(tile_y AS VARCHAR) AS id,
                   'render' AS kind,
                   CAST(8 AS INTEGER) AS w, CAST(8 AS INTEGER) AS h,
                   CAST(SUM(cnt * (py * 8 + px + 1)) AS BIGINT) AS px_sum,
                   CAST(4326 AS INTEGER) AS epsg,
                   ROUND(CAST(tile_x AS DOUBLE) * (360.0 / 16) - 180.0, 6) AS minlon_r,
                   ROUND((0.0 * 0.0 + (-(180.0 / 128.0)) * 8.0)
                         + (90.0 - CAST(tile_y AS DOUBLE) * (180.0 / 16)), 6) AS minlat_r,
                   ROUND(((360.0 / 128.0) * 8.0 + 0.0 * 0.0)
                         + (CAST(tile_x AS DOUBLE) * (360.0 / 16) - 180.0), 6) AS maxlon_r,
                   ROUND(90.0 - CAST(tile_y AS DOUBLE) * (180.0 / 16), 6) AS maxlat_r,
                   tile_x AS tx0, tile_y AS ty0,
                   CAST(SUM(cnt) AS BIGINT) AS n_tiles
            FROM (
                SELECT gx // 8 AS tile_x, gy // 8 AS tile_y,
                       gx % 8 AS px, gy % 8 AS py, COUNT(*) AS cnt
                FROM (
                    SELECT GREATEST(0, LEAST(127, CAST(FLOOR((lon + 180.0) / 360.0 * 128) AS BIGINT))) AS gx,
                           GREATEST(0, LEAST(127, CAST(FLOOR((90.0 - lat) / 180.0 * 128) AS BIGINT))) AS gy
                    FROM (
                        SELECT CAST((range * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
                               CAST((range * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat
                        FROM range(2000)
                    )
                )
                GROUP BY 1, 2, 3, 4
            )
            GROUP BY tile_x, tile_y
        """,
        "tile_hilbert": _hilbert_xy2d_sql(6, opts),
        "image_stats": """
            -- closed-form FIXTURES.md F0 pixels: channel means are integer
            -- sums / 2^8 (exact), ahash compares integer luma block sums
            WITH px AS (
                SELECT i, x, y,
                       (i*31 + x*7 + y*13) % 256 AS r,
                       (i*31 + x*7 + y*13 + 97) % 256 AS g,
                       (i*31 + x*7 + y*13 + 194) % 256 AS b
                FROM range(500) t(i), range(16) tx(x), range(16) ty(y)
            ), img AS (
                SELECT i,
                       CAST(SUM(r) AS DOUBLE) / 256.0 AS mean_r,
                       CAST(SUM(g) AS DOUBLE) / 256.0 AS mean_g,
                       CAST(SUM(b) AS DOUBLE) / 256.0 AS mean_b,
                       CAST(SUM(299*r + 587*g + 114*b) AS HUGEINT) AS stot
                FROM px GROUP BY i
            ), blk AS (
                SELECT i, y // 2 AS yb, x // 2 AS xb,
                       CAST(SUM(299*r + 587*g + 114*b) AS HUGEINT) AS bsum
                FROM px GROUP BY 1, 2, 3
            ), ah AS (
                SELECT b.i,
                       SUM(CASE WHEN b.bsum * 64 >= m.stot
                                THEN CAST(1 AS HUGEINT) << CAST(b.yb * 8 + b.xb AS INTEGER)
                                ELSE CAST(0 AS HUGEINT) END) AS a
                FROM blk b JOIN img m ON b.i = m.i GROUP BY 1
            )
            SELECT '#' || CAST(m.i AS VARCHAR) AS image_id,
                   m.mean_r, m.mean_g, m.mean_b,
                   CAST(FLOOR((0.299 * m.mean_r + 0.587 * m.mean_g
                               + 0.114 * m.mean_b) / 32) AS INTEGER) AS luma_bucket,
                   CAST(CASE WHEN a.a >= CAST('9223372036854775808' AS HUGEINT)
                             THEN a.a - CAST('18446744073709551616' AS HUGEINT)
                             ELSE a.a END AS BIGINT) AS ahash
            FROM img m JOIN ah a ON m.i = a.i
        """,
        "sql_st_measures": f"""
            SELECT n_nationkey, 4.0 * hs * hs AS area,
                   ROUND(cx, 6) AS cx_r, ROUND(cy, 6) AS cy_r,
                   ROUND((cx - hs) * (6378137.0 * pi() / 180.0), 4) AS mminx_r,
                   ROUND(ln(tan(pi() / 4.0 + radians(cy + hs) / 2.0)) * 6378137.0, 4)
                       AS mmaxy_r,
                   CAST(4326 AS INTEGER) AS srid_rt,
                   TRUE AS is_valid,
                   CAST(2 AS INTEGER) AS dim,
                   -- dissolved buffer of a convex polygon: A + P*d + A_64
                   -- (inscribed 64-gon corner wedges sum to one full
                   -- 64-gon; exact for the discretized shell — kernel
                   -- buffer_geom closed form, verified to 1e-11)
                   ROUND(4.0 * hs * hs + 4.0 * (2.0 * hs) * 0.5
                         + 32.0 * 0.25 * sin(pi() / 32.0), 6) AS buf_area_r,
                   'Polygon' AS buf_type,
                   -- DE-9IM of two axis-aligned rectangles is pure
                   -- interval arithmetic (closed form fuzz-verified
                   -- against geom/de9im.py on 6000 random pairs):
                   -- A = the nation square, B = (-60,-40)-(40,40)
                   CASE
                     WHEN ox < 0 OR oy < 0 THEN 'FF2FF1212'
                     WHEN ox = 0 AND oy = 0 THEN 'FF2F01212'
                     WHEN ox = 0 OR oy = 0 THEN 'FF2F11212'
                     ELSE concat(
                       '2',
                       CASE WHEN (pminx < -60.0 AND -60.0 < pmaxx)
                              OR (pminx < 40.0 AND 40.0 < pmaxx)
                              OR (pminy < -40.0 AND -40.0 < pmaxy)
                              OR (pminy < 40.0 AND 40.0 < pmaxy)
                            THEN '1' ELSE 'F' END,
                       CASE WHEN a_in_b THEN 'F' ELSE '2' END,
                       CASE WHEN (-60.0 < pminx AND pminx < 40.0)
                              OR (-60.0 < pmaxx AND pmaxx < 40.0)
                              OR (-40.0 < pminy AND pminy < 40.0)
                              OR (-40.0 < pmaxy AND pmaxy < 40.0)
                            THEN '1' ELSE 'F' END,
                       CASE
                         WHEN pminx IN (-60.0, 40.0) OR pmaxx IN (-60.0, 40.0)
                              OR pminy IN (-40.0, 40.0) OR pmaxy IN (-40.0, 40.0)
                            THEN '1'
                         WHEN ((pminx < -60.0 AND -60.0 < pmaxx)
                               OR (pminx < 40.0 AND 40.0 < pmaxx)
                               OR (pminy < -40.0 AND -40.0 < pmaxy)
                               OR (pminy < 40.0 AND 40.0 < pmaxy))
                              AND ((-60.0 < pminx AND pminx < 40.0)
                                   OR (-60.0 < pmaxx AND pmaxx < 40.0)
                                   OR (-40.0 < pminy AND pminy < 40.0)
                                   OR (-40.0 < pmaxy AND pmaxy < 40.0))
                            THEN '0'
                         ELSE 'F' END,
                       CASE WHEN a_in_b THEN 'F' ELSE '1' END,
                       CASE WHEN b_in_a THEN 'F' ELSE '2' END,
                       CASE WHEN b_in_a THEN 'F' ELSE '1' END,
                       '2')
                   END AS rel_m,
                   -- UTM 18N easting/northing of the in-zone-mapped
                   -- center: the engine's numpy Krüger path vs this
                   -- exp/ln re-derivation (see _utm18n_parts)
                   ROUND({utm_e}, 1) AS utm_e_r,
                   ROUND({utm_n}, 1) AS utm_n_r,
                   -- r4 closure batch: all closed-form on the square
                   CAST(5 AS INTEGER) AS npts,
                   ROUND(8.0 * hs, 6) AS perim_r,
                   TRUE AS ring_closed,
                   TRUE AS ring_is_ring,
                   CAST(2 AS INTEGER) AS coord_dim,
                   ROUND(4.0 * hs * hs, 6) AS mkpoly_area_r,
                   ROUND(cx, 6) AS pfwkb_x_r,
                   TRUE AS lfwkb_null,
                   -- erosion of a convex polygon is the exact inner
                   -- offset: the square shrinks to side 2*hs - 2
                   ROUND((2.0 * hs - 2.0) * (2.0 * hs - 2.0), 6) AS ebuf_area_r
            FROM (
              SELECT *,
                     LEAST(pmaxx, 40.0) - GREATEST(pminx, -60.0) AS ox,
                     LEAST(pmaxy, 40.0) - GREATEST(pminy, -40.0) AS oy,
                     (pminx >= -60.0 AND pmaxx <= 40.0
                      AND pminy >= -40.0 AND pmaxy <= 40.0) AS a_in_b,
                     (pminx <= -60.0 AND pmaxx >= 40.0
                      AND pminy <= -40.0 AND pmaxy >= 40.0) AS b_in_a,{utm_stage}
              FROM ({nsq})
            )
        """,
        "dedup_exact": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_tokens,
                   (length(text) - (length(text) - length(replace(text, ' ', '')))) * 1.0
                       / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_token_len,
                   ({_stop_hits_sql()}) * 1.0
                       / (length(text) - length(replace(text, ' ', '')) + 1) AS stopword_ratio,
                   LEAST((length(text) - length(replace(text, ' ', '')) + 1) / 100.0, 1.0) * 0.5
                   + LEAST((({_stop_hits_sql()})
                            / (length(text) - length(replace(text, ' ', '')) + 1)) * 5.0, 1.0) * 0.5
                       AS quality
            FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_ws,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe
            FROM documents
        """,
        "seq_pack": """
            WITH RECURSIVE o AS (
              SELECT doc_id AS id, doc_id % 8 AS shard,
                     CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS tok,
                     CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                          OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS BIGINT) AS cum
              FROM documents),
            walk(shard, bin, start_cum) AS (
              SELECT DISTINCT shard, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM o
              UNION ALL
              SELECT w.shard, w.bin + 1,
                GREATEST(
                  COALESCE((SELECT MAX(d.cum) FROM o d
                            WHERE d.shard = w.shard AND d.cum <= w.start_cum + 64),
                           w.start_cum),
                  (SELECT MIN(d.cum) FROM o d
                   WHERE d.shard = w.shard AND d.cum > w.start_cum)
                )
              FROM walk w
              WHERE EXISTS (SELECT 1 FROM o d
                            WHERE d.shard = w.shard AND d.cum > w.start_cum)
            ),
            ranges AS (
              SELECT shard, bin, start_cum,
                     LEAD(start_cum, 1, 9223372036854775807)
                       OVER (PARTITION BY shard ORDER BY bin) AS end_cum
              FROM walk)
            SELECT CAST(d.id AS BIGINT) AS doc_id,
                   CAST(d.shard AS BIGINT) AS shard,
                   CAST(r.bin AS BIGINT) AS bin,
                   CAST(d.cum - d.tok - r.start_cum AS BIGINT) AS off
            FROM o d JOIN ranges r
              ON d.shard = r.shard
             AND d.cum - d.tok >= r.start_cum AND d.cum - d.tok < r.end_cum
        """,
        "ann_topk": """
            SELECT vec_id, CAST(rank AS INTEGER) AS rank, ROUND(sim, 6) AS sim_r FROM (
                SELECT e.vec_id,
                       list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                          * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) AS sim,
                       ROW_NUMBER() OVER (ORDER BY sim DESC, e.vec_id) AS rank
                FROM embeddings e
                CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ) WHERE rank <= 20
        """,
        "text_signals": _text_signals_sql(),
        "doc_fingerprints": _doc_fingerprints_sql(),
        "ann_approx": _ann_approx_sql(),
        # Exact 3-token-shingle Jaccard over the 150-orig + 150-modified
        # corpus, fully relational: tokenize → distinct shingle strings →
        # shingle-equality self-join counts the intersection; union =
        # |A|+|B|-∩. The Spark query computes the SAME pair set twice
        # (MinHash+LSH path and exact-verify path, tagged by method), so
        # one CTE oracles both halves — which makes the driver gate an
        # exact RECALL check on the LSH pipeline, not just a parity
        # check on the brute-force twin. Deterministic: hashing is
        # splitmix64-seeded (ops/dedup.py) and the corpus is fixed.
        "near_dup_text": """
            WITH corpus AS (
                SELECT doc_id AS id, text FROM documents WHERE doc_id < 150
                UNION ALL
                SELECT doc_id + 1000000, text || ' qqq'
                FROM documents WHERE doc_id < 150
            ),
            toks AS (SELECT id, string_split(text, ' ') AS t FROM corpus),
            sh AS (
                SELECT DISTINCT id, unnest(
                    CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
                         ELSE list_transform(
                             range(1, len(t) - 1),
                             i -> array_to_string(t[i:i+2], chr(31)))
                    END) AS s
                FROM toks
            ),
            sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
            inter AS (
                SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT id_a, id_b
                FROM inter
                JOIN sizes sa ON sa.id = inter.id_a
                JOIN sizes sb ON sb.id = inter.id_b
                WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
            )
            SELECT 'minhash_lsh' AS method, id_a, id_b FROM pairs
            UNION ALL
            SELECT 'ngram_exact' AS method, id_a, id_b FROM pairs
        """,
        "embed_clusters": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS i, b.vec_id AS j
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.45
            ),
            edges AS (SELECT i, j FROM pairs UNION ALL SELECT j AS i, i AS j FROM pairs),
            reach(id, lab) AS (
              SELECT vec_id, vec_id FROM embeddings
              UNION
              SELECT e.i, r.lab FROM edges e JOIN reach r ON r.id = e.j AND r.lab < e.i
            )
            SELECT CAST(id AS BIGINT) AS vec_id, CAST(MIN(lab) AS BIGINT) AS cluster
            FROM reach GROUP BY id
        """,
    }


def _s2_leaf_sql(opts: str) -> str:
    """DuckDB replay of the FULL S2 leaf-id pipeline (cells/s2.py) for
    the rational gate vector (S2_A/B/C_SQL): cube-face CASE → per-face
    uv ratios → quadratic-ST sqrt → floor ij → the 30-level Hilbert
    descent unrolled into chained stages driven by the PRIMITIVE 4×4
    traversal tables (_POS_TO_IJ/_POS_TO_ORIENT — the same single
    source the engine's lookup tables are built from). Emits per-row
    (…input columns…, s2_face, s2_pos) where s2_pos is the 61-bit
    position word (pos<<1 | 1) — faces 4-5 would push the full id
    negative, so face and position gate as separate BIGINTs."""
    from geomesa_sql_spark.cells.s2 import _POS_TO_IJ, _POS_TO_ORIENT

    # invert the traversal table: orientation × (ibit*2+jbit) → pos
    ij2pos = [[0] * 4 for _ in range(4)]
    for o in range(4):
        for pos in range(4):
            ij2pos[o][_POS_TO_IJ[o][pos]] = pos
    st = (
        "GREATEST(0, LEAST(1073741823, CAST(FLOOR((CASE WHEN {c} >= 0.0 "
        "THEN 0.5 * sqrt(1.0 + 3.0 * {c}) "
        "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {c}) END) * 1073741824.0) AS BIGINT)))"
    )
    u_case = (
        "CASE face WHEN 0 THEN sb / sa WHEN 1 THEN -sa / sb WHEN 2 THEN -sa / sc "
        "WHEN 3 THEN sc / sa WHEN 4 THEN sc / sb ELSE -sb / sc END"
    )
    v_case = (
        "CASE face WHEN 0 THEN sc / sa WHEN 1 THEN sc / sb WHEN 2 THEN -sb / sc "
        "WHEN 3 THEN sb / sa WHEN 4 THEN -sa / sb ELSE -sa / sc END"
    )
    stages = [
        f"sb0 AS (SELECT *, {S2_A_SQL} AS sa, {S2_B_SQL} AS sb, {S2_C_SQL} AS sc "
        f"FROM ({opts}))",
        "sf0 AS (SELECT *, "
        "CASE WHEN abs(sa) > abs(sb) AND abs(sa) > abs(sc) THEN "
        "(CASE WHEN sa < 0.0 THEN 3 ELSE 0 END) "
        "WHEN abs(sb) > abs(sc) THEN (CASE WHEN sb < 0.0 THEN 4 ELSE 1 END) "
        "ELSE (CASE WHEN sc < 0.0 THEN 5 ELSE 2 END) END AS face FROM sb0)",
        f"sij AS (SELECT *, {st.format(c=u_case)} AS si, {st.format(c=v_case)} AS sj "
        "FROM sf0)",
        "w0 AS (SELECT *, CAST(face & 1 AS BIGINT) AS o0, CAST(0 AS BIGINT) AS n0 "
        "FROM sij)",
    ]
    for k in range(29, -1, -1):
        i, j = 29 - k, 30 - k
        pos_arms = " ".join(
            f"WHEN {o * 4 + ij} THEN {ij2pos[o][ij]}"
            for o in range(4)
            for ij in range(4)
        )
        orient_arms = " ".join(
            f"WHEN {p} THEN xor(o{i}, {_POS_TO_ORIENT[p]})"
            for p in range(4)
            if _POS_TO_ORIENT[p]
        )
        stages.append(
            f"w{j} AS (SELECT *, "
            f"CASE o{i} * 4 + (((si >> {k}) & 1) * 2 + ((sj >> {k}) & 1)) "
            f"{pos_arms} END AS p{j}, "
            f"n{i} * 4 + p{j} AS n{j}, "
            f"CASE p{j} {orient_arms} ELSE o{i} END AS o{j} FROM w{i})"
        )
    return (
        ", ".join(stages)
        + ", s2done AS (SELECT *, CAST(face AS BIGINT) AS s2_face, "
        "n30 * 2 + 1 AS s2_pos FROM w30)"
    )


def _hilbert_xy2d_sql(zoom: int, opts: str) -> str:
    """Exact relational oracle for the Hilbert tile ids: the standard
    rotate-and-accumulate xy2d loop (cells/curve.py:89-116) UNROLLED
    into ``zoom`` chained CTE steps of pure integer CASE/bitwise SQL.
    Each step uses fresh column names (x0,y0,d0 → x1,y1,d1 → ...) so
    DuckDB's lateral column aliasing can never bind to the new value.
    r4: the base relation first runs the S2 leaf pipeline
    (_s2_leaf_sql) and the h-steps carry (s2_face, s2_pos) through to
    per-tile XOR folds, gating the S2 curve alongside the zoom grid.
    NOTE: that S2 prefix references o_orderkey (S2_C_SQL), so this
    builder is ORDERS-ONLY now — a reuse against another relation
    needs the S2 leg threaded in as a parameter."""
    n = 1 << zoom
    # ox/oy carry the ORIGINAL grid coords through the rotate steps
    # (the loop destroys x/y): the final select emits them as the
    # inverse-Hilbert oracle — the Spark side recomputes them from the
    # id alone via hilbert_d2xy, so hash equality proves d2xy ∘ xy2d=id
    xexpr = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR((lon + 180.0) / 360.0 * {n}) AS BIGINT)))"
    yexpr = f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR((90.0 - lat) / 180.0 * {n}) AS BIGINT)))"
    base = (
        f"h0 AS (SELECT "
        f"{xexpr} AS x0, {yexpr} AS y0, "
        f"{xexpr} AS ox, {yexpr} AS oy, "
        f"s2_face, s2_pos, "
        f"CAST(0 AS BIGINT) AS d0 FROM s2done)"
    )
    steps = [_s2_leaf_sql(opts), base]
    for k in range(zoom):
        s = 1 << (zoom - 1 - k)
        i, j = k, k + 1
        rx = f"((x{i} & {s}) > 0)"
        ry = f"((y{i} & {s}) > 0)"
        term = (
            f"CASE WHEN {rx} THEN CASE WHEN {ry} THEN 2 ELSE 3 END "
            f"ELSE CASE WHEN {ry} THEN 1 ELSE 0 END END"
        )
        new_x = (
            f"CASE WHEN {ry} THEN x{i} "
            f"WHEN {rx} THEN {s - 1} - y{i} ELSE y{i} END"
        )
        new_y = (
            f"CASE WHEN {ry} THEN y{i} "
            f"WHEN {rx} THEN {s - 1} - x{i} ELSE x{i} END"
        )
        steps.append(
            f"h{j} AS (SELECT d{i} + {s * s} * ({term}) AS d{j}, "
            f"{new_x} AS x{j}, {new_y} AS y{j}, ox, oy, s2_face, s2_pos FROM h{i})"
        )
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT d{zoom} AS tile_id, COUNT(*) AS n_rows, "
        # one tile_id ↔ one (x, y): MIN is just the value
        f"MIN(ox) AS ix, MIN(oy) AS iy, "
        f"ROUND(MIN(ox) * (360.0 / {n}) - 180.0, 6) AS tminx_r, "
        f"ROUND(90.0 - (MIN(oy) + 1) * (180.0 / {n}), 6) AS tminy_r, "
        f"ROUND((MIN(ox) + 1) * (360.0 / {n}) - 180.0, 6) AS tmaxx_r, "
        f"ROUND(90.0 - MIN(oy) * (180.0 / {n}), 6) AS tmaxy_r, "
        # closed-envelope containment always holds under FLOOR
        # assignment with edge clamping (lat = -90 clamps into row
        # n-1, whose closed envelope still contains it)
        f"TRUE AS contained, "
        f"bit_xor(s2_face) AS s2fx, bit_xor(s2_pos) AS s2px "
        f"FROM h{zoom} GROUP BY 1"
    )


def _dbscan_sql(eps: float = 0.5, min_pts: int = 5) -> str:
    """DuckDB oracle for the dbscan contract query (two legs).

    Replays the engine's SEMANTICS relationally (the engine itself is
    partition-local with halo replication — ops/cluster.py; the oracle
    uses the simpler eps-grid 3×3 cell equi-join shape, fine at oracle
    scale): neighbor pairs O(n·density), degree count + self for core
    points, min-label connected components over the core-core subgraph
    as a recursive CTE (pruned to labels < node id — the component min
    always qualifies, everything else is dead weight), and
    MIN-core-neighbor border assignment. Point fixture =
    io/fixtures.py CLUSTER_*_SQL verbatim.

    The 'sphere' leg replays metric='sphere' with the SAME chordal
    embedding the engine uses: coordinates via x / 180.0 * PI()
    (java.lang.Math.toRadians' op order), the chord threshold
    eps_c² inlined from the identical Python expression, and the
    squared-distance sum in the engine's (dx²+dy²)+dz² order. The
    candidate grid is a 0.6° lon/lat 3×3 prefilter — a proven
    over-cover for 60 km at the fixture's |lat| ≤ 18.5° (Δφ ≤ 0.54°;
    Δλ ≤ 0.54°/cos(19.1°) = 0.572°) — with the exact chord predicate
    doing the real work; the fixture sits nowhere near a pole or the
    antimeridian, so the degree grid is safe HERE (the engine itself
    needs no such assumption)."""
    import math as _math

    from geomesa_sql_spark.geom.geodesic import MAX_DISTANCE, MEAN_RADIUS
    from geomesa_sql_spark.io.fixtures import (
        CLUSTER_SUBSET_SQL,
        CLUSTER_X_SQL,
        CLUSTER_Y_SQL,
    )

    eps_m = DBSCAN_SPHERE_EPS_M
    r = MEAN_RADIUS
    eps_c = 2.0 * r * _math.sin(min(eps_m, MAX_DISTANCE) / (2.0 * r))
    e2 = eps_c * eps_c
    grid = 0.6

    return f"""
WITH RECURSIVE pts AS (
  SELECT o_orderkey AS id, {CLUSTER_X_SQL} AS x, {CLUSTER_Y_SQL} AS y
  FROM orders WHERE {CLUSTER_SUBSET_SQL}),
cells AS (
  SELECT id, x, y,
         CAST(FLOOR(x / {eps}) AS BIGINT) AS cx,
         CAST(FLOOR(y / {eps}) AS BIGINT) AS cy
  FROM pts),
lhs AS (
  SELECT c.id, c.x, c.y, c.cx + dx.d AS cx, c.cy + dy.d AS cy
  FROM cells c, (VALUES (-1),(0),(1)) dx(d), (VALUES (-1),(0),(1)) dy(d)),
pairs AS (
  SELECT a.id AS i, b.id AS j
  FROM lhs a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
  WHERE a.id <> b.id
    AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {eps}*{eps}),
deg AS (SELECT i AS id, COUNT(*) AS nnb FROM pairs GROUP BY i),
core AS (SELECT p.id FROM pts p LEFT JOIN deg d USING(id)
         WHERE COALESCE(d.nnb, 0) + 1 >= {min_pts}),
edges AS (SELECT i, j FROM pairs
          WHERE i IN (SELECT id FROM core) AND j IN (SELECT id FROM core)),
reach(id, lab) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.i, r.lab FROM edges e JOIN reach r ON r.id = e.j AND r.lab < e.i),
comp AS (SELECT id, MIN(lab) AS lab FROM reach GROUP BY id),
border AS (
  SELECT p.i AS id, MIN(c.lab) AS lab
  FROM pairs p JOIN comp c ON p.j = c.id
  WHERE p.i NOT IN (SELECT id FROM core)
  GROUP BY p.i),
spts AS (
  SELECT id,
         ({r!r} * COS(y / 180.0 * PI())) * COS(x / 180.0 * PI()) AS px,
         ({r!r} * COS(y / 180.0 * PI())) * SIN(x / 180.0 * PI()) AS py,
         {r!r} * SIN(y / 180.0 * PI()) AS pz,
         CAST(FLOOR(x / {grid}) AS BIGINT) AS cx,
         CAST(FLOOR(y / {grid}) AS BIGINT) AS cy
  FROM pts),
slhs AS (
  SELECT c.id, c.px, c.py, c.pz, c.cx + dx.d AS cx, c.cy + dy.d AS cy
  FROM spts c, (VALUES (-1),(0),(1)) dx(d), (VALUES (-1),(0),(1)) dy(d)),
spairs AS (
  SELECT a.id AS i, b.id AS j
  FROM slhs a JOIN spts b ON a.cx = b.cx AND a.cy = b.cy
  WHERE a.id <> b.id
    AND ((a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py))
        + (a.pz-b.pz)*(a.pz-b.pz) <= {e2!r}),
sdeg AS (SELECT i AS id, COUNT(*) AS nnb FROM spairs GROUP BY i),
score AS (SELECT p.id FROM pts p LEFT JOIN sdeg d USING(id)
          WHERE COALESCE(d.nnb, 0) + 1 >= {min_pts}),
sedges AS (SELECT i, j FROM spairs
           WHERE i IN (SELECT id FROM score) AND j IN (SELECT id FROM score)),
sreach(id, lab) AS (
  SELECT id, id FROM score
  UNION
  SELECT e.i, r.lab FROM sedges e JOIN sreach r ON r.id = e.j AND r.lab < e.i),
scomp AS (SELECT id, MIN(lab) AS lab FROM sreach GROUP BY id),
sborder AS (
  SELECT p.i AS id, MIN(c.lab) AS lab
  FROM spairs p JOIN scomp c ON p.j = c.id
  WHERE p.i NOT IN (SELECT id FROM score)
  GROUP BY p.i)
SELECT CAST(p.id AS BIGINT) AS id,
       CAST(COALESCE(c.lab, b.lab, -1) AS BIGINT) AS cluster,
       CASE WHEN c.lab IS NOT NULL THEN 'core'
            WHEN b.lab IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
       'planar' AS leg
FROM pts p LEFT JOIN comp c ON p.id = c.id LEFT JOIN border b ON p.id = b.id
UNION ALL
SELECT CAST(p.id AS BIGINT) AS id,
       CAST(COALESCE(c.lab, b.lab, -1) AS BIGINT) AS cluster,
       CASE WHEN c.lab IS NOT NULL THEN 'core'
            WHEN b.lab IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
       'sphere' AS leg
FROM pts p LEFT JOIN scomp c ON p.id = c.id LEFT JOIN sborder b ON p.id = b.id
"""


def _text_signals_sql() -> str:
    """Exact relational oracle for (simhash, lang_pred) — DuckDB
    re-derives the 64-bit Charikar SimHash bit-for-bit:

    - per-token FNV-1a (63-bit masked) via ``list_reduce`` over the
      token's ASCII bytes (corpus is verified single-space ASCII);
    - the splitmix64 finalizer with its two 64x64-bit multiplies done
      as 32-bit-split products mod 2^64 in HUGEINT (a full 64x64
      product can overflow int128, so ``mulmod64`` splits the constant
      into hi/lo halves — same trick a portable C implementation uses);
    - 64 per-bit ±1 vote sums, reassembled into a signed BIGINT
      (bit 63 contributes -2^63).

    lang_pred replays ops/text.lang_id's marker-word presence votes
    with alphabetical tie-break as a CASE argmax. Parity holds on any
    single-space ASCII corpus with ≥1 token per doc (the driver's
    documents table is; empty docs would diverge on string_split('')).
    """
    M64 = "CAST('18446744073709551616' AS HUGEINT)"
    M32 = 4294967296

    def mulmod64(a: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"CAST((CAST({a} AS HUGEINT) * {lo} + "
            f"((CAST({a} AS HUGEINT) % {M32}) * {hi}) % {M32} * {M32}) "
            f"% {M64} AS UBIGINT)"
        )

    fnv = (
        "CAST(list_reduce("
        "list_prepend(CAST('14695981039346656037' AS UBIGINT), "
        "list_transform(range(1, length(tok)+1), i -> CAST(ascii(tok[i]) AS UBIGINT))), "
        f"(acc, b) -> CAST((CAST(xor(acc, b) AS HUGEINT) * 1099511628211) % {M64} AS UBIGINT)"
        ") & CAST('9223372036854775807' AS UBIGINT) AS UBIGINT)"
    )
    z1 = (
        f"CAST((CAST(x AS HUGEINT) + CAST('11400714819323198485' AS HUGEINT)) "
        f"% {M64} AS UBIGINT)"
    )
    z2 = mulmod64("xor(z1, z1 >> 30)", 0xBF58476D1CE4E5B9)
    z3 = mulmod64("xor(z2, z2 >> 27)", 0x94D049BB133111EB)

    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    recompose = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(63)
    ) + (
        " + CASE WHEN v63 > 0 THEN CAST('-9223372036854775808' AS BIGINT) "
        "ELSE 0 END"
    )

    from geomesa_sql_spark.ops.text import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    scores = ", ".join(
        " + ".join(
            f"CAST(' ' || text || ' ' LIKE '% {w} %' AS INTEGER)"
            for w in _LANG_MARKERS[lg]
        )
        + f" AS s_{lg}"
        for lg in langs
    )
    pick = "CASE "
    for i, lg in enumerate(langs[:-1]):
        rest = ", ".join(f"s_{other}" for other in langs[i + 1 :])
        gt = f"GREATEST({rest})" if "," in rest else rest
        pick += f"WHEN s_{lg} >= {gt} THEN '{lg}' "
    pick += f"ELSE '{langs[-1]}' END"

    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        f AS (SELECT doc_id, {fnv} AS x FROM toks),
        s1 AS (SELECT doc_id, {z1} AS z1 FROM f),
        s2 AS (SELECT doc_id, {z2} AS z2 FROM s1),
        s3 AS (SELECT doc_id, {z3} AS z3 FROM s2),
        s4 AS (SELECT doc_id, xor(z3, z3 >> 31) AS h FROM s3),
        votes AS (SELECT doc_id, {votes} FROM s4 GROUP BY doc_id),
        sim AS (SELECT doc_id, {recompose} AS simhash FROM votes),
        lid AS (SELECT doc_id, {scores} FROM documents),
        pred AS (SELECT doc_id, {pick} AS lang_pred FROM lid)
        SELECT sim.doc_id, sim.simhash, pred.lang_pred
        FROM sim JOIN pred ON sim.doc_id = pred.doc_id
    """


def _doc_fingerprints_sql() -> str:
    """Exact relational oracle for the CDC fingerprints — DuckDB
    re-derives every chunk boundary and hash bit-for-bit:

    - the Rabin-style rolling hash over each 16-byte window is a
      16-term dot product against precomputed P^k mod 2^64 constants
      (byte * 2^64-constant fits HUGEINT; one mod at the end);
    - the GREEDY boundary walk (accept a cut only ≥ min_chunk past the
      last ACCEPTED cut — sequentially dependent, the reason this op
      was rows-only in round 1) becomes a recursive CTE: each step
      joins the frontier to the minimal eligible cut via NOT EXISTS;
    - trailing bound n is added set-wise (DISTINCT over UNION ALL —
      plain UNION fails to dedup across branches inside a recursive
      WITH in DuckDB 1.0, observed directly);
    - chunk_hash replays FNV-1a via list_reduce over the chunk's bytes.

    Parity holds for ASCII corpora (byte == codepoint); the driver's
    documents table is verified single-space ASCII.
    """
    P = 1099511628211
    W, MIN = 16, 24
    powers = [pow(P, W - 1 - j, 1 << 64) for j in range(W)]
    M64 = "CAST('18446744073709551616' AS HUGEINT)"
    terms = " + ".join(
        f"CAST(b[i+{j}] AS HUGEINT) * CAST('{powers[j]}' AS HUGEINT)"
        for j in range(W)
    )
    fnv_slice = (
        "CAST(list_reduce("
        "list_prepend(CAST('14695981039346656037' AS UBIGINT), "
        "list_transform(range(lo+1, hi+1), i -> CAST(ascii(text[i]) AS UBIGINT))), "
        f"(acc, byt) -> CAST((CAST(xor(acc, byt) AS HUGEINT) * {P}) % {M64} AS UBIGINT)"
        ") & CAST('9223372036854775807' AS UBIGINT) AS BIGINT)"
    )
    return f"""
        WITH RECURSIVE db AS (
          SELECT doc_id, text, length(text) AS n,
                 list_transform(range(1, length(text)+1), i -> ascii(text[i])) AS b
          FROM documents
        ),
        pos AS (SELECT doc_id, b, unnest(range(1, n - {W} + 2)) AS i
                FROM db WHERE n > {W}),
        cuts AS (
          SELECT doc_id, i + {W - 1} AS cut FROM pos
          WHERE CAST(({terms}) % {M64} AS UBIGINT) & 63 = 0
        ),
        kept AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS cut, 0 AS k FROM db
          UNION ALL
          SELECT c.doc_id, c.cut, kept.k + 1
          FROM kept JOIN cuts c
            ON c.doc_id = kept.doc_id AND c.cut >= kept.cut + {MIN}
          WHERE NOT EXISTS (SELECT 1 FROM cuts c2
                            WHERE c2.doc_id = c.doc_id
                              AND c2.cut >= kept.cut + {MIN}
                              AND c2.cut < c.cut)
        ),
        bounds AS (
          SELECT DISTINCT doc_id, cut FROM (
            SELECT doc_id, cut FROM kept WHERE k >= 1
            UNION ALL
            SELECT doc_id, n FROM db
          )
        ),
        chunks AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cut) - 1
                      AS INTEGER) AS chunk_idx,
                 COALESCE(LAG(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS lo,
                 cut AS hi
          FROM bounds
        )
        SELECT c.doc_id, c.chunk_idx, {fnv_slice} AS chunk_hash
        FROM chunks c JOIN db USING (doc_id)
    """


def _ann_approx_sql() -> str:
    """ann_approx oracle: replays BOTH approximate ANN paths.

    The sign-LSH hyperplanes and the IVF coarse centroids are
    data-independent splitmix64 constants, embedded as DOUBLE[]
    literals (``repr`` round-trips every float64 exactly: ≤17
    significant digits survive DuckDB's DECIMAL parse → DOUBLE cast).
    Only integers are hashed (method, q_id, vec_id, rank); the floats
    behind them need sign/ordering agreement only — a bucket bit flips
    at |dot| ≈ 1e-15 and a rank at sim gaps ≈ 1e-15, far below this
    dataset's margins. The rerank sim itself is bit-identical anyway:
    DuckDB's list_dot_product is the same sequential fold as the Spark
    side's aggregate(zip_with(...)) (see ann_topk)."""
    from geomesa_sql_spark.ops.ann import _hyperplanes, fixed_centroids

    def lit(vec):
        return "[" + ", ".join(repr(float(v)) for v in vec) + "]::DOUBLE[]"

    def bucket_of(col):
        # Σ 2^i over sign bits of plane dot products, matching
        # lsh_bucket_ann's signs @ (1 << arange(bits))
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {lit(p)}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(_hyperplanes(64, 6))
        )

    cent_rows = ",\n          ".join(
        f"({cid}, {lit(c)})" for cid, c in enumerate(fixed_centroids(64, 8))
    )
    cosine = (
        "list_dot_product(de, qe) / (sqrt(list_dot_product(de, de))"
        " * sqrt(list_dot_product(qe, qe)))"
    )
    return f"""
        WITH d AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        q AS (
          SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < 3 AND embedding IS NOT NULL
        ),
        db AS (SELECT vec_id, de, {bucket_of('de')} AS bucket FROM d),
        qb AS (
          SELECT q_id, qe, xor(b0, pr.p) AS bucket
          FROM (SELECT q_id, qe, {bucket_of('qe')} AS b0 FROM q)
          CROSS JOIN (VALUES (0), (1), (2)) pr(p)
        ),
        lsh_ranked AS (
          SELECT q_id, vec_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY {cosine} DESC, vec_id
                 ) AS rank
          FROM db JOIN qb USING (bucket)
        ),
        cents(cid, cv) AS (VALUES
          {cent_rows}
        ),
        dl AS (
          SELECT vec_id, de, cid AS lst FROM (
            SELECT vec_id, de, cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY vec_id ORDER BY list_distance(de, cv), cid
                   ) AS pr
            FROM d CROSS JOIN cents
          ) WHERE pr = 1
        ),
        ql AS (
          SELECT q_id, qe, cid AS lst FROM (
            SELECT q_id, qe, cid,
                   ROW_NUMBER() OVER (
                     PARTITION BY q_id ORDER BY list_distance(qe, cv), cid
                   ) AS pr
            FROM q CROSS JOIN cents
          ) WHERE pr <= 3
        ),
        ivf_ranked AS (
          SELECT q_id, vec_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY {cosine} DESC, vec_id
                 ) AS rank
          FROM dl JOIN ql USING (lst)
        )
        SELECT 'sign_lsh' AS method, q_id, vec_id,
               CAST(rank AS INTEGER) AS rank
        FROM lsh_ranked WHERE rank <= 10
        UNION ALL
        SELECT 'ivf' AS method, q_id, vec_id, CAST(rank AS INTEGER) AS rank
        FROM ivf_ranked WHERE rank <= 10
    """


def _stop_hits_sql() -> str:
    """Token-membership stopword count — same semantics as the Spark
    op (r3: the old ' w '-replacement trick undercounted consecutive
    stopwords because the shared delimiter space was consumed)."""
    from geomesa_sql_spark.ops.text import _STOPWORDS

    lst = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"w -> list_contains([{lst}], w)))"
    )


# ------------------------------------------------------------ driver surface


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial join + tile assignment over sf0.001."""
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side
    from geomesa_sql_spark.tiles import assign_tiles

    sf_dir = "/root/testdata/sf0.001"
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    joined = spatial_join(
        pts, polys, point_side("lon", "lat"), wkb_side("poly"),
        predicate="intersects", res=6, broadcast=True,
    )
    return (
        assign_tiles(joined, zoom=6)
        .groupBy("n_nationkey", "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries: the driver records at most 50 contract
    queries (CORRECTNESS_r01 silently dropped entries 51-52), so
    round-1's redundant pairs are merged (sql_st_xy+sql_st_dwithin →
    sql_st_xy_dist; phash → image_stats; simhash+lang_id →
    text_signals; ann_lsh+ann_ivf → ann_approx; minhash_near_dup+
    ngram_jaccard → near_dup_text) and the freed slots carry the new
    round-2 operators (buffered-expression join, RIGHT join,
    simplify/hull) — all 50 oracle-gated since round 3 (ann_approx,
    the last rows-only entry, now replays both approximate paths from
    splitmix-constant hyperplanes/centroids in DuckDB)."""
    return {
        "filter_range_like": q_filter_range_like,
        "project_prune": q_project_prune,
        "agg_group": q_agg_group,
        "agg_global": q_agg_global,
        "distinct_enum": q_distinct_enum,
        "merge_readback": q_merge_readback,
        "topk": q_topk,
        "fid_in": q_fid_in,
        "join_equi": q_join_equi,
        "join_theta_computed": q_join_theta_computed,
        "lookup_join": q_lookup_join,
        "join_semi_anti": q_join_semi_anti,
        "dbscan": q_dbscan,
        "set_ops": q_set_ops,
        "window_topn": q_window_topn,
        "json_extract": q_json_extract,
        "filter_null_forms": q_filter_null_forms,
        "events_hourly": q_events_hourly,
        "events_streamed": q_events_streamed,
        "sql_st_intersects": q_sql_st_intersects,
        "sql_st_xy_dist": q_sql_st_xy_dist,
        "sql_st_measures": q_sql_st_measures,
        "st_simplify_hull": q_st_simplify_hull,
        "st_within_shapes": q_st_within_shapes,
        "image_near_dup": q_image_near_dup,
        "st_dwithin": q_st_dwithin,
        "st_filter_wkb_rows": q_st_filter_wkb_rows,
        "spatial_join_pairs": q_spatial_join_pairs,
        "spatial_join_agg": q_spatial_join_agg,
        "spatial_join_dwithin": q_spatial_join_dwithin,
        "spatial_join_dwithin_poly": q_spatial_join_dwithin_poly,
        "spatial_join_left": q_spatial_join_left,
        "spatial_join_buffered": q_spatial_join_buffered,
        "spatial_join_right": q_spatial_join_right,
        "knn": q_knn,
        "tile_assign": q_tile_assign,
        "tile_pyramid": q_tile_pyramid,
        "tile_hilbert": q_tile_hilbert,
        "resize": q_resize,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "token_stats": q_token_stats,
        "seq_pack": q_seq_pack,
        "ann_topk": q_ann_topk,
        "embed_clusters": q_embed_clusters,
        "near_dup_text": q_near_dup_text,
        "text_signals": q_text_signals,
        "doc_fingerprints": q_doc_fingerprints,
        "ann_approx": q_ann_approx,
        "image_stats": q_image_stats,
    }


def oracle_sql() -> dict[str, str]:
    return _oracles()
