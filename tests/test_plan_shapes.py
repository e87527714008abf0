"""Physical-plan shape assertions — the analog of the reference's
EXPLAIN regex tests (GeoMesaCalciteTestUtils.scala:41-52, used ~100×):
required/forbidden operators in the executed plan, re-expressed for
Catalyst (SURVEY.md §5.3: "plan assertions become physical-plan
assertions")."""

from pyspark.sql import functions as F

from geomesa_sql_spark.io.fixtures import nation_squares, orders_points
from geomesa_sql_spark.join import knn_join, spatial_join
from geomesa_sql_spark.join.spatial import point_side, wkb_side
from geomesa_sql_spark.plan import spatial_filter

RECT = "POLYGON ((-10.005 -10.005, 50.005 -10.005, 50.005 40.005, -10.005 40.005, -10.005 -10.005))"
PENTA = "POLYGON ((-40.0037 -20.0013, 30.0041 -45.0029, 80.0017 10.0023, 20.0031 60.0019, -55.0043 25.0037))"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rectangle_filter_has_no_python_refine(spark, sf_dir):
    """Rectangle predicate ≡ bbox — no refine UDF may appear (the
    analog of 'no EnumerableCalc above the scan',
    FilterTest.scala:249-262 inverted)."""
    pts = orders_points(spark, sf_dir)
    plan = _plan(spatial_filter(pts, "intersects", RECT, x="lon", y="lat"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pentagon_filter_has_exactly_one_refine(spark, sf_dir):
    pts = orders_points(spark, sf_dir)
    plan = _plan(spatial_filter(pts, "intersects", PENTA, x="lon", y="lat"))
    assert plan.count("ArrowEvalPython") == 1


def test_point_cell_encode_stays_jvm(spark, sf_dir):
    """The billion-row side's cell encode must not be a Python stage —
    and the whole point×rect broadcast join plan needs at most the one
    refine UDF."""
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    j = spatial_join(
        pts, polys, point_side("lon", "lat"), wkb_side("poly"),
        predicate="intersects", res=6, broadcast=True,
    )
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    # Python stages: the fused right-side env+cover and the refine —
    # never an encode stage on the big (left/point) side of the BHJ
    left_side = plan.split("BroadcastExchange")[0]
    assert "ArrowEvalPython" not in left_side.split("BroadcastHashJoin")[-1]


def test_spatial_join_repartition_shuffles_on_cell(spark, sf_dir):
    """Two-large-sides plan: with auto-broadcast off (as it would be for
    a genuinely big right side), both sides shuffle on the cell key."""
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    polys = nation_squares(spark, sf_dir).select("n_nationkey", "poly")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=False,
        )
        plan = _plan(j)
        assert "BroadcastHashJoin" not in plan
        assert "hashpartitioning(__gsj_cell" in plan
        # result parity with the broadcast path on the same input
        jb = spatial_join(
            pts, polys, point_side("lon", "lat"), wkb_side("poly"),
            predicate="intersects", res=6, broadcast=True,
        )
        assert j.count() == jb.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_topk_uses_take_ordered(spark, sf_dir):
    df = (
        orders_points(spark, sf_dir)
        .orderBy(F.desc("o_totalprice"))
        .select("o_orderkey")
        .limit(10)
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_knn_has_partial_window_group_limit(spark, sf_dir):
    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    plan = _plan(knn_join(pts, [(1, 0.0, 0.0)], k=5))
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_ann_dot_product_stays_jvm(spark, sf_dir):
    from geomesa_sql_spark.ops import cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.limit(1).select(
        F.lit(0).alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    plan = _plan(cosine_topk(e, q, k=5))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_projection_prunes_bytes_from_scan(spark):
    """Payload discipline: a query not touching `bytes` must not read
    it (ReadSchema excludes the binary column)."""
    from geomesa_sql_spark.io.fixtures import images_table

    path = "/tmp/spark_graft_plan_imgs"
    import os

    if not os.path.exists(f"{path}/_SUCCESS"):
        images_table(spark, 200, size=8).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select("image_id", "lon", "lat")
    plan = _plan(df)
    rs = plan.split("ReadSchema:")[1]
    assert "bytes" not in rs and "caption" not in rs


def test_broadcast_decision_runs_no_job(spark, sf_dir):
    """VERDICT r01 next.8: broadcast=None must decide from Catalyst plan
    statistics (file-size-derived sizeInBytes), not an eager scan-shaped
    probe job — at 100 TB a limit+count of the right side is a real scan."""
    from geomesa_sql_spark.join.spatial import _should_broadcast

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("bcast_probe", "probe")
    try:
        small = _should_broadcast(df, 2_000_000)
        big = _should_broadcast(df, 1)
    finally:
        sc.setJobGroup(None, None)
    assert small is True and big is False
    assert list(sc.statusTracker().getJobIdsForGroup("bcast_probe")) == []


def test_knn_adaptive_dispatch_runs_no_job(spark, sf_dir):
    """r4 verdict #5: knn_join_adaptive's small-vs-large dispatch must
    decide from Catalyst plan stats (like _should_broadcast), never an
    eager limit().count() probe job."""
    from geomesa_sql_spark.join import knn as knn_mod

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    q = spark.range(50_000).select(
        F.col("id").alias("query_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0).alias("qx"),
        ((F.col("id") * 104729 % 1700) / 10.0 - 85.0).alias("qy"),
    )

    class _Routed(Exception):
        pass

    def _sentinel(*a, **kw):
        raise _Routed

    orig = knn_mod.knn_join_cells
    sc = spark.sparkContext
    knn_mod.knn_join_cells = _sentinel
    sc.setJobGroup("knn_dispatch", "probe")
    try:
        import pytest as _pytest

        with _pytest.raises(_Routed):
            knn_mod.knn_join_adaptive(pts, q, k=3)
    finally:
        knn_mod.knn_join_cells = orig
        sc.setJobGroup(None, None)
    assert list(sc.statusTracker().getJobIdsForGroup("knn_dispatch")) == []


def test_knn_cells_no_cartesian(spark, sf_dir):
    """r3: the large-query-set kNN is a cell equi-join — no
    BroadcastNestedLoop/cartesian anywhere, and the per-query rank
    window still gets the partial top-k pushdown."""
    from geomesa_sql_spark.join.knn import knn_join_cells

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    q = spark.range(2000).select(
        F.col("id").alias("query_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0).alias("qx"),
        ((F.col("id") * 104729 % 1700) / 10.0 - 85.0).alias("qy"),
    )
    out = knn_join_cells(pts, q, k=3, max_rounds=1, checkpoint=False)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """r3: the benchmark shingle set rides a broadcast join — the
    corpus text never shuffles (only (id, hash) pairs reach the
    count exchange)."""
    from geomesa_sql_spark.ops import contaminated_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.limit(5).select("text")
    out = contaminated_ids(docs, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


def test_bucketed_layout_joins_and_aggs_without_exchange(spark, sf_dir, tmp_path):
    """write_bucketed: the shuffle is paid once at write; a same-key
    same-bucket-count equi-join then plans as SortMergeJoin with NO
    Exchange on either side, and a groupBy on the bucket key
    aggregates without a shuffle (the persisted analog of the
    reference's attribute-index lookup join,
    GeoMesaIndexLookupJoinRule.scala:30-82)."""
    from geomesa_sql_spark.io.layout import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = write_bucketed(
            orders, "orders_bkt", str(tmp_path / "ob"), "o_custkey", buckets=8
        )
        cb = write_bucketed(
            cust, "cust_bkt", str(tmp_path / "cb"), "c_custkey", buckets=8
        )
        j = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-hashed on disk
        assert "Bucketed: true" in plan
        # row parity with the plain (shuffling) join
        assert j.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()

        agg = ob.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        assert "Exchange" not in _plan(agg)
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS cust_bkt")


def test_knn_adaptive_row_cap_reroutes_compressible_queries(spark, sf_dir):
    """r5 review: Catalyst sizeInBytes is the COMPRESSED size for a
    parquet-backed frame, so a highly compressible huge query table
    can slip under the stats budget and pass _should_broadcast. The
    driver path's collect is now capped (10× the threshold); overflow
    re-routes to the cells path instead of collecting unbounded."""
    from geomesa_sql_spark.join import knn as knn_mod
    from geomesa_sql_spark.join import spatial as spatial_mod

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    q = spark.range(500).select(
        F.col("id").alias("query_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0).alias("qx"),
        ((F.col("id") * 104729 % 1700) / 10.0 - 85.0).alias("qy"),
    )

    class _Routed(Exception):
        pass

    def _sentinel(*a, **kw):
        raise _Routed

    orig_cells = knn_mod.knn_join_cells
    orig_bcast = spatial_mod._should_broadcast
    # force the under-estimate: stats say "small" for a 500-row set
    spatial_mod._should_broadcast = lambda df, budget: True
    knn_mod.knn_join_cells = _sentinel
    try:
        import pytest as _pytest

        with _pytest.raises(_Routed):
            # threshold 10 → cap 100 < 500 rows → must re-route
            knn_mod.knn_join_adaptive(pts, q, k=3, large_query_threshold=10)
    finally:
        knn_mod.knn_join_cells = orig_cells
        spatial_mod._should_broadcast = orig_bcast
