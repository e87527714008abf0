"""k-nearest-neighbour join.

Not in the reference core (its theta joins fall back to nested loop —
SURVEY.md §2.3); required by the north star (BASELINE.json:6 "kNN").

Strategy: the query set is small (it is a literal list or a tiny
DataFrame — the "left" of a kNN is human-issued probes), so broadcast
the queries, compute planar distances with pure Column arithmetic
(whole-stage codegen, no Python), and take top-k per query with a
window — Spark compiles rank-filter windows to a per-partition top-k
buffer, and the final shuffle carries only candidate survivors.

Scale path — :func:`knn_join_adaptive`: prune candidates to a bbox of
radius r around each query (a storage-pushable range predicate — at
10^12 rows this is the difference between scanning the world and
scanning a city), take the provisional top-k, and accept a query only
when its kth distance ≤ r (the circle of radius d_k then lies inside
the checked bbox, so no true neighbour can hide outside it); queries
that fail double r and retry — a driver-side loop over at most
log2(world/r0) rounds, each touching only the still-unsatisfied
queries. r0 comes from a global density estimate (area·k/n).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geomesa_sql_spark.geom.geodesic import (
    MAX_DISTANCE as _PI_R_MEAN,
)
from geomesa_sql_spark.geom.geodesic import (
    sphere_deg_bounds_cols,
)


def _sphere_prune_cond(
    x: str, y: str, qx: str, qy: str, r_m: float
) -> Column:
    """Column predicate: point (x,y) may lie within ``r_m`` metres of
    query (qx,qy) — the shared cap bounds (geodesic.sphere_deg_bounds_
    cols) with a CIRCULAR longitude difference, wrap-safe at ±180
    without box splitting. All plain Column arithmetic: whole-stage
    codegen, no Python."""
    dlat, dlon = sphere_deg_bounds_cols(F.col(qy), float(r_m))
    dl = F.abs(F.col(x) - F.col(qx))
    circ = F.least(dl, F.lit(360.0) - dl)
    return (circ <= dlon) & (F.abs(F.col(y) - F.col(qy)) <= F.lit(dlat))


def knn_join(
    points: DataFrame,
    queries: list[tuple[object, float, float]] | DataFrame,
    k: int,
    x: str = "lon",
    y: str = "lat",
    query_id: str = "query_id",
    qx: str = "qx",
    qy: str = "qy",
    prune_radius: float | None = None,
    metric: str = "planar",
) -> DataFrame:
    """For each query point, the k nearest rows of ``points``.

    Returns points columns + (query_id, dist, rank). Ties broken by the
    full point row order (dist, then all point columns) so results are
    deterministic. ``prune_radius``: optional bbox pre-filter radius —
    results are only complete if every query has ≥ k neighbours within
    it (the caller's density guess); None = exact brute force.

    ``metric='sphere'``: distances (and prune_radius) are METRES on the
    mean sphere (geom/geodesic.py) — ``dist`` comes out in metres, the
    prune is wrap-safe circular-longitude arithmetic, and nearest means
    nearest on the real earth, not in degree space.
    """
    spark = points.sparkSession
    if isinstance(queries, DataFrame):
        qdf = queries
    else:
        qdf = spark.createDataFrame(
            [(q[0], float(q[1]), float(q[2])) for q in queries], [query_id, qx, qy]
        )
    joined = points.crossJoin(F.broadcast(qdf))
    if prune_radius is not None:
        if metric == "sphere":
            joined = joined.filter(
                _sphere_prune_cond(x, y, qx, qy, float(prune_radius))
            )
        else:
            joined = joined.filter(
                (F.col(x) >= F.col(qx) - prune_radius)
                & (F.col(x) <= F.col(qx) + prune_radius)
                & (F.col(y) >= F.col(qy) - prune_radius)
                & (F.col(y) <= F.col(qy) + prune_radius)
            )
    if metric == "sphere":
        from geomesa_sql_spark.geom.geodesic import sphere_distance_cols

        with_dist = joined.withColumn(
            "dist",
            sphere_distance_cols(F.col(x), F.col(y), F.col(qx), F.col(qy)),
        )
    else:
        dx = F.col(x) - F.col(qx)
        dy = F.col(y) - F.col(qy)
        with_dist = joined.withColumn("dist", F.sqrt(dx * dx + dy * dy))
    order = [F.col("dist")] + [F.col(c) for c in points.columns]
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        with_dist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop(qx, qy)
    )


def knn_join_adaptive(
    points: DataFrame,
    queries: list[tuple[object, float, float]] | DataFrame,
    k: int,
    x: str = "lon",
    y: str = "lat",
    query_id: str = "query_id",
    qx: str = "qx",
    qy: str = "qy",
    r0: float | None = None,
    max_rounds: int = 12,
    world: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    large_query_threshold: int = 1000,
    metric: str = "planar",
) -> DataFrame:
    """Exact kNN via expanding-radius bbox pruning (the 100 TB path).

    Same result as :func:`knn_join` (asserted in tests); the bbox
    predicate is plain Column arithmetic, so with a cell-clustered
    layout (io.layout.write_geo_table) it prunes at the parquet
    row-group level instead of scanning every point.

    A DataFrame query set larger than ``large_query_threshold``
    dispatches to :func:`knn_join_cells` — the driver loop below
    collects ≤ k·|active| rows per round, which is right for a
    handful of probes and wrong for 10⁵ of them (VERDICT r2 #7).
    The dispatch reads Catalyst plan statistics (zero jobs — the same
    decision spatial_join's broadcast path uses; r4 verdict #5 killed
    the eager ``limit(n+1).count()`` probe), so the threshold is a
    ~100-bytes/row size budget, not an exact row count; unknown stats
    take the cells path, the safe default at scale.
    """
    spark = points.sparkSession
    if isinstance(queries, DataFrame):
        from geomesa_sql_spark.join.spatial import _should_broadcast

        if not _should_broadcast(queries, large_query_threshold):
            if metric != "sphere":
                return knn_join_cells(
                    points, queries, k, x, y, query_id, qx, qy, world=world
                )
            # metric='sphere' has no cells fallback (planar-degree
            # grid only so far), and _should_broadcast also returns
            # False when plan STATS are merely unavailable — a tiny
            # query set must not hard-fail on a stats quirk (r5
            # review). Fall through to the capped collect below: a
            # genuinely small set proceeds on the driver path, real
            # overflow still raises loudly there.
            pass
        # Belt-and-suspenders row cap (r5 review): sizeInBytes is the
        # COMPRESSED size for a parquet-backed frame, so a highly
        # compressible million-row query table can slip under the
        # stats budget. The stats decision stays zero-job; this cap
        # rides the collect the driver path was about to do anyway,
        # and overflow re-routes to the cells path instead of pulling
        # an unbounded query set onto the driver.
        cap = max(large_query_threshold, 1) * 10
        collected = queries.limit(cap + 1).collect()
        if len(collected) > cap:
            if metric == "sphere":
                raise NotImplementedError(
                    "metric='sphere' with a large query set: the "
                    "cells path is planar-degree only so far — batch "
                    "the queries through the driver path, or use the "
                    "dwithin_sphere spatial join + a rank window"
                )
            return knn_join_cells(
                points, queries, k, x, y, query_id, qx, qy, world=world
            )
        qrows = [(r[0], float(r[1]), float(r[2])) for r in collected]
    else:
        qrows = [(q[0], float(q[1]), float(q[2])) for q in queries]

    if not qrows:
        # empty query set: empty result with the output schema — keep
        # the caller's query_id TYPE when queries came as a DataFrame
        # (a fabricated int row would pin it to bigint)
        empty_q = (
            queries.limit(0)
            if isinstance(queries, DataFrame)
            else [(0, 0.0, 0.0)]
        )
        return knn_join(points.limit(0), empty_q, k, x, y, query_id, qx, qy)

    if r0 is None:
        # density guess: radius of a square expected to hold ~4k points
        n = max(points.count(), 1)
        if metric == "sphere":
            area = 4.0 * math.pi * (_PI_R_MEAN / math.pi) ** 2  # m²
        else:
            area = (world[2] - world[0]) * (world[3] - world[1])
        r0 = max((area * 4.0 * k / n) ** 0.5 / 2.0, 1e-9)

    # The output is bounded by k·|queries| rows, so each round's top-k is
    # COLLECTED once (acceptance stats computed driver-side from the same
    # rows) and the result returns as a local relation. One Spark job per
    # round instead of three — the per-round agg job, and the re-execution
    # of every round's window plan at the caller's first action, both
    # disappear (the old shape cost ~3× the brute join cold at local[32]).
    done_rows: list = []
    out_schema = None
    active = qrows
    r = r0
    for _ in range(max_rounds):
        if not active:
            break
        qdf = spark.createDataFrame(active, [query_id, qx, qy])
        if metric == "sphere":
            from geomesa_sql_spark.geom.geodesic import sphere_distance_cols

            cand = points.crossJoin(F.broadcast(qdf)).filter(
                _sphere_prune_cond(x, y, qx, qy, r)
            )
            with_dist = cand.withColumn(
                "dist",
                sphere_distance_cols(
                    F.col(x), F.col(y), F.col(qx), F.col(qy)
                ),
            )
        else:
            cand = points.crossJoin(F.broadcast(qdf)).filter(
                (F.col(x) >= F.col(qx) - r)
                & (F.col(x) <= F.col(qx) + r)
                & (F.col(y) >= F.col(qy) - r)
                & (F.col(y) <= F.col(qy) + r)
            )
            dx = F.col(x) - F.col(qx)
            dy = F.col(y) - F.col(qy)
            with_dist = cand.withColumn("dist", F.sqrt(dx * dx + dy * dy))
        order = [F.col("dist")] + [F.col(c) for c in points.columns]
        w = Window.partitionBy(query_id).orderBy(*order)
        topk = (
            with_dist.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop(qx, qy)
        )
        out_schema = topk.schema
        rows = topk.collect()  # ≤ k × |active| rows
        by_q: dict = {}
        for row in rows:
            by_q.setdefault(row[query_id], []).append(row)
        if metric == "sphere":
            # r past the half-circumference: every point's haversine
            # distance ≤ π·R ≤ r, and the prune bands are full-span
            world_covered = r >= _PI_R_MEAN
        else:
            world_covered = (
                r >= (world[2] - world[0]) and r >= (world[3] - world[1])
            )
        ok_ids = set()
        for qid, qhits in by_q.items():
            dk = max(h["dist"] for h in qhits)
            if (len(qhits) >= k and dk <= r) or world_covered:
                ok_ids.add(qid)
        if world_covered:
            ok_ids |= {q[0] for q in active}
        for qid in ok_ids:
            done_rows.extend(by_q.get(qid, []))
        active = [q for q in active if q[0] not in ok_ids]
        r *= 2.0
    if active:
        # max_rounds exhausted: brute-force the stragglers exactly
        straggler = knn_join(
            points, active, k, x, y, query_id, qx, qy, metric=metric
        )
        out_schema = straggler.schema
        done_rows.extend(straggler.collect())
    return spark.createDataFrame(done_rows, out_schema)


def knn_join_cells(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    x: str = "lon",
    y: str = "lat",
    query_id: str = "query_id",
    qx: str = "qx",
    qy: str = "qy",
    cell: float | None = None,
    max_rounds: int = 6,
    world: tuple[float, float, float, float] = (-180.0, -90.0, 180.0, 90.0),
    checkpoint: bool = True,
) -> DataFrame:
    """Exact kNN for LARGE query sets (VERDICT r2 #7).

    :func:`knn_join_adaptive`'s driver loop collects ≤ k·|active| rows
    per round — right for 3 probes, wrong for 10⁵ query points. Here
    BOTH sides are cell-encoded and each round is a plain distributed
    plan: queries replicate to their Chebyshev-m cell ring, candidates
    arrive via a (ccx, ccy) equi-join against point home cells, a
    per-query window takes the top-k, and a query is accepted exactly
    when its kth distance fits inside the PER-QUERY covered radius
    (distance from the query to the boundary of its ring block — the
    circle of radius d_k then lies fully inside the gathered cells, so
    no true neighbour is missed). Acceptance stats ride the SAME
    query-keyed shuffle as the rank window (window aggregates, no
    extra exchange); the only driver work is one count() per round.
    Stragglers double the ring; anything left after ``max_rounds``
    brute-forces via :func:`knn_join` (by then the active set is a
    handful of world-edge queries).

    Returns the :func:`knn_join` schema: points columns +
    (query_id, dist, rank). Deterministic: ties break on
    (dist, *points columns).
    """
    spark = points.sparkSession
    ck = (
        (lambda df: df.localCheckpoint(eager=True))
        if checkpoint
        else (lambda df: df)
    )  # checkpoint=False keeps round plans inspectable (plan tests)
    # accepted-side checkpoints are LAZY (r6, guide §1.2/§2.4): they
    # persist + truncate lineage like before, but materialize INSIDE
    # the round's eager `active` checkpoint job (accepted → done_ids →
    # anti-join → active is one lineage) instead of as their own
    # barrier jobs — the 10k-query key is barrier-dominated, not
    # compute-dominated. `active` itself stays EAGER: the round-top
    # isEmpty probe on a lazy frame would materialize the whole round
    # via take(1)'s escalating partial scans (measured slower).
    ck_lazy = (
        (lambda df: df.localCheckpoint(eager=False))
        if checkpoint
        else (lambda df: df)
    )
    if cell is None:
        # a (2m+1)-cell block should hold ≳ 9k points in round 1
        n = max(points.count(), 1)
        area = (world[2] - world[0]) * (world[3] - world[1])
        cell = max((area * float(k) / n) ** 0.5, 1e-9)

    pts = points.withColumn(
        "__pcx", F.floor(F.col(x) / F.lit(cell)).cast("long")
    ).withColumn("__pcy", F.floor(F.col(y) / F.lit(cell)).cast("long"))

    active = queries.select(
        query_id,
        F.col(qx).cast("double").alias(qx),
        F.col(qy).cast("double").alias(qy),
        F.floor(F.col(qx) / F.lit(cell)).cast("long").alias("__qcx"),
        F.floor(F.col(qy) / F.lit(cell)).cast("long").alias("__qcy"),
    )
    active = ck(active)

    out_parts: list[DataFrame] = []
    m = 1
    for _ in range(max_rounds):
        if active.isEmpty():
            break
        # the ring reaches m cells FROM each query's home cell, so it
        # is guaranteed to cover every point cell only when m·cell
        # exceeds the full world extent plus a cell of floor slack on
        # each side (review r3: comparing the block DIAMETER against
        # the world width accepted far-edge queries while their
        # candidate cells were still outside the ring)
        reach = m * cell
        world_covered = (
            reach >= (world[2] - world[0]) + 2 * cell
            and reach >= (world[3] - world[1]) + 2 * cell
        )
        offs = [(dx, dy) for dx in range(-m, m + 1) for dy in range(-m, m + 1)]
        rep = active.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("__qcx") + F.lit(dx)).alias("cx"),
                            (F.col("__qcy") + F.lit(dy)).alias("cy"),
                        )
                        for dx, dy in offs
                    ]
                )
            ).alias("__c"),
        ).select(
            query_id, qx, qy, "__qcx", "__qcy",
            F.col("__c.cx").alias("__pcx"), F.col("__c.cy").alias("__pcy"),
        )
        cand = rep.join(pts, ["__pcx", "__pcy"])
        dx_ = F.col(x) - F.col(qx)
        dy_ = F.col(y) - F.col(qy)
        # covered radius: distance from q to the edge of its ring
        # block — a per-query CONSTANT, so compute it on the map side
        # and drop (qx, qy, __qcx, __qcy) BEFORE the window exchange:
        # the window shuffle carries (id, dist, __rg, points cols)
        # instead of four extra doubles/longs per candidate row
        # (guide §2.3, project before the exchange)
        rguar = F.least(
            F.col(qx) - (F.col("__qcx") - m) * F.lit(cell),
            (F.col("__qcx") + m + 1) * F.lit(cell) - F.col(qx),
            F.col(qy) - (F.col("__qcy") - m) * F.lit(cell),
            (F.col("__qcy") + m + 1) * F.lit(cell) - F.col(qy),
        )
        # column order preserved vs the pre-r6 shape: after the __rg/
        # flag drops the output is (query_id, *points cols, dist, rank)
        with_dist = cand.select(
            query_id,
            rguar.alias("__rg"),
            *[F.col(c) for c in points.columns],
            F.sqrt(dx_ * dx_ + dy_ * dy_).alias("dist"),
        )
        order = [F.col("dist")] + [F.col(c) for c in points.columns]
        w = Window.partitionBy(query_id).orderBy(*order)
        wq = Window.partitionBy(query_id)
        topk = (
            with_dist.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .withColumn("__nq", F.count(F.lit(1)).over(wq))
            .withColumn("__dk", F.max("dist").over(wq))
            # STRICT <: a point exactly on the ring-block edge sits in
            # an ungathered cell at distance == rguar and could win the
            # deterministic tie-break (review r3)
            .withColumn("__ok", (F.col("__nq") >= k) & (F.col("__dk") < F.col("__rg")))
        )
        if world_covered:
            topk = topk.withColumn("__ok", F.lit(True))
        accepted = topk.filter("__ok").drop("__rg", "__nq", "__dk", "__ok")
        accepted = ck_lazy(accepted)
        out_parts.append(accepted)
        if world_covered:
            active = ck(active.limit(0))
            break
        done_ids = accepted.select(query_id).distinct()
        active = ck(active.join(done_ids, query_id, "left_anti"))
        m *= 2
    if not active.isEmpty():
        out_parts.append(
            knn_join(
                points,
                active.select(query_id, qx, qy),
                k, x, y, query_id, qx, qy,
            )
        )
    if not out_parts:
        return knn_join(points.limit(0), queries.limit(0), k, x, y,
                        query_id, qx, qy)
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out
