"""Distributed density clustering (DBSCAN) over point columns.

The reference has no clustering operator (it is a query adapter —
SURVEY.md §2), but its user base expects one: PostGIS ships
``ST_ClusterDBSCAN`` as a window function and GeoMesa pipelines
commonly densify / cluster before tiling. This is the engine-level
equivalent, designed for the 100 TB shape rather than a window over a
single partition:

- **Neighbor pairs** come from an eps-grid cell equi-join (the same
  3×3-neighbor trick as the stream-stream DWithin join,
  ``streaming/windowed.py``): each point lands in cell
  ``(floor(x/eps), floor(y/eps))``; the left side explodes to its 9
  neighbor cells and equi-joins the right side's home cell, so every
  ordered pair within ``eps`` appears exactly once and the only
  shuffle is keyed by grid cell — uniformly distributed unless the
  data is skewed, in which case AQE's skew-join split applies.
- **Core points** are a map-side partial ``groupBy(id).count()`` over
  the pair stream (|N_eps(p)| counts the point itself, matching the
  textbook definition).
- **Cluster labels** are connected components over the core-core
  subgraph: iterative min-label propagation with pointer jumping
  (label(p) ← label(label(p)) each round), which converges in
  O(log diameter) rounds instead of O(diameter). Each round is one
  keyed shuffle over the CORE subset only, with ``localCheckpoint``
  truncating the lineage so the plan does not grow with iterations
  (on a real cluster swap in ``checkpoint()`` against a reliable
  store for fault tolerance across rounds).
- **Border points** (non-core with ≥1 core neighbor) take the MIN
  core-neighbor label — deterministic tie-break, matching the DuckDB
  oracle; the classic DBSCAN "first scanner wins" assignment is
  scan-order-dependent and therefore not reproducible.

Labels are deterministic: a cluster's label is the minimum point id
among its core members. Noise rows get cluster = -1, role = 'noise'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighbor_pairs(pts: DataFrame, eps: float) -> DataFrame:
    """All ordered pairs (i, j), i != j, dist2(i, j) <= eps² — via the
    eps-grid 3×3 cell equi-join. Input ``pts``: (id, x, y)."""
    e = float(eps)
    cx = F.floor(F.col("x") / e).cast("long")
    cy = F.floor(F.col("y") / e).cast("long")

    nb = F.array(
        *[
            F.struct((cx + F.lit(dx)).alias("cx"), (cy + F.lit(dy)).alias("cy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    lhs = (
        pts.withColumn("__nb", F.explode(nb))
        .select(
            F.col("id").alias("i"),
            F.col("x").alias("xi"),
            F.col("y").alias("yi"),
            F.col("__nb.cx").alias("cx"),
            F.col("__nb.cy").alias("cy"),
        )
    )
    rhs = pts.select(
        F.col("id").alias("j"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    ddx = F.col("xi") - F.col("xj")
    ddy = F.col("yi") - F.col("yj")
    return (
        lhs.join(rhs, ["cx", "cy"])
        .filter((F.col("i") != F.col("j")) & (ddx * ddx + ddy * ddy <= F.lit(e * e)))
        .select("i", "j")
    )


def _connected_components(
    seeds: DataFrame, edges: DataFrame, max_iter: int
) -> DataFrame:
    """Min-label connected components. ``seeds``: (id); ``edges``:
    (i, j) symmetric. Returns (id, lab) with lab = min id in the
    component. Pointer jumping keeps rounds at O(log diameter)."""
    lab = seeds.select("id", F.col("id").alias("lab")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        cand = (
            edges.join(lab.withColumnRenamed("id", "j"), "j")
            .select(F.col("i").alias("id"), "lab")
        )
        new = lab.unionByName(cand).groupBy("id").agg(F.min("lab").alias("lab"))
        parent = new.select(F.col("id").alias("__pid"), F.col("lab").alias("__plab"))
        new = (
            new.join(parent, new["lab"] == parent["__pid"], "left")
            .select("id", F.coalesce("__plab", "lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab


def dbscan(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
    eps: float,
    min_pts: int,
    max_iter: int = 25,
) -> DataFrame:
    """DBSCAN over planar point columns.

    Returns (id BIGINT, cluster BIGINT, role STRING) — one row per
    input row with non-null key/x/y; cluster = min core id of the
    component (−1 for noise), role ∈ {core, border, noise}.
    """
    pts = (
        df.select(
            F.col(key).cast("long").alias("id"),
            F.col(x).cast("double").alias("x"),
            F.col(y).cast("double").alias("y"),
        )
        .filter(
            F.col("id").isNotNull() & F.col("x").isNotNull() & F.col("y").isNotNull()
        )
    )

    pairs = _neighbor_pairs(pts, eps).localCheckpoint(eager=True)

    deg = pairs.groupBy(F.col("i").alias("id")).agg(F.count("*").alias("__nnb"))
    core = (
        pts.join(deg, "id", "left")
        .filter(F.coalesce(F.col("__nnb"), F.lit(0)) + 1 >= F.lit(int(min_pts)))
        .select("id")
    )

    edges = (
        pairs.join(core.withColumnRenamed("id", "i"), "i", "left_semi")
        .join(core.withColumnRenamed("id", "j"), "j", "left_semi")
        .select("i", "j")
    )
    comp = _connected_components(core, edges, max_iter)

    # border = non-core point with >= 1 core neighbor; deterministic
    # assignment to the MIN core-neighbor cluster label.
    border = (
        pairs.join(core.withColumnRenamed("id", "i"), "i", "left_anti")
        .join(
            comp.select(F.col("id").alias("j"), F.col("lab").alias("__blab")), "j"
        )
        .groupBy(F.col("i").alias("id"))
        .agg(F.min("__blab").alias("__blab"))
    )

    return (
        pts.select("id")
        .join(comp.withColumnRenamed("lab", "__clab"), "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            F.coalesce("__clab", "__blab", F.lit(-1)).cast("long").alias("cluster"),
            F.when(F.col("__clab").isNotNull(), F.lit("core"))
            .when(F.col("__blab").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
