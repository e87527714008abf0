"""Distributed density clustering (DBSCAN) over point columns.

The reference has no clustering operator (it is a query adapter —
SURVEY.md §2), but its user base expects one: PostGIS ships
``ST_ClusterDBSCAN`` as a window function and GeoMesa pipelines
commonly cluster before tiling. This is the engine-level equivalent,
built on the standard scale-out decomposition (MR-DBSCAN / RDD-DBSCAN
lineage): **partition-local clustering with eps-halo replication, then
a tiny global label-merge** — NOT a relational all-pairs pipeline. A
naive eps-join materializes Θ(n·density) neighbor pairs, which at
dense spots is quadratic: ~25k points in a 2°×2° blob with eps=0.5 is
~400M pair rows for one blob. This design never materializes pairs:

1. **Replicate** every point to its home coarse cell (side ``S``, a
   multiple of eps) plus any neighbor coarse cell within ``2·eps`` of
   it (replication overhead ≈ 8·eps/S in 2-D, 12·eps/S in 3-D). This
   is the ONLY shuffle in the whole operator — uniformly spread unless
   the data is skewed, in which case shrink ``S`` (more, smaller
   partitions).
2. **Fused local pass** — per coarse cell, ONE ``applyInPandas`` call
   computes core flags AND local components. The 2·eps halo means
   every point within eps of the cell has its full eps-ball present,
   so core status (|N_eps| ≥ min_pts, counting the point itself) is
   exact for exactly the points the clustering consumes. Inside a
   partition a fine grid of side eps/√dim makes every same-fine-cell
   pair ≤ eps, so any fine cell with ≥ min_pts points is all-core with
   zero distance computations (the dense-blob fast path); only points
   in sparse fine cells compare against their ≤ 5^dim neighbor fine
   cells. Then union-find over the eps-membership core points —
   same-cell cores unioned for free, nearby fine-cell pairs probed
   with chunked numpy distance blocks. Every true core-core edge
   (dist ≤ eps) has both endpoints inside at least one partition (each
   endpoint is in the other's halo), so it is seen somewhere.
   Partitions emit (core id, local component label = min local core
   id); a core point replicated into k partitions emits k labels.
   (r6: formerly two passes — a core-flag shuffle, an id-join to ship
   flags back, and a second clustering shuffle; fused per guide §2.4.)
4. **Global merge** — labels of the same physical point are
   equivalent; the label-equivalence graph has one node per LOCAL
   COMPONENT (≈ clusters × partitions touched — tiny, independent of
   n), closed with the pointer-jumping min-label connected-components
   used below (O(log diameter) rounds on a trivially small input).
5. **Borders** — pass 2 also emits, for each OWN non-core point, the
   local labels of its core neighbors (exact: all of them are in the
   partition); after the merge the border takes the MIN resolved
   label — deterministic, matching the DuckDB oracle (the classic
   "first scanner wins" assignment is scan-order-dependent and
   therefore not reproducible).

Labels are deterministic: a cluster's label is the minimum point id
among its core members. Noise rows get cluster = -1, role = 'noise'.

**Geodesic mode** (``metric='sphere'``): x/y are lon/lat degrees and
``eps`` is metres on the same mean-radius sphere as
``ST_DistanceSphere``. Points embed as 3-D chord coordinates
R·(cosφcosλ, cosφsinλ, sinφ); great-circle distance d and chord
distance c = 2R·sin(d/2R) are monotone bijections of each other on
[0, πR], so Euclidean DBSCAN in the embedding with
eps_chord = 2R·sin(eps/2R) is EXACTLY geodesic DBSCAN — including
clusters straddling the antimeridian and sitting on the poles, with
zero wrap special-casing (the planar-degrees grid would split both).
The same grid machinery runs in 3-D: fine side eps/√3 (cube diagonal
= eps keeps the same-cell ⇒ within-eps shortcut), neighbor offsets
±2 per axis (Σ max(0,|dᵢ|-1)² ≤ 3 bounds the reachable boxes; the
(2,2,2) corner attains exactly eps, kept by the inclusive predicate).
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


#: coordinate column → coarse-cell column, in axis order; the slice
#: actually present in a frame decides the grid dimension (2-D planar
#: or the 3-D chordal embedding of metric='sphere')
_CELL_COLS = {"x": "ccx", "y": "ccy", "z": "ccz"}


def _dims(cols) -> tuple[str, ...]:
    return ("x", "y", "z") if "z" in cols else ("x", "y")


def _replicate_to_cells(
    pts: DataFrame, s: float, eps: float, halo: int = 1
) -> DataFrame:
    """Each point → its home coarse cell plus every neighbor coarse
    cell whose region is within ``halo·eps`` of it; ``own`` marks the
    home copy. Covering [x-halo·eps, x+halo·eps] (per axis) with cell
    floors is exact: a cell can contain a point within the halo of the
    point only if its index is between floor((x-halo·eps)/S) and
    floor((x+halo·eps)/S), and stepping the offset by eps hits every
    integer in that range because S >= 2·eps >= eps. Runs in 2-D or
    (when a ``z`` column is present) 3-D.

    The candidate product is built per axis (distinct floors, then a
    nested-``transform`` cross product) so codegen pays O(offsets·dim)
    floor evaluations per row, not O(offsets^dim·dim)."""
    dims = _dims(pts.columns)
    offs = [i * eps for i in range(-halo, halo + 1)]
    ax = {
        d: F.array_distinct(
            F.array(
                *[
                    F.floor((F.col(d) + F.lit(o)) / F.lit(s)).cast("long")
                    for o in offs
                ]
            )
        )
        for d in dims
    }
    if len(dims) == 2:
        cands = F.flatten(
            F.transform(
                ax["x"],
                lambda a: F.transform(
                    ax["y"], lambda b: F.struct(a.alias("ccx"), b.alias("ccy"))
                ),
            )
        )
    else:
        cands = F.flatten(
            F.flatten(
                F.transform(
                    ax["x"],
                    lambda a: F.transform(
                        ax["y"],
                        lambda b: F.transform(
                            ax["z"],
                            lambda c: F.struct(
                                a.alias("ccx"), b.alias("ccy"), c.alias("ccz")
                            ),
                        ),
                    ),
                )
            )
        )
    own = None
    for d in dims:
        home = F.floor(F.col(d) / F.lit(s)).cast("long")
        term = F.col(_CELL_COLS[d]) == home
        own = term if own is None else (own & term)
    return (
        pts.withColumn("__cand", F.explode(cands))
        .select(
            "*",
            *[F.col(f"__cand.{_CELL_COLS[d]}").alias(_CELL_COLS[d]) for d in dims],
        )
        .withColumn("own", own)
        .drop("__cand")
    )


def _fine_buckets(xs: np.ndarray, ys: np.ndarray, g: float, zs=None):
    """Group local point indices by fine cell; returns the
    cell→indices dict keyed by 2- or 3-tuples. Lexsort + boundary
    split: O(n log n) numpy and O(#buckets) Python, instead of the
    former O(n) Python append loop."""
    fx = np.floor(xs / g).astype(np.int64)
    fy = np.floor(ys / g).astype(np.int64)
    cols = [fx, fy]
    if zs is not None:
        cols.append(np.floor(zs / g).astype(np.int64))
    n = len(xs)
    if n == 0:
        return {}
    order = np.lexsort(cols[::-1])
    stacked = np.stack([c[order] for c in cols], axis=1)
    change = np.any(stacked[1:] != stacked[:-1], axis=1)
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    return {
        tuple(int(v) for v in stacked[s]): order[s:e]
        for s, e in zip(starts, ends)
    }


# fine-cell offsets whose box-to-box min distance can be <= eps when
# the fine side is eps/sqrt(dim): per-axis offsets |d| <= 2, because
# the boxes' min distance is sqrt(sum max(0,|d_i|-1)^2)·g and the
# reachability bound is sum max(0,|d_i|-1)^2 <= dim (the all-2s corner
# attains exactly eps at touching corners — inclusive predicate keeps
# it; any |d_i| = 3 contributes 4 > dim alone).
_FINE_OFFS = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)]
_FINE_FWD = [(dx, dy) for (dx, dy) in _FINE_OFFS if (dx, dy) > (0, 0)]
_FINE_OFFS_3 = [
    (dx, dy, dz)
    for dx in range(-2, 3)
    for dy in range(-2, 3)
    for dz in range(-2, 3)
]
_FINE_FWD_3 = [o for o in _FINE_OFFS_3 if o > (0, 0, 0)]


def _fine_grid(eps: float, dim: int):
    """(fine cell side, all offsets, forward offsets) for a grid whose
    same-cell diagonal is exactly eps."""
    g = eps / math.sqrt(float(dim))
    if dim == 2:
        return g, _FINE_OFFS, _FINE_FWD
    return g, _FINE_OFFS_3, _FINE_FWD_3


def _key_add(k: tuple, off: tuple) -> tuple:
    return tuple(a + b for a, b in zip(k, off))



# cap on float64 elements per distance block (~16 MB): keeps any
# cross-cell probe's peak allocation bounded no matter how dense a
# fine cell gets (a skewed coarse cell can put thousands of points in
# one fine cell; an unchunked |a|x|b| matrix would then be GBs)
_DIST_BLOCK = 1 << 21


def _d2_block_rows(n_b: int) -> int:
    return max(1, _DIST_BLOCK // max(n_b, 1))


def _d2_rows(xs, ys, zs, a, b) -> np.ndarray:
    """Squared distances between index blocks a × b (2-D or 3-D)."""
    d2 = (xs[a][:, None] - xs[b][None, :]) ** 2 + (
        ys[a][:, None] - ys[b][None, :]
    ) ** 2
    if zs is not None:
        d2 += (zs[a][:, None] - zs[b][None, :]) ** 2
    return d2


def _count_within(xs, ys, zs, ia, ib, e2) -> np.ndarray:
    """Per-ia count of ib-points within sqrt(e2) — row-blocked."""
    out = np.zeros(len(ia), dtype=np.int64)
    if not len(ib):
        return out
    step = _d2_block_rows(len(ib))
    for s0 in range(0, len(ia), step):
        blk = ia[s0 : s0 + step]
        out[s0 : s0 + step] = (_d2_rows(xs, ys, zs, blk, ib) <= e2).sum(axis=1)
    return out


def _any_within(xs, ys, zs, ia, ib, e2) -> bool:
    """Does ANY (ia, ib) pair sit within sqrt(e2)? Row-blocked with
    early exit — the common dense-adjacent-cell case hits in the
    first block."""
    if not len(ia) or not len(ib):
        return False
    step = _d2_block_rows(len(ib))
    for s0 in range(0, len(ia), step):
        if (_d2_rows(xs, ys, zs, ia[s0 : s0 + step], ib) <= e2).any():
            return True
    return False


def _core_flags(
    xs: np.ndarray, ys: np.ndarray, eps: float, min_pts: int, zs=None,
    only: np.ndarray | None = None,
) -> np.ndarray:
    """Exact |N_eps(p)| >= min_pts per local point (self counted).
    Dense fine cells (>= min_pts points) shortcut to all-core.
    ``only``: optional bool mask — flags are only needed (and only
    guaranteed exact) for masked points; unmasked points still count
    as neighbors but may skip their own distance probes."""
    dim = 2 if zs is None else 3
    g, offs, _ = _fine_grid(eps, dim)
    buckets = _fine_buckets(xs, ys, g, zs)
    core = np.zeros(len(xs), dtype=bool)
    e2 = eps * eps
    zero = (0,) * dim
    for k, idx in buckets.items():
        if len(idx) >= min_pts:
            core[idx] = True
            continue
        want = idx if only is None else idx[only[idx]]
        if not len(want):
            continue
        cnt = np.full(len(want), len(idx), dtype=np.int64)  # own cell + self
        for off in offs:
            if off == zero:
                continue
            nb = buckets.get(_key_add(k, off))
            if nb is None:
                continue
            cnt += _count_within(xs, ys, zs, want, nb, e2)
        core[want] = cnt >= min_pts
    return core


class _UF:
    """Array union-find with path halving; roots resolve to min id via
    a final pass keyed by component."""

    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, a: int) -> int:
        p = self.p
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _local_cluster(
    pdf: pd.DataFrame, eps: float, s: float, min_pts: int
) -> pd.DataFrame:
    """FUSED kernel: one coarse cell's own + 2·eps-halo points.

    Core flags are computed IN this pass — under the 2·eps replication
    halo, every point within eps of the cell region has its entire
    eps-ball present, so |N_eps| is exact for exactly the points the
    clustering logic consumes (the eps-membership "inner" set, the same
    membership the former two-pass shape shuffled twice to assemble).
    The former pass 1 (separate core-flag shuffle + applyInPandas) and
    the pts⋈flags id-join are gone: one shuffle, one Python stage.

    Emits (unchanged contract)
      kind='corelab': (id, lab, own) for every inner core point;
      kind='border' : (id, lab) per distinct core-neighbor label of an
                      OWN non-core point;
      kind='noise'  : (id, -1) for own points with no core neighbor.
    lab = min local core id of the local component."""
    ids = pdf["id"].to_numpy(dtype=np.int64)
    xs = pdf["x"].to_numpy(dtype=np.float64)
    ys = pdf["y"].to_numpy(dtype=np.float64)
    zs = pdf["z"].to_numpy(dtype=np.float64) if "z" in pdf.columns else None
    own = pdf["own"].to_numpy(dtype=bool)
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {c: [] for c in ("id", "kind", "lab", "own", "ccx", "ccy")}
            | ({"ccz": []} if zs is not None else {})
        )
    # eps-membership ("inner"): the exact floor-range test the former
    # eps-halo replication used as its cell cover — same IEEE ops, so
    # the clustered point set per cell is bit-identical to the old
    # two-pass shape's pass-2 membership
    inner = np.ones(n, dtype=bool)
    axes = [(xs, "ccx"), (ys, "ccy")] + ([(zs, "ccz")] if zs is not None else [])
    for v, cc in axes:
        c = int(pdf[cc].iloc[0])
        inner &= (np.floor((v - eps) / s) <= c) & (c <= np.floor((v + eps) / s))
    core = _core_flags(xs, ys, eps, int(min_pts), zs, only=inner)
    core &= inner  # outer-band flags are unused (and not exact)
    e2 = eps * eps
    g, offs, fwd = _fine_grid(eps, 2 if zs is None else 3)
    buckets = _fine_buckets(xs, ys, g, zs)

    # ---- union-find over core points, per fine cell then cross-cell
    uf = _UF(n)
    core_buckets = {
        k: idx[core[idx]] for k, idx in buckets.items() if core[idx].any()
    }
    for idx in core_buckets.values():
        a0 = int(idx[0])
        for b in idx[1:]:
            uf.union(a0, int(b))  # same fine cell => pairwise <= eps
    for k, ia in core_buckets.items():
        for off in fwd:
            ib = core_buckets.get(_key_add(k, off))
            if ib is None:
                continue
            if uf.find(int(ia[0])) == uf.find(int(ib[0])):
                continue  # already one component
            if _any_within(xs, ys, zs, ia, ib, e2):
                uf.union(int(ia[0]), int(ib[0]))

    # component label = min core id in local component
    root_min: dict[int, int] = {}
    core_idx = np.nonzero(core)[0]
    for i in core_idx:
        r = uf.find(int(i))
        v = int(ids[i])
        if r not in root_min or v < root_min[r]:
            root_min[r] = v
    lab = {int(i): root_min[uf.find(int(i))] for i in core_idx}

    out_id, out_kind, out_lab, out_own = [], [], [], []
    for i in core_idx:
        out_id.append(int(ids[i]))
        out_kind.append("corelab")
        out_lab.append(lab[int(i)])
        out_own.append(bool(own[i]))

    # ---- own non-core points: border (labels of core neighbors) or noise
    for k, idx in buckets.items():
        nc = idx[~core[idx] & own[idx]]
        if len(nc) == 0:
            continue
        nb_parts = [
            core_buckets[_key_add(k, off)]
            for off in offs
            if _key_add(k, off) in core_buckets
        ]
        nb = (
            np.concatenate(nb_parts) if nb_parts else np.empty(0, dtype=np.int64)
        )
        step = _d2_block_rows(len(nb))
        for r0 in range(0, len(nc), step):
            blk = nc[r0 : r0 + step]
            if len(nb):
                hit = _d2_rows(xs, ys, zs, blk, nb) <= e2
            else:
                hit = np.zeros((len(blk), 0), dtype=bool)
            for r, i in enumerate(blk):
                labs = {lab[int(j)] for j in nb[hit[r]]} if hit.shape[1] else set()
                if labs:
                    for v in sorted(labs):
                        out_id.append(int(ids[i]))
                        out_kind.append("border")
                        out_lab.append(v)
                        out_own.append(True)
                else:
                    out_id.append(int(ids[i]))
                    out_kind.append("noise")
                    out_lab.append(-1)
                    out_own.append(True)
    out = {
        "id": out_id,
        "kind": out_kind,
        "lab": out_lab,
        "own": out_own,
        "ccx": int(pdf["ccx"].iloc[0]) if len(pdf) else 0,
        "ccy": int(pdf["ccy"].iloc[0]) if len(pdf) else 0,
    }
    if "ccz" in pdf.columns:
        out["ccz"] = int(pdf["ccz"].iloc[0]) if len(pdf) else 0
    return pd.DataFrame(out)


# max label-equivalence edges resolved driver-side before falling back
# to the distributed CC (each edge is 16 bytes of payload — the cap
# bounds the collect at ~32 MB)
_DRIVER_MERGE_MAX = 2_000_000

def _p2_schema(dim: int) -> T.StructType:
    """Pass-2 output schema; the 3-D embedding carries its third cell
    coordinate so incremental maintenance can slice `local` rows by
    the full cell key."""
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("lab", T.LongType()),
        T.StructField("own", T.BooleanType()),
        T.StructField("ccx", T.LongType()),
        T.StructField("ccy", T.LongType()),
    ]
    if dim == 3:
        fields.append(T.StructField("ccz", T.LongType()))
    return T.StructType(fields)



def _validated_pts(df, key, x, y, eps, min_pts, coarse_cell, metric="planar"):
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        NumericType,
        ShortType,
    )

    for c in (x, y):
        if not isinstance(df.schema[c].dataType, NumericType):
            raise TypeError(
                f"dbscan column {c!r} must be numeric, got "
                f"{df.schema[c].dataType.simpleString()}"
            )
    if not isinstance(
        df.schema[key].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise TypeError(
            f"dbscan key column {key!r} must be an integral type, got "
            f"{df.schema[key].dataType.simpleString()} (a string key would "
            "cast to NULL and drop every row; a fractional key would "
            "TRUNCATE, merging distinct points onto one id — review r3)"
        )
    eps = float(eps)
    if not eps > 0.0:
        raise ValueError("eps must be > 0")
    if int(min_pts) < 1:
        raise ValueError("min_pts must be >= 1")
    if metric not in ("planar", "sphere"):
        raise ValueError(f"metric must be 'planar' or 'sphere', got {metric!r}")
    if metric == "sphere":
        # chord-space eps: d <-> c = 2R·sin(d/2R) is monotone on
        # [0, πR], so Euclidean DBSCAN in the 3-D embedding with
        # eps_chord is exactly geodesic DBSCAN with eps metres.
        from ..geom.geodesic import MAX_DISTANCE, MEAN_RADIUS

        r = MEAN_RADIUS
        eps = 2.0 * r * math.sin(min(eps, MAX_DISTANCE) / (2.0 * r))
        lam = F.radians(F.col(x).cast("double"))
        phi = F.radians(F.col(y).cast("double"))
        coords = [
            (F.lit(r) * F.cos(phi) * F.cos(lam)).alias("x"),
            (F.lit(r) * F.cos(phi) * F.sin(lam)).alias("y"),
            (F.lit(r) * F.sin(phi)).alias("z"),
        ]
        # a NULL lon or lat propagates into every embedded coordinate
        nn = F.col("x").isNotNull() & F.col("z").isNotNull()
    else:
        coords = [
            F.col(x).cast("double").alias("x"),
            F.col(y).cast("double").alias("y"),
        ]
        nn = F.col("x").isNotNull() & F.col("y").isNotNull()
    s = float(coarse_cell) if coarse_cell is not None else 8.0 * eps
    if s < 2.0 * eps:
        raise ValueError(
            "coarse_cell must be >= 2*eps"
            + (" (chord metres for metric='sphere')" if metric == "sphere" else "")
        )
    pts = df.select(
        F.col(key).cast("long").alias("id"), *coords
    ).filter(F.col("id").isNotNull() & nn)
    return pts, eps, s


def _cell_cols_of(cols) -> list[str]:
    """The coarse-cell key columns present, in axis order (2-D planar
    or the 3-D chordal embedding)."""
    return [c for c in ("ccx", "ccy", "ccz") if c in cols]


def _dilate_cells_np(cells: "pd.DataFrame", r: int) -> "pd.DataFrame":
    """Driver-side Chebyshev-r dilation of a small cell frame (2-D or
    3-D, decided by the columns present)."""
    ccols = _cell_cols_of(cells.columns)
    arrs = [cells[c].to_numpy(np.int64) for c in ccols]
    offs = np.arange(-r, r + 1, dtype=np.int64)
    grids = np.meshgrid(*([offs] * len(ccols)), indexing="ij")
    exp = [
        (a[:, None] + g.ravel()[None, :]).ravel()
        for a, g in zip(arrs, grids)
    ]
    uniq = np.unique(np.stack(exp, axis=1), axis=0)
    return pd.DataFrame({c: uniq[:, i] for i, c in enumerate(ccols)})


# above this many distinct delta home cells, incremental maintenance
# expands cell rings distributedly instead of on the driver (a spray
# delta over a huge grid); below it, LocalRelation cell sets avoid
# ~6 tiny shuffle jobs per batch — the dominant cost of a small delta.
# Calibrated in 2-D for the widest dilation (r=4: 81 offsets → ≤8.1M
# pre-unique rows, ~130 MB of driver numpy); _driver_cells_cap scales
# it down in 3-D, where the same r is 729 offsets (9× the rows per
# home cell), so the driver/broadcast bound stays constant
_DRIVER_CELLS_MAX = 100_000


def _driver_cells_cap(dim: int) -> int:
    return _DRIVER_CELLS_MAX // (9 ** (dim - 2))

# above this many affected point ids, the incremental assembly stops
# broadcasting the id set (two int64 columns; 20M ids ≈ 160 MB on the
# driver and per executor) and rebuilds the per-point output from the
# full state instead — correct either way, and past this fraction the
# anti-join union saves little
_AFFECTED_BROADCAST_MAX = 20_000_000


def _expand_cells(cells: DataFrame, r: int) -> DataFrame:
    """Chebyshev-r dilation of a cell set (2-D or 3-D, decided by the
    columns present)."""
    ccols = _cell_cols_of(cells.columns)
    if r == 0:
        return cells.select(*ccols).distinct()
    offs = list(itertools.product(range(-r, r + 1), repeat=len(ccols)))
    return (
        cells.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            *[
                                (F.col(c) + F.lit(o)).alias(c)
                                for c, o in zip(ccols, off)
                            ]
                        )
                        for off in offs
                    ]
                )
            ).alias("c")
        )
        .select(*[f"c.{c}" for c in ccols])
        .distinct()
    )


def _compute_local(
    pts: DataFrame,
    s: float,
    eps: float,
    min_pts: int,
    p2_cells: DataFrame | None = None,
) -> DataFrame:
    """ONE fused pass (2·eps-halo replication → per-cell core flags +
    local components in the same applyInPandas) → the per-cell `local`
    rows. The former two-pass shape shuffled the table three times
    (eps-halo replication for flags, a pts⋈flags id-join, eps-halo
    replication again for clustering); the fused pass shuffles once
    with a 2·eps halo — strictly fewer bytes and two fewer stages,
    with byte-identical `local` output (guide §2.4).

    With ``p2_cells`` set (already broadcast-wrapped by the caller if
    small), only those coarse cells are recomputed; their 2·eps-halo
    support rides the same replication, so no extra ring pass is
    needed."""
    cell_cols = [_CELL_COLS[d] for d in _dims(pts.columns)]
    rep = _replicate_to_cells(pts, s, eps, halo=2)
    if p2_cells is not None:
        rep = rep.join(p2_cells, cell_cols, "left_semi")

    def pf(pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_cluster(pdf, eps, s, int(min_pts))

    # lazy checkpoint: materializes inside the first consuming action
    # (the label-merge toPandas) instead of as its own barrier job, and
    # still truncates lineage for every later scan (guide §1.2: fewer
    # stages/barriers is the win at this operator's row counts)
    return (
        rep.groupBy(*cell_cols)
        .applyInPandas(pf, _p2_schema(len(cell_cols)))
        .localCheckpoint(eager=False)
    )


def min_label_components(
    seeds: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Adaptive min-label connected components over (i, j) edges (any
    direction). Returns an (id, lab) mapping covering at least every
    edge-touched node — ids absent from the mapping are singletons, so
    callers resolve with a left join + ``coalesce(lab, id)``. Small
    graphs (≤ _DRIVER_MERGE_MAX edges) union-find at the driver — the
    MR merge-step shape; larger ones run the distributed
    pointer-jumping loop over ``seeds``."""
    spark = seeds.sparkSession
    uniq = edges.select("i", "j").filter(F.col("i") != F.col("j")).distinct()
    # Arrow toPandas, not collect(): pyspark Row objects cost hundreds
    # of bytes each, so a max-size merge graph lands as two compact
    # int64 columns (~32 MB) instead of transient GBs (ADVICE r2)
    pdf = uniq.limit(_DRIVER_MERGE_MAX + 1).toPandas()
    if len(pdf) <= _DRIVER_MERGE_MAX:
        uf_parent: dict[int, int] = {}

        def find(a: int) -> int:
            while uf_parent.setdefault(a, a) != a:
                uf_parent[a] = uf_parent.setdefault(uf_parent[a], uf_parent[a])
                a = uf_parent[a]
            return a

        for a, b in zip(pdf["i"].to_numpy(), pdf["j"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                uf_parent[max(ra, rb)] = min(ra, rb)
        mapping = [(n, find(n)) for n in list(uf_parent)]
        if mapping:
            return F.broadcast(
                spark.createDataFrame(mapping, "id long, lab long")
            )
        return F.broadcast(spark.createDataFrame([], "id long, lab long"))
    sym = uniq.unionByName(
        uniq.select(F.col("j").alias("i"), F.col("i").alias("j"))
    )
    return _connected_components(seeds, sym, max_iter)


def _eq_edges(corelab: DataFrame) -> DataFrame:
    """Label-equivalence edges WITH provenance: (pid, i, j) — labels
    seen for the same physical point ``pid``. Only points replicated
    into >= 2 partitions (halo crossers) can carry an equivalence —
    filtered before exploding. The pid column is what lets
    :func:`dbscan_incremental` invalidate exactly the edges of points
    whose replica row-set changed."""
    return (
        corelab.groupBy("id")
        .agg(F.collect_set("lab").alias("labs"))
        .filter(F.size("labs") > 1)
        .select(
            F.col("id").alias("pid"),
            F.array_min("labs").alias("i"),
            F.explode("labs").alias("j"),
        )
        .filter(F.col("i") != F.col("j"))
    )


def _resolve_labels(eq: DataFrame, max_iter: int) -> DataFrame:
    """(lab, cluster) resolution map from (.., i, j) equivalence edges.
    The merge graph is LABEL-level: one node per local component,
    independent of n (MR-DBSCAN's merge step); resolved adaptively
    (driver union-find under the edge cap, distributed CC above it).
    Labels untouched by any edge are identity-resolved and OMITTED —
    consumers coalesce(cluster, lab)."""
    pairs = eq.select("i", "j")
    seeds = (
        pairs.select(F.col("i").alias("id"))
        .unionByName(pairs.select(F.col("j").alias("id")))
        .distinct()
    )
    return min_label_components(seeds, pairs, max_iter).select(
        F.col("id").alias("lab"), F.col("lab").alias("cluster")
    )


def _assemble_rows(local: DataFrame, resolved: DataFrame) -> DataFrame:
    """Per-point output from `local` rows given a (lab, cluster)
    resolution map. Restrictable: called with a slice of `local`
    containing ALL rows of each id present, it yields exactly that
    subset of the full output.

    ONE join + ONE groupBy (the former three per-role aggregate
    branches + two unions cost three shuffles and five stages for the
    same answer — guide §2.4): an id's rows are all of one kind
    (corelab for cores, border for own non-cores with core neighbors,
    noise otherwise), every lab of a core id resolves to the same
    cluster, a border takes the MIN resolved neighbor label, and a
    noise row's lab is already -1 with no resolution entry."""
    rows = local.filter((F.col("kind") != "corelab") | F.col("own")).select(
        "id", "kind", "lab"
    )
    return (
        rows.join(resolved, "lab", "left")
        .groupBy("id")
        .agg(
            F.min(F.coalesce("cluster", "lab")).alias("cluster"),
            F.min("kind").alias("__kind"),
        )
        .select(
            "id",
            "cluster",
            F.when(F.col("__kind") == "corelab", "core")
            .when(F.col("__kind") == "border", "border")
            .otherwise("noise")
            .alias("role"),
        )
    )


def _assemble_full(local: DataFrame, max_iter: int):
    """Global label merge + per-point output. Returns
    (result, eq_edges, resolved_nontrivial) — the two extra frames are
    the incremental-maintenance state."""
    corelab = local.filter(F.col("kind") == "corelab")
    eq = _eq_edges(corelab)
    resolved = _resolve_labels(eq, max_iter)
    result = _assemble_rows(local, resolved)
    return result, eq, resolved.filter(F.col("lab") != F.col("cluster"))


def _assemble(local: DataFrame, max_iter: int) -> DataFrame:
    """Global label merge + per-point output from `local` rows."""
    return _assemble_full(local, max_iter)[0]


def dbscan(
    df: DataFrame,
    key: str,
    x: str,
    y: str,
    eps: float,
    min_pts: int,
    coarse_cell: float | None = None,
    max_iter: int = 25,
    return_state: bool = False,
    metric: str = "planar",
):
    """DBSCAN over point columns.

    Returns (id BIGINT, cluster BIGINT, role STRING) — one row per
    input row with non-null key/x/y; cluster = min core id of the
    component (−1 for noise), role ∈ {core, border, noise}.

    ``metric='planar'`` (default): x/y are Cartesian, eps in the same
    units. ``metric='sphere'``: x/y are lon/lat DEGREES and eps is
    METRES of great-circle distance on the same mean-radius sphere as
    ``ST_DistanceSphere`` — computed exactly via the 3-D chordal
    embedding (module docstring), so antimeridian- and pole-straddling
    clusters come out whole. eps ≥ πR means everything is one
    neighborhood.

    ``coarse_cell`` is the partition granule (default 8·eps; for
    metric='sphere' it is in CHORD metres): large enough that halo
    replication (≈ 4·eps/S) is cheap, small enough that one cell's
    points fit an executor. Shrink it for very dense data.

    ``return_state=True`` additionally returns the maintenance state
    for :func:`dbscan_incremental` (delta maintenance — appends,
    removals, and moves; see its docstring): a dict
    of {local, eq, resolved, result} DataFrames (per-cell local rows,
    provenance-tagged label-equivalence edges, the non-identity label
    resolution map, and the per-point output). Works for both metrics
    — sphere-mode state carries 3-D cell keys (ccx, ccy, ccz in the
    chordal embedding's grid) and must be continued with
    ``dbscan_incremental(..., metric='sphere')``.
    """
    pts, eps, s = _validated_pts(
        df, key, x, y, eps, min_pts, coarse_cell, metric
    )
    local = _compute_local(pts, s, eps, int(min_pts))
    if not return_state:
        return _assemble(local, max_iter)
    result, eq, resolved = _assemble_full(local, max_iter)
    # lazy checkpoints (guide §1.2), consistent with the state frames
    # dbscan_incremental itself returns: they persist + truncate
    # lineage but materialize inside the first consuming action (the
    # caller's count / sink write / the next apply's joins) instead of
    # as three barrier jobs here. Safe for the limit-probe hazard: the
    # next apply consumes `eq` under _resolve_labels' bounded toPandas,
    # but that probe sits ABOVE distinct's shuffle, so the upstream
    # still runs at full parallelism (same exposure the incremental
    # path's lazy `eq` already carries). Streaming inputs are pinned
    # eager by the maintainer before this is called, so a lazy frame
    # first consumed next batch recomputes from pinned data.
    result = result.localCheckpoint(eager=False)
    state = {
        "local": local,
        "eq": eq.localCheckpoint(eager=False),
        "resolved": resolved.localCheckpoint(eager=False),
        "result": result,
        "delta": result,  # initial build: everything is new
    }
    return result, state


def dbscan_incremental(
    df_all: DataFrame,
    delta: DataFrame,
    prev_state: DataFrame,
    key: str,
    x: str,
    y: str,
    eps: float,
    min_pts: int,
    coarse_cell: float | None = None,
    max_iter: int = 25,
    metric: str = "planar",
):
    """Delta DBSCAN maintenance: recluster ONLY the coarse cells a
    batch of changes can affect, then re-merge labels globally —
    provably equal to a full rebuild (asserted differentially in
    tests), at delta-proportional cost.
    ``metric='sphere'`` maintains geodesic clusters: the dirty-cell
    bookkeeping runs in the 3-D chordal embedding's grid (the
    Chebyshev-ring argument below is per-axis, so it is
    dimension-free), and ``metric`` must match the metric the state
    was built with (checked via the state's cell-key dimension).

    ``df_all`` = the full table AFTER the change; ``delta`` = every
    row whose presence or position changed: appended rows (as they
    appear in ``df_all``), REMOVED rows (their old coordinates — they
    only seed dirty cells), and BOTH the old and new rows of a moved
    point. ``prev_state`` = the state dict from ``dbscan(...,
    return_state=True)`` (or a previous incremental step) computed
    over the pre-change table; a bare `local` DataFrame (the pre-r3
    state shape) is upgraded in place with one full assemble. Removal
    works because the argument below is symmetric: a removed point's
    influence (its replicas, the core flags it supported, the labels
    it minted) is confined to the same ring of cells around its home,
    all of which are recomputed from ``df_all`` — and its ids fall
    into the affected set (its prev rows sit in dirty cells) while
    never reappearing in the recomputed rows, so it drops from the
    result. Note the ``delta`` state frame is UPSERT rows only; a
    MERGE sink tracking removals must additionally delete the removed
    keys (which the caller supplied).

    Dirty radius: an added or removed point changes core flags only
    within eps (1 coarse ring at S ≥ 2·eps), and a cell's local
    clustering reads flag-changed points up to one more halo ring
    away — so cells within Chebyshev 2 of a delta home cell are
    recomputed (their pass-1 support extends one further ring via
    ``_compute_local``). Everything farther keeps byte-identical
    `local` rows.

    ASSEMBLY is delta-proportional too (VERDICT r2 #6, previously
    O(state) per batch): a point's replica rows all sit within
    Chebyshev 1 of its home cell, so only points with home in
    ring1(dirty) can change their row-set — their equivalence edges
    are re-derived from the ring2(dirty) slice and swapped into the
    persisted provenance-tagged edge list. The label resolution map is
    re-solved (label-level, tiny) and DIFFED against the previous one;
    per-point output is recomputed only for (points with a row in a
    dirty cell) ∪ (points carrying a label whose resolution changed),
    anti-join-unioned with the untouched remainder of the previous
    result. Everything id-keyed joins against broadcast
    delta-proportional key sets, so the O(state) frames are only ever
    scanned, never shuffled.

    Returns (result, new_state)."""
    if isinstance(prev_state, DataFrame):  # pre-r3 state shape
        p_result, p_eq, p_resolved = _assemble_full(prev_state, max_iter)
        prev_state = {
            "local": prev_state,
            "eq": p_eq.localCheckpoint(eager=True),
            "resolved": p_resolved.localCheckpoint(eager=True),
            "result": p_result.localCheckpoint(eager=True),
        }
    prev_local = prev_state["local"]
    # both calls must see the USER eps: for metric='sphere'
    # _validated_pts converts metres → chord metres, and feeding the
    # first call's converted eps back in would convert it twice
    eps_user = eps
    pts_all, eps, s = _validated_pts(
        df_all, key, x, y, eps_user, min_pts, coarse_cell, metric
    )
    pts_delta, _, _ = _validated_pts(
        delta, key, x, y, eps_user, min_pts, coarse_cell, metric
    )
    cell_cols = [_CELL_COLS[d] for d in _dims(pts_all.columns)]
    state_cols = _cell_cols_of(prev_local.columns)
    if state_cols != cell_cols:
        raise ValueError(
            f"metric {metric!r} implies cell key {cell_cols}, but the "
            f"previous state carries {state_cols} — the state must be "
            "continued with the metric it was built with"
        )

    spark = df_all.sparkSession
    home = pts_delta.select(
        *[
            F.floor(F.col(d) / F.lit(s)).cast("long").alias(_CELL_COLS[d])
            for d in _dims(pts_delta.columns)
        ]
    ).distinct()
    # bounded branch probe (the min_label_components pattern, ADVICE
    # r2): collect at most cap+1 home cells to pick the branch — under
    # the cap, limit() returns the complete set (the dilations below
    # need every home cell); over it, the distributed branch reads the
    # full `home` frame and the driver never holds a planet-wide spray
    # delta's cell set. The short-circuit's len >= 16 check below is
    # unaffected (cap+1 >> 16).
    _cells_cap = _driver_cells_cap(len(cell_cols))
    home_pdf = home.limit(_cells_cap + 1).toPandas()
    if len(home_pdf) <= _cells_cap:
        # LocalRelation cell sets: every ring is a numpy dilation of the
        # home cells, so the per-batch fixed cost is one tiny toPandas
        # job instead of ~6 distinct-shuffle jobs (ring re-expansions)
        schema = ", ".join(f"{c} long" for c in cell_cols)

        def _cells(r: int) -> DataFrame:
            return spark.createDataFrame(_dilate_cells_np(home_pdf, r), schema)

        dirty, ring1, ring2 = _cells(2), _cells(3), _cells(4)
        bcast = F.broadcast
    else:  # spray delta over a huge grid: expand distributedly and do
        # NOT force-broadcast multi-million-cell frames (review r3) —
        # Catalyst/AQE picks the join side from stats
        dirty = _expand_cells(home, 2).localCheckpoint(eager=True)
        ring1 = _expand_cells(dirty, 1)
        ring2 = _expand_cells(dirty, 2)
        bcast = lambda df_: df_  # noqa: E731

    # degenerate-delta short-circuit (r6, guide §1.2): when the dirty
    # set covers EVERY occupied coarse cell, the incremental machinery
    # provably reduces to a full rebuild — kept is empty, every prev eq
    # edge is refreshed, and the affected set is every id — so diffing
    # a fully-dirty state pays ~10 join/distinct stages for the same
    # answer a rebuild gets directly. One bounded probe (anti-join
    # isEmpty, full-parallelism map side): its ~0.1 s costs far less
    # than the machinery it can skip, so it runs for any delta wide
    # enough to plausibly qualify — only the localized/streaming shape
    # (a handful of home cells) skips it outright.
    if len(home_pdf) >= 16:
        occ = pts_all.select(
            *[
                F.floor(F.col(d) / F.lit(s)).cast("long").alias(_CELL_COLS[d])
                for d in _dims(pts_all.columns)
            ]
        ).distinct()
        if occ.join(bcast(dirty), cell_cols, "left_anti").isEmpty():
            return dbscan(
                df_all, key, x, y, eps_user, int(min_pts), coarse_cell,
                max_iter, return_state=True, metric=metric,
            )

    fresh = _compute_local(pts_all, s, eps, int(min_pts), p2_cells=bcast(dirty))
    kept = prev_local.join(bcast(dirty), cell_cols, "left_anti")
    new_local = kept.unionByName(fresh).localCheckpoint(eager=False)

    def _own_core_ids(local_rows: DataFrame) -> DataFrame:
        return (
            local_rows.filter((F.col("kind") == "corelab") & F.col("own"))
            .join(bcast(ring1), cell_cols, "left_semi")
            .select("id")
            .distinct()
        )

    # points whose corelab row-set may differ between prev and new
    # state: any replica cell dirty => home within ring1(dirty)
    refresh_ids = (
        _own_core_ids(prev_local)
        .unionByName(_own_core_ids(new_local))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # their replicas all live within ring2(dirty) — re-derive edges
    # from that slice only
    slice_eq = (
        new_local.filter(F.col("kind") == "corelab")
        .join(bcast(ring2), cell_cols, "left_semi")
        .join(F.broadcast(refresh_ids), "id", "left_semi")
    )
    eq = (
        prev_state["eq"]
        .join(
            F.broadcast(refresh_ids.withColumnRenamed("id", "pid")),
            "pid",
            "left_anti",
        )
        .unionByName(_eq_edges(slice_eq))
        .localCheckpoint(eager=False)
    )
    resolved = _resolve_labels(eq, max_iter)
    resolved_nt = resolved.filter(F.col("lab") != F.col("cluster")).localCheckpoint(
        eager=False
    )
    # labels whose resolution changed (identity entries are omitted on
    # both sides, so appearing/disappearing from the map IS a change)
    p = prev_state["resolved"].withColumnRenamed("cluster", "pc")
    n = resolved_nt.withColumnRenamed("cluster", "nc")
    changed_labs = (
        p.join(n, "lab", "full_outer")
        .filter(
            F.coalesce("pc", F.col("lab")) != F.coalesce("nc", F.col("lab"))
        )
        .select("lab")
    )
    ids_dirty = (
        prev_local.join(bcast(dirty), cell_cols, "left_semi")
        .select("id")
        .unionByName(fresh.select("id"))
        .distinct()
    )
    ids_relabel = (
        new_local.filter(F.col("kind") != "noise")
        # no forced broadcast: a mega-merge batch can change millions
        # of labels, and this runs BEFORE the affected-id size guard
        # (review r3) — let Catalyst pick from stats
        .join(changed_labs, "lab", "left_semi")
        .select("id")
        .distinct()
    )
    affected = (
        ids_dirty.unionByName(ids_relabel).distinct().localCheckpoint(eager=False)
    )
    # pathological batches (a spray delta merging giant clusters) can
    # make the affected-id set a large fraction of the table; past the
    # broadcast comfort zone a full reassembly is both safer for the
    # driver and cheaper than shipping the id set to every task
    if affected.count() > _AFFECTED_BROADCAST_MAX:
        new_rows = _assemble_rows(new_local, resolved)
        result = new_rows.localCheckpoint(eager=False)
        new_rows_delta = result
    else:
        slice_pts = new_local.join(F.broadcast(affected), "id", "left_semi")
        new_rows = _assemble_rows(slice_pts, resolved)
        result = (
            prev_state["result"]
            .join(F.broadcast(affected), "id", "left_anti")
            .unionByName(new_rows)
            .localCheckpoint(eager=False)
        )
        new_rows_delta = new_rows
    new_state = {
        "local": new_local,
        "eq": eq,
        "resolved": resolved_nt,
        "result": result,
        # per-batch UPSERT delta (not persisted by save_dbscan_state —
        # derivable): the recomputed rows of every affected point.
        # A sink that MERGEs these on id into the previous output gets
        # exactly the new result, writing O(delta) instead of O(state)
        # rows per batch (the full result when the fallback rebuilt).
        "delta": new_rows_delta,
    }
    return result, new_state


_STATE_FRAMES = ("local", "eq", "resolved", "result")


def save_dbscan_state(state: dict, path: str, applied: list) -> str:
    """Durable snapshot of the incremental-DBSCAN state dict plus the
    list of applied batch ids (kill-resume support, VERDICT r2 #8).

    Writes a fresh version dir and then atomically repoints
    ``_CURRENT`` — a kill mid-save leaves the previous version live,
    so a resume re-applies the interrupted batch from consistent state
    instead of double-applying it. Returns the version name."""
    import json
    import os
    import uuid

    v = f"v{len(applied)}_{uuid.uuid4().hex[:8]}"
    d = os.path.join(path, v)
    for name in _STATE_FRAMES:
        state[name].write.mode("overwrite").parquet(os.path.join(d, name))
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"applied": list(applied)}, f)
    tmp = os.path.join(path, "_CURRENT._tmp")
    with open(tmp, "w") as f:
        f.write(v)
    os.replace(tmp, os.path.join(path, "_CURRENT"))
    return v


def load_dbscan_state(spark, path: str):
    """(state dict, applied batch ids) from the committed version, or
    (None, []) when no commit exists yet."""
    import json
    import os

    cur_file = os.path.join(path, "_CURRENT")
    if not os.path.exists(cur_file):
        return None, []
    with open(cur_file) as f:
        d = os.path.join(path, f.read().strip())
    state = {
        name: spark.read.parquet(os.path.join(d, name))
        for name in _STATE_FRAMES
    }
    with open(os.path.join(d, "meta.json")) as f:
        applied = json.load(f)["applied"]
    return state, applied
