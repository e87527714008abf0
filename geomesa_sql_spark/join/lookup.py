"""Index-lookup equijoin — the J3/J4 analog.

Reference semantics (SURVEY.md §2.3): ``GeoMesaIndexLookupJoinRule``
fires for INNER/LEFT equijoins whose right side is an indexed scan
(rules/GeoMesaIndexLookupJoinRule.scala:30-82); the enumerator batches
≤100 distinct left keys, appends ``OR(attr = v…)`` to the right side's
pushed filter, and caches results per key
(enumerator/GeoMesaIndexLookupJoinEnumerator.scala:36-192). Only the
FIRST equi-attribute is pushed when the key is compound (:159-165), and
the residual non-equi predicate is re-applied after lookup (:124-136).

Spark re-expression: when the left side's distinct key set is small,
collect it once and push it into the right scan as an ``IN`` filter —
Catalyst turns that into parquet/Iceberg row-group + file pruning
(`PushedFilters: [In(key, ...)]` in .explain()), the storage-level
analog of GeoMesa's attribute-index range scan. The per-key cache and
100-row batching disappear: a broadcast hash join over the pruned scan
is strictly more general. Above the threshold the pushdown would bloat
the plan (and a giant IN defeats footer pruning), so it degrades to a
plain shuffled join — the analog of the rule not firing.

This is a static sibling of Spark's own Dynamic Partition Pruning /
runtime row-filter pushdown: those need partitioned/bucketed layouts,
while this works on any parquet via footer stats, at the cost of one
driver-side distinct() — guarded by a cheap limit-probe so a large
left side never pays a distinct shuffle + 100k-row collect just to
learn pushdown won't fire (ADVICE r01; the reference batches 100 keys
and simply stops qualifying above that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_PUSH_KEYS = 10_000


def index_lookup_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]] | tuple[str, str],
    how: str = "inner",
    residual: Column | None = None,
    max_push_keys: int = DEFAULT_MAX_PUSH_KEYS,
    push: bool | None = None,
) -> DataFrame:
    """Equijoin with left-key pushdown into the right scan.

    ``on``: (left_col, right_col) pair or list of pairs; like the
    reference, only the FIRST pair's keys are pushed (compound OR-of-
    ANDs chokes both GeoMesa's CNF conversion and parquet pruning), all
    pairs join. ``how``: 'inner' | 'left' (reference parity:
    GeoMesaIndexLookupJoinRule.scala:30-36). ``residual``: non-equi
    predicate applied after the join (LEFT: unmatched rows keep nulls).
    ``push``: caller hint — True forces the distinct+collect probe,
    False skips pushdown entirely; None (default) probes the left's raw
    row count first (limit-scan, no shuffle) and only runs the distinct
    when that bound already fits.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "index_lookup_join supports how='inner'|'left' "
            "(GeoMesaIndexLookupJoinRule.scala:30-36)"
        )
    pairs = [on] if isinstance(on, tuple) else list(on)
    lk0, rk0 = pairs[0]

    # cache the projected key column across the up-to-three probe
    # passes (limit-count, approx-distinct, distinct+collect): an
    # expensive left subtree was re-evaluated per probe (review r3).
    # persist() is lazy — no job unless a probe actually runs.
    left_keys = left.select(lk0)
    if push is None or push:
        left_keys = left_keys.persist()

    if push is None:
        # two-step probe, cheapest first:
        # 1. raw-rowcount limit scan (no shuffle, nothing collected):
        #    rows ≤ cap guarantees distinct(keys) ≤ cap;
        # 2. a many-rows/few-keys left (the workload the lookup join
        #    exists for) falls through to approx_count_distinct — one
        #    map-side-partial pass, a single scalar to the driver —
        #    before committing to the bounded distinct+collect.
        if left_keys.limit(max_push_keys + 1).count() <= max_push_keys:
            push = True
        else:
            approx = left_keys.agg(
                F.approx_count_distinct(lk0).alias("n")
            ).first()["n"]
            # approx_count_distinct err ~2-4%: leave headroom
            push = approx <= int(max_push_keys * 0.8)
    pushed = right
    if push:
        keys = [
            r[0]
            for r in left_keys.distinct().limit(max_push_keys + 1).collect()
        ]
        if len(keys) <= max_push_keys:
            non_null = [k for k in keys if k is not None]
            pushed = right.filter(F.col(rk0).isin(non_null))
    left_keys.unpersist()

    cond = None
    for lk, rk in pairs:
        c = left[lk] == pushed[rk]
        cond = c if cond is None else cond & c

    if residual is not None:
        if how == "left":
            # LEFT parity: the residual re-check only disqualifies
            # matched rows; left rows with no surviving match are
            # null-padded (GeoMesaIndexLookupJoinEnumerator.scala:124-136)
            return _left_residual(left, pushed, cond, residual)
        return left.join(pushed, cond, "inner").filter(residual)
    return left.join(pushed, cond, how)


def _left_residual(
    left: DataFrame, pushed: DataFrame, cond: Column, residual: Column
) -> DataFrame:
    """LEFT join with residual: keep matched rows passing the residual,
    null-pad left rows with no surviving match. POSITIONAL union: a
    right-side column sharing a left column's NAME broke the previous
    name-based padding (review r3) — positions are unambiguous because
    matched's layout is exactly left.columns then pushed's columns."""
    matched = left.join(pushed, cond & residual, "inner")
    unmatched = left.join(pushed, cond & residual, "left_anti")
    n_left = len(left.columns)
    pads = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in matched.schema.fields[n_left:]
    ]
    return matched.union(
        unmatched.select([F.col(c) for c in left.columns] + pads)
    )
