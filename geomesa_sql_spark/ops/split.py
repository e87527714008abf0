"""Deterministic dataset splitting — stable train/val/test assignment
for training-data pipelines.

Not in the reference (a query adapter); required pipeline
infrastructure: the split of a row must depend ONLY on its key (and an
optional salt), so that re-runs, appends, backfills and multi-team
reads all agree without coordination — ``df.randomSplit`` gives none
of that (it is partitioning-order dependent).

Spark-first: assignment hashes the key JVM-side (xxhash64 — one
expression node inside whole-stage codegen; no Python, no shuffle, no
RNG state). ``with_splitmix64`` additionally provides the fixture
hash (``io/fixtures._splitmix64``) as staged JVM projections with
asserted bit parity, for derivations that must match the synthetic
tables.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GOLDEN = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
_M16 = 0xFFFF
_M32 = 0xFFFFFFFF


def _limb_products(x: Column, c: int) -> list[Column]:
    """t_k = Σ_{i+j=k} limb_i(x)·limb_j(c) for the mod-2⁶⁴ product —
    every term < 2³², every t_k < 2³⁴."""
    a = [
        x.bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(x, 16).bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(x, 32).bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(x, 48),
    ]
    cl = [(c >> (16 * j)) & _M16 for j in range(4)]
    return [
        sum(
            (a[i] * F.lit(cl[k - i]) for i in range(k + 1) if cl[k - i]),
            start=F.lit(0).cast("long"),
        )
        for k in range(4)
    ]


def with_splitmix64(df: DataFrame, src: Column | str, out: str) -> DataFrame:
    """Attach ``out`` = splitmix64(src) — bit-identical to
    ``io/fixtures._splitmix64`` (asserted in tests), built from
    overflow-free limb arithmetic because Spark 4 runs ANSI mode by
    default (a plain wrapping multiply throws).

    Implemented as STAGED named projections, not one Column tree: the
    16-bit-limb carry chain references each intermediate 2-4 times,
    and unresolved Column composition copies the subtree at every
    reference — the closed expression explodes exponentially (measured:
    driver heap OOM). Named columns stay attribute references;
    Catalyst's CollapseProject keeps non-cheap aliases un-inlined, so
    the plan stays linear and fully whole-stage-codegen'd."""
    t = "__sm"
    src = F.col(src) if isinstance(src, str) else src
    # z += GOLDEN (mod 2^64): 32-bit halves + carry, bit-op recombine
    df = df.withColumn(f"{t}_z", src.cast("long"))
    z = F.col(f"{t}_z")
    df = df.withColumn(f"{t}_lo", z.bitwiseAND(F.lit(_M32)) + F.lit(_GOLDEN & _M32))
    lo = F.col(f"{t}_lo")
    hi = F.shiftrightunsigned(z, 32) + F.lit(_GOLDEN >> 32) + F.shiftrightunsigned(lo, 32)
    df = df.withColumn(
        f"{t}_z",
        F.shiftleft(hi.bitwiseAND(F.lit(_M32)), 32).bitwiseOR(
            lo.bitwiseAND(F.lit(_M32))
        ),
    )
    for shift, mult in ((30, _C1), (27, _C2)):
        z = F.col(f"{t}_z")
        df = df.withColumn(f"{t}_x", z.bitwiseXOR(F.shiftrightunsigned(z, shift)))
        for k, tk in enumerate(_limb_products(F.col(f"{t}_x"), mult)):
            df = df.withColumn(f"{t}_t{k}", tk)
        df = df.withColumn(
            f"{t}_s1",
            F.col(f"{t}_t1") + F.shiftrightunsigned(F.col(f"{t}_t0"), 16),
        )
        df = df.withColumn(
            f"{t}_s2",
            F.col(f"{t}_t2") + F.shiftrightunsigned(F.col(f"{t}_s1"), 16),
        )
        df = df.withColumn(
            f"{t}_s3",
            F.col(f"{t}_t3") + F.shiftrightunsigned(F.col(f"{t}_s2"), 16),
        )
        df = df.withColumn(
            f"{t}_z",
            F.shiftleft(F.col(f"{t}_s3").bitwiseAND(F.lit(_M16)), 48)
            .bitwiseOR(F.shiftleft(F.col(f"{t}_s2").bitwiseAND(F.lit(_M16)), 32))
            .bitwiseOR(F.shiftleft(F.col(f"{t}_s1").bitwiseAND(F.lit(_M16)), 16))
            .bitwiseOR(F.col(f"{t}_t0").bitwiseAND(F.lit(_M16))),
        )
    z = F.col(f"{t}_z")
    df = df.withColumn(out, z.bitwiseXOR(F.shiftrightunsigned(z, 31)))
    return df.drop(
        *(f"{t}_{n}" for n in ("z", "lo", "x", "t0", "t1", "t2", "t3", "s1", "s2", "s3"))
    )


def _uniform_draw(k: Column, salt: int) -> Column:
    """Deterministic uniform draw in [0, 1) from a key: xxhash64 —
    ONE Catalyst expression node (the limb-built splitmix64 above is
    projection-staged; letting a FILTER push down through its 12
    projection layers re-inlines every alias and explodes the
    predicate tree — measured: janino codegen OOM — so the
    filter-heavy split/sample paths use the engine's native hash; the
    staged form remains for fixture-parity derivations). The top 53
    bits are exactly representable in a double."""
    h = F.xxhash64(k, F.lit(int(np.int64(salt))))
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(float(1 << 53))


def _draw_key(df: DataFrame, key) -> Column:
    """Resolve the split key column: INTEGRAL columns keep the long
    cast (pins the assignments shipped since r2); strings/doubles hash
    natively — the unconditional cast('long') either threw under ANSI
    or NULLed every draw to the bare seed, putting ALL rows in one
    split (review r3)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if isinstance(key, str):
        dt = df.schema[key].dataType
        col = F.col(key)
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            return col.cast("long")
        return col
    return key  # expression keys pass through as-is


def hash_split(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label, deterministically by key.

    ``fractions`` maps label → fraction; they must sum to 1 (±1e-9).
    A row's uniform draw is splitmix64(key ⊕ salt) / 2⁶⁴ ∈ [0, 1); the
    label is the first whose cumulative fraction exceeds the draw.
    Changing ``salt`` re-deals the assignment wholesale; changing a
    fraction boundary moves only the rows between the old and new
    boundary (consistent-split property — a 1% val set grown to 2%
    keeps the original 1%)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")

    u = _uniform_draw(_draw_key(df, key), salt)

    expr = None
    acc = 0.0
    labels = list(fractions)
    for name in labels[:-1]:
        acc += float(fractions[name])
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, key: str | Column, fraction: float, salt: int = 0
) -> DataFrame:
    """Deterministic sample: keep rows whose splitmix64(key ⊕ salt)
    draw falls below ``fraction``. Unlike ``df.sample`` this is stable
    across runs/partitioning AND consistent: a 1% sample is a strict
    subset of the 10% sample at the same salt (nested samples — the
    property dataset-curation reruns rely on)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_uniform_draw(_draw_key(df, key), salt) < F.lit(float(fraction)))
