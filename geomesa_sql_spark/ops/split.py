"""Deterministic dataset splitting — stable train/val/test assignment
for training-data pipelines.

Not in the reference (a query adapter); required pipeline
infrastructure: the split of a row must depend ONLY on its key (and an
optional salt), so that re-runs, appends, backfills and multi-team
reads all agree without coordination — ``df.randomSplit`` gives none
of that (it is partitioning-order dependent).

Spark-first: the hash is splitmix64 built from pure JVM Column
arithmetic (Java ``long`` multiplication/addition wrap mod 2⁶⁴ exactly
like the numpy uint64 reference in ``io/fixtures._splitmix64`` — bit
equality is asserted in tests), so assignment runs inside whole-stage
codegen with no Python, no shuffle, and no RNG state.
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


def _wrap_add_const(z: Column, k: int) -> Column:
    """(z + k) mod 2⁶⁴ without signed overflow (ANSI mode throws on
    long overflow): 32-bit halves with an explicit carry, recombined
    with pure bit ops."""
    lo = z.bitwiseAND(F.lit(_M32)) + F.lit(k & _M32)
    hi = F.shiftrightunsigned(z, 32) + F.lit(k >> 32) + F.shiftrightunsigned(lo, 32)
    return F.shiftleft(hi.bitwiseAND(F.lit(_M32)), 32).bitwiseOR(
        lo.bitwiseAND(F.lit(_M32))
    )


def _wrap_mul_const(z: Column, c: int) -> Column:
    """(z · c) mod 2⁶⁴ without signed overflow: 16-bit limb schoolbook
    multiply — every intermediate stays < 2⁴⁰, far from the signed-64
    boundary, so ANSI arithmetic never trips; the final recombination
    is shifts and ORs (bit ops, no overflow semantics)."""
    a = [
        z.bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(z, 16).bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(z, 32).bitwiseAND(F.lit(_M16)),
        F.shiftrightunsigned(z, 48),
    ]
    cl = [(c >> (16 * j)) & _M16 for j in range(4)]
    t = [
        sum(
            (a[i] * F.lit(cl[k - i]) for i in range(k + 1) if cl[k - i]),
            start=F.lit(0).cast("long"),
        )
        for k in range(4)
    ]
    r0 = t[0].bitwiseAND(F.lit(_M16))
    carry = F.shiftrightunsigned(t[0], 16)
    s1 = t[1] + carry
    r1 = s1.bitwiseAND(F.lit(_M16))
    carry = F.shiftrightunsigned(s1, 16)
    s2 = t[2] + carry
    r2 = s2.bitwiseAND(F.lit(_M16))
    carry = F.shiftrightunsigned(s2, 16)
    r3 = (t[3] + carry).bitwiseAND(F.lit(_M16))
    return (
        F.shiftleft(r3, 48)
        .bitwiseOR(F.shiftleft(r2, 32))
        .bitwiseOR(F.shiftleft(r1, 16))
        .bitwiseOR(r0)
    )


def splitmix64_col(c: Column) -> Column:
    """JVM-side splitmix64 of a BIGINT column — bit-identical to
    ``io/fixtures._splitmix64`` (asserted in tests). Built from
    overflow-free limb arithmetic because Spark 4 runs ANSI mode by
    default, where a plain wrapping multiply would throw."""
    z = _wrap_add_const(c.cast("long"), _GOLDEN)
    z = _wrap_mul_const(z.bitwiseXOR(F.shiftrightunsigned(z, 30)), _C1)
    z = _wrap_mul_const(z.bitwiseXOR(F.shiftrightunsigned(z, 27)), _C2)
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


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
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")

    k = F.col(key) if isinstance(key, str) else key
    h = splitmix64_col(k.cast("long").bitwiseXOR(F.lit(int(np.int64(salt)))))
    # map signed long to [0, 1): (h >>> 11) has 53 uniform high bits,
    # exactly representable in a double
    u = F.shiftrightunsigned(h, 11).cast("double") / F.lit(float(1 << 53))

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
