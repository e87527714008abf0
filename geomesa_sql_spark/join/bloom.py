"""Bloom-filter join pre-filtering — the above-cap sibling of the
index-lookup join.

The reference's lookup join pushes ≤100 literal keys into the right
scan (GeoMesaIndexLookupJoinEnumerator.scala:36-192); our
``index_lookup_join`` raises that to ~10k via parquet IN-pushdown, but
above any literal cap the only options were a full shuffle join or
nothing. This module adds the standard third way: build a fixed-size
Bloom filter of the build side's keys (size independent of key count)
and pre-filter the probe side BEFORE its shuffle — false positives are
harmless because the join itself re-checks equality, so results are
exact while the shuffle carries only (matches + ε) rows.

All engine-idiomatic: keys are hashed JVM-side (``xxhash64``), the
bitmap is built per partition in numpy over Arrow batches, OR-reduced
in two levels (per-partition → 64 groups → driver) so driver traffic is
bounded by 64·m/8 bytes regardless of partition count, and the probe is
a vectorized double-hashing test in a pandas UDF with the bitmap
captured by closure (broadcast with the serialized function, like the
LSH hyperplanes in ops/ann.py).

Spark's own runtime bloom-filter injection exists but only fires for
selective-filter shuffle joins under AQE; this operator is explicit,
composes with the lookup join, and works on any plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = np.uint64(0x9E3779B97F4A7C15)


def _mix(v: np.ndarray) -> np.ndarray:
    from geomesa_sql_spark.io.fixtures import _splitmix64

    return _splitmix64(v)


def _positions(h64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch–Mitzenmacher double hashing."""
    v = h64.astype(np.int64)
    h1 = _mix(v)
    h2 = _mix((h1 ^ _C1).view(np.int64)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_bloom(
    df: DataFrame, key: str | Column, m_bits: int = 8 * 1024 * 1024, k: int = 7
) -> np.ndarray:
    """Distributed Bloom build over ``key``: returns the bitmap as a
    packed uint8 array of m_bits/8 bytes. Two-level OR reduction keeps
    the driver's inbound volume at ≤ 64 bitmaps however many partitions
    the build side has."""
    assert m_bits % 8 == 0
    hashed = df.select(F.xxhash64(key).alias("__h"))
    nbytes = m_bits // 8

    bm_schema = T.StructType(
        [T.StructField("g", T.IntegerType()), T.StructField("bm", T.BinaryType())]
    )

    def _part_bitmap(batches):
        """Level 1 (mapInPandas): ONE bitmap row per input partition —
        raw keys never shuffle; only m/8 bytes leave each partition."""
        from pyspark import TaskContext

        bm = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            pos = _positions(pdf["__h"].to_numpy(np.int64), m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        yield pd.DataFrame({"g": [pid % 64], "bm": [bm.tobytes()]})

    def _or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """Level 2 (applyInPandas over ≤64 groups): OR the bitmaps."""
        bm = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bm"]:
            bm |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"g": [int(pdf["g"].iloc[0])], "bm": [bm.tobytes()]})

    partial = hashed.mapInPandas(_part_bitmap, bm_schema).groupBy("g").applyInPandas(
        _or_group, bm_schema
    )
    bm = np.zeros(nbytes, dtype=np.uint8)
    for row in partial.collect():
        bm |= np.frombuffer(row["bm"], dtype=np.uint8)
    return bm


def bloom_filter_col(
    bitmap: np.ndarray, key: str | Column, m_bits: int | None = None, k: int = 7
) -> Column:
    """Boolean Column: might the key be in the set the bitmap encodes?
    Vectorized probe over Arrow batches; exact negatives, ~fpp positives."""
    m = m_bits or (len(bitmap) * 8)
    bm = bitmap  # closure capture → serialized once per executor

    @F.pandas_udf(T.BooleanType())
    def _probe(h: pd.Series) -> pd.Series:
        pos = _positions(h.to_numpy(np.int64), m, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return _probe(F.xxhash64(key))


def bloom_prefilter_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    how: str = "inner",
    m_bits: int = 8 * 1024 * 1024,
    k: int = 7,
) -> DataFrame:
    """Equijoin with a Bloom pre-filter on the right (probe) side.

    EXACT results for ``how`` in inner/left/left_semi/left_anti — the
    join re-checks equality and a right row outside the Bloom set can
    never match, so shedding it changes nothing. RIGHT/FULL are
    REJECTED: pre-filtering the probe side would drop unmatched right
    rows those joins must null-pad (and keep only the fpp survivors —
    hash-dependent output). Default 1 MiB bitmap ≈ 0.8% fpp at 1M
    distinct keys (m/n=8.4, k=7); size m_bits ~10 bits/key for ~1% fpp.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"bloom_prefilter_join(how={how!r}): only inner/left/semi/anti "
            "are exact — RIGHT/FULL would drop the unmatched right rows "
            "the outer join must null-pad"
        )
    lk, rk = on
    bm = build_bloom(left, lk, m_bits=m_bits, k=k)
    pruned = right.filter(bloom_filter_col(bm, rk, m_bits=m_bits, k=k))
    return left.join(pruned, left[lk] == pruned[rk], how)
