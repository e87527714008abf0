"""Greedy sequence packing — the sample-packing step of an LLM
training-data pipeline: concatenate documents into fixed token-budget
bins (context windows) so padding is minimized, deterministically.

Not in the reference (a query adapter); required by the
training-pipeline brief. Semantics (the standard greedy first-fit-in-
order packer, reproducible by construction):

- within a **shard**, documents are walked in ascending id order;
- each document is appended to the current bin unless that would
  exceed ``budget`` tokens, in which case a new bin starts;
- a document longer than ``budget`` still gets placed — alone in its
  own bin (truncation is the caller's policy, not the packer's).

Scale shape: ONE shuffle, keyed by shard (``groupBy(shard)
.applyInPandas``) — shards are how real pipelines bound the inherently
sequential walk (per date / source / hash prefix; thousands of shards
≫ executors). Within a shard the walk is O(bins · log n) via
searchsorted jumps on the token cumsum, not a per-doc Python loop.
Output bins are (shard, bin) pairs; offsets are token start positions
inside the bin, so a downstream writer can lay out the packed window
without re-reading predecessors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("bin", T.LongType()),
        T.StructField("off", T.LongType()),
    ]
)


def _pack_walk(tok: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy walk over one shard's in-order token counts. Returns
    (bin index, offset) per doc. O(bins · log n): each bin boundary is
    one searchsorted jump on the cumsum."""
    n = len(tok)
    cum = np.concatenate([[0], np.cumsum(tok, dtype=np.int64)])
    bins = np.empty(n, dtype=np.int64)
    offs = np.empty(n, dtype=np.int64)
    b = 0
    i = 0
    while i < n:
        j = int(np.searchsorted(cum, cum[i] + budget, side="right")) - 1
        j = max(j, i + 1)  # oversize doc -> alone in its bin
        bins[i:j] = b
        offs[i:j] = cum[i:j] - cum[i]
        b += 1
        i = j
    return bins, offs


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    shard_col: str | Column | None = None,
) -> DataFrame:
    """(id, shard, bin, off) — greedy in-id-order packing per shard.

    ``tokens_col`` may be a column name or expression (e.g. the engine
    token counter). With ``shard_col=None`` everything is one shard —
    only for small inputs; at scale always shard (the walk is
    sequential within a shard by definition)."""
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[id_col].dataType, NumericType):
        raise TypeError(
            f"pack_sequences id column {id_col!r} must be numeric, got "
            f"{df.schema[id_col].dataType.simpleString()} (a string id "
            "would cast to NULL and silently drop every row)"
        )
    budget_i = int(budget)
    if budget_i < 1:
        raise ValueError("budget must be >= 1 token")
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = (
        F.lit(0).cast("long")
        if shard_col is None
        else (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        tok.cast("long").alias("tok"),
        shard.cast("long").alias("shard"),
    ).filter(
        # a NULL token count (e.g. NULL text under a length() expression)
        # would otherwise turn into INT64_MIN through the NaN->int64 cast
        # and corrupt every bin/offset after it in the shard; negative
        # counts would corrupt the cumsum the same way. Zero-token docs
        # are dropped too: their bin assignment at a boundary is
        # ill-defined (greedy "empty bin" vs prefix-range views differ)
        # and they occupy no window space by definition
        F.col("id").isNotNull()
        & F.col("shard").isNotNull()
        & F.col("tok").isNotNull()
        & (F.col("tok") > 0)
    )


    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        bins, offs = _pack_walk(pdf["tok"].to_numpy(np.int64), budget_i)
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(np.int64),
                "shard": pdf["shard"].to_numpy(np.int64),
                "bin": bins,
                "off": offs,
            }
        )

    return src.groupBy("shard").applyInPandas(walk, _OUT_SCHEMA)
