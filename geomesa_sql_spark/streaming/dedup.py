"""Streaming near-duplicate detection (MinHash + LSH) — the stream
form of ``ops.dedup.lsh_near_dup_pairs``.

Not in the reference (it has no streaming at all — SURVEY.md §2.8);
this is the training-data-pipeline shape: documents arrive
continuously and each new arrival must be checked against everything
already ingested without ever holding an all-pairs structure.

Spark-first decomposition:

1. **Signatures** — the exact batch MinHash stage
   (``ops.dedup.minhash_signatures``; mapInPandas is stateless, so it
   runs unchanged on a streaming DataFrame).
2. **Band explode** — pure JVM Columns, identical to the batch
   operator: (band, xxhash64 of the band's signature slice).
3. **Stateful bucket probe** — ``applyInPandasWithState`` keyed by
   (band, band_hash). The state is this bucket's seen signatures;
   each new document is compared against them with one vectorized
   numpy scan (estimated Jaccard = fraction of equal minhash
   components — the standard unbiased MinHash estimator). Buckets are
   uniformly keyed by construction, so state and compute are evenly
   spread across executors: the same no-O(n²) guarantee as the batch
   pipeline, held incrementally.

Emission contract: a colliding pair is emitted **at least once** (a
pair agreeing in several bands is emitted by each of them) as
(id_new, id_seen, est_jaccard); consumers that need exactly-once pair
semantics dedupe downstream — exactly what the batch operator's
``.distinct()`` does, which streaming cannot afford globally.

State bounding: ``max_bucket`` caps per-bucket state (oldest entries
evicted first — FIFO, deterministic, applied at micro-batch
boundaries). Real near-dup buckets are tiny
(a band collision is already a strong signal); the cap only guards
against degenerate data such as a constant column. For time-bounded
retention swap the NoTimeout for ProcessingTimeTimeout — kept out of
the default because the batch-parity oracle needs full retention.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_new", T.LongType()),
        T.StructField("id_seen", T.LongType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.BinaryType())),
    ]
)


def banded_signatures(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band, bh, sig) — batch-identical signatures + band keys."""
    from geomesa_sql_spark.ops.dedup import minhash_signatures

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    # band keys through the SHARED expression builder — the streaming
    # contract is bucket-identical to the batch operator, so the
    # expression must have one source (review r4o)
    from geomesa_sql_spark.ops.dedup import band_key_expr

    return sigs.select(
        F.col(id_col).alias("id"),
        F.col("sig"),
        band_key_expr(bands, rows_per_band),
    ).select("id", "e.band", "e.bh", "sig")


def streaming_lsh_near_dup(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    sim_threshold: float = 0.7,
    max_bucket: int = 1024,
) -> DataFrame:
    """Streaming LSH near-dup probe; emits (id_new, id_seen,
    est_jaccard) for every new document whose bucket already holds a
    signature agreeing in ≥ ``sim_threshold`` of components."""
    banded = banded_signatures(
        docs, text_col, id_col, num_hashes, bands, shingle_k
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        ids, sigs = state.get if state.exists else ([], [])
        ids, sigs = list(ids), list(sigs)
        # one signature matrix per GROUP, grown in place — rebuilding
        # it per row would copy the whole bucket state for every
        # arrival (O(B·max_bucket) bytes for a hot bucket)
        # GLOBAL sort across the micro-batch's chunks: sorting each
        # Arrow chunk independently left multi-chunk groups with a
        # chunking-dependent processing order, so which doc of a pair
        # counted as "seen" varied run to run (review r3)
        chunks = list(pdfs)
        merged = (
            pd.concat(chunks).sort_values("id")
            if len(chunks) > 1
            else (chunks[0].sort_values("id") if chunks else pd.DataFrame())
        )
        batches = [merged] if len(merged) else []
        n_new = sum(len(p) for p in batches)
        m = (
            np.frombuffer(b"".join(sigs), dtype=np.int64).reshape(len(sigs), -1)
            if sigs
            else np.empty((0, num_hashes), dtype=np.int64)
        )
        buf = np.empty((len(ids) + n_new, m.shape[1]), dtype=np.int64)
        buf[: len(ids)] = m
        n = len(ids)
        out_new, out_seen, out_est = [], [], []
        for pdf in batches:
            for rid, sig in zip(pdf["id"], pdf["sig"]):
                s = np.asarray(sig, dtype=np.int64)
                if n:
                    est = (buf[:n] == s[None, :]).mean(axis=1)
                    for k in np.nonzero(est >= sim_threshold)[0]:
                        out_new.append(int(rid))
                        out_seen.append(int(ids[k]))
                        out_est.append(float(est[k]))
                ids.append(int(rid))
                buf[n] = s
                n += 1
        if n > max_bucket:  # FIFO eviction
            drop = n - max_bucket
            ids = ids[drop:]
            buf = buf[drop:n]
            n = max_bucket
        sigs = [buf[i].tobytes() for i in range(n)]
        state.update((ids, sigs))
        yield pd.DataFrame(
            {"id_new": out_new, "id_seen": out_seen, "est_jaccard": out_est}
        )

    return (
        banded.groupBy("band", "bh")
        .applyInPandasWithState(
            update,
            _OUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
