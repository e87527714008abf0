"""Multimodal (image) operators over opaque binary columns.

The graft table carries images as ``bytes`` + typed metadata
(image_id, w, h, fmt — BASELINE.json input_hint). Operators run as
``mapInPandas`` over Arrow batches; decode uses the stdlib codecs in
``io.images`` (raw + real PNG). JPEG/WebP/audio/video decode would
need PIL/cv2/ffmpeg (absent in this container) — those branches raise
NotImplementedError behind the same batch plumbing, which is real and
tested.

Payload discipline at scale: each operator projects only the columns
it needs, so Catalyst prunes ``bytes`` out of any plan that doesn't
decode (the reference's analogous concern is projection pushdown
keeping unselected attributes out of GeoMesa scans,
GeoMesaProjectRule.scala:25-55).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_sql_spark.io.images import decode_image, encode_raw


def image_stats(
    df: DataFrame, id_col: str = "image_id", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Decode and compute per-channel means + a luma histogram bucket.

    (id, *carry, mean_r, mean_g, mean_b, luma_bucket) — the
    feature-extraction template: decode in Arrow batches, reduce with
    numpy. ``carry`` columns pass through untouched so downstream
    stages (geo-join, tiling) don't need a re-join by id.
    """
    carry = tuple(c for c in carry if c != id_col)
    schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [df.schema[c] for c in carry]
        + [
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("luma_bucket", T.IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            mr = np.empty(n)
            mg = np.empty(n)
            mb = np.empty(n)
            fmts = pdf["fmt"].to_numpy()
            ws = pdf["w"].to_numpy(np.int64)
            hs = pdf["h"].to_numpy(np.int64)
            blobs = pdf["bytes"].to_numpy()
            # group by (fmt, w, h): decode into ONE stacked uint8 matrix
            # per group, then a single integer-accumulator sum over it —
            # the per-image numpy-call overhead (and any float64 temp)
            # is what turns a 32-core run memory-bound
            import pandas as _pd

            mr.fill(np.nan)
            mg.fill(np.nan)
            mb.fill(np.nan)
            valid = np.array([b is not None for b in blobs])
            codes, uniq = _pd.factorize(
                _pd.Series(list(zip(fmts, ws, hs))), sort=False
            )
            for gi, (fmt, w, h) in enumerate(uniq):
                idxs = np.nonzero((codes == gi) & valid)[0]
                if not len(idxs):
                    continue
                w, h = int(w), int(h)
                stack = np.empty((len(idxs), h * w * 3), dtype=np.uint8)
                for j, i in enumerate(idxs):
                    stack[j] = decode_image(
                        bytes(blobs[i]), fmt, w, h
                    ).reshape(-1)
                sums = stack.reshape(len(idxs), -1, 3).sum(axis=1, dtype=np.int64)
                npx = float(w * h)
                mr[idxs] = sums[:, 0] / npx
                mg[idxs] = sums[:, 1] / npx
                mb[idxs] = sums[:, 2] / npx
            luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
            out = {id_col: pdf[id_col]}
            for c in carry:
                out[c] = pdf[c]
            # null payload → null stats (nullable Int32 keeps the row:
            # a corrupt image must not kill a 100 TB pass)
            bucket = pd.array(
                np.where(np.isnan(luma), 0, luma // 32).astype(np.int32),
                dtype="Int32",
            )
            bucket[np.isnan(luma)] = pd.NA
            out.update(mean_r=mr, mean_g=mg, mean_b=mb, luma_bucket=bucket)
            yield pd.DataFrame(out)

    return df.select(id_col, *carry, "bytes", "fmt", "w", "h").mapInPandas(gen, schema)


def phash_images(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, ahash bigint): 64-bit average-hash of the decoded image.

    8×8 block downsample of the INTEGER luma plane (299·R + 587·G +
    114·B — the BT.601 weights ×1000); bit (yb·8+xb) set where the
    block's luma sum × 64 ≥ the image's total luma sum (i.e. block mean
    ≥ global mean, compared in exact integer arithmetic, so the hash is
    independent of summation order — which also makes it reproducible
    in ANSI SQL; the image_stats oracle recomputes it in DuckDB).
    Vectorized per (fmt, w, h) group like image_stats.
    """
    schema = T.StructType(
        [T.StructField(id_col, T.StringType()), T.StructField("ahash", T.LongType())]
    )

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            out = np.zeros(n, dtype=np.int64)
            valid_any = np.zeros(n, dtype=bool)
            blobs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            ws = pdf["w"].to_numpy(np.int64)
            hs = pdf["h"].to_numpy(np.int64)
            valid = np.array([b is not None for b in blobs])
            codes, uniq = pd.factorize(pd.Series(list(zip(fmts, ws, hs))), sort=False)
            weights = np.array([299, 587, 114], dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for gi, (fmt, w, h) in enumerate(uniq):
                idxs = np.nonzero((codes == gi) & valid)[0]
                if not len(idxs):
                    continue
                w, h = int(w), int(h)
                by, bx = max(h // 8, 1), max(w // 8, 1)
                stack = np.empty((len(idxs), h, w, 3), dtype=np.uint8)
                for j, i in enumerate(idxs):
                    stack[j] = decode_image(bytes(blobs[i]), fmt, w, h)
                luma = (stack.astype(np.int64) * weights).sum(axis=3)
                cropped = luma[:, : by * 8, : bx * 8]
                bsum = cropped.reshape(len(idxs), 8, by, 8, bx).sum(axis=(2, 4))
                total = bsum.sum(axis=(1, 2))
                bits = (bsum.reshape(len(idxs), 64) * 64) >= total[:, None]
                ah = (bits.astype(np.uint64) << shifts[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                out[idxs] = ah.view(np.int64)
                valid_any[idxs] = True
            hashes = pd.array(out, dtype="Int64")
            hashes[~valid_any] = pd.NA
            yield pd.DataFrame({id_col: pdf[id_col], "ahash": hashes})

    return df.select(id_col, "bytes", "fmt", "w", "h").mapInPandas(gen, schema)


def resize_images(df: DataFrame, out_size: int, id_col: str = "image_id") -> DataFrame:
    """Nearest-neighbour resize → raw re-encode.

    (id, bytes raw, w, h, fmt, px_sum) — the resize/transcode template.
    Lossy formats would re-encode here (PSNR ≥ 40 dB invariant); with
    stdlib-only codecs the output is raw (lossless). ``px_sum`` is the
    integer sum of the resized pixel values — a per-row checksum of the
    output payload: deterministic, closed-form for the synthetic
    fixture, so the resize path is exactly oracle-checkable (and at
    scale it is the per-partition lineage metric a resumable transcode
    job records per the north rule).
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("px_sum", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, outs, sums = [], [], []
            for iid, data, fmt, w, h in zip(
                pdf[id_col], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                if data is None:
                    ids.append(iid)
                    outs.append(None)
                    sums.append(None)
                    continue
                px = decode_image(bytes(data), fmt, int(w), int(h))
                yi = (np.arange(out_size) * px.shape[0] // out_size).astype(np.int64)
                xi = (np.arange(out_size) * px.shape[1] // out_size).astype(np.int64)
                rs = px[yi][:, xi]
                ids.append(iid)
                outs.append(encode_raw(rs))
                sums.append(int(rs.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "bytes": outs,
                    "w": np.full(len(ids), out_size, dtype=np.int32),
                    "h": np.full(len(ids), out_size, dtype=np.int32),
                    "fmt": ["raw"] * len(ids),
                    "px_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return df.select(id_col, "bytes", "fmt", "w", "h").mapInPandas(gen, schema)
