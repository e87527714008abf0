"""Progressive JPEG (SOF2) codec laws.

The pinning law is cross-mode equality: a progressive stream carries
the SAME quantized coefficients as the baseline stream of the same
image, so decode(encode(px, progressive=True)) must equal
decode(encode(px)) BIT-EXACT — any misplaced bit in the Annex-G
entropy layers (EOB runs, ZRL spans, refinement correction bits,
successive-approximation shifts) either derails the Huffman stream or
changes a coefficient, and the equality catches both. Directed cases
pin the rare paths: deep-ZRL high-frequency blocks, the 0x7FFF EOB-run
flush (driven through the module's own scan emitter/walker primitives,
the same strategy io/jpeg.py uses for decode-only surfaces), and
truncation honesty.
"""

import numpy as np
import pytest

from geomesa_sql_spark.io.jpeg import (
    DCT_A,
    ZIGZAG,
    _AC_BITS_PROG,
    _AC_VALS_PROG,
    _BitReader,
    _decode_table,
    _prog_ac_first_block,
    _prog_ac_refine_block,
    _scan_ac_first,
    _scan_ac_refine,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    px = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5)[..., None]
          + np.arange(3) * 40) % 256
    return px.astype(np.uint8)


@pytest.mark.parametrize("size", [(8, 8), (17, 33), (33, 17), (64, 64), (1, 1)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_equals_baseline(size, sub):
    h, w = size
    for q in (90, 50):
        px = _gradient(h, w)
        base = decode_jpeg(encode_jpeg(px, q, sub))
        prog = decode_jpeg(encode_jpeg(px, q, sub, progressive=True))
        assert (prog == base).all()


def test_progressive_equals_baseline_randomized():
    rng = np.random.default_rng(3)
    for trial in range(12):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        sub = ("444", "420")[trial % 2]
        q = int(rng.integers(20, 96))
        base = decode_jpeg(encode_jpeg(px, q, sub))
        prog = decode_jpeg(encode_jpeg(px, q, sub, progressive=True))
        assert (prog == base).all(), (trial, h, w, sub, q)


def test_progressive_high_frequency_blocks():
    """Blocks whose only energy sits at the end of the zigzag force
    long zero runs (multiple ZRLs) inside the 6-63 band, in both the
    first and the refinement scans."""
    for zi in (35, 60, 62, 63):
        coef = np.zeros((8, 8))
        coef.reshape(-1)[ZIGZAG[zi]] = 400.0
        blk = np.einsum("ji,jk,kl->il", DCT_A, coef, DCT_A) + 128
        px = np.clip(
            np.tile(blk, (2, 2))[..., None].repeat(3, -1), 0, 255
        ).astype(np.uint8)
        for q in (90, 50):
            base = decode_jpeg(encode_jpeg(px, q))
            prog = decode_jpeg(encode_jpeg(px, q, progressive=True))
            assert (prog == base).all(), (zi, q)


def test_eobrun_7fff_flush_roundtrip():
    """40,000 consecutive end-of-band blocks cross the 0x7FFF EOB-run
    cap, forcing a mid-scan flush — driven directly through the scan
    emitter and block walker (a full image that large takes ~30 s)."""
    coefs = np.zeros((40_000, 64), dtype=np.int64)
    coefs[-1, 6] = 5
    order = list(range(len(coefs)))
    blob = _scan_ac_first(coefs, order, 1, 63, 0)
    atab = _decode_table(_AC_BITS_PROG, _AC_VALS_PROG)
    dec = np.zeros_like(coefs, dtype=np.int32)
    rdr = _BitReader(blob + b"\xff\xd9", 0)
    eobrun = 0
    for bi in order:
        eobrun = _prog_ac_first_block(rdr, atab, dec[bi], 1, 63, 0, eobrun)
    assert int(dec.sum()) == 5 and dec[-1, 6] == 5


def test_refinement_scan_emitter_walker_roundtrip():
    """Randomized refinement round trip at the primitive level: start
    from coefficients known at precision Al+1, refine to Al, and check
    the walker reconstructs exactly the encoder's input — including
    interleaved history/newly-significant runs and cross-block EOB
    correction bits."""
    rng = np.random.default_rng(17)
    n = 300
    coefs = np.zeros((n, 64), dtype=np.int64)
    mask = rng.random((n, 64)) < 0.06
    coefs[mask] = rng.integers(-40, 41, int(mask.sum()))
    coefs[:, 0] = 0
    order = list(range(n))
    al = 1
    blob = _scan_ac_refine(coefs, order, 1, 63, al)
    atab = _decode_table(_AC_BITS_PROG, _AC_VALS_PROG)
    # decoder state starts at the Al+1 approximation; magnitudes
    # truncate toward zero in the codec's model, so build from |v|
    dec = (np.sign(coefs) * ((np.abs(coefs) >> (al + 1)) << (al + 1))).astype(np.int32)
    rdr = _BitReader(blob + b"\xff\xd9", 0)
    eobrun = 0
    for bi in order:
        eobrun = _prog_ac_refine_block(rdr, atab, dec[bi], 1, 63, al, eobrun)
    want = np.sign(coefs) * ((np.abs(coefs) >> al) << al)
    assert (dec == want).all()


def test_progressive_truncation_raises():
    px = _gradient(24, 24)
    blob = encode_jpeg(px, 85, progressive=True)
    assert decode_jpeg(blob) is not None
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 3])


def test_progressive_psnr_and_dispatch():
    """decode_image routes progressive payloads like any jpeg, and the
    lossy fidelity bar holds."""
    from geomesa_sql_spark.io.images import decode_image, psnr

    # smooth (non-wrapping) gradient: the 40 dB bar is a statement
    # about natural content, not about sawtooth discontinuities
    px = np.clip(
        np.add.outer(np.arange(48) * 2, np.arange(48) * 2)[..., None]
        + np.arange(3) * 20, 0, 255
    ).astype(np.uint8)
    blob = encode_jpeg(px, 90, progressive=True)
    out = decode_image(blob, "jpeg", 48, 48)
    assert psnr(px, out) >= 40.0
    assert (out == decode_jpeg(encode_jpeg(px, 90))).all()


def test_transcode_images_progressive(spark):
    """The storage-compression stage can emit progressive streams: the
    payload is a real SOF2 file, and its pixels match the baseline
    transcode bit-for-bit (same coefficients law, through Spark)."""
    from geomesa_sql_spark.io.images import encode_png
    from geomesa_sql_spark.ops import transcode_images

    px = _gradient(32, 48)
    df = spark.createDataFrame(
        [("a", encode_png(px), 48, 32, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    prog = transcode_images(df, to="jpeg", quality=90, progressive=True).collect()[0]
    base = transcode_images(df, to="jpeg", quality=90).collect()[0]
    assert b"\xff\xc2" in bytes(prog.bytes) and b"\xff\xc2" not in bytes(base.bytes)
    assert (decode_jpeg(bytes(prog.bytes)) == decode_jpeg(bytes(base.bytes))).all()
    assert prog.psnr_db == base.psnr_db
