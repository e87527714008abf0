"""From-scratch FLAC codec (io/flac.py): lossless round trips, foreign
decode-only paths via hand-assembled streams (same strategy as
io/jpeg.py / io/webp.py), integrity rejection, and the audio_features
integration. Oracles are exact sample equality — FLAC is lossless."""

import hashlib

import numpy as np
import pytest

import geomesa_sql_spark.io.flac as fl
from geomesa_sql_spark.io.flac import BitWriter, crc8, crc16, decode_flac, encode_flac


def _tone(n=20000, rate=16000, noise=60.0, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 9000 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, noise, n)
    return x.astype(np.int16)


def test_roundtrip_mono_and_compression():
    x = _tone()
    enc = encode_flac(x, 16000)
    dec, rate = decode_flac(enc)
    assert rate == 16000 and dec.shape == (len(x), 1)
    assert (dec[:, 0] == x).all()
    # real compression, not a stored format
    assert len(enc) < 0.7 * x.nbytes
    # LPC engaged: tonal signals compress better than fixed-only
    assert len(enc) < len(encode_flac(x, 16000, max_lpc=0))


def test_roundtrip_stereo_all_modes():
    x = _tone()
    st = np.stack([x, (x * 0.7).astype(np.int16) + 50], axis=1)
    for mode in ("auto", "indep", "left_side", "right_side", "mid_side"):
        dec, _ = decode_flac(encode_flac(st, 44100, stereo=mode))
        assert (dec == st).all(), mode


def test_roundtrip_edge_inputs():
    rng = np.random.default_rng(3)
    cases = [
        rng.integers(-32768, 32768, 5000).astype(np.int16),  # noise → Rice2
        np.full(1000, -12345, np.int16),  # constant
        _tone(5001),  # non-multiple of the block size
        np.array([7], np.int16),  # single sample
    ]
    for x in cases:
        dec, _ = decode_flac(encode_flac(x, 8000, block_size=1000))
        assert (dec[:, 0] == x).all()
    dec, _ = decode_flac(encode_flac(np.zeros(0, np.int16), 8000))
    assert dec.shape == (0, 1)
    # partitioned residuals
    x = _tone(8192)
    dec, _ = decode_flac(encode_flac(x, 8000, partition_order=3))
    assert (dec[:, 0] == x).all()


def test_roundtrip_bit_depths():
    x = _tone(4000)
    for bps, arr in ((8, (x >> 8).astype(np.int8)), (24, x.astype(np.int64) << 7)):
        dec, _ = decode_flac(encode_flac(arr, 8000, bps=bps))
        assert (dec[:, 0] == arr).all()
    with pytest.raises(ValueError, match="range"):
        encode_flac(x.astype(np.int64) * 100, 8000, bps=16)


def test_integrity_rejections():
    x = _tone(3000)
    enc = bytearray(encode_flac(x, 16000))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"OggS" + bytes(enc[4:]))
    # flip one sample bit mid-frame: CRC-16 (or header CRC-8) catches it
    bad = enc.copy()
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC|FLAC|MD5"):
        decode_flac(bytes(bad))
    # tamper the STREAMINFO MD5: decode must notice
    bad = enc.copy()
    md5_at = bytes(enc).index(hashlib.md5(x.astype("<i2").tobytes()).digest())
    bad[md5_at] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="truncated|sync"):
        decode_flac(bytes(enc[: len(enc) - 10]))


def _streaminfo(n, rate, channels, bps, pcm_md5):
    bw = BitWriter()
    bw.write(4096, 16)
    bw.write(4096, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n, 36)
    body = bw.getvalue() + pcm_md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_wrap(header_tail_bw, body_bw):
    """Assemble sync+header (CRC-8) + subframe body (CRC-16)."""
    hdr = header_tail_bw.getvalue()
    hdr += bytes([crc8(hdr)])
    frame = hdr + body_bw.getvalue()
    return frame + crc16(frame).to_bytes(2, "big")


def _frame_header(block, ch_code=0, bps_code=4):
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit block size follows
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0
    bw.write(block - 1, 16)
    return bw


def test_decode_verbatim_subframe_hand_assembled():
    x = np.array([100, -5, 32767, -32768, 0, 17], np.int64)
    body = BitWriter()
    body.write(0, 1)
    body.write(1, 6)  # VERBATIM
    body.write(0, 1)
    for v in x:
        body.write(int(v) & 0xFFFF, 16)
    data = _streaminfo(len(x), 8000, 1, 16, b"\x00" * 16) + _frame_wrap(
        _frame_header(len(x)), body
    )
    dec, _ = decode_flac(data)
    assert (dec[:, 0] == x).all()


def test_decode_wasted_bits_hand_assembled():
    # samples all share 3 trailing zero bits; stored shifted at bps-3
    x = np.array([8, -16, 64, 24, -8, 0, 8, 8], np.int64)
    body = BitWriter()
    body.write(0, 1)
    body.write(8, 6)  # FIXED order 0
    body.write(1, 1)  # wasted-bits flag
    body.write(1, 3)  # unary 2 zeros + 1 → wasted = 3
    # residual: order-0 fixed over x >> 3, Rice k=2
    fl._encode_subframe  # (module sanity: primitives come from io/flac)
    body.write(0, 2)
    body.write(0, 4)
    body.write(2, 4)
    fl._emit_rice(body, x >> 3, 2)
    data = _streaminfo(len(x), 8000, 1, 16, b"\x00" * 16) + _frame_wrap(
        _frame_header(len(x)), body
    )
    dec, _ = decode_flac(data)
    assert (dec[:, 0] == x).all()


def test_decode_escape_partition_hand_assembled():
    x = np.array([1, -2, 3, -4, 5, -6, 7, -8], np.int64)
    body = BitWriter()
    body.write(0, 1)
    body.write(8, 6)  # FIXED order 0
    body.write(0, 1)
    body.write(0, 2)  # 4-bit Rice method
    body.write(1, 4)  # partition order 1 → two partitions
    body.write(15, 4)  # partition 1: ESCAPE
    body.write(5, 5)  # raw 5-bit residuals
    for v in x[:4]:
        body.write(int(v) & 0x1F, 5)
    body.write(2, 4)  # partition 2: Rice k=2
    fl._emit_rice(body, x[4:], 2)
    data = _streaminfo(len(x), 8000, 1, 16, b"\x00" * 16) + _frame_wrap(
        _frame_header(len(x)), body
    )
    dec, _ = decode_flac(data)
    assert (dec[:, 0] == x).all()


def test_decode_rejects_reserved_forms():
    x = np.array([1, 2, 3, 4], np.int64)
    body = BitWriter()
    body.write(0, 1)
    body.write(2, 6)  # reserved subframe type
    body.write(0, 1)
    data = _streaminfo(len(x), 8000, 1, 16, b"\x00" * 16) + _frame_wrap(
        _frame_header(len(x)), body
    )
    with pytest.raises(ValueError, match="reserved"):
        decode_flac(data)


def test_audio_features_flac_distributed(spark):
    from geomesa_sql_spark.ops.multimodal import audio_features

    mono = _tone(4000)
    rows = [
        ("f_good", encode_flac(mono, 16000), "flac"),
        ("f_raw", mono.astype("<i2").tobytes(), "raws16le"),
        ("f_corrupt", b"fLaC" + b"\x00" * 20, "flac"),
        ("f_null", None, "flac"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = audio_features(df).toPandas().set_index("audio_id")
    x = mono.astype(np.float64)
    for aid in ("f_good", "f_raw"):
        r = out.loc[aid]
        assert r["n_samples"] == 4000
        assert abs(r["rms"] - float(np.sqrt((x * x).mean()))) < 1e-9
        assert r["peak"] == int(np.abs(mono).max())
    for aid in ("f_corrupt", "f_null"):
        assert out.loc[aid].isna().all()


def test_full_scale_32bit_noise_bounded_and_lossless():
    # review r4f: a 32-bit full-scale zigzag mean used to fall outside
    # the Rice-k search range, falling back to k=0 (≈2^32-bit unary
    # runs — an effective hang); clamped now
    rng = np.random.default_rng(11)
    x = rng.integers(-(2**31), 2**31 - 2**20, 512).astype(np.int64)
    x[0] = -(2**31)
    x[1] = 2**31 - 1
    dec, _ = decode_flac(encode_flac(x, 48000, bps=32, block_size=256))
    assert (dec[:, 0].astype(np.int64) == x).all()


def test_encode_rejects_out_of_field_rate_and_block():
    x = _tone(100)
    with pytest.raises(ValueError, match="20-bit"):
        encode_flac(x, 2_822_400)  # DSD64 rate exceeds the field
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(x, 8000, block_size=8)


def test_audio_features_32bit_peak_survives(spark):
    # review r4f: full-scale 32-bit |peak| = 2^31 overflowed an Int32
    # column and killed the task
    from geomesa_sql_spark.ops.multimodal import audio_features

    x = np.zeros(64, np.int64)
    x[3] = -(2**31)
    df = spark.createDataFrame(
        [("deep", encode_flac(x, 8000, bps=32), "flac")],
        "audio_id string, bytes binary, fmt string",
    )
    out = audio_features(df).toPandas().set_index("audio_id")
    assert int(out.loc["deep", "peak"]) == 2**31


def test_transcode_audio_distributed(spark):
    from geomesa_sql_spark.io.containers import encode_wav
    from geomesa_sql_spark.ops.multimodal import transcode_audio

    mono = _tone(8000)
    stereo = np.stack([mono, (-mono // 2).astype(np.int16)], axis=1)
    deep = mono.astype(np.int64) << 7  # needs 24-bit FLAC
    rows = [
        ("wav_in", encode_wav(stereo, 16000), "wav"),
        ("raw_in", mono.astype("<i2").tobytes(), "raws16le"),
        ("flac_in", encode_flac(deep, 16000, bps=24), "flac"),
        ("corrupt", b"RIFFxxxxWAVE", "wav"),
        ("nul", None, "wav"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = transcode_audio(df, to="flac").toPandas().set_index("audio_id")
    # wav→flac: real compression, lossless, bit-exact round trip
    r = out.loc["wav_in"]
    assert r["ratio"] < 0.8 and bool(r["lossless"])
    back, rate = decode_flac(bytes(r["bytes"]))
    assert rate == 16000 and (back == stereo).all()
    assert out.loc["raw_in", "n_samples"] == 8000
    # 24-bit source survives bit-exact through inferred bps
    back, _ = decode_flac(bytes(out.loc["flac_in", "bytes"]))
    assert (back[:, 0] == deep).all()
    for aid in ("corrupt", "nul"):
        assert out.loc[aid, "bytes"] is None
    # flac→wav on a 24-bit source is NOT lossless (clipped) and says so
    wavout = transcode_audio(df.where("audio_id = 'flac_in'"), to="wav").toPandas()
    assert not bool(wavout["lossless"].iloc[0])
