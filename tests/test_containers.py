"""RIFF media containers (io/containers.py): WAV PCM + MJPEG AVI.

Real decode for wav/mjpeg payloads through the multimodal ops; loud
raises for codecs that genuinely need external decoders; corrupt
containers survive as null rows (the 100 TB pass contract).
"""

import struct

import numpy as np
import pytest

from geomesa_sql_spark.io.containers import (
    decode_wav,
    encode_mjpeg_avi,
    encode_wav,
    mjpeg_avi_frames,
)
from geomesa_sql_spark.io.images import psnr
from geomesa_sql_spark.io.jpeg import decode_jpeg, encode_jpeg


def _tone(n=2000, freq=440.0, rate=16000, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def _frame(i, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5 + i * 40) % 256, (yy * 7) % 256, (xx + yy + i) % 256], axis=-1
    ).astype(np.uint8)


def test_wav_roundtrip_mono_and_stereo():
    mono = _tone()
    x, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and x.shape == (2000, 1) and (x[:, 0] == mono).all()
    stereo = np.stack([mono, -mono], axis=1)
    x, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and x.shape == (2000, 2) and (x == stereo).all()


def test_wav_rejections():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 8)
    good = encode_wav(_tone(100), 8000)
    # flip the audio format field to 3 (IEEE float): loud raise
    fmt_pos = good.index(b"fmt ") + 8
    bad = bytearray(good)
    bad[fmt_pos] = 3
    with pytest.raises(NotImplementedError, match="PCM 16-bit"):
        decode_wav(bytes(bad))
    # missing data chunk
    with pytest.raises(ValueError, match="missing"):
        decode_wav(good[: good.index(b"data")])


def test_mjpeg_avi_roundtrip_and_psnr():
    frames = [_frame(i) for i in range(5)]
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    avi = encode_mjpeg_avi(jpegs, 32, 24, fps=10)
    got = mjpeg_avi_frames(avi)
    assert len(got) == 5
    for f, j in zip(frames, got):
        assert psnr(f, decode_jpeg(j)) >= 40.0


def test_mjpeg_avi_rejections():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        mjpeg_avi_frames(b"RIFF\x04\x00\x00\x00WEBP")
    # foreign codec fourcc in strh: loud raise
    avi = bytearray(encode_mjpeg_avi([b"\xff\xd8\xff\xd9"], 4, 4))
    pos = avi.index(b"vids") + 4
    avi[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        mjpeg_avi_frames(bytes(avi))


def test_frame_sample_mjpeg_distributed(spark):
    from geomesa_sql_spark.ops.multimodal import frame_sample

    frames = [_frame(i) for i in range(6)]
    avi = encode_mjpeg_avi([encode_jpeg(f, quality=90) for f in frames], 32, 24)
    rows = [
        ("vid0", avi, 32, 24, "mjpeg"),
        ("vid_corrupt", avi[:40], 32, 24, "mjpeg"),
        ("vid_null", None, 32, 24, "mjpeg"),
    ]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w int, h int, fmt string"
    )
    out = frame_sample(df, every_n=2).toPandas()
    good = out[out.video_id == "vid0"].sort_values("frame_idx")
    assert list(good.frame_idx) == [0, 2, 4]
    for _, r in good.iterrows():
        px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(
            int(r["h"]), int(r["w"]), 3
        )
        assert psnr(_frame(int(r["frame_idx"])), px) >= 40.0
    # corrupt and null payloads survive as single null rows
    for vid in ("vid_corrupt", "vid_null"):
        sub = out[out.video_id == vid]
        assert len(sub) == 1 and sub["bytes"].iloc[0] is None


def test_audio_features_wav_distributed(spark):
    from geomesa_sql_spark.ops.multimodal import audio_features

    mono = _tone()
    stereo = np.stack([mono, np.zeros_like(mono)], axis=1)
    rows = [
        ("a_mono", encode_wav(mono, 16000), "wav"),
        ("a_stereo", encode_wav(stereo, 16000), "wav"),
        ("a_raw", mono.astype("<i2").tobytes(), "raws16le"),
        ("a_corrupt", b"RIFFxxxxWAVE", "wav"),
        ("a_null", None, "wav"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = audio_features(df).toPandas().set_index("audio_id")
    x = mono.astype(np.float64)
    want_rms = float(np.sqrt((x * x).mean()))
    s = np.signbit(x)
    want_zc = int((s[1:] != s[:-1]).sum())
    # wav channel 0 == the bare PCM dump == the stereo left channel
    for aid in ("a_mono", "a_stereo", "a_raw"):
        r = out.loc[aid]
        assert r["n_samples"] == 2000
        assert abs(r["rms"] - want_rms) < 1e-9
        assert r["zero_crossings"] == want_zc
        assert r["peak"] == int(np.abs(mono).max())
    for aid in ("a_corrupt", "a_null"):
        assert out.loc[aid].isna().all()


def test_audio_features_float_wav_raises(spark):
    from geomesa_sql_spark.ops.multimodal import audio_features

    good = bytearray(encode_wav(_tone(50), 8000))
    good[good.index(b"fmt ") + 8] = 3  # IEEE float
    df = spark.createDataFrame(
        [("a", bytes(good), "wav")], "audio_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="PCM 16-bit"):
        audio_features(df).collect()
