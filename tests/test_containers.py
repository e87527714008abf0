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
    # flip the audio format to 0x55 (mp3-in-WAV): loud raise
    # (a-law/mu-law and MS ADPCM decode for real since r4g)
    fmt_pos = good.index(b"fmt ") + 8
    bad = bytearray(good)
    bad[fmt_pos] = 0x55
    with pytest.raises(NotImplementedError, match="0x55"):
        decode_wav(bytes(bad))
    # missing data chunk
    with pytest.raises(ValueError, match="missing"):
        decode_wav(good[: good.index(b"data")])


def test_wav_sample_widths_and_float():
    mono = _tone(500)
    base = encode_wav(mono, 8000)
    fmt_at = base.index(b"fmt ") + 8
    data_at = base.index(b"data")

    def rebuild(audio_format, bits, payload, block_align=None):
        fmt = struct.pack(
            "<HHIIHH", audio_format, 1, 8000, 8000, block_align or bits // 8, bits
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    # 8-bit unsigned
    x8 = ((mono.astype(np.int64) >> 8) + 128).astype(np.uint8)
    got, _ = decode_wav(rebuild(1, 8, x8.tobytes()))
    assert (got[:, 0] == x8.astype(np.int64) - 128).all()
    # 24-bit signed (low 3 bytes of int32 LE)
    x24 = mono.astype(np.int64) << 7
    b32 = (x24.astype("<i4")).tobytes()
    b24 = np.frombuffer(b32, np.uint8).reshape(-1, 4)[:, :3].tobytes()
    got, _ = decode_wav(rebuild(1, 24, b24))
    assert (got[:, 0] == x24).all()
    # 32-bit signed
    got, _ = decode_wav(rebuild(1, 32, (mono.astype("<i4") * 65536).tobytes()))
    assert (got[:, 0] == mono.astype(np.int64) * 65536).all()
    # float32, scaled to the 16-bit range on decode
    f32 = (mono.astype(np.float64) / 32767.0).astype("<f4")
    got, _ = decode_wav(rebuild(3, 32, f32.tobytes()))
    assert np.abs(got[:, 0] - mono).max() <= 1
    # EXTENSIBLE wrapper around PCM-16
    ext = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22, 16, 1)
    ext += struct.pack("<H", 1) + b"\x00" * 14  # sub-format GUID leads with PCM
    chunks = b"fmt " + struct.pack("<I", len(ext)) + ext
    pay = mono.astype("<i2").tobytes()
    chunks += b"data" + struct.pack("<I", len(pay)) + pay
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    got, _ = decode_wav(wav)
    assert (got[:, 0] == mono).all()


def _ima_encode_scalar(x, block_samples=505):
    """Reference IMA ADPCM encoder (scalar, per-block) for test input."""
    from geomesa_sql_spark.io.containers import _IMA_INDEX, _IMA_STEPS

    out = bytearray()
    for s in range(0, len(x) - (len(x) % block_samples), block_samples):
        blk = x[s : s + block_samples].astype(np.int64)
        pred, index = int(blk[0]), 0
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for v in blk[1:]:
            step = int(_IMA_STEPS[index])
            diff = int(v) - pred
            n = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            delta = (step >> 3) + (step >> 2 if n & 1 else 0) + \
                (step >> 1 if n & 2 else 0) + (step if n & 4 else 0)
            pred = int(np.clip(pred + (-delta if n & 8 else delta), -32768, 32767))
            index = int(np.clip(index + _IMA_INDEX[n & 7], 0, 88))
            nibbles.append(n)
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out)


def test_wav_ima_adpcm_vectorized_matches_scalar():
    from geomesa_sql_spark.io.containers import _decode_ima_adpcm

    mono = _tone(505 * 4, freq=220.0)
    payload = _ima_encode_scalar(mono)
    block_align = 4 + 252  # header + 504 nibbles
    got = _decode_ima_adpcm(payload, 1, block_align)
    assert got.shape == (505 * 4, 1)
    # lossy codec: reconstruction tracks the source closely
    err = got[:, 0] - mono.astype(np.int64)
    assert np.abs(err).mean() < 200
    # scalar reference decode must match the vectorized one EXACTLY
    from geomesa_sql_spark.io.containers import _IMA_INDEX, _IMA_STEPS

    ref = []
    for b in range(4):
        blk = payload[b * block_align : (b + 1) * block_align]
        pred, index = struct.unpack_from("<hB", blk)[0], blk[2]
        ref.append(pred)
        for byte in blk[4:]:
            for n in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEPS[index])
                delta = (step >> 3) + (step >> 2 if n & 1 else 0) + \
                    (step >> 1 if n & 2 else 0) + (step if n & 4 else 0)
                pred = int(np.clip(pred + (-delta if n & 8 else delta), -32768, 32767))
                index = int(np.clip(index + int(_IMA_INDEX[n & 7]), 0, 88))
                ref.append(pred)
    assert (got[:, 0] == np.array(ref)).all()


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


def test_audio_features_unknown_wav_codec_raises(spark):
    from geomesa_sql_spark.ops.multimodal import audio_features

    good = bytearray(encode_wav(_tone(50), 8000))
    good[good.index(b"fmt ") + 8] = 0x55  # mp3-in-WAV: genuinely unimplemented
    df = spark.createDataFrame(
        [("a", bytes(good), "wav")], "audio_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="0x55"):
        audio_features(df).collect()


def test_mjpeg_avi_truncated_mid_frame_raises():
    # review r4f: a truncated final frame silently returned a shorter
    # frame list that looked complete downstream
    from geomesa_sql_spark.io.containers import mjpeg_avi_frames

    frames = [_frame(i) for i in range(3)]
    avi = encode_mjpeg_avi([encode_jpeg(f, quality=85) for f in frames], 32, 24)
    with pytest.raises(ValueError, match="truncated"):
        mjpeg_avi_frames(avi[: len(avi) - 10])


def test_ima_adpcm_fact_trim_and_partial_block():
    from geomesa_sql_spark.io.containers import decode_wav

    mono = _tone(505 * 2)
    payload = _ima_encode_scalar(mono)
    block_align = 4 + 252

    def wav(payload, fact=None):
        fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, block_align, 4)
        c = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if fact is not None:
            c += b"fact" + struct.pack("<II", 4, fact)[:8]
        c += b"data" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            c += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(c)) + b"WAVE" + c

    # fact chunk trims encoder pad samples off the final block
    got, _ = decode_wav(wav(payload, fact=1000))
    assert got.shape == (1000, 1)
    with pytest.raises(ValueError, match="fact"):
        decode_wav(wav(payload, fact=99999))
    # a partial trailing block is a truncation, not silent data loss
    with pytest.raises(ValueError, match="whole number"):
        decode_wav(wav(payload[:-7]))


def test_wav_g711_alaw_mulaw():
    """G.711 decode law: an independent segment-search encoder (the
    classic linear2ulaw/linear2alaw construction, written here against
    the published segment tables) round-trips through decode_wav within
    G.711 quantization error, and the canonical anchor codes decode to
    their published values."""

    def rebuild(audio_format, payload):
        fmt = struct.pack("<HHIIHH", audio_format, 1, 8000, 8000, 1, 8)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    seg_ends = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]

    def lin2ulaw(x):
        sign = 0x80 if x < 0 else 0
        x = min(abs(x), 32635) + 0x84
        seg = next(i for i, e in enumerate(seg_ends) if x <= e)
        man = (x >> (seg + 3)) & 0xF
        return (~(sign | (seg << 4) | man)) & 0xFF

    def lin2alaw(x):
        sign = 0x80 if x >= 0 else 0
        x = min(abs(x), 32767) >> 3  # to the 13-bit a-law domain
        if x < 0x20:
            code = x >> 1  # segment 0: step 2
        else:
            seg = max(1, x.bit_length() - 5)
            code = (seg << 4) | ((x >> seg) & 0xF)
        return (sign | code) ^ 0x55

    xs = np.concatenate([
        np.array([0, 1, -1, 7, -8, 100, -100, 1000, -1000, 8000, -8000,
                  32000, -32000, 32767, -32768]),
        np.linspace(-32768, 32767, 301).astype(np.int64),
    ])
    mu_codes = bytes(lin2ulaw(int(v)) for v in xs)
    got, rate = decode_wav(rebuild(7, mu_codes))
    assert rate == 8000
    err = np.abs(got[:, 0] - np.clip(xs, -32635, 32635))
    # mu-law quantization interval at |x| is ~ (|x| + 132) / 16
    assert (err <= (np.abs(xs) + 132) / 16 + 4).all()

    a_codes = bytes(lin2alaw(int(v)) for v in xs)
    got, _ = decode_wav(rebuild(6, a_codes))
    err = np.abs(got[:, 0] - xs)
    assert (err <= np.maximum(np.abs(xs) / 16, 16) + 8).all()

    # published anchors: mu wire 0xFF -> 0, 0x7F -> 0 (negative zero),
    # 0x00 -> -32124, 0x80 -> +32124; a wire 0x55 -> -8, 0xD5 -> +8,
    # 0x2A -> -32256, 0xAA -> +32256
    anchors_mu = {0xFF: 0, 0x7F: 0, 0x00: -32124, 0x80: 32124}
    got, _ = decode_wav(rebuild(7, bytes(anchors_mu)))
    assert got[:, 0].tolist() == list(anchors_mu.values())
    anchors_a = {0x55: -8, 0xD5: 8, 0x2A: -32256, 0xAA: 32256}
    got, _ = decode_wav(rebuild(6, bytes(anchors_a)))
    assert got[:, 0].tolist() == list(anchors_a.values())

    # G.711 with a non-8-bit width is corrupt, not unsupported
    with pytest.raises(ValueError):
        decode_wav(rebuild(7, mu_codes)[:20] + b"")  # truncated fmt


def _ms_decode_scalar(payload, channels, block_align):
    """Independent per-sample reference decode of MS ADPCM, straight
    from the spec pseudo-code (trunc division, per-channel state)."""
    COEFFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
              (460, -208), (392, -232)]
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409,
             307, 230, 230, 230]
    out = []
    for at in range(0, len(payload), block_align):
        blk = payload[at:at + block_align]
        ch = channels
        pidx = [blk[c] for c in range(ch)]
        def i16(o):
            v = blk[o] | (blk[o + 1] << 8)
            return v - ((v >> 15) << 16)
        delta = [i16(ch + 2 * c) for c in range(ch)]
        s1 = [i16(3 * ch + 2 * c) for c in range(ch)]
        s2 = [i16(5 * ch + 2 * c) for c in range(ch)]
        rows = [list(s2), list(s1)]
        nibs = []
        for b in blk[7 * ch:]:
            nibs += [b >> 4, b & 0x0F]
        nibs = nibs[: (len(nibs) // ch) * ch]
        row = []
        for i, n in enumerate(nibs):
            c = i % ch
            signed = n - 16 if n & 8 else n
            acc = s1[c] * COEFFS[pidx[c]][0] + s2[c] * COEFFS[pidx[c]][1]
            pred = (abs(acc) >> 8) * (1 if acc >= 0 else -1) + signed * delta[c]
            pred = max(-32768, min(32767, pred))
            s2[c], s1[c] = s1[c], pred
            delta[c] = max((ADAPT[n] * delta[c]) >> 8, 16)
            row.append(pred)
            if c == ch - 1:
                rows.append(row)
                row = []
        out += rows
    return np.array(out, dtype=np.int64)


def test_wav_ms_adpcm_vectorized_matches_scalar():
    """Random valid MS-ADPCM blocks: the vectorized cross-block decode
    equals a straight per-sample reference bit-for-bit, mono and
    stereo, including negative-sum trunc division and delta floors."""
    rng = np.random.default_rng(23)
    for channels in (1, 2):
        block_align = 7 * channels + 32 * channels  # 66 samples/block
        nblocks = 12
        payload = bytearray()
        for _ in range(nblocks):
            for c in range(channels):
                payload.append(int(rng.integers(0, 7)))
            for _ in range(3 * channels):  # delta, s1, s2 per channel
                payload += int(rng.integers(-30000, 30000)).to_bytes(
                    2, "little", signed=True)
            payload += bytes(rng.integers(0, 256, 32 * channels,
                                          ).astype(np.uint8).tobytes())
        # deltas must start positive to be spec-valid
        pb = bytearray(payload)
        fmt = struct.pack("<HHIIHH", 2, channels, 8000,
                          8000, block_align, 4)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(pb)) + bytes(pb)
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        got, rate = decode_wav(wav)
        want = _ms_decode_scalar(bytes(pb), channels, block_align)
        assert got.shape == want.shape
        assert (got == want).all()

    # predictor index > 6 is corrupt, not a table overrun
    bad = bytearray(payload)
    bad[0] = 9
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(bad)) + bytes(bad)
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(wav)


def test_wav_ms_adpcm_tone_roundtrip():
    """A simple spec-shaped encoder (predictor 0, adaptive delta) round
    trips a tone through decode_wav within ADPCM quantization error."""
    tone = _tone(660, freq=300.0, rate=8000, amp=9000)
    spb, ch = 66, 1
    block_align = 7 + (spb - 2) // 2
    payload = bytearray()
    i = 0
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409,
             307, 230, 230, 230]
    x = tone.astype(np.int64).tolist()
    x += [0] * (-len(x) % spb)
    while i < len(x):
        blk = x[i:i + spb]
        i += spb
        s2, s1, delta = blk[0], blk[1], 128
        payload.append(0)  # predictor 0: coeffs (256, 0)
        payload += int(delta).to_bytes(2, "little", signed=True)
        payload += int(s1).to_bytes(2, "little", signed=True)
        payload += int(s2).to_bytes(2, "little", signed=True)
        nibs = []
        for v in blk[2:]:
            pred = s1  # coeff (256, 0): prediction is s1
            n = max(-8, min(7, round((v - pred) / delta)))
            dec = max(-32768, min(32767, pred + n * delta))
            s2, s1 = s1, dec
            delta = max((ADAPT[n & 0xF] * delta) >> 8, 16)
            nibs.append(n & 0xF)
        for a, b in zip(nibs[0::2], nibs[1::2]):
            payload.append((a << 4) | b)
    fmt = struct.pack("<HHIIHH", 2, ch, 8000, 8000, block_align, 4)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + bytes(payload)
    chunks += b""
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    got, rate = decode_wav(wav)
    assert rate == 8000
    dec = got[: len(tone), 0].astype(np.float64)
    err = np.abs(dec - tone)
    assert err.mean() < 200 and err.max() < 2000
