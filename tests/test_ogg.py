"""Ogg container (io/ogg.py): FLAC-in-Ogg round trips, page/packet
layer laws (CRC, lacing, continuation across pages, multiplexing),
honest Vorbis/Opus stubs, and the ops-layer integration
(audio_features / transcode_audio with fmt='ogg'). Oracles are exact
sample equality — the FLAC mapping is lossless."""

import struct

import numpy as np
import pytest

from geomesa_sql_spark.io.ogg import (
    _ogg_crc,
    _ogg_pages,
    decode_ogg,
    encode_ogg_flac,
    ogg_packets,
)


def _tone(n=20000, rate=16000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 9000 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 60.0, n)
    return x.astype(np.int16)


def test_roundtrip_mono_multipage():
    x = _tone()
    blob = encode_ogg_flac(x, 16000, block_size=4096)
    assert blob[:4] == b"OggS"
    dec, rate = decode_ogg(blob)
    assert rate == 16000 and dec.shape == (len(x), 1)
    assert (dec[:, 0] == x).all()
    # real compression survives the page overhead
    assert len(blob) < 0.8 * x.nbytes


def test_roundtrip_stereo_and_single_block():
    x = _tone(3000)
    st = np.stack([x, (x * 0.7).astype(np.int16) + 50], axis=1)
    dec, rate = decode_ogg(encode_ogg_flac(st, 44100))
    assert rate == 44100 and (dec == st).all()
    # one audio frame → BOS page + one EOS page
    dec, _ = decode_ogg(encode_ogg_flac(x, 8000, block_size=4096))
    assert (dec[:, 0] == x).all()


def test_packet_spanning_pages():
    # noise at a large block size makes frames far over 65025 bytes
    # (255 laces), forcing continuation pages; decode must reassemble
    rng = np.random.default_rng(3)
    x = rng.integers(-1 << 22, 1 << 22, 40000).astype(np.int64)
    blob = encode_ogg_flac(x, 48000, bps=24, block_size=32768)
    # prove a continuation page exists (header type bit 0 set)
    found = False
    pos = 0
    while pos + 27 <= len(blob):
        if blob[pos + 5] & 1:
            found = True
        nseg = blob[pos + 26]
        pos += 27 + nseg + sum(blob[pos + 27 : pos + 27 + nseg])
    assert found, "no continuation page in the stream"
    dec, rate = decode_ogg(blob)
    assert rate == 48000 and (dec[:, 0] == x).all()


def test_page_layer_rejections():
    blob = encode_ogg_flac(_tone(2000), 8000)
    with pytest.raises(ValueError):
        decode_ogg(b"RIFF" + blob[4:])  # no capture pattern
    with pytest.raises(ValueError):
        decode_ogg(blob[:-3])  # truncated page body
    with pytest.raises(ValueError):
        decode_ogg(blob + b"junk")  # trailing garbage
    # CRC: flip one body byte on the last page
    b = bytearray(blob)
    b[-1] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg(bytes(b))
    # stream structure version must be 0
    b = bytearray(blob)
    b[4] = 1
    with pytest.raises(ValueError, match="version"):
        decode_ogg(bytes(b))


def test_continuation_state_rejections():
    pages, _ = _ogg_pages(5, 0, 0, b"\x7fFLAC" + b"z" * 70000)
    # second page claims continuation with no pending partial: drop page 1
    first_len = 27 + pages[26] + sum(pages[27 : 27 + pages[26]])
    with pytest.raises(ValueError, match="continuation"):
        ogg_packets(pages[first_len:])
    # a fresh page while a packet is pending: rebuild page 2 without
    # the continuation flag (re-CRC so only the flag is wrong)
    rest = bytearray(pages[first_len:])
    rest[5] &= ~1
    rest[22:26] = b"\x00\x00\x00\x00"
    n2 = 27 + rest[26] + sum(rest[27 : 27 + rest[26]])
    struct.pack_into("<I", rest, 22, _ogg_crc(bytes(rest[:n2])))
    with pytest.raises(ValueError, match="unterminated"):
        ogg_packets(bytes(pages[:first_len]) + bytes(rest))
    # stream ending mid-packet (first page only, lacing all 0xff)
    with pytest.raises(ValueError, match="mid-packet"):
        ogg_packets(pages[:first_len])


def test_multiplexed_streams_and_mapping_dispatch():
    blob = encode_ogg_flac(_tone(2000), 8000)
    # interleave an unknown-mapping stream (different serial) first;
    # decode must skip it and find the FLAC stream
    junk, _ = _ogg_pages(99, 0, 0, b"unknown-mapping", first_htype=2)
    dec, rate = decode_ogg(junk + blob)
    assert rate == 8000 and dec.shape[0] == 2000
    packs = ogg_packets(junk + blob)
    assert set(packs) == {99, 0x53474F31}
    assert packs[99] == [b"unknown-mapping"]
    # only unknown mappings → ValueError
    with pytest.raises(ValueError, match="no known stream"):
        decode_ogg(junk)


def test_vorbis_opus_honest_stubs():
    vorbis, _ = _ogg_pages(7, 0, 0, b"\x01vorbis" + b"\x00" * 22,
                           first_htype=2)
    with pytest.raises(NotImplementedError, match="Vorbis"):
        decode_ogg(vorbis)
    opus, _ = _ogg_pages(8, 0, 0, b"OpusHead" + b"\x01\x02" + b"\x00" * 9,
                         first_htype=2)
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_ogg(opus)


def test_metadata_packets_skipped_both_ways():
    """Header-count field honored, and count=0 (unknown) still works
    because metadata packets can't start with the FLAC frame sync."""
    blob = bytearray(encode_ogg_flac(_tone(2000), 8000))
    # claim one trailing header packet and splice a VORBIS_COMMENT-ish
    # packet right after the ID page, as its own page
    first_len = 27 + blob[26] + sum(blob[27 : 27 + blob[26]])
    meta, _ = _ogg_pages(0x53474F31, 1000, -1, b"\x04" + b"\x00" * 10)
    spliced = bytes(blob[:first_len]) + meta + bytes(blob[first_len:])
    dec0, _ = decode_ogg(spliced)  # count says 0: sync filter drops it
    assert (dec0[:, 0] == _tone(2000)).all()
    # now declare the header explicitly: count=1 in the ID packet
    # (offset 7 within the packet = page body), re-CRC the ID page
    b2 = bytearray(spliced)
    body_at = 27 + b2[26]
    struct.pack_into(">H", b2, body_at + 7, 1)
    b2[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", b2, 22, _ogg_crc(bytes(b2[:first_len])))
    dec1, _ = decode_ogg(bytes(b2))
    assert (dec1[:, 0] == _tone(2000)).all()


def test_ops_integration_roundtrip(spark):
    from geomesa_sql_spark.ops.multimodal import audio_features, transcode_audio

    x = _tone(4000)
    rows = [
        ("a", bytes(encode_ogg_flac(x, 16000)), "ogg"),
        ("b", x.tobytes(), "raws16le"),
        ("c", b"OggS\x00garbage-not-a-page", "ogg"),  # survives null
    ]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, fmt string")
    feats = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert feats["a"]["n_samples"] == 4000
    assert feats["c"]["n_samples"] is None
    assert abs(feats["a"]["rms"] - feats["b"]["rms"]) < 1e-9
    # transcode raw → ogg → decode back bit-exact
    out = {r["audio_id"]: r for r in transcode_audio(df, to="ogg").collect()}
    assert out["a"]["lossless"] and out["b"]["lossless"]
    dec, rate = decode_ogg(bytes(out["b"]["bytes"]))
    assert rate == 16000 and (dec[:, 0] == x).all()
