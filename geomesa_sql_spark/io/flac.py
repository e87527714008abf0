"""From-scratch FLAC codec — numpy + stdlib only.

The graft input table's audio payloads carry a ``fmt`` column;
``audio_features`` decoded only raw PCM dumps (``raws16le``) and WAV
containers — every *compressed* audio format was an honest stub (no
codec libs in this container). FLAC is the one mainstream compressed
audio format that is fully tractable from scratch: lossless, integer
LPC + Rice coding, public spec (RFC 9639, "Free Lossless Audio Codec").
The reference engine (bxkftechteam/geomesa-sql) has no media code —
this sits on the payload side of the graft, same as ``io/jpeg.py`` and
``io/webp.py``. The Ogg container walk lives in ``io/ogg.py`` (FLAC-
in-Ogg feeds this module); mp3/vorbis/opus stay loud stubs: those need
psychoacoustic transform codecs, not a container walk.

Decoder — the general foreign-file surface:
  - STREAMINFO + all metadata blocks (skipped except STREAMINFO)
  - frame headers: both blocking strategies, all block-size / sample
    rate / sample-size codes, UTF-8-coded frame/sample numbers, CRC-8
    verified; frame CRC-16 verified; MD5 of the decoded stream verified
    against STREAMINFO when present
  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32,
    wasted bits
  - residual: 4-bit and 5-bit Rice partitions, escape (raw) partitions
  - stereo decorrelation: left/side, right/side, mid/side

Encoder — deterministic, real compression (not a stored format):
  - per-subframe choice across CONSTANT / FIXED 0-4 / quantized
    Levinson-Durbin LPC by exact Rice-cost accounting
  - Rice parameter per partition (configurable partition order)
  - all four stereo modes (cost-chosen by default)
  - vectorized residual emit (zigzag/quotient fields via np.packbits)

Fixed-predictor reconstruction is vectorized (iterated cumsum); LPC
reconstruction is an inherently sequential integer IIR, kept as a tight
bounded loop per subframe.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from geomesa_sql_spark.io.errors import clean_decode

# ---------------------------------------------------------------------------
# bit I/O — FLAC packs bits MSB-first within bytes.


class BitReader:
    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # next byte index
        self.buf = 0  # bounded: < 64 live bits (top-aligned at LSB end)
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        val = self.buf >> self.nbits
        self.buf &= (1 << self.nbits) - 1
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1 bit (the 1 is consumed)."""
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("truncated FLAC stream")
                self.buf = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.buf == 0:  # all remaining live bits are zero
                q += self.nbits
                self.nbits = 0
                continue
            lead = self.nbits - self.buf.bit_length()  # zeros before first 1
            q += lead
            self.nbits -= lead + 1
            self.buf &= (1 << self.nbits) - 1
            return q

    def bit_pos(self) -> int:
        return self.pos * 8 - self.nbits

    def align_byte(self) -> None:
        pad = self.nbits & 7
        if pad:
            if self.read(pad):
                raise ValueError("non-zero FLAC frame padding")


class BitWriter:
    """Collects (value, nbits) fields ≤ 32 bits; packs MSB-first at the
    end via np.packbits (no per-bit Python loop — io/jpeg.py lesson)."""

    __slots__ = ("chunks",)

    def __init__(self):
        self.chunks: list[tuple[np.ndarray, np.ndarray]] = []

    def write(self, val: int, n: int) -> None:
        while n > 32:
            self.write(val >> (n - 32), 32)
            val &= (1 << (n - 32)) - 1
            n -= 32
        if n:
            self.chunks.append(
                (np.array([val], dtype=np.uint64), np.array([n], dtype=np.int64))
            )

    def write_fields(self, vals: np.ndarray, ns: np.ndarray) -> None:
        """Bulk append: each field emitted MSB-first, widths ≤ 32."""
        self.chunks.append(
            (vals.astype(np.uint64, copy=False), ns.astype(np.int64, copy=False))
        )

    def bit_len(self) -> int:
        return int(sum(int(n.sum()) for _, n in self.chunks))

    def getvalue(self) -> bytes:
        """Pad to a byte boundary with zeros and pack."""
        if not self.chunks:
            return b""
        vs = np.concatenate([c[0] for c in self.chunks])
        ns = np.concatenate([c[1] for c in self.chunks])
        out = bytearray()
        carry = np.zeros(0, dtype=np.uint8)
        ar = np.arange(32, dtype=np.uint64)
        step = 1 << 20
        for s in range(0, len(vs), step):
            v = vs[s : s + step]
            n = ns[s : s + step]
            # MSB-first: bit j of an n-bit field is (v >> (n-1-j)) & 1
            sh = (n[:, None] - 1 - ar.astype(np.int64)).clip(min=0).astype(np.uint64)
            bits = ((v[:, None] >> sh) & np.uint64(1)).astype(np.uint8)
            flat = bits[ar < n[:, None]]
            flat = np.concatenate([carry, flat]) if len(carry) else flat
            aligned = len(flat) & ~7
            out += np.packbits(flat[:aligned], bitorder="big").tobytes()
            carry = flat[aligned:]
        if len(carry):
            out += np.packbits(carry, bitorder="big").tobytes()
        return bytes(out)


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005; init 0)


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tab[b] = r
    return tab


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16[(r >> 8) ^ b]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# frame-header coded numbers (UTF-8-style, up to 36 bits)


def _utf8ish_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # capacity of a k-byte coded number is (7-k) + 6(k-1) = 1+5k bits
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _utf8ish_decode(br: BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# decoder

_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_BLOCKSIZE_CODE.update({c: 256 << (c - 8) for c in range(8, 16)})
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


@clean_decode
def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int32 samples, sample_rate).

    Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 (when present),
    so silent corruption raises instead of returning wrong audio.
    """
    if len(data) < 4 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("truncated STREAMINFO")
            br = BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24), br.read(24)  # min/max frame size
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, channels, bps, total, md5)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    rate, channels, bps, total, md5 = info

    out: list[np.ndarray] = []
    got = 0
    while (total == 0 and pos < len(data)) or (total and got < total):
        block, pos = _decode_frame(data, pos, info)
        out.append(block)
        got += len(block)
    samples = (
        np.concatenate(out, axis=0) if out else np.zeros((0, channels), np.int32)
    )
    if total:
        samples = samples[:total]
    if md5 != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(samples, bps)).digest() != md5:
            raise ValueError("FLAC MD5 mismatch: decoded audio is corrupt")
    return samples, rate


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian PCM as hashed by the STREAMINFO MD5."""
    nbytes = (bps + 7) // 8
    if nbytes == 2:
        return samples.astype("<i2").tobytes()
    if nbytes == 1:
        return samples.astype(np.int8).tobytes()
    if nbytes == 4:
        return samples.astype("<i4").tobytes()
    # 24-bit: low 3 bytes of little-endian int32
    b = samples.astype("<i4").tobytes()
    a = np.frombuffer(b, np.uint8).reshape(-1, 4)
    return a[:, :3].tobytes()


def _decode_frame(data: bytes, pos: int, info) -> tuple[np.ndarray, int]:
    rate0, channels0, bps0, _total, _md5 = info
    start = pos
    br = BitReader(data)
    br.pos = pos
    if br.read(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    br.read(1)  # blocking strategy (number semantics don't affect decode)
    bs_code = br.read(4)
    rate_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    _utf8ish_decode(br)  # frame/sample number
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code")
    elif bs_code == 6:
        block = br.read(8) + 1
    elif bs_code == 7:
        block = br.read(16) + 1
    else:
        block = _BLOCKSIZE_CODE[bs_code]
    if rate_code == 12:
        br.read(8)
    elif rate_code in (13, 14):
        br.read(16)
    elif rate_code == 15:
        raise ValueError("invalid FLAC sample rate code")
    if bps_code == 0:
        bps = bps0
    elif bps_code in _BPS_CODE:
        bps = _BPS_CODE[bps_code]
    else:
        raise ValueError("reserved FLAC sample size code")
    hdr_end = br.bit_pos() // 8
    if crc8(data[start:hdr_end]) != br.read(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")

    if ch_code < 8:
        nch = ch_code + 1
        if nch != channels0:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")
        chans = [_decode_subframe(br, block, bps) for _ in range(nch)]
        frame = np.stack(chans, axis=1)
    elif ch_code in (8, 9, 10):
        if channels0 != 2:
            raise ValueError("stereo decorrelation in a non-stereo stream")
        a = _decode_subframe(br, block, bps + (1 if ch_code == 9 else 0))
        b = _decode_subframe(br, block, bps + (1 if ch_code in (8, 10) else 0))
        if ch_code == 8:  # left/side
            left, right = a, a - b
        elif ch_code == 9:  # right/side (side stored first)
            left, right = a + b, b
        else:  # mid/side
            mid = (a.astype(np.int64) << 1) | (b & 1)
            left = ((mid + b) >> 1).astype(np.int64)
            right = ((mid - b) >> 1).astype(np.int64)
        frame = np.stack([left, right], axis=1)
    else:
        raise ValueError("reserved FLAC channel assignment")

    br.align_byte()
    crc_pos = br.bit_pos() // 8
    if crc16(data[start:crc_pos]) != br.read(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return frame.astype(np.int32), br.pos


def _decode_subframe(br: BitReader, block: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("non-zero FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        x = np.full(block, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(block)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array(
            [br.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        resid = _decode_residual(br, block, order)
        x = _undo_fixed(warm, resid, order)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = np.array(
            [br.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, block, order)
        x = _undo_lpc(warm, resid, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        x = x << wasted
    return x


def _decode_residual(br: BitReader, block: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block % nparts or (block >> porder) <= order:
        raise ValueError("invalid FLAC partition order")
    out = np.empty(block - order, dtype=np.int64)
    at = 0
    for p in range(nparts):
        n = (block >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            if raw:
                for i in range(n):
                    out[at + i] = br.read_signed(raw)
            else:
                out[at : at + n] = 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << k) | br.read(k) if k else q
                out[at + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        at += n
    return out


def _undo_fixed(warm: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Vectorized inverse of the fixed difference predictor: the k-th
    residual is the k-th finite difference, so reconstruction is k
    seeded cumsums (no sequential loop)."""
    if order == 0:
        return resid.copy()
    cur = resid
    for m in range(order - 1, -1, -1):
        seed = np.diff(warm, n=m)[-1] if m else warm[-1]
        cur = seed + np.cumsum(cur)
    return np.concatenate([warm, cur])


def _undo_lpc(
    warm: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    """Integer IIR reconstruction — inherently sequential; Python ints
    (exact, no overflow) over one block (≤ 65535 samples)."""
    order = len(coefs)
    x = [int(v) for v in warm]
    for e in resid:
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * x[-1 - j]
        x.append(int(e) + (pred >> shift))
    return np.array(x, dtype=np.int64)


# ---------------------------------------------------------------------------
# encoder

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x, n=order) if order else x.copy()


def _best_rice_k(resid: np.ndarray) -> tuple[int, int]:
    """(k, bit cost) minimizing the exact Rice length for this run."""
    if len(resid) == 0:
        return 0, 0
    u = (resid << 1) ^ (resid >> 63)
    mean = float(u.mean())
    # clamp into the representable Rice2 range FIRST — a 32-bit
    # full-scale zigzag mean has bit_length 33+, and an empty search
    # range here would fall back to k=0 (≈2^32-bit unary runs)
    k0 = min(max(int(mean).bit_length() - 1, 0), 30)
    best = (1 << 62, 0)
    for k in range(max(k0 - 1, 0), min(k0 + 3, 31)):
        c = int((u >> k).sum()) + len(resid) * (k + 1)
        if c < best[0]:
            best = (c, k)
    return best[1], best[0]


def _quantize_lpc(x: np.ndarray, order: int, prec: int = 12):
    """Levinson-Durbin + coefficient quantization; None if degenerate."""
    xf = x.astype(np.float64)
    n = len(xf)
    if n <= order or not xf.any():
        return None
    ac = np.array(
        [np.dot(xf[: n - lag], xf[lag:]) for lag in range(order + 1)]
    )
    if ac[0] == 0:
        return None
    err = ac[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - (np.dot(lpc[:i], ac[1 : i + 1][::-1]) if i else 0.0)
        if err == 0:
            return None
        refl = acc / err
        lpc[:i], lpc[i] = lpc[:i] - refl * lpc[:i][::-1], refl
        err *= 1 - refl * refl
        if err <= 0:
            return None
    cmax = np.abs(lpc).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = min(prec - 1 - max(int(np.floor(np.log2(cmax))) + 1, 0), 15)
    if shift <= 0:
        return None
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    lim = 1 << (prec - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift, prec


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    # exact integer prediction, vectorized over lag taps
    pred = np.zeros(len(x) - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * x[order - 1 - j : len(x) - 1 - j]
    return x[order:] - (pred >> shift)


def _emit_rice(bw: BitWriter, resid: np.ndarray, k: int) -> None:
    """Vectorized Rice emit: zigzag, then (q zeros + 1) and k remainder
    bits per sample via bulk fields; rare huge quotients go scalar."""
    u = ((resid << 1) ^ (resid >> 63)).astype(np.uint64)
    q = (u >> np.uint64(k)).astype(np.int64)
    # bulk fields are capped at 32 bits (BitWriter contract)
    if (q + 1 + k <= 32).all():
        if k:
            vals = (np.uint64(1) << np.uint64(k)) | (u & np.uint64((1 << k) - 1))
            bw.write_fields(vals, q + 1 + k)
        else:
            bw.write_fields(np.ones(len(u), dtype=np.uint64), q + 1)
    else:
        for ui, qi in zip(u, q):
            bw.write(1, int(qi) + 1)  # qi zeros then the 1
            if k:
                bw.write(int(ui) & ((1 << k) - 1), k)


def _encode_subframe(bw: BitWriter, x: np.ndarray, bps: int, porder: int,
                     max_lpc: int) -> None:
    block = len(x)
    if (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # candidates: fixed orders 0-4 (order < block), optional LPC
    best = None  # (cost, kind, order, payload)
    for order in range(0, 5):
        if order >= block:
            break
        resid = _fixed_residual(x, order)
        k, cost = _best_rice_k(resid)
        cost += order * bps
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, (resid, k))
    if max_lpc and block > max_lpc * 2:
        qz = _quantize_lpc(x, max_lpc)
        if qz is not None:
            q, shift, prec = qz
            resid = _lpc_residual(x, q, shift)
            k, cost = _best_rice_k(resid)
            cost += max_lpc * bps + 4 + 5 + max_lpc * prec
            if cost < best[0]:
                best = (cost, "lpc", max_lpc, (resid, k, q, shift, prec))
    _cost, kind, order, payload = best
    # clamp partition order to a valid one for this (block, order)
    po = porder
    while po and (block % (1 << po) or (block >> po) <= order):
        po -= 1
    bw.write(0, 1)
    if kind == "fixed":
        resid, k = payload
        bw.write(8 + order, 6)
        bw.write(0, 1)  # no wasted bits
        for v in x[:order]:
            bw.write(int(v) & ((1 << bps) - 1), bps)
    else:
        resid, k, q, shift, prec = payload
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in q:
            bw.write(int(c) & ((1 << prec) - 1), prec)
    nparts = 1 << po
    parts = []
    at = 0
    for p in range(nparts):
        n = (block >> po) - (order if p == 0 else 0)
        part = resid[at : at + n]
        pk = _best_rice_k(part)[0] if nparts > 1 else k
        parts.append((part, pk))
        at += n
    # k=15 is the 4-bit method's ESCAPE code — switch to the 5-bit
    # Rice2 method (escape 31) when any partition needs k >= 15
    method = 1 if any(pk > 14 for _, pk in parts) else 0
    bw.write(method, 2)
    bw.write(po, 4)
    for part, pk in parts:
        bw.write(pk, 4 + method)
        _emit_rice(bw, part, pk)


def encode_flac(
    samples: np.ndarray,
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
    partition_order: int = 0,
    max_lpc: int = 8,
    stereo: str = "auto",
) -> bytes:
    """(n,) or (n, channels) ints -> FLAC bytes.

    ``stereo``: 'auto' picks the cheapest of indep/left_side/right_side/
    mid_side per frame by exact cost; or force one of those names.
    """
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if not 0 < rate < (1 << 20):
        # the STREAMINFO rate field is 20 bits — BitWriter would
        # silently truncate a DSD-grade rate into a wrong-but-valid file
        raise ValueError(f"sample rate {rate} outside FLAC's 20-bit field")
    if not 16 <= block_size <= 65535:
        raise ValueError("block_size must be in [16, 65535]")
    lim = 1 << (bps - 1)
    if len(x) and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples exceed {bps}-bit range")

    frames = bytearray()
    for fno, start in enumerate(range(0, max(n, 1), block_size)):
        blk = x[start : start + block_size]
        if len(blk) == 0:
            break
        frames += _encode_frame(blk, fno, rate, bps, channels,
                                partition_order, max_lpc, stereo)

    info = BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    streaminfo = info.getvalue() + hashlib.md5(_pcm_bytes(x, bps)).digest()
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + bytes(frames)


_RATE_TO_CODE = {v: c for c, v in _RATE_CODE.items()}
_BPS_TO_CODE = {v: c for c, v in _BPS_CODE.items()}


def _encode_frame(blk, fno, rate, bps, channels, porder, max_lpc, stereo):
    block = len(blk)
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed blocking strategy, frame numbers
    bs_fixed = {v: c for c, v in _BLOCKSIZE_CODE.items()}
    if block in bs_fixed:
        bs_code, bs_extra = bs_fixed[block], None
    elif block <= 256:
        bs_code, bs_extra = 6, (block - 1, 8)
    else:
        bs_code, bs_extra = 7, (block - 1, 16)
    bw.write(bs_code, 4)
    bw.write(_RATE_TO_CODE.get(rate, 0), 4)
    chans = [blk[:, c] for c in range(channels)]
    ch_code = channels - 1
    side_bits = [bps] * channels
    if channels == 2 and stereo != "indep":
        left, right = blk[:, 0], blk[:, 1]
        side = left - right
        mid = (left + right) >> 1
        cands = {
            "indep": (channels - 1, [left, right], [bps, bps]),
            "left_side": (8, [left, side], [bps, bps + 1]),
            "right_side": (9, [side, right], [bps + 1, bps]),
            "mid_side": (10, [mid, side], [bps, bps + 1]),
        }
        if stereo == "auto":
            def est(ch):
                r = np.diff(ch, n=2) if len(ch) > 2 else ch
                _, cost = _best_rice_k(r)
                return cost
            name = min(cands, key=lambda nm: sum(est(c) for c in cands[nm][1]))
        else:
            if stereo not in cands:
                raise ValueError(f"unknown stereo mode {stereo!r}")
            name = stereo
        ch_code, chans, side_bits = cands[name]
    bw.write(ch_code, 4)
    bw.write(_BPS_TO_CODE.get(bps, 0), 3)
    bw.write(0, 1)
    for b in _utf8ish_encode(fno):
        bw.write(b, 8)
    if bs_extra:
        bw.write(*bs_extra)
    hdr = bw.getvalue()
    hdr += bytes([crc8(hdr)])

    body = BitWriter()
    for ch, cbps in zip(chans, side_bits):
        _encode_subframe(body, ch, cbps, porder, max_lpc)
    frame = hdr + body.getvalue()  # getvalue zero-pads to the byte edge
    return frame + crc16(frame).to_bytes(2, "big")
