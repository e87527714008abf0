"""From-scratch WebP lossless (VP8L) codec — numpy + stdlib only.

The graft input table's image payloads (BASELINE.json input_hint) carry a
``fmt`` column; ``webp`` was the one remaining honest decode stub (no
PIL/cv2 in this container). This module implements the VP8L bitstream
from the public spec (RFC 9649, "WebP Image Format", §4 "Specification
for WebP Lossless Bitstream") so ``fmt='webp'`` decodes for real and
``transcode_images`` can target it. The reference engine
(bxkftechteam/geomesa-sql) has no codecs of its own — this sits on the
payload side of the graft, same as ``io/jpeg.py``.

Decoder — general baseline-lossless surface:
  - RIFF container (simple and VP8X-extended), loud raise on lossy VP8
  - all four transforms (predictor incl. all 14 modes and the forced
    edge rules, color, subtract-green, color-indexing incl. pixel
    bundling for small palettes)
  - color cache, meta-Huffman (entropy image), LZ77 backward references
    with the 120-entry 2D distance map
  - both prefix-code forms (simple and code-length-coded), the
    max_symbol shortcut, canonical code reconstruction

Encoder — deterministic, real entropy coding (not a stored format):
  - optional subtract-green and single-mode predictor transforms
  - distance-1 LZ77 run detection (flat regions collapse)
  - per-channel package-merge length-limited Huffman codes, emitted
    through the code-length code with 16/17/18 run symbols

Bit I/O is linear (bounded accumulators) per the io/jpeg.py review
lesson — no O(n²) big-int growth on large images.
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_sql_spark.io.errors import clean_decode

# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within bytes; prefix codes are read
# bit-by-bit MSB-first (DEFLATE convention), i.e. each successive stream
# bit extends the code at the LSB end of the *code*, so the writer emits
# code bits reversed.


class BitReader:
    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # next byte index
        self.buf = 0  # bounded: < 64 live bits
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        val = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return val

    def peek(self, n: int) -> int:
        """Next n stream bits without consuming; zero-padded at EOS."""
        while self.nbits < n and self.pos < len(self.data):
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.buf & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.nbits < n:
            raise ValueError("truncated VP8L stream")
        self.buf >>= n
        self.nbits -= n


class BitWriter:
    """Collects (value, nbits) fields; packs them vectorized at the end.

    Every field is ≤ 16 bits (headers ≤ 14, codes ≤ 15, extras ≤ 10), so
    getvalue() expands fields to a bit matrix and np.packbits it — no
    per-bit Python loop anywhere on the emit path (io/jpeg.py lesson).
    ``write`` stores value bits LSB-first in stream order; ``write_code``
    stores a prefix code MSB-first (pre-reversed into the same form).
    """

    __slots__ = ("chunks",)

    def __init__(self):
        self.chunks: list[tuple[np.ndarray, np.ndarray]] = []

    def write(self, val: int, n: int) -> None:
        if n > 16:
            raise ValueError("BitWriter fields are <= 16 bits; split wider values")
        if n:
            self.chunks.append(
                (np.array([val], dtype=np.uint32), np.array([n], dtype=np.int64))
            )

    def write_code(self, code: int, length: int) -> None:
        """Emit a prefix code MSB-first (stream bits are LSB-packed)."""
        if length:
            self.write(_bit_reverse(code, length), length)

    def write_fields(self, vals: np.ndarray, ns: np.ndarray) -> None:
        """Bulk append: vals already in LSB-first stream form."""
        self.chunks.append(
            (vals.astype(np.uint32, copy=False), ns.astype(np.int64, copy=False))
        )

    def getvalue(self) -> bytes:
        if not self.chunks:
            return b""
        vs = np.concatenate([c[0] for c in self.chunks])
        ns = np.concatenate([c[1] for c in self.chunks])
        # slice-wise expansion with a <8-bit carry between slices keeps
        # peak memory O(slice) instead of O(total_fields * 16)
        out = bytearray()
        carry = np.zeros(0, dtype=np.uint8)
        ar = np.arange(16, dtype=np.uint32)
        step = 1 << 21
        for s in range(0, len(vs), step):
            v = vs[s : s + step]
            n = ns[s : s + step]
            bits = ((v[:, None] >> ar) & 1).astype(np.uint8)
            flat = bits[ar < n[:, None]]  # row-major: field order preserved
            flat = np.concatenate([carry, flat]) if len(carry) else flat
            aligned = len(flat) & ~7
            out += np.packbits(flat[:aligned], bitorder="little").tobytes()
            carry = flat[aligned:]
        if len(carry):
            out += np.packbits(carry, bitorder="little").tobytes()
        return bytes(out)


def _bit_reverse(code: int, length: int) -> int:
    out = 0
    for _ in range(length):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


# ---------------------------------------------------------------------------
# canonical prefix codes


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths) if len(lengths) else 0
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class _Decoder:
    """Prefix-code decoder: single-level LUT over the max code length —
    one peek + one skip per symbol instead of a bit-by-bit walk."""

    __slots__ = ("syms", "lens", "maxlen", "single")

    def __init__(self, lengths):
        used = [s for s, l in enumerate(lengths) if l]
        if not used:
            raise ValueError("empty prefix code")
        # a code with exactly one used symbol reads zero bits (the
        # "trivial code" convention — libwebp treats a single non-zero
        # length this way regardless of its value)
        if len(used) == 1:
            self.single = used[0]
            self.syms = self.lens = None
            self.maxlen = 0
            return
        self.single = None
        L = max(lengths)
        self.maxlen = L
        # reject over-subscribed codes up front (libwebp does too):
        # canonical codes would overflow their bit width and silently
        # alias LUT slots, mis-decoding corrupt streams without error
        if sum(1 << (L - l) for l in lengths if l) > (1 << L):
            raise ValueError("over-subscribed prefix code in VP8L stream")
        self.syms = np.zeros(1 << L, dtype=np.int32)
        self.lens = np.zeros(1 << L, dtype=np.int32)
        for sym, (code, l) in _canonical_codes(lengths).items():
            # stream bits arrive LSB-first; the code's MSB is read first,
            # so the LUT key is the bit-reversed code in the low l bits
            base = _bit_reverse(code, l)
            idxs = base + (np.arange(1 << (L - l)) << l)
            self.syms[idxs] = sym
            self.lens[idxs] = l

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        v = br.peek(self.maxlen)
        l = int(self.lens[v])
        if l == 0:
            raise ValueError("invalid prefix code in VP8L stream")
        br.skip(l)
        return int(self.syms[v])


def _simple_decoder(symbols: list[int]) -> _Decoder:
    d = _Decoder.__new__(_Decoder)
    if len(symbols) == 1:
        d.single = symbols[0]
        d.syms = d.lens = None
        d.maxlen = 0
        return d
    # simple codes assign 0/1 by READ order, not by symbol value
    d.single = None
    d.maxlen = 1
    d.syms = np.array(symbols, dtype=np.int32)
    d.lens = np.ones(2, dtype=np.int32)
    return d


# package-merge: optimal length-limited Huffman code lengths


def _huffman_lengths(freqs, limit: int) -> list[int]:
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(syms)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[syms[0]] = 1
        return lengths
    if n > (1 << limit):
        raise ValueError("alphabet exceeds length limit capacity")
    items = sorted((freqs[s], (s,)) for s in syms)
    prev: list[tuple[int, tuple]] = []
    for _ in range(limit):
        merged = []
        for i in range(0, len(prev) - 1, 2):
            a, b = prev[i], prev[i + 1]
            merged.append((a[0] + b[0], a[1] + b[1]))
        prev = sorted(items + merged)
    count: dict[int, int] = {}
    for _, pack in prev[: 2 * (n - 1)]:
        for s in pack:
            count[s] = count.get(s, 0) + 1
    for s, c in count.items():
        lengths[s] = c
    return lengths


# ---------------------------------------------------------------------------
# VP8L constants

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_HASH_MUL = 0x1E35A7BD

# 120-entry 2D distance map: (dx, dy) with dy in 0..7, dx in -7..8
# (dx >= 1 when dy == 0), ordered by dx²+dy², then |dx| asc, then
# positive dx before negative (matches the RFC 9649 table).
_DIST_MAP: list[tuple[int, int]] = sorted(
    [(dx, 0) for dx in range(1, 9)]
    + [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)
assert len(_DIST_MAP) == 120
_DIST_TO_CODE = {p: i + 1 for i, p in enumerate(_DIST_MAP)}


def _plane_code_to_distance(width: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


def _prefix_decode(br: BitReader, code: int) -> int:
    """LZ77 length/distance prefix code -> value (≥1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (≥1) -> (code, extra_bits_val, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    u = value - 1
    hi = u.bit_length() - 1  # 2^hi <= u < 2^(hi+1)
    extra = hi - 1
    code = 2 * hi + ((u >> extra) & 1)
    return code, u & ((1 << extra) - 1), extra


# ---------------------------------------------------------------------------
# prefix-code group read/write


def _read_code(br: BitReader, alphabet_size: int) -> _Decoder:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        symbols = [sym0]
        if num_symbols == 2:
            symbols.append(br.read(8))
        return _simple_decoder(symbols)
    # normal: code-length-coded
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_dec = _Decoder(cl_lengths)
    if br.read(1):  # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, length = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, length = 3 + br.read(3), 0
            else:
                repeat, length = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("prefix code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = length
                symbol += 1
    return _Decoder(lengths)


def _write_code(bw: BitWriter, freqs, alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Write one prefix code; return symbol -> (code, length) for payload."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    if not used:
        used = [0]
    if len(used) <= 2 and max(used) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # normal path
    lengths = _huffman_lengths(freqs, 15)
    # RLE-tokenize the length sequence (16=repeat prev non-zero, 17/18=zeros)
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra_val, extra_bits)
    i = 0
    n = alphabet_size
    while i < n:
        if lengths[i] == 0:
            run = 0
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
        else:
            l = lengths[i]
            tokens.append((l, 0, 0))
            prev = l
            i += 1
            run = 0
            while i + run < n and lengths[i + run] == prev:
                run += 1
            i += run
            while run >= 3:
                r = min(run, 6)
                tokens.append((16, r - 3, 2))
                run -= r
            for _ in range(run):
                tokens.append((prev, 0, 0))
    cl_freqs = [0] * 19
    for sym, _, _ in tokens:
        cl_freqs[sym] += 1
    cl_lengths = _huffman_lengths(cl_freqs, 7)
    cl_codes = _canonical_codes(cl_lengths)
    cl_used = [s for s, f in enumerate(cl_freqs) if f > 0]
    if len(cl_used) == 1:  # trivial code: zero bits per token
        cl_codes = {cl_used[0]: (0, 0)}
    num_codes = 19
    while num_codes > 4 and cl_lengths[_CODE_LENGTH_ORDER[num_codes - 1]] == 0:
        num_codes -= 1
    bw.write(0, 1)  # not simple
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut (trailing zeros via 17/18)
    for sym, extra_val, extra_bits in tokens:
        code, clen = cl_codes[sym]
        bw.write_code(code, clen)
        if extra_bits:
            bw.write(extra_val, extra_bits)
    codes = _canonical_codes(lengths)
    if len(used) == 1:  # trivial code: zero payload bits
        codes = {used[0]: (0, 0)}
    return codes


# ---------------------------------------------------------------------------
# transforms (decode side operates on flat uint8 arrays a, r, g, b)


def _inv_subtract_green(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> None:
    np.add(r, g, out=r, casting="unsafe")
    np.add(b, g, out=b, casting="unsafe")


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _inv_predictor(
    px: np.ndarray, w: int, h: int, modes: np.ndarray, size_bits: int
) -> None:
    """In-place inverse predictor transform.

    px: (h*w, 4) uint8 residuals (columns a, r, g, b) -> pixels.
    modes: flat uint8 array of block predictor modes (green channel of
    the transform sub-image), block grid width ceil(w / 2^size_bits).
    """
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    p = px.astype(np.int32)
    # (0,0): predicted by 0xff000000
    p[0, 0] = (p[0, 0] + 255) & 0xFF
    # rest of row 0: L predictor == per-channel prefix sum mod 256
    if w > 1:
        p[1:w] = np.cumsum(p[: w], axis=0)[1:] & 0xFF
    for y in range(1, h):
        base = y * w
        # x == 0: T predictor
        p[base] = (p[base] + p[base - w]) & 0xFF
        row_modes = modes[(y >> size_bits) * bw_blocks :]
        x = 1
        while x < w:
            mode = int(row_modes[x >> size_bits])
            # run of identical mode within this block row
            x_end = min(w, ((x >> size_bits) + 1) << size_bits)
            while x_end < w and int(row_modes[x_end >> size_bits]) == mode:
                x_end = min(w, ((x_end >> size_bits) + 1) << size_bits)
            i0, i1 = base + x, base + x_end
            if mode == 0:
                p[i0:i1, 0] = (p[i0:i1, 0] + 255) & 0xFF
                p[i0:i1, 1:] &= 0xFF
            elif mode == 2:  # T — vectorized over the run
                p[i0:i1] = (p[i0:i1] + p[i0 - w : i1 - w]) & 0xFF
            elif mode == 3:  # TR (wraps to (0, y) at x == w-1)
                p[i0:i1] = (p[i0:i1] + p[i0 - w + 1 : i1 - w + 1]) & 0xFF
            elif mode == 4:  # TL
                p[i0:i1] = (p[i0:i1] + p[i0 - w - 1 : i1 - w - 1]) & 0xFF
            else:  # sequential modes (need decoded left neighbor)
                for i in range(i0, i1):
                    L = p[i - 1]
                    T = p[i - w]
                    TL = p[i - w - 1]
                    TR = p[i - w + 1]  # wraps linearly at x == w-1 → (0, y)
                    if mode == 1:
                        pred = L
                    elif mode == 5:
                        pred = [
                            _avg2(_avg2(int(L[c]), int(TR[c])), int(T[c]))
                            for c in range(4)
                        ]
                    elif mode == 6:
                        pred = [_avg2(int(L[c]), int(TL[c])) for c in range(4)]
                    elif mode == 7:
                        pred = [_avg2(int(L[c]), int(T[c])) for c in range(4)]
                    elif mode == 8:
                        pred = [_avg2(int(TL[c]), int(T[c])) for c in range(4)]
                    elif mode == 9:
                        pred = [_avg2(int(T[c]), int(TR[c])) for c in range(4)]
                    elif mode == 10:
                        pred = [
                            _avg2(
                                _avg2(int(L[c]), int(TL[c])),
                                _avg2(int(T[c]), int(TR[c])),
                            )
                            for c in range(4)
                        ]
                    elif mode == 11:  # Select
                        est = [int(L[c]) + int(T[c]) - int(TL[c]) for c in range(4)]
                        pl = sum(abs(est[c] - int(L[c])) for c in range(4))
                        pt = sum(abs(est[c] - int(T[c])) for c in range(4))
                        pred = L if pl < pt else T
                    elif mode == 12:  # ClampAddSubtractFull
                        pred = [
                            _clamp(int(L[c]) + int(T[c]) - int(TL[c]))
                            for c in range(4)
                        ]
                    elif mode == 13:  # ClampAddSubtractHalf
                        pred = []
                        for c in range(4):
                            avg = _avg2(int(L[c]), int(T[c]))
                            d = avg - int(TL[c])
                            # C truncation toward zero, NOT Python floor
                            half = d // 2 if d >= 0 else -((-d) // 2)
                            pred.append(_clamp(avg + half))
                    else:
                        raise ValueError(f"invalid predictor mode {mode}")
                    p[i] = (p[i] + np.asarray(pred, dtype=np.int32)) & 0xFF
            x = x_end
    px[:] = p.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8 t * int8 c) >> 5, elementwise."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(
    px: np.ndarray, w: int, h: int, cte: np.ndarray, size_bits: int
) -> None:
    """Inverse color transform. cte: (n_blocks, 4) a,r,g,b sub-image pixels
    where blue ch = green_to_red, green ch = green_to_blue, red ch = red_to_blue."""
    bw_blocks = (w + (1 << size_bits) - 1) >> size_bits
    ys, xs = np.divmod(np.arange(w * h), w)
    block = (ys >> size_bits) * bw_blocks + (xs >> size_bits)
    g2r = cte[block, 3]
    g2b = cte[block, 2]
    r2b = cte[block, 1]
    r = px[:, 1].astype(np.int32)
    g = px[:, 2]
    b = px[:, 3].astype(np.int32)
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g)) & 0xFF
    b = (b + _ct_delta(r2b, r.astype(np.uint8))) & 0xFF
    px[:, 1] = r.astype(np.uint8)
    px[:, 3] = b.astype(np.uint8)


# ---------------------------------------------------------------------------
# decoder


def _decode_image_stream(
    br: BitReader, w: int, h: int, level0: bool
) -> tuple[np.ndarray, int]:
    """Decode one VP8L image stream -> ((n, 4) uint8 ARGB, final width).

    The final width differs from w when a color-indexing transform with
    pixel bundling reduced the coded width (level0 only).
    """
    transforms: list[tuple] = []
    coded_w = w
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                size_bits = br.read(3) + 2
                sw = (coded_w + (1 << size_bits) - 1) >> size_bits
                sh = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _decode_image_stream(br, sw, sh, False)
                # capture the width current at read time: inverse runs at
                # that width (a later color-indexing transform is
                # un-bundled first in the reversed application order)
                transforms.append(("predictor", size_bits, sub[:, 2].copy(), coded_w))
            elif ttype == 1:  # color
                size_bits = br.read(3) + 2
                sw = (coded_w + (1 << size_bits) - 1) >> size_bits
                sh = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _decode_image_stream(br, sw, sh, False)
                transforms.append(("color", size_bits, sub, coded_w))
            elif ttype == 2:  # subtract green
                transforms.append(("subtract_green",))
            else:  # color indexing
                palette_size = br.read(8) + 1
                pal, _ = _decode_image_stream(br, palette_size, 1, False)
                # palette entries are component-wise delta-coded
                pal = np.cumsum(pal.astype(np.int32), axis=0).astype(np.uint8)
                if palette_size <= 2:
                    xbits = 3
                elif palette_size <= 4:
                    xbits = 2
                elif palette_size <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append(("palette", pal, xbits))
                coded_w = (coded_w + (1 << xbits) - 1) >> xbits

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color cache bits {cache_bits}")

    # meta-Huffman (level0 only)
    meta = None
    hbits = 0
    num_groups = 1
    if level0 and br.read(1):
        hbits = br.read(3) + 2
        mw = (coded_w + (1 << hbits) - 1) >> hbits
        mh = (h + (1 << hbits) - 1) >> hbits
        sub, _ = _decode_image_stream(br, mw, mh, False)
        meta = (sub[:, 1].astype(np.int32) << 8) | sub[:, 2].astype(np.int32)
        num_groups = int(meta.max()) + 1

    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_code(br, green_size),
                _read_code(br, 256),
                _read_code(br, 256),
                _read_code(br, 256),
                _read_code(br, _NUM_DISTANCE_CODES),
            )
        )

    npix = coded_w * h
    px = np.empty((npix, 4), dtype=np.uint8)  # a, r, g, b
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    mw_groups = (coded_w + (1 << hbits) - 1) >> hbits if meta is not None else 0

    idx = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    while idx < npix:
        if meta is not None:
            x, y = idx % coded_w, idx // coded_w
            gi = int(meta[(y >> hbits) * mw_groups + (x >> hbits)])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        s = g_green.read(br)
        if s < 256:
            g = s
            r = g_red.read(br)
            b = g_blue.read(br)
            a = g_alpha.read(br)
            px[idx] = (a, r, g, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[(_HASH_MUL * argb & 0xFFFFFFFF) >> shift] = argb
            idx += 1
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, g_dist.read(br))
            dist = _plane_code_to_distance(coded_w, dist_code)
            if dist > idx or idx + length > npix:
                raise ValueError("LZ77 reference out of bounds")
            if cache is None and dist >= length:
                px[idx : idx + length] = px[idx - dist : idx - dist + length]
                idx += length
            elif cache is None:
                # overlapping copy (incl. every distance-1 run our own
                # encoder emits): tile the dist-sized period
                reps = -(-length // dist)
                px[idx : idx + length] = np.tile(
                    px[idx - dist : idx], (reps, 1)
                )[:length]
                idx += length
            else:
                for _ in range(length):
                    px[idx] = px[idx - dist]
                    if cache is not None:
                        a, r, g, b = (int(v) for v in px[idx])
                        argb = (a << 24) | (r << 16) | (g << 8) | b
                        cache[(_HASH_MUL * argb & 0xFFFFFFFF) >> shift] = argb
                    idx += 1
        else:
            if cache is None:
                raise ValueError("color cache symbol without color cache")
            argb = cache[s - 256 - _NUM_LENGTH_CODES]
            px[idx] = (argb >> 24 & 0xFF, argb >> 16 & 0xFF, argb >> 8 & 0xFF, argb & 0xFF)
            idx += 1

    if not level0:
        return px, coded_w

    # apply inverse transforms in reverse read order
    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, xbits = t
            if xbits:
                per = 1 << xbits
                bits = 8 >> xbits
                packed = px[:, 2].reshape(h, coded_w)
                idxs = np.empty((h, coded_w * per), dtype=np.int32)
                for k in range(per):
                    idxs[:, k::per] = (packed >> (k * bits)) & ((1 << bits) - 1)
                idxs = idxs[:, :w].reshape(-1)
            else:
                idxs = px[:, 2].astype(np.int32)
            if int(idxs.max()) >= len(pal):
                raise ValueError("palette index out of range")
            px = pal[idxs]
            coded_w = w
        elif t[0] == "color":
            _inv_color_transform(px, t[3], h, t[2], t[1])
        elif t[0] == "subtract_green":
            _inv_subtract_green(px[:, 1], px[:, 2], px[:, 3])
        else:  # predictor
            _inv_predictor(px, t[3], h, t[2], t[1])
    return px, w


@clean_decode
def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 ARGB-channel array [a,r,g,b]."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = BitReader(payload)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    px, _ = _decode_image_stream(br, w, h, True)
    return px.reshape(h, w, 4)


@clean_decode
def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB. Lossless (VP8L) only; lossy VP8
    raises loudly (its decoder would be a full VP8 intra codec)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            px = decode_vp8l(payload)
            return px[:, :, [1, 2, 3]]  # a,r,g,b -> r,g,b
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP: full VP8 intra decode out of scope; "
                "lossless (VP8L) streams are supported"
            )
        pos += 8 + size + (size & 1)  # RIFF even padding
    raise ValueError("no VP8L chunk in WebP container")


# ---------------------------------------------------------------------------
# encoder


def _forward_predictor_top(p: np.ndarray, w: int, h: int) -> np.ndarray:
    """Forward predictor transform, single mode 2 (T) for all blocks,
    honoring the forced edge rules. p: (h*w, 4) int32 pixels."""
    out = np.empty_like(p)
    out[0] = (p[0] - np.asarray([255, 0, 0, 0])) & 0xFF
    if w > 1:
        out[1:w] = (p[1:w] - p[: w - 1]) & 0xFF  # row 0: L
    if h > 1:
        out[w:] = (p[w:] - p[:-w]) & 0xFF  # T everywhere else (incl. x=0)
    return out


def encode_webp(
    pixels: np.ndarray,
    subtract_green: bool = True,
    predictor: bool = False,
    use_runs: bool = True,
) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless WebP (VP8L) bytes.

    Deterministic; real entropy coding (package-merge Huffman per
    channel), optional subtract-green / top-predictor transforms,
    distance-1 LZ77 runs for flat regions. Alpha written opaque.
    """
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    flat = pixels.reshape(-1, 3).astype(np.int32)
    n = w * h
    # a, r, g, b
    p = np.empty((n, 4), dtype=np.int32)
    p[:, 0] = 255
    p[:, 1] = flat[:, 0]
    p[:, 2] = flat[:, 1]
    p[:, 3] = flat[:, 2]

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint: not used
    bw.write(0, 3)  # version

    # transforms: written in read order [subtract_green, predictor];
    # decoder applies inverses LIFO, so forward order is sg then pred.
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        p[:, 1] = (p[:, 1] - p[:, 2]) & 0xFF
        p[:, 3] = (p[:, 3] - p[:, 2]) & 0xFF
    if predictor:
        size_bits = 9  # block 512; mode image written below
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        p = _forward_predictor_top(p, w, h)
        sw = (w + 511) >> 9
        sh = (h + 511) >> 9
        _write_entropy_image(bw, np.full(sw * sh, 2, dtype=np.int32))
    bw.write(0, 1)  # no more transforms

    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman

    # tokenize: literals + distance-1 runs, vectorized — maximal blocks
    # of equal consecutive pixels found in one numpy pass; only the
    # (rare) per-block chunking walks in Python
    run_code = _DIST_TO_CODE[(1, 0)]  # distance 1
    tokens: list[tuple] = []  # ('lits', index-array) | ('run', length)
    if use_runs and n > 1:
        same = np.all(p[1:] == p[:-1], axis=1)
        edges = np.flatnonzero(
            np.diff(np.concatenate(([False], same, [False])).astype(np.int8))
        )
        seg_starts, seg_ends = edges[::2], edges[1::2]  # same[j0:j1] all True
    else:
        seg_starts = seg_ends = np.array([], dtype=np.int64)
    lit_chunks: list[np.ndarray] = []
    pos = 0
    for j0, j1 in zip(seg_starts, seg_ends):
        # pixels j0..j1 are all equal (block length j1 - j0 + 1 >= 2)
        rem = int(j1 - j0)  # pixels after the block's first one
        lead = np.arange(pos, j0 + 1, dtype=np.int64)  # gap lits + block head
        cursor = int(j0) + 1
        while rem:
            c = min(rem, 4096)
            if c >= 3:
                if len(lead):
                    tokens.append(("lits", lead))
                    lit_chunks.append(lead)
                    lead = np.array([], dtype=np.int64)
                tokens.append(("run", c))
            else:
                lead = np.concatenate(
                    [lead, np.arange(cursor, cursor + c, dtype=np.int64)]
                )
            cursor += c
            rem -= c
        if len(lead):
            tokens.append(("lits", lead))
            lit_chunks.append(lead)
        pos = int(j1) + 1
    if pos < n:
        tail = np.arange(pos, n, dtype=np.int64)
        tokens.append(("lits", tail))
        lit_chunks.append(tail)

    lit_idx = (
        np.concatenate(lit_chunks) if lit_chunks else np.array([], dtype=np.int64)
    )
    green_f = np.bincount(p[lit_idx, 2], minlength=256 + _NUM_LENGTH_CODES)
    red_f = np.bincount(p[lit_idx, 1], minlength=256)
    blue_f = np.bincount(p[lit_idx, 3], minlength=256)
    alpha_f = np.bincount(p[lit_idx, 0], minlength=256)
    dist_f = [0] * _NUM_DISTANCE_CODES
    for tok in tokens:
        if tok[0] == "run":
            code, _, _ = _prefix_encode(tok[1])
            green_f[256 + code] += 1
            dcode, _, _ = _prefix_encode(run_code)
            dist_f[dcode] += 1

    green_c = _write_code(bw, green_f, 256 + _NUM_LENGTH_CODES)
    red_c = _write_code(bw, red_f, 256)
    blue_c = _write_code(bw, blue_f, 256)
    alpha_c = _write_code(bw, alpha_f, 256)
    dist_c = _write_code(bw, dist_f, _NUM_DISTANCE_CODES)

    # vectorized emission: literal stretches become one bulk field chunk
    # (pre-reversed code tables indexed by channel value)
    def _tables(codes, size):
        v = np.zeros(size, dtype=np.uint32)
        ln = np.zeros(size, dtype=np.int64)
        for sym, (c, l) in codes.items():
            v[sym] = _bit_reverse(c, l)
            ln[sym] = l
        return v, ln

    gv, gn = _tables(green_c, 256 + _NUM_LENGTH_CODES)
    rv, rn = _tables(red_c, 256)
    bv, bn = _tables(blue_c, 256)
    av, an = _tables(alpha_c, 256)

    for tok in tokens:
        if tok[0] == "lits":
            idx = tok[1]
            g = p[idx, 2]
            r = p[idx, 1]
            b = p[idx, 3]
            a = p[idx, 0]
            vals = np.stack([gv[g], rv[r], bv[b], av[a]], axis=1).reshape(-1)
            ns = np.stack([gn[g], rn[r], bn[b], an[a]], axis=1).reshape(-1)
            bw.write_fields(vals, ns)
        else:
            length = tok[1]
            code, ev, eb = _prefix_encode(length)
            c, l = green_c[256 + code]
            bw.write_code(c, l)
            if eb:
                bw.write(ev, eb)
            dcode, dev, deb = _prefix_encode(run_code)
            c, l = dist_c[dcode]
            bw.write_code(c, l)
            if deb:
                bw.write(dev, deb)

    payload = bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_entropy_image(bw: BitWriter, greens: np.ndarray) -> None:
    """Write a sub-image (no transforms) whose pixels are (255, 0, g, 0).

    Used for the predictor-mode image: all modes identical, so every
    channel is a single-symbol simple code (zero payload bits)."""
    vals = sorted(set(int(v) for v in greens))
    bw.write(0, 1)  # no color cache
    g_f = [0] * (256 + _NUM_LENGTH_CODES)
    for v in vals:
        g_f[v] += 1
    green_c = _write_code(bw, g_f, 256 + _NUM_LENGTH_CODES)
    red_c = _write_code(bw, [1] + [0] * 255, 256)
    blue_c = _write_code(bw, [1] + [0] * 255, 256)
    alpha_c = _write_code(bw, [0] * 255 + [1], 256)
    _write_code(bw, [1] + [0] * (_NUM_DISTANCE_CODES - 1), _NUM_DISTANCE_CODES)
    for v in greens:
        c, l = green_c[int(v)]
        bw.write_code(c, l)
        for codes, sym in ((red_c, 0), (blue_c, 0), (alpha_c, 255)):
            c, l = codes[sym]
            bw.write_code(c, l)
