"""Pure-Python WebP lossless (VP8L) codec.

Implemented from the PUBLIC WebP lossless bitstream specification
(RFC 9649 / the WebP container + VP8L spec): RIFF container, LSB-first
bit packing, canonical prefix codes (simple and code-length-coded),
color cache, LZ77 backward references with the 2D distance-plane map,
meta prefix codes, and all four transforms (predictor — all 14 modes —
color, subtract-green, color-indexing with pixel bundling).

The reference crawler treats ``image/webp`` like any other fetched
image asset (content-type mapping around
``/root/reference/src/engine/crawler.rs:1557-1596``); this module lets
the multimodal decode stages open the third major web image format
without PIL/libwebp, which are absent from this container.

The encoder is a *correctness* encoder, not a rate-optimised one: it
can emit any single transform, an optional color cache, optional
greedy LZ77, and optional meta prefix groups, so round-trip tests
exercise every decoder path.  Lossy VP8 and the VP8X/animation
containers raise ``NotImplementedError`` honestly.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within bytes
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        for i in range(n):
            byte = p >> 3
            if byte >= len(data):
                raise NotImplementedError("truncated VP8L stream")
            v |= ((data[byte] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return v

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise NotImplementedError("truncated VP8L stream")
        self.pos = p + 1
        return (self.data[byte] >> (p & 7)) & 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([self.acc & 0xFF])
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style: codes ordered by (length, symbol),
# bits emitted/consumed most-significant-first)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: np.ndarray) -> dict[int, tuple[int, int]]:
    """symbol → (code, nbits) for nonzero lengths."""
    codes: dict[int, tuple[int, int]] = {}
    max_len = int(lengths.max()) if len(lengths) else 0
    code = 0
    for ln in range(1, max_len + 1):
        for sym in np.nonzero(lengths == ln)[0]:
            codes[int(sym)] = (code, ln)
            code += 1
        code <<= 1
    return codes


class _PrefixCode:
    """Decode side: walk bit-by-bit; encode side: symbol → (code, len)."""

    def __init__(self, lengths: np.ndarray):
        nz = np.nonzero(lengths)[0]
        if len(nz) == 0:
            raise NotImplementedError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            # single-symbol code: zero bits per symbol
            self.single = int(nz[0])
            self.dec = {}
            self.enc = {self.single: (0, 0)}
            return
        self.single = None
        self.enc = _canonical_codes(lengths)
        self.dec = {(ln, code): sym for sym, (code, ln) in self.enc.items()}

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.dec = {}
            pc.enc = {symbols[0]: (0, 0)}
        else:
            pc.single = None
            pc.enc = {symbols[0]: (0, 1), symbols[1]: (1, 1)}
            pc.dec = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.dec.get((ln, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid VP8L prefix code")

    def encode(self, bw: _BitWriter, sym: int) -> None:
        code, ln = self.enc[sym]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _PrefixCode.simple(syms)
    # code lengths coded with the code-length code
    num_codes = br.read(4) + 4
    cl_lengths = np.zeros(19, np.int64)
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    lengths = np.zeros(alphabet_size, np.int64)
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        clen = cl_code.decode(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen:
                prev_len = clen
        elif clen == 16:
            rep = 3 + br.read(2)
            lengths[symbol : symbol + rep] = prev_len
            symbol += rep
        elif clen == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


def _huffman_lengths(freqs: np.ndarray, max_len: int = 15) -> np.ndarray:
    """Code lengths from symbol frequencies (package-merge-free greedy
    Huffman with a depth clamp — correctness encoder, not optimal)."""
    import heapq

    nz = np.nonzero(freqs)[0]
    lengths = np.zeros(len(freqs), np.int64)
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    heap = [(int(freqs[s]), int(s), [int(s)]) for s in nz]
    heapq.heapify(heap)
    uid = len(freqs)
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, uid, sa + sb))
        uid += 1
    if lengths.max() > max_len:
        # crude clamp: rebuild with flattened frequencies
        return _huffman_lengths(np.minimum(freqs, freqs[freqs > 0].min() * 8), max_len)
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: np.ndarray) -> _PrefixCode:
    nz = np.nonzero(lengths)[0]
    if len(nz) <= 2 and nz.max(initial=0) < 256:
        syms = [int(s) for s in nz] or [0]
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return _PrefixCode.simple(syms)
    bw.write(0, 1)  # complex
    # literal code lengths, 17/18 runs for zero gaps, max_symbol for the
    # zero tail (symbol, extra, extra_bits)
    last = int(nz.max()) + 1 if len(nz) else 1
    cl_syms: list[tuple[int, int, int]] = []
    i = 0
    while i < last:
        ln = int(lengths[i])
        if ln == 0:
            run = 0
            while i + run < last and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 138)
                cl_syms.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                cl_syms.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                cl_syms.append((0, 0, 0))
        else:
            cl_syms.append((ln, 0, 0))
            i += 1
    if last < len(lengths):
        # the max_symbol field requires ≥ 2 code-length symbols
        while len(cl_syms) < 2:
            cl_syms.append((0, 0, 0))
    cl_freq = np.zeros(19, np.int64)
    for s, _e, _b in cl_syms:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    # num_codes: enough positions in the fixed order to cover all nonzero
    used = [k for k in range(19) if cl_lengths[k]]
    num_codes = max(
        (idx + 1 for idx, sym in enumerate(_CODE_LENGTH_ORDER) if sym in used), default=4
    )
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for idx in range(num_codes):
        bw.write(int(cl_lengths[_CODE_LENGTH_ORDER[idx]]), 3)
    cl_code = _PrefixCode(cl_lengths)
    if last < len(lengths):
        # max_symbol = how many code-length SYMBOLS the decoder reads;
        # the zero tail past `last` is then implicit
        bw.write(1, 1)
        sel = 0
        while (len(cl_syms) - 2) > (1 << (2 + 2 * sel)) - 1:
            sel += 1
        bw.write(sel, 3)
        bw.write(len(cl_syms) - 2, 2 + 2 * sel)
    else:
        bw.write(0, 1)
    for s, extra, ebits in cl_syms:
        cl_code.encode(bw, s)
        if ebits:
            bw.write(extra, ebits)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values and the 2D distance map
# ---------------------------------------------------------------------------


def _read_lz77_value(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix_code, extra_value, extra_bits)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    b = x.bit_length() - 1
    s = (x >> (b - 1)) & 1
    code = 2 * b + s
    offset = (2 + s) << (b - 1)
    return code, x - offset, b - 1


# (xoffset, yoffset) plane codes 1..120 — RFC 9649 distance mapping
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
    (7, 6), (-7, 6), (8, 6), (4, 8), (-4, 8), (8, 7), (-8, 7),
]


def _plane_to_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


# ---------------------------------------------------------------------------
# color cache
# ---------------------------------------------------------------------------

_CACHE_MUL = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((argb * _CACHE_MUL) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# image-stream decode (shared by the main image, transform images,
# entropy image and palette)
# ---------------------------------------------------------------------------

_GREEN_EXTRA = 24  # length prefix codes appended to the green alphabet


def _decode_image_stream(br: _BitReader, width: int, height: int,
                         is_main: bool):
    """→ (pixels uint32 ARGB array of len w*h, transforms list) —
    transforms only populated for the main image."""
    transforms = []
    w = width
    if is_main:
        while br.read_bit():
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise NotImplementedError("duplicate VP8L transform")
            if ttype == 0:  # predictor
                size_bits = br.read(3) + 2
                bw_ = -(-w // (1 << size_bits))
                bh_ = -(-height // (1 << size_bits))
                sub, _ = _decode_image_stream(br, bw_, bh_, False)
                transforms.append((0, size_bits, sub))
            elif ttype == 1:  # color transform
                size_bits = br.read(3) + 2
                bw_ = -(-w // (1 << size_bits))
                bh_ = -(-height // (1 << size_bits))
                sub, _ = _decode_image_stream(br, bw_, bh_, False)
                transforms.append((1, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read(8) + 1
                praw, _ = _decode_image_stream(br, pal_size, 1, False)
                comp = np.stack([(praw >> 24) & 0xFF, (praw >> 16) & 0xFF,
                                 (praw >> 8) & 0xFF, praw & 0xFF], axis=1)
                # palette entries are delta-coded component-wise mod 256
                pal = (np.cumsum(comp.astype(np.uint32), axis=0) & 0xFF).astype(np.uint8)
                if pal_size <= 2:
                    wbits = 3
                elif pal_size <= 4:
                    wbits = 2
                elif pal_size <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, (pal, wbits, w), None))
                if wbits:
                    w = -(-w // (1 << wbits))
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    num_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-height // (1 << meta_bits))
        mimg, _ = _decode_image_stream(br, mw, mh, False)
        meta = ((mimg >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1
        meta = meta.reshape(mh, mw)
    alphabet = [256 + _GREEN_EXTRA + (1 << cache_bits if cache_bits else 0),
                256, 256, 256, 40]
    groups = []
    for _ in range(num_groups):
        groups.append([_read_prefix_code(br, a) for a in alphabet])
    n = w * height
    out = np.zeros(n, np.uint32)
    pos = 0
    group = groups[0]
    cur_meta = -1
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            if gi != cur_meta:
                group = groups[gi]
                cur_meta = gi
        g = group[0].decode(br)
        if g < 256:
            r = group[1].decode(br)
            b = group[2].decode(br)
            a = group[3].decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif g < 256 + _GREEN_EXTRA:
            length = _read_lz77_value(br, g - 256)
            dcode = group[4].decode(br)
            dist = _plane_to_distance(_read_lz77_value(br, dcode), w)
            if dist > pos or pos + length > n:
                raise NotImplementedError("VP8L backward reference out of range")
            for k in range(length):
                px = int(out[pos - dist + k])
                out[pos + k] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
            pos += length
        else:
            if cache is None:
                raise NotImplementedError("VP8L cache symbol without a cache")
            px = cache[g - 256 - _GREEN_EXTRA]
            out[pos] = px
            pos += 1
    return out, transforms


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One pixel's predictor over int32 channel vectors [a, r, g, b]."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        p_l = int(np.abs(T - TL).sum())
        p_t = int(np.abs(L - TL).sum())
        return L if p_l < p_t else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        ave = _avg2(L, T)
        d = ave - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))  # C truncation
        return np.clip(ave + half, 0, 255)
    raise NotImplementedError(f"VP8L predictor mode {mode}")


def _unpack(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """uint32 ARGB row-major → (h, w, 4) uint8 [a, r, g, b]."""
    v = pixels.reshape(h, w)
    return np.stack([(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                     (v >> 8) & 0xFF, v & 0xFF], axis=2).astype(np.uint8)


def _pack(ch: np.ndarray) -> np.ndarray:
    a, r, g, b = (ch[:, :, i].astype(np.uint32) for i in range(4))
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)


def _inv_predictor(ch: np.ndarray, size_bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = ch.shape[:2]
    bw_ = -(-w // (1 << size_bits))
    modes = (sub.reshape(-(-h // (1 << size_bits)), bw_) >> 8) & 0xFF
    out = np.zeros_like(ch, np.int32)
    res = ch.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = (res[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _s8(v: np.ndarray) -> np.ndarray:
    return v.astype(np.uint8).view(np.int8).astype(np.int32)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(ch: np.ndarray, size_bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = ch.shape[:2]
    bw_ = -(-w // (1 << size_bits))
    bh_ = -(-h // (1 << size_bits))
    elems = sub.reshape(bh_, bw_)
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    e = elems[np.ix_(ys, xs)]
    g2r = (e & 0xFF).astype(np.uint8)
    g2b = ((e >> 8) & 0xFF).astype(np.uint8)
    r2b = ((e >> 16) & 0xFF).astype(np.uint8)
    out = ch.astype(np.int32)
    out[:, :, 1] = (out[:, :, 1] + _ct_delta(g2r, out[:, :, 2])) & 0xFF
    out[:, :, 3] = (out[:, :, 3] + _ct_delta(g2b, out[:, :, 2])
                    + _ct_delta(r2b, out[:, :, 1])) & 0xFF
    return out.astype(np.uint8)


def _inv_transforms(pixels: np.ndarray, w: int, h: int, transforms) -> tuple[np.ndarray, int]:
    """Apply inverse transforms in reverse read order; returns ((h,w,4)
    uint8 channels, final width)."""
    cur_w = w
    for t in transforms:
        if t[0] == 3 and t[1][1]:
            cur_w = -(-t[1][2] // (1 << t[1][1]))
    ch = _unpack(pixels, cur_w, h)
    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:
            pal, wbits, orig_w = arg
            if wbits:
                idx = ch[:, :, 2]  # green carries packed indices
                per = 1 << wbits
                bits = 8 >> wbits
                cols = []
                for k in range(per):
                    cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
                wide = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
            else:
                wide = ch[:, :, 2]
            if int(wide.max(initial=0)) >= len(pal):
                raise NotImplementedError("VP8L palette index out of range")
            ch = pal[wide.astype(np.int64)][:, :, [0, 1, 2, 3]]
            # palette rows are ARGB uint8 already
        elif ttype == 2:
            out = ch.astype(np.int32)
            out[:, :, 1] = (out[:, :, 1] + out[:, :, 2]) & 0xFF
            out[:, :, 3] = (out[:, :, 3] + out[:, :, 2]) & 0xFF
            ch = out.astype(np.uint8)
        elif ttype == 1:
            ch = _inv_color_transform(ch, arg, sub)
        elif ttype == 0:
            ch = _inv_predictor(ch, arg, sub)
    return ch, ch.shape[1]


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes) -> np.ndarray:
    """Lossless WebP (VP8L) → (H, W, 3) uint8 (or (H, W, 4) when alpha
    is used).  Lossy VP8 and extended VP8X containers raise
    NotImplementedError (they need libwebp, absent here)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise NotImplementedError("not a WebP payload")
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            data = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError("lossy VP8 needs libwebp (absent)")
        if tag == b"VP8X":
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    if data is None:
        raise NotImplementedError("WebP container has no VP8L chunk")
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise NotImplementedError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise NotImplementedError("unknown VP8L version")
    pixels, transforms = _decode_image_stream(br, w, h, True)
    ch, _ = _inv_transforms(pixels, w, h, transforms)
    if (ch[:, :, 0] == 255).all():
        return ch[:, :, 1:4].copy()  # RGB
    return ch[:, :, [1, 2, 3, 0]].copy()  # RGBA


# ---------------------------------------------------------------------------
# encoder (correctness encoder: any ONE transform, optional cache/LZ77/meta)
# ---------------------------------------------------------------------------


def _write_image_stream(bw: _BitWriter, pixels: np.ndarray, w: int, h: int,
                        is_main: bool, *, cache_bits: int = 0,
                        use_lz77: bool = False, meta_bits: int = 0) -> None:
    """Emit one image stream for uint32 ARGB ``pixels`` (len w*h).
    Transforms must already be applied/emitted by the caller."""
    cache = [0] * (1 << cache_bits) if cache_bits else None
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    meta = None
    num_groups = 1
    if is_main:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            # alternate groups checkerboard-style over meta blocks
            gy, gx = np.mgrid[0:mh, 0:mw]
            meta = ((gy + gx) & 1).astype(np.int64)
            num_groups = 2
            mpix = ((meta.reshape(-1).astype(np.uint32)) << 8) | 0xFF000000
            _write_image_stream(bw, mpix, mw, mh, False)
            meta = meta.reshape(mh, mw)
        else:
            bw.write(0, 1)

    # tokenize: (kind, payload) where kind 0=literal argb, 1=(len,dist),
    # 2=cache index
    tokens: list[tuple[int, object]] = []
    n = w * h
    i = 0
    px = pixels.astype(np.uint32)
    while i < n:
        if use_lz77 and i > 0:
            # greedy: try distance 1..min(i, 8*w) for a match ≥ 3
            best_len, best_dist = 0, 0
            for dist in (1, 2, 3, w - 1, w, w + 1, 2 * w):
                if dist <= 0 or dist > i:
                    continue
                ln = 0
                while i + ln < n and ln < 4096 and px[i + ln] == px[i + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append((1, (best_len, best_dist)))
                if cache is not None:
                    for k in range(best_len):
                        v = int(px[i + k])
                        cache[_cache_key(v, cache_bits)] = v
                i += best_len
                continue
        v = int(px[i])
        if cache is not None and cache[_cache_key(v, cache_bits)] == v and i > 0:
            tokens.append((2, _cache_key(v, cache_bits)))
        else:
            tokens.append((0, v))
            if cache is not None:
                cache[_cache_key(v, cache_bits)] = v
        i += 1

    # group assignment per token position
    def group_of(pos: int) -> int:
        if meta is None:
            return 0
        x, y = pos % w, pos // w
        return int(meta[y >> meta_bits, x >> meta_bits])

    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabet = [256 + _GREEN_EXTRA + cache_size, 256, 256, 256, 40]
    freqs = [[np.zeros(a, np.int64) for a in alphabet] for _ in range(num_groups)]
    pos = 0
    for kind, payload in tokens:
        gi = group_of(pos)
        f = freqs[gi]
        if kind == 0:
            v = int(payload)
            f[0][(v >> 8) & 0xFF] += 1
            f[1][(v >> 16) & 0xFF] += 1
            f[2][v & 0xFF] += 1
            f[3][(v >> 24) & 0xFF] += 1
            pos += 1
        elif kind == 1:
            ln, dist = payload
            lcode, _, _ = _lz77_prefix(ln)
            f[0][256 + lcode] += 1
            # encode distance via the plane map when in range
            dcode = None
            for ci, (mx, my) in enumerate(_DIST_MAP):
                if my * w + mx == dist:
                    dcode = ci + 1
                    break
            if dcode is None:
                dcode = dist + 120
            pcode, _, _ = _lz77_prefix(dcode)
            f[4][pcode] += 1
            pos += ln
        else:
            f[0][256 + _GREEN_EXTRA + payload] += 1
            pos += 1
    codes = []
    for gi in range(num_groups):
        gcodes = []
        for ci, a in enumerate(alphabet):
            fr = freqs[gi][ci].copy()
            if fr.sum() == 0:
                fr[0] = 1  # a code must exist even if unused
            gcodes.append(_write_prefix_code(bw, _huffman_lengths(fr)))
        codes.append(gcodes)
    pos = 0
    for kind, payload in tokens:
        c = codes[group_of(pos)]
        if kind == 0:
            v = int(payload)
            c[0].encode(bw, (v >> 8) & 0xFF)
            c[1].encode(bw, (v >> 16) & 0xFF)
            c[2].encode(bw, v & 0xFF)
            c[3].encode(bw, (v >> 24) & 0xFF)
            pos += 1
        elif kind == 1:
            ln, dist = payload
            lcode, lx, lb = _lz77_prefix(ln)
            c[0].encode(bw, 256 + lcode)
            if lb:
                bw.write(lx, lb)
            dcode = None
            for ci, (mx, my) in enumerate(_DIST_MAP):
                if my * w + mx == dist:
                    dcode = ci + 1
                    break
            if dcode is None:
                dcode = dist + 120
            pcode, dx_, db = _lz77_prefix(dcode)
            c[4].encode(bw, pcode)
            if db:
                bw.write(dx_, db)
            pos += ln
        else:
            c[0].encode(bw, 256 + _GREEN_EXTRA + payload)
            pos += 1


def _fwd_predictor(ch: np.ndarray, size_bits: int, mode: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward predictor with a FIXED mode for every block; returns
    (residual channels, transform sub-image pixels)."""
    h, w = ch.shape[:2]
    src = ch.astype(np.int32)
    res = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                L = src[y, x - 1]
                T = src[y - 1, x]
                TL = src[y - 1, x - 1]
                TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            res[y, x] = (src[y, x] - pred) & 0xFF
    bw_ = -(-w // (1 << size_bits))
    bh_ = -(-h // (1 << size_bits))
    sub = np.full(bh_ * bw_, 0xFF000000 | (mode << 8), np.uint32)
    return res.astype(np.uint8), sub


def encode_webp(pixels: np.ndarray, *, transform: str = "auto",
                predictor_mode: int = 2, color_element: tuple = (0, 0, 0),
                cache_bits: int = 0, use_lz77: bool = False,
                meta_bits: int = 0, predictor_bits: int = 4) -> bytes:
    """(H, W, 3) / (H, W, 4) / (H, W) uint8 → lossless WebP.

    ``transform``: 'auto' (palette when ≤256 colors, else none),
    'none', 'palette', 'subtract_green', 'predictor' (fixed
    ``predictor_mode`` per block), or 'color' (fixed
    ``color_element = (green_to_red, green_to_blue, red_to_blue)``).
    The knobs exist so tests can drive every decoder path."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=2)
    h, w = px.shape[:2]
    if px.shape[2] == 3:
        ch = np.concatenate([np.full((h, w, 1), 255, np.uint8), px], axis=2)
    else:  # RGBA → ARGB
        ch = px[:, :, [3, 0, 1, 2]]

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((ch[:, :, 0] != 255).any()), 1)
    bw.write(0, 3)  # version

    if transform == "auto":
        flat = ch.reshape(-1, 4)
        uniq = np.unique(flat, axis=0)
        transform = "palette" if len(uniq) <= 256 else "none"

    stream_w = w
    if transform == "none":
        bw.write(0, 1)
        body = _pack(ch)
    elif transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        bw.write(0, 1)  # no more transforms
        out = ch.astype(np.int32)
        out[:, :, 1] = (out[:, :, 1] - out[:, :, 2]) & 0xFF
        out[:, :, 3] = (out[:, :, 3] - out[:, :, 2]) & 0xFF
        body = _pack(out.astype(np.uint8))
    elif transform == "predictor":
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_bits - 2, 3)
        res, sub = _fwd_predictor(ch, predictor_bits, predictor_mode)
        bw_sub = -(-w // (1 << predictor_bits))
        bh_sub = -(-h // (1 << predictor_bits))
        _write_image_stream(bw, sub, bw_sub, bh_sub, False)
        bw.write(0, 1)
        body = _pack(res)
    elif transform == "color":
        bw.write(1, 1)
        bw.write(1, 2)
        size_bits = 4
        bw.write(size_bits - 2, 3)
        g2r, g2b, r2b = (v & 0xFF for v in color_element)
        bw_sub = -(-w // (1 << size_bits))
        bh_sub = -(-h // (1 << size_bits))
        elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _write_image_stream(bw, np.full(bw_sub * bh_sub, elem, np.uint32),
                            bw_sub, bh_sub, False)
        bw.write(0, 1)
        out = ch.astype(np.int32)
        e_g2r = np.full((h, w), g2r, np.uint8)
        e_g2b = np.full((h, w), g2b, np.uint8)
        e_r2b = np.full((h, w), r2b, np.uint8)
        # forward: subtract deltas (blue uses the ORIGINAL red = recovered red)
        out[:, :, 3] = (out[:, :, 3] - _ct_delta(e_g2b, ch[:, :, 2].astype(np.int32))
                        - _ct_delta(e_r2b, ch[:, :, 1].astype(np.int32))) & 0xFF
        out[:, :, 1] = (out[:, :, 1] - _ct_delta(e_g2r, ch[:, :, 2].astype(np.int32))) & 0xFF
        body = _pack(out.astype(np.uint8))
    elif transform == "palette":
        flat = ch.reshape(-1, 4)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise NotImplementedError("palette transform needs ≤256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(pal) - 1, 8)
        deltas = np.diff(np.concatenate([np.zeros((1, 4), np.uint16),
                                         pal.astype(np.uint16)]), axis=0).astype(np.uint8)
        dpix = ((deltas[:, 0].astype(np.uint32) << 24)
                | (deltas[:, 1].astype(np.uint32) << 16)
                | (deltas[:, 2].astype(np.uint32) << 8)
                | deltas[:, 3].astype(np.uint32))
        _write_image_stream(bw, dpix, len(pal), 1, False)
        bw.write(0, 1)
        idx = inv.astype(np.uint32).reshape(h, w)
        if len(pal) <= 2:
            wbits = 3
        elif len(pal) <= 4:
            wbits = 2
        elif len(pal) <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            bits = 8 >> wbits
            stream_w = -(-w // per)
            packed = np.zeros((h, stream_w), np.uint32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * bits)
            green = packed
        else:
            stream_w = w
            green = idx
        body = ((np.uint32(0xFF) << 24) | (green.reshape(-1) << 8)).astype(np.uint32)
    else:
        raise ValueError(transform)

    _write_image_stream(bw, body, stream_w, h, True, cache_bits=cache_bits,
                        use_lz77=use_lz77, meta_bits=meta_bits)
    data = bw.getvalue()
    if len(data) & 1:
        data += b"\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
