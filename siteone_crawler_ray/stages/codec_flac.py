"""Pure-Python FLAC codec (decode + correctness encoder).

Implemented from the PUBLIC FLAC format specification (RFC 9639):
MSB-first bit packing, STREAMINFO metadata, frame headers with UTF-8
coded frame numbers and CRC-8/CRC-16 integrity checks, CONSTANT /
VERBATIM / FIXED (orders 0-4) / LPC subframes, Rice-coded residuals
with partitioning and the escape code, and the left-side / right-side
/ mid-side stereo decorrelations.

The reference crawler classifies ``audio/flac`` like any other fetched
audio asset (content-type mapping around
``/root/reference/src/engine/crawler.rs:1557-1596``); this lets the
audio decode stage open the second major audio container without
libFLAC/ffmpeg, which are absent from this container.  The encoder is
a correctness encoder: every subframe type and stereo mode can be
forced, so round-trip tests exercise every decoder path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# MSB-first bit I/O (FLAC is big-endian at the bit level)
# ---------------------------------------------------------------------------


class _BitReaderMSB:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        for _ in range(n):
            byte = p >> 3
            if byte >= len(data):
                raise NotImplementedError("truncated FLAC stream")
            v = (v << 1) | ((data[byte] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriterMSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, bits: int) -> np.ndarray:
    top = 1 << (bits - 1)
    mask = (1 << bits) - 1
    tab = np.zeros(256, np.uint32)
    for i in range(256):
        c = i << (bits - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[(c ^ b) & 0xFF])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame numbers)
# ---------------------------------------------------------------------------


def _write_utf8_number(bw: _BitWriterMSB, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    bits = v.bit_length()
    nbytes = 2
    while bits > 6 - nbytes + 1 + 6 * (nbytes - 1):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    payload_bits = 6 * (nbytes - 1)
    bw.write(lead | (v >> payload_bits), 8)
    for k in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _read_utf8_number(br: _BitReaderMSB) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


# ---------------------------------------------------------------------------
# Rice residual coding
# ---------------------------------------------------------------------------


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)  # int64 arithmetic-shift zigzag


def _write_residuals(bw: _BitWriterMSB, res: np.ndarray, order: int,
                     block_size: int, partition_order: int) -> None:
    bw.write(0, 2)  # 4-bit rice parameters
    bw.write(partition_order, 4)
    parts = 1 << partition_order
    plen = block_size >> partition_order
    pos = 0
    for p in range(parts):
        n = plen - (order if p == 0 else 0)
        chunk = res[pos : pos + n].astype(np.int64)
        pos += n
        u = _zigzag(chunk)
        # pick the smallest 4-bit rice parameter that keeps unary short
        best_k, best_cost = 0, None
        for k in range(15):
            cost = int((u >> k).sum()) + n * (k + 1)
            if best_cost is None or cost < best_cost:
                best_k, best_cost = k, cost
        bw.write(best_k, 4)
        for val in u.tolist():
            bw.write_unary(int(val) >> best_k)
            if best_k:
                bw.write(int(val) & ((1 << best_k) - 1), best_k)


def _read_residuals(br: _BitReaderMSB, order: int, block_size: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    partition_order = br.read(4)
    parts = 1 << partition_order
    plen = block_size >> partition_order
    out = np.empty(block_size - order, np.int64)
    pos = 0
    for p in range(parts):
        n = plen - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == (1 << pbits) - 1:  # escape: raw residuals
            raw_bits = br.read(5)
            for i in range(n):
                out[pos + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                out[pos + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        pos += n
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC → (sample_rate, channels, samples) with samples int32 of
    shape (n,) mono or (n, channels).  CONSTANT/VERBATIM/FIXED/LPC
    subframes, Rice partitions + escapes, stereo decorrelations;
    Ogg-FLAC and non-FLAC payloads raise NotImplementedError."""
    if payload[:4] != b"fLaC":
        raise NotImplementedError("not a native FLAC payload")
    pos = 4
    rate = channels = bps = None
    total = 0
    while True:
        if pos + 4 > len(payload):
            raise NotImplementedError("malformed FLAC: no frames")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        btype = hdr & 0x7F
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            br = _BitReaderMSB(body)
            br.read(16)  # min block size
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + size
        if hdr & 0x80:
            break
    if rate is None:
        raise NotImplementedError("FLAC stream missing STREAMINFO")

    out = [[] for _ in range(channels)]
    got = 0
    while got < total and pos < len(payload):
        frame_start = pos
        br = _BitReaderMSB(payload, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise NotImplementedError("lost FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 1:
            block_size = 192
        elif 2 <= bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code >= 8:
            block_size = 256 << (bs_code - 8)
        else:
            raise NotImplementedError("reserved FLAC block size code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        hdr_end = (br.pos + 7) >> 3
        crc8 = br.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8:
            raise NotImplementedError("FLAC frame header CRC mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            mode = "indep"
        elif ch_code == 8:
            nch, mode = 2, "left_side"
        elif ch_code == 9:
            nch, mode = 2, "right_side"
        elif ch_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise NotImplementedError("reserved FLAC channel assignment")
        if nch != channels:
            raise NotImplementedError("FLAC frame/stream channel mismatch")
        if ss_code == 0:
            fbps = bps
        else:
            fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if fbps is None:
                raise NotImplementedError("reserved FLAC sample size code")

        chans = []
        for c in range(nch):
            sbps = fbps
            # side channels carry one extra bit
            if (mode == "left_side" and c == 1) or (mode == "right_side" and c == 0) \
                    or (mode == "mid_side" and c == 1):
                sbps += 1
            if br.read(1):
                raise NotImplementedError("bad FLAC subframe padding bit")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = br.read_unary() + 1
                sbps -= wasted
            if stype == 0:  # CONSTANT
                v = br.read_signed(sbps)
                samples = np.full(block_size, v, np.int64)
            elif stype == 1:  # VERBATIM
                samples = np.array([br.read_signed(sbps) for _ in range(block_size)],
                                   np.int64)
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                warm = [br.read_signed(sbps) for _ in range(order)]
                res = _read_residuals(br, order, block_size)
                samples = np.empty(block_size, np.int64)
                samples[:order] = warm
                coefs = _FIXED_COEFS[order]
                for i in range(order, block_size):
                    pred = sum(coefs[j] * samples[i - 1 - j] for j in range(order))
                    samples[i] = res[i - order] + pred
            elif stype >= 32:  # LPC order 1-32
                order = stype - 31
                warm = [br.read_signed(sbps) for _ in range(order)]
                prec = br.read(4) + 1
                if prec == 16:
                    raise NotImplementedError("invalid FLAC LPC precision")
                shift = br.read_signed(5)
                coefs = [br.read_signed(prec) for _ in range(order)]
                res = _read_residuals(br, order, block_size)
                samples = np.empty(block_size, np.int64)
                samples[:order] = warm
                for i in range(order, block_size):
                    pred = sum(coefs[j] * samples[i - 1 - j] for j in range(order)) >> shift
                    samples[i] = res[i - order] + pred
            else:
                raise NotImplementedError(f"reserved FLAC subframe type {stype}")
            if wasted:
                samples = samples << wasted
            chans.append(samples)
        br.align()
        crc16 = br.read(16)
        if _crc16(payload[frame_start : (br.pos >> 3) - 2]) != crc16:
            raise NotImplementedError("FLAC frame CRC-16 mismatch")
        pos = br.pos >> 3

        if mode == "left_side":
            left, side = chans
            chans = [left, left - side]
        elif mode == "right_side":
            side, right = chans
            chans = [right + side, right]
        elif mode == "mid_side":
            mid, side = chans
            left = (((mid << 1) | (side & 1)) + side) >> 1
            chans = [left, left - side]
        for c in range(channels):
            out[c].append(chans[c])
        got += block_size

    cols = [np.concatenate(ch)[:total] for ch in out]
    arr = cols[0] if channels == 1 else np.stack(cols, axis=1)
    return rate, channels, arr.astype(np.int32)


# ---------------------------------------------------------------------------
# encode (correctness encoder)
# ---------------------------------------------------------------------------


def encode_flac(samples: np.ndarray, sample_rate: int = 8000, *,
                bits_per_sample: int = 16, block_size: int = 4096,
                subframe: str = "fixed", fixed_order: int = 2,
                lpc_coefs: tuple = (3, -2), lpc_shift: int = 1,
                stereo_mode: str = "indep",
                partition_order: int = 0) -> bytes:
    """int samples (n,) or (n, 2) → native FLAC.  ``subframe``:
    'fixed' (given order, CONSTANT auto-detected per block),
    'verbatim', or 'lpc' (given quantized coefficients/shift).
    ``stereo_mode``: 'indep' | 'left_side' | 'right_side' |
    'mid_side'.  The knobs drive every decoder path in tests."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if channels > 2 and stereo_mode != "indep":
        raise ValueError("decorrelation needs exactly 2 channels")

    out = bytearray(b"fLaC")
    info = _BitWriterMSB()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bits_per_sample - 1, 5)
    info.write(n, 36)
    body = info.getvalue() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def write_subframe(bw: _BitWriterMSB, ch: np.ndarray, sbps: int) -> None:
        bw.write(0, 1)
        if subframe == "verbatim":
            bw.write(1, 6)
            bw.write(0, 1)
            for v in ch.tolist():
                bw.write_signed(int(v), sbps)
            return
        if (ch == ch[0]).all():
            bw.write(0, 6)  # CONSTANT
            bw.write(0, 1)
            bw.write_signed(int(ch[0]), sbps)
            return
        if subframe == "lpc":
            order = len(lpc_coefs)
            bw.write(32 + order - 1, 6)
            bw.write(0, 1)
            for v in ch[:order].tolist():
                bw.write_signed(int(v), sbps)
            prec = 15
            bw.write(prec - 1, 4)
            bw.write_signed(lpc_shift, 5)
            for cf in lpc_coefs:
                bw.write_signed(int(cf), prec)
            pred = np.zeros(len(ch) - order, np.int64)
            for j in range(order):
                pred += lpc_coefs[j] * ch[order - 1 - j : len(ch) - 1 - j]
            res = ch[order:] - (pred >> lpc_shift)
            _write_residuals(bw, res, order, len(ch), 0)
            return
        order = fixed_order
        if len(ch) <= order:
            bw.write(1, 6)  # tiny tail block: verbatim
            bw.write(0, 1)
            for v in ch.tolist():
                bw.write_signed(int(v), sbps)
            return
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in ch[:order].tolist():
            bw.write_signed(int(v), sbps)
        res = ch[order:].copy()
        coefs = _FIXED_COEFS[order]
        if order:
            pred = np.zeros(len(ch) - order, np.int64)
            for j in range(order):
                pred += coefs[j] * ch[order - 1 - j : len(ch) - 1 - j]
            res = ch[order:] - pred
        po = partition_order
        while po and (((len(ch) >> po) << po) != len(ch) or (len(ch) >> po) <= order):
            po -= 1
        _write_residuals(bw, res, order, len(ch), po)

    frame_no = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        bw = _BitWriterMSB()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # sample rate from STREAMINFO
        ch_code = {"indep": channels - 1, "left_side": 8,
                   "right_side": 9, "mid_side": 10}[stereo_mode]
        bw.write(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample]
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        hdr = bw
        # CRC-8 over the header bytes so far (bit-aligned by construction)
        hdr_bytes = bytes(hdr.out)
        assert hdr.nbits == 0
        bw.write(_crc8(hdr_bytes), 8)

        if stereo_mode == "indep":
            chans = [(blk[:, c], bits_per_sample) for c in range(channels)]
        elif stereo_mode == "left_side":
            chans = [(blk[:, 0], bits_per_sample),
                     (blk[:, 0] - blk[:, 1], bits_per_sample + 1)]
        elif stereo_mode == "right_side":
            chans = [(blk[:, 0] - blk[:, 1], bits_per_sample + 1),
                     (blk[:, 1], bits_per_sample)]
        else:  # mid_side
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            chans = [(mid, bits_per_sample), (side, bits_per_sample + 1)]
        for ch, sbps in chans:
            write_subframe(bw, np.asarray(ch, np.int64), sbps)
        bw.align()
        frame_bytes = bytes(bw.out)
        bw.write(_crc16(frame_bytes), 16)
        out += bw.getvalue()
        frame_no += 1
    return bytes(out)
