"""Pure-Python/numpy baseline TIFF 6.0 codec (public spec).

Scope — the baseline-TIFF subset a crawler actually meets for 8-bit
raster images (reference surfaces ``.tif``/``.tiff`` as static image
assets, src/engine/crawler.rs content-type mapping; repo twin:
functions/urls.py IMAGE extension set):

- encode: little-endian ("II"), chunky (PlanarConfiguration=1) 8-bit
  grayscale / RGB / RGBA, multi-strip (``rows_per_strip``),
  Compression 1 (none) or 32773 (PackBits, rows packed independently
  per the spec's "must begin on a row boundary" rule).
- decode: both byte orders ("II"/"MM"), Compression 1 + 32773,
  Photometric 0 (WhiteIsZero, inverted to BlackIsZero on return),
  1 (BlackIsZero) and 2 (RGB), any strip layout, inline or offset
  tag values.  Everything outside the subset (16-bit, palettes, LZW /
  Deflate / JPEG-in-TIFF, tiles, planar) raises ``NotImplementedError``
  — honest gates, same policy as the sibling codecs.

The correctness encoder drives every decoder path (both compressions,
both strip shapes); big-endian decode is exercised by a byte-swapped
re-emit in the tests.  Returns (H, W, C) uint8 with C ∈ {1, 3, 4},
the shape convention shared by stages/multimodal.decode_image.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"
_MM = b"MM\x00*"

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _EXTRA_SAMPLES = 284, 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}  # BYTE..SLONG


def _packbits_encode_row(row: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9): literal runs ≤128, repeat runs 2..128."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # repeat run of ≥3 at i (2 is break-even; spec recommends ≥3)
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        # literal run [i, j): until a ≥3 repeat starts or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(row[i:j])
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise NotImplementedError("truncated PackBits strip")
        ctrl = data[i]
        i += 1
        if ctrl == 128:  # no-op
            continue
        if ctrl < 128:  # literal ctrl+1 bytes
            if i + ctrl + 1 > len(data):
                raise NotImplementedError("truncated PackBits literal run")
            out.extend(data[i : i + ctrl + 1])
            i += ctrl + 1
        else:  # repeat next byte 257-ctrl times
            if i >= len(data):
                raise NotImplementedError("truncated PackBits repeat run")
            out.extend(data[i : i + 1] * (257 - ctrl))
            i += 1
    if len(out) != expected:
        raise NotImplementedError("PackBits strip overran its row budget")
    return bytes(out)


def encode_tiff(px: np.ndarray, *, compression: int = 1,
                rows_per_strip: int = 8) -> bytes:
    """(H, W[, C]) uint8 → little-endian baseline TIFF bytes."""
    if px.dtype != np.uint8:
        raise NotImplementedError("8-bit samples only")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3, 4):
        raise NotImplementedError(f"{c}-sample pixels not supported")
    if compression not in (1, 32773):
        raise NotImplementedError("encode supports none/PackBits only")

    row_bytes = w * c
    raw = np.ascontiguousarray(px).reshape(h, row_bytes)
    strips, counts = [], []
    for top in range(0, h, rows_per_strip):
        rows = raw[top : top + rows_per_strip]
        if compression == 1:
            strip = rows.tobytes()
        else:
            strip = b"".join(_packbits_encode_row(r.tobytes()) for r in rows)
        strips.append(strip)
        counts.append(len(strip))

    # layout: header | strip data | BitsPerSample array (c>2) | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    bits_off = pos
    if c > 2:
        pos += 2 * c
    # long arrays for strip offsets/counts when they don't fit inline
    extra = b""
    if len(strips) > 1:
        off_arr_pos = pos + len(extra)
        extra += b"".join(struct.pack("<I", o) for o in offsets)
        cnt_arr_pos = pos + len(extra)
        extra += b"".join(struct.pack("<I", n) for n in counts)
        pos += len(extra)
    ifd_off = pos

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        return struct.pack("<HHII", tag, typ, cnt, val)

    entries = [
        entry(_WIDTH, 3, 1, w),
        entry(_LENGTH, 3, 1, h),
        (entry(_BITS, 3, c, bits_off) if c > 2
         else entry(_BITS, 3, c, 8 if c == 1 else 8 | (8 << 16))),
        entry(_COMPRESSION, 3, 1, compression),
        entry(_PHOTOMETRIC, 3, 1, 1 if c == 1 else 2),
        (entry(_STRIP_OFFSETS, 4, len(strips), offsets[0]) if len(strips) == 1
         else entry(_STRIP_OFFSETS, 4, len(strips), off_arr_pos)),
        entry(_SPP, 3, 1, c),
        entry(_ROWS_PER_STRIP, 3, 1, min(rows_per_strip, h)),
        (entry(_STRIP_COUNTS, 4, len(strips), counts[0]) if len(strips) == 1
         else entry(_STRIP_COUNTS, 4, len(strips), cnt_arr_pos)),
        entry(_PLANAR, 3, 1, 1),
    ]
    if c == 4:
        entries.append(entry(_EXTRA_SAMPLES, 3, 1, 2))  # unassociated alpha
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for s in strips:
        out += s
    if c > 2:
        out += struct.pack(f"<{c}H", *([8] * c))
    out += extra
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)


def _read_tag_values(buf: bytes, bo: str, typ: int, cnt: int,
                     raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF tag type {typ} not supported")
    total = size * cnt
    data = raw[:total] if total <= 4 else \
        buf[struct.unpack(bo + "I", raw)[0]:][:total]
    if len(data) < total:
        raise NotImplementedError("truncated TIFF tag value")
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}.get(typ)
    if fmt is None:
        raise NotImplementedError(f"TIFF tag type {typ} not supported")
    return list(struct.unpack(bo + fmt * cnt, data))


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (H, W, C) uint8; NotImplementedError for
    anything outside the documented subset."""
    if payload[:4] == _II:
        bo = "<"
    elif payload[:4] == _MM:
        bo = ">"
    else:
        raise NotImplementedError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise NotImplementedError("truncated TIFF: IFD out of range")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    needed = {_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTOMETRIC,
              _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS,
              _PLANAR, _EXTRA_SAMPLES}
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        if tag not in needed:  # ASCII Software/DateTime etc.: ignore
            continue
        tags[tag] = _read_tag_values(payload, bo, typ, cnt,
                                     payload[off + 8 : off + 12])

    for required in (_WIDTH, _LENGTH, _STRIP_OFFSETS, _STRIP_COUNTS):
        if required not in tags:
            raise NotImplementedError(f"TIFF missing required tag {required}")
    w, h = tags[_WIDTH][0], tags[_LENGTH][0]
    c = tags.get(_SPP, [1])[0]
    comp = tags.get(_COMPRESSION, [1])[0]
    photo = tags.get(_PHOTOMETRIC, [1])[0]
    bits = tags.get(_BITS, [8] * c)
    if any(b != 8 for b in bits) or len(bits) != c:
        raise NotImplementedError(f"only 8-bit samples supported (got {bits})")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (none/PackBits only)")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if photo == 2 and c < 3:
        raise NotImplementedError("RGB photometric with <3 samples")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    if c not in (1, 3, 4):
        raise NotImplementedError(f"{c}-sample TIFF not supported")

    rps = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    offsets, counts = tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise NotImplementedError("strip offset/count tables disagree")
    row_bytes = w * c
    raw = bytearray()
    for s, (o, n) in enumerate(zip(offsets, counts)):
        strip = payload[o : o + n]
        if len(strip) < n:
            raise NotImplementedError("truncated TIFF strip")
        rows_here = min(rps, h - s * rps)
        if rows_here <= 0:
            raise NotImplementedError("TIFF has more strips than rows")
        if comp == 1:
            if n != rows_here * row_bytes:
                raise NotImplementedError("uncompressed strip size mismatch")
            raw += strip
        else:
            raw += _packbits_decode(strip, rows_here * row_bytes)
    if len(raw) != h * row_bytes:
        raise NotImplementedError("TIFF strips do not cover the image")
    px = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, c)
    if photo == 0:  # WhiteIsZero → invert to the BlackIsZero convention
        px = 255 - px
    return px.copy()
