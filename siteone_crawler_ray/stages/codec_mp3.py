"""MPEG audio (MP3) frame-sync probe — container walk, opaque frames.

Same policy as ``codec_mp4``/``codec_avi``: the CONTAINER layer is real
— ID3v2 tag skip (syncsafe size), ID3v1 trailer skip, frame-header
parse (MPEG 1/2/2.5 × Layer I/II/III bitrate + sample-rate tables,
padding, frame-length formulas), a full frame-by-frame sync walk, and
Xing/Info/VBRI header detection — while the Huffman/IMDCT payload stays
opaque (``NotImplementedError`` is reserved for non-MPEG payloads; the
probe never decodes samples).  ``probe_mp3`` walks EVERY frame, so the
duration is the exact sum of per-frame samples/rate rather than a
bitrate estimate, and VBR streams are detected structurally
(more than one distinct bitrate) as well as via the Xing tag.

The test-side ``synthesize_mp3`` builds syntactically valid frame
sequences (correct headers, deterministic filler payload) so every
walk path is driven by a known ground truth — frames are opaque, so a
real encoder is not required for container parity.
"""

from __future__ import annotations

import struct

# bitrate table [kbps], index 1-14; row key = (version_group, layer)
# version_group: 0 = MPEG1, 1 = MPEG2/2.5 (ISO 11172-3 / 13818-3)
_BITRATES = {
    (0, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample-rate table [Hz] by version bits (00=2.5, 10=2, 11=1)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}
_SAMPLES_PER_FRAME = {(0, 1): 384, (0, 2): 1152, (0, 3): 1152,
                      (1, 1): 384, (1, 2): 1152, (1, 3): 576}


def _parse_header(hdr: int) -> dict | None:
    """32-bit big-endian frame header → fields, or None if invalid."""
    if hdr >> 21 != 0x7FF:
        return None
    ver_bits = (hdr >> 19) & 3
    layer_bits = (hdr >> 17) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3→I, 2→II, 1→III
    vgroup = 0 if ver_bits == 3 else 1
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / reserved
    bitrate = _BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = _RATES[ver_bits][sr_idx]
    padding = (hdr >> 9) & 1
    spf = _SAMPLES_PER_FRAME[(vgroup, layer)]
    if layer == 1:
        length = (12 * bitrate // rate + padding) * 4
    else:
        length = spf // 8 * bitrate // rate + padding
    channels = 1 if ((hdr >> 6) & 3) == 3 else 2
    return {"version": {3: "1", 2: "2", 0: "2.5"}[ver_bits], "layer": layer,
            "bitrate": bitrate, "sample_rate": rate, "padding": padding,
            "frame_length": length, "samples": spf, "channels": channels}


def _skip_id3v2(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
    return 10 + size + (10 if payload[5] & 0x10 else 0)  # + footer


def probe_mp3(payload: bytes) -> dict:
    """MP3 bytes → {duration_sec, n_frames, sample_rate, channels,
    bitrate (mode or mean), vbr, layer, version, has_xing, id3v2}.
    NotImplementedError when no MPEG frame sync is found."""
    pos = _skip_id3v2(payload)
    id3v2 = pos > 0
    end = len(payload)
    if end >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = 0
    dur = 0.0
    bitrates: dict[int, int] = {}
    first = None
    has_xing = False
    while pos + 4 <= end:
        h = _parse_header(struct.unpack(">I", payload[pos : pos + 4])[0])
        if h is None:
            if frames:
                break  # trailing garbage after a valid stream
            pos += 1  # resync scan before the first frame
            continue
        if pos + h["frame_length"] > end:
            break  # truncated final frame: stop at the last whole one
        if first is None:
            first = h
            body = payload[pos + 4 : pos + h["frame_length"]]
            if b"Xing" in body[:48] or b"Info" in body[:48] \
                    or b"VBRI" in body[:40]:
                has_xing = True
        frames += 1
        dur += h["samples"] / h["sample_rate"]
        bitrates[h["bitrate"]] = bitrates.get(h["bitrate"], 0) + 1
        pos += h["frame_length"]
    if first is None or frames == 0:
        raise NotImplementedError("no MPEG audio frame sync found")
    vbr = has_xing or len(bitrates) > 1
    mode_bitrate = max(bitrates.items(), key=lambda kv: kv[1])[0]
    return {
        "duration_sec": dur,
        "n_frames": frames,
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "bitrate": mode_bitrate,
        "vbr": vbr,
        "layer": first["layer"],
        "version": first["version"],
        "has_xing": has_xing,
        "id3v2": id3v2,
    }


def synthesize_mp3(n_frames: int, *, bitrate_kbps: int = 128,
                   sample_rate: int = 44100, layer: int = 3,
                   vbr_alternate_kbps: int | None = None,
                   id3v2_bytes: int = 0, id3v1: bool = False,
                   xing: bool = False, seed: int = 1) -> bytes:
    """Syntactically valid MPEG1 frame sequence with deterministic
    filler payload — the probe's ground-truth generator (frames are
    opaque, so container parity needs no real audio encoder)."""
    out = bytearray()
    if id3v2_bytes:
        body = bytes((seed + k) % 256 for k in range(id3v2_bytes))
        out += b"ID3\x04\x00\x00" + bytes(
            (id3v2_bytes >> s) & 0x7F for s in (21, 14, 7, 0)) + body
    rates = _RATES[3]
    sr_idx = rates.index(sample_rate)
    table = _BITRATES[(0, layer)]
    for f in range(n_frames):
        kbps = bitrate_kbps
        if vbr_alternate_kbps is not None and f % 2 == 1:
            kbps = vbr_alternate_kbps
        br_idx = table.index(kbps) + 1
        hdr = (0x7FF << 21 | 3 << 19 | (4 - layer) << 17 | 1 << 16
               | br_idx << 12 | sr_idx << 10 | 0 << 9 | 0 << 8 | 1 << 6)
        spf = _SAMPLES_PER_FRAME[(0, layer)]
        if layer == 1:
            length = (12 * kbps * 1000 // sample_rate) * 4
        else:
            length = spf // 8 * kbps * 1000 // sample_rate
        body = bytearray((seed + f + k) % 256 for k in range(length - 4))
        if xing and f == 0:
            # MPEG1 stereo side info is 32 bytes → Xing follows it
            body[:40] = b"\x00" * 40
            body[32:36] = b"Xing"
        frame = struct.pack(">I", hdr) + bytes(body)
        assert len(frame) == length
        out += frame
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
