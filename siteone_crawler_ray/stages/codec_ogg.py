"""Ogg container probe (RFC 3533) — page walk, opaque codec packets.

Container-real / payload-opaque, like the MP4/AVI/MP3 walks: page
sync ('OggS'), version/flag/serial/sequence fields, the 27-byte header
+ segment-lacing table, continued-packet accounting, per-stream granule
positions, and first-packet codec identification for the common web
codecs (Vorbis, Opus, Theora, FLAC-in-Ogg, Speex).  Durations come
from the last granule position per RFC 7845 (Opus: granule is 48 kHz
PCM samples minus pre-skip) and the Vorbis I spec (granule is PCM
samples at the stream rate); entropy decode of the packets stays out
of scope — ``NotImplementedError`` is reserved for non-Ogg payloads.

``synthesize_ogg`` builds syntactically valid single-stream files with
deterministic filler packets so every walk path has known ground
truth without a real encoder.
"""

from __future__ import annotations

import struct


def _crc_table() -> list[int]:
    # CRC-32 poly 0x04c11db7, no reflection, init/xorout 0 (RFC 3533 A.1)
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) \
                & 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def _ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
    return r


def _identify(first_packet: bytes) -> tuple[str, int, int]:
    """(codec, sample_rate, pre_skip) from a BOS packet."""
    if first_packet[:7] == b"\x01vorbis":
        channels = first_packet[11]
        (rate,) = struct.unpack("<I", first_packet[12:16])
        return "vorbis", rate, 0
    if first_packet[:8] == b"OpusHead":
        pre_skip = struct.unpack("<H", first_packet[10:12])[0]
        return "opus", 48000, pre_skip  # granule domain is fixed 48 kHz
    if first_packet[:7] == b"\x80theora":
        return "theora", 0, 0
    if first_packet[:5] == b"\x7fFLAC":
        return "flac", 0, 0
    if first_packet[:8] == b"Speex   ":
        (rate,) = struct.unpack("<I", first_packet[36:40])
        return "speex", rate, 0
    return "unknown", 0, 0


def probe_ogg(payload: bytes, *, verify_crc: bool = True) -> dict:
    """Ogg bytes → {codec, sample_rate, duration_sec, n_pages,
    n_packets, serials, eos}; NotImplementedError for non-Ogg data."""
    if payload[:4] != b"OggS":
        raise NotImplementedError("not an Ogg payload (no OggS capture)")
    pos = 0
    n_pages = 0
    n_packets = 0
    last_granule: dict[int, int] = {}
    first_packet_by_serial: dict[int, bytes] = {}
    eos_serials: set[int] = set()
    continued: dict[int, bool] = {}
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            if n_pages:
                break  # trailing garbage after a valid stream
            raise NotImplementedError("lost Ogg page sync")
        (version, htype, granule, serial, _seq, crc, nsegs) = struct.unpack(
            "<BBqIIIB", payload[pos + 4 : pos + 27])
        if version != 0:
            raise NotImplementedError(f"Ogg stream-structure version {version}")
        lacing = payload[pos + 27 : pos + 27 + nsegs]
        body_at = pos + 27 + nsegs
        body_len = sum(lacing)
        page_end = body_at + body_len
        if page_end > len(payload):
            break  # truncated final page: stop at the last whole one
        if verify_crc:
            page = bytearray(payload[pos:page_end])
            page[22:26] = b"\x00\x00\x00\x00"
            if _ogg_crc(bytes(page)) != crc:
                raise NotImplementedError("Ogg page CRC mismatch")
        # packets end at lacing values < 255
        seg_pos = body_at
        pkt_start = None
        for k, lv in enumerate(lacing):
            if pkt_start is None:
                pkt_start = seg_pos
            seg_pos += lv
            if lv < 255:
                if not (k == 0 and continued.get(serial)):
                    n_packets += 1
                    if serial not in first_packet_by_serial:
                        first_packet_by_serial[serial] = \
                            payload[pkt_start:seg_pos]
                else:
                    continued[serial] = False
                    n_packets += 1  # continuation completes one packet
                pkt_start = None
        continued[serial] = bool(lacing) and lacing[-1] == 255
        if granule >= 0:
            last_granule[serial] = granule
        if htype & 0x04:
            eos_serials.add(serial)
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise NotImplementedError("no complete Ogg page")
    # duration from the first identified audio stream
    codec, rate, dur = "unknown", 0, 0.0
    for serial, first in first_packet_by_serial.items():
        c, r, pre_skip = _identify(first)
        if c in ("vorbis", "opus", "speex") and r:
            g = last_granule.get(serial, 0)
            codec, rate = c, r
            dur = max(0, g - pre_skip) / r
            break
        if c != "unknown" and codec == "unknown":
            codec = c
    return {
        "codec": codec,
        "sample_rate": rate,
        "duration_sec": dur,
        "n_pages": n_pages,
        "n_packets": n_packets,
        "serials": sorted(first_packet_by_serial),
        "eos": bool(eos_serials),
    }


def synthesize_ogg(n_audio_packets: int, *, codec: str = "opus",
                   sample_rate: int = 48000, samples_per_packet: int = 960,
                   pre_skip: int = 312, serial: int = 0x1234,
                   packet_bytes: int = 200, seed: int = 3) -> bytes:
    """Single-stream Ogg with a BOS id packet + ``n_audio_packets``
    deterministic filler packets, correct lacing/granules/CRCs."""
    if codec == "opus":
        bos = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", pre_skip)
               + struct.pack("<I", sample_rate) + b"\x00\x00\x00")
    elif codec == "vorbis":
        bos = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
               + struct.pack("<I", sample_rate) + b"\x00" * 16 + b"\x01")
        pre_skip = 0
    else:
        raise NotImplementedError(f"synthesize_ogg codec {codec!r}")

    def page(htype: int, granule: int, seq: int, packets: list[bytes]) -> bytes:
        lacing = bytearray()
        body = bytearray()
        for p in packets:
            q, r = divmod(len(p), 255)
            lacing += b"\xff" * q + bytes([r])
            body += p
        hdr = (b"OggS" + bytes([0, htype])
               + struct.pack("<qII", granule, serial, seq)
               + b"\x00\x00\x00\x00" + bytes([len(lacing)]))
        raw = bytearray(hdr + lacing + body)
        crc = _ogg_crc(bytes(raw))
        raw[22:26] = struct.pack("<I", crc)
        return bytes(raw)

    out = page(0x02, 0, 0, [bos])  # BOS, granule 0
    pkts = [bytes((seed + k + j) % 256 for j in range(packet_bytes))
            for k in range(n_audio_packets)]
    # spread packets over pages of ≤ 4, granule = cumulative samples
    seq = 1
    done = 0
    for at in range(0, len(pkts), 4):
        chunk = pkts[at : at + 4]
        done += len(chunk)
        granule = pre_skip + done * samples_per_packet if codec == "opus" \
            else done * samples_per_packet
        htype = 0x04 if at + 4 >= len(pkts) else 0
        out += page(htype, granule, seq, chunk)
        seq += 1
    return out
