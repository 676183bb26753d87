"""Pure-Python AVI 1.0 (RIFF) video container codec (public spec).

Sibling of ``codec_mp4``: the container walk is real — RIFF chunk
traversal, ``avih``/``strh``/``strf`` headers, ``movi`` frame chunks
with word alignment, ``idx1`` cross-checked when present — while frame
PAYLOADS stay opaque binary (codec libraries are absent here; same
policy as the MP4 stbl walk).  ``decode_avi`` returns the dict contract
``VideoFrameSampleStage`` consumes: frames, timestamps, duration_sec,
width/height, codec fourcc.

Scope: one 'vids' stream, '00dc'/'00db' frame chunks.  Interleaved
audio streams are skipped; OpenDML (AVIX) extensions and zero-'vids'
files raise ``NotImplementedError`` — honest gates, like the siblings.
"""

from __future__ import annotations

import struct


def encode_avi(frames: list[bytes], *, fps: int = 10, width: int = 16,
               height: int = 16, codec: bytes = b"mjpg",
               write_index: bool = True) -> bytes:
    """Opaque frame payloads → single-'vids'-stream AVI bytes."""
    if not frames:
        raise NotImplementedError("cannot encode an empty AVI")
    if fps <= 0:
        raise NotImplementedError("non-positive AVI fps")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(f) for f in frames), width, height) + b"\x00" * 16
    strh = (b"vids" + codec
            + struct.pack("<IHHIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), max(len(f) for f in frames),
                          0xFFFFFFFF)
            + struct.pack("<I", 0) + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, codec,
                       0, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    index_entries = []
    for f in frames:
        index_entries.append((len(movi_body) + 4, len(f)))  # offset of ckid
        movi_body += chunk(b"00dc", f)
    movi = list_chunk(b"movi", movi_body)

    idx1 = b""
    if write_index:
        idx1 = chunk(b"idx1", b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)
            for off, ln in index_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> dict:
    """AVI bytes → {frames, timestamps, duration_sec, n_frames, width,
    height, codec}; NotImplementedError outside the documented subset."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise NotImplementedError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise NotImplementedError(f"not an AVI RIFF form ({payload[8:12]!r})")

    scale = rate = n_declared = None
    width = height = 0
    codec = b"\x00" * 4
    frames: list[bytes] = []
    idx_count = None
    stream_no = 0
    vids_stream = None

    def walk(pos: int, end: int) -> None:
        nonlocal scale, rate, n_declared, width, height, codec
        nonlocal idx_count, stream_no, vids_stream
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_at, body_end = pos + 8, pos + 8 + size
            if body_end > len(payload):
                raise NotImplementedError("truncated AVI chunk")
            if cid == b"LIST":
                kind = payload[body_at : body_at + 4]
                if kind == b"AVIX":
                    raise NotImplementedError("OpenDML AVIX not supported")
                if kind == b"strl":
                    stream_no += 1
                walk(body_at + 4, body_end)
            elif cid == b"avih":
                width, height = struct.unpack(
                    "<II", payload[body_at + 32 : body_at + 40])
            elif cid == b"strh":
                fcc = payload[body_at : body_at + 4]
                if fcc == b"vids" and vids_stream is None:
                    vids_stream = stream_no - 1
                    codec = payload[body_at + 4 : body_at + 8]
                    scale, rate, _start, n_declared = struct.unpack(
                        "<IIII", payload[body_at + 20 : body_at + 36])
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                if vids_stream is not None and \
                        int(cid[:2]) == vids_stream:
                    frames.append(payload[body_at:body_end])
            elif cid == b"idx1":
                idx_count = sum(
                    1 for k in range(size // 16)
                    if payload[body_at + 16 * k + 2 : body_at + 16 * k + 4]
                    in (b"dc", b"db"))
            pos = body_end + (size & 1)  # chunks are word-aligned

    walk(12, 8 + struct.unpack("<I", payload[4:8])[0])

    if vids_stream is None or scale is None or not rate:
        raise NotImplementedError("AVI has no 'vids' stream header")
    if not frames:
        raise NotImplementedError("AVI 'movi' list holds no video frames")
    if n_declared and n_declared != len(frames):
        raise NotImplementedError(
            f"AVI frame count mismatch (strh {n_declared} vs movi {len(frames)})")
    if idx_count is not None and idx_count != len(frames):
        raise NotImplementedError(
            f"AVI idx1 disagrees with movi ({idx_count} vs {len(frames)})")
    spf = scale / rate  # seconds per frame
    return {
        "frames": frames,
        "timestamps": [f * spf for f in range(len(frames))],
        "duration_sec": len(frames) * spf,
        "n_frames": len(frames),
        "width": width,
        "height": height,
        "codec": codec.decode("ascii", "replace"),
    }
