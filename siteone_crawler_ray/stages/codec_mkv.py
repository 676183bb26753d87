"""Matroska / WebM container probe — EBML walk, opaque block payloads.

Container-real / payload-opaque, completing the MP4/AVI/MP3/Ogg walk
family: EBML varint parsing (IDs keep the marker bit, sizes strip it,
unknown-size elements honored for Segment/Cluster), the EBML header
DocType, Segment → Info (TimecodeScale, float Duration), Tracks
(type, CodecID, video PixelWidth/Height, audio SamplingFrequency/
Channels), and Cluster → Timecode + SimpleBlock walk (block-internal
track varint + relative timecode, lacing-count accounting).  VP8/VP9/
AV1/Opus block payloads stay opaque; ``NotImplementedError`` is
reserved for non-EBML payloads.

``synthesize_mkv`` emits a minimal valid WebM (one video track,
optional audio track, N clusters of deterministic filler blocks) so
every walk path has known ground truth without a real encoder.
"""

from __future__ import annotations

import struct

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_CLUSTER = 0x1F43B675
_DOCTYPE = 0x4282
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_SAMPLING = 0xB5
_CHANNELS = 0x9F
_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def _read_vint(buf: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int, bool]:
    """(value, new_pos, is_unknown_size).  EBML varint: the leading
    1-bit's octet position is the length."""
    if pos >= len(buf):
        raise NotImplementedError("truncated EBML varint")
    first = buf[pos]
    if first == 0:
        raise NotImplementedError("invalid EBML varint (>8 octets)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise NotImplementedError("truncated EBML varint body")
    raw = int.from_bytes(buf[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length, False
    mask = (1 << (7 * length)) - 1
    val = raw & mask
    return val, pos + length, val == mask  # all-ones = unknown size


def _uint(body: bytes) -> int:
    return int.from_bytes(body, "big") if body else 0


def _float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    raise NotImplementedError(f"EBML float of {len(body)} bytes")


def probe_mkv(payload: bytes) -> dict:
    """Matroska/WebM bytes → {doctype, duration_sec, timecode_scale_ns,
    tracks, n_clusters, n_blocks, last_block_sec};
    NotImplementedError for non-EBML payloads."""
    if payload[:4] != bytes.fromhex("1A45DFA3"):
        raise NotImplementedError("not an EBML payload")

    doctype = "matroska"
    tc_scale = 1_000_000  # ns per timecode tick (spec default)
    duration_ticks: float | None = None
    tracks: list[dict] = []
    n_clusters = 0
    n_blocks = 0
    last_block_ticks = 0
    frames: list[bytes] = []
    frame_ticks: list[int] = []
    has_lacing = False

    def walk(pos: int, end: int, ctx: tuple[int, ...]) -> None:
        nonlocal doctype, tc_scale, duration_ticks, n_clusters
        nonlocal n_blocks, last_block_ticks, has_lacing
        cluster_tc = 0
        track: dict | None = None
        while pos < end:
            eid, pos, _ = _read_vint(payload, pos, keep_marker=True)
            size, pos, unknown = _read_vint(payload, pos, keep_marker=False)
            body_end = end if unknown else min(pos + size, end)
            if body_end > len(payload):
                body_end = len(payload)
            body = payload[pos:body_end]
            if eid in (_EBML, _SEGMENT, _INFO, _TRACKS, _CLUSTER,
                       _VIDEO, _AUDIO, _BLOCK_GROUP):
                if eid == _CLUSTER:
                    n_clusters += 1
                walk(pos, body_end, ctx + (eid,))
            elif eid == _TRACK_ENTRY and ctx and ctx[-1] == _TRACKS:
                track = {"type": "?", "codec": ""}
                tracks.append(track)
                walk(pos, body_end, ctx + (_TRACK_ENTRY,))
            elif eid == _DOCTYPE:
                doctype = body.decode("ascii", "replace").rstrip("\x00")
            elif eid == _TIMECODE_SCALE:
                tc_scale = _uint(body)
            elif eid == _DURATION:
                duration_ticks = _float(body)
            elif eid == _TRACK_TYPE and tracks:
                tracks[-1]["type"] = {1: "video", 2: "audio"}.get(
                    _uint(body), str(_uint(body)))
            elif eid == _CODEC_ID and tracks:
                tracks[-1]["codec"] = body.decode("ascii", "replace")
            elif eid == _PIXEL_W and tracks:
                tracks[-1]["width"] = _uint(body)
            elif eid == _PIXEL_H and tracks:
                tracks[-1]["height"] = _uint(body)
            elif eid == _SAMPLING and tracks:
                tracks[-1]["sample_rate"] = _float(body)
            elif eid == _CHANNELS and tracks:
                tracks[-1]["channels"] = _uint(body)
            elif eid == _TIMECODE and ctx and ctx[-1] == _CLUSTER:
                cluster_tc = _uint(body)
            elif eid in (_SIMPLE_BLOCK, _BLOCK) and ctx and \
                    ctx[-1] in (_CLUSTER, _BLOCK_GROUP):
                # block layout: track vint, s16 relative tc, flags
                _tn, bpos, _ = _read_vint(payload, pos, keep_marker=False)
                if bpos + 3 <= body_end:
                    (rel,) = struct.unpack(
                        ">h", payload[bpos : bpos + 2])
                    flags = payload[bpos + 2]
                    lacing = (flags >> 1) & 3
                    nfr = 1
                    if lacing and bpos + 4 <= body_end:
                        nfr = payload[bpos + 3] + 1
                        has_lacing = True
                    else:
                        frames.append(payload[bpos + 3 : body_end])
                        frame_ticks.append(cluster_tc + rel)
                    n_blocks += nfr
                    last_block_ticks = max(
                        last_block_ticks, cluster_tc + rel)
            pos = body_end
            if unknown:
                break  # unknown-size element consumed the rest

    walk(0, len(payload), ())
    dur_ticks = duration_ticks if duration_ticks is not None \
        else float(last_block_ticks)
    return {
        "doctype": doctype,
        "timecode_scale_ns": tc_scale,
        "duration_sec": dur_ticks * tc_scale / 1e9,
        "tracks": tracks,
        "n_clusters": n_clusters,
        "n_blocks": n_blocks,
        "last_block_sec": last_block_ticks * tc_scale / 1e9,
        # frame extraction (decode_video contract): only un-laced
        # SimpleBlocks carry one whole frame each; decode_mkv gates
        # on has_lacing before handing these out
        "frames": frames,
        "timestamps": [t * tc_scale / 1e9 for t in frame_ticks],
        "n_frames": len(frames),
        "has_lacing": has_lacing,
    }


def decode_mkv(payload: bytes) -> dict:
    """``decode_video``-contract view of a WebM/Matroska file: frames +
    timestamps + duration from un-laced SimpleBlocks.  Laced blocks
    pack several frames behind Xiph/EBML size lists this probe does
    not unpack — an honest gate, matching the opaque-payload policy."""
    info = probe_mkv(payload)
    if info["has_lacing"]:
        raise NotImplementedError(
            "laced Matroska blocks not supported for frame extraction")
    if not info["frames"]:
        raise NotImplementedError("Matroska file holds no frame blocks")
    return info


# ---------------------------------------------------------------------------
# ground-truth generator
# ---------------------------------------------------------------------------


def _vint_size(val: int, length: int) -> bytes:
    return ((1 << (7 * length)) | val).to_bytes(length, "big")


def _elem(eid: int, body: bytes) -> bytes:
    eb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eb + _vint_size(len(body), 4) + body


def synthesize_mkv(n_clusters: int, blocks_per_cluster: int = 4, *,
                   doctype: str = "webm", codec: str = "V_VP8",
                   width: int = 64, height: int = 48,
                   cluster_ms: int = 500, with_audio: bool = False,
                   duration_element: bool = True, block_bytes: int = 120,
                   unknown_segment_size: bool = False,
                   frames: list[bytes] | None = None,
                   seed: int = 5) -> bytes:
    """Minimal valid WebM/Matroska with deterministic filler blocks.
    Total duration (ms) = n_clusters · cluster_ms."""
    header = _elem(_EBML,
                   _elem(0x4286, b"\x01")          # EBMLVersion
                   + _elem(0x42F7, b"\x01")        # EBMLReadVersion
                   + _elem(_DOCTYPE, doctype.encode()))
    total_ms = n_clusters * cluster_ms
    info_body = _elem(_TIMECODE_SCALE, (1_000_000).to_bytes(3, "big"))
    if duration_element:
        info_body += _elem(_DURATION, struct.pack(">d", float(total_ms)))
    info = _elem(_INFO, info_body)
    video_entry = _elem(_TRACK_ENTRY,
                        _elem(0xD7, b"\x01")       # TrackNumber
                        + _elem(_TRACK_TYPE, b"\x01")
                        + _elem(_CODEC_ID, codec.encode())
                        + _elem(_VIDEO, _elem(_PIXEL_W, width.to_bytes(2, "big"))
                                + _elem(_PIXEL_H, height.to_bytes(2, "big"))))
    tracks_body = video_entry
    if with_audio:
        tracks_body += _elem(
            _TRACK_ENTRY,
            _elem(0xD7, b"\x02") + _elem(_TRACK_TYPE, b"\x02")
            + _elem(_CODEC_ID, b"A_OPUS")
            + _elem(_AUDIO, _elem(_SAMPLING, struct.pack(">f", 48000.0))
                    + _elem(_CHANNELS, b"\x02")))
    tracks = _elem(_TRACKS, tracks_body)
    clusters = b""
    step = cluster_ms // max(1, blocks_per_cluster)
    for c in range(n_clusters):
        body = _elem(_TIMECODE, (c * cluster_ms).to_bytes(3, "big"))
        for b in range(blocks_per_cluster):
            if frames is not None:
                frame = frames[c * blocks_per_cluster + b]
            else:
                frame = bytes((seed + c + b + j) % 256
                              for j in range(block_bytes))
            blk = (_vint_size(1, 1)                  # track 1
                   + struct.pack(">h", b * step)     # relative timecode
                   + b"\x80" + frame)                # keyframe, no lacing
            body += _elem(_SIMPLE_BLOCK, blk)
        clusters += _elem(_CLUSTER, body)
    seg_body = info + tracks + clusters
    if unknown_segment_size:
        seg = _SEGMENT.to_bytes(4, "big") + b"\xff" + seg_body
    else:
        seg = _elem(_SEGMENT, seg_body)
    return header + seg
