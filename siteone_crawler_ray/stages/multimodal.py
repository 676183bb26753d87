"""Multimodal column plumbing — binary payload stages.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

Codec support is honest about the environment: ``decoder="real"``
decodes the UNCOMPRESSED containers this module implements in pure
numpy — RIFF/WAVE 16-bit PCM (``decode_wav``) and Windows BMP 24-bit
(``decode_bmp``), both public formats — and raises
``NotImplementedError`` for codec formats (JPEG/WebP/MP3/MP4); PNG
(8-bit gray/RGB/RGBA, all five row filters) and BMP/WAV have real
pure-Python codecs here,
whose codec libraries (PIL/ffmpeg) are NOT in this container.
``decoder="fake"`` (the default for arbitrary payloads) derives
deterministic metadata from the payload hash so the Ray-side plumbing
— schema, batch sizing for wide binary rows, actor signature,
zero-copy binary column handling, output layout — is exercised on any
input.

At scale: binary columns dominate block size → pair these stages with
small ``batch_size`` and a larger ``DataContext.target_max_block_size``
so blocks are not split absurdly small (ray_guide pitfalls).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.hashing import xxh64_strings

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary payloads from a seeded RNG)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes() for _ in range(n)]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    return pa.table(
        {
            "media_id": pa.array([f"m{i:05d}" for i in range(n)], pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mimes[k] for k in kinds], pa.string()),
        }
    )


# ---- real uncompressed-container codecs (pure numpy, public formats) -----

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE 16-bit PCM bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE 16-bit PCM → (sample_rate, channels, int16 samples).

    Walks the chunk list (fmt / data can be preceded by LIST etc.);
    raises ``NotImplementedError`` for non-PCM or non-16-bit."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1:
                raise NotImplementedError("compressed WAV (non-PCM) is not supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise NotImplementedError("malformed WAV: missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM not supported (16-bit only)")
    return rate, channels, np.frombuffer(data, dtype="<i2")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR order, rows padded to 4 bytes — the classic layout)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # flip rows, RGB→BGR
    data = body.tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    _, w, h, _, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP supported (got {bpp}-bit comp={comp})")
    row = ((w * 3 + 3) // 4) * 4
    flip = h > 0
    h = abs(h)
    body = np.frombuffer(payload, dtype=np.uint8, count=h * row, offset=offset).reshape(h, row)
    px = body[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return px[::-1] if flip else px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → channels (8-bit depth, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W) uint8 gray / (H, W, 3) RGB / (H, W, 4) RGBA → PNG bytes
    (8-bit, filter 0 per row, one zlib IDAT) — pure stdlib zlib, no PIL."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 9))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8.  Supports the common web shape — 8-bit
    depth, gray/RGB/RGBA, non-interlaced, all five row filters
    (None/Sub/Up/Average/Paeth per the PNG spec §6) — and raises
    ``NotImplementedError`` for palettes/16-bit/interlaced variants, in
    line with the honest-codec policy of this module."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("malformed PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth} color={color} interlace={interlace})")
    c = _PNG_CHANNELS[color]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("malformed PNG: bad decompressed length")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = c  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + ((a + b) >> 1)
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa_, pb, pcd = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pcd) else (b if pb <= pcd else cc)
                    v = cur[x] + pred
                line[x] = v & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {f} is invalid")
        out[y] = line.astype(np.uint8)
    return out.reshape(h, w, c)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: BMP or PNG → (H, W, C) uint8;
    NotImplementedError for everything else (JPEG/WebP/… need codecs
    absent from this container)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError("unsupported image container (BMP/PNG only)")


def synthesize_real_media_table(n: int = 240) -> pa.Table:
    """Deterministic media corpus with REAL container payloads where an
    uncompressed format exists: BMP images (``i % 3 == 0``), WAV PCM
    audio (``i % 3 == 1``); video rows (``i % 3 == 2``) stay synthetic
    (no codec-free video container).  Content is analytic in ``i`` so
    decode output has a closed-form arithmetic oracle:

    - image ``i``: width ``16+(i%8)*4``, height ``12+(i%5)*4``, every
      pixel channel ``(i*7)%256`` → mean pixel is exactly that value.
    - audio ``i``: 8 kHz, ``400+(i%7)*100`` samples, alternating
      ±(1000+10·i) square wave → RMS energy is exactly ``1000+10·i``,
      duration ``n_samples/8000``.
    - video ``i``: ``256·(3+(i%5))`` bytes → ``3+(i%5)`` fake frames.
    """
    kinds, payloads, mimes = [], [], []
    for i in range(n):
        m = i % 3
        if m == 0:
            w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
            px = np.full((h, w, 3), (i * 7) % 256, dtype=np.uint8)
            kinds.append("image")
            payloads.append(encode_bmp(px))
            mimes.append("image/bmp")
        elif m == 1:
            ns, amp = 400 + (i % 7) * 100, 1000 + 10 * i
            samples = np.full(ns, amp, dtype=np.int16)
            samples[1::2] *= -1
            kinds.append("audio")
            payloads.append(encode_wav(samples, 8000))
            mimes.append("audio/wav")
        else:
            kinds.append("video")
            payloads.append(bytes((i + j) % 256 for j in range(256 * (3 + (i % 5)))))
            mimes.append("video/mp4")
    return pa.table({
        "media_id": pa.array([f"m{i:05d}" for i in range(n)], pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
    })


class ImageDecodeStage:
    """Actor stage: binary payload → (width, height, n_bytes) + feature
    vector.  ``decoder='real'`` decodes BMP and 8-bit PNG via
    :func:`decode_image` (features: overall + per-channel pixel means,
    /255) and raises NotImplementedError for other formats (PIL
    absent); ``'fake'`` derives dimensions deterministically from the
    payload hash so downstream layout code is exercisable on any
    input."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 8):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        if self.decoder == "real":
            w = np.empty(len(payloads), np.int32)
            ht = np.empty(len(payloads), np.int32)
            sizes = np.empty(len(payloads), np.int64)
            feats = np.zeros((len(payloads), self.feature_dim))
            for i, p in enumerate(payloads):
                px = decode_image(p)  # BMP/PNG; NotImplementedError otherwise
                ht[i], w[i] = px.shape[0], px.shape[1]
                sizes[i] = len(p)
                means = px.reshape(-1, px.shape[2]).mean(axis=0)
                vals = [px.mean(), *means][: self.feature_dim]
                feats[i, : len(vals)] = np.round(np.array(vals) / 255.0, 6)
            return pa.table({
                "media_id": batch["media_id"],
                "width": pa.array(w),
                "height": pa.array(ht),
                "n_bytes": pa.array(sizes),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            })
        h = xxh64_strings([p for p in payloads])
        w = (h % np.uint64(1920)).astype(np.int32) + 16
        ht = ((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int32) + 16
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
        feats = np.empty((len(payloads), self.feature_dim))
        for j in range(self.feature_dim):
            feats[:, j] = ((h >> np.uint64(8 * (j % 8))) & np.uint64(0xFF)).astype(np.float64) / 255.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(w),
                "height": pa.array(ht),
                "n_bytes": pa.array(sizes),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


class AudioFrameSampleStage:
    """Actor stage: sample_rate/duration metadata + frame-level RMS
    energy from a binary payload.  ``decoder='real'`` parses RIFF/WAVE
    16-bit PCM via :func:`decode_wav` (energy over raw int16 values);
    compressed audio raises.  ``'fake'`` treats the payload as 8-bit
    samples for plumbing tests."""

    def __init__(self, decoder: str = "fake", frames: int = 4):
        self.decoder = decoder
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        energies = []
        durs = np.empty(len(payloads))
        for i, p in enumerate(payloads):
            if self.decoder == "real":
                rate, channels, samples = decode_wav(p)
                a = samples.astype(np.float64)
                durs[i] = len(samples) / channels / rate
            else:
                a = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                durs[i] = len(a) / 8000.0
            chunks = np.array_split(a, self.frames) if len(a) else [np.zeros(1)] * self.frames
            energies.append([round(float(np.sqrt((c**2).mean())), 6) for c in chunks])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_sec": pa.array(np.round(durs, 6)),
                "frame_energy": pa.array(energies, pa.list_(pa.float64())),
            }
        )


class ImageResizeStage:
    """Actor stage: (payload, target size) → resized payload + output
    dims.  ``decoder='real'`` area-average-resizes a decoded BMP to the
    target and emits raw RGB bytes (compressed formats raise); fake
    truncates/pads the payload to the target pixel budget so the
    wide-binary output layout is exercised."""

    def __init__(self, decoder: str = "fake", target: tuple[int, int] = (224, 224)):
        self.decoder = decoder
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        if self.decoder == "real":
            payloads = batch["payload"].to_numpy(zero_copy_only=False)
            out = []
            for p in payloads:
                px = decode_bmp(p).astype(np.float64)
                h, w = px.shape[0], px.shape[1]
                # area-average pooling over floor-boundary cells
                ys = (np.arange(th + 1) * h) // th
                xs = (np.arange(tw + 1) * w) // tw
                col = np.add.reduceat(px, xs[:-1], axis=1) / np.maximum(np.diff(xs), 1)[None, :, None]
                cell = np.add.reduceat(col, ys[:-1], axis=0) / np.maximum(np.diff(ys), 1)[:, None, None]
                out.append(np.clip(np.rint(cell), 0, 255).astype(np.uint8).tobytes())
            return pa.table({
                "media_id": batch["media_id"],
                "width": pa.array(np.full(len(out), tw, np.int32)),
                "height": pa.array(np.full(len(out), th, np.int32)),
                "payload": pa.array(out, pa.binary()),
            })
        budget = tw * th // 256
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        out = [p[:budget].ljust(budget, b"\0") for p in payloads]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(np.full(len(out), tw, np.int32)),
                "height": pa.array(np.full(len(out), th, np.int32)),
                "payload": pa.array(out, pa.binary()),
            }
        )


class VideoFrameSampleStage:
    """Actor stage: sample N evenly-spaced frames → per-frame byte
    slices + timestamps (fake decode; real raises)."""

    def __init__(self, decoder: str = "fake", frames: int = 3, fps: float = 25.0):
        self.decoder = decoder
        self.frames = frames
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("video codec libraries are not available in this environment")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        ids, fidx, ts, frames = [], [], [], []
        mids = batch["media_id"].to_pylist()
        for mid, p in zip(mids, payloads):
            n_frames_total = max(1, len(p) // 256)  # fake: 256 B per frame
            step = max(1, n_frames_total // self.frames)
            for k, f in enumerate(range(0, n_frames_total, step)[: self.frames]):
                ids.append(mid)
                fidx.append(k)
                ts.append(round(f / self.fps, 6))
                frames.append(p[f * 256 : (f + 1) * 256])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_index": pa.array(fidx, pa.int32()),
                "timestamp_sec": pa.array(ts, pa.float64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_pipeline(media_ds, kind: str, stage_cls, concurrency: int = 2, batch_size: int = 16,
                    **stage_kwargs):
    """Wire a decode stage the scale-correct way: filter to the modality,
    small batches (wide binary rows), actor pool.  ``stage_kwargs`` go to
    the stage constructor (once per actor), e.g. ``decoder="real"``."""
    return media_ds.filter(expr=f"kind == '{kind}'").map_batches(
        stage_cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=stage_kwargs or None,
    )
