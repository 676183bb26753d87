"""Multimodal column plumbing — binary payload stages with stubbed codecs.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages.  The actual
codec libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are deterministic fakes behind ``decoder="fake"``
(the default) and raise ``NotImplementedError`` for ``decoder="real"``
— but all of the Ray-side plumbing is real and tested: schema, batch
sizing for wide binary rows, actor signature, zero-copy binary column
handling, and output layout.

At scale: binary columns dominate block size → pair these stages with
small ``batch_size`` and a larger ``DataContext.target_max_block_size``
so blocks are not split absurdly small (ray_guide pitfalls).
"""

from __future__ import annotations

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


class ImageDecodeStage:
    """Actor stage: binary payload → (width, height, channels) + feature
    vector.  ``decoder='real'`` raises NotImplementedError (PIL absent);
    ``'fake'`` derives dimensions deterministically from the payload hash
    so downstream layout code is fully exercisable."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 8):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("image codec libraries are not available in this environment")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
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
    """Actor stage: sample_rate/duration metadata + frame-level energy
    sketch from a binary payload (fake decode; real raises)."""

    def __init__(self, decoder: str = "fake", frames: int = 4):
        self.decoder = decoder
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("audio codec libraries are not available in this environment")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        energies = []
        durs = np.empty(len(payloads))
        for i, p in enumerate(payloads):
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
    """Actor stage: (payload, target size) → resized payload stub +
    output dims.  Real resize raises (PIL absent); fake truncates/pads
    the payload to the target pixel budget so the wide-binary output
    layout is exercised."""

    def __init__(self, decoder: str = "fake", target: tuple[int, int] = (224, 224)):
        self.decoder = decoder
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("image codec libraries are not available in this environment")
        tw, th = self.target
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


def decode_pipeline(media_ds, kind: str, stage_cls, concurrency: int = 2, batch_size: int = 16):
    """Wire a decode stage the scale-correct way: filter to the modality,
    small batches (wide binary rows), actor pool."""
    return media_ds.filter(expr=f"kind == '{kind}'").map_batches(
        stage_cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
