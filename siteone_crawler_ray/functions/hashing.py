"""Hash kernels: vectorized xxhash64 for partition/dedup keys, MD5 uq_ids.

The north rule mandates xxhash64 URL keys.  No ``xxhash`` wheel ships in
this environment, so this module implements XXH64 (public algorithm,
github.com/Cyan4973/xxHash spec) twice:

- ``xxh64`` — scalar pure-Python reference (used in tests / the oracle),
- ``xxh64_strings`` — numpy-vectorized over a whole Arrow string column
  (the hot path inside ``map_batches``: one gather into a padded byte
  matrix, then O(maxlen/32) masked stripe rounds — no per-row Python).

``uq_id`` parity: the reference derives its display key as the first 8 hex
chars of MD5(full_url) (/root/reference/src/engine/crawler.rs:1642-1649).
We keep that for output parity (``uq_ids``) and use xxhash64 for all
partition / dedup keys (``url_key``).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

U = np.uint64
_UP1, _UP2, _UP3, _UP4, _UP5 = U(_P1), U(_P2), U(_P3), U(_P4), U(_P5)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """Scalar XXH64. Reference implementation for tests and the oracle."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while p + 32 <= n:
            for _ in range(1):
                lanes = [int.from_bytes(data[p + 8 * i : p + 8 * i + 8], "little") for i in range(4)]
            v1 = (_rotl((v1 + lanes[0] * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + lanes[1] * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + lanes[2] * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + lanes[3] * _P2) & _MASK, 31) * _P1) & _MASK
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while p + 8 <= n:
        k1 = int.from_bytes(data[p : p + 8], "little")
        k1 = (_rotl((k1 * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _MASK
        p += 8
    if p + 4 <= n:
        k1 = int.from_bytes(data[p : p + 4], "little")
        h = (_rotl(h ^ (k1 * _P1) & _MASK, 23) * _P2 + _P3) & _MASK
        p += 4
    while p < n:
        h = (_rotl(h ^ (data[p] * _P5) & _MASK, 11) * _P1) & _MASK
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _byte_matrix(strings) -> tuple[np.ndarray, np.ndarray]:
    """Gather a string/binary column into a zero-padded (n, W) uint8 matrix.

    Accepts a pyarrow (Chunked)Array, numpy array, pandas Series or list of
    str/bytes.  Returns (matrix, lens).  W is a multiple of 8 and >= 32 so
    uint64 lane views and the 32-byte tail gather never go out of bounds.
    """
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        t = strings.type
        if pa.types.is_string(t) or pa.types.is_binary(t):
            odt = np.int32
        elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            odt = np.int64
        else:
            strings = strings.cast(pa.string())
            odt = np.int32
        bufs = strings.buffers()
        offs = np.frombuffer(bufs[1], dtype=odt)[strings.offset : strings.offset + len(strings) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        starts = offs[:-1].astype(np.int64)
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
    else:
        items = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
        lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=len(items))
        data = np.frombuffer(b"".join(items), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(items) else np.empty(0, np.int64)

    n = len(lens)
    maxlen = int(lens.max()) if n else 0
    W = max(32, -(-maxlen // 8) * 8)
    mat = np.zeros((n, W), dtype=np.uint8)
    if n and maxlen:
        # ragged copy: one fancy-index pass over the concatenated byte
        # stream (offsets of a string column are cumulative, so rows are
        # contiguous in `data` starting at starts[0])
        total = int(lens.sum())
        chunk = data[starts[0] : starts[0] + total]
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(starts - starts[0], lens)
        mat.reshape(-1)[rows * W + within] = chunk
    return mat, lens


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << U(r)) | (x >> U(64 - r))


def xxh64_strings(strings, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over a column of strings → uint64 ndarray.

    Bit-exact with :func:`xxh64` (property-tested).  Cost is a handful of
    masked numpy passes over a padded byte matrix — no Python per row.
    """
    mat, lens = _byte_matrix(strings)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        ulens = lens.astype(np.uint64)
        u64 = mat.view("<u8")
        nstripes = lens // 32
        long_mask = lens >= 32

        h = np.full(n, U((seed + _P5) & _MASK), dtype=np.uint64)
        if long_mask.any():
            v1 = np.full(n, U((seed + _P1 + _P2) & _MASK))
            v2 = np.full(n, U((seed + _P2) & _MASK))
            v3 = np.full(n, U(seed & _MASK))
            v4 = np.full(n, U((seed - _P1) & _MASK))
            for i in range(int(nstripes.max())):
                m = nstripes > i
                b = 4 * i
                for vi, v in enumerate((v1, v2, v3, v4)):
                    nv = _vrotl(v + u64[:, b + vi] * _UP2, 31) * _UP1
                    v[m] = nv[m]
            hm = _vrotl(v1, 1) + _vrotl(v2, 7) + _vrotl(v3, 12) + _vrotl(v4, 18)
            for v in (v1, v2, v3, v4):
                hm = (hm ^ (_vrotl(v * _UP2, 31) * _UP1)) * _UP1 + _UP4
            h[long_mask] = hm[long_mask]
        h = h + ulens

        # gather the ≤31-byte tail of every row into a fixed (n, 32) matrix
        tail_start = nstripes * 32
        rem = lens - tail_start
        tar = np.arange(32)
        tvalid = tar[None, :] < rem[:, None]
        tail = np.zeros((n, 32), dtype=np.uint8)
        flat = mat.reshape(-1)
        flat_idx = np.arange(n)[:, None] * mat.shape[1] + tail_start[:, None] + tar[None, :]
        tail[tvalid] = flat[flat_idx[tvalid]]
        t64 = tail.view("<u8")
        t32 = tail.view("<u4")

        n8 = rem >> 3
        for j in range(3):
            m = n8 > j
            if not m.any():
                break
            k1 = _vrotl(t64[:, j] * _UP2, 31) * _UP1
            nh = _vrotl(h ^ k1, 27) * _UP1 + _UP4
            h[m] = nh[m]
        has4 = (rem & 4).astype(bool)
        if has4.any():
            lane32 = t32[np.arange(n), n8 * 2].astype(np.uint64)
            nh = _vrotl(h ^ (lane32 * _UP1), 23) * _UP2 + _UP3
            h[has4] = nh[has4]
        bytepos = (n8 << 3) + np.where(has4, 4, 0)
        nbytes = rem & 3
        for j in range(3):
            m = nbytes > j
            if not m.any():
                break
            b = tail[np.arange(n), bytepos + j].astype(np.uint64)
            nh = _vrotl(h ^ (b * _UP5), 11) * _UP1
            h[m] = nh[m]

        h ^= h >> U(33)
        h *= _UP2
        h ^= h >> U(29)
        h *= _UP3
        h ^= h >> U(32)
    return h


def uq_id(url: str) -> str:
    """8-hex-char MD5 prefix, matching the reference's display key
    (/root/reference/src/engine/crawler.rs:1642-1649)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()[:8]


def uq_ids(urls) -> np.ndarray:
    """MD5[:8] per URL. Only computed on visited rows (output parity),
    never used as a partition key — xxh64_strings is the hot key path."""
    return np.array([hashlib.md5(u.encode("utf-8")).hexdigest()[:8] for u in urls], dtype=object)
