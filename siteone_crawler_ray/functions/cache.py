"""Cache-header parsing — flags bitmask + lifetime extraction.

Vectorized re-expression of the reference's header analysis
(/root/reference/src/engine/crawler.rs:1743-1818: 17-flag bitmask over
Cache-Control / Expires / ETag / Last-Modified / Vary, lifetime from
``max-age=``; flag layout /root/reference/src/result/visited_url.rs:20-36).
Runs inside ``map_batches`` over the visited dataset's header columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..types import CacheFlag

_MAX_AGE_RE = re.compile(r"(?:^|[,\s])max-age=(\d+)")
_S_MAXAGE_RE = re.compile(r"s-maxage=(\d+)")

_DIRECTIVE_FLAGS = [
    ("public", CacheFlag.PUBLIC),
    ("private", CacheFlag.PRIVATE),
    ("no-cache", CacheFlag.NO_CACHE),
    ("no-store", CacheFlag.NO_STORE),
    ("must-revalidate", CacheFlag.MUST_REVALIDATE),
    ("proxy-revalidate", CacheFlag.PROXY_REVALIDATE),
    ("immutable", CacheFlag.IMMUTABLE),
    ("stale-while-revalidate", CacheFlag.STALE_WHILE_REVALIDATE),
    ("stale-if-error", CacheFlag.STALE_IF_ERROR),
    ("no-transform", CacheFlag.NO_TRANSFORM),
]


def parse_cache_control(value: str | None) -> tuple[int, int | None]:
    """→ (flags, lifetime_seconds) for one Cache-Control value."""
    if not value:
        return 0, None
    v = value.lower()
    flags = CacheFlag.HAS_CACHE_CONTROL
    for needle, bit in _DIRECTIVE_FLAGS:
        if needle in v:
            flags |= bit
    lifetime = None
    m = _MAX_AGE_RE.search(v)
    if m:
        flags |= CacheFlag.MAX_AGE
        lifetime = int(m.group(1))
    m = _S_MAXAGE_RE.search(v)
    if m:
        flags |= CacheFlag.S_MAXAGE
        if lifetime is None:
            lifetime = int(m.group(1))
    return flags, lifetime


def add_cache_columns(batch: pa.Table) -> pa.Table:
    """map_batches stage: header columns → cache_type_flags (uint32) +
    cache_lifetime (int64, null when absent)."""
    cc = batch["cache_control"].to_numpy(zero_copy_only=False)
    cc = np.array(["" if v is None else v for v in cc], dtype=object)
    etag = batch["etag"].to_numpy(zero_copy_only=False)
    n = len(cc)
    flags = np.zeros(n, dtype=np.uint32)
    life = np.full(n, -1, dtype=np.int64)
    # parse only distinct header values, scatter to rows (headers repeat
    # heavily across a site — the reference parses per response)
    uniq, inv = np.unique(cc.astype(object), return_inverse=True)
    parsed = [parse_cache_control(u) for u in uniq]
    uf = np.array([p[0] for p in parsed], dtype=np.uint32)
    ul = np.array([-1 if p[1] is None else p[1] for p in parsed], dtype=np.int64)
    flags = uf[inv]
    life = ul[inv]
    has_etag = np.array([e is not None and e != "" for e in etag])
    flags = flags | np.where(has_etag, np.uint32(CacheFlag.HAS_ETAG), np.uint32(0))
    return batch.append_column(
        "cache_type_flags", pa.array(flags, pa.uint32())
    ).append_column("cache_lifetime", pa.array(life, type=pa.int64(), mask=life < 0))
