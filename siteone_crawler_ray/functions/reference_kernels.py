"""Scalar reference kernels for the non-SQL signature operators.

These are deliberately an INDEPENDENT code path from the production
kernels — pure-int Python over scalar hashes (:func:`..functions.
hashing.xxh64` by default, :func:`..functions.hashing.md5_u64` for the
SQL-oracled backend), no numpy, no Arrow.  They exist so the
`content_signatures` correctness slot can self-check a deterministic
row sample in-slot on top of its DuckDB oracle (the slot runs the
md5_u64 backend, which SQL recomputes bit-for-bit; xxh64 stays the
scale hash), and for unit tests.  They are O(text) scalar code: never
call them on the full dataset, only on sampled rows.
"""

from __future__ import annotations

from .hashing import md5_u64, xxh64


def simhash_ref(text: str, hasher=xxh64) -> int:
    """64-bit SimHash over whitespace tokens (mirrors
    stages/dedup.simhash_batch semantics: ±1 bit weights, >0 → 1,
    empty token list hashes as [0]).  ``hasher=md5_u64`` mirrors the
    SQL-oracled backend."""
    toks = text.split()
    hs = [hasher(t) for t in toks] if toks else [0]
    out = 0
    for b in range(64):
        s = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if s > 0:
            out |= 1 << b
    return out


def fingerprint_ref(text: str, hasher=xxh64) -> int:
    """Full-text hash (stages/textstats.fingerprints 'fingerprint')."""
    return hasher(text)


def winnow_min_ref(text: str, window: int = 8, hasher=xxh64) -> int:
    """Min of window-shingle hashes (stages/textstats.fingerprints
    'winnow_min'; n = max(1, len-window+1) so "" hashes one empty
    shingle)."""
    n = max(1, len(text) - window + 1)
    return min(hasher(text[j : j + window]) for j in range(n))


def langid_ref(text: str) -> str:
    """Stopword-argmax language-ID (stages/textstats.langid: max over
    (hit-count, lang) tuples, 'und' when no stopword hits)."""
    from ..stages.textstats import STOPWORDS

    toks = set(text.lower().split(" "))
    best = max((len(toks & sw), lg) for lg, sw in STOPWORDS.items())
    return best[1] if best[0] > 0 else "und"
