"""Scalar reference kernels for the non-SQL signature operators.

These are deliberately an INDEPENDENT code path from the production
kernels — pure-int Python over the scalar :func:`..functions.hashing.xxh64`
(itself the reference implementation the vectorized hasher is tested
against), no numpy, no Arrow.  They exist so the `content_signatures`
correctness slot can self-check a deterministic row sample in-slot
(simhash / winnowing / language-ID are not SQL-expressible, so the
driver records rows-only for that slot — VERDICT r3 #7), and for unit
tests.  They are O(text) scalar code: never call them on the full
dataset, only on sampled rows.
"""

from __future__ import annotations

from .hashing import xxh64


def simhash_ref(text: str) -> int:
    """64-bit SimHash over whitespace tokens (mirrors
    stages/dedup.simhash_batch semantics: ±1 bit weights, >0 → 1,
    empty token list hashes as [0])."""
    toks = text.split()
    hs = [xxh64(t) for t in toks] if toks else [0]
    out = 0
    for b in range(64):
        s = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if s > 0:
            out |= 1 << b
    return out


def fingerprint_ref(text: str) -> int:
    """Full-text xxh64 (stages/textstats.fingerprints 'fingerprint')."""
    return xxh64(text)


def winnow_min_ref(text: str, window: int = 8) -> int:
    """Min of window-shingle hashes (stages/textstats.fingerprints
    'winnow_min'; n = max(1, len-window+1) so "" hashes one empty
    shingle)."""
    n = max(1, len(text) - window + 1)
    return min(xxh64(text[j : j + window]) for j in range(n))


def langid_ref(text: str) -> str:
    """Stopword-argmax language-ID (stages/textstats.langid: max over
    (hit-count, lang) tuples, 'und' when no stopword hits)."""
    from ..stages.textstats import STOPWORDS

    toks = set(text.lower().split(" "))
    best = max((len(toks & sw), lg) for lg, sw in STOPWORDS.items())
    return best[1] if best[0] > 0 else "und"
