"""Text-analysis operators: language-ID, quality scoring, token counts,
document fingerprints.

All are vectorized ``map_batches`` kernels over the ``documents`` table
(doc_id, text, …).  Definitions are chosen to be SQL-expressible where
the correctness gate needs a DuckDB oracle (token counts, ratios) and
documented here where they are not (fingerprint, langid).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import xxh64_strings

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "pour", "que", "dans"},
}

_WORD_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count: n_tokens = count(' ')+1 (SQL-matchable:
    len(string_split(text, ' ')))."""
    n = pc.add(pc.count_substring(batch[text_col], " "), 1)
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": n.cast(pa.int64())})


def bpe_ish_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish regex token count (words + punctuation as separate tokens)
    — the tokenizer-approximation counter; compiled regex, per-row findall."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    counts = np.fromiter((len(_WORD_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts))
    return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(counts)})


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics (length / punctuation / stopword ratios),
    all Arrow/numpy kernels.  round(·,6) so a DuckDB oracle can match
    bit-for-bit on the hashed values."""
    from ..functions.numeric import round_away

    t = batch[text_col]
    # utf8_length = characters, matching DuckDB length()
    nchars = pc.utf8_length(t).cast(pa.float64())
    ntok = pc.add(pc.count_substring(t, " "), 1).cast(pa.float64())
    npunct = pc.add(
        pc.add(pc.count_substring(t, "."), pc.count_substring(t, ",")),
        pc.add(pc.count_substring(t, "!"), pc.count_substring(t, "?")),
    ).cast(pa.float64())
    avg_tok_len = pa.array(round_away(pc.divide(nchars, ntok).to_numpy(), 6))
    punct_ratio = pa.array(
        round_away(pc.divide(npunct, pc.max_element_wise(nchars, 1.0)).to_numpy(), 6)
    )
    texts = t.to_numpy(zero_copy_only=False)
    stop_all = set().union(*STOPWORDS.values())
    stop_ratio = np.empty(len(texts))
    for i, s in enumerate(texts):
        toks = s.split(" ")
        stop_ratio[i] = sum(1 for w in toks if w in stop_all) / max(1, len(toks))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars_m": nchars.cast(pa.int64()),
            "n_tokens": ntok.cast(pa.int64()),
            "avg_tok_len": avg_tok_len,
            "punct_ratio": punct_ratio,
            "stop_ratio": pa.array(np.round(stop_ratio, 6)),
        }
    )


def repetition_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition: the duplicate-trigram
    fraction ``1 - distinct/total`` over whitespace-token trigrams
    (Rae et al. 2021 §A1.1 repetition filters — public heuristic).
    EXACT distinct counting (compact token ids + integer re-coding, no
    hash collisions, no padded unicode sorts), so a DuckDB
    ``count(DISTINCT trigram)`` oracle matches bit-for-bit."""
    from ..functions.numeric import round_away

    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n_tri = np.zeros(len(texts), dtype=np.int64)
    dup = np.zeros(len(texts), dtype=np.float64)
    for i, s in enumerate(texts):
        toks = np.array(s.split(" "), dtype=object)
        m = len(toks) - 2
        if m <= 0:
            continue
        # tokens → compact int codes; trigram key via two re-codings so
        # every intermediate fits int64 (pair ids ≤ n², n ≤ doc tokens)
        _, codes = np.unique(toks, return_inverse=True)
        codes = codes.astype(np.int64)
        n = len(codes)
        pair = codes[:-1] * n + codes[1:]
        _, pcodes = np.unique(pair, return_inverse=True)
        tri = pcodes[:-1].astype(np.int64) * n + codes[2:]
        n_tri[i] = m
        dup[i] = 1.0 - len(np.unique(tri)) / m
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tri": pa.array(n_tri),
            "dup_tri_ratio": pa.array(round_away(dup, 6)),
        }
    )


def langid(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n-gram/stopword language-ID heuristic: argmax of per-language
    stopword hit counts (deterministic; 'und' = undetermined)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    langs = sorted(STOPWORDS)
    out = np.empty(len(texts), dtype=object)
    for i, s in enumerate(texts):
        toks = set(s.lower().split(" "))
        scores = [(len(toks & STOPWORDS[lg]), lg) for lg in langs]
        best = max(scores)
        out[i] = best[1] if best[0] > 0 else "und"
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(out, pa.string())})


def fingerprints(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Document fingerprint: xxh64 of the full text plus a winnowed
    rolling-hash sketch (min of window-shingle hashes — robust to small
    edits).  Not SQL-expressible (rows-only correctness check)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    full = xxh64_strings(batch[text_col])
    mins = np.empty(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        n = max(1, len(s) - window + 1)
        sh = xxh64_strings([s[j : j + window] for j in range(0, n, 1)])
        mins[i] = sh.min() if len(sh) else 0
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(full, pa.uint64()),
            "winnow_min": pa.array(mins, pa.uint64()),
        }
    )
