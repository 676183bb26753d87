"""Distributed BPE tokenizer training + encoding.

Beyond-reference training-data operator (SURVEY.md §2.11): byte-pair
encoding per Sennrich, Haddow & Birch 2016 ("Neural Machine Translation
of Rare Words with Subword Units") — the classic word-frequency
formulation.

Scale shape: BPE trains on the **word-frequency table**, not the raw
corpus — so the only distributed step is an exact global word count,
which reuses the n-gram machinery (per-block ``value_counts`` partials,
scatter-exchange above the driver-combine threshold).  The table is
bounded by vocabulary size (``word_cap``), so the iterative merge loop
is driver-side work on a broadcast-sized input at any corpus size —
the same bounded-model argument as ``stages/textstats.unigram_model``.
Encoding is a stateless ``map_batches`` kernel with a per-batch
word→tokens memo (each distinct word is merged once, then mapped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# end-of-word sentinel (paper's </w>) — keeps word-final subwords
# distinct from word-internal ones through arbitrary merges
EOW = "</w>"


def word_frequencies(ds, text_col: str = "text", word_cap: int = 262144) -> pa.Table:
    """Exact global word counts, top-``word_cap`` by (count desc, word
    asc) — distributed via stages/sampling.ngram_topk with n=1."""
    from .sampling import ngram_topk

    t = ngram_topk(ds, n=1, k=word_cap, text_col=text_col)
    return t.rename_columns(["word", "n"])


def _pair_counts(words: list[tuple[str, ...]], freqs: np.ndarray) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for w, f in zip(words, freqs):
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            counts[p] = counts.get(p, 0) + int(f)
    return counts


def _merge_word(w: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i, n = 0, len(w)
    while i < n:
        if i < n - 1 and w[i] == pair[0] and w[i + 1] == pair[1]:
            out.append(w[i] + w[i + 1])
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def train_bpe(word_freqs: pa.Table, num_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE merges over the (bounded) word-frequency table.

    Deterministic tie-break: (count desc, pair asc).  Words are char
    sequences with an EOW sentinel appended (the paper's ``</w>``), so
    word-final subwords stay distinct from word-internal ones.
    """
    words = [tuple(w) + (EOW,) for w in word_freqs["word"].to_pylist()]
    freqs = word_freqs["n"].to_numpy(zero_copy_only=False)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(words, freqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        words = [_merge_word(w, best[0]) for w in words]
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Apply trained merges to one word (lowest-rank pair first —
    standard BPE inference order, equivalent to replaying training)."""
    w = list(word) + [EOW]
    while len(w) > 1:
        pairs = [(ranks.get((w[i], w[i + 1])), i) for i in range(len(w) - 1)]
        cand = [(r, i) for r, i in pairs if r is not None]
        if not cand:
            break
        _, i = min(cand)
        w[i : i + 2] = [w[i] + w[i + 1]]
    return w


def bpe_encode_counts(batch: pa.Table, merges: list[tuple[str, str]],
                      text_col: str = "text") -> pa.Table:
    """Per-doc BPE token count under a trained merge list — the
    tokenizer-apply kernel.  Each distinct word in the batch is encoded
    once (np.unique + memo), then token counts map back per doc via the
    inverse index; no per-token Python work at the doc level."""
    ranks = {p: i for i, p in enumerate(merges)}
    col = pc.split_pattern(batch[text_col], " ").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat):
        uniq, inv = np.unique(flat, return_inverse=True)
        per_word = np.array([len(encode_word(w, ranks)) for w in uniq], dtype=np.int64)
        tok = per_word[inv]
        off = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=off[1:])
        sums = np.add.reduceat(tok, np.minimum(off, len(tok) - 1))
        sums[lens == 0] = 0
    else:
        sums = np.zeros(len(lens), dtype=np.int64)
    return pa.table({"doc_id": batch["doc_id"],
                     "n_bpe_tokens": pa.array(sums, pa.int64())})


def train_and_count(ds_factory, num_merges: int = 64,
                    word_cap: int = 262144) -> tuple[list, pa.Table]:
    """End-to-end: distributed word count → driver merge training →
    distributed encode pass.  Returns (merges, per-doc token counts)."""
    from ..functions.agg import collect_blocks

    wf = word_frequencies(ds_factory(), word_cap=word_cap)
    merges = train_bpe(wf, num_merges)
    parts = collect_blocks(ds_factory().map_batches(
        lambda b: bpe_encode_counts(b, merges), batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return merges, pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_bpe_tokens": pa.array([], pa.int64())})
    return merges, pa.concat_tables(parts)
