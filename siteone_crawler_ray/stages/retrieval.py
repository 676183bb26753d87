"""Distributed BM25 retrieval over the ``documents`` table.

Beyond-reference training-data operator (SURVEY.md §2.11 family — the
reference crawler has no search surface): classic sparse retrieval in
the distributed-search shape every corpus pipeline needs next to ANN —
score a small query set against every document, return exact top-k.

Public algorithm: Robertson & Zaragoza 2009 (BM25); the idf variant is
Lucene's non-negative ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Scale shape (the part that matters at 100 TB):

* **Pass 1** — corpus statistics.  Per-block partials of ``(n_docs,
  sum_dl, df_t … )`` restricted to the query-term set; one tiny row per
  block, summed on the driver.  The term set is the broadcast side
  (queries are human-sized), so no shuffle exists in this operator at
  any corpus size.
* **Pass 2** — scoring.  The |terms|+2 scalars from pass 1 ride into a
  stateless ``map_batches`` closure; each block scores its docs
  vectorized (Arrow token split, ``np.add.reduceat`` segment tf) and
  emits only its local top-k rows per query, so the driver merge sees
  ``blocks × |queries| × k`` rows — O(plan width), not O(corpus).

Scores are fixed to micro-ints (``round_away(score·1e6)``) so the
DuckDB oracle hash-matches without float-tail ambiguity; ordering is
(score_micro desc, doc_id asc), deterministic on both engines.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round_away

# BM25 free parameters, locked to the oracle SQL in __ray_entry__.py
K1 = 1.2
B = 0.75


def _term_tfs(batch: pa.Table, terms: list[str], text_col: str = "text"):
    """Vectorized per-doc term frequencies for a small term set.

    One Arrow split per batch; each term costs one ``pc.equal`` over the
    flat token array plus a ``reduceat`` segment sum — no Python loop
    over rows or tokens.
    Returns ``(doc_len: int64[n], {term: tf int64[n]})``.
    """
    col = pc.split_pattern(batch[text_col], " ").combine_chunks()
    flat = col.values
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    tfs: dict[str, np.ndarray] = {}
    nflat = len(flat)
    for t in terms:
        if nflat:
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False).astype(np.int64)
            tf = np.add.reduceat(eq, np.minimum(off, nflat - 1))
            tf[lens == 0] = 0
        else:
            tf = np.zeros(len(lens), dtype=np.int64)
        tfs[t] = tf
    return lens, tfs


def corpus_stats(ds, terms: list[str], text_col: str = "text") -> dict:
    """Pass 1: global ``(n_docs, sum_dl, df per term)`` via per-block
    one-row partials.  Document length = whitespace-token count, the
    repo-wide convention (`len(string_split(text,' '))` in SQL)."""
    from ..functions.agg import collect_blocks

    terms = list(terms)

    def partial(batch: pa.Table) -> pa.Table:
        lens, tfs = _term_tfs(batch, terms, text_col)
        cols = {
            "n_docs": pa.array([len(lens)], pa.int64()),
            "sum_dl": pa.array([int(lens.sum())], pa.int64()),
        }
        for i, t in enumerate(terms):
            cols[f"df_{i}"] = pa.array([int((tfs[t] > 0).sum())], pa.int64())
        return pa.table(cols)

    parts = collect_blocks(ds.map_batches(partial, batch_format="pyarrow"))
    tot = {c: 0 for c in (["n_docs", "sum_dl"] + [f"df_{i}" for i in range(len(terms))])}
    for p in parts:
        for c in tot:
            tot[c] += int(pc.sum(p[c]).as_py() or 0)
    return {
        "n_docs": tot["n_docs"],
        "sum_dl": tot["sum_dl"],
        "df": {t: tot[f"df_{i}"] for i, t in enumerate(terms)},
    }


def stats_partial_rows(batch: pa.Table, terms: list[str],
                       text_col: str = "text") -> pa.Table:
    """One block's :func:`corpus_stats` partial, row-encoded as
    ``(name, n)`` pairs (``n_docs`` / ``sum_dl`` / ``df:<term>``) so it
    can ride in the same table as another partial's rows — the
    fused-scan transport of pipelines/curation.ngram_and_bm25.
    Emits exactly ``len(terms) + 2`` rows for every block."""
    lens, tfs = _term_tfs(batch, terms, text_col)
    names = ["n_docs", "sum_dl"] + [f"df:{t}" for t in terms]
    vals = [len(lens), int(lens.sum())] + [int((tfs[t] > 0).sum()) for t in terms]
    return pa.table({"name": pa.array(names, pa.string()),
                     "n": pa.array(vals, pa.int64())})


def stats_from_rows(parts: list[pa.Table], terms: list[str]) -> dict:
    """Sum row-encoded stats partials back into the
    :func:`corpus_stats` dict shape."""
    tot: dict[str, int] = {}
    for p in parts:
        for name, n in zip(p["name"].to_pylist(), p["n"].to_pylist()):
            tot[name] = tot.get(name, 0) + int(n)
    return {"n_docs": tot.get("n_docs", 0), "sum_dl": tot.get("sum_dl", 0),
            "df": {t: tot.get(f"df:{t}", 0) for t in terms}}


def bm25_topk(ds_factory, queries: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id",
              stats: dict | None = None) -> pa.Table:
    """Exact BM25 top-k per query: ``(query, doc_id, score_micro)``.

    ``ds_factory`` is called once per pass (the two-pass read pattern of
    pipelines/curation.py).  Docs scoring 0 (no query term present) are
    excluded; ties break on doc_id ascending.

    ``stats`` short-circuits pass 1 with a precomputed
    :func:`corpus_stats` dict — the fused-scan path of
    pipelines/curation.ngram_and_bm25, which piggybacks the stats
    partial on a scan it already makes (one corpus read saved).
    """
    from ..functions.agg import collect_blocks

    terms = sorted({t for q in queries for t in q.split(" ")})
    st = stats if stats is not None else corpus_stats(ds_factory(), terms, text_col)
    n, avgdl = st["n_docs"], st["sum_dl"] / max(st["n_docs"], 1)
    idf = {t: math.log(1.0 + (n - st["df"][t] + 0.5) / (st["df"][t] + 0.5))
           for t in terms}

    def score_block(batch: pa.Table) -> pa.Table:
        lens, tfs = _term_tfs(batch, terms, text_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        norm = K1 * (1.0 - B + B * lens.astype(np.float64) / avgdl)
        out = []
        for q in queries:
            s = np.zeros(len(lens), dtype=np.float64)
            for t in q.split(" "):
                tf = tfs[t].astype(np.float64)
                s += idf[t] * (tf * (K1 + 1.0)) / (tf + norm)
            micro = round_away(s * 1e6, 0).astype(np.int64)
            keep = micro > 0
            mi, di = micro[keep], ids[keep]
            # local top-k partial: globally sufficient per block
            order = np.lexsort((di, -mi))[:k]
            out.append(pa.table({
                "query": pa.array([q] * len(order), pa.string()),
                "doc_id": pa.array(di[order], pa.int64()),
                "score_micro": pa.array(mi[order], pa.int64()),
            }))
        return pa.concat_tables(out)

    parts = collect_blocks(
        ds_factory().map_batches(score_block, batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"query": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "score_micro": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts, promote_options="permissive")
    final = []
    for q in queries:
        t = merged.filter(pc.equal(merged["query"], q))
        idx = pc.sort_indices(t, [("score_micro", "descending"),
                                  ("doc_id", "ascending")])
        final.append(t.take(idx.slice(0, k)))
    return pa.concat_tables(final)
