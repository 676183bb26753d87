"""Continuous ingest — the composition a standing 100-TB crawl runs
every cycle, built entirely from this engine's operators:

    crawl epoch      (pipelines/crawl.EpochCrawler — upstream of here)
      → crawl_delta  (what changed vs the previous snapshot,
        changes-only inside partitions)
      → page text assembly + unicode normalization
      → near-dup gates: incremental MinHash index query (vs ANYTHING
        already ingested, the ingest's own epoch excluded so a
        crash-resume classifies identically) + intra-increment
        minhash pairs (mirror pages crawled the same cycle)
      → epoch_shuffle_write(novel docs) (resumable per-shard parquet,
        epoch-namespaced)
      → index.add(novel docs)          (append-only, idempotent,
        reusing the query's signature pass)

Every stage is an existing exchange-shaped operator; this module only
wires them and keeps the driver's hands off row-sized data — the
inter-stage handoffs are Datasets / partitioned parquet, and the
returned manifest is O(shards + counts).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def page_text_batch(batch: pa.Table, out_col: str = "text") -> pa.Table:
    """Assemble one text string per page from its span list — pure
    Arrow end to end: flatten the list column, keep non-empty
    kind=='text' spans, rebuild per-row lists from recomputed offsets
    and ``pc.binary_join`` them (no Python per-row loop)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lens = pc.list_value_length(spans).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    kind = pc.struct_field(flat, "kind")
    txt = pc.fill_null(pc.struct_field(flat, "text"), "")
    keep = pc.and_(pc.equal(kind, "text"),
                   pc.greater(pc.utf8_length(txt), 0)).fill_null(False)
    pieces = txt.filter(keep)
    keep_np = keep.to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    kept_per_row = np.bincount(row_of[keep_np], minlength=len(lens))
    offsets = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     pieces.combine_chunks()
                                     if isinstance(pieces, pa.ChunkedArray)
                                     else pieces)
    joined = pc.binary_join(lists, " ")
    return batch.append_column(out_col, joined)


def continuous_ingest(cur_visited_ds, index_dir: str, out_dir: str, *,
                      epoch: int, prev_visited_ds=None,
                      num_shards: int = 8, seed: int | None = None,
                      dup_threshold: float = 0.8,
                      normalize_form: str = "NFC",
                      recrawl_obs_dir: str | None = None) -> dict:
    """One ingest cycle; returns a counts/manifest dict.

    ``cur_visited_ds`` / ``prev_visited_ds`` are visited-parquet
    Datasets (``stages/worker.py`` lineage).  Only status-200 pages
    with a text payload are ingested.  ``seed`` defaults to ``epoch``
    so every cycle lands a fresh deterministic shuffle permutation.

    ``recrawl_obs_dir``: when set (and a previous snapshot exists), the
    delta's binary change observations land there partition-locally
    (``epoch=NNNNN/obs-*.parquet``); `pipelines/freshness.
    recrawl_priority` over the accumulated tree is the cycle's recrawl
    schedule."""
    import ray.data as rd  # noqa: F401  (documents the expected input kind)

    from ..stages.dedup_index import MinHashIndex
    from ..stages.normalize import normalize_array
    from ..stages.sampling import epoch_shuffle_write
    from .delta import crawl_delta, delta_counts

    # -- stage 1: which URLs even need ingesting ------------------------
    if prev_visited_ds is not None:
        # changes_only: the driver sees churn-sized rows, never the
        # corpus-sized unchanged majority (its count reports as None)
        delta = crawl_delta(
            prev_visited_ds, cur_visited_ds,
            compare_cols=("status_code", "size"),
            changes_only=True,
            observations_out=(os.path.join(recrawl_obs_dir, f"epoch={epoch:05d}")
                              if recrawl_obs_dir else None),
            observations_cycle=epoch)
        counts = delta_counts(delta)
        counts["unchanged"] = None
        wanted = delta.filter(
            pc.is_in(delta["change"], value_set=pa.array(["new", "changed"])))
        # broadcast ONE sorted uint64 key array (8 B/changed-URL) and
        # searchsorted per batch — not a Python string set
        import ray

        wanted_ref = ray.put(np.sort(
            wanted["url_key"].to_numpy(zero_copy_only=False)))
    else:
        counts = {"new": None, "gone": 0, "changed": 0, "unchanged": 0}
        wanted_ref = None

    def select(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["status_code"], 200)
        if wanted_ref is not None:
            import ray

            wk = ray.get(wanted_ref)
            k = batch["url_key"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(wk, k), max(0, len(wk) - 1))
            hit = wk[pos] == k if len(wk) else np.zeros(len(k), bool)
            keep = pc.and_(keep, pa.array(hit))
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return sub.select(["url_key", "url"]).append_column(
                "text", pa.array([], pa.string()))
        sub = page_text_batch(sub)
        sub = sub.set_column(sub.column_names.index("text"), "text",
                             normalize_array(sub["text"], form=normalize_form))
        sub = sub.filter(pc.greater(pc.utf8_length(sub["text"]), 0))
        return sub.select(["url_key", "url", "text"])

    # materialize: the assembled/normalized increment is consumed three
    # times (index query, index add, shard write) — one execution, blocks
    # pinned in the object store, nothing on the driver.  The increment
    # is cycle-sized by construction, not corpus-sized.
    docs = cur_visited_ds.map_batches(select, batch_format="pyarrow").materialize()

    # -- stage 2: near-dup gates ----------------------------------------
    # one signature pass feeds the index query AND the later add
    ix = MinHashIndex(index_dir)
    sigs = ix.signatures(docs, id_col="url_key", text_col="text")
    # (a) vs everything already ingested — the increment's own epoch is
    # EXCLUDED so a crashed-and-resumed cycle classifies identically
    dups = ix.query(sigs=sigs, id_col="url_key", threshold=dup_threshold,
                    exclude_epoch=epoch)
    # (b) within the increment itself (mirror pages crawled the same
    # cycle): exact-Jaccard-verified pairs, keep the smaller url_key
    from ..stages.dedup import minhash_dedup_pairs

    intra = minhash_dedup_pairs(docs, id_col="url_key", text_col="text",
                                num_perm=ix.num_perm, bands=ix.bands,
                                shingle_k=ix.shingle_k, seed=ix.seed,
                                threshold=dup_threshold)
    ia = intra["id_a"].to_numpy(zero_copy_only=False)
    ib = intra["id_b"].to_numpy(zero_copy_only=False)
    intra_drop = np.maximum(ia.view(np.uint64), ib.view(np.uint64)) \
        if ia.dtype == np.int64 else np.maximum(ia, ib)
    dup_keys = np.unique(np.concatenate([
        dups["new_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        intra_drop.astype(np.uint64)]))

    def drop_dups(batch: pa.Table) -> pa.Table:
        k = batch["url_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(dup_keys, k)
        pos_c = np.minimum(pos, max(0, len(dup_keys) - 1))
        is_dup = dup_keys[pos_c] == k if len(dup_keys) else np.zeros(len(k), bool)
        return batch.filter(pa.array(~is_dup))

    novel = docs.map_batches(drop_dups, batch_format="pyarrow").materialize()
    novel_sigs = sigs.map_batches(drop_dups, batch_format="pyarrow")

    # -- stage 3: land the training shards, then extend the index -------
    # shard paths are namespaced by epoch (cycles share out_dir without
    # colliding with each other's skip-existing resume semantics)
    shards = epoch_shuffle_write(
        novel, os.path.join(out_dir, f"epoch={epoch:05d}"),
        num_shards=num_shards,
        seed=epoch if seed is None else seed, key_col="url_key")
    add_manifest = ix.add(sigs=novel_sigs, epoch=epoch, id_col="url_key")
    return {
        "epoch": epoch,
        "delta": counts,
        "near_dups_dropped": int(len(dup_keys)),
        "ingested": int(sum(shards["rows"].to_pylist())),
        "index": add_manifest,
        "shards": shards.to_pylist(),
    }
