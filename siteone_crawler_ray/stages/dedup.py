"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md §2.7 — it only has exact URL
dedup); these are the corpus-dedup family a 100 TB pipeline needs, each
expressed Ray-Data-first:

- exact:   vectorized content hash per batch (partial min-combiner) →
           one small ``groupby(hash).min(doc_id)`` shuffle
- minhash: shingle→minhash signatures fully vectorized per batch
           (``np.minimum.reduceat`` over hashed shingles) → banded LSH
           rows → ``groupby(band)`` shuffle → verified Jaccard pairs
- simhash: 64-bit token-weight simhash per batch → 16-bit banding for
           Hamming-distance candidates
- ngram-Jaccard: exact verification kernel shared with minhash
- embedding cosine: normalized matmul per batch against a broadcast
  matrix (small side via ``ray.put``) → near-dup pairs

All per-batch kernels are numpy; Python never loops over rows except
inside ``np.*.reduceat``-prepared offsets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import xxh64_strings

_M61 = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Character k-shingle hashes for a batch → (per-doc sorted-unique
    hashes concatenated, doc_offsets).

    Fully vectorized: all texts concatenate into one byte buffer and a
    degree-k polynomial hash evaluates over every window at once
    (Python substring construction was the MinHash pipeline's hottest
    loop).  Docs shorter than k get one shingle = the whole string,
    matching ``jaccard``'s ``max(1, len-k+1)`` window count."""
    P = np.uint64(0x100000001B3)
    enc = [(t if isinstance(t, str) else str(t)).encode("utf-8", "replace") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    N = len(buf)
    with np.errstate(over="ignore"):
        if N >= k:
            H = np.zeros(N - k + 1, dtype=np.uint64)
            for j in range(k):
                H = H * P + buf[j : N - k + 1 + j]
            # avalanche the polynomial value (xorshift-multiply)
            H ^= H >> np.uint64(33)
            H *= np.uint64(0xFF51AFD7ED558CCD)
            H ^= H >> np.uint64(29)
        else:
            H = np.empty(0, dtype=np.uint64)
    hashes = []
    counts = np.empty(len(enc), dtype=np.int64)
    for i in range(len(enc)):
        s, ln = starts[i], lens[i]
        if ln >= k:
            h = np.unique(H[s : s + ln - k + 1])
        else:  # whole-string shingle for short docs
            h = xxh64_strings([enc[i].decode("utf-8", "replace")])
        hashes.append(h)
        counts[i] = len(h)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return (np.concatenate(hashes) if hashes else np.empty(0, np.uint64)), offsets


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    return batch.append_column("content_hash", pa.array(xxh64_strings(batch[column]), pa.uint64()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset of surviving ids (min id per identical text).

    Pattern: per-batch partial min (combiner) → tiny groupby shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        # int64 view of the xxh64 key: Ray's groupby falls back to pickled
        # extension objects for uint64 key columns (observed), int64 stays
        # native through the shuffle
        h = xxh64_strings(batch[text_col]).view(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        hs, first = np.unique(h[order], return_index=True)
        return pa.table({"content_hash": pa.array(hs, pa.int64()),
                         id_col: pa.array(ids[order][first])})

    import ray
    import ray.data as rd

    # partial per-block dedup leaves ≤ one row per distinct text per
    # block; the residue combines with one tiny hash agg.  Scale path
    # (residue too big for one node): groupby("content_hash").min —
    # the hash-partition exchange — instead of the driver combine.
    parts = [
        ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    merged = (
        pa.concat_tables([p for p in parts if p.num_rows])
        .group_by("content_hash", use_threads=False)
        .aggregate([(id_col, "min")])
    )
    return rd.from_arrow(merged.select([f"{id_col}_min"]).rename_columns([id_col]))


def minhash_signatures(batch: pa.Table, *, id_col="doc_id", text_col="text",
                       num_perm=64, shingle_k=5, seed=7) -> pa.Table:
    """Per-batch MinHash: (doc, num_perm) uint64 signature matrix."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    base, offsets = _shingle_hashes(texts, shingle_k)
    a, b = _perm_params(num_perm, seed)
    n = len(texts)
    sig = np.empty((n, num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            h = (a[j] * base + b[j]) & _M61
            sig[:, j] = np.minimum.reduceat(h, offsets[:-1]) if len(base) else 0
            empty = offsets[:-1] == offsets[1:]
            sig[empty, j] = _M61
    cols = {id_col: batch[id_col]}
    for j in range(num_perm):
        cols[f"mh{j}"] = pa.array(sig[:, j], pa.uint64())
    return pa.table(cols)


def lsh_band_rows(sig_batch: pa.Table, *, id_col="doc_id", num_perm=64, bands=16) -> pa.Table:
    """Signatures → (band_id, band_hash, id) rows for the LSH groupby."""
    rows_per_band = num_perm // bands
    n = sig_batch.num_rows
    sig = np.column_stack(
        [sig_batch[f"mh{j}"].to_numpy(zero_copy_only=False) for j in range(num_perm)]
    )
    ids = sig_batch[id_col].to_numpy(zero_copy_only=False)
    band_id = np.repeat(np.arange(bands, dtype=np.int32), n)
    out_ids = np.tile(ids, bands)
    band_hash = np.empty(bands * n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bnd in range(bands):
            chunk = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = np.full(n, np.uint64(1469598103934665603))
            for c in range(rows_per_band):
                h = (h ^ chunk[:, c]) * np.uint64(1099511628211)
            band_hash[bnd * n : (bnd + 1) * n] = h
    return pa.table({"band_id": pa.array(band_id), "band_hash": pa.array(band_hash, pa.uint64()),
                     id_col: pa.array(out_ids)})


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_dedup_pairs(ds, *, id_col="doc_id", text_col="text", num_perm=64,
                        bands=16, shingle_k=5, threshold=0.7, seed=7) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → verified pair table
    (id_a < id_b, jaccard ≥ threshold).

    Stages: signatures (map_batches) → band rows (map_batches) → groupby
    band buckets (the one shuffle) → candidate pairs → exact-Jaccard
    verification (second pass over the text of candidate ids only)."""
    import ray

    sigs = ds.map_batches(
        lambda b: minhash_signatures(b, id_col=id_col, text_col=text_col,
                                     num_perm=num_perm, shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
    )
    bands_ds = sigs.map_batches(
        lambda b: lsh_band_rows(b, id_col=id_col, num_perm=num_perm, bands=bands),
        batch_format="pyarrow",
    )
    # bucket → candidate pairs; buckets are tiny, pair emission vectorized
    def bucket_pairs(batch: pa.Table) -> pa.Table:
        bid = batch["band_id"].to_numpy(zero_copy_only=False)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids = bid[order], bh[order], ids[order]
        key_change = np.ones(len(bid), dtype=bool)
        key_change[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(key_change)[0]
        ends = np.append(starts[1:], len(bid))
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            if e - s > 1:
                grp = ids[s:e]
                iu, ju = np.triu_indices(len(grp), k=1)
                pa_.append(grp[iu])
                pb_.append(grp[ju])
        if not pa_:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(pa_)), "id_b": pa.array(np.concatenate(pb_))})

    # Band rows are (band_id, band_hash, id) — 24 bytes/doc/band.  At
    # report scale they fit the driver, and bucket_pairs is a single
    # vectorized lexsort over ALL buckets at once; at 10^10-doc scale
    # partition by band_hash (ds.groupby("part").map_groups with
    # part = band_hash % P) so each partition pairs independently.
    band_tbl = pa.concat_tables(
        [ray.get(r) for r in bands_ds.to_arrow_refs()]
    )
    cand = bucket_pairs(band_tbl).to_pandas().drop_duplicates()
    if len(cand) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # verification: broadcast the candidate id set, prune texts per batch
    # (only candidate texts ever leave the workers)
    import pyarrow.compute as pc

    need = pa.array(sorted(set(cand["id_a"]) | set(cand["id_b"])))
    need_ref = ray.put(need)

    def prune_and_hash(batch: pa.Table) -> pa.Table:
        """Filter to candidate docs and shingle-hash them in the same
        distributed pass — the driver only assembles arrays."""
        b = batch.filter(pc.is_in(batch[id_col], value_set=ray.get(need_ref)))
        if not b.num_rows:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "sh": pa.array([], pa.list_(pa.uint64()))})
        h, o = _shingle_hashes(b[text_col].to_numpy(zero_copy_only=False), shingle_k)
        sh = pa.ListArray.from_arrays(pa.array(o, pa.int32()), pa.array(h, pa.uint64()))
        return pa.table({id_col: b[id_col], "sh": sh})

    tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in ds.select_columns([id_col, text_col])
            .map_batches(prune_and_hash, batch_format="pyarrow")
            .to_arrow_refs()
        ]
    ).combine_chunks()
    # exact Jaccard on hashed shingle sets — identical semantics to
    # string-set Jaccard.  The shingle index (one sorted-unique uint64
    # array per candidate doc) is broadcast once via ray.put and the
    # pair verification fans out over map_batches (the pair count can
    # reach O(docs²·dup-rate) — driver-side verification was the
    # pipeline's long pole).
    sh_col = tbl["sh"].combine_chunks() if isinstance(tbl["sh"], pa.ChunkedArray) else tbl["sh"]
    hashes = pc.list_flatten(sh_col).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(sh_col).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    ids_sorted_idx = np.argsort(tbl[id_col].to_numpy(zero_copy_only=False), kind="stable")
    ids_sorted = tbl[id_col].to_numpy(zero_copy_only=False)[ids_sorted_idx]
    index_ref = ray.put((ids_sorted, ids_sorted_idx, hashes, offs))

    def verify(batch: pa.Table) -> pa.Table:
        idx_ids, idx_pos, hs, of = ray.get(index_ref)
        ia = batch["id_a"].to_numpy(zero_copy_only=False)
        ib = batch["id_b"].to_numpy(zero_copy_only=False)
        ja = np.empty(len(ia))
        ra = idx_pos[np.searchsorted(idx_ids, ia)]
        rb = idx_pos[np.searchsorted(idx_ids, ib)]
        for i in range(len(ia)):
            A = hs[of[ra[i]] : of[ra[i] + 1]]
            B = hs[of[rb[i]] : of[rb[i] + 1]]
            if len(A) > len(B):
                A, B = B, A
            pos = np.searchsorted(B, A)
            pos[pos == len(B)] = len(B) - 1
            inter = int(np.count_nonzero(B[pos] == A))
            union = len(A) + len(B) - inter
            ja[i] = 1.0 if union == 0 else inter / union
        return pa.table(
            {"id_a": batch["id_a"], "id_b": batch["id_b"], "jaccard": pa.array(np.round(ja, 6))}
        )

    import ray.data as rd
    import pandas as pd

    cand_t = pa.Table.from_pandas(
        pd.DataFrame({"id_a": cand["id_a"].to_numpy(), "id_b": cand["id_b"].to_numpy()}),
        preserve_index=False,
    )
    step = max(1, -(-cand_t.num_rows // 32))
    vds = rd.from_arrow([cand_t.slice(i, step) for i in range(0, cand_t.num_rows, step)])
    verified = pa.concat_tables(
        [ray.get(r) for r in vds.map_batches(verify, batch_format="pyarrow").to_arrow_refs()]
    )
    out = verified.filter(pc.greater_equal(verified["jaccard"], threshold))
    return out.take(pc.sort_indices(out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]))


def simhash_batch(batch: pa.Table, *, id_col="doc_id", text_col="text") -> pa.Table:
    """64-bit SimHash over whitespace tokens, vectorized with bit-count
    accumulation via reduceat."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    tok_hashes, counts = [], np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t if isinstance(t, str) else str(t)).split()
        counts[i] = max(1, len(toks))
        tok_hashes.append(xxh64_strings(toks) if toks else np.array([0], np.uint64))
    flat = np.concatenate(tok_hashes)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    bits = bits * 2 - 1  # ±1 weights
    sums = np.add.reduceat(bits, offsets, axis=0)
    sim = (sums > 0).astype(np.uint64)
    out = np.zeros(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(64):
            out |= sim[:, b] << np.uint64(b)
    return pa.table({id_col: batch[id_col], "simhash": pa.array(out, pa.uint64())})


def simhash_dedup_pairs(ds, *, id_col="doc_id", text_col="text", max_hamming=3) -> pa.Table:
    """SimHash near-dup: 4×16-bit band grouping (any identical band →
    candidate) then exact Hamming verification."""
    import ray
    import pyarrow.compute as pc

    sims = ds.map_batches(
        lambda b: simhash_batch(b, id_col=id_col, text_col=text_col), batch_format="pyarrow"
    )
    t = pa.concat_tables([ray.get(r) for r in sims.to_arrow_refs()])
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sh = t["simhash"].to_numpy(zero_copy_only=False)
    cand = set()
    for band in range(4):
        part = (sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        order = np.argsort(part, kind="stable")
        ps, pi = part[order], ids[order]
        starts = np.nonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))[0]
        ends = np.append(starts[1:], len(ps))
        for s, e in zip(starts, ends):
            if 1 < e - s <= 200:
                grp = np.sort(pi[s:e])
                iu, ju = np.triu_indices(len(grp), k=1)
                cand.update(zip(grp[iu].tolist(), grp[ju].tolist()))
    lut = dict(zip(ids.tolist(), sh.tolist()))
    rows = []
    for x, y in sorted(cand):
        d = int(bin(lut[x] ^ lut[y]).count("1"))
        if d <= max_hamming:
            rows.append((x, y, d))
    if not rows:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    xa, ya, da = zip(*rows)
    return pa.table({"id_a": pa.array(list(xa)), "id_b": pa.array(list(ya)),
                     "hamming": pa.array(list(da), pa.int64())})


def embedding_dup_pairs(ds, *, id_col="vec_id", vec_col="embedding", threshold=0.95) -> pa.Table:
    """Embedding near-dup: cosine ≥ threshold pairs via per-batch matmul
    against the broadcast normalized matrix (``ray.put`` once)."""
    import ray
    import pyarrow.compute as pc

    full = pa.concat_tables(
        [ray.get(r) for r in ds.select_columns([id_col, vec_col]).to_arrow_refs()]
    )
    ids = full[id_col].to_numpy(zero_copy_only=False)
    mat = np.vstack(full[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = np.vstack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        cos = bmat @ all_mat.T
        bi, aj = np.nonzero(cos >= threshold)
        keep = bids[bi] < all_ids[aj]
        return pa.table(
            {
                "id_a": pa.array(bids[bi][keep]),
                "id_b": pa.array(all_ids[aj][keep]),
                "cosine": pa.array(np.round(cos[bi, aj][keep], 6)),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow")
    t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
    return t.take(pc.sort_indices(t, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]))
