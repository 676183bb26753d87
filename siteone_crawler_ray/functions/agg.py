"""Partial (combiner-style) grouped aggregation over a Ray Dataset.

The reference's report tables are all low-cardinality groupbys (status
code, content type, host, reason — SURVEY.md §2.5).  A naive
``ds.groupby(k).aggregate(...)`` is an all-to-all shuffle of every row;
the scale-correct plan is the classic combiner: each block is reduced to
``≤ num_groups`` rows by pyarrow's C++ hash aggregation inside
``map_batches``, and only those tiny partials move.  At 100 TB this
turns the wide shuffle into a broadcast-sized final combine (partials
are ``num_blocks × num_groups`` rows); the final combine happens on the
driver for report-sized cardinalities (the only consumer is a report
table) — for high-cardinality keys keep ``ds.groupby`` instead.

Supported kinds: count, sum, min, max, mean (sum+count decomposition).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def block_refs(ds) -> list:
    """Execute the Dataset ONCE and return its block object refs.

    ``Dataset.to_arrow_refs()`` runs the pipeline a second time with a
    ``limit=1`` plan just to derive the schema — for an actor-pool
    stage that re-spins the whole pool.  The ref-bundle iterator
    executes exactly once."""
    return [r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs]


def collect_blocks(ds) -> list[pa.Table]:
    """Execute once → non-empty Arrow blocks on the driver (for the
    tiny partial-combine step only — never on unreduced data)."""
    import ray

    out = []
    for r in block_refs(ds):
        b = ray.get(r)
        if b.num_rows:
            out.append(b)
    return out

_PARTIAL_KIND = {"sum": "sum", "mean": "sum", "min": "min", "max": "max"}
# how to merge a partial column at the final combine
_MERGE_KIND = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _partial_aggs(specs) -> list:
    aggs: set[tuple] = set()
    need_count = False
    for _, col, kind in specs:
        if kind in _PARTIAL_KIND:
            aggs.add((col, _PARTIAL_KIND[kind]))
        if kind in ("count", "mean"):
            need_count = True
    out = sorted(aggs)
    if need_count:
        out.append(([], "count_all"))
    return out


def make_partial_fn(keys: list[str], specs):
    """Batch fn reducing a block to one row per group present in it."""
    aggs = _partial_aggs(specs)

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys, use_threads=False).aggregate(aggs)

    return partial


def combine_partials(parts: pa.Table, keys: list[str], specs) -> pa.Table:
    """Merge per-block partials into the final grouped result."""
    merge = []
    for col, kind in _partial_aggs(specs):
        pname = "count_all" if kind == "count_all" else f"{col}_{kind}"
        merge.append((pname, _MERGE_KIND.get(kind, "sum") if kind != "count_all" else "sum"))
    merged = parts.group_by(keys, use_threads=False).aggregate(merge)

    cols = {k: merged[k] for k in keys}
    for name, col, kind in specs:
        if kind == "count":
            cols[name] = merged["count_all_sum"]
        elif kind == "mean":
            cols[name] = pc.divide(
                pc.cast(merged[f"{col}_sum_sum"], pa.float64()),
                pc.cast(merged["count_all_sum"], pa.float64()),
            )
        else:
            pk = _PARTIAL_KIND[kind]
            cols[name] = merged[f"{col}_{pk}_{_MERGE_KIND[pk]}"]
    return pa.table(cols)


def grouped_agg(ds, keys: list[str], specs) -> pa.Table:
    """ds → partial per block → driver combine.  specs: (out, col, kind)."""
    import ray

    partial = make_partial_fn(keys, specs)
    blocks = collect_blocks(ds.map_batches(partial, batch_format="pyarrow"))
    if not blocks:  # fully-empty input: derive the partial schema from
        # an empty block so the combine still type-checks (ADVICE r1)
        empty = ds.schema().base_schema.empty_table()
        blocks = [partial(empty)]
    parts = pa.concat_tables(blocks, promote_options="permissive")
    return combine_partials(parts, keys, specs)


def partial_topk(ds, k: int, sort_cols: list[str], descending=None) -> pa.Table:
    """Scale-correct top-k: each block reduces to its own top-k inside
    map_batches, the tiny partials merge on the driver — no global
    sort shuffle for a k-row answer."""
    import ray

    descending = descending or [False] * len(sort_cols)
    keys = [(c, "descending" if d else "ascending") for c, d in zip(sort_cols, descending)]

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=keys)
        return batch.take(idx.slice(0, k))

    parts = collect_blocks(ds.map_batches(block_topk, batch_format="pyarrow"))
    parts = parts or [ds.schema().base_schema.empty_table()]
    merged = pa.concat_tables(parts, promote_options="permissive")
    idx = pc.sort_indices(merged, sort_keys=keys)
    return merged.take(idx.slice(0, k))


def global_agg(ds, specs) -> dict:
    """Keyless version: one scalar row.  specs: (out, col, kind)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        row = {"__n": pa.array([batch.num_rows], pa.int64())}
        for _, col, kind in specs:
            if kind == "count":
                continue
            pk = _PARTIAL_KIND[kind]
            row[f"{col}_{pk}"] = pa.array(
                [getattr(pc, pk if pk != "sum" else "sum")(batch[col]).as_py()]
            )
        return pa.table(row)

    blocks = collect_blocks(ds.map_batches(partial, batch_format="pyarrow"))
    parts = pa.concat_tables(blocks, promote_options="permissive")
    n = pc.sum(parts["__n"]).as_py()
    out = {}
    for name, col, kind in specs:
        if kind == "count":
            out[name] = n
        elif kind == "mean":
            out[name] = pc.sum(parts[f"{col}_sum"]).as_py() / n
        else:
            pk = _PARTIAL_KIND[kind]
            fn = {"sum": pc.sum, "min": pc.min, "max": pc.max}[pk]
            out[name] = fn(parts[f"{col}_{pk}"]).as_py()
    return out


def exact_rank_value(ds, col: str, rank: int | None = None, *, rank_fn=None,
                     num_bins: int = 8192,
                     collect_threshold: int = 1_000_000) -> float | None:
    """Exact value at 0-based ``rank`` of the sorted column — the
    distributed nearest-rank selection.

    Small inputs (≤ collect_threshold rows) collect the column (one
    pass).  Large inputs use histogram bisection: pass 1 computes
    (count, min, max) partials; pass 2 bins every value into a shared
    histogram (per-block partial bincounts); the driver locates the
    bin containing the rank and pass 3 collects ONLY that bin's values
    (≈ n/num_bins rows) for the final exact select — no O(n) driver
    pull at any point."""
    import ray
    import numpy as np

    stats = global_agg(ds.select_columns([col]),
                       [("n", None, "count"), ("lo", col, "min"), ("hi", col, "max")])
    n = int(stats["n"])
    if n == 0:
        return None
    if rank_fn is not None:
        rank = rank_fn(n)
    rank = max(0, min(rank, n - 1))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if n <= collect_threshold or lo == hi:
        import pyarrow as pa

        vals = np.concatenate([
            b[col].to_numpy(zero_copy_only=False)
            for b in collect_blocks(ds.select_columns([col]))
        ] or [np.empty(0)])
        return float(np.partition(vals, rank)[rank])

    width = (hi - lo) / num_bins

    def bin_of(x: np.ndarray) -> np.ndarray:
        return np.clip(((x - lo) / width).astype(np.int64), 0, num_bins - 1)

    def hist_partial(batch) -> "pa.Table":
        import pyarrow as pa

        x = batch[col].to_numpy(zero_copy_only=False)
        counts = np.bincount(bin_of(x), minlength=num_bins)
        return pa.table({"h": pa.array(counts, pa.int64())})

    parts = collect_blocks(
        ds.select_columns([col]).map_batches(hist_partial, batch_format="pyarrow"))
    hist = np.zeros(num_bins, dtype=np.int64)
    for p in parts:
        hist += p["h"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, rank + 1))
    rank_in_bin = rank - (int(cum[b - 1]) if b else 0)

    def bin_filter(batch) -> "pa.Table":
        import pyarrow as pa

        x = batch[col].to_numpy(zero_copy_only=False)
        return pa.table({col: pa.array(x[bin_of(x) == b])})

    vals = np.concatenate([
        b[col].to_numpy(zero_copy_only=False)
        for b in collect_blocks(
            ds.select_columns([col]).map_batches(bin_filter, batch_format="pyarrow"))
    ] or [np.empty(0)])
    return float(np.partition(vals, rank_in_bin)[rank_in_bin])


def distributed_nearest_rank_percentile(ds, col: str, p: int, **kw) -> float | None:
    """Reference nearest-rank percentile (basic_stats.rs:14-21:
    rank = round_half_up(p/100·(n−1))) computed distributed-exactly —
    the rank derives from the count already measured inside
    exact_rank_value's stats pass (no extra pass)."""
    import math

    return exact_rank_value(
        ds, col, rank_fn=lambda n: int(math.floor((p / 100.0) * (n - 1) + 0.5)), **kw
    )
