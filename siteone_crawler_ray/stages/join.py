"""Hash-partitioned shuffle join — the big×big equi-join primitive.

Every other join in the engine broadcasts its small side
(`pipelines/relational.py` §2.4 shapes); this is the coded scale path
for the case where NEITHER side fits a broadcast: both inputs scatter
by ``key % P`` (each row crosses the wire exactly once, the
`stages/dedup._scatter_exchange` guarantee), and partition ``p`` joins
its two co-located slices with the Arrow join kernel.  Identical key ⇒
identical partition on both sides, so the partition-local join is
exact for any ``P``.

Used by ``pipelines/relational.segment_join`` above
``_BROADCAST_JOIN_ROWS`` (pytest-forced parity:
``test_hash_join_matches_broadcast_path``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _auto_partitions, _key_mod

# full-outer is intentionally absent: a partition with rows on only one
# side cannot null-fill the other side's columns without its schema
_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "semi": "left semi",
    "anti": "left anti",
}


def hash_join(left_ds, right_ds, key: str, how: str = "inner",
              num_partitions: int | None = None,
              right_suffix: str = "_r", post=None) -> list[pa.Table]:
    """Join two Datasets on an integer ``key`` column; returns the
    per-partition result tables (order within/among partitions is not
    deterministic — callers sort, as every slot does).

    Both sides stream out of the object store via
    ``iter_internal_ref_bundles`` (no driver materialization); stage 1
    splits each block into ``P`` keyed sub-tables, stage 2 task ``p``
    concatenates its slices from both sides and runs
    ``pa.Table.join`` single-threaded (K worker tasks × Arrow's
    default 32-thread pool is this box's measured thrash trap).

    ``post`` (optional) runs on each partition's joined table INSIDE
    the stage-2 task — pass a partial-aggregation kernel so a
    reduction over a big×big join never materializes the O(rows) join
    output anywhere (the driver then combines P tiny partials).
    """
    import ray

    from ..functions.agg import block_refs

    how_arrow = _JOIN_TYPES[how]
    lrefs = block_refs(left_ds)
    rrefs = block_refs(right_ds)
    if num_partitions is None:
        num_partitions = _auto_partitions()
    P = num_partitions

    @ray.remote
    def scatter(block: pa.Table):
        if block is None or block.num_rows == 0:
            return (None,) * P if P > 1 else None
        part = _key_mod(block, key, P)
        return tuple(block.filter(pa.array(part == p)) for p in range(P))

    @ray.remote
    def join_partition(n_left: int, *parts) -> pa.Table:
        lt = [t for t in parts[:n_left] if t is not None and t.num_rows]
        rt = [t for t in parts[n_left:] if t is not None and t.num_rows]
        if not lt:
            return None
        if not rt and how in ("inner", "semi"):
            return None
        lcat = pa.concat_tables(lt)
        if not rt:  # left/anti with empty right: left rows pass through
            # (the driver concat promotes missing right columns to null)
            joined = lcat
        else:
            joined = lcat.join(pa.concat_tables(rt), keys=key,
                               join_type=how_arrow,
                               right_suffix=right_suffix, use_threads=False)
        return post(joined) if post is not None else joined

    def split(refs):
        cols = [scatter.options(num_returns=P).remote(r) for r in refs]
        return [[c] for c in cols] if P == 1 else cols

    lcols, rcols = split(lrefs), split(rrefs)
    out_refs = [
        join_partition.remote(
            len(lrefs),
            *[lcols[i][p] for i in range(len(lrefs))],
            *[rcols[i][p] for i in range(len(rrefs))])
        for p in range(P)
    ]
    out = ray.get(out_refs)
    return [t for t in out if t is not None and t.num_rows]


def hash_join_table(left_ds, right_ds, key: str, how: str = "inner",
                    num_partitions: int | None = None,
                    right_suffix: str = "_r") -> pa.Table:
    """Driver-side concatenation of :func:`hash_join` — for results
    known to be reduction-sized (tests, report tables).  Large results
    should consume the partition list directly."""
    parts = hash_join(left_ds, right_ds, key, how, num_partitions, right_suffix)
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="permissive")
