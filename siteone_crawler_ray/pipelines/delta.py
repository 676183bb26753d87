"""Crawl delta — change detection between two crawl result sets.

A continuous large-scale crawl re-visits the web on a cadence; the
operator a recrawl scheduler needs is "what changed since last time":
which URLs are NEW, GONE, CHANGED, or UNCHANGED between two visited
snapshots (the parquet lineage `stages/worker.py` writes — the
reference's result storage, `/root/reference/src/engine/crawler.rs`
result rows, has the same per-URL record but no cross-run compare).

Exchange shape: ONE full-outer hash join on the precomputed
``url_key`` (uint64 xxh64 of the canonical URL, already materialized
by the crawl) — `stages/join.hash_join` scatters both snapshots once
and classifies inside each partition (``post=``), so the O(rows)
joined table never lands anywhere; only the (url, change) rows leave,
and ``delta_counts`` reduces those to a 4-row summary with per-block
partials.  64-bit key collisions would mispair two unrelated URLs
(expected count ~N²/2⁶⁵ — harmless at any realistic corpus size); the
classifier guards by comparing the URL strings of paired rows and
classifying a mismatch conservatively as changed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_COMPARE = ("status_code", "size", "title")


def _classify(joined: pa.Table, compare_cols) -> pa.Table:
    """(url, change) per joined row — vectorized null/equality logic."""
    old_url = joined["url"] if "url" in joined.column_names else pa.nulls(
        joined.num_rows, pa.string())
    new_url = joined["n_url"] if "n_url" in joined.column_names else pa.nulls(
        joined.num_rows, pa.string())
    has_old = pc.is_valid(old_url)
    has_new = pc.is_valid(new_url)
    same = np.ones(joined.num_rows, dtype=bool)
    for c in compare_cols:
        nc = f"n_{c}"
        if c not in joined.column_names or nc not in joined.column_names:
            continue
        # null-safe equality: both-null compares EQUAL (a nullable
        # compare column must not mark a row changed forever)
        both_null = pc.and_(pc.is_null(joined[c]), pc.is_null(joined[nc]))
        eq = pc.or_(both_null, pc.fill_null(pc.equal(joined[c], joined[nc]), False))
        same &= eq.to_numpy(zero_copy_only=False)
    # hash-collision guard: a "pair" whose URLs differ is not the same
    # document — classify as changed rather than unchanged
    url_eq = pc.fill_null(pc.equal(old_url, new_url), False).to_numpy(
        zero_copy_only=False)
    same &= url_eq
    ha = has_old.to_numpy(zero_copy_only=False)
    hn = has_new.to_numpy(zero_copy_only=False)
    change = np.where(~ha, "new", np.where(~hn, "gone",
                      np.where(same, "unchanged", "changed")))
    url = pc.if_else(has_old, old_url, new_url)
    return pa.table({"url_key": joined["url_key"], "url": url,
                     "change": pa.array(change, pa.string())})


def crawl_delta(old_ds, new_ds, compare_cols=DEFAULT_COMPARE,
                num_partitions: int | None = None,
                changes_only: bool = False,
                observations_out: str | None = None,
                observations_cycle: int = 0) -> pa.Table:
    """Per-URL change table between two visited snapshots (Datasets or
    anything `ray.data` produced with url_key/url + compare columns).

    ``changes_only=True`` drops the ``unchanged`` rows INSIDE each
    partition before anything reaches the driver — on a steady-state
    recrawl almost every row is unchanged, so the returned table is
    churn-sized, not corpus-sized (what `pipelines/continuous.py`
    consumes; the unchanged tally is then not represented).

    ``observations_out`` (optional dir): each partition also writes its
    binary change observations (`pipelines/freshness.
    observations_from_delta` rows, tagged ``observations_cycle``) as
    one parquet file BEFORE the changes_only filter — the full
    unchanged majority lands on disk partition-locally and never rides
    through the driver, so a standing recrawl can feed
    `freshness.recrawl_priority` without a second corpus-sized join."""
    from ..stages.join import hash_join

    if observations_out is not None:
        import os

        os.makedirs(observations_out, exist_ok=True)

    cols = ["url_key", "url", *compare_cols]
    old_sel = old_ds.select_columns([c for c in cols])

    def tag_new(batch: pa.Table) -> pa.Table:
        return pa.table({"url_key": batch["url_key"],
                         **{f"n_{c}" if c != "url_key" else c: batch[c]
                            for c in cols if c != "url_key"}})

    def post(t: pa.Table) -> pa.Table:
        out = _classify(t, compare_cols)
        if observations_out is not None:
            import os
            import uuid

            import pyarrow.parquet as pq

            from .freshness import observations_from_delta

            obs = observations_from_delta(out, observations_cycle)
            if obs.num_rows:
                pq.write_table(obs, os.path.join(
                    observations_out, f"obs-{uuid.uuid4().hex}.parquet"))
        if changes_only:
            out = out.filter(pc.not_equal(out["change"], "unchanged"))
        return out

    new_sel = new_ds.select_columns([c for c in cols]).map_batches(
        tag_new, batch_format="pyarrow")
    parts = hash_join(old_sel, new_sel, key="url_key", how="full",
                      num_partitions=num_partitions,
                      post=post)
    if not parts:
        return pa.table({"url_key": pa.array([], pa.uint64()),
                         "url": pa.array([], pa.string()),
                         "change": pa.array([], pa.string())})
    return pa.concat_tables(parts, promote_options="permissive")


def delta_counts(delta: pa.Table) -> dict[str, int]:
    """4-key summary a recrawl scheduler consumes."""
    vals, counts = np.unique(
        delta["change"].to_numpy(zero_copy_only=False).astype(str),
        return_counts=True)
    out = {"new": 0, "gone": 0, "changed": 0, "unchanged": 0}
    out.update({str(v): int(c) for v, c in zip(vals, counts)})
    return out
