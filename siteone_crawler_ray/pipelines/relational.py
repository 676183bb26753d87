"""Relational / analytical pipelines over the driver testdata tables.

These express the reference's aggregation-operator *shapes* (SURVEY.md
§2.5-2.6: groupby-agg report tables, top-k sort/limit, nearest-rank
percentiles, source joins, distinct counts, skip-class groupings) over
the TPC-H-ish tables, plus the streaming-shaped (windowed, as-of/range)
operators, so every shape has a DuckDB-checkable oracle in
``__ray_entry__.oracle_sql``.

Conventions for oracle parity:
- every computed column is named identically to the SQL alias,
- every rounded float goes through functions.numeric.round_away
  (DuckDB round semantics),
- top-k queries carry an explicit deterministic tie-break,
- aggregates pre-combine per batch where the reduction allows it
  (partial → small shuffle), per the scale rules.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round_away


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _collect(ds) -> pa.Table:
    import ray

    blocks = [ray.get(r) for r in ds.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    return pa.concat_tables(blocks).combine_chunks() if blocks else None


# -- groupby-agg report-table shapes ----------------------------------------


def pricing_summary(sf_dir: str) -> pa.Table:
    """content-type-table shape: groupby flag → count/sum/avg."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = ds.groupby("l_returnflag").aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
    )
    t = _collect(out)
    return pa.table(
        {
            "l_returnflag": t["l_returnflag"],
            "n": t["n"],
            "sum_qty": pa.array(round_away(t["sum_qty"].to_numpy(), 2)),
            "avg_price": pa.array(round_away(t["avg_price"].to_numpy(), 6)),
        }
    )


def global_stats(sf_dir: str) -> pa.Table:
    """BasicStats shape: single-row totals/min/max/avg."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    agg = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Min("l_extendedprice", alias_name="min_price"),
        Max("l_extendedprice", alias_name="max_price"),
        Mean("l_extendedprice", alias_name="avg_price"),
    )
    return pa.table(
        {
            "n": pa.array([int(agg["n"])], pa.int64()),
            "sum_qty": pa.array(round_away([agg["sum_qty"]], 2)),
            "min_price": pa.array(round_away([agg["min_price"]], 3)),
            "max_price": pa.array(round_away([agg["max_price"]], 3)),
            "avg_price": pa.array(round_away([agg["avg_price"]], 6)),
        }
    )


def count_by_type(sf_dir: str) -> pa.Table:
    """count_by_status shape."""
    from ray.data.aggregate import Count

    return _collect(_read(sf_dir, "events", ["event_type"]).groupby("event_type").aggregate(Count(alias_name="n")))


def lang_counts(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count

    return _collect(_read(sf_dir, "documents", ["lang"]).groupby("lang").aggregate(Count(alias_name="n")))


def source_stats(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Mean

    t = _collect(
        _read(sf_dir, "documents", ["source", "n_chars"])
        .groupby("source")
        .aggregate(Count(alias_name="n"), Mean("n_chars", alias_name="avg_chars"))
    )
    return pa.table(
        {"source": t["source"], "n": t["n"], "avg_chars": pa.array(round_away(t["avg_chars"].to_numpy(), 6))}
    )


def returned_by_supplier(sf_dir: str) -> pa.Table:
    """404-table shape: filter + groupby."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_suppkey"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b["l_returnflag"], "R")).select(["l_suppkey"]),
        batch_format="pyarrow",
    )
    return _collect(ds.groupby("l_suppkey").aggregate(Count(alias_name="n")))


def label_counts(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count

    return _collect(_read(sf_dir, "embeddings", ["label"]).groupby("label").aggregate(Count(alias_name="n")))


# -- top-k / percentile shapes ----------------------------------------------


def fastest_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """fastest-URLs shape: asc sort + deterministic tie-break + limit."""
    ds = _read(sf_dir, "events", ["event_id", "value"]).sort(["value", "event_id"]).limit(k)
    return _collect(ds).select(["event_id", "value"])


def slowest_topk(sf_dir: str, k: int = 20) -> pa.Table:
    ds = (
        _read(sf_dir, "events", ["event_id", "value"])
        .sort(["value", "event_id"], descending=[True, False])
        .limit(k)
    )
    return _collect(ds).select(["event_id", "value"])


def p90_by_type(sf_dir: str) -> pa.Table:
    """reference nearest-rank p90 per group (basic_stats.rs:14-21)."""
    from .reports import reference_percentile

    def per_group(g):
        import pandas as pd

        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "p90": [reference_percentile(g["value"].to_numpy(), 90)]}
        )

    out = _read(sf_dir, "events", ["event_type", "value"]).groupby("event_type").map_groups(
        per_group, batch_format="pandas"
    )
    return _collect(out)


# -- join / lookup shapes ----------------------------------------------------


def segment_join(sf_dir: str) -> pa.Table:
    """source-join shape: broadcast small side (customer) into map_batches,
    then groupby — no shuffle join (SURVEY.md §2.4)."""
    import ray
    from ray.data.aggregate import Count, Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"])
    lut_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())))

    def attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        seg = np.array([lut.get(int(kk), "") for kk in keys], dtype=object)
        return pa.table({"c_mktsegment": pa.array(seg, pa.string()), "o_totalprice": batch["o_totalprice"]})

    out = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
    )
    t = _collect(out)
    return pa.table(
        {"c_mktsegment": t["c_mktsegment"], "n": t["n"], "total": pa.array(round_away(t["total"].to_numpy(), 2))}
    )


def range_join_count(sf_dir: str) -> pa.Table:
    """as-of/range-join shape: per-event count of this user's orders with
    orderdate ≤ ts.  Broadcast sorted per-key date arrays + vectorized
    searchsorted per batch (scale path: bucket both sides by key hash)."""
    import ray
    import pyarrow.parquet as pq

    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_orderdate"])
    ck = orders["o_custkey"].to_numpy(zero_copy_only=False)
    od = orders["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    order = np.lexsort((od, ck))
    ck, od = ck[order], od[order]
    starts = np.searchsorted(ck, np.arange(0, ck.max() + 2))
    ref = ray.put((od, starts))

    def count_before(batch: pa.Table) -> pa.Table:
        dates, st = ray.get(ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = np.zeros(len(uid), dtype=np.int64)
        valid = uid < len(st) - 1
        for i in np.nonzero(valid)[0]:
            u = uid[i]
            seg = dates[st[u] : st[u + 1]]
            n[i] = np.searchsorted(seg, ts[i], side="right")
        return pa.table({"event_id": batch["event_id"], "n_before": pa.array(n)})

    return _collect(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(count_before, batch_format="pyarrow")
    )


# -- distinct / windowed / parsing shapes ------------------------------------


def distinct_users_by_type(sf_dir: str) -> pa.Table:
    """headers-inventory shape: count distinct values per key.
    Two-stage: dedup (event_type,user_id) pairs per batch + global
    groupby-dedup, then count per type."""
    from ray.data.aggregate import Count

    def pair_dedup(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False).astype(str)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(et, "\x00"), uid.astype(str))
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {"event_type": pa.array(et[idx], pa.string()), "user_id": pa.array(uid[idx])}
        )

    ds = _read(sf_dir, "events", ["event_type", "user_id"]).map_batches(pair_dedup, batch_format="pyarrow")
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    return _collect(out).select(["event_type", "n_users"])


def hourly_window(sf_dir: str) -> pa.Table:
    """tumbling-window shape: (user, hour-bucket) aggregate."""
    from ray.data.aggregate import Count, Sum

    def add_hour(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hour = ts // 3_600_000_000
        return pa.table({"user_id": batch["user_id"], "hour": pa.array(hour), "value": batch["value"]})

    out = (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(add_hour, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Sum("value", alias_name="total"), Count(alias_name="n"))
    )
    t = _collect(out)
    return pa.table(
        {
            "user_id": t["user_id"],
            "hour": t["hour"],
            "total": pa.array(round_away(t["total"].to_numpy(), 2)),
            "n": t["n"],
        }
    )


def props_bucket(sf_dir: str) -> pa.Table:
    """extras/JSON-parse shape: extract int from the props JSON string,
    bucket, count (vectorized Arrow regex)."""
    from ray.data.aggregate import Count

    def extract(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["props"], pattern=r"(?P<k>[0-9]+)")
        k = pc.struct_field(ex, "k").cast(pa.int32()).to_numpy(zero_copy_only=False)
        return pa.table({"k_mod": pa.array((k % 10).astype(np.int32))})

    return _collect(
        _read(sf_dir, "events", ["props"]).map_batches(extract, batch_format="pyarrow")
        .groupby("k_mod")
        .aggregate(Count(alias_name="n"))
    )


# -- documents / embeddings -------------------------------------------------


def token_count_table(sf_dir: str) -> pa.Table:
    from ..stages.textstats import token_counts

    return _collect(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(token_counts, batch_format="pyarrow")
    )


def quality_table(sf_dir: str) -> pa.Table:
    from ..stages.textstats import quality_scores

    t = _collect(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(quality_scores, batch_format="pyarrow")
    )
    return t.select(["doc_id", "avg_tok_len", "punct_ratio"])


def exact_dedup_table(sf_dir: str) -> pa.Table:
    from ..stages.dedup import exact_dedup

    return _collect(exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"])))


def knn_top10(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_bruteforce

    q = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))["embedding"]
        .to_pylist()[0]
    )
    t = knn_bruteforce(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), np.array(q), k=10)
    return pa.table({"vec_id": t["vec_id"], "rank": t["rank"].cast(pa.int64())})


def embedding_norms(sf_dir: str) -> pa.Table:
    def norm(batch: pa.Table) -> pa.Table:
        m = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table(
            {"vec_id": batch["vec_id"], "l2": pa.array(round_away(np.linalg.norm(m, axis=1), 4))}
        )

    return _collect(_read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(norm, batch_format="pyarrow"))


def embedding_dup_pairs_table(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    from ..stages.dedup import embedding_dup_pairs

    t = embedding_dup_pairs(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=threshold)
    return t.select(["id_a", "id_b"])
