"""Post-crawl analyzer battery — report tables as Ray Data aggregations.

The reference runs 17 ``Analyzer`` impls over the in-memory Status map
(/root/reference/src/analysis/; orchestration analysis/manager.rs:79-123).
Here every table is a Dataset aggregation over the visited parquet —
groupby/sort/limit shuffles over pruned columns, nothing driver-side
except the final tiny table.  Each function takes a ``ray.data.Dataset``
of visited rows (schema from stages/fetch.py) and returns a small
pyarrow Table.

Parity targets per table are cited on each function.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.numeric import round_away as _round_away
from ..types import ContentType


def _to_table(ds) -> pa.Table:
    from ..functions.agg import collect_blocks

    blocks = collect_blocks(ds)
    return pa.concat_tables(blocks) if blocks else None


def reference_percentile(values: np.ndarray, p: int) -> float:
    """basic_stats.rs:14-21 — rank = round_half_up(p/100·(n−1)), 3-decimal
    rounding of the selected element (half away from zero, like Rust
    f64::round and DuckDB round)."""
    if len(values) == 0:
        return 0.0
    v = np.sort(values)
    rank = int(math.floor((p / 100.0) * (len(v) - 1) + 0.5))
    return float(_round_away([v[min(rank, len(v) - 1)]], 3)[0])


def _with_rt_e5(batch: pa.Table) -> pa.Table:
    """Integer-scaled request time (round(rt·1e5)) so time SUMS are
    exact integer-valued doubles — float-summation order can then never
    flip a rounding boundary between the engine and the DuckDB oracle."""
    rt = batch["request_time"].to_numpy(zero_copy_only=False)
    return batch.append_column("rt_e5", pa.array(np.rint(rt * 1e5)))


def basic_stats(visited_ds) -> pa.Table:
    """BasicStats (basic_stats.rs:70-128): totals, min/max/avg request
    time, p90 of HTML-200 request times (nearest-rank).  Totals via the
    combiner global_agg (one partial row per block); the exact p90
    collects only the filtered request_time column."""
    from ..functions.agg import global_agg
    from ..functions.numeric import round_away

    agg = global_agg(
        visited_ds.select_columns(["size", "request_time"]).map_batches(
            _with_rt_e5, batch_format="pyarrow"
        ),
        [
            ("total_urls", None, "count"),
            ("total_size", "size", "sum"),
            ("sum_rt_e5", "rt_e5", "sum"),
            ("min_time", "request_time", "min"),
            ("max_time", "request_time", "max"),
        ],
    )
    from ..functions.agg import distributed_nearest_rank_percentile

    html = visited_ds.filter(
        expr=f"content_type == {ContentType.HTML} and status_code == 200"
    ).select_columns(["request_time"])
    # exact nearest-rank p90 without an O(n) driver pull: histogram
    # bisection at scale, single collect below the threshold
    v = distributed_nearest_rank_percentile(html, "request_time", 90)
    if v is None:
        v = distributed_nearest_rank_percentile(
            visited_ds.select_columns(["request_time"]), "request_time", 90
        )
    p90 = float(round_away([v], 3)[0]) if v is not None else 0.0

    def r3(v):
        return float(round_away([v], 3)[0])

    n = int(agg["total_urls"])
    return pa.table(
        {
            "total_urls": [n],
            "total_size": [int(agg["total_size"])],
            "total_requests_times": [r3(agg["sum_rt_e5"] / 100000.0)],
            "avg_time": [r3(agg["sum_rt_e5"] / 100000.0 / n)],
            "min_time": [r3(agg["min_time"])],
            "max_time": [r3(agg["max_time"])],
            "p90_time": [p90],
        }
    )


def count_by_status(visited_ds) -> pa.Table:
    """count_by_status (basic_stats.rs:77-93) — combiner partials, no
    all-to-all (status cardinality is tiny)."""
    from ..functions.agg import grouped_agg

    t = grouped_agg(visited_ds.select_columns(["status_code"]),
                    ["status_code"], [("n", None, "count")])
    return t.take(pc.sort_indices(t, sort_keys=[("status_code", "ascending")]))


def content_type_table(visited_ds) -> pa.Table:
    """ContentTypeAnalyzer table (content_type_analyzer.rs:36-230):
    per-content-type count / total size / avg request time (rounded 6,
    DuckDB half-away semantics for the oracle gate)."""
    from ..functions.agg import grouped_agg
    from ..functions.numeric import round_away

    t = grouped_agg(
        visited_ds.select_columns(["content_type", "size", "request_time"]).map_batches(
            _with_rt_e5, batch_format="pyarrow"
        ),
        ["content_type"],
        [("n", None, "count"), ("total_size", "size", "sum"), ("sum_rt_e5", "rt_e5", "sum")],
    )
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    t = pa.table(
        {
            "content_type": t["content_type"],
            "n": t["n"],
            "total_size": t["total_size"],
            "avg_time": pa.array(
                round_away(t["sum_rt_e5"].to_numpy(zero_copy_only=False) / 100000.0 / n, 6)
            ),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("content_type", "ascending")]))


def source_domains_table(visited_ds) -> pa.Table:
    """SourceDomainsAnalyzer (source_domains_analyzer.rs): per-host count
    + bytes."""
    from ..functions.agg import grouped_agg

    t = grouped_agg(visited_ds.select_columns(["host", "size"]),
                    ["host"], [("n", None, "count"), ("total_size", "size", "sum")])
    return t.take(pc.sort_indices(t, sort_keys=[("host", "ascending")]))


def fastest_table(visited_ds, k: int = 20, max_time: float | None = None) -> pa.Table:
    """FastestAnalyzer (fastest_analyzer.rs:46-64): HTML 200 rows,
    ascending request_time, top k — per-block partial top-k + tiny
    driver merge (no global sort shuffle for a k-row answer)."""
    from ..functions.agg import partial_topk

    ds = visited_ds.filter(expr=f"content_type == {ContentType.HTML} and status_code == 200")
    if max_time is not None:
        ds = ds.filter(expr=f"request_time <= {max_time}")
    ds = ds.select_columns(["url", "request_time"])
    return partial_topk(ds, k, ["request_time", "url"])


def slowest_table(visited_ds, k: int = 20, min_time: float | None = None,
                  max_time: float | None = None) -> pa.Table:
    """SlowestAnalyzer (slowest_analyzer.rs:19-44): HTML 200 rows with
    request_time in [min_time, max_time] (--slowest-urls-min-time /
    --slowest-urls-max-time; reference defaults 0.01 / 3.0 applied at
    the CLI), descending request_time, top k."""
    from ..functions.agg import partial_topk

    ds = visited_ds.filter(
        expr=f"content_type == {ContentType.HTML} and status_code == 200"
    )
    if min_time is not None:
        ds = ds.filter(expr=f"request_time >= {min_time}")
    if max_time is not None:
        ds = ds.filter(expr=f"request_time <= {max_time}")
    ds = ds.select_columns(["url", "request_time"])
    return partial_topk(ds, k, ["request_time", "url"], descending=[True, False])


def speed_table(visited_ds, k: int = 20) -> pa.Table:
    """Fastest + Slowest analyzers as one tagged table (``which`` ∈
    {fastest, slowest}) — the two top-k partials share the filtered
    Dataset."""
    f = fastest_table(visited_ds, k)
    s = slowest_table(visited_ds, k)
    return pa.table(
        {
            "which": pa.array(["fastest"] * f.num_rows + ["slowest"] * s.num_rows, pa.string()),
            "url": pa.concat_arrays(
                [f["url"].combine_chunks().cast(pa.string()),
                 s["url"].combine_chunks().cast(pa.string())]
            ),
            "request_time": pa.concat_arrays(
                [f["request_time"].combine_chunks(), s["request_time"].combine_chunks()]
            ),
        }
    )


def title_uniqueness_table(visited_ds, k: int = 10) -> pa.Table:
    """BestPracticeAnalyzer title-uniqueness (best_practice_analyzer.rs:
    615-863): non-unique titles, most-duplicated first.  Combiner
    partials (titles repeat heavily on real sites, so per-block
    partials stay small); for adversarially-unique title sets at 10⁹
    pages switch the final combine to ``ds.groupby``."""
    from ..functions.agg import grouped_agg

    ds = visited_ds.filter(
        expr=f"content_type == {ContentType.HTML} and status_code == 200"
    ).select_columns(["title"])
    t = grouped_agg(ds, ["title"], [("n", None, "count")])
    t = t.filter(pc.greater(t["n"], 1))
    t = t.take(pc.sort_indices(t, sort_keys=[("n", "descending"), ("title", "ascending")]))
    return t.slice(0, k)


def page404_table(visited_ds) -> pa.Table:
    """Page404Analyzer (page404_analyzer.rs): 404 rows + the page that
    linked them (broadcast uq_id→url lookup, no shuffle join — the
    visited-side dict is the small side per SURVEY §2.4)."""
    bad = _to_table(visited_ds.filter(expr="status_code == 404").select_columns(
        ["url", "source_uq_id"]
    ))
    if bad is None:
        return pa.table({"url": pa.array([], pa.string()), "found_on": pa.array([], pa.string())})
    lookup_t = _to_table(visited_ds.select_columns(["uq_id", "url"]))
    lut = dict(zip(lookup_t["uq_id"].to_pylist(), lookup_t["url"].to_pylist()))
    found_on = [lut.get(s, "") for s in bad["source_uq_id"].to_pylist()]
    t = pa.table({"url": bad["url"], "found_on": pa.array(found_on, pa.string())})
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def redirects_table(visited_ds) -> pa.Table:
    """RedirectsAnalyzer (redirects_analyzer.rs): 3xx rows with their
    redirect target (first span's media_ref — the Location analogue) and
    the page that linked them (broadcast uq_id→url lookup)."""
    red = _to_table(
        visited_ds.filter(expr="status_code >= 300 and status_code < 400").select_columns(
            ["url", "source_uq_id", "spans"]
        )
    )
    empty = pa.table(
        {"url": pa.array([], pa.string()), "target": pa.array([], pa.string()),
         "found_on": pa.array([], pa.string())}
    )
    if red is None:
        return empty
    spans = red["spans"].combine_chunks() if isinstance(red["spans"], pa.ChunkedArray) else red["spans"]
    targets = []
    for row in spans.to_pylist():
        targets.append(row[0]["media_ref"] if row else "")
    lookup_t = _to_table(visited_ds.select_columns(["uq_id", "url"]))
    lut = dict(zip(lookup_t["uq_id"].to_pylist(), lookup_t["url"].to_pylist()))
    found_on = [lut.get(s, "") for s in red["source_uq_id"].to_pylist()]
    t = pa.table(
        {"url": red["url"], "target": pa.array(targets, pa.string()),
         "found_on": pa.array(found_on, pa.string())}
    )
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def headers_inventory_table(visited_ds) -> pa.Table:
    """HeadersAnalyzer (headers_analyzer.rs:41-288): per-header
    occurrence count + distinct-value count.  Explode the header columns
    into (header, value) rows inside map_batches, then combiner partial
    agg (headers repeat heavily — tiny residue)."""
    HEADERS = ["content_type_header", "cache_control", "etag", "content_encoding"]

    def explode(batch: pa.Table) -> pa.Table:
        names, values = [], []
        for h in HEADERS:
            vals = batch[h].to_numpy(zero_copy_only=False)
            for v in vals:
                if v is not None and v != "":
                    names.append(h)
                    values.append(v)
        t = pa.table({"header": pa.array(names, pa.string()), "value": pa.array(values, pa.string())})
        # per-block partial: (header, value) → count
        return t.group_by(["header", "value"], use_threads=False).aggregate([([], "count_all")])

    parts = _to_table(visited_ds.select_columns(HEADERS).map_batches(explode, batch_format="pyarrow"))
    if parts is None:
        return pa.table({"header": pa.array([], pa.string()), "occurrences": pa.array([], pa.int64()),
                         "distinct_values": pa.array([], pa.int64())})
    merged = parts.group_by(["header", "value"], use_threads=False).aggregate([("count_all", "sum")])
    out = merged.group_by("header", use_threads=False).aggregate(
        [("count_all_sum", "sum"), ("value", "count")]
    )
    t = pa.table(
        {
            "header": out["header"],
            "occurrences": out["count_all_sum_sum"],
            "distinct_values": out["value_count"].cast(pa.int64()),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("header", "ascending")]))


def caching_table(visited_ds) -> pa.Table:
    """CachingAnalyzer (caching_analyzer.rs:33-385): cache classes per
    content type — parse headers → flags/lifetime (functions/cache.py)
    → groupby(content_type): counts of cacheable / no-store / with-etag
    + avg lifetime."""
    from ..functions.cache import add_cache_columns
    from ..types import CacheFlag

    def classify(batch: pa.Table) -> pa.Table:
        b = add_cache_columns(batch)
        flags = b["cache_type_flags"].to_numpy(zero_copy_only=False)
        life = b["cache_lifetime"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "content_type": b["content_type"],
                "cacheable": pa.array((flags & (CacheFlag.MAX_AGE | CacheFlag.S_MAXAGE)) > 0),
                "no_store": pa.array((flags & CacheFlag.NO_STORE) > 0),
                "has_etag": pa.array((flags & CacheFlag.HAS_ETAG) > 0),
                "lifetime": pa.array(np.nan_to_num(life.astype(np.float64), nan=0.0)),
            }
        )
        return t.group_by("content_type", use_threads=False).aggregate(
            [("cacheable", "sum"), ("no_store", "sum"), ("has_etag", "sum"),
             ("lifetime", "sum"), ([], "count_all")]
        )

    ds = visited_ds.select_columns(["content_type", "cache_control", "etag"])
    parts = _to_table(ds.map_batches(classify, batch_format="pyarrow"))
    if parts is None:  # empty crawl (ADVICE r1)
        return pa.table(
            {
                "content_type": pa.array([], pa.int8()),
                "n": pa.array([], pa.int64()),
                "cacheable": pa.array([], pa.int64()),
                "no_store": pa.array([], pa.int64()),
                "has_etag": pa.array([], pa.int64()),
                "avg_lifetime": pa.array([], pa.float64()),
            }
        )
    merged = parts.group_by("content_type", use_threads=False).aggregate(
        [("cacheable_sum", "sum"), ("no_store_sum", "sum"), ("has_etag_sum", "sum"),
         ("lifetime_sum", "sum"), ("count_all", "sum")]
    )
    n = merged["count_all_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    t = pa.table(
        {
            "content_type": merged["content_type"],
            "n": merged["count_all_sum"],
            "cacheable": merged["cacheable_sum_sum"],
            "no_store": merged["no_store_sum_sum"],
            "has_etag": merged["has_etag_sum_sum"],
            "avg_lifetime": pa.array(
                _round_away(
                    merged["lifetime_sum_sum"].to_numpy(zero_copy_only=False) / np.maximum(n, 1), 3
                )
            ),
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("content_type", "ascending")]))


def skipped_by_reason_table(skipped: pa.Table) -> pa.Table:
    """SkippedUrlsAnalyzer (skipped_urls_analyzer.rs): counts per reason."""
    if skipped.num_rows == 0:
        return pa.table({"reason": pa.array([], pa.int8()), "n": pa.array([], pa.int64())})
    counts = skipped.group_by("reason").aggregate([("reason", "count")])
    counts = counts.rename_columns(["reason", "n"])
    return counts.take(pc.sort_indices(counts, sort_keys=[("reason", "ascending")]))


def external_links_table(corpus_ds, seed_host: str, k_examples: int = 5) -> pa.Table:
    """ExternalLinksAnalyzer (external_links_analyzer.rs): group external
    link targets, occurrence count + up to 5 example source pages.
    Runs over the corpus spans (the per-page discovery stream).

    Fully vectorized classification: Arrow kernels decide which hrefs
    can be external (absolute/protocol-relative host ≠ seed host, or
    any href on an off-host page); only that small external subset goes
    through the per-row canonicalizer.  Aggregation is a per-block
    partial (count + 5 lexicographically-smallest example sources — a
    semilattice, so block partials merge exactly) + tiny driver
    combine; no pandas, no groupby shuffle."""
    from ..functions import urls as U

    seed_key = U.strip_www(seed_host.lower())

    def explode_external(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        link_mask = pc.and_(
            pc.equal(flat.field("kind"), "link"),
            pc.not_equal(flat.field("media_ref"), ""),
        )
        refs = flat.field("media_ref").filter(link_mask)
        doc_col = batch["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        srcs = doc_col.take(parent.filter(link_mask))
        if not len(refs):
            return pa.table({"url": pa.array([], pa.string()),
                             "source": pa.array([], pa.string())})
        trimmed = pc.utf8_trim(refs, "\"'\t ")
        # vectorized host classification
        host_abs = pc.extract_regex(trimmed, r"^[hH][tT][tT][pP][sS]?://(?P<h>[^/?#]+)")
        host_rel = pc.extract_regex(trimmed, r"^//(?P<h>[^/?#]+)")
        src_host = pc.extract_regex(srcs, r"^[hH][tT][tT][pP][sS]?://(?P<h>[^/?#]+)")

        def _hosts(struct_arr, base) -> np.ndarray:
            out = np.full(len(base), None, dtype=object)
            if struct_arr is not None:
                vals = pc.struct_field(struct_arr, "h").to_numpy(zero_copy_only=False)
                valid = pc.is_valid(struct_arr).to_numpy(zero_copy_only=False)
                out[valid] = vals[valid]
            return out

        h = _hosts(host_abs, trimmed)
        hr = _hosts(host_rel, trimmed)
        hs = _hosts(src_host, srcs)
        cand_host = np.where(h != None, h, np.where(hr != None, hr, hs))  # noqa: E711
        ext_mask = np.array(
            [c is not None and U.strip_www(str(c).split(":")[0].lower()) != seed_key
             for c in cand_host],
            dtype=bool,
        )
        # residual per-row canonicalize over the external subset only
        refs_np = refs.to_numpy(zero_copy_only=False)
        srcs_np = srcs.to_numpy(zero_copy_only=False)
        out_url, out_src = [], []
        for i in np.nonzero(ext_mask)[0]:
            c = U.canonicalize(U.normalize_href(refs_np[i]), srcs_np[i])
            if c is not None and not U.is_same_host(U.host_of(c), seed_host):
                out_url.append(c)
                out_src.append(srcs_np[i])
        t = pa.table({"url": pa.array(out_url, pa.string()), "source": pa.array(out_src, pa.string())})
        # per-block partial: url → count + k smallest distinct sources
        return _partial_external(t, k_examples)

    parts = _to_table(corpus_ds.map_batches(explode_external, batch_format="pyarrow"))
    if parts is None:
        return pa.table({"url": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                         "examples": pa.array([], pa.string())})
    # driver combine of the tiny partials: sum counts, merge example sets
    urls = parts["url"].to_numpy(zero_copy_only=False)
    ns = parts["n"].to_numpy(zero_copy_only=False)
    ex = parts["examples"].to_numpy(zero_copy_only=False)
    order = np.argsort(urls, kind="stable")
    urls, ns, ex = urls[order], ns[order], ex[order]
    starts = np.nonzero(np.concatenate([[True], urls[1:] != urls[:-1]]))[0]
    ends = np.append(starts[1:], len(urls))
    out_u, out_n, out_e = [], [], []
    for s, e in zip(starts, ends):
        out_u.append(urls[s])
        out_n.append(int(ns[s:e].sum()))
        merged = sorted(set(x for chunk in ex[s:e] for x in chunk.split(";") if x))
        out_e.append(";".join(merged[:k_examples]))
    t = pa.table({"url": pa.array(out_u, pa.string()), "n": pa.array(out_n, pa.int64()),
                  "examples": pa.array(out_e, pa.string())})
    return t.take(pc.sort_indices(t, sort_keys=[("n", "descending"), ("url", "ascending")]))


def _partial_external(t: pa.Table, k: int) -> pa.Table:
    """Block partial for external_links_table: (url, n, examples≤k)."""
    urls = t["url"].to_numpy(zero_copy_only=False)
    srcs = t["source"].to_numpy(zero_copy_only=False)
    if not len(urls):
        return pa.table({"url": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                         "examples": pa.array([], pa.string())})
    order = np.lexsort((srcs, urls))
    urls, srcs = urls[order], srcs[order]
    starts = np.nonzero(np.concatenate([[True], urls[1:] != urls[:-1]]))[0]
    ends = np.append(starts[1:], len(urls))
    out_u, out_n, out_e = [], [], []
    for s, e in zip(starts, ends):
        out_u.append(urls[s])
        out_n.append(int(e - s))
        seen, ex = set(), []
        for x in srcs[s:e]:
            if x not in seen:
                seen.add(x)
                ex.append(x)
                if len(ex) >= k:
                    break
        out_e.append(";".join(ex))
    return pa.table({"url": pa.array(out_u, pa.string()), "n": pa.array(out_n, pa.int64()),
                     "examples": pa.array(out_e, pa.string())})


def sitemap_urls(visited_ds, base_priority: float = 0.5,
                 priority_increase: float = 0.1) -> pa.Table:
    """SitemapExporter ordering (sitemap_exporter.rs:45-63): internal
    HTML-200 URLs sorted by slash count (trailing '/' trimmed) then
    lexicographic; priority = clamp(base + inc·(1−path_slashes), .1, 1)
    with base/inc from --sitemap-base-priority /
    --sitemap-priority-increase (core_options.rs:417-418 defaults)."""
    ds = visited_ds.filter(
        expr=f"content_type == {ContentType.HTML} and status_code == 200 and is_external == False"
        if "is_external" in visited_ds.schema().names
        else f"content_type == {ContentType.HTML} and status_code == 200"
    ).select_columns(["url"])
    t = _to_table(ds)
    if t is None:
        return pa.table({"url": pa.array([], pa.string()), "slashes": pa.array([], pa.int64()),
                         "priority": pa.array([], pa.float64())})
    urls = t["url"]
    trimmed = pc.utf8_rtrim(urls, characters="/")
    slashes = pc.count_substring(trimmed, "/")
    t = pa.table({"url": urls, "slashes": slashes.cast(pa.int64())})
    t = t.take(pc.sort_indices(t, sort_keys=[("slashes", "ascending"), ("url", "ascending")]))
    from urllib.parse import urlsplit

    base, inc = base_priority, priority_increase
    prio = [
        min(1.0, max(0.1, base + inc * (1.0 - urlsplit(u).path.count("/"))))
        for u in t["url"].to_pylist()
    ]
    return t.append_column("priority", pa.array(prio, pa.float64()))


def write_sitemap_xml(sitemap: pa.Table, path: str) -> None:
    """XML rendering (sitemap_exporter.rs:66-110), XML-escaped locs."""
    from xml.sax.saxutils import escape

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="https://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u, p in zip(sitemap["url"].to_pylist(), sitemap["priority"].to_pylist()):
        lines += ["  <url>", f"    <loc>{escape(u)}</loc>", f"    <priority>{p:.1f}</priority>", "  </url>"]
    lines.append("</urlset>")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_sitemap_txt(sitemap: pa.Table, path: str) -> str:
    """TXT sitemap (sitemap_exporter.rs:124-150): URLs joined by \\n, no
    trailing newline; a ``.txt`` extension is enforced like the
    reference does.  Returns the path actually written."""
    if not path.lower().endswith(".txt"):
        path = path + ".txt"
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(sitemap["url"].to_pylist()))
    return path


def page_findings(visited_ds) -> pa.Table:
    """Per-page analyzer findings (SEO/best-practice span checks adapted
    to the interleaved corpus — seo_opengraph_analyzer.rs:650-779 /
    best_practice_analyzer.rs:173-614 class of per-row checks), then a
    groupby summary.  Vectorized map_batches + combiner partials."""

    def check(batch: pa.Table) -> pa.Table:
        ok = pc.is_valid(batch["spans"])
        titles = batch["title"].to_numpy(zero_copy_only=False)
        descs = batch["description"].to_numpy(zero_copy_only=False)
        pages = ok.to_numpy(zero_copy_only=False)
        finding = np.full(len(titles), "ok", dtype=object)
        finding[pages & (titles == "")] = "missing-title"
        finding[pages & (titles != "") & (np.char.str_len(titles.astype(str)) > 60)] = "long-title"
        finding[pages & (descs == "")] = "missing-description"
        finding[~pages] = "non-page"
        return pa.table({"finding": pa.array(finding, pa.string())})

    from ..functions.agg import grouped_agg

    t = grouped_agg(
        visited_ds.map_batches(check, batch_format="pyarrow"), ["finding"], [("n", None, "count")]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("finding", "ascending")]))


def modern_support_table(visited_ds) -> pa.Table:
    """Brotli / WebP / AVIF adoption checks
    (best_practice_analyzer.rs:864-960): internal HTML-200 pages
    without Brotli content-encoding; image responses served as
    image/webp / image/avif.  Combiner partials over header columns."""
    from ..functions.agg import grouped_agg

    def classify(batch: pa.Table) -> pa.Table:
        ct = batch["content_type"].to_numpy(zero_copy_only=False)
        status = batch["status_code"].to_numpy(zero_copy_only=False)
        enc = batch["content_encoding"].to_numpy(zero_copy_only=False)
        cth = batch["content_type_header"].to_numpy(zero_copy_only=False)
        html = (ct == ContentType.HTML) & (status == 200)
        img = ct == ContentType.IMAGE
        checks, ok = [], []
        for i in range(len(ct)):
            if html[i]:
                checks.append("brotli-support")
                ok.append(enc[i] == "br")
            elif img[i]:
                checks.append("webp-support")
                ok.append(cth[i] == "image/webp")
                checks.append("avif-support")
                ok.append(cth[i] == "image/avif")
        return pa.table({"check": pa.array(checks, pa.string()),
                         "ok": pa.array(np.array(ok, dtype=np.int64))})

    ds = visited_ds.select_columns(
        ["content_type", "status_code", "content_encoding", "content_type_header"]
    ).map_batches(classify, batch_format="pyarrow")
    t = grouped_agg(ds, ["check"], [("n", None, "count"), ("n_ok", "ok", "sum")])
    t = pa.table({
        "check": t["check"],
        "n": t["n"],
        "n_ok": t["n_ok"],
        "n_missing": pc.subtract(t["n"], t["n_ok"]),
    })
    return t.take(pc.sort_indices(t, sort_keys=[("check", "ascending")]))
