"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline over the interleaved-span
corpus derived deterministically from ``/root/testdata/sf0.001``;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 plus the training-data additions; ``oracle_sql()`` gives
the DuckDB-checkable subset (same column names; rounded floats use
round-half-away on both sides; top-k queries carry deterministic
tie-breaks).  Crawl/minhash/simhash/IVF/fingerprint/langid entries are
not SQL-expressible → rows-only checks.

Ray is initialised by the driver — nothing here calls ray.init().
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

_CORPUS_CACHE: dict[str, str] = {}


def _corpus_for(sf_dir: str) -> tuple[str, list[str], dict[str, str]]:
    """Build (once per sf_dir) the interleaved corpus + seeds derived from
    the testdata documents table; cache under /tmp."""
    from siteone_crawler_ray.sources.corpus import (
        GENERATOR_VERSION,
        interleaved_from_testdata,
        write_corpus,
    )

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join("/tmp", f"graft_corpus_{key}_b128_v{GENERATOR_VERSION}")

    tabs = interleaved_from_testdata(sf_dir)
    if key not in _CORPUS_CACHE:
        if not os.path.exists(os.path.join(path, "_meta.json")):
            write_corpus(tabs["documents"], path, num_buckets=128)
        _CORPUS_CACHE[key] = path
    seeds = tabs["seeds"]["url"].to_pylist()
    return path, seeds, {}


_CRAWL_RESULTS: dict[str, Any] = {}


def _crawl_for(sf_dir: str):
    """Crawl once per sf_dir per process; report queries share the result."""
    if sf_dir not in _CRAWL_RESULTS:
        _CRAWL_RESULTS[sf_dir] = _run_crawl(sf_dir)
    return _CRAWL_RESULTS[sf_dir]


def _visited_ds(res, columns=None):
    """Visited table as a multi-block Dataset for the report stages."""
    import ray.data as rd

    t = res.visited_table(columns=columns)
    step = max(1, -(-t.num_rows // 16))
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


def _run_crawl(sf_dir: str):
    from siteone_crawler_ray.pipelines.crawl import CrawlConfig, EpochCrawler

    path, seeds, robots = _corpus_for(sf_dir)
    key = os.path.basename(path)
    workdir = os.path.join("/tmp", f"graft_crawl_{key}")
    import shutil

    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    # multi-host corpus: allow all hosts via the reference's
    # --allowed-domain wildcard semantics (crawler.rs:1871-1880)
    cfg = CrawlConfig(num_shards=8,
                      allowed_domains_crawl=("*",), allowed_domains_static=("*",),
                      max_visited_urls=10_000_000, max_queue_length=10_000_000)
    return EpochCrawler(path, seeds, robots, workdir, cfg).run()


def entry() -> Any:
    """Flagship: epoch crawl over the sf0.001-derived interleaved corpus →
    visited dataset (ordered by canonical crawl seq)."""
    import ray.data as rd

    res = _run_crawl("/root/testdata/sf0.001")
    t = res.visited_table(
        columns=["seq", "uq_id", "url", "url_key", "host", "depth", "source_uq_id",
                 "source_attr", "status_code", "content_type", "request_time", "size",
                 "epoch", "title"]
    )
    return rd.from_arrow(t)


def queries() -> dict[str, Callable[[str], Any]]:
    from siteone_crawler_ray.pipelines import relational as R

    def crawl_visited(sf_dir: str):
        res = _crawl_for(sf_dir)
        return res.visited_table(
            columns=["seq", "uq_id", "url", "depth", "source_attr", "status_code",
                     "content_type", "epoch"]
        )

    def flat_visit_stats(sf_dir: str):
        """pure-Ray-Data url-list crawl: stream every corpus URL through
        the fetch actor pool, aggregate by (status, content_type)."""
        import pyarrow as pa
        import ray.data as rd

        from siteone_crawler_ray.functions.agg import grouped_agg
        from siteone_crawler_ray.pipelines.flat import flat_crawl

        path, seeds, _ = _corpus_for(sf_dir)
        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        docs = interleaved_from_testdata(sf_dir)["documents"]
        t = pa.table({"url": docs["doc_id"]})
        step = max(1, -(-t.num_rows // 16))
        urls = rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])
        ds = flat_crawl(path, urls, concurrency=4).select_columns(["status_code", "content_type"])
        return grouped_agg(ds, ["status_code", "content_type"], [("n", None, "count")])

    def crawl_span_kinds(sf_dir: str):
        """span-explosion operator: count exploded link/asset spans by kind."""
        import ray.data as rd
        import pyarrow.compute as pc
        import pyarrow as pa

        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        tabs = interleaved_from_testdata(sf_dir)

        def kinds(batch: pa.Table) -> pa.Table:
            spans = batch["spans"]
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            flat = pc.list_flatten(spans)
            return pa.table({"kind": flat.field("kind")})

        from ray.data.aggregate import Count

        ds = rd.from_arrow(tabs["documents"]).map_batches(kinds, batch_format="pyarrow")
        return ds.groupby("kind").aggregate(Count(alias_name="n"))

    def minhash_pairs(sf_dir: str):
        import ray.data as rd
        import os as _os

        from siteone_crawler_ray.stages.dedup import minhash_dedup_pairs

        ds = rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"], override_num_blocks=32)
        return minhash_dedup_pairs(ds, threshold=0.5)

    def simhash_table(sf_dir: str):
        import ray.data as rd
        import os as _os

        from siteone_crawler_ray.stages.dedup import simhash_batch

        import pyarrow as pa

        def signed(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "simhash": pa.array(b["simhash"].to_numpy(zero_copy_only=False).view("int64")),
                }
            )

        return rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"], override_num_blocks=32).map_batches(
            simhash_batch, batch_format="pyarrow"
        ).map_batches(signed, batch_format="pyarrow")

    def fingerprint_table(sf_dir: str):
        import ray.data as rd
        import os as _os
        import pyarrow as pa

        from siteone_crawler_ray.stages.textstats import fingerprints

        def signed(b: pa.Table) -> pa.Table:
            import numpy as np

            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "fingerprint": pa.array(b["fingerprint"].to_numpy(zero_copy_only=False).view("int64")),
                    "winnow_min": pa.array(b["winnow_min"].to_numpy(zero_copy_only=False).view("int64")),
                }
            )

        return rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"], override_num_blocks=32).map_batches(
            fingerprints, batch_format="pyarrow"
        ).map_batches(signed, batch_format="pyarrow")

    def langid_table(sf_dir: str):
        import ray.data as rd
        import os as _os

        from siteone_crawler_ray.stages.textstats import langid

        return rd.read_parquet(_os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"], override_num_blocks=32).map_batches(
            langid, batch_format="pyarrow"
        )

    def ivf_knn(sf_dir: str):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data as rd
        import os as _os

        from siteone_crawler_ray.stages.similarity import knn_ivf

        q = (
            pq.read_table(_os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
            .filter(pc.equal(pc.field("vec_id"), 0))["embedding"]
            .to_pylist()[0]
        )
        t = knn_ivf(
            rd.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"], override_num_blocks=16),
            np.array(q),
            k=10,
        )
        return pa.table({"vec_id": t["vec_id"], "rank": t["rank"].cast(pa.int64())})

    def lsh_knn(sf_dir: str):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data as rd
        import os as _os

        from siteone_crawler_ray.stages.similarity import knn_lsh

        q = (
            pq.read_table(_os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
            .filter(pc.equal(pc.field("vec_id"), 0))["embedding"]
            .to_pylist()[0]
        )
        t = knn_lsh(
            rd.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"], override_num_blocks=16),
            np.array(q), k=10,
        )
        return pa.table({"vec_id": t["vec_id"], "rank": t["rank"].cast(pa.int64())})

    def media_audio_energy(sf_dir: str):
        import ray.data as rd

        from siteone_crawler_ray.stages.multimodal import (
            AudioFrameSampleStage,
            decode_pipeline,
            synthesize_media_table,
        )

        return decode_pipeline(rd.from_arrow(synthesize_media_table(128)), "audio",
                               AudioFrameSampleStage, concurrency=2)

    def media_video_frames(sf_dir: str):
        import ray.data as rd

        from siteone_crawler_ray.stages.multimodal import (
            VideoFrameSampleStage,
            decode_pipeline,
            synthesize_media_table,
        )

        return decode_pipeline(rd.from_arrow(synthesize_media_table(128)), "video",
                               VideoFrameSampleStage, concurrency=2).drop_columns(["frame"])

    def media_decode(sf_dir: str):
        import ray.data as rd

        from siteone_crawler_ray.stages.multimodal import (
            ImageDecodeStage,
            decode_pipeline,
            synthesize_media_table,
        )

        return decode_pipeline(rd.from_arrow(synthesize_media_table(128)), "image", ImageDecodeStage,
                               concurrency=2).drop_columns(["features"])

    from siteone_crawler_ray.pipelines import reports as RP

    def _rq(fn, columns=None, **kw):
        def q(sf_dir: str):
            res = _crawl_for(sf_dir)
            return fn(_visited_ds(res, columns=columns), **kw)
        return q

    def report_external_links(sf_dir: str):
        import ray.data as rd

        from siteone_crawler_ray.pipelines.reports import external_links_table
        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        tabs = interleaved_from_testdata(sf_dir)
        docs = tabs["documents"]
        step = max(1, -(-docs.num_rows // 16))
        ds = rd.from_arrow([docs.slice(i, step) for i in range(0, docs.num_rows, step)])
        seed_host = tabs["seeds"]["url"].to_pylist()[0].split("/")[2]
        return external_links_table(ds, seed_host)

    def json_report(sf_dir: str):
        """full 8-key JSON report → (key, size) summary table."""
        import os as _os

        import pyarrow as pa

        from siteone_crawler_ray.pipelines.report_json import write_report_json

        res = _crawl_for(sf_dir)
        path = _os.path.join("/tmp", f"graft_report_{_os.path.basename(sf_dir)}.json")
        rep = write_report_json(res, _visited_ds(res), path)
        return pa.table({
            "key": pa.array(sorted(rep)),
            "n": pa.array([len(rep[k]) if hasattr(rep[k], "__len__") else 1 for k in sorted(rep)],
                          pa.int64()),
        })

    def report_skipped(sf_dir: str):
        return RP.skipped_by_reason_table(_crawl_for(sf_dir).skipped)

    def report_basic_stats(sf_dir: str):
        return RP.basic_stats(_visited_ds(_crawl_for(sf_dir)))

    def markdown_pages(sf_dir: str):
        import ray.data as rd
        from siteone_crawler_ray.stages.export import spans_to_markdown

        res = _crawl_for(sf_dir)
        return _visited_ds(res, columns=["url", "spans"]).map_batches(
            spans_to_markdown, batch_format="pyarrow"
        )

    def html_markdown(sf_dir: str):
        """live-HTML→Markdown conversion (html_to_markdown.rs analogue)
        over rendered corpus pages."""
        import pyarrow as pa
        import ray.data as rd

        from siteone_crawler_ray.functions.html_extract import spans_to_html
        from siteone_crawler_ray.functions.html_markdown import html_to_markdown_batch
        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        docs = interleaved_from_testdata(sf_dir)["documents"]

        def render(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch["doc_id"],
                "body": pa.array([spans_to_html(r) for r in batch["spans"].to_pylist()], pa.string()),
            })

        step = max(1, -(-docs.num_rows // 16))
        ds = rd.from_arrow([docs.slice(i, step) for i in range(0, docs.num_rows, step)])
        return ds.map_batches(render, batch_format="pyarrow").map_batches(
            html_to_markdown_batch, batch_format="pyarrow"
        )

    def offline_paths(sf_dir: str):
        from siteone_crawler_ray.stages.export import add_offline_paths

        res = _crawl_for(sf_dir)
        return _visited_ds(res, columns=["url"]).map_batches(
            add_offline_paths, batch_format="pyarrow"
        )

    def quality_score_gate(sf_dir: str):
        import pyarrow as pa
        from siteone_crawler_ray.pipelines import scoring as SC

        res = _crawl_for(sf_dir)
        findings = SC.findings_from_reports(
            RP.page_findings(_visited_ds(res)),
            RP.count_by_status(_visited_ds(res)),
        )
        rep = SC.score(findings)
        code, violations = SC.ci_gate(rep, findings, n_404=0, cfg=SC.CiGateConfig(min_quality_score=0.0))
        return pa.table({
            "category": pa.array(sorted(rep.scores) + ["total", "exit_code"]),
            "value": pa.array([rep.scores[k] for k in sorted(rep.scores)] + [rep.total, float(code)]),
        })

    def html_link_extract(sf_dir: str):
        """live-HTML mode: render corpus docs to HTML, run the regex
        battery (functions/html_extract.py), count per source_attr."""
        import pyarrow as pa
        import ray.data as rd

        from siteone_crawler_ray.functions.html_extract import html_extract_batch, spans_to_html
        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        tabs = interleaved_from_testdata(sf_dir)

        def render(batch: pa.Table) -> pa.Table:
            spans = batch["spans"].to_pylist()
            return pa.table({
                "url": batch["doc_id"],
                "body": pa.array([spans_to_html(r) for r in spans], pa.string()),
            })

        from ray.data.aggregate import Count

        docs = tabs["documents"]
        step = max(1, -(-docs.num_rows // 16))
        ds = rd.from_arrow([docs.slice(i, step) for i in range(0, docs.num_rows, step)])
        return (
            ds.map_batches(render, batch_format="pyarrow")
            .map_batches(html_extract_batch, batch_format="pyarrow")
            .groupby("source_attr")
            .aggregate(Count(alias_name="n"))
        )

    def page_checks(sf_dir: str):
        """§2.10 SEO/accessibility analyzers over rendered corpus HTML →
        finding-count summary."""
        import pyarrow as pa
        import ray.data as rd

        from siteone_crawler_ray.functions.html_extract import spans_to_html
        from siteone_crawler_ray.functions.page_checks import findings_summary, page_checks_batch
        from siteone_crawler_ray.sources.corpus import interleaved_from_testdata

        docs = interleaved_from_testdata(sf_dir)["documents"]

        def render(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch["doc_id"],
                "body": pa.array([spans_to_html(r) for r in batch["spans"].to_pylist()], pa.string()),
            })

        step = max(1, -(-docs.num_rows // 16))
        ds = rd.from_arrow([docs.slice(i, step) for i in range(0, docs.num_rows, step)])
        return findings_summary(
            ds.map_batches(render, batch_format="pyarrow").map_batches(
                page_checks_batch, batch_format="pyarrow"
            )
        )

    return {
        # live-HTML regex battery (SURVEY §2.2) — rows-only
        "html_link_extract": html_link_extract,
        "page_checks": page_checks,
        # post-crawl analyzer battery (SURVEY §2.5, §2.10) — rows-only
        "report_basic_stats": report_basic_stats,
        "report_status_counts": _rq(RP.count_by_status),
        "report_content_types": _rq(RP.content_type_table),
        "report_source_domains": _rq(RP.source_domains_table),
        "report_fastest": _rq(RP.fastest_table),
        "report_slowest": _rq(RP.slowest_table),
        "report_title_dups": _rq(RP.title_uniqueness_table),
        "report_404": _rq(RP.page404_table),
        "report_redirects": _rq(RP.redirects_table),
        "report_headers": _rq(RP.headers_inventory_table),
        "report_caching": _rq(RP.caching_table),
        "report_sitemap": _rq(RP.sitemap_urls),
        "report_findings": _rq(RP.page_findings),
        "report_skipped": report_skipped,
        "report_external_links": report_external_links,
        "json_report": json_report,
        "markdown_pages": markdown_pages,
        "html_markdown": html_markdown,
        "offline_paths": offline_paths,
        "quality_score_gate": quality_score_gate,
        # groupby-agg report shapes (SURVEY §2.5)
        "pricing_summary": R.pricing_summary,
        "global_stats": R.global_stats,
        "count_by_type": R.count_by_type,
        "lang_counts": R.lang_counts,
        "source_stats": R.source_stats,
        "returned_by_supplier": R.returned_by_supplier,
        "label_counts": R.label_counts,
        # sort / top-k / percentile shapes (SURVEY §2.6)
        "fastest_topk": R.fastest_topk,
        "slowest_topk": R.slowest_topk,
        "p90_by_type": R.p90_by_type,
        # join / lookup shapes (SURVEY §2.4)
        "segment_join": R.segment_join,
        "range_join_count": R.range_join_count,
        "top_order_per_segment": R.top_order_per_segment,
        "customers_without_events": R.customers_without_events,
        "supplier_part_stats": R.supplier_part_stats,
        # distinct / window / parse shapes (SURVEY §2.5, §2.9)
        "distinct_users_by_type": R.distinct_users_by_type,
        "hourly_window": R.hourly_window,
        "session_windows": R.session_windows,
        "props_bucket": R.props_bucket,
        # training-data ops over documents/embeddings
        "exact_dedup": R.exact_dedup_table,
        "token_counts": R.token_count_table,
        "quality_scores": R.quality_table,
        "knn_top10": R.knn_top10,
        "embedding_norms": R.embedding_norms,
        "embedding_dup_pairs": R.embedding_dup_pairs_table,
        # non-SQL-expressible (rows-only checks)
        "minhash_pairs": minhash_pairs,
        "simhash_table": simhash_table,
        "fingerprint_table": fingerprint_table,
        "langid_table": langid_table,
        "ivf_knn": ivf_knn,
        "lsh_knn": lsh_knn,
        "media_decode": media_decode,
        "media_audio_energy": media_audio_energy,
        "media_video_frames": media_video_frames,
        "crawl_visited": crawl_visited,
        "flat_visit_stats": flat_visit_stats,
        "crawl_span_kinds": crawl_span_kinds,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(avg(l_extendedprice), 6) AS avg_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "global_stats": """
            SELECT count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(min(l_extendedprice), 3) AS min_price,
                   round(max(l_extendedprice), 3) AS max_price,
                   round(avg(l_extendedprice), 6) AS avg_price
            FROM lineitem
        """,
        "count_by_type": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "source_stats": """
            SELECT source, count(*) AS n, round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY source
        """,
        "returned_by_supplier": """
            SELECT l_suppkey, count(*) AS n FROM lineitem
            WHERE l_returnflag = 'R' GROUP BY l_suppkey
        """,
        "label_counts": "SELECT label, count(*) AS n FROM embeddings GROUP BY label",
        "fastest_topk": "SELECT event_id, value FROM events ORDER BY value, event_id LIMIT 20",
        "slowest_topk": "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 20",
        "p90_by_type": """
            WITH s AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS r,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events)
            SELECT event_type, round(value, 3) AS p90
            FROM s WHERE r = CAST(floor(0.9 * (n - 1) + 0.5) AS BIGINT)
        """,
        "segment_join": """
            SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_order_per_segment": """
            SELECT c_mktsegment, o_orderkey, total FROM (
              SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS total,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3
        """,
        "customers_without_events": """
            SELECT DISTINCT o_custkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
        """,
        "supplier_part_stats": """
            SELECT s_nationkey, p_brand, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                          JOIN part ON l_partkey = p_partkey
            GROUP BY s_nationkey, p_brand
        """,
        "range_join_count": """
            SELECT e.event_id, count(o.o_orderkey) AS n_before
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "distinct_users_by_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "hourly_window": """
            SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                   round(sum(value), 2) AS total, count(*) AS n
            FROM events GROUP BY user_id, hour
        """,
        "session_windows": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
              FROM o)
            SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
                   round(epoch(max(ts)) - epoch(min(ts)), 3) AS duration_sec
            FROM s GROUP BY user_id, session_no
        """,
        "props_bucket": """
            SELECT CAST(regexp_extract(props, '[0-9]+') AS INTEGER) % 10 AS k_mod,
                   count(*) AS n
            FROM events GROUP BY k_mod
        """,
        "exact_dedup": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "token_counts": "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
        "quality_scores": """
            SELECT doc_id,
                   round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_tok_len,
                   round(CAST(length(text)
                         - length(replace(replace(replace(replace(text, '.', ''), ',', ''), '!', ''), '?', ''))
                         AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio
            FROM documents
        """,
        "knn_top10": """
            SELECT vec_id, rank FROM (
              SELECT vec_id, row_number() OVER (
                ORDER BY list_cosine_similarity(embedding,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id) AS rank
              FROM embeddings) WHERE rank <= 10
        """,
        "embedding_norms": """
            SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2
            FROM embeddings
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        """,
    }
