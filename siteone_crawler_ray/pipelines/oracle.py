"""Reference-semantics oracle — sequential FIFO reimplementation.

A single-threaded Python model of the reference crawl loop
(/root/reference/src/engine/crawler.rs:222-391, 1018-1306) under the
canonical ordering contract (SURVEY.md §3.2): FIFO VecDeque, dedup at
enqueue on the canonical URL key, per-page first-occurrence link order
= span order, robots + host + length + cap checks in the reference's
order.  Shares the exact same scalar primitives the engine uses
(canonicalize / robots / synthetic responses / xxh64), so any
engine-oracle mismatch isolates a pipeline bug, not a kernel bug.

The non-200 basename guard supports both semantics:
- ``"sequential"`` — the reference's counter updated per response,
- ``"epoch"`` — the engine's deterministic epoch-consistent variant
  (blocklist refreshed at wave boundaries); tests run the engine
  against this mode (SURVEY.md §7.5 documents the refinement).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions import urls as U
from ..functions.hashing import uq_id, xxh64
from ..functions.robots import RobotsIndex
from ..stages.extract import FILE_EXT_RE, FONT_EXT_RE, HTML_PAGE_EXT_RE
from ..pipelines.crawl import CrawlConfig
from ..stages.fetch import synthetic_status
from ..types import SPAN_KIND_TO_SOURCE, SkippedReason, UrlSource


@dataclass
class OracleResult:
    visited: list[dict] = field(default_factory=list)
    skipped: list[dict] = field(default_factory=list)
    seen_keys: set[int] = field(default_factory=set)

    def visited_table(self) -> pa.Table:
        return pa.table(
            {
                "seq": pa.array([v["seq"] for v in self.visited], pa.int64()),
                "uq_id": pa.array([v["uq_id"] for v in self.visited], pa.string()),
                "url": pa.array([v["url"] for v in self.visited], pa.string()),
                "source_uq_id": pa.array([v["source_uq_id"] for v in self.visited], pa.string()),
                "source_attr": pa.array([v["source_attr"] for v in self.visited], pa.int8()),
                "epoch": pa.array([v["epoch"] for v in self.visited], pa.int32()),
                "status_code": pa.array([v["status_code"] for v in self.visited], pa.int32()),
                "depth": pa.array([v["depth"] for v in self.visited], pa.int32()),
            }
        )


def run_oracle(
    documents: pa.Table,
    seeds: list[str],
    robots_bodies: dict[str, str],
    config: CrawlConfig | None = None,
    basename_guard: str = "epoch",
    seed_attrs: list[int] | None = None,
) -> OracleResult:
    cfg = config or CrawlConfig()
    robots = RobotsIndex.from_bodies(robots_bodies)
    docs: dict[str, list[dict]] = {}
    for d, spans in zip(documents["doc_id"].to_pylist(), documents["spans"].to_pylist()):
        docs[d] = spans

    seed_host = U.host_of(seeds[0]) if seeds else ""
    sitemap_only = bool(seeds and U.is_sitemap_url(seeds[0]))
    res = OracleResult()
    queue: deque[dict] = deque()
    skipped_keys: set[int] = set()
    import re

    include = [re.compile(p) for p in cfg.include_regex]
    ignore = [re.compile(p) for p in cfg.ignore_regex]
    from ..stages.export import UrlTransforms

    transforms = UrlTransforms(cfg.transform_url)
    allowed_crawl = [U.compile_wildcard_domain(p) for p in cfg.allowed_domains_crawl]
    allowed_static = [U.compile_wildcard_domain(p) for p in cfg.allowed_domains_static]
    basename_active: dict[str, int] = {}
    basename_pending: dict[str, int] = {}
    current_epoch = 0

    def blocked_basename(b: str | None) -> bool:
        return b is not None and basename_active.get(b, 0) >= cfg.max_non200_per_basename

    def bump_basename(b: str | None) -> None:
        if b is None:
            return
        tgt = basename_active if basename_guard == "sequential" else basename_pending
        tgt[b] = tgt.get(b, 0) + 1

    # -- seeding (add_url_to_queue semantics) --------------------------------
    for order, s in enumerate(seeds):
        c = U.canonicalize(s, s, remove_query_params=cfg.remove_query_params,
                           keep_query_params=cfg.keep_query_params)
        if c is None or len(c) > cfg.max_url_length:
            continue
        k = xxh64(c)
        if k in res.seen_keys:
            continue
        if len(queue) + len(res.visited) >= cfg.max_visited_urls:
            break
        if len(queue) >= cfg.max_queue_length:
            break
        res.seen_keys.add(k)
        queue.append(
            dict(url=c, key=k, depth=0, epoch=0, source_uq_id="",
                 source_attr=(seed_attrs[order] if seed_attrs else UrlSource.INIT_URL))
        )

    # -- FIFO loop -----------------------------------------------------------
    while queue:
        e = queue.popleft()
        if e["epoch"] != current_epoch:
            current_epoch = e["epoch"]
            for b, c in basename_pending.items():
                basename_active[b] = basename_active.get(b, 0) + c
            basename_pending.clear()
        url = e["url"]
        in_corpus = url in docs
        first = docs[url][0] if in_corpus and docs[url] else None
        is_redirect = bool(first and first["kind"] == "redirect")
        error_code = int(first["text"]) if first and first["kind"] == "error" else 0
        status, ctype = synthetic_status(in_corpus, url, is_redirect, error_code)
        res.visited.append(
            dict(
                seq=len(res.visited),
                uq_id=uq_id(url),
                url=url,
                source_uq_id=e["source_uq_id"],
                source_attr=e["source_attr"],
                epoch=e["epoch"],
                status_code=status,
                content_type=ctype,
                depth=e["depth"],
            )
        )
        if status != 200:
            bump_basename(U.basename_of(url))
        if not in_corpus:
            continue

        # --single-foreign-page: a page on a different 2nd-level domain
        # than the initial URL is fetched but never expanded
        # (html_processor.rs:179-182); its Location redirect still
        # follows (crawler.rs:733-755 is outside the extraction gating)
        foreign_page = bool(
            cfg.single_foreign_page and seeds
            and U.domain_2nd_level(U.host_of(url))
            != U.domain_2nd_level(U.host_of(seeds[0]))
        )
        # link extraction in span order with per-page first-occurrence dedup
        page_seen: set[str] = set()
        for span in docs[url]:
            ref = span["media_ref"]
            if not ref:
                continue
            if foreign_page and span["kind"] != "redirect":
                continue
            # sitemap-only: non-XML pages never parse (crawler.rs:873-876)
            if sitemap_only and span["kind"] != "redirect" and not U.is_xml_url(url):
                continue
            # --disable-* span gating happens BEFORE the per-page dedup
            # (a disabled extractor never adds the URL to found_urls, so
            # a later enabled span with the same href still wins); a
            # --single-page crawl disables href extraction entirely
            # (html_processor.rs:781)
            if span["kind"] in cfg.disabled_span_kinds:
                continue
            if cfg.single_page and span["kind"] == "link":
                continue
            # --disable-files: a-href targets with a non-HTML file
            # extension are never found (html_processor.rs:193);
            # --disable-fonts: font refs never found (find_fonts is the
            # only font source) — both BEFORE the per-page dedup
            if (cfg.disable_files and span["kind"] == "link"
                    and FILE_EXT_RE.search(ref) and not HTML_PAGE_EXT_RE.search(ref)):
                continue
            if cfg.disable_fonts and FONT_EXT_RE.search(ref):
                continue
            norm = U.normalize_href(ref)
            if norm in page_seen:
                continue
            page_seen.add(norm)
            src_attr = SPAN_KIND_TO_SOURCE.get(span["kind"], 10)

            # ---- gauntlet (crawler.rs:1018-1187 order) ----
            if not U.is_requestable_resource(ref):
                continue
            canon = U.canonicalize(norm, url)
            if canon is None:
                continue
            host = U.host_of(canon)
            same = U.is_same_host(host, seed_host)
            allowed = False
            if not same and host != seed_host:
                is_asset = span["kind"] != "link"
                if is_asset and any(p.match(host) for p in allowed_static):
                    allowed = True
                if any(p.match(host) for p in allowed_crawl):
                    allowed = True
            if blocked_basename(U.basename_of(canon)):
                continue
            if not same and not allowed:
                k = xxh64(canon)
                if k not in skipped_keys:
                    skipped_keys.add(k)
                    res.skipped.append(
                        dict(url=canon, url_key=k, reason=SkippedReason.NOT_ALLOWED_HOST,
                             source_uq_id=uq_id(url), source_attr=src_attr)
                    )
                continue
            if not cfg.ignore_robots_txt and not U.is_static_file(canon):
                rules = robots.by_host.get(host)
                if rules is not None and not rules.is_allowed(norm):
                    k = xxh64(canon)
                    if k not in skipped_keys:
                        skipped_keys.add(k)
                        res.skipped.append(
                            dict(url=canon, url_key=k, reason=SkippedReason.ROBOTS_TXT,
                                 source_uq_id=uq_id(url), source_attr=src_attr)
                        )
                    continue
            if cfg.max_depth is not None and e["depth"] + 1 > cfg.max_depth:
                k = xxh64(canon)
                if k not in skipped_keys:
                    skipped_keys.add(k)
                    res.skipped.append(
                        dict(url=canon, url_key=k, reason=SkippedReason.EXCEEDS_MAX_DEPTH,
                             source_uq_id=uq_id(url), source_attr=src_attr)
                    )
                continue
            final = U.canonicalize(
                norm, url, remove_query_params=cfg.remove_query_params,
                keep_query_params=cfg.keep_query_params,
            )
            # force-relative folding after query filter, before
            # suitability (crawler.rs:1158-1164)
            if final is not None and cfg.force_relative_urls and seeds:
                from urllib.parse import urlsplit as _us

                sp = _us(seeds[0])
                final = U.normalize_url_to_initial(final, sp.scheme or "https", sp.hostname or "")
            if final is None or len(final) > cfg.max_url_length:
                continue
            # --regex-filtering-only-for-pages: static files bypass the
            # include/ignore regexes (crawler.rs:1316-1318)
            regex_bypass = cfg.regex_filtering_only_for_pages and U.is_static_file(canon)
            if include and not regex_bypass and not any(p.search(final) for p in include):
                continue
            if ignore and not regex_bypass and any(p.search(final) for p in ignore):
                continue
            if transforms.rules:
                final = transforms.apply_one(final)
            # suitability + enqueue caps (crawler.rs:1219-1306)
            k = xxh64(final)
            if k in res.seen_keys:
                continue
            if len(res.visited) + len(queue) >= cfg.max_visited_urls:
                continue
            if len(queue) >= cfg.max_queue_length:
                continue
            res.seen_keys.add(k)
            queue.append(
                dict(url=final, key=k, depth=e["depth"] + 1, epoch=e["epoch"] + 1,
                     source_uq_id=uq_id(url), source_attr=src_attr)
            )
    return res
