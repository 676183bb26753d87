"""Content-processor registry — the engine's extension surface.

Mirror of the reference's ``ContentProcessor`` trait + manager
(/root/reference/src/content_processor/content_processor.rs,
manager.rs:32-39; instantiation engine/manager.rs:798-808): each
processor declares which content types it handles and extracts URLs
from matching bodies; registered processors run in order inside one
``map_batches`` stage.  Users extend the pipeline by registering a
processor (the reference ships Astro/Html/JavaScript/Css/Xml/NextJs/
Svelte; here Html/Css/Js/Xml are built-in and framework-specific ones
register extra regexes the same way).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from ..types import ContentType, UrlSource
from .html_extract import extract_urls_from_css, extract_urls_from_html, extract_urls_from_js

_SITEMAP_LOC_RE = re.compile(r"<loc>\s*([^<]+?)\s*</loc>")

# Next.js webpack chunk-map reconstruction
# (javascript_processor.rs:59-121): {id:"name"} + {id:"hash"} →
# /_next/static/chunks/<name>.<hash>.js
_CHUNK_NAME_RE = re.compile(r"(\d+):\s*\"([a-zA-Z][\w-]*)\"")
_CHUNK_HASH_RE = re.compile(r"(\d+):\s*\"([0-9a-f]{8,})\"")


_HEX_RE = re.compile(r"^[0-9a-f]{8,}$")


def nextjs_chunk_urls(js: str, base_path: str = "/_next/static/chunks/") -> list[tuple[str, int]]:
    # a chunk "name" must not itself look like a hash (both maps use the
    # same `{id:"value"}` syntax — javascript_processor.rs:59-121)
    names = {k: v for k, v in _CHUNK_NAME_RE.findall(js) if not _HEX_RE.match(v)}
    hashes = dict(_CHUNK_HASH_RE.findall(js))
    out = []
    for cid, name in names.items():
        h = hashes.get(cid)
        if h:
            out.append((f"{base_path}{name}.{h}.js", UrlSource.JS_URL))
    return out


@dataclass
class Processor:
    name: str
    content_types: tuple[int, ...]
    find_urls: Callable[[str], list[tuple[str, int]]]
    # apply_content_changes_for_offline_version analogue — body rewrite
    # applied by the offline exporter (content_processor.rs trait)
    offline_transform: Callable[[str], str] | None = None


# Astro framework processor (astro_processor.rs:20-160): island
# component/renderer URLs are JS assets; module scripts degrade to
# plain scripts offline when the module content is not available
# (astro_processor.rs:130-135 fallback branch)
_ASTRO_URLS_RE = re.compile(r"""(component-url|renderer-url)=["']([^"']+)["']""", re.I)
_ASTRO_MODULE_SCRIPT_RE = re.compile(
    r"""<script([^>]*?)\s*type=["']module["']([^>]*)>""", re.I)


def _astro_find(body: str) -> list[tuple[str, int]]:
    if "astro" not in body:  # cheap guard (astro_processor.rs:139-141)
        return []
    return [(m.group(2), UrlSource.JS_URL) for m in _ASTRO_URLS_RE.finditer(body)]


def _astro_offline(body: str) -> str:
    if "astro" not in body:
        return body
    return _ASTRO_MODULE_SCRIPT_RE.sub(r"<script\1\2>", body)


# Svelte framework processor (svelte_processor.rs:15-58): no URL
# extraction; <svelte:*> special tags are stripped for offline export
_SVELTE_TAG_RE = re.compile(r"<svelte:[^>]+>\s*", re.I)


def _svelte_find(body: str) -> list[tuple[str, int]]:
    return []


def _svelte_offline(body: str) -> str:
    if "<svelte:" not in body:
        return body
    return _SVELTE_TAG_RE.sub("", body)


def _xml_find(body: str) -> list[tuple[str, int]]:
    return [(u.strip(), UrlSource.SITEMAP) for u in _SITEMAP_LOC_RE.findall(body)]


class ProcessorRegistry:
    """Ordered registry; ``extract(content_type, body)`` concatenates the
    findings of every processor claiming that type, deduped first-wins
    (FoundUrls semantics)."""

    def __init__(self):
        self._processors: list[Processor] = []

    def register(self, p: Processor) -> None:
        self._processors.append(p)

    @classmethod
    def with_builtins(cls) -> "ProcessorRegistry":
        r = cls()
        r.register(Processor("html", (ContentType.HTML,),
                             lambda b: extract_urls_from_html(b)))
        r.register(Processor("css", (ContentType.STYLESHEET,), extract_urls_from_css))
        r.register(Processor("javascript", (ContentType.SCRIPT,), extract_urls_from_js))
        r.register(Processor("xml", (ContentType.XML,), _xml_find))
        r.register(Processor("astro", (ContentType.HTML, ContentType.SCRIPT),
                             _astro_find, _astro_offline))
        r.register(Processor("svelte", (ContentType.HTML,), _svelte_find, _svelte_offline))
        return r

    def extract(self, content_type: int, body: str) -> list[tuple[str, int]]:
        seen: set[str] = set()
        out: list[tuple[str, int]] = []
        for p in self._processors:
            if content_type in p.content_types:
                for url, attr in p.find_urls(body):
                    if url not in seen:
                        seen.add(url)
                        out.append((url, attr))
        return out

    def apply_offline(self, content_type: int, body: str) -> str:
        """Run every claiming processor's offline body transform in
        registration order (manager.rs offline pass)."""
        for p in self._processors:
            if p.offline_transform is not None and content_type in p.content_types:
                body = p.offline_transform(body)
        return body
