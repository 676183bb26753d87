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
