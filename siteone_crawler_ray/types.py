"""Stable integer codes shared with the reference's output schema."""

from __future__ import annotations


class ContentType:
    """/root/reference/src/types.rs:109-124."""

    HTML = 1
    SCRIPT = 2
    STYLESHEET = 3
    IMAGE = 4
    VIDEO = 5
    FONT = 6
    DOCUMENT = 7
    JSON = 8
    REDIRECT = 9
    OTHER = 10
    AUDIO = 11
    XML = 12


class UrlSource:
    """/root/reference/src/engine/found_url.rs:12-29."""

    INIT_URL = 5
    A_HREF = 10
    IMG_SRC = 20
    IMG_SRCSET = 21
    INPUT_SRC = 22
    SOURCE_SRC = 23
    VIDEO_SRC = 24
    AUDIO_SRC = 25
    SCRIPT_SRC = 30
    INLINE_SCRIPT_SRC = 40
    LINK_HREF = 50
    CSS_URL = 60
    JS_URL = 70
    REDIRECT = 80
    SITEMAP = 90
    URL_LIST = 91


class SkippedReason:
    """/root/reference/src/types.rs:173-198."""

    NOT_ALLOWED_HOST = 1
    ROBOTS_TXT = 2
    EXCEEDS_MAX_DEPTH = 3


# span kind → UrlSource code for candidate URLs exploded from spans
SPAN_KIND_TO_SOURCE = {
    "link": UrlSource.A_HREF,
    "img": UrlSource.IMG_SRC,
    "script": UrlSource.SCRIPT_SRC,
    "css": UrlSource.LINK_HREF,
    "media": UrlSource.VIDEO_SRC,
    "redirect": UrlSource.REDIRECT,  # Location header → crawler.rs:733-755
}


class CacheFlag:
    """Cache-header bitmask, /root/reference/src/result/visited_url.rs:20-36
    (17 flags over Cache-Control / Expires / ETag / Last-Modified)."""

    HAS_CACHE_CONTROL = 1 << 0
    PUBLIC = 1 << 1
    PRIVATE = 1 << 2
    NO_CACHE = 1 << 3
    NO_STORE = 1 << 4
    MAX_AGE = 1 << 5
    S_MAXAGE = 1 << 6
    MUST_REVALIDATE = 1 << 7
    PROXY_REVALIDATE = 1 << 8
    IMMUTABLE = 1 << 9
    STALE_WHILE_REVALIDATE = 1 << 10
    STALE_IF_ERROR = 1 << 11
    NO_TRANSFORM = 1 << 12
    HAS_EXPIRES = 1 << 13
    HAS_ETAG = 1 << 14
    HAS_LAST_MODIFIED = 1 << 15
    HAS_VARY = 1 << 16

# extension → ContentType for synthetic asset responses
EXTENSION_CONTENT_TYPE = {
    "js": ContentType.SCRIPT,
    "mjs": ContentType.SCRIPT,
    "css": ContentType.STYLESHEET,
    "png": ContentType.IMAGE,
    "jpg": ContentType.IMAGE,
    "jpeg": ContentType.IMAGE,
    "gif": ContentType.IMAGE,
    "webp": ContentType.IMAGE,
    "avif": ContentType.IMAGE,
    "svg": ContentType.IMAGE,
    "ico": ContentType.IMAGE,
    "mp4": ContentType.VIDEO,
    "webm": ContentType.VIDEO,
    "mp3": ContentType.AUDIO,
    "ogg": ContentType.AUDIO,
    "wav": ContentType.AUDIO,
    "woff": ContentType.FONT,
    "woff2": ContentType.FONT,
    "ttf": ContentType.FONT,
    "otf": ContentType.FONT,
    "eot": ContentType.FONT,
    "json": ContentType.JSON,
    "xml": ContentType.XML,
    "pdf": ContentType.DOCUMENT,
    "doc": ContentType.DOCUMENT,
    "docx": ContentType.DOCUMENT,
}
