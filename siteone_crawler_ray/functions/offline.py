"""Offline-website export: URL→relative-path conversion + HTML body
rewriting.

Behavioral port of the reference's offline exporter utilities (NOT a
code translation — re-derived from the documented semantics and the
fixture expectations):

- URL→relative conversion incl. domain relations, ``../`` depth,
  ``_<host>/`` external prefixes, query-hash file names, forced
  absolute URLs for disallowed domains
  (/root/reference/src/export/utils/offline_url_converter.rs:104-520,
  fixtures :583-1585)
- domain relation classification
  (/root/reference/src/export/utils/target_domain_relation.rs:24-54)
- file-path sanitization (dangerous chars, control chars, whitespace,
  long-name md5, static-extension folders, dynamic-page extensions —
  offline_url_converter.rs:335-470)
- attribute-aware HTML body rewriting (href/src/srcset/imagesrcset/
  component-url/renderer-url/meta-url/escaped attrs —
  /root/reference/src/content_processor/html_processor.rs:96-125,
  540-646)
- redirect-stub HTML (offline_website_exporter.rs:401-440)

Everything here is a pure per-row function; the Ray-side stage is
:class:`OfflineRewriter`, a callable class for
``map_batches(OfflineRewriter(...), concurrency=N)`` — regexes and
allowed-domain sets compile once per actor.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import unquote

# Extensions the reference treats as static/route files in path
# sanitization (offline_url_converter.rs STATIC_FILES_EXTENSIONS).
_STATIC_FILES_EXTENSIONS = (
    "jpg|jpeg|png|gif|webp|svg|ico|js|css|txt|woff2|woff|ttf|eot|mp4|webm|ogg|mp3|wav|flac"
    "|pdf|doc|docx|xls|xlsx|ppt|pptx|zip|rar|gz|bz2|7z|tar|xml|json|action|asp|aspx|cfm"
    "|cfml|cgi|do|gsp|jsp|jspx|lasso|phtml|php|php3|php4|php5|php7|php8|php9|pl|py|rb"
    "|rbw|rhtml|shtml|srv|vm|vmdk"
)
_DYNAMIC_PAGE_EXTENSIONS = (
    "action|asp|aspx|cfm|cfml|cgi|do|gsp|jsp|jspx|lasso|phtml|php3|php4|php5|php7|php8"
    "|php9|php|pl|py|rb|rbw|rhtml|shtml|srv|vm"
)

_STRIP_EXT_RE = re.compile(r"\.[a-z0-9]{1,10}$", re.I)
_ESTIMATE_EXT_RE = re.compile(r"\.([0-9a-z]{1,5})", re.I)
_PATH_EXTENSION_RE = re.compile(r"^(.+)\.([a-z0-9]{1,10})", re.I)
_CONTROL_CHARS_RE = re.compile(r"[\x00-\x1F\x7F]")
_WHITESPACE_RE = re.compile(r"\s+")
_MULTI_UNDERSCORE_RE = re.compile(r"_{2,}")
_FRAGMENT_SUFFIX_RE = re.compile(r"#.+$")
_DOTTED_FOLDER_RE = re.compile(r"([^/]+)\.([a-z0-9]+)/", re.I)
_DOMAIN_TLD_RE = re.compile(r"\.(com|org|net|dev|io|test|local|localhost)$", re.I)
_STATIC_EXT_FOLDER_RE = re.compile(rf"([^.]+)\.({_STATIC_FILES_EXTENSIONS})/", re.I)
_STATIC_EXT_MATCH_RE = re.compile(rf"^({_STATIC_FILES_EXTENSIONS})$", re.I)
_DYNAMIC_EXT_RE = re.compile(rf"\.({_DYNAMIC_PAGE_EXTENSIONS})$", re.I)
_NON_HTTP_SCHEME_RE = re.compile(r"^[a-z]+:[a-z0-9+]", re.I)
_RELATIVE_URL_RE = re.compile(r"^[a-zA-Z0-9_]")  # xyz/abc style (not ./ ../ / ? #)
_HTML_PAGE_EXT_RE = re.compile(r"^(html?|xhtml|phtml|shtml)$", re.I)

_ENTITIES = {"&amp;": "&", "&#38;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'"}


def _entity_decode(s: str) -> str:
    for k, v in _ENTITIES.items():
        if k in s:
            s = s.replace(k, v)
    return s


@dataclass
class OfflineUrl:
    """Minimal ParsedUrl analogue (parsed_url.rs:336-520): relative
    hrefs keep their RELATIVE path verbatim (``../x`` is never
    dot-resolved — the offline depth logic works on the textual form);
    ``./x`` and ``x/y`` join against the base directory."""

    url: str
    scheme: str | None = None
    host: str | None = None
    port: int | None = None
    path: str = ""
    query: str | None = None
    fragment: str | None = None
    extension: str | None = field(default=None)

    @classmethod
    def parse(cls, url: str, base: OfflineUrl | None = None) -> OfflineUrl:
        raw = url
        if base is not None:
            if url.startswith("./"):
                url = _join_dir(base.path, url[2:])
            elif (
                not url.startswith(("http:", "https:"))
                and _RELATIVE_URL_RE.match(url)
                and not _NON_HTTP_SCHEME_RE.match(url)
            ):
                url = _join_dir(base.path, url)
            elif url.startswith("/") and not url.startswith("//"):
                url = f"{base.origin()}{url}" if base.host else url

        scheme = host = None
        port = None
        rest = url
        if url.startswith(("http://", "https://", "//")):
            if url.startswith("//"):
                rest = url[2:]
            else:
                scheme, rest = url.split("://", 1)
                scheme = scheme.lower()
            netloc, sep, tail = rest.partition("/")
            rest = sep + tail
            if "?" in netloc or "#" in netloc:  # host with no path
                cut = min(x for x in (netloc.find("?"), netloc.find("#")) if x >= 0)
                rest = netloc[cut:] + rest
                netloc = netloc[:cut]
            host = netloc.lower()
            if ":" in host:
                host, _, p = host.partition(":")
                port = int(p) if p.isdigit() else None
        path, query, fragment = rest, None, None
        if "#" in path:
            path, _, fragment = path.partition("#")
            fragment = fragment or None
        if "?" in path:
            path, _, query = path.partition("?")
            query = query or None
        ext = None
        seg = path.rsplit("/", 1)[-1]
        if "." in seg:
            cand = seg.rsplit(".", 1)[-1]
            if re.fullmatch(r"[A-Za-z0-9]{1,10}", cand):
                ext = cand
        return cls(url=raw, scheme=scheme, host=host, port=port, path=path,
                   query=query, fragment=fragment, extension=ext)

    def origin(self) -> str:
        port = self.port
        if (port == 80 and self.scheme == "http") or (port == 443 and self.scheme == "https"):
            port = None
        p = f":{port}" if port else ""
        return f"{self.scheme or 'https'}://{self.host}{p}"

    def full(self, with_origin: bool, keep_fragment: bool) -> str:
        s = self.path
        if self.query:
            s += f"?{self.query}"
        if keep_fragment and self.fragment:
            s += f"#{self.fragment}"
        if with_origin and self.host:
            s = f"{self.origin()}{s}"
        return s

    def is_only_fragment(self) -> bool:
        return not self.path and self.query is None and self.host is None and self.fragment is not None

    def is_static_file(self) -> bool:
        if self.extension is None:
            return False
        if self.extension.isdigit():
            return False
        return not _HTML_PAGE_EXT_RE.match(self.extension)

    def estimate_extension(self) -> str | None:
        if self.extension is not None:
            if self.extension.isdigit():
                return None
            return self.extension.lower()
        combined = f"{self.path}?{self.query or ''}"
        last = None
        for m in _ESTIMATE_EXT_RE.finditer(combined):
            last = m.group(1).lower()
        return last


def _join_dir(base_path: str, rel: str) -> str:
    if base_path.endswith("/"):
        return base_path + rel
    d = base_path.rsplit("/", 1)[0] or "/"
    return f"/{rel}" if d == "/" else f"{d}/{rel}"


# domain relations (target_domain_relation.rs:9-54)
INITIAL_SAME_BASE_SAME = 0
INITIAL_SAME_BASE_DIFFERENT = 1
INITIAL_DIFFERENT_BASE_SAME = 2
INITIAL_DIFFERENT_BASE_DIFFERENT = 3


def domain_relation(initial_host: str | None, base_host: str | None,
                    target_host: str | None) -> int:
    initial, base, target = initial_host or "", base_host or "", target_host or ""
    if not target or target == base:
        return INITIAL_SAME_BASE_SAME if base == initial else INITIAL_DIFFERENT_BASE_SAME
    return INITIAL_SAME_BASE_DIFFERENT if target == initial else INITIAL_DIFFERENT_BASE_DIFFERENT


def query_hash(query: str) -> str:
    """md5(decoded query)[:10] (offline_url_converter.rs:475-516,
    no-replacement branch)."""
    decoded = _entity_decode(unquote(query))
    return hashlib.md5(decoded.encode("utf-8", "replace")).hexdigest()[:10]


def query_component(query: str, rules: tuple[str, ...] = ()) -> str:
    """Query-string → filename component.  With --replace-query-string
    rules (``from -> to`` plain, or slash-delimited ``/regex/ -> to``)
    the query is rule-rewritten then ``/`` → ``~``; without rules it is
    the md5 hash (offline_url_converter.rs:475-516)."""
    if not rules:
        return query_hash(query)
    from .markdown_post import apply_content_replacements

    return apply_content_replacements(query, rules).replace("/", "~")


def offline_base_url_depth(path: str) -> int:
    trimmed = path.lstrip("/").strip()
    return trimmed.count("/") if trimmed else 0


def _is_requestable(href: str) -> bool:
    from . import urls as U

    return U.is_requestable_resource(href)


def convert_url_to_relative(
    initial_url: str,
    base_url: str,
    target_href: str,
    attribute: str | None = None,
    allowed_static=None,
    allowed_crawl=None,
    keep_fragment: bool = True,
    preserve_url_structure: bool = False,
    lowercase: bool = False,
    replace_query_string: tuple[str, ...] = (),
) -> str:
    """offline_url_converter.rs:104-330 ``convert_url_to_relative``.

    ``allowed_static`` / ``allowed_crawl``: predicates host→bool (the
    --allowed-domain-for-external-files / --allowed-domain callbacks)."""
    initial = OfflineUrl.parse(initial_url)
    base = OfflineUrl.parse(base_url)
    base_ref = None if target_href.startswith(("//", "http", "#", "?")) else base
    target = OfflineUrl.parse(target_href, base_ref)
    rel = domain_relation(initial.host, base.host, target.host)

    # ---- forced URLs (get_forced_url_if_needed) ----
    if target.is_only_fragment():
        return f"#{target.fragment}"
    if not _is_requestable(target.full(True, True)):
        return target.full(False, True)
    if rel in (INITIAL_DIFFERENT_BASE_DIFFERENT, INITIAL_DIFFERENT_BASE_SAME) and target.host:
        ok = (
            (allowed_crawl is not None and allowed_crawl(target.host))
            or (target.is_static_file() and allowed_static is not None and allowed_static(target.host))
            or (not target.is_static_file() and attribute == "src"
                and allowed_static is not None and allowed_static(target.host))
        )
        if not ok:
            return target.full(True, True)

    # ---- detect_and_set_file_name_with_extension ----
    path = target.path
    query = target.query
    qhash = None
    if query:
        qc = query_component(query, replace_query_string)
        qhash = qc if qc.strip() else None

    trimmed = path.strip("/ ")
    if not trimmed:
        if qhash:
            path, query = f"/index.{qhash}.html", None
        elif not path and target.fragment is not None:
            pass  # only fragment (handled above) — keep as-is
        else:
            path = "/index.html"
    else:
        is_image_attr = attribute in ("src", "srcset")
        full_lower = target.full(True, True).lower()
        img_ext = "svg" if "icon" in full_lower else "jpg"
        other_ext = (
            "css"
            if attribute == "href" and "fonts.googleapis.com/css" in target.url.lower()
            else "html"
        )
        ext = target.estimate_extension() or (img_ext if is_image_attr else other_ext)
        if path.endswith("/"):
            if qhash:
                path, query = f"{path}index.{qhash}.{ext}", None
            else:
                path = f"{path}index.{ext}"
        elif preserve_url_structure and target.estimate_extension() is None:
            if qhash:
                path, query = f"{path}/index.{qhash}.html", None
            else:
                path = f"{path}/index.html"
        else:
            stem = _STRIP_EXT_RE.sub("", path)
            if qhash:
                path, query = f"{stem}.{qhash}.{ext}", None
            else:
                path = f"{stem}.{ext}"

    # ---- calculate_and_apply_depth ----
    base_depth = offline_base_url_depth(base.path)
    if rel in (INITIAL_SAME_BASE_SAME, INITIAL_DIFFERENT_BASE_SAME):
        if path.startswith("/"):
            path = "../" * base_depth + path.lstrip("/") if base_depth else path.lstrip("/")
    elif rel == INITIAL_SAME_BASE_DIFFERENT:
        cleaned = re.sub(r"^(//|https?://)([^/]+)(:[0-9]+)?", "", path, flags=re.I).lstrip("/ ")
        path = "../" * (base_depth + 1) + cleaned
    else:  # INITIAL_DIFFERENT_BASE_DIFFERENT
        extra = 1 if base.host != initial.host else 0
        path = "../" * (base_depth + extra) + f"_{target.host or ''}{path}"

    pre_final = path
    if query:
        pre_final += f"?{query}"
    if keep_fragment and target.fragment:
        pre_final += f"#{target.fragment}"
    return sanitize_file_path(pre_final, keep_fragment=keep_fragment, lowercase=lowercase,
                              replace_query_string=replace_query_string)


def sanitize_file_path(file_path: str, keep_fragment: bool = True, lowercase: bool = False,
                       replace_query_string: tuple[str, ...] = ()) -> str:
    """offline_url_converter.rs:335-470 ``sanitize_file_path``."""
    file_path = unquote(file_path)
    # split components
    rem = file_path
    frag = None
    if "#" in rem:
        rem, _, f = rem.partition("#")
        frag = f or None
    qry = None
    if "?" in rem:
        rem, _, q = rem.partition("?")
        qry = q or None
    parsed_path = rem

    result = file_path
    extension = None
    m = _PATH_EXTENSION_RE.match(parsed_path)
    if m:
        extension = m.group(2)
        if qry and qry.strip():
            qh = query_component(qry.strip(), replace_query_string)
            result = f"{m.group(1)}.{qh}.{extension}" if qh.strip() else f"{m.group(1)}.{extension}"
            if keep_fragment and frag:
                result = f"{result}#{frag}"

    for ch in '\\:*?"<>|':
        result = result.replace(ch, "_")
    result = _CONTROL_CHARS_RE.sub("_", result)
    result = result.strip(" \t\n\r\0\x0b")
    result = _WHITESPACE_RE.sub("_", result)
    result = _MULTI_UNDERSCORE_RE.sub("_", result)

    # long-filename md5 shortening
    no_frag = _FRAGMENT_SUFFIX_RE.sub("", result)
    if len(no_frag) > 200:
        basename = result.rsplit("/", 1)[-1]
        if len(basename) > 40:
            ext = extension or (basename.rsplit(".", 1)[-1] if "." in basename else "html")
            short = hashlib.md5(basename.encode("utf-8", "replace")).hexdigest()[:10]
            result = result.replace(basename, f"{short}.{ext}")

    # folders that look like files get a trailing underscore
    result = _STATIC_EXT_FOLDER_RE.sub(r"\1.\2_/", result)

    def dotted(mm: re.Match) -> str:
        name, ext = mm.group(1), mm.group(2)
        if name.startswith("_"):
            return mm.group(0)
        if _DOMAIN_TLD_RE.search(f"{name}.{ext}"):
            return mm.group(0)
        if _STATIC_EXT_MATCH_RE.match(ext):
            return mm.group(0)
        return f"{name}.{ext}_/"

    result = _DOTTED_FOLDER_RE.sub(dotted, result)
    result = _DYNAMIC_EXT_RE.sub(r".\1.html", result)
    if not keep_fragment and "#" in result:
        result = _FRAGMENT_SUFFIX_RE.sub("", result)
    if lowercase:
        result = result.lower()
    return result


# ---- HTML body rewriting (html_processor.rs:96-125, 540-646) -------------

_HREF_SRC_RE = re.compile(
    r"""(\.|<[a-z0-9]{1,10}[^>]*\s+)(href|src|component-url)\s*(=)\s*(['"]?)([^'">]+)['"]?([^>]*)""",
    re.I | re.S,
)
_SRCSET_RE = re.compile(
    r"""(\.|<[a-z0-9]{1,10}[^>]*\s+)(imagesrcset|srcset|renderer-url)\s*(=)\s*(['"]?)([^'">]+)['"]?([^>]*)""",
    re.I | re.S,
)
_META_URL_RE = re.compile(
    r"""(<meta[^>]*)(url)\s*(=)\s*(['"]?)([^'">]+)['"]?(")""", re.I | re.M
)
# Escaped attributes inside inline JSON/JS (e.g. Astro island props
# ``href\"...\"``) — html_processor.rs:111 (RE_ESCAPED_HREF_SRC). Groups map
# to the same callback: start, attr_raw (strips the backslash+quote),
# assignment, quote (``\"``), value, end.
_ESCAPED_HREF_SRC_RE = re.compile(
    r"""(.)(href\\["']|src\\["'])([:=])(\\["'])([^"'\\]+)\\["'](.)""",
    re.I | re.S,
)


class OfflineRewriter:
    """Actor-pool ``map_batches`` stage: rewrite every URL attribute of
    a rendered HTML body to its offline relative path and attach the
    body's own offline path.

    Compiled regexes + allowed-domain predicates build once per actor;
    ``__call__`` rewrites a batch of (url, body) rows."""

    def __init__(self, initial_url: str, allowed_static: tuple[str, ...] = (),
                 allowed_crawl: tuple[str, ...] = (), ignore_regex: tuple[str, ...] = (),
                 lowercase: bool = False, replace_query_string: tuple[str, ...] = ()):
        self.initial_url = initial_url
        init_host = OfflineUrl.parse(initial_url).host
        crawl_set = set(allowed_crawl) | ({init_host} if init_host else set())
        static_set = set(allowed_static) | crawl_set

        def _pred(s):
            return (lambda h: True) if "*" in s else (lambda h: h in s)

        self.allowed_static = _pred(static_set)
        self.allowed_crawl = _pred(crawl_set)
        self.ignore = [re.compile(p) for p in ignore_regex]
        self.lowercase = lowercase
        self.replace_query_string = tuple(replace_query_string)

    def convert(self, base_url: str, href: str, attribute: str | None = None) -> str:
        return convert_url_to_relative(
            self.initial_url, base_url, href, attribute=attribute,
            allowed_static=self.allowed_static, allowed_crawl=self.allowed_crawl,
            lowercase=self.lowercase, replace_query_string=self.replace_query_string,
        )

    def rewrite_body(self, body: str, base_url: str) -> str:
        def cb(m: re.Match) -> str:
            start, attr_raw, assign, quote, value_raw, end = (
                m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
            attribute = attr_raw.strip(" \\\"'")
            value = _entity_decode(value_raw)
            if start == "." and not quote:  # x.src= in JS without quote
                return m.group(0)
            if value.startswith("#") or _NON_HTTP_SCHEME_RE.match(value):
                return m.group(0)
            for ir in self.ignore:
                if ir.search(value):
                    return m.group(0)
            attr_lower = attribute.lower()
            if attr_lower in ("srcset", "imagesrcset"):
                out = []
                for source in value.split(", "):
                    s = source.strip()
                    if " " not in s:
                        out.append(self.convert(base_url, s, attr_lower))
                    else:
                        u, sz = s.split(None, 1)
                        out.append(f"{self.convert(base_url, u, attr_lower)} {sz}")
                new_value = ", ".join(out)
            else:
                new_value = self.convert(base_url, value, attribute)
                if attribute in ("component-url", "renderer-url"):
                    new_value = f"./{new_value}"
            return f"{start}{attr_raw}{assign}{quote}{new_value}{quote}{end}"

        body = _HREF_SRC_RE.sub(cb, body)
        body = _SRCSET_RE.sub(cb, body)
        body = _META_URL_RE.sub(cb, body)
        body = _ESCAPED_HREF_SRC_RE.sub(cb, body)
        return body

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa

        urls = batch["url"].to_numpy(zero_copy_only=False)
        bodies = batch["body"].to_numpy(zero_copy_only=False)
        out_body = np.empty(len(urls), dtype=object)
        out_path = np.empty(len(urls), dtype=object)
        for i in range(len(urls)):
            out_body[i] = self.rewrite_body(bodies[i], urls[i])
            out_path[i] = convert_url_to_relative(
                self.initial_url, self.initial_url, urls[i],
                allowed_static=self.allowed_static, allowed_crawl=self.allowed_crawl,
                lowercase=self.lowercase, replace_query_string=self.replace_query_string,
            )
        return pa.table({
            "url": batch["url"],
            "offline_path": pa.array(out_path, pa.string()),
            "body": pa.array(out_body, pa.string()),
        })


def redirect_stub_html(target_relative: str) -> str:
    """Redirect-stub file content for 3xx pages / folder indexes
    (offline_website_exporter.rs:401-440)."""
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f'<meta http-equiv="refresh" content="0; url={target_relative}">\n'
        f'<link rel="canonical" href="{target_relative}">\n'
        "</head>\n<body>\n"
        f'<p>Redirecting to <a href="{target_relative}">{target_relative}</a></p>\n'
        "</body>\n</html>\n"
    )


# ---- unwanted-code stripping (html_processor.rs:397-416, 649-758) --------

_SCRIPT_BLOCK_RE = re.compile(r"<script\b[^>]*>.*?</script>|<script\b[^>]*/>", re.I | re.S)
_STYLE_BLOCK_RE = re.compile(
    r"<style\b[^>]*>.*?</style>|<link\b[^>]*rel=[\"']stylesheet[\"'][^>]*>", re.I | re.S)
_FONT_LINK_RE = re.compile(
    r"""<link\b[^>]*(?:as=["']font["']|href=["'][^"']*\.(?:woff2?|ttf|otf|eot)[^"']*["'])[^>]*>""",
    re.I)
_EXTERNAL_SCRIPT_RE = re.compile(
    r"""<script[^>]*\bsrc\s*=\s*["']?([^"'\s>]+)["']?[^>]*>.*?</script>""", re.I | re.S)
_EXTERNAL_URL_RE = re.compile(r"^(?:https?:)?//", re.I)
_CROSSORIGIN_RE = re.compile(
    r"""(<(?:link|script)\b[^>]*?)\s+crossorigin(?:=["'][^"']*["'])?([^>]*>)""", re.I)
_SOCNET_IFRAME_RE = re.compile(
    r"""<iframe\b[^>]*src=["'][^"']*(?:facebook\.com|twitter\.com|instagram\.com|linkedin\.com)"""
    r"""[^"']*["'][^>]*>.*?</iframe>""", re.I | re.S)

_ANALYTICS_PATTERNS = ("googletagmanager.com", "google-analytics.com", "ga.js", "gtag.js",
                       "gtag(", "analytics.", "connect.facebook.net", "fbq(")
_SOCNET_PATTERNS = ("connect.facebook.net", "connect.facebook.com", "twitter.com", ".x.com",
                    "linkedin.com", "instagram.com", "pinterest.com", "tumblr.com",
                    "plus.google.com", "curator.io")
_COOKIE_PATTERNS = ("cookies", "cookiebot")


def strip_unwanted_code(
    html: str,
    base_host: str = "",
    *,
    remove_scripts: bool = False,
    remove_styles: bool = False,
    remove_fonts: bool = False,
    remove_external_js: bool = False,
    remove_cross_origins: bool = False,
    remove_analytics: bool = False,
    remove_socnets: bool = False,
    remove_cookies_related: bool = False,
) -> str:
    """The offline exporter's unwanted-code pass
    (html_processor.rs:397-416 remove_unwanted_code_from_html +
    :649-758 apply_specific_html_changes): script/style/font stripping,
    external-JS removal, crossorigin attribute removal, analytics /
    social-network / cookie-consent script blocks, socnet iframes."""
    if not html.strip():
        return html
    if remove_scripts:
        html = _SCRIPT_BLOCK_RE.sub("", html)
    if remove_styles:
        html = _STYLE_BLOCK_RE.sub("", html)
    if remove_fonts:
        html = _FONT_LINK_RE.sub("", html)
    if remove_external_js and not remove_scripts:
        def drop_external(m: re.Match) -> str:
            src = m.group(1)
            if _EXTERNAL_URL_RE.match(src):
                u = OfflineUrl.parse(src if not src.startswith("//") else f"https:{src}")
                if (u.host or "") != base_host:
                    return ""
            return m.group(0)

        html = _EXTERNAL_SCRIPT_RE.sub(drop_external, html)
    if remove_cross_origins:
        html = _CROSSORIGIN_RE.sub(r"\1\2", html)
    patterns: list[str] = []
    if remove_analytics:
        patterns += _ANALYTICS_PATTERNS
    if remove_socnets:
        patterns += _SOCNET_PATTERNS
    if remove_cookies_related:
        patterns += _COOKIE_PATTERNS
    if patterns:
        pats = sorted(set(p.lower() for p in patterns))

        def drop_matching(m: re.Match) -> str:
            low = m.group(0).lower()
            return "" if any(p in low for p in pats) else m.group(0)

        html = _SCRIPT_BLOCK_RE.sub(drop_matching, html)
        if remove_socnets:
            html = _SOCNET_IFRAME_RE.sub("", html)
    return html
