"""URL canonicalization — RFC 3986 normalize + the reference's semantics.

Behavioral parity targets (all in /root/reference/):
- href normalization: entity decode, space escaping, quote/tab trimming
  (src/engine/found_url.rs:122-163)
- validity: drop ``#frag``, non-http schemes ``^[a-z]+:[a-z0-9]``,
  ``file://`` (src/engine/found_urls.rs:13,71-83); requestable check
  rejects ``{``, ``<``, ``&#`` (src/utils.rs:607-633)
- absolutization: RFC 3986 join against the source page URL, fragment
  stripped after join (src/engine/crawler.rs:1130-1143)
- query filtering: ``--remove-query-params`` strips all;
  ``--keep-query-param`` allowlist preserving order, empty names dropped
  (src/engine/crawler.rs:1146-1156, 1882-1902)
- canonical rendering: lowercase scheme+host, default port 80/443 elided
  (src/engine/parsed_url.rs:133-187)
- basename (non-200 guard key): last path segment, trailing ``/``
  trimmed; query appended when the query contains ``/`` or ``%2F``
  (src/engine/parsed_url.rs:465-482)

These are per-row Python functions applied inside ``map_batches``; the
regexes are module-level compiled once per worker process.  Hashing the
resulting canonical URLs (the actual partition keys) is fully vectorized
in :mod:`.hashing`.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import numpy as np

NON_HTTP_SCHEME_RE = re.compile(r"^[a-z]+:[a-z0-9]", re.I)
HTTP_URL_RE = re.compile(r"^https?://", re.I)
HAS_SCHEME_RE = re.compile(r"^[a-zA-Z0-9]+:")
IS_HTTP_RE = re.compile(r"^https?:/", re.I)
DOMAIN_2ND_LEVEL_RE = re.compile(r"([^.]+\.[^.]+)$")

DEFAULT_MAX_URL_LENGTH = 2083  # reference default — README.md:569-573

# extensions the reference treats as static assets (parsed_url.rs is_static_file)
STATIC_EXTENSIONS = {
    "css", "js", "mjs", "json", "png", "jpg", "jpeg", "gif", "webp", "avif",
    "svg", "ico", "bmp", "tif", "tiff", "woff", "woff2", "ttf", "otf", "eot",
    "mp3", "ogg", "wav", "aac", "flac", "mp4", "webm", "avi", "mov", "mkv",
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "zip", "gz", "rar",
    "7z", "tar", "txt", "xml",
}


def normalize_href(href: str) -> str:
    """found_url.rs:122-163 (minus the same-host prefix strip, which only
    affects display form — canonical output here is always absolute)."""
    s = (
        href.replace("&#38;", "&")
        .replace("&amp;", "&")
        .replace("\\ ", "%20")
        .replace(" ", "%20")
    )
    s = s.lstrip("\"'\t ")
    return s.rstrip("&\"'\t ")


def is_valid_for_crawling(href: str) -> bool:
    """found_urls.rs:71-83."""
    u = href.strip()
    if not u or u.startswith("#"):
        return False
    if NON_HTTP_SCHEME_RE.match(u):
        return False
    if u.lower().startswith("file://"):
        return False
    return True


def is_requestable_resource(href: str) -> bool:
    """utils.rs:607-633 — applied to raw hrefs before normalization."""
    if href.startswith("#") or "{" in href or "<" in href or "&#" in href:
        return False
    if HAS_SCHEME_RE.match(href) and not IS_HTTP_RE.match(href):
        return False
    return True


def filter_query_params(url: str, keep_params: tuple[str, ...]) -> str:
    """crawler.rs:1882-1902 — allowlist, order preserved, empty names dropped."""
    q_pos = url.find("?")
    if q_pos < 0:
        return url
    base, query = url[:q_pos], url[q_pos + 1 :]
    kept = [p for p in query.split("&") if (n := p.split("=", 1)[0]) and n in keep_params]
    return base + ("?" + "&".join(kept) if kept else "")


def render_canonical(url: str) -> str | None:
    """Canonical absolute form: lowercase scheme+host, default port elided,
    no fragment (parsed_url.rs:133-187 + crawler.rs:1139-1143)."""
    try:
        sp = urlsplit(url)
        # NB: .port (not urlsplit) raises on malformed ports like ":9x"
        # — a crawled href must drop, not crash the extract task
        if sp.scheme not in ("http", "https") or not sp.hostname:
            return None
        host = sp.hostname
        port = sp.port
    except ValueError:
        return None
    if port == 80 and sp.scheme == "http" or port == 443 and sp.scheme == "https":
        port = None
    netloc = host if port is None else f"{host}:{port}"
    path = sp.path or "/"
    return f"{sp.scheme}://{netloc}{path}" + (f"?{sp.query}" if sp.query else "")


def canonicalize(
    href: str,
    base_url: str,
    *,
    remove_query_params: bool = False,
    keep_query_params: tuple[str, ...] = (),
) -> str | None:
    """Full candidate-URL gauntlet: normalize → validity → join → fragment
    strip → query filter → canonical render.  Returns None for dropped URLs.
    Mirrors crawler.rs:1018-1187 ordering of the transformations."""
    s = normalize_href(href)
    if not is_valid_for_crawling(s):
        return None
    try:
        absolute = urljoin(base_url, s)
    except ValueError:
        return None
    if not absolute:
        return None
    hash_pos = absolute.find("#")
    if hash_pos >= 0:
        absolute = absolute[:hash_pos]
    if remove_query_params:
        q = absolute.find("?")
        if q >= 0:
            absolute = absolute[:q]
    elif keep_query_params:
        absolute = filter_query_params(absolute, keep_query_params)
    return render_canonical(absolute)


# fast-path guards: any char/sequence that normalize/join/render could
# alter disqualifies the href from the concatenation shortcut.
# ``/\.`` rejects dot segments in every position incl. trailing "/."
# and "/.."; the trailing-char check below rejects normalize_href's
# rstrip set (notably a bare trailing "&").
_FAST_ABS_BAD_RE = re.compile(r"""[\s"'<>{}\[\]\\#%]|&\#|&amp|\./|/\.""")
_FAST_TRAILING_STRIP = ("&", '"', "'", "\t", " ")
# already-canonical absolute URL: lowercase scheme+host, explicit path
_CANON_FULL_RE = re.compile(r"^(https?)://([a-z0-9.\-]+)(?::(\d+))?(/[^?#]*)(\?[^#]*)?$")
# mixed-case absolute: scheme + authority to lowercase, rest preserved
_ABS_ANYCASE_RE = re.compile(r"^(https?)://([^/?#]*)", re.I)
_CANON_ORIGIN_RE = re.compile(r"^(https?)://[a-z0-9.\-]+(?::(\d+))?$")


def _port_ok(scheme: str, port: str) -> bool:
    """Fast paths admit an explicit port only when the renderer would
    keep it verbatim: no zero padding (':0080' renders ':80'), in the
    valid range (urlsplit raises above 65535 → full path DROPS the
    URL), and not the scheme default (elided by the renderer)."""
    if port[0] == "0" or len(port) > 5 or int(port) > 65535:
        return False
    return not ((scheme == "http" and port == "80")
                or (scheme == "https" and port == "443"))


def _fast_absolute(url: str) -> str | None:
    """Accept an absolute URL only if it is ALREADY in canonical form
    (lowercase scheme+host, no default port spelled out, explicit path,
    no fragment/encodings/entities/dot segments, nothing normalize_href
    would strip) — then it passes through the full pipeline unchanged."""
    m = _CANON_FULL_RE.match(url)
    if m is None or _FAST_ABS_BAD_RE.search(url):
        return None
    if url.endswith("?") or url.endswith(_FAST_TRAILING_STRIP):
        return None
    port = m.group(3)
    if port and not _port_ok(m.group(1), port):
        return None
    if m.group(5) == "?":  # bare query
        return None
    if m.group(4).endswith(";"):
        # urlparse splits empty params off the LAST segment and the
        # renderer drops the bare ";" ("/x;" → "/x"); non-empty params
        # (";x") and mid-path ";" survive, so only this shape falls back
        return None
    return url


def canonicalize_fast(href: str, base_url: str) -> str | None:
    """O(1) shortcut for the dominant candidate shapes: safe
    path-absolute / protocol-relative / already-canonical absolute
    (optionally fragment-suffixed) / safe bare-relative hrefs.

    Returns None when not applicable (caller falls back to the full
    :func:`canonicalize`); when it does return, the result is IDENTICAL
    to the full path (property-tested in tests/test_properties.py).
    Every branch is conservative: rejecting costs only the fallback,
    so any char/sequence that normalize/join/render could alter
    disqualifies the href."""
    if href[:2] == "//":
        # protocol-relative: the base's scheme joins on (urljoin
        # semantics); delegate to the canonical-absolute check
        i = base_url.find("://")
        if i not in (4, 5):  # "http"/"https" only
            return None
        return _fast_absolute(base_url[: i + 1] + href)
    if href[:1] == "/":
        if _FAST_ABS_BAD_RE.search(href):
            return None
        if href.endswith("?"):  # empty query: the renderer drops the bare "?"
            return None
        if href.endswith(_FAST_TRAILING_STRIP):  # normalize_href would rstrip
            return None
        if href.split("?", 1)[0].endswith(";"):
            # trailing empty params: urlparse drops the bare ";" from
            # the last path segment ("/x;" → "/x") — fall back
            return None
        p = base_url.find("/", 8)
        origin = base_url if p < 0 else base_url[:p]
        m = _CANON_ORIGIN_RE.match(origin)
        if not m:
            return None
        port = m.group(2)
        if port and not _port_ok(m.group(1), port):
            return None
        return origin + href
    if href[:7] == "http://" or href[:8] == "https://":
        # the full path strips the fragment after the join, so a safe
        # canonical prefix short-circuits fragment-suffixed absolutes
        pos = href.find("#")
        return _fast_absolute(href if pos < 0 else href[:pos])
    if href[:7].lower() == "http://" or href[:8].lower() == "https://":
        # mixed-case scheme/host absolute (HTTPS://HOST/…): lowercase
        # the scheme+authority exactly as render_canonical would, then
        # take the canonical-absolute check.  Userinfo/IDN authorities
        # fail _fast_absolute's [a-z0-9.-] host class after lowering
        # and fall back to the full path, so lowering them here is safe.
        pos = href.find("#")
        h2 = href if pos < 0 else href[:pos]
        m = _ABS_ANYCASE_RE.match(h2)
        if m is None:
            return None
        return _fast_absolute(m.group(1).lower() + "://" + m.group(2).lower() + h2[m.end():])
    # bare-relative ("a/b", "./a"): joins onto the base DIRECTORY when
    # the base is canonical with no query and the relative is plain
    # (no scheme-colon, dot segments, encodings, or strip chars)
    if href[:2] == "./":
        href = href[2:]
    # ";" rejected: urljoin treats it as a params separator in relative
    # references (urlparse RFC 1808 legacy), altering the join result.
    # "//" rejected: urljoin collapses empty segments when merging a
    # RELATIVE reference ("0//" + base "/" → "/0/"), unlike in absolute
    # paths where they survive.
    if not href or href[0] in "/.?#" or ":" in href or ";" in href or "//" in href:
        return None
    if _FAST_ABS_BAD_RE.search(href):
        return None
    if href.endswith("?") or href.endswith(_FAST_TRAILING_STRIP):
        return None
    m = _CANON_FULL_RE.match(base_url)
    if m is None or m.group(5) or _FAST_ABS_BAD_RE.search(base_url):
        return None
    port = m.group(3)
    if port and not _port_ok(m.group(1), port):
        return None
    path = m.group(4)
    if "//" in path or ";" in path:
        # urljoin's RFC 3986 merge treats empty segments / params in the
        # BASE path specially — fall back rather than replicate it
        return None
    return base_url[: m.start(4)] + path[: path.rfind("/") + 1] + href


# Vectorized url-list fast path (flat crawl).  A row is admitted
# unchanged only when one Arrow regex pass proves it is ALREADY in
# canonical absolute form — the same conservative conditions as
# _fast_absolute, expressed as column kernels.  RE2 has no lookahead,
# so the disqualifiers are separate match passes combined with boolean
# kernels.
_VEC_CANON_RE = r"^(https?)://([a-z0-9.\-]+)(:[1-9][0-9]{0,3})?(/[^?#]*)(\?[^#]+)?$"
_VEC_TRAIL_RE = r"""[&"'\t ?]$"""
_VEC_DEFAULT_PORT_RE = r"^(https?://[a-z0-9.\-]+:0|http://[a-z0-9.\-]+:80/|https://[a-z0-9.\-]+:443/)"


def canonicalize_urls(arr, max_len: int = DEFAULT_MAX_URL_LENGTH) -> np.ndarray:
    """Vectorized ``canonicalize(u, u)`` over a URL-list column → object
    ndarray aligned with the input (None = dropped / over-length).

    The dominant shape in a ``--url-list`` file (crawler.rs:226-230) is
    an already-canonical absolute URL; those pass through with zero
    per-row Python.  Everything else falls back to the scalar
    fast/full gauntlet for exact parity (property-tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    elif not isinstance(arr, (pa.Array,)):
        try:
            arr = pa.array(list(arr), type=pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            seq = list(arr)
            out = np.empty(len(seq), dtype=object)
            for i, u in enumerate(seq):
                c = canonicalize_fast(u, u) if u else None
                if c is None:
                    c = canonicalize(u, u) if u else None
                out[i] = c if c is not None and len(c) <= max_len else None
            return out
    n = len(arr)
    out = np.empty(n, dtype=object)
    if n == 0:
        return out
    admit = pc.and_(
        pc.and_(
            pc.match_substring_regex(arr, pattern=_VEC_CANON_RE),
            pc.invert(pc.match_substring_regex(arr, pattern=_FAST_ABS_BAD_RE.pattern)),
        ),
        pc.and_(
            pc.invert(pc.match_substring_regex(arr, pattern=_VEC_TRAIL_RE)),
            pc.and_(
                pc.invert(pc.match_substring_regex(arr, pattern=_VEC_DEFAULT_PORT_RE)),
                pc.less_equal(pc.utf8_length(arr), max_len),
            ),
        ),
    )
    admit_np = pc.fill_null(admit, False).to_numpy(zero_copy_only=False)
    vals = arr.to_numpy(zero_copy_only=False)
    out[admit_np] = vals[admit_np]
    miss = np.nonzero(~admit_np)[0]
    for i in miss:
        u = vals[i]
        if u is None or not u:
            out[i] = None
            continue
        c = canonicalize_fast(u, u)
        if c is None:
            c = canonicalize(u, u)
        out[i] = c if c is not None and len(c) <= max_len else None
    return out


def canonicalize_many(
    hrefs,
    bases,
    *,
    remove_query_params: bool = False,
    keep_query_params: tuple[str, ...] = (),
) -> np.ndarray:
    """Row-wise canonicalize over aligned href/base columns → object array
    (None where dropped).  Called inside map_batches."""
    out = np.empty(len(hrefs), dtype=object)
    for i, (h, b) in enumerate(zip(hrefs, bases)):
        out[i] = canonicalize(
            h, b, remove_query_params=remove_query_params, keep_query_params=keep_query_params
        )
    return out


# scalar fast path: already-lowercase safe host (exactly what the
# gauntlet's canonical URLs carry) up to the first /:?# — identical to
# urlsplit().hostname on that subset, ~15× cheaper per call
_FAST_HOST_RE = re.compile(r"^https?://([a-z0-9.\-]+)(?=[/:?#]|$)")


def host_of(url: str) -> str:
    m = _FAST_HOST_RE.match(url)
    if m is not None:
        return m.group(1)
    try:
        return urlsplit(url).hostname or ""
    except ValueError:
        return ""


# Fast-path extraction: scheme '://' host up to : / ? #.  Gated by
# _CLEAN_RE, which admits only authorities free of userinfo, whitespace,
# control chars, brackets and backslashes — i.e. exactly the canonical
# URLs the gauntlet emits.  Anything else falls back to scalar host_of
# (urlsplit) for exact parity on hostile input.
_HOSTS_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<h>[^/?#:]*)"
_CLEAN_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^@%\s\x00-\x1f\[\]\\]*([/?#]|$)"


def hosts_of(urls, return_arrow: bool = False):
    """Vectorized :func:`host_of` over a column (object ndarray / list /
    Arrow array) — one C++ regex pass instead of per-row urlsplit (which
    was ~30% of gauntlet time on large waves).  Rows the regex can't
    handle fall back to the scalar path for exact parity.

    ``return_arrow=True`` returns a ``pa.StringArray`` — for canonical
    inputs (no fallback rows) the hosts never round-trip through Python
    objects at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(urls)
    if n == 0:
        return pa.array([], pa.string()) if return_arrow else np.empty(0, dtype=object)
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        arr = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    else:
        try:
            arr = pa.array(urls, type=pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            out = np.array([host_of(u) for u in urls], dtype=object)
            return pa.array(out, pa.string()) if return_arrow else out
    clean = pc.match_substring_regex(arr, pattern=_CLEAN_RE)
    ex = pc.extract_regex(arr, pattern=_HOSTS_RE)
    host = pc.if_else(
        pc.and_kleene(clean, pc.is_valid(ex)),
        pc.utf8_lower(pc.struct_field(ex, "h")),
        pa.scalar(None, pa.string()),
    )
    miss = np.nonzero(pc.is_null(host).to_numpy(zero_copy_only=False))[0]
    if return_arrow and not len(miss):
        return host
    out = host.to_numpy(zero_copy_only=False).astype(object)
    if len(miss):
        raw = arr.take(pa.array(miss)).to_pylist()
        for j, u in zip(miss, raw):
            out[j] = host_of(u if u is not None else "")
    return pa.array(out, pa.string()) if return_arrow else out


def strip_www(host: str) -> str:
    return host[4:] if host.startswith("www.") else host


def is_same_host(a: str, b: str) -> bool:
    """www-insensitive host equality — crawler.rs:776-780, 1348-1356."""
    return strip_www(a) == strip_www(b)


def normalize_url_to_initial(url: str, initial_scheme: str, initial_host: str) -> str:
    """``--force-relative-urls`` host/scheme folding (crawler.rs:1245-1265):
    when the URL's host is a www/case variant of the initial host, rewrite
    its host AND scheme to the initial's, so every variant shares one
    seen-set key."""
    try:
        sp = urlsplit(url)
    except ValueError:
        return url
    host = sp.hostname or ""
    if strip_www(host).lower() != strip_www(initial_host).lower():
        return url
    if host == initial_host and sp.scheme == initial_scheme:
        return url
    netloc = initial_host if sp.port is None else f"{initial_host}:{sp.port}"
    out = f"{initial_scheme}://{netloc}{sp.path}"
    if sp.query:
        out += f"?{sp.query}"
    if sp.fragment:
        out += f"#{sp.fragment}"
    return out


def domain_2nd_level(host: str) -> str | None:
    m = DOMAIN_2ND_LEVEL_RE.search(host)
    return m.group(1) if m else None


def extension_of(path: str) -> str:
    seg = path.rsplit("/", 1)[-1]
    if "." in seg:
        return seg.rsplit(".", 1)[-1].lower()
    return ""


def path_of(url: str) -> str:
    """URL path by string slicing for fragment-free http(s) URLs —
    identical to ``urlsplit(url).path`` there (no decoding or
    normalization happens in either); urlsplit fallback otherwise.
    urlsplit was ~20% of gauntlet _derive time via is_static_file."""
    if (url[:8] == "https://" or url[:7] == "http://") and "#" not in url:
        start = 8 if url[4] == "s" else 7
        q = url.find("?", start)
        p = url.find("/", start)
        if p < 0 or (0 <= q < p):  # no path, or "?" before any "/"
            return ""
        return url[p:q] if q >= 0 else url[p:]
    try:
        return urlsplit(url).path
    except ValueError:
        return ""


def is_static_file(url: str) -> bool:
    return extension_of(path_of(url)) in STATIC_EXTENSIONS


def is_sitemap_url(url: str) -> bool:
    """crawler.rs:1637-1640 — path contains 'sitemap' and ends .xml(.gz)."""
    p = path_of(url).lower()
    return "sitemap" in p and (p.endswith(".xml") or p.endswith(".xml.gz"))


def is_xml_url(url: str) -> bool:
    p = path_of(url).lower()
    return p.endswith(".xml") or p.endswith(".xml.gz")


def depth_of(path: str) -> int:
    """parsed_url.rs get_depth — '/' → 0, '/a/' → 1, '/a/b' → 2."""
    return len([s for s in path.split("/") if s])


def basename_of(url: str) -> str | None:
    """parsed_url.rs:465-482 — key of the non-200-responses guard."""
    # fast path: fragment-free http(s) URL → path/query by string
    # slicing (urlsplit was the gauntlet's remaining per-row hot spot);
    # identical because urlsplit neither decodes nor normalizes here
    if (url[:8] == "https://" or url[:7] == "http://") and "#" not in url:
        start = 8 if url[4] == "s" else 7
        q = url.find("?", start)
        p = url.find("/", start)
        if p < 0 or (0 <= q < p):  # no path, or "?" before any "/"
            return None
        path = url[p:q] if q >= 0 else url[p:]
        query = url[q + 1:] if q >= 0 else ""
    else:
        sp = urlsplit(url)
        path = sp.path
        query = sp.query
    if not path or path == "/":
        return None
    seg = path.rstrip("/").rsplit("/", 1)[-1]
    if not seg:
        return None
    if query and ("/" in query or "%2F" in query):
        return f"{seg}?{query}"
    return seg


def compile_wildcard_domain(pattern: str) -> re.Pattern:
    """crawler.rs:1871-1880 — ``*`` wildcards in --allowed-domain patterns."""
    return re.compile("^" + re.escape(pattern).replace(r"\*", ".*") + "$", re.I)
