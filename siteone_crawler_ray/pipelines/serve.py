"""Local report/export server — the reference's serve mode re-expressed.

Re-derivation of /root/reference/src/server.rs (ServeMode::Offline /
ServeMode::Markdown): raw HTTP/1.1 over a TCP listener, GET/HEAD only,
percent-decoding + segment-wise `..` traversal guard, the same path
resolution order (direct file → `<path>.md`/`index.md` for markdown,
direct → `<dir>/index.html` → `<path>.html` for offline), directory
listings for unresolved directories, per-extension content types, and
the same response header set (X-Frame-Options, X-Content-Type-Options,
Content-Security-Policy on HTML).

``handle_request`` is a pure bytes→bytes function so the whole protocol
surface unit-tests without sockets; ``run_server`` is the thin
socket loop.  Markdown renders through a self-contained renderer
targeted at the dialect our own markdown exporter emits (the reference
links against pulldown-cmark, unavailable here).
"""

from __future__ import annotations

import html as _html
import os
import re
import socket
import threading
from urllib.parse import unquote

ENGINE_TAG = "siteone-crawler-ray/0.1"

CONTENT_TYPES = {
    "html": "text/html; charset=utf-8", "htm": "text/html; charset=utf-8",
    "css": "text/css; charset=utf-8",
    "js": "application/javascript; charset=utf-8",
    "mjs": "application/javascript; charset=utf-8",
    "json": "application/json; charset=utf-8",
    "xml": "application/xml; charset=utf-8",
    "txt": "text/plain; charset=utf-8",
    "md": "text/markdown; charset=utf-8",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "svg": "image/svg+xml; charset=utf-8",
    "ico": "image/x-icon", "webp": "image/webp", "avif": "image/avif",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf", "pdf": "application/pdf", "zip": "application/zip",
    "mp4": "video/mp4", "webm": "video/webm", "mp3": "audio/mpeg",
}

_CSP = ("Content-Security-Policy", "default-src 'self' 'unsafe-inline' data:")

_STATUS_TEXT = {200: "OK", 301: "Moved Permanently", 400: "Bad Request",
                403: "Forbidden", 404: "Not Found", 405: "Method Not Allowed",
                500: "Internal Server Error"}

MARKDOWN_CSS = (
    "body{font-family:sans-serif;margin:0;background:#f6f8fa}"
    ".container{max-width:880px;margin:0 auto;padding:24px}"
    ".markdown-body{background:#fff;border:1px solid #d8dee4;border-radius:6px;"
    "padding:32px;line-height:1.55}"
    "pre{background:#f6f8fa;padding:12px;border-radius:6px;overflow-x:auto}"
    "code{font-family:monospace}table{border-collapse:collapse}"
    "td,th{border:1px solid #d8dee4;padding:4px 10px}"
    "blockquote{border-left:4px solid #d8dee4;margin-left:0;padding-left:12px;color:#57606a}"
)


def build_response(status: int, content_type: str, body: bytes,
                   extra_headers: tuple = ()) -> bytes:
    """server.rs:358-390 response framing (same header set/order)."""
    header = (
        f"HTTP/1.1 {status} {_STATUS_TEXT.get(status, 'Unknown')}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"X-Powered-By: {ENGINE_TAG}\r\n"
        "X-Frame-Options: DENY\r\n"
        "X-Content-Type-Options: nosniff\r\n"
        "Connection: close\r\n"
    )
    for name, value in extra_headers:
        header += f"{name}: {value}\r\n"
    return (header + "\r\n").encode() + body


def content_type_for(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower() if "." in os.path.basename(path) else ""
    return CONTENT_TYPES.get(ext, "application/octet-stream")


def _is_within_root(root: str, path: str) -> bool:
    try:
        return os.path.realpath(path).startswith(os.path.realpath(root) + os.sep) \
            or os.path.realpath(path) == os.path.realpath(root)
    except OSError:
        return False


def resolve_markdown_path(root: str, rel: str) -> str | None:
    """server.rs:249-280 lookup order."""
    if not rel:
        idx = os.path.join(root, "index.md")
        return idx if os.path.isfile(idx) else None
    full = os.path.join(root, rel)
    if os.path.isfile(full):
        return full
    md = os.path.join(root, rel.rstrip("/") + ".md")
    if os.path.isfile(md):
        return md
    idx = os.path.join(full, "index.md")
    return idx if os.path.isfile(idx) else None


def resolve_offline_path(root: str, rel: str) -> str | None:
    """server.rs:301-330 lookup order (directory index.html preferred
    over a same-named .html redirect stub)."""
    if not rel:
        idx = os.path.join(root, "index.html")
        return idx if os.path.isfile(idx) else None
    full = os.path.join(root, rel)
    if os.path.isfile(full):
        return full
    idx = os.path.join(root, rel.rstrip("/"), "index.html")
    if os.path.isfile(idx):
        return idx
    htm = os.path.join(root, rel.rstrip("/") + ".html")
    return htm if os.path.isfile(htm) else None


def directory_listing(dir_path: str, url_path: str, is_markdown: bool) -> str:
    rows = []
    try:
        entries = sorted(os.listdir(dir_path))
    except OSError:
        entries = []
    base = "/" + url_path.strip("/")
    if base == "/":
        base = ""
    for e in entries:
        full = os.path.join(dir_path, e)
        label = e + ("/" if os.path.isdir(full) else "")
        href = f"{base}/{e}"
        if is_markdown and e.endswith(".md"):
            href = href[:-3]
        rows.append(f'<li><a href="{_html.escape(href, quote=True)}">'
                    f"{_html.escape(label)}</a></li>")
    title = _html.escape(url_path or "/")
    return (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        f"<title>Index of {title}</title><style>{MARKDOWN_CSS}</style></head>"
        "<body><div class=\"container\"><article class=\"markdown-body\">"
        f"<h1>Index of {title}</h1><ul>{''.join(rows)}</ul>"
        "</article></div></body></html>"
    )


def serve_static_file(path: str, extra: tuple = ()) -> bytes:
    try:
        with open(path, "rb") as f:
            body = f.read()
    except OSError:
        return build_response(500, "text/plain", b"Internal Server Error")
    return build_response(200, content_type_for(path), body, extra)


def _404(is_markdown: bool) -> bytes:
    if is_markdown:
        body = (
            "<!DOCTYPE html>\n<html lang=\"en\">\n<head><meta charset=\"utf-8\">"
            f"<title>404 Not Found</title>\n<style>{MARKDOWN_CSS}</style>\n</head>\n"
            "<body>\n<div class=\"container\">\n<article class=\"markdown-body\">\n"
            "<h1>404 - Page Not Found</h1>\n<p>The requested page was not found.</p>\n"
            "<p><a href=\"/\">Back to home</a></p>\n</article>\n</div>\n</body>\n</html>"
        )
    else:
        body = ("<!DOCTYPE html>\n<html><body><h1>404 Not Found</h1>"
                "<p>The requested file was not found.</p></body></html>")
    return build_response(404, "text/html; charset=utf-8", body.encode())


def serve_markdown_request(root: str, rel: str) -> bytes:
    path = resolve_markdown_path(root, rel)
    if path is not None and not _is_within_root(root, path):
        return build_response(403, "text/plain", b"Forbidden")
    if path is not None and path.endswith(".md"):
        try:
            with open(path) as f:
                content = f.read()
        except OSError:
            return _404(True)
        if not content.strip():
            # server.rs:221-229: strip a trailing index.md from the URL
            url_path = rel.rstrip("/")
            if url_path.endswith("index.md"):
                url_path = url_path[: -len("index.md")].rstrip("/")
            listing = directory_listing(os.path.dirname(path), url_path, True)
            return build_response(200, "text/html; charset=utf-8", listing.encode(), (_CSP,))
        page = render_markdown_to_html(content, rel)
        return build_response(200, "text/html; charset=utf-8", page.encode(), (_CSP,))
    if path is not None:
        return serve_static_file(path, (_CSP,))
    dir_path = os.path.join(root, rel)
    if os.path.isdir(dir_path) and _is_within_root(root, dir_path):
        listing = directory_listing(dir_path, rel, True)
        return build_response(200, "text/html; charset=utf-8", listing.encode(), (_CSP,))
    return _404(True)


def serve_offline_request(root: str, rel: str) -> bytes:
    path = resolve_offline_path(root, rel)
    if path is not None and not _is_within_root(root, path):
        return build_response(403, "text/plain", b"Forbidden")
    if path is not None:
        return serve_static_file(path, (_CSP,))
    dir_path = os.path.join(root, rel)
    if os.path.isdir(dir_path) and _is_within_root(root, dir_path):
        listing = directory_listing(dir_path, rel, False)
        return build_response(200, "text/html; charset=utf-8", listing.encode(), (_CSP,))
    return _404(False)


def handle_request(raw: bytes, root: str, is_markdown: bool) -> bytes:
    """server.rs:106-196 request handling as a pure function."""
    try:
        first_line = raw.split(b"\r\n", 1)[0].decode("utf-8", "replace")
    except Exception:
        return build_response(400, "text/plain", b"Bad Request")
    parts = first_line.split()
    if len(parts) < 2 or parts[0] not in ("GET", "HEAD"):
        return build_response(405, "text/plain", b"Method Not Allowed",
                              (("Allow", "GET, HEAD"),))
    decoded = unquote(parts[1])
    clean = decoded.split("?", 1)[0].split("#", 1)[0]
    normalized = clean.replace("\\", "/")
    if any(seg == ".." for seg in normalized.split("/")):
        return build_response(403, "text/plain", b"Forbidden")
    rel = normalized.lstrip("/")
    resp = (serve_markdown_request(root, rel) if is_markdown
            else serve_offline_request(root, rel))
    if parts[0] == "HEAD":
        end = resp.find(b"\r\n\r\n")
        if end >= 0:
            resp = resp[: end + 4]
    return resp


# header cap: a request line + headers beyond this is hostile input
_MAX_REQUEST_BYTES = 64 * 1024


def _recv_request(conn: socket.socket) -> bytes:
    """Read until the end of the header block (``\\r\\n\\r\\n``) or the
    size cap — a request line split across TCP segments (long
    percent-encoded URLs, proxies) must not be truncated and mis-parsed
    as a bad request.  GET-only server: the body, if any, is ignored."""
    buf = bytearray()
    while len(buf) < _MAX_REQUEST_BYTES:
        part = conn.recv(8192)
        if not part:
            break
        start = max(0, len(buf) - 3)  # terminator may straddle chunks
        buf += part
        if b"\r\n\r\n" in buf[start:]:
            break
    return bytes(buf)


def run_server(root: str, *, markdown: bool = False, port: int = 8321,
               bind_address: str = "127.0.0.1",
               ready: threading.Event | None = None,
               stop: threading.Event | None = None) -> int:
    """Accept loop (server.rs:23-104).  Returns the bound port; blocks
    until ``stop`` is set (or forever without one)."""
    if not os.path.isdir(root):
        raise NotADirectoryError(root)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((bind_address, port))
    srv.listen(16)
    srv.settimeout(0.25)
    bound = srv.getsockname()[1]
    if ready is not None:
        ready.port = bound  # type: ignore[attr-defined]
        ready.set()
    try:
        while stop is None or not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            with conn:
                try:
                    conn.settimeout(30)
                    raw = _recv_request(conn)
                    if raw:
                        conn.sendall(handle_request(raw, root, markdown))
                except OSError:
                    pass
    finally:
        srv.close()
    return bound


# ---- markdown → HTML rendering (server.rs:446-520 analogue) ---------------

_FENCE_RE = re.compile(r"^```(\w*)\s*$")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_HR_RE = re.compile(r"^(-{3,}|\*{3,}|_{3,})\s*$")
_OL_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_UL_RE = re.compile(r"^(\s*)[-*+]\s+(.*)$")
_TABLE_SEP_RE = re.compile(r"^\|?[\s:|-]+\|[\s:|-]*$")

_INLINE_CODE_RE = re.compile(r"`([^`]+)`")
_IMG_INLINE_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)\)")
_LINK_INLINE_RE = re.compile(r"\[([^\]]+)\]\(([^)\s]*)\)")
_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*")
_EM_RE = re.compile(r"(?<!\*)\*([^*]+)\*(?!\*)")
_STRIKE_RE = re.compile(r"~~([^~]+)~~")


def _inline(text: str) -> str:
    out = _html.escape(text, quote=False)
    out = _INLINE_CODE_RE.sub(lambda m: f"<code>{m.group(1)}</code>", out)
    out = _IMG_INLINE_RE.sub(
        lambda m: f'<img src="{m.group(2)}" alt="{m.group(1)}">', out)
    out = _LINK_INLINE_RE.sub(
        lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', out)
    out = _BOLD_RE.sub(lambda m: f"<strong>{m.group(1)}</strong>", out)
    out = _EM_RE.sub(lambda m: f"<em>{m.group(1)}</em>", out)
    out = _STRIKE_RE.sub(lambda m: f"<del>{m.group(1)}</del>", out)
    return out


_ID_STRIP_RE = re.compile(r"[^a-z0-9 -]")


def _heading_id(text: str) -> str:
    return _ID_STRIP_RE.sub("", text.lower()).strip().replace(" ", "-")


def render_markdown_body(md: str) -> str:
    """Block-level pass over the dialect our exporter emits: ATX
    headings (with anchor ids like server.rs add_heading_ids), fenced
    code, blockquotes, ordered/unordered lists, pipe tables, hr,
    paragraphs."""
    # straight quotes like server.rs:449-452
    md = md.replace("“", '"').replace("”", '"')
    md = md.replace("‘", "'").replace("’", "'")
    lines = md.split("\n")
    out: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        m = _FENCE_RE.match(line)
        if m:
            lang = m.group(1)
            block = []
            i += 1
            while i < n and not _FENCE_RE.match(lines[i]):
                block.append(lines[i])
                i += 1
            i += 1  # closing fence
            cls = f' class="language-{lang}"' if lang else ""
            out.append(f"<pre><code{cls}>"
                       + _html.escape("\n".join(block)) + "</code></pre>")
            continue
        m = _HEADING_RE.match(line)
        if m:
            lvl = len(m.group(1))
            text = m.group(2).strip()
            hid = f' id="{_heading_id(text)}"' if lvl <= 4 else ""
            out.append(f"<h{lvl}{hid}>{_inline(text)}</h{lvl}>")
            i += 1
            continue
        if _HR_RE.match(line):
            out.append("<hr>")
            i += 1
            continue
        if line.startswith(">"):
            block = []
            while i < n and lines[i].startswith(">"):
                block.append(lines[i].lstrip("> ").rstrip())
                i += 1
            out.append("<blockquote><p>" + _inline(" ".join(block)) + "</p></blockquote>")
            continue
        if _UL_RE.match(line) or _OL_RE.match(line):
            ordered = bool(_OL_RE.match(line))
            tag = "ol" if ordered else "ul"
            items = []
            while i < n:
                m = (_OL_RE.match(lines[i]) if ordered else _UL_RE.match(lines[i]))
                if not m:
                    break
                items.append(f"<li>{_inline(m.groups()[-1].strip())}</li>")
                i += 1
            out.append(f"<{tag}>{''.join(items)}</{tag}>")
            continue
        if "|" in line and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
            header = [c.strip() for c in line.strip().strip("|").split("|")]
            i += 2
            rows = []
            while i < n and "|" in lines[i] and lines[i].strip():
                rows.append([c.strip() for c in lines[i].strip().strip("|").split("|")])
                i += 1
            thead = "".join(f"<th>{_inline(c)}</th>" for c in header)
            tbody = "".join(
                "<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in r) + "</tr>"
                for r in rows)
            out.append(f"<table><thead><tr>{thead}</tr></thead><tbody>{tbody}</tbody></table>")
            continue
        if not line.strip():
            i += 1
            continue
        para = []
        while i < n and lines[i].strip() and not (
            _HEADING_RE.match(lines[i]) or _FENCE_RE.match(lines[i])
            or _UL_RE.match(lines[i]) or _OL_RE.match(lines[i])
            or lines[i].startswith(">") or _HR_RE.match(lines[i])
        ):
            para.append(lines[i].strip())
            i += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
    return "\n".join(out)


def render_markdown_to_html(md: str, request_path: str) -> str:
    title = _html.escape(request_path.strip("/") or "index")
    return (
        "<!DOCTYPE html>\n<html lang=\"en\">\n<head><meta charset=\"utf-8\">"
        f"<title>{title}</title><style>{MARKDOWN_CSS}</style></head>\n"
        "<body><div class=\"container\"><article class=\"markdown-body\">\n"
        + render_markdown_body(md)
        + "\n</article></div></body></html>"
    )
