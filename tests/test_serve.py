"""Serve-mode tests (server.rs parity: protocol handling, path
resolution order, traversal guard, markdown rendering, live socket)."""

import os
import threading

from siteone_crawler_ray.pipelines.serve import (
    build_response,
    handle_request,
    render_markdown_body,
    resolve_markdown_path,
    resolve_offline_path,
    run_server,
)


def _site(tmp_path):
    root = tmp_path / "site"
    (root / "sub").mkdir(parents=True)
    (root / "index.html").write_text("<h1>home</h1>")
    (root / "about.html").write_text("<h1>about</h1>")
    (root / "sub" / "index.html").write_text("<h1>sub</h1>")
    (root / "style.css").write_text("body{}")
    return str(root)


def _md_site(tmp_path):
    root = tmp_path / "md"
    root.mkdir()
    (root / "index.md").write_text("# Home\n\nHello **world** [link](/about)\n")
    (root / "about.md").write_text("# About\n\n- a\n- b\n\n| h1 | h2 |\n|---|---|\n| x | y |\n")
    (root / "empty.md").write_text("   \n")
    return str(root)


def _status(resp: bytes) -> int:
    return int(resp.split(b" ", 2)[1])


def _body(resp: bytes) -> bytes:
    return resp.split(b"\r\n\r\n", 1)[1]


def test_offline_resolution_and_protocol(tmp_path):
    root = _site(tmp_path)
    # resolution order: direct file → dir index.html → .html extension
    assert resolve_offline_path(root, "").endswith("index.html")
    assert resolve_offline_path(root, "style.css").endswith("style.css")
    assert resolve_offline_path(root, "sub").endswith(os.path.join("sub", "index.html"))
    assert resolve_offline_path(root, "about").endswith("about.html")
    assert resolve_offline_path(root, "nope") is None

    ok = handle_request(b"GET / HTTP/1.1\r\n\r\n", root, False)
    assert _status(ok) == 200 and b"home" in _body(ok)
    assert b"X-Content-Type-Options: nosniff" in ok
    assert b"Content-Security-Policy" in ok
    css = handle_request(b"GET /style.css HTTP/1.1\r\n\r\n", root, False)
    assert b"Content-Type: text/css" in css
    # HEAD: headers only, Content-Length of the full body
    head = handle_request(b"HEAD /about HTTP/1.1\r\n\r\n", root, False)
    assert _status(head) == 200 and head.endswith(b"\r\n\r\n")
    assert b"Content-Length: 14" in head
    # 404 / 405 / 403 traversal
    assert _status(handle_request(b"GET /nope HTTP/1.1\r\n\r\n", root, False)) == 404
    assert _status(handle_request(b"POST / HTTP/1.1\r\n\r\n", root, False)) == 405
    assert _status(handle_request(b"GET /../etc/passwd HTTP/1.1\r\n\r\n", root, False)) == 403
    assert _status(handle_request(b"GET /%2e%2e/x HTTP/1.1\r\n\r\n", root, False)) == 403
    # query string + fragment stripped
    q = handle_request(b"GET /about?x=1#frag HTTP/1.1\r\n\r\n", root, False)
    assert _status(q) == 200


def test_markdown_serving_and_listing(tmp_path):
    root = _md_site(tmp_path)
    assert resolve_markdown_path(root, "").endswith("index.md")
    assert resolve_markdown_path(root, "about").endswith("about.md")

    page = handle_request(b"GET / HTTP/1.1\r\n\r\n", root, True)
    assert _status(page) == 200
    body = _body(page).decode()
    assert "<h1 id=\"home\">Home</h1>" in body
    assert "<strong>world</strong>" in body and '<a href="/about">link</a>' in body
    about = _body(handle_request(b"GET /about HTTP/1.1\r\n\r\n", root, True)).decode()
    assert "<li>a</li>" in about and "<th>h1</th>" in about and "<td>y</td>" in about
    # empty markdown file → directory listing (server.rs:221-229)
    empty = _body(handle_request(b"GET /empty HTTP/1.1\r\n\r\n", root, True)).decode()
    assert "Index of" in empty and 'href="/empty/about"' in empty
    # 404 page carries the styled markdown body
    nf = handle_request(b"GET /missing HTTP/1.1\r\n\r\n", root, True)
    assert _status(nf) == 404 and b"404 - Page Not Found" in _body(nf)


def test_markdown_renderer_blocks():
    html = render_markdown_body(
        "# T\n\n```py\nx = 1 < 2\n```\n\n> quoted\n\n1. one\n2. two\n\n---\n\npara *em* `c`\n")
    assert '<pre><code class="language-py">x = 1 &lt; 2</code></pre>' in html
    assert "<blockquote><p>quoted</p></blockquote>" in html
    assert "<ol><li>one</li><li>two</li></ol>" in html
    assert "<hr>" in html and "<em>em</em>" in html and "<code>c</code>" in html


def test_live_socket_roundtrip(tmp_path):
    import http.client

    root = _site(tmp_path)
    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(target=run_server, args=(root,),
                         kwargs=dict(port=0, ready=ready, stop=stop), daemon=True)
    t.start()
    assert ready.wait(5)
    port = ready.port
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        conn.request("GET", "/sub/")
        r = conn.getresponse()
        assert r.status == 200 and b"sub" in r.read()
        assert r.getheader("X-Powered-By", "").startswith("siteone-crawler-ray")
    finally:
        stop.set()
        t.join(3)


def test_response_framing():
    r = build_response(200, "text/plain", b"abc")
    head, body = r.split(b"\r\n\r\n", 1)
    assert body == b"abc"
    lines = head.split(b"\r\n")
    assert lines[0] == b"HTTP/1.1 200 OK"
    assert b"Content-Length: 3" in lines
    assert b"Connection: close" in lines


def test_request_split_across_tcp_segments(tmp_path):
    """ADVICE r3: a request line/headers arriving in multiple TCP
    segments (long URLs, proxies) must be assembled until CRLFCRLF, not
    truncated at the first recv."""
    import socket
    import time

    root = _site(tmp_path)
    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(target=run_server, args=(root,),
                         kwargs=dict(port=0, ready=ready, stop=stop), daemon=True)
    t.start()
    assert ready.wait(5)
    port = ready.port
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        # drip the request byte-group by byte-group with TCP_NODELAY so
        # each send is its own segment
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        req = b"GET /sub/ HTTP/1.1\r\nHost: x\r\nX-Pad: " + b"a" * 9000 + b"\r\n\r\n"
        for i in range(0, len(req), 700):
            s.sendall(req[i:i + 700])
            time.sleep(0.01)
        resp = b""
        while True:
            part = s.recv(65536)
            if not part:
                break
            resp += part
        assert resp.startswith(b"HTTP/1.1 200"), resp[:80]
        assert b"sub" in resp
        s.close()
    finally:
        stop.set()
        t.join(3)


def test_request_terminator_straddles_three_segments(tmp_path):
    """Review finding r4: CRLFCRLF split one byte per segment must still
    terminate the read (rolling-buffer check, not a 2-chunk window)."""
    import socket
    import time

    root = _site(tmp_path)
    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(target=run_server, args=(root,),
                         kwargs=dict(port=0, ready=ready, stop=stop), daemon=True)
    t.start()
    assert ready.wait(5)
    try:
        s = socket.create_connection(("127.0.0.1", ready.port), timeout=5)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        s.sendall(b"GET /sub/ HTTP/1.1\r\nHost: x")
        time.sleep(0.02)
        for b in (b"\r", b"\n", b"\r", b"\n"):
            s.sendall(b)
            time.sleep(0.02)
        resp = b""
        s.settimeout(5)
        while True:
            part = s.recv(65536)
            if not part:
                break
            resp += part
        assert resp.startswith(b"HTTP/1.1 200"), resp[:60]
        s.close()
    finally:
        stop.set()
        t.join(3)
