"""Offline exporter parity fixtures — expectations ported from the
reference's own test suite
(/root/reference/src/export/utils/offline_url_converter.rs:583-1100)."""

from __future__ import annotations

import pytest

from siteone_crawler_ray.functions.offline import (
    OfflineRewriter,
    OfflineUrl,
    convert_url_to_relative,
    offline_base_url_depth,
    redirect_stub_html,
    sanitize_file_path,
)


def _allowed_static(h):
    return h in ("cdn.siteone.io", "cdn.webflow.com", "nextjs.org")


def _allowed_crawl(h):
    return h in ("svelte.dev", "nextjs.org")


def convert(initial, base, target, attribute=None):
    return convert_url_to_relative(
        initial, base, target, attribute=attribute,
        allowed_static=_allowed_static, allowed_crawl=_allowed_crawl,
    )


# offline_url_converter.rs:622-704 (get_offline_base_url_depth)
@pytest.mark.parametrize("path,depth", [
    ("/", 0), ("/foo", 0), ("/foo/", 1), ("/foo/bar", 1), ("/foo/bar/", 2),
])
def test_base_url_depth(path, depth):
    assert offline_base_url_depth(path) == depth


# offline_url_converter.rs:710-1010 (core conversions)
@pytest.mark.parametrize("initial,base,target,expected", [
    ("https://siteone.io/", "https://siteone.io/", "https://siteone.io/", "index.html"),
    ("https://siteone.io/", "https://siteone.io/", "https://siteone.io/page", "page.html"),
    ("https://siteone.io/", "https://siteone.io", "https://siteone.io/page/", "page/index.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://siteone.io/page#fragment",
     "../page.html#fragment"),
    ("https://siteone.io/", "https://siteone.io/", "/page", "page.html"),
    ("https://siteone.io/", "https://siteone.io/", "/page/", "page/index.html"),
    ("https://siteone.io/", "https://siteone.io/", "page", "page.html"),
    ("https://siteone.io/", "https://siteone.io/path/", "../page", "../page.html"),
    ("https://siteone.io/", "https://siteone.io/path/", "../page/", "../page/index.html"),
    ("https://siteone.io/", "https://siteone.io/path/", "https://siteone.io/path/page",
     "../path/page.html"),
    # external allowed domains → _<host>/ prefix
    ("https://siteone.io/", "https://siteone.io/", "https://nextjs.org/", "_nextjs.org/index.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://svelte.dev/x", "../_svelte.dev/x.html"),
    ("https://siteone.io/", "https://siteone.io/t/", "https://svelte.dev/x/file.css",
     "../_svelte.dev/x/file.css"),
    # backlinks to the initial domain
    ("https://siteone.io/", "https://nextjs.org/", "https://siteone.io/", "../index.html"),
    ("https://siteone.io/", "https://nextjs.org/subpage", "https://siteone.io/", "../index.html"),
    ("https://siteone.io/", "https://nextjs.org/subpage/", "https://siteone.io/a", "../../a.html"),
    ("https://siteone.io/", "https://nextjs.org/", "https://svelte.dev/page",
     "../_svelte.dev/page.html"),
    # protocol-relative
    ("https://siteone.io/", "https://siteone.io/", "//nextjs.org/", "_nextjs.org/index.html"),
    ("https://siteone.io/", "https://nextjs.org/", "//siteone.io/page", "../page.html"),
    # fragment-only
    ("https://siteone.io/", "https://siteone.io/", "#fragment2", "#fragment2"),
    ("https://siteone.io/", "https://nextjs.org/", "#fragment3", "#fragment3"),
    # complex relative
    ("https://siteone.io/", "https://siteone.io/path/more/", "../../page", "../../page.html"),
    ("https://siteone.io/", "https://siteone.io/path/more/", "../../page/", "../../page/index.html"),
    # external CSS → external image chains
    ("https://siteone.io/", "https://cdn.siteone.io/siteone.io/css/styles.css",
     "https://cdn.webflow.com/a/b1.jpg", "../../../_cdn.webflow.com/a/b1.jpg"),
    ("https://siteone.io/", "https://cdn.siteone.io/siteone.io/css/hello/hi/styles.css",
     "https://cdn.webflow.com/b2.jpg", "../../../../../_cdn.webflow.com/b2.jpg"),
    ("https://siteone.io/", "https://cdn.siteone.io/siteone.io/css/hello/hi/styles.css",
     "https://siteone.io/test/image.jpg", "../../../../../test/image.jpg"),
    ("https://siteone.io/", "https://cdn.siteone.io/siteone.io/css/styles.css",
     "/abt.jpg", "../../abt.jpg"),
    ("https://siteone.io/", "https://cdn.siteone.io/siteone.io/css/styles.css",
     "../abz.jpg", "../abz.jpg"),
    # unknown domain → keep absolute
    ("https://siteone.io/", "https://siteone.io/", "https://unknown.com/", "https://unknown.com/"),
    ("https://siteone.io/", "https://siteone.io/", "http://unknown.com/page",
     "http://unknown.com/page"),
])
def test_convert_fixture(initial, base, target, expected):
    assert convert(initial, base, target) == expected


# offline_url_converter.rs:946-990 (query → md5 hash names)
def test_query_hash_names():
    r = convert("https://siteone.io/", "https://siteone.io/", "https://siteone.io/page?p=1")
    assert r.startswith("page.") and r.endswith(".html") and "?" not in r
    r = convert("https://siteone.io/", "https://siteone.io/", "?p=1")
    assert r.startswith("index.") and r.endswith(".html")
    r = convert("https://siteone.io/", "https://siteone.io/", "https://siteone.io/file.css?p=1")
    assert r.endswith(".css") and "?" not in r
    # same query → same hash, different query → different name
    a = convert("https://siteone.io/", "https://siteone.io/", "/p?x=1")
    b = convert("https://siteone.io/", "https://siteone.io/", "/p?x=1")
    c = convert("https://siteone.io/", "https://siteone.io/", "/p?x=2")
    assert a == b != c


def test_sanitize_dangerous_and_dynamic():
    # dangerous chars → _, dynamic extensions → .html, whitespace → _
    assert sanitize_file_path('a<b>:c.html') == "a_b_c.html"
    assert sanitize_file_path("page.php") == "page.php.html"
    assert sanitize_file_path("dir/page.aspx") == "dir/page.aspx.html"
    assert sanitize_file_path("a  b.html") == "a_b.html"
    # folder named like a static file gets '_' suffix
    assert sanitize_file_path("x/app.js/inner.html") == "x/app.js_/inner.html"
    # domain-like folder is kept
    assert sanitize_file_path("_nextjs.org/index.html") == "_nextjs.org/index.html"


def test_src_attribute_image_extension():
    # extension-less URL in src= without a guess → jpg; icon-ish → svg
    r = convert("https://siteone.io/", "https://siteone.io/", "/img/photo", attribute="src")
    assert r == "img/photo.jpg"
    r = convert("https://siteone.io/", "https://siteone.io/", "/img/favicon-icon", attribute="src")
    assert r == "img/favicon-icon.svg"


def test_rewriter_body_attributes():
    rw = OfflineRewriter("https://site-000.test/p/00000", allowed_static=(), allowed_crawl=())
    body = (
        '<a href="https://site-000.test/p/00003">x</a>'
        '<img src="/static/img/7.png">'
        '<img srcset="/static/img/7.png 1x, /static/img/8.png 2x">'
        '<a href="mailto:x@y.z">m</a>'
        '<a href="#frag">f</a>'
        '<a href="https://other.test/q">ext</a>'
    )
    out = rw.rewrite_body(body, "https://site-000.test/p/00001")
    assert 'href="../p/00003.html"' in out
    assert 'src="../static/img/7.png"' in out
    assert 'srcset="../static/img/7.png 1x, ../static/img/8.png 2x"' in out
    assert 'href="mailto:x@y.z"' in out  # non-http scheme untouched
    assert 'href="#frag"' in out
    assert 'href="https://other.test/q"' in out  # disallowed external stays absolute


def test_rewriter_escaped_attrs_in_inline_json():
    # html_processor.rs:111 RE_ESCAPED_HREF_SRC: Astro island props carry
    # escaped href\"...\" / src\"...\" inside inline JSON — the fourth
    # rewrite pass must convert them too.
    rw = OfflineRewriter("https://site-000.test/p/00000", allowed_static=(), allowed_crawl=())
    body = (
        '<astro-island props="{&quot;x&quot;:1}">'
        '<script>{"href\\":\\"https://site-000.test/p/00003\\","a":1,'
        '"src\\"=\\"/static/img/7.png\\",}</script>'
        '<a href="https://site-000.test/p/00004">plain</a>'
    )
    out = rw.rewrite_body(body, "https://site-000.test/p/00001")
    assert '"href\\":\\"../p/00003.html\\"' in out
    assert '"src\\"=\\"../static/img/7.png\\"' in out
    assert 'href="../p/00004.html"' in out  # normal pass still works
    # non-http scheme and fragment stay untouched in escaped form
    body2 = '{"href\\":\\"mailto:x@y.z\\"} {"href\\":\\"#frag\\"}'
    assert rw.rewrite_body(body2, "https://site-000.test/p/00001") == body2


def test_rewriter_batch_and_redirect_stub():
    import pyarrow as pa

    rw = OfflineRewriter("https://site-000.test/")
    batch = pa.table({
        "url": ["https://site-000.test/p/00001", "https://site-000.test/p/00002?a=1"],
        "body": ['<a href="/p/00002">n</a>', "<p>hi</p>"],
    })
    out = rw(batch)
    assert out.column_names == ["url", "offline_path", "body"]
    paths = out["offline_path"].to_pylist()
    assert paths[0] == "p/00001.html"
    assert paths[1].startswith("p/00002.") and paths[1].endswith(".html")
    stub = redirect_stub_html("../p/00002.html")
    assert 'http-equiv="refresh"' in stub and "../p/00002.html" in stub


def test_offline_url_parse_forms():
    base = OfflineUrl.parse("https://a.test/d/e/f.html")
    u = OfflineUrl.parse("./x", base)
    assert u.path == "/d/e/x"
    u = OfflineUrl.parse("y/z", base)
    assert u.path == "/d/e/y/z"
    u = OfflineUrl.parse("../up", base)
    assert u.path == "../up" and u.host is None
    u = OfflineUrl.parse("//h.test/p?q=1#f", None)
    assert u.host == "h.test" and u.path == "/p" and u.query == "q=1" and u.fragment == "f"


def test_strip_unwanted_code():
    from siteone_crawler_ray.functions.offline import strip_unwanted_code

    h = ('<script src="https://cdn.other/x.js"></script>'
         '<script src="/local.js"></script>'
         '<script>gtag("config")</script>'
         '<link rel="stylesheet" href="/s.css" crossorigin>'
         '<iframe src="https://facebook.com/plugin"></iframe><p>keep</p>')
    out = strip_unwanted_code(h, "me.test", remove_external_js=True,
                              remove_cross_origins=True,
                              remove_analytics=True, remove_socnets=True)
    assert "cdn.other" not in out            # external JS dropped
    assert '<script src="/local.js">' in out  # same-host JS kept
    assert "gtag" not in out                 # analytics block dropped
    assert "crossorigin" not in out          # attribute removed
    assert "facebook.com" not in out         # socnet iframe dropped
    assert "<p>keep</p>" in out
    # scripts/styles wholesale (html_processor.rs:397-416)
    both = strip_unwanted_code("<script>x</script><style>y</style><b>z</b>",
                               remove_scripts=True, remove_styles=True)
    assert both == "<b>z</b>"
    # cookie-consent scripts
    ck = strip_unwanted_code('<script src="/cookiebot.js"></script><p>k</p>',
                             remove_cookies_related=True)
    assert "cookiebot" not in ck and "<p>k</p>" in ck
