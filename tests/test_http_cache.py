"""HTTP disk cache parity tests (http_client.rs:111-409)."""

import gzip
import json
import os
import time

from siteone_crawler_ray.sources.http_cache import (
    CachedFetcher,
    CachedResponse,
    HttpDiskCache,
)


def test_cache_key_layout():
    key = HttpDiskCache.cache_key("a.test", 443, ["/x?q=1"], "html")
    host_dir, shard, fname = key.split("/")
    assert host_dir == "a.test-443"
    assert len(shard) == 2 and fname.startswith(shard)
    assert fname.endswith(".html") and len(fname) == 32 + 5
    # deterministic over args order-sensitivity
    assert key == HttpDiskCache.cache_key("a.test", 443, ["/x?q=1"], "html")
    assert key != HttpDiskCache.cache_key("a.test", 443, ["/x?q=2"], "html")


def test_roundtrip_plain_and_gzip(tmp_path):
    for compression in (False, True):
        c = HttpDiskCache(str(tmp_path / f"c{compression}"), compression=compression)
        key = c.cache_key("h.test", 80, ["/p"])
        resp = CachedResponse("http://h.test/p", 200, b"\x00\xffbody",
                              {"content-type": "text/html"}, 0.25)
        c.put(key, resp)
        path = c._path(key)
        assert path.endswith(".cache.gz" if compression else ".cache")
        got = c.get(key)
        assert got.body == b"\x00\xffbody" and got.status_code == 200
        assert got.headers["content-type"] == "text/html"
        assert got.exec_time == 0.25


def test_error_statuses_not_served(tmp_path):
    c = HttpDiskCache(str(tmp_path))
    for code in (429, 500, 502, 503, -1, -2, -4):
        key = c.cache_key("h.test", 80, [f"/{code}"])
        c.put(key, CachedResponse("u", code))
        assert c.get(key) is None, code  # stored but never served
    key = c.cache_key("h.test", 80, ["/404"])
    c.put(key, CachedResponse("u", 404))
    assert c.get(key).status_code == 404  # 404 IS cacheable


def test_ttl_expiry(tmp_path):
    c = HttpDiskCache(str(tmp_path), ttl=3600)
    key = c.cache_key("h.test", 80, ["/p"])
    c.put(key, CachedResponse("u", 200, b"x"))
    assert c.get(key) is not None
    old = time.time() - 7200
    os.utime(c._path(key), (old, old))
    assert c.get(key) is None


def test_legacy_raw_body_fallback(tmp_path):
    c = HttpDiskCache(str(tmp_path))
    key = c.cache_key("h.test", 80, ["/legacy"])
    path = c._path(key)
    os.makedirs(os.path.dirname(path))
    # old cache format stored the body as raw text, not base64
    with open(path, "w") as f:
        json.dump({"url": "u", "status_code": 200, "body": "plain text!?",
                   "headers": {}, "exec_time": 0.0}, f)
    assert c.get(key).body == b"plain text!?"


def test_cached_fetcher_hit_miss(tmp_path):
    calls = []

    def backend(url):
        calls.append(url)
        return CachedResponse(url, 200, b"live", {}, 0.1)

    f = CachedFetcher(backend, HttpDiskCache(str(tmp_path), compression=True))
    r1 = f("https://site.test/a/page.html?x=1")
    r2 = f("https://site.test/a/page.html?x=1")
    assert r1.body == r2.body == b"live"
    assert calls == ["https://site.test/a/page.html?x=1"]  # second was a hit
    assert (f.hits, f.misses) == (1, 1)
    # gzip file landed under the host-port/shard layout
    found = [os.path.join(dp, fn) for dp, _, fs in os.walk(tmp_path) for fn in fs]
    assert len(found) == 1 and found[0].endswith(".html.cache.gz")
    assert "site.test-443" in found[0]
    with gzip.open(found[0]) as fh:
        assert json.load(fh)["status_code"] == 200
