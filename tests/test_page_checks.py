"""SEO / accessibility / security analyzer checks (SURVEY §2.10)."""

from __future__ import annotations

import pyarrow as pa

from siteone_crawler_ray.functions.page_checks import (
    accessibility_checks,
    findings_summary,
    page_checks_batch,
    security_checks,
    seo_checks,
)


def rules(findings):
    return {r for r, _ in findings}


def test_seo_checks():
    good = ("<html lang='en'><head><title>Hi</title>"
            "<meta name='description' content='d'>"
            "<link rel='canonical' href='/x'>"
            "<meta property='og:title' content='t'></head>"
            "<body><h1>A</h1><h2>B</h2></body></html>")
    assert seo_checks(good) == []
    bad = "<html><body><h2>no h1</h2><h4>skip</h4></body></html>"
    r = rules(seo_checks(bad))
    assert {"missing-title", "missing-description", "missing-h1", "heading-level-skip"} <= r
    long_title = f"<title>{'x' * 70}</title><h1>a</h1>"
    assert "long-title" in rules(seo_checks(long_title))
    multi = "<title>t</title><h1>a</h1><h1>b</h1>"
    assert "multiple-h1" in rules(seo_checks(multi))


def test_accessibility_checks():
    ok = "<html lang='en'><img src='/a.png' alt='pic'><input type='hidden'></html>"
    assert accessibility_checks(ok) == []
    bad = "<html><img src='/a.png'><input type='text'></html>"
    r = rules(accessibility_checks(bad))
    assert {"img-missing-alt", "missing-html-lang", "input-missing-label"} == r


def test_security_checks():
    good = {
        "strict-transport-security": "max-age=63072000",
        "content-security-policy": "default-src 'self'",
        "x-content-type-options": "nosniff",
        "referrer-policy": "no-referrer",
        "server": "nginx",
        "set-cookie": "sid=1; Secure; HttpOnly",
    }
    assert security_checks(good) == []
    bad = {"server": "nginx/1.18.0", "set-cookie": "sid=1"}
    r = rules(security_checks(bad))
    assert {"missing-hsts", "missing-csp", "missing-x-frame-options",
            "missing-x-content-type-options", "missing-referrer-policy",
            "server-version-disclosure", "cookie-missing-secure",
            "cookie-missing-httponly"} == r


def test_page_checks_pipeline(ray_session):
    import ray.data as rd

    from siteone_crawler_ray.functions.html_extract import spans_to_html
    from siteone_crawler_ray.sources.corpus import make_graph_corpus

    docs = make_graph_corpus(seed=3, hosts=2, total_pages=80)["documents"]
    bodies = [spans_to_html(r) for r in docs["spans"].to_pylist()]
    t = pa.table({"url": docs["doc_id"], "body": pa.array(bodies, pa.string())})
    ds = rd.from_arrow([t.slice(i, 20) for i in range(0, t.num_rows, 20)])
    summary = findings_summary(ds.map_batches(page_checks_batch, batch_format="pyarrow"))
    assert summary.num_rows > 0
    cats = set(summary["category"].to_pylist())
    assert "seo" in cats and "accessibility" in cats
    # counts must sum to the raw finding count
    raw = ds.map_batches(page_checks_batch, batch_format="pyarrow").count()
    assert sum(summary["n"].to_pylist()) == raw


def test_best_practice_checks():
    from siteone_crawler_ray.functions.page_checks import best_practice_checks

    svg_dup = "<svg><circle/></svg><p>x</p><svg><circle/></svg>"
    assert ("duplicate-inline-svg", "NOTICE") in best_practice_checks(svg_dup)
    svg_distinct = "<svg><circle/></svg><svg><rect/></svg>"
    assert not any(r == "duplicate-inline-svg" for r, _ in best_practice_checks(svg_distinct))

    deep = "<div>" * 40 + "x" + "</div>" * 40
    assert ("dom-depth-exceeded", "NOTICE") in best_practice_checks(deep)
    shallow = "<div><p>x</p></div>"
    assert not any(r == "dom-depth-exceeded" for r, _ in best_practice_checks(shallow))

    plain_phone = "<p>Call 555-123-4567 today</p>"
    assert ("phone-not-clickable", "NOTICE") in best_practice_checks(plain_phone)
    linked = '<a href="tel:+15551234567">555-123-4567</a>'
    assert not any(r == "phone-not-clickable" for r, _ in best_practice_checks(linked))
    # void tags must not inflate DOM depth
    voids = "<div>" + "<br><img src='/a.png'>" * 50 + "</div>"
    assert not any(r == "dom-depth-exceeded" for r, _ in best_practice_checks(voids))
