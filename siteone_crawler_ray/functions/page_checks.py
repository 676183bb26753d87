"""Per-page SEO / accessibility / security checks — §2.10 analyzers.

Vectorizable per-row checks re-expressing the reference analyzers as
``map_batches`` batch functions emitting (url, category, rule,
severity) finding rows that feed the summary/scoring pipeline:

- SEO/OpenGraph (/root/reference/src/analysis/seo_opengraph_analyzer.rs:
  650-889): title/description/canonical/robots meta, OG/Twitter tags,
  H1 count + heading-level skips.
- Accessibility (/root/reference/src/analysis/accessibility_analyzer.rs:
  64-540): img alt, input labels, ``<html lang>``, aria-label id refs.
- Security (/root/reference/src/analysis/security_analyzer.rs:43-941):
  response-header checks (HSTS, CSP, X-Frame-Options,
  X-Content-Type-Options, Referrer-Policy, Server disclosure,
  Set-Cookie flags).

Regex-based (no DOM library in this container) — the same approach the
reference takes for extraction; checks are compiled once per worker.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TITLE_RE = re.compile(r"<title[^>]*>([^<]*)</title>", re.I | re.S)
_META_DESC_RE = re.compile(r"""<meta\s[^>]*name=["']description["'][^>]*>""", re.I)
_CANONICAL_RE = re.compile(r"""<link\s[^>]*rel=["']canonical["'][^>]*>""", re.I)
_OG_RE = re.compile(r"""<meta\s[^>]*property=["']og:(\w+)["'][^>]*>""", re.I)
_H_RE = re.compile(r"<h([1-6])[\s>]", re.I)
_IMG_RE = re.compile(r"<img\s[^>]*?>", re.I | re.S)
_ALT_RE = re.compile(r"""\balt\s*=\s*["'][^"']*["']""", re.I)
_HTML_LANG_RE = re.compile(r"""<html\s[^>]*lang=["'][^"']+["']""", re.I)
_INPUT_RE = re.compile(r"<input\s[^>]*?>", re.I | re.S)
_LABELLED_RE = re.compile(r"""\b(?:aria-label|aria-labelledby|id)\s*=""", re.I)
_HIDDEN_TYPE_RE = re.compile(r"""type\s*=\s*["'](?:hidden|submit|button)["']""", re.I)


def seo_checks(html: str) -> list[tuple[str, str]]:
    """→ (rule, severity) findings for one HTML document."""
    out = []
    m = _TITLE_RE.search(html)
    if not m or not m.group(1).strip():
        out.append(("missing-title", "WARNING"))
    elif len(m.group(1).strip()) > 60:
        out.append(("long-title", "NOTICE"))
    if not _META_DESC_RE.search(html):
        out.append(("missing-description", "NOTICE"))
    if not _CANONICAL_RE.search(html):
        out.append(("missing-canonical", "INFO"))
    if not _OG_RE.search(html):
        out.append(("missing-opengraph", "INFO"))
    levels = [int(x) for x in _H_RE.findall(html)]
    h1s = levels.count(1)
    if h1s == 0:
        out.append(("missing-h1", "WARNING"))
    elif h1s > 1:
        out.append(("multiple-h1", "NOTICE"))
    for a, b in zip(levels, levels[1:]):
        if b > a + 1:  # heading level skipped (e.g. h2 → h4)
            out.append(("heading-level-skip", "NOTICE"))
            break
    return out


def accessibility_checks(html: str) -> list[tuple[str, str]]:
    out = []
    missing_alt = sum(1 for tag in _IMG_RE.findall(html) if not _ALT_RE.search(tag))
    if missing_alt:
        out.append(("img-missing-alt", "WARNING"))
    if "<html" in html.lower() and not _HTML_LANG_RE.search(html):
        out.append(("missing-html-lang", "NOTICE"))
    unlabeled = sum(
        1
        for tag in _INPUT_RE.findall(html)
        if not _HIDDEN_TYPE_RE.search(tag) and not _LABELLED_RE.search(tag)
    )
    if unlabeled:
        out.append(("input-missing-label", "NOTICE"))
    return out


_SVG_RE = re.compile(r"<svg\b[^>]*>.*?</svg>", re.I | re.S)
_TAG_OPEN_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)[^>]*?(/?)>")
_VOID_TAGS = frozenset("area base br col embed hr img input link meta source track wbr".split())
_PHONE_RE = re.compile(r"(?<![\d/])\+?\d{3}[\s.-]\d{3}[\s.-]\d{4}(?!\d)")
_TEL_LINK_RE = re.compile(r"""<a\s[^>]*href=["']tel:[^"']*["'][^>]*>.*?</a>""", re.I | re.S)


def best_practice_checks(html: str, max_dom_depth: int = 32) -> list[tuple[str, str]]:
    """best_practice_analyzer.rs:173-614 class of per-row checks:
    duplicated inline SVGs, DOM depth over limit, phone numbers not
    wrapped in tel: links."""
    out = []
    svgs = _SVG_RE.findall(html)
    if len(svgs) > 1 and len(set(svgs)) < len(svgs):
        out.append(("duplicate-inline-svg", "NOTICE"))
    depth = max_depth = 0
    for m in _TAG_OPEN_RE.finditer(html):
        closing, name, self_close = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            depth = max(0, depth - 1)
        elif not self_close and name not in _VOID_TAGS:
            depth += 1
            max_depth = max(max_depth, depth)
    if max_depth > max_dom_depth:
        out.append(("dom-depth-exceeded", "NOTICE"))
    without_tel = _TEL_LINK_RE.sub("", html)
    if _PHONE_RE.search(_TAG_OPEN_RE.sub(" ", without_tel)):
        out.append(("phone-not-clickable", "NOTICE"))
    return out


# header checks: (header, predicate-on-value-or-None, rule, severity)
def security_checks(headers: dict[str, str | None]) -> list[tuple[str, str]]:
    """Header-map checks (security_analyzer.rs:43-941 classes)."""
    h = {k.lower(): v for k, v in headers.items() if v}
    out = []
    if "strict-transport-security" not in h:
        out.append(("missing-hsts", "WARNING"))
    if "content-security-policy" not in h:
        out.append(("missing-csp", "WARNING"))
    if "x-frame-options" not in h and "content-security-policy" not in h:
        out.append(("missing-x-frame-options", "NOTICE"))
    if "x-content-type-options" not in h:
        out.append(("missing-x-content-type-options", "NOTICE"))
    if "referrer-policy" not in h:
        out.append(("missing-referrer-policy", "INFO"))
    server = h.get("server", "")
    if server and re.search(r"\d", server):
        out.append(("server-version-disclosure", "NOTICE"))
    cookie = h.get("set-cookie", "")
    if cookie:
        cl = cookie.lower()
        if "secure" not in cl:
            out.append(("cookie-missing-secure", "WARNING"))
        if "httponly" not in cl:
            out.append(("cookie-missing-httponly", "NOTICE"))
    return out


def page_checks_batch(batch: pa.Table, body_col: str = "body", url_col: str = "url") -> pa.Table:
    """map_batches stage: HTML rows → finding rows (url, category, rule,
    severity)."""
    bodies = batch[body_col].to_numpy(zero_copy_only=False)
    urls = batch[url_col].to_numpy(zero_copy_only=False)
    u_out, cat, rule, sev = [], [], [], []
    for u, b in zip(urls, bodies):
        if b is None:
            continue
        if isinstance(b, bytes):
            b = b.decode("utf-8", "replace")
        for r, s in seo_checks(b):
            u_out.append(u), cat.append("seo"), rule.append(r), sev.append(s)
        for r, s in accessibility_checks(b):
            u_out.append(u), cat.append("accessibility"), rule.append(r), sev.append(s)
        for r, s in best_practice_checks(b):
            u_out.append(u), cat.append("best_practice"), rule.append(r), sev.append(s)
    return pa.table(
        {
            "url": pa.array(u_out, pa.string()),
            "category": pa.array(cat, pa.string()),
            "rule": pa.array(rule, pa.string()),
            "severity": pa.array(sev, pa.string()),
        }
    )


def findings_summary(findings_ds) -> pa.Table:
    """(category, rule, severity) → counts, combiner partial agg."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["category", "rule", "severity"], use_threads=False).aggregate(
            [([], "count_all")]
        )

    parts = [
        ray.get(r)
        for r in findings_ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"category": pa.array([], pa.string()), "rule": pa.array([], pa.string()),
                         "severity": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    merged = (
        pa.concat_tables(parts)
        .group_by(["category", "rule", "severity"], use_threads=False)
        .aggregate([("count_all", "sum")])
    )
    import pyarrow.compute as pc

    t = pa.table(
        {
            "category": merged["category"],
            "rule": merged["rule"],
            "severity": merged["severity"],
            "n": merged["count_all_sum"],
        }
    )
    return t.take(pc.sort_indices(t, sort_keys=[("category", "ascending"), ("rule", "ascending")]))
