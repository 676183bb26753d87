"""HTML → Markdown conversion for live-HTML bodies.

Regex-based re-expression of the reference's DOM-walking converter
(/root/reference/src/export/utils/html_to_markdown.rs:42-760):
headings, paragraphs, links, images, bold/italic/code, lists,
blockquotes, pre blocks, simple tables; scripts/styles/comments and
aria-hidden elements are stripped first.  One pure function applied per
row inside ``map_batches`` (the reference's standalone
``convert_html_file_to_markdown`` entry point, main.rs:96-130).
"""

from __future__ import annotations

import re
from html import unescape

_STRIP_RES = [
    re.compile(r"<!--.*?-->", re.S),
    re.compile(r"<script\b[^>]*>.*?</script>", re.I | re.S),
    re.compile(r"<style\b[^>]*>.*?</style>", re.I | re.S),
    re.compile(r"""<[^>]+aria-hidden=["']true["'][^>]*>.*?</[^>]+>""", re.I | re.S),
]
_PRE_RE = re.compile(r"<pre\b[^>]*>(.*?)</pre>", re.I | re.S)
_CODE_RE = re.compile(r"<code\b[^>]*>(.*?)</code>", re.I | re.S)
_H_RE = re.compile(r"<h([1-6])\b[^>]*>(.*?)</h\1>", re.I | re.S)
_A_RE = re.compile(r"""<a\b[^>]*href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a>""", re.I | re.S)
_IMG_RE = re.compile(r"""<img\b[^>]*src\s*=\s*["']([^"']*)["'][^>]*>""", re.I)
_ALT_RE = re.compile(r"""alt\s*=\s*["']([^"']*)["']""", re.I)
_B_RE = re.compile(r"<(b|strong)\b[^>]*>(.*?)</\1>", re.I | re.S)
_I_RE = re.compile(r"<(i|em)\b[^>]*>(.*?)</\1>", re.I | re.S)
_LI_RE = re.compile(r"<li\b[^>]*>(.*?)</li>", re.I | re.S)
_BQ_RE = re.compile(r"<blockquote\b[^>]*>(.*?)</blockquote>", re.I | re.S)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr>", re.I | re.S)
_CELL_RE = re.compile(r"<t[hd]\b[^>]*>(.*?)</t[hd]>", re.I | re.S)
_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table>", re.I | re.S)
_BR_RE = re.compile(r"<br\s*/?>", re.I)
_P_CLOSE_RE = re.compile(r"</(p|div|section|article)>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_BLANK_RE = re.compile(r"\n{3,}")


def _table_to_md(m: re.Match) -> str:
    rows = []
    for tr in _TR_RE.findall(m.group(1)):
        cells = [_TAG_RE.sub("", c).strip() for c in _CELL_RE.findall(tr)]
        if cells:
            rows.append("| " + " | ".join(cells) + " |")
    if not rows:
        return ""
    ncols = rows[0].count("|") - 1
    rows.insert(1, "|" + " --- |" * ncols)
    return "\n\n" + "\n".join(rows) + "\n\n"


def html_to_markdown(html: str) -> str:
    s = html
    for rx in _STRIP_RES:
        s = rx.sub("", s)
    s = _TABLE_RE.sub(_table_to_md, s)
    s = _PRE_RE.sub(lambda m: "\n\n```\n" + _TAG_RE.sub("", m.group(1)).strip() + "\n```\n\n", s)
    s = _H_RE.sub(lambda m: "\n\n" + "#" * int(m.group(1)) + " " + _TAG_RE.sub("", m.group(2)).strip() + "\n\n", s)
    def _img_md(m: re.Match) -> str:
        alt = _ALT_RE.search(m.group(0))
        return f"![{alt.group(1) if alt else ''}]({m.group(1)})"

    s = _IMG_RE.sub(_img_md, s)
    s = _A_RE.sub(lambda m: f"[{_TAG_RE.sub('', m.group(2)).strip()}]({m.group(1)})", s)
    s = _B_RE.sub(lambda m: f"**{m.group(2).strip()}**", s)
    s = _I_RE.sub(lambda m: f"*{m.group(2).strip()}*", s)
    s = _CODE_RE.sub(lambda m: f"`{_TAG_RE.sub('', m.group(1)).strip()}`", s)
    s = _LI_RE.sub(lambda m: "\n- " + _TAG_RE.sub("", m.group(1)).strip(), s)
    s = _BQ_RE.sub(lambda m: "\n\n> " + _TAG_RE.sub("", m.group(1)).strip() + "\n\n", s)
    s = _BR_RE.sub("\n", s)
    s = _P_CLOSE_RE.sub("\n\n", s)
    s = _TAG_RE.sub("", s)
    s = unescape(s)
    lines = [ln.rstrip() for ln in s.splitlines()]
    s = "\n".join(ln for ln in lines)
    s = _BLANK_RE.sub("\n\n", s).strip()
    return s + "\n"


def html_to_markdown_batch(batch, body_col: str = "body", url_col: str = "url"):
    """map_batches stage (CPU-heavy per reference; give it its own pool)."""
    import pyarrow as pa

    bodies = batch[body_col].to_numpy(zero_copy_only=False)
    urls = batch[url_col].to_numpy(zero_copy_only=False)
    out_u, out_md = [], []
    for u, b in zip(urls, bodies):
        if b is None:
            continue
        if isinstance(b, bytes):
            b = b.decode("utf-8", "replace")
        out_u.append(u)
        out_md.append(html_to_markdown(b))
    return pa.table({"url": pa.array(out_u, pa.string()), "markdown": pa.array(out_md, pa.string())})
