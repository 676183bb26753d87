"""--extra-columns user UDF surface.

Re-expression of /root/reference/src/extra_column.rs (spec parser
:102-160, xpath/regexp extraction :163-233, truncation :92-100) and
crawler.rs:927-934 (application): each spec adds one string column to
the visited dataset, from

- a predefined extractor: ``Title``, ``Description``, ``Keywords``,
  ``DOM`` (element count),
- a response header name (``X-Cache``),
- a custom regexp: ``Name=regexp:pattern#group`` (reference syntax) or
  ``Name=regexp:/pattern/#group`` (legacy).  A trailing ``(digits)``
  always parses as a length suffix; a pattern that genuinely ends in
  ``(digits)`` must use the legacy ``/…/`` wrapping, which
  disambiguates (a warning flags the ambiguous unwrapped form),
- an xpath subset: ``Name=xpath://tag[@attr='v']/@attr#index`` —
  evaluated on the html.parser DOM shared with html_markdown.py after
  the reference's xpath→CSS conversion (// → descendant, / → child,
  trailing ``/text()`` stripped, trailing ``/@attr`` reads the
  attribute).  The reference documents ``[@attr='value']`` predicates
  (extra_column.rs:186-190); we accept them with or without the ``@``.

Length suffixes follow the reference: ``Name(20)`` truncates to 19
chars + ``…``; ``Name(20>)`` records the width without truncating;
bare ``Title``/``Description``/``Keywords`` default to 20.  Compiled
once per worker (the specs ride into the stage constructor), applied
vectorized per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .html_markdown import _Node, _parse_dom

_PREDEFINED = {"title", "description", "keywords", "dom"}
_DEFAULT_LEN = {"title": 20, "description": 20, "keywords": 20}
# reference custom syntax: Name=(xpath|regexp):pattern(#group)?((len)(>)?)?
_CUSTOM_RE = re.compile(
    r"^(?P<name>[^=]+)=(?P<method>xpath|regexp):(?P<pat>.+?)"
    r"(?:#(?P<group>\d+))?(?:\((?P<len>\d+)(?P<gt>>?)\))?$",
    re.I,
)
_NAME_RE = re.compile(r"^(?P<name>[^=(]+?)(?:\((?P<len>\d+)(?P<gt>>?)\))?(?:=(?P<src>.*))?$")
_LEGACY_REGEXP_RE = re.compile(r"^regexp:/(?P<pat>.*)/(?:#(?P<group>\d+))?$")

# header-name column mapping in this engine's visited schema
_HEADER_COLUMNS = {
    "content-type": "content_type_header",
    "cache-control": "cache_control",
    "etag": "etag",
    "content-encoding": "content_encoding",
}


@dataclass
class ExtraColumn:
    name: str
    kind: str  # predefined | header | regexp | xpath
    source: str = ""
    pattern: re.Pattern | None = None
    xpath: str = ""
    group: int = 0
    max_len: int | None = None
    truncate: bool = True

    def truncated(self, value: str) -> str:
        """Reference truncation (extra_column.rs:92-100): over-length
        values become the first ``len-1`` chars, trimmed, + ``…``."""
        if self.max_len is None or not self.truncate or len(value) <= self.max_len:
            return value
        return value[: max(0, self.max_len - 1)].strip() + "…"


def parse_extra_columns(specs: list[str] | tuple[str, ...]) -> list[ExtraColumn]:
    """Spec strings → compiled ExtraColumn list (extra_column.rs:102-160)."""
    out: list[ExtraColumn] = []
    for raw in specs:
        raw = raw.strip()
        cm = _CUSTOM_RE.match(raw)
        if cm:
            name = cm.group("name").strip()
            method = cm.group("method").lower()
            pat = cm.group("pat").strip()
            group = int(cm.group("group") or 0)
            max_len = int(cm.group("len")) if cm.group("len") else None
            truncate = cm.group("gt") != ">"
            if method == "regexp":
                # accept the legacy /pattern/ wrapping too — it is also
                # the documented escape hatch for the length-suffix
                # ambiguity: in `X=regexp:foo(12)` the trailing `(12)`
                # parses as a length suffix (pattern "foo", max_len 12);
                # a pattern that really ends in `(digits)` must be
                # written `X=regexp:/foo(12)/` (ADVICE r3)
                if pat.startswith("/") and pat.endswith("/") and len(pat) > 1:
                    pat = pat[1:-1]
                elif max_len is not None:
                    import warnings

                    warnings.warn(
                        f"extra-column spec {raw!r}: trailing ({max_len}"
                        f"{'>' if not truncate else ''}) parsed as a length "
                        "suffix; wrap the pattern in /…/ if it was part of "
                        "the regexp",
                        stacklevel=2,
                    )
                out.append(ExtraColumn(name, "regexp", pattern=re.compile(pat),
                                       group=group, max_len=max_len, truncate=truncate))
            else:
                out.append(ExtraColumn(name, "xpath", xpath=pat, group=group,
                                       max_len=max_len, truncate=truncate))
            continue
        m = _NAME_RE.match(raw)
        if not m:
            raise ValueError(f"bad extra-column spec: {raw!r}")
        name = m.group("name").strip()
        max_len = int(m.group("len")) if m.group("len") else None
        truncate = m.group("gt") != ">"
        src = (m.group("src") or "").strip()
        if not src:
            if max_len is None:
                max_len = _DEFAULT_LEN.get(name.lower())
            if name.lower() not in _PREDEFINED:
                # bare name that isn't predefined = header grab
                out.append(ExtraColumn(name, "header", source=name.lower(),
                                       max_len=max_len, truncate=truncate))
            else:
                out.append(ExtraColumn(name, "predefined", source=name.lower(),
                                       max_len=max_len, truncate=truncate))
            continue
        rm = _LEGACY_REGEXP_RE.match(src)
        if rm:
            out.append(
                ExtraColumn(
                    name,
                    "regexp",
                    pattern=re.compile(rm.group("pat")),
                    group=int(rm.group("group") or 0),
                    max_len=max_len,
                    truncate=truncate,
                )
            )
        elif src.lower() in _PREDEFINED:
            out.append(ExtraColumn(name, "predefined", source=src.lower(),
                                   max_len=max_len, truncate=truncate))
        else:
            out.append(ExtraColumn(name, "header", source=src.lower(),
                                   max_len=max_len, truncate=truncate))
    return out


# ---- xpath-subset evaluation (extra_column.rs:163-233) --------------------

_SIMPLE_PART_RE = re.compile(r"\[[^\]]*\]|[.#][\w-]+")
_ATTR_PRED_RE = re.compile(r"^\[@?([\w-]+)(?:=['\"]?([^'\"\]]*)['\"]?)?\]$")


def _compound_matches(node: _Node, compound: str) -> bool:
    """tag[attr='v'].class#id — all simple parts must match."""
    if node.tag is None:
        return False
    parts = _SIMPLE_PART_RE.findall(compound)
    tag = _SIMPLE_PART_RE.sub("", compound)
    if tag and tag != "*" and node.tag != tag.lower():
        return False
    for p in parts:
        if p.startswith("."):
            if p[1:] not in (node.attr("class") or "").split():
                return False
        elif p.startswith("#"):
            if node.attr("id") != p[1:]:
                return False
        else:
            am = _ATTR_PRED_RE.match(p)
            if not am:
                return False
            want = am.group(2)
            got = node.attr(am.group(1).lower())
            if (got is None) if want is None else (got != want):
                return False
    return True


def _css_select(root: _Node, css: str) -> list[_Node]:
    """Descendant (space) / child (>) selector chains in document order."""
    raw = css.replace(">", " > ").split()
    steps: list[tuple[str, str]] = []
    comb = " "
    for tok in raw:
        if tok == ">":
            comb = ">"
        else:
            steps.append((comb, tok))
            comb = " "
    nodes: list[_Node] = [root]
    for comb, compound in steps:
        nxt: list[_Node] = []
        seen: set[int] = set()
        for ctx in nodes:
            pool = ctx.children if comb == ">" else ctx.descendants()
            for n in pool:
                if id(n) not in seen and _compound_matches(n, compound):
                    seen.add(id(n))
                    nxt.append(n)
        nodes = nxt
    return nodes


def _xpath_to_css(xpath: str) -> str:
    """The reference's conversion (extra_column.rs:217-233): strip the
    leading slashes, ``//`` → descendant (space), ``/`` → child (>)."""
    s = xpath
    if s.startswith("//"):
        s = s[2:]
    elif s.startswith("/"):
        s = s[1:]
    return s.replace("//", " ").replace("/", " > ")


def _node_text(node: _Node) -> str:
    out: list[str] = []
    if node.text:
        out.append(node.text)
    for c in node.children:
        out.append(_node_text(c))
    return "".join(out)


def xpath_extract(html: str, xpath: str, index: int = 0) -> str | None:
    """Evaluate the reference's xpath subset over an HTML string:
    ``//tag``, ``//tag[@attr='v']``, ``//a/@href``, ``//h1/text()``,
    nested paths, ``#index`` element selection."""
    xp = xpath[: -len("/text()")] if xpath.endswith("/text()") else xpath
    idx = xp.rfind("/@")
    xp_base, target_attr = (xp[:idx], xp[idx + 2:]) if idx != -1 else (xp, None)
    nodes = _css_select(_parse_dom(html), _xpath_to_css(xp_base))
    if index >= len(nodes):
        return None
    el = nodes[index]
    if target_attr is not None:
        v = el.attr(target_attr)
        return v.strip() if v is not None else None
    text = _node_text(el).strip()
    return text or None


def _doc_texts(batch: pa.Table) -> np.ndarray:
    """Concatenated span text per row (the regexp extraction input)."""
    import pyarrow.compute as pc

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = batch.num_rows
    out = np.full(n, "", dtype=object)
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    texts = flat.field("text").to_numpy(zero_copy_only=False)
    for i in range(len(parent)):
        t = texts[i]
        if t:
            p = parent[i]
            out[p] = out[p] + ("\n" if out[p] else "") + t
    return out


def _doc_htmls(batch: pa.Table) -> np.ndarray:
    """Rendered HTML per row (the xpath extraction input): a ``body``
    column when present, else the rendered span HTML."""
    if "body" in batch.schema.names:
        raw = batch["body"].to_numpy(zero_copy_only=False)
        return np.array([v if v is not None else "" for v in raw], dtype=object)
    from .html_extract import spans_to_html

    spans = batch["spans"].to_pylist()
    return np.array([spans_to_html(s) if s else "" for s in spans], dtype=object)


class ExtraColumnsStage:
    """map_batches stage adding one string column per spec."""

    def __init__(self, specs: list[str] | tuple[str, ...]):
        self.columns = parse_extra_columns(specs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_text = None
        doc_html = None
        n = batch.num_rows
        for col in self.columns:
            if col.kind == "predefined":
                if col.source == "dom":
                    # element count ≙ span count (DOM-count analogue)
                    import pyarrow.compute as pc

                    spans = batch["spans"]
                    if isinstance(spans, pa.ChunkedArray):
                        spans = spans.combine_chunks()
                    lens = pc.list_value_length(spans)
                    vals = np.array(
                        [str(v) if v is not None else "" for v in lens.to_pylist()], dtype=object
                    )
                elif col.source in ("title", "description"):
                    vals = batch[col.source].to_numpy(zero_copy_only=False).astype(object)
                else:  # keywords — not in span model; empty
                    vals = np.full(n, "", dtype=object)
            elif col.kind == "header":
                hc = _HEADER_COLUMNS.get(col.source)
                if hc and hc in batch.schema.names:
                    raw = batch[hc].to_numpy(zero_copy_only=False)
                    vals = np.array([v if v is not None else "" for v in raw], dtype=object)
                else:
                    vals = np.full(n, "", dtype=object)
            elif col.kind == "xpath":
                if doc_html is None:
                    doc_html = _doc_htmls(batch)
                vals = np.empty(n, dtype=object)
                for i in range(n):
                    vals[i] = xpath_extract(doc_html[i], col.xpath, col.group) or ""
            else:  # regexp over concatenated span text
                if doc_text is None:
                    doc_text = _doc_texts(batch)
                vals = np.empty(n, dtype=object)
                for i in range(n):
                    m = col.pattern.search(doc_text[i])
                    vals[i] = (m.group(col.group) if m else "") or ""
            if col.max_len is not None and col.truncate:
                vals = np.array([col.truncated(v) for v in vals], dtype=object)
            batch = batch.append_column(col.name, pa.array(vals, pa.string()))
        return batch
