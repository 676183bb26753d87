"""--extra-columns user UDF surface.

Re-expression of /root/reference/src/extra_column.rs:102-129 (spec
parser) and crawler.rs:927-934 (application): each spec adds one string
column to the visited dataset, from

- a predefined extractor: ``Title``, ``Description``, ``Keywords``,
  ``DOM`` (element count),
- a response header name (``X-Cache``),
- a custom regexp: ``Name=regexp:/pattern/#group``,

optionally truncated via ``Name(<len>)``.  Compiled once per worker
(the specs ride into the stage constructor), applied vectorized per
batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_PREDEFINED = {"title", "description", "keywords", "dom"}
_NAME_RE = re.compile(r"^(?P<name>[^=(]+?)(?:\((?P<len>\d+)\))?(?:=(?P<src>.*))?$")
_REGEXP_RE = re.compile(r"^regexp:/(?P<pat>.*)/(?:#(?P<group>\d+))?$")

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
    kind: str  # predefined | header | regexp
    source: str = ""
    pattern: re.Pattern | None = None
    group: int = 0
    max_len: int | None = None


def parse_extra_columns(specs: list[str] | tuple[str, ...]) -> list[ExtraColumn]:
    """Spec strings → compiled ExtraColumn list (extra_column.rs:102-129)."""
    out: list[ExtraColumn] = []
    for raw in specs:
        m = _NAME_RE.match(raw.strip())
        if not m:
            raise ValueError(f"bad extra-column spec: {raw!r}")
        name = m.group("name").strip()
        max_len = int(m.group("len")) if m.group("len") else None
        src = (m.group("src") or "").strip()
        if not src:
            if name.lower() not in _PREDEFINED:
                # bare name that isn't predefined = header grab
                out.append(ExtraColumn(name, "header", source=name.lower(), max_len=max_len))
            else:
                out.append(ExtraColumn(name, "predefined", source=name.lower(), max_len=max_len))
            continue
        rm = _REGEXP_RE.match(src)
        if rm:
            out.append(
                ExtraColumn(
                    name,
                    "regexp",
                    pattern=re.compile(rm.group("pat")),
                    group=int(rm.group("group") or 0),
                    max_len=max_len,
                )
            )
        elif src.lower() in _PREDEFINED:
            out.append(ExtraColumn(name, "predefined", source=src.lower(), max_len=max_len))
        else:
            out.append(ExtraColumn(name, "header", source=src.lower(), max_len=max_len))
    return out


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


class ExtraColumnsStage:
    """map_batches stage adding one string column per spec."""

    def __init__(self, specs: list[str] | tuple[str, ...]):
        self.columns = parse_extra_columns(specs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_text = None
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
            else:  # regexp over concatenated span text
                if doc_text is None:
                    doc_text = _doc_texts(batch)
                vals = np.empty(n, dtype=object)
                for i in range(n):
                    m = col.pattern.search(doc_text[i])
                    vals[i] = (m.group(col.group) if m else "") or ""
            if col.max_len is not None:
                vals = np.array([v[: col.max_len] for v in vals], dtype=object)
            batch = batch.append_column(col.name, pa.array(vals, pa.string()))
        return batch
