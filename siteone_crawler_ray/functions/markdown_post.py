"""Markdown export post-processing — the --markdown-* option family.

Re-derivation of the reference's markdown exporter post passes
(/root/reference/src/export/markdown_exporter.rs): image stripping
(:340-355), downloadable-file link stripping (:356-395), empty-link /
empty-list-item / empty-table-row cleanup (:397-420), custom content
replacements with the slash-delimited regex convention
(:175-193, utils.rs is_regex_pattern), and the move-content-before-H1
rearrangement (:572-627).  Pure string kernels — the export pipelines
apply them per page inside ``map_batches``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_IMG_IN_ANCHOR_RE = re.compile(r"\[!\[[^\]]*\]\([^\)]*\)\]\([^\)]*\)")
_IMG_RE = re.compile(r"!\[.*?\]\(.*?\)")
_LINK_LEAD_WS_RE = re.compile(r"\[\s+([^\]]+)\]\(")
_LINK_RE = re.compile(r"\[([^\]]+)\]\(([^)]+)\)", re.IGNORECASE)
_EMPTY_LINK_RE = re.compile(r"\[[^\]]*\]\(\)")
_EMPTY_LI_RE = re.compile(r"^\s*[-*+]\s*$\n?", re.MULTILINE)
_BARE_FILENAME_LINK_RE = re.compile(r"^\s*\[([^\]\s]+\.html?)\]\([^\)]+\)\s*$\n?", re.MULTILINE)
_EMPTY_TABLE_ROW_RE = re.compile(r"^\|\s*(\|\s*)+$\n?", re.MULTILINE)
_ATX_HEADING_RE = re.compile(r"^(#{1,6})\s.*$", re.MULTILINE)
_SETEXT_HEADING_RE = re.compile(r"^(.+?)\n(=+|-+)\s*$", re.MULTILINE)

# extensions kept by --markdown-disable-files (pages + images stay;
# markdown_exporter.rs:386-388)
_KEEP_EXTS = {"md", "html", "htm", "jpg", "png", "gif", "webp", "avif"}


def is_regex_pattern(s: str) -> bool:
    """utils.rs:14-33 slash-delimited regex detection (/…/, #…#, ~…~,
    %…% with optional trailing a-z flags)."""
    if len(s) < 2 or s[0] not in "/#~%":
        return False
    last = s.rfind(s[0], 1)
    if last <= 0:
        return False
    return all(c.isalpha() and c.islower() for c in s[last + 1:])


def extract_regex_pattern(s: str) -> str | None:
    """markdown_exporter.rs:1071-1090: strip delimiters, honor the `i`
    flag via inline (?i)."""
    if len(s) < 2:
        return None
    delim = s[0]
    last = s.rfind(delim, 1)
    if last <= 0:
        return None
    pattern, flags = s[1:last], s[last + 1:]
    return ("(?i)" if "i" in flags else "") + pattern


def apply_content_replacements(text: str, rules) -> str:
    """Shared 'from -> to' / '/regex/ -> to' replacement battery
    (--replace-content, --markdown-replace-content — the reference
    applies the same rule format in both exporters)."""
    for spec in rules:
        parts = spec.split("->", 1)
        src = parts[0].strip()
        dst = parts[1].strip() if len(parts) > 1 else ""
        if is_regex_pattern(src):
            pat = extract_regex_pattern(src)
            if pat is not None:
                try:
                    text = re.sub(pat, dst, text)
                except re.error:
                    pass
        else:
            text = text.replace(src, dst)
    return text


@dataclass
class MarkdownPostOptions:
    disable_images: bool = False
    disable_files: bool = False
    replace_content: tuple[str, ...] = ()  # "from -> to" / "/regex/ -> to"
    move_content_before_h1_to_end: bool = False
    ignore_regexes: tuple[str, ...] = field(default_factory=tuple)

    def any(self) -> bool:
        return (self.disable_images or self.disable_files
                or bool(self.replace_content) or self.move_content_before_h1_to_end)


def postprocess_markdown(md: str, opts: MarkdownPostOptions) -> str:
    """Apply the configured post passes in the reference's order:
    disable images → disable files → cleanup → replace-content →
    move-before-H1."""
    if opts.disable_images:
        md = _IMG_IN_ANCHOR_RE.sub("", md)
        md = _IMG_RE.sub("", md)
        md = _LINK_LEAD_WS_RE.sub(r"[\1](", md)
    if opts.disable_files:
        ignore = [re.compile(p) for p in opts.ignore_regexes]

        def drop_file_link(m: re.Match) -> str:
            url = m.group(2)
            if url.startswith(("http://", "https://", "tel:", "mailto:")):
                return m.group(0)
            if any(r.search(url) for r in ignore):
                return m.group(0)
            ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
            if ext in _KEEP_EXTS:
                return m.group(0)
            return ""

        md = _LINK_RE.sub(drop_file_link, md).replace("  ", " ")
    # cleanup passes (markdown_exporter.rs:397-420) — applied whenever a
    # stripping pass may have emptied links/items
    if opts.disable_images or opts.disable_files:
        md = _EMPTY_LINK_RE.sub("", md)
        md = _EMPTY_LI_RE.sub("", md)
        md = _BARE_FILENAME_LINK_RE.sub("", md)
        md = _EMPTY_TABLE_ROW_RE.sub("", md)
    md = apply_content_replacements(md, opts.replace_content)
    if opts.move_content_before_h1_to_end:
        md = _move_content_before_main_heading(md)
    return md


def _move_content_before_main_heading(md: str) -> str:
    """markdown_exporter.rs:572-627: everything before the FIRST
    highest-level heading moves to the end behind a --- rule."""
    headings: list[tuple[int, int]] = []
    for m in _ATX_HEADING_RE.finditer(md):
        level = len(m.group(1))
        headings.append((m.start(), level))
    for m in _SETEXT_HEADING_RE.finditer(md):
        if not m.group(1).strip():
            continue
        headings.append((m.start(1), 1 if m.group(2).startswith("=") else 2))
    if not headings:
        return md
    min_level = min(lv for _, lv in headings)
    pos = min(off for off, lv in headings if lv == min_level)
    before, after = md[:pos], md[pos:]
    if not before.strip():
        return md
    return f"{after.strip()}\n\n---\n\n{before.strip()}"
