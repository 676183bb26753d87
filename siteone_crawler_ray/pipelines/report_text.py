"""Plain-text (console-style) output writer.

Compact re-expression of the reference's TextOutput
(/root/reference/src/output/text_output.rs:57-420 — banner, visited-URL
table with padded URL/Status/Type/Time/Size columns, per-analyzer
summary sections): renders the crawl result and the distributed report
tables to one ASCII document on the driver.  Column widths follow the
reference (URL column sized to the longest URL, capped; sizes/durations
through the §2.8 format helpers)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.format import formatted_duration, formatted_size, status_code_str, truncate_url
from ..types import ContentType

_CT_NAMES = {v: k for k, v in vars(ContentType).items() if isinstance(v, int)}

MAX_URL_COL = 80


def _banner(n_urls: int) -> str:
    lines = [
        "#" * 50,
        f"# {'siteone-crawler-ray':<46} #",
        f"# {f'{n_urls} URLs crawled':<46} #",
        "#" * 50,
    ]
    return "\n".join(lines)


def visited_table_text(visited: pa.Table, origin_host: str = "",
                       extras: pa.Table | None = None,
                       show_scheme_and_host: bool = False,
                       do_not_truncate_url: bool = False,
                       url_column_size: int | None = None,
                       hide_columns: tuple[str, ...] = ()) -> str:
    """text_output.rs:279-420 add_table_header/add_table_row; extra
    columns widen the table the way text_output.rs:76-84 sizes
    ``extra_columns_width`` (name-or-value width + ' | ' separator).

    ``show_scheme_and_host`` keeps the origin on internal URLs
    (text_output.rs:349-354 strips it by default); external URLs always
    render in full.  ``do_not_truncate_url`` skips the two-thirds
    truncation (text_output.rs:429-431) — long URLs overflow the
    column, like the reference.  ``url_column_size`` overrides the
    derived URL width (capped at 184, text_output.rs:153-175);
    ``hide_columns`` omits named standard columns (case-insensitive,
    text_output.rs:119 should_hide)."""
    urls = visited["url"].to_pylist()
    if url_column_size is not None:
        width = min(184, max(3, url_column_size))
    else:
        width = min(MAX_URL_COL, max((len(u) for u in urls), default=3))
    hidden = {h.strip().lower() for h in hide_columns}
    extra_names: list[str] = []
    extra_by_url: dict = {}
    extra_w: dict = {}
    if extras is not None:
        extra_names = [c for c in extras.schema.names if c != "url"]
        extra_by_url = {r["url"]: r for r in extras.to_pylist()}
        for n in extra_names:
            vals = ["" if v is None else str(v) for v in extras[n].to_pylist()]
            extra_w[n] = max([len(n)] + [len(v) for v in vals])
    std_cols = [c for c in ("Status", "Type", "Time", "Size")
                if c.lower() not in hidden]
    std_head = {"Status": "Status", "Type": "Type    ", "Time": "Time    ",
                "Size": "Size  "}
    head = f"{'URL':<{width}}"
    for c in std_cols:
        head += f" | {std_head[c]}"
    for n in extra_names:
        head += f" | {n:<{extra_w[n]}}"
    sep = "-" * len(head)
    rows = [head, sep]
    statuses = visited["status_code"].to_pylist()
    ctypes = visited["content_type"].to_pylist()
    times = visited["request_time"].to_pylist()
    sizes = visited["size"].to_pylist()
    strip = None if show_scheme_and_host else (origin_host or None)
    for u, st, ct, tm, sz in zip(urls, statuses, ctypes, times, sizes):
        if do_not_truncate_url:
            disp = truncate_url(u, 10**9, strip_hostname=strip)
        else:
            disp = truncate_url(u, width, strip_hostname=strip)
        cells = {
            "Status": f"{status_code_str(int(st)):<6}",
            "Type": f"{_CT_NAMES.get(int(ct), 'OTHER').capitalize():<8}",
            "Time": f"{formatted_duration(float(tm)):<8}",
            "Size": formatted_size(int(sz)),
        }
        line = f"{disp:<{width}}"
        for c in std_cols:
            line += f" | {cells[c]}"
        if extra_names:
            er = extra_by_url.get(u, {})
            for n in extra_names:
                line += f" | {str(er.get(n) or ''):<{extra_w[n]}}"
        rows.append(line)
    return "\n".join(rows)


def _section(title: str, t: pa.Table, max_rows: int = 50) -> str:
    cols = t.schema.names
    widths = []
    str_cols = []
    for c in cols:
        vals = ["" if v is None else str(v) for v in t[c].to_pylist()[:max_rows]]
        str_cols.append(vals)
        widths.append(max([len(c)] + [len(v) for v in vals]))
    lines = [f"\n=== {title} " + "=" * max(1, 40 - len(title))]
    lines.append(" | ".join(f"{c:<{w}}" for c, w in zip(cols, widths)))
    lines.append("-+-".join("-" * w for w in widths))
    for i in range(min(t.num_rows, max_rows)):
        lines.append(" | ".join(f"{sc[i]:<{w}}" for sc, w in zip(str_cols, widths)))
    if t.num_rows > max_rows:
        lines.append(f"... {t.num_rows - max_rows} more rows")
    return "\n".join(lines)


def render_text_report(report: dict, visited: pa.Table, origin_host: str = "",
                       extras: pa.Table | None = None,
                       show_scheme_and_host: bool = False,
                       do_not_truncate_url: bool = False,
                       url_column_size: int | None = None,
                       hide_columns: tuple[str, ...] = ()) -> str:
    """Full console document: banner → visited table → stats →
    per-analyzer sections (SuperTable analogues)."""
    parts = [_banner(len(report.get("results", [])))]
    parts.append("")
    parts.append(visited_table_text(visited, origin_host, extras=extras,
                                    show_scheme_and_host=show_scheme_and_host,
                                    do_not_truncate_url=do_not_truncate_url,
                                    url_column_size=url_column_size,
                                    hide_columns=hide_columns))
    stats = report.get("stats", {})
    if stats:
        st = pa.table({"stat": pa.array([str(k) for k in stats]),
                       "value": pa.array([str(v) for v in stats.values()])})
        parts.append(_section("summary", st))
    for block in report.get("tables", []):
        cols = block.get("columns", [])
        rows = block.get("rows", [])
        if not cols:
            continue
        t = pa.table({c: pa.array([r.get(c, "") for r in rows], pa.string()) for c in cols})
        parts.append(_section(block.get("aplCode", "table"), t))
    q = report.get("qualityScores")
    if q:
        qt = pa.table({
            "category": pa.array(sorted(q["categories"]) + ["total"]),
            "score": pa.array([str(q["categories"][k]) for k in sorted(q["categories"])]
                              + [str(q["total"])]),
        })
        parts.append(_section("quality-scores", qt))
    return "\n".join(parts) + "\n"


def write_text_report(res, visited_ds, path: str, config=None,
                      table_cache: dict | None = None,
                      extras_table: pa.Table | None = None,
                      rows_limit: int | None = 200,
                      show_scheme_and_host: bool = False,
                      do_not_truncate_url: bool = False,
                      url_column_size: int | None = None,
                      hide_columns: tuple[str, ...] = (),
                      analyzer_filter: str | None = None) -> str:
    from ..functions.urls import host_of
    from .report_json import build_report

    report = build_report(res, visited_ds, config, table_cache=table_cache,
                          extras_table=extras_table, rows_limit=rows_limit,
                          analyzer_filter=analyzer_filter)
    visited = res.visited_table(
        columns=["url", "status_code", "content_type", "request_time", "size"]
    )
    first = visited["url"].to_pylist()[:1]
    origin = host_of(first[0]) if first else ""
    text = render_text_report(report, visited, origin, extras=extras_table,
                              show_scheme_and_host=show_scheme_and_host,
                              do_not_truncate_url=do_not_truncate_url,
                              url_column_size=url_column_size,
                              hide_columns=hide_columns)
    with open(path, "w") as f:
        f.write(text)
    return text
