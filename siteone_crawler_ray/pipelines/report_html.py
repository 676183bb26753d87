"""Self-contained tabbed HTML report exporter.

Re-expression of the reference's HTML report
(/root/reference/src/export/html_report/report.rs:91-560 tab assembly,
:1639-1810 badge rules; badge.rs color classes; template.html CSS-radio
tab mechanics): one static file, pure-CSS tabs (hidden radio inputs +
``:checked ~`` selectors, no JS), per-tab severity/count badges, fixed
tab order (report.rs:134-160), and a section allowlist mirroring
``--html-report-options`` (report.rs:163-230).  Rendered on the driver
from the already-computed distributed report dict
(pipelines/report_json.build_report) — the distributed work happened in
the report pipelines; this is output formatting, exactly like the
reference's post-crawl pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import escape

from ..functions.format import formatted_age, formatted_duration

_CSS = """
body{font-family:system-ui,sans-serif;margin:0;background:#f5f6f8;color:#1c2733}
header{background:#1c2733;color:#fff;padding:16px 24px}
header h1{margin:0;font-size:18px}
main{padding:24px;max-width:1200px;margin:0 auto}
section{background:#fff;border-radius:8px;padding:16px 20px;margin-bottom:20px;
        box-shadow:0 1px 2px rgba(0,0,0,.08)}
h2{font-size:15px;margin:0 0 12px;border-bottom:1px solid #e3e7ec;padding-bottom:8px}
table{border-collapse:collapse;width:100%;font-size:13px}
th,td{text-align:left;padding:4px 10px;border-bottom:1px solid #eef1f4}
th{background:#f0f2f5}
.tiles{display:flex;gap:16px;flex-wrap:wrap}
.tile{background:#f0f2f5;border-radius:6px;padding:10px 16px;min-width:120px}
.tile b{display:block;font-size:20px}
.badge{display:inline-block;border-radius:10px;padding:1px 10px;font-size:12px;
       margin:2px;color:#fff}
.badge.critical{background:#c0392b}.badge.warning{background:#e67e22}
.badge.notice{background:#2980b9}.badge.info{background:#7f8c8d}.badge.ok{background:#27ae60}
.badge.red{background:#c0392b}.badge.orange{background:#e67e22}
.badge.green{background:#27ae60}.badge.blue{background:#2980b9}
.badge.neutral{background:#7f8c8d}
.tabs__radio{display:none}
.tabs__navigation{display:flex;flex-wrap:wrap;gap:4px;padding:12px 24px 0;
                  background:#1c2733}
.tabs__title{cursor:pointer;padding:8px 14px;border-radius:6px 6px 0 0;
             color:#cfd8e3;font-size:13px;background:#2a3948}
.tabs__title:hover{color:#fff}
.tabs__tab{display:none}
"""


def _stat_tiles(stats: dict) -> str:
    tiles = []
    for k, v in stats.items():
        tiles.append(f'<div class="tile"><b>{escape(str(v))}</b>{escape(k)}</div>')
    return f'<div class="tiles">{"".join(tiles)}</div>'


def _severity_badges(summary: list[dict]) -> str:
    out = []
    for row in summary:
        sev = str(row.get("severity", "info")).lower()
        out.append(
            f'<span class="badge {escape(sev)}">{escape(str(row.get("aplCode", "")))}'
            f" × {escape(str(row.get('count', 0)))}</span>"
        )
    return "".join(out) or '<span class="badge ok">no findings</span>'


def _super_table(block: dict, max_rows: int = 200) -> str:
    cols = block.get("columns", [])
    rows = block.get("rows", [])
    head = "".join(f"<th>{escape(str(c))}</th>" for c in cols)
    body = []
    for row in rows[:max_rows]:
        cells = "".join(f"<td>{escape(str(row.get(c, '')))}</td>" for c in cols)
        body.append(f"<tr>{cells}</tr>")
    more = (
        f"<p><i>… {len(rows) - max_rows} more rows (see JSON report)</i></p>"
        if len(rows) > max_rows
        else ""
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{''.join(body)}</tbody></table>{more}"


# ---- badges (report.rs:1639-1810 rules, adapted to this engine's codes) --

@dataclass
class _Badge:
    value: str
    color: str  # red | orange | green | blue | neutral (badge.rs)
    title: str | None = None

    def html(self) -> str:
        t = f' style="cursor:help" title="{escape(self.title)}"' if self.title else ""
        return f'<span class="badge {self.color}"{t}>{escape(self.value)}</span>'


def _scale(n: float, red: float, orange: float) -> str:
    return "red" if n > red else ("orange" if n > orange else "green")


def _times(rows: list[dict]) -> list[float]:
    out = []
    for r in rows:
        try:
            out.append(float(r.get("request_time")))
        except (TypeError, ValueError):
            pass
    return out


def _tab_badges(apl: str, block: dict, tables: dict[str, dict]) -> list[_Badge]:
    rows = block.get("rows", [])
    n = len(rows)
    if apl == "redirects":                      # report.rs:1643-1653
        return [_Badge(str(n), _scale(n, 100, 0))]
    if apl == "404-pages":                      # report.rs:1654-1664
        return [_Badge(str(n), _scale(n, 10, 0))]
    if apl == "skipped-urls":                   # report.rs:1665-1679
        return [_Badge(str(n), "orange" if n > 10 else "green", "Skipped URL reasons")]
    if apl == "source-domains":                 # report.rs:1681-1689
        return [_Badge(str(n), "orange" if n > 10 else "neutral")]
    if apl == "content-types":                  # report.rs:1690-1704
        return [_Badge(str(n), "neutral", "Total content types")]
    if apl in ("fastest-urls", "slowest-urls"):  # report.rs:1705-1738
        ts = _times(rows)
        if not ts:
            return []
        t = min(ts) if apl == "fastest-urls" else max(ts)
        color = "green" if t < 0.5 else ("orange" if t < 2.0 else "red")
        return [_Badge(formatted_duration(t), color)]
    if apl == "http-headers":                   # report.rs:1739-1747 "headers"
        return [_Badge(str(n), "red" if n > 50 else "neutral")]
    if apl == "caching":                        # report.rs:1758-1810
        # this engine's caching table carries avg_lifetime per content
        # type; min/max across types take the reference's min/max badges
        lifetimes = []
        for r in rows:
            try:
                lifetimes.append(int(float(r["avg_lifetime"])))
            except (KeyError, TypeError, ValueError):
                pass
        out = []
        if lifetimes:
            for v, title in ((min(lifetimes), "Minimal cache lifetime"),
                             (max(lifetimes), "Maximal cache lifetime")):
                out.append(_Badge(formatted_age(v),
                                  "red" if v < 60 else ("orange" if v < 3600 else "green"),
                                  title))
        return out
    if apl == "non-unique-titles":
        return [_Badge(str(n), "orange" if n > 0 else "green")]
    return [_Badge(str(n), "neutral")]


# ---- tab assembly ---------------------------------------------------------

# tab order (report.rs:134-160, restricted to this engine's tables)
_TAB_ORDER = [
    "summary", "visited-urls", "non-unique-titles", "404-pages", "redirects",
    "skipped-urls", "fastest-urls", "slowest-urls", "content-types",
    "source-domains", "http-headers", "caching", "crawler-stats", "crawler-info",
]

# apl code → section name for --html-report-options filtering
# (report.rs:163-190 adapted; codes also match themselves for back-compat)
_SECTION_OF = {
    "summary": "summary",
    "visited-urls": "visited-urls",
    "non-unique-titles": "seo-opengraph",
    "404-pages": "404-pages",
    "redirects": "redirects",
    "skipped-urls": "skipped-urls",
    "fastest-urls": "fastest-urls",
    "slowest-urls": "slowest-urls",
    "content-types": "content-types",
    "source-domains": "source-domains",
    "http-headers": "headers",
    "caching": "caching",
    "crawler-stats": "crawler-stats",
    "crawler-info": "crawler-info",
}


@dataclass
class _Tab:
    code: str
    label: str
    content: str
    badges: list[_Badge] = field(default_factory=list)

    @property
    def order(self) -> int:
        try:
            return _TAB_ORDER.index(self.code)
        except ValueError:
            return 1000  # report.rs:157 unknown → end


def _build_tabs(report: dict, allowed) -> list[_Tab]:
    tabs: list[_Tab] = []
    tables = {b.get("aplCode", f"table{i}"): b for i, b in enumerate(report.get("tables", []))}

    if allowed("summary"):
        body = [_stat_tiles(report.get("stats", {})),
                f"<p>{_severity_badges(report.get('summary', []))}</p>"]
        q = report.get("qualityScores")
        if q is not None:
            rows = [{"category": k, "score": v} for k, v in sorted(q["categories"].items())]
            rows.append({"category": "total", "score": q["total"]})
            body.append("<h2>Quality scores</h2>"
                        + _super_table({"columns": ["category", "score"], "rows": rows}))
        n_findings = sum(int(r.get("count", 0)) for r in report.get("summary", []))
        tabs.append(_Tab("summary", "Summary", "".join(body),
                         [_Badge(str(n_findings), "orange" if n_findings else "green",
                                 "Total findings")]))

    for apl, block in tables.items():
        if not allowed(apl):
            continue
        tabs.append(_Tab(apl, apl, f"<h2>{escape(apl)}</h2>{_super_table(block)}",
                         _tab_badges(apl, block, tables)))

    if allowed("visited-urls"):
        results = report.get("results", [])
        cols = list(results[0].keys()) if results else []
        rows = [{k: str(v) for k, v in r.items()} for r in results]
        if results and "extras" in cols:
            ex0 = results[0]["extras"]
            if isinstance(ex0, dict):
                # --extra-columns: one real column per extra, as the
                # reference renders them in every output (ADVICE r3)
                extra_names = list(ex0.keys())
                cols = [c for c in cols if c != "extras"] + extra_names
                rows = []
                for r in results:
                    row = {k: str(v) for k, v in r.items() if k != "extras"}
                    ex = r.get("extras") or {}
                    for nm in extra_names:
                        row[nm] = str(ex.get(nm, ""))
                    rows.append(row)
            else:  # json_output.rs empty-array sentinel — no extras configured
                cols = [c for c in cols if c != "extras"]
                for row in rows:
                    row.pop("extras", None)
        tabs.append(_Tab(
            "visited-urls", "visited-urls",
            "<h2>visited-urls</h2>" + _super_table(
                {"columns": cols, "rows": rows}),
            [_Badge(str(len(results)), "blue", "Visited URLs")],
        ))
    if allowed("crawler-stats"):
        tabs.append(_Tab("crawler-stats", "crawler-stats",
                         "<h2>crawler-stats</h2>" + _stat_tiles(report.get("stats", {}))))
    if allowed("crawler-info"):
        info = dict(report.get("crawler", {}))
        opts = report.get("options", {}) or {}
        rows = [{"key": k, "value": str(v)} for k, v in info.items()]
        rows += [{"key": f"option:{k}", "value": str(v)} for k, v in sorted(opts.items())]
        tabs.append(_Tab("crawler-info", "crawler-info",
                         "<h2>crawler-info</h2>"
                         + _super_table({"columns": ["key", "value"], "rows": rows})))

    tabs.sort(key=lambda t: t.order)
    return tabs


def render_html_report(report: dict, allowed_sections: list[str] | None = None) -> str:
    """report = pipelines.report_json.build_report(...) output → one
    self-contained tabbed HTML page (CSS-radio tabs, template.html
    mechanics).  ``allowed_sections`` mirrors --html-report-options
    (report.rs:191-230): None → everything; names accept both reference
    section names (e.g. ``headers``) and this engine's apl codes."""

    def allowed(code: str) -> bool:
        if allowed_sections is None:
            return True
        return code in allowed_sections or _SECTION_OF.get(code, code) in allowed_sections

    tabs = _build_tabs(report, allowed)

    # per-tab :checked CSS (template.html / report.rs get_tabs_css)
    show = ", ".join(
        f"#tab-radio-{i}:checked ~ main .tabs__tab-{i}" for i in range(len(tabs))
    )
    active = ", ".join(
        f"#tab-radio-{i}:checked ~ .tabs__navigation .tabs__title-{i}" for i in range(len(tabs))
    )
    tab_css = (f"{show}{{display:block}}\n"
               f"{active}{{background:#fff;color:#1c2733}}\n") if tabs else ""

    radios = "".join(
        f'<input type="radio" id="tab-radio-{i}" name="tabs" class="tabs__radio"'
        f'{" checked" if i == 0 else ""}>' for i in range(len(tabs))
    )
    labels = "".join(
        f'<label for="tab-radio-{i}" class="tabs__title tabs__title-{i}">'
        f"{escape(t.label)} {''.join(b.html() for b in t.badges)}</label>"
        for i, t in enumerate(tabs)
    )
    panels = "".join(
        f'<section class="tabs__tab tabs__tab-{i}">{t.content}</section>'
        for i, t in enumerate(tabs)
    )

    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>Crawl report — {escape(report['crawler']['name'])}</title>"
        f"<style>{_CSS}{tab_css}</style></head><body>"
        f"{radios}"
        f"<header><h1>{escape(report['crawler']['name'])} crawl report"
        f" — {len(report.get('results', []))} URLs</h1></header>"
        f'<div class="tabs__navigation">{labels}</div>'
        f"<main>{panels}</main></body></html>"
    )


def write_html_report(res, visited_ds, path: str, config=None,
                      allowed_sections: list[str] | None = None,
                      table_cache: dict | None = None,
                      analyzer_filter: str | None = None) -> str:
    from .report_json import build_report

    # rows_limit=None: the reference HTML report ignores the global hard
    # rows limit (report.rs:1206 set_ignore_hard_rows_limit)
    html = render_html_report(
        build_report(res, visited_ds, config, table_cache=table_cache, rows_limit=None,
                     analyzer_filter=analyzer_filter),
        allowed_sections,
    )
    with open(path, "w") as f:
        f.write(html)
    return html
