"""Self-contained HTML report exporter.

Compact re-expression of the reference's tabbed HTML report
(/root/reference/src/export/html_report/report.rs:91-560 — embedded
template + SuperTable rendering + severity badges + section filter via
``--html-report-options``): one static HTML file rendered on the
driver from the already-computed distributed report dict
(pipelines/report_json.build_report), exactly like the reference's
post-crawl output pass.  Sections mirror the SuperTable list; the
``allowed_sections`` filter reproduces the section-allowlist option.
"""

from __future__ import annotations

from html import escape

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


def render_html_report(report: dict, allowed_sections: list[str] | None = None) -> str:
    """report = pipelines.report_json.build_report(...) output →
    one self-contained HTML page.  ``allowed_sections`` mirrors
    --html-report-options (report.rs:191-230): None → everything."""

    def allowed(name: str) -> bool:
        return allowed_sections is None or name in allowed_sections

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>Crawl report — {escape(report['crawler']['name'])}</title>",
        f"<style>{_CSS}</style></head><body>",
        f"<header><h1>{escape(report['crawler']['name'])} crawl report"
        f" — {len(report.get('results', []))} URLs</h1></header><main>",
    ]
    if allowed("summary"):
        parts.append(f"<section><h2>Summary</h2>{_stat_tiles(report.get('stats', {}))}"
                     f"<p>{_severity_badges(report.get('summary', []))}</p></section>")
    q = report.get("qualityScores")
    if q is not None and allowed("summary"):
        rows = [{"category": k, "score": v} for k, v in sorted(q["categories"].items())]
        rows.append({"category": "total", "score": q["total"]})
        parts.append(
            "<section><h2>Quality scores</h2>"
            + _super_table({"columns": ["category", "score"], "rows": rows})
            + "</section>"
        )
    for block in report.get("tables", []):
        name = block.get("aplCode", "table")
        if not allowed(name):
            continue
        parts.append(f"<section><h2>{escape(name)}</h2>{_super_table(block)}</section>")
    if allowed("visited-urls"):
        results = report.get("results", [])
        cols = list(results[0].keys()) if results else []
        parts.append(
            "<section><h2>visited-urls</h2>"
            + _super_table({"columns": cols,
                            "rows": [{k: str(v) for k, v in r.items()} for r in results]})
            + "</section>"
        )
    parts.append("</main></body></html>")
    return "".join(parts)


def write_html_report(res, visited_ds, path: str, config=None,
                      allowed_sections: list[str] | None = None,
                      table_cache: dict | None = None) -> str:
    from .report_json import build_report

    html = render_html_report(
        build_report(res, visited_ds, config, table_cache=table_cache), allowed_sections
    )
    with open(path, "w") as f:
        f.write(html)
    return html
