"""Machine-readable JSON report — the reference's 8-top-level-key shape.

/root/reference/src/output/json_output.rs (512 LoC), schema documented
in docs/JSON-OUTPUT.md:101-205: ``crawler``, ``options``, ``results``
(per-URL rows, docs/JSON-OUTPUT.md:149-167), ``stats``, ``summary``,
``tables`` (SuperTable analogue — apl_code + columns + STRING-valued
rows, docs/JSON-OUTPUT.md:191-205), ``qualityScores``,
``extraColumnsFromAnalysis``.

All table content comes from the distributed report aggregations
(pipelines/reports.py); this module only assembles the (small) final
dict on the driver — like the reference's post-crawl output pass.
"""

from __future__ import annotations

import json
from dataclasses import asdict

import pyarrow as pa

from . import reports as RP
from . import scoring as SC

ENGINE = {"name": "siteone-crawler-ray", "version": "0.1", "executor": "ray-data"}

RESULT_COLUMNS = [
    "seq", "uq_id", "url", "status_code", "content_type", "request_time",
    "size", "source_uq_id", "source_attr", "depth", "epoch", "title",
]


def _table_block(apl_code: str, t: pa.Table) -> dict:
    """SuperTable JSON: stringly-typed rows (docs/JSON-OUTPUT.md:204)."""
    return {
        "aplCode": apl_code,
        "columns": t.schema.names,
        "rows": [
            {k: ("" if v is None else str(v)) for k, v in row.items()} for row in t.to_pylist()
        ],
    }


def build_report(res, visited_ds, config=None, table_cache: dict | None = None,
                 extras_table: pa.Table | None = None,
                 rows_limit: int | None = 200,
                 analyzer_filter: str | None = None) -> dict:
    """``table_cache`` (optional dict keyed by the report function name)
    lets a caller that already computed some report tables over the SAME
    visited dataset reuse them instead of re-running the aggregation —
    the reference's analyzers likewise run once per crawl and feed every
    output format from the same in-memory results.

    ``rows_limit`` is the reference's global hard rows limit
    (``--rows-limit``, super_table.rs:22,123 — default 200) applied to
    every SuperTable analogue; pass ``None`` to disable (the HTML
    report exporter does, mirroring report.rs:1206
    ``set_ignore_hard_rows_limit``).

    ``extras_table`` (optional, ``url`` + one string column per
    ``--extra-columns`` spec, from functions/extra_columns.py) feeds the
    per-result ``extras`` object and ``extraColumnsFromAnalysis`` the
    way the reference's json_output.rs:105-131 does: each result row
    carries ``{name: value}``; with no extra columns the field is the
    reference's empty-array sentinel."""

    def get(fn, *args):
        if table_cache is None:
            return fn(*args)
        key = fn.__name__
        if key not in table_cache:
            table_cache[key] = fn(*args)
        return table_cache[key]

    findings_t = get(RP.page_findings, visited_ds)
    status_t = get(RP.count_by_status, visited_ds)
    findings = SC.findings_from_reports(findings_t, status_t)
    quality = SC.score(findings)
    # --analyzer-filter-regex (core_options.rs analyzer filter): a
    # non-matching SuperTable is skipped ENTIRELY — its aggregation
    # never runs, like the reference not instantiating the analyzer
    table_specs: list[tuple[str, object, tuple]] = [
        ("content-types", RP.content_type_table, (visited_ds,)),
        ("source-domains", RP.source_domains_table, (visited_ds,)),
        ("fastest-urls", RP.fastest_table, (visited_ds,)),
        ("slowest-urls", RP.slowest_table, (visited_ds,)),
        ("non-unique-titles", RP.title_uniqueness_table, (visited_ds,)),
        ("404-pages", RP.page404_table, (visited_ds,)),
        ("redirects", RP.redirects_table, (visited_ds,)),
        ("http-headers", RP.headers_inventory_table, (visited_ds,)),
        ("caching", RP.caching_table, (visited_ds,)),
        ("skipped-urls", RP.skipped_by_reason_table, (res.skipped,)),
    ]
    if analyzer_filter:
        import re

        rx = re.compile(analyzer_filter)
        table_specs = [s for s in table_specs if rx.search(s[0])]
    tables = {name: get(fn, *fargs) for name, fn, fargs in table_specs}
    stats = get(RP.basic_stats, visited_ds).to_pylist()[0]
    results = res.visited_table(columns=RESULT_COLUMNS).to_pylist()
    extra_names: list[str] = []
    if extras_table is not None:
        extra_names = [c for c in extras_table.schema.names if c != "url"]
        by_url = {
            row["url"]: {k: row[k] for k in extra_names} for row in extras_table.to_pylist()
        }
        for row in results:
            row["extras"] = by_url.get(row["url"], {k: "" for k in extra_names})
    else:
        for row in results:
            row["extras"] = []  # json_output.rs:105 empty-array sentinel
    return {
        "crawler": ENGINE,
        "options": (asdict(config) if config is not None else {}),
        "results": results,
        "stats": stats,
        "summary": [
            {"aplCode": f.rule or f.category, "severity": f.severity, "count": f.count}
            for f in findings
        ],
        "tables": [
            _table_block(k, t.slice(0, rows_limit) if rows_limit is not None else t)
            for k, t in tables.items()
        ],
        "qualityScores": {"categories": quality.scores, "total": quality.total},
        "extraColumnsFromAnalysis": ["Title", "Description",
                                     *(n for n in extra_names
                                       if n not in ("Title", "Description"))],
    }


def write_report_json(res, visited_ds, path: str, config=None,
                      table_cache: dict | None = None,
                      extras_table: pa.Table | None = None,
                      rows_limit: int | None = 200,
                      analyzer_filter: str | None = None) -> dict:
    report = build_report(res, visited_ds, config, table_cache=table_cache,
                          extras_table=extras_table, rows_limit=rows_limit,
                          analyzer_filter=analyzer_filter)
    with open(path, "w") as f:
        json.dump(report, f, default=str)
    return report
