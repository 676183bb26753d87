"""Quality scoring + CI gate — driver-side over tiny summary tables.

Re-expression of /root/reference/src/scoring/scorer.rs:14-43 (five
weighted categories, per-rule deductions with per-URL caps 5.0/2.5) and
ci_gate.rs:34-260 (threshold checks → exit code 10).  Inputs are the
small aggregated report tables (never the full visited dataset), so
this runs on the driver like the reference's post-crawl pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# category → weight (scorer.rs:21-43 five-category weighting)
CATEGORY_WEIGHTS = {
    "seo": 0.25,
    "best_practice": 0.25,
    "performance": 0.2,
    "security": 0.15,
    "accessibility": 0.15,
}

SEVERITY_DEDUCTION = {"CRITICAL": 5.0, "WARNING": 2.0, "NOTICE": 0.5}
PER_RULE_CAP = 5.0  # scorer.rs per-URL deduction caps (5.0 / 2.5)
PER_RULE_CAP_MINOR = 2.5


@dataclass
class Finding:
    """Summary item (components/summary: {apl_code, text, status})."""

    category: str
    severity: str  # OK | INFO | NOTICE | WARNING | CRITICAL
    count: int = 1
    rule: str = ""


@dataclass
class QualityReport:
    scores: dict[str, float] = field(default_factory=dict)
    total: float = 0.0


def score(findings: list[Finding]) -> QualityReport:
    """Each category starts at 10.0; findings deduct by severity × count,
    capped per rule; total = weighted sum (scorer.rs:47-546 shape)."""
    per_cat: dict[str, float] = {c: 10.0 for c in CATEGORY_WEIGHTS}
    per_rule: dict[tuple, float] = {}
    for f in findings:
        if f.category not in per_cat or f.severity in ("OK", "INFO"):
            continue
        d = SEVERITY_DEDUCTION.get(f.severity, 0.0) * f.count
        cap = PER_RULE_CAP if f.severity == "CRITICAL" else PER_RULE_CAP_MINOR
        key = (f.category, f.rule)
        already = per_rule.get(key, 0.0)
        d = min(d, cap - already)
        if d <= 0:
            continue
        per_rule[key] = already + d
        per_cat[f.category] = max(0.0, per_cat[f.category] - d)
    total = sum(per_cat[c] * w for c, w in CATEGORY_WEIGHTS.items()) / sum(
        CATEGORY_WEIGHTS.values()
    )
    return QualityReport(scores={k: round(v, 2) for k, v in per_cat.items()}, total=round(total, 2))


@dataclass
class CiGateConfig:
    """ci_gate.rs:34-260 thresholds (exit 10 on violation)."""

    min_quality_score: float | None = None
    max_404s: int | None = None
    max_critical: int | None = None
    max_warnings: int | None = None


def ci_gate(report: QualityReport, findings: list[Finding], n_404: int,
            cfg: CiGateConfig) -> tuple[int, list[str]]:
    """→ (exit_code, violations): 0 ok / 10 gate failed (manager.rs:458-464)."""
    violations = []
    if cfg.min_quality_score is not None and report.total < cfg.min_quality_score:
        violations.append(f"quality score {report.total} < {cfg.min_quality_score}")
    if cfg.max_404s is not None and n_404 > cfg.max_404s:
        violations.append(f"404 count {n_404} > {cfg.max_404s}")
    crit = sum(f.count for f in findings if f.severity == "CRITICAL")
    warn = sum(f.count for f in findings if f.severity == "WARNING")
    if cfg.max_critical is not None and crit > cfg.max_critical:
        violations.append(f"critical findings {crit} > {cfg.max_critical}")
    if cfg.max_warnings is not None and warn > cfg.max_warnings:
        violations.append(f"warning findings {warn} > {cfg.max_warnings}")
    return (10 if violations else 0), violations


# ---- full CI gate (ci_gate.rs:18-315) -------------------------------------

@dataclass
class CiCheck:
    metric: str
    operator: str
    threshold: float
    actual: float
    passed: bool


@dataclass
class CiGateResult:
    passed: bool
    exit_code: int
    checks: list[CiCheck] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


@dataclass
class CiGateOptions:
    """--ci-* thresholds (core_options.rs:495-510 defaults)."""

    min_score: float = 5.0
    min_performance: float | None = None
    min_seo: float | None = None
    min_security: float | None = None
    min_accessibility: float | None = None
    min_best_practices: float | None = None
    max_404: int = 0
    max_5xx: int = 0
    max_criticals: int = 0
    max_warnings: int | None = None
    ignore_codes: tuple[str, ...] = ()
    fail_on_codes: tuple[str, ...] = ()
    max_avg_response: float | None = None
    min_pages: int = 10
    min_assets: int = 10
    min_documents: int = 0
    baseline: str | None = None
    max_score_drop: float | None = None


def _check_min(metric: str, actual: float, threshold: float) -> CiCheck:
    return CiCheck(metric, ">=", threshold, actual, actual >= threshold)


def _check_max(metric: str, actual: float, threshold: float) -> CiCheck:
    return CiCheck(metric, "<=", threshold, actual, actual <= threshold)


def load_baseline_overall_score(path: str) -> float | None:
    """ci_gate.rs:249-256: qualityScores.overall.score from a prior JSON
    report; our own report format stores qualityScores.total."""
    import json

    try:
        with open(path) as f:
            doc = json.load(f)
        qs = doc["qualityScores"]
    except (OSError, ValueError, KeyError, TypeError):
        return None
    try:
        return float(qs["overall"]["score"])
    except (KeyError, TypeError):
        pass
    try:
        return float(qs["total"])
    except (KeyError, TypeError, ValueError):
        return None


# engine category keys → reference check labels/option codes
_CATEGORY_CHECKS = [
    ("min_performance", "performance", "Performance score"),
    ("min_seo", "seo", "SEO score"),
    ("min_security", "security", "Security score"),
    ("min_accessibility", "accessibility", "Accessibility score"),
    ("min_best_practices", "best_practice", "Best Practices score"),
]


def evaluate_ci_gate(opts: CiGateOptions, quality: QualityReport,
                     findings: list[Finding], status_counts: dict[int, int],
                     content_type_counts: dict[int, int],
                     avg_response: float | None = None) -> CiGateResult:
    """Full gate (ci_gate.rs:34-202): zero-pages fast-fail, overall +
    per-category score minimums, 404/5xx caps, critical/warning caps
    with --ci-ignore-code exclusion, forbidden finding codes, baseline
    score-drop regression, avg response time, and minimum content-type
    counts.  exit 10 on any failed check (manager.rs:458-464)."""
    from ..types import ContentType

    checks: list[CiCheck] = []
    warnings: list[str] = []

    total_urls = sum(status_counts.values())
    has_success = any(code > 0 for code in status_counts)
    if total_urls == 0 or not has_success:
        checks.append(CiCheck("Pages crawled", ">", 0.0, 0.0, False))
        return CiGateResult(False, 10, checks, warnings)

    checks.append(_check_min("Overall score", quality.total, opts.min_score))
    for attr, cat, label in _CATEGORY_CHECKS:
        threshold = getattr(opts, attr)
        if threshold is not None:
            checks.append(_check_min(label, quality.scores.get(cat, 0.0), threshold))

    checks.append(_check_max("404 errors", float(status_counts.get(404, 0)),
                             float(opts.max_404)))
    n_5xx = sum(n for c, n in status_counts.items() if 500 <= c < 600)
    checks.append(_check_max("5xx errors", float(n_5xx), float(opts.max_5xx)))

    def _count(severity: str) -> int:
        return sum(1 for f in findings
                   if f.severity == severity and f.rule not in opts.ignore_codes)

    checks.append(_check_max("Critical findings", float(_count("CRITICAL")),
                             float(opts.max_criticals)))
    if opts.max_warnings is not None:
        checks.append(_check_max("Warning findings", float(_count("WARNING")),
                                 float(opts.max_warnings)))

    if opts.fail_on_codes:
        # ignore = "accepted" wins over fail-on (ci_gate.rs:110-128)
        present = sum(
            1 for code in opts.fail_on_codes
            if code not in opts.ignore_codes
            and any(f.rule == code and f.severity not in ("OK", "INFO")
                    for f in findings)
        )
        checks.append(CiCheck("Forbidden finding codes", "<=", 0.0,
                              float(present), present == 0))

    if opts.baseline is not None:
        base = load_baseline_overall_score(opts.baseline)
        if base is not None:
            max_drop = opts.max_score_drop or 0.0
            drop = max(0.0, base - quality.total)
            checks.append(CiCheck("Overall score drop vs baseline", "<=",
                                  max_drop, round(drop, 1),
                                  drop <= max_drop + 1e-9))
        else:
            warnings.append(
                f"--ci-baseline '{opts.baseline}' could not be read — "
                "the regression check was SKIPPED.")
    elif opts.max_score_drop is not None:
        warnings.append("--ci-max-score-drop has no effect without --ci-baseline.")

    if opts.max_avg_response is not None:
        checks.append(_check_max("Avg response time (s)", float(avg_response or 0.0),
                                 opts.max_avg_response))

    pages = content_type_counts.get(ContentType.HTML, 0)
    checks.append(_check_min("HTML pages", float(pages), float(opts.min_pages)))
    assets = sum(content_type_counts.get(t, 0) for t in (
        ContentType.SCRIPT, ContentType.STYLESHEET, ContentType.IMAGE,
        ContentType.FONT))
    checks.append(_check_min("Assets (JS/CSS/img/font)", float(assets),
                             float(opts.min_assets)))
    if opts.min_documents > 0:
        docs = content_type_counts.get(ContentType.DOCUMENT, 0)
        checks.append(_check_min("Documents", float(docs), float(opts.min_documents)))

    passed = all(c.passed for c in checks)
    return CiGateResult(passed, 0 if passed else 10, checks, warnings)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&apos;"))


def to_junit_xml(result: CiGateResult) -> str:
    """ci_gate.rs:269-294 JUnit test-report rendering."""
    failures = sum(1 for c in result.checks if not c.passed)
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<testsuite name="siteone-crawler" tests="{len(result.checks)}" '
           f'failures="{failures}">']
    for c in result.checks:
        name = _xml_escape(c.metric)
        if c.passed:
            out.append(f'  <testcase name="{name}" classname="ci-gate"/>')
        else:
            msg = _xml_escape(
                f"{c.metric} (expected {c.operator} {c.threshold}, actual {c.actual})")
            out.append(f'  <testcase name="{name}" classname="ci-gate">')
            out.append(f'    <failure message="{msg}"></failure>')
            out.append("  </testcase>")
    out.append("</testsuite>")
    return "\n".join(out) + "\n"


def github_annotations(result: CiGateResult) -> list[str]:
    """ci_gate.rs:297-311 GitHub workflow-command lines."""
    return [
        f"::error title=CI Gate::{c.metric} "
        f"(expected {c.operator} {c.threshold}, actual {c.actual})"
        for c in result.checks if not c.passed
    ]


def findings_from_reports(page_findings_table, status_counts) -> list[Finding]:
    """Adapt the aggregated report tables into scoring findings."""
    out: list[Finding] = []
    sev = {
        "missing-title": ("seo", "WARNING"),
        "long-title": ("seo", "NOTICE"),
        "missing-description": ("seo", "NOTICE"),
    }
    for row in page_findings_table.to_pylist():
        cat_sev = sev.get(row["finding"])
        if cat_sev:
            out.append(Finding(category=cat_sev[0], severity=cat_sev[1],
                               count=int(row["n"]), rule=row["finding"]))
    for row in status_counts.to_pylist():
        if row["status_code"] == 404:
            out.append(Finding(category="best_practice", severity="WARNING",
                               count=int(row["n"]), rule="status-404"))
        elif row["status_code"] >= 500 or row["status_code"] < 0:
            out.append(Finding(category="best_practice", severity="CRITICAL",
                               count=int(row["n"]), rule="status-5xx"))
    return out
