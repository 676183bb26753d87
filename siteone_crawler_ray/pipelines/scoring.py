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
