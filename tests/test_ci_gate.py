"""Full CI gate tests (ci_gate.rs:18-315 parity)."""

import json

from siteone_crawler_ray.pipelines.scoring import (
    CiGateOptions,
    Finding,
    QualityReport,
    evaluate_ci_gate,
    github_annotations,
    to_junit_xml,
)
from siteone_crawler_ray.types import ContentType

GOOD = QualityReport(scores={"seo": 9.0, "best_practice": 8.0, "performance": 10.0,
                             "security": 7.0, "accessibility": 9.5}, total=8.7)
CT = {ContentType.HTML: 50, ContentType.SCRIPT: 5, ContentType.STYLESHEET: 3,
      ContentType.IMAGE: 4, ContentType.FONT: 1, ContentType.DOCUMENT: 2}


def _eval(opts=None, quality=GOOD, findings=(), status=None, ct=None, avg=0.05):
    return evaluate_ci_gate(opts or CiGateOptions(), quality, list(findings),
                            status if status is not None else {200: 60},
                            ct if ct is not None else dict(CT), avg)


def test_zero_pages_fast_fail():
    r = _eval(status={})
    assert not r.passed and r.exit_code == 10
    assert r.checks[0].metric == "Pages crawled"
    # only transport errors (negative codes) also fails immediately
    r2 = _eval(status={-1: 5})
    assert not r2.passed and r2.checks[0].metric == "Pages crawled"


def test_defaults_pass_on_clean_crawl():
    r = _eval()
    assert r.passed and r.exit_code == 0
    by = {c.metric: c for c in r.checks}
    assert by["Overall score"].passed and by["404 errors"].passed
    assert by["HTML pages"].actual == 50.0
    assert by["Assets (JS/CSS/img/font)"].actual == 13.0
    assert "Documents" not in by  # min_documents=0 → check omitted (ci_gate.rs:186)


def test_category_and_count_checks():
    opts = CiGateOptions(min_seo=9.5, max_404=0, max_criticals=0,
                         max_warnings=1, ignore_codes=("accepted-rule",))
    findings = [
        Finding("seo", "CRITICAL", rule="bad-rule"),
        Finding("seo", "CRITICAL", rule="accepted-rule"),   # ignored
        Finding("security", "WARNING", rule="w1"),
        Finding("security", "WARNING", rule="w2"),
    ]
    r = _eval(opts, findings=findings, status={200: 50, 404: 3})
    by = {c.metric: c for c in r.checks}
    assert not by["SEO score"].passed          # 9.0 < 9.5
    assert by["404 errors"].actual == 3.0 and not by["404 errors"].passed
    assert by["Critical findings"].actual == 1.0  # ignored code excluded
    assert by["Warning findings"].actual == 2.0 and not by["Warning findings"].passed
    assert r.exit_code == 10


def test_fail_on_codes_and_ignore_wins():
    opts = CiGateOptions(fail_on_codes=("x", "y"), ignore_codes=("y",),
                         max_criticals=10)
    findings = [Finding("seo", "WARNING", rule="x"),
                Finding("seo", "CRITICAL", rule="y"),
                Finding("seo", "OK", rule="z")]
    r = _eval(opts, findings=findings)
    by = {c.metric: c for c in r.checks}
    assert by["Forbidden finding codes"].actual == 1.0  # y suppressed by ignore
    assert not by["Forbidden finding codes"].passed


def test_baseline_regression(tmp_path):
    base = tmp_path / "base.json"
    base.write_text(json.dumps({"qualityScores": {"total": 9.5}}))
    r = _eval(CiGateOptions(baseline=str(base), max_score_drop=0.5))
    by = {c.metric: c for c in r.checks}
    drop = by["Overall score drop vs baseline"]
    assert drop.actual == 0.8 and not drop.passed  # 9.5 - 8.7
    # reference JSON format (qualityScores.overall.score) also loads
    base.write_text(json.dumps({"qualityScores": {"overall": {"score": 8.8}}}))
    r2 = _eval(CiGateOptions(baseline=str(base), max_score_drop=0.5))
    assert {c.metric: c for c in r2.checks}["Overall score drop vs baseline"].passed
    # unreadable baseline → loud warning, check skipped
    r3 = _eval(CiGateOptions(baseline=str(tmp_path / "missing.json")))
    assert not any(c.metric.startswith("Overall score drop") for c in r3.checks)
    assert any("SKIPPED" in w for w in r3.warnings)
    # max-score-drop without baseline → warning
    r4 = _eval(CiGateOptions(max_score_drop=1.0))
    assert any("no effect" in w for w in r4.warnings)


def test_avg_response_and_content_minimums():
    r = _eval(CiGateOptions(max_avg_response=0.01, min_pages=100,
                            min_assets=50, min_documents=5), avg=0.02)
    by = {c.metric: c for c in r.checks}
    assert not by["Avg response time (s)"].passed
    assert not by["HTML pages"].passed and not by["Assets (JS/CSS/img/font)"].passed
    assert by["Documents"].actual == 2.0 and not by["Documents"].passed


def test_junit_and_annotations():
    r = _eval(CiGateOptions(min_score=9.9))
    xml = to_junit_xml(r)
    assert xml.startswith('<?xml version="1.0"')
    assert f'tests="{len(r.checks)}"' in xml and 'failures="1"' in xml
    assert '<failure message="Overall score (expected &gt;= 9.9, actual 8.7)">' in xml
    ann = github_annotations(r)
    assert ann == ["::error title=CI Gate::Overall score (expected >= 9.9, actual 8.7)"]
