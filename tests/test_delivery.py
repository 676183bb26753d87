"""Delivery exporters: e-mail composition + upload payload building.

Fixture expectations derive from mailer_exporter.rs:84-233 and
upload_exporter.rs:57-134 (subject templating, sender hostname
resolution, body styling, NON_ALPHANUMERIC percent-encoding, JSON
response contract)."""

import json
from datetime import datetime

import pytest

from siteone_crawler_ray.pipelines import delivery as DL


NOW = datetime(2026, 8, 17, 14, 5, 9)


def test_build_subject_placeholders():
    # mailer_exporter.rs:123-135: %domain% / %date% / %datetime%
    t = "Crawler Report for %domain% (%date%) at %datetime%"
    assert DL.build_subject(t, "example.com", NOW) == (
        "Crawler Report for example.com (2026-08-17) at 2026-08-17 14:05")
    assert DL.build_subject("static", "x", NOW) == "static"


def test_resolve_mail_from_hostname_placeholder():
    # mailer_exporter.rs:137-142: only the placeholder domain is rewritten
    assert DL.resolve_mail_from("siteone-crawler@your-hostname.com", "box1") == \
        "siteone-crawler@box1"
    assert DL.resolve_mail_from("ops@real.tld", "box1") == "ops@real.tld"


def test_style_html_body_injects_table_css():
    # mailer_exporter.rs:105-121: styles are spliced at the <body> tag
    styled = DL.style_html_body_for_email("<html><body><table></table></body></html>")
    assert "border-collapse: collapse" in styled
    assert styled.count("<body") == 1
    assert "font-family: Arial" in styled


def test_compose_email_structure():
    cfg = DL.MailerConfig(mail_to=("a@b.c",))
    msg = DL.compose_email(cfg, "a@b.c", "example.com",
                           "<html><body>R</body></html>", NOW, "host9")
    assert msg["From"] == "SiteOne Crawler <siteone-crawler@host9>"
    assert msg["Subject"] == "Crawler Report for example.com (2026-08-17)"
    att = next(p for p in msg.walk() if p.get_filename())
    # mailer_exporter.rs:251-253 attachment naming
    assert att.get_filename() == "report-example.com-20260817140509.html"
    assert att.get_payload(decode=True) == b"<html><body>R</body></html>"
    body = next(p for p in msg.walk()
                if p.get_content_type() == "text/html" and not p.get_filename())
    assert "example.com" in body.get_content()


def test_send_report_email_summary_entries(tmp_path):
    html = "<html><body>R</body></html>"
    ok = DL.send_report_email(
        DL.MailerConfig(mail_to=("a@b.c", "d@e.f")), "h", html, NOW, "n",
        transport=DL.file_outbox_transport(str(tmp_path)))
    # mailer_exporter.rs:266-274 info entry lists recipients + relay
    assert ok["id"] == "mail-report-sent" and "a@b.c, d@e.f" in ok["message"]
    assert len(list(tmp_path.iterdir())) == 2

    def boom(msg, cfg):
        raise OSError("connection refused")

    bad = DL.send_report_email(
        DL.MailerConfig(mail_to=("a@b.c",)), "h", html, NOW, "n", transport=boom)
    assert bad["id"] == "mail-report-failed" and bad["severity"] == "critical"
    # mailer_exporter.rs:155-157: empty recipient list is an error
    none = DL.send_report_email(DL.MailerConfig(), "h", html, NOW, "n")
    assert none["id"] == "mail-report-failed"


def test_percent_encode_non_alphanumeric():
    # upload_exporter.rs:94-96 NON_ALPHANUMERIC: '-', '.', '_', '~' are
    # escaped too (stricter than urlencode defaults)
    assert DL._percent_encode(b"a1Z") == "a1Z"
    assert DL._percent_encode(b"-._~ /") == "%2D%2E%5F%7E%20%2F"
    assert DL._percent_encode(bytes([0, 255])) == "%00%FF"


def test_build_upload_form_roundtrip():
    html = "<html>" + "x" * 5000 + "</html>"
    form = DL.build_upload_form(html, platform="linux", arch="x64",
                                retention="30d", password="  p w  ")
    # htmlBody is the FIRST field (upload_exporter.rs:95-97)
    assert form.startswith("htmlBody=")
    decoded = DL.decode_upload_form(form)
    assert decoded["htmlBody"].decode() == html
    assert decoded["version"].decode() == DL.__version__
    assert decoded["platform"] == b"linux" and decoded["arch"] == b"x64"
    assert decoded["retention"] == b"30d"
    # password trimmed (upload_exporter.rs:79-84)
    assert decoded["password"] == b"p w"
    # gzip with mtime=0 → byte-stable across calls
    assert form == DL.build_upload_form(html, platform="linux", arch="x64",
                                        retention="30d", password="  p w  ")


def test_build_upload_form_optional_fields():
    form = DL.decode_upload_form(
        DL.build_upload_form("<x/>", platform="linux", arch="arm64",
                             retention=None, password="   "))
    # empty/whitespace password and missing retention are omitted
    assert "password" not in form and "retention" not in form


def test_parse_upload_response_contract():
    # upload_exporter.rs:114-133
    assert DL.parse_upload_response(200, json.dumps({"url": "https://r/x"})) == "https://r/x"
    with pytest.raises(RuntimeError, match=r"quota exceeded \(413\)"):
        DL.parse_upload_response(413, json.dumps({"error": "quota exceeded"}))
    with pytest.raises(RuntimeError, match=r"unknown error \(502\)"):
        DL.parse_upload_response(502, "<html>bad gateway</html>")


def test_upload_report_summary_entries(tmp_path):
    ok = DL.upload_report(DL.UploadConfig(enabled=True), "<x/>",
                          transport=DL.file_upload_transport(str(tmp_path)))
    assert ok["id"] == "upload-done" and "file://" in ok["message"]
    saved = DL.decode_upload_form((tmp_path / "upload-body.txt").read_text())
    assert saved["htmlBody"] == b"<x/>"

    def down(form, cfg):
        raise OSError("no route to host")

    bad = DL.upload_report(DL.UploadConfig(enabled=True), "<x/>", transport=down)
    assert bad["id"] == "upload-failed" and bad["severity"] == "critical"
