"""Report delivery exporters: e-mail (SMTP) and HTML-report upload.

Behavioral re-derivation of the reference's two delivery exporters:

- ``MailerExporter`` (mailer_exporter.rs:29-283): composes a
  multipart/mixed HTML e-mail with the HTML report attached as
  ``report-<host>-<YYYYmmddHHMMSS>.html``, subject from a
  ``%domain%``/``%date%``/``%datetime%`` template
  (mailer_exporter.rs:123-135), sender ``@your-hostname.com``
  resolution (mailer_exporter.rs:137-142), and e-mail-client table
  styling injected at ``<body>`` (mailer_exporter.rs:105-121).
- ``UploadExporter`` (upload_exporter.rs:19-194): gzips the HTML
  report and POSTs it as an ``application/x-www-form-urlencoded``
  body whose first field is the percent-encoded binary ``htmlBody``,
  followed by ``version``/``platform``/``arch`` and optional
  ``retention``/``password`` (upload_exporter.rs:59-134); the JSON
  response carries ``url`` on success or ``error``.

Everything except the actual socket write is pure and deterministic
(timestamps and hostname are injected), so composition is fully
testable offline.  The transport is an injectable callable; the
default SMTP/HTTP transports are real (``smtplib``/``urllib``) but
this sandbox has no network, so the CLI surfaces their failure as the
reference does — an ``add_critical_to_summary`` entry
(``mail-report-failed`` / ``upload-failed``), never a crash
(mailer_exporter.rs:276-278, upload_exporter.rs:170-180).  A
file-outbox transport (``--mail-outbox-dir`` / ``--upload-outbox-dir``)
writes the exact bytes that would have gone over the wire.
"""

from __future__ import annotations

import gzip
import json
import os
import urllib.parse
from dataclasses import dataclass, field
from email.message import EmailMessage
from email.utils import formatdate

from .. import __version__

# ---- mailer ---------------------------------------------------------------

DEFAULT_MAIL_FROM = "siteone-crawler@your-hostname.com"
DEFAULT_MAIL_FROM_NAME = "SiteOne Crawler"
DEFAULT_MAIL_SUBJECT_TEMPLATE = "Crawler Report for %domain% (%date%)"
DEFAULT_MAIL_SMTP_HOST = "localhost"
DEFAULT_MAIL_SMTP_PORT = 25

# E-mail-client-safe table styling injected at the <body> tag
# (mailer_exporter.rs:106-121).
_EMAIL_BODY_STYLE = """<body style="font-family: Arial, Helvetica, sans-serif;">
<style>
table {
    border-collapse: collapse;
}
body table, body table th, body table td {
    border: 1px solid #555555;
    padding: 3px !important;
    vertical-align: top;
    text-align: left;
}
</style>
"""


@dataclass
class MailerConfig:
    """``--mail-*`` options (README.md:593-599; mailer_exporter.rs:29-50)."""

    mail_to: tuple[str, ...] = ()
    mail_from: str = DEFAULT_MAIL_FROM
    mail_from_name: str = DEFAULT_MAIL_FROM_NAME
    mail_smtp_host: str = DEFAULT_MAIL_SMTP_HOST
    mail_smtp_port: int = DEFAULT_MAIL_SMTP_PORT
    mail_smtp_user: str | None = None
    mail_smtp_pass: str | None = None
    mail_subject_template: str = DEFAULT_MAIL_SUBJECT_TEMPLATE

    def should_be_activated(self) -> bool:
        return bool(self.mail_to)  # mailer_exporter.rs:240-242


def build_subject(template: str, host: str, now) -> str:
    """Interpolate ``%domain%``/``%date%``/``%datetime%``
    (mailer_exporter.rs:123-135).  ``now`` is injected for determinism."""
    return (template
            .replace("%domain%", host)
            .replace("%date%", now.strftime("%Y-%m-%d"))
            .replace("%datetime%", now.strftime("%Y-%m-%d %H:%M")))


def resolve_mail_from(mail_from: str, hostname: str) -> str:
    """Replace the ``@your-hostname.com`` placeholder with the real
    hostname (mailer_exporter.rs:137-142)."""
    return mail_from.replace("@your-hostname.com", f"@{hostname}")


def email_body_html(host: str) -> str:
    """Cover-letter HTML body (mailer_exporter.rs:85-103): delivery note
    for the attached report with the crawled host in bold."""
    return (
        "Hello,<br>\n<br>\n"
        f"We are pleased to deliver the attached report detailing a thorough "
        f"crawling and analysis of your website, <b>{host}</b>. Our advanced "
        "website crawler has identified key areas that require your attention, "
        "including found redirects, 404 error pages, and potential issues in "
        "accessibility, best practices, performance, and security.<br>\n<br>\n"
        "The report is in HTML format and for full functionality, it should be "
        "opened in a JavaScript-enabled browser. This will allow you to access "
        "advanced features such as searching and sorting data within tables. "
        "Some mobile email clients may not support all interactive "
        "elements.<br>\n<br>\n"
        "Best regards,<br>\n<br>\n"
        f"SiteOne Crawler Ray v{__version__}"
    )


def style_html_body_for_email(html: str) -> str:
    """Inject inline table styles at ``<body>`` (mailer_exporter.rs:105-121)."""
    return html.replace("<body>", _EMAIL_BODY_STYLE)


def attachment_filename(host: str, now) -> str:
    """``report-<host>-<YYYYmmddHHMMSS>.html`` (mailer_exporter.rs:251-253)."""
    return f"report-{host}-{now.strftime('%Y%m%d%H%M%S')}.html"


def compose_email(cfg: MailerConfig, recipient: str, host: str,
                  html_report: str, now, hostname: str) -> EmailMessage:
    """One deterministic multipart/mixed message per recipient
    (mailer_exporter.rs:159-191): text/html cover letter + the HTML
    report as an application/octet-stream attachment."""
    msg = EmailMessage()
    msg["From"] = f"{cfg.mail_from_name} <{resolve_mail_from(cfg.mail_from, hostname)}>"
    msg["To"] = recipient
    msg["Subject"] = build_subject(cfg.mail_subject_template, host, now)
    msg["Date"] = formatdate(now.timestamp(), localtime=True)
    msg.set_content(style_html_body_for_email(email_body_html(host)),
                    subtype="html")
    msg.add_attachment(html_report.encode("utf-8"),
                       maintype="application", subtype="octet-stream",
                       filename=attachment_filename(host, now))
    return msg


def smtp_transport(msg: EmailMessage, cfg: MailerConfig) -> None:
    """Real SMTP send (25/587 STARTTLS/465 implicit-TLS port policy —
    mailer_exporter.rs:193-228).  Raises on any failure; the caller
    records it as ``mail-report-failed``."""
    import smtplib

    if cfg.mail_smtp_port == 465:
        client = smtplib.SMTP_SSL(cfg.mail_smtp_host, cfg.mail_smtp_port, timeout=30)
    else:
        client = smtplib.SMTP(cfg.mail_smtp_host, cfg.mail_smtp_port, timeout=30)
        if cfg.mail_smtp_port == 587:
            client.starttls()
    try:
        if cfg.mail_smtp_user and cfg.mail_smtp_pass:
            client.login(cfg.mail_smtp_user, cfg.mail_smtp_pass)
        client.send_message(msg)
    finally:
        client.quit()


def file_outbox_transport(outbox_dir: str):
    """Offline transport: write each composed message verbatim as
    ``<outbox>/<n>-<recipient>.eml`` (sandbox stand-in for SMTP)."""
    os.makedirs(outbox_dir, exist_ok=True)
    counter = [0]

    def send(msg: EmailMessage, cfg: MailerConfig) -> None:
        counter[0] += 1
        safe = msg["To"].replace("@", "_at_").replace("/", "_")
        with open(os.path.join(outbox_dir, f"{counter[0]:03d}-{safe}.eml"), "wb") as f:
            f.write(bytes(msg))

    return send


def send_report_email(cfg: MailerConfig, host: str, html_report: str, now,
                      hostname: str, transport=smtp_transport) -> dict:
    """Compose + deliver to every recipient (mailer_exporter.rs:244-282).

    Returns a summary entry — ``{"id": "mail-report-sent", ...}`` info on
    success, ``mail-report-failed`` critical on the first error — exactly
    the two outcomes the reference records."""
    if not cfg.mail_to:
        return {"id": "mail-report-failed", "severity": "critical",
                "message": "No recipients specified for email"}
    try:
        for recipient in cfg.mail_to:
            transport(compose_email(cfg, recipient, host, html_report, now, hostname), cfg)
    except Exception as e:  # noqa: BLE001 — any delivery error becomes a summary row
        return {"id": "mail-report-failed", "severity": "critical",
                "message": f"Failed to send email report: {e}"}
    return {"id": "mail-report-sent", "severity": "info",
            "message": (f"HTML report sent to {', '.join(cfg.mail_to)} "
                        f"using {cfg.mail_smtp_host}:{cfg.mail_smtp_port}")}


# ---- upload ---------------------------------------------------------------

DEFAULT_UPLOAD_TO = "https://crawler.siteone.io/up"
DEFAULT_UPLOAD_RETENTION = "30d"
DEFAULT_UPLOAD_TIMEOUT = 3600


@dataclass
class UploadConfig:
    """``--upload*`` options (README.md:605-609; upload_exporter.rs:19-50)."""

    enabled: bool = False
    endpoint: str = DEFAULT_UPLOAD_TO
    retention: str | None = DEFAULT_UPLOAD_RETENTION
    password: str | None = None
    timeout: int = DEFAULT_UPLOAD_TIMEOUT
    extra_form: tuple[tuple[str, str], ...] = field(default_factory=tuple)

    def should_be_activated(self) -> bool:
        return self.enabled  # upload_exporter.rs:142-144


def _percent_encode(data: bytes) -> str:
    """Percent-encode every non-alphanumeric byte — the reference uses
    ``percent_encoding::NON_ALPHANUMERIC`` (upload_exporter.rs:94-96),
    stricter than urlencode defaults (no ``-._~`` passthrough)."""
    out = []
    for b in data:
        c = chr(b)
        if c.isascii() and c.isalnum():
            out.append(c)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def build_upload_form(html: str, *, platform: str, arch: str,
                      retention: str | None, password: str | None) -> str:
    """The exact ``application/x-www-form-urlencoded`` body
    (upload_exporter.rs:59-105): gzipped ``htmlBody`` first (mtime=0 so
    the payload is deterministic), then version/platform/arch and the
    optional retention / trimmed non-empty password."""
    compressed = gzip.compress(html.encode("utf-8"), mtime=0)
    fields = [("version", __version__), ("platform", platform), ("arch", arch)]
    if retention:
        fields.append(("retention", retention))
    if password and password.strip():
        fields.append(("password", password.strip()))
    parts = [f"htmlBody={_percent_encode(compressed)}"]
    parts += [f"{_percent_encode(k.encode())}={_percent_encode(v.encode())}"
              for k, v in fields]
    return "&".join(parts)


def decode_upload_form(body: str) -> dict[str, bytes]:
    """Inverse of :func:`build_upload_form` (for tests and the outbox
    transport): field name → raw bytes, ``htmlBody`` gunzipped."""
    out: dict[str, bytes] = {}
    for part in body.split("&"):
        k, _, v = part.partition("=")
        raw = urllib.parse.unquote_to_bytes(v)
        out[k] = gzip.decompress(raw) if k == "htmlBody" else raw
    return out


def parse_upload_response(status_code: int, body: str) -> str:
    """JSON response handling (upload_exporter.rs:114-133): return the
    report ``url`` or raise with the server's ``error`` / the status."""
    try:
        payload = json.loads(body)
    except ValueError:
        payload = None
    if isinstance(payload, dict):
        if isinstance(payload.get("url"), str):
            return payload["url"]
        if isinstance(payload.get("error"), str):
            raise RuntimeError(f"Upload failed: {payload['error']} ({status_code})")
    raise RuntimeError(f"Upload failed: unknown error ({status_code})")


def http_upload_transport(form_body: str, cfg: UploadConfig) -> tuple[int, str]:
    """Real HTTP POST (upload_exporter.rs:107-115).  No network in this
    sandbox — the error surfaces as ``upload-failed``."""
    import urllib.request

    req = urllib.request.Request(
        cfg.endpoint, data=form_body.encode("ascii"),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST")
    with urllib.request.urlopen(req, timeout=cfg.timeout) as resp:
        return resp.status, resp.read().decode("utf-8", "replace")


def file_upload_transport(outbox_dir: str):
    """Offline transport: write the exact form body to
    ``<outbox>/upload-body.txt`` and answer like the endpoint would."""
    os.makedirs(outbox_dir, exist_ok=True)

    def send(form_body: str, cfg: UploadConfig) -> tuple[int, str]:
        path = os.path.join(outbox_dir, "upload-body.txt")
        with open(path, "w") as f:
            f.write(form_body)
        return 200, json.dumps({"url": "file://" + path})

    return send


def upload_report(cfg: UploadConfig, html: str, *, platform: str = "linux",
                  arch: str = "x64", transport=http_upload_transport) -> dict:
    """Build + POST the form; one summary entry either way
    (upload_exporter.rs:146-184)."""
    form = build_upload_form(html, platform=platform, arch=arch,
                             retention=cfg.retention, password=cfg.password)
    try:
        status_code, body = transport(form, cfg)
        url = parse_upload_response(status_code, body)
    except Exception as e:  # noqa: BLE001
        return {"id": "upload-failed", "severity": "critical",
                "message": f"HTML report upload failed: {e}"}
    return {"id": "upload-done", "severity": "info",
            "message": f"HTML report uploaded to '{url}'"}
