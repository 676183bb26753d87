"""Report-layer scalar formatting helpers — SURVEY §2.8.

Behavioral ports of the reference's utils formatting kernels
(/root/reference/src/utils.rs): human sizes (:88-103), durations
(:105-116), ages (:118-137), two-thirds URL truncation (:280-344),
scheme/host stripping (:418-448), transport-error descriptions
(:364-403).  Pure functions used by the text/HTML report writers —
never in the data path."""

from __future__ import annotations

import math

_SIZE_UNITS = ("B", "kB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")


def formatted_size(n_bytes: int, precision: int = 0) -> str:
    """utils.rs:88-103."""
    b = float(max(0, n_bytes))
    pow_ = int(math.floor(math.log(b) / math.log(1024))) if b > 0 else 0
    pow_ = min(pow_, len(_SIZE_UNITS) - 1)
    value = b / (1024.0 ** pow_)
    return f"{value:.{precision}f} {_SIZE_UNITS[pow_]}"


def formatted_duration(seconds: float) -> str:
    """utils.rs:105-116."""
    if seconds < 1.0:
        return f"{int(seconds * 1000)} ms"
    if seconds < 10.0:
        s = f"{seconds:.1f}"
        if s.endswith(".0"):
            s = s[:-2]
        return f"{s} s"
    return f"{int(seconds)} s"


def _strip_dot_zero(s: str) -> str:
    return s[:-2] if s.endswith(".0") else s


def formatted_age(age_seconds: int) -> str:
    """utils.rs:118-137."""
    a = age_seconds
    if a < 60:
        return f"{a} sec(s)"
    if a < 3600:
        return f"{_strip_dot_zero(f'{a / 60.0:.1f}')} min(s)"
    if a < 86400:
        return f"{_strip_dot_zero(f'{a / 3600.0:.1f}')} hour(s)"
    return f"{_strip_dot_zero(f'{a / 86400.0:.1f}')} day(s)"


def truncate_in_two_thirds(text: str, max_length: int, placeholder: str = "…") -> str:
    """utils.rs:280-315: keep the first 2/3 and the tail."""
    if len(text) <= max_length:
        return text
    ph = len(placeholder)
    first = math.ceil(max_length * 2.0 / 3.0)
    second = max_length - first - ph if max_length > first + ph else 0
    tail = text[len(text) - second:] if second else ""
    return f"{text[:first]}{placeholder}{tail}"


def truncate_url(url: str, max_length: int, placeholder: str = "…",
                 strip_hostname: str | None = None,
                 scheme_of_hostname_to_strip: str | None = None) -> str:
    """utils.rs:317-344: optionally strip the origin, then 2/3-truncate."""
    if strip_hostname:
        if scheme_of_hostname_to_strip:
            url = url.replace(f"{scheme_of_hostname_to_strip}://{strip_hostname}", "")
        else:
            url = url.replace(f"http://{strip_hostname}", "").replace(
                f"https://{strip_hostname}", "")
    if len(url) > max_length:
        url = truncate_in_two_thirds(url, max_length, placeholder)
    return url


_TRANSPORT_SHORT = {-1: "-1:CON", -2: "-2:TIM", -3: "-3:RST"}
_TRANSPORT_LONG = {-1: "-1:CONN-FAIL", -2: "-2:TIMEOUT", -3: "-3:SRV-RESET"}


def status_code_str(code: int, short: bool = True) -> str:
    """utils.rs:364-403: negative transport codes get descriptions."""
    if code < 0:
        table = _TRANSPORT_SHORT if short else _TRANSPORT_LONG
        return table.get(code, f"{code}:ERR")
    return str(code)


_EXT_RE = None


def export_file_path(file: str, default_extension: str, *, add_host: bool = False,
                     host: str | None = None, add_timestamp: bool = False,
                     now=None) -> str:
    """Output-file name decoration (base_exporter.rs:18-58): append the
    default extension when none present, then insert ``.{host}`` and/or
    ``.{YYYY-MM-DD.HH-MM-SS}`` before the extension
    (--add-host-to-output-file / --add-timestamp-to-output-file)."""
    import re
    from datetime import datetime

    global _EXT_RE
    if _EXT_RE is None:
        _EXT_RE = re.compile(r"\.[a-zA-Z0-9]{1,10}$")
    if not _EXT_RE.search(file):
        file = f"{file}.{default_extension}"
    if add_host and host:
        file = _EXT_RE.sub(lambda m: f".{host}{m.group(0)}", file)
    if add_timestamp:
        ts = (now or datetime.now()).strftime("%Y-%m-%d.%H-%M-%S")
        file = _EXT_RE.sub(lambda m: f".{ts}{m.group(0)}", file)
    return file
