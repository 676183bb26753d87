"""Reference option-surface sweep (core_options.rs parity).

Enumerates EVERY option string declared in the reference's
/root/reference/src/options/core_options.rs (196 declarations + the 3
``-regexp`` aliases + ``--config-file``) and proves one command line
supplying all of them parses here — semantically-covered options bind
their real destinations, the documented tail is accepted as inert
no-ops with a warning naming the reason.
"""

from __future__ import annotations

import os
import re

import pytest

REF = "/root/reference/src/options/core_options.rs"

_DECL_RE = re.compile(
    r'CrawlerOption::new\(\s*"(--[a-z0-9-]+)",\s*'
    r'(None|Some\("[^"]*"\)|"[^"]*"),?\s*"[^"]*",\s*OptionType::(\w+)',
    re.S,
)

# options whose local parser constrains values (choices=…) or that
# argparse handles specially
SPECIAL_VALUES = {
    "--output": "text",
    "--result-storage-compression": None,  # ref Bool: bare flag → gzip
    "--config-file": "/dev/null",
}
SKIP = {"--version", "--help"}  # argparse actions that exit the process

TYPE_VALUES = {
    "Int": "3",
    "Float": "1.5",
    "SizeMG": "512M",
    "HostAndPort": "proxy.test:8080",
    "Resolve": "example.test:443:127.0.0.1",
    "Email": "user@example.test",
    "Url": "https://example.test/x",
    "Regex": "foo.*bar",
    "File": "/tmp/graft-opt-file",
    "Dir": "/tmp",
    "ReplaceContent": "foo -> bar",
    "String": "x",
}


def _reference_options() -> dict[str, str]:
    src = open(REF).read()
    opts: dict[str, str] = {}
    for m in _DECL_RE.finditer(src):
        opts[m.group(1)] = m.group(3)
        am = re.match(r'Some\("(--[a-z0-9-]+)"\)', m.group(2))
        if am:  # long-form alias (e.g. --include-regexp) — same type
            opts[am.group(1)] = m.group(3)
    opts.setdefault("--config-file", "File")
    # completeness: no option STRING in the file is unaccounted for
    all_strings = set(re.findall(r'"(--[a-z0-9-]+)"', src))
    assert all_strings <= set(opts), all_strings - set(opts)
    return opts


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree not present")
def test_every_core_options_string_parses():
    from siteone_crawler_ray.cli import build_parser

    opts = _reference_options()
    assert len(opts) >= 199  # 196 declarations + 3 aliases + config-file - skips
    argv: list[str] = []
    for opt, typ in sorted(opts.items()):
        if opt in SKIP:
            continue
        if opt in SPECIAL_VALUES:
            v = SPECIAL_VALUES[opt]
            argv += [opt] if v is None else [f"{opt}={v}"]
        elif typ == "Bool":
            argv.append(opt)  # reference bools are bare flags
        else:
            argv.append(f"{opt}={TYPE_VALUES[typ]}")
    args = build_parser().parse_args(argv)
    # spot-check: aliases landed on their semantic destinations
    assert args.max_non200_per_basename == 3
    assert args.output_html_file == "/tmp/graft-opt-file"
    assert args.analyzer_filter_regex == "foo.*bar"
    assert args.result_storage_compression == "gzip"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree not present")
def test_inert_options_warn_with_reason(capsys):
    """Supplying an inert option warns on stderr (accept-and-record),
    and the warning names the option."""
    from siteone_crawler_ray import cli

    rc = cli.main(["--browser", "--ai-model", "m", "--html-to-markdown",
                   "/nonexistent-input.html"], init_ray=False)
    err = capsys.readouterr().err
    assert "--browser accepted but inert" in err
    assert "--ai-model accepted but inert" in err
    assert rc != 0  # the conversion input doesn't exist; parse still worked


def test_inert_table_consistent_with_parser():
    """Every INERT_OPTIONS entry is declared on the parser exactly once
    and is NOT one of the semantically-bound options."""
    from siteone_crawler_ray.cli import INERT_OPTIONS, build_parser

    p = build_parser()
    strings = [s for a in p._actions for s in a.option_strings]
    for opt, (kind, why) in INERT_OPTIONS.items():
        assert strings.count(opt) == 1, opt
        assert kind in ("flag", "value") and why
