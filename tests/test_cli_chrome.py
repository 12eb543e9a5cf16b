"""CLI chrome parity: usage screens, version banners, no-arg errors.

A reference user's muscle memory (and scripts grepping usage/version
output) must keep working: for each tool and argument vector, stdout,
stderr, and the exit code must match the reference binary byte for byte.
gmer_caller is exempt from --help (the reference treats it as a file
name and fails on mmap; we print a usage screen instead — strictly
additive).
"""

import io
import sys

import pytest

from tests.conftest import run_reference


CASES = [
    ("glistmaker", ["--help"]),
    ("glistmaker", ["-h"]),
    ("glistmaker", ["-v"]),
    ("glistmaker", []),
    ("glistcompare", ["--help"]),
    ("glistcompare", ["-v"]),
    ("glistcompare", []),
    ("glistquery", ["--help"]),
    ("glistquery", ["-v"]),
    ("glistquery", []),
    ("gmer_counter", ["--help"]),
    ("gmer_counter", ["-v"]),
    ("gmer_counter", []),
    ("gassembler", ["--help"]),
    ("gassembler", ["--advanced"]),
    ("gassembler", ["-v"]),
    ("gmer_caller", ["--version"]),
    ("glistmaker", ["--bogus"]),
    ("glistcompare", ["--bogus"]),
    ("glistquery", ["--bogus"]),
    ("gassembler", ["--bogus"]),
]


def run_ours(tool, args):
    import importlib
    mod = importlib.import_module(f"genometester4_tpu.cli.{tool}")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = io.StringIO(), io.StringIO()
    try:
        try:
            rc = mod.main(list(args))
        except SystemExit as e:
            rc = e.code if isinstance(e.code, int) else (0 if e.code is None
                                                         else 1)
        out, err = sys.stdout.getvalue(), sys.stderr.getvalue()
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    return rc if rc is not None else 0, out, err


@pytest.mark.parametrize("tool,args", CASES,
                         ids=[f"{t}-{' '.join(a) or 'noargs'}"
                              for t, a in CASES])
def test_cli_chrome_matches_reference(tool, args):
    ref = run_reference([tool] + args)
    rc, out, err = run_ours(tool, args)
    assert out == ref.stdout.decode(), f"{tool} {args}: stdout differs"
    assert err == ref.stderr.decode(), f"{tool} {args}: stderr differs"
    assert rc == ref.returncode, f"{tool} {args}: exit {rc} != {ref.returncode}"
