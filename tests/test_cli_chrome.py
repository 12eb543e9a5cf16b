"""CLI chrome parity: usage screens, version banners, no-arg errors.

A reference user's muscle memory (and scripts grepping usage/version
output) must keep working: for each tool and argument vector, stdout,
stderr, and the exit code must match the reference binary byte for byte.
Includes the argv-soup surfaces fuzzed in round 2: gmer_caller has NO
-h (unknown args are the counts file), numerics parse with
strtol/atof prefix semantics, gassembler's usage screen renders the
LIVE parameter values, and gt4_mmap failures print their perror
prefix.
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
    # round-2 argv-soup fuzz findings (fuzz_chrome.py patterns)
    ("gmer_caller", ["-h"]),
    ("gmer_caller", ["--runs", "-1"]),
    ("gmer_caller", ["--alternatives", "0", "--runs", "abc", "-v", "-1"]),
    ("gmer_caller", ["--num_threads", "0", "nofile.txt"]),
    ("gmer_caller", ["--num_threads", "4294967296", "nofile.txt"]),
    ("gmer_caller", ["--training_size", "xxx", "--info", "0.5"]),
    ("gmer_caller", ["--model", "bogus"]),
    ("gmer_caller", ["--params", "1", "2", "3"]),
    ("gmer_caller", ["-D", "--no_genotypes"]),
    ("gassembler", ["--min_p"]),
    ("gassembler", ["--num_threads", "-v", "12", "--region", "12"]),
    ("gassembler", ["--min_pmut", "12x", "--num_threads", "12", "-h",
                    "--min_p", "12x"]),
    ("gassembler", ["--coverage", "abc"]),
    ("gassembler", ["--coverage", "0"]),
    ("gassembler", ["--sex", "bogus"]),
    ("gassembler", ["--region", "NOPE", "10", "20", "ACGT"]),
    ("gassembler", ["--region", " 7", "-h", "0", "--dbi", "-1"]),
    ("gassembler", ["--num_threads", "7", "--badnum"]),
    ("gassembler", ["--error_prob", "5", "--max_read_length", "7",
                    "--advanced"]),
    ("gassembler", ["--dbi", "nofile.idx", "--region_file", "r.txt"]),
    ("glistquery", ["--distribution", "zzz"]),
    ("glistquery", ["-mm", "4294967296", "nofile.list"]),
    ("glistquery", ["-mm", "17", "nofile.list"]),
    ("glistquery", ["-min", "12x"]),
    ("glistquery", ["nofile.list", "-max"]),
    ("glistquery", ["-p", "33"]),
    ("gmer_counter", ["--distribution", "nofile.txt", "-dbb",
                      "no-such-db"]),
    ("gmer_counter", ["-w", "", "s1", "s2"]),
    ("gmer_counter", ["-db", "nofile.txt", "x.fa"]),
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
