"""glistcompare argv/error-chrome parity vs the reference binary.

Covers the full main() surface of src/glistcompare.c:84-430: warning
quirks (-o swallowing a flag-like value, -c/-mm missing-value
warnings), strtol end-check semantics, silent unknown rules, the
no-method silent success, multi-file rule validation with the
stable-zero NUnique print, file validation chrome (wrong word length,
unknown format with the az assertion line, truncated lists in mapped
vs stream mode), subset errors, and --print_operation/-D output.

Cases where the reference segfaults (rc >= 128: unopenable file first,
bad file as first argument) are skipped — the reference is not an
oracle there (CLAUDE.md parity conventions).
"""

import subprocess
import sys

import pytest

from tests.conftest import run_reference
from tests.test_cli_chrome import run_ours


@pytest.fixture(scope="module")
def lists(tmp_path_factory):
    d = tmp_path_factory.mktemp("gc_chrome")
    (d / "a.fa").write_text(">s1\nACGTACGTACGTACGT\n")
    (d / "b.fa").write_text(">s2\nTTTTACGTACGTAAAA\n")
    for fa, w, o in (("a.fa", 8, "A"), ("b.fa", 8, "B"), ("b.fa", 9, "C")):
        r = run_reference(["glistmaker", str(d / fa), "-w", str(w),
                           "-o", str(d / o)])
        assert r.returncode == 0
    # truncated list: magic valid, fails gt4_word_map_new's size check
    (d / "trunc.list").write_bytes((d / "A_8.list").read_bytes()[:20])
    return d


CASES = [
    [],
    ["{A}", "{B}"],                                  # no method: silent rc 0
    ["{A}", "{B}", "--print_operation"],
    ["{A}", "{B}", "-u", "--print_operation"],
    ["{A}", "{B}", "-dd", "--print_operation", "-r", "max", "--count_only"],
    ["{A}", "{B}", "-u", "-D"],
    ["{A}", "{B}", "-d", "-du", "-D", "--count_only"],
    ["{A}", "{C}", "-u"],                            # word length mismatch
    ["{A}", "{FA}", "-u"],                           # unknown format (2nd)
    ["{A}", "{B}", "-o", "-u"],                      # -o swallows -u
    ["{A}", "{B}", "-o"],
    ["{A}", "{B}", "-c"],                            # missing cutoff warning
    ["{A}", "{B}", "-u", "-c", "-x"],                # bad cutoff: err + help
    ["{A}", "{B}", "-u", "-c", ""],                  # strtol("") accepted as 0
    ["{A}", "{B}", "-u", "-r", "5abc", "--count_only"],  # strtol prefix
    ["{A}", "{B}", "-u", "-r", "bogus", "--count_only"],  # silently kept
    ["{A}", "{B}", "-u", "--seed", "abc"],           # strtoll, no end check
    ["{A}", "{B}", "-mm"],                           # warning w/o newline
    ["{A}", "{B}", "-u", "-mm", "2"],                # mm disables union!
    ["{A}", "{B}", "-d", "-mm", "1", "--count_only"],
    ["{A}", "{B}", "-du", "-mm", "1", "--count_only"],
    ["{A}", "{B}", "{A}", "-u", "-i", "-r", "min", "--count_only"],
    ["{A}", "{B}", "{A}", "-u", "-i", "-r", "min"],
    ["{A}", "{B}", "{A}", "-u", "-i", "-r", "subtract"],
    ["{A}", "{B}", "{A}", "-u", "-r", "min"],
    ["{A}", "{B}", "{A}", "-d"],
    ["{A}", "{B}", "{A}", "-u", "-mm", "2"],
    ["{A}", "{B}", "-u", "-ss", "rand"],             # missing size: help(1)
    ["{A}", "{B}", "-ss", "bogus", "5"],
    ["{A}", "-ss", "rand", "2abc"],
    ["{A}", "{B}", "-ss", "rand", "5"],              # multi-file subset
    ["{A}", "-ss", "rand_unique", "999999"],         # size > unique kmers
    ["{A}", "{T}", "-u"],                            # truncated 2nd file
    ["{A}", "{T}", "-u", "--stream"],                # stream: header error
    ["{A}", "{C}", "-u", "--stream"],
    ["{A}", "{B}", "-u", "-o", "x" * 201],
    ["{A}", "{B}", "-q"],
    ["{A}", "{B}", "-u", "--disable_scouts", "--stream"],
    ["{A}", "{B}", "-u", "--count_only", "-r", "0"],
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: " ".join(c)[:50] or "noargs")
def test_glistcompare_chrome(case, lists, tmp_path, monkeypatch):
    sub = {"{A}": str(lists / "A_8.list"), "{B}": str(lists / "B_8.list"),
           "{C}": str(lists / "C_9.list"), "{FA}": str(lists / "a.fa"),
           "{T}": str(lists / "trunc.list")}
    args = [sub.get(a, a) for a in case]
    ref = run_reference(["glistcompare"] + args, cwd=tmp_path)
    if ref.returncode < 0 or ref.returncode >= 128:
        pytest.skip("reference segfaults: not an oracle here")
    monkeypatch.chdir(tmp_path)
    rc, out, err = run_ours("glistcompare", args)
    assert out == ref.stdout.decode(), f"stdout differs for {args}"
    assert err == ref.stderr.decode(), f"stderr differs for {args}"
    assert rc == ref.returncode, f"exit {rc} != {ref.returncode} for {args}"
