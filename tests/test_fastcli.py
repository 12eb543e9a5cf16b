"""Native CLI front-end (.gt4cli/glistcompare, native/gt4cli.c).

bin/glistcompare is a /bin/sh wrapper that execs the native front-end
for the floor-bound fast paths (-ss, N-list -u/-i) and lets it exec the
Python launcher (bin/_glistcompare.py) for everything else. These tests
pin:

* the whitelisted happy paths are byte-identical across all THREE
  implementations: native front-end, Python fast path
  (GT4_NO_FASTCLI=1), and the reference binary;
* every non-whitelisted shape falls back to Python with identical
  chrome/exit codes (the front-end must never half-handle a case).
"""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import has_reference, run_reference, random_fasta

REPO = Path(__file__).resolve().parent.parent
BIN = str(REPO / "bin" / "glistcompare")


@pytest.fixture(scope="module", autouse=True)
def built_frontend():
    r = subprocess.run([str(REPO / "tools" / "build_gt4cli.sh")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    assert (REPO / ".gt4cli" / "glistcompare").exists()


@pytest.fixture(scope="module")
def lists(tmp_path_factory):
    if not has_reference():
        pytest.skip("reference not built")
    d = tmp_path_factory.mktemp("fastcli")
    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        fa = d / f"in{i}.fa"
        fa.write_text(random_fasta(rng, 3, 3000, 6000, n_prob=0.01))
        r = run_reference(["glistmaker", str(fa), "-w", "16",
                           "-o", str(d / f"l{i}")])
        assert r.returncode == 0, r.stderr
        paths.append(str(d / f"l{i}_16.list"))
    return d, paths


def run3(args, cwd, out_names):
    """Run native / python-fallback / reference on the same argv,
    asserting identical exit codes and output bytes."""
    rn = subprocess.run([BIN] + args + ["-o", "n"], cwd=cwd,
                        capture_output=True)
    rp = subprocess.run([BIN] + args + ["-o", "p"], cwd=cwd,
                        capture_output=True,
                        env=dict(os.environ, GT4_NO_FASTCLI="1"))
    rr = run_reference(["glistcompare"] + args + ["-o", "r"], cwd=cwd)
    assert rn.returncode == rp.returncode == rr.returncode == 0, (
        args, rn.stderr, rp.stderr, rr.stderr)
    assert rn.stdout == rp.stdout == rr.stdout
    for name in out_names:
        a = (cwd / ("n" + name)).read_bytes()
        b = (cwd / ("p" + name)).read_bytes()
        c = (cwd / ("r" + name)).read_bytes()
        assert a == b, f"native != python fast path: {name}"
        assert a == c, f"native != reference: {name}"


@pytest.mark.parametrize("method", ["rand", "rand_unique",
                                    "rand_weighted_unique"])
def test_subset_three_way_identical(lists, method):
    d, paths = lists
    run3([paths[0], "-ss", method, "800", "--seed", "11"],
         d, ["_subset_16.list"])


def test_subset_size_exceeds_rand(lists):
    """rand method with size > total instances: our walk stops at the
    list end (native/listkernel.c fgx_subset header comment) while the
    reference's while(out>0) loops past the list — non-oracle UB, so
    only native-vs-python parity is asserted here."""
    d, paths = lists
    args = [paths[0], "-ss", "rand", "99999999", "--seed", "3"]
    rn = subprocess.run([BIN] + args + ["-o", "nx"], cwd=d,
                        capture_output=True)
    rp = subprocess.run([BIN] + args + ["-o", "px"], cwd=d,
                        capture_output=True,
                        env=dict(os.environ, GT4_NO_FASTCLI="1"))
    assert rn.returncode == rp.returncode == 0, (rn.stderr, rp.stderr)
    assert (d / "nx_subset_16.list").read_bytes() == \
           (d / "px_subset_16.list").read_bytes()


@pytest.mark.parametrize("flags,outs", [
    (["-u"], ["_16_union.list"]),
    (["-i"], ["_16_intrsec.list"]),
    (["-u", "-i"], ["_16_union.list", "_16_intrsec.list"]),
])
def test_multi_three_way_identical(lists, flags, outs):
    d, paths = lists
    run3(paths + flags, d, outs)


def test_multi_with_empty_input(lists, tmp_path):
    """A zero-record member list exercises the empty-stream branch."""
    d, paths = lists
    empty = tmp_path / "empty_16.list"
    # intersect two disjoint-ish subsets to likely-nonempty, then force
    # an actually-empty list via an impossible cutoff in python pipeline
    r = subprocess.run([BIN, paths[0], "-ss", "rand_unique", "0",
                        "--seed", "1", "-o", str(tmp_path / "e")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    os.replace(tmp_path / "e_subset_16.list", empty)
    run3([paths[0], paths[1], str(empty), "-u"], d, ["_16_union.list"])
    run3([paths[0], paths[1], str(empty), "-i"], d, ["_16_intrsec.list"])


@pytest.mark.parametrize("args", [
    ["-v"],                                     # version chrome
    ["-u"],                                     # no files
    ["LST0", "LST1", "-u"],                     # 2-list → pair pipeline
    ["LST0", "LST1", "LST2", "-u", "-c", "2"],  # cutoff flag
    ["LST0", "LST1", "LST2", "-u", "-r", "max"],  # rule flag
    ["LST0", "LST1", "LST2", "--count_only", "-u"],
    ["LST0", "-ss", "rand_unique", "99999999"],  # unique > n_words chrome
    ["LST0", "-ss", "bogus", "5"],               # bad method chrome
    ["nofile.list", "-ss", "rand", "5"],         # open error chrome
    ["LST0", "LST1", "LST2", "-u", "-o", "-i"],  # -o swallow quirk
    ["LST0", "LST1", "LST2"],                    # no method selected
])
def test_fallback_matches_reference_chrome(lists, args):
    d, paths = lists
    argv = [paths[int(a[3])] if a.startswith("LST") else a for a in args]
    rn = subprocess.run([BIN] + argv, cwd=d, capture_output=True)
    rr = run_reference(["glistcompare"] + argv, cwd=d)
    if rr.returncode < 0:
        # reference segfaults (e.g. missing-file path) — not an oracle
        return
    assert rn.returncode == rr.returncode, (args, rn.stderr, rr.stderr)
    assert rn.stdout == rr.stdout
    assert rn.stderr == rr.stderr


@pytest.mark.parametrize("flags", [["-u", "--count_only"],
                                   ["-i", "--count_only"],
                                   ["-u", "-i", "--count_only"]])
def test_multi_count_only_three_way(lists, flags):
    d, paths = lists
    rn = subprocess.run([BIN] + paths + flags, cwd=d, capture_output=True)
    rp = subprocess.run([BIN] + paths + flags, cwd=d, capture_output=True,
                        env=dict(os.environ, GT4_NO_FASTCLI="1"))
    rr = run_reference(["glistcompare"] + paths + flags, cwd=d)
    assert rn.returncode == rp.returncode == rr.returncode == 0
    assert rn.stdout == rp.stdout == rr.stdout


BINQ = str(REPO / "bin" / "glistquery")


@pytest.mark.parametrize("args", [
    ["--stat"], ["--stats"], ["-stat"], ["--median"], ["--gc"],
    ["--distribution", "10"], ["--distribution", "0"],
])
def test_glistquery_stats_three_way(lists, args):
    d, paths = lists
    for argv in ([paths[0]] + args, [paths[0], paths[1]] + args):
        rn = subprocess.run([BINQ] + argv, cwd=d, capture_output=True)
        rp = subprocess.run([BINQ] + argv, cwd=d, capture_output=True,
                            env=dict(os.environ, GT4_NO_FASTCLI="1"))
        rr = run_reference(["glistquery"] + argv, cwd=d)
        assert rn.returncode == rp.returncode == rr.returncode == 0, (
            argv, rn.stderr, rp.stderr, rr.stderr)
        assert rn.stdout == rp.stdout == rr.stdout, argv


def test_glistquery_stat_on_index(lists, tmp_path):
    """--stat accepts .index headers (the one index case the fast path
    answers); the native front-end must match byte-for-byte."""
    d, paths = lists
    rng = np.random.default_rng(9)
    fa = tmp_path / "ix.fa"
    fa.write_text(random_fasta(rng, 2, 2000, 4000))
    r = run_reference(["glistmaker", str(fa), "-w", "16", "--index",
                       "-o", str(tmp_path / "ix")])
    assert r.returncode == 0, r.stderr
    idx = str(tmp_path / "ix_16.index")
    rn = subprocess.run([BINQ, idx, "--stat"], capture_output=True)
    rr = run_reference(["glistquery", idx, "--stat"])
    assert rn.returncode == rr.returncode == 0
    assert rn.stdout == rr.stdout
    # --median on an index needs the generic path: must fall back, not
    # misanswer
    rn = subprocess.run([BINQ, idx, "--median"], capture_output=True)
    rr = run_reference(["glistquery", idx, "--median"])
    assert rn.returncode == rr.returncode
    assert rn.stdout == rr.stdout


def test_glistquery_list_query_three_way(lists, tmp_path):
    """-l fast path: zipper + native formatter, three-way identical;
    also the zero-hit and self-query (all-hit) shapes."""
    d, paths = lists
    # subset of paths[0] as query: all hits with the query's counts
    r = subprocess.run([BIN, paths[0], "-ss", "rand_unique", "500",
                        "--seed", "3", "-o", str(tmp_path / "q")],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    q = str(tmp_path / "q_subset_16.list")
    for searched, query in ((paths[0], q), (paths[0], paths[1]),
                            (paths[0], paths[0])):
        rn = subprocess.run([BINQ, searched, "-l", query],
                            capture_output=True)
        rp = subprocess.run([BINQ, searched, "-l", query],
                            capture_output=True,
                            env=dict(os.environ, GT4_NO_FASTCLI="1"))
        rr = run_reference(["glistquery", searched, "-l", query])
        assert rn.returncode == rp.returncode == rr.returncode == 0
        assert rn.stdout == rp.stdout == rr.stdout


def test_glistquery_query_file_three_way(lists, tmp_path):
    """-f fast path: clean exact-k token files (upper+lowercase,
    present and absent words), three-way identical."""
    d, paths = lists
    r = run_reference(["glistquery", paths[0]])
    words = [ln.split(b"\t")[0] for ln in r.stdout.splitlines()[:200]]
    qf = tmp_path / "q.txt"
    rows = [w for w in words]
    rows += [w.lower() for w in words[:20]]
    rows += [b"A" * 16, b"acgtacgtacgtacgt"]       # likely absent -> 0
    qf.write_bytes(b"\n".join(rows) + b"\n")
    rn = subprocess.run([BINQ, paths[0], "-f", str(qf)],
                        capture_output=True)
    rp = subprocess.run([BINQ, paths[0], "-f", str(qf)],
                        capture_output=True,
                        env=dict(os.environ, GT4_NO_FASTCLI="1"))
    rr = run_reference(["glistquery", paths[0], "-f", str(qf)])
    assert rn.returncode == rp.returncode == rr.returncode == 0
    assert rn.stdout == rp.stdout == rr.stdout


@pytest.mark.parametrize("args", [
    ["LST0"],                          # full dump (generic path)
    ["LST0", "--stat", "-D"],          # debug disables the fast path
    ["-v"],
    ["LST0", "--distribution"],        # missing arg chrome
    ["nofile.list", "--stat"],
    ["LST0", "-l", "nofile.list"],     # query-list open chrome
    ["LST0", "LST1", "-l", "LST2"],    # multi-searched table path
    ["LST0", "-f", "nofile.txt"],      # query-file open chrome
])
def test_glistquery_fallback_chrome(lists, args):
    d, paths = lists
    argv = [paths[int(a[3])] if a.startswith("LST") else a for a in args]
    rn = subprocess.run([BINQ] + argv, cwd=d, capture_output=True)
    rr = run_reference(["glistquery"] + argv, cwd=d)
    if rr.returncode < 0:
        return  # reference segfault: not an oracle
    assert rn.returncode == rr.returncode, (args, rn.stderr, rr.stderr)
    assert rn.stdout == rr.stdout
    assert rn.stderr == rr.stderr


def test_glistquery_v41_stored_list_start(lists, tmp_path):
    """Round-5 advisor finding: read_info forced list_start=40 for every
    vmin<2, but the reference honors the STORED list_start for 4.1 and
    only implies 40 for 4.0 (word-map.c:198-210). A v4.1 list whose
    records start at 48 must read identically through the native fast
    paths (--median/--gc/-l), the Python fast path, and the reference."""
    d, paths = lists
    raw = bytearray(Path(paths[0]).read_bytes())
    # source is a 4.4 list (48-byte header, records at 48). Rebuild as
    # 4.1: 40-byte header (code,vmaj,vmin,wlen u32 + n_words,total,
    # list_start u64), NONSTANDARD stored list_start=56, 16 pad bytes,
    # then the records — proves the stored offset is honored.
    import struct as _s
    _s.pack_into("<I", raw, 8, 1)          # version_minor = 1
    _s.pack_into("<Q", raw, 32, 56)        # stored list_start = 56
    v41 = tmp_path / "v41_16.list"
    v41.write_bytes(bytes(raw[:40]) + b"\x00" * 16 + bytes(raw[48:]))
    for args in (["--median"], ["--gc"], ["-l", paths[1]],
                 ["-l", str(v41)]):
        argv = [str(v41)] + args
        rn = subprocess.run([BINQ] + argv, capture_output=True)
        rp = subprocess.run([BINQ] + argv, capture_output=True,
                            env=dict(os.environ, GT4_NO_FASTCLI="1"))
        rr = run_reference(["glistquery"] + argv)
        assert rn.returncode == rp.returncode == rr.returncode == 0, (
            args, rn.stderr, rp.stderr, rr.stderr)
        assert rn.stdout == rp.stdout == rr.stdout, args


def test_glistquery_corrupt_wlen_l_falls_back(lists, tmp_path):
    """Round-5 advisor finding: the -l fast path had no word-length
    bound (the -f path guards wlen==0||wlen>32), so a corrupt list
    claiming wlen=2000 drove fgx_dump_records into shift-count UB. It
    must fall back to the Python path and match its bytes exactly."""
    d, paths = lists
    import struct as _s
    for bad_wlen in (0, 2000):
        raws = []
        for p in (paths[0], paths[1]):
            raw = bytearray(Path(p).read_bytes())
            _s.pack_into("<I", raw, 12, bad_wlen)
            raws.append(raw)
        s = tmp_path / f"bad{bad_wlen}_s.list"
        q = tmp_path / f"bad{bad_wlen}_q.list"
        s.write_bytes(bytes(raws[0]))
        q.write_bytes(bytes(raws[1]))
        argv = [str(s), "-l", str(q)]
        rn = subprocess.run([BINQ] + argv, capture_output=True)
        rp = subprocess.run([BINQ] + argv, capture_output=True,
                            env=dict(os.environ, GT4_NO_FASTCLI="1"))
        assert rn.returncode == rp.returncode, (rn.stderr, rp.stderr)
        assert rn.stdout == rp.stdout
        assert rn.stderr == rp.stderr


def test_wrapper_rebuilds_stale_frontend(lists):
    """Round-5 advisor finding: the sh wrappers only built the native
    front-end when MISSING, so edits to native/gt4cli.c kept exec'ing a
    stale binary. The wrapper now rebuilds when src -nt exe."""
    exe = REPO / ".gt4cli" / "glistcompare"
    src = REPO / "native" / "gt4cli.c"
    assert exe.exists()
    old_src_mtime = src.stat().st_mtime
    os.utime(exe, (old_src_mtime - 10, old_src_mtime - 10))
    d, paths = lists
    r = subprocess.run([BINQ, paths[0], "--stat"], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert exe.stat().st_mtime >= old_src_mtime, \
        "wrapper did not rebuild the stale front-end"


def test_stale_so_falls_back(lists, tmp_path):
    """A kernel .so older than its source must not be dlopened by the
    front-end — it execs Python, which rebuilds under the flock."""
    d, paths = lists
    so = REPO / "native" / "libfastgt_exact.so"
    if not so.exists():
        pytest.skip("kernel .so not built yet")
    src = REPO / "native" / "listkernel.c"
    old = so.stat().st_mtime
    try:
        os.utime(so, (old, src.stat().st_mtime - 10))
        r = subprocess.run([BIN, paths[0], "-ss", "rand", "10", "--seed",
                            "2", "-o", str(tmp_path / "s")],
                           capture_output=True)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "s_subset_16.list").exists()
    finally:
        os.utime(so, None)
